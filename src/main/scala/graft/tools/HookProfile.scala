package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.model.{GraphSchema, GraphStore}

/** Profiling harness for the maintained-index commit hooks: times each
  * index's hook in isolation at the WriteBench shape, plus the
  * sub-steps (signature evaluation, flat vs dynamic-partitioned delta
  * writes, IVF assignment) that drove the round-6 overhead cuts
  * recorded in BENCHNOTES.md. Run when commit latency regresses to see
  * WHICH hook and which step moved.
  */
object HookProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get(32)
    import spark.implicits._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val ischema = GraphSchema.builder().vertex("emb", "id", Seq("v")).build()
    def timed(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[hookprofile] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".as("v"))
    def third(r: Int) = embs.filter($"id" % 3 === r).localCheckpoint(true)
    val (a, b, c) = (third(0), third(1), third(2))
    val dim = c.select(size($"v")).head().getInt(0)

    // sub-step timings at the hook's exact shape
    locally {
      val sigCols = (0 until 8).map { t =>
        graft.operators.Similarity.lshSignature(col("v"),
          graft.operators.Similarity.hyperplanes(dim, 4, 42L + t))
      }
      def bucketed = c.select(col("id"), col("v"))
        .select(col("id"), col("v"), posexplode(array(sigCols: _*)))
        .withColumnsRenamed(Map("pos" -> "table", "col" -> "bucket"))
      val t = Files.createTempDirectory(java.nio.file.Paths.get("target"), "hp").toString
      timed("baseline-plain-write")(c.write.mode("overwrite").parquet(s"$t/plain"))
      timed("sig-count")(bucketed.count())
      timed("sig-count-again")(bucketed.count())
      timed("sig-plain-write")(bucketed.write.mode("overwrite").parquet(s"$t/sig"))
      timed("sig-part-write")(bucketed.write.partitionBy("table", "bucket")
        .mode("overwrite").parquet(s"$t/sigpart"))
      timed("sig-repart-part-write")(bucketed.repartition(col("table"), col("bucket"))
        .write.partitionBy("table", "bucket").mode("overwrite").parquet(s"$t/sigrepart"))
    }

    // ivf expand sub-steps at the hook's exact shape
    locally {
      import graft.operators.Similarity
      val t = Files.createTempDirectory(java.nio.file.Paths.get("target"), "hpivf").toString
      val norm = c.select(col("id"), col("v"), Similarity.l2normalize(col("v")).as("__nv"))
      timed("ivf-norm-count")(norm.count())
      val cs = Similarity.ivfTrain(norm.localCheckpoint(true), "__nv", "id", 8, 2)
      val assigned = Similarity.ivfAssign(norm, "__nv", cs).drop("__nv")
      timed("ivf-assign-count")(assigned.count())
      timed("ivf-assign-count2")(assigned.count())
      timed("ivf-assign-write")(assigned.coalesce(8)
        .sortWithinPartitions(col("ivf_cluster"))
        .write.mode("overwrite").parquet(s"$t/flat"))
    }

    Seq("none", "ann", "ivf", "both").foreach { mode =>
      val idir = Files.createTempDirectory(
        java.nio.file.Paths.get("target"), s"hookprof-$mode").toString
      val igs = new GraphStore(spark, ischema, idir)
      igs.txn().createVertices("emb", a).commit()
      igs.txn().createVertices("emb", b).commit()
      if (mode == "ann" || mode == "both") {
        val ann = new graft.operators.MaintainedAnnStore(igs, "emb", "v", idir,
          dim, nBits = 4, nTables = 8)
        timed(s"$mode-ann-rebuild")(ann.rebuild()); ann.bind()
      }
      if (mode == "ivf" || mode == "both") {
        val ivf = new graft.operators.MaintainedIvfStore(igs, "emb", "v", idir, k = 8)
        timed(s"$mode-ivf-rebuild")(ivf.rebuild()); ivf.bind()
      }
      timed(s"$mode-commit")(igs.txn().createVertices("emb", c).commit())
      timed(s"$mode-commit2")(igs.txn().updateVertices("emb", c).commit())
    }
    spark.stop()
  }
}
