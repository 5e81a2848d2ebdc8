package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.model.{GraphSchema, GraphStore}

/** Write-path benchmark against BASELINE.md's mutation shapes
  * (insert-vertices / update-vertices / delete-vertices / insert-edges
  * / commit-batched, tests/perf/benchmarks.lisp: 20k vertices, txn
  * batch 1000). Spark commits are micro-batch by design (SURVEY §7.4):
  * the honest comparison is rows/s at batch grain vs the reference's
  * per-op rates, plus the fixed per-commit latency. Prints one JSON
  * line; results go to BENCHNOTES.md.
  */
object WriteBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val spark = graft.GraftSession.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._
    val schema = GraphSchema.builder()
      .vertex("node", "id", Seq("val", "label"))
      .edge("knows", "node", "node")
      .build()
    val dir = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "writebench").toString
    val gs = new GraphStore(spark, schema, dir)

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // JVM/codegen warm-up on a throwaway store, same as Bench's warmed
    // queries (the baseline's rates are warm in-process loops too)
    locally {
      val w = new GraphStore(spark, schema,
        Files.createTempDirectory(java.nio.file.Paths.get("target"), "wb-warm").toString)
      w.txn().createVertices("node",
        spark.range(100).select($"id", lit("w").as("val"), lit("node").as("label"))).commit()
      w.txn().updateVertices("node",
        spark.range(100).select($"id", lit("w2").as("val"), lit("node").as("label"))).commit()
    }
    val vertices = spark.range(n)
      .select($"id", concat(lit("v"), $"id").as("val"), lit("node").as("label"))
      .localCheckpoint(true)
    val edges = spark.range(n)
      .select($"id".as("src"), (($"id" * 3 + 7) % n).as("dst"), lit(1.0).as("weight"))
      .localCheckpoint(true)

    val tInsert = timed(gs.txn().createVertices("node", vertices).commit())
    val tEdges = timed(gs.txn().createEdges("knows", edges).commit())
    val tUpdate = timed(gs.txn().updateVertices("node",
      vertices.withColumn("val", concat($"val", lit("!"))).localCheckpoint(true)).commit())
    val half = vertices.filter($"id" % 2 === 0).select("id").localCheckpoint(true)
    val tDelete = timed(gs.txn().deleteVertices("node", half).commit())
    // per-commit latency at small batch (the reference's commit-per-op shape)
    val tTiny = timed(gs.txn().createVertices("node",
      Seq((1000000L, "x", "node")).toDF("id", "val", "label")).commit())
    val tSnapshot = timed(graft.model.Backup.backup(gs.graph(), s"$dir/__backup"))

    def rate(t: Double) = (n / t).round
    val base = f""""metric":"write_path","n":$n,"insert_s":$tInsert%.2f,"insert_rows_s":${rate(tInsert)},"insert_edges_s":$tEdges%.2f,"update_s":$tUpdate%.2f,"update_rows_s":${rate(tUpdate)},"delete_half_s":$tDelete%.2f,"tiny_commit_s":$tTiny%.2f,"snapshot_s":$tSnapshot%.2f"""

    // --- indexed write path: the same commit shape with EVERY index
    // maintained in-commit (view + minhash signature index + LSH/IVF
    // ANN stores — the reference's all-indexes-in-the-transaction
    // guarantee, transactions.lisp:601-744). Real corpus thirds so the
    // shingle/assignment cost is representative: commit A warms the
    // store, commit B is the CONTROL (a plain commit into a non-empty
    // store, paying the same latest-revision join as the measured one),
    // indexes bind, commit C is measured. tC/tB isolates the price of
    // in-commit freshness from second-commit cost.
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if (!Files.isDirectory(java.nio.file.Paths.get(sfDir))) {
      println(s"""{$base}""")
      spark.stop()
      return
    }
    val ischema = GraphSchema.builder()
      .vertex("doc", "id", Seq("text", "lang", "n_chars"))
      .vertex("emb", "id", Seq("v"))
      .vertex("image", "id", Seq("bytes"))
      .build()
    val idir = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "writebench-idx").toString
    val igs = new GraphStore(spark, ischema, idir)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id".as("id"), $"text", $"lang", $"n_chars")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".as("v"))
    def third(df: org.apache.spark.sql.DataFrame, r: Int) =
      df.filter($"id" % 3 === r).localCheckpoint(true)
    val (docsA, docsB, docsC) = (third(docs, 0), third(docs, 1), third(docs, 2))
    val (embsA, embsB, embsC) = (third(embs, 0), third(embs, 1), third(embs, 2))
    val nDocs = docsC.count(); val nEmbs = embsC.count()

    igs.txn().createVertices("doc", docsA).commit()
    igs.txn().createVertices("emb", embsA).commit()
    val tDocPlain = timed(igs.txn().createVertices("doc", docsB).commit())
    val tEmbPlain = timed(igs.txn().createVertices("emb", embsB).commit())

    val cat = new graft.views.ViewCatalog(spark, igs, idir)
    cat.register(graft.views.ViewDef("by_lang", "doc",
      df => df.select($"lang".as("key"), $"id", lit(1L).as("value")),
      reduceAgg = Some(sum($"value"))))
    cat.regenerate("by_lang"); cat.bindTo(igs)
    val sig = new graft.operators.SignatureIndex(igs, "doc", "text", idir)
    sig.rebuild(); sig.bind()
    val post = new graft.operators.MaintainedPostingIndex(igs, "doc", "text", idir)
    post.rebuild(); post.bind()
    // the stats tier rides the doc commit too: one tiny aggregation
    // over the lock-captured pre-commit frame per commit is the
    // claimed overhead, and this measurement is where it gets a number
    val stats = new graft.operators.MaintainedStatsIndex(
      igs, "v_doc", "n_chars", 0.0, 4000.0, 16, idir)
    stats.rebuild(); stats.bind()
    val dim = embsC.select(size($"v")).head().getInt(0)
    val ann = new graft.operators.MaintainedAnnStore(igs, "emb", "v", idir,
      dim, nBits = 4, nTables = 8)
    ann.rebuild(); ann.bind()
    val ivf = new graft.operators.MaintainedIvfStore(igs, "emb", "v", idir, k = 8)
    ivf.rebuild(); ivf.bind()
    // the composed IVF-PQ store is the third bound tier (it subsumes
    // the flat PQ store's commit shape: same one-job delta, plus the
    // cell assignment the production configuration carries)
    val pq = new graft.operators.MaintainedIvfPqStore(igs, "emb", "v", idir,
      k = 8, m = 8)
    pq.rebuild(); pq.bind()

    val tDocIndexed = timed(igs.txn().createVertices("doc", docsC).commit())
    val tEmbIndexed = timed(igs.txn().createVertices("emb", embsC).commit())

    // media tier: image commits with the maintained dHash index bound
    // (real encode + decode + hash in the write path)
    val imgs = docs.select($"id").as[Long].collect().toSeq.map(i =>
      (i, graft.operators.Multimodal.synthPatternImageBytes(i)))
    val (imgsA, imgsB, imgsC) = (
      imgs.filter(_._1 % 3 == 0), imgs.filter(_._1 % 3 == 1), imgs.filter(_._1 % 3 == 2))
    def imgDf(rows: Seq[(Long, Array[Byte])]) =
      rows.toDF("id", "bytes").localCheckpoint(true)
    val nImgs = imgsC.size
    igs.txn().createVertices("image", imgDf(imgsA)).commit()
    val tImgPlain = timed(igs.txn().createVertices("image", imgDf(imgsB)).commit())
    val dh = new graft.operators.MaintainedDhashIndex(igs, "image", "bytes", idir)
    dh.rebuild(); dh.bind()
    val tImgIndexed = timed(igs.txn().createVertices("image", imgDf(imgsC)).commit())

    val idx = f""""indexed_write_path":{"n_docs":$nDocs,"n_embs":$nEmbs,"n_imgs":$nImgs,"doc_commit_plain_s":$tDocPlain%.2f,"doc_commit_indexed_s":$tDocIndexed%.2f,"emb_commit_plain_s":$tEmbPlain%.2f,"emb_commit_indexed_s":$tEmbIndexed%.2f,"img_commit_plain_s":$tImgPlain%.2f,"img_commit_indexed_s":$tImgIndexed%.2f,"doc_overhead_x":${tDocIndexed / tDocPlain}%.2f,"emb_overhead_x":${tEmbIndexed / tEmbPlain}%.2f,"img_overhead_x":${tImgIndexed / tImgPlain}%.2f}"""
    println(s"""{$base,$idx}""")
    spark.stop()
  }
}
