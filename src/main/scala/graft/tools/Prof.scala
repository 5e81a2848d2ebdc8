package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators._
import graft.model.Tpch

/** Ad-hoc stage profiler for the optimization rounds: times named
  * sub-frames of the expensive catalog queries with the noop sink
  * (guide §1.4) so a query's cost decomposes into its passes. Each
  * piece runs twice (JIT/footer warm-up discarded) and prints the
  * second reading. Usage: runMain graft.tools.Prof <sfDir> <case>
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.lift(1).getOrElse("q221")
    val spark = graft.GraftSession.get(32)
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      f // warm-up
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $name%-42s best ${runs.min}%6.3f  med ${runs.sorted.apply(1)}%6.3f")
    }
    val docs = Tpch.table(spark, sfDir, "documents")

    which match {
      case "q221" =>
        val target = docs
          .filter(TextAnalysis.gateKeep(col("text")))
          .filter(Sampling.hashSplit(col("doc_id"),
            Seq("train" -> 0.9, "val" -> 0.05), rest = "test") === "val")
        time("docs count")(docs.count())
        time("gate filter count")(docs.filter(TextAnalysis.gateKeep(col("text"))).count())
        time("dsirWeightsDense (model build)")(
          TextAnalysis.dsirWeightsDense(docs, target, "text"))
        val w = TextAnalysis.dsirWeightsDense(docs, target, "text")
        time("dsirScoreStateless noop")(
          noop(TextAnalysis.dsirScoreStateless(docs, "doc_id", "text", w)))
        time("q221 full count")(
          graft.SparkEntry.queries("q221_dsir_select")(spark, sfDir).count())
      case "q227" =>
        val clean = docs.filter(TextAnalysis.gateKeep(col("text")))
        time("clean filter count")(clean.count())
        time("bigramLmScore(clean, docs) noop")(
          noop(TextAnalysis.bigramLmScore(clean, docs, "doc_id", "text")))
        time("lmLowFlags onlyClean noop")(
          noop(Curate.lmLowFlags(docs, "doc_id", "text", "source", 940000L,
            onlyClean = true)))
        time("Curate.apply(lmGate) noop")(
          noop(Curate(docs, "doc_id", "text",
            lmGate = Some(("source", 940000L)))))
        time("q227 full count")(
          graft.SparkEntry.queries("q227_lm_curate_mix")(spark, sfDir).count())
      case "lm" =>
        val clean = docs.filter(TextAnalysis.gateKeep(col("text")))
        def toks(df: DataFrame) = df.select(col("doc_id").as("__id"),
          TextAnalysis.tokens(lower(col("text"))).as("__toks"))
        def bigrams(df: DataFrame) = toks(df)
          .filter(size(col("__toks")) >= 2)
          .select(col("__id"),
            explode(sequence(lit(1), size(col("__toks")) - 1)).as("__i"),
            col("__toks"))
          .select(col("__id"), element_at(col("__toks"), col("__i")).as("w1"),
            element_at(col("__toks"), col("__i") + 1).as("w2"))
        time("tokenize clean noop")(noop(toks(clean)))
        time("c1 unigram agg noop")(noop(toks(clean)
          .select(explode(col("__toks")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("c1"))))
        time("c2 bigram agg noop")(noop(bigrams(clean)
          .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))))
        time("bigrams(docs) noop")(noop(bigrams(docs)))
        time("bigramLmScore full noop")(
          noop(TextAnalysis.bigramLmScore(clean, docs, "doc_id", "text")))
      case "all" =>
        // one COLD run per catalog query (plan compile included) —
        // outlier triage, not steady-state measurement
        val times = graft.SparkEntry.queries.keys.toSeq.sorted.map { name =>
          val t0 = System.nanoTime()
          val t = try {
            graft.SparkEntry.queries(name)(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          } catch { case e: Throwable =>
            println(s"[prof] $name ERROR ${e.getClass.getSimpleName}"); -1.0 }
          name -> t
        }
        times.sortBy(-_._2).foreach { case (n, t) =>
          println(f"[prof] $n%-42s cold $t%7.3f")
        }
      case "q108parts" =>
        val emb = Tpch.table(spark, sfDir, "embeddings").select("vec_id", "embedding")
        val copies = emb.filter(col("vec_id") % 50 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            transform(col("embedding"), x => (x * lit(1.5f)).cast("float"))
              .as("embedding"))
        val aug = emb.unionAll(copies)
        val n = aug.count()
        val dim = aug.select(size(col("embedding"))).head().getInt(0)
        val bits = Similarity.autoSignatureBits(n)
        val path = Similarity.ensureDedupSigStore(aug, "embedding", "vec_id", sfDir,
          dim, bits, nTables = 8, seed = 4201L,
          fpSource = s"$sfDir/embeddings.parquet")
        time("aug count")(aug.count())
        time("vecs checkpoint")(
          aug.select(col("vec_id").as("id"), col("embedding").as("v"))
            .localCheckpoint(true).count())
        val store = spark.read.parquet(path)
        time("bucket pairs count") {
          val b = store.select(col("id"), col("table"), col("bucket"))
          println("  pairs: " + b.as("a").join(b.as("b"), Seq("table", "bucket"))
            .filter(col("a.id") < col("b.id"))
            .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct().count())
        }
        time("cosineNearDups noop")(
          noop(Similarity.cosineNearDups(aug, "vec_id", "embedding", 0.999,
            prebuilt = Some(store))))
        time("semanticDedup full noop")(
          noop(Similarity.semanticDedup(aug, "vec_id", "embedding",
            threshold = 0.999, buckets = Some(store), knownCount = Some(n))))
      case "winnowparts" =>
        import graft.functions.WinnowExpression.winnow_fps
        time("winnow array noop")(
          noop(docs.select(col("doc_id"), winnow_fps(col("text"), 8, 4).as("__fps"))))
        time("winnow size count")(
          println("  total fps: " + docs.select(
            sum(size(winnow_fps(col("text"), 8, 4)))).head().getLong(0)))
        time("winnow explode count")(
          println("  exploded: " + docs.select(col("doc_id"),
            explode(winnow_fps(col("text"), 8, 4)).as("__f")).count()))
        time("winnow explode noop")(
          noop(docs.select(col("doc_id"),
              explode(winnow_fps(col("text"), 8, 4)).as("__f"))
            .select(col("doc_id"), col("__f.pos").as("pos"), col("__f.hv").as("hv"))))
      case "q156parts" =>
        val fp0 = Dedup.winnowFingerprintFrame(docs, "doc_id", "text", 8, 4)
        time("fp frame noop")(noop(fp0))
        val fp = fp0.select(col("doc_id").as("__id"), col("hv")).distinct()
        time("fp distinct noop")(noop(fp))
        val rare = fp.groupBy("hv").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= 4).select("hv")
        time("rare noop")(noop(rare))
        val fpr = fp.join(rare, Seq("hv"))
        val pairs = fpr.select(col("hv"), col("__id").as("id_a"))
          .join(fpr.select(col("hv"), col("__id").as("id_b")), Seq("hv"))
          .filter(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 2)
        time("pairs noop")(noop(pairs))
      case "q240parts" =>
        val sh = docs.select(col("doc_id").as("__sid"),
          array_distinct(Dedup.shingles(col("text"), 3)).as("__sh"))
        val x = sh.select(col("__sid").as("id"), explode(col("__sh")).as("g"))
        time("x count")(println("  x rows: " + x.count()))
        val rareG = x.groupBy("g").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= 20).select("g")
        time("rareG count")(println("  rare shingles: " + rareG.count()))
        val rare = x.join(rareG, Seq("g"))
        val cand = rare.as("a").join(rare.as("b"), Seq("g"))
          .filter(col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
        time("cand count")(println("  cand pairs: " + cand.count()))
        val scored = cand
          .join(sh.select(col("__sid").as("id_a"), col("__sh").as("__sha")),
            Seq("id_a"))
          .join(sh.select(col("__sid").as("id_b"), col("__sh").as("__shb")),
            Seq("id_b"))
          .select(col("id_a"), col("id_b"),
            expr("CAST(size(array_intersect(__sha, __shb)) AS BIGINT) * 10000 " +
              "div greatest(size(array_union(__sha, __shb)), 1)").as("pm"))
        time("scored noop")(noop(scored))
      case "q108" =>
        time("q108 full count")(
          graft.SparkEntry.queries("q108_semantic_dedup")(spark, sfDir).count())
      case names =>
        names.split(',').foreach { name =>
          time(s"$name full count")(
            graft.SparkEntry.queries(name)(spark, sfDir).count())
        }
    }
    spark.stop()
  }
}
