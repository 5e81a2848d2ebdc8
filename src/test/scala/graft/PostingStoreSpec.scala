package graft

import org.apache.spark.sql.functions._

import graft.operators.{Sampling, Search}

/** The written inverted-index path (q106): posting lists materialized
  * as parquet partitioned by term-hash bucket, keyword probes
  * partition-pruned to the query terms' buckets — asserted on the
  * physical plan AND on result equality with the direct corpus scan.
  */
class PostingStoreSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  private val terms = Seq("spark", "vector", "merge")

  test("probe: partition-pruned plan, identical to the direct corpus scan") {
    val path = Search.ensurePostingStore(docs, "doc_id", "text", sf)
    val probe = Search.postingTopK(spark, path, terms, k = 10)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), s"no partition filters:\n$plan")
    assert(!plan.contains("PartitionFilters: []"),
      s"partition filter list is EMPTY — probe reads the whole store:\n$plan")
    assert(plan.contains("tb"), s"tb not in the partition filter:\n$plan")
    // the store probe returns exactly what tokenizing the corpus would
    val direct = docs.select(col("doc_id"),
        explode(graft.operators.TextAnalysis.tokens(lower(col("text")))).as("term"))
      .filter(col("term").isInCollection(terms))
      .groupBy("doc_id")
      .agg(countDistinct("term").as("n_terms"), count(lit(1)).as("total_tf"))
      .orderBy(col("n_terms").desc, col("total_tf").desc, col("doc_id"))
      .limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(probe.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      === direct)
  }

  test("stored BM25: partition-pruned postings AND df reads, identical to the rescan path") {
    val path = Search.ensurePostingStore(docs, "doc_id", "text", sf)
    val probe = Search.bm25TopKStored(spark, path, terms, k = 20)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), s"no partition filters:\n$plan")
    assert(!plan.contains("PartitionFilters: []"),
      s"a scan reads the whole store:\n$plan")
    // both file scans (postings and the _df sidecar) must carry a tb
    // partition filter — an unpruned df read would scan the vocabulary
    val scans = plan.split("FileScan").drop(1)
    assert(scans.length >= 2 && scans.forall(_.contains("PartitionFilters: [")),
      s"every store scan must be partition-pruned:\n$plan")
    // same integer-exact contract as the per-query corpus rescan
    val direct = Search.bm25TopK(docs, "doc_id", "text", terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(probe.collect().map(r => (r.getLong(0), r.getLong(1))) === direct)
  }

  test("stored TF-IDF: identical to the per-query tokenize path") {
    val path = Search.ensurePostingStore(docs, "doc_id", "text", sf)
    val stored = Search.tfidfKeywordsStored(spark, path, topPerDoc = 3)
      .orderBy("doc_id", "rk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val direct = Search.tfidfKeywords(docs, "doc_id", "text", topPerDoc = 3)
      .orderBy("doc_id", "rk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(stored === direct)
  }

  test("phrase probe: partition-pruned plan, overlap counting, repeated terms") {
    val path = Search.ensurePostingStore(docs, "doc_id", "text", sf)
    val probe = Search.phraseTopK(spark, path, Seq("table", "part"), k = 25)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && !plan.contains("PartitionFilters: []"),
      s"phrase probe not bucket-pruned:\n$plan")
    // ground truth from the raw text: count of token positions where
    // the phrase starts (normalized-token join, same as the oracle)
    val toks = docs.select(col("doc_id"),
      graft.operators.TextAnalysis.tokens(lower(col("text"))).as("ts"))
    def truth(phrase: Seq[String]): Map[Long, Long] = toks.collect().map { r =>
      val ts = r.getSeq[String](1)
      val n = ts.indices.count(i => i + phrase.length <= ts.length &&
        phrase.indices.forall(j => ts(i + j) == phrase(j)))
      r.getLong(0) -> n.toLong
    }.filter(_._2 > 0).toMap
    val got = probe.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = truth(Seq("table", "part"))
    // top-25 of the truth under the same (n_matches desc, id) order
    val wantTop = want.toSeq.sortBy { case (id, n) => (-n, id) }.take(25).toMap
    assert(got === wantTop)

    // a REPEATED-term phrase counts OVERLAPPING starts: build a tiny
    // store where "a a a" must match "a a" twice
    val tmpSrc = java.nio.file.Files.createTempDirectory("graft-phrase-src")
    val srcPath = s"$tmpSrc/docs.parquet"
    Seq((1L, "a a a b"), (2L, "a b a b"), (3L, "b b b"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(srcPath)
    val fx = spark.read.parquet(srcPath)
    val fxPath = Search.ensurePostingStore(fx, "doc_id", "text", srcPath,
      fpSource = srcPath)
    val aa = Search.phraseTopK(spark, fxPath, Seq("a", "a"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(aa.toSeq == Seq((1L, 2L)), s"overlap contract: got ${aa.toSeq}")
    val ab = Search.phraseTopK(spark, fxPath, Seq("a", "b"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ab == Map(1L -> 1L, 2L -> 2L))
  }

  test("driver-side term bucket matches the column expression") {
    // probe pruning and store routing share one hash definition; if
    // they drift, probes silently miss postings
    val checked = Seq("spark", "vector", "merge", "a", "ZZ-unusual_token.9")
    val viaColumn = checked.toDF("t")
      .select(col("t"), Sampling.hashBucket(col("t"), 64).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    checked.foreach { t =>
      assert(Search.termBucket(t, 64) == viaColumn(t),
        s"bucket drift for '$t'")
    }
  }

  test("store rebuilds when the source fingerprint changes") {
    val tmpSrc = java.nio.file.Files.createTempDirectory("graft-poststore-src")
    val srcPath = s"$tmpSrc/docs.parquet"
    Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(srcPath)
    val d1 = spark.read.parquet(srcPath)
    val path = Search.ensurePostingStore(d1, "doc_id", "text", srcPath,
      fpSource = srcPath)
    val n1 = Search.postingTopK(spark, path, Seq("beta"), k = 10).count()
    assert(n1 == 2)
    // grow the source; the stale store must rebuild, not serve 2 docs
    Thread.sleep(5) // mtime tick
    Seq((1L, "alpha beta"), (2L, "beta gamma"), (3L, "beta delta"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(srcPath)
    val d2 = spark.read.parquet(srcPath)
    val path2 = Search.ensurePostingStore(d2, "doc_id", "text", srcPath,
      fpSource = srcPath)
    assert(Search.postingTopK(spark, path2, Seq("beta"), k = 10).count() == 3)
  }
}
