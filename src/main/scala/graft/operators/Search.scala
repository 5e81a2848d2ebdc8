package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword relevance search over a document corpus — BM25-shaped
  * scoring with an integer-exact contract.
  *
  * The reference's only text search is exact/regex matching inside
  * Prolog goals (prolog-functors.lisp:133-139); ranked keyword search
  * is a pipeline addition a training-data engine needs (corpus
  * triage, targeted subset extraction).
  *
  * Scoring contract (all integer arithmetic, so Spark and any external
  * oracle agree bit-for-bit — no float summation-order or log-ulp
  * drift):
  *
  *   avgdl        = total_tokens div n_docs          (corpus constant)
  *   idf_pm(t)    = (n_docs * 10000) div df(t)        (rarity weight)
  *   tf_pm(t, d)  = (tf * 2 * 10000 * avgdl) div (tf * avgdl + dl)
  *                  — the BM25 saturation curve at k1 = 1, b = 1,
  *                    cleared of fractions by multiplying num and
  *                    denom by avgdl
  *   score(d)     = Σ_t idf_pm(t) * tf_pm(t, d)
  *
  * Scale shape: one explode + two grouped aggregations keyed by doc
  * id (partial map-side combine), query-term table broadcast, corpus
  * stats broadcast as a 1-row frame (never a driver-side collect).
  * Top-k ends in TakeOrdered — no global sort materialization.
  */
object Search {

  /** Per-(doc, term) frequencies for the query terms plus per-doc
    * token length — the index-shaped intermediate. `terms` must be
    * lowercase.
    */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): (DataFrame, DataFrame) = {
    // dl is ROW-LOCAL (r17): a document's token length needs no
    // explode and no doc-keyed exchange — the r16 shape paid a full
    // corpus-grain shuffle (explode → groupBy(id).count) to compute a
    // per-row integer. Only docs with ≥1 token appear, matching the
    // explode-derived frame exactly.
    val dl = docs
      .select(col(idCol).as("__id"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("dl"))
      .filter(col("dl") > 0)
    val tf = docs.select(col(idCol).as("__id"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("t"))
      .filter(col("t").isInCollection(terms))
      .groupBy("__id", "t").agg(count(lit(1)).as("tf"))
    (tf, dl)
  }

  /** Top-k documents for a bag-of-words query, scored per the
    * integer-exact BM25 contract above. Returns (id, score) ordered
    * (score desc, id asc).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    val (tf, dl) = termFrequencies(docs, idCol, textCol, terms)
    // corpus stats as a broadcast 1-row frame: n = ALL docs (empty
    // docs dilute idf exactly as they do in the oracle), avgdl over
    // token-bearing docs' lengths but divided by n (integer div)
    val stats = docs.agg(count(lit(1)).as("n"))
      .crossJoin(dl.agg(sum("dl").as("total")))
      .select(col("n"), expr("total div n").as("avgdl"))
    val df_ = tf.groupBy("t").agg(count(lit(1)).as("df"))
    tf.join(dl, Seq("__id"))
      .join(broadcast(df_), Seq("t"))
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        expr("((n * 10000) div df) * ((tf * 20000 * avgdl) div (tf * avgdl + dl))"))
      .groupBy("__id").agg(sum("contrib").as("score"))
      .select(col("__id").as(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol)).limit(k)
  }

  /** Per-document TF-IDF keyword extraction — the corpus-triage
    * primitive (topic surfacing, cluster labeling, per-doc metadata
    * enrichment): the `topPerDoc` highest-weighted terms of every
    * document. Same integer-exact weighting discipline as [[bm25TopK]]
    * (`idf_pm = (n_docs * 10000) div df`, `score = tf * idf_pm`), so
    * any engine agrees bit-for-bit; ties break on the term string.
    *
    * Scale shape: explode → partial-agg (doc, term) → term-keyed
    * df join (shuffle, NOT broadcast — document frequencies are
    * vocabulary-sized and a 100 TB corpus's vocabulary is not a
    * broadcast candidate) → per-doc rank window. The window partitions
    * by doc id, so no global sort ever materializes.
    */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
      topPerDoc: Int): DataFrame = {
    require(topPerDoc > 0, "topPerDoc must be positive")
    import org.apache.spark.sql.expressions.Window
    // per-doc term frequencies from ONE native expression (r17):
    // within-doc counting needs no cross-row state, so the (id, term)
    // corpus-token-grain exchange of the wordcount head is gone, and
    // the Generate emits one row per DISTINCT term per doc instead of
    // one per occurrence (guide §2.4).
    val tf = docs.select(col(idCol).as("__id"),
        explode(graft.functions.TokenCountsExpression
          .token_counts(lower(col(textCol)))).as("__tc"))
      .select(col("__id"), col("__tc.term").as("term"), col("__tc.tf").as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n"))
    val scored = tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("score", expr("tf * ((n * 10000) div df)"))
    scored.withColumn("rk", row_number().over(
        Window.partitionBy("__id").orderBy(col("score").desc, col("term"))).cast("long"))
      .filter(col("rk") <= topPerDoc)
      .select(col("__id").as(idCol), col("term"), col("tf"), col("df"),
        col("score"), col("rk"))
  }

  // --- written inverted-index store: the at-scale keyword probe -------
  //
  // bm25TopK / tfidfKeywords above tokenize the corpus per query. At
  // 100 TB the posting list IS the index: (term, doc, tf) rows are
  // written ONCE as parquet partitioned by a term-hash bucket, and a
  // keyword probe becomes a partition-pruned read of the few bucket
  // directories holding its terms' postings — the plan lists nothing
  // else (same written-artifact discipline as Similarity's LSH/IVF
  // stores and SpatialOps' cell store).

  // v3: posting rows additionally carry the term's sorted token
  // POSITIONS (the Lucene positional-postings discipline), making
  // phrase queries an index probe; v2 added `dl` + the `_df` /
  // `_bm25stats` sidecars — each version bump forces one rebuild of
  // older stores instead of probing a schema they don't have
  def postingStorePath(sfDir: String, nBuckets: Int): String =
    s"${graft.model.StorePaths.root}/${graft.model.StorePaths.key(sfDir)}/postings_b${nBuckets}v3"

  /** Driver-side md5 bucket of a term — the same value
    * [[graft.operators.Sampling.hashBucket]] computes as a column, so
    * probe-side pruning and store-side routing cannot drift.
    */
  private[graft] def termBucket(term: String, nBuckets: Int): Long = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = digest.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) % nBuckets
  }

  private val postingBuildLock = new Object

  /** Build-if-absent posting store for a document table: one row per
    * (term, doc) with its term frequency AND its document's token
    * length, partitioned by `tb = md5-bucket(term) % nBuckets`.
    * Bucketing by term hash keeps directory count fixed (a raw term
    * partition would create one dir per vocabulary entry) while still
    * pruning every probe to the requested terms' buckets. Stale stores
    * rebuild via the shared fingerprint stamp discipline
    * ([[graft.model.StorePaths]]).
    *
    * `dl` is DENORMALIZED onto every posting row (the Lucene norms
    * discipline): a BM25 probe then needs no corpus-sized doc-length
    * join — everything it scores arrives in the pruned bucket read.
    * Two sidecars complete the ranked-search stats:
    *   - `_df/` — per-term document frequency, bucket-partitioned like
    *     the postings, so a probe's df read is pruned to the same dirs;
    *   - `_bm25stats.txt` — `n` (ALL docs, empty ones dilute idf
    *     exactly as in [[bm25TopK]]) and `avgdl` (integer division),
    *     the two corpus constants no pruned read can derive.
    * Underscore names are invisible to the parquet reader of the store
    * root, so [[postingTopK]]'s scan is unchanged.
    */
  def ensurePostingStore(docs: DataFrame, idCol: String, textCol: String,
      sfDir: String, nBuckets: Int = 64, fpSource: String = null): String = {
    import org.apache.spark.sql.expressions.Window
    import graft.model.StorePaths
    val path = postingStorePath(sfDir, nBuckets)
    val fp = StorePaths.fingerprint(
      Option(fpSource).getOrElse(s"$sfDir/documents.parquet"))
    def current = new java.io.File(path, "_SUCCESS").exists() &&
      StorePaths.isCurrent(path, fp)
    if (!current) postingBuildLock.synchronized {
      if (!current) {
        // posexplode: `pos` is the term's 0-based token position — kept
        // per (term, doc) as a sorted array, the positional payload a
        // phrase probe intersects ([[phraseTopK]])
        val tf = docs.select(col(idCol).as("doc_id"),
            posexplode(TextAnalysis.tokens(lower(col(textCol)))))
          .groupBy(col("col").as("term"), col("doc_id"))
          .agg(count(lit(1)).as("tf"),
            sort_array(collect_list(col("pos"))).as("positions"))
          .localCheckpoint(eager = true) // postings, df, and stats share it
        // dl = Σ tf over the doc's terms — derived from the postings
        // themselves (one doc-keyed window), never a second tokenize
        tf.withColumn("dl", sum("tf").over(Window.partitionBy("doc_id")))
          .withColumn("tb", Sampling.hashBucket(col("term"), nBuckets))
          .write.partitionBy("tb").mode("overwrite").parquet(path)
        tf.groupBy("term").agg(count(lit(1)).as("df"))
          .withColumn("tb", Sampling.hashBucket(col("term"), nBuckets))
          .write.partitionBy("tb").mode("overwrite").parquet(s"$path/_df")
        val n = docs.count()
        val total = tf.agg(coalesce(sum("tf"), lit(0L))).head().getLong(0)
        val avgdl = if (n == 0) 0L else total / n
        java.nio.file.Files.write(
          java.nio.file.Paths.get(path, "_bm25stats.txt"),
          s"$n $avgdl".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        StorePaths.stamp(path, fp)
      }
    }
    path
  }

  /** (n_docs, avgdl) recorded at store build ([[ensurePostingStore]]). */
  def postingStoreStats(storePath: String): (Long, Long) = {
    val parts = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(storePath, "_bm25stats.txt")),
      java.nio.charset.StandardCharsets.UTF_8).trim.split(" ")
    (parts(0).toLong, parts(1).toLong)
  }

  /** Normalize a bag-of-words query the way the posting stores
    * normalize their tokens (lowercase, dedupe): every probe surface
    * shares this, so a caller passing "Spark" cannot silently miss the
    * lowercased postings.
    */
  private[operators] def normalizeTerms(terms: Seq[String]): Seq[String] = {
    require(terms.nonEmpty, "at least one query term")
    terms.map(_.toLowerCase).distinct
  }

  /** The deterministic match-ranking contract shared by every posting
    * probe surface ((terms matched desc, total tf desc, id asc) top-k
    * over unique (id, term, tf) posting rows) — one definition, so the
    * written-store probe and the commit-maintained probe cannot drift.
    */
  private[operators] def rankPostings(postings: DataFrame, idCol: String,
      k: Int): DataFrame =
    postings.groupBy(idCol)
      .agg(count(lit(1)).as("n_terms"), sum("tf").as("total_tf"))
      .orderBy(col("n_terms").desc, col("total_tf").desc, col(idCol))
      .limit(k)

  /** Keyword probe against a written posting store: top-k documents
    * for a bag-of-words query, ranked by [[rankPostings]]'s contract.
    * Reads ONLY the query terms' bucket directories (PartitionFilters;
    * pinned by PostingStoreSpec).
    */
  def postingTopK(spark: org.apache.spark.sql.SparkSession, storePath: String,
      terms: Seq[String], k: Int, nBuckets: Int = 64): DataFrame = {
    val t = normalizeTerms(terms)
    val tbs = t.map(termBucket(_, nBuckets)).distinct
    rankPostings(
      spark.read.parquet(storePath)
        .filter(col("tb").isInCollection(tbs) && col("term").isInCollection(t)),
      "doc_id", k)
  }

  /** BM25 top-k served from the WRITTEN posting store — the at-scale
    * ranked search: where [[bm25TopK]] re-tokenizes the corpus per
    * query, this reads ONLY the query terms' bucket directories
    * (postings + the `_df` sidecar, both pruned by `tb` —
    * PartitionFilters pinned by PostingStoreSpec) and two persisted
    * corpus constants. Same integer-exact contract, same result rows
    * as [[bm25TopK]] on the same corpus (`dl` rides on every posting
    * row, so no doc-length join touches anything outside the buckets).
    */
  def bm25TopKStored(spark: org.apache.spark.sql.SparkSession, storePath: String,
      terms: Seq[String], k: Int, nBuckets: Int = 64): DataFrame = {
    val t = normalizeTerms(terms)
    val tbs = t.map(termBucket(_, nBuckets)).distinct
    val (n, avgdl) = postingStoreStats(storePath)
    val postings = spark.read.parquet(storePath)
      .filter(col("tb").isInCollection(tbs) && col("term").isInCollection(t))
    val dfr = spark.read.parquet(s"$storePath/_df")
      .filter(col("tb").isInCollection(tbs) && col("term").isInCollection(t))
      .select("term", "df")
    postings.join(broadcast(dfr), Seq("term"))
      .withColumn("contrib", expr(
        s"((CAST($n AS BIGINT) * 10000) div df) * " +
          s"((tf * 20000 * CAST($avgdl AS BIGINT)) div (tf * CAST($avgdl AS BIGINT) + dl))"))
      .groupBy("doc_id").agg(sum("contrib").as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
  }

  /** Per-document TF-IDF keywords served from the WRITTEN posting
    * store: the [[tfidfKeywords]] contract with zero per-query
    * tokenization — (term, doc, tf) and df come straight from the
    * store's rows and `_df` sidecar, `n` from the persisted stats. The
    * scan covers all buckets (every doc's keywords need every doc's
    * terms) but reads compact integer postings instead of exploding
    * text, and the df join replaces the per-query vocabulary
    * aggregation.
    */
  def tfidfKeywordsStored(spark: org.apache.spark.sql.SparkSession,
      storePath: String, topPerDoc: Int): DataFrame = {
    require(topPerDoc > 0, "topPerDoc must be positive")
    import org.apache.spark.sql.expressions.Window
    val (n, _) = postingStoreStats(storePath)
    val tf = spark.read.parquet(storePath).select("doc_id", "term", "tf")
    val dfr = spark.read.parquet(s"$storePath/_df").select("term", "df")
    val scored = tf.join(dfr, Seq("term"))
      .withColumn("score", expr(s"tf * ((CAST($n AS BIGINT) * 10000) div df)"))
    scored.withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))).cast("long"))
      .filter(col("rk") <= topPerDoc)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score"), col("rk"))
  }

  /** The positional phrase-match contract shared by the written-store
    * and commit-maintained probes: given per-(term, doc) sorted
    * position arrays for the phrase's terms, a document's `n_matches`
    * is the number of token positions p where term i sits at p + i for
    * every i — computed by intersecting the i-th term's positions
    * shifted left by i. Overlapping occurrences count (a doc "a a a"
    * matches the phrase "a a" twice), the semantics a positional index
    * gives for free and substring replace-counting cannot. Input rows:
    * (id, term, positions); one row per (term, doc). Returns
    * (id, n_matches ≥ 1) top-k by (n_matches desc, id).
    */
  private[operators] def rankPhrase(rows: DataFrame, idCol: String,
      phrase: Seq[String], k: Int): DataFrame = {
    // one frame per phrase SLOT (a repeated term appears once per slot,
    // each with its own shift), joined on the doc id: docs missing any
    // phrase term drop out of the inner join chain
    val slots = phrase.zipWithIndex.map { case (term, i) =>
      val shifted =
        if (i == 0) col("positions")
        else transform(col("positions"), p => p - i)
      rows.filter(col("term") === term)
        .select(col(idCol), shifted.as(s"__p$i"))
    }
    val joined = slots.reduce((a, b) => a.join(b, Seq(idCol)))
    val starts = (1 until phrase.length).foldLeft(col("__p0")) {
      (acc, i) => array_intersect(acc, col(s"__p$i"))
    }
    joined.select(col(idCol), size(starts).cast("long").as("n_matches"))
      .filter(col("n_matches") >= 1)
      .orderBy(col("n_matches").desc, col(idCol)).limit(k)
  }

  /** Phrase query against a written v3 posting store: top-k documents
    * containing the exact consecutive-token phrase, with overlapping
    * occurrence counts ([[rankPhrase]]). Reads ONLY the phrase terms'
    * bucket directories — the scan lists nothing else (PartitionFilters
    * pinned by PostingStoreSpec); position arrays travel only for the
    * matched terms' rows.
    */
  def phraseTopK(spark: org.apache.spark.sql.SparkSession, storePath: String,
      phrase: Seq[String], k: Int, nBuckets: Int = 64): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val t = phrase.map(_.toLowerCase) // order and repeats preserved
    val uniq = t.distinct
    val tbs = uniq.map(termBucket(_, nBuckets)).distinct
    rankPhrase(
      spark.read.parquet(storePath)
        .filter(col("tb").isInCollection(tbs) && col("term").isInCollection(uniq))
        .select("doc_id", "term", "positions"),
      "doc_id", t, k)
  }

  /** The same contract as ANSI SQL over the same table, for oracle
    * checks (DuckDB dialect: `//` = integer division, string_split).
    */
  /** Attach a 1-based `rank` to an ALREADY TOP-K frame by the given
    * order. The window is global — only ever call this on a frame a
    * `limit(k)` has already shrunk (a fused candidate list, a probe
    * result), never on a corpus-sized frame: ranking k rows on one
    * task is the point, ranking a corpus on one task is a bottleneck.
    */
  def rankTopK(df: DataFrame, order: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("rank", row_number().over(Window.orderBy(order: _*)).cast("long"))
  }

  /** Reciprocal-rank fusion — the standard hybrid-retrieval combiner
    * (lexical BM25 list + dense ANN list → one ranking, per "Reciprocal
    * Rank Fusion outperforms Condorcet and individual rank learning
    * methods", Cormack et al.): each candidate scores
    * `Σ_lists 1/(kConst + rank)`, absent-from-a-list contributes 0.
    * Rank positions are integers, so `1/(kConst+r)` is one IEEE divide
    * — identical on any engine — and the fused score is a fixed-order
    * sum of those, rounded to 6 as the printed contract.
    *
    * Each input frame must carry `(idCol, rank)` (see [[rankTopK]])
    * and be top-k-sized: the fusion is then a few broadcast-sized
    * full-outer joins — candidate-list work, nothing corpus-scale.
    * Output: `(idCol, <label>_rank ... , rrf)` with 0 marking "not in
    * that list", ordered (rrf desc, id).
    */
  def rrfFuse(lists: Seq[(String, DataFrame)], idCol: String,
      kConst: Int = 60, topK: Int = 10): DataFrame = {
    require(lists.size >= 2, "fusion needs at least two ranked lists")
    require(kConst >= 1 && topK >= 1, "kConst and topK must be positive")
    val renamed = lists.map { case (label, df) =>
      label -> df.select(col(idCol), col("rank").as(s"${label}_rank"))
    }
    val joined = renamed.map(_._2).reduce(_.join(_, Seq(idCol), "full"))
    val contribs = renamed.map { case (label, _) =>
      coalesce(lit(1.0) / (lit(kConst) + col(s"${label}_rank")), lit(0.0))
    }
    val rankCols = renamed.map { case (label, _) =>
      coalesce(col(s"${label}_rank"), lit(0L)).as(s"${label}_rank")
    }
    joined
      .select((col(idCol) +: rankCols) :+
        round(contribs.reduce(_ + _), 6).as("rrf"): _*)
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topK)
  }

  /** Hard-negative mining for retrieval-model training — the
    * contrastive-training data stage: candidates that score HIGH on
    * the lexical ranker yet are not full matches make the best
    * negatives (random negatives are trivially separable; BM25-top
    * near-misses force the embedding model to learn fine
    * distinctions). Positives are defined lexically here: a document
    * matching ALL query terms is a presumed positive and excluded;
    * everything else competes by the same integer-exact BM25 contract
    * as [[bm25TopK]], and the top `k` (score desc, id asc) emit with
    * their matched-term count.
    *
    * Scale shape: identical to [[bm25TopK]] — one explode, two
    * grouped aggregations, broadcast term stats, TakeOrdered top-k;
    * the positive-exclusion is a HAVING on the same per-doc
    * aggregation (no second corpus pass, no join against a positives
    * table).
    */
  def hardNegatives(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    // n_terms_matched counts DISTINCT matched terms, so the
    // all-terms-matched exclusion must compare against the DISTINCT
    // query size — dedupe here so every caller (REST included, which
    // passes user input verbatim) gets the documented contract even
    // when the query repeats a term (r15 advice #1)
    val ts = terms.distinct
    require(ts.nonEmpty, "terms must be non-empty")
    val (tf, dl) = termFrequencies(docs, idCol, textCol, ts)
    val stats = docs.agg(count(lit(1)).as("n"))
      .crossJoin(dl.agg(sum("dl").as("total")))
      .select(col("n"), expr("total div n").as("avgdl"))
    val df_ = tf.groupBy("t").agg(count(lit(1)).as("df"))
    tf.join(dl, Seq("__id"))
      .join(broadcast(df_), Seq("t"))
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        expr("((n * 10000) div df) * ((tf * 20000 * avgdl) div (tf * avgdl + dl))"))
      .groupBy("__id")
      .agg(sum("contrib").as("score"),
        count(lit(1)).cast("long").as("n_terms_matched"))
      .filter(col("n_terms_matched") < ts.size)
      .select(col("__id").as(idCol), col("score"), col("n_terms_matched"))
      .orderBy(col("score").desc, col(idCol)).limit(k)
  }

  def hardNegativesOracleSql(tableName: String, idCol: String, textCol: String,
      terms: Seq[String], k: Int): String = {
    val ts = terms.distinct // mirror the operator's dedupe (r15 advice #1)
    val termList = ts.map(t => s"'$t'").mkString(", ")
    s"""WITH tk AS (
       |  SELECT $idCol AS id, unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS t
       |  FROM $tableName WHERE length(trim($textCol)) > 0),
       |dl AS (SELECT id, count(*) AS dl FROM tk GROUP BY 1),
       |st AS (SELECT (SELECT count(*) FROM $tableName) AS n,
       |              (SELECT sum(dl) FROM dl) // (SELECT count(*) FROM $tableName) AS avgdl),
       |tf AS (SELECT id, t, count(*) AS tf FROM tk WHERE t IN ($termList) GROUP BY 1, 2),
       |df AS (SELECT t, count(*) AS df FROM tf GROUP BY 1)
       |SELECT tf.id AS $idCol,
       |  CAST(sum(((st.n * 10000) // df.df) *
       |           ((tf.tf * 20000 * st.avgdl) // (tf.tf * st.avgdl + dl.dl))) AS BIGINT) AS score,
       |  CAST(count(*) AS BIGINT) AS n_terms_matched
       |FROM tf JOIN df USING (t) JOIN dl USING (id) CROSS JOIN st
       |GROUP BY 1 HAVING count(*) < ${ts.size}
       |ORDER BY score DESC, $idCol LIMIT $k""".stripMargin
  }

  def bm25OracleSql(tableName: String, idCol: String, textCol: String,
      terms: Seq[String], k: Int): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH tk AS (
       |  SELECT $idCol AS id, unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS t
       |  FROM $tableName WHERE length(trim($textCol)) > 0),
       |dl AS (SELECT id, count(*) AS dl FROM tk GROUP BY 1),
       |st AS (SELECT (SELECT count(*) FROM $tableName) AS n,
       |              (SELECT sum(dl) FROM dl) // (SELECT count(*) FROM $tableName) AS avgdl),
       |tf AS (SELECT id, t, count(*) AS tf FROM tk WHERE t IN ($termList) GROUP BY 1, 2),
       |df AS (SELECT t, count(*) AS df FROM tf GROUP BY 1)
       |SELECT tf.id AS $idCol,
       |  CAST(sum(((st.n * 10000) // df.df) *
       |           ((tf.tf * 20000 * st.avgdl) // (tf.tf * st.avgdl + dl.dl))) AS BIGINT) AS score
       |FROM tf JOIN df USING (t) JOIN dl USING (id) CROSS JOIN st
       |GROUP BY 1 ORDER BY score DESC, $idCol LIMIT $k""".stripMargin
  }
}
