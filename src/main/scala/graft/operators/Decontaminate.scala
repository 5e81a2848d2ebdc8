package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Train/eval decontamination — flag training documents whose word
  * n-grams overlap an evaluation corpus (the benchmark-leakage check
  * every LLM data pipeline runs before training; the n-gram-overlap
  * method of GPT-3 appendix C / PaLM / Llama data cards).
  *
  * Scale shape: the eval side (benchmark suites) is tiny relative to a
  * 100-TB train corpus, so its distinct n-gram hash set broadcasts;
  * the train side explodes per-doc distinct n-grams, hashes each to a
  * 64-bit long immediately, and probes the broadcast in one narrow
  * pass — the only shuffle is the per-doc count aggregation, and no
  * n-gram STRINGS ever move (hashes only, like [[Dedup]]'s shingle
  * pipeline). Contamination verdicts use integer arithmetic
  * (`n_hit * 100 >= n_grams * pct`), so results are bit-exact across
  * engines.
  */
object Decontaminate {

  /** `(doc id, gh)` — one row per DISTINCT word n-gram per document,
    * n-grams case-folded and hashed to 64-bit (xxhash64; collisions
    * are negligible at any realistic corpus size and the strings never
    * leave the map side). Documents shorter than `n` tokens contribute
    * their whole token run as a single "n-gram" ([[Dedup.shinglesOfTokens]]
    * semantics: a short doc wholly contained in eval is still leakage).
    */
  def docNgramHashes(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    Dedup.hashedShingleFrame(df, idCol, textCol, n, caseFold = true)
      .select(col("doc").as("__id"), explode(col("hsh")).as("gh"))

  /** Per-train-document contamination report against an eval corpus:
    * `(id, n_grams, n_hit, contaminated)` where `n_grams` counts the
    * doc's distinct n-grams, `n_hit` how many occur anywhere in eval,
    * and `contaminated` fires at `flagAtPct`% overlap.
    *
    * `broadcastEval` (default true) asserts the eval n-gram set fits
    * in executor memory — the normal case (benchmarks are MBs, train
    * is TBs). Pass false for eval corpora of unbounded size; the probe
    * then becomes a shuffled left join on the hash.
    */
  def evalOverlap(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 5, flagAtPct: Int = 20,
      broadcastEval: Boolean = true): DataFrame = {
    require(flagAtPct >= 0 && flagAtPct <= 100, "flagAtPct in [0,100]")
    val evalGrams0 = docNgramHashes(eval, idCol, textCol, n)
      .select(col("gh")).distinct().withColumn("__hit", lit(1))
    val evalGrams = if (broadcastEval) broadcast(evalGrams0) else evalGrams0
    docNgramHashes(train, idCol, textCol, n)
      .join(evalGrams, Seq("gh"), "left")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_hit"))
      .select(col("__id").as(idCol), col("n_grams"), col("n_hit"),
        (col("n_hit") * 100 >= col("n_grams") * flagAtPct).as("contaminated"))
  }

  /** Per-BENCHMARK contamination attribution: production pipelines
    * decontaminate against MANY eval sets at once and need to know
    * WHICH benchmark leaked into which training document — one
    * aggregate verdict ([[evalOverlap]]) can't drive per-benchmark
    * removal lists or report "source X is dirty against GSM-style
    * sets but clean against code sets". `evals` carries a `setCol`
    * label; output is one row per (train doc, eval set) WITH at least
    * one shared n-gram: `(id, eval_set, n_grams, n_hit, contaminated)`,
    * the flag firing per set at `flagAtPct`% of the doc's distinct
    * grams. Sparse long form by design — at scale the output is
    * |actual leaks|, never |docs| × |sets|.
    *
    * Scale shape: the per-set gram table is (set, gh)-distinct over
    * the benchmark corpora (benchmarks are MBs — broadcast), the train
    * corpus is shingled ONCE, and both the per-set hit counts and the
    * per-doc gram totals are map-side-combined aggregations.
    */
  def evalOverlapBySet(train: DataFrame, evals: DataFrame, idCol: String,
      textCol: String, setCol: String, n: Int = 5,
      flagAtPct: Int = 20, broadcastEval: Boolean = true): DataFrame = {
    require(flagAtPct >= 0 && flagAtPct <= 100, "flagAtPct in [0,100]")
    val evalSets = evals.select(col(idCol).as("__eid"),
      col(setCol).cast("string").as("eval_set"))
    val setGrams0 = docNgramHashes(evals, idCol, textCol, n)
      .join(evalSets, col("__id") === col("__eid"))
      .select(col("eval_set"), col("gh")).distinct()
    // `broadcastEval` (default true) asserts the per-set gram table is
    // benchmark-sized; pass false when `evals` is a corpus-proportional
    // slice that would not fit an executor (r15 advice #2 — matches
    // evalOverlap's escape hatch)
    val setGrams = if (broadcastEval) broadcast(setGrams0) else setGrams0
    val trainGrams = docNgramHashes(train, idCol, textCol, n)
    val totals = trainGrams.groupBy(col("__id")).agg(count(lit(1)).as("n_grams"))
    trainGrams.join(setGrams, Seq("gh"))
      .groupBy(col("__id"), col("eval_set"))
      .agg(count(lit(1)).as("n_hit"))
      .join(totals, Seq("__id"))
      .select(col("__id").as(idCol), col("eval_set"), col("n_grams"),
        col("n_hit"),
        (col("n_hit") * 100 >= col("n_grams") * flagAtPct).as("contaminated"))
  }

  /** Per-(source, benchmark) contamination scorecard — the governance
    * rollup of [[evalOverlapBySet]]: for every training source and
    * every eval set, how many of the source's documents flag, as a
    * count and exact ppm of the source. The table a data owner reads
    * to decide "drop source X for this benchmark family" — and the
    * drift-dashboard quantity to watch as new crawls land. Sources
    * with no flagged docs against a set emit no row (sparse, like the
    * attribution itself).
    *
    * Scale shape: the attribution's cost plus a source-grain
    * aggregation; the per-source totals frame is |sources| rows,
    * broadcast back.
    */
  def contaminationBySource(train: DataFrame, evals: DataFrame,
      idCol: String, textCol: String, srcCol: String, setCol: String,
      n: Int = 5, flagAtPct: Int = 20,
      broadcastEval: Boolean = true): DataFrame = {
    val flagged = evalOverlapBySet(train, evals, idCol, textCol, setCol,
      n, flagAtPct, broadcastEval).filter(col("contaminated"))
    val srcs = train.select(col(idCol), col(srcCol).cast("string").as("source"))
    val perSrc = srcs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    flagged.join(srcs, Seq(idCol))
      .groupBy(col("source"), col("eval_set"))
      .agg(count(lit(1)).as("n_flagged"))
      .join(broadcast(perSrc), Seq("source"))
      .select(col("source"), col("eval_set"), col("n_docs"),
        col("n_flagged"),
        expr("(n_flagged * 1000000) div n_docs").as("flagged_ppm"))
  }

  /** FUZZY decontamination — flag training documents that are
    * NEAR-duplicates of any evaluation document (word-k-shingle Jaccard
    * at `threshold`), the paraphrase-leakage check exact n-gram overlap
    * misses: an eval question reworded, re-wrapped, or lightly edited
    * shares few exact 5-grams but keeps a high shingle-set Jaccard.
    * This is [[Dedup.minhashNearDups]]'s machinery pointed ACROSS two
    * corpora instead of at one: no self-join ever happens, so the cost
    * is linear in the train corpus (signatures are a narrow map; the
    * candidate step joins train bucket rows against the eval side's
    * broadcast bucket set).
    *
    * Takes SIGNATURE frames ([[Dedup.signatureFrame]] layout:
    * `(doc, hsh, sig)`) so a pipeline that maintains a signature index
    * (the production shape — see MaintainedIndexes' SignatureIndex)
    * pays nothing to re-shingle; [[fuzzyEvalOverlap]] is the
    * text-level convenience.
    *
    * Returns one row PER TRAIN DOC: `(id, n_eval_near, max_jaccard,
    * contaminated)` — near-match count, best verified Jaccard (0.0 when
    * none), and the flag. Verification is exact (hashed-shingle-set
    * intersection over LSH candidates), so with banding parameters
    * chosen for recall at the corpus's near-dup band the report equals
    * the exhaustive cross-product truth — which is what the q127 oracle
    * checks.
    */
  def fuzzyEvalOverlapSigs(trainSigs: DataFrame, evalSigs: DataFrame,
      idCol: String, numHashes: Int, bands: Int,
      threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, "threshold in (0,1]")
    // eval is benchmark-sized: its banding rows broadcast, so candidate
    // generation is a map-side join over the train buckets — ids only,
    // the shingle arrays stay out of the shuffle
    val bT = Dedup.lshBuckets(trainSigs, numHashes, bands)
    val bE = Dedup.lshBuckets(evalSigs, numHashes, bands)
      .withColumnRenamed("doc", "eval_doc")
    val cands = bT.join(broadcast(bE), Seq("band", "band_hash"))
      .select(col("doc"), col("eval_doc")).distinct()
    val verified = cands
      .join(trainSigs.select(col("doc"), col("hsh").as("sh_t")), Seq("doc"))
      .join(broadcast(evalSigs.select(col("doc").as("eval_doc"),
        col("hsh").as("sh_e"))), Seq("eval_doc"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_t"), col("sh_e"))).cast("double") /
          size(array_union(col("sh_t"), col("sh_e"))))
      .filter(col("jaccard") >= threshold)
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_eval_near"), max(col("jaccard")).as("mj"))
    trainSigs.select(col("doc"))
      .join(verified, Seq("doc"), "left")
      .select(col("doc").as(idCol),
        coalesce(col("n_eval_near"), lit(0L)).as("n_eval_near"),
        round(coalesce(col("mj"), lit(0.0)), 6).as("max_jaccard"),
        (coalesce(col("n_eval_near"), lit(0L)) > 0).as("contaminated"))
  }

  /** [[fuzzyEvalOverlapSigs]] from raw text columns (shingles + minhash
    * computed here; prefer the signature-frame form when an index
    * already exists).
    */
  def fuzzyEvalOverlap(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, k: Int = 3, numHashes: Int = 24, bands: Int = 8,
      threshold: Double = 0.5): DataFrame =
    fuzzyEvalOverlapSigs(
      Dedup.signatureFrame(train, idCol, textCol, k, numHashes),
      Dedup.signatureFrame(eval, idCol, textCol, k, numHashes),
      idCol, numHashes, bands, threshold)

  /** [[evalOverlap]] for an eval corpus too large to broadcast: the
    * exact-confirm join still runs as a shuffle, but only over train
    * n-grams that survive a BLOOM prefilter built from the eval hash
    * set — Spark's own runtime-filter sketch
    * (`BloomFilterAggregate` / `BloomFilterMightContain`, the codegen
    * pair behind `spark.sql.optimizer.runtimeFilter.*`), driven
    * explicitly. One pass over eval builds the sketch (partial blooms
    * merge associatively executor-side; only the final bit array —
    * `numBits/8` bytes, NOT the eval set — reaches the driver and
    * ships back as a literal, the codebook discipline). The shuffle
    * then moves only probable hits: at a realistic overlap rate the
    * exchange shrinks from every-train-gram to ~(true hits + fpp ·
    * train grams). False positives die in the confirm join, so the
    * report is bit-identical to [[evalOverlap]] — the sketch changes
    * the plan, never the answer.
    */
  def evalOverlapBloom(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 5, flagAtPct: Int = 20,
      estimatedEvalGrams: Long = 4L * 1000 * 1000): DataFrame = {
    require(flagAtPct >= 0 && flagAtPct <= 100, "flagAtPct in [0,100]")
    require(estimatedEvalGrams > 0, "estimatedEvalGrams must be positive")
    val evalGrams = docNgramHashes(eval, idCol, textCol, n)
      .select(col("gh")).distinct()
    val bloomCol = Bridge.column(new BloomFilterAggregate(
      Bridge.expression(col("gh")), estimatedEvalGrams).toAggregateExpression())
    val bloomBytes = evalGrams.agg(bloomCol.as("bf")).head().getAs[Array[Byte]](0)
    val trainGrams = docNgramHashes(train, idCol, textCol, n)
    val totals = trainGrams.groupBy(col("__id")).agg(count(lit(1)).as("n_grams"))
    // empty eval → no sketch (NULL aggregate) → zero hits by definition
    val hits =
      if (bloomBytes == null)
        totals.select(col("__id"), lit(0L).as("n_hit")).limit(0)
      else {
        val mightContain = Bridge.column(BloomFilterMightContain(
          Literal(bloomBytes, BinaryType), Bridge.expression(col("gh"))))
        trainGrams.filter(mightContain)
          .join(evalGrams, Seq("gh"), "left_semi")
          .groupBy(col("__id")).agg(count(lit(1)).as("n_hit"))
      }
    totals.join(hits, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)) * 100 >= col("n_grams") * flagAtPct)
          .as("contaminated"))
  }
}
