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
