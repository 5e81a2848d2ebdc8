package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training data — the concat-and-chunk
  * layout: documents are concatenated in a deterministic key order and
  * the token stream is cut into fixed-length training sequences. Each
  * document's placement is fully determined by the exclusive prefix
  * sum of token counts in key order.
  *
  * Scale shape — a distributed prefix sum, NOT a global
  * `Window.orderBy` (which collapses to a single task at 100 TB):
  *
  *   1. bucket docs by key range (`id div bucketSize`);
  *   2. per-bucket exclusive cumsum via a window PARTITIONED by bucket
  *      (parallel across buckets);
  *   3. per-bucket totals → one tiny frame (#buckets rows), exclusive
  *      cumsum over it (the only serial step, proportional to bucket
  *      COUNT, not rows), broadcast back;
  *   4. offset = bucket base + within-bucket cumsum.
  *
  * The result is identical to the single-window definition, which is
  * what the SQL oracle states.
  */
object Packing {

  /** Per-doc packing report: token count, absolute start offset in the
    * concatenated stream, first sequence index, and how many seqLen
    * sequences the doc spans (0 for empty docs).
    *
    * `nTokens` is any integral token-count expression over the input
    * row (whitespace tokens, BPE-ish pre-tokens, ...).
    */
  def concatChunk(docs: DataFrame, idCol: String, nTokens: Column,
      seqLen: Int, bucketSize: Long = 65536L): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    withStartOffsets(docs, idCol, nTokens, bucketSize)
      .withColumn("first_seq", expr(s"start_offset div $seqLen"))
      .withColumn("n_seqs",
        when(col("n_tokens") > 0,
          expr(s"(start_offset + n_tokens - 1) div $seqLen") - col("first_seq") + 1)
          .otherwise(lit(0L)))
      .select(col("__id").as(idCol), col("n_tokens"),
        col("start_offset"), col("first_seq"), col("n_seqs"))
  }

  /** The distributed exclusive prefix sum both packing and systematic
    * sampling ride on: returns (__id, n_tokens, start_offset) with
    * start_offset = Σ n_tokens over lower ids (the four-step bucketed
    * cumsum in the object scaladoc — identical to the single global
    * window, which is what oracles state).
    */
  private def withStartOffsets(docs: DataFrame, idCol: String,
      nTokens: Column, bucketSize: Long): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("__id"),
      nTokens.cast("long").as("n_tokens"))
      .withColumn("__b", expr(s"__id div $bucketSize"))
    val inBucket = Window.partitionBy("__b").orderBy("__id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = base.withColumn("__local",
      coalesce(sum("n_tokens").over(inBucket), lit(0L)))
    val bucketTotals = base.groupBy("__b").agg(sum("n_tokens").as("__bt"))
    val overBuckets = Window.orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketBases = bucketTotals.withColumn("__base",
      coalesce(sum("__bt").over(overBuckets), lit(0L))).drop("__bt")
    withLocal.join(broadcast(bucketBases), Seq("__b"))
      .withColumn("start_offset", col("__base") + col("__local"))
  }

  /** Weighted SYSTEMATIC sampling without replacement, ∝ an integer
    * weight (token counts for a compute-budget-proportional corpus
    * subsample): lay every document's weight on the concatenated
    * number line (the [[concatChunk]] prefix sum), drop `k` evenly
    * spaced grid points S_j = ⌊j·W/k⌋ (j = 0..k−1, W = total weight),
    * and pick each document once per grid point inside its
    * [start, start+weight) interval. Inclusion probability is
    * proportional to weight (documents heavier than W/k are picked
    * multiple times — n_picks IS the sampling weight), the sample size
    * is EXACTLY k, and the whole scheme is integer arithmetic: no RNG,
    * no floats, bit-identical on any engine and any partitioning —
    * deterministic sampling in the q77 hash-split family, but
    * weight-proportional rather than uniform.
    *
    * Scale shape: the prefix sum is the bucketed two-level cumsum (no
    * global window); the grid-point count per document is a closed-form
    * expression `cnt(X) = min(k, ⌈k·X/W⌉)` evaluated per row against
    * the broadcast 1-row total — no join against a grid table, no
    * explode. Returns (id, weight, start_offset, n_picks) for the
    * picked documents (n_picks ≥ 1); Σ n_picks = k exactly.
    */
  def systematicSample(docs: DataFrame, idCol: String, weight: Column,
      k: Int, bucketSize: Long = 65536L): DataFrame = {
    require(k > 0, "sample size must be positive")
    val off = withStartOffsets(docs, idCol, weight, bucketSize)
    val total = off.agg(greatest(sum("n_tokens"), lit(1L)).as("__w"))
    // cnt(X) = min(k, ceil(k·X/W)) — grid points strictly below X.
    // k·W must fit in 64 bits (k ≤ 10⁶ against ~10¹² total tokens).
    off.crossJoin(broadcast(total))
      .withColumn("__hi", expr(s"least(CAST($k AS BIGINT), " +
        s"((start_offset + n_tokens) * $k + __w - 1) div __w)"))
      .withColumn("__lo", expr(s"least(CAST($k AS BIGINT), " +
        s"(start_offset * $k + __w - 1) div __w)"))
      .withColumn("n_picks", col("__hi") - col("__lo"))
      .filter(col("n_picks") > 0)
      .select(col("__id").as(idCol), col("n_tokens").as("weight"),
        col("start_offset"), col("n_picks"))
  }
}
