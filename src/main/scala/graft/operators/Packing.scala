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
      .withColumn("first_seq", expr(s"start_offset div $seqLen"))
      .withColumn("n_seqs",
        when(col("n_tokens") > 0,
          expr(s"(start_offset + n_tokens - 1) div $seqLen") - col("first_seq") + 1)
          .otherwise(lit(0L)))
      .select(col("__id").as(idCol), col("n_tokens"),
        col("start_offset"), col("first_seq"), col("n_seqs"))
  }
}
