package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling & splitting — the reproducibility
  * primitive a training-data pipeline needs that `rand(seed)` cannot
  * give: `rand` is engine- and partitioning-dependent, while a hash of
  * the row's key is a pure function of the data. The same document
  * lands in the same split on any engine, any cluster size, any run —
  * and the assignment survives re-partitioning, backfills and
  * incremental appends (new docs don't reshuffle old ones, unlike
  * reservoir or percentile sampling).
  *
  * md5 is the hash because both Spark and DuckDB (and effectively
  * every engine) produce bit-identical md5, so splits are auditable
  * end-to-end (q77's oracle recomputes the assignment in SQL).
  * Columns only — stays inside whole-stage codegen, no UDFs, no state.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from a key column: the first 8 md5
    * hex digits as an unsigned 32-bit int, mod buckets.
    */
  def hashBucket(key: Column, buckets: Int): Column = {
    require(buckets > 0, "buckets must be positive")
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % buckets
  }

  /** Keep a deterministic `fraction` of rows by key hash. */
  def hashSample(df: DataFrame, key: Column, fraction: Double,
      buckets: Int = 1000000): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    df.filter(hashBucket(key, buckets) < (fraction * buckets).toLong)
  }

  /** Per-group quota cap — the data-mixing primitive (per-domain /
    * per-language caps a corpus composition applies before training):
    * keep at most `quota` rows per group, chosen by key-hash rank with
    * the key itself as tiebreak. Like the splits above, the kept set is
    * a pure function of the data: any engine, any partitioning, any
    * backfill re-derives it, and growing one group never reshuffles
    * another's kept rows — it only competes within its own quota.
    *
    * One shuffle on the group columns; rank is windowed per group, so
    * skewed groups cost their own size, not the corpus's.
    *
    * Contract: `key` must be a UNIQUE, NON-NULL row identifier (like
    * the other samplers here). Duplicate keys tie in the rank order,
    * making the kept set partitioning-dependent; null keys sort
    * differently across engines (Spark NULLS FIRST, DuckDB NULLS
    * LAST), breaking the cross-engine re-derivation guarantee.
    */
  def quotaCap(df: DataFrame, groupCols: Seq[Column], key: Column,
      quota: Int): DataFrame = {
    require(quota > 0, "quota must be positive")
    val rk = Iterator.from(0).map(i => s"__qrank$i")
      .find(n => !df.columns.contains(n)).get
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols: _*)
      .orderBy(md5(key.cast("string")), key.cast("string"))
    df.withColumn(rk, row_number().over(w))
      .filter(col(rk) <= quota).drop(rk)
  }

  /** Named split label from ordered (name, weight) fractions summing
    * to ≤ 1 (remainder falls into `rest`): train/val/test carving.
    */
  def hashSplit(key: Column, weights: Seq[(String, Double)],
      rest: String = "rest", buckets: Int = 1000): Column = {
    require(weights.map(_._2).sum <= 1.0 + 1e-9, "weights must sum to <= 1")
    val b = hashBucket(key, buckets)
    var acc = 0.0
    var expr: Column = null
    weights.foreach { case (name, w) =>
      acc += w
      val cond = b < math.round(acc * buckets)
      expr = if (expr == null) when(cond, name) else expr.when(cond, name)
    }
    if (expr == null) lit(rest) else expr.otherwise(rest)
  }
}
