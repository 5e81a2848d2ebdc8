package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two dataset populations — the
  * corpus-regression gate a training pipeline runs between snapshots
  * ("did today's crawl shift the length/language mix enough to retrain
  * the filters?"). Not a reference operator: the reference stops at
  * per-dataset statistics (views + aggregates); drift across VERSIONS
  * is the natural extension once snapshots are first-class (our MVCC
  * epochs — see DriftSpec for the as-of composition).
  *
  * Design for 100 TB:
  *  - NO quantile sketches for the bin edges. Approximate quantiles are
  *    non-deterministic across engines/partitionings, which makes the
  *    metric itself flap under re-partitioning — useless as a GATE. The
  *    edges here are fixed-width over the union's exact [min, max]: one
  *    all-map-side min/max pass, then one binning pass with map-side
  *    combine into at most `nBins` groups. Two scans, a one-row
  *    broadcast, an nBins-row shuffle — nothing driver-side, nothing
  *    order-dependent.
  *  - Metrics leave as integer parts-per-million (categorical: exact
  *    integer division; numeric PSI/JS: rounded at ppm grain, which
  *    absorbs last-ulp `ln` differences between engines) so results
  *    hash-compare exactly.
  *  - Laplace (+1) smoothing on the PSI/JS probabilities keeps every
  *    bin's term finite without an epsilon knob, and stays in integer
  *    numerators/denominators so both engines produce identical
  *    doubles before the single rounding.
  */
object Drift {

  /** The fixed-width bin of `v` against edges [lo, hi]: out-of-range
    * values clamp into the edge bins (a no-op when the edges span the
    * data, as in [[numericBinned]]; load-bearing when binning an
    * unbounded arrival stream against a PINNED reference histogram,
    * which cannot know the future range — q207).
    */
  def binExpr(v: Column, lo: Column, hi: Column, nBins: Int): Column =
    when(hi === lo, lit(0L))
      .otherwise(greatest(lit(0L), least(lit(nBins - 1L),
        floor((v - lo) * nBins / (hi - lo)))))
      .cast("long")

  /** (bin, c_a, c_b) over `nBins` fixed-width bins spanning the exact
    * [min, max] of the UNION of both populations — shared deterministic
    * edges. Every bin appears, including empty ones (the smoothed
    * metrics need them: an empty-empty bin still contributes when the
    * population sizes differ).
    */
  def numericBinned(a: DataFrame, b: DataFrame, valueCol: String, nBins: Int): DataFrame = {
    val spark = a.sparkSession
    val tagged = a.select(col(valueCol).cast("double").as("v"), lit("a").as("side"))
      .unionByName(b.select(col(valueCol).cast("double").as("v"), lit("b").as("side")))
    val stats = tagged.agg(min("v").as("lo"), max("v").as("hi"))
    val counts = tagged.crossJoin(broadcast(stats))
      .withColumn("bin", binExpr(col("v"), col("lo"), col("hi"), nBins))
      .groupBy("bin")
      .agg(sum(when(col("side") === "a", 1L).otherwise(0L)).as("c_a"),
        sum(when(col("side") === "b", 1L).otherwise(0L)).as("c_b"))
    spark.range(nBins).select(col("id").as("bin"))
      .join(counts, Seq("bin"), "left")
      .na.fill(0L, Seq("c_a", "c_b"))
  }

  /** One-row drift summary over a numeric feature:
    * (n_a, n_b, psi_ppm, js_ppm, tvd_ppm).
    *  - psi: Population Stability Index, Σ (pA−pB)·ln(pA/pB) over the
    *    Laplace-smoothed bin probabilities (industry gate: <0.1 stable,
    *    >0.25 shifted);
    *  - js: Jensen–Shannon divergence (natural log, ≤ ln 2) — bounded,
    *    symmetric, safe to threshold;
    *  - tvd: total variation distance on the RAW (unsmoothed)
    *    proportions, ½·Σ|cA/nA − cB/nB|.
    * All as round-half-up parts-per-million BIGINTs.
    */
  def numericDrift(a: DataFrame, b: DataFrame, valueCol: String, nBins: Int): DataFrame =
    summarize(numericBinned(a, b, valueCol, nBins), nBins)

  /** The drift summary from an already-binned (bin, c_a, c_b) frame
    * covering all `nBins` bins — shared by [[numericDrift]] and the
    * streaming monitor, whose `c_b` column arrives from a streaming
    * aggregation over pinned reference edges.
    */
  def summarize(binned: DataFrame, nBins: Int): DataFrame = {
    val totals = binned.agg(sum("c_a").as("n_a"), sum("c_b").as("n_b"))
    val pA = (col("c_a") + 1).cast("double") / (col("n_a") + nBins).cast("double")
    val pB = (col("c_b") + 1).cast("double") / (col("n_b") + nBins).cast("double")
    val m = (pA + pB) / 2.0
    binned.crossJoin(broadcast(totals))
      .agg(
        max("n_a").as("n_a"), max("n_b").as("n_b"),
        round(sum((pA - pB) * log(pA / pB)) * 1000000.0, 0).cast("long").as("psi_ppm"),
        round(sum(pA * log(pA / m) * 0.5 + pB * log(pB / m) * 0.5) * 1000000.0, 0)
          .cast("long").as("js_ppm"),
        round(sum(abs(col("c_a").cast("double") / greatest(col("n_a"), lit(1L)).cast("double")
            - col("c_b").cast("double") / greatest(col("n_b"), lit(1L)).cast("double"))) * 500000.0, 0)
          .cast("long").as("tvd_ppm"))
  }

  /** STRATIFIED drift: one [[numericDrift]] summary row PER GROUP
    * (language, source, shard...) — what a production monitor actually
    * reports, because an aggregate PSI can read flat while one
    * language's distribution collapses. Bin edges are per-group
    * union-[min,max] (each stratum is its own monitor), so every row
    * equals `numericDrift(a.filter(g), b.filter(g))` exactly — the
    * DriftSpec contract.
    *
    * Scale shape: the group key makes every join EQUI (stats join,
    * totals join — no scalar crosses at all, unlike the single-group
    * path's one-row broadcasts); bins materialize per group via a
    * generate (explode(sequence)), not a cross join; output
    * cardinality = |groups|. One tagged scan, two grouped
    * aggregations, one groups×nBins-row join.
    */
  def groupedNumericDrift(a: DataFrame, b: DataFrame, groupCol: String,
      valueCol: String, nBins: Int): DataFrame = {
    val tagged = a.select(col(groupCol).as("g"), col(valueCol).cast("double").as("v"),
      lit("a").as("side"))
      .unionByName(b.select(col(groupCol).as("g"),
        col(valueCol).cast("double").as("v"), lit("b").as("side")))
    val stats = tagged.groupBy("g").agg(min("v").as("lo"), max("v").as("hi"))
    val counts = tagged.join(broadcast(stats), Seq("g"))
      .withColumn("bin", binExpr(col("v"), col("lo"), col("hi"), nBins))
      .groupBy("g", "bin")
      .agg(sum(when(col("side") === "a", 1L).otherwise(0L)).as("c_a"),
        sum(when(col("side") === "b", 1L).otherwise(0L)).as("c_b"))
    val full = stats
      .select(col("g"), explode(sequence(lit(0L), lit(nBins - 1L))).as("bin"))
      .join(counts, Seq("g", "bin"), "left")
      .na.fill(0L, Seq("c_a", "c_b"))
    val totals = full.groupBy("g").agg(sum("c_a").as("n_a"), sum("c_b").as("n_b"))
    val pA = (col("c_a") + 1).cast("double") / (col("n_a") + nBins).cast("double")
    val pB = (col("c_b") + 1).cast("double") / (col("n_b") + nBins).cast("double")
    val m = (pA + pB) / 2.0
    full.join(broadcast(totals), Seq("g"))
      .groupBy("g")
      .agg(
        max("n_a").as("n_a"), max("n_b").as("n_b"),
        round(sum((pA - pB) * log(pA / pB)) * 1000000.0, 0).cast("long").as("psi_ppm"),
        round(sum(pA * log(pA / m) * 0.5 + pB * log(pB / m) * 0.5) * 1000000.0, 0)
          .cast("long").as("js_ppm"),
        round(sum(abs(col("c_a").cast("double") / greatest(col("n_a"), lit(1L)).cast("double")
            - col("c_b").cast("double") / greatest(col("n_b"), lit(1L)).cast("double"))) * 500000.0, 0)
          .cast("long").as("tvd_ppm"))
  }

  /** Per-category frequency drift over a key column — all-integer
    * (exact ppm by integer division), one row per key present in
    * EITHER population: (key, c_a, c_b, p_a_ppm, p_b_ppm, dp_ppm).
    * One grouped count with map-side combine + a one-row broadcast;
    * output cardinality = |distinct keys|.
    */
  def categoricalDrift(a: DataFrame, b: DataFrame, keyCol: String): DataFrame = {
    val tagged = a.select(col(keyCol).as("key"), lit("a").as("side"))
      .unionByName(b.select(col(keyCol).as("key"), lit("b").as("side")))
    val counts = tagged.groupBy("key")
      .agg(sum(when(col("side") === "a", 1L).otherwise(0L)).as("c_a"),
        sum(when(col("side") === "b", 1L).otherwise(0L)).as("c_b"))
    val totals = counts.agg(sum("c_a").as("n_a"), sum("c_b").as("n_b"))
    counts.crossJoin(broadcast(totals))
      .select(col("key"), col("c_a"), col("c_b"),
        expr("(c_a * 1000000) div n_a").as("p_a_ppm"),
        expr("(c_b * 1000000) div n_b").as("p_b_ppm"),
        abs(expr("(c_a * 1000000) div n_a") - expr("(c_b * 1000000) div n_b"))
          .as("dp_ppm"))
  }
}
