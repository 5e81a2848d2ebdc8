package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid resampling of irregular event streams — the gap-fill /
  * last-observation-carried-forward (LOCF) shape every metrics or
  * feature-engineering pipeline needs before windowed models can
  * consume event data: one row per (series, bucket) on a dense time
  * grid, buckets with no events carrying the most recent observed
  * value forward.
  *
  * Scale shape: the per-series grid is generated with
  * `sequence(first_bucket, last_bucket)` + explode — pure column
  * expressions, no driver-side loops and no global materialized
  * calendar table; the per-bucket aggregate is one hash aggregation
  * (map-side partial) and the carry-forward is a running
  * `last(ignoreNulls)` window PARTITIONED BY SERIES, so state never
  * crosses series boundaries and the fill parallelizes across the
  * series key like any other partitioned window. A series with years
  * of dense history explodes into at most (span/step) rows — bounded
  * by wall-clock time, not event volume.
  */
object TimeSeries {

  /** Resample `df` onto a dense per-series grid of `step`-sized buckets
    * spanning each series' own [first event, last event] range, with
    * per-bucket event count and LOCF of `valueCol`.
    *
    * "Last" within a bucket is made deterministic by `orderCols`
    * (typically (ts, event_id)): the carried value is the value of the
    * maximal row under that ordering, not whichever partition happened
    * to aggregate last. Returns `(seriesCol, bucket, n_events,
    * value_locf)`; `value_locf` is never null because each series'
    * grid starts at a bucket that contains its first event.
    *
    * `step` must be a calendar-stable unit (`"1 hour"`, `"15 minutes"`)
    * understood by both `date_trunc` (via `truncUnit`) and `sequence`.
    */
  def resampleLocf(df: DataFrame, seriesCol: String, tsCol: String,
      valueCol: String, orderCols: Seq[Column], truncUnit: String = "hour",
      step: String = "INTERVAL 1 HOUR"): DataFrame = {
    val bucketed = df.withColumn("__bucket", date_trunc(truncUnit, col(tsCol)))
    val hourly = bucketed
      .groupBy(col(seriesCol), col("__bucket"))
      .agg(count(lit(1)).as("__n"),
        max_by(col(valueCol), struct(orderCols: _*)).as("__last_v"))
    val grid = bucketed
      .groupBy(col(seriesCol))
      .agg(min(col("__bucket")).as("__h0"), max(col("__bucket")).as("__h1"))
      .select(col(seriesCol),
        explode(sequence(col("__h0"), col("__h1"), expr(step))).as("__bucket"))
    val w = Window.partitionBy(seriesCol).orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq(seriesCol, "__bucket"), "left")
      .select(col(seriesCol), col("__bucket").as("bucket"),
        coalesce(col("__n"), lit(0L)).as("n_events"),
        last(col("__last_v"), ignoreNulls = true).over(w).as("value_locf"))
  }

  /** [[resampleLocf]]'s grid with LINEAR INTERPOLATION instead of a
    * step function: an empty bucket takes the value lerped between the
    * previous and next OBSERVED buckets, positioned by time —
    * `vp + (vn − vp)·(t − tp)/(tn − tp)` — and tail buckets after the
    * last observation carry it forward (no extrapolation past data).
    * Observed buckets keep their own (deterministic, `orderCols`-max)
    * value. Interior buckets are never null: every series' grid is
    * bracketed by its own first/last event.
    *
    * Same scale shape as LOCF plus ONE extra window: the
    * next-observation lookup is a `first(ignoreNulls)` over the
    * following frame, still partitioned per series — two passes over
    * the per-series sorted grid, no extra shuffle (both windows share
    * the (series, bucket) sort). Result is FLOORED at micro-units
    * (`floor(x·10⁶)/10⁶`), not rounded: the lerp is bit-identical
    * IEEE arithmetic on any engine, but lerps of cent-valued series
    * over power-of-two-hour gaps land EXACTLY on 6-decimal halves
    * (e.g. 0.01·(1/64) = .00015625), where round-half conventions
    * disagree across engines — floor's discontinuity sits at exact
    * micro-units instead, which bit-identical inputs hit identically.
    */
  def resampleInterp(df: DataFrame, seriesCol: String, tsCol: String,
      valueCol: String, orderCols: Seq[Column], truncUnit: String = "hour",
      step: String = "INTERVAL 1 HOUR"): DataFrame = {
    val bucketed = df.withColumn("__bucket", date_trunc(truncUnit, col(tsCol)))
    val perBucket = bucketed
      .groupBy(col(seriesCol), col("__bucket"))
      .agg(count(lit(1)).as("__n"),
        max_by(col(valueCol), struct(orderCols: _*)).as("__last_v"))
    val grid = bucketed
      .groupBy(col(seriesCol))
      .agg(min(col("__bucket")).as("__h0"), max(col("__bucket")).as("__h1"))
      .select(col(seriesCol),
        explode(sequence(col("__h0"), col("__h1"), expr(step))).as("__bucket"))
    val wPrev = Window.partitionBy(seriesCol).orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(seriesCol).orderBy("__bucket")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsBucket = when(col("__last_v").isNotNull, col("__bucket"))
    val joined = grid.join(perBucket, Seq(seriesCol, "__bucket"), "left")
      .select(col(seriesCol), col("__bucket"),
        coalesce(col("__n"), lit(0L)).as("n_events"),
        last(col("__last_v"), ignoreNulls = true).over(wPrev).as("__pv"),
        last(obsBucket, ignoreNulls = true).over(wPrev).as("__pt"),
        first(col("__last_v"), ignoreNulls = true).over(wNext).as("__nv"),
        first(obsBucket, ignoreNulls = true).over(wNext).as("__nt"))
    val lerp =
      when(col("n_events") > 0, col("__pv"))
        .when(col("__nv").isNull, col("__pv"))
        .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
          (col("__bucket").cast("double") - col("__pt").cast("double")) /
          (col("__nt").cast("double") - col("__pt").cast("double")))
    joined.select(col(seriesCol), col("__bucket").as("bucket"), col("n_events"),
      (floor(lerp * lit(1000000.0)) / 1000000.0).as("value_interp"))
  }

  /** Rolling z-score anomaly detection — the self-calibrating outlier
    * flag for metric streams: each event is scored against the mean
    * and sample-stddev of its own series' PREVIOUS `lookback` events
    * (the current value never contaminates its own baseline), and
    * flagged when `|z| > sigmas`. Events with fewer than `minPrior`
    * predecessors (series warm-up) get a null score and are never
    * flagged, as is anything whose trailing window is constant
    * (sd = 0).
    *
    * Scale shape: ONE rows-frame window per series, ordered by
    * `orderCols` (make it a total order — ties would make "previous
    * N" ambiguous); all three aggregates (count/avg/stddev) share the
    * frame, so this is a single pass over each series partition.
    * Mean, stddev, and z are each rounded to 6 decimals — staged
    * rounding absorbs summation-order drift between engines before it
    * can compound through the division.
    */
  def rollingZscore(df: DataFrame, seriesCol: String, valueCol: String,
      orderCols: Seq[Column], lookback: Int = 20, minPrior: Int = 5,
      sigmas: Double = 3.0): DataFrame = {
    require(lookback >= minPrior && minPrior >= 2, "need lookback >= minPrior >= 2")
    val w = Window.partitionBy(seriesCol).orderBy(orderCols: _*)
      .rowsBetween(-lookback, -1)
    val scored = df
      .withColumn("__n_prior", count(lit(1)).over(w))
      .withColumn("__mu", round(avg(col(valueCol)).over(w), 6))
      .withColumn("__sd", round(stddev_samp(col(valueCol)).over(w), 6))
    val ok = col("__n_prior") >= minPrior && col("__sd") > 0
    val z = round((col(valueCol) - col("__mu")) / col("__sd"), 6)
    scored
      .withColumn("n_prior", col("__n_prior"))
      .withColumn("z", when(ok, z))
      .withColumn("is_anomaly", coalesce(when(ok, abs(z) > sigmas), lit(false)))
      .drop("__n_prior", "__mu", "__sd")
  }
}
