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

  /** Ordered conversion-funnel analysis — the product-analytics
    * staple: for each series (user), the earliest time it completed
    * step 1, then step 2 STRICTLY AFTER its step-1 event, then step 3
    * after that, etc. A user who clicks before ever viewing has not
    * "viewed then clicked": order matters, which is what separates a
    * funnel from five filters.
    *
    * `steps` are arbitrary predicates. Event order is (tsCol, tieCol)
    * — make it total per series or "earliest" is ambiguous.
    * `withinHours` bounds each transition (step i within N hours of
    * step i−1, the windowed-funnel convention); `None` = unbounded.
    *
    * Scale shape: one filtered aggregate per step, each grouped on the
    * SERIES key (same shuffle key every round, so the exchange is
    * reusable), joined back at series grain; step i's candidates
    * semi-filter against step i−1's completion row, so work shrinks
    * down-funnel. Never a window over the whole stream and never a
    * per-user collect.
    *
    * Returns one row per series that completed step 1's predicate AT
    * LEAST zero times — i.e. every distinct series in `df` — with
    * `step<i>_ts` (null = not reached), `steps_completed`, and
    * `converted` (all steps reached).
    */
  def funnel(df: DataFrame, seriesCol: String, tsCol: String, tieCol: String,
      steps: Seq[Column], withinHours: Option[Int] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(withinHours.forall(_ > 0), "withinHours must be positive")
    val evKey = struct(col(tsCol), col(tieCol))
    var acc = df.select(col(seriesCol)).distinct()
    steps.zipWithIndex.foreach { case (pred, i) =>
      val cand = df.filter(pred).select(col(seriesCol), evKey.as("__ek"))
      val reached =
        if (i == 0)
          cand.groupBy(seriesCol).agg(min(col("__ek")).as(s"__k$i"))
        else {
          val prevK = col(s"__k${i - 1}")
          val inWindow = withinHours match {
            case Some(h) => col("__ek").getField(tsCol) <=
              prevK.getField(tsCol) + expr(s"INTERVAL $h HOUR")
            case None => lit(true)
          }
          cand.join(acc.select(col(seriesCol), prevK), Seq(seriesCol))
            .filter(col("__ek") > prevK && inWindow)
            .groupBy(seriesCol).agg(min(col("__ek")).as(s"__k$i"))
        }
      acc = acc.join(reached, Seq(seriesCol), "left")
    }
    val stepTs = steps.indices.map(i =>
      col(s"__k$i").getField(tsCol).as(s"step${i + 1}_ts"))
    val completed = steps.indices.map(i =>
      when(col(s"__k$i").isNotNull, 1L).otherwise(0L)).reduce(_ + _)
    acc.select((col(seriesCol) +: stepTs) :+
      completed.as("steps_completed") :+
      col(s"__k${steps.size - 1}").isNotNull.as("converted"): _*)
  }

  /** First-order transition matrix over a typed event stream — the
    * Markov-chain summary of user behavior (next-action prediction,
    * anomalous-flow detection, funnel discovery): for every ordered
    * within-series (type → next type) step, its count and per-myriad
    * row-normalized probability. The final event of each series has
    * no successor and contributes nothing.
    *
    * One `lead` window per series (ordered by `orderCols` — make it
    * total) and two small aggregations at type-pair grain; the output
    * is |types|² rows regardless of stream size. All integer.
    */
  def transitionMatrix(df: DataFrame, seriesCol: String, typeCol: String,
      orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(seriesCol).orderBy(orderCols: _*)
    val tr = df
      .select(col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    val tot = tr.groupBy("from_type").agg(sum("n").as("__tot"))
    tr.join(tot, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("n * 10000 div __tot").as("p_pm"))
  }

  /** Cohort retention analysis — the product-analytics matrix: users
    * cohorted by their FIRST activity bucket (day/week), and for each
    * (cohort, offset) the share still exhibiting the `retained`
    * behavior that many buckets later. Retention is per-myriad integer
    * (`n_active·10⁴ div cohort_size`) — bit-exact on any engine.
    *
    * Scale shape: first-activity is one min-aggregate on the series
    * key; the activity matrix is a distinct over (series, offset) —
    * bounded by series·span, not event volume — joined back to
    * cohort-grain sizes. All shuffles are on the series key or the
    * (cohort, offset) grain; nothing is windowed over the stream.
    */
  def retention(df: DataFrame, seriesCol: String, tsCol: String,
      retained: Column, truncUnit: String = "day"): DataFrame = {
    val cohorts = df.groupBy(col(seriesCol))
      .agg(to_date(date_trunc(truncUnit, min(col(tsCol)))).as("cohort"))
    val active = df.filter(retained)
      .select(col(seriesCol), to_date(date_trunc(truncUnit, col(tsCol))).as("__b"))
      .join(cohorts, Seq(seriesCol))
      .select(col(seriesCol), col("cohort"),
        datediff(col("__b"), col("cohort")).cast("long").as("offset"))
      .distinct()
    val sizes = cohorts.groupBy("cohort").agg(count(lit(1)).as("cohort_size"))
    active.groupBy(col("cohort"), col("offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort"))
      .select(col("cohort"), col("offset"), col("n_active"), col("cohort_size"),
        expr("n_active * 10000 div cohort_size").as("retention_pm"))
  }

  /** Per-group winsorization — outlier clipping at the group's own
    * [pLo, pHi] percentiles (the standard robust-feature pre-step:
    * keep the row, clamp the tail). Exact interpolated percentiles
    * (the q84 contract — both engines define quantile k as
    * value[p·(n−1)] with linear interpolation), computed once per
    * group and joined back at group grain; the clamp itself is two
    * codegen comparisons per row. `clipped` compares at the same
    * 6-decimal precision the output value carries.
    */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, "need 0 <= pLo < pHi <= 1")
    val qs = df.groupBy(groupCol).agg(
      percentile(col(valueCol), lit(pLo)).as("__plo"),
      percentile(col(valueCol), lit(pHi)).as("__phi"))
    df.join(qs, Seq(groupCol))
      .withColumn("value_w",
        round(least(greatest(col(valueCol), col("__plo")), col("__phi")), 6))
      .withColumn("clipped",
        round(col(valueCol), 6) < round(col("__plo"), 6) ||
          round(col(valueCol), 6) > round(col("__phi"), 6))
      .drop("__plo", "__phi")
  }

  /** Per-group equi-width value histogram — the profiling/feature-
    * audit primitive: each group's value range [min, max] split into
    * `bins` equal bins, with the group's own range (a global range
    * would let one outlier group flatten everyone else's resolution).
    * Values exactly at the top edge fold into the last bin; a
    * constant-valued group lands entirely in bin 0.
    *
    * Two hash aggregations on the group key (range, then counts) and
    * one group-grain join — no windows, no broadcast-nested-loop: the
    * range table joins on the GROUP key. The bin index
    * `floor((v−lo)·bins/(hi−lo))` is pure IEEE arithmetic evaluated
    * identically on any engine; output is integer bins and counts
    * plus the raw (arithmetic-free) range endpoints.
    */
  def valueHistogram(df: DataFrame, groupCol: String, valueCol: String,
      bins: Int): DataFrame = {
    require(bins >= 1, "bins must be positive")
    val range = df.groupBy(groupCol)
      .agg(min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
    df.join(range, Seq(groupCol))
      .select(col(groupCol), col("lo"), col("hi"),
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(
            floor((col(valueCol) - col("lo")) * bins / (col("hi") - col("lo"))),
            lit(bins - 1L)).cast("long")).as("bin"))
      .groupBy(col(groupCol), col("bin"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"))
      .select(col(groupCol), col("bin"), col("n"), col("lo"), col("hi"))
  }

  /** Per-series autocorrelation at lags 1..`maxLag` over the hourly
    * bucket sequence — the periodicity/persistence probe (is today's
    * volume predictive of tomorrow's?) run before fitting any
    * forecasting model. ACF estimator with the standard full-series
    * denominator: acf(l) = Σ d_t·d_{t+l} / Σ d_t², where x_t is the
    * series' t-th OBSERVED hourly bucket sum in integer cents and
    * d_t = x_t − (Σx div n) deviates from the FLOOR mean — the
    * documented cross-engine contract (an exact rational mean would
    * force n²-scaled products that overflow int64 on long series;
    * the floor mean keeps num/den exact int64 sums, and the final
    * ratio is one IEEE divide rounded to 6, the q135 discipline).
    * Gaps in the hour grid collapse (lag = sequence position, not
    * wall-clock distance); a constant series (den = 0) scores 0.
    *
    * Scale shape: one hash aggregation to hourly grain, one stats
    * aggregation at series grain joined back on the series key, ONE
    * ordered window per series computing all `maxLag` leads in a
    * single pass (no per-lag re-sort), then an unpivot + final
    * series-grain aggregation. Everything partitions by the series
    * key; bucket counts bound the window, not event volume.
    */
  def autocorrelation(df: DataFrame, seriesCol: String, tsCol: String,
      valueCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val hourly = df
      .groupBy(col(seriesCol), date_trunc("hour", col(tsCol)).as("h"))
      .agg(sum(round(col(valueCol) * 100, 0).cast("long")).as("x"))
    val stats = hourly.groupBy(seriesCol)
      .agg(count(lit(1)).as("n"), sum("x").as("s"))
    val w = Window.partitionBy(seriesCol).orderBy("h")
    val dev = hourly.join(stats, Seq(seriesCol))
      .withColumn("d", col("x") - expr("s div n"))
    val withLeads = (1 to maxLag).foldLeft(dev) { (acc, l) =>
      acc.withColumn(s"__d$l", lead(col("d"), l).over(w))
    }
    val stacked = withLeads.select(col(seriesCol), col("d"),
      explode(array((1 to maxLag).map(l =>
        struct(lit(l).cast("long").as("lag"), col(s"__d$l").as("dl"))): _*)).as("p"))
      .select(col(seriesCol), col("d"), col("p.lag").as("lag"), col("p.dl").as("dl"))
    stacked.groupBy(col(seriesCol), col("lag"))
      .agg(count(col("dl")).as("n_pairs"),
        sum(when(col("dl").isNotNull, col("d") * col("dl"))).as("num"),
        sum(col("d") * col("d")).as("den"))
      .select(col(seriesCol), col("lag"), col("n_pairs"),
        when(col("den") === 0 || col("n_pairs") === 0, lit(0.0))
          .otherwise(round(col("num").cast("double") / col("den"), 6)).as("acf"))
  }

  /** Seasonal-naive residuals — each hourly bucket compared against
    * the SAME WALL-CLOCK hour one season earlier (default 24 h): the
    * day-over-day deviation monitor that catches "this 3 pm is not
    * like yesterday's 3 pm", which sequence-position lags (q134's
    * rolling z-score, [[levelShifts]]) cannot express when the grid
    * has gaps. Buckets whose seasonal ancestor was unobserved are
    * excluded (no imputation — the honest variant); residuals are
    * exact int64 cents and the output keeps only rows with
    * |residual| ≥ `minResidCents` (0 keeps everything).
    *
    * Scale shape: one hash aggregation to hourly grain, then an
    * equi-join of the hourly frame against itself on
    * (series, bucket − season) — equality-keyed, so it shuffles once
    * on the (series, bucket) key and never windows over the stream;
    * wall-clock span bounds the frame, not event volume.
    */
  def seasonalResiduals(df: DataFrame, seriesCol: String, tsCol: String,
      valueCol: String, seasonHours: Int = 24,
      minResidCents: Long = 0L): DataFrame = {
    require(seasonHours >= 1, "seasonHours must be >= 1")
    require(minResidCents >= 0, "minResidCents must be >= 0")
    val hourly = df
      .groupBy(col(seriesCol), date_trunc("hour", col(tsCol)).as("bucket"))
      .agg(sum(round(col(valueCol) * 100, 0).cast("long")).as("x"))
    val prior = hourly.select(col(seriesCol),
      (col("bucket") + expr(s"INTERVAL $seasonHours HOURS")).as("bucket"),
      col("x").as("x_prior"))
    hourly.join(prior, Seq(seriesCol, "bucket"))
      .withColumn("residual_cents", col("x") - col("x_prior"))
      .filter(abs(col("residual_cents")) >= minResidCents)
      .select(col(seriesCol), col("bucket"), col("x").as("cents"),
        col("x_prior").as("prior_cents"), col("residual_cents"))
  }

  /** Per-series least-squares trend over the hourly bucket SEQUENCE —
    * the closed-form linear regression (slope cents/bucket, intercept
    * cents) every capacity forecast and drift monitor starts from.
    * x is the 0-based sequence position, y the hourly cents sum; the
    * normal-equation sums n, Σx, Σy, Σxy, Σx² are exact int64, slope
    * is ONE divide `(n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²)` rounded 6, and
    * the intercept derives from the ROUNDED slope —
    * `(Σy − slope·Σx)/n` rounded 6 — so both engines compute identical
    * doubles from identical inputs (an exact rational intercept would
    * need Σy·den products past int64 on long series). A single-bucket
    * series has slope 0 (den = 0) and intercept = its own value.
    *
    * Scale shape: one hash aggregation to hourly grain, one
    * row_number window per series (sequence positions), one final
    * series-grain aggregation — nothing beyond the series key ever
    * shuffles, and the stats are map-side-partial sums.
    */
  def trend(df: DataFrame, seriesCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val hourly = df
      .groupBy(col(seriesCol), date_trunc("hour", col(tsCol)).as("h"))
      .agg(sum(round(col(valueCol) * 100, 0).cast("long")).as("y"))
    val w = Window.partitionBy(seriesCol).orderBy("h")
    val xy = hourly.withColumn("x", row_number().over(w).cast("long") - 1)
    xy.groupBy(seriesCol)
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .withColumn("__den", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("slope", when(col("__den") === 0, lit(0.0))
        .otherwise(round((col("n") * col("sxy") - col("sx") * col("sy"))
          .cast("double") / col("__den").cast("double"), 6)))
      .select(col(seriesCol), col("n"),
        col("slope"),
        round((col("sy").cast("double") - col("slope") * col("sx").cast("double"))
          / col("n").cast("double"), 6).as("intercept"))
  }

  /** Exponentially weighted moving average over the last `lookback`
    * OBSERVED hourly buckets per series — the trend-following smoother
    * (α = 1/2) behind every "current rate" metric. The DYADIC weight
    * contract makes it engine-exact: the window's m ≤ `lookback`
    * values x₀(oldest)..x₍ₘ₋₁₎(newest) combine as
    * `Σ xᵢ·2ⁱ / (2ᵐ − 1)` — newest halving backwards, the α=1/2
    * geometric profile with the truncation remainder folded into the
    * normalizer. Numerator and normalizer are exact int64 (cents ×
    * 2^(lookback−1)); the single IEEE divide rounds to 6 (the q135
    * discipline, where a literal α(1−α)ʲ float recurrence would
    * accumulate engine-order drift).
    *
    * Scale shape: one hash aggregation to hourly grain, then ONE
    * ordered per-series window whose frame carries at most `lookback`
    * values into a bounded fold — no recursive scan state, no
    * stream-wide window; bucket counts (wall-clock span) bound the
    * window input.
    */
  def ewma(df: DataFrame, seriesCol: String, tsCol: String,
      valueCol: String, lookback: Int): DataFrame = {
    // the numerator folds x·2^(m−1) for the newest bucket, so the safe
    // bound is data-dependent: |cents| must stay ≤ 2^(63−lookback).
    // Cap at 32 → any hourly bucket sum up to 2^31 cents (~$21M/hour
    // per series) is exact; beyond that the fold would overflow int64
    // (ANSI mode aborts rather than wrapping, but the cap keeps the
    // envelope honest instead of leaning on the abort)
    require(lookback >= 1 && lookback <= 32,
      "lookback must be in [1, 32] (cents·2^lookback must stay in int64; " +
        "at 32 any hourly sum < 2^31 cents is exact)")
    val hourly = df
      .groupBy(col(seriesCol), date_trunc("hour", col(tsCol)).as("bucket"))
      .agg(sum(round(col(valueCol) * 100, 0).cast("long")).as("x"))
    val w = Window.partitionBy(seriesCol).orderBy("bucket")
      .rowsBetween(-(lookback - 1), 0)
    // collect_list over a rows frame preserves frame order (oldest
    // first); the fold doubles the weight as it walks toward newest
    val folded = aggregate(col("__win"),
      struct(lit(0L).as("s"), lit(1L).as("p")),
      (acc, x) => struct((acc("s") + x * acc("p")).as("s"),
        (acc("p") * 2).as("p")))
    hourly.withColumn("__win", collect_list(col("x")).over(w))
      .withColumn("__f", folded)
      .select(col(seriesCol), col("bucket"),
        size(col("__win")).cast("long").as("n_window"),
        round(col("__f")("s").cast("double") /
          (col("__f")("p") - 1).cast("double"), 6).as("ewma"))
  }

  /** Gap-based sessionization into PER-SESSION RECORDS — the richer
    * sibling of the per-series session COUNT (q61): one output row per
    * (series, session) carrying its ordinal index, start/end instants,
    * event count, and duration. A session breaks when consecutive
    * events (ordered by `tsCol` then `tieCol` for determinism) are more
    * than `gapSeconds` apart — the classic web-analytics /
    * user-activity definition (reference analog: the event-stream
    * grouping its selector queries run over vg tables, e.g.
    * views.lisp:544+ consume ordered per-key streams).
    *
    * Scale shape: the lag probe and the running session-index sum are
    * two window functions over the SAME (series) partitioning and
    * (ts, tie) sort, so Catalyst plans one exchange + one sort for
    * both; the per-session rollup then hash-aggregates on
    * (series, session_idx) — map-side partial — and nothing ever
    * windows over the whole stream. A series' state is its own events
    * only, so the operator parallelizes across the series key exactly
    * like any partitioned window at 100 TB.
    */
  def sessions(df: DataFrame, seriesCol: String, tsCol: String,
      tieCol: String, gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, "gapSeconds must be > 0")
    val w = Window.partitionBy(seriesCol).orderBy(col(tsCol), col(tieCol))
    val run = Window.partitionBy(seriesCol).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col(tsCol).cast("long") - col("__prev").cast("long") > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("__new")).over(run))
      .groupBy(col(seriesCol), col("session_idx"))
      .agg(min(col(tsCol)).as("start_ts"), max(col(tsCol)).as("end_ts"),
        count(lit(1)).as("n_events"))
      .withColumn("duration_s",
        col("end_ts").cast("long") - col("start_ts").cast("long"))
  }

  /** Level-shift (changepoint-candidate) detection via two-sided
    * sliding windows over the per-series hourly sequence: at each
    * OBSERVED hourly bucket with `w` full buckets on each side, compare
    * the trailing-w sum (buckets t−w..t−1) against the leading-w sum
    * (t..t+w−1); a large |lead − trail| marks a mean shift at t. The
    * two-window scan statistic is the standard changepoint screen
    * (CUSUM's windowed cousin) that, unlike recursive CUSUM, is
    * expressible as ONE ordered window pass — no sequential scan state.
    * All arithmetic is exact int64 cents (`diff_cents` = lead − trail
    * over integer bucket sums); callers threshold on |diff|, and the
    * output keeps only candidates with `|diff_cents| >= minDiffCents`.
    *
    * Scale shape: one hash aggregation to hourly grain, then two
    * framed sums over the SAME per-series sort (one exchange + sort,
    * both frames computed in a single window pass). Bucket counts —
    * wall-clock span, not event volume — bound the window input.
    */
  def levelShifts(df: DataFrame, seriesCol: String, tsCol: String,
      valueCol: String, w: Int, minDiffCents: Long): DataFrame = {
    require(w >= 1, "window must be >= 1")
    val hourly = df
      .groupBy(col(seriesCol), date_trunc("hour", col(tsCol)).as("bucket"))
      .agg(sum(round(col(valueCol) * 100, 0).cast("long")).as("x"))
    val ord = Window.partitionBy(seriesCol).orderBy("bucket")
    val trail = ord.rowsBetween(-w, -1)
    val lead = ord.rowsBetween(0, w - 1)
    hourly
      .withColumn("__nt", count(lit(1)).over(trail))
      .withColumn("__nl", count(lit(1)).over(lead))
      .withColumn("trail_cents", sum(col("x")).over(trail))
      .withColumn("lead_cents", sum(col("x")).over(lead))
      .filter(col("__nt") === w && col("__nl") === w)
      .withColumn("diff_cents", col("lead_cents") - col("trail_cents"))
      .filter(abs(col("diff_cents")) >= minDiffCents)
      .select(col(seriesCol), col("bucket"), col("trail_cents"),
        col("lead_cents"), col("diff_cents"))
  }
}
