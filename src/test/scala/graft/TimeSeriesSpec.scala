package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

/** Gap-fill / LOCF resampling contracts (q128) on hand-built streams
  * where every grid row is computable by eye.
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("resampleLocf: dense grid, zero-event buckets carry the last value") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:10:00"), 1.0, 101L),
      (1L, ts("2024-01-01 00:50:00"), 2.0, 102L), // later in same bucket → carried
      (1L, ts("2024-01-01 03:20:00"), 5.0, 103L), // hours 01,02 are gaps
      (2L, ts("2024-01-01 10:00:00"), 7.0, 104L)  // single-event series: one row
    ).toDF("user_id", "ts", "value", "event_id")
    val out = TimeSeries.resampleLocf(ev, "user_id", "ts", "value",
        Seq(col("ts"), col("event_id")))
      .orderBy("user_id", "bucket")
      .as[(Long, Timestamp, Long, Double)].collect()
    assert(out === Array(
      (1L, ts("2024-01-01 00:00:00"), 2L, 2.0),
      (1L, ts("2024-01-01 01:00:00"), 0L, 2.0),
      (1L, ts("2024-01-01 02:00:00"), 0L, 2.0),
      (1L, ts("2024-01-01 03:00:00"), 1L, 5.0),
      (2L, ts("2024-01-01 10:00:00"), 1L, 7.0)))
  }

  test("resampleLocf: within-bucket last is pinned by the order columns, not arrival") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:30:00"), 9.0, 202L), // same ts: higher event_id wins
      (1L, ts("2024-01-01 00:30:00"), 1.0, 201L)
    ).toDF("user_id", "ts", "value", "event_id").repartition(7)
    val out = TimeSeries.resampleLocf(ev, "user_id", "ts", "value",
        Seq(col("ts"), col("event_id")))
      .as[(Long, Timestamp, Long, Double)].collect()
    assert(out === Array((1L, ts("2024-01-01 00:00:00"), 2L, 9.0)))
  }

  test("resampleLocf: grid size is span-bounded, not event-bounded") {
    // 1000 events inside one hour → exactly one grid row
    val ev = (1 to 1000).map(i =>
        (1L, ts(f"2024-01-01 05:00:${i % 60}%02d.${i % 1000}%03d"), i.toDouble, i.toLong))
      .toDF("user_id", "ts", "value", "event_id")
    val out = TimeSeries.resampleLocf(ev, "user_id", "ts", "value",
      Seq(col("ts"), col("event_id")))
    assert(out.count() === 1L)
    assert(out.head().getLong(2) === 1000L)
  }

  test("resampleInterp: interior gaps lerp by time, tail carries forward") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:30:00"), 1.0, 301L),
      (1L, ts("2024-01-01 04:10:00"), 9.0, 302L), // superseded within its bucket
      (1L, ts("2024-01-01 04:40:00"), 5.0, 303L), // bucket-4 value: later wins → lerp 1→5
      (2L, ts("2024-01-01 08:15:00"), 2.0, 304L),
      (2L, ts("2024-01-01 10:15:00"), 4.0, 305L)  // hour 9 lerps to 3
    ).toDF("user_id", "ts", "value", "event_id")
    val out = TimeSeries.resampleInterp(ev, "user_id", "ts", "value",
        Seq(col("ts"), col("event_id")))
      .orderBy("user_id", "bucket")
      .as[(Long, Timestamp, Long, Double)].collect()
    assert(out === Array(
      (1L, ts("2024-01-01 00:00:00"), 1L, 1.0),
      (1L, ts("2024-01-01 01:00:00"), 0L, 2.0), // 1 + (5-1)*1/4: lerp on BUCKET values
      (1L, ts("2024-01-01 02:00:00"), 0L, 3.0),
      (1L, ts("2024-01-01 03:00:00"), 0L, 4.0),
      (1L, ts("2024-01-01 04:00:00"), 2L, 5.0), // observed bucket keeps its own last
      (2L, ts("2024-01-01 08:00:00"), 1L, 2.0),
      (2L, ts("2024-01-01 09:00:00"), 0L, 3.0),
      (2L, ts("2024-01-01 10:00:00"), 1L, 4.0)))
  }

  test("resampleInterp: micro-unit floor contract on sub-micro lerp steps") {
    // cent step over a 64-hour gap: increments of 0.01/64 = 0.00015625
    // land exactly on 6-decimal halves — the floor contract truncates
    // them identically on every engine (0.00015625 → 0.000156)
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 0.0, 401L),
      (1L, ts("2024-01-03 16:00:00"), 0.01, 402L)
    ).toDF("user_id", "ts", "value", "event_id")
    val out = TimeSeries.resampleInterp(ev, "user_id", "ts", "value",
        Seq(col("ts"), col("event_id")))
      .orderBy("bucket")
      .as[(Long, Timestamp, Long, Double)].collect()
    assert(out.length === 65)
    assert(out(1)._4 === 0.000156) // floor(156.25 micro) / 1e6
    assert(out(2)._4 === 0.000312) // floor(312.5 micro) — an exact half
    assert(out(64)._4 === 0.01)
  }

  test("rollingZscore: spike flags, warm-up and constant baselines never do") {
    val ev = Seq(
      (1L, 101L, 1.0), (1L, 102L, 2.0), (1L, 103L, 1.0), (1L, 104L, 2.0),
      (1L, 105L, 1.0), (1L, 106L, 100.0), // 5 priors, sd>0 → flagged
      (2L, 201L, 5.0), (2L, 202L, 5.0), (2L, 203L, 5.0), (2L, 204L, 5.0),
      (2L, 205L, 5.0), (2L, 206L, 99.0)   // constant baseline: sd=0 → not flagged
    ).toDF("user_id", "event_id", "value")
    val out = TimeSeries.rollingZscore(ev, "user_id", "value",
        Seq(col("event_id")), lookback = 20, minPrior = 5, sigmas = 3.0)
      .orderBy("event_id")
      .select("event_id", "n_prior", "z", "is_anomaly")
      .collect()
    // warm-up rows (fewer than 5 priors): null z, never anomalous
    (0 to 4).foreach { i =>
      assert(out(i).isNullAt(2) && !out(i).getBoolean(3), s"row $i")
    }
    // the spike: mu=1.4, sd=round(sqrt(0.3),6)=0.547723, z=round(98.6/sd,6)
    assert(out(5).getLong(1) === 5L)
    assert(out(5).getDouble(2) === 180.018002)
    assert(out(5).getBoolean(3))
    // constant-baseline series: sd=0 → null z even at the spike
    assert(out(11).isNullAt(2) && !out(11).getBoolean(3))
  }

  test("funnel: order matters, windows bound transitions, earliest completion wins") {
    val ev = Seq(
      // user 1: clean view → click → purchase inside the windows
      (1L, ts("2024-01-01 00:00:00"), "view", 1L),
      (1L, ts("2024-01-01 02:00:00"), "click", 2L),
      (1L, ts("2024-01-01 05:00:00"), "purchase", 3L),
      // user 2: click BEFORE the first view never counts
      (2L, ts("2024-01-01 00:00:00"), "click", 4L),
      (2L, ts("2024-01-01 01:00:00"), "view", 5L),
      // user 3: click 30h after view — outside the 24h window
      (3L, ts("2024-01-01 00:00:00"), "view", 6L),
      (3L, ts("2024-01-02 06:00:00"), "click", 7L),
      // user 4: purchase before the click doesn't complete the funnel
      (4L, ts("2024-01-01 00:00:00"), "view", 8L),
      (4L, ts("2024-01-01 01:00:00"), "purchase", 9L),
      (4L, ts("2024-01-01 02:00:00"), "click", 10L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = TimeSeries.funnel(ev, "user_id", "ts", "event_id",
        Seq(col("event_type") === "view", col("event_type") === "click",
          col("event_type") === "purchase"), withinHours = Some(24))
      .orderBy("user_id")
      .select("user_id", "steps_completed", "converted")
      .as[(Long, Long, Boolean)].collect()
    assert(out === Array(
      (1L, 3L, true), (2L, 1L, false), (3L, 1L, false), (4L, 2L, false)))
  }

  test("funnel: later same-key completions don't displace the earliest") {
    // two qualifying clicks: the funnel pins the FIRST one, so the
    // purchase window anchors there
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "view", 1L),
      (1L, ts("2024-01-01 01:00:00"), "click", 2L),
      (1L, ts("2024-01-03 00:00:00"), "click", 3L),
      (1L, ts("2024-01-03 01:00:00"), "purchase", 4L) // within 24h of click#2 only
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = TimeSeries.funnel(ev, "user_id", "ts", "event_id",
        Seq(col("event_type") === "view", col("event_type") === "click",
          col("event_type") === "purchase"), withinHours = Some(24))
      .select("steps_completed").head().getLong(0)
    assert(out === 2L) // anchored at the first click: purchase out of window
  }

  test("transitionMatrix: within-series ordered steps, row-normalized") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "a", 1L),
      (1L, ts("2024-01-01 01:00:00"), "b", 2L),
      (1L, ts("2024-01-01 02:00:00"), "a", 3L),
      (1L, ts("2024-01-01 03:00:00"), "c", 4L),
      (2L, ts("2024-01-01 00:00:00"), "a", 5L),
      (2L, ts("2024-01-01 01:00:00"), "b", 6L),
      (3L, ts("2024-01-01 00:00:00"), "z", 7L) // singleton: no transition
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = TimeSeries.transitionMatrix(ev, "user_id", "event_type",
        Seq(col("ts"), col("event_id")))
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Long)].collect()
    // a→b twice (users 1, 2), a→c once; b→a once. No cross-user steps,
    // no step out of the singleton
    assert(out === Array(
      ("a", "b", 2L, 6666L), ("a", "c", 1L, 3333L), ("b", "a", 1L, 10000L)))
  }

  test("retention: day cohorts, behavior-gated activity, per-myriad shares") {
    val ev = Seq(
      // cohort 2024-01-01: users 1,2. User 1 purchases on day 0 and 2;
      // user 2 purchases on day 2 only (their view on day 1 is not the
      // retained behavior)
      (1L, ts("2024-01-01 10:00:00"), "purchase", 1L),
      (1L, ts("2024-01-03 09:00:00"), "purchase", 2L),
      (2L, ts("2024-01-01 11:00:00"), "view", 3L),
      (2L, ts("2024-01-02 11:00:00"), "view", 4L),
      (2L, ts("2024-01-03 11:00:00"), "purchase", 5L),
      // cohort 2024-01-02: user 3, never purchases
      (3L, ts("2024-01-02 08:00:00"), "view", 6L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = TimeSeries.retention(ev, "user_id", "ts",
        col("event_type") === "purchase")
      .orderBy("cohort", "offset")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out === Array(
      ("2024-01-01", 0L, 1L, 2L, 5000L), // day 0: only user 1
      ("2024-01-01", 2L, 2L, 2L, 10000L))) // day 2: both
    // user 3's cohort never exhibits the behavior → no rows at all
  }

  test("winsorize: clamps at the group's own percentiles, flags the tails") {
    // group a: 1..20 → p05 = 1.95, p95 = 19.05 (linear interpolation)
    val df = ((1 to 20).map(v => ("a", v.toLong, v.toDouble)) :+ ("b", 21L, 5.0))
      .toDF("g", "id", "v")
    val out = TimeSeries.winsorize(df, "g", "v")
      .orderBy("id")
      .select("id", "value_w", "clipped")
      .as[(Long, Double, Boolean)].collect()
    assert(out(0) === ((1L, 1.95, true)))   // clamped up
    assert(out(9) === ((10L, 10.0, false))) // interior untouched
    assert(out(19) === ((20L, 19.05, true))) // clamped down
    // singleton group: p05 = p95 = the value itself, nothing clips
    assert(out(20) === ((21L, 5.0, false)))
    assert(out.count(_._3) === 2)
  }

  test("valueHistogram: per-group ranges, top-edge fold, constant group") {
    val df = ((0 to 10).map(v => ("a", v.toDouble)) :+ ("b", 7.0) :+ ("b", 7.0))
      .toDF("g", "v")
    val out = TimeSeries.valueHistogram(df, "g", "v", bins = 5)
      .orderBy("g", "bin")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(out === Array(
      ("a", 0L, 2L, 0.0, 10.0), ("a", 1L, 2L, 0.0, 10.0),
      ("a", 2L, 2L, 0.0, 10.0), ("a", 3L, 2L, 0.0, 10.0),
      ("a", 4L, 3L, 0.0, 10.0), // 8, 9, and the top edge 10 fold here
      ("b", 0L, 2L, 7.0, 7.0))) // constant group: single bin 0
  }

  test("rollingZscore: the baseline excludes the current value and respects lookback") {
    // lookback=2: row 4's baseline is rows 2,3 only
    val ev = Seq(
      (1L, 1L, 10.0), (1L, 2L, 1.0), (1L, 3L, 3.0), (1L, 4L, 2.0)
    ).toDF("user_id", "event_id", "value")
    val out = TimeSeries.rollingZscore(ev, "user_id", "value",
        Seq(col("event_id")), lookback = 2, minPrior = 2, sigmas = 1.0)
      .orderBy("event_id").select("n_prior", "z").collect()
    assert(out(3).getLong(0) === 2L)
    // baseline {1,3}: mu=2, sd=round(sqrt(2),6)=1.414214; z=(2-2)/sd=0
    assert(out(3).getDouble(1) === 0.0)
  }

  test("autocorrelation: hand-computed lags, constant and singleton series are 0") {
    // series a: hourly sums 100..600 cents (hour 0 split across two
    // events to pin the bucket-sum step). Floor mean 350, den 175000:
    //   lag1 87500/175000 = 0.5; lag2 10000/175000 → 0.057143;
    //   lag3 −47500/175000 → −0.271429
    val ev = (Seq(
      ("a", ts("2024-01-01 00:10:00"), 0.40), ("a", ts("2024-01-01 00:40:00"), 0.60),
      ("a", ts("2024-01-01 01:30:00"), 2.00), ("a", ts("2024-01-01 02:30:00"), 3.00),
      ("a", ts("2024-01-01 03:30:00"), 4.00), ("a", ts("2024-01-01 04:30:00"), 5.00),
      ("a", ts("2024-01-01 05:30:00"), 6.00)) ++
      Seq(0, 1, 2).map(h => ("b", ts(s"2024-01-01 0$h:00:00"), 5.00)) :+
      (("c", ts("2024-01-01 00:00:00"), 9.99)))
      .toDF("event_type", "ts", "value")
    val out = TimeSeries.autocorrelation(ev, "event_type", "ts", "value", maxLag = 3)
      .orderBy("event_type", "lag")
      .as[(String, Long, Long, Double)].collect()
    assert(out === Array(
      ("a", 1L, 5L, 0.5), ("a", 2L, 4L, 0.057143), ("a", 3L, 3L, -0.271429),
      ("b", 1L, 2L, 0.0), ("b", 2L, 1L, 0.0), ("b", 3L, 0L, 0.0),
      ("c", 1L, 0L, 0.0), ("c", 2L, 0L, 0.0), ("c", 3L, 0L, 0.0)))
  }

  test("sessions: gap splits, ordinal indexing, duration, ties by tie column") {
    val ev = Seq(
      // user 1: two events 10 min apart, then a 40-min gap → session 2
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (1L, ts("2024-01-01 00:10:00"), 2L),
      (1L, ts("2024-01-01 00:50:30"), 3L),
      // user 2: single event → one zero-duration session
      (2L, ts("2024-01-01 09:00:00"), 4L),
      // user 1 session 2 continues exactly AT the gap bound (1800 s
      // is NOT a break: the contract is strictly-greater)
      (1L, ts("2024-01-01 01:20:30"), 5L)
    ).toDF("user_id", "ts", "event_id").repartition(5)
    val out = TimeSeries.sessions(ev, "user_id", "ts", "event_id", gapSeconds = 1800L)
      .orderBy("user_id", "session_idx")
      .select("user_id", "session_idx", "n_events", "duration_s")
      .as[(Long, Long, Long, Long)].collect()
    assert(out === Array(
      (1L, 1L, 2L, 600L),   // 00:00 → 00:10
      (1L, 2L, 2L, 1800L),  // 00:50:30 → 01:20:30 (exactly-1800 joins)
      (2L, 1L, 1L, 0L)))
  }

  test("seasonalResiduals: wall-clock ancestor join, gap honesty, threshold") {
    val ev = Seq(
      ("a", ts("2024-01-01 09:30:00"), 1.00), // day-1 9am: 100
      ("a", ts("2024-01-02 09:15:00"), 3.00), // day-2 9am: 300 → residual +200
      ("a", ts("2024-01-02 10:00:00"), 5.00), // day-1 10am unobserved → excluded
      ("a", ts("2024-01-03 09:59:00"), 3.00), // day-3 9am: 300 → residual 0
      ("b", ts("2024-01-02 09:00:00"), 9.00)  // no ancestor → excluded
    ).toDF("event_type", "ts", "value").repartition(3)
    val all = TimeSeries.seasonalResiduals(ev, "event_type", "ts", "value")
      .orderBy("bucket").select("cents", "prior_cents", "residual_cents")
      .as[(Long, Long, Long)].collect()
    assert(all === Array((300L, 100L, 200L), (300L, 300L, 0L)))
    // threshold keeps only the real deviation
    val flagged = TimeSeries.seasonalResiduals(ev, "event_type", "ts", "value",
        minResidCents = 1L)
      .select("residual_cents").as[Long].collect()
    assert(flagged === Array(200L))
  }

  test("trend: exact normal-equation slope/intercept, singleton contract") {
    // series a: perfect line 100, 300, 500 cents at x=0,1,2 →
    // slope 200 cents/bucket, intercept 100; series b singleton →
    // slope 0, intercept = own value
    val ev = Seq(
      ("a", ts("2024-01-01 00:30:00"), 1.00),
      ("a", ts("2024-01-01 01:30:00"), 3.00),
      ("a", ts("2024-01-01 02:30:00"), 5.00),
      ("b", ts("2024-01-01 00:00:00"), 7.50)).toDF("event_type", "ts", "value")
      .repartition(3)
    val out = TimeSeries.trend(ev, "event_type", "ts", "value")
      .orderBy("event_type").as[(String, Long, Double, Double)].collect()
    assert(out === Array(("a", 3L, 200.0, 100.0), ("b", 1L, 0.0, 750.0)))
  }

  test("ewma: dyadic weights, truncation fold, exact window entry/exit") {
    // hourly cents 100, 200, 400 with lookback 2:
    //   t0: 100/1; t1: (100·1 + 200·2)/3; t2: (200·1 + 400·2)/3
    val ev = Seq(
      ("a", ts("2024-01-01 00:30:00"), 1.00),
      ("a", ts("2024-01-01 01:30:00"), 2.00),
      ("a", ts("2024-01-01 02:30:00"), 4.00)).toDF("event_type", "ts", "value")
      .repartition(3)
    val out = TimeSeries.ewma(ev, "event_type", "ts", "value", lookback = 2)
      .orderBy("bucket").select("n_window", "ewma")
      .as[(Long, Double)].collect()
    assert(out === Array((1L, 100.0), (2L, 166.666667), (2L, 333.333333)))
  }

  test("levelShifts: full-window gating and exact cents diff") {
    // series a: hourly cents 100 ×4 (h0..h3) then 500 ×4 (h4..h7);
    // w=2 → full windows exist at positions 2..6 only. Flat positions
    // (t=2: 200 vs 200; t=6: 1000 vs 1000) are dropped by minDiff=1;
    // the shift at h4 shows as a ramp 400 / 800 / 400 at t=3,4,5.
    val ev = ((0 until 4).map(h => ("a", ts(f"2024-01-01 0$h%02d:30:00"), 1.00)) ++
      (4 until 8).map(h => ("a", ts(f"2024-01-01 0$h%02d:30:00"), 5.00)))
      .toDF("event_type", "ts", "value").repartition(3)
    val out = TimeSeries.levelShifts(ev, "event_type", "ts", "value",
        w = 2, minDiffCents = 1L)
      .orderBy("bucket")
      .select("trail_cents", "lead_cents", "diff_cents")
      .as[(Long, Long, Long)].collect()
    assert(out === Array(
      (200L, 600L, 400L),    // t=3: (h1,h2) vs (h3,h4)
      (200L, 1000L, 800L),   // t=4: (h2,h3) vs (h4,h5) — peak at the break
      (600L, 1000L, 400L)))  // t=5: (h3,h4) vs (h5,h6)
  }
}
