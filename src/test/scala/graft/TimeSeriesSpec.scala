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
}
