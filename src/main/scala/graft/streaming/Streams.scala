package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators — the rebuild of the reference's
  * commit-time incremental machinery (SURVEY.md §7.2 step 4):
  *
  *   - the transaction log that streams committed writes to views and
  *     replication slaves (reference transactions.lisp:1005-1425,
  *     transaction-streaming.lisp:141-170) becomes a streaming source
  *     over the write log;
  *   - per-commit view maintenance (views.lisp:331-374) becomes an
  *     update-mode streaming aggregation;
  *   - replication subset filters (spatial-query.lisp:161-172) become
  *     filtered streaming sinks.
  *
  * Watermarked windows and `flatMapGroupsWithState` cover the
  * stream-analytics surface the reference lacked outright.
  */
object Streams {

  /** Incremental materialized view: per-key aggregation maintained in
    * update mode as new rows stream in — each micro-batch plays the
    * role of one reference commit.
    */
  def incrementalView(mapped: DataFrame /* (key, value) */): DataFrame =
    mapped.groupBy("key").agg(sum("value").as("value"), count(lit(1)).as("n"))

  /** Watermarked tumbling-window aggregation over an event stream. */
  def windowedAgg(events: DataFrame, tsCol: String, window: String,
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("bucket"), col("event_type"), col("n"), col("total_value"))

  /** Replication-slave sink analog: subscribe to the write log with an
    * optional subset predicate (the spatial replication filter).
    */
  def replicationStream(log: DataFrame, filter: Option[org.apache.spark.sql.Column]): DataFrame =
    filter.map(log.filter).getOrElse(log)

  /** Live tail of a [[graft.model.VersionedStore]] table's commit log
    * as a Structured-Streaming source: epoch dirs are partition dirs,
    * so every commit lands as new files the file stream picks up —
    * the always-connected slave socket of the reference
    * (transaction-streaming.lisp:141-170) as `readStream`. Rows carry
    * `commit_epoch`; compose with [[replicationStream]] for subset
    * replicas, or `foreachBatch` into `VersionedStore.applyReplicated`
    * for a continuously-converging slave store.
    *
    * Visibility caveat (documented, same as the reference's tail): the
    * file source discovers files at write time, so a crashed commit's
    * orphan files would stream before the writer's cleanup — consumers
    * needing committed-only rows should filter
    * `commit_epoch <= master.currentEpoch` in `foreachBatch`.
    */
  def commitLogStream(spark: SparkSession, storeDir: String, table: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .option("basePath", s"$storeDir/$table")
      .parquet(s"$storeDir/$table/commit_epoch=*")

  /** Streaming exact dedup for ingestion pipelines: drop rows whose
    * content hash was already seen, with the dedup state bounded by the
    * watermark (Spark evicts state older than the horizon — unbounded
    * state is the classic streaming-dedup failure at corpus scale).
    * The batch analog is [[graft.operators.Dedup.exactDupGroups]].
    */
  def dedupStream(docs: DataFrame, tsCol: String, textCol: String,
      watermark: String): DataFrame =
    docs
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicates("content_hash")

  /** [[dedupStream]] with TRULY bounded state: `dropDuplicates` on a
    * non-event-time key keeps every key forever even under a watermark
    * (the subset must include the event-time column for eviction to
    * apply), so at corpus scale the state store grows with the distinct
    * hash count. `dropDuplicatesWithinWatermark` is the bounded
    * operator: a hash's state is dropped once the watermark passes its
    * event time, trading "a duplicate arriving later than the horizon
    * re-emits" for state proportional to the horizon — the contract an
    * unbounded ingest pipeline actually wants.
    */
  def dedupStreamBounded(docs: DataFrame, tsCol: String, textCol: String,
      watermark: String): DataFrame =
    docs
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  final case class SpanOcc(doc_id: Long, start: Int, wh: String)
  final case class SpanVerdict(doc_id: Long, start: Int, recycled: Boolean)

  /** Streaming keep-first duplicate-span verdicts — the ingest twin of
    * [[graft.operators.Dedup.removeDupSpans]]: each arriving document
    * explodes STATELESSLY into its k-token window digests (text never
    * enters state; the per-digest state is ONE long — the smallest id
    * seen owning that window), and `flatMapGroupsWithState` emits one
    * `(doc_id, start, recycled)` verdict per window occurrence, where
    * recycled = a LOWER id already owns the digest. Feeding the
    * recycled starts to [[graft.operators.Dedup.removeSpansByStarts]]
    * reproduces the batch excision bit-for-bit.
    *
    * Equivalence contract: within a micro-batch the owner is the MIN
    * id over state + the whole batch group (arrival order inside a
    * batch cannot perturb the verdict); across batches it requires ids
    * to arrive non-decreasing — the same "id order = arrival order"
    * contract the novelty audit and the batch operator document. A
    * document arriving LATER than a higher-id batch is the streaming-
    * dedup late-data case: its own windows judge against the ids seen
    * so far, and already-emitted verdicts are not retracted.
    *
    * Scale shape: state is |distinct window digests| × one long —
    * the same cardinality the batch groupBy shuffles, held instead in
    * the state store; the emitted rows are narrow (id, int, bool).
    */
  def dupSpanVerdictStream(docs: DataFrame, idCol: String, textCol: String,
      k: Int): Dataset[SpanVerdict] = {
    require(k > 0, "window size must be positive")
    import docs.sparkSession.implicits._
    val occ = docs.select(col(idCol).cast("long").as("doc_id"),
        graft.operators.TextAnalysis.tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= k)
      .select(col("doc_id"), col("__tk"),
        explode(sequence(lit(1), size(col("__tk")) - k + 1)).as("__i"))
      .select(col("doc_id"), col("__i").cast("int").as("start"),
        md5(concat_ws(" ", slice(col("__tk"), col("__i"), lit(k)))).as("wh"))
      .as[SpanOcc]
    occ.groupByKey(_.wh)
      .flatMapGroupsWithState[Long, SpanVerdict](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[SpanOcc], state: GroupState[Long]) =>
          val rs = rows.toList
          val owner = math.min(state.getOption.getOrElse(Long.MaxValue),
            rs.map(_.doc_id).min)
          state.update(owner)
          rs.iterator.map(r => SpanVerdict(r.doc_id, r.start, r.doc_id > owner))
      }
  }

  final case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class Session(user_id: Long, startMs: Long, endMs: Long, n_events: Int)

  /** Gap-based session assembly with explicit state — the
    * `flatMapGroupsWithState` surface. Emits a session once the gap
    * (processing-time analog here: closed by a later event or stream
    * end via timeout) is exceeded.
    */
  def sessionize(events: Dataset[Event], gapMillis: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.value))
          var out = List.empty[Session]
          var st = state.getOption.orNull
          sorted.foreach { e =>
            val t = e.ts.getTime
            st match {
              case null => st = SessionState(t, t, 1)
              case s if t - s.last <= gapMillis => st = s.copy(last = t, n = s.n + 1)
              case s =>
                out ::= Session(user, s.start, s.last, s.n)
                st = SessionState(t, t, 1)
            }
          }
          if (st != null) state.update(st)
          out.reverseIterator
      }
  }

  final case class ZEvent(user_id: Long, event_id: Long, ts: Timestamp, value: Double)
  final case class ZScored(user_id: Long, event_id: Long, n_prior: Long,
    z: Option[Double], is_anomaly: Boolean)
  final case class ZState(recent: List[Double])

  /** Streaming rolling z-score — the incremental twin of
    * [[graft.operators.TimeSeries.rollingZscore]] (the q134 batch
    * contract): per-series state is just the last `lookback` values,
    * each arriving event is scored against that trailing window
    * (self-excluded) and then appended to it. A metrics stream gets
    * live anomaly flags with O(lookback) state per series — the
    * stream/batch-equivalence discipline of q118-q120, enforced by
    * StreamingSpec feeding the same events through both paths.
    *
    * Arithmetic mirrors the batch side operation-for-operation: the
    * mean sums the window oldest-first, the sample stddev runs
    * Welford's update in the same order (what Spark's stddev_samp
    * aggregate computes), and mean/sd/z each round half-up to 6 — so
    * a flag flipped by execution mode would be a real bug, not noise.
    */
  def rollingZscoreStream(events: Dataset[ZEvent], lookback: Int = 20,
      minPrior: Int = 5, sigmas: Double = 3.0): Dataset[ZScored] = {
    require(lookback >= minPrior && minPrior >= 2, "need lookback >= minPrior >= 2")
    import events.sparkSession.implicits._
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[ZState, ZScored](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[ZEvent], state: GroupState[ZState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var buf = state.getOption.map(_.recent).getOrElse(Nil) // oldest first
          val out = sorted.map { e =>
            val n = buf.length
            val scored = if (n >= minPrior) {
              // Welford in window order = Spark's CentralMomentAgg
              var avg = 0.0; var m2 = 0.0; var i = 0
              buf.foreach { x =>
                i += 1
                val delta = x - avg
                avg += delta / i
                m2 += delta * (x - avg)
              }
              val mu = round6(buf.sum / n)
              val sd = round6(math.sqrt(m2 / (n - 1)))
              if (sd > 0) {
                val z = round6((e.value - mu) / sd)
                ZScored(user, e.event_id, n, Some(z), math.abs(z) > sigmas)
              } else ZScored(user, e.event_id, n, None, is_anomaly = false)
            } else ZScored(user, e.event_id, n, None, is_anomaly = false)
            buf = (buf :+ e.value).takeRight(lookback)
            scored
          }
          state.update(ZState(buf))
          out.iterator
      }
  }

  /** Close all open sessions (end-of-stream flush for tests/batch). */
  def openSessions(events: Dataset[Event], gapMillis: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (user, rows) =>
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.value))
      val sessions = scala.collection.mutable.ListBuffer.empty[Session]
      var st: SessionState = null
      sorted.foreach { e =>
        val t = e.ts.getTime
        st match {
          case null => st = SessionState(t, t, 1)
          case s if t - s.last <= gapMillis => st = s.copy(last = t, n = s.n + 1)
          case s =>
            sessions += Session(user, s.start, s.last, s.n)
            st = SessionState(t, t, 1)
        }
      }
      if (st != null) sessions += Session(user, st.start, st.last, st.n)
      sessions.iterator
    }
  }

  final case class EwEvent(series: String, ts: Timestamp, value: Double)
  final case class EwState(buckets: List[(Long, Long)]) // (bucketMs, cents) oldest first
  final case class EwOut(series: String, bucketMs: Long, n_window: Long, ewma: Double)

  /** Streaming dyadic EWMA — the incremental twin of
    * [[graft.operators.TimeSeries.ewma]] (the q169 batch contract):
    * per-series state is the last `lookback` (hour bucket, cents sum)
    * pairs; each arriving event folds into its hour bucket and emits
    * the updated smoothed value. On an in-order replay, the LAST
    * emission per (series, bucket) equals the batch operator's row for
    * that bucket value-for-value — StreamingSpec enforces it on real
    * events split mid-stream (the q118-q120 equivalence discipline).
    *
    * Arithmetic mirrors the batch side operation-for-operation: cents
    * via the same HALF_UP rounding, the oldest-first fold doubling the
    * weight toward newest (`Σ xᵢ·2ⁱ / (2ᵐ−1)` exact int64), one IEEE
    * divide rounded to 6. O(lookback) state per series.
    */
  def ewmaStream(events: Dataset[EwEvent], lookback: Int): Dataset[EwOut] = {
    require(lookback >= 1 && lookback <= 32,
      "lookback must be in [1, 32] (cents·2^lookback must stay in int64; " +
        "matches the batch operator's envelope)")
    import events.sparkSession.implicits._
    def cents(v: Double): Long =
      BigDecimal(v * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    events.groupByKey(_.series)
      .flatMapGroupsWithState[EwState, EwOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (series: String, rows: Iterator[EwEvent], state: GroupState[EwState]) =>
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var buf = state.getOption.map(_.buckets).getOrElse(Nil)
          val out = sorted.flatMap { e =>
            val bucket = e.ts.getTime - Math.floorMod(e.ts.getTime, 3600000L)
            val c = cents(e.value)
            // a bucket older than the buffer tail was already evicted:
            // folding it in as the NEWEST entry would weight a stale
            // hour as current and evict a genuinely newer bucket, so
            // drop it (too-late-for-state, same contract as a
            // watermark). Within the buffer, merge-or-insert at sorted
            // position so cross-micro-batch ordering matches the batch
            // operator's per-series sort.
            if (buf.nonEmpty && bucket < buf.head._1 && buf.length >= lookback) None
            else {
              buf =
                if (buf.exists(_._1 == bucket))
                  buf.map { case (b, s) =>
                    if (b == bucket) (b, Math.addExact(s, c)) else (b, s) }
                else
                  ((bucket, c) :: buf).sortBy(_._1).takeRight(lookback)
              // exact int64 fold, overflow fails loudly rather than
              // silently wrapping (driver-side Long arithmetic has no
              // ANSI guard — addExact/multiplyExact supply one)
              var s = 0L; var p = 1L
              buf.foreach { case (_, x) =>
                s = Math.addExact(s, Math.multiplyExact(x, p)); p = Math.multiplyExact(p, 2L) }
              val ewma = BigDecimal(s.toDouble / (p - 1).toDouble)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
              Some(EwOut(series, bucket, buf.length.toLong, ewma))
            }
          }
          state.update(EwState(buf))
          out.iterator
      }
  }

  final case class BkRow(shard: Int, id: Long, rank: String)
  final case class BkState(ver: Long, keep: List[(String, Long)]) // (rank, id) ascending
  final case class BkOut(shard: Int, ver: Long, rank: String, id: Long)

  /** Streaming deterministic uniform sample — bottom-k by md5 rank,
    * the hash-rank discipline the batch mixing tier already runs on
    * (Sampling.quotaCap's md5 order): the k rows with the smallest
    * `md5(id)` ARE a uniform k-sample, and unlike a classic random
    * reservoir the result is a pure function of the SET of ids seen —
    * identical however the stream micro-batches, so stream/batch
    * parity is exact by construction (a seeded reservoir can't make
    * that promise: its pick depends on arrival order).
    *
    * Scale shape: the caller shards rows by a hash of the id, state is
    * one bottom-k list PER SHARD (`shards × k` rows total, forever,
    * regardless of corpus size), and the global sample reads as
    * "union the per-shard finals, take the k smallest" — the same
    * two-level bottom-k a 1000-executor batch TopK runs, kept
    * incrementally. A shard emits its full current bottom-k tagged
    * with a bumped `ver` ONLY when a batch actually changed it, so
    * the final answer per shard is its max-`ver` emission and idle
    * shards cost nothing per trigger.
    */
  def bottomKSampleStream(rows: Dataset[BkRow], k: Int): Dataset[BkOut] = {
    require(k >= 1, s"k must be >= 1, got $k")
    import rows.sparkSession.implicits._
    rows.groupByKey(_.shard)
      .flatMapGroupsWithState[BkState, BkOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Int, it: Iterator[BkRow], state: GroupState[BkState]) =>
          val prev = state.getOption.getOrElse(BkState(0L, Nil))
          // ranks are unique for unique ids (md5 of distinct strings);
          // the (rank, id) tuple order still makes replayed duplicates
          // harmless — merging an already-kept row is a no-op
          val merged = (prev.keep ++ it.map(r => (r.rank, r.id)))
            .distinct.sorted.take(k)
          if (merged == prev.keep) Iterator.empty
          else {
            val next = BkState(prev.ver + 1L, merged)
            state.update(next)
            merged.iterator.map { case (rank, id) =>
              BkOut(shard, next.ver, rank, id) }
          }
      }
  }
}
