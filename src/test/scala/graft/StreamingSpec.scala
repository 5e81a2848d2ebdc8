package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streams
import graft.streaming.Streams.Event

/** Streaming semantics: incremental view maintenance in update mode,
  * watermarked windows, stateful sessionization.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  test("incremental view updates per-key aggregates across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val mapped = input.toDF().toDF("key", "value")
    val q = Streams.incrementalView(mapped)
      .writeStream.outputMode("update").format("memory")
      .queryName("iv").start()

    input.addData((1L, 10.0), (1L, 5.0), (2L, 1.0))
    q.processAllAvailable()
    val after1 = spark.sql("select * from iv").as[(Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.maxBy(_._3)).toMap
    assert(after1(1L)._2 == 15.0 && after1(1L)._3 == 2)

    input.addData((1L, 1.0))
    q.processAllAvailable()
    val after2 = spark.sql("select * from iv").as[(Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.maxBy(_._3)).toMap
    assert(after2(1L)._2 == 16.0 && after2(1L)._3 == 3)
    assert(after2(2L)._2 == 1.0)
    q.stop()
  }

  test("watermarked windowed aggregation over an event stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val agg = Streams.windowedAgg(
      input.toDF(), "ts", "10 minutes", "5 minutes")
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("wa").start()
    input.addData(
      Event(1, ts(0), "click", 1.0), Event(1, ts(1), "click", 2.0),
      Event(2, ts(11), "click", 3.0), Event(2, ts(12), "buy", 4.0))
    q.processAllAvailable()
    val rows = spark.sql("select bucket, event_type, n, total_value from wa")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    q.stop()
    assert(rows.exists(r => r._2 == "click" && r._3 == 2 && r._4 == 3.0))
    assert(rows.exists(r => r._2 == "click" && r._3 == 1 && r._4 == 3.0))
    assert(rows.exists(r => r._2 == "buy" && r._3 == 1 && r._4 == 4.0))
  }

  test("stateful sessionize emits closed sessions; flush closes the rest") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sess = Streams.sessionize(input.toDS(), gapMillis = 5 * 60000L)
    val q = sess.writeStream.outputMode("append").format("memory")
      .queryName("sess").start()
    // one batch: user 1 has two bursts separated by > gap
    input.addData(
      Event(1, ts(0), "a", 0), Event(1, ts(2), "a", 0),
      Event(1, ts(30), "a", 0), Event(1, ts(31), "a", 0),
      Event(2, ts(0), "a", 0))
    q.processAllAvailable()
    val closed = spark.sql("select user_id, n_events from sess")
      .as[(Long, Int)].collect().toSet
    q.stop()
    // the first burst of user 1 closed when the second burst arrived
    assert(closed.contains((1L, 2)))

    // batch flush variant sees all sessions
    val all = Streams.openSessions(Seq(
      Event(1, ts(0), "a", 0), Event(1, ts(2), "a", 0),
      Event(1, ts(30), "a", 0), Event(2, ts(0), "a", 0)).toDS(), 5 * 60000L)
      .collect().map(s => (s.user_id, s.n_events)).toSet
    assert(all == Set((1L, 2), (1L, 1), (2L, 1)))
  }

  test("streaming sessionize equals the batch session records on real events") {
    implicit val sqlCtx = spark.sqlContext
    // whole-second timestamps so the stream's millis gap and the batch
    // side's floor-second gap draw the SAME session boundaries (the
    // batch contract compares floor-second casts; sub-second events
    // would make a 1800.5 s gap break in millis but not in seconds)
    val evDf = graft.QueryDef.events(spark, sf)
      .filter(col("user_id") < 8)
      .select(col("user_id"),
        date_trunc("second", col("ts")).cast("timestamp").as("ts"),
        col("event_type"), col("value"), col("event_id"))
    val ev = evDf.select("user_id", "ts", "event_type", "value")
      .as[Event].collect().sortBy(_.ts.getTime)
    val batch = graft.operators.TimeSeries.sessions(
        evDf, "user_id", "ts", "event_id", gapSeconds = 1800L)
      .select("user_id", "start_ts", "end_ts", "n_events")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3).toInt)).toSet
    // end-of-stream flush over the same events reproduces batch exactly
    val flushed = Streams.openSessions(ev.toSeq.toDS(), gapMillis = 1800 * 1000L)
      .collect().map(s => (s.user_id, s.startMs, s.endMs, s.n_events)).toSet
    assert(flushed === batch)
    // and the incremental path's CLOSED sessions (split mid-stream so
    // state carries across batches) are a subset of the batch records
    val input = MemoryStream[Event]
    val q = Streams.sessionize(input.toDS(), gapMillis = 1800 * 1000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_twin").start()
    val (a, b) = ev.splitAt(ev.length / 2)
    input.addData(a.toIndexedSeq); q.processAllAvailable()
    input.addData(b.toIndexedSeq); q.processAllAvailable()
    val closed = spark.sql("select user_id, startMs, endMs, n_events from sess_twin")
      .as[(Long, Long, Long, Int)].collect().toSet
    q.stop()
    assert(closed.nonEmpty && closed.subsetOf(batch),
      s"closed-session drift: ${closed.diff(batch)}")
  }

  test("streaming ewma equals the batch operator per bucket across batch splits") {
    import graft.streaming.Streams.EwEvent
    implicit val sqlCtx = spark.sqlContext
    val evDf = graft.QueryDef.events(spark, sf).filter(col("user_id") < 32)
    val ev = evDf.select(col("event_type").as("series"), col("ts"), col("value"))
      .as[EwEvent].collect().sortBy(_.ts.getTime)
    val batch = graft.operators.TimeSeries.ewma(
        evDf, "event_type", "ts", "value", lookback = 4)
      .collect().map(r => ((r.getString(0), r.getTimestamp(1).getTime),
        (r.getLong(2), r.getDouble(3)))).toMap
    val input = MemoryStream[EwEvent]
    val q = Streams.ewmaStream(input.toDS(), lookback = 4)
      .writeStream.outputMode("append").format("memory")
      .queryName("ewma_twin").start()
    val (a, b) = ev.splitAt(ev.length / 2)
    input.addData(a.toIndexedSeq); q.processAllAvailable()
    input.addData(b.toIndexedSeq); q.processAllAvailable()
    // LAST emission per (series, bucket) must equal the batch row —
    // order within the memory table follows emission order, so max
    // row id per key is the final state
    val emitted = spark.sql(
        "select series, bucketMs, n_window, ewma from ewma_twin")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    q.stop()
    val last = emitted.zipWithIndex.groupBy(x => (x._1._1, x._1._2))
      .map { case (k, vs) => k -> { val e = vs.maxBy(_._2)._1; (e._3, e._4) } }
    assert(last.nonEmpty && last.size === batch.size)
    last.foreach { case (k, v) =>
      assert(batch(k) === v, s"stream/batch ewma drift at $k: $v vs ${batch(k)}")
    }
  }

  test("streaming ewma handles out-of-order events: in-buffer lates merge " +
      "at sorted position, too-late events are dropped") {
    import graft.streaming.Streams.EwEvent
    implicit val sqlCtx = spark.sqlContext
    def ev(hour: Long, v: Double) =
      EwEvent("s", new java.sql.Timestamp(hour * 3600000L), v)
    val input = MemoryStream[EwEvent]
    val q = Streams.ewmaStream(input.toDS(), lookback = 3)
      .writeStream.outputMode("append").format("memory")
      .queryName("ewma_ooo").start()
    // batch 1: hours 1, 3, 4 (buffer full at lookback=3)
    input.addData(Seq(ev(1, 1.0), ev(3, 3.0), ev(4, 4.0))); q.processAllAvailable()
    // batch 2: hour 2 arrives LATE — older than the newest bucket but
    // inside [tail, head]: it must slot between 1 and 3, evicting hour
    // 1 (the oldest), NOT be appended as the newest window entry
    input.addData(Seq(ev(2, 2.0))); q.processAllAvailable()
    // batch 3: hour 0 is older than the buffer tail (2) with a full
    // buffer — already evicted territory, must be dropped (no emission)
    input.addData(Seq(ev(0, 9.0))); q.processAllAvailable()
    val emitted = spark.sql(
        "select series, bucketMs, n_window, ewma from ewma_ooo")
      .collect().map(r => (r.getLong(1) / 3600000L, r.getLong(2), r.getDouble(3)))
    q.stop()
    // the too-late hour-0 event produced nothing
    assert(!emitted.exists(_._1 == 0L), s"too-late event emitted: $emitted")
    // the late hour-2 emission reflects the SORTED buffer [2,3,4]:
    // (200·1 + 300·2 + 400·4) / 7 = 2400/7 cents
    val lateEmit = emitted.last
    assert(lateEmit._1 === 2L && lateEmit._2 === 3L)
    assert(lateEmit._3 === BigDecimal(2400.0 / 7)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      s"late event not merged at sorted position: $lateEmit")
  }

  test("streaming rolling z-score equals the batch operator across batch splits") {
    import graft.streaming.Streams.ZEvent
    implicit val sqlCtx = spark.sqlContext
    // real events slice: every event of 8 users, replayed in ts order
    // but SPLIT mid-stream so per-user state must carry across batches
    val ev = graft.QueryDef.events(spark, sf) // encoding-normalized ts
      .filter(col("user_id") < 8)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[ZEvent].collect().sortBy(e => (e.ts.getTime, e.event_id))
    assert(ev.length > 50)
    val (first, second) = ev.splitAt(ev.length / 2)

    val input = MemoryStream[ZEvent]
    val q = graft.streaming.Streams.rollingZscoreStream(input.toDS(),
        lookback = 20, minPrior = 5, sigmas = 3.0)
      .writeStream.outputMode("append").format("memory").queryName("zs").start()
    input.addData(first.toIndexedSeq)
    q.processAllAvailable()
    input.addData(second.toIndexedSeq)
    q.processAllAvailable()
    val streamed = spark.sql("select user_id, event_id, n_prior, z, is_anomaly from zs")
      .as[(Long, Long, Long, Option[Double], Boolean)].collect()
      .sortBy(r => r._2)
    q.stop()

    val batch = graft.operators.TimeSeries.rollingZscore(
        ev.toSeq.toDF("user_id", "event_id", "ts", "value"),
        "user_id", "value", Seq(col("ts"), col("event_id")),
        lookback = 20, minPrior = 5, sigmas = 3.0)
      .select("user_id", "event_id", "n_prior", "z", "is_anomaly")
      .as[(Long, Long, Long, Option[Double], Boolean)].collect()
      .sortBy(r => r._2)

    assert(streamed.length === batch.length)
    assert(streamed === batch) // value-for-value, flags included
    assert(streamed.exists(_._4.isDefined)) // non-vacuous: scores exist
  }

  test("media decode pipeline is stream-composable (partition-batched ops on a stream)") {
    import graft.operators.Multimodal
    implicit val sqlCtx = spark.sqlContext
    // ingestion shape at scale: ids stream in, media attaches and
    // decodes inside each micro-batch — the mapPartitions scaffold
    // composes with Structured Streaming untouched
    val input = MemoryStream[Long]
    val decoded = Multimodal.decodeMedia(
      Multimodal.attachMedia(input.toDF().toDF("doc_id"), "doc_id"))
    assert(decoded.isStreaming, "decode chain must stay a streaming plan")
    val q = decoded.writeStream.outputMode("append").format("memory")
      .queryName("mstream").start()
    input.addData(1L, 2L, 3L)
    q.processAllAvailable()
    input.addData(4L)
    q.processAllAvailable()
    val rows = spark.sql("select media_id, width, height from mstream")
      .as[(Long, Int, Int)].collect().toSet
    q.stop()
    assert(rows.map(_._1) == Set(1L, 2L, 3L, 4L))
    rows.foreach { case (id, w, h) =>
      assert((w, h) == Multimodal.synthDims(id), s"decoded dims for $id")
    }
    // multi-frame sampling composes the same way
    val frames = MemoryStream[Long]
    val sampled = Multimodal.sampleFrames(
      Multimodal.attachVideo(frames.toDF().toDF("doc_id"), "doc_id"),
      everyN = 2, maxFrames = 2)
    val q2 = sampled.writeStream.outputMode("append").format("memory")
      .queryName("fstream").start()
    frames.addData(7L)
    q2.processAllAvailable()
    val fr = spark.sql("select frame_idx from fstream").as[Int].collect().toSet
    q2.stop()
    val nf = Multimodal.synthVideoParams(7L)._3
    assert(fr == (0 until nf by 2).take(2).toSet)
  }

  test("file-source stream: windowed agg over the real events table") {
    // drive the actual parquet events table as a file stream (ns
    // timestamps -> read as long, converted like QueryDef.events)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the file-stream source wants a directory; stage the single file
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "evstream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val stream = QueryDef.tsMicros(
      spark.readStream.schema(schema).parquet(dir.toString))
    val agg = Streams.windowedAgg(stream, "ts", "1 hour", "1 hour")
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("filewa").start()
    q.processAllAvailable()
    val streamed = spark.sql("select sum(n) from filewa").first().getLong(0)
    q.stop()
    val batch = spark.read.parquet(s"$sf/events.parquet").count()
    assert(streamed == batch, "every event lands in exactly one window")
  }

  test("commit-log stream tails a live store into a converging slave") {
    import graft.model.{GraphSchema, GraphStore, VersionedStore}
    val schema2 = GraphSchema.builder().vertex("site", "id", Seq("name", "lat")).build()
    val masterDir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "clstream-m").toString
    val master = new GraphStore(spark, schema2, masterDir)
    master.txn().createVertices("site",
      Seq((1L, "a", 10.0), (2L, "b", 60.0)).toDF("id", "name", "lat")).commit()

    val tableSchema = spark.read.parquet(s"$masterDir/v_site").schema
    val tail = Streams.commitLogStream(spark, masterDir, "v_site", tableSchema)
    assert(tail.isStreaming)
    // slave applies each micro-batch through the replica path, with the
    // spatial subset filter (lat <= 50)
    val slaveDir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "clstream-s").toString
    val slave = new VersionedStore(spark, slaveDir)
    val q = tail.writeStream.outputMode("append").foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val upTo = master.store.currentEpoch // committed-only visibility
        val rows = batch.filter(col("commit_epoch") <= upTo && col("lat") <= 50.0)
        if (!rows.isEmpty)
          slave.applyReplicated(upTo, Map("v_site" -> rows))
        ()
    }.start()
    q.processAllAvailable()
    // live commits keep flowing into the slave
    master.txn().createVertices("site",
      Seq((3L, "c", 20.0)).toDF("id", "name", "lat")).commit()
    master.txn().updateVertices("site",
      Seq((1L, "a2", 11.0)).toDF("id", "name", "lat")).commit()
    q.processAllAvailable()
    q.stop()
    val got = slave.read("v_site").select("id", "name")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a2"), (3L, "c"))) // 2L filtered out by the subset
    assert(slave.currentEpoch == master.store.currentEpoch)
  }

  test("replication stream subset filter") {
    val log = Seq((1L, "a", 10.0), (2L, "b", -5.0)).toDF("id", "kind", "v")
    val filtered = Streams.replicationStream(log, Some(col("v") > 0))
    assert(filtered.count() == 1)
    assert(Streams.replicationStream(log, None).count() == 2)
  }

  test("bounded streaming dedup: duplicates within the horizon drop, state evicts past it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val docs = input.toDF().toDF("ts", "text")
    val q = Streams.dedupStreamBounded(docs, "ts", "text", watermark = "10 minutes")
      .select("text")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_bounded").start()
    // batch 1: duplicate within the same batch drops
    input.addData((ts(0), "alpha"), (ts(1), "beta"), (ts(2), "alpha"))
    q.processAllAvailable()
    // batch 2: still within the 10-minute horizon of the alpha state
    input.addData((ts(5), "alpha"), (ts(6), "gamma"))
    q.processAllAvailable()
    // batch 3: advance the watermark far past alpha's event time —
    // its dedup state is evicted, so a late re-arrival re-emits: the
    // bounded-state trade-off, pinned as documented behavior
    input.addData((ts(120), "delta"))
    q.processAllAvailable()
    input.addData((ts(121), "alpha"))
    q.processAllAvailable()
    val got = spark.sql("select text from dedup_bounded").as[String].collect().sorted
    assert(got.sameElements(Array("alpha", "alpha", "beta", "delta", "gamma")),
      got.mkString(","))
    q.stop()
  }

  test("streaming dedup drops repeated content within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val docs = input.toDF().toDF("ts", "text")
    val q = Streams.dedupStream(docs, "ts", "text", watermark = "10 minutes")
      .select("text")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup").start()
    input.addData((ts(0), "alpha"), (ts(1), "beta"), (ts(2), "alpha"))
    q.processAllAvailable()
    input.addData((ts(3), "alpha"), (ts(4), "gamma"))
    q.processAllAvailable()
    val got = spark.sql("select text from dedup").as[String].collect().sorted
    assert(got.sameElements(Array("alpha", "beta", "gamma")), got.mkString(","))
    q.stop()
  }

  test("chunking composes with streaming ingestion (stateless narrow op)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = graft.operators.TextAnalysis
      .chunkOverlap(docs, "doc_id", "text", chunkSize = 3, stride = 2)
      .writeStream.outputMode("append").format("memory")
      .queryName("chunks").start()
    input.addData((1L, "a b c d e"), (2L, "")) // empty doc: no chunks
    q.processAllAvailable()
    input.addData((3L, "x y"))
    q.processAllAvailable()
    val got = spark.sql("select doc_id, chunk_id, chunk_text from chunks")
      .as[(Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    // the window at 2 reaches the document end, so no start at 4
    assert(got == Seq((1L, 0L, "a b c"), (1L, 1L, "c d e"),
      (3L, 0L, "x y")), got.mkString(","))
    q.stop()
  }

  test("bigram-LM scoring composes with streaming ingestion (static model x stream)") {
    // the perplexity-filter deployment shape: the model tables are
    // STATIC (trained offline on the trusted slice), candidate docs
    // arrive as a stream, each is scored by stream-static joins + one
    // per-doc update-mode aggregate — the same operator code path as
    // the batch q107
    implicit val sqlCtx = spark.sqlContext
    val train = Seq((10L, "a b"), (11L, "a b"), (12L, "a c"))
      .toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = graft.operators.TextAnalysis
      .bigramLmScore(train, docs, "doc_id", "text")
      .writeStream.outputMode("update").format("memory")
      .queryName("lmscores").start()
    input.addData((1L, "a b c"), (2L, "x")) // "x": no bigrams, not scored
    q.processAllAvailable()
    input.addData((3L, "a b"))
    q.processAllAvailable()
    val got = spark.sql("select doc_id, n_bigrams, score_ppm from lmscores")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // doc 1: (a,b)=500000, (b,c)=200000 -> 350000; doc 3: (a,b) -> 500000
    assert(got == Seq((1L, 2L, 350000L), (3L, 1L, 500000L)), got.mkString(","))
    q.stop()
  }

  test("streaming bottom-k sample: per-shard finals equal the batch " +
      "bottom-k however the stream splits; unchanged shards stay silent") {
    import graft.streaming.Streams.{BkOut, BkRow}
    implicit val sqlCtx = spark.sqlContext
    def row(id: Long) = {
      val rank = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      BkRow((java.lang.Long.parseLong(rank.take(8), 16) % 4).toInt, id, rank)
    }
    val ids = (0L until 200L).map(row)
    val input = MemoryStream[BkRow]
    val q = Streams.bottomKSampleStream(input.toDS(), k = 5)
      .writeStream.outputMode("append").format("memory")
      .queryName("bk_sample").start()
    input.addData(ids.take(120)); q.processAllAvailable()
    input.addData(ids.drop(120)); q.processAllAvailable()
    def finals(): Map[Int, Seq[(String, Long)]] = {
      val all = spark.sql("select shard, ver, rank, id from bk_sample")
        .as[BkOut].collect()
      all.groupBy(_.shard).map { case (s, es) =>
        val top = es.map(_.ver).max
        s -> es.filter(_.ver == top).map(e => (e.rank, e.id)).sorted.toSeq
      }
    }
    val f1 = finals()
    // per-shard final == batch bottom-5 of that shard, arrival-order-free
    ids.groupBy(_.shard).foreach { case (s, rows) =>
      val want = rows.map(r => (r.rank, r.id)).sorted.take(5)
      assert(f1(s) == want, s"shard $s drifted: ${f1(s)} vs $want")
    }
    // global sample = union of finals, 5 smallest == batch global bottom-5
    val global = f1.values.flatten.toSeq.sorted.take(5)
    assert(global == ids.map(r => (r.rank, r.id)).sorted.take(5))
    // a batch of strictly-larger ranks must not re-emit anything:
    // "g" sorts after every hex digit, so these never displace a kept row
    val emittedBefore = spark.sql("select count(*) from bk_sample").head().getLong(0)
    input.addData((0 until 4).map(s => BkRow(s, 10000L + s, "g" * 32)))
    q.processAllAvailable()
    val emittedAfter = spark.sql("select count(*) from bk_sample").head().getLong(0)
    q.stop()
    assert(emittedAfter == emittedBefore,
      "an unchanged shard must emit nothing (idle shards are free)")
    assert(finals() == f1, "state must be untouched by ranks above the kept k")
  }
}
