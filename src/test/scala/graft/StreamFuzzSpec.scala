package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.streaming.Streams
import graft.streaming.Streams.{BkOut, BkRow, Event, EwEvent, ZEvent}

/** Differential fuzzing of the STREAMING tier (r12 next-round #1): the
  * one state-heavy surface that until now had only example-based
  * coverage, brought under the same randomized-differential harness
  * that caught real bugs in the pattern and drift tiers
  * (PatternFuzzSpec's Or-branch drop, the categorical-drift
  * divide-by-zero).
  *
  * Shape: random event streams (ids, timestamps — including late
  * arrivals inside and beyond the watermark where the operator's
  * contract admits them — and values) × random micro-batch split
  * points, each program run through a Streams operator and compared to
  * its BATCH twin computed by the engine's own batch operators (the
  * oracle already exists; reference analog: tests/concurrent-stress/
  * storms every stateful subsystem).
  *
  * Delivery-fault coverage:
  *  - REPLAYED batches (at-least-once delivery) for the operators
  *    whose contract is idempotence-by-construction (bottom-k's
  *    pure-function-of-the-set, dedup's keyed state): a re-delivered
  *    batch must change nothing.
  *  - A REAL stop → restart-from-checkpoint of flatMapGroupsWithState
  *    state over a replayable (file) source, at a random batch
  *    boundary (the sessionize/zscore/ewma state store rides the same
  *    checkpoint machinery; bottom-k is the restart vehicle because
  *    its answer is file-order-free, so the assertion is exact).
  *    Sink-side exactly-once under HARD crashes is
  *    TransactionalIngestSpec's, and replica-binder recovery
  *    TwoProcessReplicationSpec's — this suite owns operator STATE.
  *
  * Sinks collect through foreachBatch into driver buffers — no memory
  * tables to name-collide, and the collected emission order per batch
  * is irrelevant to every assertion (sets / last-per-key / final
  * tallies).
  */
class StreamFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val params = Gen.Parameters.default
  private val baseMs = 1700000000000L

  /** Split xs into `n` contiguous micro-batches at random cut points
    * (empty batches allowed — an idle trigger must be harmless).
    */
  private def splitGen[T](xs: Seq[T], maxBatches: Int): Gen[Seq[Seq[T]]] =
    for {
      n <- Gen.choose(1, maxBatches)
      cuts <- Gen.listOfN(n - 1, Gen.choose(0, xs.length))
    } yield {
      val bounds = (0 +: cuts.sorted :+ xs.length).sliding(2).toSeq
      bounds.map { case Seq(a, b) => xs.slice(a, b) }
    }

  /** Drive a Dataset-typed stateful stream over the given batches,
    * collecting every emission via foreachBatch.
    */
  private def runBatches[I: org.apache.spark.sql.Encoder](
      batches: Seq[Seq[I]],
      plan: org.apache.spark.sql.Dataset[I] => DataFrame): Seq[org.apache.spark.sql.Row] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[I]
    val got = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]
    val q = plan(input.toDS()).writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.collect().foreach(got.add); ()
      }.start()
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()
    import scala.jdk.CollectionConverters._
    got.asScala.toSeq
  }

  test("22 random event streams x random splits: sessionize's closed " +
      "sessions equal the batch sessions minus each user's open tail") {
    var seed = org.scalacheck.rng.Seed(20260901L)
    var ran = 0
    while (ran < 22) {
      val gen = for {
        nUsers <- Gen.choose(1, 4)
        n <- Gen.choose(8, 50)
        gapsK <- Gen.listOfN(n, Gen.choose(0L, 40L))
        users <- Gen.listOfN(n, Gen.choose(1L, nUsers.toLong))
        gapMin <- Gen.choose(5L, 15L) // session gap in minutes
      } yield (users, gapsK, gapMin)
      gen.apply(params, seed).foreach { case (users, gapsK, gapMin) =>
        ran += 1
        var t = baseMs
        val events = users.zip(gapsK).map { case (u, g) =>
          t += g * 60000L // 0..40 min steps straddle the gap both ways
          Event(u, new Timestamp(t), "e", 0.0)
        }
        val gapMillis = gapMin * 60000L
        val batch = Streams.openSessions(events.toDS(), gapMillis).collect()
          .map(s => (s.user_id, s.startMs, s.endMs, s.n_events)).toSet
        val openTails = batch.groupBy(_._1).values.map(_.maxBy(_._2)).toSet
        val expectedClosed = batch -- openTails
        splitGen(events, 5).apply(params, seed.next).foreach { batches =>
          val closed = runBatches[Event](batches,
            ds => Streams.sessionize(ds, gapMillis).toDF())
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
          assert(closed == expectedClosed,
            s"sessionize drift (gap=${gapMin}m, ${batches.map(_.size)}): " +
              s"extra=${closed -- expectedClosed} missing=${expectedClosed -- closed}")
        }
      }
      seed = seed.next
    }
    assert(ran >= 22)
  }

  test("22 random series x random splits: rollingZscoreStream equals the " +
      "batch operator value-for-value, flags included") {
    var seed = org.scalacheck.rng.Seed(20260902L)
    var ran = 0
    while (ran < 22) {
      val gen = for {
        nUsers <- Gen.choose(1, 3)
        n <- Gen.choose(15, 70)
        users <- Gen.listOfN(n, Gen.choose(1L, nUsers.toLong))
        cents <- Gen.listOfN(n, Gen.choose(-50000L, 50000L))
        lookback <- Gen.choose(5, 10)
        minPrior <- Gen.choose(2, 4)
        sigmas <- Gen.oneOf(1.0, 2.0, 3.0)
      } yield (users, cents, lookback, minPrior, sigmas)
      gen.apply(params, seed).foreach { case (users, cents, lookback, minPrior, sigmas) =>
        ran += 1
        val events = users.zip(cents).zipWithIndex.map { case ((u, c), i) =>
          ZEvent(u, i.toLong, new Timestamp(baseMs + i * 1000L), c / 100.0)
        }
        val batch = graft.operators.TimeSeries.rollingZscore(
            events.toDF(), "user_id", "value", Seq(col("ts"), col("event_id")),
            lookback, minPrior, sigmas)
          .select("user_id", "event_id", "n_prior", "z", "is_anomaly")
          .as[(Long, Long, Long, Option[Double], Boolean)].collect().sortBy(_._2).toSeq
        splitGen(events, 5).apply(params, seed.next).foreach { batches =>
          val streamed = runBatches[ZEvent](batches,
            ds => Streams.rollingZscoreStream(ds, lookback, minPrior, sigmas).toDF())
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
              if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4)))
            .sortBy(_._2).toSeq
          assert(streamed == batch,
            s"zscore drift (lb=$lookback mp=$minPrior s=$sigmas " +
              s"splits=${batches.map(_.size)}): " +
              s"${streamed.zip(batch).filter(p => p._1 != p._2).take(3)}")
        }
      }
      seed = seed.next
    }
    assert(ran >= 22)
  }

  test("22 random series x random splits: ewmaStream's last emission per " +
      "(series, bucket) equals the batch EWMA row") {
    var seed = org.scalacheck.rng.Seed(20260903L)
    var ran = 0
    while (ran < 22) {
      val gen = for {
        n <- Gen.choose(10, 50)
        series <- Gen.listOfN(n, Gen.oneOf("a", "b"))
        hourSteps <- Gen.listOfN(n, Gen.choose(0L, 2L)) // repeats + gaps
        offs <- Gen.listOfN(n, Gen.choose(0L, 3599000L))
        cents <- Gen.listOfN(n, Gen.choose(0L, 100000L))
        lookback <- Gen.choose(2, 6)
      } yield (series, hourSteps, offs, cents, lookback)
      gen.apply(params, seed).foreach { case (series, hourSteps, offs, cents, lookback) =>
        ran += 1
        var hour = 0L
        val events = series.indices.map { i =>
          hour += hourSteps(i)
          EwEvent(series(i), new Timestamp(baseMs - baseMs % 3600000L
            + hour * 3600000L + offs(i)), cents(i) / 100.0)
        }.sortBy(_.ts.getTime) // in-order replay: the stream/batch contract
        val batch = graft.operators.TimeSeries.ewma(
            events.toDF(), "series", "ts", "value", lookback)
          .collect().map(r => ((r.getString(0), r.getTimestamp(1).getTime),
            (r.getLong(2), r.getDouble(3)))).toMap
        splitGen(events, 5).apply(params, seed.next).foreach { batches =>
          val emitted = runBatches[EwEvent](batches,
            ds => Streams.ewmaStream(ds, lookback).toDF())
            .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
          val last = emitted.zipWithIndex.groupBy(x => (x._1._1, x._1._2))
            .map { case (k, vs) => k -> { val e = vs.maxBy(_._2)._1; (e._3, e._4) } }
          assert(last == batch,
            s"ewma drift (lb=$lookback splits=${batches.map(_.size)}): " +
              s"${last.toSet.diff(batch.toSet).take(3)}")
        }
      }
      seed = seed.next
    }
    assert(ran >= 22)
  }

  test("16 random doc streams x id-ordered splits: dupSpanVerdictStream " +
      "verdicts equal the batch keep-first model under WITHIN-batch shuffle, " +
      "and removeSpansByStarts over them reproduces removeDupSpans exactly") {
    val pool = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta")
    var seed = org.scalacheck.rng.Seed(20260817L)
    var ran = 0
    while (ran < 16) {
      val gen = for {
        n <- Gen.choose(4, 20)
        k <- Gen.choose(2, 4)
        lens <- Gen.listOfN(n, Gen.choose(0, 12))
      } yield (n, k, lens)
      gen.apply(params, seed).foreach { case (n, k, lens) =>
        ran += 1
        val rnd = new scala.util.Random(ran * 7919)
        var nextId = 0L
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
        for (i <- 0 until n) {
          nextId += 1 + rnd.nextInt(3)
          val text =
            if (buf.nonEmpty && rnd.nextInt(3) == 0) // replant an earlier
              buf(rnd.nextInt(buf.size))._2           // text verbatim
            else (0 until lens(i)).map(_ => pool(rnd.nextInt(pool.size)))
              .mkString(" ")
          buf += ((nextId, text))
        }
        val docs = buf.toSeq
        // batch keep-first model: window → min owner; recycled iff id > owner
        def wins(t: String): Seq[(Int, String)] = {
          val tk = if (t.trim.isEmpty) Nil else t.trim.split("\\s+").toSeq
          if (tk.size < k) Nil
          else (1 to tk.size - k + 1).map(i =>
            i -> tk.slice(i - 1, i - 1 + k).mkString(" "))
        }
        val all = docs.flatMap { case (id, t) =>
          wins(t).map { case (s, w) => (id, s, w) } }
        val owner = all.groupBy(_._3).map { case (w, os) => w -> os.map(_._1).min }
        val model = all.map { case (id, s, w) => (id, s, id > owner(w)) }.toSet
        splitGen(docs, 4).apply(params, seed.next).foreach { batches0 =>
          val batches = batches0.map(b => rnd.shuffle(b))
          implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
          val input = MemoryStream[(Long, String)]
          val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int, Boolean)]
          val q = Streams.dupSpanVerdictStream(
              input.toDS().toDF("doc_id", "text"), "doc_id", "text", k)
            .writeStream.outputMode("update")
            .foreachBatch {
              (b: org.apache.spark.sql.Dataset[Streams.SpanVerdict], _: Long) =>
                b.collect().foreach(v =>
                  got.add((v.doc_id, v.start, v.recycled))); ()
            }.start()
          try batches.foreach { b => input.addData(b); q.processAllAvailable() }
          finally q.stop()
          import scala.jdk.CollectionConverters._
          val verdicts = got.asScala.toSeq
          assert(verdicts.size == all.size && verdicts.toSet == model,
            s"span verdict mismatch in program $ran (k $k)")
          // end-to-end: stream-fed excision == batch operator
          val docsDf = docs.toDF("doc_id", "text")
          val recycled = verdicts.filter(_._3).map(v => (v._1, v._2))
            .toDF("doc_id", "start")
          val streamed = graft.operators.Dedup.removeSpansByStarts(
              docsDf, "doc_id", "text", k, recycled)
            .orderBy("doc_id").collect().toSeq
          val batch = graft.operators.Dedup.removeDupSpans(
              docsDf, "doc_id", "text", k)
            .orderBy("doc_id").collect().toSeq
          assert(streamed == batch,
            s"stream-fed excision diverged from batch in program $ran (k $k)")
        }
      }
      seed = seed.next
    }
  }

  test("22 random doc streams x random splits: dedupStream emits exactly " +
      "one row per distinct content — late and replayed duplicates " +
      "included — matching the batch exact-dedup universe") {
    var seed = org.scalacheck.rng.Seed(20260904L)
    var ran = 0
    while (ran < 22) {
      val gen = for {
        nTexts <- Gen.choose(2, 8)
        n <- Gen.choose(10, 50)
        picks <- Gen.listOfN(n, Gen.choose(0, nTexts - 1))
        lateMin <- Gen.listOfN(n, Gen.choose(0L, 30L))
        replay <- Gen.oneOf(true, false)
      } yield (nTexts, picks, lateMin, replay)
      gen.apply(params, seed).foreach { case (nTexts, picks, lateMin, replay) =>
        ran += 1
        // first ARRIVAL of each text rides the in-order frontier; later
        // duplicates may arrive arbitrarily late — either the watermark
        // drops them or the keyed state dedups them, and both must
        // yield the same emission set (one row per distinct text)
        val seen = scala.collection.mutable.Set.empty[Int]
        var frontier = baseMs
        val rows = picks.zip(lateMin).map { case (p, late) =>
          frontier += 60000L
          val ts = if (seen.add(p)) frontier else frontier - late * 60000L
          (new Timestamp(ts), s"text_$p")
        }
        val expected = picks.distinct.map(p => s"text_$p").sorted
        splitGen(rows, 5).apply(params, seed.next).foreach { batches0 =>
          // at-least-once: optionally re-deliver a random earlier batch
          val batches = if (replay && batches0.nonEmpty)
            batches0 :+ batches0(picks.head % batches0.size) else batches0
          implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
          val input = MemoryStream[(Timestamp, String)]
          val got = new java.util.concurrent.ConcurrentLinkedQueue[String]
          val q = Streams.dedupStream(input.toDF().toDF("ts", "text"),
              "ts", "text", watermark = "10 minutes").select("text")
            .writeStream.outputMode("append")
            .foreachBatch { (b: DataFrame, _: Long) =>
              b.collect().foreach(r => got.add(r.getString(0))); ()
            }.start()
          try batches.foreach { b => input.addData(b); q.processAllAvailable() }
          finally q.stop()
          import scala.jdk.CollectionConverters._
          val emitted = got.asScala.toSeq.sorted
          assert(emitted == expected,
            s"dedup drift (replay=$replay splits=${batches.map(_.size)}): " +
              s"emitted=$emitted expected=$expected")
        }
      }
      seed = seed.next
    }
    assert(ran >= 22)
  }

  test("22 random doc streams x random splits: dedupStreamBounded equals a " +
      "driver-side watermark-state model — late rows drop, horizon-aged " +
      "state evicts, a past-horizon duplicate re-emits (the documented " +
      "bounded-state trade)") {
    // delay 75 s against minute-grain event times: every ts-vs-watermark
    // and expiry-vs-watermark comparison sits 15+ s from a tie, so the
    // model never straddles a boundary whose strictness Spark owns
    val delayMs = 75000L
    var seed = org.scalacheck.rng.Seed(20260908L)
    var ran = 0
    while (ran < 22) {
      val gen = for {
        nTexts <- Gen.choose(2, 5)
        n <- Gen.choose(12, 40)
        picks <- Gen.listOfN(n, Gen.choose(0, nTexts - 1))
        lateMin <- Gen.listOfN(n, Gen.choose(0L, 30L))
        nBatches <- Gen.choose(1, 5)
        assign <- Gen.listOfN(n, Gen.choose(0, nBatches - 1))
      } yield (picks, lateMin, assign, nBatches)
      gen.apply(params, seed).foreach { case (picks, lateMin, assign, nBatches) =>
        ran += 1
        var frontier = baseMs
        val rows = picks.zip(lateMin).map { case (p, late) =>
          frontier += 60000L
          (new Timestamp(frontier - late * 60000L), s"t_$p")
        }
        // place each row in its assigned batch, bumping forward so one
        // TEXT never appears twice in one micro-batch: within-batch
        // duplicates are deduped either way, but WHICH ts records the
        // state expiry would then depend on partition order — the one
        // nondeterminism a cross-engine model cannot mirror
        val batches = Array.fill(nBatches + picks.length)(
          scala.collection.mutable.ListBuffer.empty[(Timestamp, String)])
        rows.zip(assign).foreach { case (r, a) =>
          var b = a
          while (batches(b).exists(_._2 == r._2)) b += 1
          batches(b) += r
        }
        val fed = batches.map(_.toList).filter(_.nonEmpty).toSeq
        // the model: per-batch — late rows (ts < watermark) drop; a
        // text with LIVE state suppresses; otherwise emit and record
        // expiry ts+delay. Batch end: watermark advances to
        // max-event-time-seen − delay (late rows included — the
        // watermark tracks observed event time); state whose expiry
        // fell below the watermark evicts.
        var wm = 0L
        val state = scala.collection.mutable.Map.empty[String, Long]
        val expected = scala.collection.mutable.ListBuffer.empty[String]
        for (b <- fed) {
          var maxTs = Long.MinValue
          for ((ts, text) <- b) {
            maxTs = math.max(maxTs, ts.getTime)
            if (ts.getTime >= wm && !state.contains(text)) {
              expected += text
              state(text) = ts.getTime + delayMs
            }
          }
          if (maxTs != Long.MinValue) wm = math.max(wm, maxTs - delayMs)
          state.filterInPlace((_, exp) => exp >= wm)
        }
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
        val input = MemoryStream[(Timestamp, String)]
        val got = new java.util.concurrent.ConcurrentLinkedQueue[String]
        val q = Streams.dedupStreamBounded(input.toDF().toDF("ts", "text"),
            "ts", "text", watermark = "75 seconds").select("text")
          .writeStream.outputMode("append")
          .foreachBatch { (b: DataFrame, _: Long) =>
            b.collect().foreach(r => got.add(r.getString(0))); ()
          }.start()
        try fed.foreach { b => input.addData(b); q.processAllAvailable() }
        finally q.stop()
        import scala.jdk.CollectionConverters._
        val emitted = got.asScala.toSeq.sorted
        assert(emitted == expected.sorted,
          s"bounded-dedup model drift (batches=${fed.map(_.size)}): " +
            s"emitted=$emitted expected=${expected.sorted}")
      }
      seed = seed.next
    }
    assert(ran >= 22)
  }

  test("12 random shard streams x random splits x replayed batches: " +
      "bottomKSampleStream's per-shard finals equal the batch bottom-k " +
      "(a pure function of the id set)") {
    def mkRow(shards: Int)(id: Long): BkRow = {
      val rank = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      BkRow((java.lang.Long.parseLong(rank.take(8), 16) % shards).toInt, id, rank)
    }
    var seed = org.scalacheck.rng.Seed(20260905L)
    var ran = 0
    while (ran < 12) {
      val gen = for {
        n <- Gen.choose(20, 150)
        ids <- Gen.listOfN(n, Gen.choose(0L, 100000L))
        shards <- Gen.choose(1, 4)
        k <- Gen.choose(1, 6)
        replayAt <- Gen.choose(0, 4)
      } yield (ids, shards, k, replayAt)
      gen.apply(params, seed).foreach { case (ids, shards, k, replayAt) =>
        ran += 1
        val rows = ids.map(mkRow(shards))
        splitGen(rows, 5).apply(params, seed.next).foreach { batches0 =>
          val batches = batches0 :+ batches0(replayAt % batches0.size) // at-least-once
          val emitted = runBatches[BkRow](batches,
            ds => Streams.bottomKSampleStream(ds, k).toDF())
            .map(r => BkOut(r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3)))
          val finals = emitted.groupBy(_.shard).map { case (s, es) =>
            val top = es.map(_.ver).max
            s -> es.filter(_.ver == top).map(e => (e.rank, e.id)).sorted.toSeq
          }
          rows.groupBy(_.shard).foreach { case (s, rs) =>
            val want = rs.map(r => (r.rank, r.id)).distinct.sorted.take(k)
            assert(finals.getOrElse(s, Nil) == want,
              s"bottom-k drift on shard $s (k=$k): ${finals.get(s)} vs $want")
          }
        }
      }
      seed = seed.next
    }
    assert(ran >= 12)
  }

  test("12 random populations x random splits: the q207-shape streaming " +
      "drift monitor's final summary equals the batch drift over the " +
      "same pinned edges") {
    var seed = org.scalacheck.rng.Seed(20260906L)
    var ran = 0
    while (ran < 12) {
      val gen = for {
        nRef <- Gen.choose(10, 80)
        refC <- Gen.listOfN(nRef, Gen.choose(0L, 5000L))
        nArr <- Gen.choose(0, 80)
        arrC <- Gen.listOfN(nArr, Gen.choose(-1000L, 7000L)) // clamps both ways
        nBins <- Gen.choose(4, 16)
      } yield (refC, arrC, nBins)
      gen.apply(params, seed).foreach { case (refC, arrC, nBins) =>
        ran += 1
        val ref = refC.map(_ / 10.0)
        val arrivals = arrC.map(_ / 10.0)
        val lo = ref.min; val hi = ref.max // pinned at monitor start
        def bin(v: Double): Long =
          if (hi == lo) 0L
          else math.max(0L, math.min(nBins - 1L,
            math.floor((v - lo) * nBins / (hi - lo)).toLong))
        val refCounts = ref.groupBy(bin).view.mapValues(_.size.toLong).toMap
        // batch twin through the engine's own summary
        val expected = graft.operators.Drift.summarize(
          spark.range(nBins).select(col("id").as("bin"))
            .withColumn("c_a", coalesce(typedLit(refCounts).apply(col("bin")), lit(0L)))
            .withColumn("c_b", coalesce(typedLit(
              arrivals.groupBy(bin).view.mapValues(_.size.toLong).toMap)
              .apply(col("bin")), lit(0L))), nBins).head.toSeq
        // streamed: arrivals bin through a complete-mode aggregation
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
        val input = MemoryStream[Double]
        val lastAgg = new java.util.concurrent.atomic.AtomicReference[Map[Long, Long]](Map.empty)
        val agg = input.toDF().toDF("v")
          .groupBy(graft.operators.Drift.binExpr(col("v"), lit(lo), lit(hi), nBins).as("bin"))
          .agg(count(lit(1)).as("c_b"))
        val q = agg.writeStream.outputMode("complete")
          .foreachBatch { (b: DataFrame, _: Long) =>
            lastAgg.set(b.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap); ()
          }.start()
        try splitGen(arrivals, 4).apply(params, seed.next).foreach { batches =>
          batches.foreach { b => input.addData(b); q.processAllAvailable() }
        } finally q.stop()
        val streamedBinned = spark.range(nBins).select(col("id").as("bin"))
          .withColumn("c_a", coalesce(typedLit(refCounts).apply(col("bin")), lit(0L)))
          .withColumn("c_b", coalesce(typedLit(lastAgg.get()).apply(col("bin")), lit(0L)))
        val got = graft.operators.Drift.summarize(streamedBinned, nBins).head.toSeq
        assert(got == expected, s"drift monitor mismatch (bins=$nBins): $got vs $expected")
      }
      seed = seed.next
    }
    assert(ran >= 12)
  }

  test("3 random stop/restart walks: flatMapGroupsWithState state survives " +
      "a restart from checkpoint over a replayable file source (bottom-k: " +
      "run-1 emissions + run-2 emissions reach the exact batch answer)") {
    var seed = org.scalacheck.rng.Seed(20260907L)
    var ran = 0
    while (ran < 3) {
      val gen = for {
        n <- Gen.choose(60, 160)
        ids <- Gen.listOfN(n, Gen.choose(0L, 100000L))
        shards <- Gen.choose(2, 4)
        k <- Gen.choose(2, 5)
        cutPct <- Gen.choose(20, 80)
      } yield (ids, shards, k, cutPct)
      gen.apply(params, seed).foreach { case (ids, shards, k, cutPct) =>
        ran += 1
        def mkRow(id: Long): BkRow = {
          val rank = java.security.MessageDigest.getInstance("MD5")
            .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
          BkRow((java.lang.Long.parseLong(rank.take(8), 16) % shards).toInt, id, rank)
        }
        val rows = ids.map(mkRow)
        val cut = rows.length * cutPct / 100
        val dir = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get("target"), "streamfz-src")
        val ckpt = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get("target"), "streamfz-ckpt").toString
        val schema = Seq.empty[BkRow].toDS().schema
        def writeFiles(part: Seq[BkRow], tag: String): Unit =
          part.grouped(math.max(1, part.size / 3 + 1)).zipWithIndex.foreach {
            case (g, i) => g.toDS().coalesce(1).write
              .parquet(dir.resolve(s"b_${tag}_$i").toString)
          }
        val got = new java.util.concurrent.ConcurrentLinkedQueue[BkOut]
        def run(): Unit = {
          val src = spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            // name subdirs without '=' and read via a recursive lookup:
            .option("recursiveFileLookup", "true")
            .parquet(dir.toString).as[BkRow]
          val q = Streams.bottomKSampleStream(src, k).toDF()
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .foreachBatch { (b: DataFrame, _: Long) =>
              b.collect().foreach(r =>
                got.add(BkOut(r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3))))
              ()
            }.start()
          q.awaitTermination()
        }
        writeFiles(rows.take(cut), "run1")
        run() // processes the first tranche, checkpoints state, stops
        writeFiles(rows.drop(cut), "run2")
        run() // NEW query, same checkpoint: state must resume, not reset
        import scala.jdk.CollectionConverters._
        val emitted = got.asScala.toSeq
        val finals = emitted.groupBy(_.shard).map { case (s, es) =>
          val top = es.map(_.ver).max
          s -> es.filter(_.ver == top).map(e => (e.rank, e.id)).sorted.toSeq
        }
        rows.groupBy(_.shard).foreach { case (s, rs) =>
          val want = rs.map(r => (r.rank, r.id)).distinct.sorted.take(k)
          assert(finals.getOrElse(s, Nil) == want,
            s"restart drift on shard $s (k=$k cut=$cut/${rows.length}): " +
              s"${finals.get(s)} vs $want")
        }
        // non-vacuous: run 2 really resumed (vers continued past run 1's)
        assert(emitted.nonEmpty)
      }
      seed = seed.next
    }
    assert(ran >= 3)
  }
}
