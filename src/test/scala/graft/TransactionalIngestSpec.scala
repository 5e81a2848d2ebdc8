package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.model.{GraphSchema, GraphStore}
import graft.streaming.TransactionalIngest

/** Exactly-once streaming ingest (TransactionalIngest): foreachBatch
  * is at-least-once, so the sink's commit-carried cursor must make
  * replays skip at SLICE granularity — and a restarted JVM (fresh
  * closure, rev counter re-seeded from the store) must resume the
  * cursor's revision chain. q196 drives the same machinery through
  * the oracle catalog; here the commit SEQUENCE itself is pinned.
  */
class TransactionalIngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) = java.nio.file.Files.createTempDirectory(
    java.nio.file.Paths.get(sys.props("java.io.tmpdir")), prefix).toString

  private def chunkedSource(nRows: Int, files: Int): (String, org.apache.spark.sql.types.StructType) = {
    val dir = tmp("ti-src")
    spark.range(nRows).select(col("id"), (col("id") * 10).as("score"))
      .repartitionByRange(files, col("id"))
      .write.mode("overwrite").parquet(dir)
    (dir, spark.read.parquet(dir).schema)
  }

  private def newStore(): GraphStore = {
    val schema = GraphSchema.builder().vertex("doc", "id", Seq("score")).build()
    new GraphStore(spark, schema, tmp("ti-store"))
  }

  private def runStream(srcDir: String, schema: org.apache.spark.sql.types.StructType,
      ckpt: String, sink: (org.apache.spark.sql.DataFrame, Long) => Unit): Boolean =
    try {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(); true
    } catch { case _: StreamingQueryException => false }

  test("clean run: every row lands once, cursor tracks (batch, slice), " +
      "empty slices still advance the cursor") {
    val (src, schema) = chunkedSource(40, 2)
    val gs = newStore()
    val commits = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val sink = TransactionalIngest.vertexSink(gs, "doc", "clean", slices = 4,
      onCommit = (_, b, m) => commits += ((b, m)))
    assert(runStream(src, schema, tmp("ti-ck"), sink))
    assert(gs.graph().vertices("doc").count() == 40L)
    // 2 batches x 4 slices, in (batch, slice) order, nothing repeated
    assert(commits.toSeq == (for (b <- 0L to 1L; m <- 0L to 3L) yield (b, m)))
    assert(TransactionalIngest.cursor(gs.store, "clean").contains((1L, 3L)))
    // the cursor is per-sink: an unknown sink reads None
    assert(TransactionalIngest.cursor(gs.store, "other").isEmpty)
  }

  test("crash at (batch 1, slice 2) with two slices durable: a FRESH sink " +
      "closure over the same checkpoint skips exactly the applied slices " +
      "and nothing commits twice") {
    val (src, schema) = chunkedSource(80, 4)
    val gs = newStore()
    val ckpt = tmp("ti-ck")
    val commits1 = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    intercept[IllegalArgumentException] { // unknown label rejects at creation
      TransactionalIngest.vertexSink(gs, "nosuch", "bad", slices = 4)
    }
    val gsSink1 = TransactionalIngest.vertexSink(gs, "doc", "replay", slices = 4,
      onCommit = (_, b, m) => commits1 += ((b, m)),
      beforeSlice = (b, m) => if (b == 1L && m == 2L)
        throw new RuntimeException("injected crash"))
    assert(!runStream(src, schema, ckpt, gsSink1), "first run must fail at the poison")
    assert(commits1.toSeq == Seq((0L, 0L), (0L, 1L), (0L, 2L), (0L, 3L), (1L, 0L), (1L, 1L)))
    assert(TransactionalIngest.cursor(gs.store, "replay").contains((1L, 1L)))
    // restart as a crashed JVM would: a brand-new closure (rev counter
    // re-seeded from the store), same store, same checkpoint, no poison
    val commits2 = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val sink2 = TransactionalIngest.vertexSink(gs, "doc", "replay", slices = 4,
      onCommit = (_, b, m) => commits2 += ((b, m)))
    assert(runStream(src, schema, ckpt, sink2), "restart must complete")
    // batch 1 replays: slices 0-1 SKIP (no commit), 2-3 apply, then 2,3
    assert(commits2.toSeq ==
      Seq((1L, 2L), (1L, 3L)) ++ (for (b <- 2L to 3L; m <- 0L to 3L) yield (b, m)))
    assert(TransactionalIngest.cursor(gs.store, "replay").contains((3L, 3L)))
    // exactly-once: all 80 rows live, every id committed exactly once
    // (a double-create would either conflict or leave rev > 1)
    val live = gs.graph().vertices("doc")
    assert(live.count() == 80L)
    assert(gs.store.latestRevisions("v_doc").agg(max("rev")).head().getLong(0) == 1L)
    // 16 slice commits total despite batch 1 running twice
    assert(gs.store.currentEpoch == 16L)
  }

  test("upsert mode: re-keyed rows apply last-writer-wins in batch order, " +
      "and a replayed batch leaves values untouched") {
    val gs = newStore()
    // the sinks are plain foreachBatch bodies — drive them directly
    // (the streaming plumbing is covered by the crash/replay test)
    val sink = TransactionalIngest.vertexSink(gs, "doc", "cdc", slices = 2,
      upsert = true)
    sink((0L until 10L).map(i => (i, i * 10L)).toDF("id", "score"), 0L)
    sink(Seq((3L, 999L), (11L, 111L)).toDF("id", "score"), 1L) // update + insert
    def scores() = gs.graph().vertices("doc")
      .select("id", "score").as[(Long, Long)].collect().toMap
    val after = scores()
    assert(after(3L) == 999L && after(11L) == 111L && after(0L) == 0L)
    assert(after.size == 11)
    // replay of batch 1 (same contents, cursor ahead): zero effect
    sink(Seq((3L, 999L), (11L, 111L)).toDF("id", "score"), 1L)
    assert(scores() == after)
    assert(gs.store.latestRevisions("v_doc")
      .filter(col("id") === 3L).head().getLong(1) == 2L,
      "the update is ONE revision — replays add none")
  }

  test("reset retires the cursor: a fresh-checkpoint re-ingest under the " +
      "same sinkId applies instead of being replay-suppressed") {
    val gs = newStore()
    val sink = TransactionalIngest.vertexSink(gs, "doc", "re", slices = 2, upsert = true)
    sink((0L until 8L).map(i => (i, i)).toDF("id", "score"), 0L)
    assert(TransactionalIngest.cursor(gs.store, "re").contains((0L, 1L)))
    // without reset, a fresh checkpoint restarting at batch 0 would be
    // silently skipped (cursor at or past it) — the doc'd hazard
    sink((100L until 104L).map(i => (i, i)).toDF("id", "score"), 0L)
    assert(gs.graph().vertices("doc").count() == 8L, "stale cursor must suppress")
    assert(TransactionalIngest.reset(gs, "re"))
    assert(TransactionalIngest.cursor(gs.store, "re").isEmpty)
    assert(!TransactionalIngest.reset(gs, "re"), "double reset is a no-op")
    // a NEW closure over the reset cursor applies batch 0 again
    val sink2 = TransactionalIngest.vertexSink(gs, "doc", "re", slices = 2, upsert = true)
    sink2((100L until 104L).map(i => (i, i)).toDF("id", "score"), 0L)
    assert(gs.graph().vertices("doc").count() == 12L)
    assert(TransactionalIngest.cursor(gs.store, "re").contains((0L, 1L)),
      "the revived cursor tracks the new ingest")
  }

  test("edge ingest: crash/replay exactly-once for graph construction") {
    val schema = GraphSchema.builder()
      .vertex("doc", "id", Seq("score"))
      .edge("cites", "doc", "doc", Seq.empty).build()
    val gs = new GraphStore(spark, schema, tmp("ti-store"))
    gs.txn().createVertices("doc",
      (0L until 20L).map(i => (i, i * 10L)).toDF("id", "score")).commit()
    val edges = (0L until 19L).map(i => (i, i + 1L)).toDF("src", "dst")
    var armed = true
    val sink = TransactionalIngest.edgeSink(gs, "cites", "links", slices = 4,
      beforeSlice = (b, m) => if (armed && b == 0L && m == 2L) {
        armed = false
        throw new RuntimeException("injected crash")
      })
    intercept[RuntimeException] { sink(edges, 0L) } // slices 0,1 durable
    assert(TransactionalIngest.cursor(gs.store, "links").contains((0L, 1L)))
    sink(edges, 0L) // replay: 0,1 skip; 2,3 apply
    assert(gs.graph().edgeFrame("cites").count() == 19L)
    // exactly once: no (src, dst) pair landed twice
    assert(gs.graph().edgeFrame("cites")
      .groupBy("src", "dst").count().filter(col("count") > 1).isEmpty)
    assert(TransactionalIngest.cursor(gs.store, "links").contains((0L, 3L)))
  }

  test("maintained views ride the ingest: a bound view stays exact " +
      "across the crash/replay cycle (replays must not double-count)") {
    val (src, schema) = chunkedSource(60, 3)
    val gs = newStore()
    // seed outside the stream's id range so regenerate has a base
    gs.txn().createVertices("doc",
      (1000L until 1010L).map(i => (i, i * 10L)).toDF("id", "score")).commit()
    val cat = new graft.views.ViewCatalog(spark, gs, tmp("ti-views"))
    cat.register(graft.views.ViewDef("score_by_mod", "doc",
      df => df.select(pmod(col("id"), lit(5)).as("key"), col("id"),
        col("score").as("value")),
      reduceAgg = Some(sum(col("value")))))
    cat.bindTo(gs)
    cat.regenerate("score_by_mod")
    val ckpt = tmp("ti-ck")
    var armed = true
    val sink1 = TransactionalIngest.vertexSink(gs, "doc", "viewed", slices = 2,
      beforeSlice = (b, m) => if (armed && b == 1L && m == 1L) {
        armed = false
        throw new RuntimeException("injected crash")
      })
    assert(!runStream(src, schema, ckpt, sink1))
    assert(runStream(src, schema, ckpt, sink1), "same-closure retry must complete")
    // the maintained view must equal a from-scratch recompute: a
    // double-applied slice would double its delta contribution
    val maintained = cat.reducedView("score_by_mod").select("key", "value")
      .orderBy("key").as[(Long, Long)].collect().toSeq
    cat.regenerate("score_by_mod")
    val recomputed = cat.reducedView("score_by_mod").select("key", "value")
      .orderBy("key").as[(Long, Long)].collect().toSeq
    assert(maintained == recomputed)
    assert(maintained.map(_._2).sum ==
      ((0L until 60L) ++ (1000L until 1010L)).map(_ * 10L).sum)
  }
}
