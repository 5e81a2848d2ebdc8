package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.{GraphStore, VersionedStore}

/** Exactly-once Structured-Streaming ingest into the transactional
  * store — the durability story for streams that WRITE the graph
  * (`q195`'s ingest shape), hardened against micro-batch replay.
  *
  * Spark's `foreachBatch` contract is at-least-once: after a crash (or
  * any failure inside the batch body) the restarted query re-runs the
  * last un-checkpointed `batchId` with identical contents. A naive
  * sink that commits each batch therefore re-commits on replay —
  * create-ingests crash-loop on the store's OCC conflict
  * (create-over-live rejects), and anything weaker double-applies.
  *
  * The fix is the idempotent-writer pattern (the same shape as Delta
  * Lake's public `txnAppId`/`txnVersion` option pair): every slice
  * commit atomically carries a CURSOR row `(sink_id, batch_id, slice)`
  * in a reserved `_ingest_cursor` table — same `Txn`, same epoch
  * pointer flip, so data and cursor are crash-atomic — and a replayed
  * `(batchId, slice)` at or below the stored cursor is skipped without
  * touching the data tables. Batches are optionally split into
  * `slices` id-keyed sub-commits (`pmod(id, slices)`), so the ingest
  * exercises repeated maintained commits and a crash mid-batch
  * resumes at slice granularity: applied slices skip, unapplied
  * slices run, nothing applies twice.
  *
  * Scope of the guarantee (same as the Delta pattern's): replay
  * protection assumes the checkpoint lineage — Spark replays a
  * `batchId` with identical contents only from the SAME checkpoint.
  * Starting the same `sinkId` over with a fresh checkpoint re-numbers
  * batches with different contents; use a fresh `sinkId` (or vacuum
  * the cursor) for a logically new ingest.
  *
  * Reference anchor: the reference's durable commit path replays its
  * transaction log idempotently on recovery (transactions.lisp's
  * recover path); this is that contract surfaced at the streaming
  * ingest boundary.
  */
object TransactionalIngest {

  /** Reserved bookkeeping table: one live row per sink id. The "_"
    * prefix keeps it outside the schema surface, the stats report,
    * and the default replication set.
    */
  val cursorTable = "_ingest_cursor"

  /** Stable 64-bit row id for a sink (cursor rows are keyed by it;
    * `sink_id` is also stored verbatim, so a birthday collision at
    * 2^-64 odds would surface as a visible mixed row, not silent
    * corruption).
    */
  private def sinkKey(sinkId: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(sinkId.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(d).getLong
  }

  /** Last applied (batchId, slice) for `sinkId`, or None before the
    * sink's first commit. Public for ops introspection and for
    * resetting decisions ("is this checkpoint ahead of the store?").
    *
    * Cost note: this (and [[currentRev]]) is a driver `collect()` over
    * the one-row-per-sink reserved cursor table, paid once per COMMIT
    * (slice), never per row — at any corpus size the table holds one
    * live row per sink, so do not "optimize" it into a join against
    * the batch.
    */
  def cursor(store: VersionedStore, sinkId: String): Option[(Long, Long)] = {
    val df = store.read(cursorTable)
    if (df.columns.isEmpty) None
    else df.filter(col("sink_id") === sinkId)
      .select("batch_id", "slice").collect().headOption
      .map(r => (r.getLong(0), r.getLong(1)))
  }

  private def currentRev(store: VersionedStore, key: Long): Long =
    store.latestRevisions(cursorTable).filter(col("id") === key)
      .select("rev").collect().headOption.map(_.getLong(0)).getOrElse(0L)

  /** Retire a sink's cursor (tombstone revision, normal commit) — the
    * explicit "this is a logically NEW ingest" verb: restarting a
    * `sinkId` over a FRESH checkpoint re-numbers batches with
    * different contents, so its old cursor must not suppress them.
    * After reset the next sink closure starts from batch (none) while
    * the cursor's revision chain stays intact (MVCC history keeps the
    * old ingest's audit trail). Returns false when the sink has no
    * live cursor — resetting twice, or a never-used id, is a no-op.
    */
  def reset(gs: GraphStore, sinkId: String): Boolean = {
    val key = sinkKey(sinkId)
    cursor(gs.store, sinkId) match {
      case None => false
      case Some((b, m)) =>
        val spark = gs.spark
        import spark.implicits._
        val tomb = Seq((key, currentRev(gs.store, key) + 1L, true, sinkId, b, m))
          .toDF("id", "rev", "deleted", "sink_id", "batch_id", "slice")
        gs.txn().stageRaw(cursorTable, tomb).commit()
        true
    }
  }

  /** A `foreachBatch` body that ingests vertex rows `(id, props…)`
    * into `label` exactly once across crash/replay.
    *
    * Per micro-batch: rows are split into `slices` sub-commits by
    * `pmod(id, slices)`; each sub-commit stages the vertices through
    * the normal `Txn` path (schema checks, rev derivation, OCC, bound
    * maintained indexes/views refresh in the same commit call stack)
    * PLUS the cursor row, atomically. Slices at or below the stored
    * cursor skip. Empty slices still advance the cursor (the skip set
    * must stay a prefix of (batch, slice) order).
    *
    * `upsert = false` (append feed) creates rows — a live id is a
    * data error and conflicts; `upsert = true` (CDC feed) stages full
    * replacement revisions, so re-keyed rows across batches apply
    * last-writer-wins in batch order and a deleted id resurrects.
    * Replay protection is identical in both modes: skipped slices
    * never reach the Txn at all.
    *
    * `onCommit(epoch, batchId, slice)` fires after each durable
    * commit (deploy-then-bind lifecycles hook here); `beforeSlice` is
    * a test seam for crash injection.
    *
    * The in-memory rev counter is seeded from the store on first use,
    * so a restarted JVM (fresh closure, same store) resumes the
    * cursor's revision chain; a genuinely concurrent writer on the
    * same `sinkId` is a misconfiguration and surfaces as the store's
    * OCC ConflictException, never a silent double-apply.
    */
  def vertexSink(gs: GraphStore, label: String, sinkId: String, slices: Int = 1,
      upsert: Boolean = false,
      onCommit: (Long, Long, Long) => Unit = (_, _, _) => (),
      beforeSlice: (Long, Long) => Unit = (_, _) => ()): (DataFrame, Long) => Unit = {
    gs.schema.requireVertex(label) // fail fast — an empty first batch
    // must not silently advance a cursor for a label that can't ingest
    cursorSink(gs, sinkId, slices, col("id"), onCommit, beforeSlice) {
      (txn, part) =>
        if (upsert) txn.updateVertices(label, part)
        else txn.createVertices(label, part)
    }
  }

  /** Edge-ingest twin of [[vertexSink]]: rows are `(src, dst,
    * weight?, props…)`, sliced by `pmod(src, slices)` (ids are
    * assigned by `Txn.createEdges`'s insertion hash — per-attempt
    * values, which is fine: slice commits are atomic, so exactly one
    * attempt's ids ever land). A training pipeline's graph
    * construction (co-purchase edges, citation links, session
    * transitions) streams through here with the same crash/replay
    * exactly-once contract.
    */
  def edgeSink(gs: GraphStore, label: String, sinkId: String, slices: Int = 1,
      onCommit: (Long, Long, Long) => Unit = (_, _, _) => (),
      beforeSlice: (Long, Long) => Unit = (_, _) => ()): (DataFrame, Long) => Unit = {
    gs.schema.requireEdge(label)
    cursorSink(gs, sinkId, slices, col("src"), onCommit, beforeSlice) {
      (txn, part) => txn.createEdges(label, part)
    }
  }

  /** Shared cursor machinery: slice the batch by `pmod(sliceKey,
    * slices)`, skip slices at or below the stored cursor, stage each
    * live slice via `stagePart` plus the cursor row in one atomic
    * commit.
    */
  private def cursorSink(gs: GraphStore, sinkId: String, slices: Int,
      sliceKey: org.apache.spark.sql.Column,
      onCommit: (Long, Long, Long) => Unit,
      beforeSlice: (Long, Long) => Unit)(
      stagePart: (GraphStore#Txn, DataFrame) => Unit): (DataFrame, Long) => Unit = {
    require(slices >= 1, s"slices must be >= 1, got $slices")
    val key = sinkKey(sinkId)
    var rev = -1L // lazily seeded: the store may gain commits before the stream starts
    var curIndexed = false
    // the cursor rides the same in-memory discipline as `rev`: this
    // closure is the sink's only legitimate writer (a concurrent writer
    // on one sinkId is a documented misconfiguration surfacing as OCC
    // conflict), so after the first store read the cursor advances in
    // memory with each durable commit — one store read per closure
    // lifetime instead of one per micro-batch (each read is a
    // current-index scan + collect, pure latency on the ingest path).
    // `null` = unknown (first use, or any failure since the last
    // durable commit): re-read from the store, which stays the source
    // of truth across crash/replay.
    var applied: Option[(Long, Long)] = null
    (batch: DataFrame, batchId: Long) => {
      val spark = gs.spark
      import spark.implicits._
      if (rev < 0L) rev = currentRev(gs.store, key)
      if (applied == null) applied = cursor(gs.store, sinkId)
      def isApplied(m: Long): Boolean =
        applied.exists { case (b, s) => b > batchId || (b == batchId && s >= m) }
      val rows = batch.persist()
      try {
        // ONE per-batch count action decides every slice's emptiness
        // (was one isEmpty probe per slice — the micro-commit latency
        // floor is a count of Spark actions, guide §1.2); skipped
        // entirely when replay already applied the whole batch
        val pending = (0L until slices.toLong).filterNot(isApplied)
        val sliceRows: Map[Long, Long] =
          if (pending.isEmpty) Map.empty
          else rows.groupBy(pmod(sliceKey, lit(slices)).cast("long").as("__m"))
            .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        (0L until slices.toLong).foreach { m =>
          if (!isApplied(m)) {
            beforeSlice(batchId, m)
            val cur = Seq((key, rev + 1L, false, sinkId, batchId, m))
              .toDF("id", "rev", "deleted", "sink_id", "batch_id", "slice")
            val txn = gs.txn()
            val part = rows.filter(pmod(sliceKey, lit(slices)) === m)
            if (sliceRows.getOrElse(m, 0L) > 0L) stagePart(txn, part)
            val epoch =
              try txn.stageRaw(cursorTable, cur).commit()
              catch { case e: Throwable => applied = null; throw e }
            rev += 1L
            applied = Some((batchId, m))
            // opt the cursor table into the current-state index after
            // this closure's first commit (compactCurrent no-ops for a
            // not-yet-created table, so it can't run up front): the
            // cursor's MVCC history grows one row per commit forever,
            // and OCC validation per commit must stay O(current+delta),
            // not O(ingest age). Idempotent across restarts — a
            // re-compaction of the 1-row table is a cheap no-op.
            if (!curIndexed) { gs.store.compactCurrent(cursorTable); curIndexed = true }
            onCommit(epoch, batchId, m)
          }
        }
      } finally { rows.unpersist(); () }
    }
  }
}
