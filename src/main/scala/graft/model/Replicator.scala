package graft.model

import org.apache.spark.sql.Column

/** Master→slave replication — the reference's transaction-streaming
  * subsystem closed into a loop (reference
  * transaction-streaming.lisp:141-170 slave apply;
  * transactions.lisp:884-1003 serialized txn log;
  * spatial-query.lisp:161-172 subset filters;
  * tests/replication/run-replication-test.sh two-process test, here
  * two stores in one JVM / two Spark apps sharing storage paths).
  *
  * The slave's epoch pointer doubles as the replication cursor:
  * [[sync]] tails every master epoch above it in ONE partition-pruned
  * read per table (epoch dirs are partition dirs — only new commits'
  * files are touched) and installs the rows verbatim at their original
  * epochs, so `read()`, `history()` and `asOf` snapshots all converge
  * to the master's. A subset predicate per table (the spatial
  * replication filter) drops out-of-scope rows before they land.
  *
  * Scale: per sync, work is proportional to the commit delta, never
  * the table; filters are plain pushdown-able predicates. Lag is
  * whatever the caller's cadence is — [[followCommits]] pins it to
  * zero by syncing inside the master's commit hook.
  */
final class Replicator(
    master: VersionedStore,
    slave: VersionedStore,
    tables: Seq[String],
    /** per-table row predicate; absent = replicate everything. */
    subset: Map[String, Column] = Map.empty) {

  /** Apply all master epochs the slave has not seen. Returns the
    * slave's new epoch (== master's at call time). Idempotent: a
    * repeat call with nothing new is a no-op, and a crashed apply
    * leaves orphan rows above the slave pointer that the next apply
    * clears (same discipline as writer commits).
    */
  def sync(): Long = {
    val from = slave.currentEpoch
    val to = master.currentEpoch
    if (to > from) {
      val writes = tables.flatMap { t =>
        val delta = master.changesSince(t, from, to)
        if (delta.columns.isEmpty) None
        else Some(t -> subset.get(t).map(delta.filter).getOrElse(delta))
      }.toMap
      slave.applyReplicated(to, writes)
    }
    to
  }

  /** Zero-lag mode: hook the master store's commits so every committed
    * transaction is applied to the slave in the same call stack — the
    * reference's always-streaming slave socket.
    */
  def followCommits(gs: GraphStore): Unit = gs.onCommit { (_, _) => sync() }
}

object Replicator {
  /** Replicate every table of a graph schema. */
  def forGraph(masterGs: GraphStore, slave: VersionedStore,
      subset: Map[String, Column] = Map.empty): Replicator = {
    val tables = (masterGs.schema.vertexTypes.keys ++ masterGs.schema.edgeTypes.keys)
      .map(masterGs.tableFor).toSeq.sorted
    val tableSubset = subset.map { case (label, p) => masterGs.tableFor(label) -> p }
    new Replicator(masterGs.store, slave, tables, tableSubset)
  }
}
