package graft.model

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Logical snapshot/backup and transaction-log replay — reference
  * backup.lisp:3-53 (`backup`: serialize every live node) and
  * backup.lisp:93+ / README.md:26-33 (`replay`, v1→v2 migration by
  * re-applying the log).
  */
object Backup {

  /** Logical dump: every live vertex/edge frame exported as parquet
    * (the snapshot job; include-deleted-p = false semantics). The
    * manifest is written LAST: it is the backup's commit record, so a
    * crashed half-written dump can never be mistaken for a complete
    * one at restore time.
    */
  def backup(graph: PropertyGraph, dir: String): Unit = {
    graph.vertexLabels.foreach { l =>
      graph.vertexFrame(l).write.mode("overwrite").parquet(s"$dir/vertices/$l")
    }
    graph.edgeLabels.foreach { l =>
      graph.edgeFrame(l).write.mode("overwrite").parquet(s"$dir/edges/$l")
    }
    def arr(xs: Iterable[String]) = xs.toSeq.sorted.map(l => "\"" + l + "\"").mkString("[", ",", "]")
    Files.writeString(Paths.get(dir, "_manifest.json"),
      s"""{"vertices": ${arr(graph.vertexLabels)}, "edges": ${arr(graph.edgeLabels)}}""")
  }

  /** Rebuild a PropertyGraph from a logical dump. Refuses a dump with
    * no manifest (interrupted backup) — restoring a partial snapshot
    * silently dropping labels is the failure mode this guards.
    */
  def restore(spark: SparkSession, schema: GraphSchema, dir: String): PropertyGraph = {
    val manifest = Paths.get(dir, "_manifest.json")
    require(Files.exists(manifest),
      s"no _manifest.json in $dir: backup incomplete or interrupted")
    val text = Files.readString(manifest)
    def labels(kind: String): Seq[String] =
      ("\"" + kind + "\"\\s*:\\s*\\[([^\\]]*)\\]").r.findFirstMatchIn(text)
        .map(_.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq)
        .getOrElse(Seq.empty)
    def load(kind: String): Map[String, DataFrame] =
      labels(kind).map { l =>
        val p = Paths.get(dir, kind, l)
        require(Files.exists(p), s"manifest lists $kind/$l but it is missing from $dir")
        l -> spark.read.parquet(p.toString)
      }.toMap
    new PropertyGraph(schema, load("vertices"), load("edges"))
  }

  /** Replay a store's commit log into a fresh store, epoch by epoch —
    * the restore-replay path (and the slave side of replication:
    * transactions.lisp:884-1003 re-applies streamed txns in order).
    * An optional subset filter drops rows the replica doesn't carry
    * (spatial subset replication, spatial-query.lisp:161-172). The
    * filter must depend only on immutable row attributes (e.g. id
    * ranges / a fixed home region): filtering on mutable props could
    * admit rev N without its predecessors and fail OCC validation —
    * the reference needed explicit reconciliation for exactly this
    * (transactions.lisp:884-1003). Replay needs the UNVACUUMED log:
    * compaction drops superseded revisions, and a replayed commit whose
    * base revision was vacuumed away fails OCC validation — mirroring
    * the reference, where archived txns are gone from the replayable
    * stream (transactions.lisp:408-599).
    */
  /** Incremental backup — the 100 TB operating mode the reference's
    * whole-graph serialize (backup.lisp:39-53) cannot reach: each call
    * dumps only the commit-log slice `(lastBackedUp, currentEpoch]`
    * into `root/inc_<from>_<to>/` (version rows verbatim, commit_epoch
    * preserved, tombstones included), so backup cost is proportional
    * to WRITES SINCE LAST BACKUP, never to store size. The chain
    * replays through the same apply path replication slaves use, so a
    * restored store converges to identical `read`/`history`/`asOf`
    * surfaces — and a PREFIX of the chain is a point-in-time restore.
    *
    * Each increment's manifest is written LAST (the full dump's
    * commit-record discipline): a crashed half-written increment is
    * invisible to both the next `incremental` call and `restoreChain`.
    * Returns the new high-water epoch (== `from` when nothing new
    * committed — the call is then a no-op and writes nothing).
    */
  def incremental(store: VersionedStore, tables: Seq[String], root: String): Long = {
    val from = chainTo(root) // 0 on the first call
    val to = store.currentEpoch
    if (to <= from) return from
    val dir = Paths.get(root, s"inc_${from}_$to")
    val dumped = tables.sorted.flatMap { t =>
      val slice = store.changesSince(t, from, to)
      if (slice.columns.isEmpty || slice.isEmpty) None
      else {
        slice.write.mode("overwrite").parquet(dir.resolve(t).toString)
        Some(t)
      }
    }
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("_manifest.json"),
      s"""{"from": $from, "to": $to, "tables": [${
        dumped.map("\"" + _ + "\"").mkString(",")}]}""")
    to
  }

  /** The chain's committed high-water epoch: max `to` across manifested
    * increments (manifest-less dirs are crashed dumps and don't count).
    */
  def chainTo(root: String): Long =
    chainIncrements(root).lastOption.map(_._2).getOrElse(0L)

  /** Manifested increments as (from, to, dir), ordered by `from`. */
  private def chainIncrements(root: String): Seq[(Long, Long, java.nio.file.Path)] = {
    val r = Paths.get(root)
    if (!Files.isDirectory(r)) return Seq.empty
    val inc = "inc_(\\d+)_(\\d+)".r
    val stream = Files.list(r)
    try {
      val out = Seq.newBuilder[(Long, Long, java.nio.file.Path)]
      stream.iterator().forEachRemaining { p =>
        p.getFileName.toString match {
          case inc(f, t) if Files.exists(p.resolve("_manifest.json")) =>
            out += ((f.toLong, t.toLong, p))
          case _ => ()
        }
      }
      out.result().sortBy(_._1)
    } finally stream.close()
  }

  /** Restore a store from an increment chain — optionally only up to
    * epoch `upTo` (point-in-time restore; rows above it in the
    * containing increment are filtered out before apply). Refuses a
    * gapped chain loudly: applying `inc_7_9` to a store at epoch 5
    * would install rows whose base revisions are missing, the exact
    * partial-restore corruption the full dump's manifest guard exists
    * to prevent.
    */
  def restoreChain(spark: SparkSession, root: String, targetDir: String,
      upTo: Long = Long.MaxValue): VersionedStore = {
    val target = new VersionedStore(spark, targetDir)
    val incs = chainIncrements(root)
    require(incs.nonEmpty, s"no complete increments under $root")
    incs.foreach { case (from, to, dir) =>
      if (from < upTo) {
        require(from == target.currentEpoch,
          s"increment chain gap: $dir starts at epoch ${from + 1} but the " +
            s"restore stands at ${target.currentEpoch} — missing increment")
        val bound = math.min(to, upTo)
        val manifest = Files.readString(dir.resolve("_manifest.json"))
        val tables = "\"([^\"]+)\"".r.findAllMatchIn(
          manifest.substring(manifest.indexOf("["))).map(_.group(1)).toSeq
        val writes = tables.flatMap { t =>
          val rows = spark.read.parquet(dir.resolve(t).toString)
            .filter(col("commit_epoch") <= bound)
          if (rows.isEmpty) None else Some(t -> rows)
        }.toMap
        target.applyReplicated(bound, writes)
      }
    }
    target
  }

  def replay(spark: SparkSession, source: VersionedStore, sourceTables: Seq[String],
      targetDir: String, subsetFilter: Option[org.apache.spark.sql.Column] = None): VersionedStore = {
    val target = new VersionedStore(spark, targetDir)
    val maxEpoch = source.currentEpoch
    (1L to maxEpoch).foreach { e =>
      val writes = sourceTables.flatMap { t =>
        val hist = source.history(t)
        if (hist.columns.isEmpty) None
        else {
          val batch = hist.filter(col("commit_epoch") === e).drop("commit_epoch")
          val filtered = subsetFilter.map(batch.filter).getOrElse(batch)
          if (filtered.isEmpty) None else Some(t -> filtered)
        }
      }.toMap
      if (writes.nonEmpty) target.commit(writes)
    }
    target
  }
}
