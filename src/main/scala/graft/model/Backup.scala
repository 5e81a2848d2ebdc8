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
