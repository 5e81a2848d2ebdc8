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
    * (the snapshot job; include-deleted-p = false semantics).
    */
  def backup(graph: PropertyGraph, dir: String): Unit = {
    graph.vertexLabels.foreach { l =>
      graph.vertexFrame(l).write.mode("overwrite").parquet(s"$dir/vertices/$l")
    }
    graph.edgeLabels.foreach { l =>
      graph.edgeFrame(l).write.mode("overwrite").parquet(s"$dir/edges/$l")
    }
  }

  /** Rebuild a PropertyGraph from a logical dump. */
  def restore(spark: SparkSession, schema: GraphSchema, dir: String): PropertyGraph = {
    def load(kind: String): Map[String, DataFrame] = {
      val base = Paths.get(dir, kind)
      if (!Files.exists(base)) Map.empty
      else Files.list(base).toArray.map(_.toString).map { p =>
        Paths.get(p).getFileName.toString -> spark.read.parquet(p)
      }.toMap
    }
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
    * (transactions.lisp:884-1003).
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
