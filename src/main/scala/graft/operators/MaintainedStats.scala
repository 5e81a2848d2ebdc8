package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.{Dirs, GraphStore}

/** Commit-maintained corpus STATISTICS: a fixed-edge histogram of a
  * numeric column over the live rows of a store label, refreshed
  * inside every commit's call stack — the maintained-index discipline
  * (reference transactions.lisp:601-744: indexes update in the apply
  * phase) applied to aggregate state instead of row lookup. With it,
  * the "did this commit shift the corpus?" monitor (q205's drift) is
  * answered from O(nBins × epochs-since-compaction) rows instead of a
  * corpus rescan — at 100 TB the difference between a dashboard tick
  * and a full scan.
  *
  * Semantics and scale notes:
  *  - Edges are PINNED at construction ([lo, hi], nBins), the q207
  *    online-monitor philosophy: a maintained monitor cannot re-derive
  *    data-dependent edges on every commit without rescanning, so
  *    out-of-range values clamp into the edge bins ([[Drift.binExpr]]).
  *  - Each commit appends one signed delta file: +1 rows for staged
  *    live revisions, −1 rows for the superseded PRE-commit values of
  *    the touched ids (read via an asOf(epoch−1) snapshot joined to
  *    the staged ids — epoch-partition-pruned, id-pruned; cost scales
  *    with the COMMIT, never the corpus). `vacuum(keep=1)` is safe
  *    concurrently: the hook only ever reads pre-commit LIVE values,
  *    which retention preserves.
  *  - Reads sum base + deltas — at most nBins×(2×epochs) tiny rows —
  *    and [[rebuild]] folds deltas back into the base (a natural
  *    Maintenance-daemon target, like every other maintained tier).
  *  - Bound-before-built commits are skipped; the eventual [[rebuild]]
  *    reads committed state, so nothing is lost (the MaintainedIvfStore
  *    contract).
  */
final class MaintainedStatsIndex(gs: GraphStore, label: String, valueCol: String,
    lo: Double, hi: Double, nBins: Int, dir: String) {

  private val root = Paths.get(dir, s"stats_${label}_$valueCol")
  private val basePath = root.resolve("base")

  /** The layout root for Maintenance.Target / GenDirs.layoutStats. */
  def statsRoot: java.nio.file.Path = root
  private val deltaPath = root.resolve("delta")
  private def baseTmp = root.resolve("__base_tmp")
  private val spark = gs.spark

  private def binOf(v: Column): Column =
    Drift.binExpr(v.cast("double"), lit(lo), lit(hi), nBins)

  private def fullBins(counts: DataFrame): DataFrame =
    spark.range(nBins).select(col("id").as("bin"))
      .join(counts, Seq("bin"), "left").na.fill(0L, Seq("c"))

  /** Recompute the base histogram from the store's current live rows
    * and retire every delta — compaction AND first build share this.
    */
  def rebuild(): Unit = synchronized {
    val counts =
      if (!gs.store.tableExists(label)) spark.range(0).select(col("id").as("bin"), col("id").as("c"))
      else gs.store.read(label)
        .groupBy(binOf(col(valueCol)).as("bin")).agg(count(lit(1)).as("c"))
    Dirs.rmTree(baseTmp)
    fullBins(counts).coalesce(1).write.parquet(baseTmp.toString)
    Dirs.rmTree(basePath)
    Files.move(baseTmp, basePath, StandardCopyOption.ATOMIC_MOVE)
    Dirs.rmTree(deltaPath)
  }

  /** Apply one commit's staged revisions as a signed histogram delta —
    * shared by [[bind]] and replica-side application.
    */
  def applyCommit(epoch: Long, staged: DataFrame): Unit = synchronized {
    if (!Files.exists(basePath)) return // bound before built: rebuild() catches up
    val adds = staged.filter(!col("deleted"))
      .select(binOf(col(valueCol)).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("c"))
    val superseded = gs.store.read(label, asOf = Some(epoch - 1))
      .join(staged.select("id").distinct(), Seq("id"), "left_semi")
      .select(binOf(col(valueCol)).as("bin"))
      .groupBy("bin").agg((-count(lit(1))).as("c"))
    // commit_epoch=N partition dirs: the read below discovers them
    // without a path glob (a glob read trips Spark's streaming-sink
    // metadata probe into logging spurious AnalysisException traces),
    // and the base/ + delta/commit_epoch=N shape is exactly what
    // GenDirs.layoutStats reads — so the index plugs into the
    // Maintenance daemon and /admin/stats telemetry as-is (root =
    // statsRoot, compact = rebuild)
    adds.unionByName(superseded).groupBy("bin").agg(sum("c").as("c"))
      .filter(col("c") =!= 0L)
      .coalesce(1).write.mode("overwrite")
      .parquet(deltaPath.resolve(s"commit_epoch=$epoch").toString)
  }

  /** Wire into the store's write path. */
  def bind(): Unit = gs.onCommit { (epoch, frames) =>
    frames.get(label).foreach(applyCommit(epoch, _))
  }

  /** The live histogram — every bin materialized, base + deltas summed.
    * At most nBins × (1 + 2·epochs-since-rebuild) input rows.
    */
  def histogram(): DataFrame = synchronized {
    require(Files.exists(basePath), s"stats index for $label.$valueCol not built — call rebuild()")
    val base = spark.read.parquet(basePath.toString)
    val all =
      if (!Files.exists(deltaPath)) base
      else base.unionByName(
        spark.read.parquet(deltaPath.toString).select("bin", "c"))
    fullBins(all.groupBy("bin").agg(sum("c").as("c")))
  }

  /** Persist the current histogram as a named reference snapshot (the
    * drift monitor's "pin the reference at monitor start" step) and
    * return its path.
    */
  def snapshot(name: String): String = synchronized {
    val p = root.resolve(s"ref_$name")
    Dirs.rmTree(p)
    histogram().coalesce(1).write.parquet(p.toString)
    p.toString
  }

  def hasSnapshot(name: String): Boolean =
    Files.exists(root.resolve(s"ref_$name"))

  /** Drift summary ([[Drift.summarize]]: psi/js/tvd ppm) of the CURRENT
    * corpus against a pinned reference snapshot — O(nBins) input rows,
    * no corpus scan.
    */
  def driftVsSnapshot(name: String): DataFrame = {
    val ref = spark.read.parquet(root.resolve(s"ref_$name").toString)
      .withColumnRenamed("c", "c_a")
    val cur = histogram().withColumnRenamed("c", "c_b")
    Drift.summarize(ref.join(cur, Seq("bin")), nBins)
  }
}
