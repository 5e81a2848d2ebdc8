package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.model.{GraphSchema, GraphStore}

/** Pins the micro-commit path's SPARK JOB budget: per-commit latency on
  * the transactional path is dominated by the number of scheduled jobs
  * (each pays the full job floor — guide §1.2), so a regression that
  * re-introduces a per-commit action (the r15 eager-checkpoint count,
  * the r15 second validation pass, the r16 index-delta re-write, a new
  * per-slice probe) must fail HERE, not resurface as a q196 bench
  * mystery. Ceiling harvested from the r17 path: lazy checkpoint
  * materialized BY the single fused validation collect, epoch-dir
  * write, hard-linked index delta, all under the non-adaptive commit
  * session — 9 jobs for a tiny indexed single-table commit (the r16
  * path measured 13). Ceiling 11 leaves slack for footer-merge job
  * jitter, not for a new action.
  */
class CommitJobsSpec extends SparkSpec {

  private def settled(c: AtomicInteger): Int = {
    var prev = -1; var cur = c.get(); var spins = 0
    while (cur != prev && spins < 60) { Thread.sleep(100); prev = cur; cur = c.get(); spins += 1 }
    cur
  }

  test("a tiny indexed single-table commit schedules at most 11 Spark jobs") {
    import spark.implicits._
    val jobs = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    val schema = GraphSchema.builder().vertex("node", "id", Seq("val", "label")).build()
    val dir = Files.createTempDirectory(Paths.get("target"), "commitjobs").toString
    val gs = new GraphStore(spark, schema, dir)
    gs.txn().createVertices("node",
      spark.range(64).select($"id", lit("w").as("val"), lit("node").as("label"))).commit()
    gs.store.compactCurrent("v_node") // opt into the current-state index
    // warm-up commit (plan/codegen first-touch), then measure two
    gs.txn().createVertices("node",
      Seq((1000L, "x", "node")).toDF("id", "val", "label")).commit()
    spark.sparkContext.addSparkListener(listener)
    try {
      val counts = (1 to 2).map { i =>
        settled(jobs); val j0 = jobs.get()
        gs.txn().createVertices("node",
          Seq((2000L + i, "x", "node")).toDF("id", "val", "label")).commit()
        settled(jobs) - j0
      }
      assert(counts.forall(_ <= 11),
        s"tiny commit scheduled ${counts.mkString("/")} jobs (ceiling 11) — " +
          "the commit path gained an action; see VersionedStore.commitCaptures")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("the index delta epoch dir is fed by hard links, not a second write") {
    import spark.implicits._
    val schema = GraphSchema.builder().vertex("node", "id", Seq("val", "label")).build()
    val dir = Files.createTempDirectory(Paths.get("target"), "commitlink").toString
    val gs = new GraphStore(spark, schema, dir)
    gs.txn().createVertices("node",
      spark.range(8).select($"id", lit("w").as("val"), lit("node").as("label"))).commit()
    gs.store.compactCurrent("v_node")
    gs.txn().createVertices("node",
      Seq((100L, "x", "node")).toDF("id", "val", "label")).commit()
    val epoch = gs.store.currentEpoch
    val tableDir = Paths.get(s"$dir/v_node/commit_epoch=$epoch")
    val bases = Paths.get(s"$dir/v_node__cur/bases")
    val gen = graft.model.GenDirs.current(bases)
    val deltaDir = gen.resolve(s"delta/commit_epoch=$epoch")
    assert(Files.isDirectory(deltaDir), s"no delta dir at $deltaDir")
    val tableFiles = Files.list(tableDir).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).map(p => Paths.get(p).getFileName.toString).sorted
    val deltaFiles = Files.list(deltaDir).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).map(p => Paths.get(p).getFileName.toString).sorted
    assert(tableFiles.nonEmpty && deltaFiles.sameElements(tableFiles),
      s"delta files ${deltaFiles.toSeq} != table files ${tableFiles.toSeq}")
    // same inode (hard link), where the filesystem exposes it
    val a = Files.getAttribute(tableDir.resolve(tableFiles.head), "unix:ino")
    val b = Files.getAttribute(deltaDir.resolve(tableFiles.head), "unix:ino")
    assert(a == b, "delta file is a copy, not a hard link")
  }
}
