package graft.tools

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.model.{GraphSchema, GraphStore}

/** Profiles the micro-commit path: Spark JOBS and wall-clock per tiny
  * commit (the per-commit latency floor is a count of scheduled jobs —
  * guide §1.2). Prints per-commit job counts for a store with and
  * without the current-state index bound.
  * Usage: runMain graft.tools.CommitProf
  */
object CommitProf {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._
    val jobs = new AtomicInteger(0)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("callSite.short")).getOrElse("?")))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(starts.get(j.jobId)).foreach { case (t0, site) =>
          println(f"[job] ${j.jobId}%5d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $site")
        }
      }
    })
    def drain(): Unit = { Thread.sleep(300) } // let listener events land
    val schema = GraphSchema.builder()
      .vertex("node", "id", Seq("val", "label"))
      .build()
    val dir = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "commitprof").toString
    val gs = new GraphStore(spark, schema, dir)
    gs.txn().createVertices("node",
      spark.range(100).select($"id", lit("w").as("val"), lit("node").as("label"))).commit()
    gs.store.compactCurrent("v_node") // opt into the current-state index
    (0 until 6).foreach { i =>
      val df = Seq((1000L + i, "x", "node")).toDF("id", "val", "label")
      drain(); val j0 = jobs.get(); val t0 = System.nanoTime()
      gs.txn().createVertices("node", df).commit()
      val dt = (System.nanoTime() - t0) / 1e9
      drain(); val j1 = jobs.get()
      println(f"[commitprof] tiny commit $i: ${j1 - j0}%d jobs, $dt%.3f s")
    }
    spark.stop()
  }
}
