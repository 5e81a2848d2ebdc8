package graft.tools

import java.nio.file.Files

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.model.{GraphSchema, GraphStore}

/** Memory-budget certification of the flagship chains (r13 directive
  * #3): the ONE 100 TB claim a plan audit can't fully prove is that no
  * operator hides a driver-side materialization that only shows up at
  * scale. This tool proves it mechanically: the curation flagships
  * (q192 / q193 / q224) and the maintained-index commit path run at
  * ×FACTOR data under a HARD driver-result clamp —
  * `spark.driver.maxResultSize=64m` — so any plan that ships more
  * than 64 MB of task results to the driver THROWS instead of
  * silently working because the test box had headroom. Run it with a
  * reduced driver heap too (`SPARK_DRIVER_MEM=4g`, build.sbt wires it
  * to -Xmx) so broadcast + buffer headroom is certified at the same
  * time.
  *
  * Alongside the pass/fail clamp, a SparkListener accounts the ACTUAL
  * serialized task-result bytes per job (the same quantity
  * maxResultSize gates) and reports the peak job per phase — the
  * measured upper bound on what each chain ships to the driver at
  * this scale, recorded in BENCHNOTES so the next scale-up divides
  * headroom instead of guessing.
  *
  * Usage: SPARK_DRIVER_MEM=4g sbt "runMain graft.tools.MemCheck
  *   /root/testdata/sf0.1 64"
  */
object MemCheck {

  /** Accumulates serialized task-result bytes per job and tracks the
    * peak job total — exactly the sum `spark.driver.maxResultSize`
    * is enforced against (TaskSetManager.canFetchMoreResults).
    */
  final class DriverResultListener extends SparkListener {
    private val stageToJob = scala.collection.concurrent.TrieMap.empty[Int, Int]
    private val jobBytes = scala.collection.concurrent.TrieMap.empty[Int, Long]
    @volatile var peakJobBytes: Long = 0L
    override def onJobStart(js: SparkListenerJobStart): Unit =
      js.stageIds.foreach(sid => stageToJob.put(sid, js.jobId))
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
      stageToJob.get(te.stageId).foreach { j =>
        val sz = Option(te.taskMetrics).map(_.resultSize).getOrElse(0L)
        val total = jobBytes.updateWith(j) {
          case Some(b) => Some(b + sz)
          case None => Some(sz)
        }.getOrElse(0L)
        if (total > peakJobBytes) peakJobBytes = total
      }
    def reset(): Unit = { jobBytes.clear(); peakJobBytes = 0L }
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 64
    val out = if (args.length > 2) args(2) else s"target/scalecheck/x$factor"
    val clampMb = 64
    val spark = graft.GraftSession.builder(
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
      // the certification clamp: a hidden driver materialization at
      // this scale fails the run instead of riding test-box headroom
      .config("spark.driver.maxResultSize", s"${clampMb}m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new DriverResultListener
    spark.sparkContext.addSparkListener(listener)
    import spark.implicits._

    ScaleCheck.ensureScaled(spark, base, factor, out)

    def timedPeak(body: => Unit): (Double, Long) = {
      // settle the async listener bus so the previous phase's task
      // results don't bleed into this phase's accounting (the public
      // API has no waitUntilEmpty; the bus drains in well under this)
      Thread.sleep(1000)
      listener.reset()
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      (sec, listener.peakJobBytes)
    }

    // --- phase 1: the flagship curation chains at ×factor
    val chains = Seq("q192_curate_mix", "q193_mix_pack", "q224_decontaminated_mix")
    val chainRows = chains.map { name =>
      val fn = graft.SparkEntry.queries(name)
      val (sec, peak) = timedPeak { fn(spark, out).count(); () }
      (name, sec, peak)
    }

    // --- phase 2: the maintained-index commit path at ×factor — the
    // full doc-side index stack (view + signature + posting + range
    // stats + hashed-ngram DSIR stats) bound in-commit, then a commit
    // of half the ×factor corpus measured under the clamp. Commit
    // hooks that secretly collect the corpus (rather than commit-sized
    // deltas and nBuckets-row models) blow the 64 MB gate here.
    val ischema = GraphSchema.builder()
      .vertex("doc", "id", Seq("text", "lang", "n_chars")).build()
    val idir = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "memcheck-idx").toString
    val igs = new GraphStore(spark, ischema, idir)
    val docs = spark.read.parquet(s"$out/documents.parquet")
      .select($"doc_id".as("id"), $"text", $"lang", $"n_chars")
    val nDocs = docs.count()
    igs.txn().createVertices("doc", docs.filter($"id" % 2 === 0)).commit()
    val cat = new graft.views.ViewCatalog(spark, igs, idir)
    cat.register(graft.views.ViewDef("by_lang", "doc",
      df => df.select($"lang".as("key"), $"id", lit(1L).as("value")),
      reduceAgg = Some(sum($"value"))))
    cat.regenerate("by_lang"); cat.bindTo(igs)
    val sig = new graft.operators.SignatureIndex(igs, "doc", "text", idir)
    sig.rebuild(); sig.bind()
    val post = new graft.operators.MaintainedPostingIndex(igs, "doc", "text", idir)
    post.rebuild(); post.bind()
    val stats = new graft.operators.MaintainedStatsIndex(
      igs, "v_doc", "n_chars", 0.0, 4000.0, 16, idir)
    stats.rebuild(); stats.bind()
    val dsir = new graft.operators.MaintainedStatsIndex(
      igs, "v_doc", "text", 0.0, 1.0, 4096, idir, featureHash = true)
    dsir.rebuild(); dsir.bind()
    val (commitSec, commitPeak) = timedPeak {
      igs.txn().createVertices("doc", docs.filter($"id" % 2 === 1)).commit(); ()
    }

    val clampBytes = clampMb.toLong * 1024 * 1024
    val all = chainRows :+ (("indexed_commit", commitSec, commitPeak))
    // completing at all proves <= clamp; the explicit check guards the
    // accounting itself (a peak ABOVE the clamp means enforcement or
    // the listener mis-measured — either invalidates the artifact)
    val pass = all.forall(_._3 <= clampBytes)
    val qs = all.map { case (n, s, p) =>
      f""""$n":{"sec":$s%.1f,"peak_job_result_mb":${p / 1048576.0}%.2f}"""
    }.mkString("{", ",", "}")
    println(
      f"""{"metric":"mem_check","factor":$factor,"base":"$base","n_docs":$nDocs,""" +
        f""""max_result_mb":$clampMb,"driver_xmx":"${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",""" +
        f""""phases":$qs,"pass":$pass}""")
    spark.stop()
  }
}
