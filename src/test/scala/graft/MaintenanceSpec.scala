package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.model.{GenDirs, GraphSchema, GraphStore, Maintenance}
import graft.operators.SignatureIndex
import graft.views.{ViewCatalog, ViewDef}

/** Threshold-driven maintenance daemon: the policy fires exactly when
  * GenDirs layout stats breach the configured bounds, compaction
  * restores them, parity holds, and a broken target never starves the
  * others.
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(Paths.get("target"), prefix).toString

  private def fixture() = {
    val dir = tmp("maint")
    val schema = GraphSchema.builder().vertex("doc", "id", Seq("text", "seg")).build()
    val gs = new GraphStore(spark, schema, dir)
    gs.txn().createVertices("doc",
      (0L until 20L).map(i => (i, s"seed doc $i", (i % 3).toString))
        .toDF("id", "text", "seg")).commit()
    val cat = new ViewCatalog(spark, gs, dir)
    cat.register(ViewDef("len_by_seg", "doc",
      df => df.select(col("seg").as("key"), col("id"),
        length(col("text")).cast("double").as("value")),
      reduceAgg = Some(sum(col("value")))))
    cat.regenerate("len_by_seg")
    cat.bindTo(gs)
    val sig = new SignatureIndex(gs, "doc", "text", dir)
    sig.rebuild(); sig.bind()
    (dir, gs, cat, sig)
  }

  private def commitSome(gs: GraphStore, base: Long, n: Int): Unit =
    (0 until n).foreach { i =>
      gs.txn().createVertices("doc",
        Seq((base + i, s"fresh doc ${base + i} alpha", "9"))
          .toDF("id", "text", "seg")).commit()
    }

  test("runOnce compacts exactly the targets past their thresholds, " +
      "and compaction restores the stats it keyed on") {
    val (dir, gs, cat, sig) = fixture()
    val sigRoot = Paths.get(dir, "sigindex", "doc")
    val m = new Maintenance(
      Maintenance.forViews(cat) :+
        Maintenance.Target("sig:doc", sigRoot, () => sig.rebuild()),
      deltaEpochsHigh = 4, deltaBytesHigh = 1L << 40)
    assert(m.runOnce().isEmpty, "fresh regenerate/rebuild: nothing due")
    commitSome(gs, 100L, 5) // 5 delta epochs on the view AND the sig store
    assert(GenDirs.layoutStats(cat.rootOf("len_by_seg")).deltaEpochs >= 4)
    assert(m.runOnce() == Seq("view:len_by_seg", "sig:doc"),
      "both maintained stores breached the epoch threshold")
    assert(GenDirs.layoutStats(sigRoot).deltaEpochs == 0)
    assert(GenDirs.layoutStats(cat.rootOf("len_by_seg")).deltaEpochs == 0,
      "regenerate clears the delta log the policy keyed on")
    // parity: the compacted view equals a from-scratch recompute
    val got = cat.reducedView("len_by_seg").select("key", "value")
      .orderBy("key").as[(String, Double)].collect().toSeq
    cat.regenerate("len_by_seg")
    val want = cat.reducedView("len_by_seg").select("key", "value")
      .orderBy("key").as[(String, Double)].collect().toSeq
    assert(got == want)
    // the byte threshold drives the flat-file sig deltas
    val tight = new Maintenance(
      Seq(Maintenance.Target("sig:doc", sigRoot, () => sig.rebuild())),
      deltaEpochsHigh = 1000000, deltaBytesHigh = 1)
    commitSome(gs, 200L, 1)
    assert(GenDirs.layoutStats(sigRoot).deltaBytes > 0)
    assert(tight.runOnce() == Seq("sig:doc"))
    assert(GenDirs.layoutStats(sigRoot).deltaBytes == 0,
      "rebuild folds the deltas into a fresh base generation")
  }

  test("daemon mode: breaches compact within a few periods; a throwing " +
      "target is recorded and never starves the healthy ones; stop joins") {
    val (_, gs, cat, _) = fixture()
    val m = new Maintenance(
      Maintenance.Target("boom", cat.rootOf("len_by_seg"),
        () => throw new RuntimeException("wired to fail")) +:
        Maintenance.forViews(cat),
      deltaEpochsHigh = 3, deltaBytesHigh = 1L << 40, periodMs = 50L)
    m.start()
    intercept[IllegalArgumentException](m.start()) // double start refuses
    try {
      commitSome(gs, 300L, 4)
      // a commit can land between the breach and the regenerate, so the
      // daemon's steady state is BELOW THRESHOLD, not necessarily zero
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (GenDirs.layoutStats(cat.rootOf("len_by_seg")).deltaEpochs >= 3 &&
          System.nanoTime() < deadline) Thread.sleep(50)
      assert(GenDirs.layoutStats(cat.rootOf("len_by_seg")).deltaEpochs < 3,
        "daemon must have regenerated the breached view")
    } finally m.stop()
    // the failing target surfaced without killing the loop (the boom
    // root IS the view root, breached alongside — it threw every pass)
    val errs = m.lastErrors()
    assert(errs.nonEmpty && errs.forall(_._1 == "boom"))
    // after stop, nothing runs: new deltas stay put
    commitSome(gs, 400L, 4)
    Thread.sleep(200)
    assert(GenDirs.layoutStats(cat.rootOf("len_by_seg")).deltaEpochs >= 3,
      "a stopped daemon must not compact")
  }
}
