package graft

import org.apache.spark.sql.functions._

import graft.operators.Drift

/** Store-side contracts for the drift tier (q203/q204's DuckDB hash
  * check runs in Verify; here CI pins what SQL cannot see): the
  * binning clamp and empty-bin materialization, the zero-drift and
  * disjoint-population fixpoints, and the MVCC composition — drift
  * between two AS-OF epochs of a live store, the "did this commit
  * shift the corpus?" monitor.
  */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("numericBinned: every bin materializes (empty ones included), " +
      "counts partition the populations, max value clamps into the last bin") {
    val a = Seq(0L, 1L, 2L, 100L).toDF("v") // 100 = global max
    val b = Seq(0L, 50L).toDF("v")
    val bins = Drift.numericBinned(a, b, "v", nBins = 10)
      .orderBy("bin").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(bins.map(_._1).toSeq == (0L until 10L)) // all bins, incl. empty
    assert(bins.map(_._2).sum == 4 && bins.map(_._3).sum == 2)
    // v=100: (100-0)*10/100 = 10 -> clamped to bin 9, not dropped
    assert(bins(9)._2 == 1)
    // middle bins with no mass are (bin, 0, 0) rows, not absent
    assert(bins(3) == ((3L, 0L, 0L)))
  }

  test("numericBinned: degenerate hi == lo puts everything in bin 0") {
    val a = Seq(7L, 7L, 7L).toDF("v")
    val b = Seq(7L).toDF("v")
    val bins = Drift.numericBinned(a, b, "v", nBins = 4)
      .orderBy("bin").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(bins(0) == ((3L, 1L)))
    assert(bins.drop(1).forall(_ == ((0L, 0L))))
  }

  test("identical populations drift exactly zero on all three metrics") {
    val pop = Seq(1L, 2L, 3L, 4L, 5L, 5L, 9L).toDF("v")
    val r = Drift.numericDrift(pop, pop, "v", nBins = 8).head
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((0L, 0L, 0L)))
    val cpop = Seq("en", "de", "en").toDF("k")
    val c = Drift.categoricalDrift(cpop, cpop, "k")
    assert(c.agg(max("dp_ppm")).head.getLong(0) == 0L)
  }

  test("disjoint categorical populations: dp_ppm is each side's full mass") {
    val a = Seq("en", "en", "de").toDF("k")
    val b = Seq("zh").toDF("k")
    val rows = Drift.categoricalDrift(a, b, "k").orderBy("key")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(rows.toSeq == Seq(
      ("de", 1L, 0L, 333333L), ("en", 2L, 0L, 666666L), ("zh", 0L, 1L, 1000000L)))
  }

  test("larger shift => larger PSI, and PSI is symmetric in ppm") {
    val base = (1 to 100).map(_.toLong % 50).toDF("v")
    val mild = (1 to 100).map(i => (i.toLong % 50) + 5).toDF("v")
    val wild = (1 to 100).map(i => (i.toLong % 50) + 40).toDF("v")
    val psiMild = Drift.numericDrift(base, mild, "v", 10).head.getLong(2)
    val psiWild = Drift.numericDrift(base, wild, "v", 10).head.getLong(2)
    assert(psiMild > 0L && psiWild > psiMild)
    // PSI's term (pa-pb)ln(pa/pb) is symmetric under swap
    assert(Drift.numericDrift(mild, base, "v", 10).head.getLong(2) == psiMild)
  }

  test("groupedNumericDrift: every stratum row equals numericDrift run " +
      "on that stratum alone (per-group edges, per-group smoothing), " +
      "including a group present in only one population") {
    val a = Seq(("en", 10L), ("en", 20L), ("en", 90L), ("de", 5L), ("de", 7L),
      ("zh", 50L)).toDF("lang", "len")
    val b = Seq(("en", 15L), ("en", 85L), ("de", 900L)).toDF("lang", "len")
    // zh exists only in population A — smoothing must keep it finite
    val grouped = Drift.groupedNumericDrift(a, b, "lang", "len", nBins = 6)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(grouped.keySet == Set("en", "de", "zh"))
    for (g <- Seq("en", "de", "zh")) {
      val one = Drift.numericDrift(
        a.filter($"lang" === g), b.filter($"lang" === g), "len", nBins = 6).head
      assert(grouped(g) == ((one.getLong(0), one.getLong(1), one.getLong(2),
        one.getLong(3), one.getLong(4))),
        s"stratum $g diverges from its single-group run")
    }
  }

  test("empty population: categorical ppm columns guard to 0, never NULL, " +
      "and numericDrift keeps its one-row contract (r12 advice: div-by-zero)") {
    val a = Seq("en", "en", "de").toDF("k")
    val none = spark.emptyDataFrame.select(lit("x").as("k")).filter(lit(false))
    val rows = Drift.categoricalDrift(a, none, "k").orderBy("key").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(!r.isNullAt(3) && !r.isNullAt(4) && !r.isNullAt(5), s"NULL ppm in $r")
      assert(r.getLong(4) == 0L) // empty side reads 0 ppm everywhere
    }
    val av = Seq(1L, 2L, 3L).toDF("v")
    val bn = av.filter(lit(false))
    val d = Drift.numericDrift(av, bn, "v", nBins = 4).collect()
    assert(d.length == 1 && d.head.getLong(0) == 3L && d.head.getLong(1) == 0L)
    // both sides empty: still one summary row of zeros, not zero rows
    val dd = Drift.numericDrift(bn.withColumnRenamed("v", "v"), bn, "v", 4).collect()
    assert(dd.length == 1 && dd.head.getLong(0) == 0L && dd.head.getLong(1) == 0L)
  }

  test("single-group path is BNLJ/cartesian-free (the plan-gate allowlist " +
      "no longer carries drift entries — r12 next-round #3)") {
    val a = (1 to 50).map(_.toLong).toDF("v")
    val b = (20 to 90).map(_.toLong).toDF("v")
    for (df <- Seq(Drift.numericDrift(a, b, "v", 8),
        Drift.categoricalDrift(a.withColumn("k", $"v" % 3), b.withColumn("k", $"v" % 3), "k"))) {
      df.collect()
      val s = df.queryExecution.executedPlan.toString
      assert(!s.contains("BroadcastNestedLoopJoin"), s"BNLJ in drift plan:\n$s")
      assert(!s.contains("CartesianProduct"), s"cartesian in drift plan:\n$s")
    }
  }

  test("MVCC composition: drift between two as-of epochs of a live store " +
      "flags the commit that shifted the corpus; self-drift stays zero") {
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "driftstore").toString
    val schema = graft.model.GraphSchema.builder()
      .vertex("doc", "id", Seq("len")).build()
    val gs = new graft.model.GraphStore(spark, schema, dir)
    // epoch 1: lengths uniform in [100, 199]
    gs.txn().createVertices("doc",
      (1 to 200).map(i => (i.toLong, (100 + i % 100).toLong)).toDF("id", "len"))
      .commit()
    // epoch 2: a shifted batch lands (lengths in [400, 499])
    gs.txn().createVertices("doc",
      (201 to 300).map(i => (i.toLong, (400 + i % 100).toLong)).toDF("id", "len"))
      .commit()
    def snap(e: Long) = gs.graph(asOf = Some(e)).vertexFrame("doc")
    val drift = Drift.numericDrift(snap(1L), snap(2L), "len", nBins = 12).head
    assert(drift.getLong(0) == 200L && drift.getLong(1) == 300L)
    assert(drift.getLong(2) > 250000L, // way past the 0.25 "shifted" gate
      s"epoch shift must be flagged, psi_ppm=${drift.getLong(2)}")
    val self = Drift.numericDrift(snap(1L), snap(1L), "len", nBins = 12).head
    assert((self.getLong(2), self.getLong(3), self.getLong(4)) == ((0L, 0L, 0L)))
  }
}
