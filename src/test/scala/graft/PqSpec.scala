package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Product-quantization tier (q109): codebook training, encoding, ADC
  * scan, rescored top-k. The sf-level gate is q109's recall audit; the
  * exactness contract is pinned here on a LOSSLESS grid fixture — every
  * subvector is one of ksub distinct patterns and the ksub lowest-id
  * vectors enumerate them, so k-means-lite's init IS the stationary
  * optimum, encoding reconstructs exactly, and ADC distance equals the
  * true squared distance.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // 4 base patterns per 2-d subspace; ids 0-3 repeat one pattern across
  // all 4 subspaces (so init sees each pattern once), ids 4+ mix them
  private val patterns = Seq(Seq(0f, 0f), Seq(10f, 0f), Seq(0f, 10f), Seq(10f, 10f))
  private def vecOf(codes: Seq[Int]): Seq[Float] = codes.flatMap(patterns)

  private lazy val grid = {
    val base = (0 until 4).map(i => (i.toLong, vecOf(Seq(i, i, i, i))))
    val mixed = Seq(
      (4L, vecOf(Seq(0, 1, 2, 3))), (5L, vecOf(Seq(3, 2, 1, 0))),
      (6L, vecOf(Seq(1, 1, 0, 2))), (7L, vecOf(Seq(2, 0, 3, 1))))
    (base ++ mixed).toDF("id", "v")
  }

  test("lossless grid: codes hit the exact patterns, ADC equals true distance") {
    val cbs = Similarity.pqTrain(grid, "v", "id", m = 4, ksub = 4, iterations = 2)
    assert(cbs.size == 4 && cbs.forall(_.size == 4))
    // every learned centroid is one of the exact patterns
    cbs.foreach { cb =>
      cb.foreach { c =>
        assert(patterns.exists(p => p.map(_.toDouble) == c), s"non-grid centroid $c")
      }
    }
    val codes = Similarity.pqEncode(grid, "id", "v", cbs)
    val got = codes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got.values.forall(cs => cs.size == 4 && cs.forall(c => c >= 0 && c < 4)))
    // reconstruction through the codebooks is bit-exact
    got.foreach { case (id, cs) =>
      val rec = cs.zipWithIndex.flatMap { case (c, s) => cbs(s)(c) }
      val orig = grid.filter(col("id") === id).select("v").head()
        .getSeq[Float](0).map(_.toDouble)
      assert(rec == orig, s"lossy reconstruction for id $id")
    }
    // ADC distance == true squared distance for an arbitrary query
    val q = Seq(1.0, 2.0, 9.0, -1.0, 0.5, 0.5, 7.0, 7.0)
    val adc = Similarity.adcScan(codes, cbs, q)
      .select("id", "adc_dist").as[(Long, Double)].collect().toMap
    grid.collect().foreach { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Float](1).map(_.toDouble)
      val trueD = v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(math.abs(adc(id) - trueD) < 1e-9, s"ADC drift for id $id")
    }
  }

  test("pqTopK equals the exact top-k on the lossless fixture") {
    val cbs = Similarity.pqTrain(grid, "v", "id", m = 4, ksub = 4, iterations = 2)
    val codes = Similarity.pqEncode(grid, "id", "v", cbs)
    val q = Seq(9.0, 1.0, 1.0, 9.0, 8.0, 8.0, 2.0, 0.0)
    val pq = Similarity.pqTopK(grid, "v", "id", codes, cbs, q, k = 3,
      candidates = 8)
      .as[(Long, Double)].collect().toSeq
    val exact = Similarity.bruteForceTopK(grid, "v", "id", q, 3)
      .as[(Long, Double)].collect().toSeq
    assert(pq == exact)
  }

  test("IVF-PQ store: codes read is cluster-pruned, recall holds, store roundtrips") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 7).select("embedding").head()
      .getSeq[Float](0).map(_.toDouble).toSeq
    val probe = Similarity.ivfPqTopK(emb, "embedding", "vec_id", sf,
      q, kTop = 10, k = 16, m = 8, nProbe = 8, candidates = 100)
    // the codes scan must list ONLY the probed cells' directories (the
    // raw rescore table is unpartitioned, so assert on the codes scan's
    // own filter, not plan-wide)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [ivf_cluster"),
      s"IVF-PQ codes read must be cluster-pruned:\n$plan")
    // recall@10 vs exact above the q112 floor (self-match included)
    val got = probe.select("id").collect().map(_.getLong(0)).toSet
    val exact = Similarity.bruteForceTopK(emb, "embedding", "vec_id", q, 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got.size == 10 && (got & exact).size >= 6,
      s"recall too low: ${(got & exact).size}/10")
    // the persisted quantizers roundtrip exactly (Double.toString)
    val (_, cs, cbs) = Similarity.ensureIvfPqStore(emb, "embedding", "vec_id",
      sf, k = 16, m = 8)
    assert(cs.size == 16 && cbs.size == 8 && cbs.forall(_.size == 16))
  }

  test("filtered IVF-PQ store: cell-pruned AND attribute-pushed in one scan, " +
      "filtered recall holds") {
    // FULL table, the shared-store convention (same contents no matter
    // which surface builds the store first)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0).select("embedding").head()
      .getSeq[Float](0).map(_.toDouble).toSeq
    val probe = Similarity.ivfPqTopKFiltered(emb, "embedding", "vec_id", sf,
      q, kTop = 10, k = 16, m = 8, predicate = col("label") === 3,
      metaCols = Seq("label"), candidates = 100)
    val plan = probe.queryExecution.executedPlan.toString
    // ONE scan carries both prunings: the cell dirs via PartitionFilters
    // and the attribute predicate pushed into the parquet row groups —
    // never a candidate join back to the base table for the attribute
    assert(plan.contains("PartitionFilters: [ivf_cluster"),
      s"filtered IVF-PQ codes read must be cluster-pruned:\n$plan")
    assert(plan.contains("PushedFilters: [") && plan.contains("label"),
      s"attribute predicate must push into the codes scan:\n$plan")
    // every result satisfies the predicate, and recall@10 vs the exact
    // top-10 OVER THE FILTERED SET clears the q125 floor
    val got = probe.select("id").collect().map(_.getLong(0)).toSet
    val eligible = emb.filter(col("label") === 3)
    val exact = Similarity.bruteForceTopK(eligible, "embedding", "vec_id", q, 10)
      .select("id").collect().map(_.getLong(0)).toSet
    val eligibleIds = eligible.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(got.subsetOf(eligibleIds), "a filtered probe returned an off-label id")
    assert((got & exact).size >= 6, s"filtered recall too low: ${(got & exact).size}/10")
  }

  test("filtered IVF-PQ: the DERIVED probe width clears the recall floor across " +
      "selectivity ~1, ~0.1, ~0.01") {
    // the adaptive default must hold the q125/q190 recall floor with
    // no hand-tuned widening constant, at three selectivity regimes:
    // all-pass (the filter is free), one label (~10x thinning — the
    // q190 shape), and label ∧ id-bucket (~100x — nearly every
    // eligible row must be in view to fill kTop)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0).select("embedding").head()
      .getSeq[Float](0).map(_.toDouble).toSeq
    // per regime: the probe predicate over STORE columns (id) and the
    // same predicate over SOURCE columns (vec_id) for the ground truth
    val regimes = Seq(
      ("~1", col("label") >= 0, col("label") >= 0),
      ("~0.1", col("label") === 3, col("label") === 3),
      ("~0.01", col("label") === 3 && pmod(col("id"), lit(100)) < 10,
        col("label") === 3 && pmod(col("vec_id"), lit(100)) < 10))
    regimes.foreach { case (tag, probePred, storePred) =>
      val got = Similarity.ivfPqTopKFiltered(emb, "embedding", "vec_id", sf,
          q, kTop = 10, k = 16, m = 8, predicate = probePred,
          metaCols = Seq("label"), candidates = 100)
        .select("id").collect().map(_.getLong(0)).toSet
      val eligible = emb.filter(storePred)
      val kWant = math.min(10L, eligible.count()).toInt
      val exact = Similarity.bruteForceTopK(eligible, "embedding", "vec_id", q, 10)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got.size == kWant,
        s"[$tag] expected $kWant results, got ${got.size}")
      val floor = math.max(1, (kWant * 6) / 10)
      assert((got & exact).size >= floor,
        s"[$tag] derived-width recall too low: ${(got & exact).size}/$kWant")
    }
  }
}
