package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Clustering-operator contracts: the exposed k-means tier (q131) and
  * per-label embedding outlier detection (q132).
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  test("kmeans (ivfTrain + ivfAssign) separates well-split clusters") {
    // ids interleave the two blobs so the lowest-k init straddles both
    val vecs = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 0.0f else 10.0f
      (i.toLong, Array(base + (i % 5) * 0.1f, base - (i % 3) * 0.1f))
    }.toDF("vec_id", "embedding")
    val cents = Similarity.ivfTrain(vecs, "embedding", "vec_id",
      k = 2, iterations = 2, roundTo = Some(6))
    val assigned = Similarity.ivfAssign(vecs, "embedding", cents)
      .select($"vec_id", $"ivf_cluster").as[(Long, Int)].collect().toMap
    val clusterOfEven = assigned(0L)
    assert((0 until 40).forall(i =>
      assigned(i.toLong) === (if (i % 2 == 0) clusterOfEven else 1 - clusterOfEven)))
  }

  test("roundTo pins every centroid coordinate to the decimal grid") {
    val vecs = (0 until 30).map(i =>
      (i.toLong, Array(i * 0.123456789f, 1.0f / (i + 3)))).toDF("vec_id", "embedding")
    val cents = Similarity.ivfTrain(vecs, "embedding", "vec_id",
      k = 3, iterations = 2, roundTo = Some(6))
    cents.flatten.foreach { c =>
      assert((BigDecimal(c) * BigDecimal(1000000)).isWhole,
        s"centroid coordinate $c not on the 1e-6 grid")
    }
  }

  test("labelOutliers flags the planted far point and only it") {
    val inliers = (0 until 9).map { i =>
      val ang = 2 * math.Pi * i / 9
      (i.toLong, Array(math.cos(ang).toFloat, math.sin(ang).toFloat), 0)
    }
    val planted = Seq((99L, Array(30.0f, 0.0f), 0))
    val otherLabel = (100 until 105).map(i =>
      (i.toLong, Array(5.0f + (i % 3) * 0.01f, 5.0f), 1))
    val df = (inliers ++ planted ++ otherLabel).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelOutliers(df, "embedding", "vec_id", "label")
      .as[(Long, Int, Double, Boolean)].collect()
    val flagged = out.filter(_._4).map(_._1).toSet
    assert(flagged === Set(99L))
    // the planted point's distance dominates its label's distribution
    val byId = out.map(r => r._1 -> r._3).toMap
    assert(inliers.forall { case (id, _, _) => byId(id) < byId(99L) })
    // every row of every label is reported
    assert(out.length === 15)
  }

  test("labelOutliers distances are rounded and non-negative") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelOutliers(df, "embedding", "vec_id", "label")
      .as[(Long, Int, Double, Boolean)].collect()
    // identical vectors: distance to centroid is exactly 0, nothing flagged
    assert(out.forall(r => r._3 === 0.0 && !r._4))
  }

  test("powerIteration: converges to the dominant direction, deterministic, degenerate-safe") {
    // 200 copies of (1, 3): the dominant direction is (1, 3)/√10 —
    // the iterate must land within rescale-precision of slope 3 with
    // the canonical positive sign and unit micro norm
    val vecs = (0 until 200).map(i => (i.toLong, Seq(1.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val v = Similarity.powerIteration(vecs, "vec_id", "embedding", iterations = 3)
    assert(v.head > 0, "sign canonicalization: first nonzero positive")
    val slope = v(1).toDouble / v(0).toDouble
    assert(math.abs(slope - 3.0) < 0.05, s"direction drifted: $v")
    val norm = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(norm - 1e6) < 1e4, s"not unit micro scale: $norm")
    // bit-for-bit deterministic across runs and partitionings
    val v2 = Similarity.powerIteration(vecs.repartition(7), "vec_id", "embedding",
      iterations = 3)
    assert(v === v2)
    // an all-zero corpus degrades to the zero vector, loudly not NaN
    val zeros = (0 until 5).map(i => (i.toLong, Seq(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.powerIteration(zeros, "vec_id", "embedding") === Seq(0L, 0L))
  }

  test("labelCentroidSimilarity: aligned labels score 1, orthogonal score 0") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(3.0f, 0.0f), 0),   // centroid (2e6, 0)
      (2L, Seq(2.0f, 0.0f), 1),                             // centroid (2e6, 0) → cos 1
      (3L, Seq(0.0f, 5.0f), 2)                              // orthogonal → cos 0
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroidSimilarity(vecs, "vec_id", "embedding", "label")
      .orderBy("label_a", "label_b").as[(Int, Int, Double)].collect()
    assert(out === Array((0, 1, 1.0), (0, 2, 0.0), (1, 2, 0.0)))
  }

  test("abttPostprocess: centering + top-component removal annihilates 1-D data") {
    // all variance along dim 0 with a constant offset everywhere:
    // centering removes the offset, the top component IS dim 0, and
    // the correction must annihilate everything (within rounding)
    val vecs = Seq(
      (0L, Seq(2.0f, 1.0f)), (1L, Seq(4.0f, 1.0f)), (2L, Seq(6.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.abttPostprocess(vecs, "vec_id", "embedding")
      .select("corrected").as[Double].collect()
    assert(out.length === 6 && out.forall(c => math.abs(c) < 1.0),
      s"1-D corpus must correct to ~zero (micro-units): ${out.mkString(",")}")
  }

  test("abttPostprocess: corrected corpus is orthogonal to the removed direction") {
    val vecs = Seq(
      (0L, Seq(1.0f, 2.0f, 0.5f)), (1L, Seq(3.0f, 4.0f, -0.5f)),
      (2L, Seq(5.0f, 9.0f, 1.5f)), (3L, Seq(2.0f, 3.0f, -1.5f)))
      .toDF("vec_id", "embedding")
    val corrected = Similarity.abttPostprocess(vecs, "vec_id", "embedding")
      .orderBy("id", "dim").as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    // recompute the direction the operator removed (centered corpus)
    val ex = vecs.selectExpr("vec_id AS __id",
      "posexplode(embedding) AS (dim, xv)")
      .selectExpr("__id", "dim", "CAST(round(CAST(xv AS DOUBLE) * 1e6, 0) AS LONG) AS x")
    val means = ex.groupBy("dim").agg(expr("sum(x) div count(*)").as("m"))
      .orderBy("dim").as[(Long, Long)].collect().map(_._2)
    val centered = ex.withColumn("x",
        col("x") - element_at(array(means.map(lit): _*), col("dim").cast("int") + 1))
    val v = Similarity.powerIterateElements(centered, dims = 3, iterations = 3)
    corrected.foreach { case (id, cs) =>
      val dot = cs.zip(v).map { case (c, vj) => c * vj.toDouble }.sum
      val cn = math.sqrt(cs.map(c => c * c).sum)
      val vn = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      assert(cn == 0.0 || math.abs(dot) / (cn * vn) < 1e-6,
        s"vector $id not orthogonal to removed direction")
    }
  }

  test("rankTransform: tie-stable integer rank positions, singleton contract") {
    // dim 0 values {10, 20, 20, 40}: ranks 1, 2, 2, 4 over n=4 →
    // ppm 0, 333333, 333333, 1000000 (ties share a rank, no
    // tie-break ordering needed)
    val vecs = Seq(
      (0L, Seq(10.0f)), (1L, Seq(20.0f)), (2L, Seq(20.0f)), (3L, Seq(40.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.rankTransform(vecs, "vec_id", "embedding")
      .orderBy("vec_id").select("rank_ppm").as[Long].collect()
    assert(out === Array(0L, 333333L, 333333L, 1000000L))
    // a singleton dimension maps to 0
    val one = Seq((0L, Seq(5.0f))).toDF("vec_id", "embedding")
    assert(Similarity.rankTransform(one, "vec_id", "embedding")
      .select("rank_ppm").as[Long].collect() === Array(0L))
  }

  test("standardizeDims: hand z-scores, zero-variance dim contract") {
    // dim 0: {1, 2, 3} → mean 2e6 micro, std 1e6 → z = −1, 0, 1
    // dim 1: {10, 10, 40} → mean 2e7, std sqrt(3)·1e7 → ∓0.57735 / 1.154701
    // dim 2: constant → std 0 → z = 0 by contract
    val vecs = Seq(
      (0L, Seq(1.0f, 10.0f, 5.0f)),
      (1L, Seq(2.0f, 10.0f, 5.0f)),
      (2L, Seq(3.0f, 40.0f, 5.0f))).toDF("vec_id", "embedding")
    val out = Similarity.standardizeDims(vecs, "vec_id", "embedding")
      .orderBy("vec_id", "dim")
      .as[(Long, Long, Long, Double)].collect()
    assert(out === Array(
      (0L, 0L, 1000000L, -1.0), (0L, 1L, 10000000L, -0.57735), (0L, 2L, 5000000L, 0.0),
      (1L, 0L, 2000000L, 0.0), (1L, 1L, 10000000L, -0.57735), (1L, 2L, 5000000L, 0.0),
      (2L, 0L, 3000000L, 1.0), (2L, 1L, 40000000L, 1.154701), (2L, 2L, 5000000L, 0.0)))
  }
}
