package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** SQ8 embedding quantization contracts: code range, round-trip
  * fidelity, and search-quality preservation on the real corpus.
  */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("codes bounded, absmax element saturates, zero vector safe") {
    val q = Similarity.quantizeInt8(emb, "vec_id", "embedding")
    val absPeak = array_max(transform(col("codes"), c => abs(c.cast("int"))))
    val stats = q.select(max(absPeak).as("peak"), min(absPeak).as("low"))
      .as[(Int, Int)].head()
    assert(stats._1 == 127 && stats._2 == 127) // every vector's absmax element hits ±127
    val zero = Seq((1L, Array.fill(8)(0.0f))).toDF("vec_id", "embedding")
    val zq = Similarity.quantizeInt8(zero, "vec_id", "embedding")
      .select(col("scale"), array_max(col("codes"))).as[(Double, Byte)].head()
    assert(zq == ((0.0, 0: Byte)))
  }

  test("round-trip cosine error is small") {
    val q = Similarity.quantizeInt8(emb, "vec_id", "embedding")
    val joined = emb.join(q, emb("vec_id") === q("id"))
      .select(Similarity.cosine(col("embedding"),
        Similarity.dequantizeInt8(col("scale"), col("codes"))).as("fidelity"))
    val worst = joined.agg(min("fidelity")).as[Double].head()
    assert(worst > 0.999, s"worst reconstruction cosine $worst")
  }

  test("top-k over dequantized codes matches exact top-k") {
    val query = emb.filter(col("vec_id") === 0).select("embedding").head()
      .getSeq[Float](0).map(_.toDouble)
    val exact = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") =!= 0), "embedding", "vec_id", query, 10)
      .select("id").as[Long].collect().toSet
    val deq = Similarity.quantizeInt8(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding")
      .select(col("id").as("vec_id"),
        Similarity.dequantizeInt8(col("scale"), col("codes")).as("embedding"))
    val approx = Similarity.bruteForceTopK(deq, "embedding", "vec_id", query, 10)
      .select("id").as[Long].collect().toSet
    // SQ8 keeps ~1e-3 cosine fidelity: allow at most one boundary swap
    assert((exact intersect approx).size >= 9, s"quantized recall too low: $exact vs $approx")
  }

  test("binarySketch lane layout matches packSigns on hand fixtures") {
    val vecs = Seq(
      Array.fill(64)(1.0f),                       // all ones -> both lanes full
      Array.fill(64)(-1.0f),                      // all negative -> zeros
      Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f), // alternating
      Array.tabulate(40)(i => if (i < 3) 1.0f else 0.0f))       // ragged dim 40
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val got = df.select(col("vec_id"),
        Similarity.binarySketch(col("embedding")).as("s"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1).map(_._2)
    val want = vecs.map(v => Similarity.packSigns(v.map(_.toDouble).toSeq))
    assert(got.toSeq.map(_.toSeq) == want.map(_.toSeq),
      s"sketches drifted: ${got.toSeq} vs $want")
    // zeros do NOT set bits (sign test is > 0)
    assert(want(3).head == (1L << 31 | 1L << 30 | 1L << 29))
  }

  test("hammingDistance equals the sign-mismatch count on the corpus") {
    val query = emb.filter(col("vec_id") === 0).select("embedding").head()
      .getSeq[Float](0).map(_.toDouble)
    val naive = aggregate(
      zip_with(col("embedding"), Similarity.vecLit(query),
        (a, b) => when((a > 0) =!= (b > 0), 1L).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
    val drift = emb.select(
        (Similarity.hammingDistance(Similarity.binarySketch(col("embedding")),
          Similarity.packSigns(query)) =!= naive).as("bad"))
      .filter(col("bad")).count()
    assert(drift == 0, s"$drift rows disagree with the naive mismatch count")
  }

  test("hammingTopK: deterministic candidates, exact rescore, self-match first") {
    val query = emb.filter(col("vec_id") === 0).select("embedding").head()
      .getSeq[Float](0).map(_.toDouble)
    val top = Similarity.hammingTopK(emb, "embedding", "vec_id", query,
      k = 10, candidates = 64).collect()
    assert(top.length == 10)
    val first = top.head
    assert(first.getAs[Long]("id") == 0L && first.getAs[Long]("hamming") == 0L
      && first.getAs[Double]("cos_sim") == 1.0)
    // rescored ranking is (cos desc, id asc)
    val order = top.map(r => (-r.getAs[Double]("cos_sim"), r.getAs[Long]("id"))).toSeq
    assert(order == order.sorted, s"rescore order broken: ${order.toSeq}")
  }
}
