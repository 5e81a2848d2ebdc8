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
}
