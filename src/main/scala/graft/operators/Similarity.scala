package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Brute-force cosine top-k is the correctness baseline (a single
  * narrow map + a TakeOrdered — no shuffle of the vectors themselves).
  * The scale path is random-hyperplane LSH: vectors are bucketed by a
  * short signature of sign-bits, so queries only scan their own bucket
  * (and optionally neighboring probes). All arithmetic is done with
  * higher-order column functions (`zip_with`/`aggregate`), which
  * codegen; no UDFs.
  */
object Similarity {

  /** dot(a, b) in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val denom = l2norm(a) * l2norm(b)
    when(denom === 0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Literal column from a query vector. */
  def vecLit(v: Seq[Double]): Column = array(v.map(lit): _*)

  /** Brute-force cosine top-k against a fixed query vector. */
  def bruteForceTopK(df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Double], k: Int): DataFrame =
    df.select(col(idCol).as("id"),
        round(cosine(col(vecCol), vecLit(query)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id").asc)
      .limit(k)

  /** Deterministic random hyperplanes (driver-side PRNG, fixed seed). */
  def hyperplanes(dim: Int, nBits: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-bit LSH signature of a vector under the given hyperplanes. */
  def lshSignature(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, vecLit(p)) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Bucketed ANN: assigns every vector to its LSH bucket. At query
    * time, scan only the query's bucket (single partition-pruned read
    * when the table is written partitioned by `bucket`).
    */
  def withLshBucket(df: DataFrame, vecCol: String, dim: Int,
      nBits: Int = 8, seed: Long = 42L): DataFrame =
    df.withColumn("bucket", lshSignature(col(vecCol), hyperplanes(dim, nBits, seed)))

  /** ANN top-k: exact rescoring restricted to the query's LSH bucket. */
  def annTopK(df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Double], k: Int, nBits: Int = 8, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(query.size, nBits, seed)
    val sigLit = planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (x, y) => x * y }.sum
      if (d > 0) 1L << i else 0L
    }.sum
    withLshBucket(df, vecCol, query.size, nBits, seed)
      .filter(col("bucket") === lit(sigLit))
      .select(col(idCol).as("id"),
        round(cosine(col(vecCol), vecLit(query)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id").asc)
      .limit(k)
  }
}
