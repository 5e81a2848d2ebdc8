package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry}

/** Synthetic scale check: self-scales the dedup/ANN/spatial inputs ×N
  * and measures wall-time ratios against the base scale factor — the
  * would-this-survive-a-scale-up evidence no fixed-SF bench gives.
  *
  * Scaled-corpus construction (per copy i of `factor`):
  *   - documents: ids re-keyed `doc_id*factor+i`; every token prefixed
  *     with `c<i>` — token and shingle counts per doc are UNCHANGED and
  *     the within-copy near-dup structure exactly mirrors the original
  *     (tokens bijectively renamed), while cross-copy Jaccard is 0. A
  *     naive ×N union of identical texts would instead manufacture
  *     N²-many cross-copy duplicate pairs and measure that artifact,
  *     not the operator's scaling.
  *   - embeddings / customer: ids re-keyed, payloads kept — ANN bucket
  *     occupancy and spatial cell occupancy grow ×N (top-k stays k).
  *   - everything else symlinked from the base dir.
  *
  * Methodology per query and per dir: one discarded warm-up run (which
  * also builds the dir-keyed ANN/spatial stores — store builds are a
  * one-time cost, not probe cost), then min of N timed runs — the same
  * steady-state discipline as [[graft.Bench]]. A query "survives" when
  * time ratio ≤ data ratio; latency-bound shapes should come in far
  * under it.
  */
object ScaleCheck {

  /** The dedup, similarity, spatial and corpus-text headliners — the
    * shapes whose scaling behavior BENCHNOTES claims.
    */
  val queries: Seq[String] = Seq(
    "q40_spatial_bbox",
    "q41_spatial_knn",
    "q42_spatial_radius",
    "q54_dedup_exact",
    "q56_minhash_lsh",
    "q58_cosine_topk",
    "q59_ann_lsh",
    "q67_ivf_ann",
    "q93_quota_sample",
    "q95_chunk_overlap",
    "q96_vocab",
    "q97_filter_gate",
    "q98_bpe_pairs")

  private def rekey(idCol: String, factor: Int, i: Int) =
    (col(idCol) * factor + i).as(idCol)

  private def scaledDocs(df: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { i =>
      df.select(rekey("doc_id", factor, i),
        regexp_replace(col("text"), "(\\S+)", s"c$i$$1").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)

  private def scaledById(df: DataFrame, idCol: String, factor: Int): DataFrame = {
    val rest = df.columns.filterNot(_ == idCol).map(col).toSeq
    (0 until factor).map { i =>
      df.select(rekey(idCol, factor, i) +: rest: _*)
    }.reduce(_ unionByName _)
  }

  /** Build (idempotently) the scaled dataset dir: 3 scaled tables,
    * everything else symlinked.
    */
  def ensureScaled(spark: SparkSession, base: String, factor: Int, out: String): Unit = {
    val marker = Paths.get(out, "_SCALED")
    // the marker records (base, factor): a rerun with different
    // parameters against the same out dir rebuilds instead of silently
    // measuring stale data
    val want = s"${Paths.get(base).toAbsolutePath} x$factor"
    if (Files.exists(marker) && new String(Files.readAllBytes(marker)) == want) return
    graft.model.Dirs.rmTree(Paths.get(out))
    Files.createDirectories(Paths.get(out))
    def read(t: String) = spark.read.parquet(s"$base/$t.parquet")
    scaledDocs(read("documents"), factor)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    scaledById(read("embeddings"), "vec_id", factor)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    scaledById(read("customer"), "c_custkey", factor)
      .write.mode("overwrite").parquet(s"$out/customer.parquet")
    graft.model.Dirs.childNames(Paths.get(base))
      .filter(n => n.endsWith(".parquet") &&
        !Set("documents.parquet", "embeddings.parquet", "customer.parquet")(n))
      .foreach { n =>
        // absolute target: a relative one would resolve against the
        // LINK's directory and dangle
        Files.createSymbolicLink(Paths.get(out, n), Paths.get(base, n).toAbsolutePath)
      }
    Files.write(marker, want.getBytes)
  }

  private def time(fn: => Unit): Double = {
    val t0 = System.nanoTime()
    fn
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 8
    val out = if (args.length > 2) args(2) else s"target/scalecheck/x$factor"
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = GraftSession.get(32)
    ensureScaled(spark, base, factor, out)

    def measure(dir: String, name: String): Double = {
      val fn = SparkEntry.queries(name)
      fn(spark, dir).count() // warm-up (+ one-time store builds), discarded
      Seq.fill(runs)(time(fn(spark, dir).count())).min
    }

    val rows = queries.map { name =>
      val tBase = measure(base, name)
      val tScaled = measure(out, name)
      (name, tBase, tScaled, tScaled / tBase)
    }
    val qs = rows.map { case (n, b, s, r) =>
      "\"" + n + f"""\":{"base_sec":$b%.3f,"scaled_sec":$s%.3f,"ratio":$r%.2f}"""
    }.mkString("{", ",", "}")
    val worst = rows.maxBy(_._4)
    println(
      f"""{"metric":"scale_check","factor":$factor,"base":"$base","queries":$qs,""" +
        f""""worst":"${worst._1}","worst_ratio":${worst._4}%.2f,"pass":${worst._4 <= factor}}""")
    spark.stop()
  }
}
