package graft

import org.apache.spark.sql.catalyst.expressions.{Attribute, In}
import org.apache.spark.sql.functions._

import graft.plans.SpatialCellPruning
import graft.spatial.{Geohash, SpatialOps}

/** The injectable cell-pruning optimizer rule: bbox filters over
  * cell-indexed tables gain a `cell IN (covering…)` conjunct, results
  * unchanged.
  */
class SpatialRuleSpec extends SparkSpec {
  import spark.implicits._

  // the rule targets STORED cell-indexed tables (the write-path index
  // maintenance of transactions.lisp:800-876), so materialize one —
  // an inline-computed cell column gets substituted away by predicate
  // pushdown before user rules run
  private lazy val indexedPath = {
    val c = spark.read.parquet(s"$sf/customer.parquet")
      .withColumn("lon", ($"c_custkey" * 7 % 360 - 180).cast("double") + 0.5)
      .withColumn("lat", ($"c_custkey" * 13 % 180 - 90).cast("double") + 0.5)
    val p = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "cellidx").toString + "/t"
    SpatialOps.withCell(c, "lon", "lat", precision = 2)
      .write.mode("overwrite").parquet(p)
    p
  }
  private def coords = spark.read.parquet(indexedPath)

  private def bboxFilter(df: org.apache.spark.sql.DataFrame) =
    df.filter($"lon" >= -20.0 && $"lon" <= 20.0 && $"lat" >= -15.0 && $"lat" <= 15.0)

  test("rule injects a cell IN (...) conjunct and keeps results identical") {
    val before = bboxFilter(coords).collect().map(_.getAs[Long]("c_custkey")).sorted
    spark.experimental.extraOptimizations ++= Seq(SpatialCellPruning)
    try {
      val df = bboxFilter(coords)
      val optimized = df.queryExecution.optimizedPlan
      val inPreds = optimized.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.collect { case i @ In(a: Attribute, _) if a.name == "cell" => i }
      }.flatten
      assert(inPreds.nonEmpty, s"expected injected cell IN pruning in:\n$optimized")
      // the injected cells really are the covering of the bbox
      val cells = Geohash.covering(Geohash.BBox(-20, -15, 20, 15), 2)
      assert(inPreds.head.list.size == cells.size)
      val after = df.collect().map(_.getAs[Long]("c_custkey")).sorted
      assert(after.sameElements(before), "pruning must not change results")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == SpatialCellPruning)
    }
  }

  test("rule leaves non-bbox filters and unindexed tables alone") {
    spark.experimental.extraOptimizations ++= Seq(SpatialCellPruning)
    try {
      // no lat bound -> no injection
      val partial = coords.filter($"lon" >= -20.0 && $"lon" <= 20.0)
      val noInj = partial.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.collect { case i @ In(a: Attribute, _) if a.name == "cell" => i }
      }.flatten
      assert(noInj.isEmpty)
      // table without cell metadata -> untouched
      val plain = spark.read.parquet(s"$sf/customer.parquet").filter($"c_acctbal" >= 0.0)
      assert(plain.count() > 0)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == SpatialCellPruning)
    }
  }
}
