package graft

import org.apache.spark.sql.functions._

import graft.functions.GeohashExpression
import graft.spatial.Geohash

/** Native geohash expression: value parity with the pure function, SQL
  * registration, and proof it stays inside whole-stage codegen.
  */
class GeohashExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("expression matches the pure Scala function on random points") {
    val rng = new scala.util.Random(7)
    val pts = Seq.fill(200)((rng.nextDouble() * 360 - 180, rng.nextDouble() * 180 - 90))
    val df = pts.toDF("lon", "lat")
      .withColumn("h", GeohashExpression.geohash_encode($"lon", $"lat", lit(7)))
    val got = df.collect().map(r => (r.getDouble(0), r.getDouble(1), r.getString(2)))
    got.foreach { case (lon, lat, h) =>
      assert(h == Geohash.encode(lon, lat, 7))
    }
  }

  test("SQL registration works") {
    GeohashExpression.register(spark)
    val h = spark.sql("SELECT geohash_encode(CAST(10.40744 AS DOUBLE), CAST(57.64911 AS DOUBLE), 11) AS h")
      .as[String].head()
    assert(h == "u4pruydqqvj")
  }

  test("stays inside whole-stage codegen (no fallback)") {
    // parquet-backed source (a local relation would be folded away)
    val df = spark.read.parquet(s"$sf/customer.parquet")
      .withColumn("lon", ($"c_custkey" % 360 - 180).cast("double"))
      .withColumn("lat", ($"c_custkey" % 180 - 90).cast("double"))
      .withColumn("h", GeohashExpression.geohash_encode($"lon", $"lat", lit(5)))
      .filter($"h".isNotNull)
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("*(1) Project") && physical.contains("geohash_encode"),
      s"expected codegen'd project with the expression in:\n$physical")
    assert(!physical.contains("Fallback"), s"unexpected codegen fallback in:\n$physical")
    // and the generated code actually compiles & runs
    assert(df.count() == 150)
  }

  test("null inputs yield null, not errors") {
    val df = Seq((Some(1.0), None: Option[Double]), (None, Some(2.0)))
      .toDF("lon", "lat")
      .withColumn("h", GeohashExpression.geohash_encode($"lon", $"lat", lit(5)))
    assert(df.filter($"h".isNull).count() == 2)
  }

  test("point_in_polygon expression matches the pure function incl. holes, codegen, no UDF") {
    import graft.functions.PointInPolygonExpression
    val rings = Seq(
      Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)),
      Seq((4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0))) // hole
    val rng = new scala.util.Random(11)
    val pts = Seq.fill(500)((rng.nextDouble() * 14 - 2, rng.nextDouble() * 14 - 2))
    val got = pts.toDF("lon", "lat")
      .withColumn("in", PointInPolygonExpression.point_in_polygon($"lon", $"lat", rings))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getBoolean(2)))
    got.foreach { case (lon, lat, in) =>
      assert(in == Geohash.pointInPolygon(lon, lat, rings), s"($lon, $lat)")
    }
    // the q44 refine runs as a codegen'd filter, not a ScalaUDF
    val df = spark.read.parquet(s"$sf/customer.parquet")
      .withColumn("lon", ($"c_custkey" % 20).cast("double"))
      .withColumn("lat", ($"c_custkey" % 17).cast("double"))
      .filter(PointInPolygonExpression.point_in_polygon($"lon", $"lat", rings))
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("point_in_polygon"), physical)
    assert(!physical.contains("ScalaUDF") && !physical.contains("BatchEvalPython"), physical)
    assert(physical.contains("*(1)"), s"expected whole-stage codegen in:\n$physical")
    assert(df.count() > 0)
  }

  test("stored-polygon (column) variant matches the constant-polygon expression") {
    import graft.functions.{PointInPolygonExpression, PointInStoredPolygonExpression}
    val rings = Seq(
      Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)),
      Seq((4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0)))
    // the same polygon stored as an array<array<double>> column value
    val storedRings = array(rings.map(r =>
      array(r.flatMap(p => Seq(lit(p._1), lit(p._2))): _*)): _*)
    val rng = new scala.util.Random(13)
    val pts = Seq.fill(300)((rng.nextDouble() * 14 - 2, rng.nextDouble() * 14 - 2))
    val both = pts.toDF("lon", "lat")
      .withColumn("rings", storedRings)
      .withColumn("const_in", PointInPolygonExpression.point_in_polygon($"lon", $"lat", rings))
      .withColumn("stored_in", PointInStoredPolygonExpression
        .point_in_stored_polygon($"rings", $"lon", $"lat"))
    assert(both.filter($"const_in" =!= $"stored_in").count() == 0)
    // null polygon → null result, not an error
    val nulls = pts.take(5).toDF("lon", "lat")
      .withColumn("rings", lit(null).cast("array<array<double>>"))
      .withColumn("in", PointInStoredPolygonExpression
        .point_in_stored_polygon($"rings", $"lon", $"lat"))
    assert(nulls.filter($"in".isNull).count() == 5)
  }
}
