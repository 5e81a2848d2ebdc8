package graft

import org.apache.spark.sql.functions._

import graft.spatial.SpatialOps

/** Z-order layout: key correctness vs the driver-side reference
  * encoder, Z-curve locality, and the file-pruning payoff — a bbox's
  * rows concentrate in few range partitions after clustering.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  // dense deterministic point cloud (the payoff needs enough points
  // that a small bbox is non-empty; the formula matches the catalog's
  // synthetic coords so zOrderKey sees realistic values)
  private lazy val pts = spark.range(0, 20000).select($"id")
    .withColumn("lon", (($"id" * 7 % 360) - 180).cast("double") + 0.5)
    .withColumn("lat", (($"id" * 13 % 180) - 90).cast("double") + 0.5)

  test("zOrderKey matches the local reference encoder") {
    val got = pts.select($"id", $"lon", $"lat",
      SpatialOps.zOrderKey($"lon", $"lat").as("z")).collect()
    got.foreach { r =>
      val expected = SpatialOps.zOrderKeyLocal(r.getDouble(1), r.getDouble(2))
      assert(r.getLong(3) == expected, s"id ${r.getLong(0)}")
    }
  }

  test("Z-curve locality: nearby points share high bits") {
    // two points in the same ~1.4°×0.7° cell (bits 16: cell ≈ 0.0055°)
    val a = SpatialOps.zOrderKeyLocal(10.10, 20.10)
    val b = SpatialOps.zOrderKeyLocal(10.11, 20.11)
    val far = SpatialOps.zOrderKeyLocal(-150.0, -80.0)
    assert((a >> 16) == (b >> 16))
    assert((a >> 16) != (far >> 16))
  }

  test("clustering by Z-key concentrates a bbox into few range partitions") {
    val parts = 16
    def partitionsTouched(df: org.apache.spark.sql.DataFrame): Long = df
      .withColumn("pid", spark_partition_id())
      .filter($"lon".between(0.0, 25.0) && $"lat".between(0.0, 25.0))
      .select("pid").distinct().count()
    // hash-distributed baseline: the bbox's rows land everywhere
    val scattered = partitionsTouched(pts.repartition(parts, $"id"))
    val clustered = partitionsTouched(
      SpatialOps.clusterByZOrder(pts, "lon", "lat", parts))
    assert(scattered >= parts / 2, s"baseline unexpectedly clustered: $scattered")
    assert(clustered < scattered / 2,
      s"bbox should touch few Z-range partitions, touched $clustered")
  }
}
