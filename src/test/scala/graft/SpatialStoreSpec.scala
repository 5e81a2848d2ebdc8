package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.spatial.{Geohash, SpatialOps}

/** The written-artifact spatial path (the cell analog of AnnStoreSpec):
  * the customer frame materialized as parquet partitioned by geohash
  * `cell`, probes partition-pruned to the covering cells' directories.
  * Asserted on the actual physical plans AND on result equality with
  * the computed-cell filter probes.
  */
class SpatialStoreSpec extends SparkSpec {

  private val precision = 2

  private def coords: DataFrame = spark.read.parquet(s"$sf/customer.parquet")
    .select(col("c_custkey").as("id"),
      (((col("c_custkey") * 7) % 360 - 180).cast("double") + 0.5).as("lon"),
      (((col("c_custkey") * 13) % 180 - 90).cast("double") + 0.5).as("lat"))

  private def store: DataFrame =
    SpatialOps.ensureCellStore(coords, "lon", "lat", sf, "customer", precision)

  private def assertPartitionPruned(df: DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), s"no partition filters:\n$plan")
    assert(!plan.contains("PartitionFilters: []"),
      s"partition filter list is EMPTY — probe reads the whole store:\n$plan")
    assert(plan.contains("cell"), s"cell not in the partition filter:\n$plan")
  }

  test("bbox probe: partition-pruned plan, identical to the computed-cell probe") {
    val box = Geohash.BBox(-60, -40, 60, 40)
    val stored = SpatialOps.withinBBoxStored(store, precision, "lon", "lat", box)
      .select("id", "lon", "lat").orderBy("id")
    val scan = SpatialOps.withinBBox(coords, "lon", "lat", box, precision)
      .select("id", "lon", "lat").orderBy("id")
    assert(stored.collect().toSeq == scan.collect().toSeq)
    assertPartitionPruned(stored)
  }

  test("radius probe: partition-pruned plan, identical to the computed-cell probe") {
    val stored = SpatialOps.nearStored(store, precision, "lon", "lat",
      lon = 0.0, lat = 0.0, radiusM = 3000000.0)
      .select("id", "dist_m").orderBy("id")
    val scan = SpatialOps.near(coords, "lon", "lat",
      lon = 0.0, lat = 0.0, radiusM = 3000000.0, precision)
      .select("id", "dist_m").orderBy("id")
    assert(stored.collect().toSeq == scan.collect().toSeq)
    assertPartitionPruned(stored)
  }

  test("kNN probe: partition-pruned plan, identical to the computed-cell probe") {
    val stored = SpatialOps.nearestKStored(store, precision, "lon", "lat", "id",
      lon = 10.0, lat = 20.0, k = 15)
      .select("id", "dist_m")
    val scan = SpatialOps.nearestK(coords, "lon", "lat", "id",
      lon = 10.0, lat = 20.0, k = 15, precision = precision)
      .select("id", "dist_m")
    assert(stored.collect().toSeq == scan.collect().toSeq)
    assertPartitionPruned(stored)
  }

  test("coarser covering (precision auto-drop) still prunes via the cell prefix") {
    // a box too wide for 64 cells at the store precision → covering
    // auto-drops; the predicate becomes substring(cell, 1, p) IN (...),
    // still a deterministic partition-column filter
    val box = Geohash.BBox(-170, -80, 170, 80)
    val cells = Geohash.covering(box, precision)
    assume(cells.head.length < precision, "box chosen to force auto-drop")
    val stored = SpatialOps.withinBBoxStored(store, precision, "lon", "lat", box)
    val scan = SpatialOps.withinBBox(coords, "lon", "lat", box, precision)
    assert(stored.select("id").orderBy("id").collect().toSeq ==
      scan.select("id").orderBy("id").collect().toSeq)
    assertPartitionPruned(stored)
  }
}
