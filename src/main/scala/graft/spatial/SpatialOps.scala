package graft.spatial

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-side spatial operators (reference spatial-query.lisp:41-148:
  * find-nodes-within / find-nodes-near / find-nearest-k, and the
  * spatial index of spatial-index.lisp).
  *
  * Scale design (SURVEY.md §2.8): each row gets a `cells` column — the
  * geohash cells covering its geometry. Queries compute the covering
  * cells of their search area on the driver (cheap grid math), prune
  * candidates with an `isin`/`array_contains` filter — which becomes a
  * partition filter when the table is written partitioned by cell —
  * then refine exactly (haversine / point-in-polygon). Empty space
  * costs nothing, exactly like the reference's per-cell range scans.
  *
  * Haversine is expressed with built-in column functions so it
  * whole-stage-codegens and matches an external SQL oracle bit-for-bit
  * in formula shape.
  */
object SpatialOps {

  /** Haversine distance in meters as a pure column expression. */
  def haversineM(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) + cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * 6371000.0) * asin(least(lit(1.0), sqrt(a)))
  }

  /** Attach the spatial-index cell column (write-path maintenance
    * analog, reference transactions.lisp:800-876) via the native
    * codegen'd expression — no UDF in the scan path. The column carries
    * metadata (precision + source columns) that
    * [[graft.plans.SpatialCellPruning]] uses to inject cell-pruning
    * predicates into bbox queries.
    */
  def withCell(df: DataFrame, lonCol: String, latCol: String, precision: Int): DataFrame = {
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("geohash_precision", precision.toLong)
      .putString("geohash_lon", lonCol)
      .putString("geohash_lat", latCol)
      .build()
    df.select(col("*"), graft.functions.GeohashExpression.geohash_encode(
      col(lonCol), col(latCol), lit(precision)).as("cell", md))
  }

  /** Candidate pruning for a bbox query: covering cells computed on the
    * driver, then a cell membership filter (partition-prunable).
    */
  def bboxCandidates(df: DataFrame, lonCol: String, latCol: String,
      box: Geohash.BBox, precision: Int): DataFrame = {
    val cells = Geohash.covering(box, precision)
    // covering may have auto-dropped precision to bound the cell count —
    // row cells must be computed at the precision actually used
    val actualPrecision = cells.head.length
    withCell(df, lonCol, latCol, actualPrecision)
      .filter(col("cell").isin(cells: _*))
  }

  /** find-nodes-within (bbox): prune by cells then refine exactly. */
  def withinBBox(df: DataFrame, lonCol: String, latCol: String,
      box: Geohash.BBox, precision: Int = 5): DataFrame =
    bboxCandidates(df, lonCol, latCol, box, precision)
      .filter(col(lonCol) >= box.minLon && col(lonCol) <= box.maxLon &&
        col(latCol) >= box.minLat && col(latCol) <= box.maxLat)

  /** find-nodes-near: radius query = bbox prune + haversine refine,
    * with the reference's lat-aware lon-degree bbox derivation
    * (spatial-index.lisp:145-168).
    */
  def near(df: DataFrame, lonCol: String, latCol: String,
      lon: Double, lat: Double, radiusM: Double, precision: Int = 5): DataFrame = {
    val dLat = radiusM / 111320.0
    val dLon = radiusM / (111320.0 * math.max(0.01, math.cos(math.toRadians(lat))))
    val box = Geohash.BBox(
      math.max(-180, lon - dLon), math.max(-90, lat - dLat),
      math.min(180, lon + dLon), math.min(90, lat + dLat))
    bboxCandidates(df, lonCol, latCol, box, precision)
      .withColumn("dist_m", haversineM(col(lonCol), col(latCol), lit(lon), lit(lat)))
      .filter(col("dist_m") <= radiusM)
  }

  /** find-nearest-k: expanding-radius kNN, the same plan shape as the
    * reference's geohash-ring expansion (spatial-query.lisp:122-148):
    * probe the cell-pruned [[near]] at doubling radius until ≥ k
    * candidates, then TakeOrdered those candidates. Correct because
    * once k points lie within radius r, the global k nearest all lie
    * within r. Falls back to an unpruned full-scan TakeOrdered only
    * past `maxRadiusM` (fewer than k rows in range) — still correct,
    * just the documented worst case. At 100 TB each probe reads only
    * the covering cells' files (cell `isin` → partition/stats pruning)
    * instead of the whole table.
    *
    * Job budget: one probe job counts candidates for FOUR doubling
    * rings at once (a single aggregate over the widest ring's pruned
    * candidates — per-ring counts are conditional sums), so the typical
    * query is 2 jobs total (probe + the consumer's TakeOrdered) instead
    * of one count job per radius plus the final ordering.
    */
  def nearestK(df: DataFrame, lonCol: String, latCol: String, idCol: String,
      lon: Double, lat: Double, k: Int,
      initRadiusM: Double = 100000.0, maxRadiusM: Double = 1.0e7,
      precision: Int = 5): DataFrame =
    nearestKImpl(r => near(df, lonCol, latCol, lon, lat, r, precision),
      df.withColumn("dist_m",
        haversineM(col(lonCol), col(latCol), lit(lon), lit(lat))),
      idCol, k, initRadiusM, maxRadiusM)

  /** Shared expanding-ring driver: `nearFn(r)` yields candidates with a
    * `dist_m` column for radius r; `fullScan` is the past-maxRadius
    * fallback (already carrying `dist_m`). Returns the LAZY ordered
    * plan over the winning ring, so the cell-pruning predicate stays
    * visible in the consumer's executed plan.
    */
  private def nearestKImpl(nearFn: Double => DataFrame, fullScan: => DataFrame,
      idCol: String, k: Int, initRadiusM: Double, maxRadiusM: Double): DataFrame = {
    def ordered(cand: DataFrame): DataFrame =
      cand.withColumn("dist_m", round(col("dist_m"), 3))
        .orderBy(col("dist_m").asc, col(idCol).asc)
        .limit(k)
    val ringsPerProbe = 4
    var lo = initRadiusM
    while (lo <= maxRadiusM) {
      val radii = Iterator.iterate(lo)(_ * 2)
        .take(ringsPerProbe).takeWhile(_ <= maxRadiusM).toSeq
      val counts = nearFn(radii.last).select(radii.zipWithIndex.map { case (r, i) =>
        sum(when(col("dist_m") <= r, 1L).otherwise(0L)).as(s"c$i")
      }: _*).head()
      radii.indices.find(i => !counts.isNullAt(i) && counts.getLong(i) >= k) match {
        case Some(i) => return ordered(nearFn(radii(i)))
        case None => lo = radii.last * 2
      }
    }
    ordered(fullScan)
  }

  /** Point-in-polygon refine — a codegen'd Catalyst expression, not a
    * closure UDF ([[graft.functions.PointInPolygonExpression]]).
    */
  def pointInPolygon(lon: Column, lat: Column, rings: Seq[Seq[(Double, Double)]]): Column =
    graft.functions.PointInPolygonExpression.point_in_polygon(lon, lat, rings)

  /** Morton (Z-order) key: interleaved bits of floor-scaled lon/lat
    * codes, `bitsPerDim` bits each (≤ 31). Points close on the Z-curve
    * are close in space, so range-partitioning + sorting by this key
    * clusters spatially-near rows into the same files — parquet min/max
    * stats then prune file reads for bbox queries, the columnar analog
    * of the reference's cell-keyed skip list (spatial-index.lisp:79-110)
    * at petabyte layout scale. Geohash cells (withCell) answer
    * "which rows", the Z-layout answers "which FILES hold them".
    */
  def zOrderKey(lon: Column, lat: Column, bitsPerDim: Int = 16): Column = {
    require(bitsPerDim >= 1 && bitsPerDim <= 31, "bitsPerDim in [1,31]")
    val scale = 1L << bitsPerDim
    val lonB = least(floor((lon + 180.0) / 360.0 * scale), lit(scale - 1)).cast("long")
    val latB = least(floor((lat + 90.0) / 180.0 * scale), lit(scale - 1)).cast("long")
    (0 until bitsPerDim).map { i =>
      shiftleft(shiftright(lonB, i).bitwiseAND(1L), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(latB, i).bitwiseAND(1L), 2 * i))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Driver-side reference Morton encoder (same formula; spec anchor). */
  def zOrderKeyLocal(lon: Double, lat: Double, bitsPerDim: Int = 16): Long = {
    val scale = 1L << bitsPerDim
    val lonB = math.min(math.floor((lon + 180.0) / 360.0 * scale).toLong, scale - 1)
    val latB = math.min(math.floor((lat + 90.0) / 180.0 * scale).toLong, scale - 1)
    (0 until bitsPerDim).map { i =>
      (((lonB >> i) & 1L) << (2 * i + 1)) | (((latB >> i) & 1L) << (2 * i))
    }.reduce(_ | _)
  }

  /** Cluster a frame for spatial file pruning: range-partition on the
    * Z-key and sort within partitions, so each output file owns a
    * compact Z-range (write with .write.parquet and bbox scans touch
    * only the files whose zkey min/max intersect the query's range).
    */
  def clusterByZOrder(df: DataFrame, lonCol: String, latCol: String,
      numPartitions: Int, bitsPerDim: Int = 16): DataFrame = {
    val keyed = df.withColumn("zkey", zOrderKey(col(lonCol), col(latCol), bitsPerDim))
    keyed.repartitionByRange(numPartitions, col("zkey"))
      .sortWithinPartitions("zkey")
  }

  // --- written-artifact spatial store: the at-scale probe path ---------
  //
  // The probes above filter on a COMPUTED cell column — correct at any
  // scale, but every probe still scans the table to evaluate the
  // geohash. At 100 TB the store IS the index (the same move as the
  // written ANN stores): the frame is written ONCE as parquet
  // partitioned by `cell`, and a probe becomes a partition-pruned read
  // of just the covering cells' directories — `PartitionFilters` in the
  // plan; nothing else is listed, opened, or read. This is the columnar
  // analog of the reference's cell-keyed skip list
  // (spatial-index.lisp:79-110).

  /** Root for materialized spatial stores (shared with the ANN stores;
    * override via SPARK_GRAFT_STORE_DIR for tests).
    */
  def storeRoot: String = graft.model.StorePaths.root

  def cellStorePath(sfDir: String, name: String, precision: Int): String =
    s"$storeRoot/${graft.model.StorePaths.key(sfDir)}/cells_${name}_p$precision"

  private val buildLock = new Object

  /** Per-session cache of opened stores: partition discovery lists
    * every cell directory, and re-listing per probe would dominate
    * probe latency (at scale this caching is the catalog/metastore's
    * job). DataFrames are lazy and immutable, so sharing is safe.
    */
  private val storeCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** Materialize a frame partitioned by its geohash `cell` at
    * `precision` — build-if-absent, idempotent per (data, name,
    * precision) path. Returns the store read back (the `cell` column is
    * the partition column, so covering-cell filters prune at file
    * listing time).
    */
  def ensureCellStore(df: => DataFrame, lonCol: String, latCol: String,
      sfDir: String, name: String, precision: Int): DataFrame = {
    val path = cellStorePath(sfDir, name, precision)
    // staleness guard: rebuild when the source table's files changed
    // under the same sfDir (cheap filesystem fingerprint, no job)
    val fp = graft.model.StorePaths.fingerprint(s"$sfDir/$name.parquet")
    def current = new java.io.File(path, "_SUCCESS").exists() &&
      graft.model.StorePaths.isCurrent(path, fp)
    if (!current) buildLock.synchronized {
      if (!current) {
        withCell(df, lonCol, latCol, precision)
          .write.partitionBy("cell").mode("overwrite").parquet(path)
        graft.model.StorePaths.stamp(path, fp)
        storeCache.clear() // a rebuild invalidates cached listings
      }
    }
    val spark = org.apache.spark.sql.SparkSession.active
    storeCache.getOrElseUpdate(s"${spark.sparkContext.applicationId}:$path",
      spark.read.parquet(path))
  }

  /** Covering-cell predicate against a store written at
    * `storePrecision`: when [[Geohash.covering]] auto-drops to a
    * coarser precision, the filter matches on the cell PREFIX — still a
    * deterministic partition-column predicate, so it prunes directory
    * listing either way.
    */
  def storedCellFilter(box: Geohash.BBox, storePrecision: Int): Column = {
    val cells = Geohash.covering(box, storePrecision)
    val p = cells.head.length
    if (p == storePrecision) col("cell").isin(cells: _*)
    else substring(col("cell"), 1, p).isin(cells: _*)
  }

  /** [[withinBBox]] over a written cell store: partition-pruned read +
    * exact refine. Results are identical to the computed-cell path.
    */
  def withinBBoxStored(store: DataFrame, storePrecision: Int,
      lonCol: String, latCol: String, box: Geohash.BBox): DataFrame =
    store.filter(storedCellFilter(box, storePrecision))
      .filter(col(lonCol) >= box.minLon && col(lonCol) <= box.maxLon &&
        col(latCol) >= box.minLat && col(latCol) <= box.maxLat)

  /** [[near]] over a written cell store. */
  def nearStored(store: DataFrame, storePrecision: Int,
      lonCol: String, latCol: String,
      lon: Double, lat: Double, radiusM: Double): DataFrame = {
    val dLat = radiusM / 111320.0
    val dLon = radiusM / (111320.0 * math.max(0.01, math.cos(math.toRadians(lat))))
    val box = Geohash.BBox(
      math.max(-180, lon - dLon), math.max(-90, lat - dLat),
      math.min(180, lon + dLon), math.min(90, lat + dLat))
    store.filter(storedCellFilter(box, storePrecision))
      .withColumn("dist_m", haversineM(col(lonCol), col(latCol), lit(lon), lit(lat)))
      .filter(col("dist_m") <= radiusM)
  }

  /** [[nearestK]] over a written cell store: the same expanding-ring
    * driver, every probe a partition-pruned read.
    */
  def nearestKStored(store: DataFrame, storePrecision: Int,
      lonCol: String, latCol: String, idCol: String,
      lon: Double, lat: Double, k: Int,
      initRadiusM: Double = 100000.0, maxRadiusM: Double = 1.0e7): DataFrame =
    nearestKImpl(
      r => nearStored(store, storePrecision, lonCol, latCol, lon, lat, r),
      store.withColumn("dist_m",
        haversineM(col(lonCol), col(latCol), lit(lon), lit(lat))),
      idCol, k, initRadiusM, maxRadiusM)
}
