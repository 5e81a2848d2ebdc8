package graft.spatial

/** Base-32 geohash grid math — same capability surface as the
  * reference's geohash module (reference geohash.lisp:16-127:
  * encode/decode/bbox/neighbors/covering), implemented from the public
  * geohash algorithm (Niemeyer's interleaved-bit base-32 encoding).
  *
  * Pure, allocation-light Scala; wrapped as Spark functions in
  * [[SpatialOps]] so the per-row work stays on executors.
  */
object Geohash {

  private val base32 = "0123456789bcdefghjkmnpqrstuvwxyz"
  private val base32Idx: Map[Char, Int] = base32.zipWithIndex.toMap

  final case class BBox(minLon: Double, minLat: Double, maxLon: Double, maxLat: Double) {
    def contains(lon: Double, lat: Double): Boolean =
      lon >= minLon && lon <= maxLon && lat >= minLat && lat <= maxLat
    def intersects(o: BBox): Boolean =
      minLon <= o.maxLon && maxLon >= o.minLon && minLat <= o.maxLat && maxLat >= o.minLat
  }

  def encode(lon: Double, lat: Double, precision: Int): String = {
    val sb = new StringBuilder(precision)
    var lonLo = -180.0; var lonHi = 180.0
    var latLo = -90.0; var latHi = 90.0
    var isLon = true
    var bit = 0; var ch = 0
    while (sb.length < precision) {
      if (isLon) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid } else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid } else { ch = ch << 1; latHi = mid }
      }
      isLon = !isLon
      bit += 1
      if (bit == 5) { sb.append(base32(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  /** Bounding box of a geohash cell. */
  def bbox(hash: String): BBox = {
    var lonLo = -180.0; var lonHi = 180.0
    var latLo = -90.0; var latHi = 90.0
    var isLon = true
    hash.foreach { c =>
      val idx = base32Idx.getOrElse(c, throw new IllegalArgumentException(s"bad geohash char: $c"))
      var i = 4
      while (i >= 0) {
        val bit = (idx >> i) & 1
        if (isLon) {
          val mid = (lonLo + lonHi) / 2
          if (bit == 1) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (bit == 1) latLo = mid else latHi = mid
        }
        isLon = !isLon
        i -= 1
      }
    }
    BBox(lonLo, latLo, lonHi, latHi)
  }

  /** Cell center. */
  def decode(hash: String): (Double, Double) = {
    val b = bbox(hash)
    ((b.minLon + b.maxLon) / 2, (b.minLat + b.maxLat) / 2)
  }

  /** The 8 neighboring cells (recomputed via encode of offset centers —
    * robust at poles/antimeridian by clamping/wrapping).
    */
  def neighbors(hash: String): Seq[String] = {
    val b = bbox(hash)
    val (cLon, cLat) = decode(hash)
    val dLon = b.maxLon - b.minLon
    val dLat = b.maxLat - b.minLat
    val out = for {
      dx <- Seq(-1, 0, 1); dy <- Seq(-1, 0, 1) if !(dx == 0 && dy == 0)
      lon = wrapLon(cLon + dx * dLon)
      lat = cLat + dy * dLat
      if lat > -90 && lat < 90
    } yield encode(lon, lat, hash.length)
    out.distinct.filterNot(_ == hash)
  }

  private def wrapLon(lon: Double): Double =
    if (lon > 180) lon - 360 else if (lon < -180) lon + 360 else lon

  /** Covering cell set for a bbox at the given precision; if the box
    * would need more than maxCells, precision is dropped until it fits
    * (the reference's precision auto-drop, geohash.lisp:102-127).
    */
  def covering(box: BBox, precision: Int, maxCells: Int = 64): Seq[String] = {
    var p = precision
    while (p > 1) {
      val cells = coverAt(box, p, maxCells)
      if (cells.nonEmpty) return cells
      p -= 1
    }
    coverAt(box, 1, Int.MaxValue)
  }

  private def coverAt(box: BBox, p: Int, maxCells: Int): Seq[String] = {
    // anchor the grid at the corner of the CELL containing the box
    // corner (not the box corner itself), so stepping by cell size
    // visits every intersecting cell
    val seedBox = bbox(encode(box.minLon, box.minLat, p))
    val cellW = seedBox.maxLon - seedBox.minLon
    val cellH = seedBox.maxLat - seedBox.minLat
    val nx = math.max(1, math.ceil((box.maxLon - seedBox.minLon) / cellW).toInt)
    val ny = math.max(1, math.ceil((box.maxLat - seedBox.minLat) / cellH).toInt)
    if (nx.toLong * ny > maxCells) return Seq.empty
    val cells = for {
      ix <- 0 until nx; iy <- 0 until ny
      lon = math.min(seedBox.minLon + ix * cellW + cellW / 2, 180.0)
      lat = math.min(seedBox.minLat + iy * cellH + cellH / 2, 90.0)
    } yield encode(wrapLon(lon), lat, p)
    val out = cells.distinct.filter(c => bbox(c).intersects(box))
    if (out.size > maxCells) Seq.empty else out
  }

  /** Haversine distance in meters (reference geometry-ops.lisp:19-31). */
  def haversineMeters(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val R = 6371000.0
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.sin(dLat / 2) * math.sin(dLat / 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.sin(dLon / 2) * math.sin(dLon / 2)
    2 * R * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /** Ray-casting point-in-ring test (reference geometry-ops.lisp:32-47). */
  def pointInRing(lon: Double, lat: Double, ring: Seq[(Double, Double)]): Boolean = {
    var inside = false
    var j = ring.length - 1
    var i = 0
    while (i < ring.length) {
      val (xi, yi) = ring(i); val (xj, yj) = ring(j)
      if (((yi > lat) != (yj > lat)) &&
        (lon < (xj - xi) * (lat - yi) / (yj - yi) + xi)) inside = !inside
      j = i; i += 1
    }
    inside
  }

  /** Point in polygon with holes: inside outer ring, outside all holes
    * (reference geometry-ops.lisp:48-66).
    */
  def pointInPolygon(lon: Double, lat: Double, rings: Seq[Seq[(Double, Double)]]): Boolean =
    rings.nonEmpty && pointInRing(lon, lat, rings.head) &&
      !rings.tail.exists(h => pointInRing(lon, lat, h))
}
