package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.spatial.Geohash

/** Geohash math against published test vectors (geohash.org examples)
  * plus seeded property sweeps — the upgrade over the reference's
  * example-only tests noted in SURVEY.md §5.
  */
class GeohashSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(42)

  test("encode matches public test vectors") {
    // canonical examples from the public geohash description
    assert(Geohash.encode(-5.6, 42.6, 5) == "ezs42")
    assert(Geohash.encode(10.40744, 57.64911, 11) == "u4pruydqqvj")
    assert(Geohash.encode(-0.1278, 51.5074, 6) == "gcpvj0")
  }

  test("bbox contains the encoded point; center re-encodes to same cell") {
    (1 to 500).foreach { _ =>
      val lon = rng.nextDouble() * 360 - 180
      val lat = rng.nextDouble() * 180 - 90
      val p = 1 + rng.nextInt(10)
      val h = Geohash.encode(lon, lat, p)
      val b = Geohash.bbox(h)
      assert(b.contains(lon, lat), s"$h bbox must contain ($lon,$lat)")
      val (clon, clat) = Geohash.decode(h)
      assert(Geohash.encode(clon, clat, p) == h)
    }
  }

  test("neighbors are adjacent same-precision cells") {
    val n = Geohash.neighbors("u4pru")
    assert(n.size >= 5 && n.size <= 8)
    assert(n.forall(_.length == 5))
    assert(!n.contains("u4pru"))
  }

  test("covering cells jointly contain the bbox") {
    val box = Geohash.BBox(-10, -10, 10, 10)
    val cells = Geohash.covering(box, 3)
    assert(cells.nonEmpty)
    (1 to 500).foreach { _ =>
      val lon = rng.nextDouble() * 20 - 10
      val lat = rng.nextDouble() * 20 - 10
      val cell = Geohash.encode(lon, lat, cells.head.length)
      assert(cells.contains(cell), s"point ($lon,$lat) cell $cell not covered")
    }
  }

  test("haversine known distance") {
    // Paris <-> London ≈ 343.5 km
    val d = Geohash.haversineMeters(2.3522, 48.8566, -0.1278, 51.5074)
    assert(d > 333000 && d < 354000)
  }

  test("point in polygon with hole") {
    val outer = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0))
    val hole = Seq((4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0))
    assert(Geohash.pointInPolygon(2, 2, Seq(outer, hole)))
    assert(!Geohash.pointInPolygon(5, 5, Seq(outer, hole)))
    assert(!Geohash.pointInPolygon(11, 5, Seq(outer, hole)))
  }
}
