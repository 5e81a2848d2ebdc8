package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.spatial.GeometryOps._

/** geometry×geometry predicates (the GEOS-add-on surface of
  * geometry-ops.lisp:94-190, rebuilt in pure Scala).
  */
class GeometryOpsSpec extends AnyFunSuite {

  private def square(cx: Double, cy: Double, half: Double): Seq[(Double, Double)] =
    Seq((cx - half, cy - half), (cx + half, cy - half),
      (cx + half, cy + half), (cx - half, cy + half))

  test("segment intersection: proper, touching, collinear, disjoint") {
    assert(segmentsIntersect((0, 0), (2, 2), (0, 2), (2, 0)))        // proper cross
    assert(segmentsIntersect((0, 0), (2, 0), (2, 0), (3, 5)))        // endpoint touch
    assert(segmentsIntersect((0, 0), (4, 0), (1, 0), (2, 0)))        // collinear overlap
    assert(!segmentsIntersect((0, 0), (1, 1), (2, 0), (3, 1)))       // disjoint
    assert(!segmentsIntersect((0, 0), (4, 0), (5, 0), (6, 0)))       // collinear disjoint
  }

  test("polygon intersects: overlap, containment, touch, disjoint, holes") {
    val a = Seq(square(0, 0, 2))
    assert(polygonIntersects(a, Seq(square(1, 1, 2))))     // partial overlap
    assert(polygonIntersects(a, Seq(square(0, 0, 0.5))))   // b fully inside a
    assert(polygonIntersects(Seq(square(0, 0, 0.5)), a))   // a fully inside b
    assert(polygonIntersects(a, Seq(square(4, 0, 2))))     // edge touch at x=2
    assert(!polygonIntersects(a, Seq(square(10, 10, 1))))  // disjoint
    // donut: hole swallows the small square → no shared area, but the
    // small square's vertices are outside the polygon (inside the hole)
    val donut = Seq(square(0, 0, 4), square(0, 0, 2))
    assert(!polygonIntersects(donut, Seq(square(0, 0, 1))))
    assert(polygonIntersects(donut, Seq(square(3, 3, 0.5)))) // in the ring flesh
  }

  test("polygon contains: strict, crossing, hole-pierced") {
    val a = Seq(square(0, 0, 4))
    assert(polygonContains(a, Seq(square(0, 0, 1))))
    assert(!polygonContains(Seq(square(0, 0, 1)), a))
    assert(!polygonContains(a, Seq(square(4, 4, 2))))     // partially outside
    val donut = Seq(square(0, 0, 4), square(0, 0, 1))
    assert(polygonContains(donut, Seq(square(3, 3, 0.4))))
    assert(!polygonContains(donut, Seq(square(0, 0, 2)))) // b straddles the hole
  }

  test("areas: square, donut, degenerate") {
    assert(ringArea(square(0, 0, 2)) == 16.0)
    assert(polygonArea(Seq(square(0, 0, 2), square(0, 0, 1))) == 12.0)
    assert(ringArea(Seq((0, 0), (1, 1))) == 0.0)
    assert(polygonArea(Nil) == 0.0)
  }
}
