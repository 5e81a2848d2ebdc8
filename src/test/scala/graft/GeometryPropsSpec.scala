package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.spatial.GeometryOps._

/** Property-based geometry checks: axis-aligned rectangles have a
  * closed-form ground truth (interval arithmetic), so intersects /
  * contains / area are verified against it across random inputs.
  */
class GeometryPropsSpec extends AnyFunSuite {

  /** Deterministic sampling loop (scalatest+scalacheck bridge isn't on
    * the classpath; a fixed-seed Gen walk gives the same coverage).
    */
  private def forAll[A](g: Gen[A], n: Int = 300)(body: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(42L)
    var i = 0
    while (i < n) {
      g.apply(params, seed).foreach { a => body(a); i += 1 }
      seed = seed.next
    }
  }
  private def forAll2[A](g: Gen[A])(body: (A, A) => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(7L)
    var i = 0
    while (i < 300) {
      (g.apply(params, seed), g.apply(params, seed.next)) match {
        case (Some(a), Some(b)) => body(a, b); i += 1
        case _ =>
      }
      seed = seed.next.next
    }
  }

  private case class Rect(x0: Double, y0: Double, x1: Double, y1: Double) {
    def ring: Ring = Seq((x0, y0), (x1, y0), (x1, y1), (x0, y1))
    def poly: Polygon = Seq(ring)
    def overlaps(o: Rect): Boolean = // closed rectangles: touching counts
      x0 <= o.x1 && x1 >= o.x0 && y0 <= o.y1 && y1 >= o.y0
    def containsRect(o: Rect): Boolean =
      x0 <= o.x0 && x1 >= o.x1 && y0 <= o.y0 && y1 >= o.y1
    def area: Double = (x1 - x0) * (y1 - y0)
  }

  private val coord = Gen.chooseNum(-50, 50).map(_.toDouble / 2.0)
  private val rect: Gen[Rect] = for {
    a <- coord; b <- coord if b > a
    c <- coord; d <- coord if d > c
  } yield Rect(a, c, b, d)

  test("rectangle intersects matches interval arithmetic") {
    forAll2(rect) { (r1, r2) =>
      assert(polygonIntersects(r1.poly, r2.poly) == r1.overlaps(r2),
        s"$r1 vs $r2")
    }
  }

  test("rectangle containment matches interval arithmetic; contains implies intersects") {
    forAll2(rect) { (r1, r2) =>
      val c = polygonContains(r1.poly, r2.poly)
      assert(c == r1.containsRect(r2), s"$r1 contains $r2")
      if (c) assert(polygonIntersects(r1.poly, r2.poly))
    }
  }

  test("rectangle area matches width×height; symmetric intersects") {
    forAll2(rect) { (r1, r2) =>
      assert(math.abs(ringArea(r1.ring) - r1.area) < 1e-9)
      assert(polygonIntersects(r1.poly, r2.poly) == polygonIntersects(r2.poly, r1.poly))
    }
  }
}
