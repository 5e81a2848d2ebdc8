package graft

import graft.spatial.GeometryOps

/** Independent-oracle corpus for the geometry predicates and the
  * constructive area ops — the reference's shapely cross-check
  * (tests/geos/oracle.py + oracle-tests.lisp) ported to pure-Scala
  * independent algorithms, since no geometry kernel ships here:
  *
  *   - intersects  vs the separating-axis theorem (convex-exact,
  *     closed-set: touching counts)
  *   - contains    vs all-vertices-inside-by-orientation-signs
  *     (exact for convex containers)
  *   - areas       vs a deterministic grid-sampling integrator and
  *     exact algebraic identities
  *
  * Each check pits a DIFFERENT algorithm against the implementation
  * over a seeded random corpus — agreement cross-validates both, the
  * same idea as shapely's independently-bundled GEOS.
  */
class GeometryOracleSpec extends SparkSpec {

  type Pt = (Double, Double)
  type Ring = Seq[Pt]

  // --- corpus: seeded random convex polygons (Andrew monotone chain) ---

  private def convexHull(pts: Seq[Pt]): Ring = {
    val sorted = pts.distinct.sortBy(identity)
    if (sorted.size < 3) return sorted
    def cross(o: Pt, a: Pt, b: Pt) =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    def half(ps: Seq[Pt]): List[Pt] =
      ps.foldLeft(List.empty[Pt]) { (acc, p) =>
        var h = acc
        while (h.size >= 2 && cross(h(1), h.head, p) <= 0) h = h.tail
        p :: h
      }
    val lower = half(sorted).tail.reverse
    val upper = half(sorted.reverse).tail.reverse
    lower ++ upper
  }

  private val rng = new scala.util.Random(20260812)

  private def randomConvex(cx: Double, cy: Double, r: Double): Ring =
    convexHull(Seq.fill(12)((cx + (rng.nextDouble() * 2 - 1) * r,
      cy + (rng.nextDouble() * 2 - 1) * r)))

  private val corpus: Seq[(Ring, Ring)] = {
    val rand = Seq.fill(120) {
      // mix of disjoint, overlapping and nested placements
      val a = randomConvex(0, 0, 10)
      val b = rng.nextInt(3) match {
        case 0 => randomConvex(rng.nextDouble() * 40 - 20, rng.nextDouble() * 40 - 20, 8)
        case 1 => randomConvex(rng.nextDouble() * 6 - 3, rng.nextDouble() * 6 - 3, 4)
        case _ => randomConvex(0, 0, 3) // likely contained
      }
      (a, b)
    }
    val crafted: Seq[(Ring, Ring)] = Seq(
      // identical
      (Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)),
        Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))),
      // shared full edge (touching, zero-area overlap)
      (Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)),
        Seq((4.0, 0.0), (8.0, 0.0), (8.0, 4.0), (4.0, 4.0))),
      // single shared vertex
      (Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)),
        Seq((4.0, 4.0), (8.0, 4.0), (8.0, 8.0), (4.0, 8.0))),
      // clearly disjoint
      (Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)),
        Seq((10.0, 10.0), (14.0, 10.0), (14.0, 14.0), (10.0, 14.0))),
      // strict containment
      (Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)),
        Seq((2.0, 2.0), (5.0, 2.0), (5.0, 5.0), (2.0, 5.0))),
      // containment touching the boundary (closed-set: still contained)
      (Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)),
        Seq((0.0, 0.0), (5.0, 0.0), (5.0, 5.0), (0.0, 5.0))))
    rand ++ crafted
  }

  // --- independent algorithms ---

  /** Convex intersects via separating axis: disjoint iff some edge
    * normal of either polygon strictly separates the vertex sets.
    */
  private def satIntersects(a: Ring, b: Ring): Boolean = {
    def axes(r: Ring) = (r :+ r.head).sliding(2).map { e =>
      (-(e(1)._2 - e(0)._2), e(1)._1 - e(0)._1)
    }.toSeq
    def proj(r: Ring, ax: (Double, Double)) = {
      val ds = r.map(p => p._1 * ax._1 + p._2 * ax._2)
      (ds.min, ds.max)
    }
    (axes(a) ++ axes(b)).forall { ax =>
      val (amin, amax) = proj(a, ax); val (bmin, bmax) = proj(b, ax)
      amax >= bmin && bmax >= amin // closed sets: touching = intersecting
    }
  }

  /** Convex containment: every vertex of b on the inner side (or on)
    * of every edge of CCW-normalized a.
    */
  private def vertexContains(a: Ring, b: Ring): Boolean = {
    val ccw = if (GeometryOps.signedArea(a) < 0) a.reverse else a
    (ccw :+ ccw.head).sliding(2).forall { e =>
      b.forall { p =>
        (e(1)._1 - e(0)._1) * (p._2 - e(0)._2) -
          (e(1)._2 - e(0)._2) * (p._1 - e(0)._1) >= -1e-9
      }
    }
  }

  /** Deterministic grid integrator over the joint bbox. */
  private def gridArea(inside: Pt => Boolean, rings: Seq[Ring], steps: Int = 400): Double = {
    val pts = rings.flatten
    val (xs, ys) = (pts.map(_._1), pts.map(_._2))
    val (x0, x1, y0, y1) = (xs.min, xs.max, ys.min, ys.max)
    val (dx, dy) = ((x1 - x0) / steps, (y1 - y0) / steps)
    if (dx == 0 || dy == 0) return 0.0
    var n = 0L
    var i = 0
    while (i < steps) {
      var j = 0
      while (j < steps) {
        if (inside((x0 + (i + 0.5) * dx, y0 + (j + 0.5) * dy))) n += 1
        j += 1
      }
      i += 1
    }
    n * dx * dy
  }

  private def inConvex(r: Ring)(p: Pt): Boolean = vertexContains(r, Seq(p))

  // --- the oracle gates ---

  test("polygonIntersects agrees with the separating-axis oracle on the corpus") {
    var checked = 0
    corpus.foreach { case (a, b) =>
      if (a.size >= 3 && b.size >= 3) {
        assert(GeometryOps.polygonIntersects(Seq(a), Seq(b)) == satIntersects(a, b),
          s"intersects mismatch:\nA=$a\nB=$b")
        checked += 1
      }
    }
    assert(checked > 100)
  }

  test("polygonContains agrees with the vertex-sign oracle on the corpus") {
    corpus.foreach { case (a, b) =>
      if (a.size >= 3 && b.size >= 3) {
        assert(GeometryOps.polygonContains(Seq(a), Seq(b)) == vertexContains(a, b),
          s"contains mismatch:\nA=$a\nB=$b")
      }
    }
  }

  test("constructive intersection/union area: identities and grid-integrator agreement") {
    // identities, exact
    val sq = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))
    assert(math.abs(GeometryOps.convexIntersectionArea(sq, sq) - 16.0) < 1e-9)
    val inner = Seq((1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0))
    assert(math.abs(GeometryOps.convexIntersectionArea(sq, inner) - 1.0) < 1e-9)
    assert(math.abs(GeometryOps.convexUnionArea(sq, inner) - 16.0) < 1e-9)
    val far = Seq((100.0, 100.0), (101.0, 100.0), (101.0, 101.0), (100.0, 101.0))
    assert(GeometryOps.convexIntersectionArea(sq, far) == 0.0)
    assert(math.abs(GeometryOps.convexUnionArea(sq, far) - 17.0) < 1e-9)
    // half-overlapping unit squares
    val s1 = Seq((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0))
    val s2 = Seq((1.0, 0.0), (3.0, 0.0), (3.0, 2.0), (1.0, 2.0))
    assert(math.abs(GeometryOps.convexIntersectionArea(s1, s2) - 2.0) < 1e-9)
    assert(math.abs(GeometryOps.convexUnionArea(s1, s2) - 6.0) < 1e-9)

    // corpus vs the grid integrator (independent numeric method)
    var nonTrivial = 0
    corpus.take(60).foreach { case (a, b) =>
      if (a.size >= 3 && b.size >= 3) {
        val exact = GeometryOps.convexIntersectionArea(a, b)
        val approx = gridArea(p => inConvex(a)(p) && inConvex(b)(p), Seq(a, b))
        val scale = math.max(1.0, math.max(GeometryOps.ringArea(a), GeometryOps.ringArea(b)))
        assert(math.abs(exact - approx) / scale < 0.02,
          s"area mismatch exact=$exact grid=$approx\nA=$a\nB=$b")
        if (exact > 0) nonTrivial += 1
        // inclusion–exclusion always holds
        val u = GeometryOps.convexUnionArea(a, b)
        assert(math.abs(u - (GeometryOps.ringArea(a) + GeometryOps.ringArea(b) - exact)) < 1e-9)
      }
    }
    assert(nonTrivial > 10)
  }

  // --- non-convex constructive areas -----------------------------------

  /** Random star-shaped polygon: random radii at sorted angles around a
    * center — always simple, almost always non-convex.
    */
  private def randomStar(cx: Double, cy: Double, rMin: Double, rMax: Double,
      nPts: Int): Ring = {
    val angles = Seq.fill(nPts)(rng.nextDouble() * 2 * math.Pi).sorted
    // drop near-duplicate angles (degenerate spikes)
    val distinct = angles.foldLeft(List.empty[Double]) {
      case (acc, a) if acc.nonEmpty && a - acc.head < 1e-3 => acc
      case (acc, a) => a :: acc
    }.reverse
    distinct.map { a =>
      val r = rMin + rng.nextDouble() * (rMax - rMin)
      (cx + r * math.cos(a), cy + r * math.sin(a))
    }
  }

  test("triangulation: area of the pieces sums to the ring area") {
    (1 to 40).foreach { _ =>
      val ring = randomStar(0, 0, 2, 10, 14)
      val tris = GeometryOps.triangulate(ring)
      assert(tris.nonEmpty)
      val sum = tris.map(GeometryOps.ringArea).sum
      assert(math.abs(sum - GeometryOps.ringArea(ring)) < 1e-6 * math.max(1.0, sum),
        s"triangulation area mismatch for $ring")
    }
    // L-shape (the canonical non-convex case): exact
    val ell = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0), (2.0, 4.0), (0.0, 4.0))
    val tris = GeometryOps.triangulate(ell)
    assert(math.abs(tris.map(GeometryOps.ringArea).sum - 12.0) < 1e-9)
  }

  test("non-convex intersection/union area agrees with the grid integrator") {
    import GeometryOps._
    // exact crafted cases first: two interlocking L-shapes
    val ell1 = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0), (2.0, 4.0), (0.0, 4.0))
    val ell2 = ell1.map(p => (4.0 - p._1, 4.0 - p._2)) // rotated copy filling the notch
    assert(math.abs(polygonArea(Seq(ell1)) - 12.0) < 1e-9)
    // the two Ls overlap on two 2x2 squares: area 8
    assert(math.abs(intersectionArea(Seq(ell1), Seq(ell2)) - 8.0) < 1e-9)
    assert(math.abs(unionArea(Seq(ell1), Seq(ell2)) - 16.0) < 1e-9)
    assert(math.abs(differenceArea(Seq(ell1), Seq(ell2)) - 4.0) < 1e-9)
    // self-intersection = own area; disjoint = 0
    assert(math.abs(intersectionArea(Seq(ell1), Seq(ell1)) - 12.0) < 1e-9)
    val far = Seq((100.0, 0.0), (104.0, 0.0), (104.0, 4.0), (100.0, 4.0))
    assert(intersectionArea(Seq(ell1), Seq(far)) == 0.0)

    // polygons with holes: ring with a square hole vs an offset square
    val outer = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0))
    val hole = Seq((3.0, 3.0), (7.0, 3.0), (7.0, 7.0), (3.0, 7.0))
    val donut: GeometryOps.Polygon = Seq(outer, hole)
    assert(math.abs(polygonArea(donut) - 84.0) < 1e-9)
    assert(math.abs(intersectionArea(donut, donut) - 84.0) < 1e-9)
    val probe = Seq((2.0, 2.0), (8.0, 2.0), (8.0, 8.0), (2.0, 8.0)) // 36, minus the 16 hole
    assert(math.abs(intersectionArea(donut, Seq(probe)) - 20.0) < 1e-9)
    assert(math.abs(unionArea(donut, Seq(probe)) - 100.0) < 1e-9)

    // seeded random star corpus vs the grid integrator
    var nonTrivial = 0
    (1 to 30).foreach { _ =>
      val a = randomStar(0, 0, 3, 10, 14)
      val b = rng.nextInt(2) match {
        case 0 => randomStar(rng.nextDouble() * 12 - 6, rng.nextDouble() * 12 - 6, 2, 8, 12)
        case _ => randomStar(0, 0, 1, 5, 10)
      }
      if (a.size >= 3 && b.size >= 3) {
        val exact = intersectionArea(Seq(a), Seq(b))
        // stars have high perimeter-to-area, so the integrator needs a
        // finer grid than the convex corpus for the same tolerance
        val approx = gridArea(
          p => graft.spatial.Geohash.pointInPolygon(p._1, p._2, Seq(a)) &&
            graft.spatial.Geohash.pointInPolygon(p._1, p._2, Seq(b)), Seq(a, b), steps = 800)
        val scale = math.max(1.0, math.max(ringArea(a), ringArea(b)))
        assert(math.abs(exact - approx) / scale < 0.02,
          s"non-convex area mismatch exact=$exact grid=$approx\nA=$a\nB=$b")
        if (exact > 0) nonTrivial += 1
        assert(math.abs(unionArea(Seq(a), Seq(b)) -
          (ringArea(a) + ringArea(b) - exact)) < 1e-9)
      }
    }
    assert(nonTrivial > 5)

    // donut corpus: random star with a scaled-down copy as its hole
    (1 to 15).foreach { _ =>
      val outerR = randomStar(0, 0, 6, 12, 12)
      val holeR = outerR.map(p => (p._1 * 0.3, p._2 * 0.3))
      val d: GeometryOps.Polygon = Seq(outerR, holeR)
      val b = randomStar(rng.nextDouble() * 8 - 4, rng.nextDouble() * 8 - 4, 2, 7, 10)
      val exact = intersectionArea(d, Seq(b))
      val approx = gridArea(
        p => graft.spatial.Geohash.pointInPolygon(p._1, p._2, d) &&
          graft.spatial.Geohash.pointInPolygon(p._1, p._2, Seq(b)), Seq(outerR, b), steps = 800)
      val scale = math.max(1.0, math.max(polygonArea(d), ringArea(b)))
      assert(math.abs(exact - approx) / scale < 0.02,
        s"donut area mismatch exact=$exact grid=$approx")
    }
  }

  test("overlay geometry output: Greiner-Hormann pieces satisfy the area identities") {
    import GeometryOps._
    def piecesAbsArea(ps: Seq[GeometryOps.Ring]): Double = ps.map(ringArea).sum
    def piecesSignedArea(ps: Seq[GeometryOps.Ring]): Double = ps.map(signedArea).sum

    // crafted proper-crossing case: offset overlapping rectangles
    val s1 = Seq((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0))
    val s2 = Seq((1.0, 0.5), (3.0, 0.5), (3.0, 1.5), (1.0, 1.5))
    val inter12 = overlayIntersection(s1, s2)
    assert(inter12.size == 1 && math.abs(piecesAbsArea(inter12) - 1.0) < 1e-9)
    val union12 = overlayUnion(s1, s2)
    assert(math.abs(math.abs(piecesSignedArea(union12)) - 5.0) < 1e-9)

    // containment and disjoint (no crossings)
    val inner = Seq((0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5))
    assert(piecesAbsArea(overlayIntersection(s1, inner)) == 1.0)
    assert(piecesAbsArea(overlayUnion(s1, inner)) == 4.0)
    val far = Seq((10.0, 10.0), (11.0, 10.0), (11.0, 11.0), (10.0, 11.0))
    assert(overlayIntersection(s1, far).isEmpty)
    assert(piecesAbsArea(overlayUnion(s1, far)) == 5.0)

    // union that CREATES a hole: a U-shape capped by a bar. The hole
    // ring must come out opposite-signed so the signed sum is the area.
    val u = Seq((0.0, 0.0), (6.0, 0.0), (6.0, 4.0), (4.0, 4.0), (4.0, 2.0),
      (2.0, 2.0), (2.0, 4.0), (0.0, 4.0))
    val bar = Seq((1.0, 3.0), (5.0, 3.0), (5.0, 5.0), (1.0, 5.0))
    val uInter = overlayIntersection(u, bar)
    assert(uInter.size == 2 && math.abs(piecesAbsArea(uInter) - 2.0) < 1e-9)
    val uUnion = overlayUnion(u, bar)
    assert(math.abs(math.abs(piecesSignedArea(uUnion)) - unionArea(Seq(u), Seq(bar))) < 1e-9)
    assert(math.abs(math.abs(piecesSignedArea(uUnion)) - 26.0) < 1e-9)
    assert(uUnion.size == 2, "capped U must emit an outer ring and a hole ring")

    // corpus: every pair must produce output whose area matches the
    // independent exact area tier (GH fast path or robust fallback)
    val pairs = corpus.take(60).map { case (x, y) => (x, y) } ++
      (1 to 30).map { _ =>
        (randomStar(0, 0, 3, 10, 14),
          randomStar(rng.nextDouble() * 12 - 6, rng.nextDouble() * 12 - 6, 2, 8, 12))
      }
    pairs.foreach { case (x, y) =>
      if (x.size >= 3 && y.size >= 3) {
        val expectedI = intersectionArea(Seq(x), Seq(y))
        val expectedU = unionArea(Seq(x), Seq(y))
        val scale = math.max(1.0, math.max(ringArea(x), ringArea(y)))
        val ip = overlayIntersection(x, y)
        val up = overlayUnion(x, y)
        assert(math.abs(piecesAbsArea(ip) - expectedI) / scale < 1e-6,
          s"intersection overlay area=${piecesAbsArea(ip)} expected=$expectedI\nA=$x\nB=$y")
        assert(math.abs(math.abs(piecesSignedArea(up)) - expectedU) / scale < 1e-6,
          s"union overlay area=${piecesSignedArea(up)} expected=$expectedU\nA=$x\nB=$y")
      }
    }
  }

  test("robust overlay: degenerate boundary contact and holed inputs match the exact tier") {
    import GeometryOps._
    def check(a: GeometryOps.Polygon, b: GeometryOps.Polygon, label: String): Unit = {
      val scale = math.max(1.0, math.max(polygonArea(a), polygonArea(b)))
      val ops = Seq(
        (OpIntersection, intersectionArea(a, b)),
        (OpUnion, unionArea(a, b)),
        (OpDifference, differenceArea(a, b)))
      ops.foreach { case (op, expected) =>
        val got = overlayArea(overlay(a, b, op))
        assert(math.abs(got - expected) / scale < 1e-9,
          s"$label $op: overlay area=$got expected=$expected")
      }
    }
    val sq = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))
    // identical rings
    check(Seq(sq), Seq(sq), "identical")
    // collinear shared edge (adjacent squares): zero-area intersection
    check(Seq(sq), Seq(Seq((4.0, 0.0), (8.0, 0.0), (8.0, 4.0), (4.0, 4.0))), "shared-edge")
    assert(overlay(Seq(sq),
      Seq(Seq((4.0, 0.0), (8.0, 0.0), (8.0, 4.0), (4.0, 4.0))), OpIntersection).isEmpty)
    // shared corner
    check(Seq(sq), Seq(Seq((4.0, 4.0), (8.0, 4.0), (8.0, 8.0), (4.0, 8.0))), "shared-vertex")
    // vertex-on-edge contact (diamond kissing a square edge)
    check(Seq(sq), Seq(Seq((4.0, 2.0), (6.0, 0.0), (8.0, 2.0), (6.0, 4.0))), "vertex-on-edge")
    // partial collinear overlap with real area
    check(Seq(sq), Seq(Seq((2.0, 0.0), (6.0, 0.0), (6.0, 2.0), (2.0, 2.0))), "collinear-overlap")
    // holed subject × clip overlapping the hole
    val holed: GeometryOps.Polygon = Seq(sq, Seq((1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0)))
    check(holed, Seq(Seq((2.0, 2.0), (6.0, 2.0), (6.0, 6.0), (2.0, 6.0))), "holed-subject")
    // holed × holed, edges of the clip collinear with the hole
    val holedB: GeometryOps.Polygon = Seq(
      Seq((1.0, 1.0), (7.0, 1.0), (7.0, 7.0), (1.0, 7.0)),
      Seq((3.0, 3.0), (5.0, 3.0), (5.0, 5.0), (3.0, 5.0)))
    check(holed, holedB, "holed-x-holed")
    // containment with boundary contact (inner square sharing the
    // outer's bottom edge)
    check(Seq(sq), Seq(Seq((1.0, 0.0), (3.0, 0.0), (3.0, 2.0), (1.0, 2.0))), "contained-touching")
    // hole boundary must come out CW in the intersection output
    val interHoled = overlay(holed,
      Seq(Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))), OpIntersection)
    assert(interHoled.exists(r => signedArea(r) < 0),
      "intersection of a holed polygon with a cover must emit a CW hole ring")
    // randomized holed corpus: donut × star at varied offsets
    (1 to 25).foreach { i =>
      val outer = randomStar(0, 0, 5, 10, 12)
      val hole = outer.map(p => (p._1 * 0.35, p._2 * 0.35))
      val donut: GeometryOps.Polygon = Seq(outer, hole)
      val clip = Seq(randomStar(rng.nextDouble() * 10 - 5, rng.nextDouble() * 10 - 5, 2, 6, 10))
      check(donut, clip, s"donut-star-$i")
    }
  }

  test("buffer: arc-sampled dilation matches area expansion and membership") {
    import GeometryOps._
    // convex case: buffered area = A + P·r + (approximated) π r²
    val sq = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))
    val r = 1.5
    val buf = buffer(Seq(sq), r, arcSegments = 8)
    val got = overlayArea(buf)
    val exactDisk = math.Pi * r * r
    assert(got >= 16.0 + 16.0 * r + 0.97 * exactDisk - 1e-9 &&
      got <= 16.0 + 16.0 * r + exactDisk + 1e-9,
      s"buffered square area $got outside the arc-sampling band")
    // membership: dilation is a superset; points within r of the
    // boundary are in, points beyond r are out
    def inBuf(x: Double, y: Double): Boolean =
      buf.count(ring => graft.spatial.Geohash.pointInRing(x, y, ring)) % 2 == 1
    assert(inBuf(2.0, 2.0) && inBuf(-r * 0.9, 2.0) && inBuf(4.0 + r * 0.9, 2.0))
    assert(!inBuf(4.0 + r * 1.1, 2.0) && !inBuf(-r * 1.1, -r * 1.1))
    // holed polygon: the hole SHRINKS by r (its boundary dilates inward)
    val holed: GeometryOps.Polygon = Seq(
      Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)),
      Seq((3.0, 3.0), (7.0, 3.0), (7.0, 7.0), (3.0, 7.0)))
    val hb = buffer(holed, 1.0, arcSegments = 8)
    def inHb(x: Double, y: Double): Boolean =
      hb.count(ring => graft.spatial.Geohash.pointInRing(x, y, ring)) % 2 == 1
    assert(inHb(3.5, 5.0), "point within r inside the old hole must now be covered")
    assert(!inHb(5.0, 5.0), "the hole center (beyond r of any boundary) stays open")
    assert(hb.exists(ring => signedArea(ring) < 0), "buffered holed polygon keeps a hole ring")
    // zero radius is identity (area-wise)
    assert(math.abs(overlayArea(buffer(Seq(sq), 0.0)) - 16.0) < 1e-9)
  }

  test("linestring and multipolygon kinds: lengths, distances, containment") {
    import GeometryOps._
    // multipolygon = disjoint parts; area sums, containment is any-part
    val sq1: GeometryOps.Ring = Seq((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0))
    val sq2: GeometryOps.Ring = Seq((10.0, 0.0), (13.0, 0.0), (13.0, 3.0), (10.0, 3.0))
    val mp = Seq(Seq(sq1), Seq(sq2))
    assert(math.abs(multiPolygonArea(mp) - 13.0) < 1e-9)
    assert(multiPolygonContainsPoint(1.0, 1.0, mp))
    assert(multiPolygonContainsPoint(11.0, 1.0, mp))
    assert(!multiPolygonContainsPoint(5.0, 1.0, mp))
    assert(multiPolygonIntersects(mp, Seq(Seq(Seq((1.0, 1.0), (12.0, 1.0), (12.0, 1.5), (1.0, 1.5))))))
    assert(!multiPolygonIntersects(Seq(Seq(sq1)), Seq(Seq(sq2))))

    // linestring: planar length exact; geodesic length matches a
    // 1-degree equatorial segment (~111.19 km per great-circle degree)
    val line: LineString = Seq((0.0, 0.0), (3.0, 4.0), (3.0, 10.0))
    assert(math.abs(lineLength(line) - 11.0) < 1e-9)
    val equator1deg = geodesicLineLengthM(Seq((0.0, 0.0), (1.0, 0.0)))
    assert(math.abs(equator1deg - 2 * math.Pi * 6371000.0 / 360.0) < 1.0)

    // point-segment distance: projection interior, clamped ends, on-line
    assert(math.abs(pointToSegmentDistance(1.0, 1.0, (0.0, 0.0), (2.0, 0.0)) - 1.0) < 1e-9)
    assert(math.abs(pointToSegmentDistance(5.0, 4.0, (0.0, 0.0), (2.0, 0.0)) - 5.0) < 1e-9)
    assert(pointToLineDistance(3.0, 7.0, line) == 0.0)
    // vs a brute-force sampled oracle over the segments
    val rng2 = new scala.util.Random(5)
    (1 to 50).foreach { _ =>
      val (px, py) = (rng2.nextDouble() * 12 - 1, rng2.nextDouble() * 12 - 1)
      val brute = line.sliding(2).flatMap { s =>
        (0 to 1000).map { i =>
          val t = i / 1000.0
          math.hypot(px - (s(0)._1 + t * (s(1)._1 - s(0)._1)),
            py - (s(0)._2 + t * (s(1)._2 - s(0)._2)))
        }
      }.min
      // sampled oracle resolution: up to segLen/(2*1000) ~ 3e-3
      assert(math.abs(pointToLineDistance(px, py, line) - brute) < 5e-3)
    }

    // line × polygon: crossing, inside, touching, disjoint
    assert(lineIntersectsPolygon(Seq((-1.0, 1.0), (3.0, 1.0)), Seq(sq1))) // crosses
    assert(lineIntersectsPolygon(Seq((0.5, 0.5), (1.5, 1.5)), Seq(sq1))) // inside
    assert(lineIntersectsPolygon(Seq((2.0, -1.0), (2.0, 3.0)), Seq(sq1))) // edge touch
    assert(!lineIntersectsPolygon(Seq((5.0, 5.0), (8.0, 8.0)), Seq(sq1)))
  }
}
