package graft.spatial

/** Exact geometry×geometry predicates — the capability the reference
  * only gets through its optional GEOS FFI add-on (reference
  * geometry-ops.lisp:94-190, geos/): intersects, contains, planar
  * area. Pure Scala (no native kernel): segment-intersection plus
  * ray-cast containment over simple polygons with holes, the same
  * polygon model as [[Geohash.pointInPolygon]] (rings.head = outer
  * ring, tail = holes).
  *
  * Constructive operations: intersection / union / difference AREA is
  * exact for arbitrary simple polygons with holes via ear-clipping
  * triangulation + signed pairwise convex clips ([[intersectionArea]])
  * — what the reference's query surface consumes (geometry-ops.lisp
  * composes GEOS intersection with area). The overlay GEOMETRY itself
  * comes from two tiers: a Greiner–Hormann clipper for the common
  * hole-free proper-crossing case, and a robust planar-arrangement
  * overlay ([[overlay]]) for everything it can't order — holes,
  * shared vertices, vertex-on-edge contact, collinear overlap —
  * plus an arc-sampled [[buffer]]. Together they cover the
  * reference's optional GEOS FFI tier in pure Scala.
  *
  * Scale shape: these are driver-usable pure functions AND UDF-able
  * per-row predicates; the intended plan is always cell/bbox pruning
  * first (SpatialOps / SpatialCellPruning), exact refine second, so
  * the O(edges²) test runs on candidates only.
  */
object GeometryOps {

  type Ring = Seq[(Double, Double)]
  type Polygon = Seq[Ring] // head = outer, tail = holes

  private def orient(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double): Int = {
    val v = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    if (v > 0) 1 else if (v < 0) -1 else 0
  }

  private def onSegment(ax: Double, ay: Double, bx: Double, by: Double,
      px: Double, py: Double): Boolean =
    math.min(ax, bx) <= px && px <= math.max(ax, bx) &&
      math.min(ay, by) <= py && py <= math.max(ay, by)

  /** Proper or improper (touching/collinear-overlap) intersection. */
  def segmentsIntersect(a1: (Double, Double), a2: (Double, Double),
      b1: (Double, Double), b2: (Double, Double)): Boolean = {
    val o1 = orient(a1._1, a1._2, a2._1, a2._2, b1._1, b1._2)
    val o2 = orient(a1._1, a1._2, a2._1, a2._2, b2._1, b2._2)
    val o3 = orient(b1._1, b1._2, b2._1, b2._2, a1._1, a1._2)
    val o4 = orient(b1._1, b1._2, b2._1, b2._2, a2._1, a2._2)
    if (o1 != o2 && o3 != o4) true
    else (o1 == 0 && onSegment(a1._1, a1._2, a2._1, a2._2, b1._1, b1._2)) ||
      (o2 == 0 && onSegment(a1._1, a1._2, a2._1, a2._2, b2._1, b2._2)) ||
      (o3 == 0 && onSegment(b1._1, b1._2, b2._1, b2._2, a1._1, a1._2)) ||
      (o4 == 0 && onSegment(b1._1, b1._2, b2._1, b2._2, a2._1, a2._2))
  }

  private def ringEdges(r: Ring): Iterator[((Double, Double), (Double, Double))] =
    if (r.size < 2) Iterator.empty
    else (r :+ r.head).sliding(2).map(p => (p(0), p(1)))

  def ringsCross(a: Ring, b: Ring): Boolean =
    ringEdges(a).exists { case (p1, p2) =>
      ringEdges(b).exists { case (q1, q2) => segmentsIntersect(p1, p2, q1, q2) }
    }

  /** PROPER crossing only: segment interiors pass through each other.
    * Touching endpoints and collinear overlaps do not count — the
    * distinction `contains` needs (a shared boundary edge is still
    * containment under closed-set semantics).
    */
  private def properCross(a1: (Double, Double), a2: (Double, Double),
      b1: (Double, Double), b2: (Double, Double)): Boolean = {
    val o1 = orient(a1._1, a1._2, a2._1, a2._2, b1._1, b1._2)
    val o2 = orient(a1._1, a1._2, a2._1, a2._2, b2._1, b2._2)
    val o3 = orient(b1._1, b1._2, b2._1, b2._2, a1._1, a1._2)
    val o4 = orient(b1._1, b1._2, b2._1, b2._2, a2._1, a2._2)
    o1 * o2 < 0 && o3 * o4 < 0
  }

  private def ringsProperlyCross(a: Ring, b: Ring): Boolean =
    ringEdges(a).exists { case (p1, p2) =>
      ringEdges(b).exists { case (q1, q2) => properCross(p1, p2, q1, q2) }
    }

  /** Is the point ON the ring's boundary (some edge passes through it)? */
  def pointOnRing(lon: Double, lat: Double, ring: Ring): Boolean =
    ringEdges(ring).exists { case (p1, p2) =>
      orient(p1._1, p1._2, p2._1, p2._2, lon, lat) == 0 &&
        onSegment(p1._1, p1._2, p2._1, p2._2, lon, lat)
    }

  /** Do two polygons (with holes) share any point? True on boundary
    * contact too (GEOS `intersects` semantics, geometry-ops.lisp:110).
    */
  def polygonIntersects(a: Polygon, b: Polygon): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    // any outer-ring edge crossing, or full containment one way or the
    // other (containment with holes: a vertex inside counts unless a
    // hole swallows the whole other polygon — hole crossings are edge
    // crossings and are caught above)
    ringsCross(a.head, b.head) ||
      b.head.exists(p => Geohash.pointInPolygon(p._1, p._2, a)) ||
      a.head.exists(p => Geohash.pointInPolygon(p._1, p._2, b))
  }

  /** Is every point of `b` inside-or-on `a`? (geometry-ops.lisp:130
    * contains-geometry, closed-set semantics: a shared boundary still
    * counts as contained). Conditions: every outer vertex of b inside
    * or on a's outer ring and not strictly inside a hole; no PROPER
    * edge crossing between b and any ring of a (touching/collinear
    * boundary contact is fine); no hole of a strictly inside b.
    */
  def polygonContains(a: Polygon, b: Polygon): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    def inOrOn(p: (Double, Double), ring: Ring): Boolean =
      Geohash.pointInRing(p._1, p._2, ring) || pointOnRing(p._1, p._2, ring)
    def strictlyIn(p: (Double, Double), ring: Ring): Boolean =
      Geohash.pointInRing(p._1, p._2, ring) && !pointOnRing(p._1, p._2, ring)
    b.head.forall(p => inOrOn(p, a.head)) &&
      b.head.forall(p => !a.tail.exists(h => strictlyIn(p, h))) &&
      !a.exists(ringA => ringsProperlyCross(ringA, b.head)) &&
      !a.tail.exists(h => h.nonEmpty && h.forall(p => strictlyIn(p, b.head)))
  }

  /** Planar (coordinate-space) signed shoelace area of a ring; polygon
    * area = |outer| − Σ|holes| (the reference's GEOS area is likewise
    * planar over raw coordinates).
    */
  def ringArea(r: Ring): Double =
    if (r.size < 3) 0.0
    else math.abs(ringEdges(r).map { case ((x1, y1), (x2, y2)) =>
      x1 * y2 - x2 * y1 }.sum) / 2.0

  def polygonArea(p: Polygon): Double =
    if (p.isEmpty) 0.0 else ringArea(p.head) - p.tail.map(ringArea).sum

  /** Signed shoelace area (positive = counter-clockwise). */
  def signedArea(r: Ring): Double =
    if (r.size < 3) 0.0
    else ringEdges(r).map { case ((x1, y1), (x2, y2)) => x1 * y2 - x2 * y1 }.sum / 2.0

  /** Sutherland–Hodgman: clip `subject` by a CONVEX `clip` ring.
    * Returns the clipped ring (possibly empty). With both rings convex
    * this yields the exact intersection polygon — the pure-Scala slice
    * of the constructive overlay the reference only gets through its
    * GEOS FFI add-on (reference geometry-ops.lisp:94-190; the full
    * non-convex overlay needs a geometry kernel and stays out, like
    * the reference without the add-on).
    */
  def convexClip(subject: Ring, clip: Ring): Ring = {
    require(clip.size >= 3, "clip ring needs >= 3 vertices")
    // normalize the clip ring to CCW so "inside" is a fixed orientation
    val c = if (signedArea(clip) < 0) clip.reverse else clip
    var out = subject.toVector
    val clipEdges = ringEdges(c).toVector
    for (((ex1, ey1), (ex2, ey2)) <- clipEdges if out.nonEmpty) {
      val in = out
      out = Vector.empty
      val n = in.size
      var i = 0
      while (i < n) {
        val cur = in(i)
        val prev = in((i + n - 1) % n)
        val curIn = orient(ex1, ey1, ex2, ey2, cur._1, cur._2) >= 0
        val prevIn = orient(ex1, ey1, ex2, ey2, prev._1, prev._2) >= 0
        if (curIn) {
          if (!prevIn) out :+= lineIntersect(prev, cur, (ex1, ey1), (ex2, ey2))
          out :+= cur
        } else if (prevIn) {
          out :+= lineIntersect(prev, cur, (ex1, ey1), (ex2, ey2))
        }
        i += 1
      }
    }
    out
  }

  /** Intersection point of segment pq with the INFINITE line through ab
    * (callers guarantee pq crosses it — the clipping invariant).
    */
  private def lineIntersect(p: (Double, Double), q: (Double, Double),
      a: (Double, Double), b: (Double, Double)): (Double, Double) = {
    val (px, py) = p; val (qx, qy) = q; val (ax, ay) = a; val (bx, by) = b
    // signed distances of p and q to line ab; the crossing divides pq
    // in their ratio
    val dp = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    val dq = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)
    val t = dp / (dp - dq)
    (px + t * (qx - px), py + t * (qy - py))
  }

  /** Exact intersection area of two CONVEX rings (constructive overlay
    * reduced to its scalar — geometry-ops.lisp:141 intersection +
    * area composition).
    */
  def convexIntersectionArea(a: Ring, b: Ring): Double =
    ringArea(convexClip(a, b))

  /** Union area of two CONVEX rings by inclusion–exclusion. */
  def convexUnionArea(a: Ring, b: Ring): Double =
    ringArea(a) + ringArea(b) - convexIntersectionArea(a, b)

  // --- constructive boolean areas for ARBITRARY simple polygons ------
  //
  // The convex pair above is exact but convex-only. General simple
  // polygons (non-convex, with holes) decompose by ear clipping into
  // triangles; since indicator functions satisfy
  //   1_P = Σ 1_{outer tris} − Σ 1_{hole tris}   (a.e.)
  // the intersection area is the signed sum of pairwise TRIANGLE
  // intersections, each of which is convex×convex and exact via
  // [[convexClip]]. This closes the constructive-op gap with the
  // reference's GEOS add-on (geometry-ops.lisp:141-190) for the area
  // ops, in pure Scala.

  /** Ear-clipping triangulation of a simple ring (CW or CCW; an
    * explicit closing vertex is tolerated). O(n²); geometry ops run on
    * pruned candidates, never as a scan stage. Degenerate inputs that
    * force a lossy vertex drop are logged once per ring — use
    * [[triangulateChecked]] to get the exactness flag programmatically.
    */
  def triangulate(ring0: Ring): Seq[Ring] = {
    val (tris, exact) = triangulateChecked(ring0)
    if (!exact)
      System.err.println(
        s"graft.GeometryOps.triangulate: degenerate ring (${ring0.size} vertices) " +
          "forced a non-collinear vertex drop — triangle areas are approximate")
    tris
  }

  /** Ear clipping with an exactness flag: `_2` is false iff a
    * NON-collinear vertex had to be dropped to make progress (a
    * self-touching or numerically degenerate ring), in which case the
    * triangles may under-cover the ring and derived boolean areas are
    * approximate for that input. Exactly-collinear drops lose zero
    * area and keep the flag true.
    */
  def triangulateChecked(ring0: Ring): (Seq[Ring], Boolean) = {
    var r: Ring = ring0
    if (r.size > 1 && r.head == r.last) r = r.init
    // consecutive duplicate coordinates contribute nothing and would
    // act as phantom blockers inside every candidate ear
    r = r.foldLeft(Vector.empty[(Double, Double)]) {
      case (acc, p) if acc.nonEmpty && acc.last == p => acc
      case (acc, p) => acc :+ p
    }
    if (r.size > 1 && r.head == r.last) r = r.init
    if (r.size < 3) return (Seq.empty, true)
    val ccw = if (signedArea(r) < 0) r.reverse else r
    val v = scala.collection.mutable.ArrayBuffer(ccw: _*)
    val out = Seq.newBuilder[Ring]
    var exact = true
    def o3(a: (Double, Double), b: (Double, Double), c: (Double, Double)): Int =
      orient(a._1, a._2, b._1, b._2, c._1, c._2)
    // closed-triangle membership for CCW (a,b,c)
    def inTri(p: (Double, Double), a: (Double, Double), b: (Double, Double),
        c: (Double, Double)): Boolean =
      o3(a, b, p) >= 0 && o3(b, c, p) >= 0 && o3(c, a, p) >= 0
    while (v.size > 3) {
      val n = v.size
      var ear = -1
      var i = 0
      while (i < n && ear < 0) {
        val a = v((i + n - 1) % n); val b = v(i); val c = v((i + 1) % n)
        if (o3(a, b, c) > 0) {
          // blocker test skips by INDEX only: a distinct vertex that
          // happens to share coordinates with a corner (a pinch point)
          // must still block the ear, or the output triangles overlap
          var blocked = false
          var j = 0
          while (j < n && !blocked) {
            if (j != i && j != (i + n - 1) % n && j != (i + 1) % n &&
                inTri(v(j), a, b, c)) blocked = true
            j += 1
          }
          if (!blocked) ear = i
        }
        i += 1
      }
      if (ear >= 0) {
        val n2 = v.size
        out += Seq(v((ear + n2 - 1) % n2), v(ear), v((ear + 1) % n2))
        v.remove(ear)
      } else {
        // no clean ear left. Dropping an EXACTLY-collinear vertex loses
        // zero area and guarantees progress; only if none exists do we
        // drop the flattest corner — a lossy step, surfaced via `exact`.
        (0 until n).find(i =>
            o3(v((i + n - 1) % n), v(i), v((i + 1) % n)) == 0) match {
          case Some(k) => v.remove(k)
          case None =>
            exact = false
            val k = (0 until n).minBy { i =>
              val a = v((i + n - 1) % n); val b = v(i); val c = v((i + 1) % n)
              math.abs((b._1 - a._1) * (c._2 - a._2) - (b._2 - a._2) * (c._1 - a._1))
            }
            v.remove(k)
        }
      }
    }
    if (v.size == 3) out += Seq(v(0), v(1), v(2))
    (out.result(), exact)
  }

  private def bbox(r: Ring): (Double, Double, Double, Double) =
    (r.map(_._1).min, r.map(_._2).min, r.map(_._1).max, r.map(_._2).max)

  /** Triangles of a polygon-with-holes, weighted +1 (outer) / −1
    * (hole), each carrying its precomputed bbox for pair pruning.
    */
  private def signedTriangles(p: Polygon)
      : Seq[(Ring, Double, (Double, Double, Double, Double))] = {
    def tris(r: Ring, s: Double) = triangulate(r).map(t => (t, s, bbox(t)))
    if (p.isEmpty) Seq.empty
    else tris(p.head, 1.0) ++ p.tail.flatMap(tris(_, -1.0))
  }

  /** Exact intersection area of two simple polygons (holes included,
    * convexity NOT required) — triangulate both, sum signed pairwise
    * convex clips.
    */
  def intersectionArea(p: Polygon, q: Polygon): Double = {
    val pt = signedTriangles(p)
    val qt = signedTriangles(q)
    var acc = 0.0
    pt.foreach { case (t1, s1, (ax0, ay0, ax1, ay1)) =>
      qt.foreach { case (t2, s2, (bx0, by0, bx1, by1)) =>
        if (ax1 >= bx0 && bx1 >= ax0 && ay1 >= by0 && by1 >= ay0)
          acc += s1 * s2 * ringArea(convexClip(t1, t2))
      }
    }
    acc
  }

  /** Union area by inclusion–exclusion (simple polygons, holes ok). */
  def unionArea(p: Polygon, q: Polygon): Double =
    polygonArea(p) + polygonArea(q) - intersectionArea(p, q)

  /** Difference area A(p \ q) — the third boolean the reference's GEOS
    * tier exposes (geometry-ops.lisp difference), as a scalar.
    */
  def differenceArea(p: Polygon, q: Polygon): Double =
    polygonArea(p) - intersectionArea(p, q)

  // --- constructive overlay OUTPUT (Greiner–Hormann) -----------------
  //
  // The boolean AREAS above are exact for arbitrary simple polygons
  // with holes. For the overlay GEOMETRY itself (the reference's
  // geos:intersection / geos:union returning polygons,
  // geometry-ops.lisp:141-190) this is a Greiner–Hormann clipper for
  // hole-free simple polygons: proper-crossing configurations are
  // handled exactly; boundary-degenerate input (shared vertices,
  // vertex-on-edge contact, collinear edge overlap) and holes return
  // None — still gated, like the reference without its GEOS FFI
  // add-on, and the caller falls back to the exact area tier.

  /** One traversal node of the Greiner–Hormann linked rings. */
  private final class GhNode(val x: Double, val y: Double, val isInt: Boolean) {
    var next: GhNode = _
    var prev: GhNode = _
    var nb: GhNode = _ // cross-link between the twin intersection nodes
    var entry = false
    var visited = false
  }

  private def ghNormalize(ring: Ring): IndexedSeq[(Double, Double)] = {
    var r = ring
    if (r.size > 1 && r.head == r.last) r = r.init
    (if (signedArea(r) < 0) r.reverse else r).toIndexedSeq
  }

  /** Boundary degeneracy gate: any vertex of one ring ON the other's
    * boundary (covers shared vertices, vertex-on-edge contact, and
    * collinear edge overlaps — a collinear overlap always puts some
    * endpoint on the other segment). GH cannot order such crossings.
    */
  private def ghDegenerate(a: Seq[(Double, Double)], b: Seq[(Double, Double)]): Boolean =
    a.exists(p => pointOnRing(p._1, p._2, b)) ||
      b.exists(p => pointOnRing(p._1, p._2, a))

  /** Intersection geometry of two simple polygons' outer rings:
    * disjoint simple rings whose SIGNED area sum equals
    * [[intersectionArea]] (region rings CCW, hole rings CW).
    * Proper-crossing configurations take the Greiner–Hormann fast
    * path; boundary-degenerate contact (shared vertices,
    * vertex-on-edge, collinear overlap) falls back to the robust
    * arrangement overlay ([[overlay]]).
    */
  def overlayIntersection(a: Ring, b: Ring): Seq[Ring] =
    ghOverlay(a, b, union = false)
      .getOrElse(overlay(Seq(a), Seq(b), OpIntersection))

  /** Union geometry of two simple polygons' outer rings: boundary
    * rings with holes emitted in opposite orientation, so the SIGNED
    * area sum equals [[unionArea]]. Same GH-fast-path / robust-fallback
    * split as [[overlayIntersection]].
    */
  def overlayUnion(a: Ring, b: Ring): Seq[Ring] =
    ghOverlay(a, b, union = true)
      .getOrElse(overlay(Seq(a), Seq(b), OpUnion))

  private def ghOverlay(a0: Ring, b0: Ring, union: Boolean): Option[Seq[Ring]] = {
    val a = ghNormalize(a0); val b = ghNormalize(b0)
    if (a.size < 3 || b.size < 3) return None
    if (ghDegenerate(a, b)) return None

    // proper pairwise edge crossings with their parametric positions
    final case class Inter(x: Double, y: Double, ai: Int, as: Double, bi: Int, bs: Double)
    val inters = scala.collection.mutable.ArrayBuffer.empty[Inter]
    var i = 0
    while (i < a.size) {
      val p1 = a(i); val p2 = a((i + 1) % a.size)
      var j = 0
      while (j < b.size) {
        val q1 = b(j); val q2 = b((j + 1) % b.size)
        val dx = p2._1 - p1._1; val dy = p2._2 - p1._2
        val ex = q2._1 - q1._1; val ey = q2._2 - q1._2
        val fx = q1._1 - p1._1; val fy = q1._2 - p1._2
        val denom = dx * ey - dy * ex
        if (denom != 0) {
          val s = (fx * ey - fy * ex) / denom
          val t = (fx * dy - fy * dx) / denom
          // strictly interior on both edges — endpoint hits were gated
          if (s > 0 && s < 1 && t > 0 && t < 1)
            inters += Inter(p1._1 + s * dx, p1._2 + s * dy, i, s, j, t)
        }
        j += 1
      }
      i += 1
    }

    if (inters.isEmpty) {
      // no boundary crossing: containment or disjoint
      val aInB = Geohash.pointInRing(a.head._1, a.head._2, b)
      val bInA = Geohash.pointInRing(b.head._1, b.head._2, a)
      return Some(
        if (union) {
          if (aInB) Seq(b) else if (bInA) Seq(a) else Seq(a, b)
        } else {
          if (aInB) Seq(a) else if (bInA) Seq(b) else Seq.empty
        })
    }

    // build the two circular lists with intersection nodes spliced in
    // (sorted along each edge), cross-linked between the lists
    val nodeA = scala.collection.mutable.HashMap.empty[Inter, GhNode]
    val nodeB = scala.collection.mutable.HashMap.empty[Inter, GhNode]
    def buildList(ring: IndexedSeq[(Double, Double)], byEdge: Int => Seq[Inter],
        reg: scala.collection.mutable.HashMap[Inter, GhNode]): Seq[GhNode] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[GhNode]
      ring.indices.foreach { e =>
        out += new GhNode(ring(e)._1, ring(e)._2, false)
        byEdge(e).foreach { it =>
          val n = new GhNode(it.x, it.y, true); reg(it) = n; out += n
        }
      }
      out.indices.foreach { k =>
        out(k).next = out((k + 1) % out.size)
        out(k).prev = out((k + out.size - 1) % out.size)
      }
      out.toSeq
    }
    val listA = buildList(a, e => inters.filter(_.ai == e).sortBy(_.as).toSeq, nodeA)
    val listB = buildList(b, e => inters.filter(_.bi == e).sortBy(_.bs).toSeq, nodeB)
    inters.foreach { it => nodeA(it).nb = nodeB(it); nodeB(it).nb = nodeA(it) }

    // entry/exit marking: walking from a vertex strictly outside the
    // other ring, crossings alternate entry→exit. Union flips both.
    def mark(list: Seq[GhNode], other: IndexedSeq[(Double, Double)]): Unit = {
      var entryStatus = !Geohash.pointInRing(list.head.x, list.head.y, other)
      if (union) entryStatus = !entryStatus
      list.foreach { n =>
        if (n.isInt) { n.entry = entryStatus; entryStatus = !entryStatus }
      }
    }
    mark(listA, b)
    mark(listB, a)

    // traverse: from each unvisited crossing, walk forward on entry /
    // backward on exit, switching rings at every crossing
    val result = Seq.newBuilder[Ring]
    nodeA.values.foreach { start =>
      if (!start.visited) {
        val ring = scala.collection.mutable.ArrayBuffer[(Double, Double)]((start.x, start.y))
        var cur: GhNode = start
        var guard = 4 * (listA.size + listB.size) // defensive bound
        var done = false
        while (!done && guard > 0) {
          guard -= 1
          cur.visited = true; cur.nb.visited = true
          if (cur.entry) {
            do { cur = cur.next; ring += ((cur.x, cur.y)) } while (!cur.isInt)
          } else {
            do { cur = cur.prev; ring += ((cur.x, cur.y)) } while (!cur.isInt)
          }
          if ((cur eq start) || (cur.nb eq start)) done = true
          else { cur.visited = true; cur.nb.visited = true; cur = cur.nb }
        }
        if (!done) return None // numeric inconsistency — gate, don't lie
        if (ring.nonEmpty && ring.last == ring.head) ring.remove(ring.size - 1)
        if (ring.size >= 3) result += ring.toSeq
      }
    }
    // normalize winding by geometric role: traversal direction depends
    // on which list a ring was entered from, so holes can come out
    // either way. A ring is a REGION piece iff an interior point lies
    // in the op's result set (A∪B / A∩B) → CCW; otherwise it bounds a
    // hole → CW. Winding is convention; the shape itself is what the
    // area identities in the spec check.
    Some(result.result().map { r =>
      val p = ghInteriorPoint(r)
      val inA = Geohash.pointInRing(p._1, p._2, a)
      val inB = Geohash.pointInRing(p._1, p._2, b)
      val isRegion = if (union) inA || inB else inA && inB
      val ccw = signedArea(r) > 0
      if (ccw == isRegion) r else r.reverse
    })
  }

  /** A point strictly inside a simple ring: the centroid of its largest
    * ear-clipped triangle.
    */
  private def ghInteriorPoint(r: Ring): (Double, Double) = {
    val tris = triangulate(r)
    if (tris.isEmpty) return r.head
    val t = tris.maxBy(ringArea)
    ((t(0)._1 + t(1)._1 + t(2)._1) / 3, (t(0)._2 + t(1)._2 + t(2)._2) / 3)
  }

  // --- robust overlay OUTPUT: planar-arrangement boolean ops ----------
  //
  // The general overlay (the reference's geos:intersection/union/
  // difference returning polygons, geometry-ops.lisp:141-190) for
  // ARBITRARY simple polygons with holes, including every boundary-
  // degenerate configuration the GH clipper gates: shared vertices,
  // vertex-on-edge contact, collinear edge overlap, and identical
  // rings. Classic arrangement construction (the same subdivision
  // Martinez–Rueda sweeps; done here by direct pairwise splitting —
  // geometry ops run on pruned candidates, never as a scan stage, so
  // O(edges²) is the right trade for robustness):
  //   1. split every input edge at every crossing and at every other
  //      edge's endpoint lying in its interior, so edges meet only at
  //      shared endpoints;
  //   2. dedup coincident sub-edges (collinear overlaps collapse);
  //   3. keep a sub-edge iff the op's result set (membership by
  //      even-odd parity per source ring set) differs across its two
  //      sides, oriented with the result interior on the LEFT;
  //   4. stitch kept edges into rings by the next-clockwise-edge face
  //      walk: region boundaries come out CCW, holes CW, so the SIGNED
  //      area sum equals the exact boolean area tier.

  sealed trait OverlayOp
  case object OpIntersection extends OverlayOp
  case object OpUnion extends OverlayOp
  case object OpDifference extends OverlayOp

  /** Signed area sum of an overlay output (region rings CCW positive,
    * hole rings CW negative) — the scalar the exact area tier states.
    */
  def overlayArea(rings: Seq[Ring]): Double = rings.map(signedArea).sum

  /** Robust boolean overlay of two polygons (or ring SETS under
    * even-odd membership — a multipolygon flattens to one set).
    * Returns disjoint simple rings: CCW = result region boundary,
    * CW = hole boundary; see [[overlayArea]].
    */
  def overlay(aRings0: Seq[Ring], bRings0: Seq[Ring], op: OverlayOp,
      epsFactor: Double = 1e-7): Seq[Ring] = {
    def clean(r: Ring): Ring = {
      var v = r
      if (v.size > 1 && v.head == v.last) v = v.init
      v.foldLeft(Vector.empty[(Double, Double)]) {
        case (acc, p) if acc.nonEmpty && acc.last == p => acc
        case (acc, p) => acc :+ p
      }
    }
    val aRings = aRings0.map(clean).filter(_.size >= 3)
    val bRings = bRings0.map(clean).filter(_.size >= 3)
    if (aRings.isEmpty && bRings.isEmpty) return Seq.empty

    val allPts = (aRings ++ bRings).flatten
    val scale = math.max(1.0,
      allPts.iterator.map(p => math.max(math.abs(p._1), math.abs(p._2))).max)
    // crossing points computed from different edge pairs through the
    // same geometric point differ in the last few ulps; snapping to a
    // POWER-OF-TWO grid (~1e-12·scale) merges them without perturbing
    // on-grid inputs (integers and dyadic fractions stay exact)
    val gridBits = math.max(1, 40 - math.ceil(math.log(scale) / math.log(2)).toInt)
    val grid = math.pow(2, gridBits)
    def snap(p: (Double, Double)): (Double, Double) =
      (math.rint(p._1 * grid) / grid, math.rint(p._2 * grid) / grid)

    final case class Seg(a: (Double, Double), b: (Double, Double))
    val segs: IndexedSeq[Seg] =
      (aRings ++ bRings).flatMap(r => ringEdges(r).map { case (p, q) => Seg(p, q) })
        .toIndexedSeq
    val splits = Array.fill(segs.size)(
      scala.collection.mutable.ArrayBuffer.empty[(Double, Double)])

    // interior-of-segment test for an exact endpoint of another edge
    def onInterior(s: Seg, p: (Double, Double)): Boolean =
      p != s.a && p != s.b &&
        orient(s.a._1, s.a._2, s.b._1, s.b._2, p._1, p._2) == 0 &&
        onSegment(s.a._1, s.a._2, s.b._1, s.b._2, p._1, p._2)

    var i = 0
    while (i < segs.size) {
      val si = segs(i)
      var j = i + 1
      while (j < segs.size) {
        val sj = segs(j)
        val dx = si.b._1 - si.a._1; val dy = si.b._2 - si.a._2
        val ex = sj.b._1 - sj.a._1; val ey = sj.b._2 - sj.a._2
        val fx = sj.a._1 - si.a._1; val fy = sj.a._2 - si.a._2
        val denom = dx * ey - dy * ex
        if (denom != 0) {
          val s = (fx * ey - fy * ex) / denom
          val t = (fx * dy - fy * dx) / denom
          if (s > 0 && s < 1 && t > 0 && t < 1) {
            val pt = snap((si.a._1 + s * dx, si.a._2 + s * dy))
            splits(i) += pt; splits(j) += pt
          }
        }
        if (onInterior(si, sj.a)) splits(i) += sj.a
        if (onInterior(si, sj.b)) splits(i) += sj.b
        if (onInterior(sj, si.a)) splits(j) += si.a
        if (onInterior(sj, si.b)) splits(j) += si.b
        j += 1
      }
      i += 1
    }

    // sub-edges, deduped as undirected point pairs
    def param(s: Seg, p: (Double, Double)): Double = {
      val dx = s.b._1 - s.a._1; val dy = s.b._2 - s.a._2
      if (math.abs(dx) >= math.abs(dy)) (p._1 - s.a._1) / dx else (p._2 - s.a._2) / dy
    }
    val minLen = scale * 1e-12
    val pieces = scala.collection.mutable.LinkedHashSet
      .empty[((Double, Double), (Double, Double))]
    segs.indices.foreach { k =>
      val s = segs(k)
      // endpoints snap too: tangency contacts (e.g. an arc vertex vs an
      // offset-rectangle corner) can differ by a few ulps — below the
      // grid they merge into one node instead of a dropped micro-piece
      val pts = (Vector(s.a, s.b) ++ splits(k)).map(snap).distinct.sortBy(param(s, _))
      pts.sliding(2).foreach {
        case Seq(p, q)
            if math.abs(p._1 - q._1) + math.abs(p._2 - q._2) > minLen =>
          pieces += (if (p._1 < q._1 || (p._1 == q._1 && p._2 < q._2)) (p, q) else (q, p))
        case _ =>
      }
    }

    // classification: result membership on each side of the piece
    def evenOdd(x: Double, y: Double, rings: Seq[Ring]): Boolean =
      rings.count(r => Geohash.pointInRing(x, y, r)) % 2 == 1
    def combine(inA: Boolean, inB: Boolean): Boolean = op match {
      case OpIntersection => inA && inB
      case OpUnion => inA || inB
      case OpDifference => inA && !inB
    }
    val eps = scale * epsFactor
    val kept = pieces.iterator.flatMap { case (p, q) =>
      val mx = (p._1 + q._1) / 2; val my = (p._2 + q._2) / 2
      val len = math.hypot(q._1 - p._1, q._2 - p._2)
      val nx = -(q._2 - p._2) / len; val ny = (q._1 - p._1) / len
      val resL = combine(evenOdd(mx + eps * nx, my + eps * ny, aRings),
        evenOdd(mx + eps * nx, my + eps * ny, bRings))
      val resR = combine(evenOdd(mx - eps * nx, my - eps * ny, aRings),
        evenOdd(mx - eps * nx, my - eps * ny, bRings))
      if (resL == resR) None
      else if (resL) Some((p, q)) // result interior on the left of p→q
      else Some((q, p))
    }.toVector

    // face walk: at each node continue with the next edge CLOCKWISE
    // from the reversed incoming direction — traces the face on the
    // left of every directed edge, each edge used exactly once
    val outgoing = scala.collection.mutable.HashMap
      .empty[(Double, Double), scala.collection.mutable.ArrayBuffer[(Double, Double)]]
    kept.foreach { case (p, q) =>
      outgoing.getOrElseUpdate(p,
        scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]) += q
    }
    val used = scala.collection.mutable.HashSet
      .empty[((Double, Double), (Double, Double))]
    val result = Seq.newBuilder[Ring]
    kept.foreach { start =>
      if (!used(start)) {
        val ring = scala.collection.mutable.ArrayBuffer[(Double, Double)](start._1)
        var cur = start
        var guard = kept.size + 1
        var closed = false
        while (!closed && guard > 0) {
          guard -= 1
          used += cur
          val (a, b) = cur
          if (b == start._1) closed = true
          else {
            ring += b
            val cands = outgoing.get(b).map(_.filter(c => !used((b, c))))
              .getOrElse(scala.collection.mutable.ArrayBuffer.empty)
            if (cands.isEmpty)
              throw new IllegalStateException(
                s"overlay stitch dead-ends at $b (numerically inconsistent input)")
            val thetaIn = math.atan2(a._2 - b._2, a._1 - b._1) // reversed incoming
            val next = cands.minBy { c =>
              val d = thetaIn - math.atan2(c._2 - b._2, c._1 - b._1)
              val m = d % (2 * math.Pi)
              if (m <= 0) m + 2 * math.Pi else m // clockwise rotation in (0, 2π]
            }
            cur = (b, next)
          }
        }
        if (!closed)
          throw new IllegalStateException(
            "overlay stitch failed to close a ring (numerically inconsistent input)")
        if (ring.size >= 3) result += ring.toSeq
      }
    }
    result.result()
  }

  /** [[overlay]] hardened for batch use: the even-odd side sampling at
    * eps-offset midpoints can misclassify a feature narrower than eps
    * (or a sample landing exactly on a boundary), after which the face
    * walk throws. Retrying the SAME input at a different eps moves every
    * sample point, which resolves such coincidences; inputs that fail
    * every tier are genuinely numerically inconsistent and rethrow the
    * last error for the caller to degrade per row (see the q91 UDF).
    */
  def overlayRobust(aRings: Seq[Ring], bRings: Seq[Ring], op: OverlayOp): Seq[Ring] = {
    // descending: a smaller eps resolves thin features, a larger one
    // escapes boundary-coincident samples; all stay ≫ the 2^-40 snap grid
    val tiers = Seq(1e-7, 2.3e-8, 6.1e-7, 4.7e-9)
    var last: Throwable = null
    tiers.foreach { e =>
      try return overlay(aRings, bRings, op, e)
      catch { case ex: IllegalStateException => last = ex }
    }
    throw last
  }

  /** Positive buffer (dilation) of a polygon with holes, arc-sampled —
    * the reference's optional GEOS-tier buffer (geometry-ops.lisp:
    * 94-190) as a pure-Scala constructive op. P ⊕ D_r = P ∪ (∂P ⊕ D_r):
    * the boundary dilation is the union of one rectangle per edge
    * (offset ±r) and one 4·arcSegments-gon disk per vertex, folded in
    * through the robust [[overlay]] union. Disk polygons are inscribed,
    * so the result under-covers each true arc by a factor
    * sin(θ)/θ ≈ 1 − (π/2m)²/6 of the arc area — the documented
    * arc-sampling tolerance.
    */
  def buffer(p: Polygon, r: Double, arcSegments: Int = 8): Seq[Ring] = {
    require(r >= 0, "buffer radius must be non-negative (erosion not supported)")
    val rings = p.filter(_.size >= 3)
    if (r == 0 || rings.isEmpty) return overlay(rings, Seq.empty, OpUnion)
    val m = math.max(8, 4 * arcSegments)
    val pieces = Seq.newBuilder[Ring]
    rings.foreach { ring =>
      ringEdges(ring).foreach { case (a, b) =>
        val len = math.hypot(b._1 - a._1, b._2 - a._2)
        if (len > 0) {
          val nx = -(b._2 - a._2) / len * r; val ny = (b._1 - a._1) / len * r
          pieces += Seq((a._1 + nx, a._2 + ny), (b._1 + nx, b._2 + ny),
            (b._1 - nx, b._2 - ny), (a._1 - nx, a._2 - ny))
        }
      }
      ring.foreach { v =>
        pieces += (0 until m).map { k =>
          val th = 2 * math.Pi * k / m
          (v._1 + r * math.cos(th), v._2 + r * math.sin(th))
        }
      }
    }
    pieces.result().foldLeft(overlay(rings, Seq.empty, OpUnion)) { (acc, piece) =>
      overlay(acc, Seq(piece), OpUnion)
    }
  }

  // --- the remaining geometry kinds of the reference's struct
  // (geometry.lisp:22-27: :point :linestring :polygon :multipolygon) ---

  type LineString = Ring          // open point sequence
  type MultiPolygon = Seq[Polygon]

  /** Multi-polygon area: disjoint-parts sum (geometry.lisp kind
    * :multipolygon; GEOS area over a collection).
    */
  def multiPolygonArea(mp: MultiPolygon): Double = mp.map(polygonArea).sum

  def multiPolygonContainsPoint(lon: Double, lat: Double, mp: MultiPolygon): Boolean =
    mp.exists(p => Geohash.pointInPolygon(lon, lat, p))

  def multiPolygonIntersects(a: MultiPolygon, b: MultiPolygon): Boolean =
    a.exists(pa => b.exists(pb => polygonIntersects(pa, pb)))

  /** Planar length of a linestring (open: no closing segment). */
  def lineLength(line: LineString): Double =
    if (line.size < 2) 0.0
    else line.sliding(2).map { p =>
      math.hypot(p(1)._1 - p(0)._1, p(1)._2 - p(0)._2)
    }.sum

  /** Geodesic (haversine, meters) length of a lon/lat linestring —
    * the same formula shape as SpatialOps.haversineM, driver-side.
    */
  def geodesicLineLengthM(line: LineString): Double = {
    def hav(a: (Double, Double), b: (Double, Double)): Double = {
      val dLat = math.toRadians(b._2 - a._2); val dLon = math.toRadians(b._1 - a._1)
      val s = math.pow(math.sin(dLat / 2), 2) +
        math.cos(math.toRadians(a._2)) * math.cos(math.toRadians(b._2)) *
          math.pow(math.sin(dLon / 2), 2)
      2 * 6371000.0 * math.asin(math.min(1.0, math.sqrt(s)))
    }
    if (line.size < 2) 0.0 else line.sliding(2).map(p => hav(p(0), p(1))).sum
  }

  /** Planar distance from a point to a segment (clamped projection). */
  def pointToSegmentDistance(lon: Double, lat: Double,
      a: (Double, Double), b: (Double, Double)): Double = {
    val (ax, ay) = a; val (bx, by) = b
    val dx = bx - ax; val dy = by - ay
    val len2 = dx * dx + dy * dy
    val t = if (len2 == 0) 0.0
      else math.max(0.0, math.min(1.0, ((lon - ax) * dx + (lat - ay) * dy) / len2))
    math.hypot(lon - (ax + t * dx), lat - (ay + t * dy))
  }

  /** Planar distance from a point to a linestring (0 on it). */
  def pointToLineDistance(lon: Double, lat: Double, line: LineString): Double =
    if (line.isEmpty) Double.PositiveInfinity
    else if (line.size == 1) math.hypot(lon - line.head._1, lat - line.head._2)
    else line.sliding(2).map(p => pointToSegmentDistance(lon, lat, p(0), p(1))).min

  /** Does a linestring touch/cross a polygon? Any segment crossing any
    * ring, or any point of the line inside the polygon.
    */
  def lineIntersectsPolygon(line: LineString, poly: Polygon): Boolean =
    line.exists(p => Geohash.pointInPolygon(p._1, p._2, poly)) ||
      (line.size >= 2 && poly.exists(ring =>
        line.sliding(2).exists(s => ringEdges(ring).exists { case (q1, q2) =>
          segmentsIntersect(s(0), s(1), q1, q2) })))
}
