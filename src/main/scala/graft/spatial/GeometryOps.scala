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
  * is emitted by a Greiner–Hormann clipper ([[overlayIntersection]] /
  * [[overlayUnion]]) for hole-free simple polygons with
  * proper-crossing boundaries; boundary-degenerate contact, holes-in,
  * and buffer stay gated (None), like the reference without its GEOS
  * FFI add-on.
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

  /** Intersection geometry of two hole-free simple polygons: disjoint
    * simple rings whose summed area equals [[intersectionArea]]. None
    * when the configuration is gated (degenerate boundary contact).
    */
  def overlayIntersection(a: Ring, b: Ring): Option[Seq[Ring]] =
    ghOverlay(a, b, union = false)

  /** Union geometry of two hole-free simple polygons: boundary rings
    * with holes emitted in opposite orientation, so the SIGNED area sum
    * equals [[unionArea]]. None when gated.
    */
  def overlayUnion(a: Ring, b: Ring): Option[Seq[Ring]] =
    ghOverlay(a, b, union = true)

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
