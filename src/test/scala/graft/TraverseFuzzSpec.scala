package graft

import org.scalacheck.Gen

import graft.operators.Traverse

/** Differential fuzzing of the traversal tier: random graphs (cycles,
  * self-loops, parallel edges, isolated starts) run BOTH through
  * `Traverse` (iterative frontier-join loops under Catalyst) and
  * through driver-side interpreters that implement the reference's
  * traversal semantics directly (traverse.lisp:3-81 — BFS with a
  * global visited set, min-depth discovery, reverse path per node).
  * The interpreters are plain Scala collections with no Spark in them,
  * so the two sides share nothing but the inputs.
  *
  * What only fuzzing can reach here (the oracle suite runs traversals
  * on one fixed graph shape):
  *  - the hop-compression invariant: bfs over a 2^p-stride compressed
  *    relation must equal plain BFS for EVERY graph, including when
  *    maxDepth is not a multiple of the stride (overshoot + clamp);
  *  - Both-direction on graphs with parallel and self edges (the
  *    doubled relation must not corrupt min-depth);
  *  - multi-source starts where one start is reachable from another
  *    (it must stay at depth 0, not be re-discovered);
  *  - bfsPaths' per-round lexicographic-min tie-break (Spark's
  *    array<bigint> min vs an explicit driver comparator);
  *  - cheapestPaths' delta-relaxation (a node improved twice in
  *    different rounds must keep the final minimum).
  *
  * Same fixed-seed Gen walk as PatternFuzzSpec (the
  * scalatest-scalacheck bridge isn't on the classpath).
  */
class TraverseFuzzSpec extends SparkSpec {
  import spark.implicits._

  // ---- random graph programs ----
  private case class GraphProg(
      n: Int,
      edges: Seq[(Long, Long, Long)], // src, dst, w (long-valued weights: fp-exact)
      starts: Seq[Long],
      maxDepth: Int,
      direction: Traverse.Direction,
      hopPower: Int,
      prebuilt: Boolean)

  private val graphs: Gen[GraphProg] = for {
    n <- Gen.choose(6, 22)
    m <- Gen.choose(n / 2, n * 2)
    srcs <- Gen.listOfN(m, Gen.choose(1L, n.toLong))
    dsts <- Gen.listOfN(m, Gen.choose(1L, n.toLong)) // self-loops allowed
    ws <- Gen.listOfN(m, Gen.choose(1L, 9L))
    nStarts <- Gen.choose(1, 3)
    starts <- Gen.listOfN(nStarts, Gen.choose(1L, n.toLong))
    maxDepth <- Gen.choose(1, 6)
    direction <- Gen.oneOf(Traverse.Out, Traverse.In, Traverse.Both)
    hopPower <- Gen.oneOf(0, 0, 1, 2) // weighted toward the plain loop
    prebuilt <- Gen.oneOf(true, false)
  } yield GraphProg(n, srcs.lazyZip(dsts).lazyZip(ws).map((s, d, w) => (s, d, w)),
    starts.distinct, maxDepth, direction, hopPower, prebuilt && hopPower > 0)

  // ---- driver-side interpreters (no Spark) ----
  private def adjacency(edges: Seq[(Long, Long, Long)],
      dir: Traverse.Direction): Map[Long, Seq[Long]] = {
    val pairs = dir match {
      case Traverse.Out  => edges.map(e => (e._1, e._2))
      case Traverse.In   => edges.map(e => (e._2, e._1))
      case Traverse.Both => edges.map(e => (e._1, e._2)) ++ edges.map(e => (e._2, e._1))
    }
    pairs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
  }

  private def bfsDriver(edges: Seq[(Long, Long, Long)], starts: Seq[Long],
      maxDepth: Int, dir: Traverse.Direction): Map[Long, Int] = {
    val adj = adjacency(edges, dir)
    var depth = starts.map(_ -> 0).toMap
    var frontier = starts.toSet
    var d = 0
    while (d < maxDepth && frontier.nonEmpty) {
      d += 1
      val next = frontier.flatMap(u => adj.getOrElse(u, Nil)).diff(depth.keySet)
      depth ++= next.map(_ -> d)
      frontier = next
    }
    depth
  }

  private def pathLt(a: Vector[Long], b: Vector[Long]): Boolean = {
    // lexicographic, equal lengths by construction (same BFS round)
    val it = a.iterator.zip(b.iterator)
    while (it.hasNext) {
      val (x, y) = it.next()
      if (x != y) return x < y
    }
    a.length < b.length
  }

  private def bfsPathsDriver(edges: Seq[(Long, Long, Long)], starts: Seq[Long],
      maxDepth: Int, dir: Traverse.Direction): Map[Long, (Int, Vector[Long])] = {
    val adj = adjacency(edges, dir)
    var visited = starts.map(s => s -> (0, Vector(s))).toMap
    var frontier: Map[Long, Vector[Long]] = starts.map(s => s -> Vector(s)).toMap
    var d = 0
    while (d < maxDepth && frontier.nonEmpty) {
      d += 1
      val candidates = frontier.toSeq
        .flatMap { case (u, p) => adj.getOrElse(u, Nil).map(v => v -> (p :+ v)) }
        .filterNot { case (v, _) => visited.contains(v) }
        .groupBy(_._1)
        .map { case (v, ps) => v -> ps.map(_._2).reduce((x, y) => if (pathLt(x, y)) x else y) }
      visited ++= candidates.map { case (v, p) => v -> (d, p) }
      frontier = candidates
    }
    visited
  }

  private def cheapestDriver(edges: Seq[(Long, Long, Long)], starts: Seq[Long],
      maxHops: Int): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(e => (e._2, e._3)) }
    var best = starts.map(_ -> 0L).toMap
    var delta = best
    var hop = 0
    while (hop < maxHops && delta.nonEmpty) {
      hop += 1
      val relaxed = delta.toSeq
        .flatMap { case (u, c) => adj.getOrElse(u, Nil).map { case (v, w) => v -> (c + w) } }
        .groupBy(_._1).map { case (v, cs) => v -> cs.map(_._2).min }
      val improved = relaxed.filter { case (v, c) => best.get(v).forall(c < _) }
      best ++= improved
      delta = improved
    }
    best
  }

  /** All-pairs min path length over 1..maxLen hops — the
    * hopCompressedEdges contract, by brute force. */
  private def allPairsDriver(edges: Seq[(Long, Long, Long)],
      dir: Traverse.Direction, maxLen: Int): Map[(Long, Long), Int] = {
    val adj = adjacency(edges, dir)
    var reach = adj.toSeq.flatMap { case (u, vs) => vs.map(v => (u, v) -> 1) }.toMap
    var frontier = reach
    var len = 1
    while (len < maxLen && frontier.nonEmpty) {
      len += 1
      val next = frontier.toSeq
        .flatMap { case ((u, v), l) => adj.getOrElse(v, Nil).map(w => (u, w) -> (l + 1)) }
        .filterNot { case (k, _) => reach.contains(k) }
        .groupBy(_._1).map { case (k, ls) => k -> ls.map(_._2).min }
      reach ++= next
      frontier = next
    }
    reach
  }

  private def frames(p: GraphProg) = {
    val e = p.edges.toDF("src", "dst", "w")
      .withColumn("weight", org.apache.spark.sql.functions.col("w").cast("double"))
    val s = p.starts.toDF("id")
    (e, s)
  }

  private def orientedDf(p: GraphProg) = {
    import org.apache.spark.sql.functions._
    val e = p.edges.toDF("src", "dst", "w")
    p.direction match {
      case Traverse.Out  => e.select(col("src").as("from"), col("dst").as("to"))
      case Traverse.In   => e.select(col("dst").as("from"), col("src").as("to"))
      case Traverse.Both => e.select(col("src").as("from"), col("dst").as("to"))
        .union(e.select(col("dst").as("from"), col("src").as("to")))
    }
  }

  test("48 random graphs: bfs (all directions x hop powers x prebuilt " +
      "compressed relations) equals the driver BFS; the compressed " +
      "relation itself equals brute-force all-pairs min length") {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(20260815L)
    var ran = 0
    while (ran < 48) {
      graphs.apply(params, seed).foreach { p =>
        ran += 1
        val (e, s) = frames(p)
        val pre =
          if (p.prebuilt) {
            val comp = Traverse.hopCompressedEdges(orientedDf(p), p.hopPower)
            // the compressed relation's own contract, checked before it
            // feeds bfs: (from, to, len) = min path length <= 2^power
            val got = comp.collect()
              .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
            val want = allPairsDriver(p.edges, p.direction, 1 << p.hopPower)
            assert(got == want,
              s"hopCompressedEdges divergence on $p\ngot=${got.size} want=${want.size}")
            Some(comp)
          } else None
        val got = Traverse.bfs(e, s, p.maxDepth, p.direction, p.hopPower, pre)
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        val want = bfsDriver(p.edges, p.starts, p.maxDepth, p.direction)
        assert(got == want,
          s"bfs divergence on $p\ngot=$got\nwant=$want")
      }
      seed = seed.next
    }
    assert(ran >= 48)
  }

  test("24 random graphs: bfsPaths equals the driver interpreter exactly " +
      "(depth AND the lexicographic-min shortest path per node)") {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(20260816L)
    var ran = 0
    while (ran < 24) {
      graphs.apply(params, seed).foreach { p =>
        ran += 1
        val (e, s) = frames(p)
        val got = Traverse.bfsPaths(e, s, p.maxDepth, p.direction)
          .collect()
          .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Long](2).toVector)).toMap
        val want = bfsPathsDriver(p.edges, p.starts, p.maxDepth, p.direction)
        assert(got == want,
          s"bfsPaths divergence on $p\ngot=$got\nwant=$want")
      }
      seed = seed.next
    }
    assert(ran >= 24)
  }

  test("24 random weighted graphs: cheapestPaths equals the driver " +
      "Bellman-Ford over <= maxHops edges") {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(20260817L)
    var ran = 0
    while (ran < 24) {
      graphs.apply(params, seed).foreach { p =>
        ran += 1
        import org.apache.spark.sql.functions._
        val e = p.edges.toDF("src", "dst", "w")
        val s = p.starts.toDF("id")
        val got = Traverse.cheapestPaths(e, s, p.maxDepth)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = cheapestDriver(p.edges, p.starts, p.maxDepth)
        assert(got == want,
          s"cheapestPaths divergence on $p\ngot=$got\nwant=$want")
      }
      seed = seed.next
    }
    assert(ran >= 24)
  }
}
