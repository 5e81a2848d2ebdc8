package graft

import graft.operators.{GraphAnalytics, Traverse}
import graft.service.QueryService

/** BFS path accumulation and query wall-clock budget enforcement. */
class TraversePathsSpec extends SparkSpec {
  import spark.implicits._

  test("bfsPaths returns one shortest path per node") {
    //    1 → 2 → 4
    //    1 → 3 → 4   (two shortest paths to 4; min() picks 1,2,4)
    //    4 → 5
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val got = Traverse.bfsPaths(edges, Seq(1L).toDF("id"), maxDepth = 10)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("depth"),
        r.getAs[scala.collection.Seq[Long]]("path").toList)).toList.sortBy(_._1)
    assert(got == List(
      (1L, 0, List(1L)),
      (2L, 1, List(1L, 2L)),
      (3L, 1, List(1L, 3L)),
      (4L, 2, List(1L, 2L, 4L)),
      (5L, 3, List(1L, 2L, 4L, 5L))))
  }

  test("cheapestPaths: weighted minimum beats the hop-shortest route") {
    // 1 →(10) 4 direct, but 1 →(1) 2 →(1) 3 →(1) 4 costs 3
    val edges = Seq((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
      .toDF("src", "dst", "w")
    val got = Traverse.cheapestPaths(edges, Seq(1L).toDF("id"), maxHops = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // hop bound binds: with one hop only, the direct edge wins
    val oneHop = Traverse.cheapestPaths(edges, Seq(1L).toDF("id"), maxHops = 1)
      .as[(Long, Long)].collect().toMap
    assert(oneHop == Map(1L -> 0L, 2L -> 1L, 4L -> 10L))
  }

  test("cheapestPaths terminates on weighted cycles") {
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L), (2L, 3L, 5L)).toDF("src", "dst", "w")
    val got = Traverse.cheapestPaths(edges, Seq(1L).toDF("id"), maxHops = 10)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 6L))
  }

  test("triangleCounts: square with a diagonal, orientation-independent") {
    import graft.operators.GraphAnalytics
    // square 1-2-3-4 plus diagonal 1-3 → triangles {1,2,3} and {1,3,4};
    // edges deliberately in mixed directions + a duplicate + self loop
    val edges = Seq((1L, 2L), (3L, 2L), (3L, 4L), (4L, 1L), (1L, 3L), (3L, 1L), (2L, 2L))
      .toDF("src", "dst")
    val verts = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val got = GraphAnalytics.triangleCounts(edges, verts)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
  }

  test("bfsPaths handles cycles without path explosion") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L)).toDF("src", "dst")
    val got = Traverse.bfsPaths(edges, Seq(1L).toDF("id"), maxDepth = 50)
    assert(got.count() == 3)
  }

  test("collectBounded returns fast queries, kills slow ones") {
    val g = graft.model.Tpch.graph(spark, sf)
    val svc = new QueryService(g)
    val quick = svc.collectBounded(g.vertexFrame("customer").limit(5), 60000)
    assert(quick.length == 5)
    // a deliberately expensive single-stage plan (NOT a broadcast join:
    // broadcast builds run outside the job group and would survive the
    // cancel, hogging executors for later queries)
    val slow = spark.range(5000000000000L)
      .agg(org.apache.spark.sql.functions.avg($"id"))
    val t0 = System.nanoTime()
    intercept[QueryService.BadRequestException] {
      svc.collectBounded(slow, timeoutMillis = 1500)
    }
    val tookMs = (System.nanoTime() - t0) / 1000000
    assert(tookMs < 30000, s"cancellation should be prompt, took ${tookMs}ms")
  }

  test("hop-compressed bfs matches plain bfs depth-for-depth") {
    val g = graft.model.Tpch.graph(spark, sf)
    val knows = g.edgeFrame("knows").select("src", "dst").localCheckpoint(true)
    val start = Seq(1L).toDF("id")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val plain = asMap(Traverse.bfs(knows, start, maxDepth = 5))
    assert(asMap(Traverse.bfs(knows, start, maxDepth = 5, hopPower = 1)) == plain)
    assert(asMap(Traverse.bfs(knows, start, maxDepth = 5, hopPower = 2)) == plain)
    // maxDepth not a multiple of the hop stride still truncates exactly
    val d3 = asMap(Traverse.bfs(knows, start, maxDepth = 3, hopPower = 2))
    assert(d3 == plain.filter(_._2 <= 3))
  }

  test("hop-compressed reachability matches plain semi-naive") {
    val g = graft.model.Tpch.graph(spark, sf)
    val knows = g.edgeFrame("knows").select("src", "dst").localCheckpoint(true)
    val start = Seq(1L).toDF("id")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).toSet
    val plain = ids(graft.operators.Fixpoint.reachable(knows, start))
    assert(ids(graft.operators.Fixpoint.reachable(knows, start, hopPower = 3)) == plain)
  }

  test("personalizedPageRank: mass concentrates near the source and decays by hop") {
    // directed path 0→1→2→3 plus a far disconnected node 9
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val verts = Seq(0L, 1L, 2L, 3L, 9L).toDF("id")
    val r = GraphAnalytics.personalizedPageRank(edges, verts, sourceId = 0L,
        iterations = 6)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    // restart mass re-enters only at the source; rank decays along the
    // path and an unreachable node holds rank 0
    assert(r(0L) > r(1L) && r(1L) > r(2L) && r(2L) > r(3L))
    assert(r(9L) === 0L)
    // the uniform variant ranks the unreachable node the same as any
    // other in-degree-0 node — personalization is what zeroes it
    val u = GraphAnalytics.pageRankFixedPoint(edges, verts, iterations = 6)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(u(9L) > 0L)
  }

  test("clusteringCoefficients: clique closes, path doesn't, degree<2 is 0") {
    // triangle {1,2,3} + pendant 4 hanging off 3 + isolated 5
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val verts = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val out = GraphAnalytics.clusteringCoefficients(edges, verts)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === ((1L, 2L, 10000L))) // both neighbors connected
    assert(out(2L) === ((1L, 2L, 10000L)))
    assert(out(3L) === ((1L, 3L, 3333L))) // 1 of 3 possible pairs closed
    assert(out(4L) === ((0L, 1L, 0L)))    // degree 1: coefficient 0
    assert(out(5L) === ((0L, 0L, 0L)))    // isolated
  }

  test("labelPropagation: two cliques bridged by one edge separate; ties go low") {
    // cliques {1,2,3,4} and {11,12,13,14} + bridge 4–11 + isolate 99
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(11L, 12L, 13L, 14L))
      :+ (4L, 11L)).toDF("src", "dst")
    val verts = (Seq(1L, 2L, 3L, 4L, 11L, 12L, 13L, 14L) :+ 99L).toDF("id")
    val out = GraphAnalytics.labelPropagation(edges, verts, iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each clique converges to ONE label and the two differ
    val left = Seq(1L, 2L, 3L, 4L).map(out)
    val right = Seq(11L, 12L, 13L, 14L).map(out)
    assert(left.distinct.length == 1, s"left clique split: $left")
    assert(right.distinct.length == 1, s"right clique split: $right")
    assert(left.head != right.head, s"cliques merged: $out")
    assert(out(99L) == 99L, "isolated vertex must keep its own label")
  }

  test("labelPropagation: deterministic smallest-label tie-break on one round") {
    // vertex 3's neighbors {1, 2} tie at one occurrence each -> label 1
    val edges = Seq((1L, 3L), (2L, 3L)).toDF("src", "dst")
    val verts = Seq(1L, 2L, 3L).toDF("id")
    val out = GraphAnalytics.labelPropagation(edges, verts, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(3L) == 1L, s"tie must break to the smallest label: $out")
    // leaves adopt their only neighbor's label
    assert(out(1L) == 3L && out(2L) == 3L)
  }

  test("stronglyConnectedComponents: cycle collapses, chain stays singletons") {
    // directed cycle {1,2,3}, chain 4→5→6, DAG edge 3→4 linking them
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L), (3L, 4L))
      .toDF("src", "dst")
    val verts = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    val out = GraphAnalytics.stronglyConnectedComponents(edges, verts, numIter = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).map(out).forall(_ == 1L), s"cycle must share label 1: $out")
    assert(Seq(4L, 5L, 6L).map(out) == Seq(4L, 5L, 6L), s"chain must stay singletons: $out")
  }

  test("stronglyConnectedComponents matches brute-force mutual reachability") {
    // fixed pseudo-random digraph: two interlocking cycles + DAG tail
    val n = 12
    val edgeList = (0 until n).flatMap { i =>
      Seq((i.toLong, ((i * 5 + 3) % n).toLong), (i.toLong, ((i + 4) % n).toLong))
    }.distinct.filter { case (a, b) => a != b }
    // Floyd–Warshall closure on the driver as the oracle
    val reach = Array.fill(n, n)(false)
    edgeList.foreach { case (a, b) => reach(a.toInt)(b.toInt) = true }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
    val expected = (0 until n).map { v =>
      val scc = (0 until n).filter(u =>
        u == v || (reach(v)(u) && reach(u)(v)))
      v.toLong -> scc.min.toLong
    }.toMap
    val out = GraphAnalytics.stronglyConnectedComponents(
      edgeList.toDF("src", "dst"), (0 until n).map(_.toLong).toDF("id"),
      numIter = 10).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == expected, s"got $out\nexpected $expected")
  }

  test("kCore: pendant chain peels in cascade, clique survives with core degrees") {
    // 4-clique {1,2,3,4} + chain 4–5–6–7 (peels back in 3 rounds at k=3)
    def clique(ids: Seq[Long]) = for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++ Seq((4L, 5L), (5L, 6L), (6L, 7L)))
      .toDF("src", "dst")
    val out = GraphAnalytics.kCore(edges, k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"3-core must be exactly the clique at its internal degrees: $out")
    // k=2: the chain still peels (ends have degree 1, cascade), clique stays
    val out2 = GraphAnalytics.kCore(edges, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2.keySet == Set(1L, 2L, 3L, 4L), s"2-core: $out2")
  }

  test("kCore: exceeding maxRounds fails loudly instead of returning a non-core") {
    // a 6-chain needs 3 peel rounds at k=2... with maxRounds=1 it must throw
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("src", "dst")
    intercept[IllegalStateException] {
      GraphAnalytics.kCore(edges, k = 2, maxRounds = 1)
    }
    // and with room it converges to the empty core
    assert(GraphAnalytics.kCore(edges, k = 2, maxRounds = 8).isEmpty)
  }

  test("linkPrediction: RA scores, existing-edge exclusion, deterministic top-k") {
    // C4 cycle 1-2-3-4: both diagonals predicted via two deg-2
    // intermediates each → common 2, ra 2·(10⁶ div 2) = 1000000
    val c4 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val out = GraphAnalytics.linkPrediction(c4, maxDegree = 4L, k = 10)
      .select("a", "b", "common", "ra_micro")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 3L, 2L, 1000000L), (2L, 4L, 2L, 1000000L)))
    // add diagonal 1-3: that pair is now an EDGE → excluded; (2,4)'s
    // intermediates 1 and 3 are deg-3 now → ra 2·(10⁶ div 3) = 666666
    val diag = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)).toDF("src", "dst")
    val out2 = GraphAnalytics.linkPrediction(diag, maxDegree = 4L, k = 10)
      .select("a", "b", "common", "ra_micro")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out2 === Set((2L, 4L, 2L, 666666L)))
    // path 1-2-3-4-5: three candidates tie at 500000 → k=1 picks the
    // (a, b)-smallest under the total order
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val top1 = GraphAnalytics.linkPrediction(path, maxDegree = 4L, k = 1)
      .select("a", "b").as[(Long, Long)].collect()
    assert(top1 === Array((1L, 3L)))
  }

  test("edgeIntegrity: counts missing endpoints, clean graph reports zero") {
    val edges = Seq((1L, 10L), (2L, 11L), (9L, 10L)).toDF("src", "dst")
    val srcs = Seq(1L, 2L).toDF("id")         // 9 is missing
    val dsts = Seq(10L).toDF("id")            // 11 is missing
    val out = GraphAnalytics.edgeIntegrity(edges, srcs, dsts)
      .as[(Long, Long, Long)].head()
    assert(out === ((3L, 1L, 1L)))
    val clean = GraphAnalytics.edgeIntegrity(edges,
        Seq(1L, 2L, 9L).toDF("id"), Seq(10L, 11L).toDF("id"))
      .as[(Long, Long, Long)].head()
    assert(clean === ((3L, 0L, 0L)))
  }

  test("harmonicCentrality: per-source 1/d accrual, depth bound, self exclusion") {
    // directed path 1→2→3→4→5, sources {1,2}, maxDepth 4
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val out = GraphAnalytics.harmonicCentrality(path, Seq(1L, 2L), maxDepth = 4)
      .orderBy("id").as[(Long, Long, Long)].collect()
    assert(out === Array(
      (2L, 1L, 1000000L),            // from 1 at d=1
      (3L, 2L, 1500000L),            // 1/2 from source 1 + 1/1 from source 2
      (4L, 2L, 833333L),             // 333333 + 500000
      (5L, 2L, 583333L)))            // 250000 + 333333
    // depth bound: maxDepth 2 drops source-1 contributions past d=2
    val shallow = GraphAnalytics.harmonicCentrality(path, Seq(1L), maxDepth = 2)
      .orderBy("id").as[(Long, Long, Long)].collect()
    assert(shallow === Array((2L, 1L, 1000000L), (3L, 1L, 500000L)))
  }

  test("degreeSummary: histogram, star disassortativity, regular-graph zero") {
    // star 0–{1,2,3}: hub deg 3, leaves deg 1 → assortativity −1
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val s = GraphAnalytics.degreeSummary(star).orderBy("degree")
      .as[(Long, Long, Long, Double)].collect()
    assert(s === Array((1L, 3L, 3L, -1.0), (3L, 1L, 3L, -1.0)))
    // 4-cycle is 2-regular: den = 0 → coefficient 0 by convention
    val c4 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val r = GraphAnalytics.degreeSummary(c4)
      .as[(Long, Long, Long, Double)].collect()
    assert(r === Array((2L, 4L, 4L, 0.0)))
  }

  test("projectCoOccurrence: dedup, hub-group exclusion, weighted top-k order") {
    val facts = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),           // g10 → pairs (1,2)(1,3)(2,3)
      (20L, 2L), (20L, 3L), (20L, 2L),           // duplicate membership dedupes
      (30L, 2L), (30L, 3L),
      (40L, 1L), (40L, 2L), (40L, 3L), (40L, 4L) // 4 distinct > maxItems=3 → skipped
    ).toDF("g", "item")
    val out = GraphAnalytics.projectCoOccurrence(facts, "g", "item",
        maxItems = 3, minWeight = 1L, topK = 10)
      .as[(Long, Long, Long)].collect()
    assert(out === Array((2L, 3L, 3L), (1L, 2L, 1L), (1L, 3L, 1L)))
    // minWeight prunes the singletons
    val strong = GraphAnalytics.projectCoOccurrence(facts, "g", "item",
        maxItems = 3, minWeight = 2L, topK = 10)
      .as[(Long, Long, Long)].collect()
    assert(strong === Array((2L, 3L, 3L)))
  }

  test("linkPrediction: hub intermediates above the degree cap predict nothing") {
    // star 0–{1..10}: the only shared neighbor is the deg-10 hub,
    // capped out at maxDegree=4 → zero candidates (the q149 hub skip)
    val star = (1 to 10).map(i => (0L, i.toLong)).toDF("src", "dst")
    assert(GraphAnalytics.linkPrediction(star, maxDegree = 4L, k = 10).isEmpty)
    // raising the cap restores the leaf pairs: C(10,2)=45 candidates
    assert(GraphAnalytics.linkPrediction(star, maxDegree = 16L, k = 100).count() === 45L)
  }
}
