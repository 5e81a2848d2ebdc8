package graft.operators

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Whole-graph analytics on GraphX — the Pregel-style tier for
  * algorithms that iterate over EVERY vertex simultaneously (PageRank,
  * connected components), where vertex-state-in-RDD beats re-joining
  * DataFrames per superstep. Query-shaped traversals (frontier BFS,
  * reachability from seeds) stay on DataFrame joins ([[Traverse]],
  * [[Fixpoint]]) where Catalyst sees them — the split SURVEY §7.5
  * prescribes.
  *
  * The reference has no whole-graph analytics; these are additions in
  * the same family as its traversal surface (traverse.lisp).
  */
object GraphAnalytics {

  private def toGraph(edges: DataFrame, vertices: DataFrame): Graph[Long, Unit] = {
    val eRdd = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .rdd.map(r => Edge[Unit](r.getLong(0), r.getLong(1), ()))
    val vRdd = vertices.select(col("id").cast("long")).rdd.map(r => (r.getLong(0): VertexId, 0L))
    Graph(vRdd, eRdd)
  }

  /** Fixed-point PageRank in integer micro-units: rank starts at
    * 1_000_000, each iteration r' = 150_000 + Σ over in-neighbors of
    * (r·85) / (100·outdeg) with INTEGER division. All-integer math
    * makes the result bit-identical across engines and partitionings —
    * no fp summation-order drift — which is what lets a SQL oracle
    * replay the same iterations exactly. Returns (id, rank_micro).
    */
  def pageRankFixedPoint(edges: DataFrame, vertices: DataFrame, iterations: Int): DataFrame = {
    val spark = edges.sparkSession
    val base = toGraph(edges, vertices)
    val degrees = base.outDegrees
    // vertex state: (rank, outDegree)
    var g: Graph[(Long, Int), Unit] = base.outerJoinVertices(degrees) {
      case (_, _, deg) => (1000000L, deg.getOrElse(0))
    }.cache()
    (1 to iterations).foreach { _ =>
      val contrib = g.aggregateMessages[Long](
        ctx => if (ctx.srcAttr._2 > 0)
          ctx.sendToDst(ctx.srcAttr._1 * 85L / (100L * ctx.srcAttr._2)),
        _ + _)
      val next = g.outerJoinVertices(contrib) {
        case (_, (_, deg), c) => (150000L + c.getOrElse(0L), deg)
      }.cache()
      next.vertices.count() // materialize before unpersisting the old gen
      g.unpersist(blocking = false)
      g = next
    }
    val rows = g.vertices.map { case (id, (rank, _)) => Row(id, rank) }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("rank_micro", LongType, nullable = false))))
  }

  /** Personalized PageRank in the same integer micro-unit fixed-point
    * discipline as [[pageRankFixedPoint]] — random-walk-with-restart
    * relevance to ONE source (the recommendation / similar-entity
    * primitive): all restart mass re-enters at `sourceId`, so rank
    * measures proximity to the source instead of global centrality.
    * Iteration: r' = (v == source ? 150_000·n : 0) + Σ (r·85)/(100·deg)
    * with integer division, r₀ = 1_000_000 at the source and 0
    * elsewhere (scaled by n at the source so total mass matches the
    * uniform variant's magnitude — all integer, bit-identical on any
    * engine, which is what lets the oracle unroll the same
    * iterations in SQL). Returns (id, rank_micro).
    */
  def personalizedPageRank(edges: DataFrame, vertices: DataFrame,
      sourceId: Long, iterations: Int): DataFrame = {
    val spark = edges.sparkSession
    val base = toGraph(edges, vertices)
    val n = vertices.count()
    val degrees = base.outDegrees
    var g: Graph[(Long, Int), Unit] = base.outerJoinVertices(degrees) {
      case (id, _, deg) => (if (id == sourceId) 1000000L * n else 0L, deg.getOrElse(0))
    }.cache()
    (1 to iterations).foreach { _ =>
      val contrib = g.aggregateMessages[Long](
        ctx => if (ctx.srcAttr._2 > 0 && ctx.srcAttr._1 > 0)
          ctx.sendToDst(ctx.srcAttr._1 * 85L / (100L * ctx.srcAttr._2)),
        _ + _)
      val next = g.outerJoinVertices(contrib) {
        case (id, (_, deg), c) =>
          ((if (id == sourceId) 150000L * n else 0L) + c.getOrElse(0L), deg)
      }.cache()
      next.vertices.count()
      g.unpersist(blocking = false)
      g = next
    }
    val rows = g.vertices.map { case (id, (rank, _)) => Row(id, rank) }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("rank_micro", LongType, nullable = false))))
  }

  /** Per-node local clustering coefficient in per-myriad integers —
    * how close each vertex's neighborhood is to a clique
    * (`2·T·10⁴ div (d·(d−1))`, d = undirected degree): the
    * community-structure statistic beside [[triangleCounts]]'s raw
    * counts, sharing its O(m^1.5) degree-oriented enumeration.
    * Vertices of degree < 2 have coefficient 0 by convention.
    * Returns (id, triangles, degree, coeff_pm) — all integer,
    * oracle-replayable.
    */
  def clusteringCoefficients(edges: DataFrame, vertices: DataFrame): DataFrame = {
    val und = edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("id")).unionAll(und.select(col("b")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    triangleCounts(edges, vertices)
      .join(deg, Seq("id"), "left")
      .select(col("id"), col("triangles"),
        coalesce(col("degree"), lit(0L)).as("degree"),
        expr("CASE WHEN coalesce(degree, 0) >= 2 " +
          "THEN triangles * 2 * 10000 div (degree * (degree - 1)) " +
          "ELSE 0 END").as("coeff_pm"))
  }

  /** Per-node triangle participation counts over the undirected graph.
    * Returns (id, triangles) for every vertex (0 when in none).
    *
    * DataFrame joins, not GraphX: triangle enumeration is join-shaped
    * (wedge join + closing semi-join), so Catalyst should see it.
    * Degree orientation — each undirected edge points from its
    * lower-(degree, id) endpoint to the higher — bounds the wedge set
    * by O(m^1.5) regardless of skew (the hub of a star graph generates
    * ZERO wedges instead of deg² of them), the standard
    * enumeration-hardening at scale. Each triangle is emitted exactly
    * once; the count per vertex is orientation-independent, so an
    * id-ordered SQL oracle reproduces it verbatim.
    */
  def triangleCounts(edges: DataFrame, vertices: DataFrame): DataFrame = {
    val und = edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("id")).unionAll(und.select(col("b")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // orient by (deg, id): u -> v iff (deg(u), u) < (deg(v), v)
    val withDeg = und
      .join(deg.select(col("id").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("db")), Seq("b"))
    val oriented = withDeg.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("v")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    // wedges out of each low vertex; close v->w along the orientation
    val w1 = oriented.select(col("u"), col("v").as("x"))
    val w2 = oriented.select(col("u"), col("v").as("y"))
    val wedges = w1.join(w2, Seq("u")).filter(col("x") < col("y"))
    // the closing edge is oriented x->y or y->x; check both
    val closing = oriented.select(col("u").as("x"), col("v").as("y"))
      .unionAll(oriented.select(col("v").as("x"), col("u").as("y")))
    val tri = wedges.join(closing, Seq("x", "y"), "left_semi")
    val counts = tri.select(explode(array(col("u"), col("x"), col("y"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    vertices.select(col("id")).join(counts, Seq("id"), "left")
      .na.fill(0L, Seq("triangles"))
  }

  /** Synchronous label-propagation community detection (Raghavan et
    * al. 2007), made DETERMINISTIC so an oracle can replay it: labels
    * start as vertex ids, and each of `iterations` synchronous rounds
    * re-labels every vertex with the most frequent label among its
    * undirected neighbors — ties broken by the SMALLEST label, isolated
    * vertices keep their own. (Classic LPA breaks ties randomly and
    * updates asynchronously; both choices are engine-local noise, so
    * the rebuild pins the deterministic variant and documents the
    * deviation — same move as the q28 cut/once set-semantics note.)
    * Returns (id, label) after the final round.
    *
    * Scale shape: each round is one adjacency join (labels are keyed by
    * vertex, edges shuffle-partition by endpoint), one (vertex, label)
    * count aggregation with map-side partials, and one per-vertex
    * argmax via a (count desc, label asc) struct max — no global
    * window, no driver-side state; rounds are a fixed small constant.
    * A hub vertex's label multiset aggregates with partial combines, so
    * power-law degree skews compress map-side (the pl_bfs_hub
    * discipline).
    */
  def labelPropagation(edges: DataFrame, vertices: DataFrame,
      iterations: Int): DataFrame = {
    require(iterations >= 0, "iterations must be non-negative")
    val und = edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val adj = und.select(col("a").as("id"), col("b").as("nbr"))
      .unionAll(und.select(col("b"), col("a")))
    var labels = vertices.select(col("id").cast("long").as("id"),
      col("id").cast("long").as("label"))
    (1 to iterations).foreach { _ =>
      val nbrLabels = adj
        .join(labels.select(col("id").as("nbr"), col("label")), Seq("nbr"))
        .groupBy(col("id"), col("label")).agg(count(lit(1)).as("c"))
      // argmax by (count desc, label asc): max of (c, Long.MaxValue-label)
      val winner = nbrLabels
        .groupBy("id")
        .agg(max(struct(col("c"), (lit(Long.MaxValue) - col("label")).as("nl")))
          .as("w"))
        .select(col("id"), (lit(Long.MaxValue) - col("w.nl")).as("label"))
      labels = vertices.select(col("id").cast("long").as("id"))
        .join(labels.select(col("id"), col("label").as("__own")), Seq("id"))
        .join(winner, Seq("id"), "left")
        .select(col("id"), coalesce(col("label"), col("__own")).as("label"))
        .localCheckpoint(eager = true) // truncate the per-round lineage
    }
    labels
  }

  /** Weakly connected components (GraphX label propagation to the
    * minimum vertex id). Returns (id, component).
    */
  def connectedComponents(edges: DataFrame, vertices: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val cc = toGraph(edges, vertices).connectedComponents().vertices
      .map { case (id, comp) => Row(id, comp) }
    spark.createDataFrame(cc, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("component", LongType, nullable = false))))
  }

  /** Strongly connected components of the DIRECTED graph — mutual
    * reachability classes, labeled by the lowest vertex id in each
    * class (the weak-CC labeling convention of [[connectedComponents]]
    * applied to the directed semantics the reference's edges actually
    * carry). Returns (id, component): a directed cycle collapses to one
    * label; a directed chain stays one singleton per vertex — exactly
    * the distinction weak CC cannot make.
    *
    * GraphX's trim + forward-color / backward-confirm rounds
    * (`stronglyConnectedComponents`): each round finalizes every SCC
    * that is the minimum-id root of its color region, so `numIter`
    * bounds the DEPTH OF THE SCC CONDENSATION DAG it must walk, not the
    * vertex count; the trim phase inside each round iterates to
    * fixpoint on its own. Callers pick `numIter` from known condensation
    * depth (the catalog fixture bounds it by construction; an unknown
    * graph gets a generous bound plus the spec-pinned invariant that
    * labels are a valid SCC refinement after any prefix of rounds).
    */
  def stronglyConnectedComponents(edges: DataFrame, vertices: DataFrame,
      numIter: Int): DataFrame = {
    val spark = edges.sparkSession
    val scc = toGraph(edges, vertices).stronglyConnectedComponents(numIter)
      .vertices.map { case (id, comp) => Row(id, comp) }
    spark.createDataFrame(scc, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("component", LongType, nullable = false))))
  }

  /** k-core of the undirected simple graph: the maximal subgraph in
    * which every vertex keeps degree ≥ k, computed by synchronous batch
    * peeling — each round drops ALL vertices whose current degree is
    * below k, so the round count is bounded by the graph's peel depth
    * (≤ its degeneracy layering), never by vertex count. Returns
    * (id, core_degree) for the surviving vertices: their degree WITHIN
    * the core — the per-vertex evidence the membership claim rests on,
    * which an oracle can re-derive round by round.
    *
    * Scale shape: each round is one degree aggregation (map-side
    * partials at edge grain) plus two anti-joins against the peeled-id
    * frame; the edge frame shrinks monotonically and is re-rooted with
    * `localCheckpoint` per round (the [[Fixpoint]] lineage discipline).
    * The per-round driver decision is a single count of the PEELED
    * frame — bounded work, the same loop-control shape as
    * `Fixpoint.semiNaive`. A 100 TB deployment peels the same way:
    * rounds are data-parallel; only the fixpoint test is a scalar.
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 64): DataFrame = {
    require(k >= 1, "k must be >= 1")
    var und = edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(eager = true)
    var rounds = 0
    var done = false
    while (!done && rounds < maxRounds) {
      val deg = und.select(col("a").as("id")).unionAll(und.select(col("b")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val peel = deg.filter(col("deg") < k).select(col("id"))
        .localCheckpoint(eager = true)
      if (peel.isEmpty) done = true
      else {
        und = und
          .join(peel.select(col("id").as("a")), Seq("a"), "left_anti")
          .join(peel.select(col("id").as("b")), Seq("b"), "left_anti")
          .localCheckpoint(eager = true)
        rounds += 1
      }
    }
    if (!done)
      throw new IllegalStateException(
        s"kCore did not converge within $maxRounds rounds — raise maxRounds " +
          "(peel depth exceeds the bound, e.g. a long induced path)")
    und.select(col("a").as("id")).unionAll(und.select(col("b")))
      .groupBy("id").agg(count(lit(1)).as("core_degree"))
  }

  /** Referential-integrity audit of an edge frame against its endpoint
    * vertex sets — the graph-store health check (the reference's edge
    * accessors assume live endpoints; a store that soft-deletes
    * vertices accumulates dangling edges silently): counts edges whose
    * src/dst is missing from the VISIBLE vertex set. One row out.
    *
    * Scale shape: two left_anti joins on the endpoint keys (each
    * equality-keyed; the vertex sides carry ids only) reduced to
    * counts with map-side partials — the audit never materializes more
    * than the edge list it was given.
    */
  def edgeIntegrity(edges: DataFrame, srcIds: DataFrame,
      dstIds: DataFrame): DataFrame = {
    val n = edges.agg(count(lit(1)).as("n_edges"))
    val srcDangle = edges.select(col("src"))
      .join(srcIds.select(col("id").as("src")), Seq("src"), "left_anti")
      .agg(count(lit(1)).as("n_src_dangling"))
    val dstDangle = edges.select(col("dst"))
      .join(dstIds.select(col("id").as("dst")), Seq("dst"), "left_anti")
      .agg(count(lit(1)).as("n_dst_dangling"))
    n.crossJoin(broadcast(srcDangle)).crossJoin(broadcast(dstDangle))
  }

  /** Harmonic centrality from SAMPLED sources (the Boldi–Vigna
    * estimator shape: exact all-pairs centrality is O(n·m), so
    * production runs it from a fixed sample of roots and sums
    * contributions): for each vertex v reached by a sampled source s
    * within `maxDepth` directed hops, v accrues `10⁶ div d(s, v)` —
    * closer-reachable vertices score higher, integer-exact (a float
    * 1/d would be exact anyway for d ≤ 6 but the integer contract
    * matches the q164 RA discipline). Returns (id, n_sources,
    * harmonic_micro) over vertices reached by at least one source,
    * excluding the 0-distance self rows.
    *
    * Scale shape: one depth-bounded [[Traverse.bfs]] per sampled
    * source (k is a small constant by construction — the sample IS the
    * estimator), each inheriting bfs's frontier broadcast + ring
    * checkpoint discipline; the union reduces at vertex grain with
    * map-side partials.
    */
  def harmonicCentrality(edges: DataFrame, sources: Seq[Long],
      maxDepth: Int): DataFrame = {
    require(sources.nonEmpty && sources.size <= 64,
      "sources must be a small fixed sample (1..64)")
    require(maxDepth >= 1, "maxDepth must be >= 1")
    val spark = edges.sparkSession
    import spark.implicits._
    val perSource = sources.map { s =>
      Traverse.bfs(edges, Seq(s).toDF("id"), maxDepth)
        .filter(col("depth") > 0)
        .select(col("id"), col("depth").cast("long").as("d"))
    }
    perSource.reduce(_ unionAll _)
      .groupBy("id")
      .agg(count(lit(1)).as("n_sources"),
        sum(expr("1000000 div d")).as("harmonic_micro"))
  }

  /** Degree-structure summary of the undirected graph: the degree
    * HISTOGRAM (how many vertices at each degree — the power-law probe)
    * with the degree ASSORTATIVITY coefficient alongside (Newman 2002:
    * the Pearson correlation of endpoint degrees over symmetrized
    * edges — positive = hubs attach to hubs, negative = hub-and-spoke).
    * All correlation sums are exact int64 (the envelope holds through
    * ~10⁶ edges at ~10³ max degree — a 100 TB graph past that swaps
    * double partials, losing only oracle-bit-exactness); the
    * coefficient is `num / (√denx·√deny)` — two correctly-rounded IEEE
    * sqrts, one multiply, one divide on identical integers, rounded 6.
    * A degree-regular graph (den = 0) reports 0 by convention.
    *
    * Returns the histogram (degree, n_nodes) with the 1-row
    * (n_edges, assortativity) stats broadcast alongside — one frame,
    * one read.
    *
    * Scale shape: degree computation is one hash aggregation; the
    * histogram a second (degree-vocabulary-sized); the correlation
    * joins the |V|-row degree frame to the edge list twice on the
    * endpoint key and reduces to ONE row — no per-pair materialization
    * beyond the edge list itself.
    */
  def degreeSummary(edges: DataFrame): DataFrame = {
    val und = edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("id")).unionAll(und.select(col("b")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    val hist = deg.groupBy("degree").agg(count(lit(1)).as("n_nodes"))
    // symmetrized endpoint-degree pairs: each undirected edge
    // contributes (da, db) and (db, da)
    val withDeg = und
      .join(deg.select(col("id").as("a"), col("degree").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("degree").as("db")), Seq("b"))
    val pairs = withDeg.select(col("da").as("x"), col("db").as("y"))
      .unionAll(withDeg.select(col("db").as("x"), col("da").as("y")))
    val stats = pairs.agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum("y").as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
      .select((col("n") / 2).cast("long").as("n_edges"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("__num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("__dx"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("__dy"))
      .select(col("n_edges"),
        when(col("__dx") === 0 || col("__dy") === 0, lit(0.0))
          .otherwise(round(col("__num").cast("double") /
            (sqrt(col("__dx").cast("double")) * sqrt(col("__dy").cast("double"))), 6))
          .as("assortativity"))
    hist.crossJoin(broadcast(stats))
      .select(col("degree"), col("n_nodes"), col("n_edges"), col("assortativity"))
  }

  /** Co-occurrence graph projection from relational data — the
    * "build the graph" step that turns (group, item) facts into a
    * weighted item–item edge list: two items are linked with weight =
    * number of groups containing BOTH (co-purchased parts, co-cited
    * papers, co-occurring tags). The bipartite-projection shape every
    * recommender / market-basket pipeline starts from.
    *
    * Scale shape: membership dedupes to (group, distinct item) first;
    * groups with more than `maxItems` distinct items are EXCLUDED from
    * pair generation (the q149/q164 hub-skip: a group containing
    * everything links nothing specifically, and the cap bounds pair
    * volume at maxItems·|membership| instead of Σ|group|²); the pair
    * self-join is equality-keyed on the group; the final top-k is a
    * TakeOrdered under the total order (weight desc, a, b).
    */
  def projectCoOccurrence(df: DataFrame, groupCol: String, itemCol: String,
      maxItems: Int, minWeight: Long, topK: Int): DataFrame = {
    require(maxItems >= 2, "maxItems must be >= 2")
    require(minWeight >= 1 && topK >= 1, "minWeight and topK must be >= 1")
    val membership = df.select(col(groupCol).as("g"), col(itemCol).as("item"))
      .distinct()
    val sizes = membership.groupBy("g").agg(count(lit(1)).as("__gsz"))
    val bounded = membership
      .join(sizes.filter(col("__gsz") <= maxItems), Seq("g"))
    val pairs = bounded.select(col("g"), col("item").as("a"))
      .join(bounded.select(col("g"), col("item").as("b")), Seq("g"))
      .filter(col("a") < col("b"))
    pairs.groupBy("a", "b").agg(count(lit(1)).as("weight"))
      .filter(col("weight") >= minWeight)
      .orderBy(col("weight").desc, col("a"), col("b"))
      .limit(topK)
  }

  /** Link prediction over the undirected graph: for every NON-adjacent
    * vertex pair sharing at least one neighbor, the common-neighbor
    * count and the resource-allocation index (Zhou, Lü & Zhang 2009)
    * `Σ_z 1/deg(z)` over shared neighbors z — the degree-weighted
    * sibling of Adamic–Adar whose per-term weight is a RATIONAL in the
    * intermediate degree, so the score stays exact integer micro-units
    * (`Σ 10⁶ div deg(z)`) on any engine, where Adamic–Adar's 1/ln(d)
    * would ride on last-ulp libm differences. Returns the top-`k`
    * candidate edges by (ra_micro desc, common desc, a, b).
    *
    * Scale shape: candidate pairs are generated by joining the
    * adjacency list with itself THROUGH the shared neighbor z, and z's
    * fan-out is capped at `maxDegree` — pair volume is bounded by
    * Σ_z min(deg z, maxDegree)² ≤ maxDegree·m (the q149 rare-block
    * discipline: a hub intermediate predicts nothing specific and is
    * skipped, exactly like a ubiquitous trigram). The existing-edge
    * exclusion is a left_anti against the undirected edge set, and the
    * final top-k is a TakeOrdered, never a global sort.
    */
  def linkPrediction(edges: DataFrame, maxDegree: Long, k: Int): DataFrame = {
    require(maxDegree >= 2, "maxDegree must be >= 2")
    require(k >= 1, "k must be >= 1")
    val und = edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val adj = und.select(col("a").as("z"), col("b").as("n"))
      .unionAll(und.select(col("b").as("z"), col("a").as("n")))
    val deg = adj.groupBy("z").agg(count(lit(1)).as("deg"))
    val small = adj.join(deg.filter(col("deg") <= maxDegree), Seq("z"))
    val pairs = small.select(col("z"), col("deg"), col("n").as("a"))
      .join(small.select(col("z"), col("n").as("b")), Seq("z"))
      .filter(col("a") < col("b"))
    val scored = pairs.groupBy("a", "b")
      .agg(count(lit(1)).as("common"),
        sum(expr("1000000 div deg")).as("ra_micro"))
    scored.join(und, Seq("a", "b"), "left_anti")
      .orderBy(col("ra_micro").desc, col("common").desc, col("a"), col("b"))
      .limit(k)
  }
}
