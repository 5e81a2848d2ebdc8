package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BFS traversal — the `traverse` operator (reference traverse.lisp:30-81:
  * BFS with a global visited set, direction in/out/both, max-depth).
  *
  * Implemented as an iterative frontier-join loop over DataFrames
  * (SURVEY.md §7.2 step 5): each round joins the frontier to the edge
  * table, anti-joins the accumulated visited set, and unions the new
  * ring in at depth d. The visited set carries each node's *first*
  * (minimum) depth, matching BFS discovery order semantics; tuple order
  * within a ring is undefined (set semantics, SURVEY.md §7.4).
  *
  * Scale notes: `localCheckpoint` truncates lineage each round so plans
  * don't grow exponentially with depth; the frontier is the only thing
  * recomputed per round and both frontier and visited stay partitioned
  * by id through the joins.
  */
object Traverse {

  sealed trait Direction
  case object Out extends Direction
  case object In extends Direction
  case object Both extends Direction

  private def oriented(edges: DataFrame, direction: Direction): DataFrame = direction match {
    case Out  => edges.select(col("src").as("from"), col("dst").as("to"))
    case In   => edges.select(col("dst").as("from"), col("src").as("to"))
    case Both => edges.select(col("src").as("from"), col("dst").as("to"))
      .union(edges.select(col("dst").as("from"), col("src").as("to")))
  }

  /** Path-doubling hop compression: from a 1-hop relation, build the
    * (from, to, len) relation of all pairs connected by a path of
    * 1..2^power hops, `len` = the MINIMUM such path length. `power`
    * doublings (joins) instead of 2^power traversal rounds.
    *
    * This is the iterative-deepening lever for latency-bound fixpoints:
    * each traversal round then advances 2^power depths, cutting the
    * number of scheduler round-trips by that factor at the price of a
    * denser edge relation (|E_k| ≤ |V| · out-degree^k). Use when the
    * compressed relation still fits comfortably — bounded fan-out
    * graphs — and keep `power` at 0 for power-law graphs at scale,
    * where the doubled relation explodes long before the round count
    * hurts.
    */
  def hopCompressedEdges(step: DataFrame, power: Int): DataFrame = {
    var comp = step.select(col("from"), col("to"), lit(1).as("len"))
    for (_ <- 1 to power) {
      val paired = comp.as("x").join(comp.as("y"), col("x.to") === col("y.from"))
        .select(col("x.from").as("from"), col("y.to").as("to"),
          (col("x.len") + col("y.len")).as("len"))
      comp = comp.union(paired)
        .groupBy("from", "to").agg(min("len").as("len"))
        .localCheckpoint(eager = true)
    }
    comp
  }

  /** @param edges  frame with `src`, `dst` columns
    * @param start  frame with an `id` column (the root set, depth 0)
    * @param hopPower each round advances 2^hopPower depths over a
    *                 [[hopCompressedEdges]] relation (0 = plain BFS)
    * @return frame (id, depth) — every node reachable within maxDepth,
    *         at its minimum depth.
    */
  def bfs(edges: DataFrame, start: DataFrame, maxDepth: Int,
      direction: Direction = Out, hopPower: Int = 0,
      compressedStep: Option[DataFrame] = None): DataFrame = {
    val k = 1 << hopPower
    // compressedStep: a pre-built (from, to, len) hop relation — the
    // persistent-index analog (reference VE/VEV indexes are maintained
    // at write time and queried pre-built); when supplied, traversals
    // skip the per-query compression build entirely
    val step = compressedStep.getOrElse {
      if (hopPower == 0) oriented(edges, direction).withColumn("len", lit(1))
      else hopCompressedEdges(oriented(edges, direction), hopPower)
    }
    // each ring is checkpointed once; `visited` is a cheap union over
    // already-materialized rings, so no re-checkpoint per round.
    // Invariant: after round r, rings hold every node with min depth
    // ≤ r·k at that depth (a shortest path's ancestor k back was in
    // the previous frontier with its correct depth).
    var rings = List(start.select(col("id"), lit(0).as("depth")).localCheckpoint(eager = true))
    var frontier = rings.head
    var frontierRows = frontier.count()
    var d = 0
    while (d < maxDepth && frontierRows > 0) {
      d += k
      val visited = rings.reduce(_ union _)
      // broadcast the frontier while it is small relative to the edge
      // relation (the big side then streams in place instead of being
      // re-shuffled every round); a frontier past the row cap falls
      // back to a shuffled join — an unconditional hint would override
      // the size threshold and OOM the driver on wide graphs
      val hinted = Fixpoint.maybeBroadcast(frontier, frontierRows)
      val next = hinted.join(step, frontier("id") === step("from"), "inner")
        .select(col("to").as("id"), (col("depth") + col("len")).as("depth"))
        .filter(col("depth") <= maxDepth)
        .groupBy("id").agg(min("depth").as("depth"))
        .join(visited.select("id"), Seq("id"), "left_anti")
        .localCheckpoint(eager = true)
      rings ::= next
      frontier = next
      frontierRows = next.count()
    }
    rings.reduce(_ union _)
  }

  /** Bounded-hop weighted shortest paths — Bellman-Ford over the
    * min-plus semiring, delta-relaxation form: each round relaxes only
    * from vertices whose best cost improved last round (classic
    * delta-stepping correctness: after round k, `best` holds the exact
    * minimum over all ≤k-hop paths, because a shortest ≤k-hop path's
    * prefix improved its endpoint by round k-1). The same frontier
    * loop as [[bfs]] with (min, +) in place of (min-depth, +1) —
    * traversal as path algebra.
    *
    * @param edges (src, dst, w) — w must be non-negative
    * @param start frame with an `id` column (cost 0 sources)
    * @return (id, cost): minimum path cost over ≤ maxHops edges
    *
    * Scale: per round one shuffled (or broadcast, while the delta is
    * small) join against the edge relation plus a min-aggregate; the
    * running `best` set is ≤ |reachable| rows, checkpointed per round
    * (bounded by maxHops — unbounded closures belong in [[Fixpoint]]).
    */
  def cheapestPaths(edges: DataFrame, start: DataFrame, maxHops: Int): DataFrame = {
    val step = edges.select(col("src").as("from"), col("dst").as("to"),
      col("w").cast("long").as("w"))
    var best = start.select(col("id"), lit(0L).as("cost")).localCheckpoint(eager = true)
    var delta = best
    var deltaRows = delta.count()
    var hop = 0
    while (hop < maxHops && deltaRows > 0) {
      hop += 1
      val relaxed = Fixpoint.maybeBroadcast(delta, deltaRows)
        .join(step, delta("id") === step("from"))
        .select(col("to").as("id"), (col("cost") + col("w")).as("cost"))
        .groupBy("id").agg(min("cost").as("cost"))
      val improved = relaxed
        .join(best.select(col("id"), col("cost").as("__old")), Seq("id"), "left")
        .filter(col("__old").isNull || col("cost") < col("__old"))
        .select("id", "cost").localCheckpoint(eager = true)
      best = improved
        .unionByName(best.join(improved.select("id"), Seq("id"), "left_anti"))
        .localCheckpoint(eager = true)
      delta = improved
      deltaRows = improved.count()
    }
    best
  }

  /** BFS with full path accumulation — `traverse` with `:paths t`
    * (traverse.lisp:3-28 keeps the reverse edge path per traversal).
    * Returns (id, depth, path: Array[id]) where path is the vertex
    * sequence of ONE shortest path (first discovered per BFS round).
    *
    * The path column makes rows as wide as their depth — fine for the
    * bounded depths traversals use; unbounded transitive closure should
    * use [[bfs]]/Fixpoint instead.
    */
  def bfsPaths(edges: DataFrame, start: DataFrame, maxDepth: Int,
      direction: Direction = Out): DataFrame = {
    val step = direction match {
      case Out  => edges.select(col("src").as("from"), col("dst").as("to"))
      case In   => edges.select(col("dst").as("from"), col("src").as("to"))
      case Both => edges.select(col("src").as("from"), col("dst").as("to"))
        .union(edges.select(col("dst").as("from"), col("src").as("to")))
    }
    var visited = start.select(col("id"), lit(0).as("depth"),
      array(col("id")).as("path")).localCheckpoint(eager = true)
    var frontier = visited
    var d = 0
    while (d < maxDepth && !frontier.isEmpty) {
      d += 1
      // one (arbitrary deterministic: min path) shortest path per node
      val expanded = frontier.join(step, frontier("id") === step("from"), "inner")
        .select(col("to").as("id"), concat(col("path"), array(col("to"))).as("path"))
        .groupBy("id").agg(min(col("path")).as("path"))
        .join(visited, Seq("id"), "left_anti")
        .select(col("id"), lit(d).as("depth"), col("path"))
        .localCheckpoint(eager = true)
      visited = visited.union(expanded).localCheckpoint(eager = true)
      frontier = expanded
    }
    visited
  }
}
