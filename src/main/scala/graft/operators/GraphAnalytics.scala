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
}
