package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A property graph as columnar tables: one vertex frame per label
  * (column `id: Long` + declared props) and one edge frame per label
  * (`src`, `dst`, `weight: Double` + declared props).
  *
  * This is the Spark-side decision recorded in SURVEY.md §1.4: per-label
  * frames mirror the reference's typed-CLOS model (reference
  * node-class.lisp:152-187, edge.lisp:11-20) and give Catalyst column
  * pruning per type, while label-agnostic scans are expressed as unions.
  *
  * Soft delete (reference interface.lisp:15-25): frames may carry a
  * `deleted` boolean column; scans filter it out unless asked not to.
  */
final class PropertyGraph(
    val schema: GraphSchema,
    vertexFrames: Map[String, DataFrame],
    edgeFrames: Map[String, DataFrame],
    /** labels whose frames are small enough to broadcast in joins. */
    val smallLabels: Set[String] = Set.empty) {

  private def dropDeleted(df: DataFrame, includeDeleted: Boolean): DataFrame =
    if (!includeDeleted && df.columns.contains("deleted")) df.filter(!col("deleted")) else df

  /** Raw frame for exactly one vertex label (no subclasses). */
  def vertexFrame(label: String, includeDeleted: Boolean = false): DataFrame =
    dropDeleted(
      vertexFrames.getOrElse(label, throw new IllegalArgumentException(s"no vertex frame: $label")),
      includeDeleted)

  /** Scan of a vertex type including subclasses — the `map-vertices`
    * analog (reference vertex.lisp:157-222). Columns are narrowed to the
    * common id + a `label` discriminator when types are heterogeneous.
    */
  def vertices(label: String, includeSubclasses: Boolean = true, includeDeleted: Boolean = false): DataFrame = {
    // abstract types (no frame of their own) resolve to their concrete
    // descendants, like the reference's subclass walk
    val labels = (if (includeSubclasses) schema.descendants(label) else Seq(label))
      .filter(vertexFrames.contains)
    if (labels.size == 1) vertexFrame(labels.head, includeDeleted).withColumn("label", lit(labels.head))
    else {
      val frames = labels.map { l =>
        vertexFrame(l, includeDeleted).select(col("id"), lit(l).as("label"))
      }
      frames.reduce(_ unionByName _)
    }
  }

  /** Edge scan for one label — `map-edges` with the type bound
    * (reference edge.lisp:305-441); filters and partition pruning on
    * (src, dst) replace the reference's VE/VEV index dispatch.
    */
  def edgeFrame(label: String, includeDeleted: Boolean = false): DataFrame =
    dropDeleted(
      edgeFrames.getOrElse(label, throw new IllegalArgumentException(s"no edge frame: $label")),
      includeDeleted)

  /** Label-agnostic edge scan (type-id 0 scans, edge.lisp:429-440). */
  def allEdges(includeDeleted: Boolean = false): DataFrame =
    edgeFrames.keys.toSeq.sorted
      .map(l => edgeFrame(l, includeDeleted).select(col("src"), col("dst"), col("weight"), lit(l).as("label")))
      .reduce(_ unionByName _)

  /** Point lookup — `lookup-vertex` (reference vertex.lisp:84-91). */
  def lookupVertex(label: String, id: Long): DataFrame =
    vertexFrame(label).filter(col("id") === lit(id))

  /** Adjacency — `outgoing-edges` / `incoming-edges` (edge.lisp:443-455). */
  def outgoingEdges(label: String, srcId: Long): DataFrame =
    edgeFrame(label).filter(col("src") === lit(srcId))
  def incomingEdges(label: String, dstId: Long): DataFrame =
    edgeFrame(label).filter(col("dst") === lit(dstId))

  /** Wrap a frame in a broadcast hint when its label is known-small. */
  def maybeBroadcast(label: String, df: DataFrame): DataFrame =
    if (smallLabels.contains(label)) broadcast(df) else df

  def vertexLabels: Seq[String] = vertexFrames.keys.toSeq.sorted
  def edgeLabels: Seq[String] = edgeFrames.keys.toSeq.sorted

  /** Expose the graph to plain Spark SQL: one temp view per label —
    * `<prefix>v_<label>` / `<prefix>e_<label>` (live rows only). The
    * whole engine stays usable from `spark.sql(...)`, and Catalyst
    * treats the views exactly like the DataFrames they wrap (pushdown,
    * pruning, broadcast all apply).
    */
  def createTempViews(spark: org.apache.spark.sql.SparkSession, prefix: String = "g_"): Unit = {
    vertexLabels.foreach(l => vertexFrame(l).createOrReplaceTempView(s"${prefix}v_$l"))
    edgeLabels.foreach(l => edgeFrame(l).createOrReplaceTempView(s"${prefix}e_$l"))
  }
}
