package graft.model

/** Declared property-graph schema with single-inheritance vertex/edge
  * types — the analog of the reference's `def-vertex` / `def-edge`
  * declarations (reference schema.lisp:427-451) and its persisted
  * node-type table (schema.lisp:38-49).
  *
  * A type declared with a parent participates in its ancestors' scans:
  * `verticesOf(parent)` includes all descendant labels, mirroring the
  * reference's subclass-walking scans (node-class.lisp:108-122).
  */
final case class VertexType(
    label: String,
    parent: Option[String],
    idCol: String,
    props: Seq[String],
    /** satisfies-type predicate (reference example.lisp:9-13 `:satisfies
      * email-p`): a boolean Column over the row's props, enforced by the
      * write path — validation lives in the writer, not the type system
      * (SURVEY §7.4).
      */
    check: Option[org.apache.spark.sql.Column] = None)

final case class EdgeType(
    label: String,
    srcLabel: String,
    dstLabel: String,
    props: Seq[String])

final class GraphSchema private (
    val vertexTypes: Map[String, VertexType],
    val edgeTypes: Map[String, EdgeType]) {

  /** label plus all transitive ancestors, nearest first. */
  def ancestors(label: String): Seq[String] = {
    def walk(l: String): List[String] =
      vertexTypes.get(l).flatMap(_.parent) match {
        case Some(p) => p :: walk(p)
        case None    => Nil
      }
    label :: walk(label)
  }

  /** label plus all transitive descendants (subclass scan set). */
  def descendants(label: String): Seq[String] =
    vertexTypes.keys.filter(l => ancestors(l).contains(label)).toSeq.sorted

  def requireVertex(label: String): VertexType =
    vertexTypes.getOrElse(label, throw new IllegalArgumentException(s"unknown vertex type: $label"))
  def requireEdge(label: String): EdgeType =
    edgeTypes.getOrElse(label, throw new IllegalArgumentException(s"unknown edge type: $label"))
}

object GraphSchema {
  final class Builder {
    private var vts = Map.empty[String, VertexType]
    private var ets = Map.empty[String, EdgeType]
    def vertex(label: String, idCol: String, props: Seq[String], parent: Option[String] = None,
        check: Option[org.apache.spark.sql.Column] = None): Builder = {
      require(parent.forall(vts.contains), s"parent of $label must be declared first")
      vts += label -> VertexType(label, parent, idCol, props, check); this
    }
    def edge(label: String, src: String, dst: String, props: Seq[String] = Nil): Builder = {
      ets += label -> EdgeType(label, src, dst, props); this
    }
    def build(): GraphSchema = new GraphSchema(vts, ets)
  }
  def builder(): Builder = new Builder
}
