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

  /** Canonical JSON of the declared types — the persisted node-type
    * table (reference schema.lisp:38-49), so a store can be REOPENED
    * by location alone ([[GraphStore.open]], the `open-graph` analog)
    * without re-declaring the schema in code. Vertices emit in
    * inheritance order (parents before children — the Builder's own
    * precondition), then labels sorted, so equal schemas serialize
    * byte-identically. `check` predicates (satisfies-type Columns) are
    * CODE, not data — they do not persist, exactly as the reference's
    * `:satisfies` names a function the loading image must define; a
    * reopened store re-attaches them by constructing with the explicit
    * code-side schema.
    */
  def toJson(s: GraphSchema): String = {
    def esc(x: String) =
      x.replace("\\", "\\\\").replace("\"", "\\\"")
    def arr(xs: Seq[String]) = xs.map(p => "\"" + esc(p) + "\"").mkString("[", ",", "]")
    val vs = s.vertexTypes.values.toSeq
      .sortBy(v => (s.ancestors(v.label).size, v.label))
      .map(v => s"""{"label": "${esc(v.label)}", "parent": ${
        v.parent.fold("null")(p => "\"" + esc(p) + "\"")}, """ +
        s""""id": "${esc(v.idCol)}", "props": ${arr(v.props)}}""")
    val es = s.edgeTypes.values.toSeq.sortBy(_.label)
      .map(e => s"""{"label": "${esc(e.label)}", "src": "${esc(e.srcLabel)}", """ +
        s""""dst": "${esc(e.dstLabel)}", "props": ${arr(e.props)}}""")
    s"""{"version": 1, "vertices": [${vs.mkString(",")}], "edges": [${es.mkString(",")}]}"""
  }

  def fromJson(json: String): GraphSchema = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    require(root.path("version").asInt(0) == 1,
      s"unsupported schema version: ${root.path("version")}")
    val b = builder()
    root.path("vertices").forEach { v =>
      val props = Seq.newBuilder[String]
      v.path("props").forEach(p => props += p.asText())
      b.vertex(v.path("label").asText(), v.path("id").asText(), props.result(),
        parent = Option(v.get("parent")).filterNot(_.isNull).map(_.asText()))
    }
    root.path("edges").forEach { e =>
      val props = Seq.newBuilder[String]
      e.path("props").forEach(p => props += p.asText())
      b.edge(e.path("label").asText(), e.path("src").asText(),
        e.path("dst").asText(), props.result())
    }
    b.build()
  }

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
