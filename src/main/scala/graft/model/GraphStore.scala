package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mutable graph sessions over a [[VersionedStore]] — the write path
  * the reference exposes as `make-<type>` / copy-modify-`save` /
  * `mark-deleted` inside `with-transaction` (reference
  * vertex.lisp:105-146, interface.lisp:3-38, transactions.lisp), with
  * queries running over the committed (or a pinned) epoch through the
  * same PropertyGraph/pattern surface as file-backed graphs.
  *
  * Vertex tables are stored as `v_<label>`, edge tables as `e_<label>`
  * so one store carries a whole graph; a commit touching several of
  * them is atomic (single epoch pointer — the all-indexes-at-once
  * guarantee).
  */
final class GraphStore(val spark: SparkSession, val schema: GraphSchema, dir: String) {

  val store = new VersionedStore(spark, dir)

  private def vTable(label: String) = s"v_$label"
  private def eTable(label: String) = s"e_$label"

  /** Graph view at the latest (or a pinned) epoch. Frames arrive
    * already versioned-resolved; `deleted` is filtered by read().
    */
  def graph(asOf: Option[Long] = None): PropertyGraph = {
    def nonEmpty(df: DataFrame) = df.columns.nonEmpty
    val vs = schema.vertexTypes.keys.map { l =>
      l -> store.read(vTable(l), asOf)
    }.filter { case (_, df) => nonEmpty(df) }.toMap
      .map { case (l, df) => l -> df.drop("rev", "deleted", "commit_epoch") }
    val es = schema.edgeTypes.keys.map { l =>
      l -> store.read(eTable(l), asOf)
    }.filter { case (_, df) => nonEmpty(df) }.toMap
      // edge `id` stays visible so callers can address edges in
      // update/delete transactions
      .map { case (l, df) => l -> df.drop("rev", "deleted", "commit_epoch") }
    new PropertyGraph(schema, vs, es)
  }

  /** One transaction: stage creates/updates/deletes across labels, then
    * commit atomically. Rev bookkeeping is handled here (lookup of
    * current revisions); OCC conflicts surface as ConflictException.
    */
  final class Txn {
    private var writes = Map.empty[String, DataFrame]

    private def stage(table: String, rows: DataFrame): Unit =
      writes += table -> writes.get(table).map(_.unionByName(rows, allowMissingColumns = true)).getOrElse(rows)

    /** Insert new vertices: frame of (id, props…) at rev 1. */
    def createVertices(label: String, rows: DataFrame): Txn = {
      schema.requireVertex(label)
      stage(vTable(label), rows.withColumn("rev", lit(1L)).withColumn("deleted", lit(false)))
      this
    }

    /** copy → mutate → save: new revision per updated row. The caller
      * passes full replacement rows (id, props…); revisions are
      * current+1, so a concurrent bump fails validation (OCC).
      */
    def updateVertices(label: String, rows: DataFrame): Txn = {
      val cur = store.read(vTable(label)).select(col("id"), col("rev").as("__cur"))
      stage(vTable(label), rows.join(cur, Seq("id"), "left")
        .withColumn("rev", coalesce(col("__cur") + 1, lit(1L)))
        .withColumn("deleted", lit(false))
        .drop("__cur"))
      this
    }

    /** mark-deleted: tombstone revision. */
    def deleteVertices(label: String, ids: DataFrame): Txn = {
      val cur = store.read(vTable(label))
      stage(vTable(label), cur.join(ids.select(col("id")), Seq("id"), "left_semi")
        .withColumn("rev", col("rev") + 1)
        .withColumn("deleted", lit(true)))
      this
    }

    /** Insert edges: (src, dst, weight, props…); ids are assigned from
      * a hash of (src, dst, weight, insertion salt) — stable for the
      * frame, unique enough for edge identity.
      */
    def createEdges(label: String, rows: DataFrame): Txn = {
      schema.requireEdge(label)
      val withId = (if (rows.columns.contains("id")) rows
        else rows.withColumn("id",
          xxhash64(lit(label), col("src"), col("dst"), monotonically_increasing_id())))
        .withColumn("rev", lit(1L)).withColumn("deleted", lit(false))
      stage(eTable(label), withId)
      this
    }

    /** Update edges by id (full replacement rows: id, src, dst, weight,
      * props…) — copy-modify-save for edges (edge.lisp:258-268 analog).
      */
    def updateEdges(label: String, rows: DataFrame): Txn = {
      require(rows.columns.contains("id"), "edge updates need the edge id")
      val cur = store.read(eTable(label)).select(col("id"), col("rev").as("__cur"))
      stage(eTable(label), rows.join(cur, Seq("id"), "left")
        .withColumn("rev", coalesce(col("__cur") + 1, lit(1L)))
        .withColumn("deleted", lit(false))
        .drop("__cur"))
      this
    }

    /** Tombstone edges by id (delete-edge, edge.lisp:269-273). */
    def deleteEdges(label: String, ids: DataFrame): Txn = {
      val cur = store.read(eTable(label))
      stage(eTable(label), cur.join(ids.select(col("id")), Seq("id"), "left_semi")
        .withColumn("rev", col("rev") + 1)
        .withColumn("deleted", lit(true)))
      this
    }

    def commit(): Long = store.commit(writes)
  }

  def txn(): Txn = new Txn
}
