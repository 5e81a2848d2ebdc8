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

  // persist the declared types beside the data (the reference's
  // node-type table, schema.lisp:38-49) so [[GraphStore.open]] can
  // reopen this store by location alone. Written atomically (tmp +
  // move) and only when the canonical JSON changed — schema evolution
  // through a widened code-side declaration updates the file; plain
  // reopens are no-ops.
  locally {
    val json = GraphSchema.toJson(schema)
    val p = java.nio.file.Paths.get(dir, "_schema.json")
    val current =
      if (!java.nio.file.Files.exists(p)) None
      else Some(new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8))
    if (!current.contains(json)) {
      java.nio.file.Files.createDirectories(p.getParent)
      val tmp = java.nio.file.Paths.get(dir, s"_schema.json.tmp.${java.util.UUID.randomUUID()}")
      java.nio.file.Files.write(tmp,
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, p,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
  }

  private def vTable(label: String) = s"v_$label"
  private def eTable(label: String) = s"e_$label"

  /** Opt every existing schema table into the store's current-state
    * index: latest-state graph() reads then cost O(current + recent
    * deltas) instead of windowing the full MVCC history. Tables created
    * by later commits can be opted in by calling this again.
    */
  def enableCurrentIndex(): Unit =
    (schema.vertexTypes.keys.map(vTable) ++ schema.edgeTypes.keys.map(eTable))
      .foreach(store.compactCurrent)

  /** Storage table name for a schema label (vertex or edge). */
  def tableFor(label: String): String =
    if (schema.vertexTypes.contains(label)) vTable(label)
    else if (schema.edgeTypes.contains(label)) eTable(label)
    else throw new IllegalArgumentException(s"unknown label: $label")

  // Commit hooks — the reference runs view maintenance and the
  // replication stream inside the transaction's apply phase
  // (transactions.lisp:601-744, 1005-1425); here subscribers get the
  // committed epoch plus the materialized staged frames per table.
  private val commitListeners = scala.collection.mutable.ArrayBuffer
    .empty[(Long, Map[String, DataFrame], Map[String, DataFrame]) => Unit]
  def onCommit(f: (Long, Map[String, DataFrame]) => Unit): Unit =
    commitListeners.synchronized { commitListeners += ((e, fr, _) => f(e, fr)) }

  // tables whose PRE-commit live rows some listener needs captured
  // under the commit lock (VersionedStore.commitCaptures)
  private val prevCaptureTables = scala.collection.mutable.Set.empty[String]

  /** Like [[onCommit]], but the listener's third argument carries —
    * for `table`, when this commit staged rows there — the PRE-commit
    * live values of the staged ids, captured and materialized while
    * the commit still held the store's write lock. The hook for a
    * maintained aggregate (signed histogram deltas) consumes these
    * instead of an asOf(epoch−1) read, which a concurrent
    * `vacuum(keep=1)` could starve of the superseded revisions (see
    * [[VersionedStore.commitCaptures]]).
    */
  def onCommitWithPrev(table: String)(
      f: (Long, Map[String, DataFrame], Map[String, DataFrame]) => Unit): Unit = {
    prevCaptureTables.synchronized { prevCaptureTables += table }
    commitListeners.synchronized { commitListeners += f }
  }

  /** A commit hook failed AFTER the transaction became durable: the
    * data IS committed (retrying the transaction would conflict); only
    * the listed side effects (view deltas, replication sync) did not
    * run for this epoch. Views self-correct on their next regenerate or
    * maintained commit; a replica converges on its next sync.
    */
  final class CommitHookException(val epoch: Long, causes: Seq[Throwable])
    extends RuntimeException(
      s"commit epoch $epoch is durable, but ${causes.size} commit hook(s) failed: " +
        causes.map(_.toString).mkString("; ")) {
    causes.foreach(addSuppressed)
  }

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

  /** Validate + conform externally-supplied vertex rows (the REST
    * tier's JSON, rest.lisp:620-763) against the declared schema and
    * the stored table's types. Untrusted input must not be able to
    * append a conflicting parquet schema: a type-mismatched column
    * (e.g. a string id) would otherwise poison every subsequent read
    * of the table. Throws IllegalArgumentException (→ HTTP 400) on
    * unknown columns, a missing id, or values that do not cast.
    */
  def conformVertices(label: String, rows: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val vt = schema.requireVertex(label)
    val allowed = vt.props.toSet + "id"
    val unknown = rows.columns.filterNot(allowed)
    require(unknown.isEmpty, s"unknown columns for vertex '$label': ${unknown.mkString(", ")}")
    require(rows.columns.contains("id"), "each row needs an 'id'")
    val stored = store.read(vTable(label))
    val target: Map[String, DataType] =
      if (stored.columns.nonEmpty)
        stored.schema.fields.map(f => f.name -> f.dataType).toMap
      else Map("id" -> LongType)
    val castCols = rows.columns.filter(target.contains).toSeq
    // try_cast (null on failure, even under ANSI) so bad values surface
    // as a 400, not a runtime SparkException mid-write
    val badRow = castCols
      .map(c => col(c).isNotNull && col(c).try_cast(target(c)).isNull)
      .reduceOption(_ || _)
    badRow.foreach { cond =>
      val bad = rows.filter(cond)
      if (!bad.isEmpty) {
        val sample = bad.limit(3).collect().map(_.json).mkString("; ")
        throw new IllegalArgumentException(
          s"rows do not conform to stored schema of '$label': $sample")
      }
    }
    val meta = Set("rev", "deleted", "commit_epoch")
    val missing = target.keys.filterNot(meta).filterNot(rows.columns.contains).toSeq.sorted
    val out = rows.select(rows.columns.toSeq.map(c =>
      if (target.contains(c)) col(c).cast(target(c)).as(c) else col(c)): _*)
    missing.foldLeft(out)((df, c) => df.withColumn(c, lit(null).cast(target(c))))
  }

  /** Edge-row analog of [[conformVertices]]: allowed columns are the
    * declared props plus (src, dst, weight, id); src/dst are required
    * and must cast to long. Same 400-on-mismatch contract.
    */
  def conformEdges(label: String, rows: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val et = schema.requireEdge(label)
    val allowed = et.props.toSet ++ Set("src", "dst", "weight", "id")
    val unknown = rows.columns.filterNot(allowed)
    require(unknown.isEmpty, s"unknown columns for edge '$label': ${unknown.mkString(", ")}")
    require(Set("src", "dst").subsetOf(rows.columns.toSet), "each edge row needs src and dst")
    val stored = store.read(eTable(label))
    val target: Map[String, DataType] =
      if (stored.columns.nonEmpty)
        stored.schema.fields.map(f => f.name -> f.dataType).toMap
      else Map("src" -> LongType, "dst" -> LongType, "id" -> LongType,
        "weight" -> DoubleType)
    val castCols = rows.columns.filter(target.contains).toSeq
    val badRow = castCols
      .map(c => col(c).isNotNull && col(c).try_cast(target(c)).isNull)
      .reduceOption(_ || _)
    badRow.foreach { cond =>
      val bad = rows.filter(cond)
      if (!bad.isEmpty) {
        val sample = bad.limit(3).collect().map(_.json).mkString("; ")
        throw new IllegalArgumentException(
          s"rows do not conform to stored schema of edge '$label': $sample")
      }
    }
    val meta = Set("rev", "deleted", "commit_epoch")
    val missing = target.keys.filterNot(meta).filterNot(_ == "id")
      .filterNot(rows.columns.contains).toSeq.sorted
    val out = rows.select(rows.columns.toSeq.map(c =>
      if (target.contains(c)) col(c).cast(target(c)).as(c) else col(c)): _*)
    missing.foldLeft(out)((df, c) =>
      // absent weight defaults to 1.0 (the unweighted-edge convention
      // everywhere else in the engine); absent props arrive as nulls
      df.withColumn(c, (if (c == "weight") lit(1.0) else lit(null)).cast(target(c))))
  }

  /** One transaction: stage creates/updates/deletes across labels, then
    * commit atomically. Rev bookkeeping is handled here (lookup of
    * current revisions); OCC conflicts surface as ConflictException.
    */
  final class Txn {
    // snapshot isolation: every in-txn read and every staged revision
    // derives from the epoch current at txn CREATION, so a commit that
    // lands in between makes THIS txn's commit fail OCC validation
    // (first-committer-wins) instead of silently absorbing a stale
    // read-modify-write — the reference's with-transaction semantics
    // (transactions.lisp validate 236-246: revisions are checked
    // against the txn's read snapshot, not the staging instant)
    private val snapshotEpoch = store.currentEpoch
    // staged as BUILD THUNKS, not DataFrames (r17): a path-based
    // parquet read captures its FILE LISTING when the plan is built,
    // so a rev-derivation frame built at staging time and executed
    // under the commit lock raced any vacuum that swapped the table
    // dir in between (FAILED_READ_FILE on the REST write path —
    // reproduced by ServiceFuzzSpec's compaction storm). The thunks
    // evaluate inside commitCaptures' write lock (commitCaptures takes
    // the map by-name), where vacuum — which takes the same lock —
    // cannot interleave. Caller-visible validation (schema and
    // satisfies-check) stays EAGER at staging, where the specs pin it;
    // the snapshot epoch stays pinned at txn creation, so OCC
    // semantics are unchanged.
    private var writes = Map.empty[String, Seq[() => DataFrame]]

    private def stage(table: String, build: () => DataFrame): Unit =
      writes += table -> (writes.getOrElse(table, Seq.empty) :+ build)

    private def stagedFrames(): Map[String, DataFrame] =
      writes.map { case (t, builds) =>
        t -> builds.map(_()).reduce(_.unionByName(_, allowMissingColumns = true))
      }

    /** Successor revision for new/replacement rows, derived from the
      * latest revision INCLUDING tombstones: a deleted id's next
      * version is tombstone-rev+1 (recreate-after-delete), a never-seen
      * id starts at 1. `conflictOnLive` makes a live id stage rev=1,
      * which OCC validation then rejects — create-over-existing must
      * conflict, not silently overwrite.
      */
    private def withNextRev(table: String, rows: DataFrame, conflictOnLive: Boolean): DataFrame = {
      val cur = store.latestRevisionsFor(table, rows, snapshotEpoch)
        .select(col("id"), col("rev").as("__cur"), col("deleted").as("__del"))
      val next =
        if (conflictOnLive)
          when(col("__cur").isNull, 1L).when(col("__del"), col("__cur") + 1).otherwise(1L)
        else coalesce(col("__cur") + 1, lit(1L))
      rows.join(cur, Seq("id"), "left")
        .withColumn("rev", next)
        .withColumn("deleted", lit(false))
        .drop("__cur", "__del")
    }

    /** satisfies-type enforcement (example.lisp:9-13; SURVEY §7.4:
      * validation lives in the writer): rows violating the declared
      * check predicate reject the whole transaction.
      */
    private def enforceCheck(label: String, rows: DataFrame): DataFrame = {
      schema.requireVertex(label).check.foreach { pred =>
        val bad = rows.filter(!coalesce(pred, lit(false)))
        if (!bad.isEmpty) {
          val sample = bad.limit(3).collect().map(_.json).mkString("; ")
          throw new IllegalArgumentException(
            s"rows violate the '$label' satisfies-check: $sample")
        }
      }
      rows
    }

    /** Insert new vertices: frame of (id, props…). Rev 1 for fresh ids,
      * tombstone+1 when recreating a deleted id; a live id conflicts.
      */
    def createVertices(label: String, rows: DataFrame): Txn = {
      schema.requireVertex(label)
      val checked = enforceCheck(label, rows)
      stage(vTable(label), () => withNextRev(vTable(label), checked, conflictOnLive = true))
      this
    }

    /** copy → mutate → save: new revision per updated row. The caller
      * passes full replacement rows (id, props…); revisions are
      * current+1, so a concurrent bump fails validation (OCC). An
      * update of a deleted id resurrects it (succeeds the tombstone).
      */
    def updateVertices(label: String, rows: DataFrame): Txn = {
      schema.requireVertex(label)
      val checked = enforceCheck(label, rows)
      stage(vTable(label), () => withNextRev(vTable(label), checked, conflictOnLive = false))
      this
    }

    /** mark-deleted: tombstone revision. */
    def deleteVertices(label: String, ids: DataFrame): Txn = {
      // validate like create/update: an unknown label must be the
      // taxonomy's 400, not a zero-column read blowing up downstream
      schema.requireVertex(label)
      stage(vTable(label), () =>
        store.read(vTable(label), Some(snapshotEpoch))
          .join(ids.select(col("id")), Seq("id"), "left_semi")
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
      val withId = if (rows.columns.contains("id")) rows
        else rows.withColumn("id",
          xxhash64(lit(label), col("src"), col("dst"), monotonically_increasing_id()))
      stage(eTable(label), () => withNextRev(eTable(label), withId, conflictOnLive = true))
      this
    }

    /** Update edges by id (full replacement rows: id, src, dst, weight,
      * props…) — copy-modify-save for edges (edge.lisp:258-268 analog).
      * Like vertices, an update of a deleted edge id resurrects it.
      */
    def updateEdges(label: String, rows: DataFrame): Txn = {
      require(rows.columns.contains("id"), "edge updates need the edge id")
      stage(eTable(label), () => withNextRev(eTable(label), rows, conflictOnLive = false))
      this
    }

    /** Tombstone edges by id (delete-edge, edge.lisp:269-273). */
    def deleteEdges(label: String, ids: DataFrame): Txn = {
      schema.requireEdge(label)
      stage(eTable(label), () =>
        store.read(eTable(label), Some(snapshotEpoch))
          .join(ids.select(col("id")), Seq("id"), "left_semi")
          .withColumn("rev", col("rev") + 1)
          .withColumn("deleted", lit(true)))
      this
    }

    /** Stage raw bookkeeping rows in the SAME atomic commit as the
      * transaction's data (single epoch pointer — crash-atomic with
      * the data frames). For engine-internal metadata tables only:
      * the table name must be "_"-prefixed, which keeps it outside
      * the schema surface, the stats report, and the default
      * replication set. The caller owns the OCC rev contract
      * ((id, rev, deleted) with rev = current+1), exactly as
      * [[VersionedStore.commit]] documents.
      */
    private[graft] def stageRaw(table: String, rows: DataFrame): Txn = {
      require(table.startsWith("_"),
        s"raw staging is for '_'-prefixed bookkeeping tables, got: $table")
      stage(table, () => rows)
      this
    }

    def commit(): Long = {
      val capture = prevCaptureTables.synchronized { prevCaptureTables.toSet }
      // stagedFrames() evaluates INSIDE commitCaptures' write lock
      // (by-name parameter): rev-derivation reads list their files
      // where no vacuum can swap the table dir under them
      val (epoch, frames, prev) = store.commitCaptures(stagedFrames(), capture)
      // every listener runs even if an earlier one fails — a broken
      // view hook must not starve the replication hook of an epoch
      val failures = commitListeners.synchronized { commitListeners.toSeq }.flatMap { f =>
        try { f(epoch, frames, prev); None } catch { case e: Exception => Some(e) }
      }
      if (failures.nonEmpty) throw new CommitHookException(epoch, failures)
      epoch
    }

    /** Read-your-writes overlay (SURVEY §7.4): the graph as this
      * transaction sees it — committed state with staged creates/
      * updates/deletes applied, before commit. Mirrors the reference's
      * in-txn visibility (transactions.lisp:185-220 resolves lookups
      * through the txn's write set first).
      */
    def graphView(): PropertyGraph = {
      val stagedNow = stagedFrames()
      def overlay(table: String, committed: DataFrame): DataFrame =
        stagedNow.get(table) match {
          case None => committed
          case Some(staged) =>
            // latest staged version per id wins; tombstones hide rows
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy("id").orderBy(col("rev").desc)
            val latest = staged.withColumn("__rn", row_number().over(w))
              .filter(col("__rn") === 1).drop("__rn")
            val live = latest.filter(!col("deleted")).drop("rev", "deleted")
            val base =
              if (committed.columns.isEmpty) committed
              else committed.join(latest.select("id"), Seq("id"), "left_anti")
            if (base.columns.isEmpty) live
            else base.unionByName(live, allowMissingColumns = true)
        }
      def frames(labels: Iterable[String], table: String => String) = labels.map { l =>
        val committed = store.read(table(l), Some(snapshotEpoch))
          .drop("rev", "deleted", "commit_epoch")
        l -> overlay(table(l), committed)
      }.filter(_._2.columns.nonEmpty).toMap
      new PropertyGraph(schema,
        frames(schema.vertexTypes.keys, vTable),
        frames(schema.edgeTypes.keys, eTable))
    }
  }

  def txn(): Txn = new Txn
}

object GraphStore {
  /** Reopen an existing store by LOCATION alone — the reference's
    * `open-graph` (it never re-declares types at open; the schema is
    * store state). The persisted `_schema.json` (written by every
    * GraphStore construction) supplies the types; `check` predicates
    * are code, not data, so satisfies-type enforcement on a store
    * opened this way requires constructing with the explicit code-side
    * schema instead (documented at [[GraphSchema.toJson]]).
    */
  def open(spark: SparkSession, dir: String): GraphStore = {
    val p = java.nio.file.Paths.get(dir, "_schema.json")
    require(java.nio.file.Files.exists(p),
      s"no persisted schema at $p — not a graph store (or pre-schema-persistence; " +
        "open it once with the explicit schema to stamp it)")
    val schema = GraphSchema.fromJson(new String(
      java.nio.file.Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8))
    new GraphStore(spark, schema, dir)
  }
}
