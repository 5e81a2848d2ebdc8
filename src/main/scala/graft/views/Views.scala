package graft.views

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.{GraphStore, PropertyGraph}

/** CouchDB-style materialized map/(reduce) views — the reference's
  * `def-view` subsystem (reference views.lisp:750-793 macro; 331-374
  * incremental add; 400-427 recompute-on-delete; 544-622 range reads;
  * 674-727 keyed/grand aggregates).
  *
  * A view is declared per node class with a map function (rows →
  * (key, id, value)) and an optional reduce aggregation. `regenerate`
  * materializes it; reads mirror the reference's API:
  *   - mapView: ordered (key,id,value) rows with start/end-key ranges
  *     and skip/count paging (the sorted skip-list scan)
  *   - reducedView: per-key aggregates (`invoke-view :group-p t`)
  *   - grandTotal: the master `:gagg` row (globals.lisp:93)
  *
  * Storage layout per view (`<storageDir>/views/<name>/`):
  *   - `base/` — the full materialization, range-partitioned and
  *     sorted by key (`repartitionByRange` + `sortWithinPartitions`),
  *     so parquet row-group min/max stats give the same key-range
  *     pruning the reference's skip-list gave.
  *   - `delta/commit_epoch=<e>/` — one small partition per store
  *     commit that touched the view's source, written by the
  *     write-path maintenance hook ([[bindTo]]). Each holds the fresh
  *     map rows for every touched source id plus an id tombstone
  *     marker; reads supersede at id granularity (newest epoch wins),
  *     so updates replace their old map rows and deletes vanish —
  *     views.lisp:331-374 / 400-427 semantics without rewriting base.
  *
  * Scale design: per-commit deltas are tiny appends (no base
  * rewrite, no source rescan beyond the commit's own staged rows);
  * reads merge base with an anti-join against the (small, broadcast)
  * delta id set. `regenerate` doubles as compaction — it folds all
  * deltas back into a pruned, sorted base and clears them, bounding
  * merge cost between compactions exactly like the reference's
  * periodic view regeneration.
  */
final case class ViewDef(
    name: String,
    sourceLabel: String,
    /** source frame → (key, id, value) rows; may yield 0..n per row. */
    mapFn: DataFrame => DataFrame,
    /** aggregate over `value` grouped by `key`, e.g. sum(col("value")). */
    reduceAgg: Option[Column] = None,
    descending: Boolean = false,
    /** OPTIONAL routing metadata for automatic view routing
      * ([[graft.query.AggGoal]]): declares that `mapFn` is exactly
      * `key = keyProp column, value = valueProp column` (one row per
      * source row) and `reduceAgg` is `routedAgg(value)` — the
      * contract under which a declarative per-key aggregate may be
      * served from this view's materialization instead of rescanning
      * the source. The contract is VALIDATED at register time
      * ([[ViewCatalog.register]]): both props set, a reduce present,
      * and — where the Column is introspectable — the reduce's SQL
      * must be the declared kind over `value`. Leave unset for views
      * whose map is anything richer.
      */
    keyProp: Option[String] = None,
    valueProp: Option[String] = None,
    /** Which aggregate the routing contract promises: one of
      * sum/count/min/max/avg (count means ROW count — declare
      * `count(lit(1))` as the reduce). Only consulted when
      * keyProp/valueProp are set.
      */
    routedAgg: String = "sum")

object ViewDef {
  /** Aggregate kinds the routing contract may declare, with the
    * canonical SQL the reduce Column must render to (whitespace /
    * backquote / case insensitive).
    */
  private[views] val routedAggSql: Map[String, Set[String]] = Map(
    "sum" -> Set("sum(value)"),
    "count" -> Set("count(1)"),
    "min" -> Set("min(value)"),
    "max" -> Set("max(value)"),
    "avg" -> Set("avg(value)"))
}

/** Where a catalog's views read their source rows from: a static
  * [[PropertyGraph]] (file-backed graphs) or a live [[GraphStore]]
  * (always the latest committed epoch).
  */
trait ViewSources {
  def knows(label: String): Boolean
  def frame(label: String): DataFrame
  /** True when the source can change underneath a materialization (a
    * live store) — automatic view routing then requires the catalog
    * to be BOUND (commit-maintained) AND the materialization to COVER
    * the store epoch that existed at bind time (see
    * [[ViewCatalog.routeFor]]).
    */
  def isLive: Boolean
  /** The source's current commit epoch (0 for static sources, which
    * cannot drift). Recorded by `regenerate` so routing can tell a
    * current materialization from one a reopened catalog inherited.
    */
  def epoch: Long
}

object ViewSources {
  def apply(g: PropertyGraph): ViewSources = new ViewSources {
    def knows(l: String): Boolean = g.vertexLabels.contains(l) || g.edgeLabels.contains(l)
    def frame(l: String): DataFrame =
      if (g.vertexLabels.contains(l)) g.vertices(l) else g.edgeFrame(l)
    def isLive: Boolean = false
    def epoch: Long = 0L
  }
  def apply(gs: GraphStore): ViewSources = new ViewSources {
    def knows(l: String): Boolean =
      gs.schema.vertexTypes.contains(l) || gs.schema.edgeTypes.contains(l)
    def frame(l: String): DataFrame = {
      val g = gs.graph()
      if (gs.schema.vertexTypes.contains(l)) g.vertices(l) else g.edgeFrame(l)
    }
    def isLive: Boolean = true
    def epoch: Long = gs.store.currentEpoch
  }
}

final class ViewCatalog(spark: SparkSession, sources: ViewSources, storageDir: String) {

  def this(spark: SparkSession, graph: PropertyGraph, storageDir: String) =
    this(spark, ViewSources(graph), storageDir)
  def this(spark: SparkSession, store: GraphStore, storageDir: String) =
    this(spark, ViewSources(store), storageDir)

  private var defs = Map.empty[String, ViewDef]
  private var bound = false
  // the store epoch at bindTo: the currency watermark routing must
  // prove a view's materialization covers (commits after bind are
  // maintained by the hook in the commit call stack)
  private var boundAtEpoch = 0L
  // maintenance monitor: regenerate (compaction) and the commit-hook
  // delta appends serialize per catalog, so a hook's delta can never
  // land in a generation that a concurrent regenerate is about to
  // supersede without its data (the MaintainedIndexes contract,
  // applied to views — the storm suite hammers this interleaving)
  private val maintLock = new Object
  private def path(name: String) = s"$storageDir/views/$name"
  private def viewRoot(name: String) = Paths.get(path(name))
  // base/delta live inside the current GENERATION dir (GenDirs):
  // regenerate publishes a fresh generation instead of swapping base
  // in place, so reads racing a regenerate never lose their files
  private def basePath(name: String) =
    graft.model.GenDirs.current(viewRoot(name)).resolve("base")
  private def deltaPath(name: String) =
    graft.model.GenDirs.current(viewRoot(name)).resolve("delta")

  private def rmTree(f: java.nio.file.Path): Unit = graft.model.Dirs.rmTree(f)
  /** Complete an interrupted LEGACY-layout swap (pre-generation dirs:
    * mid-swap the base dir is briefly absent while the previous
    * materialization sits in `__old`) — restore it. Generation-layout
    * publishes are crash-safe by construction (GenDirs), so this is a
    * no-op once `_GEN` exists.
    */
  private def heal(name: String): Unit = {
    if (Files.exists(viewRoot(name).resolve("_GEN"))) return
    val p = Paths.get(path(name), "base"); val old = Paths.get(path(name), "base__old")
    if (!Files.exists(p) && Files.exists(old))
      Files.move(old, p, StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(p)) {
      rmTree(Paths.get(path(name), "base__old")); rmTree(Paths.get(path(name), "base__tmp"))
    }
  }

  def register(v: ViewDef): Unit = {
    require(sources.knows(v.sourceLabel), s"unknown source label ${v.sourceLabel}")
    // VALIDATE the routing contract at register time (not at route
    // time): a ViewDef that declares keyProp/valueProp but whose
    // reduce is not the declared aggregate over `value` would be
    // routed to silently wrong answers. Where Catalyst can render the
    // unresolved Column to SQL we check it literally; a Column too
    // opaque to render is REJECTED — the routing contract only admits
    // the five introspectable kinds anyway, and a plain reducedView
    // never consults the metadata.
    if (v.keyProp.isDefined || v.valueProp.isDefined) {
      require(v.keyProp.isDefined && v.valueProp.isDefined,
        s"view ${v.name}: routing metadata needs BOTH keyProp and valueProp")
      val expected = ViewDef.routedAggSql.getOrElse(v.routedAgg,
        throw new IllegalArgumentException(
          s"view ${v.name}: routedAgg '${v.routedAgg}' is not one of " +
            ViewDef.routedAggSql.keys.toSeq.sorted.mkString("/")))
      val agg = v.reduceAgg.getOrElse(throw new IllegalArgumentException(
        s"view ${v.name}: routing metadata requires a reduceAgg"))
      val rendered = (try agg.toString catch { case scala.util.control.NonFatal(_) =>
        "<unrenderable>" }).toLowerCase.replaceAll("[\\s`']", "")
      require(expected.contains(rendered),
        s"view ${v.name}: declared routedAgg '${v.routedAgg}' but reduceAgg renders " +
          s"as '$rendered' (expected ${expected.mkString(" or ")}) — fix the reduce " +
          "or drop the keyProp/valueProp routing metadata")
    }
    defs += v.name -> v
  }

  def definition(name: String): ViewDef =
    defs.getOrElse(name, throw new IllegalArgumentException(s"unknown view: $name"))

  /** Registered view names (stable order). */
  def names: Seq[String] = defs.keys.toSeq.sorted

  /** Storage root of one view's materialization (GenDirs layout) —
    * the telemetry surface walks it for base/delta sizes.
    */
  def rootOf(name: String): java.nio.file.Path = { definition(name); viewRoot(name) }

  /** Automatic view routing ([[graft.query.AggGoal]]): the name of a
    * registered view that can SERVE the per-`keyProp` `agg` of
    * `valueProp` over `label` — declared routing metadata matches
    * (including the aggregate kind), the view is materialized, and
    * the materialization is CURRENT. Currency for a live store is
    * epoch-proven, not trusted from the in-process `bound` flag
    * alone: the view's COVERED epoch (the store epoch recorded by its
    * last regenerate, advanced by every commit delta) must reach the
    * epoch the store had when the catalog was bound — commits after
    * bind are hook-maintained in the commit call stack, so covering
    * the bind epoch covers everything. A catalog reopened over an
    * old materialization and bound to a store that advanced since
    * therefore refuses to route until a regenerate catches it up —
    * conservative by design, the fallback recompute is always
    * correct. Candidates are scanned in sorted-name order, so a tie
    * between identically-declared views routes deterministically.
    */
  def routeFor(label: String, keyProp: String, valueProp: String,
      agg: String = "sum"): Option[String] =
    names.iterator.map(defs).collectFirst {
      case v if v.sourceLabel == label && v.keyProp.contains(keyProp) &&
          v.valueProp.contains(valueProp) && v.routedAgg == agg &&
          v.reduceAgg.isDefined &&
          Files.exists(basePath(v.name)) &&
          (!sources.isLive || (bound && coveredEpoch(v.name) >= boundAtEpoch)) =>
        v.name
    }

  /** The highest store epoch this view's materialization PROVABLY
    * covers contiguously: the epoch stamped by its last regenerate
    * (`_EPOCH` in the generation dir; 0 for legacy/static
    * materializations). Commit-delta partitions deliberately do NOT
    * advance this: deltas only exist for commits made while the
    * catalog was bound (hook-maintained in the commit call stack), so
    * they never extend contiguous coverage past the stamp — folding
    * them in would let ONE post-bind commit mask every unmaintained
    * commit that landed between the stamp and bindTo (a reopened
    * stale materialization would route and silently drop the gap's
    * rows; the r10 advisory's exact scenario).
    */
  private def coveredEpoch(name: String): Long = {
    val g = graft.model.GenDirs.current(viewRoot(name))
    val f = g.resolve("_EPOCH")
    if (!Files.exists(f)) 0L
    else try new String(Files.readAllBytes(f),
      java.nio.charset.StandardCharsets.UTF_8).trim.toLong
    catch { case _: NumberFormatException => 0L }
  }

  /** Compute the view's map output from the current source state. */
  def compute(name: String): DataFrame = {
    val v = definition(name)
    val mapped = v.mapFn(sources.frame(v.sourceLabel))
    require(Set("key", "id", "value").subsetOf(mapped.columns.toSet),
      s"view ${v.name} map output must have (key, id, value), got ${mapped.columns.mkString(",")}")
    mapped.select("key", "id", "value")
  }

  /** Full (re)materialization — `regenerate-view` (views.lisp:487-535).
    * Range-partitioned + sorted by key for pruned range reads. Also the
    * delta-compaction step: the fresh base reflects every committed
    * delta (it reads the live source), so accumulated delta partitions
    * are cleared afterwards.
    */
  def regenerate(name: String, numPartitions: Int = 0): Unit = maintLock.synchronized {
    // epoch stamp read BEFORE the source scan: the materialization
    // provably covers at least this epoch (a commit landing during
    // the scan is either visible in it or appends a delta once this
    // publish releases maintLock — covered either way)
    val epoch0 = sources.epoch
    val mapped = compute(name)
    val n = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    heal(name)
    // publish a fresh generation (GenDirs): the new base reflects every
    // committed delta (it reads the live source, and delta appends
    // serialize with this publish under maintLock), so the generation
    // starts with an empty delta log — compaction. A crash at any
    // point leaves the previous generation current and intact.
    graft.model.GenDirs.publish(viewRoot(name)) { g =>
      mapped
        .repartitionByRange(n, col("key"))
        .sortWithinPartitions("key", "id")
        .write.mode("overwrite").parquet(g.resolve("base").toString)
      Files.write(g.resolve("_EPOCH"),
        epoch0.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  /** The merged view: base plus any post-base commit deltas, superseded
    * at id granularity (newest delta epoch per id wins; tombstone-only
    * ids disappear). With no deltas this is a plain pruned base read.
    */
  private def materialized(name: String): DataFrame = {
    definition(name)
    heal(name)
    // one pinned generation: base and delta resolve from the same dir,
    // so a read never straddles a concurrent regenerate (see GenDirs).
    // One-generation sweep grace covers prompt consumption; a slow
    // consumer uses withPinnedRead
    materializedIn(name, graft.model.GenDirs.current(viewRoot(name)))
  }

  /** LEASED view read for plans consumed slowly (GenDirs leases): the
    * generation backing the frame handed to `body` is pinned against
    * the compaction sweeper until `body` returns, so the read survives
    * arbitrarily many concurrent regenerates. Build AND consume inside
    * `body` — bodies may run arbitrarily long: the lease heartbeats
    * (GenDirs.withLease), so reads outliving the pin TTL keep
    * protection.
    */
  def withPinnedRead[T](name: String)(body: DataFrame => T): T = {
    definition(name)
    heal(name)
    graft.model.GenDirs.withLease(viewRoot(name)) { g =>
      body(materializedIn(name, g))
    }
  }

  private def materializedIn(name: String, g: java.nio.file.Path): DataFrame = {
    val base0 = g.resolve("base")
    val delta0 = g.resolve("delta")
    require(Files.exists(base0),
      s"view $name is not materialized — call regenerate first")
    val base = spark.read.parquet(base0.toString)
    if (!graft.model.Dirs.hasReadableDeltaFiles(delta0)) base
    else {
      val deltas = spark.read.parquet(delta0.toString)
      val latest = deltas
        .withColumn("__me", max("commit_epoch").over(Window.partitionBy("id")))
        .filter(col("commit_epoch") === col("__me") && !col("__tomb"))
        .select("key", "id", "value")
      base.join(deltas.select("id").distinct(), Seq("id"), "left_anti")
        .select("key", "id", "value")
        .unionByName(latest)
    }
  }

  /** Ordered range scan with paging — `map-view` (views.lisp:544-622). */
  def mapView(name: String, startKey: Option[Any] = None, endKey: Option[Any] = None,
      skip: Int = 0, count: Int = Int.MaxValue): DataFrame = {
    val v = definition(name)
    var df = materialized(name)
    startKey.foreach(k => df = df.filter(col("key") >= lit(k)))
    endKey.foreach(k => df = df.filter(col("key") <= lit(k)))
    val ord = if (v.descending) Seq(col("key").desc, col("id").asc)
      else Seq(col("key").asc, col("id").asc)
    df = df.orderBy(ord: _*)
    if (skip > 0) df = df.offset(skip)
    if (count != Int.MaxValue) df = df.limit(count)
    df
  }

  /** Exact-key lookup — `invoke-view` (prolog-functors.lisp:734-789). */
  def lookup(name: String, key: Any): DataFrame =
    materialized(name).filter(col("key") === lit(key)).orderBy("id")

  /** Per-key reduce — `map-reduced-view` (views.lisp:627-672). */
  def reducedView(name: String, startKey: Option[Any] = None, endKey: Option[Any] = None): DataFrame = {
    val v = definition(name)
    val agg = v.reduceAgg.getOrElse(
      throw new IllegalArgumentException(s"view $name has no reduce function"))
    var df = materialized(name)
    startKey.foreach(k => df = df.filter(col("key") >= lit(k)))
    endKey.foreach(k => df = df.filter(col("key") <= lit(k)))
    df.groupBy("key").agg(agg.as("value"), count(lit(1)).as("n")).orderBy("key")
  }

  /** The grand-total row (master key `:gagg`, globals.lisp:93). */
  def grandTotal(name: String): DataFrame = {
    val v = definition(name)
    val agg = v.reduceAgg.getOrElse(
      throw new IllegalArgumentException(s"view $name has no reduce function"))
    materialized(name).agg(agg.as("value"), count(lit(1)).as("n"))
  }

  /** Wire this catalog into a store's write path: after every committed
    * transaction, each registered view whose source table the commit
    * touched gets a delta partition in the same call stack — a read
    * after the commit returns sees fresh view rows, the reference's
    * all-views-updated-in-the-commit guarantee (views.lisp:331-374,
    * transactions.lisp:601-744 apply phase).
    */
  def bindTo(gs: GraphStore): Unit = {
    bound = true
    boundAtEpoch = gs.store.currentEpoch
    gs.onCommit { (epoch, frames) =>
      defs.values.foreach { v =>
        // a view on a parent vertex type indexes all subclasses
        // (views.lisp:256-287 ancestor-class lookup), so commits to any
        // concrete descendant table must maintain it. Caveat (reference
        // UUID semantics): id-granularity supersession assumes ids are
        // unique ACROSS the descendant tables.
        val labels =
          if (gs.schema.vertexTypes.contains(v.sourceLabel))
            gs.schema.descendants(v.sourceLabel)
          else Seq(v.sourceLabel)
        labels.foreach { l =>
          frames.get(gs.tableFor(l)).foreach { staged =>
            applyCommitDelta(v.name, staged, epoch,
              vertexLabel = if (gs.schema.vertexTypes.contains(l)) Some(l) else None)
          }
        }
      }
    }
  }

  /** Incremental maintenance for one commit's staged frame of the
    * view's source table (`(id, rev, deleted, props…)`, already
    * materialized by the store). Unmaterialized views are skipped —
    * their first `regenerate` reads the committed state anyway.
    */
  private def applyCommitDelta(name: String, staged: DataFrame, epoch: Long,
      vertexLabel: Option[String] = None): Unit = maintLock.synchronized {
    val v = definition(name)
    if (!Files.exists(basePath(name))) return
    val baseSchema = spark.read.parquet(basePath(name).toString).schema
    val kT = baseSchema("key").dataType
    val iT = baseSchema("id").dataType
    val vT = baseSchema("value").dataType
    // present the rows in the same shape compute()/regenerate feed the
    // map function: PropertyGraph.vertices attaches a `label` column,
    // so a mapFn referencing it must work on both paths
    val live0 = staged.filter(!col("deleted")).drop("rev", "deleted", "commit_epoch")
    val live = vertexLabel match {
      case Some(l) if !live0.columns.contains("label") => live0.withColumn("label", lit(l))
      case _ => live0
    }
    val mapped = v.mapFn(live)
    require(Set("key", "id", "value").subsetOf(mapped.columns.toSet),
      s"view $name map output must have (key, id, value)")
    val rows = mapped.select(col("key").cast(kT).as("key"), col("id").cast(iT).as("id"),
      col("value").cast(vT).as("value"), lit(false).as("__tomb"))
    // a tombstone per touched id: supersedes the id's old map rows even
    // when the new version maps to zero rows (delete / filtering map)
    val tombs = staged.select(col("id").cast(iT).as("id")).distinct()
      .select(lit(null).cast(kT).as("key"), col("id"), lit(null).cast(vT).as("value"),
        lit(true).as("__tomb"))
    rows.unionByName(tombs).coalesce(1).write.mode("append")
      .parquet(s"${deltaPath(name)}/commit_epoch=$epoch")
  }

  /** Standalone append/replace delta for graph-backed catalogs (no
    * store in the loop): maps `deltaSource` rows and writes them as the
    * next delta partition. Ids already in the view are replaced (id
    * supersession), new ids appended.
    */
  def appendDelta(name: String, deltaSource: DataFrame): Unit = maintLock.synchronized {
    val v = definition(name)
    // a bound catalog numbers delta partitions by STORE epoch; a
    // self-numbered append would collide with the store's next commit
    // epoch and merge two logical commits into one supersession unit
    require(!bound,
      s"catalog is bound to a store — mutate through store commits, not appendDelta")
    require(Files.exists(basePath(name)),
      s"view $name is not materialized — call regenerate first")
    val d = deltaPath(name)
    val next = graft.model.Dirs.childNames(d)
      .filter(_.startsWith("commit_epoch="))
      .map(_.stripPrefix("commit_epoch=").toLong)
      .foldLeft(0L)(math.max) + 1L
    val baseSchema = spark.read.parquet(basePath(name).toString).schema
    val mapped = v.mapFn(deltaSource)
    require(Set("key", "id", "value").subsetOf(mapped.columns.toSet),
      s"view $name map output must have (key, id, value)")
    mapped.select(
      col("key").cast(baseSchema("key").dataType).as("key"),
      col("id").cast(baseSchema("id").dataType).as("id"),
      col("value").cast(baseSchema("value").dataType).as("value"),
      lit(false).as("__tomb"))
      .coalesce(1).write.mode("append").parquet(s"$d/commit_epoch=$next")
  }
}
