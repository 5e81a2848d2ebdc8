package graft.views

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.PropertyGraph

/** CouchDB-style materialized map/(reduce) views — the reference's
  * `def-view` subsystem (reference views.lisp:750-793 macro; 331-374
  * incremental add; 544-622 range reads; 674-727 keyed/grand
  * aggregates).
  *
  * A view is declared per node class with a map function (rows →
  * (key, id, value)) and an optional reduce aggregation. `regenerate`
  * materializes it; reads mirror the reference's API:
  *   - mapView: ordered (key,id,value) rows with start/end-key ranges
  *     and skip/count paging (the sorted skip-list scan)
  *   - reducedView: per-key aggregates (`invoke-view :group-p t`)
  *   - grandTotal: the master `:gagg` row (globals.lisp:93)
  *
  * Scale design: materialized views are written range-partitioned and
  * sorted by key (`repartitionByRange` + `sortWithinPartitions`), so
  * parquet row-group min/max stats give the same key-range pruning the
  * reference's skip-list gave — a range read touches only the files
  * whose key span intersects.
  */
final case class ViewDef(
    name: String,
    sourceLabel: String,
    /** source frame → (key, id, value) rows; may yield 0..n per row. */
    mapFn: DataFrame => DataFrame,
    /** aggregate over `value` grouped by `key`, e.g. sum(col("value")). */
    reduceAgg: Option[Column] = None,
    descending: Boolean = false)

final class ViewCatalog(spark: SparkSession, graph: PropertyGraph, storageDir: String) {

  private var defs = Map.empty[String, ViewDef]
  private def path(name: String) = s"$storageDir/views/$name"

  import java.nio.file.{Files, Paths, StandardCopyOption}
  private def rmTree(f: java.nio.file.Path): Unit = if (Files.exists(f)) {
    if (Files.isDirectory(f)) Files.list(f).forEach(rmTree)
    Files.delete(f)
  }
  /** Complete an interrupted [[regenerate]] swap: mid-swap the view dir
    * is briefly absent while the previous materialization sits in
    * `__old` — restore it (same discipline as VersionedStore.vacuum).
    */
  private def heal(name: String): Unit = {
    val p = Paths.get(path(name)); val old = Paths.get(path(name) + "__old")
    if (!Files.exists(p) && Files.exists(old))
      Files.move(old, p, StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(p)) { rmTree(Paths.get(path(name) + "__old")); rmTree(Paths.get(path(name) + "__tmp")) }
  }

  def register(v: ViewDef): Unit = {
    require(graph.vertexLabels.contains(v.sourceLabel) || graph.edgeLabels.contains(v.sourceLabel),
      s"unknown source label ${v.sourceLabel}")
    defs += v.name -> v
  }

  def definition(name: String): ViewDef =
    defs.getOrElse(name, throw new IllegalArgumentException(s"unknown view: $name"))

  /** Compute the view's map output from the current graph state. */
  def compute(name: String): DataFrame = {
    val v = definition(name)
    val source =
      if (graph.vertexLabels.contains(v.sourceLabel)) graph.vertices(v.sourceLabel)
      else graph.edgeFrame(v.sourceLabel)
    val mapped = v.mapFn(source)
    require(Set("key", "id", "value").subsetOf(mapped.columns.toSet),
      s"view ${v.name} map output must have (key, id, value), got ${mapped.columns.mkString(",")}")
    mapped.select("key", "id", "value")
  }

  /** Full (re)materialization — `regenerate-view` (views.lisp:487-535).
    * Range-partitioned + sorted by key for pruned range reads.
    */
  def regenerate(name: String, numPartitions: Int = 0): Unit = {
    val mapped = compute(name)
    val n = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // write the full replacement aside, then swap: a crash at any point
    // leaves either the previous or the new materialization intact —
    // overwrite-in-place would destroy the view on failure
    heal(name)
    val tmp = path(name) + "__tmp"
    rmTree(Paths.get(tmp))
    mapped
      .repartitionByRange(n, col("key"))
      .sortWithinPartitions("key", "id")
      .write.mode("overwrite").parquet(tmp)
    val p = Paths.get(path(name))
    Files.createDirectories(p.getParent)
    if (Files.exists(p))
      Files.move(p, Paths.get(path(name) + "__old"), StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), p, StandardCopyOption.ATOMIC_MOVE)
    rmTree(Paths.get(path(name) + "__old"))
  }

  private def materialized(name: String): DataFrame = {
    definition(name)
    heal(name)
    spark.read.parquet(path(name))
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

  /** Incremental maintenance for an appended delta — the on-commit
    * update path (views.lisp:331-374): new map rows are merged into the
    * materialized table. Removals trigger key-group recompute upstream
    * (SURVEY.md §7.4) — handled by regenerate of affected keys.
    */
  def appendDelta(name: String, deltaSource: DataFrame): Unit = {
    val v = definition(name)
    val mapped = v.mapFn(deltaSource).select("key", "id", "value")
    mapped.write.mode("append").parquet(path(name))
  }
}
