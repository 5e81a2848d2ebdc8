package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.PropertyGraph

/** Compiles a [[PatternQuery]] into a DataFrame plan.
  *
  * Where the reference compiled each goal list to a native closure of
  * nested index scans with unification (reference prologc.lisp:611-734,
  * SURVEY.md §3.1), we declare the equivalent joins/filters and let
  * Catalyst do access-path selection: the binding-pattern dispatch of
  * the reference's edge functors (schema.lisp:316-361 — VEV vs VE vs
  * type-index) falls out of predicate pushdown + join planning, and
  * join *order* is chosen by the optimizer instead of the user
  * (a deliberate upgrade, SURVEY.md §4.1).
  *
  * Variable binding model: a bound variable `v` is a column named `v`
  * holding the vertex id; its properties are attached lazily (only when
  * a goal references them) as columns `v__<prop>`, so endpoint
  * resolution joins — the reference's `lookup-vertex` per solution —
  * only happen for variables whose properties the query actually uses.
  */
final class PatternCompiler(
    graph: PropertyGraph,
    params: Map[String, Any],
    views: Option[graft.views.ViewCatalog] = None,
    rules: Option[RuleSet] = None) {
  import PatternCompiler.VarState

  private var df: DataFrame = _
  private var vars = Map.empty[String, VarState]

  private def bound(v: String): Boolean = vars.contains(v)

  private def prefixed(label: String, v: String): DataFrame = {
    graph.schema.requireVertex(label)
    val descendants = graph.schema.descendants(label)
      .filter(l => graph.vertexLabels.contains(l))
    require(descendants.nonEmpty, s"vertex type $label has no concrete frames")
    val frames = descendants.map { l =>
      val f = graph.vertexFrame(l)
      f.select(
        (col("id").as(v) +: graph.schema.requireVertex(l).props
          .filter(f.columns.contains).map(p => col(p).as(s"${v}__$p"))): _*)
        .withColumn(s"${v}__label", lit(l))
    }
    val unioned =
      if (frames.size == 1) frames.head
      else frames.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
    graph.maybeBroadcast(label, unioned)
  }

  /** Attach property columns for an id-only bound variable. */
  private def ensureProps(v: String): Unit = {
    val st = vars(v)
    if (!st.hasProps) {
      val vframe = prefixed(st.label, s"__p_$v")
      df = df.join(vframe, col(v) === col(s"__p_$v"), "inner")
        .drop(s"__p_$v")
      // rename __p_v__prop -> v__prop
      df.columns.filter(_.startsWith(s"__p_${v}__")).foreach { c =>
        df = df.withColumnRenamed(c, c.replaceFirst(s"__p_", ""))
      }
      vars += v -> st.copy(hasProps = true)
    }
  }

  private def addFrame(frame: DataFrame): Unit =
    df = if (df == null) frame else df.crossJoin(frame)

  private def compileGoal(g: Goal): Unit = g match {
    case IsA(v, label) =>
      if (!bound(v)) {
        addFrame(prefixed(label, v))
        vars += v -> VarState(label, hasProps = true)
      } else {
        val st = vars(v)
        if (!graph.schema.ancestors(st.label).contains(label)) {
          // type test against a non-ancestor: semi-join on that type's ids
          val ids = graph.vertices(label).select(col("id").as(s"__t_$v"))
          df = df.join(graph.maybeBroadcast(label, ids), col(v) === col(s"__t_$v"), "left_semi")
        }
      }

    case EdgeGoal(label, from, to, weightVar, edgeProps) =>
      val et = graph.schema.requireEdge(label)
      val e0 = graph.edgeFrame(label)
      val renames: Seq[(String, String)] =
        Seq("src" -> "__src", "dst" -> "__dst", "weight" -> "__w") ++
          edgeProps.keys.map(p => p -> s"__e_$p").toSeq
      val e = graph.maybeBroadcast(label,
        e0.select(renames.map { case (c, a) => col(c).as(a) }: _*))
      (bound(from), bound(to)) match {
        case (false, false) =>
          addFrame(e)
          df = df.withColumn(from, col("__src")).withColumn(to, col("__dst"))
          vars += from -> VarState(et.srcLabel, hasProps = false)
          vars += to -> VarState(et.dstLabel, hasProps = false)
        case (true, false) =>
          df = df.join(e, col(from) === col("__src"), "inner").withColumn(to, col("__dst"))
          vars += to -> VarState(et.dstLabel, hasProps = false)
        case (false, true) =>
          df = df.join(e, col(to) === col("__dst"), "inner").withColumn(from, col("__src"))
          vars += from -> VarState(et.srcLabel, hasProps = false)
        case (true, true) =>
          df = df.join(e, col(from) === col("__src") && col(to) === col("__dst"), "inner")
      }
      // scalar bindings register in `vars` like any other binding —
      // Or-branch reconciliation keeps exactly the vars EVERY branch
      // bound, so an unregistered weight/prop bind silently vanished
      // from the union (found by PatternFuzzSpec's orEdge programs:
      // both branches bound ?w, the union dropped it)
      weightVar.foreach { w =>
        df = df.withColumn(w, col("__w"))
        vars += w -> VarState("", hasProps = false)
      }
      edgeProps.foreach { case (p, v) =>
        df = df.withColumn(v, col(s"__e_$p"))
        vars += v -> VarState("", hasProps = false)
      }
      df = df.drop("__src", "__dst", "__w").drop(edgeProps.keys.map(p => s"__e_$p").toSeq: _*)

    case Slot(v, name, bindAs) =>
      require(bound(v), s"slot access on unbound var ?$v")
      ensureProps(v)
      df = df.withColumn(bindAs, col(s"${v}__$name"))
      vars += bindAs -> VarState("", hasProps = false)

    case Filter(cond) => df = df.filter(cond)

    case Regex(v, pat) => df = df.filter(col(v).rlike(pat))

    case Bind(v, expr) =>
      df = df.withColumn(v, expr)
      vars += v -> VarState("", hasProps = false)

    case Param(v, name) =>
      require(df != null, "param goal before any generator")
      val value = params.getOrElse(name, throw new IllegalArgumentException(s"missing param: $name"))
      df = df.withColumn(v, lit(value))
      vars += v -> VarState("", hasProps = false)

    case ViewGoal(view, key, id, value) =>
      val cat = views.getOrElse(throw new IllegalArgumentException(
        "view goal requires a ViewCatalog"))
      require(bound(key), s"view key ?$key must be bound")
      val v = cat.mapView(view)
        .select(col("key").as(s"__vk_$key"), col("id").as(id), col("value").as(value))
      df = df.join(v, col(key) === col(s"__vk_$key"), "inner").drop(s"__vk_$key")
      vars += id -> VarState("", hasProps = false)
      vars += value -> VarState("", hasProps = false)

    case ReducedViewGoal(view, key, value, nVar) =>
      val cat = views.getOrElse(throw new IllegalArgumentException(
        "reduced view goal requires a ViewCatalog"))
      require(bound(key), s"view key ?$key must be bound")
      val v = cat.reducedView(view)
        .select(col("key").as(s"__vk_$key"), col("value").as(value), col("n").as(s"__vn_$key"))
      df = df.join(v, col(key) === col(s"__vk_$key"), "inner").drop(s"__vk_$key")
      nVar.foreach(nv => df = df.withColumn(nv, col(s"__vn_$key")))
      df = df.drop(s"__vn_$key")
      vars += value -> VarState("", hasProps = false)
      nVar.foreach(nv => vars += nv -> VarState("", hasProps = false))

    case AggGoal(label, keyProp, valueProp, keyVar, valueVar, nVar, aggKind) =>
      graph.schema.requireVertex(label)
      // ROUTE through a matching current materialized view when one
      // is registered (the reference's users invoke-reduced-view
      // explicitly; here the planner rewrites), else aggregate from
      // source — identical results either way, by the ViewDef routing
      // contract (keyProp/valueProp declare the map, routedAgg the
      // reduce kind; both validated at register time)
      val routed = views.flatMap(_.routeFor(label, keyProp, valueProp, aggKind))
      val rows = routed match {
        case Some(name) =>
          views.get.reducedView(name)
            .select(col("key").as(keyVar), col("value").as(valueVar),
              col("n").as(s"__an_$keyVar"))
        case None =>
          val src = prefixed(label, s"__a_$keyVar")
          val vCol = col(s"__a_${keyVar}__$valueProp")
          val aggCol = aggKind match {
            case "sum" => sum(vCol)
            case "count" => count(lit(1)) // row count, matching count(1) reduces
            case "min" => min(vCol)
            case "max" => max(vCol)
            case "avg" => avg(vCol)
            case other => throw new IllegalArgumentException(
              s"agg goal kind '$other' is not one of sum/count/min/max/avg")
          }
          src.groupBy(col(s"__a_${keyVar}__$keyProp").as(keyVar))
            .agg(aggCol.as(valueVar), count(lit(1)).as(s"__an_$keyVar"))
      }
      // "bound" by COLUMN presence, not the vars registry: Slot/Bind
      // introduce plain columns without registering a var state
      val keyBound = df != null && df.columns.contains(keyVar)
      if (df == null) df = rows
      else if (keyBound)
        df = df.join(rows.withColumnRenamed(keyVar, s"__ak_$keyVar"),
          col(keyVar) === col(s"__ak_$keyVar"), "inner").drop(s"__ak_$keyVar")
      else df = df.crossJoin(rows)
      nVar.foreach(nv => df = df.withColumnRenamed(s"__an_$keyVar", nv))
      if (nVar.isEmpty) df = df.drop(s"__an_$keyVar")
      if (!keyBound && !bound(keyVar)) vars += keyVar -> VarState("", hasProps = false)
      vars += valueVar -> VarState("", hasProps = false)
      nVar.foreach(nv => vars += nv -> VarState("", hasProps = false))

    case RuleGoal(rule, bindings) =>
      val rs = rules.getOrElse(throw new IllegalArgumentException(
        "rule goal requires a RuleSet"))
      val head = rs.head(rule)
      require(head.size == bindings.size,
        s"rule $rule has head $head, got ${bindings.size} bindings")
      val rel = rs.relation(rule).toDF(bindings: _*)
      val shared = bindings.filter(bound)
      if (df == null) { df = rel }
      else if (shared.isEmpty) df = df.crossJoin(rel)
      else df = df.join(rel, shared)
      bindings.filterNot(bound).foreach { b =>
        vars += b -> VarState("", hasProps = false)
      }

    case Not(goals) =>
      val sub = new PatternCompiler(graph, params, views, rules)
      goals.foreach(sub.compileGoal)
      val shared = sub.vars.keySet.intersect(vars.keySet).toSeq.sorted
      require(shared.nonEmpty, "negated pattern shares no variables with the outer query")
      val subDf = sub.df.select(shared.map(col): _*).distinct()
      df = df.join(subDf, shared, "left_anti")

    case Or(branches) =>
      val outerCols = if (df == null) Seq.empty[String] else df.columns.toSeq
      val compiled = branches.map { goals =>
        val b = new PatternCompiler(graph, params, views, rules)
        b.df = df
        b.vars = vars
        goals.foreach(b.compileGoal)
        b
      }
      val newVars = compiled.head.vars.keySet -- vars.keySet
      require(compiled.forall(c => (c.vars.keySet -- vars.keySet) == newVars),
        "or-branches must bind the same variables")
      // keep EVERYTHING later goals can see — outer bound columns
      // (Slot/Bind/Param/weight bindings and attached v__prop columns
      // included, not just var ids) plus branch-bound vars — restricted
      // to columns every branch produced, so the union is well-formed
      val common = compiled.map(_.df.columns.toSet).reduce(_ intersect _)
      val branchPropCols = common.filter(c =>
        newVars.exists(v => c.startsWith(s"${v}__"))).toSeq.sorted
      val keep = (outerCols ++ newVars.toSeq.sorted ++ branchPropCols)
        .distinct.filter(common)
      df = compiled.map(_.df.select(keep.map(col): _*)).reduce(_ unionAll _)
      // prop columns attached in only some branches did not survive;
      // ensureProps re-attaches on demand iff the full set is gone
      // (props are attached atomically, so v__label tracks the set)
      val survivors = keep.toSet
      vars = (vars ++ newVars.map(v => v -> compiled.head.vars(v))).map {
        case (v, st) => v -> st.copy(hasProps =
          st.hasProps && survivors.contains(s"${v}__label"))
      }
  }

  def compile(q: PatternQuery): DataFrame = {
    q.goals.foreach(compileGoal)
    require(df != null, "query has no generator goal")
    if (q.countOnly) {
      val outName = q.select.headOption.map(_._2).getOrElse("count")
      return df.select(count(lit(1)).as(outName))
    }
    var out = df.select(q.select.map { case (v, as) => col(v).as(as) }: _*)
    if (q.distinct) out = out.distinct()
    if (q.orderBy.nonEmpty) out = out.orderBy(q.orderBy: _*)
    q.skip.foreach(n => out = out.offset(n))
    q.limit.foreach(n => out = out.limit(n))
    out
  }
}

object PatternCompiler {
  private[query] final case class VarState(label: String, hasProps: Boolean)

  def run(graph: PropertyGraph, q: PatternQuery,
      views: Option[graft.views.ViewCatalog] = None,
      rules: Option[RuleSet] = None): DataFrame =
    new PatternCompiler(graph, q.params, views, rules).compile(q)
}
