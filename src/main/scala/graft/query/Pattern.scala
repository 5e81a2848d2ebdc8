package graft.query

import org.apache.spark.sql.Column

/** Pattern-query AST — the rebuild's query surface. It generalizes the
  * reference's two query tiers: the Prolog goal list accepted by
  * `select` (reference prologc.lisp:951-1037) and the closed JSON
  * pattern DSL of the REST layer (reference rest.lisp:448-541), which
  * SURVEY.md §3.3 identified as the cleanest spec for v1.
  *
  * Variables are plain strings ("a", "o", "n"). Goals are conjunctive
  * left-to-right, like a Prolog clause body — but compilation is
  * declarative (DataFrame joins/filters), so Catalyst may reorder; the
  * reference executed user goal order literally (prologc.lisp:702-734)
  * and we deliberately upgrade that (SURVEY.md §4.1).
  */
sealed trait Goal

/** `(is-a ?v type)` — generator when ?v unbound, type test when bound
  * (reference prolog-functors.lisp:832-857). */
final case class IsA(v: String, label: String) extends Goal

/** A generated edge functor `(etype ?from ?to)` — the reference's only
  * join (schema.lisp:309-420). Optional weight / edge-property binding
  * covers the /3 form.
  */
final case class EdgeGoal(
    label: String,
    from: String,
    to: String,
    weightVar: Option[String] = None,
    edgeProps: Map[String, String] = Map.empty // edge prop col -> bind var
) extends Goal

/** `(node-slot-value ?v name ?bind)` (prolog-functors.lisp:791-805). */
final case class Slot(v: String, name: String, bind: String) extends Goal

/** Comparison / filter over bound vars — `<,>,<=,>=,=,/=` functors
  * (prolog-functors.lisp:48-84). Operands are Column expressions over
  * bound variable names.
  */
final case class Filter(cond: Column) extends Goal

/** `(regex-match ?v "pat")` (prolog-functors.lisp:133-139). */
final case class Regex(v: String, pattern: String) extends Goal

/** `(is ?v expr)` — computed binding (prolog-functors.lisp:98-131). */
final case class Bind(v: String, expr: Column) extends Goal

/** `(not goals...)` — negation as failure = anti-join
  * (prolog-functors.lisp:369-374; compiled prologc.lisp:492-518). */
final case class Not(goals: Seq[Goal]) extends Goal

/** `(or branch1 branch2 ...)` — union of solution streams
  * (prologc.lisp:432-447). Branches must bind the same new variables. */
final case class Or(branches: Seq[Seq[Goal]]) extends Goal

/** `(param ?v name)` — runtime query parameter (prolog-functors.lisp:144-152). */
final case class Param(v: String, name: String) extends Goal

/** `(invoke-view class view ?key ?id ?value)` — join the solution
  * stream against a materialized view's rows by key (reference
  * prolog-functors.lisp:734-789). `key` must be bound; `id`/`value`
  * bind the view row's payload. Requires a ViewCatalog at compile time.
  */
final case class ViewGoal(view: String, key: String, id: String, value: String) extends Goal

/** `invoke-reduced-view` as a goal (prolog-functors.lisp:767-789): join
  * the solution stream against a view's PER-KEY AGGREGATE rows,
  * binding the reduced value (and the group row count).
  */
final case class ReducedViewGoal(view: String, key: String, value: String,
    n: Option[String] = None) extends Goal

/** `(agg ?class keyProp valueProp ?key ?value [?n])` — a DECLARATIVE
  * per-key aggregate over a vertex class: bind `keyVar`/`valueVar`
  * (and optionally `nVar`) to the per-`keyProp` `agg` of `valueProp`
  * (sum/count/min/max/avg; count counts rows) over all live `label`
  * vertices. Unlike [[ReducedViewGoal]], the user does NOT name a
  * view: the compiler ROUTES the goal through a registered
  * materialized view whose declared `(sourceLabel, keyProp,
  * valueProp, routedAgg)` matches and whose materialization is
  * current (epoch-covered for live stores, static otherwise), and
  * falls back to a from-source aggregation otherwise — the
  * automatic-rewrite upgrade over the reference's explicit
  * invoke-reduced-view (prolog-functors.lisp:767-789), deferred in
  * SURVEY §7.3 and closed here.
  */
final case class AggGoal(label: String, keyProp: String, valueProp: String,
    keyVar: String, valueVar: String, nVar: Option[String] = None,
    agg: String = "sum") extends Goal

/** Invocation of a named rule (the `<-` functor surface,
  * prologc.lisp:744-746): the rule produces a relation over its head
  * variables, joined into the stream on the already-bound ones.
  * Requires a RuleSet at compile time.
  */
final case class RuleGoal(rule: String, bindings: Seq[String]) extends Goal

/** Query options — mirrors the option plist of `select`
  * (prologc.lisp:951-1037: :limit :skip :count :flat) plus explicit
  * ordering (the set-semantics deviation documented in SURVEY.md §7.4:
  * order exists only under an explicit sort).
  */
final case class PatternQuery(
    goals: Seq[Goal],
    select: Seq[(String, String)], // (var or bound column) -> output name
    distinct: Boolean = false,
    orderBy: Seq[Column] = Nil,
    limit: Option[Int] = None,
    skip: Option[Int] = None,
    countOnly: Boolean = false,
    params: Map[String, Any] = Map.empty)
