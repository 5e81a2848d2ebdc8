package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.PropertyGraph
import graft.operators.Fixpoint

/** User-defined rules — the `<-` clause surface (reference
  * prologc.lisp:744-746, 626-700; functor.lisp:21-36). A rule is a
  * named relation over declared head variables:
  *
  *   - non-recursive rules are plan macros: a function from the graph
  *     to a DataFrame, inlined at each invocation site (the reference
  *     compiled all clauses of a functor into one function);
  *   - recursive rules declare base + step and are evaluated by
  *     semi-naive fixpoint under the standard budgets — the
  *     `%tick`-bounded recursion of the reference (prologc.lisp:859-900).
  *
  * Multiple definitions under one name union (clause disjunction).
  */
final class RuleSet(graph: PropertyGraph) {

  private var rules = Map.empty[String, Seq[() => DataFrame]]

  /** Head column names per rule (checked on invocation). */
  private var heads = Map.empty[String, Seq[String]]

  private def add(name: String, head: Seq[String], body: () => DataFrame): Unit = {
    require(heads.get(name).forall(_ == head), s"rule $name clauses must share the head $head")
    heads += name -> head
    rules += name -> (rules.getOrElse(name, Nil) :+ body)
  }

  /** Define a (possibly additional) non-recursive clause. */
  def define(name: String, head: Seq[String])(body: PropertyGraph => DataFrame): Unit =
    add(name, head, () => {
      val df = body(graph)
      require(df.columns.toSeq == head, s"rule $name body must produce columns $head, got ${df.columns.toSeq}")
      df
    })

  /** Define a recursive rule: base clause + step over the delta. */
  def defineRecursive(name: String, head: Seq[String],
      budget: Fixpoint.Budget = Fixpoint.Budget())(
      base: PropertyGraph => DataFrame)(
      step: (PropertyGraph, DataFrame) => DataFrame): Unit =
    add(name, head, () =>
      Fixpoint.semiNaive(base(graph), head, budget)(delta => step(graph, delta)))

  /** The rule's full relation (all clauses unioned, deduplicated —
    * rule invocation is set-semantics, SURVEY.md §7.4).
    */
  def relation(name: String): DataFrame = {
    val clauses = rules.getOrElse(name, throw new IllegalArgumentException(s"unknown rule: $name"))
    clauses.map(_.apply()).reduce(_ unionByName _).dropDuplicates(heads(name))
  }

  def head(name: String): Seq[String] =
    heads.getOrElse(name, throw new IllegalArgumentException(s"unknown rule: $name"))
}
