package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `sorted_intersect_count(a, b)` — |A ∩ B| for two SORTED-ascending
  * long arrays with distinct elements, as one native codegen
  * expression: a single allocation-free merge per row.
  *
  * Replaces `size(array_intersect(a, b))` in per-PAIR scoring loops
  * (the contrastive-mining verify), where the builtin builds a hash set
  * per evaluation: on a million candidate pairs the allocation and
  * boxing dominate the stage. Caller contract: both inputs sorted
  * ascending and duplicate-free — exactly what
  * `sort_array(array_distinct(...))` produces at document grain.
  */
case class SortedIntersectCountExpression(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two array<bigint> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCountExpression.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectCountExpression.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCountExpression {

  /** Static entry point shared by interpreted eval and generated code
    * (not named `eval`: the case class inherits Expression.eval, which
    * would suppress the static forwarder the generated code calls).
    */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  /** Column API. */
  def sorted_intersect_count(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCountExpression(
      Bridge.expression(a), Bridge.expression(b)))
}
