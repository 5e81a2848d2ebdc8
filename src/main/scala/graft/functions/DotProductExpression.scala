package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `vec_dot(a, b)` — the double-precision dot product of two vector
  * columns as a native Catalyst expression with real codegen.
  *
  * This replaces the `aggregate(zip_with(a, b, x·y), 0.0, +)`
  * higher-order form everywhere [[graft.operators.Similarity]] computes
  * a dot product: HOF expressions are CodegenFallback in Spark, so the
  * lambda tree is interpreted per ELEMENT (boxed arithmetic, ~45 µs per
  * 64-dim cosine measured in the q108 verify join); this expression is
  * one static call per ROW — a tight primitive loop — inside
  * whole-stage codegen.
  *
  * Bit-identical to the HOF form by construction: elements multiply as
  * doubles and accumulate LEFT-TO-RIGHT from 0.0 (same IEEE operation
  * order), mismatched lengths or a null element yield NULL exactly as
  * zip_with's null-padding + null-propagating sum did.
  */
case class DotProductExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float|double> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    DotProductExpression.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      elemIsFloat(left), elemIsFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aF = elemIsFloat(left)
    val bF = elemIsFloat(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("dotRes")
      s"""
         |java.lang.Double $res =
         |  graft.functions.DotProductExpression.dot($a, $b, $aF, $bF);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductExpression {

  /** Static entry point shared by interpreted eval and generated code.
    * Boxed return carries the three-way outcome (value / null) in one
    * call; null only on malformed input (length mismatch, null element).
    */
  def dot(a: ArrayData, b: ArrayData,
      aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Column API: `vec_dot(a, b)` — composes inside HOF lambdas too
    * (lambda-variable children resolve during analysis like any other
    * expression), where interpreted-mode eval is still one static call
    * per invocation instead of a per-element lambda walk.
    */
  def vec_dot(a: Column, b: Column): Column =
    Bridge.column(DotProductExpression(Bridge.expression(a), Bridge.expression(b)))
}
