package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** `jaro_winkler(a, b)` — the record-linkage string similarity, as a
  * native Catalyst expression with real codegen. Levenshtein (built
  * in) counts edits; Jaro-Winkler scores agreement with positional
  * tolerance plus a common-prefix bonus — the measure census-style
  * name matching standardized on, and the second distance tier for
  * [[graft.operators.Dedup]]'s blocked entity matching.
  *
  * Semantics follow the rapidfuzz/DuckDB convention exactly (so the
  * cross-engine oracle can hash-match): any empty input scores 0.0;
  * match window `max(|a|,|b|)/2 − 1` (floored at 0); transpositions
  * = out-of-order matched positions INTEGER-divided by 2 (a 3-cycle
  * counts 1, not 1.5 — pinned against DuckDB empirically); the
  * 0.1-scaled prefix bonus (prefix capped at 4) applies only when
  * the raw Jaro exceeds 0.7. Comparison is by
  * UTF-16 code unit — identical to codepoint comparison on BMP text,
  * which names are.
  *
  * Per-row, pure, O(|a|·window) with two small boolean scratch arrays;
  * `doGenCode` emits one static call, keeping the whole similarity
  * join stage inside whole-stage codegen.
  */
case class JaroWinklerExpression(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerExpression.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerExpression.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerExpression {

  /** Static entry point shared by interpreted eval and generated code. */
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val s1 = ua.toString
    val s2 = ub.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (!found && j <= hi) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars out of relative order, in half-pairs
    var halves = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) halves += 1
        k += 1
      }
      i += 1
    }
    val t = (halves / 2).toDouble // integer halving: a 3-cycle is 1
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxPrefix = math.min(math.min(l1, l2), 4)
    while (l < maxPrefix && s1.charAt(l) == s2.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  /** Column API. */
  def jaro_winkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinklerExpression(Bridge.expression(a), Bridge.expression(b)))

  /** SQL registration: `SELECT jaro_winkler(name_a, name_b)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", exprs => JaroWinklerExpression(exprs(0), exprs(1)), "built-in")
}
