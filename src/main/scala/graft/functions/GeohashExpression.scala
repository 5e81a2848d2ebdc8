package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.spatial.Geohash

/** `geohash_encode(lon, lat, precision)` as a native Catalyst
  * expression with real codegen — the custom-Expression tier of
  * SURVEY.md §7.3 (geohash math is pure and per-row, so it belongs
  * inside whole-stage codegen rather than in a Scala-closure UDF with
  * its serialization and null-boxing overhead).
  *
  * `doGenCode` emits a direct static call into
  * [[GeohashExpression.encodeUtf8]], so the generated Java is a single
  * call per row and the expression never falls back to interpreted
  * evaluation. Inputs are normalized with casts at construction.
  */
case class GeohashEncodeExpression(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "geohash_encode"

  override protected def nullSafeEval(lon: Any, lat: Any, p: Any): Any =
    GeohashExpression.encodeUtf8(
      lon.asInstanceOf[Double], lat.asInstanceOf[Double], p.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lon, lat, p) =>
      s"graft.functions.GeohashExpression.encodeUtf8($lon, $lat, $p)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object GeohashExpression {
  /** Static entry point shared by interpreted eval and generated code. */
  def encodeUtf8(lon: Double, lat: Double, precision: Int): UTF8String =
    UTF8String.fromString(Geohash.encode(lon, lat, precision))

  private def build(lon: Expression, lat: Expression, p: Expression): Expression =
    GeohashEncodeExpression(
      Cast(lon, DoubleType), Cast(lat, DoubleType), Cast(p, IntegerType))

  /** Column API. */
  def geohash_encode(lon: Column, lat: Column, precision: Column): Column =
    Bridge.column(build(
      Bridge.expression(lon), Bridge.expression(lat), Bridge.expression(precision)))

  /** SQL registration: `SELECT geohash_encode(lon, lat, 6)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "geohash_encode",
      exprs => build(exprs(0), exprs(1), exprs(2)),
      "built-in")
}
