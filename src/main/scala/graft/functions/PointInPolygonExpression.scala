package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType}

/** `point_in_polygon(lon, lat)` for a query-constant polygon (outer
  * ring + holes) as a native Catalyst expression with real codegen —
  * the ray-casting refine of spatial containment queries (reference
  * geometry-ops.lisp:48-66), replacing the former Scala-closure UDF so
  * the whole filter stays inside whole-stage codegen (no closure
  * serialization, no boxing, no codegen fence).
  *
  * The polygon is held as flattened primitive arrays
  * (`[lon0, lat0, lon1, lat1, …]` per ring) and reaches generated code
  * via `addReferenceObj`, so each row costs one static call.
  * Semantics are identical to [[graft.spatial.Geohash.pointInPolygon]]
  * (even-odd crossing; inside outer ring, outside all holes).
  */
case class PointInPolygonExpression(left: Expression, right: Expression,
    rings: Array[Array[Double]]) extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "point_in_polygon"

  override protected def nullSafeEval(lon: Any, lat: Any): Any =
    PointInPolygonExpression.contains(
      lon.asInstanceOf[Double], lat.asInstanceOf[Double], rings)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rings", rings, "double[][]")
    defineCodeGen(ctx, ev, (lon, lat) =>
      s"graft.functions.PointInPolygonExpression.contains($lon, $lat, $ref)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PointInPolygonExpression {

  /** Static entry point shared by interpreted eval and generated code. */
  def contains(lon: Double, lat: Double, rings: Array[Array[Double]]): Boolean = {
    if (rings.length == 0 || !inRing(lon, lat, rings(0))) false
    else {
      var i = 1
      var inHole = false
      while (i < rings.length && !inHole) { inHole = inRing(lon, lat, rings(i)); i += 1 }
      !inHole
    }
  }

  private def inRing(lon: Double, lat: Double, ring: Array[Double]): Boolean = {
    val n = ring.length / 2
    var inside = false
    var j = n - 1
    var i = 0
    while (i < n) {
      val xi = ring(2 * i); val yi = ring(2 * i + 1)
      val xj = ring(2 * j); val yj = ring(2 * j + 1)
      if (((yi > lat) != (yj > lat)) &&
        (lon < (xj - xi) * (lat - yi) / (yj - yi) + xi)) inside = !inside
      j = i; i += 1
    }
    inside
  }

  /** Column API: `point_in_polygon(col("lon"), col("lat"), rings)`. */
  def point_in_polygon(lon: Column, lat: Column,
      rings: Seq[Seq[(Double, Double)]]): Column = {
    val flat = rings.map(r => r.iterator.flatMap(p => Iterator(p._1, p._2)).toArray).toArray
    Bridge.column(PointInPolygonExpression(
      Cast(Bridge.expression(lon), DoubleType),
      Cast(Bridge.expression(lat), DoubleType), flat))
  }
}

/** Row-level variant: the polygon comes from a COLUMN, not a query
  * constant — the reference stores geometry as a slot value on nodes
  * (geometry.lisp:22-27; `:index t` geometry slots), so containment
  * against per-row polygons must be an expression over the stored
  * representation. Encoding: `array<array<double>>` — one inner array
  * per ring, coordinates interleaved `[lon0, lat0, lon1, lat1, …]`,
  * ring 0 the outer ring, rest holes (the same flattened layout the
  * constant-polygon expression uses internally).
  */
case class PointInStoredPolygonExpression(first: Expression, second: Expression,
    third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "point_in_stored_polygon"

  override protected def nullSafeEval(rings: Any, lon: Any, lat: Any): Any =
    PointInStoredPolygonExpression.containsCatalyst(
      rings.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      lon.asInstanceOf[Double], lat.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (rings, lon, lat) =>
      s"graft.functions.PointInStoredPolygonExpression.containsCatalyst($rings, $lon, $lat)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PointInStoredPolygonExpression {
  import org.apache.spark.sql.catalyst.util.ArrayData

  /** Static entry point shared by interpreted eval and generated code. */
  def containsCatalyst(rings: ArrayData, lon: Double, lat: Double): Boolean = {
    val n = rings.numElements()
    if (n == 0) return false
    val flat = new Array[Array[Double]](n)
    var i = 0
    while (i < n) { flat(i) = rings.getArray(i).toDoubleArray(); i += 1 }
    PointInPolygonExpression.contains(lon, lat, flat)
  }

  /** Column API: polygon rings column (array<array<double>>, coords
    * interleaved per ring) tested against lon/lat columns.
    */
  def point_in_stored_polygon(rings: Column, lon: Column, lat: Column): Column =
    Bridge.column(PointInStoredPolygonExpression(
      Bridge.expression(rings),
      Cast(Bridge.expression(lon), DoubleType),
      Cast(Bridge.expression(lat), DoubleType)))
}
