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
