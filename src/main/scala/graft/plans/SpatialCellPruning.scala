package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{Decimal, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.spatial.Geohash

/** Optimizer rule: spatial partition pruning via geohash cells — the
  * piece SURVEY.md §4.1 flags as genuinely custom ("spatial partition
  * pruning … needs custom Rule"; reference spatial-index.lisp:111-144
  * walks covering cells so empty space costs nothing).
  *
  * Tables indexed with [[graft.spatial.SpatialOps.withCell]] carry a
  * `cell` column whose attribute METADATA records the geohash precision
  * and the lon/lat column names. When a query filters those lon/lat
  * columns with literal range predicates (a bbox), this rule conjoins
  * `cell IN (covering cells)` — redundant semantically, but it is
  * exactly the predicate that partition-prunes a cell-partitioned
  * table (and row-group-skips a cell-sorted one), turning a full scan
  * into a touch of the covered cells.
  *
  * Registered through [[GraftExtensions]]
  * (`SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`).
  */
object SpatialCellPruning extends Rule[LogicalPlan] {

  private case class Bounds(var lo: Option[Double] = None, var hi: Option[Double] = None)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      child.output.find(a =>
        a.dataType == StringType && a.metadata.contains("geohash_precision") &&
          !alreadyPruned(cond, a)) match {
        case Some(cellAttr) =>
          val lonName = cellAttr.metadata.getString("geohash_lon")
          val latName = cellAttr.metadata.getString("geohash_lat")
          (bounds(cond, lonName), bounds(cond, latName)) match {
            case (Some((lonLo, lonHi)), Some((latLo, latHi))) =>
              val cells = Geohash.covering(
                Geohash.BBox(lonLo, latLo, lonHi, latHi),
                cellAttr.metadata.getLong("geohash_precision").toInt)
              // cells may be at a coarser precision than the column if
              // covering auto-dropped — only inject when they match
              if (cells.nonEmpty && cells.head.length ==
                  cellAttr.metadata.getLong("geohash_precision").toInt) {
                val in = In(cellAttr, cells.map(c => Literal(UTF8String.fromString(c), StringType)))
                Filter(And(in, cond), child)
              } else f
            case _ => f
          }
        case None => f
      }
  }

  private def alreadyPruned(cond: Expression, cell: Attribute): Boolean =
    cond.exists {
      case In(a: Attribute, _) if a.semanticEquals(cell) => true
      // OptimizeIn rewrites our In to InSet between batch runs
      case InSet(a: Attribute, _) if a.semanticEquals(cell) => true
      case EqualTo(a: Attribute, _) if a.semanticEquals(cell) => true
      case _ => false
    }

  /** Closed [lo, hi] bounds for a column from the filter's top-level
    * conjuncts; None unless both sides are literal-bounded.
    */
  private def bounds(cond: Expression, colName: String): Option[(Double, Double)] = {
    val b = Bounds()
    def num(l: Literal): Option[Double] = l.value match {
      case d: java.lang.Double => Some(d)
      case f: java.lang.Float => Some(f.toDouble)
      case i: java.lang.Integer => Some(i.toDouble)
      case l2: java.lang.Long => Some(l2.toDouble)
      case d: Decimal => Some(d.toDouble)
      case _ => None
    }
    def visit(e: Expression): Unit = e match {
      case And(l, r) => visit(l); visit(r)
      case GreaterThanOrEqual(a: Attribute, l: Literal) if a.name == colName => b.lo = num(l)
      case GreaterThan(a: Attribute, l: Literal) if a.name == colName => b.lo = num(l)
      case LessThanOrEqual(a: Attribute, l: Literal) if a.name == colName => b.hi = num(l)
      case LessThan(a: Attribute, l: Literal) if a.name == colName => b.hi = num(l)
      case GreaterThanOrEqual(l: Literal, a: Attribute) if a.name == colName => b.hi = num(l)
      case LessThanOrEqual(l: Literal, a: Attribute) if a.name == colName => b.lo = num(l)
      case _ => ()
    }
    visit(cond)
    for (lo <- b.lo; hi <- b.hi) yield (lo, hi)
  }
}

/** Session extension wiring (SURVEY.md §7.3 custom-Rule tier). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => SpatialCellPruning)
  }
}
