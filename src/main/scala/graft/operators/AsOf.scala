package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (most-recent-prior) join — an operator the reference lacks but
  * event pipelines need constantly (enrich each fact with the latest
  * dimension/event state at its timestamp).
  *
  * Implemented with the union + running-last-value technique: both
  * sides are unioned, sorted per key by (ts, side-marker), and the
  * right side's payload is propagated forward with
  * `last(_, ignoreNulls)` over an unbounded-preceding window. One
  * shuffle on the key, no range join, no per-row probe explosion —
  * the shape that survives 100× scale-up where a theta-join
  * (`l.ts >= r.ts`) degenerates to a broadcast nested loop.
  *
  * Tie semantics: a right row at exactly `l.ts` IS visible to the left
  * row (markers order right-before-left at equal ts), matching SQL
  * `ASOF JOIN ... ON l.ts >= r.ts`.
  */
object AsOf {

  /** @param left    probe side (all its columns are kept)
    * @param right   reference side
    * @param keys    equality key columns present on both sides
    * @param tsCol   timestamp/ordering column name on both sides
    * @param payload right-side columns to carry (exposed as `asof_<c>`)
    * @param inner   drop left rows with no prior right row
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      payload: Seq[String], inner: Boolean = true): DataFrame = {
    val payloadType = StructType(right.select(payload.map(col): _*).schema.fields)
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(payloadType))
    val r = right.select(
      (keys :+ tsCol).map(col) ++ Seq(
        lit(0).as("__side"),
        struct(payload.map(col): _*).as("__payload")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var out = unioned
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    if (inner) out = out.filter(col("__asof").isNotNull)
    payload.foldLeft(out) { (df, p) =>
      df.withColumn(s"asof_$p", col("__asof").getField(p))
    }.drop("__side", "__payload", "__asof")
  }
}
