package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made these conversions
  * `private[sql]` (columns are backend-agnostic nodes now); extensions
  * that define native Catalyst expressions need exactly these two
  * hooks, so this one-file shim lives inside the sql package tree —
  * the standard technique for out-of-tree Catalyst extensions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Re-root a DataFrame's logical plan into another session of the
    * same SparkContext. Execution then plans under THAT session's
    * SQLConf — the supported way to give an iterative job its own
    * `spark.sql.shuffle.partitions` (sized to delta volume) without
    * mutating the shared session's conf, which would race against
    * concurrent queries.
    */
  def inSession(spark: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed
    org.apache.spark.sql.classic.Dataset.ofRows(cs, plan)
  }
}
