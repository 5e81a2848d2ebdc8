package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One operator exposed through the driver contract: a Spark
  * implementation plus (when SQL-expressible) an equivalent DuckDB
  * oracle query over the same parquet tables. Queries without an oracle
  * get the driver's weaker rows>0 check and are additionally covered by
  * ScalaTest specs.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Exact money arithmetic shared with the oracles: doubles carrying
    * 2-decimal values are summed as integer cents, then divided back —
    * both engines produce bit-identical doubles, where naive double
    * summation would drift by order-of-summation.
    */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")
  def centsToDollars(c: Column): Column = c.cast("double") / 100.0

  /** Read the events table (ns-precision timestamps, which Spark's
    * parquet reader rejects by default): read as long ns, convert to a
    * µs timestamp — the same truncation DuckDB applies natively.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
