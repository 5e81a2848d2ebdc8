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

  /** Normalize an events frame's `ts` to a session-zone (UTC) µs
    * timestamp regardless of how the generator encoded it: ns-precision
    * files are readable only as long ns (legacy flag) and convert with
    * the same truncation DuckDB applies natively; µs files arrive as
    * TIMESTAMP_NTZ and cast to the instant the ns path produced (the
    * session zone is pinned to UTC); an already-LTZ column passes
    * through. Keeping ONE output type means every downstream window /
    * date_trunc / oracle compare is encoding-independent.
    */
  def tsMicros(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** Read the events table (ns- or µs-precision timestamps depending on
    * the generator vintage — see [[tsMicros]]).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tsMicros(spark.read.parquet(s"$sfDir/events.parquet"))
  }
}
