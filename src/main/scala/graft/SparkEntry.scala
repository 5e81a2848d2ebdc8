package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the pipeline
  * extensions) is exposed here as a named query; those with an entry in
  * [[oracleSql]] are hash-checked against DuckDB on the same parquet
  * tables, the rest get rows>0 checks plus ScalaTest coverage.
  */
object SparkEntry {

  val catalog: Seq[QueryDef] =
    CatalogCore.defs ++ CatalogPipeline.defs ++ CatalogExtra.defs ++
      CatalogSearch.defs ++ CatalogStreaming.defs ++ CatalogMvcc.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q10_pattern_flagship")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
