package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Heterogeneous ("generic") property values + the standard order of
  * terms — the rebuild of two reference behaviors:
  *
  *   1. The tag-byte serialization protocol (reference serialize.lisp;
  *      tag constants globals.lisp:117-152) that lets any slot hold any
  *      value. Spark columns are homogeneously typed, so the untyped
  *      escape hatch (`:generic` nodes, vertex.lisp:112-121) is a
  *      variant struct `(tag, num, str)`: numbers carried natively,
  *      everything else in canonical string form, with the SURVEY §1.3
  *      type-mapping table governing which Spark type each tag uses.
  *   2. `setof`'s "standard order of terms" sort (reference
  *      prolog-functors.lisp:437-470): values order by type rank first
  *      (null < number < string < list), then within type — expressed
  *      as a sortable struct column so it works in orderBy/sort_array.
  */
object Variant {

  /** Type ranks of the standard order of terms. */
  val RankNull = 0
  val RankNumber = 1
  val RankString = 2
  val RankList = 3

  /** Variant-encode a homogeneous column into (tag, num, str). */
  def encodeLong(c: Column): Column =
    struct(lit("int").as("tag"), c.cast("double").as("num"), c.cast("string").as("str"))
  def encodeDouble(c: Column): Column =
    struct(lit("float").as("tag"), c.cast("double").as("num"), c.cast("string").as("str"))
  def encodeString(c: Column): Column =
    struct(lit("string").as("tag"), lit(null).cast("double").as("num"), c.as("str"))
  def encodeBool(c: Column): Column =
    struct(lit("bool").as("tag"), c.cast("int").cast("double").as("num"), c.cast("string").as("str"))
  def encodeTimestamp(c: Column): Column =
    struct(lit("timestamp").as("tag"),
      unix_micros(c).cast("double").as("num"),
      date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS").as("str"))
  def encodeArray(c: Column): Column =
    struct(lit("list").as("tag"), lit(null).cast("double").as("num"),
      to_json(c).as("str"))

  /** Typed extraction (null when the tag doesn't match — the schema
    * tolerance of the reference's alist rows, SURVEY §1.2).
    */
  def asLong(v: Column): Column =
    when(v.getField("tag") === "int", v.getField("num").cast("long"))
  def asDouble(v: Column): Column =
    when(v.getField("tag").isin("int", "float"), v.getField("num"))
  def asString(v: Column): Column =
    when(v.getField("tag") === "string", v.getField("str"))
  def asBool(v: Column): Column =
    when(v.getField("tag") === "bool", v.getField("num") === 1.0)

  /** Sort key implementing the standard order of terms over variants:
    * orderBy(termOrderKey(v)) sorts null < numbers (numerically) <
    * strings (lexically) < lists (by canonical JSON).
    */
  def termOrderKey(v: Column): Column = {
    val rank = when(v.isNull, RankNull)
      .when(v.getField("tag").isin("int", "float", "bool", "timestamp"), RankNumber)
      .when(v.getField("tag") === "string", RankString)
      .otherwise(RankList)
    struct(
      rank.as("rank"),
      coalesce(v.getField("num"), lit(0.0)).as("num_key"),
      coalesce(v.getField("str"), lit("")).as("str_key"))
  }
}
