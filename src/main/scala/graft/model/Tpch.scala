package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Models the driver-provided TPC-H-ish parquet tables (TESTDATA.md) as a
  * property graph — the rebuild's analog of the reference's example
  * schema (reference example.lisp:22-37: person/customer vertices, knows
  * /likes edges).
  *
  * Vertices: region, nation, customer, supplier, part, order, document.
  * Edges:
  *   in_region     nation  → region
  *   located_in    customer→ nation
  *   sup_located_in supplier→ nation
  *   placed        customer→ order    (weight = o_totalprice)
  *   contains      order   → part     (one per lineitem, weight = l_quantity)
  *   supplied_by   part    → supplier (one per lineitem)
  *   knows         customer→ customer (synthetic small-world links so the
  *                                     graph has real traversal depth)
  *
  * `customer` is declared as a subtype of `person` (an id-only abstract
  * parent) to exercise the reference's subclass-scan semantics
  * (node-class.lisp:108-122).
  */
object Tpch {

  val schema: GraphSchema = GraphSchema.builder()
    .vertex("person", "id", Seq.empty)
    .vertex("customer", "c_custkey", Seq("c_name", "c_nationkey", "c_acctbal", "c_mktsegment"), parent = Some("person"))
    .vertex("region", "r_regionkey", Seq("r_name"))
    .vertex("nation", "n_nationkey", Seq("n_name", "n_regionkey"))
    .vertex("supplier", "s_suppkey", Seq("s_name", "s_nationkey", "s_acctbal"))
    .vertex("part", "p_partkey", Seq("p_name", "p_brand", "p_type", "p_size", "p_retailprice"))
    .vertex("order", "o_orderkey", Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"))
    .vertex("document", "doc_id", Seq("text", "lang", "source", "n_chars"))
    .edge("in_region", "nation", "region")
    .edge("located_in", "customer", "nation")
    .edge("sup_located_in", "supplier", "nation")
    .edge("placed", "customer", "order", Seq("o_orderdate", "o_orderstatus", "o_orderpriority"))
    .edge("contains", "order", "part", Seq("l_extendedprice", "l_discount", "l_shipdate",
      "l_linenumber", "l_suppkey", "l_returnflag", "l_linestatus"))
    .edge("supplied_by", "part", "supplier", Seq("l_orderkey"))
    .edge("knows", "customer", "customer")
    .build()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Synthetic knows-edges: each customer links to (3k+7) mod n and
    * (5k+3) mod n. Deterministic, SQL-expressible (the DuckDB oracle
    * reproduces the same formula), and produces a connected small-world
    * graph with nontrivial BFS depth at every scale factor.
    */
  def knowsEdges(customer: DataFrame): DataFrame = {
    val n = customer.select(count(lit(1))).as("cnt")
    val withN = customer.select(col("c_custkey").as("src")).crossJoin(broadcast(n.toDF("n")))
    withN.select(col("src"), ((col("src") * 3 + 7) % col("n")).as("dst"))
      .union(withN.select(col("src"), ((col("src") * 5 + 3) % col("n")).as("dst")))
      .withColumn("weight", lit(1.0))
  }

  // one PropertyGraph per (session, dataset): construction reads eight
  // parquet footers for schema inference, which a session catalog would
  // cache as table metadata — rebuilding it per query re-paid that on
  // every call. Frames inside are lazy and immutable, so sharing is safe.
  private val graphCache =
    scala.collection.concurrent.TrieMap.empty[String, PropertyGraph]

  def graph(spark: SparkSession, sfDir: String): PropertyGraph =
    graphCache.getOrElseUpdate(s"${spark.sparkContext.applicationId}:$sfDir",
      buildGraph(spark, sfDir))

  private def buildGraph(spark: SparkSession, sfDir: String): PropertyGraph = {
    val customer = table(spark, sfDir, "customer")
    val orders = table(spark, sfDir, "orders")
    val lineitem = table(spark, sfDir, "lineitem")
    val nation = table(spark, sfDir, "nation")
    val region = table(spark, sfDir, "region")
    val supplier = table(spark, sfDir, "supplier")
    val part = table(spark, sfDir, "part")
    val documents = table(spark, sfDir, "documents")

    def v(df: DataFrame, idCol: String): DataFrame = df.withColumnRenamed(idCol, "id")

    val vertexFrames = Map(
      // `person` is abstract: no frame of its own; scans of it resolve
      // to its concrete descendants (customer)
      "customer" -> v(customer, "c_custkey"),
      "region" -> v(region, "r_regionkey"),
      "nation" -> v(nation, "n_nationkey"),
      "supplier" -> v(supplier, "s_suppkey"),
      "part" -> v(part, "p_partkey"),
      "order" -> v(orders, "o_orderkey"),
      "document" -> v(documents, "doc_id"))

    val edgeFrames = Map(
      "in_region" -> nation.select(col("n_nationkey").as("src"), col("n_regionkey").cast("long").as("dst"), lit(1.0).as("weight")),
      "located_in" -> customer.select(col("c_custkey").as("src"), col("c_nationkey").cast("long").as("dst"), lit(1.0).as("weight")),
      "sup_located_in" -> supplier.select(col("s_suppkey").as("src"), col("s_nationkey").cast("long").as("dst"), lit(1.0).as("weight")),
      "placed" -> orders.select(col("o_custkey").as("src"), col("o_orderkey").as("dst"),
        col("o_totalprice").as("weight"), col("o_orderdate"), col("o_orderstatus"), col("o_orderpriority")),
      "contains" -> lineitem.select(col("l_orderkey").as("src"), col("l_partkey").as("dst"),
        col("l_quantity").as("weight"), col("l_extendedprice"), col("l_discount"), col("l_shipdate"),
        col("l_linenumber"), col("l_suppkey"), col("l_returnflag"), col("l_linestatus")),
      "supplied_by" -> lineitem.select(col("l_partkey").as("src"), col("l_suppkey").as("dst"),
        lit(1.0).as("weight"), col("l_orderkey")),
      "knows" -> knowsEdges(customer))

    new PropertyGraph(Tpch.schema, vertexFrames, edgeFrames,
      // region/nation are constant-size; supplier stays tiny at every SF.
      smallLabels = Set("region", "nation", "supplier"))
  }
}
