package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the §7.2/§7.3 "pre-partitioning"
  * scale story: when both sides of a recurring join are bucketed on the
  * key, the join runs with ZERO shuffle (each bucket pair joins in
  * place). This is what replaces the reference's VE/VEV adjacency
  * indexes for repeated heavy joins at cluster scale.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join plans with no shuffle exchange; plain join shuffles") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").agg(sum($"l_quantity").as("q"))
      def countShuffles(df: org.apache.spark.sql.DataFrame): Int = {
        df.collect() // force the final adaptive plan
        val plan = df.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan
          case p => p
        }
        // AQE wraps materialized shuffles in leaf QueryStage nodes, so
        // tree traversal cannot reach them — count on the rendered tree
        "ShuffleQueryStage".r.findAllIn(plan.treeString).size
      }
      val shuffles = countShuffles(joined)
      // only the final groupBy aggregation may shuffle - the join itself
      // is co-located (1 exchange instead of 3)
      assert(shuffles <= 1,
        s"expected bucketed join without join-side shuffles, got $shuffles:\n" +
          joined.queryExecution.executedPlan)

      val plain = lineitem.join(orders, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").agg(sum($"l_quantity").as("q"))
      val plainShuffles = countShuffles(plain)
      assert(plainShuffles > shuffles, "plain join should shuffle both sides")

      // same answer either way
      val a = joined.orderBy("o_orderstatus").as[(String, Double)].collect().toSeq
      val b = plain.orderBy("o_orderstatus").as[(String, Double)].collect().toSeq
      assert(a == b)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
