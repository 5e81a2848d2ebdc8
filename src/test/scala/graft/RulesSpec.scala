package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.model.Tpch
import graft.operators.Skew
import graft.query._
import graft.views.{ViewCatalog, ViewDef}

/** Rule definitions (<- analog), view goals inside patterns, salted
  * joins.
  */
class RulesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val g = Tpch.graph(spark, sf)

  test("non-recursive rule with two clauses unions and dedups") {
    val rs = new RuleSet(g)
    rs.define("high_value", Seq("c")) { g =>
      g.edgeFrame("placed").filter($"weight" > 300000.0).select($"src".as("c"))
    }
    rs.define("high_value", Seq("c")) { g =>
      g.vertexFrame("customer").filter($"c_acctbal" > 9000.0).select($"id".as("c"))
    }
    val viaRule = rs.relation("high_value").as[Long].collect().toSet
    val direct = (g.edgeFrame("placed").filter($"weight" > 300000.0).select($"src").as[Long].collect().toSet
      ++ g.vertexFrame("customer").filter($"c_acctbal" > 9000.0).select($"id").as[Long].collect().toSet)
    assert(viaRule == direct && viaRule.nonEmpty)
    // head mismatch rejected
    intercept[IllegalArgumentException] {
      rs.define("high_value", Seq("x"))(_ => spark.range(1).toDF("x"))
    }
  }

  test("rule invocation inside a pattern joins on bound vars") {
    val rs = new RuleSet(g)
    rs.define("has_f_order", Seq("c")) { g =>
      g.edgeFrame("placed").filter($"o_orderstatus" === "F").select($"src".as("c")).distinct()
    }
    val got = PatternCompiler.run(g, PatternQuery(
      goals = Seq(IsA("c", "customer"), RuleGoal("has_f_order", Seq("c")),
        Slot("c", "c_name", "n")),
      select = Seq("c" -> "custkey", "n" -> "name"),
      orderBy = Seq(col("custkey"))), rules = Some(rs))
    val want = g.edgeFrame("placed").filter($"o_orderstatus" === "F")
      .select($"src").distinct().count()
    assert(got.count() == want)
  }

  test("recursive rule via fixpoint matches Traverse closure") {
    val rs = new RuleSet(g)
    rs.defineRecursive("reach", Seq("id")) { _ =>
      spark.range(1, 2).toDF("id")
    } { (g, delta) =>
      val e = g.edgeFrame("knows")
      delta.join(e, delta("id") === e("src")).select($"dst".as("id"))
    }
    val viaRule = rs.relation("reach").as[Long].collect().toSet
    val viaBfs = graft.operators.Traverse.bfs(
      g.edgeFrame("knows"), spark.range(1, 2).toDF("id"), maxDepth = 1000)
      .select("id").as[Long].collect().toSet
    assert(viaRule == viaBfs && viaRule.size > 3)
  }

  test("view goal joins the solution stream against a materialized view") {
    val tmp = Files.createTempDirectory(java.nio.file.Paths.get("target"), "vg").toString
    val cat = new ViewCatalog(spark, g, tmp)
    cat.register(ViewDef("orders_by_cust", "placed",
      df => df.select($"src".as("key"), $"dst".as("id"), $"weight".as("value"))))
    cat.regenerate("orders_by_cust")
    val got = PatternCompiler.run(g, PatternQuery(
      goals = Seq(IsA("a", "customer"), Filter(col("a") === 7L),
        ViewGoal("orders_by_cust", key = "a", id = "okey", value = "price")),
      select = Seq("a" -> "custkey", "okey" -> "orderkey", "price" -> "price"),
      orderBy = Seq(col("orderkey"))), views = Some(cat))
    val want = g.edgeFrame("placed").filter($"src" === 7).count()
    assert(got.count() == want && want > 0)
    // unbound key rejected
    intercept[IllegalArgumentException] {
      PatternCompiler.run(g, PatternQuery(
        goals = Seq(ViewGoal("orders_by_cust", "z", "i", "v")), select = Seq("i" -> "i")),
        views = Some(cat))
    }
  }

  test("salted join equals plain join; hot keys diagnostic") {
    val big = g.edgeFrame("contains").select($"src".as("k"), $"weight")
    val small = g.vertexFrame("order").select($"id".as("k"), $"o_totalprice")
    val plain = big.join(small, "k").count()
    val salted = Skew.saltedJoin(big, small, "k", salt = 8).count()
    assert(salted == plain)
    val hot = Skew.hotKeys(big, "k", 3).collect()
    assert(hot.length == 3 && hot.head.getAs[Long]("n") >= hot.last.getAs[Long]("n"))
  }

  test("reduced view goal binds the per-key aggregate (invoke-reduced-view)") {
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"), "rvg").toString
    val cat = new ViewCatalog(spark, g, dir)
    cat.register(ViewDef("order_totals", "placed",
      df => df.select(col("src").as("key"), col("dst").as("id"), col("weight").as("value")),
      reduceAgg = Some(sum(col("value")))))
    cat.regenerate("order_totals")
    val got = PatternCompiler.run(g, PatternQuery(
      goals = Seq(IsA("a", "customer"),
        ReducedViewGoal("order_totals", "a", "total", n = Some("n_orders"))),
      select = Seq("a" -> "custkey", "total" -> "total", "n_orders" -> "n_orders")),
      views = Some(cat))
    val direct = g.edgeFrame("placed").groupBy($"src".as("custkey"))
      .agg(sum($"weight").as("total"), count(lit(1)).as("n_orders"))
    assert(got.count() == direct.count() && got.count() > 0)
    val gm = got.select("custkey", "n_orders").as[(Long, Long)].collect().toMap
    val dm = direct.select("custkey", "n_orders").as[(Long, Long)].collect().toMap
    assert(gm == dm)
  }
}
