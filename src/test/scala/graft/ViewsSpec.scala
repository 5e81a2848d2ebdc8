package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.model.Tpch
import graft.views.{ViewCatalog, ViewDef}

/** Materialized view semantics (view-tests analog, SURVEY.md §5). */
class ViewsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val g = Tpch.graph(spark, sf)
  private lazy val tmp = Files.createTempDirectory(
    java.nio.file.Paths.get("target"), "views").toString
  private lazy val cat = {
    val c = new ViewCatalog(spark, g, tmp)
    c.register(ViewDef(
      name = "orders_by_customer",
      sourceLabel = "placed",
      mapFn = df => df.select(col("src").as("key"), col("dst").as("id"),
        col("weight").as("value")),
      reduceAgg = Some(sum(col("value")))))
    c.register(ViewDef(
      name = "customers_by_balance_desc",
      sourceLabel = "customer",
      mapFn = df => df.select(col("c_acctbal").as("key"), col("id"),
        col("c_name").as("value")),
      descending = true))
    c.regenerate("orders_by_customer")
    c.regenerate("customers_by_balance_desc")
    c
  }

  test("keyed lookup matches direct query") {
    val got = cat.lookup("orders_by_customer", 7L).select("id").as[Long].collect().toSet
    val want = g.edgeFrame("placed").filter($"src" === 7).select("dst").as[Long].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("range scan is ordered with paging") {
    val page = cat.mapView("orders_by_customer",
      startKey = Some(10L), endKey = Some(20L), skip = 2, count = 5)
      .select("key").as[Long].collect()
    assert(page.length == 5)
    assert(page.sameElements(page.sorted))
    assert(page.forall(k => k >= 10 && k <= 20))
  }

  test("descending view order") {
    val keys = cat.mapView("customers_by_balance_desc", count = 10)
      .select("key").as[Double].collect()
    assert(keys.sameElements(keys.sorted.reverse))
  }

  test("reduced view matches groupBy; grand total matches global agg") {
    val red = cat.reducedView("orders_by_customer").select("key", "value")
      .as[(Long, Double)].collect().toMap
    val want = g.edgeFrame("placed").groupBy("src").agg(sum("weight"))
      .as[(Long, Double)].collect().toMap
    assert(red.keySet == want.keySet)
    // grand total = :gagg master row
    val grand = cat.grandTotal("orders_by_customer").head()
    assert(grand.getAs[Long]("n") == g.edgeFrame("placed").count())
  }

  test("incremental append delta becomes visible") {
    val before = cat.lookup("orders_by_customer", 999999L).count()
    assert(before == 0)
    val delta = Seq((999999L, 123L, 42.0)).toDF("src", "dst", "weight")
    cat.appendDelta("orders_by_customer", delta)
    assert(cat.lookup("orders_by_customer", 999999L).count() == 1)
  }

  test("bad map output and unknown view fail fast") {
    intercept[IllegalArgumentException] { cat.lookup("nope", 1) }
    val c2 = new ViewCatalog(spark, g, tmp)
    c2.register(ViewDef("broken", "customer", df => df.select(col("id"))))
    intercept[IllegalArgumentException] { c2.regenerate("broken") }
    intercept[IllegalArgumentException] {
      cat.reducedView("customers_by_balance_desc") // no reduce fn
    }
  }

  test("interrupted regenerate publish leaves the current generation serving; " +
      "next regenerate sweeps the leftovers") {
    import java.nio.file.{Files => F, Paths}
    val dir = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "views-heal").toString
    val cat = new graft.views.ViewCatalog(spark, g, dir)
    cat.register(graft.views.ViewDef("bal", "customer",
      df => df.select(col("c_mktsegment").as("key"), col("id"), col("c_acctbal").as("value")),
      reduceAgg = Some(sum(col("value")))))
    cat.regenerate("bal")
    val before = cat.grandTotal("bal").collect().head
    // simulate the two crash points of a generation publish (GenDirs):
    // a half-filled staging dir, and a fully-moved next generation whose
    // pointer flip never happened — both invisible to readers
    F.createDirectories(Paths.get(s"$dir/views/bal/gen@2.tmp/base"))
    F.createDirectories(Paths.get(s"$dir/views/bal/gen@2/base"))
    assert(cat.grandTotal("bal").collect().head == before,
      "crash leftovers must not affect reads — the pointer still names gen@1")
    // the next regenerate claims gen@2 (discarding the orphan), flips
    // the pointer, and sweeps the staging leftover
    cat.regenerate("bal")
    assert(cat.grandTotal("bal").collect().head == before)
    assert(!F.exists(Paths.get(s"$dir/views/bal/gen@2.tmp")))
    assert(F.readString(Paths.get(s"$dir/views/bal/_GEN")).trim == "2")
    // one more regenerate: gen@3 publishes, gen@1 (two behind) is swept,
    // gen@2 is kept as the reader-grace generation
    cat.regenerate("bal")
    assert(!F.exists(Paths.get(s"$dir/views/bal/gen@1")))
    assert(F.exists(Paths.get(s"$dir/views/bal/gen@2")))
    assert(cat.grandTotal("bal").collect().head == before)
  }
}
