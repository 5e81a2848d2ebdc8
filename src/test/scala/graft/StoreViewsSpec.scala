package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.model.{GraphSchema, GraphStore}
import graft.views.{ViewCatalog, ViewDef}

/** Write-path incremental view maintenance: a catalog bound to a
  * GraphStore refreshes registered views inside each commit — reads
  * after create/update/delete see fresh view rows WITHOUT a full
  * regenerate (reference views.lisp:331-374 incremental add, 400-427
  * recompute-on-delete; tests/view-tests.lisp).
  */
class StoreViewsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = GraphSchema.builder()
    .vertex("acct", "id", Seq("seg", "bal"))
    .build()

  private def tmp(prefix: String) =
    Files.createTempDirectory(Paths.get("target"), prefix).toString

  private def viewGen(dir: String) =
    graft.model.GenDirs.current(Paths.get(s"$dir/views/by_seg"))
  private def baseFiles(dir: String) = {
    val p = viewGen(dir).resolve("base")
    Files.list(p).map(_.getFileName.toString).sorted.toArray.toSeq
  }

  test("commit maintains bound views incrementally (create/update/delete)") {
    val dir = tmp("svw")
    val gs = new GraphStore(spark, schema, dir)
    gs.txn().createVertices("acct",
      Seq((1L, "gold", 10.0), (2L, "gold", 20.0), (3L, "iron", 5.0))
        .toDF("id", "seg", "bal")).commit()

    val cat = new ViewCatalog(spark, gs, dir)
    cat.register(ViewDef("by_seg", "acct",
      df => df.select(col("seg").as("key"), col("id"), col("bal").as("value")),
      reduceAgg = Some(sum(col("value")))))
    cat.regenerate("by_seg")
    cat.bindTo(gs)
    val frozenBase = baseFiles(dir)

    def reduced(): Map[String, (Double, Long)] =
      cat.reducedView("by_seg").select("key", "value", "n")
        .as[(String, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    // create: new id appears under its key in the same commit
    gs.txn().createVertices("acct",
      Seq((4L, "iron", 7.5)).toDF("id", "seg", "bal")).commit()
    assert(reduced() == Map("gold" -> (30.0, 2L), "iron" -> (12.5, 2L)))

    // update that MOVES a row across keys: old map row superseded
    gs.txn().updateVertices("acct",
      Seq((2L, "iron", 21.0)).toDF("id", "seg", "bal")).commit()
    assert(reduced() == Map("gold" -> (10.0, 1L), "iron" -> (33.5, 3L)))

    // delete: tombstone removes the id from the view
    gs.txn().deleteVertices("acct", Seq(Tuple1(1L)).toDF("id")).commit()
    assert(reduced() == Map("iron" -> (33.5, 3L)))
    assert(cat.lookup("by_seg", "gold").count() == 0)

    // all of the above was delta-maintained: base untouched, deltas present
    assert(baseFiles(dir) == frozenBase)
    assert(Files.list(viewGen(dir).resolve("delta")).count() == 3)

    // the maintained view equals a from-scratch recompute
    val fromSource = gs.graph().vertices("acct")
      .groupBy("seg").agg(sum("bal").as("v"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(reduced() == fromSource)

    // compaction: regenerate folds deltas into base and clears them
    cat.regenerate("by_seg")
    assert(!Files.exists(viewGen(dir).resolve("delta")))
    assert(reduced() == fromSource)
  }

  test("mapView range reads and grand total see maintained state") {
    val dir = tmp("svw2")
    val gs = new GraphStore(spark, schema, dir)
    gs.txn().createVertices("acct",
      (1L to 20L).map(i => (i, if (i % 2 == 0) "even" else "odd", i.toDouble))
        .toDF("id", "seg", "bal")).commit()
    val cat = new ViewCatalog(spark, gs, dir)
    cat.register(ViewDef("by_seg", "acct",
      df => df.select(col("seg").as("key"), col("id"), col("bal").as("value")),
      reduceAgg = Some(sum(col("value")))))
    cat.regenerate("by_seg")
    cat.bindTo(gs)
    gs.txn().deleteVertices("acct", Seq(Tuple1(2L), Tuple1(4L)).toDF("id")).commit()
    gs.txn().createVertices("acct", Seq((21L, "odd", 21.0)).toDF("id", "seg", "bal")).commit()

    val evens = cat.mapView("by_seg", startKey = Some("even"), endKey = Some("even"))
      .select("id").as[Long].collect().toSet
    assert(evens == (6L to 20L by 2).toSet)
    val grand = cat.grandTotal("by_seg").select("value", "n").as[(Double, Long)].head()
    assert(grand._2 == 19L && grand._1 == (1L to 21L).map(_.toDouble).sum - 2.0 - 4.0)
  }

  test("a view on a parent type is maintained by commits to subclass tables") {
    val dir = tmp("svw4")
    val hier = GraphSchema.builder()
      .vertex("acct", "id", Seq("seg", "bal"))
      .vertex("vip", "id", Seq("seg", "bal"), parent = Some("acct"))
      .build()
    val gs = new GraphStore(spark, hier, dir)
    gs.txn().createVertices("acct", Seq((1L, "a", 1.0)).toDF("id", "seg", "bal")).commit()
    gs.txn().createVertices("vip", Seq((100L, "a", 9.0)).toDF("id", "seg", "bal")).commit()
    val cat = new ViewCatalog(spark, gs, dir)
    // mapFn uses the `label` column vertices() attaches — the delta
    // path must present the same shape
    cat.register(ViewDef("by_label", "acct",
      df => df.select(col("label").as("key"), col("id"), col("id").cast("double").as("value")),
      reduceAgg = Some(count(lit(1)).cast("double"))))
    cat.regenerate("by_label")
    cat.bindTo(gs)
    // a commit to the SUBCLASS table refreshes the parent view
    gs.txn().createVertices("vip", Seq((101L, "b", 8.0)).toDF("id", "seg", "bal")).commit()
    val got = cat.mapView("by_label").select("key", "id")
      .as[(String, Long)].collect().toSet
    assert(got == Set(("acct", 1L), ("vip", 100L), ("vip", 101L)))
    // appendDelta is rejected on a bound catalog (would collide with
    // store commit epochs)
    intercept[IllegalArgumentException] {
      cat.appendDelta("by_label", Seq((5L, "x", 1.0)).toDF("id", "seg", "bal"))
    }
  }

  test("views registered but never regenerated are skipped by commits, then regenerate catches up") {
    val dir = tmp("svw3")
    val gs = new GraphStore(spark, schema, dir)
    gs.txn().createVertices("acct",
      Seq((1L, "a", 1.0)).toDF("id", "seg", "bal")).commit()
    val cat = new ViewCatalog(spark, gs, dir)
    cat.register(ViewDef("by_seg", "acct",
      df => df.select(col("seg").as("key"), col("id"), col("bal").as("value")),
      reduceAgg = Some(sum(col("value")))))
    cat.bindTo(gs)
    // commit before first materialization: no delta write, no failure
    gs.txn().createVertices("acct", Seq((2L, "a", 2.0)).toDF("id", "seg", "bal")).commit()
    intercept[IllegalArgumentException] { cat.lookup("by_seg", "a").count() }
    cat.regenerate("by_seg")
    assert(cat.lookup("by_seg", "a").count() == 2)
  }
}
