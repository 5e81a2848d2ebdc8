package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.model.{Backup, GraphSchema, GraphStore, VersionedStore}

/** Incremental backup chain (Backup.incremental / restoreChain): dump
  * cost proportional to writes-since-last-backup, restore through the
  * replication apply path, point-in-time prefix restores, loud refusal
  * of gapped chains, crash-invisible half-written increments.
  */
class BackupChainSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(Paths.get("target"), prefix).toString

  private def mkStore(): (GraphStore, Seq[String]) = {
    val schema = GraphSchema.builder()
      .vertex("doc", "id", Seq("score"))
      .vertex("tag", "id", Seq("name")).build()
    val gs = new GraphStore(spark, schema, tmp("bchain-store"))
    (gs, Seq("v_doc", "v_tag"))
  }

  private def sortedRows(s: VersionedStore, t: String): Seq[String] =
    s.read(t).orderBy("id").collect().map(_.json).toSeq

  test("chain round trip: two increments + a no-op call rebuild identical " +
      "read/history/asOf surfaces") {
    val (gs, tables) = mkStore()
    val root = tmp("bchain-root")
    // epochs 1-3: creates on both labels, then an update
    gs.txn().createVertices("doc",
      (0L until 20L).map(i => (i, i * 10L)).toDF("id", "score")).commit()
    gs.txn().createVertices("tag",
      (0L until 5L).map(i => (i, s"t$i")).toDF("id", "name")).commit()
    gs.txn().updateVertices("doc",
      Seq((3L, 999L)).toDF("id", "score")).commit()
    assert(Backup.incremental(gs.store, tables, root) == 3L)
    // epochs 4-5: a delete and a late create
    gs.txn().deleteVertices("doc", Seq(7L).toDF("id")).commit()
    gs.txn().createVertices("doc", Seq((100L, 1L)).toDF("id", "score")).commit()
    assert(Backup.incremental(gs.store, tables, root) == 5L)
    // nothing new: no-op, no third increment dir
    assert(Backup.incremental(gs.store, tables, root) == 5L)
    assert(Files.list(Paths.get(root)).count() == 2)

    val restored = Backup.restoreChain(spark, root, tmp("bchain-restore"))
    assert(restored.currentEpoch == 5L)
    tables.foreach { t =>
      assert(sortedRows(restored, t) == sortedRows(gs.store, t),
        s"$t live rows drifted")
      assert(restored.history(t).count() == gs.store.history(t).count(),
        s"$t version history drifted")
    }
    // MVCC surfaces survive the round trip: the epoch-3 snapshot sees
    // the update but not the delete
    val asOf3 = restored.read("v_doc", asOf = Some(3L))
    assert(asOf3.filter(col("id") === 3L).head().getAs[Long]("score") == 999L)
    assert(asOf3.filter(col("id") === 7L).count() == 1L)
    assert(asOf3.filter(col("id") === 100L).count() == 0L)
  }

  test("point-in-time restore: a chain prefix cut mid-increment equals " +
      "the source's asOf view") {
    val (gs, tables) = mkStore()
    val root = tmp("bchain-root")
    gs.txn().createVertices("doc",
      (0L until 10L).map(i => (i, i)).toDF("id", "score")).commit()
    gs.txn().updateVertices("doc", Seq((2L, 222L)).toDF("id", "score")).commit()
    gs.txn().deleteVertices("doc", Seq(5L).toDF("id")).commit()
    Backup.incremental(gs.store, tables, root) // one increment, epochs 1-3
    val restored = Backup.restoreChain(spark, root, tmp("bchain-pit"), upTo = 2L)
    assert(restored.currentEpoch == 2L)
    assert(sortedRows(restored, "v_doc") ==
      gs.store.read("v_doc", asOf = Some(2L)).orderBy("id").collect().map(_.json).toSeq)
    assert(restored.read("v_doc").filter(col("id") === 5L).count() == 1L,
      "the epoch-3 delete must not reach an upTo=2 restore")
  }

  test("gapped chains refuse loudly; manifest-less increments are " +
      "invisible (crash discipline)") {
    val (gs, tables) = mkStore()
    val root = tmp("bchain-root")
    gs.txn().createVertices("doc", Seq((1L, 1L)).toDF("id", "score")).commit()
    Backup.incremental(gs.store, tables, root)
    gs.txn().createVertices("doc", Seq((2L, 2L)).toDF("id", "score")).commit()
    Backup.incremental(gs.store, tables, root)
    // delete the FIRST increment: restore must refuse at the gap
    val first = Files.list(Paths.get(root)).iterator()
    val toDrop = {
      val all = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
      first.forEachRemaining(p => { all += p; () })
      all.minBy(_.getFileName.toString)
    }
    val e = intercept[IllegalArgumentException] {
      // hide the manifest — the increment reads as a crashed dump
      Files.move(toDrop.resolve("_manifest.json"), toDrop.resolve("_m.bak"))
      try Backup.restoreChain(spark, root, tmp("bchain-gap"))
      finally Files.move(toDrop.resolve("_m.bak"), toDrop.resolve("_manifest.json"))
    }
    assert(e.getMessage.contains("gap"), e.getMessage)
    // a half-written increment must not advance the chain cursor: the
    // next incremental RE-COVERS its window instead of skipping it
    gs.txn().createVertices("doc", Seq((3L, 3L)).toDF("id", "score")).commit()
    val crashed = Paths.get(root, "inc_2_3")
    Files.createDirectories(crashed) // dir exists, no manifest
    assert(Backup.chainTo(root) == 2L, "crashed dump must not count")
    assert(Backup.incremental(gs.store, tables, root) == 3L)
    assert(Files.exists(crashed.resolve("_manifest.json")),
      "the re-dump must complete the crashed window in place")
    val full = Backup.restoreChain(spark, root, tmp("bchain-heal"))
    assert(full.currentEpoch == 3L && full.read("v_doc").count() == 3L)
  }
}
