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

  test("vacuum between increments: live state converges, and the chain " +
      "PRESERVES point-in-time fidelity retention destroys in the source") {
    // Retention (vacuum keep=1) drops superseded revisions in place,
    // keeping survivors at their original commit_epoch. The contract
    // with the chain is asymmetric, and deliberately so: LIVE state
    // always converges (the newest revision of every id survives both
    // sides), but an increment dumped BEFORE the vacuum carries rows
    // retention later drops — so the restored store answers asOf
    // exactly as the original unvacuumed store would for every epoch
    // the pre-vacuum increments cover, while the vacuumed source has
    // irreversibly degraded those answers. Backups are the PIT archive
    // the reaper cannot reach (the reference archives txns OUT of the
    // store the same way, transactions.lisp:408-599); what vacuum
    // drops before any increment captured it is gone from both sides
    // equally. Backup.replay's OCC-replay caveat does not apply to the
    // chain, which installs verbatim.
    val (gs, tables) = mkStore()
    val root = tmp("bchain-vac-root")
    gs.txn().createVertices("doc",
      (0L until 10L).map(i => (i, i)).toDF("id", "score")).commit() // e1
    assert(Backup.incremental(gs.store, tables, root) == 1L)
    // unbacked window with churn: rev 2 and rev 3 of the same ids land
    // AFTER the last increment...
    gs.txn().updateVertices("doc",
      (0L until 4L).map(i => (i, 100L + i)).toDF("id", "score")).commit() // e2
    gs.txn().updateVertices("doc",
      (0L until 4L).map(i => (i, 200L + i)).toDF("id", "score")).commit() // e3
    gs.txn().deleteVertices("doc", Seq(9L).toDF("id")).commit() // e4
    // ...and vacuum drops the superseded rev-2 rows before the next one
    gs.store.vacuum("v_doc", keep = 1)
    assert(Backup.incremental(gs.store, tables, root) == 4L)
    gs.txn().createVertices("doc", Seq((50L, 5L)).toDF("id", "score")).commit() // e5
    assert(Backup.incremental(gs.store, tables, root) == 5L)

    val restored = Backup.restoreChain(spark, root, tmp("bchain-vac-restore"))
    assert(restored.currentEpoch == 5L)
    // LIVE parity always holds: keep>=1 never drops an id's newest rev
    // (v_tag is never written in this fixture — vacuum churn is v_doc's)
    assert(sortedRows(restored, "v_doc") == sortedRows(gs.store, "v_doc"),
      "v_doc live rows drifted")
    // the restored store answers asOf(1) as the ORIGINAL store did:
    // all ten rev-1 rows, dumped by the pre-vacuum increment...
    def asOfIds(s: VersionedStore, e: Long): Seq[Long] =
      s.read("v_doc", asOf = Some(e)).select("id").as[Long].collect().sorted.toSeq
    assert(asOfIds(restored, 1L) == (0L until 10L),
      "chain restore must preserve the pre-vacuum epoch-1 snapshot verbatim")
    // ...while the vacuumed source has degraded that answer (rev 1 of
    // the since-updated ids 0-3 and since-deleted id 9 are gone)
    assert(asOfIds(gs.store, 1L) == (4L until 9L),
      "fixture: vacuum must actually have degraded the source's asOf(1)")
    // history: restored ⊇ source, and the difference is EXACTLY the
    // backed-up rows vacuum dropped (never more, never resurrection)
    def hist(s: VersionedStore) = s.history("v_doc")
      .select("id", "rev").as[(Long, Long)].collect().toSet
    assert(hist(gs.store).subsetOf(hist(restored)),
      "the chain must carry everything the source still has")
    assert(hist(restored) -- hist(gs.store) ==
      ((0L until 4L).map(_ -> 1L) :+ (9L -> 1L)).toSet,
      "restored-minus-source must be exactly the pre-vacuum dumped rows")
    // what vacuum dropped BEFORE any increment captured it (the rev-2
    // slice landed and was superseded inside one backup window) is
    // gone from both sides equally — backups cannot archive what they
    // never saw
    assert(gs.store.history("v_doc").filter(col("rev") === 2L)
      .filter(col("deleted") === false).count() == 0,
      "fixture: vacuum must actually have dropped the rev-2 updates")
    assert(restored.history("v_doc").filter(col("rev") === 2L)
      .filter(col("deleted") === false).count() == 0,
      "the chain must not resurrect rows vacuum dropped before any dump")
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
