package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.model.VersionedStore

/** MVCC / transaction semantics (mvcc-tests + acid suite analog):
  * atomic multi-table visibility, snapshot reads, OCC conflicts,
  * soft delete, retention vacuum.
  */
class VersionedStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore = new VersionedStore(spark,
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "vstore").toString)

  test("insert/read round trip and epoch bump") {
    val st = freshStore
    assert(st.currentEpoch == 0)
    val e1 = st.commit(Map("v" ->
      Seq((1L, 1L, false, "alice"), (2L, 1L, false, "bob"))
        .toDF("id", "rev", "deleted", "name")))
    assert(e1 == 1)
    val got = st.read("v").select("id", "name").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "alice", 2L -> "bob"))
  }

  test("writeReport: per-epoch write telemetry from the commit log alone") {
    val st = freshStore
    st.commit(Map("v" ->
      Seq((1L, 1L, false, "a"), (2L, 1L, false, "b")).toDF("id", "rev", "deleted", "name")))
    st.commit(Map(
      "v" -> Seq((3L, 1L, false, "c")).toDF("id", "rev", "deleted", "name"),
      "e" -> Seq((1L, 1L, false, 2L)).toDF("id", "rev", "deleted", "dst")))
    val rep = st.writeReport()
      .select("table", "commit_epoch", "rows")
      .as[(String, Long, Long)].collect().toSeq
    assert(rep == Seq(("e", 2L, 1L), ("v", 1L, 2L), ("v", 2L, 1L)))
    // committed_at populated and monotone per table
    val ts = st.writeReport().filter(col("table") === "v")
      .select(col("committed_at").cast("long")).as[Long].collect().toSeq
    assert(ts.forall(_ > 0) && ts == ts.sorted)
  }

  test("update creates new revision; snapshot read sees the old one") {
    val st = freshStore
    val e1 = st.commit(Map("v" -> Seq((1L, 1L, false, "alice")).toDF("id", "rev", "deleted", "name")))
    val e2 = st.commit(Map("v" -> Seq((1L, 2L, false, "alicia")).toDF("id", "rev", "deleted", "name")))
    assert(st.read("v").select("name").as[String].head() == "alicia")
    assert(st.read("v", asOf = Some(e1)).select("name").as[String].head() == "alice")
    assert(st.history("v").count() == 2)
    assert(e2 == 2)
  }

  test("soft delete hides the row; old snapshot still sees it") {
    val st = freshStore
    val e1 = st.commit(Map("v" -> Seq((1L, 1L, false, "x")).toDF("id", "rev", "deleted", "name")))
    st.commit(Map("v" -> Seq((1L, 2L, true, "x")).toDF("id", "rev", "deleted", "name")))
    assert(st.read("v").count() == 0)
    assert(st.read("v", asOf = Some(e1)).count() == 1)
  }

  test("OCC: stale revision and duplicate insert are rejected, nothing committed") {
    val st = freshStore
    st.commit(Map("v" -> Seq((1L, 1L, false, "x")).toDF("id", "rev", "deleted", "name")))
    // stale update (rev must be 2)
    intercept[st.ConflictException] {
      st.commit(Map("v" -> Seq((1L, 1L, false, "y")).toDF("id", "rev", "deleted", "name")))
    }
    // duplicate insert of existing id
    intercept[st.ConflictException] {
      st.commit(Map("v" -> Seq((1L, 1L, false, "z")).toDF("id", "rev", "deleted", "name")))
    }
    // wild rev for new id
    intercept[st.ConflictException] {
      st.commit(Map("v" -> Seq((9L, 5L, false, "w")).toDF("id", "rev", "deleted", "name")))
    }
    // same id staged twice in one commit (would create duplicate revs)
    intercept[st.ConflictException] {
      st.commit(Map("v" -> Seq((1L, 2L, false, "y"), (1L, 2L, false, "z"))
        .toDF("id", "rev", "deleted", "name")))
    }
    assert(st.currentEpoch == 1)
    assert(st.read("v").select("name").as[String].head() == "x")
  }

  test("multi-table commit is atomic: a conflict in one table blocks all") {
    val st = freshStore
    st.commit(Map("v" -> Seq((1L, 1L, false, "x")).toDF("id", "rev", "deleted", "name")))
    intercept[st.ConflictException] {
      st.commit(Map(
        "e" -> Seq((10L, 1L, false, "edge")).toDF("id", "rev", "deleted", "kind"),
        "v" -> Seq((1L, 9L, false, "bad")).toDF("id", "rev", "deleted", "name")))
    }
    // neither table advanced
    assert(st.read("e").count() == 0)
    assert(st.currentEpoch == 1)
  }

  test("vacuum keeps only newest revisions") {
    val st = freshStore
    st.commit(Map("v" -> Seq((1L, 1L, false, "a")).toDF("id", "rev", "deleted", "name")))
    st.commit(Map("v" -> Seq((1L, 2L, false, "b")).toDF("id", "rev", "deleted", "name")))
    st.commit(Map("v" -> Seq((1L, 3L, false, "c")).toDF("id", "rev", "deleted", "name")))
    assert(st.history("v").count() == 3)
    st.vacuum("v", keep = 1)
    assert(st.history("v").count() == 1)
    assert(st.read("v").select("name").as[String].head() == "c")
    // further commits still validate against the kept revision
    st.commit(Map("v" -> Seq((1L, 4L, false, "d")).toDF("id", "rev", "deleted", "name")))
    assert(st.read("v").select("name").as[String].head() == "d")
  }

  test("diff classifies added/updated/deleted; window-internal churn nets out") {
    val st = freshStore
    val e1 = st.commit(Map("v" ->
      Seq((1L, 1L, false, "a"), (2L, 1L, false, "b"), (3L, 1L, false, "c"))
        .toDF("id", "rev", "deleted", "name")))
    val e2 = st.commit(Map("v" ->
      Seq((2L, 2L, false, "b2"),   // update
        (4L, 1L, false, "d"),      // add
        (3L, 2L, true, "c"))       // delete
        .toDF("id", "rev", "deleted", "name")))
    val e3 = st.commit(Map("v" ->
      Seq((5L, 1L, false, "e"),    // added then deleted inside the window
        (1L, 2L, true, "a"))       // delete of an e1 row
        .toDF("id", "rev", "deleted", "name")))
    val e4 = st.commit(Map("v" ->
      Seq((5L, 2L, true, "e")).toDF("id", "rev", "deleted", "name")))
    def d(from: Long, to: Long) =
      st.diff("v", from, to).as[(Long, String)].collect().toMap
    assert(d(e1, e2) == Map(2L -> "updated", 4L -> "added", 3L -> "deleted"))
    // 5 nets out (added then tombstoned inside the window); 1 deleted
    assert(d(e1, e4) == Map(2L -> "updated", 4L -> "added",
      3L -> "deleted", 1L -> "deleted"))
    // identical endpoints -> empty; full range from the empty epoch
    assert(d(e4, e4).isEmpty)
    assert(d(0L, e1) == Map(1L -> "added", 2L -> "added", 3L -> "added"))
    // tombstone-then-recreate inside the window reads as updated
    val e5 = st.commit(Map("v" ->
      Seq((2L, 3L, true, "b2")).toDF("id", "rev", "deleted", "name")))
    val e6 = st.commit(Map("v" ->
      Seq((2L, 4L, false, "b3")).toDF("id", "rev", "deleted", "name")))
    assert(d(e4, e6) == Map(2L -> "updated"))
    assert(d(e4, e5) == Map(2L -> "deleted"))
    // diff stays consistent with asOf over the SURVIVING history:
    // vacuum(keep=1) destroys every e1-visible revision, so asOf(e1)
    // now reads empty and the live rows (2, 4) classify as added —
    // exactly what read(asOf) answers, never a stale pre-vacuum memory
    st.vacuum("v", keep = 1)
    assert(st.read("v", asOf = Some(e1)).count() == 0)
    assert(d(e1, e6) == Map(2L -> "added", 4L -> "added"))
  }

  test("crashed commit leaves no trace: orphan epoch dirs are cleared before writing") {
    import java.nio.file.{Files => F, Paths}
    val dir = F.createTempDirectory(java.nio.file.Paths.get("target"), "vstore").toString
    val st = new VersionedStore(spark, dir)
    st.commit(Map("v" -> Seq((1L, 1L, false, "a")).toDF("id", "rev", "deleted", "name")))
    // simulate a crashed commit: epoch-2 data landed, pointer never bumped
    Seq((99L, 1L, false, "ghost")).toDF("id", "rev", "deleted", "name")
      .write.parquet(s"$dir/v/commit_epoch=2")
    assert(st.read("v").count() == 1) // invisible, as documented
    // the NEXT commit also computes epoch 2: must not adopt the orphans
    st.commit(Map("v" -> Seq((2L, 1L, false, "b")).toDF("id", "rev", "deleted", "name")))
    val names = st.read("v").select("name").as[String].collect().toSet
    assert(names == Set("a", "b"))
    assert(st.history("v").filter(col("id") === 99L).count() == 0)
  }

  test("vacuum preserves original commit epochs so asOf snapshots survive") {
    val st = freshStore
    val e1 = st.commit(Map("v" -> Seq((1L, 1L, false, "a"), (2L, 1L, false, "x"))
      .toDF("id", "rev", "deleted", "name")))
    val e2 = st.commit(Map("v" -> Seq((1L, 2L, false, "b")).toDF("id", "rev", "deleted", "name")))
    st.vacuum("v", keep = 2) // keeps everything; must not re-stamp epochs
    assert(st.read("v", asOf = Some(e1)).select("name").as[String].collect().toSet == Set("a", "x"))
    assert(st.read("v", asOf = Some(e2)).select("name").as[String].collect().toSet == Set("b", "x"))
  }

  test("interrupted vacuum swap heals on next read") {
    import java.nio.file.{Files => F, Paths, StandardCopyOption}
    val dir = F.createTempDirectory(java.nio.file.Paths.get("target"), "vstore").toString
    val st = new VersionedStore(spark, dir)
    st.commit(Map("v" -> Seq((1L, 1L, false, "a")).toDF("id", "rev", "deleted", "name")))
    // simulate a crash between vacuum's two renames: table dir moved
    // aside, replacement never moved in
    F.move(Paths.get(s"$dir/v"), Paths.get(s"$dir/v__vacuum_old"),
      StandardCopyOption.ATOMIC_MOVE)
    assert(st.read("v").select("name").as[String].head() == "a") // healed
    assert(!F.exists(Paths.get(s"$dir/v__vacuum_old")))
  }

  test("latestRevisions includes tombstones") {
    val st = freshStore
    st.commit(Map("v" -> Seq((1L, 1L, false, "a")).toDF("id", "rev", "deleted", "name")))
    st.commit(Map("v" -> Seq((1L, 2L, true, "a")).toDF("id", "rev", "deleted", "name")))
    val r = st.latestRevisions("v").as[(Long, Long, Boolean)].head()
    assert(r == ((1L, 2L, true)))
  }

  test("concurrent writers serialize: 8 threads, every commit lands exactly once") {
    // the concurrent-rw shape of the baseline (8 threads × mixed ops):
    // OCC + the two-tier write lock must serialize same-JVM threads
    // (bare FileLock would throw OverlappingFileLockException)
    val st = freshStore
    val threads = 8; val perThread = 4
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    (0 until threads).foreach { t =>
      pool.submit(new Runnable {
        def run(): Unit = try {
          (0 until perThread).foreach { i =>
            val id = (t * perThread + i).toLong
            st.commit(Map("v" -> Seq((id, 1L, false, s"w$t-$i"))
              .toDF("id", "rev", "deleted", "name")))
          }
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(120, java.util.concurrent.TimeUnit.SECONDS))
    assert(errors.isEmpty, s"concurrent commit failed: ${errors.peek()}")
    assert(st.currentEpoch == threads * perThread) // every commit got its own epoch
    assert(st.read("v").count() == threads * perThread)
  }

  test("layout versioning: stamp on open, refuse mismatches, migrate legacy flat stores") {
    // a fresh store stamps the current layout
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"), "vstore-layout")
    new VersionedStore(spark, dir.toString)
    assert(Files.readString(dir.resolve("_layout_version")).trim.toInt ==
      VersionedStore.LayoutVersion)
    // a mismatched stamp refuses to open
    Files.writeString(dir.resolve("_layout_version"), "1")
    intercept[IllegalStateException] { new VersionedStore(spark, dir.toString) }

    // build a LEGACY v1 fixture: flat per-label parquet version tables
    // (no epoch partition dirs), with a multi-epoch history including
    // an update and a tombstone, plus the legacy pointer file
    val legacy = Files.createTempDirectory(java.nio.file.Paths.get("target"), "vstore-v1")
    Seq(
      (1L, 1L, false, "alice", 1L), (2L, 1L, false, "bob", 1L),
      (1L, 2L, false, "alicia", 2L), // update in epoch 2
      (2L, 2L, true, "bob", 3L))     // delete in epoch 3
      .toDF("id", "rev", "deleted", "name", "commit_epoch")
      .coalesce(1).write.parquet(s"$legacy/v")
    Seq((7L, 1L, false, 9.5)).toDF("id", "rev", "deleted", "w")
      .coalesce(1).write.parquet(s"$legacy/e")
    Files.writeString(legacy.resolve("_epoch"), "3")
    // an unstamped flat store refuses a direct open...
    intercept[IllegalStateException] { new VersionedStore(spark, legacy.toString) }
    // ...and migrates by replay into a fresh v2 store
    val dest = Files.createTempDirectory(java.nio.file.Paths.get("target"), "vstore-v2")
    val migrated = VersionedStore.migrateStore(spark, legacy.toString, dest.toString)
    assert(migrated.currentEpoch == 3)
    // read() converges: latest live state only
    assert(migrated.read("v").select("id", "name").as[(Long, String)].collect().toMap ==
      Map(1L -> "alicia"))
    assert(migrated.read("e").count() == 1)
    // history() keeps every version at its original epoch; asOf resolves
    assert(migrated.history("v").count() == 4)
    assert(migrated.read("v", asOf = Some(1L)).select("id").as[Long].collect().toSet ==
      Set(1L, 2L))
    assert(migrated.read("v", asOf = Some(2L)).select("name").as[String].collect().toSet ==
      Set("alicia", "bob"))
    // the migrated store is stamped and re-opens cleanly; new commits apply
    val reopened = new VersionedStore(spark, dest.toString)
    val e4 = reopened.commit(Map("v" ->
      Seq((3L, 1L, false, "carol")).toDF("id", "rev", "deleted", "name")))
    assert(e4 == 4 && reopened.read("v").count() == 2)
  }
}
