package graft

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.TimeUnit

import org.apache.spark.sql.functions._

import graft.model.{GraphStore, Replicator, VersionedStore}
import graft.operators.{Dedup, MaintainedDhashIndex, Multimodal, SignatureIndex}
import graft.tools.ReplicaFollowerMain

/** The scripted TWO-PROCESS master/slave run — the last reference test
  * family without an analog until now
  * (tests/replication/run-replication-test.sh forks a master and a
  * slave Lisp image over a socket; here the spec IS the master JVM and
  * forks a follower JVM, [[graft.tools.ReplicaFollowerMain]], that
  * tails the commit log across the process boundary with a spatial
  * subset filter). The master commits mixed ops including media while
  * the follower runs; at quiescence the spec asserts follower parity
  * for the store rows AND for the follower-maintained dedup/dHash
  * indexes, all from the files the dead follower left behind.
  */
class TwoProcessReplicationSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): Path =
    Files.createTempDirectory(Paths.get("target"), prefix)

  // western strip: the spatial subset the slave subscribes to
  private val subsetSql = "lon >= -120.0 AND lon <= -118.0"
  private def lonOf(id: Long): Double = if (id % 2 == 0) -119.0 else -117.0
  private def inSubset(id: Long): Boolean = id % 2 == 0
  private def rowOf(id: Long, gen: Int) =
    (id, s"two process doc $id gen$gen shared words " +
      (if (id % 5 == 0) "identical twin sentence payload" else s"tail${id % 11}"),
      (id % 3).toString, lonOf(id), 35.0 + (id % 40) * 0.01,
      Multimodal.synthPatternImageBytes(id + 7L * gen))
  private def frameOf(ids: Seq[Long], gen: Int) = ids.map(rowOf(_, gen))
    .toDF("id", "text", "seg", "lon", "lat", "img")

  test("master JVM commits mixed ops incl. media; a forked follower JVM tails " +
      "the commit log with a spatial subset; store AND maintained-index parity") {
    val masterDir = tmp("twoproc-m")
    val slaveDir = tmp("twoproc-s")
    val idxDir = tmp("twoproc-idx")
    val ready = masterDir.resolve("_READY")
    val stop = masterDir.resolve("_STOP")
    val done = masterDir.resolve("_DONE")

    val gs = new GraphStore(spark, ReplicaFollowerMain.harnessSchema,
      masterDir.toString)
    gs.txn().createVertices("doc", frameOf(0L until 40L, 0)).commit()

    // fork the follower JVM: own SparkSession, shared filesystem only
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    // the forked JVM inherits THIS JVM's classpath (it only needs main
    // classes + Spark, both necessarily on it) — no sandbox literals
    val cp = System.getProperty("java.class.path")
    val cmd = Seq(javaBin, "-Xmx3g") ++ ReplicaFollowerMain.jvmOpens ++
      Seq("-cp", cp, "graft.tools.ReplicaFollowerMain",
        masterDir.toString, slaveDir.toString, idxDir.toString, subsetSql,
        ready.toString, stop.toString, done.toString)
    val logFile = masterDir.resolve("follower.log").toFile
    val p = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true).redirectOutput(logFile).start()
    try {
      val readyDeadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
      while (!Files.exists(ready) && p.isAlive && System.nanoTime() < readyDeadline)
        Thread.sleep(250)
      assert(Files.exists(ready),
        s"follower never became ready; log tail:\n${tail(logFile)}")

      // mixed ops incl. media while the follower is live: creates on
      // both sides of the subset boundary, full-property updates that
      // KEEP area membership (subset semantics are membership-stable),
      // deletes straddling the boundary
      gs.txn().createVertices("doc", frameOf(100L until 160L, 0)).commit()
      gs.txn().updateVertices("doc", frameOf(100L until 120L, 1)).commit()
      gs.txn().deleteVertices("doc", (150L until 160L).toDF("id")).commit()
      gs.txn().createVertices("doc", frameOf(200L until 220L, 0)).commit()

      Files.write(stop, Array.emptyByteArray)
      assert(p.waitFor(240, TimeUnit.SECONDS),
        s"follower did not exit; log tail:\n${tail(logFile)}")
      assert(p.exitValue() == 0,
        s"follower exited ${p.exitValue()}; log tail:\n${tail(logFile)}")
      assert(Files.exists(done), "follower must write its done marker")
    } finally if (p.isAlive) p.destroyForcibly()

    // ---- parity, from the files the dead follower left behind ----
    // store rows: the two-process follower must equal a fresh in-spec
    // single-process subset sync of the same master
    val slaveStore = new VersionedStore(spark, slaveDir.toString)
    val refDir = tmp("twoproc-ref")
    val refStore = new VersionedStore(spark, refDir.toString)
    new Replicator(gs.store, refStore, Seq("v_doc"),
      Map("v_doc" -> expr(subsetSql))).sync()
    def rows(s: VersionedStore) = s.read("v_doc")
      .select("id", "rev", "text", "lon").as[(Long, Long, String, Double)]
      .collect().toSet
    val slaveRows = rows(slaveStore)
    assert(slaveRows == rows(refStore),
      "two-process follower must converge to single-process sync parity")
    assert(slaveRows.nonEmpty && slaveRows.forall(r => r._4 >= -120.0 && r._4 <= -118.0),
      "every replicated row must satisfy the spatial subset")
    assert(slaveRows.exists(_._1 == 100L) && !slaveRows.exists(_._1 == 101L),
      "subset boundary must actually split the id space")
    // the follower's pointer tracks the master even for filtered commits
    assert(slaveStore.currentEpoch == gs.store.currentEpoch)

    // maintained-index parity: the follower-built signature index files
    // equal a from-scratch recompute over the slave's live docs
    val gsSlave = new GraphStore(spark, ReplicaFollowerMain.harnessSchema,
      slaveDir.toString)
    val slaveDocs = gsSlave.graph().vertices("doc")
    val sigSpec = new SignatureIndex(gsSlave, "doc", "text", idxDir.toString)
    val sigGot = sigSpec.nearDups().select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    val sigWant = Dedup.minhashNearDups(slaveDocs, "id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sigGot == sigWant,
      "follower signature index must equal from-scratch recompute over the subset")
    assert(sigWant.nonEmpty, "fixture must plant twin texts inside the subset")

    // dHash parity: an in-subset image twin committed mid-run is found;
    // its out-of-subset twin is not on the follower
    val dhSpec = new MaintainedDhashIndex(gsSlave, "doc", "img", idxDir.toString)
    // ids 100 and 612 share imgId class iff (100+0) ≡ raster class; use
    // a twin planted directly: img of id 200 (gen 0) = class of 200
    val q = Multimodal.synthPatternImageBytes(200L)
    val got = dhSpec.nearDups(q, 0).select("id").as[Long].collect().toSet
    assert(got.contains(200L), s"mid-run in-subset media row must be indexed: $got")
    val live = slaveDocs.select("id").as[Long].collect().toSet
    assert(got.subsetOf(live), "follower media index must only surface subset docs")
    val qh = Multimodal.dHash64(q)
    got.foreach { id =>
      val gen = if (id >= 100L && id < 120L) 1 else 0
      assert(java.lang.Long.bitCount(Multimodal.dHash64(
        Multimodal.synthPatternImageBytes(id + 7L * gen)) ^ qh) == 0)
    }
  }

  test("disaster recovery end-to-end: incremental backup chain -> follower " +
      "hard-killed mid-stream and its storage lost -> point-in-time restore " +
      "from the chain -> a NEW follower process tails the live log from the " +
      "restored pointer -> full parity (restore-then-replay as one flow)") {
    val masterDir = tmp("dr-m")
    val slaveDir = tmp("dr-s")
    val idxDir = tmp("dr-idx")
    val broot = tmp("dr-backup").toString
    val all = "lon >= -200.0" // DR replicates everything; subset is the other test's concern
    val gs = new GraphStore(spark, ReplicaFollowerMain.harnessSchema,
      masterDir.toString)
    def backup(): Long = graft.model.Backup.incremental(gs.store, Seq("v_doc"), broot)

    gs.txn().createVertices("doc", frameOf(0L until 40L, 0)).commit() // epoch 1
    assert(backup() == 1L)

    // fork follower #1 and let it tail live commits
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val cp = System.getProperty("java.class.path")
    def fork(slave: Path, idx: Path, ready: Path, stop: Path, done: Path) =
      new ProcessBuilder((Seq(javaBin, "-Xmx3g") ++ ReplicaFollowerMain.jvmOpens ++
        Seq("-cp", cp, "graft.tools.ReplicaFollowerMain",
          masterDir.toString, slave.toString, idx.toString, all,
          ready.toString, stop.toString, done.toString)): _*)
        .redirectErrorStream(true)
        .redirectOutput(masterDir.resolve(s"${ready.getFileName}.log").toFile).start()
    val ready1 = masterDir.resolve("_READY1")
    val p1 = fork(slaveDir, idxDir, ready1,
      masterDir.resolve("_STOP1"), masterDir.resolve("_DONE1"))
    var pit = 0L // the point-in-time restore target, set mid-run
    try {
      val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
      while (!Files.exists(ready1) && p1.isAlive && System.nanoTime() < deadline)
        Thread.sleep(250)
      assert(Files.exists(ready1), "follower #1 never became ready; log tail:\n" +
        tail(masterDir.resolve("_READY1.log").toFile))
      gs.txn().createVertices("doc", frameOf(100L until 140L, 0)).commit() // epoch 2
      pit = gs.store.currentEpoch
      gs.txn().updateVertices("doc", frameOf(100L until 110L, 1)).commit() // epoch 3
      gs.txn().deleteVertices("doc", (130L until 140L).toDF("id")).commit() // epoch 4
      // cron'd backup AFTER pit: pit falls MID-increment (inc_1_4), so
      // the restore must filter rows above it inside one increment
      assert(backup() == 4L)
      // DISASTER: hard-kill the follower mid-stream, then lose its disk
      p1.destroyForcibly()
      assert(p1.waitFor(60, TimeUnit.SECONDS), "killed follower must exit")
    } finally if (p1.isAlive) p1.destroyForcibly()
    graft.model.Dirs.rmTree(slaveDir)
    graft.model.Dirs.rmTree(idxDir)

    // the master keeps committing while the replica is gone
    gs.txn().createVertices("doc", frameOf(200L until 230L, 0)).commit() // epoch 5
    assert(backup() == 5L)

    // RESTORE from the chain to the point in time (mid-chain epoch):
    // exactly the rows committed through pit, pointer standing at pit
    val restoredDir = tmp("dr-restored")
    val restored = graft.model.Backup.restoreChain(spark, broot,
      restoredDir.toString, upTo = pit)
    assert(restored.currentEpoch == pit, "restore must stand at the PIT epoch")
    def keyRows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "rev", "text").as[(Long, Long, String)].collect().toSet
    assert(keyRows(restored.read("v_doc")) ==
      keyRows(gs.store.read("v_doc", asOf = Some(pit))),
      "restored store must equal the master's as-of-PIT snapshot")
    assert(restored.read("v_doc").count() == 80L) // 40 seed + 40 created, pre-update/delete

    // TAIL: a NEW follower process adopts the restored store and
    // catches up to the live master through the commit log — the
    // reference's restore-then-replay, across a process boundary
    val ready2 = masterDir.resolve("_READY2")
    val stop2 = masterDir.resolve("_STOP2")
    val done2 = masterDir.resolve("_DONE2")
    val idxDir2 = tmp("dr-idx2")
    val p2 = fork(restoredDir, idxDir2, ready2, stop2, done2)
    try {
      val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
      while (!Files.exists(ready2) && p2.isAlive && System.nanoTime() < deadline)
        Thread.sleep(250)
      assert(Files.exists(ready2), "follower #2 never became ready; log tail:\n" +
        tail(masterDir.resolve("_READY2.log").toFile))
      // live commits land on the recovered follower too
      gs.txn().createVertices("doc", frameOf(300L until 310L, 0)).commit() // epoch 6
      Files.write(stop2, Array.emptyByteArray)
      assert(p2.waitFor(240, TimeUnit.SECONDS), "follower #2 did not exit; log tail:\n" +
        tail(masterDir.resolve("_READY2.log").toFile))
      assert(p2.exitValue() == 0, s"follower #2 exited ${p2.exitValue()}; log tail:\n" +
        tail(masterDir.resolve("_READY2.log").toFile))
      assert(Files.exists(done2))
    } finally if (p2.isAlive) p2.destroyForcibly()

    // PARITY, from the files the exited follower left behind: cursor,
    // live rows, full history, and the as-of-PIT snapshot all converge
    val recovered = new VersionedStore(spark, restoredDir.toString)
    assert(recovered.currentEpoch == gs.store.currentEpoch,
      "recovered follower must reach cursor parity with the live master")
    assert(keyRows(recovered.read("v_doc")) == keyRows(gs.store.read("v_doc")),
      "live-row parity after catch-up")
    assert(keyRows(recovered.read("v_doc", asOf = Some(pit))) ==
      keyRows(gs.store.read("v_doc", asOf = Some(pit))),
      "the recovered store must preserve point-in-time reads below the PIT")
    assert(recovered.history("v_doc").count() == gs.store.history("v_doc").count(),
      "full version-history parity (every epoch's rows, incl. tombstones)")
    // the catch-up really happened through the log, not a re-restore:
    // the update (epoch 3) and delete (epoch 4) are visible
    val live = recovered.read("v_doc").select("id").as[Long].collect().toSet
    assert((130L until 140L).forall(id => !live.contains(id)), "deletes replayed")
    assert(live.contains(300L), "post-recovery live commit replayed")
  }

  private def tail(f: java.io.File): String =
    if (!f.exists()) "(no log)"
    else {
      val lines = scala.io.Source.fromFile(f)
      try lines.getLines().toSeq.takeRight(30).mkString("\n") finally lines.close()
    }
}
