package graft.tools

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.model.{GraphSchema, GraphStore, Replicator, VersionedStore}
import graft.operators.{MaintainedDhashIndex, MaintainedIndexes, SignatureIndex}

/** The SLAVE side of the two-process replication harness — the
  * rebuild's analog of the reference's scripted master/slave run
  * (tests/replication/run-replication-test.sh + master.lisp +
  * slave.lisp; slave apply protocol transaction-streaming.lisp:141-170;
  * spatial subset filters spatial-query.lisp:161-172).
  *
  * Runs as its OWN JVM with its own SparkSession (the spec forks it,
  * TwoProcessReplicationSpec): tails the master store's commit log
  * across the process boundary, installs each commit's subset rows
  * into a local slave store (Replicator), and replays the same rows
  * through the maintained-index appliers — the reference's slaves
  * re-apply the FULL transaction including index maintenance
  * (transactions.lisp:884-1003), so a doc committed on the master is a
  * dedup/near-dup candidate on the follower without any rebuild.
  *
  * File-based control protocol (the run-replication-test.sh analog):
  * the follower touches `readyFile` once tailing, the master-side
  * spec touches `stopFile` after its last commit, and the follower
  * exits 0 writing `doneFile` only after store AND index cursors have
  * caught up to the master's final epoch.
  *
  * args: masterStoreDir slaveStoreDir indexDir subsetSql readyFile
  *       stopFile doneFile
  */
object ReplicaFollowerMain {

  /** The --add-opens set a forked follower JVM needs on JDK 17+
    * (mirrors build.sbt's jdk17AddOpens — kept here so the forking
    * spec and any ops script share one canonical list).
    */
  val jvmOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io", "java.base/java.net",
    "java.base/java.nio", "java.base/java.util",
    "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
    .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** The harness schema — one doc label with text + segment + point
    * coordinates + an image payload, so the run covers media-bearing
    * mixed ops. Must match the master side (TwoProcessReplicationSpec).
    */
  def harnessSchema: GraphSchema = GraphSchema.builder()
    .vertex("doc", "id", Seq("text", "seg", "lon", "lat", "img")).build()

  def main(args: Array[String]): Unit = {
    val Array(masterDir, slaveDir, idxDir, subsetSql, readyFile, stopFile, doneFile) =
      args: @unchecked
    val spark = graft.GraftSession.get(4)
    try {
      val gsSlave = new GraphStore(spark, harnessSchema, slaveDir)
      val master = new VersionedStore(spark, masterDir)
      val pred = expr(subsetSql)
      val repl = new Replicator(master, gsSlave.store, Seq("v_doc"),
        Map("v_doc" -> pred))
      repl.sync() // the master's seed commit lands before the bases build

      val sig = new SignatureIndex(gsSlave, "doc", "text", idxDir)
      sig.rebuild()
      val dhash = new MaintainedDhashIndex(gsSlave, "doc", "img", idxDir)
      dhash.rebuild()
      // the commit-log stream ACROSS the process boundary: each master
      // commit's subset rows replay through the same applyCommit path
      // the master-side hook uses (same filter as the store rows, so
      // follower indexes and follower store stay mutually consistent)
      val stream = MaintainedIndexes.followCommitLog(spark, masterDir, "v_doc",
        appliers = Seq(
          (e, rows) => sig.applyCommit(e, rows.filter(pred)),
          (e, rows) => dhash.applyCommit(e, rows.filter(pred))),
        checkpointDir = s"$idxDir/follower-ckpt")

      Files.write(Paths.get(readyFile), "ready".getBytes(UTF_8))
      def appliedThrough(sub: String): Long = {
        val f = Paths.get(idxDir, sub, "doc", "_APPLIED_THROUGH")
        if (!Files.exists(f)) 0L
        else try new String(Files.readAllBytes(f), UTF_8).trim.toLong
        catch { case _: NumberFormatException => 0L }
      }
      val deadline = System.nanoTime() + 300L * 1000 * 1000 * 1000
      var caughtUp = false
      while (!caughtUp && System.nanoTime() < deadline) {
        repl.sync()
        if (Files.exists(Paths.get(stopFile))) {
          // the stop marker is written AFTER the master's final commit,
          // so its epoch read here is the convergence target
          val target = master.currentEpoch
          repl.sync()
          caughtUp = gsSlave.store.currentEpoch >= target &&
            appliedThrough("sigindex") >= target &&
            appliedThrough("dhashindex") >= target
        }
        if (!caughtUp) Thread.sleep(150)
      }
      stream.stop()
      require(caughtUp, "follower did not converge before its deadline")
      Files.write(Paths.get(doneFile),
        s"epoch=${gsSlave.store.currentEpoch}".getBytes(UTF_8))
    } finally spark.stop()
  }
}
