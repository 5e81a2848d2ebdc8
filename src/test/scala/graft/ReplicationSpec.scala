package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.model.{GraphSchema, GraphStore, Replicator, VersionedStore}

/** End-to-end replication: a slave store tails the master's commit log
  * and converges — the reference's two-process replication test
  * (tests/replication/run-replication-test.sh;
  * transaction-streaming.lisp:141-170) reduced to two stores in one
  * JVM, including the spatial subset filter
  * (spatial-query.lisp:161-172).
  */
class ReplicationSpec extends SparkSpec {
  import spark.implicits._

  private val schema = GraphSchema.builder()
    .vertex("site", "id", Seq("name", "lat", "lon"))
    .edge("links", "site", "site")
    .build()

  private def tmp(prefix: String) =
    Files.createTempDirectory(Paths.get("target"), prefix).toString

  private def snapshot(gs: GraphStore) = {
    val g = gs.graph()
    (g.vertexFrame("site").select("id", "name", "lat", "lon")
      .as[(Long, String, Double, Double)].collect().toSet,
      if (g.edgeLabels.contains("links"))
        g.edgeFrame("links").select("src", "dst").as[(Long, Long)].collect().toSet
      else Set.empty[(Long, Long)])
  }

  test("slave converges to master across create/update/delete batches") {
    val master = new GraphStore(spark, schema, tmp("repl-m"))
    val slaveDir = tmp("repl-s")
    val slaveStore = new VersionedStore(spark, slaveDir)
    val repl = Replicator.forGraph(master, slaveStore)

    master.txn().createVertices("site",
      Seq((1L, "a", 1.0, 1.0), (2L, "b", 2.0, 2.0), (3L, "c", 60.0, 3.0))
        .toDF("id", "name", "lat", "lon"))
      .createEdges("links", Seq((1L, 2L, 1.0), (2L, 3L, 1.0)).toDF("src", "dst", "weight"))
      .commit()
    master.txn().updateVertices("site",
      Seq((2L, "b2", 2.5, 2.5)).toDF("id", "name", "lat", "lon")).commit()
    master.txn().deleteVertices("site", Seq(Tuple1(1L)).toDF("id")).commit()

    // three unseen epochs applied in one pull
    assert(repl.sync() == master.store.currentEpoch)
    val slaveGs = new GraphStore(spark, schema, slaveDir)
    assert(snapshot(slaveGs) == snapshot(master))
    assert(slaveStore.currentEpoch == master.store.currentEpoch)

    // idempotent: nothing new → no-op, state unchanged
    repl.sync()
    assert(snapshot(slaveGs) == snapshot(master))

    // incremental: another batch, another pull, still converged —
    // including recreate-after-delete and asOf alignment
    val e = master.txn().createVertices("site",
      Seq((1L, "a2", 1.1, 1.1)).toDF("id", "name", "lat", "lon")).commit()
    repl.sync()
    assert(snapshot(slaveGs) == snapshot(master))
    assert(slaveGs.graph(asOf = Some(e - 1)).vertexFrame("site").count() ==
      master.graph(asOf = Some(e - 1)).vertexFrame("site").count())
  }

  test("zero-lag followCommits applies inside the master's commit") {
    val master = new GraphStore(spark, schema, tmp("replf-m"))
    val slaveDir = tmp("replf-s")
    val slaveStore = new VersionedStore(spark, slaveDir)
    Replicator.forGraph(master, slaveStore).followCommits(master)

    master.txn().createVertices("site",
      Seq((1L, "a", 1.0, 1.0)).toDF("id", "name", "lat", "lon")).commit()
    val slaveGs = new GraphStore(spark, schema, slaveDir)
    assert(snapshot(slaveGs) == snapshot(master))
    master.txn().updateVertices("site",
      Seq((1L, "a2", 1.0, 1.0)).toDF("id", "name", "lat", "lon")).commit()
    assert(snapshot(slaveGs) == snapshot(master))
  }

  test("spatial subset filter keeps only in-area rows on the slave") {
    val master = new GraphStore(spark, schema, tmp("repls-m"))
    val slaveDir = tmp("repls-s")
    val slaveStore = new VersionedStore(spark, slaveDir)
    // replicate only sites inside lat [0, 50] — the spatial subset
    val repl = Replicator.forGraph(master, slaveStore,
      subset = Map("site" -> col("lat").between(0.0, 50.0)))

    master.txn().createVertices("site",
      Seq((1L, "in1", 10.0, 1.0), (2L, "out", 60.0, 2.0), (3L, "in2", 20.0, 3.0))
        .toDF("id", "name", "lat", "lon")).commit()
    master.txn().updateVertices("site",
      Seq((3L, "in2b", 21.0, 3.0)).toDF("id", "name", "lat", "lon")).commit()
    repl.sync()

    val slaveGs = new GraphStore(spark, schema, slaveDir)
    val ids = slaveGs.graph().vertexFrame("site").select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L))
    assert(slaveGs.graph().vertexFrame("site").filter($"id" === 3L)
      .select("name").as[String].head() == "in2b")
    // pointer still tracks the master even when rows were filtered out
    assert(slaveStore.currentEpoch == master.store.currentEpoch)
  }

  test("a batch fully removed by the subset filter must not poison the slave table") {
    val master = new GraphStore(spark, schema, tmp("replz-m"))
    val slaveDir = tmp("replz-s")
    val slaveStore = new VersionedStore(spark, slaveDir)
    val repl = Replicator.forGraph(master, slaveStore,
      subset = Map("site" -> col("lat").between(0.0, 50.0)))
    // first commit: ONLY out-of-area rows — the filtered frame is empty
    master.txn().createVertices("site",
      Seq((1L, "out1", 60.0, 1.0), (2L, "out2", 70.0, 2.0))
        .toDF("id", "name", "lat", "lon")).commit()
    repl.sync()
    // the slave table dir was not created with zero files: reads work
    val slaveGs = new GraphStore(spark, schema, slaveDir)
    assert(slaveGs.graph().vertexLabels.isEmpty ||
      slaveGs.graph().vertexFrame("site").count() == 0)
    assert(slaveStore.currentEpoch == master.store.currentEpoch)
    // later in-area rows still arrive
    master.txn().createVertices("site",
      Seq((3L, "in", 10.0, 3.0)).toDF("id", "name", "lat", "lon")).commit()
    repl.sync()
    assert(new GraphStore(spark, schema, slaveDir).graph()
      .vertexFrame("site").select("id").as[Long].collect().toSeq == Seq(3L))
  }

  test("a failing commit hook leaves the commit durable and other hooks run") {
    val master = new GraphStore(spark, schema, tmp("replh-m"))
    val slaveStore = new VersionedStore(spark, tmp("replh-s"))
    var secondHookRan = false
    master.onCommit { (_, _) => throw new RuntimeException("boom") }
    Replicator.forGraph(master, slaveStore).followCommits(master)
    master.onCommit { (_, _) => secondHookRan = true }
    val e = intercept[master.CommitHookException] {
      master.txn().createVertices("site",
        Seq((1L, "a", 1.0, 1.0)).toDF("id", "name", "lat", "lon")).commit()
    }
    assert(e.epoch == 1L)
    // durable despite the hook failure; later hooks still ran
    assert(master.graph().vertexFrame("site").count() == 1)
    assert(secondHookRan)
    assert(slaveStore.currentEpoch == 1L) // replication hook was not starved
    // and the natural "retry" correctly conflicts instead of duplicating
    intercept[master.store.ConflictException] {
      master.txn().createVertices("site",
        Seq((1L, "a", 1.0, 1.0)).toDF("id", "name", "lat", "lon")).commit()
    }
  }
}
