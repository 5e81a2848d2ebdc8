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

  test("replica dedup/ANN indexes stay fresh from the commit-log stream, no rebuild") {
    import graft.operators.{MaintainedAnnStore, MaintainedIndexes, MaintainedPostingIndex, SignatureIndex}
    val docSchema = GraphSchema.builder()
      .vertex("doc", "id", Seq("text", "v")).build()
    val master = new GraphStore(spark, docSchema, tmp("replix-m"))
    val slaveDir = tmp("replix-s")
    val slaveStore = new VersionedStore(spark, slaveDir)
    val repl = Replicator.forGraph(master, slaveStore)

    // seed corpus: real doc text plus a deterministic embedding per id
    val seed = spark.read.parquet(s"$sf/documents.parquet").filter($"doc_id" < 60)
      .join(spark.read.parquet(s"$sf/embeddings.parquet"),
        $"doc_id" === $"vec_id")
      .select($"doc_id".as("id"), $"text", $"embedding".as("v"))
      .localCheckpoint(true)
    master.txn().createVertices("doc", seed).commit()
    repl.sync()

    // replica-side indexes, built once from the synced state, then
    // maintained ONLY by the slave store's commit-log stream
    val slaveGs = new GraphStore(spark, docSchema, slaveDir)
    val idxDir = tmp("replix-i")
    val sig = new SignatureIndex(slaveGs, "doc", "text", idxDir)
    sig.rebuild()
    val dim = seed.select(size($"v")).head().getInt(0)
    val ann = new MaintainedAnnStore(slaveGs, "doc", "v", idxDir, dim,
      nBits = 4, nTables = 8)
    ann.rebuild()
    val post = new MaintainedPostingIndex(slaveGs, "doc", "text", idxDir)
    post.rebuild()
    val q = MaintainedIndexes.followCommitLog(spark, slaveDir, "v_doc",
      Seq(sig.applyCommit, ann.applyCommit, post.applyCommit), tmp("replix-c"))
    try {
      q.processAllAvailable() // initial replay — idempotent over the bases

      // master commits a near-dup twin of doc 1 with a known vector;
      // the slave sees it as a dedup AND ANN candidate after sync alone
      val text1 = seed.filter($"id" === 1).select("text").head().getString(0)
      val vec1 = seed.filter($"id" === 1).select("v").head()
        .getSeq[Float](0).map(_.toDouble).toSeq
      master.txn().createVertices("doc",
        Seq((9001L, text1, vec1.map(_.toFloat).toArray)).toDF("id", "text", "v")).commit()
      repl.sync()
      q.processAllAvailable()

      val pairs = sig.nearDups().select("id_a", "id_b")
        .as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 9001L)),
        "doc committed on the master must be a dedup candidate on the slave")
      val top = ann.topK(vec1, 3).select("id").as[Long].collect().toSeq
      assert(top.contains(9001L),
        "vector committed on the master must be an ANN candidate on the slave")

      // a master-committed doc with a brand-new token is SEARCHABLE on
      // the slave after sync alone
      master.txn().createVertices("doc",
        Seq((9002L, "zebraterm zebraterm alone", vec1.map(_.toFloat).toArray))
          .toDF("id", "text", "v")).commit()
      repl.sync()
      q.processAllAvailable()
      assert(post.search(Seq("zebraterm"), 5).as[(Long, Long, Long)]
        .collect().toSeq == Seq((9002L, 1L, 2L)),
        "doc committed on the master must be searchable on the slave")

      // deletes propagate the same way
      master.txn().deleteVertices("doc",
        Seq(Tuple1(9001L), Tuple1(9002L)).toDF("id")).commit()
      repl.sync()
      q.processAllAvailable()
      assert(!sig.nearDups().select("id_a", "id_b").as[(Long, Long)]
        .collect().toSet.exists(p => p._1 == 9001L || p._2 == 9001L))
      assert(!ann.topK(vec1, 3).select("id").as[Long].collect().contains(9001L))
      assert(post.search(Seq("zebraterm"), 5).collect().isEmpty,
        "deleted doc must vanish from slave search")
    } finally q.stop()
  }

  test("replica image near-dup index stays fresh from the commit-log stream") {
    import graft.operators.{MaintainedDhashIndex, MaintainedIndexes, Multimodal}
    val imgSchema = GraphSchema.builder().vertex("image", "id", Seq("bytes")).build()
    val master = new GraphStore(spark, imgSchema, tmp("replim-m"))
    val slaveDir = tmp("replim-s")
    val slaveStore = new VersionedStore(spark, slaveDir)
    val repl = Replicator.forGraph(master, slaveStore)
    val seed = (0L until 30L).map(i => (i, Multimodal.synthPatternImageBytes(i)))
      .toDF("id", "bytes")
    master.txn().createVertices("image", seed).commit()
    repl.sync()
    val slaveGs = new GraphStore(spark, imgSchema, slaveDir)
    val dh = new MaintainedDhashIndex(slaveGs, "image", "bytes", tmp("replim-i"))
    dh.rebuild()
    val q = MaintainedIndexes.followCommitLog(spark, slaveDir, "v_image",
      Seq(dh.applyCommit), tmp("replim-c"))
    try {
      q.processAllAvailable()
      val query = Multimodal.synthPatternImageBytes(261L) // raster class of id 5
      val before = dh.nearDups(query, 0).select("id").as[Long].collect().toSet
      assert(before.contains(5L))
      // an image committed on the MASTER is a near-dup candidate on the
      // slave after sync alone — no rebuild, no re-decode of the corpus
      master.txn().createVertices("image",
        Seq((9001L, Multimodal.synthPatternImageBytes(517L))).toDF("id", "bytes"))
        .commit() // 517 ≡ 5 (mod 256): same raster class
      repl.sync(); q.processAllAvailable()
      assert(dh.nearDups(query, 0).select("id").as[Long].collect().toSet
        === before + 9001L,
        "master-committed image must be a slave near-dup candidate")
      // deletes propagate the same way
      master.txn().deleteVertices("image", Seq(Tuple1(9001L)).toDF("id")).commit()
      repl.sync(); q.processAllAvailable()
      assert(dh.nearDups(query, 0).select("id").as[Long].collect().toSet === before)
    } finally q.stop()
  }

  test("replica audio near-dup index stays fresh from the commit-log stream") {
    import graft.operators.{MaintainedAudioIndex, MaintainedIndexes, Multimodal}
    val clipSchema = GraphSchema.builder().vertex("clip", "id", Seq("bytes")).build()
    val master = new GraphStore(spark, clipSchema, tmp("repla-m"))
    val slaveDir = tmp("repla-s")
    val slaveStore = new VersionedStore(spark, slaveDir)
    val repl = Replicator.forGraph(master, slaveStore)
    val seed = (0L until 30L).map(i => (i, Multimodal.synthPatternWavBytes(i)))
      .toDF("id", "bytes")
    master.txn().createVertices("clip", seed).commit()
    repl.sync()
    val slaveGs = new GraphStore(spark, clipSchema, slaveDir)
    val ah = new MaintainedAudioIndex(slaveGs, "clip", "bytes", tmp("repla-i"))
    ah.rebuild()
    val q = MaintainedIndexes.followCommitLog(spark, slaveDir, "v_clip",
      Seq(ah.applyCommit), tmp("repla-c"))
    try {
      q.processAllAvailable()
      val query = Multimodal.synthPatternWavBytes(8197L) // waveform class of id 5
      val before = ah.nearDups(query, 0).select("id").as[Long].collect().toSet
      assert(before.contains(5L))
      // a recording committed on the MASTER is a near-dup candidate on
      // the slave after sync alone — no rebuild, no corpus re-decode
      master.txn().createVertices("clip",
        Seq((9001L, Multimodal.synthPatternWavBytes(8197L))).toDF("id", "bytes"))
        .commit()
      repl.sync(); q.processAllAvailable()
      assert(ah.nearDups(query, 0).select("id").as[Long].collect().toSet
        === before + 9001L,
        "master-committed recording must be a slave near-dup candidate")
      master.txn().deleteVertices("clip", Seq(Tuple1(9001L)).toDF("id")).commit()
      repl.sync(); q.processAllAvailable()
      assert(ah.nearDups(query, 0).select("id").as[Long].collect().toSet === before)
    } finally q.stop()
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
