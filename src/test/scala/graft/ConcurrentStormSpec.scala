package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.spark.sql.functions._

import graft.model.{GraphSchema, GraphStore}
import graft.operators.{Dedup, MaintainedPostingIndex, SignatureIndex}
import graft.views.{ViewCatalog, ViewDef}

/** Multithreaded storm coverage for the write path — the rebuild's
  * analog of the reference's dedicated concurrent-stress family
  * (tests/concurrent-stress/{graph,mixed,transaction,view}-storm.lisp
  * and the tests/concurrency suites). The single-threaded specs pin the
  * CONTRACTS (OCC validation, binder lock, maintenance monitor); this
  * suite hammers them from N real threads at once:
  *
  *   - transaction storm: contended single-row read-modify-writes with
  *     retry-on-conflict never lose an update (first-committer-wins
  *     OCC over the Txn's creation-time snapshot — a racing commit
  *     makes the loser CONFLICT, not silently absorb a stale value);
  *   - graph/mixed storm: concurrent writers over a store with views +
  *     signature (LSH) + posting indexes bound, while reader threads
  *     probe mid-commit and a compactor thread calls rebuild()/
  *     regenerate() concurrently — at quiescence every maintained
  *     surface must equal a from-scratch recompute of the final graph
  *     (no lost deltas, no double-applied epochs).
  *
  * Thread discipline: worker failures are collected, never swallowed —
  * a storm that errors in a worker fails the test with that error.
  */
class ConcurrentStormSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(Paths.get("target"), prefix).toString

  /** Run `body` in `n` named threads, join all, rethrow the first
    * worker failure (if any) so assertion messages surface verbatim.
    */
  private def inThreads(n: Int)(body: Int => Unit): Unit = {
    val errors = new ConcurrentLinkedQueue[Throwable]
    val ts = (0 until n).map { i =>
      new Thread(() => {
        try body(i)
        catch { case t: Throwable => errors.add(t) }
      }, s"storm-$i")
    }
    ts.foreach(_.start())
    ts.foreach(_.join())
    if (!errors.isEmpty) throw errors.peek()
  }

  test("transaction storm: contended increments retry on conflict and never lose an update") {
    val dir = tmp("storm-occ")
    val schema = GraphSchema.builder().vertex("acct", "id", Seq("n")).build()
    val gs = new GraphStore(spark, schema, dir)
    gs.txn().createVertices("acct", Seq((1L, 0L)).toDF("id", "n")).commit()

    val threads = 3
    val perThread = 3
    val conflicts = new AtomicInteger

    inThreads(threads) { _ =>
      var done = 0
      var attempts = 0
      while (done < perThread) {
        attempts += 1
        assert(attempts <= 60, "retry budget exhausted — livelock or broken OCC")
        // read the value THROUGH the txn's snapshot (graphView), so the
        // staged revision and the read value come from the same epoch:
        // this is the read-modify-write OCC protects
        val txn = gs.txn()
        val cur = txn.graphView().vertices("acct")
          .filter(col("id") === 1).select("n").head().getLong(0)
        try {
          txn.updateVertices("acct", Seq((1L, cur + 1)).toDF("id", "n")).commit()
          done += 1
        } catch {
          case _: gs.store.ConflictException => conflicts.incrementAndGet()
        }
      }
    }

    val total = threads * perThread
    val fin = gs.graph().vertices("acct").filter(col("id") === 1)
      .select("n").head().getLong(0)
    assert(fin == total.toLong,
      s"every increment must land exactly once: got $fin, want $total " +
        s"(${conflicts.get()} conflicts retried)")
    // one version row per successful commit, rev strictly sequential:
    // no commit was double-applied, none vanished
    val revs = gs.store.history("v_acct").select("rev")
      .as[Long].collect().sorted.toSeq
    assert(revs == (1L to (total + 1)).toSeq,
      s"version chain must be gapless: $revs")
  }

  test("graph storm: concurrent disjoint-range writers with views + LSH + posting bound, " +
      "readers probing and a compactor rebuilding mid-storm") {
    val dir = tmp("storm-idx")
    val schema = GraphSchema.builder()
      .vertex("doc", "id", Seq("text", "seg")).build()
    val gs = new GraphStore(spark, schema, dir)
    val seedDocs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 60)
      .select(col("doc_id").as("id"), col("text"),
        (col("doc_id") % 4).cast("string").as("seg"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    gs.txn().createVertices("doc", seedDocs.toDF("id", "text", "seg")).commit()

    val sig = new SignatureIndex(gs, "doc", "text", dir)
    sig.rebuild(); sig.bind()
    val post = new MaintainedPostingIndex(gs, "doc", "text", dir)
    post.rebuild(); post.bind()
    val cat = new ViewCatalog(spark, gs, dir)
    cat.register(ViewDef("by_seg", "doc",
      df => df.select(col("seg").as("key"), col("id"),
        length(col("text")).cast("double").as("value")),
      reduceAgg = Some(sum(col("value")))))
    cat.regenerate("by_seg"); cat.bindTo(gs)

    val writersDone = new AtomicBoolean(false)
    val probes = new AtomicInteger
    val readerErrors = new ConcurrentLinkedQueue[Throwable]
    val readers = (0 until 2).map { i =>
      new Thread(() => {
        try {
          while (!writersDone.get()) {
            // probe every maintained surface mid-commit/mid-compaction;
            // results vary with the in-flight state, but the reads must
            // never throw and never see a torn store
            sig.nearDups().count()
            post.search(Seq("the"), 5).count()
            cat.reducedView("by_seg").count()
            probes.incrementAndGet()
          }
        } catch { case t: Throwable => readerErrors.add(t) }
      }, s"storm-reader-$i")
    }
    readers.foreach(_.start())

    val compactor = new Thread(() => {
      while (!writersDone.get()) {
        sig.rebuild()
        cat.regenerate("by_seg")
        Thread.sleep(50)
      }
    }, "storm-compactor")
    compactor.start()

    // 3 writers × 3 commits on DISJOINT id ranges: creates, an update
    // that rewrites a doc with a twin text (moves its signature), and
    // a delete — the full supersession surface, concurrently
    val twin = seedDocs.head._2
    inThreads(3) { w =>
      val base = 1000L + w * 100
      gs.txn().createVertices("doc",
        (0 until 4).map(j => (base + j, s"storm writer $w row $j " + twin,
          (w % 4).toString)).toDF("id", "text", "seg")).commit()
      gs.txn().updateVertices("doc",
        Seq((base, twin, (w % 4).toString)).toDF("id", "text", "seg")).commit()
      gs.txn().deleteVertices("doc", Seq(base + 3).toDF("id")).commit()
    }
    writersDone.set(true)
    readers.foreach(_.join())
    compactor.join()
    if (!readerErrors.isEmpty) throw readerErrors.peek()
    assert(probes.get() > 0, "readers must have completed probes mid-storm")

    // quiescent parity: every maintained surface == from-scratch over
    // the FINAL graph (nothing lost, nothing double-applied)
    val docs = gs.graph().vertices("doc")
    val sigGot = sig.nearDups().select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sigWant = Dedup.minhashNearDups(docs, "id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sigGot == sigWant, "signature index must equal from-scratch recompute")
    // each writer's updated doc carries the twin text verbatim — its
    // pair with the seed doc must have survived compaction racing hooks
    assert(sigWant.exists(p => p._1 == seedDocs.head._1 && p._2 >= 1000L),
      "fixture must actually plant cross-thread twins")

    val postGot = post.search(Seq("storm", "writer"), 50)
      .select("id").as[Long].collect().toSet
    val postWant = docs.select(col("id"),
        explode(split(lower(col("text")), "\\s+")).as("term"))
      .filter(col("term").isin("storm", "writer"))
      .select("id").distinct().as[Long].collect().toSet
    assert(postGot == postWant, "posting index must equal from-scratch recompute")
    assert(!postGot.exists(id => id == 1003L || id == 1103L || id == 1203L),
      "deleted docs must not be searchable after the storm")

    val viewGot = cat.reducedView("by_seg").select("key", "value", "n")
      .as[(String, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val viewWant = docs.groupBy("seg")
      .agg(sum(length(col("text")).cast("double")).as("v"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(viewGot == viewWant, "bound view must equal from-scratch recompute")

    // a final compaction folds all storm deltas and changes nothing
    sig.rebuild(); cat.regenerate("by_seg")
    assert(sig.nearDups().select("id_a", "id_b").as[(Long, Long)].collect().toSet
      == sigWant, "post-storm compaction must be a no-op on results")
  }

  test("current-index storm: lock-free latest-state reads race commits and " +
      "repeated index compactions") {
    val dir = tmp("storm-cur")
    val schema = GraphSchema.builder().vertex("acct", "id", Seq("n")).build()
    val gs = new GraphStore(spark, schema, dir)
    gs.txn().createVertices("acct",
      (0L until 20L).map(i => (i, i)).toDF("id", "n")).commit()
    gs.store.compactCurrent("v_acct") // opt the table into the index

    val writersDone = new AtomicBoolean(false)
    val probes = new AtomicInteger
    val readerErrors = new ConcurrentLinkedQueue[Throwable]
    val readers = (0 until 2).map { i =>
      new Thread(() => {
        try {
          while (!writersDone.get()) {
            // index-served latest-state read racing commits AND base
            // republications — must never throw, never see a torn base
            val n = gs.graph().vertices("acct").count()
            assert(n >= 19, s"read saw a torn state: $n rows")
            probes.incrementAndGet()
          }
        } catch { case t: Throwable => readerErrors.add(t) }
      }, s"storm-cur-reader-$i")
    }
    readers.foreach(_.start())
    val compactor = new Thread(() => {
      while (!writersDone.get()) {
        gs.store.compactCurrent("v_acct")
        Thread.sleep(30)
      }
    }, "storm-cur-compactor")
    compactor.start()

    inThreads(3) { w =>
      val base = 100L + w * 100
      (0 until 3).foreach { j =>
        gs.txn().createVertices("acct",
          Seq((base + j, base + j)).toDF("id", "n")).commit()
      }
      gs.txn().updateVertices("acct",
        Seq((base, -1L)).toDF("id", "n")).commit()
      gs.txn().deleteVertices("acct", Seq(base + 2).toDF("id")).commit()
    }
    writersDone.set(true)
    readers.foreach(_.join())
    compactor.join()
    if (!readerErrors.isEmpty) throw readerErrors.peek()
    assert(probes.get() > 0, "readers must have completed probes mid-storm")

    // quiescent parity: the index-served read equals the history path
    def rows(): Set[(Long, Long)] =
      gs.graph().vertices("acct").select("id", "n").as[(Long, Long)].collect().toSet
    val viaIndex = rows()
    spark.conf.set("graft.store.currentIndex", "false")
    val viaHistory = try rows() finally
      spark.conf.set("graft.store.currentIndex", "true")
    assert(viaIndex == viaHistory, "index must equal the full-history read")
    val want = ((0L until 20L).map(i => (i, i)) ++
      Seq(100L, 200L, 300L).flatMap(b => Seq((b, -1L), (b + 1, b + 1)))).toSet
    assert(viaIndex == want)
    // one more compaction after quiescence is a no-op on results
    gs.store.compactCurrent("v_acct")
    assert(rows() == want)
  }

  test("generation leases: pins survive publishes, expire by TTL, and release " +
      "reclaims space (GenDirs unit semantics)") {
    import graft.model.GenDirs
    val root = Files.createTempDirectory(Paths.get("target"), "lease-unit")
    def publish(): Unit = {
      GenDirs.publish(root) { g =>
        Files.createDirectories(g.resolve("base"))
        Files.write(g.resolve("base").resolve("f.parquet"), Array[Byte](1))
      }
      ()
    }
    publish() // gen 1
    val l = GenDirs.lease(root)
    assert(l.gen == 1L)
    publish(); publish(); publish() // gens 2..4: sweep floor moves past 1
    assert(Files.exists(l.dir.resolve("base").resolve("f.parquet")),
      "a pinned generation must survive arbitrarily many publishes")
    l.release()
    publish() // first publish after release reclaims the pinned gen
    assert(!Files.exists(root.resolve("gen@1")),
      "a released generation must be swept by the next publish")

    // TTL: a crashed reader's pin stops protecting once it goes stale
    val l2 = GenDirs.lease(root)
    sys.props("graft.gen.lease.ttl.ms") = "50"
    try {
      Thread.sleep(120)
      publish(); publish(); publish()
      assert(!Files.exists(l2.dir),
        "a stale pin must not protect its generation forever")
    } finally sys.props.remove("graft.gen.lease.ttl.ms")

    // refresh extends a legitimately long read past the TTL
    val l3 = GenDirs.lease(root)
    sys.props("graft.gen.lease.ttl.ms") = "300"
    try {
      Thread.sleep(200); l3.refresh(); Thread.sleep(200)
      publish(); publish(); publish()
      assert(Files.exists(l3.dir.resolve("base").resolve("f.parquet")),
        "a refreshed pin must keep protecting")
    } finally { sys.props.remove("graft.gen.lease.ttl.ms"); l3.release() }
  }

  test("slow-reader storm: a plan held across >=3 aggressive compaction publishes " +
      "survives under withPinnedRead (and is stranded without it)") {
    val dir = tmp("storm-lease")
    val schema = GraphSchema.builder().vertex("acct", "id", Seq("n")).build()
    val gs = new GraphStore(spark, schema, dir)
    gs.txn().createVertices("acct",
      (0L until 30L).map(i => (i, i)).toDF("id", "n")).commit()
    gs.store.compactCurrent("v_acct") // generation 1
    val bases = Paths.get(s"$dir/v_acct__cur/bases")
    def churn(rounds: Int, from: Long): Unit = (0 until rounds).foreach { j =>
      gs.txn().createVertices("acct",
        Seq((from + j, from + j)).toDF("id", "n")).commit()
      gs.store.compactCurrent("v_acct")
    }

    // CONTROL: an un-leased plan's files are gone after the grace
    // window (this is exactly the hazard the lease exists for)
    val stranded = gs.store.read("v_acct").select("id", "n")
    churn(4, from = 1000L)
    intercept[Throwable] { stranded.count() }

    // LEASED: the same slow-consumption shape is safe across >= 3
    // publishes — build the plan, churn the store, then consume
    val gen0 = graft.model.GenDirs.currentGen(bases)
    val got = gs.store.withPinnedRead("v_acct") { df =>
      val held = df.select("id", "n")
      churn(4, from = 2000L)
      assert(graft.model.GenDirs.currentGen(bases) >= gen0 + 3,
        "churn must actually publish aggressively")
      held.as[(Long, Long)].collect().toMap
    }
    // the held plan serves its build-time snapshot, intact
    assert((0L until 30L).forall(i => got.get(i).contains(i)))
    assert((0 until 4).forall(j => got.get(1000L + j).contains(1000L + j)))
    assert(!got.contains(2000L), "the pinned plan must not see post-build commits")

    // release happened at scope exit: the next publish reclaims all
    // unpinned generations — bounded garbage, no leaked pins
    churn(1, from = 3000L)
    val gens = graft.model.Dirs.childNames(bases).count(_.startsWith("gen@"))
    assert(gens <= 2, s"released generations must be swept, found $gens")

    // the same discipline through the VIEW catalog: a leased reduced
    // read survives a regenerate storm from another thread
    val cat = new ViewCatalog(spark, gs, dir)
    cat.register(ViewDef("n_by_par", "acct",
      df => df.select((col("id") % 2).cast("string").as("key"), col("id"),
        col("n").cast("double").as("value")),
      reduceAgg = Some(sum(col("value")))))
    cat.regenerate("n_by_par")
    val stop = new AtomicBoolean(false)
    val regen = new Thread(() => {
      while (!stop.get()) { cat.regenerate("n_by_par"); Thread.sleep(10) }
    }, "lease-regen-storm")
    regen.start()
    try {
      val want = gs.graph().vertices("acct")
        .select((col("id") % 2).cast("string").as("k"), col("n"))
        .groupBy("k").agg(sum(col("n").cast("double"))).as[(String, Double)]
        .collect().toMap
      (0 until 5).foreach { _ =>
        val m = cat.withPinnedRead("n_by_par") { mat =>
          val plan = mat.groupBy("key").agg(sum("value").as("v"))
          Thread.sleep(60) // let several regenerates land mid-hold
          plan.as[(String, Double)].collect().toMap
        }
        assert(m == want, "leased view read must serve a consistent snapshot")
      }
    } finally { stop.set(true); regen.join() }
  }
}
