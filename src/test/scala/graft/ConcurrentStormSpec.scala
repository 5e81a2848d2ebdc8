package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.spark.sql.functions._

import graft.model.{GraphSchema, GraphStore, Replicator, VersionedStore}
import graft.operators.{Dedup, MaintainedAnnStore, MaintainedAudioIndex,
  MaintainedCellIndex, MaintainedDhashIndex, MaintainedIvfPqStore,
  MaintainedPostingIndex, Multimodal, SignatureIndex, Similarity}
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

  test("reference-intensity mixed storm: 8 threads x 1,040 ops with EVERY " +
      "maintained tier bound, readers + compactor + replicator mid-storm, " +
      "full quiescent parity") {
    // the reference's concurrent-rw shape (tests/perf/benchmarks.lisp:139,
    // 8 threads x 4,000 mixed ops over shared mmap structures) at the
    // rebuild's batch granularity: 8 threads x 1,040 row-ops
    // (create/update/delete) in 4 commits each, every commit fanning out
    // to ALL maintained surfaces in the same call stack — text LSH
    // signatures, BM25 postings, vector LSH buckets, IVF-PQ codes with
    // metadata, image dHash bands, audio-fingerprint bands, geohash
    // cells, and a bound reduced view — while reader threads probe every
    // surface, a compactor republishes generations, and a replicator
    // tails the commit log into a second store.
    val t0 = System.nanoTime()
    val dir = tmp("storm-mega")
    val slaveDir = tmp("storm-mega-slave")
    val schema = GraphSchema.builder()
      .vertex("doc", "id", Seq("text", "seg", "lon", "lat", "img", "wav", "v", "cat"))
      .build()
    val gs = new GraphStore(spark, schema, dir)

    // deterministic content generators — gen 1 is the post-update state
    val twin = "shared twin sentence for signature pairs across threads"
    def imgIdOf(id: Long, gen: Int): Long = id + 3L * gen
    def vecOf(id: Long, gen: Int): Array[Float] = {
      // hash-mixed components, NOT a sin lattice: sin(id*c+j) puts ids
      // ~210 apart within 1e-4 radians of each other, which rounds to
      // cos_sim 1.0 and breaks exact-twin top-1 assertions
      val s = id + gen * 50000L
      Array.tabulate(8) { j =>
        val h = ((s * 2654435761L + j * 40503L) >>> 5) & 0xffffL
        (h.toDouble / 65535.0 - 0.5).toFloat
      }
    }
    def textOf(id: Long, gen: Int): String =
      s"storm doc $id gen$gen common alpha beta " +
        (if (gen > 0) "updated refreshed " else "") +
        (if (id % 7 == 0) twin else s"tail${id % 13}")
    def lonOf(id: Long, gen: Int): Double = -120.0 + ((id + gen) % 97) * 0.02
    def latOf(id: Long, gen: Int): Double = 35.0 + (((id + gen) / 97) % 50) * 0.02
    def rowOf(id: Long, gen: Int) =
      (id, textOf(id, gen), (id % 4).toString, lonOf(id, gen), latOf(id, gen),
        Multimodal.synthPatternImageBytes(imgIdOf(id, gen)),
        Multimodal.synthPatternWavBytes(imgIdOf(id, gen)),
        vecOf(id, gen), id % 5)
    def frameOf(rows: Seq[Long], gen: Int) = rows.map(rowOf(_, gen))
      .toDF("id", "text", "seg", "lon", "lat", "img", "wav", "v", "cat")

    gs.txn().createVertices("doc", frameOf(0L until 100L, 0)).commit()

    // bind EVERY maintained tier (rebuild on the seed first)
    val sig = new SignatureIndex(gs, "doc", "text", dir)
    sig.rebuild(); sig.bind()
    val post = new MaintainedPostingIndex(gs, "doc", "text", dir)
    post.rebuild(); post.bind()
    val ann = new MaintainedAnnStore(gs, "doc", "v", dir, dim = 8, nBits = 4, nTables = 4)
    ann.rebuild(); ann.bind()
    val ivfpq = new MaintainedIvfPqStore(gs, "doc", "v", dir, k = 4, m = 4,
      ksub = 8, iterations = 1, metaCols = Seq("cat"))
    ivfpq.rebuild(); ivfpq.bind()
    val dhash = new MaintainedDhashIndex(gs, "doc", "img", dir)
    dhash.rebuild(); dhash.bind()
    val audio = new MaintainedAudioIndex(gs, "doc", "wav", dir)
    audio.rebuild(); audio.bind()
    val cells = new MaintainedCellIndex(gs, "doc", "lon", "lat", dir, precision = 5)
    cells.rebuild(); cells.bind()
    val cat = new ViewCatalog(spark, gs, dir)
    cat.register(ViewDef("len_by_seg", "doc",
      df => df.select(col("seg").as("key"), col("id"),
        length(col("text")).cast("double").as("value")),
      reduceAgg = Some(sum(col("value")))))
    cat.regenerate("len_by_seg"); cat.bindTo(gs)
    val slave = new VersionedStore(spark, slaveDir)
    val repl = Replicator.forGraph(gs, slave)

    // mid-storm probe targets (ids in thread 0's never-updated range)
    val annQ: Seq[Double] = vecOf(10250L, 0).map(_.toDouble).toSeq
    val qImg = Multimodal.synthPatternImageBytes(10251L)
    val qWav = Multimodal.synthPatternWavBytes(10252L)

    val writersDone = new AtomicBoolean(false)
    val probes = new AtomicInteger
    val sideErrors = new ConcurrentLinkedQueue[Throwable]
    val readers = (0 until 2).map { i =>
      new Thread(() => {
        try {
          while (!writersDone.get()) {
            post.search(Seq("alpha"), 5).count()
            ann.topK(annQ, 5).count()
            ivfpq.topK(annQ, 5, nProbe = 4, candidates = 50).count()
            dhash.nearDups(qImg, 3).count()
            audio.nearDups(qWav, 3).count()
            cells.near(lonOf(10253L, 0), latOf(10253L, 0), 5000.0).count()
            cat.reducedView("len_by_seg").count()
            probes.incrementAndGet()
          }
        } catch { case t: Throwable => sideErrors.add(t) }
      }, s"mega-reader-$i")
    }
    val compactor = new Thread(() => {
      try {
        while (!writersDone.get()) {
          sig.rebuild()
          cat.regenerate("len_by_seg")
          gs.store.compactCurrent("v_doc")
          Thread.sleep(200)
        }
      } catch { case t: Throwable => sideErrors.add(t) }
    }, "mega-compactor")
    val follower = new Thread(() => {
      try {
        while (!writersDone.get()) { repl.sync(); Thread.sleep(150) }
      } catch { case t: Throwable => sideErrors.add(t) }
    }, "mega-replicator")
    readers.foreach(_.start()); compactor.start(); follower.start()

    // 8 writers, disjoint 1,000-id ranges, 1,040 row-ops each:
    // 800 creates + 160 full-property updates + 80 deletes
    def base(w: Int): Long = 10000L + w * 1000L
    inThreads(8) { w =>
      val b = base(w)
      gs.txn().createVertices("doc", frameOf(b until b + 400, 0)).commit()
      gs.txn().createVertices("doc", frameOf(b + 400 until b + 800, 0)).commit()
      gs.txn().updateVertices("doc", frameOf(b until b + 160, 1)).commit()
      gs.txn().deleteVertices("doc", (b + 720 until b + 800).toDF("id")).commit()
    }
    writersDone.set(true)
    readers.foreach(_.join()); compactor.join(); follower.join()
    if (!sideErrors.isEmpty) throw sideErrors.peek()
    assert(probes.get() > 0, "readers must have completed probes mid-storm")

    // ---- quiescent parity on EVERY maintained surface ----
    // final-state model: seeds gen 0; per thread ids [b, b+720) live,
    // of which [b, b+160) are gen 1; [b+720, b+800) deleted
    val liveGen: Map[Long, Int] =
      ((0L until 100L).map(_ -> 0) ++ (0 until 8).flatMap { w =>
        val b = base(w)
        (b until b + 720).map(id => id -> (if (id < b + 160) 1 else 0))
      }).toMap
    val docs = gs.graph().vertices("doc")
    assert(docs.count() == liveGen.size)

    // text LSH signatures == from-scratch recompute
    val sigGot = sig.nearDups().select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sigWant = Dedup.minhashNearDups(docs, "id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sigGot == sigWant, "signature index must equal from-scratch recompute")

    // postings: the update-planted token matches exactly the updated live ids
    val postGot = post.search(Seq("updated"), 5000).select("id").as[Long].collect().toSet
    val postWant = liveGen.collect { case (id, 1) => id }.toSet
    assert(postGot == postWant, "posting index must surface exactly the updated docs")

    // vector LSH: an unchanged vector is an exact top hit; an updated
    // vector is findable by its NEW embedding and retired on its old one;
    // a deleted vector is gone
    assert(ann.topK(annQ, 3).as[(Long, Double)].collect().head == ((10250L, 1.0)))
    val updQ: Seq[Double] = vecOf(10005L, 1).map(_.toDouble).toSeq
    assert(ann.topK(updQ, 3).as[(Long, Double)].collect().head == ((10005L, 1.0)))
    assert(!ann.topK(vecOf(10005L, 0).map(_.toDouble).toSeq, 3)
      .as[(Long, Double)].collect().contains((10005L, 1.0)),
      "stale buckets of an updated vector must retire")
    assert(!ann.topK(vecOf(10750L, 0).map(_.toDouble).toSeq, 5)
      .as[(Long, Double)].collect().exists(_._1 == 10750L),
      "deleted vectors must not be findable")

    // IVF-PQ composed probe (with metadata riding along): same contract
    assert(ivfpq.topK(annQ, 3, nProbe = 4, candidates = 100)
      .as[(Long, Double)].collect().head == ((10250L, 1.0)))
    assert(ivfpq.topK(updQ, 3, nProbe = 4, candidates = 100)
      .as[(Long, Double)].collect().head == ((10005L, 1.0)))
    val filtered = ivfpq.topKFiltered(annQ, 5, predicate = col("cat") === (10250L % 5),
      nProbe = 4, candidates = 100).as[(Long, Double)].collect()
    assert(filtered.head == ((10250L, 1.0)), s"filtered probe lost the twin: ${filtered.toSeq}")

    // image + audio banded fingerprints: exact-match probes verified
    // bidirectionally (every same-raster classmate found; every hit a
    // true live exact match by driver-side recompute)
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val dhGot = dhash.nearDups(qImg, 0).select("id").as[Long].collect().toSet
    val qImgHash = Multimodal.dHash64(qImg)
    val dhClass = liveGen.collect {
      case (id, g) if imgIdOf(id, g) % 256 == 10251L % 256 => id
    }.toSet
    assert(dhClass.subsetOf(dhGot), s"missing same-raster classmates: ${dhClass -- dhGot}")
    dhGot.foreach { id =>
      val g = liveGen.getOrElse(id, fail(s"dhash hit $id is not live"))
      assert(ham(Multimodal.dHash64(
        Multimodal.synthPatternImageBytes(imgIdOf(id, g))), qImgHash) == 0)
    }
    val auGot = audio.nearDups(qWav, 0).select("id").as[Long].collect().toSet
    val qWavHash = Multimodal.audioHash64(qWav)
    assert(auGot.contains(10252L))
    auGot.foreach { id =>
      val g = liveGen.getOrElse(id, fail(s"audio hit $id is not live"))
      assert(ham(Multimodal.audioHash64(
        Multimodal.synthPatternWavBytes(imgIdOf(id, g))), qWavHash) == 0)
    }

    // geohash cells == driver-side refine over the final coordinates
    val cGot = cells.near(lonOf(10253L, 0), latOf(10253L, 0), 5000.0)
      .select("id").as[Long].collect().toSet
    val cWant = liveGen.collect { case (id, g)
      if graft.spatial.Geohash.haversineMeters(
        lonOf(id, g), latOf(id, g), lonOf(10253L, 0), latOf(10253L, 0)) <= 5000.0 => id
    }.toSet
    assert(cGot == cWant, "cell index must equal driver-side refine")
    assert(cGot.nonEmpty)

    // bound view == from-scratch aggregate
    val viewGot = cat.reducedView("len_by_seg").select("key", "value", "n")
      .as[(String, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val viewWant = docs.groupBy("seg")
      .agg(sum(length(col("text")).cast("double")).as("v"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(viewGot == viewWant, "bound view must equal from-scratch recompute")

    // replica: a final sync converges the follower to master parity
    repl.sync()
    val masterRows = gs.store.read("v_doc").select("id", "rev")
      .as[(Long, Long)].collect().toSet
    val slaveRows = slave.read("v_doc").select("id", "rev")
      .as[(Long, Long)].collect().toSet
    assert(slaveRows == masterRows, "follower must converge to master parity")

    info(f"mega storm wall clock: ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
      s"${probes.get()} reader probe rounds")
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

  test("heartbeat leases: a withLease body that outlives the TTL keeps its pin " +
      "across >=3 publishes with no manual refresh (r10 directive #1)") {
    import graft.model.GenDirs
    val root = Files.createTempDirectory(Paths.get("target"), "lease-hb")
    def publish(): Unit = {
      GenDirs.publish(root) { g =>
        Files.createDirectories(g.resolve("base"))
        Files.write(g.resolve("base").resolve("f.parquet"), Array[Byte](1))
      }
      ()
    }
    publish() // gen 1
    // TTL far below the body's runtime: only the scope's own daemon
    // heartbeat (refresh every TTL/3) can keep the pin alive
    sys.props("graft.gen.lease.ttl.ms") = "120"
    try {
      GenDirs.withLease(root) { d =>
        (0 until 4).foreach { _ => Thread.sleep(150); publish() }
        assert(GenDirs.currentGen(root) >= 5, "publishes must actually land")
        assert(Files.exists(d.resolve("base").resolve("f.parquet")),
          "an un-refreshed body past the TTL must still hold its generation " +
            "(the heartbeat is the protection)")
      }
    } finally sys.props.remove("graft.gen.lease.ttl.ms")
    // scope exit stopped the heartbeat and released: next publish reclaims
    publish()
    assert(!Files.exists(root.resolve("gen@1")),
      "a released generation must be swept once the heartbeat stops")
  }

  test("lease-acquisition vs sweep race: pins landing mid-sweep never fail the " +
      "committing writer's publish (best-effort reclamation)") {
    import graft.model.GenDirs
    val root = Files.createTempDirectory(Paths.get("target"), "lease-race")
    GenDirs.publish(root) { g => Files.createDirectories(g.resolve("base")); () }
    val stop = new AtomicBoolean(false)
    val errors = new ConcurrentLinkedQueue[Throwable]()
    val leasers = (0 until 4).map { i =>
      new Thread(() => {
        try while (!stop.get()) {
          val l = GenDirs.lease(root)
          // a granted lease must point at a generation the sweeper
          // will now skip — its dir exists for the hold's duration
          assert(Files.isDirectory(l.dir))
          l.release()
        } catch {
          case _: InterruptedException => ()
          case t: Throwable => errors.add(t)
        }
      }, s"lease-race-$i")
    }
    leasers.foreach(_.start())
    try {
      // the publisher's sweep runs hot against the pin writers: any
      // DirectoryNotEmptyException escaping publish() fails right here.
      // The 1 ms pacing keeps acquisition winnable (lease() gives up
      // after 10 double-publish races — an API contract, not a bug)
      (0 until 300).foreach { _ =>
        GenDirs.publish(root) { g => Files.createDirectories(g.resolve("base")); () }
        Thread.sleep(1)
      }
    } finally { stop.set(true); leasers.foreach(_.join(10000)) }
    assert(errors.isEmpty, s"worker errors: ${errors.peek()}")
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

  test("maintenance storm: the unattended daemon compacts views + sig index " +
      "on thresholds while writers commit, a follower tails the same commit " +
      "log, and lease-holding readers probe — quiescent parity everywhere, " +
      "follower at cursor parity") {
    // The three background subsystems (GenDirs generation sweeps via
    // regenerate/rebuild, Replicator tailing, the Maintenance daemon)
    // interacting in ONE run: the daemon decides WHEN to compact from
    // layout stats while writers breach them, readers pin generations
    // mid-publish, and the follower replicates the same epochs the
    // hooks are maintaining. Each pair is storm-proven elsewhere; this
    // is the three-way.
    val dir = tmp("storm-maint")
    val schema = GraphSchema.builder()
      .vertex("doc", "id", Seq("text", "seg")).build()
    val gs = new GraphStore(spark, schema, dir)
    val seedDocs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 40)
      .select(col("doc_id").as("id"), col("text"),
        (col("doc_id") % 4).cast("string").as("seg"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    gs.txn().createVertices("doc", seedDocs.toDF("id", "text", "seg")).commit()
    val sig = new SignatureIndex(gs, "doc", "text", dir)
    sig.rebuild(); sig.bind()
    val cat = new ViewCatalog(spark, gs, dir)
    cat.register(ViewDef("by_seg", "doc",
      df => df.select(col("seg").as("key"), col("id"),
        length(col("text")).cast("double").as("value")),
      reduceAgg = Some(sum(col("value")))))
    cat.regenerate("by_seg"); cat.bindTo(gs)
    val viewRoot = cat.rootOf("by_seg")
    val sigRoot = Paths.get(dir, "sigindex", "doc")

    // NO manual compactor thread: compaction authority is the DAEMON,
    // firing only when the writers' deltas breach the (tiny) thresholds
    val daemon = new graft.model.Maintenance(
      graft.model.Maintenance.forViews(cat) :+
        graft.model.Maintenance.Target("sig:doc", sigRoot, () => sig.rebuild()),
      deltaEpochsHigh = 3, deltaBytesHigh = 1L << 40, periodMs = 50L)
    daemon.start()

    val writersDone = new AtomicBoolean(false)
    val sideErrors = new ConcurrentLinkedQueue[Throwable]
    // follower tails the commit log while hooks + daemon churn the store
    val slave = new VersionedStore(spark, tmp("storm-maint-slave"))
    val repl = new Replicator(gs.store, slave, Seq("v_doc"))
    val follower = new Thread(() => {
      try while (!writersDone.get()) { repl.sync(); Thread.sleep(30) }
      catch { case t: Throwable => sideErrors.add(t) }
    }, "maint-follower")
    val probes = new AtomicInteger
    val readers = (0 until 2).map { i =>
      new Thread(() => {
        try while (!writersDone.get()) {
          // every read pins a generation lease internally; the daemon
          // publishes fresh generations underneath throughout
          sig.nearDups().count()
          cat.reducedView("by_seg").count()
          probes.incrementAndGet()
        } catch { case t: Throwable => sideErrors.add(t) }
      }, s"maint-reader-$i")
    }
    // one SLOW reader: builds a plan, holds it across daemon publishes
    // (gen must advance underneath), then executes — the lease grace +
    // sweep discipline is what keeps its files alive
    val slowReaderRan = new AtomicBoolean(false)
    val slow = new Thread(() => {
      try {
        val gen0 = graft.model.GenDirs.layoutStats(viewRoot).gen
        val plan = cat.reducedView("by_seg")
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (graft.model.GenDirs.layoutStats(viewRoot).gen < gen0 + 1 &&
            !writersDone.get() && System.nanoTime() < deadline)
          Thread.sleep(100)
        assert(plan.count() >= 0L)
        slowReaderRan.set(true)
      } catch { case t: Throwable => sideErrors.add(t) }
    }, "maint-slow-reader")
    follower.start(); readers.foreach(_.start()); slow.start()

    // 3 writers × (2 creates + update + delete) on disjoint ranges,
    // paced so breaches happen MID-storm, not in one burst at the end
    val twin = seedDocs.head._2
    inThreads(3) { w =>
      val base = 2000L + w * 100
      (0 until 2).foreach { c =>
        gs.txn().createVertices("doc",
          (0 until 3).map(j => (base + c * 10 + j,
            s"maint storm writer $w commit $c row $j " + twin,
            (w % 4).toString)).toDF("id", "text", "seg")).commit()
        Thread.sleep(100)
      }
      gs.txn().updateVertices("doc",
        Seq((base, twin, (w % 4).toString)).toDF("id", "text", "seg")).commit()
      gs.txn().deleteVertices("doc", Seq(base + 1).toDF("id")).commit()
    }
    // let the daemon see the final deltas before quiescing it
    val drainDeadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while ((graft.model.GenDirs.layoutStats(viewRoot).deltaEpochs >= 3 ||
        graft.model.GenDirs.layoutStats(sigRoot).deltaEpochs >= 3) &&
        System.nanoTime() < drainDeadline)
      Thread.sleep(100)
    writersDone.set(true)
    follower.join(); readers.foreach(_.join()); slow.join()
    daemon.stop()
    if (!sideErrors.isEmpty) throw sideErrors.peek()
    assert(probes.get() > 0, "readers must have completed probes mid-storm")
    assert(slowReaderRan.get(), "the slow lease-holding reader must have executed")

    // the daemon actually ran and swallowed nothing: both targets
    // compacted at least once, zero errors across every pass
    val comps = daemon.lastCompactions()
    assert(comps.contains("view:by_seg") && comps.contains("sig:doc"),
      s"daemon must have compacted both targets mid-storm: $comps")
    assert(daemon.recentErrors().isEmpty,
      s"daemon swallowed failures under the storm: ${daemon.recentErrors()}")
    assert(graft.model.GenDirs.layoutStats(viewRoot).deltaEpochs < 3 &&
      graft.model.GenDirs.layoutStats(sigRoot).deltaEpochs < 3,
      "steady state must be below the daemon's thresholds")

    // quiescent parity on every maintained surface vs from-scratch
    val docs = gs.graph().vertices("doc")
    val sigGot = sig.nearDups().select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sigWant = Dedup.minhashNearDups(docs, "id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sigGot == sigWant,
      "signature index must equal from-scratch recompute after daemon churn")
    assert(sigWant.exists(p => p._1 == seedDocs.head._1 && p._2 >= 2000L),
      "fixture must actually plant cross-thread twins")
    val viewGot = cat.reducedView("by_seg").select("key", "value")
      .as[(String, Double)].collect().toMap
    val viewWant = docs.groupBy("seg")
      .agg(sum(length(col("text")).cast("double")).as("v"))
      .as[(String, Double)].collect().toMap
    assert(viewGot == viewWant,
      "daemon-compacted view must equal from-scratch recompute")

    // follower at cursor parity: one final tail converges rows, revs
    // and the epoch pointer with the post-storm master
    repl.sync()
    assert(slave.currentEpoch == gs.store.currentEpoch,
      "follower must reach cursor parity")
    def rows(s: VersionedStore) = s.read("v_doc")
      .select("id", "rev", "text").as[(Long, Long, String)].collect().toSet
    assert(rows(slave) == rows(gs.store), "follower live-row parity")
  }

  test("ingest storm: two crash-replaying exactly-once sinks, a direct " +
      "writer, a compactor and a reader run concurrently — every row lands " +
      "once, the epoch count is exact, the bound view recomputes clean") {
    // TransactionalIngestSpec pins the replay contract single-threaded;
    // this is the concurrent edition: per-id OCC means disjoint-id
    // sinks/writers MUST interleave freely, and the commit-carried
    // cursor must stay exact while a compactor republishes the
    // current-state index (including the cursor table itself) and a
    // reader probes mid-commit. Every batch's FIRST delivery crashes
    // mid-batch after ≥1 durable slice; the retry loop replays the
    // whole batch — Spark's at-least-once redelivery, concurrent.
    val schema = GraphSchema.builder().vertex("doc", "id", Seq("score")).build()
    val gs = new GraphStore(spark, schema, tmp("storm-ingest"))
    gs.txn().createVertices("doc",
      (9000L until 9010L).map(i => (i, i * 2L)).toDF("id", "score")).commit()
    val cat = new ViewCatalog(spark, gs, tmp("storm-ingest-views"))
    cat.register(ViewDef("sum_by_mod", "doc",
      df => df.select(pmod(col("id"), lit(7)).as("key"), col("id"),
        col("score").as("value")),
      reduceAgg = Some(sum(col("value")))))
    cat.bindTo(gs)
    cat.regenerate("sum_by_mod")

    def runSink(sinkId: String, base: Long): Unit = {
      val armed = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      (0L until 3L).foreach(armed.add)
      val sink = graft.streaming.TransactionalIngest.vertexSink(
        gs, "doc", sinkId, slices = 4,
        beforeSlice = (b, m) => if (m == 2L && armed.remove(b))
          throw new RuntimeException(s"injected crash $sinkId batch $b"))
      (0L until 3L).foreach { b =>
        val batch = (0 until 80).map { i =>
          val id = base + b * 80L + i; (id, id * 2L) }.toDF("id", "score")
        var attempts = 0
        var done = false
        while (!done) {
          attempts += 1
          assert(attempts <= 10, s"$sinkId batch $b: too many redeliveries")
          try { sink(batch, b); done = true }
          catch { case _: RuntimeException => () } // redeliver same batch
        }
      }
    }

    val writersDone = new AtomicBoolean(false)
    val sideErrors = new ConcurrentLinkedQueue[Throwable]
    // a replica tails the commit log MID-INGEST: exactly-once must
    // survive into the follower (a double-applied slice would land
    // twice in the replicated epochs too)
    val slave = new VersionedStore(spark, tmp("storm-ingest-slave"))
    val repl = new Replicator(gs.store, slave, Seq("v_doc"))
    val compactor = new Thread(() => {
      try while (!writersDone.get()) {
        gs.store.compactCurrent("v_doc")
        gs.store.compactCurrent(graft.streaming.TransactionalIngest.cursorTable)
        repl.sync()
        Thread.sleep(50)
      } catch { case t: Throwable => sideErrors.add(t) }
    }, "ingest-compactor")
    val probes = new AtomicInteger
    val reader = new Thread(() => {
      try while (!writersDone.get()) {
        gs.graph().vertices("doc").count()
        cat.reducedView("sum_by_mod").count()
        probes.incrementAndGet()
      } catch { case t: Throwable => sideErrors.add(t) }
    }, "ingest-reader")
    compactor.start(); reader.start()
    inThreads(3) {
      case 0 => runSink("storm-a", 0L)
      case 1 => runSink("storm-b", 1000L)
      case _ => (0 until 30).foreach { i =>
        gs.txn().createVertices("doc",
          Seq((5000L + i, i.toLong)).toDF("id", "score")).commit()
      }
    }
    writersDone.set(true)
    compactor.join(); reader.join()
    if (!sideErrors.isEmpty) throw sideErrors.peek()
    assert(probes.get() > 0, "reader must have completed probes mid-storm")

    // exactly once, storm edition: live count exact, every ingested id
    // at rev 1, cursors at (2, 3), and the EPOCH COUNT proves no slice
    // committed twice: 1 seed + 2 sinks x 12 slice commits + 30 writer
    // commits = 55 even though every batch was delivered twice
    assert(gs.graph().vertices("doc").count() == 10L + 240L + 240L + 30L)
    assert(gs.store.latestRevisions("v_doc").agg(max("rev")).head().getLong(0) == 1L)
    assert(graft.streaming.TransactionalIngest
      .cursor(gs.store, "storm-a").contains((2L, 3L)))
    assert(graft.streaming.TransactionalIngest
      .cursor(gs.store, "storm-b").contains((2L, 3L)))
    assert(gs.store.currentEpoch == 55L,
      s"double-applied slice or lost commit: epoch ${gs.store.currentEpoch} != 55")
    // maintained view == from-scratch recompute (a double-applied
    // delta would double a key's contribution)
    val maintained = cat.reducedView("sum_by_mod").select("key", "value")
      .orderBy("key").as[(Long, Long)].collect().toSeq
    cat.regenerate("sum_by_mod")
    val recomputed = cat.reducedView("sum_by_mod").select("key", "value")
      .orderBy("key").as[(Long, Long)].collect().toSeq
    assert(maintained == recomputed, "view drifted under the ingest storm")
    // the replica converges to the exactly-once state: same epoch
    // pointer, same live rows, same revision ceiling
    repl.sync()
    assert(slave.currentEpoch == gs.store.currentEpoch)
    assert(slave.read("v_doc").count() == 520L)
    assert(slave.latestRevisions("v_doc").agg(max("rev")).head().getLong(0) == 1L,
      "a double-applied slice would surface as rev > 1 on the replica")
  }
}
