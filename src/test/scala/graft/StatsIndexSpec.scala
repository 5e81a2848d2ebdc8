package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.model.{GraphSchema, GraphStore}
import graft.operators.{Drift, MaintainedStatsIndex}

/** Contracts of the commit-maintained histogram tier
  * (MaintainedStatsIndex): delta-exactness against from-scratch
  * recompute across creates/updates/deletes, the bound-before-built
  * skip + rebuild catch-up, compaction invariance, and the O(bins)
  * drift monitor against a pinned snapshot.
  */
class StatsIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(Paths.get("target"), prefix).toString

  private val (lo, hi, nBins) = (0.0, 1000.0, 10)

  private def mk(): (GraphStore, MaintainedStatsIndex, String) = {
    val dir = tmp("statsidx")
    val gs = new GraphStore(spark,
      GraphSchema.builder().vertex("doc", "id", Seq("len")).build(), dir)
    val idx = new MaintainedStatsIndex(gs, "v_doc", "len", lo, hi, nBins, dir)
    (gs, idx, dir)
  }

  /** From-scratch truth: current live rows binned with the same edges. */
  private def expected(gs: GraphStore): Seq[(Long, Long)] = {
    val live = gs.store.read("v_doc")
      .select(Drift.binExpr(col("len").cast("double"), lit(lo), lit(hi), nBins).as("bin"))
      .groupBy("bin").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until nBins.toLong).map(b => (b, live.getOrElse(b, 0L)))
  }

  private def got(idx: MaintainedStatsIndex): Seq[(Long, Long)] =
    idx.histogram().orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("maintained histogram equals from-scratch recompute across " +
      "creates, updates (bin moves), deletes, and out-of-range clamps") {
    val (gs, idx, _) = mk()
    idx.rebuild() // zero base on the empty store
    idx.bind()
    // epoch 1: creates across bins, incl. clamped outliers (-50, 4000)
    gs.txn().createVertices("doc",
      (Seq((1L, 50L), (2L, 150L), (3L, 150L), (4L, 999L), (5L, -50L), (6L, 4000L)))
        .toDF("id", "len")).commit()
    assert(got(idx) == expected(gs), "after creates")
    // epoch 2: an update that MOVES a row between bins
    gs.txn().updateVertices("doc", Seq((2L, 850L)).toDF("id", "len")).commit()
    assert(got(idx) == expected(gs), "after bin-moving update")
    // epoch 3: an update that stays in its bin (delta nets to zero)
    gs.txn().updateVertices("doc", Seq((3L, 160L)).toDF("id", "len")).commit()
    assert(got(idx) == expected(gs), "after same-bin update")
    // epoch 4: deletes, including a clamped outlier
    gs.txn().deleteVertices("doc", Seq(1L, 6L).toDF("id")).commit()
    assert(got(idx) == expected(gs), "after deletes")
    assert(got(idx).map(_._2).sum == 4L, "live row count via histogram")
  }

  test("FEATURE-HASH mode: maintained ngram-bucket counts equal a " +
      "from-scratch featurize across creates, text-rewriting updates, " +
      "deletes, and rebuild; DSIR weights from the histogram are " +
      "bit-identical to a corpus-scan derivation") {
    import graft.operators.{Sampling, TextAnalysis}
    val nB = 64
    val dir = tmp("statsngram")
    val gs = new GraphStore(spark,
      GraphSchema.builder().vertex("doc", "id", Seq("text")).build(), dir)
    val idx = new MaintainedStatsIndex(gs, "v_doc", "text", 0.0, 1.0, nB, dir,
      featureHash = true)
    idx.rebuild(); idx.bind()
    def expectedNgram(): Seq[(Long, Long)] = {
      val live = gs.store.read("v_doc")
        .select(explode(TextAnalysis.hashedNgramFeatures(col("text"))).as("f"))
        .select(Sampling.hashBucket(col("f"), nB).as("bin"))
        .groupBy("bin").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (0L until nB.toLong).map(b => (b, live.getOrElse(b, 0L)))
    }
    gs.txn().createVertices("doc", Seq(
      (1L, "the cat sat on the mat"),
      (2L, "a quick brown fox"),
      (3L, ""),                        // zero features
      (4L, "the cat sat on the mat")). // exact twin: counts double
      toDF("id", "text")).commit()
    assert(got(idx) == expectedNgram(), "after creates")
    // text REWRITE moves feature mass through the signed-delta path
    gs.txn().updateVertices("doc",
      Seq((2L, "a quick brown fox jumps far")).toDF("id", "text")).commit()
    assert(got(idx) == expectedNgram(), "after text-rewriting update")
    gs.txn().deleteVertices("doc", Seq(4L).toDF("id")).commit()
    assert(got(idx) == expectedNgram(), "after delete")
    // DSIR weights: maintained counts vs a from-scratch scan of the
    // same live corpus must be bit-identical
    val target = Seq((100L, "the cat jumps")).toDF("doc_id", "text")
    val fromMaintained = TextAnalysis.dsirWeightsDenseFromCounts(
      got(idx), target, "text", nB)
    val fromScan = TextAnalysis.dsirWeightsDense(
      gs.store.read("v_doc").select(col("id").as("doc_id"), col("text")),
      target, "text", nB)
    assert(fromMaintained.toSeq == fromScan.toSeq,
      "maintained-counts weights must equal corpus-scan weights")
    // rebuild compacts the deltas and answers identically
    idx.rebuild()
    assert(got(idx) == expectedNgram(), "after compaction")
  }

  test("bound before built: commits are skipped, rebuild() catches up " +
      "to the committed state exactly; rebuild also compacts deltas away") {
    val (gs, idx, _) = mk()
    idx.bind() // NO rebuild first
    gs.txn().createVertices("doc",
      (1L to 20L).map(i => (i, i * 40L)).toDF("id", "len")).commit()
    intercept[IllegalArgumentException](idx.histogram())
    idx.rebuild()
    assert(got(idx) == expected(gs), "rebuild reads committed state")
    // more commits through the delta path, then compaction
    gs.txn().updateVertices("doc", Seq((7L, 999L)).toDF("id", "len")).commit()
    gs.txn().deleteVertices("doc", Seq(3L).toDF("id")).commit()
    val before = got(idx)
    assert(before == expected(gs))
    idx.rebuild() // compaction: fold deltas into base
    assert(got(idx) == before, "compaction must not change the histogram")
  }

  test("the index is a Maintenance target AS-IS (base/ + delta/commit_epoch=N " +
      "is the layoutStats shape): an epoch breach rebuilds, histogram invariant") {
    val (gs, idx, _) = mk()
    idx.rebuild(); idx.bind()
    (1 to 6).foreach { i =>
      gs.txn().createVertices("doc", Seq((i.toLong, i * 100L)).toDF("id", "len")).commit()
    }
    assert(graft.model.GenDirs.layoutStats(idx.statsRoot).deltaEpochs == 6L)
    val m = new graft.model.Maintenance(
      Seq(graft.model.Maintenance.Target("stats:v_doc.len", idx.statsRoot, () => idx.rebuild())),
      deltaEpochsHigh = 4, deltaBytesHigh = Long.MaxValue, periodMs = 60000L)
    val before = got(idx)
    assert(m.runOnce() == Seq("stats:v_doc.len"))
    assert(graft.model.GenDirs.layoutStats(idx.statsRoot).deltaEpochs == 0L)
    assert(got(idx) == before, "compaction by the daemon must not change the histogram")
    assert(m.runOnce().isEmpty, "below threshold after compaction")
  }

  test("storm: 3 concurrent disjoint-range writers (creates, bin-moving " +
      "updates, deletes) keep the maintained histogram at from-scratch parity") {
    val (gs, idx, _) = mk()
    idx.rebuild(); idx.bind()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val ts = (0 until 3).map { t =>
      new Thread(() => {
        try {
          val base = t * 1000L
          def retry(body: => Unit): Unit = {
            var done = false
            var attempts = 0
            while (!done) {
              attempts += 1
              assert(attempts <= 40, "retry budget exhausted")
              try { body; done = true }
              catch { case _: gs.store.ConflictException => () }
            }
          }
          retry(gs.txn().createVertices("doc",
            (base until base + 8L).map(i => (i, (i % 11) * 90L)).toDF("id", "len")).commit())
          retry(gs.txn().updateVertices("doc",
            Seq((base + 2L, 950L)).toDF("id", "len")).commit())
          retry(gs.txn().deleteVertices("doc", Seq(base + 5L).toDF("id")).commit())
        } catch { case e: Throwable => errors.add(e) }
      }, s"stats-storm-$t")
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    if (!errors.isEmpty) throw errors.peek()
    assert(got(idx) == expected(gs), "quiescent histogram parity after the storm")
    assert(got(idx).map(_._2).sum == 21L) // 3 × (8 created − 1 deleted)
  }

  test("vacuum(keep=1) firing BETWEEN the commit and the stats hook cannot " +
      "drop the superseded side: pre-commit values are captured under the " +
      "commit lock, not read asOf at hook time (r12 advice)") {
    val (gs, idx, _) = mk()
    // register the hostile listener FIRST: listeners run in
    // registration order, so this vacuum executes after the commit is
    // durable but BEFORE the stats hook — exactly the window where the
    // old asOf(epoch-1) read found the superseded revisions already
    // destroyed (vacuum keeps only each id's newest revision, which
    // post-bump is the just-committed value)
    gs.onCommit { (_, _) => gs.store.vacuum("v_doc", keep = 1) }
    idx.rebuild(); idx.bind()
    gs.txn().createVertices("doc",
      Seq((1L, 100L), (2L, 100L), (3L, 900L)).toDF("id", "len")).commit()
    assert(got(idx) == expected(gs), "after creates under eager vacuum")
    // the bin-MOVING update is the case that overcounts without the -1
    // side: bin(100) keeps a ghost and bin(900) gains a real row
    gs.txn().updateVertices("doc", Seq((1L, 900L)).toDF("id", "len")).commit()
    assert(got(idx) == expected(gs), "bin-moving update under eager vacuum")
    gs.txn().deleteVertices("doc", Seq(2L).toDF("id")).commit()
    assert(got(idx) == expected(gs), "delete under eager vacuum")
    assert(got(idx).map(_._2).sum == 2L)
  }

  test("replay cursor: a delta replayed at or below the rebuild's epoch is " +
      "skipped, so a daemon rebuild racing a durable commit cannot " +
      "double-count it (r12 advice)") {
    val (gs, idx, _) = mk()
    idx.rebuild(); idx.bind()
    gs.txn().createVertices("doc",
      Seq((1L, 100L), (2L, 500L)).toDF("id", "len")).commit()
    val staged = gs.store.read("v_doc") // the epoch-1 rows, re-presented
    val before = got(idx)
    // the race, made deterministic: rebuild folds epoch 1 into the
    // base, then epoch 1's delta arrives again (a hook that lost the
    // scheduling race, a replica replay) — it must be a no-op
    idx.rebuild()
    idx.applyCommit(1L, staged.withColumn("deleted", lit(false)))
    assert(got(idx) == before, "replayed epoch below the cursor must not re-apply")
    assert(got(idx) == expected(gs))
    // and an epoch ABOVE the cursor still applies normally
    gs.txn().createVertices("doc", Seq((3L, 900L)).toDF("id", "len")).commit()
    assert(got(idx) == expected(gs), "fresh commits still apply after the replay")
  }

  test("a reader in ANOTHER instance rides out a concurrent rebuild: the " +
      "base publishes as a GenDirs generation, never an rmTree window " +
      "(r12 advice)") {
    val (gs, idx, dir) = mk()
    idx.rebuild(); idx.bind()
    gs.txn().createVertices("doc",
      (1L to 30L).map(i => (i, i * 30L)).toDF("id", "len")).commit()
    // a second instance over the same directory (q213's QueryDef shape)
    val reader = new MaintainedStatsIndex(gs, "v_doc", "len", lo, hi, nBins, dir)
    val plan = reader.histogram() // plan built against the current generation
    idx.rebuild() // publishes gen+1; the old generation survives one more publish
    assert(plan.orderBy("bin").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == expected(gs), "pre-rebuild plan must still read intact files")
    assert(reader.histogram().orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == expected(gs))
  }

  test("stratified: per-group maintained histograms track from-scratch " +
      "parity across grouped creates, bin-moving updates, and deletes; " +
      "drift reports strata born after the snapshot") {
    val dir = tmp("statsidxg")
    val gs = new GraphStore(spark,
      GraphSchema.builder().vertex("doc", "id", Seq("len", "lang")).build(), dir)
    val idx = new MaintainedStatsIndex(gs, "v_doc", "len", lo, hi, nBins, dir,
      groupCol = Some("lang"))
    idx.rebuild(); idx.bind()
    def expectedG(): Set[(String, Long, Long)] = {
      val live = gs.store.read("v_doc")
        .select(col("lang"),
          Drift.binExpr(col("len").cast("double"), lit(lo), lit(hi), nBins).as("bin"))
        .groupBy("lang", "bin").count()
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val langs = live.keys.map(_._1).toSet
      for (l <- langs; b <- 0L until nBins.toLong)
        yield (l, b, live.getOrElse((l, b), 0L))
    }
    def gotG(): Set[(String, Long, Long)] =
      idx.histogram().collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    gs.txn().createVertices("doc",
      Seq((1L, 100L, "en"), (2L, 150L, "en"), (3L, 100L, "de"), (4L, 4000L, "de"))
        .toDF("id", "len", "lang")).commit()
    assert(gotG() == expectedG(), "after grouped creates (clamp included)")
    idx.snapshot("m0")
    // a bin-moving update in one stratum, a delete in the other
    gs.txn().updateVertices("doc", Seq((1L, 900L, "en")).toDF("id", "len", "lang")).commit()
    assert(gotG() == expectedG(), "after grouped bin-moving update")
    gs.txn().deleteVertices("doc", Seq(3L).toDF("id")).commit()
    assert(gotG() == expectedG(), "after grouped delete")
    // a stratum BORN after the snapshot
    gs.txn().createVertices("doc",
      (10L to 19L).map(i => (i, 950L, "zh")).toDF("id", "len", "lang")).commit()
    assert(gotG() == expectedG(), "after a new stratum appears")
    val drift = idx.driftVsSnapshot("m0").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(drift.keySet == Set("en", "de", "zh"),
      s"full-outer strata expected, got ${drift.keySet}")
    assert(drift("zh")._1 == 0L && drift("zh")._2 == 10L) // born after m0
    assert(drift("en")._3 > 0L, "the en bin move must register as drift")
    // grouped rebuild compacts without changing the histogram
    val before = gotG()
    idx.rebuild()
    assert(gotG() == before, "grouped compaction is invariant")
  }

  test("drift-gated ingest under storm: aligned batches land, shifted " +
      "batches refuse with the 409 conflict and leave NOTHING behind, " +
      "and the surviving corpus stays inside the gate") {
    val (gs, idx, _) = mk()
    idx.rebuild(); idx.bind()
    // reference corpus: uniform lengths, pinned as the monitor start
    gs.txn().createVertices("doc",
      (1L to 200L).map(i => (i, i % 10 * 100L)).toDF("id", "len")).commit()
    idx.snapshot("gate0")
    val limit = 250000L // the 0.25 industry PSI gate, in ppm
    val refused = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]
    val admitted = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]
    val shiftedAdmitted = new java.util.concurrent.atomic.AtomicInteger
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val ts = (0 until 3).map { t =>
      new Thread(() => {
        try {
          val base = 1000L + t * 1000L
          (0 until 4).foreach { b =>
            val aligned = (t + b) % 2 == 0
            // a shifted batch must be big enough to actually MOVE the
            // monitor (60 rows of top-bin mass against the ~200-row
            // reference reads PSI ≈ 0.29 > the 0.25 gate); aligned
            // batches stay small and uniform
            val n = if (aligned) 8L else 60L
            val ids = (base + b * 100L) until (base + b * 100L + n)
            val rows =
              if (aligned) // same uniform mix as the reference
                ids.map(i => (i, i % 10 * 100L)).toDF("id", "len")
              else // all mass clamped into the top bin
                ids.map(i => (i, 5000L)).toDF("id", "len")
            try {
              idx.gatedCreate("doc", rows, "gate0", limit)
              admitted.add(ids)
              if (!aligned) shiftedAdmitted.incrementAndGet()
            } catch {
              case _: gs.store.ConflictException => refused.add(ids)
            }
          }
        } catch { case e: Throwable => errors.add(e) }
      }, s"gate-storm-$t")
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    if (!errors.isEmpty) throw errors.peek()
    import scala.jdk.CollectionConverters._
    // the first shifted batch may legitimately FIT under the limit
    // (aligned admissions grow the denominator), but the gate must slam
    // before the mass accumulates: most shifted batches refuse
    assert(refused.size() > 0, "shifted batches must refuse")
    assert(shiftedAdmitted.get() <= 1,
      s"the gate let ${shiftedAdmitted.get()} shifted batches through")
    assert(admitted.size() > 0, "aligned batches must land")
    // a refused batch leaves NOTHING behind; every admitted one landed
    val liveIds = gs.store.read("v_doc").select("id")
      .collect().map(_.getLong(0)).toSet
    refused.asScala.flatten.foreach(id =>
      assert(!liveIds(id), s"409-refused id $id left behind"))
    admitted.asScala.flatten.foreach(id =>
      assert(liveIds(id), s"admitted id $id missing"))
    // the maintained histogram still matches from-scratch, and the
    // surviving corpus sits inside the gate it was admitted under
    assert(got(idx) == expected(gs), "histogram parity after the gate storm")
    val psiNow = idx.driftVsSnapshot("gate0").head.getLong(2)
    assert(psiNow <= limit, s"gated corpus drifted past the limit: $psiNow")
    // and the admission arithmetic agrees with committing then asking:
    // admitting an aligned batch reads the same psi the corpus shows
    val probe = (9000L to 9007L).map(i => (i, i % 10 * 100L)).toDF("id", "len")
    val wouldBe = idx.admissionPsiPpm("gate0", probe)
    idx.gatedCreate("doc", probe, "gate0", limit)
    assert(idx.driftVsSnapshot("gate0").head.getLong(2) == wouldBe,
      "admission psi must equal the post-commit monitor reading")
  }

  test("stratified gate closes the aggregate blind spot: a batch collapsing " +
      "one SMALL stratum refuses per-stratum while the aggregate admission " +
      "would wave it through") {
    val dir = tmp("statsgate-g")
    val gs = new GraphStore(spark,
      GraphSchema.builder().vertex("doc", "id", Seq("len", "lang")).build(), dir)
    val idx = new MaintainedStatsIndex(gs, "v_doc", "len", lo, hi, nBins, dir,
      groupCol = Some("lang"))
    idx.rebuild(); idx.bind()
    // en dominates (200 uniform rows), zh is the small stratum (20)
    gs.txn().createVertices("doc",
      ((1L to 200L).map(i => (i, i % 10 * 100L, "en")) ++
        (201L to 220L).map(i => (i, i % 10 * 100L, "zh")))
        .toDF("id", "len", "lang")).commit()
    idx.snapshot("m0")
    // an AGGREGATE twin monitor over the same store, same edges
    val agg = new MaintainedStatsIndex(gs, "v_doc", "len", lo, hi, nBins,
      tmp("statsgate-a"))
    agg.rebuild(); agg.snapshot("m0")
    // the hostile batch: zh-only, all mass clamped into the top bin —
    // 20 rows against a 220-row corpus barely moves the aggregate
    val batch = (500L to 519L).map(i => (i, 5000L, "zh")).toDF("id", "len", "lang")
    val limit = 250000L
    val aggPsi = agg.admissionPsiPpm("m0", batch)
    assert(aggPsi <= limit,
      s"fixture broken: the aggregate view must admit this batch ($aggPsi)")
    val byLang = idx.admissionPsiByGroup("m0", batch).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("zh") > limit, s"zh stratum must breach: ${byLang("zh")}")
    assert(byLang("en") <= limit, s"en stratum must not: ${byLang("en")}")
    val e = intercept[gs.store.ConflictException](
      idx.gatedCreate("doc", batch, "m0", limit))
    assert(e.getMessage.contains("'zh'"), s"refusal must name the stratum: $e")
    assert(gs.store.read("v_doc").filter(col("id") >= 500L).count() == 0L,
      "the refused batch must leave nothing behind")
    // and an aligned zh batch still lands through the stratified gate
    idx.gatedCreate("doc",
      (600L to 607L).map(i => (i, i % 10 * 100L, "zh")).toDF("id", "len", "lang"),
      "m0", limit)
    assert(gs.store.read("v_doc").filter(col("id") >= 600L).count() == 8L)
  }

  test("O(bins) drift monitor: pin a reference snapshot, land a shifted " +
      "commit, psi flags it; a fresh snapshot self-drifts to zero") {
    val (gs, idx, _) = mk()
    idx.rebuild(); idx.bind()
    gs.txn().createVertices("doc",
      (1L to 100L).map(i => (i, 100L + i % 100)).toDF("id", "len")).commit()
    idx.snapshot("monitor_start")
    // the shifted batch (all in high bins)
    gs.txn().createVertices("doc",
      (101L to 160L).map(i => (i, 800L + i % 100)).toDF("id", "len")).commit()
    val drift = idx.driftVsSnapshot("monitor_start").head
    assert(drift.getLong(0) == 100L && drift.getLong(1) == 160L)
    assert(drift.getLong(2) > 250000L, // past the 0.25 "shifted" PSI gate
      s"shifted commit not flagged: psi_ppm=${drift.getLong(2)}")
    idx.snapshot("now")
    val self = idx.driftVsSnapshot("now").head
    assert((self.getLong(2), self.getLong(3), self.getLong(4)) == ((0L, 0L, 0L)))
  }

  test("selection-gated ingest (q228, r13 #7): the maintained DSIR model " +
      "refuses a batch selection would discard (409-shaped, atomic), admits " +
      "a target-like batch, and the admitted mass immediately lowers the " +
      "next verdict — the closed loop") {
    val dir = tmp("selgate")
    val gs = new GraphStore(spark,
      GraphSchema.builder().vertex("doc", "id", Seq("text")).build(), dir)
    val idx = new MaintainedStatsIndex(gs, "v_doc", "text", 0.0, 1.0, 512, dir,
      featureHash = true)
    idx.rebuild(); idx.bind()
    // the standing corpus is junk-dominated; the curated target is prose:
    // junk features are common-in-raw / absent-in-target (low DSIR
    // ratio), prose features the opposite (clamped-high ratio)
    val junk = "junk spam noise blather drivel filler churn sludge"
    val prose = "good clean prose reads well and trains the model better"
    gs.txn().createVertices("doc",
      (0L until 40L).map(i => (i, junk)).toDF("id", "text")).commit()
    val target = (0L until 3L).map(i => (i, prose)).toDF("doc_id", "text")
    val bad = (100L until 120L).map(i => (i, junk)).toDF("id", "text")
    val good = (200L until 220L).map(i => (i, prose)).toDF("id", "text")
    val before = gs.store.read("v_doc").count()
    val badPpm = idx.dsirKeptPpm(bad, "id", "text", target, "text")
    assert(badPpm < 200000L, s"junk batch must score unkeepable: $badPpm")
    val e = intercept[RuntimeException](idx.selectionGatedCreate(
      "doc", bad, "id", "text", target, "text", minKeptPpm = 500000L))
    assert(e.getClass.getSimpleName == "ConflictException" &&
      e.getMessage.contains("selection gate"), e.getMessage)
    assert(gs.store.read("v_doc").count() == before,
      "a refused batch must commit NOTHING")
    // target-like batch: every doc clamps to keep_permille 1000 → kept
    val goodBefore = idx.dsirBatchScores(good, "id", "text", target, "text")
    assert(goodBefore.filter(!col("kept")).count() == 0)
    val scoreBefore = goodBefore.agg(expr("sum(dsir_ppm) div count(1)"))
      .head.getLong(0)
    idx.selectionGatedCreate("doc", good, "id", "text", target, "text",
      minKeptPpm = 500000L)
    assert(gs.store.read("v_doc").count() == before + 20)
    // the loop closes: the admitted commit refreshed the maintained
    // model in-commit, so the same shape is less "rare in raw" and the
    // next verdict's scores drop — no corpus rescan anywhere
    val scoreAfter = idx.dsirBatchScores(good, "id", "text", target, "text")
      .agg(expr("sum(dsir_ppm) div count(1)")).head.getLong(0)
    assert(scoreAfter < scoreBefore,
      s"admitted mass must lower the next verdict: $scoreBefore -> $scoreAfter")
    // an empty batch admits vacuously (nothing to refuse)
    assert(idx.dsirKeptPpm(good.limit(0), "id", "text", target, "text")
      == 1000000L)
  }
}
