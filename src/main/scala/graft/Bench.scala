package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}}. The headline
  * set covers each workload family of BASELINE.md: scans, point
  * lookups, pattern joins, aggregation/views, traversal, spatial,
  * dedup (exact + LSH), similarity, and event analytics.
  */
object Bench {

  val headline: Seq[String] = Seq(
    "q01_scan_vertices",    // scan-vertices
    "q02_lookup_vertex",    // lookup-by-id
    "q10_pattern_flagship", // prolog-edge-join analog
    "q11_two_hop_join",
    "q20_agg_pricing",
    "q21_view_group",       // view maintenance/regeneration analog
    "q26_topk",
    "q31_bfs",
    "q32_transitive_closure",
    "q41_spatial_knn",
    "q54_dedup_exact",
    "q55_ngram_jaccard",
    "q56_minhash_lsh",
    "q58_cosine_topk",
    "q59_ann_lsh",
    "q60_window_agg",
    "q61_sessionize",
    "q64_asof_join",
    "q104_dup_spans",     // substring window dedup (round 6)
    "q106_posting_probe", // written inverted-index probe (round 6)
    "q108_semantic_dedup", // SemDeDup keep-list over the LSH store (round 7)
    "q111_bm25_stored",   // posting-store BM25 probe (round 7)
    "q112_ivfpq_ann",     // composed IVF-PQ probe, cell-pruned codes (round 7)
    "q115_phrase_search", // positional phrase probe (round 7)
    "q116_nn_graph",      // per-vector ranked near-neighbor join (round 7)
    "q127_fuzzy_decontaminate", // cross-corpus LSH near-dup check (round 8)
    "q131_kmeans",        // 2-round distributed Lloyd + assignment (round 8)
    "q135_hybrid_rrf",    // BM25 + dense fused retrieval, rescan tier (round 8)
    "q146_hybrid_stored", // the same fusion served from the written stores (round 8)
    "q137_novelty",       // directional window-novelty audit (round 8)
    "q140_funnel",        // windowed conversion funnel (round 8)
    "q162_session_records", // per-session rollup, shared window sort (round 8)
    "q167_dhash_neardups",  // perceptual-hash near-dup profile (round 8)
    "q190_ivfpq_filtered",  // metadata-filtered composed ANN probe (round 9)
    "q191_audio_curate",    // curation + audio-fingerprint keep-list (round 9)
    "q192_curate_mix",      // curate -> quota -> epoch-mix flagship (round 9)
    "q193_mix_pack",        // mixed stream packed into sequences (round 9)
    "q203_drift_psi",       // snapshot drift gate, two-pass histogram (round 12)
    "q221_dsir_select",     // DSIR importance selection, hashed-ngram model (round 13)
    "q227_lm_curate_mix",   // mix flagship + per-source LM fluency gate (round 14)
    "q228_dsir_admission",  // selection-aware admission vs the maintained model (round 14)
    "q229_hard_negatives",  // BM25 hard-negative mining, q87's scan shape (round 15)
    "q230_temperature_mix", // isqrt temperature shares + budget allocation (round 15)
    "q235_dedup_span_removal", // keep-first exact-substring excision (round 16)
    "q236_lm_tiers",        // CCNet per-language LM head/middle/tail (round 16)
    "q237_curriculum",      // staged curriculum schedule, two-level prefix (round 16)
    "q238_contrastive_pairs", // near-dup positives + exact jaccard (round 16)
    // r17 additions (VERDICT #10): the r16 round's biggest absolute
    // wins join the headline set so any future regression on them is
    // driver-visible. Additions only — the comparison stays valid.
    "q156_winnow_matches",    // winnowing fingerprint match join (44x in r16)
    "q226_lm_curate_audit",   // LM-gated audit, the dedup'd LM subtree
    "q240_contrastive_triplets") // rare-shingle hard negatives (17x in r16)

  /** Fixed CPU-bound probe whose cost is independent of the query set:
    * a long-range sum through whole-stage codegen. Run before and after
    * the query loop, it calibrates how loaded the machine was during
    * the measurement — a probe far above its quiet-machine floor means
    * the per-query numbers are contention-inflated and should be
    * normalized by the probe ratio rather than re-adjudicated.
    */
  def calibrationProbe(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(500000000L).selectExpr("sum(id)").collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** Readings kept per query in the rolling floor window. Five quiet
    * sweeps ≈ five rounds: long enough that one noisy sweep cannot
    * move a floor, short enough that a single lucky scheduling window
    * stops doing invalidation work within a handful of rounds.
    */
  val floorWindowK = 5

  /** Parse the quiet-floor ledger into per-query reading windows
    * (oldest first, at most [[floorWindowK]] entries of
    * `(epochMillis, seconds)`). Accepts BOTH formats: the current
    * windowed one and the pre-round-14 flat `{"q":0.123}` ledger,
    * whose all-time minima are migrated as one-reading windows
    * stamped 0 — they count as a reading until [[floorWindowK]]
    * newer quiet readings age them out.
    */
  def readLedger(path: java.nio.file.Path =
      java.nio.file.Paths.get("floors.json")): Map[String, Seq[(Long, Double)]] =
    if (!java.nio.file.Files.exists(path)) Map.empty
    else {
      val txt = new String(java.nio.file.Files.readAllBytes(path),
        java.nio.charset.StandardCharsets.UTF_8)
      if (txt.contains("\"window\"")) {
        val entry =
          """"([^"]+)"\s*:\s*\{"floor":[0-9.]+,"window":\[((?:\[\d+,[0-9.]+\],?)*)\]\}""".r
        val reading = """\[(\d+),([0-9.]+)\]""".r
        val parsed = entry.findAllMatchIn(txt).map { m =>
          m.group(1) -> reading.findAllMatchIn(m.group(2))
            .map(r => r.group(1).toLong -> r.group(2).toDouble).toSeq
        }.toMap
        // Fail loudly on shape drift: a hand-edited or locale-mangled
        // entry that the strict regex skips would otherwise silently
        // erase that query's floor history on the next writeLedger.
        val declared = "\"floor\"".r.findAllMatchIn(txt).size
        if (declared != parsed.size)
          System.err.println(s"[bench] floors.json: $declared entries declared, " +
            s"${parsed.size} parsed — ${declared - parsed.size} malformed entr" +
            "ies SKIPPED (their floor history will be lost on next write)")
        parsed
      } else
        """"([^"]+)"\s*:\s*([0-9.]+)""".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> Seq(0L -> m.group(2).toDouble)).toMap
    }

  /** Effective quiet floors: per query the MINIMUM over its rolling
    * window (the probe floor rides under `__probe`). This is what the
    * verdict/requalification tier compares against.
    */
  def readFloors(path: java.nio.file.Path =
      java.nio.file.Paths.get("floors.json")): Map[String, Double] =
    readLedger(path).collect { case (k, w) if w.nonEmpty => k -> w.map(_._2).min }

  /** Locale-pinned 3-decimal format: the default-locale `f"%.3f"`
    * interpolator writes comma decimals on comma-locale JVMs, which
    * [[readLedger]]'s regexes then silently drop — floors lost with
    * no error. Locale.ROOT makes the ledger byte-identical everywhere.
    */
  private def num3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** Serialize the ledger: one entry per line (git-diff-friendly),
    * each carrying its derived floor for human readers — the floor is
    * always recomputed from the window on read, so the two cannot
    * disagree.
    */
  def writeLedger(ledger: Map[String, Seq[(Long, Double)]],
      path: java.nio.file.Path): Unit = {
    val body = ledger.toSeq.filter(_._2.nonEmpty).sortBy(_._1).map { case (k, w) =>
      val window = w.map { case (ts, v) => s"[$ts,${num3(v)}]" }.mkString(",")
      "\"" + k + s"""":{"floor":${num3(w.map(_._2).min)},"window":[$window]}"""
    }.mkString("{\n", ",\n", "\n}")
    java.nio.file.Files.write(path,
      (body + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Machine-readable quiet-floor ledger (`floors.json` in the
    * working dir): per-query the last [[floorWindowK]] QUIET-run
    * readings, so the effective floor is the min over a rolling
    * window rather than the all-time minimum. The all-time ratchet
    * was round 13's one red signal: a single exceptionally-quiet
    * q203 reading (0.178 s) became a permanent floor that every
    * honest future ~0.25 s reading carried 40% JVM variance against,
    * invalidating an otherwise-clean artifact. Under the window, a
    * lucky one-off expires after [[floorWindowK]] subsequent quiet
    * readings; a genuine regression still trips the 2× verdict gate
    * the moment it lands, because the verdict always compares against
    * the CURRENT floor (pre-update).
    *
    * Quietness is self-calibrating: the ledger tracks the calibration
    * probe's own window under `__probe`, and a run only appends query
    * readings when its probe reading is within 10% of the probe
    * floor. The probe window only admits a reading when the run's two
    * bracketing probes AGREE (within 20% — a lone anomalously-fast
    * probe is a scheduling transient; observed live in round 13) AND
    * the reading is ≤1.5× the current probe floor (a loaded run's
    * probes must never enter the window, or the floor would drift up
    * and loaded runs would start classifying as quiet).
    *
    * The SAME update rewrites BENCHNOTES.md's floor table (between
    * the FLOORS_TABLE markers) from the merged ledger, so the
    * human-readable table and the file can never drift apart again.
    */
  def updateFloors(results: Seq[(String, Double)], probeBefore: Double,
      probeAfter: Double,
      path: java.nio.file.Path = java.nio.file.Paths.get("floors.json"),
      notes: java.nio.file.Path = java.nio.file.Paths.get("BENCHNOTES.md"),
      nowMillis: Long = System.currentTimeMillis(),
      /** Readings that carry their OWN quiet certification — each was
        * bracketed by its own at-floor probes during requalification —
        * so they enter the window even when the sweep's run-level
        * probes were hot. Without this, a contended sweep contributes
        * nothing and stale windows never age on a busy machine (the
        * r13–r15 invalidation loop: floors from one exceptionally
        * quiet epoch judging every honest reading of a noisier one).
        */
      certified: Seq[(String, Double)] = Nil): Unit = {
    val old = readLedger(path)
    def floorOf(w: Seq[(Long, Double)]): Double = w.map(_._2).min
    def append(w: Seq[(Long, Double)], v: Double): Seq[(Long, Double)] =
      (w :+ (nowMillis -> v)).takeRight(floorWindowK)
    val probe = math.min(probeBefore, probeAfter)
    val probesAgree = math.max(probeBefore, probeAfter) <=
      math.min(probeBefore, probeAfter) * 1.2
    val oldProbe = old.getOrElse("__probe", Nil)
    val probeWindow =
      if (oldProbe.isEmpty) { if (probesAgree) Seq(nowMillis -> probe) else Nil }
      else if (probesAgree && probe <= floorOf(oldProbe) * 1.5) append(oldProbe, probe)
      else oldProbe
    // quiet means BOTH bracketing probes sit within 10% of the probe
    // floor: under the all-time-min ledger, judging on the faster probe
    // was harmless (a contended reading could never lower a min), but a
    // window APPENDS readings — one fast probe amid load would let a
    // contended reading enter and later age honest floors out (observed
    // live in round 14's first loaded subset run: probes 0.425/0.107,
    // q203's 0.410 contended reading landed in the window)
    val quiet = probeWindow.nonEmpty &&
      math.max(probeBefore, probeAfter) <= floorOf(probeWindow) * 1.1
    val base = if (probeWindow.nonEmpty) old + ("__probe" -> probeWindow) else old
    // one appended reading per query per run: the sweep reading when
    // the RUN was quiet, a certified requalification reading always,
    // the min when both exist
    val eligible: Map[String, Double] =
      ((if (quiet) results else Nil) ++ certified)
        .filter(_._2 > 0).groupBy(_._1)
        .map { case (n, ts) => n -> ts.map(_._2).min }
    // Admission cap: a reading far above the query's own window floor
    // never enters. The floor window answers "how fast does this query
    // go on a quiet box" — a 3×+ reading is either contention the CPU
    // probe cannot see (BENCH_r15: q191 requalified at 9.459 s, 19×
    // floor, inside a CERTIFIED probe bracket — memory-bandwidth
    // co-tenancy leaves the arithmetic probe at floor while shuffle
    // readings collapse) or a genuine regression, which the ≥2× verdict
    // gate already reports and which must NOT loosen the gate by aging
    // the floor up to meet it. Honest 1–1.5× daily-variance readings
    // still enter, so stale lucky floors keep aging out.
    val merged: Map[String, Seq[(Long, Double)]] =
      eligible.foldLeft(base) {
        case (acc, (n, t)) =>
          val w = acc.getOrElse(n, Nil)
          if (w.nonEmpty && t > floorOf(w) * 3.0) acc
          else acc + (n -> append(w, t))
      }
    writeLedger(merged, path)
    syncFloorsTable(merged.collect { case (k, w) if w.nonEmpty => k -> floorOf(w) },
      notes)
  }

  /** Regenerate BENCHNOTES.md's quiet-floor table from the ledger, in
    * the same update that wrote floors.json (no-op when the notes file
    * or its markers are absent — e.g. Bench run outside the repo).
    */
  def syncFloorsTable(floors: Map[String, Double],
      notes: java.nio.file.Path = java.nio.file.Paths.get("BENCHNOTES.md")): Unit = {
    if (!java.nio.file.Files.exists(notes)) return
    val begin = "<!-- FLOORS_TABLE_BEGIN"
    val end = "<!-- FLOORS_TABLE_END -->"
    val txt = new String(java.nio.file.Files.readAllBytes(notes),
      java.nio.charset.StandardCharsets.UTF_8)
    val b = txt.indexOf(begin); val e = txt.indexOf(end)
    if (b < 0 || e < 0 || e < b) return
    val head = txt.substring(0, b)
    val tailPart = txt.substring(e + end.length)
    val table = floors.toSeq.filter(_._1 != "__probe").sortBy(_._1)
      .map { case (k, v) => s"| $k | ${num3(v)} |" }.mkString("\n")
    val probeLine = floors.get("__probe")
      .map(p => s"\n(probe floor: ${num3(p)} s)\n").getOrElse("\n")
    val block = begin + " (generated by graft.Bench.updateFloors from " +
      "floors.json — do not hand-edit) -->\n" +
      "| query | quiet floor (s) |\n|---|---|\n" + table + "\n" + probeLine + end
    java.nio.file.Files.write(notes,
      (head + block + tailPart).getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Best/median over `warmRuns` measured executions after one
    * discarded warm-up (steady-state methodology; see main).
    */
  def timeQuery(runOnce: () => Double, warmRuns: Int): (Double, Double) = {
    runOnce() // warm-up run discarded
    val runs = Seq.fill(warmRuns)(runOnce()).sorted
    (runs.head, runs(runs.size / 2))
  }

  /** Which queries need a post-sweep REQUALIFICATION run: the round-9
    * lesson (a co-tenant load spike mid-sweep read as a 2× across-the-
    * board regression) made mechanical. Any reading ≥1.5× its quiet
    * floor re-runs once after the sweep and BOTH readings land in the
    * JSON, so the artifact carries its own correction. The bar was
    * 2× on quiet runs until round 13 (1.5× only under probe
    * disagreement), which let BENCH_r12's q58 record 1.59× with no
    * second reading and nothing to adjudicate it (r12 what's-wrong
    * #1) — a 1.5–2× drift is exactly the band where a second reading
    * settles "lucky floor vs real regression", so it always re-runs
    * now. Only a ≥2× breach that SURVIVES requalification invalidates
    * the artifact ([[benchVerdict]]); a 1.5–2× reading is recorded
    * evidence, not an alarm.
    */
  def requalifyNeeded(best: Seq[(String, Double)],
      floors: Map[String, Double]): Seq[String] =
    best.collect { case (n, t)
      if t > 0 && floors.get(n).exists(f => t >= 1.5 * f) => n }

  /** Self-gating verdict for the run artifact — the round-11 lesson: a
    * sweep whose own calibration probes prove heavy external contention
    * (probe_after landed at 5.3× the quiet probe floor) still shipped
    * with `rc: 0`, indistinguishable downstream from a clean run.
    * The requalification tier DETECTED the suspects, but the artifact
    * swallowed the conclusion. This function makes the conclusion part
    * of the artifact: `bench_valid` is false — with machine-readable
    * reasons — when either bracketing probe reads ≥2× the quiet probe
    * floor (the machine was contended while measuring), or when a
    * requalified reading STILL breaches 2× its query floor (the
    * suspect did not clear even after the sweep; either the box never
    * quieted or the query genuinely regressed — both mean "do not
    * trust this artifact as a clean reading"). A suspect whose
    * requalification run errored keeps its sweep reading as the
    * evidence. With no probe floor on record (first run on a machine)
    * the probes cannot be judged, but requalified breaches still can.
    */
  def benchVerdict(probeBefore: Double, probeAfter: Double,
      probeFloor: Option[Double], requalified: Seq[(String, Double)],
      sweepBest: Map[String, Double], floors: Map[String, Double])
      : (Boolean, Seq[String]) = {
    val probeReasons = probeFloor.toSeq.flatMap { pf =>
      Seq("probe_before" -> probeBefore, "probe_after" -> probeAfter).collect {
        case (n, p) if p >= 2.0 * pf => f"$n $p%.3f >= 2x probe floor $pf%.3f"
      }
    }
    val requalReasons = requalified.flatMap { case (name, r) =>
      // adjudicate on the BEST honest reading of the run: a regression
      // cannot produce a fast reading, so a sweep best that clears the
      // gate clears the query even when the (best-of-2, late-JVM,
      // GC-pressured) requalification reads worse — observed live in
      // round 15: q137 swept 0.175 (under gate) then requalified 0.510
      val sweep = sweepBest.getOrElse(name, -1.0)
      val reading = Seq(r, sweep).filter(_ > 0) match {
        case Nil => -1.0
        case rs => rs.min
      }
      floors.get(name).collect {
        case f if reading > 0 && reading >= 2.0 * f =>
          val tag =
            if (r > 0) f"min(sweep $sweep%.3f, requal $r%.3f)"
            else "requalify failed; sweep"
          f"$name $tag $reading%.3f >= 2x floor $f%.3f"
      }
    }
    val reasons = probeReasons ++ requalReasons
    (reasons.isEmpty, reasons)
  }

  /** Wait (bounded) for a QUIET measurement window: re-run the probe
    * until it reads within `tol`× of the quiet probe floor, sleeping
    * between attempts, giving up when the budget would be exceeded.
    * Rounds 13 and 14 both recorded contention-invalidated sweeps
    * (probes 1.8–2.5× floor, co-tenant load decaying over minutes):
    * the verdict tier correctly refused to trust them, but refusing is
    * strictly worse than waiting out a transient spike and measuring
    * clean. Returns `(lastProbe, waitedSec, attempts)` — the caller
    * records the wait in the calibration block so a waited-out run is
    * distinguishable from an immediately-quiet one. With no probe
    * floor on record (first run on a machine) the first probe is
    * accepted: there is nothing to judge quietness against.
    */
  def awaitQuiet(probeFn: () => Double, probeFloor: Option[Double],
      budgetSec: Int, tol: Double = 1.15,
      sleepMs: Long = 15000L): (Double, Int, Int) = {
    val t0 = System.nanoTime()
    def elapsedSec = ((System.nanoTime() - t0) / 1e9).toInt
    var probe = probeFn()
    var attempts = 1
    probeFloor.foreach { pf =>
      while (probe > pf * tol &&
          elapsedSec + math.ceil(sleepMs / 1000.0).toInt <= budgetSec) {
        Thread.sleep(sleepMs)
        probe = probeFn()
        attempts += 1
      }
    }
    (probe, elapsedSec, attempts)
  }

  /** 1-minute load average from /proc/loadavg (NaN if unreadable). */
  def loadAvg(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.split("\\s+")(0).toDouble finally src.close()
    } catch { case _: Throwable => Double.NaN }

  def main(args: Array[String]): Unit = {
    def intEnv(name: String, default: Int, min: Int): Int = {
      val raw = sys.env.getOrElse(name, default.toString)
      val v = try raw.toInt catch {
        case _: NumberFormatException =>
          sys.error(s"$name must be an integer, got '$raw'")
      }
      require(v >= min, s"$name must be >= $min, got $v")
      v
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = intEnv("SPARK_GRAFT_CPUS", 32, 1)
    val spark = GraftSession.get(cpus)
    // JVM + parquet-footer warm-up so per-query times measure the plan,
    // not first-touch class loading
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    // Steady-state methodology, matching BASELINE.md's own harness
    // (tests/perf/suite.lisp runs warm in-process op loops against
    // mmap-resident data): the first run pays parquet footer reads,
    // plan compilation and JIT and is discarded; the best of the
    // following warm runs is reported (standard steady-state practice —
    // local[32] scheduling noise makes any single warm run a biased
    // sample of the plan's cost).
    val only: String => Boolean =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
        case Some(ps) => n => ps.split(',').exists(n.startsWith)
        case None => _ => true
      }
    val warmRuns = intEnv("SPARK_GRAFT_BENCH_RUNS", 5, 1)
    val loadBefore = loadAvg()
    // the probe plan itself needs one discarded compile pass: its first
    // execution pays ~0.7 s of whole-stage codegen, which would inflate
    // probe_before against probe_after and read as phantom contention
    calibrationProbe(spark)
    val floors = readFloors()
    // bounded wait-for-quiet: a sweep started under a transient load
    // spike (the r13/r14 invalidation cause) sleeps it out instead of
    // measuring garbage the verdict tier then has to refuse
    val quietBudget = intEnv("SPARK_GRAFT_QUIET_WAIT_SEC", 300, 0)
    val (probeBefore, waitedBefore, _) =
      awaitQuiet(() => calibrationProbe(spark), floors.get("__probe"), quietBudget)
    def once(name: String)(): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val results = headline.filter(only).map { name =>
      name -> (try timeQuery(once(name), warmRuns)
      catch { case _: Throwable => (-1.0, -1.0) })
    }
    val probeAfter = calibrationProbe(spark)
    val loadAfter = loadAvg()
    // post-sweep requalification: suspects re-measure AFTER the sweep
    // (and after the probe that evidences the contention) so a mid-run
    // load spike cannot masquerade as a code regression in the artifact.
    // Each suspect re-measures inside its OWN probe bracket and retries
    // (bounded) until the bracket is quiet: contention here fluctuates
    // faster than a sweep (r15 observation — probe at floor, then 2.7×
    // floor two minutes later), so one pre-requalification quiet check
    // certifies nothing about the Nth suspect's reading. A reading whose
    // bracket was quiet is `certified` and enters the floor window even
    // when the sweep's run-level probes were hot.
    val requalNames = requalifyNeeded(
      results.map { case (n, (mn, _)) => n -> mn }, floors)
    val requalBudget = intEnv("SPARK_GRAFT_REQUAL_BUDGET_SEC", 600, 0)
    val requalDeadline = System.nanoTime() + requalBudget * 1000000000L
    var waitedRequal = 0
    val probeFloor = floors.get("__probe")
    val requalCertified = scala.collection.mutable.Map.empty[String, Double]
    val requal = requalNames.map { name =>
      var best = -1.0
      var certified = false
      var attempts = 0
      while (!certified && attempts < 3 &&
          (attempts == 0 || System.nanoTime() < requalDeadline)) {
        attempts += 1
        val (pb, w, _) = awaitQuiet(() => calibrationProbe(spark), probeFloor,
          budgetSec = math.min(60, quietBudget))
        waitedRequal += w
        val r = try timeQuery(once(name), math.max(2, warmRuns / 2))._1
        catch { case _: Throwable => -1.0 }
        val pa = calibrationProbe(spark)
        if (r > 0 && (best < 0 || r < best)) best = r
        certified = r > 0 && probeFloor.forall(pf => math.max(pb, pa) <= pf * 1.15)
      }
      if (certified && best > 0) requalCertified(name) = best
      name -> best
    }
    val requalMap = requal.toMap
    val qs = results.map { case (k, (mn, _)) => "\"" + k + f"\":$mn%.3f" }
      .mkString("{", ",", "}")
    val med = results.map { case (k, (_, md)) => "\"" + k + f"\":$md%.3f" }
      .mkString("{", ",", "}")
    val rq = requal.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val rqCert = requalCertified.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    // NaN (unreadable /proc/loadavg) must render as JSON null, not a
    // bare NaN token that breaks the one-line-JSON output contract
    def jnum(d: Double) = if (d.isNaN) "null" else f"$d%.2f"
    val cal = f""""calibration":{"probe_before_sec":$probeBefore%.3f,"probe_after_sec":$probeAfter%.3f,"load_avg_before":${jnum(loadBefore)},"load_avg_after":${jnum(loadAfter)},"runs_per_query":$warmRuns,"quiet_wait_before_sec":$waitedBefore,"quiet_wait_requal_sec":$waitedRequal}"""
    // the artifact judges itself: a contaminated run must never be
    // distinguishable from a clean one only by a human reading the
    // calibration block (round-11 lesson — see benchVerdict)
    val (benchValid, invalidReasons) = benchVerdict(probeBefore, probeAfter,
      floors.get("__probe"), requal,
      results.map { case (n, (mn, _)) => n -> mn }.toMap, floors)
    val gate = s""""bench_valid":$benchValid,"bench_invalid_reasons":[${
      invalidReasons.map("\"" + _ + "\"").mkString(",")}]"""
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"queries_median":$med,"requalified":$rq,"requalified_certified":$rqCert,$gate,"sf":"$sfDir",$cal}""")
    // floors ratchet only at the driver's bench scale — a subset run
    // (BENCH_ONLY) still updates just the queries it measured; a
    // requalified reading (measured after the contention the probe
    // evidenced) is eligible alongside the sweep reading
    if (sfDir.endsWith("sf0.1"))
      updateFloors(results.map { case (n, (mn, _)) =>
        n -> requalMap.get(n).filter(r => r > 0 && (mn <= 0 || r < mn)).getOrElse(mn)
      }, probeBefore, probeAfter,
        certified = requalCertified.toSeq.sortBy(_._1))
    spark.stop()
  }
}
