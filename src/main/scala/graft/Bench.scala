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
    "q228_dsir_admission")  // selection-aware admission vs the maintained model (round 14)

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

  /** Serialize the ledger: one entry per line (git-diff-friendly),
    * each carrying its derived floor for human readers — the floor is
    * always recomputed from the window on read, so the two cannot
    * disagree.
    */
  /** Locale-pinned 3-decimal format: the default-locale `f"%.3f"`
    * interpolator writes comma decimals on comma-locale JVMs, which
    * [[readLedger]]'s regexes then silently drop — floors lost with
    * no error. Locale.ROOT makes the ledger byte-identical everywhere.
    */
  private def num3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

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
      nowMillis: Long = System.currentTimeMillis()): Unit = {
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
    val merged: Map[String, Seq[(Long, Double)]] =
      if (!quiet) base
      else results.foldLeft(base) {
        case (acc, (n, t)) if t > 0 => acc + (n -> append(acc.getOrElse(n, Nil), t))
        case (acc, _) => acc
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
      .map { case (k, v) => f"| $k | $v%.3f |" }.mkString("\n")
    val probeLine = floors.get("__probe")
      .map(p => f"\n(probe floor: $p%.3f s)\n").getOrElse("\n")
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
      val reading = if (r > 0) r else sweepBest.getOrElse(name, -1.0)
      floors.get(name).collect {
        case f if reading > 0 && reading >= 2.0 * f =>
          val tag = if (r > 0) "requalified" else "requalify failed; sweep"
          f"$name $tag $reading%.3f >= 2x floor $f%.3f"
      }
    }
    val reasons = probeReasons ++ requalReasons
    (reasons.isEmpty, reasons)
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
    val probeBefore = calibrationProbe(spark)
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
    // load spike cannot masquerade as a code regression in the artifact
    val floors = readFloors()
    val requal = requalifyNeeded(results.map { case (n, (mn, _)) => n -> mn },
      floors)
      .map { name =>
        name -> (try timeQuery(once(name), math.max(2, warmRuns / 2))._1
        catch { case _: Throwable => -1.0 })
      }
    val requalMap = requal.toMap
    val qs = results.map { case (k, (mn, _)) => "\"" + k + f"\":$mn%.3f" }
      .mkString("{", ",", "}")
    val med = results.map { case (k, (_, md)) => "\"" + k + f"\":$md%.3f" }
      .mkString("{", ",", "}")
    val rq = requal.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    // NaN (unreadable /proc/loadavg) must render as JSON null, not a
    // bare NaN token that breaks the one-line-JSON output contract
    def jnum(d: Double) = if (d.isNaN) "null" else f"$d%.2f"
    val cal = f""""calibration":{"probe_before_sec":$probeBefore%.3f,"probe_after_sec":$probeAfter%.3f,"load_avg_before":${jnum(loadBefore)},"load_avg_after":${jnum(loadAfter)},"runs_per_query":$warmRuns}"""
    // the artifact judges itself: a contaminated run must never be
    // distinguishable from a clean one only by a human reading the
    // calibration block (round-11 lesson — see benchVerdict)
    val (benchValid, invalidReasons) = benchVerdict(probeBefore, probeAfter,
      floors.get("__probe"), requal,
      results.map { case (n, (mn, _)) => n -> mn }.toMap, floors)
    val gate = s""""bench_valid":$benchValid,"bench_invalid_reasons":[${
      invalidReasons.map("\"" + _ + "\"").mkString(",")}]"""
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"queries_median":$med,"requalified":$rq,$gate,"sf":"$sfDir",$cal}""")
    // floors ratchet only at the driver's bench scale — a subset run
    // (BENCH_ONLY) still updates just the queries it measured; a
    // requalified reading (measured after the contention the probe
    // evidenced) is eligible alongside the sweep reading
    if (sfDir.endsWith("sf0.1"))
      updateFloors(results.map { case (n, (mn, _)) =>
        n -> requalMap.get(n).filter(r => r > 0 && (mn <= 0 || r < mn)).getOrElse(mn)
      }, probeBefore, probeAfter)
    spark.stop()
  }
}
