package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Bench's adjudication plumbing — the round-10 self-requalification
  * contract (a mid-sweep load spike must not read as a regression in
  * the recorded artifact) and the floors.json ↔ BENCHNOTES table sync
  * (the two can never drift because one write produces both).
  * Deterministic: the timing loop takes an injected runner, so the
  * "synthetic load" is a runner that returns contended readings during
  * the sweep and floor-level readings afterwards — the exact shape of
  * the BENCH_r09 artifact, minus the wall-clock.
  */
class BenchSpec extends AnyFunSuite {

  test("requalifyNeeded flags every >=1.5x-floor reading — quiet runs " +
      "included (the r12 q58 gap); sub-1.5x readings, failures, and " +
      "unknown queries never flag") {
    val floors = Map("q1" -> 0.10, "q2" -> 0.20, "q3" -> 0.50, "q4" -> 0.10)
    // the r12 what's-wrong #1 shape: q4 reads 1.6x its floor on a QUIET
    // run — it must now carry its own second reading, exactly as
    // contended runs always did
    val best = Seq("q1" -> 0.25, "q2" -> 0.35, "q3" -> -1.0,
      "q4" -> 0.16, "q9" -> 9.9)
    assert(Bench.requalifyNeeded(best, floors) == Seq("q1", "q2", "q4"))
    // under 1.5x never flags; no floors, nothing to compare
    assert(Bench.requalifyNeeded(Seq("q1" -> 0.149), floors).isEmpty)
    assert(Bench.requalifyNeeded(best, Map.empty).isEmpty)
  }

  test("synthetic load mid-sweep: the contended reading flags, the post-sweep " +
      "requalification measures at floor (the BENCH_r09 shape, corrected)") {
    val floor = 0.10
    // a runner that is CONTENDED for its first 6 calls (the sweep:
    // 1 warm-up + 5 measured), then quiet — burning threads mid-run,
    // modeled deterministically
    var calls = 0
    def runner(): Double = { calls += 1; if (calls <= 6) 0.31 else 0.101 }
    val (contendedBest, _) = Bench.timeQuery(() => runner(), warmRuns = 5)
    assert(contendedBest == 0.31)
    val flagged = Bench.requalifyNeeded(Seq("q" -> contendedBest),
      Map("q" -> floor))
    assert(flagged == Seq("q"))
    // the requalification runs AFTER the load subsided: at floor
    val (requal, _) = Bench.timeQuery(() => runner(), warmRuns = 2)
    assert(requal == 0.101 && requal < 1.1 * floor,
      "requalified reading must sit at the quiet floor")
  }

  test("benchVerdict: a synthetic hot probe flips bench_valid to false with a " +
      "named reason; a still-breaching requalified reading also invalidates; " +
      "a clean run stays valid") {
    val floors = Map("q1" -> 0.10, "q2" -> 0.20)
    // clean run: probes at floor, no requalifications → valid, no reasons
    val (okValid, okReasons) = Bench.benchVerdict(0.26, 0.27, Some(0.25),
      Nil, Map("q1" -> 0.11), floors)
    assert(okValid && okReasons.isEmpty)
    // hot probe AFTER the sweep (the BENCH_r11 shape: 1.325 s vs the
    // 0.251 s probe floor): invalid, and the reason names the probe
    val (hotValid, hotReasons) = Bench.benchVerdict(0.26, 1.325, Some(0.25),
      Nil, Map.empty, floors)
    assert(!hotValid && hotReasons.size == 1 &&
      hotReasons.head.startsWith("probe_after 1.325 >= 2x probe floor"))
    // quiet probes but a requalified reading STILL >=2x its floor
    // (BENCH_r11's q193: requalified 2.840 vs floor 0.933): invalid
    val (rqValid, rqReasons) = Bench.benchVerdict(0.26, 0.27, Some(0.25),
      Seq("q2" -> 0.55), Map("q2" -> 0.60), floors)
    assert(!rqValid && rqReasons ==
      Seq("q2 min(sweep 0.600, requal 0.550) 0.550 >= 2x floor 0.200"))
    // a requalified reading that CLEARED (under 2x floor) does not invalidate
    assert(Bench.benchVerdict(0.26, 0.27, Some(0.25),
      Seq("q2" -> 0.30), Map("q2" -> 0.60), floors)._1)
    // a requalification that reads WORSE than a sweep best already under
    // the gate cannot indict: regressions never produce fast readings, so
    // the run adjudicates on the MIN of its honest measurements (observed
    // live in round 15: q137 swept 0.175 then requalified 0.510 under
    // late-JVM GC pressure — floor 0.103, sweep under gate)
    assert(Bench.benchVerdict(0.26, 0.27, Some(0.25),
      Seq("q1" -> 0.51), Map("q1" -> 0.175), Map("q1" -> 0.103))._1)
    // ...but when BOTH readings breach, the query is genuinely suspect
    assert(!Bench.benchVerdict(0.26, 0.27, Some(0.25),
      Seq("q1" -> 0.51), Map("q1" -> 0.48), Map("q1" -> 0.103))._1)
    // a failed requalification run falls back to the sweep reading as evidence
    val (failValid, failReasons) = Bench.benchVerdict(0.26, 0.27, Some(0.25),
      Seq("q2" -> -1.0), Map("q2" -> 0.60), floors)
    assert(!failValid && failReasons.head.contains("requalify failed; sweep 0.600"))
    // no probe floor on record: probes unjudgeable, requal breaches still gate
    assert(Bench.benchVerdict(9.9, 9.9, None, Nil, Map.empty, floors)._1)
    assert(!Bench.benchVerdict(9.9, 9.9, None,
      Seq("q1" -> 0.95), Map.empty, floors)._1)
  }

  test("updateFloors writes floors.json and regenerates the BENCHNOTES table " +
      "in the same call — values cannot drift") {
    val dir = Files.createTempDirectory(Paths.get("target"), "benchspec")
    val prevCwd = System.getProperty("user.dir")
    // updateFloors writes relative paths; run it against a scratch cwd
    // copy by temporarily pointing the JVM's user.dir-independent
    // Paths at the temp dir via absolute-path helpers instead:
    val floorsPath = dir.resolve("floors.json")
    val notesPath = dir.resolve("BENCHNOTES.md")
    Files.write(notesPath,
      ("# notes\n\nintro prose\n\n" +
        "<!-- FLOORS_TABLE_BEGIN (old) -->\n| stale | table |\n" +
        "<!-- FLOORS_TABLE_END -->\n\ntrailing prose\n").getBytes("UTF-8"))
    // drive the pieces updateFloors composes, against explicit paths
    val merged = Map("qa_fast" -> 0.123, "qb_slow" -> 4.5, "__probe" -> 0.25)
    Bench.syncFloorsTable(merged, notesPath)
    val notes = new String(Files.readAllBytes(notesPath), "UTF-8")
    assert(notes.contains("| qa_fast | 0.123 |") && notes.contains("| qb_slow | 4.500 |"))
    assert(notes.contains("(probe floor: 0.250 s)"))
    assert(!notes.contains("| stale |"), "the old table block must be replaced")
    assert(notes.contains("intro prose") && notes.contains("trailing prose"),
      "prose around the markers must survive")
    assert(!notes.contains("__probe |"), "the probe rides its own line, not the table")
    // idempotent: a second sync with the same map is byte-identical
    Bench.syncFloorsTable(merged, notesPath)
    assert(new String(Files.readAllBytes(notesPath), "UTF-8") == notes)
    assert(prevCwd == System.getProperty("user.dir"))
    Files.deleteIfExists(floorsPath)
  }

  test("the probe floor never ratchets on DISAGREEING bracketing probes: a " +
      "lone anomalously-fast probe is a transient, not a floor (r13 live find)") {
    val dir = Files.createTempDirectory(Paths.get("target"), "benchspec-pf")
    val floors = dir.resolve("floors.json")
    val notes = dir.resolve("BENCHNOTES.md") // absent: sync is a no-op
    Files.write(floors, """{"__probe":0.214,"q1":0.100}""".getBytes("UTF-8"))
    // the observed shape: probe_before 0.182, probe_after 0.085 — they
    // disagree by >20%, so 0.085 must NOT become the floor (it would
    // make every subsequent honest ~0.2s probe read as >=2x and
    // self-invalidate the artifact)
    Bench.updateFloors(Seq("q1" -> 0.095), 0.182, 0.085, floors, notes)
    val after = Bench.readFloors(floors)
    assert(after("__probe") == 0.214, s"outlier ratchet: ${after("__probe")}")
    // the run still counts as quiet (min probe 0.085 <= 1.1x the kept
    // floor), so query floors may update
    assert(after("q1") == 0.095)
    // AGREEING probes ratchet as before
    Bench.updateFloors(Seq("q1" -> 0.200), 0.190, 0.200, floors, notes)
    assert(Bench.readFloors(floors)("__probe") == 0.190)
    // and a loaded run (agreeing but high probes) still cannot touch
    // query floors — only the unchanged probe floor is rewritten
    Bench.updateFloors(Seq("q1" -> 0.050), 0.500, 0.520, floors, notes)
    val loaded = Bench.readFloors(floors)
    assert(loaded("q1") == 0.095 && loaded("__probe") == 0.190)
  }

  test("rolling floor window: a lucky one-off floor expires after K quiet " +
      "readings, the legacy flat ledger migrates as a one-reading window, " +
      "and windows cap at floorWindowK (r13 what's-wrong #2)") {
    val dir = Files.createTempDirectory(Paths.get("target"), "benchspec-win")
    val floors = dir.resolve("floors.json")
    val notes = dir.resolve("BENCHNOTES.md") // absent: sync is a no-op
    // the r13 shape: q203's 0.178 was a single exceptionally-quiet
    // reading; every honest subsequent reading sits near 0.25
    Files.write(floors, """{"__probe":0.214,"q203":0.178}""".getBytes("UTF-8"))
    // legacy flat format migrates on read: one reading stamped 0
    assert(Bench.readLedger(floors) ==
      Map("__probe" -> Seq(0L -> 0.214), "q203" -> Seq(0L -> 0.178)))
    assert(Bench.readFloors(floors) == Map("__probe" -> 0.214, "q203" -> 0.178))
    val honest = Seq(0.251, 0.243, 0.258, 0.249, 0.246)
    honest.zipWithIndex.foreach { case (t, i) =>
      Bench.updateFloors(Seq("q203" -> t), 0.210, 0.215, floors, notes,
        nowMillis = 1000L + i)
    }
    val ledger = Bench.readLedger(floors)
    // five quiet readings later the lucky 0.178 has aged out of the
    // window (capped at floorWindowK) and the floor is the honest min
    assert(ledger("q203").size == Bench.floorWindowK)
    assert(ledger("q203").map(_._2) == honest)
    assert(Bench.readFloors(floors)("q203") == honest.min)
    // an honest 0.25 reading no longer carries invalidation risk...
    assert(Bench.requalifyNeeded(Seq("q203" -> 0.251),
      Bench.readFloors(floors)).isEmpty)
    // ...while a genuine 2x regression still trips the verdict gate
    val f = Bench.readFloors(floors)
    val (valid, reasons) = Bench.benchVerdict(0.210, 0.215, f.get("__probe"),
      Seq("q203" -> 0.55), Map("q203" -> 0.60), f)
    assert(!valid &&
      reasons.head.startsWith("q203 min(sweep 0.600, requal 0.550) 0.550 >= 2x floor"))
    // the probe window ages the same way and never exceeds the cap
    assert(ledger("__probe").size <= Bench.floorWindowK)
    assert(Bench.readFloors(floors)("__probe") == 0.210)
  }

  test("a loaded run's probes never enter the probe window (the floor cannot " +
      "drift up until loaded runs classify as quiet)") {
    val dir = Files.createTempDirectory(Paths.get("target"), "benchspec-load")
    val floors = dir.resolve("floors.json")
    val notes = dir.resolve("BENCHNOTES.md")
    Files.write(floors,
      """{"__probe":{"floor":0.200,"window":[[1,0.200]]}}""".getBytes("UTF-8"))
    // five agreeing-but-hot sweeps (>1.5x the probe floor): none enter
    (1 to 5).foreach { i =>
      Bench.updateFloors(Seq("q" -> 0.1), 0.500, 0.510, floors, notes,
        nowMillis = 2000L + i)
    }
    val ledger = Bench.readLedger(floors)
    assert(ledger("__probe") == Seq(1L -> 0.200),
      "hot probes must not enter the window")
    assert(!ledger.contains("q"), "a loaded run must not seed query floors")
    // the round-14 live find: ONE fast probe amid load (0.425/0.107 —
    // disagreeing, min under the floor) must not classify the run
    // quiet; under the old min-probe rule a contended q203 reading
    // entered the window and would later have aged honest floors out
    Bench.updateFloors(Seq("q" -> 0.410), 0.425, 0.107, floors, notes,
      nowMillis = 2500L)
    assert(!Bench.readLedger(floors).contains("q"),
      "a disagreeing-probe run must not seed query windows")
    // near-floor probe readings (<=1.5x) DO enter, so the window ages
    Bench.updateFloors(Seq("q" -> 0.1), 0.230, 0.240, floors, notes,
      nowMillis = 3000L)
    assert(Bench.readLedger(floors)("__probe").map(_._2) == Seq(0.200, 0.230))
  }

  test("the committed BENCHNOTES table agrees with the committed floors.json " +
      "(regression gate for the r9 drift)") {
    val floors = Bench.readFloors(Paths.get("floors.json"))
    assume(floors.nonEmpty, "no floors.json in cwd")
    val notes = new String(Files.readAllBytes(Paths.get("BENCHNOTES.md")), "UTF-8")
    val begin = notes.indexOf("<!-- FLOORS_TABLE_BEGIN")
    val end = notes.indexOf("<!-- FLOORS_TABLE_END -->")
    assert(begin >= 0 && end > begin, "BENCHNOTES must carry the generated table markers")
    val table = notes.substring(begin, end)
    val rows = """\| (q\S+) \| ([0-9.]+) \|""".r.findAllMatchIn(table)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    val fromFile = floors.view.filterKeys(_ != "__probe").toMap
      .map { case (k, v) => k -> (math.rint(v * 1000) / 1000) }
    assert(rows == fromFile,
      s"table and ledger drifted: only-in-table=${rows.keySet -- fromFile.keySet} " +
        s"only-in-file=${fromFile.keySet -- rows.keySet} " +
        s"diffs=${rows.collect { case (k, v) if fromFile.get(k).exists(_ != v) => k }}")
  }

  test("writeLedger is locale-pinned: a comma-decimal default locale still " +
      "writes dot decimals, so the ledger round-trips (r14 advice #3)") {
    val dir = Files.createTempDirectory(Paths.get("target"), "benchspec-loc")
    val floors = dir.resolve("floors.json")
    val ledger = Map("q1" -> Seq(10L -> 1234.178, 20L -> 0.251))
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.FRANCE) // 0,178 locale
      Bench.writeLedger(ledger, floors)
    } finally java.util.Locale.setDefault(saved)
    val txt = new String(Files.readAllBytes(floors), "UTF-8")
    assert(txt.contains("1234.178") && txt.contains("0.251"),
      s"dot decimals must survive a comma locale: $txt")
    assert(Bench.readLedger(floors) ==
      Map("q1" -> Seq(10L -> 1234.178, 20L -> 0.251)),
      "the comma-locale write must round-trip losslessly")
  }

  test("readLedger warns LOUDLY when a malformed entry is skipped instead of " +
      "silently erasing its floor history (r14 advice #3)") {
    val dir = Files.createTempDirectory(Paths.get("target"), "benchspec-mal")
    val floors = dir.resolve("floors.json")
    // q_bad hand-edited with whitespace the strict regex rejects
    Files.write(floors,
      ("""{"q_ok":{"floor":0.100,"window":[[1,0.100]]},""" + "\n" +
       """"q_bad": {"floor": 0.2, "window": [[2, 0.200]]}}""").getBytes("UTF-8"))
    val errBuf = new java.io.ByteArrayOutputStream()
    val savedErr = System.err
    val ledger = try {
      System.setErr(new java.io.PrintStream(errBuf, true, "UTF-8"))
      Bench.readLedger(floors)
    } finally System.setErr(savedErr)
    assert(ledger == Map("q_ok" -> Seq(1L -> 0.100)))
    val warned = errBuf.toString("UTF-8")
    assert(warned.contains("malformed") && warned.contains("SKIPPED"),
      s"skipping must be loud, stderr was: '$warned'")
  }

  test("awaitQuiet sleeps out a transient load spike and stops at the first " +
      "quiet probe; exhausts its budget under sustained load; accepts the " +
      "first probe when no floor exists (r13/r14 invalid-sweep fix)") {
    def scripted(readings: Double*): () => Double = {
      val it = readings.iterator
      () => if (it.hasNext) it.next() else readings.last
    }
    // transient spike: two hot probes, then quiet — returns the quiet one
    val (p1, _, tries1) = Bench.awaitQuiet(
      scripted(0.50, 0.45, 0.21), Some(0.20), budgetSec = 60, sleepMs = 1L)
    assert(p1 == 0.21 && tries1 == 3)
    // sustained load: the budget bounds the wait, last reading returned
    val (p2, _, tries2) = Bench.awaitQuiet(
      scripted(0.50), Some(0.20), budgetSec = 0, sleepMs = 1L)
    assert(p2 == 0.50 && tries2 == 1, "zero budget must probe exactly once")
    // no floor on record: nothing to judge against, first probe accepted
    val (p3, _, tries3) = Bench.awaitQuiet(
      scripted(0.50, 0.10), None, budgetSec = 60, sleepMs = 1L)
    assert(p3 == 0.50 && tries3 == 1)
    // already quiet: no sleep at all
    val (p4, _, tries4) = Bench.awaitQuiet(
      scripted(0.205), Some(0.20), budgetSec = 60, sleepMs = 1L)
    assert(p4 == 0.205 && tries4 == 1)
  }

  test("certified requalification readings enter the floor window even when " +
      "the sweep's run-level probes were hot — stale windows age on a busy " +
      "machine; min taken when both sweep and certified readings qualify") {
    val dir = Files.createTempDirectory(Paths.get("target"), "benchspec-cert")
    val floors = dir.resolve("floors.json")
    val notes = dir.resolve("BENCHNOTES.md")
    Files.write(floors,
      ("""{"__probe":{"floor":0.200,"window":[[1,0.200]]},""" +
       """"q":{"floor":0.100,"window":[[1,0.100]]}}""").getBytes("UTF-8"))
    // HOT run (probes 2.5x floor): the sweep reading must NOT enter,
    // but the certified requalification reading (own quiet bracket) must
    Bench.updateFloors(Seq("q" -> 0.900, "other" -> 0.500), 0.50, 0.52,
      floors, notes, nowMillis = 100L, certified = Seq("q" -> 0.240))
    val hot = Bench.readLedger(floors)
    assert(hot("q").map(_._2) == Seq(0.100, 0.240),
      s"certified reading must append under a hot run: ${hot("q")}")
    assert(!hot.contains("other"), "uncertified sweep readings stay out")
    assert(hot("__probe") == Seq(1L -> 0.200), "hot probes stay out")
    // QUIET run where the same query also has a certified reading: ONE
    // appended entry, the min of the two
    Bench.updateFloors(Seq("q" -> 0.260), 0.205, 0.210,
      floors, notes, nowMillis = 200L, certified = Seq("q" -> 0.230))
    assert(Bench.readLedger(floors)("q").map(_._2) == Seq(0.100, 0.240, 0.230))
    // a certified reading of a failed run (-1) never enters
    Bench.updateFloors(Nil, 0.50, 0.52, floors, notes, nowMillis = 300L,
      certified = Seq("q" -> -1.0))
    assert(Bench.readLedger(floors)("q").size == 3)
  }

  test("window admission cap: a reading above 3x the query's window floor " +
      "never enters — even probe-certified (BENCH_r15: q191 requalified at " +
      "9.459 s, 19x floor, inside a quiet CPU-probe bracket; memory-bandwidth " +
      "contention is invisible to the arithmetic probe). Honest 1-1.5x " +
      "readings still age stale floors; first readings always enter") {
    val dir = Files.createTempDirectory(Paths.get("target"), "benchspec-cap")
    val floors = dir.resolve("floors.json")
    val notes = dir.resolve("BENCHNOTES.md")
    Files.write(floors,
      ("""{"__probe":{"floor":0.200,"window":[[1,0.200]]},""" +
       """"q":{"floor":0.500,"window":[[1,0.500]]}}""").getBytes("UTF-8"))
    // the r15 shape: certified requal reading at 19x floor — rejected
    Bench.updateFloors(Nil, 0.205, 0.210, floors, notes, nowMillis = 100L,
      certified = Seq("q" -> 9.459))
    assert(Bench.readLedger(floors)("q").map(_._2) == Seq(0.500),
      "a 19x-floor reading must not enter the window")
    // quiet-sweep reading at 3.2x floor — also rejected (same cap: the
    // 2x verdict gate reports regressions; the floor never rises to meet one)
    Bench.updateFloors(Seq("q" -> 1.620), 0.205, 0.210, floors, notes,
      nowMillis = 150L)
    assert(Bench.readLedger(floors)("q").map(_._2) == Seq(0.500))
    // honest daily variance (1.4x) enters and can later age the floor out
    Bench.updateFloors(Seq("q" -> 0.700), 0.205, 0.210, floors, notes,
      nowMillis = 200L)
    assert(Bench.readLedger(floors)("q").map(_._2) == Seq(0.500, 0.700))
    // a query with NO window yet always admits its first reading
    Bench.updateFloors(Seq("fresh" -> 4.000), 0.205, 0.210, floors, notes,
      nowMillis = 300L)
    assert(Bench.readLedger(floors)("fresh").map(_._2) == Seq(4.000))
    // the cap keys on the WINDOW floor, not the all-time value: once the
    // lucky 0.500 ages out, the cap follows the honest window
    (1 to Bench.floorWindowK).foreach { i =>
      Bench.updateFloors(Seq("q" -> 0.700), 0.205, 0.210, floors, notes,
        nowMillis = 300L + i)
    }
    val aged = Bench.readLedger(floors)("q")
    assert(aged.map(_._2).forall(_ == 0.700) &&
      aged.size == Bench.floorWindowK,
      s"lucky floor must age out under the cap: $aged")
    Bench.updateFloors(Seq("q" -> 2.000), 0.205, 0.210, floors, notes,
      nowMillis = 400L)
    assert(Bench.readLedger(floors)("q").map(_._2).last == 2.000,
      "2.9x the aged floor is admissible once the window is honest")
  }
}
