package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.functions._

import graft.query._
import graft.service.QueryService
import graft.service.QueryService._

/** Differential fuzzing of the REST service tier (r13 directive #4) —
  * the last surface that only had example-based coverage. Random
  * programs of CRUD + registered-query + admin + drift-gated-ingest
  * requests run against a LIVE socket endpoint pair (one writable and
  * tokened, one read-only) over a fresh GraphStore with a maintained
  * stats monitor bound, and every response is checked against a
  * driver-side model of the documented contracts:
  *
  *   - status taxonomy (rest.lisp:420-433): 400 malformed/unknown-name/
  *     bad-type/bad-param, 401 bad token, 403 write effect on a
  *     read-only endpoint, 404 unknown route / unattached artifact /
  *     unknown index / unknown reference, 409 OCC conflict AND gated-
  *     admission refusal, 200 otherwise;
  *   - write atomicity: a 409 (dup-id batch, refused gated batch)
  *     commits NOTHING — including the fresh ids sharing the batch
  *     with the conflicting one; a 200 commits EVERYTHING;
  *   - read-your-writes: the registered query tier serves the model's
  *     exact rows (ids, names, scores, ordered) after every few ops —
  *     the live-graph binding, mark-deleted filtering and recreate-
  *     after-delete semantics all land here;
  *   - monitoring without the write effect: /admin/drift and
  *     /admin/stats answer 200 on the READ-ONLY endpoint while every
  *     write verb behind it answers 403.
  *
  * The model is Spark-free: a Map[id -> (name, score)] plus the
  * tombstone and snapshot sets. Deterministic seeds; the failure
  * message names the program seed, op index and request for replay.
  * (The discipline that found the r11 Or-branch drop, the r12 drift
  * div-zero and the r13 rebuild crash — pointed at the service tier.
  * Writing it found one real defect before the first run: the delete
  * routes skipped label validation, so /mutate/delete/{unknown label}
  * escaped the 400 taxonomy — fixed in GraphStore.Txn alongside this
  * spec.)
  */
class ServiceFuzzSpec extends SparkSpec {

  private val Token = "fuzz-tok"

  private case class Harness(
      gs: graft.model.GraphStore,
      idx: graft.operators.MaintainedStatsIndex,
      wPort: Int, rPort: Int,
      stopAll: () => Unit)

  /** Fresh store (acct: id, name, score) + bound score monitor with a
    * pinned reference + the two endpoints. Seed corpus: 40 accts with
    * scores in bins 0-3 of the monitor's [0,100)x8 layout — bin 7
    * stays empty so a score-95 batch is a guaranteed drift breach.
    */
  private def freshHarness(): Harness = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "svcfuzz").toString
    val schema = graft.model.GraphSchema.builder()
      .vertex("acct", "id", Seq("name", "score"))
      .edge("rel", "acct", "acct").build()
    val gs = new graft.model.GraphStore(spark, schema, dir)
    val idx = new graft.operators.MaintainedStatsIndex(
      gs, "v_acct", "score", 0.0, 100.0, 8, dir)
    idx.rebuild(); idx.bind()
    gs.txn().createVertices("acct",
      (0L until 40L).map(i => (i, s"seed$i", i % 50)).toDF("id", "name", "score"))
      .commit()
    idx.snapshot("ref0")
    val svc = new QueryService(gs.graph(), maxLimit = 1000)
    svc.bindLiveGraph(() => gs.graph())
    svc.register(RegisteredQuery("accts",
      Seq(ParamSpec("min_score", "long", required = false, default = Some(-1L))),
      p => PatternQuery(
        goals = Seq(IsA("a", "acct"), Slot("a", "name", "n"), Slot("a", "score", "s"),
          Filter(col("s") >= lit(p("min_score").asInstanceOf[Long]))),
        select = Seq("a" -> "id", "n" -> "name", "s" -> "score"),
        orderBy = Seq(col("id")))))
    val writable = new graft.service.HttpEndpoint(svc, authToken = Some(Token),
      store = Some(gs), allowWrites = true, statsIndexes = Map("score_idx" -> idx))
    val readOnly = new graft.service.HttpEndpoint(svc, authToken = Some(Token),
      store = Some(gs), allowWrites = false, statsIndexes = Map("score_idx" -> idx))
    val wPort = writable.start()
    val rPort = readOnly.start()
    Harness(gs, idx, wPort, rPort, () => { writable.stop(); readOnly.stop() })
  }

  private lazy val client = HttpClient.newHttpClient()

  private def post(port: Int, path: String, body: String,
      token: String = Token, method: String = "POST"): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .header("X-Auth-Token", token)
    val req = (if (method == "POST") b.POST(HttpRequest.BodyPublishers.ofString(body))
      else b.GET()).build()
    client.send(req, HttpResponse.BodyHandlers.ofString())
  }

  /** Driver-side model: live rows, tombstoned ids, pinned snapshots. */
  private final class Model {
    val live = scala.collection.mutable.Map.empty[Long, (String, Long)]
    val dead = scala.collection.mutable.Set.empty[Long]
    val snapshots = scala.collection.mutable.Set[String]("ref0")
    var nextId: Long = 1000L
    def freshIds(k: Int): Seq[Long] = { val s = nextId; nextId += k; s until (s + k) }
    def seed(): Unit = (0L until 40L).foreach(i => live(i) = (s"seed$i", i % 50))
  }

  private def rowsJson(rows: Seq[(Long, String, Long)]): String =
    rows.map { case (i, n, sc) => s"""{"id":$i,"name":"$n","score":$sc}""" }
      .mkString("""{"rows":[""", ",", "]}")

  /** One fuzz op: build the request, predict the status from the model,
    * apply the model transition if the prediction is a success.
    * Returns (opName, port, path, body, predictedStatuses, after-check).
    */
  private def genOp(rnd: scala.util.Random, m: Model, h: Harness, opIdx: Int)
      : (String, Int, String, String, Set[Int], String) = {
    val w = h.wPort; val r = h.rPort
    def name(i: Long) = s"n${i}_${rnd.nextInt(100)}"
    rnd.nextInt(24) match {
      case 0 | 1 | 2 => // fresh create → 200, all land
        val ids = m.freshIds(1 + rnd.nextInt(4))
        val rows = ids.map(i => (i, name(i), rnd.nextInt(50).toLong))
        rows.foreach { case (i, n, sc) => m.live(i) = (n, sc); m.dead -= i }
        ("create_fresh", w, "/mutate/vertex/acct", rowsJson(rows), Set(200), "POST")
      case 3 => // batch containing a LIVE id → OCC 409, NOTHING lands
        if (m.live.isEmpty) genOp(rnd, m, h, opIdx)
        else {
          val dup = m.live.keys.toSeq(rnd.nextInt(m.live.size))
          val fresh = m.freshIds(2)
          val rows = fresh.map(i => (i, name(i), rnd.nextInt(50).toLong)) :+
            ((dup, "dup", 1L))
          ("create_dup_atomic", w, "/mutate/vertex/acct", rowsJson(rows), Set(409), "POST")
        }
      case 4 => // recreate a tombstoned id → 200 (rev succeeds the tombstone)
        if (m.dead.isEmpty) genOp(rnd, m, h, opIdx)
        else {
          val id = m.dead.toSeq(rnd.nextInt(m.dead.size))
          val n = name(id); val sc = rnd.nextInt(50).toLong
          m.live(id) = (n, sc); m.dead -= id
          ("recreate_deleted", w, "/mutate/vertex/acct",
            rowsJson(Seq((id, n, sc))), Set(200), "POST")
        }
      case 5 => // schema gate: unknown column → 400
        ("create_bad_column", w, "/mutate/vertex/acct",
          s"""{"rows":[{"id":${m.freshIds(1).head},"wat":1}]}""", Set(400), "POST")
      case 6 => // malformed / empty / missing rows → 400
        val (bn, body) = rnd.nextInt(3) match {
          case 0 => ("create_malformed", """{"rows": [}garbage""")
          case 1 => ("create_empty_rows", """{"rows":[]}""")
          case _ => ("create_no_rows", """{"nope":1}""")
        }
        (bn, w, "/mutate/vertex/acct", body, Set(400), "POST")
      case 7 => // write through the read-only endpoint → 403
        ("create_read_only", r, "/mutate/vertex/acct",
          rowsJson(Seq((m.freshIds(1).head, "x", 1L))), Set(403), "POST")
      case 8 => // bad auth token → 401 (either endpoint)
        ("bad_token", if (rnd.nextBoolean()) w else r, "/query/accts",
          "{}", Set(401), "POST:badtok")
      case 9 => // non-POST → 404 (method gate)
        ("get_method", w, "/query/accts", "", Set(404), "GET")
      case 10 => // delete LIVE ids → 200, mark-deleted
        if (m.live.isEmpty) genOp(rnd, m, h, opIdx)
        else {
          val ids = rnd.shuffle(m.live.keys.toSeq).take(1 + rnd.nextInt(3))
          ids.foreach { i => m.live -= i; m.dead += i }
          ("delete_live", w, "/mutate/delete/acct",
            s"""{"ids":[${ids.mkString(",")}]}""", Set(200), "POST")
        }
      case 11 => // delete ids that never existed → 200, no-op
        ("delete_missing", w, "/mutate/delete/acct",
          s"""{"ids":[${m.freshIds(2).mkString(",")}]}""", Set(200), "POST")
      case 12 => // taxonomy: unknown label 400, unknown route 404, no ids 400
        rnd.nextInt(3) match {
          case 0 => ("delete_unknown_label", w, "/mutate/delete/ghost",
            """{"ids":[1]}""", Set(400), "POST")
          case 1 => ("unknown_mutation", w, "/mutate/frobnicate/acct", "{}",
            Set(404), "POST")
          case _ => ("delete_no_ids", w, "/mutate/delete/acct", "{}",
            Set(400), "POST")
        }
      case 13 | 14 => // registered query: exact rows vs the model
        val min = rnd.nextInt(60) - 5
        ("query_verify:" + min, if (rnd.nextBoolean()) w else r, "/query/accts",
          s"""{"params":{"min_score":"$min"}}""", Set(200), "POST")
      case 15 => // query-tier 400s: unknown name / bad type / rogue param
        rnd.nextInt(3) match {
          case 0 => ("query_unknown", w, "/query/nope", "{}", Set(400), "POST")
          case 1 => ("query_bad_type", w, "/query/accts",
            """{"params":{"min_score":"abc"}}""", Set(400), "POST")
          case _ => ("query_rogue_param", w, "/query/accts",
            """{"params":{"rogue":"1"}}""", Set(400), "POST")
        }
      case 16 => // ad-hoc pattern: count matches the model / malformed 400
        if (rnd.nextBoolean())
          ("pattern_verify", if (rnd.nextBoolean()) w else r, "/pattern",
            """{"match":[{"vertex":"a","type":"acct"}],"select":["a"]}""",
            Set(200), "POST")
        else ("pattern_malformed", w, "/pattern", "][ not json", Set(400), "POST")
      case 17 => // vacuum: live state unaffected; keep<1 → 400; read-only → 403
        rnd.nextInt(3) match {
          case 0 => ("vacuum_ok", w, "/admin/vacuum",
            s"""{"label":"acct","keep":${1 + rnd.nextInt(3)}}""", Set(200), "POST")
          case 1 => ("vacuum_bad_keep", w, "/admin/vacuum",
            """{"label":"acct","keep":0}""", Set(400), "POST")
          case _ => ("vacuum_read_only", r, "/admin/vacuum",
            """{"label":"acct","keep":1}""", Set(403), "POST")
        }
      case 18 => // admin taxonomy: unknown verb 404 (writable) / 403 (read-only,
        // the effects gate answers before routing); unattached artifact 404
        rnd.nextInt(3) match {
          case 0 => ("admin_unknown", w, "/admin/frob", "{}", Set(404), "POST")
          case 1 => ("admin_unknown_ro", r, "/admin/frob", "{}", Set(403), "POST")
          case _ => ("admin_no_catalog", w, "/admin/regenerate", "{}", Set(404), "POST")
        }
      case 19 => // stats + drift are read-only telemetry: 200 on BOTH endpoints
        if (rnd.nextBoolean())
          ("stats_ro", if (rnd.nextBoolean()) w else r, "/admin/stats", "",
            Set(200), "POST")
        else {
          val ref = m.snapshots.toSeq.sorted.apply(rnd.nextInt(m.snapshots.size))
          ("drift_ro", if (rnd.nextBoolean()) w else r, "/admin/drift",
            s"""{"index":"score_idx","ref":"$ref"}""", Set(200), "POST")
        }
      case 20 => // drift taxonomy: unknown index/ref 404, group-on-unstratified 400
        rnd.nextInt(3) match {
          case 0 => ("drift_unknown_index", w, "/admin/drift",
            """{"index":"nope","ref":"ref0"}""", Set(404), "POST")
          case 1 => ("drift_unknown_ref", w, "/admin/drift",
            """{"index":"score_idx","ref":"nope"}""", Set(404), "POST")
          case _ => ("drift_group_unstratified", w, "/admin/drift",
            """{"index":"score_idx","ref":"ref0","group":"en"}""", Set(400), "POST")
        }
      case 21 => // pin a new reference; snapshot on read-only endpoint → 403
        if (rnd.nextBoolean()) {
          val nm = s"s$opIdx"
          m.snapshots += nm
          ("snapshot_ok", w, "/admin/snapshot_stats",
            s"""{"index":"score_idx","name":"$nm"}""", Set(200), "POST")
        } else ("snapshot_read_only", r, "/admin/snapshot_stats",
          """{"index":"score_idx","name":"x"}""", Set(403), "POST")
      case 22 => // gated ingest, deterministic extremes: a huge limit always
        // admits; a zero limit refuses a batch aimed at the empty bin 7
        // (PSI strictly positive) and commits NOTHING
        if (rnd.nextBoolean()) {
          val ids = m.freshIds(1 + rnd.nextInt(3))
          val rows = ids.map(i => (i, name(i), rnd.nextInt(50).toLong))
          rows.foreach { case (i, n, sc) => m.live(i) = (n, sc) }
          ("gate_admit", w, "/mutate/vertex/acct",
            rowsJson(rows).dropRight(1) +
              ""","gate":{"index":"score_idx","ref":"ref0","psi_limit_ppm":1000000000}}""",
            Set(200), "POST")
        } else {
          val ids = m.freshIds(12)
          val rows = ids.map(i => (i, name(i), 95L))
          ("gate_refuse", w, "/mutate/vertex/acct",
            rowsJson(rows).dropRight(1) +
              ""","gate":{"index":"score_idx","ref":"ref0","psi_limit_ppm":0}}""",
            Set(409), "POST")
        }
      case _ => // gate taxonomy: unknown index/ref 404, missing field 400
        rnd.nextInt(3) match {
          case 0 => ("gate_unknown_index", w, "/mutate/vertex/acct",
            rowsJson(Seq((m.freshIds(1).head, "x", 1L))).dropRight(1) +
              ""","gate":{"index":"nope","ref":"ref0","psi_limit_ppm":1}}""",
            Set(404), "POST")
          case 1 => ("gate_unknown_ref", w, "/mutate/vertex/acct",
            rowsJson(Seq((m.freshIds(1).head, "x", 1L))).dropRight(1) +
              ""","gate":{"index":"score_idx","ref":"nope","psi_limit_ppm":1}}""",
            Set(404), "POST")
          case _ => ("gate_missing_field", w, "/mutate/vertex/acct",
            rowsJson(Seq((m.freshIds(1).head, "x", 1L))).dropRight(1) +
              ""","gate":{"index":"score_idx"}}""", Set(400), "POST")
        }
    }
  }

  /** Parse the /query/accts array response into (id, name, score). */
  private def parseRows(body: String): Seq[(Long, String, Long)] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(body)
    (0 until root.size()).map { i =>
      val r = root.get(i)
      (r.get("id").asLong(), r.get("name").asText(), r.get("score").asLong())
    }
  }

  private def verifyState(h: Harness, m: Model, ctx: String): Unit = {
    val resp = post(h.wPort, "/query/accts", """{"params":{"min_score":"-1"}}""")
    assert(resp.statusCode() == 200, s"$ctx verify status ${resp.statusCode()}")
    val got = parseRows(resp.body())
    val want = m.live.toSeq.map { case (i, (n, s)) => (i, n, s) }.sortBy(_._1)
    assert(got == want,
      s"$ctx state drift: got ${got.size} rows, want ${want.size}; " +
        s"only-got=${(got.toSet -- want.toSet).take(5)} " +
        s"only-want=${(want.toSet -- got.toSet).take(5)}")
  }

  test("50+ random REST programs hold the documented status/effect/atomicity " +
      "contracts against a driver-side model (r13 directive #4)") {
    val programs = sys.env.get("GRAFT_FUZZ_PROGRAMS").map(_.toInt).getOrElse(52)
    val opsPer = 12
    var totalOps = 0
    (0 until programs).foreach { p =>
      val seed = 4100 + p
      val rnd = new scala.util.Random(seed)
      val h = freshHarness()
      try {
        val m = new Model
        m.seed()
        (0 until opsPer).foreach { k =>
          val (op, port, path, body, expect, method) = genOp(rnd, m, h, k)
          val resp =
            if (method == "GET") post(port, path, body, method = "GET")
            else if (method == "POST:badtok") post(port, path, body, token = "WRONG")
            else post(port, path, body)
          val ctx = s"[seed=$seed op#$k $op $path body=${body.take(120)}]"
          assert(expect(resp.statusCode()),
            s"$ctx expected $expect got ${resp.statusCode()}: ${resp.body().take(300)}")
          // content checks for the verifying reads
          if (op.startsWith("query_verify:")) {
            val min = op.stripPrefix("query_verify:").toLong
            val want = m.live.toSeq.collect {
              case (i, (n, s)) if s >= min => (i, n, s)
            }.sortBy(_._1)
            assert(parseRows(resp.body()) == want, s"$ctx query rows drifted")
          }
          if (op == "pattern_verify")
            assert(resp.body().count(_ == '{') == m.live.size,
              s"$ctx pattern row count != model (${m.live.size})")
          if (op == "gate_refuse")
            assert(resp.body().contains("drift gate"), s"$ctx refusal must say why")
          totalOps += 1
          if (k % 4 == 3) verifyState(h, m, ctx)
        }
        verifyState(h, m, s"[seed=$seed end]")
      } finally h.stopAll()
    }
    info(s"$programs programs, $totalOps ops, all contracts held")
  }

  test("REST program interleaved with CONCURRENT direct commits: taxonomy " +
      "holds, every 200-create's rows land, every 409/4xx batch's rows " +
      "don't (disjoint id ranges make each op's outcome checkable)") {
    import spark.implicits._
    val h = freshHarness()
    try {
      val rnd = new scala.util.Random(9000)
      // background committer: direct engine commits racing the REST ops
      // (ids 100000+), plus periodic vacuums — the compaction storm
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val bgErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val bg = new Thread(() => {
        var i = 0L
        try while (!stop.get() && i < 10000) {
          h.gs.txn().createVertices("acct",
            Seq((100000L + i, s"bg$i", (i % 50))).toDF("id", "name", "score"))
            .commit()
          if (i % 5 == 4) h.gs.store.vacuum("v_acct", 2)
          i += 1
        } catch { case t: Throwable => if (!stop.get()) bgErr.set(t) }
      }, "svcfuzz-bg")
      bg.start()
      val landed = scala.collection.mutable.Set.empty[Long]
      val refused = scala.collection.mutable.Set.empty[Long]
      var next = 5000L
      (0 until 40).foreach { k =>
        def fresh(n: Int): Seq[Long] = { val s = next; next += n; s until (s + n) }
        rnd.nextInt(4) match {
          case 0 => // plain create under concurrency → 200 (ids disjoint)
            val ids = fresh(3)
            val resp = post(h.wPort, "/mutate/vertex/acct",
              rowsJson(ids.map(i => (i, s"c$i", (i % 50)))))
            assert(resp.statusCode() == 200, s"op#$k create: ${resp.body().take(200)}")
            landed ++= ids
          case 1 => // gated admit under concurrency → 200
            val ids = fresh(2)
            val resp = post(h.wPort, "/mutate/vertex/acct",
              rowsJson(ids.map(i => (i, s"g$i", (i % 50)))).dropRight(1) +
                ""","gate":{"index":"score_idx","ref":"ref0","psi_limit_ppm":1000000000}}""")
            assert(resp.statusCode() == 200, s"op#$k gate_admit: ${resp.body().take(200)}")
            landed ++= ids
          case 2 => // gated refuse under concurrency → 409, nothing lands
            val ids = fresh(12)
            val resp = post(h.wPort, "/mutate/vertex/acct",
              rowsJson(ids.map(i => (i, s"r$i", 95L))).dropRight(1) +
                ""","gate":{"index":"score_idx","ref":"ref0","psi_limit_ppm":0}}""")
            assert(resp.statusCode() == 409, s"op#$k gate_refuse: ${resp.body().take(200)}")
            refused ++= ids
          case _ => // reads stay healthy mid-storm
            val resp = post(h.rPort, "/admin/drift",
              """{"index":"score_idx","ref":"ref0"}""")
            assert(resp.statusCode() == 200, s"op#$k drift: ${resp.body().take(200)}")
        }
      }
      stop.set(true); bg.join(60000)
      assert(bgErr.get() == null, s"background committer died: ${bgErr.get()}")
      val live = h.gs.store.read("v_acct").filter(!col("deleted"))
        .select("id").collect().map(_.getLong(0)).toSet
      assert(landed.forall(live), s"200-created ids missing: ${(landed -- live).take(5)}")
      assert(refused.forall(i => !live(i)),
        s"409-refused ids present: ${refused.filter(live).take(5)}")
    } finally h.stopAll()
  }
}
