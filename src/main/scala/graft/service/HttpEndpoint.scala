package graft.service

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** REST façade over [[QueryService]] — the transport tier of the
  * reference's REST API (reference rest.lisp:620-763 CRUD+query
  * routes; 203-211 auth; 101-147 row→JSON).
  *
  * Routes:
  *   - `POST /query/{name}`  body `{"params": {"k": "v"}}` → JSON rows
  *     (registered-query tier)
  *   - `POST /pattern`       body = the JSON pattern DSL → JSON rows;
  *     `?stream=1` → ndjson, one row per line (the :callback contract)
  *
  * Status mapping (rest.lisp:420-433): BadRequest → 400, Forbidden →
  * 403, bad token → 401, unknown route → 404, other errors → 500.
  *
  * Uses the JDK's built-in HttpServer — the transport is deliberately
  * minimal; the engine-facing semantics live in QueryService.
  */
final class HttpEndpoint(
    service: QueryService,
    authToken: Option[String] = None,
    /** write tier: CRUD routes exist only when a store is supplied AND
      * writes are allowed (the :effects gate, rest.lisp:402-411) */
    store: Option[graft.model.GraphStore] = None,
    allowWrites: Boolean = false,
    /** admin tier: maintenance verbs exist only when the artifact they
      * operate on is attached (and writes are allowed) */
    views: Option[graft.views.ViewCatalog] = None,
    replicator: Option[graft.model.Replicator] = None,
    /** maintained-index roots (GenDirs layouts) to include in
      * `/admin/stats` — LSH / posting / ANN / dhash / cell stores live
      * under caller-chosen dirs the endpoint cannot discover itself */
    indexDirs: Map[String, String] = Map.empty,
    /** opt-in unattended maintenance: a [[graft.model.Maintenance]]
      * daemon whose lifecycle is BOUND to the endpoint's — started by
      * [[start]], stopped by [[stop]] — so a serving process compacts
      * its breached stores without any admin call, the way the
      * reference's epoch reaper runs with the graph rather than on
      * request (transactions.lisp:408-599). Its per-target
      * last-compaction marks and swallowed errors surface through
      * `/admin/stats` (an unattended actor whose failures are
      * invisible is worse than no actor). The one-pass
      * `/admin/maintain` verb remains the cron/manual tier for
      * processes that opt out. */
    maintenance: Option[graft.model.Maintenance] = None,
    /** commit-maintained statistics (MaintainedStatsIndex) to expose as
      * the drift-monitor tier: `POST /admin/snapshot_stats` pins a
      * reference, `POST /admin/drift` answers "did the corpus shift
      * since that reference?" from O(nBins) maintained rows — the
      * dashboard tick that must never cost a corpus scan — and
      * `POST /mutate/vertex/{label}` accepts an optional `"gate"`
      * field routing the create through the named monitor's
      * drift-gated admission (409 on breach, nothing committed; the
      * monitor's own store must be this endpoint's). Their layout
      * roots belong in `indexDirs` too for footprint telemetry. */
    statsIndexes: Map[String, graft.operators.MaintainedStatsIndex] = Map.empty) {

  private var server: HttpServer = _

  /** Read-op telemetry (stats.lisp:99-105 record-graph-read): one
    * tick per served query request. Package-visible so specs can pin
    * ring behavior against an injected clock via [[ReadStats]]
    * directly; the endpoint always uses wall-clock seconds.
    */
  private val readStats = new ReadStats()

  private var pool: java.util.concurrent.ExecutorService = _
  private var queryGate: java.util.concurrent.Semaphore = _
  private var querySlots: Int = 0
  // admission-control telemetry: how often saturation turned callers
  // away — the number an operator reads BEFORE raising the slot count
  private val rejected429 = new java.util.concurrent.atomic.AtomicLong

  /** Serve on a BOUNDED worker pool with query admission control — the
    * reference serves each REST request on a pooled connection thread
    * with a hard worker cap (its server's taskmaster discipline);
    * the JDK server's default executor would instead run every handler
    * on the single dispatcher thread, where one slow ndjson consumer
    * blocks stats/admin polls outright. Query routes (`/query/...`,
    * `/pattern`) additionally pass a `maxConcurrentQueries` semaphore:
    * each one drives Spark jobs on a shared driver, so unbounded
    * admission turns a request burst into driver-scheduler collapse —
    * saturated admission answers 429 + Retry-After immediately instead
    * of queueing invisibly. `maxConcurrentQueries < workerThreads`
    * keeps admin/mutate lanes responsive while every query slot is
    * held (monitoring a saturated server is exactly when stats matter).
    */
  def start(port: Int = 0, workerThreads: Int = 8,
      maxConcurrentQueries: Int = 4): Int = {
    require(workerThreads >= 2, s"need >= 2 worker threads, got $workerThreads")
    require(maxConcurrentQueries >= 1 && maxConcurrentQueries < workerThreads,
      s"need 1 <= maxConcurrentQueries ($maxConcurrentQueries) < workerThreads " +
        s"($workerThreads) so admin lanes survive query saturation")
    queryGate = new java.util.concurrent.Semaphore(maxConcurrentQueries, true)
    querySlots = maxConcurrentQueries
    val n = new java.util.concurrent.atomic.AtomicInteger
    pool = java.util.concurrent.Executors.newFixedThreadPool(workerThreads,
      (r: Runnable) => {
        val t = new Thread(r, s"graft-http-${n.incrementAndGet()}")
        t.setDaemon(true)
        t
      })
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/", handle _)
    server.setExecutor(pool)
    server.start()
    maintenance.foreach(_.start()) // serve ⇒ the unattended compactor runs too
    server.getAddress.getPort
  }

  def stop(): Unit = {
    maintenance.foreach(_.stop()) // before the pool: a mid-compact publish finishes or is swept, never orphaned mid-serve
    if (server != null) server.stop(0)
    if (pool != null) { pool.shutdownNow(); () }
  }

  private def handle(ex: HttpExchange): Unit =
    try route(ex)
    catch {
      case e: QueryService.BadRequestException => reply(ex, 400, err(e.getMessage))
      case e: QueryService.ForbiddenException => reply(ex, 403, err(e.getMessage))
      case e: IllegalArgumentException => reply(ex, 400, err(e.getMessage))
      case e: RuntimeException if e.getClass.getSimpleName == "ConflictException" =>
        reply(ex, 409, err(e.getMessage))
      case _: HttpEndpoint.MidStreamFailure => () // 200 already committed; in-band marker sent
      case e: Throwable => reply(ex, 500, err(e.getMessage))
    } finally ex.close()

  private def route(ex: HttpExchange): Unit = {
    if (authToken.exists(t => ex.getRequestHeaders.getFirst("X-Auth-Token") != t)) {
      reply(ex, 401, err("missing or invalid auth token")); return
    }
    if (ex.getRequestMethod != "POST") { reply(ex, 404, err("POST only")); return }
    val path = ex.getRequestURI.getPath
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val stream = Option(ex.getRequestURI.getQuery).exists(_.contains("stream=1"))

    path match {
      case p if p.startsWith("/query/") || p == "/pattern" =>
        if (!queryGate.tryAcquire()) {
          // admission, not queueing: the caller learns NOW that every
          // query slot is held and retries with backoff
          rejected429.incrementAndGet()
          ex.getResponseHeaders.set("Retry-After", "1")
          reply(ex, 429, err("query concurrency limit reached, retry"))
        } else try {
          readStats.record() // read op = a served query request (stats.lisp:99)
          val df =
            if (p == "/pattern") service.runAdHoc(body)
            else service.runRegistered(p.stripPrefix("/query/"), parseParams(body))
          respondRows(ex, df, stream)
        } finally queryGate.release()
      case p if p.startsWith("/mutate/") =>
        withReadRaceRetry(mutate(ex, p.stripPrefix("/mutate/"), body))
      case p if p.startsWith("/admin/") =>
        admin(ex, p.stripPrefix("/admin/"), body)
      case _ => reply(ex, 404, err(s"no such route: $path"))
    }
  }

  /** CRUD tier (rest.lisp:620-763): POST /mutate/{vertex|delete}/{label}
    * with `{"rows":[{...}]}` / `{"ids":[...]}`. Each request is one
    * atomic transaction; OCC conflicts surface as 409.
    */
  /** Parse a request body to a JSON tree; malformed input → 400. A
    * blank body is an empty object when `blankOk` (routes where every
    * field is optional), a 400 otherwise.
    */
  private def parseBody(body: String, blankOk: Boolean = false): com.fasterxml.jackson.databind.JsonNode = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    if (body.isBlank) {
      if (blankOk) return mapper.createObjectNode()
      throw new QueryService.BadRequestException("malformed JSON body: empty")
    }
    try mapper.readTree(body)
    catch { case e: Exception =>
      throw new QueryService.BadRequestException(s"malformed JSON body: ${e.getMessage}") }
  }

  /** A path-based parquet read captures its file listing when the plan
    * is built; a mutate request's LOCK-FREE pre-commit reads (schema
    * conformance, drift-gate admission) can therefore race a
    * concurrent vacuum's table-dir swap and die with a
    * FileNotFoundException-rooted SparkException — a purely TRANSIENT
    * condition (re-planning re-lists the live files). Retry the op a
    * bounded number of times on exactly that signature. Safe by
    * construction: every exception a mutate can throw before its reply
    * proves NOTHING durable happened — commit() returns (no throw)
    * once the epoch pointer lands — except CommitHookException, which
    * IS durable and is never retried. Staging itself is side-effect-
    * free (rev-derivation plans are thunks built under the commit
    * lock).
    */
  private def isReadRace(t: Throwable): Boolean =
    t != null && (t.isInstanceOf[java.io.FileNotFoundException] ||
      isReadRace(t.getCause))
  private def withReadRaceRetry(body: => Unit): Unit = {
    var attempts = 0
    var done = false
    while (!done) {
      try { body; done = true }
      catch {
        case e: graft.model.GraphStore#CommitHookException => throw e
        case e: Throwable if attempts < 2 && isReadRace(e) => attempts += 1
      }
    }
  }

  private def mutate(ex: HttpExchange, op: String, body: String): Unit = {
    val gs = store.filter(_ => allowWrites).getOrElse {
      reply(ex, 403, err("write effect not allowed on this endpoint")); return
    }
    val root = parseBody(body)
    val spark = gs.spark
    import spark.implicits._
    op.split("/", 2) match {
      case Array("vertex", label) =>
        val rowsNode = Option(root.get("rows")).filter(_.isArray).getOrElse(
          throw new QueryService.BadRequestException("'rows' array required"))
        val lines = (0 until rowsNode.size()).map(i => rowsNode.get(i).toString)
        if (lines.isEmpty) throw new QueryService.BadRequestException("'rows' is empty")
        val df = spark.read.json(spark.createDataset(lines))
        // schema gate: unknown columns / wrong types → 400, never an
        // appended conflicting parquet schema (ADVICE r1)
        val conformed =
          try gs.conformVertices(label, df)
          catch { case e: IllegalArgumentException =>
            throw new QueryService.BadRequestException(e.getMessage) }
        // optional drift-gated admission: {"gate": {"index": n, "ref":
        // r, "psi_limit_ppm": L}} routes the create through the named
        // maintained monitor's gatedCreate — a breach surfaces as the
        // OCC 409 (ConflictException) and commits NOTHING, per-stratum
        // on a stratified monitor
        val epoch = Option(root.get("gate")).filterNot(_.isNull) match {
          case None => gs.txn().createVertices(label, conformed).commit()
          case Some(g) =>
            def gf(k: String) = Option(g.get(k)).filterNot(_.isNull).getOrElse(
              throw new QueryService.BadRequestException(s"gate.'$k' required"))
            val idxName = gf("index").asText()
            val refName = gf("ref").asText()
            val limit = gf("psi_limit_ppm").asLong()
            val idx = statsIndexes.getOrElse(idxName, {
              reply(ex, 404, err(s"no such stats index: $idxName")); return })
            if (!idx.hasSnapshot(refName)) {
              reply(ex, 404, err(s"no such reference snapshot: $refName")); return }
            idx.gatedCreate(label, conformed, refName, limit)
        }
        reply(ex, 200, s"""{"epoch": $epoch, "created": ${lines.size}}""")
      case Array("edge", label) =>
        val rowsNode = Option(root.get("rows")).filter(_.isArray).getOrElse(
          throw new QueryService.BadRequestException("'rows' array required"))
        val lines = (0 until rowsNode.size()).map(i => rowsNode.get(i).toString)
        if (lines.isEmpty) throw new QueryService.BadRequestException("'rows' is empty")
        val df = spark.read.json(spark.createDataset(lines))
        val conformed =
          try gs.conformEdges(label, df)
          catch { case e: IllegalArgumentException =>
            throw new QueryService.BadRequestException(e.getMessage) }
        val epoch = gs.txn().createEdges(label, conformed).commit()
        reply(ex, 200, s"""{"epoch": $epoch, "created": ${lines.size}}""")
      case Array("delete", label) =>
        val idsNode = Option(root.get("ids")).filter(_.isArray).getOrElse(
          throw new QueryService.BadRequestException("'ids' array required"))
        val ids = (0 until idsNode.size()).map(i => idsNode.get(i).asLong()).toDF("id")
        val epoch = gs.txn().deleteVertices(label, ids).commit()
        reply(ex, 200, s"""{"epoch": $epoch}""")
      case Array("delete_edge", label) =>
        val idsNode = Option(root.get("ids")).filter(_.isArray).getOrElse(
          throw new QueryService.BadRequestException("'ids' array required"))
        val ids = (0 until idsNode.size()).map(i => idsNode.get(i).asLong()).toDF("id")
        val epoch = gs.txn().deleteEdges(label, ids).commit()
        reply(ex, 200, s"""{"epoch": $epoch}""")
      case other =>
        reply(ex, 404, err(s"no such mutation route: ${other.mkString("/")}"))
    }
  }

  /** Maintenance tier, gated by the same write-effects policy as
    * /mutate (the operational verbs the reference exposes through its
    * admin REPL — regenerate-view views.lisp:487, snapshot/vacuum
    * schema.lisp:49 keep-revisions, slave catch-up
    * transaction-streaming.lisp:141):
    *   - `POST /admin/regenerate` `{"view": "name"}` (omit view → all)
    *   - `POST /admin/sync`       replica catch-up → new epoch
    *   - `POST /admin/vacuum`     `{"label": "customer", "keep": 2}`
    *   - `POST /admin/compact`    `{"label": "customer"}` current-index
    */
  private def admin(ex: HttpExchange, op: String, body: String): Unit = {
    // stats/chart are READ-ONLY telemetry (the reference's graph-stats
    // report + chart dashboard, stats.lisp:51 / chart.lisp) —
    // monitoring must not require the write effect; they stay behind
    // the auth token like all routes
    if (op == "stats") { stats(ex, body); return }
    if (op == "chart") { chart(ex, body); return }
    if (op == "drift") { drift(ex, body); return } // read-only monitor tier
    if (!allowWrites) {
      reply(ex, 403, err("write effect not allowed on this endpoint")); return
    }
    val root = parseBody(body, blankOk = true)
    def field(k: String): Option[String] =
      Option(root.get(k)).filterNot(_.isNull).map(_.asText())
    op match {
      case "regenerate" =>
        val vc = views.getOrElse {
          reply(ex, 404, err("no view catalog attached")); return }
        val targets = field("view").map(Seq(_)).getOrElse(vc.names)
        targets.foreach(vc.regenerate(_))
        reply(ex, 200, s"""{"regenerated": [${targets.map("\"" + _ + "\"").mkString(",")}]}""")
      case "sync" =>
        val r = replicator.getOrElse {
          reply(ex, 404, err("no replicator attached")); return }
        val epoch = r.sync()
        reply(ex, 200, s"""{"epoch": $epoch}""")
      case "vacuum" =>
        val gs = store.getOrElse { reply(ex, 404, err("no store attached")); return }
        val label = field("label").getOrElse(
          throw new QueryService.BadRequestException("'label' required"))
        val keep = field("keep").map(_.toInt).getOrElse(1)
        if (keep < 1) throw new QueryService.BadRequestException("'keep' must be >= 1")
        gs.store.vacuum(gs.tableFor(label), keep)
        reply(ex, 200, s"""{"vacuumed": "$label", "keep": $keep}""")
      case "maintain" =>
        // one threshold-driven maintenance pass (Maintenance.runOnce)
        // over everything this endpoint can see: attached views plus
        // the registered index roots. The thresholds default to the
        // daemon's and accept overrides, and the reply names exactly
        // what compacted — the same layoutStats the stats route
        // reports, so operators can predict the action before sending
        // it. (Long-lived processes run the Maintenance daemon
        // in-process; this verb is the cron/manual tier.)
        def num(k: String, dflt: Long): Long =
          field(k).map(_.toLong).getOrElse(dflt)
        val eHigh = num("delta_epochs_high", 64L)
        val bHigh = num("delta_bytes_high", 256L << 20)
        // registered index roots are REPORTED as due, not compacted:
        // each rebuild thunk lives with its typed index object, which
        // only the owning process holds (the in-process Maintenance
        // daemon is the tier that acts on these). Dueness is observed
        // BEFORE the view pass — the report reflects request-time state
        val indexDue = indexDirs.toSeq.sortBy(_._1).collect {
          case (n, p) if {
            val s = graft.model.GenDirs.layoutStats(java.nio.file.Paths.get(p))
            s.deltaEpochs >= eHigh || s.deltaBytes >= bHigh
          } => s"index:$n"
        }
        val m = new graft.model.Maintenance(
          views.map(graft.model.Maintenance.forViews).getOrElse(Nil),
          deltaEpochsHigh = eHigh, deltaBytesHigh = bHigh)
        val compacted = m.runOnce()
        reply(ex, 200,
          s"""{"compacted": [${compacted.map("\"" + _ + "\"").mkString(",")}], """ +
            s""""index_due": [${indexDue.map("\"" + _ + "\"").mkString(",")}]}""")
      case "backup" =>
        // incremental backup (Backup.incremental): dump the commit-log
        // slice since the chain's high-water epoch into {"root": dir} —
        // repeated calls are the reference's cron'd backup verb, cost
        // proportional to writes since the last call
        val gs = store.getOrElse { reply(ex, 404, err("no store attached")); return }
        val backupRoot = field("root").getOrElse(
          throw new QueryService.BadRequestException("'root' required"))
        val tables = (gs.schema.vertexTypes.keys ++ gs.schema.edgeTypes.keys)
          .map(gs.tableFor).toSeq.sorted
        val from = graft.model.Backup.chainTo(backupRoot)
        val to = graft.model.Backup.incremental(gs.store, tables, backupRoot)
        reply(ex, 200, s"""{"root": "$backupRoot", "from": $from, "to": $to}""")
      case "compact" =>
        val gs = store.getOrElse { reply(ex, 404, err("no store attached")); return }
        val label = field("label").getOrElse(
          throw new QueryService.BadRequestException("'label' required"))
        gs.store.compactCurrent(gs.tableFor(label))
        // same call reclaims pre-upgrade orphan dirs under the shared
        // materialized-store root (fingerprint-stamped, unsuffixed —
        // see StorePaths.gcStores; never touches anything else)
        val gced = graft.model.StorePaths.gcStores()
        reply(ex, 200, s"""{"compacted": "$label", "stores_gced": $gced}""")
      case "snapshot_stats" =>
        // pin the CURRENT maintained histogram as a named drift
        // reference — the monitor-start step; a later /admin/drift
        // against this name answers at O(nBins)
        val name = field("index").getOrElse(
          throw new QueryService.BadRequestException("'index' required"))
        val snap = field("name").getOrElse(
          throw new QueryService.BadRequestException("'name' required"))
        statsIndexes.get(name) match {
          case None => reply(ex, 404, err(s"no such stats index: $name"))
          case Some(idx) =>
            idx.snapshot(snap)
            reply(ex, 200, s"""{"index": "$name", "snapshot": "$snap"}""")
        }
      case other => reply(ex, 404, err(s"no such admin route: $other"))
    }
  }

  /** `POST /admin/drift` `{"index": n, "ref": r}` — the drift summary
    * (psi/js/tvd ppm + both population sizes) of the index's CURRENT
    * maintained histogram against the pinned reference `r`. Read-only
    * (monitoring must not require the write effect); O(nBins × groups)
    * input rows by construction, never a corpus scan.
    *
    * Stratified indexes (a `groupCol`-bearing MaintainedStatsIndex)
    * return `"strata": [{"group": g, …}, …]` — one summary per group,
    * sorted — or, with an optional `"group": g` field, that stratum's
    * summary alone (404 when the stratum exists in neither side).
    * `"group"` against an unstratified index is a 400.
    */
  private def drift(ex: HttpExchange, body: String): Unit = {
    val root = parseBody(body)
    def field(k: String): Option[String] =
      Option(root.get(k)).filterNot(_.isNull).map(_.asText())
    val name = field("index").getOrElse(
      throw new QueryService.BadRequestException("'index' required"))
    val ref = field("ref").getOrElse(
      throw new QueryService.BadRequestException("'ref' required"))
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def metrics(r: org.apache.spark.sql.Row, off: Int): String =
      s""""n_a": ${r.getLong(off)}, "n_b": ${r.getLong(off + 1)}, """ +
        s""""psi_ppm": ${r.getLong(off + 2)}, "js_ppm": ${r.getLong(off + 3)}, """ +
        s""""tvd_ppm": ${r.getLong(off + 4)}"""
    statsIndexes.get(name) match {
      case None => reply(ex, 404, err(s"no such stats index: $name"))
      case Some(idx) if !idx.hasSnapshot(ref) =>
        reply(ex, 404, err(s"no such reference snapshot: $ref"))
      case Some(idx) => (idx.groupCol, field("group")) match {
        case (None, Some(_)) =>
          throw new QueryService.BadRequestException(
            s"stats index '$name' is not stratified — drop the 'group' field")
        case (None, None) =>
          val r = idx.driftVsSnapshot(ref).head
          reply(ex, 200,
            s"""{"index": "$name", "ref": "$ref", ${metrics(r, 0)}}""")
        case (Some(_), want) =>
          val all = idx.driftVsSnapshot(ref)
          want match {
            case Some(g) =>
              val rows = all.filter(org.apache.spark.sql.functions.col("g") === g)
                .collect()
              if (rows.isEmpty) reply(ex, 404, err(s"no such stratum: $g"))
              else reply(ex, 200, s"""{"index": "$name", "ref": "$ref", """ +
                s""""group": ${jstr(g)}, ${metrics(rows.head, 1)}}""")
            case None =>
              val rows = all.orderBy("g").collect().map(r =>
                s"""{"group": ${jstr(r.getString(0))}, ${metrics(r, 1)}}""")
              reply(ex, 200, s"""{"index": "$name", "ref": "$ref", """ +
                s""""strata": [${rows.mkString(", ")}]}""")
          }
      }
    }
  }

  /** `POST /admin/stats` — the reference's `graph-stats` report
    * (stats.lisp:51 family + the chart.lisp dashboard's data): current
    * commit epoch, per-table commit counts / rows-per-commit / commit
    * rate derived from the commit log itself (VersionedStore
    * .writeReport — the log IS the statistic, nothing in-memory to
    * lose on restart), and base/delta footprints of every attached
    * view and maintained-index store (GenDirs.layoutStats), plus the
    * trailing-minute op rates the reference's report leads with:
    * `avg_writes_per_sec` (commits in the last 60s, from the log's
    * own timestamps) and `avg_reads_per_sec` (served query requests,
    * [[ReadStats]] — the request grain is where "a read happened" is
    * meaningful on a lazy-frame engine; per-scan metrics remain the
    * Spark UI / listener bus's job).
    *
    * Commit telemetry is WINDOWED (`{"window": N}` epochs back from
    * current, default 256; 0 = unbounded): the report is one row per
    * (table, epoch), and a poll against a store with millions of
    * commits must stay O(window), not O(store age) — the window prunes
    * at the epoch-partition level.
    */
  private def stats(ex: HttpExchange, body: String): Unit = {
    val gs = store.getOrElse {
      reply(ex, 404, err("no store attached")); return }
    val window = Option(parseBody(body, blankOk = true).get("window"))
      .filterNot(_.isNull).map(_.asLong(256L)).getOrElse(256L)
    if (window < 0) throw new QueryService.BadRequestException("'window' must be >= 0")
    val epoch = gs.store.currentEpoch
    val fromEpoch = if (window == 0L) 0L else math.max(0L, epoch - window)
    val rows = gs.store.writeReport(fromEpoch).collect()
    val tables = rows.groupBy(_.getString(0)).toSeq.sortBy(_._1).map {
      case (t, rs) =>
        val commits = rs.length
        // commit_epoch is a parquet PARTITION column — it reads back as
        // Integer, so go through Number rather than getLong
        val total = rs.map(_.getAs[Number]("rows").longValue).sum
        val times = rs.map(_.getAs[java.sql.Timestamp]("committed_at").getTime).sorted
        val spanSec = (times.last - times.head) / 1000.0
        val rate =
          if (commits > 1 && spanSec > 0) (commits - 1) / spanSec else 0.0
        f"""{"table": "$t", "commits": $commits, "rows": $total, """ +
          f""""rows_per_commit": ${total.toDouble / commits}%.2f, """ +
          f""""last_epoch": ${rs.map(_.getAs[Number]("commit_epoch").longValue).max}, """ +
          f""""commits_per_sec": $rate%.4f}"""
    }
    def layoutJson(kind: String, name: String, root: java.nio.file.Path): String = {
      val s = graft.model.GenDirs.layoutStats(root)
      s"""{"kind": "$kind", "name": "$name", "gen": ${s.gen}, """ +
        s""""base_files": ${s.baseFiles}, "base_bytes": ${s.baseBytes}, """ +
        s""""delta_files": ${s.deltaFiles}, "delta_bytes": ${s.deltaBytes}, """ +
        s""""delta_epochs": ${s.deltaEpochs}}"""
    }
    val viewStats = views.toSeq.flatMap(vc =>
      vc.names.map(n => layoutJson("view", n, vc.rootOf(n))))
    val indexStats = indexDirs.toSeq.sortBy(_._1).map { case (n, d) =>
      layoutJson("index", n, java.nio.file.Paths.get(d)) }
    // `{"series": true}` additionally returns the raw windowed
    // (table, epoch, rows, committed_at_ms) points — the chart.lisp
    // dashboard's data series, already bounded by the window
    val series =
      if (!Option(parseBody(body, blankOk = true).get("series"))
          .exists(_.asBoolean(false))) ""
      else rows.sortBy(r => (r.getString(0), r.getAs[Number]("commit_epoch").longValue))
        .map { r =>
          s"""{"table": "${r.getString(0)}", """ +
            s""""epoch": ${r.getAs[Number]("commit_epoch").longValue}, """ +
            s""""rows": ${r.getAs[Number]("rows").longValue}, """ +
            s""""at_ms": ${r.getAs[java.sql.Timestamp]("committed_at").getTime}}"""
        }.mkString(""", "series": [""", ",", "]")
    // exactly-once ingest cursors (TransactionalIngest): one row per
    // sink — where each streaming ingest's replay protection stands.
    // The cursor table is "_"-prefixed (excluded from the commit
    // telemetry above), so ops visibility comes from here.
    val ingest = {
      val cur = gs.store.read(graft.streaming.TransactionalIngest.cursorTable)
      if (cur.columns.isEmpty) ""
      else cur.select("sink_id", "batch_id", "slice").collect()
        .sortBy(_.getString(0)).map { r =>
          s"""{"sink_id": "${r.getString(0)}", "batch_id": ${r.getLong(1)}, """ +
            s""""slice": ${r.getLong(2)}}"""
        }.mkString(""", "ingest": [""", ",", "]")
    }
    // service admission health alongside the store stats: slots in
    // flight vs configured, and how many callers saturation turned
    // away since start (the stats route itself bypasses the gate, so
    // this is readable exactly when it matters — under saturation)
    val service_ = {
      val inFlight = if (queryGate == null) 0 else querySlots - queryGate.availablePermits()
      s""", "service": {"query_slots": $querySlots, """ +
        s""""queries_in_flight": $inFlight, """ +
        s""""rejected_429": ${rejected429.get()}}"""
    }
    // the bound maintenance daemon's health: whether it runs, when each
    // target last compacted (generation + wall ms; never = null), and
    // the failures it swallowed — the unattended tier must be auditable
    // from the same poll that shows the layout stats driving it
    val maint = maintenance.map { m =>
      val comps = m.lastCompactions()
      val targets = m.targetNames.sorted.map { n =>
        comps.get(n) match {
          case Some((gen, at)) =>
            s"""{"name": "$n", "last_compaction_gen": $gen, "last_compaction_at_ms": $at}"""
          case None =>
            s"""{"name": "$n", "last_compaction_gen": null, "last_compaction_at_ms": null}"""
        }
      }
      val errs = m.recentErrors().map { case (n, msg, at) =>
        s"""{"target": "$n", "error": "${msg.replace("\\", "\\\\")
          .replace("\"", "\\\"").replace("\n", " ")}", "at_ms": $at}"""
      }
      s""", "maintenance": {"running": ${m.isRunning}, """ +
        s""""targets": [${targets.mkString(",")}], """ +
        s""""errors": [${errs.mkString(",")}]}"""
    }.getOrElse("")
    // trailing-minute rates (stats.lisp:51's avg-writes/reads-per-
    // second): both use the inclusive 61-sample window the reference
    // loops over; writes come from the log's own commit timestamps
    val nowMs = System.currentTimeMillis()
    val recentCommits = rows.map(_.getAs[java.sql.Timestamp]("committed_at")
      .getTime).count(_ >= nowMs - 60000L)
    reply(ex, 200,
      s"""{"epoch": $epoch, "window_from_epoch": $fromEpoch, """ +
        f""""avg_writes_per_sec": ${recentCommits / 61.0}%.4f, """ +
        f""""avg_reads_per_sec": ${readStats.lastAvg(60)}%.4f, """ +
        s""""tables": [${tables.mkString(",")}], """ +
        s""""stores": [${(viewStats ++ indexStats).mkString(",")}]$service_$maint$ingest$series}""")
  }

  /** `POST /admin/chart` — the chart.lisp dashboard: a self-contained
    * SVG line chart of per-second "Writes" (rows committed, from the
    * commit log's timestamps) and "Reads" (served query requests)
    * over the trailing `span` seconds (default 300, max 600; `width`/
    * `height` default to the reference chart's 1600×900). SVG instead
    * of the reference's raster PNG: no imaging deps, and the REST
    * tier serves it straight to a browser.
    */
  private def chart(ex: HttpExchange, body: String): Unit = {
    val gs = store.getOrElse {
      reply(ex, 404, err("no store attached")); return }
    val root = parseBody(body, blankOk = true)
    def intField(k: String, dflt: Int): Int =
      Option(root.get(k)).filterNot(_.isNull).map(_.asInt(dflt)).getOrElse(dflt)
    val span = intField("span", 300)
    if (span < 1 || span > 600)
      throw new QueryService.BadRequestException("'span' must be 1..600 seconds")
    val now = System.currentTimeMillis() / 1000L
    val from = now - span + 1L
    // rows committed per second: the windowed write report bucketed by
    // its own timestamps — only buckets inside the span can render, so
    // the epoch window just needs to cover the span's commits
    val buckets = gs.store.writeReport(
        math.max(0L, gs.store.currentEpoch - 4096L)).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("committed_at").getTime / 1000L,
        r.getAs[Number]("rows").longValue))
      .filter(_._1 >= from).groupBy(_._1)
      .map { case (s, vs) => (s, vs.map(_._2).sum) }
    val writes = (from to now).map(s => (s, buckets.getOrElse(s, 0L)))
    val svg = ChartSvg.render(Seq(
      ("Writes", writes), ("Reads", readStats.series(span))),
      intField("width", 1600), intField("height", 900))
    val bytes = svg.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "image/svg+xml")
    ex.sendResponseHeaders(200, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.getResponseBody.close()
  }

  private def parseParams(body: String): Map[String, String] = {
    val root = parseBody(body, blankOk = true)
    Option(root.get("params")).map { p =>
      if (!p.isObject) throw new QueryService.BadRequestException("'params' must be an object")
      val it = p.properties().iterator()
      var m = Map.empty[String, String]
      while (it.hasNext) { val e = it.next(); m += e.getKey -> e.getValue.asText() }
      m
    }.getOrElse(Map.empty)
  }

  /** Both delivery shapes drain through the SAME clamped lazy drain
    * ([[QueryService.ndjson]] — maxLimit-bounded by policy, computed
    * into persisted blocks before the first socket byte, served one
    * partition at a time): the ndjson branch streams the lines, the
    * array branch joins them. One drain, one compaction-grace story,
    * no second collect path to audit. The finally-close frees the
    * buffer blocks even when the client disconnects mid-stream.
    */
  private def respondRows(ex: HttpExchange, df: org.apache.spark.sql.DataFrame,
      stream: Boolean): Unit = {
    val lines = service.ndjson(df)
    try {
      if (stream) {
        ex.getResponseHeaders.set("Content-Type", "application/x-ndjson")
        ex.sendResponseHeaders(200, 0)
        HttpEndpoint.drainNdjson(ex.getResponseBody, lines)
      } else reply(ex, 200, lines.mkString("[", ",", "]"))
    } finally lines.close()
  }

  private def err(msg: String): String = HttpEndpoint.err(msg)

  private def reply(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.getResponseBody.close()
  }
}

object HttpEndpoint {
  /** A drain failure AFTER `sendResponseHeaders(200, 0)` — the status
    * line is already on the wire, so the 4xx/5xx tier cannot speak.
    * [[HttpEndpoint.handle]] swallows it (the in-band marker written by
    * [[drainNdjson]] is the client-visible signal) instead of
    * attempting a second status line on a committed exchange.
    */
  private[graft] final class MidStreamFailure(cause: Throwable)
      extends RuntimeException(cause)

  private[graft] def err(msg: String): String =
    "{\"error\": \"" + Option(msg).getOrElse("unknown").replace("\\", "\\\\")
      .replace("\"", "\\\"").replace("\n", " ") + "\"}"

  /** Stream ndjson lines to `os`, one `line\n` per row. The buffer is
    * materialized into persisted blocks BEFORE the 200 header goes out
    * (NdjsonDrain's constructor), so a mid-stream failure is rare —
    * a persisted block evicted AND its store files compacted away, or
    * executor loss — but when it happens the client has already seen
    * `HTTP 200`. The truncation contract: a complete response is
    * complete JSON lines each ending in `\n`. On failure AT a line
    * boundary the drain writes one in-band `{"error": ...}` object
    * with NO trailing newline and aborts; on failure MID-line it
    * writes nothing more (appending the marker there would
    * concatenate onto the partial line and malform both — r15 advice
    * #4), so the partial unterminated line is itself the signal. A
    * client therefore checks ONE thing — does the body end in `\n`? —
    * and, when it does not, may find a well-formed error object in
    * the final line explaining why.
    */
  private[graft] def drainNdjson(os: java.io.OutputStream,
      lines: Iterator[String]): Unit = {
    var atBoundary = true // no partial line on the wire yet
    try {
      lines.foreach { line =>
        atBoundary = false
        os.write(line.getBytes(StandardCharsets.UTF_8)); os.write('\n')
        atBoundary = true
      }
      os.close()
    } catch {
      case t: Throwable =>
        if (atBoundary)
          try os.write(err(t.getMessage).getBytes(StandardCharsets.UTF_8))
          catch { case _: java.io.IOException => () } // socket already gone
        throw new MidStreamFailure(t)
    }
  }
}
