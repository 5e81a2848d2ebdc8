package graft.tools

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import graft.model.GraphStore
import graft.service.{HttpEndpoint, QueryService}

/** Standalone graph server — the reference's start-a-graph-and-serve
  * entry (its REST server rides the running Lisp image, rest.lisp; the
  * rebuild's equivalent is one JVM): open an existing store by
  * LOCATION (the persisted `_schema.json` supplies the types —
  * `open-graph` semantics, no code-side schema), bind the query
  * service to the LIVE graph (every request resolves the current
  * committed epoch), and serve the full REST surface — pattern/
  * registered queries, CRUD mutations, admin stats/chart/backup/
  * vacuum/compact/maintain — on the bounded worker pool with query
  * admission control.
  *
  * ```
  * graft.tools.ServeMain <storeDir> [--port N] [--read-only]
  *   [--token T] [--max-limit N] [--cpus N] [--ready-file F]
  * ```
  *
  * `--read-only` drops the write effect: mutations and write-gated
  * admin verbs answer 403 (the :effects policy). `--ready-file` writes
  * the bound port once serving — the run-script handshake
  * (run-replication-test.sh's marker-file discipline), also how the
  * spec forks and probes a real server process. Registered/pipeline
  * queries and maintained-index daemons are code-side concerns: embed
  * the endpoint (see HttpEndpoint's `maintenance`/`views` parameters)
  * when the deployment needs them; this main serves the
  * schema-generic tier.
  */
object ServeMain {

  final case class Config(storeDir: String, port: Int = 0,
      readOnly: Boolean = false, token: Option[String] = None,
      maxLimit: Int = 1000, cpus: Int = 8, readyFile: Option[String] = None)

  def parse(args: Array[String]): Config = {
    require(args.nonEmpty, "usage: ServeMain <storeDir> [--port N] [--read-only] " +
      "[--token T] [--max-limit N] [--cpus N] [--ready-file F]")
    var c = Config(storeDir = args(0))
    var i = 1
    while (i < args.length) {
      args(i) match {
        case "--port" => c = c.copy(port = args(i + 1).toInt); i += 2
        case "--read-only" => c = c.copy(readOnly = true); i += 1
        case "--token" => c = c.copy(token = Some(args(i + 1))); i += 2
        case "--max-limit" => c = c.copy(maxLimit = args(i + 1).toInt); i += 2
        case "--cpus" => c = c.copy(cpus = args(i + 1).toInt); i += 2
        case "--ready-file" => c = c.copy(readyFile = Some(args(i + 1))); i += 2
        case other => throw new IllegalArgumentException(s"unknown flag: $other")
      }
    }
    c
  }

  /** Open the store and start serving; returns (endpoint, bound port).
    * Extracted from [[main]] so specs can drive a server in-process.
    */
  def start(spark: org.apache.spark.sql.SparkSession, c: Config): (HttpEndpoint, Int) = {
    val gs = GraphStore.open(spark, c.storeDir)
    val service = new QueryService(gs.graph(), maxLimit = c.maxLimit,
      allowWrites = !c.readOnly)
    service.bindLiveGraph(() => gs.graph()) // queries see every commit, not the open-time snapshot
    val ep = new HttpEndpoint(service, authToken = c.token,
      store = Some(gs), allowWrites = !c.readOnly)
    val port = ep.start(c.port)
    (ep, port)
  }

  def main(args: Array[String]): Unit = {
    val c = parse(args)
    val spark = graft.GraftSession.get(c.cpus)
    val (_, port) = start(spark, c)
    c.readyFile.foreach(f =>
      Files.write(Paths.get(f), s"$port".getBytes(UTF_8)))
    println(s"graft serving store=${c.storeDir} port=$port readOnly=${c.readOnly}")
    new java.util.concurrent.CountDownLatch(1).await() // serve until the process is killed
  }
}
