package graft.service

import org.apache.spark.sql.DataFrame

import graft.model.PropertyGraph
import graft.query.{JsonQuery, PatternCompiler, PatternQuery}

/** The service tier over the engine — the analog of the reference's two
  * REST query tiers (reference rest.lisp):
  *
  *   - **Registered queries** = `def-query` (rest.lisp:367-433):
  *     server-authored patterns with typed parameter coercion (400 on
  *     mismatch), enforced result bounds and a read-only effects policy.
  *   - **Ad-hoc queries** = the JSON pattern DSL (rest.lisp:448-618),
  *     compiled through the same closed goal set.
  *
  * Error taxonomy maps intent exactly: [[BadRequestException]] → 400,
  * [[ForbiddenException]] → 403 (rest.lisp:420-433); resource budgets
  * (`:limit`/`:timeout` defaults, rest.lisp:31-36) are clamps applied
  * to every query before execution.
  */
object QueryService {
  final class BadRequestException(msg: String) extends RuntimeException(msg)
  final class ForbiddenException(msg: String) extends RuntimeException(msg)

  final case class ParamSpec(
      name: String,
      typ: String, // long | double | string | boolean
      required: Boolean = true,
      default: Option[Any] = None)

  final case class RegisteredQuery(
      name: String,
      params: Seq[ParamSpec],
      build: Map[String, Any] => PatternQuery,
      /** queries that mutate need the :write effect — denied unless the
        * service allows writes (the :effects policy, prologc.lisp:902-943) */
      writes: Boolean = false)

  /** A def-query-style registration whose body is a pipeline operator
    * (BM25 / dedup / PII / …) rather than a graph pattern: same typed
    * param coercion (400), same unexpected-param rejection, same
    * write-effects gate (403), same result clamp — the rest.lisp:367-433
    * tier extended over the data-pipeline operator set.
    */
  final case class PipelineQuery(
      name: String,
      params: Seq[ParamSpec],
      build: Map[String, Any] => DataFrame,
      writes: Boolean = false)

  /** The ndjson response buffer (see [[QueryService.ndjson]]): the
    * clamped frame is computed ONCE, eagerly, into identity-scoped
    * persisted RDD blocks (detached from the store's files, so a
    * compaction storm mid-response cannot strand the drain), then
    * drained to the socket one partition at a time. `close()` frees
    * the blocks and is idempotent; exhausting the iterator closes it
    * too, so the explicit call only matters on abandoned responses
    * (client disconnect mid-stream).
    */
  final class NdjsonDrain(df: DataFrame)
      extends Iterator[String] with AutoCloseable {
    private val blocks = df.toJSON.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Materialize now, inside the request's grace window. If the job
    // itself fails (bad expression, store race) the constructor throws
    // before any caller holds a handle to close() — unpersist the
    // partial blocks HERE or repeated failing requests would leak
    // persisted storage in the service tier.
    try blocks.count()
    catch { case t: Throwable => blocks.unpersist(blocking = false); throw t }
    private val it = blocks.toLocalIterator
    @volatile private var closed = false
    override def hasNext: Boolean = {
      val h = !closed && it.hasNext
      if (!h) close()
      h
    }
    override def next(): String =
      if (closed) Iterator.empty.next() else it.next()
    override def close(): Unit = if (!closed) {
      closed = true
      blocks.unpersist(blocking = false)
    }
  }
}

final class QueryService(
    graph: PropertyGraph,
    maxLimit: Int = 1000,
    allowWrites: Boolean = false) {
  import QueryService._

  private var registry = Map.empty[String, RegisteredQuery]
  private var pipelines = Map.empty[String, PipelineQuery]

  // Live-store serving: pattern queries resolve the graph per REQUEST,
  // not per service construction — a server over a GraphStore binds
  // `() => gs.graph()` here so every query sees the current committed
  // epoch (the constructor's static graph remains the default for
  // file-backed graphs, where the frames never move underneath).
  @volatile private var graphFn: () => PropertyGraph = () => graph
  def bindLiveGraph(fn: () => PropertyGraph): Unit = graphFn = fn

  def register(q: RegisteredQuery): Unit = registry += q.name -> q
  def register(q: PipelineQuery): Unit = pipelines += q.name -> q

  def coerce(spec: ParamSpec, raw: Option[String]): Option[(String, Any)] = raw match {
    case None =>
      spec.default.map(spec.name -> _).orElse(
        if (spec.required) throw new BadRequestException(s"missing required param: ${spec.name}")
        else None)
    case Some(v) =>
      val parsed =
        try spec.typ match {
          case "long" => v.toLong
          case "double" => v.toDouble
          case "boolean" => v.toBoolean
          case "string" => v
          case other => throw new BadRequestException(s"unknown param type: $other")
        } catch {
          case _: NumberFormatException | _: IllegalArgumentException =>
            throw new BadRequestException(s"param ${spec.name} must be ${spec.typ}, got: $v")
        }
      Some(spec.name -> parsed)
  }

  /** Clamp every query to the service bounds (rest.lisp:31-36, 571-573). */
  private def bounded(q: PatternQuery): PatternQuery =
    q.copy(limit = Some(math.min(q.limit.getOrElse(maxLimit), maxLimit)))

  def runRegistered(name: String, rawParams: Map[String, String]): DataFrame =
    registry.get(name) match {
      case Some(rq) =>
        if (rq.writes && !allowWrites)
          throw new ForbiddenException(s"query $name requires the write effect")
        checkParams(rq.params, rawParams)
        val coerced = rq.params.flatMap(p => coerce(p, rawParams.get(p.name))).toMap
        PatternCompiler.run(graphFn(), bounded(rq.build(coerced)))
      case None => pipelines.get(name) match {
        case Some(pq) =>
          if (pq.writes && !allowWrites)
            throw new ForbiddenException(s"query $name requires the write effect")
          checkParams(pq.params, rawParams)
          val coerced = pq.params.flatMap(p => coerce(p, rawParams.get(p.name))).toMap
          // the same result clamp as the pattern tier (rest.lisp:31-36)
          pq.build(coerced).limit(maxLimit)
        case None => throw new BadRequestException(s"unknown query: $name")
      }
    }

  private def checkParams(specs: Seq[ParamSpec], rawParams: Map[String, String]): Unit =
    rawParams.keys.find(k => !specs.exists(_.name == k)).foreach(k =>
      throw new BadRequestException(s"unexpected param: $k"))

  def runAdHoc(json: String, params: Map[String, Any] = Map.empty): DataFrame = {
    val q =
      try JsonQuery.parse(json, params)
      catch { case e: JsonQuery.BadQueryException => throw new BadRequestException(e.getMessage) }
    try PatternCompiler.run(graphFn(), bounded(q))
    catch { case e: IllegalArgumentException => throw new BadRequestException(e.getMessage) }
  }

  /** Collect with a wall-clock deadline — the `:timeout` budget of the
    * reference (prologc.lisp:859-900 %tick deadline; resource breach is
    * a client-visible error, rest.lisp:420-433). The query's Spark jobs
    * run under a job group that is cancelled on expiry, so executors
    * stop working rather than racing on after the caller gave up.
    */
  def collectBounded(df: DataFrame, timeoutMillis: Long): Array[org.apache.spark.sql.Row] = {
    val sc = df.sparkSession.sparkContext
    val group = "graft-" + java.util.UUID.randomUUID().toString
    var result: Either[Throwable, Array[org.apache.spark.sql.Row]] = null
    val worker = new Thread(() => {
      sc.setJobGroup(group, "bounded query", interruptOnCancel = true)
      result =
        try Right(df.collect())
        catch { case t: Throwable => Left(t) }
    })
    worker.start()
    worker.join(timeoutMillis)
    if (worker.isAlive) {
      sc.cancelJobGroup(group)
      worker.join(10000)
      throw new BadRequestException(s"query exceeded ${timeoutMillis} ms budget")
    }
    result match {
      case Right(rows) => rows
      case Left(t) => throw t
    }
  }

  /** Streaming row delivery — the `:callback` / ndjson contract
    * (rest.lisp:564-589): rows as a lazily-drained iterator of JSON
    * lines that must be [[NdjsonDrain.close closed]] when the
    * response ends.
    *
    * The COMPUTE is eager; the DRIVER drain is lazy. The clamped
    * result (every service frame is limited to `maxLimit` rows — the
    * rest.lisp:31-36 budget applied in [[bounded]]/[[runRegistered]])
    * is materialized into persisted RDD blocks in ONE job issued
    * while the request's file listings are still inside the store's
    * compaction grace window; the driver then serves the socket one
    * partition at a time via `toLocalIterator`. A slow HTTP consumer
    * (the ndjson contract's whole point) therefore never holds a lazy
    * PLAN open across compaction publishes — the blocks are detached
    * from the store's files — and the driver never holds the whole
    * response either (the pre-r14 `toJSON.collect()` did: bounded by
    * the clamp, but an eager drain a streaming surface doesn't need).
    * RDD persistence is object-identity-scoped, so concurrent
    * identical requests can never share (or unpersist) each other's
    * buffers the way a CacheManager-level persist would.
    */
  def ndjson(df: DataFrame): QueryService.NdjsonDrain =
    new QueryService.NdjsonDrain(df)
}
