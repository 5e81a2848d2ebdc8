package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi-naive fixpoint evaluation for recursive rules — the analog of
  * the reference's recursive `<-` Prolog clauses (reference
  * prologc.lisp:626-700, 744-746), with the `%tick` inference budget
  * and deadline (prologc.lisp:859-900) mapped to explicit iteration /
  * row / wall-clock caps (SURVEY.md §7.2 step 5, §7.4).
  *
  * Semi-naive: each round the `step` function is applied only to the
  * *delta* (facts new in the previous round), and results already in
  * the accumulated set are anti-joined away — so a cyclic graph
  * converges instead of looping, where the reference relied on budgets.
  */
object Fixpoint {

  final case class Budget(
      maxIterations: Int = 50,
      maxRows: Long = 10_000_000L,
      timeoutMillis: Long = 300_000L)

  final class BudgetExceeded(msg: String) extends RuntimeException(msg)

  /** @param base  initial fact set
    * @param step  delta => new candidate facts (may contain duplicates
    *              of known facts; they are removed here)
    * @param keyCols columns forming fact identity for dedup
    * @return the fixpoint (base ∪ all derived facts)
    */
  def semiNaive(base: DataFrame, keyCols: Seq[String], budget: Budget = Budget(),
      shufflePartitions: Option[Int] = None)(
      step: DataFrame => DataFrame): DataFrame =
    shufflePartitions match {
      case None => semiNaiveLoop(base, keyCols, budget)(step)
      case Some(n) =>
        // iterative rounds move delta-sized data — orders of magnitude
        // less than the session default sized for full-table shuffles.
        // Sizing shuffle partitions to the round's volume removes
        // per-round task overhead AQE can't (AQE coalesces reads, but
        // the map side still launches default-many tasks). The knob
        // lives in a CHILD session (own SQLConf, shared context and
        // cache), so concurrent queries on the caller's session never
        // see it — mutating the shared conf would race against them.
        val caller = base.sparkSession
        val loop = loopSession(caller, n, adaptive = false)
        val result = semiNaiveLoop(
          org.apache.spark.sql.graftbridge.Bridge.inSession(loop, base), keyCols, budget)(step)
        // hand the (already materialized) result back under the
        // caller's conf so downstream plans are unaffected
        org.apache.spark.sql.graftbridge.Bridge.inSession(caller, result)
    }

  // one loop session per (app, partition count), reused across calls:
  // a child session carries its own SessionState (analyzer/optimizer),
  // which is not free to rebuild per query. newSession() snapshots the
  // conf at creation, so semantics-bearing runtime settings are
  // re-mirrored from the caller on every fetch — a cached session must
  // not freeze the caller's timezone/ANSI mode as of first use.
  private val mirroredConfs = Seq(
    "spark.sql.session.timeZone", "spark.sql.ansi.enabled",
    "spark.sql.autoBroadcastJoinThreshold")
  private val loopSessions =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Boolean), org.apache.spark.sql.SparkSession]
  /** `adaptive = false` additionally turns AQE off in the loop session:
    * a fixpoint that schedules delta-sized rounds back to back pays one
    * scheduled job PER MATERIALIZED AQE EXCHANGE per round — pure
    * driver latency when the round's frames are small by construction
    * (the r17 commit-session observation, applied to loops).
    */
  private[graft] def loopSession(caller: org.apache.spark.sql.SparkSession,
      parts: Int, adaptive: Boolean = true) = {
    val s = loopSessions.getOrElseUpdate(
      (caller.sparkContext.applicationId, parts, adaptive), {
      val ns = caller.newSession()
      ns.conf.set("spark.sql.shuffle.partitions", parts.toString)
      if (!adaptive) ns.conf.set("spark.sql.adaptive.enabled", "false")
      ns
    })
    mirroredConfs.foreach { k =>
      caller.conf.getOption(k).foreach { v =>
        if (!s.conf.getOption(k).contains(v)) s.conf.set(k, v)
      }
    }
    s
  }

  /** Broadcast a rounds-small frame into its next join, falling back to
    * a shuffled join when it outgrows the row cap — an unconditional
    * broadcast() hint would override the size threshold entirely and
    * OOM the driver on a multi-million-row frontier.
    */
  private[operators] def maybeBroadcast(df: DataFrame, rows: Long): DataFrame = {
    val cap = df.sparkSession.conf.get("graft.fixpoint.broadcastRows", "1000000").toLong
    if (rows <= cap) broadcast(df) else df
  }

  private def semiNaiveLoop(base: DataFrame, keyCols: Seq[String], budget: Budget)(
      step: DataFrame => DataFrame): DataFrame = {
    val t0 = System.nanoTime()
    // deltas are checkpointed once each; the accumulated set is a lazy
    // union over those materialized deltas — re-checkpointing the whole
    // set every round would make each round O(total) instead of O(delta)
    var rings = List(base.dropDuplicates(keyCols).localCheckpoint(eager = true))
    var delta = rings.head
    var deltaRows = delta.count()
    var total = deltaRows
    var iters = 0
    var done = false
    while (!done) {
      iters += 1
      if (iters > budget.maxIterations)
        throw new BudgetExceeded(s"fixpoint exceeded ${budget.maxIterations} iterations")
      if ((System.nanoTime() - t0) / 1000000 > budget.timeoutMillis)
        throw new BudgetExceeded(s"fixpoint exceeded ${budget.timeoutMillis} ms")
      val all = rings.reduce(_ union _)
      // the delta is broadcast into the step join while it stays small
      // (the step relation then streams in place instead of being
      // re-shuffled every round); big deltas fall back to a shuffle
      delta = step(maybeBroadcast(delta, deltaRows)).dropDuplicates(keyCols)
        .join(all, keyCols, "left_anti")
        .localCheckpoint(eager = true)
      val n = delta.count() // cheap: counts the materialized checkpoint
      deltaRows = n
      if (n == 0) done = true
      else {
        total += n
        if (total > budget.maxRows)
          throw new BudgetExceeded(s"fixpoint exceeded ${budget.maxRows} rows")
        rings ::= delta
        // compact occasionally: anti-joining against k separate rings
        // costs k input scans per round; fold them into one
        // materialization every 8 rounds to keep that bounded
        if (rings.size >= 8)
          rings = List(rings.reduce(_ union _).localCheckpoint(eager = true))
      }
    }
    rings.reduce(_ union _)
  }

  /** Transitive reachability from `sources` (id) over `edges`
    * (src, dst) — the recursive `(reach ?x) <- (reach ?y),(knows ?y ?x)`
    * rule as a single operator. `hopPower` > 0 runs the semi-naive loop
    * over a [[Traverse.hopCompressedEdges]] relation so each round
    * advances 2^hopPower depths: the round count (the latency term —
    * every round is a full scheduler round-trip) shrinks by that
    * factor, at the price of a denser edge relation. Right for
    * bounded-fan-out graphs; keep 0 for power-law graphs at scale.
    */
  def reachable(edges: DataFrame, sources: DataFrame, hopPower: Int = 0,
      budget: Budget = Budget(), shufflePartitions: Option[Int] = None,
      compressedStep: Option[DataFrame] = None): DataFrame = {
    // compressedStep: pre-built (from, to) hop relation (persistent-
    // index analog) — supplying it skips the per-query build. The
    // partitions knob covers the hop-compression build too (it
    // materializes eagerly, before the loop) — both run in one child
    // session so the caller's conf is never touched.
    val caller = sources.sparkSession
    val loop = shufflePartitions.map(loopSession(caller, _, adaptive = false))
    def reroot(df: DataFrame) =
      loop.map(org.apache.spark.sql.graftbridge.Bridge.inSession(_, df)).getOrElse(df)
    val step = reroot(compressedStep.map(_.select("from", "to")).getOrElse {
      val oriented = reroot(edges).select(col("src").as("from"), col("dst").as("to"))
      if (hopPower == 0) oriented
      else Traverse.hopCompressedEdges(oriented, hopPower).select("from", "to")
    })
    // broadcast the DELTA into the step join: the frontier is rounds-
    // small while the (pre-built, materialized) step relation is the
    // big side — a broadcast join streams the step relation in place
    // instead of re-shuffling it every round
    val result = semiNaiveLoop(reroot(sources.select("id")), Seq("id"), budget) { delta =>
      // delta arrives pre-hinted by the loop (broadcast while small)
      delta.join(step, delta("id") === step("from")).select(col("to").as("id"))
    }
    if (loop.isDefined)
      org.apache.spark.sql.graftbridge.Bridge.inSession(caller, result)
    else result
  }
}
