package graft.model

import java.nio.file.Path
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicBoolean

/** Threshold-driven background maintenance — the production answer to
  * "who compacts at 3 a.m.". Commit-time maintenance keeps every
  * store CORRECT (deltas supersede, probes merge base + deltas), but
  * delta logs grow until someone regenerates/rebuilds, and at 100 TB
  * that someone cannot be a human running `/admin/regenerate`: a
  * view or index accumulating thousands of delta partitions pays an
  * ever-growing merge on every read.
  *
  * The policy is deliberately simple and observable: each target is a
  * (name, GenDirs root, compact thunk); a pass compacts exactly the
  * targets whose layout stats breach `deltaEpochsHigh` OR
  * `deltaBytesHigh` (the same `GenDirs.layoutStats` numbers
  * `/admin/stats` reports, so an operator can predict every action
  * from the stats endpoint). Compaction itself is the target's own
  * regenerate/rebuild — generation-versioned publishes that the storm
  * suite proves safe under concurrent writers, readers, and leases,
  * which is what makes an UNATTENDED daemon safe to run at all.
  *
  * The reference never needed this (its skip-list indexes rewrite in
  * place); the delta-log architecture does, so the daemon is part of
  * the storage design, not an optional nicety.
  */
final class Maintenance(
    targets: Seq[Maintenance.Target],
    deltaEpochsHigh: Long = 64,
    deltaBytesHigh: Long = 256L << 20,
    periodMs: Long = 30000L) {
  require(deltaEpochsHigh >= 1 && deltaBytesHigh >= 1 && periodMs >= 1)

  private val stopFlag = new AtomicBoolean(false)
  private var runner: Thread = _
  private val errors = new ConcurrentLinkedQueue[(String, Throwable)]
  // ops telemetry, non-destructive (the draining lastErrors() is the
  // programmatic consumer; /admin/stats must be able to POLL without
  // eating another consumer's errors): a bounded ring of recent
  // failures and the last successful compaction per target
  private val recent = new ConcurrentLinkedQueue[(String, String, Long)]
  private val compactions =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]

  private def recordError(name: String, e: Throwable): Unit = {
    errors.add(name -> e)
    recent.add((name, Option(e.getMessage).getOrElse(e.getClass.getName),
      System.currentTimeMillis()))
    while (recent.size > 32) recent.poll() // bounded: a wedged target must not grow the ring forever
  }

  private def compactOne(t: Maintenance.Target): Unit = {
    t.compact()
    compactions.put(t.name,
      (GenDirs.layoutStats(t.root).gen, System.currentTimeMillis()))
  }

  /** True when `root`'s current generation breaches a threshold. */
  private def due(root: Path): Boolean = {
    val s = GenDirs.layoutStats(root)
    s.deltaEpochs >= deltaEpochsHigh || s.deltaBytes >= deltaBytesHigh
  }

  /** One synchronous policy pass: compact every due target, return the
    * names compacted. Errors propagate — callers of the synchronous
    * API want the failure; the daemon wraps this and keeps going.
    */
  def runOnce(): Seq[String] =
    targets.filter(t => due(t.root)).map { t => compactOne(t); t.name }

  /** Start the daemon: one policy pass every `periodMs` until [[stop]].
    * A failing target is recorded (see [[lastErrors]]) and retried
    * next pass; one broken view must not stop every other target's
    * maintenance. The thread is a daemon — it dies with the JVM, and
    * an in-flight publish it leaves behind is the crash-leftover case
    * GenDirs sweeps already heal.
    */
  def start(): Unit = synchronized {
    require(runner == null || !runner.isAlive, "maintenance daemon already running")
    stopFlag.set(false)
    runner = new Thread(() => {
      while (!stopFlag.get()) {
        targets.foreach { t =>
          if (!stopFlag.get()) {
            try { if (due(t.root)) compactOne(t) }
            catch { case e: Throwable => recordError(t.name, e); () }
          }
        }
        var slept = 0L
        while (!stopFlag.get() && slept < periodMs) {
          Thread.sleep(math.min(50L, periodMs)); slept += 50L
        }
      }
    }, "graft-maintenance")
    runner.setDaemon(true)
    runner.start()
  }

  def stop(): Unit = synchronized {
    stopFlag.set(true)
    if (runner != null) { runner.join(30000L); runner = null }
  }

  /** Errors the daemon swallowed, newest last; cleared on read. */
  def lastErrors(): Seq[(String, Throwable)] = {
    val out = Seq.newBuilder[(String, Throwable)]
    var e = errors.poll()
    while (e != null) { out += e; e = errors.poll() }
    out.result()
  }

  /** Non-destructive ops telemetry for `/admin/stats`: the last ≤32
    * swallowed failures as (target, message, at_ms), oldest first.
    * Unlike [[lastErrors]] this never clears — a stats poll must not
    * eat errors a programmatic consumer is waiting to drain.
    */
  def recentErrors(): Seq[(String, String, Long)] = {
    import scala.jdk.CollectionConverters._
    recent.iterator().asScala.toSeq
  }

  /** Last successful compaction per target: name → (generation the
    * compact published, wall ms). Targets never compacted are absent.
    */
  def lastCompactions(): Map[String, (Long, Long)] = {
    import scala.jdk.CollectionConverters._
    compactions.asScala.toMap
  }

  def targetNames: Seq[String] = targets.map(_.name)

  def isRunning: Boolean = synchronized { runner != null && runner.isAlive }
}

object Maintenance {
  /** One maintained artifact: the GenDirs root whose layout stats
    * drive the decision, and the artifact's own compaction verb.
    */
  final case class Target(name: String, root: Path, compact: () => Unit)

  /** Targets for every view of a catalog (compact = regenerate). */
  def forViews(cat: graft.views.ViewCatalog): Seq[Target] =
    cat.names.map(n => Target(s"view:$n", cat.rootOf(n), () => cat.regenerate(n)))
}
