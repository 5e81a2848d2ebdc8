package graft.model

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardCopyOption}

/** Generation-versioned storage for the maintained-index and view
  * materializations (base + delta-log pairs).
  *
  * Why: compaction used to swap `base/` in place (rmTree + move) and
  * clear `delta/` — but reader plans hold FILE LISTS of the old base,
  * so a probe racing a compaction crashed with FAILED_READ_FILE
  * (observed on ConcurrentStormSpec's first run, exactly the
  * reader-vs-compactor storm the reference's concurrent-stress family
  * hammers). The LSM answer is to never delete what an in-flight
  * reader may hold: each compaction PUBLISHES a complete fresh
  * generation directory `gen@N/` (its own base and delta log), flips
  * the `_GEN` pointer atomically, and sweeps only generations OLDER
  * than the previous one. In-flight reads of generation N-1 finish
  * against intact files; only a read still running after two
  * subsequent compactions can lose files, and compactions are
  * rare-cadence maintenance at production scale.
  *
  * Readers resolve the current generation ONCE per logical read and
  * derive both base and delta from that one dir, so a single read
  * never straddles a flip. Writers (compaction publishes, delta
  * appends) are serialized by each owner's maintenance monitor;
  * readers take no lock.
  *
  * Crash safety: an interrupted publish leaves a `gen@N.tmp` staging
  * dir or an unreferenced `gen@N` — the pointer still names the old
  * generation, readers are unaffected, and the next publish sweeps the
  * leftovers. No heal step needed (unlike the old in-place swap).
  *
  * Legacy layout (pre-generation stores: `base/` + `delta/` directly
  * under the root) reads as generation 0 — `dir(root, 0)` IS the root
  * — and is swept with the same one-generation grace once `gen@2`
  * publishes.
  *
  * READER LEASES (the reference's read-pin machinery,
  * graph-class.lisp:59-84, re-expressed for files): the one-generation
  * grace only protects reads that finish within two publishes, but
  * auto-compaction rides the write path, and at 100 TB a single
  * analytical query can easily outlive two compaction cycles on a hot
  * store. A reader that will hold plan file lists for long takes a
  * LEASE ([[lease]]/[[withLease]]): a `_PIN.<id>` marker inside the
  * generation dir. The sweeper skips any generation holding a live
  * pin, where live = mtime within [[leaseTtlMs]] — so a crashed
  * reader's pin expires by itself and the next publish reclaims the
  * space ([[Lease.refresh]] extends a legitimately long read).
  * Lease acquisition closes its race with an in-flight sweep by
  * re-reading the pointer after the durable pin write: a sweep that
  * could drop generation N belongs to a publish that flipped the
  * pointer to ≥ N+2 BEFORE listing pins, so observing pointer ≤ N+1
  * after the write proves every dangerous sweep will see the pin.
  */
private[graft] object GenDirs {

  /** How long an unrefreshed pin protects its generation. Crashed
    * readers stop pinning after this; the default comfortably covers
    * interactive reads while bounding compaction garbage.
    */
  def leaseTtlMs: Long =
    sys.props.get("graft.gen.lease.ttl.ms").map(_.toLong).getOrElse(15L * 60 * 1000)

  /** A held read pin on one generation. `dir` is the pinned
    * generation's directory — resolve base/delta/metadata from it, not
    * from [[current]], for the whole read.
    */
  final class Lease private[GenDirs] (val gen: Long, val dir: Path, pinFile: Path) {
    /** Extend the lease (touch mtime) — call between stages of a read
      * that may exceed [[leaseTtlMs]].
      */
    def refresh(): Unit =
      try Files.setLastModifiedTime(pinFile,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
      catch { case _: java.nio.file.NoSuchFileException => () }
    def release(): Unit = { Files.deleteIfExists(pinFile); () }
  }

  /** Pin the current generation for a long read. See the class doc for
    * the race argument; the retry loop re-resolves onto the fresh
    * generation when a double-publish lands mid-acquisition.
    */
  def lease(root: Path): Lease = {
    var attempts = 0
    while (attempts < 10) {
      val gen = currentGen(root)
      val d = dir(root, gen)
      // racing a sweep, createDirectories can throw a spurious
      // FileAlreadyExistsException (JDK createAndCheckIsDirectory: the
      // dir vanishes between its failed createDirectory and its
      // isDirectory re-check). Treat it like the pin-write race below:
      // the pin write then fails or the pointer re-check retries.
      try Files.createDirectories(d)
      catch { case _: java.io.IOException => () }
      val pin = d.resolve("_PIN." + java.util.UUID.randomUUID().toString.take(12))
      try Files.write(pin, Array.emptyByteArray)
      catch { case _: java.io.IOException => () } // dir swept mid-write — retry
      if (Files.exists(pin) && currentGen(root) <= gen + 1)
        return new Lease(gen, d, pin)
      Files.deleteIfExists(pin)
      attempts += 1
    }
    throw new IllegalStateException(s"could not lease a generation under $root " +
      "(compaction outpaced acquisition 10 times)")
  }

  /** Scoped lease: pin, read, release — the shape for any read whose
    * plan outlives the call that built it (build AND consume inside
    * `body`).
    *
    * HEARTBEAT: a daemon thread refreshes the pin every
    * `leaseTtlMs / 3` for as long as `body` runs, so a body that
    * outlives the TTL (the 100 TB analytical read the lease exists
    * for) keeps its protection without the caller remembering to call
    * [[Lease.refresh]] — the reference's read pins hold for the
    * thread's whole lifetime (graph-class.lisp:59-84), and so does
    * this scope. Crashed-reader reclamation is untouched: the
    * heartbeat dies with the JVM, the pin's mtime goes stale, and the
    * TTL sweep reclaims the generation as before.
    */
  def withLease[T](root: Path)(body: Path => T): T = {
    val l = lease(root)
    val hb = new Thread(() => {
      try {
        while (!Thread.interrupted()) {
          // re-read the TTL each beat (tests shrink it via sysprop);
          // floor keeps a pathological tiny TTL from busy-spinning
          Thread.sleep(math.max(leaseTtlMs / 3, 20L))
          l.refresh()
        }
      } catch { case _: InterruptedException => () }
    }, s"graft-lease-heartbeat-${l.gen}")
    hb.setDaemon(true)
    hb.start()
    try body(l.dir) finally { hb.interrupt(); hb.join(2000); l.release() }
  }

  /** True when `d` holds a pin younger than the TTL. */
  private def hasLivePin(d: Path): Boolean =
    Dirs.childNames(d).exists { n =>
      n.startsWith("_PIN.") && {
        try System.currentTimeMillis() -
          Files.getLastModifiedTime(d.resolve(n)).toMillis < leaseTtlMs
        catch { case _: java.io.IOException => false }
      }
    }

  /** On-disk footprint of a generation-layout store (current
    * generation only — superseded ones are transient reclamation
    * debt): base/delta file counts and bytes, plus the live delta
    * epoch count — the `graph-stats` telemetry surface
    * (stats.lisp:51 family) for maintained indexes and views.
    */
  final case class LayoutStats(gen: Long, baseFiles: Long, baseBytes: Long,
      deltaFiles: Long, deltaBytes: Long, deltaEpochs: Long)

  def layoutStats(root: Path): LayoutStats = {
    def walk(p: Path): (Long, Long) =
      if (!Files.exists(p)) (0L, 0L)
      else if (Files.isDirectory(p))
        Dirs.childNames(p).map(n => walk(p.resolve(n)))
          .foldLeft((0L, 0L)) { case ((f, b), (f2, b2)) => (f + f2, b + b2) }
      else (1L, try Files.size(p) catch { case _: java.io.IOException => 0L })
    val g = current(root)
    val (bf, bb) = walk(g.resolve("base"))
    val (df, db) = walk(g.resolve("delta"))
    LayoutStats(currentGen(root), bf, bb, df, db,
      Dirs.childNames(g.resolve("delta")).count(_.startsWith("commit_epoch=")))
  }

  private def genFile(root: Path) = root.resolve("_GEN")

  /** Current generation number: 0 means legacy/fresh (no pointer).
    * Parse-tolerant: a torn pointer reads as 0, which at worst serves
    * the legacy dirs until the next publish rewrites it.
    */
  def currentGen(root: Path): Long =
    try {
      if (Files.exists(genFile(root)))
        new String(Files.readAllBytes(genFile(root)), UTF_8).trim.toLong
      else 0L
    } catch { case _: NumberFormatException => 0L }

  /** A generation's directory; generation 0 is the legacy flat layout
    * (the root itself), so `dir(...).resolve("base")` works uniformly
    * across layouts.
    */
  def dir(root: Path, gen: Long): Path =
    if (gen == 0L) root else root.resolve(s"gen@$gen")

  /** The current generation dir — resolve once per logical read. */
  def current(root: Path): Path = dir(root, currentGen(root))

  /** Publish the next generation: `stage` fills the staging dir (write
    * `base/` under it; metadata side files next to the rows they
    * describe), then one atomic directory move plus one atomic pointer
    * flip make it current. Generations older than the PREVIOUS one are
    * swept afterwards (reader grace), as are stale staging dirs and —
    * once two real generations exist — the legacy flat dirs. Callers
    * must serialize publishes under their maintenance monitor. Returns
    * the published dir.
    */
  def publish(root: Path)(stage: Path => Unit): Path = {
    Files.createDirectories(root)
    val cur = currentGen(root)
    val next = cur + 1
    val tmp = root.resolve(s"gen@$next.tmp")
    Dirs.rmTree(tmp)
    Files.createDirectories(tmp)
    stage(tmp)
    val target = root.resolve(s"gen@$next")
    Dirs.rmTree(target) // leftover of a crashed publish of this number
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    val ptmp = root.resolve(s"_GEN.tmp.$next")
    Files.write(ptmp, next.toString.getBytes(UTF_8))
    Files.move(ptmp, genFile(root), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    sweep(root, keep = cur)
    target
  }

  /** Drop generations < `keep`, stale staging dirs, stale pointer
    * temps, and (when the kept floor has moved past it) the legacy
    * flat layout. Generations holding a LIVE reader pin are skipped —
    * a later publish reclaims them once the pin is released or
    * expires.
    *
    * Reclamation is BEST-EFFORT: [[lease]] may write a `_PIN` into an
    * old generation between this sweep's pin check and its delete
    * (the lease side then re-checks the pointer and retries, so no
    * reader is ever actually unprotected) — the delete then raises
    * DirectoryNotEmptyException, which must not propagate and fail
    * the committing writer's publish over consistent store state.
    * Whatever a sweep leaves behind, the next publish reclaims.
    */
  private def rmTreeQuiet(p: Path): Unit =
    try Dirs.rmTree(p)
    catch {
      case _: java.nio.file.DirectoryNotEmptyException => ()
      case _: java.nio.file.NoSuchFileException => ()
    }

  private def sweep(root: Path, keep: Long): Unit = {
    Dirs.childNames(root).foreach { n =>
      if (n.startsWith("gen@")) {
        val tag = n.stripPrefix("gen@")
        if (tag.endsWith(".tmp")) {
          // publishes are serialized, so any staging dir seen here is a
          // crashed leftover — except the generation just published has
          // already been moved away, so no live name can match
          rmTreeQuiet(root.resolve(n))
        } else scala.util.Try(tag.toLong).toOption
          .filter(_ < keep)
          .filterNot(_ => hasLivePin(root.resolve(n)))
          .foreach(_ => rmTreeQuiet(root.resolve(n)))
      } else if (n.startsWith("_GEN.tmp.")) rmTreeQuiet(root.resolve(n))
    }
    if (keep >= 1 && !hasLivePin(root)) {
      // the legacy flat layout was generation 0 (its dir IS the root,
      // so its pins live at root level) — same grace window
      Seq("base", "delta", "base__tmp", "base__old")
        .foreach(n => rmTreeQuiet(root.resolve(n)))
    }
  }
}
