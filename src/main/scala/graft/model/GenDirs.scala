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
  */
private[graft] object GenDirs {

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
    * flat layout.
    */
  private def sweep(root: Path, keep: Long): Unit = {
    Dirs.childNames(root).foreach { n =>
      if (n.startsWith("gen@")) {
        val tag = n.stripPrefix("gen@")
        if (tag.endsWith(".tmp")) {
          // publishes are serialized, so any staging dir seen here is a
          // crashed leftover — except the generation just published has
          // already been moved away, so no live name can match
          Dirs.rmTree(root.resolve(n))
        } else scala.util.Try(tag.toLong).toOption
          .filter(_ < keep)
          .foreach(_ => Dirs.rmTree(root.resolve(n)))
      } else if (n.startsWith("_GEN.tmp.")) Dirs.rmTree(root.resolve(n))
    }
    if (keep >= 1) {
      // the legacy flat layout was generation 0 — same grace window
      Seq("base", "delta", "base__tmp", "base__old")
        .foreach(n => Dirs.rmTree(root.resolve(n)))
    }
  }
}
