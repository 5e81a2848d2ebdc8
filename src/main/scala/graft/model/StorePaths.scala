package graft.model

import java.nio.file.{Files, Path, Paths}

/** The single definition of where materialized query stores (ANN
  * bucket/cluster stores, spatial cell stores) live and how their
  * build-if-absent freshness is checked — shared by Similarity and
  * SpatialOps so the root, the path sanitizer, and the staleness rule
  * cannot drift apart.
  */
private[graft] object StorePaths {

  /** Root for all materialized stores; override via env for tests. */
  def root: String = sys.env.getOrElse("SPARK_GRAFT_STORE_DIR",
    s"${System.getProperty("java.io.tmpdir")}/graft-annstore")

  /** Store directory key for a source dir: the sanitized path plus a
    * short hash of the RAW path, so distinct dirs that sanitize alike
    * (`/a/b` vs `/a_b`) cannot collide on one store.
    *
    * The hash suffix was added after stores already existed under the
    * bare sanitized name; those orphans would otherwise sit under the
    * shared root forever (one forced rebuild already re-created each
    * store under the new key). First use of a key per JVM garbage
    * collects its legacy sibling — only when that directory actually
    * holds fingerprint-stamped stores, so an unrelated user directory
    * that happens to share the sanitized name is never touched.
    */
  def key(sfDir: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val h = digest.take(4).map(b => f"$b%02x").mkString
    val sanitized = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    if (gced.add(sanitized)) gcLegacy(sanitized)
    s"$sanitized-$h"
  }

  private val gced = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Delete `root/<sanitized>` (the pre-hash-suffix key) iff it is a
    * directory whose children include a `_SOURCE_FINGERPRINT`-stamped
    * store — the marker every store built by this library carries.
    */
  private def gcLegacy(sanitized: String): Unit = try {
    val legacy = Paths.get(root, sanitized)
    if (Files.isDirectory(legacy)) {
      var isOurs = false
      Dirs.withList(legacy)(_.forEach { child =>
        if (Files.exists(child.resolve("_SOURCE_FINGERPRINT"))) isOurs = true
      })
      if (isOurs) deleteRecursively(legacy)
    }
  } catch {
    // DirectoryIteratorException is a RuntimeException thrown by the
    // directory-stream ITERATOR when a concurrent deleter races us
    // (shared tmp root, multiple JVMs) — best-effort means it too
    case _: java.io.IOException | _: java.nio.file.DirectoryIteratorException => ()
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) Dirs.withList(p)(_.forEach(deleteRecursively))
    Files.deleteIfExists(p)
  }

  /** Sweep the WHOLE store root for pre-upgrade orphans in one pass —
    * the eager complement of [[gcLegacy]]'s lazy per-key cleanup
    * (which only fires when the legacy dir's NEW key is touched, so a
    * source dir nobody queries again leaves its orphan forever).
    * A directory is reclaimed iff BOTH (a) its name lacks the
    * `-xxxxxxxx` hash suffix every current key carries, and (b) its
    * children include a `_SOURCE_FINGERPRINT`-stamped store — the
    * marker only this library writes. Anything else under the root
    * (including a user directory that merely shares the sanitized
    * shape) is never touched. Returns the number of dirs removed.
    * Exposed through `POST /admin/compact` so operators reclaim the
    * space on the same call that compacts the row stores.
    */
  def gcStores(): Int = {
    var removed = 0
    try {
      val r = Paths.get(root)
      if (!Files.isDirectory(r)) return 0
      val suffixed = ".*-[0-9a-f]{8}$".r
      Dirs.withList(r)(_.forEach { child =>
      // per-CHILD best-effort: a concurrent deleter racing one entry
      // (IOException, or DirectoryIteratorException from the inner
      // stream's iterator) skips that entry without discarding the
      // count of dirs already reclaimed in this sweep
      try {
        val name = child.getFileName.toString
        // known miss, chosen deliberately: a legacy orphan whose SOURCE
        // path happened to end in "-" + 8 hex chars (/data/x-12345678)
        // also matches the current-key suffix shape and is skipped —
        // unreclaimed space, never data loss. Verifying by recomputing
        // the key hash from a recorded raw path would close it, but no
        // legacy dir recorded its raw path, so the name shape is the
        // only signal available.
        if (Files.isDirectory(child) && suffixed.findFirstIn(name).isEmpty) {
          var isOurs = false
          Dirs.withList(child)(_.forEach { store =>
            if (Files.exists(store.resolve("_SOURCE_FINGERPRINT"))) isOurs = true
          })
          if (isOurs) { deleteRecursively(child); removed += 1 }
        }
      } catch {
        case _: java.io.IOException | _: java.nio.file.DirectoryIteratorException => ()
      }
      })
    } catch {
      // see gcLegacy: the OUTER stream's iterator can also throw when
      // the root itself races a deleter — never escape into the
      // /admin/compact response after compaction already succeeded
      case _: java.io.IOException | _: java.nio.file.DirectoryIteratorException => ()
    }
    removed
  }

  /** Cheap filesystem fingerprint of a source table (file count, total
    * bytes, max mtime — no Spark job, parquet footers unread). Empty
    * when the source path does not exist; an empty fingerprint means
    * UNKNOWN provenance, not "always current" — see [[isCurrent]].
    */
  def fingerprint(src: String): String = {
    val p = Paths.get(src)
    if (!Files.exists(p)) return ""
    var n = 0L; var bytes = 0L; var mtime = 0L
    def visit(q: Path): Unit =
      if (Files.isDirectory(q)) Dirs.withList(q)(_.forEach(visit))
      else {
        n += 1; bytes += Files.size(q)
        mtime = math.max(mtime, Files.getLastModifiedTime(q).toMillis)
      }
    visit(p)
    s"${n}_${bytes}_$mtime"
  }

  private def stampFile(storePath: String) = Paths.get(storePath, "_SOURCE_FINGERPRINT")

  /** Stamp content recorded when the source path did not exist at build
    * time (non-file-backed frame): the store is served until the source
    * becomes fingerprintable, at which point it rebuilds once.
    */
  private val UnknownSource = "unknown-source"

  /** A built store is current when its recorded source fingerprint
    * matches the source's current one. A store without a stamp is NOT
    * current (one forced rebuild re-stamps it) — serving a silently
    * stale store is the failure mode this exists to prevent. An empty
    * (unknown) fingerprint is current only against an unknown-source
    * stamp: a store built FROM files never silently serves a caller
    * whose source path vanished, and vice versa — each such transition
    * costs one rebuild, never a stale read.
    */
  def isCurrent(storePath: String, fp: String): Boolean = {
    val want = if (fp.isEmpty) UnknownSource else fp
    Files.exists(stampFile(storePath)) &&
      new String(Files.readAllBytes(stampFile(storePath))) == want
  }

  def stamp(storePath: String, fp: String): Unit =
    Files.write(stampFile(storePath), (if (fp.isEmpty) UnknownSource else fp).getBytes)
}
