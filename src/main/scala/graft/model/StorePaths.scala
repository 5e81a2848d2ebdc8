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

  def key(sfDir: String): String = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Cheap filesystem fingerprint of a source table (file count, total
    * bytes, max mtime — no Spark job, parquet footers unread). Empty
    * when the source path does not exist, which disables staleness
    * checking for stores built from non-file sources.
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

  /** A built store is current when its recorded source fingerprint
    * matches the source's current one. A store without a stamp is NOT
    * current (one forced rebuild re-stamps it) — serving a silently
    * stale store is the failure mode this exists to prevent.
    */
  def isCurrent(storePath: String, fp: String): Boolean =
    fp.isEmpty || (Files.exists(stampFile(storePath)) &&
      new String(Files.readAllBytes(stampFile(storePath))) == fp)

  def stamp(storePath: String, fp: String): Unit =
    if (fp.nonEmpty) Files.write(stampFile(storePath), fp.getBytes)
}
