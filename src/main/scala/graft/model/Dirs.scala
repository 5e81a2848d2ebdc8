package graft.model

import java.nio.file.{Files, Path}

/** Directory helpers with correct stream hygiene: `Files.list` opens a
  * DirectoryStream whose file descriptor is released only on close —
  * leaking one per call on a hot read path exhausts fds in a
  * long-lived process.
  */
private[graft] object Dirs {

  def withList[T](p: Path)(f: java.util.stream.Stream[Path] => T): T = {
    val s = Files.list(p)
    try f(s) finally s.close()
  }

  def childNames(p: Path): Seq[String] =
    if (!Files.exists(p)) Seq.empty
    else withList(p) { s =>
      val b = Seq.newBuilder[String]
      s.forEach(c => b += c.getFileName.toString)
      b.result()
    }

  def rmTree(f: Path): Unit = if (Files.exists(f)) {
    if (Files.isDirectory(f))
      withList(f)(s => s.forEach(rmTree))
    Files.delete(f)
  }

  /** True when a `delta/commit_epoch=N/` log has at least one READABLE
    * parquet data file. Dir-name existence alone races a commit hook
    * mid-write: a just-created epoch dir whose files still sit under
    * the write job's `_temporary` staging has nothing to infer a
    * schema from, and a merged read would throw UNABLE_TO_INFER_SCHEMA
    * (observed on ConcurrentStormSpec's reader threads). With zero
    * visible files the merged read serves the base alone — a moment
    * stale, exactly as if the read had run before that commit.
    */
  def hasReadableDeltaFiles(deltaPath: Path): Boolean =
    childNames(deltaPath).filter(_.startsWith("commit_epoch=")).exists { e =>
      childNames(deltaPath.resolve(e)).exists(_.endsWith(".parquet"))
    }
}
