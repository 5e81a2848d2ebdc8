package graft.model

import java.io.RandomAccessFile
import java.nio.channels.FileLock
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Versioned, snapshot-readable graph storage — the Spark rebuild of
  * the reference's MVCC + OCC transaction machinery (reference
  * transactions.lisp: archive/resolve 410-468, validate 236-246, apply
  * 958-1003; node revision fields node-class.lisp:176-182).
  *
  * Model (SURVEY.md §1.4/§7.2 step 7): each table is an append-only set
  * of row *versions* `(id, rev, deleted, props…)` laid out as
  * `dir/<label>/commit_epoch=<e>/part-*.parquet`. A single pointer file
  * `_epoch` holds the last committed epoch:
  *
  *   - **Atomic multi-table commits**: data files land first, the
  *     pointer bump is last (temp file + atomic rename). Readers filter
  *     `commit_epoch <= pointer`, so a crashed half-written commit is
  *     never visible — the all-indexes-in-one-commit guarantee of
  *     transactions.lisp:958-1003.
  *   - **Snapshot reads**: `read(label, asOf = Some(e))` pins an epoch,
  *     like `:snapshot t` queries (prologc.lisp:1024-1031). Epoch dirs
  *     are partition dirs, so old snapshots prune newer commits at the
  *     file level.
  *   - **OCC**: a commit declares each row's `rev`; validation joins
  *     against the current latest revisions and rejects the commit on
  *     any mismatch (first-committer-wins, the validate step of
  *     transactions.lisp:236-246). Single-writer via a file lock.
  *   - **Soft delete**: a new version with `deleted = true`
  *     (mark-deleted, interface.lisp:15-25).
  *   - **keep-revisions** (schema.lisp:49) → [[vacuum]].
  */
final class VersionedStore(spark: SparkSession, dir: String) {

  Files.createDirectories(Paths.get(dir))
  private val epochPath = Paths.get(dir, "_epoch")

  // ---- on-disk layout versioning (reference README.md:26-33
  // migrate-graph: refuse to open a mismatched layout, offer a
  // migrator). The stamp is written on first open of an empty dir;
  // unstamped dirs holding epoch-partitioned tables are adopted as the
  // current layout (stores written before stamping existed, restored
  // backups); unstamped dirs holding FLAT per-label parquet are the
  // legacy (v1) layout and must go through
  // [[VersionedStore.migrateStore]].
  private val layoutPath = Paths.get(dir, "_layout_version")
  locally {
    def looksLegacyFlat: Boolean =
      Dirs.childNames(Paths.get(dir)).exists { n =>
        !n.startsWith("_") && Files.isDirectory(Paths.get(dir, n)) &&
          Dirs.childNames(Paths.get(dir, n)).exists(c =>
            c.endsWith(".parquet") && !c.startsWith("commit_epoch="))
      }
    if (Files.exists(layoutPath)) {
      val v = Files.readString(layoutPath).trim.toInt
      if (v != VersionedStore.LayoutVersion)
        throw new IllegalStateException(
          s"store at $dir has layout v$v; this engine reads v${VersionedStore.LayoutVersion} — " +
            "run VersionedStore.migrateStore(spark, oldDir, newDir)")
    } else if (looksLegacyFlat)
      throw new IllegalStateException(
        s"store at $dir is an unstamped legacy (flat-table) layout — " +
          "run VersionedStore.migrateStore(spark, oldDir, newDir)")
    else Files.writeString(layoutPath, VersionedStore.LayoutVersion.toString)
  }

  final class ConflictException(msg: String) extends RuntimeException(msg)

  def currentEpoch: Long =
    if (Files.exists(epochPath)) Files.readString(epochPath).trim.toLong else 0L

  // Two lock tiers, both reentrant: a JVM ReentrantLock serializes
  // writer THREADS (FileLock is process-scoped — a second lock() from
  // another thread of the same JVM throws OverlappingFileLockException
  // instead of blocking), and the file lock serializes writer
  // PROCESSES. Reentrancy matters because healVacuum may run under
  // commit's lock.
  private val processLock = new java.util.concurrent.locks.ReentrantLock()
  private def withWriteLock[T](body: => T): T =
    if (processLock.isHeldByCurrentThread) body
    else {
      processLock.lock()
      try {
        val raf = new RandomAccessFile(Paths.get(dir, "_lock").toFile, "rw")
        val lock: FileLock = raf.getChannel.lock()
        try body finally { lock.release(); raf.close() }
      } finally processLock.unlock()
    }

  private def labelDir(label: String) = s"$dir/$label"

  /** All visible row versions of a table as of an epoch. mergeSchema:
    * epoch dirs may carry evolved prop sets (schema.lisp:86-99 allows
    * adding slots); without it the reader would pick one footer's
    * schema and silently drop later columns.
    */
  private def versions(label: String, asOf: Long): DataFrame = {
    if (!tableExists(label)) return spark.emptyDataFrame
    spark.read.option("mergeSchema", "true").parquet(labelDir(label))
      .filter(col("commit_epoch") <= asOf)
  }

  /** Existence check that first completes any interrupted vacuum swap —
    * mid-swap the table dir is briefly absent though the data is safe.
    */
  private[graft] def tableExists(label: String): Boolean = {
    healVacuum(label)
    Files.exists(Paths.get(labelDir(label)))
  }

  private def rmTree(f: java.nio.file.Path): Unit = Dirs.rmTree(f)

  /** Epoch dirs above the committed pointer are invisible garbage by
    * construction (crashed/failed commits: data landed, pointer never
    * bumped). They MUST be removed before a new commit writes, or the
    * new commit's epoch dir would adopt the orphan rows the moment the
    * pointer bumps — and a retry of the failed commit would append
    * duplicate versions.
    */
  private def dropOrphanEpochs(label: String, committed: Long): Unit = {
    val p = Paths.get(labelDir(label))
    Dirs.childNames(p).foreach { n =>
      if (n.startsWith("commit_epoch=") &&
          scala.util.Try(n.stripPrefix("commit_epoch=").toLong).toOption.exists(_ > committed))
        rmTree(p.resolve(n))
    }
  }

  /** Latest visible (non-deleted) version of each row — the default
    * read view. `asOf` pins a snapshot epoch (time travel).
    *
    * Latest-state reads go through the [[current-state index|currentRead]]
    * when it exists: cost is O(current + recent deltas) instead of a
    * window over the FULL version history — at scale, a table with a
    * long MVCC past must not pay for it on every read. The reference
    * maintains its indexes at write time for the same reason
    * (transactions.lisp apply phase); snapshot (`asOf`) reads keep the
    * history path, which epoch-dir pruning already bounds.
    */
  def read(label: String, asOf: Option[Long] = None): DataFrame = asOf match {
    case Some(e) => historyRead(label, e)
    case None if curEnabled && Files.exists(curRoot(label)) && tableExists(label) =>
      currentRead(label)
    case None => historyRead(label, currentEpoch)
  }

  private def historyRead(label: String, epoch: Long): DataFrame = {
    if (!tableExists(label)) return spark.emptyDataFrame
    val w = Window.partitionBy("id").orderBy(col("rev").desc)
    versions(label, epoch)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !col("deleted"))
      .drop("__rn")
  }

  /** Full version history (the MVCC chain; mvcc-tests analog). */
  def history(label: String): DataFrame = versions(label, currentEpoch)

  /** Write-telemetry report — the reference's stats surface
    * (stats.lisp:3-18 `graph-writes-report`: sorted (time, writes)
    * pairs per graph) re-derived from the versioned layout itself: one
    * row per (table, commit_epoch) with its staged row-version count
    * and commit wall-clock (the epoch directory's mtime). The commit
    * log IS the statistic — no in-memory counters to maintain, lose on
    * restart, or sync across a cluster; epochs above the committed
    * pointer (crashed commits) are excluded exactly as readers exclude
    * them. Read-side telemetry is deliberately NOT mirrored: the
    * reference counts reads because it is the in-process server
    * (stats.lisp:20-35); here reads are Spark jobs, whose metrics the
    * Spark UI / listener bus already reports per scan.
    *
    * `fromEpochExclusive` bounds the report to recent commits: the
    * report is one row per (table, epoch), so an UNWINDOWED report on
    * a long-lived store materializes its whole commit history — a
    * telemetry poll must stay O(window), not O(store age). Epoch dirs
    * are partition dirs, so the window prunes at the file level.
    */
  def writeReport(fromEpochExclusive: Long = 0L): DataFrame = {
    import spark.implicits._
    val committed = currentEpoch
    val tables = Dirs.childNames(Paths.get(dir))
      .filter(n => !n.startsWith("_") && !n.endsWith("__cur") &&
        // crashed-vacuum leftovers keep their epoch dirs until the next
        // vacuum reaps them (healVacuum no longer reaps on reads — r17)
        !n.endsWith("__vacuum_tmp") && !n.endsWith("__vacuum_old") &&
        Files.isDirectory(Paths.get(labelDir(n))) &&
        Dirs.childNames(Paths.get(labelDir(n))).exists(_.startsWith("commit_epoch=")))
      .sorted
    val meta = tables.flatMap { t =>
      Dirs.childNames(Paths.get(labelDir(t)))
        .filter(_.startsWith("commit_epoch="))
        .map(_.stripPrefix("commit_epoch=").toLong)
        .filter(e => e <= committed && e > fromEpochExclusive)
        .map { e =>
          val mtime = Files.getLastModifiedTime(
            Paths.get(labelDir(t), s"commit_epoch=$e")).toMillis
          (t, e, mtime)
        }
    }
    val mtimes = meta.toDF("table", "commit_epoch", "__mtime_ms")
    val counts = tables.map { t =>
      versions(t, committed)
        .filter(col("commit_epoch") > fromEpochExclusive)
        .groupBy(col("commit_epoch"))
        .agg(count(lit(1)).as("rows")).withColumn("table", lit(t))
    }.reduceOption(_ unionByName _)
      .getOrElse(Seq.empty[(String, Long, Long)].toDF("table", "commit_epoch", "rows"))
    counts.join(broadcast(mtimes), Seq("table", "commit_epoch"))
      .select(col("table"), col("commit_epoch"), col("rows"),
        (col("__mtime_ms") / 1000).cast("timestamp").as("committed_at"))
      .orderBy("table", "commit_epoch")
  }

  // ---- current-state index --------------------------------------------
  //
  // Layout per table (sibling of the table dir):
  //   <label>__cur/_epoch                   marker: epochs folded in
  //   <label>__cur/base/                    latest version per id as of
  //                                         the last compaction (incl.
  //                                         tombstones), epoch-partitioned
  //   <label>__cur/delta/commit_epoch=N/    per-commit latest rows
  //
  // The index is OPT-IN per table — [[compactCurrent]] bootstraps it —
  // so write-heavy tables that never read latest state pay nothing.
  // Maintenance happens AFTER the pointer bump, under the write lock —
  // so index rows never describe an uncommitted epoch. A crash between
  // bump and index append just leaves the marker behind; readers heal
  // by overlaying changesSince(marker, epoch) (delta-sized), and the
  // next commit persists the catch-up. Reads merge base + overlays at
  // id granularity (newest (epoch, rev) wins), so the per-read window
  // runs over delta-sized data only. Deltas auto-compact into base
  // when they accumulate.

  private def curEnabled: Boolean =
    spark.conf.get("graft.store.currentIndex", "true").toBoolean
  private def curRoot(label: String) = Paths.get(s"${labelDir(label)}__cur")
  // the index materialization is GENERATION-versioned (GenDirs, under
  // bases/): each compaction publishes a fresh generation carrying its
  // OWN base and delta log, so lock-free readers racing a compaction
  // never lose their listed files — neither the base (the old in-place
  // swap) nor delta epoch dirs (the old per-epoch grace cleanup could
  // delete a dir between a reader's listing passes; both races were
  // caught by ConcurrentStormSpec). A generation's delta only carries
  // epochs past its own base by construction, and the whole
  // generation survives until swept two publishes later. The catch-up
  // overlay heals any torn visibility of an in-flight delta append.
  // Legacy stores (flat base/ + delta/ under the root) read as-is
  // until their first post-upgrade compaction.
  private def curBases(label: String) = curRoot(label).resolve("bases")
  private def curGenDir(label: String): java.nio.file.Path = {
    val r = curBases(label)
    if (Files.exists(r.resolve("_GEN"))) GenDirs.current(r)
    else curRoot(label)
  }
  private def curBase(label: String): java.nio.file.Path =
    curGenDir(label).resolve("base")
  private def curDelta(label: String): java.nio.file.Path =
    curGenDir(label).resolve("delta")

  private def readMarker(p: java.nio.file.Path): Long =
    if (Files.exists(p)) Files.readString(p).trim.toLong else 0L
  private def writeMarker(p: java.nio.file.Path, e: Long): Unit = {
    val tmp = p.resolveSibling(s"${p.getFileName}.tmp.$e")
    Files.writeString(tmp, e.toString)
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
  /** Highest epoch persisted into the index (base or delta). */
  private def curMarker(label: String): Long =
    readMarker(curRoot(label).resolve("_epoch"))
  /** Epochs folded into base/ by the last compaction. */
  private def curBaseEpoch(label: String): Long =
    readMarker(curRoot(label).resolve("_base_epoch"))

  private def curDeltaEpochs(label: String): Seq[Long] =
    Dirs.childNames(curDelta(label))
      .filter(_.startsWith("commit_epoch="))
      .flatMap(n => scala.util.Try(n.stripPrefix("commit_epoch=").toLong).toOption)

  /** Persist one commit's rows (plus any crash-missed epochs) into the
    * index. Caller holds the write lock.
    *
    * r17 (guide §1.2 — the micro-commit latency is a count of Spark
    * actions): the index delta is no longer a SECOND parquet write of
    * the same rows. A table epoch dir and its index delta epoch dir
    * hold byte-identical data files by construction — both are the
    * staged frame's columns, with `commit_epoch` living in the
    * directory name — so the delta log is populated by HARD-LINKING
    * the data files the commit just wrote (zero Spark jobs, one inode
    * per file). This also covers crash catch-up: every missed epoch in
    * `(marker, toEpoch]` links from its table epoch dir. An epoch
    * whose files already landed in the delta (crash between delta
    * append and marker bump) links idempotently — same file name, same
    * content, skipped. A mid-linking crash leaves only COMPLETE
    * parquet files (links are atomic per file), whose rows the
    * catch-up overlay duplicates until the marker bumps; the
    * latest-(epoch, rev) window dedups them, exactly as it already
    * dedups a torn delta write.
    */
  private def appendCurrentDelta(label: String, toEpoch: Long): Unit = {
    val marker = curMarker(label)
    if (marker >= toEpoch) return
    Files.createDirectories(curRoot(label))
    ((marker + 1) to toEpoch).foreach { e =>
      val src = Paths.get(labelDir(label), s"commit_epoch=$e")
      if (Files.isDirectory(src)) {
        val dst = curDelta(label).resolve(s"commit_epoch=$e")
        Files.createDirectories(dst)
        Dirs.childNames(src).filter(_.endsWith(".parquet")).foreach { f =>
          try Files.createLink(dst.resolve(f), src.resolve(f))
          catch {
            case _: java.nio.file.FileAlreadyExistsException => // idempotent
            case _: UnsupportedOperationException =>
              // cross-device or linkless filesystem: plain copy
              Files.copy(src.resolve(f), dst.resolve(f),
                StandardCopyOption.REPLACE_EXISTING)
          }
        }
      }
    }
    writeMarker(curRoot(label).resolve("_epoch"), toEpoch)
    // bound the read-side merge: fold deltas into base when they pile up
    if (curDeltaEpochs(label).count(_ > curBaseEpoch(label)) >= 32) compactCurrent(label)
  }

  /** Latest version per id INCLUDING tombstones, from the index plus a
    * non-persistent catch-up overlay for epochs past the marker. Deltas
    * at or below the base coverage epoch are redundant with base and
    * filtered out — they are retained on disk for one compaction cycle
    * so lazy reader plans built before a compaction still find their
    * files (see [[compactCurrent]]).
    */
  private def currentVersions(label: String): DataFrame = {
    curHeal(label)
    // resolve the GENERATION once per read: base and delta from the
    // same dir, so the read never straddles a concurrent compaction.
    // One-generation sweep grace covers prompt consumption; a plan
    // held across compaction cycles uses withPinnedRead
    currentVersionsIn(label, curGenDir(label))
  }

  /** LEASED latest-state read (GenDirs reader pins): the generation
    * backing the frame handed to `body` is pinned against the
    * compaction sweeper until `body` returns — the shape for an
    * analytical read that may outlive the auto-compaction riding the
    * write path (every ~32 delta epochs a hot table publishes a new
    * generation; two publishes used to strand a slow reader's plan).
    * Build AND consume the read inside `body` — bodies may run
    * arbitrarily long: the lease heartbeats (GenDirs.withLease), so
    * reads outliving the pin TTL keep protection. Tables without a
    * generation-versioned index (legacy/opted-out) fall back to the
    * plain read — their layouts are append-only or healed in place,
    * not swept.
    */
  def withPinnedRead[T](label: String)(body: DataFrame => T): T = {
    if (curEnabled && Files.exists(curRoot(label)) && tableExists(label) &&
        Files.exists(curBases(label).resolve("_GEN"))) {
      curHeal(label)
      GenDirs.withLease(curBases(label)) { g =>
        val cur = currentVersionsIn(label, g)
        body(if (cur.columns.isEmpty) cur else cur.filter(!col("deleted")))
      }
    } else body(read(label))
  }

  private def currentVersionsIn(label: String, g: java.nio.file.Path): DataFrame = {
    val epoch = currentEpoch
    val marker = curMarker(label)
    val baseEpoch = curBaseEpoch(label)
    val basePath = g.resolve("base")
    val deltaPath = g.resolve("delta")
    val base: Option[DataFrame] =
      if (Files.exists(basePath))
        Some(spark.read.option("mergeSchema", "true").parquet(basePath.toString))
      else None
    val deltas: Option[DataFrame] =
      // visible-parquet guard beside the dir-name gate: an epoch dir a
      // concurrent commit is still writing has nothing to infer a
      // schema from (the storm-suite race class); its rows are covered
      // by the catch-up overlay below until the marker bumps
      if (Dirs.hasReadableDeltaFiles(deltaPath))
        Some(spark.read.option("mergeSchema", "true").parquet(deltaPath.toString)
          .filter(col("commit_epoch") > baseEpoch))
      else None
    val catchUp: Option[DataFrame] =
      if (marker < epoch && tableExists(label)) Some(changesSince(label, marker, epoch))
      else None
    val overlay = (deltas.toSeq ++ catchUp.toSeq)
      .reduceOption(_.unionByName(_, allowMissingColumns = true))
    (base, overlay) match {
      case (None, None) => spark.emptyDataFrame
      case (Some(b), None) => b
      case (bOpt, Some(o)) =>
        val w = Window.partitionBy("id")
          .orderBy(col("commit_epoch").desc, col("rev").desc)
        val latestOverlay = o.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        bOpt match {
          case None => latestOverlay
          case Some(b) =>
            b.join(o.select("id").distinct(), Seq("id"), "left_anti")
              .unionByName(latestOverlay, allowMissingColumns = true)
        }
    }
  }

  private def currentRead(label: String): DataFrame = {
    val cur = currentVersions(label)
    if (cur.columns.isEmpty) cur else cur.filter(!col("deleted"))
  }

  /** Complete an interrupted LEGACY-layout compaction swap. Once the
    * base is generation-versioned (a `_GEN` pointer exists under
    * bases/), publishes are crash-safe by construction (GenDirs) and
    * this is a no-op.
    */
  private def curHeal(label: String): Unit = {
    if (Files.exists(curBases(label).resolve("_GEN"))) return
    val b = curRoot(label).resolve("base"); val old = curRoot(label).resolve("base__old")
    if (!Files.exists(b) && Files.exists(old)) withWriteLock {
      if (!Files.exists(b) && Files.exists(old))
        Files.move(old, b, StandardCopyOption.ATOMIC_MOVE)
    }
    if (Files.exists(b)) {
      rmTree(curRoot(label).resolve("base__old"))
      rmTree(curRoot(label).resolve("base__tmp"))
    }
  }

  /** Bootstrap the index for a table, or fold accumulated index deltas
    * into the base materialization.
    *
    * Reader-safety: the fold publishes a fresh GENERATION (base +
    * empty delta log) and never deletes anything the superseded
    * generation's readers may hold — base and delta dirs of the
    * previous generation survive intact until the publish AFTER this
    * one (GenDirs' grace discipline). Lazy plans built pre-publish
    * keep every file they listed for a full compaction cycle, instead
    * of hitting FileNotFoundException when an auto-compaction fires on
    * the write path or a reader's listing races a per-epoch cleanup.
    */
  def compactCurrent(label: String): Unit = withWriteLock {
    if (!tableExists(label)) return
    curHeal(label)
    val epoch = currentEpoch
    val merged = currentVersions(label)
    if (merged.columns.isEmpty) return
    Files.createDirectories(curRoot(label))
    // publish the fresh base as the next GENERATION (GenDirs): the
    // pointer flip is atomic, the previous generation — base AND its
    // delta log — stays on disk as reader grace until the publish
    // after this one, and lock-free reads racing this compaction keep
    // every file they listed. The new generation starts with an empty
    // delta log (this base folds everything through `epoch`).
    GenDirs.publish(curBases(label)) { g =>
      merged.write.mode("overwrite").partitionBy("commit_epoch")
        .parquet(g.resolve("base").toString)
    }
    // the pre-generation flat layout (if any) is now unreachable by
    // new reads; from the SECOND generation on it has had its grace
    // cycle (GenDirs sweeps only under bases/, so the legacy dirs at
    // the index root are cleaned here)
    if (GenDirs.currentGen(curBases(label)) >= 2) {
      Seq("base", "base__old", "base__tmp", "delta")
        .foreach(n => rmTree(curRoot(label).resolve(n)))
    }
    writeMarker(curRoot(label).resolve("_base_epoch"), epoch)
    writeMarker(curRoot(label).resolve("_epoch"), epoch)
  }

  /** Latest (id, rev, deleted) per id INCLUDING tombstones — the
    * revision a successor version must build on. read() hides deleted
    * rows, so rev derivation through it would dead-end a deleted id
    * (recreate-after-delete, interface.lisp:15-25 + vertex.lisp:105).
    */
  def latestRevisions(label: String, asOf: Option[Long] = None): DataFrame = {
    if (!tableExists(label))
      return spark.range(0).select(col("id"), lit(0L).as("rev"), lit(false).as("deleted"))
    // the current-state index IS (latest version per id incl.
    // tombstones), so rev derivation — which runs on every write —
    // rides it too for opted-in tables; a PINNED epoch (transaction
    // snapshot isolation — GraphStore.Txn derives its revisions from
    // its creation-time snapshot so a racing commit conflicts instead
    // of silently absorbing a stale read-modify-write) takes the
    // history path, which epoch-dir pruning bounds
    if (asOf.isEmpty && curEnabled && Files.exists(curRoot(label)))
      return currentVersions(label).select("id", "rev", "deleted")
    val w = Window.partitionBy("id").orderBy(col("rev").desc)
    versions(label, asOf.getOrElse(currentEpoch)).select("id", "rev", "deleted")
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** [[latestRevisions]] scoped to one id set at a PINNED epoch — the
    * transaction write path's rev derivation. The pinned epoch cannot
    * ride the current-state index (the index is latest-state only, and
    * serving a snapshot from it would re-open the stale-read-modify-
    * write window the pin exists to close), so the history path is
    * semi-joined down to the STAGED ids before the per-id window:
    * cost is the staged ids' version chains plus one epoch-pruned
    * scan, not a window over the table's full history.
    */
  def latestRevisionsFor(label: String, ids: DataFrame, asOf: Long): DataFrame = {
    if (!tableExists(label))
      return spark.range(0).select(col("id"), lit(0L).as("rev"), lit(false).as("deleted"))
    val w = Window.partitionBy("id").orderBy(col("rev").desc)
    versions(label, asOf).select("id", "rev", "deleted")
      .join(ids.select("id").distinct(), Seq("id"), "left_semi")
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Atomically commit one batch of row versions across any number of
    * tables. Each frame must have (id: Long, rev: Long, deleted:
    * Boolean, props…). Rev contract: 1 for a new id, latest+1 for an
    * update/delete of an existing id; anything else → ConflictException
    * (OCC validation). Returns the new epoch.
    */
  def commit(writes0: => Map[String, DataFrame]): Long = commitWithFrames(writes0)._1

  /** [[commit]], also returning the materialized staged frames — the
    * per-table `(id, rev, deleted, props…)` versions exactly as
    * written. Commit hooks (incremental view maintenance, replication)
    * consume these instead of re-executing the staged plans, whose
    * rev-derivation reads would resolve against the NEW epoch after
    * the pointer bump and recompute different revisions.
    */
  def commitWithFrames(writes0: => Map[String, DataFrame]): (Long, Map[String, DataFrame]) = {
    val (epoch, frames, _) = commitCaptures(writes0, Set.empty)
    (epoch, frames)
  }

  /** [[commitWithFrames]], additionally returning — for the requested
    * tables — the PRE-commit live rows of every staged id, captured
    * and MATERIALIZED (localCheckpoint) while the write lock is still
    * held. Commit hooks that need superseded values (the maintained
    * statistics tier's signed deltas) consume THESE instead of an
    * asOf(epoch−1) read at hook time: hooks run after the lock is
    * released, so a concurrent `vacuum(keep=1)` — which keeps only
    * each id's newest revision, post-bump the just-committed one —
    * could destroy the superseded revisions between the pointer bump
    * and the hook's read. A frame captured under the lock is immune:
    * vacuum also takes the write lock, and once materialized the
    * frame no longer reads the table's files at all. Cost: one
    * id-pruned current-state read per captured table per commit —
    * commit-sized, never corpus-sized.
    */
  def commitCaptures(writes0: => Map[String, DataFrame],
      capturePrev: Set[String]): (Long, Map[String, DataFrame], Map[String, DataFrame]) = withWriteLock {
    // by-name (r17): staged plans build INSIDE the write lock, so a
    // path-based read's file listing can never be invalidated by a
    // concurrent vacuum's table-dir swap (vacuum takes the same lock)
    val w0 = writes0
    val base = currentEpoch
    val next = base + 1
    // materialize each staged frame ONCE: staged plans typically embed
    // a read of this table (rev derivation), which would otherwise
    // re-execute for the duplicate check, the OCC validation, and the
    // write — three table scans per commit instead of one
    // strip any stale commit_epoch data column (delete/update staging
    // reads carry it): the partition dir is the one source of truth
    //
    // r17: the checkpoint is LAZY — the validation job below is the
    // materializing action, fusing what were two Spark actions per
    // table (eager-checkpoint count + validation collect) into one
    // (guide §1.2: the micro-commit latency floor is a count of
    // actions). Correctness is unchanged: LocalRDDCheckpointData
    // persists every partition the first action computes and runs a
    // fill-in job for any the action skipped, all BEFORE the pointer
    // bump — so by the time the staged plan's embedded table reads
    // could resolve against the new epoch, the lineage is already
    // truncated onto the materialized blocks.
    //
    // Everything commit-internal executes under a dedicated child
    // session with AQE OFF (VersionedStore.commitSession): the staged
    // and validation frames are DELTA-sized by design (micro-batch
    // commits against the O(current+delta) index), and under AQE every
    // materialized exchange of the rev-derivation/validation plan is
    // its own scheduled job — measured 13 jobs ≈ 1.0 s per tiny commit
    // at the local job floor, vs 6 jobs ≈ 0.5 s with one non-adaptive
    // job spanning all stages. That per-stage driver round-trip is
    // latency on ANY cluster, not a local[32] artifact; a deployment
    // committing genuinely huge frames can flip `graft.commit.adaptive`
    // back on. Frames handed to hooks are re-rooted to the caller's
    // session below, so only the commit's own jobs run non-adaptive.
    val cs = commitSession()
    val writes = w0.map { case (l, df) =>
      l -> Bridge.inSession(cs, df.drop("commit_epoch"))
        .localCheckpoint(eager = false) }
    // validate all tables before writing any (atomicity of the commit)
    //
    // ONE validation job for the WHOLE commit (r17 — was one per table,
    // r15 had two per table; each Spark action on the micro-commit path
    // pays the full local job-scheduling floor, so tiny-commit latency
    // is mostly a count of actions — guide §1.2). Per table the grouped
    // pass surfaces BOTH conflict classes: duplicate staging (a txn may
    // touch each row once — two staged versions of one id would both
    // pass rev validation and commit duplicate revisions) and
    // stale/invalid revs. The per-table samples union under a label tag
    // into a single collect, which is ALSO the action that materializes
    // every staged frame's lazy checkpoint.
    val probFrames = writes.map { case (label, df) =>
      require(Set("id", "rev", "deleted").subsetOf(df.columns.toSet),
        s"$label commit frame needs (id, rev, deleted)")
      // OCC validation needs the latest rev per id — index-backed when
      // opted in (O(current+delta)), else a full-history aggregate
      val latest = Bridge.inSession(cs,
        if (!Files.exists(Paths.get(labelDir(label))))
          spark.range(0).select(col("id"), lit(0L).as("cur_rev"))
        else if (curEnabled && Files.exists(curRoot(label)))
          currentVersions(label).select(col("id"), col("rev").as("cur_rev"))
        else versions(label, base).groupBy("id").agg(max("rev").as("cur_rev")))
      df.select(col("id"), col("rev"))
        .join(latest, Seq("id"), "left")
        .withColumn("__ok",
          (col("cur_rev").isNull && col("rev") === 1L) ||
            (col("cur_rev").isNotNull && col("rev") === col("cur_rev") + 1L))
        .groupBy("id")
        .agg(count(lit(1)).as("__n"), min(col("__ok").cast("int")).as("__allok"),
          first(col("rev")).as("__rev"))
        .filter(col("__n") > 1 || col("__allok") === 0)
        // duplicate-staged ids sort FIRST: with >6 problems a bounded
        // sample must still classify the conflict as duplicate staging
        // when any exists (it is the more actionable error), not
        // whichever class happened to land in the sample
        .orderBy(col("__n").desc, col("id"))
        .limit(6)
        .select(lit(label).as("__label"), col("id"), col("__n"), col("__rev"))
    }
    val probs = probFrames.reduceOption(_ unionByName _)
      .map(_.collect()).getOrElse(Array.empty)
    if (probs.nonEmpty) {
      // report for the FIRST staged table with problems (writes
      // iteration order), matching the per-table loop's behavior
      val byLabel = probs.groupBy(_.getString(0))
      writes.keys.find(byLabel.contains).foreach { label =>
        val rows = byLabel(label)
        val dupIds = rows.filter(_.getLong(2) > 1).map(_.get(1))
        if (dupIds.nonEmpty)
          throw new ConflictException(
            s"$label: same id staged twice in one commit (${dupIds.mkString(", ")})")
        val sample = rows.map(r => s"id=${r.get(1)} rev=${r.get(3)}").mkString(", ")
        throw new ConflictException(s"$label: stale/invalid revisions ($sample)")
      }
    }
    // capture pre-commit live values of the staged ids BEFORE any epoch
    // dir is written: still under the lock, pointer still at `base`, so
    // read() resolves the exact state this commit supersedes
    val prev = writes.collect {
      case (label, df) if capturePrev(label) && Files.exists(Paths.get(labelDir(label))) =>
        label -> Bridge.inSession(cs, read(label))
          .join(df.select("id").distinct(), Seq("id"), "left_semi")
          .localCheckpoint(eager = true)
    }
    def writeOne(label: String, df: DataFrame): Unit = {
      // clear any half-written epoch dirs from crashed commits first:
      // we hold the write lock, and anything above `base` is invisible
      dropOrphanEpochs(label, base)
      // bound files-per-commit: version reads touch every file's footer,
      // so commits inheriting wide source partitioning (e.g. 32) would
      // grow the table dir 32 files per epoch and make every subsequent
      // read/validate O(files). Typical OLTP-ish batches are small;
      // genuinely huge commits can raise the cap via conf.
      val parts = spark.conf.get("graft.commit.maxFiles", "8").toInt
      df.coalesce(parts).write.mode("append")
        .parquet(s"${labelDir(label)}/commit_epoch=$next")
    }
    writes.toSeq match {
      case Seq((l, df)) => writeOne(l, df)
      case many =>
        // independent per-table epoch-dir writes OVERLAP (guide §2.6:
        // actions are only sequential because the driver calls them
        // sequentially): each writes its own directory from its own
        // materialized frame, and nothing is visible until the pointer
        // bump below regardless of landing order. A failure anywhere
        // aborts the commit pre-bump; stray epoch dirs from the other
        // writes are invisible orphans that dropOrphanEpochs reclaims.
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        val fs = many.map { case (l, df) => Future(writeOne(l, df)) }
        fs.foreach(Await.result(_, scala.concurrent.duration.Duration.Inf))
    }
    // pointer bump last: temp + atomic rename makes the commit visible
    val tmp = Paths.get(dir, s"_epoch.tmp.$next")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, epochPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // current-state index maintenance for opted-in tables (post-bump:
    // index rows never describe an uncommitted epoch; a crash here only
    // leaves the marker behind, which readers overlay-heal)
    if (curEnabled)
      writes.keys.foreach { l =>
        if (Files.exists(curRoot(l))) appendCurrentDelta(l, next) }
    // hand the (already materialized) frames back under the CALLER's
    // session, so commit hooks plan their own work under the caller's
    // conf (AQE on) — only the commit's internal jobs ran non-adaptive
    (next, writes.map { case (l, df) => l -> Bridge.inSession(spark, df) },
      prev.map { case (l, df) => l -> Bridge.inSession(spark, df) })
  }

  /** Child session for commit-internal execution: AQE off (delta-sized
    * frames gain nothing from adaptivity, and each materialized AQE
    * exchange is its own scheduled job — pure latency on the
    * transactional path), shuffle parallelism from the context.
    * Opt out with `graft.commit.adaptive=true` on the caller session
    * (deployments committing genuinely huge frames).
    */
  private def commitSession(): SparkSession =
    if (spark.conf.get("graft.commit.adaptive", "false").toBoolean) spark
    else VersionedStore.commitSessions.getOrElseUpdate(
      spark.sparkContext.applicationId + "#" + System.identityHashCode(spark), {
        val ns = spark.newSession()
        ns.conf.set("spark.sql.adaptive.enabled", "false")
        ns.conf.set("spark.sql.shuffle.partitions",
          math.max(spark.sparkContext.defaultParallelism, 4).toString)
        // semantics-bearing settings mirror the caller at creation;
        // commits run under the store's write lock, so per-commit
        // re-mirroring below keeps a long-lived session honest
        VersionedStore.mirrorConfs(spark, ns)
        ns
      }) match {
      case s =>
        VersionedStore.mirrorConfs(spark, s)
        s
    }

  /** The commit-log tail for one table: every version row committed in
    * epochs `(fromExclusive, toInclusive]`, commit_epoch column
    * retained. Epoch dirs are partition dirs, so the range filter
    * prunes at the file level — tailing a replica reads only the new
    * commits' files, not the table.
    */
  def changesSince(label: String, fromExclusive: Long, toInclusive: Long): DataFrame = {
    if (!tableExists(label)) return spark.emptyDataFrame
    spark.read.option("mergeSchema", "true").parquet(labelDir(label))
      .filter(col("commit_epoch") > fromExclusive && col("commit_epoch") <= toInclusive)
  }

  /** Snapshot delta between two epochs: one row per id whose VISIBLE
    * state differs between `fromEpoch` and `toEpoch`, classified
    * `added` / `updated` / `deleted` ("what did this range of commits
    * do to the table?" — the audit view of the MVCC chain, the
    * reference's transaction-log inspection re-expressed as a frame).
    * `updated` means a version row landed in the window for an id
    * visible at both endpoints — rev-level semantics, consistent with
    * [[read]]`(asOf)` over the SURVIVING history (vacuum-destroyed
    * revisions are invisible to both surfaces, so diff and asOf can
    * never disagree). An id created and tombstoned inside the window
    * nets out: absent at both endpoints, no row.
    *
    * Scale shape: candidates come from the commit-log tail
    * ([[changesSince]] — epoch-dir pruned, O(window commits), never a
    * table scan at candidate discovery); both endpoint snapshots are
    * left-semi pruned to the candidate ids before the classification
    * join, so the expensive part is bounded by change volume, not two
    * full snapshot materializations.
    */
  def diff(label: String, fromEpoch: Long, toEpoch: Long): DataFrame = {
    require(fromEpoch <= toEpoch,
      s"diff range inverted: $fromEpoch > $toEpoch")
    // contract is an (id, change) frame even for a missing table — a
    // zero-column emptyDataFrame would make callers that select/orderBy
    // those columns (q220 does .orderBy("id")) throw AnalysisException
    if (!tableExists(label))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("change",
            org.apache.spark.sql.types.StringType))))
    val changed = changesSince(label, fromEpoch, toEpoch)
      .select("id").distinct()
    val before = read(label, asOf = Some(fromEpoch))
      .join(changed, Seq("id"), "left_semi")
      .select(col("id"), lit(true).as("__before"))
    val after = read(label, asOf = Some(toEpoch))
      .join(changed, Seq("id"), "left_semi")
      .select(col("id"), lit(true).as("__after"))
    before.join(after, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__before").isNull, lit("added"))
          .when(col("__after").isNull, lit("deleted"))
          .otherwise(lit("updated")).as("change"))
  }

  /** Replica apply: install already-committed version rows verbatim at
    * their original epochs and advance the pointer to `toEpoch` — the
    * slave side of the reference's transaction streaming
    * (transactions.lisp:884-1003; transaction-streaming.lisp:141-170).
    * No OCC validation and no new epoch assignment: the master already
    * validated, and preserving epochs keeps `asOf` snapshots aligned
    * across replicas. Frames must carry a `commit_epoch` column inside
    * the applied range.
    */
  def applyReplicated(toEpoch: Long, writes: Map[String, DataFrame]): Unit = withWriteLock {
    val base = currentEpoch
    require(toEpoch >= base, s"replica pointer would move backwards ($base -> $toEpoch)")
    if (toEpoch > base) {
    writes.foreach { case (label, df) =>
      require(Set("id", "rev", "deleted", "commit_epoch").subsetOf(df.columns.toSet),
        s"$label replica frame needs (id, rev, deleted, commit_epoch)")
      dropOrphanEpochs(label, base)
      val parts = spark.conf.get("graft.commit.maxFiles", "8").toInt
      val rows = df.filter(col("commit_epoch") > base && col("commit_epoch") <= toEpoch)
      // a frame emptied by the range (or a subset filter upstream) must
      // not create the table dir: a parquet dir with zero data files
      // poisons every later read with UNABLE_TO_INFER_SCHEMA
      if (!rows.isEmpty)
        rows.coalesce(parts)
          .write.mode("append").partitionBy("commit_epoch").parquet(labelDir(label))
    }
    val tmp = Paths.get(dir, s"_epoch.tmp.$toEpoch")
    Files.writeString(tmp, toEpoch.toString)
    Files.move(tmp, epochPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    if (curEnabled)
      writes.keys.foreach(l => if (Files.exists(curRoot(l))) appendCurrentDelta(l, toEpoch))
    }
  }

  private def vacuumTmp(label: String) = Paths.get(s"${labelDir(label)}__vacuum_tmp")
  private def vacuumOld(label: String) = Paths.get(s"${labelDir(label)}__vacuum_old")

  /** Finish an interrupted [[vacuum]] swap: label dir gone with `_old`
    * present means a crash between the two renames — restore the
    * original (both copies are complete, original is the conservative
    * choice).
    *
    * r17: healVacuum no longer REAPS leftover `__vacuum_tmp`/`__old`
    * dirs when the table dir is intact. It runs lock-free on every
    * read path (`tableExists`), and that reap raced a concurrent
    * vacuum's in-flight write INTO `__vacuum_tmp` — the write task's
    * attempt dir vanished under it (TASK_WRITE_FAILED "chmod: cannot
    * access ..._temporary/attempt_...", reproduced 5/5 by
    * ServiceFuzzSpec's compaction storm once the r17 commit path made
    * readers fast enough to hit the window). Leftovers from a crashed
    * vacuum are invisible to every read surface and are reaped by the
    * NEXT vacuum, which clears both dirs under the write lock before
    * writing.
    */
  private def healVacuum(label: String): Unit = {
    val lab = Paths.get(labelDir(label))
    if (!Files.exists(lab) && Files.exists(vacuumOld(label))) withWriteLock {
      if (!Files.exists(lab) && Files.exists(vacuumOld(label)))
        Files.move(vacuumOld(label), lab, StandardCopyOption.ATOMIC_MOVE)
    }
  }

  /** Retention: rewrite a table keeping only the newest `keep`
    * revisions per id (the keep-revisions reaper; MVCC archiving
    * transactions.lisp:408-599).
    *
    * Fault tolerance: the compacted copy is fully written to a sibling
    * temp dir first, then swapped in with two renames; a crash at any
    * point leaves either the original or the compacted table intact
    * ([[healVacuum]] completes the swap on next access). Kept rows
    * retain their original `commit_epoch`, so `asOf` snapshot reads of
    * surviving versions still resolve after compaction.
    */
  def vacuum(label: String, keep: Int): Unit = withWriteLock {
    if (!tableExists(label)) return
    val epoch = currentEpoch
    val w = Window.partitionBy("id").orderBy(col("rev").desc)
    val kept = versions(label, epoch)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= keep)
      .drop("__rn")
    rmTree(vacuumTmp(label)); rmTree(vacuumOld(label))
    kept.write.mode("overwrite").partitionBy("commit_epoch")
      .parquet(vacuumTmp(label).toString)
    val lab = Paths.get(labelDir(label))
    Files.move(lab, vacuumOld(label), StandardCopyOption.ATOMIC_MOVE)
    Files.move(vacuumTmp(label), lab, StandardCopyOption.ATOMIC_MOVE)
    rmTree(vacuumOld(label))
  }
}

object VersionedStore {

  private[model] val commitSessions =
    scala.collection.concurrent.TrieMap.empty[String, SparkSession]

  private[model] def mirrorConfs(from: SparkSession, to: SparkSession): Unit =
    Seq("spark.sql.session.timeZone", "spark.sql.ansi.enabled",
      "spark.sql.autoBroadcastJoinThreshold").foreach { k =>
      from.conf.getOption(k).foreach { v =>
        if (!to.conf.getOption(k).contains(v)) to.conf.set(k, v)
      }
    }

  /** Current on-disk layout: epoch-partitioned version dirs
    * (`<label>/commit_epoch=<e>/part-*.parquet`) + `_epoch` pointer.
    * v1 (legacy) = flat per-label parquet version tables with no epoch
    * partitioning.
    */
  val LayoutVersion = 2

  /** Replay-based migration (reference README.md:26-33 migrate-graph):
    * read each legacy flat table's version rows and re-install them in
    * a FRESH v2 store at their original epochs (a `commit_epoch`
    * column is honored; absent, everything replays as epoch 1). The
    * legacy store is read-only input; the target must be empty. After
    * migration, `read()`, `history` and `asOf` snapshots resolve
    * against the v2 layout exactly as they would have on the source.
    */
  def migrateStore(spark: SparkSession, legacyDir: String, destDir: String): VersionedStore = {
    val src = Paths.get(legacyDir)
    require(Files.isDirectory(src), s"no store at $legacyDir")
    val dest = new VersionedStore(spark, destDir)
    require(dest.currentEpoch == 0, s"migration target $destDir is not empty")
    val labels = Dirs.childNames(src).filter { n =>
      !n.startsWith("_") && !n.endsWith("__cur") &&
        !n.endsWith("__vacuum_tmp") && !n.endsWith("__vacuum_old") &&
        Files.isDirectory(src.resolve(n))
    }
    val frames = labels.map { l =>
      val df0 = spark.read.parquet(s"$legacyDir/$l")
      val df =
        if (df0.columns.contains("commit_epoch"))
          df0.withColumn("commit_epoch", col("commit_epoch").cast("long"))
        else df0.withColumn("commit_epoch", lit(1L))
      l -> df
    }.toMap
    val maxEpoch = frames.values.map { df =>
      if (df.isEmpty) 0L else df.agg(max("commit_epoch")).head().getLong(0)
    }.maxOption.getOrElse(0L)
    val legacyPtr = {
      val p = src.resolve("_epoch")
      if (Files.exists(p)) Files.readString(p).trim.toLong else 0L
    }
    val to = math.max(maxEpoch, legacyPtr)
    if (to > 0) dest.applyReplicated(to, frames.filter(f => !f._2.isEmpty))
    dest
  }
}
