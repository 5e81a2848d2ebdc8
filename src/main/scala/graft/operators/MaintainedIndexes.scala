package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.{Dirs, GraphStore}

/** Write-path maintenance for the pipeline indexes — the dedup
  * signature store and the written ANN bucket store stay fresh across
  * [[GraphStore]] commits, the same in-commit guarantee the views
  * subsystem already gives (Views.bindTo; reference
  * transactions.lisp:601-744 maintains every index inside the
  * transaction's apply phase).
  *
  * Both indexes use the views' delta-log layout: an immutable `base/`
  * materialization plus one tiny `delta/commit_epoch=<e>/` partition
  * per store commit that touched the source label, superseded at id
  * granularity (newest epoch wins, tombstoned ids vanish). `rebuild()`
  * doubles as compaction: it folds all deltas into a fresh base and
  * clears them.
  *
  * Scale design: a commit's delta write touches only the commit's own
  * staged rows — no source rescan, no base rewrite. Reads merge base
  * with the (small) delta log: the signature index via one id-window
  * over the deltas plus a broadcast anti-join on base; the ANN store
  * via a max-epoch tombstone broadcast. At 100 TB this is the LSM
  * discipline every maintained secondary index uses; periodic
  * `rebuild()` bounds the merge cost exactly like view regeneration.
  *
  * Concurrency contract: each index instance serializes its own
  * maintenance — `rebuild()` (compaction, which clears the delta log)
  * and the bound commit hook (which appends to it) take the instance's
  * maintenance monitor, so a hook's delta can never be deleted by a
  * compaction whose base was computed from a pre-commit snapshot. The
  * store's epoch pointer bumps BEFORE hooks run, so a rebuild that wins
  * the monitor after a commit reads post-commit state and may safely
  * clear that commit's (now-redundant) delta. Across index INSTANCES
  * the contract is single-writer: exactly one bound instance per index
  * directory (the store's own FileLock does not cover hook execution,
  * which runs after the commit lock is released) — ENFORCED at
  * `bind()` time by an exclusive `_BINDER_LOCK` file lock under the
  * index root, so a second binder in this or any other process fails
  * fast instead of silently interleaving delta overwrites with
  * compactions (mirroring VersionedStore's FileLock discipline).
  */
object MaintainedIndexes {

  /** Exclusive binder lock under an index root: held for the binder's
    * JVM lifetime (the OS releases it on process death, so a crashed
    * binder never wedges the directory). `FileChannel.tryLock` covers
    * the cross-process case; the same-JVM double-bind surfaces as
    * OverlappingFileLockException — both become the same fail-fast
    * error. The returned channel is stashed by the caller so the lock
    * stays referenced for the instance's lifetime.
    */
  private[operators] def acquireBinderLock(
      root: java.nio.file.Path): java.nio.channels.FileChannel = {
    Files.createDirectories(root)
    val ch = java.nio.channels.FileChannel.open(root.resolve("_BINDER_LOCK"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    val lock =
      try ch.tryLock()
      catch { case _: java.nio.channels.OverlappingFileLockException => null }
    if (lock == null) {
      ch.close()
      throw new IllegalStateException(
        s"index at $root is already bound by another writer — the maintained-index " +
          "contract is one bound instance per directory (see MaintainedIndexes)")
    }
    ch.write(java.nio.ByteBuffer.wrap(
      s"pid=${ProcessHandle.current().pid()}\n".getBytes(
        java.nio.charset.StandardCharsets.UTF_8)))
    ch
  }

  /** See [[Dirs.hasReadableDeltaFiles]] — the guard every merged
    * base+delta read uses before inferring the delta schema.
    */
  private[operators] def hasReadableDeltas(deltaPath: java.nio.file.Path): Boolean =
    Dirs.hasReadableDeltaFiles(deltaPath)

  /** Replica-side index maintenance: tail a store table's commit log
    * ([[graft.streaming.Streams.commitLogStream]]) and play each
    * commit's rows through the same `applyCommit` path the master-side
    * hook uses — the reference's slaves re-apply the FULL transaction
    * including index maintenance (transactions.lisp:884-1003), so a
    * doc committed on the master becomes a dedup/ANN candidate on the
    * slave without a rebuild. A binder restarted with a fresh
    * streaming checkpoint replays the FULL commit log; each index
    * skips epochs at or below its persisted replay cursor
    * ([[PartitionedDeltaLog.appliedThrough]] — the reference's
    * replication cursor discipline, transactions.lisp:884-1003), so
    * the replay costs a per-epoch marker read, not a re-run of every
    * historical encode job. Re-application past a torn marker stays
    * safe by the newest-epoch-wins merge (same rows, same
    * supersession).
    */
  def followCommitLog(spark: org.apache.spark.sql.SparkSession,
      storeDir: String, table: String,
      appliers: Seq[(Long, DataFrame) => Unit],
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = spark.read.parquet(s"$storeDir/$table").schema
    graft.streaming.Streams.commitLogStream(spark, storeDir, table, schema)
      .writeStream.outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // one micro-batch may carry several commits: apply them in
        // epoch order so supersession epochs stay monotone
        val staged = batch.localCheckpoint(true)
        val epochs = staged.select(col("commit_epoch").cast("long"))
          .distinct().collect().map(_.getLong(0)).sorted
        epochs.foreach { e =>
          val rows = staged.filter(col("commit_epoch") === e).drop("commit_epoch")
          appliers.foreach(_(e, rows))
        }
        ()
      }.start()
  }

  /** Latest-wins merge of a `(id-keyed base, delta log)` pair where
    * delta rows carry `commit_epoch` and a boolean `__tomb` marker.
    */
  private[operators] def mergeDeltas(base: DataFrame, deltas: DataFrame,
      cols: Seq[String]): DataFrame = {
    val latest = deltas
      .withColumn("__me", max("commit_epoch").over(Window.partitionBy("id")))
      .filter(col("commit_epoch") === col("__me") && !col("__tomb"))
      .select(cols.map(col): _*)
    base.join(deltas.select("id").distinct(), Seq("id"), "left_anti")
      .select(cols.map(col): _*)
      .unionByName(latest)
  }
}

/** Persisted MinHash signature index over a store-held document label,
  * maintained in-commit. `frame()` is a drop-in `sigs` argument for
  * [[Dedup.minhashNearDups]]: a document committed one statement ago
  * is already a dedup candidate — no rebuild, no full re-shingle.
  *
  * (The catalog's session-cache variant — CatalogPipeline.docSignatures
  * — is the unbound case for static file datasets; this is the bound
  * case for mutable stores.)
  */
final class SignatureIndex(gs: GraphStore, label: String, textCol: String,
    storageDir: String, k: Int = 3, numHashes: Int = 24) {

  private val spark = gs.spark
  private val table = gs.tableFor(label)
  private val maintLock = new Object // see MaintainedIndexes concurrency contract
  private val root = Paths.get(storageDir, "sigindex", label)
  // base/delta live inside the current GENERATION dir (Dirs.GenDirs):
  // compaction publishes a fresh generation instead of swapping base
  // in place, so probes racing a rebuild never lose their files
  private def deltaPathNow = graft.model.GenDirs.current(root).resolve("delta")
  private def appliedThroughFile = root.resolve("_APPLIED_THROUGH")
  private var binderLock: java.nio.channels.FileChannel = _

  /** Replay cursor — see [[PartitionedDeltaLog.appliedThrough]]. */
  private def appliedThrough: Long =
    try {
      if (Files.exists(appliedThroughFile))
        new String(Files.readAllBytes(appliedThroughFile),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      else 0L
    } catch { case _: NumberFormatException => 0L }

  private def recordApplied(epoch: Long): Unit =
    if (epoch > appliedThrough) {
      Files.createDirectories(root)
      Files.write(appliedThroughFile, epoch.toString.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    }

  /** Full (re)materialization from the store's current state; clears
    * (compacts away) any accumulated deltas.
    */
  def rebuild(): Unit = maintLock.synchronized {
    // a store with no committed table yet has nothing to index: a
    // rebuild before the first commit is a graceful no-op (the
    // bound-before-built contract covers catch-up), not an empty-frame
    // crash in the graph read (found by IndexFuzzSpec's random walks)
    if (!gs.store.tableExists(table)) return
    // read the pointer BEFORE materializing: a commit racing the
    // rebuild lands an epoch above this and its delta re-applies
    val through = gs.store.currentEpoch
    val docs = gs.graph().vertices(label)
    graft.model.GenDirs.publish(root) { g =>
      Dedup.signatureFrame(docs, "id", textCol, k, numHashes)
        .withColumnRenamed("doc", "id")
        .write.mode("overwrite").parquet(g.resolve("base").toString)
    }
    recordApplied(through)
  }

  /** Apply one commit's staged row versions `(id, deleted, props…)` —
    * shared by the master-side [[bind]] hook and the replica-side
    * commit-log stream ([[MaintainedIndexes.followCommitLog]]), which
    * is how a slave's index stays fresh without ever rebuilding.
    * Idempotent per epoch content: a replayed commit rewrites the same
    * newest-epoch-wins delta.
    */
  def applyCommit(epoch: Long, staged: DataFrame): Unit = maintLock.synchronized {
    if (epoch <= appliedThrough) return // replayed history — already in base/delta
    val live = staged.filter(!col("deleted"))
      .select(col("id"), col(textCol))
    val rows = Dedup.signatureFrame(live, "id", textCol, k, numHashes)
      .withColumnRenamed("doc", "id")
      .withColumn("__tomb", lit(false))
    // a tombstone per touched id supersedes its old signature even
    // when the new version contributes no row (delete)
    val tombs = staged.select(col("id")).distinct()
      .withColumn("hsh", lit(null).cast("array<long>"))
      .withColumn("sig", lit(null).cast("array<long>"))
      .withColumn("__tomb", lit(true))
    // overwrite, not append: a replayed epoch rewrites the same delta
    // (see PartitionedDeltaLog.appendCommit)
    rows.unionByName(tombs).coalesce(1).write.mode("overwrite")
      .parquet(s"$deltaPathNow/commit_epoch=$epoch")
    recordApplied(epoch)
  }

  /** Wire into the store's write path: every commit touching `label`
    * appends a signature delta for exactly its staged rows. Fails fast
    * if another writer already binds this index directory (see the
    * MaintainedIndexes single-writer contract).
    */
  def bind(): Unit = {
    binderLock = MaintainedIndexes.acquireBinderLock(root)
    gs.onCommit { (epoch, frames) =>
      frames.get(table).foreach(applyCommit(epoch, _))
    }
  }

  /** The fresh signature frame `(doc, hsh, sig)` — base merged with the
    * delta log, newest epoch per id winning. The generation resolves
    * ONCE here, so the read never straddles a concurrent compaction.
    */
  def frame(): DataFrame = {
    val g = graft.model.GenDirs.current(root)
    val basePath = g.resolve("base")
    val deltaPath = g.resolve("delta")
    require(Files.exists(basePath), s"signature index for $label not built — call rebuild()")
    val base = spark.read.parquet(basePath.toString)
    val merged =
      if (!MaintainedIndexes.hasReadableDeltas(deltaPath)) base
      else MaintainedIndexes.mergeDeltas(
        base, spark.read.parquet(deltaPath.toString), Seq("id", "hsh", "sig"))
    merged.withColumnRenamed("id", "doc")
  }

  /** Near-duplicate pairs over the CURRENT store state, served from the
    * maintained index (no re-shingle of unchanged documents).
    */
  def nearDups(bands: Int = 8, threshold: Double = 0.5): DataFrame =
    Dedup.minhashNearDups(gs.graph().vertices(label), "id", textCol,
      k, numHashes, bands, threshold, sigs = Some(frame()))
}

/** The shared delta-log plumbing of the maintained ANN stores: an
  * immutable partitioned `base/` plus ONE per-commit FLAT append under
  * `delta/commit_epoch=<e>/` carrying both the expanded fresh rows and
  * the commit's tombstones (`__tomb` flag). The LSM level split drives
  * the layout: the base is big and long-lived, so it pays the
  * dynamic-partition write once per compaction and probes prune it by
  * directory; deltas are small and commit-latency-critical, so they
  * write as a few bucket-sorted files in a single static dir — a
  * dynamic partitionBy there costs ~15 ms of job-commit per touched
  * directory (≈2 s for a 128-bucket LSH delta, measured), dwarfing the
  * row work, while probes skip inside the flat files just fine via
  * parquet pushdown + min/max rowgroup stats on the sorted bucket
  * column. Supersession is a broadcast join against the max-epoch
  * tombstone per id — an updated vector may move buckets/cells, so its
  * stale row is retired by epoch comparison, not by rewriting the old
  * partition's files. One write job per commit per index (the
  * tombstones riding along also guarantee the delta is never
  * schema-less, so no emptiness probe job either).
  */
private[operators] final class PartitionedDeltaLog(
    spark: org.apache.spark.sql.SparkSession,
    root: java.nio.file.Path, partCols: Seq[String]) {

  // base/delta live inside the current GENERATION dir (GenDirs):
  // compaction publishes a fresh generation instead of swapping base in
  // place, so probes racing a compaction never lose their files.
  // basePath resolves the CURRENT generation — metadata side files
  // (centroids, codebooks) staged into a generation's base dir resolve
  // consistently with the code rows they describe.
  def basePath: java.nio.file.Path =
    graft.model.GenDirs.current(root).resolve("base")
  private def appliedThroughFile = root.resolve("_APPLIED_THROUGH")

  /** Replay cursor: the highest store epoch this index has applied —
    * bumped by every delta append and by compaction (which folds the
    * store's current state into the base). A binder started with a
    * fresh streaming checkpoint skips epochs ≤ this instead of re-
    * running the encode job for every historical commit (the
    * reference's replication cursor discipline; re-applying would be
    * CORRECT by newest-epoch-wins idempotence, just O(total commits)
    * wasted work). Parse-tolerant: a torn marker reads as 0 and costs
    * only idempotent re-application, never a skipped commit.
    */
  def appliedThrough: Long =
    try {
      if (Files.exists(appliedThroughFile))
        new String(Files.readAllBytes(appliedThroughFile),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      else 0L
    } catch { case _: NumberFormatException => 0L }

  def recordApplied(epoch: Long): Unit =
    if (epoch > appliedThrough) {
      Files.createDirectories(root)
      Files.write(appliedThroughFile, epoch.toString.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    }

  /** The log's maintenance monitor (see MaintainedIndexes concurrency
    * contract): owning stores run compaction and commit-hook appends
    * under it so they cannot interleave.
    */
  def locked[T](body: => T): T = this.synchronized(body)

  private var binderChannel: java.nio.channels.FileChannel = _

  /** Claim this directory's exclusive binder lock (idempotent per
    * instance) — see the MaintainedIndexes single-writer contract.
    */
  def acquireBinder(): Unit = this.synchronized {
    if (binderChannel == null)
      binderChannel = MaintainedIndexes.acquireBinderLock(root)
  }

  /** Atomically swap in a fresh base; clears the delta log (compaction).
    * With no partition columns the base is a plain parquet dir — the
    * layout of stores whose probe is a deliberate full compressed scan
    * (PQ codes), where there is nothing to prune by.
    *
    * `stage` runs against the tmp dir BEFORE the atomic move: metadata
    * that must stay consistent with the base (PQ codebooks, IVF
    * centroids) is staged there as an underscore side file (ignored by
    * the parquet reader), so the swap publishes rows and metadata in
    * one rename — written separately, a crash between the two writes
    * would leave codes silently decoded against the wrong quantizer.
    */
  def writeBase(rows: DataFrame,
      stage: java.nio.file.Path => Unit = _ => ()): Unit = {
    graft.model.GenDirs.publish(root) { g =>
      val b = g.resolve("base")
      rows.write.partitionBy(partCols: _*).mode("overwrite").parquet(b.toString)
      stage(b)
    }
  }

  /** One commit's delta in ONE job: `expand(live)` rows flagged
    * `__tomb=false` unioned with one `__tomb=true` row per touched id,
    * written as ≤ `graft.commit.maxFiles` bucket-sorted flat files (no
    * dynamic partitioning — see the class doc for why). The expanded
    * signature/assignment plan executes exactly once — in the write.
    */
  def appendCommit(epoch: Long, live: DataFrame, expand: DataFrame => DataFrame,
      touchedIds: DataFrame): Unit = {
    if (epoch <= appliedThrough) return // replayed history — already in base/delta
    val fresh = expand(live).withColumn("__tomb", lit(false))
    val tombs = touchedIds.select(col("id")).distinct()
      .withColumn("__tomb", lit(true))
    val maxFiles = spark.conf.get("graft.commit.maxFiles", "8").toInt
    val flat = fresh.unionByName(tombs, allowMissingColumns = true)
      .coalesce(maxFiles)
    val sorted =
      if (partCols.isEmpty) flat
      else flat.sortWithinPartitions(partCols.map(col): _*)
    // OVERWRITE the epoch dir, never append to it: one commit = one
    // epoch, so a replayed epoch (foreachBatch retry, replica binder
    // restarted with a fresh checkpoint) REWRITES its delta instead of
    // doubling it — aggregate consumers (posting tf sums, PQ code
    // scans) would otherwise double-count rows that the newest-epoch-
    // wins merge cannot dedupe (same epoch on both copies)
    sorted.write.mode("overwrite").parquet(
      s"${graft.model.GenDirs.current(root).resolve("delta")}/commit_epoch=$epoch")
    recordApplied(epoch)
  }

  /** One generation pinned for one logical read: base, delta, and any
    * metadata side files resolve from the SAME generation dir, so a
    * probe that also reads quantizer metadata (PQ codebooks, IVF
    * centroids) can never mix a new generation's codes with an old
    * generation's quantizer across a racing compaction.
    */
  final class Pinned private[PartitionedDeltaLog] (g: java.nio.file.Path) {
    def basePath: java.nio.file.Path = g.resolve("base")
    def probe(pred: org.apache.spark.sql.Column): DataFrame = probeIn(g, pred)
  }

  /** Pin the current generation (resolve once per logical read).
    * Covered by the ONE-generation sweep grace: right for probes that
    * build and consume their plan promptly. A read that may outlive
    * two compactions (a slow analytical scan, a plan held across
    * stages) must use [[withPinned]] instead.
    */
  def pin(): Pinned = new Pinned(graft.model.GenDirs.current(root))

  /** LEASED pin for long reads: the generation is marked with a
    * reader pin the compaction sweeper respects (GenDirs leases), so
    * the files behind any plan built from this Pinned survive
    * arbitrarily many publishes until `body` returns (or the lease
    * TTL expires for a crashed reader). Build AND consume the read
    * inside `body`.
    */
  def withPinned[T](body: Pinned => T): T =
    graft.model.GenDirs.withLease(root)(g => body(new Pinned(g)))

  /** The live candidate rows under a bucket/cell predicate: the base
    * scan is directory-pruned by it, the (small) delta scan pushes it
    * into parquet rowgroup stats; stale versions are retired by
    * tombstone epoch. The generation resolves ONCE here, so the read
    * never straddles a concurrent compaction.
    */
  def probe(pred: org.apache.spark.sql.Column): DataFrame =
    probeIn(graft.model.GenDirs.current(root), pred)

  private def probeIn(g: java.nio.file.Path,
      pred: org.apache.spark.sql.Column): DataFrame = {
    val basePath = g.resolve("base")
    val deltaPath = g.resolve("delta")
    require(Files.exists(basePath), s"store at $root not built — call rebuild()")
    val base = spark.read.parquet(basePath.toString).filter(pred)
      .withColumn("__ep", lit(0L))
    if (!MaintainedIndexes.hasReadableDeltas(deltaPath)) base
    else {
      val delta = spark.read.parquet(deltaPath.toString)
      val fresh = delta.filter(pred && !col("__tomb"))
        .withColumn("__ep", col("commit_epoch")).drop("commit_epoch", "__tomb")
      val retire = delta.filter(col("__tomb"))
        .groupBy("id").agg(max("commit_epoch").as("__tomb_ep"))
      base.unionByName(fresh)
        .join(broadcast(retire), Seq("id"), "left_outer")
        .filter(col("__tomb_ep").isNull || col("__tomb_ep") <= col("__ep"))
    }
  }
}

/** Commit-maintained inverted index over a store-held document label —
  * the written term-bucket posting store of [[Search.ensurePostingStore]]
  * kept fresh by the write path via the [[PartitionedDeltaLog]]
  * discipline: a document committed one statement ago is already
  * SEARCHABLE (and an updated one ranks by its new terms, a deleted one
  * vanishes) — no rebuild, no corpus re-tokenization. The reference
  * maintains all secondary indexes inside the transaction apply phase
  * (transactions.lisp:601-744); this is that guarantee for keyword
  * search.
  */
final class MaintainedPostingIndex(gs: GraphStore, label: String,
    textCol: String, storageDir: String, nBuckets: Int = 64) {

  private val table = gs.tableFor(label)
  private val log = new PartitionedDeltaLog(gs.spark,
    Paths.get(storageDir, "postindex", label), Seq("tb"))

  /** One commit's index rows, in ONE frame for ONE delta-write job:
    * posting rows (id, term, tf, dl) routed to their term buckets,
    * UNIONED with one doc-length stats row per live doc (term/tf null,
    * dl = token count — 0 for token-less docs, which still dilute idf)
    * under the RESERVED bucket `tb = −1`. BM25's corpus stats are then
    * a partition-pruned read of the −1 dirs with the same tombstone
    * supersession as the postings, and the write path pays no second
    * log (a separate doc-length delta log measured as a whole extra
    * Spark job per commit). `dl` rides every posting row (the written
    * store's denormalization discipline) and joins the groupBy key —
    * constant per id, so no extra shuffle.
    */
  private def postings(rows: DataFrame): DataFrame = {
    val withDl = rows
      .select(col("id"), TextAnalysis.tokens(lower(col(textCol))).as("__toks"))
      .select(col("id"), col("__toks"), size(col("__toks")).cast("long").as("dl"))
    // posexplode: sorted 0-based token positions ride each posting row
    // (the positional payload the phrase probe intersects — the same
    // v3 layout as Search.ensurePostingStore)
    val tf = withDl.select(col("id"), col("dl"), posexplode(col("__toks")))
      .groupBy(col("id"), col("col").as("term"), col("dl"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))
      .withColumn("tb", Sampling.hashBucket(col("term"), nBuckets))
    val dlRows = withDl.select(col("id"), lit(null).cast("string").as("term"),
      lit(null).cast("long").as("tf"), col("dl"),
      lit(null).cast("array<int>").as("positions"), lit(-1L).as("tb"))
    tf.select("id", "term", "tf", "dl", "positions", "tb").unionByName(dlRows)
  }

  /** Full (re)materialization from the store's current state; clears
    * the delta and tombstone logs (compaction).
    */
  def rebuild(): Unit = log.locked {
    // a store with no committed table yet has nothing to index: a
    // rebuild before the first commit is a graceful no-op (the
    // bound-before-built contract covers catch-up), not an empty-frame
    // crash in the graph read (found by IndexFuzzSpec's random walks)
    if (!gs.store.tableExists(table)) return
    val through = gs.store.currentEpoch // before materializing — see appliedThrough
    log.writeBase(postings(
      gs.graph().vertices(label).select(col("id"), col(textCol))))
    log.recordApplied(through)
  }

  /** Apply one commit's staged row versions — shared by [[bind]] and
    * the replica-side [[MaintainedIndexes.followCommitLog]].
    */
  def applyCommit(epoch: Long, staged: DataFrame): Unit = log.locked {
    log.appendCommit(epoch,
      staged.filter(!col("deleted")).select(col("id"), col(textCol)),
      postings, staged)
  }

  /** Wire into the store's write path. Fails fast if another writer
    * already binds this index directory (single-writer contract).
    */
  def bind(): Unit = {
    log.acquireBinder()
    gs.onCommit { (epoch, frames) =>
      frames.get(table).foreach(applyCommit(epoch, _))
    }
  }

  /** Phrase probe over the maintained store — [[Search.rankPhrase]]'s
    * consecutive-position contract against the CURRENT committed
    * state: a doc committed one statement ago phrase-matches, an
    * updated one matches by its new token positions, a deleted one is
    * gone. Bucket-pruned like [[search]].
    */
  def phrase(phraseTerms: Seq[String], k: Int): DataFrame = {
    require(phraseTerms.nonEmpty, "phrase must have at least one term")
    val t = phraseTerms.map(_.toLowerCase) // order and repeats preserved
    val uniq = t.distinct
    val tbs = uniq.map(Search.termBucket(_, nBuckets)).distinct
    Search.rankPhrase(
      log.probe(col("tb").isin(tbs: _*) && col("term").isInCollection(uniq))
        .select("id", "term", "positions"),
      "id", t, k)
  }

  /** Keyword probe over the maintained store — [[Search.rankPostings]]'
    * shared contract served from the bucket-pruned base + delta merge.
    */
  def search(terms: Seq[String], k: Int): DataFrame = {
    val t = Search.normalizeTerms(terms)
    val tbs = t.map(Search.termBucket(_, nBuckets)).distinct
    Search.rankPostings(
      log.probe(col("tb").isin(tbs: _*) && col("term").isInCollection(t)),
      "id", k)
  }

  /** BM25 top-k over the maintained store — [[Search.bm25TopK]]'s
    * integer-exact contract against the CURRENT committed state: a doc
    * committed one statement ago ranks, an updated one ranks by its new
    * text, a deleted one is gone. The posting read is bucket-pruned;
    * df comes from a per-term count over exactly those pruned rows
    * (complete by bucket-routing); n and avgdl aggregate the tb=−1
    * doc-length rows (a partition-pruned read of two longs per doc).
    */
  def bm25(terms: Seq[String], k: Int): DataFrame = {
    val t = Search.normalizeTerms(terms)
    val tbs = t.map(Search.termBucket(_, nBuckets)).distinct
    val stats = log.probe(col("tb") === -1L)
      .agg(count(lit(1)).as("n"), coalesce(sum("dl"), lit(0L)).as("total"))
      .head()
    val n = stats.getLong(0)
    val avgdl = if (n == 0) 0L else stats.getLong(1) / n
    log.probe(col("tb").isin(tbs: _*) && col("term").isInCollection(t))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .withColumn("contrib", expr(
        s"((CAST($n AS BIGINT) * 10000) div df) * " +
          s"((tf * 20000 * CAST($avgdl AS BIGINT)) div (tf * CAST($avgdl AS BIGINT) + dl))"))
      .groupBy("id").agg(sum("contrib").as("score"))
      .orderBy(col("score").desc, col("id")).limit(k)
  }
}

/** Commit-maintained LSH ANN store over a store-held embedding label —
  * the written, (table, bucket)-partitioned store of
  * [[Similarity.ensureLshStore]], kept fresh by the write path via the
  * [[PartitionedDeltaLog]] discipline.
  */
final class MaintainedAnnStore(gs: GraphStore, label: String, vecCol: String,
    storageDir: String, dim: Int, nBits: Int = 8, nTables: Int = 2,
    seed: Long = 42L) {

  private val table = gs.tableFor(label)
  private val log = new PartitionedDeltaLog(gs.spark,
    Paths.get(storageDir, "annindex", label), Seq("table", "bucket"))

  private def bucketed(rows: DataFrame): DataFrame = {
    val sigCols = (0 until nTables).map { t =>
      Similarity.lshSignature(col("v"), Similarity.hyperplanes(dim, nBits, seed + t))
    }
    // rename first, THEN compute signatures: a signature referencing
    // the vector column aliased in the same select is a lateral column
    // alias the analyzer rejects inside HOF lambdas
    rows.select(col("id"), col(vecCol).as("v"))
      .select(col("id"), col("v"), posexplode(array(sigCols: _*)))
      .withColumnsRenamed(Map("pos" -> "table", "col" -> "bucket"))
  }

  /** Full (re)materialization from the store's current state; clears
    * the delta and tombstone logs (compaction).
    */
  def rebuild(): Unit = log.locked {
    // a store with no committed table yet has nothing to index: a
    // rebuild before the first commit is a graceful no-op (the
    // bound-before-built contract covers catch-up), not an empty-frame
    // crash in the graph read (found by IndexFuzzSpec's random walks)
    if (!gs.store.tableExists(table)) return
    val through = gs.store.currentEpoch // before materializing — see appliedThrough
    log.writeBase(bucketed(gs.graph().vertices(label).select(col("id"), col(vecCol))))
    log.recordApplied(through)
  }

  /** Apply one commit's staged row versions — shared by [[bind]] and
    * the replica-side [[MaintainedIndexes.followCommitLog]].
    */
  def applyCommit(epoch: Long, staged: DataFrame): Unit = log.locked {
    log.appendCommit(epoch,
      staged.filter(!col("deleted")).select(col("id"), col(vecCol)),
      bucketed, staged)
  }

  /** Wire into the store's write path. Fails fast if another writer
    * already binds this index directory (single-writer contract).
    */
  def bind(): Unit = {
    log.acquireBinder()
    gs.onCommit { (epoch, frames) =>
      frames.get(table).foreach(applyCommit(epoch, _))
    }
  }

  /** Embedding near-duplicate pairs over the CURRENT store state,
    * served from the maintained buckets (no re-signing of unchanged
    * vectors) — the vector analog of [[SignatureIndex.nearDups]]: a
    * vector committed one statement ago is already a semantic near-dup
    * candidate, no rebuild.
    */
  def nearDups(threshold: Double = 0.9): DataFrame =
    Similarity.cosineNearDups(
      gs.graph().vertices(label).select(col("id"), col(vecCol)),
      "id", vecCol, threshold,
      prebuilt = Some(log.probe(lit(true)).select("id", "table", "bucket")))

  /** Per-vector ranked near-neighbor graph ([[Similarity.nnTopKJoin]])
    * over the CURRENT store state, from the maintained buckets.
    */
  def nnGraph(threshold: Double, k: Int): DataFrame =
    Similarity.nnTopKJoin(
      gs.graph().vertices(label).select(col("id"), col(vecCol)),
      "id", vecCol, threshold, k,
      buckets = Some(log.probe(lit(true)).select("id", "table", "bucket")))

  /** ANN top-k over the maintained store — the partition-pruned probe
    * of [[Similarity.annTopKStored]] plus the delta/tombstone merge.
    */
  def topK(query: Seq[Double], k: Int): DataFrame = {
    val inMyBuckets = (0 until nTables).map { t =>
      val planes = Similarity.hyperplanes(dim, nBits, seed + t)
      col("table") === lit(t) &&
        col("bucket") === lit(Similarity.querySignature(query, planes))
    }.reduce(_ || _)
    log.probe(inMyBuckets)
      .select(col("id"),
        round(Similarity.cosine(col("v"), Similarity.vecLit(query)), 6).as("cos_sim"))
      .dropDuplicates("id")
      .orderBy(col("cos_sim").desc, col("id").asc)
      .limit(k)
  }
}

/** Commit-maintained PQ code store — the compressed-domain scan tier
  * ([[Similarity.pqTrain]]/`adcScan`, q109) kept fresh by the write
  * path: a committed vector is immediately findable through the ADC
  * scan, encoded against the PERSISTED codebooks (like the IVF store's
  * fixed coarse quantizer, the codebooks stay put between retrains —
  * standard PQ freshness practice; [[rebuild]] re-trains them). The
  * store is deliberately UNPARTITIONED: a PQ probe is a full scan of
  * the codes by design — the compression (dim·4 float bytes → m code
  * bytes/vector) is what makes that scan cheap, so there is nothing to
  * prune by and the delta-log's probe degenerates to base ∪ deltas
  * with tombstone supersession.
  */
final class MaintainedPqStore(gs: GraphStore, label: String, vecCol: String,
    storageDir: String, m: Int, ksub: Int = 16, iterations: Int = 3) {

  private val table = gs.tableFor(label)
  private val root = Paths.get(storageDir, "pqindex", label)
  private val log = new PartitionedDeltaLog(gs.spark, root, Seq.empty)
  // inside the base dir, so the writeBase swap publishes codes and the
  // codebooks they were encoded with in ONE atomic rename
  private def codebooksFile = log.basePath.resolve("_codebooks.txt")

  private def writeCodebooksTo(target: java.nio.file.Path,
      cbs: Seq[Seq[Seq[Double]]]): Unit =
    Files.write(target,
      cbs.map(_.map(_.map(java.lang.Double.toString).mkString(","))
          .mkString(";"))
        .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** The persisted codebooks (Double.toString roundtrips exactly). */
  def codebooks: Seq[Seq[Seq[Double]]] = codebooksAt(log.basePath)

  private def codebooksAt(base: java.nio.file.Path): Seq[Seq[Seq[Double]]] =
    new String(Files.readAllBytes(base.resolve("_codebooks.txt")),
      java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").toSeq.map(_.split(";").toSeq.map(
        _.split(",").toSeq.map(java.lang.Double.parseDouble)))

  /** Re-train the codebooks on the current state and re-encode; clears
    * the delta and tombstone logs (compaction).
    */
  def rebuild(): Unit = log.locked {
    // a store with no committed table yet has nothing to index: a
    // rebuild before the first commit is a graceful no-op (the
    // bound-before-built contract covers catch-up), not an empty-frame
    // crash in the graph read (found by IndexFuzzSpec's random walks)
    if (!gs.store.tableExists(table)) return
    val through = gs.store.currentEpoch // before materializing — see appliedThrough
    val vecs = gs.graph().vertices(label).select(col("id"), col(vecCol))
      .localCheckpoint(true)
    val cbs = Similarity.pqTrain(vecs, vecCol, "id", m, ksub, iterations)
    Files.createDirectories(root)
    log.writeBase(Similarity.pqEncode(vecs, "id", vecCol, cbs),
      tmp => writeCodebooksTo(tmp.resolve("_codebooks.txt"), cbs))
    log.recordApplied(through)
  }

  /** Apply one commit's staged row versions — shared by [[bind]] and
    * the replica-side [[MaintainedIndexes.followCommitLog]]. Bound-
    * before-built commits are skipped (no codebooks yet); the eventual
    * [[rebuild]] reads the committed state, so nothing is lost.
    */
  def applyCommit(epoch: Long, staged: DataFrame): Unit = log.locked {
    if (Files.exists(codebooksFile))
      log.appendCommit(epoch,
        staged.filter(!col("deleted")).select(col("id"), col(vecCol)),
        rows => Similarity.pqEncode(rows, "id", vecCol, codebooks),
        staged)
  }

  /** Wire into the store's write path. Fails fast if another writer
    * already binds this index directory (single-writer contract).
    */
  def bind(): Unit = {
    log.acquireBinder()
    gs.onCommit { (epoch, frames) =>
      frames.get(table).foreach(applyCommit(epoch, _))
    }
  }

  /** PQ ANN top-k over the maintained store: ADC over the merged codes,
    * exact rescore of the candidates against the store's CURRENT
    * vectors.
    */
  def topK(query: Seq[Double], k: Int, candidates: Int = 100,
      adcQuery: Option[Seq[Double]] = None): DataFrame = {
    // one pinned generation: the ADC scan decodes against the same
    // codebooks its codes were encoded with (see GenDirs)
    val pinned = log.pin()
    Similarity.pqTopK(
      gs.graph().vertices(label).select(col("id"), col(vecCol)),
      vecCol, "id", pinned.probe(lit(true)), codebooksAt(pinned.basePath),
      query, k, candidates, adcQuery)
  }
}

/** Commit-maintained IVF-PQ store — the COMPOSED ANN configuration
  * ([[Similarity.ensureIvfPqStore]], q112) kept fresh by the write
  * path: codes partitioned by coarse cell, so probes ADC-scan ONLY the
  * probed cells' compressed codes (base partition-pruned, delta
  * rowgroup-skipped) and a committed vector is immediately findable
  * through the composed probe. Both quantizers stay fixed between
  * [[rebuild]]s (standard IVF/PQ freshness practice); the hook encodes
  * staged rows straight from the raw column via the cosine-space
  * argmin forms — one write job per commit, no staged normalized
  * intermediate.
  */
final class MaintainedIvfPqStore(gs: GraphStore, label: String, vecCol: String,
    storageDir: String, k: Int, m: Int, ksub: Int = 16, iterations: Int = 2,
    metaCols: Seq[String] = Nil) {

  private val table = gs.tableFor(label)
  private val root = Paths.get(storageDir, "ivfpqindex", label)
  private val log = new PartitionedDeltaLog(gs.spark, root, Seq("ivf_cluster"))
  // both inside the base dir — published atomically WITH the codes they
  // produced (see PartitionedDeltaLog.writeBase)
  private def centroidsFile = log.basePath.resolve("_centroids.txt")
  private def codebooksFile = log.basePath.resolve("_codebooks.txt")

  def centroids: Seq[Seq[Double]] = centroidsAt(log.basePath)

  private def centroidsAt(base: java.nio.file.Path): Seq[Seq[Double]] =
    new String(Files.readAllBytes(base.resolve("_centroids.txt")),
      java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").toSeq.map(_.split(",").toSeq.map(java.lang.Double.parseDouble))

  def codebooks: Seq[Seq[Seq[Double]]] = codebooksAt(log.basePath)

  private def codebooksAt(base: java.nio.file.Path): Seq[Seq[Seq[Double]]] =
    Similarity.parseCodebooks(new String(
      Files.readAllBytes(base.resolve("_codebooks.txt")),
      java.nio.charset.StandardCharsets.UTF_8))

  // metaCols ride along into the code rows (the ensureIvfPqStoreMeta
  // layout), so a filtered probe reads attributes from the store
  // itself instead of joining candidates back to the vertex table
  private def encoded(rows: DataFrame, cs: Seq[Seq[Double]],
      cbs: Seq[Seq[Seq[Double]]]): DataFrame =
    Similarity.pqEncodeCosine(
      Similarity.ivfAssignCosine(
        rows.select(col("id") +: col(vecCol).as("v") +: metaCols.map(col): _*),
        "v", cs),
      "id", "v", cbs, extra = "ivf_cluster" +: metaCols)

  /** Re-train both quantizers on the current state and re-encode;
    * clears the delta and tombstone logs (compaction).
    */
  def rebuild(): Unit = log.locked {
    // a store with no committed table yet has nothing to index: a
    // rebuild before the first commit is a graceful no-op (the
    // bound-before-built contract covers catch-up), not an empty-frame
    // crash in the graph read (found by IndexFuzzSpec's random walks)
    if (!gs.store.tableExists(table)) return
    val through = gs.store.currentEpoch // before materializing — see appliedThrough
    val staged = gs.graph().vertices(label)
      .select(col("id") +: col(vecCol) +:
        Similarity.l2normalize(col(vecCol)).as("__nv") +: metaCols.map(col): _*)
      .localCheckpoint(true)
    val cs = Similarity.ivfTrain(staged, "__nv", "id", k, iterations)
    val cbs = Similarity.pqTrain(staged, "__nv", "id", m, ksub, iterations)
    Files.createDirectories(root)
    log.writeBase(encoded(staged.drop("__nv"), cs, cbs),
      tmp => {
        Files.write(tmp.resolve("_centroids.txt"),
          cs.map(_.map(java.lang.Double.toString).mkString(","))
            .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        Files.write(tmp.resolve("_codebooks.txt"),
          Similarity.codebooksText(cbs)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      })
    log.recordApplied(through)
  }

  /** Apply one commit's staged row versions — shared by [[bind]] and
    * the replica-side [[MaintainedIndexes.followCommitLog]]. Bound-
    * before-built commits are skipped (no quantizers yet); the eventual
    * [[rebuild]] reads the committed state, so nothing is lost.
    */
  def applyCommit(epoch: Long, staged: DataFrame): Unit = log.locked {
    if (Files.exists(centroidsFile) && Files.exists(codebooksFile))
      log.appendCommit(epoch,
        staged.filter(!col("deleted"))
          .select(col("id") +: col(vecCol) +: metaCols.map(col): _*),
        rows => encoded(rows, centroids, codebooks),
        staged)
  }

  /** Wire into the store's write path. Fails fast if another writer
    * already binds this index directory (single-writer contract).
    */
  def bind(): Unit = {
    log.acquireBinder()
    gs.onCommit { (epoch, frames) =>
      frames.get(table).foreach(applyCommit(epoch, _))
    }
  }

  /** Composed probe: nProbe nearest cells (pruned codes read) → ADC
    * rank in the compressed domain → exact rescore of the candidates
    * against the store's CURRENT vectors.
    */
  def topK(query: Seq[Double], kTop: Int, nProbe: Int = 2,
      candidates: Int = 100): DataFrame =
    probeRanked(query, kTop, nProbe, candidates, lit(true))

  /** Metadata-filtered composed probe: `predicate` (over `metaCols`)
    * applies to the probed cells' code rows BEFORE ADC ranking — same
    * one-scan contract as [[Similarity.ivfPqTopKFiltered]], served
    * from the commit-maintained store so a vector committed a moment
    * ago is findable through the filtered probe immediately.
    */
  def topKFiltered(query: Seq[Double], kTop: Int, predicate: Column,
      nProbe: Int = 2, candidates: Int = 100): DataFrame = {
    require(metaCols.nonEmpty,
      "filtered probe needs metaCols bound at index construction")
    probeRanked(query, kTop, nProbe, candidates, predicate)
  }

  private def probeRanked(query: Seq[Double], kTop: Int, nProbe: Int,
      candidates: Int, predicate: Column): DataFrame = {
    // one pinned generation: cells, codes, and both quantizers all
    // resolve from the same materialization (see GenDirs)
    val pinned = log.pin()
    val norm = math.sqrt(query.map(x => x * x).sum)
    val nq = if (norm == 0) query else query.map(_ / norm)
    val probes = centroidsAt(pinned.basePath).zipWithIndex
      .map { case (c, i) => (c.zip(nq).map { case (a, b) => (a - b) * (a - b) }.sum, i) }
      .sortBy(_._1).take(nProbe).map(_._2)
    val cand = Similarity.adcScan(
        pinned.probe(col("ivf_cluster").isin(probes: _*) && predicate)
          .select("id", "codes"),
        codebooksAt(pinned.basePath), nq)
      .orderBy(col("adc_dist").asc, col("id").asc)
      .limit(candidates).select("id")
    gs.graph().vertices(label).select(col("id"), col(vecCol).as("__v"))
      .join(cand, Seq("id"))
      .select(col("id"),
        round(Similarity.cosine(col("__v"), Similarity.vecLit(query)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id").asc)
      .limit(kTop)
  }
}

/** Commit-maintained IVF ANN store — the cluster-partitioned store of
  * [[Similarity.ensureIvfStore]] kept fresh by the write path. New and
  * re-embedded vectors are assigned to their nearest EXISTING centroid
  * (standard IVF freshness practice: the coarse quantizer stays fixed
  * between retrains, so probes see fresh vectors immediately and the
  * cell geometry only drifts until the next [[rebuild]] re-trains it).
  *
  * Cosine metric: clustering and probe selection run on L2-NORMALIZED
  * vectors (on the unit sphere Euclidean distance is monotone in
  * cosine), rescoring on the raw vectors — the q67 contract.
  */
final class MaintainedIvfStore(gs: GraphStore, label: String, vecCol: String,
    storageDir: String, k: Int, iterations: Int = 3) {

  private val table = gs.tableFor(label)
  private val root = Paths.get(storageDir, "ivfindex", label)
  private val log = new PartitionedDeltaLog(gs.spark, root, Seq("ivf_cluster"))
  // inside the base dir — published atomically WITH the assignment it
  // produced (see PartitionedDeltaLog.writeBase)
  private def centroidsFile = log.basePath.resolve("_centroids.txt")

  private def normalized(rows: DataFrame): DataFrame =
    rows.select(col("id"), col(vecCol).as("v"),
      Similarity.l2normalize(col(vecCol)).as("__nv"))

  // raw-vector cosine-space assignment: one dot + one norm per
  // centroid per row, no normalized column to materialize (see
  // Similarity.ivfAssignCosine — the lazily inlined l2normalize was
  // the dominant cost of the commit hook)
  private def assigned(rows: DataFrame, cs: Seq[Seq[Double]]): DataFrame =
    Similarity.ivfAssignCosine(rows.select(col("id"), col(vecCol).as("v")), "v", cs)

  private def writeCentroidsTo(target: java.nio.file.Path,
      cs: Seq[Seq[Double]]): Unit =
    Files.write(target,
      cs.map(_.map(java.lang.Double.toString).mkString(","))
        .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** The persisted coarse quantizer (Double.toString roundtrips
    * exactly, so probes use the same centroids assignment used).
    */
  def centroids: Seq[Seq[Double]] = centroidsAt(log.basePath)

  private def centroidsAt(base: java.nio.file.Path): Seq[Seq[Double]] =
    new String(Files.readAllBytes(base.resolve("_centroids.txt")),
      java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").toSeq.map(_.split(",").toSeq.map(java.lang.Double.parseDouble))

  /** Re-train the quantizer on the current state and rematerialize;
    * clears the delta and tombstone logs (compaction).
    */
  def rebuild(): Unit = log.locked {
    // a store with no committed table yet has nothing to index: a
    // rebuild before the first commit is a graceful no-op (the
    // bound-before-built contract covers catch-up), not an empty-frame
    // crash in the graph read (found by IndexFuzzSpec's random walks)
    if (!gs.store.tableExists(table)) return
    val through = gs.store.currentEpoch // before materializing — see appliedThrough
    val vecs = normalized(gs.graph().vertices(label).select(col("id"), col(vecCol)))
      .localCheckpoint(true)
    val cs = Similarity.ivfTrain(vecs, "__nv", "id", k, iterations)
    Files.createDirectories(root)
    // base and hook use the SAME assignment function, so a re-committed
    // unchanged vector always lands in its base cell
    log.writeBase(assigned(vecs.drop("__nv"), cs),
      tmp => writeCentroidsTo(tmp.resolve("_centroids.txt"), cs))
    log.recordApplied(through)
  }

  /** Wire into the store's write path: staged vectors are assigned to
    * the persisted centroids and appended to their cells' delta log.
    * Bound-before-built commits are skipped (no quantizer to assign
    * against yet) — the eventual [[rebuild]] reads the committed state,
    * so nothing is lost.
    */
  /** Apply one commit's staged row versions — shared by [[bind]] and
    * the replica-side [[MaintainedIndexes.followCommitLog]].
    */
  def applyCommit(epoch: Long, staged: DataFrame): Unit = log.locked {
    if (Files.exists(centroidsFile))
      log.appendCommit(epoch,
        staged.filter(!col("deleted")).select(col("id"), col(vecCol)),
        rows => assigned(rows, centroids),
        staged)
  }

  def bind(): Unit = gs.onCommit { (epoch, frames) =>
    frames.get(table).foreach(applyCommit(epoch, _))
  }

  /** IVF top-k over the maintained store: probe the nProbe nearest
    * cells (partition-pruned on base AND delta), rescore exactly.
    */
  def topK(query: Seq[Double], kTop: Int, nProbe: Int = 2): DataFrame = {
    // one pinned generation: the probed cells come from the same
    // quantizer that assigned the rows being probed (see GenDirs)
    val pinned = log.pin()
    val norm = math.sqrt(query.map(x => x * x).sum)
    val nq = if (norm == 0) query else query.map(_ / norm)
    val probes = centroidsAt(pinned.basePath).zipWithIndex
      .map { case (c, i) => (c.zip(nq).map { case (a, b) => (a - b) * (a - b) }.sum, i) }
      .sortBy(_._1).take(nProbe).map(_._2)
    pinned.probe(col("ivf_cluster").isin(probes: _*))
      .select(col("id"),
        round(Similarity.cosine(col("v"), Similarity.vecLit(query)), 6).as("cos_sim"))
      .dropDuplicates("id")
      .orderBy(col("cos_sim").desc, col("id").asc)
      .limit(kTop)
  }
}

/** Shared core of the commit-maintained banded perceptual-fingerprint
  * indexes — the maintained-index discipline extended to the MEDIA
  * tier: a payload committed one statement ago is already a near-dup
  * candidate (an updated one matches by its new content, a deleted one
  * is gone), no rebuild and no corpus re-decode. Rows are 4×16-bit
  * bands of the 64-bit fingerprint, partitioned by a 64-way band
  * bucket `bb = band_idx·16 + (band_val mod 16)` so a probe reads only
  * the query fingerprint's ≤ 4 bucket dirs — the LSH-store pruning
  * shape applied to Hamming space, with the exact-recall-≤-3-bits
  * pigeonhole guarantee. The banding machinery is fingerprint-agnostic
  * (one implementation, two hash columns); concrete subclasses supply
  * the decode+hash transform and the driver-side query hash.
  */
sealed abstract class MaintainedBandedMediaIndex(gs: GraphStore,
    label: String, bytesCol: String, storageDir: String,
    dirName: String, hashCol: String) {

  /** (media_id, bytes, format) → (media_id, `hashCol`) via the REAL
    * partition-batched decode.
    */
  protected def hashMedia(media: DataFrame): DataFrame

  /** Driver-side fingerprint of one raw payload (the probe side). */
  protected def hashQuery(bytes: Array[Byte]): Long

  private val table = gs.tableFor(label)
  private val log = new PartitionedDeltaLog(gs.spark,
    Paths.get(storageDir, dirName, label), Seq("bb"))

  /** One commit's banded fingerprint rows: REAL decode + hash per live
    * payload (partition-batched), 4 band rows each, routed to band
    * buckets.
    */
  private def banded(rows: DataFrame): DataFrame = {
    val hashed = hashMedia(
      rows.select(col("id").as("media_id"), col(bytesCol).as("bytes"),
        lit(null).cast("string").as("format")))
      .select(col("media_id").as("id"), col(hashCol))
    hashed.select(col("id"), col(hashCol),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col(hashCol), i * 16).bitwiseAND(lit(65535L))): _*))
        .as(Seq("band_idx", "band_val")))
      .withColumn("bb", col("band_idx") * 16 + pmod(col("band_val"), lit(16)))
  }

  /** Full (re)materialization from the store's current state; clears
    * the delta and tombstone logs (compaction).
    */
  def rebuild(): Unit = log.locked {
    // a store with no committed table yet has nothing to index: a
    // rebuild before the first commit is a graceful no-op (the
    // bound-before-built contract covers catch-up), not an empty-frame
    // crash in the graph read (found by IndexFuzzSpec's random walks)
    if (!gs.store.tableExists(table)) return
    val through = gs.store.currentEpoch
    log.writeBase(banded(gs.graph().vertices(label).select(col("id"), col(bytesCol))))
    log.recordApplied(through)
  }

  /** Apply one commit's staged row versions — shared by [[bind]] and
    * the replica-side [[MaintainedIndexes.followCommitLog]].
    */
  def applyCommit(epoch: Long, staged: DataFrame): Unit = log.locked {
    log.appendCommit(epoch,
      staged.filter(!col("deleted")).select(col("id"), col(bytesCol)),
      banded, staged)
  }

  /** Wire into the store's write path. Fails fast if another writer
    * already binds this index directory (single-writer contract).
    */
  def bind(): Unit = {
    log.acquireBinder()
    gs.onCommit { (epoch, frames) =>
      frames.get(table).foreach(applyCommit(epoch, _))
    }
  }

  /** Near-duplicate payloads for raw query bytes against the CURRENT
    * committed state: fingerprint the query (driver-side, one
    * payload), read only its ≤ 4 band-bucket dirs, verify candidates
    * by popcount. Returns (id, `hashCol`, hamming) ordered
    * (hamming, id); recall is exact for `maxHamming` ≤ 3 by the
    * banding pigeonhole.
    */
  def nearDups(queryBytes: Array[Byte], maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "banded recall is exact only for maxHamming <= 3 (4 bands, pigeonhole)")
    val qh = hashQuery(queryBytes)
    val bands = (0 until 4).map(i => (i.toLong, (qh >>> (i * 16)) & 0xffffL))
    val bbs = bands.map { case (i, v) => i * 16 + (v % 16) }.distinct
    val pred = col("bb").isin(bbs: _*) && bands.map { case (i, v) =>
      col("band_idx") === i && col("band_val") === v
    }.reduce(_ || _)
    log.probe(pred)
      .select(col("id"), col(hashCol)).distinct()
      // column API, not expr-string interpolation: Long.MinValue has no
      // valid SQL literal spelling (unary minus over an out-of-range
      // positive literal fails to parse), and lit() sidesteps any
      // string-building entirely
      .withColumn("hamming", bit_count(col(hashCol).bitwiseXOR(lit(qh))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("hamming"), col("id"))
  }
}

/** Commit-maintained geohash CELL index over a store-held label with
  * point coordinates — the reference's write-path spatial maintenance
  * (transactions.lisp:800-876: `:index t` geometry slots re-indexed on
  * every create/update/delete) as a [[PartitionedDeltaLog]] store
  * partitioned by cell: a point committed one statement ago is already
  * findable through a covering-cell-pruned bbox/radius probe, a moved
  * point's old cell rows retire by tombstone, and the base stays
  * directory-pruned exactly like the static
  * [[graft.spatial.SpatialOps.ensureCellStore]] tier.
  */
final class MaintainedCellIndex(gs: GraphStore, label: String,
    lonCol: String, latCol: String, storageDir: String, precision: Int = 5) {

  private val table = gs.tableFor(label)
  private val log = new PartitionedDeltaLog(gs.spark,
    Paths.get(storageDir, "cellindex", label), Seq("cell"))

  private def celled(rows: DataFrame): DataFrame =
    graft.spatial.SpatialOps.withCell(
      rows.select(col("id"), col(lonCol), col(latCol)), lonCol, latCol, precision)

  /** Full (re)materialization from the store's current state; clears
    * the delta and tombstone logs (compaction) — `rebuild-spatial-index`
    * (spatial-query.lisp:174-200).
    */
  def rebuild(): Unit = log.locked {
    // a store with no committed table yet has nothing to index: a
    // rebuild before the first commit is a graceful no-op (the
    // bound-before-built contract covers catch-up), not an empty-frame
    // crash in the graph read (found by IndexFuzzSpec's random walks)
    if (!gs.store.tableExists(table)) return
    val through = gs.store.currentEpoch // before materializing — see appliedThrough
    log.writeBase(celled(
      gs.graph().vertices(label).select(col("id"), col(lonCol), col(latCol))))
    log.recordApplied(through)
  }

  /** Apply one commit's staged row versions — shared by [[bind]] and
    * the replica-side [[MaintainedIndexes.followCommitLog]].
    */
  def applyCommit(epoch: Long, staged: DataFrame): Unit = log.locked {
    log.appendCommit(epoch,
      staged.filter(!col("deleted")).select(col("id"), col(lonCol), col(latCol)),
      celled, staged)
  }

  /** Wire into the store's write path. Fails fast if another writer
    * already binds this index directory (single-writer contract).
    */
  def bind(): Unit = {
    log.acquireBinder()
    gs.onCommit { (epoch, frames) =>
      frames.get(table).foreach(applyCommit(epoch, _))
    }
  }

  /** `spatial-index-query-bbox` over the maintained store: covering
    * cells prune the base read, exact bounds refine.
    */
  def withinBBox(box: graft.spatial.Geohash.BBox): DataFrame =
    log.probe(graft.spatial.SpatialOps.storedCellFilter(box, precision))
      .filter(col(lonCol) >= box.minLon && col(lonCol) <= box.maxLon &&
        col(latCol) >= box.minLat && col(latCol) <= box.maxLat)
      .select(col("id"), col(lonCol), col(latCol))

  /** `spatial-index-query-radius` over the maintained store. */
  def near(lon: Double, lat: Double, radiusM: Double): DataFrame = {
    val dLat = radiusM / 111320.0
    val dLon = radiusM / (111320.0 * math.max(0.01, math.cos(math.toRadians(lat))))
    val box = graft.spatial.Geohash.BBox(
      math.max(-180, lon - dLon), math.max(-90, lat - dLat),
      math.min(180, lon + dLon), math.min(90, lat + dLat))
    log.probe(graft.spatial.SpatialOps.storedCellFilter(box, precision))
      .withColumn("dist_m", graft.spatial.SpatialOps.haversineM(
        col(lonCol), col(latCol), lit(lon), lit(lat)))
      .filter(col("dist_m") <= radiusM)
      .select(col("id"), col(lonCol), col(latCol), col("dist_m"))
  }
}

/** Commit-maintained perceptual-hash (dHash) index over a store-held
  * IMAGE label ([[MaintainedBandedMediaIndex]] with q167's dHash).
  */
final class MaintainedDhashIndex(gs: GraphStore, label: String,
    bytesCol: String, storageDir: String)
  extends MaintainedBandedMediaIndex(gs, label, bytesCol, storageDir,
    "dhashindex", "dhash") {
  protected def hashMedia(media: DataFrame): DataFrame =
    Multimodal.dhashMedia(media)
  protected def hashQuery(bytes: Array[Byte]): Long = Multimodal.dHash64(bytes)
}

/** Commit-maintained AUDIO-fingerprint index — the same banded index
  * for the sound tier (q189's `ahash`): a twin recording committed a
  * moment ago is a near-dup candidate immediately, the media parity
  * the image tier already has.
  */
final class MaintainedAudioIndex(gs: GraphStore, label: String,
    bytesCol: String, storageDir: String)
  extends MaintainedBandedMediaIndex(gs, label, bytesCol, storageDir,
    "ahashindex", "ahash") {
  protected def hashMedia(media: DataFrame): DataFrame =
    Multimodal.audioHashMedia(media)
  protected def hashQuery(bytes: Array[Byte]): Long = Multimodal.audioHash64(bytes)
}
