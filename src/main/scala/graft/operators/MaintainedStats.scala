package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.{Dirs, GenDirs, GraphStore}

/** Commit-maintained corpus STATISTICS: a fixed-edge histogram of a
  * numeric column over the live rows of a store label — optionally
  * stratified by a group column — refreshed inside every commit's call
  * stack: the maintained-index discipline (reference
  * transactions.lisp:601-744: indexes update in the apply phase)
  * applied to aggregate state instead of row lookup. With it, the "did
  * this commit shift the corpus?" monitor (q205's drift) is answered
  * from O(nBins × groups × epochs-since-compaction) rows instead of a
  * corpus rescan — at 100 TB the difference between a dashboard tick
  * and a full scan.
  *
  * Semantics and scale notes:
  *  - Edges are PINNED at construction ([lo, hi], nBins), the q207
  *    online-monitor philosophy: a maintained monitor cannot re-derive
  *    data-dependent edges on every commit without rescanning, so
  *    out-of-range values clamp into the edge bins ([[Drift.binExpr]]).
  *  - Each commit appends one signed delta file: +1 rows for staged
  *    live revisions, −1 rows for the superseded PRE-commit values of
  *    the touched ids. Those pre-commit values arrive from the commit
  *    itself ([[GraphStore.onCommitWithPrev]]: captured and
  *    MATERIALIZED under the store's write lock, before the pointer
  *    bump), NOT from an asOf(epoch−1) read at hook time — the hook
  *    runs after the write lock is released, so a `vacuum(keep=1)`
  *    landing in that window would have already destroyed the
  *    superseded revisions an asOf read needs, silently dropping the
  *    −1 side and overcounting until rebuild (r12 advice). Cost scales
  *    with the COMMIT, never the corpus.
  *  - Reads sum base + deltas — at most nBins×groups×(1 + epochs) tiny
  *    rows — and [[rebuild]] folds deltas back into the base (a natural
  *    Maintenance-daemon target, like every other maintained tier).
  *  - The base publishes through [[GenDirs.publish]] (atomic generation
  *    swap with reader grace, like every maintained store): a reader in
  *    ANOTHER instance — q213's per-call QueryDef instance, the HTTP
  *    tier — can race a rebuild without ever seeing a missing base or
  *    an old base against a cleared delta log (r12 advice; the old
  *    rmTree+move swap had a no-base window).
  *  - Replay cursor: [[rebuild]] records the store epoch read BEFORE
  *    materializing, and [[applyCommit]] skips epochs at or below it —
  *    the [[PartitionedDeltaLog.appliedThrough]] discipline, closing
  *    the race where a Maintenance-daemon rebuild folds a
  *    durable-but-not-yet-applied commit into the base and then also
  *    accepts its delta, double-counting until compaction (r12 advice).
  *  - Bound-before-built commits are skipped; the eventual [[rebuild]]
  *    reads committed state, so nothing is lost (the MaintainedIvfStore
  *    contract). [[bind]] claims the exclusive `_BINDER_LOCK`
  *    (single-writer contract, see [[MaintainedIndexes]]).
  *  - STRATIFIED mode (`groupCol = Some(...)`): one histogram per
  *    group value (cast to string — strata are languages/sources/
  *    shards by contract), frames carry a leading `g` column, and
  *    [[driftVsSnapshot]] reports one summary row per group — q214's
  *    per-language monitor served at O(nBins·groups) per commit with
  *    NO corpus rescan. Groups appear and disappear freely: bins
  *    materialize per group present, and drift full-outer-joins the
  *    reference and current group sets.
  */
final class MaintainedStatsIndex(gs: GraphStore, label: String, valueCol: String,
    lo: Double, hi: Double, nBins: Int, dir: String,
    val groupCol: Option[String] = None,
    val featureHash: Boolean = false) {

  private val root = {
    val base = groupCol.fold(s"stats_${label}_$valueCol")(g =>
      s"stats_${label}_${valueCol}_by_$g")
    Paths.get(dir, if (featureHash) s"${base}_ngrams" else base)
  }

  /** The layout root for Maintenance.Target / GenDirs.layoutStats. */
  def statsRoot: java.nio.file.Path = root
  private val spark = gs.spark
  private val maintLock = new Object // see MaintainedIndexes concurrency contract
  private var binderLock: java.nio.channels.FileChannel = _

  private def keyCols: Seq[String] = groupCol.fold(Seq("bin"))(_ => Seq("g", "bin"))

  private def binOf(v: Column): Column =
    Drift.binExpr(v.cast("double"), lit(lo), lit(hi), nBins)

  /** (g?, bin, c) counts of `rows`.
    *
    * Scalar mode (default): one row per input row, `bin` = the pinned
    * fixed-width edge bin of the numeric `valueCol`.
    *
    * FEATURE-HASH mode (`featureHash = true`): `valueCol` is TEXT and
    * each row contributes one count per hashed unigram+bigram feature
    * instance (`bin` = the q221 md5 bucket in [0, nBins); lo/hi are
    * unused) — the DSIR importance model's raw-side bucket counts as
    * commit-maintained aggregate state: selection weights refresh after
    * any commit at O(nBins) from [[histogram]] via
    * [[TextAnalysis.dsirWeightsDenseFromCounts]], with NO corpus
    * rescan. Per-commit cost scales with the commit's own feature
    * count; zero-token docs contribute nothing (matching the scorer,
    * which drops them).
    */
  private def binned(rows: DataFrame): DataFrame = {
    val keyed =
      if (featureHash) {
        // r16: one native featurize+hash expression per row (see
        // HashedNgramExpression) — the explode moves bucket longs, not
        // feature strings; bins identical by construction
        val bin = explode(graft.functions.HashedNgramExpression
          .hashed_ngram_buckets(col(valueCol), nBins))
        groupCol match {
          case None => rows.select(bin.as("bin"))
          case Some(gc) => rows.select(col(gc).cast("string").as("g"), bin.as("bin"))
        }
      } else groupCol match {
        case None => rows.select(binOf(col(valueCol)).as("bin"))
        case Some(gc) => rows.select(col(gc).cast("string").as("g"),
          binOf(col(valueCol)).as("bin"))
      }
    keyed.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("c"))
  }

  /** Every bin materialized: ungrouped over range(nBins); grouped per
    * group PRESENT in `counts` (the group universe is data, not
    * configuration).
    */
  private def fullBins(counts: DataFrame): DataFrame = groupCol match {
    case None =>
      spark.range(nBins).select(col("id").as("bin"))
        .join(counts, Seq("bin"), "left").na.fill(0L, Seq("c"))
    case Some(_) =>
      counts.select("g").distinct()
        .select(col("g"), explode(sequence(lit(0L), lit(nBins - 1L))).as("bin"))
        .join(counts, Seq("g", "bin"), "left").na.fill(0L, Seq("c"))
  }

  // --- replay cursor (the PartitionedDeltaLog.appliedThrough shape) ---
  private def appliedThroughFile = root.resolve("_APPLIED_THROUGH")

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

  /** Recompute the base histogram from the store's current live rows
    * and retire every delta — compaction AND first build share this.
    * The cursor records the epoch read BEFORE materializing: a commit
    * racing the rebuild lands an epoch above it and its delta applies;
    * a commit already folded into the base reads at or below it and
    * its delta is skipped (never double-counted).
    */
  def rebuild(): Unit = maintLock.synchronized {
    val through = gs.store.currentEpoch
    val counts =
      if (!gs.store.tableExists(label)) {
        val e = spark.range(0)
        groupCol.fold(e.select(col("id").as("bin"), col("id").as("c")))(_ =>
          e.select(col("id").cast("string").as("g"), col("id").as("bin"),
            col("id").as("c")))
      } else binned(gs.store.read(label))
    GenDirs.publish(root) { g =>
      fullBins(counts).coalesce(1).write.parquet(g.resolve("base").toString)
    }
    recordApplied(through)
  }

  /** Apply one commit's staged revisions as a signed histogram delta.
    * `prevLive` is the PRE-commit live state of the staged ids,
    * captured under the commit's write lock ([[bind]] wires it from
    * [[GraphStore.onCommitWithPrev]]) — vacuum-immune by construction.
    * The `None` fallback reads asOf(epoch−1) instead: correct ONLY for
    * replaying retained history (a replica applier, a test harness) —
    * a live master-side binding must supply the captured frame.
    */
  def applyCommit(epoch: Long, staged: DataFrame,
      prevLive: Option[DataFrame] = None): Unit = maintLock.synchronized {
    if (epoch <= appliedThrough) return // replayed/compacted history
    val gen = GenDirs.current(root)
    if (!Files.exists(gen.resolve("base"))) return // bound before built: rebuild() catches up
    val adds = binned(staged.filter(!col("deleted")))
    val prev = prevLive.getOrElse(
      gs.store.read(label, asOf = Some(epoch - 1))
        .join(staged.select("id").distinct(), Seq("id"), "left_semi"))
    val superseded = binned(prev).withColumn("c", -col("c"))
    // commit_epoch=N partition dirs: the read below discovers them
    // without a path glob (a glob read trips Spark's streaming-sink
    // metadata probe into logging spurious AnalysisException traces),
    // and the base/ + delta/commit_epoch=N shape inside the current
    // generation is exactly what GenDirs.layoutStats reads — so the
    // index plugs into the Maintenance daemon and /admin/stats
    // telemetry as-is (root = statsRoot, compact = rebuild).
    // OVERWRITE per epoch: a replayed epoch rewrites its delta.
    adds.unionByName(superseded)
      .groupBy(keyCols.map(col): _*).agg(sum("c").as("c"))
      .filter(col("c") =!= 0L)
      .coalesce(1).write.mode("overwrite")
      .parquet(gen.resolve("delta").resolve(s"commit_epoch=$epoch").toString)
    recordApplied(epoch)
  }

  /** Wire into the store's write path, claiming the directory's
    * exclusive binder lock (single-writer contract). Pre-commit values
    * of every staged id arrive captured from under the commit lock.
    */
  def bind(): Unit = {
    binderLock = MaintainedIndexes.acquireBinderLock(root)
    gs.onCommitWithPrev(label) { (epoch, frames, prev) =>
      frames.get(label).foreach(applyCommit(epoch, _, prev.get(label)))
    }
  }

  /** The live histogram — every bin materialized (per group present,
    * when stratified), base + deltas summed. At most
    * nBins×groups×(1 + epochs-since-rebuild) input rows. The
    * generation resolves ONCE, so the read never straddles a
    * concurrent compaction (GenDirs reader grace — no lock taken).
    */
  def histogram(): DataFrame = {
    val gen = GenDirs.current(root)
    val basePath = gen.resolve("base")
    val deltaPath = gen.resolve("delta")
    require(Files.exists(basePath),
      s"stats index for $label.$valueCol not built — call rebuild()")
    val base = spark.read.parquet(basePath.toString)
    val all =
      if (!Dirs.hasReadableDeltaFiles(deltaPath)) base
      else base.unionByName(
        spark.read.parquet(deltaPath.toString).select((keyCols :+ "c").map(col): _*))
    fullBins(all.groupBy(keyCols.map(col): _*).agg(sum("c").as("c")))
  }

  /** Persist the current histogram as a named reference snapshot (the
    * drift monitor's "pin the reference at monitor start" step) and
    * return its path. Snapshots live beside the generations (they
    * reference no generation files, so compaction never sweeps them).
    */
  def snapshot(name: String): String = maintLock.synchronized {
    val p = root.resolve(s"ref_$name")
    Dirs.rmTree(p)
    histogram().coalesce(1).write.parquet(p.toString)
    p.toString
  }

  def hasSnapshot(name: String): Boolean =
    Files.exists(root.resolve(s"ref_$name"))

  /** The PSI (ppm) the corpus WOULD read against snapshot `ref` if
    * `batch` (rows carrying `valueCol`) were committed as creates —
    * the admission arithmetic of the drift GATE: hypothetical
    * histogram = maintained histogram + the batch's binned counts,
    * summarized against the pinned reference. O(nBins) maintained rows
    * + one batch-sized binning pass; the corpus is never scanned.
    * Defined on the aggregate (unstratified) monitor.
    */
  def admissionPsiPpm(ref: String, batch: DataFrame): Long = {
    require(groupCol.isEmpty, "admission gating runs on the aggregate monitor")
    val refHist = spark.read.parquet(root.resolve(s"ref_$ref").toString)
      .withColumnRenamed("c", "c_a")
    val hyp = fullBins(
      histogram().unionByName(binned(batch))
        .groupBy("bin").agg(sum("c").as("c")))
      .withColumnRenamed("c", "c_b")
    Drift.summarize(refHist.join(hyp, Seq("bin")), nBins).head.getLong(2)
  }

  /** The STRATIFIED admission arithmetic: one (g, psi_ppm) row per
    * stratum present in the reference OR in the hypothetical
    * post-commit corpus — the per-language gate q218 pins. The
    * aggregate gate's blind spot is exactly this: a batch can keep the
    * corpus-wide PSI flat while one small stratum collapses, so a
    * stratified monitor gates each stratum on its OWN hypothetical
    * drift. Same cost shape as [[admissionPsiPpm]], per group.
    */
  def admissionPsiByGroup(ref: String, batch: DataFrame): DataFrame = {
    require(groupCol.isDefined, "per-stratum gating needs a stratified monitor")
    val refHist = spark.read.parquet(root.resolve(s"ref_$ref").toString)
      .withColumnRenamed("c", "c_a")
    val hyp = fullBins(
      histogram().unionByName(binned(batch))
        .groupBy("g", "bin").agg(sum("c").as("c")))
      .withColumnRenamed("c", "c_b")
    Drift.summarizeGrouped(
      refHist.join(hyp, keyCols, "full_outer").na.fill(0L, Seq("c_a", "c_b")),
      nBins).select(col("g"), col("psi_ppm"))
  }

  /** Admission check: throw the store's ConflictException (the REST
    * tier maps it to 409, like an OCC conflict) when committing
    * `batch` would push the corpus PSI vs `ref` beyond `psiLimitPpm` —
    * for a stratified monitor, when ANY stratum's own hypothetical PSI
    * would (the refusal names the worst stratum). Composable into any
    * Txn the caller builds — check, then stage and commit;
    * [[gatedCreate]] is the serialized convenience for plain batch
    * ingest.
    */
  def admit(ref: String, batch: DataFrame, psiLimitPpm: Long): Unit = groupCol match {
    case None =>
      val psi = admissionPsiPpm(ref, batch)
      if (psi > psiLimitPpm)
        throw new gs.store.ConflictException(
          s"drift gate: admitting this batch would read psi_ppm=$psi > " +
            s"$psiLimitPpm vs reference '$ref'")
    case Some(_) =>
      val worst = admissionPsiByGroup(ref, batch)
        .orderBy(col("psi_ppm").desc).limit(1).collect()
      worst.headOption.filter(_.getLong(1) > psiLimitPpm).foreach { r =>
        throw new gs.store.ConflictException(
          s"drift gate: admitting this batch would read psi_ppm=${r.getLong(1)} > " +
            s"$psiLimitPpm on stratum '${r.getString(0)}' vs reference '$ref'")
      }
  }

  /** Drift-gated INGEST: admit `rows` against `ref`, then commit them
    * as creates of `vertexLabel` — refused batches leave NOTHING
    * behind (the check runs before any staging, so a 409 is a clean
    * no-op, exactly like an OCC conflict). The admit + commit pair is
    * serialized under the index's maintenance monitor so two gated
    * writers cannot both pass a limit only one of them fits under;
    * ungated writers bypass the gate by definition (it is an ingest
    * policy, not a store invariant).
    */
  def gatedCreate(vertexLabel: String, rows: DataFrame, ref: String,
      psiLimitPpm: Long): Long = maintLock.synchronized {
    admit(ref, rows, psiLimitPpm)
    gs.txn().createVertices(vertexLabel, rows).commit()
  }

  /** SELECTION-AWARE batch scoring (the q225 ∘ q216 closed loop,
    * r13 next-round #7): score an INCOMING batch against the
    * commit-MAINTAINED raw-side DSIR model toward `target`, with no
    * corpus rescan — the selection weights come from [[histogram]]'s
    * ≤nBins maintained rows
    * ([[TextAnalysis.dsirWeightsDenseFromCounts]], BigInt-exact and
    * bit-identical to a from-scratch scan of the same live corpus),
    * the batch scores row-locally
    * ([[TextAnalysis.dsirScoreStateless]]), and the q221 keep gate
    * realizes the per-doc verdict: `kept` iff the doc's deterministic
    * md5 bucket falls under `min(1000, dsir_ppm div 1000)`. Feature-
    * hash mode only. Docs with zero features drop from the output
    * (they cannot be scored — [[dsirKeptPpm]] counts them NOT kept).
    */
  def dsirBatchScores(batch: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String): DataFrame = {
    require(featureHash, "selection-aware scoring needs a feature-hash index")
    require(groupCol.isEmpty, "selection-aware scoring runs on the aggregate index")
    val counts = histogram().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val w = TextAnalysis.dsirWeightsDenseFromCounts(
      counts, target, targetTextCol, nBins)
    TextAnalysis.dsirScoreStateless(batch, idCol, textCol, w)
      .withColumn("keep_permille",
        least(lit(1000L), expr("dsir_ppm div 1000")))
      .withColumn("kept",
        Sampling.hashBucket(col(idCol), 1000) < col("keep_permille"))
  }

  /** The admission quantity of the selection gate: what fraction (ppm)
    * of `batch` would DSIR selection keep, under the maintained model?
    * Featureless docs count against the batch (selection can never
    * keep what it cannot score); an empty batch keeps vacuously
    * (10⁶ ppm — there is nothing to refuse).
    */
  def dsirKeptPpm(batch: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String): Long = {
    val n = batch.count()
    if (n == 0L) return 1000000L
    val kept = dsirBatchScores(batch, idCol, textCol, target, targetTextCol)
      .filter(col("kept")).count()
    kept * 1000000L / n
  }

  /** SELECTION-GATED ingest — the full closed loop (ingest → gate →
    * maintained model → selection): refuse the commit, with the
    * store's ConflictException (REST's 409), when the maintained DSIR
    * model says selection toward `target` would keep less than
    * `minKeptPpm` of the batch — data that selection would immediately
    * throw away is refused at the door, naming the number, and a
    * refusal commits NOTHING. Serialized under the maintenance
    * monitor like [[gatedCreate]], so the model the verdict used
    * cannot be concurrently rewritten by another gated writer; an
    * ADMITTED commit then refreshes the maintained model in-commit,
    * so the next verdict already sees this batch's feature mass —
    * that is what closes the loop.
    */
  def selectionGatedCreate(vertexLabel: String, rows: DataFrame,
      idCol: String, textCol: String, target: DataFrame,
      targetTextCol: String, minKeptPpm: Long): Long = maintLock.synchronized {
    require(minKeptPpm >= 0 && minKeptPpm <= 1000000L,
      s"minKeptPpm must be in [0, 1e6], got $minKeptPpm")
    val ppm = dsirKeptPpm(rows, idCol, textCol, target, targetTextCol)
    if (ppm < minKeptPpm)
      throw new gs.store.ConflictException(
        s"selection gate: the maintained DSIR model keeps only $ppm ppm of " +
          s"this batch (< $minKeptPpm) toward the target — refused")
    gs.txn().createVertices(vertexLabel, rows).commit()
  }

  /** Drift summary ([[Drift.summarize]]: psi/js/tvd ppm) of the CURRENT
    * corpus against a pinned reference snapshot — O(nBins × groups)
    * input rows, no corpus scan. Stratified indexes return one row per
    * group present in EITHER side (full-outer: a stratum may be born
    * after, or die before, the snapshot).
    */
  def driftVsSnapshot(name: String): DataFrame = {
    val ref = spark.read.parquet(root.resolve(s"ref_$name").toString)
      .withColumnRenamed("c", "c_a")
    val cur = histogram().withColumnRenamed("c", "c_b")
    groupCol match {
      case None => Drift.summarize(ref.join(cur, Seq("bin")), nBins)
      case Some(_) => Drift.summarizeGrouped(
        ref.join(cur, keyCols, "full_outer").na.fill(0L, Seq("c_a", "c_b")), nBins)
    }
  }
}
