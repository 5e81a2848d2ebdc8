package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling & splitting — the reproducibility
  * primitive a training-data pipeline needs that `rand(seed)` cannot
  * give: `rand` is engine- and partitioning-dependent, while a hash of
  * the row's key is a pure function of the data. The same document
  * lands in the same split on any engine, any cluster size, any run —
  * and the assignment survives re-partitioning, backfills and
  * incremental appends (new docs don't reshuffle old ones, unlike
  * reservoir or percentile sampling).
  *
  * md5 is the hash because both Spark and DuckDB (and effectively
  * every engine) produce bit-identical md5, so splits are auditable
  * end-to-end (q77's oracle recomputes the assignment in SQL).
  * Columns only — stays inside whole-stage codegen, no UDFs, no state.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from a key column: the first 8 md5
    * hex digits as an unsigned 32-bit int, mod buckets.
    */
  def hashBucket(key: Column, buckets: Int): Column = {
    require(buckets > 0, "buckets must be positive")
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % buckets
  }

  /** First column name `__<prefix>N` not already present in `df`. */
  private[graft] def freshName(df: DataFrame, prefix: String): String =
    Iterator.from(0).map(i => s"__$prefix$i")
      .find(n => !df.columns.contains(n)).get

  /** Keep a deterministic `fraction` of rows by key hash. */
  def hashSample(df: DataFrame, key: Column, fraction: Double,
      buckets: Int = 1000000): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    df.filter(hashBucket(key, buckets) < (fraction * buckets).toLong)
  }

  /** Per-group quota cap — the data-mixing primitive (per-domain /
    * per-language caps a corpus composition applies before training):
    * keep at most `quota` rows per group, chosen by key-hash rank with
    * the key itself as tiebreak. Like the splits above, the kept set is
    * a pure function of the data: any engine, any partitioning, any
    * backfill re-derives it, and growing one group never reshuffles
    * another's kept rows — it only competes within its own quota.
    *
    * One shuffle on the group columns; rank is windowed per group, so
    * skewed groups cost their own size, not the corpus's.
    *
    * Contract: `key` must be a UNIQUE, NON-NULL row identifier (like
    * the other samplers here). Duplicate keys tie in the rank order,
    * making the kept set partitioning-dependent; null keys sort
    * differently across engines (Spark NULLS FIRST, DuckDB NULLS
    * LAST), breaking the cross-engine re-derivation guarantee.
    */
  def quotaCap(df: DataFrame, groupCols: Seq[Column], key: Column,
      quota: Int): DataFrame = {
    require(quota > 0, "quota must be positive")
    val rk = freshName(df, "qrank")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols: _*)
      .orderBy(md5(key.cast("string")), key.cast("string"))
    df.withColumn(rk, row_number().over(w))
      .filter(col(rk) <= quota).drop(rk)
  }

  /** Epoch-weighted mixture materialization — the other half of corpus
    * mixing (`quotaCap` caps a group; this repeats or thins one): each
    * source gets a target epoch count `w`. `w = 2.5` means every doc
    * appears twice and a key-hash-chosen half appear a third time;
    * `w = 0.4` keeps 40% of the source once; `w = 0` drops it. The
    * realized stream is a pure function of the data:
    * `copies = floor(w) + [saltedHash(key) < frac(w)·buckets]`, with
    * the fractional threshold folded to an integer literal at plan
    * build — so any engine re-derives the exact stream, and appends to
    * one source never disturb another's copies. The hash is SALTED
    * (`md5(key || ":epoch")`), so the fractional-copy subset is
    * independent of `hashBucket`/`hashSample`/`hashSplit` selections on
    * the same key — composing this with a downstream hash sample draws
    * the product of the two fractions, not a coincident set. Output
    * gains a `copy_idx` column (0-based repetition number, replacing
    * any existing column of that name) for downstream
    * shuffling/packing.
    *
    * Narrow — a per-row generate, no shuffle; output size is
    * Σ w(source)·|source| regardless of partitioning. Same key
    * contract as the other samplers: unique and non-null.
    */
  def epochMix(df: DataFrame, sourceCol: Column, key: Column,
      weights: Map[String, Double], default: Double = 1.0,
      buckets: Int = 1000000): DataFrame = {
    def copiesOf(w: Double): Column = {
      require(java.lang.Double.isFinite(w) && w >= 0,
        s"epoch weight must be finite and >= 0: $w")
      val whole = math.floor(w).toLong
      val thr = math.round((w - whole) * buckets)
      val salted = hashBucket(concat(key.cast("string"), lit(":epoch")), buckets)
      lit(whole) + when(salted < thr, 1L).otherwise(0L)
    }
    val copies = weights.toSeq.sortBy(_._1)
      .foldLeft(Option.empty[Column]) { case (acc, (s, w)) =>
        val c = copiesOf(w)
        Some(acc.fold(when(sourceCol === s, c))(_.when(sourceCol === s, c)))
      }.fold(copiesOf(default))(_.otherwise(copiesOf(default)))
    val ci = freshName(df, "copies")
    df.withColumn(ci, copies)
      .filter(col(ci) > 0)
      .withColumn("copy_idx", explode(sequence(lit(0L), col(ci) - 1)))
      .drop(ci)
  }

  /** Named split label from ordered (name, weight) fractions summing
    * to ≤ 1 (remainder falls into `rest`): train/val/test carving.
    */
  def hashSplit(key: Column, weights: Seq[(String, Double)],
      rest: String = "rest", buckets: Int = 1000): Column = {
    require(weights.map(_._2).sum <= 1.0 + 1e-9, "weights must sum to <= 1")
    val b = hashBucket(key, buckets)
    var acc = 0.0
    var expr: Column = null
    weights.foreach { case (name, w) =>
      acc += w
      val cond = b < math.round(acc * buckets)
      expr = if (expr == null) when(cond, name) else expr.when(cond, name)
    }
    if (expr == null) lit(rest) else expr.otherwise(rest)
  }

  /** Balanced class weights for an imbalanced label column — the
    * standard inverse-frequency heuristic (weight ∝ total/(k·n_label),
    * the public "balanced" class-weight formula) in exact integer
    * micro-units: `total·10⁶ div (k·n_label)`. Rare classes weigh
    * high, the uniform case lands at 10⁶ for every class. Feeds loss
    * weighting / resampling decisions downstream.
    *
    * Scale shape: one label-grain hash aggregation with map-side
    * partials + a broadcast 1-row total — label skew compresses before
    * the shuffle, and nothing is bigger than |labels| after it.
    */
  def classWeights(df: DataFrame, labelCol: String): DataFrame = {
    val counts = df.groupBy(labelCol).agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum("n").as("__total"), count(lit(1)).as("__k"))
    counts.crossJoin(broadcast(totals))
      .select(col(labelCol), col("n"),
        expr("__total * 1000000 div (__k * n)").as("weight_micro"))
  }

  /** Token-budget mix planner — the question a training run asks before
    * any mixing job starts: "to hit `budgetTokens` at these source
    * weights, what fraction of each source do I keep, and where does
    * the plan fall short?" One per-source row with the full arithmetic:
    *
    *   target_tokens  = budget·weight_ppm div 10⁶
    *   keep_ppm       = least(10⁶, target·10⁶ div greatest(avail, 1))
    *   deficit_tokens = greatest(0, target − avail)
    *
    * plus the REALIZED selection (kept_docs / kept_tokens) under the
    * deterministic md5-bucket gate — the same pure-function-of-ids
    * discipline as [[hashSample]]/[[hashSplit]], so the plan's kept set
    * is re-derivable by any engine and stable under re-partitioning.
    * Sources named in `weightsPpm` but absent from the corpus still
    * report (avail 0, deficit = target, kept 0): a plan that silently
    * dropped a requested source would hide exactly the failure it
    * exists to surface. Corpus sources without a weight are excluded
    * (weight 0 ≡ not in the mix). All-integer; exact while
    * budget·weight_ppm < 2⁶³ (≈9 tera-tokens at full weight — plan in
    * larger units beyond that).
    *
    * Scale shape: one source-grain aggregation over the corpus
    * (map-side combined), the |weights|-row plan broadcast back for
    * the realized pass, one more source-grain aggregation. Nothing
    * corpus-sized moves; skew lands on the gate filter, not a window.
    */
  def budgetPlan(df: DataFrame, sourceCol: Column, key: Column,
      tokensCol: Column, weightsPpm: Seq[(String, Long)],
      budgetTokens: Long): DataFrame = {
    require(weightsPpm.nonEmpty, "weightsPpm must be non-empty")
    // a duplicated source emits two plan rows; the realized join then
    // double-counts that source's kept_docs/kept_tokens in BOTH rows
    require(weightsPpm.map(_._1).distinct.size == weightsPpm.size,
      "weightsPpm names a source more than once")
    require(weightsPpm.forall(_._2 >= 0), "weights must be >= 0")
    require(weightsPpm.map(_._2).sum <= 1000000L, "weights must sum to <= 1e6 ppm")
    require(budgetTokens >= 0, "budgetTokens must be >= 0")
    val w = df.sparkSession.createDataFrame(weightsPpm)
      .toDF("source", "weight_ppm")
    val base = df.select(sourceCol.cast("string").as("source"),
      key.as("__k"), tokensCol.cast("long").as("__t"))
    val avail = base.groupBy("source")
      .agg(count(lit(1)).as("avail_docs"), sum("__t").as("avail_tokens"))
    val plan = broadcast(w).join(avail, Seq("source"), "left")
      .select(col("source"), col("weight_ppm"),
        coalesce(col("avail_docs"), lit(0L)).as("avail_docs"),
        coalesce(col("avail_tokens"), lit(0L)).as("avail_tokens"))
      .withColumn("target_tokens",
        expr(s"(${budgetTokens}L * weight_ppm) div 1000000"))
      .withColumn("keep_ppm", least(lit(1000000L),
        expr("(target_tokens * 1000000) div greatest(avail_tokens, 1)")))
      .withColumn("deficit_tokens",
        greatest(lit(0L), expr("target_tokens - avail_tokens")))
    val kept = base
      .join(broadcast(plan.select("source", "keep_ppm")), Seq("source"))
      .filter(hashBucket(col("__k"), 1000000) < col("keep_ppm"))
      .groupBy("source")
      .agg(count(lit(1)).as("kept_docs"), sum("__t").as("kept_tokens"))
    // kept is source-grain and the plan only names |weights| sources —
    // both sides are tiny; broadcast keeps the recorded plan shuffle-free
    plan.join(broadcast(kept), Seq("source"), "left")
      .select(col("source"), col("weight_ppm"), col("avail_docs"),
        col("avail_tokens"), col("target_tokens"), col("keep_ppm"),
        col("deficit_tokens"),
        coalesce(col("kept_docs"), lit(0L)).as("kept_docs"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
  }

  /** Temperature-scaled source mixing — the multilingual/multi-source
    * rebalancing stage (UniMax / "sampling with temperature" in the
    * multilingual-LM literature): natural source proportions get
    * flattened by raising counts to a power α < 1, so head sources
    * stop drowning tail sources without inverting the order. α is
    * expressed as `0.5^sqrtApplications` (1 → √n, the common T = 2;
    * 2 → n^¼) because integer `floor(sqrt(cast(· as double)))` chains
    * are a power family both engines reproduce identically: the
    * int64→double cast is the same IEEE-754 rounding everywhere,
    * `sqrt` of a double is correctly rounded everywhere, `floor`
    * lands it back in int64, and every division afterwards is
    * integer — no libm `pow` (whose last ulp differs across
    * implementations) anywhere in the plan. Domain note: for
    * `avail_tokens` ≤ 2^53 per source this IS true integer sqrt; above
    * that the shared initial cast is lossy, so the result can differ
    * from exact isqrt by an ulp — cross-engine agreement still holds
    * (all implementations share the cast), but treat per-source token
    * counts beyond 2^53 (~9e15 — thousands of TB of text) as outside
    * the exactness contract.
    *
    * Output, one row per source: available docs/tokens, the flattened
    * weight `w = isqrt^k(avail_tokens)`, its share in ppm, the token
    * allocation of `budgetTokens` by that share, and the deficit where
    * the allocation exceeds what the source has (tail sources get
    * upsampled shares — the epoch-mix/repetition stage consumes the
    * deficit column to decide repetition factors).
    *
    * Scale shape: ONE source-grain aggregation over the corpus; the
    * share denominator is a 1-row aggregate of that (broadcast, no
    * second corpus pass); everything after is per-source arithmetic on
    * |sources| rows.
    */
  def temperatureWeights(df: DataFrame, sourceCol: Column, tokensCol: Column,
      budgetTokens: Long, sqrtApplications: Int = 1): DataFrame = {
    require(sqrtApplications >= 1 && sqrtApplications <= 4,
      s"sqrtApplications must be in [1, 4], got $sqrtApplications")
    require(budgetTokens >= 0, "budgetTokens must be >= 0")
    val avail = df.select(sourceCol.cast("string").as("source"),
        tokensCol.cast("long").as("__t"))
      .groupBy("source")
      .agg(count(lit(1)).as("avail_docs"), sum("__t").as("avail_tokens"))
    val wExpr = (1 to sqrtApplications).foldLeft("cast(avail_tokens as double)") {
      (e, _) => s"floor(sqrt($e))"
    }
    val weighted = avail.withColumn("w", expr(s"cast($wExpr as long)"))
    val total = weighted.agg(sum("w").as("w_total"))
    weighted.crossJoin(broadcast(total))
      .withColumn("weight_ppm",
        expr("(w * 1000000) div greatest(w_total, 1)"))
      // (budget · w) div total computed as w·(budget div total) +
      // (w·(budget mod total)) div total — algebraically identical
      // (budget = q·total + r), and the largest intermediate drops
      // from budget·w to w·(total−1), so a 100 TB-scale token budget
      // times a large source weight stays inside int64. Domain note:
      // w·w_total itself can reach ~1.2× the corpus's total tokens,
      // so int64 safety holds for corpora up to ~7.6e18 total tokens
      // (millions of TB) — not unconditionally (r15 advice #3)
      .withColumn("target_tokens",
        expr(s"w * (${budgetTokens}L div greatest(w_total, 1)) + " +
          s"(w * (${budgetTokens}L % greatest(w_total, 1))) div greatest(w_total, 1)"))
      .withColumn("deficit_tokens",
        greatest(lit(0L), expr("target_tokens - avail_tokens")))
      .select(col("source"), col("avail_docs"), col("avail_tokens"),
        col("w"), col("weight_ppm"), col("target_tokens"),
        col("deficit_tokens"))
  }

  /** Deterministic CURRICULUM schedule — the training-order manifest
    * for difficulty-staged pretraining (curriculum learning: feed
    * easier documents first, harden over the run): documents bin into
    * `nStages` equal-WIDTH difficulty stages, shuffle deterministically
    * within each stage (the [[hashBucket]] md5 key — partitioning- and
    * engine-stable, unlike `rand(seed)`), and the exclusive token
    * prefix sum over the full (stage, shuffle_key, id) order assigns
    * every document its `start_offset` and optimizer `step` at
    * `tokensPerStep` tokens per step. Equal-width binning (not ntile)
    * keeps the stage a pure per-row function of (difficulty, corpus
    * min/max): no global sort decides membership, ties share a stage,
    * and appending documents never reshuffles existing stages unless
    * the min/max moves.
    *
    * Returns `(id, difficulty, stage, shuffle_key, n_tokens,
    * start_offset, step)`; global training order = ORDER BY
    * (stage, shuffle_key, id).
    *
    * Scale shape: the min/max bounds are a broadcast 1-row aggregate;
    * the prefix sum is the [[Packing]] two-level bucketed cumsum —
    * local windows over (stage, shuffle-bucket) partitions plus a
    * broadcast bases frame of |stages| × |shuffle buckets ÷ 4096|
    * rows — never one global window. Because the shuffle-bucket
    * coarsening `shuffle_key div 4096` is monotone in `shuffle_key`,
    * the two-level sum equals the single global-window prefix an
    * oracle states.
    */
  def curriculumSchedule(df: DataFrame, idCol: String, difficulty: Column,
      nTokens: Column, nStages: Int, tokensPerStep: Long,
      shuffleBuckets: Int = 1000000): DataFrame = {
    require(nStages >= 1, "nStages must be >= 1")
    require(tokensPerStep > 0, "tokensPerStep must be positive")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol).cast("long").as("__id"),
      difficulty.cast("long").as("difficulty"),
      nTokens.cast("long").as("n_tokens"))
    val bounds = base.agg(min("difficulty").as("__lo"),
      max("difficulty").as("__hi"))
    val staged = base.crossJoin(broadcast(bounds))
      // (d - lo) spans [0, hi - lo] < (hi - lo + 1), so the quotient
      // lands in [0, nStages) and every stage is the same width
      .withColumn("stage",
        expr(s"1 + (difficulty - __lo) * $nStages div (__hi - __lo + 1)"))
      .withColumn("shuffle_key", hashBucket(col("__id"), shuffleBuckets))
      .withColumn("__hb", expr("shuffle_key div 4096"))
    val inBucket = Window.partitionBy("stage", "__hb")
      .orderBy("shuffle_key", "__id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = staged.withColumn("__local",
      coalesce(sum("n_tokens").over(inBucket), lit(0L)))
    val totals = staged.groupBy("stage", "__hb").agg(sum("n_tokens").as("__bt"))
    val overBuckets = Window.orderBy("stage", "__hb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = totals.withColumn("__base",
      coalesce(sum("__bt").over(overBuckets), lit(0L))).drop("__bt")
    withLocal.join(broadcast(bases), Seq("stage", "__hb"))
      .withColumn("start_offset", col("__base") + col("__local"))
      .select(col("__id").as(idCol), col("difficulty"), col("stage"),
        col("shuffle_key"), col("n_tokens"), col("start_offset"),
        expr(s"start_offset div ${tokensPerStep}L").as("step"))
  }

  /** Curriculum-ordered sequence-PACKING manifest — the
    * [[curriculumSchedule]] composed with the [[Packing]] span
    * arithmetic: lay every document's tokens on the curriculum number
    * line and read off which fixed-length training sequences it fills
    * (`first_seq`..`last_seq`, spanning documents split across
    * sequence boundaries exactly as [[Packing.concatChunk]] does, but
    * in CURRICULUM order instead of id order — easy stages pack into
    * the run's first sequences). `offset_in_seq` is where the
    * document's first token lands inside its first sequence.
    *
    * Scale shape: [[curriculumSchedule]]'s (two-level prefix sum,
    * broadcast bases) plus pure per-row arithmetic.
    */
  def curriculumPack(df: DataFrame, idCol: String, difficulty: Column,
      nTokens: Column, nStages: Int, seqLen: Long,
      shuffleBuckets: Int = 1000000): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    curriculumSchedule(df, idCol, difficulty, nTokens, nStages, seqLen,
        shuffleBuckets)
      .select(col(idCol), col("difficulty"), col("stage"),
        col("shuffle_key"), col("n_tokens"), col("start_offset"),
        expr(s"start_offset div ${seqLen}L").as("first_seq"),
        expr(s"CASE WHEN n_tokens > 0 THEN (start_offset + n_tokens - 1) " +
          s"div ${seqLen}L ELSE start_offset div ${seqLen}L END")
          .as("last_seq"),
        expr(s"start_offset % ${seqLen}L").as("offset_in_seq"))
      .withColumn("n_seqs", expr("last_seq - first_seq + 1"))
  }
}
