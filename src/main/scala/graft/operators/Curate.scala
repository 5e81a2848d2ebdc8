package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end curation composition (the q110 catalog row and the
  * REST `curate` query): quality gate → exact-dedup representative →
  * deterministic split → per-doc token budget, as ONE declarative
  * frame. One definition serves both surfaces, so the oracle-checked
  * catalog row pins the REST behavior too — two copies would drift the
  * moment one changes its dedup key or gate defaults.
  */
object Curate {

  /** Per-source bigram-LM fluency gate — the CCNet/Gopher perplexity
    * filter as a curation stage: a count-based bigram LM
    * ([[TextAnalysis.bigramLmScore]] — add-one smoothing, exact
    * integer ppm) trains on the corpus's own q97-gate-clean slice,
    * every document scores against it, and a document flags `lm_low`
    * when its fluency reads below `relPpm` (parts-per-million) of its
    * own SOURCE's mean clean score. Per-source because fluency
    * distributions differ by source — a code-heavy source scores
    * lower than news against the same LM, so one absolute threshold
    * would gut one source while passing another's gibberish; gating
    * each document against its source's own clean mean normalizes
    * that away with integer arithmetic both engines reproduce
    * exactly (`score_ppm · 10⁶ < relPpm · mean_ppm`, all int64 —
    * operands are ≤10⁶ so the products stay ≤10¹²).
    *
    * Documents with no score (under 2 tokens — gate fodder anyway)
    * and sources with no clean documents flag `false` (the
    * comparison's NULL coalesces): the LM gate only ever REMOVES
    * docs it affirmatively scored as outliers.
    *
    * Scale shape: the LM is two token-keyed count tables
    * (vocabulary-grain shuffles, q107's shape), the per-source means
    * are a sources-row aggregate broadcast back; nothing corpus-sized
    * moves and nothing is collected.
    */
  def lmLowFlags(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, relPpm: Long, onlyClean: Boolean = false): DataFrame = {
    // relPpm is parts-per-million of the source mean: the documented
    // int64-exact domain is [0, 10⁶] (both products then stay ≤10¹²).
    // A caller value above ~9.2e12 would overflow relPpm·mean and
    // silently INVERT the verdict — reject outside the domain instead.
    require(relPpm >= 0 && relPpm <= 1000000L,
      s"relPpm must be in [0, 1000000] (ppm of the source mean), got $relPpm")
    // gate verdict is a row-local predicate: filter the corpus inline
    // instead of deriving clean ids and joining them back (two corpus
    // self-joins removed — guide §2.4)
    val keepE = TextAnalysis.gateKeep(col(textCol))
    val clean = docs.filter(keepE)
    // `onlyClean` scores just the gate-clean slice (the curated-set
    // path, where gate-failed docs are already out); the audit path
    // scores everything so bit 16 is defined for every row. The flags
    // are identical on the shared rows: the per-source mean only ever
    // aggregates clean scored docs.
    val toScore = if (onlyClean) clean else docs
    // scored once, REUSED twice (per-source mean + per-doc compare).
    // Without the checkpoint the whole LM subtree — two vocabulary
    // count tables, their scoring joins, the per-doc rollup — executes
    // once per reference (DataFrame reuse duplicates the subtree; no
    // CSE across branches). The checkpointed frame is (id, src, clean,
    // score) — ~30 bytes/doc, corpus-COUNT-sized not corpus-sized, the
    // standard decision-pass/payload-pass split of guide §8.
    val scored = toScore
      .select(col(idCol), col(srcCol).cast("string").as("__src"),
        keepE.as("__clean"))
      .join(TextAnalysis.bigramLmScore(clean, toScore, idCol, textCol)
          .select(col(idCol), col("score_ppm")),
        Seq(idCol), "left")
      .localCheckpoint(eager = false)
    val srcMean = scored.filter(col("__clean") && col("score_ppm").isNotNull)
      .groupBy("__src")
      .agg(expr("sum(score_ppm) div count(1)").as("__mean"))
    scored
      .join(broadcast(srcMean), Seq("__src"), "left")
      .select(col(idCol),
        coalesce(col("score_ppm") * lit(1000000L) < lit(relPpm) * col("__mean"),
          lit(false)).as("lm_low"))
  }

  /** `nearDupKeep`: an optional NEAR-duplicate keep-list — the first
    * column holds the ids a fuzzy/semantic dedup pass retained (e.g.
    * [[Similarity.semanticDedup]]'s `keep` rows, a SignatureIndex
    * clustering's representatives). Applied AFTER the exact-hash
    * representative step as a left-semi join (ids only — the list
    * never widens the rows), so the curated set composes gate → exact
    * dedup → near dedup → split, the chain a production pipeline runs.
    *
    * `lmGate`: an optional `(sourceColumn, relPpm)` routing the chain
    * through [[lmLowFlags]] — the per-source LM fluency stage runs as
    * part of the QUALITY GATE (before dedup, so a low-fluency doc
    * can't become a dedup-class representative), exactly where a
    * production perplexity filter sits.
    */
  def apply(docs: DataFrame, idCol: String, textCol: String,
      weights: Seq[(String, Double)] = Seq("train" -> 0.9, "val" -> 0.05),
      rest: String = "test",
      nearDupKeep: Option[DataFrame] = None,
      lmGate: Option[(String, Long)] = None): DataFrame = {
    // the q97 gate is a row-local predicate — filter at the scan, never
    // derive ids and re-join the corpus to itself (guide §2.4). The LM
    // stage is id-keyed (its flags come off an aggregation), so it
    // alone keeps a semi-join — over the gate-clean slice only.
    val clean = docs.filter(TextAnalysis.gateKeep(col(textCol)))
    val kept = lmGate.fold(clean) { case (srcCol, relPpm) =>
      clean.join(lmLowFlags(docs, idCol, textCol, srcCol, relPpm,
          onlyClean = true)
        .filter(!col("lm_low")).select(idCol), Seq(idCol), "left_semi")
    }
    // exact-dedup representative via ONE map-side-combined aggregation
    // over a NARROW (id, md5, n_tokens) projection. Everything the
    // output needs is class-invariant or derived from the rep id:
    // every member of a content-hash class has IDENTICAL text, so
    // n_tokens is the same for all of them and min() selects the rep's
    // own value — no join-back, no window. The r16 shape (min(id) over
    // a window partitioned by md5(text)) shuffled every kept row, TEXT
    // INCLUDED, keyed by content hash with no map-side combine: at
    // 100 TB a hot duplicate family (boilerplate duplicated 10⁷×)
    // lands on ONE task's window sort (guide §2.5 skew). Here the
    // exchange carries ~32 bytes/doc, partial aggregation collapses
    // hot classes map-side, and the sort is gone.
    val exact = kept
      .select(col(idCol), md5(col(textCol)).as("__h"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .groupBy("__h")
      .agg(min(col(idCol)).as(idCol), min(col("n_tokens")).as("n_tokens"))
    val deduped = nearDupKeep.fold(exact) { klist =>
      exact.join(klist.select(col(klist.columns.head).as(idCol)),
        Seq(idCol), "left_semi")
    }
    deduped.select(col(idCol),
      Sampling.hashSplit(col(idCol), weights, rest).as("split"),
      col("n_tokens"))
  }

  /** Provenance audit of the SAME chain: one row for EVERY document in
    * the raw corpus saying what the pipeline did to it and why —
    * `reasons` (the q97 gate bitmask, 0 = clean), `dup_of` (the
    * exact-content class representative among gate survivors; null for
    * gate-failed docs), `status` ∈ {kept, gate, exact_dup, near_dup},
    * and `split`/`n_tokens` for the survivors. A 100 TB curation run
    * must be able to answer "why did doc X disappear?" without
    * re-running the pipeline with printouts; this is that answer as one
    * declarative frame over the corpus.
    *
    * Scale shape: the same gate scan and content-hash aggregation
    * [[apply]] pays, with the inner joins widened to LEFT so dropped
    * docs keep their rows — no extra shuffles, no driver state. The
    * kept slice IS the curated set: `audit(...).filter(status = kept)`
    * ≡ `apply(...)` row for row (spec-pinned), so the two surfaces
    * cannot drift.
    */
  def audit(docs: DataFrame, idCol: String, textCol: String,
      weights: Seq[(String, Double)] = Seq("train" -> 0.9, "val" -> 0.05),
      rest: String = "test",
      nearDupKeep: Option[DataFrame] = None,
      lmGate: Option[(String, Long)] = None): DataFrame = {
    val stats97 = TextAnalysis.filterGate(docs, idCol, textCol)
      .select(col(idCol), col("reasons"), col("n_tokens"), col("keep"))
    // the LM stage rides the bitmask: bit 16 = low per-source fluency
    // (provenance — "why did doc X disappear?" answers "lm" the same
    // way it answers "too short"), and keep folds it in so every
    // downstream status/dedup step sees one gate verdict. The joined
    // frame is checkpointed because BOTH the dedup branch and the
    // final assembly reference it — without it the LM-flag join (and
    // the gate scan under it) executes once per reference.
    val stats = lmGate.fold(stats97) { case (srcCol, relPpm) =>
      stats97.join(lmLowFlags(docs, idCol, textCol, srcCol, relPpm), Seq(idCol))
        .select(col(idCol),
          (col("reasons") + when(col("lm_low"), 16L).otherwise(0L)).as("reasons"),
          col("n_tokens"),
          (col("keep") && !col("lm_low")).as("keep"))
        .localCheckpoint(eager = false)
    }
    // survivors' content hashes: with a row-local keep (no LM stage)
    // this is a pure scan — no id derivation, no corpus self-join;
    // with the LM stage only the (id, 16-byte hash) projection joins
    // the id-keyed verdict, never the text
    val gHash = lmGate.fold(
      docs.filter(TextAnalysis.gateKeep(col(textCol)))
        .select(col(idCol), md5(col(textCol)).as("__h"))) { _ =>
      stats.filter(col("keep")).select(idCol)
        .join(docs.select(col(idCol), md5(col(textCol)).as("__h")), Seq(idCol))
    }
    // representative via groupBy + hash-keyed join-back over the
    // CHECKPOINTED narrow projection. The r16 window (min(id) over
    // partition by __h) shuffled with no map-side combine and sorted a
    // hot content class on one task (guide §2.5 skew); the aggregation
    // combines hot classes map-side and AQE's skew-join can split the
    // join-back's oversized partitions — neither is true of a window.
    // The checkpoint keeps r16's no-subtree-reexecution win (gHash is
    // referenced by both the aggregation and the join-back) and is
    // (id, 16-byte hash) — corpus-COUNT-sized, ~24 B/doc, recompute =
    // one gate-filtered corpus scan (see BENCHNOTES checkpoint audit).
    val gH = gHash.localCheckpoint(eager = false)
    val withRep = gH
      .join(gH.groupBy("__h").agg(min(col(idCol)).as("__rep")), Seq("__h"))
      .select(col(idCol), col("__rep"))
    // near-dup keep flag: only meaningful for exact representatives
    // (apply()'s semi-join runs after the exact tier); absent list =
    // everything near-kept
    val nearFlagged = nearDupKeep.fold(stats.withColumn("__nk", lit(true))) {
      klist =>
        stats.join(
          klist.select(col(klist.columns.head).as(idCol)).distinct()
            .withColumn("__nk", lit(true)),
          Seq(idCol), "left")
    }
    val status = when(!col("keep"), lit("gate"))
      .when(col("__rep") =!= col(idCol), lit("exact_dup"))
      .when(col("__nk").isNull, lit("near_dup"))
      .otherwise(lit("kept"))
    nearFlagged.join(withRep, Seq(idCol), "left")
      .select(col(idCol), col("reasons"), col("__rep").as("dup_of"),
        status.as("status"),
        when(status === "kept", Sampling.hashSplit(col(idCol), weights, rest))
          .otherwise(lit(null).cast("string")).as("split"),
        col("n_tokens"))
  }
}
