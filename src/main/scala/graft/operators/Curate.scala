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

  /** `nearDupKeep`: an optional NEAR-duplicate keep-list — the first
    * column holds the ids a fuzzy/semantic dedup pass retained (e.g.
    * [[Similarity.semanticDedup]]'s `keep` rows, a SignatureIndex
    * clustering's representatives). Applied AFTER the exact-hash
    * representative step as a left-semi join (ids only — the list
    * never widens the rows), so the curated set composes gate → exact
    * dedup → near dedup → split, the chain a production pipeline runs.
    */
  def apply(docs: DataFrame, idCol: String, textCol: String,
      weights: Seq[(String, Double)] = Seq("train" -> 0.9, "val" -> 0.05),
      rest: String = "test",
      nearDupKeep: Option[DataFrame] = None): DataFrame = {
    val kept = TextAnalysis.filterGate(docs, idCol, textCol)
      .filter(col("keep")).select(idCol)
      .join(docs, Seq(idCol))
    val reps = kept.groupBy(md5(col(textCol)).as("__h"))
      .agg(min(idCol).as(idCol)).select(idCol)
    val exact = kept.join(reps, Seq(idCol))
    val deduped = nearDupKeep.fold(exact) { klist =>
      exact.join(klist.select(col(klist.columns.head).as(idCol)),
        Seq(idCol), "left_semi")
    }
    deduped.select(col(idCol),
      Sampling.hashSplit(col(idCol), weights, rest).as("split"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
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
      nearDupKeep: Option[DataFrame] = None): DataFrame = {
    val stats = TextAnalysis.filterGate(docs, idCol, textCol)
      .select(col(idCol), col("reasons"), col("n_tokens"), col("keep"))
    val gHash = stats.filter(col("keep")).select(idCol)
      .join(docs, Seq(idCol))
      .select(col(idCol), md5(col(textCol)).as("__h"))
    val reps = gHash.groupBy("__h").agg(min(idCol).as("__rep"))
    val withRep = gHash.join(reps, Seq("__h")).select(col(idCol), col("__rep"))
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
