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
}
