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

  def apply(docs: DataFrame, idCol: String, textCol: String,
      weights: Seq[(String, Double)] = Seq("train" -> 0.9, "val" -> 0.05),
      rest: String = "test"): DataFrame = {
    val kept = TextAnalysis.filterGate(docs, idCol, textCol)
      .filter(col("keep")).select(idCol)
      .join(docs, Seq(idCol))
    val reps = kept.groupBy(md5(col(textCol)).as("__h"))
      .agg(min(idCol).as(idCol)).select(idCol)
    kept.join(reps, Seq(idCol))
      .select(col(idCol),
        Sampling.hashSplit(col(idCol), weights, rest).as("split"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
  }
}
