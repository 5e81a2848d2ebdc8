package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword relevance search over a document corpus — BM25-shaped
  * scoring with an integer-exact contract.
  *
  * The reference's only text search is exact/regex matching inside
  * Prolog goals (prolog-functors.lisp:133-139); ranked keyword search
  * is a pipeline addition a training-data engine needs (corpus
  * triage, targeted subset extraction).
  *
  * Scoring contract (all integer arithmetic, so Spark and any external
  * oracle agree bit-for-bit — no float summation-order or log-ulp
  * drift):
  *
  *   avgdl        = total_tokens div n_docs          (corpus constant)
  *   idf_pm(t)    = (n_docs * 10000) div df(t)        (rarity weight)
  *   tf_pm(t, d)  = (tf * 2 * 10000 * avgdl) div (tf * avgdl + dl)
  *                  — the BM25 saturation curve at k1 = 1, b = 1,
  *                    cleared of fractions by multiplying num and
  *                    denom by avgdl
  *   score(d)     = Σ_t idf_pm(t) * tf_pm(t, d)
  *
  * Scale shape: one explode + two grouped aggregations keyed by doc
  * id (partial map-side combine), query-term table broadcast, corpus
  * stats broadcast as a 1-row frame (never a driver-side collect).
  * Top-k ends in TakeOrdered — no global sort materialization.
  */
object Search {

  /** Per-(doc, term) frequencies for the query terms plus per-doc
    * token length — the index-shaped intermediate. `terms` must be
    * lowercase.
    */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): (DataFrame, DataFrame) = {
    val toks = docs.select(col(idCol).as("__id"),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("t"))
    val dl = toks.groupBy("__id").agg(count(lit(1)).as("dl"))
    val tf = toks.filter(col("t").isInCollection(terms))
      .groupBy("__id", "t").agg(count(lit(1)).as("tf"))
    (tf, dl)
  }

  /** Top-k documents for a bag-of-words query, scored per the
    * integer-exact BM25 contract above. Returns (id, score) ordered
    * (score desc, id asc).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    val (tf, dl) = termFrequencies(docs, idCol, textCol, terms)
    // corpus stats as a broadcast 1-row frame: n = ALL docs (empty
    // docs dilute idf exactly as they do in the oracle), avgdl over
    // token-bearing docs' lengths but divided by n (integer div)
    val stats = docs.agg(count(lit(1)).as("n"))
      .crossJoin(dl.agg(sum("dl").as("total")))
      .select(col("n"), expr("total div n").as("avgdl"))
    val df_ = tf.groupBy("t").agg(count(lit(1)).as("df"))
    tf.join(dl, Seq("__id"))
      .join(broadcast(df_), Seq("t"))
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        expr("((n * 10000) div df) * ((tf * 20000 * avgdl) div (tf * avgdl + dl))"))
      .groupBy("__id").agg(sum("contrib").as("score"))
      .select(col("__id").as(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol)).limit(k)
  }

  /** The same contract as ANSI SQL over the same table, for oracle
    * checks (DuckDB dialect: `//` = integer division, string_split).
    */
  def bm25OracleSql(tableName: String, idCol: String, textCol: String,
      terms: Seq[String], k: Int): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH tk AS (
       |  SELECT $idCol AS id, unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS t
       |  FROM $tableName WHERE length(trim($textCol)) > 0),
       |dl AS (SELECT id, count(*) AS dl FROM tk GROUP BY 1),
       |st AS (SELECT (SELECT count(*) FROM $tableName) AS n,
       |              (SELECT sum(dl) FROM dl) // (SELECT count(*) FROM $tableName) AS avgdl),
       |tf AS (SELECT id, t, count(*) AS tf FROM tk WHERE t IN ($termList) GROUP BY 1, 2),
       |df AS (SELECT t, count(*) AS df FROM tf GROUP BY 1)
       |SELECT tf.id AS $idCol,
       |  CAST(sum(((st.n * 10000) // df.df) *
       |           ((tf.tf * 20000 * st.avgdl) // (tf.tf * st.avgdl + dl.dl))) AS BIGINT) AS score
       |FROM tf JOIN df USING (t) JOIN dl USING (id) CROSS JOIN st
       |GROUP BY 1 ORDER BY score DESC, $idCol LIMIT $k""".stripMargin
  }
}
