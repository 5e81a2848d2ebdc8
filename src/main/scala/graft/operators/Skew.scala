package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join utilities. AQE's skew-join splitting covers most
  * cases at runtime; explicit salting remains the tool of choice when a
  * handful of hot keys are known to dwarf everything (the power-law
  * vertex problem every large graph has: join on a celebrity node's id
  * and one task gets the whole key).
  *
  * `saltedJoin` replicates the *small* side `salt` times and scatters
  * the big side's hot keys across salt buckets, so the hot key's rows
  * spread over `salt` tasks instead of one.
  */
object Skew {

  /** Inner equi-join `big ⋈ small` on `key`, salted.
    *
    * @param salt number of buckets a single key is spread over
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val bigSalted = big.withColumn("__salt", pmod(monotonically_increasing_id(), lit(salt)).cast("int"))
    val saltTable = small.sparkSession.range(salt).select(col("id").cast("int").as("__salt"))
    val smallReplicated = small.crossJoin(broadcast(saltTable))
    bigSalted.join(smallReplicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Frequency skim of a key column: top hot keys with their counts
    * and per-million share of the table — the cheap diagnostic that
    * decides between plain, AQE, and salted BEFORE the join runs (a
    * key past a few percent of the table means one task eats it).
    * Deterministic under ties ((n desc, key asc) total order →
    * TakeOrdered); `share_ppm = n·10⁶ div total` is integer-exact.
    *
    * Scale shape: one hash aggregation with map-side partials (the
    * aggregation itself is skew-immune: partial counts combine before
    * the shuffle), a broadcast 1-row total, and a top-k — no sort of
    * the key space.
    */
  def hotKeys(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    require(topN >= 1, "topN must be >= 1")
    val counts = df.groupBy(key).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("__total"))
    counts.crossJoin(broadcast(total))
      .select(col(key), col("n"), expr("n * 1000000 div __total").as("share_ppm"))
      .orderBy(col("n").desc, col(key))
      .limit(topN)
  }
}
