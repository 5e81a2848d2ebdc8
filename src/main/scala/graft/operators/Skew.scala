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

  /** Frequency skim of a key column: top hot keys with their counts —
    * the cheap diagnostic to decide between plain, AQE, and salted.
    */
  def hotKeys(df: DataFrame, key: String, topN: Int = 10): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n")).orderBy(col("n").desc).limit(topN)
}
