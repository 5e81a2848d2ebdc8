package graft.tools

/** Flagship smoke: runs SparkEntry.entry at sf0.001 and prints the row
  * count — the same check the driver applies (rows > 0).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get(8)
    val n = graft.SparkEntry.entry(spark).count()
    println(s"ENTRY ROWS: $n")
    spark.stop()
  }
}
