package graft.tools
object Scratch { def main(a: Array[String]): Unit = {
  val spark = graft.GraftSession.get(4)
  val df = graft.SparkEntry.entry(spark)
  println("ENTRY ROWS: " + df.count())
  df.show(5, false)
  spark.stop()
}}
