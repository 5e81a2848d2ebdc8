package graft.tools

/** Times arbitrary catalog queries with the bench's count action —
  * for off-headline measurements (q196, q156, cold-sweep suspects)
  * during the optimization rounds.
  * Usage: runMain graft.tools.QTime <sfDir> <runs> <q1,q2,...>
  */
object QTime {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: QTime <sfDir> <runs> <q1,q2,...>")
    val sfDir = args(0); val runs = args(1).toInt
    val names = args(2).split(',').toSeq.filter(_.nonEmpty)
    val spark = graft.GraftSession.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qtime] $name%-30s " +
        ts.map(t => f"$t%7.3f").mkString(" ") +
        f"  best ${ts.min}%7.3f")
    }
    spark.stop()
  }
}
