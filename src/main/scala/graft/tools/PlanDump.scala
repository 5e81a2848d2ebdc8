package graft.tools

import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` for the given catalog queries into
  * `<outDir>/<query>_<suffix>.txt` — the before/after plan evidence
  * files of the optimization rounds (same format as plans/r16).
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <q1,q2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDump <sfDir> <outDir> <suffix> <q1,q2,...>")
    val sfDir = args(0); val outDir = args(1); val suffix = args(2)
    val names = args(3).split(',').toSeq.filter(_.nonEmpty)
    val spark = graft.GraftSession.get(8)
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"),
        s"## $name\n\n```\n$plan\n```\n")
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
