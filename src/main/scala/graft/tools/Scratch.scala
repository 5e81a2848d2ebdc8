package graft.tools
import org.apache.spark.sql.functions._
import graft.model.Tpch
import graft.query._
import graft.service._
import graft.service.QueryService._
object Scratch { def main(a: Array[String]): Unit = {
  val spark = graft.GraftSession.get(8)
  val g = Tpch.graph(spark, "/root/testdata/sf0.001")
  val svc = new QueryService(g, maxLimit = 100)
  svc.register(RegisteredQuery("by_segment",
    Seq(ParamSpec("segment", "string")),
    p => PatternQuery(
      goals = Seq(IsA("a","customer"), Slot("a","c_mktsegment","seg"),
        Filter(col("seg") === lit(p("segment")))),
      select = Seq("a" -> "custkey"), orderBy = Seq(col("custkey")))))
  val ep = new HttpEndpoint(svc, authToken = Some("tok"))
  val port = ep.start()
  println("LISTENING " + port)
  Thread.sleep(120000)
  ep.stop(); spark.stop()
}}
