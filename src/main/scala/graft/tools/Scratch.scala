package graft.tools
import org.apache.spark.sql.functions._
import graft.model.{Tpch, VersionedStore}
import graft.views.{ViewCatalog, ViewDef}
object Scratch { def main(a: Array[String]): Unit = {
  val spark = graft.GraftSession.get(8)
  import spark.implicits._
  // --- drive ViewCatalog through the public API
  val g = Tpch.graph(spark, "/root/testdata/sf0.001")
  val cat = new ViewCatalog(spark, g, "target/scratch-views")
  cat.register(ViewDef("obc", "placed",
    df => df.select(col("src").as("key"), col("dst").as("id"), col("weight").as("value")),
    Some(sum(col("value")))))
  cat.regenerate("obc")
  println("VIEW lookup(7): " + cat.lookup("obc", 7L).count())
  println("VIEW range 10..20 skip2 cnt5: " + cat.mapView("obc", Some(10L), Some(20L), 2, 5).collect().map(_.getLong(0)).mkString(","))
  println("VIEW grand: " + cat.grandTotal("obc").head())
  // probe: lookup of a key with no rows
  println("VIEW lookup(miss): " + cat.lookup("obc", -5L).count())
  // --- drive VersionedStore
  val st = new VersionedStore(spark, "target/scratch-store-" + System.nanoTime())
  st.commit(Map("v" -> Seq((1L,1L,false,"a")).toDF("id","rev","deleted","name")))
  st.commit(Map("v" -> Seq((1L,2L,false,"b")).toDF("id","rev","deleted","name")))
  println("STORE latest: " + st.read("v").select("name").as[String].head())
  println("STORE asOf1: " + st.read("v", Some(1L)).select("name").as[String].head())
  try { st.commit(Map("v" -> Seq((1L,2L,false,"stale")).toDF("id","rev","deleted","name"))) }
  catch { case e: Throwable => println("STORE conflict OK: " + e.getMessage.take(60)) }
  // probe: commit frame missing required cols
  try { st.commit(Map("v" -> Seq((1L,"x")).toDF("id","name"))) }
  catch { case e: Throwable => println("STORE badframe OK: " + e.getMessage.take(60)) }
  spark.stop()
}}
