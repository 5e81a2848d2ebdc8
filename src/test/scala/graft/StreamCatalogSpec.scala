package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The streaming catalog tier (q118-q120) asserts STREAM/BATCH
  * EQUIVALENCE: each streaming execution must equal the same transform
  * computed as a plain batch query — the engine-level restatement of
  * the reference's "incremental view == regenerated view" contract.
  * (Verify additionally hash-checks these against DuckDB; here the
  * batch side is recomputed in Spark so CI needs no oracle binary.)
  */
class StreamCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q118: streamed windowed agg equals the batch aggregation") {
    val streamed = run("q118_stream_window_agg").collect().toSeq
    val batch = QueryDef.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        QueryDef.centsToDollars(sum(QueryDef.cents(col("value")))).as("total_value"))
      .orderBy("bucket", "event_type").collect().toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("q119: streamed sessions equal batch sessions minus each user's open one") {
    val streamed = run("q119_stream_sessionize")
      .as[(Long, Long, Long)].collect().toSeq
    // batch recomputation: all sessions via the stateless assembler,
    // then drop each user's last (the one the stream holds open)
    val evs = QueryDef.events(spark, sf)
      .select(col("user_id"), date_trunc("second", col("ts")).as("ts"),
        col("event_type"), col("value"))
      .as[graft.streaming.Streams.Event]
    val all = graft.streaming.Streams.openSessions(evs, 1800L * 1000L)
      .collect().toSeq
    val closed = all.groupBy(_.user_id).toSeq.flatMap { case (_, ss) =>
      ss.sortBy(_.startMs).dropRight(1)
    }
    val expected = closed.groupBy(_.user_id).map { case (u, ss) =>
      (u, ss.size.toLong, ss.map(_.n_events.toLong).sum)
    }.toSeq.sortBy(_._1)
    assert(streamed == expected)
    assert(streamed.nonEmpty)
  }

  test("q120: streamed dedup emits exactly the distinct content set") {
    val streamed = run("q120_stream_dedup").as[String].collect().toSeq
    val batch = spark.read.parquet(s"$sf/documents.parquet")
      .select(md5(col("text")).as("h")).distinct()
      .orderBy("h").as[String].collect().toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("q126: stream-stream interval join equals the batch time-range join") {
    val streamed = run("q126_stream_stream_join")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val e = QueryDef.events(spark, sf)
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"), col("event_id").as("view_id"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    val batch = v.join(c, col("user_id") === col("c_user") &&
        col("c_ts") > col("v_ts") &&
        col("c_ts") <= col("v_ts") + expr("INTERVAL 4 HOURS"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("c_ts").cast("long").minus(col("v_ts").cast("long")).as("lag_seconds"))
      .orderBy("user_id", "view_id", "click_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("memory-sink runs are isolated: re-running a streaming query is deterministic") {
    val a = run("q120_stream_dedup").as[String].collect().toSeq
    val b = run("q120_stream_dedup").as[String].collect().toSeq
    assert(a == b)
  }

  test("q195: streaming ANN ingest — the commit-maintained store's post-stream " +
      "probe equals the batch engine's probe over the final graph") {
    val row = run("q195_stream_ann_ingest").collect().head
    val n = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") =!= 0).count()
    assert(row.getLong(0) == n, "every streamed vector must be committed")
    assert(row.getLong(1) == 4L, "the ingest must land as 4 separate commits")
    assert(row.getBoolean(2),
      "maintained-store topK must EXACTLY equal the batch LSH probe " +
        "(incremental == recomputed, the reference's maintenance contract)")
    assert(row.getBoolean(3), "sampled recall audit vs exact top-10 must clear 6/10")
  }

  test("streaming rows read DIRECTORY-shaped tables (the production " +
      "parquet layout), not just single-file testdata") {
    // regression: streamTable's old parent-dir + name-glob read matched
    // leaf FILE names only, so a <table>.parquet/ DIRECTORY of
    // part-*.parquet files streamed zero rows SILENTLY (first caught by
    // the q198 ×8 probe over ScaleCheck's directory-shaped scaled
    // tables). Rewrite the documents table as a 3-file directory and
    // the catalog row must produce the identical sample.
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "dirshape").toString
    spark.read.parquet(s"$sf/documents.parquet").repartition(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fromDir = run("q198_stream_sample").collect().toSeq
    val fromDirShaped = SparkEntry.queries("q198_stream_sample")(spark, dir)
      .collect().toSeq
    assert(fromDirShaped.nonEmpty, "directory-shaped table streamed no rows")
    assert(fromDirShaped == fromDir,
      "the sample must not depend on the table's file layout")
  }
}
