package graft

import org.apache.spark.sql.functions._

import graft.model.VersionedStore

/** The MVCC/CDC catalog tier (q121-q123): the deterministic two-epoch
  * store build and the time-travel reads over it. The DuckDB hash
  * check runs in Verify; here CI pins the store-side invariants the
  * SQL oracle cannot see (epoch count, partition pruning inputs,
  * rebuild-on-stale).
  */
class MvccCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def docIds = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id").as[Long].collect().toSet

  test("ensureMvccStore builds exactly two epochs, deterministically") {
    val path = CatalogMvcc.ensureMvccStore(spark, sf)
    val st = new VersionedStore(spark, path)
    assert(st.currentEpoch == 2L)
    // a second ensure is a no-op (fingerprint current): same epoch
    assert(CatalogMvcc.ensureMvccStore(spark, sf) == path)
    assert(new VersionedStore(spark, path).currentEpoch == 2L)
  }

  test("q121 asOf(1) sees only epoch-1 rows; q122 current applies rev-2 and tombstones") {
    val ids = docIds
    val evens = ids.filter(_ % 2 == 0)
    val asOf1 = SparkEntry.queries("q121_mvcc_asof")(spark, sf)
    val got1 = asOf1.select("id").as[Long].collect().toSet
    assert(got1 == evens)
    assert(asOf1.filter(col("rev") =!= 1L).isEmpty)

    val cur = SparkEntry.queries("q122_mvcc_current")(spark, sf)
    val tombed = ids.filter(i => i % 14 == 0 && i % 10 != 0)
    val gotCur = cur.select("id").as[Long].collect().toSet
    assert(gotCur == ids -- tombed)
    // every 10-divisible id carries the revised payload at rev 2
    val revised = cur.filter(col("rev") === 2L)
      .select("id", "source").as[(Long, String)].collect().toSeq
    assert(revised.nonEmpty)
    assert(revised.forall { case (i, s) => i % 10 == 0 && s == "revised" })
  }

  test("q123 CDC tail carries exactly the epoch-2 version rows, tombstones included") {
    val ids = docIds
    val cdc = SparkEntry.queries("q123_changes_since")(spark, sf)
      .as[(Long, Long, Boolean, Long)].collect().toSeq
    assert(cdc.forall(_._4 == 2L)) // pruned to the epoch-2 partition
    val odds = ids.filter(_ % 2 == 1)
    val updates = ids.filter(_ % 10 == 0)
    val tombs = ids.filter(i => i % 14 == 0 && i % 10 != 0)
    assert(cdc.count(r => r._2 == 1L && !r._3) == odds.size)
    assert(cdc.count(r => r._2 == 2L && !r._3) == updates.size)
    assert(cdc.filter(_._3).map(_._1).toSet == tombs)
    assert(cdc.size == odds.size + updates.size + tombs.size)
  }
}
