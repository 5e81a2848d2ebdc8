package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.model.{GraphSchema, GraphStore, VersionedStore}

/** Current-state index: write-maintained latest-per-id materialization
  * so latest reads don't window over the full MVCC history. Semantics
  * must be indistinguishable from the history path.
  */
class CurrentIndexSpec extends SparkSpec {
  import spark.implicits._

  private val schema = GraphSchema.builder()
    .vertex("person", "id", Seq("name", "age"))
    .build()

  private def tmp(prefix: String) =
    Files.createTempDirectory(Paths.get("target"), prefix).toString

  private def names(st: VersionedStore): Set[(Long, String)] =
    st.read("v_person").select("id", "name").as[(Long, String)].collect().toSet

  test("index reads equal history reads across create/update/delete/recreate") {
    val dir = tmp("cur")
    val gs = new GraphStore(spark, schema, dir)
    gs.txn().createVertices("person",
      Seq((1L, "ann", 30), (2L, "bo", 40)).toDF("id", "name", "age")).commit()
    // opt the table in; later commits maintain the index incrementally
    gs.store.compactCurrent("v_person")
    gs.txn().updateVertices("person", Seq((1L, "ann2", 31)).toDF("id", "name", "age")).commit()
    gs.txn().deleteVertices("person", Seq(Tuple1(2L)).toDF("id")).commit()
    gs.txn().createVertices("person", Seq((2L, "bo2", 41)).toDF("id", "name", "age")).commit()

    // the index was maintained per commit
    assert(Files.exists(Paths.get(s"$dir/v_person__cur")))
    val viaIndex = names(gs.store)
    // force the history path and compare
    spark.conf.set("graft.store.currentIndex", "false")
    try assert(viaIndex == names(gs.store) && viaIndex == Set((1L, "ann2"), (2L, "bo2")))
    finally spark.conf.set("graft.store.currentIndex", "true")
    // snapshot reads are untouched by the index
    assert(gs.store.read("v_person", asOf = Some(1L)).count() == 2)
  }

  test("GraphStore.enableCurrentIndex opts in existing tables, skips absent ones") {
    val dir = tmp("cur-gs")
    val gs = new GraphStore(spark, GraphSchema.builder()
      .vertex("person", "id", Seq("name", "age"))
      .edge("knows", "person", "person")
      .build(), dir)
    gs.txn().createVertices("person", Seq((1L, "a", 1)).toDF("id", "name", "age")).commit()
    gs.enableCurrentIndex() // e_knows has no table yet: must be a no-op
    assert(Files.exists(Paths.get(s"$dir/v_person__cur")))
    assert(!Files.exists(Paths.get(s"$dir/e_knows__cur")))
    gs.txn().updateVertices("person", Seq((1L, "a2", 2)).toDF("id", "name", "age")).commit()
    assert(gs.graph().vertexFrame("person").select("name").as[String].collect().toSeq ==
      Seq("a2"))
  }

  test("reader overlay-heals a stale marker; next commit persists the catch-up") {
    val dir = tmp("cur-heal")
    val gs = new GraphStore(spark, schema, dir)
    gs.txn().createVertices("person", Seq((1L, "a", 1)).toDF("id", "name", "age")).commit()
    gs.store.compactCurrent("v_person")
    // simulate a commit whose index append crashed: rows landed (via a
    // store with the index disabled), marker never advanced
    spark.conf.set("graft.store.currentIndex", "false")
    try gs.txn().updateVertices("person", Seq((1L, "a2", 2)).toDF("id", "name", "age")).commit()
    finally spark.conf.set("graft.store.currentIndex", "true")
    // marker is behind the store epoch, but reads see the new row
    assert(names(gs.store) == Set((1L, "a2")))
    // a later commit folds the missed epoch in persistently
    gs.txn().createVertices("person", Seq((3L, "c", 3)).toDF("id", "name", "age")).commit()
    assert(names(gs.store) == Set((1L, "a2"), (3L, "c")))
    assert(Files.readString(Paths.get(s"$dir/v_person__cur/_epoch")).trim.toLong ==
      gs.store.currentEpoch)
  }

  test("compaction folds deltas into base; reads and time travel unchanged") {
    val dir = tmp("cur-compact")
    val gs = new GraphStore(spark, schema, dir)
    gs.txn().createVertices("person", Seq((1L, "p1", 1)).toDF("id", "name", "age")).commit()
    gs.store.compactCurrent("v_person")
    (2 to 6).foreach { i =>
      gs.txn().createVertices("person",
        Seq((i.toLong, s"p$i", i)).toDF("id", "name", "age")).commit()
    }
    gs.txn().deleteVertices("person", Seq(Tuple1(3L)).toDF("id")).commit()
    val before = names(gs.store)
    // each generation carries its own base + delta log (GenDirs)
    def gen() = graft.model.GenDirs.current(Paths.get(s"$dir/v_person__cur/bases"))
    def deltaCount() =
      if (!Files.exists(gen().resolve("delta"))) 0L
      else java.nio.file.Files.list(gen().resolve("delta")).count()
    val deltasBefore = deltaCount()
    assert(deltasBefore > 0, "commits must have appended index deltas")
    val genBefore = gen()
    gs.store.compactCurrent("v_person")
    assert(Files.exists(gen().resolve("base")))
    // grace window: the superseded generation — its base AND delta
    // dirs — stays on disk intact (reader plans built pre-publish keep
    // their files); the NEW generation starts with an empty delta log
    assert(gen() != genBefore && Files.exists(genBefore.resolve("delta")))
    assert(deltaCount() == 0)
    assert(names(gs.store) == before && !before.exists(_._1 == 3L))
    // ...and the publish after this one sweeps the old generation whole
    gs.store.compactCurrent("v_person")
    assert(!Files.exists(genBefore), "two-generations-old dirs are swept")
    assert(names(gs.store) == before)
    // post-compaction commits keep working through the delta path
    gs.txn().updateVertices("person", Seq((1L, "p1x", 9)).toDF("id", "name", "age")).commit()
    assert(names(gs.store).contains((1L, "p1x")))
    // history/time travel unaffected by index compaction
    assert(gs.store.read("v_person", asOf = Some(3L)).count() == 3)
    assert(gs.store.history("v_person").count() == 8) // 7 versions + tombstone... per-commit rows
  }
}
