package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.model.{Backup, GraphSchema, GraphStore, Tpch}
import graft.query._

/** Write path end-to-end: CRUD transactions over the versioned store,
  * queried through the same pattern surface; backup + replay.
  */
class GraphStoreSpec extends SparkSpec {
  import spark.implicits._

  private val schema = GraphSchema.builder()
    .vertex("person", "id", Seq("name", "age"))
    .edge("knows", "person", "person")
    .build()

  private def tmp(prefix: String) =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), prefix).toString

  test("create, query via pattern compiler, update, delete") {
    val gs = new GraphStore(spark, schema, tmp("gs"))
    gs.txn()
      .createVertices("person", Seq((1L, "ann", 30), (2L, "bo", 40), (3L, "cy", 50))
        .toDF("id", "name", "age"))
      .createEdges("knows", Seq((1L, 2L, 1.0), (2L, 3L, 1.0)).toDF("src", "dst", "weight"))
      .commit()

    val hit = PatternCompiler.run(gs.graph(), PatternQuery(
      goals = Seq(IsA("a", "person"), EdgeGoal("knows", "a", "b"),
        Slot("b", "name", "n")),
      select = Seq("a" -> "a", "n" -> "knows_name"),
      orderBy = Seq(col("a"))))
    assert(hit.as[(Long, String)].collect().toSeq == Seq((1L, "bo"), (2L, "cy")))

    val e1 = gs.store.currentEpoch
    gs.txn().updateVertices("person", Seq((2L, "bob", 41)).toDF("id", "name", "age")).commit()
    gs.txn().deleteVertices("person", Seq(Tuple1(3L)).toDF("id")).commit()

    val now = gs.graph()
    assert(now.vertexFrame("person").count() == 2)
    assert(now.vertexFrame("person").filter($"id" === 2).select("name").as[String].head() == "bob")
    // pinned snapshot still sees the pre-update world
    val old = gs.graph(asOf = Some(e1))
    assert(old.vertexFrame("person").count() == 3)
    assert(old.vertexFrame("person").filter($"id" === 2).select("name").as[String].head() == "bo")
  }

  test("edge update and delete round trip") {
    val gs = new GraphStore(spark, schema, tmp("ge"))
    gs.txn()
      .createVertices("person", Seq((1L, "a", 1), (2L, "b", 2)).toDF("id", "name", "age"))
      .createEdges("knows", Seq((1L, 2L, 1.0)).toDF("src", "dst", "weight"))
      .commit()
    val eid = gs.graph().edgeFrame("knows").select("id").as[Long].head()
    gs.txn().updateEdges("knows",
      Seq((eid, 1L, 2L, 9.5)).toDF("id", "src", "dst", "weight")).commit()
    assert(gs.graph().edgeFrame("knows").select("weight").as[Double].head() == 9.5)
    gs.txn().deleteEdges("knows", Seq(Tuple1(eid)).toDF("id")).commit()
    assert(gs.graph().edgeFrame("knows").count() == 0)
    // vertices untouched
    assert(gs.graph().vertexFrame("person").count() == 2)
  }

  test("backup and restore round trip") {
    val g = Tpch.graph(spark, sf)
    val dir = tmp("bak")
    Backup.backup(g, dir)
    val restored = Backup.restore(spark, Tpch.schema, dir)
    assert(restored.vertexFrame("customer").count() == g.vertexFrame("customer").count())
    assert(restored.edgeFrame("placed").count() == g.edgeFrame("placed").count())
    assert(restored.vertexLabels.toSet == g.vertexLabels.toSet)
  }

  test("replay rebuilds identical state; subset replica filters") {
    val gs = new GraphStore(spark, schema, tmp("src"))
    gs.txn().createVertices("person",
      Seq((1L, "a", 1), (2L, "b", 2), (10L, "x", 9)).toDF("id", "name", "age")).commit()
    gs.txn().updateVertices("person", Seq((1L, "a2", 1)).toDF("id", "name", "age")).commit()

    val replica = Backup.replay(spark, gs.store, Seq("v_person"), tmp("dst"))
    assert(replica.currentEpoch == gs.store.currentEpoch)
    val got = replica.read("v_person").select("id", "name").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a2"), (2L, "b"), (10L, "x")))

    // subset replication on an immutable attribute (id range)
    val sub = Backup.replay(spark, gs.store, Seq("v_person"), tmp("sub"),
      subsetFilter = Some(col("id") < 10))
    assert(sub.read("v_person").select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("schema evolution: add a slot to a live table, mixed-epoch reads/writes/snapshots") {
    // node-type-diff (schema.lisp:453-493): a redefinition with a new
    // slot updates the type; old versions keep their narrower layout
    val dir = tmp("evolve")
    val v1 = GraphSchema.builder().vertex("person", "id", Seq("name")).build()
    val gs1 = new GraphStore(spark, v1, dir)
    gs1.txn().createVertices("person", Seq((1L, "ann"), (2L, "bo")).toDF("id", "name")).commit()
    val preEvolution = gs1.store.currentEpoch
    // v1 rejects the not-yet-declared slot (the diff gate)
    intercept[IllegalArgumentException] {
      gs1.conformVertices("person", Seq((3L, "cy", 50)).toDF("id", "name", "age"))
    }

    // redeclare with the extra slot over the SAME storage
    val v2 = GraphSchema.builder().vertex("person", "id", Seq("name", "age")).build()
    val gs2 = new GraphStore(spark, v2, dir)
    // writes: conform accepts the new slot, absent values land as typed nulls
    gs2.txn().createVertices("person",
      gs2.conformVertices("person", Seq((3L, "cy", 50)).toDF("id", "name", "age"))).commit()
    gs2.txn().updateVertices("person",
      gs2.conformVertices("person", Seq((1L, "ann2", 31)).toDF("id", "name", "age"))).commit()

    // reads: mixed epochs merge; pre-evolution rows carry null age
    val now = gs2.graph().vertexFrame("person")
      .select("id", "name", "age").collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1 else r.getInt(2))).toSet
    assert(now == Set((1L, "ann2", 31), (2L, "bo", -1), (3L, "cy", 50)))

    // snapshots pinned before the evolution still resolve
    val old = gs2.graph(asOf = Some(preEvolution)).vertexFrame("person")
    assert(old.select("id", "name").as[(Long, String)].collect().toSet ==
      Set((1L, "ann"), (2L, "bo")))
    // and the pre-evolution store handle keeps working for v1 columns
    assert(gs1.graph().vertexFrame("person").select("name").as[String].collect().toSet ==
      Set("ann2", "bo", "cy"))
  }

  test("recreate after delete: tombstoned ids accept a new life") {
    val gs = new GraphStore(spark, schema, tmp("gs"))
    gs.txn().createVertices("person", Seq((7L, "gil", 20)).toDF("id", "name", "age")).commit()
    gs.txn().deleteVertices("person", Seq(Tuple1(7L)).toDF("id")).commit()
    assert(gs.graph().vertexFrame("person").filter(col("id") === 7L).count() == 0)
    // create again: must succeed the tombstone, not conflict forever
    gs.txn().createVertices("person", Seq((7L, "gil2", 21)).toDF("id", "name", "age")).commit()
    val row = gs.graph().vertexFrame("person").filter(col("id") === 7L)
      .select("name").as[String].head()
    assert(row == "gil2")
    // update of a deleted id resurrects it too
    gs.txn().deleteVertices("person", Seq(Tuple1(7L)).toDF("id")).commit()
    gs.txn().updateVertices("person", Seq((7L, "gil3", 22)).toDF("id", "name", "age")).commit()
    assert(gs.graph().vertexFrame("person").filter(col("id") === 7L).count() == 1)
    // but create over a LIVE id still conflicts
    intercept[gs.store.ConflictException] {
      gs.txn().createVertices("person", Seq((7L, "dup", 1)).toDF("id", "name", "age")).commit()
    }
  }

  test("conformVertices: unknown columns and uncastable values rejected, gaps null-filled") {
    val gs = new GraphStore(spark, schema, tmp("gs"))
    gs.txn().createVertices("person", Seq((1L, "ann", 30)).toDF("id", "name", "age")).commit()
    intercept[IllegalArgumentException] {
      gs.conformVertices("person", Seq((2L, "x")).toDF("id", "not_a_slot"))
    }
    intercept[IllegalArgumentException] { // string id does not cast
      gs.conformVertices("person", Seq(("abc", "bo")).toDF("id", "name"))
    }
    // numeric-as-string casts fine; missing age arrives as typed null
    val ok = gs.conformVertices("person", Seq(("2", "bo")).toDF("id", "name"))
    assert(ok.schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(ok.columns.toSet == Set("id", "name", "age"))
    gs.txn().createVertices("person", ok).commit()
    assert(gs.graph().vertexFrame("person").count() == 2)
  }

  test("satisfies-type check rejects violating rows at the writer") {
    val checked = GraphSchema.builder()
      .vertex("user", "id", Seq("email", "age"),
        check = Some(col("email").rlike("^[^@\\s]+@[^@\\s]+$") && col("age") >= 0))
      .build()
    val gs = new GraphStore(spark, checked, tmp("gs-check"))
    gs.txn().createVertices("user",
      Seq((1L, "a@b.com", 30)).toDF("id", "email", "age")).commit()
    intercept[IllegalArgumentException] {
      gs.txn().createVertices("user",
        Seq((2L, "not-an-email", 30)).toDF("id", "email", "age"))
    }
    intercept[IllegalArgumentException] {
      gs.txn().updateVertices("user",
        Seq((1L, "a@b.com", -5)).toDF("id", "email", "age"))
    }
    assert(gs.graph().vertexFrame("user").count() == 1)
  }

  test("read-your-writes: a txn's graphView sees staged rows before commit") {
    val gs = new GraphStore(spark, schema, tmp("gs-ryw"))
    gs.txn().createVertices("person", Seq((1L, "ann", 30)).toDF("id", "name", "age")).commit()
    val txn = gs.txn()
      .createVertices("person", Seq((2L, "bo", 41)).toDF("id", "name", "age"))
      .updateVertices("person", Seq((1L, "ann2", 31)).toDF("id", "name", "age"))
      .deleteVertices("person", Seq(Tuple1(99L)).toDF("id")) // no-op id
      .createEdges("knows", Seq((1L, 2L, 1.0)).toDF("src", "dst", "weight"))
    val view = txn.graphView()
    val names = view.vertexFrame("person").select("id", "name")
      .as[(Long, String)].collect().toMap
    assert(names == Map(1L -> "ann2", 2L -> "bo")) // staged create + update visible
    assert(view.edgeFrame("knows").count() == 1)   // staged edge visible
    // committed state unchanged until commit
    assert(gs.graph().vertexFrame("person").count() == 1)
    assert(gs.graph().vertexFrame("person").select("name").as[String].head() == "ann")
    txn.commit()
    assert(gs.graph().vertexFrame("person").count() == 2)
  }

  test("open-graph by location: the schema persists with the store, open() " +
      "reopens without code-side types, evolution updates the stamp") {
    val dir = tmp("gs-open")
    val gs = new GraphStore(spark, schema, dir)
    gs.txn().createVertices("person",
      Seq((1L, "ada", 36L), (2L, "bob", 41L)).toDF("id", "name", "age")).commit()
    gs.txn().createEdges("knows", Seq((1L, 2L, 1.0)).toDF("src", "dst", "weight")).commit()
    // the persisted types round-trip byte-identically
    val p = java.nio.file.Paths.get(dir, "_schema.json")
    assert(java.nio.file.Files.exists(p), "construction must stamp _schema.json")
    val json = java.nio.file.Files.readString(p)
    assert(GraphSchema.toJson(GraphSchema.fromJson(json)) == json)
    // reopen by LOCATION alone: types come from the store, reads and
    // writes work, inheritance metadata intact
    val reopened = GraphStore.open(spark, dir)
    assert(reopened.schema.vertexTypes.keySet == Set("person"))
    assert(reopened.schema.edgeTypes("knows").srcLabel == "person")
    assert(reopened.graph().vertices("person").count() == 2L)
    reopened.txn().createVertices("person",
      Seq((3L, "eve", 29L)).toDF("id", "name", "age")).commit()
    assert(gs.graph().vertices("person").count() == 3L,
      "both handles see the same store state")
    // inheritance order survives the round trip (parents first)
    val kids = GraphSchema.builder()
      .vertex("base", "id", Seq("x"))
      .vertex("child", "id", Seq("x", "y"), parent = Some("base"))
      .build()
    val j2 = GraphSchema.toJson(kids)
    assert(GraphSchema.fromJson(j2).descendants("base").toSet == Set("base", "child"))
    // schema evolution through a widened declaration updates the file
    val widened = GraphSchema.builder()
      .vertex("person", "id", Seq("name", "age", "city"))
      .edge("knows", "person", "person")
      .build()
    new GraphStore(spark, widened, dir)
    assert(GraphStore.open(spark, dir).schema
      .requireVertex("person").props.contains("city"))
    // not-a-store dirs refuse loudly
    intercept[IllegalArgumentException](GraphStore.open(spark, tmp("gs-empty")))
  }

  test("restore refuses an interrupted (manifest-less or partial) backup") {
    val gs = new GraphStore(spark, schema, tmp("gs-bk"))
    gs.txn().createVertices("person", Seq((1L, "ann", 30)).toDF("id", "name", "age"))
      .createEdges("knows", Seq((1L, 1L, 1.0)).toDF("src", "dst", "weight")).commit()
    val dir = tmp("bk-dump")
    Backup.backup(gs.graph(), dir)
    // complete dump restores
    assert(Backup.restore(spark, schema, dir).vertexFrame("person").count() == 1)
    // no manifest (crash before the commit record) → refused
    val mf = java.nio.file.Paths.get(dir, "_manifest.json")
    val saved = java.nio.file.Files.readString(mf)
    java.nio.file.Files.delete(mf)
    intercept[IllegalArgumentException] { Backup.restore(spark, schema, dir) }
    // manifest present but a listed frame missing → refused, not dropped
    java.nio.file.Files.writeString(mf, saved)
    def rm(f: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(f)) java.nio.file.Files.list(f).forEach(rm)
      java.nio.file.Files.delete(f)
    }
    rm(java.nio.file.Paths.get(dir, "edges", "knows"))
    intercept[IllegalArgumentException] { Backup.restore(spark, schema, dir) }
  }
}
