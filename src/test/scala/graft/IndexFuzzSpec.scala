package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.model.{GraphSchema, GraphStore}
import graft.operators.{Drift, MaintainedAnnStore, MaintainedPostingIndex, MaintainedStatsIndex}

/** Model-based fuzzing of the maintained-index COMMIT HOOKS (r12
  * next-round #5) — DrFuzzSpec's random-walk shape applied to the
  * index tier, whose MaintainedIndexSpec coverage was example-based:
  * random interleavings of {create, update, delete, rebuild/compact,
  * vacuum} against a bound index, compared after EVERY op to a
  * from-scratch recomputation over the store's current state.
  *
  * The from-scratch twin for the posting/ANN families is the family's
  * own `rebuild()` run in a SECOND index directory: rebuild reads only
  * the committed store state, so a fresh-rebuilt instance IS the
  * definitionally-correct answer, and comparing probe outputs checks
  * the whole read path (base + delta merge, tombstone supersession,
  * bucket pruning) — not just the delta arithmetic. The stats family
  * compares against a direct re-binning of the live rows (the
  * StatsIndexSpec oracle), with vacuum in the op mix because the
  * lock-captured pre-commit frames are exactly what vacuum storms.
  */
class IndexFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val params = Gen.Parameters.default

  private def tmp(prefix: String) =
    Files.createTempDirectory(Paths.get("target"), prefix).toString

  private sealed trait Op
  private case class Create(n: Int) extends Op
  private case class Update(pick: Int) extends Op
  private case class Delete(pick: Int) extends Op
  private case object Rebuild extends Op
  private case object Vacuum extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    4 -> Gen.choose(1, 5).map(Create),
    3 -> Gen.choose(0, 1000).map(Update),
    2 -> Gen.choose(0, 1000).map(Delete),
    2 -> Gen.const(Rebuild),
    1 -> Gen.const(Vacuum))

  private val walkGen: Gen[List[Op]] =
    Gen.choose(7, 11).flatMap(n => Gen.listOfN(n, opGen))

  /** Drive one random walk over a fresh store. `mkRow(id, version)`
    * supplies the payload (version bumps on update so updates MOVE
    * index entries); `compare(tag)` asserts index-vs-twin parity.
    */
  private def drive(ops: List[Op], gs: GraphStore,
      mkRows: (Seq[Long], Long) => org.apache.spark.sql.DataFrame,
      table: String, rebuild: () => Unit, compare: String => Unit): Unit = {
    var nextId = 1000L // above any seed rows
    var version = 0L
    def liveIds: Seq[Long] =
      if (!gs.store.tableExists(table)) Nil
      else gs.store.read(table).select("id").collect().map(_.getLong(0)).sorted
    for ((op, i) <- ops.zipWithIndex) {
      version += 1
      op match {
        case Create(n) =>
          gs.txn().createVertices("doc",
            mkRows(nextId until nextId + n, version)).commit()
          nextId += n
        case Update(pick) =>
          val ids = liveIds
          if (ids.nonEmpty)
            gs.txn().updateVertices("doc",
              mkRows(Seq(ids(pick % ids.size)), version)).commit()
        case Delete(pick) =>
          val ids = liveIds
          if (ids.nonEmpty)
            gs.txn().deleteVertices("doc",
              Seq(ids(pick % ids.size)).toDF("id")).commit()
        case Rebuild => rebuild()
        case Vacuum => gs.store.vacuum(table, keep = 1)
      }
      compare(s"op#$i $op (walk ${ops.mkString(",")})")
    }
  }

  test("12 random walks: the commit-maintained POSTING index answers " +
      "search/bm25/phrase exactly as a from-scratch rebuild, after every op") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    var seed = org.scalacheck.rng.Seed(20260911L)
    var ran = 0
    while (ran < 12) {
      walkGen.apply(params, seed).foreach { ops =>
        ran += 1
        val dir = tmp("idxfz-post")
        val gs = new GraphStore(spark,
          GraphSchema.builder().vertex("doc", "id", Seq("text")).build(), dir)
        val idx = new MaintainedPostingIndex(gs, "doc", "text", dir, nBuckets = 8)
        val twin = new MaintainedPostingIndex(gs, "doc", "text",
          tmp("idxfz-post-twin"), nBuckets = 8)
        def mkRows(ids: Seq[Long], v: Long) = ids.map { id =>
          // version-dependent text: an update genuinely rewrites the
          // doc's postings (terms, tf, positions), not just a no-op rev
          val words = (0 to ((id + v) % 4).toInt)
            .map(j => vocab(((id + v * 7 + j) % vocab.size).toInt))
          (id, words.mkString(" "))
        }.toDF("id", "text")
        // probes are defined once a base exists: seed the store, THEN
        // build + bind (rebuild on a tableless store is a no-op by the
        // r13 guard, pinned below)
        gs.txn().createVertices("doc", mkRows(0L until 3L, 0L)).commit()
        idx.rebuild(); idx.bind()
        var opN = 0
        drive(ops, gs, mkRows, "v_doc", () => idx.rebuild(), { tag =>
          twin.rebuild()
          opN += 1
          val terms = Seq(vocab(ran % vocab.size), vocab((ran + 2) % vocab.size))
          def rows(df: org.apache.spark.sql.DataFrame) =
            df.collect().map(_.toSeq).toSeq
          // one probe surface per op, rotating — every surface is hit
          // several times per walk, and the twin rebuild (the expensive
          // half) still re-verifies from scratch after EVERY op
          opN % 3 match {
            case 0 => assert(rows(idx.search(terms, 50)) == rows(twin.search(terms, 50)),
              s"search drift at $tag")
            case 1 => assert(rows(idx.bm25(terms, 50)) == rows(twin.bm25(terms, 50)),
              s"bm25 drift at $tag")
            case _ =>
              val ph = Seq(vocab(ran % vocab.size), vocab((ran + 1) % vocab.size))
              assert(rows(idx.phrase(ph, 50)) == rows(twin.phrase(ph, 50)),
                s"phrase drift at $tag")
          }
        })
      }
      seed = seed.next
    }
    assert(ran >= 12)
  }

  test("12 random walks: the commit-maintained ANN store answers topK " +
      "exactly as a from-scratch rebuild, after every op") {
    val dim = 4
    var seed = org.scalacheck.rng.Seed(20260912L)
    var ran = 0
    while (ran < 12) {
      walkGen.apply(params, seed).foreach { ops =>
        ran += 1
        val dir = tmp("idxfz-ann")
        val gs = new GraphStore(spark,
          GraphSchema.builder().vertex("doc", "id", Seq("v")).build(), dir)
        val idx = new MaintainedAnnStore(gs, "doc", "v", dir, dim,
          nBits = 3, nTables = 2)
        val twin = new MaintainedAnnStore(gs, "doc", "v",
          tmp("idxfz-ann-twin"), dim, nBits = 3, nTables = 2)
        def vec(id: Long, v: Long): Seq[Double] =
          (0 until dim).map(j => math.sin((id * 13 + v * 5 + j).toDouble))
        def mkRows(ids: Seq[Long], v: Long) =
          ids.map(id => (id, vec(id, v))).toDF("id", "v")
        val queries = Seq(vec(9999, ran.toLong), vec(555, ran.toLong + 1))
        gs.txn().createVertices("doc", mkRows(0L until 3L, 0L)).commit()
        idx.rebuild(); idx.bind()
        var opN = 0
        drive(ops, gs, mkRows, "v_doc", () => idx.rebuild(), { tag =>
          twin.rebuild()
          opN += 1
          val q = queries(opN % queries.size)
          val got = idx.topK(q, 5).collect().map(_.toSeq).toSeq
          val want = twin.topK(q, 5).collect().map(_.toSeq).toSeq
          assert(got == want, s"ANN topK drift at $tag: $got vs $want")
        })
      }
      seed = seed.next
    }
    assert(ran >= 12)
  }

  test("rebuild on a store whose table has never been committed is a " +
      "graceful no-op, not an empty-frame crash (found by the walks)") {
    val dir = tmp("idxfz-empty")
    val gs = new GraphStore(spark,
      GraphSchema.builder().vertex("doc", "id", Seq("text", "v")).build(), dir)
    new MaintainedPostingIndex(gs, "doc", "text", dir).rebuild()
    new MaintainedAnnStore(gs, "doc", "v", dir, dim = 4).rebuild()
    // still "not built": the probe contract is unchanged
    intercept[IllegalArgumentException](
      new MaintainedPostingIndex(gs, "doc", "text", dir).search(Seq("x"), 3).collect())
  }

  test("12 random walks: the commit-maintained STATS histogram equals the " +
      "direct re-binning of the live rows, after every op — vacuum included " +
      "(storming the lock-captured pre-commit frames)") {
    val (lo, hi, nBins) = (0.0, 1000.0, 8)
    var seed = org.scalacheck.rng.Seed(20260913L)
    var ran = 0
    while (ran < 12) {
      walkGen.apply(params, seed).foreach { ops =>
        ran += 1
        val dir = tmp("idxfz-stats")
        val gs = new GraphStore(spark,
          GraphSchema.builder().vertex("doc", "id", Seq("len")).build(), dir)
        val idx = new MaintainedStatsIndex(gs, "v_doc", "len", lo, hi, nBins, dir)
        idx.rebuild(); idx.bind()
        def mkRows(ids: Seq[Long], v: Long) =
          // values straddle the edges so clamps stay exercised
          ids.map(id => (id, (id * 37 + v * 211) % 1400 - 200)).toDF("id", "len")
        drive(ops, gs, mkRows, "v_doc", () => idx.rebuild(), { tag =>
          val expected =
            if (!gs.store.tableExists("v_doc"))
              (0L until nBins.toLong).map((_, 0L))
            else {
              val live = gs.store.read("v_doc")
                .select(Drift.binExpr(col("len").cast("double"),
                  lit(lo), lit(hi), nBins).as("bin"))
                .groupBy("bin").count()
                .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
              (0L until nBins.toLong).map(b => (b, live.getOrElse(b, 0L)))
            }
          val got = idx.histogram().orderBy("bin").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSeq
          assert(got == expected, s"stats drift at $tag: $got vs $expected")
        })
      }
      seed = seed.next
    }
    assert(ran >= 12)
  }

  test("12 random walks: the FEATURE-HASH stats histogram (the q225 " +
      "maintained DSIR model) equals a from-scratch featurize of the " +
      "live rows, after every op — vacuum and rebuild included") {
    import graft.operators.{Sampling, TextAnalysis}
    val nB = 32
    val pool = Seq("the", "cat", "sat", "mat", "fox", "runs", "a", "of",
      "blue", "stone", "42", "!!")
    var seed = org.scalacheck.rng.Seed(20260915L)
    var ran = 0
    while (ran < 12) {
      walkGen.apply(params, seed).foreach { ops =>
        ran += 1
        val dir = tmp("idxfz-ngram")
        val gs = new GraphStore(spark,
          GraphSchema.builder().vertex("doc", "id", Seq("text")).build(), dir)
        val idx = new MaintainedStatsIndex(gs, "v_doc", "text", 0.0, 1.0, nB, dir,
          featureHash = true)
        idx.rebuild(); idx.bind()
        def mkRows(ids: Seq[Long], v: Long) =
          ids.map { id =>
            val n = ((id * 13 + v * 7) % 9).toInt // 0..8 tokens (0 = no features)
            (id, (0 until n)
              .map(j => pool(((id * 31 + v * 17 + j * 5) % pool.size).toInt))
              .mkString(" "))
          }.toDF("id", "text")
        drive(ops, gs, mkRows, "v_doc", () => idx.rebuild(), { tag =>
          val expected =
            if (!gs.store.tableExists("v_doc"))
              (0L until nB.toLong).map((_, 0L))
            else {
              val live = gs.store.read("v_doc")
                .select(explode(TextAnalysis.hashedNgramFeatures(col("text"))).as("f"))
                .select(Sampling.hashBucket(col("f"), nB).as("bin"))
                .groupBy("bin").count()
                .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
              (0L until nB.toLong).map(b => (b, live.getOrElse(b, 0L)))
            }
          val got = idx.histogram().orderBy("bin").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSeq
          assert(got == expected, s"ngram stats drift at $tag")
        })
      }
      seed = seed.next
    }
    assert(ran >= 12)
  }
}
