package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.model.{Backup, GraphSchema, GraphStore}

/** Model-based fuzzing of the durability tier: random interleavings of
  * {commit-create, commit-update, commit-delete, incremental-backup,
  * vacuum, point-in-time restore} run against a live GraphStore while
  * a driver-side MODEL (a plain list of version records) tracks what
  * each surface must answer. The fixed DR specs (BackupChainSpec,
  * TwoProcessReplicationSpec) walk scripted scenarios; random
  * interleavings reach the compositions nobody scripted — a vacuum
  * BETWEEN two increments of the same chain, a PIT restore cutting
  * into an increment whose early epochs were vacuumed at dump time, a
  * delete backed up before its create's vacuum.
  *
  * The model encodes the DOCUMENTED contracts, so any divergence is a
  * bug by construction:
  *  - reads: latest revision per id at the read epoch, tombstones
  *    filtered (VersionedStore.read asOf semantics);
  *  - vacuum(keep=1): only each id's latest revision survives, WITH
  *    its original commit_epoch — so asOf below a destroyed revision's
  *    epoch loses the id (retention destroys history: the
  *    BackupChainSpec vacuum×chain contract);
  *  - incremental dump: captures the epoch-range revisions that still
  *    EXIST in the source at dump time (a pre-dump vacuum thins the
  *    chain; a post-dump vacuum cannot);
  *  - PIT restore: union of chain revisions with epoch <= upTo, and
  *    every read surface over the restored store answers from exactly
  *    that set.
  */
class DrFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(Paths.get("target"), prefix).toString

  // ---- the model ----
  private case class V(id: Long, score: Long, deleted: Boolean, epoch: Long)

  /** Live (id, score) set at `asOf` over a version set. */
  private def modelRead(vs: Seq[V], asOf: Long): Set[(Long, Long)] =
    vs.filter(_.epoch <= asOf).groupBy(_.id)
      .map { case (_, revs) => revs.maxBy(_.epoch) }
      .filterNot(_.deleted).map(v => (v.id, v.score)).toSet

  // ---- op AST ----
  private sealed trait Op
  private case class Create(n: Int) extends Op
  private case class Update(pick: Int) extends Op
  private case class Delete(pick: Int) extends Op
  private case object Dump extends Op
  private case object Vacuum extends Op
  private case class RestorePit(frac: Double) extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    4 -> Gen.choose(2, 8).map(Create),
    3 -> Gen.choose(0, 1000).map(Update),
    2 -> Gen.choose(0, 1000).map(Delete),
    3 -> Gen.const(Dump),
    2 -> Gen.const(Vacuum),
    2 -> Gen.choose(0.0, 1.0).map(RestorePit))

  private val programGen: Gen[List[Op]] = for {
    n <- Gen.choose(8, 14)
    ops <- Gen.listOfN(n, opGen)
  } yield ops

  private def engineRead(s: graft.model.VersionedStore, asOf: Option[Long]): Set[(Long, Long)] =
    s.read("v_doc", asOf = asOf).select("id", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("12 random DR programs: every read surface of the live store, " +
      "its vacuumed self, and every PIT restore equals the model") {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(20260821L)
    var ran = 0
    var restores = 0
    var vacuums = 0
    while (ran < 12) {
      programGen.apply(params, seed).foreach { rawOps =>
        ran += 1
        // scaffold: an incremental dump lands after every third random
        // op and the program always ends dump -> PIT restore, so every
        // walk crosses the dump/vacuum/restore interleavings the suite
        // exists for (a pure-random stream can starve them)
        val ops = rawOps.grouped(3).flatMap(g => g :+ Dump).toList ++
          List(Dump, RestorePit(0.83))
        val schema = GraphSchema.builder().vertex("doc", "id", Seq("score")).build()
        val gs = new GraphStore(spark, schema, tmp("drfuzz-store"))
        // a commit-maintained histogram rides the same random walk: its
        // signed-delta math (adds + superseded-value subtractions from
        // the pre-commit frames captured under the commit lock) must
        // survive every interleaving with vacuum and restore, and this
        // is where that claim gets stormed
        val stats = new graft.operators.MaintainedStatsIndex(
          gs, "v_doc", "score", 0.0, 2000.0, 8, tmp("drfuzz-stats"))
        stats.rebuild(); stats.bind()
        val root = tmp("drfuzz-chain")
        var source = Vector.empty[V]      // versions alive in the source
        var chain = Vector.empty[V]       // versions captured by the chain
        var chainHi = 0L
        var nextId = 0L
        var epoch = 0L

        def liveIds: Seq[Long] =
          modelRead(source, Long.MaxValue).map(_._1).toSeq.sorted

        for (op <- ops) op match {
          case Create(n) =>
            val rows = (0 until n).map { i =>
              val id = nextId + i; (id, id * 7L)
            }
            gs.txn().createVertices("doc", rows.toDF("id", "score")).commit()
            epoch += 1
            source ++= rows.map { case (id, sc) => V(id, sc, deleted = false, epoch) }
            nextId += n
          case Update(pick) =>
            val ids = liveIds
            if (ids.nonEmpty) {
              val id = ids(pick % ids.size)
              val sc = id * 7L + epoch + 1
              gs.txn().updateVertices("doc", Seq((id, sc)).toDF("id", "score")).commit()
              epoch += 1
              source :+= V(id, sc, deleted = false, epoch)
            }
          case Delete(pick) =>
            val ids = liveIds
            if (ids.nonEmpty) {
              val id = ids(pick % ids.size)
              gs.txn().deleteVertices("doc", Seq(id).toDF("id")).commit()
              epoch += 1
              source :+= V(id, 0L, deleted = true, epoch)
            }
          case Dump =>
            val hi = Backup.incremental(gs.store, Seq("v_doc"), root)
            assert(hi == epoch, s"chain high-water $hi != committed epoch $epoch")
            // the dump captures (chainHi, epoch] revisions surviving NOW
            chain ++= source.filter(v => v.epoch > chainHi && v.epoch <= epoch)
            chainHi = epoch
          case Vacuum =>
            gs.store.vacuum("v_doc", keep = 1)
            vacuums += 1
            // only each id's latest revision survives, original epoch kept
            source = source.groupBy(_.id).values.map(_.maxBy(_.epoch)).toVector
          case RestorePit(frac) =>
            if (chainHi > 0) {
              restores += 1
              val upTo = math.max(1L, math.min(chainHi, (frac * chainHi).round))
              val restored = Backup.restoreChain(spark, root, tmp("drfuzz-restore"), upTo)
              val want = chain.filter(_.epoch <= upTo)
              assert(engineRead(restored, None) == modelRead(want, Long.MaxValue),
                s"PIT($upTo) live read drifted (ops=$ops)")
              // an interior as-of over the restored store
              val mid = math.max(1L, upTo / 2)
              assert(engineRead(restored, Some(mid)) == modelRead(want, mid),
                s"PIT($upTo) asOf($mid) drifted (ops=$ops)")
              assert(restored.history("v_doc").count() == want.size.toLong,
                s"PIT($upTo) history size drifted (ops=$ops)")
            }
        }

        // quiescent checks on the source after the whole program (a
        // program with no effective commit has no table to read)
        if (epoch > 0) {
        assert(engineRead(gs.store, None) == modelRead(source, Long.MaxValue),
          s"live read drifted after $ops")
        if (epoch > 1) {
          val mid = epoch / 2
          assert(engineRead(gs.store, Some(mid)) == modelRead(source, mid),
            s"asOf($mid) drifted after $ops (vacuum-destroyed history must " +
              "stay destroyed, surviving history must resolve)")
        }
        assert(gs.store.history("v_doc").count() == source.size.toLong,
          s"history size drifted after $ops")
        // the epoch-diff audit rides the same walk: over the SURVIVING
        // history (vacuum included), diff(mid, now) must classify
        // exactly the ids whose model visibility changed
        if (epoch > 1) {
          val from = epoch / 2
          val windowIds = source
            .filter(v => v.epoch > from && v.epoch <= epoch).map(_.id).toSet
          val beforeIds = modelRead(source, from).map(_._1)
          val afterIds = modelRead(source, Long.MaxValue).map(_._1)
          val wantDiff = windowIds.flatMap { id =>
            (beforeIds(id), afterIds(id)) match {
              case (false, true) => Some(id -> "added")
              case (true, false) => Some(id -> "deleted")
              case (true, true)  => Some(id -> "updated")
              case _             => None
            }
          }.toMap
          val gotDiff = gs.store.diff("v_doc", from, epoch)
            .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
          assert(gotDiff == wantDiff, s"diff($from, $epoch) drifted after $ops")
        }
        // the maintained histogram must equal the model's live set
        // binned with the same pinned edges, whatever the interleaving
        val wantHist = modelRead(source, Long.MaxValue).toSeq
          .map { case (_, sc) =>
            math.max(0L, math.min(7L, math.floor(sc.toDouble * 8 / 2000.0).toLong))
          }
          .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
        val gotHist = stats.histogram().collect()
          .map(r => r.getLong(0) -> r.getLong(1)).filter(_._2 != 0L).toMap
        assert(gotHist == wantHist,
          s"maintained histogram drifted after $ops: got=$gotHist want=$wantHist")
        }
      }
      seed = org.scalacheck.rng.Seed(20260821L + 7919L * ran)
    }
    // the walk must actually exercise the interesting interleavings
    assert(ran >= 12 && restores >= 12 && vacuums >= 6,
      s"ran=$ran restores=$restores vacuums=$vacuums")
  }
}
