package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.operators.Fixpoint
import graft.query.RuleSet

/** Differential fuzzing of the rules tier (`<-` clauses): random rule
  * programs — non-recursive clause unions, recursive base+step
  * definitions, MIXED recursive+non-recursive clauses under one name,
  * arity-2 pair closures, and explicit budgets — run BOTH through
  * `RuleSet`/`Fixpoint.semiNaive` (iterative delta joins, ring
  * anti-joins, localCheckpoint compaction under Catalyst) and through
  * a driver-side naive-evaluation interpreter over plain Scala sets
  * that restates the reference's recursive-clause semantics
  * (prologc.lisp:626-700) with the engine's documented budget law.
  *
  * What only fuzzing can reach here (the oracle suite runs q32/q38/q39
  * on fixed shapes, and PatternFuzzSpec stops at the goal grammar):
  *  - clause-union set semantics when one clause is a FIXPOINT and
  *    another is a plain scan (relation() must dedup across them);
  *  - the budget LAW, not just "a budget fires": the engine must
  *    throw iff the interpreter's step count / accumulated-row count
  *    exceeds the same bound — an off-by-one in iteration accounting
  *    or a dedup-before-count bug diverges here and nowhere else;
  *  - reverse-direction and weight-filtered step relations (the step
  *    is arbitrary user code over the delta; q32's fixed forward walk
  *    never exercises a filtered or flipped join);
  *  - the ring-compaction path (rings fold every 8 rounds): long
  *    chains cross it, and a fact lost or resurrected in compaction
  *    diverges from the interpreter's accumulated set;
  *  - arity-2 closures where the anti-join key is BOTH columns (a
  *    dedup keyed on a prefix of the head would equate distinct
  *    pairs).
  *
  * Same fixed-seed Gen walk as PatternFuzzSpec (the
  * scalatest-scalacheck bridge isn't on the classpath).
  */
class RulesFuzzSpec extends SparkSpec {
  import spark.implicits._

  private lazy val g = graft.model.Tpch.graph(spark, sf)

  // ---- driver-side universe (collected once; sf0.001 is tiny) ----
  private lazy val knows: Seq[(Long, Long, Double)] =
    g.edgeFrame("knows").select("src", "dst", "weight")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
  private lazy val custIds: Seq[Long] =
    g.vertexFrame("customer").select("id").collect().map(_.getLong(0)).toSeq

  // ---- program AST both sides execute ----
  private sealed trait Clause
  /** customers with id % m == k */
  private case class NodeMod(m: Int, k: Int) extends Clause
  /** src (or dst) endpoints of knows edges with weight > w */
  private case class EdgeEnd(srcSide: Boolean, wMin: Double) extends Clause
  /** recursive reachability: base = NodeMod seed; step walks knows
    * edges (forward or reverse) with weight > wMin, under a budget */
  private case class Reach(seedM: Int, seedK: Int, forward: Boolean,
      wMin: Double, maxIter: Int, maxRows: Long) extends Clause

  private case class Program(clauses: Seq[Clause])

  private val clauseGen: Gen[Clause] = Gen.frequency(
    3 -> (for { m <- Gen.choose(2, 9); k <- Gen.choose(0, 1) } yield NodeMod(m, k)),
    3 -> (for {
      s <- Gen.oneOf(true, false); w <- Gen.oneOf(0.0, 300.0, 600.0, 900.0)
    } yield EdgeEnd(s, w)),
    4 -> (for {
      m <- Gen.choose(13, 41); k <- Gen.choose(0, 2)
      fwd <- Gen.oneOf(true, false)
      w <- Gen.oneOf(0.0, 0.0, 500.0, 800.0)
      // 1-3 often exhaust mid-walk (the budget law's interesting
      // range); 50 always reaches the fixpoint on this graph
      mi <- Gen.oneOf(1, 2, 3, 8, 50)
      mr <- Gen.oneOf(25L, 120L, 10_000_000L)
    } yield Reach(m, k, fwd, w, mi, mr)))

  private val programs: Gen[Program] = for {
    n <- Gen.choose(1, 3)
    cs <- Gen.listOfN(n, clauseGen)
  } yield Program(cs)

  // ---- driver-side interpreter (no Spark) ----
  private def evalNonRec(c: Clause): Set[Long] = c match {
    case NodeMod(m, k) => custIds.filter(_ % m == k).toSet
    case EdgeEnd(true, w) => knows.filter(_._3 > w).map(_._1).toSet
    case EdgeEnd(false, w) => knows.filter(_._3 > w).map(_._2).toSet
    case _: Reach => throw new IllegalStateException("recursive")
  }

  /** Mirrors Fixpoint.semiNaive's loop law exactly: iters counts step
    * applications INCLUDING the one producing the empty delta and
    * throws when it would exceed maxIterations BEFORE applying the
    * step; total accumulates deduped delta sizes on top of the deduped
    * base and throws when it exceeds maxRows AFTER a non-empty round.
    */
  private def fixpointDriver[F](base: Set[F], step: Set[F] => Set[F],
      maxIter: Int, maxRows: Long): Either[String, Set[F]] = {
    var all = base
    var delta = base
    var total = base.size.toLong
    var iters = 0
    while (true) {
      iters += 1
      if (iters > maxIter) return Left("iterations")
      val fresh = step(delta).diff(all)
      if (fresh.isEmpty) return Right(all)
      total += fresh.size
      if (total > maxRows) return Left("rows")
      all ++= fresh
      delta = fresh
    }
    sys.error("unreachable")
  }

  private def reachDriver(r: Reach): Either[String, Set[Long]] = {
    val adj: Map[Long, Seq[Long]] = {
      val es = knows.filter(_._3 > r.wMin)
      val pairs = if (r.forward) es.map(e => (e._1, e._2)) else es.map(e => (e._2, e._1))
      pairs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    }
    fixpointDriver[Long](custIds.filter(_ % r.seedM == r.seedK).toSet,
      delta => delta.flatMap(u => adj.getOrElse(u, Nil)),
      r.maxIter, r.maxRows)
  }

  private def evalDriver(p: Program): Either[String, Set[Long]] = {
    var acc = Set.empty[Long]
    for (c <- p.clauses) c match {
      case r: Reach => reachDriver(r) match {
        case Left(why) => return Left(why)
        case Right(s) => acc ++= s
      }
      case other => acc ++= evalNonRec(other)
    }
    Right(acc)
  }

  // ---- engine side ----
  private def defineEngine(rs: RuleSet, c: Clause): Unit = c match {
    case NodeMod(m, k) => rs.define("r", Seq("x")) { g =>
      g.vertexFrame("customer").filter(col("id") % m === k).select(col("id").as("x"))
    }
    case EdgeEnd(srcSide, w) => rs.define("r", Seq("x")) { g =>
      g.edgeFrame("knows").filter(col("weight") > w)
        .select(col(if (srcSide) "src" else "dst").as("x"))
    }
    case r: Reach =>
      rs.defineRecursive("r", Seq("x"),
          Fixpoint.Budget(maxIterations = r.maxIter, maxRows = r.maxRows)) { g =>
        g.vertexFrame("customer").filter(col("id") % r.seedM === r.seedK)
          .select(col("id").as("x"))
      } { (g, delta) =>
        val e = g.edgeFrame("knows").filter(col("weight") > r.wMin)
        val (from, to) = if (r.forward) ("src", "dst") else ("dst", "src")
        delta.join(e, delta("x") === e(from)).select(e(to).as("x"))
      }
  }

  test("48 random rule programs (clause unions x recursion x budgets) " +
      "equal the driver interpreter, including WHICH budget trips") {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(20260818L)
    var ran = 0
    var threw = 0
    while (ran < 48) {
      programs.apply(params, seed).foreach { p =>
        ran += 1
        val rs = new RuleSet(g)
        p.clauses.foreach(defineEngine(rs, _))
        val want = evalDriver(p)
        want match {
          case Right(expect) =>
            val got = rs.relation("r").select("x").as[Long].collect().toSet
            assert(got == expect, s"rule divergence on $p\n" +
              s"extra=${got.diff(expect)} missing=${expect.diff(got)}")
          case Left(why) =>
            threw += 1
            val ex = intercept[Fixpoint.BudgetExceeded](rs.relation("r").collect())
            assert(ex.getMessage.contains(why),
              s"wrong budget tripped on $p: ${ex.getMessage}, want $why")
        }
      }
      seed = seed.next
    }
    // the generator must actually exercise the budget path
    assert(ran >= 48 && threw >= 5, s"ran=$ran threw=$threw")
  }

  test("16 random arity-2 pair closures: the anti-join key is the FULL " +
      "head (distinct pairs sharing a column survive dedup)") {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(20260819L)
    var ran = 0
    while (ran < 16) {
      val gen = for {
        w <- Gen.oneOf(0.0, 400.0, 800.0)
        m <- Gen.choose(17, 47)
        hops <- Gen.oneOf(3, 5, 50)
      } yield (w, m, hops)
      gen.apply(params, seed).foreach { case (w, m, hops) =>
        ran += 1
        // engine: path(x, y) <- knows(x, y), w > wMin, x % m == 0
        //         path(x, z) <- path(x, y), knows(y, z), w > wMin
        val rs = new RuleSet(g)
        rs.defineRecursive("path", Seq("x", "y"),
            Fixpoint.Budget(maxIterations = hops)) { g =>
          g.edgeFrame("knows").filter(col("weight") > w && col("src") % m === 0)
            .select(col("src").as("x"), col("dst").as("y"))
        } { (g, delta) =>
          val e = g.edgeFrame("knows").filter(col("weight") > w)
          delta.join(e, delta("y") === e("src"))
            .select(delta("x").as("x"), e("dst").as("y"))
        }
        val es = knows.filter(_._3 > w)
        val adj = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
        val want = fixpointDriver[(Long, Long)](
          es.filter(_._1 % m == 0).map(e => (e._1, e._2)).toSet,
          delta => delta.flatMap { case (x, y) => adj.getOrElse(y, Nil).map(z => (x, z)) },
          hops, 10_000_000L)
        want match {
          case Right(expect) =>
            val got = rs.relation("path").select("x", "y")
              .as[(Long, Long)].collect().toSet
            assert(got == expect, s"pair-closure divergence at (w=$w, m=$m, hops=$hops)\n" +
              s"extra=${got.diff(expect)} missing=${expect.diff(got)}")
          case Left(why) =>
            val ex = intercept[Fixpoint.BudgetExceeded](rs.relation("path").collect())
            assert(ex.getMessage.contains(why))
        }
      }
      seed = seed.next
    }
    assert(ran >= 16)
  }
}
