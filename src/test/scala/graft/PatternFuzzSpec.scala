package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.model.Tpch
import graft.query._

/** Differential fuzzing of the pattern compiler: randomized goal
  * programs run BOTH through `PatternCompiler` (DataFrame plans under
  * Catalyst) and through an independent driver-side interpreter that
  * implements the reference's solution-stream semantics directly
  * (generate → bind → filter → anti-join → union, multiset results).
  * Any divergence is a compiler bug by construction — the interpreter
  * is a 60-line executable spec with no Spark in it, so the two
  * implementations share nothing but the AST.
  *
  * Same fixed-seed Gen walk as GeometryPropsSpec (the
  * scalatest-scalacheck bridge isn't on the classpath).
  */
class PatternFuzzSpec extends SparkSpec {

  private lazy val g = Tpch.graph(spark, sf)

  // ---- driver-side universe (collected once; sf0.001 is tiny) ----
  private lazy val customers: Seq[(Long, Double, String)] =
    g.vertexFrame("customer").select("id", "c_acctbal", "c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
  private lazy val placed: Seq[(Long, Long, Double)] =
    g.edgeFrame("placed").select("src", "dst", "weight")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
  private lazy val contains: Seq[(Long, Long, Double)] =
    g.edgeFrame("contains").select("src", "dst", "weight")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
  private lazy val knows: Seq[(Long, Long, Double)] =
    g.edgeFrame("knows").select("src", "dst", "weight")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
  private lazy val placedBySrc: Map[Long, Seq[(Long, Double)]] =
    placed.groupBy(_._1).map { case (k, v) => k -> v.map(t => (t._2, t._3)) }
  private lazy val containsBySrc: Map[Long, Seq[(Long, Double)]] =
    contains.groupBy(_._1).map { case (k, v) => k -> v.map(t => (t._2, t._3)) }
  private lazy val knowsBySrc: Map[Long, Seq[(Long, Double)]] =
    knows.groupBy(_._1).map { case (k, v) => k -> v.map(t => (t._2, t._3)) }

  // ---- a filter mini-AST both sides can execute ----
  private sealed trait FC
  private case class NumCmp(v: String, op: String, c: Double) extends FC
  private case class SegEq(v: String, s: String, neg: Boolean) extends FC
  private case class MulBind(src: String, factor: Double) extends FC // for Bind goals

  private def fcColumn(f: FC): Column = f match {
    case NumCmp(v, "<", c) => col(v) < lit(c)
    case NumCmp(v, ">", c) => col(v) > lit(c)
    case NumCmp(v, "<=", c) => col(v) <= lit(c)
    case NumCmp(v, ">=", c) => col(v) >= lit(c)
    case NumCmp(v, _, c) => col(v) === lit(c)
    case SegEq(v, s, false) => col(v) === lit(s)
    case SegEq(v, s, true) => col(v) =!= lit(s)
  }
  private def fcEval(f: FC, b: Map[String, Any]): Boolean = f match {
    case NumCmp(v, op, c) =>
      val x = b(v).asInstanceOf[Double]
      op match {
        case "<" => x < c; case ">" => x > c
        case "<=" => x <= c; case ">=" => x >= c
        case _ => x == c
      }
    case SegEq(v, s, neg) => (b(v).asInstanceOf[String] == s) != neg
  }

  // ---- the independent interpreter: solution-stream semantics ----
  // Filters carry their FC mini-AST alongside the opaque Column (the
  // interpreter never touches Spark expressions); nested Not/Or
  // branches look their FC up by identity in a side registry.
  private val fcRegistry =
    new java.util.IdentityHashMap[Filter, FC]()
  private def filterOf(fc: FC): (Goal, Option[FC]) = {
    val f = Filter(fcColumn(fc))
    fcRegistry.put(f, fc)
    (f, Some(fc))
  }
  private def extractFc(gl: Goal): (Goal, Option[FC]) = gl match {
    case f: Filter => (f, Option(fcRegistry.get(f)))
    case other => (other, None)
  }

  private def step(sols: Seq[Map[String, Any]],
      goal: (Goal, Option[FC])): Seq[Map[String, Any]] = goal match {
    case (IsA("a", "customer"), _) =>
      sols.flatMap(b => customers.map { case (id, bal, seg) =>
        b + ("a" -> id, "__bal" -> bal, "__seg" -> seg) })
    case (Slot("a", "c_acctbal", out), _) => sols.map(b => b + (out -> b("__bal")))
    case (Slot("a", "c_mktsegment", out), _) => sols.map(b => b + (out -> b("__seg")))
    case (EdgeGoal(label, from, to, w, _), _) =>
      val idx = label match {
        case "placed" => placedBySrc
        case "knows" => knowsBySrc
        case _ => containsBySrc
      }
      sols.flatMap { b =>
        idx.getOrElse(b(from).asInstanceOf[Long], Nil).map { case (dst, wt) =>
          w.fold(b + (to -> dst))(wv => b + (to -> dst, wv -> wt)) }
      }
    case (Regex(v, pat), _) => // rlike = find-anywhere semantics
      val re = java.util.regex.Pattern.compile(pat)
      sols.filter(b => re.matcher(b(v).asInstanceOf[String]).find())
    case (Bind(v, _), Some(MulBind(src, factor))) => // computed binding
      sols.map(b => b + (v -> (b(src).asInstanceOf[Double] * factor)))
    case (Not(inner), _) => // negation as failure: keep rows with NO solutions
      sols.filter(b => inner.map(extractFc).foldLeft(Seq(b))(step).isEmpty)
    case (Or(branches), _) => // union of branch streams (multiset, no dedup)
      sols.flatMap(b => branches.flatMap(br =>
        br.map(extractFc).foldLeft(Seq(b))(step)))
    case (Filter(_), Some(fc)) => sols.filter(b => fcEval(fc, b))
    case (other, _) => sys.error(s"interpreter does not model $other")
  }
  private def interpret(goals: Seq[(Goal, Option[FC])]): Seq[Map[String, Any]] =
    goals.foldLeft(Seq(Map.empty[String, Any]))(step)

  // ---- program generator ----
  private val segs = Seq("BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE")
  private lazy val balCuts: Seq[Double] =
    customers.map(_._2).sorted.grouped(math.max(1, customers.size / 6)).map(_.head).toSeq
  private lazy val wCuts: Seq[Double] =
    placed.map(_._3).sorted.grouped(math.max(1, placed.size / 6)).map(_.head).toSeq

  private def numFc(v: String, cuts: Seq[Double]): Gen[FC] = for {
    op <- Gen.oneOf("<", ">", "<=", ">=")
    c <- Gen.oneOf(cuts)
  } yield NumCmp(v, op, c)
  private def segFc: Gen[FC] = for {
    s <- Gen.oneOf(segs); neg <- Gen.oneOf(true, false)
  } yield SegEq("seg", s, neg)

  private case class Program(goals: Seq[(Goal, Option[FC])],
      select: Seq[(String, String)], distinct: Boolean)

  private val regexPats = Seq("^B", "ING$", "AUTO", "O.E", "^(BU|AU)")

  private val programs: Gen[Program] = for {
    withBal <- Gen.oneOf(true, false)
    withSeg <- Gen.oneOf(true, false)
    // expand / anti-join / two-hop chain (Catalyst join reorder) /
    // Or over GENERATOR branches (union of two edge streams) / neither
    shape <- Gen.oneOf("plain", "edge", "noedge", "twohop", "orEdge")
    useRegex <- Gen.oneOf(true, false)
    regexPat <- Gen.oneOf(regexPats)
    useBind <- Gen.oneOf(true, false)
    bindFactor <- Gen.oneOf(2.0, 0.5, -1.0)
    nFilters <- Gen.choose(0, 2)
    balFilters <- Gen.listOfN(nFilters,
      if (withBal) Gen.oneOf(numFc("bal", balCuts), segFc.filter(_ => withSeg))
      else numFc("w", wCuts))
    useOr <- Gen.oneOf(true, false)
    orA <- numFc(if (withBal) "bal" else "w", if (withBal) balCuts else wCuts)
    orB <- numFc(if (withBal) "bal" else "w", if (withBal) balCuts else wCuts)
    distinct <- Gen.oneOf(true, false)
  } yield {
    val base = Seq((IsA("a", "customer"), Option.empty[FC])) ++
      (if (withBal) Seq((Slot("a", "c_acctbal", "bal"), Option.empty[FC])) else Nil) ++
      (if (withSeg) Seq((Slot("a", "c_mktsegment", "seg"), Option.empty[FC])) else Nil)
    val shaped = shape match {
      case "edge" => base :+ ((EdgeGoal("placed", "a", "o", Some("w")), Option.empty[FC]))
      case "twohop" => base ++ Seq(
        (EdgeGoal("placed", "a", "o", Some("w")), Option.empty[FC]),
        (EdgeGoal("contains", "o", "p", Some("q")), Option.empty[FC]))
      case "noedge" => base :+ ((Not(Seq(EdgeGoal("placed", "a", "o2"))), Option.empty[FC]))
      case "orEdge" => base :+ ((Or(Seq(
        Seq(EdgeGoal("placed", "a", "o", Some("w"))),
        Seq(EdgeGoal("knows", "a", "o", Some("w"))))), Option.empty[FC]))
      case _ => base
    }
    // filters/regex/bind only over vars the shape actually bound
    val hasEdge = shape == "edge" || shape == "twohop" || shape == "orEdge"
    val bound = Set("a") ++ (if (withBal) Set("bal") else Set.empty) ++
      (if (withSeg) Set("seg") else Set.empty) ++
      (if (hasEdge) Set("o", "w") else Set.empty) ++
      (if (shape == "twohop") Set("p", "q") else Set.empty)
    val rx =
      if (useRegex && withSeg) Seq((Regex("seg", regexPat), Option.empty[FC]))
      else Nil
    val bind =
      if (useBind && withBal) {
        val mb = MulBind("bal", bindFactor)
        Seq((Bind("bal2", col("bal") * lit(bindFactor)), Some(mb): Option[FC]),
          filterOf(NumCmp("bal2", "<", balCuts(balCuts.size / 2) * bindFactor)))
      } else Nil
    val fs = balFilters.collect {
      case fc @ NumCmp(v, _, _) if bound(v) => filterOf(fc)
      case fc @ SegEq(v, _, _) if bound(v) => filterOf(fc)
    }
    val orGoal =
      if (useOr && bound(orA.asInstanceOf[NumCmp].v) && bound(orB.asInstanceOf[NumCmp].v)) {
        val (fa, _) = filterOf(orA); val (fb, _) = filterOf(orB)
        Seq((Or(Seq(Seq(fa), Seq(fb))), Option.empty[FC]))
      } else Nil
    val selectable = (bound - "a").toSeq.sorted ++
      (if (useBind && withBal) Seq("bal2") else Nil)
    val select = ("a" -> "a_id") +: selectable.map(v => v -> v)
    Program(shaped ++ rx ++ bind ++ fs ++ orGoal, select, distinct)
  }

  private def norm(v: Any): String = v match {
    case null => "∅"
    case d: Double => java.lang.Double.toString(d)
    case x => x.toString
  }

  test("300 random goal programs: compiled plans equal the independent " +
      "interpreter's solution multiset (distinct respected)") {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(20260815L)
    var ran = 0
    while (ran < 300) {
      programs.apply(params, seed).foreach { p =>
        ran += 1
        val q = PatternQuery(p.goals.map(_._1), p.select, distinct = p.distinct)
        val got = PatternCompiler.run(g, q).collect()
          .map(r => p.select.indices.map(i => norm(r.get(i))).mkString("|")).toSeq
        val wantRaw = interpret(p.goals)
          .map(b => p.select.map { case (v, _) => norm(b(v)) }.mkString("|"))
        val want = if (p.distinct) wantRaw.distinct else wantRaw
        assert(got.sorted == want.sorted,
          s"divergence on program:\n${p.goals.map(_._1).mkString("\n")}\n" +
            s"select=${p.select} distinct=${p.distinct}\n" +
            s"compiled=${got.size} rows, interpreted=${want.size} rows")
      }
      seed = seed.next
    }
    assert(ran >= 300)
  }

  private def cmpAny(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: String, y: String) => x.compareTo(y) // ASCII values: binary == Java order
    case _ => sys.error(s"unorderable: $a / $b")
  }
  private def rowLt(a: Seq[Any], b: Seq[Any]): Boolean = {
    val it = a.zip(b).iterator
    while (it.hasNext) {
      val (x, y) = it.next()
      val c = cmpAny(x, y)
      if (c != 0) return c < 0
    }
    false
  }

  test("120 random ordered paging programs: distinct -> sort -> offset -> " +
      "limit pages identically; countOnly counts the raw stream") {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(20260816L)
    var ran = 0
    val paged = for {
      p <- programs; l <- Gen.choose(1, 15); k <- Gen.choose(0, 8)
    } yield (p, l, k)
    while (ran < 120) {
      paged.apply(params, seed).foreach { case (p, l, k) =>
        ran += 1
        val cols = p.select.map(_._2)
        val q = PatternQuery(p.goals.map(_._1), p.select, distinct = p.distinct,
          orderBy = cols.map(c => col(c).asc), limit = Some(l), skip = Some(k))
        val got = PatternCompiler.run(g, q).collect()
          .map(r => cols.indices.map(i => norm(r.get(i))).mkString("|")).toSeq
        val raw = interpret(p.goals)
        val rows0 = raw.map(b => p.select.map { case (v, _) => b(v) })
        val rows = if (p.distinct) rows0.distinct else rows0
        val want = rows.sortWith(rowLt).slice(k, k + l)
          .map(_.map(norm).mkString("|"))
        assert(got == want,
          s"paging divergence (limit=$l skip=$k distinct=${p.distinct}) on:\n" +
            s"${p.goals.map(_._1).mkString("\n")}\ncompiled=$got\nwant=$want")
        // countOnly counts the UNPROJECTED, pre-distinct stream
        // (PatternCompiler.compile returns count(1) over df before select)
        val n = PatternCompiler.run(g,
          PatternQuery(p.goals.map(_._1), p.select, countOnly = true))
          .head().getLong(0)
        assert(n == raw.size.toLong, s"countOnly drifted: $n vs ${raw.size}")
      }
      seed = seed.next
    }
    assert(ran >= 120)
  }
}
