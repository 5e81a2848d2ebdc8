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
    // / the NESTED combinators (r11 grammar gap): Or inside Not, Not
    // inside Or branches, Not inside Not
    shape <- Gen.oneOf("plain", "edge", "noedge", "twohop", "orEdge",
      "notOr", "orNot", "notNot")
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
      // customers with NEITHER edge kind: Or unions inside the
      // anti-joined subpattern
      case "notOr" => base :+ ((Not(Seq(Or(Seq(
        Seq(EdgeGoal("placed", "a", "o2")),
        Seq(EdgeGoal("knows", "a", "o2")))))), Option.empty[FC]))
      // MULTISET union of two anti-joins: a customer lacking both edge
      // kinds must appear twice (branches bind no new vars)
      case "orNot" => base :+ ((Or(Seq(
        Seq(Not(Seq(EdgeGoal("placed", "a", "o2")))),
        Seq(Not(Seq(EdgeGoal("knows", "a", "o2")))))), Option.empty[FC]))
      // double negation: "no order of a lacks a contains edge" — the
      // inner Not anti-joins within the outer Not's own subcompile
      case "notNot" => base :+ ((Not(Seq(
        EdgeGoal("placed", "a", "o2"),
        Not(Seq(EdgeGoal("contains", "o2", "p2"))))), Option.empty[FC]))
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

  // ==== AggGoal routing fuzz: routed plan ≡ from-source ≡ interpreter ====
  // The routing path has the most state in the compiler (epoch gating,
  // kind matching, three join shapes) and until now no differential
  // check. Universe: a LIVE GraphStore with ten registered routed views
  // (2 key props × 5 agg kinds), regenerated (current → routing fires),
  // then one more commit (hook-maintained deltas must be merged by the
  // routed read). A second catalog over the same materialization is
  // bound AFTER that commit — its coverage stamp predates its bind
  // epoch, so routing must REFUSE (the r10 reopened-stale-catalog
  // hazard) and fall back to from-source aggregation. Every program
  // runs through BOTH catalogs and must match the driver interpreter:
  // routed ≡ fallback ≡ spec, per program, row for row.
  private val aggSegs = Seq("BUILDING", "AUTO", "MACH", "HOUSE", "FURN")
  private lazy val aggUniverse: (graft.model.PropertyGraph,
      graft.views.ViewCatalog, graft.views.ViewCatalog,
      Seq[(Long, String, String, Double)]) = {
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "aggfuzz").toString
    val schema = graft.model.GraphSchema.builder()
      .vertex("acct", "id", Seq("seg", "grp", "bal")).build()
    val gs = new graft.model.GraphStore(spark, schema, dir)
    import spark.implicits._
    // integer-valued doubles: distributed partial sums are fp-exact,
    // so sum/avg compare bit-for-bit against the driver's
    def mk(ids: Range) = ids.map(i =>
      (i.toLong, aggSegs(i % 5), s"g${i % 3}", ((i * 37) % 200 + 1).toDouble))
      .toDF("id", "seg", "grp", "bal")
    gs.txn().createVertices("acct", mk(1 to 40)).commit()
    def registerAll(c: graft.views.ViewCatalog): Unit =
      for (kp <- Seq("seg", "grp"); ag <- Seq("sum", "count", "min", "max", "avg")) {
        val reduce = ag match {
          case "sum" => sum(col("value")); case "count" => count(lit(1))
          case "min" => min(col("value")); case "max" => max(col("value"))
          case _ => avg(col("value"))
        }
        c.register(graft.views.ViewDef(s"v_${ag}_$kp", "acct",
          df => df.select(col(kp).as("key"), col("id"), col("bal").as("value")),
          reduceAgg = Some(reduce),
          keyProp = Some(kp), valueProp = Some("bal"), routedAgg = ag))
      }
    val cat = new graft.views.ViewCatalog(spark, gs, dir)
    registerAll(cat)
    cat.bindTo(gs)
    cat.names.foreach(cat.regenerate(_))
    // post-regenerate commit: the routed read must merge this delta
    gs.txn().createVertices("acct", mk(41 to 55)).commit()
    // reopened-stale shape: same materialization, bound after the
    // commit → coverage stamp < bind epoch → must not route
    val stale = new graft.views.ViewCatalog(spark, gs, dir)
    registerAll(stale)
    stale.bindTo(gs)
    val rows = gs.graph().vertexFrame("acct").select("id", "seg", "grp", "bal")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getDouble(3))).toSeq
    (gs.graph(), cat, stale, rows)
  }

  private case class AggProg(kp: String, ag: String, shape: String,
      withN: Boolean, filter: Option[(String, Double)])

  /** The interpreter's view of one agg program: per-key aggregate over
    * the driver rows, composed by shape, filtered, projected.
    */
  private def aggInterpret(rows: Seq[(Long, String, String, Double)],
      p: AggProg): Seq[Seq[Any]] = {
    val keyOf: ((Long, String, String, Double)) => String =
      r => if (p.kp == "seg") r._2 else r._3
    val groups = rows.groupBy(keyOf)
    val aggVal: Map[String, Any] = groups.map { case (k, rs) =>
      k -> (p.ag match {
        case "sum" => rs.map(_._4).sum
        case "count" => rs.size.toLong
        case "min" => rs.map(_._4).min
        case "max" => rs.map(_._4).max
        case _ => rs.map(_._4).sum / rs.size
      })
    }
    val nOf: Map[String, Long] = groups.map { case (k, rs) => k -> rs.size.toLong }
    val base: Seq[Seq[Any]] = p.shape match {
      case "free" =>
        groups.keys.toSeq.map(k => Seq[Any](k, aggVal(k), nOf(k)))
      case "joined" =>
        rows.map(r => Seq[Any](r._1, keyOf(r), aggVal(keyOf(r)), nOf(keyOf(r))))
      case _ => // cross: every row × every group
        for (r <- rows; k <- groups.keys.toSeq)
          yield Seq[Any](r._1, r._4, k, aggVal(k), nOf(k))
    }
    val vIdx = p.shape match { case "free" => 1; case "joined" => 2; case _ => 3 }
    val filtered = p.filter.fold(base) { case (op, c) =>
      base.filter { row =>
        val x = row(vIdx).asInstanceOf[Number].doubleValue
        op match {
          case "<" => x < c; case ">" => x > c
          case "<=" => x <= c; case _ => x >= c
        }
      }
    }
    if (p.withN) filtered else filtered.map(r => r.dropRight(1))
  }

  private def aggQuery(p: AggProg): PatternQuery = {
    val n = if (p.withN) Some("n") else None
    val agg = AggGoal("acct", p.kp, "bal", "k", "v", n, p.ag)
    val (goals, select) = p.shape match {
      case "free" =>
        (Seq[Goal](agg), Seq("k" -> "k", "v" -> "v"))
      case "joined" =>
        (Seq[Goal](IsA("a", "acct"), Slot("a", p.kp, "k"), agg),
          Seq("a" -> "a_id", "k" -> "k", "v" -> "v"))
      case _ =>
        (Seq[Goal](IsA("a", "acct"), Slot("a", "bal", "b"), agg),
          Seq("a" -> "a_id", "b" -> "b", "k" -> "k", "v" -> "v"))
    }
    val fGoal = p.filter.toSeq.map { case (op, c) =>
      Filter(op match {
        case "<" => col("v") < lit(c); case ">" => col("v") > lit(c)
        case "<=" => col("v") <= lit(c); case _ => col("v") >= lit(c)
      }): Goal
    }
    PatternQuery(goals ++ fGoal,
      select ++ (if (p.withN) Seq("n" -> "n") else Nil))
  }

  test("120 AggGoal routing programs: routed (current catalog) and from-source " +
      "(stale catalog refuses to route) both equal the interpreter") {
    val (g2, cat, stale, rows) = aggUniverse
    // the premise, asserted once: current catalog routes every combo,
    // the stale one refuses every combo
    for (kp <- Seq("seg", "grp"); ag <- Seq("sum", "count", "min", "max", "avg")) {
      assert(cat.routeFor("acct", kp, "bal", ag).contains(s"v_${ag}_$kp"),
        s"current catalog must route $ag by $kp")
      assert(stale.routeFor("acct", kp, "bal", ag).isEmpty,
        s"stale catalog must refuse to route $ag by $kp")
    }
    // filter cuts per (kp, ag): actual agg values plus off-grid points
    val cuts: Map[(String, String), Seq[Double]] =
      (for (kp <- Seq("seg", "grp"); ag <- Seq("sum", "count", "min", "max", "avg"))
        yield {
          val vals = aggInterpret(rows, AggProg(kp, ag, "free", withN = false, None))
            .map(_(1).asInstanceOf[Number].doubleValue).sorted
          (kp, ag) -> (vals ++ vals.map(_ + 0.5)).sorted
        }).toMap
    val progs: Gen[AggProg] = for {
      kp <- Gen.oneOf("seg", "grp")
      ag <- Gen.oneOf("sum", "count", "min", "max", "avg")
      shape <- Gen.oneOf("free", "joined", "cross")
      withN <- Gen.oneOf(true, false)
      useF <- Gen.oneOf(true, false)
      op <- Gen.oneOf("<", ">", "<=", ">=")
      ci <- Gen.choose(0, 9)
    } yield AggProg(kp, ag, shape, withN,
      if (useF) { val cs = cuts((kp, ag)); Some((op, cs(ci % cs.size))) } else None)
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(20260817L)
    var ran = 0
    while (ran < 120) {
      progs.apply(params, seed).foreach { p =>
        ran += 1
        val q = aggQuery(p)
        val want = aggInterpret(rows, p)
          .map(_.map(norm).mkString("|")).sorted
        for ((label, vc) <- Seq("routed" -> cat, "stale-fallback" -> stale)) {
          val got = PatternCompiler.run(g2, q, views = Some(vc)).collect()
            .map(r => q.select.indices.map(i => norm(r.get(i))).mkString("|"))
            .toSeq.sorted
          assert(got == want,
            s"$label divergence on $p:\ncompiled=${got.take(8)}... (${got.size} rows)\n" +
              s"interpreted=${want.take(8)}... (${want.size} rows)")
        }
      }
      seed = seed.next
    }
    assert(ran >= 120)
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

  // ==== spatial probe fuzz: pruned plans ≡ brute-force refine ====
  // The cell-pruning tier (Geohash.covering → isin/prefix filter →
  // exact refine) must never DROP a true result — a covering bug would
  // silently shrink every spatial answer. Probes fuzz both the
  // computed-cell path (withinBBox/near/nearestK) and the stored-cell
  // path (withinBBoxStored/nearStored/nearestKStored, including the
  // prefix-match branch when covering lowers precision below the
  // store's). The brute force replicates haversineM's exact op order
  // (same JVM Math calls on the same doubles → bit-identical), so
  // equality is exact, not tolerance-based.
  private lazy val spatialPts: Seq[(Long, Double, Double)] =
    (0L until 500L).map { i =>
      val lon = ((i * 7919) % 7200) / 20.0 - 180.0 // [-180, 179.95]
      val lat = ((i * 104729) % 3400) / 20.0 - 85.0 // [-85, 84.95]
      (i, lon, lat)
    }
  private def havDriver(lon1: Double, lat1: Double,
      lon2: Double, lat2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * 6371000.0 * math.asin(math.min(1.0, math.sqrt(a)))
  }
  private def round3(d: Double): Double = // Spark round(col, 3): HALF_UP
    java.math.BigDecimal.valueOf(d)
      .setScale(3, java.math.RoundingMode.HALF_UP).doubleValue

  test("120 spatial probes (bbox/radius/knn, computed + stored cells): " +
      "cell-pruned plans equal the brute-force refine exactly") {
    import spark.implicits._
    import graft.spatial.{Geohash, SpatialOps}
    val df = spatialPts.toDF("id", "lon", "lat")
    // "stored" tier: the cell column a written store would carry, at
    // two precisions so big boxes at p3 exercise the prefix branch of
    // storedCellFilter (covering drops below the store precision)
    val stores = Map(2 -> SpatialOps.withCell(df, "lon", "lat", 2).cache(),
      3 -> SpatialOps.withCell(df, "lon", "lat", 3).cache())
    sealed trait Probe
    case class BBoxP(box: Geohash.BBox, prec: Int, stored: Boolean) extends Probe
    case class RadiusP(lon: Double, lat: Double, rM: Double, prec: Int,
        stored: Boolean) extends Probe
    case class KnnP(lon: Double, lat: Double, k: Int, prec: Int,
        stored: Boolean) extends Probe
    val probes: Gen[Probe] = for {
      kind <- Gen.oneOf("bbox", "radius", "knn")
      stored <- Gen.oneOf(true, false)
      prec <- Gen.oneOf(2, 3)
      lonLo <- Gen.choose(-350, 300).map(_ / 2.0) // [-175, 150]
      w <- Gen.choose(2, 240).map(_ / 2.0)
      latLo <- Gen.choose(-160, 120).map(_ / 2.0) // [-80, 60]
      h <- Gen.choose(2, 160).map(_ / 2.0)
      // radius/knn centers keep the derived lon box off the ±180 seam
      // (the bbox derivation clamps there by design, same as the
      // reference's spatial-index.lisp:145-168 — not under test)
      cLon <- Gen.choose(-240, 240).map(_ / 2.0)
      cLat <- Gen.choose(-120, 120).map(_ / 2.0)
      rKm <- Gen.oneOf(25.0, 100.0, 400.0, 1500.0, 3000.0)
      k <- Gen.choose(1, 25)
    } yield kind match {
      case "bbox" => BBoxP(Geohash.BBox(lonLo, latLo,
        math.min(179.5, lonLo + w), math.min(84.5, latLo + h)), prec, stored)
      case "radius" => RadiusP(cLon, cLat, rKm * 1000.0, prec, stored)
      case _ => KnnP(cLon, cLat, k, prec, stored)
    }
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(20260818L)
    var ran = 0
    while (ran < 120) {
      probes.apply(params, seed).foreach { p =>
        ran += 1
        p match {
          case BBoxP(box, prec, stored) =>
            val plan =
              if (stored) SpatialOps.withinBBoxStored(stores(prec), prec, "lon", "lat", box)
              else SpatialOps.withinBBox(df, "lon", "lat", box, prec)
            val got = plan.select("id").collect().map(_.getLong(0)).sorted.toSeq
            val want = spatialPts.collect {
              case (id, lon, lat) if lon >= box.minLon && lon <= box.maxLon &&
                lat >= box.minLat && lat <= box.maxLat => id
            }.sorted
            assert(got == want, s"bbox divergence on $p: got ${got.size}, want ${want.size}; " +
              s"missing=${(want.toSet -- got.toSet).take(5)} extra=${(got.toSet -- want.toSet).take(5)}")
          case RadiusP(lon, lat, rM, prec, stored) =>
            val plan =
              if (stored) SpatialOps.nearStored(stores(prec), prec, "lon", "lat", lon, lat, rM)
              else SpatialOps.near(df, "lon", "lat", lon, lat, rM, prec)
            val got = plan.select("id").collect().map(_.getLong(0)).sorted.toSeq
            val want = spatialPts.collect {
              case (id, plon, plat) if havDriver(plon, plat, lon, lat) <= rM => id
            }.sorted
            assert(got == want, s"radius divergence on $p: got ${got.size}, want ${want.size}; " +
              s"missing=${(want.toSet -- got.toSet).take(5)} extra=${(got.toSet -- want.toSet).take(5)}")
          case KnnP(lon, lat, k, prec, stored) =>
            val plan =
              if (stored) SpatialOps.nearestKStored(stores(prec), prec,
                "lon", "lat", "id", lon, lat, k)
              else SpatialOps.nearestK(df, "lon", "lat", "id", lon, lat, k,
                precision = prec)
            val got = plan.select("id", "dist_m").collect()
              .map(r => (r.getLong(0), r.getDouble(1))).toSeq
            val want = spatialPts
              .map { case (id, plon, plat) => (id, round3(havDriver(plon, plat, lon, lat))) }
              .sortBy { case (id, d) => (d, id) }.take(k)
            assert(got == want, s"knn divergence on $p:\ngot=$got\nwant=$want")
        }
      }
      seed = seed.next
    }
    assert(ran >= 120)
  }
}
