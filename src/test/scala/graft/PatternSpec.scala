package graft

import org.apache.spark.sql.functions._

import graft.model.Tpch
import graft.operators.{Fixpoint, Traverse}
import graft.query._

/** Pattern-query compiler semantics: binding cases, negation, union,
  * subclass scans, params — mirroring the reference's
  * prolog-functor-tests / query-tests contracts (SURVEY.md §5).
  */
class PatternSpec extends SparkSpec {
  import spark.implicits._

  private lazy val g = Tpch.graph(spark, sf)

  test("is-a generator binds ids and props") {
    val df = PatternCompiler.run(g, PatternQuery(
      goals = Seq(IsA("a", "customer"), Slot("a", "c_name", "n")),
      select = Seq("a" -> "id", "n" -> "name")))
    assert(df.count() == 150)
    assert(df.columns.toSet == Set("id", "name"))
  }

  test("edge goal with from bound = VE access path") {
    val df = PatternCompiler.run(g, PatternQuery(
      goals = Seq(IsA("a", "customer"), Filter(col("a") === 7L), EdgeGoal("placed", "a", "o")),
      select = Seq("o" -> "orderkey")))
    val expected = spark.read.parquet(s"$sf/orders.parquet")
      .filter($"o_custkey" === 7).count()
    assert(df.count() == expected)
  }

  test("edge goal with both bound = VEV existence scan") {
    val anyEdge = g.edgeFrame("placed").select("src", "dst").head()
    val df = PatternCompiler.run(g, PatternQuery(
      goals = Seq(
        IsA("a", "customer"), Filter(col("a") === anyEdge.getLong(0)),
        IsA("o", "order"), Filter(col("o") === anyEdge.getLong(1)),
        EdgeGoal("placed", "a", "o")),
      select = Seq("a" -> "c", "o" -> "o")))
    assert(df.count() == 1)
  }

  test("negation is anti-join over shared vars") {
    val withO = PatternCompiler.run(g, PatternQuery(
      goals = Seq(IsA("a", "customer"), EdgeGoal("placed", "a", "o")),
      select = Seq("a" -> "id"), distinct = true)).count()
    val without = PatternCompiler.run(g, PatternQuery(
      goals = Seq(IsA("a", "customer"), Not(Seq(EdgeGoal("placed", "a", "o")))),
      select = Seq("a" -> "id"))).count()
    assert(withO + without == 150)
  }

  test("or is bag union: both-branch rows appear twice") {
    val df = PatternCompiler.run(g, PatternQuery(
      goals = Seq(IsA("a", "customer"), Slot("a", "c_acctbal", "b"),
        Or(Seq(Seq(Filter(col("b") > -1e9)), Seq(Filter(col("b") > -1e9))))),
      select = Seq("a" -> "id")))
    assert(df.count() == 300)
  }

  test("or keeps earlier Slot/Bind bindings and allows Slot after the union") {
    // ADVICE r1: the union's keep-set must carry non-var columns bound
    // before the Or (Slot/Bind), and props must remain attachable after
    val df = PatternCompiler.run(g, PatternQuery(
      goals = Seq(
        IsA("a", "customer"),
        Slot("a", "c_acctbal", "bal"),          // bound before the Or
        Bind("flag", lit(1)),                    // computed before the Or
        Or(Seq(Seq(Filter(col("bal") > 5000)), Seq(Filter(col("bal") < 0)))),
        Slot("a", "c_mktsegment", "seg")),       // prop attach AFTER the Or
      select = Seq("a" -> "id", "bal" -> "bal", "flag" -> "flag", "seg" -> "seg")))
    val expected = spark.read.parquet(s"$sf/customer.parquet")
      .filter($"c_acctbal" > 5000 || $"c_acctbal" < 0).count()
    assert(df.count() == expected)
    assert(df.columns.toSet == Set("id", "bal", "flag", "seg"))
  }

  test("or branches binding a fresh var keep its props when all branches attach them") {
    val df = PatternCompiler.run(g, PatternQuery(
      goals = Seq(
        Or(Seq(
          Seq(IsA("a", "customer"), Filter(col("a__c_acctbal") > 5000)),
          Seq(IsA("a", "customer"), Filter(col("a__c_acctbal") < 0)))),
        Slot("a", "c_name", "n")),
      select = Seq("a" -> "id", "n" -> "name")))
    val expected = spark.read.parquet(s"$sf/customer.parquet")
      .filter($"c_acctbal" > 5000 || $"c_acctbal" < 0).count()
    assert(df.count() == expected)
  }

  test("unknown type / unbound slot fail fast") {
    intercept[IllegalArgumentException] {
      PatternCompiler.run(g, PatternQuery(Seq(IsA("a", "nope")), Seq("a" -> "id")))
    }
    intercept[IllegalArgumentException] {
      PatternCompiler.run(g, PatternQuery(Seq(Slot("a", "c_name", "n")), Seq("n" -> "n")))
    }
  }

  test("param binds a runtime literal") {
    val df = PatternCompiler.run(g, PatternQuery(
      goals = Seq(IsA("a", "customer"), Slot("a", "c_mktsegment", "s"),
        Param("w", "seg"), Filter(col("s") === col("w"))),
      select = Seq("a" -> "id"), params = Map("seg" -> "BUILDING")))
    val expected = g.vertexFrame("customer").filter($"c_mktsegment" === "BUILDING").count()
    assert(df.count() == expected)
  }

  test("limit/skip/count options") {
    val q = PatternQuery(
      goals = Seq(IsA("o", "order")),
      select = Seq("o" -> "id"), orderBy = Seq(col("id")), limit = Some(10), skip = Some(5))
    val ids = PatternCompiler.run(g, q).as[Long].collect()
    assert(ids.sameElements(5L until 15L))
    val cnt = PatternCompiler.run(g, PatternQuery(
      goals = Seq(IsA("o", "order")), select = Seq("o" -> "n"), countOnly = true))
      .as[Long].head()
    assert(cnt == 1500)
  }

  test("bfs depth-0 and unreachable") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (9L, 9L)).toDF("src", "dst")
    val start = Seq(1L).toDF("id")
    val got = Traverse.bfs(edges, start, maxDepth = 10)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("bfs both-direction") {
    val edges = Seq((1L, 2L), (3L, 2L)).toDF("src", "dst")
    val got = Traverse.bfs(edges, Seq(1L).toDF("id"), 5, Traverse.Both)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("fixpoint converges on cyclic graph and respects budgets") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val base = Seq(1L).toDF("id")
    val closure = Fixpoint.semiNaive(base, Seq("id")) { delta =>
      delta.join(edges, delta("id") === edges("src")).select($"dst".as("id"))
    }
    assert(closure.as[Long].collect().toSet == Set(1L, 2L, 3L))
    intercept[Fixpoint.BudgetExceeded] {
      Fixpoint.semiNaive(base, Seq("id"), Fixpoint.Budget(maxIterations = 1)) { delta =>
        delta.join(edges, delta("id") === edges("src")).select($"dst".as("id"))
      }
    }
  }

  test("motif sugar compiles to the same results as the explicit AST") {
    val sugar = PatternCompiler.run(g, PatternQuery(
      goals = Motif.goals("(a:customer)-[placed price]->(o)") ++ Seq(
        Slot("a", "c_mktsegment", "seg"),
        Filter(col("seg") === "BUILDING"),
        Filter(col("price") > 150000.0)),
      select = Seq("a" -> "custkey", "o" -> "orderkey", "price" -> "totalprice"),
      orderBy = Seq(col("orderkey"))))
    val ast = PatternCompiler.run(g, PatternQuery(
      goals = Seq(
        IsA("a", "customer"),
        Slot("a", "c_mktsegment", "seg"),
        Filter(col("seg") === "BUILDING"),
        EdgeGoal("placed", "a", "o", weightVar = Some("price")),
        Filter(col("price") > 150000.0)),
      select = Seq("a" -> "custkey", "o" -> "orderkey", "price" -> "totalprice"),
      orderBy = Seq(col("orderkey"))))
    assert(sugar.collect().toSeq == ast.collect().toSeq)
  }

  test("motif: chains, reversed edges, multiple clauses") {
    // (n)<-[located_in]-(a) == (a)-[located_in]->(n)
    val rev = PatternCompiler.run(g, PatternQuery(
      goals = Motif.goals("(n:nation)<-[located_in]-(a:customer)"),
      select = Seq("a" -> "custkey", "n" -> "nationkey")))
    assert(rev.count() == 150)
    // chain + extra clause share the middle var
    val chain = PatternCompiler.run(g, PatternQuery(
      goals = Motif.goals("(a:customer)-[placed]->(o)-[contains]->(p), (p)-[supplied_by]->(s:supplier)"),
      select = Seq("a" -> "custkey", "p" -> "partkey", "s" -> "suppkey")))
    assert(chain.count() > 0)
    // malformed motifs fail fast
    intercept[IllegalArgumentException] { Motif.goals("a-[placed]->(o)") }
    intercept[IllegalArgumentException] { Motif.goals("(a)-[placed->(o)") }
  }

  test("fixpoint row and wall-clock budgets trip") {
    val edges = spark.range(0, 2000).select($"id".as("src"), ($"id" + 1).as("dst"))
    val base = Seq(0L).toDF("id")
    intercept[Fixpoint.BudgetExceeded] { // row cap
      Fixpoint.semiNaive(base, Seq("id"), Fixpoint.Budget(maxRows = 10)) { delta =>
        delta.join(edges, delta("id") === edges("src")).select($"dst".as("id"))
      }
    }
    intercept[Fixpoint.BudgetExceeded] { // wall-clock cap
      Fixpoint.semiNaive(base, Seq("id"), Fixpoint.Budget(timeoutMillis = 1)) { delta =>
        delta.join(edges, delta("id") === edges("src")).select($"dst".as("id"))
      }
    }
  }

  test("fixpoint partitions knob is loop-local: caller session conf untouched mid-loop") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val base = Seq(1L).toDF("id")
    val callerConf = scala.collection.mutable.Buffer.empty[String]
    val callerPlanParts = scala.collection.mutable.Buffer.empty[String]
    val loopPlanParts = scala.collection.mutable.Buffer.empty[String]
    val hashParts = "hashpartitioning\\([^)]*?(\\d+)\\)".r
    def plannedShuffle(df: org.apache.spark.sql.DataFrame): String =
      hashParts.findFirstMatchIn(
        df.queryExecution.executedPlan.toString).map(_.group(1)).getOrElse("?")
    // range-backed (a local Seq would be constant-folded away and show
    // no exchange at all); the test session default is 4, so the loop
    // knob must differ to prove isolation
    val probe = spark.range(100).select(($"id" % 3).as("k"))
    val closure = Fixpoint.semiNaive(base, Seq("id"), shufflePartitions = Some(2)) { delta =>
      // a concurrent query planned on the CALLER's session mid-loop
      // must shuffle with the session default, not the loop's 2
      callerConf += spark.conf.get("spark.sql.shuffle.partitions")
      callerPlanParts += plannedShuffle(probe.groupBy("k").count())
      loopPlanParts += plannedShuffle(delta.groupBy("id").count())
      delta.join(edges, delta("id") === edges("src")).select($"dst".as("id"))
    }
    assert(closure.as[Long].collect().toSet == Set(1L, 2L, 3L, 4L, 5L))
    val default = spark.conf.get("spark.sql.shuffle.partitions")
    assert(callerConf.nonEmpty && callerConf.forall(_ == default))
    assert(callerPlanParts.forall(_ == default), s"planned=$callerPlanParts default=$default")
    // while the loop's own frames really did plan at the knob's size
    assert(loopPlanParts.forall(_ == "2"), s"loop planned=$loopPlanParts")
    // the returned frame is re-rooted: downstream plans use caller conf
    assert(plannedShuffle(closure.groupBy("id").count()) == default)
  }

  test("automatic view routing: an agg goal reads a matching materialized view, " +
      "falls back when absent, and never trusts an unbound live-store view") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory(Paths.get("target"), "autoroute").toString
    val cat = new graft.views.ViewCatalog(spark, g, dir)
    cat.register(graft.views.ViewDef("bal_by_seg", "customer",
      df => df.select(col("c_mktsegment").as("key"), col("id"),
        col("c_acctbal").as("value")),
      reduceAgg = Some(sum(col("value"))),
      keyProp = Some("c_mktsegment"), valueProp = Some("c_acctbal")))

    val q = PatternQuery(
      goals = Seq(AggGoal("customer", "c_mktsegment", "c_acctbal", "seg", "total",
        nVar = Some("n"))),
      select = Seq("seg" -> "seg", "total" -> "total", "n" -> "n"))
    def resultOf(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
      df.collect().map(r =>
        r.getString(0) -> ((math.round(r.getDouble(1) * 100), r.getLong(2)))).toMap
    val want = resultOf(spark.read.parquet(s"$sf/customer.parquet")
      .groupBy(col("c_mktsegment")).agg(sum("c_acctbal"), count(lit(1))))

    // not materialized yet: FALLBACK computes from source, same answer
    val before = PatternCompiler.run(g, q, views = Some(cat))
    assert(!before.queryExecution.executedPlan.toString.contains("views/"),
      "unmaterialized view must not be routed through")
    assert(resultOf(before) == want)

    // materialized over a STATIC source: ROUTED — the plan reads the
    // view's parquet instead of rescanning customers
    cat.regenerate("bal_by_seg")
    val routed = PatternCompiler.run(g, q, views = Some(cat))
    val plan = routed.queryExecution.executedPlan.toString
    // Location strings truncate at ~100 chars, so match the dir prefix
    assert(plan.contains("views/bal"),
      s"agg goal must route through the materialized view:\n$plan")
    assert(!plan.contains("customer.parquet"),
      s"routed plan must not rescan the source table:\n$plan")
    assert(resultOf(routed) == want)

    // a bound key joins against the view rows (the invoke-reduced-view
    // composition, without naming the view)
    val joined = PatternCompiler.run(g, PatternQuery(
      goals = Seq(IsA("c", "customer"), Slot("c", "c_mktsegment", "seg"),
        AggGoal("customer", "c_mktsegment", "c_acctbal", "seg", "total")),
      select = Seq("c" -> "id", "seg" -> "seg", "total" -> "total")),
      views = Some(cat))
    assert(joined.count() == 150)
    assert(joined.queryExecution.executedPlan.toString.contains("views/bal"))

    // LIVE store, catalog NOT bound: a commit after regenerate would
    // make the view lie — routing must refuse and recompute
    val sdir = Files.createTempDirectory(Paths.get("target"), "autoroute-store").toString
    val schema = graft.model.GraphSchema.builder()
      .vertex("acct", "id", Seq("seg", "bal")).build()
    val gs = new graft.model.GraphStore(spark, schema, sdir)
    gs.txn().createVertices("acct",
      Seq((1L, "gold", 10.0), (2L, "iron", 5.0)).toDF("id", "seg", "bal")).commit()
    val scat = new graft.views.ViewCatalog(spark, gs, sdir)
    scat.register(graft.views.ViewDef("by_seg", "acct",
      df => df.select(col("seg").as("key"), col("id"), col("bal").as("value")),
      reduceAgg = Some(sum(col("value"))),
      keyProp = Some("seg"), valueProp = Some("bal")))
    scat.regenerate("by_seg") // materialized, but NOT bound
    gs.txn().createVertices("acct",
      Seq((3L, "gold", 7.0)).toDF("id", "seg", "bal")).commit()
    val sq = PatternQuery(
      goals = Seq(AggGoal("acct", "seg", "bal", "seg", "total", nVar = Some("n"))),
      select = Seq("seg" -> "seg", "total" -> "total", "n" -> "n"))
    val live = PatternCompiler.run(gs.graph(), sq, views = Some(scat))
    assert(!live.queryExecution.executedPlan.toString.contains("views/"),
      "an unbound live-store view must not be routed through")
    assert(resultOf(live) == Map("gold" -> (1700L, 2L), "iron" -> (500L, 1L)))

    // bound + regenerated (catch up on the commit missed while
    // unbound) → maintained in-commit → routing is safe and current
    scat.bindTo(gs)
    scat.regenerate("by_seg")
    gs.txn().createVertices("acct",
      Seq((4L, "iron", 2.5)).toDF("id", "seg", "bal")).commit()
    val liveBound = PatternCompiler.run(gs.graph(), sq, views = Some(scat))
    assert(liveBound.queryExecution.executedPlan.toString.contains("views/"),
      "a bound live-store view must be routed through")
    assert(resultOf(liveBound) == Map("gold" -> (1700L, 2L), "iron" -> (750L, 2L)))
  }

  test("view routing is deterministic, kind-matched, contract-validated, " +
      "and refuses a reopened stale materialization") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory(Paths.get("target"), "route2").toString
    val cat = new graft.views.ViewCatalog(spark, g, dir)
    def segView(name: String) = graft.views.ViewDef(name, "customer",
      df => df.select(col("c_mktsegment").as("key"), col("id"),
        col("c_acctbal").as("value")),
      reduceAgg = Some(sum(col("value"))),
      keyProp = Some("c_mktsegment"), valueProp = Some("c_acctbal"))
    // TIE-BREAK: two identically-declared views route by sorted name,
    // not registration/Map-iteration order
    cat.register(segView("z_dup")); cat.register(segView("a_dup"))
    cat.regenerate("z_dup"); cat.regenerate("a_dup")
    assert(cat.routeFor("customer", "c_mktsegment", "c_acctbal") == Some("a_dup"))

    // NON-SUM routed aggregate: a max view routes agg="max" only
    cat.register(graft.views.ViewDef("max_by_seg", "customer",
      df => df.select(col("c_mktsegment").as("key"), col("id"),
        col("c_acctbal").as("value")),
      reduceAgg = Some(max(col("value"))),
      keyProp = Some("c_mktsegment"), valueProp = Some("c_acctbal"),
      routedAgg = "max"))
    cat.regenerate("max_by_seg")
    assert(cat.routeFor("customer", "c_mktsegment", "c_acctbal", "max")
      == Some("max_by_seg"))
    val q = PatternQuery(
      goals = Seq(AggGoal("customer", "c_mktsegment", "c_acctbal", "seg", "hi",
        agg = "max")),
      select = Seq("seg" -> "seg", "hi" -> "hi"))
    val routed = PatternCompiler.run(g, q, views = Some(cat))
    assert(routed.queryExecution.executedPlan.toString.contains("views/max_by_seg"))
    val want = spark.read.parquet(s"$sf/customer.parquet")
      .groupBy($"c_mktsegment").agg(max($"c_acctbal"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(routed.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap == want)

    // CONTRACT VALIDATION at register time, not silent wrong answers
    intercept[IllegalArgumentException] { // reduce is not the declared kind
      cat.register(segView("bad_reduce").copy(name = "bad_reduce",
        reduceAgg = Some(expr("sum(value * 2)"))))
    }
    intercept[IllegalArgumentException] { // unknown aggregate kind
      cat.register(segView("bad_kind").copy(name = "bad_kind", routedAgg = "median"))
    }
    intercept[IllegalArgumentException] { // keyProp without valueProp
      cat.register(segView("half").copy(name = "half", valueProp = None))
    }
    intercept[IllegalArgumentException] { // metadata without a reduce
      cat.register(segView("noreduce").copy(name = "noreduce", reduceAgg = None))
    }

    // REOPENED-CATALOG STALENESS: a fresh catalog bound over an old
    // materialization of a store that advanced since must NOT route
    // until a regenerate catches it up — `bound` alone proves nothing
    // about commits made while no catalog was listening
    val sdir = Files.createTempDirectory(Paths.get("target"), "route2-store").toString
    val schema = graft.model.GraphSchema.builder()
      .vertex("acct", "id", Seq("seg", "bal")).build()
    val gs = new graft.model.GraphStore(spark, schema, sdir)
    gs.txn().createVertices("acct",
      Seq((1L, "gold", 10.0), (2L, "iron", 5.0)).toDF("id", "seg", "bal")).commit()
    def acctView = graft.views.ViewDef("by_seg", "acct",
      df => df.select(col("seg").as("key"), col("id"), col("bal").as("value")),
      reduceAgg = Some(sum(col("value"))),
      keyProp = Some("seg"), valueProp = Some("bal"))
    val cat1 = new graft.views.ViewCatalog(spark, gs, sdir)
    cat1.register(acctView)
    cat1.regenerate("by_seg")
    // the store advances while NO catalog is maintaining the view
    gs.txn().createVertices("acct",
      Seq((3L, "gold", 7.0)).toDF("id", "seg", "bal")).commit()
    val cat2 = new graft.views.ViewCatalog(spark, gs, sdir)
    cat2.register(acctView)
    cat2.bindTo(gs)
    assert(cat2.routeFor("acct", "seg", "bal").isEmpty,
      "a stale inherited materialization must not be routed through")
    // THE r10 ADVISORY SCENARIO: a commit AFTER bind appends a
    // hook-maintained delta whose epoch exceeds boundAtEpoch — it must
    // NOT extend contiguous coverage over the unmaintained gap
    // (E0, bindEpoch]; the old delta max-fold routed here and silently
    // dropped the gap's rows
    gs.txn().createVertices("acct",
      Seq((4L, "iron", 2.0)).toDF("id", "seg", "bal")).commit()
    assert(cat2.routeFor("acct", "seg", "bal").isEmpty,
      "a post-bind delta must not mask the unmaintained gap before bind")
    // and the agg goal still answers correctly via the fallback
    val sq = PatternQuery(
      goals = Seq(AggGoal("acct", "seg", "bal", "seg", "total")),
      select = Seq("seg" -> "seg", "total" -> "total"))
    val fell = PatternCompiler.run(gs.graph(), sq, views = Some(cat2))
    assert(fell.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      == Map("gold" -> 17.0, "iron" -> 7.0))
    // regenerate stamps the covered epoch → routing resumes
    cat2.regenerate("by_seg")
    assert(cat2.routeFor("acct", "seg", "bal") == Some("by_seg"))
    val back = PatternCompiler.run(gs.graph(), sq, views = Some(cat2))
    assert(back.queryExecution.executedPlan.toString.contains("views/by_seg"))
    assert(back.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      == Map("gold" -> 17.0, "iron" -> 7.0))
  }
}
