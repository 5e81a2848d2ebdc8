package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tpch
import graft.operators.{Fixpoint, Traverse}
import graft.query._

/** Core operator catalog: scans, point lookups, edge joins, the pattern
  * query surface, aggregations, sets, sorts/limits, traversal and
  * recursion — each row of SURVEY.md §2.1-2.7/2.9 as a runnable query
  * with a DuckDB oracle.
  */
object CatalogCore {
  import QueryDef._

  /** knows-edge formula shared by Spark (Tpch.knowsEdges) and oracles. */
  private val knowsSql =
    """SELECT c_custkey AS src, (c_custkey*3+7) % (SELECT count(*) FROM customer) AS dst FROM customer
      |UNION ALL
      |SELECT c_custkey, (c_custkey*5+3) % (SELECT count(*) FROM customer) FROM customer""".stripMargin

  /** Materialized adjacency structures, built once per (session,
    * dataset) and shared across queries — the analog of the reference's
    * persistent type/VE/VEV indexes, which are maintained at write time
    * and queried PRE-BUILT by its benchmarks (tests/perf scan/join
    * numbers never rebuild an index). At scale these are bucketed
    * tables refreshed by the write path; locally, checkpointed frames.
    */
  private val adjacencyIndex =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.DataFrame]
  private def cacheKey(s: SparkSession, tag: String, d: String) =
    s"${s.sparkContext.applicationId}:$tag:$d"

  private def knowsIndex(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
    adjacencyIndex.getOrElseUpdate(cacheKey(s, "knows", d),
      Tpch.graph(s, d).edgeFrame("knows").select(col("src"), col("dst"))
        .localCheckpoint(true))

  /** (from, to, len) pairs within 2^power hops over the knows index. */
  private def knowsCompressed(s: SparkSession, d: String, power: Int): org.apache.spark.sql.DataFrame =
    adjacencyIndex.getOrElseUpdate(cacheKey(s, s"knows-p$power", d), {
      // the doubling joins move delta-sized data: build them in the
      // shared cached child session with small shuffle partitioning
      // (own SQLConf — shared conf mutation would race concurrent
      // queries), then re-root the materialized result back under the
      // caller's conf
      val loop = Fixpoint.loopSession(s, 4)
      import org.apache.spark.sql.graftbridge.Bridge
      Bridge.inSession(s, Traverse.hopCompressedEdges(
        Bridge.inSession(loop,
          knowsIndex(s, d).select(col("src").as("from"), col("dst").as("to"))), power))
    })

  val defs: Seq[QueryDef] = Seq(

    // ---- 2.1 scans / lookups ------------------------------------------
    QueryDef("q01_scan_vertices",
      (s, d) => Tpch.graph(s, d).vertexFrame("customer")
        .select(col("id"), col("c_name").as("name"), col("c_mktsegment").as("segment"))
        .orderBy("id"),
      Some("""SELECT c_custkey AS id, c_name AS name, c_mktsegment AS segment
             |FROM customer ORDER BY id""".stripMargin)),

    QueryDef("q02_lookup_vertex",
      (s, d) => Tpch.graph(s, d).lookupVertex("customer", 42L)
        .select(col("id"), col("c_name").as("name"), col("c_acctbal").as("acctbal")),
      Some("SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal FROM customer WHERE c_custkey = 42")),

    QueryDef("q03_scan_edges",
      (s, d) => Tpch.graph(s, d).edgeFrame("placed")
        .select(col("src"), col("dst"), col("weight")).orderBy("dst"),
      Some("SELECT o_custkey AS src, o_orderkey AS dst, o_totalprice AS weight FROM orders ORDER BY dst")),

    QueryDef("q04_outgoing_edges",
      (s, d) => Tpch.graph(s, d).outgoingEdges("placed", 7L)
        .select(col("dst"), col("weight"), col("o_orderstatus").as("status")).orderBy("dst"),
      Some("""SELECT o_orderkey AS dst, o_totalprice AS weight, o_orderstatus AS status
             |FROM orders WHERE o_custkey = 7 ORDER BY dst""".stripMargin)),

    QueryDef("q05_incoming_edges",
      (s, d) => Tpch.graph(s, d).incomingEdges("contains", 10L)
        .select(col("src"), col("weight"), col("l_linenumber").as("linenumber"))
        .orderBy("src", "linenumber"),
      Some("""SELECT l_orderkey AS src, l_quantity AS weight, l_linenumber AS linenumber
             |FROM lineitem WHERE l_partkey = 10 ORDER BY src, linenumber""".stripMargin)),

    QueryDef("q06_subclass_scan",
      // `person` is abstract; scanning it includes the customer subtype
      // (reference node-class.lisp:108-122 subclass walk)
      (s, d) => Tpch.graph(s, d).vertices("person").groupBy("label")
        .agg(count(lit(1)).as("n")).orderBy("label"),
      Some("SELECT 'customer' AS label, count(*) AS n FROM customer")),

    // ---- 2.2/2.3 pattern queries: filters, slots, joins ----------------
    QueryDef("q10_pattern_flagship",
      // select (?name ?o ?price) (is-a ?a customer)(c_mktsegment ?a 'BUILDING')
      //   (placed ?a ?o ?price)(> ?price 150000)  — the §3.1 hot path
      (s, d) => PatternCompiler.run(Tpch.graph(s, d), PatternQuery(
        goals = Seq(
          IsA("a", "customer"),
          Slot("a", "c_mktsegment", "seg"),
          Filter(col("seg") === "BUILDING"),
          EdgeGoal("placed", "a", "o", weightVar = Some("price")),
          Filter(col("price") > 150000.0),
          Slot("a", "c_name", "name")),
        select = Seq("a" -> "custkey", "o" -> "orderkey", "name" -> "name", "price" -> "totalprice"),
        orderBy = Seq(col("orderkey")))),
      Some("""SELECT c.c_custkey AS custkey, o.o_orderkey AS orderkey, c.c_name AS name,
             |       o.o_totalprice AS totalprice
             |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
             |WHERE c.c_mktsegment = 'BUILDING' AND o.o_totalprice > 150000
             |ORDER BY orderkey""".stripMargin)),

    QueryDef("q11_two_hop_join",
      (s, d) => PatternCompiler.run(Tpch.graph(s, d), PatternQuery(
        goals = Seq(IsA("a", "customer"), EdgeGoal("placed", "a", "o"), EdgeGoal("contains", "o", "p")),
        select = Seq("a" -> "custkey", "p" -> "partkey")))
        .groupBy("custkey").agg(countDistinct("partkey").as("n_parts"))
        .orderBy("custkey"),
      Some("""SELECT c.c_custkey AS custkey, count(DISTINCT l.l_partkey) AS n_parts
             |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
             |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
             |GROUP BY 1 ORDER BY custkey""".stripMargin)),

    QueryDef("q12_anti_join",
      // (not (placed ?a ?o)) — negation as failure
      (s, d) => PatternCompiler.run(Tpch.graph(s, d), PatternQuery(
        goals = Seq(IsA("a", "customer"), Not(Seq(EdgeGoal("placed", "a", "o"))),
          Slot("a", "c_name", "name")),
        select = Seq("a" -> "custkey", "name" -> "name"),
        orderBy = Seq(col("custkey")))),
      Some("""SELECT c_custkey AS custkey, c_name AS name FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |ORDER BY custkey""".stripMargin)),

    QueryDef("q13_semi_join",
      // edge-exists-p: customers with at least one 'F' order
      (s, d) => {
        val g = Tpch.graph(s, d)
        val f = g.edgeFrame("placed").filter(col("o_orderstatus") === "F")
          .select(col("src").as("id")).distinct()
        g.vertexFrame("customer").join(f, Seq("id"), "left_semi")
          .select(col("id").as("custkey"), col("c_acctbal").as("acctbal"))
          .orderBy("custkey")
      },
      Some("""SELECT c_custkey AS custkey, c_acctbal AS acctbal FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
             |ORDER BY custkey""".stripMargin)),

    QueryDef("q14_filter_cmp",
      (s, d) => PatternCompiler.run(Tpch.graph(s, d), PatternQuery(
        goals = Seq(IsA("a", "customer"),
          Slot("a", "c_acctbal", "bal"),
          Filter(col("bal") >= 1000.0 && col("bal") < 5000.0),
          Slot("a", "c_nationkey", "nationkey")),
        select = Seq("a" -> "custkey", "bal" -> "acctbal", "nationkey" -> "nationkey"),
        orderBy = Seq(col("custkey")))),
      Some("""SELECT c_custkey AS custkey, c_acctbal AS acctbal, c_nationkey AS nationkey
             |FROM customer WHERE c_acctbal >= 1000 AND c_acctbal < 5000 ORDER BY custkey""".stripMargin)),

    QueryDef("q15_regex_match",
      (s, d) => PatternCompiler.run(Tpch.graph(s, d), PatternQuery(
        goals = Seq(IsA("a", "customer"), Slot("a", "c_name", "name"), Regex("name", ".*00[0-4]$")),
        select = Seq("a" -> "custkey", "name" -> "name"),
        orderBy = Seq(col("custkey")))),
      Some("""SELECT c_custkey AS custkey, c_name AS name FROM customer
             |WHERE regexp_matches(c_name, '.*00[0-4]$') ORDER BY custkey""".stripMargin)),

    QueryDef("q16_is_computed",
      // (is ?rev (* price (- 1 discount))) — per-row arithmetic is
      // bit-identical across engines, no rounding needed
      (s, d) => Tpch.graph(s, d).edgeFrame("contains")
        .select(col("src").as("orderkey"), col("l_linenumber").as("linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy("orderkey", "linenumber"),
      Some("""SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
             |       l_extendedprice * (1.0 - l_discount) AS revenue
             |FROM lineitem ORDER BY orderkey, linenumber""".stripMargin)),

    QueryDef("q17_param_query",
      (s, d) => PatternCompiler.run(Tpch.graph(s, d), PatternQuery(
        goals = Seq(IsA("a", "customer"), Slot("a", "c_mktsegment", "seg"),
          Param("wanted", "segment"), Filter(col("seg") === col("wanted"))),
        select = Seq("a" -> "custkey"),
        orderBy = Seq(col("custkey")),
        params = Map("segment" -> "MACHINERY"))),
      Some("SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY' ORDER BY custkey")),

    QueryDef("q18_or_union",
      (s, d) => PatternCompiler.run(Tpch.graph(s, d), PatternQuery(
        goals = Seq(IsA("a", "customer"),
          Slot("a", "c_mktsegment", "seg"), Slot("a", "c_acctbal", "bal"),
          Or(Seq(Seq(Filter(col("seg") === "AUTOMOBILE")), Seq(Filter(col("bal") < 0))))),
        select = Seq("a" -> "custkey"),
        orderBy = Seq(col("custkey")))),
      // or/2 is bag union (prologc.lisp:432-447): both-branch matches
      // appear twice, exactly like UNION ALL
      Some("""SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
             |UNION ALL
             |SELECT c_custkey FROM customer WHERE c_acctbal < 0
             |ORDER BY custkey""".stripMargin)),

    QueryDef("q19_not_in_list",
      (s, d) => PatternCompiler.run(Tpch.graph(s, d), PatternQuery(
        goals = Seq(IsA("a", "customer"), Slot("a", "c_mktsegment", "seg"),
          Filter(!col("seg").isin("BUILDING", "MACHINERY"))),
        select = Seq("a" -> "custkey", "seg" -> "segment"),
        orderBy = Seq(col("custkey")))),
      Some("""SELECT c_custkey AS custkey, c_mktsegment AS segment FROM customer
             |WHERE c_mktsegment NOT IN ('BUILDING','MACHINERY') ORDER BY custkey""".stripMargin)),

    // ---- 2.4 aggregations ---------------------------------------------
    QueryDef("q20_agg_pricing",
      // TPC-H Q1 shape over the `contains` edge frame; money in cents
      (s, d) => Tpch.graph(s, d).edgeFrame("contains")
        .groupBy(col("l_returnflag").as("returnflag"), col("l_linestatus").as("linestatus"))
        .agg(
          sum(col("weight").cast("long")).as("sum_qty"),
          centsToDollars(sum(cents(col("l_extendedprice")))).as("sum_base"),
          centsToDollars(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))))
            .as("sum_disc"),
          count(lit(1)).as("n_rows"))
        .orderBy("returnflag", "linestatus"),
      Some("""SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_base,
             |  CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_disc,
             |  count(*) AS n_rows
             |FROM lineitem GROUP BY 1, 2 ORDER BY returnflag, linestatus""".stripMargin)),

    QueryDef("q21_view_group",
      // def-view map+reduce analog: per-key aggregate plus the grand
      // :gagg row (views.lisp master key) via ROLLUP
      (s, d) => Tpch.graph(s, d).edgeFrame("placed")
        .select(col("src").as("k"), cents(col("weight")).as("w"))
        .rollup("k")
        .agg(count(lit(1)).as("n_orders"), centsToDollars(sum(col("w"))).as("total"))
        .select(coalesce(col("k"), lit(-1L)).as("custkey"), col("n_orders"), col("total"))
        .orderBy("custkey"),
      Some("""SELECT COALESCE(o_custkey, -1) AS custkey, count(*) AS n_orders,
             |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS total
             |FROM orders GROUP BY ROLLUP(o_custkey) ORDER BY custkey""".stripMargin)),

    QueryDef("q22_findall",
      // findall/3: collect order keys per customer, sorted. Serialized
      // to a csv string: the driver's pandas compare lexsorts every
      // column, which chokes on list-typed columns (round-1 failure).
      (s, d) => Tpch.graph(s, d).edgeFrame("placed")
        .groupBy(col("src").as("custkey"))
        .agg(array_join(sort_array(collect_list(col("dst"))), ",").as("orderkeys"))
        .orderBy("custkey"),
      Some("""SELECT o_custkey AS custkey,
             |  array_to_string(list_sort(list(o_orderkey)), ',') AS orderkeys
             |FROM orders GROUP BY 1 ORDER BY custkey""".stripMargin)),

    QueryDef("q23_bagof_group",
      // bagof/3 with witness var = group-by nation
      (s, d) => PatternCompiler.run(Tpch.graph(s, d), PatternQuery(
        goals = Seq(IsA("a", "customer"), EdgeGoal("located_in", "a", "n"),
          Slot("n", "n_name", "nation"), Slot("a", "c_acctbal", "bal")),
        select = Seq("nation" -> "nation", "bal" -> "bal")))
        .groupBy("nation")
        .agg(count(lit(1)).as("n_customers"), min("bal").as("min_bal"), max("bal").as("max_bal"))
        .orderBy("nation"),
      Some("""SELECT n.n_name AS nation, count(*) AS n_customers,
             |  min(c.c_acctbal) AS min_bal, max(c.c_acctbal) AS max_bal
             |FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
             |GROUP BY 1 ORDER BY nation""".stripMargin)),

    QueryDef("q24_setof_distinct",
      (s, d) => PatternCompiler.run(Tpch.graph(s, d), PatternQuery(
        goals = Seq(IsA("a", "customer"), Slot("a", "c_mktsegment", "seg")),
        select = Seq("seg" -> "segment"), distinct = true,
        orderBy = Seq(col("segment")))),
      Some("SELECT DISTINCT c_mktsegment AS segment FROM customer ORDER BY segment")),

    QueryDef("q25_select_count",
      (s, d) => PatternCompiler.run(Tpch.graph(s, d), PatternQuery(
        goals = Seq(IsA("a", "customer"), Slot("a", "c_acctbal", "bal"), Filter(col("bal") > 0)),
        select = Seq("a" -> "n_customers"), countOnly = true)),
      Some("SELECT count(*) AS n_customers FROM customer WHERE c_acctbal > 0")),

    // ---- 2.6 sorts / limits / top-k -----------------------------------
    QueryDef("q26_topk",
      (s, d) => Tpch.graph(s, d).edgeFrame("placed")
        .select(col("dst").as("orderkey"), col("weight").as("totalprice"))
        .orderBy(col("totalprice").desc, col("orderkey").asc).limit(10),
      Some("""SELECT o_orderkey AS orderkey, o_totalprice AS totalprice FROM orders
             |ORDER BY totalprice DESC, orderkey LIMIT 10""".stripMargin)),

    QueryDef("q27_range_scan",
      // view range read: :start-key/:end-key + :skip/:count
      (s, d) => PatternCompiler.run(Tpch.graph(s, d), PatternQuery(
        goals = Seq(IsA("o", "order"), Slot("o", "o_totalprice", "price"),
          Filter(col("price").between(100000.0, 200000.0))),
        select = Seq("o" -> "orderkey", "price" -> "price"),
        orderBy = Seq(col("price").asc, col("orderkey").asc),
        limit = Some(50), skip = Some(10))),
      Some("""SELECT o_orderkey AS orderkey, o_totalprice AS price FROM orders
             |WHERE o_totalprice BETWEEN 100000 AND 200000
             |ORDER BY price, orderkey LIMIT 50 OFFSET 10""".stripMargin)),

    QueryDef("q28_select_first",
      (s, d) => PatternCompiler.run(Tpch.graph(s, d), PatternQuery(
        goals = Seq(IsA("a", "customer"), Filter(col("a") === 3L),
          EdgeGoal("placed", "a", "o", edgeProps = Map("o_orderdate" -> "odate"))),
        select = Seq("o" -> "orderkey", "odate" -> "orderdate"),
        orderBy = Seq(col("orderdate").asc, col("orderkey").asc),
        limit = Some(1))),
      Some("""SELECT o_orderkey AS orderkey, o_orderdate AS orderdate FROM orders
             |WHERE o_custkey = 3 ORDER BY orderdate, orderkey LIMIT 1""".stripMargin)),

    // ---- 2.7 set operations -------------------------------------------
    QueryDef("q29_intersect",
      (s, d) => {
        val g = Tpch.graph(s, d)
        val building = g.vertexFrame("customer").filter(col("c_mktsegment") === "BUILDING")
          .select(col("id").as("custkey"))
        val bigSpenders = g.edgeFrame("placed").filter(col("weight") > 200000.0)
          .select(col("src").as("custkey")).distinct()
        building.intersect(bigSpenders).orderBy("custkey")
      },
      Some("""SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
             |INTERSECT
             |SELECT o_custkey FROM orders WHERE o_totalprice > 200000
             |ORDER BY custkey""".stripMargin)),

    QueryDef("q30_except",
      (s, d) => {
        val g = Tpch.graph(s, d)
        val all = g.vertexFrame("customer").select(col("id").as("custkey"))
        val withF = g.edgeFrame("placed").filter(col("o_orderstatus") === "F")
          .select(col("src").as("custkey"))
        all.except(withF).orderBy("custkey")
      },
      Some("""SELECT c_custkey AS custkey FROM customer
             |EXCEPT
             |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             |ORDER BY custkey""".stripMargin)),

    // ---- 2.9 traversal / recursion ------------------------------------
    QueryDef("q31_bfs",
      (s, d) => {
        val start = s.range(1, 2).select(col("id"))
        // traverses run over the pre-built adjacency index + its 2-hop
        // compression, as the reference's traversals run over its
        // persistent VE index
        Traverse.bfs(knowsIndex(s, d), start, maxDepth = 4, hopPower = 1,
            compressedStep = Some(knowsCompressed(s, d, 1)))
          .select(col("id"), col("depth").cast("int").as("depth")).orderBy("id")
      },
      Some(s"""WITH RECURSIVE e AS ($knowsSql),
              |r AS (
              |  SELECT CAST(1 AS BIGINT) AS id, 0 AS depth
              |  UNION ALL
              |  SELECT e.dst, r.depth + 1 FROM r JOIN e ON e.src = r.id WHERE r.depth < 4)
              |SELECT id, CAST(min(depth) AS INTEGER) AS depth FROM r GROUP BY id ORDER BY id""".stripMargin)),

    QueryDef("q32_transitive_closure",
      // recursive <- rule: (reach ?x) <- (reach ?y),(knows ?y ?x);
      // semi-naive fixpoint with budgets (SURVEY §2.9)
      (s, d) => {
        val base = s.range(1, 2).select(col("id"))
        val edges = knowsIndex(s, d)
        // two plan tiers by graph size (the count is a cached metadata
        // read of the checkpointed adjacency index, not a scan):
        // latency tier — the pre-built 8-hop relation advances 8 depths
        // per round and the delta broadcast streams it in place, BUT it
        // carries ~2^(2^p)÷2 ≈ 128 pairs per node, which stops fitting
        // memory as n grows (the ×8 scale check measured a 21.6× time
        // ratio from cache-evict-recompute thrash before this guard);
        // scale tier — plain 2-hop semi-naive with n-scaled partitions
        // is output-bound and survives (×8 ratio ≈ 6.5 while the
        // reachable set itself grows 80×)
        val n = edges.count() / 2
        if (n <= 50000L)
          Fixpoint.reachable(edges, base, hopPower = 3,
            shufflePartitions = Some(4),
            compressedStep = Some(knowsCompressed(s, d, 3))).orderBy("id")
        else
          Fixpoint.reachable(edges, base, hopPower = 1,
            budget = Fixpoint.Budget(maxIterations = 400),
            shufflePartitions = Some(math.min(32, math.max(8, (n / 7500L).toInt))))
            .orderBy("id")
      },
      Some(s"""WITH RECURSIVE e AS ($knowsSql),
              |r AS (
              |  SELECT CAST(1 AS BIGINT) AS id
              |  UNION
              |  SELECT e.dst FROM r JOIN e ON e.src = r.id)
              |SELECT id FROM r ORDER BY id""".stripMargin)),

    QueryDef("q71_pagerank",
      // whole-graph analytics on the GraphX tier (SURVEY §7.5: Pregel
      // for every-vertex iteration, DataFrame joins for query-shaped
      // traversal). Integer micro-unit fixed-point PageRank: all-integer
      // math is bit-identical across engines and partitionings, so the
      // oracle replays the same 6 iterations as unrolled SQL
      (s, d) => graft.operators.GraphAnalytics.pageRankFixedPoint(
        knowsIndex(s, d),
        Tpch.graph(s, d).vertexFrame("customer").select("id"),
        iterations = 6).orderBy("id"),
      Some {
        val iters = 6
        val step = (i: Int) => s"""pr${i + 1} AS (
          |  SELECT pr.id, CAST(150000 + COALESCE(s.contrib, 0) AS BIGINT) AS r
          |  FROM pr$i pr LEFT JOIN (
          |    SELECT e.dst AS id, sum((p.r * 85) // (100 * deg.d)) AS contrib
          |    FROM pr$i p JOIN e ON e.src = p.id JOIN deg ON deg.src = e.src
          |    GROUP BY e.dst) s USING (id))""".stripMargin
        s"""WITH e AS ($knowsSql),
           |deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
           |pr0 AS (SELECT c_custkey AS id, CAST(1000000 AS BIGINT) AS r FROM customer),
           |${(0 until iters).map(step).mkString(",\n")}
           |SELECT id, r AS rank_micro FROM pr$iters ORDER BY id""".stripMargin
      }),

    QueryDef("q72_connected_components",
      // GraphX weakly-connected components; the synthetic knows graph
      // is one component at every SF (verified by union-find), so the
      // oracle is the constant min-id labeling — a real check that the
      // label propagation converged everywhere
      (s, d) => graft.operators.GraphAnalytics.connectedComponents(
        knowsIndex(s, d),
        Tpch.graph(s, d).vertexFrame("customer").select("id")).orderBy("id"),
      Some("""SELECT c_custkey AS id, CAST(0 AS BIGINT) AS component
             |FROM customer ORDER BY id""".stripMargin)),

    QueryDef("q82_triangles",
      // per-node triangle counts via degree-oriented wedge enumeration
      // (O(m^1.5) bound under skew). The functional knows graph is
      // triangle-free at every SF, so this runs over a ring+chord graph
      // built on the customer ids: ring edges c→c+1, short chords
      // c→c+2 at c%3=0, long chords c→c+3 at c%21=0 — per-node counts
      // vary (1 or 2), so a broken wedge/closing join CANNOT hash-match.
      // Counts are orientation-independent: the oracle enumerates by id
      // order and must land on the same triangle sets
      (s, d) => {
        val verts = Tpch.graph(s, d).vertexFrame("customer").select("id")
        val n = verts.count()
        val ring = verts.select(col("id").as("src"), ((col("id") + 1) % n).as("dst"))
        val c3 = verts.filter(col("id") % 3 === 0)
          .select(col("id").as("src"), ((col("id") + 2) % n).as("dst"))
        val c21 = verts.filter(col("id") % 21 === 0)
          .select(col("id").as("src"), ((col("id") + 3) % n).as("dst"))
        graft.operators.GraphAnalytics.triangleCounts(
          ring.unionAll(c3).unionAll(c21), verts).orderBy("id")
      },
      Some(s"""WITH n AS (SELECT count(*) AS n FROM customer),
              |e AS (
              |  SELECT c_custkey AS src, (c_custkey+1) % n.n AS dst FROM customer, n
              |  UNION ALL
              |  SELECT c_custkey, (c_custkey+2) % n.n FROM customer, n WHERE c_custkey % 3 = 0
              |  UNION ALL
              |  SELECT c_custkey, (c_custkey+3) % n.n FROM customer, n WHERE c_custkey % 21 = 0),
              |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
              |  FROM e WHERE src <> dst),
              |tri AS (SELECT xy.a AS x, xy.b AS y, yz.b AS z
              |  FROM und xy JOIN und yz ON xy.b = yz.a
              |  WHERE EXISTS (SELECT 1 FROM und xz WHERE xz.a = xy.a AND xz.b = yz.b)),
              |t AS (SELECT unnest([x, y, z]) AS id FROM tri)
              |SELECT c.c_custkey AS id,
              |  CAST(COALESCE(cnt.c, 0) AS BIGINT) AS triangles
              |FROM customer c LEFT JOIN (SELECT id, count(*) AS c FROM t GROUP BY 1) cnt
              |  ON cnt.id = c.c_custkey
              |ORDER BY id""".stripMargin)),

    QueryDef("q83_cheapest_paths",
      // bounded-hop weighted shortest paths (min-plus Bellman-Ford,
      // delta relaxation) from customer 1 over knows edges carrying a
      // deterministic integer weight — all-integer costs, so the
      // bounded path enumeration in SQL reproduces the exact minima
      (s, d) => Traverse.cheapestPaths(
        knowsIndex(s, d).withColumn("w", (col("src") + col("dst")) % 97 + 1),
        s.range(1, 2).select(col("id")), maxHops = 4)
        .orderBy("id"),
      Some(s"""WITH RECURSIVE e AS (
              |  SELECT src, dst, (src + dst) % 97 + 1 AS w FROM ($knowsSql)),
              |p AS (
              |  SELECT CAST(1 AS BIGINT) AS id, CAST(0 AS BIGINT) AS cost, 0 AS d
              |  UNION ALL
              |  SELECT e.dst, p.cost + e.w, p.d + 1 FROM p JOIN e ON e.src = p.id
              |  WHERE p.d < 4)
              |SELECT id, CAST(min(cost) AS BIGINT) AS cost
              |FROM p GROUP BY id ORDER BY id""".stripMargin)),

    QueryDef("q33_hetero_traverse",
      // customer −placed→ order −contains→ part: the reachable part set
      // at exactly depth 2 from customers 0-4 (traverse with edge-type
      // filters, traverse.lisp:30-81)
      (s, d) => {
        val g = Tpch.graph(s, d)
        val placed = g.edgeFrame("placed").filter(col("src") < 5)
        val contains = g.edgeFrame("contains")
        placed.join(contains, placed("dst") === contains("src"))
          .select(contains("dst").as("partkey")).distinct()
          .orderBy("partkey")
      },
      Some("""SELECT DISTINCT l.l_partkey AS partkey
             |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
             |WHERE o.o_custkey < 5 ORDER BY partkey""".stripMargin)),

    // ---- 2.11 soft delete visibility ----------------------------------
    QueryDef("q34_soft_delete_scan",
      // mark-deleted semantics: deleted rows are invisible to scans but
      // available with include-deleted-p (interface.lisp:15-25)
      (s, d) => {
        val g = Tpch.graph(s, d)
        val orders = g.vertexFrame("order")
          .withColumn("deleted", col("o_orderstatus") === "F")
        import graft.model.{GraphSchema, PropertyGraph}
        val g2 = new PropertyGraph(Tpch.schema, Map("order" -> orders), Map.empty)
        g2.vertexFrame("order").select(col("id").as("orderkey"),
          col("o_orderstatus").as("status")).orderBy("orderkey")
      },
      Some("""SELECT o_orderkey AS orderkey, o_orderstatus AS status FROM orders
             |WHERE o_orderstatus <> 'F' ORDER BY orderkey""".stripMargin)),

    QueryDef("q147_personalized_pagerank",
      // random-walk-with-restart relevance to customer 0 over the
      // knows graph — q71's integer fixed-point discipline with the
      // restart mass concentrated at one source (× n so magnitudes
      // match the uniform variant). The oracle unrolls the same 6
      // all-integer iterations; rank decays with hop distance from
      // the source, which a uniform-base bug cannot reproduce
      (s, d) => graft.operators.GraphAnalytics.personalizedPageRank(
        knowsIndex(s, d),
        Tpch.graph(s, d).vertexFrame("customer").select("id"),
        sourceId = 0L, iterations = 6).orderBy("id"),
      Some {
        val iters = 6
        val step = (i: Int) => s"""pr${i + 1} AS (
          |  SELECT pr.id,
          |    CAST(CASE WHEN pr.id = 0 THEN 150000 * nn.n ELSE 0 END
          |      + COALESCE(s.contrib, 0) AS BIGINT) AS r
          |  FROM pr$i pr CROSS JOIN nn LEFT JOIN (
          |    SELECT e.dst AS id, sum((p.r * 85) // (100 * deg.d)) AS contrib
          |    FROM pr$i p JOIN e ON e.src = p.id JOIN deg ON deg.src = e.src
          |    WHERE p.r > 0
          |    GROUP BY e.dst) s USING (id))""".stripMargin
        s"""WITH e AS ($knowsSql),
           |nn AS (SELECT count(*) AS n FROM customer),
           |deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
           |pr0 AS (SELECT c_custkey AS id,
           |  CAST(CASE WHEN c_custkey = 0 THEN 1000000 * nn.n ELSE 0 END AS BIGINT) AS r
           |  FROM customer CROSS JOIN nn),
           |${(0 until iters).map(step).mkString(",\n")}
           |SELECT id, r AS rank_micro FROM pr$iters ORDER BY id""".stripMargin
      }),

    QueryDef("q148_clustering_coeff",
      // per-node local clustering coefficient over q82's ring+chord
      // graph (the knows graph is triangle-free): 2·T·10⁴ div (d(d−1))
      // per-myriad, degree < 2 → 0. Same degree-oriented O(m^1.5)
      // triangle enumeration; all integer
      (s, d) => {
        val verts = Tpch.graph(s, d).vertexFrame("customer").select("id")
        val n = verts.count()
        val ring = verts.select(col("id").as("src"), ((col("id") + 1) % n).as("dst"))
        val c3 = verts.filter(col("id") % 3 === 0)
          .select(col("id").as("src"), ((col("id") + 2) % n).as("dst"))
        val c21 = verts.filter(col("id") % 21 === 0)
          .select(col("id").as("src"), ((col("id") + 3) % n).as("dst"))
        graft.operators.GraphAnalytics.clusteringCoefficients(
          ring.unionAll(c3).unionAll(c21), verts).orderBy("id")
      },
      Some(s"""WITH n AS (SELECT count(*) AS n FROM customer),
              |e AS (
              |  SELECT c_custkey AS src, (c_custkey+1) % n.n AS dst FROM customer, n
              |  UNION ALL
              |  SELECT c_custkey, (c_custkey+2) % n.n FROM customer, n WHERE c_custkey % 3 = 0
              |  UNION ALL
              |  SELECT c_custkey, (c_custkey+3) % n.n FROM customer, n WHERE c_custkey % 21 = 0),
              |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
              |  FROM e WHERE src <> dst),
              |deg AS (SELECT id, count(*) AS degree FROM (
              |    SELECT a AS id FROM und UNION ALL SELECT b FROM und) GROUP BY 1),
              |tri AS (SELECT xy.a AS x, xy.b AS y, yz.b AS z
              |  FROM und xy JOIN und yz ON xy.b = yz.a
              |  WHERE EXISTS (SELECT 1 FROM und xz WHERE xz.a = xy.a AND xz.b = yz.b)),
              |t AS (SELECT unnest([x, y, z]) AS id FROM tri),
              |tc AS (SELECT id, count(*) AS c FROM t GROUP BY 1)
              |SELECT cu.c_custkey AS id,
              |  CAST(COALESCE(tc.c, 0) AS BIGINT) AS triangles,
              |  CAST(COALESCE(deg.degree, 0) AS BIGINT) AS degree,
              |  CAST(CASE WHEN COALESCE(deg.degree, 0) >= 2
              |    THEN COALESCE(tc.c, 0) * 2 * 10000 // (deg.degree * (deg.degree - 1))
              |    ELSE 0 END AS BIGINT) AS coeff_pm
              |FROM customer cu
              |  LEFT JOIN tc ON tc.id = cu.c_custkey
              |  LEFT JOIN deg ON deg.id = cu.c_custkey
              |ORDER BY id""".stripMargin)),

    QueryDef("q164_link_prediction",
      // resource-allocation link prediction over q148's ring+chord
      // graph: top candidate edges among non-adjacent pairs sharing a
      // neighbor, scored Σ 10⁶ div deg(z) (the integer-exact RA index;
      // Adamic–Adar's 1/ln(d) would ride libm ulps). Intermediates
      // above deg 4 generate no pairs (the q149 hub-skip discipline:
      // pair volume ≤ maxDegree·m), the existing-edge exclusion is a
      // left_anti, the top-k a TakeOrdered under a total order
      (s, d) => {
        val verts = Tpch.graph(s, d).vertexFrame("customer").select("id")
        val n = verts.count()
        val ring = verts.select(col("id").as("src"), ((col("id") + 1) % n).as("dst"))
        val c3 = verts.filter(col("id") % 3 === 0)
          .select(col("id").as("src"), ((col("id") + 2) % n).as("dst"))
        val c21 = verts.filter(col("id") % 21 === 0)
          .select(col("id").as("src"), ((col("id") + 3) % n).as("dst"))
        graft.operators.GraphAnalytics.linkPrediction(
          ring.unionAll(c3).unionAll(c21), maxDegree = 4L, k = 100)
      },
      Some("""WITH n AS (SELECT count(*) AS n FROM customer),
             |e AS (
             |  SELECT c_custkey AS src, (c_custkey+1) % n.n AS dst FROM customer, n
             |  UNION ALL
             |  SELECT c_custkey, (c_custkey+2) % n.n FROM customer, n WHERE c_custkey % 3 = 0
             |  UNION ALL
             |  SELECT c_custkey, (c_custkey+3) % n.n FROM customer, n WHERE c_custkey % 21 = 0),
             |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
             |  FROM e WHERE src <> dst),
             |adj AS (SELECT a AS z, b AS nb FROM und UNION ALL SELECT b, a FROM und),
             |deg AS (SELECT z, count(*) AS deg FROM adj GROUP BY 1),
             |small AS (SELECT adj.z, adj.nb, deg.deg
             |  FROM adj JOIN deg USING (z) WHERE deg.deg <= 4),
             |pairs AS (SELECT s1.z, s1.deg, s1.nb AS a, s2.nb AS b
             |  FROM small s1 JOIN small s2 ON s1.z = s2.z WHERE s1.nb < s2.nb),
             |sc AS (SELECT a, b, count(*) AS common,
             |    sum(1000000 // deg) AS ra_micro
             |  FROM pairs GROUP BY 1, 2),
             |cand AS (SELECT sc.* FROM sc
             |  LEFT JOIN und ON und.a = sc.a AND und.b = sc.b
             |  WHERE und.a IS NULL)
             |SELECT a, b, CAST(common AS BIGINT) AS common,
             |  CAST(ra_micro AS BIGINT) AS ra_micro
             |FROM cand ORDER BY ra_micro DESC, common DESC, a, b LIMIT 100""".stripMargin)),

    QueryDef("q170_copurchase_graph",
      // co-occurrence graph projection from relational facts: parts
      // linked by the number of orders containing both. Membership
      // dedupes first; orders with > 6 distinct parts are excluded
      // from pair generation (the hub-skip cap that bounds pair
      // volume at maxItems·|membership|); top edges under the total
      // order (weight desc, a, b) via TakeOrdered
      (s, d) => graft.operators.GraphAnalytics.projectCoOccurrence(
        Tpch.table(s, d, "lineitem").select(
          col("l_orderkey").as("g"), col("l_partkey").as("item")),
        "g", "item", maxItems = 6, minWeight = 1L, topK = 100),
      Some("""WITH m AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem),
             |sz AS (SELECT g, count(*) AS gsz FROM m GROUP BY 1),
             |bd AS (SELECT m.g, m.item FROM m JOIN sz USING (g) WHERE sz.gsz <= 6),
             |p AS (SELECT x.item AS a, y.item AS b
             |  FROM bd x JOIN bd y ON x.g = y.g AND x.item < y.item)
             |SELECT a, b, count(*) AS weight FROM p GROUP BY 1, 2
             |HAVING count(*) >= 1
             |ORDER BY weight DESC, a, b LIMIT 100""".stripMargin)),

    QueryDef("q176_harmonic_centrality",
      // harmonic centrality from 4 sampled roots over the knows graph
      // (the Boldi–Vigna sampled-estimator shape): each reached vertex
      // accrues 10⁶ div d per source within 4 hops — one depth-bounded
      // BFS per root, integer-exact contributions. The oracle unrolls
      // each root's BFS as a recursive CTE and re-sums
      (s, d) => graft.operators.GraphAnalytics.harmonicCentrality(
          knowsIndex(s, d), sources = Seq(0L, 1L, 2L, 3L), maxDepth = 4)
        .orderBy("id"),
      Some {
        val roots = Seq(0, 1, 2, 3)
        val ctes = roots.map { r =>
          s"""r$r AS (
             |  SELECT CAST($r AS BIGINT) AS id, 0 AS d
             |  UNION
             |  SELECT e.dst, rr.d + 1 FROM r$r rr JOIN e ON e.src = rr.id
             |  WHERE rr.d < 4)""".stripMargin
        }.mkString(",\n")
        val unions = roots.map(r =>
          s"SELECT id, min(d) AS d FROM r$r WHERE id IS NOT NULL GROUP BY 1")
          .mkString("\nUNION ALL\n")
        s"""WITH RECURSIVE e AS ($knowsSql),
           |$ctes,
           |m AS ($unions)
           |SELECT id, count(*) AS n_sources,
           |  CAST(sum(1000000 // d) AS BIGINT) AS harmonic_micro
           |FROM m WHERE d > 0 GROUP BY 1 ORDER BY id""".stripMargin
      }),

    QueryDef("q175_degree_summary",
      // degree histogram + Newman assortativity over q148's
      // ring+chord graph: exact int64 correlation sums, coefficient =
      // num / (√denx·√deny) — correctly-rounded IEEE ops on identical
      // integers, rounded 6. The histogram is degree-vocabulary-sized
      // and the 1-row stats broadcast alongside
      (s, d) => {
        val verts = Tpch.graph(s, d).vertexFrame("customer").select("id")
        val n = verts.count()
        val ring = verts.select(col("id").as("src"), ((col("id") + 1) % n).as("dst"))
        val c3 = verts.filter(col("id") % 3 === 0)
          .select(col("id").as("src"), ((col("id") + 2) % n).as("dst"))
        val c21 = verts.filter(col("id") % 21 === 0)
          .select(col("id").as("src"), ((col("id") + 3) % n).as("dst"))
        graft.operators.GraphAnalytics.degreeSummary(
          ring.unionAll(c3).unionAll(c21)).orderBy("degree")
      },
      Some("""WITH n AS (SELECT count(*) AS n FROM customer),
             |e AS (
             |  SELECT c_custkey AS src, (c_custkey+1) % n.n AS dst FROM customer, n
             |  UNION ALL
             |  SELECT c_custkey, (c_custkey+2) % n.n FROM customer, n WHERE c_custkey % 3 = 0
             |  UNION ALL
             |  SELECT c_custkey, (c_custkey+3) % n.n FROM customer, n WHERE c_custkey % 21 = 0),
             |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
             |  FROM e WHERE src <> dst),
             |deg AS (SELECT id, count(*) AS degree FROM (
             |    SELECT a AS id FROM und UNION ALL SELECT b FROM und) GROUP BY 1),
             |hist AS (SELECT degree, count(*) AS n_nodes FROM deg GROUP BY 1),
             |wd AS (SELECT und.a, und.b, dx.degree AS da, dy.degree AS db
             |  FROM und JOIN deg dx ON dx.id = und.a JOIN deg dy ON dy.id = und.b),
             |p AS (SELECT da AS x, db AS y FROM wd UNION ALL SELECT db, da FROM wd),
             |st AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
             |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x*y) AS BIGINT) AS sxy,
             |    CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy
             |  FROM p),
             |co AS (SELECT n // 2 AS n_edges,
             |    n*sxy - sx*sy AS num, n*sxx - sx*sx AS dx, n*syy - sy*sy AS dy
             |  FROM st)
             |SELECT hist.degree, hist.n_nodes, co.n_edges,
             |  CASE WHEN co.dx = 0 OR co.dy = 0 THEN 0.0
             |    ELSE round(CAST(co.num AS DOUBLE)
             |      / (sqrt(CAST(co.dx AS DOUBLE)) * sqrt(CAST(co.dy AS DOUBLE))), 6)
             |  END AS assortativity
             |FROM hist, co ORDER BY degree""".stripMargin)),

    QueryDef("q182_regional_revenue",
      // TPC-H Q5-shaped 6-table join: discounted revenue per
      // (region, nation) where the lineitem's supplier sits in the
      // customer's own nation — region/nation/supplier broadcast as
      // constant-size dims, customer⋈orders⋈lineitem shuffle on their
      // keys, partial→final cents aggregation. The deep-join breadth
      // probe for Catalyst's join planning
      (s, d) => {
        val g = Tpch.graph(s, d)
        val region = g.vertexFrame("region").select(col("id").as("rk"), col("r_name"))
        val nation = g.vertexFrame("nation")
          .select(col("id").as("nk"), col("n_regionkey"), col("n_name"))
        val cust = g.vertexFrame("customer").select(col("id").as("ck"), col("c_nationkey"))
        val ords = g.vertexFrame("order").select(col("id").as("ok"), col("o_custkey"))
        val li = g.edgeFrame("contains")
          .select(col("src").as("lo"), col("l_suppkey"),
            col("l_extendedprice"), col("l_discount"))
        val supp = g.vertexFrame("supplier").select(col("id").as("sk"), col("s_nationkey"))
        li.join(ords, col("lo") === col("ok"))
          .join(cust, col("o_custkey") === col("ck"))
          .join(broadcast(supp), col("l_suppkey") === col("sk") &&
            col("s_nationkey") === col("c_nationkey"))
          .join(broadcast(nation), col("c_nationkey") === col("nk"))
          .join(broadcast(region), col("n_regionkey") === col("rk"))
          .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
          .agg(count(lit(1)).as("n_items"),
            centsToDollars(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))))
              .as("revenue"))
          .orderBy("region", "nation")
      },
      Some("""SELECT r.r_name AS region, n.n_name AS nation,
             |  count(*) AS n_items,
             |  CAST(sum(CAST(round(l.l_extendedprice*(1.0-l.l_discount)*100) AS BIGINT))
             |    AS DOUBLE)/100.0 AS revenue
             |FROM lineitem l
             |  JOIN orders o ON l.l_orderkey = o.o_orderkey
             |  JOIN customer c ON o.o_custkey = c.c_custkey
             |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
             |    AND s.s_nationkey = c.c_nationkey
             |  JOIN nation n ON c.c_nationkey = n.n_nationkey
             |  JOIN region r ON n.n_regionkey = r.r_regionkey
             |GROUP BY 1, 2 ORDER BY region, nation""".stripMargin)),

    QueryDef("q183_edge_integrity",
      // referential-integrity audit: `placed` edges against the
      // visible customer and order sets, with orders soft-deleted by
      // the q34 fixture (status F) — dangling-dst counts are the
      // store-health signal a soft-deleting graph accumulates
      // silently; src side proves 0 (every order has a live customer)
      (s, d) => {
        val g = Tpch.graph(s, d)
        val orders = g.vertexFrame("order")
          .withColumn("deleted", col("o_orderstatus") === "F")
        import graft.model.PropertyGraph
        val g2 = new PropertyGraph(Tpch.schema, Map("order" -> orders), Map.empty)
        graft.operators.GraphAnalytics.edgeIntegrity(
          g.edgeFrame("placed"),
          g.vertexFrame("customer").select("id"),
          g2.vertexFrame("order").select("id"))
      },
      Some("""SELECT (SELECT count(*) FROM orders) AS n_edges,
             |  CAST(0 AS BIGINT) AS n_src_dangling,
             |  (SELECT count(*) FROM orders WHERE o_orderstatus = 'F') AS n_dst_dangling""".stripMargin)),

    QueryDef("q154_label_propagation",
      // deterministic synchronous label-propagation communities over
      // q148's ring+chord graph: labels start as ids, 3 rounds of
      // most-frequent-neighbor-label with smallest-label ties,
      // isolated vertices keep their own (classic LPA's random
      // tie-break and async order are engine-local noise — the
      // deterministic variant is pinned and the deviation documented
      // at GraphAnalytics.labelPropagation). The oracle unrolls the
      // same 3 rounds; all-integer, bit-exact
      (s, d) => {
        val verts = Tpch.graph(s, d).vertexFrame("customer").select("id")
        val n = verts.count()
        val ring = verts.select(col("id").as("src"), ((col("id") + 1) % n).as("dst"))
        val c3 = verts.filter(col("id") % 3 === 0)
          .select(col("id").as("src"), ((col("id") + 2) % n).as("dst"))
        val c21 = verts.filter(col("id") % 21 === 0)
          .select(col("id").as("src"), ((col("id") + 3) % n).as("dst"))
        graft.operators.GraphAnalytics.labelPropagation(
          ring.unionAll(c3).unionAll(c21), verts, iterations = 3).orderBy("id")
      },
      Some {
        val round = (i: Int) => s"""c$i AS (SELECT adj.id AS id, p.label AS label, count(*) AS c
          |  FROM adj JOIN l${i - 1} p ON p.id = adj.nbr GROUP BY 1, 2),
          |w$i AS (SELECT id, label FROM (SELECT id, label,
          |    row_number() OVER (PARTITION BY id ORDER BY c DESC, label) AS rk
          |    FROM c$i) WHERE rk = 1),
          |l$i AS (SELECT l${i - 1}.id, coalesce(w$i.label, l${i - 1}.label) AS label
          |  FROM l${i - 1} LEFT JOIN w$i USING (id))""".stripMargin
        s"""WITH n AS (SELECT count(*) AS n FROM customer),
           |e0 AS (
           |  SELECT c_custkey AS src, (c_custkey+1) % n.n AS dst FROM customer, n
           |  UNION ALL
           |  SELECT c_custkey, (c_custkey+2) % n.n FROM customer, n WHERE c_custkey % 3 = 0
           |  UNION ALL
           |  SELECT c_custkey, (c_custkey+3) % n.n FROM customer, n WHERE c_custkey % 21 = 0),
           |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           |  FROM e0 WHERE src <> dst),
           |adj AS (SELECT a AS id, b AS nbr FROM und UNION ALL SELECT b, a FROM und),
           |l0 AS (SELECT c_custkey AS id, CAST(c_custkey AS BIGINT) AS label FROM customer),
           |${(1 to 3).map(round).mkString(",\n")}
           |SELECT id, label FROM l3 ORDER BY id""".stripMargin
      }),

    QueryDef("q158_scc",
      // strongly connected components over a directed fixture the knows
      // graph can't provide (its functional edges make one giant SCC):
      // per 10-id block, a chain c→c+1, plus a closing back edge
      // 9→0 only when (block % 3) ≠ 0 — intact blocks are directed
      // 10-cycles (one SCC labeled by the block's min id), broken
      // blocks are chains (singleton SCCs), the exact cycle-vs-chain
      // distinction weak CC (q72) cannot make. Blocks are disjoint, so
      // the SCC condensation is depth-1 and 3 GraphX rounds suffice at
      // ANY scale (the trim fixpoint handles the 10-deep chains
      // internally). The oracle is the analytic labeling — a real
      // convergence check, the q72 discipline
      (s, d) => {
        val verts = Tpch.graph(s, d).vertexFrame("customer").select("id")
        val n = verts.count()
        val within = verts.filter(col("id") % 10 =!= 9 && col("id") + 1 < n)
          .select(col("id").as("src"), (col("id") + 1).as("dst"))
        val back = verts.filter(col("id") % 10 === 9 &&
            expr("(id div 10) % 3") =!= 0)
          .select(col("id").as("src"), (col("id") - 9).as("dst"))
        graft.operators.GraphAnalytics.stronglyConnectedComponents(
          within.unionAll(back), verts, numIter = 3).orderBy("id")
      },
      Some("""SELECT c_custkey AS id,
             |  CAST(CASE WHEN (c_custkey // 10) % 3 <> 0
             |    THEN (c_custkey // 10) * 10 ELSE c_custkey END AS BIGINT) AS component
             |FROM customer ORDER BY id""".stripMargin)),

    QueryDef("q159_kcore",
      // 3-core via synchronous batch peeling over a fixture whose peel
      // depth is bounded BY CONSTRUCTION at any scale: per 100-id
      // block, a 5-clique (degree 4, survives), a 4-link pendant chain
      // hung off the clique (peels in 4 rounds), and a cross-block
      // edge base+1 — base+101 (raises interior survivors to degree
      // 6). Output is each survivor's degree INSIDE the core; the
      // oracle replays 6 unrolled peel rounds over the same
      // construction — it must converge to the identical edge set
      (s, d) => {
        val verts = Tpch.graph(s, d).vertexFrame("customer").select("id")
        val n = verts.count()
        val bases = verts.filter(col("id") % 100 === 0).select(col("id").as("base"))
        val offs = Seq(0, 1, 2, 3, 4)
        val pairs = (for { i <- offs; j <- offs if i < j } yield (i, j)) ++
          Seq((0, 5), (5, 6), (6, 7), (7, 8))
        val pairLits = array(pairs.map { case (i, j) =>
          struct(lit(i).as("i"), lit(j).as("j")) }: _*)
        val block = bases.select(col("base"), explode(pairLits).as("p"))
          .select((col("base") + col("p.i")).as("src"),
            (col("base") + col("p.j")).as("dst"))
        val cross = bases.filter(col("base") + 101 < n)
          .select((col("base") + 1).as("src"), (col("base") + 101).as("dst"))
        graft.operators.GraphAnalytics.kCore(block.unionAll(cross), k = 3)
          .orderBy("id")
      },
      Some {
        val peel = (i: Int) => s"""d$i AS MATERIALIZED (SELECT id, count(*) AS deg FROM
          |  (SELECT a AS id FROM e${i - 1} UNION ALL SELECT b FROM e${i - 1}) GROUP BY 1),
          |p$i AS MATERIALIZED (SELECT id FROM d$i WHERE deg < 3),
          |e$i AS MATERIALIZED (SELECT a, b FROM e${i - 1}
          |  WHERE a NOT IN (SELECT id FROM p$i) AND b NOT IN (SELECT id FROM p$i))""".stripMargin
        s"""WITH blk AS (SELECT DISTINCT (c_custkey // 100) * 100 AS base FROM customer),
           |off AS (SELECT unnest([0, 1, 2, 3, 4]) AS o),
           |raw AS (
           |  SELECT base + o1.o AS u, base + o2.o AS v FROM blk, off o1, off o2
           |    WHERE o1.o < o2.o
           |  UNION ALL
           |  SELECT base + x, base + y FROM blk, (VALUES (0, 5), (5, 6), (6, 7), (7, 8)) t(x, y)
           |  UNION ALL
           |  SELECT base + 1, base + 101 FROM blk
           |    WHERE base + 101 < (SELECT count(*) FROM customer)),
           |e0 AS MATERIALIZED (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
           |  FROM raw WHERE u <> v),
           |${(1 to 6).map(peel).mkString(",\n")}
           |SELECT id, CAST(count(*) AS BIGINT) AS core_degree FROM
           |  (SELECT a AS id FROM e6 UNION ALL SELECT b FROM e6)
           |GROUP BY 1 ORDER BY id""".stripMargin
      }))
}
