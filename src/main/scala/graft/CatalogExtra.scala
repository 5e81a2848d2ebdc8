package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.model.Tpch
import graft.operators.AsOf
import graft.spatial.SpatialOps

/** Control constructs (SURVEY.md §2.10), analytic window functions and
  * as-of joins (capabilities the reference lacked — §2.5 — exposed
  * because the rebuild gets them for free), sketches, and the
  * point-in-polygon refine.
  */
object CatalogExtra {
  import QueryDef._

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q35_forall",
      // forall/2 (prolog-functors.lisp:305-347): customers ALL of whose
      // orders are status 'O' = anti-join of the violating set;
      // vacuously true for customers with no orders
      (s, d) => {
        val g = Tpch.graph(s, d)
        val violating = g.edgeFrame("placed").filter(col("o_orderstatus") =!= "O")
          .select(col("src").as("id")).distinct()
        g.vertexFrame("customer").join(violating, Seq("id"), "left_anti")
          .select(col("id").as("custkey")).orderBy("custkey")
      },
      Some("""SELECT c_custkey AS custkey FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus <> 'O')
             |ORDER BY custkey""".stripMargin)),

    QueryDef("q36_if_else",
      // if/3 soft cut (prologc.lisp:520-582): per customer, order count
      // when any orders exist, else the else-branch constant
      (s, d) => {
        val g = Tpch.graph(s, d)
        val counts = g.edgeFrame("placed").groupBy(col("src").as("id"))
          .agg(count(lit(1)).as("n"))
        g.vertexFrame("customer").join(counts, Seq("id"), "left")
          .select(col("id").as("custkey"),
            coalesce(col("n"), lit(-1L)).as("n_orders"))
          .orderBy("custkey")
      },
      Some("""SELECT c_custkey AS custkey, COALESCE(n, -1) AS n_orders
             |FROM customer c LEFT JOIN (
             |  SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1) o
             |  ON o.o_custkey = c.c_custkey
             |ORDER BY custkey""".stripMargin)),

    QueryDef("q37_approx_distinct",
      // HLL sketch (absent in reference, SURVEY §2.4). Sketch estimates
      // differ engine to engine by construction, so the oracle checks
      // the exact count (computed both sides) plus the sketch's error
      // CONTRACT: |approx − exact| within 3× the configured rsd (0.05)
      (s, d) => Tpch.graph(s, d).edgeFrame("contains")
        .agg(countDistinct(col("dst")).as("exact_parts"),
          count(lit(1)).as("n_rows"),
          approx_count_distinct(col("dst")).as("__approx"))
        .select(col("exact_parts"), col("n_rows"),
          (abs(col("__approx") - col("exact_parts"))
            <= col("exact_parts") * 0.15).as("approx_ok")),
      Some("""SELECT count(DISTINCT l_partkey) AS exact_parts, count(*) AS n_rows,
             |  true AS approx_ok FROM lineitem""".stripMargin)),

    QueryDef("q38_rule_query",
      // <- rule with two clauses (disjunction), invoked from a pattern
      (s, d) => {
        val g = Tpch.graph(s, d)
        val rs = new graft.query.RuleSet(g)
        rs.define("high_value", Seq("c")) { g =>
          g.edgeFrame("placed").filter(col("weight") > 400000.0)
            .select(col("src").as("c"))
        }
        rs.define("high_value", Seq("c")) { g =>
          g.vertexFrame("customer").filter(col("c_acctbal") > 9000.0)
            .select(col("id").as("c"))
        }
        graft.query.PatternCompiler.run(g, graft.query.PatternQuery(
          goals = Seq(graft.query.IsA("c", "customer"),
            graft.query.RuleGoal("high_value", Seq("c")),
            graft.query.Slot("c", "c_name", "n")),
          select = Seq("c" -> "custkey", "n" -> "name"),
          orderBy = Seq(col("custkey"))), rules = Some(rs))
      },
      Some("""SELECT c_custkey AS custkey, c_name AS name FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
             |   OR c.c_acctbal > 9000
             |ORDER BY custkey""".stripMargin)),

    QueryDef("q39_recursive_rule",
      // recursive <- rule evaluated by semi-naive fixpoint: 2-step
      // closure over knows from two seeds
      (s, d) => {
        val g = Tpch.graph(s, d)
        val rs = new graft.query.RuleSet(g)
        val knows = g.edgeFrame("knows").select(col("src"), col("dst")).localCheckpoint(true)
        rs.defineRecursive("reach2", Seq("id"),
            graft.operators.Fixpoint.Budget(maxIterations = 1000)) { _ =>
          s.range(1, 3).toDF("id")
        } { (_, delta) =>
          delta.join(knows, delta("id") === knows("src")).select(col("dst").as("id"))
        }
        rs.relation("reach2").orderBy("id")
      },
      Some("""WITH RECURSIVE e AS (
             |  SELECT c_custkey AS src, (c_custkey*3+7) % (SELECT count(*) FROM customer) AS dst FROM customer
             |  UNION ALL
             |  SELECT c_custkey, (c_custkey*5+3) % (SELECT count(*) FROM customer) FROM customer),
             |r AS (
             |  SELECT CAST(c_custkey AS BIGINT) AS id FROM customer WHERE c_custkey IN (1, 2)
             |  UNION
             |  SELECT e.dst FROM r JOIN e ON e.src = r.id)
             |SELECT id FROM r ORDER BY id""".stripMargin)),

    QueryDef("q44_point_in_polygon",
      // ray-casting refine (geometry-ops.lisp:32-66). Polygon chosen
      // with no data point on an edge; the oracle states the equivalent
      // half-plane form of the same diamond
      (s, d) => {
        val diamond = Seq(Seq((30.5, 0.0), (0.0, 30.5), (-30.5, 0.0), (0.0, -30.5)))
        val cust = Tpch.graph(s, d).vertexFrame("customer")
          .withColumn("lon", ((col("id") * 7 % 360) - 180).cast("double") + 0.5)
          .withColumn("lat", ((col("id") * 13 % 180) - 90).cast("double") + 0.5)
        cust.filter(graft.functions.PointInPolygonExpression
            .point_in_polygon(col("lon"), col("lat"), diamond))
          .select(col("id"), col("lon"), col("lat")).orderBy("id")
      },
      Some("""SELECT id, lon, lat FROM (
             |  SELECT c_custkey AS id,
             |    CAST((c_custkey*7 % 360) - 180 AS DOUBLE) + 0.5 AS lon,
             |    CAST((c_custkey*13 % 180) - 90 AS DOUBLE) + 0.5 AS lat
             |  FROM customer)
             |WHERE abs(lon) + abs(lat) <= 30 ORDER BY id""".stripMargin)),

    QueryDef("q63_window_rank",
      // ranking/lag analytics (reference has none — SURVEY §2.5)
      (s, d) => {
        val w = Window.partitionBy("custkey")
          .orderBy(col("totalprice").desc, col("orderkey").asc)
        Tpch.graph(s, d).edgeFrame("placed")
          .select(col("src").as("custkey"), col("dst").as("orderkey"),
            col("weight").as("totalprice"))
          .withColumn("rn", row_number().over(w))
          .withColumn("rnk", rank().over(w))
          .withColumn("prev_price", lag("totalprice", 1).over(w))
          .filter(col("rn") <= 3)
          .select(col("custkey"), col("orderkey"), col("rn"), col("rnk"),
            coalesce(col("prev_price"), lit(-1.0)).as("prev_price"))
          .orderBy("custkey", "rn")
      },
      Some("""SELECT custkey, orderkey, rn, rnk, COALESCE(prev_price, -1.0) AS prev_price
             |FROM (
             |  SELECT o_custkey AS custkey, o_orderkey AS orderkey,
             |    row_number() OVER w AS rn, rank() OVER w AS rnk,
             |    lag(o_totalprice, 1) OVER w AS prev_price
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey))
             |WHERE rn <= 3 ORDER BY custkey, rn""".stripMargin)),

    QueryDef("q65_json_props",
      // semi-structured property access: the reference's heterogeneous
      // property alists arrive in modern pipelines as JSON columns
      (s, d) => events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k"),
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, count(*) AS n
             |FROM events GROUP BY 1 ORDER BY k""".stripMargin)),

    QueryDef("q66_date_parts",
      // temporal bucketing over order dates (timestamp value-type
      // coverage, SURVEY §1.3 tag 101)
      (s, d) => Tpch.graph(s, d).edgeFrame("placed")
        .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n_orders"),
          centsToDollars(sum(cents(col("weight")))).as("total"))
        .orderBy("y", "m"),
      Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS y, CAST(month(o_orderdate) AS INTEGER) AS m,
             |  count(*) AS n_orders,
             |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS total
             |FROM orders GROUP BY 1, 2 ORDER BY y, m""".stripMargin)),

    QueryDef("q64_asof_join",
      // as-of join: each purchase enriched with the user's most recent
      // click at-or-before it (union + running-last — no range join)
      (s, d) => {
        val ev = events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
        AsOf.join(purchases, clicks, keys = Seq("user_id"), tsCol = "ts",
            payload = Seq("click_id"))
          .select(col("event_id"), col("user_id"), col("asof_click_id").as("click_id"))
          .orderBy("event_id")
      },
      Some("""SELECT p.event_id, p.user_id, c.event_id AS click_id
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id AND p.ts >= c.ts
             |ORDER BY p.event_id""".stripMargin)),

    QueryDef("q69_salted_join",
      // skew-mitigated join (SURVEY §2.3 skewed-joins row): the salted
      // plan — hot keys spread over salt buckets, the small side
      // broadcast-replicated per bucket — must produce EXACTLY the
      // plain-join result; the oracle is that plain join
      (s, d) => {
        val g = Tpch.graph(s, d)
        val orders = g.edgeFrame("placed")
          .select(col("src").as("custkey"), col("dst").as("orderkey"))
        val cust = g.vertexFrame("customer")
          .select(col("id").as("custkey"), col("c_nationkey").as("nationkey"))
        graft.operators.Skew.saltedJoin(orders, cust, "custkey", salt = 8)
          .groupBy("nationkey").agg(count(lit(1)).as("n_orders"))
          .orderBy("nationkey")
      },
      Some("""SELECT c.c_nationkey AS nationkey, count(*) AS n_orders
             |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
             |GROUP BY 1 ORDER BY nationkey""".stripMargin)),

    QueryDef("q74_sql_surface",
      // the graph exposed to plain Spark SQL (temp views per label):
      // the same pattern as q10's compiled plan, written as SQL by a
      // user who never touches the DSL — API-surface parity check
      (s, d) => {
        Tpch.graph(s, d).createTempViews(s)
        s.sql("""SELECT c.id AS custkey, e.dst AS orderkey, c.c_name AS name,
                 |       e.weight AS totalprice
                 |FROM g_v_customer c JOIN g_e_placed e ON e.src = c.id
                 |WHERE c.c_mktsegment = 'BUILDING' AND e.weight > 150000
                 |ORDER BY orderkey""".stripMargin)
      },
      Some("""SELECT c.c_custkey AS custkey, o.o_orderkey AS orderkey, c.c_name AS name,
             |       o.o_totalprice AS totalprice
             |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
             |WHERE c.c_mktsegment = 'BUILDING' AND o.o_totalprice > 150000
             |ORDER BY orderkey""".stripMargin)),

    QueryDef("q70_cube",
      // CUBE grouping (SURVEY §2.4: grouping sets absent in the
      // reference, free here) — order counts by (status, priority) with
      // all subtotal planes
      (s, d) => Tpch.graph(s, d).edgeFrame("placed")
        .cube(col("o_orderstatus").as("status"), col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("status"), lit("ALL")).as("status"),
          coalesce(col("priority"), lit("ALL")).as("priority"), col("n"))
        .orderBy("status", "priority"),
      Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
             |  COALESCE(o_orderpriority, 'ALL') AS priority, count(*) AS n
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY status, priority""".stripMargin)),

    QueryDef("q84_quantiles",
      // exact interpolated percentiles per group (ANALYZE-style column
      // stats; SURVEY §2.4 family). Both engines define the continuous
      // quantile as value[p·(n-1)] with linear interpolation; over the
      // integral quantity domain the interpolants are exact in double
      (s, d) => Tpch.table(s, d, "lineitem")
        .groupBy(col("l_returnflag").as("flag"))
        .agg(count(lit(1)).as("n"),
          percentile(col("l_quantity"), lit(0.25)).as("p25"),
          percentile(col("l_quantity"), lit(0.5)).as("p50"),
          percentile(col("l_quantity"), lit(0.75)).as("p75"),
          percentile(col("l_quantity"), lit(0.95)).as("p95"))
        .orderBy("flag"),
      Some("""SELECT l_returnflag AS flag, count(*) AS n,
             |  quantile_cont(l_quantity, 0.25) AS p25,
             |  quantile_cont(l_quantity, 0.5) AS p50,
             |  quantile_cont(l_quantity, 0.75) AS p75,
             |  quantile_cont(l_quantity, 0.95) AS p95
             |FROM lineitem GROUP BY 1 ORDER BY flag""".stripMargin)),

    QueryDef("q85_corpus_stats",
      // corpus composition report with ROLLUP subtotal planes — the
      // per-(lang, source) token/char budget a training-data pipeline
      // tracks; all-integer aggregates
      (s, d) => Tpch.table(s, d, "documents")
        .select(col("lang"), col("source"),
          graft.operators.TextAnalysis.tokenCount(col("text")).as("t"),
          col("n_chars"))
        .rollup("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum("t").as("n_tokens"), sum("n_chars").as("n_chars_total"))
        .select(coalesce(col("lang"), lit("ALL")).as("lang"),
          coalesce(col("source"), lit("ALL")).as("source"),
          col("n_docs"), col("n_tokens"), col("n_chars_total"))
        .orderBy("lang", "source"),
      Some("""SELECT COALESCE(lang, 'ALL') AS lang,
             |  COALESCE(source, 'ALL') AS source, count(*) AS n_docs,
             |  CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
             |    ELSE len(string_split_regex(trim(text), '\s+')) END) AS BIGINT) AS n_tokens,
             |  CAST(sum(n_chars) AS BIGINT) AS n_chars_total
             |FROM documents GROUP BY ROLLUP(lang, source)
             |ORDER BY lang, source""".stripMargin)),

    QueryDef("q75_all_edges",
      // label-agnostic edge scan (type-id-0 scans, edge.lisp:208-222,
      // 429-440): ALL edge tables unioned under a label discriminator,
      // then aggregated per (label, src). sum(dst) pins the unioned
      // rows' identities (incl. the synthetic knows dsts), cents pins
      // the heterogeneous weights exactly
      (s, d) => Tpch.graph(s, d).allEdges()
        .groupBy(col("label"), col("src"))
        .agg(count(lit(1)).as("n_edges"),
          sum(QueryDef.cents(col("weight"))).as("w_cents"),
          sum(col("dst")).as("d_sum"))
        .orderBy("label", "src"),
      Some("""WITH n AS (SELECT count(*) AS n FROM customer),
             |all_edges AS (
             |  SELECT 'in_region' AS label, n_nationkey AS src, n_regionkey AS dst, 1.0 AS weight FROM nation
             |  UNION ALL SELECT 'located_in', c_custkey, c_nationkey, 1.0 FROM customer
             |  UNION ALL SELECT 'sup_located_in', s_suppkey, s_nationkey, 1.0 FROM supplier
             |  UNION ALL SELECT 'placed', o_custkey, o_orderkey, o_totalprice FROM orders
             |  UNION ALL SELECT 'contains', l_orderkey, l_partkey, l_quantity FROM lineitem
             |  UNION ALL SELECT 'supplied_by', l_partkey, l_suppkey, 1.0 FROM lineitem
             |  UNION ALL SELECT 'knows', c_custkey, (c_custkey*3+7) % n.n, 1.0 FROM customer, n
             |  UNION ALL SELECT 'knows', c_custkey, (c_custkey*5+3) % n.n, 1.0 FROM customer, n
             |)
             |SELECT label, src, CAST(count(*) AS BIGINT) AS n_edges,
             |  CAST(sum(CAST(round(weight*100, 0) AS BIGINT)) AS BIGINT) AS w_cents,
             |  CAST(sum(dst) AS BIGINT) AS d_sum
             |FROM all_edges GROUP BY 1, 2 ORDER BY label, src""".stripMargin)),

    QueryDef("q144_pivot",
      // the relational PIVOT surface: per-user event-type count matrix
      // via Dataset.pivot with an EXPLICIT value list (an inferred
      // list would mean an extra distinct pass AND a nondeterministic
      // column order). One hash aggregation — pivot columns are
      // map-side count slots, absent cells coalesce to 0
      (s, d) => {
        val p = events(s, d)
          .groupBy("user_id")
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
        p.select(col("user_id") +:
          Seq("click", "error", "purchase", "signup", "view")
            .map(c => coalesce(col(c), lit(0L)).as(c)): _*)
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
             |  count(*) FILTER (event_type = 'click') AS click,
             |  count(*) FILTER (event_type = 'error') AS error,
             |  count(*) FILTER (event_type = 'purchase') AS purchase,
             |  count(*) FILTER (event_type = 'signup') AS signup,
             |  count(*) FILTER (event_type = 'view') AS view
             |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin)))
}
