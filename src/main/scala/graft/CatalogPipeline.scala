package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.model.Tpch
import graft.operators.{Decontaminate, Dedup, GraphAnalytics, Packing, Sampling, Similarity, TextAnalysis, TimeSeries}
import graft.spatial.{Geohash, SpatialOps}

/** Pipeline operator catalog: spatial queries (SURVEY.md §2.8), text
  * analysis, deduplication, similarity search, and event/stream-shaped
  * analytics over the documents/embeddings/events tables.
  */
object CatalogPipeline {
  import QueryDef._

  /** Deterministic synthetic coordinates for customers, shared verbatim
    * with the oracles (integer arithmetic → exact in both engines).
    */
  private def withCoords(customers: DataFrame): DataFrame = customers
    .withColumn("lon", ((col("id") * 7 % 360) - 180).cast("double") + 0.5)
    .withColumn("lat", ((col("id") * 13 % 180) - 90).cast("double") + 0.5)
  /** Word-3-shingle sets per document — shared by the jaccard oracles
    * (now sourced from OracleFragments so the streaming near-dup row
    * composes the identical fragment).
    */
  private val shingleSql = OracleFragments.shingleSetSql

  /** Winnowing fingerprint selection in SQL (k=8 char-grams, w=4,
    * rightmost-min) — the shared CTE chain of the q152/q156 oracles;
    * mirrors Dedup.winnowArray exactly. Ends at `fp(doc_id, pos, hv)`.
    */
  private val winnowSql =
    """g AS (SELECT doc_id, CAST(i AS INT) AS pos,
      |    ('0x' || substr(md5(lower(substr(text, CAST(i AS INT), 8))), 1, 8))::BIGINT AS hv
      |  FROM (SELECT doc_id, text,
      |      unnest(range(1, greatest(length(text) - 7, 0) + 1)) AS i FROM documents)),
      |mm AS (SELECT doc_id, count(*) AS m FROM g GROUP BY 1),
      |st AS (SELECT doc_id,
      |    CAST(unnest(range(1, greatest(m - 3, 1) + 1)) AS INT) AS p
      |  FROM mm WHERE m >= 1),
      |wmin AS (SELECT st.doc_id, st.p, min(g.hv) AS minv
      |  FROM st JOIN g ON g.doc_id = st.doc_id AND g.pos BETWEEN st.p AND st.p + 3
      |  GROUP BY 1, 2),
      |sel AS (SELECT w.doc_id, max(g.pos) AS pos, w.minv AS hv
      |  FROM wmin w JOIN g ON g.doc_id = w.doc_id
      |    AND g.pos BETWEEN w.p AND w.p + 3 AND g.hv = w.minv
      |  GROUP BY w.doc_id, w.p, w.minv),
      |fp AS (SELECT DISTINCT doc_id, pos, hv FROM sel)""".stripMargin

  /** Signature index for the documents table (doc, hashed shingles,
    * minhash sig), built once per (session, dataset) — the persisted
    * artifact a production dedup pipeline maintains alongside the
    * corpus (Dedup scaladoc: "long-running pipelines should persist
    * signatureFrame").
    */
  private val sigIndex =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** (count, dim) of q108's augmented corpus, once per (session,
    * dataset) — the auto-width and store build need them, and a fresh
    * count pass per run was a measured chunk of q108's cost.
    */
  private val q108Stats =
    scala.collection.concurrent.TrieMap.empty[String, (Long, Int)]
  private def docSignatures(s: SparkSession, d: String, k: Int, numHashes: Int): DataFrame =
    sigIndex.getOrElseUpdate(s"${s.sparkContext.applicationId}:$d:$k:$numHashes",
      Dedup.signatureFrame(Tpch.table(s, d, "documents"), "doc_id", "text", k, numHashes)
        .localCheckpoint(true))

  private val coordsSql =
    """SELECT c_custkey AS id,
      |  CAST((c_custkey*7 % 360) - 180 AS DOUBLE) + 0.5 AS lon,
      |  CAST((c_custkey*13 % 180) - 90 AS DOUBLE) + 0.5 AS lat
      |FROM customer""".stripMargin
  private val haversineSql =
    // identical formula shape to SpatialOps.haversineM
    "2*6371000.0*asin(least(1.0, sqrt(power(sin(radians(lat-(LAT0))/2),2) + " +
      "cos(radians(LAT0))*cos(radians(lat))*power(sin(radians(lon-(LON0))/2),2))))"
  private def hav(lon0: Double, lat0: Double): String =
    haversineSql.replace("LAT0", lat0.toString).replace("LON0", lon0.toString)

  /** Written cell-partitioned customer store (SpatialOps.ensureCellStore,
    * build-if-absent): q40/q41/q42 probes are partition-pruned reads of
    * the covering cells' directories — the at-scale path, same move as
    * the ANN stores (SpatialStoreSpec pins the PartitionFilters).
    */
  private val custStorePrecision = 2
  private def custStore(s: SparkSession, d: String): DataFrame =
    SpatialOps.ensureCellStore(
      withCoords(Tpch.graph(s, d).vertexFrame("customer"))
        .select(col("id"), col("lon"), col("lat")),
      "lon", "lat", d, "customer", custStorePrecision)

  /** The q208 gate-distillation surface. `gateBasis` is a redundant
    * threshold GRID over the four gate statistics — it contains the
    * gate's true literals (>=10 tokens, mean length in [300,1000]
    * centi-units, punctuation <=1000 per-myriad, >=2 stopwords) among
    * distractor thresholds, so the concept is linearly separable (an
    * AND of literals is a threshold over them) but the trainer has to
    * FIND the combination. Stats restate filterGate's default rules
    * (same expressions, same thresholds — TextAnalysis.filterGate);
    * integer divisions are over non-negative operands so Spark `div`
    * and the oracle's `//` agree.
    */
  private[graft] val gateBasis: Seq[graft.operators.Classify.Indicator] = {
    import graft.operators.Classify.Indicator
    Seq(
      Indicator("t5", "ntok", geq = true, 5), Indicator("t10", "ntok", geq = true, 10),
      Indicator("t20", "ntok", geq = true, 20),
      Indicator("m200", "mlen", geq = true, 200), Indicator("m300", "mlen", geq = true, 300),
      Indicator("mle1000", "mlen", geq = false, 1000), Indicator("mle700", "mlen", geq = false, 700),
      Indicator("ple500", "pr", geq = false, 500), Indicator("ple1000", "pr", geq = false, 1000),
      Indicator("ple2000", "pr", geq = false, 2000),
      Indicator("s1", "nstop", geq = true, 1), Indicator("s2", "nstop", geq = true, 2),
      Indicator("s4", "nstop", geq = true, 4))
  }
  private[graft] val gateFeatureCols = gateBasis.map(_.featName)
  private[graft] val gateRounds = 16

  /** Training happens on the deterministic md5-bucket sample, not the
    * corpus (r12 next-round #2): 16 rounds × a full-corpus aggregation
    * is the wrong 100 TB plan when the gate is learnable from a slice
    * — the sampled features materialize once and every round
    * aggregates sample-sized state; only the final evaluation/scoring
    * passes (q209–q211) touch the full frame, once each. 30% keeps the
    * sf0.001 fixture's slice large enough that the pocket still
    * separates the gate concept.
    */
  private[graft] val gateTrainFrac = 0.3
  private[graft] val gateSample: Option[(String, Double)] =
    Some(("doc_id", gateTrainFrac))
  /** The pocket model's margin over `f`'s feature columns — shared by
    * the q209/q210 oracles (`pk` from perceptronPocketCte).
    */
  private[graft] val pocketMarginSql: String =
    ("wb" +: gateFeatureCols.zipWithIndex.map { case (f, i) => s"w${i + 1}*$f" })
      .mkString(" + ")

  private[graft] def gateFeatures(docs: DataFrame): DataFrame = {
    val text = col("text")
    val toks = TextAnalysis.tokens(text)
    val stats = docs.select(col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("sum_token_len"),
      length(regexp_replace(text, "[a-zA-Z0-9\\s]", "")).cast("long").as("n_punct"),
      size(filter(toks, t => t.isInCollection(TextAnalysis.englishStopwords)))
        .cast("long").as("n_stop"),
      length(text).cast("long").as("n_text"))
    val reasons =
      when(col("n_tokens") < 10, 1L).otherwise(0L) +
        when(col("n_tokens") > 0 && (col("sum_token_len") < col("n_tokens") * 3 ||
          col("sum_token_len") > col("n_tokens") * 10), 2L).otherwise(0L) +
        when(col("n_punct") * 10 > col("n_text"), 4L).otherwise(0L) +
        when(col("n_stop") < 2, 8L).otherwise(0L)
    val derived = stats.select(col("doc_id"),
      col("n_tokens").as("ntok"),
      expr("(sum_token_len * 100) div greatest(n_tokens, 1)").as("mlen"),
      expr("(n_punct * 10000) div greatest(n_text, 1)").as("pr"),
      col("n_stop").as("nstop"),
      when(reasons === 0, 1L).otherwise(0L).as("y"))
    graft.operators.Classify.thresholdIndicators(derived, gateBasis, Seq("doc_id", "y"))
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- 2.8 spatial ---------------------------------------------------
    QueryDef("q40_spatial_bbox",
      (s, d) => SpatialOps.withinBBoxStored(custStore(s, d), custStorePrecision,
        "lon", "lat", Geohash.BBox(-60, -40, 60, 40))
        .select(col("id"), col("lon"), col("lat")).orderBy("id"),
      Some(s"""SELECT id, lon, lat FROM ($coordsSql)
              |WHERE lon BETWEEN -60 AND 60 AND lat BETWEEN -40 AND 40 ORDER BY id""".stripMargin)),

    QueryDef("q41_spatial_knn",
      (s, d) => SpatialOps.nearestKStored(custStore(s, d), custStorePrecision,
        "lon", "lat", "id", lon = 10.0, lat = 20.0, k = 15)
        .select(col("id"), col("dist_m")),
      Some(s"""SELECT id, round(${hav(10.0, 20.0)}, 3) AS dist_m FROM ($coordsSql)
              |ORDER BY dist_m, id LIMIT 15""".stripMargin)),

    QueryDef("q42_spatial_radius",
      (s, d) => SpatialOps.nearStored(custStore(s, d), custStorePrecision,
        "lon", "lat", lon = 0.0, lat = 0.0, radiusM = 3000000.0)
        .select(col("id"), round(col("dist_m"), 3).as("dist_m")).orderBy("id"),
      Some(s"""SELECT id, round(${hav(0.0, 0.0)}, 3) AS dist_m FROM ($coordsSql)
              |WHERE ${hav(0.0, 0.0)} <= 3000000.0 ORDER BY id""".stripMargin)),

    QueryDef("q43_geohash_cells",
      // geohash encode, DuckDB-verified: the oracle rebuilds the base32
      // code from first principles (floor-scaled lon/lat bit codes,
      // interleave, 5-bit chunks). Bisection and floor-scaling agree
      // exactly here because the synthetic coords are dyadic rationals
      // (int + 0.5), so every comparison is fp-exact
      (s, d) => SpatialOps.withCell(
        withCoords(Tpch.graph(s, d).vertexFrame("customer")), "lon", "lat", 6)
        .select(col("id"), col("cell")).orderBy("id"),
      Some(s"""WITH c AS ($coordsSql),
             |b AS (SELECT id,
             |  CAST(floor((lon+180.0)/360.0*32768.0) AS BIGINT) AS lonb,
             |  CAST(floor((lat+90.0)/180.0*32768.0) AS BIGINT) AS latb FROM c)
             |SELECT id, list_aggregate(list_transform(range(6), j ->
             |  substr('0123456789bcdefghjkmnpqrstuvwxyz',
             |    1 + CAST(list_aggregate(list_transform(range(5), t ->
             |      (CASE WHEN (5*j+t) % 2 = 0
             |        THEN (lonb >> CAST(14 - (5*j+t)//2 AS INTEGER)) & 1
             |        ELSE (latb >> CAST(14 - (5*j+t)//2 AS INTEGER)) & 1 END)
             |      * (1 << CAST(4-t AS INTEGER))), 'sum') AS INTEGER), 1)
             |), 'string_agg', '') AS cell
             |FROM b ORDER BY id""".stripMargin)),

    QueryDef("q45_spatial_graph",
      // spatial predicate composed with graph pattern (the find-near +
      // edge-goal composition of spatial-query.lisp:88-120): customers
      // within 2500 km of the origin, with their count of big orders
      (s, d) => {
        val g = Tpch.graph(s, d)
        val nearCust = SpatialOps.near(withCoords(g.vertexFrame("customer")),
          "lon", "lat", lon = 0.0, lat = 0.0, radiusM = 2500000.0, precision = 2)
        val bigOrders = g.edgeFrame("placed").filter(col("weight") > 300000.0)
        nearCust.join(bigOrders, nearCust("id") === bigOrders("src"))
          .groupBy(nearCust("id").as("custkey"))
          .agg(count(lit(1)).as("n_big"))
          .orderBy("custkey")
      },
      Some(s"""SELECT id AS custkey, count(*) AS n_big
              |FROM ($coordsSql) c JOIN orders o ON o.o_custkey = c.id
              |WHERE ${hav(0.0, 0.0)} <= 2500000.0 AND o.o_totalprice > 300000
              |GROUP BY 1 ORDER BY custkey""".stripMargin)),

    // ---- text analysis -------------------------------------------------
    QueryDef("q50_token_count",
      (s, d) => Tpch.table(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN 0
             |  ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) END AS n_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    QueryDef("q157_readability",
      // Flesch reading-ease scoring ×10⁴ with all-integer counting:
      // words = whitespace tokens, sentences = [.!?]+ runs floored at
      // 1, syllables = [aeiouy]+ vowel-group runs + 1 per vowel-less
      // word. Pure per-row codegen columns (a narrow map at corpus
      // scale); the oracle restates the counting contract verbatim
      (s, d) => TextAnalysis.readability(
        Tpch.table(s, d, "documents"), "doc_id", "text").orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    CASE WHEN length(trim(text)) = 0 THEN 0
             |      ELSE len(string_split_regex(trim(lower(text)), '\s+')) END AS words,
             |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS sentences,
             |    len(regexp_extract_all(lower(text), '[aeiouy]+')) +
             |    len(list_filter(
             |      CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
             |        ELSE string_split_regex(trim(lower(text)), '\s+') END,
             |      w -> NOT regexp_matches(w, '[aeiouy]'))) AS syllables
             |  FROM documents)
             |SELECT doc_id, CAST(words AS BIGINT) AS words,
             |  CAST(sentences AS BIGINT) AS sentences,
             |  CAST(syllables AS BIGINT) AS syllables,
             |  CAST(2068350 - CASE WHEN words > 0
             |    THEN (10150 * words) // sentences + (846000 * syllables) // words
             |    ELSE 0 END AS BIGINT) AS flesch_pm
             |FROM t ORDER BY doc_id""".stripMargin)),

    QueryDef("q165_blocklist",
      // multi-pattern blocklist screening: ONE compiled-alternation
      // pass per doc (longest-first so Java's ordered alternation
      // agrees with RE2's leftmost-longest on "small table" vs
      // "small"), per-term counts and the argmax fold as
      // |patterns|-bounded array ops that never leave the row — a
      // narrow map with NO shuffle at corpus scale
      (s, d) => TextAnalysis.blocklistSummary(
          Tpch.table(s, d, "documents"), "doc_id", "text",
          patterns = Seq("small table", "hash join", "small", "slow", "dup"),
          blockAt = 3L)
        .orderBy("doc_id"),
      Some("""WITH m AS (SELECT doc_id,
             |    regexp_extract_all(text,
             |      '\b(?:small table|hash join|small|slow|dup)\b') AS ex
             |  FROM documents),
             |c AS (SELECT doc_id, len(ex) AS n_matches,
             |    len(list_distinct(ex)) AS n_distinct_terms,
             |    len(list_filter(ex, x -> x = 'dup')) AS c_dup,
             |    len(list_filter(ex, x -> x = 'hash join')) AS c_hj,
             |    len(list_filter(ex, x -> x = 'slow')) AS c_slow,
             |    len(list_filter(ex, x -> x = 'small')) AS c_small,
             |    len(list_filter(ex, x -> x = 'small table')) AS c_st
             |  FROM m),
             |g AS (SELECT *, greatest(c_dup, c_hj, c_slow, c_small, c_st) AS mx FROM c)
             |SELECT doc_id, CAST(n_matches AS BIGINT) AS n_matches,
             |  CAST(n_distinct_terms AS BIGINT) AS n_distinct_terms,
             |  CASE WHEN n_matches = 0 THEN NULL
             |    WHEN c_dup = mx THEN 'dup' WHEN c_hj = mx THEN 'hash join'
             |    WHEN c_slow = mx THEN 'slow' WHEN c_small = mx THEN 'small'
             |    ELSE 'small table' END AS top_term,
             |  CAST(CASE WHEN n_matches = 0 THEN 0 ELSE mx END AS BIGINT) AS top_n,
             |  n_matches >= 3 AS blocked
             |FROM g ORDER BY doc_id""".stripMargin)),

    QueryDef("q173_source_scorecard",
      // per-source governance audit: volume, token mass, mean length,
      // GLOBAL exact-dup exposure (cross-source copies count on both
      // sides), min-length gate pass rate, language profile with
      // smallest-code majority ties — every rate a per-myriad
      // integer; composes the q54 hash classes and the q96 token
      // contract into the one-page admit/deny read
      (s, d) => TextAnalysis.sourceScorecard(
          Tpch.table(s, d, "documents"), "doc_id", "text",
          "source", "lang", minTokens = 30L)
        .orderBy("source"),
      Some("""WITH pd AS (SELECT doc_id, source, lang,
             |    CASE WHEN length(trim(text)) = 0 THEN 0
             |      ELSE len(string_split_regex(trim(text), '\s+')) END AS tok,
             |    md5(text) AS h
             |  FROM documents),
             |hc AS (SELECT h, count(*) AS hn FROM pd GROUP BY 1),
             |fl AS (SELECT pd.*,
             |    CASE WHEN hc.hn > 1 THEN 1 ELSE 0 END AS dup,
             |    CASE WHEN pd.tok >= 30 THEN 1 ELSE 0 END AS pass
             |  FROM pd JOIN hc USING (h)),
             |base AS (SELECT source, count(*) AS n_docs,
             |    sum(tok) AS total_tokens, sum(dup) AS ndup, sum(pass) AS npass,
             |    count(DISTINCT lang) AS n_langs
             |  FROM fl GROUP BY 1),
             |lc AS (SELECT source, lang, count(*) AS n FROM fl GROUP BY 1, 2),
             |tl AS (SELECT lc.source, min(lc.lang) AS top_lang
             |  FROM lc JOIN (SELECT source, max(n) AS mx FROM lc GROUP BY 1) m
             |    ON lc.source = m.source AND lc.n = m.mx
             |  GROUP BY 1)
             |SELECT base.source, n_docs,
             |  CAST(total_tokens AS BIGINT) AS total_tokens,
             |  CAST(total_tokens * 10000 // n_docs AS BIGINT) AS mean_tokens_pm,
             |  CAST(ndup * 10000 // n_docs AS BIGINT) AS dup_pm,
             |  CAST(npass * 10000 // n_docs AS BIGINT) AS gate_pm,
             |  n_langs, top_lang
             |FROM base JOIN tl ON base.source = tl.source
             |ORDER BY base.source""".stripMargin)),

    QueryDef("q185_source_similarity",
      // pairwise exact Jaccard between source vocabularies — the
      // "same crawl wearing two names" audit beside q173: (source,
      // token) membership dedupes to sources×vocab grain, the
      // intersection join is token-equality-keyed, all integers
      (s, d) => TextAnalysis.sourceSimilarity(
          Tpch.table(s, d, "documents"), "text", "source")
        .orderBy("source_a", "source_b"),
      Some("""WITH st AS (SELECT DISTINCT source,
             |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
             |  FROM documents WHERE length(trim(text)) > 0),
             |sz AS (SELECT source, count(*) AS n FROM st GROUP BY 1),
             |iv AS (SELECT a.source AS source_a, b.source AS source_b,
             |    count(*) AS i
             |  FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
             |  GROUP BY 1, 2)
             |SELECT iv.source_a, iv.source_b,
             |  CAST(iv.i AS BIGINT) AS n_shared,
             |  CAST(iv.i * 10000 // (na.n + nb.n - iv.i) AS BIGINT) AS jaccard_pm
             |FROM iv JOIN sz na ON na.source = iv.source_a
             |  JOIN sz nb ON nb.source = iv.source_b
             |ORDER BY source_a, source_b""".stripMargin)),

    QueryDef("q186_vocab_growth",
      // Heaps'-law vocabulary growth curve at 10 id-quantile
      // checkpoints: tokens reduce to their first document, first-
      // counts to document grain, and the curve is ONE conditional
      // aggregation (no global rank window — the single-task shape
      // this operator family refuses); checkpoints use the shared
      // exact interpolated percentile contract
      (s, d) => TextAnalysis.vocabGrowth(
          Tpch.table(s, d, "documents"), "doc_id", "text", buckets = 10)
        .orderBy("bucket"),
      Some {
        val buckets = 10
        val rows = (1 to buckets).map { k =>
          val p = k.toDouble / buckets
          s"""SELECT CAST($k AS BIGINT) AS bucket,
             |  (SELECT count(*) FROM dd
             |   WHERE id <= (SELECT quantile_cont(doc_id, $p) FROM documents))
             |    AS docs_through,
             |  (SELECT CAST(COALESCE(sum(nf), 0) AS BIGINT) FROM dd
             |   WHERE id <= (SELECT quantile_cont(doc_id, $p) FROM documents))
             |    AS vocab_size""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH f AS (SELECT token, min(doc_id) AS fid FROM (
           |    SELECT doc_id,
           |      unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
           |    FROM documents WHERE length(trim(text)) > 0) GROUP BY 1),
           |nf AS (SELECT fid AS id, count(*) AS nf FROM f GROUP BY 1),
           |dd AS (SELECT CAST(d.doc_id AS DOUBLE) AS id, COALESCE(nf.nf, 0) AS nf
           |  FROM documents d LEFT JOIN nf ON nf.id = d.doc_id)
           |$rows
           |ORDER BY bucket""".stripMargin
      }),

    QueryDef("q187_dup_class_histogram",
      // exact-duplicate class-size distribution — the one-page dedup
      // audit: how many hash classes exist at each multiplicity
      // (class_size 1 = unique docs). Two hash aggregations, output
      // bounded by the largest class size
      (s, d) => Dedup.exactDupGroups(
          Tpch.table(s, d, "documents"), "text", "doc_id")
        .groupBy(col("n_docs").as("class_size"))
        .agg(count(lit(1)).as("n_classes"))
        .orderBy("class_size"),
      Some("""WITH c AS (SELECT md5(text) AS h, count(*) AS class_size
             |  FROM documents GROUP BY 1)
             |SELECT class_size, count(*) AS n_classes
             |FROM c GROUP BY 1 ORDER BY class_size""".stripMargin)),

    QueryDef("q73_bpe_tokens",
      // BPE-ish pre-tokenization (lookahead-free GPT-2-style pattern,
      // identical under Java regex and DuckDB's RE2): count per doc of
      // non-whitespace pre-tokens — the LLM corpus budgeting unit
      (s, d) => Tpch.table(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.bpeIshTokenCount(col("text")).as("n_bpe_tokens"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, CAST(len(list_filter(
             |    regexp_extract_all(text, '${TextAnalysis.bpeIshPattern}'),
             |    t -> NOT regexp_matches(t, '^\\s+$$'))) AS INTEGER) AS n_bpe_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    QueryDef("q51_quality_score",
      (s, d) => Tpch.table(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id"),
      Some {
        val toks = "string_split_regex(trim(text), '\\s+')"
        val nTok = s"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len($toks) END"
        val stopHits = s"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(list_filter($toks, " +
          "t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) END"
        val punct = "CASE WHEN length(text) = 0 THEN 0.0 ELSE " +
          "CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)/length(text) END"
        s"""SELECT doc_id, round(
           |  least(CAST($nTok AS DOUBLE)/50.0, 1.0) * 0.4 +
           |  least((CASE WHEN $nTok = 0 THEN 0.0 ELSE CAST($stopHits AS DOUBLE)/$nTok END) * 5.0, 1.0) * 0.4 +
           |  greatest(1.0 - ($punct) * 10.0, 0.0) * 0.2, 4) AS quality
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    QueryDef("q52_lang_id",
      (s, d) => Tpch.table(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id"),
      Some {
        val toks = "string_split_regex(trim(text), '\\s+')"
        def hits(words: Seq[String]) =
          s"len(list_filter($toks, t -> list_contains([${words.map(w => s"'$w'").mkString(",")}], t)))"
        val en = hits(Seq("the", "and", "of", "is"))
        val de = hits(Seq("der", "und", "das", "ist"))
        val es = hits(Seq("el", "la", "que", "es"))
        s"""SELECT doc_id, CASE
           |  WHEN greatest($en,$de,$es) = 0 THEN 'und'
           |  WHEN $en >= greatest($de,$es) THEN 'en'
           |  WHEN $de >= $es THEN 'de'
           |  ELSE 'es' END AS lang_pred
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    QueryDef("q53_fingerprint",
      (s, d) => Tpch.table(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS fp
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- dedup ---------------------------------------------------------
    QueryDef("q54_dedup_exact",
      (s, d) => Dedup.exactDupGroups(Tpch.table(s, d, "documents"), "text", "doc_id")
        .orderBy("content_hash"),
      Some("""SELECT md5(text) AS content_hash, count(*) AS n_docs, min(doc_id) AS keep_id
             |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin)),

    QueryDef("q55_ngram_jaccard",
      // exact 3-gram Jaccard for a bounded pairing (near-id pairs);
      // the unbounded/scalable variant is q56 (LSH)
      (s, d) => {
        val docs = Tpch.table(s, d, "documents")
        Dedup.jaccardForPairs(docs, "doc_id", "text", 3,
            Dedup.nearIdPairs(docs, "doc_id", 3))
          .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH s AS ($shingleSql)
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
           |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
           |FROM s a JOIN s b ON a.doc_id < b.doc_id AND b.doc_id - a.doc_id <= 3
           |ORDER BY id_a, id_b""".stripMargin)),

    QueryDef("q152_winnow_fingerprints",
      // winnowing fingerprints (the MOSS scheme): char-8-gram rolling
      // hashes, window w=4, rightmost-min selection, distinct
      // (position, hash) pairs — the position-robust document sketch
      // that guarantees any shared substring of length ≥ 11 chars
      // contributes a common fingerprint while keeping ~2/(w+1) of the
      // hashes. The k-gram hash is the first 8 md5 hex digits as an
      // integer, portable bit-for-bit; the oracle replays selection
      // with a window join and certifies the exact fingerprint SET via
      // an md5 over the canonical "pos:hash,…" serialization. On the
      // engine everything is per-doc array math in one map — the
      // oracle's O(m·w) join is the semantics, not the plan
      (s, d) => Dedup.winnowFingerprints(Tpch.table(s, d, "documents"),
          "doc_id", "text", k = 8, w = 4)
        .orderBy("doc_id"),
      Some(s"""WITH $winnowSql,
             |agg AS (SELECT doc_id, count(*) AS n_fp,
             |    md5(string_agg(CAST(pos AS VARCHAR) || ':' || CAST(hv AS VARCHAR),
             |      ',' ORDER BY pos)) AS fp_md5
             |  FROM fp GROUP BY 1)
             |SELECT dd.doc_id, CAST(coalesce(a.n_fp, 0) AS BIGINT) AS n_fp,
             |  coalesce(a.fp_md5, md5('')) AS fp_md5
             |FROM documents dd LEFT JOIN agg a USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    QueryDef("q156_winnow_matches",
      // the MOSS match step over q152's fingerprints: pairs of docs
      // sharing ≥2 RARE fingerprint hashes (df ≤ 4 — the q149
      // blocking discipline bounds candidates to rows·maxDf/2, linear
      // at fixed maxDf; boilerplate hashes are excluded by construction
      // instead of exploding the join). Position-robust near-copy
      // detection: offset-shifted copies collide on the HASH even
      // though their fingerprint positions differ
      (s, d) => Dedup.winnowMatchPairs(Tpch.table(s, d, "documents"),
          "doc_id", "text", k = 8, w = 4, maxDf = 4, minShared = 2)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH $winnowSql,
             |fpd AS (SELECT DISTINCT doc_id, hv FROM fp),
             |hdf AS (SELECT hv, count(*) AS df FROM fpd GROUP BY 1),
             |rare AS (SELECT hv FROM hdf WHERE df <= 4),
             |fpr AS (SELECT f.doc_id, f.hv FROM fpd f JOIN rare USING (hv)),
             |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |    CAST(count(*) AS BIGINT) AS n_shared
             |  FROM fpr a JOIN fpr b ON a.hv = b.hv AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT id_a, id_b, n_shared FROM p WHERE n_shared >= 2
             |ORDER BY id_a, id_b""".stripMargin)),

    QueryDef("q153_containment",
      // asymmetric shingle containment |A∩B|/|A| per-myriad over the
      // q55 candidate pairs — the subset-duplicate detector symmetric
      // Jaccard misses (a paragraph quoted inside a much longer page
      // scores ~10⁴ here, ~0 there). Same bounded-pair + two-hash-join
      // shape as q55; all-integer contract
      (s, d) => {
        val docs = Tpch.table(s, d, "documents")
        Dedup.containmentForPairs(docs, "doc_id", "text", 3,
            Dedup.nearIdPairs(docs, "doc_id", 3))
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH s AS ($shingleSql)
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |  CAST(len(a.sh) AS BIGINT) AS n_a,
           |  CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_common,
           |  CAST(len(list_intersect(a.sh, b.sh)) * 10000
           |    // greatest(len(a.sh), 1) AS BIGINT) AS containment_pm
           |FROM s a JOIN s b ON b.doc_id - a.doc_id BETWEEN 1 AND 3
           |ORDER BY id_a, id_b""".stripMargin)),

    QueryDef("q56_minhash_lsh",
      // MinHash+LSH near-dup pairs, exact-verified at threshold 0.5.
      // The oracle is the exhaustive O(n²) pair scan — tractable at
      // oracle scale, which is exactly the work LSH avoids at data
      // scale. Banding r=3 × b=8 puts per-pair recall at the planted
      // near-dup band (j ≥ 0.9) above 1−3·10⁻⁵ while keeping the
      // false-candidate rate ~j³ per band (this corpus's tiny shared
      // vocabulary makes r=2 banding collide far too often), so the LSH
      // output equals the exhaustive truth and the hash check is a
      // genuine recall gate, not a tautology
      (s, d) => Dedup.minhashNearDups(Tpch.table(s, d, "documents"), "doc_id", "text",
          k = 3, numHashes = 24, bands = 8, threshold = 0.5,
          sigs = Some(docSignatures(s, d, 3, 24)))
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b"),
      Some(s"""WITH s AS ($shingleSql),
           |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
           |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS j
           |  FROM s a JOIN s b ON a.doc_id < b.doc_id)
           |SELECT id_a, id_b, round(j, 6) AS jaccard FROM p
           |WHERE j >= 0.5 ORDER BY id_a, id_b""".stripMargin)),

    QueryDef("q76_dedup_clusters",
      // the canonical fuzzy-dedup pipeline end-to-end: LSH candidate
      // pairs → connected components → one representative per cluster
      // (keep = doc is its cluster's min id). The oracle recomputes the
      // truth exhaustively: O(n²) jaccard pairs, then min-id label
      // propagation as a recursive CTE — so both the pair recall AND
      // the transitive clustering are value-checked. At corpus scale
      // the pair step is the bucketed LSH (never all-pairs) and the
      // component step is the same iterative min-propagation, both
      // shuffle-bounded
      (s, d) => {
        val docs = Tpch.table(s, d, "documents")
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
          k = 3, numHashes = 24, bands = 8, threshold = 0.5,
          sigs = Some(docSignatures(s, d, 3, 24)))
        val comps = GraphAnalytics.connectedComponents(
          pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
          docs.select(col("doc_id").as("id")))
        comps.select(col("id").as("doc_id"), col("component").as("cluster_rep"),
          (col("id") === col("component")).as("keep")).orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE s AS ($shingleSql),
           |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM s a JOIN s b ON a.doc_id < b.doc_id
           |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
           |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
           |e AS (SELECT id_a AS a, id_b AS b FROM p
           |  UNION ALL SELECT id_b, id_a FROM p),
           |reach(id, r) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT e.a, reach.r FROM e JOIN reach ON reach.id = e.b)
           |SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_rep,
           |  (id = min(r)) AS keep
           |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin)),

    QueryDef("q86_cluster_split",
      // leakage-proof train/val/test carving: split by near-dup CLUSTER
      // representative, not by document — a doc-level split lets two
      // near-duplicates land on opposite sides of the train/test wall
      // (silent contamination q79 would then have to catch); keying the
      // hash split by the cluster rep pins every near-dup family to one
      // side. Composition of q76's clustering and q77's deterministic
      // split — both already value-checked
      (s, d) => {
        val docs = Tpch.table(s, d, "documents")
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
          k = 3, numHashes = 24, bands = 8, threshold = 0.5,
          sigs = Some(docSignatures(s, d, 3, 24)))
        val comps = GraphAnalytics.connectedComponents(
          pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
          docs.select(col("doc_id").as("id")))
        comps.select(col("id").as("doc_id"),
            col("component").as("cluster_rep"),
            Sampling.hashSplit(col("component"),
              Seq("train" -> 0.9, "val" -> 0.05), rest = "test").as("split"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE s AS ($shingleSql),
           |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM s a JOIN s b ON a.doc_id < b.doc_id
           |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
           |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
           |e AS (SELECT id_a AS a, id_b AS b FROM p
           |  UNION ALL SELECT id_b, id_a FROM p),
           |reach(id, r) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT e.a, reach.r FROM e JOIN reach ON reach.id = e.b),
           |comp AS (SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_rep
           |  FROM reach GROUP BY id)
           |SELECT doc_id, cluster_rep,
           |  CASE WHEN b < 900 THEN 'train' WHEN b < 950 THEN 'val' ELSE 'test' END AS split
           |FROM (SELECT doc_id, cluster_rep,
           |  ('0x' || substr(md5(CAST(cluster_rep AS VARCHAR)), 1, 8))::BIGINT % 1000 AS b
           |  FROM comp)
           |ORDER BY doc_id""".stripMargin)),

    QueryDef("q77_hash_split",
      // deterministic train/val/test carving by key hash — the
      // reproducible alternative to rand(seed): assignment is a pure
      // function of the data (stable across engines, partitionings and
      // incremental appends), which is why the oracle can recompute
      // every row's split bit-for-bit in SQL
      (s, d) => Tpch.table(s, d, "documents")
        .select(col("doc_id"),
          Sampling.hashBucket(col("doc_id"), 1000).as("bucket"),
          Sampling.hashSplit(col("doc_id"),
            Seq("train" -> 0.9, "val" -> 0.05), rest = "test").as("split"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, b AS bucket,
             |  CASE WHEN b < 900 THEN 'train' WHEN b < 950 THEN 'val'
             |       ELSE 'test' END AS split
             |FROM (SELECT doc_id,
             |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 AS b
             |  FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    QueryDef("q93_quota_sample",
      // per-(source, lang) quota cap — the data-mixing op (Pile/Dolma
      // style per-domain caps). Deterministic by md5 rank, so the
      // oracle re-derives the exact kept set in SQL
      (s, d) => Sampling.quotaCap(Tpch.table(s, d, "documents"),
          Seq(col("source"), col("lang")), col("doc_id"), quota = 8)
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, source, lang FROM (
             |  SELECT doc_id, source, lang, row_number() OVER (
             |    PARTITION BY source, lang
             |    ORDER BY md5(CAST(doc_id AS VARCHAR)), CAST(doc_id AS VARCHAR)) AS rk
             |  FROM documents) WHERE rk <= 8 ORDER BY doc_id""".stripMargin)),

    QueryDef("q94_epoch_mix",
      // epoch-weighted mixture materialization — per-source repetition
      // factors (src0 2.5 epochs, src1 3, src2 0.4, src3 dropped,
      // everything else 1). Fractional epochs resolve by key hash with
      // integer-literal thresholds, so the oracle re-derives the exact
      // repeated stream via a lateral range() join
      (s, d) => Sampling.epochMix(Tpch.table(s, d, "documents"),
          col("source"), col("doc_id"),
          Map("src0" -> 2.5, "src1" -> 3.0, "src2" -> 0.4, "src3" -> 0.0))
        .select(col("doc_id"), col("source"), col("copy_idx"))
        .orderBy("doc_id", "copy_idx"),
      Some("""SELECT d.doc_id, d.source, r.range AS copy_idx
             |FROM documents d, range(3) r
             |WHERE r.range < (CASE d.source
             |  WHEN 'src0' THEN 2 + (CASE WHEN ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':epoch'), 1, 8))::BIGINT % 1000000 < 500000 THEN 1 ELSE 0 END)
             |  WHEN 'src1' THEN 3
             |  WHEN 'src2' THEN (CASE WHEN ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':epoch'), 1, 8))::BIGINT % 1000000 < 400000 THEN 1 ELSE 0 END)
             |  WHEN 'src3' THEN 0
             |  ELSE 1 END)
             |ORDER BY doc_id, copy_idx""".stripMargin)),

    QueryDef("q95_chunk_overlap",
      // sliding-window chunking at (size 6, stride 4): the RAG/embed
      // pre-step. Start offsets (stopping once a window reaches the
      // document end), window text and truncated tail are all pure
      // functions of the token array, so the oracle re-derives every
      // chunk via list slicing
      (s, d) => TextAnalysis.chunkOverlap(Tpch.table(s, d, "documents"),
          "doc_id", "text", chunkSize = 6, stride = 4)
        .orderBy("doc_id", "chunk_id"),
      Some("""SELECT doc_id, tok_start // 4 AS chunk_id, tok_start,
             |  array_to_string(toks[tok_start+1 : tok_start+6], ' ') AS chunk_text,
             |  least(6, len(toks) - tok_start) AS chunk_tokens
             |FROM (SELECT doc_id, toks,
             |        unnest(range(0, greatest(len(toks) - 3, 0) + 1, 4)) AS tok_start
             |      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
             |            FROM documents WHERE trim(text) <> ''))
             |ORDER BY doc_id, chunk_id""".stripMargin)),

    QueryDef("q96_vocab",
      // vocabulary induction: top-50 tokens by occurrence count with
      // doc frequencies and a deterministic dense rank (the vocab id).
      // Ties break on the token string, so the oracle re-derives the
      // identical mapping
      (s, d) => TextAnalysis.vocab(Tpch.table(s, d, "documents"),
          "doc_id", "text", topK = 50)
        .orderBy("rank"),
      Some("""SELECT token, n_occurrences, n_docs, rank FROM (
             |  SELECT token, count(*) AS n_occurrences,
             |    count(DISTINCT doc_id) AS n_docs,
             |    row_number() OVER (ORDER BY count(*) DESC, token) AS rank
             |  FROM (SELECT doc_id,
             |          unnest(regexp_split_to_array(trim(text), '\s+')) AS token
             |        FROM documents WHERE trim(text) <> '')
             |  GROUP BY token)
             |WHERE rank <= 50 ORDER BY rank""".stripMargin)),

    QueryDef("q97_filter_gate",
      // composite quality gate with a reasons bitmask (auditable
      // filtering: every dropped doc says why). All rules are integer
      // comparisons, so the oracle re-derives every verdict bit-exactly
      (s, d) => TextAnalysis.filterGate(Tpch.table(s, d, "documents"),
          "doc_id", "text")
        .orderBy("doc_id"),
      // token stats + gate bitmask from OracleFragments (this row
      // EXPOSES the mask the composed flagships filter on)
      Some(s"""WITH ${OracleFragments.tokenStatsCte}
           |SELECT doc_id, n_tokens, sum_token_len, n_punct, n_stop,
           |  CAST(reasons AS BIGINT) AS reasons, reasons = 0 AS keep
           |FROM (SELECT doc_id, n_tokens, sum_token_len, n_punct, n_stop,
           |  ${OracleFragments.gateMaskSql} AS reasons
           |  FROM q)
           |ORDER BY doc_id""".stripMargin)),

    QueryDef("q98_bpe_pairs",
      // the BPE merge statistic: top-30 adjacent char pairs weighted by
      // word frequency. Pair extraction is substr arithmetic, identical
      // in both engines, so the oracle re-derives the exact table
      (s, d) => TextAnalysis.bpePairCounts(Tpch.table(s, d, "documents"),
          "text", topK = 30)
        .orderBy("rank"),
      Some("""SELECT pair, n_occurrences, rank FROM (
             |  SELECT pair, n_occurrences,
             |    row_number() OVER (ORDER BY n_occurrences DESC, pair) AS rank
             |  FROM (
             |    SELECT substr(word, CAST(i AS INTEGER), 2) AS pair,
             |      CAST(sum(freq) AS BIGINT) AS n_occurrences
             |    FROM (
             |      SELECT word, freq, unnest(range(1, length(word))) AS i
             |      FROM (
             |        SELECT word, count(*) AS freq
             |        FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word
             |              FROM documents WHERE trim(text) <> '')
             |        GROUP BY word)
             |      WHERE length(word) >= 2)
             |    GROUP BY pair))
             |WHERE rank <= 30 ORDER BY rank""".stripMargin)),

    // BPE merge TRAINING (the loop q98's statistic feeds): three
    // deterministic merge rounds over the word-frequency table — each
    // round's winning pair (count desc, pair asc) and its summed
    // count. The oracle unrolls the three rounds as materialized CTE
    // stages (pair counts → argmax → literal replace with the same
    // sentinel padding), so a divergence in tie-breaks, weighting, or
    // the left-to-right non-overlapping merge application would
    // hash-mismatch. Symbols ride space-separated strings in BOTH
    // engines: merge application is plain string replace, identical
    // semantics by construction.
    QueryDef("q201_bpe_merges",
      (s, d) => {
        import s.implicits._
        TextAnalysis.bpeMerges(Tpch.table(s, d, "documents"), "text", rounds = 3)
          ._1.toDF("step", "pair", "n_occurrences").orderBy("step")
      },
      Some("""WITH w0 AS MATERIALIZED (
             |  SELECT ' ' || regexp_replace(w, '(.)', '\1 ', 'g') AS sym,
             |    count(*) AS n
             |  FROM (SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
             |        FROM documents)
             |  WHERE length(w) > 0 GROUP BY 1),
             |p1 AS (SELECT l[i] || ' ' || l[i+1] AS p, sum(n) AS cnt FROM (
             |    SELECT l, n, unnest(range(1, len(l))) AS i FROM (
             |      SELECT string_split(trim(sym), ' ') AS l, n FROM w0))
             |  GROUP BY 1),
             |m1 AS MATERIALIZED (SELECT p, cnt FROM p1 ORDER BY cnt DESC, p LIMIT 1),
             |w1 AS MATERIALIZED (SELECT replace(sym,
             |    ' ' || (SELECT p FROM m1) || ' ',
             |    ' ' || (SELECT replace(p, ' ', '') FROM m1) || ' ') AS sym, n FROM w0),
             |p2 AS (SELECT l[i] || ' ' || l[i+1] AS p, sum(n) AS cnt FROM (
             |    SELECT l, n, unnest(range(1, len(l))) AS i FROM (
             |      SELECT string_split(trim(sym), ' ') AS l, n FROM w1))
             |  GROUP BY 1),
             |m2 AS MATERIALIZED (SELECT p, cnt FROM p2 ORDER BY cnt DESC, p LIMIT 1),
             |w2 AS MATERIALIZED (SELECT replace(sym,
             |    ' ' || (SELECT p FROM m2) || ' ',
             |    ' ' || (SELECT replace(p, ' ', '') FROM m2) || ' ') AS sym, n FROM w1),
             |p3 AS (SELECT l[i] || ' ' || l[i+1] AS p, sum(n) AS cnt FROM (
             |    SELECT l, n, unnest(range(1, len(l))) AS i FROM (
             |      SELECT string_split(trim(sym), ' ') AS l, n FROM w2))
             |  GROUP BY 1),
             |m3 AS MATERIALIZED (SELECT p, cnt FROM p3 ORDER BY cnt DESC, p LIMIT 1)
             |SELECT * FROM (
             |  SELECT CAST(1 AS INTEGER) AS step, p AS pair,
             |    CAST(cnt AS BIGINT) AS n_occurrences FROM m1
             |  UNION ALL SELECT CAST(2 AS INTEGER), p, CAST(cnt AS BIGINT) FROM m2
             |  UNION ALL SELECT CAST(3 AS INTEGER), p, CAST(cnt AS BIGINT) FROM m3)
             |ORDER BY step""".stripMargin)),

    // The trained merges APPLIED — tokenizer evaluation: after q201's
    // three rounds, total token count and the compression ratio
    // (per-myriad integer division, fp-free). Computed at VOCABULARY
    // grain (the final per-word symbol strings × corpus frequency),
    // which equals the corpus totals for alphabetic tokens without a
    // second corpus pass. The oracle extends q201's CTE chain one
    // stage (apply merge 3) and re-derives the totals.
    QueryDef("q202_bpe_apply",
      (s, d) => {
        val (_, words) = TextAnalysis.bpeMerges(
          Tpch.table(s, d, "documents"), "text", rounds = 3)
        words.select(col("n"),
            length(regexp_replace(col("sym"), " ", "")).as("chars"),
            size(split(trim(col("sym")), " ")).as("toks"))
          .agg(sum(col("n")).cast("long").as("n_words"),
            sum(col("n") * col("chars")).cast("long").as("tokens_before"),
            sum(col("n") * col("toks")).cast("long").as("tokens_after"))
          .withColumn("compression_pm",
            expr("tokens_after * 10000 div tokens_before"))
      },
      Some("""WITH w0 AS MATERIALIZED (
             |  SELECT ' ' || regexp_replace(w, '(.)', '\1 ', 'g') AS sym,
             |    count(*) AS n
             |  FROM (SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
             |        FROM documents)
             |  WHERE length(w) > 0 GROUP BY 1),
             |p1 AS (SELECT l[i] || ' ' || l[i+1] AS p, sum(n) AS cnt FROM (
             |    SELECT l, n, unnest(range(1, len(l))) AS i FROM (
             |      SELECT string_split(trim(sym), ' ') AS l, n FROM w0))
             |  GROUP BY 1),
             |m1 AS MATERIALIZED (SELECT p, cnt FROM p1 ORDER BY cnt DESC, p LIMIT 1),
             |w1 AS MATERIALIZED (SELECT replace(sym,
             |    ' ' || (SELECT p FROM m1) || ' ',
             |    ' ' || (SELECT replace(p, ' ', '') FROM m1) || ' ') AS sym, n FROM w0),
             |p2 AS (SELECT l[i] || ' ' || l[i+1] AS p, sum(n) AS cnt FROM (
             |    SELECT l, n, unnest(range(1, len(l))) AS i FROM (
             |      SELECT string_split(trim(sym), ' ') AS l, n FROM w1))
             |  GROUP BY 1),
             |m2 AS MATERIALIZED (SELECT p, cnt FROM p2 ORDER BY cnt DESC, p LIMIT 1),
             |w2 AS MATERIALIZED (SELECT replace(sym,
             |    ' ' || (SELECT p FROM m2) || ' ',
             |    ' ' || (SELECT replace(p, ' ', '') FROM m2) || ' ') AS sym, n FROM w1),
             |p3 AS (SELECT l[i] || ' ' || l[i+1] AS p, sum(n) AS cnt FROM (
             |    SELECT l, n, unnest(range(1, len(l))) AS i FROM (
             |      SELECT string_split(trim(sym), ' ') AS l, n FROM w2))
             |  GROUP BY 1),
             |m3 AS MATERIALIZED (SELECT p, cnt FROM p3 ORDER BY cnt DESC, p LIMIT 1),
             |w3 AS MATERIALIZED (SELECT replace(sym,
             |    ' ' || (SELECT p FROM m3) || ' ',
             |    ' ' || (SELECT replace(p, ' ', '') FROM m3) || ' ') AS sym, n FROM w2)
             |SELECT n_words, tokens_before, tokens_after,
             |  tokens_after * 10000 // tokens_before AS compression_pm
             |FROM (SELECT CAST(sum(n) AS BIGINT) AS n_words,
             |    CAST(sum(n * length(replace(sym, ' ', ''))) AS BIGINT) AS tokens_before,
             |    CAST(sum(n * len(string_split(trim(sym), ' '))) AS BIGINT) AS tokens_after
             |  FROM w3)""".stripMargin)),

    // Distribution drift between two corpus populations (sources
    // src0-src9 as "yesterday's crawl" vs src10+ as "today's") — the
    // data-quality gate between snapshots. Bin edges are FIXED-WIDTH
    // over the union's exact [min, max], not quantile sketches, so the
    // metric is deterministic under any re-partitioning (a flapping
    // gate is no gate; see Drift.scala design notes). PSI/JS leave as
    // round-half-up ppm BIGINTs (absorbing last-ulp ln differences);
    // the oracle mirrors the expression tree operation for operation.
    QueryDef("q203_drift_psi",
      (s, d) => {
        val docs = Tpch.table(s, d, "documents")
        val isA = expr("cast(substring(source, 4) as int) < 10")
        graft.operators.Drift.numericDrift(
          docs.filter(isA), docs.filter(!isA), "n_chars", nBins = 12)
      },
      Some(s"""WITH u AS (SELECT CAST(n_chars AS DOUBLE) AS v,
             |    CASE WHEN CAST(substr(source, 4) AS INTEGER) < 10
             |         THEN 'a' ELSE 'b' END AS side FROM documents),
             |${OracleFragments.driftSummarySql(12)}""".stripMargin)),

    // Embedding-space drift: the same gate over a VECTOR corpus. The
    // monitored feature is the per-row L2 norm — computed as the same
    // ordered left-to-right fold in both engines (float elements cast
    // to double element-wise, squared, summed in list order, sqrt), so
    // the doubles entering the binning are bit-identical. Populations
    // split by label parity.
    QueryDef("q206_drift_embed",
      (s, d) => {
        val emb = Tpch.table(s, d, "embeddings")
          .withColumn("v", sqrt(aggregate(col("embedding"), lit(0.0d),
            (acc, x) => acc + x.cast("double") * x.cast("double"))))
        val isA = col("label") % 2 === 0
        graft.operators.Drift.numericDrift(
          emb.filter(isA), emb.filter(!isA), "v", nBins = 16)
      },
      Some(s"""WITH u AS (SELECT
             |    sqrt(list_sum(list_transform(embedding,
             |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS v,
             |    CASE WHEN label % 2 = 0 THEN 'a' ELSE 'b' END AS side
             |  FROM embeddings),
             |${OracleFragments.driftSummarySql(16)}""".stripMargin)),

    // Categorical drift (language mix) between the same two
    // populations — all-integer ppm by integer division, so the row
    // set hash-compares exactly with no rounding concerns at all.
    QueryDef("q204_drift_lang",
      (s, d) => {
        val docs = Tpch.table(s, d, "documents")
        val isA = expr("cast(substring(source, 4) as int) < 10")
        graft.operators.Drift.categoricalDrift(
            docs.filter(isA), docs.filter(!isA), "lang")
          .withColumnRenamed("key", "lang")
          .orderBy("lang")
      },
      Some("""WITH u AS (SELECT lang AS key,
             |    CASE WHEN CAST(substr(source, 4) AS INTEGER) < 10
             |         THEN 'a' ELSE 'b' END AS side FROM documents),
             |c AS (SELECT key,
             |    CAST(sum(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
             |    CAST(sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS c_b
             |  FROM u GROUP BY 1),
             |t AS (SELECT CAST(sum(c_a) AS BIGINT) AS n_a,
             |    CAST(sum(c_b) AS BIGINT) AS n_b FROM c)
             |SELECT key AS lang, c_a, c_b,
             |  CAST((c_a * 1000000) // greatest(n_a, 1) AS BIGINT) AS p_a_ppm,
             |  CAST((c_b * 1000000) // greatest(n_b, 1) AS BIGINT) AS p_b_ppm,
             |  CAST(abs((c_a * 1000000) // greatest(n_a, 1)
             |    - (c_b * 1000000) // greatest(n_b, 1)) AS BIGINT) AS dp_ppm
             |FROM c CROSS JOIN t ORDER BY lang""".stripMargin)),

    // STRATIFIED drift — the per-language monitor rows a production
    // gate actually reports (an aggregate PSI can read flat while one
    // language collapses): q203's crawl-vs-crawl populations, one
    // summary row per lang with per-stratum union edges. Every join is
    // EQUI on the group key (no scalar crosses); bins materialize per
    // group via a generate, not a cross join.
    QueryDef("q214_drift_by_lang",
      (s, d) => {
        val docs = Tpch.table(s, d, "documents")
        val isA = expr("cast(substring(source, 4) as int) < 10")
        graft.operators.Drift.groupedNumericDrift(
            docs.filter(isA), docs.filter(!isA), "lang", "n_chars", nBins = 12)
          .withColumnRenamed("g", "lang")
          .orderBy("lang")
      },
      Some(s"""WITH u AS (SELECT lang AS g, CAST(n_chars AS DOUBLE) AS v,
             |    CASE WHEN CAST(substr(source, 4) AS INTEGER) < 10
             |         THEN 'a' ELSE 'b' END AS side FROM documents),
             |${OracleFragments.driftGroupedSql(12)}
             |SELECT g AS lang, n_a, n_b, psi_ppm, js_ppm, tvd_ppm
             |FROM gp ORDER BY lang""".stripMargin)),

    // Distributed quality-classifier TRAINING: distill the q97 rule
    // gate into a linear model with a batch perceptron over the
    // threshold-indicator basis — pure integer math end to end
    // (sign-test predictions, {-1,0,1} errors, exact Σ err·x updates),
    // so the trained weights hash-compare across engines. Training
    // runs on the deterministic md5-bucket SAMPLE (gateTrainFrac),
    // materialized once: the corpus is scanned a single time and each
    // round is ONE map-side-combined aggregation over sample-sized
    // state; only d+2 longs reach the driver; weights return as plan
    // literals. The oracle restates the same slice (a pure function of
    // doc ids) and unrolls all 16 rounds as CTE stages (q201's
    // BPE-unroll technique).
    QueryDef("q208_train_gate",
      (s, d) => graft.operators.Classify.perceptronTrain(
        gateFeatures(Tpch.table(s, d, "documents")),
        gateFeatureCols, "y", rounds = gateRounds, sample = gateSample)
        .orderBy("iter"),
      Some(s"""WITH ${OracleFragments.tokenStatsCte},
             |${OracleFragments.classifierFeaturesCte(gateBasis)},
             |${OracleFragments.classifierTrainSliceCte(gateTrainFrac)},
             |${OracleFragments.perceptronRoundsCte(gateRounds, gateFeatureCols, from = "ftr")}
             |${OracleFragments.perceptronRoundsSelect(gateRounds, gateFeatureCols)}""".stripMargin)),

    // Scoring the corpus with the trained POCKET model (the
    // best-evaluated weights across q208's rounds — monotone in
    // rounds even where the full-batch perceptron cycles): per-doc
    // margin + verdict + agreement with the rule gate it distilled,
    // on a deterministic id sample. The only driver-side values are
    // the d+1 pocket weights; scoring itself is a pure column
    // expression over one scan.
    QueryDef("q209_score_gate",
      (s, d) => {
        val feats = gateFeatures(Tpch.table(s, d, "documents"))
        val trained = graft.operators.Classify.perceptronTrain(
          feats, gateFeatureCols, "y", rounds = gateRounds, sample = gateSample)
        val w = graft.operators.Classify.pocketWeights(trained, gateFeatureCols)
        graft.operators.Classify.score(feats, w, gateFeatureCols)
          .filter(col("doc_id") % 17 === 0)
          .select(col("doc_id"), col("margin"), col("pred"), col("y"),
            (col("pred") === col("y")).as("agree"))
          .orderBy("doc_id")
      },
      Some(s"""WITH ${OracleFragments.tokenStatsCte},
             |${OracleFragments.classifierFeaturesCte(gateBasis)},
             |${OracleFragments.classifierTrainSliceCte(gateTrainFrac)},
             |${OracleFragments.perceptronRoundsCte(gateRounds, gateFeatureCols, from = "ftr")},
             |${OracleFragments.perceptronPocketCte(gateRounds, gateFeatureCols)}
             |SELECT doc_id, margin, pred, y, pred = y AS agree FROM (
             |  SELECT f.doc_id, f.y,
             |    CAST(${pocketMarginSql} AS BIGINT) AS margin,
             |    CAST(CASE WHEN ${pocketMarginSql} > 0 THEN 1 ELSE 0 END AS BIGINT) AS pred
             |  FROM f CROSS JOIN pk)
             |WHERE doc_id % 17 = 0 ORDER BY doc_id""".stripMargin)),

    // Model evaluation closing the training tier (train q208 → score
    // q209 → evaluate): confusion counts over the WHOLE corpus plus
    // accuracy/precision/recall/F1 as exact integer-division ppm (F1
    // derived from the ppm integers, zero denominators guarded to 0).
    // One aggregation; one output row at any corpus size.
    QueryDef("q210_eval_gate",
      (s, d) => {
        val feats = gateFeatures(Tpch.table(s, d, "documents"))
        val trained = graft.operators.Classify.perceptronTrain(
          feats, gateFeatureCols, "y", rounds = gateRounds, sample = gateSample)
        val w = graft.operators.Classify.pocketWeights(trained, gateFeatureCols)
        graft.operators.Classify.confusion(
          graft.operators.Classify.score(feats, w, gateFeatureCols))
      },
      Some(s"""WITH ${OracleFragments.tokenStatsCte},
             |${OracleFragments.classifierFeaturesCte(gateBasis)},
             |${OracleFragments.classifierTrainSliceCte(gateTrainFrac)},
             |${OracleFragments.perceptronRoundsCte(gateRounds, gateFeatureCols, from = "ftr")},
             |${OracleFragments.perceptronPocketCte(gateRounds, gateFeatureCols)},
             |sc AS (SELECT y,
             |    CASE WHEN ${pocketMarginSql} > 0 THEN 1 ELSE 0 END AS pred
             |  FROM f CROSS JOIN pk),
             |c AS (SELECT
             |    CAST(sum(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             |    CAST(sum(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             |    CAST(sum(CASE WHEN y = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
             |    CAST(sum(CASE WHEN y = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn
             |  FROM sc),
             |m AS (SELECT tp, fp, tn, fn,
             |    CAST(((tp + tn) * 1000000) // greatest(tp + fp + tn + fn, 1) AS BIGINT) AS accuracy_ppm,
             |    CAST((tp * 1000000) // greatest(tp + fp, 1) AS BIGINT) AS precision_ppm,
             |    CAST((tp * 1000000) // greatest(tp + fn, 1) AS BIGINT) AS recall_ppm
             |  FROM c)
             |SELECT tp, fp, tn, fn, accuracy_ppm, precision_ppm, recall_ppm,
             |  CAST((2 * precision_ppm * recall_ppm) // greatest(precision_ppm + recall_ppm, 1) AS BIGINT) AS f1_ppm
             |FROM m""".stripMargin)),

    // Classifier-GUIDED soft curation closing the loop (train q208 →
    // score → sample): instead of a hard gate, each doc keeps with
    // probability proportional to its quality margin — clamped to
    // [0,1000] per-mille — realized DETERMINISTICALLY by the md5
    // bucket of its id (the q77 split hash), so the kept set is a
    // pure function of the data: any engine, partitioning, or
    // backfill re-derives it. High-margin docs always survive,
    // boundary docs thin out proportionally, junk drops to zero.
    QueryDef("q211_soft_curate",
      (s, d) => {
        val feats = gateFeatures(Tpch.table(s, d, "documents"))
        val trained = graft.operators.Classify.perceptronTrain(
          feats, gateFeatureCols, "y", rounds = gateRounds, sample = gateSample)
        val w = graft.operators.Classify.pocketWeights(trained, gateFeatureCols)
        graft.operators.Classify.score(feats, w, gateFeatureCols)
          .withColumn("keep_permille",
            least(lit(1000L), greatest(lit(0L), lit(500L) + col("margin"))))
          .filter(graft.operators.Sampling.hashBucket(col("doc_id"), 1000)
            < col("keep_permille"))
          .select("doc_id", "margin", "keep_permille")
          .orderBy("doc_id")
      },
      Some(s"""WITH ${OracleFragments.tokenStatsCte},
             |${OracleFragments.classifierFeaturesCte(gateBasis)},
             |${OracleFragments.classifierTrainSliceCte(gateTrainFrac)},
             |${OracleFragments.perceptronRoundsCte(gateRounds, gateFeatureCols, from = "ftr")},
             |${OracleFragments.perceptronPocketCte(gateRounds, gateFeatureCols)}
             |SELECT doc_id, margin, keep_permille FROM (
             |  SELECT doc_id, margin,
             |    least(1000, greatest(0, 500 + margin)) AS keep_permille
             |  FROM (SELECT f.doc_id,
             |      CAST(${pocketMarginSql} AS BIGINT) AS margin
             |    FROM f CROSS JOIN pk))
             |WHERE ${OracleFragments.md5Bucket("doc_id")} < keep_permille
             |ORDER BY doc_id""".stripMargin)),

    QueryDef("q104_dup_spans",
      // exact substring-duplication load per document (the
      // suffix-array window-dedup statistic): every 8-token window
      // that occurs more than once anywhere in the corpus marks its
      // position duplicated. Windows reduce to md5 digests map-side;
      // the oracle re-derives the same counts from the window TEXT, so
      // a hash match also certifies the digest path collision-free on
      // this corpus. Ratio is per-myriad integer — bit-exact
      (s, d) => Dedup.dupSpans(Tpch.table(s, d, "documents"),
          "doc_id", "text", k = 8)
        .orderBy("doc_id"),
      Some("""WITH d0 AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
             |    ELSE string_split_regex(trim(text), '\s+') END AS tk FROM documents),
             |w AS (SELECT doc_id, array_to_string(tk[i:i+7], ' ') AS win
             |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 7)) AS i
             |        FROM d0 WHERE len(tk) >= 8)),
             |tot AS (SELECT win, count(*) AS total FROM w GROUP BY 1),
             |dup AS (SELECT doc_id, count(*) AS n_dup FROM w JOIN tot USING (win)
             |        WHERE total > 1 GROUP BY 1)
             |SELECT d0.doc_id,
             |  CAST(greatest(len(tk) - 7, 0) AS BIGINT) AS n_windows,
             |  CAST(coalesce(n_dup, 0) AS BIGINT) AS n_dup_windows,
             |  CAST(coalesce(n_dup, 0) * 10000 // greatest(len(tk) - 7, 1) AS BIGINT) AS dup_pm
             |FROM d0 LEFT JOIN dup USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    QueryDef("q107_bigram_lm",
      // count-based bigram LM scoring (the CCNet perplexity-filter
      // shape): train add-one-smoothed bigram stats on the 'train'
      // hash-split slice, score every 'test' doc's fluency in integer
      // parts-per-million. The split is the same md5 bucketing as
      // q77/q79, restated in the oracle
      (s, d) => {
        val docs = Tpch.table(s, d, "documents").withColumn("split",
          Sampling.hashSplit(col("doc_id"), Seq("train" -> 0.9, "val" -> 0.05),
            rest = "test"))
        TextAnalysis.bigramLmScore(
          docs.filter(col("split") === "train"),
          docs.filter(col("split") === "test"),
          "doc_id", "text")
          .orderBy("doc_id")
      },
      Some("""WITH s AS (SELECT doc_id, text,
             |    CASE WHEN b < 900 THEN 'train' WHEN b < 950 THEN 'val' ELSE 'test' END AS split
             |  FROM (SELECT doc_id, text,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 AS b
             |    FROM documents)),
             |t0 AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
             |    ELSE string_split_regex(trim(lower(text)), '\s+') END AS tk, split FROM s),
             |c1 AS (SELECT w, count(*) AS c1
             |  FROM (SELECT unnest(tk) AS w FROM t0 WHERE split = 'train') GROUP BY 1),
             |c2 AS (SELECT w1, w2, count(*) AS c2 FROM (
             |    SELECT tk[i] AS w1, tk[i+1] AS w2
             |    FROM (SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i
             |          FROM t0 WHERE split = 'train' AND len(tk) >= 2))
             |  GROUP BY 1, 2),
             |v AS (SELECT count(*) AS v FROM c1),
             |teb AS (SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
             |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i
             |        FROM t0 WHERE split = 'test' AND len(tk) >= 2)),
             |p AS (SELECT doc_id,
             |    ((coalesce(c2.c2, 0) + 1) * 1000000) // greatest(coalesce(c1.c1, 0) + v.v, 1) AS p_ppm
             |  FROM teb LEFT JOIN c2 USING (w1, w2)
             |    LEFT JOIN c1 ON teb.w1 = c1.w CROSS JOIN v)
             |SELECT doc_id, count(*) AS n_bigrams,
             |  CAST(sum(p_ppm) // count(*) AS BIGINT) AS score_ppm
             |FROM p GROUP BY 1 ORDER BY doc_id""".stripMargin)),

    QueryDef("q110_curate",
      // the end-to-end curation pass a training run starts from, as ONE
      // declarative query: quality gate (q97's bitmask rules) → exact
      // dedup (min-id representative per content hash, q54's discipline)
      // → deterministic split keyed by the representative id (q77) →
      // per-doc token budget. Every stage is individually oracle-checked
      // elsewhere; this row pins their COMPOSITION — the thing a user
      // actually runs. All-integer arithmetic end to end
      (s, d) => graft.operators.Curate(Tpch.table(s, d, "documents"),
          "doc_id", "text")
        .orderBy("doc_id"),
      // the oracle composes OracleFragments exactly as the Scala side
      // composes Curate — one definition of gate/dedup/split, shared
      // with every downstream flagship (q114/q117/q191/q192/q193)
      Some(s"WITH ${OracleFragments.curatePrefix}\n" +
        OracleFragments.curatedSelect())),

    QueryDef("q114_curate_neardup",
      // the q110 curation chain COMPOSED with near-dup dedup (the
      // VERDICT's "what a real pipeline runs"): q76's LSH clustering
      // supplies the keep-list (min-id representative per near-dup
      // family at jaccard >= 0.5), applied after the exact-hash tier —
      // a near-dup twin that survives gating and exact dedup is still
      // dropped. Oracle = q110's chain joined against q76's exhaustive
      // recursive-CTE truth
      (s, d) => {
        val docs = Tpch.table(s, d, "documents")
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
          k = 3, numHashes = 24, bands = 8, threshold = 0.5,
          sigs = Some(docSignatures(s, d, 3, 24)))
        val comps = GraphAnalytics.connectedComponents(
          pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
          docs.select(col("doc_id").as("id")))
        val keep = comps.filter(col("id") === col("component"))
          .select(col("id").as("doc_id"))
        graft.operators.Curate(docs, "doc_id", "text",
            nearDupKeep = Some(keep))
          .orderBy("doc_id")
      },
      // curate prefix shared via OracleFragments; only the near-dup
      // keep-list CTEs (exhaustive LSH truth) are row-specific
      Some(s"""WITH RECURSIVE ${OracleFragments.curatePrefix},
           |s AS ($shingleSql),
           |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM s a JOIN s b ON a.doc_id < b.doc_id
           |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
           |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
           |e AS (SELECT id_a AS a, id_b AS b FROM p
           |  UNION ALL SELECT id_b, id_a FROM p),
           |reach(id, rr) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT e.a, reach.rr FROM e JOIN reach ON reach.id = e.b),
           |nk AS (SELECT id AS doc_id FROM reach GROUP BY id HAVING id = min(rr))
           |${OracleFragments.curatedSelect(" JOIN nk USING (doc_id)")}""".stripMargin)),

    QueryDef("q117_curate_semantic",
      // the q110 curation chain COMPOSED with EMBEDDING-space semantic
      // dedup (the SemDeDup pipeline proper — q114 composes the
      // jaccard/text tier, this composes the vector tier): every 97th
      // vector adopts its successor's embedding (bit-identical copy —
      // no float arithmetic at all), so {x, x+1} are exact semantic
      // twins among REAL doc ids; semanticDedup keeps the min-id rep
      // and the curated set drops the twin. The keep-list is applied as
      // the complement of the DROPPED ids, so documents with no
      // embedding row (sf0.1 has 5k docs but 2k vectors) pass through
      // instead of vanishing on the semi-join
      (s, d) => {
        val docs = Tpch.table(s, d, "documents")
        val emb = Tpch.table(s, d, "embeddings").select("vec_id", "embedding")
        val donor = emb.select((col("vec_id") - 1).as("vec_id"),
          col("embedding").as("__succ"))
        val emb2 = emb.join(donor, Seq("vec_id"), "left")
          .select(col("vec_id"),
            when(col("vec_id") % 97 === 0 && col("__succ").isNotNull,
              col("__succ")).otherwise(col("embedding")).as("embedding"))
        val dropped = Similarity.semanticDedup(emb2, "vec_id", "embedding",
            threshold = 0.999)
          .filter(!col("keep")).select(col("vec_id").as("doc_id"))
        val keep = docs.select("doc_id").join(dropped, Seq("doc_id"), "left_anti")
        graft.operators.Curate(docs, "doc_id", "text",
            nearDupKeep = Some(keep))
          .orderBy("doc_id")
      },
      // curate prefix shared via OracleFragments; only the semantic
      // keep-list CTEs (exhaustive cosine truth) are row-specific
      Some {
        s"""WITH RECURSIVE ${OracleFragments.curatePrefix},
           |emb2 AS (SELECT a.vec_id,
           |    CASE WHEN a.vec_id % 97 = 0 AND b.vec_id IS NOT NULL
           |      THEN b.embedding ELSE a.embedding END AS embedding
           |  FROM embeddings a LEFT JOIN embeddings b ON b.vec_id = a.vec_id + 1),
           |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
           |  FROM emb2 a JOIN emb2 b ON a.vec_id < b.vec_id
           |  WHERE round(
           |    list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
           |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') /
           |    (sqrt(list_aggregate(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum')) *
           |     sqrt(list_aggregate(list_transform(b.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum'))), 6) >= 0.999),
           |e AS (SELECT id_a AS a, id_b AS b FROM p
           |  UNION ALL SELECT id_b, id_a FROM p),
           |reach(id, rr) AS (
           |  SELECT vec_id, vec_id FROM emb2
           |  UNION
           |  SELECT e.a, reach.rr FROM e JOIN reach ON reach.id = e.b),
           |dk AS (SELECT id FROM reach GROUP BY id HAVING id <> min(rr))
           |${OracleFragments.curatedSelect("\nWHERE g.doc_id NOT IN (SELECT id FROM dk)")}""".stripMargin
      }),

    QueryDef("q192_curate_mix",
      // the END-TO-END training-mix flagship: the q110 curation chain
      // (gate → exact dedup → split) feeding the mixing tier — train
      // docs only, per-source quota cap (q93's md5-rank determinism,
      // quota 30), then epoch-weighted repetition (q94's arithmetic:
      // src0 2.5 epochs, src1 0.4, everything else 1). One declarative
      // frame from raw corpus to the realized training stream; every
      // stage is individually oracle-checked elsewhere, this row pins
      // the full composition a data team actually ships
      (s, d) => {
        val docs = Tpch.table(s, d, "documents")
        val train = graft.operators.Curate(docs, "doc_id", "text")
          .filter(col("split") === "train")
          .join(docs.select("doc_id", "source"), Seq("doc_id"))
        val capped = Sampling.quotaCap(train, Seq(col("source")),
          col("doc_id"), quota = 30)
        Sampling.epochMix(capped, col("source"), col("doc_id"),
            Map("src0" -> 2.5, "src1" -> 0.4))
          .select(col("doc_id"), col("source"), col("n_tokens"), col("copy_idx"))
          .orderBy("doc_id", "copy_idx")
      },
      // the oracle composes OracleFragments (curate prefix + quota
      // rank + epoch predicate) exactly as the Scala side composes
      // Curate → quotaCap → epochMix
      Some(s"""WITH ${OracleFragments.curatePrefix},
           |${OracleFragments.quotaRankCtes}
           |SELECT k.doc_id, k.source, k.n_tokens, r2.range AS copy_idx
           |FROM k, range(3) r2
           |WHERE k.rk <= 30 AND ${OracleFragments.epochCopyPredicate}
           |ORDER BY doc_id, copy_idx""".stripMargin)),

    QueryDef("q193_mix_pack",
      // q192's realized training stream PACKED into fixed-length
      // sequences (seqLen 512) — the final pre-training step: each
      // (doc, copy) keys as doc_id·4 + copy_idx (≤ 3 copies, so the
      // key is dense and order-preserving), the distributed bucketed
      // prefix sum assigns every stream element its global token
      // offset, and sequence spans fall out arithmetically. Raw corpus
      // → gate → dedup → split → quota → epoch mix → packed sequences,
      // one declarative frame end to end; the oracle restates the
      // whole chain plus the single-window prefix-sum definition
      (s, d) => {
        val docs = Tpch.table(s, d, "documents")
        val train = graft.operators.Curate(docs, "doc_id", "text")
          .filter(col("split") === "train")
          .join(docs.select("doc_id", "source"), Seq("doc_id"))
        val mixed = Sampling.epochMix(
          Sampling.quotaCap(train, Seq(col("source")), col("doc_id"), quota = 30),
          col("source"), col("doc_id"), Map("src0" -> 2.5, "src1" -> 0.4))
        val keyed = mixed.select(
          (col("doc_id") * 4 + col("copy_idx")).as("pack_id"), col("n_tokens"))
        Packing.concatChunk(keyed, "pack_id", col("n_tokens"), seqLen = 512)
          .orderBy("pack_id")
      },
      // q192's composed oracle plus the single-window prefix-sum
      // definition; all shared stages come from OracleFragments
      Some {
        s"""WITH ${OracleFragments.curatePrefix},
           |${OracleFragments.quotaRankCtes},
           |m AS (SELECT k.doc_id * 4 + r2.range AS pack_id, k.n_tokens
           |  FROM k, range(3) r2
           |  WHERE k.rk <= 30 AND ${OracleFragments.epochCopyPredicate}),
           |p AS (SELECT pack_id, n_tokens,
           |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY pack_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
           |  FROM m)
           |SELECT pack_id, n_tokens, start_offset,
           |  start_offset // 512 AS first_seq,
           |  CASE WHEN n_tokens > 0
           |    THEN (start_offset + n_tokens - 1) // 512 - start_offset // 512 + 1
           |    ELSE 0 END AS n_seqs
           |FROM p ORDER BY pack_id""".stripMargin
      }),

    QueryDef("q219_curate_audit",
      // the curation chain's PROVENANCE view: one row per raw-corpus
      // document with what the pipeline did to it and why — gate
      // bitmask, exact-dup class representative, final status, split.
      // "Why did doc X disappear from the training set?" answered by
      // ONE declarative frame (the same gate scan + hash aggregation
      // q110 pays, joins widened to LEFT), not a re-run with printf.
      // Dropped docs' dup_of/split coalesce to sentinels (-1 /
      // 'dropped') so the driver's stringified hash never compares
      // engine-specific null renderings
      (s, d) => graft.operators.Curate.audit(
          Tpch.table(s, d, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("reasons"),
          coalesce(col("dup_of"), lit(-1L)).as("dup_of"), col("status"),
          coalesce(col("split"), lit("dropped")).as("split"),
          col("n_tokens"))
        .orderBy("doc_id"),
      Some(s"""WITH ${OracleFragments.tokenStatsCte},
           |a AS (SELECT doc_id, text, n_tokens,
           |    CAST(${OracleFragments.gateMaskSql} AS BIGINT) AS reasons
           |  FROM q),
           |reps AS (SELECT md5(text) AS h, min(doc_id) AS rep
           |  FROM a WHERE reasons = 0 GROUP BY 1),
           |j AS (SELECT a.doc_id, a.reasons, a.n_tokens, r.rep AS dup_of
           |  FROM a LEFT JOIN reps r ON a.reasons = 0 AND md5(a.text) = r.h)
           |SELECT doc_id, reasons, coalesce(dup_of, -1) AS dup_of,
           |  CASE WHEN reasons <> 0 THEN 'gate'
           |       WHEN dup_of <> doc_id THEN 'exact_dup'
           |       ELSE 'kept' END AS status,
           |  CASE WHEN reasons = 0 AND dup_of = doc_id
           |    THEN ${OracleFragments.splitExpr("doc_id")}
           |    ELSE 'dropped' END AS split,
           |  n_tokens
           |FROM j ORDER BY doc_id""".stripMargin)),

    QueryDef("q221_dsir_select",
      // DSIR data selection (importance resampling toward a target
      // distribution, Xie et al. 2023): hashed unigram+bigram buckets,
      // add-one-smoothed target/raw ratio per bucket in exact integer
      // ppm (driver BigInt over the ≤4096-row model ≡ oracle HUGEINT),
      // per-doc score = integer mean of its features' ratios, selection
      // realized deterministically by the q211 md5-bucket gate. Target
      // = the gate-clean 'val' split (the held-out quality sample a
      // real run would curate by hand)
      (s, d) => {
        val docs = Tpch.table(s, d, "documents")
        // gate + split are row-local predicates: filter the corpus at
        // the scan instead of deriving ids and joining the corpus back
        // to itself (r16: one shuffle join removed — guide §2.4)
        val target = docs
          .filter(TextAnalysis.gateKeep(col("text")))
          .filter(Sampling.hashSplit(col("doc_id"),
            Seq("train" -> 0.9, "val" -> 0.05), rest = "test") === "val")
        TextAnalysis.dsirScore(docs, target, "doc_id", "text")
          .withColumn("keep_permille",
            least(lit(1000L), expr("dsir_ppm div 1000")))
          .withColumn("kept",
            Sampling.hashBucket(col("doc_id"), 1000) < col("keep_permille"))
          .orderBy("doc_id")
      },
      Some(s"""WITH ${OracleFragments.tokenStatsCte},
           |${OracleFragments.gateCte},
           |tgt AS (SELECT doc_id FROM g
           |  WHERE ${OracleFragments.md5Bucket("doc_id")} >= 900
           |    AND ${OracleFragments.md5Bucket("doc_id")} < 950),
           |t0 AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
           |    ELSE string_split_regex(trim(lower(text)), '\\s+') END AS tk
           |  FROM documents),
           |fr AS (SELECT doc_id,
           |    ('0x' || substr(md5(f), 1, 8))::BIGINT % 4096 AS bucket
           |  FROM (SELECT doc_id, unnest(tk) AS f FROM t0
           |        UNION ALL
           |        SELECT doc_id, tk[i] || ' ' || tk[i+1] AS f
           |        FROM (SELECT doc_id, tk,
           |                unnest(generate_series(1, len(tk) - 1)) AS i
           |              FROM t0 WHERE len(tk) >= 2))),
           |ct AS (SELECT bucket, count(*) AS c_tgt
           |  FROM fr JOIN tgt USING (doc_id) GROUP BY 1),
           |cr AS (SELECT bucket, count(*) AS c_raw FROM fr GROUP BY 1),
           |cc AS (SELECT bucket, coalesce(c_tgt, 0) AS c_tgt,
           |    coalesce(c_raw, 0) AS c_raw
           |  FROM ct FULL JOIN cr USING (bucket)),
           |tot AS (SELECT coalesce(sum(c_tgt), 0) + 4096 AS n_tgt,
           |    coalesce(sum(c_raw), 0) + 4096 AS n_raw FROM cc),
           |w AS (SELECT bucket, CAST(least(
           |    ((CAST(c_tgt AS HUGEINT) + 1) * n_raw * 1000000)
           |      // ((CAST(c_raw AS HUGEINT) + 1) * n_tgt),
           |    1000000000) AS BIGINT) AS r_ppm
           |  FROM cc CROSS JOIN tot),
           |sc AS (SELECT doc_id, count(*) AS n_feats,
           |    CAST(sum(r_ppm) // count(*) AS BIGINT) AS dsir_ppm
           |  FROM fr JOIN w USING (bucket) GROUP BY 1)
           |SELECT doc_id, n_feats, dsir_ppm,
           |  least(1000, dsir_ppm // 1000) AS keep_permille,
           |  ${OracleFragments.md5Bucket("doc_id")} < least(1000, dsir_ppm // 1000)
           |    AS kept
           |FROM sc ORDER BY doc_id""".stripMargin)),

    QueryDef("q222_budget_plan",
      // token-budget mix planning: per-source keep fraction + realized
      // selection to hit a 30k-token budget at 50/30/15/5 weights. The
      // 5% share names a source the corpus doesn't have (srcX) — the
      // plan must REPORT the hole (avail 0, deficit = target, kept 0),
      // not silently drop it. All-integer arithmetic; the realized set
      // is the deterministic md5 gate, so both engines re-derive it
      (s, d) => Sampling.budgetPlan(Tpch.table(s, d, "documents"),
          col("source"), col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long"),
          Seq("src1" -> 500000L, "src2" -> 300000L, "src3" -> 150000L,
            "srcX" -> 50000L),
          budgetTokens = 30000L)
        .orderBy("source"),
      Some("""WITH d AS (SELECT doc_id, source,
           |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
           |      ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS t
           |  FROM documents),
           |w(source, weight_ppm) AS (VALUES ('src1', 500000),
           |  ('src2', 300000), ('src3', 150000), ('srcX', 50000)),
           |a AS (SELECT source, count(*) AS avail_docs,
           |    sum(t) AS avail_tokens FROM d GROUP BY 1),
           |p AS (SELECT source, CAST(weight_ppm AS BIGINT) AS weight_ppm,
           |    coalesce(avail_docs, 0) AS avail_docs,
           |    CAST(coalesce(avail_tokens, 0) AS BIGINT) AS avail_tokens,
           |    CAST((30000 * CAST(weight_ppm AS BIGINT)) // 1000000 AS BIGINT)
           |      AS target_tokens
           |  FROM w LEFT JOIN a USING (source)),
           |p2 AS (SELECT *,
           |    CAST(least(1000000, (target_tokens * 1000000)
           |      // greatest(avail_tokens, 1)) AS BIGINT) AS keep_ppm,
           |    greatest(0, target_tokens - avail_tokens) AS deficit_tokens
           |  FROM p),
           |k AS (SELECT source, count(*) AS kept_docs, sum(t) AS kept_tokens
           |  FROM d JOIN p2 USING (source)
           |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           |    % 1000000 < keep_ppm
           |  GROUP BY 1)
           |SELECT source, weight_ppm, avail_docs, avail_tokens,
           |  target_tokens, keep_ppm, deficit_tokens,
           |  coalesce(kept_docs, 0) AS kept_docs,
           |  CAST(coalesce(kept_tokens, 0) AS BIGINT) AS kept_tokens
           |FROM p2 LEFT JOIN k USING (source)
           |ORDER BY source""".stripMargin)),

    QueryDef("q224_decontaminated_mix",
      // the q192 training-mix flagship with the stage a REAL production
      // chain must not skip: benchmark decontamination between curation
      // and mixing. Raw corpus → gate → exact dedup → train split →
      // DROP docs whose 5-gram overlap with the held-out test slice
      // breaches 20% (q79's leakage check, eval grams broadcast) →
      // per-source quota → epoch-weighted repetition. At sf0.01 the
      // decontamination stage genuinely bites (3 train docs leak the
      // test slice and vanish from the mix)
      (s, d) => {
        val docs = Tpch.table(s, d, "documents")
        val train = graft.operators.Curate(docs, "doc_id", "text")
          .filter(col("split") === "train")
          .join(docs.select("doc_id", "source", "text"), Seq("doc_id"))
        val evalSlice = docs.filter(Sampling.hashSplit(col("doc_id"),
          Seq("train" -> 0.9, "val" -> 0.05), rest = "test") === "test")
        val flags = Decontaminate.evalOverlap(train, evalSlice,
          "doc_id", "text", n = 5, flagAtPct = 20)
        val clean = train.join(
          flags.filter(!col("contaminated")).select("doc_id"), Seq("doc_id"))
        val capped = Sampling.quotaCap(clean, Seq(col("source")),
          col("doc_id"), quota = 30)
        Sampling.epochMix(capped, col("source"), col("doc_id"),
            Map("src0" -> 2.5, "src1" -> 0.4))
          .select(col("doc_id"), col("source"), col("n_tokens"), col("copy_idx"))
          .orderBy("doc_id", "copy_idx")
      },
      // q192's composed oracle with the q79 leakage CTEs spliced
      // between the curated-train slice and the quota rank
      Some(s"""WITH ${OracleFragments.curatePrefix},
           |c AS (SELECT g.doc_id, g.text, g.n_tokens, d2.source
           |  FROM g JOIN r USING (doc_id) JOIN documents d2 USING (doc_id)
           |  WHERE ${OracleFragments.md5Bucket("g.doc_id")} < 900),
           |tg AS (SELECT doc_id, unnest(CASE WHEN len(tok) < 5
           |    THEN [array_to_string(tok, ' ')]
           |    ELSE list_distinct(list_transform(range(len(tok)-4),
           |      i -> array_to_string(tok[i+1:i+5], ' '))) END) AS gh
           |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tok
           |        FROM c)),
           |eg AS (SELECT DISTINCT unnest(CASE WHEN len(tok) < 5
           |    THEN [array_to_string(tok, ' ')]
           |    ELSE list_distinct(list_transform(range(len(tok)-4),
           |      i -> array_to_string(tok[i+1:i+5], ' '))) END) AS gh
           |  FROM (SELECT string_split_regex(trim(lower(text)), '\\s+') AS tok
           |        FROM documents
           |        WHERE ${OracleFragments.md5Bucket("doc_id")} >= 950)),
           |cl AS (SELECT tg.doc_id FROM tg LEFT JOIN eg ON tg.gh = eg.gh
           |  GROUP BY 1 HAVING count(eg.gh) * 100 < count(*) * 20),
           |k AS (SELECT doc_id, n_tokens, source, row_number() OVER (
           |    PARTITION BY source
           |    ORDER BY md5(CAST(doc_id AS VARCHAR)), CAST(doc_id AS VARCHAR)) AS rk
           |  FROM c JOIN cl USING (doc_id))
           |SELECT k.doc_id, k.source, k.n_tokens, r2.range AS copy_idx
           |FROM k, range(3) r2
           |WHERE k.rk <= 30 AND ${OracleFragments.epochCopyPredicate}
           |ORDER BY doc_id, copy_idx""".stripMargin)),

    QueryDef("q226_lm_curate_audit",
      // the q219 provenance audit with the per-source bigram-LM
      // fluency stage folded into the gate (the CCNet/Gopher
      // perplexity filter — the last classic LLM-curation stage, now
      // composed end-to-end): bit 16 of the reasons bitmask flags a
      // document whose q107-model fluency reads below 94% of its own
      // source's mean clean score, and "why did doc X disappear?"
      // answers "lm" exactly the way it answers "too short". The LM
      // trains on the corpus's own q97-clean slice; dedup
      // representatives compute over the shrunken survivor set, so a
      // low-fluency doc can never anchor a dedup class
      (s, d) => graft.operators.Curate.audit(
          Tpch.table(s, d, "documents"), "doc_id", "text",
          lmGate = Some(("source", 940000L)))
        .select(col("doc_id"), col("reasons"),
          coalesce(col("dup_of"), lit(-1L)).as("dup_of"), col("status"),
          coalesce(col("split"), lit("dropped")).as("split"),
          col("n_tokens"))
        .orderBy("doc_id"),
      Some(s"""WITH ${OracleFragments.tokenStatsCte},
           |a0 AS (SELECT doc_id, text, n_tokens,
           |    CAST(${OracleFragments.gateMaskSql} AS BIGINT) AS r97
           |  FROM q),
           |g0 AS (SELECT doc_id, text, n_tokens FROM a0 WHERE r97 = 0),
           |${OracleFragments.lmCtes(940000L, "g0")},
           |a AS (SELECT a0.doc_id, a0.text, a0.n_tokens,
           |    a0.r97 + CASE WHEN lml.lm_low THEN 16 ELSE 0 END AS reasons
           |  FROM a0 JOIN lml USING (doc_id)),
           |reps AS (SELECT md5(text) AS h, min(doc_id) AS rep
           |  FROM a WHERE reasons = 0 GROUP BY 1),
           |j AS (SELECT a.doc_id, a.reasons, a.n_tokens, r.rep AS dup_of
           |  FROM a LEFT JOIN reps r ON a.reasons = 0 AND md5(a.text) = r.h)
           |SELECT doc_id, reasons, coalesce(dup_of, -1) AS dup_of,
           |  CASE WHEN reasons <> 0 THEN 'gate'
           |       WHEN dup_of <> doc_id THEN 'exact_dup'
           |       ELSE 'kept' END AS status,
           |  CASE WHEN reasons = 0 AND dup_of = doc_id
           |    THEN ${OracleFragments.splitExpr("doc_id")}
           |    ELSE 'dropped' END AS split,
           |  n_tokens
           |FROM j ORDER BY doc_id""".stripMargin)),

    QueryDef("q227_lm_curate_mix",
      // the q192 training-mix flagship with the LM fluency gate in the
      // chain: raw corpus → q97 gate → per-source LM perplexity gate
      // (q107's model trained on the clean slice, relPpm 940000) →
      // exact dedup → train split → quota 30 → epoch mix. The oracle
      // composes the LM-gated curate prefix with the UNCHANGED quota/
      // epoch fragments — the same one-definition discipline as q192
      (s, d) => {
        val docs = Tpch.table(s, d, "documents")
        val train = graft.operators.Curate(docs, "doc_id", "text",
            lmGate = Some(("source", 940000L)))
          .filter(col("split") === "train")
          .join(docs.select("doc_id", "source"), Seq("doc_id"))
        val capped = Sampling.quotaCap(train, Seq(col("source")),
          col("doc_id"), quota = 30)
        Sampling.epochMix(capped, col("source"), col("doc_id"),
            Map("src0" -> 2.5, "src1" -> 0.4))
          .select(col("doc_id"), col("source"), col("n_tokens"), col("copy_idx"))
          .orderBy("doc_id", "copy_idx")
      },
      Some(s"""WITH ${OracleFragments.lmCuratePrefix(940000L)},
           |${OracleFragments.quotaRankCtes}
           |SELECT k.doc_id, k.source, k.n_tokens, r2.range AS copy_idx
           |FROM k, range(3) r2
           |WHERE k.rk <= 30 AND ${OracleFragments.epochCopyPredicate}
           |ORDER BY doc_id, copy_idx""".stripMargin)),

    QueryDef("q116_nn_graph",
      // near-neighbor GRAPH join (the SemDeDup inspection step): for
      // EVERY vector, its cosine ≥ 0.999 neighbors ranked and capped at
      // k=5 — via the LSH candidate equi-join + per-id rank window, no
      // cartesian. Planted structure makes rank meaningful: every 50th
      // vector gets a ×1.5 scaled copy and every 100th ALSO a ×2.25
      // copy (exact-binary multipliers — float-mult and
      // double-then-cast round identically, so both engines derive
      // bit-identical copies; positive scaling preserves cosine), so
      // %100 families have 3 mutually-parallel members and their rows
      // carry rk 1..2. The oracle re-derives the truth exhaustively —
      // a hash match certifies recall AND precision of the LSH path,
      // and scaled copies share sign signatures by construction so
      // recall on the planted families is exactly 1
      (s, d) => {
        val emb = Tpch.table(s, d, "embeddings").select("vec_id", "embedding")
        val c15 = emb.filter(col("vec_id") % 50 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            transform(col("embedding"), x => (x * lit(1.5f)).cast("float"))
              .as("embedding"))
        val c225 = emb.filter(col("vec_id") % 100 === 0)
          .select((col("vec_id") + 2000000L).as("vec_id"),
            transform(col("embedding"), x => (x * lit(2.25f)).cast("float"))
              .as("embedding"))
        val aug = emb.unionAll(c15).unionAll(c225)
        val (n, dim) = q108Stats.getOrElseUpdate(
          s"${s.sparkContext.applicationId}:$d:nn", {
            val c = aug.count()
            val dm = aug.select(size(col("embedding"))).head().getInt(0)
            (c, dm)
          })
        val bits = Similarity.autoSignatureBits(n)
        val path = Similarity.ensureDedupSigStore(aug, "embedding", "vec_id", d,
          dim, bits, nTables = 8, seed = 4203L,
          fpSource = s"$d/embeddings.parquet")
        Similarity.nnTopKJoin(aug, "vec_id", "embedding",
            threshold = 0.999, k = 5,
            buckets = Some(s.read.parquet(path)), knownCount = Some(n))
          .orderBy("id", "rk") // nnTopKJoin's id column (= vec_id here)
      },
      Some("""WITH aug AS (
             |  SELECT vec_id, embedding FROM embeddings
             |  UNION ALL
             |  SELECT vec_id + 1000000,
             |    list_transform(embedding, x -> CAST(x * 1.5 AS FLOAT))
             |  FROM embeddings WHERE vec_id % 50 = 0
             |  UNION ALL
             |  SELECT vec_id + 2000000,
             |    list_transform(embedding, x -> CAST(x * 2.25 AS FLOAT))
             |  FROM embeddings WHERE vec_id % 100 = 0),
             |p AS (
             |  SELECT a.vec_id AS vec_id, b.vec_id AS nn_id, round(
             |    list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
             |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') /
             |    (sqrt(list_aggregate(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum')) *
             |     sqrt(list_aggregate(list_transform(b.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum'))), 6) AS cos_sim
             |  FROM aug a JOIN aug b ON a.vec_id <> b.vec_id),
             |f AS (SELECT vec_id, nn_id, cos_sim FROM p WHERE cos_sim >= 0.999),
             |r AS (SELECT vec_id, nn_id, cos_sim,
             |    CAST(row_number() OVER (PARTITION BY vec_id
             |      ORDER BY cos_sim DESC, nn_id) AS BIGINT) AS rk
             |  FROM f)
             |SELECT vec_id AS id, nn_id, cos_sim, rk FROM r WHERE rk <= 5
             |ORDER BY id, rk""".stripMargin)),

    QueryDef("q78_stored_geometry",
      // geometry as a COLUMN value (geometry.lisp:22-27 slot storage):
      // per-nation diamond polygons stored as array<array<double>>
      // rings, customers tested against them with the row-level codegen
      // expression. The 25-polygon side broadcasts — the right plan for
      // a small region set; a large one becomes a cell-covering
      // equi-join (SpatialOps.withCell / SpatialCellPruning). Radius
      // 20.25 keeps every synthetic point off the diamond boundary, so
      // the ray-cast agrees exactly with the oracle's manhattan form
      (s, d) => {
        val g = Tpch.graph(s, d)
        val r = 20.25
        val nations = g.vertexFrame("nation")
          .select(col("id").as("nid"),
            (col("id") * 12 - 144).cast("double").as("cx"),
            (col("id") * 6 - 72).cast("double").as("cy"))
          .withColumn("rings", array(array(
            col("cx") + r, col("cy"), col("cx"), col("cy") + r,
            col("cx") - r, col("cy"), col("cx"), col("cy") - r)))
        val cust = withCoords(g.vertexFrame("customer"))
        broadcast(nations)
          .join(cust, graft.functions.PointInStoredPolygonExpression
            .point_in_stored_polygon(col("rings"), col("lon"), col("lat")))
          .groupBy("nid").agg(count(lit(1)).as("n_inside"))
          .orderBy("nid")
      },
      Some(s"""WITH n AS (SELECT n_nationkey AS nid,
             |    CAST(n_nationkey*12 - 144 AS DOUBLE) AS cx,
             |    CAST(n_nationkey*6 - 72 AS DOUBLE) AS cy FROM nation),
             |c AS ($coordsSql)
             |SELECT nid, count(*) AS n_inside
             |FROM n JOIN c ON abs(c.lon - n.cx) + abs(c.lat - n.cy) < 20.25
             |GROUP BY 1 ORDER BY nid""".stripMargin)),

    QueryDef("q91_overlay_area",
      // constructive overlay OUTPUT on stored polygon pairs: per-nation
      // holed rectangle (outer + hole, stored as array<array<double>>
      // rings like q78) overlaid with a shifted solid rectangle whose
      // placement cycles through every degenerate contact class —
      // collinear outer edges (id%5=0), collinear hole edges (id%5∈
      // {2,3}), shared bottom edge (id%4=0), shared corners (id%20=0) —
      // plus plain proper crossings. The engine runs the robust
      // arrangement overlay (GeometryOps.overlay) and reports the
      // SIGNED ring-area sum of the intersection/union/difference
      // geometry; the oracle restates the axis-aligned inclusion-
      // exclusion arithmetic (hole ⊂ outer, so A∩B = outer∩B − hole∩B),
      // integer-exact in both engines
      (s, d) => {
        import graft.spatial.GeometryOps
        val overlayAreaUdf = udf((ra: Seq[Seq[Double]], rb: Seq[Seq[Double]], op: String) => {
          def rings(rs: Seq[Seq[Double]]): Seq[GeometryOps.Ring] =
            rs.map(fl => fl.grouped(2).map(p => (p(0), p(1))).toSeq)
          val o: GeometryOps.OverlayOp = op match {
            case "inter" => GeometryOps.OpIntersection
            case "union" => GeometryOps.OpUnion
            case _ => GeometryOps.OpDifference
          }
          // eps-retry inside, and one near-degenerate pair degrades to a
          // null area instead of failing the whole query
          try java.lang.Double.valueOf(
            GeometryOps.overlayArea(GeometryOps.overlayRobust(rings(ra), rings(rb), o)))
          catch { case _: IllegalStateException => null: java.lang.Double }
        })
        def rect(x1: Column, y1: Column, x2: Column, y2: Column): Column =
          array(x1, y1, x2, y1, x2, y2, x1, y2)
        val n = Tpch.graph(s, d).vertexFrame("nation")
          .select(col("id").as("nid"),
            (col("id") * 12 - 144).cast("double").as("cx"),
            (col("id") * 6 - 72).cast("double").as("cy"),
            when(col("id") % 5 === 0, -2.0).when(col("id") % 5 === 1, 0.0)
              .when(col("id") % 5 === 2, 2.0).when(col("id") % 5 === 3, 6.0)
              .otherwise(12.0).as("sx"),
            when(col("id") % 4 === 0, -2.0).when(col("id") % 4 === 1, 0.0)
              .when(col("id") % 4 === 2, 2.0).otherwise(8.0).as("ty"))
          .withColumn("rings_a", array(
            rect(col("cx") - 10, col("cy") - 10, col("cx") + 10, col("cy") + 10),
            rect(col("cx") - 6, col("cy") - 6, col("cx") - 2, col("cy") - 2)))
          .withColumn("rings_b", array(
            rect(col("cx") + col("sx") - 8, col("cy") + col("ty") - 8,
              col("cx") + col("sx") + 8, col("cy") + col("ty") + 8)))
        n.select(col("nid"),
          round(overlayAreaUdf(col("rings_a"), col("rings_b"), lit("inter")), 6).as("inter_area"),
          round(overlayAreaUdf(col("rings_a"), col("rings_b"), lit("union")), 6).as("union_area"),
          round(overlayAreaUdf(col("rings_a"), col("rings_b"), lit("diff")), 6).as("diff_area"))
          .orderBy("nid")
      },
      Some("""WITH n AS (SELECT n_nationkey AS nid,
             |    CAST(n_nationkey*12 - 144 AS DOUBLE) AS cx,
             |    CAST(n_nationkey*6 - 72 AS DOUBLE) AS cy,
             |    CAST(CASE n_nationkey%5 WHEN 0 THEN -2 WHEN 1 THEN 0 WHEN 2 THEN 2
             |      WHEN 3 THEN 6 ELSE 12 END AS DOUBLE) AS sx,
             |    CAST(CASE n_nationkey%4 WHEN 0 THEN -2 WHEN 1 THEN 0 WHEN 2 THEN 2
             |      ELSE 8 END AS DOUBLE) AS ty
             |  FROM nation),
             |r AS (SELECT nid,
             |    greatest(0, least(cx+10, cx+sx+8) - greatest(cx-10, cx+sx-8)) *
             |    greatest(0, least(cy+10, cy+ty+8) - greatest(cy-10, cy+ty-8)) AS i_outer,
             |    greatest(0, least(cx-2, cx+sx+8) - greatest(cx-6, cx+sx-8)) *
             |    greatest(0, least(cy-2, cy+ty+8) - greatest(cy-6, cy+ty-8)) AS i_hole
             |  FROM n)
             |SELECT nid, round(i_outer - i_hole, 6) AS inter_area,
             |  round(384 + 256 - (i_outer - i_hole), 6) AS union_area,
             |  round(384 - (i_outer - i_hole), 6) AS diff_area
             |FROM r ORDER BY nid""".stripMargin)),

    QueryDef("q57_simhash",
      // simhash with the 60-bit md5 token hasher (hasher is pluggable;
      // xxhash64 is the production default): md5 exists in both
      // engines, so the whole per-bit-majority aggregation is
      // DuckDB-verified value-for-value instead of rows-only
      (s, d) => Tpch.table(s, d, "documents")
        .select(col("doc_id"), Dedup.simhash64(col("text"), Dedup.md5Hash60).as("simhash"))
        .orderBy("doc_id"),
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
             |  FROM documents),
             |h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS hv FROM toks),
             |bits AS (SELECT doc_id, b AS bit,
             |    sum(CASE WHEN (hv >> CAST(b AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS c
             |  FROM h, (SELECT unnest(range(60)) AS b) GROUP BY 1, 2)
             |SELECT doc_id, CAST(sum(CASE WHEN c > 0 THEN CAST(1 AS BIGINT) << CAST(bit AS INTEGER)
             |  ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
             |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- similarity search --------------------------------------------
    QueryDef("q168_standardize_dims",
      // per-dimension z-scoring of the embedding corpus: exact
      // integer-micro sums feed one per-dim stats aggregation (64
      // keys, map-side partials), broadcast back over a narrow apply
      // map. The only floats are one IEEE sqrt + one divide rounded 6
      // — the oracle replays mean/devsq/std/z value-for-value.
      // Output clipped to the first 4 vectors per the element grain
      // (the transform itself runs corpus-wide; the clip keeps the
      // dump proportionate, like the q59 audit rows)
      (s, d) => Similarity.standardizeDims(
          Tpch.table(s, d, "embeddings"), "vec_id", "embedding")
        .filter(col("vec_id") < 4)
        .orderBy("vec_id", "dim"),
      Some("""WITH e AS (
             |  SELECT vec_id, i.i AS dim,
             |    CAST(round(CAST(embedding[i.i + 1] AS DOUBLE) * 1000000) AS BIGINT) AS v_micro
             |  FROM embeddings, (SELECT unnest(range(64)) AS i) i),
             |st AS (
             |  SELECT dim, count(*) AS n, sum(v_micro) AS s,
             |    sum(v_micro * v_micro) AS ssq
             |  FROM e GROUP BY 1),
             |sd AS (
             |  SELECT dim, s // n AS mean_mi,
             |    CASE WHEN n > 1 THEN sqrt(
             |      CAST(ssq - 2 * (s // n) * s + n * (s // n) * (s // n) AS DOUBLE)
             |        / CAST(n - 1 AS DOUBLE)) ELSE 0.0 END AS std
             |  FROM st)
             |SELECT e.vec_id, e.dim, e.v_micro,
             |  CASE WHEN sd.std > 0
             |    THEN round(CAST(e.v_micro - sd.mean_mi AS DOUBLE) / sd.std, 6)
             |    ELSE 0.0 END AS z
             |FROM e JOIN sd USING (dim)
             |WHERE e.vec_id < 4
             |ORDER BY vec_id, dim""".stripMargin)),

    QueryDef("q177_rank_transform",
      // per-dimension quantile normalization: the robust sibling of
      // q168 — rank position (rank−1)·10⁶ div (n−1), ALL-INTEGER and
      // tie-order-free (rank() gives ties one value on any engine).
      // One window per dim = 64 independent range-partitioned sorts,
      // the honest cost of quantile normalization. Same vec_id<4 clip
      // as q168 (transform runs corpus-wide)
      (s, d) => Similarity.rankTransform(
          Tpch.table(s, d, "embeddings"), "vec_id", "embedding")
        .filter(col("vec_id") < 4)
        .orderBy("vec_id", "dim"),
      Some("""WITH e AS (
             |  SELECT vec_id, i.i AS dim,
             |    CAST(round(CAST(embedding[i.i + 1] AS DOUBLE) * 1000000) AS BIGINT) AS v_micro
             |  FROM embeddings, (SELECT unnest(range(64)) AS i) i),
             |r AS (SELECT vec_id, dim, v_micro,
             |    rank() OVER (PARTITION BY dim ORDER BY v_micro) AS rk,
             |    count(*) OVER (PARTITION BY dim) AS n
             |  FROM e)
             |SELECT vec_id, dim, v_micro,
             |  CAST(CASE WHEN n > 1 THEN (rk - 1) * 1000000 // (n - 1)
             |    ELSE 0 END AS BIGINT) AS rank_ppm
             |FROM r WHERE vec_id < 4 ORDER BY vec_id, dim""".stripMargin)),

    QueryDef("q180_power_iteration",
      // dominant principal direction of the embedding Gram matrix via
      // 3 power-iteration rounds, every step integer-contracted
      // (micro-unit elements, exact max-scaled w rescale, exact Σwq²
      // into one IEEE sqrt, HALF_UP component rounds, first-nonzero-
      // positive sign) — the oracle replays all three rounds value-
      // for-value,
      // which only an arithmetically identical distributed loop can
      // match. The ABTT postprocess starts from exactly this vector
      (s, d) => {
        val v = Similarity.powerIteration(
          Tpch.table(s, d, "embeddings"), "vec_id", "embedding", iterations = 3)
        import s.implicits._
        v.zipWithIndex.map { case (x, i) => (i.toLong, x) }
          .toDF("dim", "v_micro").orderBy("dim")
      },
      Some {
        val iters = 3
        val step = (i: Int) => {
          val prev = s"v${i - 1}"
          s"""s$i AS MATERIALIZED (SELECT e.vec_id,
             |    CAST(sum(e.x * $prev.v) // 1000000 AS BIGINT) AS s
             |  FROM e JOIN $prev USING (dim) GROUP BY 1),
             |w$i AS MATERIALIZED (SELECT e.dim, sum(e.x * s$i.s) AS w
             |  FROM e JOIN s$i USING (vec_id) GROUP BY 1),
             |q$i AS MATERIALIZED (SELECT greatest(1, max(abs(w)) // 100000000) AS qd FROM w$i),
             |wq$i AS MATERIALIZED (SELECT dim, w // q$i.qd AS wq FROM w$i, q$i),
             |n$i AS MATERIALIZED (SELECT sqrt(CAST(sum(wq*wq) AS DOUBLE)) AS nrm FROM wq$i),
             |u$i AS MATERIALIZED (SELECT dim, CASE WHEN n$i.nrm = 0 THEN 0
             |    ELSE CAST(round(wq * 1000000 / n$i.nrm) AS BIGINT) END AS u
             |  FROM wq$i, n$i),
             |g$i AS MATERIALIZED (SELECT CASE WHEN
             |    (SELECT u FROM u$i WHERE u <> 0 ORDER BY dim LIMIT 1) < 0
             |    THEN -1 ELSE 1 END AS sg),
             |v$i AS MATERIALIZED (SELECT dim, u * g$i.sg AS v FROM u$i, g$i)""".stripMargin
        }
        s"""WITH e AS MATERIALIZED (SELECT vec_id, i.i AS dim,
           |    CAST(round(CAST(embedding[i.i + 1] AS DOUBLE) * 1000000) AS BIGINT) AS x
           |  FROM embeddings, (SELECT unnest(range(64)) AS i) i),
           |v0 AS (SELECT i.i AS dim,
           |    CAST(CASE WHEN i.i = 0 THEN 1000000 ELSE 0 END AS BIGINT) AS v
           |  FROM (SELECT unnest(range(64)) AS i) i),
           |${(1 to iters).map(step).mkString(",\n")}
           |SELECT dim, CAST(v AS BIGINT) AS v_micro FROM v$iters ORDER BY dim""".stripMargin
      }),

    QueryDef("q181_abtt_postprocess",
      // ABTT (all-but-the-top) embedding correction: exact integer
      // centering, the q180 power iteration on the CENTERED corpus,
      // then each vector minus its projection on the dominant
      // direction — projection coefficient one IEEE divide of exact
      // int64 sums, each component rounded once at 6. The oracle
      // replays centering, all three rounds, and the correction;
      // vec_id<4 clip for the dump (the transform runs corpus-wide)
      (s, d) => Similarity.abttPostprocess(
          Tpch.table(s, d, "embeddings"), "vec_id", "embedding", iterations = 3)
        .filter(col("id") < 4)
        .orderBy("id", "dim"),
      Some {
        val iters = 3
        val step = (i: Int) => {
          val prev = s"v${i - 1}"
          s"""s$i AS MATERIALIZED (SELECT e.vec_id,
             |    CAST(sum(e.x * $prev.v) // 1000000 AS BIGINT) AS s
             |  FROM e JOIN $prev USING (dim) GROUP BY 1),
             |w$i AS MATERIALIZED (SELECT e.dim, sum(e.x * s$i.s) AS w
             |  FROM e JOIN s$i USING (vec_id) GROUP BY 1),
             |q$i AS MATERIALIZED (SELECT greatest(1, max(abs(w)) // 100000000) AS qd FROM w$i),
             |wq$i AS MATERIALIZED (SELECT dim, w // q$i.qd AS wq FROM w$i, q$i),
             |n$i AS MATERIALIZED (SELECT sqrt(CAST(sum(wq*wq) AS DOUBLE)) AS nrm FROM wq$i),
             |u$i AS MATERIALIZED (SELECT dim, CASE WHEN n$i.nrm = 0 THEN 0
             |    ELSE CAST(round(wq * 1000000 / n$i.nrm) AS BIGINT) END AS u
             |  FROM wq$i, n$i),
             |g$i AS MATERIALIZED (SELECT CASE WHEN
             |    (SELECT u FROM u$i WHERE u <> 0 ORDER BY dim LIMIT 1) < 0
             |    THEN -1 ELSE 1 END AS sg),
             |v$i AS MATERIALIZED (SELECT dim, u * g$i.sg AS v FROM u$i, g$i)""".stripMargin
        }
        s"""WITH e0 AS MATERIALIZED (SELECT vec_id, i.i AS dim,
           |    CAST(round(CAST(embedding[i.i + 1] AS DOUBLE) * 1000000) AS BIGINT) AS x
           |  FROM embeddings, (SELECT unnest(range(64)) AS i) i),
           |mm AS MATERIALIZED (SELECT dim, CAST(sum(x) // count(*) AS BIGINT) AS mu
           |  FROM e0 GROUP BY 1),
           |e AS MATERIALIZED (SELECT e0.vec_id, e0.dim, e0.x - mm.mu AS x
           |  FROM e0 JOIN mm USING (dim)),
           |v0 AS (SELECT i.i AS dim,
           |    CAST(CASE WHEN i.i = 0 THEN 1000000 ELSE 0 END AS BIGINT) AS v
           |  FROM (SELECT unnest(range(64)) AS i) i),
           |${(1 to iters).map(step).mkString(",\n")},
           |nsq AS MATERIALIZED (SELECT CAST(sum(v*v) AS BIGINT) AS nsq FROM v$iters),
           |dt AS MATERIALIZED (SELECT e.vec_id, CAST(sum(e.x * v$iters.v) AS BIGINT) AS dot
           |  FROM e JOIN v$iters USING (dim) GROUP BY 1)
           |SELECT e.vec_id AS id, e.dim,
           |  round(CAST(e.x AS DOUBLE) - v$iters.v *
           |    (CASE WHEN nsq.nsq = 0 THEN 0.0
           |      ELSE CAST(dt.dot AS DOUBLE) / CAST(nsq.nsq AS DOUBLE) END), 6)
           |    AS corrected
           |FROM e JOIN v$iters USING (dim) JOIN dt USING (vec_id), nsq
           |WHERE e.vec_id < 4 ORDER BY id, dim""".stripMargin
      }),

    QueryDef("q184_label_similarity",
      // embedding-space label confusion audit: per-label integer-micro
      // centroids compared pairwise by cosine (exact int sums, one
      // IEEE divide over two sqrts, round 6) — close centroids mark
      // labels a filtered ANN probe will blur. Everything past the one
      // corpus aggregation is |labels|²-sized
      (s, d) => Similarity.labelCentroidSimilarity(
          Tpch.table(s, d, "embeddings"), "vec_id", "embedding", "label")
        .orderBy("label_a", "label_b"),
      Some("""WITH e AS (SELECT label, i.i AS dim,
             |    CAST(round(CAST(embedding[i.i + 1] AS DOUBLE) * 1000000) AS BIGINT) AS x
             |  FROM embeddings, (SELECT unnest(range(64)) AS i) i),
             |c AS (SELECT label, dim, CAST(sum(x) // count(*) AS BIGINT) AS m
             |  FROM e GROUP BY 1, 2),
             |nn AS (SELECT label, CAST(sum(m*m) AS BIGINT) AS nsq FROM c GROUP BY 1),
             |dt AS (SELECT a.label AS label_a, b.label AS label_b,
             |    CAST(sum(a.m * b.m) AS BIGINT) AS dot
             |  FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
             |  GROUP BY 1, 2)
             |SELECT dt.label_a, dt.label_b,
             |  CASE WHEN na.nsq = 0 OR nb.nsq = 0 THEN 0.0
             |    ELSE round(CAST(dt.dot AS DOUBLE)
             |      / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))), 6)
             |  END AS cosine
             |FROM dt JOIN nn na ON na.label = dt.label_a
             |  JOIN nn nb ON nb.label = dt.label_b
             |ORDER BY label_a, label_b""".stripMargin)),

    QueryDef("q178_class_weights",
      // balanced inverse-frequency class weights over the embedding
      // labels: total·10⁶ div (k·n) integer-exact; one label-grain
      // aggregation + broadcast 1-row total
      (s, d) => graft.operators.Sampling.classWeights(
          Tpch.table(s, d, "embeddings"), "label")
        .orderBy("label"),
      Some("""WITH c AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS k FROM c)
             |SELECT label, n,
             |  CAST(total * 1000000 // (k * n) AS BIGINT) AS weight_micro
             |FROM c, t ORDER BY label""".stripMargin)),

    QueryDef("q179_hot_keys",
      // pre-join skew audit: top keys by row count with per-million
      // share — the diagnostic that decides plain vs AQE vs salted
      // BEFORE the join runs. Aggregation is skew-immune (map-side
      // partial counts), the top-k a TakeOrdered under (n desc, key)
      (s, d) => graft.operators.Skew.hotKeys(
        Tpch.table(s, d, "lineitem").select(col("l_suppkey")),
        "l_suppkey", topN = 20),
      Some("""WITH c AS (SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY 1),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
             |SELECT l_suppkey, n, CAST(n * 1000000 // total AS BIGINT) AS share_ppm
             |FROM c, t ORDER BY n DESC, l_suppkey LIMIT 20""".stripMargin)),

    QueryDef("q81_quantize_int8",
      // SQ8 embedding compression (Similarity.quantizeInt8): per-vector
      // absmax int8 codes. Output is integer code statistics — exact
      // across engines (float→double casts and double ×/÷ are IEEE-
      // identical; both engines round half away from zero)
      (s, d) => Similarity.quantizeInt8(
          Tpch.table(s, d, "embeddings"), "vec_id", "embedding")
        .select(col("id").as("vec_id"),
          aggregate(col("codes"), lit(0L), (acc, c) => acc + c.cast("long")).as("code_sum"),
          array_min(col("codes")).cast("int").as("code_min"),
          array_max(col("codes")).cast("int").as("code_max"),
          size(filter(col("codes"), c => abs(c) === 127)).as("n_sat"))
        .orderBy("vec_id"),
      Some("""WITH am AS (SELECT vec_id, embedding,
             |    list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) AS m
             |  FROM embeddings),
             |q AS (SELECT vec_id, CASE WHEN m = 0
             |    THEN list_transform(embedding, x -> 0)
             |    ELSE list_transform(embedding,
             |      x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / m) AS INTEGER)) END AS codes
             |  FROM am)
             |SELECT vec_id,
             |  CAST(list_aggregate(codes, 'sum') AS BIGINT) AS code_sum,
             |  CAST(list_min(codes) AS INTEGER) AS code_min,
             |  CAST(list_max(codes) AS INTEGER) AS code_max,
             |  CAST(len(list_filter(codes, c -> abs(c) = 127)) AS INTEGER) AS n_sat
             |FROM q ORDER BY vec_id""".stripMargin)),

    QueryDef("q58_cosine_topk",
      // brute-force cosine top-k against embedding of vec_id=0
      (s, d) => {
        val emb = Tpch.table(s, d, "embeddings")
        val q = emb.filter(col("vec_id") === 0).select(col("embedding")).head()
          .getSeq[Float](0).map(_.toDouble)
        Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= 0), "embedding", "vec_id", q, 10)
      },
      Some("""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
             |SELECT vec_id AS id, round(
             |  list_aggregate(list_transform(list_zip(embedding, qe),
             |    x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') /
             |  (sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum')) *
             |   sqrt(list_aggregate(list_transform(qe, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum'))), 6) AS cos_sim
             |FROM embeddings, q WHERE vec_id <> 0
             |ORDER BY cos_sim DESC, id LIMIT 10""".stripMargin)),

    // GraphRAG-shaped hybrid retrieval: the graph proposes, the vector
    // space disposes. Candidates = the query vertex's ≤2-hop
    // UNDIRECTED neighborhood (Traverse.bfs at min depth over a
    // deterministic ring+chord edge set the oracle can re-derive),
    // ranking = EXACT cosine against the query vertex's own embedding
    // (q58's round-6 contract), top-10 under (cos desc, id) with the
    // hop depth carried. Scale shape: the bfs frontier broadcasts
    // while small, ranking runs only on the bounded neighborhood —
    // never the corpus — and the final join is k-bounded.
    QueryDef("q199_graph_ann_rerank",
      (s, d) => {
        import s.implicits._
        val emb = Tpch.table(s, d, "embeddings")
        val n = emb.count()
        val ids = emb.select(col("vec_id"))
        val edges = ids.select(col("vec_id").as("src"),
            ((col("vec_id") + 1) % n).as("dst"))
          .unionAll(ids.filter(col("vec_id") % 5 === 0)
            .select(col("vec_id").as("src"), ((col("vec_id") + 17) % n).as("dst")))
        val hood = graft.operators.Traverse.bfs(edges, Seq(0L).toDF("id"),
            maxDepth = 2, direction = graft.operators.Traverse.Both)
          .filter(col("depth") > 0) // the query vertex is not a result
        val q = emb.filter(col("vec_id") === 0).select("embedding").head()
          .getSeq[Float](0).map(_.toDouble)
        hood.join(emb, hood("id") === emb("vec_id"))
          .select(col("id"), col("depth"),
            round(Similarity.cosine(col("embedding"), Similarity.vecLit(q)), 6)
              .as("cos_sim")) // q58's exact-rank contract, depth carried
          .orderBy(col("cos_sim").desc, col("id").asc)
          .limit(10)
      },
      Some("""WITH n AS (SELECT count(*) AS n FROM embeddings),
             |e AS (
             |  SELECT vec_id AS src, (vec_id+1) % n.n AS dst FROM embeddings, n
             |  UNION ALL
             |  SELECT vec_id, (vec_id+17) % n.n FROM embeddings, n WHERE vec_id % 5 = 0),
             |und AS (SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e),
             |h1 AS (SELECT DISTINCT b AS id FROM und WHERE a = 0),
             |h2 AS (SELECT DISTINCT und.b AS id FROM und JOIN h1 ON und.a = h1.id),
             |hood AS (
             |  SELECT id, 1 AS depth FROM h1 WHERE id <> 0
             |  UNION ALL
             |  SELECT id, 2 FROM h2
             |  WHERE id <> 0 AND id NOT IN (SELECT id FROM h1)),
             |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
             |SELECT hood.id, hood.depth, round(
             |  list_aggregate(list_transform(list_zip(embedding, qe),
             |    x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') /
             |  (sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum')) *
             |   sqrt(list_aggregate(list_transform(qe, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum'))), 6) AS cos_sim
             |FROM hood JOIN embeddings ON embeddings.vec_id = hood.id, q
             |ORDER BY cos_sim DESC, id LIMIT 10""".stripMargin)),

    QueryDef("q161_mmr",
      // maximal-marginal-relevance diversity re-ranking over the q58
      // candidate tier: top-20 cosine candidates, greedy 5 picks at
      // λ=0.7 — mmr = 0.7·rel − 0.3·max-sim-to-selected, all cosines
      // rounded to 6 (the q58 contract), ties to the lower id. The
      // greedy loop runs on the BOUNDED candidate list (20 rels +
      // 20·19 pair sims — the recall-audit bounded-collect
      // discipline); the oracle unrolls the same 5 selection steps
      (s, d) => {
        val emb = Tpch.table(s, d, "embeddings")
        val q = emb.filter(col("vec_id") === 0).select(col("embedding")).head()
          .getSeq[Float](0).map(_.toDouble)
        Similarity.mmrRerank(emb.filter(col("vec_id") =!= 0), "embedding",
          "vec_id", q, candK = 20, selectK = 5, lambdaPm = 7000)
      },
      Some {
        def cos(a: String, b: String) =
          s"""(list_aggregate(list_transform(list_zip($a, $b),
             |    x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') /
             |  (sqrt(list_aggregate(list_transform($a, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum')) *
             |   sqrt(list_aggregate(list_transform($b, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum'))))""".stripMargin
        val step1 =
          """s1 AS (SELECT id, rel, round(0.7*rel, 6) AS mmr, 1 AS pick
            |  FROM cand ORDER BY mmr DESC, id LIMIT 1),
            |sel1 AS (SELECT id FROM s1)""".stripMargin
        def stepN(i: Int) =
          s"""s$i AS (SELECT c.id, c.rel,
             |    round(0.7*c.rel - 0.3*(SELECT max(p.sim) FROM pair p
             |      WHERE p.id_a = c.id AND p.id_b IN (SELECT id FROM sel${i - 1})), 6) AS mmr,
             |    $i AS pick
             |  FROM cand c WHERE c.id NOT IN (SELECT id FROM sel${i - 1})
             |  ORDER BY mmr DESC, id LIMIT 1),
             |sel$i AS (SELECT id FROM sel${i - 1} UNION ALL SELECT id FROM s$i)""".stripMargin
        s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
           |cand AS (SELECT vec_id AS id, embedding AS v,
           |    round(${cos("embedding", "qe")}, 6) AS rel
           |  FROM embeddings, q WHERE vec_id <> 0 ORDER BY rel DESC, id LIMIT 20),
           |pair AS (SELECT a.id AS id_a, b.id AS id_b,
           |    round(${cos("a.v", "b.v")}, 6) AS sim
           |  FROM cand a JOIN cand b ON a.id <> b.id),
           |$step1,
           |${(2 to 5).map(stepN).mkString(",\n")}
           |SELECT CAST(pick AS BIGINT) AS pick, id, rel, mmr FROM (
           |  SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3
           |  UNION ALL SELECT * FROM s4 UNION ALL SELECT * FROM s5)
           |ORDER BY pick""".stripMargin
      }),

    QueryDef("q59_ann_lsh",
      // Multi-table LSH ANN, self-audited: the query returns the probe's
      // result count plus whether recall@10 vs the in-engine exact
      // top-10 clears a floor — the quality gate a production ANN
      // deployment runs as a sampled audit job. The oracle row is the
      // expected audit outcome (Gaussian embeddings have no cluster
      // structure, so sign-LSH recall has a floor, not an exact match —
      // the exact-oracle ANN path is q67).
      (s, d) => {
        import s.implicits._
        val emb = Tpch.table(s, d, "embeddings").filter(col("vec_id") =!= 0)
        val q = Tpch.table(s, d, "embeddings").filter(col("vec_id") === 0)
          .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
        // two top-k result sets of k=10 rows: collect both and compare
        // driver-side, as any client consuming a top-k would. The ANN
        // side probes the WRITTEN (table, bucket)-partitioned store —
        // the at-scale path: a partition-pruned read of 8 bucket dirs,
        // not a corpus scan (AnnStoreSpec pins the PartitionFilters)
        val ann = Similarity.annTopKStored(emb, "embedding", "vec_id", d, q,
          k = 10, nBits = 4, nTables = 8).select("id").collect().map(_.getLong(0)).toSet
        val exact = Similarity.bruteForceTopK(emb, "embedding", "vec_id", q, 10)
          .select("id").collect().map(_.getLong(0)).toSet
        Seq((0L, ann.size.toLong, (ann & exact).size >= 6))
          .toDF("query_id", "n_results", "recall_ok")
      },
      Some("""SELECT CAST(0 AS BIGINT) AS query_id, CAST(10 AS BIGINT) AS n_results,
             |  true AS recall_ok""".stripMargin)),

    QueryDef("q67_ivf_ann",
      // IVF coarse-quantized ANN (scale path #2 beside LSH): cluster
      // L2-NORMALIZED vectors (unit-sphere Euclid ⇔ cosine) and probe
      // the nearest cells only. On this data the probed cells contain
      // the full true top-10, so the exact-top-k oracle applies — the
      // approximation is in WHAT is scanned, not what is returned
      (s, d) => {
        val emb = Tpch.table(s, d, "embeddings")
          .withColumn("nvec", Similarity.l2normalize(col("embedding")))
        // train+assign+write once (cluster-partitioned store with the
        // centroids beside it); every probe after that is a
        // partition-pruned read of the nProbe cluster dirs
        val (assigned, centroids) = Similarity.ensureIvfStore(
          emb, "nvec", "embedding", "vec_id", d, k = 8, iterations = 2)
        val qRaw = emb.filter(col("vec_id") === 0).select(col("embedding")).head()
          .getSeq[Float](0).map(_.toDouble)
        val norm = math.sqrt(qRaw.map(x => x * x).sum)
        val qN = if (norm == 0) qRaw else qRaw.map(_ / norm)
        // probe in normalized space, rescore raw floats (bit-identical
        // to the oracle's cosine over the stored embeddings)
        Similarity.ivfTopK(assigned, "embedding", "vec_id", centroids, qRaw,
          k = 10, nProbe = 5, probeVec = Some(qN))
      },
      Some("""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
             |SELECT vec_id AS id, round(
             |  list_aggregate(list_transform(list_zip(embedding, qe),
             |    x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') /
             |  (sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum')) *
             |   sqrt(list_aggregate(list_transform(qe, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum'))), 6) AS cos_sim
             |FROM embeddings, q
             |ORDER BY cos_sim DESC, id LIMIT 10""".stripMargin)),

    QueryDef("q68_embedding_neardup",
      // embedding-cosine near-dup pairs (the embedding analog of q56):
      // multi-table sign-LSH candidates + exact cosine verify at 0.9.
      // The oracle is the exhaustive O(n²) cosine scan, so a hash match
      // proves the LSH path emits no false positives and misses no
      // true near-dup (this corpus has none — max pairwise cosine
      // ≈0.51 — which the exhaustive oracle confirms; recall on
      // PLANTED near-dups is DedupSpec's job)
      (s, d) => Similarity.cosineNearDups(Tpch.table(s, d, "embeddings"),
          "vec_id", "embedding", threshold = 0.9)
        .orderBy("id_a", "id_b"),
      Some("""WITH p AS (
             |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, round(
             |    list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
             |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') /
             |    (sqrt(list_aggregate(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum')) *
             |     sqrt(list_aggregate(list_transform(b.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum'))), 6) AS cos_sim
             |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
             |SELECT id_a, id_b, cos_sim FROM p WHERE cos_sim >= 0.9
             |ORDER BY id_a, id_b""".stripMargin)),

    QueryDef("q108_semantic_dedup",
      // SemDeDup keep-list: every 50th vector gets a planted scaled
      // copy (×1.5 — positive scaling preserves cosine, and
      // float×1.5 rounds identically whether computed in float or in
      // exact-double-then-cast, so both engines derive bit-identical
      // copies), then the LSH-candidate + exact-verify + min-id
      // component path collapses each copy group to its representative.
      // The oracle re-derives the truth exhaustively: O(n²) cosine over
      // the augmented frame + recursive reachability — so a hash match
      // certifies the LSH path's recall AND precision on this corpus
      (s, d) => {
        val emb = Tpch.table(s, d, "embeddings").select("vec_id", "embedding")
        val copies = emb.filter(col("vec_id") % 50 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            transform(col("embedding"), x => (x * lit(1.5f)).cast("float"))
              .as("embedding"))
        val aug = emb.unionAll(copies)
        // steady-state shape: signatures come from the WRITTEN flat
        // signature store over the augmented corpus (build-if-absent;
        // seed 4201 namespaces it from any plain-corpus store at the
        // same params), the auto-width from a session-cached count —
        // per run, only the bucket join + verify + components execute
        val (n, dim) = q108Stats.getOrElseUpdate(
          s"${s.sparkContext.applicationId}:$d", {
            val c = aug.count()
            val dm = aug.select(size(col("embedding"))).head().getInt(0)
            (c, dm)
          })
        val bits = Similarity.autoSignatureBits(n)
        val path = Similarity.ensureDedupSigStore(aug, "embedding", "vec_id", d,
          dim, bits, nTables = 8, seed = 4201L,
          fpSource = s"$d/embeddings.parquet")
        Similarity.semanticDedup(aug, "vec_id", "embedding",
            threshold = 0.999, buckets = Some(s.read.parquet(path)),
            knownCount = Some(n))
          .orderBy("vec_id")
      },
      Some("""WITH RECURSIVE aug AS (
             |  SELECT vec_id, embedding FROM embeddings
             |  UNION ALL
             |  SELECT vec_id + 1000000,
             |    list_transform(embedding, x -> CAST(x * 1.5 AS FLOAT))
             |  FROM embeddings WHERE vec_id % 50 = 0),
             |p AS (
             |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
             |  FROM aug a JOIN aug b ON a.vec_id < b.vec_id
             |  WHERE round(
             |    list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
             |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') /
             |    (sqrt(list_aggregate(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum')) *
             |     sqrt(list_aggregate(list_transform(b.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum'))), 6) >= 0.999),
             |e AS (SELECT id_a AS a, id_b AS b FROM p
             |  UNION ALL SELECT id_b, id_a FROM p),
             |reach(id, r) AS (
             |  SELECT vec_id, vec_id FROM aug
             |  UNION
             |  SELECT e.a, reach.r FROM e JOIN reach ON reach.id = e.b)
             |SELECT id AS vec_id, CAST(min(r) AS BIGINT) AS rep_id,
             |  (id = min(r)) AS keep
             |FROM reach GROUP BY id ORDER BY vec_id""".stripMargin)),

    QueryDef("q109_pq_ann",
      // product-quantization ANN (scale path #3 beside LSH and IVF):
      // the corpus is scanned in COMPRESSED domain — m=8 subspaces × 16
      // centroids turn dim·4 float bytes into 8 code bytes per vector
      // (32× at dim 64), the ADC pass reads ONLY the codes, and the
      // top candidates rescore exactly against the full vectors. Like
      // q59 the result row is the audit a production deployment runs:
      // result count + recall@10 vs the in-engine exact top-10 above a
      // floor (PQ is lossy by design; exactness is DedupSpec-style
      // grid fixtures' job — PqSpec)
      (s, d) => {
        import s.implicits._
        val emb = Tpch.table(s, d, "embeddings")
        // stage the normalized column: the k-means rounds and the
        // encode pass would otherwise re-derive the O(d²) lazy
        // l2normalize per reference
        val corpus = emb.filter(col("vec_id") =!= 0)
          .select(col("vec_id"), col("embedding"),
            Similarity.l2normalize(col("embedding")).as("nvec"))
          .localCheckpoint(eager = true)
        val qRaw = emb.filter(col("vec_id") === 0).select(col("embedding")).head()
          .getSeq[Float](0).map(_.toDouble)
        val norm = math.sqrt(qRaw.map(x => x * x).sum)
        val qN = if (norm == 0) qRaw else qRaw.map(_ / norm)
        val cbs = Similarity.pqTrain(corpus, "nvec", "vec_id",
          m = 8, ksub = 16, iterations = 2)
        val codes = Similarity.pqEncode(corpus, "vec_id", "nvec", cbs)
        val ann = Similarity.pqTopK(corpus, "embedding", "vec_id", codes, cbs,
            qRaw, k = 10, candidates = 100, adcQuery = Some(qN))
          .select("id").collect().map(_.getLong(0)).toSet
        val exact = Similarity.bruteForceTopK(corpus, "embedding", "vec_id",
            qRaw, 10)
          .select("id").collect().map(_.getLong(0)).toSet
        Seq((0L, ann.size.toLong, (ann & exact).size >= 6))
          .toDF("query_id", "n_results", "recall_ok")
      },
      Some("""SELECT CAST(0 AS BIGINT) AS query_id, CAST(10 AS BIGINT) AS n_results,
             |  true AS recall_ok""".stripMargin)),

    QueryDef("q112_ivfpq_ann",
      // the COMPOSED ANN configuration (FAISS IVF-PQ shape): codes
      // partitioned by coarse cell in a WRITTEN store, so the ADC scan
      // reads ONLY the probed cells' compressed codes (PartitionFilters
      // pinned by PqSpec) where q109's flat tier scans them all. Same
      // audit contract as q109/q59: result count + recall@10 vs the
      // in-engine exact top-10 above a floor (global codebooks, not
      // per-cell residuals — the choice is documented at
      // ensureIvfPqStore). The store holds the FULL embeddings table;
      // the query vector's self-match lands in both sets
      (s, d) => {
        import s.implicits._
        val emb = Tpch.table(s, d, "embeddings")
        val qRaw = emb.filter(col("vec_id") === 0).select(col("embedding")).head()
          .getSeq[Float](0).map(_.toDouble)
        val ann = Similarity.ivfPqTopK(emb, "embedding", "vec_id", d,
            qRaw, kTop = 10, k = 16, m = 8, nProbe = 8, candidates = 100)
          .select("id").collect().map(_.getLong(0)).toSet
        val exact = Similarity.bruteForceTopK(emb, "embedding", "vec_id",
            qRaw, 10)
          .select("id").collect().map(_.getLong(0)).toSet
        Seq((0L, ann.size.toLong, (ann & exact).size >= 6))
          .toDF("query_id", "n_results", "recall_ok")
      },
      Some("""SELECT CAST(0 AS BIGINT) AS query_id, CAST(10 AS BIGINT) AS n_results,
             |  true AS recall_ok""".stripMargin)),

    QueryDef("q151_hamming_ann",
      // binary (1-bit) quantization ANN — the fourth compression tier
      // beside LSH buckets (q59), IVF cells (q67), and PQ codes (q109):
      // sign bits packed into 32-bit lanes (32× smaller than raw
      // floats at dim 64), corpus ranked by XOR+popcount Hamming
      // distance, the 64 closest rescored EXACTLY by full-precision
      // cosine. Unlike the lossy-recall audits (q109/q112) every stage
      // here is deterministic — the candidate cut orders on
      // (hamming, id) and the final ranking on (cosine, id) — so the
      // oracle restates the whole contract in SQL: sign-mismatch count
      // per pair, candidate LIMIT, exact rescore. The approximation is
      // in which vectors reach the rescore, never in how they rank
      (s, d) => {
        val emb = Tpch.table(s, d, "embeddings")
        val qRaw = emb.filter(col("vec_id") === 0).select(col("embedding"))
          .head().getSeq[Float](0).map(_.toDouble)
        Similarity.hammingTopK(emb, "embedding", "vec_id", qRaw,
          k = 10, candidates = 64)
      },
      Some("""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
             |h AS (SELECT vec_id AS id, embedding, qe,
             |    CAST(list_sum(list_transform(list_zip(embedding, qe),
             |      x -> CASE WHEN (CAST(x[1] AS DOUBLE) > 0) <> (CAST(x[2] AS DOUBLE) > 0)
             |        THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
             |  FROM embeddings CROSS JOIN q),
             |c AS (SELECT id, hamming, embedding, qe FROM h
             |  ORDER BY hamming, id LIMIT 64)
             |SELECT id, hamming, round(
             |    list_aggregate(list_transform(list_zip(embedding, qe),
             |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') /
             |    (sqrt(list_aggregate(list_transform(embedding,
             |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) *
             |     sqrt(list_aggregate(list_transform(qe,
             |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))), 6) AS cos_sim
             |FROM c ORDER BY cos_sim DESC, id LIMIT 10""".stripMargin)),

    QueryDef("q79_decontaminate",
      // train/eval benchmark-leakage check: carve the corpus with the
      // deterministic hash split (q77), then count each train doc's
      // distinct 5-grams that appear anywhere in the eval slice. The
      // eval n-gram hash set broadcasts (benchmarks are tiny vs the
      // corpus); verdicts are integer arithmetic — bit-exact oracle
      (s, d) => {
        val docs = Tpch.table(s, d, "documents").withColumn("split",
          Sampling.hashSplit(col("doc_id"), Seq("train" -> 0.9, "val" -> 0.05),
            rest = "test"))
        Decontaminate.evalOverlap(
          docs.filter(col("split") === "train"),
          docs.filter(col("split") === "test"),
          "doc_id", "text", n = 5, flagAtPct = 20)
          .orderBy("doc_id")
      },
      Some("""WITH s AS (SELECT doc_id, text,
             |    CASE WHEN b < 900 THEN 'train' WHEN b < 950 THEN 'val' ELSE 'test' END AS split
             |  FROM (SELECT doc_id, text,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 AS b
             |    FROM documents)),
             |t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tok
             |  FROM s WHERE split = 'train'),
             |e AS (SELECT string_split_regex(trim(lower(text)), '\s+') AS tok
             |  FROM s WHERE split = 'test'),
             |tg AS (SELECT doc_id, unnest(CASE WHEN len(tok) < 5 THEN [array_to_string(tok, ' ')]
             |  ELSE list_distinct(list_transform(range(len(tok)-4),
             |    i -> array_to_string(tok[i+1:i+5], ' '))) END) AS g FROM t),
             |eg AS (SELECT DISTINCT unnest(CASE WHEN len(tok) < 5 THEN [array_to_string(tok, ' ')]
             |  ELSE list_distinct(list_transform(range(len(tok)-4),
             |    i -> array_to_string(tok[i+1:i+5], ' '))) END) AS g FROM e)
             |SELECT tg.doc_id, count(*) AS n_grams, count(eg.g) AS n_hit,
             |  (count(eg.g) * 100 >= count(*) * 20) AS contaminated
             |FROM tg LEFT JOIN eg ON tg.g = eg.g
             |GROUP BY 1 ORDER BY doc_id""".stripMargin)),

    QueryDef("q233_decontaminate_by_set",
      // per-BENCHMARK contamination attribution: the eval slice splits
      // into three deterministic "benchmarks" (doc_id % 3), and every
      // (train doc, benchmark) pair with at least one shared 5-gram
      // reports its hit count and per-set flag — the removal-list
      // grain a multi-benchmark pipeline actually consumes. Sparse
      // long form: output is |actual leaks|, never |docs| × |sets|
      (s, d) => {
        val docs = Tpch.table(s, d, "documents").withColumn("split",
          Sampling.hashSplit(col("doc_id"), Seq("train" -> 0.9, "val" -> 0.05),
            rest = "test"))
        Decontaminate.evalOverlapBySet(
          docs.filter(col("split") === "train"),
          docs.filter(col("split") === "test")
            .withColumn("bench", concat(lit("bench"), col("doc_id") % 3)),
          "doc_id", "text", "bench", n = 5, flagAtPct = 20)
          .orderBy("doc_id", "eval_set")
      },
      Some("""WITH s AS (SELECT doc_id, text,
             |    CASE WHEN b < 900 THEN 'train' WHEN b < 950 THEN 'val' ELSE 'test' END AS split
             |  FROM (SELECT doc_id, text,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 AS b
             |    FROM documents)),
             |t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tok
             |  FROM s WHERE split = 'train'),
             |e AS (SELECT 'bench' || CAST(doc_id % 3 AS VARCHAR) AS eval_set,
             |    string_split_regex(trim(lower(text)), '\s+') AS tok
             |  FROM s WHERE split = 'test'),
             |tg AS (SELECT doc_id, unnest(CASE WHEN len(tok) < 5 THEN [array_to_string(tok, ' ')]
             |  ELSE list_distinct(list_transform(range(len(tok)-4),
             |    i -> array_to_string(tok[i+1:i+5], ' '))) END) AS g FROM t),
             |eg AS (SELECT DISTINCT eval_set, unnest(CASE WHEN len(tok) < 5 THEN [array_to_string(tok, ' ')]
             |  ELSE list_distinct(list_transform(range(len(tok)-4),
             |    i -> array_to_string(tok[i+1:i+5], ' '))) END) AS g FROM e),
             |tot AS (SELECT doc_id, count(*) AS n_grams FROM tg GROUP BY 1)
             |SELECT tg.doc_id, eg.eval_set, tot.n_grams,
             |  CAST(count(*) AS BIGINT) AS n_hit,
             |  (count(*) * 100 >= tot.n_grams * 20) AS contaminated
             |FROM tg JOIN eg ON tg.g = eg.g JOIN tot ON tg.doc_id = tot.doc_id
             |GROUP BY 1, 2, 3 ORDER BY tg.doc_id, eval_set""".stripMargin)),

    QueryDef("q234_contamination_scorecard",
      // per-(source, benchmark) governance rollup of q233: flagged-doc
      // counts and exact ppm of each source — the "drop source X for
      // this benchmark family" table, sparse over pairs with flags
      (s, d) => {
        val docs = Tpch.table(s, d, "documents").withColumn("split",
          Sampling.hashSplit(col("doc_id"), Seq("train" -> 0.9, "val" -> 0.05),
            rest = "test"))
        Decontaminate.contaminationBySource(
          docs.filter(col("split") === "train"),
          docs.filter(col("split") === "test")
            .withColumn("bench", concat(lit("bench"), col("doc_id") % 3)),
          "doc_id", "text", "source", "bench", n = 5, flagAtPct = 20)
          .orderBy("source", "eval_set")
      },
      Some("""WITH s AS (SELECT doc_id, text, source,
             |    CASE WHEN b < 900 THEN 'train' WHEN b < 950 THEN 'val' ELSE 'test' END AS split
             |  FROM (SELECT doc_id, text, source,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 AS b
             |    FROM documents)),
             |t AS (SELECT doc_id, source, string_split_regex(trim(lower(text)), '\s+') AS tok
             |  FROM s WHERE split = 'train'),
             |e AS (SELECT 'bench' || CAST(doc_id % 3 AS VARCHAR) AS eval_set,
             |    string_split_regex(trim(lower(text)), '\s+') AS tok
             |  FROM s WHERE split = 'test'),
             |tg AS (SELECT doc_id, unnest(CASE WHEN len(tok) < 5 THEN [array_to_string(tok, ' ')]
             |  ELSE list_distinct(list_transform(range(len(tok)-4),
             |    i -> array_to_string(tok[i+1:i+5], ' '))) END) AS g FROM t),
             |eg AS (SELECT DISTINCT eval_set, unnest(CASE WHEN len(tok) < 5 THEN [array_to_string(tok, ' ')]
             |  ELSE list_distinct(list_transform(range(len(tok)-4),
             |    i -> array_to_string(tok[i+1:i+5], ' '))) END) AS g FROM e),
             |tot AS (SELECT doc_id, count(*) AS n_grams FROM tg GROUP BY 1),
             |fl AS (SELECT tg.doc_id, eg.eval_set
             |  FROM tg JOIN eg ON tg.g = eg.g JOIN tot ON tg.doc_id = tot.doc_id
             |  GROUP BY 1, 2, tot.n_grams HAVING count(*) * 100 >= tot.n_grams * 20),
             |ps AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
             |  FROM t GROUP BY 1)
             |SELECT td.source, fl.eval_set, ps.n_docs,
             |  CAST(count(*) AS BIGINT) AS n_flagged,
             |  CAST((count(*) * 1000000) // ps.n_docs AS BIGINT) AS flagged_ppm
             |FROM fl JOIN (SELECT DISTINCT doc_id, source FROM t) td USING (doc_id)
             |JOIN ps USING (source)
             |GROUP BY 1, 2, 3 ORDER BY source, eval_set""".stripMargin)),

    QueryDef("q124_bloom_decontaminate",
      // q79's report through the UNBOUNDED-eval plan: no broadcast —
      // a bloom sketch of the eval n-gram hashes (built executor-side,
      // one bit-array to the driver) prefilters the train grams, and
      // only probable hits reach the exact-confirm shuffle join. Same
      // oracle as q79: the sketch changes the plan, never the answer.
      (s, d) => {
        val docs = Tpch.table(s, d, "documents").withColumn("split",
          Sampling.hashSplit(col("doc_id"), Seq("train" -> 0.9, "val" -> 0.05),
            rest = "test"))
        Decontaminate.evalOverlapBloom(
          docs.filter(col("split") === "train"),
          docs.filter(col("split") === "test"),
          "doc_id", "text", n = 5, flagAtPct = 20)
          .orderBy("doc_id")
      },
      Some("""WITH s AS (SELECT doc_id, text,
             |    CASE WHEN b < 900 THEN 'train' WHEN b < 950 THEN 'val' ELSE 'test' END AS split
             |  FROM (SELECT doc_id, text,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 AS b
             |    FROM documents)),
             |t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tok
             |  FROM s WHERE split = 'train'),
             |e AS (SELECT string_split_regex(trim(lower(text)), '\s+') AS tok
             |  FROM s WHERE split = 'test'),
             |tg AS (SELECT doc_id, unnest(CASE WHEN len(tok) < 5 THEN [array_to_string(tok, ' ')]
             |  ELSE list_distinct(list_transform(range(len(tok)-4),
             |    i -> array_to_string(tok[i+1:i+5], ' '))) END) AS g FROM t),
             |eg AS (SELECT DISTINCT unnest(CASE WHEN len(tok) < 5 THEN [array_to_string(tok, ' ')]
             |  ELSE list_distinct(list_transform(range(len(tok)-4),
             |    i -> array_to_string(tok[i+1:i+5], ' '))) END) AS g FROM e)
             |SELECT tg.doc_id, count(*) AS n_grams, count(eg.g) AS n_hit,
             |  (count(eg.g) * 100 >= count(*) * 20) AS contaminated
             |FROM tg LEFT JOIN eg ON tg.g = eg.g
             |GROUP BY 1 ORDER BY doc_id""".stripMargin)),

    QueryDef("q127_fuzzy_decontaminate",
      // FUZZY decontamination: q79's train/test split, but flagging
      // train docs that are NEAR-duplicates of any test doc (3-shingle
      // jaccard >= 0.5) — the paraphrase-leakage check that exact
      // n-gram overlap misses. Candidates come from CROSS-corpus LSH
      // banding (the benchmark-sized eval side broadcasts; the train
      // side never self-joins, so cost is linear in the corpus), and
      // exact shingle verification makes the report equal the
      // exhaustive cross-product truth the oracle recomputes. Banding
      // r=3 x b=8 as q56: this corpus's true near-dup pairs sit at
      // j >= 0.9 where per-pair recall exceeds 1-3e-5, so the hash
      // check is a genuine recall gate
      (s, d) => {
        val sigs = docSignatures(s, d, 3, 24).withColumn("split",
          Sampling.hashSplit(col("doc"), Seq("train" -> 0.9, "val" -> 0.05),
            rest = "test"))
        Decontaminate.fuzzyEvalOverlapSigs(
          sigs.filter(col("split") === "train").drop("split"),
          sigs.filter(col("split") === "test").drop("split"),
          "doc_id", numHashes = 24, bands = 8, threshold = 0.5)
          .orderBy("doc_id")
      },
      Some(s"""WITH spl AS (SELECT doc_id,
           |    CASE WHEN b < 900 THEN 'train' WHEN b < 950 THEN 'val' ELSE 'test' END AS split
           |  FROM (SELECT doc_id,
           |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 AS b
           |    FROM documents)),
           |s AS ($shingleSql),
           |t AS (SELECT s.doc_id, sh FROM s JOIN spl USING (doc_id) WHERE split = 'train'),
           |e AS (SELECT s.doc_id AS eid, sh AS she FROM s JOIN spl USING (doc_id) WHERE split = 'test'),
           |p AS (SELECT t.doc_id, CAST(len(list_intersect(t.sh, e.she)) AS DOUBLE) /
           |    (len(t.sh) + len(e.she) - len(list_intersect(t.sh, e.she))) AS j
           |  FROM t CROSS JOIN e),
           |m AS (SELECT doc_id, count(*) AS n_eval_near, max(j) AS mj
           |  FROM p WHERE j >= 0.5 GROUP BY 1)
           |SELECT t.doc_id, coalesce(n_eval_near, 0) AS n_eval_near,
           |  round(coalesce(mj, 0), 6) AS max_jaccard,
           |  coalesce(n_eval_near, 0) > 0 AS contaminated
           |FROM (SELECT DISTINCT doc_id FROM t) t LEFT JOIN m USING (doc_id)
           |ORDER BY doc_id""".stripMargin)),

    QueryDef("q131_kmeans",
      // Distributed Lloyd k-means exposed as an operator (the engine
      // the IVF coarse quantizer already runs, Similarity.ivfTrain):
      // deterministic init from the k lowest-id vectors, 2 assignment/
      // mean rounds, final cluster assignment for every vector. Each
      // round is one broadcast-literal assignment pass + one
      // positional-mean aggregation — the only driver traffic is the
      // k x dim centroid matrix (codebook discipline). Per-round
      // centroid rounding to 6 decimals is the cross-engine
      // determinism contract (avg is summation-order-dependent at
      // ~1e-16; rounding absorbs it before it compounds), which is
      // what lets the oracle replay BOTH Lloyd rounds value-for-value
      (s, d) => {
        val emb = Tpch.table(s, d, "embeddings")
        val cents = Similarity.ivfTrain(emb, "embedding", "vec_id", k = 8,
          iterations = 2, roundTo = Some(6))
        Similarity.ivfAssign(emb, "embedding", cents)
          .select(col("vec_id"), col("ivf_cluster").as("cluster"))
          .orderBy("vec_id")
      },
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
           |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, e AS c
           |  FROM (SELECT * FROM v ORDER BY vec_id LIMIT 8)),
           |a1 AS (SELECT vec_id, cl FROM (
           |    SELECT v.vec_id, c0.cl,
           |      row_number() OVER (PARTITION BY v.vec_id
           |        ORDER BY list_distance(v.e, c0.c), c0.cl) AS rn
           |    FROM v CROSS JOIN c0) WHERE rn = 1),
           |m1 AS (SELECT c0.cl, coalesce(mm.c, c0.c) AS c FROM c0 LEFT JOIN (
           |    SELECT cl, list(av ORDER BY i) AS c FROM (
           |      SELECT a1.cl, t.i, round(avg(v.e[t.i]), 6) AS av
           |      FROM a1 JOIN v USING (vec_id),
           |        LATERAL (SELECT unnest(range(1, len(v.e)+1)) AS i) t
           |      GROUP BY 1, 2) GROUP BY 1) mm ON c0.cl = mm.cl),
           |a2 AS (SELECT vec_id, cl FROM (
           |    SELECT v.vec_id, m1.cl,
           |      row_number() OVER (PARTITION BY v.vec_id
           |        ORDER BY list_distance(v.e, m1.c), m1.cl) AS rn
           |    FROM v CROSS JOIN m1) WHERE rn = 1),
           |m2 AS (SELECT m1.cl, coalesce(mm.c, m1.c) AS c FROM m1 LEFT JOIN (
           |    SELECT cl, list(av ORDER BY i) AS c FROM (
           |      SELECT a2.cl, t.i, round(avg(v.e[t.i]), 6) AS av
           |      FROM a2 JOIN v USING (vec_id),
           |        LATERAL (SELECT unnest(range(1, len(v.e)+1)) AS i) t
           |      GROUP BY 1, 2) GROUP BY 1) mm ON m1.cl = mm.cl)
           |SELECT vec_id, CAST(cl AS INTEGER) AS cluster FROM (
           |  SELECT v.vec_id, m2.cl,
           |    row_number() OVER (PARTITION BY v.vec_id
           |      ORDER BY list_distance(v.e, m2.c), m2.cl) AS rn
           |  FROM v CROSS JOIN m2) WHERE rn = 1
           |ORDER BY vec_id""".stripMargin)),

    QueryDef("q132_embedding_outliers",
      // Per-label embedding outlier audit (mislabeled-data pruning):
      // distance to the OWN label's centroid, flagged beyond
      // mean + 2 sigma of the label's distance distribution. Centroids
      // and label stats are label-vocabulary-sized aggregations that
      // broadcast back onto the corpus; the distance is three codegen
      // dot products per row. Rounding contract per labelOutliers
      // scaladoc — the oracle replays centroid, distance, and
      // threshold arithmetic exactly
      (s, d) => Similarity.labelOutliers(Tpch.table(s, d, "embeddings"),
          "embedding", "vec_id", "label", sigmas = 2.0)
        .orderBy("vec_id"),
      Some("""WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
           |  FROM embeddings),
           |cent AS (SELECT label, list(av ORDER BY i) AS c FROM (
           |    SELECT label, t.i, round(avg(e[t.i]), 6) AS av
           |    FROM v, LATERAL (SELECT unnest(range(1, len(v.e)+1)) AS i) t
           |    GROUP BY 1, 2) GROUP BY 1),
           |d AS (SELECT vec_id, v.label,
           |    round(sqrt(greatest(list_inner_product(e, e)
           |      - 2*list_inner_product(e, c)
           |      + list_inner_product(c, c), 0)), 6) AS dist
           |  FROM v JOIN cent USING (label)),
           |st AS (SELECT label, round(avg(dist) + 2.0*stddev_samp(dist), 6) AS thr
           |  FROM d GROUP BY 1)
           |SELECT vec_id, d.label, dist, dist > thr AS is_outlier
           |FROM d JOIN st USING (label) ORDER BY vec_id""".stripMargin)),

    QueryDef("q125_filtered_ann",
      // Metadata-FILTERED ANN (the "vector search with a WHERE clause"
      // every retrieval deployment runs): the probe hits the written
      // metadata-carrying LSH store, so ONE partition-pruned scan
      // applies the attribute predicate (label = 3, parquet-pushed)
      // and the bucket pruning together — no candidate join back to
      // the base table. Audit contract like q59: result count plus
      // recall@10 vs the in-engine exact top-10 OVER THE FILTERED SET
      // above a floor. The filter thins each bucket ~10x, so the probe
      // widens relative to q59's unfiltered knobs: coarser buckets
      // (nBits 4 -> 3) and twice the tables (8 -> 16) — measured
      // recall@10 here is 9 vs q59's shape at 6; the floor stays 6.
      (s, d) => {
        import s.implicits._
        // FULL table on both sides (the q112/q190 shared-store
        // convention): the store key must mean the same contents no
        // matter which surface — this row or the REST lsh tier —
        // builds it first
        val emb = Tpch.table(s, d, "embeddings")
        val q = emb.filter(col("vec_id") === 0)
          .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
        val ann = Similarity.annTopKStoredFiltered(emb, "embedding", "vec_id",
            d, q, k = 10, predicate = col("label") === 3,
            metaCols = Seq("label"), nBits = 3, nTables = 16)
          .select("id").collect().map(_.getLong(0)).toSet
        val exact = Similarity.bruteForceTopK(
            emb.filter(col("label") === 3), "embedding", "vec_id", q, 10)
          .select("id").collect().map(_.getLong(0)).toSet
        Seq((0L, ann.size.toLong, (ann & exact).size >= 6))
          .toDF("query_id", "n_results", "recall_ok")
      },
      Some("""SELECT CAST(0 AS BIGINT) AS query_id, CAST(10 AS BIGINT) AS n_results,
             |  true AS recall_ok""".stripMargin)),

    QueryDef("q190_ivfpq_filtered",
      // Metadata-FILTERED ANN on the COMPOSED at-scale store (q125's
      // contract on q112's store): the predicate (label = 3) applies to
      // the probed cells' code rows BEFORE ADC ranking — one
      // partition-pruned + parquet-pushed scan, never a candidate join
      // back to the base table. The filter thins each cell ~10x and
      // the probe width is DERIVED from the store's measured filtered
      // yield (Similarity.ivfPqTopKFiltered's adaptive default — no
      // hand-tuned widening constant); audit = result count +
      // recall@10 vs the exact top-10 OVER THE FILTERED SET, floor 6
      // (the q59/q112/q125 discipline)
      (s, d) => {
        import s.implicits._
        // the store holds the FULL embeddings table (the q112
        // convention — the shared store key must mean the same
        // contents to every surface that builds it, incl. the REST
        // ann_search ivfpq tier); the exact ground truth filters the
        // same full table, so the self-match lands in both sets iff
        // vec 0 wears the probed label
        val emb = Tpch.table(s, d, "embeddings")
        val q = emb.filter(col("vec_id") === 0)
          .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
        val ann = Similarity.ivfPqTopKFiltered(emb, "embedding", "vec_id", d,
            q, kTop = 10, k = 16, m = 8, predicate = col("label") === 3,
            metaCols = Seq("label"), candidates = 100)
          .select("id").collect().map(_.getLong(0)).toSet
        val exact = Similarity.bruteForceTopK(
            emb.filter(col("label") === 3), "embedding", "vec_id", q, 10)
          .select("id").collect().map(_.getLong(0)).toSet
        Seq((0L, ann.size.toLong, (ann & exact).size >= 6))
          .toDF("query_id", "n_results", "recall_ok")
      },
      Some("""SELECT CAST(0 AS BIGINT) AS query_id, CAST(10 AS BIGINT) AS n_results,
             |  true AS recall_ok""".stripMargin)),

    QueryDef("q80_repetition",
      // Gopher-rule repetition filters at token granularity; exact
      // per-myriad integers (10000 div) — no floating point on either
      // engine, so the flags are bit-stable
      (s, d) => TextAnalysis.repetitionMetrics(
          Tpch.table(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
             |    ELSE string_split_regex(trim(lower(text)), '\s+') END AS tok
             |  FROM documents),
             |uni AS (SELECT doc_id, tk, count(*) AS c
             |  FROM (SELECT doc_id, unnest(tok) AS tk FROM t) GROUP BY 1, 2),
             |us AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             |    count(*) AS n_distinct, max(c) AS top_c FROM uni GROUP BY 1),
             |bg AS (SELECT doc_id, g, count(*) AS c
             |  FROM (SELECT doc_id, unnest(CASE WHEN len(tok) < 2 THEN [array_to_string(tok, ' ')]
             |    ELSE list_transform(range(len(tok)-1),
             |      i -> array_to_string(tok[i+1:i+2], ' ')) END) AS g FROM t) GROUP BY 1, 2),
             |bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
             |    count(*) AS n_distinct_bi FROM bg GROUP BY 1)
             |SELECT t.doc_id, COALESCE(n_tokens, 0) AS n_tokens,
             |  CASE WHEN n_tokens IS NULL THEN 0
             |    ELSE (n_tokens - n_distinct) * 10000 // n_tokens END AS dup_token_pm,
             |  CASE WHEN n_tokens IS NULL THEN 0
             |    ELSE top_c * 10000 // n_tokens END AS top_token_pm,
             |  (n_bigrams - n_distinct_bi) * 10000 // n_bigrams AS dup_bigram_pm,
             |  (CASE WHEN n_tokens IS NULL THEN 0
             |     ELSE (n_tokens - n_distinct) * 10000 // n_tokens END > 3000
             |    OR (n_bigrams - n_distinct_bi) * 10000 // n_bigrams > 1000) AS flagged
             |FROM t LEFT JOIN us USING (doc_id) JOIN bs USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // ---- events / sessionization --------------------------------------
    QueryDef("q60_window_agg",
      (s, d) => events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          centsToDollars(sum(cents(col("value")))).as("total_value"))
        .orderBy("bucket", "event_type"),
      Some("""SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
             |  count(*) AS n,
             |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS total_value
             |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin)),

    QueryDef("q160_acf",
      // per-series autocorrelation at lags 1..3 over hourly bucket
      // sums — the periodicity probe before any forecasting model.
      // Floor-mean deviations in integer cents keep num/den exact
      // int64 sums (the documented contract; an exact rational mean
      // needs n²-scaled products that overflow on long series); the
      // final ratio is one IEEE divide rounded to 6 (q135 discipline).
      // One window pass computes all three leads; everything
      // partitions by the series key
      (s, d) => graft.operators.TimeSeries.autocorrelation(
          events(s, d), "event_type", "ts", "value", maxLag = 3)
        .orderBy("event_type", "lag"),
      Some("""WITH hb AS (SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS h,
             |    sum(CAST(round(value*100) AS BIGINT)) AS x
             |  FROM events GROUP BY 1, 2),
             |st AS (SELECT event_type, count(*) AS n, sum(x) AS s FROM hb GROUP BY 1),
             |dv AS (SELECT hb.event_type, hb.h, hb.x - (st.s // st.n) AS d
             |  FROM hb JOIN st USING (event_type)),
             |ld AS (SELECT event_type, d,
             |    lead(d, 1) OVER w AS d1, lead(d, 2) OVER w AS d2, lead(d, 3) OVER w AS d3
             |  FROM dv WINDOW w AS (PARTITION BY event_type ORDER BY h)),
             |un AS (
             |  SELECT event_type, d, 1 AS lag, d1 AS dl FROM ld
             |  UNION ALL SELECT event_type, d, 2, d2 FROM ld
             |  UNION ALL SELECT event_type, d, 3, d3 FROM ld)
             |SELECT event_type, CAST(lag AS BIGINT) AS lag,
             |  CAST(count(dl) AS BIGINT) AS n_pairs,
             |  CASE WHEN sum(d*d) = 0 OR count(dl) = 0 THEN 0.0
             |    ELSE round(CAST(sum(CASE WHEN dl IS NOT NULL THEN d*dl END) AS DOUBLE)
             |      / sum(d*d), 6) END AS acf
             |FROM un GROUP BY 1, 2 ORDER BY event_type, lag""".stripMargin)),

    QueryDef("q162_session_records",
      // gap-based sessionization into PER-SESSION RECORDS — q61's
      // per-user count expanded to one row per session (ordinal,
      // start/end, event count, duration). The lag probe and the
      // running session-index sum share one (user) exchange + (ts,
      // event_id) sort; the rollup is a hash aggregate on
      // (user, session_idx). Durations subtract floor-second casts,
      // the same boundary-crossing contract q61 pinned
      (s, d) => graft.operators.TimeSeries.sessions(
          events(s, d), "user_id", "ts", "event_id", gapSeconds = 1800L)
        .orderBy("user_id", "session_idx"),
      Some("""WITH o AS (SELECT user_id, ts, event_id,
             |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |  FROM events),
             |f AS (SELECT user_id, ts, event_id,
             |    CASE WHEN prev_ts IS NULL
             |      OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS nw
             |  FROM o),
             |r AS (SELECT user_id, ts,
             |    sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                  ROWS UNBOUNDED PRECEDING) AS session_idx
             |  FROM f)
             |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
             |  min(ts) AS start_ts, max(ts) AS end_ts, count(*) AS n_events,
             |  CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_s
             |FROM r GROUP BY 1, 2 ORDER BY user_id, session_idx""".stripMargin)),

    QueryDef("q163_level_shifts",
      // two-sided sliding-window level-shift screen over per-type
      // hourly revenue: trailing-24h sum vs leading-24h sum at every
      // observed bucket with full windows both sides, candidates past
      // the cents threshold. The windowed scan statistic is the
      // changepoint screen that (unlike recursive CUSUM) is one
      // ordered window pass — both frames share a single per-series
      // exchange + sort; all arithmetic exact int64 cents
      (s, d) => graft.operators.TimeSeries.levelShifts(
          events(s, d), "event_type", "ts", "value",
          w = 24, minDiffCents = 40000L)
        .orderBy("event_type", "bucket"),
      Some("""WITH hb AS (SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS bucket,
             |    sum(CAST(round(value*100) AS BIGINT)) AS x
             |  FROM events GROUP BY 1, 2),
             |wn AS (SELECT event_type, bucket,
             |    count(*) OVER tw AS nt, count(*) OVER lw AS nl,
             |    CAST(sum(x) OVER tw AS BIGINT) AS trail_cents,
             |    CAST(sum(x) OVER lw AS BIGINT) AS lead_cents
             |  FROM hb WINDOW
             |    tw AS (PARTITION BY event_type ORDER BY bucket
             |           ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING),
             |    lw AS (PARTITION BY event_type ORDER BY bucket
             |           ROWS BETWEEN CURRENT ROW AND 23 FOLLOWING))
             |SELECT event_type, bucket, trail_cents, lead_cents,
             |  CAST(lead_cents - trail_cents AS BIGINT) AS diff_cents
             |FROM wn WHERE nt = 24 AND nl = 24
             |  AND abs(lead_cents - trail_cents) >= 40000
             |ORDER BY event_type, bucket""".stripMargin)),

    QueryDef("q169_ewma",
      // dyadic EWMA (α = 1/2) over the last 8 observed hourly buckets
      // per type: Σ xᵢ·2ⁱ / (2ᵐ−1) with exact int64 numerator — the
      // geometric profile without a float recurrence. One per-series
      // window whose frame folds at most 8 values; the oracle replays
      // the weights through a rank-bounded self-join
      (s, d) => graft.operators.TimeSeries.ewma(
          events(s, d), "event_type", "ts", "value", lookback = 8)
        .orderBy("event_type", "bucket"),
      Some("""WITH hb AS (SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS bucket,
             |    sum(CAST(round(value*100) AS BIGINT)) AS x
             |  FROM events GROUP BY 1, 2),
             |rn AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY bucket) AS t
             |  FROM hb),
             |w AS (SELECT a.event_type, a.bucket, a.t, b.t AS bt, b.x
             |  FROM rn a JOIN rn b
             |    ON a.event_type = b.event_type AND b.t BETWEEN a.t - 7 AND a.t),
             |agg AS (SELECT event_type, bucket, t, count(*) AS m,
             |    sum(x * (1::BIGINT << CAST(bt - greatest(1, t - 7) AS INT))) AS num
             |  FROM w GROUP BY 1, 2, 3)
             |SELECT event_type, bucket, CAST(m AS BIGINT) AS n_window,
             |  round(CAST(num AS DOUBLE)
             |    / CAST((1::BIGINT << CAST(m AS INT)) - 1 AS DOUBLE), 6) AS ewma
             |FROM agg ORDER BY event_type, bucket""".stripMargin)),

    QueryDef("q171_trend",
      // per-type least-squares trend over the hourly sequence: exact
      // int64 normal-equation sums, slope one divide rounded 6,
      // intercept derived from the ROUNDED slope (the shared-contract
      // move that keeps both engines on identical doubles). The
      // oracle replays sums, slope, and intercept term-for-term
      (s, d) => graft.operators.TimeSeries.trend(
          events(s, d), "event_type", "ts", "value")
        .orderBy("event_type"),
      Some("""WITH hb AS (SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS h,
             |    sum(CAST(round(value*100) AS BIGINT)) AS y
             |  FROM events GROUP BY 1, 2),
             |xy AS (SELECT event_type, y,
             |    row_number() OVER (PARTITION BY event_type ORDER BY h) - 1 AS x
             |  FROM hb),
             |st AS (SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             |    sum(x*y) AS sxy, sum(x*x) AS sxx
             |  FROM xy GROUP BY 1),
             |sl AS (SELECT *,
             |    CASE WHEN n*sxx - sx*sx = 0 THEN 0.0
             |      ELSE round(CAST(n*sxy - sx*sy AS DOUBLE)
             |        / CAST(n*sxx - sx*sx AS DOUBLE), 6) END AS slope
             |  FROM st)
             |SELECT event_type, n, slope,
             |  round((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
             |    / CAST(n AS DOUBLE), 6) AS intercept
             |FROM sl ORDER BY event_type""".stripMargin)),

    QueryDef("q172_quantile_sketch",
      // mergeable-sketch percentile audit (the q37 HLL pattern for
      // quantiles): exact interpolated p50/p90 computed on BOTH
      // engines, plus Spark's approx_percentile (GK sketch, rank
      // error ≤ 1/accuracy = 1%) checked against the exact ±2%-rank
      // bracket — sketch VALUES differ per engine by construction, so
      // the oracle checks the exact values and the error CONTRACT
      (s, d) => events(s, d).groupBy("event_type").agg(
          percentile(col("value"), lit(0.5)).as("__p50"),
          percentile(col("value"), lit(0.9)).as("__p90"),
          percentile(col("value"), lit(0.48)).as("__lo50"),
          percentile(col("value"), lit(0.52)).as("__hi50"),
          percentile(col("value"), lit(0.88)).as("__lo90"),
          percentile(col("value"), lit(0.92)).as("__hi90"),
          approx_percentile(col("value"), lit(0.5), lit(100)).as("__a50"),
          approx_percentile(col("value"), lit(0.9), lit(100)).as("__a90"))
        .select(col("event_type"),
          round(col("__p50"), 6).as("p50_exact"),
          round(col("__p90"), 6).as("p90_exact"),
          (col("__a50") >= col("__lo50") && col("__a50") <= col("__hi50")).as("approx50_ok"),
          (col("__a90") >= col("__lo90") && col("__a90") <= col("__hi90")).as("approx90_ok"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
             |  round(quantile_cont(value, 0.5), 6) AS p50_exact,
             |  round(quantile_cont(value, 0.9), 6) AS p90_exact,
             |  true AS approx50_ok, true AS approx90_ok
             |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin)),

    QueryDef("q174_seasonal_residuals",
      // day-over-day seasonal-naive residuals: each hourly bucket vs
      // the SAME wall-clock hour 24 h earlier via an equality-keyed
      // self-join (gap-honest — unobserved ancestors exclude the row,
      // where a sequence lag would silently compare across gaps);
      // exact int64 cents
      (s, d) => graft.operators.TimeSeries.seasonalResiduals(
          events(s, d), "event_type", "ts", "value",
          seasonHours = 24, minResidCents = 0L)
        .orderBy("event_type", "bucket"),
      Some("""WITH hb AS (SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS bucket,
             |    sum(CAST(round(value*100) AS BIGINT)) AS x
             |  FROM events GROUP BY 1, 2)
             |SELECT a.event_type, a.bucket, CAST(a.x AS BIGINT) AS cents,
             |  CAST(b.x AS BIGINT) AS prior_cents,
             |  CAST(a.x - b.x AS BIGINT) AS residual_cents
             |FROM hb a JOIN hb b
             |  ON a.event_type = b.event_type
             |  AND b.bucket + INTERVAL 24 HOURS = a.bucket
             |ORDER BY a.event_type, a.bucket""".stripMargin)),

    QueryDef("q61_sessionize",
      // gap-based sessionization (30 min): session count + mean length
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        events(s, d)
          .withColumn("prev_ts", lag("ts", 1).over(w))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
              col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L).otherwise(0L))
          .groupBy("user_id")
          .agg(sum("new_session").as("n_sessions"), count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
             |FROM (
             |  SELECT user_id, CASE WHEN prev_ts IS NULL
             |      OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS new_session
             |  FROM (SELECT user_id, ts, event_id,
             |          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |        FROM events))
             |GROUP BY 1 ORDER BY user_id""".stripMargin)),

    QueryDef("q62_event_stats",
      (s, d) => events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          countDistinct("user_id").as("n_users"),
          min("event_id").as("first_id"), max("event_id").as("last_id"))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
             |  min(event_id) AS first_id, max(event_id) AS last_id
             |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin)),

    QueryDef("q128_gapfill",
      // Regular-grid resampling + LOCF gap-fill: every user's event
      // stream densified to an hourly grid spanning their own
      // [first, last] event hours, empty hours carrying the last
      // observed value forward. Grid generation is sequence+explode
      // (no calendar table, no driver loop); the fill is a running
      // last(ignoreNulls) window partitioned by user, so state never
      // crosses series. Within-bucket "last" is pinned to max
      // (ts, event_id), not aggregation order — that determinism is
      // what the oracle's rn=1 window replays
      (s, d) => TimeSeries.resampleLocf(events(s, d), "user_id", "ts",
          "value", Seq(col("ts"), col("event_id")))
        .orderBy("user_id", "bucket"),
      Some("""WITH ranked AS (
             |  SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS bucket, value,
             |    row_number() OVER (PARTITION BY user_id, time_bucket(INTERVAL '1 hour', ts)
             |                       ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events),
             |h AS (SELECT user_id, bucket, count(*) AS n,
             |    max(CASE WHEN rn = 1 THEN value END) AS last_v
             |  FROM ranked GROUP BY 1, 2),
             |b AS (SELECT user_id, time_bucket(INTERVAL '1 hour', min(ts)) AS h0,
             |    time_bucket(INTERVAL '1 hour', max(ts)) AS h1 FROM events GROUP BY 1),
             |g AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS bucket
             |  FROM b)
             |SELECT g.user_id, g.bucket, coalesce(h.n, 0) AS n_events,
             |  last_value(h.last_v IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.bucket
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
             |FROM g LEFT JOIN h ON g.user_id = h.user_id AND g.bucket = h.bucket
             |ORDER BY g.user_id, g.bucket""".stripMargin)),

    QueryDef("q129_entity_match",
      // Blocked fuzzy entity matching (record linkage): candidate
      // pairs from an EQUI-join on the (nation, segment) blocking key
      // — never a cross join — then levenshtein <= 2 within blocks.
      // Blocking is the scale discipline: cost is sum(|block|^2),
      // controlled by the key, hash-partitioned across blocks
      (s, d) => Dedup.blockedEditDistancePairs(
          Tpch.table(s, d, "customer"), "c_custkey", "c_name",
          Seq("c_nationkey", "c_mktsegment"), maxDist = 2)
        .orderBy("id_a", "id_b"),
      Some("""SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             |  a.c_name AS name_a, b.c_name AS name_b,
             |  levenshtein(a.c_name, b.c_name) AS dist
             |FROM customer a JOIN customer b
             |  ON a.c_nationkey = b.c_nationkey AND a.c_mktsegment = b.c_mktsegment
             |  AND a.c_custkey < b.c_custkey
             |WHERE levenshtein(a.c_name, b.c_name) <= 2
             |ORDER BY id_a, id_b""".stripMargin)),

    QueryDef("q133_interpolate",
      // q128's dense grid with LINEAR interpolation instead of the
      // LOCF step: empty buckets lerp between the bracketing observed
      // buckets (positioned by time), tail buckets carry forward.
      // One extra per-series window over the same sorted grid — no
      // extra shuffle. Floored at micro-units (NOT rounded: cent
      // lerps over 2^k-hour gaps land exactly on 6-decimal halves,
      // where engines' round-half rules disagree — TimeSeries
      // scaladoc); the lerp is bit-identical IEEE arithmetic
      // restated verbatim in the oracle
      (s, d) => TimeSeries.resampleInterp(events(s, d), "user_id", "ts",
          "value", Seq(col("ts"), col("event_id")))
        .orderBy("user_id", "bucket"),
      Some("""WITH ranked AS (
             |  SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS bucket, value,
             |    row_number() OVER (PARTITION BY user_id, time_bucket(INTERVAL '1 hour', ts)
             |                       ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events),
             |h AS (SELECT user_id, bucket, count(*) AS n,
             |    max(CASE WHEN rn = 1 THEN value END) AS last_v
             |  FROM ranked GROUP BY 1, 2),
             |b AS (SELECT user_id, time_bucket(INTERVAL '1 hour', min(ts)) AS h0,
             |    time_bucket(INTERVAL '1 hour', max(ts)) AS h1 FROM events GROUP BY 1),
             |g AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS bucket
             |  FROM b),
             |j AS (SELECT g.user_id, g.bucket, coalesce(h.n, 0) AS n_events,
             |    last_value(h.last_v IGNORE NULLS) OVER w AS pv,
             |    last_value(CASE WHEN h.last_v IS NOT NULL THEN g.bucket END IGNORE NULLS) OVER w AS pt,
             |    first_value(h.last_v IGNORE NULLS) OVER w2 AS nv,
             |    first_value(CASE WHEN h.last_v IS NOT NULL THEN g.bucket END IGNORE NULLS) OVER w2 AS nt
             |  FROM g LEFT JOIN h ON g.user_id = h.user_id AND g.bucket = h.bucket
             |  WINDOW w AS (PARTITION BY g.user_id ORDER BY g.bucket
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |    w2 AS (PARTITION BY g.user_id ORDER BY g.bucket
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |SELECT user_id, bucket, n_events,
             |  floor((CASE WHEN n_events > 0 THEN pv
             |    WHEN nv IS NULL THEN pv
             |    ELSE pv + (nv - pv) * (epoch(bucket) - epoch(pt)) / (epoch(nt) - epoch(pt))
             |    END) * 1000000.0) / 1000000.0 AS value_interp
             |FROM j ORDER BY user_id, bucket""".stripMargin)),

    QueryDef("q134_rolling_anomaly",
      // Rolling z-score anomaly flags: each event scored against the
      // mean/stddev of its series' previous 20 events (self-excluded
      // frame), |z| > 3 flags, < 5 priors = warm-up (never flagged).
      // One rows-frame window per series; mean, stddev and z each
      // round to 6 (staged rounding absorbs summation-order drift
      // between engines before the division compounds it)
      (s, d) => TimeSeries.rollingZscore(events(s, d), "user_id", "value",
          Seq(col("ts"), col("event_id")))
        .select(col("event_id"), col("user_id"), col("n_prior"),
          col("z"), col("is_anomaly"))
        .orderBy("event_id"),
      Some("""WITH z AS (
             |  SELECT event_id, user_id, value,
             |    round(avg(value) OVER w, 6) AS mu,
             |    round(stddev_samp(value) OVER w, 6) AS sd,
             |    count(*) OVER w AS n_prior
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
             |SELECT event_id, user_id, n_prior,
             |  CASE WHEN n_prior >= 5 AND sd > 0 THEN round((value - mu)/sd, 6) END AS z,
             |  coalesce(n_prior >= 5 AND sd > 0 AND abs(round((value - mu)/sd, 6)) > 3,
             |    false) AS is_anomaly
             |FROM z ORDER BY event_id""".stripMargin)),

    QueryDef("q137_novelty",
      // Directional novelty audit of the ingest order: the per-myriad
      // share of each doc's DISTINCT 4-token windows not present in
      // any lower-id document. Boilerplate charges every copy, never
      // the original — the keep-the-original ranking a curation pass
      // wants. Window text reduces to 16-byte digests map-side; the
      // oracle recomputes from window TEXT, certifying the digest
      // path collision-free
      (s, d) => Dedup.noveltyScores(Tpch.table(s, d, "documents"),
          "doc_id", "text", k = 4)
        .orderBy("doc_id"),
      Some("""WITH d0 AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
             |    ELSE string_split_regex(trim(text), '\s+') END AS tk FROM documents),
             |w AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+3], ' ') AS win
             |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 3)) AS i
             |        FROM d0 WHERE len(tk) >= 4)),
             |fo AS (SELECT win, min(doc_id) AS first_doc FROM w GROUP BY 1),
             |nv AS (SELECT doc_id, count(*) AS n_windows,
             |    count(*) FILTER (first_doc = doc_id) AS n_novel
             |  FROM w JOIN fo USING (win) GROUP BY 1)
             |SELECT d0.doc_id, CAST(coalesce(n_windows, 0) AS BIGINT) AS n_windows,
             |  CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel,
             |  CAST(coalesce(n_novel, 0) * 10000 // greatest(coalesce(n_windows, 0), 1) AS BIGINT)
             |    AS novelty_pm
             |FROM d0 LEFT JOIN nv USING (doc_id) ORDER BY doc_id""".stripMargin)),

    QueryDef("q139_entity_match_jw",
      // q129's blocked record linkage with Jaro-Winkler as the
      // measure (the census name-matcher: positional tolerance +
      // common-prefix bonus), via the native codegen
      // JaroWinklerExpression — rapidfuzz/DuckDB semantics, rounded
      // to 6 BEFORE thresholding so the kept-pair set is a
      // printed-precision contract. Same equi-join blocking: cost
      // stays sum(|block|^2), never a cross join
      (s, d) => Dedup.blockedJaroWinklerPairs(
          Tpch.table(s, d, "customer"), "c_custkey", "c_name",
          Seq("c_nationkey", "c_mktsegment"), minSim = 0.96)
        .orderBy("id_a", "id_b"),
      Some("""SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             |  a.c_name AS name_a, b.c_name AS name_b,
             |  round(jaro_winkler_similarity(a.c_name, b.c_name), 6) AS jw
             |FROM customer a JOIN customer b
             |  ON a.c_nationkey = b.c_nationkey AND a.c_mktsegment = b.c_mktsegment
             |  AND a.c_custkey < b.c_custkey
             |WHERE round(jaro_winkler_similarity(a.c_name, b.c_name), 6) >= 0.96
             |ORDER BY id_a, id_b""".stripMargin)),

    QueryDef("q140_funnel",
      // Windowed conversion funnel (view → click within 24h →
      // purchase within 24h), earliest-completion semantics with a
      // total (ts, event_id) event order. Order matters (a click
      // before the first view doesn't count) and so does the window
      // (the unbounded funnel converts everyone on this data — the
      // 24h bound is what splits the population 90/35/25). One
      // filtered aggregate per step, all on the user key; no windows
      // over the whole stream, no per-user collect
      (s, d) => TimeSeries.funnel(events(s, d), "user_id", "ts", "event_id",
          Seq(col("event_type") === "view", col("event_type") === "click",
            col("event_type") === "purchase"),
          withinHours = Some(24))
        .orderBy("user_id"),
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
             |s1 AS (SELECT user_id, ts AS t1, event_id AS e1 FROM (
             |    SELECT user_id, ts, event_id,
             |      row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |    FROM events WHERE event_type = 'view') WHERE rn = 1),
             |s2 AS (SELECT user_id, ts AS t2, event_id AS e2 FROM (
             |    SELECT e.user_id, e.ts, e.event_id,
             |      row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
             |    FROM events e JOIN s1 USING (user_id)
             |    WHERE e.event_type = 'click' AND (e.ts > t1 OR (e.ts = t1 AND e.event_id > e1))
             |      AND e.ts <= t1 + INTERVAL 24 HOUR) WHERE rn = 1),
             |s3 AS (SELECT user_id, ts AS t3, event_id AS e3 FROM (
             |    SELECT e.user_id, e.ts, e.event_id,
             |      row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
             |    FROM events e JOIN s2 USING (user_id)
             |    WHERE e.event_type = 'purchase' AND (e.ts > t2 OR (e.ts = t2 AND e.event_id > e2))
             |      AND e.ts <= t2 + INTERVAL 24 HOUR) WHERE rn = 1)
             |SELECT u.user_id, t1 AS step1_ts, t2 AS step2_ts, t3 AS step3_ts,
             |  CAST(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END
             |     + CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END
             |     + CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS steps_completed,
             |  t3 IS NOT NULL AS converted
             |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
             |  LEFT JOIN s3 USING (user_id)
             |ORDER BY user_id""".stripMargin)),

    QueryDef("q141_histogram",
      // per-type equi-width value histogram (profiling / feature
      // audit): each event type's own [min, max] range split into 10
      // bins. Integer bins and counts; the endpoints are raw data
      // values (no arithmetic), and the bin index is one identical
      // IEEE expression per row. Two hash aggs + one group-grain
      // equi-join — no BNLJ, no window
      (s, d) => TimeSeries.valueHistogram(events(s, d), "event_type", "value",
          bins = 10)
        .orderBy("event_type", "bin"),
      Some("""WITH rg AS (SELECT event_type, min(value) AS lo, max(value) AS hi
             |  FROM events GROUP BY 1),
             |b AS (SELECT e.event_type, rg.lo, rg.hi,
             |    CASE WHEN rg.hi = rg.lo THEN 0
             |      ELSE least(CAST(floor((e.value - rg.lo) * 10 / (rg.hi - rg.lo)) AS BIGINT), 9)
             |    END AS bin
             |  FROM events e JOIN rg USING (event_type))
             |SELECT event_type, CAST(bin AS BIGINT) AS bin, count(*) AS n, lo, hi
             |FROM b GROUP BY 1, 2, 4, 5 ORDER BY event_type, bin""".stripMargin)),

    QueryDef("q142_retention",
      // Cohort retention matrix: users cohorted by first-activity DAY,
      // a cohort-day cell counts users with a PURCHASE that many days
      // later (day grain + the sparse behavior make it non-vacuous —
      // week-grain any-activity retention is 100% on this data).
      // Per-myriad integers; min-agg + distinct at (user, offset)
      // grain, joins on the cohort key only
      (s, d) => TimeSeries.retention(events(s, d), "user_id", "ts",
          col("event_type") === "purchase", truncUnit = "day")
        .select(col("cohort"), col("offset").as("day_offset"),
          col("n_active"), col("cohort_size"), col("retention_pm"))
        .orderBy("cohort", "day_offset"),
      Some("""WITH c AS (SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE) AS cohort
             |  FROM events GROUP BY 1),
             |act AS (SELECT DISTINCT e.user_id, c.cohort,
             |    CAST(datediff('day', c.cohort, CAST(date_trunc('day', e.ts) AS DATE)) AS BIGINT)
             |      AS day_offset
             |  FROM events e JOIN c USING (user_id) WHERE e.event_type = 'purchase'),
             |sz AS (SELECT cohort, count(*) AS cohort_size FROM c GROUP BY 1)
             |SELECT act.cohort, day_offset, count(*) AS n_active, sz.cohort_size,
             |  CAST(count(*) * 10000 // sz.cohort_size AS BIGINT) AS retention_pm
             |FROM act JOIN sz USING (cohort)
             |GROUP BY 1, 2, 4 ORDER BY cohort, day_offset""".stripMargin)),

    QueryDef("q143_winsorize",
      // per-type winsorization at [p05, p95] — exact interpolated
      // percentiles (the q84 cross-engine contract) joined back at
      // group grain, then a codegen clamp per row; value and verdict
      // both live at 6-decimal precision
      (s, d) => TimeSeries.winsorize(events(s, d), "event_type", "value")
        .select(col("event_id"), col("event_type"), col("value_w"), col("clipped"))
        .orderBy("event_id"),
      Some("""WITH qs AS (SELECT event_type,
             |    quantile_cont(value, 0.05) AS p05, quantile_cont(value, 0.95) AS p95
             |  FROM events GROUP BY 1)
             |SELECT event_id, e.event_type,
             |  round(least(greatest(e.value, p05), p95), 6) AS value_w,
             |  round(e.value, 6) < round(p05, 6) OR round(e.value, 6) > round(p95, 6)
             |    AS clipped
             |FROM events e JOIN qs USING (event_type)
             |ORDER BY event_id""".stripMargin)),

    QueryDef("q149_trigram_match",
      // string matching WITHOUT a fixed blocking key: candidates share
      // a RARE character trigram (df <= 40), then Jaro-Winkler-verify
      // at 0.97. The scalable record-linkage join — candidate volume
      // is bounded by (trigram rows)·maxDf/2, linear in the corpus at
      // fixed maxDf, where q129/q139's fixed-key blocks grow
      // quadratically with the data. Ubiquitous trigrams (the shared
      // 'Customer#' prefix) never generate candidates
      (s, d) => Dedup.trigramJaroWinklerPairs(
          Tpch.table(s, d, "customer"), "c_custkey", "c_name",
          maxDf = 40, minSim = 0.97)
        .orderBy("id_a", "id_b"),
      Some("""WITH t AS (SELECT c_custkey AS id, c_name AS name, substr(c_name, i, 3) AS tg
             |  FROM customer, LATERAL (SELECT unnest(range(1, length(c_name) - 1)) AS i)
             |  WHERE length(c_name) >= 3),
             |tgd AS (SELECT DISTINCT id, name, tg FROM t),
             |rare AS (SELECT tg FROM tgd GROUP BY tg HAVING count(*) <= 40),
             |k AS (SELECT tgd.id, tgd.name, tgd.tg FROM tgd JOIN rare USING (tg)),
             |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
             |    a.name AS name_a, b.name AS name_b
             |  FROM k a JOIN k b ON a.tg = b.tg AND a.id < b.id)
             |SELECT id_a, id_b, name_a, name_b,
             |  round(jaro_winkler_similarity(name_a, name_b), 6) AS jw
             |FROM cand
             |WHERE round(jaro_winkler_similarity(name_a, name_b), 6) >= 0.97
             |ORDER BY id_a, id_b""".stripMargin)),

    QueryDef("q150_transitions",
      // first-order Markov transition matrix of the event stream:
      // (type → next type) counts and per-myriad row-normalized
      // probabilities, ordered within user by the total (ts, event_id)
      // key. One lead window per user + type-pair-grain aggregation;
      // |types|² output regardless of stream size. All integer
      (s, d) => TimeSeries.transitionMatrix(events(s, d), "user_id",
          "event_type", Seq(col("ts"), col("event_id")))
        .orderBy("from_type", "to_type"),
      Some("""WITH o AS (SELECT user_id, event_type,
             |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
             |  FROM events),
             |tr AS (SELECT event_type AS from_type, nxt AS to_type, count(*) AS n
             |  FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2),
             |tot AS (SELECT from_type, sum(n) AS tot FROM tr GROUP BY 1)
             |SELECT from_type, to_type, n, CAST(n * 10000 // tot AS BIGINT) AS p_pm
             |FROM tr JOIN tot USING (from_type)
             |ORDER BY from_type, to_type""".stripMargin)),

    QueryDef("q230_temperature_mix",
      // temperature-scaled source mixing (UniMax-style α = 0.5 via
      // integer sqrt — the one sub-linear power family both engines
      // reproduce bit-exactly; see Sampling.temperatureWeights): one
      // source-grain aggregation, a 1-row total broadcast back, and a
      // 1M-token budget allocated by flattened share with per-source
      // deficits. Head sources stop drowning tail sources without
      // inverting the order
      (s, d) => Sampling.temperatureWeights(
          Tpch.table(s, d, "documents").withColumn("n_tokens",
            TextAnalysis.tokenCount(col("text")).cast("long")),
          col("source"), col("n_tokens"), budgetTokens = 1000000L)
        .orderBy("source"),
      Some(s"""WITH ${OracleFragments.tokenStatsCte},
             |a AS (SELECT d.source, count(*) AS avail_docs,
             |    CAST(sum(q.n_tokens) AS BIGINT) AS avail_tokens
             |  FROM documents d JOIN q ON d.doc_id = q.doc_id GROUP BY 1),
             |w AS (SELECT source, avail_docs, avail_tokens,
             |    CAST(floor(sqrt(CAST(avail_tokens AS DOUBLE))) AS BIGINT) AS w
             |  FROM a),
             |t AS (SELECT CAST(sum(w) AS BIGINT) AS w_total FROM w)
             |SELECT source, avail_docs, avail_tokens, w,
             |  CAST((w * 1000000) // greatest(w_total, 1) AS BIGINT) AS weight_ppm,
             |  CAST(w * (1000000 // greatest(w_total, 1)) +
             |    (w * (1000000 % greatest(w_total, 1))) // greatest(w_total, 1)
             |    AS BIGINT) AS target_tokens,
             |  CAST(greatest(0, w * (1000000 // greatest(w_total, 1)) +
             |    (w * (1000000 % greatest(w_total, 1))) // greatest(w_total, 1)
             |    - avail_tokens) AS BIGINT) AS deficit_tokens
             |FROM w CROSS JOIN t ORDER BY source""".stripMargin)),

    QueryDef("q231_vocab_coverage",
      // per-source vocabulary coverage under the global top-50 vocab
      // (q96's vocabulary): occurrence coverage (fertility proxy) and
      // distinct-type coverage (OOV breadth), both exact integer ppm.
      // The tokenizer-evaluation audit a mixed corpus runs before
      // training fragments its tail sources
      (s, d) => TextAnalysis.vocabCoverage(Tpch.table(s, d, "documents"),
          "doc_id", "text", "source", topK = 50)
        .orderBy("source"),
      Some("""WITH tk AS (SELECT doc_id,
             |    unnest(regexp_split_to_array(trim(text), '\s+')) AS token
             |  FROM documents WHERE trim(text) <> ''),
             |v AS (SELECT token FROM (
             |  SELECT token, count(*) AS n,
             |    row_number() OVER (ORDER BY count(*) DESC, token) AS rank
             |  FROM tk GROUP BY token) WHERE rank <= 50),
             |st AS (SELECT d.source, tk.token,
             |    (tk.token IN (SELECT token FROM v)) AS in_v
             |  FROM tk JOIN documents d USING (doc_id))
             |SELECT source,
             |  CAST(count(*) AS BIGINT) AS n_occurrences,
             |  CAST(sum(CASE WHEN in_v THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
             |  CAST(count(DISTINCT token) AS BIGINT) AS n_types,
             |  CAST(count(DISTINCT CASE WHEN in_v THEN token END) AS BIGINT)
             |    AS n_types_covered,
             |  CAST((sum(CASE WHEN in_v THEN 1 ELSE 0 END) * 1000000)
             |    // greatest(count(*), 1) AS BIGINT) AS coverage_ppm,
             |  CAST((count(DISTINCT CASE WHEN in_v THEN token END) * 1000000)
             |    // greatest(count(DISTINCT token), 1) AS BIGINT)
             |    AS type_coverage_ppm
             |FROM st GROUP BY source ORDER BY source""".stripMargin)),

    QueryDef("q232_gate_calibration",
      // calibration curve of the distilled quality gate (q208's
      // hash-sample-trained pocket perceptron scored over the WHOLE
      // corpus): margins in 12 fixed-width integer bins over the exact
      // [min, max] span — the drift tier's deterministic-binning
      // discipline — each bin's observed clean rate in exact ppm. A
      // monotone curve means the margin ranks quality and q211's
      // soft-curation thresholds can be placed by rate
      (s, d) => {
        val feats = gateFeatures(Tpch.table(s, d, "documents"))
        val trained = graft.operators.Classify.perceptronTrain(
          feats, gateFeatureCols, "y", rounds = gateRounds, sample = gateSample)
        val w = graft.operators.Classify.pocketWeights(trained, gateFeatureCols)
        graft.operators.Classify.calibration(
            graft.operators.Classify.score(feats, w, gateFeatureCols),
            nBins = 12)
          .orderBy("bin")
      },
      Some(s"""WITH ${OracleFragments.tokenStatsCte},
             |${OracleFragments.classifierFeaturesCte(gateBasis)},
             |${OracleFragments.classifierTrainSliceCte(gateTrainFrac)},
             |${OracleFragments.perceptronRoundsCte(gateRounds, gateFeatureCols, from = "ftr")},
             |${OracleFragments.perceptronPocketCte(gateRounds, gateFeatureCols)},
             |sc AS (SELECT f.doc_id, f.y,
             |    CAST(${pocketMarginSql} AS BIGINT) AS margin
             |  FROM f CROSS JOIN pk),
             |sp AS (SELECT min(margin) AS mn, max(margin) AS mx FROM sc)
             |SELECT ((margin - mn) * 12) // (mx - mn + 1) AS bin,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             |  CAST(min(margin) AS BIGINT) AS margin_lo,
             |  CAST(max(margin) AS BIGINT) AS margin_hi,
             |  CAST((sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) * 1000000)
             |    // count(*) AS BIGINT) AS pos_rate_ppm
             |FROM sc CROSS JOIN sp GROUP BY 1 ORDER BY bin""".stripMargin)),

    QueryDef("q235_dedup_span_removal",
      // exact-substring duplicate-span REMOVAL (Lee et al. 2022,
      // keep-first): every 8-token window also present in a LOWER-id
      // doc marks its positions covered; covered tokens are excised
      // and the cleaned text is certified via md5 — the oracle
      // re-derives coverage from window TEXT, so a hash match also
      // certifies the digest path collision-free AND the HOF excision
      // arithmetic against an independent position-join formulation
      (s, d) => Dedup.removeDupSpans(Tpch.table(s, d, "documents"),
          "doc_id", "text", k = 8)
        .orderBy("doc_id"),
      Some(OracleFragments.spanRemovalSql(8))),

    QueryDef("q236_lm_tiers",
      // CCNet-style per-language LM tiering: the q107 bigram model
      // (trained on the same md5 hash-split 'train' slice) scores
      // EVERY scoreable doc, and ntile(3) per language over the
      // deterministic (score desc, id) order labels head/middle/tail
      // — the relative-per-language cut CCNet uses instead of a global
      // absolute gate. Integer scores make the tiling engine-exact
      (s, d) => {
        val docs = Tpch.table(s, d, "documents").withColumn("split",
          Sampling.hashSplit(col("doc_id"), Seq("train" -> 0.9, "val" -> 0.05),
            rest = "test"))
        TextAnalysis.lmTiers(docs.filter(col("split") === "train"), docs,
          "doc_id", "text", "lang")
          .orderBy("doc_id")
      },
      Some("""WITH s AS (SELECT doc_id, text,
             |    CASE WHEN b < 900 THEN 'train' WHEN b < 950 THEN 'val' ELSE 'test' END AS split
             |  FROM (SELECT doc_id, text,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000 AS b
             |    FROM documents)),
             |t0 AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
             |    ELSE string_split_regex(trim(lower(text)), '\s+') END AS tk, split FROM s),
             |c1 AS (SELECT w, count(*) AS c1
             |  FROM (SELECT unnest(tk) AS w FROM t0 WHERE split = 'train') GROUP BY 1),
             |c2 AS (SELECT w1, w2, count(*) AS c2 FROM (
             |    SELECT tk[i] AS w1, tk[i+1] AS w2
             |    FROM (SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i
             |          FROM t0 WHERE split = 'train' AND len(tk) >= 2))
             |  GROUP BY 1, 2),
             |v AS (SELECT count(*) AS v FROM c1),
             |ab AS (SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
             |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i
             |        FROM t0 WHERE len(tk) >= 2)),
             |p AS (SELECT doc_id,
             |    ((coalesce(c2.c2, 0) + 1) * 1000000) // greatest(coalesce(c1.c1, 0) + v.v, 1) AS p_ppm
             |  FROM ab LEFT JOIN c2 USING (w1, w2)
             |    LEFT JOIN c1 ON ab.w1 = c1.w CROSS JOIN v),
             |sc AS (SELECT doc_id, count(*) AS n_bigrams,
             |  CAST(sum(p_ppm) // count(*) AS BIGINT) AS score_ppm
             |  FROM p GROUP BY 1),
             |tiered AS (SELECT sc.doc_id, d.lang, sc.n_bigrams, sc.score_ppm,
             |  CAST(ntile(3) OVER (PARTITION BY d.lang
             |    ORDER BY sc.score_ppm DESC, sc.doc_id) AS BIGINT) AS bucket
             |  FROM sc JOIN documents d USING (doc_id))
             |SELECT doc_id, lang, n_bigrams, score_ppm, bucket,
             |  CASE WHEN bucket = 1 THEN 'head' WHEN bucket = 3 THEN 'tail'
             |       ELSE 'middle' END AS tier
             |FROM tiered ORDER BY doc_id""".stripMargin)),

    QueryDef("q237_curriculum",
      // deterministic curriculum schedule: equal-width difficulty
      // stages over n_chars, md5 within-stage shuffle (q77's bucket
      // machinery), exclusive token prefix sum over the full
      // (stage, shuffle, id) order, optimizer step at 2000 tokens per
      // step. The Spark side computes the prefix as the Packing
      // two-level bucketed cumsum; the oracle states the single
      // global window it must equal
      (s, d) => {
        val docs = Tpch.table(s, d, "documents")
        Sampling.curriculumSchedule(docs, "doc_id", col("n_chars"),
            TextAnalysis.tokenCount(col("text")),
            nStages = 4, tokensPerStep = 2000L)
          .orderBy("doc_id")
      },
      Some("""WITH d0 AS (SELECT doc_id, n_chars AS difficulty,
             |    CASE WHEN length(trim(text)) = 0 THEN 0
             |      ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000 AS h
             |  FROM documents),
             |b AS (SELECT min(difficulty) AS lo, max(difficulty) AS hi FROM d0),
             |st AS (SELECT doc_id, difficulty, n_tokens, h,
             |    1 + (difficulty - lo) * 4 // (hi - lo + 1) AS stage
             |  FROM d0 CROSS JOIN b),
             |off AS (SELECT doc_id, difficulty, stage, h AS shuffle_key, n_tokens,
             |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY stage, h, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             |      AS start_offset
             |  FROM st)
             |SELECT doc_id, CAST(difficulty AS BIGINT) AS difficulty,
             |  CAST(stage AS BIGINT) AS stage,
             |  CAST(shuffle_key AS BIGINT) AS shuffle_key,
             |  CAST(n_tokens AS BIGINT) AS n_tokens, start_offset,
             |  start_offset // 2000 AS step
             |FROM off ORDER BY doc_id""".stripMargin)),

    QueryDef("q238_contrastive_pairs",
      // contrastive positive-pair mining: q76's near-dup clusters as
      // free positives — every non-canonical member pairs with its
      // cluster rep (min id), scored by EXACT k-shingle Jaccard in
      // per-myriad integers (the anchor→rep edge may be transitive,
      // so the score is computed, not inherited from the LSH pair).
      // The oracle recomputes clusters exhaustively (O(n²) + recursive
      // min-propagation) and the pair scores from raw shingle sets
      (s, d) => Dedup.contrastivePairs(Tpch.table(s, d, "documents"),
          "doc_id", "text", k = 3, numHashes = 24, bands = 8,
          threshold = 0.5, sigs = Some(docSignatures(s, d, 3, 24)))
        .orderBy("anchor_id"),
      Some(s"""WITH RECURSIVE s AS ($shingleSql),
           |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM s a JOIN s b ON a.doc_id < b.doc_id
           |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
           |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
           |e AS (SELECT id_a AS a, id_b AS b FROM p
           |  UNION ALL SELECT id_b, id_a FROM p),
           |reach(id, r) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT e.a, reach.r FROM e JOIN reach ON reach.id = e.b),
           |comp AS (SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS rep
           |  FROM reach GROUP BY id),
           |an AS (SELECT doc_id AS anchor_id, rep AS positive_id
           |  FROM comp WHERE doc_id <> rep)
           |SELECT an.anchor_id, an.positive_id,
           |  CAST(len(list_intersect(sa.sh, sp.sh)) AS BIGINT) AS n_inter,
           |  CAST(len(sa.sh) + len(sp.sh) - len(list_intersect(sa.sh, sp.sh))
           |    AS BIGINT) AS n_union,
           |  CAST(len(list_intersect(sa.sh, sp.sh)) * 10000
           |    // greatest(len(sa.sh) + len(sp.sh) - len(list_intersect(sa.sh, sp.sh)), 1)
           |    AS BIGINT) AS jaccard_pm
           |FROM an JOIN s sa ON sa.doc_id = an.anchor_id
           |  JOIN s sp ON sp.doc_id = an.positive_id
           |ORDER BY anchor_id""".stripMargin)),

    QueryDef("q240_contrastive_triplets",
      // the contrastive-training flagship: q238's cluster positives
      // joined with a deterministic hard negative per anchor — the
      // highest-jaccard NON-cluster partner below the dup threshold,
      // reachable through a rare (df ≤ 20) shared shingle. Scoring is
      // integer per-myriad end-to-end, so the exhaustive oracle
      // (O(n²) clusters + rare-shingle blocked candidates) reproduces
      // the triplet table bit-for-bit
      (s, d) => Dedup.contrastiveTriplets(Tpch.table(s, d, "documents"),
          "doc_id", "text", k = 3, numHashes = 24, bands = 8,
          threshold = 0.5, maxDf = 20, negFloorPm = 1,
          sigs = Some(docSignatures(s, d, 3, 24)))
        .orderBy("anchor_id"),
      Some(s"""WITH RECURSIVE s AS ($shingleSql),
           |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM s a JOIN s b ON a.doc_id < b.doc_id
           |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
           |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
           |e AS (SELECT id_a AS a, id_b AS b FROM p
           |  UNION ALL SELECT id_b, id_a FROM p),
           |reach(id, r) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT e.a, reach.r FROM e JOIN reach ON reach.id = e.b),
           |comp AS (SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS rep
           |  FROM reach GROUP BY id),
           |an AS (SELECT doc_id AS anchor_id, rep AS positive_id
           |  FROM comp WHERE doc_id <> rep),
           |posj AS (SELECT an.anchor_id, an.positive_id,
           |  CAST(len(list_intersect(sa.sh, sp.sh)) * 10000
           |    // greatest(len(sa.sh) + len(sp.sh) - len(list_intersect(sa.sh, sp.sh)), 1)
           |    AS BIGINT) AS pos_pm
           |  FROM an JOIN s sa ON sa.doc_id = an.anchor_id
           |    JOIN s sp ON sp.doc_id = an.positive_id),
           |x AS (SELECT doc_id AS id, unnest(sh) AS g FROM s),
           |rg AS (SELECT g FROM x GROUP BY g HAVING count(*) <= 20),
           |r AS (SELECT id, g FROM x JOIN rg USING (g)),
           |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
           |  FROM r a JOIN r b ON a.g = b.g AND a.id < b.id),
           |sc AS (SELECT id_a, id_b,
           |  CAST(len(list_intersect(sa.sh, sb.sh)) * 10000
           |    // greatest(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)), 1)
           |    AS BIGINT) AS pm
           |  FROM cand JOIN s sa ON sa.doc_id = cand.id_a
           |    JOIN s sb ON sb.doc_id = cand.id_b),
           |n0 AS (SELECT id_a AS anchor_id, id_b AS negative_id, pm FROM sc
           |  UNION ALL SELECT id_b, id_a, pm FROM sc),
           |nf AS (SELECT n0.* FROM n0
           |  JOIN comp ca ON ca.doc_id = n0.anchor_id
           |  JOIN comp cb ON cb.doc_id = n0.negative_id
           |  WHERE ca.rep <> cb.rep AND n0.pm >= 1 AND n0.pm < 5000),
           |best AS (SELECT anchor_id, negative_id, pm,
           |  row_number() OVER (PARTITION BY anchor_id
           |    ORDER BY pm DESC, negative_id) AS rn FROM nf)
           |SELECT posj.anchor_id, posj.positive_id, b.negative_id,
           |  posj.pos_pm, b.pm AS neg_pm
           |FROM posj JOIN best b ON b.anchor_id = posj.anchor_id AND b.rn = 1
           |ORDER BY posj.anchor_id""".stripMargin)),

    QueryDef("q241_tokenizer_fertility",
      // tokenizer fertility per (lang, source): BPE-ish pre-tokens
      // per 1000 chars (sequence-length cost of each language) and
      // per whitespace word in ppm (fragmentation) — the vocabulary-
      // rebalancing audit, exact integer ratios over q50/q73's
      // already-oracle-checked token counts
      (s, d) => TextAnalysis.tokenizerFertility(
          Tpch.table(s, d, "documents"), "text", "lang", "source")
        .orderBy("lang", "source"),
      Some(s"""SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(ws) AS BIGINT) AS ws_tokens,
             |  CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
             |  CAST(sum(ch) AS BIGINT) AS chars,
             |  CAST(sum(bpe) * 1000 // greatest(sum(ch), 1) AS BIGINT)
             |    AS bpe_per_kchar,
             |  CAST(sum(bpe) * 1000000 // greatest(sum(ws), 1) AS BIGINT)
             |    AS bpe_per_ws_ppm
             |FROM (SELECT lang, source,
             |  CASE WHEN length(trim(text)) = 0 THEN 0
             |    ELSE len(string_split_regex(trim(text), '\\s+')) END AS ws,
             |  len(list_filter(regexp_extract_all(text, '${TextAnalysis.bpeIshPattern}'),
             |    t -> NOT regexp_matches(t, '^\\s+$$'))) AS bpe,
             |  length(text) AS ch FROM documents)
             |GROUP BY 1, 2 ORDER BY lang, source""".stripMargin)),

    QueryDef("q242_curriculum_pack",
      // the q237 schedule composed with q88's span arithmetic:
      // curriculum-ordered fixed-length sequence packing — which
      // training sequences does each document fill, where does it
      // start, and how many does it span. Same stages/shuffle as
      // q237 with seqLen 512
      (s, d) => {
        val docs = Tpch.table(s, d, "documents")
        Sampling.curriculumPack(docs, "doc_id", col("n_chars"),
            TextAnalysis.tokenCount(col("text")),
            nStages = 4, seqLen = 512L)
          .orderBy("doc_id")
      },
      Some("""WITH d0 AS (SELECT doc_id, n_chars AS difficulty,
             |    CASE WHEN length(trim(text)) = 0 THEN 0
             |      ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000 AS h
             |  FROM documents),
             |b AS (SELECT min(difficulty) AS lo, max(difficulty) AS hi FROM d0),
             |st AS (SELECT doc_id, difficulty, n_tokens, h,
             |    1 + (difficulty - lo) * 4 // (hi - lo + 1) AS stage
             |  FROM d0 CROSS JOIN b),
             |off AS (SELECT doc_id, difficulty, stage, h AS shuffle_key, n_tokens,
             |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY stage, h, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             |      AS start_offset
             |  FROM st)
             |SELECT doc_id, CAST(difficulty AS BIGINT) AS difficulty,
             |  CAST(stage AS BIGINT) AS stage,
             |  CAST(shuffle_key AS BIGINT) AS shuffle_key,
             |  CAST(n_tokens AS BIGINT) AS n_tokens, start_offset,
             |  start_offset // 512 AS first_seq,
             |  CASE WHEN n_tokens > 0 THEN (start_offset + n_tokens - 1) // 512
             |       ELSE start_offset // 512 END AS last_seq,
             |  start_offset % 512 AS offset_in_seq,
             |  (CASE WHEN n_tokens > 0 THEN (start_offset + n_tokens - 1) // 512
             |        ELSE start_offset // 512 END) - start_offset // 512 + 1 AS n_seqs
             |FROM off ORDER BY doc_id""".stripMargin)))
}
