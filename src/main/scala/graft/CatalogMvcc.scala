package graft

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Dirs, StorePaths, VersionedStore}

/** Oracle-checked MVCC + CDC surface: the reference's snapshot reads
  * (`:snapshot`, mvcc-tests — a query pinned to an epoch sees exactly
  * that epoch's world) and its transaction-log tail (the slave
  * replication feed, transactions.lisp:884-1003) were spec-only rows
  * until now. Here a [[graft.model.VersionedStore]] is built
  * DETERMINISTICALLY from documents.parquet — two commits whose
  * contents are pure doc_id arithmetic — so DuckDB can recompute the
  * expected state of any epoch from the source table alone, and the
  * store's time-travel answers become hash-checkable like any other
  * catalog query.
  *
  * Commit script (all rows derived from documents.parquet):
  *   - epoch 1: every even doc_id, rev 1;
  *   - epoch 2: every odd doc_id (rev 1), PLUS rev-2 updates of ids
  *     divisible by 10 (source column rewritten to 'revised'), PLUS
  *     rev-2 tombstones of ids divisible by 14 but not by 10.
  * The three epoch-2 slices are disjoint by construction (10|id and
  * 14|id imply even), so OCC sees each id at most once per commit.
  */
object CatalogMvcc {

  private val buildLock = new Object

  private[graft] def mvccStorePath(sfDir: String): String =
    s"${StorePaths.root}/${StorePaths.key(sfDir)}/mvcc_docs_v1"

  /** Build-if-absent (and rebuild-if-stale, same fingerprint-stamp
    * discipline as every other materialized store) two-epoch versioned
    * store over the documents table.
    */
  private[graft] def ensureMvccStore(spark: SparkSession, sfDir: String): String = {
    val path = mvccStorePath(sfDir)
    val fp = StorePaths.fingerprint(s"$sfDir/documents.parquet")
    def current = StorePaths.isCurrent(path, fp)
    if (!current) buildLock.synchronized {
      if (!current) {
        Dirs.rmTree(Paths.get(path)) // a stale store must not gain epochs 3+
        val st = new VersionedStore(spark, path)
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        def versionRows(df: DataFrame, rev: Long, deleted: Boolean): DataFrame =
          df.select(col("doc_id").as("id"), lit(rev).as("rev"),
            lit(deleted).as("deleted"), col("text"), col("lang"),
            col("source"), col("n_chars"))
        val evens = versionRows(docs.filter(col("doc_id") % 2 === 0), 1L, deleted = false)
        st.commit(Map("docs" -> evens))
        val odds = versionRows(docs.filter(col("doc_id") % 2 === 1), 1L, deleted = false)
        val updates = versionRows(docs.filter(col("doc_id") % 10 === 0), 2L, deleted = false)
          .withColumn("source", lit("revised"))
        val tombs = versionRows(
          docs.filter(col("doc_id") % 14 === 0 && col("doc_id") % 10 =!= 0),
          2L, deleted = true)
        st.commit(Map("docs" -> odds.unionByName(updates).unionByName(tombs)))
        StorePaths.stamp(path, fp)
      }
    }
    path
  }

  private[graft] def statsStorePath(sfDir: String): String =
    s"${StorePaths.root}/${StorePaths.key(sfDir)}/stats_docs_v1"

  private val statsEdges = (0.0, 2000.0, 16) // pinned monitor edges

  /** Build-if-absent GraphStore with a BOUND MaintainedStatsIndex and a
    * reference snapshot pinned after epoch 1 — the q213 fixture. The
    * commit script is pure doc_id arithmetic (the ensureMvccStore
    * discipline) with a value-MOVING update so the signed-delta path
    * is actually exercised: epoch 1 evens, snapshot, epoch 2 odds,
    * epoch 3 n_chars+500 for ids divisible by 10, epoch 4 tombstones
    * (÷14, not ÷10).
    */
  private[graft] def ensureStatsStore(spark: SparkSession, sfDir: String): String = {
    val path = statsStorePath(sfDir)
    val fp = StorePaths.fingerprint(s"$sfDir/documents.parquet")
    def current = StorePaths.isCurrent(path, fp)
    if (!current) buildLock.synchronized {
      if (!current) {
        Dirs.rmTree(Paths.get(path))
        val schema = graft.model.GraphSchema.builder()
          .vertex("doc", "id", Seq("n_chars")).build()
        val gs = new graft.model.GraphStore(spark, schema, path)
        val (lo, hi, nBins) = statsEdges
        val idx = new graft.operators.MaintainedStatsIndex(
          gs, "v_doc", "n_chars", lo, hi, nBins, path)
        idx.rebuild(); idx.bind()
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id").as("id"), col("n_chars"))
        gs.txn().createVertices("doc", docs.filter(col("id") % 2 === 0)).commit()
        idx.snapshot("ref")
        gs.txn().createVertices("doc", docs.filter(col("id") % 2 === 1)).commit()
        gs.txn().updateVertices("doc", docs.filter(col("id") % 10 === 0)
          .withColumn("n_chars", col("n_chars") + 500)).commit()
        gs.txn().deleteVertices("doc",
          docs.filter(col("id") % 14 === 0 && col("id") % 10 =!= 0).select("id"))
          .commit()
        StorePaths.stamp(path, fp)
      }
    }
    path
  }

  private[graft] def groupedStatsStorePath(sfDir: String): String =
    s"${StorePaths.root}/${StorePaths.key(sfDir)}/stats_docs_lang_v1"

  /** q213's fixture STRATIFIED: the same commit script over a store
    * whose docs carry `lang`, with a per-language MaintainedStatsIndex
    * bound — the q215 monitor's data.
    */
  private[graft] def ensureGroupedStatsStore(spark: SparkSession, sfDir: String): String = {
    val path = groupedStatsStorePath(sfDir)
    val fp = StorePaths.fingerprint(s"$sfDir/documents.parquet")
    def current = StorePaths.isCurrent(path, fp)
    if (!current) buildLock.synchronized {
      if (!current) {
        Dirs.rmTree(Paths.get(path))
        val schema = graft.model.GraphSchema.builder()
          .vertex("doc", "id", Seq("n_chars", "lang")).build()
        val gs = new graft.model.GraphStore(spark, schema, path)
        val (lo, hi, nBins) = statsEdges
        val idx = new graft.operators.MaintainedStatsIndex(
          gs, "v_doc", "n_chars", lo, hi, nBins, path, groupCol = Some("lang"))
        idx.rebuild(); idx.bind()
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id").as("id"), col("n_chars"), col("lang"))
        gs.txn().createVertices("doc", docs.filter(col("id") % 2 === 0)).commit()
        idx.snapshot("ref")
        gs.txn().createVertices("doc", docs.filter(col("id") % 2 === 1)).commit()
        gs.txn().updateVertices("doc", docs.filter(col("id") % 10 === 0)
          .withColumn("n_chars", col("n_chars") + 500)).commit()
        gs.txn().deleteVertices("doc",
          docs.filter(col("id") % 14 === 0 && col("id") % 10 =!= 0).select("id"))
          .commit()
        StorePaths.stamp(path, fp)
      }
    }
    path
  }

  private[graft] def dsirStorePath(sfDir: String): String =
    s"${StorePaths.root}/${StorePaths.key(sfDir)}/dsir_docs_v1"

  private val dsirBuckets = 4096

  /** q225's fixture: the q213 commit script applied to TEXT — a live
    * doc store with a FEATURE-HASH MaintainedStatsIndex bound, so the
    * DSIR raw-side bucket counts are maintained inside every commit.
    * The epoch-3 update rewrites text (appends " extra tail"), moving
    * real feature mass through the signed-delta path.
    */
  private[graft] def ensureDsirStore(spark: SparkSession, sfDir: String): String = {
    val path = dsirStorePath(sfDir)
    val fp = StorePaths.fingerprint(s"$sfDir/documents.parquet")
    def current = StorePaths.isCurrent(path, fp)
    if (!current) buildLock.synchronized {
      if (!current) {
        Dirs.rmTree(Paths.get(path))
        val schema = graft.model.GraphSchema.builder()
          .vertex("doc", "id", Seq("text")).build()
        val gs = new graft.model.GraphStore(spark, schema, path)
        val idx = new graft.operators.MaintainedStatsIndex(
          gs, "v_doc", "text", 0.0, 1.0, dsirBuckets, path, featureHash = true)
        idx.rebuild(); idx.bind()
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id").as("id"), col("text"))
        gs.txn().createVertices("doc", docs.filter(col("id") % 2 === 0)).commit()
        gs.txn().createVertices("doc", docs.filter(col("id") % 2 === 1)).commit()
        gs.txn().updateVertices("doc", docs.filter(col("id") % 10 === 0)
          .withColumn("text", concat(col("text"), lit(" extra tail")))).commit()
        gs.txn().deleteVertices("doc",
          docs.filter(col("id") % 14 === 0 && col("id") % 10 =!= 0).select("id"))
          .commit()
        StorePaths.stamp(path, fp)
      }
    }
    path
  }

  val defs: Seq[QueryDef] = Seq(

    // Snapshot read pinned to epoch 1: the world before the second
    // commit — only the even ids, all at rev 1; later revisions,
    // inserts, and tombstones are invisible. Epoch dirs are partition
    // dirs, so the snapshot read prunes to commit_epoch<=1 at the file
    // level instead of filtering the history.
    QueryDef("q121_mvcc_asof",
      (s, d) => {
        val st = new VersionedStore(s, ensureMvccStore(s, d))
        st.read("docs", asOf = Some(1L))
          .select(col("id"), col("rev"), col("lang"), col("n_chars"))
          .orderBy("id")
      },
      Some("""SELECT doc_id AS id, CAST(1 AS BIGINT) AS rev, lang, n_chars
             |FROM documents WHERE doc_id % 2 = 0 ORDER BY id""".stripMargin)),

    // Current-state read: latest visible revision per id — rev-2
    // payloads supersede (source='revised'), tombstoned ids disappear,
    // epoch-2 inserts are present.
    QueryDef("q122_mvcc_current",
      (s, d) => {
        val st = new VersionedStore(s, ensureMvccStore(s, d))
        st.read("docs")
          .select(col("id"), col("rev"), col("source"), col("n_chars"))
          .orderBy("id")
      },
      Some("""SELECT doc_id AS id,
             |  CASE WHEN doc_id % 10 = 0 THEN CAST(2 AS BIGINT)
             |       ELSE CAST(1 AS BIGINT) END AS rev,
             |  CASE WHEN doc_id % 10 = 0 THEN 'revised' ELSE source END AS source,
             |  n_chars
             |FROM documents
             |WHERE NOT (doc_id % 14 = 0 AND doc_id % 10 <> 0)
             |ORDER BY id""".stripMargin)),

    // CDC tail: every version row committed after epoch 1 — the exact
    // feed a replication slave applies (Streams.commitLogStream serves
    // the same rows as a stream; ReplicationSpec pins that path). The
    // epoch range prunes to the epoch-2 partition dirs only.
    QueryDef("q123_changes_since",
      (s, d) => {
        val st = new VersionedStore(s, ensureMvccStore(s, d))
        st.changesSince("docs", fromExclusive = 1L, toInclusive = st.currentEpoch)
          .select(col("id"), col("rev"), col("deleted"),
            col("commit_epoch").cast("long").as("commit_epoch"))
          .orderBy("id")
      },
      Some("""SELECT doc_id AS id, CAST(1 AS BIGINT) AS rev,
             |  FALSE AS deleted, CAST(2 AS BIGINT) AS commit_epoch
             |FROM documents WHERE doc_id % 2 = 1
             |UNION ALL
             |SELECT doc_id, CAST(2 AS BIGINT), FALSE, CAST(2 AS BIGINT)
             |FROM documents WHERE doc_id % 10 = 0
             |UNION ALL
             |SELECT doc_id, CAST(2 AS BIGINT), TRUE, CAST(2 AS BIGINT)
             |FROM documents WHERE doc_id % 14 = 0 AND doc_id % 10 <> 0
             |ORDER BY id""".stripMargin)),

    // Drift BETWEEN EPOCHS of the live store — the "did this commit
    // shift the corpus?" monitor (Drift.scala composed with the MVCC
    // snapshot reads): population A is the epoch-1 world, population B
    // the current state, feature n_chars. Both sides are epoch-pruned
    // snapshot scans; the summary is the q203 machinery verbatim. The
    // oracle re-derives both populations from the commit script (A =
    // even ids; B = all but the tombstoned; updates rewrite `source`
    // only, so n_chars passes through).
    QueryDef("q205_mvcc_drift",
      (s, d) => {
        val st = new VersionedStore(s, ensureMvccStore(s, d))
        graft.operators.Drift.numericDrift(
          st.read("docs", asOf = Some(1L)), st.read("docs"),
          "n_chars", nBins = 12)
      },
      Some(s"""WITH u AS (
             |  SELECT CAST(n_chars AS DOUBLE) AS v, 'a' AS side
             |  FROM documents WHERE doc_id % 2 = 0
             |  UNION ALL
             |  SELECT CAST(n_chars AS DOUBLE) AS v, 'b' AS side
             |  FROM documents
             |  WHERE NOT (doc_id % 14 = 0 AND doc_id % 10 <> 0)),
             |${OracleFragments.driftSummarySql(12)}""".stripMargin)),

    // the MVCC chain's AUDIT view: what did the commits after epoch 1
    // do to the table? One row per id whose visible state changed,
    // classified added/updated/deleted. Candidates come from the
    // epoch-dir-pruned commit-log tail (O(window commits), never a
    // table scan), endpoint snapshots are semi-pruned to them. The
    // oracle re-derives every verdict from the commit script: odds
    // added, ÷10 updated (source revised), ÷14-not-÷10 tombstoned
    QueryDef("q220_epoch_diff",
      (s, d) => {
        val st = new VersionedStore(s, ensureMvccStore(s, d))
        st.diff("docs", 1L, st.currentEpoch).orderBy("id")
      },
      Some("""SELECT doc_id AS id, 'added' AS change FROM documents
             |WHERE doc_id % 2 = 1
             |UNION ALL
             |SELECT doc_id, 'updated' FROM documents WHERE doc_id % 10 = 0
             |UNION ALL
             |SELECT doc_id, 'deleted' FROM documents
             |WHERE doc_id % 14 = 0 AND doc_id % 10 <> 0
             |ORDER BY id""".stripMargin)),

    // q205's monitor served from MAINTAINED state: the commit-bound
    // histogram (MaintainedStatsIndex — signed per-commit deltas, the
    // maintained-index discipline applied to aggregate state) answers
    // the same drift question from O(nBins) rows instead of two corpus
    // scans. Edges are PINNED at monitor creation (q207's philosophy;
    // out-of-range n_chars clamps), the reference snapshot at epoch 1.
    // The oracle re-derives both histograms from the commit script —
    // including the value-MOVING +500 update the delta path must net
    // correctly — with the same pinned-edge clamp binning.
    QueryDef("q213_stats_drift",
      (s, d) => {
        val path = ensureStatsStore(s, d)
        val gs = graft.model.GraphStore.open(s, path)
        val (lo, hi, nBins) = statsEdges
        new graft.operators.MaintainedStatsIndex(
          gs, "v_doc", "n_chars", lo, hi, nBins, path)
          .driftVsSnapshot("ref")
      },
      Some(s"""WITH a AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
             |  WHERE doc_id % 2 = 0),
             |b AS (SELECT CAST(n_chars +
             |    CASE WHEN doc_id % 10 = 0 THEN 500 ELSE 0 END AS DOUBLE) AS v
             |  FROM documents WHERE NOT (doc_id % 14 = 0 AND doc_id % 10 <> 0)),
             |ca AS (SELECT greatest(0, least(15,
             |      CAST(floor(((v - 0.0) * 16) / (2000.0 - 0.0)) AS BIGINT))) AS bin,
             |    count(*) AS c_a FROM a GROUP BY 1),
             |cb AS (SELECT greatest(0, least(15,
             |      CAST(floor(((v - 0.0) * 16) / (2000.0 - 0.0)) AS BIGINT))) AS bin,
             |    count(*) AS c_b FROM b GROUP BY 1),
             |f AS (SELECT bin, coalesce(c_a, 0) AS c_a, coalesce(c_b, 0) AS c_b
             |  FROM (SELECT unnest(range(16)) AS bin)
             |  LEFT JOIN ca USING (bin) LEFT JOIN cb USING (bin)),
             |${OracleFragments.driftTailSql(16)}""".stripMargin)),

    // q213's commit-maintained drift monitor STRATIFIED by language —
    // q214's per-language report served from maintained state: one
    // summary row per lang at O(nBins·langs) input rows, NO corpus
    // rescan, pinned edges, signed per-(lang, bin) commit deltas. The
    // oracle re-derives both per-language histograms from the commit
    // script (the +500 value-moving update included) with the same
    // pinned-edge clamp, then the shared grouped summary tail.
    QueryDef("q215_stats_drift_by_lang",
      (s, d) => {
        val path = ensureGroupedStatsStore(s, d)
        val gs = graft.model.GraphStore.open(s, path)
        val (lo, hi, nBins) = statsEdges
        new graft.operators.MaintainedStatsIndex(
          gs, "v_doc", "n_chars", lo, hi, nBins, path, groupCol = Some("lang"))
          .driftVsSnapshot("ref")
          .withColumnRenamed("g", "lang")
          .orderBy("lang")
      },
      Some(s"""WITH a AS (SELECT lang AS g, CAST(n_chars AS DOUBLE) AS v
             |  FROM documents WHERE doc_id % 2 = 0),
             |b AS (SELECT lang AS g, CAST(n_chars +
             |    CASE WHEN doc_id % 10 = 0 THEN 500 ELSE 0 END AS DOUBLE) AS v
             |  FROM documents WHERE NOT (doc_id % 14 = 0 AND doc_id % 10 <> 0)),
             |ca AS (SELECT g, greatest(0, least(15,
             |      CAST(floor(((v - 0.0) * 16) / (2000.0 - 0.0)) AS BIGINT))) AS bin,
             |    count(*) AS c_a FROM a GROUP BY 1, 2),
             |cb AS (SELECT g, greatest(0, least(15,
             |      CAST(floor(((v - 0.0) * 16) / (2000.0 - 0.0)) AS BIGINT))) AS bin,
             |    count(*) AS c_b FROM b GROUP BY 1, 2),
             |gl AS (SELECT g FROM ca UNION SELECT g FROM cb),
             |f AS (SELECT g, bin, coalesce(c_a, 0) AS c_a, coalesce(c_b, 0) AS c_b
             |  FROM (SELECT g, unnest(range(16)) AS bin FROM gl)
             |  LEFT JOIN ca USING (g, bin) LEFT JOIN cb USING (g, bin)),
             |${OracleFragments.driftGroupedTailSql(16)}
             |SELECT g AS lang, n_a, n_b, psi_ppm, js_ppm, tvd_ppm
             |FROM gp ORDER BY lang""".stripMargin)),

    // DRIFT-GATED INGEST arithmetic (the q213 monitor as an ADMISSION
    // gate): the PSI the corpus WOULD read vs the pinned reference if
    // a candidate batch (every doc_id%3 doc, shifted +800) were
    // committed — hypothetical histogram = maintained histogram + the
    // batch's binned counts, O(nBins) + one batch pass, no corpus
    // rescan. `admitted` applies the 0.25 industry PSI gate; a gated
    // commit (MaintainedStatsIndex.gatedCreate) refuses with the OCC
    // ConflictException (HTTP 409) when this reads false — the
    // refusal-under-storm behavior is StatsIndexSpec's, the
    // arithmetic is pinned here against DuckDB.
    // the commit-MAINTAINED DSIR deployment: the raw-side hashed-ngram
    // bucket counts live in a feature-hash stats index refreshed inside
    // every commit (creates, a text-REWRITING update, deletes), so
    // selection weights derive at O(nBuckets) from the histogram with
    // NO corpus rescan; only the small target slice is featurized at
    // query time, and the live corpus scores through the stateless
    // row-local path. The oracle re-derives the live corpus from the
    // commit script and restates the whole model in HUGEINT.
    QueryDef("q225_maintained_dsir",
      (s, d) => {
        val path = ensureDsirStore(s, d)
        val gs = graft.model.GraphStore.open(s, path)
        val idx = new graft.operators.MaintainedStatsIndex(
          gs, "v_doc", "text", 0.0, 1.0, dsirBuckets, path, featureHash = true)
        val rawCounts = idx.histogram().collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        val docsTable = graft.model.Tpch.table(s, d, "documents")
        val target = docsTable
          .filter(graft.operators.TextAnalysis.gateKeep(col("text")))
          .filter(graft.operators.Sampling.hashSplit(col("doc_id"),
            Seq("train" -> 0.9, "val" -> 0.05), rest = "test") === "val")
        val w = graft.operators.TextAnalysis.dsirWeightsDenseFromCounts(
          rawCounts, target, "text", dsirBuckets)
        graft.operators.TextAnalysis.dsirScoreStateless(
            gs.store.read("v_doc"), "id", "text", w)
          .select(col("id").as("doc_id"), col("n_feats"), col("dsir_ppm"))
          .orderBy("doc_id")
      },
      Some(s"""WITH ${OracleFragments.tokenStatsCte},
           |${OracleFragments.gateCte},
           |tgt AS (SELECT doc_id FROM g
           |  WHERE ${OracleFragments.md5Bucket("doc_id")} >= 900
           |    AND ${OracleFragments.md5Bucket("doc_id")} < 950),
           |live AS (SELECT doc_id, CASE WHEN doc_id % 10 = 0
           |    THEN text || ' extra tail' ELSE text END AS text
           |  FROM documents
           |  WHERE NOT (doc_id % 14 = 0 AND doc_id % 10 <> 0)),
           |t0r AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
           |    ELSE string_split_regex(trim(lower(text)), '\\s+') END AS tk
           |  FROM live),
           |frr AS (SELECT doc_id,
           |    ('0x' || substr(md5(f), 1, 8))::BIGINT % 4096 AS bucket
           |  FROM (SELECT doc_id, unnest(tk) AS f FROM t0r
           |        UNION ALL
           |        SELECT doc_id, tk[i] || ' ' || tk[i+1] AS f
           |        FROM (SELECT doc_id, tk,
           |                unnest(generate_series(1, len(tk) - 1)) AS i
           |              FROM t0r WHERE len(tk) >= 2))),
           |t0t AS (SELECT d.doc_id, CASE WHEN length(trim(d.text)) = 0 THEN []
           |    ELSE string_split_regex(trim(lower(d.text)), '\\s+') END AS tk
           |  FROM documents d JOIN tgt USING (doc_id)),
           |ftt AS (SELECT
           |    ('0x' || substr(md5(f), 1, 8))::BIGINT % 4096 AS bucket
           |  FROM (SELECT doc_id, unnest(tk) AS f FROM t0t
           |        UNION ALL
           |        SELECT doc_id, tk[i] || ' ' || tk[i+1] AS f
           |        FROM (SELECT doc_id, tk,
           |                unnest(generate_series(1, len(tk) - 1)) AS i
           |              FROM t0t WHERE len(tk) >= 2))),
           |ct AS (SELECT bucket, count(*) AS c_tgt FROM ftt GROUP BY 1),
           |cr AS (SELECT bucket, count(*) AS c_raw FROM frr GROUP BY 1),
           |cc AS (SELECT bucket, coalesce(c_tgt, 0) AS c_tgt,
           |    coalesce(c_raw, 0) AS c_raw
           |  FROM ct FULL JOIN cr USING (bucket)),
           |tot AS (SELECT coalesce(sum(c_tgt), 0) + 4096 AS n_tgt,
           |    coalesce(sum(c_raw), 0) + 4096 AS n_raw FROM cc),
           |w AS (SELECT bucket, CAST(least(
           |    ((CAST(c_tgt AS HUGEINT) + 1) * n_raw * 1000000)
           |      // ((CAST(c_raw AS HUGEINT) + 1) * n_tgt),
           |    1000000000) AS BIGINT) AS r_ppm
           |  FROM cc CROSS JOIN tot)
           |SELECT doc_id, count(*) AS n_feats,
           |    CAST(sum(r_ppm) // count(*) AS BIGINT) AS dsir_ppm
           |  FROM frr JOIN w USING (bucket) GROUP BY 1
           |ORDER BY doc_id""".stripMargin)),

    QueryDef("q228_dsir_admission",
      // SELECTION-AWARE admission (q225 ∘ q216 — the closed loop
      // ingest → gate → maintained model → selection): an INCOMING
      // batch (doc_id % 7 = 3 of the raw table — data that has not
      // been committed) scores against the commit-MAINTAINED DSIR
      // model toward the gate-clean val target, with the q221 md5
      // keep gate realizing the per-doc verdict selection would
      // reach. The raw-side counts come from the maintained index's
      // ≤nBuckets histogram rows (no corpus rescan), so "would
      // selection keep this batch?" is answered at dashboard cost —
      // the admission quantity selectionGatedCreate refuses on
      // (refusal atomicity + the loop-closing model refresh are
      // spec-pinned in StatsIndexSpec; this row pins the arithmetic)
      (s, d) => {
        val path = ensureDsirStore(s, d)
        val gs = graft.model.GraphStore.open(s, path)
        val idx = new graft.operators.MaintainedStatsIndex(
          gs, "v_doc", "text", 0.0, 1.0, dsirBuckets, path, featureHash = true)
        val docsTable = graft.model.Tpch.table(s, d, "documents")
        val target = docsTable
          .filter(graft.operators.TextAnalysis.gateKeep(col("text")))
          .filter(graft.operators.Sampling.hashSplit(col("doc_id"),
            Seq("train" -> 0.9, "val" -> 0.05), rest = "test") === "val")
        val batch = docsTable.filter(col("doc_id") % 7 === 3)
          .select("doc_id", "text")
        idx.dsirBatchScores(batch, "doc_id", "text", target, "text")
          .orderBy("doc_id")
      },
      Some(s"""WITH ${OracleFragments.tokenStatsCte},
           |${OracleFragments.gateCte},
           |tgt AS (SELECT doc_id FROM g
           |  WHERE ${OracleFragments.md5Bucket("doc_id")} >= 900
           |    AND ${OracleFragments.md5Bucket("doc_id")} < 950),
           |live AS (SELECT doc_id, CASE WHEN doc_id % 10 = 0
           |    THEN text || ' extra tail' ELSE text END AS text
           |  FROM documents
           |  WHERE NOT (doc_id % 14 = 0 AND doc_id % 10 <> 0)),
           |t0r AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
           |    ELSE string_split_regex(trim(lower(text)), '\\s+') END AS tk
           |  FROM live),
           |frr AS (SELECT doc_id,
           |    ('0x' || substr(md5(f), 1, 8))::BIGINT % 4096 AS bucket
           |  FROM (SELECT doc_id, unnest(tk) AS f FROM t0r
           |        UNION ALL
           |        SELECT doc_id, tk[i] || ' ' || tk[i+1] AS f
           |        FROM (SELECT doc_id, tk,
           |                unnest(generate_series(1, len(tk) - 1)) AS i
           |              FROM t0r WHERE len(tk) >= 2))),
           |t0t AS (SELECT d.doc_id, CASE WHEN length(trim(d.text)) = 0 THEN []
           |    ELSE string_split_regex(trim(lower(d.text)), '\\s+') END AS tk
           |  FROM documents d JOIN tgt USING (doc_id)),
           |ftt AS (SELECT
           |    ('0x' || substr(md5(f), 1, 8))::BIGINT % 4096 AS bucket
           |  FROM (SELECT doc_id, unnest(tk) AS f FROM t0t
           |        UNION ALL
           |        SELECT doc_id, tk[i] || ' ' || tk[i+1] AS f
           |        FROM (SELECT doc_id, tk,
           |                unnest(generate_series(1, len(tk) - 1)) AS i
           |              FROM t0t WHERE len(tk) >= 2))),
           |ct AS (SELECT bucket, count(*) AS c_tgt FROM ftt GROUP BY 1),
           |cr AS (SELECT bucket, count(*) AS c_raw FROM frr GROUP BY 1),
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
           |bt AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 = 3),
           |t0b AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
           |    ELSE string_split_regex(trim(lower(text)), '\\s+') END AS tk
           |  FROM bt),
           |frb AS (SELECT doc_id,
           |    ('0x' || substr(md5(f), 1, 8))::BIGINT % 4096 AS bucket
           |  FROM (SELECT doc_id, unnest(tk) AS f FROM t0b
           |        UNION ALL
           |        SELECT doc_id, tk[i] || ' ' || tk[i+1] AS f
           |        FROM (SELECT doc_id, tk,
           |                unnest(generate_series(1, len(tk) - 1)) AS i
           |              FROM t0b WHERE len(tk) >= 2))),
           |sc AS (SELECT doc_id, count(*) AS n_feats,
           |    CAST(sum(r_ppm) // count(*) AS BIGINT) AS dsir_ppm
           |  FROM frb JOIN w USING (bucket) GROUP BY 1)
           |SELECT doc_id, n_feats, dsir_ppm,
           |  least(1000, dsir_ppm // 1000) AS keep_permille,
           |  ${OracleFragments.md5Bucket("doc_id")} <
           |    least(1000, dsir_ppm // 1000) AS kept
           |FROM sc ORDER BY doc_id""".stripMargin)),

    QueryDef("q216_drift_gate",
      (s, d) => {
        import s.implicits._
        val path = ensureStatsStore(s, d)
        val gs = graft.model.GraphStore.open(s, path)
        val (lo, hi, nBins) = statsEdges
        val idx = new graft.operators.MaintainedStatsIndex(
          gs, "v_doc", "n_chars", lo, hi, nBins, path)
        val batch = s.read.parquet(s"$d/documents.parquet")
          .filter(col("doc_id") % 3 === 0)
          .select((col("n_chars") + 800).as("n_chars"))
        val psi = idx.admissionPsiPpm("ref", batch)
        Seq((psi, psi <= 250000L)).toDF("psi_ppm", "admitted")
      },
      Some(s"""SELECT psi_ppm, psi_ppm <= 250000 AS admitted FROM (
             |WITH a AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
             |  WHERE doc_id % 2 = 0),
             |b AS (SELECT CAST(n_chars +
             |    CASE WHEN doc_id % 10 = 0 THEN 500 ELSE 0 END AS DOUBLE) AS v
             |  FROM documents WHERE NOT (doc_id % 14 = 0 AND doc_id % 10 <> 0)
             |  UNION ALL
             |  SELECT CAST(n_chars + 800 AS DOUBLE) AS v FROM documents
             |  WHERE doc_id % 3 = 0),
             |ca AS (SELECT greatest(0, least(15,
             |      CAST(floor(((v - 0.0) * 16) / (2000.0 - 0.0)) AS BIGINT))) AS bin,
             |    count(*) AS c_a FROM a GROUP BY 1),
             |cb AS (SELECT greatest(0, least(15,
             |      CAST(floor(((v - 0.0) * 16) / (2000.0 - 0.0)) AS BIGINT))) AS bin,
             |    count(*) AS c_b FROM b GROUP BY 1),
             |f AS (SELECT bin, coalesce(c_a, 0) AS c_a, coalesce(c_b, 0) AS c_b
             |  FROM (SELECT unnest(range(16)) AS bin)
             |  LEFT JOIN ca USING (bin) LEFT JOIN cb USING (bin)),
             |${OracleFragments.driftTailSql(16)})""".stripMargin)),

    // The gate's ADMIT branch (q216 pins the refusal): an ALIGNED
    // batch — every doc_id%5==1 doc at its unchanged n_chars, the same
    // mix the reference was pinned on — leaves the hypothetical PSI
    // essentially where the corpus already sits, under the (looser)
    // 0.5 limit this monitor runs at. Both decisions of the admission
    // arithmetic are now oracle-pinned end to end.
    QueryDef("q217_drift_gate_admit",
      (s, d) => {
        import s.implicits._
        val path = ensureStatsStore(s, d)
        val gs = graft.model.GraphStore.open(s, path)
        val (lo, hi, nBins) = statsEdges
        val idx = new graft.operators.MaintainedStatsIndex(
          gs, "v_doc", "n_chars", lo, hi, nBins, path)
        val batch = s.read.parquet(s"$d/documents.parquet")
          .filter(col("doc_id") % 5 === 1)
          .select(col("n_chars"))
        val psi = idx.admissionPsiPpm("ref", batch)
        Seq((psi, psi <= 500000L)).toDF("psi_ppm", "admitted")
      },
      Some(s"""SELECT psi_ppm, psi_ppm <= 500000 AS admitted FROM (
             |WITH a AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
             |  WHERE doc_id % 2 = 0),
             |b AS (SELECT CAST(n_chars +
             |    CASE WHEN doc_id % 10 = 0 THEN 500 ELSE 0 END AS DOUBLE) AS v
             |  FROM documents WHERE NOT (doc_id % 14 = 0 AND doc_id % 10 <> 0)
             |  UNION ALL
             |  SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
             |  WHERE doc_id % 5 = 1),
             |ca AS (SELECT greatest(0, least(15,
             |      CAST(floor(((v - 0.0) * 16) / (2000.0 - 0.0)) AS BIGINT))) AS bin,
             |    count(*) AS c_a FROM a GROUP BY 1),
             |cb AS (SELECT greatest(0, least(15,
             |      CAST(floor(((v - 0.0) * 16) / (2000.0 - 0.0)) AS BIGINT))) AS bin,
             |    count(*) AS c_b FROM b GROUP BY 1),
             |f AS (SELECT bin, coalesce(c_a, 0) AS c_a, coalesce(c_b, 0) AS c_b
             |  FROM (SELECT unnest(range(16)) AS bin)
             |  LEFT JOIN ca USING (bin) LEFT JOIN cb USING (bin)),
             |${OracleFragments.driftTailSql(16)})""".stripMargin)),

    // STRATIFIED admission (the aggregate gate's blind spot, closed):
    // a batch that shifts ONLY the zh stratum (+900) reads per-stratum
    // hypothetical PSI through the grouped maintained monitor — zh
    // explodes past the 0.4 limit while every other language sits at
    // its standing drift, so a per-language gate refuses what an
    // aggregate gate might wave through. One row per stratum; the
    // oracle re-derives every per-language hypothetical histogram from
    // the commit script + the batch.
    QueryDef("q218_gate_by_lang",
      (s, d) => {
        val path = ensureGroupedStatsStore(s, d)
        val gs = graft.model.GraphStore.open(s, path)
        val (lo, hi, nBins) = statsEdges
        val idx = new graft.operators.MaintainedStatsIndex(
          gs, "v_doc", "n_chars", lo, hi, nBins, path, groupCol = Some("lang"))
        val batch = s.read.parquet(s"$d/documents.parquet")
          .filter(col("lang") === "zh")
          .select((col("n_chars") + 900).as("n_chars"), col("lang"))
        idx.admissionPsiByGroup("ref", batch)
          .withColumnRenamed("g", "lang")
          .withColumn("admitted", col("psi_ppm") <= 400000L)
          .orderBy("lang")
      },
      Some(s"""WITH a AS (SELECT lang AS g, CAST(n_chars AS DOUBLE) AS v
             |  FROM documents WHERE doc_id % 2 = 0),
             |b AS (SELECT lang AS g, CAST(n_chars +
             |    CASE WHEN doc_id % 10 = 0 THEN 500 ELSE 0 END AS DOUBLE) AS v
             |  FROM documents WHERE NOT (doc_id % 14 = 0 AND doc_id % 10 <> 0)
             |  UNION ALL
             |  SELECT lang AS g, CAST(n_chars + 900 AS DOUBLE) AS v
             |  FROM documents WHERE lang = 'zh'),
             |ca AS (SELECT g, greatest(0, least(15,
             |      CAST(floor(((v - 0.0) * 16) / (2000.0 - 0.0)) AS BIGINT))) AS bin,
             |    count(*) AS c_a FROM a GROUP BY 1, 2),
             |cb AS (SELECT g, greatest(0, least(15,
             |      CAST(floor(((v - 0.0) * 16) / (2000.0 - 0.0)) AS BIGINT))) AS bin,
             |    count(*) AS c_b FROM b GROUP BY 1, 2),
             |gl AS (SELECT g FROM ca UNION SELECT g FROM cb),
             |f AS (SELECT g, bin, coalesce(c_a, 0) AS c_a, coalesce(c_b, 0) AS c_b
             |  FROM (SELECT g, unnest(range(16)) AS bin FROM gl)
             |  LEFT JOIN ca USING (g, bin) LEFT JOIN cb USING (g, bin)),
             |${OracleFragments.driftGroupedTailSql(16)}
             |SELECT g AS lang, psi_ppm, psi_ppm <= 400000 AS admitted
             |FROM gp ORDER BY lang""".stripMargin)))
}
