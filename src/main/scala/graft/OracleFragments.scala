package graft

/** DuckDB oracle SQL fragments shared by the curation-family catalog
  * rows.
  *
  * The Scala side composes ONE implementation —
  * [[graft.operators.Curate]] for gate → exact dedup → split,
  * [[graft.operators.Multimodal]] for the audio fingerprint tier,
  * [[graft.operators.Sampling]] for quota/epoch mixing — into the
  * q110/q114/q117/q191/q192/q193 flagship compositions. The oracles
  * restate the same stages, so they must compose the same way: a gate
  * threshold or split boundary edited here updates every composed
  * oracle at once, instead of drifting across hand-copied CTE chains
  * (the pre-round-9 state had the q110 chain pasted verbatim into six
  * oracle strings).
  *
  * Fragments are CTE BODIES (no `WITH` keyword): each caller chooses
  * `WITH` vs `WITH RECURSIVE` and the fragment order, then appends its
  * own row-specific CTEs and final SELECT.
  */
private[graft] object OracleFragments {

  // --- per-doc token stats (the q97 measure tier) --------------------

  private val toks = "string_split_regex(trim(text), '\\s+')"
  private val nTok = s"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len($toks) END"
  private val sumLen = s"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE " +
    s"coalesce(list_sum(list_transform($toks, t -> length(t))), 0) END"
  private val nPunct = "length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))"
  private val nStop = s"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE " +
    s"len(list_filter($toks, " +
    "t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) END"

  /** `q`: integer token stats per document, from `documents`. */
  val tokenStatsCte: String =
    s"""q AS (SELECT doc_id, text,
       |    CAST($nTok AS BIGINT) AS n_tokens,
       |    CAST($sumLen AS BIGINT) AS sum_token_len,
       |    CAST($nPunct AS BIGINT) AS n_punct,
       |    CAST($nStop AS BIGINT) AS n_stop
       |  FROM documents)""".stripMargin

  /** The q97 quality-gate bitmask (1 = too short, 2 = token-length
    * shape, 4 = punctuation-heavy, 8 = too few stopwords) as a sum
    * over `q`'s stat columns plus `text`. Both the standalone q97 row
    * (which exposes the mask) and the gate filter below restate it.
    */
  val gateMaskSql: String =
    """(CASE WHEN n_tokens < 10 THEN 1 ELSE 0 END) +
      |    (CASE WHEN n_tokens > 0 AND (sum_token_len < 3 * n_tokens
      |          OR sum_token_len > 10 * n_tokens) THEN 2 ELSE 0 END) +
      |    (CASE WHEN n_punct * 10 > length(text) THEN 4 ELSE 0 END) +
      |    (CASE WHEN n_stop < 2 THEN 8 ELSE 0 END)""".stripMargin

  /** `g`: gate survivors — documents whose bitmask is clean. */
  val gateCte: String =
    s"""g AS (SELECT doc_id, text, n_tokens FROM q
       |  WHERE $gateMaskSql = 0)""".stripMargin

  /** `r`: exact-dedup representative — min id per content hash. */
  val exactDedupCte: String =
    "r AS (SELECT min(doc_id) AS doc_id FROM g GROUP BY md5(text))"

  /** `q` + `g` + `r` chained: the q110 curation prefix every composed
    * flagship starts from (callers supply `WITH`/`WITH RECURSIVE`).
    */
  val curatePrefix: String =
    s"$tokenStatsCte,\n$gateCte,\n$exactDedupCte"

  // --- per-source LM fluency gate (the q107 model as a curation
  //     stage — q226/q227) ---------------------------------------------

  /** The bigram-LM fluency CTE chain behind
    * [[graft.operators.Curate.lmLowFlags]]: the LM trains on the
    * clean slice named by `cleanCte` (a CTE with `doc_id`), every
    * document scores against it, and `lml` flags docs reading below
    * `relPpm` of their source's mean clean score. Expects `documents`;
    * produces `t0a` (tokenized corpus), `lmc1`/`lmc2`/`lmv` (the
    * model), `lmsc` (per-doc integer score), `lmsm` (per-source
    * integer mean over the clean slice), `lml` (doc_id, lm_low).
    * Mirrors q107's scoring CTEs with train = the clean slice and
    * test = the whole corpus.
    */
  def lmCtes(relPpm: Long, cleanCte: String = "g"): String =
    s"""t0a AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
       |    ELSE string_split_regex(trim(lower(text)), '\\s+') END AS tk
       |  FROM documents),
       |lmc1 AS (SELECT w, count(*) AS c1 FROM (
       |    SELECT unnest(tk) AS w FROM t0a JOIN $cleanCte USING (doc_id))
       |  GROUP BY 1),
       |lmc2 AS (SELECT w1, w2, count(*) AS c2 FROM (
       |    SELECT tk[i] AS w1, tk[i+1] AS w2
       |    FROM (SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i
       |          FROM t0a JOIN $cleanCte USING (doc_id) WHERE len(tk) >= 2))
       |  GROUP BY 1, 2),
       |lmv AS (SELECT count(*) AS v FROM lmc1),
       |lmb AS (SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
       |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i
       |        FROM t0a WHERE len(tk) >= 2)),
       |lmsc AS (SELECT doc_id, CAST(sum(
       |      ((coalesce(lmc2.c2, 0) + 1) * 1000000)
       |        // greatest(coalesce(lmc1.c1, 0) + lmv.v, 1)
       |    ) // count(*) AS BIGINT) AS score_ppm
       |  FROM lmb LEFT JOIN lmc2 USING (w1, w2)
       |    LEFT JOIN lmc1 ON lmb.w1 = lmc1.w CROSS JOIN lmv
       |  GROUP BY 1),
       |lmsm AS (SELECT d.source AS src,
       |    CAST(sum(s.score_ppm) // count(*) AS BIGINT) AS mean_ppm
       |  FROM lmsc s JOIN $cleanCte USING (doc_id)
       |    JOIN documents d USING (doc_id)
       |  GROUP BY 1),
       |lml AS (SELECT d.doc_id,
       |    coalesce(s.score_ppm * 1000000 < $relPpm * m.mean_ppm, FALSE) AS lm_low
       |  FROM documents d LEFT JOIN lmsc s USING (doc_id)
       |    LEFT JOIN lmsm m ON m.src = d.source)""".stripMargin

  /** [[curatePrefix]] with the per-source LM fluency stage folded into
    * the gate: `g0` is the q97-clean slice (the LM's training data),
    * `g` shrinks to the LM survivors, and `r` (the exact-dedup reps)
    * computes over the shrunken `g` — so every downstream fragment
    * (quotaRankCtes, curatedSelect) composes over the LM-gated chain
    * UNCHANGED, exactly as the Scala side's `Curate(lmGate = ...)`
    * composes.
    */
  def lmCuratePrefix(relPpm: Long): String =
    s"""$tokenStatsCte,
       |${gateCte.replace("g AS ", "g0 AS ")},
       |${lmCtes(relPpm, "g0")},
       |g AS (SELECT g0.doc_id, g0.text, g0.n_tokens
       |  FROM g0 JOIN lml USING (doc_id) WHERE NOT lm_low),
       |$exactDedupCte""".stripMargin

  // --- deterministic split (q77's md5 bucketing) ---------------------

  /** The 0..999 md5 hash bucket of an id expression. */
  def md5Bucket(id: String): String =
    s"('0x' || substr(md5(CAST($id AS VARCHAR)), 1, 8))::BIGINT % 1000"

  /** train/val/test split (900/50/50) of an id expression, unaliased
    * (the audit row wraps it in a kept-only CASE).
    */
  def splitExpr(id: String): String =
    s"""CASE WHEN ${md5Bucket(id)} < 900
       |    THEN 'train'
       |    WHEN ${md5Bucket(id)} < 950
       |    THEN 'val' ELSE 'test' END""".stripMargin

  /** train/val/test split (900/50/50) of an id expression, aliased
    * `split`.
    */
  def splitCase(id: String): String = s"${splitExpr(id)} AS split"

  /** The shared final SELECT of the curated-set rows (doc_id, split,
    * n_tokens from gate ⋈ exact-dedup reps): `tail` carries the row's
    * extra keep-list join / filter, e.g. `" JOIN nk USING (doc_id)"`
    * or `"\nWHERE g.doc_id NOT IN (SELECT id FROM dk)"`.
    */
  def curatedSelect(tail: String = ""): String =
    s"""SELECT g.doc_id,
       |  ${splitCase("g.doc_id")},
       |  n_tokens
       |FROM g JOIN r USING (doc_id)$tail
       |ORDER BY g.doc_id""".stripMargin

  // --- quality-classifier training (the q208 family) -----------------

  /** `f`: the classifier's 0/1 step-indicator features per document
    * from `q` (tokenStatsCte) — the basis's SQL rendered by
    * [[graft.operators.Classify.Indicator.sql]] over integer stats
    * (mean token length centi-units, punctuation per-myriad; all
    * operands non-negative, so DuckDB `//` and Spark `div` agree) —
    * plus the gate verdict as the 0/1 label. Mirrors the q208
    * QueryDef's gateStats/thresholdIndicators chain exactly.
    */
  def classifierFeaturesCte(basis: Seq[graft.operators.Classify.Indicator]): String =
    s"""f AS MATERIALIZED (SELECT doc_id,
       |    ${basis.map(i => s"${i.sql} AS ${i.featName}").mkString(",\n    ")},
       |    CAST(CASE WHEN ($gateMaskSql) = 0 THEN 1 ELSE 0 END AS BIGINT) AS y
       |  FROM (SELECT doc_id, text, n_tokens, sum_token_len, n_punct, n_stop,
       |      n_tokens AS ntok,
       |      (sum_token_len * 100) // greatest(n_tokens, 1) AS mlen,
       |      (n_punct * 10000) // greatest(length(text), 1) AS pr,
       |      n_stop AS nstop
       |    FROM q))""".stripMargin

  /** Batch-perceptron training unrolled to `rounds` CTE stages (the
    * q201 BPE-unroll technique): `w0` is the zero model; each round
    * crosses the 1-row weight CTE into the feature frame, takes the
    * sign-test prediction, and sums exact integer error gradients into
    * the next weight CTE. Matches
    * [[graft.operators.Classify.perceptronTrain]] row for row.
    * Expects `f` from [[classifierFeaturesCte]]; callers append
    * [[perceptronRoundsSelect]] (the per-round rows) or compose
    * [[perceptronPocketCte]] (the best-evaluated model).
    */
  def perceptronRoundsCte(rounds: Int, feats: Seq[String],
      from: String = "f"): String = {
    val d = feats.size
    val wCols = "wb" +: (1 to d).map(i => s"w$i")
    val margin = ("wb" +: feats.zipWithIndex.map { case (f, i) => s"w${i + 1}*$f" })
      .mkString(" + ")
    val w0 = s"w0 AS MATERIALIZED (SELECT ${wCols.map(w => s"CAST(0 AS BIGINT) AS $w").mkString(", ")})"
    val steps = (1 to rounds).map { t =>
      val grads = s"CAST(sum(y - pred) AS BIGINT) AS g0" +:
        feats.zipWithIndex.map { case (f, i) =>
          s"CAST(sum((y - pred) * $f) AS BIGINT) AS g${i + 1}"
        }
      s"""r$t AS MATERIALIZED (SELECT
         |    CAST(sum(CASE WHEN y = pred THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
         |    ${grads.mkString(",\n    ")}
         |  FROM (SELECT ${(("y" +: feats).map(c => s"$from.$c")).mkString(", ")},
         |      CASE WHEN $margin > 0 THEN 1 ELSE 0 END AS pred
         |    FROM $from CROSS JOIN w${t - 1})),
         |w$t AS MATERIALIZED (SELECT ${wCols.zipWithIndex.map { case (w, i) => s"w.$w + r.g$i AS $w" }.mkString(", ")}
         |  FROM w${t - 1} w CROSS JOIN r$t r)""".stripMargin
    }
    (w0 +: steps).mkString(",\n")
  }

  /** `ftr`: the deterministic md5-bucket TRAINING slice of `f` — the
    * q77 split hash at `frac`, mirroring the `sample` option of
    * [[graft.operators.Classify.perceptronTrain]] (a pure function of
    * doc ids, so both engines draw the identical training set). The
    * rounds then run `FROM ftr`; scoring/evaluation stay on `f`.
    */
  def classifierTrainSliceCte(frac: Double): String =
    s"""ftr AS MATERIALIZED (SELECT * FROM f
       |  WHERE ${md5Bucket("doc_id")} < ${math.round(frac * 1000)})""".stripMargin

  /** The per-round result rows from [[perceptronRoundsCte]]'s stages:
    * weights AFTER each round's update, n_correct of the weights the
    * round STARTED with.
    */
  def perceptronRoundsSelect(rounds: Int, feats: Seq[String]): String =
    (1 to rounds).map { t =>
      val ws = "wb AS w_bias" +:
        feats.zipWithIndex.map { case (f, i) => s"w${i + 1} AS w_$f" }
      s"""SELECT CAST($t AS BIGINT) AS iter, ${ws.mkString(", ")}, n_correct
         |FROM w$t CROSS JOIN r$t""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY iter"

  /** `pk`: the pocket model — among the weight vectors the rounds
    * evaluated (round t scores w_{t-1}), the one with the highest
    * n_correct, earliest round on ties. Mirrors
    * [[graft.operators.Classify.pocketWeights]].
    */
  def perceptronPocketCte(rounds: Int, feats: Seq[String]): String = {
    val wCols = ("wb" +: feats.indices.map(i => s"w${i + 1}")).mkString(", ")
    val cands = (1 to rounds).map { t =>
      s"SELECT $t AS t, $wCols, n_correct FROM w${t - 1} CROSS JOIN r$t"
    }
    s"""cand AS MATERIALIZED (${cands.mkString("\n  UNION ALL\n  ")}),
       |pk AS (SELECT * FROM cand ORDER BY n_correct DESC, t LIMIT 1)""".stripMargin
  }

  // --- distribution drift (the q203 family) --------------------------

  /** The drift-summary tail shared by q203/q205/q206: expects a
    * preceding CTE `u(v DOUBLE, side IN ('a','b'))` holding both
    * tagged populations, and mirrors
    * [[graft.operators.Drift.numericDrift]]'s expression tree
    * operation for operation (fixed-width bins over the union's exact
    * [min, max]; Laplace-smoothed PSI/JS; raw-proportion TVD; ppm
    * rounding — see Drift.scala's determinism notes). Callers prepend
    * `WITH u AS (...),` and append nothing.
    */
  def driftSummarySql(nBins: Int): String = {
    val top = nBins - 1
    s"""st AS (SELECT min(v) AS lo, max(v) AS hi FROM u),
       |c0 AS (SELECT CASE WHEN hi = lo THEN 0
       |      ELSE least($top, CAST(floor((v - lo) * $nBins / (hi - lo)) AS BIGINT)) END AS bin,
       |    sum(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS c_a,
       |    sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS c_b
       |  FROM u CROSS JOIN st GROUP BY 1),
       |f AS (SELECT bin, coalesce(c_a, 0) AS c_a, coalesce(c_b, 0) AS c_b
       |  FROM (SELECT unnest(range($nBins)) AS bin) LEFT JOIN c0 USING (bin)),
       |${driftTailSql(nBins)}""".stripMargin
  }

  /** Stratified drift (q214): expects `u(g, v DOUBLE, side)` and
    * mirrors [[graft.operators.Drift.groupedNumericDrift]] — per-group
    * union-[min,max] edges, per-group bins materialized, per-group
    * Laplace-smoothed summaries. Callers prepend `WITH u AS (...),`,
    * then select from `gp` (one row per `g`).
    */
  def driftGroupedSql(nBins: Int): String = {
    val top = nBins - 1
    s"""st AS (SELECT g, min(v) AS lo, max(v) AS hi FROM u GROUP BY g),
       |c0 AS (SELECT u.g, CASE WHEN hi = lo THEN 0
       |      ELSE least($top, CAST(floor((v - lo) * $nBins / (hi - lo)) AS BIGINT)) END AS bin,
       |    sum(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS c_a,
       |    sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS c_b
       |  FROM u JOIN st USING (g) GROUP BY 1, 2),
       |f AS (SELECT g, bin, coalesce(c_a, 0) AS c_a, coalesce(c_b, 0) AS c_b
       |  FROM (SELECT g, unnest(range($nBins)) AS bin FROM st)
       |  LEFT JOIN c0 USING (g, bin)),
       |${driftGroupedTailSql(nBins)}""".stripMargin
  }

  /** The grouped summary tail alone, from a prepared `f(g, bin, c_a,
    * c_b)` CTE covering every (group, bin) pair — for rows whose
    * binning differs from the per-group union-edges default (q215 pins
    * the edges to the maintained monitor's construction-time
    * configuration and clamps, mirroring the stratified
    * MaintainedStatsIndex). Yields `gp` (one row per `g`).
    */
  def driftGroupedTailSql(nBins: Int): String =
    s"""t AS (SELECT g, sum(c_a) AS n_a, sum(c_b) AS n_b FROM f GROUP BY g),
       |p AS (SELECT f.g, c_a, c_b, n_a, n_b,
       |    CAST(c_a + 1 AS DOUBLE) / CAST(n_a + $nBins AS DOUBLE) AS pa,
       |    CAST(c_b + 1 AS DOUBLE) / CAST(n_b + $nBins AS DOUBLE) AS pb
       |  FROM f JOIN t USING (g)),
       |gp AS (SELECT g,
       |  CAST(max(n_a) AS BIGINT) AS n_a, CAST(max(n_b) AS BIGINT) AS n_b,
       |  CAST(round(sum((pa - pb) * ln(pa / pb)) * 1000000, 0) AS BIGINT) AS psi_ppm,
       |  CAST(round(sum(pa * ln(pa / ((pa + pb) / 2.0)) * 0.5
       |    + pb * ln(pb / ((pa + pb) / 2.0)) * 0.5) * 1000000, 0) AS BIGINT) AS js_ppm,
       |  CAST(round(sum(abs(CAST(c_a AS DOUBLE) / CAST(greatest(n_a, 1) AS DOUBLE)
       |    - CAST(c_b AS DOUBLE) / CAST(greatest(n_b, 1) AS DOUBLE))) * 500000, 0) AS BIGINT) AS tvd_ppm
       |FROM p GROUP BY g)""".stripMargin

  /** The summary tail alone, from a prepared `f(bin, c_a, c_b)` CTE
    * covering every bin — for rows whose binning differs from the
    * union-edges default (q207 pins the edges to the REFERENCE
    * population and clamps arrivals, mirroring Drift.binExpr).
    */
  def driftTailSql(nBins: Int): String =
    s"""t AS (SELECT sum(c_a) AS n_a, sum(c_b) AS n_b FROM f),
       |p AS (SELECT c_a, c_b, n_a, n_b,
       |    CAST(c_a + 1 AS DOUBLE) / CAST(n_a + $nBins AS DOUBLE) AS pa,
       |    CAST(c_b + 1 AS DOUBLE) / CAST(n_b + $nBins AS DOUBLE) AS pb
       |  FROM f CROSS JOIN t)
       |SELECT CAST(max(n_a) AS BIGINT) AS n_a, CAST(max(n_b) AS BIGINT) AS n_b,
       |  CAST(round(sum((pa - pb) * ln(pa / pb)) * 1000000, 0) AS BIGINT) AS psi_ppm,
       |  CAST(round(sum(pa * ln(pa / ((pa + pb) / 2.0)) * 0.5
       |    + pb * ln(pb / ((pa + pb) / 2.0)) * 0.5) * 1000000, 0) AS BIGINT) AS js_ppm,
       |  CAST(round(sum(abs(CAST(c_a AS DOUBLE) / CAST(greatest(n_a, 1) AS DOUBLE)
       |    - CAST(c_b AS DOUBLE) / CAST(greatest(n_b, 1) AS DOUBLE))) * 500000, 0) AS BIGINT) AS tvd_ppm
       |FROM p""".stripMargin

  // --- audio fingerprint arithmetic (q189's generator replay) --------

  /** `b` + `bits`: the pattern waveform's 65 amplitude steps and the
    * 64 delta-sign bits per document (q189's generator arithmetic).
    */
  val audioBitsCtes: String =
    """b AS (
      |  SELECT doc_id, k.k,
      |    ((doc_id*31) % 8192 + 389*k.k) % 8192 AS v
      |  FROM documents, (SELECT unnest(range(65)) AS k) k),
      |bits AS (
      |  SELECT b1.doc_id, b1.k,
      |    CASE WHEN b1.v < b2.v THEN 1 ELSE 0 END AS bit
      |  FROM b b1 JOIN b b2 ON b1.doc_id = b2.doc_id AND b2.k = b1.k + 1
      |  WHERE b1.k < 64)""".stripMargin

  /** The 64-bit fingerprint assembled from `bits` (two's-complement
    * bit 63), as an aggregate expression.
    */
  val audioHashSumSql: String =
    """CAST(sum(CASE WHEN bit = 1 THEN
      |    CASE WHEN k = 63 THEN -9223372036854775808
      |         ELSE (1::BIGINT << k) END ELSE 0 END) AS BIGINT)""".stripMargin

  // --- quota + epoch mix (q93/q94's arithmetic, q192/q193) -----------

  /** `c` + `k`: train-split survivors joined back to their source,
    * ranked per source by the q93 md5-rank determinism for the quota
    * cap. Requires `g`/`r` (the curate prefix) in scope.
    */
  val quotaRankCtes: String =
    s"""c AS (SELECT g.doc_id, g.n_tokens, d2.source
       |  FROM g JOIN r USING (doc_id) JOIN documents d2 USING (doc_id)
       |  WHERE ${md5Bucket("g.doc_id")} < 900),
       |k AS (SELECT doc_id, n_tokens, source, row_number() OVER (
       |    PARTITION BY source
       |    ORDER BY md5(CAST(doc_id AS VARCHAR)), CAST(doc_id AS VARCHAR)) AS rk
       |  FROM c)""".stripMargin

  /** The epoch-weighted copy-count predicate over `k, range(3) r2`
    * (q94's arithmetic at the flagship weights: src0 2.5 epochs,
    * src1 0.4, everything else 1).
    */
  val epochCopyPredicate: String =
    """r2.range < (CASE k.source
      |    WHEN 'src0' THEN 2 + (CASE WHEN ('0x' || substr(md5(CAST(k.doc_id AS VARCHAR) || ':epoch'), 1, 8))::BIGINT % 1000000 < 500000 THEN 1 ELSE 0 END)
      |    WHEN 'src1' THEN (CASE WHEN ('0x' || substr(md5(CAST(k.doc_id AS VARCHAR) || ':epoch'), 1, 8))::BIGINT % 1000000 < 400000 THEN 1 ELSE 0 END)
      |    ELSE 1 END)""".stripMargin

  // --- shingle sets (the jaccard-dedup family) -----------------------

  /** Word-3-shingle sets per document, bare SELECT body (use as
    * `WITH s AS ($shingleSetSql)`) — mirrors Dedup.shingles with k=3
    * exactly, short-doc case included. Shared by the batch jaccard
    * oracles (CatalogPipeline q55/q56/q76/q153/…) and the streaming
    * near-dup row (CatalogStreaming q194).
    */
  val shingleSetSql: String =
    """SELECT doc_id, CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
      |  ELSE list_distinct(list_transform(range(1, len(w)-1),
      |         i -> array_to_string(w[i:i+2], ' '))) END AS sh
      |FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents)""".stripMargin

  /** Keep-first exact-substring span removal over k-token windows —
    * coverage re-derived from window TEXT, excision restated as a
    * position anti-join + ordered string_agg. Mirrors
    * Dedup.removeDupSpans; shared by the batch row (q235) and its
    * streaming verdict twin (q239), whose outputs are identical by
    * construction.
    */
  def spanRemovalSql(k: Int): String = {
    val km1 = k - 1
    s"""WITH d0 AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
       |    ELSE string_split_regex(trim(text), '\\s+') END AS tk FROM documents),
       |w AS (SELECT doc_id, i, array_to_string(tk[i:i+$km1], ' ') AS win
       |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - $km1)) AS i
       |        FROM d0 WHERE len(tk) >= $k)),
       |own AS (SELECT win, min(doc_id) AS owner FROM w GROUP BY 1),
       |cov AS (SELECT DISTINCT doc_id, j FROM (
       |  SELECT w.doc_id, unnest(generate_series(w.i, w.i + $km1)) AS j
       |  FROM w JOIN own USING (win) WHERE w.doc_id > own.owner)),
       |pos AS (SELECT doc_id, j, tk[j] AS tok
       |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk))) AS j
       |        FROM d0 WHERE len(tk) >= 1)),
       |kept AS (SELECT p.doc_id, p.j, p.tok FROM pos p
       |  LEFT JOIN cov c ON p.doc_id = c.doc_id AND p.j = c.j
       |  WHERE c.j IS NULL),
       |ag AS (SELECT doc_id, count(*) AS n_kept,
       |  string_agg(tok, ' ' ORDER BY j) AS cleaned FROM kept GROUP BY 1)
       |SELECT d0.doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
       |  CAST(len(tk) - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
       |  CAST((len(tk) - coalesce(n_kept, 0)) * 10000
       |    // greatest(len(tk), 1) AS BIGINT) AS removed_pm,
       |  md5(coalesce(cleaned, '')) AS cleaned_fp
       |FROM d0 LEFT JOIN ag USING (doc_id) ORDER BY doc_id""".stripMargin
  }
}
