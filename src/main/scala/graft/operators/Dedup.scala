package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH near-dup, SimHash, and n-gram Jaccard.
  *
  * Scale design: everything before the final candidate verification is
  * a narrow map (signature computation, codegen'd column expressions)
  * followed by ONE shuffle on (band, bandHash) — the classic
  * shingle → minhash → band → bucket-join shape. No all-pairs work ever
  * happens: candidate pairs only materialize inside an LSH bucket.
  */
object Dedup {

  /** Exact duplicate groups by content hash: returns one row per
    * distinct hash with its count (hash-groupBy; one shuffle).
    */
  def exactDupGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))

  /** Word k-shingles of a text column as an array of strings — r16: a
    * native per-row expression ([[graft.functions.WordShinglesExpression]],
    * bit-identical to `shinglesOfTokens(tokens(text), k)`). The old
    * convenience overload embedded the tokenizer inside the
    * per-position lambda, and Catalyst evaluates a lambda body per
    * element — the regex split ran once per shingle position (O(n²)
    * per row; measured 7.5 s per corpus pass at sf0.1 on the
    * contrastive chain, which evaluated it four times).
    */
  def shingles(text: Column, k: Int): Column =
    graft.functions.WordShinglesExpression.word_shingles(text, k)

  /** Word k-shingles from a token-array column (ideally a bound
    * attribute, so per-position slices are cheap in-memory array ops).
    */
  def shinglesOfTokens(toks: Column, k: Int): Column =
    when(size(toks) < k, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))

  /** MinHash signature over already-hashed shingles: the per-seed
    * family re-hashes 8-byte longs, so the strings are hashed exactly
    * once upstream. Pure column expressions → codegen'd.
    */
  def minhashSignature(hashedShingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(hashedShingles, h => xxhash64(h, lit(i))))
    }: _*)

  /** LSH banding: (docId, band, bandHash) rows, one per band. Docs
    * agreeing on any full band land in the same bucket.
    */
  /** (id, hsh, sig): distinct HASHED shingle set + minhash signature,
    * computed in one narrow map pass — shared by bucketing and
    * verification. Shingle strings are hashed to longs immediately and
    * never carried further: exact verification intersects long arrays
    * (cheap, fixed-width) instead of string arrays, and 64-bit
    * collisions are negligible at any realistic shingle-set size.
    */
  /** (doc, hsh): distinct 64-bit-hashed word k-shingle set per
    * document — the shared first stage of every shingle consumer
    * (minhash signatures, decontamination probes). Shingle strings are
    * hashed immediately and never carried further.
    *
    * Two materialization barriers: (1) tokens — the per-position
    * shingle lambda re-evaluates its operand per element, so the regex
    * split must be a materialized array, not an expression; (2) hashed
    * shingles — projection collapse would inline the shingle tree into
    * every downstream per-seed expression (the round-1 ~50×
    * re-evaluation trap).
    */
  def hashedShingleFrame(df: DataFrame, idCol: String, textCol: String,
      k: Int, caseFold: Boolean = false): DataFrame = {
    val t = if (caseFold) lower(col(textCol)) else col(textCol)
    val toksDf = df.select(col(idCol).as("doc"),
        TextAnalysis.tokens(t).as("toks"))
      .localCheckpoint(eager = true)
    toksDf.select(col("doc"),
        array_distinct(transform(shinglesOfTokens(col("toks"), k), s => xxhash64(s))).as("hsh"))
      .localCheckpoint(eager = true)
  }

  def signatureFrame(df: DataFrame, idCol: String, textCol: String,
      k: Int, numHashes: Int): DataFrame =
    hashedShingleFrame(df, idCol, textCol, k)
      .withColumn("sig", minhashSignature(col("hsh"), numHashes))

  /** LSH banding over a signature frame: (doc, band, bandHash) — kept
    * narrow (no shingle payload) so the bucket shuffle moves only
    * id + 2 longs per band, not band-many copies of the document.
    */
  def lshBuckets(sigs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    sigs.select(col("doc"), posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows))), b))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
  }

  /** Near-duplicate candidate pairs via MinHash LSH, verified with exact
    * shingle-set Jaccard. Returns (id_a, id_b, jaccard) with id_a < id_b
    * and jaccard >= threshold.
    *
    * Shuffle budget: one narrow shuffle on (band, band_hash) to form
    * candidate pairs (ids only), then two hash joins back to the
    * shingle sets for exact verification — the heavy arrays are never
    * replicated per band. Long-running pipelines should persist
    * `signatureFrame` and pass it via `sigs`.
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 24, bands: Int = 8,
      threshold: Double = 0.5, sigs: Option[DataFrame] = None): DataFrame = {
    // materialization barrier: without it Catalyst's projection
    // collapse inlines the shingle expression into every seed × band ×
    // join consumer (~50× re-evaluation measured at sf0.1); with it the
    // signatures are computed exactly once and served to the bucket
    // self-join and both verification joins
    val sigFrame = sigs.getOrElse(
      signatureFrame(df, idCol, textCol, k, numHashes).localCheckpoint(true))
    val buckets = lshBuckets(sigFrame, numHashes, bands)
    val pairs = buckets.as("a").join(buckets.as("b"), Seq("band", "band_hash"))
      .filter(col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b")).distinct()
    pairs
      .join(sigFrame.select(col("doc").as("id_a"), col("hsh").as("sh_a")), Seq("id_a"))
      .join(sigFrame.select(col("doc").as("id_b"), col("hsh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact n-gram Jaccard for an explicit candidate-pair frame
    * (id_a, id_b) — two hash joins, linear in |pairs|. Pairs can come
    * from LSH buckets, blocking keys, or id windows; pairs whose ids
    * are absent from `df` drop out via the inner joins.
    */
  def jaccardForPairs(df: DataFrame, idCol: String, textCol: String, k: Int,
      pairs: DataFrame): DataFrame = {
    val sh = df.select(col(idCol).as("id"), array_distinct(shingles(col(textCol), k)).as("sh"))
    pairs
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
  }

  /** Near-id blocking pairs: (id, id+1..id+maxOffset) — generated with
    * an explode + equi-join, never a quadratic theta-join.
    */
  def nearIdPairs(df: DataFrame, idCol: String, maxOffset: Int): DataFrame =
    df.select(col(idCol).as("id_a"))
      .select(col("id_a"), explode(sequence(lit(1), lit(maxOffset))).as("off"))
      .select(col("id_a"), (col("id_a") + col("off")).as("id_b"))

  /** Blocked fuzzy entity matching (record linkage): candidate pairs
    * come from an EQUI-join on a blocking key — never a theta- or
    * cross-join — and only within-block pairs pay the edit-distance
    * comparison. This is the classic blocking discipline: total cost is
    * Σ|block|², controlled entirely by the blocking key's selectivity,
    * and the join shuffles hash-partition by block so comparisons
    * parallelize across blocks. A skewed mega-block is AQE's skew-join
    * case, and tightening the key (adding a column) is the scale knob.
    *
    * Returns `(id_a, id_b, name_a, name_b, dist)` with `id_a < id_b`
    * and `levenshtein <= maxDist` — `levenshtein` being Spark's codegen
    * built-in, computed AFTER the cheap block+id filters.
    */
  def blockedEditDistancePairs(df: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], maxDist: Int): DataFrame = {
    require(blockCols.nonEmpty, "need at least one blocking column")
    require(maxDist >= 0, "maxDist must be non-negative")
    val a = df.select(struct(blockCols.map(col): _*).as("__blk"),
      col(idCol).as("id_a"), col(nameCol).as("name_a"))
    val b = df.select(struct(blockCols.map(col): _*).as("__blk"),
      col(idCol).as("id_b"), col(nameCol).as("name_b"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "name_a", "name_b", "dist")
  }

  /** [[blockedEditDistancePairs]] with Jaro-Winkler similarity as the
    * within-block measure — the census-style name matcher (positional
    * tolerance + common-prefix bonus) where edit distance is too
    * coarse: "jon"/"john" and "jon"/"ton" are both levenshtein 1, but
    * JW separates them (prefix agreement matters in names). The
    * similarity is the native codegen
    * [[graft.functions.JaroWinklerExpression]] (rapidfuzz/DuckDB
    * semantics), rounded to 6 decimals BEFORE thresholding so the
    * kept-pair set is a printed-precision contract any engine
    * reproduces. Same blocking discipline: equi-join on the key,
    * Σ|block|² cost, never a cross join.
    *
    * Returns `(id_a, id_b, name_a, name_b, jw)` with `id_a < id_b`
    * and `jw >= minSim`.
    */
  def blockedJaroWinklerPairs(df: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], minSim: Double): DataFrame = {
    require(blockCols.nonEmpty, "need at least one blocking column")
    require(minSim > 0 && minSim <= 1, "minSim must be in (0, 1]")
    val a = df.select(struct(blockCols.map(col): _*).as("__blk"),
      col(idCol).as("id_a"), col(nameCol).as("name_a"))
    val b = df.select(struct(blockCols.map(col): _*).as("__blk"),
      col(idCol).as("id_b"), col(nameCol).as("name_b"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jw", round(graft.functions.JaroWinklerExpression
        .jaro_winkler(col("name_a"), col("name_b")), 6))
      .filter(col("jw") >= minSim)
      .select("id_a", "id_b", "name_a", "name_b", "jw")
  }

  /** Trigram-blocked Jaro-Winkler matching — [[blockedJaroWinklerPairs]]
    * WITHOUT a fixed blocking key: candidates are pairs sharing at
    * least one RARE character trigram (document frequency ≤ `maxDf`),
    * then Jaro-Winkler-verified. This is the scalable string join: a
    * fixed blocking key's cost is Σ|block|², which goes quadratic as
    * blocks grow with the corpus, while rare-trigram candidates are
    * bounded by Σ_tg C(df,2) ≤ (trigram rows)·maxDf/2 — LINEAR in the
    * corpus at fixed maxDf, the knob a deployment tightens as data
    * grows. Ubiquitous trigrams (shared prefixes, common substrings)
    * never generate candidates at all.
    *
    * Same verification contract as [[blockedJaroWinklerPairs]]: jw
    * rounded to 6 BEFORE thresholding. Returns
    * `(id_a, id_b, name_a, name_b, jw)`, `id_a < id_b`, deduplicated
    * across shared trigrams.
    */
  def trigramJaroWinklerPairs(df: DataFrame, idCol: String, nameCol: String,
      maxDf: Int, minSim: Double): DataFrame = {
    require(maxDf >= 1, "maxDf must be positive")
    require(minSim > 0 && minSim <= 1, "minSim must be in (0, 1]")
    // DISTINCT trigrams per name from ONE native expression (r17):
    // ids are unique, so per-row dedup inside char_trigrams IS the old
    // frame-level `.distinct()` — whose only job was within-row dedup,
    // paid as a corpus-grain shuffle of (id, name, trigram) rows with
    // the full name carried through the exchange (guide §2.4: remove
    // shuffles outright). The per-position substr (O(n²) code-point
    // re-seeks) and the under-3-chars filter fold into the same pass
    // (short names yield an empty array; explode drops them).
    val tg = df
      .select(col(idCol).as("__id"), col(nameCol).as("__name"))
      .select(col("__id"), col("__name"),
        explode(graft.functions.CharTrigramsExpression
          .char_trigrams(col("__name"))).as("__tg"))
    val rare = tg.groupBy("__tg").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
      .select("__tg")
    val kept = tg.join(rare, Seq("__tg"))
    val cands = kept.select(col("__tg"), col("__id").as("id_a"), col("__name").as("name_a"))
      .join(kept.select(col("__tg"), col("__id").as("id_b"), col("__name").as("name_b")),
        Seq("__tg"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "name_a", "name_b")
      .distinct()
    cands
      .withColumn("jw", round(graft.functions.JaroWinklerExpression
        .jaro_winkler(col("name_a"), col("name_b")), 6))
      .filter(col("jw") >= minSim)
  }

  /** 64-bit SimHash over whitespace tokens. Columnar bit-counting: for
    * each bit position the signed token-hash contributions are summed
    * via aggregate(); stays in codegen (no Scala closures at runtime).
    */
  /** 60-bit token hasher from md5's leading 15 hex digits — same
    * construction exists verbatim in ANSI-ish SQL, which is what lets
    * the q57 oracle recompute simhash value-for-value in DuckDB.
    * xxhash64 (the default) is faster; prefer it when no cross-engine
    * verification is needed.
    */
  val md5Hash60: Column => Column =
    t => conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  def simhash64(text: Column,
      tokenHash: Column => Column = t => xxhash64(t)): Column = {
    val hashes = transform(TextAnalysis.tokens(text), tokenHash)
    val bits = (0 until 64).map { i =>
      val contrib = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(h.bitwiseAND(lit(1L << i)) =!= 0L, lit(1L)).otherwise(lit(-1L)))
      when(contrib > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two simhash values (near-dup test). */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact substring-duplication detection — the suffix-array-style
    * window dedup of "Deduplicating Training Data Makes Language Models
    * Better" re-expressed distributed: every k-token window of every
    * document is checked for occurring anywhere else in the corpus
    * (any document, any position, its own included). Returns one row
    * per document: (id, n_windows, n_dup_windows, dup_pm) — the
    * per-doc duplicated-span load a cleaning pass cuts or downweights
    * (per-myriad integer, the repo's bit-exact ratio discipline).
    *
    * Scale shape: window text never leaves the map side — each
    * position reduces to a 16-byte md5 digest (128-bit, so collisions
    * cannot perturb counts even at 100 TB window cardinalities; a
    * 64-bit hash starts colliding at ~2^32 windows), one
    * groupBy(digest) counts occurrences, only the DUPLICATED digests
    * (a small fraction) join back to the position frame, and the
    * per-doc rollup joins a narrow no-shuffle n_windows projection on
    * the doc key. A super-frequent boilerplate window skews only its
    * own digest's partition, and AQE's skew handling applies.
    */
  def dupSpans(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, "window size must be positive")
    val tk = Sampling.freshName(df, "tk")
    // per-row window count: no shuffle, defined for every doc
    val base = df.select(col(idCol).as("__id"),
      greatest(size(TextAnalysis.tokens(col(textCol))) - k + 1, lit(0))
        .cast("long").as("n_windows"))
    // (doc, digest) per window position, from docs long enough to have one
    val w = df.withColumn(tk, TextAnalysis.tokens(col(textCol)))
      .filter(size(col(tk)) >= k)
      .select(col(idCol).as("__id"), col(tk),
        explode(sequence(lit(1), size(col(tk)) - k + 1)).as("__i"))
      .select(col("__id"),
        unhex(md5(concat_ws(" ", slice(col(tk), col("__i"), lit(k))))).as("__wh"))
    val dupDigests = w.groupBy("__wh").agg(count(lit(1)).as("__total"))
      .filter(col("__total") > 1).select("__wh")
    val perDoc = w.join(dupDigests, Seq("__wh"))
      .groupBy("__id").agg(count(lit(1)).as("__ndup"))
    base.join(perDoc, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_windows"),
        coalesce(col("__ndup"), lit(0L)).as("n_dup_windows"))
      .withColumn("dup_pm",
        expr("n_dup_windows * 10000 div greatest(n_windows, 1)"))
  }

  /** Per-document NOVELTY scoring — the marginal-contribution audit of
    * an ordered ingest (id order = arrival order): how much of each
    * document's content is genuinely new versus already present in any
    * LOWER-id document? The per-myriad complement of [[dupSpans]]'s
    * corpus-wide symmetric count: here attribution is directional, so
    * boilerplate is charged to every COPY but never to its first
    * appearance — the ranking a curation pass uses to keep originals
    * and downweight recycled content.
    *
    * Unit is the DISTINCT k-token window per document. A window is
    * novel for the minimal doc id that contains it; every later doc
    * holding the same window has it counted against novelty. Same
    * digest discipline as [[dupSpans]]: window text reduces map-side
    * to a 16-byte md5, one groupBy(digest) computes the min owner,
    * and the join-back moves (digest, first_id) pairs only. Returns
    * `(id, n_windows, n_novel, novelty_pm)` for every document
    * (short docs: 0 windows, novelty_pm 0).
    */
  def noveltyScores(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k > 0, "window size must be positive")
    val tk = Sampling.freshName(df, "tk")
    val w = df.withColumn(tk, TextAnalysis.tokens(col(textCol)))
      .filter(size(col(tk)) >= k)
      .select(col(idCol).as("__id"), col(tk),
        explode(sequence(lit(1), size(col(tk)) - k + 1)).as("__i"))
      .select(col("__id"),
        unhex(md5(concat_ws(" ", slice(col(tk), col("__i"), lit(k))))).as("__wh"))
      .distinct()
    val firstOwner = w.groupBy("__wh").agg(min(col("__id")).as("__first"))
    val perDoc = w.join(firstOwner, Seq("__wh"))
      .groupBy("__id")
      .agg(count(lit(1)).as("__nw"),
        count(when(col("__first") === col("__id"), 1)).as("__nn"))
    df.select(col(idCol).as("__id"))
      .join(perDoc, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("__nw"), lit(0L)).as("n_windows"),
        coalesce(col("__nn"), lit(0L)).as("n_novel"))
      .withColumn("novelty_pm",
        expr("n_novel * 10000 div greatest(n_windows, 1)"))
  }

  /** Contrastive POSITIVE-pair mining for retrieval/embedding-model
    * training — the complement of [[graft.operators.Search]]'s
    * hard-negative stage: near-duplicate clusters are free positives
    * (two crawls of the same page, a lightly-edited repost, a
    * re-wrapped document SHOULD embed close), so every non-canonical
    * cluster member pairs with its cluster representative (min id,
    * same canonicalization as the dedup keep-list) as
    * `(anchor_id, positive_id)`. The pair ships with its EXACT
    * k-shingle Jaccard in per-myriad integers — the anchor→rep edge
    * may be transitive (A~B~C with A~C below threshold), and training
    * pipelines weight or floor pairs by this score.
    *
    * Clusters come from [[minhashNearDups]] candidates + connected
    * components ([[GraphAnalytics.connectedComponents]]), exactly the
    * q76 dedup-cluster chain; singleton documents produce no pair.
    *
    * Returns `(anchor_id, positive_id, n_inter, n_union, jaccard_pm)`
    * — integer set sizes, so the score is bit-exact on any engine.
    *
    * Scale shape: the LSH chain is banded equi-joins (never
    * all-pairs); components iterate shuffle-bounded; the pair scoring
    * is [[jaccardForPairs]]'s two hash joins, linear in the pair
    * count, and pairs are |non-canonical cluster members| — a small
    * fraction of the corpus by construction.
    */
  /** Near-dup cluster components (id, component) — the q76 chain:
    * LSH candidates + connected components over the whole id universe.
    */
  def nearDupComponents(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 24, bands: Int = 8,
      threshold: Double = 0.5, sigs: Option[DataFrame] = None): DataFrame = {
    val pairs = minhashNearDups(df, idCol, textCol, k, numHashes, bands,
      threshold, sigs)
    GraphAnalytics.connectedComponents(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
      df.select(col(idCol).as("id")))
  }

  /** The contrastive tier's shared scoring frame — r16: the SAME
    * 64-bit-hashed shingle sets the LSH tier verifies with (reused from
    * the caller's checkpointed signature frame when provided), sorted
    * once at document grain so per-pair intersection is ONE native
    * allocation-free merge ([[graft.functions
    * .SortedIntersectCountExpression]]). The r15 shape recomputed
    * STRING shingle sets per join side (the O(n²) in-lambda tokenizer,
    * ~7.5 s per corpus pass at sf0.1) and ran hash-set
    * intersect/union builtins per candidate pair. Hashed-set counts
    * equal string-set counts absent 64-bit collisions — the
    * minhash-verify discipline, certified collision-free by the
    * exhaustive text-level oracles (q238/q240).
    */
  /** NOTE (pinned contract, r16/r17): [[contrastivePairs]] and
    * [[contrastiveTriplets]] score Jaccard over 64-BIT-HASHED shingle
    * sets with n_union = |A| + |B| − n_inter, so a 64-bit collision
    * WITHIN one document's shingle set would shift jaccard_pm /
    * pos_pm / neg_pm relative to string-set semantics. Collision odds
    * are ~m²/2⁶⁵ per document (negligible at any realistic shingle
    * count), and the exactness contract is CERTIFIED, not assumed:
    * the q238/q240 oracles recompute both tables from text-level
    * string sets on every verify run — keep that oracle coverage
    * mandatory when touching this path.
    */
  private def sortedHashedSets(df: DataFrame, idCol: String, textCol: String,
      k: Int, sigs: Option[DataFrame]): DataFrame =
    sigs.getOrElse(hashedShingleFrame(df, idCol, textCol, k))
      .select(col("doc").as("__sid"), sort_array(col("hsh")).as("__sh"),
        size(col("hsh")).cast("long").as("__sz"))

  private def pairScorePm(a: String, b: String): Column =
    graft.functions.SortedIntersectCountExpression
      .sorted_intersect_count(col(a), col(b))

  def contrastivePairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 24, bands: Int = 8,
      threshold: Double = 0.5, sigs: Option[DataFrame] = None): DataFrame = {
    val comps = nearDupComponents(df, idCol, textCol, k, numHashes, bands,
      threshold, sigs)
    val anchors = comps.filter(col("id") =!= col("component"))
      .select(col("id").as("anchor_id"), col("component").as("positive_id"))
    val sh = sortedHashedSets(df, idCol, textCol, k, sigs)
    anchors
      .join(sh.select(col("__sid").as("anchor_id"), col("__sh").as("__sha"),
        col("__sz").as("__sza")), Seq("anchor_id"))
      .join(sh.select(col("__sid").as("positive_id"), col("__sh").as("__shp"),
        col("__sz").as("__szp")), Seq("positive_id"))
      .withColumn("n_inter", pairScorePm("__sha", "__shp"))
      .select(col("anchor_id"), col("positive_id"), col("n_inter"),
        (col("__sza") + col("__szp") - col("n_inter")).as("n_union"))
      .withColumn("jaccard_pm",
        expr("n_inter * 10000 div greatest(n_union, 1)"))
  }

  /** Contrastive TRIPLET mining — [[contrastivePairs]]'s positives
    * joined with a deterministic hard NEGATIVE per anchor: the
    * highest-Jaccard partner that is (a) NOT in the anchor's near-dup
    * cluster, (b) BELOW the dup threshold (a near-miss — random
    * negatives are trivially separable; sub-threshold neighbors force
    * the embedding model to learn the dup boundary itself), and
    * (c) reachable through a RARE shared shingle (document frequency
    * ≤ `maxDf`): the blocking is df-bounded — a boilerplate shingle
    * shared by half the corpus never generates pairs — and a shared
    * rare shingle is exactly what makes a negative "hard" rather than
    * random. Ties break (jaccard_pm desc, partner id asc); anchors
    * with no qualifying negative emit nothing.
    *
    * All scoring is integer per-myriad over exact shingle-set sizes
    * (pm < threshold·10⁴ ⟺ double jaccard < threshold on this domain
    * — both sides reduce to 2·|∩| vs |∪| integer comparisons), so an
    * exhaustive SQL oracle reproduces the triplet table bit-for-bit.
    *
    * Returns `(anchor_id, positive_id, negative_id, pos_pm, neg_pm)`.
    *
    * Scale shape: the positive side is [[contrastivePairs]]; the
    * negative side is a df-bounded shingle equi-join (≤ maxDf² pairs
    * per rare shingle, never all-pairs), two hash joins for the set
    * scores, and a per-anchor rank window. The components frame is
    * computed ONCE and shared by both sides.
    */
  def contrastiveTriplets(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 24, bands: Int = 8,
      threshold: Double = 0.5, maxDf: Int = 20, negFloorPm: Int = 1,
      sigs: Option[DataFrame] = None): DataFrame = {
    require(maxDf >= 2, "maxDf must be >= 2 (a pair needs two docs)")
    require(negFloorPm >= 0, "negFloorPm must be >= 0")
    import org.apache.spark.sql.expressions.Window
    val thresholdPm = math.round(threshold * 10000).toInt
    val comps = nearDupComponents(df, idCol, textCol, k, numHashes, bands,
      threshold, sigs)
    // r16: ONE sorted hashed-set frame serves the positive scores, the
    // rare-shingle blocking AND the negative scores (see
    // sortedHashedSets — the r15 shape rebuilt string shingle sets for
    // each of its four references)
    val sh = sortedHashedSets(df, idCol, textCol, k, sigs)
    // positives: non-canonical members → their cluster rep, exact pm
    val pos = comps.filter(col("id") =!= col("component"))
      .select(col("id").as("anchor_id"), col("component").as("positive_id"))
      .join(sh.select(col("__sid").as("anchor_id"), col("__sh").as("__sha"),
        col("__sz").as("__sza")), Seq("anchor_id"))
      .join(sh.select(col("__sid").as("positive_id"), col("__sh").as("__shp"),
        col("__sz").as("__szp")), Seq("positive_id"))
      .withColumn("__ni", pairScorePm("__sha", "__shp"))
      .select(col("anchor_id"), col("positive_id"),
        expr("__ni * 10000 div greatest(__sza + __szp - __ni, 1)").as("pos_pm"))
    // negatives: rare-shingle blocked sub-threshold partners (blocking
    // keys are the hashed shingles — same df counts as the strings).
    // r16: only pairs touching an ANCHOR can reach the output (the
    // rank window groups by anchor_id and the final join keeps anchor
    // rows only), so the candidate self-join carries an is-anchor flag
    // and drops anchor-free pairs BEFORE the distinct + scoring joins —
    // at sf0.1 that is ~80% of the 1.1M blocked pairs
    val anchorIds = comps.filter(col("id") =!= col("component"))
      .select(col("id")).withColumn("__anch", lit(true))
    val x = sh.select(col("__sid").as("id"), explode(col("__sh")).as("g"))
    val rareG = x.groupBy("g").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf).select("g")
    // (no broadcast hint: anchors are cluster members — small here,
    // but corpus-fraction-sized in the worst case; AQE broadcasts when
    // the measured size allows)
    val rare = x.join(rareG, Seq("g"))
      .join(anchorIds, Seq("id"), "left")
    val cand = rare.as("a").join(rare.as("b"), Seq("g"))
      .filter(col("a.id") < col("b.id") &&
        (col("a.__anch") || col("b.__anch")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    val scored = cand
      .join(sh.select(col("__sid").as("id_a"), col("__sh").as("__sha"),
        col("__sz").as("__sza")), Seq("id_a"))
      .join(sh.select(col("__sid").as("id_b"), col("__sh").as("__shb"),
        col("__sz").as("__szb")), Seq("id_b"))
      .withColumn("__ni", pairScorePm("__sha", "__shb"))
      .select(col("id_a"), col("id_b"),
        expr("__ni * 10000 div greatest(__sza + __szb - __ni, 1)").as("pm"))
    val neg0 = scored.select(col("id_a").as("anchor_id"),
        col("id_b").as("negative_id"), col("pm"))
      .union(scored.select(col("id_b").as("anchor_id"),
        col("id_a").as("negative_id"), col("pm")))
      .filter(col("pm") >= negFloorPm && col("pm") < thresholdPm)
    val negf = neg0
      .join(comps.select(col("id").as("anchor_id"), col("component").as("__ca")),
        Seq("anchor_id"))
      .join(comps.select(col("id").as("negative_id"), col("component").as("__cb")),
        Seq("negative_id"))
      .filter(col("__ca") =!= col("__cb"))
    val w = Window.partitionBy("anchor_id")
      .orderBy(col("pm").desc, col("negative_id"))
    val best = negf.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("anchor_id"), col("negative_id"), col("pm").as("neg_pm"))
    pos.join(best, Seq("anchor_id"))
      .select(col("anchor_id"), col("positive_id"), col("negative_id"),
        col("pos_pm"), col("neg_pm"))
  }

  /** Exact-substring duplicate-span REMOVAL — the cleanup stage the
    * span statistics ([[dupSpans]]) and the novelty audit
    * ([[noveltyScores]]) feed: excise every RECYCLED k-token window
    * from each document's text, keep-first semantics (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better",
    * adapted from byte-suffix-arrays to the engine's token-window
    * digest machinery). A window is recycled in document D when the
    * same k tokens appear in ANY lower-id document (id order = arrival
    * order, as in [[noveltyScores]]); every token position covered by
    * at least one recycled window is removed, and the surviving tokens
    * re-join in order. The first appearance always keeps its text —
    * boilerplate is cut from every COPY, never from the original — and
    * a within-document repeat of a window the document itself owns is
    * kept (directional semantics, same as the novelty audit).
    *
    * Returns `(id, n_tokens, n_removed, removed_pm, cleaned_fp)` for
    * EVERY document — `cleaned_fp` is md5 of the space-joined kept
    * tokens (md5("") when everything was cut), so an oracle certifies
    * the exact reconstructed text without shipping it.
    *
    * Scale shape: the [[dupSpans]] digest discipline — window text
    * reduces map-side to a 16-byte md5, one groupBy(digest) computes
    * the min owner, and only RECYCLED (digest, position) rows join
    * back. Each document's covered-start list is then a row-local
    * array (bounded by the document's own window count), and the
    * excision is pure higher-order column arithmetic over the
    * materialized token array — no second corpus explode, nothing
    * collects to the driver.
    */
  def removeDupSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k > 0, "window size must be positive")
    val base = df.select(col(idCol).as("__id"),
      TextAnalysis.tokens(col(textCol)).as("__tk"))
    val w = base.filter(size(col("__tk")) >= k)
      .select(col("__id"), col("__tk"),
        explode(sequence(lit(1), size(col("__tk")) - k + 1)).as("__i"))
      .select(col("__id"), col("__i"),
        unhex(md5(concat_ws(" ", slice(col("__tk"), col("__i"), lit(k))))).as("__wh"))
    val owners = w.groupBy("__wh").agg(min(col("__id")).as("__owner"))
    val recycled = w.join(owners, Seq("__wh"))
      .filter(col("__id") > col("__owner"))
      .select(col("__id").as(idCol), col("__i").as("start"))
    removeSpansByStarts(df, idCol, textCol, k, recycled)
  }

  /** The excision half of [[removeDupSpans]], factored out so a
    * streaming verdict source ([[graft.streaming.Streams]]'s
    * keep-first span stream) can feed the same arithmetic: `recycled`
    * is `(idCol, start)` rows naming the covered window starts; output
    * schema and semantics are exactly [[removeDupSpans]]'s.
    */
  def removeSpansByStarts(df: DataFrame, idCol: String, textCol: String,
      k: Int, recycled: DataFrame): DataFrame = {
    require(k > 0, "window size must be positive")
    val base = df.select(col(idCol).as("__id"),
      TextAnalysis.tokens(col(textCol)).as("__tk"))
    val starts = recycled
      .select(col(idCol).as("__id"), col("start").cast("int").as("__i"))
      .groupBy("__id").agg(sort_array(collect_set(col("__i"))).as("__starts"))
    base.join(starts, Seq("__id"), "left")
      .withColumn("__starts",
        coalesce(col("__starts"), array().cast("array<int>")))
      // kept positions: 1..n minus every [s, s+k-1] covered range.
      // sequence(1, 0) would generate DESCENDING [1, 0] — guard the
      // empty-document case explicitly
      .withColumn("__kept",
        when(size(col("__tk")) === 0, array().cast("array<int>"))
          .otherwise(filter(
            sequence(lit(1), size(col("__tk"))),
            j => !exists(col("__starts"),
              s => j >= s && j <= s + lit(k - 1)))))
      .select(col("__id").as(idCol),
        size(col("__tk")).cast("long").as("n_tokens"),
        (size(col("__tk")) - size(col("__kept"))).cast("long").as("n_removed"),
        expr(s"CAST((size(__tk) - size(__kept)) * 10000 " +
          "div greatest(size(__tk), 1) AS BIGINT)").as("removed_pm"),
        md5(concat_ws(" ",
          transform(col("__kept"), j => element_at(col("__tk"), j)))
          .cast("binary")).as("cleaned_fp"))
  }

  /** Winnowing document fingerprints (the MOSS scheme, Schleimer et
    * al. 2003): hash every char `k`-gram, slide a window of `w`
    * consecutive hashes, select each window's minimum (rightmost on
    * ties), and keep the DISTINCT selected (position, hash) pairs.
    * Winnowing guarantees any shared substring of length ≥ `w + k − 1`
    * contributes at least one common fingerprint, while storing only
    * ~2/(w+1) of the hashes — the position-robust dedup sketch that
    * char-offset-shifted copies (which defeat fixed-stride sampling)
    * cannot evade.
    *
    * Returns `(id, n_fp, fp_md5)` — fingerprint count and an md5 over
    * the canonical "pos:hash,…" serialization (sorted by position), so
    * an oracle can certify the exact fingerprint SET without shipping
    * it. The k-gram hash is the first 8 md5 hex digits as an integer —
    * portable arithmetic any engine reproduces bit-for-bit.
    *
    * Scale shape: everything is per-document array math inside one
    * projection — no explode, no shuffle, nothing leaves the map side;
    * documents are the parallel unit. (The cross-document join on
    * shared fingerprints — the MOSS match step — is then a plain
    * equi-join on the hash, the same blocking discipline as
    * [[minhashNearDups]].)
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): DataFrame =
    winnowArray(df, idCol, textCol, k, w)
      .select(col(idCol), size(col("__fps")).cast("long").as("n_fp"),
        md5(array_join(transform(array_sort(col("__fps")),
            f => concat_ws(":", f.getField("pos").cast("string"),
              f.getField("hv").cast("string"))), ",")
          .cast("binary")).as("fp_md5"))

  /** The selected winnowing fingerprints as rows — `(id, pos, hv)` —
    * the join surface of the MOSS match step: near-copies are pairs of
    * docs sharing fingerprint HASHES (positions differ under offset
    * shifts), found with a plain equi-join on `hv`.
    */
  def winnowFingerprintFrame(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): DataFrame =
    winnowArray(df, idCol, textCol, k, w)
      .select(col(idCol), explode(col("__fps")).as("__f"))
      .select(col(idCol), col("__f.pos").as("pos"), col("__f.hv").as("hv"))

  /** The MOSS match step over [[winnowFingerprintFrame]]: candidate
    * pairs are documents sharing a RARE fingerprint hash (document
    * frequency ≤ `maxDf` — the q149 trigram-blocking discipline:
    * candidate volume is bounded by rows·maxDf/2, LINEAR in the corpus
    * at fixed maxDf, where an unfiltered hash join grows with the
    * square of boilerplate popularity), scored by how many rare
    * fingerprints they share, kept at ≥ `minShared` (one shared
    * 8-gram is noise; two independent winnow survivors are not).
    * Returns (id_a, id_b, n_shared) with id_a < id_b.
    */
  def winnowMatchPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4, maxDf: Int = 4, minShared: Int = 2): DataFrame = {
    require(maxDf >= 2 && minShared >= 1, "need maxDf >= 2, minShared >= 1")
    val fp = winnowFingerprintFrame(df, idCol, textCol, k, w)
      .select(col(idCol).as("__id"), col("hv")).distinct()
    val rare = fp.groupBy("hv").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf).select("hv")
    val fpr = fp.join(rare, Seq("hv"))
    fpr.select(col("hv"), col("__id").as("id_a"))
      .join(fpr.select(col("hv"), col("__id").as("id_b")), Seq("hv"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  private def winnowArray(df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    require(k > 0 && w > 0, "k-gram size and window must be positive")
    // r16: hashing + window selection run as ONE native per-row
    // expression (graft.functions.WinnowExpression — bit-identical by
    // construction, see its scaladoc). The r15 column form evaluated an
    // interpreted md5→hex→conv tree per CHARACTER and a per-window
    // slice + fold per start — 110 s cold for q156 at sf0.1; the
    // native rolling scan reads ~1 s. No checkpoint needed: it is one
    // compiled pass.
    df.select(col(idCol),
      graft.functions.WinnowExpression.winnow_fps(col(textCol), k, w)
        .as("__fps"))
  }

  /** Asymmetric shingle CONTAINMENT for an explicit candidate-pair
    * frame: |A ∩ B| / |A| per-myriad over distinct word-`k`-shingle
    * sets — near 10⁴ when doc `a` is (mostly) contained in doc `b`,
    * even when symmetric Jaccard is low because `b` is much larger.
    * The subset-duplicate detector Jaccard-thresholded dedup misses:
    * a paragraph quoted inside a long page scores ~10⁴ here and ~0
    * there. Same two-hash-join shape as [[jaccardForPairs]] — linear
    * in |pairs|, candidates from LSH buckets, blocking keys, or id
    * windows.
    */
  def containmentForPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int, pairs: DataFrame): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      array_distinct(shingles(col(textCol), k)).as("sh"))
    pairs
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        size(col("sh_a")).cast("long").as("n_a"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("n_common"))
      .withColumn("containment_pm",
        expr("n_common * 10000 div greatest(n_a, 1)"))
  }
}
