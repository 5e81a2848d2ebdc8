package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale corpus processing: token
  * counting, quality scoring, language-ID heuristics, fingerprinting.
  *
  * All are pure column expressions (`org.apache.spark.sql.functions`),
  * so they stay inside whole-stage codegen — no UDFs in the hot path,
  * which matters when scoring billions of documents.
  */
object TextAnalysis {

  /** Whitespace tokenization; empty string => empty array. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-style pre-tokenization (the GPT-2 pattern family, simplified
    * to lookahead-free so it runs identically under Java regex and
    * RE2-based engines): runs of letters / digits / other-symbols, each
    * optionally taking one preceding space, plus whitespace runs.
    * This is the unit a byte-pair tokenizer would merge within — the
    * right token count proxy for LLM-corpus budgeting, where
    * whitespace-split counts undercount punctuation-heavy text.
    */
  val bpeIshPattern = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+|\\s+"

  def bpeIshTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpeIshPattern), lit(0))

  /** Token count excluding pure-whitespace matches (those only glue). */
  def bpeIshTokenCount(text: Column): Column =
    size(filter(bpeIshTokens(text), t => !t.rlike("^\\s+$")))

  /** Composite document quality gate — the C4/Gopher-style filter
    * chain a corpus pipeline applies before training, with a REASONS
    * BITMASK instead of a silent drop (auditable filtering: every
    * removed doc says why). Rules are integer comparisons only, so the
    * verdict is bit-exact on any engine:
    *   bit 1 — too few tokens (< minTokens)
    *   bit 2 — mean token length outside [minMeanLen, maxMeanLen]
    *            (cross-multiplied: sumLen < min·n or sumLen > max·n)
    *   bit 4 — punctuation-heavy (nPunct · 10 > nChars, i.e. > 10%)
    *   bit 8 — too few stopwords (< minStopwords)
    * `keep` = reasons == 0. Pure per-row columns — narrow, codegen.
    */
  def filterGate(df: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 10, minMeanLen: Int = 3, maxMeanLen: Int = 10,
      minStopwords: Int = 2): DataFrame = {
    // r16: all five signals come from ONE native per-row expression
    // (GateStatsExpression — bit-identical to the old column chain,
    // which ran two interpreted HOFs and a regexp_replace per row);
    // codegen subexpression elimination collapses the field reads to a
    // single evaluation
    val g = graft.functions.GateStatsExpression.gate_stats(col(textCol),
      minTokens, minMeanLen, maxMeanLen, minStopwords)
    df.select(col(idCol), g.getField("n_tokens").as("n_tokens"),
      g.getField("sum_token_len").as("sum_token_len"),
      g.getField("n_punct").as("n_punct"), g.getField("n_stop").as("n_stop"),
      g.getField("reasons").as("reasons"),
      (g.getField("reasons") === 0).as("keep"))
  }

  /** The [[filterGate]] reasons bitmask as a ROW-LOCAL column over the
    * text — the same native expression filterGate selects from, exposed
    * so callers that only FILTER on the verdict evaluate it inline at
    * the scan. The r15 chains derived gate-clean ids via
    * `filterGate(docs).filter(keep).select(id).join(docs)` — a shuffle
    * join of the corpus with ITSELF to re-attach the text the gate
    * dropped, twice per Curate chain (guide §2.4: remove shuffles
    * outright). A per-row predicate needs no ids and no join.
    */
  def gateReasons(text: Column, minTokens: Int = 10, minMeanLen: Int = 3,
      maxMeanLen: Int = 10, minStopwords: Int = 2): Column =
    graft.functions.GateStatsExpression.gate_stats(text,
      minTokens, minMeanLen, maxMeanLen, minStopwords).getField("reasons")

  /** `keep` verdict of the default gate as a row-local predicate.
    *
    * NULL-text semantics (pinned r17, ADVICE): `gate_stats` null-
    * propagates (UnaryExpression), so a NULL text yields keep = NULL
    * and every gate-filtering chain DROPS the row. This is the
    * intended contract — a null document is not trainable text and
    * must not pass a quality gate — and it is a deliberate change from
    * the r15 column chain, whose when/otherwise collapsed null signals
    * to reasons = 0 (null rows silently PASSED). Pinned by a
    * CorpusOpsSpec case; callers that want the legacy behavior
    * coalesce(text, '') explicitly (an empty doc fails the gate with
    * reasons set, rather than passing).
    */
  def gateKeep(text: Column, minTokens: Int = 10, minMeanLen: Int = 3,
      maxMeanLen: Int = 10, minStopwords: Int = 2): Column =
    gateReasons(text, minTokens, minMeanLen, maxMeanLen, minStopwords) === 0

  /** Corpus vocabulary induction — the tokenizer-training primitive:
    * the `topK` most frequent tokens with occurrence and document
    * frequencies and a rank (the vocab id). Ties break on the token
    * string, so the mapping is deterministic across engines and
    * partitionings. The wordcount shape with a distinct-doc count:
    * partial aggregate on (token, doc) then on token (two exchanges —
    * the price of exact doc frequencies) → TakeOrdered top-k; the rank
    * window runs over only the `topK` surviving rows, never the corpus.
    */
  def vocab(df: DataFrame, idCol: String, textCol: String,
      topK: Int): DataFrame = {
    require(topK > 0, "topK must be positive")
    import org.apache.spark.sql.expressions.Window
    df.select(col(idCol).as("__vid"), explode(tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("__vid")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_occurrences").desc, col("token"))).cast("long"))
  }

  /** Per-source vocabulary coverage under a global top-K vocabulary —
    * the tokenizer-evaluation stage of a training-data pipeline: a
    * tokenizer (or vocab) trained on the whole mix covers its head
    * sources well and fragments the tail ones; this audit quantifies
    * that per source BEFORE training burns compute on it. Two rates
    * per source, both exact integer ppm: occurrence coverage (what
    * fraction of token OCCURRENCES are in-vocabulary — the fertility
    * proxy) and type coverage (what fraction of DISTINCT tokens are —
    * the OOV-breadth proxy).
    *
    * Scale shape: the vocabulary is [[vocab]]'s top-K rows (bounded,
    * broadcast); the corpus is exploded ONCE and aggregated at source
    * grain with map-side combine; the distinct-type counts ride the
    * same aggregation. Nothing corpus-sized shuffles beyond the one
    * (source, token)-keyed partial aggregate.
    */
  def vocabCoverage(df: DataFrame, idCol: String, textCol: String,
      srcCol: String, topK: Int): DataFrame = {
    val v = vocab(df, idCol, textCol, topK).select(col("token"))
      .withColumn("__in_vocab", lit(1L))
    df.select(col(srcCol).cast("string").as("source"),
        explode(tokens(col(textCol))).as("token"))
      .join(broadcast(v), Seq("token"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_occurrences"),
        sum(coalesce(col("__in_vocab"), lit(0L))).as("n_covered"),
        countDistinct(col("token")).as("n_types"),
        countDistinct(when(col("__in_vocab") === 1L, col("token")))
          .as("n_types_covered"))
      .withColumn("coverage_ppm",
        expr("(n_covered * 1000000) div greatest(n_occurrences, 1)"))
      .withColumn("type_coverage_ppm",
        expr("(n_types_covered * 1000000) div greatest(n_types, 1)"))
  }

  /** One BPE-training merge statistic: adjacent character-pair counts
    * over the corpus, weighted by word frequency — the quantity a
    * byte-pair-encoding trainer maximizes each merge round. Computed
    * over the DISTINCT-word table (explode chars of each unique word ×
    * its corpus frequency), so the expensive explode touches vocabulary
    * size, not corpus size. Deterministic top-k (count desc, pair asc)
    * with a rank; the rank window runs over only the k survivors.
    */
  def bpePairCounts(df: DataFrame, textCol: String, topK: Int): DataFrame = {
    require(topK > 0, "topK must be positive")
    import org.apache.spark.sql.expressions.Window
    df.select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .filter(length(col("word")) >= 2)
      .select(col("word"), col("freq"),
        explode(sequence(lit(1), length(col("word")) - 1)).as("i"))
      .select(col("word").substr(col("i"), lit(2)).as("pair"), col("freq"))
      .groupBy("pair").agg(sum(col("freq")).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("pair"))
      .limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_occurrences").desc, col("pair"))).cast("long"))
  }

  /** Distributed BPE merge TRAINING — the iterative loop [[bpePairCounts]]
    * is one statistic of: `rounds` times, count adjacent symbol pairs
    * across the corpus, pick the most frequent (count desc, pair asc —
    * a total order, so training is deterministic), and merge it into a
    * single symbol everywhere. The canonical "train a tokenizer on the
    * corpus" job.
    *
    * Scale design: ONE corpus-sized aggregation builds the word
    * frequency table (the classic BPE training input); every merge
    * round after that runs over the VOCABULARY-sized table — pair
    * counting is an explode+sum over distinct words weighted by
    * frequency (map-side partials), and applying a merge is one
    * narrow, codegen'd `replace` over the symbol strings (symbols ride
    * a space-separated string with sentinel padding, so a merge is
    * plain left-to-right non-overlapping string replacement —
    * identical semantics in Spark and the SQL oracle, no UDF). Only
    * the winning (pair, count) row reaches the driver per round — the
    * ivfTrain codebook discipline.
    *
    * Variant notes (documented deviations from reference BPE
    * implementations): symbols are the [a-z] characters of lowercased
    * alphabetic words (no end-of-word marker), and a merge applies
    * left-to-right non-overlapping within each word — "aaa" under
    * merge "a a" becomes ("aa", "a"), the greedy scan order.
    *
    * Returns the merge table (step, pair, summed count) — fewer than
    * `rounds` rows when the corpus runs out of pairs — and the final
    * per-word symbol strings (sym, n) for vocabulary inspection.
    */
  def bpeMerges(df: DataFrame, textCol: String,
      rounds: Int): (Seq[(Int, String, Long)], DataFrame) = {
    require(rounds >= 1, "need at least one merge round")
    var words = df
      .select(explode(split(lower(col(textCol)), "[^a-z]+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      // " h e l l o " — leading/trailing sentinels make every pair
      // occurrence the exact string ' a b ', boundary-safe to replace
      .select(concat(lit(" "),
        regexp_replace(col("w"), "(.)", "$1 ")).as("sym"), col("n"))
      .cache()
    val merges = Seq.newBuilder[(Int, String, Long)]
    var exhausted = false
    for (step <- 1 to rounds if !exhausted) {
      val top = words
        .select(col("n"), split(trim(col("sym")), " ").as("a"))
        .filter(size(col("a")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(0, size(a)-2), i -> concat(a[i], ' ', a[i+1]))")).as("p"))
        .groupBy("p").agg(sum("n").as("cnt"))
        .orderBy(col("cnt").desc, col("p").asc)
        .limit(1).collect().headOption
      top match {
        case Some(r) =>
          val pair = r.getString(0)
          merges += ((step, pair, r.getLong(1)))
          words = words.withColumn("sym",
            regexp_replace(col("sym"),
              // literal (quoted) pattern: symbols are [a-z]+ but \Q\E
              // keeps the contract honest if that ever widens
              lit(java.util.regex.Pattern.quote(s" $pair ")),
              lit(" " + pair.replace(" ", "") + " ")))
        case None => exhausted = true // no pairs left anywhere
      }
    }
    (merges.result(), words)
  }

  /** Sliding-window document chunking — the retrieval-indexing
    * primitive (a RAG/embedding pipeline chunks every document into
    * overlapping token windows before embedding): windows of
    * `chunkSize` tokens starting every `stride` tokens (overlap =
    * chunkSize - stride), the final window truncated at the document
    * end. Windows stop as soon as one reaches the document end: a
    * start whose tokens are fully contained in the previous window is
    * never emitted (no duplicate embedding work or retrieval
    * candidates downstream). Empty documents produce no chunks.
    * Deterministic and purely per-row (explode of a computed start
    * sequence — narrow, no shuffle); output rows carry (id, chunk_id,
    * tok_start, chunk_text, chunk_tokens), ready for [[Similarity]]
    * embedding or [[Search.bm25TopK]] indexing at chunk grain.
    */
  def chunkOverlap(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    require(stride <= chunkSize, "stride > chunkSize would skip tokens")
    val tk = Sampling.freshName(df, "toks")
    // last start = the single stride multiple in
    // [n - chunkSize, n - chunkSize + stride - 1] (0 when n <= chunkSize)
    val lastStart = greatest(size(col(tk)) - chunkSize + stride - 1, lit(0))
    df.withColumn(tk, tokens(col(textCol)))
      .filter(size(col(tk)) > 0)
      .select(col(idCol), col(tk),
        explode(sequence(lit(0), lastStart, lit(stride))).as("tok_start"))
      .select(col(idCol),
        (col("tok_start") / stride).cast("long").as("chunk_id"),
        col("tok_start").cast("long").as("tok_start"),
        concat_ws(" ", slice(col(tk), col("tok_start") + 1, lit(chunkSize))).as("chunk_text"),
        least(lit(chunkSize), size(col(tk)) - col("tok_start")).cast("long").as("chunk_tokens"))
  }

  /** Ratio of punctuation characters to total characters (0 for empty). */
  def punctRatio(text: Column): Column = {
    val len = length(text)
    // stripping alnum+whitespace leaves exactly the punctuation chars;
    // ASCII-explicit class (not \p{Alnum}) so external RE2-based
    // oracles agree with Java regex semantics
    when(len === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "[a-zA-Z0-9\\s]", "")).cast("double") / len)
  }

  // deliberately small + stable: these sets are part of the operator's
  // contract (the DuckDB oracle re-states them verbatim)
  val englishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Fraction of tokens that are stopwords (language-quality signal). */
  def stopwordRatio(text: Column, stopwords: Seq[String] = englishStopwords): Column = {
    val toks = tokens(text)
    val n = size(toks)
    val hits = size(filter(toks, t => t.isInCollection(stopwords)))
    when(n === 0, lit(0.0)).otherwise(hits.cast("double") / n)
  }

  /** Composite heuristic quality score in [0,1]: favors medium-length
    * documents with some stopword mass and little punctuation noise.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / lit(50.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    val punctPenalty = greatest(lit(1.0) - punctRatio(text) * 10.0, lit(0.0))
    round((lenScore * 0.4 + stopScore * 0.4 + punctPenalty * 0.2), 4)
  }

  /** Per-language marker sets for the n-gram/stopword language-ID
    * heuristic. Tiny by design (contract shared with the oracle).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "und", "das", "ist"),
    "es" -> Seq("el", "la", "que", "es"))

  /** Majority-marker language ID; 'und' (undetermined) when no marker
    * hits at all. Ties break by the order of [[langMarkers]].
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val counts = langMarkers.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isInCollection(words)))
    }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    val chain = langMarkers.reverse.foldLeft(lit("und")) { case (acc, (lang, _)) =>
      val cnt = counts.find(_._1 == lang).get._2
      when(cnt === best && best > 0, lit(lang)).otherwise(acc)
    }
    chain
  }

  /** Content fingerprint over normalized text (case-folded,
    * non-alphanumerics stripped) — stable under formatting noise.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9 ]", ""))

  /** Gopher-style repetition metrics per document — the
    * repetitious-text filters of the Gopher/MassiveText quality rules
    * (Rae et al. 2021 §A1.1), at token granularity: duplicate-token
    * fraction, top-token fraction, duplicate-bigram fraction. Emitted
    * as exact per-myriad integers (`x * 10000 div total`, integer
    * division) — no floating point anywhere, so verdicts are bit-exact
    * across engines and re-runs.
    *
    * Shape at scale: explode → two-level aggregation (partial map-side
    * combine on (doc, token) then (doc)) — one shuffle keyed by doc
    * id, no driver involvement, no UDFs.
    */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String,
      dupTokenFlagPm: Int = 3000, dupBigramFlagPm: Int = 1000): DataFrame = {
    // tokenize once per doc: the bigram lambda re-evaluates its operand
    // per element (HOF semantics), so the split must be materialized
    val toks = df.select(col(idCol).as("__id"),
        tokens(lower(col(textCol))).as("__toks"))
      .localCheckpoint(eager = true)
    val uni = toks.select(col("__id"), explode(col("__toks")).as("t"))
      .groupBy("__id", "t").agg(count(lit(1)).as("c"))
      .groupBy("__id").agg(sum("c").as("n_tokens"),
        count(lit(1)).as("n_distinct"), max("c").as("top_c"))
    val bi = toks.select(col("__id"),
        explode(Dedup.shinglesOfTokens(col("__toks"), 2)).as("g"))
      .groupBy("__id", "g").agg(count(lit(1)).as("c"))
      .groupBy("__id").agg(sum("c").as("n_bigrams"),
        count(lit(1)).as("n_distinct_bi"))
    // left join from the full doc set: an empty document must still
    // appear in the report (n_tokens = 0, nothing flagged) — explode
    // yields no unigram rows for it, so an inner join would drop it.
    // (shinglesOfTokens gives every doc ≥ 1 "bigram" — its whole run —
    // so only the unigram side can miss.)
    toks.select(col("__id")).join(uni, Seq("__id"), "left").join(bi, Seq("__id"))
      .select(col("__id").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        when(col("n_tokens").isNull, lit(0L))
          .otherwise(expr("(n_tokens - n_distinct) * 10000 div n_tokens")).as("dup_token_pm"),
        when(col("n_tokens").isNull, lit(0L))
          .otherwise(expr("top_c * 10000 div n_tokens")).as("top_token_pm"),
        expr("(n_bigrams - n_distinct_bi) * 10000 div n_bigrams").as("dup_bigram_pm"))
      .withColumn("flagged",
        col("dup_token_pm") > dupTokenFlagPm || col("dup_bigram_pm") > dupBigramFlagPm)
  }

  /** Count-based bigram language-model scoring — the perplexity-filter
    * shape (CCNet-style: train a cheap LM on a trusted slice, score
    * candidate docs by how "fluent" the model finds them, keep/bucket
    * by score). Add-one smoothed bigram probability in integer
    * parts-per-million, so the contract is bit-exact on any engine (a
    * float log-prob would drift by libm ulp and summation order):
    *
    *   p_ppm(w2|w1)  = ((c2(w1,w2) + 1) * 1000000) div (c1(w1) + V)
    *   score_ppm(d)  = Σ p_ppm over d's bigrams  div  n_bigrams(d)
    *
    * where c2/c1 are train-slice bigram/unigram occurrence counts and
    * V the train vocabulary size. Docs with < 2 tokens have no bigrams
    * and are not scored.
    *
    * Scale shape: the model is two count tables keyed by token — they
    * shuffle-join against the candidate bigrams (vocabulary-sized, NOT
    * broadcast); V rides along as a broadcast 1-row frame; the per-doc
    * rollup is one doc-keyed aggregation. Nothing is collected.
    */
  def bigramLmScore(train: DataFrame, test: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def toks(df: DataFrame) = df.select(col(idCol).as("__id"),
      tokens(lower(col(textCol))).as("__toks"))
    // r17: pairs come from ONE native expression (word_kgrams — strict
    // k=2: empty under 2 tokens, so explode drops short docs and the
    // size filter is gone). The r16 shape exploded position indices
    // with the WHOLE token array carried per output row — O(n²) bytes
    // per document through the Generate's unsafe-row writer; here the
    // Generate emits only the "w1 w2" pair strings, O(n) per doc, and
    // substring_index recovers the words exactly (tokens are
    // whitespace-split, so the single space is a reliable separator).
    def bigrams(df: DataFrame) = df
      .select(col(idCol).as("__id"),
        explode(graft.functions.WordShinglesExpression
          .word_kgrams(lower(col(textCol)), 2)).as("__g"))
      .select(col("__id"), substring_index(col("__g"), " ", 1).as("w1"),
        substring_index(col("__g"), " ", -1).as("w2"))
    // r16 (guide §2.3/§2.4): the bigram table is built ONCE and
    // checkpointed — it feeds both the scoring join and the derived
    // unigram counts, and without the checkpoint each reference
    // re-ran the full train-side tokenize+explode+aggregate (the old
    // shape executed the c1 corpus pass twice: once under the V
    // scalar, once under the scoring join). The unigram counts now
    // DERIVE from the bigram table instead of a second corpus explode:
    // every token instance is either the w1 of its bigram or its
    // document's LAST token, so c1(w) = Σ_w2 c2(w, w2) + #(last = w)
    // — one corpus-grain scan for the last tokens replaces the full
    // unigram explode+shuffle. Both count tables are vocabulary-grain,
    // so the checkpoints are model-sized, never corpus-sized.
    val c2 = bigrams(train).groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .localCheckpoint(eager = false)
    val lastTok = toks(train).filter(size(col("__toks")) >= 1)
      .select(element_at(col("__toks"), -1).as("w"))
      .groupBy("w").agg(count(lit(1)).as("__cl"))
    val c1 = c2.groupBy(col("w1").as("w")).agg(sum("c2").as("__cb"))
      .join(lastTok, Seq("w"), "full")
      .select(col("w"),
        (coalesce(col("__cb"), lit(0L)) + coalesce(col("__cl"), lit(0L))).as("c1"))
      .localCheckpoint(eager = false)
    val v = c1.agg(count(lit(1)).as("v"))
    bigrams(test)
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1.withColumnRenamed("w", "w1"), Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .withColumn("p_ppm",
        // greatest(..., 1): an EMPTY train slice gives v = 0, and under
        // ANSI mode the integral div would throw per scored row instead
        // of degrading to the (meaningless but defined) uniform score
        expr("((coalesce(c2, 0) + 1) * 1000000) div greatest(coalesce(c1, 0) + v, 1)"))
      .groupBy("__id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(p_ppm) div count(1)").as("score_ppm"))
      .select(col("__id").as(idCol), col("n_bigrams"), col("score_ppm"))
  }

  /** CCNet-style per-language LM tiering (Wenzek et al. 2020): rank
    * every scoreable document within its language by the
    * [[bigramLmScore]] fluency score and cut the ranking into `tiers`
    * equal-depth buckets — head / middle / tail for the classic
    * tiers = 3, the split CCNet uses to keep head+middle and drop the
    * tail per language. Tiering is RELATIVE per language (an absolute
    * fluency gate — [[graft.operators.Curate]]'s lm stage — would
    * judge low-resource languages against high-resource fluency),
    * which is exactly why CCNet buckets per language instead of
    * thresholding globally.
    *
    * Ranking is fully deterministic: integer `score_ppm` descending,
    * id ascending, `ntile` over that total order — any engine assigns
    * identical buckets. Only documents with ≥ 1 bigram appear (the
    * score is undefined on shorter docs; gate those with
    * [[filterGate]] upstream). `bucket` is 1-based; `tier` labels
    * bucket 1 "head", bucket `tiers` "tail", everything between
    * "middle".
    *
    * Scale shape: the LM cost is [[bigramLmScore]]'s (vocabulary-grain
    * count tables, one scoring pass); the tiering is one window sort
    * PER LANGUAGE — acceptable when language cardinality spreads the
    * corpus, and the documented 100 TB escape hatch is the sampled
    * variant (estimate per-language cutoff scores on a hash-sample,
    * broadcast the |langs| × (tiers−1) cutoff frame, assign by
    * comparison — no global sort; the exact ntile here doubles as its
    * correctness oracle at test scale).
    */
  def lmTiers(train: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, langCol: String, tiers: Int = 3): DataFrame = {
    require(tiers >= 2, "tiers must be >= 2")
    import org.apache.spark.sql.expressions.Window
    val scored = bigramLmScore(train, docs, idCol, textCol)
    val langs = docs.select(col(idCol), col(langCol).cast("string").as("lang"))
    val w = Window.partitionBy("lang").orderBy(col("score_ppm").desc, col(idCol))
    scored.join(langs, Seq(idCol))
      .withColumn("bucket", ntile(tiers).over(w).cast("long"))
      .withColumn("tier",
        when(col("bucket") === 1, "head")
          .when(col("bucket") === tiers, "tail")
          .otherwise("middle"))
      .select(col(idCol), col("lang"), col("n_bigrams"), col("score_ppm"),
        col("bucket"), col("tier"))
  }

  /** Tokenizer FERTILITY audit per (lang, source) — the
    * tokenizer-evaluation table multilingual-LM work reads before
    * fixing a vocabulary: how many BPE-style pre-tokens does a
    * character of each language cost (`bpe_per_kchar`, tokens per
    * 1000 chars), and how badly does pre-tokenization fragment
    * whitespace words (`bpe_per_ws_ppm` — 10⁶ means one BPE token per
    * word; higher = punctuation/digit splitting). Languages with high
    * fertility burn sequence length and train slower — the classic
    * argument for vocabulary rebalancing, and the denominator side of
    * the [[vocabCoverage]] audit. Exact integer ratios.
    *
    * Scale shape: one per-row codegen projection (both token counts
    * are column expressions) into one (lang, source)-grain hash
    * aggregation with map-side partials; output is |langs × sources|.
    */
  def tokenizerFertility(df: DataFrame, textCol: String, langCol: String,
      srcCol: String): DataFrame =
    df.select(col(langCol).cast("string").as("lang"),
        col(srcCol).cast("string").as("source"),
        tokenCount(col(textCol)).cast("long").as("__ws"),
        bpeIshTokenCount(col(textCol)).cast("long").as("__bpe"),
        length(col(textCol)).cast("long").as("__ch"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum("__ws").as("ws_tokens"),
        sum("__bpe").as("bpe_tokens"), sum("__ch").as("chars"))
      .withColumn("bpe_per_kchar",
        expr("bpe_tokens * 1000 div greatest(chars, 1)"))
      .withColumn("bpe_per_ws_ppm",
        expr("bpe_tokens * 1000000 div greatest(ws_tokens, 1)"))

  /** PMI-ranked collocation mining — the corpus-statistics pass that
    * surfaces multi-word terms ("new york", "machine learning") for
    * tokenizer vocab curation and quality auditing. Association is
    * emitted as LIFT, the exact-rational inside of PMI:
    *
    *   lift(w1,w2) = P(w1,w2) / (P(w1)·P(w2))
    *               = (c2·N·N) / (M·c1(w1)·c1(w2))
    *
    * PMI = ln(lift) is strictly monotone in lift, so ranking by lift IS
    * ranking by PMI — while ln would import cross-libm ulp
    * nondeterminism the repo's bit-exact oracle discipline avoids. The
    * division is one double op over exact integer counts, identical on
    * any engine when evaluated in this parenthesization.
    *
    * Scale shape: two count tables (unigram, bigram) from one pass each
    * — map-side partial aggregation, vocabulary-sized results; the
    * marginals join the bigram table on each word (two hash joins,
    * correctly NOT broadcast — a 100 TB corpus's vocabulary isn't
    * executor-sized); N and M ride along as a broadcast 1-row stats
    * frame; the final top-k is a TakeOrdered, never a global sort.
    * `minCount` is the classic noise floor: a hapax bigram of two hapax
    * words has lift = N²/M — maximal — so unfloored PMI ranks typos
    * first.
    */
  def pmiCollocations(df: DataFrame, textCol: String, minCount: Int = 5,
      topK: Int = 20): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    require(topK >= 1, "topK must be >= 1")
    val toksDf = df.select(tokens(lower(col(textCol))).as("__toks"))
    val c1 = toksDf.select(explode(col("__toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    // pair emission via the strict native k-gram expression — the same
    // O(n²)-bytes-per-doc Generate fix as bigramLmScore (r17)
    val c2 = df
      .select(explode(graft.functions.WordShinglesExpression
        .word_kgrams(lower(col(textCol)), 2)).as("__g"))
      .select(substring_index(col("__g"), " ", 1).as("w1"),
        substring_index(col("__g"), " ", -1).as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val stats = c1.agg(sum(col("c1")).as("n_uni"))
      .crossJoin(c2.agg(sum(col("c2")).as("n_bi")))
    c2.filter(col("c2") >= minCount)
      .join(c1.select(col("w").as("w1"), col("c1").as("ca")), Seq("w1"))
      .join(c1.select(col("w").as("w2"), col("c1").as("cb")), Seq("w2"))
      .crossJoin(broadcast(stats))
      .select(col("w1"), col("w2"), col("c2").as("pair_count"),
        round((col("c2").cast("double") * col("n_uni").cast("double") *
          col("n_uni").cast("double")) /
          (col("n_bi").cast("double") * col("ca").cast("double") *
            col("cb").cast("double")), 6).as("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Document-level term co-occurrence — [[pmiCollocations]]'s
    * whole-document complement (adjacency finds phrases; co-presence
    * finds topical affinity): the top-k token PAIRS by number of
    * documents containing both, with a per-myriad Jaccard affinity
    * `co·10⁴ div (dfA + dfB − co)` — all integers, bit-exact.
    *
    * Scale shape: the corpus reduces to DISTINCT (doc, token) pairs
    * (explode + distinct, corpus-grain but narrow); tokens below
    * `minDf` document frequency are dropped BEFORE the within-doc
    * self-join, which bounds pair fan-out to C(kept-vocab-per-doc, 2)
    * — the knob that keeps a 100 TB corpus's pair space at
    * frequent-vocabulary size, the FP-growth-style frequent-pair
    * discipline. The self-join keys on the doc id (equi-join,
    * hash-partitioned); df and co tables are vocabulary-grain.
    */
  def cooccurrence(df: DataFrame, idCol: String, textCol: String,
      minDf: Int = 5, topK: Int = 20): DataFrame = {
    require(minDf >= 1 && topK >= 1, "minDf and topK must be positive")
    val dt = df.select(col(idCol).as("__id"),
        explode(tokens(lower(col(textCol)))).as("t"))
      .distinct()
    val dfreq = dt.groupBy("t").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val kept = dt.join(dfreq, Seq("t"))
    val pairs = kept.select(col("__id"), col("t").as("t1"), col("df").as("df1"))
      .join(kept.select(col("__id"), col("t").as("t2"), col("df").as("df2")),
        Seq("__id"))
      .filter(col("t1") < col("t2"))
      .groupBy(col("t1"), col("t2"))
      .agg(count(lit(1)).as("co"), first(col("df1")).as("df1"),
        first(col("df2")).as("df2"))
    pairs
      .select(col("t1"), col("t2"), col("co"), col("df1"), col("df2"),
        expr("co * 10000 div (df1 + df2 - co)").as("jaccard_pm"))
      .orderBy(col("co").desc, col("t1"), col("t2"))
      .limit(topK)
  }

  /** Canonical text cleanup — the ingest-side normalization pass that
    * must run BEFORE any hashing/dedup/fingerprint tier, or visually
    * identical documents hash apart: Unicode NFC composition
    * (decomposed `a`+U+0301 == precomposed `á`), zero-width character
    * removal (ZWSP/ZWNJ/ZWJ/BOM — invisible dedup poison pasted in by
    * web sources), whitespace-run collapse (tabs/newlines/doubled
    * spaces → one space), and edge trim.
    *
    * Pure column expression: NFC is the native codegen
    * [[graft.functions.NfcNormalizeExpression]], the rest is
    * `regexp_replace`/`trim` — the whole pass stays inside
    * whole-stage codegen, no UDF.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        graft.functions.NfcNormalizeExpression.nfc_normalize(text),
        "[\\u200B\\u200C\\u200D\\uFEFF]", ""),
      "\\s+", " "))

  /** Distribution drift between two corpus slices (train vs test split
    * health, yesterday-vs-today ingest monitoring): per-token
    * chi-square contribution against the pooled-independence
    * expectation, top-k by contribution. A token whose rate differs
    * most between the slices surfaces first — the standard
    * drift/leakage tripwire for split audits.
    *
    * Both inputs only need `(textCol)`; counts aggregate map-side to
    * vocabulary-sized tables that join on the token (one shuffle at
    * vocabulary grain, never corpus grain), totals broadcast as 1-row
    * frames. The chi-square arithmetic is a fixed-shape formula over
    * integer counts — rounded to 6 decimals as the cross-engine
    * contract. Tokens below `minTotal` pooled occurrences are dropped
    * (chi-square is noise at tiny expected counts).
    */
  def tokenDrift(dfA: DataFrame, dfB: DataFrame, textCol: String,
      minTotal: Int = 2, topK: Int = 20): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    def counts(df: DataFrame, as: String): DataFrame =
      df.select(explode(tokens(lower(col(textCol)))).as("w"))
        .groupBy("w").agg(count(lit(1)).as(as))
    val joined = counts(dfA, "c_a").join(counts(dfB, "c_b"), Seq("w"), "full")
      .select(col("w"), coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
    val tot = joined.agg(sum("c_a").cast("double").as("n_a"),
      sum("c_b").cast("double").as("n_b"))
    val rowTot = col("c_a") + col("c_b")
    val eA = rowTot * col("n_a") / (col("n_a") + col("n_b"))
    val eB = rowTot * col("n_b") / (col("n_a") + col("n_b"))
    // (d·d)/e, never pow(d, 2): an exp/ln-based pow would drift by ulp
    // across libm implementations, a product cannot
    val dA = col("c_a") - eA
    val dB = col("c_b") - eB
    joined.filter(rowTot >= minTotal)
      .crossJoin(broadcast(tot))
      .select(col("w"), col("c_a"), col("c_b"),
        round(dA * dA / eA + dB * dB / eB, 6).as("chi2"))
      .orderBy(col("chi2").desc, col("w"))
      .limit(topK)
  }

  /** Flesch-style readability scoring in all-integer per-myriad
    * arithmetic — the classic curation signal between raw length
    * ([[tokenCount]]) and the rule bitmask ([[filterGate]]): flag text
    * that is fluent but too dense (or too degenerate) for a target
    * training mix.
    *
    * Counting contract (cross-engine exact, mirrors Flesch's units):
    *   - words      = whitespace tokens ([[tokens]])
    *   - sentences  = runs of sentence-final punctuation `[.!?]+`,
    *                  floored at 1 (unpunctuated text is one sentence)
    *   - syllables  = vowel-group runs `[aeiouy]+` over the lowercased
    *                  text, plus 1 for each vowel-less word (Flesch
    *                  counts every word as at least one syllable; the
    *                  group count over the whole text equals the
    *                  per-word sum because whitespace breaks runs)
    * Score (Flesch reading ease ×10⁴, integer division):
    *   flesch_pm = 2_068_350 − (10_150·words) div sentences
    *                         − (846_000·syllables) div words
    * Empty documents (words = 0) score the 2_068_350 constant — no
    * penalty terms, the documented degenerate case.
    *
    * Pure per-row column expressions (regexp_count + array ops), fully
    * inside whole-stage codegen — scoring is a narrow map at any
    * corpus size. Returns (id, words, sentences, syllables, flesch_pm).
    */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val low = lower(col(textCol))
    val toks = tokens(low)
    val words = size(toks).cast("long")
    val sentences = greatest(regexp_count(col(textCol), lit("[.!?]+")), lit(1)).cast("long")
    val vowelGroups = regexp_count(low, lit("[aeiouy]+")).cast("long")
    val voweless = size(filter(toks, t => !t.rlike("[aeiouy]"))).cast("long")
    val syllables = vowelGroups + voweless
    df.select(col(idCol), words.as("words"), sentences.as("sentences"),
        syllables.as("syllables"))
      .withColumn("flesch_pm", lit(2068350L) - when(col("words") > 0,
        expr("(10150 * words) div sentences + (846000 * syllables) div words"))
        .otherwise(lit(0L)))
  }

  /** Per-source corpus governance scorecard — the one-page audit a
    * data owner reads before admitting a source into the training mix:
    * volume, token mass, mean document length, exact-duplicate
    * exposure (share of docs whose text hash repeats ANYWHERE in the
    * corpus — cross-source copies count on both sides), a minimum-
    * length gate pass rate, and the language profile. All rates are
    * per-myriad integers; the majority language ties to the smallest
    * code.
    *
    * Scale shape: one per-doc narrow map (token count, md5), one
    * hash-grain aggregation for global dup classes joined back ids-only
    * (the q54 exact-dedup shuffle), then source-grain aggregations —
    * the scorecard never materializes anything bigger than
    * |sources| × |langs|.
    */
  def sourceScorecard(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, langCol: String, minTokens: Long): DataFrame = {
    require(minTokens >= 0, "minTokens must be >= 0")
    val perDoc = df.select(col(idCol), col(sourceCol).as("source"),
      col(langCol).as("lang"),
      tokenCount(col(textCol)).cast("long").as("__tok"),
      md5(col(textCol)).as("__h"))
    val dupClasses = perDoc.groupBy("__h").agg(count(lit(1)).as("__hc"))
    val flagged = perDoc.join(dupClasses, Seq("__h"))
      .withColumn("__dup", (col("__hc") > 1).cast("long"))
      .withColumn("__pass", (col("__tok") >= minTokens).cast("long"))
    val base = flagged.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("__tok").as("total_tokens"),
      sum("__dup").as("__ndup"),
      sum("__pass").as("__npass"),
      countDistinct("lang").as("n_langs"))
    val langCounts = flagged.groupBy("source", "lang").agg(count(lit(1)).as("__n"))
    val topLang = langCounts.groupBy("source").agg(max("__n").as("__mx"))
      .join(langCounts, Seq("source"))
      .filter(col("__n") === col("__mx"))
      .groupBy("source").agg(min("lang").as("top_lang"))
    base.join(topLang, Seq("source"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        expr("total_tokens * 10000 div n_docs").as("mean_tokens_pm"),
        expr("__ndup * 10000 div n_docs").as("dup_pm"),
        expr("__npass * 10000 div n_docs").as("gate_pm"),
        col("n_langs"), col("top_lang"))
  }

  /** Vocabulary growth curve (the Heaps'-law probe): distinct-token
    * count as a function of corpus position, sampled at `buckets`
    * checkpoints over the id-ordered document sequence. A curve that
    * keeps climbing says more data still buys new vocabulary; a flat
    * tail says the corpus has saturated — the collect-more-or-stop
    * signal sitting beside [[sourceScorecard]].
    *
    * Checkpoints are the exact interpolated id-quantiles (the
    * q84/winsorize percentile contract both engines share), so a doc
    * belongs to checkpoint k iff `id ≤ quantile(k/buckets)` — a narrow
    * comparison, NOT a global rank (a row_number over the corpus would
    * be a single-task window, the exact scale-killer this operator
    * family avoids).
    *
    * Scale shape: each token reduces to its FIRST document
    * (min-aggregate at vocabulary grain), first-counts aggregate at
    * document grain, and the curve itself is ONE conditional
    * aggregation producing `buckets` checkpoint columns that unpivot
    * to rows — no window anywhere, nothing ordered but the
    * |buckets|-row output.
    */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 1 && buckets <= 100, "buckets must be in [1, 100]")
    val firsts = df.select(col(idCol).as("__id"),
        explode(tokens(lower(col(textCol)))).as("token"))
      .groupBy("token").agg(min("__id").as("__first"))
      .groupBy(col("__first").as("__id"))
      .agg(count(lit(1)).as("__nf"))
    // join on the ORIGINAL id type — a double-cast key loses precision
    // for ids ≥ 2^53 and silently merges/drops first-seen counts
    val docs = df.select(col(idCol).as("__id"))
      .join(firsts, Seq("__id"), "left")
      .na.fill(0L, Seq("__nf"))
    val bounds = df.select(
        percentile(col(idCol), typedLit((1 to buckets).map(_.toDouble / buckets)))
          .as("qs"))
      .head().getSeq[Double](0)
    // integer id ≤ double quantile b  ⟺  id ≤ floor(b): compare longs
    // against the floored bound so no id ever routes through a double.
    // Only valid for integral id types — a fractional id between
    // floor(b) and b belongs in the bucket, so non-integral columns
    // compare against the raw double bound instead.
    val integralId = df.schema(idCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType |
           _: org.apache.spark.sql.types.ShortType |
           _: org.apache.spark.sql.types.IntegerType |
           _: org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    val checks = (1 to buckets).flatMap { k =>
      val bound =
        if (integralId) lit(math.floor(bounds(k - 1)).toLong)
        else lit(bounds(k - 1))
      Seq(count(when(col("__id") <= bound, 1)).cast("long").as(s"__d$k"),
        coalesce(sum(when(col("__id") <= bound, col("__nf"))), lit(0L)).as(s"__v$k"))
    }
    docs.agg(checks.head, checks.tail: _*)
      .select(explode(array((1 to buckets).map(k =>
        struct(lit(k.toLong).as("bucket"), col(s"__d$k").as("docs_through"),
          col(s"__v$k").as("vocab_size"))): _*)).as("c"))
      .select(col("c.bucket"), col("c.docs_through"), col("c.vocab_size"))
  }

  /** Pairwise source-vocabulary similarity — [[sourceScorecard]]'s
    * companion audit: exact Jaccard between the DISTINCT token sets of
    * every source pair sharing at least one token (fully disjoint
    * vocabularies — Jaccard 0 — are absent by construction),
    * per-myriad integer. Two sources with
    * near-identical vocabularies are usually the same upstream crawl
    * wearing two names — the mix double-counts them unless caught
    * here.
    *
    * Scale shape: membership dedupes to (source, token) grain —
    * bounded by sources×vocabulary, not corpus volume; the
    * intersection join is equality-keyed on the token with fan-out ≤
    * sources² per token (sources are a small constant in any real
    * mix); sizes join back at source grain. All integers.
    */
  def sourceSimilarity(df: DataFrame, textCol: String,
      sourceCol: String): DataFrame = {
    val st = df.select(col(sourceCol).as("source"),
        explode(tokens(lower(col(textCol)))).as("token"))
      .distinct()
    val sizes = st.groupBy("source").agg(count(lit(1)).as("__sz"))
    val inter = st.select(col("token"), col("source").as("source_a"))
      .join(st.select(col("token"), col("source").as("source_b")), Seq("token"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("__i"))
    inter
      .join(sizes.select(col("source").as("source_a"), col("__sz").as("__na")),
        Seq("source_a"))
      .join(sizes.select(col("source").as("source_b"), col("__sz").as("__nb")),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"),
        col("__i").as("n_shared"),
        expr("__i * 10000 div (__na + __nb - __i)").as("jaccard_pm"))
  }

  /** Multi-pattern blocklist screening — the unsafe-content /
    * boilerplate-marker gate every curation pipeline runs before
    * training: per document, how many blocklist terms (words OR
    * multi-word phrases) occur, how many DISTINCT terms, the most
    * frequent term, and the block verdict at `blockAt` total hits.
    *
    * ONE compiled-regex pass per document — the alternation
    * `\b(p1|p2|…)\b` scans each doc once regardless of |patterns|,
    * where the naive per-pattern `contains` loop scans |patterns|
    * times (the Aho–Corasick-style gain, here delegated to the regex
    * engine's DFA). Alternatives are ordered LONGEST-FIRST so Java's
    * ordered alternation agrees with RE2's leftmost-longest rule on
    * overlapping terms ("small table" consumes its "small"); patterns
    * must be regex-safe literals (letters/digits/spaces).
    *
    * Scale shape: pure per-row column expressions — extraction, the
    * per-term counts (|patterns|-bounded array ops), and the argmax
    * fold never leave the row, so the operator is a narrow map with NO
    * shuffle; `top_term` ties break on the lexicographically smallest
    * term (ascending fold with strict >).
    */
  def blocklistSummary(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String], blockAt: Long): DataFrame = {
    require(patterns.nonEmpty, "patterns must be non-empty")
    require(patterns.forall(_.matches("[A-Za-z0-9 ]+")),
      "patterns must be plain word/phrase literals")
    require(blockAt >= 1, "blockAt must be >= 1")
    val combined = "\\b(?:" + patterns.sortBy(p => (-p.length, p)).mkString("|") + ")\\b"
    val ex = regexp_extract_all(col(textCol), lit(combined), lit(0))
    val asc = patterns.sorted
    val cnts = array(asc.map(p =>
      struct(size(filter(ex, x => x === lit(p))).as("n"), lit(p).as("t"))): _*)
    val best = aggregate(cnts,
      struct(lit(-1).as("n"), lit("").as("t")),
      (acc, x) => when(x("n") > acc("n"), x).otherwise(acc))
    df.select(col(idCol),
      size(ex).cast("long").as("n_matches"),
      size(array_distinct(ex)).cast("long").as("n_distinct_terms"),
      when(size(ex) > 0, best("t")).as("top_term"),
      when(size(ex) > 0, best("n").cast("long")).otherwise(0L).as("top_n"),
      (size(ex) >= blockAt).as("blocked"))
  }

  /** Hashed n-gram features for DSIR scoring: lowercased whitespace
    * unigrams + adjacent bigrams, each md5-bucketed into [0, nBuckets)
    * with the q77 split hash so any engine re-derives the same bucket.
    * One narrow pass: the feature array is built per row and exploded
    * once — no second corpus scan for the bigrams.
    */
  private def hashedNgramBuckets(df: DataFrame, idCols: Seq[String],
      textCol: String, nBuckets: Int): DataFrame = {
    // r16: featurize + hash in ONE native per-row expression (see
    // HashedNgramExpression — bit-identical to exploding the string
    // features and md5-bucketing each; the explode now moves longs,
    // not feature strings, and the md5 chain runs compiled, not as a
    // per-element interpreted tree)
    df.select(idCols.map(col) :+
      explode(graft.functions.HashedNgramExpression
        .hashed_ngram_buckets(col(textCol), nBuckets)).as("bucket"): _*)
  }

  /** Unigram + adjacent-bigram feature array of a text column. The
    * bigrams come from zip_with(toks, slice(toks, 2, …)) — NOT from a
    * transform over indices: element_at inside a lambda re-evaluates
    * the whole tokenization per element (O(n²) per row, measured 9×
    * slower on the sf0.1 corpus), while the zip evaluates it a constant
    * number of times. The zip pads the final pair with null; concat
    * propagates it and the filter drops it.
    */
  private[graft] def hashedNgramFeatures(text: Column): Column = {
    val toks = tokens(lower(text))
    val bi = filter(
      zip_with(toks, slice(toks, lit(2), size(toks)),
        (a, b) => concat(a, lit(" "), b)),
      x => x.isNotNull)
    concat(toks, bi)
  }

  /** DSIR importance weights (Data Selection via Importance Resampling,
    * Xie et al. 2023): per hashed-n-gram-bucket ratio of the TARGET
    * distribution to the RAW distribution, add-one smoothed, as integer
    * ppm —
    *
    *   r_ppm(b) = ⌊(c_tgt(b)+1)·(n_raw+B)·10⁶ / ((c_raw(b)+1)·(n_tgt+B))⌋
    *
    * clamped at `maxRatioPpm` (the standard importance-weight clip:
    * unclipped ratios on buckets the raw corpus barely touches explode
    * the selection variance, and the clamp also keeps every downstream
    * per-doc sum inside BIGINT). Smoothed counts never divide by zero.
    *
    * Exactness: the per-bucket products overflow 64-bit at corpus
    * scale, so the arithmetic runs in arbitrary-precision integers on
    * the collected bucket table — legitimately driver-side, because the
    * model IS ≤ nBuckets rows by construction (the same bound that
    * makes the weight table broadcastable); a DuckDB oracle re-derives
    * it exactly in HUGEINT. Identity fixpoint: target ≡ raw gives every
    * bucket exactly 1_000_000.
    *
    * Scale shape: one scan per corpus reducing to a ≤ nBuckets-row
    * aggregate (map-side combined); only those 2·nBuckets longs reach
    * the driver.
    */
  def dsirWeights(raw: DataFrame, target: DataFrame, textCol: String,
      nBuckets: Int = 4096, maxRatioPpm: Long = 1000000000L): DataFrame = {
    val (observed, _) = dsirBucketRatios(raw, target, textCol, nBuckets, maxRatioPpm)
    raw.sparkSession.createDataFrame(observed).toDF("bucket", "r_ppm")
  }

  /** The observed (bucket, r_ppm) pairs plus the fully-smoothed DEFAULT
    * ratio for buckets neither corpus touched (c_tgt = c_raw = 0) — a
    * batch score never needs it, but a STREAM can carry novel features.
    */
  private def dsirBucketRatios(raw: DataFrame, target: DataFrame,
      textCol: String, nBuckets: Int, maxRatioPpm: Long)
      : (Seq[(Long, Long)], Long) = {
    require(nBuckets > 0, "nBuckets must be positive")
    require(maxRatioPpm >= 1000000L, "maxRatioPpm must be >= 1e6")
    def bucketCounts(df: DataFrame, as: String) =
      hashedNgramBuckets(df, Seq.empty, textCol, nBuckets)
        .groupBy("bucket").agg(count(lit(1)).as(as))
    val counts = bucketCounts(target, "c_tgt")
      .join(bucketCounts(raw, "c_raw"), Seq("bucket"), "full")
      .select(col("bucket"),
        coalesce(col("c_tgt"), lit(0L)).as("c_tgt"),
        coalesce(col("c_raw"), lit(0L)).as("c_raw"))
      .collect() // ≤ nBuckets rows — the model itself, by construction
    val bB = BigInt(nBuckets)
    val nTgt = BigInt(counts.map(_.getLong(1)).sum) + bB
    val nRaw = BigInt(counts.map(_.getLong(2)).sum) + bB
    def ratio(cTgt: Long, cRaw: Long): Long =
      ((BigInt(cTgt) + 1) * nRaw * 1000000 / ((BigInt(cRaw) + 1) * nTgt))
        .min(BigInt(maxRatioPpm)).toLong
    (counts.toSeq.map(r => (r.getLong(0), ratio(r.getLong(1), r.getLong(2)))),
      ratio(0L, 0L))
  }

  /** The [[dsirWeights]] model as a DENSE array indexed by bucket —
    * unobserved buckets carry the fully-smoothed default. This is the
    * model shape a stateless scorer embeds as a plan literal.
    */
  def dsirWeightsDense(raw: DataFrame, target: DataFrame, textCol: String,
      nBuckets: Int = 4096, maxRatioPpm: Long = 1000000000L): Array[Long] = {
    val (observed, default) =
      dsirBucketRatios(raw, target, textCol, nBuckets, maxRatioPpm)
    val arr = Array.fill(nBuckets)(default)
    observed.foreach { case (b, r) => arr(b.toInt) = r }
    arr
  }

  /** Dense DSIR weights from PRE-AGGREGATED raw-side bucket counts —
    * the commit-MAINTAINED deployment: the raw corpus is never
    * rescanned; its per-bucket feature counts arrive as ≤ nBuckets rows
    * from a [[MaintainedStatsIndex]] in feature-hash mode (refreshed
    * inside every commit), and only the small target corpus is
    * featurized here. Same arithmetic as [[dsirWeightsDense]] (BigInt
    * exact, add-one smoothed, clamped), so weights from maintained
    * counts are bit-identical to a from-scratch scan of the same live
    * corpus (spec-pinned).
    */
  def dsirWeightsDenseFromCounts(rawCounts: Seq[(Long, Long)],
      target: DataFrame, textCol: String, nBuckets: Int,
      maxRatioPpm: Long = 1000000000L): Array[Long] = {
    require(nBuckets > 0, "nBuckets must be positive")
    require(maxRatioPpm >= 1000000L, "maxRatioPpm must be >= 1e6")
    val tgt = hashedNgramBuckets(target, Seq.empty, textCol, nBuckets)
      .groupBy("bucket").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val raw = rawCounts.toMap
    val bB = BigInt(nBuckets)
    val nTgt = BigInt(tgt.values.sum) + bB
    val nRaw = BigInt(raw.values.sum) + bB
    Array.tabulate(nBuckets) { b =>
      ((BigInt(tgt.getOrElse(b.toLong, 0L)) + 1) * nRaw * 1000000 /
        ((BigInt(raw.getOrElse(b.toLong, 0L)) + 1) * nTgt))
        .min(BigInt(maxRatioPpm)).toLong
    }
  }

  /** ROW-LOCAL DSIR scoring against a trained dense weight array — the
    * streaming-serving shape (the q212 discipline): featurization,
    * bucket lookup and the integer mean all happen inside the row, so
    * the scorer carries ZERO streaming state at any corpus size and the
    * whole computation stays in codegen. Bit-identical to [[dsirScore]]
    * on the same model (fuzz-pinned): the per-doc mean over a feature
    * multiset doesn't care whether ratios arrive by join or by array
    * index. Tradeoff vs the join path: the model rides every task as an
    * nBuckets-long literal — exactly the broadcast the batch path does,
    * minus the shuffle-side aggregation.
    */
  def dsirScoreStateless(df: DataFrame, idCol: String, textCol: String,
      weights: Array[Long]): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    val nB = weights.length
    // r16: the native featurizer emits bucket ids directly (longs), so
    // the remaining lambda work is an array index + add per feature —
    // the md5/tokenize cost runs compiled once per row
    val ratios = transform(graft.functions.HashedNgramExpression
        .hashed_ngram_buckets(col(textCol), nB),
      b => element_at(lit(weights), (b + 1).cast("int")))
    df.select(col(idCol), ratios.as("__r"))
      .filter(size(col("__r")) > 0)
      .select(col(idCol), size(col("__r")).cast("long").as("n_feats"),
        expr("aggregate(__r, 0L, (a, x) -> a + x) div size(__r)").as("dsir_ppm"))
  }

  /** DSIR document scores over the raw corpus: each doc's importance is
    * the integer MEAN of its features' bucket ratios,
    * `dsir_ppm = ⌊Σ r_ppm / n_feats⌋` — 10⁶ means "distributed like the
    * target", higher means over-represented in the target relative to
    * the raw corpus. Selection composes downstream exactly like the
    * q211 soft gate: keep iff hashBucket(id) falls under the score, a
    * deterministic realization of DSIR's sample-proportional-to-weight.
    * Docs with zero tokens have no features and drop from the output
    * (mirrors [[bigramLmScore]] dropping <2-token docs).
    *
    * Scale shape: the weight table is ≤ nBuckets rows and BROADCAST;
    * scoring is one corpus scan + one doc-keyed aggregation. Nothing
    * corpus-sized is collected.
    */
  def dsirScore(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, nBuckets: Int = 4096,
      maxRatioPpm: Long = 1000000000L): DataFrame = {
    // r16: score ROW-LOCALLY against the dense weight array (the
    // stateless-serving shape, fuzz-pinned bit-identical to the old
    // explode→broadcast-join→groupBy path). The join path shuffled one
    // row PER FEATURE (corpus-token-count rows) back to doc grain; the
    // dense lookup keeps featurization, weight lookup and the integer
    // mean inside the row — zero exchanges in the scoring pass, the
    // model rides as the same ≤nBuckets-long broadcast-sized literal
    // the join path collected anyway (guide §2.4).
    dsirScoreStateless(raw, idCol, textCol,
      dsirWeightsDense(raw, target, textCol, nBuckets, maxRatioPpm))
  }
}

