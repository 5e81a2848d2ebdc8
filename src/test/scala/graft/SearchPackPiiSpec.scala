package graft

import org.apache.spark.sql.functions._

import graft.operators.{Packing, Pii, Search, TextAnalysis}

/** Unit gates for the search / packing / PII operators (q87-q89). The
  * sf-level hash gate is the DuckDB oracle; these pin the contracts on
  * hand-computable fixtures.
  */
class SearchPackPiiSpec extends SparkSpec {
  import spark.implicits._

  test("bm25TopK: integer contract on a hand-checked corpus") {
    val docs = Seq(
      (1L, "spark spark spark fast"), // tf(spark)=3, dl=4
      (2L, "spark slow"),             // tf(spark)=1, dl=2
      (3L, "merge merge"),            // tf(merge)=2, dl=2
      (4L, "nothing here at all"),    // no query terms, dl=4
      (5L, "")                        // empty
    ).toDF("doc_id", "text")
    val out = Search.bm25TopK(docs, "doc_id", "text", Seq("spark", "merge"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // n=5 docs, total tokens = 4+2+2+4 = 12, avgdl = 12 div 5 = 2
    // idf(spark) = 50000 div 2 = 25000; idf(merge) = 50000 div 1 = 50000
    // doc1: tf=3 dl=4 -> (3*20000*2) div (3*2+4) = 120000 div 10 = 12000; score 3e8
    // doc2: tf=1 dl=2 -> (40000) div (4) = 10000; score 2.5e8
    // doc3: tf=2 dl=2 -> (80000) div (6) = 13333; score 13333*50000
    assert(out.head == (3L, 13333L * 50000))
    assert(out(1) == (1L, 25000L * 12000))
    assert(out(2) == (2L, 25000L * 10000))
    assert(out.length == 3) // docs without query terms never appear
  }

  test("hardNegatives: full-term matches are presumed positives and " +
      "excluded; partial matches rank by the same BM25 contract") {
    val docs = Seq(
      (1L, "spark merge fast"),        // matches BOTH terms → positive, excluded
      (2L, "spark spark spark slow"),  // spark only: the hard negative
      (3L, "merge here"),              // merge only
      (4L, "nothing at all"),          // no terms: not a candidate
      (5L, "spark merge spark merge")  // both terms → excluded
    ).toDF("doc_id", "text")
    val out = Search.hardNegatives(docs, "doc_id", "text",
        Seq("spark", "merge"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(!out.map(_._1).toSet.contains(1L) &&
      !out.map(_._1).toSet.contains(5L), "full matches must be excluded")
    assert(out.map(_._1).toSet == Set(2L, 3L))
    assert(out.forall(_._3 == 1L), "each candidate matched exactly 1 of 2 terms")
    // scores follow the q87 contract: n=5, total tokens 3+4+2+3+4=16,
    // avgdl = 16 div 5 = 3; df(spark)=3, df(merge)=3 (docs 1,3,5)
    // doc2: tf=3 dl=4 -> idf 50000 div 3 = 16666;
    //       tfc (3*20000*3) div (3*3+4) = 180000 div 13 = 13846
    assert(out.find(_._1 == 2L).get._2 == 16666L * 13846L)
    // doc3: tf=1 dl=2 -> (1*20000*3) div (1*3+2) = 60000 div 5 = 12000
    assert(out.find(_._1 == 3L).get._2 == 16666L * 12000L)
    // k bounds the emitted negatives
    assert(Search.hardNegatives(docs, "doc_id", "text",
      Seq("spark", "merge"), k = 1).count() == 1L)
    intercept[IllegalArgumentException](
      Search.hardNegatives(docs, "doc_id", "text", Nil, k = 5))
    // duplicate query terms are deduped, so the positive exclusion still
    // fires (r15 advice #1: before the fix, terms=[spark,spark,merge] made
    // the < terms.size threshold unreachable and full matches leaked out)
    val dup = Search.hardNegatives(docs, "doc_id", "text",
        Seq("spark", "spark", "merge"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(dup.toSeq == out.toSeq,
      "duplicated terms must behave exactly like the deduped query")
    assert(Search.hardNegativesOracleSql("documents", "doc_id", "text",
        Seq("spark", "spark", "merge"), 10) ==
      Search.hardNegativesOracleSql("documents", "doc_id", "text",
        Seq("spark", "merge"), 10),
      "the oracle must mirror the operator's dedupe")
  }

  test("concatChunk: offsets, spans, and bucket-boundary correctness") {
    // seqLen 10; force multiple buckets with bucketSize=4
    val docs = Seq(
      (0L, 3L), (1L, 7L),        // doc1 ends seq 0 exactly (offset 3..9)
      (2L, 0L),                  // empty doc: 0 sequences, offset carried
      (3L, 15L),                 // spans seqs 1-2 (offset 10..24)
      (4L, 1L), (7L, 5L)         // id gap crosses the bucket boundary
    ).toDF("doc_id", "n")
    val out = Packing.concatChunk(docs, "doc_id", col("n"), seqLen = 10, bucketSize = 4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out === Array(
      (0L, 3L, 0L, 0L, 1L),
      (1L, 7L, 3L, 0L, 1L),
      (2L, 0L, 10L, 1L, 0L),
      (3L, 15L, 10L, 1L, 2L),
      (4L, 1L, 25L, 2L, 1L),
      (7L, 5L, 26L, 2L, 2L))) // 26..30 straddles the seq 2|3 cut
    // identical to the single-window definition regardless of bucketing
    val single = Packing.concatChunk(docs, "doc_id", col("n"), seqLen = 10,
      bucketSize = 1000000L).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out === single)
  }

  test("systematicSample: exactly k picks, weight-proportional, zero-weight excluded") {
    val docs = Seq(
      (0L, 10L), (1L, 0L), (2L, 90L), (3L, 5L), (4L, 5L), (7L, 40L)
    ).toDF("doc_id", "n") // W = 150
    val out = Packing.systematicSample(docs, "doc_id", col("n"), k = 15,
        bucketSize = 4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // grid stride W/k = 10: picks ∝ weight, Σ = k exactly
    assert(out.map(_._3).sum == 15L, s"must pick exactly k: ${out.toSeq}")
    assert(!out.exists(_._1 == 1L), "zero-weight doc must never be picked")
    val byId = out.map(t => t._1 -> t._3).toMap
    assert(byId(2L) == 9L && byId(7L) == 4L, s"heavy docs under-picked: ${out.toSeq}")
    // bucketing must not change the sample (prefix-sum equivalence)
    val single = Packing.systematicSample(docs, "doc_id", col("n"), k = 15,
        bucketSize = 1000000L)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(out === single)
    // a doc heavier than the stride is picked multiple times (its
    // n_picks IS the sampling weight) — already covered: doc 2 gets 9
  }

  test("pii scan: counts, redaction, ordering of the three shapes") {
    val rows = Seq(
      (1L, "reach me at jo.doe+x@corp.example.org or 10.1.2.3"),
      (2L, "ssn 123-45-6789 twice 987-65-4321"),
      (3L, "версия v1.2.3.4 is an ip shape"), // dotted quad matches by design
      (4L, "clean text, nothing here")
    ).toDF("id", "t")
    val out = Pii.scan(rows, "id", "t").orderBy("id").collect()
    assert(out(0).getLong(1) == 1 && out(0).getLong(2) == 1 && out(0).getLong(3) == 0)
    assert(out(1).getLong(3) == 2 && out(1).getBoolean(5))
    assert(out(2).getLong(2) == 1)
    assert(out(3).getLong(1) + out(3).getLong(2) + out(3).getLong(3) == 0)
    assert(!out(3).getBoolean(5))
    // redaction replaces the email BEFORE scanning digits: the local
    // part's dots never produce a phantom IP
    val r1 = rows.filter($"id" === 1).select(Pii.redact($"t")).head().getString(0)
    assert(r1 == "reach me at <EMAIL> or <IP>")
    val r2 = rows.filter($"id" === 2).select(Pii.redact($"t")).head().getString(0)
    assert(r2 == "ssn <SSN> twice <SSN>")
  }

  test("search and packing operators agree with their oracle SQL shape at sf0.001") {
    // smoke the real catalog entries end-to-end on the tiny SF (the
    // hash-exact cross-engine check is the driver's DuckDB gate)
    val q87 = SparkEntry.queries("q87_bm25_search")(spark, sf)
    assert(q87.count() > 0)
    val q88 = SparkEntry.queries("q88_pack_sequences")(spark, sf)
    val docs = model.Tpch.table(spark, sf, "documents")
    assert(q88.count() == docs.count())
    // total stream length equals the last doc's start + its tokens
    val last = q88.orderBy(col("doc_id").desc).limit(1)
      .select(col("start_offset") + col("n_tokens")).head().getLong(0)
    val total = docs.select(sum(TextAnalysis.tokenCount(col("text")))).head().getLong(0)
    assert(last == total)
    val q89 = SparkEntry.queries("q89_pii_scan")(spark, sf)
    // every profile carries exactly one email; ip/ssn per the modulus
    val agg = q89.agg(sum("n_email"), sum("n_ip"), sum("n_ssn"), count(lit(1))).head()
    val n = agg.getLong(3)
    assert(agg.getLong(0) == n)
    assert(agg.getLong(1) == model.Tpch.table(spark, sf, "customer")
      .filter(col("c_custkey") % 3 === 0).count())
    assert(agg.getLong(2) == model.Tpch.table(spark, sf, "customer")
      .filter(col("c_custkey") % 5 === 0).count())
  }

  test("punctRatio counts punctuation characters, not their complement") {
    val rows = Seq("ab!?", "abcd", "", "!!").toDF("t")
      .select(TextAnalysis.punctRatio(col("t")).as("r"))
      .as[Double].collect().toSeq
    assert(rows == Seq(0.5, 0.0, 0.0, 1.0))
  }

  test("filterGate: each rule bit fires independently on hand-built docs") {
    // 16 tokens, sum length 68 (mean 4.25 in [3,10]), 5 stopword hits
    val clean = "the quick brown foxes jumped over the sleepy hounds " +
      "in the garden while it was warm"
    val docs = Seq(
      (1L, clean),                                   // passes all rules
      (2L, "the of in is and to it or an a"),        // 10 tokens but mean len 2 -> bit 2
      (3L, "short the of"),                          // < 10 tokens -> bit 1
      (4L, clean + " !!!!!!!!!!!!!!!!!!!!!!!!!!!!"), // punct-heavy -> bit 4
      (5L, "cat dog mat sun sky red big run sit fly"), // no stopwords -> bit 8
      (6L, "")                                       // empty: bits 1 + 8
    ).toDF("doc_id", "text")
    val out = TextAnalysis.filterGate(docs, "doc_id", "text")
      .select("doc_id", "reasons", "keep")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(1L) == ((0L, true)))
    assert(out(2L) == ((2L, false)))
    assert(out(3L) == ((1L, false)))
    assert(out(4L) == ((4L, false)))
    assert(out(5L) == ((8L, false)))
    assert(out(6L) == ((9L, false)))
  }

  test("vocab: counts, doc frequencies, deterministic tie-broken ranks") {
    val docs = Seq(
      (1L, "b a b c"),
      (2L, "a b"),
      (3L, "")
    ).toDF("doc_id", "text")
    val v = TextAnalysis.vocab(docs, "doc_id", "text", topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // b: 3 occurrences in 2 docs; a: 2 in 2; c (1) cut by topK
    assert(v.toSeq == Seq(("b", 3L, 2L, 1L), ("a", 2L, 2L, 2L)))
  }

  test("bpePairCounts: frequency-weighted adjacent pairs, hand-checked") {
    // "abab" x2 -> pairs ab,ba,ab weighted 2 = ab:4 ba:2; "ab" x1 -> ab:1
    val docs = Seq((1L, "abab ab"), (2L, "abab x")).toDF("doc_id", "text")
    val got = TextAnalysis.bpePairCounts(docs, "text", topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("ab", 5L, 1L), ("ba", 2L, 2L)))
  }

  test("chunkOverlap: window/stride arithmetic on a hand-checked fixture") {
    val docs = Seq(
      (1L, "a b c d e f g h i"), // 9 tokens -> starts 0,4 (8 would be
                                 // fully contained in the window at 4)
      (2L, "x y"),               // shorter than one window -> 1 chunk
      (3L, ""),                  // empty -> no chunks
      (4L, "a b c d e f g h i j k") // 11 tokens -> starts 0,4,8
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkOverlap(docs, "doc_id", "text",
        chunkSize = 6, stride = 4)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, "a b c d e f", 6L),
      (1L, 1L, 4L, "e f g h i", 5L),
      (2L, 0L, 0L, "x y", 2L),
      (4L, 0L, 0L, "a b c d e f", 6L),
      (4L, 1L, 4L, "e f g h i j", 6L),
      (4L, 2L, 8L, "i j k", 3L)))
    // consecutive chunks overlap by chunkSize - stride tokens
    assert(out(0)._4.split(" ").takeRight(2).mkString(" ") ==
      out(1)._4.split(" ").take(2).mkString(" "))
  }

  test("rrfFuse: reciprocal-rank arithmetic, absent lists contribute zero") {
    import spark.implicits._
    import graft.operators.Search
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rank")
    val b = Seq((30L, 1L), (40L, 2L)).toDF("id", "rank")
    val out = Search.rrfFuse(Seq("lex" -> a, "vec" -> b), "id",
        kConst = 60, topK = 10)
      .as[(Long, Long, Long, Double)].collect()
    // 30 is in both lists: 1/63 + 1/61 = 0.032266 — fused above any single hit
    assert(out.head === ((30L, 3L, 1L, 0.032266)))
    val m = out.map(r => r._1 -> r).toMap
    assert(m(10L) === ((10L, 1L, 0L, 0.016393))) // 1/61
    assert(m(40L) === ((40L, 0L, 2L, 0.016129))) // 1/62
    assert(m(20L) === ((20L, 2L, 0L, 0.016129)))
    // equal scores (20 vs 40) tie-break by id: 20 before 40
    assert(out.map(_._1).toSeq === Seq(30L, 10L, 20L, 40L))
  }

  test("rrfFuse: topK caps the fused list") {
    import spark.implicits._
    import graft.operators.Search
    val a = (1L to 9L).map(i => (i, i)).toDF("id", "rank")
    val b = (1L to 9L).map(i => (i + 100, i)).toDF("id", "rank")
    val out = Search.rrfFuse(Seq("x" -> a, "y" -> b), "id", topK = 4).collect()
    assert(out.length === 4)
  }

  test("mmrRerank: diversity demotes the duplicate, pure relevance keeps it") {
    import graft.operators.Similarity
    // id1 and id2 duplicate the query direction; id3 is 0.6-similar
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)), (3L, Array(0.6f, 0.8f))
    ).toDF("vec_id", "embedding")
    val q = Seq(1.0, 0.0)
    // λ = 0.3: after id1 (tie → lower id), the duplicate id2 scores
    // 0.3·1 − 0.7·1 = −0.4 while diverse id3 scores 0.18 − 0.42 = −0.24
    val div = Similarity.mmrRerank(emb, "embedding", "vec_id", q,
        candK = 3, selectK = 3, lambdaPm = 3000)
      .as[(Long, Long, Double, Double)].collect()
    assert(div.map(_._2).toSeq === Seq(1L, 3L, 2L), s"picks: ${div.toSeq}")
    assert(div.map(_._4).toSeq === Seq(0.3, -0.24, -0.4), s"mmr: ${div.toSeq}")
    // λ = 1: pure relevance — the duplicate stays second
    val rel = Similarity.mmrRerank(emb, "embedding", "vec_id", q,
        candK = 3, selectK = 3, lambdaPm = 10000)
      .as[(Long, Long, Double, Double)].collect()
    assert(rel.map(_._2).toSeq === Seq(1L, 2L, 3L), s"picks: ${rel.toSeq}")
  }
}
