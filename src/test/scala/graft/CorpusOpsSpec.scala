package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Search, TextAnalysis}

/** Unit gates for the corpus-analysis operators added in round 6:
  * exact substring-duplication spans (q104), TF-IDF keyword extraction
  * (q105), and bigram-LM fluency scoring (q107). The sf-level hash
  * gate is the DuckDB oracle; these pin the contracts on
  * hand-computable fixtures.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("dupSpans: window counts, cross- and within-doc duplication, edge docs") {
    val docs = Seq(
      (1L, "a b c a b"), // windows(k=2): "a b","b c","c a","a b" — "a b" dups itself
      (2L, "a b x"),     // "a b" also here: 3 corpus occurrences total
      (3L, "z z"),       // unique window
      (4L, "q"),         // shorter than k: zero windows
      (5L, "")           // empty
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpans(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out === Array(
      (1L, 4L, 2L, 5000L), // both "a b" positions duplicated; 2*10000 div 4
      (2L, 2L, 1L, 5000L),
      (3L, 1L, 0L, 0L),
      (4L, 0L, 0L, 0L),    // n_windows 0 -> ratio over greatest(0,1)
      (5L, 0L, 0L, 0L)))
  }

  test("tfidfKeywords: integer weighting, per-doc ranks, term tiebreak") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "apple")
    ).toDF("doc_id", "text")
    // n=3; df: apple 2, banana 2, cherry 1
    // idf_pm: apple/banana (3*10000) div 2 = 15000; cherry 30000
    val out = Search.tfidfKeywords(docs, "doc_id", "text", topPerDoc = 2)
      .orderBy("doc_id", "rk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(4), r.getLong(5)))
    assert(out === Array(
      (1L, "apple", 2L * 15000, 1L), (1L, "banana", 15000L, 2L),
      (2L, "cherry", 30000L, 1L), (2L, "banana", 15000L, 2L),
      (3L, "apple", 15000L, 1L)))
  }

  test("tfidfKeywords: equal scores break ties on the term string") {
    val docs = Seq((1L, "beta alfa"), (2L, "alfa beta")).toDF("doc_id", "text")
    // both terms: tf=1, df=2, identical score -> rank by term asc
    val out = Search.tfidfKeywords(docs, "doc_id", "text", topPerDoc = 2)
      .orderBy("doc_id", "rk").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out === Array((1L, "alfa"), (1L, "beta"), (2L, "alfa"), (2L, "beta")))
  }

  test("bigramLmScore: add-one smoothed ppm on a hand-checked model") {
    val train = Seq((10L, "a b"), (11L, "a b"), (12L, "a c")).toDF("doc_id", "text")
    // c1: a=3 b=2 c=1; V=3; c2: (a,b)=2 (a,c)=1
    val test_ = Seq(
      (1L, "a b c"), // p(a,b)=(2+1)*1e6 div (3+3)=500000; p(b,c)=1e6 div (2+3)=200000
      (2L, "x")      // no bigrams: not scored
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(train, test_, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out === Array((1L, 2L, 350000L)))
  }

  test("bigramLmScore: an empty train slice degrades to the uniform score, not a throw") {
    val train = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val test_ = Seq((1L, "a b")).toDF("doc_id", "text")
    // v = 0: the guarded divisor is greatest(0, 1) — ANSI div would
    // otherwise throw per scored row
    val out = TextAnalysis.bigramLmScore(train, test_, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out === Array((1L, 1L, 1000000L)))
  }

  test("bigramLmScore: unseen context falls back to the vocabulary floor") {
    val train = Seq((10L, "a b")).toDF("doc_id", "text") // c1: a=1 b=1; V=2
    val test_ = Seq((1L, "q r")).toDF("doc_id", "text")
    // (q,r) unseen, q unseen: (0+1)*1e6 div (0+2) = 500000
    val out = TextAnalysis.bigramLmScore(train, test_, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out === Array((1L, 1L, 500000L)))
  }

  test("semanticDedup: transitive groups collapse to the min-id representative") {
    import graft.operators.Similarity
    val vecs = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(0.9999f, 0.01f, 0f, 0f)),  // ≈ v1 (cos ≈ 0.99995)
      (3L, Seq(1.9998f, 0.02f, 0f, 0f)),  // 2× v2 — transitive member
      (4L, Seq(0f, 1f, 0f, 0f))           // orthogonal: its own group
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(vecs, "vec_id", "embedding", threshold = 0.999)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out === Array(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (4L, 4L, true)))
  }

  test("semanticDedup: prebuilt LSH-store buckets give identical results to recompute") {
    import graft.operators.Similarity
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = emb.count()
    val bits = Similarity.autoSignatureBits(n)
    val fromScratch = Similarity.semanticDedup(emb, "vec_id", "embedding",
        threshold = 0.999, nBits = bits)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val path = Similarity.ensureDedupSigStore(emb, "embedding", "vec_id", sf,
      dim = emb.select(size(col("embedding"))).head().getInt(0),
      nBits = bits, nTables = 8, seed = 42L)
    val fromStore = Similarity.semanticDedup(emb, "vec_id", "embedding",
        threshold = 0.999, buckets = Some(spark.read.parquet(path)),
        knownCount = Some(n))
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(fromStore === fromScratch)
  }

  test("nnTopKJoin: ranked per-vector neighbors, k cap, threshold floor") {
    import graft.operators.Similarity
    val vecs = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(2f, 0f, 0f, 0f)),       // parallel to v1 (cos 1.0)
      (3L, Seq(0.9999f, 0.01f, 0f, 0f)), // ≈ v1/v2 (cos ≈ 0.99995)
      (4L, Seq(0f, 1f, 0f, 0f)),       // orthogonal — no neighbors
      (5L, Seq(0f, 2f, 0f, 0f))        // parallel to v4
    ).toDF("vec_id", "embedding")
    val out = Similarity.nnTopKJoin(vecs, "vec_id", "embedding",
        threshold = 0.999, k = 2)
      .orderBy("id", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // the 1-2-3 family: exact-parallel partner ranks first (cos 1.0),
    // the ≈-copy second; the 4-5 pair is its own family
    assert(out.map(t => (t._1, t._2, t._4)) === Array(
      (1L, 2L, 1L), (1L, 3L, 2L),
      (2L, 1L, 1L), (2L, 3L, 2L),
      (3L, 1L, 1L), (3L, 2L, 2L),
      (4L, 5L, 1L), (5L, 4L, 1L)))
    // ids 1 and 2 have an exact-parallel rank-1 partner (cos 1.0);
    // id 3's best neighbor is the ≈-copy (cos just under 1)
    assert(out.filter(t => t._1 <= 2 && t._4 == 1L).forall(_._3 == 1.0))
    assert(out.filter(t => t._1 == 3L && t._4 == 1L).forall(t => t._3 >= 0.999 && t._3 < 1.0))
    // k truly caps: with k=1 each of 1-2-3 keeps only its best neighbor
    val capped = Similarity.nnTopKJoin(vecs, "vec_id", "embedding",
        threshold = 0.999, k = 1)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped === Array((1L, 2L), (2L, 1L), (3L, 1L), (4L, 5L), (5L, 4L)))
  }

  test("Curate: a near-dup twin survives the exact tier but drops via the keep-list") {
    import graft.operators.Curate
    // two near-duplicate (NOT byte-identical) fluent docs + one clean
    // singleton; all three pass the quality gate and the exact-hash
    // tier (distinct md5s)
    val base = "the cat sat on the mat and the dog ran to the big red barn today"
    val docs = Seq(
      (1L, base),
      (2L, base + " extra"), // near-dup of 1, different hash
      (3L, "a quick brown fox jumps over the lazy dog and it runs far away now"))
      .toDF("doc_id", "text")
    val exactOnly = Curate(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(exactOnly == Set(1L, 2L, 3L),
      s"twin must survive the exact tier: $exactOnly")
    val keep = Seq(1L, 3L).toDF("doc_id") // near-dup pass kept min ids
    val composed = Curate(docs, "doc_id", "text", nearDupKeep = Some(keep))
      .select("doc_id").as[Long].collect().toSet
    assert(composed == Set(1L, 3L),
      s"near-dup twin must drop through the keep-list: $composed")
  }

  test("Curate.audit: every doc gets a status, kept slice ≡ Curate") {
    import graft.operators.Curate
    val base = "the cat sat on the mat and the dog ran to the big red barn today"
    val docs = Seq(
      (1L, base),
      (2L, base),             // exact twin of 1 -> exact_dup, dup_of 1
      (3L, base + " extra"),  // near-dup of 1 (distinct hash)
      (4L, "a quick brown fox jumps over the lazy dog and it runs far away now"),
      (5L, "x y z"))          // gate-failed: too short
      .toDF("doc_id", "text")
    val keep = Seq(1L, 4L).toDF("doc_id") // a near-dup pass kept min ids
    val audit = Curate.audit(docs, "doc_id", "text", nearDupKeep = Some(keep))
      .orderBy("doc_id").collect()
    val byId = audit.map(r => r.getLong(0) ->
      (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
        r.getString(3), Option(r.getString(4)))).toMap
    assert(audit.length == 5, "one audit row per raw doc")
    assert(byId(1L)._3 == "kept" && byId(1L)._2 == Some(1L) && byId(1L)._4.isDefined)
    assert(byId(2L)._3 == "exact_dup" && byId(2L)._2 == Some(1L) && byId(2L)._4.isEmpty)
    assert(byId(3L)._3 == "near_dup" && byId(3L)._2 == Some(3L) && byId(3L)._4.isEmpty)
    assert(byId(4L)._3 == "kept")
    assert(byId(5L)._3 == "gate" && byId(5L)._1 != 0L && byId(5L)._2.isEmpty,
      "gate-failed docs carry a non-zero bitmask and no dup class")
    // the kept slice IS the curated set — the two surfaces cannot drift
    val keptSlice = Curate.audit(docs, "doc_id", "text", nearDupKeep = Some(keep))
      .filter(col("status") === "kept")
      .select("doc_id", "split", "n_tokens")
    val curated = Curate(docs, "doc_id", "text", nearDupKeep = Some(keep))
    assert(keptSlice.exceptAll(curated).isEmpty && curated.exceptAll(keptSlice).isEmpty,
      "audit(status=kept) must equal Curate row-for-row")
    // and with no keep-list there is no near_dup status at all
    val plain = Curate.audit(docs, "doc_id", "text")
      .select("status").as[String].collect()
    assert(!plain.contains("near_dup"))
  }

  test("dsirScore: identity fixpoint, driver-model differential, clamp") {
    // identity fixpoint: target ≡ raw makes every bucket ratio exactly
    // 1e6 — so every doc scores exactly 1e6, regardless of content
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "a quick brown fox jumps"),
      (3L, "numbers 1 2 3 4 5 here"),
      (4L, "")).toDF("doc_id", "text")
    val self = TextAnalysis.dsirScore(docs, docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(self.keySet === Set(1L, 2L, 3L), "zero-token docs drop")
    assert(self.values.forall(_ == 1000000L), s"identity must score 1e6: $self")

    // driver-model differential: recompute buckets/ratios/scores with
    // plain JVM md5 + BigInt and require exact equality
    val raw = Seq(
      (10L, "alpha beta gamma alpha"),
      (11L, "beta beta delta"),
      (12L, "epsilon zeta"),
      (13L, "alpha beta")).toDF("doc_id", "text")
    val tgt = Seq((20L, "alpha beta alpha"), (21L, "gamma"),
      (22L, "gamma gamma gamma gamma gamma gamma gamma gamma")).toDF("doc_id", "text")
    val nB = 64
    def bucketOf(f: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % nB
    }
    def feats(text: String): Seq[String] = {
      val tk = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      tk ++ tk.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    val rawDocs = Seq(10L -> "alpha beta gamma alpha", 11L -> "beta beta delta",
      12L -> "epsilon zeta", 13L -> "alpha beta")
    val tgtDocs = Seq(20L -> "alpha beta alpha", 21L -> "gamma",
      22L -> "gamma gamma gamma gamma gamma gamma gamma gamma")
    val cRaw = rawDocs.flatMap(d => feats(d._2)).groupBy(bucketOf).map { case (b, fs) => b -> fs.size }
    val cTgt = tgtDocs.flatMap(d => feats(d._2)).groupBy(bucketOf).map { case (b, fs) => b -> fs.size }
    val nRaw = BigInt(cRaw.values.sum + nB)
    val nTgt = BigInt(cTgt.values.sum + nB)
    def rPpm(b: Long, cap: Long): BigInt =
      ((BigInt(cTgt.getOrElse(b, 0)) + 1) * nRaw * 1000000 /
        ((BigInt(cRaw.getOrElse(b, 0)) + 1) * nTgt)).min(BigInt(cap))
    def modelScore(text: String, cap: Long): (Long, Long) = {
      val bs = feats(text).map(bucketOf)
      (bs.size.toLong, (bs.map(rPpm(_, cap)).sum / bs.size).toLong)
    }
    val got = TextAnalysis.dsirScore(raw, tgt, "doc_id", "text", nBuckets = nB)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((id, text) <- rawDocs)
      assert(got(id) === modelScore(text, 1000000000L), s"doc $id")
    // docs made of target-frequent features must outscore docs the
    // target never touches
    assert(got(13L)._2 > got(12L)._2,
      s"on-target doc must outscore off-target: $got")

    // clamp: with a tight cap the same model (cap applied per bucket)
    // still matches exactly, and at least one bucket actually hits it
    val capped = TextAnalysis.dsirScore(raw, tgt, "doc_id", "text",
        nBuckets = nB, maxRatioPpm = 1200000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((id, text) <- rawDocs)
      assert(capped(id) === modelScore(text, 1200000L), s"capped doc $id")
    val anyCapHit = rawDocs.flatMap(d => feats(d._2)).map(bucketOf)
      .exists(b => rPpm(b, 1000000000L) > 1200000L)
    assert(anyCapHit, "fixture must exercise the clamp")
  }

  test("pmiCollocations: exact-rational lift, minCount floor, tie-stable ranking") {
    val docs = Seq(
      (1L, "a b a b a b"),     // bigrams: (a,b)x3, (b,a)x2
      (2L, "c c c c c c c")    // (c,c)x6
    ).toDF("doc_id", "text")
    // N=13 unigrams, M=11 bigrams; minCount=3 keeps (a,b) and (c,c)
    val out = TextAnalysis.pmiCollocations(docs, "text", minCount = 3, topK = 10)
      .as[(String, String, Long, Double)].collect()
    assert(out === Array(
      ("a", "b", 3L, math.rint(507.0 / 99.0 * 1e6) / 1e6),   // 5.121212
      ("c", "c", 6L, math.rint(1014.0 / 539.0 * 1e6) / 1e6)) // 1.881262
    )
  }

  test("pmiCollocations: hapax bigrams below the floor never surface") {
    val docs = Seq((1L, "unique pair here"), (2L, "x y x y x y x y")).toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, "text", minCount = 2, topK = 10)
      .as[(String, String, Long, Double)].collect()
    assert(out.forall(r => r._3 >= 2))
    assert(!out.exists(r => r._1 == "unique"))
  }

  test("bigramLmScore: train docs score higher than shuffled-vocab docs") {
    // fluency sanity on the corpus itself: a doc made of train bigrams
    // outscores one made of tokens the model never saw
    val train = Seq((1L, "the cat sat on the mat"), (2L, "the dog sat on the rug"))
      .toDF("doc_id", "text")
    val test_ = Seq((3L, "the cat sat"), (4L, "zyx wvu tsr")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(train, test_, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out(3L) > out(4L),
      s"in-distribution doc must outscore out-of-vocabulary doc: $out")
  }

  test("normalizeText: NFC composition, zero-width strip, whitespace collapse, trim") {
    val messy = Seq(
      (1L, "ca\u0301fe\u0301"),        // decomposed accents -> composed
      (2L, "a\u200Bb\u200C c\u200D\uFEFFd"), // zero-width poison stripped
      (3L, "  a \t b\n\nc  "),          // runs collapse, edges trim
      (4L, "\u00e9"),                   // already NFC: unchanged
      (5L, "")
    ).toDF("id", "t")
    val out = messy.select(col("id"), TextAnalysis.normalizeText(col("t")).as("c"))
      .orderBy("id").as[(Long, String)].collect()
    assert(out === Array(
      (1L, "c\u00e1f\u00e9"),
      (2L, "ab cd"),
      (3L, "a b c"),
      (4L, "\u00e9"),
      (5L, "")))
  }

  test("normalizeText: visually identical strings hash identically after cleanup") {
    // the dedup motivation: decomposed vs precomposed must collide
    val pair = Seq((1L, "résumé"), (2L, "résumé"))
      .toDF("id", "t")
    val cleaned = pair.select(md5(TextAnalysis.normalizeText(col("t")).cast("binary")))
      .distinct().count()
    assert(cleaned === 1L)
  }

  test("tokenDrift: a slice-exclusive token tops the chi-square ranking") {
    val a = Seq((1L, "x x x x common common"), (2L, "x x common")).toDF("id", "text")
    val b = Seq((3L, "y y y common common"), (4L, "y common")).toDF("id", "text")
    val out = TextAnalysis.tokenDrift(a, b, "text", minTotal = 2, topK = 10)
      .as[(String, Long, Long, Double)].collect()
    // n_a=9, n_b=7; "x": (6,0); "y": (0,4); "common": (3,3)
    val m = out.map(r => r._1 -> r).toMap
    assert(m("x")._2 === 6L && m("x")._3 === 0L)
    assert(m("y")._2 === 0L && m("y")._3 === 4L)
    // exclusive tokens dominate the shared one
    assert(m("x")._4 > m("common")._4 && m("y")._4 > m("common")._4)
    // chi2 for x: e_a = 6*9/16 = 3.375, e_b = 6*7/16 = 2.625
    // (6-3.375)^2/3.375 + (0-2.625)^2/2.625 = 2.041667 + 2.625
    assert(m("x")._4 === 4.666667)
  }

  test("cooccurrence: doc-level pair counts, minDf gate, jaccard affinity") {
    val docs = Seq(
      (1L, "x y z"), (2L, "x y"), (3L, "x y"), (4L, "x"), (5L, "y rare")
    ).toDF("doc_id", "text")
    // df: x=4, y=4, z=1, rare=1; minDf=2 keeps only x,y
    // co(x,y)=3; jaccard_pm = 3*10000 div (4+4-3) = 6000
    val out = TextAnalysis.cooccurrence(docs, "doc_id", "text",
        minDf = 2, topK = 10)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(out === Array(("x", "y", 3L, 4L, 4L, 6000L)))
  }

  test("cooccurrence: repeated tokens in one doc count once") {
    val docs = Seq((1L, "a a b b"), (2L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.cooccurrence(docs, "doc_id", "text",
        minDf = 1, topK = 10)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(out === Array(("a", "b", 2L, 2L, 2L, 10000L)))
  }

  test("tokenDrift: minTotal floors out hapax noise") {
    val a = Seq((1L, "w w w once")).toDF("id", "text")
    val b = Seq((2L, "w w")).toDF("id", "text")
    val out = TextAnalysis.tokenDrift(a, b, "text", minTotal = 2, topK = 10)
      .as[(String, Long, Long, Double)].collect()
    assert(!out.exists(_._1 == "once"))
  }

  test("readability: hand-counted words, sentences, syllables, Flesch score") {
    val docs = Seq(
      // 5 words; "Dr.!" and final "?" → 2 sentence runs; syllables:
      // the(1) cat(1) sat(1) dr(0→min 1) again(2: a-ai) = 6
      (1L, "The cat sat Dr.! again?"),
      // unpunctuated → 1 sentence; hello(2) world(1) = 3 syllables
      (2L, "hello world"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Long, Long)].collect()
    // doc1: 2068350 − (10150·5) div 2 − (846000·6) div 5
    //     = 2068350 − 25375 − 1015200 = 1027775
    assert(out(0) === ((1L, 5L, 2L, 6L, 1027775L)))
    // doc2: 2068350 − 10150·2 − (846000·3) div 2 = 2068350 − 20300 − 1269000
    assert(out(1) === ((2L, 2L, 1L, 3L, 779050L)))
    // empty doc: no penalty terms by contract
    assert(out(2) === ((3L, 0L, 1L, 0L, 2068350L)))
  }

  test("multimodal curation: an AUDIO-dup twin drops through Curate's keep-list") {
    import graft.operators.{Curate, Multimodal}
    // docs 1 and 8193 have DIFFERENT texts but IDENTICAL pattern
    // waveforms (8193 ≡ 1 mod 8192, the generator's amplitude wrap):
    // text-only dedup keeps both, the audio keep-list drops the
    // higher id. doc 2's waveform is unique, so it survives
    val filler = Seq.fill(4)("the and data word line part").mkString(" ")
    val docs = Seq(
      (1L, s"alpha $filler"), (2L, s"beta $filler"), (8193L, s"gamma $filler"))
      .toDF("doc_id", "text")
    val media = Multimodal.attachPatternAudio(docs, "doc_id")
    val hashes = Multimodal.audioHashMedia(media)
    val keep = Multimodal.audioKeepIds(hashes)
    // the single-pass keep-ids equal the keepList's kept rows
    assert(keep.as[Long].collect().toSet ===
      Multimodal.audioKeepList(hashes).filter(col("keep"))
        .select("id").as[Long].collect().toSet)
    val curated = Curate(docs, "doc_id", "text", nearDupKeep = Some(keep))
      .select("doc_id").as[Long].collect().toSet
    assert(curated === Set(1L, 2L),
      s"doc 8193's audio duplicates doc 1's waveform and must drop: $curated")
    // without the audio keep-list all three survive (texts differ)
    assert(Curate(docs, "doc_id", "text").select("doc_id")
      .as[Long].collect().toSet === Set(1L, 2L, 8193L))
  }

  test("multimodal curation: an image-dup twin drops through Curate's keep-list") {
    import graft.operators.{Curate, Multimodal}
    // docs 1 and 257 have DIFFERENT long texts but IDENTICAL pattern
    // rasters (257 ≡ 1 mod 256): text-only dedup keeps both, the media
    // keep-list drops the higher id
    // filler passes the quality gate: >= 10 tokens, mean length in
    // [3, 10], stopwords present, no punctuation
    val filler = Seq.fill(4)("the and data word line part").mkString(" ")
    val docs = Seq(
      (1L, s"alpha $filler"), (2L, s"beta $filler"), (257L, s"gamma $filler"))
      .toDF("doc_id", "text")
    val media = Multimodal.attachPatternMedia(docs, "doc_id")
    val hashes = Multimodal.dhashMedia(media)
    val keep = Multimodal.dhashKeepIds(hashes)
    assert(keep.as[Long].collect().toSet ===
      Multimodal.dhashKeepList(hashes).filter(col("keep"))
        .select("id").as[Long].collect().toSet)
    val curated = Curate(docs, "doc_id", "text", nearDupKeep = Some(keep))
      .select("doc_id").as[Long].collect().toSet
    assert(curated === Set(1L, 2L),
      s"doc 257's image duplicates doc 1's raster and must drop: $curated")
    // without the media keep-list all three survive (texts differ)
    assert(Curate(docs, "doc_id", "text").select("doc_id")
      .as[Long].collect().toSet === Set(1L, 2L, 257L))
  }

  test("bpeMerges: deterministic merge order, frequency weighting, " +
      "left-to-right non-overlapping application, pair exhaustion") {
    // "aa"×2 + "aaa"×1 + "ab"×1: round 1 counts 'a a' = 2·1 (from aa)
    // + 1·2 (TWO occurrences inside aaa) = 4, beating 'a b' = 1.
    // Applying it left-to-right: "a a a" -> "aa a" (greedy, no
    // overlap), "a a" -> "aa". Round 2: 'a b'=1 vs 'aa a'=1 — the
    // lexicographic tie-break picks 'a b'. Round 3: 'aa a' merges.
    // Round 4 finds nothing: fewer rows than rounds.
    val docs = Seq((1L, "aa aa. aaa! ab"), (2L, "")).toDF("doc_id", "text")
    val (merges, words) =
      TextAnalysis.bpeMerges(docs, "text", rounds = 4)
    assert(merges == Seq((1, "a a", 4L), (2, "a b", 1L), (3, "aa a", 1L)),
      s"merge table drifted: $merges")
    val syms = words.orderBy("sym").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(syms == Seq((" aa ", 2L), (" aaa ", 1L), (" ab ", 1L)),
      s"final symbols drifted: $syms")
    // case folding + non-letter splitting: "Low-Low" = two 'low' words
    val (m2, _) = TextAnalysis.bpeMerges(
      Seq((1L, "Low-Low lo")).toDF("doc_id", "text"), "text", rounds = 1)
    assert(m2 == Seq((1, "l o", 3L)), s"fold/split drifted: $m2")
  }

  test("vocabGrowth: first-seen accounting at quantile checkpoints") {
    // firsts: a→1, b→1, c→2, d→4 → nf = d1:2, d2:1, d3:0, d4:1
    // 2 buckets: median boundary 2.5 → (2 docs, vocab 3); end → (4, 4)
    val docs = Seq(
      (1L, "a b"), (2L, "b c"), (3L, "a"), (4L, "d")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowth(docs, "doc_id", "text", buckets = 2)
      .orderBy("bucket").as[(Long, Long, Long)].collect()
    assert(out === Array((1L, 2L, 3L), (2L, 4L, 4L)))
  }

  test("sourceSimilarity: exact vocabulary Jaccard, disjoint pairs absent") {
    val docs = Seq(
      (1L, "a b c", "s1"), (2L, "c a", "s1"),   // s1 vocab {a,b,c}
      (3L, "b c d", "s2"),                      // s2 vocab {b,c,d} → i=2, u=4
      (4L, "x", "s3")                           // disjoint → no row
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceSimilarity(docs, "text", "source")
      .orderBy("source_a", "source_b")
      .as[(String, String, Long, Long)].collect()
    assert(out === Array(("s1", "s2", 2L, 5000L)))
  }

  test("sourceScorecard: global dup exposure, gate rate, majority-lang ties") {
    val docs = Seq(
      (1L, "a b c", "en", "s1"),  // dup class of 3 — crosses sources
      (2L, "a b c", "en", "s1"),
      (3L, "x y", "de", "s1"),    // below the 3-token gate
      (4L, "a b c", "fr", "s2"),  // the cross-source copy counts here too
      (5L, "p q r s", "en", "s3"),
      (6L, "t u v w", "de", "s3") // lang tie 1-1 → smallest code wins
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.sourceScorecard(docs, "doc_id", "text",
        "source", "lang", minTokens = 3L)
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long, Long, String)].collect()
    assert(out === Array(
      ("s1", 3L, 8L, 26666L, 6666L, 6666L, 2L, "en"),
      ("s2", 1L, 3L, 30000L, 10000L, 10000L, 1L, "fr"),
      ("s3", 2L, 8L, 40000L, 0L, 10000L, 2L, "de")))
  }

  test("blocklistSummary: phrase precedence, argmax ties, block verdict") {
    val docs = Seq(
      // "small table" must be consumed as the PHRASE (longest-first
      // alternation), leaving one standalone "small": 3 hits, 2 terms
      (1L, "small table near a small slow thing"),
      // tie dup=1 slow=1 → smallest term wins the argmax
      (2L, "slow dup"),
      // 3 hits of one term → blocked at blockAt=3
      (3L, "dup dup dup"),
      // word-boundary: "smallish"/"dupe" must NOT match
      (4L, "smallish dupe slowly"),
      (5L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.blocklistSummary(docs, "doc_id", "text",
        Seq("small table", "hash join", "small", "slow", "dup"), blockAt = 3L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Option[String], Long, Boolean)].collect()
    assert(out === Array(
      // three terms at 1 each → first in ascending term order with the
      // max is 'slow' (dup/hash join are 0)
      (1L, 3L, 3L, Some("slow"), 1L, true),
      (2L, 2L, 2L, Some("dup"), 1L, false),
      (3L, 3L, 1L, Some("dup"), 3L, true),
      (4L, 0L, 0L, None, 0L, false),
      (5L, 0L, 0L, None, 0L, false)))
  }

  test("lmLowFlags rejects relPpm outside [0, 10^6]: beyond the documented " +
      "ppm domain the int64 gate product would overflow and silently invert " +
      "the verdict (r14 advice #4)") {
    import graft.operators.Curate
    val docs = Seq((1L, "the quick brown fox", "a")).toDF("doc_id", "text", "src")
    intercept[IllegalArgumentException](
      Curate.lmLowFlags(docs, "doc_id", "text", "src", -1L))
    intercept[IllegalArgumentException](
      Curate.lmLowFlags(docs, "doc_id", "text", "src", 1000001L))
    intercept[IllegalArgumentException](
      Curate.lmLowFlags(docs, "doc_id", "text", "src", 9300000000000L))
    // the boundary itself (100% of the source mean) is in-domain
    assert(Curate.lmLowFlags(docs, "doc_id", "text", "src", 1000000L)
      .columns.toSeq == Seq("doc_id", "lm_low"))
  }

  test("vocabCoverage: per-source occurrence and type coverage under the " +
      "global top-K vocab, exact ppm, hand-counted") {
    // global counts: the×3, cat×2, dog×2, emu×1, fox×1 → top-3 vocab
    // (count desc, token asc) = {the, cat, dog}
    val docs = Seq(
      (1L, "the cat the dog", "a"), // a: 4 occ, 4 in-vocab
      (2L, "the cat", "a"),         // a: +2 occ, +2 in-vocab
      (3L, "dog emu fox", "b"),     // b: 3 occ, 1 in-vocab (dog)
      (4L, "   ", "c")              // empty: contributes nothing
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.vocabCoverage(docs, "doc_id", "text", "source",
        topK = 3)
      .orderBy("source")
      .select("source", "n_occurrences", "n_covered", "n_types",
        "n_types_covered", "coverage_ppm", "type_coverage_ppm")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    // a: occurrences the,cat,the,dog,the,cat = 6, all in vocab;
    //    types {the, cat, dog} = 3, all covered
    assert(out(0) == ("a", 6L, 6L, 3L, 3L, 1000000L, 1000000L))
    // b: 3 occurrences, dog covered → 333333 ppm; types {dog, emu,
    //    fox} → 1 of 3 covered
    assert(out(1) == ("b", 3L, 1L, 3L, 1L, 333333L, 333333L))
    // c (all-empty docs) is absent: no token evidence either way
    assert(out.length == 2)
  }

  test("tokenizerFertility: hand-counted BPE/whitespace/char ratios per " +
      "(lang, source); punctuation-heavy text reads higher fertility") {
    val docs = Seq(
      // "ab cd." → ws 2; bpe: "ab"," cd","." → 3; chars 6
      (1L, "ab cd.", "en", "a"),
      // "x1!" → ws 1; bpe: "x","1","!" → 3; chars 3
      (2L, "x1!", "en", "a"),
      // plain words: "aa bb" → ws 2; bpe 2; chars 5
      (3L, "aa bb", "fr", "a"),
      (4L, "", "fr", "a") // empty: 0/0/0 but still counted as a doc
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.tokenizerFertility(docs, "text", "lang", "source")
      .orderBy("lang", "source")
      .as[(String, String, Long, Long, Long, Long, Long, Long)].collect()
    assert(out === Array(
      // en/a: 2 docs, ws 3, bpe 6, chars 9 → 6000/9=666, 6e6/3=2000000
      ("en", "a", 2L, 3L, 6L, 9L, 666L, 2000000L),
      // fr/a: 2 docs, ws 2, bpe 2, chars 5 → 2000/5=400, 1000000
      ("fr", "a", 2L, 2L, 2L, 5L, 400L, 1000000L)))
  }

  test("lmTiers: per-language head/middle/tail by fluency rank, ntile depth " +
      "semantics, short docs absent, deterministic tie order") {
    // train slice: "a b" bigram seen twice, "a c" once → vocabulary {a,b,c}
    val train = Seq((100L, "a b a b"), (101L, "a c")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b a b a b", "en"), // every bigram high-prob → best en score
      (2L, "a c a c", "en"),     // mixes seen-once bigrams → middle (305555)
      (3L, "a z a z", "en"),     // head word into junk: (a,z) divides by
                                 // c1(a)+V → 222221, BELOW the uniform
                                 // unseen score 333333 → tail
      (4L, "a b", "fr"),         // fr: 2 docs over 3 tiers → no middle
      (5L, "z q", "fr"),
      (6L, "solo", "fr")         // 1 token → no bigram → absent
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.lmTiers(train, docs, "doc_id", "text", "lang")
      .orderBy("doc_id")
      .as[(Long, String, Long, Long, Long, String)].collect()
    assert(out.map(r => (r._1, r._2, r._5, r._6)) === Array(
      (1L, "en", 1L, "head"),
      (2L, "en", 2L, "middle"),
      (3L, "en", 3L, "tail"),
      (4L, "fr", 1L, "head"),
      (5L, "fr", 2L, "middle") // ntile(3) over 2 rows fills buckets 1,2
    ))
    // scores are the q107 integer contract and strictly ordered here
    val en = out.filter(_._2 == "en").map(_._4)
    assert(en(0) > en(1) && en(1) > en(2), en.toSeq.toString)
    intercept[IllegalArgumentException](
      TextAnalysis.lmTiers(train, docs, "doc_id", "text", "lang", tiers = 1))
  }

  test("word_kgrams: strict k-grams equal the column composition over " +
      "tokens(); short/empty/whitespace docs yield EMPTY (r17 pair emitter)") {
    // the r17 bigram emitter's contract: exactly the n−k+1 space-joined
    // k-grams for n ≥ k tokens, [] otherwise — the strict twin of
    // word_shingles (which emits the whole run as one short shingle)
    val texts = Seq("", "   ", "solo", "a b", " a  b\tc ", "x y z w",
      "héllo wörld déjà", "a a a")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for (k <- Seq(1, 2, 3)) {
      val toks = TextAnalysis.tokens(col("text"))
      val reference = when(size(toks) < k, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), greatest(size(toks) - (k - 1), lit(1))),
          i => concat_ws(" ", slice(toks, i, lit(k)))))
      val got = df.select(col("id"),
          graft.functions.WordShinglesExpression.word_kgrams(col("text"), k).as("g"))
        .orderBy("id").as[(Long, Seq[String])].collect()
      val want = df.select(col("id"), reference.as("g"))
        .orderBy("id").as[(Long, Seq[String])].collect()
      assert(got === want, s"k=$k")
    }
    // explode over the strict bigrams = the LM tier's (w1, w2) pairs
    val pairs = df.select(col("id"),
        explode(graft.functions.WordShinglesExpression.word_kgrams(
          lower(col("text")), 2)).as("g"))
      .select(col("id"), substring_index(col("g"), " ", 1).as("w1"),
        substring_index(col("g"), " ", -1).as("w2"))
      .orderBy("id", "w1", "w2").as[(Long, String, String)].collect()
    assert(pairs.toSeq === Seq((3L, "a", "b"), (4L, "a", "b"), (4L, "b", "c"),
      (5L, "x", "y"), (5L, "y", "z"), (5L, "z", "w"),
      (6L, "héllo", "wörld"), (6L, "wörld", "déjà"),
      (7L, "a", "a"), (7L, "a", "a")).sortBy(p => (p._1, p._2, p._3)))
  }

  test("gate NULL-text contract: a null document DROPS through every " +
      "gate-filtering chain (keep is null, not true — pinned r17)") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, null.asInstanceOf[String]), (3L, "")).toDF("doc_id", "text")
    val kept = docs.filter(TextAnalysis.gateKeep(col("text")))
      .select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(2L), "null text must not pass the gate")
    assert(!kept.contains(3L), "empty text must not pass the gate")
    // filterGate's frame keeps the row but with NULL stats — the audit
    // surface still answers for the doc; only keep-filters drop it
    val stats = TextAnalysis.filterGate(docs, "doc_id", "text")
    assert(stats.count() == 3)
    assert(stats.filter(col("doc_id") === 2L).select("keep").head().isNullAt(0))
  }

  test("autoSignatureBits: occupancy width is RECALL-CAPPED by the caller's " +
      "threshold (a 0.99 caller no longer inherits the 0.999 envelope)") {
    import graft.operators.Similarity.autoSignatureBits
    // near-identical regime: occupancy sizing rules, cap (26) never binds
    assert(autoSignatureBits(5100L, 0.999) == 12)
    assert(autoSignatureBits(1000000L, 0.999) == 19)
    // moderate threshold: the 10^-4 miss-probability cap binds — the
    // ADVICE scenario (n = 1e6, threshold 0.99, 8 tables) read ~1.3%
    // true-pair miss at the uncapped 19 bits; capped width is 8
    assert(autoSignatureBits(1000000L, 0.99) == 8)
    // the cap scales with the threshold, and never under the 4-bit floor
    assert(autoSignatureBits(1000000L, 0.95) == 4)
    // tiny corpora keep the floor regardless
    assert(autoSignatureBits(10L, 0.99) == 4)
  }

  test("char_trigrams: distinct code-point trigrams equal the substr " +
      "composition; short names empty (r17 q149 blocking key)") {
    val names = Seq("", "ab", "abc", "abcd", "banana", "ααβγδ", "aaaa")
    val df = names.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "name")
    // the r16 composition: one row per position, substr(i, 3), distinct
    val want = df.filter(length(col("name")) >= 3)
      .select(col("id"),
        explode(sequence(lit(1), length(col("name")) - 2)).as("i"),
        col("name"))
      .select(col("id"), col("name").substr(col("i"), lit(3)).as("tg"))
      .distinct().orderBy("id", "tg").as[(Long, String)].collect()
    val got = df.select(col("id"),
        explode(graft.functions.CharTrigramsExpression
          .char_trigrams(col("name"))).as("tg"))
      .orderBy("id", "tg").as[(Long, String)].collect()
    assert(got === want)
    // distinctness within a row: "aaaa" has one distinct trigram
    assert(got.count(_._1 == 6L) == 1)
  }

  test("token_counts: per-doc term frequencies equal the explode+groupBy " +
      "wordcount; empty/whitespace docs emit nothing (r17 q105 head)") {
    val docs = Seq((1L, "a b a  c b a"), (2L, ""), (3L, "   "),
      (4L, "x"), (5L, "Héllo héllo HÉLLO")).toDF("doc_id", "text")
    val want = docs.select(col("doc_id"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .orderBy("doc_id", "term").as[(Long, String, Long)].collect()
    val got = docs.select(col("doc_id"),
        explode(graft.functions.TokenCountsExpression
          .token_counts(lower(col("text")))).as("tc"))
      .select(col("doc_id"), col("tc.term"), col("tc.tf"))
      .orderBy("doc_id", "term").as[(Long, String, Long)].collect()
    assert(got === want)
    assert(got.exists(r => r._1 == 1L && r._2 == "a" && r._3 == 3L))
  }
}
