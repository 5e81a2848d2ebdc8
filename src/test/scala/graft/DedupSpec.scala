package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Specs for the non-SQL-expressible pipeline operators (the driver
  * only rows-checks these): MinHash/LSH near-dup, SimHash, ANN.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docsWithPlants = {
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    // plant two near-duplicates of doc 0 and one exact duplicate
    val d0 = base.filter($"doc_id" === 0).head().getString(1)
    val planted = Seq(
      (100000L, d0),                             // exact dup
      (100001L, d0 + " extra tail words here"),  // near dup
      (100002L, "completely unrelated tiny doc") // unrelated
    ).toDF("doc_id", "text")
    base.union(planted)
  }

  test("exact dedup groups catch the planted duplicate") {
    val groups = Dedup.exactDupGroups(docsWithPlants, "text", "doc_id")
      .filter($"n_docs" > 1).collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("n_docs") == 2)
    assert(groups.head.getAs[Long]("keep_id") == 0L)
  }

  test("minhash LSH finds planted near-dups and skips unrelated docs") {
    val dups = Dedup.minhashNearDups(docsWithPlants, "doc_id", "text",
      k = 3, numHashes = 12, bands = 4, threshold = 0.5)
    val pairs = dups.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 100000L)), s"exact dup pair missing from $pairs")
    assert(pairs.contains((0L, 100001L)), s"near dup pair missing from $pairs")
    assert(!pairs.exists(p => p._1 == 100002L || p._2 == 100002L))
  }

  test("minhash jaccard of exact dup is 1.0") {
    val j = Dedup.minhashNearDups(docsWithPlants, "doc_id", "text")
      .filter($"id_a" === 0 && $"id_b" === 100000L)
      .select("jaccard").as[Double].head()
    assert(j == 1.0)
  }

  test("simhash: identical texts equal, near texts close in hamming") {
    val df = docsWithPlants.select($"doc_id", Dedup.simhash64($"text").as("sh"))
    val m = df.as[(Long, Long)].collect().toMap
    assert(m(0L) == m(100000L))
    assert(java.lang.Long.bitCount(m(0L) ^ m(100001L)) <= 12,
      "near-dup simhash should be within 12 bits")
    assert(java.lang.Long.bitCount(m(0L) ^ m(100002L)) > 12,
      "unrelated doc simhash should be far")
  }

  test("simhash is deterministic across runs") {
    val a = docsWithPlants.select(Dedup.simhash64($"text")).as[Long].collect()
    val b = docsWithPlants.select(Dedup.simhash64($"text")).as[Long].collect()
    assert(a.sameElements(b))
  }

  test("brute-force cosine topk: self-similarity is 1 for identical vector") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0).map(_.toDouble)
    val top = Similarity.bruteForceTopK(emb, "embedding", "vec_id", q, 1).collect()
    assert(top.head.getAs[Long]("id") == 0L)
    assert(math.abs(top.head.getAs[Double]("cos_sim") - 1.0) < 1e-9)
  }

  test("ann lsh topk is a subset of brute-force ranking universe") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0).map(_.toDouble)
    val ann = Similarity.annTopK(emb, "embedding", "vec_id", q, k = 10, nBits = 4)
      .select("id").as[Long].collect().toSet
    assert(ann.contains(0L), "query vector's own id must be in its LSH bucket")
    val brute = Similarity.bruteForceTopK(emb, "embedding", "vec_id", q, 500)
      .select("id").as[Long].collect().toSet
    assert(ann.subsetOf(brute + 0L))
  }

  test("ivf ann: clusters partition the corpus, probes recall the true topk") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val centroids = Similarity.ivfTrain(emb, "embedding", "vec_id", k = 8, iterations = 2)
    assert(centroids.size == 8 && centroids.forall(_.size == 64))
    val assigned = Similarity.ivfAssign(emb, "embedding", centroids).localCheckpoint(true)
    // every vector lands in exactly one cluster
    assert(assigned.count() == emb.count())
    assert(assigned.select("ivf_cluster").distinct().count() > 1)
    val q = emb.filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0).map(_.toDouble)
    val ivf = Similarity.ivfTopK(assigned, "embedding", "vec_id", centroids, q, k = 10, nProbe = 4)
      .select("id").as[Long].collect()
    val brute = Similarity.bruteForceTopK(emb, "embedding", "vec_id", q, 10)
      .select("id").as[Long].collect()
    // probing half the cells recalls most of the true top-10
    val recall = ivf.toSet.intersect(brute.toSet).size
    assert(recall >= 6, s"ivf recall too low: $recall/10 (ivf=${ivf.toList} brute=${brute.toList})")
    // determinism
    val again = Similarity.ivfTrain(emb, "embedding", "vec_id", k = 8, iterations = 2)
    assert(again == centroids)
  }

  test("language id picks the language with most markers") {
    val df = Seq(
      (1L, "the cat and the dog of the house is big"),
      (2L, "der hund und das haus ist gross"),
      (3L, "el gato la casa que es grande"),
      (4L, "xyzzy plugh")).toDF("id", "text")
    val got = df.select($"id", TextAnalysis.langId($"text").as("l")).as[(Long, String)].collect().toMap
    assert(got(1L) == "en"); assert(got(2L) == "de")
    assert(got(3L) == "es"); assert(got(4L) == "und")
  }

  test("cosineNearDups finds planted near-dup embeddings, no false positives") {
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding")
    // plant: an exact copy of vec 0 and a lightly-perturbed copy
    val v0 = base.filter($"vec_id" === 0).head().getSeq[Float](1)
    val near = v0.zipWithIndex.map { case (x, i) => x + (if (i % 7 == 0) 0.01f else -0.005f) }
    val planted = Seq((900000L, v0), (900001L, near))
      .toDF("vec_id", "embedding")
    val all = base.union(planted)
    val pairs = graft.operators.Similarity
      .cosineNearDups(all, "vec_id", "embedding", threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 900000L)), s"exact-copy pair missing from $pairs")
    assert(pairs.contains((0L, 900001L)), s"perturbed pair missing from $pairs")
    assert(pairs.contains((900000L, 900001L)))
    // the corpus itself has no pairs at 0.9 (max pairwise cosine ~0.51)
    assert(pairs.size == 3, s"unexpected extra pairs: $pairs")
  }

  test("similarity operators handle empty input") {
    val empty = spark.read.parquet(s"$sf/embeddings.parquet").filter(col("vec_id") < 0)
    assert(graft.operators.Similarity
      .cosineNearDups(empty, "vec_id", "embedding").count() == 0)
    intercept[IllegalArgumentException] {
      graft.operators.Similarity.ivfTrain(empty, "embedding", "vec_id", k = 4)
    }
  }

  test("blockedEditDistancePairs: matches within blocks only, threshold enforced") {
    import spark.implicits._
    val people = Seq(
      (1L, "anna", "X"), (2L, "anne", "X"),  // dist 1, same block → pair
      (3L, "anna", "Y"),                     // identical to 1 but other block → NOT a pair
      (4L, "robert", "X")                    // dist 4 from anna → over threshold
    ).toDF("id", "name", "blk")
    val out = Dedup.blockedEditDistancePairs(people, "id", "name",
        Seq("blk"), maxDist = 2)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, String, String, Long)].collect()
    assert(out === Array((1L, 2L, "anna", "anne", 1L)))
  }

  test("blockedEditDistancePairs: composite blocking key tightens candidates") {
    import spark.implicits._
    val people = Seq(
      (1L, "sam", "X", 1), (2L, "sam", "X", 1), // same on both key parts → pair, dist 0
      (3L, "sam", "X", 2)                       // differs on the second part → blocked out
    ).toDF("id", "name", "b1", "b2")
    val out = Dedup.blockedEditDistancePairs(people, "id", "name",
      Seq("b1", "b2"), maxDist = 0).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))) === Array((1L, 2L)))
  }

  test("trigramJaroWinklerPairs: rare trigrams gate candidates, jw verifies") {
    import spark.implicits._
    val people = Seq(
      (1L, "jonathan smith"), (2L, "jonathan smyth"), // near-identical
      (3L, "entirely other"),                         // no rare trigram shared
      (4L, "jonathan smitt")                          // third family member
    ).toDF("id", "name")
    val out = Dedup.trigramJaroWinklerPairs(people, "id", "name",
        maxDf = 3, minSim = 0.9)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, String, String, Double)].collect()
    assert(out.map(r => (r._1, r._2)) === Array((1L, 2L), (1L, 4L), (2L, 4L)))
    assert(out.forall(_._5 >= 0.9))
  }

  test("trigramJaroWinklerPairs: ubiquitous trigrams generate no candidates") {
    import spark.implicits._
    // every name shares every trigram -> df = 4 > maxDf = 3 -> no pairs,
    // even though the names are identical
    val people = (1L to 4L).map(i => (i, "aaaaaa")).toDF("id", "name")
    val out = Dedup.trigramJaroWinklerPairs(people, "id", "name",
      maxDf = 3, minSim = 0.5)
    assert(out.count() === 0L)
  }

  test("noveltyScores: first appearance owns the window, copies are charged") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),   // k=4 windows: "a b c d", "b c d e" — both novel
      (2L, "a b c d e"),   // exact copy → 0 novel
      (3L, "x y a b c d"), // "x y a b", "y a b c" novel; "a b c d" seen in doc 1
      (4L, "p q r"),       // shorter than k → 0 windows, pm 0
      (5L, "m m m m m m")  // repeated window counts ONCE (distinct) and is novel
    ).toDF("doc_id", "text")
    val out = Dedup.noveltyScores(docs, "doc_id", "text", k = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(out === Array(
      (1L, 2L, 2L, 10000L),
      (2L, 2L, 0L, 0L),
      (3L, 3L, 2L, 6666L), // 2*10000 div 3
      (4L, 0L, 0L, 0L),
      (5L, 1L, 1L, 10000L)))
  }

  test("noveltyScores: directionality — swapping ids swaps the charge") {
    import spark.implicits._
    val docs = Seq((10L, "a b c d"), (20L, "a b c d")).toDF("doc_id", "text")
    val out = Dedup.noveltyScores(docs, "doc_id", "text", k = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(out === Array((10L, 1L, 1L, 10000L), (20L, 1L, 0L, 0L)))
  }

  test("removeDupSpans: keep-first excision — copies lose covered tokens, " +
      "the original keeps its text, within-doc repeats owned by the doc stay") {
    import spark.implicits._
    def fp(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Seq(
      (1L, "x y z p q r"),   // owner of every window it has → untouched
      (2L, "x y z n o"),     // "x y z" recycled from doc 1 → "n o" remains
      (3L, "x y z"),         // single window, recycled → everything cut
      (4L, "a a a a"),       // within-doc repeat, doc 4 OWNS "a a a" → kept
      (5L, "q r x y z w"),   // two recycled windows? "q r x"/"r x y"/"x y z"
                             // only "x y z" (doc1) recycled → covers 3..5 → "q r w"
      (6L, ""),              // empty doc
      (7L, "y z p q r s")    // "y z p"(1),"z p q"(1),"p q r"(1) recycled →
                             // covers 1..5 → "s" remains
    ).toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(out === Array(
      (1L, 6L, 0L, 0L, fp("x y z p q r")),
      (2L, 5L, 3L, 6000L, fp("n o")),
      (3L, 3L, 3L, 10000L, fp("")),
      (4L, 4L, 0L, 0L, fp("a a a a")),
      (5L, 6L, 3L, 5000L, fp("q r w")),
      (6L, 0L, 0L, 0L, fp("")),
      (7L, 6L, 5L, 8333L, fp("s"))))
    // partitioning invariance: the digest/ownership chain is hash-based
    val re = Dedup.removeDupSpans(docs.repartition(7), "doc_id", "text", k = 3)
      .orderBy("doc_id").as[(Long, Long, Long, Long, String)].collect()
    assert(re === out)
    intercept[IllegalArgumentException](
      Dedup.removeDupSpans(docs, "doc_id", "text", k = 0))
  }

  test("contrastivePairs: cluster members pair with the min-id rep, exact " +
      "shingle jaccard rides along, singletons emit nothing, transitive " +
      "members still score their own (possibly low) rep overlap") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base),                                    // rep of the cluster
      (2L, base),                                    // exact dup → jaccard 10000
      (3L, base + " lambda mu"),                     // near dup of 1
      (9L, "totally different words only here now")  // singleton
    ).toDF("doc_id", "text")
    val out = Dedup.contrastivePairs(docs, "doc_id", "text",
        k = 3, numHashes = 24, bands = 8, threshold = 0.5)
      .orderBy("anchor_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    // doc1 tokens→8 shingles (k=3, 10 tokens); doc3 has 10 shingles;
    // shared = doc1's 8 → union 10
    assert(out === Array(
      (2L, 1L, 8L, 8L, 10000L),
      (3L, 1L, 8L, 10L, 8000L)))
  }

  test("contrastiveTriplets: hard negative = best sub-threshold NON-cluster " +
      "partner via a rare shared shingle; ties break to the lower id; " +
      "cluster-mates never serve as negatives") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"), // cluster {1,2}, rep 1
      (2L, "a b c d e f"),
      (3L, "a b c x y z"), // vs 1/2: inter {abc} of 7 → pm 1428
      (4L, "p q r s"),     // shares nothing → never a candidate
      (5L, "a b c d x y"), // cluster {5,6}; vs 1/2: inter {abc,bcd}/6 → 3333
      (6L, "a b c d x y")
    ).toDF("doc_id", "text")
    val out = Dedup.contrastiveTriplets(docs, "doc_id", "text",
        k = 3, numHashes = 24, bands = 8, threshold = 0.5)
      .orderBy("anchor_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    // anchor 2: negatives 3 (1428), 5 (3333), 6 (3333) → tie → id 5;
    // anchor 6: negatives 1 (3333), 2 (3333), 3 (1428) → tie → id 1;
    // 5 and 6 are cluster-mates so neither negatives the other
    assert(out === Array(
      (2L, 1L, 5L, 10000L, 3333L),
      (6L, 5L, 1L, 10000L, 3333L)))
    intercept[IllegalArgumentException](
      Dedup.contrastiveTriplets(docs, "doc_id", "text", maxDf = 1))
  }

  test("winnowFingerprints: guarantee — offset-shifted shared substring collides") {
    import spark.implicits._
    // the winnowing guarantee: any shared substring of length >= w+k-1
    // (= 11 at k=8, w=4) yields at least one COMMON (hash) fingerprint,
    // regardless of char offset — fixed-stride sampling fails this
    val shared = "the quick brown fox jumps"
    val docs = Seq(
      (1L, s"AAAA $shared BBBB"),
      (2L, s"zzzzzzz $shared qqq"),     // same substring, different offset
      (3L, "completely different words entirely")
    ).toDF("doc_id", "text")
    val fpCol = Dedup.winnowFingerprints(docs, "doc_id", "text", k = 8, w = 4)
    // the MOSS match step: join the fingerprint frames on the HASH —
    // docs 1 and 2 share the substring at different offsets and must
    // collide; doc 3 shares nothing and must not
    val frame = Dedup.winnowFingerprintFrame(docs, "doc_id", "text", 8, 4)
    val matches = frame.select(col("doc_id").as("id_a"), col("hv"))
      .join(frame.select(col("doc_id").as("id_b"), col("hv")), Seq("hv"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .as[(Long, Long)].collect().toSet
    assert(matches.contains((1L, 2L)), s"offset-shifted copy not caught: $matches")
    assert(!matches.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated doc matched: $matches")
    val all = Dedup.winnowFingerprints(docs, "doc_id", "text", k = 8, w = 1)
    val byDoc = fpCol.orderBy("doc_id").collect()
    assert(byDoc.forall(_.getAs[Long]("n_fp") > 0))
    // w=1 keeps every hash; winnowed is a subset, so sizes shrink
    val nAll = all.orderBy("doc_id").collect().map(_.getAs[Long]("n_fp"))
    val nWin = byDoc.map(_.getAs[Long]("n_fp"))
    assert(nWin.zip(nAll).forall { case (wn, an) => wn <= an },
      s"winnowed ${nWin.toSeq} must not exceed full ${nAll.toSeq}")
    // identical text ⇒ identical fingerprint set (md5 equality)
    val twin = Seq((7L, "AAAA one two three"), (8L, "AAAA one two three"))
      .toDF("doc_id", "text")
    val md5s = Dedup.winnowFingerprints(twin, "doc_id", "text", 8, 4)
      .select("fp_md5").as[String].collect()
    assert(md5s.distinct.length == 1)
    // short doc (< k chars): zero fingerprints, md5 of empty string
    val short = Seq((9L, "tiny")).toDF("doc_id", "text")
    val r = Dedup.winnowFingerprints(short, "doc_id", "text", 8, 4).head()
    assert(r.getAs[Long]("n_fp") == 0L
      && r.getAs[String]("fp_md5") == "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("winnowFingerprints: density is ~2/(w+1) of the k-gram hashes") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).limit(50)
    val win = Dedup.winnowFingerprints(docs, "doc_id", "text", k = 8, w = 4)
    val all = Dedup.winnowFingerprints(docs, "doc_id", "text", k = 8, w = 1)
    val (nw, na) = win.agg(sum("n_fp")).head().getLong(0) ->
      all.agg(sum("n_fp")).head().getLong(0)
    val density = nw.toDouble / na
    // theory: expected 2/(w+1) = 0.4 for random hashes; allow slack
    assert(density > 0.25 && density < 0.55, s"winnow density $density")
  }

  test("containmentForPairs: subset doc scores full containment, jaccard stays low") {
    import spark.implicits._
    val small = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, small),
      (2L, small + " eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val c = Dedup.containmentForPairs(docs, "doc_id", "text", 3, pairs).head()
    assert(c.getAs[Long]("containment_pm") == 10000L,
      s"subset doc must be fully contained: $c")
    val j = Dedup.jaccardForPairs(docs, "doc_id", "text", 3, pairs)
      .head().getAs[Double]("jaccard")
    assert(j < 0.35, s"symmetric jaccard should be low for the subset pair: $j")
    // asymmetry: the big doc is NOT contained in the small one
    val rev = Dedup.containmentForPairs(docs, "doc_id", "text", 3,
      Seq((2L, 1L)).toDF("id_a", "id_b")).head()
    assert(rev.getAs[Long]("containment_pm") < 3000L, s"reverse containment: $rev")
  }
}
