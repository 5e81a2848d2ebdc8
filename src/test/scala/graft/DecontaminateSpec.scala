package graft

import org.apache.spark.sql.functions._

import graft.operators.{Decontaminate, Dedup, TextAnalysis}

/** Decontamination + repetition-filter contracts on a hand-built
  * corpus where the expected overlaps are computable by eye.
  */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // 6-token docs → 5-grams are (w1..w5, w2..w6): 2 per doc
  private lazy val train = Seq(
    (1L, "a b c d e f"), // shares 5-gram "b c d e f" with eval doc 10
    (2L, "a a a a a a"), // repeated token, no eval overlap
    (3L, "p q r s t u")  // disjoint from eval
  ).toDF("doc_id", "text")
  private lazy val eval_ = Seq(
    (10L, "b c d e f g")
  ).toDF("doc_id", "text")

  test("evalOverlap counts shared distinct n-grams and flags at pct") {
    val out = Decontaminate.evalOverlap(train, eval_, "doc_id", "text",
      n = 5, flagAtPct = 20).orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out === Array(
      (1L, 2L, 1L, true),   // 1/2 grams hit ≥ 20%
      (2L, 1L, 0L, false),  // "a a a a a" ≠ any eval gram (distinct → 1 gram)
      (3L, 2L, 0L, false)))
  }

  test("evalOverlap is caseless and stable under repartitioning") {
    val shouty = train.withColumn("text", upper($"text"))
    val a = Decontaminate.evalOverlap(shouty, eval_, "doc_id", "text", n = 5)
    val b = Decontaminate.evalOverlap(train.repartition(7), eval_, "doc_id", "text", n = 5)
    assert(a.orderBy("doc_id").collect() === b.orderBy("doc_id").collect())
  }

  test("short docs act as a single whole-run n-gram") {
    val shortTrain = Seq((7L, "b c d")).toDF("doc_id", "text")
    val shortEval = Seq((8L, "b c d")).toDF("doc_id", "text")
    val hit = Decontaminate.evalOverlap(shortTrain, shortEval, "doc_id", "text", n = 5)
      .as[(Long, Long, Long, Boolean)].head()
    assert(hit === ((7L, 1L, 1L, true)))
  }

  test("bloom-prefiltered overlap is bit-identical to the broadcast path") {
    val a = Decontaminate.evalOverlap(train, eval_, "doc_id", "text",
      n = 5, flagAtPct = 20).orderBy("doc_id").collect()
    val b = Decontaminate.evalOverlapBloom(train, eval_, "doc_id", "text",
      n = 5, flagAtPct = 20).orderBy("doc_id").collect()
    assert(a === b)
    // and on the real table, against the real split shape
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val half = docs.filter($"doc_id" % 3 === 0)
    val x = Decontaminate.evalOverlap(docs, half, "doc_id", "text", n = 5)
      .orderBy("doc_id").collect()
    val y = Decontaminate.evalOverlapBloom(docs, half, "doc_id", "text", n = 5)
      .orderBy("doc_id").collect()
    assert(x === y)
  }

  test("evalOverlapBySet broadcastEval=false is bit-identical to the " +
      "broadcast path and its plan carries no BroadcastHashJoin on the " +
      "gram probe (r15 advice #2: the escape hatch for corpus-sized evals)") {
    val evalSets = eval_.union(Seq((11L, "p q r s t u")).toDF("doc_id", "text"))
      .withColumn("eval_set",
        when($"doc_id" === 10L, "gsm").otherwise("code"))
    val a = Decontaminate.evalOverlapBySet(train, evalSets, "doc_id", "text",
      "eval_set", n = 5, flagAtPct = 20).orderBy("doc_id", "eval_set").collect()
    val b = Decontaminate.evalOverlapBySet(train, evalSets, "doc_id", "text",
      "eval_set", n = 5, flagAtPct = 20, broadcastEval = false)
      .orderBy("doc_id", "eval_set").collect()
    assert(a === b)
    assert(a.nonEmpty)
    // the hatch must actually disengage the broadcast hint: with AQE off
    // and the auto-broadcast threshold disabled, the non-broadcast plan's
    // gram-probe join is shuffle-based
    val conf = spark.conf
    val prevThresh = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.enabled", "false")
      val plan = Decontaminate.evalOverlapBySet(train, evalSets, "doc_id",
        "text", "eval_set", n = 5, broadcastEval = false)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"broadcastEval=false must not hint a broadcast, plan:\n$plan")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
    // contaminationBySource threads the hatch through
    val srcTrain = train.withColumn("source", lit("crawl"))
    val s1 = Decontaminate.contaminationBySource(srcTrain, evalSets, "doc_id",
      "text", "source", "eval_set", n = 5, flagAtPct = 20)
      .orderBy("source", "eval_set").collect()
    val s2 = Decontaminate.contaminationBySource(srcTrain, evalSets, "doc_id",
      "text", "source", "eval_set", n = 5, flagAtPct = 20,
      broadcastEval = false).orderBy("source", "eval_set").collect()
    assert(s1 === s2)
  }

  test("bloom path: empty eval corpus yields zero hits, not a crash") {
    val out = Decontaminate.evalOverlapBloom(train, eval_.limit(0),
      "doc_id", "text", n = 5, flagAtPct = 20).orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out === Array((1L, 2L, 0L, false), (2L, 1L, 0L, false), (3L, 2L, 0L, false)))
  }

  test("fuzzyEvalOverlap flags near-duplicates of eval docs, not just exact overlap") {
    val ftrain = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // exact twin of eval 10
      (2L, "completely different words appearing here entirely now"),
      (3L, "the quick brown fox jumps over the lazy cat")  // 1 token off: j = 6/8
    ).toDF("doc_id", "text")
    val feval = Seq((10L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val out = Decontaminate.fuzzyEvalOverlap(ftrain, feval, "doc_id", "text",
        k = 3, numHashes = 24, bands = 8, threshold = 0.5)
      .orderBy("doc_id").as[(Long, Long, Double, Boolean)].collect()
    assert(out === Array(
      (1L, 1L, 1.0, true),
      (2L, 0L, 0.0, false),
      (3L, 1L, 0.75, true))) // "the lazy cat" is the only differing shingle
  }

  test("fuzzyEvalOverlap over prebuilt signature frames matches the text path") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val trainD = docs.filter($"doc_id" % 3 =!= 0)
    val evalD = docs.filter($"doc_id" % 3 === 0)
    val a = Decontaminate.fuzzyEvalOverlap(trainD, evalD, "doc_id", "text")
      .orderBy("doc_id").collect()
    val b = Decontaminate.fuzzyEvalOverlapSigs(
        Dedup.signatureFrame(trainD, "doc_id", "text", 3, 24),
        Dedup.signatureFrame(evalD, "doc_id", "text", 3, 24),
        "doc_id", numHashes = 24, bands = 8, threshold = 0.5)
      .orderBy("doc_id").collect()
    assert(a === b)
    // every train doc appears in the report, flagged or not
    assert(a.length === trainD.count())
  }

  test("repetitionMetrics: exact per-myriad integers") {
    val docs = Seq(
      (1L, "x x x x"),     // 4 tokens, 1 distinct; bigrams: 3×"x x" → 1 distinct
      (2L, "a b c d")      // all distinct
    ).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "dup_token_pm", "top_token_pm", "dup_bigram_pm", "flagged")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    // doc 1: dup = (4-1)*10000 div 4 = 7500; top = 4*10000 div 4 = 10000;
    //        bigram dup = (3-1)*10000 div 3 = 6666
    assert(m(0) === ((1L, 4L, 7500L, 10000L, 6666L, true)))
    // doc 2: no repetition anywhere; top token frac = 1/4
    assert(m(1) === ((2L, 4L, 0L, 2500L, 0L, false)))
  }

  test("repetitionMetrics keeps empty documents in the report") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "a b")).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "dup_token_pm", "top_token_pm", "dup_bigram_pm", "flagged")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(m.length == 3)
    assert(m(0) === ((1L, 0L, 0L, 0L, 0L, false)))
    assert(m(1) === ((2L, 0L, 0L, 0L, 0L, false)))
    assert(m(2) === ((3L, 2L, 0L, 5000L, 0L, false)))
  }
}
