package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Deterministic hash sampling/splitting contracts. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = spark.range(0, 20000).toDF("id")

  test("buckets are stable, uniform-ish, and partitioning-independent") {
    val a = ids.select($"id", Sampling.hashBucket($"id", 100).as("b"))
    val b = ids.repartition(13).select($"id", Sampling.hashBucket($"id", 100).as("b"))
    assert(a.except(b).isEmpty && b.except(a).isEmpty) // pure function of the key
    val counts = a.groupBy("b").count().select("count").as[Long].collect()
    assert(counts.length == 100)
    assert(counts.min > 100 && counts.max < 300) // ~200 ± sampling noise
  }

  test("hashSample keeps ~fraction and is a subset under growth") {
    val s = Sampling.hashSample(ids, $"id", 0.1)
    val n = s.count()
    assert(n > 1600 && n < 2400)
    // appending new rows never reshuffles old assignments
    val grown = Sampling.hashSample(spark.range(0, 40000).toDF("id"), $"id", 0.1)
    assert(s.except(grown).isEmpty)
  }

  test("hashSplit is disjoint, exhaustive, and weight-proportional") {
    val split = ids.select($"id",
      Sampling.hashSplit($"id", Seq("train" -> 0.8, "val" -> 0.1), rest = "test").as("s"))
    val byLabel = split.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(byLabel.values.sum == 20000) // exhaustive, one label per row
    assert(byLabel("train") > 15000 && byLabel("val") < 3000)
    intercept[IllegalArgumentException] {
      Sampling.hashSplit($"id", Seq("a" -> 0.9, "b" -> 0.2))
    }
  }

  test("quotaCap: per-group caps bind, under-quota groups pass whole, growth is local") {
    val rows = spark.range(0, 300)
      .select($"id", (($"id" % 3).cast("string")).as("grp"))
      .filter($"grp" =!= "2" || $"id" < 30) // group 2 stays under quota
    val capped = Sampling.quotaCap(rows, Seq($"grp"), $"id", quota = 20)
    val sizes = capped.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(sizes("0") == 20 && sizes("1") == 20)
    assert(sizes("2") == rows.filter($"grp" === "2").count()) // 10 < quota
    // determinism: partitioning-independent
    val capped13 = Sampling.quotaCap(rows.repartition(13), Seq($"grp"), $"id", 20)
    assert(capped.except(capped13).isEmpty && capped13.except(capped).isEmpty)
    // growing ONE group never disturbs another group's kept set
    val grown = rows.unionByName(spark.range(1000, 1200)
      .select($"id", lit("1").as("grp")))
    val cappedGrown = Sampling.quotaCap(grown, Seq($"grp"), $"id", 20)
    assert(capped.filter($"grp" === "0")
      .except(cappedGrown.filter($"grp" === "0")).isEmpty)
  }

  test("epochMix: whole+fractional epochs, drop, default, determinism") {
    val rows = spark.range(0, 400)
      .select($"id", concat(lit("s"), $"id" % 4).as("src"))
    val mixed = Sampling.epochMix(rows, $"src", $"id",
      Map("s0" -> 2.5, "s1" -> 3.0, "s2" -> 0.0), default = 1.0)
    val byCopy = mixed.groupBy("src", "id").count()
      .groupBy("src").agg(min($"count").as("lo"), max($"count").as("hi"),
        sum($"count").as("total")).as[(String, Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // s0: every doc 2 or 3 times, total strictly between 2n and 3n
    assert(byCopy("s0")._1 == 2 && byCopy("s0")._2 == 3)
    assert(byCopy("s0")._3 > 200 && byCopy("s0")._3 < 300)
    // s1: exactly 3 copies each
    assert(byCopy("s1") == ((3L, 3L, 300L)))
    // s2 dropped entirely
    assert(!byCopy.contains("s2"))
    // default source: one copy each
    assert(byCopy("s3") == ((1L, 1L, 100L)))
    // copy_idx is dense 0..copies-1 per doc
    assert(mixed.filter($"src" === "s1").groupBy("id")
      .agg(sort_array(collect_list($"copy_idx")).as("idxs"))
      .filter($"idxs" =!= array(lit(0L), lit(1L), lit(2L))).isEmpty)
    // partitioning-independent
    val mixed7 = Sampling.epochMix(rows.repartition(7), $"src", $"id",
      Map("s0" -> 2.5, "s1" -> 3.0, "s2" -> 0.0), default = 1.0)
    assert(mixed.except(mixed7).isEmpty && mixed7.except(mixed).isEmpty)
  }

  test("budgetPlan: clamp, partial keep, absent source, deterministic realization") {
    // src a: plenty of tokens (partial keep); src b: too few (deficit,
    // keep-all); src c: named but absent (reported hole). Tokens are
    // per-doc so the realized sums are hand-checkable via the gate.
    val docs = (0L until 100L).map(i => (i, "a", 10L)) ++
      Seq((1000L, "b", 5L), (1001L, "b", 7L))
    val df = docs.toDF("id", "src", "toks")
    val out = Sampling.budgetPlan(df, $"src", $"id", $"toks",
        Seq("a" -> 400000L, "b" -> 400000L, "c" -> 200000L),
        budgetTokens = 1000L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))).toSeq
    // a: avail 100 docs / 1000 toks, target 400 -> keep_ppm 400000
    val a = out(0)
    assert((a._1, a._2, a._3, a._4, a._5, a._6) ===
      ("a" , 100L, 1000L, 400L, 400000L, 0L))
    // realized set = exactly the ids whose md5 bucket < 400000
    val expectKept = df.filter($"src" === "a")
      .filter(Sampling.hashBucket($"id", 1000000) < 400000L)
      .agg(count(lit(1)), coalesce(sum("toks"), lit(0L)))
      .head()
    assert((a._7, a._8) === (expectKept.getLong(0), expectKept.getLong(1)))
    assert(a._7 > 20 && a._7 < 60, s"~40% of 100 docs expected, got ${a._7}")
    // b: avail 12 < target 400 -> clamped keep-all, deficit reported
    assert(out(1) === ("b", 2L, 12L, 400L, 1000000L, 388L, 2L, 12L))
    // c: absent source still reports its row
    assert(out(2) === ("c", 0L, 0L, 200L, 1000000L, 200L, 0L, 0L))
  }

  test("classWeights: inverse-frequency micro weights, uniform lands at 1e6") {
    // labels 0×6, 1×3, 2×1: total 10, k 3 →
    //   w(0) = 10e6 div 18 = 555555; w(1) = 10e6 div 9 = 1111111;
    //   w(2) = 10e6 div 3 = 3333333
    val df = (Seq.fill(6)(0) ++ Seq.fill(3)(1) ++ Seq(2))
      .zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("id", "label")
    val out = Sampling.classWeights(df, "label").orderBy("label")
      .as[(Int, Long, Long)].collect()
    assert(out === Array((0, 6L, 555555L), (1, 3L, 1111111L), (2, 1L, 3333333L)))
    // balanced labels: every class exactly 10⁶
    val even = (0 until 9).map(i => (i.toLong, i % 3)).toDF("id", "label")
    assert(Sampling.classWeights(even, "label").select("weight_micro")
      .as[Long].collect().forall(_ == 1000000L))
  }

  test("temperatureWeights: isqrt flattening, exact integer shares, " +
      "overflow-safe allocation, deficit on upsampled tail") {
    import org.apache.spark.sql.functions._
    // head source 90k tokens, tail source 100: natural ratio 900:1,
    // sqrt-flattened ratio 300:10 = 30:1
    val docs = Seq(
      ("head", 45000L), ("head", 45000L), ("tail", 100L)
    ).toDF("source", "n_tokens")
    val out = Sampling.temperatureWeights(docs, col("source"),
        col("n_tokens"), budgetTokens = 31000L)
      .orderBy("source")
      .select("source", "avail_docs", "avail_tokens", "w", "weight_ppm",
        "target_tokens", "deficit_tokens")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    // isqrt(90000) = 300, isqrt(100) = 10, total 310
    assert(out(0) == ("head", 2L, 90000L, 300L,
      300L * 1000000L / 310L, 300L * 31000L / 310L, 0L))
    // tail: target 1000 > available 100 → deficit 900 (the repetition
    // stage's input)
    assert(out(1) == ("tail", 1L, 100L, 10L,
      10L * 1000000L / 310L, 1000L, 900L))
    // α = 0.25 (two sqrt applications) flattens harder: 90000^¼ ≈ 17
    val quarter = Sampling.temperatureWeights(docs, col("source"),
        col("n_tokens"), budgetTokens = 0L, sqrtApplications = 2)
      .orderBy("source").select("w").as[Long].collect()
    assert(quarter sameElements Array(17L, 3L)) // isqrt(300)=17, isqrt(10)=3
    // a 100 TB-scale budget times a large weight: the decomposed
    // allocation stays exact where naive budget*w would overflow int64
    val big = Seq(("a", 4000000000000000000L), ("b", 1000000L))
      .toDF("source", "n_tokens")
    val alloc = Sampling.temperatureWeights(big, col("source"),
        col("n_tokens"), budgetTokens = 5000000000000000000L)
      .orderBy("source").select("w", "target_tokens")
      .as[(Long, Long)].collect()
    val wa = alloc(0)._1; val wb = alloc(1)._1
    val total = wa + wb
    def exact(w: Long): Long = { // BigInt ground truth
      (BigInt(5000000000000000000L) * w / total).toLong
    }
    assert(alloc(0)._2 == exact(wa) && alloc(1)._2 == exact(wb),
      s"decomposed allocation must equal bignum truth: $alloc")
  }

  test("curriculumSchedule: equal-width stages, md5 in-stage shuffle, and a " +
      "two-level prefix sum that equals the single global window; " +
      "partitioning-invariant") {
    import org.apache.spark.sql.expressions.Window
    // difficulty 0..99 over 4 stages of width 25; tokens = difficulty+1
    val docs = spark.range(0, 100)
      .select($"id", ($"id" % 100).as("diff"), ($"id" % 7 + 1).as("toks"))
    val out = Sampling.curriculumSchedule(docs, "id", col("diff"),
      col("toks"), nStages = 4, tokensPerStep = 10L)
    val rows = out.orderBy("id")
      .select("id", "difficulty", "stage", "shuffle_key", "n_tokens",
        "start_offset", "step")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    // stage = equal-width bin: 1 + diff*4 div 100
    assert(rows.forall { case (id, d, st, _, _, _, _) =>
      st == 1 + d * 4 / 100 })
    // shuffle key is the q77 md5 bucket — engine/partitioning stable
    val h = docs.select($"id", Sampling.hashBucket($"id", 1000000).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(rows.forall { case (id, _, _, sk, _, _, _) => sk == h(id) })
    // the bucketed two-level prefix must equal ONE global window
    val truth = out.withColumn("expect",
        coalesce(sum("n_tokens").over(
          Window.orderBy("stage", "shuffle_key", "id")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("start_offset") =!= col("expect")).count()
    assert(truth == 0L, "two-level prefix sum diverged from the global window")
    // step accounting
    assert(rows.forall { case (_, _, _, _, _, off, step) => step == off / 10 })
    // deterministic under repartitioning
    val re = Sampling.curriculumSchedule(docs.repartition(13), "id",
        col("diff"), col("toks"), nStages = 4, tokensPerStep = 10L)
      .orderBy("id")
      .select("id", "difficulty", "stage", "shuffle_key", "n_tokens",
        "start_offset", "step")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(re === rows)
    intercept[IllegalArgumentException](
      Sampling.curriculumSchedule(docs, "id", col("diff"), col("toks"),
        nStages = 0, tokensPerStep = 10L))
    intercept[IllegalArgumentException](
      Sampling.curriculumSchedule(docs, "id", col("diff"), col("toks"),
        nStages = 4, tokensPerStep = 0L))
  }

  test("curriculumPack: span arithmetic over the schedule — boundary-exact " +
      "first/last sequence, empty docs span their containing sequence only") {
    val docs = spark.range(0, 60)
      .select($"id", ($"id" % 10).as("diff"), ($"id" % 5 * 3).as("toks"))
    val out = Sampling.curriculumPack(docs, "id", col("diff"), col("toks"),
        nStages = 3, seqLen = 7L)
      .select("id", "n_tokens", "start_offset", "first_seq", "last_seq",
        "offset_in_seq", "n_seqs")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    out.foreach { case (id, n, off, fs, ls, o, ns) =>
      assert(fs == off / 7, s"doc $id first_seq")
      assert(o == off % 7, s"doc $id offset")
      val expLs = if (n > 0) (off + n - 1) / 7 else off / 7
      assert(ls == expLs && ns == expLs - fs + 1, s"doc $id span")
    }
    // a doc ending exactly at a boundary stays in its first sequence
    val one = Seq((1L, 0L, 7L)).toDF("id", "diff", "toks")
    val row = Sampling.curriculumPack(one, "id", col("diff"), col("toks"),
        nStages = 1, seqLen = 7L)
      .select("first_seq", "last_seq", "n_seqs")
      .as[(Long, Long, Long)].head()
    assert(row == ((0L, 0L, 1L)))
    intercept[IllegalArgumentException](
      Sampling.curriculumPack(one, "id", col("diff"), col("toks"),
        nStages = 1, seqLen = 0L))
  }
}
