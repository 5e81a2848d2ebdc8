package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curate, Sampling, TextAnalysis}

/** Differential fuzzing for the curation/mixing tier — the harness
  * discipline the pattern/traversal/rules/streaming/durability tiers
  * already run (and which found the round-11 Or-branch drop and the
  * round-12 drift divide-by-zero): random corpora × random parameters
  * through Curate / Curate.audit / quotaCap / epochMix / budgetPlan /
  * dsirScore, each compared row-for-row against a Spark-free driver
  * model that restates the documented semantics (gate bitmask rules,
  * md5 bucketing, min-id representatives, salted epoch hash, exact
  * integer plan arithmetic). The sf-level DuckDB oracles already pin
  * one corpus per query; this pins the OPERATORS across hundreds of
  * corpus shapes oracles never see — empty docs, all-dup batches,
  * sources the plan doesn't name, quota larger than the group.
  */
class CorpusFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val programs = 48

  // --- driver-side restatements of the documented semantics ---------

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bucket(s: String, b: Int): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 8), 16) % b

  private def toks(text: String): Seq[String] =
    if (text.trim.isEmpty) Nil else text.trim.split("\\s+").toSeq

  /** The q97 gate bitmask at its defaults. */
  private def gateReasons(text: String): Long = {
    val tk = toks(text)
    val n = tk.size.toLong
    val sumLen = tk.map(_.length.toLong).sum
    val nPunct = text.replaceAll("[a-zA-Z0-9\\s]", "").length.toLong
    val nStop = tk.count(TextAnalysis.englishStopwords.contains).toLong
    (if (n < 10) 1L else 0L) +
      (if (n > 0 && (sumLen < 3 * n || sumLen > 10 * n)) 2L else 0L) +
      (if (nPunct * 10 > text.length) 4L else 0L) +
      (if (nStop < 2) 8L else 0L)
  }

  private def splitOf(id: Long): String = {
    val b = bucket(id.toString, 1000)
    if (b < 900) "train" else if (b < 950) "val" else "test"
  }

  /** Curate model: gate → min-id rep per exact text → optional near-dup
    * keep-list → (id, split, n_tokens).
    */
  /** The q226 per-source LM fluency flag: bigram LM trained on the
    * gate-clean slice (add-one smoothing, integer ppm — the q107
    * model), per-source integer mean over the clean scores, flag when
    * score·10⁶ < relPpm·mean. Mirrors [[Curate.lmLowFlags]].
    */
  private def lmLowModel(docs: Seq[(Long, String, String)],
      relPpm: Long): Map[Long, Boolean] = {
    val clean = docs.filter(d => gateReasons(d._2) == 0L)
    def lowToks(t: String): Seq[String] = toks(t.toLowerCase)
    val c1 = clean.flatMap(d => lowToks(d._2)).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val c2 = clean.flatMap(d => lowToks(d._2).sliding(2).filter(_.size == 2)
        .map(_.toList)).toSeq
      .groupBy(identity).map { case (b, bs) => b -> bs.size.toLong }
    val v = c1.size.toLong
    def score(t: String): Option[Long] = {
      val tk = lowToks(t)
      if (tk.size < 2) None
      else {
        val ps = tk.sliding(2).filter(_.size == 2).map { bg =>
          ((c2.getOrElse(bg.toList, 0L) + 1) * 1000000L) /
            math.max(c1.getOrElse(bg.head, 0L) + v, 1L)
        }.toSeq
        Some(ps.sum / ps.size)
      }
    }
    val meanBySrc: Map[String, Long] = clean.groupBy(_._3).flatMap {
      case (src, ds) =>
        val ss = ds.flatMap(d => score(d._2))
        if (ss.isEmpty) None else Some(src -> ss.sum / ss.size)
    }
    docs.map { case (id, t, src) =>
      id -> ((score(t), meanBySrc.get(src)) match {
        case (Some(s), Some(m)) => s * 1000000L < relPpm * m
        case _ => false
      })
    }.toMap
  }

  private def curateModel(docs: Seq[(Long, String)],
      nearKeep: Option[Set[Long]],
      lmLow: Long => Boolean = _ => false): Set[(Long, String, Long)] = {
    val kept = docs.filter { case (id, t) => gateReasons(t) == 0L && !lmLow(id) }
    val reps = kept.groupBy(d => md5Hex(d._2)).values.map(_.map(_._1).min).toSet
    kept.filter(d => reps(d._1))
      .filter(d => nearKeep.forall(_.contains(d._1)))
      .map(d => (d._1, splitOf(d._1), toks(d._2).size.toLong)).toSet
  }

  /** Curate.audit model: one row per doc with reasons/dup_of/status/
    * split (null-coalesced the way q219 renders them).
    */
  private def auditModel(docs: Seq[(Long, String)],
      nearKeep: Option[Set[Long]],
      lmLow: Long => Boolean = _ => false): Set[(Long, Long, Long, String, String, Long)] = {
    val byHash = docs.filter(d => gateReasons(d._2) == 0L && !lmLow(d._1))
      .groupBy(d => md5Hex(d._2)).map { case (h, ds) => h -> ds.map(_._1).min }
    docs.map { case (id, t) =>
      val reasons = gateReasons(t) + (if (lmLow(id)) 16L else 0L)
      val dupOf = if (reasons == 0L) byHash.get(md5Hex(t)) else None
      val status =
        if (reasons != 0L) "gate"
        else if (dupOf.get != id) "exact_dup"
        else if (!nearKeep.forall(_.contains(id))) "near_dup"
        else "kept"
      val split = if (status == "kept") splitOf(id) else "dropped"
      (id, reasons, dupOf.getOrElse(-1L), status, split, toks(t).size.toLong)
    }.toSet
  }

  /** quotaCap model: per group, (md5(key), key) ascending, first N. */
  private def quotaModel(rows: Seq[(Long, String)], quota: Int): Set[Long] =
    rows.groupBy(_._2).values.flatMap { g =>
      g.map(_._1).sortBy(k => (md5Hex(k.toString), k.toString)).take(quota)
    }.toSet

  /** epochMix model: floor(w) copies + one more when the SALTED hash
    * falls under the fractional threshold.
    */
  private def epochModel(rows: Seq[(Long, String)], weights: Map[String, Double],
      default: Double): Set[(Long, Long)] =
    rows.flatMap { case (id, src) =>
      val w = weights.getOrElse(src, default)
      val whole = math.floor(w).toLong
      val thr = math.round((w - whole) * 1000000)
      val salted = bucket(id.toString + ":epoch", 1000000)
      val copies = whole + (if (salted < thr) 1L else 0L)
      (0L until copies).map(c => (id, c))
    }.toSet

  /** budgetPlan model: the documented integer arithmetic + md5 gate. */
  private def budgetModel(rows: Seq[(Long, String, Long)],
      weightsPpm: Seq[(String, Long)], budget: Long)
      : Set[(String, Long, Long, Long, Long, Long, Long, Long, Long)] = {
    val bySrc = rows.groupBy(_._2)
    weightsPpm.map { case (src, w) =>
      val g = bySrc.getOrElse(src, Seq.empty)
      val availDocs = g.size.toLong
      val availToks = g.map(_._3).sum
      val target = budget * w / 1000000
      val keepPpm = math.min(1000000L, target * 1000000 / math.max(availToks, 1L))
      val deficit = math.max(0L, target - availToks)
      val kept = g.filter(r => bucket(r._1.toString, 1000000) < keepPpm)
      (src, w, availDocs, availToks, target, keepPpm, deficit,
        kept.size.toLong, kept.map(_._3).sum)
    }.toSet
  }

  /** dsirScore model: hashed uni+bigram buckets, BigInt ratio, clamp. */
  private def dsirModel(raw: Seq[(Long, String)], tgt: Seq[(Long, String)],
      nB: Int, cap: Long): Set[(Long, Long, Long)] = {
    def feats(t: String): Seq[String] = {
      val tk = toks(t.toLowerCase)
      tk ++ tk.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    val cRaw = raw.flatMap(d => feats(d._2)).groupBy(f => bucket(f, nB))
      .map { case (b, fs) => b -> fs.size }
    val cTgt = tgt.flatMap(d => feats(d._2)).groupBy(f => bucket(f, nB))
      .map { case (b, fs) => b -> fs.size }
    val nRaw = BigInt(cRaw.values.sum + nB)
    val nTgt = BigInt(cTgt.values.sum + nB)
    def rPpm(b: Long): BigInt =
      ((BigInt(cTgt.getOrElse(b, 0)) + 1) * nRaw * 1000000 /
        ((BigInt(cRaw.getOrElse(b, 0)) + 1) * nTgt)).min(BigInt(cap))
    raw.filter(d => feats(d._2).nonEmpty).map { case (id, t) =>
      val bs = feats(t).map(bucket(_, nB))
      (id, bs.size.toLong, (bs.map(rPpm).sum / bs.size).toLong)
    }.toSet
  }

  /** evalOverlap model: distinct word-n-grams per doc (whole token run
    * when shorter than n — Dedup.shinglesOfTokens semantics; an empty
    * doc carries the single empty gram), hit-counted against the eval
    * side's distinct-gram union.
    */
  private def gramsOf(text: String, n: Int): Set[String] = {
    val tk = toks(text.toLowerCase)
    if (tk.size < n) Set(tk.mkString(" "))
    else tk.sliding(n).map(_.mkString(" ")).toSet
  }

  private def deconModel(train: Seq[(Long, String)], eval: Seq[(Long, String)],
      n: Int, flagAtPct: Int): Set[(Long, Long, Long, Boolean)] = {
    val eg = eval.flatMap(d => gramsOf(d._2, n)).toSet
    train.map { case (id, t) =>
      val g = gramsOf(t, n)
      val hit = g.count(eg.contains).toLong
      (id, g.size.toLong, hit, hit * 100 >= g.size.toLong * flagAtPct)
    }.toSet
  }

  // --- corpus generator ----------------------------------------------

  private val wordPool = TextAnalysis.englishStopwords ++ Seq(
    "cat", "dog", "run", "blue", "stone", "river", "quick", "brown",
    "alpha", "beta", "gamma", "zzzzzzzzzzzzzz", "x", "42", "!!", "#?;",
    "word,", "mat.")

  private def genCorpus(rnd: scala.util.Random): Seq[(Long, String, String)] = {
    val nDocs = 8 + rnd.nextInt(40)
    val sources = (0 until 2 + rnd.nextInt(3)).map(i => s"s$i")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    for (i <- 0 until nDocs) {
      val id = i.toLong * (1 + rnd.nextInt(7)) + i // unique, gappy
      val src = sources(rnd.nextInt(sources.size))
      val text =
        if (out.nonEmpty && rnd.nextInt(4) == 0) out(rnd.nextInt(out.size))._2
        else if (rnd.nextInt(10) == 0) ""
        else (0 until rnd.nextInt(25)).map(_ => wordPool(rnd.nextInt(wordPool.size)))
          .mkString(" ")
      out += ((id, text, src))
    }
    // ids must be unique for the sampler contracts
    out.groupBy(_._1).values.map(_.head).toSeq.sortBy(_._1)
  }

  test(s"curation/mixing tier: $programs random corpora ≡ driver models") {
    for (p <- 0 until programs) {
      val rnd = new scala.util.Random(0xC0FFEE + p)
      val corpus = genCorpus(rnd)
      val docs = corpus.map(c => (c._1, c._2)).toDF("doc_id", "text")
      val sourced = corpus.toDF("doc_id", "text", "source")
      val ids = corpus.map(_._1)

      // 1) Curate, with a random near-dup keep-list half the time
      val nearKeep = if (rnd.nextBoolean())
        Some(ids.filter(_ => rnd.nextInt(3) > 0).toSet) else None
      val keepDf = nearKeep.map(k =>
        k.toSeq.toDF("doc_id"))
      val curated = Curate(docs, "doc_id", "text", nearDupKeep = keepDf)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(curated === curateModel(corpus.map(c => (c._1, c._2)), nearKeep),
        s"Curate mismatch in program $p")

      // 2) audit: every doc classified; kept slice ≡ Curate
      val audit = Curate.audit(docs, "doc_id", "text", nearDupKeep = keepDf)
        .select(col("doc_id"), col("reasons"),
          coalesce(col("dup_of"), lit(-1L)).as("dup_of"), col("status"),
          coalesce(col("split"), lit("dropped")).as("split"), col("n_tokens"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getString(4), r.getLong(5))).toSet
      assert(audit === auditModel(corpus.map(c => (c._1, c._2)), nearKeep),
        s"audit mismatch in program $p")

      // 2b) the per-source LM fluency stage (q226/q227): flags, the
      // lm-gated curate, and the audit's bit-16 provenance, all vs the
      // driver LM model — relPpm sweeps from never-flags to most-flags
      // the sweep stays inside lmLowFlags' [0, 10⁶] domain (r14 advice
      // #4 tightened it — beyond 10⁶ the int64 gate product could
      // overflow, so the operator now rejects rather than computes)
      val relPpm = Seq(0L, 500000L, 940000L, 999999L, 1000000L)(rnd.nextInt(5))
      val lmLow = lmLowModel(corpus, relPpm)
      val lmFlags = Curate.lmLowFlags(sourced, "doc_id", "text", "source", relPpm)
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(lmFlags === lmLow, s"lmLowFlags mismatch in program $p (rel $relPpm)")
      val lmCurated = Curate(sourced, "doc_id", "text",
          lmGate = Some(("source", relPpm)))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(lmCurated === curateModel(corpus.map(c => (c._1, c._2)), None, lmLow),
        s"lm-gated Curate mismatch in program $p (rel $relPpm)")
      val lmAudit = Curate.audit(sourced, "doc_id", "text",
          lmGate = Some(("source", relPpm)))
        .select(col("doc_id"), col("reasons"),
          coalesce(col("dup_of"), lit(-1L)).as("dup_of"), col("status"),
          coalesce(col("split"), lit("dropped")).as("split"), col("n_tokens"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getString(4), r.getLong(5))).toSet
      assert(lmAudit === auditModel(corpus.map(c => (c._1, c._2)), None, lmLow),
        s"lm-gated audit mismatch in program $p (rel $relPpm)")

      // 3) quotaCap by source
      val quota = 1 + rnd.nextInt(5)
      val capped = Sampling.quotaCap(sourced, Seq(col("source")), col("doc_id"), quota)
        .select("doc_id").as[Long].collect().toSet
      assert(capped === quotaModel(corpus.map(c => (c._1, c._3)), quota),
        s"quotaCap mismatch in program $p (quota $quota)")

      // 4) epochMix with random weights (incl. 0-drop and >1 repeats)
      val srcNames = corpus.map(_._3).distinct
      val weights = srcNames.filter(_ => rnd.nextBoolean())
        .map(s => s -> Seq(0.0, 0.4, 1.0, 2.5, rnd.nextDouble() * 3)(rnd.nextInt(5)))
        .toMap
      val default = Seq(0.0, 1.0, 1.5)(rnd.nextInt(3))
      val mixed = Sampling.epochMix(sourced, col("source"), col("doc_id"),
          weights, default)
        .select("doc_id", "copy_idx").as[(Long, Long)].collect().toSet
      assert(mixed === epochModel(corpus.map(c => (c._1, c._3)), weights, default),
        s"epochMix mismatch in program $p (weights $weights default $default)")

      // 5) budgetPlan with a named-but-absent source in the plan
      val wPlan = (srcNames.take(2) :+ "ghost").distinct
        .map(s => s -> (50000L + rnd.nextInt(300000).toLong))
      val budget = rnd.nextInt(2000).toLong
      val toksBySrc = corpus.map(c => (c._1, c._3, toks(c._2).size.toLong))
      val plan = Sampling.budgetPlan(sourced, col("source"), col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long"), wPlan, budget)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7), r.getLong(8))).toSet
      assert(plan === budgetModel(toksBySrc, wPlan, budget),
        s"budgetPlan mismatch in program $p (budget $budget)")

      // 6) dsirScore against a random target slice
      val tgt = corpus.filter(_ => rnd.nextInt(3) == 0).map(c => (c._1, c._2))
      if (tgt.nonEmpty) {
        val nB = Seq(16, 64, 256)(rnd.nextInt(3))
        val cap = Seq(1000000L, 2000000L, 1000000000L)(rnd.nextInt(3))
        val scored = TextAnalysis.dsirScore(docs, tgt.toDF("doc_id", "text"),
            "doc_id", "text", nBuckets = nB, maxRatioPpm = cap)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(scored === dsirModel(corpus.map(c => (c._1, c._2)), tgt, nB, cap),
          s"dsirScore mismatch in program $p (nB $nB cap $cap)")
        // the stateless row-local scorer (q223's serving path) must be
        // bit-identical to the join path on the same model
        val dense = TextAnalysis.dsirWeightsDense(docs,
          tgt.toDF("doc_id", "text"), "text", nB, cap)
        val stateless = TextAnalysis.dsirScoreStateless(docs, "doc_id", "text", dense)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(stateless === scored,
          s"stateless/join scorer divergence in program $p (nB $nB cap $cap)")
      }

      // 7) evalOverlap decontamination against a random eval slice —
      // the generator's exact-dup rate guarantees real overlap hits
      val evalDocs = corpus.filter(_ => rnd.nextInt(4) == 0).map(c => (c._1, c._2))
      if (evalDocs.nonEmpty) {
        val n = Seq(2, 3, 5)(rnd.nextInt(3))
        val pct = Seq(0, 20, 50, 100)(rnd.nextInt(4))
        val got = graft.operators.Decontaminate.evalOverlap(docs,
            evalDocs.toDF("doc_id", "text"), "doc_id", "text", n, pct)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
          .toSet
        assert(got === deconModel(corpus.map(c => (c._1, c._2)), evalDocs, n, pct),
          s"evalOverlap mismatch in program $p (n $n pct $pct)")
      }
    }
  }

  // --- round-15 operators: temperature mix, vocab coverage, hard
  //     negatives, calibration ----------------------------------------

  private def isqrtChain(n: Long, k: Int): Long =
    (1 to k).foldLeft(n.toDouble)((v, _) => math.floor(math.sqrt(v))).toLong

  private def temperatureModel(bySrc: Seq[(String, Long)], budget: Long,
      k: Int): Set[(String, Long, Long, Long, Long, Long, Long)] = {
    val agg = bySrc.groupBy(_._1).map { case (s, ds) =>
      (s, ds.size.toLong, ds.map(_._2).sum) }.toSeq
    val ws = agg.map { case (s, d, t) => (s, d, t, isqrtChain(t, k)) }
    val total = math.max(ws.map(_._4).sum, 1L)
    ws.map { case (s, d, t, w) =>
      val ppm = w * 1000000L / total
      val target = (BigInt(budget) * w / total).toLong
      (s, d, t, w, ppm, target, math.max(0L, target - t))
    }.toSet
  }

  private def coverageModel(corpus: Seq[(Long, String, String)], topK: Int)
      : Set[(String, Long, Long, Long, Long, Long, Long)] = {
    val all = corpus.flatMap(c => toks(c._2))
    val vocab = all.groupBy(identity).map { case (t, ts) => t -> ts.size }
      .toSeq.sortBy { case (t, n) => (-n, t) }.take(topK).map(_._1).toSet
    corpus.flatMap(c => toks(c._2).map(t => (c._3, t)))
      .groupBy(_._1).map { case (src, occ) =>
        val n = occ.size.toLong
        val cov = occ.count(o => vocab(o._2)).toLong
        val types = occ.map(_._2).distinct.size.toLong
        val typesCov = occ.map(_._2).distinct.count(vocab).toLong
        (src, n, cov, types, typesCov,
          cov * 1000000L / math.max(n, 1L),
          typesCov * 1000000L / math.max(types, 1L))
      }.toSet
  }

  private def hardNegativesModel(docs: Seq[(Long, String)],
      terms: Seq[String], k: Int): Seq[(Long, Long, Long)] = {
    val low = docs.map { case (id, t) => (id, toks(t.toLowerCase)) }
    val n = docs.size.toLong
    val dl = low.map { case (id, tk) => id -> tk.size.toLong }.toMap
    val avgdl = dl.values.sum / math.max(n, 1L)
    val tf = low.flatMap { case (id, tk) =>
      tk.filter(terms.contains).groupBy(identity)
        .map { case (t, ts) => (id, t, ts.size.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (t, rs) => t -> rs.size.toLong }
    tf.groupBy(_._1).toSeq.map { case (id, rs) =>
      val score = rs.map { case (_, t, f) =>
        ((n * 10000) / df(t)) * ((f * 20000 * avgdl) / (f * avgdl + dl(id)))
      }.sum
      (id, score, rs.size.toLong)
    }.filter(_._3 < terms.distinct.size) // operator dedupes (r15 advice #1)
      .sortBy { case (id, s, _) => (-s, id) }.take(k)
  }

  /** evalOverlapBySet model: per (train doc, eval set) with ≥1 shared
    * gram — sparse long form, flag at pct per set.
    */
  private def bySetModel(train: Seq[(Long, String)],
      evals: Seq[(Long, String, String)], n: Int, pct: Int)
      : Set[(Long, String, Long, Long, Boolean)] = {
    val setGrams: Map[String, Set[String]] = evals.groupBy(_._3)
      .map { case (s, ds) => s -> ds.flatMap(d => gramsOf(d._2, n)).toSet }
    train.flatMap { case (id, t) =>
      val g = gramsOf(t, n)
      setGrams.toSeq.flatMap { case (set, eg) =>
        val hit = g.count(eg.contains).toLong
        if (hit > 0)
          Some((id, set, g.size.toLong, hit, hit * 100 >= g.size.toLong * pct))
        else None
      }
    }.toSet
  }

  private def scorecardModel(train: Seq[(Long, String, String)],
      evals: Seq[(Long, String, String)], n: Int, pct: Int)
      : Set[(String, String, Long, Long, Long)] = {
    val flags = bySetModel(train.map(c => (c._1, c._2)), evals, n, pct)
      .filter(_._5)
    val srcOf = train.map(c => c._1 -> c._3).toMap
    val nDocs = train.groupBy(_._3).map { case (s, ds) => s -> ds.size.toLong }
    flags.groupBy(f => (srcOf(f._1), f._2)).map { case ((src, set), fs) =>
      (src, set, nDocs(src), fs.size.toLong,
        fs.size.toLong * 1000000L / nDocs(src))
    }.toSet
  }

  private def calibrationModel(rows: Seq[(Long, Long)], nBins: Int)
      : Set[(Long, Long, Long, Long, Long, Long)] = {
    val mn = rows.map(_._1).min; val mx = rows.map(_._1).max
    rows.groupBy { case (m, _) => (m - mn) * nBins / (mx - mn + 1) }
      .map { case (bin, rs) =>
        val n = rs.size.toLong
        val pos = rs.count(_._2 == 1L).toLong
        (bin, n, pos, rs.map(_._1).min, rs.map(_._1).max, pos * 1000000L / n)
      }.toSet
  }

  /** removeDupSpans model: window text → min owner, keep-first union
    * coverage, md5 of the space-joined survivors.
    */
  private def removeSpansModel(docs: Seq[(Long, String)], k: Int)
      : Seq[(Long, Long, Long, Long, String)] = {
    val wins = docs.flatMap { case (id, t) =>
      val w = toks(t)
      if (w.size >= k)
        (1 to w.size - k + 1).map(i => (id, i, w.slice(i - 1, i - 1 + k).mkString(" ")))
      else Nil
    }
    val owner = wins.groupBy(_._3).map { case (w, ws) => w -> ws.map(_._1).min }
    docs.sortBy(_._1).map { case (id, t) =>
      val w = toks(t)
      val covered = wins.filter(x => x._1 == id && owner(x._3) < id)
        .flatMap(x => x._2 until x._2 + k).toSet
      val kept = (1 to w.size).filterNot(covered)
      val cleaned = kept.map(j => w(j - 1)).mkString(" ")
      val nRem = w.size.toLong - kept.size
      (id, w.size.toLong, nRem, nRem * 10000L / math.max(w.size, 1),
        md5Hex(cleaned))
    }
  }

  /** curriculumSchedule model: equal-width stage, md5 shuffle key,
    * global exclusive prefix sum over (stage, key, id), step div.
    */
  private def curriculumModel(rows: Seq[(Long, Long, Long)], nStages: Int,
      tps: Long): Seq[(Long, Long, Long, Long, Long, Long, Long)] = {
    val lo = rows.map(_._2).min; val hi = rows.map(_._2).max
    val st = rows.map { case (id, d, n) =>
      (id, d, 1L + (d - lo) * nStages / (hi - lo + 1),
        bucket(id.toString, 1000000), n)
    }
    var acc = 0L
    st.sortBy { case (id, _, stg, h, _) => (stg, h, id) }
      .map { case (id, d, stg, h, n) =>
        val off = acc; acc += n
        (id, d, stg, h, n, off, off / tps)
      }.sortBy(_._1)
  }

  /** lmTiers model: q107 bigram arithmetic over the given train slice,
    * per-lang ntile over (score desc, id) with SQL ntile fill (first
    * n mod k buckets take the extra row).
    */
  private def lmTiersModel(train: Seq[(Long, String)],
      docs: Seq[(Long, String, String)], tiers: Int)
      : Set[(Long, String, Long, Long, Long, String)] = {
    def lowToks(t: String) = toks(t.toLowerCase)
    val c1 = train.flatMap(d => lowToks(d._2)).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val c2 = train.flatMap(d => lowToks(d._2).sliding(2).filter(_.size == 2)
      .map(_.toList)).groupBy(identity).map { case (b, bs) => b -> bs.size.toLong }
    val v = c1.size.toLong
    val scored = docs.flatMap { case (id, t, lang) =>
      val tk = lowToks(t)
      if (tk.size < 2) None
      else {
        val ps = tk.sliding(2).filter(_.size == 2).map { bg =>
          ((c2.getOrElse(bg.toList, 0L) + 1) * 1000000L) /
            math.max(c1.getOrElse(bg.head, 0L) + v, 1L)
        }.toSeq
        Some((id, lang, ps.size.toLong, ps.sum / ps.size))
      }
    }
    scored.groupBy(_._2).flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (-r._4, r._1))
      val n = ordered.size; val base = n / tiers; val extra = n % tiers
      val buckets = (1 to tiers).flatMap(b =>
        Seq.fill(base + (if (b <= extra) 1 else 0))(b.toLong))
      ordered.zip(buckets).map { case ((id, lang, nb, sc), b) =>
        val tier = if (b == 1) "head" else if (b == tiers) "tail" else "middle"
        (id, lang, nb, sc, b, tier)
      }
    }.toSet
  }

  test("round-16 operators: 32 random corpora ≡ driver models " +
      "(dup-span removal, curriculum schedule, LM tiers)") {
    import graft.operators.Dedup
    for (p <- 0 until 32) {
      val rnd = new scala.util.Random(0x16F00D + p)
      val corpus = genCorpus(rnd)
      val docs = corpus.map(c => (c._1, c._2)).toDF("doc_id", "text")

      // 1) removeDupSpans at a random window size (genCorpus plants
      // exact-copy texts 1-in-4, so recycled windows are common)
      val k = 2 + rnd.nextInt(4)
      val rm = Dedup.removeDupSpans(docs, "doc_id", "text", k)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4))).toSeq
      assert(rm == removeSpansModel(corpus.map(c => (c._1, c._2)), k),
        s"removeDupSpans mismatch in program $p (k $k)")

      // 2) curriculumSchedule: text length as difficulty (ties common),
      // token count as weight, random stages and step size
      val rows = corpus.map(c => (c._1, c._2.length.toLong,
        toks(c._2).size.toLong))
      val nStages = 1 + rnd.nextInt(5)
      val tps = 1L + rnd.nextInt(50)
      val cs = Sampling.curriculumSchedule(
          rows.toDF("id", "diff", "toksn"), "id", col("diff"), col("toksn"),
          nStages, tps)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
      assert(cs == curriculumModel(rows, nStages, tps),
        s"curriculumSchedule mismatch in program $p (stages $nStages tps $tps)")

      // 3) lmTiers: train = a ~half md5 slice (sometimes empty — the
      // v=0 uniform-score path), source column doubles as language
      val train = corpus.filter(c => bucket(c._1.toString, 2) == 0)
        .map(c => (c._1, c._2))
      val tiers = 2 + rnd.nextInt(3)
      val lt = TextAnalysis.lmTiers(
          train.toDF("doc_id", "text"),
          corpus.toDF("doc_id", "text", "lang"),
          "doc_id", "text", "lang", tiers)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getString(5))).toSet
      assert(lt == lmTiersModel(train, corpus, tiers),
        s"lmTiers mismatch in program $p (tiers $tiers)")
    }
  }

  test("round-15 operators: 32 random corpora ≡ driver models " +
      "(temperature mix, vocab coverage, hard negatives, calibration)") {
    for (p <- 0 until 32) {
      val rnd = new scala.util.Random(0xBEEF15 + p)
      val corpus = genCorpus(rnd)
      val docs = corpus.map(c => (c._1, c._2)).toDF("doc_id", "text")
      val sourced = corpus.toDF("doc_id", "text", "source")

      // 1) temperatureWeights: random budget and sqrt depth
      val budget = rnd.nextInt(100000).toLong
      val kSqrt = 1 + rnd.nextInt(3)
      val tw = Sampling.temperatureWeights(sourced, col("source"),
          TextAnalysis.tokenCount(col("text")).cast("long"), budget, kSqrt)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
      val bySrc = corpus.map(c => (c._3, toks(c._2).size.toLong))
      assert(tw === temperatureModel(bySrc, budget, kSqrt),
        s"temperatureWeights mismatch in program $p (budget $budget k $kSqrt)")

      // 2) vocabCoverage at a random top-K (sometimes > |vocab|)
      val topK = Seq(1, 3, 10, 500)(rnd.nextInt(4))
      val vc = TextAnalysis.vocabCoverage(sourced, "doc_id", "text",
          "source", topK)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
      assert(vc === coverageModel(corpus, topK),
        s"vocabCoverage mismatch in program $p (topK $topK)")

      // 3) hardNegatives with random query terms from the pool (the
      // generator's dup rate yields docs matching all, some, and none);
      // half the programs REPEAT a term — the operator must dedupe so the
      // all-terms-matched exclusion still fires (r15 advice #1)
      val baseTerms = rnd.shuffle(wordPool.toSeq).take(1 + rnd.nextInt(3))
        .map(_.toLowerCase).distinct
      val terms =
        if (rnd.nextBoolean()) baseTerms ++ baseTerms.take(1) else baseTerms
      val k = 1 + rnd.nextInt(10)
      val hn = graft.operators.Search.hardNegatives(docs, "doc_id", "text",
          terms, k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(hn == hardNegativesModel(corpus.map(c => (c._1, c._2)), terms, k),
        s"hardNegatives mismatch in program $p (terms $terms k $k)")

      // 4) calibration on a random scored frame (negative margins,
      // ties, single-value spans)
      val rows = (0 until 3 + rnd.nextInt(40)).map { _ =>
        (rnd.nextInt(2001).toLong - 1000L, rnd.nextInt(2).toLong)
      }
      val nBins = Seq(2, 4, 12)(rnd.nextInt(3))
      val cal = graft.operators.Classify.calibration(
          rows.toDF("margin", "y"), nBins)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet
      assert(cal === calibrationModel(rows, nBins),
        s"calibration mismatch in program $p (nBins $nBins)")

      // 5) per-set decontamination attribution + the source scorecard
      // (random eval slice split into two labeled "benchmarks")
      val evalSets = corpus.filter(_ => rnd.nextInt(4) == 0)
        .map(c => (c._1, c._2, s"b${c._1 % 2}"))
      if (evalSets.nonEmpty) {
        val n = Seq(2, 3, 5)(rnd.nextInt(3))
        val pct = Seq(0, 20, 50, 100)(rnd.nextInt(4))
        val evalDf = evalSets.toDF("doc_id", "text", "bench")
        val bySet = graft.operators.Decontaminate.evalOverlapBySet(docs,
            evalDf, "doc_id", "text", "bench", n, pct)
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
            r.getLong(3), r.getBoolean(4))).toSet
        assert(bySet === bySetModel(corpus.map(c => (c._1, c._2)), evalSets, n, pct),
          s"evalOverlapBySet mismatch in program $p (n $n pct $pct)")
        val sc = graft.operators.Decontaminate.contaminationBySource(sourced,
            evalDf, "doc_id", "text", "source", "bench", n, pct)
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSet
        assert(sc === scorecardModel(corpus, evalSets, n, pct),
          s"contaminationBySource mismatch in program $p (n $n pct $pct)")
      }
    }
  }
}
