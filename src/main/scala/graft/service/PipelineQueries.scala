package graft.service

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tpch
import graft.operators.{Dedup, GraphAnalytics, Multimodal, Pii, Sampling, Search, TextAnalysis}
import graft.service.QueryService.{BadRequestException, ParamSpec, PipelineQuery}

/** The data-pipeline operator pack for the registered-query tier: BM25
  * ranked search, fuzzy-dedup clustering, and PII scan/redact exposed
  * as def-query-style parameterized REST queries (reference
  * rest.lisp:367-433 — typed param coercion → 400, unexpected params →
  * 400, write effects → 403, result clamp), so a service consumer
  * drives the pipeline operators through the same surface as graph
  * patterns.
  */
object PipelineQueries {

  def install(service: QueryService, spark: SparkSession, sfDir: String): Unit = {
    def docs: DataFrame = Tpch.table(spark, sfDir, "documents")

    // coerced params arrive as Long; the operators take Int — reject
    // out-of-range values instead of silently wrapping on .toInt
    def intParam(ps: Map[String, Any], name: String, min: Int = 1): Int = {
      val v = ps(name).asInstanceOf[Long]
      if (v < min || v > Int.MaxValue)
        throw new BadRequestException(s"'$name' must be in [$min, ${Int.MaxValue}]")
      v.toInt
    }

    // "source:weight,source:weight" — shared by curate_mix (mix
    // weights) and mix_pack (packability guard) so both surfaces
    // reject malformed entries with the same error
    def parseEpochWeights(spec: String): Map[String, Double] =
      spec.split(",").map(_.trim).filter(_.nonEmpty).map { kv =>
        kv.split(":") match {
          case Array(s, w) =>
            val d = try w.trim.toDouble catch {
              case _: NumberFormatException =>
                throw new BadRequestException(s"bad epoch weight: '$kv'")
            }
            if (!java.lang.Double.isFinite(d) || d < 0)
              throw new BadRequestException("epoch weights must be finite and >= 0")
            s.trim -> d
          case _ => throw new BadRequestException(
            s"'epochs' entries must be source:weight, got '$kv'")
        }
      }.toMap

    service.register(PipelineQuery("bm25_search",
      Seq(ParamSpec("terms", "string"),
        ParamSpec("k", "long", required = false, default = Some(10L))),
      ps => {
        val terms = ps("terms").asInstanceOf[String].split(",")
          .toSeq.map(_.trim.toLowerCase).filter(_.nonEmpty)
        if (terms.isEmpty)
          throw new BadRequestException("'terms' must list at least one term")
        Search.bm25TopK(docs, "doc_id", "text", terms, intParam(ps, "k"))
      }))

    service.register(PipelineQuery("hard_negatives",
      // the q229 surface: BM25-top candidates matching SOME but not
      // ALL terms — contrastive-training negatives for retrieval models
      Seq(ParamSpec("terms", "string"),
        ParamSpec("k", "long", required = false, default = Some(10L))),
      ps => {
        val terms = ps("terms").asInstanceOf[String].split(",")
          .toSeq.map(_.trim.toLowerCase).filter(_.nonEmpty)
        if (terms.isEmpty)
          throw new BadRequestException("'terms' must list at least one term")
        Search.hardNegatives(docs, "doc_id", "text", terms, intParam(ps, "k"))
      }))

    service.register(PipelineQuery("temperature_mix",
      // the q230 surface: UniMax-style temperature-flattened source
      // shares (α = 0.5^sqrts via exact integer sqrt) allocating a
      // token budget with per-source deficits
      Seq(ParamSpec("budget", "long"),
        ParamSpec("sqrts", "long", required = false, default = Some(1L))),
      ps => {
        val budget = ps("budget").asInstanceOf[Long]
        if (budget < 0) throw new BadRequestException("'budget' must be >= 0")
        val sqrts = intParam(ps, "sqrts")
        if (sqrts < 1 || sqrts > 4)
          throw new BadRequestException("'sqrts' must be in [1, 4]")
        Sampling.temperatureWeights(docs, col("source"),
            TextAnalysis.tokenCount(col("text")).cast("long"), budget, sqrts)
          .orderBy("source")
      }))

    service.register(PipelineQuery("vocab_coverage",
      // the q231 surface: per-source occurrence/type coverage under
      // the global top-K vocabulary — the tokenizer-evaluation audit
      Seq(ParamSpec("top_k", "long", required = false, default = Some(50L))),
      ps => TextAnalysis.vocabCoverage(docs, "doc_id", "text", "source",
          intParam(ps, "top_k"))
        .orderBy("source")))

    service.register(PipelineQuery("dedup_span_removal",
      // the q235 surface: keep-first excision of k-token windows
      // already present in a lower-id document (Lee et al.-style
      // exact-substring dedup) — cleaned text certified by md5
      Seq(ParamSpec("k", "long", required = false, default = Some(8L))),
      ps => Dedup.removeDupSpans(docs, "doc_id", "text", intParam(ps, "k"))))

    service.register(PipelineQuery("lm_tiers",
      // the q236 surface: CCNet-style per-language head/middle/tail
      // by bigram-LM fluency rank; the LM trains on the q77 md5
      // 'train' slice of the same corpus
      Seq(ParamSpec("tiers", "long", required = false, default = Some(3L))),
      ps => {
        val tiers = intParam(ps, "tiers")
        if (tiers < 2) throw new BadRequestException("'tiers' must be >= 2")
        val split = docs.withColumn("split", Sampling.hashSplit(col("doc_id"),
          Seq("train" -> 0.9, "val" -> 0.05), rest = "test"))
        TextAnalysis.lmTiers(split.filter(col("split") === "train"), split,
          "doc_id", "text", "lang", tiers)
      }))

    service.register(PipelineQuery("curriculum",
      // the q237 surface: equal-width difficulty stages over n_chars,
      // md5 in-stage shuffle, exclusive token prefix sum → optimizer
      // step manifest
      Seq(ParamSpec("stages", "long", required = false, default = Some(4L)),
        ParamSpec("tokens_per_step", "long", required = false,
          default = Some(2000L))),
      ps => {
        val tps = ps("tokens_per_step").asInstanceOf[Long]
        if (tps < 1)
          throw new BadRequestException("'tokens_per_step' must be >= 1")
        Sampling.curriculumSchedule(docs, "doc_id", col("n_chars"),
          TextAnalysis.tokenCount(col("text")), intParam(ps, "stages"), tps)
      }))

    service.register(PipelineQuery("contrastive_pairs",
      // the q238 surface: near-dup cluster members paired with their
      // min-id cluster rep as contrastive-training positives, scored
      // by exact k-shingle jaccard in per-myriad integers
      Seq(ParamSpec("threshold", "double", required = false,
        default = Some(0.5))),
      ps => {
        val threshold = ps("threshold").asInstanceOf[Double]
        if (threshold <= 0 || threshold > 1)
          throw new BadRequestException("'threshold' must be in (0, 1]")
        Dedup.contrastivePairs(docs, "doc_id", "text", k = 3,
          numHashes = 24, bands = 8, threshold = threshold)
      }))

    service.register(PipelineQuery("tokenizer_fertility",
      // the q241 surface: BPE-ish tokens per kchar / per whitespace
      // word, per (lang, source) — the vocabulary-rebalancing audit
      Seq.empty,
      _ => TextAnalysis.tokenizerFertility(docs, "text", "lang", "source")
        .orderBy("lang", "source")))

    service.register(PipelineQuery("contrastive_triplets",
      // the q240 surface: (anchor, cluster-rep positive, best rare-
      // shingle sub-threshold negative) — contrastive training rows
      Seq(ParamSpec("threshold", "double", required = false,
          default = Some(0.5)),
        ParamSpec("max_df", "long", required = false, default = Some(20L))),
      ps => {
        val threshold = ps("threshold").asInstanceOf[Double]
        if (threshold <= 0 || threshold > 1)
          throw new BadRequestException("'threshold' must be in (0, 1]")
        val maxDf = intParam(ps, "max_df", min = 2)
        Dedup.contrastiveTriplets(docs, "doc_id", "text", k = 3,
          numHashes = 24, bands = 8, threshold = threshold, maxDf = maxDf)
      }))

    service.register(PipelineQuery("dedup_clusters",
      Seq(ParamSpec("threshold", "double", required = false, default = Some(0.5)),
        ParamSpec("only_dups", "boolean", required = false, default = Some(false))),
      ps => {
        val threshold = ps("threshold").asInstanceOf[Double]
        if (threshold <= 0 || threshold > 1)
          throw new BadRequestException("'threshold' must be in (0, 1]")
        val d = docs
        val pairs = Dedup.minhashNearDups(d, "doc_id", "text",
          k = 3, numHashes = 24, bands = 8, threshold = threshold)
        val comps = GraphAnalytics.connectedComponents(
          pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
          d.select(col("doc_id").as("id")))
        val out = comps.select(col("id").as("doc_id"),
          col("component").as("cluster_rep"),
          (col("id") === col("component")).as("keep"))
        if (ps("only_dups").asInstanceOf[Boolean]) out.filter(!col("keep")) else out
      }))

    service.register(PipelineQuery("pii_scan",
      Seq(ParamSpec("only_hits", "boolean", required = false, default = Some(false))),
      ps => {
        val scanned = Pii.scan(docs, "doc_id", "text")
        if (ps("only_hits").asInstanceOf[Boolean]) scanned.filter(col("has_pii"))
        else scanned
      }))

    service.register(PipelineQuery("quota_sample",
      Seq(ParamSpec("quota", "long")),
      ps => {
        Sampling.quotaCap(docs, Seq(col("source"), col("lang")),
            col("doc_id"), intParam(ps, "quota"))
          .select(col("doc_id"), col("source"), col("lang"))
      }))

    service.register(PipelineQuery("epoch_mix",
      Seq(ParamSpec("source", "string"),
        ParamSpec("epochs", "double")),
      ps => {
        val epochs = ps("epochs").asInstanceOf[Double]
        if (!java.lang.Double.isFinite(epochs) || epochs < 0)
          throw new BadRequestException("'epochs' must be finite and >= 0")
        Sampling.epochMix(docs, col("source"), col("doc_id"),
            Map(ps("source").asInstanceOf[String] -> epochs))
          .select(col("doc_id"), col("source"), col("copy_idx"))
      }))

    // "source:ppm,source:ppm" — budget_plan's integer mix weights
    def parseWeightsPpm(spec: String): Seq[(String, Long)] = {
      val parsed = spec.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { kv =>
        kv.split(":") match {
          case Array(s, w) =>
            val ppm = try w.trim.toLong catch {
              case _: NumberFormatException =>
                throw new BadRequestException(s"bad weight ppm: '$kv'")
            }
            if (ppm < 0) throw new BadRequestException("weights must be >= 0 ppm")
            s.trim -> ppm
          case _ => throw new BadRequestException(
            s"'weights' entries must be source:ppm, got '$kv'")
        }
      }
      if (parsed.isEmpty)
        throw new BadRequestException("'weights' must list at least one source")
      // a duplicated source would emit two plan rows; the realized pass
      // joins every doc of that source against BOTH, double-counting
      // kept_docs/kept_tokens — silently wrong output on an accepted input
      val dups = parsed.groupBy(_._1).collect { case (s, vs) if vs.size > 1 => s }
      if (dups.nonEmpty)
        throw new BadRequestException(
          s"'weights' lists a source more than once: ${dups.toSeq.sorted.mkString(", ")}")
      if (parsed.map(_._2).sum > 1000000L)
        throw new BadRequestException("'weights' must sum to <= 1000000 ppm")
      parsed
    }

    service.register(PipelineQuery("budget_plan",
      // the q222 surface: per-source keep fraction + realized selection
      // to hit a token budget at the given mix weights; sources named
      // in the weights but absent from the corpus still report their
      // deficit row
      Seq(ParamSpec("budget", "long"),
        ParamSpec("weights", "string")),
      ps => {
        val budget = ps("budget").asInstanceOf[Long]
        if (budget < 0) throw new BadRequestException("'budget' must be >= 0")
        Sampling.budgetPlan(docs, col("source"), col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long"),
          parseWeightsPpm(ps("weights").asInstanceOf[String]), budget)
          .orderBy("source")
      }))

    service.register(PipelineQuery("dsir_select",
      // the q221 surface: DSIR importance scores toward the gate-clean
      // 'val' split, with the deterministic md5 keep gate realized
      Seq(ParamSpec("buckets", "long", required = false, default = Some(4096L)),
        ParamSpec("kept_only", "boolean", required = false, default = Some(false))),
      ps => {
        val nB = intParam(ps, "buckets")
        val d = docs
        val target = d
          .filter(TextAnalysis.gateKeep(col("text")))
          .filter(Sampling.hashSplit(col("doc_id"),
            Seq("train" -> 0.9, "val" -> 0.05), rest = "test") === "val")
        val out = TextAnalysis.dsirScore(d, target, "doc_id", "text", nBuckets = nB)
          .withColumn("keep_permille",
            least(lit(1000L), expr("dsir_ppm div 1000")))
          .withColumn("kept",
            Sampling.hashBucket(col("doc_id"), 1000) < col("keep_permille"))
        if (ps("kept_only").asInstanceOf[Boolean]) out.filter(col("kept")) else out
      }))

    service.register(PipelineQuery("decontaminate_by_set",
      // the q233 surface: per-(train doc, benchmark) attribution —
      // the eval slice splits into `sets` labeled benchmarks by id
      // modulus; output is sparse over actual leaks
      Seq(ParamSpec("sets", "long", required = false, default = Some(3L)),
        ParamSpec("n", "long", required = false, default = Some(5L)),
        ParamSpec("flag_at_pct", "long", required = false, default = Some(20L))),
      ps => {
        val sets = intParam(ps, "sets")
        val pct = intParam(ps, "flag_at_pct", min = 0)
        if (pct > 100) throw new BadRequestException("'flag_at_pct' must be <= 100")
        val split = Sampling.hashSplit(col("doc_id"),
          Seq("train" -> 0.9, "val" -> 0.05), rest = "test")
        graft.operators.Decontaminate.evalOverlapBySet(
          docs.filter(split === "train"),
          docs.filter(split === "test")
            .withColumn("bench", concat(lit("bench"), col("doc_id") % sets)),
          "doc_id", "text", "bench", intParam(ps, "n"), pct)
          .orderBy("doc_id", "eval_set")
      }))

    service.register(PipelineQuery("contamination_scorecard",
      // the q234 surface: flagged-doc ppm per (source, benchmark) —
      // the governance rollup of decontaminate_by_set
      Seq(ParamSpec("sets", "long", required = false, default = Some(3L)),
        ParamSpec("n", "long", required = false, default = Some(5L)),
        ParamSpec("flag_at_pct", "long", required = false, default = Some(20L))),
      ps => {
        val sets = intParam(ps, "sets")
        val pct = intParam(ps, "flag_at_pct", min = 0)
        if (pct > 100) throw new BadRequestException("'flag_at_pct' must be <= 100")
        val split = Sampling.hashSplit(col("doc_id"),
          Seq("train" -> 0.9, "val" -> 0.05), rest = "test")
        graft.operators.Decontaminate.contaminationBySource(
          docs.filter(split === "train"),
          docs.filter(split === "test")
            .withColumn("bench", concat(lit("bench"), col("doc_id") % sets)),
          "doc_id", "text", "source", "bench", intParam(ps, "n"), pct)
          .orderBy("source", "eval_set")
      }))

    service.register(PipelineQuery("curate_mix",
      // the q192 end-to-end training-mix surface: curate (gate → exact
      // dedup → split) → train only → per-source quota → epoch-weighted
      // repetition. `epochs` is "source:weight,source:weight" pairs;
      // unlisted sources weigh 1.0
      Seq(ParamSpec("quota", "long", required = false, default = Some(30L)),
        ParamSpec("epochs", "string", required = false, default = Some("")),
        // the q224 stage: drop train docs whose 5-gram overlap with the
        // held-out test slice breaches 20% before the quota rank
        ParamSpec("decontaminate", "boolean", required = false,
          default = Some(false))),
      ps => {
        val quota = intParam(ps, "quota")
        val weights = parseEpochWeights(ps("epochs").asInstanceOf[String])
        val trainBase = graft.operators.Curate(docs, "doc_id", "text")
          .filter(col("split") === "train")
          .join(docs.select("doc_id", "source"), Seq("doc_id"))
        val train = if (ps("decontaminate").asInstanceOf[Boolean]) {
          val evalSlice = docs.filter(Sampling.hashSplit(col("doc_id"),
            Seq("train" -> 0.9, "val" -> 0.05), rest = "test") === "test")
          val flags = graft.operators.Decontaminate.evalOverlap(
            trainBase.join(docs.select("doc_id", "text"), Seq("doc_id")),
            evalSlice, "doc_id", "text", n = 5, flagAtPct = 20)
          trainBase.join(flags.filter(!col("contaminated")).select("doc_id"),
            Seq("doc_id"))
        } else trainBase
        Sampling.epochMix(
            Sampling.quotaCap(train, Seq(col("source")), col("doc_id"), quota),
            col("source"), col("doc_id"), weights)
          .select(col("doc_id"), col("source"), col("n_tokens"), col("copy_idx"))
      }))

    service.register(PipelineQuery("mix_pack",
      // the q193 surface: curate_mix's realized stream packed into
      // fixed-length training sequences by the distributed prefix sum.
      // shard/n_shards is the training-loader handshake: worker i of N
      // requests its shard as a paged/ndjson stream; rows round-robin
      // by first_seq (first_seq % n_shards == shard), so the partition
      // is DETERMINISTIC — disjoint, complete, and stable across calls
      // because the whole chain is hash-arithmetic on ids, no RNG
      Seq(ParamSpec("quota", "long", required = false, default = Some(30L)),
        ParamSpec("epochs", "string", required = false, default = Some("")),
        ParamSpec("seq_len", "long", required = false, default = Some(512L)),
        ParamSpec("shard", "long", required = false, default = Some(0L)),
        ParamSpec("n_shards", "long", required = false, default = Some(1L))),
      ps => {
        val seqLen = intParam(ps, "seq_len")
        val nShards = intParam(ps, "n_shards")
        val shard = intParam(ps, "shard", min = 0)
        if (shard >= nShards)
          throw new BadRequestException(
            s"'shard' must be in [0, n_shards): got $shard of $nShards")
        // the (doc, copy) key packs dense as doc_id·4 + copy_idx;
        // epochMix yields copies = floor(w) + (0|1), so copy_idx stays
        // ≤ 3 for any w ≤ 4.0 — only weights past 4 would collide keys.
        // Parse with curate_mix's parser so a malformed entry gets the
        // same shape error here that curate_mix would raise, not a
        // misleading packability complaint.
        parseEpochWeights(ps("epochs").asInstanceOf[String]).foreach {
          case (s, w) =>
            if (w > 4.0) throw new BadRequestException(
              s"'epochs' weight for '$s' above 4 is not packable (copy key is doc_id*4+copy_idx)")
        }
        val mixed = service.runRegistered("curate_mix",
          Map("quota" -> ps("quota").toString, "epochs" -> ps("epochs").toString))
        val packed = graft.operators.Packing.concatChunk(
          mixed.select((col("doc_id") * 4 + col("copy_idx")).as("pack_id"),
            col("n_tokens")),
          "pack_id", col("n_tokens"), seqLen)
        // ordered so within-shard paging is stable too
        val sharded =
          if (nShards == 1) packed
          else packed.filter(
            pmod(col("first_seq"), lit(nShards.toLong)) === shard.toLong)
        sharded.orderBy("pack_id")
      }))

    service.register(PipelineQuery("chunk_overlap",
      Seq(ParamSpec("size", "long", required = false, default = Some(128L)),
        ParamSpec("stride", "long", required = false, default = Some(64L))),
      ps => {
        val (size, stride) = (intParam(ps, "size"), intParam(ps, "stride"))
        if (stride > size)
          throw new BadRequestException("need 1 <= stride <= size")
        TextAnalysis.chunkOverlap(docs, "doc_id", "text", size, stride)
      }))

    // the table's dimensionality is constant for this service: one
    // Spark job at first use, not one per request
    lazy val embDim: Int = Tpch.table(spark, sfDir, "embeddings")
      .select(size(col("embedding"))).head().getInt(0)
    // PQ assets for algo=pq: train + encode ONCE per service instance
    // (the corpus is fixed per sfDir), every request after that is a
    // codes-only ADC scan + candidate rescore
    lazy val pqAssets: (Seq[Seq[Seq[Double]]], org.apache.spark.sql.DataFrame) = {
      val emb = Tpch.table(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          graft.operators.Similarity.l2normalize(col("embedding")).as("nvec"))
        .localCheckpoint(true)
      val cbs = graft.operators.Similarity.pqTrain(emb, "nvec", "vec_id",
        m = 8, ksub = 16, iterations = 2)
      val codes = graft.operators.Similarity.pqEncode(emb, "vec_id", "nvec", cbs)
        .localCheckpoint(true)
      (cbs, codes)
    }
    service.register(PipelineQuery("ann_search",
      Seq(ParamSpec("vector", "string"),
        ParamSpec("k", "long", required = false, default = Some(10L)),
        ParamSpec("algo", "string", required = false, default = Some("exact")),
        // optional metadata predicate (the q125 surface): restrict the
        // search to one label; exact applies it pre-rank, lsh routes
        // through the filtered metadata-carrying store
        ParamSpec("label", "long", required = false, default = Some(-1L))),
      ps => {
        val k = intParam(ps, "k")
        val labelFilter = ps("label").asInstanceOf[Long]
        if (labelFilter < -1)
          throw new BadRequestException("'label' must be >= 0 (or omitted)")
        val vec = ps("vector").asInstanceOf[String].split(",").toSeq
          .map(_.trim).filter(_.nonEmpty).map { s =>
            val v = try s.toDouble catch {
              case _: NumberFormatException =>
                throw new BadRequestException(s"'vector' element not numeric: $s")
            }
            if (!java.lang.Double.isFinite(v))
              throw new BadRequestException("'vector' elements must be finite")
            v
          }
        if (vec.isEmpty)
          throw new BadRequestException("'vector' must list at least one component")
        if (vec.length != embDim)
          throw new BadRequestException(s"'vector' must have $embDim components")
        ps("algo").asInstanceOf[String] match {
          case "exact" =>
            val base = Tpch.table(spark, sfDir, "embeddings")
            val corpus = if (labelFilter >= 0)
              base.filter(org.apache.spark.sql.functions.col("label") === labelFilter)
            else base
            graft.operators.Similarity.bruteForceTopK(
              corpus, "embedding", "vec_id", vec, k)
          case "lsh" =>
            if (labelFilter < 0)
              throw new BadRequestException("algo=lsh requires 'label' " +
                "(the filtered-store probe; use exact for unfiltered)")
            graft.operators.Similarity.annTopKStoredFiltered(
              Tpch.table(spark, sfDir, "embeddings"), "embedding", "vec_id",
              sfDir, vec, k,
              predicate = org.apache.spark.sql.functions.col("label") === labelFilter,
              metaCols = Seq("label"), nBits = 3, nTables = 16)
          case "pq" =>
            val (cbs, codes) = pqAssets
            val norm = math.sqrt(vec.map(x => x * x).sum)
            val nq = if (norm == 0) vec else vec.map(_ / norm)
            graft.operators.Similarity.pqTopK(
              Tpch.table(spark, sfDir, "embeddings"), "embedding", "vec_id",
              codes, cbs, vec, k, candidates = math.max(100, 10 * k),
              adcQuery = Some(nq))
          case "bin" =>
            // binary sign-sketch tier (the q151 surface): XOR+popcount
            // candidate scan, exact cosine rescore
            graft.operators.Similarity.hammingTopK(
              Tpch.table(spark, sfDir, "embeddings"), "embedding", "vec_id",
              vec, k, candidates = math.max(64, 4 * k))
          case "ivfpq" =>
            // the composed at-scale store (q112/q190 surface): cell-
            // pruned ADC scan; with 'label' the predicate applies to
            // the probed code rows before ranking, and the probe width
            // derives from the store's measured filtered yield
            // (ivfPqTopKFiltered's adaptive default) — callers never
            // hand-tune a selectivity constant
            val emb = Tpch.table(spark, sfDir, "embeddings")
            if (labelFilter >= 0)
              graft.operators.Similarity.ivfPqTopKFiltered(
                emb, "embedding", "vec_id", sfDir, vec, k, k = 16, m = 8,
                predicate = org.apache.spark.sql.functions.col("label") === labelFilter,
                metaCols = Seq("label"),
                candidates = math.max(100, 10 * k))
            else
              graft.operators.Similarity.ivfPqTopK(
                emb, "embedding", "vec_id", sfDir, vec, kTop = k, k = 16,
                m = 8, nProbe = 8, candidates = math.max(100, 10 * k))
          case other =>
            throw new BadRequestException(
              s"'algo' must be exact|lsh|pq|bin|ivfpq, got '$other'")
        }
      }))

    service.register(PipelineQuery("winnow_matches",
      // the q156 surface: MOSS winnowing fingerprints + rare-hash match
      Seq(ParamSpec("kgram", "long", required = false, default = Some(8L)),
        ParamSpec("window", "long", required = false, default = Some(4L)),
        ParamSpec("max_df", "long", required = false, default = Some(4L)),
        ParamSpec("min_shared", "long", required = false, default = Some(2L))),
      ps => Dedup.winnowMatchPairs(docs, "doc_id", "text",
        intParam(ps, "kgram"), intParam(ps, "window"),
        intParam(ps, "max_df", min = 2), intParam(ps, "min_shared"))))

    service.register(PipelineQuery("containment",
      // the q153 surface: asymmetric shingle containment on id-window
      // candidate pairs (subset-duplicate detection)
      Seq(ParamSpec("shingle", "long", required = false, default = Some(3L)),
        ParamSpec("max_offset", "long", required = false, default = Some(3L)),
        ParamSpec("min_pm", "long", required = false, default = Some(0L))),
      ps => {
        val minPm = ps("min_pm").asInstanceOf[Long]
        if (minPm < 0 || minPm > 10000)
          throw new BadRequestException("'min_pm' must be in [0, 10000]")
        Dedup.containmentForPairs(docs, "doc_id", "text",
            intParam(ps, "shingle"),
            Dedup.nearIdPairs(docs, "doc_id", intParam(ps, "max_offset")))
          .filter(col("containment_pm") >= minPm)
      }))

    service.register(PipelineQuery("communities",
      // LPA communities over the near-dup pair graph (the q154
      // operator on the dedup_clusters graph): unlike components,
      // weakly-bridged clusters separate
      Seq(ParamSpec("threshold", "double", required = false, default = Some(0.5)),
        ParamSpec("iterations", "long", required = false, default = Some(3L))),
      ps => {
        val threshold = ps("threshold").asInstanceOf[Double]
        if (threshold <= 0 || threshold > 1)
          throw new BadRequestException("'threshold' must be in (0, 1]")
        val iters = intParam(ps, "iterations")
        if (iters > 20)
          throw new BadRequestException("'iterations' must be <= 20")
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
          k = 3, numHashes = 24, bands = 8, threshold = threshold)
        GraphAnalytics.labelPropagation(
          pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
          docs.select(col("doc_id").as("id")), iters)
      }))

    service.register(PipelineQuery("systematic_sample",
      // the q155 surface: deterministic weighted systematic sampling
      // ∝ token count — exactly k picks, zero RNG
      Seq(ParamSpec("k", "long", required = false, default = Some(100L))),
      ps => graft.operators.Packing.systematicSample(docs, "doc_id",
        TextAnalysis.tokenCount(col("text")), intParam(ps, "k"))))

    service.register(PipelineQuery("frame_sample",
      Seq(ParamSpec("every_n", "long", required = false, default = Some(2L)),
        ParamSpec("max_frames", "long", required = false, default = Some(2L))),
      ps => {
        // real multi-frame decode (the q101 surface) over the media
        // column attached to the documents ids — one row per sampled
        // frame with its true dims and mean color
        graft.operators.Multimodal.sampleFrames(
          graft.operators.Multimodal.attachVideo(docs, "doc_id"),
          intParam(ps, "every_n"), intParam(ps, "max_frames"))
      }))

    service.register(PipelineQuery("vocab",
      Seq(ParamSpec("top_k", "long", required = false, default = Some(50L))),
      ps => {
        TextAnalysis.vocab(docs, "doc_id", "text", intParam(ps, "top_k"))
      }))

    service.register(PipelineQuery("bpe_pairs",
      Seq(ParamSpec("top_k", "long", required = false, default = Some(30L))),
      ps => {
        TextAnalysis.bpePairCounts(docs, "text", intParam(ps, "top_k"))
      }))

    service.register(PipelineQuery("filter_gate",
      Seq(ParamSpec("only_dropped", "boolean", required = false, default = Some(false))),
      ps => {
        val gated = TextAnalysis.filterGate(docs, "doc_id", "text")
        if (ps("only_dropped").asInstanceOf[Boolean]) gated.filter(!col("keep"))
        else gated
      }))

    service.register(PipelineQuery("dup_spans",
      Seq(ParamSpec("window", "long", required = false, default = Some(8L)),
        ParamSpec("only_dups", "boolean", required = false, default = Some(false))),
      ps => {
        val spans = Dedup.dupSpans(docs, "doc_id", "text",
          intParam(ps, "window"))
        if (ps("only_dups").asInstanceOf[Boolean])
          spans.filter(col("n_dup_windows") > 0)
        else spans
      }))

    service.register(PipelineQuery("tfidf_keywords",
      Seq(ParamSpec("top_per_doc", "long", required = false, default = Some(3L))),
      ps => Search.tfidfKeywords(docs, "doc_id", "text",
        intParam(ps, "top_per_doc"))))

    service.register(PipelineQuery("keyword_probe",
      Seq(ParamSpec("terms", "string"),
        ParamSpec("k", "long", required = false, default = Some(10L))),
      ps => {
        val terms = ps("terms").asInstanceOf[String].split(",")
          .toSeq.map(_.trim.toLowerCase).filter(_.nonEmpty)
        if (terms.isEmpty)
          throw new BadRequestException("'terms' must list at least one term")
        // probes the written posting store (build-if-absent, then
        // partition-pruned to the terms' buckets — the q106 surface)
        val path = Search.ensurePostingStore(docs, "doc_id", "text", sfDir)
        Search.postingTopK(spark, path, terms, intParam(ps, "k"))
      }))

    service.register(PipelineQuery("phrase_search",
      Seq(ParamSpec("phrase", "string"),
        ParamSpec("k", "long", required = false, default = Some(10L))),
      ps => {
        // whitespace-separated exact phrase (order and repeats matter);
        // served from the written positional posting store — the q115
        // surface: bucket-pruned read, shifted-position intersection
        val phrase = ps("phrase").asInstanceOf[String].trim
          .split("\\s+").toSeq.map(_.toLowerCase).filter(_.nonEmpty)
        if (phrase.isEmpty)
          throw new BadRequestException("'phrase' must list at least one token")
        val path = Search.ensurePostingStore(docs, "doc_id", "text", sfDir)
        Search.phraseTopK(spark, path, phrase, intParam(ps, "k"))
      }))

    service.register(PipelineQuery("bigram_lm",
      Seq(ParamSpec("train_frac", "double", required = false, default = Some(0.9))),
      ps => {
        val frac = ps("train_frac").asInstanceOf[Double]
        if (frac <= 0 || frac >= 1)
          throw new BadRequestException("'train_frac' must be in (0, 1)")
        val split = docs.withColumn("split",
          Sampling.hashSplit(col("doc_id"), Seq("train" -> frac), rest = "test"))
        TextAnalysis.bigramLmScore(
          split.filter(col("split") === "train"),
          split.filter(col("split") === "test"),
          "doc_id", "text")
      }))

    service.register(PipelineQuery("curate",
      Seq(ParamSpec("train_frac", "double", required = false, default = Some(0.9)),
        ParamSpec("val_frac", "double", required = false, default = Some(0.05)),
        ParamSpec("near_dup", "boolean", required = false, default = Some(false)),
        // media keep-list tier (the q188/q191 compositions): drop docs
        // whose attached image/audio perceptually duplicates a kept
        // doc's media
        ParamSpec("media", "string", required = false, default = Some("none"))),
      ps => {
        val tf = ps("train_frac").asInstanceOf[Double]
        val vf = ps("val_frac").asInstanceOf[Double]
        if (tf <= 0 || vf < 0 || tf + vf >= 1)
          throw new BadRequestException(
            "'train_frac'/'val_frac' must satisfy 0 < train, 0 <= val, train+val < 1")
        // the q110/q114 composition, shared with the oracle-checked
        // catalog rows; near_dup=true adds the LSH-cluster keep-list
        // tier (min-id representative per near-dup family)
        val textKeep =
          if (!ps("near_dup").asInstanceOf[Boolean]) None
          else {
            val d = docs
            val pairs = Dedup.minhashNearDups(d, "doc_id", "text",
              k = 3, numHashes = 24, bands = 8, threshold = 0.5)
            Some(GraphAnalytics.connectedComponents(
                pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
                d.select(col("doc_id").as("id")))
              .filter(col("id") === col("component"))
              .select(col("id").as("doc_id")))
          }
        // keepIds (one codec pass), not keepList (joins the hashes
        // frame back to itself — re-decodes per reference)
        val mediaKeep = ps("media").asInstanceOf[String] match {
          case "none" => None
          case "image" => Some(Multimodal.dhashKeepIds(
            Multimodal.dhashMedia(Multimodal.attachPatternMedia(docs, "doc_id"))))
          case "audio" => Some(Multimodal.audioKeepIds(
            Multimodal.audioHashMedia(Multimodal.attachPatternAudio(docs, "doc_id"))))
          case other => throw new BadRequestException(
            s"'media' must be none|image|audio, got '$other'")
        }
        // both keep-lists compose as successive left-semi joins (ids
        // only): intersect here so Curate sees one list
        val keep = (textKeep, mediaKeep) match {
          case (Some(t), Some(m)) =>
            Some(t.join(m.select(col("id").as("doc_id")), Seq("doc_id"), "left_semi"))
          case (t, m) => t.orElse(m)
        }
        graft.operators.Curate(docs, "doc_id", "text",
          Seq("train" -> tf, "val" -> vf), nearDupKeep = keep)
      }))

    service.register(PipelineQuery("semantic_dedup",
      Seq(ParamSpec("threshold", "double", required = false, default = Some(0.99)),
        ParamSpec("only_dups", "boolean", required = false, default = Some(false))),
      ps => {
        val threshold = ps("threshold").asInstanceOf[Double]
        // the occupancy-bounded auto-width is recall-safe only for
        // NEAR-IDENTICAL vectors (Similarity.semanticDedup scaladoc);
        // at moderate thresholds wide signatures silently miss true
        // pairs, so reject instead of under-reporting duplicates
        if (threshold < 0.99 || threshold > 1)
          throw new BadRequestException("'threshold' must be in [0.99, 1] " +
            "(the auto-sized signature recall envelope; use dedup_clusters " +
            "for moderate-similarity clustering)")
        val out = graft.operators.Similarity.semanticDedup(
          Tpch.table(spark, sfDir, "embeddings"), "vec_id", "embedding", threshold)
        if (ps("only_dups").asInstanceOf[Boolean]) out.filter(!col("keep")) else out
      }))

    service.register(PipelineQuery("nn_graph",
      Seq(ParamSpec("threshold", "double", required = false, default = Some(0.99)),
        ParamSpec("k", "long", required = false, default = Some(5L))),
      ps => {
        val threshold = ps("threshold").asInstanceOf[Double]
        // same recall envelope as semantic_dedup (shared LSH path)
        if (threshold < 0.99 || threshold > 1)
          throw new BadRequestException("'threshold' must be in [0.99, 1] " +
            "(the auto-sized signature recall envelope)")
        graft.operators.Similarity.nnTopKJoin(
          Tpch.table(spark, sfDir, "embeddings"), "vec_id", "embedding",
          threshold, intParam(ps, "k"))
      }))

    service.register(PipelineQuery("hybrid_search",
      Seq(ParamSpec("terms", "string"),
        ParamSpec("k", "long", required = false, default = Some(10L)),
        ParamSpec("query_id", "long", required = false, default = Some(0L)),
        ParamSpec("stored", "boolean", required = false, default = Some(false))),
      ps => {
        // lexical BM25 list + dense cosine list (query = query_id's
        // embedding) fused by reciprocal rank — the q135 surface;
        // stored=true serves both lists from the written posting +
        // IVF stores instead of rescans (the q146 surface)
        val terms = ps("terms").asInstanceOf[String].split(",")
          .toSeq.map(_.trim.toLowerCase).filter(_.nonEmpty)
        if (terms.isEmpty)
          throw new BadRequestException("'terms' must list at least one term")
        val emb = Tpch.table(spark, sfDir, "embeddings")
        val qid = ps("query_id").asInstanceOf[Long]
        val qRows = emb.filter(col("vec_id") === qid).select(col("embedding")).take(1)
        if (qRows.isEmpty)
          throw new BadRequestException(s"'query_id' $qid has no embedding")
        val qv = qRows.head.getSeq[Float](0).map(_.toDouble)
        val k = intParam(ps, "k")
        import graft.operators.Similarity
        val (bmList, cosList) =
          if (ps("stored").asInstanceOf[Boolean]) {
            val postings = Search.ensurePostingStore(docs, "doc_id", "text", sfDir)
            val nEmb = emb.withColumn("nvec", Similarity.l2normalize(col("embedding")))
            val (assigned, centroids) = Similarity.ensureIvfStore(
              nEmb, "nvec", "embedding", "vec_id", sfDir, k = 8, iterations = 2)
            val norm = math.sqrt(qv.map(x => x * x).sum)
            val qN = if (norm == 0) qv else qv.map(_ / norm)
            (Search.bm25TopKStored(spark, postings, terms, k * 2),
              Similarity.ivfTopK(assigned, "embedding", "vec_id", centroids, qv,
                k = k * 2, nProbe = 6, probeVec = Some(qN)))
          } else
            (Search.bm25TopK(docs, "doc_id", "text", terms, k * 2),
              Similarity.bruteForceTopK(emb, "embedding", "vec_id", qv, k * 2))
        val bm = Search.rankTopK(bmList, Seq(col("score").desc, col("doc_id")))
          .select(col("doc_id"), col("rank"))
        val cos = Search.rankTopK(cosList, Seq(col("cos_sim").desc, col("id")))
          .select(col("id").as("doc_id"), col("rank"))
        Search.rrfFuse(Seq("bm25" -> bm, "cos" -> cos), "doc_id", topK = k)
      }))

    service.register(PipelineQuery("novelty",
      Seq(ParamSpec("window", "long", required = false, default = Some(4L)),
        ParamSpec("only_stale", "boolean", required = false, default = Some(false))),
      ps => {
        val nov = graft.operators.Dedup.noveltyScores(docs, "doc_id", "text",
          intParam(ps, "window"))
        if (ps("only_stale").asInstanceOf[Boolean])
          nov.filter(col("novelty_pm") < 10000 && col("n_windows") > 0)
        else nov
      }))

    service.register(PipelineQuery("token_drift",
      Seq(ParamSpec("top_k", "long", required = false, default = Some(20L)),
        ParamSpec("min_total", "long", required = false, default = Some(2L))),
      ps => {
        // split-health audit between the q77 train/test slices
        val split = docs.withColumn("split",
          Sampling.hashSplit(col("doc_id"), Seq("train" -> 0.9, "val" -> 0.05),
            rest = "test"))
        TextAnalysis.tokenDrift(
          split.filter(col("split") === "train"),
          split.filter(col("split") === "test"), "text",
          intParam(ps, "min_total"), intParam(ps, "top_k"))
          .select(col("w").as("token"), col("c_a").as("c_train"),
            col("c_b").as("c_test"), col("chi2"))
      }))

    service.register(PipelineQuery("rolling_anomaly",
      Seq(ParamSpec("lookback", "long", required = false, default = Some(20L)),
        ParamSpec("sigmas", "double", required = false, default = Some(3.0)),
        ParamSpec("only_anomalies", "boolean", required = false, default = Some(false))),
      ps => {
        val sigmas = ps("sigmas").asInstanceOf[Double]
        if (!(sigmas > 0) || sigmas.isInfinite)
          throw new BadRequestException("'sigmas' must be finite and > 0")
        val lookback = intParam(ps, "lookback", min = 2)
        val scored = graft.operators.TimeSeries.rollingZscore(
          graft.QueryDef.events(spark, sfDir), "user_id", "value",
          Seq(col("ts"), col("event_id")),
          lookback = lookback, minPrior = math.min(5, lookback), sigmas = sigmas)
          .select(col("event_id"), col("user_id"), col("ts"), col("value"),
            col("n_prior"), col("z"), col("is_anomaly"))
        if (ps("only_anomalies").asInstanceOf[Boolean])
          scored.filter(col("is_anomaly"))
        else scored
      }))

    service.register(PipelineQuery("readability",
      // the q157 surface: all-integer Flesch scoring per document
      Seq(ParamSpec("max_flesch_pm", "long", required = false,
        default = Some(Long.MaxValue))),
      ps => {
        val cap = ps("max_flesch_pm").asInstanceOf[Long]
        val scored = TextAnalysis.readability(docs, "doc_id", "text")
        if (cap == Long.MaxValue) scored else scored.filter(col("flesch_pm") <= cap)
      }))

    service.register(PipelineQuery("autocorrelation",
      // the q160 surface: per-event-type ACF over hourly buckets
      Seq(ParamSpec("max_lag", "long", required = false, default = Some(3L))),
      ps => {
        val maxLag = intParam(ps, "max_lag")
        if (maxLag > 168)
          throw new BadRequestException("'max_lag' must be <= 168 (one week of hours)")
        graft.operators.TimeSeries.autocorrelation(
          graft.QueryDef.events(spark, sfDir), "event_type", "ts", "value", maxLag)
      }))

    service.register(PipelineQuery("mmr_rerank",
      // the q161 surface: diversity re-ranking of the exact cosine
      // candidates for a stored query vector
      Seq(ParamSpec("query_id", "long", required = false, default = Some(0L)),
        ParamSpec("cand_k", "long", required = false, default = Some(20L)),
        ParamSpec("select_k", "long", required = false, default = Some(5L)),
        ParamSpec("lambda_pm", "long", required = false, default = Some(7000L))),
      ps => {
        val candK = intParam(ps, "cand_k")
        val selectK = intParam(ps, "select_k")
        if (candK > 1000)
          throw new BadRequestException("'cand_k' must be <= 1000 (the greedy " +
            "stage collects the candidate list)")
        if (selectK > candK)
          throw new BadRequestException("'select_k' must be <= cand_k")
        val lambdaPm = intParam(ps, "lambda_pm", min = 0)
        if (lambdaPm > 10000)
          throw new BadRequestException("'lambda_pm' must be in [0, 10000]")
        val qid = ps("query_id").asInstanceOf[Long]
        val emb = Tpch.table(spark, sfDir, "embeddings")
        val qRows = emb.filter(col("vec_id") === qid).select("embedding").take(1)
        if (qRows.isEmpty)
          throw new BadRequestException(s"'query_id' $qid has no embedding")
        val q = qRows(0).getSeq[Float](0).map(_.toDouble)
        graft.operators.Similarity.mmrRerank(emb.filter(col("vec_id") =!= qid),
          "embedding", "vec_id", q, candK, selectK, lambdaPm)
      }))

    service.register(PipelineQuery("kcore",
      // the q159 operator on the near-dup pair graph: documents in the
      // k-core are entangled in DENSE duplication clusters (each near-
      // duplicates ≥ k others that near-duplicate each other) — the
      // high-priority review set a dedup audit triages first
      Seq(ParamSpec("k", "long", required = false, default = Some(3L)),
        ParamSpec("threshold", "double", required = false, default = Some(0.5))),
      ps => {
        val threshold = ps("threshold").asInstanceOf[Double]
        if (threshold <= 0 || threshold > 1)
          throw new BadRequestException("'threshold' must be in (0, 1]")
        val k = intParam(ps, "k")
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
          k = 3, numHashes = 24, bands = 8, threshold = threshold)
        GraphAnalytics.kCore(
          pairs.select(col("id_a").as("src"), col("id_b").as("dst")), k)
          .select(col("id").as("doc_id"), col("core_degree"))
      }))

    service.register(PipelineQuery("sessions",
      // the q162 surface: gap-based per-session records over events
      Seq(ParamSpec("gap_seconds", "long", required = false, default = Some(1800L)),
        ParamSpec("min_events", "long", required = false, default = Some(1L))),
      ps => {
        val gap = ps("gap_seconds").asInstanceOf[Long]
        if (gap < 1 || gap > 86400L * 365)
          throw new BadRequestException("'gap_seconds' must be in [1, 1 year]")
        val minEvents = intParam(ps, "min_events")
        graft.operators.TimeSeries.sessions(
          graft.QueryDef.events(spark, sfDir), "user_id", "ts", "event_id", gap)
          .filter(col("n_events") >= minEvents)
      }))

    service.register(PipelineQuery("level_shifts",
      // the q163 surface: two-sided sliding-window changepoint screen
      Seq(ParamSpec("window", "long", required = false, default = Some(24L)),
        ParamSpec("min_diff_cents", "long", required = false, default = Some(40000L))),
      ps => {
        val w = intParam(ps, "window")
        if (w > 168)
          throw new BadRequestException("'window' must be <= 168 (one week of hours)")
        val minDiff = ps("min_diff_cents").asInstanceOf[Long]
        if (minDiff < 0)
          throw new BadRequestException("'min_diff_cents' must be >= 0")
        graft.operators.TimeSeries.levelShifts(
          graft.QueryDef.events(spark, sfDir), "event_type", "ts", "value",
          w, minDiff)
      }))

    service.register(PipelineQuery("link_prediction",
      // the q164 operator on the near-dup pair graph: a predicted
      // link = two documents that don't near-duplicate each other but
      // share many near-dup partners — the "same template family,
      // different fill" signal a curation audit chases next
      Seq(ParamSpec("k", "long", required = false, default = Some(50L)),
        ParamSpec("max_degree", "long", required = false, default = Some(16L)),
        ParamSpec("threshold", "double", required = false, default = Some(0.5))),
      ps => {
        val threshold = ps("threshold").asInstanceOf[Double]
        if (threshold <= 0 || threshold > 1)
          throw new BadRequestException("'threshold' must be in (0, 1]")
        val k = intParam(ps, "k")
        val maxDegree = intParam(ps, "max_degree", min = 2)
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
          k = 3, numHashes = 24, bands = 8, threshold = threshold)
        GraphAnalytics.linkPrediction(
          pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
          maxDegree.toLong, k)
      }))

    service.register(PipelineQuery("blocklist",
      // the q165 surface: caller-supplied term/phrase blocklist
      Seq(ParamSpec("patterns", "string"),
        ParamSpec("block_at", "long", required = false, default = Some(3L)),
        ParamSpec("only_blocked", "boolean", required = false, default = Some(false))),
      ps => {
        val pats = ps("patterns").asInstanceOf[String].split(',').map(_.trim)
          .filter(_.nonEmpty).toSeq
        if (pats.isEmpty)
          throw new BadRequestException("'patterns' must list at least one term")
        if (!pats.forall(_.matches("[A-Za-z0-9 ]+")))
          throw new BadRequestException(
            "patterns must be plain word/phrase literals (letters/digits/spaces)")
        val blockAt = intParam(ps, "block_at")
        val out = TextAnalysis.blocklistSummary(docs, "doc_id", "text",
          pats, blockAt.toLong)
        if (ps("only_blocked").asInstanceOf[Boolean]) out.filter(col("blocked")) else out
      }))

    service.register(PipelineQuery("image_neardups",
      // the q167 surface: perceptual-hash near-dup profile of the
      // media corpus at distinct-fingerprint grain
      Seq(ParamSpec("max_hamming", "long", required = false, default = Some(3L)),
        ParamSpec("pairs", "boolean", required = false, default = Some(false))),
      ps => {
        val maxHam = ps("max_hamming").asInstanceOf[Long]
        if (maxHam < 0 || maxHam > 3)
          throw new BadRequestException(
            "'max_hamming' must be in [0, 3] (banded recall is exact there)")
        val hashes = Multimodal.dhashMedia(
          Multimodal.attachPatternMedia(docs, "doc_id"))
        if (ps("pairs").asInstanceOf[Boolean])
          Multimodal.dhashNearDupPairs(hashes, maxHam.toInt)
        else Multimodal.dhashNearDupStats(hashes, maxHam.toInt)
      }))

    service.register(PipelineQuery("audio_neardups",
      // the q189/q167 surface for SOUND: perceptual audio-fingerprint
      // near-dup profile at distinct-fingerprint grain (the banding
      // machinery is fingerprint-agnostic — the hash column is the
      // only difference, bridged by a rename at each edge)
      Seq(ParamSpec("max_hamming", "long", required = false, default = Some(3L)),
        ParamSpec("pairs", "boolean", required = false, default = Some(false))),
      ps => {
        val maxHam = ps("max_hamming").asInstanceOf[Long]
        if (maxHam < 0 || maxHam > 3)
          throw new BadRequestException(
            "'max_hamming' must be in [0, 3] (banded recall is exact there)")
        val hashes = Multimodal.audioHashMedia(
            Multimodal.attachPatternAudio(docs, "doc_id"))
          .withColumnRenamed("ahash", "dhash")
        if (ps("pairs").asInstanceOf[Boolean])
          Multimodal.dhashNearDupPairs(hashes, maxHam.toInt)
            .withColumnsRenamed(Map("dhash_a" -> "ahash_a", "dhash_b" -> "ahash_b"))
        else Multimodal.dhashNearDupStats(hashes, maxHam.toInt)
      }))

    service.register(PipelineQuery("ewma",
      // the q169 surface: dyadic-weight trend smoothing per event type
      Seq(ParamSpec("lookback", "long", required = false, default = Some(8L))),
      ps => {
        val lookback = intParam(ps, "lookback")
        if (lookback > 32)
          throw new BadRequestException(
            "'lookback' must be <= 32 (cents*2^lookback must stay in int64)")
        graft.operators.TimeSeries.ewma(
          graft.QueryDef.events(spark, sfDir), "event_type", "ts", "value", lookback)
      }))

    service.register(PipelineQuery("standardize_dims",
      // the q168 surface: per-dimension z-scores at element grain,
      // optionally clipped to one vector
      Seq(ParamSpec("vec_id", "long", required = false, default = Some(-1L))),
      ps => {
        val vecId = ps("vec_id").asInstanceOf[Long]
        if (vecId < -1)
          throw new BadRequestException("'vec_id' must be >= 0 (or omitted)")
        val out = graft.operators.Similarity.standardizeDims(
          Tpch.table(spark, sfDir, "embeddings"), "vec_id", "embedding")
        if (vecId >= 0) out.filter(col("vec_id") === vecId) else out
      }))

    service.register(PipelineQuery("copurchase_graph",
      // the q170 surface: weighted co-occurrence projection over
      // caller-bounded group sizes
      Seq(ParamSpec("max_items", "long", required = false, default = Some(6L)),
        ParamSpec("min_weight", "long", required = false, default = Some(1L)),
        ParamSpec("k", "long", required = false, default = Some(100L))),
      ps => {
        val maxItems = intParam(ps, "max_items", min = 2)
        val minWeight = ps("min_weight").asInstanceOf[Long]
        if (minWeight < 1)
          throw new BadRequestException("'min_weight' must be >= 1")
        graft.operators.GraphAnalytics.projectCoOccurrence(
          Tpch.table(spark, sfDir, "lineitem").select(
            col("l_orderkey").as("g"), col("l_partkey").as("item")),
          "g", "item", maxItems, minWeight, intParam(ps, "k"))
      }))

    service.register(PipelineQuery("degree_summary",
      // the q175 surface: degree histogram + assortativity of the
      // near-dup pair graph
      Seq(ParamSpec("threshold", "double", required = false, default = Some(0.5))),
      ps => {
        val threshold = ps("threshold").asInstanceOf[Double]
        if (threshold <= 0 || threshold > 1)
          throw new BadRequestException("'threshold' must be in (0, 1]")
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
          k = 3, numHashes = 24, bands = 8, threshold = threshold)
        GraphAnalytics.degreeSummary(
          pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      }))

    service.register(PipelineQuery("harmonic_centrality",
      // the q176 surface: sampled-root harmonic centrality over the
      // knows graph
      Seq(ParamSpec("sources", "string", required = false, default = Some("0,1,2,3")),
        ParamSpec("max_depth", "long", required = false, default = Some(4L))),
      ps => {
        val maxDepth = intParam(ps, "max_depth")
        if (maxDepth > 8)
          throw new BadRequestException("'max_depth' must be <= 8")
        val sources = ps("sources").asInstanceOf[String].split(',')
          .map(_.trim).filter(_.nonEmpty).map { s =>
            try s.toLong catch {
              case _: NumberFormatException =>
                throw new BadRequestException(s"'sources' element not numeric: $s")
            }
          }.toSeq
        if (sources.isEmpty || sources.size > 64)
          throw new BadRequestException("'sources' must list 1..64 roots")
        GraphAnalytics.harmonicCentrality(
          Tpch.graph(spark, sfDir).edgeFrame("knows").select(col("src"), col("dst")),
          sources, maxDepth)
      }))

    service.register(PipelineQuery("seasonal_residuals",
      // the q174 surface: day-over-day wall-clock deviation monitor
      Seq(ParamSpec("season_hours", "long", required = false, default = Some(24L)),
        ParamSpec("min_resid_cents", "long", required = false, default = Some(0L))),
      ps => {
        val season = intParam(ps, "season_hours")
        if (season > 8760)
          throw new BadRequestException("'season_hours' must be <= 8760 (one year)")
        val minResid = ps("min_resid_cents").asInstanceOf[Long]
        if (minResid < 0)
          throw new BadRequestException("'min_resid_cents' must be >= 0")
        graft.operators.TimeSeries.seasonalResiduals(
          graft.QueryDef.events(spark, sfDir), "event_type", "ts", "value",
          season, minResid)
      }))

    service.register(PipelineQuery("trend",
      // the q171 surface: per-type least-squares slope/intercept
      Seq(ParamSpec("min_slope_cents", "double", required = false,
        default = Some(Double.NegativeInfinity))),
      ps => {
        val minSlope = ps("min_slope_cents").asInstanceOf[Double]
        val out = graft.operators.TimeSeries.trend(
          graft.QueryDef.events(spark, sfDir), "event_type", "ts", "value")
        if (minSlope.isNegInfinity) out else out.filter(col("slope") >= minSlope)
      }))

    service.register(PipelineQuery("quantile_audit",
      // the q172 surface: exact percentiles + sketch-contract check
      Seq.empty,
      _ => graft.SparkEntry.queries("q172_quantile_sketch")(spark, sfDir)))

    service.register(PipelineQuery("source_scorecard",
      // the q173 surface: per-source governance audit
      Seq(ParamSpec("min_tokens", "long", required = false, default = Some(30L)),
        ParamSpec("max_dup_pm", "long", required = false, default = Some(10000L))),
      ps => {
        val minTokens = ps("min_tokens").asInstanceOf[Long]
        if (minTokens < 0)
          throw new BadRequestException("'min_tokens' must be >= 0")
        val maxDup = ps("max_dup_pm").asInstanceOf[Long]
        if (maxDup < 0 || maxDup > 10000)
          throw new BadRequestException("'max_dup_pm' must be in [0, 10000]")
        TextAnalysis.sourceScorecard(docs, "doc_id", "text",
          "source", "lang", minTokens)
          .filter(col("dup_pm") <= maxDup)
      }))

    service.register(PipelineQuery("rank_transform",
      // the q177 surface: per-dim quantile normalization at element
      // grain, optionally clipped to one vector
      Seq(ParamSpec("vec_id", "long", required = false, default = Some(-1L))),
      ps => {
        val vecId = ps("vec_id").asInstanceOf[Long]
        if (vecId < -1)
          throw new BadRequestException("'vec_id' must be >= 0 (or omitted)")
        val out = graft.operators.Similarity.rankTransform(
          Tpch.table(spark, sfDir, "embeddings"), "vec_id", "embedding")
        if (vecId >= 0) out.filter(col("vec_id") === vecId) else out
      }))

    service.register(PipelineQuery("class_weights",
      // the q178 surface: balanced label weights for the embedding corpus
      Seq.empty,
      _ => graft.operators.Sampling.classWeights(
        Tpch.table(spark, sfDir, "embeddings"), "label")))

    service.register(PipelineQuery("hot_keys",
      // the q179 surface: pre-join skew audit over a caller-chosen
      // lineitem key column
      Seq(ParamSpec("key", "string", required = false, default = Some("l_suppkey")),
        ParamSpec("k", "long", required = false, default = Some(20L))),
      ps => {
        val key = ps("key").asInstanceOf[String]
        val allowed = Set("l_suppkey", "l_partkey", "l_orderkey")
        if (!allowed(key))
          throw new BadRequestException(
            s"'key' must be one of ${allowed.mkString(", ")}")
        graft.operators.Skew.hotKeys(
          Tpch.table(spark, sfDir, "lineitem").select(col(key)),
          key, intParam(ps, "k"))
      }))

    service.register(PipelineQuery("power_iteration",
      // the q180 surface: dominant principal direction (micro-units)
      Seq(ParamSpec("iterations", "long", required = false, default = Some(3L))),
      ps => {
        val iterations = intParam(ps, "iterations")
        if (iterations > 10)
          throw new BadRequestException("'iterations' must be <= 10")
        val v = graft.operators.Similarity.powerIteration(
          Tpch.table(spark, sfDir, "embeddings"), "vec_id", "embedding", iterations)
        import spark.implicits._
        v.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("dim", "v_micro")
      }))

    service.register(PipelineQuery("abtt",
      // the q181 surface: centered, top-component-removed embeddings
      // at element grain, optionally clipped to one vector
      Seq(ParamSpec("vec_id", "long", required = false, default = Some(-1L)),
        ParamSpec("iterations", "long", required = false, default = Some(3L))),
      ps => {
        val iterations = intParam(ps, "iterations")
        if (iterations > 10)
          throw new BadRequestException("'iterations' must be <= 10")
        val vecId = ps("vec_id").asInstanceOf[Long]
        if (vecId < -1)
          throw new BadRequestException("'vec_id' must be >= 0 (or omitted)")
        val out = graft.operators.Similarity.abttPostprocess(
          Tpch.table(spark, sfDir, "embeddings"), "vec_id", "embedding", iterations)
        if (vecId >= 0) out.filter(col("id") === vecId) else out
      }))

    service.register(PipelineQuery("regional_revenue",
      // the q182 surface: the 6-table revenue rollup
      Seq.empty,
      _ => graft.SparkEntry.queries("q182_regional_revenue")(spark, sfDir)))

    service.register(PipelineQuery("edge_integrity",
      // the q183 surface: dangling-endpoint audit per edge label
      Seq(ParamSpec("edge", "string", required = false, default = Some("placed"))),
      ps => {
        val g = Tpch.graph(spark, sfDir)
        val edge = ps("edge").asInstanceOf[String]
        val endpoints = Map(
          "placed" -> ("customer", "order"),
          "contains" -> ("order", "part"),
          "supplied_by" -> ("part", "supplier"),
          "knows" -> ("customer", "customer"))
        endpoints.get(edge) match {
          case Some((sv, dv)) =>
            GraphAnalytics.edgeIntegrity(g.edgeFrame(edge),
              g.vertexFrame(sv).select(col("id")), g.vertexFrame(dv).select(col("id")))
          case None => throw new BadRequestException(
            s"'edge' must be one of ${endpoints.keys.toSeq.sorted.mkString(", ")}")
        }
      }))

    service.register(PipelineQuery("label_similarity",
      // the q184 surface: embedding-space label confusion audit
      Seq(ParamSpec("min_cosine", "double", required = false, default = Some(-1.0))),
      ps => {
        val minCos = ps("min_cosine").asInstanceOf[Double]
        if (minCos < -1.0 || minCos > 1.0)
          throw new BadRequestException("'min_cosine' must be in [-1, 1]")
        graft.operators.Similarity.labelCentroidSimilarity(
          Tpch.table(spark, sfDir, "embeddings"), "vec_id", "embedding", "label")
          .filter(col("cosine") >= minCos)
      }))

    service.register(PipelineQuery("source_similarity",
      // the q185 surface: pairwise source-vocabulary Jaccard
      Seq(ParamSpec("min_jaccard_pm", "long", required = false, default = Some(0L))),
      ps => {
        val minJ = ps("min_jaccard_pm").asInstanceOf[Long]
        if (minJ < 0 || minJ > 10000)
          throw new BadRequestException("'min_jaccard_pm' must be in [0, 10000]")
        TextAnalysis.sourceSimilarity(docs, "text", "source")
          .filter(col("jaccard_pm") >= minJ)
      }))

    service.register(PipelineQuery("vocab_growth",
      // the q186 surface: Heaps'-law saturation curve
      Seq(ParamSpec("buckets", "long", required = false, default = Some(10L))),
      ps => {
        val buckets = intParam(ps, "buckets")
        if (buckets > 100)
          throw new BadRequestException("'buckets' must be <= 100")
        TextAnalysis.vocabGrowth(docs, "doc_id", "text", buckets)
      }))

    service.register(PipelineQuery("dup_histogram",
      // the q187 surface: exact-dup class-size distribution
      Seq.empty,
      _ => graft.SparkEntry.queries("q187_dup_class_histogram")(spark, sfDir)))

    // a WRITE-effect pipeline query: materializes the redacted corpus.
    // Registered unconditionally — the service's effects gate 403s it
    // on read-only endpoints, which is the point of the flag.
    service.register(PipelineQuery("pii_redact_store",
      Seq(ParamSpec("path", "string")),
      ps => {
        val path = ps("path").asInstanceOf[String]
        val redacted = docs.select(col("doc_id"), Pii.redact(col("text")).as("text"))
        redacted.write.mode("overwrite").parquet(path)
        import spark.implicits._
        Seq((path, spark.read.parquet(path).count())).toDF("path", "rows_written")
      },
      writes = true))
  }
}
