package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.functions._

import graft.model.Tpch
import graft.query._
import graft.service.QueryService
import graft.service.QueryService._

/** Service-tier semantics: JSON DSL parsing, param coercion, bounds,
  * effects policy, HTTP status mapping (rest-tests analog).
  */
class ServiceSpec extends SparkSpec {

  private lazy val g = Tpch.graph(spark, sf)
  private lazy val service = {
    val s = new QueryService(g, maxLimit = 100)
    s.register(RegisteredQuery(
      name = "customers_by_segment",
      params = Seq(ParamSpec("segment", "string"), ParamSpec("min_bal", "double", required = false, default = Some(0.0))),
      build = p => PatternQuery(
        goals = Seq(IsA("a", "customer"),
          Slot("a", "c_mktsegment", "seg"), Slot("a", "c_acctbal", "bal"),
          Filter(col("seg") === lit(p("segment")) && col("bal") >= lit(p("min_bal")))),
        select = Seq("a" -> "custkey"),
        orderBy = Seq(col("custkey")))))
    s.register(RegisteredQuery("danger_write", Seq.empty,
      _ => PatternQuery(Seq(IsA("a", "customer")), Seq("a" -> "id")), writes = true))
    s
  }

  test("registered query with coerced params") {
    val df = service.runRegistered("customers_by_segment",
      Map("segment" -> "BUILDING", "min_bal" -> "100.5"))
    assert(df.count() > 0)
    assert(df.columns.sameElements(Array("custkey")))
  }

  test("param coercion failures are client errors") {
    intercept[BadRequestException] {
      service.runRegistered("customers_by_segment", Map("segment" -> "B", "min_bal" -> "abc"))
    }
    intercept[BadRequestException] {
      service.runRegistered("customers_by_segment", Map.empty) // missing required
    }
    intercept[BadRequestException] {
      service.runRegistered("customers_by_segment",
        Map("segment" -> "B", "rogue" -> "1")) // unexpected param
    }
    intercept[BadRequestException] { service.runRegistered("nope", Map.empty) }
  }

  test("write effect denied in read-only service") {
    intercept[ForbiddenException] { service.runRegistered("danger_write", Map.empty) }
  }

  test("pipeline-query tier: BM25/dedup/PII through the registered surface") {
    graft.service.PipelineQueries.install(service, spark, sf)
    // BM25 with coerced long k
    val bm = service.runRegistered("bm25_search", Map("terms" -> "spark, merge", "k" -> "5"))
    assert(bm.count() == 5)
    assert(bm.columns.sameElements(Array("doc_id", "score")))
    // dedup clustering: every doc gets a cluster rep; reps keep themselves
    val dd = service.runRegistered("dedup_clusters", Map("threshold" -> "0.5"))
    assert(dd.columns.sameElements(Array("doc_id", "cluster_rep", "keep")))
    assert(dd.filter(col("doc_id") === col("cluster_rep") && !col("keep")).count() == 0)
    // PII scan clamps to the service max (500 docs, maxLimit 100)
    assert(service.runRegistered("pii_scan", Map.empty).count() == 100)
    // typed coercion + domain checks + unexpected params are 400s
    intercept[BadRequestException] {
      service.runRegistered("bm25_search", Map("terms" -> "spark", "k" -> "abc"))
    }
    intercept[BadRequestException] {
      service.runRegistered("bm25_search", Map("terms" -> " , ", "k" -> "3"))
    }
    intercept[BadRequestException] {
      service.runRegistered("dedup_clusters", Map("threshold" -> "5.0"))
    }
    intercept[BadRequestException] {
      service.runRegistered("pii_scan", Map("rogue" -> "1"))
    }
    // the write-effect pipeline query is 403 on this read-only service
    intercept[ForbiddenException] {
      service.runRegistered("pii_redact_store", Map("path" -> "target/nope"))
    }
    // round-15 surfaces: hard negatives exclude full matches; the
    // temperature mix emits one row per source with exact shares; the
    // vocab-coverage audit bounds its ppm columns
    val hn = service.runRegistered("hard_negatives",
      Map("terms" -> "spark, merge", "k" -> "5"))
    assert(hn.columns.sameElements(Array("doc_id", "score", "n_terms_matched")))
    assert(hn.filter(col("n_terms_matched") >= 2).count() == 0)
    val tm = service.runRegistered("temperature_mix", Map("budget" -> "100000"))
    assert(tm.columns.contains("weight_ppm") &&
      tm.agg(org.apache.spark.sql.functions.sum("weight_ppm")).head.getLong(0)
        <= 1000000L)
    intercept[BadRequestException] {
      service.runRegistered("temperature_mix",
        Map("budget" -> "100", "sqrts" -> "5"))
    }
    intercept[BadRequestException] {
      service.runRegistered("temperature_mix", Map("budget" -> "-1"))
    }
    val vc = service.runRegistered("vocab_coverage", Map("top_k" -> "10"))
    assert(vc.filter(col("coverage_ppm") > 1000000L ||
      col("type_coverage_ppm") > 1000000L).count() == 0)
    intercept[BadRequestException] {
      service.runRegistered("vocab_coverage", Map("top_k" -> "0"))
    }
    // per-benchmark attribution: sparse rows, hits bounded by grams,
    // scorecard ppm bounded; pct domain enforced
    val dbs = service.runRegistered("decontaminate_by_set",
      Map("sets" -> "2", "flag_at_pct" -> "0"))
    assert(dbs.columns.sameElements(
      Array("doc_id", "eval_set", "n_grams", "n_hit", "contaminated")))
    assert(dbs.filter(col("n_hit") > col("n_grams") || col("n_hit") < 1).count() == 0)
    val csc = service.runRegistered("contamination_scorecard", Map("sets" -> "2"))
    assert(csc.filter(col("flagged_ppm") > 1000000L ||
      col("n_flagged") > col("n_docs")).count() == 0)
    intercept[BadRequestException] {
      service.runRegistered("decontaminate_by_set", Map("flag_at_pct" -> "101"))
    }
    // round-16 surfaces: span removal keeps counts consistent; lm
    // tiers label head/middle/tail per language; curriculum stages
    // bound and steps monotone in offsets; contrastive pairs never
    // anchor a doc to itself
    val spanRm = service.runRegistered("dedup_span_removal", Map("k" -> "8"))
    assert(spanRm.columns.sameElements(Array("doc_id", "n_tokens", "n_removed",
      "removed_pm", "cleaned_fp")))
    assert(spanRm.filter(col("n_removed") > col("n_tokens") ||
      col("removed_pm") > 10000L).count() == 0)
    val lt = service.runRegistered("lm_tiers", Map.empty)
    assert(lt.columns.sameElements(Array("doc_id", "lang", "n_bigrams",
      "score_ppm", "bucket", "tier")))
    assert(lt.filter(!col("tier").isin("head", "middle", "tail")).count() == 0)
    intercept[BadRequestException] {
      service.runRegistered("lm_tiers", Map("tiers" -> "1"))
    }
    val curr = service.runRegistered("curriculum",
      Map("stages" -> "4", "tokens_per_step" -> "500"))
    assert(curr.filter(col("stage") < 1 || col("stage") > 4).count() == 0)
    assert(curr.filter(col("step") =!= expr("start_offset div 500")).count() == 0)
    intercept[BadRequestException] {
      service.runRegistered("curriculum", Map("tokens_per_step" -> "0"))
    }
    val cpairs = service.runRegistered("contrastive_pairs", Map("threshold" -> "0.5"))
    assert(cpairs.columns.sameElements(Array("anchor_id", "positive_id",
      "n_inter", "n_union", "jaccard_pm")))
    assert(cpairs.filter(col("anchor_id") === col("positive_id") ||
      col("jaccard_pm") > 10000L).count() == 0)
    val ct = service.runRegistered("contrastive_triplets",
      Map("threshold" -> "0.5"))
    assert(ct.columns.sameElements(Array("anchor_id", "positive_id",
      "negative_id", "pos_pm", "neg_pm")))
    assert(ct.filter(col("neg_pm") >= 5000L ||
      col("negative_id") === col("positive_id") ||
      col("negative_id") === col("anchor_id")).count() == 0)
    intercept[BadRequestException] {
      service.runRegistered("contrastive_triplets", Map("max_df" -> "1"))
    }
    val tf = service.runRegistered("tokenizer_fertility", Map.empty)
    assert(tf.columns.sameElements(Array("lang", "source", "n_docs",
      "ws_tokens", "bpe_tokens", "chars", "bpe_per_kchar", "bpe_per_ws_ppm")))
    assert(tf.filter(col("bpe_tokens") < col("ws_tokens")).count() == 0,
      "BPE pre-tokens can only split whitespace words, never merge them")
    // mixture/chunking samplers: coerced params, domain checks
    val qs = service.runRegistered("quota_sample", Map("quota" -> "3"))
    assert(qs.columns.sameElements(Array("doc_id", "source", "lang")))
    assert(qs.groupBy("source", "lang").count()
      .filter(col("count") > 3).count() == 0)
    // the service clamp (limit) may truncate mid-document, so assert
    // copy bounds rather than exact per-doc counts
    val em = service.runRegistered("epoch_mix",
      Map("source" -> "src0", "epochs" -> "2.0"))
    val emCnt = em.filter(col("source") === "src0").groupBy("doc_id").count()
    assert(emCnt.filter(col("count") > 2).count() == 0)
    assert(emCnt.filter(col("count") === 2).count() > 0)
    val ch = service.runRegistered("chunk_overlap",
      Map("size" -> "6", "stride" -> "4"))
    assert(ch.columns.contains("chunk_text") && ch.count() > 0)
    intercept[BadRequestException] {
      service.runRegistered("quota_sample", Map("quota" -> "0"))
    }
    intercept[BadRequestException] {
      service.runRegistered("epoch_mix", Map("source" -> "src0", "epochs" -> "-1"))
    }
    intercept[BadRequestException] { // non-finite must be 400, not 500
      service.runRegistered("epoch_mix", Map("source" -> "src0", "epochs" -> "NaN"))
    }
    intercept[BadRequestException] { // > Int.MaxValue must not wrap
      service.runRegistered("quota_sample", Map("quota" -> "2147483648"))
    }
    intercept[BadRequestException] {
      service.runRegistered("chunk_overlap", Map("size" -> "4", "stride" -> "8"))
    }
    // tokenizer/quality ops
    val vb = service.runRegistered("vocab", Map("top_k" -> "5"))
    assert(vb.count() == 5 && vb.columns.contains("rank"))
    val bp = service.runRegistered("bpe_pairs", Map.empty)
    assert(bp.count() > 0 && bp.columns.sameElements(
      Array("pair", "n_occurrences", "rank")))
    val fg = service.runRegistered("filter_gate", Map("only_dropped" -> "true"))
    assert(fg.filter(col("keep")).count() == 0)
    intercept[BadRequestException] {
      service.runRegistered("vocab", Map("top_k" -> "0"))
    }
    // vector search: exact top-k over the embeddings table
    val dim = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(size(col("embedding"))).head().getInt(0)
    val vec = (0 until dim).map(i => if (i % 2 == 0) "1" else "0").mkString(",")
    val ann = service.runRegistered("ann_search", Map("vector" -> vec, "k" -> "5"))
    assert(ann.count() == 5 && ann.columns.sameElements(Array("id", "cos_sim")))
    intercept[BadRequestException] {
      service.runRegistered("ann_search", Map("vector" -> "1,2,bogus"))
    }
    intercept[BadRequestException] {
      service.runRegistered("ann_search", Map("vector" -> "1,2")) // wrong dim
    }
    // compressed-domain variant: same schema, same k, valid ids
    val pqa = service.runRegistered("ann_search",
      Map("vector" -> vec, "k" -> "5", "algo" -> "pq"))
    assert(pqa.count() == 5 && pqa.columns.sameElements(Array("id", "cos_sim")))
    intercept[BadRequestException] {
      service.runRegistered("ann_search", Map("vector" -> vec, "algo" -> "bogus"))
    }
    // metadata-filtered search (the q125 surface): every hit honors the
    // label predicate on both the exact and the filtered-store path
    val labeled = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("label") === 3).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val fex = service.runRegistered("ann_search",
      Map("vector" -> vec, "k" -> "5", "label" -> "3"))
    assert(fex.collect().map(_.getLong(0)).toSet.subsetOf(labeled))
    val flsh = service.runRegistered("ann_search",
      Map("vector" -> vec, "k" -> "5", "algo" -> "lsh", "label" -> "3"))
    assert(flsh.columns.sameElements(Array("id", "cos_sim")))
    assert(flsh.collect().map(_.getLong(0)).toSet.subsetOf(labeled))
    intercept[BadRequestException] { // lsh without the predicate
      service.runRegistered("ann_search", Map("vector" -> vec, "algo" -> "lsh"))
    }
    // binary sign-sketch tier (the q151 surface): (id, hamming, cos_sim)
    val bann = service.runRegistered("ann_search",
      Map("vector" -> vec, "k" -> "5", "algo" -> "bin"))
    assert(bann.count() == 5
      && bann.columns.sameElements(Array("id", "hamming", "cos_sim")))
    // composed IVF-PQ store tier (q112/q190 surface): unfiltered and
    // label-filtered probes, every filtered hit honors the predicate
    val ipq = service.runRegistered("ann_search",
      Map("vector" -> vec, "k" -> "5", "algo" -> "ivfpq"))
    assert(ipq.count() == 5 && ipq.columns.sameElements(Array("id", "cos_sim")))
    val fipq = service.runRegistered("ann_search",
      Map("vector" -> vec, "k" -> "5", "algo" -> "ivfpq", "label" -> "3"))
    assert(fipq.columns.sameElements(Array("id", "cos_sim")))
    assert(fipq.collect().map(_.getLong(0)).toSet.subsetOf(labeled))
    // winnow match pairs (the q156 surface): valid ordered pairs
    val wm = service.runRegistered("winnow_matches", Map("min_shared" -> "1"))
    assert(wm.columns.sameElements(Array("id_a", "id_b", "n_shared")))
    assert(wm.filter(col("id_a") >= col("id_b")).count() == 0)
    intercept[BadRequestException] {
      service.runRegistered("winnow_matches", Map("max_df" -> "1"))
    }
    // containment (q153): per-myriad bounds respected
    val cont = service.runRegistered("containment", Map("min_pm" -> "0"))
    assert(cont.filter(col("containment_pm") < 0 || col("containment_pm") > 10000)
      .count() == 0)
    intercept[BadRequestException] {
      service.runRegistered("containment", Map("min_pm" -> "20000"))
    }
    // LPA communities (q154 operator on the near-dup graph): the
    // registered tier's result clamp applies; every returned label is
    // a real doc id
    val comm = service.runRegistered("communities", Map("iterations" -> "2"))
    assert(comm.columns.sameElements(Array("id", "label")))
    assert(comm.count() == 100) // service row clamp, corpus is larger
    val docIds = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(comm.collect().forall(r => docIds.contains(r.getLong(1))))
    intercept[BadRequestException] {
      service.runRegistered("communities", Map("iterations" -> "50"))
    }
    // systematic sample (q155): Σ n_picks == k exactly
    val ss = service.runRegistered("systematic_sample", Map("k" -> "17"))
    assert(ss.agg(sum("n_picks")).head().getLong(0) == 17L)
    // real multi-frame decode on the registered tier (the q101 surface)
    val fs = service.runRegistered("frame_sample",
      Map("every_n" -> "2", "max_frames" -> "2"))
    assert(fs.columns.sameElements(Array("media_id", "n_frames", "frame_idx",
      "width", "height", "mean_r", "mean_g", "mean_b")))
    assert(fs.filter(col("frame_idx") % 2 =!= 0 || col("frame_idx") >= 4).count() == 0,
      "stride/cap contract")
    assert(fs.count() > 0)
    intercept[BadRequestException] {
      service.runRegistered("frame_sample", Map("every_n" -> "0"))
    }
    // round-6 corpus ops on the registered tier
    val ds = service.runRegistered("dup_spans", Map("only_dups" -> "true"))
    assert(ds.columns.sameElements(Array("doc_id", "n_windows", "n_dup_windows", "dup_pm")))
    assert(ds.filter(col("n_dup_windows") === 0).count() == 0)
    val tk = service.runRegistered("tfidf_keywords", Map("top_per_doc" -> "2"))
    assert(tk.columns.contains("term") && tk.filter(col("rk") > 2).count() == 0)
    val kp = service.runRegistered("keyword_probe", Map("terms" -> "Spark, merge"))
    assert(kp.columns.sameElements(Array("doc_id", "n_terms", "total_tf")) && kp.count() > 0)
    val phr = service.runRegistered("phrase_search", Map("phrase" -> "Table part"))
    assert(phr.columns.sameElements(Array("doc_id", "n_matches")) && phr.count() > 0)
    intercept[BadRequestException] {
      service.runRegistered("phrase_search", Map("phrase" -> "   "))
    }
    val lm = service.runRegistered("bigram_lm", Map.empty)
    assert(lm.columns.sameElements(Array("doc_id", "n_bigrams", "score_ppm")) && lm.count() > 0)
    val sd = service.runRegistered("semantic_dedup", Map("threshold" -> "0.999"))
    assert(sd.columns.sameElements(Array("vec_id", "rep_id", "keep")))
    val nng = service.runRegistered("nn_graph", Map("threshold" -> "0.999", "k" -> "3"))
    assert(nng.columns.sameElements(Array("id", "nn_id", "cos_sim", "rk")))
    assert(nng.filter(col("rk") > 3).count() == 0)
    intercept[BadRequestException] {
      service.runRegistered("nn_graph", Map("threshold" -> "0.5"))
    }
    intercept[BadRequestException] {
      service.runRegistered("keyword_probe", Map("terms" -> " , "))
    }
    intercept[BadRequestException] {
      service.runRegistered("bigram_lm", Map("train_frac" -> "1.0"))
    }
    intercept[BadRequestException] {
      service.runRegistered("dup_spans", Map("window" -> "0"))
    }
    intercept[BadRequestException] { // below the auto-width recall envelope
      service.runRegistered("semantic_dedup", Map("threshold" -> "0.9"))
    }
    val cu = service.runRegistered("curate", Map.empty)
    assert(cu.columns.sameElements(Array("doc_id", "split", "n_tokens")))
    assert(cu.select("split").distinct().count() <= 3 && cu.count() > 0)
    intercept[BadRequestException] {
      service.runRegistered("curate", Map("train_frac" -> "0.98", "val_frac" -> "0.05"))
    }
    // media keep-list tiers (the q188/q191 compositions): media dedup
    // can only THIN the baseline curated set, and the audio tier
    // collapses to <= one doc per fingerprint class
    val cuAudio = service.runRegistered("curate", Map("media" -> "audio"))
    assert(cuAudio.count() > 0 && cuAudio.count() < cu.count(),
      "audio keep-list must drop perceptual twins from the curated set")
    val cuImage = service.runRegistered("curate", Map("media" -> "image"))
    assert(cuImage.count() > 0 && cuImage.count() <= cu.count())
    intercept[BadRequestException] {
      service.runRegistered("curate", Map("media" -> "video"))
    }
    // end-to-end training-mix surface (the q192 composition): weighted
    // sources repeat, capped per source, unlisted sources appear once
    val cm = service.runRegistered("curate_mix",
      Map("quota" -> "10", "epochs" -> "src0:2.0, src1:0"))
    assert(cm.columns.sameElements(Array("doc_id", "source", "n_tokens", "copy_idx")))
    assert(cm.filter(col("source") === "src1").count() == 0,
      "zero-epoch source must drop entirely")
    val perSrc0 = cm.filter(col("source") === "src0")
    assert(perSrc0.count() == 2 * perSrc0.select("doc_id").distinct().count(),
      "2.0-epoch source must appear exactly twice per kept doc")
    assert(cm.groupBy("source").agg(countDistinct("doc_id").as("n"))
      .filter(col("n") > 10).count() == 0, "quota must cap each source")
    intercept[BadRequestException] {
      service.runRegistered("curate_mix", Map("epochs" -> "src0:fast"))
    }
    // the q224 decontamination stage: no contaminated doc may reach the
    // mix (NOT a subset check — dropping a contaminated doc can promote
    // a previously over-quota doc into the rank window)
    val cmDecon = service.runRegistered("curate_mix",
      Map("quota" -> "10", "epochs" -> "src0:2.0, src1:0",
        "decontaminate" -> "true"))
    val deconIds = cmDecon.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(deconIds.nonEmpty)
    val docsAll = graft.model.Tpch.table(spark, sf, "documents")
    val testSlice = docsAll.filter(graft.operators.Sampling.hashSplit(col("doc_id"),
      Seq("train" -> 0.9, "val" -> 0.05), rest = "test") === "test")
    val contaminatedIds = graft.operators.Decontaminate.evalOverlap(
        docsAll, testSlice, "doc_id", "text", n = 5, flagAtPct = 20)
      .filter(col("contaminated")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(deconIds.intersect(contaminatedIds).isEmpty,
      "no contaminated doc may survive the decontaminated mix")
    // packed continuation (q193 surface): offsets are the exclusive
    // prefix sum over the dense (doc, copy) key order
    val mp = service.runRegistered("mix_pack",
      Map("quota" -> "10", "epochs" -> "src0:2.0, src1:0", "seq_len" -> "64"))
    assert(mp.columns.sameElements(
      Array("pack_id", "n_tokens", "start_offset", "first_seq", "n_seqs")))
    val ordered = mp.orderBy("pack_id")
      .select("n_tokens", "start_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ordered.nonEmpty)
    assert(ordered.scanLeft(0L)(_ + _._1).zip(ordered).forall {
      case (runSum, (_, off)) => runSum == off
    }, "start_offset must be the exclusive prefix sum in pack_id order")
    intercept[BadRequestException] {
      service.runRegistered("mix_pack", Map("epochs" -> "src0:4.5"))
    }
    // the training-loader handshake: shard i of N pages the packed
    // stream with DETERMINISTIC boundaries — shards are disjoint,
    // complete, and byte-stable across calls (no RNG anywhere in the
    // chain), so N loader workers each fetch their shard independently
    val shardParams = Map("quota" -> "10", "epochs" -> "src0:2.0, src1:0",
      "seq_len" -> "64", "n_shards" -> "3")
    def shardIds(i: Int): Seq[Long] =
      service.runRegistered("mix_pack", shardParams + ("shard" -> i.toString))
        .select("pack_id").collect().map(_.getLong(0)).toSeq
    val shards = (0 until 3).map(shardIds)
    val allIds = mp.select("pack_id").collect().map(_.getLong(0)).toSet
    assert(shards.map(_.toSet).reduce(_ ++ _) == allIds, "shards must cover the stream")
    assert(shards.map(_.size).sum == allIds.size, "shards must be disjoint")
    assert(shardIds(1) == shards(1), "a re-requested shard must be identical")
    intercept[BadRequestException] {
      service.runRegistered("mix_pack", shardParams + ("shard" -> "3"))
    }
    // token-budget planning (the q222 surface): per-source arithmetic,
    // an absent source reports its deficit, malformed weights are 400s
    val bplan = service.runRegistered("budget_plan",
      Map("budget" -> "500", "weights" -> "src0:400000, src1:300000, ghost:100000"))
    assert(bplan.columns.sameElements(Array("source", "weight_ppm", "avail_docs",
      "avail_tokens", "target_tokens", "keep_ppm", "deficit_tokens",
      "kept_docs", "kept_tokens")))
    assert(bplan.count() == 3)
    val ghost = bplan.filter(col("source") === "ghost").head()
    assert(ghost.getLong(2) == 0L && ghost.getLong(6) == ghost.getLong(4),
      "an absent source must report deficit = target")
    intercept[BadRequestException] {
      service.runRegistered("budget_plan",
        Map("budget" -> "500", "weights" -> "src0:900000, src1:200000"))
    }
    intercept[BadRequestException] {
      service.runRegistered("budget_plan",
        Map("budget" -> "500", "weights" -> "src0"))
    }
    // DSIR selection (the q221 surface): identity-ish scores around 1e6,
    // kept_only filters to the md5 gate's survivors
    val dsel = service.runRegistered("dsir_select", Map("buckets" -> "256"))
    assert(dsel.columns.sameElements(
      Array("doc_id", "n_feats", "dsir_ppm", "keep_permille", "kept")))
    assert(dsel.count() > 0)
    val dselKept = service.runRegistered("dsir_select",
      Map("buckets" -> "256", "kept_only" -> "true"))
    // the service clamps frames to maxLimit, so compare PROPERTIES, not
    // counts across two clamped runs
    assert(dselKept.count() > 0 && dselKept.filter(!col("kept")).count() == 0,
      "kept_only must return only gate survivors")
    intercept[BadRequestException] {
      service.runRegistered("dsir_select", Map("buckets" -> "0"))
    }
    // audio near-dup profile (the q189 banding surface)
    val an = service.runRegistered("audio_neardups", Map("pairs" -> "true"))
    assert(an.columns.sameElements(
      Array("ahash_a", "ahash_b", "hamming", "n_pairs")))
    assert(an.count() > 0 && an.filter(col("hamming") > 3).count() == 0)
    intercept[BadRequestException] {
      service.runRegistered("audio_neardups", Map("max_hamming" -> "9"))
    }
    val hy = service.runRegistered("hybrid_search",
      Map("terms" -> "spark, merge", "k" -> "5"))
    assert(hy.columns.sameElements(Array("doc_id", "bm25_rank", "cos_rank", "rrf")))
    assert(hy.count() === 5)
    // stored tier serves the same contract from the written stores
    val hys = service.runRegistered("hybrid_search",
      Map("terms" -> "spark, merge", "k" -> "5", "stored" -> "true"))
    assert(hys.collect().map(_.toSeq).toSeq === hy.collect().map(_.toSeq).toSeq)
    intercept[BadRequestException] {
      service.runRegistered("hybrid_search", Map("terms" -> " , "))
    }
    // round-7 operators on the registered tier
    val rd = service.runRegistered("readability", Map.empty)
    assert(rd.columns.sameElements(Array("doc_id", "words", "sentences",
      "syllables", "flesch_pm")) && rd.count() > 0)
    val acf = service.runRegistered("autocorrelation", Map("max_lag" -> "2"))
    assert(acf.columns.sameElements(Array("event_type", "lag", "n_pairs", "acf")))
    assert(acf.filter(col("lag") > 2).count() == 0 && acf.count() > 0)
    intercept[BadRequestException] {
      service.runRegistered("autocorrelation", Map("max_lag" -> "200"))
    }
    val mmr = service.runRegistered("mmr_rerank",
      Map("cand_k" -> "10", "select_k" -> "4"))
    assert(mmr.columns.sameElements(Array("pick", "id", "rel", "mmr")))
    assert(mmr.count() === 4)
    intercept[BadRequestException] {
      service.runRegistered("mmr_rerank", Map("select_k" -> "30", "cand_k" -> "10"))
    }
    intercept[BadRequestException] {
      service.runRegistered("mmr_rerank", Map("query_id" -> "999999"))
    }
    val kc = service.runRegistered("kcore", Map("k" -> "1", "threshold" -> "0.5"))
    assert(kc.columns.sameElements(Array("doc_id", "core_degree")))
    // this round's operators on the registered tier
    val se = service.runRegistered("sessions", Map("gap_seconds" -> "1800"))
    assert(se.columns.sameElements(Array("user_id", "session_idx", "start_ts",
      "end_ts", "n_events", "duration_s")) && se.count() > 0)
    intercept[BadRequestException] {
      service.runRegistered("sessions", Map("gap_seconds" -> "0"))
    }
    val ls = service.runRegistered("level_shifts",
      Map("window" -> "6", "min_diff_cents" -> "0"))
    assert(ls.columns.sameElements(Array("event_type", "bucket", "trail_cents",
      "lead_cents", "diff_cents")) && ls.count() > 0)
    intercept[BadRequestException] {
      service.runRegistered("level_shifts", Map("window" -> "169"))
    }
    val lp = service.runRegistered("link_prediction",
      Map("k" -> "10", "threshold" -> "0.3"))
    assert(lp.columns.sameElements(Array("a", "b", "common", "ra_micro")))
    intercept[BadRequestException] {
      service.runRegistered("link_prediction", Map("max_degree" -> "1"))
    }
    val bl = service.runRegistered("blocklist",
      Map("patterns" -> "slow, dup", "block_at" -> "2"))
    assert(bl.columns.sameElements(Array("doc_id", "n_matches",
      "n_distinct_terms", "top_term", "top_n", "blocked")) && bl.count() > 0)
    intercept[BadRequestException] { // regex metacharacters rejected
      service.runRegistered("blocklist", Map("patterns" -> "a|b"))
    }
    val nd = service.runRegistered("image_neardups", Map("max_hamming" -> "2"))
    assert(nd.columns.sameElements(Array("hamming", "n_pairs")))
    assert(nd.filter(col("hamming") > 2).count() == 0 && nd.count() > 0)
    intercept[BadRequestException] {
      service.runRegistered("image_neardups", Map("max_hamming" -> "9"))
    }
    val ew = service.runRegistered("ewma", Map("lookback" -> "4"))
    assert(ew.columns.sameElements(Array("event_type", "bucket", "n_window", "ewma")))
    assert(ew.filter(col("n_window") > 4).count() == 0 && ew.count() > 0)
    intercept[BadRequestException] {
      service.runRegistered("ewma", Map("lookback" -> "63"))
    }
    val zd = service.runRegistered("standardize_dims", Map("vec_id" -> "0"))
    assert(zd.columns.sameElements(Array("vec_id", "dim", "v_micro", "z")))
    assert(zd.count() > 0 && zd.filter(col("vec_id") =!= 0).count() == 0)
    val cp = service.runRegistered("copurchase_graph",
      Map("max_items" -> "6", "k" -> "20"))
    assert(cp.columns.sameElements(Array("a", "b", "weight")) && cp.count() <= 20)
    intercept[BadRequestException] {
      service.runRegistered("copurchase_graph", Map("min_weight" -> "0"))
    }
    val sr = service.runRegistered("seasonal_residuals", Map("season_hours" -> "24"))
    assert(sr.columns.sameElements(Array("event_type", "bucket", "cents",
      "prior_cents", "residual_cents")) && sr.count() > 0)
    intercept[BadRequestException] {
      service.runRegistered("seasonal_residuals", Map("season_hours" -> "8761"))
    }
    val tr = service.runRegistered("trend", Map.empty)
    assert(tr.columns.sameElements(Array("event_type", "n", "slope", "intercept")))
    assert(tr.count() > 0)
    val qa = service.runRegistered("quantile_audit", Map.empty)
    assert(qa.columns.sameElements(Array("event_type", "p50_exact", "p90_exact",
      "approx50_ok", "approx90_ok")))
    assert(qa.filter(!col("approx50_ok") || !col("approx90_ok")).count() == 0)
    val rk = service.runRegistered("rank_transform", Map("vec_id" -> "1"))
    assert(rk.columns.sameElements(Array("vec_id", "dim", "v_micro", "rank_ppm")))
    assert(rk.count() > 0 && rk.filter(col("vec_id") =!= 1).count() == 0)
    val cw = service.runRegistered("class_weights", Map.empty)
    assert(cw.columns.sameElements(Array("label", "n", "weight_micro")) && cw.count() > 0)
    val hk = service.runRegistered("hot_keys", Map("key" -> "l_partkey", "k" -> "5"))
    assert(hk.columns.sameElements(Array("l_partkey", "n", "share_ppm")) && hk.count() === 5)
    intercept[BadRequestException] {
      service.runRegistered("hot_keys", Map("key" -> "o_custkey; DROP"))
    }
    val hc = service.runRegistered("harmonic_centrality",
      Map("sources" -> "0,1", "max_depth" -> "3"))
    assert(hc.columns.sameElements(Array("id", "n_sources", "harmonic_micro")))
    assert(hc.count() > 0)
    intercept[BadRequestException] {
      service.runRegistered("harmonic_centrality", Map("sources" -> "a,b"))
    }
    val dg = service.runRegistered("degree_summary", Map("threshold" -> "0.3"))
    assert(dg.columns.sameElements(
      Array("degree", "n_nodes", "n_edges", "assortativity")))
    val rr = service.runRegistered("regional_revenue", Map.empty)
    assert(rr.columns.sameElements(Array("region", "nation", "n_items", "revenue")))
    assert(rr.count() > 0)
    val ei = service.runRegistered("edge_integrity", Map("edge" -> "knows"))
    assert(ei.columns.sameElements(
      Array("n_edges", "n_src_dangling", "n_dst_dangling")) && ei.count() === 1)
    intercept[BadRequestException] {
      service.runRegistered("edge_integrity", Map("edge" -> "nope"))
    }
    val ssim = service.runRegistered("source_similarity", Map("min_jaccard_pm" -> "5000"))
    assert(ssim.columns.sameElements(
      Array("source_a", "source_b", "n_shared", "jaccard_pm")))
    intercept[BadRequestException] {
      service.runRegistered("source_similarity", Map("min_jaccard_pm" -> "10001"))
    }
    val vg = service.runRegistered("vocab_growth", Map("buckets" -> "4"))
    assert(vg.columns.sameElements(Array("bucket", "docs_through", "vocab_size")))
    assert(vg.count() === 4)
    intercept[BadRequestException] {
      service.runRegistered("vocab_growth", Map("buckets" -> "101"))
    }
    val dhist = service.runRegistered("dup_histogram", Map.empty)
    assert(dhist.columns.sameElements(Array("class_size", "n_classes")))
    assert(dhist.count() > 0)
    val lsim = service.runRegistered("label_similarity", Map.empty)
    assert(lsim.columns.sameElements(Array("label_a", "label_b", "cosine")))
    assert(lsim.count() > 0)
    intercept[BadRequestException] {
      service.runRegistered("label_similarity", Map("min_cosine" -> "1.5"))
    }
    val pi = service.runRegistered("power_iteration", Map("iterations" -> "2"))
    assert(pi.columns.sameElements(Array("dim", "v_micro")) && pi.count() > 0)
    intercept[BadRequestException] {
      service.runRegistered("power_iteration", Map("iterations" -> "11"))
    }
    val ab = service.runRegistered("abtt", Map("vec_id" -> "2"))
    assert(ab.columns.sameElements(Array("id", "dim", "corrected")))
    assert(ab.count() > 0 && ab.filter(col("id") =!= 2).count() == 0)
    val sc = service.runRegistered("source_scorecard", Map("min_tokens" -> "30"))
    assert(sc.columns.sameElements(Array("source", "n_docs", "total_tokens",
      "mean_tokens_pm", "dup_pm", "gate_pm", "n_langs", "top_lang")) && sc.count() > 0)
    intercept[BadRequestException] {
      service.runRegistered("source_scorecard", Map("max_dup_pm" -> "10001"))
    }
    intercept[BadRequestException] { // no embedding row for that id
      service.runRegistered("hybrid_search",
        Map("terms" -> "spark", "query_id" -> "999999999"))
    }
    val nv = service.runRegistered("novelty", Map("window" -> "4"))
    assert(nv.columns.sameElements(
      Array("doc_id", "n_windows", "n_novel", "novelty_pm")) && nv.count() > 0)
    intercept[BadRequestException] {
      service.runRegistered("novelty", Map("window" -> "0"))
    }
    val td = service.runRegistered("token_drift", Map("top_k" -> "10"))
    assert(td.columns.sameElements(Array("token", "c_train", "c_test", "chi2")))
    assert(td.count() <= 10)
    val ra = service.runRegistered("rolling_anomaly", Map("only_anomalies" -> "true"))
    assert(ra.columns.sameElements(Array("event_id", "user_id", "ts", "value",
      "n_prior", "z", "is_anomaly")))
    intercept[BadRequestException] {
      service.runRegistered("rolling_anomaly", Map("sigmas" -> "0"))
    }
    intercept[BadRequestException] {
      service.runRegistered("rolling_anomaly", Map("lookback" -> "1"))
    }
  }

  test("pipeline-query write effect runs on a writable service and over HTTP") {
    val writable = new QueryService(g, maxLimit = 100, allowWrites = true)
    graft.service.PipelineQueries.install(writable, spark, sf)
    val out = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "pii-redact").toString + "/docs"
    val res = writable.runRegistered("pii_redact_store", Map("path" -> out)).head()
    assert(res.getAs[Long]("rows_written") == 500)
    assert(spark.read.parquet(out).columns.sameElements(Array("doc_id", "text")))
    // same tier over HTTP: 200 on the read path, 403 on the write path
    graft.service.PipelineQueries.install(service, spark, sf)
    val ep = new graft.service.HttpEndpoint(service)
    val port = ep.start()
    val client = HttpClient.newHttpClient()
    def post(path: String, body: String): HttpResponse[String] =
      client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
    try {
      val ok = post("/query/bm25_search", """{"params":{"terms":"spark","k":"3"}}""")
      assert(ok.statusCode() == 200 && ok.body().startsWith("[{"))
      assert(post("/query/bm25_search", """{"params":{"terms":"spark","k":"x"}}""")
        .statusCode() == 400)
      assert(post("/query/pii_redact_store", """{"params":{"path":"target/nope"}}""")
        .statusCode() == 403)
    } finally ep.stop()
  }

  test("ad-hoc JSON DSL compiles and runs") {
    val json =
      """{"match":[{"vertex":"a","type":"customer"},
        |          {"edge":"placed","from":"a","to":"o","weight":"price"}],
        | "where":[{"slot":["a","c_mktsegment","seg"]},
        |          {"cmp":["seg","=","BUILDING"]},
        |          {"cmp":["price",">",150000]}],
        | "select":["a","o","price"],
        | "orderBy":["o"],
        | "limit": 20}""".stripMargin
    val df = service.runAdHoc(json)
    assert(df.count() > 0 && df.count() <= 20)
    assert(df.columns.sameElements(Array("a", "o", "price")))
  }

  test("limit clamped to service max") {
    val df = service.runAdHoc(
      """{"match":[{"vertex":"o","type":"order"}],"select":["o"],"limit":100000}""")
    assert(df.count() == 100) // maxLimit
  }

  test("DSL error paths are 400-shaped") {
    val bad = Seq(
      """not json at all""",
      """{"select":["a"]}""", // no match
      """{"match":[{"vertex":"a","type":"nosuchtype"}],"select":["a"]}""",
      """{"match":[{"vertex":"a","type":"customer"}],"where":[{"cmp":["a","~","x"]}],"select":["a"]}""",
      """{"match":[{"vertex":"a","type":"customer"}],"where":[{"frobnicate":1}],"select":["a"]}""",
      """{"match":[{"vertex":"a","type":"customer"}],"select":[]}""")
    bad.foreach { j =>
      intercept[BadRequestException] { service.runAdHoc(j) }
    }
  }

  test("negation via DSL") {
    val json =
      """{"match":[{"vertex":"a","type":"customer"}],
        | "where":[{"not":{"match":[{"edge":"placed","from":"a","to":"o"}],"select":["a"]}}],
        | "select":["a"]}""".stripMargin
    val noOrders = service.runAdHoc(json).count()
    val total = g.vertexFrame("customer").count()
    val withOrders = g.edgeFrame("placed").select("src").distinct().count()
    assert(noOrders == total - withOrders)
  }

  test("HTTP write tier: create/delete vertices, effects gate, conflict=409") {
    val schema = graft.model.GraphSchema.builder()
      .vertex("item", "id", Seq("name")).edge("rel", "item", "item").build()
    val gs = new graft.model.GraphStore(spark, schema,
      java.nio.file.Files.createTempDirectory(java.nio.file.Paths.get("target"), "http-gs").toString)
    val writable = new graft.service.HttpEndpoint(service, store = Some(gs), allowWrites = true)
    val readOnly = new graft.service.HttpEndpoint(service, store = Some(gs), allowWrites = false)
    val wPort = writable.start(); val rPort = readOnly.start()
    val client = HttpClient.newHttpClient()
    def post(port: Int, path: String, body: String): HttpResponse[String] =
      client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
    try {
      val created = post(wPort, "/mutate/vertex/item",
        """{"rows":[{"id":1,"name":"a"},{"id":2,"name":"b"}]}""")
      assert(created.statusCode() == 200 && created.body().contains("\"created\": 2"))
      assert(gs.graph().vertexFrame("item").count() == 2)
      // duplicate insert -> OCC conflict -> 409
      assert(post(wPort, "/mutate/vertex/item",
        """{"rows":[{"id":1,"name":"dup"}]}""").statusCode() == 409)
      // delete
      assert(post(wPort, "/mutate/delete/item", """{"ids":[2]}""").statusCode() == 200)
      assert(gs.graph().vertexFrame("item").count() == 1)
      // read-only endpoint refuses the write effect
      assert(post(rPort, "/mutate/vertex/item",
        """{"rows":[{"id":9,"name":"x"}]}""").statusCode() == 403)
      // malformed bodies
      assert(post(wPort, "/mutate/vertex/item", """{"rows":[]}""").statusCode() == 400)
      assert(post(wPort, "/mutate/vertex/item", """{"rows":[{"name":"noid"}]}""").statusCode() == 400)
      assert(post(wPort, "/mutate/vertex/nosuchlabel",
        """{"rows":[{"id":5}]}""").statusCode() == 400)
      assert(post(wPort, "/mutate/frobnicate/item", "{}").statusCode() == 404)
      // schema gate (ADVICE r1): string id / unknown column → 400, and
      // the rejected rows never reach the stored table's parquet schema
      assert(post(wPort, "/mutate/vertex/item",
        """{"rows":[{"id":"not-a-number","name":"x"}]}""").statusCode() == 400)
      assert(post(wPort, "/mutate/vertex/item",
        """{"rows":[{"id":10,"wat":"x"}]}""").statusCode() == 400)
      assert(gs.graph().vertexFrame("item").count() == 1)
      // recreate a deleted id through the REST tier (tombstone + 1)
      assert(post(wPort, "/mutate/vertex/item",
        """{"rows":[{"id":2,"name":"b2"}]}""").statusCode() == 200)
      assert(gs.graph().vertexFrame("item").count() == 2)
      // edge CRUD tier: create (weight defaults to 1.0), bad type → 400,
      // delete by id
      assert(post(wPort, "/mutate/edge/rel",
        """{"rows":[{"src":1,"dst":2}]}""").statusCode() == 200)
      val e = gs.graph().edgeFrame("rel").select("id", "weight").head()
      assert(e.getDouble(1) == 1.0)
      assert(post(wPort, "/mutate/edge/rel",
        """{"rows":[{"src":"oops","dst":2}]}""").statusCode() == 400)
      assert(post(wPort, "/mutate/edge/rel",
        """{"rows":[{"src":1}]}""").statusCode() == 400)
      assert(post(wPort, s"/mutate/delete_edge/rel",
        s"""{"ids":[${e.getLong(0)}]}""").statusCode() == 200)
      assert(gs.graph().edgeFrame("rel").count() == 0)
    } finally { writable.stop(); readOnly.stop() }
  }

  test("ndjson to a SLOW consumer survives aggressive store compaction: the " +
      "compute lands in persisted blocks before the first byte, the driver " +
      "drain is lazy (r10 #2, drain made lazy in r14 per r13 #6)") {
    import spark.implicits._
    val schema = graft.model.GraphSchema.builder()
      .vertex("acct", "id", Seq("pad")).build()
    val gs = new graft.model.GraphStore(spark, schema,
      java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("target"), "ndjson-slow").toString)
    // ~2 KB rows x 1000 ≈ 2 MB: well past the TCP buffers, so the
    // server's socket writes genuinely block on the client's pace
    val pad = "x" * 2048
    gs.txn().createVertices("acct",
      (0L until 1000L).map(i => (i, pad)).toDF("id", "pad")).commit()
    gs.store.compactCurrent("v_acct") // generation-versioned index live
    val svc = new QueryService(gs.graph(), maxLimit = 1000)
    svc.register(RegisteredQuery("all_accts", Seq.empty,
      _ => PatternQuery(goals = Seq(IsA("a", "acct"), Slot("a", "pad", "p")),
        select = Seq("a" -> "id", "p" -> "p"), orderBy = Seq(col("id")))))
    val ep = new graft.service.HttpEndpoint(svc)
    val port = ep.start()
    try {
      val client = HttpClient.newHttpClient()
      val resp = client.send(
        HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/query/all_accts?stream=1"))
          .POST(HttpRequest.BodyPublishers.ofString("{}")).build(),
        HttpResponse.BodyHandlers.ofInputStream())
      assert(resp.statusCode() == 200)
      val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(resp.body(),
          java.nio.charset.StandardCharsets.UTF_8))
      val ids = scala.collection.mutable.Buffer[Long]()
      var churns = 0
      var line = br.readLine()
      while (line != null) {
        ids += """"id":(\d+)""".r.findFirstMatchIn(line).get.group(1).toLong
        // every 100 lines, commit + compact: >=4 publishes while the
        // response is mid-flight — the exact storm that strands an
        // incrementally-consumed plan (slow-reader control case)
        if (ids.size % 100 == 0 && churns < 5) {
          gs.txn().createVertices("acct",
            Seq((100000L + churns, "late")).toDF("id", "pad")).commit()
          gs.store.compactCurrent("v_acct")
          churns += 1
          Thread.sleep(30)
        }
        line = br.readLine()
      }
      assert(churns >= 4, "the compaction storm must actually run mid-response")
      // complete and correct: exactly the 1000 request-time rows, in
      // order, none of the mid-response commits leaking in
      assert(ids.size == 1000 && ids.toSeq == (0L until 1000L))
    } finally ep.stop()
  }

  test("ndjson AT the clamp boundary: more rows than maxLimit stream exactly " +
      "maxLimit lines through the lazy drain, and the drain frees its buffer " +
      "blocks when exhausted (r13 #6)") {
    import spark.implicits._
    val schema = graft.model.GraphSchema.builder()
      .vertex("acct", "id", Seq("pad")).build()
    val gs = new graft.model.GraphStore(spark, schema,
      java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("target"), "ndjson-clamp").toString)
    val pad = "x" * 256
    // 1500 committed vs a 1000-row clamp: the drain must stop at the
    // policy bound, not the table bound
    gs.txn().createVertices("acct",
      (0L until 1500L).map(i => (i, pad)).toDF("id", "pad")).commit()
    val svc = new QueryService(gs.graph(), maxLimit = 1000)
    svc.register(RegisteredQuery("all_accts", Seq.empty,
      _ => PatternQuery(goals = Seq(IsA("a", "acct"), Slot("a", "pad", "p")),
        select = Seq("a" -> "id", "p" -> "p"), orderBy = Seq(col("id")))))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val drain = svc.ndjson(svc.runRegistered("all_accts", Map.empty))
    val ours = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(ours.nonEmpty, "the drain must hold persisted buffer blocks")
    val lines = drain.toList
    assert(lines.size == 1000, s"clamp must bound the stream: ${lines.size}")
    assert(lines.forall(_.contains("\"id\":")))
    // exhaustion closes: the buffer blocks are unpersisted (async), and
    // further next() calls fail cleanly instead of re-running the plan
    intercept[NoSuchElementException](drain.next())
    val deadline = System.nanoTime() + 10e9.toLong
    def stillOurs = spark.sparkContext.getPersistentRDDs.keySet.intersect(ours)
    while (stillOurs.nonEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(stillOurs.isEmpty, "exhausting the drain must free its persisted buffer")
    // close() is idempotent
    drain.close(); drain.close()
  }

  test("HTTP endpoint: 200/400/403/401/404 + ndjson streaming") {
    val ep = new graft.service.HttpEndpoint(service, authToken = Some("sesame"))
    val port = ep.start()
    val client = HttpClient.newHttpClient()
    def post(path: String, body: String, token: Option[String] = Some("sesame"),
        query: String = ""): HttpResponse[String] = {
      val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path$query"))
        .POST(HttpRequest.BodyPublishers.ofString(body))
      token.foreach(t => b.header("X-Auth-Token", t))
      client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    }
    try {
      val ok = post("/query/customers_by_segment", """{"params":{"segment":"BUILDING"}}""")
      assert(ok.statusCode() == 200 && ok.body().startsWith("[{"))
      val ndj = post("/pattern",
        """{"match":[{"vertex":"a","type":"customer"}],"select":["a"],"limit":5}""",
        query = "?stream=1")
      assert(ndj.statusCode() == 200)
      assert(ndj.body().linesIterator.size == 5)
      assert(post("/query/customers_by_segment", """{"params":{}}""").statusCode() == 400)
      assert(post("/query/danger_write", "{}").statusCode() == 403)
      assert(post("/query/x", "{}", token = Some("wrong")).statusCode() == 401)
      assert(post("/nope", "{}").statusCode() == 404)
      assert(post("/pattern", "garbage").statusCode() == 400)
    } finally ep.stop()
  }

  test("HTTP admin tier: regenerate/sync/vacuum/compact, gates") {
    val schema = graft.model.GraphSchema.builder()
      .vertex("acct", "id", Seq("seg", "bal")).build()
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "http-admin").toString
    val gs = new graft.model.GraphStore(spark, schema, dir)
    gs.txn().createVertices("acct",
      Seq((1L, "gold", 10.0), (2L, "iron", 5.0)).toDF("id", "seg", "bal")).commit()
    val cat = new graft.views.ViewCatalog(spark, gs, dir)
    cat.register(graft.views.ViewDef("by_seg", "acct",
      df => df.select(col("seg").as("key"), col("id"), col("bal").as("value")),
      reduceAgg = Some(sum(col("value")))))
    cat.bindTo(gs) // deltas accrue per commit — the /admin/maintain fuel
    val slave = new graft.model.VersionedStore(spark,
      java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("target"), "http-admin-slave").toString)
    val repl = graft.model.Replicator.forGraph(gs, slave)
    val ep = new graft.service.HttpEndpoint(service, store = Some(gs),
      allowWrites = true, views = Some(cat), replicator = Some(repl),
      indexDirs = Map("bal_idx" -> cat.rootOf("by_seg").toString))
    val bare = new graft.service.HttpEndpoint(service, allowWrites = true)
    val readOnly = new graft.service.HttpEndpoint(service, store = Some(gs))
    val port = ep.start(); val barePort = bare.start(); val roPort = readOnly.start()
    val client = HttpClient.newHttpClient()
    def post(p: Int, path: String, body: String = ""): HttpResponse[String] =
      client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$p$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
    try {
      // regenerate all views, then a keyed read works
      val reg = post(port, "/admin/regenerate")
      assert(reg.statusCode() == 200 && reg.body().contains("by_seg"))
      assert(cat.lookup("by_seg", "gold").count() == 1)
      assert(post(port, "/admin/regenerate", """{"view":"nope"}""").statusCode() == 400)
      // sync converges the replica to the master's epoch
      val sync = post(port, "/admin/sync")
      assert(sync.statusCode() == 200)
      assert(slave.currentEpoch == gs.store.currentEpoch)
      assert(slave.read("v_acct").count() == 2)
      // incremental backup: first call dumps everything so far, the
      // repeat is a no-op (from == to), and the chain restores to an
      // identical live read
      val broot = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("target"), "http-backup").toString
      val b1 = post(port, "/admin/backup", s"""{"root":"$broot"}""")
      assert(b1.statusCode() == 200 && b1.body().contains("\"from\": 0"), b1.body())
      val b2 = post(port, "/admin/backup", s"""{"root":"$broot"}""")
      assert(b2.body().contains(s""""from": ${gs.store.currentEpoch}, "to": ${gs.store.currentEpoch}"""),
        s"repeat backup must be a no-op: ${b2.body()}")
      val restored = graft.model.Backup.restoreChain(spark, broot,
        java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get("target"), "http-restore").toString)
      assert(restored.read("v_acct").count() == 2)
      assert(post(port, "/admin/backup", "{}").statusCode() == 400)
      // threshold-driven maintenance pass: the bound view breached the
      // (deliberately tiny) thresholds and compacts; the registered
      // index root only REPORTS as due — its rebuild thunk lives with
      // the owning process (the in-process Maintenance daemon's tier)
      (0 until 3).foreach { i =>
        gs.txn().createVertices("acct",
          Seq((600L + i, "m", 1.0)).toDF("id", "seg", "bal")).commit()
      }
      val mt = post(port, "/admin/maintain",
        """{"delta_epochs_high": 2, "delta_bytes_high": 1}""")
      assert(mt.statusCode() == 200 && mt.body().contains("\"view:by_seg\""), mt.body())
      assert(mt.body().contains("\"index:bal_idx\""), mt.body())
      assert(graft.model.GenDirs.layoutStats(cat.rootOf("by_seg")).deltaEpochs == 0,
        "the REST pass must actually regenerate the view")
      val mt2 = post(port, "/admin/maintain",
        """{"delta_epochs_high": 1000000, "delta_bytes_high": 1099511627776}""")
      assert(mt2.body() == """{"compacted": [], "index_due": []}""", mt2.body())
      // vacuum + compact succeed on a live table
      assert(post(port, "/admin/vacuum", """{"label":"acct","keep":1}""").statusCode() == 200)
      assert(post(port, "/admin/vacuum", """{"label":"acct","keep":0}""").statusCode() == 400)
      // compact also sweeps the materialized-store root for
      // pre-upgrade orphans: an UNSUFFIXED dir holding a fingerprint-
      // stamped store goes; a suffixed (current-key) dir and a user
      // dir with no stamp are untouched
      val storeRoot = java.nio.file.Paths.get(graft.model.StorePaths.root)
      val legacy = storeRoot.resolve("_root_testdata_legacy")
      val current = storeRoot.resolve("_root_testdata_legacy-0123abcd")
      val foreign = storeRoot.resolve("unrelated_user_dir")
      for (d <- Seq(legacy, current, foreign)) {
        java.nio.file.Files.createDirectories(d.resolve("somestore"))
        if (d != foreign)
          java.nio.file.Files.writeString(
            d.resolve("somestore").resolve("_SOURCE_FINGERPRINT"), "1_2_3")
      }
      val comp = post(port, "/admin/compact", """{"label":"acct"}""")
      assert(comp.statusCode() == 200 && comp.body().contains("\"stores_gced\""))
      assert(!java.nio.file.Files.exists(legacy),
        "unsuffixed stamped legacy store dir must be reclaimed")
      assert(java.nio.file.Files.exists(current),
        "current (hash-suffixed) store dirs must survive the sweep")
      assert(java.nio.file.Files.exists(foreign),
        "a dir without the library's fingerprint stamp must never be touched")
      java.nio.file.Files.deleteIfExists(current.resolve("somestore").resolve("_SOURCE_FINGERPRINT"))
      java.nio.file.Files.deleteIfExists(current.resolve("somestore"))
      java.nio.file.Files.deleteIfExists(current)
      java.nio.file.Files.deleteIfExists(foreign.resolve("somestore"))
      java.nio.file.Files.deleteIfExists(foreign)
      assert(gs.graph().vertexFrame("acct").count() == 5) // 2 seed + 3 maintain-fuel
      // gates: read-only → 403; artifact not attached → 404
      assert(post(roPort, "/admin/regenerate").statusCode() == 403)
      assert(post(roPort, "/admin/maintain").statusCode() == 403)
      assert(post(barePort, "/admin/regenerate").statusCode() == 404)
      assert(post(barePort, "/admin/sync").statusCode() == 404)
      assert(post(barePort, "/admin/vacuum", """{"label":"acct"}""").statusCode() == 404)
      assert(post(barePort, "/admin/backup", """{"root":"target"}""").statusCode() == 404)
      assert(post(port, "/admin/frobnicate").statusCode() == 404)
    } finally { ep.stop(); bare.stop(); readOnly.stop() }
  }

  test("ServeMain: a forked server process opens the store by location alone " +
      "and serves LIVE queries — rows committed after open are queryable; " +
      "read-only in-process start drops the write effect") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "servemain").toString
    val schema = graft.model.GraphSchema.builder()
      .vertex("acct", "id", Seq("seg", "bal")).build()
    val gs = new graft.model.GraphStore(spark, schema, dir)
    gs.txn().createVertices("acct",
      Seq((1L, "gold", 10.0), (2L, "iron", 5.0)).toDF("id", "seg", "bal")).commit()
    // fork the real main: no schema argument anywhere — open-graph
    val readyFile = java.nio.file.Paths.get(dir, "_PORT")
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    val cmd = Seq(javaBin, "-Xmx3g") ++ graft.tools.ReplicaFollowerMain.jvmOpens ++
      Seq("-cp", System.getProperty("java.class.path"), "graft.tools.ServeMain",
        dir, "--cpus", "4", "--ready-file", readyFile.toString)
    val log = java.nio.file.Paths.get(dir, "serve.log").toFile
    val p = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true).redirectOutput(log).start()
    try {
      val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
      while (!java.nio.file.Files.exists(readyFile) && p.isAlive &&
          System.nanoTime() < deadline) Thread.sleep(250)
      assert(java.nio.file.Files.exists(readyFile), "server never became ready; log:\n" +
        scala.io.Source.fromFile(log).getLines().toSeq.takeRight(20).mkString("\n"))
      val port = java.nio.file.Files.readString(readyFile).trim.toInt
      val client = HttpClient.newHttpClient()
      def post(path: String, body: String) =
        client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
      // ad-hoc pattern over the opened store
      val q = """{"match":[{"vertex":"a","type":"acct"}],"select":["a"]}"""
      assert(post("/pattern", q).body().count(_ == '{') == 2)
      // a mutation THROUGH the server, then the same query sees it —
      // the live-graph binding (a snapshot-bound service would not)
      assert(post("/mutate/vertex/acct",
        """{"rows":[{"id":3,"seg":"m","bal":1.0}]}""").statusCode() == 200)
      assert(post("/pattern", q).body().count(_ == '{') == 3,
        "server must serve the CURRENT epoch, not its open-time snapshot")
      // ...and a commit from THIS process (shared storage) is visible too
      gs.txn().createVertices("acct",
        Seq((4L, "m", 2.0)).toDF("id", "seg", "bal")).commit()
      assert(post("/pattern", q).body().count(_ == '{') == 4)
      assert(post("/admin/stats", "").statusCode() == 200)
    } finally { p.destroyForcibly(); p.waitFor(60, java.util.concurrent.TimeUnit.SECONDS); () }
    // read-only config drops the write effect (in-process start)
    val (ro, roPort) = graft.tools.ServeMain.start(spark,
      graft.tools.ServeMain.Config(dir, readOnly = true))
    try {
      val client = HttpClient.newHttpClient()
      def post(path: String, body: String) =
        client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$roPort$path"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
      assert(post("/mutate/vertex/acct",
        """{"rows":[{"id":9,"seg":"x","bal":0.0}]}""").statusCode() == 403)
      assert(post("/pattern",
        """{"match":[{"vertex":"a","type":"acct"}],"select":["a"]}""").statusCode() == 200)
      intercept[IllegalArgumentException](
        graft.tools.ServeMain.parse(Array(dir, "--bogus")))
    } finally ro.stop()
  }

  test("maintenance daemon bound to the endpoint lifecycle: a view breaching " +
      "thresholds mid-serve compacts with NO admin call; compaction marks and " +
      "swallowed errors surface in /admin/stats; stop() stops the daemon") {
    val schema = graft.model.GraphSchema.builder()
      .vertex("acct", "id", Seq("seg", "bal")).build()
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "http-maint").toString
    val gs = new graft.model.GraphStore(spark, schema, dir)
    gs.txn().createVertices("acct",
      Seq((1L, "gold", 10.0), (2L, "iron", 5.0)).toDF("id", "seg", "bal")).commit()
    val cat = new graft.views.ViewCatalog(spark, gs, dir)
    cat.register(graft.views.ViewDef("by_seg", "acct",
      df => df.select(col("seg").as("key"), col("id"), col("bal").as("value")),
      reduceAgg = Some(sum(col("value")))))
    cat.bindTo(gs)
    cat.regenerate("by_seg") // clean slate: dueness below comes only from new commits
    // the daemon's target list: a deliberately-broken target FIRST
    // (same root → due whenever the view is; compact always throws) so
    // one failing target provably does not stop the real view's
    // maintenance, and its failure lands in the stats report
    val boom = graft.model.Maintenance.Target("boom",
      cat.rootOf("by_seg"), () => sys.error("injected compact failure"))
    val m = new graft.model.Maintenance(
      boom +: graft.model.Maintenance.forViews(cat),
      deltaEpochsHigh = 2, deltaBytesHigh = 1L << 40, periodMs = 100L)
    val ep = new graft.service.HttpEndpoint(service, store = Some(gs),
      allowWrites = true, views = Some(cat), maintenance = Some(m))
    val port = ep.start()
    val client = HttpClient.newHttpClient()
    def stats(): String =
      client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/admin/stats"))
        .POST(HttpRequest.BodyPublishers.ofString("")).build(),
        HttpResponse.BodyHandlers.ofString()).body()
    try {
      assert(m.isRunning, "serve must start the bound daemon")
      assert(stats().contains(""""maintenance": {"running": true"""))
      // never compacted yet: the target reports with null marks
      assert(stats().contains(
        """{"name": "view:by_seg", "last_compaction_gen": null"""), stats())
      // breach the epoch threshold mid-serve (3 commits > high=2)...
      (0 until 3).foreach { i =>
        gs.txn().createVertices("acct",
          Seq((600L + i, "m", 1.0)).toDF("id", "seg", "bal")).commit()
      }
      // ...and the daemon compacts with NO admin call. Steady state is
      // BELOW-THRESHOLD, not zero deltas: a commit can land between
      // breach and regenerate (the MaintenanceSpec contract), so the
      // evidence is the compaction mark plus sub-threshold deltas
      val deadline = System.currentTimeMillis() + 30000L
      while ((m.lastCompactions().get("view:by_seg").isEmpty ||
          graft.model.GenDirs.layoutStats(cat.rootOf("by_seg")).deltaEpochs >= 2)
          && System.currentTimeMillis() < deadline)
        Thread.sleep(100L)
      assert(m.lastCompactions().contains("view:by_seg") &&
        graft.model.GenDirs.layoutStats(cat.rootOf("by_seg")).deltaEpochs < 2,
        "daemon must regenerate the breached view unattended")
      val s = stats()
      assert("""\{"name": "view:by_seg", "last_compaction_gen": \d+, "last_compaction_at_ms": \d+\}"""
        .r.findFirstIn(s).isDefined, s"compaction mark missing: $s")
      assert(s.contains(""""target": "boom", "error": "injected compact failure""""),
        s"swallowed error must be visible in stats: $s")
      // the compacted view still answers correctly (2 seed + 3 fuel)
      assert(cat.lookup("by_seg", "m").select(sum(col("value"))).head.getDouble(0) == 3.0)
      // a stats poll is non-destructive: the error is still there
      assert(stats().contains(""""target": "boom""""))
    } finally ep.stop()
    assert(!m.isRunning, "endpoint stop must stop the bound daemon")
  }

  test("query admission control: saturated slots answer 429 immediately " +
      "while admin stays responsive on the bounded worker pool") {
    import spark.implicits._
    val gate = new java.util.concurrent.CountDownLatch(1)
    val entered = new java.util.concurrent.CountDownLatch(2)
    service.register(graft.service.QueryService.PipelineQuery(
      "slow_gate", Seq.empty,
      _ => { entered.countDown(); gate.await(); Seq(1L).toDF("one") }))
    val schema = graft.model.GraphSchema.builder()
      .vertex("acct", "id", Seq("bal")).build()
    val gs = new graft.model.GraphStore(spark, schema,
      java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("target"), "admit-gs").toString)
    gs.txn().createVertices("acct", Seq((1L, 1.0)).toDF("id", "bal")).commit()
    val ep = new graft.service.HttpEndpoint(service, store = Some(gs))
    val port = ep.start(0, workerThreads = 4, maxConcurrentQueries = 2)
    val client = HttpClient.newHttpClient()
    def req(path: String) =
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString("{}")).build()
    def send(path: String) = client.send(req(path), HttpResponse.BodyHandlers.ofString())
    try {
      val f1 = client.sendAsync(req("/query/slow_gate"), HttpResponse.BodyHandlers.ofString())
      val f2 = client.sendAsync(req("/query/slow_gate"), HttpResponse.BodyHandlers.ofString())
      assert(entered.await(30, java.util.concurrent.TimeUnit.SECONDS),
        "both slow queries must be in flight holding the only two slots")
      val third = send("/query/slow_gate")
      assert(third.statusCode() == 429, third.body())
      assert(third.headers().firstValue("Retry-After").isPresent,
        "admission rejection must carry Retry-After")
      // /pattern shares the same admission gate
      assert(send("/pattern").statusCode() == 429)
      // admin keeps its lanes while EVERY query slot is held —
      // monitoring a saturated server is when stats matter; and the
      // stats taken AT saturation report it: both slots in flight,
      // the two rejections counted
      val satStats = send("/admin/stats")
      assert(satStats.statusCode() == 200)
      assert(satStats.body().contains(
        """"service": {"query_slots": 2, "queries_in_flight": 2, "rejected_429": 2}"""),
        s"saturation must be visible in stats: ${satStats.body()}")
      gate.countDown()
      assert(f1.get(30, java.util.concurrent.TimeUnit.SECONDS).statusCode() == 200)
      assert(f2.get(30, java.util.concurrent.TimeUnit.SECONDS).statusCode() == 200)
      // slots released: admission recovers
      assert(send("/query/slow_gate").statusCode() == 200)
    } finally { gate.countDown(); ep.stop() }
  }

  test("admin stats: graph-stats report (epoch, per-table commit telemetry, " +
      "store footprints) — read-only, sane and monotone mid-storm (r10 #5)") {
    import spark.implicits._
    val schema = graft.model.GraphSchema.builder()
      .vertex("acct", "id", Seq("seg", "bal")).build()
    val gs = new graft.model.GraphStore(spark, schema,
      java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("target"), "stats-gs").toString)
    gs.txn().createVertices("acct",
      (0L until 20L).map(i => (i, s"s${i % 3}", i.toDouble)).toDF("id", "seg", "bal"))
      .commit()
    val cat = new graft.views.ViewCatalog(spark, gs,
      java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("target"), "stats-views").toString)
    cat.register(graft.views.ViewDef("bal_by_seg", "acct",
      df => df.select(col("seg").as("key"), col("id"), col("bal").as("value")),
      reduceAgg = Some(sum(col("value")))))
    cat.bindTo(gs)
    cat.regenerate("bal_by_seg")
    // READ-ONLY endpoint: telemetry must not require the write effect.
    // indexDirs exercises the maintained-index footprint branch (any
    // GenDirs layout works; the view root doubles as one here)
    val ep = new graft.service.HttpEndpoint(service, store = Some(gs),
      allowWrites = false, views = Some(cat),
      indexDirs = Map("bal_idx" -> cat.rootOf("bal_by_seg").toString))
    val port = ep.start()
    val client = HttpClient.newHttpClient()
    def pollWith(body: String, expect: Int = 200): String = {
      val r = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/admin/stats"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == expect, r.body())
      r.body()
    }
    def poll(): String = pollWith("")
    def epochOf(b: String) = """"epoch": (\d+)""".r.findFirstMatchIn(b).get.group(1).toLong
    def commitsOf(b: String) =
      """"table": "v_acct", "commits": (\d+)""".r.findFirstMatchIn(b).get.group(1).toInt
    try {
      val s0 = poll()
      assert(epochOf(s0) >= 1 && commitsOf(s0) == 1)
      assert(s0.contains(""""rows": 20""") && s0.contains("rows_per_commit"))
      assert(""""kind": "view", "name": "bal_by_seg", "gen": 1""".r
        .findFirstIn(s0).isDefined, s"view footprint missing: $s0")
      assert(""""base_files": [1-9]""".r.findFirstIn(s0).isDefined,
        "a regenerated view must report a non-empty base")
      // WRITE STORM underneath the poller: commit telemetry must stay
      // sane (parseable, monotone) while the log grows mid-read
      val writer = new Thread(() => (0 until 8).foreach { j =>
        gs.txn().createVertices("acct",
          Seq((1000L + j, "sX", 1.0)).toDF("id", "seg", "bal")).commit()
      })
      writer.start()
      var lastEpoch = epochOf(s0); var lastCommits = commitsOf(s0)
      (0 until 3).foreach { _ =>
        val b = poll()
        val (e, c) = (epochOf(b), commitsOf(b))
        assert(e >= lastEpoch && c >= lastCommits,
          s"telemetry went backwards: epoch $lastEpoch->$e commits $lastCommits->$c")
        lastEpoch = e; lastCommits = c
      }
      writer.join()
      val fin = poll()
      assert(epochOf(fin) == 9 && commitsOf(fin) == 9) // 1 + 8 storm commits
      // commit-rate field present and non-negative
      val rate = """"commits_per_sec": ([0-9.]+)""".r.findFirstMatchIn(fin).get.group(1).toDouble
      assert(rate >= 0.0)
      // the index footprint branch reports the GenDirs layout
      assert(""""kind": "index", "name": "bal_idx", "gen": 1""".r
        .findFirstIn(fin).isDefined, s"index footprint missing: $fin")
      // WINDOWED poll: only the epochs inside the window count — a
      // telemetry poll on a long-lived store stays O(window)
      val win = pollWith("""{"window": 2}""")
      assert(win.contains(""""window_from_epoch": 7"""), win)
      assert(commitsOf(win) == 2, s"window=2 must see exactly 2 commits: $win")
      pollWith("""{"window": -1}""", expect = 400)
      // the dashboard data series: raw windowed (table, epoch, rows,
      // at_ms) points, epoch-ordered (the chart.lisp plot input)
      val ser = pollWith("""{"window": 2, "series": true}""")
      val pts = """"epoch": (\d+), "rows": (\d+), "at_ms": (\d+)""".r
        .findAllMatchIn(ser).map(m => (m.group(1).toLong, m.group(2).toLong)).toSeq
      assert(pts.map(_._1) == Seq(8L, 9L) && pts.forall(_._2 == 1L),
        s"series must carry exactly the windowed epochs in order: $ser")
      assert(!poll().contains("\"series\""), "series is opt-in")
      // exactly-once ingest cursors: absent until a sink commits, then
      // one (sink_id, batch_id, slice) row per sink
      assert(!poll().contains("\"ingest\""), "no sinks → no ingest section")
      val sink = graft.streaming.TransactionalIngest.vertexSink(gs, "acct", "restsink")
      sink(Seq((900L, "s9", 9.0)).toDF("id", "seg", "bal"), 7L)
      assert(poll().contains(
        """"ingest": [{"sink_id": "restsink", "batch_id": 7, "slice": 0}]"""),
        s"ingest cursor missing: ${poll()}")
      // trailing-minute op rates (stats.lisp:51's avg-writes/reads-
      // per-second): every commit above is fresher than 60s, so the
      // write rate is exactly commits/61; reads tick once per served
      // query request (ring mechanics pinned in ReadStatsSpec)
      val rates = poll()
      def rateOf(b: String, k: String) =
        (s""""$k": ([0-9.]+)""").r.findFirstMatchIn(b).get.group(1).toDouble
      assert(rateOf(rates, "avg_writes_per_sec") > 0.0,
        s"fresh commits must show a write rate: $rates")
      val reads0 = rateOf(rates, "avg_reads_per_sec")
      val pat = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/pattern"))
          .POST(HttpRequest.BodyPublishers.ofString(
            """{"match":[{"vertex":"a","type":"customer"}],"select":["a"],"limit":1}"""))
          .build(), HttpResponse.BodyHandlers.ofString())
      assert(pat.statusCode() == 200, pat.body())
      assert(rateOf(poll(), "avg_reads_per_sec") > reads0,
        "a served query request must tick the read rate")
      // the chart.lisp dashboard: /admin/chart is read-only SVG with
      // both per-second series and the reference's axis labels
      def chart(body: String): HttpResponse[String] = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/admin/chart"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      val cr = chart("""{"span": 120, "width": 800, "height": 450}""")
      assert(cr.statusCode() == 200)
      assert(cr.headers().firstValue("Content-Type").orElse("") == "image/svg+xml")
      val svg = cr.body()
      assert(svg.startsWith("<svg") && svg.endsWith("</svg>"))
      assert("<polyline".r.findAllMatchIn(svg).size == 2,
        s"chart must carry the Writes and Reads polylines: ${svg.take(400)}")
      assert(svg.contains(">Writes</text>") && svg.contains(">Reads</text>") &&
        svg.contains(">Count</text>"))
      assert(chart("""{"span": 0}""").statusCode() == 400)
      assert(chart("""{"span": 601}""").statusCode() == 400)
    } finally ep.stop()
  }

  test("motif string accepted by the JSON DSL") {
    val viaMotif = service.runAdHoc(
      """{"motif": "(a:customer)-[placed price]->(o)",
        | "where":[{"cmp":["price",">",150000]}],
        | "select":["a","o","price"], "orderBy":["o"]}""".stripMargin)
    val viaMatch = service.runAdHoc(
      """{"match":[{"vertex":"a","type":"customer"},
        |          {"edge":"placed","from":"a","to":"o","weight":"price"}],
        | "where":[{"cmp":["price",">",150000]}],
        | "select":["a","o","price"], "orderBy":["o"]}""".stripMargin)
    assert(viaMotif.collect().toSeq == viaMatch.collect().toSeq)
    intercept[BadRequestException] { service.runAdHoc("""{"motif": "(a-bad", "select":["a"]}""") }
  }

  test("drift monitor over REST: snapshot_stats pins a reference, a shifted " +
      "commit flags through read-only /admin/drift; missing index/ref are 404") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "http-drift").toString
    val gs = new graft.model.GraphStore(spark, graft.model.GraphSchema.builder()
      .vertex("doc", "id", Seq("len")).build(), dir)
    val idx = new graft.operators.MaintainedStatsIndex(
      gs, "v_doc", "len", 0.0, 1000.0, 8, dir)
    idx.rebuild(); idx.bind()
    import spark.implicits._
    gs.txn().createVertices("doc",
      (1L to 80L).map(i => (i, 100L + i % 100)).toDF("id", "len")).commit()
    val writable = new graft.service.HttpEndpoint(service, store = Some(gs),
      allowWrites = true, statsIndexes = Map("doc_len" -> idx))
    val readOnly = new graft.service.HttpEndpoint(service, store = Some(gs),
      statsIndexes = Map("doc_len" -> idx))
    val wPort = writable.start(); val rPort = readOnly.start()
    val client = HttpClient.newHttpClient()
    def post(port: Int, path: String, body: String): HttpResponse[String] =
      client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
    try {
      // pin the monitor reference (a write -> 403 on the read-only tier)
      assert(post(rPort, "/admin/snapshot_stats",
        """{"index":"doc_len","name":"m0"}""").statusCode() == 403)
      assert(post(wPort, "/admin/snapshot_stats",
        """{"index":"doc_len","name":"m0"}""").statusCode() == 200)
      // before any new commit: self-drift is zero, readable WITHOUT writes
      val flat = post(rPort, "/admin/drift", """{"index":"doc_len","ref":"m0"}""")
      assert(flat.statusCode() == 200 && flat.body().contains("\"psi_ppm\": 0"))
      // a shifted commit lands; the monitor must flag it at O(nBins)
      gs.txn().createVertices("doc",
        (81L to 140L).map(i => (i, 850L + i % 100)).toDF("id", "len")).commit()
      val shifted = post(rPort, "/admin/drift", """{"index":"doc_len","ref":"m0"}""")
      assert(shifted.statusCode() == 200)
      val psi = "\"psi_ppm\": (-?\\d+)".r.findFirstMatchIn(shifted.body()).get.group(1).toLong
      assert(psi > 250000L, s"shifted commit not flagged over REST: $psi")
      // error taxonomy: unknown index / unknown reference are 404s
      assert(post(rPort, "/admin/drift", """{"index":"nope","ref":"m0"}""").statusCode() == 404)
      assert(post(rPort, "/admin/drift", """{"index":"doc_len","ref":"nope"}""").statusCode() == 404)
      // 'group' against an unstratified index is a 400
      assert(post(rPort, "/admin/drift",
        """{"index":"doc_len","ref":"m0","group":"en"}""").statusCode() == 400)
    } finally { writable.stop(); readOnly.stop() }
  }

  test("VOCABULARY drift over REST: a feature-hash stats index (the q225 " +
      "maintained DSIR model) serves the same snapshot_stats/drift verbs — " +
      "a token-shifting commit flags, a same-distribution commit stays low") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "http-vdrift").toString
    val gs = new graft.model.GraphStore(spark, graft.model.GraphSchema.builder()
      .vertex("doc", "id", Seq("text")).build(), dir)
    val idx = new graft.operators.MaintainedStatsIndex(
      gs, "v_doc", "text", 0.0, 1.0, 64, dir, featureHash = true)
    idx.rebuild(); idx.bind()
    import spark.implicits._
    def corpus(ids: Range, words: Seq[String]) =
      ids.map(i => (i.toLong,
        (0 until 8).map(j => words((i + j) % words.size)).mkString(" "))).toDF("id", "text")
    val english = Seq("the", "cat", "sat", "on", "mat", "a", "dog", "ran")
    gs.txn().createVertices("doc", corpus(1 to 60, english)).commit()
    val ep = new graft.service.HttpEndpoint(service, store = Some(gs),
      allowWrites = true, statsIndexes = Map("doc_vocab" -> idx))
    val port = ep.start()
    val client = HttpClient.newHttpClient()
    def post(path: String, body: String): HttpResponse[String] =
      client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
    def psiOf(r: HttpResponse[String]): Long =
      "\"psi_ppm\": (-?\\d+)".r.findFirstMatchIn(r.body()).get.group(1).toLong
    try {
      assert(post("/admin/snapshot_stats",
        """{"index":"doc_vocab","name":"v0"}""").statusCode() == 200)
      // a same-vocabulary commit: feature distribution barely moves
      gs.txn().createVertices("doc", corpus(100 to 130, english)).commit()
      val low = post("/admin/drift", """{"index":"doc_vocab","ref":"v0"}""")
      assert(low.statusCode() == 200)
      val lowPsi = psiOf(low)
      // a vocabulary-SHIFTING commit: disjoint tokens, the monitor flags
      gs.txn().createVertices("doc", corpus(200 to 320,
        Seq("zork", "blix", "quux", "fnord", "grue", "plugh"))).commit()
      val high = post("/admin/drift", """{"index":"doc_vocab","ref":"v0"}""")
      assert(high.statusCode() == 200)
      val highPsi = psiOf(high)
      assert(lowPsi < 100000L,
        s"same-vocabulary commit must read low: $lowPsi")
      assert(highPsi > 250000L && highPsi > 3 * lowPsi,
        s"vocabulary shift not flagged over REST: $highPsi vs $lowPsi")
    } finally ep.stop()
  }

  test("stratified drift over REST: /admin/drift returns per-group strata, " +
      "a 'group' field narrows to one stratum, unknown stratum is 404") {
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "http-gdrift").toString
    val gs = new graft.model.GraphStore(spark, graft.model.GraphSchema.builder()
      .vertex("doc", "id", Seq("len", "lang")).build(), dir)
    val idx = new graft.operators.MaintainedStatsIndex(
      gs, "v_doc", "len", 0.0, 1000.0, 8, dir, groupCol = Some("lang"))
    idx.rebuild(); idx.bind()
    import spark.implicits._
    gs.txn().createVertices("doc",
      (1L to 60L).map(i => (i, 100L + i % 100, if (i % 2 == 0) "en" else "de"))
        .toDF("id", "len", "lang")).commit()
    val ep = new graft.service.HttpEndpoint(service, store = Some(gs),
      allowWrites = true, statsIndexes = Map("doc_len" -> idx))
    val port = ep.start()
    val client = HttpClient.newHttpClient()
    def post(path: String, body: String): HttpResponse[String] =
      client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
    try {
      assert(post("/admin/snapshot_stats",
        """{"index":"doc_len","name":"m0"}""").statusCode() == 200)
      // only the en stratum shifts
      gs.txn().createVertices("doc",
        (61L to 120L).map(i => (i, 850L + i % 100, "en")).toDF("id", "len", "lang"))
        .commit()
      val all = post("/admin/drift", """{"index":"doc_len","ref":"m0"}""")
      assert(all.statusCode() == 200 && all.body().contains("\"strata\""))
      val psis = "\"group\": \"(\\w+)\"[^}]*\"psi_ppm\": (-?\\d+)".r
        .findAllMatchIn(all.body()).map(m => m.group(1) -> m.group(2).toLong).toMap
      assert(psis.keySet == Set("en", "de"))
      assert(psis("en") > 250000L, s"shifted stratum not flagged: ${psis("en")}")
      assert(psis("de") == 0L, s"unshifted stratum must read zero: ${psis("de")}")
      val one = post("/admin/drift", """{"index":"doc_len","ref":"m0","group":"en"}""")
      assert(one.statusCode() == 200 && one.body().contains("\"group\": \"en\"")
        && !one.body().contains("strata"))
      assert(post("/admin/drift",
        """{"index":"doc_len","ref":"m0","group":"zz"}""").statusCode() == 404)
      // drift-GATED ingest over REST: pin a FRESH reference (the en
      // shift above is already-accepted history), then an aligned
      // batch lands (200) while a stratum-collapsing one refuses with
      // the OCC 409 and commits NOTHING; unknown gate index/ref are
      // 404s
      assert(post("/admin/snapshot_stats",
        """{"index":"doc_len","name":"m1"}""").statusCode() == 200)
      def rows(ids: Range, len: Long => Long, lang: String) = ids.map(i =>
        s"""{"id": $i, "len": ${len(i.toLong)}, "lang": "$lang"}""").mkString(",")
      val gate = """"gate": {"index":"doc_len","ref":"m1","psi_limit_ppm":250000}"""
      // aligned: the de stratum's own current mix (len 100 + i%100)
      val ok = post("/mutate/vertex/doc",
        s"""{"rows": [${rows(700 until 708, i => 100L + i % 100, "de")}], $gate}""")
      assert(ok.statusCode() == 200 && ok.body().contains("\"created\": 8"), ok.body())
      val bad = post("/mutate/vertex/doc",
        s"""{"rows": [${rows(800 until 870, _ => 5000L, "de")}], $gate}""")
      assert(bad.statusCode() == 409, s"${bad.statusCode()} ${bad.body()}")
      assert(bad.body().contains("'de'"), s"refusal names the stratum: ${bad.body()}")
      assert(post("/mutate/vertex/doc",
        s"""{"rows": [${rows(900 until 901, _ => 100L, "de")}],
           | "gate": {"index":"nope","ref":"m1","psi_limit_ppm":1}}""".stripMargin)
        .statusCode() == 404)
      assert(post("/mutate/vertex/doc",
        s"""{"rows": [${rows(901 until 902, _ => 100L, "de")}],
           | "gate": {"index":"doc_len","ref":"nope","psi_limit_ppm":1}}""".stripMargin)
        .statusCode() == 404)
      // the refused batch left nothing; the admitted one is all there
      val live = gs.store.read("v_doc").select("id")
        .collect().map(_.getLong(0)).toSet
      assert((700L until 708L).forall(live), "gated-admitted rows must land")
      assert((800L until 870L).forall(id => !live(id)),
        "a 409-refused REST batch must commit nothing")
    } finally ep.stop()
  }

  test("NdjsonDrain whose materialization job FAILS unpersists its partial " +
      "buffer blocks before rethrowing — repeated failing requests must not " +
      "leak persisted storage (r14 advice #1)") {
    import spark.implicits._
    val boom = org.apache.spark.sql.functions.udf((i: Long) =>
      if (i > 5) throw new RuntimeException("injected materialization failure")
      else i)
    val df = (0L until 32L).toDF("i").repartition(4)
      .select(boom(org.apache.spark.sql.functions.col("i")).as("j"))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // three consecutive failing requests: each must clean up after itself
    (1 to 3).foreach { _ =>
      intercept[Exception](new QueryService.NdjsonDrain(df))
    }
    val deadline = System.nanoTime() + 10e9.toLong
    def leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    while (leaked.nonEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(leaked.isEmpty,
      s"failed-constructor drains must unpersist their blocks, leaked: $leaked")
  }

  test("drainNdjson truncation contract: a mid-stream failure writes ONE " +
      "in-band error object with NO trailing newline and aborts with " +
      "MidStreamFailure; a clean drain ends every line with \\n (r14 advice #2)") {
    import graft.service.HttpEndpoint
    // clean drain: N lines, each terminated — completion is machine-checkable
    val ok = new java.io.ByteArrayOutputStream()
    HttpEndpoint.drainNdjson(ok, Iterator("{\"a\":1}", "{\"a\":2}"))
    val okTxt = ok.toString("UTF-8")
    assert(okTxt == "{\"a\":1}\n{\"a\":2}\n")
    // failing drain: two good lines land, then the in-band marker with no
    // terminator — a client sees an unterminated {"error": ...} final line
    // and KNOWS the stream was truncated rather than complete
    val bad = new java.io.ByteArrayOutputStream()
    val lines: Iterator[String] = new Iterator[String] {
      private var n = 0
      def hasNext = true
      def next(): String = {
        n += 1
        if (n > 2) throw new RuntimeException("evicted block recompute failed")
        s"""{"a":$n}"""
      }
    }
    val thrown = intercept[HttpEndpoint.MidStreamFailure](
      HttpEndpoint.drainNdjson(bad, lines))
    assert(thrown.getCause.getMessage.contains("evicted block"))
    val badTxt = bad.toString("UTF-8")
    assert(badTxt.startsWith("{\"a\":1}\n{\"a\":2}\n"), badTxt)
    val last = badTxt.linesIterator.toSeq.last
    assert(last.contains("\"error\"") && !badTxt.endsWith("\n"),
      s"truncation must be in-band and unterminated, got: $badTxt")
  }

  test("drainNdjson mid-line failure: when the line bytes landed but the " +
      "terminator write failed, NO marker is appended (it would concatenate " +
      "onto the partial line) — the unterminated data line is the signal " +
      "(r15 advice #4)") {
    import graft.service.HttpEndpoint
    // an OutputStream that accepts line bytes but dies on the '\n' write
    val sink = new java.io.ByteArrayOutputStream()
    val flaky = new java.io.OutputStream {
      override def write(b: Int): Unit = {
        if (b == '\n'.toInt && sink.size() > 8) // second line's terminator
          throw new java.io.IOException("socket reset mid-line")
        sink.write(b)
      }
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        sink.write(b, off, len)
    }
    val thrown = intercept[HttpEndpoint.MidStreamFailure](
      HttpEndpoint.drainNdjson(flaky, Iterator("{\"a\":1}", "{\"a\":2}")))
    assert(thrown.getCause.getMessage.contains("mid-line"))
    val txt = sink.toString("UTF-8")
    // first line complete, second line partial, and crucially NOT followed
    // by a concatenated {"error": ...} object
    assert(txt == "{\"a\":1}\n{\"a\":2}",
      s"mid-line failure must leave the partial line bare, got: $txt")
  }
}
