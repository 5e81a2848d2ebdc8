package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry}

/** Synthetic scale check: self-scales the dedup/ANN/spatial inputs ×N
  * and measures wall-time ratios against the base scale factor — the
  * would-this-survive-a-scale-up evidence no fixed-SF bench gives.
  *
  * Scaled-corpus construction (per copy i of `factor`):
  *   - documents: ids re-keyed `doc_id*factor+i`; every token prefixed
  *     with `c<i>` — token and shingle counts per doc are UNCHANGED and
  *     the within-copy near-dup structure exactly mirrors the original
  *     (tokens bijectively renamed), while cross-copy Jaccard is 0. A
  *     naive ×N union of identical texts would instead manufacture
  *     N²-many cross-copy duplicate pairs and measure that artifact,
  *     not the operator's scaling.
  *   - embeddings / customer: ids re-keyed, payloads kept — ANN bucket
  *     occupancy and spatial cell occupancy grow ×N (top-k stays k).
  *   - everything else symlinked from the base dir.
  *
  * Methodology per query and per dir: one discarded warm-up run (which
  * also builds the dir-keyed ANN/spatial stores — store builds are a
  * one-time cost, not probe cost), then min of N timed runs — the same
  * steady-state discipline as [[graft.Bench]]. A query "survives" when
  * time ratio ≤ data ratio; latency-bound shapes should come in far
  * under it.
  */
object ScaleCheck {

  /** The dedup, similarity, spatial and corpus-text headliners — the
    * shapes whose scaling behavior BENCHNOTES claims — plus the
    * depth-bounded iterative graph shapes (q31/q83 walk 4 hops from a
    * fixed root over the knows graph, which the scaled customer table
    * grows ×N).
    */
  val queries: Seq[String] = Seq(
    "q31_bfs",
    "q32_transitive_closure",
    "q40_spatial_bbox",
    "q41_spatial_knn",
    "q42_spatial_radius",
    "q54_dedup_exact",
    "q56_minhash_lsh",
    "q58_cosine_topk",
    "q59_ann_lsh",
    "q67_ivf_ann",
    "q83_cheapest_paths",
    "q93_quota_sample",
    "q95_chunk_overlap",
    "q96_vocab",
    "q97_filter_gate",
    "q98_bpe_pairs",
    "q104_dup_spans",
    "q105_tfidf_keywords",
    "q106_posting_probe",
    "q107_bigram_lm",
    "q108_semantic_dedup",
    "q111_bm25_stored",
    "q112_ivfpq_ann",
    "q113_tfidf_stored",
    "q115_phrase_search",
    "q116_nn_graph",
    "q127_fuzzy_decontaminate", // cross-corpus LSH: train side scales ×N
    "q135_hybrid_rrf",          // fused retrieval: both lists rescan ×N
    "q137_novelty",             // window digests + min-owner join ×N
    "q145_cooccurrence",        // minDf-bounded pair space (vocab ×N here)
    "q164_link_prediction",     // RA candidates ≤ maxDegree·m over the ×N graph
    "q165_blocklist",           // one alternation pass per doc, no shuffle
    "q167_dhash_neardups",      // banding at distinct-hash grain (≤256 classes)
    "q168_standardize_dims",    // 64-key stats agg + broadcast apply ×N
    "q177_rank_transform",      // 64 per-dim window sorts ×N
    "q180_power_iteration",     // two aggs per round ×N, driver sees 64 rows
    "q173_source_scorecard",    // source-grain rollup over ×N docs
    "q184_label_similarity",    // labels² after one corpus agg
    "q185_source_similarity",   // sources×vocab grain (vocab ×N here)
    "q186_vocab_growth",        // first-seen reduce + one conditional agg
    "q190_ivfpq_filtered",      // filtered composed probe: cells pruned, predicate pushed ×N
    "q191_audio_curate",        // curation + audio keep-list: fingerprint-grain agg ×N
    "q192_curate_mix",          // curate → quota → epoch-mix: gate/dedup/rank/explode ×N
    "q193_mix_pack",            // mixed stream → packed sequences: bucketed prefix sum ×N
    "q198_stream_sample",       // streaming bottom-k sample: scan ×N, state fixed at shards×k
    "q203_drift_psi",           // drift gate: 2 scans + nBins-row shuffle ×N
    "q206_drift_embed",         // embedding-norm drift: one fold pass ×N
    "q207_stream_drift",        // online drift: scan ×N, state fixed at nBins rows
    "q210_eval_gate",           // classifier train+score+eval: 18 scans ×N, d+2 longs/round to driver
    "q221_dsir_select",         // DSIR selection: 2 feature scans ×N, model fixed at nBuckets rows
    "q224_decontaminated_mix",  // curate -> decon -> quota -> mix: eval-gram broadcast ×N
    "q227_lm_curate_mix",       // LM-gated mix: vocab-grain LM joins + source-row means ×N
    "q228_dsir_admission",      // batch scoring vs maintained model: nBuckets weights, batch scan ×N
    "q229_hard_negatives",      // BM25 mining: q87's explode + doc-grain aggs ×N
    "q230_temperature_mix",     // source-grain agg + 1-row total ×N
    "q231_vocab_coverage",      // vocab broadcast + (source, token) partial agg ×N
    "q233_decontaminate_by_set", // per-set gram broadcast, train shingled once ×N
    "q235_dedup_span_removal",  // q104 digest chain + row-local HOF excision ×N
    "q236_lm_tiers",            // q107 LM + per-lang ntile window ×N
    "q237_curriculum",          // two-level prefix sum, broadcast bases ×N
    "q238_contrastive_pairs")   // LSH + CC + pair-linear shingle joins ×N

  private def rekey(idCol: String, factor: Int, i: Int) =
    (col(idCol) * factor + i).as(idCol)

  private def scaledDocs(df: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { i =>
      // copy 0 keeps the ORIGINAL tokens: fixed-term probes (q106's
      // search terms) must match real postings in the scaled corpus or
      // their ×N measurement exercises an empty result set, not the
      // match/aggregate/rank path. Copies ≥ 1 are token-renamed as
      // documented above (cross-copy Jaccard stays 0 either way).
      val text = if (i == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", s"c$i$$1")
      df.select(rekey("doc_id", factor, i), text.as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)

  private def scaledById(df: DataFrame, idCol: String, factor: Int): DataFrame = {
    val rest = df.columns.filterNot(_ == idCol).map(col).toSeq
    (0 until factor).map { i =>
      df.select(rekey(idCol, factor, i) +: rest: _*)
    }.reduce(_ unionByName _)
  }

  /** Build (idempotently) the scaled dataset dir: 3 scaled tables,
    * everything else symlinked.
    */
  def ensureScaled(spark: SparkSession, base: String, factor: Int, out: String): Unit = {
    val marker = Paths.get(out, "_SCALED")
    // the marker records (base, factor): a rerun with different
    // parameters against the same out dir rebuilds instead of silently
    // measuring stale data
    val want = s"${Paths.get(base).toAbsolutePath} x$factor"
    if (Files.exists(marker) && new String(Files.readAllBytes(marker)) == want) return
    graft.model.Dirs.rmTree(Paths.get(out))
    Files.createDirectories(Paths.get(out))
    def read(t: String) = spark.read.parquet(s"$base/$t.parquet")
    scaledDocs(read("documents"), factor)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    scaledById(read("embeddings"), "vec_id", factor)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    scaledById(read("customer"), "c_custkey", factor)
      .write.mode("overwrite").parquet(s"$out/customer.parquet")
    graft.model.Dirs.childNames(Paths.get(base))
      .filter(n => n.endsWith(".parquet") &&
        !Set("documents.parquet", "embeddings.parquet", "customer.parquet")(n))
      .foreach { n =>
        // absolute target: a relative one would resolve against the
        // LINK's directory and dangle
        Files.createSymbolicLink(Paths.get(out, n), Paths.get(base, n).toAbsolutePath)
      }
    Files.write(marker, want.getBytes)
  }

  private def time(fn: => Unit): Double = {
    val t0 = System.nanoTime()
    fn
    (System.nanoTime() - t0) / 1e9
  }

  /** Deterministic power-law graph over n nodes: node k has out-degree
    * `max(1, min(cap, n/(k+1)))` — a few cap-degree hubs and a long
    * degree-1 tail; destinations uniform by hash. Total edges ≈
    * n·(1 + ln cap): LINEAR in n, so a ×N node scale is a ×N data
    * scale. This is the skew fixture the uniform knows graph
    * (out-degree exactly 2) cannot provide: a frontier containing a
    * hub joins `cap` edges on one key while tail keys carry one — the
    * shape where frontier joins die at scale if skew is mishandled.
    */
  def powerLawEdges(spark: SparkSession, n: Long, cap: Int = 1024): DataFrame =
    spark.range(n).select(col("id").as("src"),
        explode(sequence(lit(0L),
          greatest(lit(1L), least(lit(cap.toLong),
            (lit(n) / (col("id") + 1L)).cast("long"))) - 1L)).as("j"))
      .select(col("src"),
        pmod(xxhash64(col("src"), col("j")), lit(n)).as("dst"),
        (pmod(xxhash64(col("j"), col("src")), lit(9L)) + 1L).as("w"))

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 8
    val out = if (args.length > 2) args(2) else s"target/scalecheck/x$factor"
    // optional 4th arg: comma-separated subset of catalog rows to sweep
    // (e.g. re-measuring one fixed shape without the 40-row full run);
    // "-" or absent = full sweep. The pl_* fixture shapes always run on
    // a full sweep and never on a subset one.
    val only: Option[Set[String]] = args.lift(3).filterNot(_ == "-")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = GraftSession.get(32)
    ensureScaled(spark, base, factor, out)

    def measure(dir: String, name: String): Double = {
      val fn = SparkEntry.queries(name)
      fn(spark, dir).count() // warm-up (+ one-time store builds), discarded
      Seq.fill(runs)(time(fn(spark, dir).count())).min
    }

    val rows = only.fold(queries)(s => queries.filter(s)).map { name =>
      val tBase = measure(base, name)
      val tScaled = measure(out, name)
      (name, tBase, tScaled, tScaled / tBase)
    }

    // iterative graph shapes on the power-law fixture. Depth-bounded
    // shapes (bfs / cheapest paths) hold the round count fixed across
    // scales, so time ratio ≤ data ratio is the honest gate. The
    // UNBOUNDED closure is reported but held to a looser 2× gate: its
    // reachable set grows ×N AND its round count grows with the
    // diameter (log N / log avg-degree — one extra round over ~4 is
    // +25% on top of the data ratio), which is the semantics of the
    // query, not an operator weakness.
    import graft.operators.{Fixpoint, Traverse}
    val nBase = spark.read.parquet(s"$base/customer.parquet").count()
    def plShapes(n: Long): Seq[(String, () => Unit)] = {
      val edges = powerLawEdges(spark, n).localCheckpoint(true)
      val hub = spark.range(1).select(col("id"))
      val tailN = spark.range(n - 1, n).select(col("id"))
      Seq(
        ("pl_bfs_hub", () => { Traverse.bfs(edges, hub, maxDepth = 4).count(); () }),
        ("pl_bfs_tail", () => { Traverse.bfs(edges, tailN, maxDepth = 4).count(); () }),
        ("pl_cheapest_hub", () => { Traverse.cheapestPaths(edges, hub, maxHops = 4).count(); () }),
        ("pl_closure_hub", () => { Fixpoint.reachable(edges, hub).count(); () }))
    }
    val plBase = if (only.isDefined) Seq.empty else plShapes(nBase)
    val plScaled = if (only.isDefined) Seq.empty else plShapes(nBase * factor)
    val plRows = plBase.zip(plScaled).map { case ((name, fb), (_, fs)) =>
      fb(); val tBase = Seq.fill(runs)(time(fb())).min
      fs(); val tScaled = Seq.fill(runs)(time(fs())).min
      (name, tBase, tScaled, tScaled / tBase)
    }

    // q194 streaming near-dup state probe (r10 #4): prove the watermark
    // horizon BOUNDS join state rather than asserting it. Both scales
    // run chunked (maxFilesPerTrigger=1 over doc_id-range-partitioned
    // files, so event time advances batch by batch and eviction runs)
    // with event time compressed until the BASE corpus spans ~8
    // ±30-day horizons. secondsPerDoc is the SAME at both scales, so
    // docs-per-horizon is identical and a horizon-bounded join must
    // keep PEAK state roughly flat while the corpus — and the
    // banded-rows worst case an unbounded join would retain — grows
    // ×N (files hold equal doc counts, so watermark lag matches too).
    val q194Probe: Option[(graft.CatalogStreaming.NeardupStateProbe,
        graft.CatalogStreaming.NeardupStateProbe)] =
      if (only.exists(!_.exists(_.startsWith("q194")))) None
      else Some {
        def chunked(dirIn: String, files: Int, outName: String): String = {
          val p = s"$out/$outName"
          if (!Files.exists(Paths.get(p, "_SUCCESS")))
            spark.read.parquet(s"$dirIn/documents.parquet")
              .repartitionByRange(files, col("doc_id"))
              .write.mode("overwrite").parquet(p)
          p
        }
        val nBaseDocs = spark.read.parquet(s"$base/documents.parquet").count()
        val secPerDoc = math.max(1L, 8L * 2592000L / math.max(nBaseDocs, 1L))
        val chunksBase = chunked(base, 8, "_q194_chunks_base")
        val chunksScaled = chunked(out, 8 * factor, s"_q194_chunks_x$factor")
        (graft.CatalogStreaming.neardupStateProbe(spark, chunksBase, secPerDoc, 1),
          graft.CatalogStreaming.neardupStateProbe(spark, chunksScaled, secPerDoc, 1))
      }

    val all = rows ++ plRows
    val qs = all.map { case (n, b, s, r) =>
      "\"" + n + f"""\":{"base_sec":$b%.3f,"scaled_sec":$s%.3f,"ratio":$r%.2f}"""
    }.mkString("{", ",", "}")
    // unbounded-fixpoint shapes carry the documented round-count term
    // (q32's reachable set and round count depend on the knows graph's
    // orbit structure at the scaled n, not just on data volume)
    val loose = Set("pl_closure_hub", "q32_transitive_closure")
    // each shape is judged against its own gate (loose shapes get 2x);
    // `worst` names the shape CLOSEST TO (or over) its gate, so a
    // failing loose shape is what the report points at, not a passing
    // strict one
    def gate(name: String): Double = if (loose(name)) factor * 2.0 else factor.toDouble
    // a q194-only subset run has no timed rows: report a neutral worst
    val worst = if (all.isEmpty) ("none", 0.0, 0.0, 0.0)
      else all.maxBy { case (n, _, _, r) => r / gate(n) }
    // state gates: eviction must RUN at both scales, and peak state at
    // ×N must stay far under the corpus-bounded worst case — we gate
    // peak_scaled ≤ 2 × peak_base (flat up to banding-occupancy noise)
    // while bandedRowsTotal grows ×N
    val statePass = q194Probe.forall { case (pb, ps) =>
      pb.rowsEvicted > 0 && ps.rowsEvicted > 0 &&
        ps.peakStateRows <= 2L * math.max(pb.peakStateRows, 1L) &&
        ps.peakStateRows < ps.bandedRowsTotal / 2
    }
    val stateJson = q194Probe.map { case (pb, ps) =>
      f""","q194_state_probe":{"base":{"peak_state_rows":${pb.peakStateRows},""" +
        f""""rows_evicted":${pb.rowsEvicted},"batches":${pb.batches},""" +
        f""""banded_rows_total":${pb.bandedRowsTotal},"candidates":${pb.candidates},""" +
        f""""sec":${pb.seconds}%.1f},""" +
        f""""scaled":{"peak_state_rows":${ps.peakStateRows},""" +
        f""""rows_evicted":${ps.rowsEvicted},"batches":${ps.batches},""" +
        f""""banded_rows_total":${ps.bandedRowsTotal},"candidates":${ps.candidates},""" +
        f""""sec":${ps.seconds}%.1f},""" +
        f""""time_ratio":${ps.seconds / pb.seconds}%.2f,"state_pass":$statePass}"""
    }.getOrElse("")
    val pass = all.forall { case (n, _, _, r) => r <= gate(n) } && statePass
    println(
      f"""{"metric":"scale_check","factor":$factor,"base":"$base","queries":$qs,""" +
        f""""worst":"${worst._1}","worst_ratio":${worst._4}%.2f,""" +
        f""""worst_gate":${gate(worst._1)}%.1f$stateJson,"pass":$pass}""")
    spark.stop()
  }
}
