package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear-classifier training over a feature frame — the
  * "train the quality filter" step of a data pipeline (distilling a
  * hand-written rule gate, or human labels, into a scored model the
  * curation tier can threshold). Not a reference operator: the
  * reference stops at rule-based selection; training ON the engine is
  * the natural extension once per-doc integer features exist
  * (TextAnalysis.filterGate's stats).
  *
  * The model is a batch PERCEPTRON over integer features, not
  * float-gradient logistic regression, deliberately:
  *  - every quantity in the loop is an exact integer (predictions are
  *    sign tests, errors are in {-1,0,1}, updates are Σ err·x), so
  *    the trained weights are bit-identical across engines,
  *    partitionings and retries — a trainable GATE has to be
  *    reproducible, for the same reason Drift's bins are fixed-width;
  *  - no learning-rate/scale knobs whose float arithmetic would
  *    diverge in the last ulp between Spark and an oracle.
  *
  * Design for 100 TB: each round is ONE aggregation over the feature
  * frame — d+2 partial sums with map-side combine — and only those
  * d+2 longs reach the driver; the new weight vector returns to the
  * executors as plan literals. The corpus is never shuffled, never
  * collected, and never cached across rounds (each round's scan
  * pipelines through whole-stage codegen). Cost = rounds × one scan,
  * the same profile as [[TextAnalysis.bpeMerges]]' training loop.
  */
object Classify {

  /** A 0/1 step-indicator feature: `[statCol >= thr]` (geq) or
    * `[statCol <= thr]`. A threshold BASIS of these makes
    * AND-of-thresholds concepts (every rule gate) linearly separable —
    * an AND of k literals is the threshold `Σ literals >= k` — so the
    * perceptron can actually represent what it is distilling, while
    * raw-magnitude features leave it cycling around an inexpressible
    * boundary. Indicators also bound every update by the row count,
    * which tames full-batch overshoot.
    */
  final case class Indicator(name: String, statCol: String, geq: Boolean, thr: Long) {
    def column: Column = {
      val c = if (geq) col(statCol) >= thr else col(statCol) <= thr
      when(c, 1L).otherwise(0L)
    }
    def sql: String = {
      val op = if (geq) ">=" else "<="
      s"CAST(CASE WHEN $statCol $op $thr THEN 1 ELSE 0 END AS BIGINT)"
    }
    def featName: String = s"f_$name"
  }

  /** Project a stats frame onto an indicator basis (plus pass-through
    * columns) — the featurization step before [[perceptronTrain]].
    */
  def thresholdIndicators(stats: DataFrame, basis: Seq[Indicator],
      passThrough: Seq[String]): DataFrame =
    stats.select(passThrough.map(col) ++
      basis.map(i => i.column.as(i.featName)): _*)

  /** Train `rounds` batch-perceptron rounds on `xCols` (integer
    * feature columns; a constant bias feature is added internally)
    * against 0/1 `yCol`. Returns one row per round:
    * (iter, w_bias, w_<xCol>..., n_correct) where the weights are
    * AFTER the round's update and n_correct counts the predictions of
    * the weights the round STARTED with (so row 1 documents the
    * all-zero model's baseline and the last row's weights are the
    * trained model).
    *
    * `sample = Some((idCol, frac))` trains on the deterministic md5
    * hash-bucket slice of the corpus (the q77 split hash —
    * [[Sampling.hashBucket]] < frac·1000, a pure function of the ids,
    * so any engine, partitioning, or backfill re-derives the exact
    * training set). This is the 100 TB shape (r12 next-round #2):
    * `rounds` full-corpus passes to distill a gate is the wrong plan —
    * the sampled features materialize ONCE (localCheckpoint; training
    * is already eager, each round collects d+2 longs), so the corpus
    * is scanned once and every round aggregates sample-sized state.
    * n_correct and the pocket then score the SAMPLE; evaluate the
    * chosen model on the full frame with [[score]]+[[confusion]],
    * which stay one full pass regardless.
    */
  def perceptronTrain(feats: DataFrame, xCols: Seq[String], yCol: String,
      rounds: Int, sample: Option[(String, Double)] = None): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val spark = feats.sparkSession
    val train = sample match {
      case None => feats
      case Some((idCol, frac)) =>
        require(frac > 0.0 && frac <= 1.0, s"train fraction out of (0, 1]: $frac")
        feats.filter(Sampling.hashBucket(col(idCol), 1000)
          < math.round(frac * 1000)).localCheckpoint(true)
    }
    var w: Seq[Long] = Seq.fill(xCols.size + 1)(0L)
    val out = Seq.newBuilder[(Long, Seq[Long], Long)]
    for (t <- 1 to rounds) {
      val margin = marginExpr(w, xCols)
      val pred = when(margin > 0, 1L).otherwise(0L)
      val err = col(yCol) - pred
      val aggCols =
        sum(when(col(yCol) === pred, 1L).otherwise(0L)).as("n_correct") +:
          sum(err).as("g0") +:
          xCols.zipWithIndex.map { case (c, i) => sum(err * col(c)).as(s"g${i + 1}") }
      val row = train.agg(aggCols.head, aggCols.tail: _*).head
      // empty frame: sums are null — train to the zero model, 0 correct
      def g(i: Int): Long = if (row.isNullAt(i)) 0L else row.getLong(i)
      w = w.zipWithIndex.map { case (wi, i) => wi + g(i + 1) }
      out += ((t.toLong, w, g(0)))
    }
    import spark.implicits._
    out.result()
      .map { case (t, ws, c) => (t, ws(0), ws.drop(1), c) }
      .toDF("iter", "w_bias", "w_rest", "n_correct")
      .select(col("iter") +: col("w_bias") +:
        (xCols.indices.map(i => element_at(col("w_rest"), i + 1).as(s"w_${xCols(i)}")) :+
          col("n_correct")): _*)
  }

  /** The linear margin of `w` (bias first) over `xCols` — exact Long
    * arithmetic, usable both inside training rounds and for scoring a
    * corpus with a trained model.
    */
  def marginExpr(w: Seq[Long], xCols: Seq[String]): Column =
    xCols.zipWithIndex.foldLeft(lit(w.head)) { case (acc, (c, i)) =>
      acc + col(c) * lit(w(i + 1))
    }

  /** Score a feature frame with trained weights: adds `margin` (Long)
    * and `pred` (0/1 Long) columns.
    */
  def score(feats: DataFrame, w: Seq[Long], xCols: Seq[String]): DataFrame = {
    val m = marginExpr(w, xCols)
    feats.withColumn("margin", m).withColumn("pred",
      when(col("margin") > 0, 1L).otherwise(0L))
  }

  /** The final trained weight vector (bias first) from a
    * [[perceptronTrain]] result — the last row's weight columns.
    */
  def finalWeights(trained: DataFrame, xCols: Seq[String]): Seq[Long] = {
    val last = trained.orderBy(col("iter").desc).limit(1).head
    last.getLong(1) +: xCols.indices.map(i => last.getLong(2 + i))
  }

  /** The POCKET model from a [[perceptronTrain]] result: among the
    * weight vectors the rounds EVALUATED (round t's n_correct scores
    * the weights it started with — w_{t-1}, with w_0 the zero model),
    * the one with the highest n_correct, earliest round on ties. The
    * full-batch perceptron can cycle on non-separable data; the pocket
    * makes the trained model monotone in rounds regardless. Driver
    * cost: the `rounds`-row trained frame, nothing data-sized.
    */
  def pocketWeights(trained: DataFrame, xCols: Seq[String]): Seq[Long] = {
    val rows = trained.orderBy("iter").collect()
    val zero = Seq.fill(xCols.size + 1)(0L)
    val weightsAfter = rows.map(r =>
      r.getLong(1) +: xCols.indices.map(i => r.getLong(2 + i)))
    val candidates = rows.zipWithIndex.map { case (r, i) =>
      val started = if (i == 0) zero else weightsAfter(i - 1)
      (started, r.getLong(2 + xCols.size), i)
    }
    candidates.maxBy { case (_, acc, i) => (acc, -i.toLong) }._1
  }

  /** One-row model evaluation from a scored frame: the confusion
    * counts plus accuracy / precision / recall / F1 as exact
    * parts-per-million by integer division (F1 computed ON the ppm
    * precision/recall integers, so it is deterministic too; every
    * division guards its zero denominator to 0 — the pessimistic
    * convention). One map-side-combined aggregation; output is one
    * row regardless of corpus size.
    */
  def confusion(scored: DataFrame, yCol: String = "y",
      predCol: String = "pred"): DataFrame = {
    val y = col(yCol)
    val p = col(predCol)
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    scored.agg(
      cnt(y === 1 && p === 1).as("tp"), cnt(y === 0 && p === 1).as("fp"),
      cnt(y === 0 && p === 0).as("tn"), cnt(y === 1 && p === 0).as("fn"))
      .select(col("tp"), col("fp"), col("tn"), col("fn"),
        expr("((tp + tn) * 1000000) div greatest(tp + fp + tn + fn, 1)")
          .as("accuracy_ppm"),
        expr("(tp * 1000000) div greatest(tp + fp, 1)").as("precision_ppm"),
        expr("(tp * 1000000) div greatest(tp + fn, 1)").as("recall_ppm"))
      .withColumn("f1_ppm",
        expr("(2 * precision_ppm * recall_ppm) div greatest(precision_ppm + recall_ppm, 1)"))
  }

  /** Calibration curve of a scored frame: margins bucketed into
    * `nBins` FIXED-WIDTH integer bins over the corpus's exact
    * [min, max] margin span (the drift tier's deterministic-binning
    * discipline — quantile sketches would flap under repartitioning),
    * each bin reporting its observed positive rate in exact ppm. A
    * monotone pos_rate_ppm over bins means the margin actually ranks
    * quality and soft-curation thresholds (q211) can be placed by
    * rate; a flat or folded curve means the gate should not be trusted
    * away from its 0 threshold. `bin = ((margin − mn) · nBins) div
    * (mx − mn + 1)` — all int64, exact in any engine, and the product
    * stays in range for any |margin| ≤ ~5·10¹⁷/nBins.
    *
    * Scale shape: one 1-row (min, max) aggregate broadcast back, one
    * bin-grain aggregation with map-side combine; output is nBins
    * rows regardless of corpus size.
    */
  def calibration(scored: DataFrame, nBins: Int, yCol: String = "y",
      marginCol: String = "margin"): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val span = scored.agg(min(col(marginCol)).as("__mn"),
      max(col(marginCol)).as("__mx"))
    scored.select(col(marginCol).as("__m"), col(yCol).as("__y"))
      .crossJoin(broadcast(span))
      .withColumn("bin",
        expr(s"((__m - __mn) * $nBins) div (__mx - __mn + 1)"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("__y") === 1, 1L).otherwise(0L)).as("n_pos"),
        min("__m").as("margin_lo"), max("__m").as("margin_hi"))
      .withColumn("pos_rate_ppm", expr("(n_pos * 1000000) div n"))
  }
}
