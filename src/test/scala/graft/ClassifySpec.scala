package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.operators.Classify

/** Store-side contracts for the classifier trainer (q208/q209's DuckDB
  * hash gate runs in Verify; here CI pins what SQL cannot see):
  * bit-identical training under re-partitioning, the driver-mirror
  * differential over random feature frames, separable-data
  * convergence, and the empty/degenerate fixpoints.
  */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private val xCols = Seq("a", "b")

  /** The trainer's documented law, executed over plain Scala — shares
    * nothing with the engine but the rows. */
  private def mirror(rows: Seq[(Long, Long, Long)], rounds: Int): Seq[(Long, Seq[Long], Long)] = {
    var w = Seq(0L, 0L, 0L)
    (1 to rounds).map { t =>
      val preds = rows.map { case (a, b, y) =>
        val m = w(0) + w(1) * a + w(2) * b
        (a, b, y, if (m > 0) 1L else 0L)
      }
      val correct = preds.count { case (_, _, y, p) => y == p }.toLong
      w = Seq(
        w(0) + preds.map { case (_, _, y, p) => y - p }.sum,
        w(1) + preds.map { case (a, _, y, p) => (y - p) * a }.sum,
        w(2) + preds.map { case (_, b, y, p) => (y - p) * b }.sum)
      (t.toLong, w, correct)
    }
  }

  private def collectTrained(rows: Seq[(Long, Long, Long)], rounds: Int,
      parts: Int = 1): Seq[(Long, Seq[Long], Long)] = {
    val df = rows.toDF("a", "b", "y").repartition(parts)
    Classify.perceptronTrain(df, xCols, "y", rounds).orderBy("iter").collect()
      .map(r => (r.getLong(0), Seq(r.getLong(1), r.getLong(2), r.getLong(3)), r.getLong(4)))
      .toSeq
  }

  test("12 random feature frames: engine training equals the driver " +
      "mirror round for round, at any partitioning") {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(20260820L)
    var ran = 0
    while (ran < 12) {
      val gen = for {
        n <- Gen.choose(1, 60)
        rows <- Gen.listOfN(n, for {
          a <- Gen.choose(0L, 40L); b <- Gen.choose(0L, 40L)
          y <- Gen.oneOf(0L, 1L)
        } yield (a, b, y))
        rounds <- Gen.choose(1, 5)
        parts <- Gen.oneOf(1, 7)
      } yield (rows, rounds, parts)
      gen.apply(params, seed).foreach { case (rows, rounds, parts) =>
        ran += 1
        assert(collectTrained(rows, rounds, parts) == mirror(rows, rounds),
          s"trainer divergence on rounds=$rounds parts=$parts rows=$rows")
      }
      seed = seed.next
    }
    assert(ran >= 12)
  }

  test("training is bit-identical across partitionings (integer sums " +
      "are order-free; there is nothing to drift)") {
    val rows = (1 to 200).map(i => (i.toLong % 37, i.toLong % 11, i.toLong % 2))
    assert(collectTrained(rows, 4, parts = 1) == collectTrained(rows, 4, parts = 13))
  }

  test("indicator-basis AND concept converges and FREEZES: y = a && b " +
      "over 0/1 features reaches full accuracy, then zero gradients") {
    // the design claim behind gateBasis (CatalogPipeline): an AND of
    // literals is a linear threshold over indicator features, and with
    // bounded 0/1 features the full-batch walk settles instead of
    // cycling. (Raw-magnitude features DO cycle — that is why the
    // catalog featurizes through thresholdIndicators.)
    val rows = for {
      a <- Seq(0L, 1L); b <- Seq(0L, 1L); _ <- 1 to 10
    } yield (a, b, if (a == 1L && b == 1L) 1L else 0L)
    val out = collectTrained(rows, 10)
    val converged = out.indexWhere(_._3 == rows.size.toLong)
    assert(converged >= 0, s"never converged: ${out.map(_._3)}")
    // once perfect, gradients are zero: weights and accuracy freeze
    val tail = out.drop(converged)
    assert(tail.forall(_._3 == rows.size.toLong))
    assert(tail.map(_._2).distinct.size == 1,
      "weights moved after reaching zero error")
  }

  test("pocketWeights returns the best-EVALUATED model: its accuracy " +
      "equals the max per-round n_correct, even when rounds cycle") {
    // raw-magnitude features cycle (the motivating failure): pocket
    // accuracy must still be the max any round observed
    val rows = (0L to 30L).map(a => (a, 0L, if (a > 15) 1L else 0L))
    val df = rows.toDF("a", "b", "y")
    val trained = Classify.perceptronTrain(df, xCols, "y", 20)
    val best = trained.agg(max("n_correct")).head.getLong(0)
    val w = Classify.pocketWeights(trained, xCols)
    val acc = Classify.score(df, w, xCols)
      .filter(col("pred") === col("y")).count()
    assert(acc == best, s"pocket acc $acc != best observed $best")
  }

  test("thresholdIndicators renders the basis as 0/1 columns with " +
      "geq/leq semantics and keeps pass-through columns") {
    import graft.operators.Classify.Indicator
    val basis = Seq(Indicator("ge3", "v", geq = true, 3),
      Indicator("le5", "v", geq = false, 5))
    val out = Classify.thresholdIndicators(
      Seq((1L, 2L), (2L, 3L), (3L, 9L)).toDF("id", "v"), basis, Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 0L, 1L), (2L, 1L, 1L), (3L, 1L, 0L)))
  }

  test("sampled training is the md5-slice restated: training on " +
      "sample=(id, frac) equals training on the pre-filtered slice, " +
      "and the slice is a pure function of the ids (r12 next-round #2)") {
    val rows = (1L to 400L).map(i =>
      (i, i % 13, i % 5, if ((i % 13) + (i % 5) > 9) 1L else 0L))
    val df = rows.toDF("id", "a", "b", "y")
    val slice = df.filter(
      graft.operators.Sampling.hashBucket(col("id"), 1000) < 300)
    val viaSample = Classify.perceptronTrain(df, xCols, "y", 6,
      sample = Some(("id", 0.3))).orderBy("iter").collect().map(_.toSeq).toSeq
    val viaFilter = Classify.perceptronTrain(slice, xCols, "y", 6)
      .orderBy("iter").collect().map(_.toSeq).toSeq
    assert(viaSample == viaFilter, "sample option must equal the explicit slice")
    // determinism: re-deriving the sample (any partitioning) re-draws it
    val again = Classify.perceptronTrain(df.repartition(7), xCols, "y", 6,
      sample = Some(("id", 0.3))).orderBy("iter").collect().map(_.toSeq).toSeq
    assert(again == viaSample)
    // n_correct counts SAMPLE rows, not the corpus
    val nSample = slice.count()
    assert(viaSample.forall(_.last.asInstanceOf[Long] <= nSample))
  }

  test("sample-vs-full pocket parity on the separable fixture: the " +
      "slice-trained pocket generalizes — full-frame confusion equals " +
      "the full-trained pocket's (both perfect)") {
    // the gate concept is an AND of indicator literals (separable);
    // a 30% deterministic slice still exposes every concept region,
    // so the pocket trained on it must classify the FULL frame exactly
    // as the full-trained pocket does — the q208/q210 design claim
    val rows = for {
      id <- 1L to 240L
      a = id % 2; b = (id / 2) % 2
    } yield (id, a, b, if (a == 1L && b == 1L) 1L else 0L)
    val df = rows.toDF("id", "a", "b", "y")
    def pocketConfusion(sample: Option[(String, Double)]): Seq[Long] = {
      val trained = Classify.perceptronTrain(df, xCols, "y", 10, sample = sample)
      val w = Classify.pocketWeights(trained, xCols)
      Classify.confusion(Classify.score(df, w, xCols)).head.toSeq
        .take(4).map(_.asInstanceOf[Long])
    }
    val full = pocketConfusion(None)
    val sampled = pocketConfusion(Some(("id", 0.3)))
    assert(full == sampled, s"full $full vs sampled $sampled")
    assert(full(1) == 0L && full(3) == 0L, "separable fixture must be perfect")
  }

  test("empty frame trains to the zero model with 0 correct") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("a", "b", "y")
    val out = Classify.perceptronTrain(empty, xCols, "y", 2).orderBy("iter").collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(Seq(r.getLong(1), r.getLong(2), r.getLong(3)) == Seq(0L, 0L, 0L))
      assert(r.getLong(4) == 0L)
    }
  }

  test("finalWeights + score round trip: pred is the sign test of the " +
      "last round's weights") {
    val rows = (1 to 80).map(i => (i.toLong % 23, i.toLong % 7, (i % 3).toLong.min(1L)))
    val df = rows.toDF("a", "b", "y")
    val trained = Classify.perceptronTrain(df, xCols, "y", 3)
    val w = Classify.finalWeights(trained, xCols)
    val scored = Classify.score(df, w, xCols).collect()
    scored.foreach { r =>
      val m = w(0) + w(1) * r.getLong(0) + w(2) * r.getLong(1)
      assert(r.getLong(3) == m, "margin mismatch")
      assert(r.getLong(4) == (if (m > 0) 1L else 0L), "pred mismatch")
    }
  }

  test("calibration: fixed-width integer bins over the exact margin span, " +
      "per-bin positive rate in exact ppm, empty bins absent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // margins 0..9 (span 10, 2 bins of width 5); y = 1 iff margin >= 8
    val scored = (0L until 10L).map(m => (m, if (m >= 8) 1L else 0L))
      .toDF("margin", "y")
    val out = Classify.calibration(scored, nBins = 2)
      .orderBy("bin")
      .select("bin", "n", "n_pos", "margin_lo", "margin_hi", "pos_rate_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out(0) == (0L, 5L, 0L, 0L, 4L, 0L))
    assert(out(1) == (1L, 5L, 2L, 5L, 9L, 400000L))
    // negative margins: the span shift keeps bins nonnegative and exact
    val neg = Seq((-10L, 0L), (-1L, 0L), (5L, 1L)).toDF("margin", "y")
    val nb = Classify.calibration(neg, nBins = 4).orderBy("bin")
      .select("bin", "n").as[(Long, Long)].collect()
    // span = -10..5 (width 16): -10 → bin 0, -1 → (9*4)/16 = 2, 5 → 3;
    // bin 1 is EMPTY and therefore absent, not zero-padded
    assert(nb sameElements Array((0L, 1L), (2L, 1L), (3L, 1L)))
    // monotone-quality sanity: a margin that ranks y yields a
    // non-decreasing positive rate over bins
    val rates = Classify.calibration(scored, nBins = 5)
      .orderBy("bin").select("pos_rate_ppm").as[Long].collect()
    assert(rates.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    intercept[IllegalArgumentException](Classify.calibration(scored, nBins = 1))
  }
}
