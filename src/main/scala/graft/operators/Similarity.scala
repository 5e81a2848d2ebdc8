package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Brute-force cosine top-k is the correctness baseline (a single
  * narrow map + a TakeOrdered — no shuffle of the vectors themselves).
  * The scale path is random-hyperplane LSH: vectors are bucketed by a
  * short signature of sign-bits, so queries only scan their own bucket
  * (and optionally neighboring probes). All arithmetic is done with
  * higher-order column functions (`zip_with`/`aggregate`), which
  * codegen; no UDFs.
  */
object Similarity {

  /** dot(a, b) in double precision — the native codegen expression
    * ([[graft.functions.DotProductExpression]]): one primitive loop per
    * row instead of the interpreted per-element HOF walk, same IEEE
    * operation order (left-to-right double accumulation from 0.0), so
    * every cosine/rescore/assignment result is bit-identical.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProductExpression.vec_dot(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val denom = l2norm(a) * l2norm(b)
    when(denom === 0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Literal column from a query vector. */
  def vecLit(v: Seq[Double]): Column = array(v.map(lit): _*)

  /** L2-normalize a vector column (zero vectors pass through). For
    * cosine-metric IVF, cluster and probe NORMALIZED vectors: on the
    * unit sphere Euclidean distance is monotone in cosine (‖a−b‖² =
    * 2−2cos), so nearest-centroid probing agrees with the cosine
    * ranking — unnormalized, a cosine-near vector can live in a
    * Euclid-far cell and the probe misses it.
    */
  def l2normalize(a: Column): Column = {
    val n = l2norm(a)
    when(n === 0, transform(a, x => x.cast("double")))
      .otherwise(transform(a, x => x.cast("double") / n))
  }

  /** Brute-force cosine top-k against a fixed query vector. */
  def bruteForceTopK(df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Double], k: Int): DataFrame =
    df.select(col(idCol).as("id"),
        round(cosine(col(vecCol), vecLit(query)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id").asc)
      .limit(k)

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein 1998)
    * — the diversity pass a retrieval stack runs AFTER candidate
    * generation: from the `candK` most query-similar vectors, greedily
    * pick `selectK` maximizing
    * `mmr = λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)`,
    * so near-duplicate hits can't crowd the final list. All
    * similarities are cosines rounded to 6 (the q58 cross-engine
    * contract); `λ = lambdaPm/10⁴`; ties break on the lower id; the
    * first pick's penalty term is 0 (empty selected set).
    *
    * Scale shape: candidate generation is the distributed part (one
    * narrow map + TakeOrdered, or any ANN probe upstream); the greedy
    * loop runs on the BOUNDED candidate list — candK rows and candK²
    * pair cosines collected to the driver (the recall-audit bounded-
    * collect discipline: k is a knob, never corpus-sized). Pair
    * cosines come from a broadcast self-join of the k-row frame, so
    * the quadratic work is candidate-sized and distributed.
    * Returns (pick 1..selectK, id, rel, mmr) in selection order.
    */
  def mmrRerank(df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Double], candK: Int, selectK: Int,
      lambdaPm: Int = 7000): DataFrame = {
    require(selectK >= 1 && candK >= selectK, "need candK >= selectK >= 1")
    require(lambdaPm >= 0 && lambdaPm <= 10000, "lambdaPm in [0, 10000]")
    val spark = df.sparkSession
    val cand = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        round(cosine(col(vecCol), vecLit(query)), 6).as("rel"))
      .orderBy(col("rel").desc, col("id")).limit(candK)
      .localCheckpoint(eager = true) // reused by the pair join below
    val pairs = cand.select(col("id").as("id_a"), col("v").as("va"))
      .join(broadcast(cand.select(col("id").as("id_b"), col("v").as("vb"))),
        col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("va"), col("vb")), 6).as("sim"))
    // bounded collects: candK rels + candK·(candK−1) pair sims
    val rels = cand.select("id", "rel").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    val simMap = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // one HALF_UP decimal rounding, matching Spark's round() on doubles
    def r6(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
        .doubleValue()
    // both weights from the SAME integer knob: (1−λ) recomputed as
    // (10⁴−λpm)/10⁴ is the IEEE double an oracle's literal spells
    // (1.0 − ieee(0.7) would be 0.30000000000000004, not 0.3)
    val lam = lambdaPm / 10000.0
    val mu = (10000 - lambdaPm) / 10000.0
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
    val remaining = scala.collection.mutable.Map(rels: _*)
    while (selected.size < selectK && remaining.nonEmpty) {
      val scored = remaining.toSeq.map { case (id, rel) =>
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.map(s => simMap.getOrElse((id, s._1), 0.0)).max
        (id, rel, r6(lam * rel - mu * maxSim))
      }
      val best = scored.minBy { case (id, _, mmr) => (-mmr, id) }
      selected += best
      remaining.remove(best._1)
    }
    import spark.implicits._
    selected.toSeq.zipWithIndex
      .map { case ((id, rel, mmr), i) => (i + 1L, id, rel, mmr) }
      .toDF("pick", "id", "rel", "mmr")
  }

  /** Deterministic random hyperplanes (driver-side PRNG, fixed seed). */
  def hyperplanes(dim: Int, nBits: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-bit LSH signature of a vector under the given hyperplanes.
    * The plane matrix travels as ONE typed literal (array<array<double>>)
    * and the sign bits fold in a higher-order zip, so the expression
    * tree stays ~30 nodes regardless of dim×nBits — built per plane as
    * literal arrays, a 32-plane 64-dim signature was a ~4k-node tree
    * whose per-job analysis cost dominated every commit hook that
    * embedded it.
    */
  def lshSignature(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val weights: Seq[Long] = planes.indices.map(i => 1L << i)
    aggregate(
      zip_with(typedLit(planes), typedLit(weights),
        (p, w) => when(dot(vec, p) > 0, w).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc + v)
  }

  /** Bucketed ANN: assigns every vector to its LSH bucket. At query
    * time, scan only the query's bucket (single partition-pruned read
    * when the table is written partitioned by `bucket`).
    */
  def withLshBucket(df: DataFrame, vecCol: String, dim: Int,
      nBits: Int = 8, seed: Long = 42L): DataFrame =
    df.withColumn("bucket", lshSignature(col(vecCol), hyperplanes(dim, nBits, seed)))

  /** IVF (inverted-file) coarse quantizer: deterministic k-means-lite.
    * Centroids initialize from the k lowest-id vectors and refine with
    * a few Lloyd rounds; each round is one broadcast-join assignment
    * pass plus one positional-mean aggregation — no driver-side loops
    * over rows, only over the k×dim centroid matrix (tiny by design).
    */
  /** `roundTo`: round each updated centroid coordinate to that many
    * decimals INSIDE the aggregation (Spark SQL `round`, the same
    * rounding the DuckDB oracles apply) — this is what makes the
    * exposed k-means operator (q131) cross-engine deterministic: `avg`
    * over doubles is summation-order-dependent at ~1e-16 relative, and
    * per-iteration decimal rounding absorbs that drift before it can
    * compound across Lloyd rounds. `None` (the default, used by the
    * IVF stores) keeps full precision.
    */
  def ivfTrain(df: DataFrame, vecCol: String, idCol: String,
      k: Int, iterations: Int = 3, roundTo: Option[Int] = None): Seq[Seq[Double]] = {
    var centroids: Seq[Seq[Double]] = df.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Number](0).map(_.doubleValue()).toSeq).toSeq
    require(centroids.nonEmpty, "ivfTrain needs a non-empty vector table")
    val meanCol = roundTo.foldLeft(avg(col("col").cast("double")))(
      (m, d) => round(m, d))
    (1 to iterations).foreach { _ =>
      val assigned = ivfAssign(df, vecCol, centroids)
      val means = assigned
        .select(col("ivf_cluster"), posexplode(col(vecCol)))
        .groupBy("ivf_cluster", "pos").agg(meanCol.as("m"))
        .collect()
      val byCluster = means.groupBy(_.getAs[Int]("ivf_cluster"))
      centroids = centroids.zipWithIndex.map { case (old, i) =>
        byCluster.get(i) match {
          case Some(rows) => rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[Double]("m")).toSeq
          case None => old // empty cluster keeps its centroid
        }
      }
    }
    centroids
  }

  /** Per-centroid (‖c‖², index) metadata literal for the assignment
    * argmins below — ‖c‖² is driver-side constant, so the row-side
    * distance needs only one dot product per centroid.
    */
  private def centroidMeta(centroids: Seq[Seq[Double]]): Column =
    typedLit(centroids.zipWithIndex.map { case (c, i) =>
      (c.map(x => x * x).sum, i)
    })

  /** Assign each vector to its nearest centroid (append `ivf_cluster`).
    * Pure column expressions, one narrow pass; the centroid matrix is
    * ONE typed literal (see [[lshSignature]] — flat tree size in k×dim)
    * and the squared distance is computed as ‖c‖² − 2·v·c — the ‖v‖²
    * term is constant per row across centroids, so the argmin is
    * identical to Σ(x−y)² at one dot product per centroid.
    */
  def ivfAssign(df: DataFrame, vecCol: String, centroids: Seq[Seq[Double]]): DataFrame = {
    val dists = zip_with(typedLit(centroids), centroidMeta(centroids),
      (c, m) => struct(
        (m.getField("_1") - lit(2.0) * dot(col(vecCol), c)).as("d"),
        m.getField("_2").as("i")))
    df.withColumn("ivf_cluster", array_min(dists).getField("i"))
  }

  /** Cosine-space assignment of RAW vectors: nearest centroid to the
    * L2-NORMALIZED vector, computed as argmin ‖c‖² − 2·(v·c)/‖v‖
    * WITHOUT materializing the normalized column — a lazily inlined
    * [[l2normalize]] re-evaluates the norm per element per centroid
    * (O(k·d²) interpreted ops per row; ~2 s per small commit measured
    * in the maintained-IVF hook), where this form pays one dot and one
    * norm per centroid. Zero vectors keep the l2normalize pass-through
    * convention (assigned to the smallest-norm centroid).
    */
  def ivfAssignCosine(df: DataFrame, vecCol: String, centroids: Seq[Seq[Double]]): DataFrame = {
    val nrm = l2norm(col(vecCol))
    val dists = zip_with(typedLit(centroids), centroidMeta(centroids),
      (c, m) => struct(
        (m.getField("_1") - lit(2.0) *
          when(nrm === 0, lit(0.0)).otherwise(dot(col(vecCol), c) / nrm)).as("d"),
        m.getField("_2").as("i")))
    df.withColumn("ivf_cluster", array_min(dists).getField("i"))
  }

  /** IVF ANN top-k: probe the nProbe nearest centroid cells, rescore
    * exactly within them. Write the assigned table partitioned by
    * `ivf_cluster` and the probe becomes a partition-pruned read.
    */
  def ivfTopK(assigned: DataFrame, vecCol: String, idCol: String,
      centroids: Seq[Seq[Double]], query: Seq[Double], k: Int, nProbe: Int = 2,
      probeVec: Option[Seq[Double]] = None): DataFrame = {
    // probe selection may run in a different space than scoring: for
    // cosine-metric IVF the centroids live on the unit sphere, so pass
    // the NORMALIZED query here while `query` stays raw for rescoring
    val pq = probeVec.getOrElse(query)
    val probes = centroids.zipWithIndex
      .map { case (c, i) =>
        val d = c.zip(pq).map { case (a, b) => (a - b) * (a - b) }.sum
        (d, i)
      }.sortBy(_._1).take(nProbe).map(_._2)
    assigned.filter(col("ivf_cluster").isin(probes: _*))
      .select(col(idCol).as("id"),
        round(cosine(col(vecCol), vecLit(query)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id").asc)
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs: multi-table sign-LSH
    * candidate generation + exact cosine verification — the embedding
    * analog of [[Dedup.minhashNearDups]]. Returns (id_a, id_b, cos_sim)
    * with id_a < id_b and cos_sim >= threshold.
    *
    * Shuffle budget: the bucket self-join moves only (table, bucket,
    * id) triples — vectors never fan out per table; verification joins
    * the candidate ids back to the vectors. Near-duplicates (cosine ≥
    * ~0.9, i.e. angle ≤ ~25°) collide in some table with probability
    * ≥ 1−(1−(1−θ/π)^nBits)^nTables ≈ 1−2·10⁻⁴ at the defaults; recall
    * for MODERATE similarities is poor by construction — sign-LSH is a
    * near-dup detector, not a mid-range similarity join.
    */
  def cosineNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.9, nBits: Int = 4, nTables: Int = 8,
      seed: Long = 42L, prebuilt: Option[DataFrame] = None): DataFrame = {
    // `prebuilt` serves the narrow (id, table, bucket) rows of a
    // WRITTEN signature store ([[ensureDedupSigStore]]): signatures
    // are then read, never recomputed — the persisted-signature
    // discipline Dedup.minhashNearDups's `sigs` gives text. nBits and
    // seed are baked into the store in that case.
    val probe = df.select(size(col(vecCol))).limit(1).collect()
    if (probe.isEmpty) // empty corpus → empty pair set, not a crash
      return df.sparkSession.emptyDataFrame
        .select(lit(0L).as("id_a"), lit(0L).as("id_b"), lit(0.0).as("cos_sim")).limit(0)
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v")).localCheckpoint(true)
    val buckets = prebuilt match {
      case Some(store) => store.select(col("id"), col("table"), col("bucket"))
      case None =>
        val dim = probe.head.getInt(0)
        val sigCols = (0 until nTables).map { t =>
          lshSignature(col("v"), hyperplanes(dim, nBits, seed + t))
        }
        vecs.select(col("id"), posexplode(array(sigCols: _*)))
          .withColumnsRenamed(Map("pos" -> "table", "col" -> "bucket"))
    }
    val pairs = buckets.as("a").join(buckets.as("b"), Seq("table", "bucket"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    pairs
      .join(vecs.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .withColumn("cos_sim", round(cosine(col("v_a"), col("v_b")), 6))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
  }

  /** Scalar int8 quantization of an embedding column (the SQ8 scheme:
    * per-vector absmax scaling, `code_i = round(x_i * 127 / max|x|)`)
    * → `(id, scale, codes)` where `dequantized_i = codes_i * scale`.
    * The compression step of a large-scale vector store: 4× smaller
    * than float32, which at 100 TB of embeddings is the difference
    * between a probe reading 25 TB and 100 TB.
    *
    * Two-phase with a materialization barrier: the per-element
    * quantization lambda would otherwise re-evaluate the absmax
    * reduction per element (O(d²) per row — HOF lambdas re-evaluate
    * their operand expressions). At scale this frame IS the artifact
    * you persist (the smaller store the IVF/LSH stages then read), so
    * the barrier coincides with the write.
    *
    * Integer codes are bit-portable across engines: float→double casts
    * and double ×/÷ are IEEE-exact everywhere, and both Spark and
    * DuckDB round half away from zero.
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val staged = df.select(col(idCol).as("id"), col(vecCol).as("__v"),
        array_max(transform(col(vecCol), x => abs(x.cast("double")))).as("__absmax"))
      .localCheckpoint(eager = true)
    staged.select(col("id"),
      (col("__absmax") / 127.0).as("scale"),
      when(col("__absmax") === 0,
          transform(col("__v"), x => lit(0).cast("tinyint")))
        .otherwise(transform(col("__v"),
          x => round(x.cast("double") * lit(127.0) / col("__absmax"), 0).cast("tinyint")))
        .as("codes"))
  }

  /** Reconstruct approximate doubles from an SQ8 row ([[quantizeInt8]]). */
  def dequantizeInt8(scale: Column, codes: Column): Column =
    transform(codes, c => c.cast("double") * scale)

  /** Per-label embedding outlier detection — the mislabeled-data /
    * noise-pruning pass of embedding-based curation: score each vector
    * by its Euclidean distance to its OWN label's centroid and flag
    * those beyond `sigmas` standard deviations of the label's distance
    * distribution (a vector far from its class center is a labeling
    * error, an encoder failure, or genuine tail data — all of which a
    * training-set audit wants surfaced).
    *
    * Scale shape: centroids are one positional-mean aggregation
    * (map-side partial, label×dim rows) and the label stats one more
    * label-keyed pass — both label-vocabulary-sized, so they broadcast
    * back onto the corpus; the distance itself is a three-dot-product
    * column expression per row (codegen, no shuffle). Nothing big ever
    * moves: two tiny broadcast joins bracket one narrow map.
    *
    * Determinism contract (the q132 oracle checks this bit-for-bit):
    * centroid coordinates and distances round to 6 decimals, and the
    * flag compares the ROUNDED distance against the ROUNDED
    * `mean + sigmas·stddev` threshold — decimal rounding absorbs the
    * ~1e-15 summation-order drift `avg`/`stddev` carry on any engine.
    */
  def labelOutliers(df: DataFrame, vecCol: String, idCol: String,
      labelCol: String, sigmas: Double = 2.0): DataFrame = {
    val cents = df.select(col(labelCol).as("__lbl"), posexplode(col(vecCol)))
      .groupBy(col("__lbl"), col("pos"))
      .agg(round(avg(col("col").cast("double")), 6).as("m"))
      .groupBy(col("__lbl"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("__centroid"))
    val dists = df
      .join(broadcast(cents), col(labelCol) === col("__lbl"))
      .select(col(idCol), col(labelCol),
        round(sqrt(greatest(
          dot(col(vecCol), col(vecCol))
            - lit(2.0) * dot(col(vecCol), col("__centroid"))
            + dot(col("__centroid"), col("__centroid")), lit(0.0))), 6).as("dist"))
    val stats = dists.groupBy(col(labelCol))
      .agg(round(avg(col("dist")) + lit(sigmas) * stddev_samp(col("dist")), 6)
        .as("__thr"))
    dists.join(broadcast(stats), Seq(labelCol))
      .select(col(idCol), col(labelCol), col("dist"),
        (col("dist") > col("__thr")).as("is_outlier"))
  }

  // --- binary (1-bit) quantization: the Hamming sketch tier ----------

  /** Pack a float vector's SIGN BITS into 32-bit lanes (carried as
    * longs) — binary quantization, the most compressed ANN tier beside
    * SQ8 (q81) and PQ (q109): dim·4 float bytes become dim/8 sketch
    * bytes (32× at dim 64), and distance becomes XOR + popcount over
    * two machine words instead of dim float multiplies.
    *
    * Lane layout: lane `w` covers positions `w*32 .. w*32+31`, earlier
    * position = higher bit (MSB-first fold `acc*2 + bit`). 32-bit lanes
    * in long arithmetic keep the fold overflow-free under ANSI mode;
    * popcount over two half-full words costs the same as one full one.
    * [[packSigns]] is the driver-side mirror for query vectors — the
    * layout is a contract between the two.
    *
    * Sign test is `> 0` (zeros pack as 0), matching the LSH signature
    * convention (reference analog: the sign-bucket discipline of
    * [[lshSignature]] with the identity basis instead of random planes).
    */
  def binarySketch(vec: Column): Column = {
    val lastLane = greatest(floor((size(vec) - 1) / lit(32)), lit(0)).cast("int")
    transform(sequence(lit(0), lastLane),
      w => aggregate(sequence(w * 32, w * 32 + 31), lit(0L),
        // `get` is 0-based and null past the end (never throws under
        // ANSI); a missing tail position packs as 0, same as the
        // driver-side padTo
        (acc, p) => acc * 2 + when(get(vec, p) > 0, 1L).otherwise(0L)))
  }

  /** Driver-side [[binarySketch]] of a query vector (same lane layout:
    * the tail lane zero-pads to 32 bits, matching the column fold).
    */
  def packSigns(v: Seq[Double]): Seq[Long] =
    if (v.isEmpty) Seq(0L)
    else v.padTo(((v.size + 31) / 32) * 32, 0.0).grouped(32)
      .map(_.foldLeft(0L)((acc, x) => acc * 2 + (if (x > 0) 1L else 0L))).toSeq

  /** Hamming distance between a sketch column and a packed query. */
  def hammingDistance(sketch: Column, querySketch: Seq[Long]): Column =
    aggregate(
      zip_with(sketch, typedLit(querySketch),
        (a, b) => bit_count(a.bitwiseXOR(b)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Binary-sketch ANN: rank the corpus by sign-sketch Hamming distance
    * to the query, take the `candidates` closest (ties on id), then
    * rescore those EXACTLY by full-precision cosine and return the top
    * `k` by (cosine desc, id). Both stages are deterministic, so the
    * whole contract is restatable in SQL — the approximation lives in
    * which vectors reach the rescore, never in how survivors rank.
    *
    * Scale shape: the sketch is a per-row codegen-friendly fold over
    * the vector (computed once here; a deployment persists it as an
    * 8-byte sidecar column and this scan reads ONLY that column), the
    * candidate cut is one TakeOrdered (no shuffle of vectors), and the
    * rescore touches `candidates` rows. Like the flat PQ tier (q109)
    * the sketch scan is deliberately unpartitioned — composing it with
    * the IVF cell store (the binary-IVF configuration) is the same
    * move [[ivfPqTopK]] makes for codes.
    */
  def hammingTopK(df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Double], k: Int, candidates: Int): DataFrame = {
    require(k > 0 && candidates >= k, "need candidates >= k > 0")
    val qs = packSigns(query)
    val cand = df.select(col(idCol).as("id"), col(vecCol).as("__v"),
        hammingDistance(binarySketch(col(vecCol)), qs).as("hamming"))
      .orderBy(col("hamming").asc, col("id").asc)
      .limit(candidates)
    cand.select(col("id"), col("hamming"),
        round(cosine(col("__v"), vecLit(query)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id").asc)
      .limit(k)
  }

  // --- written-artifact ANN stores: the at-scale probe path ----------
  //
  // The filter-scan probes below (annTopK / ivfTopK over an in-session
  // frame) are correct at any scale but read the whole vector table. At
  // 100 TB the store IS the index: the bucketed/clustered assignment is
  // written ONCE as parquet partitioned by (table, bucket) /
  // ivf_cluster, and every probe becomes a partition-pruned read of the
  // few directories holding its candidates (the plan shows the buckets
  // under PartitionFilters — nothing else is listed, opened, or read).

  /** Root for materialized ANN stores; override via env for tests. */
  def storeRoot: String = graft.model.StorePaths.root

  private def storeKey(sfDir: String): String = graft.model.StorePaths.key(sfDir)

  def lshStorePath(sfDir: String, nBits: Int, nTables: Int, seed: Long): String =
    s"$storeRoot/${storeKey(sfDir)}/lsh_b${nBits}_t${nTables}_s$seed"

  def ivfStorePath(sfDir: String, k: Int, iterations: Int): String =
    s"$storeRoot/${storeKey(sfDir)}/ivf_k${k}_i$iterations"

  /** Build lock: suites may hit the same store concurrently. */
  private val buildLock = new Object

  private def ready(path: String, marker: String): Boolean =
    new java.io.File(path, marker).exists()

  /** Materialize the multi-table LSH assignment partitioned by
    * (table, bucket) — build-if-absent, idempotent per (data, params)
    * path. One row per (vector, table): vectors fan out nTables×, the
    * price of nTables independent probe views (each probe then reads
    * ONE (table, bucket) directory instead of the corpus).
    */
  def ensureLshStore(df: DataFrame, vecCol: String, idCol: String, sfDir: String,
      dim: Int, nBits: Int, nTables: Int, seed: Long = 42L,
      fpSource: String = null): String = {
    import graft.model.StorePaths
    val path = lshStorePath(sfDir, nBits, nTables, seed)
    // staleness guard: the store is keyed by sfDir, so if the source
    // table's files changed underneath it, rebuild instead of silently
    // serving the old corpus. `fpSource` names the file backing `df`
    // (default: the sfDir embeddings table); a caller whose frame is
    // not file-backed gets the unknown-source rebuild-once contract
    // from StorePaths instead of a silently disabled guard.
    val fp = StorePaths.fingerprint(
      Option(fpSource).getOrElse(s"$sfDir/embeddings.parquet"))
    def current = ready(path, "_SUCCESS") && StorePaths.isCurrent(path, fp)
    if (!current) buildLock.synchronized {
      if (!current) {
        val sigCols = (0 until nTables).map { t =>
          lshSignature(col(vecCol), hyperplanes(dim, nBits, seed + t))
        }
        df.select(col(idCol).as("id"), col(vecCol).as("v"),
            posexplode(array(sigCols: _*)))
          .withColumnsRenamed(Map("pos" -> "table", "col" -> "bucket"))
          .write.partitionBy("table", "bucket").mode("overwrite").parquet(path)
        StorePaths.stamp(path, fp)
      }
    }
    path
  }

  /** ANN top-k over the WRITTEN store ([[ensureLshStore]]): the filter
    * hits only partition columns, so the scan lists and reads just the
    * query's nTables (table, bucket) directories — `PartitionFilters`
    * in the plan, `PushedFilters` not even needed. Result set is
    * identical to [[annTopK]] on the same data (same candidate union,
    * same exact rescoring; ids deduped across tables).
    */
  def annTopKStored(df: DataFrame, vecCol: String, idCol: String, sfDir: String,
      query: Seq[Double], k: Int, nBits: Int = 8, nTables: Int = 1,
      seed: Long = 42L): DataFrame = {
    val path = ensureLshStore(df, vecCol, idCol, sfDir, query.size, nBits, nTables, seed)
    val store = df.sparkSession.read.parquet(path)
    val inMyBuckets = (0 until nTables).map { t =>
      val planes = hyperplanes(query.size, nBits, seed + t)
      col("table") === lit(t) && col("bucket") === lit(querySignature(query, planes))
    }.reduce(_ || _)
    store.filter(inMyBuckets)
      .select(col("id"), round(cosine(col("v"), vecLit(query)), 6).as("cos_sim"))
      .dropDuplicates("id") // a vector can share the query's bucket in several tables
      .orderBy(col("cos_sim").desc, col("id").asc)
      .limit(k)
  }

  /** [[ensureLshStore]] variant that carries filterable METADATA
    * columns inline in the index rows (the production filtered-ANN
    * layout: FAISS/Vespa-style attribute-alongside-vector storage).
    * A predicate-constrained probe then needs ONE scan — partition
    * pruning picks the (table, bucket) dirs and the attribute filter
    * pushes into the parquet row groups — instead of a candidate
    * join back against the base table (which at 100 TB would re-read
    * the corpus the index exists to avoid). Written beside the plain
    * store under a metadata-suffixed key.
    */
  def ensureLshStoreMeta(df: DataFrame, vecCol: String, idCol: String,
      sfDir: String, dim: Int, nBits: Int, nTables: Int,
      metaCols: Seq[String], seed: Long = 42L,
      fpSource: String = null): String = {
    import graft.model.StorePaths
    val path = lshStorePath(sfDir, nBits, nTables, seed) +
      s"_m${metaCols.mkString("-")}"
    // ":full" = the build-contract tag: meta stores hold the FULL
    // source table (the shared-store convention) — stores stamped
    // before that convention (built from a filtered frame) fail the
    // freshness check and rebuild instead of silently serving partial
    // contents
    val fp = StorePaths.fingerprint(
      Option(fpSource).getOrElse(s"$sfDir/embeddings.parquet")) + ":full"
    def current = ready(path, "_SUCCESS") && StorePaths.isCurrent(path, fp)
    if (!current) buildLock.synchronized {
      if (!current) {
        val sigCols = (0 until nTables).map { t =>
          lshSignature(col(vecCol), hyperplanes(dim, nBits, seed + t))
        }
        df.select(col(idCol).as("id") +: col(vecCol).as("v") +:
            metaCols.map(col) :+ posexplode(array(sigCols: _*)): _*)
          .withColumnsRenamed(Map("pos" -> "table", "col" -> "bucket"))
          .write.partitionBy("table", "bucket").mode("overwrite").parquet(path)
        StorePaths.stamp(path, fp)
      }
    }
    path
  }

  /** Metadata-FILTERED ANN top-k over the written store
    * ([[ensureLshStoreMeta]]): same partition-pruned (table, bucket)
    * probe as [[annTopKStored]], with `predicate` applied to the
    * index rows themselves (parquet-pushed attribute filter) before
    * the exact rescore. Selectivity thins each bucket's yield, so
    * filtered deployments run MORE tables/probes for the same k —
    * the multi-table union is the compensation knob, and the recall
    * audit (q125) is the check that the chosen width still clears
    * the floor under the filter.
    */
  def annTopKStoredFiltered(df: DataFrame, vecCol: String, idCol: String,
      sfDir: String, query: Seq[Double], k: Int, predicate: Column,
      metaCols: Seq[String], nBits: Int = 8, nTables: Int = 1,
      seed: Long = 42L): DataFrame = {
    val path = ensureLshStoreMeta(df, vecCol, idCol, sfDir, query.size,
      nBits, nTables, metaCols, seed)
    val store = df.sparkSession.read.parquet(path)
    val inMyBuckets = (0 until nTables).map { t =>
      val planes = hyperplanes(query.size, nBits, seed + t)
      col("table") === lit(t) && col("bucket") === lit(querySignature(query, planes))
    }.reduce(_ || _)
    store.filter(inMyBuckets && predicate)
      .select(col("id"), round(cosine(col("v"), vecLit(query)), 6).as("cos_sim"))
      .dropDuplicates("id")
      .orderBy(col("cos_sim").desc, col("id").asc)
      .limit(k)
  }

  def dedupSigStorePath(sfDir: String, nBits: Int, nTables: Int, seed: Long): String =
    s"$storeRoot/${storeKey(sfDir)}/dedupsig_b${nBits}_t${nTables}_s$seed"

  /** Materialize the multi-table LSH signatures for WHOLE-CORPUS dedup
    * consumers ([[semanticDedup]] / [[cosineNearDups]] `prebuilt`):
    * narrow (id, table, bucket) rows written FLAT. The layout differs
    * from [[ensureLshStore]] deliberately — a dedup pass reads EVERY
    * bucket of every table, so (table, bucket) partitioning buys no
    * pruning and costs one directory per bucket (≈ nTables·2^nBits tiny
    * dirs whose listing dominated the q108 probe), and carrying the
    * vectors would store each one nTables×; point probes keep using the
    * partitioned, vector-carrying store.
    */
  def ensureDedupSigStore(df: DataFrame, vecCol: String, idCol: String,
      sfDir: String, dim: Int, nBits: Int, nTables: Int, seed: Long = 42L,
      fpSource: String = null): String = {
    import graft.model.StorePaths
    val path = dedupSigStorePath(sfDir, nBits, nTables, seed)
    val fp = StorePaths.fingerprint(
      Option(fpSource).getOrElse(s"$sfDir/embeddings.parquet"))
    def current = ready(path, "_SUCCESS") && StorePaths.isCurrent(path, fp)
    if (!current) buildLock.synchronized {
      if (!current) {
        val sigCols = (0 until nTables).map { t =>
          lshSignature(col(vecCol), hyperplanes(dim, nBits, seed + t))
        }
        df.select(col(idCol).as("id"), posexplode(array(sigCols: _*)))
          .withColumnsRenamed(Map("pos" -> "table", "col" -> "bucket"))
          .write.mode("overwrite").parquet(path)
        StorePaths.stamp(path, fp)
      }
    }
    path
  }

  private def centroidsFile(path: String) = new java.io.File(path, "_centroids.txt")

  private def writeCentroids(path: String, centroids: Seq[Seq[Double]]): Unit = {
    val text = centroids.map(_.map(java.lang.Double.toString).mkString(","))
      .mkString("\n")
    java.nio.file.Files.write(centroidsFile(path).toPath,
      text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private def readCentroids(path: String): Seq[Seq[Double]] =
    new String(java.nio.file.Files.readAllBytes(centroidsFile(path).toPath),
      java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").toSeq.map(_.split(",").toSeq.map(java.lang.Double.parseDouble))

  /** Materialize the IVF assignment partitioned by `ivf_cluster`, with
    * the trained centroids stored beside it (Double.toString roundtrips
    * exactly, so a re-opened store probes with the same centroids it
    * was built with). Build-if-absent; training runs only on build.
    */
  def ensureIvfStore(df: DataFrame, normCol: String, rescoreCol: String,
      idCol: String, sfDir: String, k: Int, iterations: Int,
      fpSource: String = null): (DataFrame, Seq[Seq[Double]]) = {
    import graft.model.StorePaths
    val path = ivfStorePath(sfDir, k, iterations)
    // see ensureLshStore: fpSource names the file backing `df`
    val fp = StorePaths.fingerprint(
      Option(fpSource).getOrElse(s"$sfDir/embeddings.parquet"))
    def current = centroidsFile(path).exists() && StorePaths.isCurrent(path, fp)
    if (!current) buildLock.synchronized {
      if (!current) {
        // materialize the (typically expression-defined) norm column
        // once: HOF lambdas re-evaluate operand expressions per
        // element, so an inlined l2normalize would cost O(d²)
        // interpreted ops per row per training pass (the quantizeInt8
        // barrier pattern; at corpus scale the staged frame is also
        // what bounds the train's repeated scans)
        val staged = df.localCheckpoint(eager = true)
        val centroids = ivfTrain(staged, normCol, idCol, k, iterations)
        ivfAssign(staged, normCol, centroids).drop(normCol)
          .write.partitionBy("ivf_cluster").mode("overwrite").parquet(path)
        writeCentroids(path, centroids)
        StorePaths.stamp(path, fp)
      }
    }
    (df.sparkSession.read.parquet(path), readCentroids(path))
  }

  // --- IVF-PQ: the composed at-scale ANN configuration ---------------
  //
  // PQ alone (q109) ADC-scans EVERY code; IVF alone (q67) reads raw
  // vectors from the probed cells. Composing them — codes partitioned
  // by coarse cell — prunes the compressed scan to the probed cells:
  // the FAISS IVF-PQ shape, and what a 100 TB deployment actually
  // runs. Encoding choice, stated: codes quantize the RAW (cosine-
  // space) subvectors with ONE GLOBAL codebook set, NOT per-cell
  // residuals — the ADC table is then computed once per query
  // regardless of how many cells are probed, at a known small accuracy
  // cost vs residual encoding (the exact-rescore tail absorbs it; the
  // audit row q112 pins recall).

  private[graft] def codebooksText(cbs: Seq[Seq[Seq[Double]]]): String =
    cbs.map(_.map(_.map(java.lang.Double.toString).mkString(","))
      .mkString(";")).mkString("\n")

  private[graft] def parseCodebooks(text: String): Seq[Seq[Seq[Double]]] =
    text.split("\n").toSeq.map(_.split(";").toSeq.map(
      _.split(",").toSeq.map(java.lang.Double.parseDouble)))

  def ivfPqStorePath(sfDir: String, k: Int, m: Int, ksub: Int, iterations: Int): String =
    s"$storeRoot/${storeKey(sfDir)}/ivfpq_k${k}_m${m}_x${ksub}_i$iterations"

  /** Materialize the IVF-PQ store: (id, ivf_cluster, codes) partitioned
    * by `ivf_cluster`, with the coarse centroids AND the PQ codebooks
    * persisted beside it. Both quantizers train on the L2-normalized
    * vectors (cosine metric, the q67/q109 convention); rows encode via
    * [[ivfAssignCosine]] + [[pqEncodeCosine]] straight from the raw
    * column. Build-if-absent with the shared fingerprint discipline.
    */
  def ensureIvfPqStore(df: DataFrame, vecCol: String, idCol: String,
      sfDir: String, k: Int, m: Int, ksub: Int = 16, iterations: Int = 2,
      fpSource: String = null): (DataFrame, Seq[Seq[Double]], Seq[Seq[Seq[Double]]]) =
    buildIvfPqStore(df, vecCol, idCol, sfDir, k, m, Nil, ksub, iterations, fpSource)

  /** Shared build core for the plain and metadata-carrying IVF-PQ
    * stores — ONE copy of the train/encode/publish discipline so the
    * two variants can never fork behavior; metaCols = Nil is the plain
    * store (no path suffix, code rows carry only id/cell/codes).
    */
  private def buildIvfPqStore(df: DataFrame, vecCol: String, idCol: String,
      sfDir: String, k: Int, m: Int, metaCols: Seq[String], ksub: Int,
      iterations: Int, fpSource: String)
      : (DataFrame, Seq[Seq[Double]], Seq[Seq[Seq[Double]]]) = {
    import graft.model.StorePaths
    val path = ivfPqStorePath(sfDir, k, m, ksub, iterations) +
      (if (metaCols.isEmpty) "" else s"_m${metaCols.mkString("-")}")
    // meta stores carry the ":full" build-contract tag (see
    // ensureLshStoreMeta) so pre-convention stores rebuild rather
    // than silently serving contents missing rows
    val fp = StorePaths.fingerprint(
      Option(fpSource).getOrElse(s"$sfDir/embeddings.parquet")) +
      (if (metaCols.isEmpty) "" else ":full")
    val cbFile = new java.io.File(path, "_codebooks.txt")
    def current = centroidsFile(path).exists() && cbFile.exists() &&
      StorePaths.isCurrent(path, fp)
    if (!current) buildLock.synchronized {
      if (!current) {
        // stage the normalized column once for BOTH trainings (see
        // ensureIvfStore: lazy l2normalize re-evaluates per reference)
        val staged = df.select(col(idCol).as("id") +: col(vecCol).as("v") +:
            l2normalize(col(vecCol)).as("__nv") +: metaCols.map(col): _*)
          .localCheckpoint(eager = true)
        val cs = ivfTrain(staged, "__nv", "id", k, iterations)
        val cbs = pqTrain(staged, "__nv", "id", m, ksub, iterations)
        pqEncodeCosine(
            ivfAssignCosine(staged.drop("__nv"), "v", cs),
            "id", "v", cbs, extra = "ivf_cluster" +: metaCols)
          .write.partitionBy("ivf_cluster").mode("overwrite").parquet(path)
        writeCentroids(path, cs)
        java.nio.file.Files.write(cbFile.toPath,
          codebooksText(cbs).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        StorePaths.stamp(path, fp)
      }
    }
    (df.sparkSession.read.parquet(path), readCentroids(path),
      parseCodebooks(new String(java.nio.file.Files.readAllBytes(cbFile.toPath),
        java.nio.charset.StandardCharsets.UTF_8)))
  }

  /** IVF-PQ ANN top-k over the WRITTEN store: probe the nProbe nearest
    * cells — the codes scan is PARTITION-PRUNED to them (the plan's
    * PartitionFilters, pinned by PqSpec) — ADC-rank the pruned codes
    * against the normalized query, exact-rescore the best `candidates`
    * against the full vectors. Returns (id, cos_sim) like [[ivfTopK]].
    */
  def ivfPqTopK(df: DataFrame, vecCol: String, idCol: String, sfDir: String,
      query: Seq[Double], kTop: Int, k: Int, m: Int, ksub: Int = 16,
      iterations: Int = 2, nProbe: Int = 2, candidates: Int = 100): DataFrame = {
    val (codes, cs, cbs) = ensureIvfPqStore(df, vecCol, idCol, sfDir, k, m,
      ksub, iterations)
    val norm = math.sqrt(query.map(x => x * x).sum)
    val nq = if (norm == 0) query else query.map(_ / norm)
    val probes = cs.zipWithIndex
      .map { case (c, i) => (c.zip(nq).map { case (a, b) => (a - b) * (a - b) }.sum, i) }
      .sortBy(_._1).take(nProbe).map(_._2)
    val cand = adcScan(
        codes.filter(col("ivf_cluster").isin(probes: _*)).select("id", "codes"),
        cbs, nq)
      .orderBy(col("adc_dist").asc, col("id").asc)
      .limit(candidates).select("id")
    df.select(col(idCol).as("id"), col(vecCol).as("__v"))
      .join(cand, Seq("id"))
      .select(col("id"), round(cosine(col("__v"), vecLit(query)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id").asc)
      .limit(kTop)
  }

  /** [[ensureIvfPqStore]] variant carrying filterable METADATA columns
    * inline in the code rows (the [[ensureLshStoreMeta]] layout applied
    * to the COMPOSED at-scale store): (id, ivf_cluster, metaCols...,
    * codes) partitioned by coarse cell. A predicate-constrained probe
    * then reads the probed cells ONCE — PartitionFilters pick the cell
    * dirs, the attribute filter pushes into the parquet row groups —
    * and never joins candidates back against the base table to learn
    * their attributes. Written beside the plain store under a
    * metadata-suffixed key; same quantizer training + fingerprint
    * discipline.
    */
  def ensureIvfPqStoreMeta(df: DataFrame, vecCol: String, idCol: String,
      sfDir: String, k: Int, m: Int, metaCols: Seq[String], ksub: Int = 16,
      iterations: Int = 2, fpSource: String = null)
      : (DataFrame, Seq[Seq[Double]], Seq[Seq[Seq[Double]]]) = {
    require(metaCols.nonEmpty, "metaCols must name at least one attribute")
    buildIvfPqStore(df, vecCol, idCol, sfDir, k, m, metaCols, ksub, iterations,
      fpSource)
  }

  /** Metadata-FILTERED IVF-PQ ANN top-k over the written composed store
    * ([[ensureIvfPqStoreMeta]]) — "vector search WHERE label = x" on
    * the store a 100 TB deployment actually runs. `predicate` applies
    * to the probed cells' code rows BEFORE ADC ranking (parquet-pushed
    * attribute filter beside the cell PartitionFilters, one scan), so
    * every ADC candidate already satisfies the filter and the exact
    * rescore never wastes a slot on a row the filter would discard.
    *
    * `nProbe` widening: selectivity thins each cell's yield, so
    * filtered deployments probe MORE cells for the same k. The default
    * (`nProbe = 0`) DERIVES the width from the store's actual filtered
    * yield instead of a hand-tuned constant: starting from the
    * unfiltered baseline width (k/2, the q112 configuration), the
    * probed set doubles until the cells' MEASURED eligible-row count
    * covers the candidate budget or every cell is probed. Each
    * measurement is a count over exactly the pruned+pushed scan the
    * final probe reads (so at 100 TB it touches only probed cell dirs,
    * and the widening loop is 1–2 cheap pruned counts, not a corpus
    * scan), and it adapts to the TRUE local selectivity — a label rare
    * globally but dense near the query widens less, the reverse case
    * widens more. Two constraints compose: cell COVERAGE never drops
    * below the unfiltered baseline (the true neighbors' cells must be
    * probed regardless of yield), and eligible YIELD must fill the
    * candidate budget (ADC ranking needs real rows to rank). The
    * recall audit over the FILTERED ground truth (PqSpec sweeps
    * selectivity ≈1 / ≈0.1 / ≈0.01) is the check that the derived
    * width clears the floor. An explicit `nProbe > 0` overrides.
    */
  def ivfPqTopKFiltered(df: DataFrame, vecCol: String, idCol: String,
      sfDir: String, query: Seq[Double], kTop: Int, k: Int, m: Int,
      predicate: Column, metaCols: Seq[String], ksub: Int = 16,
      iterations: Int = 2, nProbe: Int = 0, candidates: Int = 100): DataFrame = {
    val (codes, cs, cbs) = ensureIvfPqStoreMeta(df, vecCol, idCol, sfDir, k, m,
      metaCols, ksub, iterations)
    val norm = math.sqrt(query.map(x => x * x).sum)
    val nq = if (norm == 0) query else query.map(_ / norm)
    val ranked = cs.zipWithIndex
      .map { case (c, i) => (c.zip(nq).map { case (a, b) => (a - b) * (a - b) }.sum, i) }
      .sortBy(_._1).map(_._2)
    val probes =
      if (nProbe > 0) ranked.take(nProbe)
      else {
        val baseline = math.max(2, k / 2) // the unfiltered q112 width
        def eligible(sel: Seq[Int]): Long =
          codes.filter(col("ivf_cluster").isin(sel: _*) && predicate).count()
        var p = baseline
        while (p < cs.size && eligible(ranked.take(p)) < candidates)
          p = math.min(cs.size, p * 2)
        ranked.take(p)
      }
    val cand = adcScan(
        codes.filter(col("ivf_cluster").isin(probes: _*) && predicate)
          .select("id", "codes"),
        cbs, nq)
      .orderBy(col("adc_dist").asc, col("id").asc)
      .limit(candidates).select("id")
    df.select(col(idCol).as("id"), col(vecCol).as("__v"))
      .join(cand, Seq("id"))
      .select(col("id"), round(cosine(col("__v"), vecLit(query)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id").asc)
      .limit(kTop)
  }

  /** Query-side LSH signature under the given hyperplanes. */
  private[graft] def querySignature(query: Seq[Double], planes: Seq[Seq[Double]]): Long =
    planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (x, y) => x * y }.sum
      if (d > 0) 1L << i else 0L
    }.sum

  /** ANN top-k: exact rescoring restricted to the query's LSH
    * bucket(s). `nTables` independent hyperplane tables trade scan
    * width for recall (the classic multi-table LSH scheme): a vector is
    * a candidate if it shares the query's bucket in ANY table, so
    * per-neighbor miss probability drops exponentially in nTables while
    * the scanned fraction grows only additively. At scale, write one
    * bucket column per table and the probe is nTables partition-pruned
    * reads instead of this filter scan.
    */
  def annTopK(df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Double], k: Int, nBits: Int = 8, seed: Long = 42L,
      nTables: Int = 1): DataFrame = {
    val isCandidate = (0 until nTables).map { t =>
      val planes = hyperplanes(query.size, nBits, seed + t)
      lshSignature(col(vecCol), planes) === lit(querySignature(query, planes))
    }.reduce(_ || _)
    df.filter(isCandidate)
      .select(col(idCol).as("id"),
        round(cosine(col(vecCol), vecLit(query)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id").asc)
      .limit(k)
  }

  // --- product quantization (PQ/ADC): the compressed-domain scan tier.
  //
  // SQ8 (quantizeInt8) compresses 4×; PQ compresses dim·4 bytes to m
  // bytes (32× at dim=64, m=8) by snapping each of m subvectors to one
  // of ksub codebook centroids. The probe never decodes: ADC
  // (asymmetric distance computation) keeps the QUERY exact and sums
  // per-subspace precomputed distances to each row's centroids — a
  // narrow codegen pass over the codes column in which the vectors are
  // never read. At 100 TB of embeddings that is the difference between
  // scanning 100 TB of floats and ~3 TB of codes; the top ADC
  // candidates then rescore exactly against the full vectors (an
  // id-keyed join touching `candidates` rows, not the corpus).

  /** Per-subspace PQ codebooks via the same deterministic k-means-lite
    * as [[ivfTrain]], trained on each subvector slice. Returns m
    * codebooks of ksub centroids each (m × ksub × dim/m).
    */
  def pqTrain(df: DataFrame, vecCol: String, idCol: String, m: Int,
      ksub: Int = 16, iterations: Int = 3): Seq[Seq[Seq[Double]]] = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    require(m > 0 && dim % m == 0, s"dim $dim must split into m=$m subspaces")
    val dsub = dim / m
    (0 until m).map { s =>
      val sub = df.select(col(idCol),
        slice(col(vecCol), s * dsub + 1, dsub).as("__sub"))
      ivfTrain(sub, "__sub", idCol, ksub, iterations)
    }
  }

  /** Encode vectors to m codebook indices (`codes: array<int>`) — the
    * compressed store representation. Same argmin form as [[ivfAssign]]
    * per subspace; one narrow pass, codebooks travel as typed literals.
    */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    val dsub = codebooks.head.head.size
    val codeCols = codebooks.zipWithIndex.map { case (cb, s) =>
      val sub = slice(col(vecCol), s * dsub + 1, dsub)
      val dists = zip_with(typedLit(cb), centroidMeta(cb),
        (c, mm) => struct(
          (mm.getField("_1") - lit(2.0) * dot(sub, c)).as("d"),
          mm.getField("_2").as("i")))
      array_min(dists).getField("i")
    }
    df.select(col(idCol).as("id"), array(codeCols: _*).as("codes"))
  }

  /** PQ-encode RAW vectors in COSINE space: per subspace, the codeword
    * argmin over the L2-NORMALIZED vector — computed WITHOUT
    * materializing a normalized column, by dividing each subspace dot
    * by the full-vector norm (the [[ivfAssignCosine]] trick applied per
    * subspace: ‖c‖² − 2·(v_s·c)/‖v‖ ranks codewords exactly as the
    * normalized subvector would). One narrow pass from the raw column,
    * so commit hooks and store builds share one encode with no staged
    * intermediate. Zero vectors keep the l2normalize pass-through
    * convention. `extra` columns (e.g. a precomputed `ivf_cluster`)
    * ride along into the output.
    */
  def pqEncodeCosine(df: DataFrame, idCol: String, vecCol: String,
      codebooks: Seq[Seq[Seq[Double]]], extra: Seq[String] = Nil): DataFrame = {
    val dsub = codebooks.head.head.size
    val nrm = l2norm(col(vecCol))
    val codeCols = codebooks.zipWithIndex.map { case (cb, s) =>
      val sub = slice(col(vecCol), s * dsub + 1, dsub)
      val dists = zip_with(typedLit(cb), centroidMeta(cb),
        (c, mm) => struct(
          (mm.getField("_1") - lit(2.0) *
            when(nrm === 0, dot(sub, c)).otherwise(dot(sub, c) / nrm)).as("d"),
          mm.getField("_2").as("i")))
      array_min(dists).getField("i")
    }
    df.select(col(idCol).as("id") +: extra.map(col) :+
      array(codeCols: _*).as("codes"): _*)
  }

  /** ADC scan: append the approximate squared distance from `query` to
    * every encoded row. The m×ksub distance table is driver-computed
    * and travels as ONE typed literal; the per-row work is m array
    * lookups + a sum, inside codegen.
    */
  def adcScan(codes: DataFrame, codebooks: Seq[Seq[Seq[Double]]],
      query: Seq[Double]): DataFrame = {
    val dsub = codebooks.head.head.size
    require(query.size == codebooks.size * dsub,
      s"query dim ${query.size} != ${codebooks.size}×$dsub")
    val table: Seq[Seq[Double]] = codebooks.zipWithIndex.map { case (cb, s) =>
      val qs = query.slice(s * dsub, (s + 1) * dsub)
      cb.map(c => c.zip(qs).map { case (a, b) => (a - b) * (a - b) }.sum)
    }
    codes.withColumn("adc_dist",
      aggregate(
        zip_with(typedLit(table), col("codes"), (t, cd) => element_at(t, cd + 1)),
        lit(0.0), (acc, v) => acc + v))
  }

  /** PQ ANN top-k with exact rescore: ADC-rank the code store, take the
    * `candidates` best, join their ids back to the vector table, exact
    * cosine on the survivors. `adcQuery` lets probe selection run in a
    * different space than rescoring (pass the NORMALIZED query when the
    * codes were trained on normalized vectors — the q67 convention).
    */
  def pqTopK(df: DataFrame, vecCol: String, idCol: String, codes: DataFrame,
      codebooks: Seq[Seq[Seq[Double]]], query: Seq[Double], k: Int,
      candidates: Int = 100, adcQuery: Option[Seq[Double]] = None): DataFrame = {
    val cand = adcScan(codes, codebooks, adcQuery.getOrElse(query))
      .orderBy(col("adc_dist").asc, col("id").asc)
      .limit(candidates).select("id")
    df.select(col(idCol).as("id"), col(vecCol).as("__v"))
      .join(cand, Seq("id"))
      .select(col("id"), round(cosine(col("__v"), vecLit(query)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id").asc)
      .limit(k)
  }

  /** Semantic deduplication (the SemDeDup shape): collapse groups of
    * embedding-near-duplicate items to one representative each.
    * Candidates come from the bucketed sign-LSH join ([[cosineNearDups]]
    * — never all-pairs), verified pairs become edges, and iterative
    * min-id propagation ([[GraphAnalytics.connectedComponents]]) names
    * each group by its smallest member. Returns one row per input item:
    * (id, rep_id, keep) with keep = (id == rep_id) — the keep-list a
    * curation pass applies before training.
    *
    * Scale shape: identical budget to [[cosineNearDups]] plus the
    * edge-count-bounded component iteration; the join back to the full
    * id set is id-only.
    *
    * The signature width is OCCUPANCY-BOUNDED by default (nBits = 0 →
    * [[autoSignatureBits]]): a fixed width makes the in-bucket
    * candidate join quadratic in corpus density (×8 data → ×64 pairs
    * — measured, not hypothetical: the ×8 ScaleCheck at fixed 4 bits
    * runs minutes, auto-sized it holds the data ratio). Widening with
    * corpus size keeps expected bucket occupancy ~constant so candidate
    * volume stays LINEAR. Safe at semantic-dedup thresholds: near-
    * identical vectors (cos ≥ 0.999, θ ≤ 2.6°) flip any given sign bit
    * with p ≤ θ/π ≈ 0.8%, so even at 16 bits a true pair shares its
    * full signature in one of 8 tables with miss probability < 1e-5.
    * MODERATE thresholds (0.9) need narrower signatures for recall —
    * that regime is [[cosineNearDups]]'s documented default, not this
    * operator's.
    *
    * Steady-state pipelines pass `buckets` (the written signature
    * store's rows — [[ensureDedupSigStore]]) and `knownCount` (a cached
    * corpus size): signatures are then read, not recomputed, and the
    * only per-run Spark work is the bucket join + verify + component
    * propagation.
    */
  /** The occupancy-bounded signature width for a corpus of n vectors:
    * `max(4, ceil(log2(n / 2)))` — expected bucket occupancy ~2 per
    * table, so candidate volume stays linear in n. r16 tightened the
    * target from ~16 (measured at sf0.1: occupancy 16 yielded 144k
    * candidate pairs for 5.1k vectors — 28 verifies per vector where
    * true near-dup families average ~1 — and the bucket self-join +
    * verify dominated q108/q116). Recall stays astronomically safe for
    * the near-identical regime these callers (semanticDedup,
    * nnTopKJoin at 0.999) operate in: a cos ≥ 0.999 pair flips any
    * sign bit w.p. ≤ 1.5%, so even b=16 across 8 independent tables
    * misses with p < 1e-5 — and exactly-scaled copies share every
    * signature by construction (recall 1 on planted structure). The
    * exhaustive O(n²) oracles of q108/q116 re-certify recall AND
    * precision at every run.
    */
  /** r17 (ADVICE): the width is additionally RECALL-CAPPED by the
    * caller's threshold. Occupancy sizing assumed the near-identical
    * regime (cos ≥ 0.999); a caller at the service tier's accepted
    * minimum 0.99 inherits a ~1.3% true-pair miss at n = 10⁶ from the
    * 3 extra occupancy bits. The cap is the widest signature whose
    * `nTables`-table miss probability stays ≤ 10⁻⁴ at the caller's
    * threshold (sign-LSH: a ≥ threshold pair flips a given bit w.p.
    * arccos(threshold)/π): solve (1−(1−p)^b)^T ≤ 10⁻⁴ for b. At 0.999
    * the cap is 26 — above every occupancy width the catalog reaches,
    * so existing callers' widths (and their written signature stores)
    * are unchanged; at 0.99 the cap is 8, trading candidate volume for
    * the recall the threshold demands.
    */
  def autoSignatureBits(n: Long, threshold: Double = 0.999,
      nTables: Int = 8): Int = {
    val occupancy =
      math.max(4, (math.log(math.max(n / 2.0, 1.0)) / math.log(2.0)).ceil.toInt)
    val p = math.acos(math.max(-1.0, math.min(threshold, 1.0))) / math.Pi
    if (p <= 0) occupancy
    else {
      val cap = math.max(4,
        (math.log(1.0 - math.pow(1e-4, 1.0 / nTables)) / math.log1p(-p)).floor.toInt)
      math.min(occupancy, cap)
    }
  }

  /** Near-neighbor GRAPH join: for EVERY vector, its neighbors at
    * cosine ≥ `threshold`, ranked (cos desc, neighbor id) and capped at
    * `k` — the all-vectors analog of a single-query top-k, and the
    * materialization step of SemDeDup-style curation (inspect each
    * document's near-duplicate family), retrieval-eval harnesses, and
    * graph-based label propagation over embeddings.
    *
    * Scale shape: the SAME sign-LSH candidate equi-join as
    * [[cosineNearDups]] (ids-only bucket shuffle, occupancy-bounded
    * signature width, NO cartesian anywhere), then one per-id rank
    * window over the surviving ≥-threshold pairs — output is bounded
    * by k per vector, so the result never exceeds k·n rows no matter
    * how dense a near-dup family is. Returns (id, nn_id, cos_sim, rk).
    */
  def nnTopKJoin(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, k: Int, nBits: Int = 0, nTables: Int = 8,
      seed: Long = 42L, buckets: Option[DataFrame] = None,
      knownCount: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, "k must be positive")
    val bits =
      if (nBits > 0) nBits
      else autoSignatureBits(knownCount.getOrElse(df.count()), threshold, nTables)
    val pairs = cosineNearDups(df, idCol, vecCol, threshold, bits, nTables,
      seed, prebuilt = buckets)
    val directed = pairs
      .select(col("id_a").as("id"), col("id_b").as("nn_id"), col("cos_sim"))
      .unionByName(pairs
        .select(col("id_b").as("id"), col("id_a").as("nn_id"), col("cos_sim")))
    directed.withColumn("rk", row_number().over(
        Window.partitionBy("id").orderBy(col("cos_sim").desc, col("nn_id")))
        .cast("long"))
      .filter(col("rk") <= k)
  }

  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBits: Int = 0, nTables: Int = 8,
      seed: Long = 42L, buckets: Option[DataFrame] = None,
      knownCount: Option[Long] = None): DataFrame = {
    val bits =
      if (nBits > 0) nBits
      else autoSignatureBits(knownCount.getOrElse(df.count()), threshold, nTables)
    val pairs = cosineNearDups(df, idCol, vecCol, threshold, bits, nTables, seed,
      prebuilt = buckets)
    val comps = GraphAnalytics.connectedComponents(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
      df.select(col(idCol).cast("long").as("id")))
    comps.select(col("id").as(idCol), col("component").as("rep_id"),
      (col("id") === col("component")).as("keep"))
  }

  /** Distributed power iteration — the dominant principal direction of
    * the (uncentered) embedding Gram matrix, computed as the classic
    * `v ← Xᵀ(Xv) / ‖·‖` loop with every step under an integer
    * determinism contract so a SQL oracle replays it bit-for-bit:
    * elements enter as micro-units; the per-row projection
    * `s = (x·v) div 10⁶` and the back-projection `w = Σ x·s` are exact
    * int64 (envelope: ~10⁷ unit-norm rows); w then rescales by the
    * DATA-ADAPTIVE exact divisor `qdiv = max(1, max|w| div 10⁸)` — a
    * fixed divisor either overflows the Σwq² of a huge corpus or
    * truncates a small one to zero; the max-scaled contract keeps ~8
    * significant digits at every size and is itself exact integer
    * arithmetic, so the oracle replays it. The normalizer √Σwq² is one
    * correctly-rounded IEEE sqrt on an exact integer sum, and the sign
    * canonicalizes to the first nonzero component positive
    * (eigenvectors are sign-ambiguous — the contract pins one). The
    * public ABTT embedding-postprocessing recipe starts exactly here.
    *
    * Returns the eigenvector in micro-units (‖v‖ ≈ 10⁶).
    *
    * Scale shape: per iteration, one row-grain projection aggregation
    * (keyed by the vector id, map-side partials) and one |dims|-key
    * back-projection aggregation; only the |dims|-row w vector ever
    * reaches the driver (the ivfTrain codebook discipline), and v
    * travels back as ONE array literal.
    */
  def powerIteration(df: DataFrame, idCol: String, vecCol: String,
      iterations: Int = 3): Seq[Long] = {
    val dims = df.select(size(col(vecCol))).head().getInt(0)
    val ex = df.select(col(idCol).as("__id"),
        posexplode(col(vecCol)).as(Seq("dim", "__x")))
      .select(col("__id"), col("dim"),
        round(col("__x").cast("double") * 1e6, 0).cast("long").as("x"))
      .localCheckpoint(eager = true)
    powerIterateElements(ex, dims, iterations)
  }

  /** [[powerIteration]]'s core over a pre-built element frame
    * (`__id`, `dim`, `x` micro-units) — shared with the centered ABTT
    * path, same contract throughout.
    */
  private[graft] def powerIterateElements(ex: DataFrame, dims: Int,
      iterations: Int): Seq[Long] = {
    require(iterations >= 1 && iterations <= 10, "iterations must be in [1, 10]")
    var v: Seq[Long] = 1000000L +: Seq.fill(dims - 1)(0L)
    (1 to iterations).foreach { _ =>
      val vLit = array(v.map(lit): _*)
      val s = ex
        .withColumn("__vj", element_at(vLit, col("dim").cast("int") + 1))
        .groupBy("__id").agg(sum(col("x") * col("__vj")).as("__dot"))
        .select(col("__id"), expr("__dot div 1000000").as("s"))
      val w = ex.join(s, Seq("__id"))
        .groupBy("dim").agg(sum(col("x") * col("s")).as("w"))
        .orderBy("dim").collect().map(_.getLong(1)).toSeq
      // driver-side normalization over the |dims|-row vector: exact
      // max-scaled rescale → integer Σwq² (exact) → one IEEE sqrt →
      // per-component HALF_UP round — the exact sequence the oracle
      // restates
      val qdiv = math.max(1L, w.map(math.abs).max / 100000000L)
      val wq = w.map(_ / qdiv)
      val norm = math.sqrt(wq.map(q => q * q).sum.toDouble)
      val raw =
        if (norm == 0) Seq.fill(dims)(0L)
        else wq.map(q => BigDecimal(q * 1e6 / norm)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      val sign = raw.find(_ != 0L).map(x => if (x < 0) -1L else 1L).getOrElse(1L)
      v = raw.map(_ * sign)
    }
    v
  }

  /** Label-centroid similarity matrix — the embedding-space confusion
    * audit: per-label mean vectors (exact integer micro means, the
    * [[labelOutliers]] centroid contract) compared pairwise by cosine.
    * Labels whose centroids sit close are the ones a classifier or a
    * label-filtered ANN probe will blur. All sums exact int64; each
    * cosine is one IEEE divide over two correctly-rounded sqrts,
    * rounded 6. Emits (label_a < label_b, cosine).
    *
    * Scale shape: one (label, dim) aggregation over the corpus
    * (map-side partials), then everything is |labels|²·dims-sized —
    * centroid-grain joins, never corpus-grain.
    */
  def labelCentroidSimilarity(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val ex = df.select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("dim", "__x")))
      .select(col("label"), col("dim"),
        round(col("__x").cast("double") * 1e6, 0).cast("long").as("x"))
    val cent = ex.groupBy("label", "dim")
      .agg(count(lit(1)).as("__n"), sum("x").as("__s"))
      .select(col("label"), col("dim"), expr("__s div __n").as("m"))
    val norms = cent.groupBy("label").agg(sum(col("m") * col("m")).as("__nsq"))
    val dots = cent.select(col("label").as("label_a"), col("dim"), col("m").as("ma"))
      .join(cent.select(col("label").as("label_b"), col("dim"), col("m").as("mb")),
        Seq("dim"))
      .filter(col("label_a") < col("label_b"))
      .groupBy("label_a", "label_b").agg(sum(col("ma") * col("mb")).as("__dot"))
    dots
      .join(norms.select(col("label").as("label_a"), col("__nsq").as("__na")), Seq("label_a"))
      .join(norms.select(col("label").as("label_b"), col("__nsq").as("__nb")), Seq("label_b"))
      .select(col("label_a"), col("label_b"),
        when(col("__na") === 0 || col("__nb") === 0, lit(0.0))
          .otherwise(round(col("__dot").cast("double") /
            (sqrt(col("__na").cast("double")) * sqrt(col("__nb").cast("double"))), 6))
          .as("cosine"))
  }

  /** ABTT embedding postprocessing (Mu & Viswanath 2018, "All But The
    * Top" — the public recipe): center the embedding corpus, find the
    * dominant principal direction of the CENTERED data by
    * [[powerIteration]]'s integer-contracted loop, and subtract each
    * vector's projection onto it — removing the common-direction bias
    * that inflates every cosine similarity. Centering is exact
    * (per-dim `mean = Σx div n` integer micro); the projection
    * coefficient `c = (x_c·v)/‖v‖²` is ONE IEEE divide of exact int64
    * sums, and each corrected component rounds once at 6
    * (`round(x_c − v·c, 6)`, micro-units) — the q135 discipline, so
    * the oracle replays centering, all iteration rounds, and the
    * correction value-for-value.
    *
    * Returns element-grain (id, dim, corrected) — the full corpus;
    * callers clip for dumps.
    *
    * Scale shape: one |dims|-key stats aggregation for the means
    * (broadcast back as ONE literal), the power-iteration rounds (see
    * there), then a row-grain dot-product aggregation + a narrow
    * correction map — nothing shuffles beyond the vector id.
    */
  def abttPostprocess(df: DataFrame, idCol: String, vecCol: String,
      iterations: Int = 3): DataFrame = {
    val dims = df.select(size(col(vecCol))).head().getInt(0)
    val ex = df.select(col(idCol).as("__id"),
        posexplode(col(vecCol)).as(Seq("dim", "__x")))
      .select(col("__id"), col("dim"),
        round(col("__x").cast("double") * 1e6, 0).cast("long").as("x"))
    val means = ex.groupBy("dim")
      .agg(count(lit(1)).as("__n"), sum("x").as("__s"))
      .select(col("dim"), expr("__s div __n").as("__m"))
      .orderBy("dim").collect().map(_.getLong(1)).toSeq
    val mLit = array(means.map(lit): _*)
    val centered = ex
      .withColumn("xc", col("x") - element_at(mLit, col("dim").cast("int") + 1))
      .select(col("__id"), col("dim"), col("xc").as("x"))
      .localCheckpoint(eager = true)
    val v = powerIterateElements(centered, dims, iterations)
    val nsq = v.map(c => c * c).sum
    val vLit = array(v.map(lit): _*)
    val dots = centered
      .withColumn("__vj", element_at(vLit, col("dim").cast("int") + 1))
      .groupBy("__id").agg(sum(col("x") * col("__vj")).as("__dot"))
      .select(col("__id"),
        (if (nsq == 0) lit(0.0)
         else col("__dot").cast("double") / lit(nsq.toDouble)).as("__c"))
    centered.join(dots, Seq("__id"))
      .withColumn("__vj", element_at(vLit, col("dim").cast("int") + 1))
      .select(col("__id").as("id"), col("dim"),
        round(col("x").cast("double") - col("__vj") * col("__c"), 6)
          .as("corrected"))
  }

  /** Per-dimension RANK transform (quantile normalization) — the
    * robust sibling of [[standardizeDims]]: each embedding element maps
    * to its dimension's empirical rank position
    * `(rank − 1)·10⁶ div (n − 1)` — outlier-immune where z-scores are
    * not, and ALL-INTEGER (`rank()` gives ties the same value on any
    * engine, so no tie-break ordering is even needed). A singleton
    * dimension maps to 0.
    *
    * Scale shape: posexplode, then ONE window per dimension — the rank
    * is a per-dim sort, which is the honest cost of quantile
    * normalization (64–4096 independent sorts, each parallelized by
    * Spark's range-partitioned window sort; nothing global).
    */
  def rankTransform(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val ex = df.select(col(idCol),
      posexplode(col(vecCol)).as(Seq("dim", "__v")))
      .select(col(idCol), col("dim").cast("long").as("dim"),
        round(col("__v").cast("double") * 1e6, 0).cast("long").as("v_micro"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("dim").orderBy("v_micro")
    val n = org.apache.spark.sql.expressions.Window.partitionBy("dim")
    ex.withColumn("__r", rank().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(n))
      .select(col(idCol), col("dim"), col("v_micro"),
        when(col("__n") > 1,
          expr("(__r - 1) * 1000000 div (__n - 1)")).otherwise(0L).as("rank_ppm"))
  }

  /** Per-dimension feature standardization (z-scoring) of an embedding
    * column — the preprocessing every clustering / outlier / distance
    * model wants when raw dimensions carry different scales. Values
    * enter as exact integer micro-units (`round(v·10⁶)`), per-dim
    * mean is the truncating integer division both engines share, the
    * deviation sum-of-squares stays int64 (exact through ~10¹⁷ — a
    * 100 TB deployment past that swaps in double partials, losing only
    * oracle-bit-exactness), and the only floating steps are one IEEE
    * sqrt + one divide, rounded to 6 (the q135 discipline). A
    * zero-variance dimension standardizes to 0 by contract.
    *
    * Returns (id, dim, v_micro, z) at element grain.
    *
    * Scale shape: posexplode → ONE per-dim hash aggregation (64–4096
    * keys, map-side partials collapse each partition to |dims| rows,
    * so few keys ≠ few-task bottleneck) → broadcast the |dims|-row
    * stats frame back over the corpus — the apply pass is a narrow
    * map; nothing shuffles at corpus grain.
    */
  def standardizeDims(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val ex = df.select(col(idCol),
      posexplode(col(vecCol)).as(Seq("dim", "__v")))
      .select(col(idCol), col("dim").cast("long").as("dim"),
        round(col("__v").cast("double") * 1e6, 0).cast("long").as("v_micro"))
    val stats = ex.groupBy("dim")
      .agg(count(lit(1)).as("__n"), sum("v_micro").as("__s"),
        sum(col("v_micro") * col("v_micro")).as("__ssq"))
      .select(col("dim"), col("__n"), expr("__s div __n").as("__mean"),
        col("__s"), col("__ssq"))
      .select(col("dim"), col("__mean"),
        when(col("__n") > 1, sqrt(
          (col("__ssq") - lit(2) * col("__mean") * col("__s") +
            col("__n") * col("__mean") * col("__mean")).cast("double") /
            (col("__n") - 1).cast("double")))
          .otherwise(lit(0.0)).as("__std"))
    ex.join(broadcast(stats), Seq("dim"))
      .select(col(idCol), col("dim"), col("v_micro"),
        when(col("__std") > 0,
          round((col("v_micro") - col("__mean")).cast("double") / col("__std"), 6))
          .otherwise(lit(0.0)).as("z"))
  }
}
