package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The written-artifact ANN path: assignments materialized as parquet
  * partitioned by (table, bucket) / ivf_cluster, probes partition-
  * pruned. BENCHNOTES claims this is the 100 TB probe shape — asserted
  * here on the actual physical plans AND on result equality with the
  * in-session filter-scan probes.
  */
class AnnStoreSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private def queryVec: Seq[Double] =
    emb.filter(col("vec_id") === 0).select("embedding").head()
      .getSeq[Float](0).map(_.toDouble).toSeq

  test("LSH store probe: partition-pruned plan, identical to filter-scan probe") {
    val corpus = emb.filter(col("vec_id") =!= 0)
    val q = queryVec
    val stored = Similarity.annTopKStored(corpus, "embedding", "vec_id", sf, q,
      k = 10, nBits = 4, nTables = 8)
    val scan = Similarity.annTopK(corpus, "embedding", "vec_id", q,
      k = 10, nBits = 4, nTables = 8)
    assert(stored.collect().toSeq == scan.collect().toSeq,
      "stored-probe results must equal the filter-scan probe")
    val plan = stored.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), s"no partition filters:\n$plan")
    assert(!plan.contains("PartitionFilters: []"),
      s"partition filter list is EMPTY — probe reads the whole store:\n$plan")
    assert(plan.contains("bucket"), s"bucket not in the partition filter:\n$plan")
  }

  test("filtered LSH probe: partition-pruned AND attribute-pushed, one scan") {
    val corpus = emb.filter(col("vec_id") =!= 0)
    val q = queryVec
    val probe = Similarity.annTopKStoredFiltered(corpus, "embedding", "vec_id",
      sf, q, k = 10, predicate = col("label") === 3, metaCols = Seq("label"),
      nBits = 3, nTables = 16)
    val rows = probe.collect()
    // every result honors the predicate (the index carries the label,
    // so this needed no join back to the base table)
    val ids = rows.map(_.getLong(0)).toSet
    val labeled = corpus.filter(col("label") === 3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(labeled), "a probe result violates the label predicate")
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), s"no partition filters:\n$plan")
    assert(!plan.contains("PartitionFilters: []"),
      s"partition filter list is EMPTY — probe reads the whole store:\n$plan")
    assert(plan.contains("bucket"), s"bucket not in the partition filter:\n$plan")
    // the label predicate reaches the parquet scan as a pushed filter
    assert(plan.contains("PushedFilters: [") && plan.contains("label"),
      s"label predicate did not push into the index scan:\n$plan")
  }

  test("IVF store probe: partition-pruned plan, persisted centroids, exact top-k") {
    val nemb = emb.withColumn("nvec", Similarity.l2normalize(col("embedding")))
    val (assigned, centroids) = Similarity.ensureIvfStore(
      nemb, "nvec", "embedding", "vec_id", sf, k = 8, iterations = 2)
    // the persisted centroids are exactly what training produces
    // (Double.toString/parseDouble roundtrip is exact)
    assert(centroids == Similarity.ivfTrain(nemb, "nvec", "vec_id", k = 8, iterations = 2))
    val qRaw = queryVec
    val norm = math.sqrt(qRaw.map(x => x * x).sum)
    val qN = if (norm == 0) qRaw else qRaw.map(_ / norm)
    val probe = Similarity.ivfTopK(assigned, "embedding", "vec_id", centroids, qRaw,
      k = 10, nProbe = 5, probeVec = Some(qN))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), s"no partition filters:\n$plan")
    assert(!plan.contains("PartitionFilters: []"),
      s"partition filter list is EMPTY — probe reads the whole store:\n$plan")
    assert(plan.contains("ivf_cluster"), s"ivf_cluster not in the partition filter:\n$plan")
    // on this corpus the probed cells hold the full true top-10 (q67's
    // oracle contract), so the stored probe is exact
    val exact = Similarity.bruteForceTopK(emb, "embedding", "vec_id", qRaw, 10)
    assert(probe.collect().toSeq == exact.collect().toSeq)
  }
}
