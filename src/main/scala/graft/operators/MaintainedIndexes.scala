package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.{Dirs, GraphStore}

/** Write-path maintenance for the pipeline indexes — the dedup
  * signature store and the written ANN bucket store stay fresh across
  * [[GraphStore]] commits, the same in-commit guarantee the views
  * subsystem already gives (Views.bindTo; reference
  * transactions.lisp:601-744 maintains every index inside the
  * transaction's apply phase).
  *
  * Both indexes use the views' delta-log layout: an immutable `base/`
  * materialization plus one tiny `delta/commit_epoch=<e>/` partition
  * per store commit that touched the source label, superseded at id
  * granularity (newest epoch wins, tombstoned ids vanish). `rebuild()`
  * doubles as compaction: it folds all deltas into a fresh base and
  * clears them.
  *
  * Scale design: a commit's delta write touches only the commit's own
  * staged rows — no source rescan, no base rewrite. Reads merge base
  * with the (small) delta log: the signature index via one id-window
  * over the deltas plus a broadcast anti-join on base; the ANN store
  * via a max-epoch tombstone broadcast. At 100 TB this is the LSM
  * discipline every maintained secondary index uses; periodic
  * `rebuild()` bounds the merge cost exactly like view regeneration.
  */
object MaintainedIndexes {

  /** Latest-wins merge of a `(id-keyed base, delta log)` pair where
    * delta rows carry `commit_epoch` and a boolean `__tomb` marker.
    */
  private[operators] def mergeDeltas(base: DataFrame, deltas: DataFrame,
      cols: Seq[String]): DataFrame = {
    val latest = deltas
      .withColumn("__me", max("commit_epoch").over(Window.partitionBy("id")))
      .filter(col("commit_epoch") === col("__me") && !col("__tomb"))
      .select(cols.map(col): _*)
    base.join(deltas.select("id").distinct(), Seq("id"), "left_anti")
      .select(cols.map(col): _*)
      .unionByName(latest)
  }
}

/** Persisted MinHash signature index over a store-held document label,
  * maintained in-commit. `frame()` is a drop-in `sigs` argument for
  * [[Dedup.minhashNearDups]]: a document committed one statement ago
  * is already a dedup candidate — no rebuild, no full re-shingle.
  *
  * (The catalog's session-cache variant — CatalogPipeline.docSignatures
  * — is the unbound case for static file datasets; this is the bound
  * case for mutable stores.)
  */
final class SignatureIndex(gs: GraphStore, label: String, textCol: String,
    storageDir: String, k: Int = 3, numHashes: Int = 24) {

  private val spark = gs.spark
  private val table = gs.tableFor(label)
  private def basePath = Paths.get(storageDir, "sigindex", label, "base")
  private def deltaPath = Paths.get(storageDir, "sigindex", label, "delta")

  /** Full (re)materialization from the store's current state; clears
    * (compacts away) any accumulated deltas.
    */
  def rebuild(): Unit = {
    val docs = gs.graph().vertices(label)
    val tmp = basePath.resolveSibling("base__tmp")
    Dirs.rmTree(tmp)
    Dedup.signatureFrame(docs, "id", textCol, k, numHashes)
      .withColumnRenamed("doc", "id")
      .write.mode("overwrite").parquet(tmp.toString)
    Dirs.rmTree(basePath)
    Files.createDirectories(basePath.getParent)
    Files.move(tmp, basePath, StandardCopyOption.ATOMIC_MOVE)
    Dirs.rmTree(deltaPath)
  }

  /** Wire into the store's write path: every commit touching `label`
    * appends a signature delta for exactly its staged rows.
    */
  def bind(): Unit = gs.onCommit { (epoch, frames) =>
    frames.get(table).foreach { staged =>
      val live = staged.filter(!col("deleted"))
        .select(col("id"), col(textCol))
      val rows = Dedup.signatureFrame(live, "id", textCol, k, numHashes)
        .withColumnRenamed("doc", "id")
        .withColumn("__tomb", lit(false))
      // a tombstone per touched id supersedes its old signature even
      // when the new version contributes no row (delete)
      val tombs = staged.select(col("id")).distinct()
        .withColumn("hsh", lit(null).cast("array<long>"))
        .withColumn("sig", lit(null).cast("array<long>"))
        .withColumn("__tomb", lit(true))
      rows.unionByName(tombs).coalesce(1).write.mode("append")
        .parquet(s"$deltaPath/commit_epoch=$epoch")
    }
  }

  private def hasDeltas: Boolean =
    Dirs.childNames(deltaPath).exists(_.startsWith("commit_epoch="))

  /** The fresh signature frame `(doc, hsh, sig)` — base merged with the
    * delta log, newest epoch per id winning.
    */
  def frame(): DataFrame = {
    require(Files.exists(basePath), s"signature index for $label not built — call rebuild()")
    val base = spark.read.parquet(basePath.toString)
    val merged =
      if (!hasDeltas) base
      else MaintainedIndexes.mergeDeltas(
        base, spark.read.parquet(deltaPath.toString), Seq("id", "hsh", "sig"))
    merged.withColumnRenamed("id", "doc")
  }

  /** Near-duplicate pairs over the CURRENT store state, served from the
    * maintained index (no re-shingle of unchanged documents).
    */
  def nearDups(bands: Int = 8, threshold: Double = 0.5): DataFrame =
    Dedup.minhashNearDups(gs.graph().vertices(label), "id", textCol,
      k, numHashes, bands, threshold, sigs = Some(frame()))
}

/** Commit-maintained LSH ANN store over a store-held embedding label —
  * the written, (table, bucket)-partitioned store of
  * [[Similarity.ensureLshStore]], kept fresh by the write path.
  *
  * Layout: `base/table=<t>/bucket=<b>/` (built by [[rebuild]]) plus
  * `delta/commit_epoch=<e>/table=<t>/bucket=<b>/` per commit and a
  * tiny unpartitioned `tombstones/` log of `(id, commit_epoch)`.
  * Probes stay partition-pruned on BOTH base and delta (the bucket
  * predicate hits only partition columns); supersession is a broadcast
  * join against the max-epoch tombstone per id — an updated vector may
  * move buckets, so its stale row is retired by epoch comparison, not
  * by rewriting the old bucket's files.
  */
final class MaintainedAnnStore(gs: GraphStore, label: String, vecCol: String,
    storageDir: String, dim: Int, nBits: Int = 8, nTables: Int = 2,
    seed: Long = 42L) {

  private val spark = gs.spark
  private val table = gs.tableFor(label)
  private def root = Paths.get(storageDir, "annindex", label)
  private def basePath = root.resolve("base")
  private def deltaPath = root.resolve("delta")
  private def tombPath = root.resolve("tombstones")

  private def bucketed(rows: DataFrame): DataFrame = {
    val sigCols = (0 until nTables).map { t =>
      Similarity.lshSignature(col(vecCol), Similarity.hyperplanes(dim, nBits, seed + t))
    }
    rows.select(col("id"), col(vecCol).as("v"), posexplode(array(sigCols: _*)))
      .withColumnsRenamed(Map("pos" -> "table", "col" -> "bucket"))
  }

  /** Full (re)materialization from the store's current state; clears
    * the delta and tombstone logs (compaction).
    */
  def rebuild(): Unit = {
    val vecs = gs.graph().vertices(label).select(col("id"), col(vecCol))
    val tmp = root.resolve("base__tmp")
    Dirs.rmTree(tmp)
    bucketed(vecs).write.partitionBy("table", "bucket")
      .mode("overwrite").parquet(tmp.toString)
    Dirs.rmTree(basePath)
    Files.createDirectories(root)
    Files.move(tmp, basePath, StandardCopyOption.ATOMIC_MOVE)
    Dirs.rmTree(deltaPath)
    Dirs.rmTree(tombPath)
  }

  /** Wire into the store's write path: a commit touching `label`
    * appends its staged vectors into the partitioned delta log and one
    * tombstone row per touched id.
    */
  def bind(): Unit = gs.onCommit { (epoch, frames) =>
    frames.get(table).foreach { staged =>
      val live = staged.filter(!col("deleted")).select(col("id"), col(vecCol))
      // delete-only commits stage no live rows; an all-empty delta log
      // would defeat parquet schema inference on read, so skip the
      // data write and let the tombstones alone retire the ids
      if (!live.isEmpty)
        bucketed(live).write.partitionBy("table", "bucket")
          .mode("append").parquet(s"$deltaPath/commit_epoch=$epoch")
      staged.select(col("id")).distinct()
        .withColumn("commit_epoch", lit(epoch))
        .coalesce(1).write.mode("append").parquet(tombPath.toString)
    }
  }

  private def hasDeltas: Boolean =
    Dirs.childNames(deltaPath).exists(_.startsWith("commit_epoch="))
  private def hasTombs: Boolean = Files.exists(tombPath)

  /** ANN top-k over the maintained store — the partition-pruned probe
    * of [[Similarity.annTopKStored]] plus the delta/tombstone merge.
    */
  def topK(query: Seq[Double], k: Int): DataFrame = {
    require(Files.exists(basePath), s"ANN store for $label not built — call rebuild()")
    val inMyBuckets = (0 until nTables).map { t =>
      val planes = Similarity.hyperplanes(dim, nBits, seed + t)
      col("table") === lit(t) &&
        col("bucket") === lit(Similarity.querySignature(query, planes))
    }.reduce(_ || _)
    val base = spark.read.parquet(basePath.toString).filter(inMyBuckets)
      .withColumn("__ep", lit(0L))
    val withDelta =
      if (!hasDeltas) base
      else base.unionByName(
        spark.read.parquet(deltaPath.toString).filter(inMyBuckets)
          .withColumn("__ep", col("commit_epoch")).drop("commit_epoch"))
    val cands =
      if (!hasTombs) withDelta
      else {
        val retire = spark.read.parquet(tombPath.toString)
          .groupBy("id").agg(max("commit_epoch").as("__tomb_ep"))
        withDelta.join(broadcast(retire), Seq("id"), "left_outer")
          .filter(col("__tomb_ep").isNull || col("__tomb_ep") <= col("__ep"))
      }
    cands
      .select(col("id"),
        round(Similarity.cosine(col("v"), Similarity.vecLit(query)), 6).as("cos_sim"))
      .dropDuplicates("id")
      .orderBy(col("cos_sim").desc, col("id").asc)
      .limit(k)
  }
}
