package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.model.{GraphSchema, GraphStore}
import graft.operators.{Dedup, MaintainedAnnStore, MaintainedIvfStore, SignatureIndex, Similarity}

/** Write-path maintenance for the pipeline indexes: a store-bound
  * signature index / ANN bucket store reflects every commit WITHOUT a
  * rebuild — the same in-commit freshness the views get from
  * ViewCatalog.bindTo (reference transactions.lisp:601-744 maintains
  * all indexes inside the transaction apply phase).
  *
  * Every assertion compares the maintained read against a from-scratch
  * recompute over the store's current graph, so supersession (update
  * moves a doc's signature / a vector's bucket; delete retires it) is
  * checked against ground truth, not against itself.
  */
class MaintainedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(Paths.get("target"), prefix).toString

  private def listBase(dir: String, kind: String, label: String) = {
    // base lives inside the current generation dir (GenDirs)
    val p = graft.model.GenDirs.current(Paths.get(dir, kind, label)).resolve("base")
    Files.list(p).map(_.getFileName.toString).sorted.toArray.toSeq
  }

  test("commit-maintained signature index: create/update/delete without rebuild") {
    val dir = tmp("sigidx")
    val schema = GraphSchema.builder().vertex("doc", "id", Seq("text")).build()
    val gs = new GraphStore(spark, schema, dir)
    val seed = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 100)
      .select(col("doc_id").as("id"), col("text"))
    gs.txn().createVertices("doc", seed).commit()

    val idx = new SignatureIndex(gs, "doc", "text", dir)
    idx.rebuild()
    idx.bind()
    val frozenBase = listBase(dir, "sigindex", "doc")

    def full(): Set[(Long, Long)] =
      Dedup.minhashNearDups(gs.graph().vertices("doc"), "id", "text")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    def maintained(): Set[(Long, Long)] =
      idx.nearDups().select("id_a", "id_b").as[(Long, Long)].collect().toSet

    assert(maintained() == full(), "fresh index must agree with recompute")

    // create: a committed copy of doc 1's text is a near-dup candidate
    // immediately (no rebuild)
    val text1 = seed.filter(col("id") === 1).select("text").head().getString(0)
    gs.txn().createVertices("doc", Seq((9001L, text1)).toDF("id", "text")).commit()
    val afterCreate = maintained()
    assert(afterCreate.contains((1L, 9001L)), "new near-dup pair must appear in-commit")
    assert(afterCreate == full())

    // update: doc 2 rewritten with doc 3's text — its OLD signature is
    // superseded, the new near-dup pair appears
    val text3 = seed.filter(col("id") === 3).select("text").head().getString(0)
    gs.txn().updateVertices("doc", Seq((2L, text3)).toDF("id", "text")).commit()
    val afterUpdate = maintained()
    assert(afterUpdate.contains((2L, 3L)), "updated doc must pair with its new twin")
    assert(afterUpdate == full())

    // delete: the created twin vanishes from the candidate set
    gs.txn().deleteVertices("doc", Seq(9001L).toDF("id")).commit()
    val afterDelete = maintained()
    assert(!afterDelete.exists(p => p._1 == 9001L || p._2 == 9001L))
    assert(afterDelete == full())

    assert(listBase(dir, "sigindex", "doc") == frozenBase,
      "maintenance must append deltas, never rewrite base")
  }

  test("commit-maintained posting index: searchable in-commit, supersession, pruned probe") {
    import graft.operators.{MaintainedPostingIndex, Search, TextAnalysis}
    val dir = tmp("postidx")
    val schema = GraphSchema.builder().vertex("doc", "id", Seq("text")).build()
    val gs = new GraphStore(spark, schema, dir)
    val seed = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 100)
      .select(col("doc_id").as("id"), col("text"))
    gs.txn().createVertices("doc", seed).commit()

    val idx = new MaintainedPostingIndex(gs, "doc", "text", dir)
    idx.rebuild()
    idx.bind()
    val frozenBase = listBase(dir, "postindex", "doc")

    // ground truth: re-tokenize the store's CURRENT docs from scratch
    def direct(terms: Seq[String], k: Int): Seq[(Long, Long, Long)] =
      gs.graph().vertices("doc")
        .select(col("id"), explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
        .filter(col("term").isInCollection(terms))
        .groupBy("id")
        .agg(countDistinct("term").as("n_terms"), count(lit(1)).as("total_tf"))
        .orderBy(col("n_terms").desc, col("total_tf").desc, col("id"))
        .limit(k).as[(Long, Long, Long)].collect().toSeq
    def got(terms: Seq[String], k: Int): Seq[(Long, Long, Long)] =
      idx.search(terms, k).as[(Long, Long, Long)].collect().toSeq
    // BM25 ground truth: the corpus-rescan contract over CURRENT state
    def directBm25(terms: Seq[String], k: Int): Seq[(Long, Long)] =
      Search.bm25TopK(gs.graph().vertices("doc"), "id", "text", terms, k)
        .as[(Long, Long)].collect().toSeq
    def gotBm25(terms: Seq[String], k: Int): Seq[(Long, Long)] =
      idx.bm25(terms, k).as[(Long, Long)].collect().toSeq

    val someTerms = Seq("spark", "merge")
    assert(got(someTerms, 10) == direct(someTerms, 10),
      "fresh index must agree with recompute")
    assert(gotBm25(someTerms, 10) == directBm25(someTerms, 10),
      "maintained BM25 must agree with the corpus-rescan contract")
    // the base probe is partition-pruned to the query terms' buckets
    val plan = idx.search(someTerms, 10).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && !plan.contains("PartitionFilters: []"),
      s"posting probe must prune base partitions:\n$plan")

    // create: a brand-new token is searchable in-commit, no rebuild
    gs.txn().createVertices("doc",
      Seq((9001L, "zebrastripe zebrastripe rare")).toDF("id", "text")).commit()
    assert(got(Seq("zebrastripe"), 5) == Seq((9001L, 1L, 2L)))
    // the positional payload rides the same delta: the committed doc
    // PHRASE-matches in-commit ("zebrastripe zebrastripe" overlaps at
    // one start; "zebrastripe rare" at one)
    assert(idx.phrase(Seq("zebrastripe", "rare"), 5)
      .as[(Long, Long)].collect().toSeq == Seq((9001L, 1L)))
    assert(idx.phrase(Seq("zebrastripe", "zebrastripe"), 5)
      .as[(Long, Long)].collect().toSeq == Seq((9001L, 1L)))
    assert(idx.phrase(Seq("rare", "zebrastripe"), 5).count() == 0,
      "phrase order must matter")
    assert(got(someTerms, 10) == direct(someTerms, 10))
    // the new doc shifts n/avgdl and ranks for its own terms — the
    // maintained stats sidecar must track both without a rebuild
    assert(gotBm25(Seq("zebrastripe"), 5) == directBm25(Seq("zebrastripe"), 5))
    assert(gotBm25(someTerms, 10) == directBm25(someTerms, 10))

    // update: the old text's postings are superseded by the new ones
    gs.txn().updateVertices("doc",
      Seq((9001L, "plainwords only")).toDF("id", "text")).commit()
    assert(got(Seq("zebrastripe"), 5).isEmpty, "old postings must retire on update")
    assert(got(Seq("plainwords"), 5) == Seq((9001L, 1L, 1L)))

    // delete: the document vanishes from search
    gs.txn().deleteVertices("doc", Seq(9001L).toDF("id")).commit()
    assert(got(Seq("plainwords"), 5).isEmpty, "deleted doc must vanish from search")
    assert(gotBm25(Seq("plainwords"), 5).isEmpty,
      "deleted doc must vanish from BM25 ranking")
    assert(gotBm25(someTerms, 10) == directBm25(someTerms, 10),
      "post-delete stats (n back down) must match recompute")

    assert(listBase(dir, "postindex", "doc") == frozenBase,
      "maintenance must append deltas, never rewrite base")
  }

  test("commit-maintained PQ code store: fresh vectors findable via the ADC scan") {
    import graft.operators.MaintainedPqStore
    val dir = tmp("pqidx")
    val schema = GraphSchema.builder().vertex("emb", "id", Seq("v")).build()
    val gs = new GraphStore(spark, schema, dir)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q: Seq[Double] = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toSeq
    gs.txn().createVertices("emb",
      emb.filter(col("vec_id") =!= 0 && col("vec_id") < 300)
        .select(col("vec_id").as("id"), col("embedding").as("v"))).commit()

    val pq = new MaintainedPqStore(gs, "emb", "v", dir, m = 8, ksub = 16,
      iterations = 2)
    pq.rebuild()
    pq.bind()
    val frozenBase = listBase(dir, "pqindex", "emb")

    // ground truth: from-scratch encode of the CURRENT graph under the
    // same persisted codebooks, same candidate budget
    def scan(): Seq[(Long, Double)] = {
      val cur = gs.graph().vertices("emb").select(col("id"), col("v"))
      Similarity.pqTopK(cur, "v", "id",
          Similarity.pqEncode(cur, "id", "v", pq.codebooks), pq.codebooks,
          q, k = 10, candidates = 50)
        .as[(Long, Double)].collect().toSeq
    }
    def stored(): Seq[(Long, Double)] =
      pq.topK(q, 10, candidates = 50).as[(Long, Double)].collect().toSeq

    assert(stored() == scan(), "fresh store must agree with from-scratch encode")

    // create: an exact twin of the query encodes to the per-subspace
    // argmin cells, so its ADC distance is the global minimum — it must
    // be a candidate and rescore to top-1 in-commit
    val qf = q.map(_.toFloat).toArray
    gs.txn().createVertices("emb", Seq((9001L, qf)).toDF("id", "v")).commit()
    val afterCreate = stored()
    assert(afterCreate.head == ((9001L, 1.0)),
      s"new exact match must rank first: $afterCreate")
    assert(afterCreate == scan())

    // update: a re-embedded id's stale codes must be tombstone-retired
    val someId = afterCreate.last._1
    gs.txn().updateVertices("emb", Seq((someId, qf)).toDF("id", "v")).commit()
    val afterUpdate = stored()
    assert(afterUpdate.take(2).map(_._1).toSet == Set(9001L, someId))
    assert(afterUpdate.take(2).forall(_._2 == 1.0))
    assert(afterUpdate == scan())

    // delete: the twin vanishes from the probe
    gs.txn().deleteVertices("emb", Seq(9001L).toDF("id")).commit()
    val afterDelete = stored()
    assert(!afterDelete.exists(_._1 == 9001L))
    assert(afterDelete == scan())

    assert(listBase(dir, "pqindex", "emb") == frozenBase,
      "maintenance must append deltas, never rewrite base")
  }

  test("commit-maintained IVF-PQ store: committed vectors findable via the composed probe") {
    import graft.operators.MaintainedIvfPqStore
    val dir = tmp("ivfpqidx")
    val schema = GraphSchema.builder().vertex("emb", "id", Seq("v")).build()
    val gs = new GraphStore(spark, schema, dir)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q: Seq[Double] = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toSeq
    gs.txn().createVertices("emb",
      emb.filter(col("vec_id") =!= 0 && col("vec_id") < 300)
        .select(col("vec_id").as("id"), col("embedding").as("v"))).commit()

    val ivfpq = new MaintainedIvfPqStore(gs, "emb", "v", dir, k = 8, m = 8,
      ksub = 16, iterations = 2)
    ivfpq.rebuild()
    ivfpq.bind()
    val frozenBase = listBase(dir, "ivfpqindex", "emb")

    // the probe's base read must be pruned to the probed cells
    val plan = ivfpq.topK(q, 10, nProbe = 4).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && !plan.contains("PartitionFilters: []"),
      s"composed probe must prune base cells:\n$plan")

    // an exact twin of the query assigns to the query's nearest cell
    // and encodes to the argmin codewords: with the twin's cell probed,
    // ADC ranks it first — findable in-commit through the COMPOSED path
    val qf = q.map(_.toFloat).toArray
    gs.txn().createVertices("emb", Seq((9001L, qf)).toDF("id", "v")).commit()
    val afterCreate = ivfpq.topK(q, 10, nProbe = 4, candidates = 50)
      .as[(Long, Double)].collect().toSeq
    assert(afterCreate.head == ((9001L, 1.0)),
      s"committed twin must rank first through the composed probe: $afterCreate")

    // update: the twin re-embeds as some mid-ranked corpus vector; its
    // stale perfect-match codes must retire (no (9001, 1.0) row left)
    val far = afterCreate.last._1
    gs.txn().updateVertices("emb",
      emb.filter(col("vec_id") === far).select(lit(9001L).as("id"),
        col("embedding").as("v"))).commit()
    val afterUpdate = ivfpq.topK(q, 10, nProbe = 4, candidates = 50)
      .as[(Long, Double)].collect().toSeq
    assert(!afterUpdate.contains((9001L, 1.0)),
      s"stale twin codes must retire on update: $afterUpdate")

    // delete: gone from the probe
    gs.txn().deleteVertices("emb", Seq(9001L).toDF("id")).commit()
    val afterDelete = ivfpq.topK(q, 10, nProbe = 4, candidates = 50)
      .as[(Long, Double)].collect().toSeq
    assert(!afterDelete.exists(_._1 == 9001L))

    assert(listBase(dir, "ivfpqindex", "emb") == frozenBase,
      "maintenance must append deltas, never rewrite base")
  }

  test("commit-maintained IVF-PQ store with metadata: a committed vector is " +
      "findable through the FILTERED composed probe, off-label twins are not") {
    import graft.operators.MaintainedIvfPqStore
    val dir = tmp("ivfpqfidx")
    // NOTE: vertices() reserves the column name "label" for the vertex
    // TYPE, so the filterable attribute is modeled as "cat" here
    val schema = GraphSchema.builder().vertex("emb", "id", Seq("v", "cat")).build()
    val gs = new GraphStore(spark, schema, dir)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q: Seq[Double] = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toSeq
    gs.txn().createVertices("emb",
      emb.filter(col("vec_id") =!= 0 && col("vec_id") < 300)
        .select(col("vec_id").as("id"), col("embedding").as("v"), col("label").as("cat"))).commit()

    val ivfpq = new MaintainedIvfPqStore(gs, "emb", "v", dir, k = 8, m = 8,
      ksub = 16, iterations = 2, metaCols = Seq("cat"))
    ivfpq.rebuild()
    ivfpq.bind()

    // commit TWO exact twins of the query: one wearing the probed
    // label, one off-label. The filtered composed probe must surface
    // the on-label twin first and never the off-label one.
    val qf = q.map(_.toFloat).toArray
    gs.txn().createVertices("emb",
      Seq((9001L, qf, 3), (9002L, qf, 4)).toDF("id", "v", "cat")).commit()
    val got = ivfpq.topKFiltered(q, 10, predicate = col("cat") === 3,
        nProbe = 6, candidates = 50)
      .as[(Long, Double)].collect().toSeq
    assert(got.head == ((9001L, 1.0)),
      s"on-label committed twin must rank first through the filtered probe: $got")
    assert(!got.exists(_._1 == 9002L),
      s"off-label twin must not pass the filtered probe: $got")
    // every survivor is on-label (predicate evaluated in the store,
    // where the delta rows carry the committed label)
    val onLabel = gs.graph().vertices("emb").filter(col("cat") === 3)
      .select("id").as[Long].collect().toSet
    assert(got.map(_._1).toSet.subsetOf(onLabel))

    // the unfiltered probe still sees both twins
    val unfiltered = ivfpq.topK(q, 10, nProbe = 6, candidates = 50)
      .as[(Long, Double)].collect().toSeq
    assert(unfiltered.take(2).map(_._1).toSet == Set(9001L, 9002L))
  }

  test("commit-maintained ANN store: create/update/delete without rebuild") {
    val dir = tmp("annidx")
    val schema = GraphSchema.builder().vertex("emb", "id", Seq("v")).build()
    val gs = new GraphStore(spark, schema, dir)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q: Seq[Double] = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toSeq
    gs.txn().createVertices("emb",
      emb.filter(col("vec_id") =!= 0 && col("vec_id") < 300)
        .select(col("vec_id").as("id"), col("embedding").as("v"))).commit()

    val ann = new MaintainedAnnStore(gs, "emb", "v", dir, dim = 64,
      nBits = 4, nTables = 8)
    ann.rebuild()
    ann.bind()
    val frozenBase = listBase(dir, "annindex", "emb")

    // ground truth: the in-session filter-scan probe over the store's
    // CURRENT graph, identical candidate semantics by construction
    def scan(): Seq[(Long, Double)] =
      Similarity.annTopK(gs.graph().vertices("emb"), "v", "id", q,
          k = 10, nBits = 4, seed = 42L, nTables = 8)
        .as[(Long, Double)].collect().toSeq
    def stored(): Seq[(Long, Double)] =
      ann.topK(q, 10).as[(Long, Double)].collect().toSeq

    assert(stored() == scan(), "fresh store must agree with filter-scan probe")

    // create: an exact copy of the query vector lands in the query's
    // bucket in every table and must surface as top-1 in-commit
    val qf = q.map(_.toFloat).toArray
    gs.txn().createVertices("emb", Seq((9001L, qf)).toDF("id", "v")).commit()
    val afterCreate = stored()
    assert(afterCreate.head == ((9001L, 1.0)), s"new exact match must rank first: $afterCreate")
    assert(afterCreate == scan())
    // the committed twin is also a NEAR-DUP candidate from the same
    // maintained buckets (the vector analog of SignatureIndex.nearDups)
    // — the corpus itself has no >= 0.999 pairs, so the planted copy
    // of a real vector (id 9001 copies vec 0's embedding, which is NOT
    // in the store) pairs with nothing, but a copy of a STORED vector
    // must pair with its original in-commit
    val v7: Array[Float] = emb.filter(col("vec_id") === 7).select("embedding")
      .head().getSeq[Float](0).toArray
    gs.txn().createVertices("emb", Seq((9002L, v7)).toDF("id", "v")).commit()
    assert(ann.nearDups(threshold = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet == Set((7L, 9002L)),
      "committed twin must be a near-dup candidate with no rebuild")
    val g7 = ann.nnGraph(threshold = 0.999, k = 3)
      .select("id", "nn_id", "rk").as[(Long, Long, Long)].collect().toSet
    assert(g7 == Set((7L, 9002L, 1L), (9002L, 7L, 1L)))
    gs.txn().deleteVertices("emb", Seq(9002L).toDF("id")).commit()
    assert(ann.nearDups(threshold = 0.999).count() == 0)

    // update: an existing id re-embedded to the query vector — may MOVE
    // buckets; its stale row must be retired by the tombstone epoch,
    // not survive alongside the fresh one
    val someId = afterCreate.last._1
    gs.txn().updateVertices("emb", Seq((someId, qf)).toDF("id", "v")).commit()
    val afterUpdate = stored()
    assert(afterUpdate.take(2).map(_._1).toSet == Set(9001L, someId))
    assert(afterUpdate.take(2).forall(_._2 == 1.0))
    assert(afterUpdate == scan())

    // delete: the exact twin disappears from the probe
    gs.txn().deleteVertices("emb", Seq(9001L).toDF("id")).commit()
    val afterDelete = stored()
    assert(!afterDelete.exists(_._1 == 9001L))
    assert(afterDelete == scan())

    assert(listBase(dir, "annindex", "emb") == frozenBase,
      "maintenance must append deltas, never rewrite base")

    // IVF sibling: fresh vectors assigned to the persisted (fixed)
    // centroids appear in-commit; ground truth is a from-scratch
    // assignment of the CURRENT graph under the same quantizer
    val ivf = new MaintainedIvfStore(gs, "emb", "v", dir, k = 8, iterations = 2)
    ivf.rebuild()
    ivf.bind()
    def ivfScan(): Seq[(Long, Double)] = {
      val cur = gs.graph().vertices("emb")
        .withColumn("__nv", Similarity.l2normalize(col("v")))
      val norm = math.sqrt(q.map(x => x * x).sum)
      Similarity.ivfTopK(Similarity.ivfAssign(cur, "__nv", ivf.centroids),
          "v", "id", ivf.centroids, q, k = 10, nProbe = 3,
          probeVec = Some(q.map(_ / norm)))
        .as[(Long, Double)].collect().toSeq
    }
    assert(ivf.topK(q, 10, nProbe = 3).as[(Long, Double)].collect().toSeq == ivfScan())
    gs.txn().createVertices("emb", Seq((9002L, qf)).toDF("id", "v")).commit()
    val ivfAfter = ivf.topK(q, 10, nProbe = 3).as[(Long, Double)].collect().toSeq
    assert(ivfAfter.exists(r => r._1 == 9002L && r._2 == 1.0),
      s"fresh exact match must surface in-commit: $ivfAfter")
    assert(ivfAfter == ivfScan())
    gs.txn().deleteVertices("emb", Seq(9002L).toDF("id")).commit()
    val ivfDel = ivf.topK(q, 10, nProbe = 3).as[(Long, Double)].collect().toSeq
    assert(!ivfDel.exists(_._1 == 9002L))
    assert(ivfDel == ivfScan())

    // the probe's scan discipline with the delta log in place — the
    // LSM level split: the big immutable base is DIRECTORY-pruned by
    // the bucket predicate; the small flat delta files take the bucket
    // predicate (fresh scan) and the __tomb flag (tombstone scan) as
    // parquet PUSHED filters instead, skipping via rowgroup stats on
    // the bucket-sorted files
    val plan = ann.topK(q, 10).queryExecution.executedPlan.toString
    // the displayed Location path truncates, so match only the first
    // character of base/delta under the generation dir
    val baseScans = plan.linesIterator
      .filter(_.matches(""".*annindex/emb/gen@\d+/b.*""")).toSeq
    val deltaScans = plan.linesIterator
      .filter(_.matches(""".*annindex/emb/gen@\d+/d.*""")).toSeq
    assert(baseScans.size == 1 && deltaScans.size == 2,
      s"expected base + fresh-delta + tombstone scans:\n$plan")
    assert(baseScans.head.contains("PartitionFilters: [("),
      s"base probe scan not bucket-pruned:\n$plan")
    assert(deltaScans.exists(l => l.contains("PushedFilters: [") && l.contains("bucket")),
      s"fresh-delta scan does not push the bucket predicate:\n$plan")
    assert(deltaScans.exists(l => l.contains("PushedFilters: [") && l.contains("__tomb")),
      s"tombstone scan does not push the __tomb flag:\n$plan")
  }

  test("single-writer contract: a second binder on the same index dir fails fast") {
    val dir = tmp("bindlock")
    val schema = GraphSchema.builder().vertex("doc", "id", Seq("text")).build()
    val gs = new GraphStore(spark, schema, dir)
    gs.txn().createVertices("doc",
      Seq((1L, "alpha beta")).toDF("id", "text")).commit()
    val post = new graft.operators.MaintainedPostingIndex(gs, "doc", "text", dir)
    post.rebuild()
    post.bind()
    // same directory, second instance: the _BINDER_LOCK is held, so the
    // second bind must fail instead of silently interleaving deltas
    val second = new graft.operators.MaintainedPostingIndex(gs, "doc", "text", dir)
    intercept[IllegalStateException] { second.bind() }
    // a DIFFERENT index kind under the same storage root has its own
    // lock and binds fine
    val sig = new SignatureIndex(gs, "doc", "text", dir)
    sig.rebuild()
    sig.bind()
  }

  test("replay cursor: epochs at or below the marker are skipped, fresh ones apply") {
    val dir = tmp("cursor")
    val schema = GraphSchema.builder().vertex("doc", "id", Seq("text")).build()
    val gs = new GraphStore(spark, schema, dir)
    gs.txn().createVertices("doc",
      Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("id", "text")).commit()
    val post = new graft.operators.MaintainedPostingIndex(gs, "doc", "text", dir)
    post.rebuild()
    post.bind()
    gs.txn().createVertices("doc",
      Seq((9001L, "zebrastripe rare")).toDF("id", "text")).commit()
    assert(post.search(Seq("zebrastripe"), 5).select("id").as[Long].collect()
      .toSeq == Seq(9001L))

    // a replica binder restarted with a fresh checkpoint replays
    // history: a replayed epoch — even with divergent content — is
    // skipped by the cursor, not re-applied over the live delta
    val e = gs.store.currentEpoch
    post.applyCommit(e,
      Seq((9001L, "hijacked", false)).toDF("id", "text", "deleted"))
    assert(post.search(Seq("zebrastripe"), 5).select("id").as[Long].collect()
      .toSeq == Seq(9001L), "replayed epoch must not clobber the live delta")
    assert(post.search(Seq("hijacked"), 5).count() == 0)

    // a genuinely new epoch still applies
    gs.txn().createVertices("doc",
      Seq((9002L, "freshword only")).toDF("id", "text")).commit()
    assert(post.search(Seq("freshword"), 5).select("id").as[Long].collect()
      .toSeq == Seq(9002L))
  }

  test("commit-maintained dhash index: a committed image is a near-dup candidate") {
    import graft.operators.{MaintainedDhashIndex, Multimodal}
    val dir = tmp("dhashidx")
    val schema = GraphSchema.builder().vertex("image", "id", Seq("bytes")).build()
    val gs = new GraphStore(spark, schema, dir)
    // pattern ids 0..39: hash classes repeat mod 256 in the id's
    // intensity offset, so id 5's twin lives at 5 + 256 = 261
    val seed = (0L until 40L).map(i => (i, Multimodal.synthPatternImageBytes(i)))
      .toDF("id", "bytes")
    gs.txn().createVertices("image", seed).commit()

    val idx = new MaintainedDhashIndex(gs, "image", "bytes", dir)
    idx.rebuild()
    idx.bind()

    val query = Multimodal.synthPatternImageBytes(261L) // exact class of id 5
    // ground truth: driver-side hash of every stored pattern
    val qh = Multimodal.dHash64(query)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val expect0 = (0L until 40L).filter(i =>
      ham(Multimodal.dHash64(Multimodal.synthPatternImageBytes(i)), qh) == 0).toSet
    assert(expect0.contains(5L))
    val got = idx.nearDups(query, maxHamming = 0)
      .select("id").as[Long].collect().toSet
    assert(got === expect0, "fresh index must agree with driver recompute")

    // create: a committed same-class image is a candidate IN-COMMIT
    gs.txn().createVertices("image",
      Seq((9001L, Multimodal.synthPatternImageBytes(517L))).toDF("id", "bytes"))
      .commit() // 517 ≡ 5 (mod 256) → same raster class
    assert(idx.nearDups(query, 0).select("id").as[Long].collect().toSet
      === expect0 + 9001L, "committed image must be findable without rebuild")

    // update: id 5 re-rastered into a different class — superseded
    gs.txn().updateVertices("image",
      Seq((5L, Multimodal.synthPatternImageBytes(6L))).toDF("id", "bytes")).commit()
    assert(idx.nearDups(query, 0).select("id").as[Long].collect().toSet
      === expect0 - 5L + 9001L, "updated image must match by its NEW pixels")

    // delete: the committed twin vanishes
    gs.txn().deleteVertices("image", Seq(9001L).toDF("id")).commit()
    assert(idx.nearDups(query, 0).select("id").as[Long].collect().toSet
      === expect0 - 5L, "deleted image must leave the candidate set")

    // wider radius stays consistent with ground truth at hamming <= 3
    val expect3 = (0L until 40L).filterNot(_ == 5L).filter(i =>
      ham(Multimodal.dHash64(Multimodal.synthPatternImageBytes(i)), qh) <= 3).toSet
    val got3 = idx.nearDups(query, 3).select("id").as[Long].collect().toSet
    assert(got3 === expect3 ++ Set(6L).filter(i => // id 5 now carries pattern 6
      ham(Multimodal.dHash64(Multimodal.synthPatternImageBytes(6L)), qh) <= 3)
      .map(_ => 5L),
      s"banded probe must have exact recall at <= 3 bits: $got3 vs $expect3")
  }

  test("commit-maintained audio index: a committed recording is a near-dup candidate") {
    import graft.operators.{MaintainedAudioIndex, Multimodal}
    val dir = tmp("ahashidx")
    val schema = GraphSchema.builder().vertex("clip", "id", Seq("bytes")).build()
    val gs = new GraphStore(spark, schema, dir)
    // pattern waveforms repeat mod 8192 in the amplitude offset, so
    // id 5's exact twin lives at 5 + 8192
    val seed = (0L until 40L).map(i => (i, Multimodal.synthPatternWavBytes(i)))
      .toDF("id", "bytes")
    gs.txn().createVertices("clip", seed).commit()

    val idx = new MaintainedAudioIndex(gs, "clip", "bytes", dir)
    idx.rebuild()
    idx.bind()

    val query = Multimodal.synthPatternWavBytes(8197L) // exact class of id 5
    val qh = Multimodal.audioHash64(query)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    def truth(maxH: Int, ids: Seq[Long]): Set[Long] = ids.filter(i =>
      ham(Multimodal.audioHash64(Multimodal.synthPatternWavBytes(i)), qh) <= maxH).toSet
    val expect0 = truth(0, 0L until 40L)
    assert(expect0.contains(5L))
    assert(idx.nearDups(query, 0).select("id").as[Long].collect().toSet === expect0,
      "fresh index must agree with driver recompute")

    // create: a committed twin recording is a candidate IN-COMMIT
    gs.txn().createVertices("clip",
      Seq((9001L, Multimodal.synthPatternWavBytes(8197L))).toDF("id", "bytes")).commit()
    assert(idx.nearDups(query, 0).select("id").as[Long].collect().toSet
      === expect0 + 9001L, "committed recording must be findable without rebuild")

    // update: id 5 re-recorded into a far class — superseded
    gs.txn().updateVertices("clip",
      Seq((5L, Multimodal.synthPatternWavBytes(4000L))).toDF("id", "bytes")).commit()
    val after = idx.nearDups(query, 0).select("id").as[Long].collect().toSet
    val keeps5 = ham(Multimodal.audioHash64(Multimodal.synthPatternWavBytes(4000L)), qh) == 0
    assert(after === (if (keeps5) expect0 else expect0 - 5L) + 9001L,
      "updated recording must match by its NEW waveform")

    // delete: the committed twin vanishes
    gs.txn().deleteVertices("clip", Seq(9001L).toDF("id")).commit()
    assert(!idx.nearDups(query, 0).select("id").as[Long].collect().contains(9001L))

    // wider radius stays consistent with ground truth at hamming <= 3
    val expect3 = truth(3, (0L until 40L).filterNot(_ == 5L)) ++
      (if (ham(Multimodal.audioHash64(Multimodal.synthPatternWavBytes(4000L)), qh) <= 3)
        Set(5L) else Set.empty[Long])
    assert(idx.nearDups(query, 3).select("id").as[Long].collect().toSet === expect3,
      "banded probe must have exact recall at <= 3 bits")
  }
}
