package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Persistent similarity state — [[DedupState]]'s embedding counterpart:
  * store the corpus vectors PARTITIONED BY their IVF cell (directory
  * layout `vectors/cid=K/`), alongside the trained index, so an incoming
  * batch touches only the cells it lands in. Candidate generation is
  * cell-colocation — the IVF analog of LSH banding: deterministic
  * (seeded training, 1e-9-quantized centroids, argmin ties to the lower
  * cid), so the semantics are engine-replayable and oracle-checkable,
  * unlike distance-pruned ANN whose recall depends on data layout.
  *
  * 100 TB shape: the batch assigns against centroid LITERALS in its own
  * scan (no shuffle), the distinct batch cells (≤ k, index-sized) become
  * a partition filter on the store — the corpus read is PRUNED to
  * matching `cid=` directories (pinned in `EmbeddingStoreSpec`) — and
  * the join is a cid equi-join verified by the exact cosine kernel.
  * Corpus vectors outside the batch's cells are never read, let alone
  * shuffled.
  */
object EmbeddingStore {

  /** A loaded store: the trained index plus the cell-partitioned corpus
    * vectors (vec_id, embedding, cid).
    */
  case class Store(path: String, index: IVF.Index, vectors: DataFrame)

  /** Train (or reuse) an index, assign every corpus vector in one scan,
    * and write `path/index` + `path/vectors/cid=K/`. Pass a pre-trained
    * `index` to share one geometry across stores (train on a sample at
    * scale — see [[IVF.train]]).
    */
  def build(spark: SparkSession, emb: DataFrame, path: String, k: Int = 16,
            iters: Int = 3, index: Option[IVF.Index] = None): Store = {
    val idx = index.getOrElse(IVF.train(emb, k, iters))
    IVF.save(spark, idx, s"$path/index")
    emb.select(col("vec_id"), col("embedding"),
        IVF.assignExpr(col("embedding").cast("array<double>"), idx).as("cid"))
      .write.mode("overwrite").partitionBy("cid")
      .parquet(s"$path/vectors")
    load(spark, path)
  }

  def load(spark: SparkSession, path: String): Store =
    Store(path, IVF.load(spark, s"$path/index"),
      spark.read.parquet(s"$path/vectors"))

  /** Fold new vectors into the store: assign them under the EXISTING
    * index (the geometry is frozen at build time — cells never move, so
    * unlike [[DedupState.append]] there is no repair set) and append
    * their rows into the matching `cid=` partitions. Write cost is
    * batch-sized at any corpus size. Caller contract: vec_ids disjoint
    * from the store's. Re-training is a [[build]], not an append — a new
    * index re-cells every vector by design.
    *
    * This is a plain parquet append: NOT idempotent under blind
    * re-execution (a replayed epoch would double its rows). Where
    * at-least-once replay is possible, gate it behind the caller's commit
    * protocol — [[DedupState]]'s generational markers are the pattern.
    */
  def append(spark: SparkSession, store: Store, fresh: DataFrame): Store = {
    fresh.select(col("vec_id"), col("embedding"),
        IVF.assignExpr(col("embedding").cast("array<double>"), store.index)
          .as("cid"))
      .write.mode("append").partitionBy("cid")
      .parquet(s"${store.path}/vectors")
    load(spark, store.path)
  }

  /** Same-cell near-dup pairs between the stored corpus and a fresh
    * batch: (i = corpus vec_id, j = fresh vec_id, cos) for pairs whose
    * vectors land in the SAME cell of the stored index and whose exact
    * cosine is ≥ `threshold`. The store is read partition-pruned to the
    * batch's cells. Caller contract: stored and fresh vec_ids disjoint.
    *
    * Cell colocation is the candidate semantics, not an approximation
    * bolted on: a near-dup pair straddling a cell boundary is out of
    * contract by definition (same trade as an LSH band miss), which is
    * what keeps the result deterministic and bit-replayable.
    */
  def nearDupsAgainst(store: Store, fresh: DataFrame,
                      threshold: Double): DataFrame = {
    val f = fresh.select(col("vec_id").as("j"),
      col("embedding").cast("array<double>").as("vj"),
      IVF.assignExpr(col("embedding").cast("array<double>"), store.index)
        .as("cid"))
    // distinct batch cells: bounded by k (index-sized), so the collect is
    // centroid-scale; inlined as literals it becomes a partition filter
    // on the store scan
    val cells = f.select(col("cid")).distinct().collect().map(_.getInt(0))
    store.vectors
      .filter(col("cid").isin(cells.map(Integer.valueOf): _*))
      .select(col("vec_id").as("i"),
        col("embedding").cast("array<double>").as("vi"), col("cid"))
      .join(f, "cid")
      .select(col("i"), col("j"),
        round(GraftFunctions.dot_product(col("vi"), col("vj")) /
          (GraftFunctions.l2_norm(col("vi")) * GraftFunctions.l2_norm(col("vj"))),
          6).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
