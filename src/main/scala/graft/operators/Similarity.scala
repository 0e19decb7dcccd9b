package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Similarity search over an embedding column (`array<float>`): brute-force
  * cosine top-k as the exactness baseline, all-pairs near-dup for bounded
  * sets, and a random-hyperplane LSH bucketed path for scale.
  *
  * 100 TB plan shape: `topK` is a single scan + `TakeOrderedAndProject`
  * (no global sort, no shuffle of the data — only k rows per partition
  * reach the driver-side merge). `lshNeighbors` buckets vectors by a fixed
  * signed-projection signature so candidate generation is an equi-join on
  * the bucket key; only `cosinePairs` is quadratic and is meant for
  * dimension-sized inputs or as a per-bucket verifier.
  */
object Similarity {

  /** Cosine similarity rounded to 6 decimals — enough to absorb
    * accumulation-order noise while keeping ranking stable.
    */
  private def cos6(vec: String, q: Array[Double]) =
    round(GraftFunctions.cosine_sim(col(vec), q), 6)

  /** Brute-force cosine top-k against a constant query vector. Ties break
    * on vec_id so results are deterministic. Compiles to
    * TakeOrderedAndProject — a per-partition heap, not a global sort.
    */
  def topK(emb: DataFrame, query: Array[Double], k: Int,
           excludeId: Option[Long] = None): DataFrame = {
    val base = excludeId.fold(emb)(id => emb.filter(col("vec_id") =!= id))
    base.select(col("vec_id"), cos6("embedding", query).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Top-n most-similar embedding pairs (i < j) by pairwise cosine.
    * All-pairs — O(n²/2) — for bounded inputs; at scale run it per LSH
    * bucket instead.
    */
  def cosinePairs(emb: DataFrame, n: Int): DataFrame = {
    val a = emb.select(col("vec_id").as("i"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("j"), col("embedding").as("eb"))
    a.join(b, col("i") < col("j"))
      .select(col("i"), col("j"),
        round(GraftFunctions.dot_product(col("ea"), col("eb")) /
          (GraftFunctions.l2_norm(col("ea")) * GraftFunctions.l2_norm(col("eb"))),
          6).as("cos"))
      .orderBy(col("cos").desc, col("i").asc, col("j").asc)
      .limit(n)
  }

  /** Deterministic pseudo-random unit-ish hyperplanes for LSH signatures:
    * a fixed linear-congruential stream, so every run (and every executor)
    * derives the identical planes with no driver→executor state.
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    var state = seed
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      // top 53 bits → [0,1) → [-1,1)
      (state >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Array.fill(numPlanes)(Array.fill(dim)(next()))
  }

  /** Sign-projection LSH bucket key: bit b = sign(v · plane_b). Vectors in
    * the same bucket are within a cone; nearest neighbors of a query are
    * searched in the query's bucket only.
    */
  def lshBucket(vec: String, planes: Array[Array[Double]]) =
    (0 until planes.length).map { b =>
      when(GraftFunctions.dot_product(col(vec), lit(planes(b))) >= 0,
        lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, c) => a.bitwiseOR(c))

  /** LSH-bucketed approximate top-k: compute the query's bucket, scan only
    * vectors whose signature matches it (single equi-filter pushed to the
    * scan), then exact cosine rank within the bucket. Recall trades off
    * with `numPlanes`; the scale path replaces q19's full scan with a
    * bucket-pruned one.
    */
  def lshNeighbors(emb: DataFrame, query: Array[Double], k: Int,
                   numPlanes: Int = 8, excludeId: Option[Long] = None): DataFrame = {
    val planes = hyperplanes(numPlanes, query.length)
    val qBucket = (0 until numPlanes).map { b =>
      val dot = planes(b).zip(query).map { case (p, x) => p * x }.sum
      if (dot >= 0) 1L << b else 0L
    }.reduce(_ | _)
    val base = excludeId.fold(emb)(id => emb.filter(col("vec_id") =!= id))
    base.filter(lshBucket("embedding", planes) === qBucket)
      .select(col("vec_id"), cos6("embedding", query).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }
}
