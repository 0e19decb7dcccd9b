package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import graft.functions.GraftFunctions

/** Similarity search over an embedding column (`array<float>`): brute-force
  * cosine top-k as the exactness baseline, blocked exact all-pairs, and a
  * multi-probe random-hyperplane LSH bucketed path for scale.
  *
  * 100 TB plan shape: `topK` is a single scan + `TakeOrderedAndProject`
  * (no global sort, no shuffle of the data — only k rows per partition
  * reach the driver-side merge). `cosinePairs` is exact all-pairs — an
  * inherently quadratic QUERY — organized as block-pair equi-joins so the
  * quadratic work is (a) sharded evenly across the cluster instead of
  * through one nested-loop operator, and (b) executed by the native
  * [[graft.functions.ArrayDotProduct]] kernel so the constant is the FLOP
  * count, not lambda dispatch. `lshNeighbors` is the sub-quadratic
  * approximate path: bucket by signed projections, probe the nearest
  * buckets only.
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

  /** Top-n most-similar embedding pairs (i < j) by exact pairwise cosine.
    *
    * Exact all-pairs is O(n²) by definition; the implementation makes that
    * scale-shaped instead of a BroadcastNestedLoopJoin:
    *
    *  - vectors get a block id (`vec_id mod blocks`); the driver emits the
    *    tiny blocks×(blocks+1)/2 block-pair relation as a literal frame;
    *  - two equi-joins fan each block pair out to its vector pairs — both
    *    are hash joins on block keys, so the n²/2 pair stream is sharded
    *    across `blocks²/2` keys instead of one nested loop, and AQE is free
    *    to broadcast the (block-pruned) build side;
    *  - per-pair work is one native-kernel dot product over precomputed
    *    double arrays plus a divide by precomputed norms (same arithmetic —
    *    sequential accumulation, dot/(‖a‖·‖b‖) — as the brute-force path);
    *  - the top-n reduction compiles to TakeOrderedAndProject.
    */
  def cosinePairs(emb: DataFrame, n: Int, blocks: Int = 32): DataFrame = {
    val spark = emb.sparkSession
    val prepped = emb.select(
      col("vec_id"),
      pmod(col("vec_id"), lit(blocks)).cast(IntegerType).as("bid"),
      col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", GraftFunctions.l2_norm(col("v")))
    val blockPairs = spark.createDataFrame(
      spark.sparkContext.parallelize(
        for { p <- 0 until blocks; q <- p until blocks } yield Row(p, q),
        numSlices = 1),
      StructType(Seq(StructField("bp", IntegerType, nullable = false),
        StructField("bq", IntegerType, nullable = false))))
    val a = prepped.select(col("bid").as("ba"), col("vec_id").as("ia"),
      col("v").as("va"), col("nrm").as("na"))
    val b = prepped.select(col("bid").as("bb"), col("vec_id").as("ib"),
      col("v").as("vb"), col("nrm").as("nb"))
    // fan out: each block pair × its left block's vectors, spread across the
    // cluster on the (bp,bq) key, then equi-join the right block's vectors
    val expanded = blockPairs.join(a, col("bp") === col("ba"))
      .repartition(col("bp"), col("bq"))
    expanded.join(b, col("bq") === col("bb"))
      // same-block pairs appear (x,y) and (y,x): keep one; cross-block pairs
      // appear once in arbitrary id order and are reordered below
      .filter(col("bp") =!= col("bq") || col("ia") < col("ib"))
      .select(
        least(col("ia"), col("ib")).as("i"),
        greatest(col("ia"), col("ib")).as("j"),
        round(GraftFunctions.dot_product(col("va"), col("vb")) /
          (col("na") * col("nb")), 6).as("cos"))
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

  /** The query's own bucket plus the `probes−1` buckets reached by flipping
    * the lowest-|margin| sign bits — multi-probe LSH. A near neighbor lost
    * to the base bucket almost always sits just across one low-margin
    * hyperplane, so probing those first buys recall without more planes
    * (more planes would shrink every bucket and cost recall).
    */
  def probeBuckets(query: Array[Double], planes: Array[Array[Double]],
                   probes: Int): Seq[Long] = {
    val margins = planes.map(p => p.zip(query).map { case (a, b) => a * b }.sum)
    val base = margins.zipWithIndex
      .map { case (m, b) => if (m >= 0) 1L << b else 0L }.reduce(_ | _)
    val flipOrder = margins.zipWithIndex.sortBy { case (m, _) => math.abs(m) }
    (0 until math.min(probes, planes.length + 1)).map { k =>
      if (k == 0) base else base ^ (1L << flipOrder(k - 1)._2)
    }
  }

  /** LSH-bucketed approximate top-k: compute the query's probe buckets,
    * scan only vectors whose signature falls in one of them (a single
    * equi-filter pushed to the scan), then exact cosine rank within the
    * probed buckets. Recall is tuned by `numPlanes` (bucket size) ×
    * `probes` (buckets visited); the scale path replaces q19's full scan
    * with a bucket-pruned one.
    */
  def lshNeighbors(emb: DataFrame, query: Array[Double], k: Int,
                   numPlanes: Int = 8, probes: Int = 3,
                   excludeId: Option[Long] = None): DataFrame = {
    val planes = hyperplanes(numPlanes, query.length)
    val buckets = probeBuckets(query, planes, probes)
    val base = excludeId.fold(emb)(id => emb.filter(col("vec_id") =!= id))
    base.filter(lshBucket("embedding", planes).isin(buckets: _*))
      .select(col("vec_id"), cos6("embedding", query).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }
}
