package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column storage and aggregation utilities for the
  * LLM-data-pipeline surface: symmetric int8 quantization (the standard
  * 4× storage/bandwidth cut before vectors are shipped to an ANN index)
  * and per-group centroids (class prototypes for quality classifiers,
  * cluster summaries for IVF-style partitioning).
  *
  * Everything is a pure Column expression or one keyed aggregation —
  * quantization runs in the scan (zero shuffles), centroids shuffle once
  * on (group, dim) with map-side partial aggregation.
  */
object Embeddings {

  /** Symmetric per-vector int8 quantization: scale = max|x| / 127,
    * q_i = round(x_i / scale) ∈ [−127, 127]. Per-vector (not per-tensor)
    * scaling is the standard choice for embedding storage — one outlier
    * vector cannot crush everyone else's resolution. All-zero vectors
    * quantize to zeros with scale 0 (guarded — never a 0/0). Returns
    * (id, scale: double, q: array<int>); dequantization is
    * `transform(q, x -> x * scale)`.
    */
  def quantizeInt8(emb: DataFrame, id: String = "vec_id",
                   vec: String = "embedding"): DataFrame = {
    val v = col(vec).cast("array<double>")
    val scale = array_max(transform(v, x => abs(x))) / lit(127.0)
    emb.select(col(id), scale.as("scale"),
      transform(v, x =>
        when(scale === 0, lit(0)).otherwise(round(x / scale).cast("int")))
        .as("q"))
  }

  /** Element-wise mean vector per group, exploded to (grp, pos, n, mean):
    * one keyed aggregation, exact cross-engine (per-element values are
    * 1e-6-quantized before summing, so the sum is order-independent;
    * the mean divides identical operands). `pos` is 0-based; reassemble
    * with `groupBy(grp).agg(array_sort + collect_list)` when an array
    * shape is needed downstream.
    */
  def groupCentroids(emb: DataFrame, group: Column,
                     vec: String = "embedding"): DataFrame =
    emb.select(group.as("grp"),
        posexplode(col(vec).cast("array<double>")).as(Seq("pos", "x")))
      .groupBy(col("grp"), col("pos").cast("long").as("pos"))
      .agg(count(lit(1)).as("n"), (sum(round(col("x") * 1e6)) / 1e6).as("sx"))
      .select(col("grp"), col("pos"), col("n"),
        round(col("sx") / col("n"), 9).as("mean"))
}
