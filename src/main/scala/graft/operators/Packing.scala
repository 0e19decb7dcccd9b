package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining — the concat-and-chunk layout
  * (concatenate every document in one deterministic order, cut the
  * stream into fixed `capacity`-token training windows): the packing
  * GPT-style pipelines actually use, because it wastes ZERO tokens to
  * padding by construction — every chunk except the last is exactly
  * full. The alternative (bin packing whole docs, padding the slack)
  * trades tokens for unbroken documents; [[Sharding.assignShards]]
  * already covers that family's balancing side.
  *
  * [[concatChunk]] computes, per document, where it lands in the packed
  * stream: (doc_id, n_tokens, chunk_first, chunk_last, offset_in_chunk)
  * with chunk ids 0-based and `offset_in_chunk` the document's first
  * token position inside `chunk_first`. A doc straddles a boundary iff
  * chunk_last > chunk_first; downstream writers either cut there (the
  * classic pretraining layout) or mask attention across the seam.
  *
  * Scale shape: the only global state is an EXACT prefix sum of token
  * counts in `key` order, computed the same two-pass distributed way as
  * [[Sharding.globalRankByRange]] — range repartition on the key, a
  * KEYED per-partition cumulative window, and per-partition offsets
  * from one partition-count-sized aggregate (collected and folded into
  * a literal expression — bounded by `partitions`, never by data). No
  * single-partition window anywhere; everything after the prefix sum is
  * scan-side integer arithmetic. `capacity` must be a power of two so
  * the chunk division is EXACT in binary (the oracle replays it as a
  * double divide; power-of-two divisors round-trip losslessly below
  * 2⁵³).
  */
object Packing {

  def concatChunk(docs: DataFrame, capacity: Long, nTokens: Column,
                  key: Column, partitions: Int = 32): DataFrame = {
    require(capacity >= 1 && (capacity & (capacity - 1)) == 0,
      s"capacity must be a positive power of two, got $capacity")
    // scan-side loud guard: a zero-token doc would emit chunk_last <
    // chunk_first (−1 at stream start), silently breaking the
    // chunk-range contract downstream — fail like the capacity require
    val base = docs.select(key.as("doc_id"),
      when(nTokens.cast("long") >= 1L, nTokens.cast("long"))
        .otherwise(raise_error(concat(
          lit("concatChunk: n_tokens < 1 for doc_id "),
          key.cast("string")))).as("n_tokens"))
    val ranged = base.repartitionByRange(partitions, col("doc_id"))
      .withColumn("__pid", spark_partition_id())
    val persisted = graft.CacheRegistry.persist(ranged)
    // one row per partition — bounded by `partitions`, never by data
    val sums = persisted.groupBy(col("__pid"))
      .agg(sum(col("n_tokens")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = sums.map(_._2).scanLeft(0L)(_ + _)
    val offsetOf = sums.map(_._1).zip(offsets)
      .foldLeft(lit(0L)) { case (acc, (pid, off)) =>
        when(col("__pid") === pid, off).otherwise(acc) }
    // explicit ROWS frame: the default RANGE frame would sum key PEERS
    // together, silently misplacing duplicate-key rows relative to the
    // oracle's ROWS algebra (and [[Chunking.packOffsets]]'s)
    val wp = Window.partitionBy(col("__pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    persisted
      .withColumn("cum_before",
        offsetOf + sum(col("n_tokens")).over(wp) - col("n_tokens"))
      .withColumn("chunk_first",
        floor(col("cum_before") / capacity.toDouble).cast("long"))
      .withColumn("chunk_last",
        floor((col("cum_before") + col("n_tokens") - 1) /
          capacity.toDouble).cast("long"))
      .withColumn("offset_in_chunk", pmod(col("cum_before"), lit(capacity)))
      .select(col("doc_id"), col("n_tokens"), col("chunk_first"),
        col("chunk_last"), col("offset_in_chunk"))
  }

  /** [[concatChunk]] as ANSI SQL for a DuckDB oracle: the same prefix
    * sum as one window (audit scale), the same power-of-two-exact
    * double division, the same mod.
    */
  def concatChunkOracleSql(table: String, capacity: Long,
                           nTokensSql: String): String =
    s"""WITH w AS (
       |  SELECT doc_id, CAST($nTokensSql AS BIGINT) AS n_tokens
       |  FROM $table
       |), c AS (
       |  SELECT doc_id, n_tokens,
       |         CAST(COALESCE(SUM(n_tokens) OVER (
       |           ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |           0) AS BIGINT) AS cum_before
       |  FROM w
       |)
       |SELECT doc_id, n_tokens,
       |       CAST(floor(cum_before / $capacity.0) AS BIGINT) AS chunk_first,
       |       CAST(floor((cum_before + n_tokens - 1) / $capacity.0)
       |            AS BIGINT) AS chunk_last,
       |       cum_before % $capacity AS offset_in_chunk
       |FROM c""".stripMargin
}
