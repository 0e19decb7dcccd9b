package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping.
  *
  * Parquet scans prune files and row groups from min/max footer stats, but
  * stats only help when the layout CLUSTERS the filtered columns: a sort by
  * `x` alone makes `y` ranges span every file. Interleaving the bits of
  * both columns into one Morton key and sorting by it keeps rows close in
  * EVERY dimension close on disk, so a 2-D range predicate touches a small
  * neighborhood of files instead of all of them — the same layout trick
  * Delta/Iceberg `OPTIMIZE ZORDER BY` applies, as a plain expression over a
  * plain sort, usable with any parquet destination.
  *
  * At 100 TB the key is computed scan-side (pure bit arithmetic inside
  * whole-stage codegen), the clustering write is one `repartitionByRange` +
  * local sort on the key — the same shuffle a plain sorted write costs —
  * and the benefit compounds: every later query with predicates on any
  * prefix-free subset of the z-dimensions reads fewer row groups.
  */
object ZOrder {

  /** Morton key: the low `bits` bits of each column, interleaved — bit `b`
    * of input `k` (of `n`) lands at output bit `b*n + k`, so no two inputs
    * collide and the key stays within a signed long for `n*bits ≤ 63`.
    *
    * Inputs must be non-negative and fit `bits` bits for faithful
    * locality — quantize or rank skewed/signed domains first (values past
    * the range still produce a total order, but high bits of one column
    * then dominate, degrading toward a plain sort).
    */
  def zorderKey(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zorderKey needs at least one column")
    require(cols.size * bits <= 63,
      s"${cols.size} cols × $bits bits overflow a signed long key")
    val n = cols.size
    val terms = for {
      (c, k) <- cols.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)),
      b * n + k)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Write `df` to parquet clustered by the Morton key of `zCols`:
    * range-partitioned so each output task owns a contiguous key span
    * (global clustering, not just per-file), locally sorted within each
    * file so row-group stats are tight too. `filesPerWrite` sizes the
    * range shuffle; pair with `spark.sql.files.maxRecordsPerFile` to cap
    * file size at scale.
    */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                    bits: Int = 16, filesPerWrite: Int = 8): Unit = {
    val keyed = df.withColumn("_zkey", zorderKey(zCols.map(col), bits))
    keyed.repartitionByRange(filesPerWrite, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
      .write.mode("overwrite").parquet(path)
  }

  // ── Range-bucketed front door ([[zorderKey]] requires non-negative
  //    `bits`-bit integers; real layout columns are doubles, dates,
  //    skewed longs) ────────────────────────────────────────────────────

  /** Per-column bucket rank in [0, 2^bits): fixed-width over [lo, hi],
    * clamped to the edge buckets outside it, nulls to 0 (null-first sort
    * semantics). [lo, hi] are layout PARAMETERS, like a partitioning
    * scheme, not data statistics: deterministic, engine-replayable, and
    * stable as data arrives — quantile-adaptive buckets would re-layout
    * history on every refresh.
    */
  private def bucketExpr(c: Column, lo: Double, hi: Double,
                         bits: Int): Column = {
    val maxB = (1L << bits) - 1
    val scaled = floor((c.cast("double") - lit(lo)) / lit(hi - lo) *
      lit(maxB.toDouble)).cast("long")
    coalesce(least(greatest(scaled, lit(0L)), lit(maxB)), lit(0L))
  }

  /** The Morton key of arbitrary-domain columns: bucket each by its
    * [lo, hi], then [[zorderKey]]'s interleave. Needs ≥ 2 columns (one
    * column is a plain sort) and `bits × n ≤ 63` as ever.
    */
  def zkeyExpr(cols: Seq[(Column, Double, Double)], bits: Int = 16): Column = {
    require(cols.size >= 2, "z-order needs at least two columns " +
      "(one column is a plain sort)")
    cols.foreach { case (_, lo, hi) =>
      require(hi > lo, s"bucket range [$lo, $hi] must be non-empty") }
    zorderKey(cols.map { case (c, lo, hi) => bucketExpr(c, lo, hi, bits) },
      bits)
  }

  /** Lay `df` out along the curve and RETURN it (the composable sibling
    * of [[writeZOrdered]]): range-repartition into `numFiles` key ranges,
    * sort within each, drop the key — one Exchange, the same a global
    * sort costs.
    */
  def zorder(df: DataFrame, cols: Seq[(String, Double, Double)],
             numFiles: Int, bits: Int = 16): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val key = zkeyExpr(cols.map { case (c, lo, hi) => (col(c), lo, hi) }, bits)
    df.withColumn("__zkey", key)
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
  }

  /** Driver-side reference of [[zkeyExpr]] for one row — the spec pins
    * the expression against it value by value.
    */
  private[graft] def zkeyReference(values: Seq[Option[Double]],
                                   ranges: Seq[(Double, Double)],
                                   bits: Int): Long = {
    val n = values.size
    val buckets = values.zip(ranges).map {
      case (Some(x), (lo, hi)) =>
        val maxB = (1L << bits) - 1
        val b = math.floor((x - lo) / (hi - lo) * maxB.toDouble).toLong
        math.max(0L, math.min(b, maxB))
      case (None, _) => 0L
    }
    (for {
      b <- 0 until bits; i <- 0 until n
    } yield ((buckets(i) >> b) & 1L) << (b * n + i)).reduce(_ | _)
  }

  /** DuckDB replay of [[zkeyExpr]] over SQL expressions `exprs` (paired
    * with their [lo, hi]): the identical bucket arithmetic and bit
    * terms, for oracle generation.
    */
  def zkeyOracleSql(exprs: Seq[(String, Double, Double)],
                    bits: Int = 16): String = {
    val n = exprs.size
    val maxB = (1L << bits) - 1
    val buckets = exprs.map { case (e, lo, hi) =>
      s"COALESCE(LEAST(GREATEST(CAST(floor((CAST($e AS DOUBLE) - $lo) / " +
        s"${hi - lo} * ${maxB.toDouble}) AS BIGINT), 0), $maxB), 0)"
    }
    val terms = for {
      b <- 0 until bits; i <- 0 until n
    } yield s"(((${buckets(i)} >> $b) & 1) << ${b * n + i})"
    terms.mkString("(", " | ", ")")
  }
}
