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
}
