package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional data skipping
  * for 100 TB tables. A table range-partitioned and sorted on ONE column
  * prunes scans filtered on that column and nothing else; interleaving
  * the bits of SEVERAL columns' bucket ranks into one curve key and
  * laying the table out along it makes every output file cover a small
  * HYPER-RECTANGLE of the combined space, so parquet footer min/max
  * statistics prune scans filtered on ANY of the participating columns
  * (the layout behind ZORDER BY in modern lakehouse formats; Morton
  * 1966).
  *
  * Everything is a pure scan-side expression (bucket rank → bit
  * interleave, `floor`/`shiftleft`/`bitwiseOR` inside whole-stage
  * codegen) plus ONE range repartition on the key — the same shuffle a
  * plain global sort would pay, buying pruning on every dimension
  * instead of one.
  *
  * Bucketing is fixed-width over caller-supplied [lo, hi] per column —
  * layout PARAMETERS, like a partitioning scheme, not data statistics:
  * deterministic, engine-replayable (the oracle recomputes keys
  * bitwise), and stable as data arrives (quantile-adaptive buckets would
  * re-layout history on every refresh). Values outside [lo, hi] clamp to
  * the edge buckets; nulls rank lowest (bucket 0 — matching null-first
  * sort semantics).
  */
object ZOrder {

  /** Per-column bucket rank in [0, 2^bits): fixed-width over [lo, hi],
    * clamped, nulls to 0.
    */
  private def bucketExpr(c: Column, lo: Double, hi: Double,
                         bits: Int): Column = {
    val maxB = (1L << bits) - 1
    val scaled = floor((c.cast("double") - lit(lo)) / lit(hi - lo) *
      lit(maxB.toDouble)).cast("long")
    coalesce(least(greatest(scaled, lit(0L)), lit(maxB)), lit(0L))
  }

  /** The Morton key of `cols` (each with its [lo, hi] bucket range): bit
    * b of column i lands at position `b * n + i`, so the key fills the
    * low `bits × n` bits — `bits × n` must stay ≤ 63 (signed long).
    */
  def zkeyExpr(cols: Seq[(Column, Double, Double)], bits: Int = 16): Column = {
    require(cols.size >= 2, "z-order needs at least two columns " +
      "(one column is a plain sort)")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits ($bits) x columns (${cols.size}) must fit a signed long")
    cols.foreach { case (_, lo, hi) =>
      require(hi > lo, s"bucket range [$lo, $hi] must be non-empty") }
    val n = cols.size
    val buckets = cols.map { case (c, lo, hi) => bucketExpr(c, lo, hi, bits) }
    val terms = for {
      b <- 0 until bits; (bk, i) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(bk, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Lay `df` out along the curve: range-repartition into `numFiles`
    * key ranges and sort within each, so a `.write.parquet` of the
    * result produces one tight hyper-rectangle of footer stats per file.
    * One shuffle — the same Exchange a global sort costs.
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
