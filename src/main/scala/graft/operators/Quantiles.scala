package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Group-wise quantiles — the distribution-shape summary a data pipeline
  * computes over document lengths, quality scores, and metric values.
  *
  * Two paths, one semantics:
  *
  *  - [[groupQuantilesExact]] — Spark's exact `percentile` aggregate
  *    (rank `p*(n-1)`, linear interpolation — the same definition as
  *    DuckDB's `quantile_cont` and numpy's default, which is what makes it
  *    oracle-checkable). Exact percentile buffers each group's value
  *    multiset on the reducer, so it is the small-group / verification
  *    path.
  *  - [[groupQuantilesApprox]] — `percentile_approx` (Greenwald–Khanna
  *    sketch): bounded memory per group, mergeable partial aggregates
  *    (map-side combine works), the ONLY viable shape at 100 TB where one
  *    group can hold billions of rows. Accuracy is 1/accuracy quantile
  *    error, spec-pinned against the exact path.
  *
  * Bitwise determinism contract for the exact path: quantize values to
  * integers first (`round(v * scale)`) and use binary-exact probabilities
  * (quarters, eighths…). Then `p*(n-1)` splits into an integer rank and an
  * exact-binary fraction `d`, and BOTH interpolation algebras in use —
  * Spark's `lo*(1-d) + hi*d` and DuckDB's `lo + d*(hi-lo)` — evaluate to
  * the same exact rational, hence the same double. Arbitrary `p` (0.95)
  * or raw doubles can differ in the last ulp between the two algebras.
  */
object Quantiles {

  /** The binary-exact probability ladder used by the oracle-checked query. */
  val QuarterProbs: Seq[Double] = Seq(0.25, 0.5, 0.75)

  private def quantized(v: Column, scale: Double): Column = round(v * scale)

  /** Exact per-group quantiles of `round(value*scale)/scale`, one column
    * per probability (`p25`, `p50`, `p75`…). `probs` must be binary-exact
    * fractions for the cross-engine bitwise guarantee (see object doc).
    */
  def groupQuantilesExact(df: DataFrame, groupCols: Seq[String], value: Column,
                          probs: Seq[Double] = QuarterProbs,
                          scale: Double = 1000.0): DataFrame = {
    val v = quantized(value, scale)
    val aggs = count(lit(1)).as("cnt") +:
      probs.map(p => (percentile(v, lit(p)) / scale).as(probName(p)))
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Sketch-based per-group quantiles — the at-scale path. Same output
    * shape as [[groupQuantilesExact]]; `accuracy` trades memory for
    * quantile error ≤ 1/accuracy.
    */
  def groupQuantilesApprox(df: DataFrame, groupCols: Seq[String], value: Column,
                           probs: Seq[Double] = QuarterProbs,
                           scale: Double = 1000.0,
                           accuracy: Int = 10000): DataFrame = {
    val v = quantized(value, scale)
    val aggs = count(lit(1)).as("cnt") +:
      probs.map(p => (percentile_approx(v, lit(p), lit(accuracy)) / scale)
        .as(probName(p)))
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-group winsorization — clip values into the group's
    * [loP, hiP] exact-quantile band, the outlier treatment that (unlike
    * dropping) keeps row counts and (unlike mean-imputation) keeps rank
    * order. Defaults clip at the 1/16 and 15/16 quantiles ("hexadecile"
    * winsorization): binary-exact probs, so the bounds — and therefore
    * the clipped values — are bitwise-identical across engines (see
    * object doc; 5%/95% would differ in the last ulp between
    * interpolation algebras).
    *
    * Two passes over the input (quantiles cannot stream): a per-group
    * exact-percentile aggregate (bounded: one row per group), broadcast
    * back onto the fact scan, then a codegen'd `least/greatest` clip. At
    * scale swap the bounds frame to [[groupQuantilesApprox]]'s sketch —
    * same join shape. Output keeps every input column, adds the clipped
    * `<value>_w`, the group bounds `lo`/`hi`, and a `clipped` flag.
    */
  def winsorize(df: DataFrame, groupCols: Seq[String], value: String,
                loP: Double = 0.0625, hiP: Double = 0.9375,
                scale: Double = 1000.0): DataFrame = {
    require(groupCols.nonEmpty, "winsorize needs at least one group column")
    require(loP > 0 && hiP < 1 && loP < hiP,
      s"need 0 < loP < hiP < 1, got ($loP, $hiP)")
    val v = quantized(col(value), scale)
    val bounds = df.groupBy(groupCols.map(col): _*).agg(
      (percentile(v, lit(loP)) / scale).as("lo"),
      (percentile(v, lit(hiP)) / scale).as("hi"))
    df.join(broadcast(bounds), groupCols)
      .withColumn(s"${value}_w",
        least(greatest(col(value), col("lo")), col("hi")))
      .withColumn("clipped", col(value) < col("lo") || col(value) > col("hi"))
  }

  /** `0.25 -> p25`, `0.5 -> p50`, `0.125 -> p12_5`, `0.0625 -> p6_25`.
    * Binary-exact fractions have terminating (and short) decimal
    * expansions, so the name is exact — the fractional part, when present,
    * joins with `_` to stay a legal column identifier. Anything that needs
    * more than a few decimal digits is not a binary-exact prob and is
    * rejected, keeping the bitwise contract visible at the naming layer.
    */
  private def probName(p: Double): String = {
    val dec = java.math.BigDecimal.valueOf(p * 100).stripTrailingZeros
    require(dec.scale <= 4,
      s"prob $p is not a binary-exact fraction (quarters, eighths, …)")
    s"p${dec.toPlainString.replace('.', '_')}"
  }

  /** Fit k equi-population bin edges — the "fit" half of the
    * fit/transform feature-binning pattern (quantile bucketing a model
    * pipeline freezes once and applies for weeks). Edges are the i/k
    * quantiles (i = 1..k−1) of `round(value·scale)/scale`; k must be a
    * power of two ≤ 256 so every prob is binary-exact and the edges are
    * bitwise-identical across engines (object doc / q45's contract).
    * The k−1 doubles are a bounded driver collect, exactly like
    * [[IVF]]'s k×dim centroid pull — made to be persisted
    * ([[saveBins]]/[[loadBins]]) and embedded as literals at apply time.
    */
  def fitBins(df: DataFrame, value: Column, k: Int = 8,
              scale: Double = 1000.0): Array[Double] = {
    require(k >= 2 && k <= 256 && (k & (k - 1)) == 0,
      s"k must be a power of two in [2, 256], got $k")
    val v = quantized(value, scale)
    val aggs = (1 until k).map(i =>
      (percentile(v, lit(i.toDouble / k)) / scale).as(s"e$i"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    (0 until k - 1).map(row.getDouble).toArray
  }

  /** Persist fitted edges: (idx, edge) parquet, the catalog artifact the
    * whole feature pipeline shares. */
  def saveBins(spark: org.apache.spark.sql.SparkSession,
               edges: Array[Double], path: String): Unit = {
    import spark.implicits._
    edges.zipWithIndex.map { case (e, i) => (i, e) }.toSeq
      .toDF("idx", "edge").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load edges persisted by [[saveBins]]; fails fast on an empty or
    * unordered store rather than silently mis-binning. */
  def loadBins(spark: org.apache.spark.sql.SparkSession,
               path: String): Array[Double] = {
    val edges = spark.read.parquet(path).orderBy("idx")
      .select("edge").collect().map(_.getDouble(0))
    require(edges.nonEmpty, s"no bin edges found at $path")
    require(edges.sameElements(edges.sorted),
      s"bin edges at $path are not monotone — corrupt store")
    edges
  }

  /** Apply fitted edges: `bucket` = number of edges ≤ value, a pure
    * scan-side expression over the edge-literal array (zero joins, zero
    * shuffle — the transform half is free at any scale). Buckets run
    * 0..k−1; rows below every edge land in 0, above every edge in k−1.
    */
  def applyBins(df: DataFrame, value: Column, edges: Array[Double],
                as: String = "bucket"): DataFrame = {
    require(edges.nonEmpty, "applyBins needs at least one edge")
    df.withColumn(as,
      size(filter(lit(edges), e => value.cast("double") >= e)).cast("long"))
  }
}
