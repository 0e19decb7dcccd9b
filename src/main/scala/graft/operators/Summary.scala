package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view pattern that
  * keeps a 100 TB metrics rollup fresh without ever rescanning history:
  * per-key summaries carry ALGEBRAIC state (count, sum, min, max, sum of
  * squares) instead of finished answers, so a new batch folds in with a
  * summary-sized merge (`merge(summarize(history), summarize(batch)) =
  * summarize(history ∪ batch)`, exactly). The derived metrics (mean,
  * variance) are computed only at read time by [[finalizeSummary]].
  *
  * Exactness contract (the engine-wide replay discipline of
  * [[graft.queries.Queries]]): values are cent-quantized per row; sums of
  * integer-valued doubles are exact in any accumulation order up to 2⁵³,
  * then land in longs. The sum-of-squares bound is tighter — Σ(cents²) ≤
  * 2⁵³ means ~9e15, i.e. 1e8 rows of $1,000 values per key; past that,
  * re-quantize the unit (dollars instead of cents) — the merge algebra is
  * scale-invariant. Derived mean/variance divide ONCE at finalize, in a
  * fixed parenthesization over the moments cast to double, so engines
  * replay them bitwise.
  *
  * Scale shape: [[summarize]] is one map-side-combined hash aggregation
  * (the only fact-scale pass); [[mergeSummaries]] touches summary-sized
  * frames only — cost independent of history size, the same generational
  * economics as [[DedupState]]. Persist summaries with
  * [[TableMerge.upsertPartitioned]] to get partition-scoped refresh on
  * disk.
  */
object Summary {

  private val state = Seq("n", "sum_cents", "min_cents", "max_cents", "ssq")

  /** One algebraic summary row per key: (keys…, n, sum_cents, min_cents,
    * max_cents, ssq). Null values are excluded from every accumulator
    * (n counts non-null rows), matching SQL aggregate semantics.
    */
  def summarize(df: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    require(keys.nonEmpty, "summarize needs at least one key column")
    val c = round(value * 100)
    df.groupBy(keys.map(col): _*)
      .agg(count(c).as("n"),
        coalesce(sum(c), lit(0.0)).cast("long").as("sum_cents"),
        min(c).cast("long").as("min_cents"),
        max(c).cast("long").as("max_cents"),
        coalesce(sum(c * c), lit(0.0)).cast("long").as("ssq"))
  }

  /** Fold any number of summaries into one: per-key algebraic combine.
    * Keys present in only some inputs pass through unchanged (a new key
    * appearing in a batch simply starts its state). Associative and
    * commutative by construction — `merge(merge(a,b),c)` ≡
    * `merge(a,b,c)` ≡ `summarize` of the union.
    */
  def mergeSummaries(keys: Seq[String], summaries: DataFrame*): DataFrame = {
    require(keys.nonEmpty, "mergeSummaries needs at least one key column")
    require(summaries.nonEmpty, "mergeSummaries needs at least one summary")
    summaries.foreach { s =>
      val missing = (keys ++ state).filterNot(s.columns.contains)
      require(missing.isEmpty,
        s"summary frame is missing column(s): ${missing.mkString(", ")}")
    }
    summaries.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("sum_cents")).as("sum_cents"),
        min(col("min_cents")).as("min_cents"),
        max(col("max_cents")).as("max_cents"),
        sum(col("ssq")).as("ssq"))
  }

  /** Read-time metrics over a summary: mean and population variance in
    * original units, 1e-6-quantized; min/max presented in units. Groups
    * whose accumulators saw no values (n = 0 after a null-only batch)
    * report null mean/variance. The variance form `(ssq·n − sum²)/n²`
    * divides exactly once — numerator and denominator are the moments
    * cast to double in a fixed parenthesization, the [[ColumnStats]]
    * replay discipline.
    */
  def finalizeSummary(summary: DataFrame, keys: Seq[String]): DataFrame = {
    val n = col("n").cast("double")
    val s = col("sum_cents").cast("double")
    val q = col("ssq").cast("double")
    summary.select(keys.map(col) :+ col("n") :+
      when(col("n") > 0, round(s / n / 100.0, 6)).as("mean") :+
      when(col("n") > 0, round((q * n - s * s) / (n * n) / 10000.0, 6))
        .as("variance") :+
      (col("min_cents") / 100.0).as("min_v") :+
      (col("max_cents") / 100.0).as("max_v"): _*)
  }

  /** DuckDB replay of `finalizeSummary(summarize(table))` — the direct
    * one-pass form the split/merge composition must equal bitwise.
    */
  def summaryOracleSql(table: String, keys: Seq[String],
                       valueSql: String): String = {
    val ks = keys.mkString(", ")
    s"""WITH c AS (
       |  SELECT $ks, ROUND(($valueSql)*100) AS c
       |  FROM $table
       |), s AS (
       |  SELECT $ks, COUNT(c) AS n,
       |         CAST(COALESCE(SUM(c), 0) AS BIGINT) AS sc,
       |         CAST(MIN(c) AS BIGINT) AS mn,
       |         CAST(MAX(c) AS BIGINT) AS mx,
       |         CAST(COALESCE(SUM(c*c), 0) AS BIGINT) AS q
       |  FROM c GROUP BY $ks
       |)
       |SELECT $ks, n,
       |       CASE WHEN n > 0 THEN ROUND(CAST(sc AS DOUBLE)
       |              / CAST(n AS DOUBLE) / 100.0, 6) END AS mean,
       |       CASE WHEN n > 0 THEN ROUND(
       |              (CAST(q AS DOUBLE) * CAST(n AS DOUBLE)
       |               - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
       |              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
       |              / 10000.0, 6) END AS variance,
       |       mn/100.0 AS min_v, mx/100.0 AS max_v
       |FROM s""".stripMargin
  }
}
