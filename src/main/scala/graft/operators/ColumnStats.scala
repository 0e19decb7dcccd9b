package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table statistics collection — the ANALYZE-TABLE half of a query engine:
  * per-column row/null/distinct counts and min/max, the numbers a
  * cost-based optimizer (and any data-quality gate) feeds on.
  *
  * One pass over the data: all per-column aggregates run in a single
  * `agg` (multiple exact distincts cost one Expand — k× the scan rows
  * before partial aggregation, the standard Spark multi-distinct plan),
  * then the single result row is unpivoted driver-free with `stack`. At
  * corpus scale flip `exact = false`: `approx_count_distinct`'s HLL++
  * sketches are mergeable and one-pass WITHOUT the Expand blow-up, the
  * trade every warehouse's ANALYZE makes.
  *
  * min/max are rendered as strings so one tidy frame covers heterogeneous
  * column types (the consumer is a catalog, not arithmetic).
  */
object ColumnStats {

  def collect(df: DataFrame, cols: Seq[String], exact: Boolean = true)
      : DataFrame = {
    require(cols.nonEmpty, "columnStats needs at least one column")
    val ndv: String => org.apache.spark.sql.Column =
      if (exact) c => countDistinct(col(c))
      else c => approx_count_distinct(col(c))
    val aggs = cols.flatMap(c => Seq(
      (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
      ndv(c).as(s"${c}__ndv"),
      min(col(c)).cast("string").as(s"${c}__min"),
      max(col(c)).cast("string").as(s"${c}__max")))
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__nulls`, `${c}__ndv`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    one.select(col("__n").as("n_rows"),
      expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_nulls, n_distinct, min_str, max_str)"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_str"), col("max_str"))
  }
}
