package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality audits — the profiling pass a pipeline runs over a new
  * 100 TB delivery before trusting it: functional dependencies,
  * referential integrity, and key-candidate discovery. Complements
  * [[ColumnStats]] (per-column stats) with CROSS-column contracts.
  *
  * All three audits are single-purpose aggregations with map-side
  * partial combine — no windows, no sorts, no driver-side row handling;
  * output sizes are bounded by violation counts or candidate-list
  * length, never by the fact table.
  */
object DataQuality {

  /** Functional-dependency audit: does `determinant` → `dependent` hold?
    * Returns the VIOLATING determinant values — those mapping to more
    * than one distinct dependent value — with their fan-out and row
    * support. Empty result = the dependency holds.
    *
    * Scale shape: one exact distinct-per-group aggregation — Catalyst's
    * two-phase plan shuffles (determinant, dependent) PAIRS (the deduped
    * combinations), never rows; output is only the violations.
    */
  def functionalDependency(df: DataFrame, determinant: Seq[String],
                           dependent: String): DataFrame = {
    require(determinant.nonEmpty, "need at least one determinant column")
    df.groupBy(determinant.map(col): _*)
      .agg(countDistinct(col(dependent)).as("n_dependent"),
        count(lit(1)).as("n_rows"))
      .filter(col("n_dependent") > 1)
  }

  /** Referential-integrity audit: child rows whose `childKey` has no
    * match in `parent.parentKey` (null child keys are NOT orphans — SQL
    * FK semantics). Returns one row per orphaned key value with its row
    * count, so a single hot orphan key reads as one row, not millions.
    *
    * Scale shape: the child side collapses to (key, count) FIRST — one
    * map-side-combined aggregation — then LEFT ANTI joins the parent's
    * deduped key column. Both sides of the anti join are key-sized, not
    * fact-sized; AQE broadcasts the smaller one.
    */
  def orphanKeys(child: DataFrame, childKey: String,
                 parent: DataFrame, parentKey: String): DataFrame = {
    val childKeys = child.filter(col(childKey).isNotNull)
      .groupBy(col(childKey).as("key")).agg(count(lit(1)).as("n_rows"))
    val parentKeys = parent.select(col(parentKey).as("key")).distinct()
    childKeys.join(parentKeys, Seq("key"), "left_anti")
  }

  /** Key-candidate audit over a declared list of column combinations:
    * for each candidate, total rows, distinct combinations, and whether
    * it is a valid primary key (distinct == total AND no nulls in any
    * key column). One aggregation pass per candidate over a column-pruned
    * scan — candidates are audited independently, so Spark schedules
    * them as parallel jobs of narrow scans, and a 50-column table with 3
    * candidates reads only the candidate columns.
    */
  def keyCandidates(df: DataFrame,
                    candidates: Seq[Seq[String]]): DataFrame = {
    require(candidates.nonEmpty, "need at least one candidate combination")
    val spark = df.sparkSession
    val audits = candidates.map { cand =>
      require(cand.nonEmpty, "empty candidate combination")
      val anyNull = cand.map(col(_).isNull).reduce(_ || _)
      df.select(cand.map(col): _*)
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(struct(cand.map(col): _*)).as("n_distinct"),
          coalesce(sum(when(anyNull, 1L).otherwise(0L)), lit(0L))
            .as("n_null_rows"))
        .select(lit(cand.mkString(",")).as("candidate"),
          col("n_rows"), col("n_distinct"), col("n_null_rows"),
          (col("n_distinct") === col("n_rows") && col("n_null_rows") === 0)
            .as("is_key"))
    }
    audits.reduce(_ union _)
  }

  /** Declarative expectations suite (the Deequ/Great-Expectations shape):
    * evaluate a list of named row-level predicates in ONE scan + one
    * single-row aggregation, and report per rule how many rows violate
    * it. A predicate evaluating NULL counts as a violation (an
    * expectation must be provably TRUE — the three-valued-logic trap
    * where `col > 0` silently "passes" null rows is exactly what a data
    * contract exists to catch).
    *
    * Output: (rule, n_rows, n_violations, violation_rate 1e-6-quantized,
    * pass). Scale shape: all rules share one map-side-combined aggregate
    * (k·2 counters per partition); the reshape to one row per rule
    * happens on the single aggregated row.
    */
  def validate(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "validate needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      "rule names must be unique")
    val aggs = count(lit(1)).as("__n") +: rules.zipWithIndex.map {
      case ((_, pred), i) =>
        sum(when(pred, 0L).otherwise(1L)).as(s"__v$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"),
        coalesce(col("__n"), lit(0L)).as("n_rows"),
        coalesce(col(s"__v$i"), lit(0L)).as("n_violations"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.rule"), col("r.n_rows"), col("r.n_violations"),
        (round(col("r.n_violations") * lit(1000000L) /
          greatest(col("r.n_rows"), lit(1L))) / 1e6).as("violation_rate"),
        (col("r.n_violations") === 0L).as("pass"))
  }

  /** DuckDB replay of [[validate]]: one UNION ALL arm per rule over the
    * same table, identical CASE null semantics. `rules` are (name,
    * SQL predicate) pairs that must express the same predicates the
    * Spark call uses.
    */
  def validateOracleSql(table: String,
                        rules: Seq[(String, String)]): String =
    rules.map { case (name, pred) =>
      s"""SELECT '$name' AS rule, COUNT(*) AS n_rows,
         |       CAST(SUM(CASE WHEN $pred THEN 0 ELSE 1 END) AS BIGINT)
         |         AS n_violations,
         |       round(CAST(SUM(CASE WHEN $pred THEN 0 ELSE 1 END)
         |               AS BIGINT) * 1000000
         |             / GREATEST(COUNT(*), 1)) / 1e6 AS violation_rate,
         |       CAST(SUM(CASE WHEN $pred THEN 0 ELSE 1 END) AS BIGINT) = 0
         |         AS pass
         |FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n")
}
