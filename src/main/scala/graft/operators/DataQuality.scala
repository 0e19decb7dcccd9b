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
}
