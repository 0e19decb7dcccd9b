package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) history build from a change feed —
  * the warehouse step that turns an event/CDC stream into validity
  * intervals: one row per (key, attribute state) with
  * `[valid_from, valid_to)` bounds and an `is_current` flag. Downstream
  * as-of joins ([[AsOf]]) and point-in-time training-feature lookups
  * consume exactly this shape (Kimball, The Data Warehouse Toolkit,
  * ch. 5 — public methodology).
  *
  * Semantics:
  *  - Changes order per key by (`orderCol`, `tieBreak`) — the tie-break
  *    makes the build partitioning-invariant when two changes share a
  *    timestamp (last writer in tie-break order wins the instant).
  *  - Consecutive rows whose tracked attributes are UNCHANGED collapse
  *    into one interval (a CDC feed re-stating the same value is a
  *    no-op, not a new version).
  *  - `valid_to` = next change's `valid_from`; null on the current row.
  *
  * Scale shape: two keyed windows over the same (key, order) partitioning
  * — Catalyst plans ONE Exchange + ONE sort for both — then a filter.
  * No joins, no global window; parallelism follows key cardinality.
  */
object Scd {

  /** Build the Type-2 history. Output: keyCols*, attrCols*,
    * (valid_from, valid_to, is_current) — one row per retained version.
    */
  def scd2(changes: DataFrame, keyCols: Seq[String], orderCol: String,
           tieBreak: String, attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty,
      "scd2 needs at least one key column and one tracked attribute")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol).asc, col(tieBreak).asc)
    val state = struct(attrCols.map(col): _*)
    // a version row survives iff its state differs from the previous
    // change's state (the first change per key always survives)
    val versioned = changes
      .withColumn("__changed", !(lag(state, 1).over(w) <=> state))
      .filter(col("__changed"))
    // valid_to comes from the NEXT retained version — same partitioning,
    // so the second window reuses the first's Exchange
    versioned
      .withColumn("valid_to", lead(col(orderCol), 1).over(w))
      .select(keyCols.map(col) ++ attrCols.map(col) ++ Seq(
        col(orderCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current")): _*)
  }

  /** The same build as ANSI SQL for a DuckDB oracle (identical window
    * algebra; interpolated column lists must match the Spark call).
    */
  def scd2OracleSql(table: String, keyCols: Seq[String], orderCol: String,
                    tieBreak: String, attrCols: Seq[String]): String = {
    val keys = keyCols.mkString(", ")
    val attrs = attrCols.mkString(", ")
    val state = if (attrCols.size == 1) attrCols.head
                else s"ROW(${attrCols.mkString(", ")})"
    s"""WITH ordered AS (
       |  SELECT $keys, $attrs, $orderCol, $tieBreak,
       |         LAG($state) OVER (PARTITION BY $keys
       |                           ORDER BY $orderCol, $tieBreak) AS prev
       |  FROM $table
       |), versioned AS (
       |  SELECT $keys, $attrs, $orderCol, $tieBreak FROM ordered
       |  WHERE prev IS DISTINCT FROM $state
       |)
       |SELECT $keys, $attrs, $orderCol AS valid_from,
       |       LEAD($orderCol) OVER (PARTITION BY $keys
       |                             ORDER BY $orderCol, $tieBreak) AS valid_to,
       |       LEAD($orderCol) OVER (PARTITION BY $keys
       |                             ORDER BY $orderCol, $tieBreak) IS NULL
       |         AS is_current
       |FROM versioned""".stripMargin
  }

  /** Point-in-time lookup — each fact row picks up the dimension version
    * ACTIVE at its timestamp (`valid_from <= ts < valid_to`, open-ended
    * current version included): the training-feature / reporting join
    * that [[scd2]]'s history exists to serve, leakage-free by
    * construction (a fact can never see a version that began after it).
    *
    * Implementation: ONE backward as-of join on `valid_from`
    * ([[AsofJoin.asofJoin]] — union-tag + keyed window, no join nodes,
    * one Exchange), then a guard that nulls the match when the fact
    * falls at-or-past that version's `valid_to`. For the gap-free
    * histories [[scd2]] builds the guard never fires (each version ends
    * exactly where the next begins); it exists for histories with
    * deletion gaps, where a between-versions fact must match NOTHING
    * rather than a stale predecessor. The guard is MATERIALIZED before
    * any filled column is overwritten — the first column nulled is the
    * interval bound the predicate reads (the batch as-of's own
    * staleness-ordering discipline).
    *
    * Output: every fact column + `prefix`valid_from, `prefix`valid_to,
    * `prefix`<attr> per tracked attribute (all null when no version is
    * active at the fact's instant).
    */
  def pointInTimeLookup(facts: DataFrame, history: DataFrame,
                        keys: Seq[String], tsCol: String,
                        attrCols: Seq[String],
                        prefix: String = "pit_"): DataFrame = {
    // valid_to is GENUINELY null on the open current version, and the
    // as-of fill is last-non-null — filling it raw would backfill a
    // PREDECESSOR'S end bound onto the current version and kill every
    // match past it. Encode openness as a non-null pair (flag + bound
    // with a same-type placeholder when open) so the fill always carries
    // the matched version's own values, then decode after the guard.
    val h = history
      .withColumn("__vt_open", col("valid_to").isNull)
      .withColumn("__vt", coalesce(col("valid_to"), col("valid_from")))
    val filled = AsofJoin.asofJoin(facts, h, keys,
      probeTs = tsCol, stateTs = "valid_from",
      stateVals = attrCols ++ Seq("__vt", "__vt_open"), prefix = prefix)
    val guarded = filled.withColumn("__pit_dead", coalesce(
      col(s"${prefix}__vt_open") === false &&
        col(tsCol) >= col(s"${prefix}__vt"), lit(false)))
    val decoded = guarded.withColumn(s"${prefix}valid_to",
      when(col(s"${prefix}__vt_open"), lit(null)).otherwise(col(s"${prefix}__vt")))
    (s"${prefix}valid_from" +: s"${prefix}valid_to" +:
      attrCols.map(prefix + _)).foldLeft(decoded)((df, c) =>
        df.withColumn(c, when(col("__pit_dead"), lit(null)).otherwise(col(c))))
      .drop("__pit_dead", s"${prefix}__vt", s"${prefix}__vt_open")
  }

  /** Apply a CDC change stream to produce the CURRENT snapshot — the
    * "MERGE INTO, latest writer wins" materialization (the batch half of
    * every Debezium/CDC ingestion): per key, order changes by
    * (`orderCol`, `tieBreak`), keep the LAST row, and drop the key
    * entirely when that last operation is the delete tombstone. Where
    * [[scd2]] keeps the full version history, this keeps only the live
    * end state — the table a serving layer actually reads.
    *
    * One keyed window (order desc, rn = 1) + one filter; the tie-break
    * makes last-writer-wins a TOTAL order, so the snapshot is a pure
    * function of the change multiset (partitioning/engine-invariant).
    * Output: keyCols*, valCols*, `orderCol` (the winning change's
    * instant).
    */
  def applyChanges(changes: DataFrame, keyCols: Seq[String],
                   orderCol: String, tieBreak: String,
                   opCol: String, deleteOp: String,
                   valCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && valCols.nonEmpty,
      "applyChanges needs at least one key column and one value column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol).desc, col(tieBreak).desc)
    changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= deleteOp)
      .select(keyCols.map(col) ++ valCols.map(col) :+ col(orderCol): _*)
  }

  /** [[applyChanges]]'s DuckDB replay (identical window + tombstone
    * filter). `changesSql` must select keyCols, valCols, orderCol,
    * tieBreak, and opCol.
    */
  def applyChangesOracleSql(changesSql: String, keyCols: Seq[String],
                            orderCol: String, tieBreak: String,
                            opCol: String, deleteOp: String,
                            valCols: Seq[String]): String = {
    val keys = keyCols.mkString(", ")
    val vals = valCols.mkString(", ")
    s"""WITH c AS (
       |$changesSql
       |), ranked AS (
       |  SELECT $keys, $vals, $orderCol, $opCol,
       |         ROW_NUMBER() OVER (PARTITION BY $keys
       |           ORDER BY $orderCol DESC, $tieBreak DESC) AS rn
       |  FROM c
       |)
       |SELECT $keys, $vals, $orderCol
       |FROM ranked WHERE rn = 1 AND $opCol <> '$deleteOp'""".stripMargin
  }

  /** [[pointInTimeLookup]]'s DuckDB replay: the BETWEEN-semantics left
    * join over a history CTE — a formulation deliberately DIFFERENT from
    * the engine's as-of window (interval-membership join vs latest-fill),
    * so agreement checks the semantics, not the implementation.
    * `factsSql` must select the fact columns incl. `tsExpr AS <tsCol>`.
    */
  def pointInTimeOracleSql(factsSql: String, historySql: String,
                           keys: Seq[String], tsCol: String,
                           attrCols: Seq[String],
                           prefix: String = "pit_"): String = {
    val on = keys.map(k => s"f.$k = h.$k").mkString(" AND ")
    val sel = (Seq("valid_from", "valid_to") ++ attrCols)
      .map(c => s"h.$c AS $prefix$c").mkString(", ")
    s"""WITH h AS (
       |$historySql
       |), f AS (
       |$factsSql
       |)
       |SELECT f.*, $sel
       |FROM f LEFT JOIN h
       |  ON $on AND h.valid_from <= f.$tsCol
       |     AND (h.valid_to IS NULL OR f.$tsCol < h.valid_to)""".stripMargin
  }

  /** Snapshot diff — the data-versioning audit between two keyed corpus
    * snapshots: every key classified `added` / `removed` / `changed` /
    * `unchanged` by a null-safe compare of the tracked columns. The
    * between-snapshots complement of [[scd2]]'s within-feed history.
    *
    * Scale shape: each side collapses to (key, 16-byte md5 fingerprint)
    * AT THE SCAN — the full-outer join ships fingerprints, never the
    * payload (on a document corpus that is ~32 bytes/row instead of
    * kilobytes). One co-partitioned shuffle on the key; no broadcast
    * assumption, so both snapshots may be corpus-scale. Nulls map to a
    * U+0002 sentinel inside the fingerprint preimage and column
    * boundaries to U+0001, so null never collides with "" or any
    * ordinary string and ("ab", "") never collides with ("a", "b") —
    * a collision requires the payload itself to contain those control
    * characters (strip or escape them upstream if a corpus can).
    *
    * @return keyCols* + `status` — one row per key present in either side
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty,
      "snapshotDiff needs at least one key column and one compare column")
    def fp(df: DataFrame, name: String) =
      df.select(keyCols.map(col) :+
        md5(concat_ws("\u0001", compareCols.map(c =>
          coalesce(col(c).cast("string"), lit("\u0002"))): _*)).as(name): _*)
    fp(oldSnap, "__fp_old").join(fp(newSnap, "__fp_new"), keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("__fp_old").isNull, lit("added"))
          .when(col("__fp_new").isNull, lit("removed"))
          .when(col("__fp_old") =!= col("__fp_new"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"): _*)
  }
}
