package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join — each probe row picks up the most recent state row for its
  * key at or before its timestamp (prices as-of a trade, meter state as-of
  * a reading). Spark has no built-in; the naive formulations are a range
  * join (O(probes × state) per key) or a per-row subquery. This is the
  * scalable shape:
  *
  *  1. union-tag probe and state rows into one frame (state side = 0,
  *     probe side = 1);
  *  2. one window pass per key ordered by (ts, side): `last(col,
  *     ignoreNulls)` over rows-unbounded-preceding fills every probe row
  *     with the latest state values at or before it — state sorts BEFORE
  *     probes at equal ts, so a state row stamped exactly at probe time is
  *     visible (inclusive as-of);
  *  3. keep the probe side, unpack.
  *
  * Cost: ONE shuffle on the keys + one sort per partition — no join node
  * in the plan at all (asserted in PlanShapeSpec). 100 TB: scales with key
  * cardinality like any keyed window; a single pathologically hot key
  * serializes its own partition — the standard as-of limitation — split
  * such keys upstream (e.g. time-bucket the key) if one key dominates.
  *
  * Contract: duplicate state rows at the same (key, ts) have no defined
  * winner — collapse them first (`groupBy(key, ts).agg(...)`) for
  * deterministic output.
  *
  * `tolerance` (an interval literal body, e.g. "2 hours") bounds staleness
  * the way pandas merge_asof's tolerance does: state older than
  * `probe ts − tolerance` is treated as absent (nulls), not matched.
  *
  * Returns every probe column plus `prefix + stateTs` and `prefix + v` for
  * each requested state column (null when no state row precedes the probe).
  */
object AsofJoin {

  def asofJoin(probes: DataFrame, state: DataFrame, keys: Seq[String],
               probeTs: String = "ts", stateTs: String = "ts",
               stateVals: Seq[String] = Seq("value"),
               prefix: String = "asof_",
               tolerance: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val reserved = Set("__ts", "__side", "__probe", "__stale") ++
      ((prefix + stateTs) +: stateVals.map(prefix + _))
    val clash = (probes.columns ++ state.columns).toSet.intersect(reserved)
    require(clash.isEmpty,
      s"as-of join reserves these column names: ${clash.mkString(", ")} — " +
        "rename them (or pick another prefix) before joining")
    val probeStruct = StructType(probes.schema.fields)
    val p = probes.select(
      keys.map(col) ++ Seq(
        col(probeTs).as("__ts"), lit(1).as("__side"),
        struct(probes.columns.map(col).toIndexedSeq: _*).as("__probe"),
        lit(null).cast(state.schema(stateTs).dataType).as(prefix + stateTs)) ++
        stateVals.map(v =>
          lit(null).cast(state.schema(v).dataType).as(prefix + v)): _*)
    val s = state.select(
      keys.map(col) ++ Seq(
        col(stateTs).as("__ts"), lit(0).as("__side"),
        lit(null).cast(probeStruct).as("__probe"),
        col(stateTs).as(prefix + stateTs)) ++
        stateVals.map(v => col(v).as(prefix + v)): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filledCols = (prefix + stateTs) +: stateVals.map(prefix + _)
    val filled = p.unionByName(s)
      .select(col("__ts") +: col("__side") +: col("__probe") +:
        filledCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__side") === 1)
    val bounded = tolerance.fold(filled) { t =>
      // staleness must be decided BEFORE any filled column is overwritten:
      // nulling asof_ts first would blind the check for the value columns
      val withStale = filled.withColumn("__stale",
        col(prefix + stateTs) < col("__ts") - expr(s"INTERVAL $t"))
      filledCols.foldLeft(withStale)((df, c) =>
        df.withColumn(c, when(col("__stale"), lit(null)).otherwise(col(c))))
    }
    bounded.select(col("__probe.*") +: filledCols.map(col): _*)
  }
}
