package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * the way pandas merge_asof's tolerance does: state further from the
  * probe than `tolerance` (in the match direction) is treated as absent
  * (nulls), not matched.
  *
  * `direction`: "backward" (default — state at or before the probe) or
  * "forward" (state at or after — the next scheduled price, the following
  * maintenance window); [[asofJoinNearest]] picks whichever side is
  * closer, pandas `merge_asof(direction="nearest")`, still in one shuffle.
  *
  * Returns every probe column plus `prefix + stateTs` and `prefix + v` for
  * each requested state column (null when no state row matches).
  */
object AsofJoin {

  /** Union-tagged frame: probes (side 1, original row as `__probe`) and
    * state (side 0, its ts/values under `prefix`) share one schema, ready
    * for directional window fills. Returns (frame, filled column names).
    */
  private def tagged(probes: DataFrame, state: DataFrame, keys: Seq[String],
                     probeTs: String, stateTs: String, stateVals: Seq[String],
                     prefix: String): (DataFrame, Seq[String]) = {
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
    (p.unionByName(s), (prefix + stateTs) +: stateVals.map(prefix + _))
  }

  /** Directional keyed window: backward scans time ascending (carry the
    * last state at-or-before), forward scans DESCENDING (carry the last
    * state at-or-after). `__side` stays ascending so a state row stamped
    * exactly at probe time is visible either way (inclusive).
    */
  private def dirWindow(keys: Seq[String], backward: Boolean) =
    Window.partitionBy(keys.map(col): _*)
      .orderBy(if (backward) col("__ts").asc else col("__ts").desc,
        col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Out-of-tolerance predicate for a filled state-ts column. */
  private def staleCheck(filledTs: Column, backward: Boolean, t: String): Column =
    if (backward) filledTs < col("__ts") - expr(s"INTERVAL $t")
    else filledTs > col("__ts") + expr(s"INTERVAL $t")

  def asofJoin(probes: DataFrame, state: DataFrame, keys: Seq[String],
               probeTs: String = "ts", stateTs: String = "ts",
               stateVals: Seq[String] = Seq("value"),
               prefix: String = "asof_",
               tolerance: Option[String] = None,
               direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward").contains(direction),
      s"direction=$direction: backward | forward (nearest = asofJoinNearest)")
    val backward = direction == "backward"
    val (u, filledCols) =
      tagged(probes, state, keys, probeTs, stateTs, stateVals, prefix)
    val w = dirWindow(keys, backward)
    val filled = u
      .select(col("__ts") +: col("__side") +: col("__probe") +:
        filledCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__side") === 1)
    val bounded = tolerance.fold(filled) { t =>
      // staleness must be decided BEFORE any filled column is overwritten:
      // nulling asof_ts first would blind the check for the value columns
      val withStale = filled.withColumn("__stale",
        staleCheck(col(prefix + stateTs), backward, t))
      filledCols.foldLeft(withStale)((df, c) =>
        df.withColumn(c, when(col("__stale"), lit(null)).otherwise(col(c))))
    }
    bounded.select(col("__probe.*") +: filledCols.map(col): _*)
  }

  /** Nearest as-of: each probe takes whichever state row — latest before
    * or earliest after — sits closer in time (ties go backward, matching
    * pandas). Both directional fills run over the SAME union-tagged frame
    * and key partitioning, so the plan is still one Exchange (two sorts,
    * no join nodes). `tolerance` bounds distance on each side before the
    * choice, so a near-but-out-of-tolerance side never wins.
    */
  def asofJoinNearest(probes: DataFrame, state: DataFrame, keys: Seq[String],
                      probeTs: String = "ts", stateTs: String = "ts",
                      stateVals: Seq[String] = Seq("value"),
                      prefix: String = "asof_",
                      tolerance: Option[String] = None): DataFrame = {
    val (u, filledCols) =
      tagged(probes, state, keys, probeTs, stateTs, stateVals, prefix)
    val (wB, wF) = (dirWindow(keys, backward = true),
      dirWindow(keys, backward = false))
    val both = u
      .select(col("__ts") +: col("__side") +: col("__probe") +:
        (filledCols.map(c =>
          last(col(c), ignoreNulls = true).over(wB).as(s"__b_$c")) ++
         filledCols.map(c =>
          last(col(c), ignoreNulls = true).over(wF).as(s"__f_$c"))): _*)
      .filter(col("__side") === 1)
    val bounded = tolerance.fold(both) { t =>
      // materialize both stale flags BEFORE any null-out: the first nulled
      // column is the filled ts itself, which the predicates read
      val flagged = both
        .withColumn("__b_stale",
          staleCheck(col(s"__b_$prefix$stateTs"), backward = true, t))
        .withColumn("__f_stale",
          staleCheck(col(s"__f_$prefix$stateTs"), backward = false, t))
      val nb = filledCols.foldLeft(flagged)((df, c) => df.withColumn(s"__b_$c",
        when(col("__b_stale"), lit(null)).otherwise(col(s"__b_$c"))))
      filledCols.foldLeft(nb)((df, c) => df.withColumn(s"__f_$c",
        when(col("__f_stale"), lit(null)).otherwise(col(s"__f_$c"))))
    }
    val bTs = col(s"__b_$prefix$stateTs")
    val fTs = col(s"__f_$prefix$stateTs")
    // epoch-seconds distance works for timestamp and numeric ts alike;
    // ties choose backward (pandas' nearest contract)
    val chooseB = fTs.isNull || (bTs.isNotNull &&
      (col("__ts").cast("double") - bTs.cast("double") <=
        fTs.cast("double") - col("__ts").cast("double")))
    bounded.select(col("__probe.*") +:
      filledCols.map(c =>
        when(chooseB, col(s"__b_$c")).otherwise(col(s"__f_$c")).as(c)): _*)
  }
}
