package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization over event streams: densify an irregular
  * series onto a fixed hourly grid (gap fill + forward fill) and compute
  * day-over-day deltas — the standard pre-processing between raw event
  * ingestion and forecasting/MAPE pipelines like [[Mape]], which assume a
  * dense time axis.
  *
  * Scale shape: the spine is built from ONE aggregated (min, max) row and
  * the distinct series keys — never from the fact table — and the dense
  * grid is a broadcast cross join (hours are bounded by the time range:
  * a decade is &lt; 90k rows). The forward-fill window is keyed by series,
  * so parallelism follows series cardinality; a deployment with FEW huge
  * series should range-bucket the time axis first (the window is the
  * inherently sequential part of forward fill).
  *
  * Float determinism: hourly/daily values are cent-quantized per row
  * before summing (integer-valued double sums are order-exact), matching
  * the engine-wide contract in [[graft.queries.Queries]].
  */
object TimeSeries {

  /** Dense hourly grid per series over the observed [min, max] hour range,
    * with `v` = the hour's cent-quantized sum (null on gap hours) and
    * `filled` = forward fill (last non-null `v` at or before the hour;
    * null until the series' first observation). Returns
    * (series, h: timestamp, v, filled).
    */
  def gapFillHourly(df: DataFrame, series: Column, ts: Column,
                    value: Column): DataFrame = {
    // persisted: three consumers (spine bounds, distinct series, the grid
    // join) would otherwise each re-run the fact scan + aggregation — at
    // 100 TB that is three full passes for one; the aggregated frame is
    // series × observed-hours, orders of magnitude smaller than the facts
    val obs = graft.CacheRegistry.persist(
      df.groupBy(series.as("series"), date_trunc("hour", ts).as("h"))
        .agg((sum(round(value * 100)) / 100).as("v")))
    // one row (two timestamps) — the spine's bounds, like a broadcast
    // join's small side; computed once off the aggregated frame
    val hours = obs.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 HOUR"))).as("h"))
    val spine = obs.select(col("series")).distinct()
      .crossJoin(broadcast(hours))
    val w = Window.partitionBy(col("series")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(obs, Seq("series", "h"), "left")
      .select(col("series"), col("h"), col("v"),
        last(col("v"), ignoreNulls = true).over(w).as("filled"))
  }

  /** Daily totals per series with day-over-day delta and percent change
    * (null on each series' first day; pct additionally null when the
    * previous day is 0). Returns (series, d: date, v, delta, pct) — pct
    * rounded to 4 decimals, computed from the exact cent-quantized
    * dailies so both operands are engine-portable.
    */
  def dayOverDay(df: DataFrame, series: Column, ts: Column,
                 value: Column): DataFrame = {
    val daily = df.groupBy(series.as("series"), to_date(ts).as("d"))
      .agg((sum(round(value * 100)) / 100).as("v"))
    val w = Window.partitionBy(col("series")).orderBy(col("d"))
    val prev = lag(col("v"), 1).over(w)
    daily.select(col("series"), col("d"), col("v"),
      (col("v") - prev).as("delta"),
      round((col("v") - prev) / when(prev =!= 0, prev) * 100, 4).as("pct"))
  }

  /** Merge overlapping/touching half-open intervals per key — the
    * gaps-and-islands union behind "total covered time" metrics (billing,
    * uptime, session coverage; Itzik Ben-Gan's classic packing problem).
    * An interval starts a new island iff its start lies strictly past the
    * running max end of everything before it; touching intervals
    * (`start == prev end`) merge, as half-open semantics require.
    *
    * Determinism: island membership is a pure function of the interval
    * VALUES (the running max is order-insensitive among equal starts), so
    * the merged output is identical under any partitioning or tie order.
    *
    * Scale shape: two windows over the same (keys, start, end) ordering —
    * one Exchange + one sort serve both — then one hash aggregation.
    * Parallelism follows key cardinality; no joins, no global window.
    *
    * @param startCol inclusive start (any orderable type)
    * @param endCol   exclusive end, same type
    * @return keys* + (start, end) — one row per merged island
    */
  def mergeIntervals(df: DataFrame, keys: Seq[String],
                     startCol: String, endCol: String): DataFrame = {
    require(keys.nonEmpty, "mergeIntervals needs at least one key column")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    df
      .withColumn("__new",
        (prevMax.isNull || col(startCol) > prevMax).cast("long"))
      .withColumn("__island",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(keys.map(col) :+ col("__island"): _*)
      .agg(min(col(startCol)).as("start"), max(col(endCol)).as("end"))
      .select(keys.map(col) :+ col("start") :+ col("end"): _*)
  }

  /** Sessionize point events per key: a new session starts where the gap
    * to the previous event exceeds `gapSec` (STRICTLY — a gap of exactly
    * `gapSec` stays in-session, matching the streaming session window's
    * within-gap semantics). The batch analog of Structured Streaming's
    * `session_window`, as the classic gaps-and-islands pair of keyed
    * windows: lag flags session starts, a cumulative sum numbers them,
    * one hash aggregation emits per-session rows.
    *
    * Determinism with tied timestamps: the start flag depends only on
    * timestamp VALUES (equal-ts rows see gap 0 whatever their tie
    * order), so session membership, numbering, and aggregates replay
    * identically on any engine/partitioning.
    *
    * Scale shape: both windows share one (key, ts) Exchange + sort, then
    * one hash aggregation; parallelism follows key cardinality — the
    * standard per-entity window, never a global one.
    *
    * Output: keys* + (session 1..k per key, session_start, session_end
    * as epoch seconds, n_events).
    */
  def sessionize(df: DataFrame, keys: Seq[String], ts: Column,
                 gapSec: Long): DataFrame = {
    require(keys.nonEmpty, "sessionize needs at least one key column")
    require(gapSec >= 1, s"gapSec must be >= 1, got $gapSec")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__s"))
    val prev = lag(col("__s"), 1).over(w)
    df.select(keys.map(col) :+ unix_timestamp(ts).as("__s"): _*)
      .withColumn("__new",
        (prev.isNull || col("__s") - prev > gapSec).cast("long"))
      .withColumn("session",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(keys.map(col) :+ col("session"): _*)
      .agg(min(col("__s")).as("session_start"),
        max(col("__s")).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** CUSUM level-shift detection (Page 1954) over keyed daily series —
    * the change-point monitor downstream of [[graft.operators.ColumnStats.psiSeries]]:
    * PSI says the DISTRIBUTION drifted, CUSUM says the LEVEL shifted and
    * on which day. Per key, the one-sided cumulative sum
    * `S_t = max(0, S_{t-1} + (x_t − μ − slack))` accumulates deviations
    * above the key's own mean; `alarm` fires while `S_t` exceeds
    * `threshold`.
    *
    * The recurrence is inherently sequential — the classic "can't
    * distribute a running max-with-reset" trap. It distributes anyway via
    * the reflection identity `S_t = P_t − min_{0≤j≤t} P_j` (P = prefix
    * sums of the deviations, P_0 = 0): one running sum + one running min,
    * i.e. keyed windows sharing ONE Exchange + sort with the full-frame
    * mean windows. Nothing driver-side, no recursion, no
    * `mapGroupsWithState` in batch.
    *
    * Exactness: daily values are cent-quantized longs; the mean division
    * is AVOIDED by scaling every deviation by the key's day count n
    * (`d_t = vc_t·n − T − slack_cents·n`, all longs), so prefix sums are
    * order-free exact integers and `alarm` compares longs. Only the final
    * reported `cusum` (in original units per day) divides, 1e-6-quantized.
    * Overflow bound: |vc|max·n² < 2⁶³ (each |d_t| ≤ ~2·|vc|max·n and
    * prefixes sum ≤ n of them); at daily grain a decade is n ≈ 3.7e3,
    * leaving ~6.7e11 cents ≈ $6.7e9 per day per key — far past any
    * monitored series.
    *
    * Output: (keys…, day 'yyyy-MM-dd', v = daily sum, cusum = S_t in
    * original units, alarm). Scale shape: one map-side-combined daily
    * aggregation (fact-scale), then everything downstream is keys×days
    * rows through a single Exchange.
    */
  def cusumShift(df: DataFrame, keys: Seq[String], ts: Column,
                 value: Column, slackCents: Long,
                 thresholdCents: Long): DataFrame = {
    require(keys.nonEmpty, "cusumShift needs at least one key column")
    require(slackCents >= 0, s"slackCents must be >= 0, got $slackCents")
    require(thresholdCents > 0,
      s"thresholdCents must be > 0, got $thresholdCents")
    val daily = df
      .groupBy(keys.map(col) :+ to_date(ts).as("__day"): _*)
      .agg(sum(round(value * 100)).cast("long").as("__vc"))
    val base = Window.partitionBy(keys.map(col): _*).orderBy(col("__day"))
    val wAll = base.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val wPre = base.rowsBetween(Window.unboundedPreceding, 0)
    daily
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__t", sum(col("__vc")).over(wAll))
      .withColumn("__p",
        sum(col("__vc") * col("__n") - col("__t") -
          lit(slackCents) * col("__n")).over(wPre))
      .withColumn("__s",
        col("__p") - least(lit(0L), min(col("__p")).over(wPre)))
      .select(keys.map(col) :+
        date_format(col("__day"), "yyyy-MM-dd").as("day") :+
        (col("__vc") / 100.0).as("v") :+
        round(col("__s") / (col("__n") * 100.0), 6).as("cusum") :+
        (col("__s") > lit(thresholdCents) * col("__n")).as("alarm"): _*)
  }

  /** First-order event-transition matrix — the behavioral model behind
    * next-event prediction and funnel design: per key (user), order
    * events by (ts, tieBreak) and count every adjacent (state → next)
    * pair, then normalize rows to transition probabilities. `tieBreak`
    * makes the per-key order TOTAL, so tied timestamps produce the same
    * pairs on any engine/partitioning — the [[Scd.scd2]] tie discipline.
    *
    * Output: (cur, next, n, p) with p = n / Σ_next n, 1e-6-quantized.
    * Scale shape: one keyed lead window (one Exchange), one map-side-
    * combined pair count on ≤ |states|² keys, one states-sized window
    * for the row normalization — the fact table never shuffles twice.
    */
  def transitionMatrix(df: DataFrame, keys: Seq[String], ts: Column,
                       state: Column, tieBreak: Column): DataFrame = {
    require(keys.nonEmpty, "transitionMatrix needs at least one key column")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tb"))
    val pairs = df
      .select(keys.map(col) :+ ts.as("__t") :+ tieBreak.as("__tb") :+
        state.as("cur"): _*)
      .withColumn("next", lead(col("cur"), 1).over(w))
      .filter(col("next").isNotNull)
      .groupBy(col("cur"), col("next")).agg(count(lit(1)).as("n"))
    val wc = Window.partitionBy(col("cur"))
    pairs.withColumn("p",
      round(col("n").cast("double") / sum(col("n")).over(wc) * 1e6) / 1e6)
  }

  /** DuckDB replay of [[transitionMatrix]] over
    * `table`(`keyCol`, `tsCol`, `stateCol`, `tieCol`). */
  def transitionOracleSql(table: String, keyCol: String, tsCol: String,
                          stateCol: String, tieCol: String): String =
    s"""WITH s AS (
       |  SELECT $stateCol AS cur,
       |         LEAD($stateCol) OVER (PARTITION BY $keyCol
       |           ORDER BY $tsCol, $tieCol) AS next
       |  FROM $table
       |), c AS (
       |  SELECT cur, next, COUNT(*) AS n FROM s
       |  WHERE next IS NOT NULL GROUP BY 1, 2
       |)
       |SELECT cur, next, n,
       |       round(CAST(n AS DOUBLE)
       |             / CAST(SUM(n) OVER (PARTITION BY cur) AS BIGINT)
       |             * 1e6) / 1e6 AS p
       |FROM c""".stripMargin

  /** [[cusumShift]] against an EXPLICIT reference level instead of the
    * key's own mean — classic CUSUM with a known target μ0 (the form a
    * monitor runs when the healthy level is configured, and the form a
    * STREAM can run: the self-referenced variant needs the series' whole
    * history for its mean, a target needs none). Deviations are plain
    * longs (`vc − target − slack`, no n-scaling needed), the same
    * reflection identity distributes the recurrence, and
    * [[graft.streaming.StreamingEvents.cusumStream]] is spec-pinned to
    * replay equal to this batch form.
    */
  def cusumShiftTarget(df: DataFrame, keys: Seq[String], ts: Column,
                       value: Column, targetCents: Long, slackCents: Long,
                       thresholdCents: Long): DataFrame = {
    require(keys.nonEmpty, "cusumShiftTarget needs at least one key column")
    require(slackCents >= 0, s"slackCents must be >= 0, got $slackCents")
    require(thresholdCents > 0,
      s"thresholdCents must be > 0, got $thresholdCents")
    val daily = df
      .groupBy(keys.map(col) :+ to_date(ts).as("__day"): _*)
      .agg(sum(round(value * 100)).cast("long").as("__vc"))
    val wPre = Window.partitionBy(keys.map(col): _*).orderBy(col("__day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    daily
      .withColumn("__p",
        sum(col("__vc") - lit(targetCents + slackCents)).over(wPre))
      .withColumn("__s",
        col("__p") - least(lit(0L), min(col("__p")).over(wPre)))
      .select(keys.map(col) :+
        date_format(col("__day"), "yyyy-MM-dd").as("day") :+
        (col("__vc") / 100.0).as("v") :+
        round(col("__s") / 100.0, 6).as("cusum") :+
        (col("__s") > lit(thresholdCents)).as("alarm"): _*)
  }

  /** DuckDB replay of [[cusumShiftTarget]] — plain-long deviations, the
    * same stacked-window reflection identity. */
  def cusumTargetOracleSql(table: String, keyCol: String, tsCol: String,
                           valueCol: String, targetCents: Long,
                           slackCents: Long, thresholdCents: Long): String =
    s"""WITH daily AS (
       |  SELECT $keyCol, CAST(date_trunc('day', $tsCol) AS DATE) AS d,
       |         CAST(SUM(ROUND($valueCol*100)) AS BIGINT) AS vc
       |  FROM $table GROUP BY 1, 2
       |), pre AS (
       |  SELECT $keyCol, d, vc,
       |         CAST(SUM(vc - ${targetCents + slackCents}) OVER (
       |           PARTITION BY $keyCol ORDER BY d
       |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p
       |  FROM daily
       |), mm AS (
       |  SELECT $keyCol, d, vc, p,
       |         p - LEAST(CAST(0 AS BIGINT), MIN(p) OVER (
       |           PARTITION BY $keyCol ORDER BY d
       |           ROWS UNBOUNDED PRECEDING)) AS s
       |  FROM pre
       |)
       |SELECT $keyCol, strftime(d, '%Y-%m-%d') AS day, vc/100.0 AS v,
       |       ROUND(s/100.0, 6) AS cusum,
       |       s > $thresholdCents AS alarm
       |FROM mm""".stripMargin

  /** DuckDB replay of [[cusumShift]]: the same daily cent quantization,
    * the same n-scaled integer deviations, the same reflection identity
    * through two stacked windows. Interior window sums are cast back to
    * BIGINT (DuckDB widens SUM(BIGINT) to HUGEINT; the values are exact
    * either way, and the lint forbids HUGEINT reaching the output).
    */
  def cusumOracleSql(table: String, keyCol: String, tsCol: String,
                     valueCol: String, slackCents: Long,
                     thresholdCents: Long): String =
    s"""WITH daily AS (
       |  SELECT $keyCol, CAST(date_trunc('day', $tsCol) AS DATE) AS d,
       |         CAST(SUM(ROUND($valueCol*100)) AS BIGINT) AS vc
       |  FROM $table GROUP BY 1, 2
       |), tot AS (
       |  SELECT $keyCol, d, vc,
       |         COUNT(*) OVER (PARTITION BY $keyCol) AS n,
       |         CAST(SUM(vc) OVER (PARTITION BY $keyCol) AS BIGINT) AS t
       |  FROM daily
       |), pre AS (
       |  SELECT $keyCol, d, vc, n,
       |         CAST(SUM(vc*n - t - $slackCents*n) OVER (
       |           PARTITION BY $keyCol ORDER BY d
       |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p
       |  FROM tot
       |), mm AS (
       |  SELECT $keyCol, d, vc, n, p,
       |         p - LEAST(CAST(0 AS BIGINT), MIN(p) OVER (
       |           PARTITION BY $keyCol ORDER BY d
       |           ROWS UNBOUNDED PRECEDING)) AS s
       |  FROM pre
       |)
       |SELECT $keyCol, strftime(d, '%Y-%m-%d') AS day, vc/100.0 AS v,
       |       ROUND(s/(100.0*n), 6) AS cusum,
       |       s > $thresholdCents*n AS alarm
       |FROM mm""".stripMargin

  /** EWMA control chart (Roberts 1959) with λ = 1/2, the small-shift
    * monitor that complements [[cusumShift]]'s sustained-shift alarm:
    * each day's smoothed level is the geometric-decay weighted mean of
    * the most recent `span` observed days,
    * `ewma_t = Σ_{j<span} 2^(span−1−j)·x_{t−j} / Σ 2^(span−1−j)`,
    * and the alarm fires when the level drifts more than
    * `thresholdCents` from the key's own mean.
    *
    * Truncating at `span` steps is what makes the chart EXACT: the
    * weights an untruncated double EWMA would still assign beyond step
    * `span` are below 2^(1−span) (one part in 32k at the default 16) —
    * smaller than double rounding noise — and dropping them turns every
    * numerator/denominator into an order-free INTEGER sum of cent-
    * quantized longs, so the statistic replays bit-for-bit on any
    * engine/partitioning. The lag terms all ride ONE keyed window
    * (shared Exchange + sort with the mean windows); the alarm compares
    * cross-multiplied longs (`|num·n − T·den| > threshold·n·den`), so no
    * division touches the decision. Overflow bound: |vc|max·2^span·n
    * < 2⁶³ — at span=16, a decade of days leaves ~$3.8e8/day per key.
    *
    * Output: (keys…, day 'yyyy-MM-dd', v, ewma 1e-6-quantized, alarm).
    * Scale shape: one map-side-combined daily aggregation (fact-scale),
    * then keys×days rows through a single Exchange.
    */
  private def ewmaCore(df: DataFrame, keys: Seq[String], ts: Column,
                       value: Column, span: Int): DataFrame = {
    require(keys.nonEmpty, "ewma chart needs at least one key column")
    require(span >= 2 && span <= 32, s"span must be in [2, 32], got $span")
    val daily = df
      .groupBy(keys.map(col) :+ to_date(ts).as("__day"): _*)
      .agg(sum(round(value * 100)).cast("long").as("__vc"))
    val base = Window.partitionBy(keys.map(col): _*).orderBy(col("__day"))
    def weight(j: Int): Long = 1L << (span - 1 - j)
    val num = (0 until span).map(j =>
      coalesce(lag(col("__vc"), j).over(base) * weight(j), lit(0L)))
      .reduce(_ + _)
    val den = (0 until span).map(j =>
      when(lag(col("__vc"), j).over(base).isNotNull, lit(weight(j)))
        .otherwise(lit(0L)))
      .reduce(_ + _)
    daily.withColumn("__num", num).withColumn("__den", den)
  }

  private def ewmaSelect(core: DataFrame, keys: Seq[String],
                         alarm: Column): DataFrame =
    core.select(keys.map(col) :+
      date_format(col("__day"), "yyyy-MM-dd").as("day") :+
      (col("__vc") / 100.0).as("v") :+
      (round(col("__num") / (col("__den") * 100.0) * 1e6) / 1e6)
        .as("ewma") :+
      alarm.as("alarm"): _*)

  def ewmaChart(df: DataFrame, keys: Seq[String], ts: Column,
                value: Column, span: Int = 16,
                thresholdCents: Long = 0L): DataFrame = {
    require(thresholdCents >= 0,
      s"thresholdCents must be >= 0, got $thresholdCents")
    val base = Window.partitionBy(keys.map(col): _*).orderBy(col("__day"))
    val wAll = base.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val core = ewmaCore(df, keys, ts, value, span)
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__t", sum(col("__vc")).over(wAll))
    ewmaSelect(core, keys,
      abs(col("__num") * col("__n") - col("__t") * col("__den")) >
        lit(thresholdCents) * col("__n") * col("__den"))
  }

  /** [[ewmaChart]] against a CONFIGURED reference level instead of the
    * key's own mean — the classic control-chart form (limits around a
    * known in-control target) and the form a STREAMING monitor can
    * replay exactly, since the target needs no full-series pass
    * ([[graft.streaming.StreamingEvents.ewmaStream]] holds the stream =
    * batch contract against this). Alarm compares plain longs:
    * `|num − target·den| > threshold·den`.
    */
  def ewmaChartTarget(df: DataFrame, keys: Seq[String], ts: Column,
                      value: Column, span: Int = 16,
                      targetCents: Long, thresholdCents: Long): DataFrame = {
    require(thresholdCents >= 0,
      s"thresholdCents must be >= 0, got $thresholdCents")
    ewmaSelect(ewmaCore(df, keys, ts, value, span), keys,
      abs(col("__num") - lit(targetCents) * col("__den")) >
        lit(thresholdCents) * col("__den"))
  }

  /** DuckDB replay of [[ewmaChart]]: the same lag terms, integer weights,
    * and cross-multiplied alarm comparison (interior sums cast back to
    * BIGINT — the [[cusumOracleSql]] HUGEINT discipline).
    */
  /** One-step-ahead backtest of the EWMA predictor — the engine's own
    * forecast-accuracy identity (WAPE: Σ|err|/Σactual, the q03 ordering
    * contract) applied to its own smoother: yesterday's EWMA level is
    * today's forecast, per key. The honest way to size an EWMA span (or
    * justify replacing the smoother with a real model): if the naive
    * smoother backtests at 8% WAPE, a model must beat that.
    *
    * Exactness: forecasts stay the exact rational num/den pair from the
    * lag window; each day's absolute error quantizes to integer cents
    * via ONE rounded division (round(|vc·den₋₁ − num₋₁| / den₋₁) — the
    * mixed per-day denominators make a common-denominator long sum
    * impossible, so this is the minimal rounding surface), then sums and
    * the final ratio are exact/1e-6-quantized. Days with no prior
    * observed day (each key's first) have no forecast and are excluded.
    *
    * Output: (keys…, n_days, wape, mean_abs_err) — wape =
    * Σerr/Σactual, both in original units.
    */
  def ewmaBacktest(df: DataFrame, keys: Seq[String], ts: Column,
                   value: Column, span: Int = 16): DataFrame = {
    val base = Window.partitionBy(keys.map(col): _*).orderBy(col("__day"))
    ewmaCore(df, keys, ts, value, span)
      .withColumn("__pn", lag(col("__num"), 1).over(base))
      .withColumn("__pd", lag(col("__den"), 1).over(base))
      .filter(col("__pn").isNotNull)
      .withColumn("__err",
        round(abs(col("__vc") * col("__pd") - col("__pn")) / col("__pd"))
          .cast("long"))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_days"),
        (round(sum(col("__err")) * lit(1000000L) / sum(col("__vc"))) / 1e6)
          .as("wape"),
        (round(sum(col("__err")) * lit(100L) / count(lit(1))) / 10000.0)
          .as("mean_abs_err"))
  }

  /** Robust trend per key — Theil–Sen slope (Sen 1968: the MEDIAN of all
    * pairwise day-slopes, ~29% breakdown where q97's OLS slope follows a
    * single outlier day) plus the Mann–Kendall trend test (Mann 1945:
    * S = Σ sign(x_j − x_i) over ordered pairs, tie-corrected variance,
    * the z-statistic that says whether the trend is REAL) — the
    * nonparametric pair every monitoring stack wants beside the
    * parametric fit.
    *
    * Exactness: daily values are cent longs; pair slopes quantize to
    * 1e-6 cents/day as longs via one rounded division each; the median
    * interpolates two longs (exact midpoint in double); S and the tie
    * counts are pure integers; z's single sqrt runs on an exact rational
    * — every number replays cross-engine, 1e-6-quantized.
    *
    * Scale shape: ONE daily aggregation (fact-scale, map-side-combined),
    * then the pair self-join runs on keys×days rows — days per key is
    * the monitoring window (30–365), so pairs per key are bounded by
    * construction (n·(n−1)/2 ≤ ~66k at a year), never fact-scale.
    *
    * Output: (keys…, n_days, sen_slope [units/day], mk_s, mk_z).
    */
  def robustTrend(df: DataFrame, keys: Seq[String], ts: Column,
                  value: Column): DataFrame = {
    require(keys.nonEmpty, "robustTrend needs at least one key column")
    val daily = graft.CacheRegistry.persist(df
      .groupBy(keys.map(col) :+ to_date(ts).as("__day"): _*)
      .agg(sum(round(value * 100)).cast("long").as("__vc")))
    val a = daily.select(keys.map(col) :+ col("__day").as("__d1") :+
      col("__vc").as("__v1"): _*)
    val b = daily.select(keys.map(col) :+ col("__day").as("__d2") :+
      col("__vc").as("__v2"): _*)
    val pairs = a.join(b, keys).filter(col("__d1") < col("__d2"))
      .withColumn("__slope_q",
        round((col("__v2") - col("__v1")) * lit(1000000L) /
          datediff(col("__d2"), col("__d1"))).cast("long"))
      .withColumn("__sgn",
        signum((col("__v2") - col("__v1")).cast("double")).cast("long"))
    val perKey = pairs.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__np"),
        percentile(col("__slope_q"), lit(0.5)).as("__med"),
        sum(col("__sgn")).as("mk_s"))
    // tie correction: groups of equal daily values within a key
    val ties = daily.groupBy(keys.map(col) :+ col("__vc"): _*)
      .agg(count(lit(1)).as("__t")).filter(col("__t") > 1)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__t") * (col("__t") - 1) * (lit(2) * col("__t") + 5))
        .as("__tsum"))
    val nDays = daily.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_days"))
    val varExpr = (col("n_days") * (col("n_days") - 1) *
      (lit(2) * col("n_days") + 5) - coalesce(col("__tsum"), lit(0L)))
      .cast("double") / 18.0
    nDays.join(perKey, keys).join(ties, keys, "left")
      .withColumn("__var", varExpr)
      .select(keys.map(col) :+ col("n_days") :+
        (round(col("__med") / 1e6 / 100.0 * 1e6) / 1e6).as("sen_slope") :+
        col("mk_s") :+
        (round(when(col("mk_s") > 0,
            (col("mk_s") - 1) / sqrt(col("__var")))
          .when(col("mk_s") < 0,
            (col("mk_s") + 1) / sqrt(col("__var")))
          .otherwise(lit(0.0)) * 1e6) / 1e6).as("mk_z"): _*)
  }

  /** DuckDB replay of [[robustTrend]]. */
  def robustTrendOracleSql(table: String, keyCol: String, tsCol: String,
                           valueCol: String): String =
    s"""WITH daily AS (
       |  SELECT $keyCol, CAST(date_trunc('day', $tsCol) AS DATE) AS d,
       |         CAST(SUM(ROUND($valueCol*100)) AS BIGINT) AS vc
       |  FROM $table GROUP BY 1, 2
       |), pairs AS (
       |  SELECT a.$keyCol,
       |         CAST(round((b.vc - a.vc) * 1000000
       |                    / date_diff('day', a.d, b.d)) AS BIGINT)
       |           AS slope_q,
       |         CAST(sign(b.vc - a.vc) AS BIGINT) AS sgn
       |  FROM daily a JOIN daily b
       |    ON a.$keyCol = b.$keyCol AND a.d < b.d
       |), pk AS (
       |  SELECT $keyCol, COUNT(*) AS np, median(slope_q) AS med,
       |         CAST(SUM(sgn) AS BIGINT) AS mk_s
       |  FROM pairs GROUP BY 1
       |), ties AS (
       |  SELECT $keyCol,
       |         CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tsum
       |  FROM (SELECT $keyCol, vc, COUNT(*) AS t FROM daily
       |        GROUP BY 1, 2 HAVING COUNT(*) > 1)
       |  GROUP BY 1
       |), nd AS (
       |  SELECT $keyCol, COUNT(*) AS n_days FROM daily GROUP BY 1
       |)
       |SELECT nd.$keyCol, n_days,
       |       round(med / 1e6 / 100.0 * 1e6) / 1e6 AS sen_slope,
       |       mk_s,
       |       round(CASE
       |         WHEN mk_s > 0 THEN (mk_s - 1) / sqrt(
       |           CAST(n_days * (n_days - 1) * (2 * n_days + 5)
       |                - COALESCE(tsum, 0) AS DOUBLE) / 18.0)
       |         WHEN mk_s < 0 THEN (mk_s + 1) / sqrt(
       |           CAST(n_days * (n_days - 1) * (2 * n_days + 5)
       |                - COALESCE(tsum, 0) AS DOUBLE) / 18.0)
       |         ELSE 0.0 END * 1e6) / 1e6 AS mk_z
       |FROM nd JOIN pk ON nd.$keyCol = pk.$keyCol
       |LEFT JOIN ties ON nd.$keyCol = ties.$keyCol""".stripMargin

  /** DuckDB replay of [[ewmaBacktest]]. */
  def ewmaBacktestOracleSql(table: String, keyCol: String, tsCol: String,
                            valueCol: String, span: Int = 16): String = {
    def weight(j: Int): Long = 1L << (span - 1 - j)
    val over = s"OVER (PARTITION BY $keyCol ORDER BY d)"
    val num = (0 until span)
      .map(j => s"COALESCE(LAG(vc, $j) $over * ${weight(j)}, 0)")
      .mkString(" + ")
    val den = (0 until span)
      .map(j => s"CASE WHEN LAG(vc, $j) $over IS NOT NULL " +
        s"THEN ${weight(j)} ELSE 0 END")
      .mkString(" + ")
    s"""WITH daily AS (
       |  SELECT $keyCol, CAST(date_trunc('day', $tsCol) AS DATE) AS d,
       |         CAST(SUM(ROUND($valueCol*100)) AS BIGINT) AS vc
       |  FROM $table GROUP BY 1, 2
       |), lagged AS (
       |  SELECT $keyCol, d, vc,
       |         CAST($num AS BIGINT) AS num,
       |         CAST($den AS BIGINT) AS den
       |  FROM daily
       |), prev AS (
       |  SELECT $keyCol, d, vc,
       |         LAG(num) OVER (PARTITION BY $keyCol ORDER BY d) AS pn,
       |         LAG(den) OVER (PARTITION BY $keyCol ORDER BY d) AS pd
       |  FROM lagged
       |), err AS (
       |  SELECT $keyCol, vc,
       |         CAST(round(ABS(vc * pd - pn) / pd) AS BIGINT) AS e
       |  FROM prev WHERE pn IS NOT NULL
       |)
       |SELECT $keyCol, COUNT(*) AS n_days,
       |       round(CAST(SUM(e) AS BIGINT) * 1000000
       |             / CAST(SUM(vc) AS BIGINT)) / 1e6 AS wape,
       |       round(CAST(SUM(e) AS BIGINT) * 100 / COUNT(*)) / 10000.0
       |         AS mean_abs_err
       |FROM err GROUP BY 1""".stripMargin
  }
  def ewmaTargetOracleSql(table: String, keyCol: String, tsCol: String,
                          valueCol: String, span: Int,
                          targetCents: Long, thresholdCents: Long): String = {
    def weight(j: Int): Long = 1L << (span - 1 - j)
    val over = s"OVER (PARTITION BY $keyCol ORDER BY d)"
    val num = (0 until span)
      .map(j => s"COALESCE(LAG(vc, $j) $over * ${weight(j)}, 0)")
      .mkString(" + ")
    val den = (0 until span)
      .map(j => s"CASE WHEN LAG(vc, $j) $over IS NOT NULL " +
        s"THEN ${weight(j)} ELSE 0 END")
      .mkString(" + ")
    s"""WITH daily AS (
       |  SELECT $keyCol, CAST(date_trunc('day', $tsCol) AS DATE) AS d,
       |         CAST(SUM(ROUND($valueCol*100)) AS BIGINT) AS vc
       |  FROM $table GROUP BY 1, 2
       |), lagged AS (
       |  SELECT $keyCol, d, vc,
       |         CAST($num AS BIGINT) AS num,
       |         CAST($den AS BIGINT) AS den
       |  FROM daily
       |)
       |SELECT $keyCol, strftime(d, '%Y-%m-%d') AS day, vc/100.0 AS v,
       |       ROUND(num/(den*100.0)*1e6)/1e6 AS ewma,
       |       ABS(num - $targetCents*den) > $thresholdCents*den AS alarm
       |FROM lagged""".stripMargin
  }

  def ewmaOracleSql(table: String, keyCol: String, tsCol: String,
                    valueCol: String, span: Int = 16,
                    thresholdCents: Long = 0L): String = {
    def weight(j: Int): Long = 1L << (span - 1 - j)
    val over = s"OVER (PARTITION BY $keyCol ORDER BY d)"
    val num = (0 until span)
      .map(j => s"COALESCE(LAG(vc, $j) $over * ${weight(j)}, 0)")
      .mkString(" + ")
    val den = (0 until span)
      .map(j => s"CASE WHEN LAG(vc, $j) $over IS NOT NULL " +
        s"THEN ${weight(j)} ELSE 0 END")
      .mkString(" + ")
    s"""WITH daily AS (
       |  SELECT $keyCol, CAST(date_trunc('day', $tsCol) AS DATE) AS d,
       |         CAST(SUM(ROUND($valueCol*100)) AS BIGINT) AS vc
       |  FROM $table GROUP BY 1, 2
       |), lagged AS (
       |  SELECT $keyCol, d, vc,
       |         COUNT(*) OVER (PARTITION BY $keyCol) AS n,
       |         CAST(SUM(vc) OVER (PARTITION BY $keyCol) AS BIGINT) AS t,
       |         CAST($num AS BIGINT) AS num,
       |         CAST($den AS BIGINT) AS den
       |  FROM daily
       |)
       |SELECT $keyCol, strftime(d, '%Y-%m-%d') AS day, vc/100.0 AS v,
       |       ROUND(num/(den*100.0)*1e6)/1e6 AS ewma,
       |       ABS(num*n - t*den) > $thresholdCents*n*den AS alarm
       |FROM lagged""".stripMargin
  }
}
