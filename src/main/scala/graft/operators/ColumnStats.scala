package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table statistics collection — the ANALYZE-TABLE half of a query engine:
  * per-column row/null/distinct counts and min/max, the numbers a
  * cost-based optimizer (and any data-quality gate) feeds on.
  *
  * Two shapes, chosen by `exact`:
  *
  *  - `exact = true`: one aggregation branch PER COLUMN, unioned. A single
  *    multi-distinct aggregate looks like "one pass" but Catalyst rewrites
  *    k exact distincts into an Expand that multiplies the scan k+1 times
  *    and forces sort-based aggregation keyed on every distinct column at
  *    once (measured 5.1 s on the round-7 bench — slower than several
  *    whole pipelines). Per-column branches each read ONE column from
  *    parquet (columnar pruning makes k narrow scans ≈ one wide scan of
  *    the same bytes), keep hash aggregation, and run as parallel stages
  *    of one job (0.44 s for the same four columns — 11×).
  *  - `exact = false`: genuinely one pass — `approx_count_distinct`'s
  *    HLL++ sketches need no distinct rewrite, so all columns share a
  *    single scan and a single global aggregate, unpivoted with `stack`.
  *    The trade every warehouse's ANALYZE makes at scale.
  *
  * min/max are rendered as strings so one tidy frame covers heterogeneous
  * column types (the consumer is a catalog, not arithmetic).
  */
object ColumnStats {

  def collect(df: DataFrame, cols: Seq[String], exact: Boolean = true)
      : DataFrame = {
    require(cols.nonEmpty, "columnStats needs at least one column")
    if (exact) {
      cols.map { c =>
        // dedupe-with-count FIRST (hash aggregation, map-side combined:
        // the shuffle carries (value, count) partials, ndv-sized per
        // partition), then a KEYLESS aggregate over the deduped stream:
        // min/max on var-length types can't use hash buffers, but with no
        // grouping keys the fallback sort-aggregate needs no Sort at all,
        // and it only sees ndv rows — a naive agg(countDistinct, min,
        // max) would instead sort the whole column to group by value
        val byValue = df.select(col(c).as("v"))
          .groupBy("v").agg(count(lit(1)).as("cnt"))
        byValue.agg(
          coalesce(sum(col("cnt")), lit(0L)).as("n_rows"),
          coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L))
            .as("n_nulls"),
          count(col("v")).as("n_distinct"),
          min(col("v")).cast("string").as("min_str"),
          max(col("v")).cast("string").as("max_str"))
          .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
            col("n_distinct"), col("min_str"), col("max_str"))
      }.reduce(_.unionAll(_))
    } else {
      val aggs = cols.flatMap(c => Seq(
        (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
        approx_count_distinct(col(c)).as(s"${c}__ndv"),
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

  /** Mergeable NDV sketches — incremental ANALYZE: a 100 TB table's stats
    * should be maintained per ingest batch/partition, not recomputed by
    * re-scanning history. Datasketches HLL state (Spark's own
    * `hll_sketch_agg`) is a few KB per column, unions losslessly (the
    * union of two sketches IS the sketch of the union, so per-batch
    * sketches persisted to the catalog roll up to whole-table NDV at any
    * time), and estimates within HLL error. Returns (col_name, sketch) —
    * write it next to the batch.
    */
  def ndvSketches(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "ndvSketches needs at least one column")
    cols.map(c =>
      df.select(col(c)).agg(hll_sketch_agg(col(c)).as("sketch"))
        .select(lit(c).as("col_name"), col("sketch")))
      .reduce(_.unionAll(_))
  }

  /** Union persisted per-batch sketches into whole-table NDV estimates:
    * (col_name, n_distinct). */
  def mergeNdvEstimates(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "mergeNdvEstimates needs at least one frame")
    sketches.reduce(_.unionAll(_))
      .groupBy("col_name")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
        .as("n_distinct"))
  }

  /** Pairwise Pearson correlation matrix in ONE aggregation pass — the
    * feature-redundancy screen of dataset analysis, built from raw moment
    * sums instead of the `corr` aggregate because streaming double sums
    * are accumulation-order-dependent (not reproducible run to run, let
    * alone engine to engine). Each column is quantized to integers by its
    * `scale` (pick it so `Σx²` stays under 2^63: values·scale ≤ ~10^6 at
    * ~10^9 rows), every moment (Σx, Σx², Σxy) is an EXACT long sum, and
    * the textbook formula runs over the moments cast to double — so the
    * result is deterministic bit-for-bit under any partitioning, and an
    * engine replaying the same formula over the same parquet agrees
    * exactly (q95's oracle does).
    *
    * Output: (col_a, col_b, n, corr) for every pair a < b in `cols`
    * order; corr is null for a zero-variance side (ANSI-safe: guarded,
    * not a division error).
    */
  def correlationMatrix(df: DataFrame, cols: Seq[(String, Double)])
      : DataFrame = {
    require(cols.size >= 2, "correlationMatrix needs at least two columns")
    val names = cols.map(_._1)
    val q = df.select(cols.map { case (c, s) =>
      round(col(c) * s).cast("long").as(c) }: _*)
    val sums = names.flatMap(c => Seq(
      sum(col(c)).as(s"s_$c"), sum(col(c) * col(c)).as(s"ss_$c")))
    val prods = for {
      i <- names.indices; j <- names.indices if i < j
    } yield sum(col(names(i)) * col(names(j)))
      .as(s"sp_${names(i)}__${names(j)}")
    val one = q.agg(count(lit(1)).as("n"), (sums ++ prods): _*)
    val pairRows = for {
      i <- names.indices; j <- names.indices if i < j
    } yield {
      val (a, b) = (names(i), names(j))
      val n = col("n").cast("double")
      val sx = col(s"s_$a").cast("double")
      val sy = col(s"s_$b").cast("double")
      val sxx = col(s"ss_$a").cast("double")
      val syy = col(s"ss_$b").cast("double")
      val sxy = col(s"sp_${a}__$b").cast("double")
      val varx = n * sxx - sx * sx
      val vary = n * syy - sy * sy
      struct(lit(a).as("col_a"), lit(b).as("col_b"), col("n").as("n"),
        when(varx > 0 && vary > 0,
          (n * sxy - sx * sy) / (sqrt(varx) * sqrt(vary))).as("corr"))
    }
    one.select(explode(array(pairRows: _*)).as("p"))
      .select(col("p.col_a"), col("p.col_b"), col("p.n"), col("p.corr"))
  }

  /** Per-group ordinary-least-squares fit of `y` on `x` — the trend
    * detector of monitoring pipelines (is this series drifting, and how
    * fast?). Same exact-moment discipline as [[correlationMatrix]]: both
    * sides quantized to integer longs, moments summed exactly, slope /
    * intercept / r² computed from the moments cast to double — so the fit
    * replays bit-for-bit under any partitioning. One hash aggregation.
    *
    * Output per group: (groupCols*, n, slope, intercept, r2) in ORIGINAL
    * units (the quantization scales divide back out); slope/intercept
    * null for degenerate groups (no x variance), r2 additionally null
    * when y has no variance.
    */
  def groupRegression(df: DataFrame, groupCols: Seq[String],
                      x: String, y: String,
                      xScale: Double = 1.0, yScale: Double = 1.0)
      : DataFrame = {
    val q = df.select(
      groupCols.map(col) ++ Seq(
        round(col(x) * xScale).cast("long").as("__x"),
        round(col(y) * yScale).cast("long").as("__y")): _*)
    val m = q.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
      sum(col("__x") * col("__x")).as("sxx"),
      sum(col("__y") * col("__y")).as("syy"),
      sum(col("__x") * col("__y")).as("sxy"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sy = col("sy").cast("double")
    val sxx = col("sxx").cast("double")
    val syy = col("syy").cast("double")
    val sxy = col("sxy").cast("double")
    val varx = n * sxx - sx * sx
    val vary = n * syy - sy * sy
    val cov = n * sxy - sx * sy
    // quantized-unit slope = cov/varx; original units multiply by the
    // scale ratio (x was scaled up by xScale → slope scales down)
    val slopeQ = cov / varx
    val slope = when(varx > 0, slopeQ * (xScale / yScale))
    val intercept = when(varx > 0,
      ((sy - slopeQ * sx) / n) / yScale)
    val r2 = when(varx > 0 && vary > 0, (cov * cov) / (varx * vary))
    m.select(groupCols.map(col) ++ Seq(col("n"), slope.as("slope"),
      intercept.as("intercept"), r2.as("r2")): _*)
  }

  /** Benford first-digit audit — the fabricated-data screen (Newcomb
    * 1881, Benford 1938): naturally occurring magnitudes spread over
    * several orders put digit d first with probability log10(1+1/d);
    * synthetic or tampered columns don't. Values are fixed-point money
    * (`decimals` fractional digits): the first significant digit comes
    * from exact integer/string arithmetic — `round(|v|·10^decimals)`
    * rendered and truncated to its leading character — never from
    * float log10, whose boundary behavior at powers of ten differs per
    * libm. Rows rounding to 0 carry no leading digit and are excluded.
    *
    * Output per digit 1–9: observed count, expected count, the χ² term
    * (obs−exp)²/exp, and the overall χ² statistic repeated on each row —
    * summed ORDER-FREE by quantizing each term to 10⁻⁶ integers first
    * (a raw double window sum would depend on row order). χ² ≥ 20.1
    * rejects Benford at α=0.01 with 8 degrees of freedom.
    *
    * One hash aggregation over the digit (9 groups); the expected shares
    * are a broadcast one-row total. Scale-safe by shape.
    */
  def benfordAudit(df: DataFrame, value: String, decimals: Int = 2)
      : DataFrame = {
    require(decimals >= 0, s"decimals must be non-negative, got $decimals")
    val fixed = round(abs(col(value)) * math.pow(10, decimals)).cast("long")
    val obs = df.select(fixed.as("__f")).filter(col("__f") >= 1L)
      .select(substring(col("__f").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("observed"))
    val tot = obs.agg(sum(col("observed")).as("__n"))
    val expShare = log(10.0, lit(1.0) + lit(1.0) / col("digit"))
    val t = obs.crossJoin(broadcast(tot))
      .withColumn("expected", round(col("__n") * expShare, 4))
      .withColumn("chi2_term",
        round(pow(col("observed") - col("__n") * expShare, 2) /
          (col("__n") * expShare), 6))
    val w = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t.withColumn("chi2",
        (sum(round(col("chi2_term") * 1e6, 0).cast("long")).over(w)
          .cast("double") / 1e6))
      .select(col("digit"), col("observed"), col("expected"),
        col("chi2_term"), col("chi2"))
  }

  /** Chi-square test of independence between two categorical columns —
    * "is the language mix the same across sources?" One row:
    * (n, n_cells, dof, chi2). Compare chi2 against the χ²(dof) critical
    * value offline; the statistic itself is the deliverable.
    *
    * Scale shape: ONE fact-table aggregation collapses to contingency
    * cells (|A|×|B| rows — persisted, it feeds margins and the join);
    * everything after is cell-sized. Per-cell (obs−exp)²/exp terms are
    * 1e-6-quantized and summed as longs ([[benfordAudit]]'s discipline),
    * so the statistic is order-free and engine-replayable.
    */
  def chiSquare(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = graft.CacheRegistry.persist(
      df.groupBy(col(colA).as("a"), col(colB).as("b"))
        .agg(count(lit(1)).as("obs")))
    val rowTot = cells.groupBy("a").agg(sum(col("obs")).as("ra"))
    val colTot = cells.groupBy("b").agg(sum(col("obs")).as("cb"))
    val n = cells.agg(sum(col("obs")).as("n"))
    // the DENSE margin grid, not just observed cells: a (a, b) combination
    // with zero rows still contributes (0−exp)²/exp = exp to the statistic
    // — dropping empty cells understates dependence exactly where it is
    // strongest (spec-pinned: a 2×2 perfect association scores χ² = n)
    rowTot.crossJoin(colTot).crossJoin(broadcast(n))
      .join(cells, Seq("a", "b"), "left")
      .withColumn("obs", coalesce(col("obs"), lit(0L)))
      // ra cast first: the long×long margin product overflows past ~3e9
      // rows per margin; exp is consumed as a double anyway, and below
      // 2^53 the double product is exact so the quantized terms are
      // unchanged at any verifiable scale
      .withColumn("exp", col("ra").cast("double") * col("cb") / col("n"))
      .withColumn("term6",
        round(pow(col("obs") - col("exp"), 2) / col("exp") * 1e6)
          .cast("long"))
      .agg(min(col("n")).as("n"),
        count(lit(1)).as("n_cells"),
        ((countDistinct(col("a")) - 1) * (countDistinct(col("b")) - 1))
          .as("dof"),
        (sum(col("term6")).cast("double") / 1e6).as("chi2"))
  }

  /** Population Stability Index between a baseline and a current frame
    * over fixed-width bins of a numeric column — the ML-monitoring drift
    * staple (rule of thumb: &lt; 0.1 stable, &gt; 0.2 shifted). Both sides
    * are Laplace-smoothed (+1 per bin over the UNION of observed bins, so
    * an empty-vs-nonempty bin contributes a finite term instead of ±∞ —
    * the standard practitioner fix, and the smoothing is part of the
    * replayable contract). Per-bin (p−q)·ln(p/q) terms are 1e-6-quantized
    * and summed as longs ([[benfordAudit]]'s discipline).
    *
    * Scale shape: each side collapses to (bin, count) in one map-side-
    * combined aggregation; everything after is bin-count-sized. Output:
    * one row per bin (bin, n_base, n_cur, term) + the shared `psi` total.
    */
  def psi(base: DataFrame, current: DataFrame, value: String,
          width: Long): DataFrame = {
    require(width >= 1, s"bin width must be >= 1, got $width")
    def binned(df: DataFrame, cnt: String) =
      df.select(floor(col(value).cast("long") / width).cast("long")
          .as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(cnt))
    psiFromCounts(
      binned(base, "n_base").join(binned(current, "n_cur"),
          Seq("bin"), "full_outer")
        .select(col("bin"), coalesce(col("n_base"), lit(0L)).as("n_base"),
          coalesce(col("n_cur"), lit(0L)).as("n_cur")))
  }

  /** [[psi]]'s algebra over pre-aggregated (bin, n_base, n_cur) counts —
    * the entry point for callers that already hold histograms (the
    * streaming drift monitor's windowed aggregation, a stored baseline
    * table) and must not re-materialize rows to score them.
    */
  def psiFromCounts(counts: DataFrame): DataFrame = {
    val joined = graft.CacheRegistry.persist(counts)
    val tot = joined.agg(count(lit(1)).as("k"),
      sum(col("n_base")).as("tb"), sum(col("n_cur")).as("tc"))
    val p = (col("n_base") + 1L).cast("double") / (col("tb") + col("k"))
    val q = (col("n_cur") + 1L).cast("double") / (col("tc") + col("k"))
    val t = joined.crossJoin(broadcast(tot))
      .withColumn("term6",
        round((p - q) * log(p / q) * 1e6).cast("long"))
    val w = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t.withColumn("psi", sum(col("term6")).over(w).cast("double") / 1e6)
      .select(col("bin"), col("n_base"), col("n_cur"),
        (col("term6").cast("double") / 1e6).as("term"), col("psi"))
  }

  /** Day-over-day PSI drift series — [[psi]]'s pairwise comparison run
    * for EVERY consecutive day as one keyed dataflow (the drift table a
    * monitoring dashboard reads): each day's binned histogram is
    * full-outer matched against the previous day's, smoothed and
    * quantized exactly as [[psiFromCounts]], and aggregated per day.
    * No global window anywhere — the per-day term sums are plain keyed
    * aggregations, so the series scales with day count × bin count.
    *
    * Output: (day yyyy-MM-dd, k_bins, n_prev, n_cur, psi) for every day
    * with a preceding day in the data.
    */
  def psiSeries(df: DataFrame, ts: Column, value: Column,
                width: Long): DataFrame = {
    require(width >= 1, s"bin width must be >= 1, got $width")
    val bins = df.select(to_date(ts).as("d"),
        floor(value.cast("long") / width).cast("long").as("bin"))
      .groupBy("d", "bin").agg(count(lit(1)).as("n"))
    val paired = bins.as("prev").join(bins.as("cur"),
        expr("date_add(prev.d, 1) = cur.d AND prev.bin = cur.bin"),
        "full_outer")
      .select(
        coalesce(col("cur.d"), expr("date_add(prev.d, 1)")).as("day"),
        coalesce(col("cur.bin"), col("prev.bin")).as("bin"),
        coalesce(col("prev.n"), lit(0L)).as("n_prev"),
        coalesce(col("cur.n"), lit(0L)).as("n_cur"))
    val tots = paired.groupBy("day").agg(count(lit(1)).as("k"),
      sum(col("n_prev")).as("tb"), sum(col("n_cur")).as("tc"))
    val p = (col("n_prev") + 1L).cast("double") / (col("tb") + col("k"))
    val q = (col("n_cur") + 1L).cast("double") / (col("tc") + col("k"))
    paired.join(tots, "day")
      .withColumn("term6", round((p - q) * log(p / q) * 1e6).cast("long"))
      .groupBy(col("day"))
      .agg(min(col("k")).as("k_bins"), min(col("tb")).as("n_prev"),
        min(col("tc")).as("n_cur"),
        (sum(col("term6")).cast("double") / 1e6).as("psi"))
      // Gap semantics of this filter, spelled out: a day whose PREVIOUS
      // day had no traffic (tb = 0 — the first day of the data, or any
      // day right after a dark day) compares against an empty histogram
      // and is DROPPED; a dark day itself (n_cur = 0, generated from
      // prev.d + 1) IS emitted, scoring the disappearance. So traffic
      // vanishing shows up in the series; traffic reappearing after a
      // gap does not — callers wanting symmetric gap scoring should
      // densify days upstream (sequence() over the date span) so every
      // day has a (possibly empty) predecessor histogram.
      .filter(col("n_prev") > 0)
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("k_bins"), col("n_prev"), col("n_cur"), col("psi"))
  }

  /** Join-key skew audit — the measurement that decides salting BEFORE a
    * 100 TB shuffle melts one reducer: per-key row counts collapsed to
    * one diagnosis row
    * (n_rows, n_keys, max_key_rows, n_hot, skew, suggested_salt), where
    * skew = max/avg rows-per-key (1e-6-quantized), n_hot counts keys
    * above `hotFactor`× the average, and suggested_salt = ⌈skew⌉ — the
    * salt-fan that would level the hottest key to roughly average.
    *
    * Scale shape: ONE map-side-combined count per key (the shuffle
    * carries (key, count) partials), then key-cardinality-sized algebra
    * against a one-row broadcast of the totals. Comparisons run in
    * doubles (cnt·n_keys vs hotFactor·n_rows), so nothing overflows at
    * any row count a long can hold.
    */
  def joinKeySkew(df: DataFrame, key: String,
                  hotFactor: Double = 10.0): DataFrame = {
    require(hotFactor > 0, s"hotFactor must be positive, got $hotFactor")
    val counts = df.groupBy(col(key).as("k")).agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"), max(col("cnt")).as("mx"))
    counts.crossJoin(broadcast(tot))
      .agg(min(col("n_rows")).as("n_rows"),
        min(col("n_keys")).as("n_keys"),
        min(col("mx")).as("max_key_rows"),
        sum(when(col("cnt").cast("double") * col("n_keys") >
          lit(hotFactor) * col("n_rows"), 1L).otherwise(0L)).as("n_hot"),
        (round(min(col("mx")).cast("double") * min(col("n_keys")) /
          min(col("n_rows")) * 1e6) / 1e6).as("skew"),
        ceil(min(col("mx")).cast("double") * min(col("n_keys")) /
          min(col("n_rows"))).cast("long").as("suggested_salt"))
  }

  /** [[joinKeySkew]]'s DuckDB replay over `table`.`key`. */
  def joinKeySkewOracleSql(table: String, key: String,
                           hotFactor: Double = 10.0): String =
    s"""WITH c AS (SELECT $key AS k, COUNT(*) AS cnt FROM $table GROUP BY 1),
       |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows, COUNT(*) AS n_keys,
       |             MAX(cnt) AS mx FROM c)
       |SELECT n_rows, n_keys, mx AS max_key_rows,
       |       CAST(SUM(CASE WHEN CAST(cnt AS DOUBLE) * n_keys >
       |         $hotFactor * n_rows THEN 1 ELSE 0 END) AS BIGINT) AS n_hot,
       |       round(CAST(mx AS DOUBLE) * n_keys / n_rows * 1e6) / 1e6
       |         AS skew,
       |       CAST(ceil(CAST(mx AS DOUBLE) * n_keys / n_rows) AS BIGINT)
       |         AS suggested_salt
       |FROM c, t GROUP BY n_rows, n_keys, mx""".stripMargin

  /** Join-cardinality preflight — [[joinKeySkew]]'s two-sided sibling,
    * the estimate that decides whether a join is SAFE to run before a
    * 100 TB shuffle commits you: the exact inner-join output size is
    * Σ_k cnt_a(k)·cnt_b(k), computable from two key-sized count
    * aggregations and one key-sized join — thousands of times cheaper
    * than the join it predicts (the fact tables shuffle (key, count)
    * partials, never rows). One diagnosis row:
    * (n_left, n_right, keys_left, keys_right, keys_matched, out_rows,
    * max_key_out, amplification), where amplification =
    * out_rows / max(n_left, n_right) (1e-6-quantized) — > 1 means the
    * join EXPANDS and downstream operators size accordingly.
    *
    * Exact long arithmetic throughout; overflow bound: Σ cnt_a·cnt_b
    * < 2⁶³ — past ~9.2e18 predicted rows the JOIN is the problem, not
    * the counter.
    */
  def joinCardinality(left: DataFrame, right: DataFrame,
                      key: String): DataFrame = {
    val ca = left.groupBy(col(key).as("k")).agg(count(lit(1)).as("ca"))
    val cb = right.groupBy(col(key).as("k")).agg(count(lit(1)).as("cb"))
    val la = ca.agg(sum(col("ca")).as("n_left"),
      count(lit(1)).as("keys_left"))
    val lb = cb.agg(sum(col("cb")).as("n_right"),
      count(lit(1)).as("keys_right"))
    ca.join(cb, Seq("k"), "inner")
      .agg(count(lit(1)).as("keys_matched"),
        coalesce(sum(col("ca") * col("cb")), lit(0L)).as("out_rows"),
        coalesce(max(col("ca") * col("cb")), lit(0L)).as("max_key_out"))
      .crossJoin(broadcast(la)).crossJoin(broadcast(lb))
      .select(col("n_left"), col("n_right"), col("keys_left"),
        col("keys_right"), col("keys_matched"), col("out_rows"),
        col("max_key_out"),
        (round(col("out_rows").cast("double") /
          greatest(col("n_left"), col("n_right")) * 1e6) / 1e6)
          .as("amplification"))
  }

  /** [[joinCardinality]]'s DuckDB replay. */
  def joinCardinalityOracleSql(leftTable: String, rightTable: String,
                               key: String): String =
    s"""WITH a AS (SELECT $key AS k, COUNT(*) AS ca FROM $leftTable
       |           GROUP BY 1),
       |b AS (SELECT $key AS k, COUNT(*) AS cb FROM $rightTable GROUP BY 1),
       |ta AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_left,
       |              COUNT(*) AS keys_left FROM a),
       |tb AS (SELECT CAST(SUM(cb) AS BIGINT) AS n_right,
       |              COUNT(*) AS keys_right FROM b),
       |j AS (SELECT COUNT(*) AS keys_matched,
       |             CAST(COALESCE(SUM(ca * cb), 0) AS BIGINT) AS out_rows,
       |             CAST(COALESCE(MAX(ca * cb), 0) AS BIGINT)
       |               AS max_key_out
       |      FROM a JOIN b USING (k))
       |SELECT n_left, n_right, keys_left, keys_right, keys_matched,
       |       out_rows, max_key_out,
       |       round(CAST(out_rows AS DOUBLE)
       |             / greatest(n_left, n_right) * 1e6) / 1e6
       |         AS amplification
       |FROM j, ta, tb""".stripMargin

  /** Per-group Gini coefficient of a non-negative integer measure — the
    * concentration/inequality audit (is one source hogging the corpus
    * bytes?): G = Σ(2i−n−1)·x₍ᵢ₎ / (n·Σx) over each group's ascending
    * values. Everything is long arithmetic until the single final
    * division, so the result is bitwise on any engine; ties need no
    * ordering tie-break because Σ(2i−n−1)x is invariant under
    * permutations within equal values.
    *
    * Overflow bound: n·Σx must fit a long. Gini is scale-invariant, so a
    * corpus where it wouldn't (≳10⁹ rows of ≳10⁹-sized values per group)
    * divides the measure by a constant first and gets the identical
    * coefficient.
    *
    * Scale shape: one keyed window (rank within group) feeding one hash
    * aggregation — a single Exchange on the group key; parallelism
    * follows group cardinality.
    */
  def giniByGroup(df: DataFrame, group: String, value: String): DataFrame = {
    val w = Window.partitionBy(col(group)).orderBy(col("x"))
    df.select(col(group), col(value).cast("long").as("x"))
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col(group))
      .agg(count(lit(1)).as("n_rows"), sum(col("x")).as("total"),
        sum((lit(2L) * col("i") - lit(1L)) * col("x")).as("wsum"))
      .select(col(group), col("n_rows"), col("total"),
        (round((col("wsum") - col("n_rows") * col("total")).cast("double") /
          (col("n_rows") * col("total")).cast("double") * 1e6) / 1e6)
          .as("gini"))
  }
}
