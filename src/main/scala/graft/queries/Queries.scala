package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{Anonymize, AsofJoin, Decontaminate, Dedup, Embeddings, Mape, Multimodal, Quantiles, RangeJoin, Sampling, Scoring, Similarity, TimeSeries}
import graft.functions.TextFunctions

/** The engine's declared query inventory (SURVEY.md §2.9 Q1–Q20 plus the
  * LLM-data-pipeline extensions), each as a Spark plan builder and — where
  * DuckDB can express the identical semantics — an oracle SQL string the
  * driver checks hash-exact at sf0.01.
  *
  * Float determinism contract: every aggregated monetary/metric value is
  * quantized per-row to integer "cents" (`ROUND(x*100)`) BEFORE summing.
  * Per-row doubles are bit-identical across engines (same parquet input,
  * same IEEE ops); integer-valued double sums are exact in any accumulation
  * order; final divisions see identical operands. So Spark and DuckDB
  * results match bitwise without decimal-typed aggregation overhead.
  * Cosine/ratio outputs are rounded to 6 decimals to absorb sub-ulp
  * accumulation-order noise.
  */
object Queries {

  /** `oracle` is a static DuckDB SQL string; `dynamicOracle` covers the one
    * case a static string can't — SQL whose literals depend on the DATA
    * (q38 embeds centroids trained on the target table). Verify evaluates
    * dynamic oracles with its (session, sfDir) and merges them into the
    * oracle_sql.json dump, so the driver checks them like any other.
    */
  case class QueryDef(name: String,
                      run: (SparkSession, String) => DataFrame,
                      oracle: Option[String],
                      dynamicOracle: Option[(SparkSession, String) => String] = None)

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** The fixed query vector for the similarity queries: embeddings row
    * `vec_id = 0` (guaranteed by the testdata generator — ids are dense
    * from 0). One driver-side row fetch at plan-build time, by contract;
    * fail with a message rather than a bare NoSuchElementException.
    */
  private def queryVector(s: SparkSession, dir: String): Array[Double] = {
    val rows = t(s, dir, "embeddings").filter(col("vec_id") === 0)
      .select(col("embedding")).take(1)
    require(rows.nonEmpty, s"embeddings table in $dir has no vec_id=0 anchor row")
    rows(0).getSeq[Float](0).map(_.toDouble).toArray
  }

  /** Sum of per-row cent-quantized values, presented in original units. */
  private def centSum(c: org.apache.spark.sql.Column, scale: Double = 100.0) =
    sum(round(c * scale)) / scale

  /** q59's target language mix — deliberately non-uniform so every
    * non-binding stratum really downsamples. Shared by the Spark plan and
    * the oracle (interpolated literals).
    */
  private val MixtureTargets: Seq[(String, Double)] =
    Seq("en" -> 0.4, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.15, "zh" -> 0.15)

  /** q151's (field, m, u) weights — one list feeding both the Spark plan
    * and the oracle so the 1e-6-quantized log2 weight literals agree.
    */
  /** q03's oracle, shared with q184 (which renders its frame). */
  private lazy val wapeOracleSql: String =
    """WITH rev AS (
      |  SELECT l_orderkey,
      |         SUM(ROUND(l_extendedprice * (1 - l_discount) * 100)) AS act_c
      |  FROM lineitem GROUP BY 1
      |), hourly AS (
      |  SELECT CAST(o_orderdate AS DATE) AS proxy_date,
      |         ROUND(o_totalprice * 100) AS forecast,
      |         ROUND(o_totalprice * 100) AS backcast,
      |         act_c AS settlement,
      |         ABS(ROUND(o_totalprice * 100) - act_c) AS forecast_abs_error,
      |         ABS(ROUND(o_totalprice * 100) - act_c) AS backcast_abs_error,
      |         ABS(act_c) AS settlement_abs
      |  FROM orders JOIN rev ON o_orderkey = l_orderkey
      |), daily AS (
      |  SELECT proxy_date,
      |         SUM(forecast) AS forecast, SUM(backcast) AS backcast,
      |         SUM(settlement) AS settlement,
      |         SUM(forecast_abs_error) AS forecast_abs_error,
      |         SUM(backcast_abs_error) AS backcast_abs_error,
      |         SUM(settlement_abs) AS settlement_abs
      |  FROM hourly GROUP BY 1
      |)
      |SELECT strftime(proxy_date, '%Y-%m-%d') AS proxy_date,
      |       forecast_abs_error / settlement_abs AS forecast_mape,
      |       backcast_abs_error / settlement_abs AS backcast_mape,
      |       forecast, backcast, settlement,
      |       forecast_abs_error, backcast_abs_error, settlement_abs
      |FROM daily
      |WHERE settlement_abs <> 0
      |  AND NOT (forecast = 0 AND backcast = 0)
      |  AND NOT (forecast_abs_error = 0 AND backcast_abs_error = 0)""".stripMargin

  /** q184's oracle: q03's frame rendered through the DuckDB replay of
    * the ClientCsv grammar (see [[graft.sinks.ClientCsv.mwOracleSql]]).
    */
  private lazy val clientCsvOracleSql: String = {
    import graft.sinks.ClientCsv.{csvCellOracleSql => q, mwOracleSql => mw, pctOracleSql => pct}
    val cells = Seq(
      "start_time",
      pct("forecast_mape"), pct("backcast_mape"),
      mw("forecast"), mw("backcast"), mw("settlement"),
      mw("forecast - settlement"), mw("backcast_abs_error"))
    s"""WITH base AS ($wapeOracleSql),
       |disp AS (
       |  SELECT proxy_date || ' 00:00:00' AS start_time,
       |         forecast_mape, backcast_mape, forecast, backcast,
       |         settlement, backcast_abs_error
       |  FROM base
       |)
       |SELECT start_time,
       |       ${cells.map(q).mkString(" || ',' || ")} AS line
       |FROM disp""".stripMargin
  }

  private val LinkageFields: Seq[(String, Double, Double)] = Seq(
    ("name", 0.9, 0.001), ("segment", 0.9, 0.25), ("bal_cents", 0.85, 0.005))


  /** q59's oracle: identical arithmetic, identical operand order; shares
    * CAST to DOUBLE (DuckDB would otherwise type bare decimals as DECIMAL,
    * whose division truncates differently).
    */
  private lazy val mixtureOracleSql: String = {
    val values = MixtureTargets
      .map { case (s, p) => s"('$s', CAST($p AS DOUBLE))" }.mkString(", ")
    s"""WITH targets(stratum, share) AS (VALUES $values),
       |counts AS (
       |  SELECT lang AS stratum, COUNT(*) AS cnt FROM documents GROUP BY 1
       |), j AS (
       |  SELECT c.stratum, c.cnt, t.share FROM counts c JOIN targets t USING (stratum)
       |), s AS (
       |  SELECT MIN(cnt / share) AS scale FROM j
       |), rates AS (
       |  SELECT stratum, CAST(round(share * scale / cnt * 10000) AS BIGINT)
       |           AS keep_buckets
       |  FROM j, s
       |)
       |SELECT d.doc_id, d.lang, d.source
       |FROM documents d JOIN rates r ON d.lang = r.stratum
       |WHERE CAST(('0x' || substr(md5(d.lang || ':' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 < r.keep_buckets""".stripMargin
  }

  /** q49's fixed query — high-frequency corpus terms so tf spread is real.
    * Defined BEFORE `all`: the QueryDef seq evaluates eagerly at object
    * init, and a forward val reference would still be null there.
    */
  private val Bm25Terms = Seq("spark", "window", "merge")

  /** q89's brand rotation — shared by the Spark fixture and the oracle
    * (which embeds each brand's UTF-8 hex). Real registered brands, one
    * with a trailing space to exercise non-alphanumeric tag bytes.
    */
  private val Mp4Brands = Seq("isom", "mp42", "avc1", "M4A ")

  /** q90's phrase — two mid-frequency corpus terms (the oracle replays the
    * same token-window scan the index joins must equal).
    */
  private val SearchPhrase = "table value"

  /** q91's column set — types chosen so min/max render identically as
    * strings in both engines (integers, integral doubles, dates, chars).
    */
  private val StatsCols = Seq("l_orderkey", "l_quantity", "l_shipdate",
    "l_returnflag")

  /** q95's (column, quantization scale) set — scales sized so every
    * moment sum (Σx², Σxy) stays inside a 64-bit long at sf levels and
    * beyond (see [[graft.operators.ColumnStats.correlationMatrix]]).
    */
  private val CorrCols = Seq(("l_quantity", 1.0), ("l_extendedprice", 1.0),
    ("l_discount", 100.0))

  /** q96's fixed dictionary — mid-frequency corpus words plus one token
    * ("zeppelin") the corpus never contains, so the OOV path is exercised
    * on BOTH kinds of misses. Ids are 1-based list positions, OOV = 0.
    */
  private val EncodeVocab = Seq("table", "value", "part", "key", "agg",
    "row", "scan", "slow", "fast", "hash", "merge", "batch", "spark",
    "line", "sort", "window", "data", "column", "join", "zeppelin")

  val all: Seq[QueryDef] = Seq(

    // ── Q1: scan + filter + per-row projection (S2, F, P9) ────────────────
    QueryDef("q01_filter_project",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
                col("l_shipdate") < lit("1997-01-01").cast("date"))
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev")),
      Some("""SELECT l_orderkey, l_linenumber,
             |       l_extendedprice * (1 - l_discount) AS rev
             |FROM lineitem
             |WHERE l_shipdate >= DATE '1996-01-01'
             |  AND l_shipdate < DATE '1997-01-01'""".stripMargin)),

    // ── Q2: hourly hash-agg (A1/P5/P6) ────────────────────────────────────
    // Date keys are rendered `yyyy-MM-dd` strings in the OUTPUT (grouping
    // stays on the date value): parquet date32 and DuckDB DATE round-trip
    // through different host types, so string output makes the driver's
    // value-hash comparison representation-independent. Applies to every
    // date-keyed query below.
    QueryDef("q02_hourly_agg",
      (s, dir) => t(s, dir, "events")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("d"),
          hour(col("ts")).cast("long").as("h"))
        .agg(centSum(col("value")).as("sum_value")),
      Some("""SELECT strftime(ts, '%Y-%m-%d') AS d,
             |       CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
             |       SUM(ROUND(value * 100)) / 100.0 AS sum_value
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // ── Q3: WAPE through the Mape operators (A1–A3, P9, P10, F1–F3, J) ────
    // "hour" is bound to the order key, so the hourly grain is the order
    // grain: errors form per order, sum per day, ratio last — the A3
    // ordering contract on real operators.
    QueryDef("q03_wape",
      (s, dir) => {
        val rev = t(s, dir, "lineitem").groupBy(col("l_orderkey"))
          .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100))
            .as("act_c"))
        val raw = t(s, dir, "orders")
          .join(rev, col("o_orderkey") === col("l_orderkey"))
          .select(to_date(col("o_orderdate")).as("proxy_date"),
            col("o_orderkey").cast("int").as("hour"),
            round(col("o_totalprice") * 100).as("forecast"),
            round(col("o_totalprice") * 100).as("backcast"),
            col("act_c").as("settlement"))
        Mape.dailyMapeAggregation(Mape.hourlyAggregation(raw))
          .withColumn("proxy_date", date_format(col("proxy_date"), "yyyy-MM-dd"))
      },
      Some(wapeOracleSql)),

    // ── Q4: left equi-join against a dimension (J1) ───────────────────────
    QueryDef("q04_left_join",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"), "left")
        .select(col("c_custkey"), col("c_name"), col("n_name")),
      Some("""SELECT c_custkey, c_name, n_name
             |FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey""".stripMargin)),

    // ── Q5: anti-join new-keys shape (J2/F4/A5) ───────────────────────────
    QueryDef("q05_anti_join",
      (s, dir) => t(s, dir, "orders")
        .join(t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
            .select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .select(col("o_custkey")).distinct(),
      Some("""SELECT DISTINCT o_custkey FROM orders
             |WHERE o_custkey NOT IN
             |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')""".stripMargin)),

    // ── Q6: pivot long→wide (O3) ──────────────────────────────────────────
    QueryDef("q06_pivot",
      (s, dir) => t(s, dir, "events")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("d"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(centSum(col("value"))),
      Some("""SELECT strftime(ts, '%Y-%m-%d') AS d,
             |  SUM(CASE WHEN event_type='click' THEN ROUND(value*100) END)/100.0 AS click,
             |  SUM(CASE WHEN event_type='error' THEN ROUND(value*100) END)/100.0 AS error,
             |  SUM(CASE WHEN event_type='purchase' THEN ROUND(value*100) END)/100.0 AS purchase,
             |  SUM(CASE WHEN event_type='signup' THEN ROUND(value*100) END)/100.0 AS signup,
             |  SUM(CASE WHEN event_type='view' THEN ROUND(value*100) END)/100.0 AS view
             |FROM events GROUP BY 1""".stripMargin)),

    // ── Q7: top-k (TakeOrderedAndProject, not a global sort) ──────────────
    QueryDef("q07_topk",
      (s, dir) => t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(centSum(col("o_totalprice")).as("total"))
        .orderBy(col("total").desc, col("o_custkey").asc)
        .limit(10),
      Some("""SELECT o_custkey, SUM(ROUND(o_totalprice*100))/100.0 AS total
             |FROM orders GROUP BY 1
             |ORDER BY total DESC, o_custkey LIMIT 10""".stripMargin)),

    // ── Q8: distinct dedup (A5) ───────────────────────────────────────────
    QueryDef("q08_distinct",
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct(),
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")),

    // ── Q9: union-all + count (O4/A6) ─────────────────────────────────────
    QueryDef("q09_union_count",
      (s, dir) => t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .unionByName(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .groupBy(col("nationkey")).agg(count(lit(1)).as("cnt")),
      Some("""SELECT nationkey, COUNT(*) AS cnt FROM (
             |  SELECT c_nationkey AS nationkey FROM customer
             |  UNION ALL SELECT s_nationkey FROM supplier
             |) GROUP BY 1""".stripMargin)),

    // ── Q10: intersect / except set ops ───────────────────────────────────
    QueryDef("q10_setops",
      (s, dir) => {
        val c = t(s, dir, "customer").select(col("c_nationkey").as("k"))
        val sup = t(s, dir, "supplier").select(col("s_nationkey").as("k"))
        c.intersect(sup).withColumn("tag", lit("both"))
          .unionByName(c.except(sup).withColumn("tag", lit("cust_only")))
          .select(col("tag"), col("k"))
      },
      Some("""SELECT 'both' AS tag, k FROM
             |  (SELECT c_nationkey AS k FROM customer
             |   INTERSECT SELECT s_nationkey FROM supplier)
             |UNION ALL
             |SELECT 'cust_only' AS tag, k FROM
             |  (SELECT c_nationkey AS k FROM customer
             |   EXCEPT SELECT s_nationkey FROM supplier)""".stripMargin)),

    // ── Q11: word-boundary regex replace (U2) ─────────────────────────────
    QueryDef("q11_regex_replace",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          regexp_replace(col("text"), "\\bkey\\b", "ANON").as("anon_text")),
      Some("""SELECT doc_id, regexp_replace(text, '\bkey\b', 'ANON', 'g') AS anon_text
             |FROM documents""".stripMargin)),

    // ── Q12: paired zero/null filters (F1–F3) ─────────────────────────────
    QueryDef("q12_zero_pair_filter",
      (s, dir) => t(s, dir, "events")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("d"), col("user_id"))
        .agg(
          (sum(when(col("event_type") === "view", round(col("value") * 100))) / 100.0)
            .as("forecast"),
          (sum(when(col("event_type") === "click", round(col("value") * 100))) / 100.0)
            .as("actual"))
        .filter(col("forecast").isNotNull && col("actual").isNotNull &&
          !(col("forecast") === 0.0 && col("actual") === 0.0)),
      Some("""SELECT * FROM (
             |  SELECT strftime(ts, '%Y-%m-%d') AS d, user_id,
             |    SUM(CASE WHEN event_type='view' THEN ROUND(value*100) END)/100.0 AS forecast,
             |    SUM(CASE WHEN event_type='click' THEN ROUND(value*100) END)/100.0 AS actual
             |  FROM events GROUP BY 1, 2
             |) WHERE forecast IS NOT NULL AND actual IS NOT NULL
             |  AND NOT (forecast = 0 AND actual = 0)""".stripMargin)),

    // ── Q13: constant scaling + audit literals via Anonymize (P8/P11) ─────
    QueryDef("q13_scale_stamp",
      (s, dir) => Anonymize.stampAudit(
        Anonymize.scaleValues(
          t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice")),
          Seq("l_extendedprice"), 1.0125),
        timezone = "America/New_York", clock = Some("2026-01-01T00:00:00")),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice * 1.0125 AS l_extendedprice,
             |       '2026-01-01T00:00:00' AS process_time,
             |       'America/New_York' AS timezone
             |FROM lineitem""".stripMargin)),

    // ── Q14: sorted-label enumeration (O2 / dense_rank) ───────────────────
    QueryDef("q14_label_enum",
      (s, dir) => t(s, dir, "part").select(col("p_brand")).distinct()
        .withColumn("anon_idx",
          dense_rank().over(Window.orderBy(col("p_brand"))).cast("long")),
      Some("""SELECT p_brand, CAST(DENSE_RANK() OVER (ORDER BY p_brand) AS BIGINT) AS anon_idx
             |FROM (SELECT DISTINCT p_brand FROM part)""".stripMargin)),

    // ── Q15: grouping sets (A4) ───────────────────────────────────────────
    QueryDef("q15_grouping_sets",
      (s, dir) => t(s, dir, "events")
        .select(date_format(col("ts"), "yyyy-MM-dd").as("d"), col("event_type"),
          col("value"))
        .rollup(col("d"), col("event_type"))
        .agg(centSum(col("value")).as("sum_value"))
        .filter(col("d").isNotNull),
      Some("""SELECT strftime(ts, '%Y-%m-%d') AS d, event_type,
             |       SUM(ROUND(value*100))/100.0 AS sum_value
             |FROM events
             |GROUP BY GROUPING SETS ((strftime(ts, '%Y-%m-%d'), event_type), (strftime(ts, '%Y-%m-%d')))""".stripMargin)),

    // ── Q16: window frame — 7-row moving average ──────────────────────────
    QueryDef("q16_window_frame",
      (s, dir) => {
        val w = Window.orderBy(col("d")).rowsBetween(-6, 0)
        t(s, dir, "events")
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("d"))
          .agg(sum(round(col("value") * 100)).as("sv"))
          .select(col("d"), (col("sv") / 100.0).as("daily_total"),
            (sum(col("sv")).over(w) / count(col("sv")).over(w) / 100.0).as("avg7"))
      },
      Some("""WITH daily AS (
             |  SELECT strftime(ts, '%Y-%m-%d') AS d, SUM(ROUND(value*100)) AS sv
             |  FROM events GROUP BY 1
             |)
             |SELECT d, sv/100.0 AS daily_total,
             |  SUM(sv) OVER w / COUNT(sv) OVER w / 100.0 AS avg7
             |FROM daily
             |WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin)),

    // ── Q17: tumbling window, batch oracle for the streaming surface ──────
    QueryDef("q17_tumbling_window",
      (s, dir) => t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(centSum(col("value")).as("sum_value"))
        .select(col("window.start").cast("timestamp_ntz").as("window_start"),
          col("sum_value")),
      Some("""SELECT date_trunc('hour', ts) AS window_start,
             |       SUM(ROUND(value*100))/100.0 AS sum_value
             |FROM events GROUP BY 1""".stripMargin)),

    // ── Q18: JSON extraction (events.props) ───────────────────────────────
    QueryDef("q18_json_extract",
      (s, dir) => t(s, dir, "events")
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("cnt")),
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             |       COUNT(*) AS cnt
             |FROM events GROUP BY 1""".stripMargin)),

    // ── Q19: cosine similarity top-20 (north star) ────────────────────────
    QueryDef("q19_cosine_topk",
      (s, dir) => Similarity.topK(t(s, dir, "embeddings"), queryVector(s, dir),
        20, excludeId = Some(0L)),
      Some("""SELECT vec_id,
             |  ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
             |    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS cos
             |FROM embeddings WHERE vec_id <> 0
             |ORDER BY cos DESC, vec_id LIMIT 20""".stripMargin)),

    // ── Q20: text corpus stats (north star) ───────────────────────────────
    QueryDef("q20_text_stats",
      (s, dir) => t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars")),
      Some("""SELECT lang, COUNT(*) AS n_docs,
             |       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             |       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
             |FROM documents GROUP BY 1""".stripMargin)),

    // ── Q21: exact dedup groups (hash-groupBy) ────────────────────────────
    QueryDef("q21_dedup_exact",
      (s, dir) => Dedup.exactGroups(t(s, dir, "documents")),
      Some("""SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS cnt
             |FROM documents GROUP BY 1""".stripMargin)),

    // ── Q22: exact n-gram Jaccard near-dups via shingle-bucket join.
    //         Shingles with document frequency > 1000 are dropped on BOTH
    //         sides (Zipf-hot shingles are O(df²) join bombs with no
    //         near-dup signal — Dedup.DefaultMaxShingleDf) ─────────────────
    QueryDef("q22_neardup_jaccard",
      (s, dir) => Dedup.jaccardPairs(t(s, dir, "documents"), threshold = 0.8),
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
             |), sh0 AS (
             |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
             |  FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)
             |  WHERE len(t) >= 3
             |), keep AS (
             |  SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) <= 1000
             |), sh AS (
             |  SELECT sh0.doc_id, sh0.s FROM sh0 JOIN keep USING (s)
             |), sz AS (
             |  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1
             |), pairs AS (
             |  SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS common
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2
             |)
             |SELECT i, j,
             |       CAST(common AS DOUBLE) / CAST(x.n + y.n - common AS DOUBLE) AS jac
             |FROM pairs JOIN sz x ON i = x.doc_id JOIN sz y ON j = y.doc_id
             |WHERE CAST(common AS DOUBLE) / CAST(x.n + y.n - common AS DOUBLE) >= 0.8""".stripMargin)),

    // ── Q23: MinHash+LSH near-dups, oracle-checked end-to-end: with the
    //         portable md5 permutation hash, DuckDB replays signatures →
    //         banded candidates → exact-Jaccard verify identically.
    //         xxhash64 remains the operator's scale default; the ScalaTest
    //         subset-of-exact + recall checks still cover that path. ──────
    QueryDef("q23_minhash_lsh",
      (s, dir) => Dedup.minhashNearDups(t(s, dir, "documents"), threshold = 0.8,
        permHash = Dedup.Md5PermHash),
      Some(minhashOracleSql)),

    // ── Q24: SimHash near-dups, oracle-checked end-to-end: the portable
    //         md5-60-bit token hash lets DuckDB replay the sign-vote
    //         algorithm exactly (the oracle verifies by all-pairs Hamming,
    //         which equals the chunk-bucketed result — pigeonhole recall
    //         is exact at maxHamming ≤ 3). xxhash64 remains the operator's
    //         scale default. ──────────────────────────────────────────────
    QueryDef("q24_simhash",
      (s, dir) => Dedup.simhashPairs(t(s, dir, "documents"), maxHamming = 3,
        bits = 60, tokenHash = Dedup.Md5TokenHash),
      Some(simhashOracleSql)),

    // ── Q25: top-50 most-similar embedding pairs ──────────────────────────
    QueryDef("q25_cosine_pairs",
      (s, dir) => Similarity.cosinePairs(t(s, dir, "embeddings"), 50),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
             |SELECT a.vec_id AS i, b.vec_id AS j,
             |       ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos
             |FROM e a JOIN e b ON a.vec_id < b.vec_id
             |ORDER BY cos DESC, i, j LIMIT 50""".stripMargin)),

    // ── Q26: banded LSH ANN, oracle-checked end-to-end: the hyperplanes
    //         are a deterministic function of (planes, dim, seed), so the
    //         oracle embeds their literal values and replays signatures →
    //         band match → exact cosine rank in DuckDB. Recall ≥ 0.9 vs
    //         q19 additionally asserted in ScalaTest. ─────────────────────
    QueryDef("q26_ann_lsh",
      (s, dir) => Similarity.lshNeighbors(t(s, dir, "embeddings"),
        queryVector(s, dir), 20, planesPerBand = 2, bands = 8,
        excludeId = Some(0L)),
      Some(annOracleSql)),

    // ── Q27: text quality signals ─────────────────────────────────────────
    QueryDef("q27_text_quality",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"),
          TextFunctions.stopwordRatio(col("text")).as("stop_ratio"),
          TextFunctions.meanTokenLength(col("text")).as("mean_tok_len")),
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |  CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the','a'))) AS DOUBLE)
             |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio,
             |  CAST(list_sum(list_transform(string_split(text, ' '), x -> len(x))) AS DOUBLE)
             |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_tok_len
             |FROM documents""".stripMargin)),

    // ── Q28: token counting (whitespace + BPE-ish regex) ──────────────────
    QueryDef("q28_token_count",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("ws_tokens"),
          TextFunctions.subwordCount(col("text")).as("subword_tokens")),
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
             |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT)
             |    AS subword_tokens
             |FROM documents""".stripMargin)),

    // ── Q29: document fingerprints ────────────────────────────────────────
    QueryDef("q29_fingerprint",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          substring(TextFunctions.md5Fingerprint(col("text")), 1, 16).as("fp")),
      Some("SELECT doc_id, substring(md5(text), 1, 16) AS fp FROM documents")),

    // ── Q30: language-ID heuristic. The oracle replays the marker-count
    //         argmax in DuckDB: literal-marker occurrences via
    //         replace-length arithmetic (= non-overlapping regexp_count)
    //         and Spark's struct-max tie-break via list_max over
    //         (score, lang) structs. 25 regex scans per row on the Spark
    //         side: spread the narrow scan before the projection ──────────
    QueryDef("q30_langid",
      (s, dir) => Tables.ensureParallelism(t(s, dir, "documents"))
        .select(col("lang"), TextFunctions.langId(col("text")).as("predicted"))
        .groupBy(col("lang"), col("predicted")).agg(count(lit(1)).as("cnt")),
      Some(langIdOracleSql)),

    // ── Q31: label anonymization through the Anonymize operator (U2/O2) ───
    QueryDef("q31_label_anon",
      (s, dir) => Anonymize.anonymizeColumnLabels(
          t(s, dir, "documents").select(col("doc_id"), col("source")), "source")
        .select(col("doc_id"), col("source")),
      Some("""WITH dim AS (
             |  SELECT source,
             |         'ANON_CLIENT ' || CAST(DENSE_RANK() OVER (ORDER BY source) AS VARCHAR) AS anon
             |  FROM (SELECT DISTINCT source FROM documents)
             |)
             |SELECT d.doc_id, dim.anon AS source
             |FROM documents d JOIN dim USING (source)""".stripMargin)),

    // ── Q32: keyed blake2b pseudonymization — the RELATIONAL half is the
    //         oracle-checked surface: the pipeline runs TWICE against the
    //         same key store (fresh mapping, then upsert rerun) and emits
    //         per-lang audit counts DuckDB can replay without computing a
    //         single digest — n_uids = n_rows pins the mapping is a
    //         bijection (no hash collision, no key-table dup), n_stable =
    //         n_rows pins rerun-identical pseudonyms through the upsert
    //         path, n_len10 = n_rows pins the 5-byte hexdigest grammar.
    //         blake2b VALUE correctness (RFC 7693 vectors, SQL surface,
    //         persistence round-trip) stays pinned in Blake2bSpec — DuckDB
    //         structurally cannot oracle the digest itself. ───────────────
    QueryDef("q32_uid_pseudonym",
      (s, dir) => {
        val keyDir = s"${sys.props("java.io.tmpdir")}/graft-keys-${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("doc_id").as("orig"), col("lang"))
        // Materialize run 1 BEFORE the rerun: each upsert atomically swaps
        // the key-table files, so run 1's lazily-listed parquet paths are
        // gone by the time the joined plan executes. The checkpoint is the
        // run boundary — audit-sized (one row per document id + lang).
        val r1 = Anonymize.uidAnonymization(s, docs, "doc_id", keyDir)
          .select(col("orig"), col("lang"), col("doc_id").as("uid1"))
          .localCheckpoint(true)
        val r2 = Anonymize.uidAnonymization(s, docs, "doc_id", keyDir)
          .select(col("orig"), col("doc_id").as("uid2"))
        r1.join(r2, Seq("orig"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("uid1")).as("n_uids"),
            sum(when(col("uid1") === col("uid2"), 1L).otherwise(0L))
              .as("n_stable"),
            sum(when(length(col("uid1")) === 10, 1L).otherwise(0L))
              .as("n_len10"))
      },
      Some("""SELECT lang, COUNT(*) AS n_rows,
             |       COUNT(DISTINCT doc_id) AS n_uids,
             |       COUNT(*) AS n_stable,
             |       COUNT(*) AS n_len10
             |FROM documents GROUP BY lang""".stripMargin)),

    // ── Q33: zonal MAPE with pivot through the Mape operators (A4/O3) ─────
    QueryDef("q33_mape_zonal",
      (s, dir) => {
        val raw = t(s, dir, "events").select(
          to_date(col("ts")).as("proxy_date"),
          hour(col("ts")).as("hour"),
          col("event_type").as("zone"),
          round(col("value") * 100).as("forecast"),
          round(col("value") * 90).as("backcast"),
          round(col("value") * 110).as("settlement"))
        Mape.dailyMapeAggregation(Mape.hourlyAggregation(raw, zone = true), zone = true)
          .withColumn("proxy_date", date_format(col("proxy_date"), "yyyy-MM-dd"))
      },
      Some(zonalOracleSql)),

    // ── Q34: multimodal byte decoding — synthesize a real PNG header for
    //         even doc_ids and a JPEG (SOI + APP0 + SOF0) header for odd
    //         ones (width/height derived from doc metadata), then DECODE
    //         format + dimensions back from the payload BYTES via
    //         operators/Multimodal (binary slice → hex → base-16; the JPEG
    //         side is the bounded SOF marker walk, which must cross the
    //         APP0 segment to reach the dimensions). The oracle replays
    //         both decodes on the KNOWN generated layouts with fixed hex
    //         offsets; the walk's generality over variable layouts is
    //         pinned by MultimodalSpec. Payload crosses the oracle boundary
    //         as hex text so the driver's pandas compare never sees raw
    //         binary. ─────────────────────────────────────────────────────
    QueryDef("q34_multimodal_meta",
      (s, dir) => {
        val w = (col("n_chars") % 640 + 1).cast("long")
        val h = (col("doc_id") % 480 + 1).cast("long")
        val withPayload = t(s, dir, "documents").select(col("doc_id"),
          when(col("doc_id") % 2 === 0, Multimodal.pngHeaderPayload(w, h))
            .otherwise(Multimodal.jpegHeaderPayload(w, h)).as("payload"))
        Multimodal.withImageMeta(withPayload)
          .select(col("doc_id"),
            hex(col("payload")).as("payload_hex"),
            col("n_bytes"),
            col("media_meta.format").as("format"),
            col("media_meta.width").as("width"),
            col("media_meta.height").as("height"))
      },
      Some("""WITH p AS (
             |  SELECT doc_id,
             |         CASE WHEN doc_id % 2 = 0 THEN
             |           '89504E470D0A1A0A0000000D49484452'
             |           || lpad(upper(to_hex(n_chars % 640 + 1)), 8, '0')
             |           || lpad(upper(to_hex(doc_id % 480 + 1)), 8, '0')
             |           || '0806000000'
             |         ELSE
             |           'FFD8FFE000104A46494600010100000100010000FFC0001108'
             |           || lpad(upper(to_hex(doc_id % 480 + 1)), 4, '0')
             |           || lpad(upper(to_hex(n_chars % 640 + 1)), 4, '0')
             |           || '03'
             |         END AS ph
             |  FROM documents
             |)
             |SELECT doc_id, ph AS payload_hex,
             |       CAST(length(ph) / 2 AS BIGINT) AS n_bytes,
             |       CASE WHEN substring(ph, 1, 16) = '89504E470D0A1A0A' THEN 'png'
             |            WHEN substring(ph, 1, 6) = 'FFD8FF' THEN 'jpeg'
             |            ELSE 'unknown' END AS format,
             |       CASE WHEN doc_id % 2 = 0
             |            THEN CAST(('0x' || substring(ph, 33, 8)) AS BIGINT)
             |            ELSE CAST(('0x' || substring(ph, 55, 4)) AS BIGINT) END AS width,
             |       CASE WHEN doc_id % 2 = 0
             |            THEN CAST(('0x' || substring(ph, 41, 8)) AS BIGINT)
             |            ELSE CAST(('0x' || substring(ph, 51, 4)) AS BIGINT) END AS height
             |FROM p""".stripMargin)),

    // ── Q35: embedding-cosine near-dup pairs (exact, threshold form) ──────
    QueryDef("q35_embedding_neardup",
      (s, dir) => Similarity.cosineNearDups(t(s, dir, "embeddings"), 0.35),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
             |SELECT a.vec_id AS i, b.vec_id AS j,
             |       ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos
             |FROM e a JOIN e b ON a.vec_id < b.vec_id
             |WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.35""".stripMargin)),

    // ── Q36: session windows (30-minute gap) per user — the batch form of
    //         Structured Streaming's session_window; oracle is the classic
    //         gaps-and-islands construction. A new session starts when the
    //         gap since the previous event reaches the timeout (Spark's
    //         window is [start, last+gap), so an exactly-gap event is new).
    QueryDef("q36_session_window",
      (s, dir) => t(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), centSum(col("value")).as("sum_value"))
        .select(col("user_id"),
          date_format(col("session_window.start"),
            "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
          col("n_events"), col("sum_value")),
      Some("""WITH flagged AS (
             |  SELECT user_id, ts, value,
             |         CASE WHEN LAG(ts) OVER w IS NULL
             |                OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
             |              THEN 1 ELSE 0 END AS new_s
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
             |), sess AS (
             |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
             |                             ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM flagged
             |)
             |SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
             |       COUNT(*) AS n_events, SUM(ROUND(value * 100)) / 100.0 AS sum_value
             |FROM sess GROUP BY user_id, sid""".stripMargin)),

    // ── Q37: sliding windows (2-hour length, 1-hour slide): every event
    //         lands in exactly two windows; oracle unnests the two starts ──
    QueryDef("q37_sliding_window",
      (s, dir) => t(s, dir, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour"))
        .agg(centSum(col("value")).as("sum_value"), count(lit(1)).as("n_events"))
        .select(col("window.start").cast("timestamp_ntz").as("window_start"),
          col("sum_value"), col("n_events")),
      Some("""SELECT date_trunc('hour', ts) - INTERVAL (o.o) HOUR AS window_start,
             |       SUM(ROUND(value * 100)) / 100.0 AS sum_value,
             |       COUNT(*) AS n_events
             |FROM events, (VALUES (0), (1)) AS o(o)
             |GROUP BY 1""".stripMargin)),

    // ── Q38: IVF ANN, oracle-checked end-to-end. Training is deterministic
    //         (seeded init, fixed iterations, 9-decimal-quantized means),
    //         so the DYNAMIC oracle trains the same index at Verify time
    //         and embeds the centroids + probe ids as literals; DuckDB then
    //         replays assignment (argmin over ‖c‖²−2·v·c with the same
    //         operand order) → probe filter → exact cosine rank. ───────────
    QueryDef("q38_ivf_ann",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val idx = graft.operators.IVF.train(emb, k = 16)
        graft.operators.IVF.neighbors(emb, idx, queryVector(s, dir), 20,
          nProbe = 8, excludeId = Some(0L))
      },
      None,
      dynamicOracle = Some(ivfOracleSql)),

    // ── Q39: clustered dedup — connected components over the exact-Jaccard
    //         near-dup pair graph (q22's pairs). The oracle rebuilds the
    //         pair graph with q22's SQL and propagates min labels with a
    //         recursive CTE: walk accumulates (node, label of reachable
    //         node); MIN per node = the component's minimum doc_id, exactly
    //         the operator's cluster id. ───────────────────────────────────
    QueryDef("q39_dedup_clustered",
      (s, dir) => Dedup.connectedComponents(
        Dedup.jaccardPairs(t(s, dir, "documents"), threshold = 0.8)),
      Some("""WITH RECURSIVE toks AS (
             |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
             |), sh0 AS (
             |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
             |  FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)
             |  WHERE len(t) >= 3
             |), keep AS (
             |  SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) <= 1000
             |), sh AS (
             |  SELECT sh0.doc_id, sh0.s FROM sh0 JOIN keep USING (s)
             |), sz AS (
             |  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1
             |), cnt AS (
             |  SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS common
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2
             |), nd AS (
             |  SELECT i, j
             |  FROM cnt JOIN sz x ON i = x.doc_id JOIN sz y ON j = y.doc_id
             |  WHERE CAST(common AS DOUBLE) / CAST(x.n + y.n - common AS DOUBLE) >= 0.8
             |), edges AS (
             |  SELECT i, j FROM nd UNION ALL SELECT j AS i, i AS j FROM nd
             |), walk(doc_id, lbl) AS (
             |  SELECT DISTINCT i, i FROM edges
             |  UNION
             |  SELECT e.i, w.lbl FROM walk w JOIN edges e ON e.j = w.doc_id
             |)
             |SELECT doc_id, MIN(lbl) AS cluster FROM walk GROUP BY doc_id""".stripMargin)),

    // ── Q40: the corpus-dedup COMPOSITION end-to-end — exact collapse →
    //         MinHash+LSH near-dup over representatives → greedy keep-first
    //         — oracle-checked as one unit (previously only the stages were
    //         individually checked; PipelineSpec pinned the composition).
    //         Portable md5 permutation hash so DuckDB replays it; xxhash64
    //         stays the operator default. ──────────────────────────────────
    QueryDef("q40_dedup_corpus",
      (s, dir) => Dedup.dedupCorpus(t(s, dir, "documents"), threshold = 0.8,
        permHash = Dedup.Md5PermHash),
      Some(dedupCorpusOracleSql)),

    // ── Q41: as-of join — each click picks up the user's most recent
    //         purchase value at or before its timestamp. The operator is
    //         the union-tag + keyed-window shape (no join node, one
    //         shuffle); the oracle replays backward-as-of with a window
    //         over an inequality join (fine at oracle scale). State is
    //         collapsed per (user, ts) first: the operator's contract
    //         leaves same-instant duplicates undefined. ──────────────────
    QueryDef("q41_asof_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val probes = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val state = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("sval"))
        AsofJoin.asofJoin(probes, state, keys = Seq("user_id"),
            stateVals = Seq("sval"))
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
            col("value"),
            date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("asof_ts"),
            col("asof_sval").as("asof_value"))
      },
      Some("""WITH probes AS (
             |  SELECT event_id, user_id, ts, value FROM events
             |  WHERE event_type = 'click'
             |), state AS (
             |  SELECT user_id, ts, MAX(value) AS sval FROM events
             |  WHERE event_type = 'purchase' GROUP BY 1, 2
             |), j AS (
             |  SELECT p.event_id, s.ts AS sts, s.sval,
             |         ROW_NUMBER() OVER (PARTITION BY p.event_id
             |                            ORDER BY s.ts DESC) AS rn
             |  FROM probes p JOIN state s
             |    ON p.user_id = s.user_id AND s.ts <= p.ts
             |)
             |SELECT p.event_id, p.user_id,
             |       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, p.value,
             |       strftime(j.sts, '%Y-%m-%d %H:%M:%S.%f') AS asof_ts,
             |       j.sval AS asof_value
             |FROM probes p LEFT JOIN (SELECT * FROM j WHERE rn = 1) j
             |  USING (event_id)""".stripMargin)),

    // ── Q42: range (interval) join — every click landing inside the hour
    //         after a purchase by the same user, via the bucketized
    //         equi-join operator (keyless range joins would otherwise plan
    //         nested-loop; see RangeJoin scaladoc + PlanShapeSpec). A click
    //         inside two overlapping purchase windows matches twice — the
    //         match set, not a pick. ─────────────────────────────────────
    QueryDef("q42_range_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val probes = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val intervals = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("interval_id"), col("user_id"),
            col("ts").as("win_start"),
            (col("ts") + expr("INTERVAL 1 HOUR")).as("win_end"))
        RangeJoin.intervalJoin(probes, intervals, keys = Seq("user_id"))
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
            col("value"), col("interval_id"),
            date_format(col("win_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("win_start"))
      },
      Some("""WITH pur AS (
             |  SELECT event_id AS interval_id, user_id, ts AS win_start,
             |         ts + INTERVAL 1 HOUR AS win_end
             |  FROM events WHERE event_type = 'purchase'
             |), clk AS (
             |  SELECT event_id, user_id, ts, value FROM events
             |  WHERE event_type = 'click'
             |)
             |SELECT c.event_id, c.user_id,
             |       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, c.value,
             |       p.interval_id,
             |       strftime(p.win_start, '%Y-%m-%d %H:%M:%S.%f') AS win_start
             |FROM clk c JOIN pur p
             |  ON c.user_id = p.user_id
             | AND c.ts >= p.win_start AND c.ts < p.win_end""".stripMargin)),

    // ── Q43: heavy hitters per language via the native Misra–Gries
    //         aggregate (custom TypedImperativeAggregate, partial-merge
    //         across partitions). k = 256 far exceeds the corpus
    //         vocabulary, so the sketch is provably in its EXACT regime
    //         and the oracle is plain exact token counts; the approximate
    //         regime's ±n/(k+1) guarantee is spec-pinned instead. ────────
    QueryDef("q43_heavy_hitters",
      (s, dir) => t(s, dir, "documents")
        .select(col("lang"), explode(TextFunctions.tokens(col("text"))).as("tok"))
        .groupBy(col("lang"))
        .agg(graft.functions.GraftFunctions.heavy_hitters(col("tok"), 256).as("hh"))
        .select(col("lang"), explode(col("hh")).as("h"))
        .select(col("lang"), col("h.item").as("token"), col("h.count").as("cnt")),
      Some("""SELECT lang, t AS token, COUNT(*) AS cnt
             |FROM (SELECT lang, unnest(string_split(text, ' ')) AS t
             |      FROM documents)
             |GROUP BY 1, 2""".stripMargin)),

    // ── Q44: free-text PII scrubbing — the text-column counterpart of the
    //         structured anonymization surface. The corpus text is clean
    //         by construction, so the query SEEDS deterministic PII (an
    //         email, an IP, a phone, a card number derived from doc_id)
    //         into every row on both sides first — the q34 pattern — then
    //         scrubs. Patterns are the RE2-safe subset, so DuckDB replays
    //         the identical replace chain (generated from the same
    //         PiiPatterns list). ──────────────────────────────────────────
    QueryDef("q44_pii_scrub",
      (s, dir) => {
        val seeded = t(s, dir, "documents").select(col("doc_id"),
          concat(col("text"),
            lit(" contact user"), col("doc_id"),
            lit("@example.com at 10.0."), col("doc_id") % 256,
            lit(".7 or 555-123-4567 card 4111111111111111")).as("text"))
        seeded.select(col("doc_id"),
          TextFunctions.scrubPii(col("text")).as("clean"))
      },
      Some(piiOracleSql)),

    // ── Q45: group-wise exact quantiles (p25/p50/p75 of events.value per
    //         event_type). Values are quantized to integers and the probs
    //         are binary-exact quarters, so Spark's exact `percentile` and
    //         DuckDB's `quantile_cont` — different interpolation algebras —
    //         land on the identical double (see Quantiles scaladoc). The
    //         at-scale sketch path (`percentile_approx`) is spec-pinned in
    //         QuantilesSamplingSpec instead. ─────────────────────────────
    QueryDef("q45_group_quantiles",
      (s, dir) => Quantiles.groupQuantilesExact(
        t(s, dir, "events"), Seq("event_type"), col("value")),
      Some("""SELECT event_type, COUNT(*) AS cnt,
             |       quantile_cont(v, 0.25) / 1000.0 AS p25,
             |       quantile_cont(v, 0.50) / 1000.0 AS p50,
             |       quantile_cont(v, 0.75) / 1000.0 AS p75
             |FROM (SELECT event_type, CAST(round(value * 1000.0) AS DOUBLE) AS v
             |      FROM events)
             |GROUP BY 1""".stripMargin)),

    // ── Q46: deterministic stratified sampling — keep 3-in-20 (15%) of
    //         each language, where the keep/drop decision is a pure md5
    //         hash of the row key (reproducible across runs, engines, and
    //         partitionings — unlike RNG `sample()`). DuckDB replays the
    //         identical hash arithmetic, so the oracle checks the SELECTED
    //         ROW SET, not just a rate. ──────────────────────────────────
    QueryDef("q46_stratified_sample",
      (s, dir) => Sampling.stratifiedDeterministic(
          t(s, dir, "documents"), col("lang"), col("doc_id"), keep = 3, buckets = 20)
        .select("doc_id", "lang", "n_chars"),
      Some("""SELECT doc_id, lang, n_chars FROM documents
             |WHERE CAST(('0x' || substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 20 < 3""".stripMargin)),

    // ── Q47: URL parsing + per-domain source mix — the web-corpus
    //         curation query. The corpus has no URL column, so the query
    //         SEEDS a deterministic provenance URL per row (q34/q44
    //         pattern), then extracts domain/TLD with engine-portable
    //         regexes and aggregates the per-domain document mix. ────────
    QueryDef("q47_url_domains",
      (s, dir) => {
        val urled = t(s, dir, "documents").select(col("lang"), col("n_chars"),
          concat(lit("https://cdn"), (col("doc_id") % 7).cast("string"),
            lit(".example-"), col("lang"), lit(".org/p/"),
            col("doc_id").cast("string"),
            lit("?ref=r"), (col("doc_id") % 13).cast("string")).as("url"))
        urled.select(TextFunctions.urlDomain(col("url")).as("domain"),
            TextFunctions.urlTld(TextFunctions.urlDomain(col("url"))).as("tld"),
            col("n_chars"))
          .groupBy("domain", "tld")
          .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"))
      },
      Some("""WITH urled AS (
             |  SELECT lang, n_chars,
             |         'https://cdn' || CAST(doc_id % 7 AS VARCHAR) || '.example-'
             |         || lang || '.org/p/' || CAST(doc_id AS VARCHAR)
             |         || '?ref=r' || CAST(doc_id % 13 AS VARCHAR) AS url
             |  FROM documents
             |)
             |SELECT regexp_extract(url, 'https?://([^/?#]+)', 1) AS domain,
             |       regexp_extract(regexp_extract(url, 'https?://([^/?#]+)', 1),
             |                      '\.([A-Za-z]+)$', 1) AS tld,
             |       COUNT(*) AS docs, CAST(SUM(n_chars) AS BIGINT) AS chars
             |FROM urled
             |GROUP BY 1, 2""".stripMargin)),

    // ── Q48: unigram-LM quality scoring (perplexity-filter stand-in) —
    //         per-doc mean token log-prob under the corpus's own unigram
    //         distribution. Token log terms are 1e-6-quantized BEFORE the
    //         per-doc sum (integer sums are order-exact across engines);
    //         the ln() itself is the one cross-libm op, absorbed by the
    //         quantization. ────────────────────────────────────────────────
    QueryDef("q48_unigram_lm_score",
      (s, dir) => Scoring.unigramLogProbScore(t(s, dir, "documents")),
      Some(Scoring.unigramOracleSql)),

    // ── Q49: BM25 relevance (Lucene idf form) for a literal 3-term query,
    //         top-20 by (score desc, doc_id). Constants interpolate into
    //         the oracle from the same Scala doubles the plan uses. ───────
    QueryDef("q49_bm25",
      (s, dir) => Scoring.bm25(t(s, dir, "documents"), Bm25Terms),
      Some(Scoring.bm25OracleSql(Bm25Terms))),

    // ── Q50: train/eval contamination audit — for every doc of the eval
    //         slice (source = 'src0'), the fraction of its word trigrams
    //         found anywhere in the train slice. Exact counts + one
    //         division → bitwise. ────────────────────────────────────────
    QueryDef("q50_decontaminate",
      (s, dir) => Decontaminate.contamination(
        t(s, dir, "documents"), col("source") === "src0"),
      Some(Decontaminate.oracleSql("source = 'src0'"))),

    // ── Q51: per-group distinct cardinality — exact COUNT(DISTINCT) as the
    //         oracle-checked inventory entry; the at-scale path is the
    //         mergeable HLL++ sketch (`approx_count_distinct`), spec-pinned
    //         against this exact result within its rsd bound (DuckDB can't
    //         replay Spark's HLL bit-for-bit, so the sketch itself can't be
    //         oracled). ─────────────────────────────────────────────────────
    QueryDef("q51_distinct_users",
      (s, dir) => t(s, dir, "events")
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("users"),
          count(lit(1)).as("events")),
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS users,
             |       COUNT(*) AS events
             |FROM events GROUP BY 1""".stripMargin)),

    // ── Q52: within-document repetition score (Gopher-style quality
    //         signal): 1 − distinct/total over the doc's own trigram
    //         multiset. Pure expression work in the scan — no joins, no
    //         shuffle beyond none at all. ──────────────────────────────────
    QueryDef("q52_repetition",
      (s, dir) => {
        val sh = TextFunctions.shingles(col("text"), 3)
        t(s, dir, "documents")
          .filter(size(split(col("text"), " ")) >= 3)
          .select(col("doc_id"), size(sh).as("n_shingles"),
            size(array_distinct(sh)).as("uniq"),
            round(lit(1.0) - size(array_distinct(sh)) / size(sh), 6).as("rep"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
             |), sh AS (
             |  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
             |  FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)
             |  WHERE len(t) >= 3
             |)
             |SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_shingles,
             |       CAST(COUNT(DISTINCT s) AS INTEGER) AS uniq,
             |       round(1.0 - COUNT(DISTINCT s) / COUNT(*), 6) AS rep
             |FROM sh GROUP BY 1""".stripMargin)),

    // ── Q53: top-k per group (row_number over a keyed window) — the
    //         PARTITIONED counterpart of the global top-k q07; ties broken
    //         on event_id so the result set is deterministic. ─────────────
    QueryDef("q53_topk_per_group",
      (s, dir) => {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("value").desc, col("event_id").asc)
        t(s, dir, "events")
          .select(col("event_type"), col("event_id"), col("value"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 3)
      },
      Some("""SELECT event_type, event_id, value, CAST(rn AS INTEGER) AS rn
             |FROM (
             |  SELECT event_type, event_id, value,
             |         row_number() OVER (PARTITION BY event_type
             |                            ORDER BY value DESC, event_id ASC) AS rn
             |  FROM events)
             |WHERE rn <= 3""".stripMargin)),

    // ── Q54: fixed-width value histogram per event type — distribution
    //         shape at a glance; floor(value/width) is the same IEEE
    //         divide+floor in both engines. ────────────────────────────────
    QueryDef("q54_histogram",
      (s, dir) => t(s, dir, "events")
        .select(col("event_type"),
          floor(col("value") / lit(50.0)).cast("long").as("bin"))
        .groupBy("event_type", "bin").agg(count(lit(1)).as("cnt")),
      Some("""SELECT event_type, CAST(floor(value / 50.0) AS BIGINT) AS bin,
             |       COUNT(*) AS cnt
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // ── Q55: sliding token-window chunking (training-example packing) —
    //         64-token windows on a 48-token stride; pure narrow plan, no
    //         shuffle. ─────────────────────────────────────────────────────
    QueryDef("q55_token_chunks",
      (s, dir) => graft.operators.Chunking.tokenChunks(
        t(s, dir, "documents"), chunkSize = 64, stride = 48),
      Some(graft.operators.Chunking.tokenChunksOracleSql(64, 48))),

    // ── Q56: corpus-wide passage dedup — non-overlapping 32-token windows,
    //         each distinct passage kept only at its globally first
    //         (doc_id, chunk_idx); documents reassembled from survivors. ──
    QueryDef("q56_chunk_dedup",
      (s, dir) => graft.operators.Chunking.dedupChunks(
        t(s, dir, "documents"), chunkSize = 32),
      Some(graft.operators.Chunking.dedupChunksOracleSql(32))),

    // ── Q57: top-3 TF-IDF keywords per doc — idf 1e-6-quantized before the
    //         tf multiply so the score is an exact integer product; ties on
    //         term text. ────────────────────────────────────────────────────
    QueryDef("q57_tfidf_keywords",
      (s, dir) => Scoring.tfidfTopTerms(t(s, dir, "documents"), k = 3),
      Some(Scoring.tfidfOracleSql(3))),

    // ── Q58: concatenate-and-chunk packing index — per-source exclusive
    //         prefix sums place every doc in its 2048-token training
    //         sequence; the window is keyed by source, never global. ──────
    QueryDef("q58_sequence_packing",
      (s, dir) => graft.operators.Chunking.packOffsets(
        t(s, dir, "documents"), capacity = 2048),
      Some(graft.operators.Chunking.packOffsetsOracleSql(2048))),

    // ── Q59: domain-mixture resampling — downsample each language to hit
    //         the target mix with maximum retention; the binding stratum
    //         keeps everything. Keep-rates quantize to integer buckets, so
    //         both engines compare the same integers; the share literals
    //         interpolate from the same Scala doubles into the oracle. ────
    QueryDef("q59_mixture_resample",
      (s, dir) => Sampling.mixtureResample(
          t(s, dir, "documents"), MixtureTargets, col("lang"), col("doc_id"))
        .select("doc_id", "lang", "source"),
      Some(mixtureOracleSql)),

    // ── Q60: per-source document cap — at most 10 docs per source, chosen
    //         in deterministic md5 order (partitioning-invariant, unlike a
    //         head-of-partition take); keyed window, never global. ────────
    QueryDef("q60_source_cap",
      (s, dir) => Sampling.capPerGroup(
          t(s, dir, "documents"), col("source"), col("doc_id"), n = 10)
        .select("doc_id", "source", "lang"),
      Some("""SELECT doc_id, source, lang FROM (
             |  SELECT doc_id, source, lang,
             |         row_number() OVER (PARTITION BY source
             |                            ORDER BY md5(CAST(doc_id AS VARCHAR)),
             |                                     doc_id) AS rn
             |  FROM documents)
             |WHERE rn <= 10""".stripMargin)),

    // ── Q61: incremental near-dup — the daily-batch shape: docs ≥ 300 are
    //         the fresh batch, pairs touch fresh only, corpus × corpus is
    //         never generated. The oracle replays the FULL md5 pipeline and
    //         filters to fresh-touching pairs — equal by construction
    //         because the incremental plan computes over the union's
    //         posting list (and also spec-pinned on the xxhash64 path). ───
    QueryDef("q61_incremental_neardup",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        Dedup.incrementalNearDups(
          docs.filter(col("doc_id") < 300), docs.filter(col("doc_id") >= 300),
          permHash = Dedup.Md5PermHash)
      },
      Some(s"""WITH ${minhashPairCtes("documents", 0.8)}
              |SELECT i, j, jac FROM verified
              |WHERE i >= 300 OR j >= 300""".stripMargin)),

    // ── Q62: unicode text normalization — a deterministic "messy web
    //         text" suffix (decomposed accents, a BEL control char, space
    //         runs, trailing space) is appended to every doc, then cleaned:
    //         control strip → whitespace collapse → trim → NFC compose via
    //         the native NfcNormalize kernel. DuckDB's nfc_normalize is the
    //         same Unicode canonical composition; the regexes interpolate
    //         from the shared TextFunctions constants. ────────────────────
    QueryDef("q62_text_normalize",
      (s, dir) => {
        val messy = concat(col("text"),
          lit("  naïve caffè   über "))
        t(s, dir, "documents").select(col("doc_id"),
            length(messy).as("len_raw"),
            TextFunctions.cleanText(messy).as("clean"))
          .withColumn("len_clean", length(col("clean")))
      },
      Some(s"""WITH messy AS (
              |  SELECT doc_id, text || '  nai' || chr(776) || 've' || chr(7)
              |         || ' caffe' || chr(768) || '   u' || chr(776) || 'ber ' AS raw
              |  FROM documents
              |), c AS (
              |  SELECT doc_id, CAST(LENGTH(raw) AS INTEGER) AS len_raw,
              |         nfc_normalize(trim(regexp_replace(regexp_replace(raw,
              |           '${TextFunctions.CtlPattern}', '', 'g'),
              |           '${TextFunctions.HSpacePattern}', ' ', 'g'))) AS clean
              |  FROM messy)
              |SELECT doc_id, len_raw, clean,
              |       CAST(LENGTH(clean) AS INTEGER) AS len_clean FROM c""".stripMargin)),

    // ── Q63: hourly gap fill + forward fill — sparse observations
    //         (value > 100 keeps ~31% of spine hours) densified onto the
    //         observed [min, max] hourly grid per event type; `v` null on
    //         gap hours, `filled` carries the last observation forward. ───
    QueryDef("q63_gap_fill",
      (s, dir) => TimeSeries.gapFillHourly(
          t(s, dir, "events").filter(col("value") > 100),
          col("event_type"), col("ts"), col("value"))
        .select(col("series"),
          date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("h"),
          col("v"), col("filled")),
      Some("""WITH obs AS (
             |  SELECT event_type AS series, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
             |         SUM(round(value * 100)) / 100 AS v
             |  FROM events WHERE value > 100 GROUP BY 1, 2
             |), b AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM obs),
             |spine AS (
             |  SELECT s.series, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS h
             |  FROM (SELECT DISTINCT series FROM obs) s, b
             |), j AS (SELECT series, h, v FROM spine LEFT JOIN obs USING (series, h))
             |SELECT series, strftime(h, '%Y-%m-%d %H:%M:%S') AS h, v,
             |       last_value(v IGNORE NULLS) OVER (PARTITION BY series ORDER BY h
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
             |FROM j""".stripMargin)),

    // ── Q64: day-over-day deltas — lag window per series over the exact
    //         cent-quantized dailies; pct change null on first days and
    //         zero-previous days (NULLIF guard on both engines). ──────────
    QueryDef("q64_day_over_day",
      (s, dir) => TimeSeries.dayOverDay(
          t(s, dir, "events"), col("event_type"), col("ts"), col("value"))
        .select(col("series"), date_format(col("d"), "yyyy-MM-dd").as("d"),
          col("v"), col("delta"), col("pct")),
      Some("""WITH daily AS (
             |  SELECT event_type AS series, CAST(ts AS DATE) AS d,
             |         SUM(round(value * 100)) / 100 AS v
             |  FROM events GROUP BY 1, 2)
             |SELECT series, strftime(d, '%Y-%m-%d') AS d, v,
             |       v - lag(v) OVER w AS delta,
             |       round((v - lag(v) OVER w) / NULLIF(lag(v) OVER w, 0) * 100, 4) AS pct
             |FROM daily WINDOW w AS (PARTITION BY series ORDER BY d)""".stripMargin)),

    // ── Q65: symmetric int8 embedding quantization — per-vector
    //         scale = max|x|/127, elements rounded into [-127, 127];
    //         scan-side only, zero shuffles. The quantized vector rides a
    //         CSV string so the comparator sees scalar columns; identical
    //         IEEE divides and away-from-zero rounding on both engines. ───
    QueryDef("q65_embed_quantize",
      (s, dir) => Embeddings.quantizeInt8(t(s, dir, "embeddings"))
        .select(col("vec_id"), col("scale"),
          concat_ws(",", transform(col("q"), _.cast("string"))).as("q_csv")),
      Some("""WITH v AS (
             |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
             |  FROM embeddings
             |), s AS (
             |  SELECT vec_id, e,
             |         list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
             |  FROM v)
             |SELECT vec_id, scale,
             |       array_to_string(list_transform(e, x ->
             |         CASE WHEN scale = 0 THEN 0
             |              ELSE CAST(round(x / scale) AS INTEGER) END), ',') AS q_csv
             |FROM s""".stripMargin)),

    // ── Q66: per-group embedding centroids — element-wise means over
    //         vec_id % 8 groups, one keyed (grp, pos) aggregation with
    //         1e-6-quantized order-exact sums; class prototypes / cluster
    //         summaries for quality classifiers. ──────────────────────────
    QueryDef("q66_group_centroids",
      (s, dir) => Embeddings.groupCentroids(
        t(s, dir, "embeddings"), col("vec_id") % 8),
      Some("""WITH e AS (
             |  SELECT vec_id % 8 AS grp,
             |         generate_subscripts(embedding, 1) - 1 AS pos,
             |         CAST(unnest(embedding) AS DOUBLE) AS x
             |  FROM embeddings)
             |SELECT grp, CAST(pos AS BIGINT) AS pos, COUNT(*) AS n,
             |       round(SUM(round(x * 1000000)) / 1000000 / COUNT(*), 9) AS mean
             |FROM e GROUP BY 1, 2""".stripMargin)),

    // ── Q67: cross-corpus embedding contamination — train (vec_id < 400)
    //         × eval (vec_id ≥ 400) pairs with exact cosine ≥ 0.35; the
    //         eval side broadcasts, the train side never shuffles (the
    //         embedding-space analog of q50's trigram audit). ─────────────
    QueryDef("q67_embed_contamination",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.crossNearDups(
          emb.filter(col("vec_id") < 400), emb.filter(col("vec_id") >= 400),
          threshold = 0.35)
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
             |SELECT a.vec_id AS i, b.vec_id AS j,
             |       ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos
             |FROM e a, e b
             |WHERE a.vec_id < 400 AND b.vec_id >= 400
             |  AND ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.35""".stripMargin)),

    // ── Q68: unpivot/melt — q06's wide daily pivot back to long form
    //         (the reshape inverse the reference's pandas pipelines round-
    //         trip through); Spark `unpivot` keeps every (id, column) cell,
    //         mirrored by the UNION ALL stack. ────────────────────────────
    QueryDef("q68_unpivot",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        t(s, dir, "events")
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("d"))
          .pivot("event_type", types)
          .agg(centSum(col("value")))
          .unpivot(Array(col("d")), types.map(col).toArray, "event_type", "v")
      },
      Some("""WITH wide AS (
             |  SELECT strftime(ts, '%Y-%m-%d') AS d,
             |    SUM(CASE WHEN event_type='click' THEN ROUND(value*100) END)/100.0 AS click,
             |    SUM(CASE WHEN event_type='error' THEN ROUND(value*100) END)/100.0 AS error,
             |    SUM(CASE WHEN event_type='purchase' THEN ROUND(value*100) END)/100.0 AS purchase,
             |    SUM(CASE WHEN event_type='signup' THEN ROUND(value*100) END)/100.0 AS signup,
             |    SUM(CASE WHEN event_type='view' THEN ROUND(value*100) END)/100.0 AS view
             |  FROM events GROUP BY 1)
             |SELECT d, 'click' AS event_type, click AS v FROM wide UNION ALL
             |SELECT d, 'error', error FROM wide UNION ALL
             |SELECT d, 'purchase', purchase FROM wide UNION ALL
             |SELECT d, 'signup', signup FROM wide UNION ALL
             |SELECT d, 'view', view FROM wide""".stripMargin)),

    // ── Q69: distribution-rank windows — percent_rank / cume_dist /
    //         ntile(4) of each day within its event type's daily-sum
    //         distribution; keyed windows, standard SQL definitions on
    //         both engines, deterministic (v, d) ordering. ────────────────
    QueryDef("q69_rank_windows",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("d"))
          .agg(centSum(col("value")).as("v"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("v"), col("d"))
        daily.select(col("event_type"), col("d"), col("v"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"),
          ntile(4).over(w).as("quartile"))
      },
      Some("""WITH daily AS (
             |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS d,
             |         SUM(round(value*100))/100 AS v
             |  FROM events GROUP BY 1, 2)
             |SELECT event_type, d, v,
             |       round(percent_rank() OVER w, 6) AS pr,
             |       round(cume_dist() OVER w, 6) AS cd,
             |       CAST(ntile(4) OVER w AS INTEGER) AS quartile
             |FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY v, d)""".stripMargin)),

    // ── Q70: 7-day retention cohorts — of each day's active users, how
    //         many return exactly a week later; the (user, day+7) pair is
    //         a full equi-join key (both columns), so the self-join hash-
    //         partitions on it — no inequality scan. ──────────────────────
    QueryDef("q70_retention",
      (s, dir) => {
        val du = t(s, dir, "events")
          .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
        val base = du.groupBy(col("d")).agg(count(lit(1)).as("actives"))
        val ret = du.as("a").join(du.as("b"),
            col("a.user_id") === col("b.user_id") &&
              date_add(col("a.d"), 7) === col("b.d"))
          .groupBy(col("a.d").as("d")).agg(count(lit(1)).as("retained"))
        base.join(ret, Seq("d"), "left")
          .select(date_format(col("d"), "yyyy-MM-dd").as("d"), col("actives"),
            coalesce(col("retained"), lit(0L)).as("retained"),
            round(coalesce(col("retained"), lit(0L)) / col("actives") * 100, 4)
              .as("rate"))
      },
      Some("""WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
             |base AS (SELECT d, COUNT(*) AS actives FROM du GROUP BY 1),
             |ret AS (
             |  SELECT a.d, COUNT(*) AS retained
             |  FROM du a JOIN du b ON a.user_id = b.user_id AND b.d = a.d + 7
             |  GROUP BY 1)
             |SELECT strftime(d, '%Y-%m-%d') AS d, actives,
             |       COALESCE(retained, 0) AS retained,
             |       round(COALESCE(retained, 0) / actives * 100, 4) AS rate
             |FROM base LEFT JOIN ret USING (d)""".stripMargin)),

    // ── Q71: content-defined chunking — boundaries where the rolling
    //         4-token window hash ≡ 0 (mod 8), so chunk edges anchor to
    //         content and survive insertions (rsync/LBFS-style CDC at
    //         token grain; mean chunk ≈ 8 tokens). The md5 token hash is
    //         the oracle-portable form; xxhash64 is the scale default. ────
    QueryDef("q71_cdc_chunks",
      (s, dir) => graft.operators.Chunking.cdcChunks(
        t(s, dir, "documents"), window = 4, divisor = 8,
        boundaryHash = Dedup.Md5TokenHash),
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
             |), tok AS (
             |  SELECT doc_id, i - 1 AS pos, t[i] AS tok,
             |         CASE WHEN i >= 4 AND
             |           CAST(('0x' || substring(md5(t[i-3] || ' ' || t[i-2] || ' '
             |             || t[i-1] || ' ' || t[i]), 1, 15)) AS BIGINT) % 8 = 0
             |         THEN 1 ELSE 0 END AS b
             |  FROM toks, UNNEST(range(1, len(t) + 1)) AS r(i)
             |), cid AS (
             |  SELECT doc_id, pos, tok,
             |         -- cast: DuckDB widens window SUM(int) to HUGEINT
             |         CAST(COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |              AS BIGINT) AS chunk_idx
             |  FROM tok)
             |SELECT doc_id, chunk_idx, COUNT(*) AS n_tokens,
             |       string_agg(tok, ' ' ORDER BY pos) AS chunk_text
             |FROM cid GROUP BY 1, 2""".stripMargin)),

    // ── Q72: k-anonymity audit — quasi-identifier combinations (nation ×
    //         market segment) held by fewer than k=10 customers; the
    //         linkage-risk check that pseudonymizing direct identifiers
    //         doesn't cover. One map-side-partial hash aggregation. ───────
    QueryDef("q72_k_anonymity",
      (s, dir) => Anonymize.kAnonymityAudit(
        t(s, dir, "customer"), Seq("c_nationkey", "c_mktsegment"), k = 10),
      Some("""SELECT c_nationkey, c_mktsegment, COUNT(*) AS group_size
             |FROM customer GROUP BY 1, 2 HAVING COUNT(*) < 10""".stripMargin)),

    // ── Q73: semi join — customers with at least one early high-value
    //         order; left_semi never duplicates the probe side (the
    //         EXISTS shape), completing the join-type surface next to
    //         q04 (left) and q05 (anti). ──────────────────────────────────
    QueryDef("q73_semi_join",
      (s, dir) => {
        val hot = t(s, dir, "orders")
          .filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp") &&
            col("o_totalprice") > 450000)
        t(s, dir, "customer").as("c")
          .join(hot, col("c.c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      },
      Some("""SELECT c_custkey, c_name, c_nationkey FROM customer
             |WHERE c_custkey IN (
             |  SELECT o_custkey FROM orders
             |  WHERE o_orderdate < TIMESTAMP '1996-01-01'
             |    AND o_totalprice > 450000)""".stripMargin)),

    // ── Q74: full outer join — align two SPARSE hourly series (high-value
    //         click vs error sums) keeping one-sided hours from both; the
    //         union-of-keys alignment gap fill (q63) can't express with a
    //         left join. 32 click-only + 39 error-only + 1 shared hour at
    //         sf0.01, so all three arms are really exercised. ─────────────
    QueryDef("q74_full_outer",
      (s, dir) => {
        def hourly(typ: String, out: String) = t(s, dir, "events")
          .filter(col("event_type") === typ && col("value") > 200)
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(centSum(col("value")).as(out))
        hourly("click", "click_v").join(hourly("error", "error_v"),
            Seq("h"), "full_outer")
          .select(date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("h"),
            col("click_v"), col("error_v"))
      },
      Some("""WITH c AS (
             |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
             |         SUM(round(value*100))/100 AS click_v
             |  FROM events WHERE event_type = 'click' AND value > 200 GROUP BY 1
             |), e AS (
             |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
             |         SUM(round(value*100))/100 AS error_v
             |  FROM events WHERE event_type = 'error' AND value > 200 GROUP BY 1
             |)
             |SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS h, click_v, error_v
             |FROM c FULL JOIN e USING (h)""".stripMargin)),

    // ── Q75: per-group feature standardization — z-score + min-max of
    //         value within its event type, from cent-quantized moments
    //         (order-exact sums; never engine-dependent `stddev` merges);
    //         the normalization pass before thresholding quality scores
    //         across heterogeneous groups. ─────────────────────────────────
    QueryDef("q75_standardize",
      (s, dir) => Scoring.standardizeByGroup(
          t(s, dir, "events"), col("event_type"), col("value"),
          keep = Seq("event_id"))
        .select(col("event_id"), col("grp").as("event_type"), col("v").as("value"),
          col("z"), col("minmax")),
      Some("""WITH stats AS (
             |  SELECT event_type AS grp, COUNT(*) AS n,
             |         SUM(round(value*100))/100 AS s1,
             |         SUM(round(value*100)*round(value*100))/10000 AS s2,
             |         MIN(value) AS mn, MAX(value) AS mx
             |  FROM events GROUP BY 1)
             |SELECT e.event_id, e.event_type, e.value,
             |       round((e.value - s1/n) / sqrt((s2 - s1*s1/n)/(n-1)), 6) AS z,
             |       round((e.value - mn) / NULLIF(mx - mn, 0), 6) AS minmax
             |FROM events e JOIN stats ON e.event_type = stats.grp""".stripMargin)),

    // ── Q76: media frame sampling — every 24-byte-strided 32-byte window
    //         of an opaque payload (doc text bytes stand in; all-ASCII,
    //         verified, so DuckDB's char offsets equal Spark's byte
    //         offsets). The video/audio clip plumbing of Multimodal,
    //         scan-side only. ──────────────────────────────────────────────
    QueryDef("q76_frame_sample",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(Multimodal.sampleFrames(col("text").cast("binary"), 32, 24))
            .as(Seq("frame_idx", "frame")))
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          length(col("frame")).cast("long").as("n_bytes"),
          col("frame").cast("string").as("frame")),
      Some("""WITH f AS (
             |  SELECT doc_id, CAST(k AS BIGINT) AS frame_idx,
             |         substring(text, CAST(k * 24 + 1 AS INTEGER), 32) AS frame
             |  FROM documents,
             |       UNNEST(range(0, CAST(ceil(length(text) / 24.0) AS BIGINT))) AS r(k)
             |)
             |SELECT doc_id, frame_idx, CAST(length(frame) AS BIGINT) AS n_bytes, frame
             |FROM f""".stripMargin)),

    // ── Q77: session attribution — gaps-and-islands sessionization (the
    //         DataFrame form of q36's session_window) with deterministic
    //         first-touch / last-touch event types per session; ties on
    //         equal timestamps break by event_id on both engines. All
    //         windows keyed by user (and session) — one shuffle, reused
    //         across the lag, running-sum, and ranking windows. ───────────
    QueryDef("q77_session_attribution",
      (s, dir) => {
        val wu = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        val lagTs = lag(col("ts"), 1).over(wu)
        val sess = t(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("new_s", when(lagTs.isNull ||
            col("ts") >= lagTs + expr("INTERVAL 30 MINUTES"), 1).otherwise(0))
          .withColumn("sid", sum(col("new_s")).over(
            wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val ws = Window.partitionBy(col("user_id"), col("sid"))
        sess
          .withColumn("rf", row_number().over(
            ws.orderBy(col("ts"), col("event_id"))))
          .withColumn("rl", row_number().over(
            ws.orderBy(col("ts").desc, col("event_id").desc)))
          .groupBy(col("user_id"), col("sid"))
          .agg(date_format(min(col("ts")),
              "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
            count(lit(1)).as("n_events"),
            max(when(col("rf") === 1, col("event_type"))).as("first_touch"),
            max(when(col("rl") === 1, col("event_type"))).as("last_touch"))
          .select(col("user_id"), col("session_start"), col("n_events"),
            col("first_touch"), col("last_touch"))
      },
      Some("""WITH flagged AS (
             |  SELECT user_id, ts, event_id, event_type,
             |         CASE WHEN LAG(ts) OVER w IS NULL
             |                OR ts >= LAG(ts) OVER w + INTERVAL 30 MINUTE
             |              THEN 1 ELSE 0 END AS new_s
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
             |), sess AS (
             |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
             |                             ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM flagged
             |), ranked AS (
             |  SELECT *,
             |    row_number() OVER (PARTITION BY user_id, sid ORDER BY ts, event_id) AS rf,
             |    row_number() OVER (PARTITION BY user_id, sid ORDER BY ts DESC, event_id DESC) AS rl
             |  FROM sess
             |)
             |SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
             |       COUNT(*) AS n_events,
             |       MAX(CASE WHEN rf = 1 THEN event_type END) AS first_touch,
             |       MAX(CASE WHEN rl = 1 THEN event_type END) AS last_touch
             |FROM ranked GROUP BY user_id, sid""".stripMargin)),

    // ── Q78: ratio-to-report — each event type's share of its day's total
    //         via an UNORDERED partition window (full-frame aggregate, the
    //         window class q16/q69's ordered frames don't cover). The
    //         window sums integer cents, so accumulation order can't move
    //         a ulp; division to units happens after. ─────────────────────
    QueryDef("q78_share_of_day",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("d"), col("event_type"))
          .agg(sum(round(col("value") * 100)).as("vc"))
        val wd = Window.partitionBy(col("d"))
        daily.select(col("d"), col("event_type"), (col("vc") / 100).as("v"),
          round(col("vc") / sum(col("vc")).over(wd) * 100, 4).as("share"))
      },
      Some("""WITH daily AS (
             |  SELECT strftime(ts, '%Y-%m-%d') AS d, event_type,
             |         SUM(round(value * 100)) AS vc
             |  FROM events GROUP BY 1, 2)
             |SELECT d, event_type, vc / 100 AS v,
             |       round(vc / SUM(vc) OVER (PARTITION BY d) * 100, 4) AS share
             |FROM daily""".stripMargin)),

    // ── Q79: rollup with GROUPING markers — year × priority order totals
    //         with per-year subtotals and a grand total in one pass
    //         (Catalyst Expand; q15's grouping-sets cousin with subtotal
    //         levels); GROUPING() flags disambiguate real nulls from
    //         subtotal rows. ───────────────────────────────────────────────
    QueryDef("q79_rollup",
      (s, dir) => t(s, dir, "orders")
        .select(year(col("o_orderdate")).as("yr0"),
          col("o_orderpriority"), col("o_totalprice"))
        .rollup(col("yr0"), col("o_orderpriority"))
        .agg(grouping(col("yr0")).cast("long").as("g_yr"),
          grouping(col("o_orderpriority")).cast("long").as("g_pri"),
          count(lit(1)).as("n"),
          (sum(round(col("o_totalprice") * 100)) / 100).as("total"))
        .select(col("yr0").cast("long").as("yr"), col("o_orderpriority"),
          col("g_yr"), col("g_pri"), col("n"), col("total")),
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_orderpriority,
             |       CAST(GROUPING(year(o_orderdate)) AS BIGINT) AS g_yr,
             |       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
             |       COUNT(*) AS n, SUM(round(o_totalprice * 100)) / 100 AS total
             |FROM orders
             |GROUP BY ROLLUP (year(o_orderdate), o_orderpriority)""".stripMargin)),

    // ── Q80: incremental near-dup over PERSISTED state — q61's semantics
    //         answered without touching corpus text: the store (uncapped
    //         posting list + dfs + signatures, built once, parquet) serves
    //         the corpus side; only the fresh batch is shingled, and
    //         cap-flip repair keeps results bit-equal to recompute-from-
    //         union (DedupStateSpec). Same oracle as q61 — the equality IS
    //         the claim. Store build is inside the measurement (as q38's
    //         training); a deployment builds once and amortizes. ───────────
    QueryDef("q80_incremental_store",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val path = s"${System.getProperty("java.io.tmpdir")}/graft-dedup-state-q80"
        val store = graft.operators.DedupState.build(
          s, docs.filter(col("doc_id") < 300), path, hashTag = "md5")
        graft.operators.DedupState.incrementalNearDups(
          store, docs.filter(col("doc_id") >= 300))
      },
      Some(s"""WITH ${minhashPairCtes("documents", 0.8)}
              |SELECT i, j, jac FROM verified
              |WHERE i >= 300 OR j >= 300""".stripMargin)),

    // ── Q81: WAV/RIFF audio header decode — synthesize a canonical PCM
    //         WAV header per doc (sample rate / channels / bit depth /
    //         data size derived from doc metadata; every 4th doc gets a
    //         JUNK chunk the walk must skip), then DECODE the fields back
    //         from the payload BYTES via the bounded RIFF chunk walk (the
    //         audio counterpart of q34's JPEG SOF walk). The oracle
    //         reconstructs the identical byte layout with LE hex
    //         arithmetic — construction is checked via payload_hex,
    //         decode via the field columns; walk generality over
    //         truncated/foreign payloads is pinned by MultimodalSpec. ─────
    QueryDef("q81_wav_meta",
      (s, dir) => {
        val sr = element_at(array(lit(8000L), lit(16000L), lit(22050L),
          lit(44100L), lit(48000L)), (col("doc_id") % 5 + 1).cast("int"))
        val ch = col("doc_id") % 2 + 1
        val bits = (col("doc_id") % 3 + 1) * 8
        val dsz = col("n_chars").cast("long") * 50 + col("doc_id")
        val junk = col("doc_id") % 4 === 0
        // spread the scan first (the q186 discipline): the synth + byte
        // walk otherwise runs single-task inside the scan stage
        Tables.ensureParallelism(t(s, dir, "documents"))
          .select(col("doc_id"),
            Multimodal.wavHeaderPayload(sr, ch, bits, dsz, junk).as("payload"))
          .select(col("doc_id"), hex(col("payload")).as("payload_hex"),
            Multimodal.format(col("payload")).as("format"),
            Multimodal.wavMeta(col("payload")).as("m"))
          .select(col("doc_id"), col("payload_hex"), col("format"),
            col("m.channels").as("channels"),
            col("m.sample_rate").as("sample_rate"),
            col("m.bits_per_sample").as("bits_per_sample"),
            col("m.data_bytes").as("data_bytes"))
      },
      Some(wavOracleSql)),

    // ── Q82: IVF assignment through a PERSISTED index — train, save to
    //         parquet, RELOAD, then assign every vector to its cell in one
    //         scan (the argmin expression over the reloaded centroid
    //         literals) and histogram the cells. Closes the index-
    //         persistence loop under the oracle gate: training is
    //         deterministic and save/load is bit-exact (q9-quantized
    //         coordinates), so the DYNAMIC oracle retrains the same index
    //         at Verify time and must agree cell-for-cell — a reload drift
    //         of even one ulp would flip a boundary assignment and fail
    //         the hash. The at-scale shape: build/reuse the index from a
    //         sample, one full-scan assignment, centroid-sized state. ─────
    QueryDef("q82_ivf_assign",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val trained = graft.operators.IVF.train(emb, k = 8, iters = 3)
        val path = s"${System.getProperty("java.io.tmpdir")}/graft-ivf-index-q82"
        graft.operators.IVF.save(s, trained, path)
        val idx = graft.operators.IVF.load(s, path)
        emb.select(col("vec_id"),
            graft.operators.IVF.assignExpr(
              col("embedding").cast("array<double>"), idx).as("cid"))
          .groupBy(col("cid"))
          .agg(count(lit(1)).as("n_vectors"), min(col("vec_id")).as("min_vec_id"))
      },
      None,
      dynamicOracle = Some(ivfAssignOracleSql)),

    // ── Q83: incremental embedding near-dup over a PERSISTED similarity
    //         store — the embedding counterpart of q80: corpus vectors
    //         stored partitioned by their IVF cell, the batch assigns
    //         against centroid literals in its own scan, and the corpus
    //         read is partition-PRUNED to the batch's cells (pinned in
    //         EmbeddingStoreSpec). Cell colocation is the candidate
    //         semantics (the IVF analog of LSH banding) — deterministic,
    //         so the DYNAMIC oracle retrains the index and replays
    //         same-cell pairs exactly. ─────────────────────────────────────
    QueryDef("q83_embedding_store",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val path = s"${System.getProperty("java.io.tmpdir")}/graft-emb-store-q83"
        val store = graft.operators.EmbeddingStore.build(
          s, emb.filter(col("vec_id") >= 100), path, k = 8, iters = 3)
        graft.operators.EmbeddingStore.nearDupsAgainst(
          store, emb.filter(col("vec_id") < 100), threshold = 0.2)
      },
      None,
      dynamicOracle = Some(embeddingStoreOracleSql)),

    // ── Q84: corpus ADMISSION over the persisted store — the full
    //         composite a batch pipeline runs per increment: collapse
    //         exact duplicates within the batch, drop texts the stored
    //         corpus already holds (fingerprint anti-join — no corpus
    //         text), drop representatives near-dup to a stored doc or a
    //         smaller-id batch representative. The oracle replays every
    //         arm: reps → md5 anti-join → the md5 MinHash pipeline over
    //         (corpus ∪ unseen) filtered to admitted survivors. ───────────
    QueryDef("q84_incremental_admission",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val path = s"${System.getProperty("java.io.tmpdir")}/graft-dedup-state-q84"
        val store = graft.operators.DedupState.build(
          s, docs.filter(col("doc_id") < 300), path, hashTag = "md5")
        graft.operators.DedupState.incrementalDedup(
          store, docs.filter(col("doc_id") >= 300))
      },
      Some(admissionOracleSql)),

    // ── Q85: the FULL curation pipeline ([[pipelines.CorpusPipeline]])
    //         under one oracle — quality filter → langid filter → exact +
    //         near dedup → per-doc features, every arm replayed in DuckDB
    //         over the same documents scan. The one flag off default:
    //         Md5PermHash, so the MinHash arm is oracle-portable (q40's
    //         convention; xxhash64 stays the production default and is
    //         benched as dedup_corpus_xxhash64). ────────────────────────────
    QueryDef("q85_corpus_curate",
      (s, dir) => graft.pipelines.CorpusPipeline.curate(
          t(s, dir, "documents").select(col("doc_id"), col("text")),
          graft.pipelines.CorpusPipeline.Config(
            permHash = Dedup.Md5PermHash))
        .select(col("doc_id"), col("n_tokens"), col("mean_tok_len"),
          col("stop_ratio"), col("predicted_lang"), col("dup_count"),
          col("subword_tokens"), col("fingerprint")),
      Some(curateOracleSql)),

    // ── Q86: CUBE with GROUPING markers — event_type × day totals with
    //         BOTH one-dimension subtotal planes and the grand total in a
    //         single Expand pass (q79's rollup plus the day-only plane);
    //         completes the grouping surface: GROUPING SETS (q15), ROLLUP
    //         (q79), CUBE. ─────────────────────────────────────────────────
    QueryDef("q86_cube",
      (s, dir) => t(s, dir, "events")
        .select(col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("d"), col("value"))
        .cube(col("event_type"), col("d"))
        .agg(grouping(col("event_type")).cast("long").as("g_et"),
          grouping(col("d")).cast("long").as("g_d"),
          count(lit(1)).as("n"),
          (sum(round(col("value") * 100)) / 100).as("total")),
      Some("""SELECT event_type, strftime(ts, '%Y-%m-%d') AS d,
             |       CAST(GROUPING(event_type) AS BIGINT) AS g_et,
             |       CAST(GROUPING(strftime(ts, '%Y-%m-%d')) AS BIGINT) AS g_d,
             |       COUNT(*) AS n, SUM(round(value * 100)) / 100 AS total
             |FROM events
             |GROUP BY CUBE (event_type, strftime(ts, '%Y-%m-%d'))""".stripMargin)),

    // ── Q87: line-level boilerplate removal ([[Boilerplate]]) — the
    //         CCNet/RefinedWeb curation step: synthesize multi-line docs
    //         (every doc gets a copyright header; every 3rd a newsletter
    //         footer, every 7th a rights line; the body reflows the word
    //         stream 8 tokens per line), then strip lines appearing in
    //         ≥ 50 distinct docs and reassemble the survivors in order.
    //         The headers/footers cross the threshold, body lines don't —
    //         but both engines compute the SAME df, so the replay is exact
    //         by construction, not by luck. ────────────────────────────────
    QueryDef("q87_boilerplate_lines",
      (s, dir) => {
        val ml = concat(lit("copyright acme corp\n"),
          regexp_replace(col("text"), "((?:\\S+ ){7}\\S+) ", "$1\n"),
          when(col("doc_id") % 3 === 0, lit("\nsubscribe to our newsletter"))
            .otherwise(lit("")),
          when(col("doc_id") % 7 === 0, lit("\nall rights reserved"))
            .otherwise(lit("")))
        graft.operators.Boilerplate.stripCommonLines(
          t(s, dir, "documents").select(col("doc_id"), ml.as("text")),
          minDocs = 50)
      },
      Some(boilerplateOracleSql)),

    // ── Q88: fuzzy self-join ([[FuzzyJoin]]) — record linkage within edit
    //         distance 1 over customer names via SymSpell deletion-variant
    //         blocking + exact levenshtein verify; the oracle is the O(n²)
    //         cartesian form the blocking provably equals. ─────────────────
    QueryDef("q88_fuzzy_join",
      (s, dir) => graft.operators.FuzzyJoin.selfPairsWithin(
        t(s, dir, "customer").filter(col("c_custkey") < 500),
        maxDist = 1, idCol = "c_custkey", strCol = "c_name"),
      Some("""SELECT a.c_custkey AS i, b.c_custkey AS j,
             |       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
             |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
             |WHERE a.c_custkey < 500 AND b.c_custkey < 500
             |  AND levenshtein(a.c_name, b.c_name) <= 1""".stripMargin)),

    // ── Q89: MP4/ISO-BMFF container decode — synthesize a canonical video
    //         container header per doc (ftyp brand/minor from doc metadata;
    //         every 4th doc gets a free box the walk must skip; every 5th
    //         declares its mdat via the 64-bit largesize form), then DECODE
    //         the fields back from the payload BYTES via the bounded
    //         top-level box walk (the video counterpart of q81's RIFF
    //         walk). Construction is checked via payload_hex, decode via
    //         the field columns; walk generality (foreign payloads,
    //         truncation, EOF-sized boxes) is pinned by MultimodalSpec. ────
    QueryDef("q89_mp4_meta",
      (s, dir) => {
        val brand = element_at(array(Mp4Brands.map(lit): _*),
          (col("doc_id") % 4 + 1).cast("int"))
        val minor = col("doc_id") % 512
        val msz = col("n_chars").cast("long") * 100 + col("doc_id")
        // spread the scan first (the q186 discipline, see q81)
        Tables.ensureParallelism(t(s, dir, "documents"))
          .select(col("doc_id"),
            Multimodal.mp4HeaderPayload(brand, minor, msz,
              col("doc_id") % 4 === 0, col("doc_id") % 5 === 0).as("payload"))
          .select(col("doc_id"), hex(col("payload")).as("payload_hex"),
            Multimodal.format(col("payload")).as("format"),
            Multimodal.mp4Meta(col("payload")).as("m"))
          .select(col("doc_id"), col("payload_hex"), col("format"),
            col("m.major_brand").as("major_brand"),
            col("m.minor_version").as("minor_version"),
            col("m.n_boxes").as("n_boxes"),
            col("m.mdat_bytes").as("mdat_bytes"),
            col("m.has_moov").as("has_moov"))
      },
      Some(mp4OracleSql)),

    // ── Q90: exact phrase search ([[TextSearch]]) — the positional
    //         inverted-index query pattern: postings aligned by
    //         (doc, pos - offset) equi-joins, rarest term first; the
    //         oracle is the naive token-window scan the index joins
    //         provably equal. ──────────────────────────────────────────────
    QueryDef("q90_phrase_search",
      (s, dir) => graft.operators.TextSearch.phraseMatches(
        t(s, dir, "documents"), SearchPhrase),
      Some(phraseOracleSql)),

    // ── Q91: table statistics collection ([[ColumnStats]]) — per-column
    //         nulls / exact NDV / min / max in ONE pass (multi-distinct
    //         Expand plan), unpivoted to a tidy catalog frame; the numbers
    //         a CBO or data-quality gate consumes. `exact=false` flips to
    //         mergeable HLL++ sketches at corpus scale. ────────────────────
    QueryDef("q91_column_stats",
      (s, dir) => graft.operators.ColumnStats.collect(
        t(s, dir, "lineitem"), StatsCols),
      Some(columnStatsOracleSql)),

    // ── Q92: ordered conversion funnel — users reaching view → click-
    //         after-view → purchase-after-that-chain, via stacked
    //         strictly-earlier running windows (RANGE … AND 1 PRECEDING on
    //         epoch micros, so same-timestamp ties can NEVER satisfy
    //         "after" — deterministic under any row order, which a
    //         ROWS-frame would not be). One shuffle: both windows and the
    //         per-user rollup share the user_id partitioning. ──────────────
    QueryDef("q92_funnel",
      (s, dir) => {
        val uts = unix_micros(col("ts").cast("timestamp"))
        val before = Window.partitionBy(col("user_id")).orderBy(col("uts"))
          .rangeBetween(Window.unboundedPreceding, -1)
        val staged = t(s, dir, "events")
          .select(col("user_id"), col("event_type"), uts.as("uts"))
          .withColumn("mv",
            min(when(col("event_type") === "view", col("uts"))).over(before))
          .withColumn("vc", min(when(col("event_type") === "click" &&
            col("mv").isNotNull, col("uts"))).over(before))
        val perUser = staged.groupBy("user_id").agg(
          max((col("event_type") === "view").cast("int")).as("s1"),
          max((col("event_type") === "click" && col("mv").isNotNull)
            .cast("int")).as("s2"),
          max((col("event_type") === "purchase" && col("vc").isNotNull)
            .cast("int")).as("s3"))
        perUser.agg(
          count(when(col("s1") === 1, 1)).as("n1"),
          count(when(col("s2") === 1, 1)).as("n2"),
          count(when(col("s3") === 1, 1)).as("n3"))
          .select(expr("stack(3, 1L, 'view', n1, 2L, 'click_after_view', n2, " +
            "3L, 'purchase_after_chain', n3) AS (stage_idx, stage, n_users)"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type, epoch_us(ts) AS uts FROM events
             |), w1 AS (
             |  SELECT user_id, event_type, uts,
             |         MIN(CASE WHEN event_type = 'view' THEN uts END) OVER
             |           (PARTITION BY user_id ORDER BY uts
             |            RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mv
             |  FROM e
             |), w2 AS (
             |  SELECT *,
             |         MIN(CASE WHEN event_type = 'click' AND mv IS NOT NULL
             |                  THEN uts END) OVER
             |           (PARTITION BY user_id ORDER BY uts
             |            RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS vc
             |  FROM w1
             |), u AS (
             |  SELECT user_id,
             |         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS s1,
             |         MAX(CASE WHEN event_type = 'click' AND mv IS NOT NULL
             |                  THEN 1 ELSE 0 END) AS s2,
             |         MAX(CASE WHEN event_type = 'purchase' AND vc IS NOT NULL
             |                  THEN 1 ELSE 0 END) AS s3
             |  FROM w2 GROUP BY 1
             |), c AS (
             |  SELECT COUNT(CASE WHEN s1 = 1 THEN 1 END) AS n1,
             |         COUNT(CASE WHEN s2 = 1 THEN 1 END) AS n2,
             |         COUNT(CASE WHEN s3 = 1 THEN 1 END) AS n3
             |  FROM u
             |)
             |SELECT CAST(1 AS BIGINT) AS stage_idx, 'view' AS stage,
             |       n1 AS n_users FROM c
             |UNION ALL
             |SELECT 2, 'click_after_view', n2 FROM c
             |UNION ALL
             |SELECT 3, 'purchase_after_chain', n3 FROM c""".stripMargin)),

    // ── Q95: pairwise Pearson correlation matrix
    //         ([[graft.operators.ColumnStats.correlationMatrix]]) — raw
    //         moment sums as EXACT longs (the `corr` aggregate's streaming
    //         double sums are accumulation-order-dependent and can never
    //         hash-match), textbook formula over the moments cast to
    //         double; one aggregation pass for all pairs. ──────────────────
    QueryDef("q95_correlation",
      (s, dir) => graft.operators.ColumnStats.correlationMatrix(
        t(s, dir, "lineitem"), CorrCols),
      Some(corrOracleSql)),

    // ── Q96: vocabulary encoding ([[graft.operators.Vocabulary]]) — the
    //         tokenize-to-ids step training consumes: broadcast
    //         dictionary join over the exploded token stream, order-
    //         preserving reassembly, OOV → 0 (the oracle replays the id
    //         map as a CASE chain from the same vocab list). The PUBLIC
    //         result serializes the id array as a space-joined string:
    //         the verification harness canonicalizes rows by hashing
    //         cell values, and a list-typed cell is unhashable there —
    //         the in-engine API (Vocabulary.encode) still returns the
    //         typed array<int> for downstream packing. ────────────────────
    QueryDef("q96_vocab_encode",
      (s, dir) => graft.operators.Vocabulary.encode(
          t(s, dir, "documents"), EncodeVocab)
        .withColumn("ids_str", array_join(col("ids"), " "))
        .drop("ids"),
      Some(vocabOracleSql)),

    // ── Q97: per-group OLS trend
    //         ([[graft.operators.ColumnStats.groupRegression]]) — value
    //         regressed on hour-of-day per event type; q95's exact-moment
    //         discipline applied to the fit, so slope/intercept/r² replay
    //         bit-for-bit. One hash aggregation. ───────────────────────────
    QueryDef("q97_group_regression",
      (s, dir) => graft.operators.ColumnStats.groupRegression(
        t(s, dir, "events")
          .select(col("event_type"), hour(col("ts")).as("hx"), col("value")),
        Seq("event_type"), "hx", "value", xScale = 1.0, yScale = 1000.0),
      Some(regressionOracleSql)),

    // ── Q98: per-source token-distribution drift
    //         ([[graft.operators.Scoring.tokenKlDivergence]]) — KL(source
    //         ‖ corpus) over unigram mixes, the drift monitor that flags a
    //         source before it skews training. Log-ratio terms quantize to
    //         1e-6 longs and weight by INTEGER counts, so the per-group
    //         sum is exact and order-free; one explode feeds every
    //         aggregate (corpus totals derive from the same counts). ──────
    QueryDef("q98_token_kl",
      (s, dir) => graft.operators.Scoring.tokenKlDivergence(
        t(s, dir, "documents")),
      Some("""WITH toks AS (
             |  SELECT source AS g, unnest(string_split(text, ' ')) AS t
             |  FROM documents
             |), cst AS (
             |  SELECT g, t, COUNT(*) AS cst FROM toks GROUP BY 1, 2
             |), ct AS (
             |  SELECT t, CAST(SUM(cst) AS BIGINT) AS ct FROM cst GROUP BY 1
             |), ns AS (
             |  SELECT g, CAST(SUM(cst) AS BIGINT) AS ns FROM cst GROUP BY 1
             |), tot AS (
             |  SELECT CAST(SUM(ns) AS BIGINT) AS n FROM ns
             |)
             |SELECT g AS source, ns AS n_tokens,
             |       CAST(SUM(cst * CAST(round(ln((cst * n) / (ns * ct)) * 1e6)
             |                           AS BIGINT)) AS BIGINT)
             |         / 1e6 / ns AS kl
             |FROM cst JOIN ct USING (t) JOIN ns USING (g) CROSS JOIN tot
             |GROUP BY g, ns""".stripMargin)),

    // ── Q99: SCD Type-2 history build ([[graft.operators.Scd.scd2]]) —
    //         the event feed becomes per-user validity intervals over the
    //         tracked attribute (event_type), no-op re-statements
    //         collapsed, ties broken by event_id so the build is
    //         partitioning-invariant. Both windows share one Exchange. ────
    QueryDef("q99_scd2_history",
      (s, dir) => graft.operators.Scd.scd2(
        t(s, dir, "events"), Seq("user_id"), "ts", "event_id",
        Seq("event_type")),
      Some(graft.operators.Scd.scd2OracleSql(
        "events", Seq("user_id"), "ts", "event_id", Seq("event_type")))),

    // ── Q100: duplicated n-gram spans
    //          ([[graft.operators.Dedup.duplicatedNgramSpans]]) — exact
    //          substring dedup's token-level output: every 5-gram seen
    //          twice anywhere in the corpus marks its range; ranges merge
    //          to maximal per-doc spans. Keyed joins + keyed windows. ─────
    QueryDef("q100_dup_ngram_spans",
      (s, dir) => graft.operators.Dedup.duplicatedNgramSpans(
        t(s, dir, "documents"), n = 5, minCount = 2),
      Some(graft.operators.Dedup.duplicatedNgramSpansOracleSql(
        "documents", n = 5, minCount = 2))),

    // ── Q101: balanced training-shard assignment
    //          ([[graft.operators.Sharding.assignShards]]) — serpentine
    //          deal over token-weight-descending global rank; the rank is
    //          the distributed two-pass kind (range partition + keyed
    //          row_number + per-partition offsets), never a one-partition
    //          window. The oracle replays the same total order, so the
    //          assignment matches rank-for-rank. ──────────────────────────
    QueryDef("q101_shard_assign",
      (s, dir) => graft.operators.Sharding.assignShards(
          t(s, dir, "documents")
            .select(col("doc_id"),
              size(split(col("text"), " ")).cast("long").as("n_tokens")),
          numShards = 8, weight = col("n_tokens"), key = col("doc_id")),
      Some("""WITH w AS (
             |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
             |  FROM documents
             |), ranked AS (
             |  SELECT doc_id, n_tokens,
             |         row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1
             |           AS r0
             |  FROM w
             |)
             |SELECT doc_id, n_tokens,
             |       CAST(CASE WHEN r0 % 16 < 8 THEN r0 % 16
             |                 ELSE 15 - (r0 % 16) END AS INTEGER) AS shard
             |FROM ranked""".stripMargin)),

    // ── Q102: l-diversity audit
    //          ([[graft.operators.Anonymize.lDiversityAudit]]) — the
    //          homogeneity-attack check k-anonymity misses: quasi groups
    //          (nation × segment) whose balance-band sensitive attribute
    //          shows fewer than 6 distinct values. One distinct-per-group
    //          aggregation; the floor(x/2000) band is the same IEEE
    //          divide+floor on both engines. ───────────────────────────────
    QueryDef("q102_l_diversity",
      (s, dir) => Anonymize.lDiversityAudit(
        t(s, dir, "customer").withColumn("bal_band",
          floor(col("c_acctbal") / 2000).cast("long")),
        Seq("c_nationkey", "c_mktsegment"), "bal_band", l = 6),
      Some("""SELECT c_nationkey, c_mktsegment, COUNT(*) AS group_size,
             |       COUNT(DISTINCT CAST(floor(c_acctbal / 2000) AS BIGINT))
             |         AS distinct_sensitive
             |FROM customer GROUP BY 1, 2
             |HAVING COUNT(DISTINCT CAST(floor(c_acctbal / 2000) AS BIGINT)) < 6""".stripMargin)),

    // ── Q103: k-anonymity by suppression
    //          ([[graft.operators.Anonymize.kAnonymizeSuppress]]) — the
    //          ENFORCEMENT step downstream of q72's audit: generalize the
    //          quasi identifiers (nation → 5-wide band, balance → 2000-wide
    //          band), then drop every row whose generalized combination
    //          still occurs fewer than 10 times. Count + keyed equi-join
    //          back on the same keys; AQE broadcasts the survivor list. ────
    QueryDef("q103_k_suppress",
      (s, dir) => Anonymize.kAnonymizeSuppress(
        t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"),
          floor(col("c_nationkey") / 5).cast("long").as("nat_band"),
          floor(col("c_acctbal") / 2000).cast("long").as("bal_band")),
        Seq("c_mktsegment", "nat_band", "bal_band"), k = 10),
      Some("""WITH g AS (
             |  SELECT c_custkey, c_mktsegment,
             |         CAST(floor(c_nationkey / 5) AS BIGINT) AS nat_band,
             |         CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band
             |  FROM customer
             |), safe AS (
             |  SELECT c_mktsegment, nat_band, bal_band FROM g
             |  GROUP BY 1, 2, 3 HAVING COUNT(*) >= 10
             |)
             |SELECT c_mktsegment, nat_band, bal_band, c_custkey
             |FROM g JOIN safe USING (c_mktsegment, nat_band, bal_band)""".stripMargin)),

    // ── Q104: deterministic train/val/test split
    //          ([[graft.operators.Sampling.assignSplit]]) — membership is a
    //          pure function of doc_id (8/1/1 by md5 bucket), so reruns and
    //          incremental batches can never leak train rows into test the
    //          way seed-and-partitioning `randomSplit` can. Scan-side
    //          expression only; the oracle replays the identical bucket. ───
    QueryDef("q104_split_assign",
      (s, dir) => Sampling.assignSplit(
          t(s, dir, "documents"), col("doc_id"),
          Seq(("train", 8), ("val", 1), ("test", 1)), buckets = 10)
        .select("doc_id", "lang", "split"),
      Some("""WITH b AS (
             |  SELECT doc_id, lang,
             |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
             |              AS BIGINT) % 10 AS bk
             |  FROM documents
             |)
             |SELECT doc_id, lang,
             |       CASE WHEN bk < 8 THEN 'train'
             |            WHEN bk < 9 THEN 'val' ELSE 'test' END AS split
             |FROM b""".stripMargin)),

    // ── Q105: t-closeness audit
    //          ([[graft.operators.Anonymize.tClosenessAudit]]) — the
    //          distribution-distance check after q102's l-diversity: nation
    //          groups whose balance-band distribution sits farther than
    //          t=0.04 EMD from the table's. The cumulative EMD term is
    //          scaled-integer exact; only the final normalization divides
    //          in doubles (round 6), replayed identically by the oracle. ───
    QueryDef("q105_t_closeness",
      (s, dir) => Anonymize.tClosenessAudit(
        t(s, dir, "customer").withColumn("bal_band",
          floor(col("c_acctbal") / 2000).cast("long")),
        Seq("c_nationkey"), "bal_band", t = 0.04),
      Some("""WITH base AS (
             |  SELECT c_nationkey, CAST(floor(c_acctbal/2000) AS BIGINT) AS v
             |  FROM customer
             |), vals AS (SELECT v, COUNT(*) AS cnt_v FROM base GROUP BY 1),
             |tot AS (SELECT CAST(SUM(cnt_v) AS BIGINT) AS n_tot,
             |               COUNT(*) AS m FROM vals),
             |groups AS (SELECT c_nationkey, COUNT(*) AS group_size
             |           FROM base GROUP BY 1),
             |cells AS (SELECT c_nationkey, v, COUNT(*) AS cnt_gv
             |          FROM base GROUP BY 1, 2),
             |grid AS (
             |  SELECT g.c_nationkey, g.group_size, vt.v, vt.cnt_v, vt.n_tot,
             |         vt.m, COALESCE(c.cnt_gv, 0) AS cnt_gv
             |  FROM groups g
             |  CROSS JOIN (SELECT * FROM vals, tot) vt
             |  LEFT JOIN cells c
             |    ON c.c_nationkey = g.c_nationkey AND c.v = vt.v
             |), run AS (
             |  SELECT c_nationkey, group_size, n_tot, m,
             |         CAST(SUM(cnt_gv * n_tot - cnt_v * group_size)
             |              OVER (PARTITION BY c_nationkey ORDER BY v)
             |              AS BIGINT) AS r
             |  FROM grid)
             |SELECT c_nationkey, group_size,
             |       ROUND(CAST(SUM(ABS(r)) AS BIGINT) /
             |             (CAST(group_size AS DOUBLE) * MAX(n_tot) * (MAX(m) - 1)),
             |             6) AS emd
             |FROM run GROUP BY 1, 2
             |HAVING ROUND(CAST(SUM(ABS(r)) AS BIGINT) /
             |             (CAST(group_size AS DOUBLE) * MAX(n_tot) * (MAX(m) - 1)),
             |             6) > 0.04""".stripMargin)),

    // ── Q106: differentially private count release
    //          ([[graft.operators.Anonymize.dpNoisyCounts]]) — per-nation
    //          customer counts released through the Laplace mechanism at
    //          ε=1.0, with the uniform draw derived from the group key's
    //          md5 bucket (sticky, rerun-stable noise). Integer rounding
    //          makes the release bitwise even if `ln` differs in the last
    //          ulp between libms. ──────────────────────────────────────────
    QueryDef("q106_dp_counts",
      (s, dir) => Anonymize.dpNoisyCounts(
        t(s, dir, "customer"), Seq("c_nationkey"), epsilon = 1.0),
      Some("""WITH c AS (
             |  SELECT c_nationkey, COUNT(*) AS cnt FROM customer GROUP BY 1
             |), u AS (
             |  SELECT c_nationkey, cnt,
             |         (CAST(('0x' || substr(md5('graft-dp:' ||
             |            CAST(c_nationkey AS VARCHAR)), 1, 8)) AS BIGINT)
             |          % 1048576 + 0.5) / 1048576.0 AS uu
             |  FROM c)
             |SELECT c_nationkey,
             |       CAST(greatest(round(cnt - sign(uu - 0.5) *
             |              ln(1 - 2 * abs(uu - 0.5)) / 1.0), 0) AS BIGINT)
             |         AS noisy_count
             |FROM u""".stripMargin)),

    // ── Q107: Benford first-digit audit
    //          ([[graft.operators.ColumnStats.benfordAudit]]) — the
    //          fabricated-data screen over l_extendedprice: first
    //          significant digit via exact fixed-point string arithmetic
    //          (never float log10), χ² vs log10(1+1/d) summed order-free
    //          through 1e-6 quantization. ──────────────────────────────────
    QueryDef("q107_benford",
      (s, dir) => graft.operators.ColumnStats.benfordAudit(
        t(s, dir, "lineitem"), "l_extendedprice"),
      Some("""WITH f AS (
             |  SELECT CAST(round(abs(l_extendedprice) * 100) AS BIGINT) AS v
             |  FROM lineitem
             |), obs AS (
             |  SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INTEGER) AS digit,
             |         COUNT(*) AS observed
             |  FROM f WHERE v >= 1 GROUP BY 1
             |), tot AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM obs),
             |terms AS (
             |  SELECT digit, observed,
             |         ROUND(n * log10(1 + 1.0/digit), 4) AS expected,
             |         ROUND(pow(observed - n * log10(1 + 1.0/digit), 2) /
             |               (n * log10(1 + 1.0/digit)), 6) AS chi2_term
             |  FROM obs CROSS JOIN tot)
             |SELECT digit, observed, expected, chi2_term,
             |       CAST(SUM(CAST(round(chi2_term * 1e6) AS BIGINT)) OVER ()
             |            AS BIGINT) / 1e6 AS chi2
             |FROM terms""".stripMargin)),

    // ── Q108: per-group winsorization
    //          ([[graft.operators.Quantiles.winsorize]]) — clip event
    //          values into each event_type's [1/16, 15/16] exact-quantile
    //          band (binary-exact probs ⇒ bitwise-identical bounds across
    //          engines, q45's discipline); keeps row count, flags the
    //          clipped tails. ─────────────────────────────────────────────
    QueryDef("q108_winsorize",
      (s, dir) => Quantiles.winsorize(
          t(s, dir, "events"), Seq("event_type"), "value")
        .select(col("event_id"), col("event_type"),
          round(col("value"), 6).as("value_r"),
          round(col("value_w"), 6).as("value_w"),
          col("lo"), col("hi"), col("clipped")),
      Some("""WITH b AS (
             |  SELECT event_type,
             |         quantile_cont(CAST(round(value * 1000.0) AS DOUBLE), 0.0625)
             |           / 1000.0 AS lo,
             |         quantile_cont(CAST(round(value * 1000.0) AS DOUBLE), 0.9375)
             |           / 1000.0 AS hi
             |  FROM events GROUP BY 1)
             |SELECT e.event_id, e.event_type,
             |       ROUND(e.value, 6) AS value_r,
             |       ROUND(least(greatest(e.value, b.lo), b.hi), 6) AS value_w,
             |       b.lo, b.hi,
             |       (e.value < b.lo OR e.value > b.hi) AS clipped
             |FROM events e JOIN b USING (event_type)""".stripMargin)),

    // ── Q109: PageRank over the supplier↔customer trade graph
    //          ([[graft.operators.Graph.pageRank]]) — 5 iterations of the
    //          damped recurrence in scaled-integer arithmetic (order-free
    //          sums, partitioning-invariant, engine-replayable); the
    //          oracle unrolls the iterations as chained CTEs running the
    //          IDENTICAL integer recurrence. Node ids: supplier s → 2s,
    //          customer c → 2c+1; edges both directions of "supplier
    //          shipped to customer". ─────────────────────────────────────
    QueryDef("q109_pagerank",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_suppkey"))
        val ord = t(s, dir, "orders")
          .select(col("o_orderkey").as("ok"), col("o_custkey"))
        val sc = li.join(ord, "ok")
          .select((col("l_suppkey") * 2).as("src"),
            (col("o_custkey") * 2 + 1).as("dst"))
        val edges = sc.union(sc.select(col("dst").as("src"), col("src").as("dst")))
        graft.operators.Graph.pageRank(edges, iterations = 5)
      },
      Some(pageRankOracleSql(5))),

    // ── Q93: robust outlier audit — per-group median/MAD (the
    //         estimator outliers can't poison, unlike mean/stddev) and the
    //         0.6745-scaled modified z-score flag at 3.5 (Iglewicz–Hoaglin).
    //         Exact percentiles over 1e-3-quantized values with the
    //         binary-exact 0.5 prob, so Spark's `percentile` and DuckDB's
    //         `quantile_cont` — different interpolation algebras — are
    //         BITWISE equal (q45's trick, pushed through two percentile
    //         levels: deviations of exact quarters are exact quarters).
    //         Group medians join back by BROADCAST (5 groups ≪ facts). ─────
    QueryDef("q93_robust_outliers",
      (s, dir) => {
        val v = t(s, dir, "events")
          .select(col("event_type"), round(col("value") * 1000).as("v"))
        val m = v.groupBy("event_type")
          .agg(percentile(col("v"), lit(0.5)).as("med"),
            count(lit(1)).as("n"))
        val d = v.join(broadcast(m), "event_type")
          .select(col("event_type"), col("n"), col("med"),
            abs(col("v") - col("med")).as("dev"))
        val md = d.groupBy("event_type")
          .agg(percentile(col("dev"), lit(0.5)).as("mad"))
        d.join(broadcast(md), "event_type")
          .groupBy(col("event_type"))
          .agg(first(col("n")).as("n"),
            (first(col("med")) / 1000.0).as("median"),
            (first(col("mad")) / 1000.0).as("mad_val"),
            count(when(col("dev") * 0.6745 > col("mad") * 3.5, 1))
              .as("n_outliers"))
      },
      Some("""WITH v AS (
             |  SELECT event_type, round(value * 1000) AS v FROM events
             |), m AS (
             |  SELECT event_type, quantile_cont(v, 0.5) AS med,
             |         COUNT(*) AS n
             |  FROM v GROUP BY 1
             |), d AS (
             |  SELECT v.event_type, m.n, m.med, abs(v.v - m.med) AS dev
             |  FROM v JOIN m USING (event_type)
             |), md AS (
             |  SELECT event_type, quantile_cont(dev, 0.5) AS mad
             |  FROM d GROUP BY 1
             |)
             |SELECT d.event_type, ANY_VALUE(d.n) AS n,
             |       ANY_VALUE(d.med) / 1000.0 AS median,
             |       ANY_VALUE(md.mad) / 1000.0 AS mad_val,
             |       COUNT(CASE WHEN d.dev * 0.6745 > md.mad * 3.5
             |                  THEN 1 END) AS n_outliers
             |FROM d JOIN md USING (event_type)
             |GROUP BY 1""".stripMargin)),

    // ── Q94: bigram collocation mining (PMI) — the phrase-discovery pass
    //         of corpus analysis: adjacent-token bigrams with count ≥ 5,
    //         scored by pointwise mutual information against the unigram
    //         margins, top 20. Bigrams come straight off the token array
    //         (narrow transform, no self-join); margins join back by
    //         BROADCAST (vocabulary ≪ corpus); ln is quantized to 1e-6
    //         (q48's replay contract). Deterministic ties: (pmi, w1, w2)
    //         total order on both sides. ───────────────────────────────────
    QueryDef("q94_collocations",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("t"))
        val bigrams = toks
          .filter(size(col("t")) >= 2) // sequence(0, -2) would run DOWNWARD
          .select(explode(expr(
            "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS w1, t[i+1] AS w2))"))
            .as("b"))
          .select(col("b.w1"), col("b.w2"))
          .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
          .filter(col("c12") >= 5)
        val uni = toks.select(explode(col("t")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("c1"))
        val nTotal = toks.agg(
          sum(greatest(size(col("t")) - 1, lit(0))).cast("double").as("nb"))
        bigrams
          .join(broadcast(uni.select(col("w").as("w1"), col("c1"))), "w1")
          .join(broadcast(uni.select(col("w").as("w2"), col("c1").as("c2"))), "w2")
          .crossJoin(broadcast(nTotal))
          .select(col("w1"), col("w2"), col("c12"),
            (round(log(col("c12") * col("nb") / (col("c1") * col("c2"))) * 1e6)
              / 1e6).as("pmi"))
          .orderBy(col("pmi").desc, col("w1"), col("w2"))
          .limit(20)
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
             |), bigrams AS (
             |  SELECT t[i] AS w1, t[i + 1] AS w2, COUNT(*) AS c12
             |  FROM toks, UNNEST(range(1, len(t))) AS r(i)
             |  GROUP BY 1, 2
             |  HAVING COUNT(*) >= 5
             |), uni AS (
             |  SELECT w, COUNT(*) AS c1
             |  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1
             |), nt AS (
             |  SELECT CAST(SUM(greatest(len(t) - 1, 0)) AS DOUBLE) AS nb
             |  FROM toks
             |)
             |SELECT b.w1, b.w2, b.c12,
             |       round(ln(b.c12 * nt.nb / (u1.c1 * u2.c1)) * 1e6) / 1e6
             |         AS pmi
             |FROM bigrams b
             |JOIN uni u1 ON b.w1 = u1.w
             |JOIN uni u2 ON b.w2 = u2.w, nt
             |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin)),

    // ── Q110: retention cohort matrix — the classic growth-analytics
    //          triangle: cohort = month of a customer's FIRST order; for
    //          every (cohort, months-since) cell, distinct returning
    //          customers and the retention ratio vs the cohort's own size.
    //          First-order month is one keyed aggregation; the join back is
    //          on the same key (co-partitioned, AQE turns it broadcast when
    //          the cohort map is small); cohort sizes (≤ #months rows)
    //          broadcast. months_between on month-truncated stamps is an
    //          exact integer, replayed in DuckDB as explicit year/month
    //          arithmetic. Ratio rounded to 6dp (exact division of small
    //          ints — the round is belt-and-braces). ──────────────────────
    QueryDef("q110_retention_cohort",
      (s, dir) => {
        val o = t(s, dir, "orders").select(col("o_custkey").as("cust"),
          trunc(col("o_orderdate"), "month").as("m"))
        val firsts = o.groupBy("cust").agg(min(col("m")).as("cohort"))
        val cells = o.join(firsts, "cust")
          .select(col("cohort"), col("cust"),
            months_between(col("m"), col("cohort")).cast("long")
              .as("months_since"))
          .groupBy("cohort", "months_since")
          .agg(countDistinct(col("cust")).as("n_custs"))
        val sizes = cells.filter(col("months_since") === 0)
          .select(col("cohort"), col("n_custs").as("cohort_size"))
        cells.join(broadcast(sizes), "cohort")
          .select(col("cohort"), col("months_since"), col("n_custs"),
            (round(col("n_custs").cast("double") / col("cohort_size") * 1e6)
              / 1e6).as("retention"))
      },
      Some("""WITH o AS (
             |  SELECT o_custkey AS cust, date_trunc('month', o_orderdate) AS m
             |  FROM orders
             |), f AS (
             |  SELECT cust, MIN(m) AS cohort FROM o GROUP BY 1
             |), cells AS (
             |  SELECT f.cohort,
             |         CAST(12 * (year(o.m) - year(f.cohort))
             |              + (month(o.m) - month(f.cohort)) AS BIGINT)
             |           AS months_since,
             |         COUNT(DISTINCT o.cust) AS n_custs
             |  FROM o JOIN f USING (cust) GROUP BY 1, 2
             |), sz AS (
             |  SELECT cohort, n_custs AS cohort_size FROM cells
             |  WHERE months_since = 0
             |)
             |SELECT c.cohort, c.months_since, c.n_custs,
             |       round(CAST(c.n_custs AS DOUBLE) / cohort_size * 1e6) / 1e6
             |         AS retention
             |FROM cells c JOIN sz USING (cohort)""".stripMargin)),

    // ── Q111: trailing 7-day distinct users per event type — the rolling
    //          engagement metric. Spark has no DISTINCT-in-window, and a
    //          collect_set window would hold per-frame sets in executor
    //          memory; the scalable plan is the classic explode-the-window
    //          rewrite: distinct (type, day, user) first (collapses the
    //          raw stream ~per-day-activity-fold), fan each activity row
    //          out to the ≤7 window days it participates in (narrow ×7,
    //          no shuffle), then ONE count-distinct aggregation keyed by
    //          (type, window-day). Days past the data's max are clipped by
    //          a broadcast one-row bound. ─────────────────────────────────
    QueryDef("q111_rolling_distinct",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val acts = ev.select(col("event_type"), to_date(col("ts")).as("d"),
          col("user_id")).distinct()
        val bound = ev.agg(max(to_date(col("ts"))).as("maxd"))
        acts
          .select(col("event_type"), col("user_id"),
            explode(expr("sequence(d, date_add(d, 6))")).as("wd"))
          .crossJoin(broadcast(bound))
          .filter(col("wd") <= col("maxd"))
          .groupBy(col("event_type"), col("wd").as("day"))
          .agg(countDistinct(col("user_id")).as("users_7d"))
      },
      Some("""WITH acts AS (
             |  SELECT DISTINCT event_type, CAST(ts AS DATE) AS d, user_id
             |  FROM events
             |), mx AS (SELECT MAX(CAST(ts AS DATE)) AS maxd FROM events)
             |SELECT event_type, d + CAST(x AS INTEGER) AS day,
             |       COUNT(DISTINCT user_id) AS users_7d
             |FROM acts, UNNEST(range(7)) AS t(x), mx
             |WHERE d + CAST(x AS INTEGER) <= maxd
             |GROUP BY 1, 2""".stripMargin)),

    // ── Q112: deterministic weighted sampling without replacement —
    //          Efraimidis–Spirakis A-Res: each doc draws u from its
    //          md5-derived uniform (the q46/q106 bucket trick: 20-bit
    //          lane + half-step, bias ≤ 2^-20) and survives by the k
    //          smallest keys -ln(u)/w, weight = n_chars. One scan + a
    //          TakeOrderedAndProject — no shuffle of the corpus, and the
    //          same rows win on any partitioning because the key is pure
    //          row arithmetic. Keys are 1e-6-quantized with doc_id
    //          tie-break so the cross-libm ln can't flip an ordering. ────
    QueryDef("q112_weighted_sample",
      (s, dir) => {
        import graft.functions.GraftFunctions.md5_lanes
        val u = ((element_at(
          md5_lanes(concat(lit("graft-ws:"), col("doc_id").cast("string"))), 1)
          % 1048576).cast("double") + 0.5) / 1048576.0
        t(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"),
            round(-log(u) / col("n_chars") * 1e9).cast("long").as("key9"))
          .orderBy(col("key9"), col("doc_id"))
          .limit(20)
      },
      Some("""WITH k AS (
             |  SELECT doc_id, source, n_chars,
             |         CAST(round(-ln((CAST(('0x' || substr(md5('graft-ws:' ||
             |                  CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             |                % 1048576 + 0.5) / 1048576.0)
             |              / n_chars * 1e9) AS BIGINT) AS key9
             |  FROM documents
             |)
             |SELECT doc_id, source, n_chars, key9
             |FROM k ORDER BY key9, doc_id LIMIT 20""".stripMargin)),

    // ── Q113: exact triangle count over the part-co-purchase graph —
    //          parts are linked when some order contains both. Pair
    //          generation is a keyed self-join on the order (bounded fanout:
    //          items-per-order choose 2); counting uses degree-ordered
    //          orientation (out-degree bounded by O(√m), never hub degree —
    //          the Suri–Vassilvitskii "last reducer" fix) with sorted-
    //          adjacency array-intersection closure, so the Σdeg² wedge
    //          table is never materialized (see Graph.triangleCount). Pure
    //          integer counting: the
    //          (deg, id) rank is a total order, so Spark and DuckDB agree
    //          bitwise with zero float anywhere. ──────────────────────────
    QueryDef("q113_triangle_count",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
          .distinct()
        val edges = li.as("x")
          .join(li.as("y"), col("x.ok") === col("y.ok") &&
            col("x.p") < col("y.p"))
          .select(col("x.p").as("src"), col("y.p").as("dst"))
        graft.operators.Graph.triangleCount(edges)
      },
      Some("""WITH li AS (
             |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
             |), e AS (
             |  SELECT DISTINCT x.p AS a, y.p AS b
             |  FROM li x JOIN li y ON x.ok = y.ok AND x.p < y.p
             |), deg AS (
             |  SELECT node, COUNT(*) AS deg
             |  FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
             |  GROUP BY 1
             |), o AS (
             |  SELECT CASE WHEN da.deg < db.deg
             |                   OR (da.deg = db.deg AND e.a < e.b)
             |              THEN e.a ELSE e.b END AS u,
             |         CASE WHEN da.deg < db.deg
             |                   OR (da.deg = db.deg AND e.a < e.b)
             |              THEN e.b ELSE e.a END AS x
             |  FROM e
             |  JOIN deg da ON e.a = da.node
             |  JOIN deg db ON e.b = db.node
             |), w AS (
             |  SELECT l.x AS a, r.x AS b
             |  FROM o l JOIN o r ON l.u = r.u AND l.x < r.x
             |)
             |SELECT COUNT(*) AS n_triangles FROM w JOIN e USING (a, b)"""
        .stripMargin)),

    // ── Q114: corpus snapshot diff — the data-versioning audit between two
    //          releases: added / removed / changed / unchanged counts per
    //          status. Both snapshots are derived deterministically from the
    //          one documents table (drop doc_id%11 from old → "added", drop
    //          %13 from new → "removed", revise text on %17 → "changed").
    //          Each side collapses to (key, md5 fingerprint) at the scan, so
    //          the full-outer join ships 32 bytes/row, never the text; one
    //          co-partitioned shuffle (see Scd.snapshotDiff). ──────────────
    QueryDef("q114_snapshot_diff",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val oldSnap = docs.filter(col("doc_id") % 11 =!= 0)
        val newSnap = docs.filter(col("doc_id") % 13 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 17 === 0, concat(col("text"), lit(" rev2")))
              .otherwise(col("text")))
        graft.operators.Scd
          .snapshotDiff(oldSnap, newSnap, Seq("doc_id"), Seq("text", "lang"))
          .groupBy("status").agg(count(lit(1)).as("n"))
      },
      Some("""WITH o AS (
             |  SELECT doc_id,
             |         md5(coalesce(text, chr(2)) || chr(1)
             |             || coalesce(lang, chr(2))) AS fp
             |  FROM documents WHERE doc_id % 11 <> 0
             |), n AS (
             |  SELECT doc_id,
             |         md5(coalesce(CASE WHEN doc_id % 17 = 0
             |                           THEN text || ' rev2' ELSE text END,
             |                      chr(2)) || chr(1)
             |             || coalesce(lang, chr(2))) AS fp
             |  FROM documents WHERE doc_id % 13 <> 0
             |)
             |SELECT CASE WHEN o.fp IS NULL THEN 'added'
             |            WHEN n.fp IS NULL THEN 'removed'
             |            WHEN o.fp <> n.fp THEN 'changed'
             |            ELSE 'unchanged' END AS status,
             |       COUNT(*) AS n
             |FROM o FULL OUTER JOIN n USING (doc_id)
             |GROUP BY 1""".stripMargin)),

    // ── Q115: Flesch reading-ease readability — the classic public quality
    //          signal (Flesch 1948) over the vowel-group syllable heuristic
    //          and punctuation-run sentences. Everything is a scan-side
    //          Column expression (two regexp passes + fixed double algebra
    //          quantized at 1e-4), zero shuffle; DuckDB replays the
    //          identical algebra bitwise. ────────────────────────────────
    QueryDef("q115_readability",
      (s, dir) => {
        import graft.functions.TextFunctions
        t(s, dir, "documents").select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n_words"),
          TextFunctions.sentenceCount(col("text")).as("n_sentences"),
          TextFunctions.syllableCount(col("text")).as("n_syllables"),
          TextFunctions.fleschReadingEase(col("text")).as("flesch"))
      },
      Some("""WITH f AS (
             |  SELECT doc_id,
             |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             |         CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')),
             |                       1) AS BIGINT) AS n_sentences,
             |         CAST(length(regexp_replace(lower(text),
             |                                    '[aeiouy]+', 'V', 'g'))
             |              - length(regexp_replace(lower(text),
             |                                      '[aeiouy]+', '', 'g'))
             |           AS BIGINT) AS n_syllables
             |  FROM documents
             |)
             |SELECT doc_id, n_words, n_sentences, n_syllables,
             |       round((206.835 - 1.015 * n_words / n_sentences
             |              - 84.6 * n_syllables / n_words) * 1e4) / 1e4
             |         AS flesch
             |FROM f""".stripMargin)),

    // ── Q116: length-bucketed batching audit — per 16-token length band:
    //          docs, real tokens, padded tokens at the bucket ceiling, and
    //          the padding-waste fraction (what dynamic batching saves over
    //          padding to the corpus max). One narrow projection into one
    //          map-side-combined hash aggregation on ≤ max_len/16 keys —
    //          no window, join, or sort (see Chunking.paddingAudit). ──────
    QueryDef("q116_padding_audit",
      (s, dir) => graft.operators.Chunking
        .paddingAudit(t(s, dir, "documents"), width = 16),
      Some(graft.operators.Chunking.paddingAuditOracleSql(16))),

    // ── Q117: near-containment pairs — the quotation/subset duplicates
    //          Jaccard structurally misses (long doc embedding a short one:
    //          jac ≈ |short|/|long|, containment ≈ 1). Same df-capped
    //          posting-list self-join as q22 but with NO symmetric size
    //          bound: tiny-inside-huge is exactly the target. Exact
    //          integer division keeps the score engine-portable. ──────────
    QueryDef("q117_containment",
      (s, dir) => graft.operators.Dedup
        .containmentPairs(t(s, dir, "documents"), threshold = 0.8),
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
             |), sh0 AS (
             |  SELECT DISTINCT doc_id,
             |         t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
             |  FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)
             |  WHERE len(t) >= 3
             |), keep AS (
             |  SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) <= 1000
             |), sh AS (
             |  SELECT sh0.doc_id, sh0.s FROM sh0 JOIN keep USING (s)
             |), sz AS (
             |  SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1
             |), pairs AS (
             |  SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS common
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2
             |)
             |SELECT i, j,
             |       CAST(common AS DOUBLE) / LEAST(si.sz, sj.sz)
             |         AS containment
             |FROM pairs
             |JOIN sz si ON si.doc_id = i
             |JOIN sz sj ON sj.doc_id = j
             |WHERE CAST(common AS DOUBLE) / LEAST(si.sz, sj.sz) >= 0.8"""
        .stripMargin)),

    // ── Q118: character-class entropy — the gibberish/random-string
    //          detector: Shannon entropy (nats) over 26 letters + space +
    //          "other". Counts are length deltas (no regexp, no explode),
    //          each ln(p) is 1e-6-quantized and weighted by the INTEGER
    //          count so the per-doc sum is an exact long (q48/q94/q98's
    //          portable-log discipline); one scan, zero shuffle. ──────────
    QueryDef("q118_char_entropy",
      (s, dir) => {
        import graft.functions.TextFunctions
        t(s, dir, "documents").select(col("doc_id"),
          TextFunctions.charEntropy(col("text")).as("entropy"))
      },
      Some(charEntropyOracleSql)),

    // ── Q119: interval union (Ben-Gan's packing problem) — total covered
    //          time per user from overlapping 5-minute activity intervals:
    //          merged islands via a running-max window (one Exchange + one
    //          sort serve both windows), then per-user island count and
    //          covered seconds. All integer epoch arithmetic — bitwise on
    //          any engine and partitioning. ──────────────────────────────
    // ── Q120: functional-dependency audit — "does user_id determine
    //          event_type?" with the violating keys, their fan-out, and
    //          row support. One exact distinct-per-group aggregation;
    //          Catalyst's two-phase plan shuffles deduped (key, value)
    //          pairs, never rows (see DataQuality.functionalDependency). ──
    QueryDef("q120_fd_audit",
      (s, dir) => graft.operators.DataQuality
        .functionalDependency(t(s, dir, "events"), Seq("user_id"),
          "event_type"),
      Some("""SELECT user_id, COUNT(DISTINCT event_type) AS n_dependent,
             |       COUNT(*) AS n_rows
             |FROM events GROUP BY 1
             |HAVING COUNT(DISTINCT event_type) > 1""".stripMargin)),

    // ── Q121: referential-integrity audit — orphaned foreign keys after a
    //          deterministic parent drop (orders with o_orderkey%7=0
    //          removed): one row per orphaned key with its child-row
    //          count. Child collapses to (key, count) BEFORE the anti
    //          join, so both join sides are key-sized (see
    //          DataQuality.orphanKeys). ─────────────────────────────────
    QueryDef("q121_orphan_keys",
      (s, dir) => graft.operators.DataQuality.orphanKeys(
        t(s, dir, "lineitem"), "l_orderkey",
        t(s, dir, "orders").filter(col("o_orderkey") % 7 =!= 0),
        "o_orderkey"),
      Some("""WITH ck AS (
             |  SELECT l_orderkey AS key, COUNT(*) AS n_rows
             |  FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1
             |)
             |SELECT key, n_rows FROM ck
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM orders
             |  WHERE o_orderkey % 7 <> 0 AND o_orderkey = ck.key)"""
        .stripMargin)),

    // ── Q122: primary-key candidate audit — declared combinations scored
    //          by (rows, distinct combos, null rows, is_key). One
    //          column-pruned aggregation pass per candidate (see
    //          DataQuality.keyCandidates). ────────────────────────────────
    QueryDef("q122_key_candidates",
      (s, dir) => graft.operators.DataQuality.keyCandidates(
        t(s, dir, "orders"),
        Seq(Seq("o_orderkey"), Seq("o_custkey"), Seq("o_orderdate"),
          Seq("o_custkey", "o_orderdate"))),
      Some(Seq(
        Seq("o_orderkey"), Seq("o_custkey"), Seq("o_orderdate"),
        Seq("o_custkey", "o_orderdate")).map { cand =>
          val rowExpr = s"ROW(${cand.mkString(", ")})"
          val anyNull = cand.map(c => s"$c IS NULL").mkString(" OR ")
          s"""SELECT '${cand.mkString(",")}' AS candidate,
             |       COUNT(*) AS n_rows,
             |       COUNT(DISTINCT $rowExpr) AS n_distinct,
             |       CAST(COALESCE(SUM(CASE WHEN $anyNull THEN 1 ELSE 0 END),
             |                     0) AS BIGINT) AS n_null_rows,
             |       COUNT(DISTINCT $rowExpr) = COUNT(*)
             |         AND COALESCE(SUM(CASE WHEN $anyNull THEN 1 ELSE 0 END),
             |                      0) = 0 AS is_key
             |FROM orders""".stripMargin
        }.mkString("\nUNION ALL\n"))),

    // ── Q123: chi-square independence audit — "is the language mix the
    //          same across sources?" One fact aggregation collapses to
    //          contingency cells; margins and the statistic are cell-sized.
    //          Per-cell (obs−exp)²/exp terms 1e-6-quantized and summed as
    //          longs (q107's discipline) → engine-replayable χ². ─────────
    QueryDef("q123_chi_square",
      (s, dir) => graft.operators.ColumnStats
        .chiSquare(t(s, dir, "documents"), "source", "lang"),
      Some("""WITH cells AS (
             |  SELECT source AS a, lang AS b, COUNT(*) AS obs
             |  FROM documents GROUP BY 1, 2
             |), ra AS (SELECT a, CAST(SUM(obs) AS BIGINT) AS ra
             |          FROM cells GROUP BY 1),
             |cb AS (SELECT b, CAST(SUM(obs) AS BIGINT) AS cb
             |       FROM cells GROUP BY 1),
             |nn AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells),
             |grid AS (
             |  SELECT ra.a, cb.b, ra.ra, cb.cb, nn.n,
             |         COALESCE(cells.obs, 0) AS obs
             |  FROM ra CROSS JOIN cb CROSS JOIN nn
             |  LEFT JOIN cells ON cells.a = ra.a AND cells.b = cb.b
             |), terms AS (
             |  SELECT n, obs,
             |         CAST(round(pow(obs - ra * cb / n, 2)
             |                    / (ra * cb / n) * 1e6) AS BIGINT) AS t6,
             |         a, b
             |  FROM grid
             |)
             |SELECT MIN(n) AS n, COUNT(*) AS n_cells,
             |       (COUNT(DISTINCT a) - 1) * (COUNT(DISTINCT b) - 1)
             |         AS dof,
             |       CAST(SUM(t6) AS BIGINT) / 1e6 AS chi2
             |FROM terms""".stripMargin)),

    // ── Q124: per-source Gini concentration of document length — is one
    //          source hogging the corpus bytes? Long arithmetic end to end
    //          (Σ(2i−n−1)x / nΣx) except the single final division; ties
    //          need no tie-break because the weighted sum is invariant
    //          within equal values. One keyed window + one hash agg. ──────
    QueryDef("q124_gini",
      (s, dir) => graft.operators.ColumnStats
        .giniByGroup(t(s, dir, "documents"), "source", "n_chars"),
      Some("""WITH ranked AS (
             |  SELECT source, CAST(n_chars AS BIGINT) AS x,
             |         CAST(row_number() OVER (PARTITION BY source
             |                                 ORDER BY n_chars) AS BIGINT)
             |           AS i
             |  FROM documents
             |), g AS (
             |  SELECT source, COUNT(*) AS n_rows,
             |         CAST(SUM(x) AS BIGINT) AS total,
             |         CAST(SUM((2 * i - 1) * x) AS BIGINT) AS wsum
             |  FROM ranked GROUP BY 1
             |)
             |SELECT source, n_rows, total,
             |       round((wsum - n_rows * total)
             |             / CAST(n_rows * total AS DOUBLE) * 1e6) / 1e6
             |         AS gini
             |FROM g""".stripMargin)),

    // ── Q125: Population Stability Index — distribution drift of document
    //          length between one source and the rest of the corpus, the
    //          ML-monitoring staple. Each side collapses to (bin, count)
    //          in one map-side-combined aggregation; Laplace smoothing
    //          over the union of bins keeps empty-vs-nonempty bins finite;
    //          per-bin terms 1e-6-quantized and summed as longs. ─────────
    QueryDef("q125_psi_drift",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        graft.operators.ColumnStats.psi(
          docs.filter(col("source") === "src0"),
          docs.filter(col("source") =!= "src0"),
          "n_chars", width = 100L)
      },
      Some("""WITH b AS (
             |  SELECT CAST(floor(CAST(n_chars AS BIGINT) / 100) AS BIGINT)
             |           AS bin, COUNT(*) AS n_base
             |  FROM documents WHERE source = 'src0' GROUP BY 1
             |), c AS (
             |  SELECT CAST(floor(CAST(n_chars AS BIGINT) / 100) AS BIGINT)
             |           AS bin, COUNT(*) AS n_cur
             |  FROM documents WHERE source <> 'src0' GROUP BY 1
             |), j AS (
             |  SELECT COALESCE(b.bin, c.bin) AS bin,
             |         COALESCE(n_base, 0) AS n_base,
             |         COALESCE(n_cur, 0) AS n_cur
             |  FROM b FULL OUTER JOIN c ON b.bin = c.bin
             |), tot AS (
             |  SELECT COUNT(*) AS k, CAST(SUM(n_base) AS BIGINT) AS tb,
             |         CAST(SUM(n_cur) AS BIGINT) AS tc
             |  FROM j
             |), t AS (
             |  SELECT bin, n_base, n_cur,
             |         CAST(round((CAST(n_base + 1 AS DOUBLE) / (tb + k)
             |                     - CAST(n_cur + 1 AS DOUBLE) / (tc + k))
             |                    * ln((CAST(n_base + 1 AS DOUBLE) / (tb + k))
             |                         / (CAST(n_cur + 1 AS DOUBLE)
             |                            / (tc + k))) * 1e6) AS BIGINT)
             |           AS t6
             |  FROM j, tot
             |)
             |SELECT bin, n_base, n_cur, t6 / 1e6 AS term,
             |       (SELECT CAST(SUM(t6) AS BIGINT) FROM t) / 1e6 AS psi
             |FROM t""".stripMargin)),

    // ── Q126: quantile-binned featurization — octile edges FIT on one
    //          source (binary-exact probs ⇒ bitwise edges, q45's
    //          contract), APPLIED corpus-wide as a pure scan-side
    //          edge-literal expression (zero joins), per-bucket counts +
    //          value range. The fit/transform feature pattern with the
    //          bounded k−1-edge driver pull (IVF's centroid discipline);
    //          persistence round-trip spec-pinned separately. ────────────
    QueryDef("q126_quantile_bins",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val edges = graft.operators.Quantiles.fitBins(
          docs.filter(col("source") === "src0"), col("n_chars"), k = 8)
        graft.operators.Quantiles.applyBins(docs, col("n_chars"), edges)
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"), min(col("n_chars")).as("lo"),
            max(col("n_chars")).as("hi"))
      },
      Some("""WITH src AS (
             |  SELECT CAST(round(n_chars * 1000.0) AS DOUBLE) AS v
             |  FROM documents WHERE source = 'src0'
             |), e AS (
             |  SELECT [quantile_cont(v, 0.125) / 1000.0,
             |          quantile_cont(v, 0.25) / 1000.0,
             |          quantile_cont(v, 0.375) / 1000.0,
             |          quantile_cont(v, 0.5) / 1000.0,
             |          quantile_cont(v, 0.625) / 1000.0,
             |          quantile_cont(v, 0.75) / 1000.0,
             |          quantile_cont(v, 0.875) / 1000.0] AS edges
             |  FROM src
             |)
             |SELECT CAST(len(list_filter(e.edges,
             |              x -> CAST(n_chars AS DOUBLE) >= x)) AS BIGINT)
             |         AS bucket,
             |       COUNT(*) AS n_docs,
             |       MIN(n_chars) AS lo, MAX(n_chars) AS hi
             |FROM documents, e
             |GROUP BY 1""".stripMargin)),

    // ── Q127: product-quantized ANN (Jégou et al. 2011) — per-subspace
    //          codebooks (m=8, k=16: 64-dim floats → 8 codes, 32×
    //          compression), ADC lookup-table scoring in-scan, candidate
    //          cut by estimated distance (TakeOrderedAndProject), exact
    //          re-rank of the bounded set. Training, codes, LUTs, cut,
    //          and re-rank all replay bitwise in the dynamic oracle. ─────
    QueryDef("q127_pq_ann",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = queryVector(s, dir)
        val cb = graft.operators.PQ.train(emb, dim = q.length, m = 8,
          k = 16, iters = 3)
        graft.operators.PQ.neighbors(emb, cb, q, k = 20, rerank = 200,
          excludeId = Some(0L))
      },
      None,
      dynamicOracle = Some(pqOracleSql)),

    // ── Q128: IVFADC — the full coarse-quantizer + product-code ANN
    //          pipeline (Jégou et al. 2011 §IV): IVF probes prune to 8 of
    //          16 cells, ADC lookup tables rank inside them, exact cosine
    //          re-ranks the bounded cut. Three nested approximations, each
    //          cheap where the previous pruned; one scan, zero shuffles.
    //          The dynamic oracle replays every level over shared
    //          literals. ──────────────────────────────────────────────────
    QueryDef("q128_ivfadc",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = queryVector(s, dir)
        val idx = graft.operators.IVF.train(emb, k = 16)
        val cb = graft.operators.PQ.train(emb, dim = q.length, m = 8,
          k = 16, iters = 3)
        graft.operators.PQ.ivfadcNeighbors(emb, idx, cb, q, k = 20,
          nProbe = 8, rerank = 200, excludeId = Some(0L))
      },
      None,
      dynamicOracle = Some(ivfadcOracleSql)),

    // ── Q140: IVFADC with RESIDUAL encoding (Jégou et al. 2011 §IV in
    //          full): codes quantize v − centroid(cell), and each probed
    //          cell scores against its OWN lookup tables built from the
    //          residual query q − centroid(cell) — the refinement that
    //          makes PQ codes sharp inside a cell (spec-pinned: strictly
    //          lower quantization distortion than flat codes at equal
    //          m/k). Still one scan; the oracle replays the coarse
    //          assignment, the per-cell residual, the code argmins, and
    //          the per-cell LUT CASE over shared literals. ────────────────
    QueryDef("q140_ivfadc_residual",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = queryVector(s, dir)
        val idx = graft.operators.IVF.train(emb, k = 16)
        val cb = graft.operators.PQ.trainResidual(emb, idx, dim = q.length,
          m = 8, k = 16, iters = 3)
        graft.operators.PQ.ivfadcResidualNeighbors(emb, idx, cb, q, k = 20,
          nProbe = 8, rerank = 200, excludeId = Some(0L))
      },
      None,
      dynamicOracle = Some(ivfadcResidualOracleSql)),

    // ── Q147: IVFADC over STORED codes
    //          ([[graft.operators.EmbeddingStore.buildAnn]] /
    //          [[graft.operators.EmbeddingStore.annNeighbors]]) — the
    //          on-disk ANN deployment: q140's exact structures persisted
    //          (index, residual codebooks, per-vector codes in cell
    //          partitions), query = probe partition filter + ADC lookups
    //          on the persisted codes + exact re-rank. SAME dynamic
    //          oracle as q140: codes are a pure function of the frozen
    //          structures, so encode-at-write must answer exactly like
    //          encode-at-query — a store that drifted would hash-fail. ───
    QueryDef("q147_ann_store",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = queryVector(s, dir)
        val store = graft.operators.EmbeddingStore.buildAnn(s, emb,
          s"${System.getProperty("java.io.tmpdir")}/graft-annstore-q147",
          k = 16, iters = 5, m = 8, pqK = 16, pqIters = 3)
        graft.operators.EmbeddingStore.annNeighbors(s, store, q, k = 20,
          nProbe = 8, rerank = 200, excludeId = Some(0L))
      },
      None,
      dynamicOracle = Some(ivfadcResidualOracleSql)),

    // ── Q148: IVF cell-quality audit ([[graft.operators.IVF.cellStats]])
    //          — the when-to-retrain measurement for a frozen index:
    //          per-cell population + inertia/mean/max d², d² quantized
    //          per row before exact long sums; one scan + one k-cell
    //          aggregation. The dynamic oracle replays assignment, the
    //          per-cell centroid CASE, and the identical fold order. ─────
    QueryDef("q148_cell_stats",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val idx = graft.operators.IVF.train(emb, k = 16)
        graft.operators.IVF.cellStats(emb, idx)
      },
      None,
      dynamicOracle = Some(cellStatsOracleSql)),

    // ── Q149: CUSUM level-shift detection
    //          ([[graft.operators.TimeSeries.cusumShift]]) — change-point
    //          monitoring downstream of q136's PSI drift: per event type,
    //          the one-sided CUSUM of daily revenue above its own mean
    //          (Page 1954), distributed via the reflection identity
    //          S_t = P_t − min prefix P — two stacked keyed windows over
    //          ONE Exchange, never a sequential recurrence. Deviations
    //          are n-scaled longs so alarms compare exact integers. ──────
    QueryDef("q149_cusum_shift",
      (s, dir) => graft.operators.TimeSeries.cusumShift(
        t(s, dir, "events"), Seq("event_type"), col("ts"), col("value"),
        slackCents = 20000L, thresholdCents = 100000L),
      Some(graft.operators.TimeSeries.cusumOracleSql(
        "events", "event_type", "ts", "value",
        slackCents = 20000L, thresholdCents = 100000L))),

    // ── Q150: incremental aggregate maintenance
    //          ([[graft.operators.Summary]]) — the materialized-view
    //          refresh pattern: history and two deltas summarized
    //          separately (algebraic n/sum/min/max/ssq state), folded by
    //          a summary-sized merge, metrics derived at read time. The
    //          oracle is the DIRECT one-pass aggregate over the whole
    //          table — hash equality PROVES merge(split) = recompute,
    //          while the merge's cost stays independent of history size. ─
    QueryDef("q150_agg_delta",
      (s, dir) => {
        val keys = Seq("event_type", "day")
        val ev = t(s, dir, "events").select(col("event_id"),
          col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("value"))
        val bucket = Sampling.hashBucket(col("event_id").cast("string"), 10)
        val parts = Seq(bucket < 8, bucket === 8, bucket === 9).map(p =>
          graft.operators.Summary.summarize(ev.filter(p), keys, col("value")))
        graft.operators.Summary.finalizeSummary(
          graft.operators.Summary.mergeSummaries(keys, parts: _*), keys)
      },
      Some(graft.operators.Summary.summaryOracleSql(
        "(SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, value " +
          "FROM events) AS ev",
        Seq("event_type", "day"), "value"))),

    // ── Q151: Fellegi–Sunter record linkage
    //          ([[graft.operators.Linkage.fellegiSunter]]) — entity
    //          resolution against a deterministically-dirtied registry
    //          (1/5 of names digit-dropped, 1/7 of segments nulled,
    //          balances jittered ±1 cent by hash bucket): blocking
    //          equi-join on nation, per-field agreement CASEs, the SAME
    //          1e-6-quantized log2(m/u) weight literals in both engines
    //          — no libm in the hot path, long-vs-long threshold. ────────
    QueryDef("q151_record_linkage",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val bk = Sampling.hashBucket(col("c_custkey").cast("string"), 21)
        val clean = cust.select(col("c_custkey"), col("c_nationkey"),
          col("c_name").as("name"), col("c_mktsegment").as("segment"),
          round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
        val dirty = cust.select((col("c_custkey") + 1000000L).as("r_id"),
          col("c_nationkey"),
          when(bk % 5 === 0, regexp_replace(col("c_name"), "#0", "#"))
            .otherwise(col("c_name")).as("name"),
          when(bk % 7 === 3, lit(null).cast("string"))
            .otherwise(col("c_mktsegment")).as("segment"),
          (round(col("c_acctbal") * 100).cast("long") + (bk % 3 - 1))
            .as("bal_cents"))
        graft.operators.Linkage.fellegiSunter(clean, dirty,
          "c_custkey", "r_id", Seq("c_nationkey"), LinkageFields,
          threshold = 3.0)
      },
      Some {
        val bkSql = "CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR))" +
          ", 1, 8)) AS BIGINT) % 21"
        graft.operators.Linkage.fellegiSunterOracleSql(
          leftSql = "SELECT c_custkey, c_nationkey, c_name AS name, " +
            "c_mktsegment AS segment, " +
            "CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal_cents FROM customer",
          rightSql = s"""SELECT c_custkey + 1000000 AS r_id, c_nationkey,
            |  CASE WHEN $bkSql % 5 = 0
            |       THEN regexp_replace(c_name, '#0', '#')
            |       ELSE c_name END AS name,
            |  CASE WHEN $bkSql % 7 = 3 THEN NULL
            |       ELSE c_mktsegment END AS segment,
            |  CAST(ROUND(c_acctbal*100) AS BIGINT) + ($bkSql % 3 - 1)
            |    AS bal_cents
            |FROM customer""".stripMargin,
          leftId = "c_custkey", rightId = "r_id", block = Seq("c_nationkey"),
          fields = LinkageFields, threshold = 3.0)
      }),

    // ── Q152: HTML/markup → text extraction
    //          ([[graft.functions.TextFunctions.stripMarkup]]) — the WET
    //          step of web-corpus curation, run here over documents
    //          deterministically wrapped in markup (title, style block,
    //          comment, script block, entity sampler): script/style/
    //          comment blocks die whole, tags flatten to spaces, entities
    //          decode (&amp; last), whitespace collapses. Pure scan-side
    //          regexp chain, RE2-safe so DuckDB replays it verbatim. ─────
    QueryDef("q152_html_strip",
      (s, dir) => {
        val html = concat(
          lit("<html><head><title>Doc "), col("doc_id").cast("string"),
          lit(" &amp; co</title><style>p {margin:0}</style></head>\n" +
            "<body><!-- nav -->\n<p class=\"lead\">"),
          col("text"),
          lit("</p><script>var n=1;</script>\n<p>tail &lt;x&gt; " +
            "&quot;q&quot; &#39;s&#39; a&nbsp;b &amp;co</p></body></html>"))
        t(s, dir, "documents").select(col("doc_id"),
          TextFunctions.extractTitle(html).as("title"),
          TextFunctions.stripMarkup(html).as("clean"))
          .withColumn("n_clean_chars", length(col("clean")).cast("long"))
      },
      Some {
        val htmlSql = "'<html><head><title>Doc ' || " +
          "CAST(doc_id AS VARCHAR) || ' &amp; co</title>" +
          "<style>p {margin:0}</style></head>' || chr(10) || " +
          "'<body><!-- nav -->' || chr(10) || '<p class=\"lead\">' || " +
          "text || '</p><script>var n=1;</script>' || chr(10) || " +
          "'<p>tail &lt;x&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b " +
          "&amp;co</p></body></html>'"
        s"""WITH h AS (
           |  SELECT doc_id, $htmlSql AS html FROM documents
           |)
           |SELECT doc_id,
           |       regexp_extract(html,
           |         '(?s)<title[^>]*>(.*?)</title>', 1) AS title,
           |       ${TextFunctions.markupOracleExpr("html")} AS clean,
           |       CAST(length(${TextFunctions.markupOracleExpr("html")})
           |            AS BIGINT) AS n_clean_chars
           |FROM h""".stripMargin
      }),

    // ── Q153: Zipf-law audit ([[graft.operators.Vocabulary.zipfAudit]])
    //          — the one-row corpus-health screen: OLS of ln(count) on
    //          ln(rank) over the top-V vocabulary; natural corpora give
    //          slope ≈ −1 with high r², template-heavy or synthetic ones
    //          bend the curve. One fact-scale token aggregation, then a
    //          V-row fit under the exact quantized-moment discipline. ────
    QueryDef("q153_zipf_audit",
      (s, dir) => graft.operators.Vocabulary.zipfAudit(
        t(s, dir, "documents"), topV = 256),
      Some(graft.operators.Vocabulary.zipfOracleSql(256))),

    // ── Q154: right-to-be-forgotten erasure
    //          ([[graft.operators.TableMerge.purgeKeys]]) — the GDPR
    //          deletion path proven THROUGH storage: events copied into a
    //          hive-partitioned table, one hash bucket of users purged
    //          (partition-scoped rewrite, emptied partitions deleted
    //          explicitly), then the surviving table READ BACK and
    //          aggregated. The oracle aggregates `events` minus the same
    //          md5-bucket users — equality proves the on-disk purge
    //          removed exactly the targeted rows and nothing else. ───────
    QueryDef("q154_erasure",
      (s, dir) => {
        val base =
          s"${System.getProperty("java.io.tmpdir")}/graft-purge-q154"
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sessionState.newHadoopConf())
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val ev = t(s, dir, "events")
        ev.write.partitionBy("event_type").parquet(base)
        val erase = ev.select(col("user_id")).distinct()
          .filter(Sampling.hashBucket(
            col("user_id").cast("string"), 37) === 0)
        graft.operators.TableMerge.purgeKeys(s, base, erase,
          Seq("user_id"), "event_type")
        s.read.parquet(base).groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"),
            sum(round(col("value") * 100)).cast("long").as("value_cents"))
      },
      Some("""WITH kept AS (
             |  SELECT * FROM events
             |  WHERE CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
             |             1, 8)) AS BIGINT) % 37 <> 0
             |)
             |SELECT event_type, COUNT(*) AS n_events,
             |       COUNT(DISTINCT user_id) AS n_users,
             |       CAST(SUM(ROUND(value*100)) AS BIGINT) AS value_cents
             |FROM kept GROUP BY 1""".stripMargin)),

    // ── Q155: join-cardinality preflight
    //          ([[graft.operators.ColumnStats.joinCardinality]]) — q143's
    //          two-sided sibling: the EXACT inner-join output size
    //          Σ cnt_a·cnt_b from two key-sized count aggregations and a
    //          key-sized join, thousands of times cheaper than the join
    //          it predicts. events ⋈ events on user_id — the self-join
    //          every retention/funnel query is about to run. ─────────────
    QueryDef("q155_join_cardinality",
      (s, dir) => graft.operators.ColumnStats.joinCardinality(
        t(s, dir, "events"),
        t(s, dir, "events").filter(col("event_type") === "purchase"),
        "user_id"),
      Some(graft.operators.ColumnStats.joinCardinalityOracleSql(
        "events",
        "(SELECT * FROM events WHERE event_type = 'purchase') AS p",
        "user_id"))),

    // ── Q156: event-transition matrix
    //          ([[graft.operators.TimeSeries.transitionMatrix]]) — the
    //          first-order behavioral model: per-user (ts, event_id)-
    //          ordered adjacent event pairs counted into a |states|²
    //          matrix with 1e-6-quantized row-normalized probabilities;
    //          one keyed lead window + one map-side-combined count. ──────
    QueryDef("q156_transitions",
      (s, dir) => graft.operators.TimeSeries.transitionMatrix(
        t(s, dir, "events"), Seq("user_id"), col("ts"),
        col("event_type"), col("event_id")),
      Some(graft.operators.TimeSeries.transitionOracleSql(
        "events", "user_id", "ts", "event_type", "event_id"))),

    // ── Q157: target-referenced CUSUM
    //          ([[graft.operators.TimeSeries.cusumShiftTarget]]) — q149's
    //          form with a CONFIGURED reference level (classic Page
    //          CUSUM): plain-long deviations, same reflection identity;
    //          this is the form the streaming monitor replays equal to
    //          (StreamingSpec's stream=batch contract). ──────────────────
    QueryDef("q157_cusum_target",
      (s, dir) => graft.operators.TimeSeries.cusumShiftTarget(
        t(s, dir, "events"), Seq("event_type"), col("ts"), col("value"),
        targetCents = 300000L, slackCents = 20000L,
        thresholdCents = 100000L),
      Some(graft.operators.TimeSeries.cusumTargetOracleSql(
        "events", "event_type", "ts", "value",
        targetCents = 300000L, slackCents = 20000L,
        thresholdCents = 100000L))),

    // ── Q158: Bloom-pruned join ([[graft.operators.BloomJoin]]) — the
    //          scan-side membership pre-filter for a non-broadcastable
    //          dimension: the dimension's keys build a 2^16-bit Bloom
    //          bitset in ONE distributed bit_or aggregation (driver
    //          state = 1024 longs, never the key count), fact rows probe
    //          it as a pure scan expression BEFORE the join shuffle, and
    //          the equi-join removes the false positives — so the result
    //          (and the oracle) is exactly the plain join, aggregated.
    //          The Bloom stage changes only where non-matching rows die:
    //          in the scan instead of across the network. ────────────────
    QueryDef("q158_bloom_join",
      (s, dir) => graft.operators.BloomJoin.prunedJoin(
          t(s, dir, "orders"),
          t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
            .select("c_custkey"),
          "o_custkey", "c_custkey", numBits = 1 << 16)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          centSum(col("o_totalprice")).as("revenue")),
      Some("""SELECT o_orderpriority, COUNT(*) AS n,
             |       SUM(ROUND(o_totalprice * 100)) / 100 AS revenue
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |GROUP BY 1""".stripMargin)),

    // ── Q159: EWMA control chart
    //          ([[graft.operators.TimeSeries.ewmaChart]]) — the small-
    //          shift drift monitor beside q149/q157's CUSUM: geometric-
    //          decay weighted mean over the last 16 observed days as
    //          order-free INTEGER numerator/denominator sums (truncated
    //          weights < 2^-15 are below double noise), alarm by cross-
    //          multiplied long comparison against the key's own mean —
    //          no division in the decision, bit-replayable anywhere. ─────
    QueryDef("q159_ewma",
      (s, dir) => graft.operators.TimeSeries.ewmaChart(
        t(s, dir, "events"), Seq("event_type"), col("ts"), col("value"),
        span = 16, thresholdCents = 50000L),
      Some(graft.operators.TimeSeries.ewmaOracleSql(
        "events", "event_type", "ts", "value",
        span = 16, thresholdCents = 50000L))),

    // ── Q160: MinHash estimator calibration
    //          ([[graft.operators.Dedup.minhashCalibration]]) — the audit
    //          run before betting a 100 TB dedup on a signature size:
    //          lane-agreement estimate vs exact Jaccard per similarity
    //          decile, over LSH candidate pairs (where decisions happen)
    //          ∪ md5-bucketed background pairs (where bias would create
    //          false merges). Integer lane counts and 1e-6-quantized
    //          Jaccards make the per-decile averages order-free. ─────────
    QueryDef("q160_minhash_calibration",
      (s, dir) => Dedup.minhashCalibration(t(s, dir, "documents")),
      Some(calibrationOracleSql)),

    // ── Q161: order-free table digest
    //          ([[graft.operators.TableDigest.digestByGroup]]) — the
    //          migration-verification primitive: per-returnflag
    //          (n_rows, bit_xor, modular-sum) of 63-bit md5-lane row
    //          hashes over canonicalized rows. Proves two table copies
    //          are equal row-for-row with ONE scan each and a 3-long result
    //          per partition — no sort, no data shuffle; a mismatch
    //          localizes to its partition. Doubles enter via explicit
    //          integral casts (the cent discipline), so rendering is
    //          engine-stable; here the ORACLE is the second engine. ──────
    QueryDef("q161_table_digest",
      (s, dir) => graft.operators.TableDigest.digestByGroup(
        t(s, dir, "lineitem"), Seq("l_returnflag"),
        Seq(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("long"),
          round(col("l_extendedprice") * 100).cast("long"),
          date_format(col("l_shipdate"), "yyyy-MM-dd"))),
      Some(graft.operators.TableDigest.digestByGroupOracleSql(
        "lineitem", Seq("l_returnflag"),
        Seq("l_orderkey", "l_linenumber",
          "CAST(l_quantity AS BIGINT)",
          "CAST(ROUND(l_extendedprice * 100) AS BIGINT)",
          "strftime(l_shipdate, '%Y-%m-%d')")))),

    // ── Q167: corpus digest — q161's order-free fingerprint over the
    //          DOCUMENTS table, grouped by source: pins the UNICODE
    //          canonicalization path cross-engine (md5 over the UTF-8
    //          bytes of arbitrary text must agree byte-for-byte between
    //          Spark's codegen md5 and DuckDB's, or a migration audit
    //          would false-alarm on every non-ASCII corpus). ─────────────
    QueryDef("q167_corpus_digest",
      (s, dir) => graft.operators.TableDigest.digestByGroup(
        t(s, dir, "documents"), Seq("source"),
        Seq(col("doc_id"), col("lang"), col("text"))),
      Some(graft.operators.TableDigest.digestByGroupOracleSql(
        "documents", Seq("source"),
        Seq("CAST(doc_id AS VARCHAR)", "lang", "text")))),

    // ── Q168: reciprocal rank fusion
    //          ([[graft.operators.Scoring.rrfFuse]], Cormack et al.
    //          2009) — lexical (BM25, q49) and embedding (exact cosine,
    //          q19) retrieval fused by rank, the standard move when two
    //          scorers share no scale: contribution 1/(60+rank),
    //          1e-6-quantized to exact longs before the sum. Both input
    //          rankings are already top-20 cut, so fusion runs on
    //          audit-sized frames. ─────────────────────────────────────────
    QueryDef("q168_rank_fusion",
      (s, dir) => graft.operators.Scoring.rrfFuse(Seq(
        (graft.operators.Scoring.bm25(t(s, dir, "documents"), Bm25Terms),
          "doc_id", "score"),
        (Similarity.topK(t(s, dir, "embeddings"), queryVector(s, dir), 20,
          excludeId = Some(0L)), "vec_id", "cos")), topK = 10),
      Some(s"""WITH ra AS (
              |  SELECT doc_id AS id,
              |         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
              |  FROM (${graft.operators.Scoring.bm25OracleSql(Bm25Terms)})
              |), rb AS (
              |  SELECT vec_id AS id,
              |         ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS r
              |  FROM (SELECT vec_id,
              |          ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
              |            (SELECT CAST(embedding AS DOUBLE[])
              |             FROM embeddings WHERE vec_id = 0)), 6) AS cos
              |        FROM embeddings WHERE vec_id <> 0
              |        ORDER BY cos DESC, vec_id LIMIT 20)
              |), c AS (
              |  SELECT id, CAST(round(1000000.0 / (60 + r)) AS BIGINT) AS c6
              |  FROM ra
              |  UNION ALL
              |  SELECT id, CAST(round(1000000.0 / (60 + r)) AS BIGINT) AS c6
              |  FROM rb
              |)
              |SELECT id, CAST(SUM(c6) AS BIGINT) / 1e6 AS rrf,
              |       COUNT(*) AS n_rankers
              |FROM c GROUP BY id
              |ORDER BY rrf DESC, id LIMIT 10""".stripMargin)),

    // ── Q169: label-propagation communities
    //          ([[graft.operators.Graph.labelPropagation]], Raghavan et
    //          al. 2007) — product communities from the min-support-2
    //          co-purchase graph: 3 synchronous rounds, most-frequent
    //          neighbor label with smallest-label tie-break (a total
    //          order → engine/partitioning-deterministic), one shuffle
    //          per round against a cached pre-partitioned edge table.
    //          The oracle unrolls the rounds as chained CTEs (q109's
    //          fixed-iteration discipline). Output: community sizes. ─────
    QueryDef("q169_label_propagation",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
          .distinct()
        val pairs = li.as("x")
          .join(li.as("y"), col("x.ok") === col("y.ok") &&
            col("x.p") < col("y.p"))
          .groupBy(col("x.p").as("i"), col("y.p").as("j"))
          .agg(count(lit(1)).as("sup"))
          .filter(col("sup") >= 2)
        val edges = pairs.select(col("i").as("src"), col("j").as("dst"))
          .unionByName(pairs.select(col("j").as("src"), col("i").as("dst")))
        graft.operators.Graph.labelPropagation(edges, rounds = 3)
          .groupBy(col("community")).agg(count(lit(1)).as("n_nodes"))
      },
      Some {
        val rounds = (1 to 3).map { r =>
          s"""l$r AS (
             |  SELECT v, l FROM (
             |    SELECT e.d AS v, p.l, COUNT(*) AS cnt,
             |           ROW_NUMBER() OVER (PARTITION BY e.d
             |             ORDER BY COUNT(*) DESC, p.l ASC) AS rn
             |    FROM edges e JOIN l${r - 1} p ON e.s = p.v
             |    GROUP BY e.d, p.l)
             |  WHERE rn = 1
             |)""".stripMargin
        }.mkString(", ")
        s"""WITH li AS (
           |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
           |), pairs AS (
           |  SELECT x.p AS i, y.p AS j
           |  FROM li x JOIN li y ON x.ok = y.ok AND x.p < y.p
           |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
           |), edges AS (
           |  SELECT i AS s, j AS d FROM pairs
           |  UNION ALL
           |  SELECT j AS s, i AS d FROM pairs
           |), nodes AS (
           |  SELECT DISTINCT s AS v FROM edges
           |), l0 AS (
           |  SELECT v, v AS l FROM nodes
           |), $rounds
           |SELECT l AS community, COUNT(*) AS n_nodes
           |FROM l3 GROUP BY 1""".stripMargin
      }),

    // ── Q170: CDC apply — latest-writer-wins snapshot materialization
    //          ([[graft.operators.Scd.applyChanges]], the "MERGE INTO"
    //          batch half of CDC ingestion): per user the LAST change by
    //          (ts, event_id) wins, 'error' acting as the delete
    //          tombstone that removes the key from the snapshot; where
    //          q99's SCD2 keeps every version this keeps the live end
    //          state. One keyed window, total tie order. ──────────────────
    QueryDef("q170_cdc_apply",
      (s, dir) => graft.operators.Scd.applyChanges(
          t(s, dir, "events").select(col("user_id"), col("ts"),
            col("event_id"), col("event_type"),
            round(col("value") * 100).cast("long").as("v_cents")),
          keyCols = Seq("user_id"), orderCol = "ts", tieBreak = "event_id",
          opCol = "event_type", deleteOp = "error",
          valCols = Seq("event_type", "v_cents"))
        .select(col("user_id"), col("event_type"), col("v_cents"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts")),
      Some(s"""SELECT user_id, event_type, v_cents,
              |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
              |FROM (${graft.operators.Scd.applyChangesOracleSql(
                "SELECT user_id, ts, event_id, event_type, " +
                  "CAST(ROUND(value*100) AS BIGINT) AS v_cents FROM events",
                keyCols = Seq("user_id"), orderCol = "ts",
                tieBreak = "event_id", opCol = "event_type",
                deleteOp = "error",
                valCols = Seq("event_type", "v_cents"))})""".stripMargin)),

    // ── Q171: Jaro–Winkler fuzzy name pairs
    //          ([[graft.functions.JaroWinkler]] — a NATIVE codegen
    //          expression for the record-linkage comparator Spark lacks;
    //          RapidFuzz/DuckDB variant bit-for-bit: 0.7 boost
    //          threshold, prefix ≤ 4, weight 0.1). Pair generation is the
    //          LOSSLESS prefix filter ([[FuzzyJoin.jaroWinklerSelfCandidates]]
    //          — jw ≥ 0.9 forces a character-occurrence overlap ≥ half the
    //          longer length, so candidates come from an equi-join on
    //          rarity-ordered prefix elements, never a block-quadratic
    //          sweep); the md5 buckets remain as the query's block
    //          semantics. Result provably identical to the full in-block
    //          pairing; the oracle replays THAT full pairing through
    //          DuckDB's own jaro_winkler_similarity — two independent
    //          implementations agreeing bitwise on every score, and the
    //          bitwise match doubles as an end-to-end losslessness check
    //          of the candidate generator. minJw backs off 1e-6 because
    //          the output filter compares the ROUNDED score. ──────────────
    QueryDef("q171_jaro_winkler",
      (s, dir) => {
        val samp = t(s, dir, "part").select(
            col("p_partkey").as("id"), col("p_name").as("nm"),
            Sampling.hashBucket(concat(lit("cal:"),
              col("p_partkey").cast("string")), 2).as("__keep"),
            Sampling.hashBucket(concat(lit("pb:"),
              col("p_partkey").cast("string")), 32).as("__pb"))
          .filter(col("__keep") === 0)
        graft.operators.FuzzyJoin.jaroWinklerSelfCandidates(
            samp, 0.9 - 1e-6, "id", "nm", Seq("__pb"))
          .select(col("i"), col("j"),
            (round(graft.functions.GraftFunctions.jaro_winkler(
              col("si"), col("sj")) * 1e6) / 1e6).as("jw"))
          .filter(col("jw") >= 0.9)
      },
      Some("""WITH samp AS (
             |  SELECT p_partkey AS id, p_name AS nm,
             |         CAST(('0x' || substr(md5('pb:' ||
             |           CAST(p_partkey AS VARCHAR)), 1, 8)) AS BIGINT)
             |           % 32 AS pb
             |  FROM part
             |  WHERE CAST(('0x' || substr(md5('cal:' ||
             |          CAST(p_partkey AS VARCHAR)), 1, 8)) AS BIGINT)
             |          % 2 = 0
             |)
             |SELECT a.id AS i, b.id AS j,
             |       round(jaro_winkler_similarity(a.nm, b.nm) * 1e6) / 1e6
             |         AS jw
             |FROM samp a JOIN samp b ON a.pb = b.pb AND a.id < b.id
             |WHERE round(jaro_winkler_similarity(a.nm, b.nm) * 1e6) / 1e6
             |      >= 0.9""".stripMargin)),

    // ── Q172: Damerau–Levenshtein fuzzy pairs
    //          ([[graft.functions.DamerauLevenshtein]] — the second
    //          native linkage comparator: unrestricted Lowrance–Wagner
    //          edits + transpositions, integer DP, no floats anywhere;
    //          Spark ships plain levenshtein only). Same bounded
    //          md5-bucket pairing as q171; the oracle is DuckDB's own
    //          independent damerau_levenshtein — value-for-value
    //          agreement between two implementations of a nontrivial
    //          DP is the strongest correctness check available. ──────────
    QueryDef("q172_damerau",
      (s, dir) => {
        val samp = t(s, dir, "part").select(
            col("p_partkey").as("id"), col("p_name").as("nm"),
            Sampling.hashBucket(concat(lit("cal:"),
              col("p_partkey").cast("string")), 2).as("__keep"),
            Sampling.hashBucket(concat(lit("pb:"),
              col("p_partkey").cast("string")), 32).as("__pb"))
          .filter(col("__keep") === 0)
        // spread the STREAMED side first (the q186 discipline): the other
        // side broadcasts, so the whole O(pairs) Damerau kernel otherwise
        // runs inside the single-split scan stage — measured 3 tasks /
        // ~6-9 taskSec serialized at bench scale
        Tables.ensureParallelism(samp).as("a").join(samp.as("b"),
            col("a.__pb") === col("b.__pb") && col("a.id") < col("b.id"))
          .select(col("a.id").as("i"), col("b.id").as("j"),
            graft.functions.GraftFunctions.damerau_levenshtein(
              col("a.nm"), col("b.nm")).as("dld"))
          .filter(col("dld") <= 3)
      },
      Some("""WITH samp AS (
             |  SELECT p_partkey AS id, p_name AS nm,
             |         CAST(('0x' || substr(md5('pb:' ||
             |           CAST(p_partkey AS VARCHAR)), 1, 8)) AS BIGINT)
             |           % 32 AS pb
             |  FROM part
             |  WHERE CAST(('0x' || substr(md5('cal:' ||
             |          CAST(p_partkey AS VARCHAR)), 1, 8)) AS BIGINT)
             |          % 2 = 0
             |)
             |SELECT a.id AS i, b.id AS j,
             |       CAST(damerau_levenshtein(a.nm, b.nm) AS INT) AS dld
             |FROM samp a JOIN samp b ON a.pb = b.pb AND a.id < b.id
             |WHERE damerau_levenshtein(a.nm, b.nm) <= 3""".stripMargin)),

    // ── Q173: fuzzy-agreement record linkage
    //          ([[graft.operators.Linkage.fellegiSunterFuzzy]]) — q151's
    //          Fellegi–Sunter scoring with the native Jaro–Winkler
    //          comparator as the name field's agreement indicator
    //          (jw ≥ 0.9): the typo'd names q151's equality indicator
    //          counts AGAINST the match now count FOR it — the form
    //          production linkage runs on dirty data. Same blocking,
    //          weights, and missing-value semantics; the JW threshold
    //          is deterministic because the comparator replays bitwise
    //          (q171). Candidates come from the SCORE-DRIVEN bound
    //          ([[graft.operators.Linkage.fellegiSunterFuzzyBlocked]]):
    //          with these weights and threshold 3.0 the minimal
    //          qualifying agree-sets are {bal_cents} and {name}, so the
    //          comparator sweeps only the bal_cents equi-join ∪ the JW
    //          prefix-filter candidates instead of every in-block pair —
    //          provably the same output (LinkageSpec pins blocked ≡
    //          quadratic; the unchanged full-join oracle re-proves it
    //          bitwise on every run). ─────────────────────────────────────
    QueryDef("q173_fuzzy_linkage",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val bk = Sampling.hashBucket(col("c_custkey").cast("string"), 21)
        val clean = cust.select(col("c_custkey"), col("c_nationkey"),
          col("c_name").as("name"), col("c_mktsegment").as("segment"),
          round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
        val dirty = cust.select((col("c_custkey") + 1000000L).as("r_id"),
          col("c_nationkey"),
          when(bk % 5 === 0, regexp_replace(col("c_name"), "#0", "#"))
            .otherwise(col("c_name")).as("name"),
          when(bk % 7 === 3, lit(null).cast("string"))
            .otherwise(col("c_mktsegment")).as("segment"),
          (round(col("c_acctbal") * 100).cast("long") + (bk % 3 - 1))
            .as("bal_cents"))
        graft.operators.Linkage.fellegiSunterFuzzyBlocked(clean, dirty,
          "c_custkey", "r_id", Seq("c_nationkey"),
          exactFields = LinkageFields.filter(_._1 != "name"),
          fuzzyFields = Seq(("name", 0.95, 0.05, 0.98)),
          threshold = 3.0)
      },
      Some {
        val bkSql = "CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR))" +
          ", 1, 8)) AS BIGINT) % 21"
        graft.operators.Linkage.fellegiSunterFuzzyOracleSql(
          leftSql = "SELECT c_custkey, c_nationkey, c_name AS name, " +
            "c_mktsegment AS segment, " +
            "CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal_cents FROM customer",
          rightSql = s"""SELECT c_custkey + 1000000 AS r_id, c_nationkey,
            |  CASE WHEN $bkSql % 5 = 0
            |       THEN regexp_replace(c_name, '#0', '#')
            |       ELSE c_name END AS name,
            |  CASE WHEN $bkSql % 7 = 3 THEN NULL
            |       ELSE c_mktsegment END AS segment,
            |  CAST(ROUND(c_acctbal*100) AS BIGINT) + ($bkSql % 3 - 1)
            |    AS bal_cents
            |FROM customer""".stripMargin,
          leftId = "c_custkey", rightId = "r_id", block = Seq("c_nationkey"),
          exactFields = LinkageFields.filter(_._1 != "name"),
          fuzzyFields = Seq(("name", 0.95, 0.05, 0.98)),
          threshold = 3.0)
      }),

    // ── Q174: trigram-filtered substring search
    //          ([[graft.operators.TextSearch.substringMatches]] — the
    //          pg_trgm playbook: pattern trigram coverage over a distinct
    //          char-trigram posting prunes candidates, exact `contains`
    //          verifies; result ≡ the plain LIKE scan, which IS the
    //          oracle. Complements q90's token-level phrase index with
    //          CHARACTER-level matching (patterns crossing token
    //          boundaries, no tokenizer assumptions). ─────────────────────
    QueryDef("q174_trgm_search",
      (s, dir) => graft.operators.TextSearch.substringMatches(
        t(s, dir, "documents"), "slow scan"),
      Some("""SELECT doc_id FROM documents
             |WHERE contains(text, 'slow scan')""".stripMargin)),

    // ── Q175: bottom-k (KMV) sketch per source
    //          ([[graft.operators.Sampling.bottomKSketch]], Bar-Yossef et
    //          al. 2002) — one construction, two products: a
    //          DETERMINISTIC mergeable uniform sample of each group's
    //          distinct keys (hash-membership — no RNG state, union's
    //          bottom-k = merge) and the (k−1)/h₍ₖ₎ distinct-count
    //          estimator; groups under k keys keep all and estimate
    //          null (exact count regime). One keyed window after a
    //          distinct collapse. ────────────────────────────────────────
    QueryDef("q175_bottomk_sketch",
      (s, dir) => Sampling.bottomKSketch(
        t(s, dir, "documents"), col("source"), col("doc_id"), k = 10),
      Some(Sampling.bottomKOracleSql("documents", "source", "doc_id",
        k = 10))),

    // ── Q176: EWMA forecast backtest
    //          ([[graft.operators.TimeSeries.ewmaBacktest]]) — the
    //          engine's own WAPE identity applied to its own smoother:
    //          yesterday's EWMA level forecasts today, per event type;
    //          the number a real forecasting model must beat. Forecasts
    //          stay exact num/den rationals; one rounded division per
    //          day is the only rounding surface. ──────────────────────────
    QueryDef("q176_ewma_backtest",
      (s, dir) => graft.operators.TimeSeries.ewmaBacktest(
        t(s, dir, "events"), Seq("event_type"), col("ts"), col("value"),
        span = 16),
      Some(graft.operators.TimeSeries.ewmaBacktestOracleSql(
        "events", "event_type", "ts", "value", span = 16))),

    // ── Q177: robust trend — Theil–Sen slope + Mann–Kendall test
    //          ([[graft.operators.TimeSeries.robustTrend]]) — the
    //          nonparametric pair beside q97's OLS: median pairwise
    //          slope (~29% breakdown vs OLS's single-outlier capture)
    //          and the tie-corrected S/z that says whether the trend is
    //          real. Pair join runs on keys×days rows, never the fact
    //          table; every statistic is exact-integer or one-division
    //          quantized. ─────────────────────────────────────────────────
    QueryDef("q177_robust_trend",
      (s, dir) => graft.operators.TimeSeries.robustTrend(
        t(s, dir, "events"), Seq("event_type"), col("ts"), col("value")),
      Some(graft.operators.TimeSeries.robustTrendOracleSql(
        "events", "event_type", "ts", "value"))),

    // ── Q178: changepoint localization — per key, the day the
    //          target-referenced CUSUM statistic (q157) PEAKS is the
    //          standard estimate of where the level shift began (Page's
    //          argmax estimator); one keyed window argmax over the
    //          monitor's own output, (cusum desc, day asc) total order
    //          so ties replay identically. ────────────────────────────────
    QueryDef("q178_changepoint",
      (s, dir) => {
        val cusum = graft.operators.TimeSeries.cusumShiftTarget(
          t(s, dir, "events"), Seq("event_type"), col("ts"), col("value"),
          targetCents = 300000L, slackCents = 20000L,
          thresholdCents = 100000L)
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("cusum").desc, col("day").asc)
        cusum.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .select(col("event_type"), col("day").as("changepoint_day"),
            col("cusum").as("s_peak"),
            col("alarm").as("alarmed_at_peak"))
      },
      Some(s"""WITH c AS (
              |${graft.operators.TimeSeries.cusumTargetOracleSql(
                "events", "event_type", "ts", "value",
                targetCents = 300000L, slackCents = 20000L,
                thresholdCents = 100000L)}
              |)
              |SELECT event_type, day AS changepoint_day,
              |       cusum AS s_peak, alarm AS alarmed_at_peak
              |FROM (
              |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
              |           ORDER BY cusum DESC, day ASC) AS rn
              |  FROM c
              |) WHERE rn = 1""".stripMargin)),

    // ── Q179: dedup threshold calibration curve
    //          ([[graft.operators.Dedup.thresholdCalibration]]) — the
    //          knob audit before committing a corpus to a similarity
    //          threshold: pairs and touched-documents counts at every
    //          candidate threshold 0.50–0.95, from ONE exact Jaccard
    //          pass at the 0.5 floor; cumulative histograms over
    //          audit-sized bucket frames. ──────────────────────────────────
    QueryDef("q179_threshold_curve",
      (s, dir) => Dedup.thresholdCalibration(t(s, dir, "documents")),
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
             |), sh0 AS (
             |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
             |  FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)
             |  WHERE len(t) >= 3
             |), keep AS (
             |  SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) <= 1000
             |), sh AS (
             |  SELECT sh0.doc_id, sh0.s FROM sh0 JOIN keep USING (s)
             |), sz AS (
             |  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1
             |), cp AS (
             |  SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS common
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2
             |), pq AS (
             |  SELECT i, j,
             |         LEAST(CAST(FLOOR(CAST(round(
             |           CAST(common AS DOUBLE)
             |             / CAST(x.n + y.n - common AS DOUBLE) * 1e6)
             |           AS BIGINT) / 50000) AS INT), 20) AS b,
             |         CAST(round(CAST(common AS DOUBLE)
             |           / CAST(x.n + y.n - common AS DOUBLE) * 1e6)
             |           AS BIGINT) AS jq
             |  FROM cp JOIN sz x ON i = x.doc_id JOIN sz y ON j = y.doc_id
             |  WHERE CAST(common AS DOUBLE)
             |          / CAST(x.n + y.n - common AS DOUBLE) >= 0.5
             |), phist AS (
             |  SELECT b, COUNT(*) AS np FROM pq GROUP BY 1
             |), pcum AS (
             |  SELECT b, CAST(SUM(np) OVER (ORDER BY b DESC
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_pairs
             |  FROM phist
             |), dmax AS (
             |  SELECT d, LEAST(CAST(FLOOR(MAX(jq) / 50000) AS INT), 20) AS b
             |  FROM (SELECT i AS d, jq FROM pq
             |        UNION ALL SELECT j AS d, jq FROM pq)
             |  GROUP BY 1
             |), dhist AS (
             |  SELECT b, COUNT(*) AS nd FROM dmax GROUP BY 1
             |), dcum AS (
             |  SELECT b, CAST(SUM(nd) OVER (ORDER BY b DESC
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_docs
             |  FROM dhist
             |), spine AS (
             |  SELECT CAST(UNNEST(range(10, 20)) AS INT) AS t
             |)
             |SELECT t / 20.0 AS threshold,
             |       COALESCE((SELECT MAX(n_pairs) FROM pcum
             |                 WHERE pcum.b >= spine.t), 0) AS n_pairs,
             |       COALESCE((SELECT MAX(n_docs) FROM dcum
             |                 WHERE dcum.b >= spine.t), 0) AS n_docs
             |FROM spine""".stripMargin)),

    // ── Q180: declarative data-contract validation
    //          ([[graft.operators.DataQuality.validate]], the
    //          Deequ/Great-Expectations shape) — named row-level
    //          expectations over orders evaluated in ONE scan + one
    //          single-row aggregate; a NULL predicate counts as a
    //          violation (the three-valued-logic trap a contract must
    //          catch). One deliberately failing rule keeps the report
    //          honest. ───────────────────────────────────────────────────
    QueryDef("q180_data_contract",
      (s, dir) => graft.operators.DataQuality.validate(
        t(s, dir, "orders"), Seq(
          ("positive_total", col("o_totalprice") > 0),
          ("priority_enum", col("o_orderpriority").isin(
            "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")),
          ("custkey_present", col("o_custkey").isNotNull),
          ("big_ticket", col("o_totalprice") >= 50000))),
      Some(graft.operators.DataQuality.validateOracleSql("orders", Seq(
        ("positive_total", "o_totalprice > 0"),
        ("priority_enum", "o_orderpriority IN ('1-URGENT', '2-HIGH', " +
          "'3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')"),
        ("custkey_present", "o_custkey IS NOT NULL"),
        ("big_ticket", "o_totalprice >= 50000"))))),

    // ── Q181: LSH recall measurement — the banding-probability claim
    //          (16 perms / 4 bands catches jac ≥ 0.8 with ≥ 93% per the
    //          q23 scaladoc) MEASURED as a first-class row: exact
    //          Jaccard pairs vs MinHash+LSH pairs at the same threshold,
    //          plus the precision row-proof (the verify stage makes LSH
    //          a subset of exact, so precision must be 1). ────────────────
    QueryDef("q181_lsh_recall",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val exact = Dedup.jaccardPairs(docs, threshold = 0.8)
          .select(col("i"), col("j"))
        val lsh = Dedup.minhashNearDups(docs, threshold = 0.8,
            permHash = Dedup.Md5PermHash)
          .select(col("i"), col("j"))
        val both = exact.join(lsh, Seq("i", "j"))
        exact.agg(count(lit(1)).as("n_exact"))
          .crossJoin(lsh.agg(count(lit(1)).as("n_lsh")))
          .crossJoin(both.agg(count(lit(1)).as("n_common")))
          .select(col("n_exact"), col("n_lsh"), col("n_common"),
            (round(col("n_common") * lit(1000000L) /
              greatest(col("n_exact"), lit(1L))) / 1e6).as("recall"),
            (round(col("n_common") * lit(1000000L) /
              greatest(col("n_lsh"), lit(1L))) / 1e6).as("precision"))
      },
      Some(s"""WITH ${minhashPairCtes("documents", 0.8)},
              |ex AS (
              |  SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS common
              |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2
              |), exactv AS (
              |  SELECT i, j FROM ex
              |  JOIN sz x ON i = x.doc_id JOIN sz y ON j = y.doc_id
              |  WHERE CAST(common AS DOUBLE)
              |          / CAST(x.n + y.n - common AS DOUBLE) >= 0.8
              |), m AS (
              |  SELECT (SELECT COUNT(*) FROM exactv) AS n_exact,
              |         (SELECT COUNT(*) FROM verified) AS n_lsh,
              |         (SELECT COUNT(*) FROM exactv e
              |          JOIN verified v ON e.i = v.i AND e.j = v.j)
              |           AS n_common
              |)
              |SELECT n_exact, n_lsh, n_common,
              |       round(n_common * 1000000
              |             / GREATEST(n_exact, 1)) / 1e6 AS recall,
              |       round(n_common * 1000000
              |             / GREATEST(n_lsh, 1)) / 1e6 AS precision
              |FROM m""".stripMargin)),

    // ── Q182: dedup impact report — the executive-summary row of the
    //          q40 corpus-dedup composition: documents and TOKENS before
    //          vs after (token counts are what the training budget
    //          actually buys), removal rates 1e-6-quantized. One
    //          composition, one row. ───────────────────────────────────────
    QueryDef("q182_dedup_impact",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val kept = Dedup.dedupCorpus(docs, threshold = 0.8,
          permHash = Dedup.Md5PermHash)
        def m(d: org.apache.spark.sql.DataFrame, pre: String) =
          d.agg(count(lit(1)).as(s"docs_$pre"),
            sum(size(split(col("text"), " ")).cast("long"))
              .as(s"tokens_$pre"))
        m(docs, "before").crossJoin(m(kept, "after"))
          .select(col("docs_before"), col("docs_after"),
            col("tokens_before"), col("tokens_after"),
            (round((col("docs_before") - col("docs_after")) * lit(1000000L) /
              col("docs_before")) / 1e6).as("pct_docs_removed"),
            (round((col("tokens_before") - col("tokens_after")) * lit(1000000L) /
              col("tokens_before")) / 1e6).as("pct_tokens_removed"))
      },
      Some(s"""WITH reps AS (
              |  SELECT MIN(doc_id) AS doc_id, text, COUNT(*) AS dup_count
              |  FROM documents GROUP BY text
              |), ${minhashPairCtes("reps", 0.8)},
              |kept AS (
              |  SELECT r.doc_id, r.text FROM reps r
              |  WHERE r.doc_id NOT IN (SELECT j FROM verified)
              |), m AS (
              |  SELECT
              |    (SELECT COUNT(*) FROM documents) AS docs_before,
              |    (SELECT COUNT(*) FROM kept) AS docs_after,
              |    (SELECT CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
              |     FROM documents) AS tokens_before,
              |    (SELECT CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
              |     FROM kept) AS tokens_after
              |)
              |SELECT docs_before, docs_after, tokens_before, tokens_after,
              |       round((docs_before - docs_after) * 1000000
              |             / docs_before) / 1e6 AS pct_docs_removed,
              |       round((tokens_before - tokens_after) * 1000000
              |             / tokens_before) / 1e6 AS pct_tokens_removed
              |FROM m""".stripMargin)),

    // ── Q183: split-leakage audit — q166's motivation MEASURED: of the
    //          near-dup pairs (exact Jaccard ≥ 0.8), how many straddle a
    //          train/eval boundary under the row-keyed split vs the
    //          source-keyed split. Group keying eliminates within-source
    //          straddling by construction; what remains is the
    //          cross-source near-dup mass — the number that tells you
    //          whether source-level splitting suffices or corpus-level
    //          dedup must run first. ──────────────────────────────────────
    QueryDef("q183_split_leakage",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val pairs = Dedup.jaccardPairs(docs, threshold = 0.8)
          .select(col("i"), col("j"))
        def splitOf(keyCol: org.apache.spark.sql.Column) =
          when(Sampling.hashBucket(keyCol.cast("string"), 10) < 8, "train")
            .when(Sampling.hashBucket(keyCol.cast("string"), 10) < 9, "val")
            .otherwise("test")
        val labeled = docs.select(col("doc_id"),
          splitOf(col("doc_id")).as("row_split"),
          splitOf(col("source")).as("grp_split"))
        val a = labeled.select(col("doc_id").as("i"),
          col("row_split").as("ri"), col("grp_split").as("gi"))
        val b = labeled.select(col("doc_id").as("j"),
          col("row_split").as("rj"), col("grp_split").as("gj"))
        pairs.join(a, "i").join(b, "j")
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("ri") =!= col("rj"), 1L).otherwise(0L))
              .as("straddle_row_split"),
            sum(when(col("gi") =!= col("gj"), 1L).otherwise(0L))
              .as("straddle_group_split"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
             |), sh0 AS (
             |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
             |  FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)
             |  WHERE len(t) >= 3
             |), keep AS (
             |  SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) <= 1000
             |), sh AS (
             |  SELECT sh0.doc_id, sh0.s FROM sh0 JOIN keep USING (s)
             |), sz AS (
             |  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1
             |), cp AS (
             |  SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS common
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2
             |), pairs AS (
             |  SELECT i, j FROM cp
             |  JOIN sz x ON i = x.doc_id JOIN sz y ON j = y.doc_id
             |  WHERE CAST(common AS DOUBLE)
             |          / CAST(x.n + y.n - common AS DOUBLE) >= 0.8
             |), lab AS (
             |  SELECT doc_id,
             |         CASE WHEN CAST(('0x' || substr(md5(
             |                CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             |                % 10 < 8 THEN 'train'
             |              WHEN CAST(('0x' || substr(md5(
             |                CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             |                % 10 < 9 THEN 'val' ELSE 'test' END AS rsp,
             |         CASE WHEN CAST(('0x' || substr(md5(source), 1, 8))
             |                AS BIGINT) % 10 < 8 THEN 'train'
             |              WHEN CAST(('0x' || substr(md5(source), 1, 8))
             |                AS BIGINT) % 10 < 9 THEN 'val'
             |              ELSE 'test' END AS gsp
             |  FROM documents
             |)
             |SELECT COUNT(*) AS n_pairs,
             |       CAST(SUM(CASE WHEN a.rsp <> b.rsp THEN 1 ELSE 0 END)
             |            AS BIGINT) AS straddle_row_split,
             |       CAST(SUM(CASE WHEN a.gsp <> b.gsp THEN 1 ELSE 0 END)
             |            AS BIGINT) AS straddle_group_split
             |FROM pairs p
             |JOIN lab a ON p.i = a.doc_id
             |JOIN lab b ON p.j = b.doc_id""".stripMargin)),

    // ── Q185: global Jaro–Winkler near-dup pairs, NO pre-blocking —
    //          the candidate generator IS the blocking
    //          ([[graft.operators.FuzzyJoin.jaroWinklerSelfCandidates]]).
    //          At 0.985 on ~18-char names the match bound leaves ≤ 1
    //          character per side outside the common multiset, so the
    //          generator auto-routes to ANAGRAM deletion blocking
    //          (sorted-char 1-deletion variants as near-unique posting
    //          keys) — the route q171's md5-blocked prefix-filter query
    //          does not exercise. The oracle is the full quadratic
    //          self-join in DuckDB: a bitwise match re-proves the
    //          generator lossless on real data every round. minJw backs
    //          off 1e-6 for the rounded output filter. ───────────────────
    QueryDef("q185_jw_neardups",
      (s, dir) => graft.operators.FuzzyJoin.jaroWinklerSelfCandidates(
          t(s, dir, "customer").select(col("c_custkey").as("id"),
            col("c_name").as("nm")),
          0.985 - 1e-6, "id", "nm")
        .select(col("i"), col("j"),
          (round(graft.functions.GraftFunctions.jaro_winkler(
            col("si"), col("sj")) * 1e6) / 1e6).as("jw"))
        .filter(col("jw") >= 0.985),
      Some("""SELECT a.c_custkey AS i, b.c_custkey AS j,
             |       round(jaro_winkler_similarity(a.c_name, b.c_name) * 1e6)
             |         / 1e6 AS jw
             |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
             |WHERE round(jaro_winkler_similarity(a.c_name, b.c_name) * 1e6)
             |        / 1e6 >= 0.985""".stripMargin)),

    // ── Q186: character-level duplicated spans — full Lee et al. 2022
    //          exact-substring dedup coverage
    //          ([[graft.operators.Dedup.charDuplicateSpans]]): every
    //          maximal doc region covered by a >= 25-char substring
    //          occurring twice anywhere in the corpus. Provably equal to
    //          the suffix-array tool's output at min-match-length 25
    //          (see the operator scaladoc's two-line equivalence) with
    //          none of the suffix array's sequential build: stride-1
    //          char windows (native kernel, linear in corpus bytes — the
    //          same factor the suffix array pays) + keyed count + keyed
    //          interval merge. ────────────────────────────────────────────
    QueryDef("q186_char_dup_spans",
      (s, dir) => graft.operators.Dedup.charDuplicateSpans(
        t(s, dir, "documents"), minLen = 25, minCount = 2),
      Some(graft.operators.Dedup.charDuplicateSpansOracleSql(
        "documents", minLen = 25, minCount = 2))),

    // ── Q187: ExactSubstr dedup — the cut itself
    //          ([[graft.operators.Dedup.removeDuplicatedSpans]]): q186's
    //          spans removed from every document (all occurrences, gap
    //          fragments concatenated — the released tool's behavior),
    //          one output row per input doc. The surgery is scan-side (a
    //          sorted-span fold per row); the only additions to q186's
    //          plan are one keyed span-collect and one equi-join back to
    //          the corpus. The oracle rebuilds clean_text independently
    //          via LAG gaps + ordered string_agg — a different algebra
    //          reaching the same string, so a hash match is a real
    //          cross-check, not a replay. ─────────────────────────────────
    QueryDef("q187_exactsubstr_dedup",
      (s, dir) => graft.operators.Dedup.removeDuplicatedSpans(
        t(s, dir, "documents"), minLen = 25, minCount = 2),
      Some(graft.operators.Dedup.removeDuplicatedSpansOracleSql(
        "documents", minLen = 25, minCount = 2))),

    // ── Q188: sharded HNSW graph-ANN recall audit
    //          ([[graft.operators.Hnsw]]) — the partition-geometry-free
    //          alternative to IVF for isotropic embeddings, through the
    //          same [[Similarity.recallAudit]] harness as q164: build
    //          the 4-shard graph index on the corpus (vec_id ≠ 0),
    //          ef-search every shard, merge top-20, score against the
    //          exact cosine top-20. Deterministic end-to-end (splitmix64
    //          levels, id-ordered insertion, id tie-breaks), so the
    //          dump-time oracle re-runs the identical search and DuckDB
    //          re-scores + re-ranks the returned ids before the audit
    //          algebra. ─────────────────────────────────────────────────
    QueryDef("q188_hnsw_recall",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val store = graft.operators.Hnsw.build(
          emb.filter(col("vec_id") =!= 0), shards = 4)
        Similarity.recallAudit(
          Similarity.topK(emb, queryVector(s, dir), 20, excludeId = Some(0L)),
          graft.operators.Hnsw.neighbors(store, queryVector(s, dir), 20,
            efSearch = 48),
          k = 20)
      },
      None,
      dynamicOracle = Some(hnswRecallOracleSql)),

    // ── Q190: HNSW incremental admission recall
    //          ([[graft.operators.Hnsw.add]]) — the index-maintenance
    //          half of q188's lifecycle: build on vec_ids below 400,
    //          ADMIT the rest into the standing store (per-shard warm
    //          insertion, no rebuild), search, audit. Arrivals here are
    //          monotone, so HnswSpec's theorem says this store is
    //          bitwise the full rebuild — the audit must reproduce
    //          q188's row through a completely different build path. ─────
    QueryDef("q190_hnsw_admission",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val store = graft.operators.Hnsw.add(
          graft.operators.Hnsw.build(
            emb.filter(col("vec_id") =!= 0 && col("vec_id") < 400),
            shards = 4),
          emb.filter(col("vec_id") >= 400), shards = 4)
        Similarity.recallAudit(
          Similarity.topK(emb, queryVector(s, dir), 20, excludeId = Some(0L)),
          graft.operators.Hnsw.neighbors(store, queryVector(s, dir), 20,
            efSearch = 48),
          k = 20)
      },
      None,
      dynamicOracle = Some(hnswAdmissionRecallOracleSql)),

    // ── Q189: sequence packing (concat-and-chunk)
    //          ([[graft.operators.Packing.concatChunk]]) — per-document
    //          placement in the fixed-capacity (2048-token) pretraining
    //          window stream: chunk_first/chunk_last/offset from an
    //          EXACT distributed two-pass prefix sum in doc_id order
    //          (range repartition + keyed window + bounded offset
    //          frame — never a single-partition window); zero padding
    //          waste by construction. Power-of-two capacity makes the
    //          chunk division binary-exact on both engines. ──────────────
    QueryDef("q189_sequence_packing",
      (s, dir) => graft.operators.Packing.concatChunk(
        t(s, dir, "documents"), capacity = 2048,
        nTokens = size(split(col("text"), " ")).cast("long"),
        key = col("doc_id")),
      Some(graft.operators.Packing.concatChunkOracleSql(
        "documents", 2048, "len(string_split(text, ' '))"))),

    // ── Q184: client CSV presentation layer
    //          ([[graft.sinks.ClientCsv]]) — the q03 WAPE frame rendered
    //          to the reference deliverable's display grammar
    //          (`/root/reference/output/client-MAPE With
    //          Weather_imply.csv`: `NN.NN %` percentages,
    //          thousands-separated two-decimal magnitudes, minimal CSV
    //          quoting) as (start_time, line) rows. The oracle replays
    //          Java's format_number grammar in DuckDB: printf two-decimal
    //          rounding (identical correct rounding of the same binary
    //          double — exact .xx5 ties are impossible for integer cents
    //          and k/200-irrepresentable percentages) + reverse/regex
    //          thousands grouping + the same CASE quoting. ───────────────
    QueryDef("q184_client_csv",
      (s, dir) => graft.sinks.ClientCsv.csvLines(
        graft.sinks.ClientCsv.mapeDisplayFrame(byName("q03_wape")(s, dir))),
      Some(clientCsvOracleSql)),

    // ── Q162: temperature-based mixture resampling
    //          ([[graft.operators.Sampling.temperatureResample]]) — q59
    //          with DERIVED targets: shares ∝ p^α, α = 1/2 (T = 2), the
    //          multilingual flattening standard. α is dyadic so the
    //          share composes from correctly-rounded sqrt — engine-exact
    //          where libm pow is not. Fact table never shuffles: counts,
    //          one-row scale, broadcast rates, pushed-down md5 filter. ───
    QueryDef("q162_temperature_resample",
      (s, dir) => Sampling.temperatureResample(
          t(s, dir, "documents"), col("lang"), col("doc_id"))
        .select("doc_id", "lang", "source"),
      Some(Sampling.temperatureOracleSql("documents", "lang", "doc_id",
        selectCols = "d.doc_id, d.lang, d.source"))),

    // ── Q163: target-referenced EWMA chart
    //          ([[graft.operators.TimeSeries.ewmaChartTarget]]) — q159's
    //          smoothing against a CONFIGURED reference level (the
    //          classic control-chart form, and the one the streaming
    //          monitor replays equal to — StreamingSpec's stream=batch
    //          contract, like q157 for CUSUM). Alarm compares plain
    //          longs: |num − target·den| > threshold·den. ────────────────
    QueryDef("q163_ewma_target",
      (s, dir) => graft.operators.TimeSeries.ewmaChartTarget(
        t(s, dir, "events"), Seq("event_type"), col("ts"), col("value"),
        span = 16, targetCents = 300000L, thresholdCents = 50000L),
      Some(graft.operators.TimeSeries.ewmaTargetOracleSql(
        "events", "event_type", "ts", "value",
        span = 16, targetCents = 300000L, thresholdCents = 50000L))),

    // ── Q164: ANN recall audit ([[graft.operators.Similarity.recallAudit]])
    //          — the eval loop that gates replacing exact search with an
    //          index: IVF's top-20 at the AUDITED DEFAULT probe count
    //          ([[graft.operators.IVF.defaultNProbe]], the operating
    //          point the sweep in IVF's scaladoc picked) joined against
    //          the exact
    //          cosine top-20 → one row of (k, n_overlap, recall@k,
    //          top-1 reciprocal rank). The searches keep their own scale
    //          shapes; the audit join runs on two k-row frames. Oracle
    //          replays BOTH searches (q19's exact SQL + q38's dynamic
    //          trained-centroid arms at the narrower probe) and the same
    //          rank/overlap algebra. ──────────────────────────────────────
    QueryDef("q164_ann_recall",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val idx = graft.operators.IVF.train(emb, k = 16)
        Similarity.recallAudit(
          Similarity.topK(emb, queryVector(s, dir), 20, excludeId = Some(0L)),
          graft.operators.IVF.neighbors(emb, idx, queryVector(s, dir), 20,
            excludeId = Some(0L)),
          k = 20)
      },
      None,
      dynamicOracle = Some(annRecallOracleSql)),

    // ── Q165: percentile-rank score normalization
    //          ([[graft.operators.Scoring.percentileNormalize]]) — the
    //          distribution-free calibration beside q75's z/min-max:
    //          token-count scores ranked within each source onto [0, 1],
    //          so one corpus-wide cut keeps the same top share of every
    //          source. percent_rank has identical tie/(n−1) semantics in
    //          any SQL engine; one keyed window, never global. ────────────
    QueryDef("q165_percentile_norm",
      (s, dir) => graft.operators.Scoring.percentileNormalize(
        t(s, dir, "documents")
          .withColumn("n_tokens", size(split(col("text"), " "))),
        col("source"), col("n_tokens"), keep = Seq("doc_id")),
      Some("""SELECT doc_id, source AS grp,
             |       CAST(len(string_split(text, ' ')) AS INT) AS v,
             |       round(PERCENT_RANK() OVER (
             |         PARTITION BY source
             |         ORDER BY len(string_split(text, ' ')) ASC) * 1e6)
             |         / 1e6 AS pct
             |FROM documents""".stripMargin)),

    // ── Q166: group-aware (leakage-safe) split — q104's deterministic
    //          hash-split keyed on the SOURCE instead of the row: every
    //          document of a source lands in the same train/val/test
    //          split, so near-duplicates and templates within a source
    //          can never straddle the eval boundary (the group-level
    //          split discipline for contamination-free holdouts).
    //          Same scan-side md5 mechanics ([[graft.operators.Sampling
    //          .assignSplit]]); the spec-grade invariant (one split per
    //          source) is visible in the result itself. ───────────────────
    QueryDef("q166_group_split",
      (s, dir) => Sampling.assignSplit(
          t(s, dir, "documents"), col("source"),
          Seq(("train", 8), ("val", 1), ("test", 1)), buckets = 10)
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs")),
      Some("""WITH b AS (
             |  SELECT source,
             |         CAST(('0x' || substr(md5(source), 1, 8))
             |              AS BIGINT) % 10 AS bk
             |  FROM documents
             |)
             |SELECT source,
             |       CASE WHEN bk < 8 THEN 'train'
             |            WHEN bk < 9 THEN 'val' ELSE 'test' END AS split,
             |       COUNT(*) AS n_docs
             |FROM b GROUP BY 1, 2""".stripMargin)),

    // ── Q141: Z-order (Morton) curve key ([[graft.sources.ZOrder]]) —
    //          the multi-dimensional data-skipping layout: per-column
    //          fixed-width bucket ranks bit-interleaved into one curve
    //          key, all scan-side integer/bit expressions (the layout
    //          itself — range repartition on this key — is pinned by
    //          ZOrderSpec's file-rectangle audit). [lo, hi] are layout
    //          parameters shared with the oracle, which replays the
    //          bucket arithmetic and every bit term. ─────────────────────
    QueryDef("q141_zorder_key",
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.sources.ZOrder.zkeyExpr(Seq(
            (col("l_extendedprice"), 900.0, 105000.0),
            (col("l_discount"), 0.0, 0.1)), bits = 8).as("zkey")),
      Some("SELECT l_orderkey, l_linenumber, " +
        graft.sources.ZOrder.zkeyOracleSql(Seq(
          ("l_extendedprice", 900.0, 105000.0),
          ("l_discount", 0.0, 0.1)), bits = 8) +
        " AS zkey FROM lineitem")),

    // ── Q142: bigram-LM quality scoring
    //          ([[graft.operators.Scoring.bigramLogProbScore]]) — the
    //          add-k-smoothed corpus bigram model toward CCNet's
    //          perplexity filter: model tables are vocabulary-sized
    //          aggregates, the only fact-scale op is one shuffle join of
    //          the bigram stream on the per-bigram log-prob, terms
    //          1e-6-quantized for bitwise replay. ────────────────────────
    QueryDef("q142_bigram_logprob",
      (s, dir) => graft.operators.Scoring.bigramLogProbScore(
        t(s, dir, "documents")),
      Some(graft.operators.Scoring.bigramOracleSql())),

    // ── Q143: join-key skew audit
    //          ([[graft.operators.ColumnStats.joinKeySkew]]) — the
    //          measurement that decides salting before a 100 TB shuffle
    //          melts one reducer: one (key, count) aggregation, totals on
    //          a one-row broadcast, comparisons in doubles. ───────────────
    QueryDef("q143_join_key_skew",
      (s, dir) => graft.operators.ColumnStats.joinKeySkew(
        t(s, dir, "events"), "user_id"),
      Some(graft.operators.ColumnStats
        .joinKeySkewOracleSql("events", "user_id"))),

    // ── Q144: batch sessionization
    //          ([[graft.operators.TimeSeries.sessionize]]) — gaps-and-
    //          islands session assignment per user (30-minute gap), the
    //          batch analog of the streaming session window: two keyed
    //          windows over one Exchange + one hash aggregation; strictly-
    //          greater gap semantics; tie-insensitive by construction. ────
    QueryDef("q144_sessionize",
      (s, dir) => graft.operators.TimeSeries.sessionize(
        t(s, dir, "events"), Seq("user_id"), col("ts"), gapSec = 1800L),
      Some("""WITH e AS (
             |  SELECT user_id,
             |         date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
             |           AS s
             |  FROM events
             |), x AS (
             |  SELECT user_id, s,
             |         CASE WHEN LAG(s) OVER w IS NULL
             |                OR s - LAG(s) OVER w > 1800 THEN 1 ELSE 0 END
             |           AS ns
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY s)
             |), y AS (
             |  SELECT user_id, s,
             |         CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY s
             |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session
             |  FROM x
             |)
             |SELECT user_id, session,
             |       MIN(s) AS session_start, MAX(s) AS session_end,
             |       COUNT(*) AS n_events
             |FROM y GROUP BY user_id, session""".stripMargin)),

    // ── Q145: corpus vocabulary builder
    //          ([[graft.operators.Vocabulary.buildVocab]]) — the trainer
    //          for q96's dictionary: one token-count aggregation,
    //          deterministic (count desc, token) total order, ids over
    //          the vocab-sized cut only, 1e-6-quantized coverage. ─────────
    QueryDef("q145_build_vocab",
      (s, dir) => graft.operators.Vocabulary.buildVocab(
        t(s, dir, "documents"), size = 64),
      Some(graft.operators.Vocabulary.buildVocabOracleSql(64))),

    // ── Q146: point-in-time lookup over the SCD2 history
    //          ([[graft.operators.Scd.pointInTimeLookup]]) — each probe
    //          (events re-stamped +30 min) picks up the user's dimension
    //          version ACTIVE at that instant, leakage-free; ONE as-of
    //          window pass, no join nodes. The oracle is deliberately the
    //          OTHER formulation (interval-membership BETWEEN join), so
    //          agreement checks semantics, not implementation. ────────────
    QueryDef("q146_point_in_time",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val hist = graft.operators.Scd.scd2(
          ev, Seq("user_id"), "ts", "event_id", Seq("event_type"))
        val facts = ev.select(col("event_id"), col("user_id"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("pts"))
        graft.operators.Scd.pointInTimeLookup(
          facts, hist, Seq("user_id"), "pts", Seq("event_type"))
      },
      Some(graft.operators.Scd.pointInTimeOracleSql(
        factsSql = "SELECT event_id, user_id, " +
          "ts + INTERVAL 30 MINUTE AS pts FROM events",
        historySql = graft.operators.Scd.scd2OracleSql(
          "events", Seq("user_id"), "ts", "event_id", Seq("event_type")),
        keys = Seq("user_id"), tsCol = "pts",
        attrCols = Seq("event_type")))),

    // ── Q129: BPE merge learning (Sennrich et al. 2016) — tokenizer
    //          training as corpus-scale dataflow: 4 rounds, each ONE
    //          bigram-count aggregation + argmax by (n desc, lhs, rhs),
    //          with merges applied as pure scan-side `replace` on a
    //          double-separator-encoded stream (adjacent merge sites never
    //          share a delimiter, so left-to-right replace IS greedy BPE).
    //          The oracle re-derives every round's argmax itself — only
    //          the stream rewrites embed learned pairs. ──────────────────
    QueryDef("q129_bpe_merges",
      (s, dir) => graft.operators.Vocabulary
        .learnBpeMerges(t(s, dir, "documents"), rounds = 4),
      None,
      dynamicOracle = Some(bpeOracleSql)),

    // ── Q130: BPE tokenization — the transform half of q129: apply the
    //          learned merge table as chained scan-side replaces over the
    //          double-separator stream, split back to BPE tokens, report
    //          per-doc whitespace vs BPE token counts. Zero joins/shuffles
    //          past the (driver-bounded) merge learning. ─────────────────
    QueryDef("q130_bpe_tokenize",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val merges = graft.operators.Vocabulary
          .learnBpeMerges(docs, rounds = 4)
          .collect().map(r => (r.getString(1), r.getString(2))).toSeq
        docs.select(col("doc_id"),
          graft.functions.TextFunctions.tokenCount(col("text"))
            .as("n_words"),
          size(graft.operators.Vocabulary
            .applyBpeMerges(col("text"), merges)).cast("long").as("n_bpe"))
      },
      None,
      dynamicOracle = Some(bpeApplyOracleSql)),

    // ── Q131: per-source dataset card — the one-table corpus summary:
    //          volume, exact-duplicate pressure, language share, and mean
    //          readability/entropy centroids. Every per-doc signal is
    //          scan-side; ONE map-side-combined aggregation (the distinct
    //          fingerprint shuffles 16-byte hashes, never text). Means
    //          ride scaled-long sums — order-free, engine-replayable. ────
    QueryDef("q131_dataset_card",
      (s, dir) => graft.pipelines.CorpusPipeline
        .datasetCard(t(s, dir, "documents")),
      Some(datasetCardOracleSql)),

    // ── Q132: salted fact-dim join under the oracle gate — the explicit
    //          skew-mitigation path (Skew.saltedJoin: big side salted
    //          per-row, small side replicated per salt, join key becomes
    //          (key, salt)) is SEMANTICALLY identical to the plain join,
    //          and this query proves it against the plain-join oracle:
    //          lineitem ⋈ part per brand, integer-quantity sums. ─────────
    QueryDef("q132_salted_join",
      (s, dir) => graft.operators.Skew.saltedJoin(
          t(s, dir, "lineitem")
            .select(col("l_partkey").as("p_partkey"),
              col("l_quantity").cast("long").as("qty")),
          t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          Seq("p_partkey"), salts = 8)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"), sum(col("qty")).as("qty")),
      Some("""SELECT p_brand, COUNT(*) AS n_items,
             |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY 1""".stripMargin)),

    // ── Q133: Mondrian multidimensional k-anonymity (LeFevre et al.
    //          2006) — data-adaptive generalization: recursive median
    //          splits on the widest normalized quasi attribute while both
    //          halves keep >= k rows; classes released as ranges + size,
    //          k-anonymous by construction. Generational relabel
    //          pid -> pid*2 + (v > median); the oracle replays only the
    //          split tree and recomputes all class stats itself. ─────────
    QueryDef("q133_mondrian",
      (s, dir) => graft.operators.Anonymize.mondrianClasses(
        t(s, dir, "documents").select(col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("n_tokens")),
        Seq("n_chars", "n_tokens"), k = 25),
      None,
      dynamicOracle = Some(mondrianOracleSql)),

    // ── Q134: quality-prior cluster representatives — keep the BEST copy
    //          of each near-dup cluster (longest here), not the lowest id:
    //          q39's components joined to quality, (quality desc, id asc)
    //          argmax per cluster + member counts. One doc-keyed join, one
    //          cluster-keyed window. ────────────────────────────────────
    QueryDef("q134_cluster_reps",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Dedup.clusterRepresentatives(
          Dedup.connectedComponents(Dedup.jaccardPairs(docs, threshold = 0.8)),
          docs, "n_chars")
      },
      Some("""WITH RECURSIVE toks AS (
             |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
             |), sh0 AS (
             |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
             |  FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)
             |  WHERE len(t) >= 3
             |), keep AS (
             |  SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) <= 1000
             |), sh AS (
             |  SELECT sh0.doc_id, sh0.s FROM sh0 JOIN keep USING (s)
             |), sz AS (
             |  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1
             |), cnt AS (
             |  SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS common
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2
             |), nd AS (
             |  SELECT i, j
             |  FROM cnt JOIN sz x ON i = x.doc_id JOIN sz y ON j = y.doc_id
             |  WHERE CAST(common AS DOUBLE) / CAST(x.n + y.n - common AS DOUBLE) >= 0.8
             |), edges AS (
             |  SELECT i, j FROM nd UNION ALL SELECT j AS i, i AS j FROM nd
             |), walk(doc_id, lbl) AS (
             |  SELECT DISTINCT i, i FROM edges
             |  UNION
             |  SELECT e.i, w.lbl FROM walk w JOIN edges e ON e.j = w.doc_id
             |), comp AS (
             |  SELECT doc_id, MIN(lbl) AS cluster FROM walk GROUP BY doc_id
             |), scored AS (
             |  SELECT comp.cluster, comp.doc_id, d.n_chars,
             |         row_number() OVER (PARTITION BY comp.cluster
             |                            ORDER BY d.n_chars DESC,
             |                                     comp.doc_id ASC) AS rn,
             |         COUNT(*) OVER (PARTITION BY comp.cluster) AS n_members
             |  FROM comp JOIN documents d USING (doc_id)
             |)
             |SELECT cluster, doc_id AS keep_id, n_chars AS keep_n_chars,
             |       n_members
             |FROM scored WHERE rn = 1""".stripMargin)),

    // ── Q135: deterministic Poisson bootstrap — uncertainty bands on a
    //          corpus statistic with zero random state: per (row,
    //          replicate) Poisson(1) weights from md5-lane uniforms
    //          (integer inverse-CDF thresholds shared with the oracle),
    //          long weighted sums, one narrow fan-out + one aggregation
    //          on `replicates` keys. ─────────────────────────────────────
    QueryDef("q135_bootstrap",
      (s, dir) => graft.operators.Sampling.poissonBootstrap(
        t(s, dir, "documents"), col("doc_id"), col("n_chars"),
        replicates = 32),
      Some {
        val thr = graft.operators.Sampling.PoissonThresholds
        val arms = thr.zipWithIndex
          .map { case (tv, w) => s"WHEN b < $tv THEN $w" }
          .mkString("\n           ")
        s"""WITH fan AS (
           |  SELECT CAST(doc_id AS VARCHAR) AS k,
           |         CAST(n_chars AS BIGINT) AS v,
           |         CAST(i AS INTEGER) AS replicate
           |  FROM documents, UNNEST(range(1, 33)) AS t(i)
           |), wtd AS (
           |  SELECT replicate, v,
           |         CASE
           |           $arms
           |           ELSE 7 END AS w
           |  FROM (
           |    SELECT k, v, replicate,
           |           CAST(('0x' || substr(md5(k || ':' ||
           |                CAST(replicate AS VARCHAR)), 1, 8)) AS BIGINT)
           |             % 1048576 AS b
           |    FROM fan
           |  )
           |)
           |SELECT replicate, CAST(SUM(w) AS BIGINT) AS n_eff,
           |       CASE WHEN SUM(w) > 0
           |            THEN round(CAST(SUM(w * v) AS DOUBLE)
           |                       / CAST(SUM(w) AS DOUBLE) * 1e6) / 1e6
           |       END AS mean
           |FROM wtd GROUP BY 1""".stripMargin
      }),

    // ── Q136: day-over-day PSI drift series — q125's pairwise drift as a
    //          keyed monitoring TABLE: every consecutive day's event-value
    //          histogram scored against the previous day's with the same
    //          smoothing/quantization; plain keyed aggregations, no global
    //          window, scales with days × bins. ──────────────────────────
    QueryDef("q136_psi_series",
      (s, dir) => graft.operators.ColumnStats.psiSeries(
        t(s, dir, "events"), col("ts"), round(col("value") * 100), width = 50L),
      Some("""WITH bins AS (
             |  SELECT CAST(ts AS DATE) AS d,
             |         CAST(floor(CAST(round(value * 100) AS BIGINT) / 50)
             |              AS BIGINT) AS bin,
             |         COUNT(*) AS n
             |  FROM events GROUP BY 1, 2
             |), paired AS (
             |  SELECT COALESCE(cur.d, prev.d + 1) AS day,
             |         COALESCE(cur.bin, prev.bin) AS bin,
             |         COALESCE(prev.n, 0) AS n_prev,
             |         COALESCE(cur.n, 0) AS n_cur
             |  FROM bins prev FULL OUTER JOIN bins cur
             |    ON prev.d + 1 = cur.d AND prev.bin = cur.bin
             |), tots AS (
             |  SELECT day, COUNT(*) AS k, CAST(SUM(n_prev) AS BIGINT) AS tb,
             |         CAST(SUM(n_cur) AS BIGINT) AS tc
             |  FROM paired GROUP BY 1
             |), terms AS (
             |  SELECT paired.day, tots.k, tots.tb, tots.tc,
             |         CAST(round((CAST(n_prev + 1 AS DOUBLE) / (tb + k)
             |                     - CAST(n_cur + 1 AS DOUBLE) / (tc + k))
             |                    * ln((CAST(n_prev + 1 AS DOUBLE) / (tb + k))
             |                         / (CAST(n_cur + 1 AS DOUBLE)
             |                            / (tc + k))) * 1e6) AS BIGINT)
             |           AS t6
             |  FROM paired JOIN tots USING (day)
             |)
             |SELECT strftime(day, '%Y-%m-%d') AS day, MIN(k) AS k_bins,
             |       MIN(tb) AS n_prev, MIN(tc) AS n_cur,
             |       CAST(SUM(t6) AS BIGINT) / 1e6 AS psi
             |FROM terms
             |GROUP BY day
             |HAVING MIN(tb) > 0""".stripMargin)),

    // ── Q137: cross-source duplication matrix — provenance contamination:
    //          which sources share near-duplicate documents with which
    //          (unordered source pairs, diagonal = within-source dups).
    //          q22's pair graph joined doc→source twice (doc-keyed joins),
    //          one pair-keyed aggregation. ────────────────────────────────
    QueryDef("q137_dup_matrix",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val src = docs.select(col("doc_id"), col("source"))
        Dedup.jaccardPairs(docs, threshold = 0.8)
          .join(src.withColumnsRenamed(
            Map("doc_id" -> "i", "source" -> "src_i")), "i")
          .join(src.withColumnsRenamed(
            Map("doc_id" -> "j", "source" -> "src_j")), "j")
          .groupBy(least(col("src_i"), col("src_j")).as("src_a"),
            greatest(col("src_i"), col("src_j")).as("src_b"))
          .agg(count(lit(1)).as("n_pairs"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
             |), sh0 AS (
             |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
             |  FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)
             |  WHERE len(t) >= 3
             |), keep AS (
             |  SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) <= 1000
             |), sh AS (
             |  SELECT sh0.doc_id, sh0.s FROM sh0 JOIN keep USING (s)
             |), sz AS (
             |  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1
             |), cnt AS (
             |  SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS common
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2
             |), nd AS (
             |  SELECT i, j
             |  FROM cnt JOIN sz x ON i = x.doc_id JOIN sz y ON j = y.doc_id
             |  WHERE CAST(common AS DOUBLE) / CAST(x.n + y.n - common AS DOUBLE) >= 0.8
             |)
             |SELECT LEAST(di.source, dj.source) AS src_a,
             |       GREATEST(di.source, dj.source) AS src_b,
             |       COUNT(*) AS n_pairs
             |FROM nd
             |JOIN documents di ON di.doc_id = nd.i
             |JOIN documents dj ON dj.doc_id = nd.j
             |GROUP BY 1, 2""".stripMargin)),

    // ── Q138: market-basket affinity — co-purchase pair support + LIFT
    //          (n·supp_ab / (supp_a·supp_b)): the association-mining
    //          staple. Pair generation is q113's bounded per-order
    //          self-join; supports are map-side-combined counts; item
    //          margins broadcast back; lift is one exact integer-ratio
    //          division quantized at 1e-6. Top-20 by (lift desc, pair)
    //          via TakeOrderedAndProject. ─────────────────────────────────
    QueryDef("q138_market_basket",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
          .distinct()
        val pairSupp = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.p") < col("y.p"))
          .groupBy(col("x.p").as("a"), col("y.p").as("b"))
          .agg(count(lit(1)).as("supp_ab"))
          .filter(col("supp_ab") >= 3)
        val itemSupp = li.groupBy(col("p")).agg(count(lit(1)).as("supp"))
        val nOrders = li.select(col("ok")).distinct()
          .agg(count(lit(1)).as("n_orders"))
        pairSupp
          .join(broadcast(itemSupp.select(col("p").as("a"),
            col("supp").as("supp_a"))), "a")
          .join(broadcast(itemSupp.select(col("p").as("b"),
            col("supp").as("supp_b"))), "b")
          .crossJoin(broadcast(nOrders))
          .select(col("a"), col("b"), col("supp_ab"),
            (round(col("n_orders").cast("double") * col("supp_ab")
              / (col("supp_a") * col("supp_b")) * 1e6) / 1e6).as("lift"))
          .orderBy(col("lift").desc, col("a"), col("b"))
          .limit(20)
      },
      Some("""WITH li AS (
             |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
             |), pair AS (
             |  SELECT x.p AS a, y.p AS b, COUNT(*) AS supp_ab
             |  FROM li x JOIN li y ON x.ok = y.ok AND x.p < y.p
             |  GROUP BY 1, 2 HAVING COUNT(*) >= 3
             |), item AS (
             |  SELECT p, COUNT(*) AS supp FROM li GROUP BY 1
             |), n AS (
             |  SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM li
             |)
             |SELECT a, b, supp_ab,
             |       round(CAST(n_orders AS DOUBLE) * supp_ab
             |             / (ia.supp * ib.supp) * 1e6) / 1e6 AS lift
             |FROM pair
             |JOIN item ia ON ia.p = a
             |JOIN item ib ON ib.p = b
             |CROSS JOIN n
             |ORDER BY lift DESC, a, b
             |LIMIT 20""".stripMargin)),

    // ── Q139: seasonal outlier flags — hourly sums scored against their
    //          OWN hour-of-day baseline, so a quiet 3am never trips a
    //          noon-calibrated threshold. Baselines from exact
    //          integer-cent moments (q95's replay discipline); z quantized
    //          at 1e-6; |z| > 2 flagged. (A 30-day corpus gives ~30
    //          samples per hour baseline; a (dow, hour) key would cap
    //          |z| ≤ √(n−1) ≈ 1.8 at n≈4 and flag nothing — baseline
    //          granularity must respect sample depth.) ────────────────────
    QueryDef("q139_seasonal_outliers",
      (s, dir) => {
        val hourly = t(s, dir, "events")
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg((sum(round(col("value") * 100)) / 100).as("v"))
          .withColumn("v100", round(col("v") * 100).cast("long"))
          .withColumn("hr", hour(col("h")))
        val base = hourly.groupBy("hr")
          .agg(count(lit(1)).as("n"), sum(col("v100")).as("s1"),
            sum(col("v100") * col("v100")).as("s2"))
        val n = col("n").cast("double")
        val s1 = col("s1").cast("double")
        val s2 = col("s2").cast("double")
        val z = (col("v100").cast("double") - s1 / n) /
          sqrt(s2 / n - (s1 / n) * (s1 / n))
        hourly.join(broadcast(base), Seq("hr"))
          .select(date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("h"),
            col("v"), (round(z * 1e6) / 1e6).as("z"))
          .filter(abs(col("z")) > 2.0)
      },
      Some("""WITH hourly AS (
             |  SELECT date_trunc('hour', ts) AS h,
             |         SUM(round(value * 100)) / 100 AS v
             |  FROM events GROUP BY 1
             |), keyed AS (
             |  SELECT h, v, CAST(round(v * 100) AS BIGINT) AS v100,
             |         hour(h) AS hr
             |  FROM hourly
             |), base AS (
             |  SELECT hr, COUNT(*) AS n,
             |         CAST(SUM(v100) AS BIGINT) AS s1,
             |         CAST(SUM(v100 * v100) AS BIGINT) AS s2
             |  FROM keyed GROUP BY 1
             |), scored AS (
             |  SELECT keyed.h, keyed.v,
             |         round((CAST(v100 AS DOUBLE)
             |                - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
             |               / sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
             |                      - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
             |                        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
             |               * 1e6) / 1e6 AS z
             |  FROM keyed JOIN base USING (hr)
             |)
             |SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS h, v, z
             |FROM scored WHERE abs(z) > 2.0""".stripMargin)),

    QueryDef("q119_interval_union",
      (s, dir) => {
        val iv = t(s, dir, "events")
          .select(col("user_id"), unix_timestamp(col("ts")).as("s0"))
          .withColumn("e0", col("s0") + 300)
        graft.operators.TimeSeries
          .mergeIntervals(iv, Seq("user_id"), "s0", "e0")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_islands"),
            sum(col("end") - col("start")).as("covered_sec"))
      },
      Some("""WITH iv AS (
             |  SELECT user_id,
             |         -- integer boundary count, not float epoch: CAST of
             |         -- the double epoch ROUNDS sub-second stamps up,
             |         -- Spark's unix_timestamp floors them
             |         date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
             |                   ts) AS s0,
             |         date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
             |                   ts) + 300 AS e0
             |  FROM events
             |), m AS (
             |  SELECT user_id, s0, e0,
             |         MAX(e0) OVER (PARTITION BY user_id ORDER BY s0, e0
             |                       ROWS BETWEEN UNBOUNDED PRECEDING
             |                       AND 1 PRECEDING) AS pm
             |  FROM iv
             |), fl AS (
             |  SELECT user_id, s0, e0,
             |         CASE WHEN pm IS NULL OR s0 > pm THEN 1 ELSE 0 END AS nw
             |  FROM m
             |), isl AS (
             |  SELECT user_id, s0, e0,
             |         SUM(nw) OVER (PARTITION BY user_id ORDER BY s0, e0
             |                       ROWS UNBOUNDED PRECEDING) AS island
             |  FROM fl
             |), g AS (
             |  SELECT user_id, island, MIN(s0) AS st, MAX(e0) AS en
             |  FROM isl GROUP BY 1, 2
             |)
             |SELECT user_id, COUNT(*) AS n_islands,
             |       CAST(SUM(en - st) AS BIGINT) AS covered_sec
             |FROM g GROUP BY 1""".stripMargin)),

    // ── Q191: corpus-wide HNSW near-dup pairs
    //          ([[graft.operators.Dedup.hnswNearDupPairs]]) — the
    //          scale-safe SEMANTIC-dedup default, GEOMETRY-ROUTED since
    //          round 12: IVF cells shard the graph index, each vector
    //          probes only its nProbe nearest cells (n·nProbe shuffled
    //          probe rows — linear, vs the retired fan-out's n·shards),
    //          candidates re-scored with the exact cosine, q35's exact
    //          (i < j, cos) shape out. The oracle is q35's UNCHANGED —
    //          the strongest possible claim: the routed graph search
    //          must reproduce the exact all-pairs route BITWISE. That
    //          recall-1.0 demand is DELIBERATELY brittle: at shards=4 ≤
    //          nProbe=8 routing is exhaustive by construction, and a
    //          single in-cell HNSW miss would fail the hash visibly (the
    //          point of the exact oracle); the tolerant form of the same
    //          check is HnswSpec's ≥ 0.95 line at every shipped SF and
    //          the rehearsal's planted-twin recall at 50× pruning. ───────
    QueryDef("q191_hnsw_neardup_pairs",
      (s, dir) => graft.operators.Dedup.hnswNearDupPairs(
        t(s, dir, "embeddings"), 0.35, shards = 4),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
             |SELECT a.vec_id AS i, b.vec_id AS j,
             |       ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos
             |FROM e a JOIN e b ON a.vec_id < b.vec_id
             |WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.35""".stripMargin)),

    // ── Q192: SemDeDup-style semantic dedup (Abbas et al. 2023)
    //          ([[graft.operators.Dedup.semanticDedup]]) — the full
    //          composition q191 exists for: graph-index near-dup pairs →
    //          connected components → (quality desc, id asc) argmax per
    //          cluster (q134's representative policy over EMBEDDING
    //          clusters instead of shingle clusters). The oracle replays
    //          every leg in SQL: exact cosine pairs at the threshold,
    //          recursive min-label walk, windowed argmax — nothing about
    //          the engine's route is trusted. ─────────────────────────────
    QueryDef("q192_semantic_dedup",
      (s, dir) => graft.operators.Dedup.semanticDedup(
        t(s, dir, "embeddings"), t(s, dir, "documents"), "n_chars",
        threshold = 0.35, shards = 4),
      Some("""WITH RECURSIVE e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
             |), nd AS (
             |  SELECT a.vec_id AS i, b.vec_id AS j
             |  FROM e a JOIN e b ON a.vec_id < b.vec_id
             |  WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.35
             |), edges AS (
             |  SELECT i, j FROM nd UNION ALL SELECT j AS i, i AS j FROM nd
             |), walk(doc_id, lbl) AS (
             |  SELECT DISTINCT i, i FROM edges
             |  UNION
             |  SELECT e.i, w.lbl FROM walk w JOIN edges e ON e.j = w.doc_id
             |), comp AS (
             |  SELECT doc_id, MIN(lbl) AS cluster FROM walk GROUP BY doc_id
             |), scored AS (
             |  SELECT comp.cluster, comp.doc_id, d.n_chars,
             |         row_number() OVER (PARTITION BY comp.cluster
             |                            ORDER BY d.n_chars DESC,
             |                                     comp.doc_id ASC) AS rn,
             |         COUNT(*) OVER (PARTITION BY comp.cluster) AS n_members
             |  FROM comp JOIN documents d USING (doc_id)
             |)
             |SELECT cluster, doc_id AS keep_id, n_chars AS keep_n_chars,
             |       n_members
             |FROM scored WHERE rn = 1""".stripMargin)),

    // ── Q193: batch ANN serving from the graph index
    //          ([[graft.operators.Hnsw.batchNeighbors]]) — the
    //          query-serving surface completing the lifecycle beside
    //          q188 (single query) and q190 (admission): a FRAME of
    //          probes (vec_ids < 5) top-10-searched against the store
    //          built on the rest, one distributed pass, per-probe
    //          (vec_id, cos, rank) out. Oracle contract is q188's:
    //          returned ids are data-derived literals from a dump-time
    //          re-run of the same deterministic search, but every
    //          SCORE is recomputed and every RANK re-derived by DuckDB —
    //          a wrong id, score, or ordering all break the hash. ────────
    QueryDef("q193_hnsw_batch_serve",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        graft.operators.Hnsw.batchNeighbors(
          graft.operators.Hnsw.build(
            emb.filter(col("vec_id") >= 5), shards = 4),
          emb.filter(col("vec_id") < 5)
            .select(col("vec_id").as("probe_id"), col("embedding")),
          k = 10, efSearch = 48)
      },
      None,
      dynamicOracle = Some(hnswBatchServeOracleSql)),

    // ── Q194: geo-store admission lifecycle ([[graft.operators.Hnsw.addGeo]])
    //          — q190's admission theorem transplanted to the 100 TB
    //          semantic-dedup default route: the index is trained ONCE on
    //          the full distribution (the frozen-geometry discipline),
    //          the store is built on vec_ids < 250 and GROWS by warm
    //          per-cell insertion of the rest (monotone arrivals), and
    //          the routed near-dup scan runs over the admitted store.
    //          The oracle is q191's EXACT all-pairs SQL UNCHANGED — the
    //          strongest claim available: by addGeo's monotone-id
    //          bitwise-rebuild theorem (HnswSpec) the admitted store IS
    //          the from-scratch buildGeo store, so the routed scan must
    //          reproduce the exact route bitwise, exactly as q191's
    //          does. Same deliberate recall-1.0 brittleness, same
    //          tolerant backstops (HnswSpec's planted-twin lines). ───────
    QueryDef("q194_hnsw_addgeo_neardup",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val index = graft.operators.IVF.train(emb, 4, 5,
          maxTrainRows = 400L)
        val store = graft.operators.Hnsw.addGeo(
          graft.operators.Hnsw.buildGeo(
            emb.filter(col("vec_id") < 250), index),
          emb.filter(col("vec_id") >= 250), index)
        graft.operators.Hnsw.nearDupPairsRouted(store, index, 0.35,
          nProbe = 8)
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
             |SELECT a.vec_id AS i, b.vec_id AS j,
             |       ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos
             |FROM e a JOIN e b ON a.vec_id < b.vec_id
             |WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.35""".stripMargin)),

    // ── Q195: routed cross-corpus contamination
    //          ([[graft.operators.Hnsw.crossNearDupsRouted]]) — q67's
    //          train×eval audit rebuilt for corpus-sized EVAL sets: the
    //          exact route broadcasts the eval side (impossible once eval
    //          is itself a corpus); here the train corpus stands as a
    //          geo index and each eval vector probes only its nProbe
    //          nearest cells — n_eval·nProbe shuffled rows, train never
    //          replicates. The oracle is q67's exact cross-join SQL
    //          UNCHANGED (cells = 4 ≤ nProbe = 8 → routing is exhaustive
    //          by construction, the q191 discipline). ─────────────────────
    QueryDef("q195_routed_contamination",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val train = emb.filter(col("vec_id") < 400)
        val index = graft.operators.IVF.train(train, 4, 5,
          maxTrainRows = 400L)
        graft.operators.Hnsw.crossNearDupsRouted(
          graft.operators.Hnsw.buildGeo(train, index), index,
          emb.filter(col("vec_id") >= 400)
            .select(col("vec_id").as("probe_id"), col("embedding")),
          threshold = 0.35, nProbe = 8)
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
             |SELECT a.vec_id AS i, b.vec_id AS j,
             |       ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos
             |FROM e a, e b
             |WHERE a.vec_id < 400 AND b.vec_id >= 400
             |  AND ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.35""".stripMargin)),

    // ── Q196: the PERSISTED geo-store lifecycle end-to-end
    //          ([[graft.operators.HnswGeoStore]]) — q194 showed the
    //          warm-insertion kernel; this drives the full STORE
    //          discipline the streaming sink replays: build a base epoch
    //          on the low third, append a monotone delta epoch, fold
    //          both plus a second batch into a compacted base by warm
    //          insertion, then run the routed near-dup scan over the
    //          standing segments. By the addGeo theorem the compacted
    //          base is bitwise the from-scratch buildGeo over the union,
    //          so q191's exact all-pairs SQL remains the oracle — the
    //          whole epoch/commit/stride/compaction machinery must be
    //          value-invisible, and any striding or versioning slip
    //          breaks the hash. ──────────────────────────────────────────
    QueryDef("q196_geostore_lifecycle",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val index = graft.operators.IVF.train(emb, 4, 5,
          maxTrainRows = 400L)
        val path = s"${System.getProperty("java.io.tmpdir")}/graft-geostore-q196"
        val base = graft.operators.HnswGeoStore.build(s,
          emb.filter(col("vec_id") < 200), path, index)
        val grown = graft.operators.HnswGeoStore.append(s, base,
          emb.filter(col("vec_id") >= 200 && col("vec_id") < 350))
        val compacted = graft.operators.HnswGeoStore.append(s, grown,
          emb.filter(col("vec_id") >= 350), asBase = true)
        graft.operators.HnswGeoStore.nearDupPairs(compacted, 0.35,
          nProbe = 8)
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
             |SELECT a.vec_id AS i, b.vec_id AS j,
             |       ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos
             |FROM e a JOIN e b ON a.vec_id < b.vec_id
             |WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.35""".stripMargin)),

    // ── Q197: contamination audit over the PERSISTED segmented geo
    //          store ([[graft.operators.HnswGeoStore.crossNearDups]]) —
    //          q195's corpus-sized-eval route without the
    //          compact-to-one-base detour: the standing store is left
    //          MULTI-EPOCH (a base plus a delta segment), so the eval
    //          probes must route across epochs×nProbe cell graphs and
    //          any striding or epoch-versioning slip surfaces as a
    //          missing or duplicated pair. The oracle is q67's exact
    //          cross-join SQL UNCHANGED (cells = 4 ≤ nProbe = 8 →
    //          routing exhaustive by construction, the q195
    //          discipline). ────────────────────────────────────────────
    QueryDef("q197_geostore_contamination",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val train = emb.filter(col("vec_id") < 300)
        val index = graft.operators.IVF.train(train, 4, 5,
          maxTrainRows = 400L)
        val path = s"${System.getProperty("java.io.tmpdir")}/graft-geostore-q197"
        val base = graft.operators.HnswGeoStore.build(s,
          emb.filter(col("vec_id") < 150), path, index)
        val grown = graft.operators.HnswGeoStore.append(s, base,
          emb.filter(col("vec_id") >= 150 && col("vec_id") < 300))
        graft.operators.HnswGeoStore.crossNearDups(grown,
          emb.filter(col("vec_id") >= 300)
            .select(col("vec_id").as("probe_id"), col("embedding")),
          threshold = 0.35, nProbe = 8)
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
             |SELECT a.vec_id AS i, b.vec_id AS j,
             |       ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos
             |FROM e a, e b
             |WHERE a.vec_id < 300 AND b.vec_id >= 300
             |  AND ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.35""".stripMargin)),

    // ── Q198: incremental drift stats over the geo store
    //          ([[graft.operators.HnswGeoStore.currentStats]]) — the
    //          drift CHECK priced at epoch-count instead of a corpus
    //          scan: every append writes its batch's
    //          [[graft.operators.IVF.cellStats]] snapshot, and the
    //          standing measurement is a FOLD of the snapshots in their
    //          1e-6-quantized integer domain. The store is built in
    //          three epochs covering the whole table, so the fold must
    //          reproduce q148's full-recompute oracle EXACTLY — same
    //          dynamic SQL, zero tolerance: a drifted fold (float
    //          re-association, a lost epoch, a double-counted batch)
    //          hash-fails. ─────────────────────────────────────────────
    QueryDef("q198_geostore_drift_stats",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val idx = graft.operators.IVF.train(emb, k = 16)
        val path = s"${System.getProperty("java.io.tmpdir")}/graft-geostore-q198"
        val base = graft.operators.HnswGeoStore.build(s,
          emb.filter(col("vec_id") < 200), path, idx)
        val grown = graft.operators.HnswGeoStore.append(s, base,
          emb.filter(col("vec_id") >= 200 && col("vec_id") < 350))
        val full = graft.operators.HnswGeoStore.append(s, grown,
          emb.filter(col("vec_id") >= 350))
        graft.operators.HnswGeoStore.currentStats(s, full)
      },
      None,
      dynamicOracle = Some(cellStatsOracleSql)),

    // ── Q199: FILTERED batch ANN serving
    //          ([[graft.operators.Hnsw.batchNeighborsFiltered]]) — the
    //          attribute-predicated top-k every vector DB ships and
    //          post-filtering can't provide: the predicate (vec_id % 3
    //          = 0, standing in for "WHERE lang = 'en'") is pushed INTO
    //          the per-shard graph search — traversal unrestricted, an
    //          allowed-only result heap collects — so each probe's k
    //          rows all satisfy the filter. Oracle contract extends
    //          q193's: returned (probe, id) pairs are dump-time re-run
    //          literals, DuckDB re-scores + re-ranks them AND re-applies
    //          the predicate, so a wrong id, score, rank, or a single
    //          filter-violating row all break the hash. ─────────────────
    QueryDef("q199_hnsw_filtered_serve",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        graft.operators.Hnsw.batchNeighborsFiltered(
          graft.operators.Hnsw.build(
            emb.filter(col("vec_id") >= 5), shards = 4),
          emb.filter(col("vec_id") < 5)
            .select(col("vec_id").as("probe_id"), col("embedding")),
          emb.filter(col("vec_id") % 3 === 0).select(col("vec_id")),
          k = 10, efSearch = 64)
      },
      None,
      dynamicOracle = Some(hnswFilteredServeOracleSql)),

    // ── Q200: the FULL curation ladder
    //          ([[graft.pipelines.CorpusPipeline.curateSemantic]]) —
    //          q85's flagship extended to the geo route: quality →
    //          language → exact + MinHash near-dup (the q85 text legs,
    //          bitwise unchanged) → geometry-routed SEMANTIC dedup over
    //          the survivors' embeddings (q191's routed pair scan →
    //          q192's closure + keep-best-copy argmax on n_tokens).
    //          One composition, one oracle: q85's CTE chain + q192's
    //          recursive replay restricted to the kept docs — a slip in
    //          ANY leg (a lost survivor, a wrong pair, a wrong
    //          representative) breaks the hash. shards=4 ≤ nProbe → the
    //          routed leg is exhaustive by construction (the q191
    //          discipline); threshold 0.35 keeps the pair graph
    //          non-trivial on the near-isotropic testdata. ───────────────
    QueryDef("q200_curate_semantic",
      (s, dir) => graft.pipelines.CorpusPipeline.curateSemantic(
          t(s, dir, "documents").select(col("doc_id"), col("text")),
          t(s, dir, "embeddings"),
          graft.pipelines.CorpusPipeline.Config(
            permHash = Dedup.Md5PermHash),
          semanticThreshold = 0.35, shards = 4)
        .select(col("doc_id"), col("n_tokens"), col("mean_tok_len"),
          col("stop_ratio"), col("predicted_lang"), col("dup_count"),
          col("subword_tokens"), col("fingerprint")),
      Some(curateSemanticOracleSql)),

    // ── Q201: INCREMENTAL curation admission
    //          ([[graft.pipelines.CorpusPipeline.admitBatch]]) — the
    //          q84 → q85 step repeated at the geo route: a standing
    //          corpus (quality+language survivors below doc_id 300)
    //          lives as BOTH stores — the generational text-dedup store
    //          and the segmented geo graph store over its embeddings —
    //          and a batch (doc_id ≥ 300) runs the FULL curation ladder
    //          against that standing state: quality → language → exact +
    //          MinHash near-dup vs corpus → routed semantic near-dup vs
    //          corpus, all batch-sized, nothing re-curating the world.
    //          The oracle replays every arm over corpus ∪ batch (q84's
    //          discipline + q200's semantic leg); 4 cells ≤ nProbe 8
    //          keeps the routed arm exhaustive, so the replay is exact. ──
    QueryDef("q201_admit_batch",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val emb = t(s, dir, "embeddings")
        val config = graft.pipelines.CorpusPipeline.Config(
          permHash = Dedup.Md5PermHash)
        val corpus = graft.pipelines.CorpusPipeline.qualityLang(
            docs.filter(col("doc_id") < 300), config)
          .select(col("doc_id"), col("text"))
        val tPath =
          s"${System.getProperty("java.io.tmpdir")}/graft-admit-text-q201"
        val gPath =
          s"${System.getProperty("java.io.tmpdir")}/graft-admit-geo-q201"
        // delete-first (q154's discipline, ADVICE r15): stale state from
        // a prior run against a DIFFERENT dataset in the same tmpdir must
        // not leak into the dump-time oracle re-run
        val fsq = new org.apache.hadoop.fs.Path(tPath)
          .getFileSystem(s.sessionState.newHadoopConf())
        fsq.delete(new org.apache.hadoop.fs.Path(tPath), true)
        fsq.delete(new org.apache.hadoop.fs.Path(gPath), true)
        // the two standing-store SEEDS are independent (text store over the
        // corpus texts, geo store over their embeddings — both read only
        // the persisted qualityLang frame) — overlapped like admitBatch's
        // folds ([[graft.operators.ParWrites]], guide §2.6): each seed is a
        // chain of small jobs whose driver latency otherwise serializes
        val corpusEmb = emb.select(col("vec_id"), col("embedding"))
          .join(corpus.select(col("doc_id").as("vec_id")),
            Seq("vec_id"), "left_semi")
        @volatile var textStore: graft.operators.DedupState.Store = null
        @volatile var geoStore: graft.operators.HnswGeoStore.Store = null
        graft.operators.ParWrites.run(
          () => textStore = graft.operators.DedupState.build(
            s, corpus, tPath, hashTag = "md5"),
          () => {
            val index = graft.operators.IVF.train(corpusEmb, 4, 5,
              maxTrainRows = 400L)
            geoStore = graft.operators.HnswGeoStore.build(
              s, corpusEmb, gPath, index)
          })
        val (kept, _) = graft.pipelines.CorpusPipeline.admitBatch(s,
          graft.pipelines.CorpusPipeline.CorpusState(textStore, geoStore),
          docs.filter(col("doc_id") >= 300), emb, config,
          semanticThreshold = 0.35, nProbe = 8)
        kept.select(col("doc_id"), col("n_tokens"), col("mean_tok_len"),
          col("stop_ratio"), col("predicted_lang"), col("dup_count"),
          col("subword_tokens"), col("fingerprint"))
      },
      Some(admitBatchOracleSql)),

    // ── Q202: filtered ANN serving over STORED attribute payloads
    //          ([[graft.operators.HnswGeoStore.batchNeighborsFilteredExpr]])
    //          — q199's predicate pushdown completed to deployment shape:
    //          the attribute (`bucket`) is written BESIDE the vectors at
    //          build/append time (cell-strided attrs relations, the
    //          graph/vector columns bitwise untouched), and the serve's
    //          predicate is a Column expression the store evaluates in
    //          its own probed-cell-pruned attr scan — no corpus-sized
    //          attribute join per query. Two epochs exercise the attr
    //          fan-out; 4 cells ≤ nProbe 8 → routing exhaustive. Oracle
    //          contract extends q199's: returned (probe, id) pairs are
    //          dump-time re-run literals, DuckDB re-scores + re-ranks
    //          them AND re-derives the predicate from vec_id, so a wrong
    //          id, score, rank, or one filter-violating row breaks the
    //          hash. ─────────────────────────────────────────────────────
    QueryDef("q202_geostore_attr_serve",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val corpus = emb.filter(col("vec_id") >= 5)
          .select(col("vec_id"), col("embedding"),
            pmod(col("vec_id"), lit(7L)).as("bucket"))
        val index = graft.operators.IVF.train(corpus, 4, 5,
          maxTrainRows = 400L)
        val path =
          s"${System.getProperty("java.io.tmpdir")}/graft-geostore-q202"
        val base = graft.operators.HnswGeoStore.build(s,
          corpus.filter(col("vec_id") < 300), path, index)
        val grown = graft.operators.HnswGeoStore.append(s, base,
          corpus.filter(col("vec_id") >= 300))
        graft.operators.HnswGeoStore.batchNeighborsFilteredExpr(grown,
          emb.filter(col("vec_id") < 5)
            .select(col("vec_id").as("probe_id"), col("embedding")),
          col("bucket") === lit(2L), k = 10, efSearch = 64, nProbe = 8)
      },
      None,
      dynamicOracle = Some(geoAttrServeOracleSql)),

    // ── Q203: the ROUND-TRIP of incremental curation INTO filtered
    //          serving — q201's admission ladder run over an
    //          ATTRIBUTE-payload geo store (payload columns flow through
    //          [[graft.pipelines.CorpusPipeline.admitBatch]] into the
    //          admitted epoch's attrs), then q202's store-evaluated
    //          filtered serve over the RESULTING standing state (corpus
    //          base + admitted epoch). The composition a production
    //          curated corpus actually runs: curate incrementally, serve
    //          filtered. Oracle is q202's contract: dump-time re-run
    //          literals, DuckDB re-scores + re-ranks them AND re-derives
    //          the predicate from vec_id (`bucket` IS vec_id % 7), so a
    //          payload slip anywhere along build → admission → attrs
    //          fan-out → filtered heap breaks the hash. ─────────────────
    QueryDef("q203_admit_attr_serve",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val emb = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"),
            pmod(col("vec_id"), lit(7L)).as("bucket"))
        val config = graft.pipelines.CorpusPipeline.Config(
          permHash = Dedup.Md5PermHash)
        val corpus = graft.pipelines.CorpusPipeline.qualityLang(
            docs.filter(col("doc_id") >= 5 && col("doc_id") < 300), config)
          .select(col("doc_id"), col("text"))
        val tPath =
          s"${System.getProperty("java.io.tmpdir")}/graft-admit-text-q203"
        val gPath =
          s"${System.getProperty("java.io.tmpdir")}/graft-admit-geo-q203"
        // delete-first (q154's discipline, ADVICE r15)
        val fsq = new org.apache.hadoop.fs.Path(tPath)
          .getFileSystem(s.sessionState.newHadoopConf())
        fsq.delete(new org.apache.hadoop.fs.Path(tPath), true)
        fsq.delete(new org.apache.hadoop.fs.Path(gPath), true)
        // independent store seeds overlapped — q201's discipline
        val corpusEmb = emb
          .join(corpus.select(col("doc_id").as("vec_id")),
            Seq("vec_id"), "left_semi")
        @volatile var textStore: graft.operators.DedupState.Store = null
        @volatile var geoStore: graft.operators.HnswGeoStore.Store = null
        graft.operators.ParWrites.run(
          () => textStore = graft.operators.DedupState.build(
            s, corpus, tPath, hashTag = "md5"),
          () => {
            val index = graft.operators.IVF.train(corpusEmb, 4, 5,
              maxTrainRows = 400L)
            geoStore = graft.operators.HnswGeoStore.build(
              s, corpusEmb, gPath, index)
          })
        val (_, st) = graft.pipelines.CorpusPipeline.admitBatch(s,
          graft.pipelines.CorpusPipeline.CorpusState(textStore, geoStore),
          docs.filter(col("doc_id") >= 300), emb, config,
          semanticThreshold = 0.35, nProbe = 8)
        graft.operators.HnswGeoStore.batchNeighborsFilteredExpr(st.geo,
          emb.filter(col("vec_id") < 5)
            .select(col("vec_id").as("probe_id"), col("embedding")),
          col("bucket") === lit(2L), k = 10, efSearch = 64, nProbe = 8)
      },
      None,
      dynamicOracle = Some(admitAttrServeOracleSql)),

    // ── Q204: DELETION from the standing geo store, round-tripped into
    //          routed serving — the takedown/GDPR lifecycle op a curated
    //          corpus receives against its STATE (round-15 verdict #1):
    //          build + append the store, DELETE a swath of stored ids
    //          spanning both epochs ([[graft.operators.HnswGeoStore
    //          .delete]] — a tombstone epoch, no corpus rewrite), COMPACT
    //          (physical removal; for monotone ids bitwise the never-saw
    //          build — HnswGeoStoreSpec pins that), then serve. Oracle is
    //          q202's dump-time-literal contract with the erased set
    //          re-derived from vec_id: DuckDB re-scores + re-ranks the
    //          returned pairs under membership `vec_id >= 5 AND
    //          vec_id % 5 <> 1`, so ONE erased id surviving anywhere
    //          along delete → compact → routed scan breaks the hash. ─────
    QueryDef("q204_geostore_delete",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val corpus = emb.filter(col("vec_id") >= 5)
          .select(col("vec_id"), col("embedding"))
        val index = graft.operators.IVF.train(corpus, 4, 5,
          maxTrainRows = 400L)
        val path =
          s"${System.getProperty("java.io.tmpdir")}/graft-geostore-q204"
        val base = graft.operators.HnswGeoStore.build(s,
          corpus.filter(col("vec_id") < 300), path, index)
        val grown = graft.operators.HnswGeoStore.append(s, base,
          corpus.filter(col("vec_id") >= 300))
        val erased = graft.operators.HnswGeoStore.delete(s, grown,
          corpus.filter(col("vec_id") % 5 === 1).select(col("vec_id")))
        val compacted = graft.operators.HnswGeoStore.compact(s, erased)
        graft.operators.HnswGeoStore.batchNeighbors(compacted,
          emb.filter(col("vec_id") < 5)
            .select(col("vec_id").as("probe_id"), col("embedding")),
          k = 10, efSearch = 64, nProbe = 8)
      },
      None,
      dynamicOracle = Some(geoDeleteServeOracleSql)),

    // ── Q205: FORGET from the standing text-dedup store, round-tripped
    //          into incremental admission — [[graft.operators.DedupState
    //          .forget]]'s value-identity contract under the full q84
    //          oracle: erase a swath of stored docs (tombstone
    //          generation, down-flip df-cap repair, fingerprint-registry
    //          arbitration), then admit a fresh batch over the
    //          post-forget store. The oracle replays the ENTIRE admission
    //          (reps → md5 anti-join → the md5 MinHash pipeline) over
    //          corpus-MINUS-erased — exactly what a store that never saw
    //          the erased docs computes — so a leftover posting row,
    //          fingerprint, or unrepaired signature anywhere breaks the
    //          hash. ─────────────────────────────────────────────────────
    QueryDef("q205_dedupstore_forget",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val path =
          s"${System.getProperty("java.io.tmpdir")}/graft-dedup-state-q205"
        val store = graft.operators.DedupState.build(
          s, docs.filter(col("doc_id") < 300), path, hashTag = "md5")
        val forgotten = graft.operators.DedupState.forget(s, store,
          docs.filter(col("doc_id") < 300 && col("doc_id") % 7 === 3)
            .select(col("doc_id")))
        graft.operators.DedupState.incrementalDedup(
          forgotten, docs.filter(col("doc_id") >= 300))
      },
      Some(forgetAdmissionOracleSql)),

    // ── Q207: the BUCKET-PARTITIONED generational layout under q205's
    //          ENTIRE forget-admission oracle — build(buckets = 16)
    //          writes every generation table with a hash-bucket
    //          partition column (posting/signatures/doc_fps by doc_id,
    //          shingle_df by s, fingerprints by h), so forget's
    //          erasure-keyed scans become PARTITION-pruned reads of the
    //          erased ids' buckets (round-16 verdict #2). The layout
    //          must be invisible in every value: the oracle replays the
    //          full admission over corpus-minus-erased exactly as q205's
    //          — a row misrouted to the wrong bucket, a prune that drops
    //          a live row, or a delta written with the wrong layout
    //          breaks the hash. DedupStateSpec pins the plain ≡ bucketed
    //          store relation-by-relation across the whole lifecycle. ───
    QueryDef("q207_bucketed_forget",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val path =
          s"${System.getProperty("java.io.tmpdir")}/graft-dedup-state-q207"
        val store = graft.operators.DedupState.build(
          s, docs.filter(col("doc_id") < 300), path, hashTag = "md5",
          buckets = 16)
        val forgotten = graft.operators.DedupState.forget(s, store,
          docs.filter(col("doc_id") < 300 && col("doc_id") % 7 === 3)
            .select(col("doc_id")))
        graft.operators.DedupState.incrementalDedup(
          forgotten, docs.filter(col("doc_id") >= 300))
      },
      Some(forgetAdmissionOracleSql)),

    // ── Q206: the HOT-CELL BOUND, oracle-invisible — q191's routed
    //          near-dup scan with `maxCellNodes = 48`, which at this
    //          corpus forces EVERY cell past the cap to split into
    //          id-hash sub-shards under its centroid
    //          ([[graft.operators.Hnsw.GeoLayout]] — the round-16
    //          verdict's one unbounded per-task term, now capped by
    //          construction). The oracle is q191's exact all-pairs SQL
    //          UNCHANGED: probes fan to a probed cell's sub-shards, so
    //          the split must be INVISIBLE in the output — a probe row
    //          lost at the sub fan, a vector assigned off its frozen
    //          sub-shard, or a pair missed across a split boundary
    //          breaks the hash. HotCellSpec pins the other half of the
    //          claim (max per-task graph ≤ the cap envelope) on a
    //          planted-skew corpus. ─────────────────────────────────────
    QueryDef("q206_hot_cell_pairs",
      (s, dir) => graft.operators.Dedup.hnswNearDupPairs(
        t(s, dir, "embeddings"), 0.35, shards = 4, maxCellNodes = 48),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
             |SELECT a.vec_id AS i, b.vec_id AS j,
             |       ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos
             |FROM e a JOIN e b ON a.vec_id < b.vec_id
             |WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.35""".stripMargin)),

    // ── Q208: ATTRIBUTE UPDATE on the standing geo store
    //          ([[graft.operators.HnswGeoStore.updateAttrs]] — round-17
    //          verdict #3): the metadata-backfill lifecycle op. Build +
    //          append an attr store (`bucket` = vec_id % 7), then
    //          RE-SCORE a third of the corpus (vec_id % 3 = 0 →
    //          bucket = (vec_id % 7 + 3) % 7) as a PAYLOAD-ONLY update
    //          epoch — graph/vector rows bitwise untouched
    //          (AttrUpdateSpec pins that half) — then serve filtered on
    //          the UPDATED payloads through the latest-wins read path.
    //          Oracle is q202's dump-time-literal contract with the
    //          predicate re-derived from vec_id under the UPDATE rule:
    //          a STALE attr read anywhere (the old bucket passing the
    //          filter, or the new one missed) surfaces as a
    //          filter-violating literal and breaks the hash. ────────────
    QueryDef("q208_geostore_attr_update",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val corpus = emb.filter(col("vec_id") >= 5)
          .select(col("vec_id"), col("embedding"),
            pmod(col("vec_id"), lit(7L)).as("bucket"))
        val index = graft.operators.IVF.train(corpus, 4, 5,
          maxTrainRows = 400L)
        val path =
          s"${System.getProperty("java.io.tmpdir")}/graft-geostore-q208"
        val base = graft.operators.HnswGeoStore.build(s,
          corpus.filter(col("vec_id") < 300), path, index)
        val grown = graft.operators.HnswGeoStore.append(s, base,
          corpus.filter(col("vec_id") >= 300))
        val updated = graft.operators.HnswGeoStore.updateAttrs(s, grown,
          corpus.filter(pmod(col("vec_id"), lit(3L)) === 0L)
            .select(col("vec_id"),
              pmod(pmod(col("vec_id"), lit(7L)) + lit(3L), lit(7L))
                .as("bucket")))
        graft.operators.HnswGeoStore.batchNeighborsFilteredExpr(updated,
          emb.filter(col("vec_id") < 5)
            .select(col("vec_id").as("probe_id"), col("embedding")),
          col("bucket") === lit(2L), k = 10, efSearch = 64, nProbe = 8)
      },
      None,
      dynamicOracle = Some(geoAttrUpdateOracleSql)),

    // ── Q209: STORE-LEVEL digest ([[graft.operators.StoreDigest]] —
    //          round-17 verdict #4): the one-call replica/migration/
    //          restore audit, composed from q161's [[TableDigest]]
    //          algebra over a store's full relation set. The query runs
    //          the q208 lifecycle (build + append + attr-update) and
    //          digests the store; the output row is the RESOLVED attrs
    //          relation's digest — the one relation whose logical
    //          content is fully rule-derived (bucket from vec_id under
    //          the update rule, membership vec_id ≥ 5), so DuckDB
    //          recomputes the identical 63-bit md5-lane digest from the
    //          embeddings table INDEPENDENTLY (q161's cross-engine
    //          discipline): a stale payload, a lost row, or a
    //          resurrected erased id anywhere in the lifecycle moves
    //          xor/sum/count and breaks the hash. The geometry-shaped
    //          relations (vectors/graph/index/layout) ride the same
    //          digest call and are pinned by StoreDigestSpec
    //          (replica-reload, compaction invariance, addGeo ≡
    //          buildGeo). ──────────────────────────────────────────────
    QueryDef("q209_store_digest",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val corpus = emb.filter(col("vec_id") >= 5)
          .select(col("vec_id"), col("embedding"),
            pmod(col("vec_id"), lit(7L)).as("bucket"))
        val index = graft.operators.IVF.train(corpus, 4, 5,
          maxTrainRows = 400L)
        val path =
          s"${System.getProperty("java.io.tmpdir")}/graft-geostore-q209"
        val base = graft.operators.HnswGeoStore.build(s,
          corpus.filter(col("vec_id") < 300), path, index)
        val grown = graft.operators.HnswGeoStore.append(s, base,
          corpus.filter(col("vec_id") >= 300))
        val updated = graft.operators.HnswGeoStore.updateAttrs(s, grown,
          corpus.filter(pmod(col("vec_id"), lit(3L)) === 0L)
            .select(col("vec_id"),
              pmod(pmod(col("vec_id"), lit(7L)) + lit(3L), lit(7L))
                .as("bucket")))
        graft.operators.StoreDigest.digestGeo(s, updated)
          .filter(col("relation") === "attrs")
      },
      Some {
        def esc(c: String) =
          s"COALESCE(replace(replace(replace(CAST($c AS VARCHAR), " +
            "chr(2), chr(2) || chr(2)), chr(1), chr(2) || '1'), " +
            "chr(4), chr(2) || '4'), chr(4))"
        def lane(i: Int) =
          s"CAST(('0x' || substring(md5(s), ${1 + 8 * i}, 8)) AS BIGINT)"
        s"""WITH rel AS (
           |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
           |         CASE WHEN vec_id % 3 = 0 THEN (vec_id % 7 + 3) % 7
           |              ELSE vec_id % 7 END AS bucket
           |  FROM embeddings WHERE vec_id >= 5
           |), canon AS (
           |  SELECT ${esc("bucket")} || chr(1) || ${esc("vec_id")} AS s
           |  FROM rel
           |), hashed AS (
           |  SELECT xor(${lane(0)} << 31, ${lane(1)}) AS rh FROM canon
           |)
           |SELECT 'attrs' AS relation, COUNT(*) AS n_rows,
           |       CAST(bit_xor(rh) AS BIGINT) AS xor_digest,
           |       CAST(SUM(rh % 1000000007) % 1000000007 AS BIGINT)
           |         AS sum_digest
           |FROM hashed""".stripMargin
      })
  )

  /** q118's oracle: the identical entropy algebra generated from the same
    * class list ([[graft.functions.TextFunctions.EntropyClasses]]) — 27
    * length-delta counts + an "other" remainder, integer-weighted
    * 1e-6-quantized ln terms, one final double normalization.
    */
  private lazy val charEntropyOracleSql: String = {
    val classes = graft.functions.TextFunctions.EntropyClasses
    val defs = classes.zipWithIndex.map { case (c, i) =>
      s"CAST(length(s) - length(replace(s, '$c', '')) AS BIGINT) AS c$i"
    }.mkString(",\n         ")
    val sumLetters = classes.indices.map(i => s"c$i").mkString(" + ")
    val nOther = classes.size
    val terms = (0 to nOther).map(i =>
      s"""CASE WHEN c$i > 0
         |            THEN c$i * CAST(round(ln(CAST(c$i AS DOUBLE) / len)
         |                                  * 1e6) AS BIGINT)
         |            ELSE 0 END""".stripMargin).mkString("\n         + ")
    s"""WITH base AS (
       |  SELECT doc_id, lower(text) AS s,
       |         CAST(length(lower(text)) AS BIGINT) AS len
       |  FROM documents
       |), counts AS (
       |  SELECT doc_id, len,
       |         $defs
       |  FROM base
       |), wother AS (
       |  SELECT *, len - ($sumLetters) AS c$nOther FROM counts
       |), summed AS (
       |  SELECT doc_id, len,
       |         $terms
       |           AS s6
       |  FROM wother
       |)
       |SELECT doc_id,
       |       CASE WHEN len > 0 THEN round(-CAST(s6 AS DOUBLE) / len) / 1e6
       |            ELSE 0.0 END AS entropy
       |FROM summed""".stripMargin
  }

  /** q90's oracle: the naive window scan — every token position where the
    * phrase's terms line up, counted per doc.
    */
  private lazy val phraseOracleSql: String = {
    val terms = SearchPhrase.split(" ")
    val arms = terms.zipWithIndex
      .map { case (w, i) => s"t[i${if (i == 0) "" else s"+$i"}] = '$w'" }
      .mkString(" AND ")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |)
       |SELECT doc_id, COUNT(*) AS n_occurrences
       |FROM toks, UNNEST(range(1, len(t) - ${terms.length - 2})) AS r(i)
       |WHERE $arms
       |GROUP BY 1""".stripMargin
  }

  /** q91's oracle: one UNION ALL arm per column from the same
    * [[StatsCols]] list; n_nulls via COUNT(*) − COUNT(col) so every count
    * stays BIGINT (a SUM(CASE...) would widen to HUGEINT and trip the
    * oracle-typing lint).
    */
  private lazy val columnStatsOracleSql: String =
    StatsCols.map(c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |       COUNT(*) - COUNT($c) AS n_nulls,
         |       COUNT(DISTINCT $c) AS n_distinct,
         |       CAST(MIN($c) AS VARCHAR) AS min_str,
         |       CAST(MAX($c) AS VARCHAR) AS max_str
         |FROM lineitem""".stripMargin)
      .mkString("\nUNION ALL\n")

  /** q96's oracle: the id map replayed as a CASE chain generated from the
    * same [[EncodeVocab]] list (1-based list positions, ELSE 0 for OOV).
    */
  private lazy val vocabOracleSql: String = {
    val arms = EncodeVocab.zipWithIndex
      .map { case (t, i) => s"WHEN '$t' THEN ${i + 1}" }.mkString(" ")
    s"""WITH enc AS (
       |  SELECT doc_id,
       |         list_transform(string_split(text, ' '),
       |           x -> CASE x $arms ELSE 0 END) AS ids
       |  FROM documents
       |)
       |SELECT doc_id,
       |       CAST(len(list_filter(ids, x -> x = 0)) AS BIGINT) AS n_oov,
       |       array_to_string(ids, ' ') AS ids_str
       |FROM enc""".stripMargin
  }

  /** q97's oracle: the identical moment sums and the identically-
    * parenthesized fit formulas (slopeQ is textually repeated — SQL has
    * no lets — but it is the SAME expression over the same doubles, so
    * every occurrence evaluates identically).
    */
  private lazy val regressionOracleSql: String = {
    val n = "CAST(n AS DOUBLE)"
    val sx = "CAST(sx AS DOUBLE)"
    val sy = "CAST(sy AS DOUBLE)"
    val sxx = "CAST(sxx AS DOUBLE)"
    val syy = "CAST(syy AS DOUBLE)"
    val sxy = "CAST(sxy AS DOUBLE)"
    val varx = s"$n * $sxx - $sx * $sx"
    val vary = s"$n * $syy - $sy * $sy"
    val cov = s"$n * $sxy - $sx * $sy"
    val slopeQ = s"($cov) / ($varx)"
    s"""WITH q AS (
       |  SELECT event_type,
       |         CAST(round(hour(ts) * 1.0) AS BIGINT) AS x,
       |         CAST(round(value * 1000.0) AS BIGINT) AS y
       |  FROM events
       |), m AS (
       |  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
       |         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
       |  FROM q GROUP BY 1
       |)
       |SELECT event_type, n,
       |       CASE WHEN ($varx) > 0
       |            THEN ($slopeQ) * (1.0 / 1000.0) END AS slope,
       |       CASE WHEN ($varx) > 0
       |            THEN (($sy - ($slopeQ) * $sx) / $n) / 1000.0 END AS intercept,
       |       CASE WHEN ($varx) > 0 AND ($vary) > 0
       |            THEN (($cov) * ($cov)) / (($varx) * ($vary)) END AS r2
       |FROM m""".stripMargin
  }

  /** q95's oracle: generated from the same [[CorrCols]] list — identical
    * quantization, exact BIGINT moment sums (DuckDB widens to HUGEINT
    * internally; every sum is CAST to DOUBLE before the formula, so the
    * output schema stays Spark-emittable), and the identically-
    * parenthesized textbook formula.
    */
  private lazy val corrOracleSql: String = {
    val quant = CorrCols.map { case (c, s) =>
      s"CAST(round($c * $s) AS BIGINT) AS $c" }.mkString(",\n         ")
    val names = CorrCols.map(_._1)
    val moments = (names.flatMap(c =>
      Seq(s"SUM($c) AS s_$c", s"SUM($c * $c) AS ss_$c")) ++ (for {
        i <- names.indices; j <- names.indices if i < j
      } yield s"SUM(${names(i)} * ${names(j)}) AS sp_${names(i)}__${names(j)}"))
      .mkString(",\n         ")
    val arms = (for {
      i <- names.indices; j <- names.indices if i < j
    } yield {
      val (a, b) = (names(i), names(j))
      s"""SELECT '$a' AS col_a, '$b' AS col_b, n,
         |       CASE WHEN (CAST(n AS DOUBLE) * CAST(ss_$a AS DOUBLE)
         |                  - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE)) > 0
         |             AND (CAST(n AS DOUBLE) * CAST(ss_$b AS DOUBLE)
         |                  - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE)) > 0
         |            THEN (CAST(n AS DOUBLE) * CAST(sp_${a}__$b AS DOUBLE)
         |                  - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE))
         |                 / (sqrt(CAST(n AS DOUBLE) * CAST(ss_$a AS DOUBLE)
         |                         - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE))
         |                    * sqrt(CAST(n AS DOUBLE) * CAST(ss_$b AS DOUBLE)
         |                           - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE)))
         |       END AS corr
         |FROM m""".stripMargin
    }).mkString("\nUNION ALL\n")
    s"""WITH q AS (
       |  SELECT $quant
       |  FROM lineitem
       |), m AS (
       |  SELECT COUNT(*) AS n,
       |         $moments
       |  FROM q
       |)
       |$arms""".stripMargin
  }

  /** q89's oracle: the identical ISO-BMFF byte layout reconstructed with
    * big-endian hex arithmetic (brand hex embedded from [[Mp4Brands]]),
    * and the decoded fields derived from the same doc-metadata formulas
    * the fixture used — construction and decode check each other.
    */
  private lazy val mp4OracleSql: String = {
    def beHexSql(e: String, bytes: Int): String =
      s"lpad(upper(to_hex($e)), ${bytes * 2}, '0')"
    val brandArms = Mp4Brands.map(b => s"'$b'").mkString(", ")
    val brandHexArms = Mp4Brands
      .map(b => "'" + b.getBytes("UTF-8").map(c => f"$c%02X").mkString + "'")
      .mkString(", ")
    s"""WITH f AS (
       |  SELECT doc_id,
       |         ([$brandArms])[CAST(doc_id % 4 + 1 AS INT)] AS brand,
       |         ([$brandHexArms])[CAST(doc_id % 4 + 1 AS INT)] AS bhex,
       |         doc_id % 512 AS minor,
       |         n_chars * 100 + doc_id AS msz,
       |         doc_id % 4 = 0 AS wfree,
       |         doc_id % 5 = 0 AS lg
       |  FROM documents
       |), b AS (
       |  SELECT doc_id, brand, minor, msz, wfree,
       |         '0000001866747970' || bhex || ${beHexSql("minor", 4)}
       |         || bhex || '69736F6D'
       |         || CASE WHEN wfree THEN '0000001066726565' || repeat('00', 8)
       |                 ELSE '' END
       |         || '000000106D6F6F76' || repeat('00', 8)
       |         || CASE WHEN lg THEN '000000016D646174' || ${beHexSql("msz + 16", 8)}
       |                 ELSE ${beHexSql("msz + 8", 4)} || '6D646174' END AS ph
       |  FROM f
       |)
       |SELECT doc_id, ph AS payload_hex, 'mp4' AS format, brand AS major_brand,
       |       CAST(minor AS BIGINT) AS minor_version,
       |       CAST(CASE WHEN wfree THEN 4 ELSE 3 END AS BIGINT) AS n_boxes,
       |       CAST(msz AS BIGINT) AS mdat_bytes,
       |       CAST(1 AS BIGINT) AS has_moov
       |FROM b""".stripMargin
  }

  /** q87's oracle: the identical multi-line synthesis (header/body/footer),
    * the identical df pass (distinct docs per non-blank line, threshold
    * 50), and the strip/reassemble replayed with DuckDB list lambdas — the
    * boilerplate set rides in as a captured list scalar.
    */
  private lazy val boilerplateOracleSql: String =
    s"""WITH src AS (
       |  SELECT doc_id,
       |         'copyright acme corp' || chr(10) ||
       |         regexp_replace(text, '((?:\\S+ ){7}\\S+) ', '\\1' || chr(10), 'g') ||
       |         CASE WHEN doc_id % 3 = 0
       |              THEN chr(10) || 'subscribe to our newsletter' ELSE '' END ||
       |         CASE WHEN doc_id % 7 = 0
       |              THEN chr(10) || 'all rights reserved' ELSE '' END AS text
       |  FROM documents
       |), lined AS (
       |  SELECT doc_id, string_split(text, chr(10)) AS ls FROM src
       |), boiler AS (
       |  SELECT line FROM (
       |    SELECT line, COUNT(DISTINCT doc_id) AS line_df
       |    FROM (SELECT doc_id, unnest(ls) AS line FROM lined)
       |    WHERE trim(line) <> '' GROUP BY 1)
       |  WHERE line_df >= 50
       |), bl AS (SELECT coalesce(list(line), []) AS b FROM boiler)
       |SELECT l.doc_id, CAST(len(ls) AS BIGINT) AS n_lines,
       |       CAST(len(list_filter(ls, x -> list_contains(bl.b, x))) AS BIGINT)
       |         AS n_removed,
       |       array_to_string(list_filter(ls, x -> NOT list_contains(bl.b, x)),
       |         chr(10)) AS clean_text
       |FROM lined l, bl""".stripMargin

  /** q85's oracle: CorpusPipeline.curate replayed stage by stage. `feat`
    * computes the q27 quality features + the q30 langid argmax off one
    * lowercased scan; `qual` applies the Config-default thresholds
    * (minTokens=10, maxMeanTokenLength=15.0, minStopwordRatio=0.0,
    * languages=['en']); exact collapse + the md5 MinHash chain + keep-first
    * replay q40 over the SURVIVORS; the outer SELECT re-joins the feature
    * columns and adds the q28/q29 subword count and fingerprint.
    */
  /** The quality + language CTE prefix ([[graft.pipelines.CorpusPipeline
    * .qualityLang]]'s replay: q27 features + q30 langid argmax +
    * Config-default thresholds) — shared by the whole-corpus curation
    * oracles (q85/q200) and the batch-admission oracle (q201).
    */
  private lazy val qualityLangCtes: String =
    s"""feat AS (
       |  SELECT doc_id, text,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    CAST(list_sum(list_transform(string_split(text, ' '), x -> len(x))) AS DOUBLE)
       |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_tok_len,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the','a'))) AS DOUBLE)
       |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio,
       |    list_max([
       |    ${langIdEntriesSql("lower(text)")}
       |  ]) AS best
       |  FROM documents
       |), qual AS (
       |  SELECT doc_id, text, n_tokens, mean_tok_len, stop_ratio,
       |         CASE WHEN best.score > 0 THEN best.lang ELSE 'und' END AS predicted_lang
       |  FROM feat
       |  WHERE n_tokens >= 10 AND mean_tok_len <= 15.0 AND stop_ratio >= 0.0
       |), lang AS (
       |  SELECT * FROM qual WHERE predicted_lang IN ('en')
       |)""".stripMargin

  private lazy val curateCtes: String =
    s"""$qualityLangCtes, reps AS (
       |  SELECT MIN(doc_id) AS doc_id, text, COUNT(*) AS dup_count
       |  FROM lang GROUP BY text
       |), ${minhashPairCtes("reps", 0.8)},
       |kept AS (
       |  SELECT r.doc_id, r.text, r.dup_count FROM reps r
       |  WHERE r.doc_id NOT IN (SELECT j FROM verified)
       |)""".stripMargin

  // lazy like its consumers: the queries list forces the oracle strings
  // during object init, before later plain vals would be assigned
  private lazy val curateFinalSelect: String =
    """SELECT k.doc_id, q.n_tokens, q.mean_tok_len, q.stop_ratio,
      |       q.predicted_lang, k.dup_count,
      |       CAST(len(regexp_extract_all(k.text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT)
      |         AS subword_tokens,
      |       md5(k.text) AS fingerprint
      |FROM kept k JOIN lang q USING (doc_id)""".stripMargin

  private lazy val curateOracleSql: String =
    s"WITH $curateCtes\n$curateFinalSelect"

  /** q200's oracle: [[curateOracleSql]]'s full text-route replay (the
    * q85 CTE chain UNCHANGED) composed with q192's semantic-leg replay
    * restricted to the text route's survivors — exact cosine pairs over
    * the kept docs' embeddings, recursive min-label closure, and the
    * (n_tokens desc, doc_id asc) windowed argmax; non-representative
    * cluster members drop from q85's final select. Docs without an
    * embedding never enter the pair graph on either engine.
    */
  private lazy val curateSemanticOracleSql: String =
    s"""WITH RECURSIVE $curateCtes,
       |e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), ekept AS (
       |  SELECT e.vec_id, e.v FROM e JOIN kept k ON k.doc_id = e.vec_id
       |), nd AS (
       |  SELECT a.vec_id AS i, b.vec_id AS j
       |  FROM ekept a JOIN ekept b ON a.vec_id < b.vec_id
       |  WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.35
       |), sedges AS (
       |  SELECT i, j FROM nd UNION ALL SELECT j AS i, i AS j FROM nd
       |), swalk(doc_id, lbl) AS (
       |  SELECT DISTINCT i, i FROM sedges
       |  UNION
       |  SELECT s.i, w.lbl FROM swalk w JOIN sedges s ON s.j = w.doc_id
       |), scomp AS (
       |  SELECT doc_id, MIN(lbl) AS cluster FROM swalk GROUP BY doc_id
       |), srep AS (
       |  SELECT scomp.cluster, scomp.doc_id,
       |         row_number() OVER (PARTITION BY scomp.cluster
       |                            ORDER BY q.n_tokens DESC,
       |                                     scomp.doc_id ASC) AS rn
       |  FROM scomp JOIN lang q USING (doc_id)
       |), semdrop AS (
       |  SELECT doc_id FROM srep WHERE rn > 1
       |)
       |$curateFinalSelect
       |WHERE k.doc_id NOT IN (SELECT doc_id FROM semdrop)""".stripMargin

  /** q201's oracle: INCREMENTAL curation admission replayed arm by arm —
    * q84's discipline extended with the quality/lang prefix and q200's
    * semantic leg. `corpus` is the standing state's content (the
    * quality+language survivors below the split — exactly what the query
    * indexed into both stores); the text arms replay q84's (batch reps →
    * md5 anti-join vs the corpus → one MinHash chain over corpus ∪
    * unseen, dropping the j ≥ split side of verified pairs, which covers
    * both vs-corpus and smaller-id-batch-rep drops because corpus ids
    * all sort below batch ids); the semantic arm replays q200's policy
    * in ADMISSION form (drop on any corpus embedding at cos ≥ 0.35, or
    * any smaller-id batch survivor — the store-wins/min-id-kept rule,
    * including the deliberate pre-drop-pair conservatism both engines
    * share); the final select re-joins the feature columns. Exhaustive
    * by construction: 4 cells ≤ nProbe 8, so the routed search equals
    * the exact EXISTS.
    */
  private lazy val admitBatchOracleSql: String =
    s"""WITH $qualityLangCtes, corpus AS (
       |  SELECT doc_id, text FROM lang WHERE doc_id < 300
       |), breps AS (
       |  SELECT MIN(doc_id) AS doc_id, text, COUNT(*) AS dup_count
       |  FROM lang WHERE doc_id >= 300 GROUP BY text
       |), unseen AS (
       |  SELECT r.doc_id, r.text, r.dup_count FROM breps r
       |  WHERE md5(r.text) NOT IN (SELECT DISTINCT md5(text) FROM corpus)
       |), adm_src AS (
       |  SELECT doc_id, text FROM corpus
       |  UNION ALL
       |  SELECT doc_id, text FROM unseen
       |), ${minhashPairCtes("adm_src", 0.8)},
       |kept AS (
       |  SELECT u.doc_id, u.text, u.dup_count FROM unseen u
       |  WHERE u.doc_id NOT IN (SELECT j FROM verified WHERE j >= 300)
       |), e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), ecorp AS (
       |  SELECT e.vec_id, e.v FROM e JOIN corpus c ON c.doc_id = e.vec_id
       |), ebat AS (
       |  SELECT e.vec_id, e.v FROM e JOIN kept k ON k.doc_id = e.vec_id
       |), semdrop AS (
       |  SELECT b.vec_id AS doc_id FROM ebat b
       |  WHERE EXISTS (SELECT 1 FROM ecorp c
       |                WHERE ROUND(list_cosine_similarity(b.v, c.v), 6) >= 0.35)
       |     OR EXISTS (SELECT 1 FROM ebat a WHERE a.vec_id < b.vec_id
       |                AND ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.35)
       |)
       |$curateFinalSelect
       |WHERE k.doc_id NOT IN (SELECT doc_id FROM semdrop)""".stripMargin

  /** q84's oracle: admission replayed arm by arm. `verified` comes from
    * the shared MinHash CTE chain over (corpus ∪ unseen) — the same
    * relation [[graft.operators.DedupState.incrementalDedup]] shingles —
    * and a batch rep is dropped when it appears as the LARGER side of a
    * verified pair (corpus ids all sort below batch ids here, and
    * fresh-fresh pairs keep the smaller id, so `j >= 300` is exactly the
    * drop set). No NULL hazard in the NOT IN: j is a join key.
    */
  private lazy val admissionOracleSql: String =
    s"""WITH reps AS (
       |  SELECT MIN(doc_id) AS doc_id, text, COUNT(*) AS dup_count
       |  FROM documents WHERE doc_id >= 300 GROUP BY text
       |), corpus_h AS (
       |  SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 300
       |), unseen AS (
       |  SELECT r.doc_id, r.text, r.dup_count FROM reps r
       |  WHERE md5(r.text) NOT IN (SELECT h FROM corpus_h)
       |), adm_src AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id < 300
       |  UNION ALL
       |  SELECT doc_id, text FROM unseen
       |), ${minhashPairCtes("adm_src", 0.8)}
       |SELECT doc_id, text, dup_count FROM unseen
       |WHERE doc_id NOT IN (SELECT j FROM verified WHERE j >= 300)""".stripMargin

  /** q81's oracle: the WAV fixture layout rebuilt with DuckDB LE-hex
    * arithmetic (construction checked via payload_hex, decode via the
    * field columns). `leHexSql` mirrors [[Multimodal]]'s little-endian
    * field writer; `//` keeps DuckDB arithmetic integral (BIGINT, the
    * type Spark emits — enforced by OracleLintSpec).
    */
  private lazy val wavOracleSql: String = {
    def leHexSql(e: String, bytes: Int): String =
      (bytes to 1 by -1).map(b =>
        s"substring(lpad(upper(to_hex($e)), ${bytes * 2}, '0'), ${b * 2 - 1}, 2)")
        .mkString(" || ")
    s"""WITH f AS (
       |  SELECT doc_id,
       |         CAST(([8000,16000,22050,44100,48000])[CAST(doc_id % 5 + 1 AS INT)]
       |              AS BIGINT) AS sr,
       |         doc_id % 2 + 1 AS ch,
       |         (doc_id % 3 + 1) * 8 AS bps,
       |         n_chars * 50 + doc_id AS dsz,
       |         doc_id % 4 = 0 AS junk
       |  FROM documents
       |), g AS (
       |  SELECT *, ch * bps // 8 AS ba, sr * (ch * bps // 8) AS br FROM f
       |), b AS (
       |  SELECT doc_id, sr, ch, bps, dsz,
       |         '57415645'
       |         || CASE WHEN junk THEN '4A554E4B0C000000' || repeat('00', 12)
       |                 ELSE '' END
       |         || '666D7420100000000100' || ${leHexSql("ch", 2)}
       |         || ${leHexSql("sr", 4)} || ${leHexSql("br", 4)}
       |         || ${leHexSql("ba", 2)} || ${leHexSql("bps", 2)}
       |         || '64617461' || ${leHexSql("dsz", 4)} AS body
       |  FROM g
       |)
       |SELECT doc_id,
       |       '52494646' || ${leHexSql("length(body) // 2", 4)} || body
       |         AS payload_hex,
       |       'wav' AS format, ch AS channels, sr AS sample_rate,
       |       bps AS bits_per_sample, dsz AS data_bytes
       |FROM b""".stripMargin
  }


  /** q44's oracle: the identical seeded text, scrubbed by the identical
    * replace chain — generated from [[TextFunctions.PiiPatterns]] so both
    * engines share one pattern list.
    */
  private lazy val piiOracleSql: String = {
    val chain = TextFunctions.PiiPatterns.foldLeft("text") {
      case (e, (pattern, placeholder)) =>
        s"regexp_replace($e, '$pattern', '$placeholder', 'g')"
    }
    s"""WITH seeded AS (
       |  SELECT doc_id,
       |         text || ' contact user' || CAST(doc_id AS VARCHAR)
       |         || '@example.com at 10.0.' || CAST(doc_id % 256 AS VARCHAR)
       |         || '.7 or 555-123-4567 card 4111111111111111' AS text
       |  FROM documents
       |)
       |SELECT doc_id, $chain AS clean FROM seeded""".stripMargin
  }

  /** The MinHash+LSH near-dup pipeline replayed in DuckDB over the portable
    * md5 permutation hash, as a reusable CTE chain over source relation
    * `src` (must expose doc_id, text): df-capped posting list (as q22), 16
    * per-permutation minima, 4 banded signatures self-joined for
    * candidates, exact-Jaccard verification at the threshold. Ends with a
    * `verified(i, j, jac)` CTE. Shared by q23 (over documents) and q40
    * (over the exact-collapsed representatives).
    */
  private def minhashPairCtes(src: String, threshold: Double): String = {
    val numPerms = 16
    val bands = 4
    val rows = numPerms / bands
    // perm p = 8-hex lane (p % 4) of md5("${p/4}|" || s), mirroring
    // Dedup.Md5PermHash — one digest feeds four permutations
    def h(p: Int) =
      s"CAST(('0x' || substring(md5('${p / 4}|' || s), ${1 + 8 * (p % 4)}, 8)) AS BIGINT)"
    val minCols = (0 until numPerms).map(p => s"MIN(${h(p)}) AS mh$p")
      .mkString(",\n         ")
    val bandArms = (0 until bands).map { b =>
      val rs = (0 until rows).map(r => s"mh${b * rows + r} AS r$r").mkString(", ")
      s"  SELECT doc_id, $b AS band, $rs FROM sig"
    }.mkString("\n  UNION ALL\n")
    s"""toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM $src
       |), sh0 AS (
       |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       |  FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)
       |  WHERE len(t) >= 3
       |), keep AS (
       |  SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) <= 1000
       |), sh AS (
       |  SELECT sh0.doc_id, sh0.s FROM sh0 JOIN keep USING (s)
       |), sig AS (
       |  SELECT doc_id,
       |         $minCols
       |  FROM sh GROUP BY 1
       |), banded AS (
       |$bandArms
       |), cands AS (
       |  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.r0 = b.r0 AND a.r1 = b.r1
       |   AND a.r2 = b.r2 AND a.r3 = b.r3 AND a.doc_id < b.doc_id
       |), sz AS (
       |  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1
       |), common AS (
       |  SELECT c.i, c.j, COUNT(*) AS common
       |  FROM cands c
       |  JOIN sh x ON x.doc_id = c.i
       |  JOIN sh y ON y.doc_id = c.j AND y.s = x.s
       |  GROUP BY 1, 2
       |), verified AS (
       |  SELECT i, j,
       |         CAST(common AS DOUBLE) / CAST(sx.n + sy.n - common AS DOUBLE) AS jac
       |  FROM common JOIN sz sx ON i = sx.doc_id JOIN sz sy ON j = sy.doc_id
       |  WHERE CAST(common AS DOUBLE) / CAST(sx.n + sy.n - common AS DOUBLE) >= $threshold
       |)""".stripMargin
  }

  /** q23's oracle: the near-dup pipeline over documents. */
  private lazy val minhashOracleSql: String =
    s"""WITH ${minhashPairCtes("documents", 0.8)}
       |SELECT i, j, jac FROM verified""".stripMargin

  /** q160's oracle: [[graft.operators.Dedup.minhashCalibration]] replayed —
    * the [[minhashPairCtes]] shingle/signature/banding construction (same
    * md5 lane hash, same df cap), candidate pairs ∪ md5-bucket background
    * pairs, per-pair lane agreement vs exact Jaccard, per-decile integer
    * averaging. Interior sums cast to BIGINT (HUGEINT discipline).
    */
  private lazy val calibrationOracleSql: String = {
    val numPerms = 16
    val bands = 4
    val rows = numPerms / bands
    val backgroundPairBudget = 100000L
    val pairBuckets = 16
    def h(p: Int) =
      s"CAST(('0x' || substring(md5('${p / 4}|' || s), ${1 + 8 * (p % 4)}, 8)) AS BIGINT)"
    val minCols = (0 until numPerms).map(p => s"MIN(${h(p)}) AS mh$p")
      .mkString(",\n         ")
    val bandArms = (0 until bands).map { b =>
      val rs = (0 until rows).map(r => s"mh${b * rows + r} AS r$r").mkString(", ")
      s"  SELECT doc_id, $b AS band, $rs FROM sig"
    }.mkString("\n  UNION ALL\n")
    val eq = (0 until numPerms)
      .map(p => s"CASE WHEN a.mh$p = b.mh$p THEN 1 ELSE 0 END")
      .mkString(" + ")
    def bucket(prefix: String, m: Int) =
      s"CAST(('0x' || substr(md5('$prefix' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % $m"
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |), sh0 AS (
       |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       |  FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)
       |  WHERE len(t) >= 3
       |), keep AS (
       |  SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) <= 1000
       |), sh AS (
       |  SELECT sh0.doc_id, sh0.s FROM sh0 JOIN keep USING (s)
       |), sig AS (
       |  SELECT doc_id,
       |         $minCols,
       |         COUNT(*) AS sz
       |  FROM sh GROUP BY 1
       |), banded AS (
       |$bandArms
       |), cand AS (
       |  SELECT DISTINCT 'candidate' AS tag, a.doc_id AS i, b.doc_id AS j
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.r0 = b.r0 AND a.r1 = b.r1
       |   AND a.r2 = b.r2 AND a.r3 = b.r3 AND a.doc_id < b.doc_id
       |), bgmod AS (
       |  SELECT GREATEST(1, CAST(CEIL(COUNT(*) /
       |           sqrt(${2.0 * backgroundPairBudget * pairBuckets}))
       |         AS BIGINT)) AS m
       |  FROM sig
       |), samp AS (
       |  SELECT doc_id, ${bucket("pb:", pairBuckets)} AS pb
       |  FROM sig
       |  WHERE CAST(('0x' || substr(md5('cal:' || CAST(doc_id AS VARCHAR)),
       |          1, 8)) AS BIGINT) % (SELECT m FROM bgmod) = 0
       |), bg AS (
       |  SELECT 'background' AS tag, a.doc_id AS i, b.doc_id AS j
       |  FROM samp a JOIN samp b ON a.pb = b.pb AND a.doc_id < b.doc_id
       |), pairs AS (
       |  SELECT * FROM cand UNION ALL SELECT * FROM bg
       |), pd AS (
       |  SELECT DISTINCT i, j FROM pairs
       |), cmn AS (
       |  SELECT pd.i, pd.j, COUNT(*) AS common
       |  FROM pd
       |  JOIN sh x ON x.doc_id = pd.i
       |  JOIN sh y ON y.doc_id = pd.j AND y.s = x.s
       |  GROUP BY 1, 2
       |), q AS (
       |  SELECT p.tag, ($eq) AS eq,
       |         CAST(round(CAST(COALESCE(c.common, 0) AS DOUBLE)
       |                    / (a.sz + b.sz - COALESCE(c.common, 0)) * 1e6)
       |              AS BIGINT) AS jacq
       |  FROM pairs p
       |  JOIN sig a ON p.i = a.doc_id
       |  JOIN sig b ON p.j = b.doc_id
       |  LEFT JOIN cmn c ON p.i = c.i AND p.j = c.j
       |)
       |SELECT tag, CAST(LEAST(CAST(jacq / 100000 AS INT), 9) AS INT) AS decile,
       |       COUNT(*) AS n_pairs,
       |       round(CAST(SUM(eq) AS BIGINT) * 1000000
       |             / ($numPerms * COUNT(*))) / 1e6 AS avg_est,
       |       round(CAST(SUM(jacq) AS DOUBLE) / COUNT(*)) / 1e6 AS avg_exact
       |FROM q GROUP BY 1, 2""".stripMargin
  }

  /** q40's oracle: the full corpus-dedup composition — exact collapse to
    * min-id representatives, the near-dup pipeline over the REPS, then
    * keep-first (drop every doc appearing as the larger id of a surviving
    * pair). No NULL hazard in the NOT IN: j is a join key, never null.
    */
  private lazy val dedupCorpusOracleSql: String =
    s"""WITH reps AS (
       |  SELECT MIN(doc_id) AS doc_id, text, COUNT(*) AS dup_count
       |  FROM documents GROUP BY text
       |), ${minhashPairCtes("reps", 0.8)}
       |SELECT r.doc_id, r.text, r.dup_count
       |FROM reps r
       |WHERE r.doc_id NOT IN (SELECT j FROM verified)""".stripMargin

  /** q26's oracle: banded sign-projection LSH replayed in DuckDB. The 16
    * hyperplanes (8 bands × 2) come from the same deterministic LCG the
    * operator uses, embedded as literal DOUBLE[] rows (Double.toString
    * round-trips exactly, so both engines hold identical planes); the
    * query's signature and every vector's signature are summed from
    * list_inner_product signs, candidates match on any 2-bit band, exact
    * cosine ranks the candidates. Embeddings are 64-dim (testdata schema).
    */
  private lazy val annOracleSql: String = {
    val bands = 8
    val planesPerBand = 2
    val planes = Similarity.hyperplanes(bands * planesPerBand, 64)
    val planeRows = planes.zipWithIndex.map { case (p, b) =>
      s"($b, CAST([${p.mkString(", ")}] AS DOUBLE[]))"
    }.mkString(",\n    ")
    val mask = (1 << planesPerBand) - 1
    val bandMatch = (0 until bands).map(b =>
      s"((v.sig >> ${planesPerBand * b}) & $mask) = ((qs.sig >> ${planesPerBand * b}) & $mask)")
      .mkString("\n   OR ")
    s"""WITH planes(b, p) AS (VALUES
       |    $planeRows),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |qs AS (
       |  SELECT SUM(CASE WHEN list_inner_product(pl.p, q.qv) >= 0
       |                  THEN (1::BIGINT << pl.b) ELSE 0 END) AS sig
       |  FROM planes pl, q
       |),
       |vs AS (
       |  SELECT e.vec_id, e.v,
       |         SUM(CASE WHEN list_inner_product(pl.p, e.v) >= 0
       |                  THEN (1::BIGINT << pl.b) ELSE 0 END) AS sig
       |  FROM e CROSS JOIN planes pl WHERE e.vec_id <> 0
       |  GROUP BY e.vec_id, e.v
       |)
       |SELECT v.vec_id, ROUND(list_cosine_similarity(v.v, q.qv), 6) AS cos
       |FROM vs v, q, qs
       |WHERE $bandMatch
       |ORDER BY cos DESC, v.vec_id LIMIT 20""".stripMargin
  }

  /** q24's oracle: the sign-vote SimHash replayed in DuckDB over the
    * portable md5-60-bit token hash, then ALL-PAIRS Hamming ≤ 3 (exact by
    * pigeonhole, so it equals the Spark side's chunk-bucketed join; the
    * oracle's n² is fine at oracle scale). 60 per-bit vote sums are
    * generated programmatically.
    */
  private lazy val simhashOracleSql: String = {
    val bits = 60
    val bitSums = (0 until bits).map(b =>
      s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b$b")
      .mkString(",\n         ")
    val sigTerms = (0 until bits).map(b =>
      s"(CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
       |), h AS (
       |  SELECT doc_id, CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT) AS h
       |  FROM tok
       |), bits AS (
       |  SELECT doc_id,
       |         $bitSums
       |  FROM h GROUP BY 1
       |), sigs AS (
       |  SELECT doc_id, $sigTerms AS sig FROM bits
       |)
       |SELECT a.doc_id AS i, b.doc_id AS j,
       |       CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
       |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sig, b.sig)) <= 3""".stripMargin
  }

  /** q30's oracle: langId's marker-count argmax in DuckDB. A literal
    * marker's non-overlapping occurrence count equals
    * (len(t) − len(replace(t, m, ''))) / len(m); the argmax with Spark's
    * tie-break (max score, then lexicographically max lang) is DuckDB's
    * list_max over (score, lang) structs. Generated from
    * [[TextFunctions.langProfiles]] so both sides share one marker table.
    */
  /** The langid marker-argmax as a DuckDB `list_max` struct list over a
    * lowercased text column `lowCol` — shared by q30 and q85. Marker
    * occurrences via replace-length arithmetic (= non-overlapping count);
    * Spark's struct-max tie-break is list_max over (score, lang) structs.
    */
  private def langIdEntriesSql(lowCol: String): String = {
    def cnt(m: String): String = {
      val esc = m.replace("'", "''")
      s"(length($lowCol) - length(replace($lowCol, '$esc', ''))) // ${m.length}"
    }
    TextFunctions.langProfiles.map { case (lang, markers) =>
      s"{'score': ${markers.map(cnt).mkString(" + ")}, 'lang': '$lang'}"
    }.mkString(",\n    ")
  }

  private lazy val langIdOracleSql: String = {
    val entries = langIdEntriesSql("low")
    s"""WITH scored AS (
       |  SELECT lang,
       |         list_max([
       |    $entries
       |  ]) AS best
       |  FROM (SELECT lang, lower(text) AS low FROM documents)
       |)
       |SELECT lang,
       |       CASE WHEN best.score > 0 THEN best.lang ELSE 'und' END AS predicted,
       |       COUNT(*) AS cnt
       |FROM scored GROUP BY 1, 2""".stripMargin
  }

  /** q33's oracle: the zonal daily-MAPE pivot written out longhand.
    * Generated programmatically — 8 metrics × 5 zones of identical CASE
    * arms would be unreadable inline.
    */
  private lazy val zonalOracleSql: String = {
    val zones = Seq("click", "error", "purchase", "signup", "view")
    val metrics = Seq("forecast_mape", "backcast_mape", "forecast", "backcast",
      "settlement", "forecast_abs_error", "backcast_abs_error", "settlement_abs")
    val pivotCols = metrics.flatMap(m => zones.map(z =>
      s"  MAX(CASE WHEN zone = '$z' THEN $m END) AS ${m}_$z")).mkString(",\n")
    s"""WITH hourly AS (
       |  SELECT CAST(ts AS DATE) AS proxy_date, EXTRACT(hour FROM ts) AS h,
       |         event_type AS zone,
       |         SUM(ROUND(value*100)) AS forecast,
       |         SUM(ROUND(value*90)) AS backcast,
       |         SUM(ROUND(value*110)) AS settlement
       |  FROM events GROUP BY 1, 2, 3
       |), herr AS (
       |  SELECT *, ABS(forecast - settlement) AS forecast_abs_error,
       |         ABS(backcast - settlement) AS backcast_abs_error,
       |         ABS(settlement) AS settlement_abs
       |  FROM hourly
       |), daily AS (
       |  SELECT proxy_date, zone,
       |         SUM(forecast) AS forecast, SUM(backcast) AS backcast,
       |         SUM(settlement) AS settlement,
       |         SUM(forecast_abs_error) AS forecast_abs_error,
       |         SUM(backcast_abs_error) AS backcast_abs_error,
       |         SUM(settlement_abs) AS settlement_abs
       |  FROM herr GROUP BY 1, 2
       |), dmape AS (
       |  SELECT proxy_date, zone, forecast, backcast, settlement,
       |         forecast_abs_error, backcast_abs_error, settlement_abs,
       |         forecast_abs_error / settlement_abs AS forecast_mape,
       |         backcast_abs_error / settlement_abs AS backcast_mape
       |  FROM daily
       |  WHERE settlement_abs <> 0
       |    AND NOT (forecast = 0 AND backcast = 0)
       |    AND NOT (forecast_abs_error = 0 AND backcast_abs_error = 0)
       |)
       |SELECT strftime(proxy_date, '%Y-%m-%d') AS proxy_date,
       |$pivotCols
       |FROM dmape GROUP BY 1""".stripMargin
  }

  /** q127's oracle, generated at Verify time: train the same deterministic
    * per-subspace codebooks (PQ.train reuses IVF.train's seeded Lloyd per
    * slice), embed the encode argmin arms (subspace slices against
    * codeword literals — [[ivfOracleSql]]'s arms per subspace), the ADC
    * lookup tables (the SAME doubles [[graft.operators.PQ.adcLuts]]
    * computed for the Spark plan), the candidate cut, and the exact
    * re-rank.
    */
  private def pqOracleSql(s: SparkSession, dir: String): String = {
    import graft.operators.PQ
    val q = queryVector(s, dir)
    val cb = PQ.train(t(s, dir, "embeddings"), dim = q.length, m = 8,
      k = 16, iters = 3)
    val luts = PQ.adcLuts(cb, q)
    val sd = cb.subDim
    val codeCols = (0 until cb.m).map { j =>
      val vj = s"v[${j * sd + 1}:${(j + 1) * sd}]"
      val arms = cb.books(j).zipWithIndex.map { case (w, c) =>
        val c2 = w.map(x => x * x).sum
        s"{'d': $c2 - 2.0 * list_inner_product($vj, " +
          s"CAST([${w.mkString(", ")}] AS DOUBLE[])), 'cid': $c}"
      }.mkString(",\n        ")
      s"list_min([\n        $arms\n      ]).cid AS c$j"
    }.mkString(",\n      ")
    val estSum = luts.zipWithIndex.map { case (lut, j) =>
      s"(CAST([${lut.mkString(", ")}] AS DOUBLE[]))[c$j + 1]"
    }.mkString("\n         + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |codes AS (
       |  SELECT vec_id, v,
       |      $codeCols
       |  FROM e WHERE vec_id <> 0
       |), est AS (
       |  SELECT vec_id, v,
       |         $estSum AS est
       |  FROM codes
       |), cand AS (
       |  SELECT vec_id, v FROM est ORDER BY est ASC, vec_id ASC LIMIT 200
       |)
       |SELECT cand.vec_id, ROUND(list_cosine_similarity(cand.v, q.qv), 6)
       |         AS cos
       |FROM cand, q ORDER BY cos DESC, vec_id ASC LIMIT 20""".stripMargin
  }

  /** q128's oracle: [[ivfOracleSql]]'s coarse-assignment arms select the
    * probed cells, [[pqOracleSql]]'s encode arms + LUT sums rank inside
    * them, then the candidate cut and exact re-rank — the whole IVFADC
    * pipeline as one generated statement over literals the Spark plan
    * shares.
    */
  private def ivfadcOracleSql(s: SparkSession, dir: String): String = {
    import graft.operators.{IVF, PQ}
    val q = queryVector(s, dir)
    val emb = t(s, dir, "embeddings")
    val idx = IVF.train(emb, k = 16)
    val probes = IVF.probeIds(idx, q, 8)
    val cb = PQ.train(emb, dim = q.length, m = 8, k = 16, iters = 3)
    val luts = PQ.adcLuts(cb, q)
    val sd = cb.subDim
    val coarseArms = idx.centroids.zipWithIndex.map { case (c, i) =>
      val c2 = c.map(x => x * x).sum
      s"{'d': $c2 - 2.0 * list_inner_product(v, " +
        s"CAST([${c.mkString(", ")}] AS DOUBLE[])), 'cid': $i}"
    }.mkString(",\n      ")
    val codeCols = (0 until cb.m).map { j =>
      val vj = s"v[${j * sd + 1}:${(j + 1) * sd}]"
      val arms = cb.books(j).zipWithIndex.map { case (w, c) =>
        val c2 = w.map(x => x * x).sum
        s"{'d': $c2 - 2.0 * list_inner_product($vj, " +
          s"CAST([${w.mkString(", ")}] AS DOUBLE[])), 'cid': $c}"
      }.mkString(",\n        ")
      s"list_min([\n        $arms\n      ]).cid AS c$j"
    }.mkString(",\n      ")
    val estSum = luts.zipWithIndex.map { case (lut, j) =>
      s"(CAST([${lut.mkString(", ")}] AS DOUBLE[]))[c$j + 1]"
    }.mkString("\n         + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |probed AS (
       |  SELECT vec_id, v FROM (
       |    SELECT vec_id, v,
       |           list_min([
       |      $coarseArms
       |    ]).cid AS cell
       |    FROM e WHERE vec_id <> 0
       |  ) WHERE cell IN (${probes.mkString(", ")})
       |), codes AS (
       |  SELECT vec_id, v,
       |      $codeCols
       |  FROM probed
       |), est AS (
       |  SELECT vec_id, v,
       |         $estSum AS est
       |  FROM codes
       |), cand AS (
       |  SELECT vec_id, v FROM est ORDER BY est ASC, vec_id ASC LIMIT 200
       |)
       |SELECT cand.vec_id, ROUND(list_cosine_similarity(cand.v, q.qv), 6)
       |         AS cos
       |FROM cand, q ORDER BY cos DESC, vec_id ASC LIMIT 20""".stripMargin
  }

  /** q140's oracle: the residual-encoded IVFADC pipeline replayed level
    * by level — [[ivfadcOracleSql]]'s coarse-assignment arms, then the
    * row's own centroid via a CASE over the probed cells, the residual as
    * explicit per-element subtraction (the same IEEE double op
    * `zip_with(v, c, _ - _)` runs in the plan), code argmins over the
    * RESIDUAL subvectors, and a per-cell LUT CASE per subspace summed in
    * the same ascending-j order the Spark expression uses.
    */
  private def ivfadcResidualOracleSql(s: SparkSession, dir: String): String = {
    import graft.operators.{IVF, PQ}
    val q = queryVector(s, dir)
    val emb = t(s, dir, "embeddings")
    val idx = IVF.train(emb, k = 16)
    val probes = IVF.probeIds(idx, q, 8)
    val cb = PQ.trainResidual(emb, idx, dim = q.length, m = 8, k = 16,
      iters = 3)
    val lutsByCell = probes.map { i =>
      i -> PQ.adcLuts(cb,
        q.zip(idx.centroids(i)).map { case (a, b) => a - b })
    }
    val sd = cb.subDim
    val coarseArms = idx.centroids.zipWithIndex.map { case (c, i) =>
      val c2 = c.map(x => x * x).sum
      s"{'d': $c2 - 2.0 * list_inner_product(v, " +
        s"CAST([${c.mkString(", ")}] AS DOUBLE[])), 'cid': $i}"
    }.mkString(",\n      ")
    val cvecArms = probes.map { i =>
      s"WHEN $i THEN CAST([${idx.centroids(i).mkString(", ")}] AS DOUBLE[])"
    }.mkString("\n        ")
    val residElems = (1 to q.length).map(i => s"v[$i] - cvec[$i]")
      .mkString(", ")
    val codeCols = (0 until cb.m).map { j =>
      val rj = s"r[${j * sd + 1}:${(j + 1) * sd}]"
      val arms = cb.books(j).zipWithIndex.map { case (w, c) =>
        val c2 = w.map(x => x * x).sum
        s"{'d': $c2 - 2.0 * list_inner_product($rj, " +
          s"CAST([${w.mkString(", ")}] AS DOUBLE[])), 'cid': $c}"
      }.mkString(",\n        ")
      s"list_min([\n        $arms\n      ]).cid AS c$j"
    }.mkString(",\n      ")
    val estSum = (0 until cb.m).map { j =>
      val arms = lutsByCell.map { case (i, luts) =>
        s"WHEN $i THEN (CAST([${luts(j).mkString(", ")}] AS DOUBLE[]))[c$j + 1]"
      }.mkString("\n           ")
      s"(CASE cell\n           $arms\n         END)"
    }.mkString("\n         + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |probed AS (
       |  SELECT vec_id, v, cell FROM (
       |    SELECT vec_id, v,
       |           list_min([
       |      $coarseArms
       |    ]).cid AS cell
       |    FROM e WHERE vec_id <> 0
       |  ) WHERE cell IN (${probes.mkString(", ")})
       |), resid AS (
       |  SELECT vec_id, v, cell, [$residElems] AS r FROM (
       |    SELECT vec_id, v, cell,
       |           CASE cell
       |        $cvecArms
       |      END AS cvec
       |    FROM probed
       |  )
       |), codes AS (
       |  SELECT vec_id, v, cell,
       |      $codeCols
       |  FROM resid
       |), est AS (
       |  SELECT vec_id, v,
       |         $estSum AS est
       |  FROM codes
       |), cand AS (
       |  SELECT vec_id, v FROM est ORDER BY est ASC, vec_id ASC LIMIT 200
       |)
       |SELECT cand.vec_id, ROUND(list_cosine_similarity(cand.v, q.qv), 6)
       |         AS cos
       |FROM cand, q ORDER BY cos DESC, vec_id ASC LIMIT 20""".stripMargin
  }

  /** q148's oracle: the same deterministic index retrained, assignment
    * arms + per-cell centroid CASE + the IDENTICAL left-associative d²
    * fold (`0.0 + t₁ + t₂ + …` — Spark's `aggregate` with a 0.0 seed),
    * quantized per row before the per-cell long sums.
    */
  private def cellStatsOracleSql(s: SparkSession, dir: String): String = {
    import graft.operators.IVF
    val idx = IVF.train(t(s, dir, "embeddings"), k = 16)
    val coarseArms = idx.centroids.zipWithIndex.map { case (c, i) =>
      val c2 = c.map(x => x * x).sum
      s"{'d': $c2 - 2.0 * list_inner_product(v, " +
        s"CAST([${c.mkString(", ")}] AS DOUBLE[])), 'cid': $i}"
    }.mkString(",\n      ")
    val cvecArms = idx.centroids.zipWithIndex.map { case (c, i) =>
      s"WHEN $i THEN CAST([${c.mkString(", ")}] AS DOUBLE[])"
    }.mkString("\n        ")
    val dim = idx.centroids.head.length
    val d2 = (1 to dim).map(i => s"(v[$i] - cvec[$i]) * (v[$i] - cvec[$i])")
      .mkString("0.0 + ", " + ", "")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |a AS (
       |  SELECT vec_id, v,
       |         list_min([
       |      $coarseArms
       |    ]).cid AS cid
       |  FROM e
       |), c AS (
       |  SELECT cid, v,
       |         CASE cid
       |        $cvecArms
       |      END AS cvec
       |  FROM a
       |), d AS (
       |  SELECT cid, CAST(round(($d2) * 1e6) AS BIGINT) AS d2q FROM c
       |)
       |SELECT cid, COUNT(*) AS n,
       |       CAST(SUM(d2q) AS BIGINT) / 1e6 AS inertia,
       |       (CAST(SUM(d2q) AS BIGINT) / 1e6) / COUNT(*) AS mean_d2,
       |       MAX(d2q) / 1e6 AS max_d2
       |FROM d GROUP BY cid""".stripMargin
  }

  /** q129's oracle: re-learn the deterministic merge table, then emit SQL
    * in which every round's (lhs, rhs, n) row is DuckDB's OWN argmax over
    * the round's bigram counts — only the stream REWRITES (the chained
    * replaces feeding later rounds) embed learned pairs, so a divergent
    * Spark argmax in any round still hash-fails. Control chars ride
    * `chr()` calls; merged tokens embed as chr(2)-joined quoted parts.
    */
  private def bpeOracleSql(s: SparkSession, dir: String): String = {
    import graft.operators.Vocabulary
    val merges = Vocabulary.learnBpeMerges(t(s, dir, "documents"), rounds = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    def sqlTok(tok: String): String =
      tok.split("\u0002", -1)
        .map(p => "'" + p.replace("'", "''") + "'")
        .mkString(" || chr(2) || ")
    var streamExpr =
      "chr(1) || chr(1) || replace(text, ' ', chr(1) || chr(1)) " +
        "|| chr(1) || chr(1)"
    val roundSqls = merges.map { case (r, l, rr) =>
      val sql =
        s"""SELECT $r AS round, lhs, rhs, n FROM (
           |  SELECT t[i] AS lhs, t[i+1] AS rhs, COUNT(*) AS n
           |  FROM (SELECT list_filter(string_split($streamExpr,
           |                 chr(1) || chr(1)), x -> len(x) > 0) AS t
           |        FROM documents),
           |       UNNEST(range(1, len(t))) AS rr(i)
           |  GROUP BY 1, 2 ORDER BY n DESC, lhs, rhs LIMIT 1
           |)""".stripMargin
      val pat = s"chr(1) || ${sqlTok(l)} || chr(1) || chr(1) || " +
        s"${sqlTok(rr)} || chr(1)"
      val rep = s"chr(1) || ${sqlTok(l)} || chr(2) || ${sqlTok(rr)} || chr(1)"
      streamExpr = s"replace($streamExpr, $pat, $rep)"
      sql
    }
    roundSqls.mkString("\nUNION ALL\n")
  }

  /** q130's oracle: the learned merge chain as nested replaces (re-learned
    * deterministically), final token counts from the split — the transform
    * half of [[bpeOracleSql]].
    */
  private def bpeApplyOracleSql(s: SparkSession, dir: String): String = {
    import graft.operators.Vocabulary
    val merges = Vocabulary.learnBpeMerges(t(s, dir, "documents"), rounds = 4)
      .collect().map(r => (r.getString(1), r.getString(2)))
    def sqlTok(tok: String): String =
      tok.split("\u0002", -1)
        .map(p => "'" + p.replace("'", "''") + "'")
        .mkString(" || chr(2) || ")
    var streamExpr =
      "chr(1) || chr(1) || replace(text, ' ', chr(1) || chr(1)) " +
        "|| chr(1) || chr(1)"
    merges.foreach { case (l, rr) =>
      val pat = s"chr(1) || ${sqlTok(l)} || chr(1) || chr(1) || " +
        s"${sqlTok(rr)} || chr(1)"
      val rep = s"chr(1) || ${sqlTok(l)} || chr(2) || ${sqlTok(rr)} || chr(1)"
      streamExpr = s"replace($streamExpr, $pat, $rep)"
    }
    s"""SELECT doc_id,
       |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       |       CAST(len(list_filter(string_split($streamExpr,
       |              chr(1) || chr(1)), x -> len(x) > 0)) AS BIGINT)
       |         AS n_bpe
       |FROM documents""".stripMargin
  }

  /** q131's oracle: per-doc flesch (q115's algebra) and entropy
    * ([[charEntropyOracleSql]] as a subquery) joined back to the corpus,
    * then the same scaled-long mean discipline per source.
    */
  private lazy val datasetCardOracleSql: String =
    s"""WITH fle AS (
       |  SELECT doc_id,
       |         round((206.835
       |                - 1.015 * CAST(len(string_split(text, ' ')) AS BIGINT)
       |                  / CAST(GREATEST(len(regexp_extract_all(text,
       |                      '[.!?]+')), 1) AS BIGINT)
       |                - 84.6 * CAST(length(regexp_replace(lower(text),
       |                      '[aeiouy]+', 'V', 'g'))
       |                    - length(regexp_replace(lower(text),
       |                      '[aeiouy]+', '', 'g')) AS BIGINT)
       |                  / CAST(len(string_split(text, ' ')) AS BIGINT))
       |               * 1e4) / 1e4 AS flesch
       |  FROM documents
       |), ent AS ($charEntropyOracleSql
       |), per AS (
       |  SELECT d.source, d.n_chars, d.lang, d.text, ent.entropy, fle.flesch
       |  FROM documents d
       |  JOIN ent ON ent.doc_id = d.doc_id
       |  JOIN fle ON fle.doc_id = d.doc_id
       |)
       |SELECT source, COUNT(*) AS n_docs,
       |       CAST(SUM(n_chars) AS BIGINT) AS chars,
       |       CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
       |            AS BIGINT) AS tokens,
       |       COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dup_docs,
       |       CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_en,
       |       round(CAST(SUM(CAST(round(flesch * 1e4) AS BIGINT)) AS DOUBLE)
       |             / COUNT(*)) / 1e4 AS mean_flesch,
       |       round(CAST(SUM(CAST(round(entropy * 1e6) AS BIGINT)) AS DOUBLE)
       |             / COUNT(*)) / 1e6 AS mean_entropy
       |FROM per
       |GROUP BY 1""".stripMargin

  /** q133's oracle: re-run the deterministic Mondrian driver loop to get
    * the split log, replay the pid chain as chained CTEs (one per round —
    * linear SQL, no expression nesting), and let DuckDB recompute every
    * class's ranges and size itself. Only the split tree is embedded; a
    * divergent Spark partition would group rows differently and hash-fail.
    */
  private def mondrianOracleSql(s: SparkSession, dir: String): String = {
    import graft.operators.Anonymize
    val docs = t(s, dir, "documents").select(col("n_chars"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val res = Anonymize.mondrian(docs, Seq("n_chars", "n_tokens"), k = 25)
    val rounds = res.log.zipWithIndex.map { case (decisions, i) =>
      val arms = decisions.map { case (pid, a, md) =>
        s"WHEN $pid THEN (CASE WHEN v$a > $md THEN 1 ELSE 0 END)"
      }.mkString("\n           ")
      s"""p${i + 1} AS (
         |  SELECT v0, v1,
         |         pid * 2 + CASE pid
         |           $arms
         |           ELSE 0 END AS pid
         |  FROM p$i
         |)""".stripMargin
    }
    val last = res.log.size
    s"""WITH p0 AS (
       |  SELECT CAST(n_chars AS BIGINT) AS v0,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS v1,
       |         CAST(0 AS BIGINT) AS pid
       |  FROM documents
       |)${if (rounds.nonEmpty) ",\n" + rounds.mkString(",\n") else ""}
       |SELECT pid, MIN(v0) AS n_chars_lo, MAX(v0) AS n_chars_hi,
       |       MIN(v1) AS n_tokens_lo, MAX(v1) AS n_tokens_hi,
       |       COUNT(*) AS n
       |FROM p$last GROUP BY 1""".stripMargin
  }

  /** q38's oracle, generated at Verify time: train the same deterministic
    * index the query trains (identical centroids bit-for-bit — seeded init,
    * fixed iterations, 9-decimal quantization), then emit SQL that replays
    * assignment over the centroids as literals. `‖c‖²` is computed HERE and
    * embedded, exactly as the Spark expression embeds it ([[IVF]]
    * `scoreToCentroid`), so both engines evaluate `c2 − 2·v·c` over
    * identical doubles in identical operand order — the argmin (struct-min
    * with the cid tie-break, DuckDB list_min over the same struct shape)
    * matches bitwise. Probe ids are replayed driver-side via
    * [[IVF.probeIds]] and embedded as an IN-list.
    */
  private def ivfOracleSql(s: SparkSession, dir: String): String = {
    import graft.operators.IVF
    val idx = IVF.train(t(s, dir, "embeddings"), k = 16)
    val probes = IVF.probeIds(idx, queryVector(s, dir), 8)
    val arms = idx.centroids.zipWithIndex.map { case (c, i) =>
      val c2 = c.map(x => x * x).sum
      s"{'d': $c2 - 2.0 * list_inner_product(v, CAST([${c.mkString(", ")}] AS DOUBLE[])), 'cid': $i}"
    }.mkString(",\n      ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |a AS (
       |  SELECT vec_id, v,
       |         list_min([
       |      $arms
       |    ]).cid AS cid
       |  FROM e WHERE vec_id <> 0
       |)
       |SELECT a.vec_id, ROUND(list_cosine_similarity(a.v, q.qv), 6) AS cos
       |FROM a, q
       |WHERE cid IN (${probes.mkString(", ")})
       |ORDER BY cos DESC, a.vec_id LIMIT 20""".stripMargin
  }

  /** q164's oracle: replay BOTH searches — the exact cosine top-20 (q19's
    * SQL) and the IVF probe at nProbe=4 with the retrained deterministic
    * index's centroid arms ([[ivfOracleSql]]'s construction) — then the
    * same rank windows, left join, and quantized recall/RR algebra.
    */
  private def annRecallOracleSql(s: SparkSession, dir: String): String = {
    import graft.operators.IVF
    val idx = IVF.train(t(s, dir, "embeddings"), k = 16)
    val probes = IVF.probeIds(idx, queryVector(s, dir), IVF.defaultNProbe(16))
    val arms = idx.centroids.zipWithIndex.map { case (c, i) =>
      val c2 = c.map(x => x * x).sum
      s"{'d': $c2 - 2.0 * list_inner_product(v, CAST([${c.mkString(", ")}] AS DOUBLE[])), 'cid': $i}"
    }.mkString(",\n      ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |exact AS (
       |  SELECT vec_id, ROUND(list_cosine_similarity(v, q.qv), 6) AS cos
       |  FROM e, q WHERE vec_id <> 0
       |  ORDER BY cos DESC, vec_id LIMIT 20
       |), assigned AS (
       |  SELECT vec_id, v,
       |         list_min([
       |      $arms
       |    ]).cid AS cid
       |  FROM e WHERE vec_id <> 0
       |), approx AS (
       |  SELECT a.vec_id, ROUND(list_cosine_similarity(a.v, q.qv), 6) AS cos
       |  FROM assigned a, q
       |  WHERE cid IN (${probes.mkString(", ")})
       |  ORDER BY cos DESC, a.vec_id LIMIT 20
       |), er AS (
       |  SELECT vec_id,
       |         ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS er
       |  FROM exact
       |), ar AS (
       |  SELECT vec_id,
       |         ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS ar
       |  FROM approx
       |), j AS (
       |  SELECT er.vec_id, er.er, ar.ar FROM er LEFT JOIN ar USING (vec_id)
       |)
       |SELECT CAST(20 AS INT) AS k,
       |       COUNT(ar) AS n_overlap,
       |       ROUND(COUNT(ar) * 1e6 / 20) / 1e6 AS recall,
       |       COALESCE(ROUND(1e6 /
       |           MIN(CASE WHEN er = 1 THEN ar END)) / 1e6, 0.0) AS top1_rr
       |FROM j""".stripMargin
  }

  /** q188's oracle: the exact side is fully SQL-replayed (q19's top-20);
    * the HNSW side's returned ids are data-derived literals from a
    * dump-time re-run of the SAME deterministic build+search, but their
    * SCORES are NOT trusted — DuckDB recomputes every returned id's
    * cosine and re-ranks before the overlap/recall/RR algebra, so a
    * wrong id, wrong score, or wrong ordering all break the hash. The
    * traversal itself (that the ids come from graph search, not an
    * exact scan) is pinned by HnswSpec's visited-fraction bound and
    * brute-force recall checks.
    */
  private def hnswRecallOracleSql(s: SparkSession, dir: String): String =
    hnswAuditSqlFor(graft.operators.Hnsw.build(
      t(s, dir, "embeddings").filter(col("vec_id") =!= 0), shards = 4),
      s, dir)

  /** q190's oracle: same contract as q188's, over the ADMISSION-built
    * store (build below the cut, [[graft.operators.Hnsw.add]] the rest).
    */
  private def hnswAdmissionRecallOracleSql(s: SparkSession,
                                           dir: String): String = {
    val emb = t(s, dir, "embeddings")
    hnswAuditSqlFor(graft.operators.Hnsw.add(
      graft.operators.Hnsw.build(
        emb.filter(col("vec_id") =!= 0 && col("vec_id") < 400), shards = 4),
      emb.filter(col("vec_id") >= 400), shards = 4), s, dir)
  }

  private def hnswAuditSqlFor(store: org.apache.spark.sql.DataFrame,
                              s: SparkSession, dir: String): String = {
    val ids = graft.operators.Hnsw
      .neighbors(store, queryVector(s, dir), 20, efSearch = 48)
      .select("vec_id").collect().map(_.getLong(0))
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |exact AS (
       |  SELECT vec_id, ROUND(list_cosine_similarity(v, q.qv), 6) AS cos
       |  FROM e, q WHERE vec_id <> 0
       |  ORDER BY cos DESC, vec_id LIMIT 20
       |), approx AS (
       |  SELECT vec_id, ROUND(list_cosine_similarity(v, q.qv), 6) AS cos
       |  FROM e, q WHERE vec_id IN (${ids.mkString(", ")})
       |), er AS (
       |  SELECT vec_id,
       |         ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS er
       |  FROM exact
       |), ar AS (
       |  SELECT vec_id,
       |         ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS ar
       |  FROM approx
       |), j AS (
       |  SELECT er.vec_id, er.er, ar.ar FROM er LEFT JOIN ar USING (vec_id)
       |)
       |SELECT CAST(20 AS INT) AS k,
       |       COUNT(ar) AS n_overlap,
       |       ROUND(COUNT(ar) * 1e6 / 20) / 1e6 AS recall,
       |       COALESCE(ROUND(1e6 /
       |           MIN(CASE WHEN er = 1 THEN ar END)) / 1e6, 0.0) AS top1_rr
       |FROM j""".stripMargin
  }

  /** q193's oracle: the q188 contract extended to a probe BATCH — the
    * (probe_id, vec_id) pairs are data-derived literals from a dump-time
    * re-run of the same deterministic batch search, but DuckDB
    * recomputes every pair's cosine and re-derives every per-probe rank
    * from those recomputed scores (same (cos desc, vec_id) total order),
    * so a wrong id, a wrong score, or a wrong ordering all break the
    * hash. k-completeness (exactly 10 rows per probe) is implied by the
    * literal list's own size — a short row group would hash-mismatch.
    */
  private def hnswBatchServeOracleSql(s: SparkSession, dir: String): String = {
    val emb = t(s, dir, "embeddings")
    val pairs = graft.operators.Hnsw.batchNeighbors(
        graft.operators.Hnsw.build(
          emb.filter(col("vec_id") >= 5), shards = 4),
        emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("probe_id"), col("embedding")),
        k = 10, efSearch = 48)
      .select(col("probe_id"), col("vec_id"))
      .collect().map(r => s"(${r.getLong(0)}, ${r.getLong(1)})")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |ids AS (SELECT * FROM (VALUES ${pairs.mkString(", ")})
       |        AS t(probe_id, vec_id)),
       |scored AS (
       |  SELECT i.probe_id, i.vec_id,
       |         ROUND(list_cosine_similarity(p.v, c.v), 6) AS cos
       |  FROM ids i
       |  JOIN e p ON p.vec_id = i.probe_id
       |  JOIN e c ON c.vec_id = i.vec_id
       |)
       |SELECT CAST(probe_id AS BIGINT) AS probe_id,
       |       CAST(vec_id AS BIGINT) AS vec_id, cos,
       |       CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
       |                               ORDER BY cos DESC, vec_id) AS INT)
       |         AS rank
       |FROM scored""".stripMargin
  }

  /** q199's oracle: q193's contract plus the PREDICATE re-applied by
    * DuckDB — the (probe_id, vec_id) pairs are dump-time re-run literals
    * of the same deterministic filtered search; the scored CTE joins the
    * candidate side WITH the filter (vec_id % 3 = 0), so a single
    * returned row violating the predicate vanishes from the oracle
    * result and hash-fails, and every score and per-probe rank is
    * recomputed from raw embeddings as usual.
    */
  private def hnswFilteredServeOracleSql(s: SparkSession,
                                         dir: String): String = {
    val emb = t(s, dir, "embeddings")
    val pairs = graft.operators.Hnsw.batchNeighborsFiltered(
        graft.operators.Hnsw.build(
          emb.filter(col("vec_id") >= 5), shards = 4),
        emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("probe_id"), col("embedding")),
        emb.filter(col("vec_id") % 3 === 0).select(col("vec_id")),
        k = 10, efSearch = 64)
      .select(col("probe_id"), col("vec_id"))
      .collect().map(r => s"(${r.getLong(0)}, ${r.getLong(1)})")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |ids AS (SELECT * FROM (VALUES ${pairs.mkString(", ")})
       |        AS t(probe_id, vec_id)),
       |scored AS (
       |  SELECT i.probe_id, i.vec_id,
       |         ROUND(list_cosine_similarity(p.v, c.v), 6) AS cos
       |  FROM ids i
       |  JOIN e p ON p.vec_id = i.probe_id
       |  JOIN e c ON c.vec_id = i.vec_id AND c.vec_id % 3 = 0
       |)
       |SELECT CAST(probe_id AS BIGINT) AS probe_id,
       |       CAST(vec_id AS BIGINT) AS vec_id, cos,
       |       CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
       |                               ORDER BY cos DESC, vec_id) AS INT)
       |         AS rank
       |FROM scored""".stripMargin
  }

  /** q202's oracle: the q199 contract over the ATTR-payload store — the
    * query re-runs at dump time (deterministic: same index train, same
    * store build at the same path), its (probe, id) pairs embed as
    * literals, and DuckDB re-scores + re-ranks them while re-deriving
    * the predicate from vec_id (the stored `bucket` IS vec_id % 7 by
    * construction, so a payload slip anywhere in build/append/attrs
    * surfaces as a filter-violating literal and breaks the hash).
    */
  private def geoAttrServeOracleSql(s: SparkSession,
                                    dir: String): String = {
    val pairs = byName("q202_geostore_attr_serve")(s, dir)
      .select(col("probe_id"), col("vec_id"))
      .collect().map(r => s"(${r.getLong(0)}, ${r.getLong(1)})")
    graft.CacheRegistry.releaseAll()
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |ids AS (SELECT * FROM (VALUES ${pairs.mkString(", ")})
       |        AS t(probe_id, vec_id)),
       |scored AS (
       |  SELECT i.probe_id, i.vec_id,
       |         ROUND(list_cosine_similarity(p.v, c.v), 6) AS cos
       |  FROM ids i
       |  JOIN e p ON p.vec_id = i.probe_id
       |  JOIN e c ON c.vec_id = i.vec_id AND c.vec_id % 7 = 2
       |             AND c.vec_id >= 5
       |)
       |SELECT CAST(probe_id AS BIGINT) AS probe_id,
       |       CAST(vec_id AS BIGINT) AS vec_id, cos,
       |       CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
       |                               ORDER BY cos DESC, vec_id) AS INT)
       |         AS rank
       |FROM scored""".stripMargin
  }

  /** q203's oracle: [[geoAttrServeOracleSql]]'s contract over the
    * ADMITTED standing state — the query re-runs at dump time
    * (deterministic: same seeds, same ladder, same store paths), its
    * (probe, id) pairs embed as literals, and DuckDB re-scores +
    * re-ranks them while re-deriving the predicate from vec_id (the
    * stored `bucket` IS vec_id % 7 by construction). The membership
    * floor (vec_id >= 5) pins that no probe row leaked into the store.
    */
  private def admitAttrServeOracleSql(s: SparkSession,
                                      dir: String): String = {
    val pairs = byName("q203_admit_attr_serve")(s, dir)
      .select(col("probe_id"), col("vec_id"))
      .collect().map(r => s"(${r.getLong(0)}, ${r.getLong(1)})")
    graft.CacheRegistry.releaseAll()
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |ids AS (SELECT * FROM (VALUES ${pairs.mkString(", ")})
       |        AS t(probe_id, vec_id)),
       |scored AS (
       |  SELECT i.probe_id, i.vec_id,
       |         ROUND(list_cosine_similarity(p.v, c.v), 6) AS cos
       |  FROM ids i
       |  JOIN e p ON p.vec_id = i.probe_id
       |  JOIN e c ON c.vec_id = i.vec_id AND c.vec_id % 7 = 2
       |             AND c.vec_id >= 5
       |)
       |SELECT CAST(probe_id AS BIGINT) AS probe_id,
       |       CAST(vec_id AS BIGINT) AS vec_id, cos,
       |       CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
       |                               ORDER BY cos DESC, vec_id) AS INT)
       |         AS rank
       |FROM scored""".stripMargin
  }

  /** q208's oracle: [[geoAttrServeOracleSql]]'s contract over the
    * UPDATED store — the query re-runs at dump time (deterministic:
    * same index train, same lifecycle at the same path), its
    * (probe, id) pairs embed as literals, and DuckDB re-scores +
    * re-ranks them while re-deriving the predicate from vec_id under
    * the UPDATE rule: un-updated ids (vec_id % 3 ≠ 0) must carry
    * bucket = vec_id % 7, updated ids (vec_id % 3 = 0) must carry
    * bucket = (vec_id % 7 + 3) % 7 — so a stale payload served
    * anywhere along update → latest-wins read → filtered heap is a
    * filter-violating literal and breaks the hash.
    */
  private def geoAttrUpdateOracleSql(s: SparkSession,
                                     dir: String): String = {
    val pairs = byName("q208_geostore_attr_update")(s, dir)
      .select(col("probe_id"), col("vec_id"))
      .collect().map(r => s"(${r.getLong(0)}, ${r.getLong(1)})")
    graft.CacheRegistry.releaseAll()
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |ids AS (SELECT * FROM (VALUES ${pairs.mkString(", ")})
       |        AS t(probe_id, vec_id)),
       |scored AS (
       |  SELECT i.probe_id, i.vec_id,
       |         ROUND(list_cosine_similarity(p.v, c.v), 6) AS cos
       |  FROM ids i
       |  JOIN e p ON p.vec_id = i.probe_id
       |  JOIN e c ON c.vec_id = i.vec_id AND c.vec_id >= 5
       |             AND ((c.vec_id % 3 <> 0 AND c.vec_id % 7 = 2)
       |               OR (c.vec_id % 3 = 0
       |                   AND (c.vec_id % 7 + 3) % 7 = 2))
       |)
       |SELECT CAST(probe_id AS BIGINT) AS probe_id,
       |       CAST(vec_id AS BIGINT) AS vec_id, cos,
       |       CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
       |                               ORDER BY cos DESC, vec_id) AS INT)
       |         AS rank
       |FROM scored""".stripMargin
  }

  /** q204's oracle: the q202 dump-time-literal contract over the
    * DELETED-then-compacted store — the query re-runs at dump time
    * (deterministic: same index train, same store lifecycle at the same
    * path), its (probe, id) pairs embed as literals, and DuckDB
    * re-scores + re-ranks them under the membership predicate
    * `vec_id >= 5 AND vec_id % 5 <> 1` re-derived from vec_id — one
    * erased id surviving delete → compact → routed scan, or one wrong
    * score/rank, breaks the hash.
    */
  private def geoDeleteServeOracleSql(s: SparkSession,
                                      dir: String): String = {
    val pairs = byName("q204_geostore_delete")(s, dir)
      .select(col("probe_id"), col("vec_id"))
      .collect().map(r => s"(${r.getLong(0)}, ${r.getLong(1)})")
    graft.CacheRegistry.releaseAll()
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |ids AS (SELECT * FROM (VALUES ${pairs.mkString(", ")})
       |        AS t(probe_id, vec_id)),
       |scored AS (
       |  SELECT i.probe_id, i.vec_id,
       |         ROUND(list_cosine_similarity(p.v, c.v), 6) AS cos
       |  FROM ids i
       |  JOIN e p ON p.vec_id = i.probe_id
       |  JOIN e c ON c.vec_id = i.vec_id AND c.vec_id >= 5
       |             AND c.vec_id % 5 <> 1
       |)
       |SELECT CAST(probe_id AS BIGINT) AS probe_id,
       |       CAST(vec_id AS BIGINT) AS vec_id, cos,
       |       CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
       |                               ORDER BY cos DESC, vec_id) AS INT)
       |         AS rank
       |FROM scored""".stripMargin
  }

  /** q205's oracle: [[admissionOracleSql]] (q84's full arm-by-arm
    * admission replay) with the corpus REDUCED to the un-erased docs —
    * exactly the answer a store that never saw the erased docs computes,
    * which is [[graft.operators.DedupState.forget]]'s contract.
    */
  private lazy val forgetAdmissionOracleSql: String =
    s"""WITH reps AS (
       |  SELECT MIN(doc_id) AS doc_id, text, COUNT(*) AS dup_count
       |  FROM documents WHERE doc_id >= 300 GROUP BY text
       |), corpus_h AS (
       |  SELECT DISTINCT md5(text) AS h FROM documents
       |  WHERE doc_id < 300 AND doc_id % 7 <> 3
       |), unseen AS (
       |  SELECT r.doc_id, r.text, r.dup_count FROM reps r
       |  WHERE md5(r.text) NOT IN (SELECT h FROM corpus_h)
       |), adm_src AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE doc_id < 300 AND doc_id % 7 <> 3
       |  UNION ALL
       |  SELECT doc_id, text FROM unseen
       |), ${minhashPairCtes("adm_src", 0.8)}
       |SELECT doc_id, text, dup_count FROM unseen
       |WHERE doc_id NOT IN (SELECT j FROM verified WHERE j >= 300)""".stripMargin

  /** q82's oracle: retrain the deterministic index (≡ the one the query
    * saved and reloaded) and replay cell assignment with the same argmin
    * arms as [[ivfOracleSql]], aggregated per cell.
    */
  private def ivfAssignOracleSql(s: SparkSession, dir: String): String = {
    import graft.operators.IVF
    val idx = IVF.train(t(s, dir, "embeddings"), k = 8, iters = 3)
    val arms = idx.centroids.zipWithIndex.map { case (c, i) =>
      val c2 = c.map(x => x * x).sum
      s"{'d': $c2 - 2.0 * list_inner_product(v, CAST([${c.mkString(", ")}] AS DOUBLE[])), 'cid': $i}"
    }.mkString(",\n      ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |a AS (
       |  SELECT vec_id,
       |         list_min([
       |      $arms
       |    ]).cid AS cid
       |  FROM e
       |)
       |SELECT CAST(cid AS INTEGER) AS cid, COUNT(*) AS n_vectors,
       |       MIN(vec_id) AS min_vec_id
       |FROM a GROUP BY 1""".stripMargin
  }

  /** q83's oracle: retrain the store's index (deterministic, corpus side
    * only — vec_id ≥ 100, exactly what the query's build sees), assign
    * BOTH sides with the centroid-literal argmin arms, and keep same-cell
    * cross pairs at the threshold.
    */
  private def embeddingStoreOracleSql(s: SparkSession, dir: String): String = {
    import graft.operators.IVF
    val idx = IVF.train(
      t(s, dir, "embeddings").filter(col("vec_id") >= 100), k = 8, iters = 3)
    val arms = idx.centroids.zipWithIndex.map { case (c, i) =>
      val c2 = c.map(x => x * x).sum
      s"{'d': $c2 - 2.0 * list_inner_product(v, CAST([${c.mkString(", ")}] AS DOUBLE[])), 'cid': $i}"
    }.mkString(",\n      ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |a AS (
       |  SELECT vec_id, v,
       |         list_min([
       |      $arms
       |    ]).cid AS cid
       |  FROM e
       |),
       |c AS (SELECT * FROM a WHERE vec_id >= 100),
       |f AS (SELECT * FROM a WHERE vec_id < 100)
       |SELECT c.vec_id AS i, f.vec_id AS j,
       |       ROUND(list_cosine_similarity(c.v, f.v), 6) AS cos
       |FROM c JOIN f USING (cid)
       |WHERE ROUND(list_cosine_similarity(c.v, f.v), 6) >= 0.2""".stripMargin
  }

  /** q109's oracle: the identical scaled-integer PageRank recurrence,
    * unrolled one CTE pair per iteration (DuckDB's recursive CTEs forbid
    * the aggregation each round needs). `//` is DuckDB's floor division =
    * Spark's `div` on the non-negative operands used here; every windowless
    * SUM is cast back to BIGINT (HUGEINT lint discipline).
    */
  private def pageRankOracleSql(iterations: Int): String = {
    val iters = (1 to iterations).map { k =>
      val p = s"r${k - 1}"
      s"""sh$k AS (
         |  SELECT o.node, r // outdeg AS share
         |  FROM $p JOIN outdeg o USING (node)),
         |in$k AS (
         |  SELECT e.dst AS node, CAST(SUM(s.share) AS BIGINT) AS inflow
         |  FROM e JOIN sh$k s ON e.src = s.node GROUP BY 1),
         |dg$k AS (
         |  SELECT COALESCE(CAST(SUM($p.r) AS BIGINT), 0) AS dmass
         |  FROM $p LEFT JOIN outdeg o USING (node) WHERE o.node IS NULL),
         |r$k AS (
         |  SELECT nd.node,
         |         CAST(150000000 + (85 * (COALESCE(i.inflow, 0) +
         |           (SELECT dmass FROM dg$k) // (SELECT n FROM nc))) // 100
         |           AS BIGINT) AS r
         |  FROM nodes nd LEFT JOIN in$k i USING (node))""".stripMargin
    }.mkString(",\n")
    s"""WITH sc AS (
       |  SELECT DISTINCT l_suppkey * 2 AS src, o_custkey * 2 + 1 AS dst
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |e AS (SELECT src, dst FROM sc UNION SELECT dst, src FROM sc),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |nc AS (SELECT COUNT(*) AS n FROM nodes),
       |outdeg AS (SELECT src AS node, COUNT(*) AS outdeg FROM e GROUP BY 1),
       |r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM nodes),
       |$iters
       |SELECT node, r FROM r$iterations""".stripMargin
  }

  val byName: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  val oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Data-dependent oracle builders, evaluated by Verify with its
    * (session, sfDir) and merged into the oracle_sql.json dump.
    */
  val dynamicOracles: Map[String, (SparkSession, String) => String] =
    all.flatMap(q => q.dynamicOracle.map(q.name -> _)).toMap
}
