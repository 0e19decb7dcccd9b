package graft

import org.apache.spark.sql.functions._
import graft.operators.{Embeddings, TimeSeries}

/** Unit semantics for the time-series regularization and embedding
  * utility operators (q63–q66); cross-engine correctness is pinned by
  * their DuckDB oracle rows at sf0.01.
  */
class TimeSeriesEmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  test("gapFillHourly: dense spine, nulls on gaps, forward fill per series") {
    val df = Seq(
      ("a", "2024-01-01 00:15:00", 1.0),
      ("a", "2024-01-01 00:45:00", 2.0), // same hour → sums
      ("a", "2024-01-01 03:10:00", 5.0), // two-hour gap before
      ("b", "2024-01-01 01:30:00", 7.0))
      .toDF("series", "ts", "value")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = TimeSeries.gapFillHourly(df, col("series"), col("ts"), col("value"))
      .withColumn("h", date_format(col("h"), "yyyy-MM-dd HH:mm:ss"))
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.get(2)), Option(r.get(3)))).toSet
    assert(out === Set(
      ("a", "2024-01-01 00:00:00", Some(3.0), Some(3.0)),
      ("a", "2024-01-01 01:00:00", None, Some(3.0)),
      ("a", "2024-01-01 02:00:00", None, Some(3.0)),
      ("a", "2024-01-01 03:00:00", Some(5.0), Some(5.0)),
      ("b", "2024-01-01 00:00:00", None, None), // before b's first observation
      ("b", "2024-01-01 01:00:00", Some(7.0), Some(7.0)),
      ("b", "2024-01-01 02:00:00", None, Some(7.0)),
      ("b", "2024-01-01 03:00:00", None, Some(7.0))))
  }

  test("dayOverDay: per-series deltas; first day and zero-previous give null pct") {
    val df = Seq(
      ("a", "2024-01-01 05:00:00", 10.0),
      ("a", "2024-01-02 06:00:00", 15.0),
      ("a", "2024-01-03 07:00:00", 12.0),
      ("b", "2024-01-01 08:00:00", 0.0),
      ("b", "2024-01-02 09:00:00", 4.0))
      .toDF("series", "ts", "value")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = TimeSeries.dayOverDay(df, col("series"), col("ts"), col("value"))
      .withColumn("d", date_format(col("d"), "yyyy-MM-dd"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        Option(r.get(3)), Option(r.get(4)))).toSet
    assert(out === Set(
      ("a", "2024-01-01", 10.0, None, None),
      ("a", "2024-01-02", 15.0, Some(5.0), Some(50.0)),
      ("a", "2024-01-03", 12.0, Some(-3.0), Some(-20.0)),
      ("b", "2024-01-01", 0.0, None, None),
      ("b", "2024-01-02", 4.0, Some(4.0), None))) // previous day 0 → pct null
  }

  test("quantizeInt8: max hits ±127, dequant error ≤ scale/2, zero vector safe") {
    val emb = Seq(
      (1L, Array(0.6f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val rows = Embeddings.quantizeInt8(emb).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getSeq[Int](2)))).toMap
    val (s1, q1) = rows(1L)
    assert(s1 === 1.0 / 127.0)
    assert(q1 === Seq(76, -127, 32))
    val (s2, q2) = rows(2L)
    assert(s2 === 0.0)
    assert(q2 === Seq(0, 0, 0)) // guarded: never a 0/0
    // symmetric-quantization contract: |q·scale − x| ≤ scale/2
    q1.zip(Seq(0.6f, -1.0f, 0.25f)).foreach { case (q, x) =>
      assert(math.abs(q * s1 - x.toDouble) <= s1 / 2 + 1e-12)
    }
  }

  test("groupCentroids: hand-computed element-wise means per group") {
    val emb = Seq(
      (0L, Array(1.0f, 2.0f)),
      (2L, Array(3.0f, 4.0f)), // grp 0 together with vec 0
      (1L, Array(10.0f, 20.0f)))
      .toDF("vec_id", "embedding")
    val out = Embeddings.groupCentroids(emb, col("vec_id") % 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(out === Map(
      (0L, 0L) -> ((2L, 2.0)), (0L, 1L) -> ((2L, 3.0)),
      (1L, 0L) -> ((1L, 10.0)), (1L, 1L) -> ((1L, 20.0))))
  }

  test("unpivot keeps null cells (melt semantics) — pins the q68 oracle shape") {
    val wide = Seq(("d1", Some(1.0), Option.empty[Double]), ("d2", Some(2.0), Some(3.0)))
      .toDF("d", "a", "b")
    val long = wide.unpivot(Array(col("d")), Array(col("a"), col("b")), "k", "v")
      .collect().map(r => (r.getString(0), r.getString(1), Option(r.get(2)))).toSet
    assert(long === Set(
      ("d1", "a", Some(1.0)), ("d1", "b", None),
      ("d2", "a", Some(2.0)), ("d2", "b", Some(3.0))))
  }

  test("crossNearDups: only left×right pairs, threshold respected, i=left j=right") {
    val left = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val right = Seq((10L, Array(1.0f, 0.01f)), (11L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val pairs = graft.operators.Similarity.crossNearDups(left, right, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 10L))) // cos(e1, (1,0.01)) ≈ 0.99995; all others below
  }

  test("round-6 operators tolerate empty inputs (no crash, empty output)") {
    import org.apache.spark.sql.types._
    val emptyEvents = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("series", StringType), StructField("ts", TimestampType),
        StructField("value", DoubleType), StructField("id", LongType))))
    assert(TimeSeries.gapFillHourly(emptyEvents, col("series"), col("ts"),
      col("value")).count() === 0)
    assert(TimeSeries.dayOverDay(emptyEvents, col("series"), col("ts"),
      col("value")).count() === 0)
    assert(graft.operators.Scoring.standardizeByGroup(emptyEvents,
      col("series"), col("value"), Seq("id")).count() === 0)
    val emptyEmb = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    assert(Embeddings.quantizeInt8(emptyEmb).count() === 0)
    assert(Embeddings.groupCentroids(emptyEmb, col("vec_id") % 2).count() === 0)
    val emptyDocs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    assert(graft.operators.Chunking.cdcChunks(emptyDocs).count() === 0)
    assert(graft.operators.Anonymize.kAnonymityAudit(emptyDocs,
      Seq("text"), 3).count() === 0)
    graft.CacheRegistry.releaseAll()
  }

  test("nfc_normalize and cleanText: composition, control strip, idempotence") {
    import graft.functions.TextFunctions
    val messy = Seq("  ab   café\tx ").toDF("c")
    val cleaned = messy.select(TextFunctions.cleanText(col("c")))
      .as[String].head()
    assert(cleaned === "ab café x")
    // idempotent: cleaning clean text changes nothing
    val again = Seq(cleaned).toDF("c")
      .select(TextFunctions.cleanText(col("c"))).as[String].head()
    assert(again === cleaned)
    // SQL registration
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT nfc_normalize('café') AS c")
      .as[String].head()
    assert(viaSql === "café")
  }

  test("mergeIntervals: overlap and touch merge, gaps split, " +
    "partitioning-invariant") {
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 12L),   // overlap -> [0,12)
      (1L, 12L, 20L),                 // touches -> extends to [0,20)
      (1L, 25L, 30L),                 // gap -> new island
      (2L, 0L, 5L), (2L, 0L, 5L),    // exact duplicates -> one island
      (2L, 100L, 101L))
      .toDF("k", "s0", "e0")
    def run(df: org.apache.spark.sql.DataFrame) =
      TimeSeries.mergeIntervals(df, Seq("k"), "s0", "e0")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Set((1L, 0L, 20L), (1L, 25L, 30L), (2L, 0L, 5L),
      (2L, 100L, 101L))
    assert(run(iv) === want)
    assert(run(iv.repartition(7)) === want,
      "island membership is a pure function of the interval values")
    intercept[IllegalArgumentException](
      TimeSeries.mergeIntervals(iv, Seq.empty, "s0", "e0"))
  }

  test("sessionize: hand-built sessions, boundary gap stays in-session, " +
    "ties are order-insensitive, repartition-invariant") {
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // u1: 0, 1000, 2800 (gap exactly 1800 -> SAME session), 4601 (1801 ->
    // new); u2 has a tied pair at the session boundary predecessor
    val ev = Seq(
      ("u1", t(0)), ("u1", t(1000)), ("u1", t(2800)), ("u1", t(4601)),
      ("u2", t(100)), ("u2", t(100)), ("u2", t(5000))).toDF("user_id", "ts")
    def run(df: org.apache.spark.sql.DataFrame) =
      TimeSeries.sessionize(df, Seq("user_id"), col("ts"), gapSec = 1800L)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    val want = Set(
      ("u1", 1L, 0L, 2800L, 3L),
      ("u1", 2L, 4601L, 4601L, 1L),
      ("u2", 1L, 100L, 100L, 2L),
      ("u2", 2L, 5000L, 5000L, 1L))
    assert(run(ev) === want)
    assert(run(ev.repartition(5)) === want,
      "session assignment is a pure function of the timestamp values")
    intercept[IllegalArgumentException](
      TimeSeries.sessionize(ev, Seq.empty, col("ts"), 1800L))
    intercept[IllegalArgumentException](
      TimeSeries.sessionize(ev, Seq("user_id"), col("ts"), 0L))
  }

  test("cusumShift: window identity equals the sequential recurrence, " +
    "alarms start after the level shift, repartition-invariant") {
    // series: 10 quiet days at ~$100, then 5 shifted days at ~$160 —
    // mean ≈ $120, so post-shift days accumulate ≈ +$30/day above
    // mean+slack($10) while quiet days drain the statistic
    val vals = Seq(100.0, 102.0, 98.0, 101.0, 99.0, 100.0, 103.0, 97.0,
      100.0, 100.0, 160.0, 158.0, 162.0, 161.0, 159.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ("m", java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"), v)
    }
    val df = rows.toDF("k", "ts", "value")
    val slack = 1000L   // $10/day
    val h = 5000L       // $50 cumulative
    def run(d: org.apache.spark.sql.DataFrame) =
      TimeSeries.cusumShift(d, Seq("k"), col("ts"), col("value"), slack, h)
        .collect().map(r => (r.getString(1), r.getDouble(2),
          r.getDouble(3), r.getBoolean(4))).sortBy(_._1)
    val got = run(df)
    // the sequential recurrence the window identity must equal, on the
    // same n-scaled integer deviations
    val vc = vals.map(v => math.round(v * 100))
    val n = vc.size.toLong
    val tot = vc.sum
    var s = 0L
    val want = vc.zipWithIndex.map { case (c, i) =>
      s = math.max(0L, s + (c * n - tot - slack * n))
      (f"2024-01-${i + 1}%02d", c / 100.0,
        BigDecimal(s / (n * 100.0)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble,
        s > h * n)
    }
    assert(got.map(t => (t._1, t._2, t._4)) ===
      want.map(t => (t._1, t._2, t._4)))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._3 - w._3) < 1e-6, s"cusum at ${g._1}") }
    // quiet days never alarm; the shift is flagged within two days and
    // stays flagged
    assert(got.take(10).forall(!_._4), "no alarm during the quiet regime")
    assert(got.drop(11).forall(_._4), "sustained shift stays flagged")
    assert(run(df.repartition(7)) === got,
      "the statistic is a pure function of the daily values")
    intercept[IllegalArgumentException](
      TimeSeries.cusumShift(df, Seq.empty, col("ts"), col("value"), 0L, 1L))
    intercept[IllegalArgumentException](
      TimeSeries.cusumShift(df, Seq("k"), col("ts"), col("value"), -1L, 1L))
    intercept[IllegalArgumentException](
      TimeSeries.cusumShift(df, Seq("k"), col("ts"), col("value"), 0L, 0L))
  }

  test("transitionMatrix: adjacent pairs per key in (ts, tie) order, " +
    "row-normalized probabilities, tie-break total order, invariance") {
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      ("u1", t(1), 1L, "view"), ("u1", t(2), 2L, "view"),
      ("u1", t(3), 3L, "click"), ("u1", t(4), 4L, "view"),
      // u2 has a TIED timestamp: order decided by the id tie-break
      ("u2", t(5), 6L, "click"), ("u2", t(5), 5L, "view"),
      ("u3", t(9), 7L, "buy")) // single event: no pair
      .toDF("user_id", "ts", "event_id", "event_type")
    def run(df: org.apache.spark.sql.DataFrame) =
      TimeSeries.transitionMatrix(df, Seq("user_id"), col("ts"),
        col("event_type"), col("event_id"))
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getDouble(3))).toSet
    val got = run(ev)
    // pairs: u1 view->view, view->click, click->view; u2 view->click
    // (id 5 before id 6 despite equal ts)
    assert(got === Set(
      ("view", "view", 1L, 1.0 / 3),
      ("view", "click", 2L, 2.0 / 3),
      ("click", "view", 1L, 1.0)).map { case (a, b, n, p) =>
      (a, b, n, math.round(p * 1e6) / 1e6.toDouble) })
    assert(run(ev.repartition(5)) === got,
      "the matrix is a pure function of the ordered event values")
    intercept[IllegalArgumentException](TimeSeries.transitionMatrix(
      ev, Seq.empty, col("ts"), col("event_type"), col("event_id")))
  }

  test("ewmaChart: lag-window form equals the sequential truncated EWMA, " +
    "alarms track the shift faster than they clear, repartition-invariant") {
    val vals = Seq(100.0, 102.0, 98.0, 101.0, 99.0, 100.0, 103.0, 97.0,
      100.0, 100.0, 160.0, 158.0, 162.0, 161.0, 159.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ("m", java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"), v)
    }
    val df = rows.toDF("k", "ts", "value")
    val span = 4
    // the chart is two-sided around the key's OWN mean (≈ $120 here,
    // pulled up by the shifted tail), so the quiet regime sits ~$20
    // below it — $25 is the threshold that separates regimes
    val h = 2500L
    def run(d: org.apache.spark.sql.DataFrame) =
      TimeSeries.ewmaChart(d, Seq("k"), col("ts"), col("value"), span, h)
        .collect().map(r => (r.getString(1), r.getDouble(2),
          r.getDouble(3), r.getBoolean(4))).sortBy(_._1)
    val got = run(df)
    // the sequential reference: integer-weighted mean over the trailing
    // `span` observed days, alarm by the same cross-multiplied compare
    val vc = vals.map(v => math.round(v * 100))
    val n = vc.size.toLong
    val tot = vc.sum
    val want = vc.indices.map { i =>
      val js = (0 until span).filter(_ <= i)
      val num = js.map(j => vc(i - j) * (1L << (span - 1 - j))).sum
      val den = js.map(j => 1L << (span - 1 - j)).sum
      (f"2024-01-${i + 1}%02d", vc(i) / 100.0,
        math.round(num / (den * 100.0) * 1e6) / 1e6,
        math.abs(num * n - tot * den) > h * n * den)
    }
    assert(got.map(t => (t._1, t._2, t._4)) ===
      want.map(t => (t._1, t._2, t._4)))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._3 - w._3) < 1e-9, s"ewma at ${g._1}") }
    // quiet regime stays inside the limits; the level shift is flagged by
    // the second shifted day at the latest (λ=1/2 halves the gap daily)
    assert(got.take(10).forall(!_._4), "no alarm during the quiet regime")
    assert(got.drop(11).forall(_._4), "shifted regime stays flagged")
    assert(run(df.repartition(7)) === got,
      "the chart is a pure function of the daily values")
    intercept[IllegalArgumentException](TimeSeries.ewmaChart(
      df, Seq.empty, col("ts"), col("value"), span, h))
    intercept[IllegalArgumentException](TimeSeries.ewmaChart(
      df, Seq("k"), col("ts"), col("value"), 1, h))
  }

  test("robustTrend: Theil-Sen resists the outlier OLS follows; MK sign " +
    "and tie/constant degeneracies; repartition-invariant") {
    // clean +2.0/day trend with ONE wild outlier day
    val vals = Seq(100.0, 102.0, 104.0, 106.0, 500.0, 110.0, 112.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ("m", java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"), v)
    } ++ (1 to 5).map(i => // constant series: full ties, S = 0, z = 0
      ("flat", java.sql.Timestamp.valueOf(f"2024-01-${i}%02d 12:00:00"), 7.0))
    val df = rows.toDF("k", "ts", "value")
    def run(d: org.apache.spark.sql.DataFrame) =
      TimeSeries.robustTrend(d, Seq("k"), col("ts"), col("value"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
        .toMap
    val got = run(df)
    val (n, slope, s, z) = got("m")
    assert(n == 7L)
    // the median pairwise slope stays on the clean 2.0/day trend even
    // though the outlier day corrupts 6 of the 21 pair slopes
    assert(math.abs(slope - 2.0) < 0.5, s"Theil-Sen slope $slope")
    // S: every clean pair ascends; outlier pairs split 4 up / 2 down
    assert(s > 10, s"MK S should be strongly positive, got $s")
    assert(z > 1.5, s"MK z should be significant, got $z")
    assert(got("flat") === ((5L, 0.0, 0L, 0.0)),
      "a constant series has zero slope, zero S, zero z (never divides)")
    assert(run(df.repartition(7)) === got)
    intercept[IllegalArgumentException](TimeSeries.robustTrend(
      df, Seq.empty, col("ts"), col("value")))
  }
}
