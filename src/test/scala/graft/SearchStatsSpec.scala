package graft

import org.apache.spark.sql.functions._
import graft.operators.{ColumnStats, TextSearch}

class SearchStatsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "a cat sat here"),
    (3L, "the dog"),
    (4L, "a a a"),        // overlapping self-phrase
    (5L, "cat sat cat sat")
  ).toDF("doc_id", "text")

  test("phraseMatches counts every aligned occurrence, overlaps included") {
    val got = TextSearch.phraseMatches(docs, "cat sat")
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 1L), (2L, 1L), (5L, 2L)))
    val overlap = TextSearch.phraseMatches(docs, "a a")
      .as[(Long, Long)].collect().toSet
    assert(overlap === Set((4L, 2L)), "positions, not disjoint spans")
  }

  test("3-term phrase and duplicate-term phrase align correctly") {
    assert(TextSearch.phraseMatches(docs, "sat on the")
      .as[(Long, Long)].collect().toSet === Set((1L, 1L)))
    assert(TextSearch.phraseMatches(docs, "cat sat cat sat")
      .as[(Long, Long)].collect().toSet === Set((5L, 1L)))
  }

  test("a phrase with an unseen term returns empty without running joins") {
    assert(TextSearch.phraseMatches(docs, "cat zebra").count() === 0L)
  }

  test("rarest-first join order is invisible in the answer (vs naive scan)") {
    // "the" (df 3) is more common than "dog" (df 1): the index joins seed
    // from "dog"; the answer must still equal the naive window scan
    val got = TextSearch.phraseMatches(docs, "the dog")
      .as[(Long, Long)].collect().toSet
    val naive = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), posexplode(col("t")).as(Seq("i", "w")),
        col("t"))
      .filter(col("w") === "the" &&
        element_at(col("t"), col("i") + 2) === "dog")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toSet
    assert(got === naive && got === Set((3L, 1L)))
  }

  test("stored phrase index equals the direct scan, partition-pruned to " +
       "the phrase terms' buckets") {
    val dir = tmpDir("phrase-index")
    TextSearch.writeIndex(docs, dir, buckets = 16)
    for (phrase <- Seq("cat sat", "a a", "the dog", "cat zebra")) {
      val direct = TextSearch.phraseMatches(docs, phrase)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val indexed = TextSearch.phraseMatchesIndexed(spark, dir, phrase, 16)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(indexed === direct, s"phrase '$phrase'")
    }
    // the index scan must carry a tb partition filter — without it every
    // term bucket of a corpus-scale index would be read
    val plan = TextSearch.phraseMatchesIndexed(spark, dir, "cat sat", 16)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*tb".r.findFirstIn(plan).isDefined,
      s"index scan lost its partition filter:\n${plan.take(800)}")
  }

  test("columnStats: one pass yields exact nulls/ndv/min/max per column") {
    val df = Seq(
      (Some(1L), Some("b"), Some(2.0)),
      (Some(2L), None, Some(4.0)),
      (Some(2L), Some("a"), None),
      (None, Some("a"), Some(8.0))
    ).toDF("k", "s", "v")
    val got = ColumnStats.collect(df, Seq("k", "s", "v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).toSet
    assert(got === Set(
      ("k", 4L, 1L, 2L, "1", "2"),
      ("s", 4L, 1L, 2L, "a", "b"),
      ("v", 4L, 1L, 3L, "2.0", "8.0")))
  }

  test("ndv sketches: per-batch sketches union to the whole-table answer") {
    val a = (1 to 1000).map(i => (i.toLong, (i % 100).toString))
      .toDF("id", "bucket")
    val b = (500 to 1500).map(i => (i.toLong, (i % 150).toString))
      .toDF("id", "bucket")
    val whole = ColumnStats.mergeNdvEstimates(
      Seq(ColumnStats.ndvSketches(a.unionAll(b), Seq("id", "bucket"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = ColumnStats.mergeNdvEstimates(
      Seq(ColumnStats.ndvSketches(a, Seq("id", "bucket")),
        ColumnStats.ndvSketches(b, Seq("id", "bucket"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the union of sketches carries the same register state modulo the
    // HIP estimator (order-dependent, dropped on union), so estimates
    // agree tightly but not bit-for-bit
    for (k <- whole.keys)
      assert(math.abs(merged(k) - whole(k)).toDouble /
        whole(k).max(1L) < 0.02, s"$k: merged=${merged(k)} whole=${whole(k)}")
    // and the estimate tracks the exact distinct count (1500 ids)
    assert(math.abs(merged("id") - 1500.0) / 1500.0 < 0.1)
    assert(math.abs(merged("bucket") - 150.0) / 150.0 < 0.1)
  }

  test("fuzzy joinWithin links two tables exactly like the cartesian filter") {
    val left = Seq((1L, "cat"), (2L, "spark"), (3L, "zzz")).toDF("id", "name")
    val right = Seq((10L, "cut"), (11L, "spork"), (12L, "cat")).toDF("id", "name")
    val got = graft.operators.FuzzyJoin.joinWithin(left, right, maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 10L, 1L), (1L, 12L, 0L), (2L, 11L, 1L)))
  }

  test("correlationMatrix equals the textbook formula; zero variance → null") {
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    val ys = Seq(2.0, 1.0, 4.0, 3.0, 6.0)
    val df = xs.zip(ys).map { case (x, y) => (x, y, 7.0) }
      .toDF("x", "y", "const")
    val got = ColumnStats.correlationMatrix(df,
      Seq(("x", 1.0), ("y", 1.0), ("const", 1.0)))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    def ref(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.size
      val (sx, sy) = (a.sum, b.sum)
      val (sxx, syy) = (a.map(v => v * v).sum, b.map(v => v * v).sum)
      val sxy = a.zip(b).map { case (u, v) => u * v }.sum
      (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    assert(math.abs(got(("x", "y")).get - ref(xs, ys)) < 1e-12)
    assert(got(("x", "const")).isEmpty, "zero-variance side must be null")
    assert(got(("y", "const")).isEmpty)
  }

  test("round-7 operators survive empty inputs with their declared schemas") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val bp = graft.operators.Boilerplate.stripCommonLines(emptyDocs, minDocs = 2)
    assert(bp.count() === 0L && bp.columns.toSeq ===
      Seq("doc_id", "n_lines", "n_removed", "clean_text"))
    val fj = graft.operators.FuzzyJoin.selfPairsWithin(
      Seq.empty[(Long, String)].toDF("id", "name"), maxDist = 1)
    assert(fj.count() === 0L && fj.columns.toSeq === Seq("i", "j", "dist"))
    val ps = TextSearch.phraseMatches(emptyDocs, "cat sat")
    assert(ps.count() === 0L)
    val cs = ColumnStats.collect(emptyDocs, Seq("doc_id", "text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3),
        r.isNullAt(4))).toSet
    assert(cs === Set(("doc_id", 0L, 0L, true), ("text", 0L, 0L, true)))
    val cm = ColumnStats.correlationMatrix(
      Seq.empty[(Double, Double)].toDF("x", "y"),
      Seq(("x", 1.0), ("y", 1.0))).collect()
    assert(cm.length === 1 && cm(0).isNullAt(3),
      "empty input → one pair row with null corr")
    val emptyGV = Seq.empty[(String, Double)].toDF("g", "v")
    assert(ColumnStats.benfordAudit(emptyGV, "v").count() === 0L)
    assert(graft.operators.Quantiles.winsorize(emptyGV, Seq("g"), "v")
      .count() === 0L)
    assert(graft.operators.Anonymize.tClosenessAudit(
      emptyGV.select(col("g"), col("v").cast("long").as("v")),
      Seq("g"), "v", t = 0.1).count() === 0L)
    assert(graft.operators.Anonymize.dpNoisyCounts(emptyGV, Seq("g"), 1.0)
      .count() === 0L)
    assert(graft.operators.Anonymize.lDiversityAudit(
      emptyGV, Seq("g"), "v", l = 2).count() === 0L)
    assert(graft.operators.Anonymize.kAnonymizeSuppress(
      emptyGV, Seq("g"), k = 2).count() === 0L)
    assert(graft.operators.Sampling.assignSplit(emptyGV, col("g"),
      Seq(("train", 9), ("test", 1)), 10).count() === 0L)
  }

  test("vocabulary: join encode ≡ expression encode; decode round-trips; " +
       "OOV counted") {
    val vocab = Seq("the", "cat", "sat", "dog")
    val d = Seq((1L, "the cat sat"), (2L, "a cat barked"), (3L, "dog"))
      .toDF("doc_id", "text")
    val joined = graft.operators.Vocabulary.encode(d, vocab)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq, r.getLong(2)))
      .toSet
    assert(joined === Set(
      (1L, Seq(1, 2, 3), 0L),
      (2L, Seq(0, 2, 0), 2L),   // "a" and "barked" are OOV
      (3L, Seq(4), 0L)))
    val viaExpr = d.select(col("doc_id"),
        graft.operators.Vocabulary.encodeExpr(split(col("text"), " "), vocab)
          .as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(joined.map(t => t._1 -> t._2).toMap === viaExpr,
      "broadcast-join and literal-map paths must agree")
    val decoded = d.select(col("doc_id"),
        array_join(graft.operators.Vocabulary.decodeExpr(
          graft.operators.Vocabulary.encodeExpr(split(col("text"), " "), vocab),
          vocab), " ").as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(decoded === Map(1L -> "the cat sat", 2L -> "<unk> cat <unk>",
      3L -> "dog"))
  }

  test("groupRegression recovers a known line per group; degenerate x → null") {
    // group a: y = 3x + 5 exactly (r² = 1); group b: noisy line;
    // group c: constant x (no fit possible)
    val rows =
      (0 to 10).map(x => ("a", x.toDouble, 3.0 * x + 5.0)) ++
      Seq(("b", 0.0, 1.0), ("b", 1.0, 2.9), ("b", 2.0, 5.1), ("b", 3.0, 7.0)) ++
      Seq(("c", 2.0, 1.0), ("c", 2.0, 9.0))
    val df = rows.toDF("g", "x", "y")
    val got = ColumnStats.groupRegression(df, Seq("g"), "x", "y",
      xScale = 10.0, yScale = 10.0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(math.abs(got("a").getDouble(2) - 3.0) < 1e-9)
    assert(math.abs(got("a").getDouble(3) - 5.0) < 1e-9)
    assert(math.abs(got("a").getDouble(4) - 1.0) < 1e-9)
    // driver-side OLS for the noisy group
    val b = rows.filter(_._1 == "b").map(t => (t._2, t._3))
    val n = b.size.toDouble
    val (sx, sy) = (b.map(_._1).sum, b.map(_._2).sum)
    val sxx = b.map(t => t._1 * t._1).sum
    val sxy = b.map(t => t._1 * t._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(got("b").getDouble(2) - slope) < 1e-9)
    assert(got("c").isNullAt(2) && got("c").isNullAt(3) && got("c").isNullAt(4),
      "zero x-variance group must yield nulls")
  }

  test("columnStats exact=false tracks exact NDV within HLL error") {
    val df = (1 to 2000).map(i => (i.toLong, (i % 500).toString))
      .toDF("id", "bucket")
    val approx = ColumnStats.collect(df, Seq("id", "bucket"), exact = false)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(math.abs(approx("id") - 2000.0) / 2000.0 < 0.1)
    assert(math.abs(approx("bucket") - 500.0) / 500.0 < 0.1)
  }

  test("benfordAudit: log-spread data passes, uniform-magnitude data fails") {
    // multiplicative growth spans orders of magnitude ⇒ Benford-ish
    val benford = (0 until 2000).map(i => math.pow(1.01, i) * 1.37)
      .toDF("v")
    val ok = ColumnStats.benfordAudit(benford, "v")
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(ok.keySet === (1 to 9).toSet)
    val chi2 = ok(1).getDouble(4)
    assert(ok.values.forall(_.getDouble(4) === chi2),
      "the overall statistic must repeat identically on every row")
    assert(chi2 < 20.1, s"geometric data must pass Benford, chi2=$chi2")
    // digit-1 share ~ 30.1%
    val n = ok.values.map(_.getLong(1)).sum.toDouble
    assert(math.abs(ok(1).getLong(1) / n - 0.301) < 0.03)
    // uniform on [100, 1000): every first digit equally likely ⇒ reject
    val uniform = (0 until 1800).map(i => 100.0 + (i % 900)).toDF("v")
    val badChi2 = ColumnStats.benfordAudit(uniform, "v")
      .collect().head.getDouble(4)
    assert(badChi2 > 20.1, s"uniform magnitudes must fail Benford, chi2=$badChi2")
    // values rounding to zero carry no digit and are excluded
    assert(ColumnStats.benfordAudit(Seq(0.0, 0.001, -0.004).toDF("v"), "v")
      .count() === 0L)
  }

  test("chiSquare: independent table scores ~0, dependent table large; " +
    "dof from margins") {
    // perfectly independent 2x2: obs = exp everywhere -> chi2 = 0
    val indep = Seq.fill(10)(("s1", "en")) ++ Seq.fill(10)(("s1", "de")) ++
      Seq.fill(10)(("s2", "en")) ++ Seq.fill(10)(("s2", "de"))
    val r0 = ColumnStats.chiSquare(indep.toDF("src", "lang"), "src", "lang")
      .collect().head
    assert(r0.getLong(0) === 40L)
    assert(r0.getLong(1) === 4L)
    assert(r0.getLong(2) === 1L)
    assert(r0.getDouble(3) === 0.0)
    // perfectly dependent: src determines lang -> chi2 = n
    val dep = Seq.fill(10)(("s1", "en")) ++ Seq.fill(10)(("s2", "de"))
    val r1 = ColumnStats.chiSquare(dep.toDF("src", "lang"), "src", "lang")
      .collect().head
    assert(math.abs(r1.getDouble(3) - 20.0) < 1e-4,
      s"2x2 perfect association has chi2 = n, got ${r1.getDouble(3)}")
  }

  test("giniByGroup: equality -> 0, known hand value, scale invariance") {
    val eq = Seq(("a", 5L), ("a", 5L), ("a", 5L), ("a", 5L))
    val g0 = ColumnStats.giniByGroup(eq.toDF("g", "v"), "g", "v")
      .collect().head
    assert(g0.getDouble(3) === 0.0)
    // {1, 3}: G = (2*1*1 + ... ) hand: sorted x=(1,3), wsum=1*1+3*3=10,
    // n=2, total=4 -> (10 - 8) / 8 = 0.25
    val hand = ColumnStats.giniByGroup(
      Seq(("a", 1L), ("a", 3L)).toDF("g", "v"), "g", "v").collect().head
    assert(hand.getDouble(3) === 0.25)
    // scale invariance: multiplying the measure by 1000 leaves G unchanged
    val big = ColumnStats.giniByGroup(
      Seq(("a", 1000L), ("a", 3000L)).toDF("g", "v"), "g", "v")
      .collect().head
    assert(big.getDouble(3) === 0.25)
  }

  test("psi: identical mix -> 0, disjoint -> large but finite, " +
    "empty bins smoothed") {
    import org.apache.spark.sql.DataFrame
    def mk(xs: Seq[Long]): DataFrame = xs.toDF("v")
    def psiOf(a: Seq[Long], b: Seq[Long]): Double =
      ColumnStats.psi(mk(a), mk(b), "v", width = 10L)
        .collect().head.getDouble(4)
    // same distribution (even scaled 2x per bin: p and q equal) -> 0
    val base = Seq(1L, 5L, 15L, 25L, 25L)
    assert(psiOf(base, base) === 0.0)
    // disjoint supports: every bin empty on one side -- finite via
    // smoothing, and clearly over the 0.2 "shifted" rule of thumb
    val drift = psiOf(Seq(1L, 2L, 3L, 4L), Seq(101L, 102L, 103L, 104L))
    assert(!drift.isNaN && !drift.isInfinite)
    assert(drift > 0.2, s"disjoint supports must read as shifted, got $drift")
    intercept[IllegalArgumentException](
      ColumnStats.psi(mk(base), mk(base), "v", width = 0L))
  }

  test("BPE merges equal a driver-side reference; greedy left-to-right " +
    "on overlapping runs; repartition-invariant") {
    import graft.operators.Vocabulary
    // reference BPE over token lists, greedy left-to-right merge
    def refBpe(corpus: Seq[String], rounds: Int): Seq[(Int, String, String, Long)] = {
      var docs = corpus.map(_.split(" ").toList)
      (1 to rounds).map { r =>
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        docs.foreach(t => t.zip(t.drop(1)).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + 1))
        val ((l, rr), n) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        docs = docs.map { toks =>
          val out = scala.collection.mutable.ListBuffer[String]()
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == rr) {
              out += l + "\u0002" + rr; i += 2
            } else { out += toks(i); i += 1 }
          }
          out.toList
        }
        (r, l, rr, n)
      }
    }
    val corpus = Seq(
      "the cat sat on the mat", "the cat ate", "a a a a",
      "the cat sat here", "on the mat the cat sat")
    val want = refBpe(corpus, 4)
    def run(parts: Int) = Vocabulary.learnBpeMerges(
        corpus.toDF("text").repartition(parts), rounds = 4)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(run(1) === want)
    assert(run(7) === want, "merge learning is partitioning-invariant")
    // "a a a a": round counting 3 pairs, after merging greedy LTR gives
    // (a\u0002a, a\u0002a) -- the reference already encodes this; spot-check
    // the overlap semantics directly
    val solo = Vocabulary.learnBpeMerges(
      Seq("a a a").toDF("text"), rounds = 2).collect()
    assert(solo(0).getString(1) === "a" && solo(0).getString(2) === "a")
    assert(solo(0).getLong(3) === 2L)
    // after one greedy merge: [a\u0002a, a] -> exactly one (merged, a) pair
    assert(solo(1).getLong(3) === 1L)
    intercept[IllegalArgumentException](
      Vocabulary.learnBpeMerges(corpus.toDF("text"), rounds = 0))
    // the transform half: applyBpeMerges reproduces the reference's
    // merged token streams exactly, in document order
    val refDocs = {
      var docs = corpus.map(_.split(" ").toList)
      want.foreach { case (_, l, rr, _) =>
        docs = docs.map { toks =>
          val out = scala.collection.mutable.ListBuffer[String]()
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == rr) {
              out += l + "\u0002" + rr; i += 2
            } else { out += toks(i); i += 1 }
          }
          out.toList
        }
      }
      docs
    }
    val gotDocs = corpus.zipWithIndex.toDF("text", "i").orderBy("i")
      .select(Vocabulary.applyBpeMerges(col("text"),
        want.map(m => (m._2, m._3))).as("t"))
      .collect().map(_.getSeq[String](0).toList).toSeq
    assert(gotDocs === refDocs)
  }

  test("psiSeries: stable days read ~0, a shifted day spikes, the first " +
    "day is excluded") {
    import java.sql.Timestamp
    def ts(day: Int, i: Int) =
      Timestamp.valueOf(f"2024-01-$day%02d 10:$i%02d:00")
    // days 1 and 2 share a distribution; day 3 jumps to a distant band
    val rows =
      (0 until 20).map(i => (ts(1, i), (i % 4) * 10L)) ++
      (0 until 20).map(i => (ts(2, i), (i % 4) * 10L)) ++
      (0 until 20).map(i => (ts(3, i), 500L + (i % 4) * 10L))
    val got = ColumnStats.psiSeries(rows.toDF("ts", "v"), col("ts"),
        col("v"), width = 20L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(!got.contains("2024-01-01"), "no predecessor for the first day")
    assert(got("2024-01-02")._4 === 0.0, "identical mixes read exactly 0")
    assert(got("2024-01-03")._4 > 0.2, s"shift must spike: ${got("2024-01-03")}")
    // the phantom day after the last one reads as everything-vanished
    assert(got.contains("2024-01-04"))
    assert(got("2024-01-04")._3 === 0L)
  }

  test("buildVocab: deterministic top-V with tie-break, exact coverage, " +
    "feeds encode round-trip") {
    import graft.operators.Vocabulary
    val docs = Seq((1L, "a a a b b c"), (2L, "a c")).toDF("doc_id", "text")
    // counts: a=4, b=2, c=2 (b/c tie -> token asc), total 8
    val v = Vocabulary.buildVocab(docs, size = 2).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(v.toSeq === Seq((1, "a", 4L, 0.5), (2, "b", 2L, 0.25)),
      "tie between b and c must break on the token, coverage over ALL tokens")
    // the built vocabulary drives encode directly: ids match positions
    val toks = v.map(_._2).toSeq
    val enc = Vocabulary.encode(docs, toks).orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(enc(1L) === Seq(1, 1, 1, 2, 2, 0), "a->1, b->2, c OOV->0")
    assert(enc(2L) === Seq(1, 0))
    intercept[IllegalArgumentException](Vocabulary.buildVocab(docs, 0))
  }

  test("zipfAudit: exact power-law corpus fits slope ~ -1 with high r2; " +
    "uniform counts degenerate to slope 0 / null r2") {
    import graft.operators.Vocabulary
    // token t_i appears round(720/i) times: a perfect s=1 power law up
    // to count rounding
    val words = (1 to 12).flatMap(i =>
      Seq.fill(math.round(720.0 / i).toInt)(s"t$i"))
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val fit = Vocabulary.zipfAudit(docs, topV = 12).head()
    assert(fit.getLong(0) === 12L)
    assert(math.abs(fit.getDouble(1) - (-1.0)) < 0.02,
      s"power-law slope, got ${fit.getDouble(1)}")
    assert(fit.getDouble(3) > 0.999, s"r2, got ${fit.getDouble(3)}")
    // intercept is ln C: C = 720
    assert(math.abs(fit.getDouble(2) - math.log(720.0)) < 0.05)
    val flat = Seq((1L, "x y z x y z x y z")).toDF("doc_id", "text")
    val f = Vocabulary.zipfAudit(flat, topV = 3).head()
    assert(f.getDouble(1) === 0.0, "equal counts: zero slope")
    assert(f.isNullAt(3), "zero count variance: r2 undefined")
  }

  test("joinCardinality: exact output-size prediction, matched keys, " +
    "per-key maximum, amplification") {
    import graft.operators.ColumnStats
    val left = Seq(1, 1, 1, 2, 2, 3, 9).map(k => (k, "l")).toDF("k", "v")
    val right = Seq(1, 1, 2, 4).map(k => (k, "r")).toDF("k", "v")
    val r = ColumnStats.joinCardinality(left, right, "k").head()
    // out = 3*2 (k=1) + 2*1 (k=2) = 8; keys 3/9 and 4 unmatched
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((7L, 4L, 4L, 3L)))
    assert(r.getLong(4) === 2L, "matched keys")
    assert(r.getLong(5) === 8L, "exact inner-join row count")
    assert(r.getLong(6) === 6L, "hottest key's output")
    assert(math.abs(r.getDouble(7) - 8.0 / 7.0) < 1e-6)
    // the prediction IS the join's count
    assert(left.join(right, "k").count() === 8L)
    // disjoint keys: everything zero, no null leaks
    val r0 = ColumnStats.joinCardinality(left,
      Seq((100, "x")).toDF("k", "v"), "k").head()
    assert(r0.getLong(4) === 0L && r0.getLong(5) === 0L &&
      r0.getLong(6) === 0L && r0.getDouble(7) === 0.0)
  }

  test("joinKeySkew: hand-built hot key yields exact skew, hot count, " +
    "and suggested salt") {
    import graft.operators.ColumnStats
    // one key with 100 rows + 10 singleton keys: avg = 10, skew = 10.0
    val df = ((1 to 100).map(_ => "hot") ++ (1 to 10).map(i => s"k$i"))
      .toDF("key")
    val r = ColumnStats.joinKeySkew(df, "key", hotFactor = 5.0).head()
    assert(r.getLong(0) === 110L && r.getLong(1) === 11L)
    assert(r.getLong(2) === 100L)
    assert(r.getLong(3) === 1L, "only the hot key exceeds 5x average")
    assert(r.getDouble(4) === 10.0)
    assert(r.getLong(5) === 10L, "salt fan that levels the hot key")
    // strictly-above semantics: at hotFactor 10 the hot key sits ON the
    // bound (100 = 10 x avg) and is not counted
    assert(ColumnStats.joinKeySkew(df, "key", hotFactor = 10.0)
      .head().getLong(3) === 0L)
    // uniform keys: skew 1, nothing hot, salt 1
    val uni = ColumnStats.joinKeySkew(
      (1 to 20).map(i => s"k${i % 5}").toDF("key"), "key").head()
    assert(uni.getDouble(4) === 1.0 && uni.getLong(3) === 0L &&
      uni.getLong(5) === 1L)
    intercept[IllegalArgumentException](
      ColumnStats.joinKeySkew(df, "key", hotFactor = 0.0))
  }

  test("substringMatches: equals the plain contains-scan, trigram coverage " +
    "is a true superset, short patterns and short texts are safe") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox"), (2L, "quick silver"),
      (3L, "slow brown snail"), (4L, "qu"), (5L, "brown? quick brown!"))
      .toDF("doc_id", "text")
    def exact(p: String) = docs.filter(col("text").contains(p))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    def viaTrgm(p: String) = graft.operators.TextSearch
      .substringMatches(docs, p)
      .collect().map(_.getLong(0)).toSet
    for (p <- Seq("quick brown", "brown", "ow", "q", "snail", "absent zz"))
      assert(viaTrgm(p) === exact(p), s"pattern '$p'")
    // coverage-only candidates form a superset of the exact answer — the
    // verify step is what removes coincidental trigram coverage
    val grams = "quick brown".sliding(3).toSeq.distinct
    val cands = graft.operators.TextSearch.trigramPostings(docs)
      .filter(col("gram").isin(grams: _*))
      .groupBy("doc_id").count().filter(col("count") === grams.size)
      .collect().map(_.getLong(0)).toSet
    assert(exact("quick brown").subsetOf(cands))
    // a doc shorter than one trigram contributes no posting rows
    assert(graft.operators.TextSearch.trigramPostings(docs)
      .filter(col("doc_id") === 4L).count() === 0L)
  }
}
