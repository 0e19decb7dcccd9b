package graft

import org.apache.spark.sql.functions._
import graft.operators.{Quantiles, Sampling}
import graft.functions.TextFunctions
import graft.sources.Tables

class QuantilesSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("exact group quantiles match a hand computation") {
    // 1..9 per one group: p25 = 3, p50 = 5, p75 = 7 (rank p*(n-1) exact)
    val df = (1 to 9).map(i => ("g", i.toDouble)).toDF("k", "v")
    val r = Quantiles.groupQuantilesExact(df, Seq("k"), col("v")).collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 9L)
    assert(r(0).getDouble(2) === 3.0 && r(0).getDouble(3) === 5.0 &&
      r(0).getDouble(4) === 7.0)
  }

  test("approx quantiles track exact within the sketch error bound") {
    val events = Tables.table(spark, sf0001, "events")
    val exact = Quantiles.groupQuantilesExact(events, Seq("event_type"), col("value"))
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val approx = Quantiles.groupQuantilesApprox(events, Seq("event_type"), col("value"),
      accuracy = 10000)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(exact.keySet === approx.keySet)
    // GK bound is on RANK error (1/accuracy); translate loosely to value
    // space by allowing 2% of the observed value range per group.
    for ((k, (e25, e50, e75)) <- exact) {
      val (a25, a50, a75) = approx(k)
      val tol = math.max(1e-9, (e75 - e25) * 0.02 + 1e-6)
      assert(math.abs(a25 - e25) <= tol, s"$k p25: $a25 vs $e25")
      assert(math.abs(a50 - e50) <= tol, s"$k p50: $a50 vs $e50")
      assert(math.abs(a75 - e75) <= tol, s"$k p75: $a75 vs $e75")
    }
  }

  test("deterministic sample is partitioning-invariant and stratified") {
    val docs = Tables.table(spark, sf0001, "documents")
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Sampling.stratifiedDeterministic(df, col("lang"), col("doc_id"), 3, 20)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids(docs)
    val b = ids(docs.repartition(17, col("n_chars"))) // different layout, same rows
    assert(a === b, "sample must not depend on partitioning")
    // rate lands near 15% overall (binomial tolerance on 500 docs)
    val n = docs.count().toDouble
    assert(math.abs(a.size / n - 0.15) < 0.06, s"rate ${a.size / n}")
    // stratified: every language keeps a nonzero share at this size
    val perLang = Sampling.stratifiedDeterministic(docs, col("lang"), col("doc_id"), 3, 20)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    assert(langs.forall(l => perLang.getOrElse(l, 0L) > 0L))
  }

  test("xxhash64 scale-path sample agrees with itself and respects bounds") {
    val docs = Tables.table(spark, sf0001, "documents")
    val key = concat(col("lang"), lit(":"), col("doc_id").cast("string"))
    val kept = docs.filter(Sampling.hashBucketXx(key, 20) < 3).count()
    val kept2 = docs.repartition(5).filter(Sampling.hashBucketXx(key, 20) < 3).count()
    assert(kept === kept2)
    assert(kept > 0 && kept < docs.count())
    intercept[IllegalArgumentException](Sampling.hashBucket(col("lang"), 0))
    intercept[IllegalArgumentException](
      Sampling.stratifiedDeterministic(docs, col("lang"), col("doc_id"), 21, 20))
  }

  test("approx_count_distinct tracks exact distinct counts within its rsd bound") {
    val events = Tables.table(spark, sf0001, "events")
    val both = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(both.nonEmpty)
    both.foreach { case (k, exact, approx) =>
      // 0.02 rsd → allow 5 sigma before calling it broken
      assert(math.abs(approx - exact) <= math.max(3, exact * 0.10),
        s"$k: approx $approx vs exact $exact")
    }
  }

  test("mixture resample: binding stratum keeps all, others hit the mix") {
    val docs = Tables.table(spark, sf0001, "documents")
    val targets = Seq("en" -> 0.4, "de" -> 0.15, "es" -> 0.15,
      "fr" -> 0.15, "zh" -> 0.15)
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = Sampling.mixtureResample(docs, targets, col("lang"), col("doc_id"))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the binding stratum (min count/share) must keep ~everything
    val binding = targets.minBy { case (l, p) => before(l) / p }._1
    assert(after(binding).toDouble / before(binding) > 0.95,
      s"binding stratum $binding lost data: $before -> $after")
    // kept proportions track the targets (hash-quantization noise allowed)
    val total = after.values.sum.toDouble
    targets.foreach { case (l, p) =>
      assert(math.abs(after(l) / total - p) < 0.08,
        s"$l share ${after(l) / total} vs target $p (after=$after)")
    }
    // determinism: same input, same rows
    val again = Sampling.mixtureResample(docs.repartition(7), targets,
      col("lang"), col("doc_id")).select("doc_id").collect().map(_.getLong(0)).toSet
    val first = Sampling.mixtureResample(docs, targets, col("lang"), col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === first, "sample must be partitioning-invariant")
    intercept[IllegalArgumentException](
      Sampling.mixtureResample(docs, Seq.empty, col("lang"), col("doc_id")))
  }

  test("temperatureResample: flattens toward uniform, keeps the binding " +
    "stratum, partitioning-invariant") {
    val docs = Tables.table(spark, sf0001, "documents")
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = Sampling.temperatureResample(docs, col("lang"), col("doc_id"))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totB = before.values.sum.toDouble
    val totA = after.values.sum.toDouble
    // α = 1/2 targets share ∝ √p: every stratum's kept share must sit
    // closer to its √p-flattened target than its natural share did —
    // head languages shrink, tail languages gain relative weight
    val z = before.values.map(c => math.sqrt(c / totB)).sum
    before.keys.foreach { l =>
      val natural = before(l) / totB
      val target = math.sqrt(natural) / z
      val kept = after.getOrElse(l, 0L) / totA
      assert(math.abs(kept - target) < 0.05,
        s"$l kept share $kept vs temperature target $target")
    }
    // the binding stratum keeps ~everything (downsample-only contract)
    val binding = before.keys.minBy(l =>
      before(l) / (math.sqrt(before(l) / totB) / z))
    assert(after(binding).toDouble / before(binding) > 0.95,
      s"binding stratum $binding lost data")
    val a = Sampling.temperatureResample(docs, col("lang"), col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureResample(docs.repartition(7),
        col("lang"), col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b, "sample must be partitioning-invariant")
    intercept[IllegalArgumentException](Sampling.temperatureResample(
      docs, col("lang"), col("doc_id"), alphaQuarters = 0))
    intercept[IllegalArgumentException](Sampling.temperatureResample(
      docs, col("lang"), col("doc_id"), alphaQuarters = 4))
  }

  test("bottomKSketch: mergeable deterministic sample, exact below k, " +
    "estimator within KMV error, partitioning-invariant") {
    import spark.implicits._
    val n = 5000
    val rows = (0 until n).map(i => ("g", i.toLong)) ++
      Seq(("tiny", 1L), ("tiny", 2L), ("tiny", 2L))
    val df = rows.toDF("src", "id")
    val k = 64
    def sketch(d: org.apache.spark.sql.DataFrame) =
      Sampling.bottomKSketch(d, col("src"), col("id"), k)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val got = sketch(df)
    // below k: ALL distinct keys kept, estimate null (exact regime)
    val tiny = got.filter(_._1 == "tiny")
    assert(tiny.map(_._3).toSet === Set(1L, 2L) && tiny.forall(_._4.isEmpty))
    // at k: exactly k rows, estimate within 4σ ≈ 4/√(k−2) relative
    val big = got.filter(_._1 == "g")
    assert(big.length === k)
    val est = big.head._4.get
    assert(math.abs(est - n) / n < 4.0 / math.sqrt(k - 2.0),
      s"KMV estimate $est vs true $n")
    // mergeability: bottom-k of (first half ∪ second half sketches) =
    // bottom-k of the union — the property reservoirs lack
    val h1 = Sampling.bottomKSketch(
      df.filter(col("id") < n / 2), col("src"), col("id"), k)
    val h2 = Sampling.bottomKSketch(
      df.filter(col("id") >= n / 2), col("src"), col("id"), k)
    val merged = Sampling.bottomKSketch(
        h1.select("grp", "key").unionByName(h2.select("grp", "key")),
        col("grp"), col("key"), k)
      .filter(col("grp") === "g")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val whole = big.map(t => (t._2, t._3, t._4.get)).toSet
    assert(merged === whole, "union of sketches re-sketched = whole sketch")
    assert(sketch(df.repartition(11)).toSet === got.toSet)
    intercept[IllegalArgumentException](
      Sampling.bottomKSketch(df, col("src"), col("id"), 1))
  }

  test("capPerGroup: at most n per group, deterministic across partitionings") {
    val docs = Tables.table(spark, sf0001, "documents")
    val capped = Sampling.capPerGroup(docs, col("source"), col("doc_id"), 3)
    val counts = capped.groupBy("source").count().collect().map(_.getLong(1))
    assert(counts.forall(_ <= 3) && counts.nonEmpty)
    val a = capped.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.capPerGroup(docs.repartition(5), col("source"), col("doc_id"), 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b, "cap selection must be a pure function of the data")
    assert(Sampling.capPerGroup(docs, col("source"), col("doc_id"), 0).count() === 0L)
  }

  test("assignSplit: total, partitioning-invariant, stable under corpus growth") {
    val docs = Tables.table(spark, sf0001, "documents")
    val splits = Seq(("train", 8), ("val", 1), ("test", 1))
    val labeled = Sampling.assignSplit(docs, col("doc_id"), splits, buckets = 10)
    val byLabel = labeled.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet === Set("train", "val", "test"),
      "every row must receive one of the declared labels")
    assert(byLabel.values.sum === docs.count())
    assert(byLabel("train") > byLabel("val") + byLabel("test"),
      "8/10 of buckets must dominate the split")
    // pure function of the key: repartitioning changes nothing
    val a = labeled.select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.assignSplit(docs.repartition(7), col("doc_id"), splits, 10)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
    // growth stability: a subset corpus assigns the same labels — the
    // no-leak property randomSplit cannot give
    val subset = docs.filter(col("doc_id") % 3 === 0)
    Sampling.assignSplit(subset, col("doc_id"), splits, 10)
      .select("doc_id", "split").collect()
      .foreach { r => assert(a(r.getLong(0)) === r.getString(1)) }
    intercept[IllegalArgumentException](
      Sampling.assignSplit(docs, col("doc_id"), Seq(("train", 8)), 10))
    intercept[IllegalArgumentException](
      Sampling.assignSplit(docs, col("doc_id"), Seq.empty, 10))
  }

  test("winsorize: clips into the group band, keeps rows and rank order") {
    // group "a": 0..16 -> 1/16 quantile = 1.0, 15/16 = 15.0
    val df = ((0 to 16).map(i => ("a", i.toDouble)) ++
      Seq(("b", 100.0), ("b", 200.0), ("b", 300.0))).toDF("g", "v")
    val out = Quantiles.winsorize(df, Seq("g"), "v")
    assert(out.count() === df.count(), "winsorization never drops rows")
    val a = out.filter(col("g") === "a")
      .select("v", "v_w", "clipped")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(a.head === ((0.0, 1.0, true)), "low tail clips up to the 1/16 bound")
    assert(a.last === ((16.0, 15.0, true)), "high tail clips down")
    assert(a.count(_._3) === 2, "only the tails clip")
    // interior values pass through untouched and order is preserved
    assert(a.map(_._2).sorted === a.map(_._2))
    a.filter(!_._3).foreach { case (v, w, _) => assert(v === w) }
    intercept[IllegalArgumentException](
      Quantiles.winsorize(df, Seq.empty, "v"))
    intercept[IllegalArgumentException](
      Quantiles.winsorize(df, Seq("g"), "v", loP = 0.9, hiP = 0.1))
  }

  test("url helpers: domain, tld, path; non-URLs give empty strings") {
    val vectors = Seq(
      ("https://cdn3.example-en.org/p/42?ref=r1", "cdn3.example-en.org", "org", "/p/42"),
      ("http://a.b.co/x/y#frag", "a.b.co", "co", "/x/y"),
      ("https://host.io", "host.io", "io", ""), // no path
      ("not a url at all", "", "", ""))
    val got = vectors.map(_._1).toDF("u").select(
      TextFunctions.urlDomain(col("u")),
      TextFunctions.urlTld(TextFunctions.urlDomain(col("u"))),
      TextFunctions.urlPath(col("u"))).collect()
    got.zip(vectors).foreach { case (r, (_, d, t, p)) =>
      assert(r.getString(0) === d); assert(r.getString(1) === t)
      assert(r.getString(2) === p)
    }
  }

  test("quantile bins: hand-checked edges, bit-exact save/load round-trip, " +
    "reloaded edges bin identically") {
    import graft.operators.Quantiles
    // values 1..8: octile edges at i/8 over (n-1)p positions
    val df = (1L to 8L).toDF("v")
    val edges = Quantiles.fitBins(df, col("v"), k = 8, scale = 1.0)
    assert(edges.length === 7)
    assert(edges.head === 1.875, "p12.5 of 1..8 = 1 + 7*0.125")
    assert(edges(3) === 4.5, "median of 1..8")
    assert(edges.sameElements(edges.sorted))
    // round-trip: bit-exact edges, identical binning
    val dir = tmpDir("graft-bins")
    Quantiles.saveBins(spark, edges, dir)
    val back = Quantiles.loadBins(spark, dir)
    assert(back.toSeq === edges.toSeq)
    val a = Quantiles.applyBins(df, col("v"), edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Quantiles.applyBins(df, col("v"), back).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
    // bucket contract: below every edge -> 0, above every edge -> k-1
    val ext = Seq(0L, 100L).toDF("v")
    val got = Quantiles.applyBins(ext, col("v"), edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(0L) === 0L && got(100L) === 7L)
    intercept[IllegalArgumentException](Quantiles.fitBins(df, col("v"), k = 5))
    intercept[IllegalArgumentException](
      Quantiles.applyBins(df, col("v"), Array.empty[Double]))
  }

  test("poissonBootstrap: unit-mean weights, replicate means bracket the " +
    "truth, fully deterministic") {
    import graft.operators.Sampling
    val df = (1L to 400L).map(i => (i, 100L + (i % 50))).toDF("id", "v")
    val reps = Sampling.poissonBootstrap(df, col("id"), col("v"),
        replicates = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(reps.length === 16)
    // Poisson(1) weights: each replicate's effective n is near 400
    assert(reps.forall(r => r._2 > 300L && r._2 < 500L),
      s"n_eff out of family: ${reps.map(_._2).toSeq}")
    // the replicate means scatter AROUND the true mean
    val truth = (1L to 400L).map(i => 100L + (i % 50)).sum.toDouble / 400
    val means = reps.map(_._3)
    assert(means.min < truth && truth < means.max,
      s"truth $truth outside [${means.min}, ${means.max}]")
    assert(means.forall(m => math.abs(m - truth) < 5.0))
    // bit-for-bit deterministic under repartitioning
    val again = Sampling.poissonBootstrap(df.repartition(7), col("id"),
        col("v"), replicates = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(again.toSet === reps.toSet)
    // thresholds are the Poisson(1) CDF on the 2^20 lattice
    assert(Sampling.PoissonThresholds.head ===
      math.round(math.exp(-1.0) * 1048576.0))
    assert(Sampling.PoissonThresholds.size === 7)
    intercept[IllegalArgumentException](
      Sampling.poissonBootstrap(df, col("id"), col("v"), replicates = 1))
  }
}
