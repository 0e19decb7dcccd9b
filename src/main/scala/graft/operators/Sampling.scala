package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for reproducible corpus
  * subsetting — the operation a training-data pipeline runs to carve
  * eval/holdout slices or rate-limit an over-represented source.
  *
  * Spark's own `sample()`/`sampleBy()` draw from a seeded RNG whose stream
  * depends on partition layout, so the selected ROWS change whenever the
  * input splits differently — unacceptable for a sample that must be
  * reproducible across reruns, engines, and cluster sizes. Hash-based
  * sampling instead derives the keep/drop decision from the row's own key:
  * `md5(stratum:key) mod buckets < keep`. The same row lands on the same
  * side everywhere, forever, at any parallelism.
  *
  * 100 TB plan shape: a narrow projection + filter — no shuffle, no RNG
  * state, pushes through the scan like any predicate. The md5 is the
  * portability anchor (DuckDB replays it bitwise for the oracle); a
  * production variant can swap in `xxhash64` for ~4× cheaper hashing with
  * identical semantics (same swap the dedup suite makes).
  */
object Sampling {

  /** Uniform hash bucket in `[0, buckets)` from the first 8 md5 hex chars
    * (32 bits — unbiased for any `buckets` ≪ 2^32 for practical purposes;
    * bias is ≤ buckets/2^32), computed natively as md5 lane 0
    * ([[graft.functions.Md5Lanes]] — no hex round-trip, bit-identical).
    * Engine-portable: DuckDB expresses the same value as
    * `CAST('0x' || substr(md5(key),1,8) AS BIGINT) % buckets`.
    */
  def hashBucket(key: Column, buckets: Int): Column = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    element_at(graft.functions.GraftFunctions.md5_lanes(key), 1) % buckets
  }

  /** xxhash64 flavor of [[hashBucket]] for the at-scale path: one codegen'd
    * long hash, no hex round-trip. Not DuckDB-replayable (different hash),
    * which is the only reason it is not the oracle default.
    */
  def hashBucketXx(key: Column, buckets: Int): Column = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    pmod(xxhash64(key), lit(buckets.toLong))
  }

  /** Keep `keep`-in-`buckets` of each stratum, deterministically. The hash
    * key is `stratum || ':' || key`, so each stratum is sampled by an
    * independent hash stream at the same rate — the stratified guarantee —
    * and the decision is a pure function of the row (reproducible across
    * runs, engines, partitionings).
    */
  def stratifiedDeterministic(df: DataFrame, stratum: Column, key: Column,
                              keep: Int, buckets: Int): DataFrame = {
    require(keep >= 0 && keep <= buckets,
      s"keep must be in [0, buckets]: keep=$keep buckets=$buckets")
    df.filter(hashBucket(concat(stratum, lit(":"), key.cast("string")), buckets) < keep)
  }

  /** Domain-mixture resampling: downsample each stratum so the kept corpus
    * hits the `targets` proportions while retaining as much data as
    * possible — the mixing step a training-data pipeline runs when one
    * domain dwarfs the rest. The binding stratum (smallest `count/share`)
    * keeps everything; every other stratum is hash-downsampled to match.
    * Strata absent from `targets` are dropped (share zero). Per-row
    * decisions are the same partitioning-invariant hash as
    * [[stratifiedDeterministic]], so the sample is reproducible anywhere.
    *
    * 100 TB plan shape: one map-side-combined count per stratum (a
    * handful of rows), a one-row min for the scale factor, and the
    * per-stratum keep-rates broadcast back onto the scan — the fact table
    * never shuffles; sampling is a pushed-down filter against a broadcast
    * lookup. Rates quantize to integer buckets, so the comparison is
    * integer-exact in any engine.
    */
  def mixtureResample(df: DataFrame, targets: Seq[(String, Double)],
                      stratum: Column, key: Column,
                      buckets: Int = 10000): DataFrame = {
    require(targets.nonEmpty, "mixtureResample needs at least one target share")
    require(targets.forall(_._2 > 0), s"target shares must be positive: $targets")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = df.sparkSession
    val t = spark.createDataFrame(targets).toDF("stratum", "share")
    val counts = df.groupBy(stratum.as("stratum")).agg(count(lit(1)).as("cnt"))
      .join(broadcast(t), "stratum")
    val scale = counts.agg(min(col("cnt") / col("share")).as("scale"))
    val rates = counts.crossJoin(broadcast(scale))
      .select(col("stratum"),
        round(col("share") * col("scale") / col("cnt") * buckets)
          .cast("long").as("keep_buckets"))
    df.join(broadcast(rates), stratum === rates("stratum"))
      .filter(hashBucket(concat(stratum, lit(":"), key.cast("string")), buckets)
        < col("keep_buckets"))
      .drop("stratum", "keep_buckets")
  }

  /** Temperature-based mixture resampling — [[mixtureResample]] with the
    * target shares DERIVED from the corpus itself: each stratum's share is
    * its natural proportion raised to α = alphaQuarters/4 (the multilingual
    * training-mix standard, e.g. Conneau & Lample 2019 §3.1 / Arivazhagan
    * et al. 2019 §4: α < 1 flattens the mix so head languages stop
    * drowning the tail), then the same keep-as-much-as-possible
    * hash-downsampling hits those shares.
    *
    * Engine-exactness is why α is a DYADIC rational (quarters): p^(1/4),
    * p^(1/2), p^(3/4) compose from `sqrt` and one multiply — both
    * correctly-rounded IEEE operations that every engine computes
    * bit-identically — where a general `pow(p, α)` differs in the last
    * ulp across libm implementations and would poison the keep-bucket
    * rounding. Same 100 TB shape as [[mixtureResample]]: stratum counts,
    * one-row scale, broadcast rates, pushed-down scan filter; the fact
    * table never shuffles.
    */
  def temperatureResample(df: DataFrame, stratum: Column, key: Column,
                          alphaQuarters: Int = 2,
                          buckets: Int = 10000): DataFrame = {
    require(alphaQuarters >= 1 && alphaQuarters <= 3,
      s"alphaQuarters must be 1..3 (alpha = 1/4, 1/2, 3/4), got $alphaQuarters")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val counts = df.groupBy(stratum.as("stratum")).agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("tot"))
    val p = col("cnt").cast("double") / col("tot")
    val share = alphaQuarters match {
      case 1 => sqrt(sqrt(p))
      case 2 => sqrt(p)
      case _ => sqrt(p) * sqrt(sqrt(p))
    }
    val weighted = counts.crossJoin(broadcast(tot))
      .select(col("stratum"), col("cnt"), share.as("share"))
    val scale = weighted.agg(min(col("cnt") / col("share")).as("scale"))
    val rates = weighted.crossJoin(broadcast(scale))
      .select(col("stratum"),
        round(col("share") * col("scale") / col("cnt") * buckets)
          .cast("long").as("keep_buckets"))
    df.join(broadcast(rates), stratum === rates("stratum"))
      .filter(hashBucket(concat(stratum, lit(":"), key.cast("string")), buckets)
        < col("keep_buckets"))
      .drop("stratum", "keep_buckets")
  }

  /** Bottom-k (KMV) sketch per group — one construction, two products
    * (Bar-Yossef et al. 2002, "Counting distinct elements in a data
    * stream"): the k smallest md5 hashes of a group's DISTINCT keys are
    * simultaneously
    *
    *  - a DETERMINISTIC uniform sample of the group's distinct keys (the
    *    "reservoir" that needs no RNG state: membership is a pure
    *    function of the key, so reruns/engines/partitionings agree, and
    *    two sketches MERGE by just taking the union's bottom-k — the
    *    mergeability classic reservoirs lack), and
    *  - a distinct-count estimator: n̂ = (k−1)/h_(k) with h_(k) the kth
    *    smallest hash normalized to (0, 1] — unbiased, σ/n ≈ 1/√(k−2).
    *
    * Exact below k: a group with fewer than k distinct keys keeps them
    * ALL and reports its exact count (estimator output null — no
    * estimate is needed and (k−1)/h_k would be biased there).
    *
    * Scale shape: distinct-collapse, then ONE keyed window (partitions
    * by group, never global) bounded to k rows per group. The 32-bit md5
    * lane is the hash (engine-portable; collision probability k·n/2³²
    * only perturbs the estimate, never correctness of the sample).
    *
    * Output: one row per kept key — (grp, rank 1..k in hash order, key,
    * est) with `est` repeated on each of the group's rows (flat
    * scalar-typed rows, the harness hash contract; null in the exact
    * regime).
    */
  def bottomKSketch(df: DataFrame, group: Column, key: Column,
                    k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("__h").asc, col("key").asc)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp"))
    df.select(group.as("grp"), key.as("key")).distinct()
      .withColumn("__h", hashBucket(concat(col("grp"), lit(":"),
        col("key").cast("string")), Int.MaxValue))
      .withColumn("rank", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .filter(col("rank") <= k)
      .withColumn("est",
        // h+1 over 2^31 maps the 31-bit hash to (0, 1]: hash value 0 is
        // reachable (md5 lane ≡ 0 mod 2^31−1 has two preimages per lane
        // period), and a plain h/(2^31−1) normalization would divide by
        // zero there, reporting est = Infinity for the whole group.
        when(col("__n") < k, lit(null).cast("double"))
          .otherwise(round(lit((k - 1).toDouble) /
            ((max(when(col("rank") === k, col("__h"))).over(wAll) + 1L) /
              lit(Int.MaxValue.toDouble + 1.0)) * 1e6) / 1e6))
      .select(col("grp"), col("rank"), col("key"), col("est"))
  }

  /** DuckDB replay of [[bottomKSketch]] over `table`. */
  def bottomKOracleSql(table: String, groupCol: String, keyCol: String,
                       k: Int): String = {
    val h = "CAST(('0x' || substr(md5(grp || ':' || " +
      s"CAST(key AS VARCHAR)), 1, 8)) AS BIGINT) % ${Int.MaxValue}"
    s"""WITH d AS (
       |  SELECT DISTINCT $groupCol AS grp, $keyCol AS key FROM $table
       |), hashed AS (
       |  SELECT grp, key, $h AS h FROM d
       |), ranked AS (
       |  SELECT grp, key, h,
       |         ROW_NUMBER() OVER (PARTITION BY grp
       |                            ORDER BY h ASC, key ASC) AS rank,
       |         COUNT(*) OVER (PARTITION BY grp) AS n
       |  FROM hashed
       |), cut AS (
       |  SELECT grp, key, h, rank, n,
       |         MAX(CASE WHEN rank = $k THEN h END)
       |           OVER (PARTITION BY grp) AS hk
       |  FROM ranked QUALIFY rank <= $k
       |)
       |SELECT grp, CAST(rank AS INT) AS rank, key,
       |       CASE WHEN n < $k THEN NULL
       |            ELSE round(${(k - 1).toDouble} /
       |                   ((hk + 1) / ${Int.MaxValue.toDouble + 1.0}) * 1e6) / 1e6
       |            END AS est
       |FROM cut""".stripMargin
  }

  /** DuckDB replay of [[temperatureResample]] over `table`: identical
    * sqrt-composed share, identical scale/rate arithmetic and operand
    * order, identical md5 keep-bucket decision.
    */
  def temperatureOracleSql(table: String, stratumCol: String,
                           keyCol: String, alphaQuarters: Int = 2,
                           buckets: Int = 10000,
                           selectCols: String = "*"): String = {
    val share = alphaQuarters match {
      case 1 => "sqrt(sqrt(p))"
      case 2 => "sqrt(p)"
      case _ => "sqrt(p) * sqrt(sqrt(p))"
    }
    s"""WITH counts AS (
       |  SELECT $stratumCol AS stratum, COUNT(*) AS cnt FROM $table GROUP BY 1
       |), tot AS (
       |  SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM counts
       |), w AS (
       |  SELECT stratum, cnt, $share AS share
       |  FROM (SELECT stratum, cnt, CAST(cnt AS DOUBLE) / tot AS p
       |        FROM counts, tot)
       |), s AS (
       |  SELECT MIN(cnt / share) AS scale FROM w
       |), rates AS (
       |  SELECT stratum, CAST(round(share * scale / cnt * $buckets) AS BIGINT)
       |           AS keep_buckets
       |  FROM w, s
       |)
       |SELECT $selectCols
       |FROM $table d JOIN rates r ON d.$stratumCol = r.stratum
       |WHERE CAST(('0x' || substr(md5(d.$stratumCol || ':' ||
       |        CAST(d.$keyCol AS VARCHAR)), 1, 8)) AS BIGINT) % $buckets
       |      < r.keep_buckets""".stripMargin
  }

  /** Per-group document cap: keep at most `n` rows of each group, chosen
    * in deterministic hash order (md5 of the key, key tie-break) — the
    * "no single domain exceeds N documents" guard, with a selection that
    * is a pure function of the data (reruns and engines agree), unlike a
    * head-of-partition take. One keyed window — partitions by group,
    * never global; a hot group costs one task sorting its own rows.
    */
  /** Deterministic train/validation/test split: add a `split` label from
    * the row's hash bucket, so membership is a pure function of the key —
    * the same document lands in the same split on every run, engine, and
    * partitioning, and a later incremental batch can NEVER leak a train
    * row into test (the property `randomSplit` does not have: its
    * assignment depends on partitioning and sampling seed state).
    * `splits` maps label → bucket share out of `buckets`
    * (e.g. Seq(("train", 98), ("val", 1), ("test", 1)) with buckets=100);
    * labels assign by cumulative range in the given order. Shares must sum
    * to `buckets`, so every row is labeled. Pure scan-side expression work
    * — no shuffle, no state; the md5 bucket is the DuckDB-replayable
    * oracle form ([[hashBucket]]), [[hashBucketXx]] the at-scale flavor.
    */
  def assignSplit(df: DataFrame, key: Column,
                  splits: Seq[(String, Int)], buckets: Int): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "assignSplit needs at least one (label, share) with positive shares")
    require(splits.map(_._2).sum == buckets,
      s"shares ${splits.map(_._2).mkString("+")} must sum to buckets=$buckets")
    val b = hashBucket(key.cast("string"), buckets)
    val bounds = splits.scanLeft(0)(_ + _._2).tail
    val label = splits.zip(bounds).tail.foldLeft(
      when(b < bounds.head, splits.head._1)) {
        case (acc, ((name, _), hi)) => acc.when(b < hi, name)
      }
    df.withColumn("split", label)
  }

  def capPerGroup(df: DataFrame, group: Column, key: Column, n: Int): DataFrame = {
    require(n >= 0, s"cap must be non-negative, got $n")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(group)
      .orderBy(md5(key.cast("string")), key)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= n)
      .drop("__graft_rn")
  }

  /** Poisson(1) inverse-CDF thresholds over the 20-bit md5 uniform, scaled
    * to the 2^20 lattice: weight w iff bucket < Thresholds(w), w = 7 in
    * the tail. Integer constants, so both engines binary-compare the SAME
    * values — shared with the bootstrap oracle builder.
    */
  val PoissonThresholds: Seq[Long] = {
    val cdf = Iterator.iterate((0, math.exp(-1.0))) { case (k, p) =>
      (k + 1, p / (k + 1)) }
      .take(7).map(_._2).scanLeft(0.0)(_ + _).drop(1)
    cdf.map(c => math.round(c * 1048576.0)).toSeq
  }

  /** Deterministic Poisson bootstrap — uncertainty bands on corpus
    * statistics with ZERO random state: replicate r draws each row's
    * weight w ~ Poisson(1) from the md5-lane uniform of `key || ':' || r`
    * (Efron's bootstrap in its streaming form — per-row independent
    * weights, no resampling pass), and each replicate reports the
    * weighted mean of `value`. Reruns, engines, and partitionings agree
    * exactly: weights are integer pure functions of (key, r), the
    * weighted sums ride longs, and only the final mean divides in
    * doubles (1e-6-quantized).
    *
    * Scale shape: one narrow ×replicates fan-out (a `sequence` explode —
    * no shuffle) into one map-side-combined aggregation on `replicates`
    * keys. Output: (replicate, n_eff, mean) — feed the replicate spread
    * to whatever interval you favor.
    */
  def poissonBootstrap(df: DataFrame, key: Column, value: Column,
                       replicates: Int = 32): DataFrame = {
    require(replicates >= 2 && replicates <= 4096,
      s"replicates must be in [2, 4096], got $replicates")
    val rows = df.select(key.cast("string").as("__k"),
        value.cast("long").as("__v"))
      .select(col("__k"), col("__v"),
        explode(sequence(lit(1), lit(replicates))).as("replicate"))
    val bucket = hashBucket(
      concat(col("__k"), lit(":"), col("replicate").cast("string")), 1048576)
    val w = PoissonThresholds.zipWithIndex.reverse
      .foldLeft(lit(7L)) { case (acc, (thr, wv)) =>
        when(bucket < thr, wv.toLong).otherwise(acc)
      }
    rows.withColumn("__w", w)
      .groupBy(col("replicate"))
      .agg(sum(col("__w")).as("n_eff"),
        sum(col("__w") * col("__v")).as("__ws"))
      .select(col("replicate"), col("n_eff"),
        when(col("n_eff") > 0,
          round(col("__ws").cast("double") / col("n_eff").cast("double")
            * 1e6) / 1e6).as("mean"))
  }
}
