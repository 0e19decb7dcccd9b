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
    * bias is ≤ buckets/2^32). Engine-portable: DuckDB expresses the same
    * value as `CAST('0x' || substr(md5(key),1,8) AS BIGINT) % buckets`.
    */
  def hashBucket(key: Column, buckets: Int): Column = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    conv(substring(md5(key), 1, 8), 16, 10).cast("long") % buckets
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
}
