package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — probe rows matched to every interval row whose
  * `[start, end)` contains the probe's timestamp, with optional equi-keys.
  *
  * Spark plans the naive `ts >= start && ts < end` predicate as a
  * broadcast-nested-loop join whenever there is no equality condition —
  * O(probes × intervals) evaluated row-by-row, the classic scale killer.
  * The bucketized shape stays an equi-join regardless:
  *
  *  1. explode each interval to the ids of the fixed-width time buckets it
  *     covers (an interval of length L duplicates into ~L/width + 1 rows —
  *     pick `bucketSeconds` near the typical interval length so that's a
  *     small constant);
  *  2. each probe computes its single bucket id;
  *  3. shuffle-equi-join on (keys..., bucket) — a probe only ever meets
  *     interval copies in its own bucket, so no dedup is needed — and
  *     apply the exact containment filter after the match.
  *
  * PlanShapeSpec asserts the keyless case plans no nested-loop join.
  * Empty or inverted intervals (`end <= start`) match nothing (and must be
  * dropped before bucket explosion — Spark's `sequence(a, b)` DESCENDS
  * when a > b, which would silently fabricate buckets).
  *
  * Probe and interval frames must not share non-key column names.
  */
object RangeJoin {

  def intervalJoin(probes: DataFrame, intervals: DataFrame,
                   keys: Seq[String] = Seq.empty,
                   probeTs: String = "ts",
                   start: String = "win_start", end: String = "win_end",
                   bucketSeconds: Long = 3600L): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val overlap = probes.columns.toSet.intersect(intervals.columns.toSet) -- keys.toSet
    require(overlap.isEmpty,
      s"probe/interval column collision beyond the keys: ${overlap.mkString(", ")}")
    require(!(probes.columns ++ intervals.columns).contains("__b"),
      "range join reserves the __b bucket column — rename it before joining")
    val w = bucketSeconds * 1000000L
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(unix_micros(c.cast("timestamp")) / w)
    val iv = intervals
      .filter(col(end) > col(start))
      .withColumn("__b", explode(sequence(
        bucketOf(col(start)),
        // end is EXCLUSIVE: the last covered bucket holds end - 1µs
        bucketOf(col(end) - expr("INTERVAL 0.000001 SECONDS")))))
    val p = probes.withColumn("__b", bucketOf(col(probeTs)))
    p.join(iv, keys :+ "__b")
      .filter(col(probeTs) >= col(start) && col(probeTs) < col(end))
      .drop("__b")
  }
}
