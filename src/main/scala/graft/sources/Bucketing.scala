package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed tables for co-located joins (SURVEY.md §7.4 100 TB posture).
  *
  * A fact-fact join (orders × lineitem class) shuffles BOTH sides on the
  * key every time it runs. Writing each side bucketed (hash-partitioned
  * into a fixed bucket count) and sorted by the join key moves that
  * shuffle to write time, once: every subsequent join on the bucket key
  * compiles to a sort-merge join with NO Exchange on either side —
  * asserted in PlanShapeSpec. At 100 TB this turns the recurring
  * dominant-cost shuffle of a pipeline's hottest join into a one-time
  * layout decision, exactly like the reference's persisted key-table
  * pattern but for fact-scale relations.
  *
  * Bucket-count guidance: fixed per table pair (both sides MUST match for
  * co-location), sized so a bucket ≈ one task's worth of data at target
  * scale (e.g. 100 TB / 512 MB ≈ 200k buckets is too many files — prefer
  * 4–16k buckets and let each task read several row groups).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table registered in the
    * session catalog under `name`, with files at `path`.
    */
  def writeBucketed(df: DataFrame, name: String, path: String,
                    bucketCols: Seq[String], numBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(name)
}
