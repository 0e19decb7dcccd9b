package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Anonymize

/** Structured Streaming surface (SURVEY.md §2.8/§7.6 — no reference
  * counterpart; the reference's only cross-run state, the uid→pseudonym
  * key table, is exactly `foreachBatch` upsert semantics made continuous).
  *
  * Everything here is the same declarative plan the batch engine runs —
  * `hourlySums(stream)` is q17's aggregation with a watermark bolted on —
  * so the batch query IS the oracle: replaying a bounded event set through
  * the stream must equal the batch result, with late rows beyond the
  * watermark dropped (asserted in StreamingSpec).
  */
object StreamingEvents {

  /** Streaming form of q17: 1-hour tumbling windows of cent-quantized
    * value sums over `events(ts, value)`, late data beyond `watermark`
    * dropped. State per key is one partial sum — bounded by the number of
    * open windows, which the watermark caps; at 100 TB/day this scales by
    * shuffle partitions, not data volume.
    */
  def hourlySums(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg((sum(round(col("value") * 100)) / 100.0).as("sum_value"))
      .select(col("window").getField("start").as("window_start"), col("sum_value"))

  /** Streaming exact dedup: drop events whose `idCols` key was already
    * seen within the watermark horizon. State is bounded BY the watermark
    * (expired keys are evicted), which is what makes exact dedup viable on
    * an unbounded stream — the batch analog is `dropDuplicates`, the
    * horizon is the price of bounded state.
    */
  def dedupStream(events: DataFrame, idCols: Seq[String],
                  watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** Continuous uid pseudonymization: every micro-batch runs the batch
    * key-table upsert (J2/S6 — broadcast join + anti-join + blake2b +
    * crash-safe swap) via `foreachBatch`, writing the pseudonymized rows
    * as snappy parquet. Pseudonyms stay stable across batches AND across
    * stream restarts because the key table is the same persistent one the
    * batch pipeline maintains.
    *
    * foreachBatch is AT-LEAST-ONCE: after a crash between the write and
    * the checkpoint commit, the same epoch replays. The write is therefore
    * keyed by batchId — each epoch OVERWRITES its own `batch_id=N`
    * partition, so a replay is idempotent instead of duplicating rows.
    * (The key-table upsert is naturally idempotent: replayed uids anti-join
    * to nothing.) Readers see `batch_id` as an ordinary partition column.
    *
    * Layout contract: `outDir` must be dedicated to this sink (start it
    * empty). Parquet files at the directory root alongside the
    * `batch_id=N` partitions would make reads fail with conflicting
    * directory structures.
    */
  def pseudonymizeStream(stream: DataFrame, column: String, keyDir: String,
                         outDir: String, checkpointDir: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Anonymize.uidAnonymization(batch.sparkSession, batch, column, keyDir)
          .write.mode("overwrite").option("compression", "snappy")
          .parquet(s"$outDir/batch_id=$batchId")
      }
      .start()
}
