package graft

import org.apache.spark.sql.functions._
import graft.operators.{Hnsw, HnswStore}

/** Segmented HNSW store: epoch/segment lifecycle, as-of reads, the
  * admission filter's three arms, compaction + vacuum, and replay
  * idempotence.
  */
class HnswStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/store"

  private def vecsDf(rows: (Long, Array[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("append lands a searchable segment; loadAt pins the pre-state") {
    val dir = tmp("hnswstore-seg")
    val s0 = HnswStore.build(spark,
      vecsDf(1L -> Array(1f, 0f, 0f), 2L -> Array(0f, 1f, 0f)), dir,
      shards = 2)
    val s1 = HnswStore.append(spark, s0,
      vecsDf(10L -> Array(0f, 0f, 1f)))
    assert(s1.epoch === 1L)
    val got = HnswStore.neighbors(s1, Array(0.0, 0.0, 1.0), 1)
      .select("vec_id").as[Long].head()
    assert(got === 10L, "the appended segment must be searchable")
    val asOf0 = HnswStore.loadAt(spark, dir, 0L)
    val ids0 = asOf0.segments.select("vec_id").as[Long].collect().toSet
    assert(ids0 === Set(1L, 2L), "as-of epoch 0 must not see the segment")
  }

  test("admission arms: store near-dup dropped via graph search, " +
       "in-batch near-dup collapses to the smaller id, novel kept") {
    val dir = tmp("hnswstore-admit")
    val s0 = HnswStore.build(spark,
      vecsDf(1L -> Array(1f, 0f, 0f, 0f), 2L -> Array(0f, 1f, 0f, 0f)),
      dir, shards = 2)
    val batch = vecsDf(
      10L -> Array(0.98f, 0.1f, 0f, 0f), // cos ≈ 0.995 vs stored 1
      11L -> Array(0f, 0f, 1f, 0f),      // novel
      12L -> Array(0f, 0f, 0.99f, 0.1f)) // cos ≈ 0.995 vs batch peer 11
    val (kept, s1) = HnswStore.admit(spark, s0, batch, threshold = 0.9)
    val ids = kept.select("vec_id").as[Long].collect().toSet
    assert(ids === Set(11L),
      "store dup and larger-id batch dup must drop; novel stays")
    assert(s1.segments.select("vec_id").as[Long].collect().toSet ===
      Set(1L, 2L, 11L))
    graft.CacheRegistry.releaseAll()
  }

  test("compaction rebuilds the union as one base; vacuum reclaims " +
       "superseded segments and stale as-of reads fail fast") {
    val dir = tmp("hnswstore-compact")
    val s0 = HnswStore.build(spark,
      vecsDf(1L -> Array(1f, 0f, 0f), 2L -> Array(0f, 1f, 0f)), dir,
      shards = 2)
    val s1 = HnswStore.append(spark, s0, vecsDf(10L -> Array(0f, 0f, 1f)))
    val s2 = HnswStore.compact(spark, s1)
    assert(s2.segments.select("vec_id").as[Long].collect().toSet ===
      Set(1L, 2L, 10L), "compaction must preserve the vector set")
    // one base segment now: every shard id sits in epoch 2's stride range
    val shardRange = s2.segments.select("shard").as[Int].collect()
    assert(shardRange.forall(s =>
      s >= 2 * HnswStore.ShardStride && s < 3 * HnswStore.ShardStride))
    val got = HnswStore.neighbors(s2, Array(0.0, 0.0, 1.0), 1)
      .select("vec_id").as[Long].head()
    assert(got === 10L)
    HnswStore.vacuum(spark, s2)
    intercept[IllegalArgumentException] {
      HnswStore.loadAt(spark, dir, 0L)
    }
  }

  test("replay idempotence: re-admitting the same batch against the " +
       "same as-of state rewrites the identical segment") {
    val dir = tmp("hnswstore-replay")
    val s0 = HnswStore.build(spark,
      vecsDf(1L -> Array(1f, 0f, 0f)), dir, shards = 1)
    val batch = vecsDf(10L -> Array(0f, 1f, 0f), 11L -> Array(0f, 0f, 1f))
    def dump() = HnswStore.load(spark, dir).segments
      .collect().map(_.toString).sorted.toSeq
    HnswStore.admit(spark, HnswStore.loadAt(spark, dir, 0L), batch, 0.9)
    graft.CacheRegistry.releaseAll()
    val first = dump()
    // at-least-once replay: same pre-state, same batch, same epoch
    HnswStore.admit(spark, HnswStore.loadAt(spark, dir, 0L), batch, 0.9)
    graft.CacheRegistry.releaseAll()
    assert(dump() === first, "replayed epoch must be bitwise identical")
    assert(HnswStore.load(spark, dir).epoch === 1L)
  }

  test("batchNeighborMax: best stored cosine per probe, one pass") {
    val store = Hnsw.build(
      vecsDf(1L -> Array(1f, 0f), 2L -> Array(0f, 1f)), shards = 2)
    val got = Hnsw.batchNeighborMax(store,
        Array(100L -> Array(1.0, 0.0), 101L -> Array(0.6, 0.8)))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(100L) === 1.0)
    assert(got(101L) === 0.8, "cos vs the closer stored axis (0,1)")
  }
}
