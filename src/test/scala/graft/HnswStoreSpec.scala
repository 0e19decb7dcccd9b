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
    val shardRange = s2.segments.select("shard").as[Long].collect()
    assert(shardRange.forall(s =>
      s >= 2L * HnswStore.ShardStride && s < 3L * HnswStore.ShardStride))
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

  test("a re-sent vec_id never admits into a second segment, even when " +
       "its embedding drifted below the cosine threshold") {
    val dir = tmp("hnswstore-resend")
    val s0 = HnswStore.build(spark,
      vecsDf(1L -> Array(1f, 0f, 0f), 2L -> Array(0f, 1f, 0f)), dir,
      shards = 2)
    // id 1 re-sent with an orthogonal (fully drifted) embedding: the
    // threshold arm alone would admit it — the disjointness arm must not
    val batch = vecsDf(1L -> Array(0f, 0f, 1f), 3L -> Array(0.5f, 0.5f, 0.7f))
    val (kept, s1) = HnswStore.admit(spark, s0, batch, threshold = 0.9)
    assert(kept.select("vec_id").as[Long].collect().toSet === Set(3L),
      "the drifted re-sent id must be dropped; the novel id kept")
    val ids = s1.segments.groupBy("vec_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ids === Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      "every id exactly once across segments")
    // the contract this protects: compaction re-runs Hnsw.build over the
    // union, whose requireUniqueIds would crash on a duplicated id —
    // and in the streaming sink every replay of that batch would crash
    // identically, wedging the stream
    val s2 = HnswStore.compact(spark, s1)
    assert(s2.segments.select("vec_id").as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L, 3L))
    graft.CacheRegistry.releaseAll()
  }

  test("corpus-sized admission batches fail loudly before any driver " +
       "collect (the MaxJwKeyLen discipline)") {
    import org.apache.spark.sql.functions._
    val dir = tmp("hnswstore-guard")
    val s0 = HnswStore.build(spark, vecsDf(1L -> Array(1f, 0f)), dir,
      shards = 1)
    val big = spark.range(2, HnswStore.MaxAdmitBatchRows + 3L)
      .select(col("id").as("vec_id"),
        array(lit(1.0f), lit(0.0f)).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      HnswStore.incrementalAdmit(s0, big, threshold = 0.9).collect()
    }
    assert(e.getMessage.contains("exceeds"), e.getMessage)
    graft.CacheRegistry.releaseAll()
  }

  test("epochs beyond the old 32k int-stride ceiling write, load, and " +
       "search (long shard ids — an 11-day 30s-trigger stream survives)") {
    val dir = tmp("hnswstore-epoch")
    HnswStore.build(spark,
      vecsDf(1L -> Array(1f, 0f, 0f), 2L -> Array(0f, 1f, 0f)), dir,
      shards = 2)
    val farEpoch = 40000L // > Int.MaxValue / ShardStride ≈ 32767
    HnswStore.writeEpoch(spark, dir, vecsDf(10L -> Array(0f, 0f, 1f)),
      farEpoch, shards = 1, m = 8, efConstruction = 64, isBase = false)
    val st = HnswStore.loadAt(spark, dir, farEpoch)
    val shards = st.segments.select("shard").as[Long].collect()
    assert(shards.exists(s => s >= farEpoch * HnswStore.ShardStride),
      s"strided long shard ids expected, got ${shards.mkString(",")}")
    assert(HnswStore.neighbors(st, Array(0.0, 0.0, 1.0), 1)
      .select("vec_id").as[Long].head() === 10L)
  }

  test("delete: a tombstone epoch masks the vectors from every surface, " +
       "compaction physically removes them (bitwise the never-saw " +
       "rebuild), re-admission revives the id, and unknown ids are a " +
       "committed no-op") {
    val dir = tmp("hnswstore-del")
    val rows = (1L to 40L).map(id =>
      id -> Array(math.sin(id * 0.7).toFloat, math.cos(id * 1.3).toFloat,
        math.sin(id * 2.1).toFloat))
    val s0 = HnswStore.build(spark, rows.toDF("vec_id", "embedding"), dir,
      shards = 3)
    val erased = rows.map(_._1).filter(_ % 4 == 1).toSet
    val s1 = HnswStore.delete(spark, s0, erased.toSeq.toDF("vec_id"))
    assert(s1.epoch === 1L)
    assert(s1.segments.filter(col("vec_id") % 4 === 1).count() === 0L)
    val got = HnswStore.neighbors(s1,
        rows.head._2.map(_.toDouble), 40, efSearch = 48)
      .select("vec_id").as[Long].collect().toSet
    assert(got.nonEmpty && got.intersect(erased).isEmpty,
      "search must never return a deleted id")
    // admission: the erased id is free again
    val kept = HnswStore.incrementalAdmit(s1,
      vecsDf(1L -> rows.head._2), threshold = 0.999999)
    assert(kept.select("vec_id").as[Long].collect().toSet === Set(1L))
    CacheRegistry.releaseAll()
    // compaction physically removes the rows — bitwise the compaction of
    // a store that never saw them (same sizing path on both sides)
    val s2 = HnswStore.compact(spark, s1)
    def dump(df: org.apache.spark.sql.DataFrame, e: Long) =
      df.withColumn("shard",
          col("shard") - lit(e * HnswStore.ShardStride.toLong))
        .collect().map(_.toString).sorted.toSeq
    val never = HnswStore.compact(spark, HnswStore.build(spark,
      rows.filterNot(r => erased(r._1)).toDF("vec_id", "embedding"),
      tmp("hnswstore-delB"), shards = 3))
    assert(dump(s2.segments, 2L) === dump(never.segments, 1L),
      "post-delete compaction must equal the never-saw rebuild")
    val raw = spark.read.parquet(s"$dir/segments/epoch=${s2.epoch}")
    assert(raw.filter(col("vec_id") % 4 === 1).count() === 0L)
    // vacuum reclaims the superseded tombstones; unknown ids no-op
    HnswStore.vacuum(spark, s2)
    assert(!new java.io.File(s"$dir/tombstones/epoch=1").exists())
    val noop = HnswStore.delete(spark, s2, Seq(9999L).toDF("vec_id"))
    assert(noop.epoch === 3L &&
      noop.segments.count() === s2.segments.count())
    // re-admission round-trip: append the erased id back — its new row
    // survives the old (vacuumed or not) tombstone and serves again
    val back = HnswStore.append(spark, noop, vecsDf(5L -> rows(4)._2))
    assert(back.segments.filter(col("vec_id") === 5L).count() === 1L)
    assert(HnswStore.neighbors(back, rows(4)._2.map(_.toDouble), 1)
      .select("vec_id").as[Long].head() === 5L)
    CacheRegistry.releaseAll()
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
