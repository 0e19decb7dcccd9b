package graft

import org.apache.spark.sql.functions._
import graft.operators.{Hnsw, HnswGeoStore, IVF}

/** The hot-cell bound ([[Hnsw.GeoLayout]]): geometry sharding inherits
  * the corpus's cluster skew — 100 TB corpora are clustered, that is WHY
  * routing works — so one hot cell was the one unbounded per-task term
  * in the routed path. `maxCellNodes` splits cells past the cap into
  * id-hash sub-shards under the same centroid; these specs pin that the
  * split is (a) real (max task-graph size bounded where the unsplit
  * build holds one giant shard), (b) ORACLE-INVISIBLE (routed pairs,
  * serving, admission, deletion, compaction all value-identical to the
  * unsplit store), and (c) frozen with the store exactly like the index
  * (persisted layout, id-deterministic sub assignment, the monotone-id
  * compaction≡rebuild theorem intact).
  */
class HotCellSpec extends SparkSpec {
  import spark.implicits._

  // planted-skew corpus: `hot` vectors jitter tightly around one point
  // (one IVF cell swallows them all), `cold` vectors spread isotropically
  private def skewed(hot: Int, cold: Int): Seq[(Long, Seq[Float])] = {
    val hotRows = (1L to hot.toLong).map { id =>
      val v = (0 until 16).map { d =>
        val base = if (d == 0) 10f else 0.5f
        val h = (id * 1315423911L + d * 2654435761L) ^ (id >> 3)
        base + ((h % 201L).toFloat - 100f) / 1000f
      }
      (id, v)
    }
    val coldRows = (1L to cold.toLong).map { i =>
      val id = hot.toLong + i
      val v = (0 until 16).map { d =>
        val h = (id * 2654435761L + d * 1315423911L) ^ (id >> 2)
        ((h % 2001L).toFloat - 1000f) / 100f
      }
      (id, v)
    }
    hotRows ++ coldRows
  }

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/store"

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def maxShardRows(store: org.apache.spark.sql.DataFrame): Long =
    store.groupBy("shard").count().agg(max("count")).head().getLong(0)

  test("buildGeo maxCellNodes bounds the max per-task graph by " +
       "construction while the routed pair scan stays value-identical " +
       "to the unsplit store") {
    val rows = skewed(hot = 300, cold = 200)
    val emb = rows.toDF("vec_id", "embedding")
    val index = IVF.train(emb, k = 6, iters = 3)
    val flat = Hnsw.buildGeo(emb, index)
    val capped = Hnsw.buildGeo(emb, index, maxCellNodes = 80)
    // the unsplit build holds the whole hot cluster in ONE task graph;
    // the capped build's largest shard obeys the cap (id-hash split:
    // ceil(n/cap) sub-shards, so each holds ~cap with hash variance)
    val flatMax = maxShardRows(flat)
    val cappedMax = maxShardRows(capped)
    assert(flatMax >= 300L,
      s"skew plant failed: unsplit max shard $flatMax < 300")
    assert(cappedMax <= 120L,
      s"capped max shard $cappedMax exceeds the cap envelope (80 × 1.5)")
    // layout round-trips from the store's own shard ids, and the cell
    // is recoverable as shard % k for every row
    val layout = Hnsw.layoutOfStore(capped, index)
    assert(layout.nonEmpty && layout.values.max >= 3,
      s"expected a >=3-way split of the hot cell, got $layout")
    val badCell = capped
      .filter(IVF.assignExpr(col("vec"), index).cast("long") =!=
        pmod(col("shard"), lit(index.k.toLong)))
      .count()
    assert(badCell === 0L, "cell must be recoverable as shard % k")
    // ORACLE-INVISIBILITY: with nProbe >= k the routing is exhaustive,
    // and the sub fan sends every probe to all of its cell's sub-shards,
    // so the exact-rescored pair set must match the unsplit route's
    val a = pairSet(Hnsw.nearDupPairsRouted(flat, index, 0.9,
      nProbe = 8, efSearch = 512))
    val b = pairSet(Hnsw.nearDupPairsRouted(capped, index, 0.9,
      nProbe = 8, efSearch = 512))
    assert(a === b, "capped routed pairs must equal the unsplit route's")
    assert(a.nonEmpty, "skew plant produced no near-dup pairs to compare")
    CacheRegistry.releaseAll()
  }

  test("segmented store lifecycle under the cap: persisted layout, " +
       "bounded delta epochs, serving parity, and the compaction " +
       "theorem under the frozen layout") {
    val base = skewed(hot = 240, cold = 120)
    val emb = base.toDF("vec_id", "embedding")
    val index = IVF.train(emb, k = 6, iters = 3)
    val dirCap = tmp("hotcell-cap")
    val dirFlat = tmp("hotcell-flat")
    var capped = HnswGeoStore.build(spark, emb, dirCap, index,
      maxCellNodes = 64)
    val flat0 = HnswGeoStore.build(spark, emb, dirFlat, index)
    // the layout is persisted with the base and survives a reload
    assert(capped.maxCellNodes === 64 && capped.layout.nonEmpty,
      s"layout not loaded: cap=${capped.maxCellNodes} " +
        s"layout=${capped.layout}")
    assert(HnswGeoStore.load(spark, dirCap).layout === capped.layout)
    assert(maxShardRows(capped.segments) <= 96L)
    // monotone-id batch (every fresh id above every stored id — the
    // addGeo bitwise regime): delta epochs assign under the FROZEN layout
    val b1 = skewed(hot = 40, cold = 20).map { case (id, v) =>
      (id + 360L, v) }
    val b1df = b1.toDF("vec_id", "embedding")
    capped = HnswGeoStore.append(spark, capped, b1df)
    val flat1 = HnswGeoStore.append(spark, flat0, b1df)
    // serving parity: efSearch past every graph size makes both routes
    // exhaustive within the probed cells, so values must agree
    val probes = skewed(hot = 4, cold = 2).map { case (id, v) =>
      (id + 9000L, v.map(_.toDouble)) }.toDF("probe_id", "embedding")
    def serve(st: HnswGeoStore.Store) =
      HnswGeoStore.batchNeighbors(st, probes, k = 5, efSearch = 512,
          nProbe = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
    assert(serve(capped) === serve(flat1),
      "capped serving must be value-identical to the unsplit store")
    // the compaction theorem under the frozen layout: compact ≡ the
    // from-scratch capped build over the union (monotone ids), bitwise
    capped = HnswGeoStore.compact(spark, capped)
    assert(capped.layout ===
      HnswGeoStore.load(spark, dirCap).layout,
      "compaction must carry the layout forward unchanged")
    val union = (base ++ b1).toDF("vec_id", "embedding")
    val rebuilt = Hnsw.buildGeoWithLayout(
      union.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding")),
      index, 8, 64, capped.layout)
    def dump(df: org.apache.spark.sql.DataFrame, unstride: Boolean) = {
      val shardCol =
        if (unstride) pmod(col("shard"), lit(HnswGeoStore.CellStride))
        else col("shard")
      df.select(shardCol.as("s"), col("vec_id"), col("vec"),
          col("level"), col("nbrs"))
        .orderBy("s", "vec_id").collect().map(_.toString).toSeq
    }
    assert(dump(capped.segments, unstride = true) ===
      dump(rebuilt, unstride = false),
      "compacted capped store must be bitwise the frozen-layout rebuild")
    CacheRegistry.releaseAll()
  }

  test("deletion + compaction on a capped store equals the capped store " +
       "that never saw the erased docs (value identity), and admission " +
       "drops the same duplicates as the unsplit store") {
    val base = skewed(hot = 240, cold = 120)
    val emb = base.toDF("vec_id", "embedding")
    val index = IVF.train(emb, k = 6, iters = 3)
    val dirA = tmp("hotcell-del-a")
    val dirB = tmp("hotcell-del-b")
    var a = HnswGeoStore.build(spark, emb, dirA, index, maxCellNodes = 64)
    // erase a slice of the hot cluster (ids 11..30) → compact
    val erased = (11L to 30L).toSeq
    a = HnswGeoStore.delete(spark, a,
      erased.toDF("vec_id"))
    a = HnswGeoStore.compact(spark, a)
    // the counterfactual store: same index, same cap policy applied to
    // the SAME frozen layout (erasure must not re-derive the layout —
    // it is frozen like the index)
    val survivors = base.filterNot { case (id, _) => erased.contains(id) }
    val b = Hnsw.buildGeoWithLayout(
      survivors.toDF("vec_id", "embedding")
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding")),
      index, 8, 64, a.layout)
    val gotPairs = pairSet(HnswGeoStore.nearDupPairs(a, 0.9,
      nProbe = 8, efSearch = 512))
    val wantPairs = pairSet(Hnsw.nearDupPairsRouted(b, index, 0.9,
      nProbe = 8, efSearch = 512))
    assert(gotPairs === wantPairs,
      "post-erasure capped store must serve exactly the " +
        "never-saw-the-docs pairs")
    assert(!gotPairs.exists { case (i, j, _) =>
      erased.contains(i) || erased.contains(j) },
      "erased ids must not appear in any pair")
    // admission parity: the routed admission filter drops the same
    // batch rows as an unsplit store of the same corpus
    val flat = HnswGeoStore.build(spark, survivors.toDF(
      "vec_id", "embedding"), dirB, index)
    // hot-style batch rows collide with the standing hot cluster (cos
    // ~0.999, dropped); cold-style rows are isotropic strangers (kept)
    val batch = skewed(hot = 20, cold = 10)
      .map { case (id, v) => (id + 5000L, v) }
      .toDF("vec_id", "embedding")
    val keptCapped = HnswGeoStore.incrementalAdmit(a, batch, 0.95,
        efSearch = 512, nProbe = 8)
      .select("vec_id").as[Long].collect().toSet
    val keptFlat = HnswGeoStore.incrementalAdmit(flat, batch, 0.95,
        efSearch = 512, nProbe = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(keptCapped === keptFlat,
      "capped admission must keep exactly the unsplit store's survivors")
    CacheRegistry.releaseAll()
  }

  test("a hot cell formed ONLY through appends onto a cold-built store " +
       "is re-split at compaction: the cap holds post-compaction, the " +
       "grown layout persists, and the served surface stays " +
       "value-identical (round-17 verdict #1)") {
    // cold-only base: no cell is hot at build time, so the frozen
    // layout is EMPTY — the exact configuration where admission skew
    // aligned with a frozen centroid used to outrun the cap unboundedly
    val base = skewed(hot = 0, cold = 150)
    val emb = base.toDF("vec_id", "embedding")
    val index = IVF.train(emb, k = 6, iters = 3)
    val dir = tmp("hotcell-admit")
    var st = HnswGeoStore.build(spark, emb, dir, index, maxCellNodes = 64)
    assert(st.layout.isEmpty && st.maxCellNodes === 64,
      s"cold build must carry the cap with an empty layout, got " +
        s"${st.layout}")
    // monotone-id hot batches: every vector clusters at the same point,
    // so ONE frozen cell accretes all 300 across two delta epochs
    val hot = skewed(hot = 300, cold = 0)
    val (h1, h2) = hot.splitAt(150)
    st = HnswGeoStore.append(spark, st,
      h1.map { case (id, v) => (id + 1000L, v) }.toDF("vec_id", "embedding"))
    st = HnswGeoStore.append(spark, st,
      h2.map { case (id, v) => (id + 1000L, v) }.toDF("vec_id", "embedding"))
    // compaction re-splits exactly the over-cap cell and persists the
    // grown layout with the new base
    st = HnswGeoStore.compact(spark, st)
    assert(st.layout.nonEmpty && st.layout.values.max >= 5,
      s"admission-grown hot cell must be split at compaction " +
        s"(300/64 → 5 sub-shards), got ${st.layout}")
    assert(HnswGeoStore.load(spark, dir).layout === st.layout,
      "the grown layout must persist with the compacted base")
    val postMax = maxShardRows(st.segments)
    assert(postMax <= 96L,
      s"post-compaction max task nodes $postMax exceed the cap " +
        "envelope (64 × 1.5) — the re-split did not bound the hot cell")
    // the compaction ≡ rebuild theorem carried to the re-split arm:
    // monotone ids, so the compacted store is bitwise the from-scratch
    // frozen-layout build over the full corpus under the GROWN layout
    val union = (base ++ hot.map { case (id, v) => (id + 1000L, v) })
      .toDF("vec_id", "embedding")
    val rebuilt = Hnsw.buildGeoWithLayout(
      union.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding")),
      index, 8, 64, st.layout)
    def dump(df: org.apache.spark.sql.DataFrame, unstride: Boolean) = {
      val shardCol =
        if (unstride) pmod(col("shard"), lit(HnswGeoStore.CellStride))
        else col("shard")
      df.select(shardCol.as("s"), col("vec_id"), col("vec"),
          col("level"), col("nbrs"))
        .orderBy("s", "vec_id").collect().map(_.toString).toSeq
    }
    assert(dump(st.segments, unstride = true) ===
      dump(rebuilt, unstride = false),
      "compacted store must be bitwise the grown-layout rebuild")
    // oracle-invisibility: the re-split store's exhaustive-fan pair set
    // equals an UNSPLIT store's over the same corpus
    val flat = Hnsw.buildGeo(
      union.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding")), index)
    val a = pairSet(HnswGeoStore.nearDupPairs(st, 0.9,
      nProbe = 6, efSearch = 512))
    val b = pairSet(Hnsw.nearDupPairsRouted(flat, index, 0.9,
      nProbe = 6, efSearch = 512))
    assert(a === b && a.nonEmpty,
      "re-split store must serve exactly the unsplit store's pairs")
    CacheRegistry.releaseAll()
  }

  test("a retrain re-derives the layout under the new cells with the " +
       "carried cap, and the rebuilt store stays bounded") {
    val base = skewed(hot = 200, cold = 100)
    val emb = base.toDF("vec_id", "embedding")
    val index = IVF.train(emb, k = 6, iters = 3)
    val dir = tmp("hotcell-retrain")
    val store = HnswGeoStore.build(spark, emb, dir, index,
      maxCellNodes = 48)
    // driftFactor below 1 forces the retrain arm regardless of measured
    // drift — the lifecycle path under test, not the trigger
    val (retrained, report) = HnswGeoStore.retrainIfDrifted(spark, store,
      driftFactor = 1e-9, iters = 3)
    assert(report.retrained, "retrain must fire at driftFactor ~ 0")
    assert(retrained.maxCellNodes === 48,
      "the cap is policy and must survive the retrain")
    assert(retrained.layout.nonEmpty,
      "the hot cluster must still split under the retrained cells")
    assert(maxShardRows(retrained.segments) <= 72L,
      "retrained store must stay bounded by the carried cap")
    // the persisted layout matches the loaded handle's
    assert(HnswGeoStore.load(spark, dir).layout === retrained.layout)
    CacheRegistry.releaseAll()
  }
}
