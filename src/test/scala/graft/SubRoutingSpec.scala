package graft

import org.apache.spark.sql.functions._
import graft.operators.{Hnsw, HnswGeoStore, IVF}

/** WITHIN-CELL probe routing ([[Hnsw.SubRouting]] — round-17 verdict
  * #2): the hot cell's COMPUTE bound. [[Hnsw.GeoLayout]] bounds a hot
  * cell's per-task MEMORY by id-hash splitting, but a probe still fans
  * to every sub-shard, so per-probe work stays linear in the cell's
  * population. A subRouted store trains a frozen mini-IVF inside each
  * over-cap cell; probes route to their `nProbeSub` nearest sub-cells
  * and fan only to THOSE sub-cells' id-hash slots. These specs pin:
  * (a) the memory bound still holds by construction (the id-hash
  * re-cap backstops k-means imbalance), (b) `nProbeSub = 0` is the
  * exhaustive fan — value-identical to the pure-hash capped store AND
  * the unsplit store (the oracle route q206 rides), (c) routing
  * genuinely prunes the fan while keeping planted-twin recall (twins
  * co-locate under the frozen sub-assignment), and (d) the routing is
  * frozen with the store through the lifecycle: persisted/reloaded,
  * honored by appends, re-derived at compaction for admission-grown
  * cells and at retrain.
  */
class SubRoutingSpec extends SparkSpec {
  import spark.implicits._

  /** Structured hot cell: `subs` well-separated tight clouds sharing
    * one region (dim0 = 10, so the corpus-level k-means folds them
    * into ONE cell), each point paired with a TWIN at distance ~1e-3
    * (ids base and base + twinStride). Cold vectors spread
    * isotropically as in HotCellSpec.
    */
  private val TwinStride = 100000L

  private def structured(subs: Int, perSub: Int,
                         cold: Int): Seq[(Long, Seq[Float])] = {
    val hot = (0 until subs).flatMap { s =>
      (0 until perSub).flatMap { i =>
        val id = (s * perSub + i + 1).toLong
        val v = (0 until 16).map { d =>
          val base =
            if (d == 0) 10f
            else if (d == 1) 2f * (s % 2) - 1f
            else if (d == 2) 2f * (s / 2) - 1f
            else 0.5f
          val h = (id * 1315423911L + d * 2654435761L) ^ (id >> 3)
          base + ((h % 41L).toFloat - 20f) / 1000f
        }
        val twin = v.updated(3, v(3) + 0.001f)
        Seq((id, v), (id + TwinStride, twin))
      }
    }
    val coldRows = (1 to cold).map { i =>
      val id = 50000L + i
      val v = (0 until 16).map { d =>
        val h = (id * 2654435761L + d * 1315423911L) ^ (id >> 2)
        ((h % 2001L).toFloat - 1000f) / 100f
      }
      (id, v)
    }
    hot ++ coldRows
  }

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/store"

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def maxShardRows(store: org.apache.spark.sql.DataFrame): Long =
    store.groupBy("shard").count().agg(max("count")).head().getLong(0)

  test("subRouted build: the memory bound holds by construction, the " +
       "mini-IVF persists and reloads, and the exhaustive fan is " +
       "value-identical to both the pure-hash capped store and the " +
       "unsplit store") {
    val rows = structured(subs = 4, perSub = 60, cold = 120)
    val emb = rows.toDF("vec_id", "embedding")
    // train on the COLD slice only (the HotCellSpec plant discipline:
    // Lloyd over the full corpus dilutes the plant by dropping
    // centroids inside it) — every hot vector then assigns to ONE
    // frozen cold cell, the admission-skew shape under test
    val index = IVF.train(
      rows.filter(_._1 >= 50000L).toDF("vec_id", "embedding"),
      k = 6, iters = 3)
    val dirR = tmp("subroute-r")
    val dirH = tmp("subroute-h")
    val r = HnswGeoStore.build(spark, emb, dirR, index,
      maxCellNodes = 64, subRouted = true)
    val h = HnswGeoStore.build(spark, emb, dirH, index, maxCellNodes = 64)
    assert(r.subRouted && r.routing.nonEmpty,
      s"structured hot cell must carry a mini-IVF, got ${r.routing.keys}")
    // slot-count consistency: the layout's n_sub IS the routing's slot
    // total for every routed cell
    r.routing.foreach { case (c, sr) =>
      assert(r.layout(c) === sr.slots,
        s"cell $c: layout n_sub ${r.layout(c)} != routing slots " +
          s"${sr.slots}")
      assert(sr.centroids.length >= 2,
        s"cell $c: an over-cap cell must train >= 2 sub-centroids, " +
          s"got ${sr.centroids.length}")
    }
    // the planted structure is spread over few frozen cells; across
    // them the mini-IVFs must resolve at least the 4 planted sub-clouds
    assert(r.routing.valuesIterator.map(_.centroids.length).sum >= 4,
      s"mini-IVFs too coarse for the planted structure: " +
        s"${r.routing.map { case (c, sr) => c -> sr.centroids.length }}")
    // memory bound: the id-hash re-cap backstops k-means imbalance
    assert(maxShardRows(r.segments) <= 96L,
      s"routed store max shard ${maxShardRows(r.segments)} exceeds " +
        "the cap envelope (64 × 1.5)")
    // the frozen mini-IVF survives a reload bitwise
    val reloaded = HnswGeoStore.load(spark, dirR)
    assert(reloaded.subRouted && reloaded.layout === r.layout)
    r.routing.foreach { case (c, sr) =>
      val lr = reloaded.routing(c)
      assert(lr.split.toSeq === sr.split.toSeq &&
        lr.centroids.map(_.toSeq).toSeq === sr.centroids.map(_.toSeq).toSeq,
        s"cell $c routing must round-trip through the layout relation")
    }
    // ORACLE ROUTE: at the default nProbeSub = 0 the fan is exhaustive,
    // so routed ≡ pure-hash ≡ unsplit pair values (q206's argument)
    val flat = Hnsw.buildGeo(
      emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding")), index)
    val pr = pairSet(HnswGeoStore.nearDupPairs(r, 0.9,
      nProbe = 6, efSearch = 512))
    val ph = pairSet(HnswGeoStore.nearDupPairs(h, 0.9,
      nProbe = 6, efSearch = 512))
    val pf = pairSet(Hnsw.nearDupPairsRouted(flat, index, 0.9,
      nProbe = 6, efSearch = 512))
    assert(pr === ph, "routed exhaustive fan must equal pure-hash store")
    assert(pr === pf, "routed exhaustive fan must equal unsplit store")
    assert(pr.nonEmpty, "structured plant produced no pairs")
    CacheRegistry.releaseAll()
  }

  test("nProbeSub routes: the probe fan genuinely shrinks and every " +
       "planted twin is still found (co-location under the frozen " +
       "sub-assignment)") {
    val rows = structured(subs = 4, perSub = 60, cold = 120)
    val emb = rows.toDF("vec_id", "embedding")
    val index = IVF.train(
      rows.filter(_._1 >= 50000L).toDF("vec_id", "embedding"),
      k = 6, iters = 3)
    val dir = tmp("subroute-fan")
    val st = HnswGeoStore.build(spark, emb, dir, index,
      maxCellNodes = 64, subRouted = true)
    // fan arithmetic, measured on the fan primitive itself: a routed
    // probe into a hot cell reaches only its chosen sub-cells' slots
    val probes = st.segments.select(col("vec_id"), col("vec"))
      .withColumn("__cell",
        explode(IVF.probeExpr(col("vec"), index, 1)))
    val exhaustive = Hnsw.fanToSubShards(probes, "__cell", st.layout,
      index.k, st.routing, nProbeSub = 0).count()
    val routed = Hnsw.fanToSubShards(probes, "__cell", st.layout,
      index.k, st.routing, nProbeSub = 1).count()
    assert(routed < exhaustive / 2,
      s"nProbeSub=1 fan $routed must be well under the exhaustive " +
        s"fan $exhaustive on a split hot cell")
    // recall contract on the planted structure: twins are near-copies,
    // so both land in the same frozen sub-cell and nProbeSub = 1
    // already finds every twin pair
    val twinPairs = pairSet(HnswGeoStore.nearDupPairs(st, 0.9999,
        nProbe = 2, efSearch = 512, nProbeSub = 1))
      .map { case (i, j, _) => (i, j) }
    val planted = rows.collect {
      case (id, _) if id < TwinStride && id < 50000L => (id, id + TwinStride)
    }.toSet
    assert(planted.subsetOf(twinPairs),
      s"missing ${planted.diff(twinPairs).size} of ${planted.size} " +
        "planted twins at nProbeSub=1")
    CacheRegistry.releaseAll()
  }

  test("lifecycle under a frozen mini-IVF: appends assign under it " +
       "(monotone compaction theorem), an admission-grown hot cell " +
       "trains its mini-IVF at compaction, and a retrain re-derives") {
    // cold-built subRouted store: no routed cell yet — the policy flag
    // alone persists
    val base = structured(subs = 0, perSub = 0, cold = 150)
    val emb = base.toDF("vec_id", "embedding")
    val index = IVF.train(emb, k = 6, iters = 3)
    val dir = tmp("subroute-life")
    var st = HnswGeoStore.build(spark, emb, dir, index,
      maxCellNodes = 64, subRouted = true)
    assert(st.subRouted && st.routing.isEmpty && st.layout.isEmpty)
    assert(HnswGeoStore.load(spark, dir).subRouted,
      "the subRouted policy must persist with an empty layout")
    // hot structure arrives ONLY through admission (monotone ids)
    val hot = structured(subs = 4, perSub = 50, cold = 0)
      .map { case (id, v) => (id + 1000000L, v) }
    val (h1, h2) = hot.splitAt(hot.size / 2)
    st = HnswGeoStore.append(spark, st, h1.toDF("vec_id", "embedding"))
    st = HnswGeoStore.append(spark, st, h2.toDF("vec_id", "embedding"))
    st = HnswGeoStore.compact(spark, st)
    assert(st.routing.nonEmpty,
      "compaction must train the admission-grown hot cell's mini-IVF")
    assert(st.routing.forall { case (c, sr) =>
      st.layout(c) === sr.slots && sr.centroids.length >= 4 },
      s"grown routing malformed: ${st.routing.map { case (c, r) =>
        (c, r.centroids.length, r.split.toSeq) }}")
    assert(maxShardRows(st.segments) <= 96L,
      "post-compaction hot cell must be bounded")
    // compaction ≡ rebuild under the grown layout AND routing (monotone
    // ids): the from-scratch build under the same frozen structures is
    // bitwise the compacted store
    val union = (base ++ hot).toDF("vec_id", "embedding")
    val rebuilt = Hnsw.buildGeoWithLayout(
      union.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding")),
      index, 8, 64, st.layout, routing = st.routing)
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
      "compacted subRouted store must be bitwise the frozen-structure " +
        "rebuild")
    // a further monotone append honors the frozen routing: serve parity
    // with an unsplit store at exhaustive settings
    val b3 = structured(subs = 1, perSub = 10, cold = 5)
      .map { case (id, v) => (id + 2000000L, v) }
    st = HnswGeoStore.append(spark, st, b3.toDF("vec_id", "embedding"))
    val flatAll = Hnsw.buildGeo(
      (base ++ hot ++ b3).toDF("vec_id", "embedding")
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding")), index)
    val got = pairSet(HnswGeoStore.nearDupPairs(st, 0.9,
      nProbe = 6, efSearch = 512))
    val want = pairSet(Hnsw.nearDupPairsRouted(flatAll, index, 0.9,
      nProbe = 6, efSearch = 512))
    assert(got === want,
      "post-append routed store must stay value-identical to unsplit")
    // retrain re-derives the mini-IVF under the new cells
    val (rt, report) = HnswGeoStore.retrainIfDrifted(spark, st,
      driftFactor = 1e-9, iters = 3)
    assert(report.retrained && rt.subRouted,
      "retrain must fire and keep the subRouted policy")
    assert(rt.routing.nonEmpty,
      "the hot structure must still route under the retrained cells")
    assert(maxShardRows(rt.segments) <= 96L)
    CacheRegistry.releaseAll()
  }
}
