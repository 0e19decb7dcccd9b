package graft

import org.apache.spark.sql.functions._
import graft.operators.{HnswGeoStore, IVF}

/** ATTRIBUTE UPDATE on the standing geo store
  * ([[HnswGeoStore.updateAttrs]] — round-17 verdict #3): the
  * metadata-backfill op. These specs pin the contract: an update is a
  * PAYLOAD-ONLY epoch (graph/vector rows bitwise untouched), readers
  * resolve latest-wins (update ≡ the store built with the final attrs,
  * value identity on the filtered serve), chained updates compose,
  * erased/unknown ids are excluded (no resurrection), compaction folds
  * the resolution into the new base (the `_attr_update` sidecar dies
  * and exact update-free plans return), and retrain re-strides the
  * RESOLVED payloads.
  */
class AttrUpdateSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int): Seq[(Long, Seq[Double], Long)] =
    (1 to n).map { i =>
      val id = i.toLong
      val v = (0 until 12).map { d =>
        val h = (id * 2654435761L + d * 1315423911L) ^ (id >> 2)
        ((h % 2001L).toDouble - 1000.0) / 100.0
      }
      (id, v, id % 7L)
    }

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/store"

  private def serveSet(st: HnswGeoStore.Store,
                       probes: org.apache.spark.sql.DataFrame) =
    HnswGeoStore.batchNeighborsFilteredExpr(st, probes,
        col("bucket") === lit(2L), k = 5, efSearch = 64, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet

  private def attrRows(st: HnswGeoStore.Store) =
    HnswGeoStore.attrsOf(spark, st).get
      .select(col("vec_id"), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def graphDump(st: HnswGeoStore.Store) =
    st.segments.select(col("shard"), col("vec_id"), col("vec"),
        col("level"), col("nbrs"))
      .orderBy("shard", "vec_id").collect().map(_.toString).toSeq

  test("updateAttrs is a payload-only epoch: latest-wins serving " +
       "equals the built-with-final-attrs store, the graph is bitwise " +
       "untouched, and chained updates compose") {
    val rows = vecs(220)
    val emb = rows.toDF("vec_id", "embedding", "bucket")
    val index = IVF.train(emb, k = 4, iters = 3)
    val dirA = tmp("attrupd-a")
    val dirB = tmp("attrupd-b")
    var a = HnswGeoStore.build(spark, emb.filter(col("vec_id") <= 150),
      dirA, index)
    a = HnswGeoStore.append(spark, a, emb.filter(col("vec_id") > 150))
    val preGraph = graphDump(a)
    // backfill: re-bucket every third id
    val upd1 = emb.filter(pmod(col("vec_id"), lit(3L)) === 0L)
      .select(col("vec_id"),
        pmod(col("bucket") + lit(3L), lit(7L)).as("bucket"))
    a = HnswGeoStore.updateAttrs(spark, a, upd1)
    assert(graphDump(a) === preGraph,
      "an attr update must leave the graph rows bitwise untouched")
    // the counterfactual: the same store built with the FINAL attrs
    val finalAttrs = emb.select(col("vec_id"), col("embedding"),
      when(pmod(col("vec_id"), lit(3L)) === 0L,
        pmod(col("bucket") + lit(3L), lit(7L)))
        .otherwise(col("bucket")).as("bucket"))
    var b = HnswGeoStore.build(spark,
      finalAttrs.filter(col("vec_id") <= 150), dirB, index)
    b = HnswGeoStore.append(spark, b, finalAttrs.filter(col("vec_id") > 150))
    val probes = vecs(3).map { case (id, v, _) => (id + 9000L, v) }
      .toDF("probe_id", "embedding")
    assert(serveSet(a, probes) === serveSet(b, probes),
      "updated store must serve exactly the built-with-final store")
    assert(attrRows(a) === attrRows(b),
      "resolved attr view must equal the built-with-final relation")
    // chained updates: a second update supersedes the first
    val upd2 = emb.filter(pmod(col("vec_id"), lit(6L)) === 0L)
      .select(col("vec_id"), lit(2L).as("bucket"))
    a = HnswGeoStore.updateAttrs(spark, a, upd2)
    val want = attrRows(b).map { case (id, bkt) =>
      if (id % 6L == 0L) (id, 2L) else (id, bkt) }
    assert(attrRows(a) === want,
      "chained updates must resolve newest-wins per id")
    CacheRegistry.releaseAll()
  }

  test("updateAttrs excludes erased and unknown ids (no resurrection, " +
       "committed no-op), and compaction folds the resolution into the " +
       "new base — the sidecar dies and plans fold to one relation") {
    val rows = vecs(200)
    val emb = rows.toDF("vec_id", "embedding", "bucket")
    val index = IVF.train(emb, k = 4, iters = 3)
    val dir = tmp("attrupd-del")
    var st = HnswGeoStore.build(spark, emb, dir, index)
    // erase a swath, then try to update BOTH erased and unknown ids
    st = HnswGeoStore.delete(spark, st,
      (10L to 40L).toDF("vec_id"))
    val upd = ((20L to 30L) ++ (60L to 70L) ++ Seq(5000L))
      .toDF("vec_id").withColumn("bucket", lit(2L))
    st = HnswGeoStore.updateAttrs(spark, st, upd)
    val got = attrRows(st)
    assert(!got.exists { case (id, _) => id >= 10L && id <= 40L },
      "an update must not resurrect an erased id's payload")
    assert(!got.exists(_._1 == 5000L),
      "an unknown id must not materialize a payload row")
    assert((60L to 70L).forall(id => got.contains((id, 2L))),
      "live targets must carry the updated payload")
    // compaction: physical fold — the resolved relation becomes the
    // base, the update sidecar disappears, and serving is unchanged
    val probes = vecs(3).map { case (id, v, _) => (id + 9000L, v) }
      .toDF("probe_id", "embedding")
    val pre = serveSet(st, probes)
    val preAttrs = attrRows(st)
    st = HnswGeoStore.compact(spark, st)
    assert(!HnswGeoStore.hasAttrUpdates(spark, st),
      "the compacted base must not carry the latest-wins switch")
    assert(serveSet(st, probes) === pre,
      "compaction must not change the served surface")
    assert(attrRows(st) === preAttrs,
      "compaction must carry exactly the resolved payloads")
    CacheRegistry.releaseAll()
  }

  test("retrain re-strides the RESOLVED payloads: an updated store's " +
       "retrain serves the updated attrs, never the stale ones") {
    val rows = vecs(180)
    val emb = rows.toDF("vec_id", "embedding", "bucket")
    val index = IVF.train(emb, k = 4, iters = 3)
    val dir = tmp("attrupd-rt")
    var st = HnswGeoStore.build(spark, emb, dir, index)
    st = HnswGeoStore.updateAttrs(spark, st,
      emb.filter(pmod(col("vec_id"), lit(3L)) === 0L)
        .select(col("vec_id"),
          pmod(col("bucket") + lit(3L), lit(7L)).as("bucket")))
    val preAttrs = attrRows(st)
    val (rt, report) = HnswGeoStore.retrainIfDrifted(spark, st,
      driftFactor = 1e-9, iters = 3)
    assert(report.retrained, "retrain must fire at driftFactor ~ 0")
    assert(attrRows(rt) === preAttrs,
      "retrained store must carry the resolved (updated) payloads")
    assert(!HnswGeoStore.hasAttrUpdates(spark, rt),
      "the retrained base resolves the updates physically")
    CacheRegistry.releaseAll()
  }

  test("guards: duplicate ids in one batch, wrong payload schema, and " +
       "a plain store all fail loudly") {
    val rows = vecs(60)
    val emb = rows.toDF("vec_id", "embedding", "bucket")
    val index = IVF.train(emb, k = 4, iters = 3)
    val attrStore = HnswGeoStore.build(spark, emb, tmp("attrupd-g1"), index)
    val plain = HnswGeoStore.build(spark,
      emb.select(col("vec_id"), col("embedding")), tmp("attrupd-g2"),
      index)
    intercept[IllegalArgumentException] {
      HnswGeoStore.updateAttrs(spark, attrStore,
        Seq((1L, 2L), (1L, 3L)).toDF("vec_id", "bucket"))
    }
    intercept[IllegalArgumentException] {
      HnswGeoStore.updateAttrs(spark, attrStore,
        Seq((1L, 2L)).toDF("vec_id", "wrong_col"))
    }
    intercept[IllegalArgumentException] {
      HnswGeoStore.updateAttrs(spark, plain,
        Seq((1L, 2L)).toDF("vec_id", "bucket"))
    }
    CacheRegistry.releaseAll()
  }
}
