package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Dedup + similarity contracts on synthetic docs and the sf0.001 testdata:
  * exact Jaccard is the oracle; MinHash+LSH and SimHash are checked for
  * zero false positives (their verify stage is exact) and measured recall;
  * LSH ANN is checked for subset-of-brute-force consistency.
  */
class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 1
    (3L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (4L, "completely different text with nothing shared here at all"),
    (5L, "another unrelated document about spark query engines"))
    .toDF("doc_id", "text")

  test("exactGroups collapses exact duplicates to min doc_id") {
    val g = Dedup.exactGroups(docs).filter(col("cnt") > 1).collect()
    assert(g.length === 1)
    assert(g(0).getAs[Long]("keep_id") === 1L)
    assert(g(0).getAs[Long]("cnt") === 2L)
  }

  test("jaccardPairs finds near-dups above threshold, i < j, correct value") {
    val pairs = Dedup.jaccardPairs(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // docs 1,2,3: 1-3 identical (jac 1.0); 1-2 and 2-3 share 6 of 8 shingles
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val j13 = pairs.find(p => p._1 == 1L && p._2 == 3L).get._3
    assert(j13 === 1.0)
    val j12 = pairs.find(p => p._1 == 1L && p._2 == 2L).get._3
    assert(math.abs(j12 - 6.0 / 8.0) < 1e-12)
  }

  test("minhash LSH: no false positives; finds the exact and heavy near-dups") {
    val exact = Dedup.jaccardPairs(docs, threshold = 0.7)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashNearDups(docs, threshold = 0.7)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH verify stage must kill false positives")
    assert(lsh.contains((1L, 3L)), "identical docs always collide in every band")
  }

  test("minhash LSH recall vs exact oracle on sf0.001 documents") {
    val d = Tables.table(spark, sf0001, "documents").select("doc_id", "text")
    val exact = Dedup.jaccardPairs(d, threshold = 0.8)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashNearDups(d, threshold = 0.8)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
    if (exact.nonEmpty) {
      val recall = lsh.size.toDouble / exact.size
      assert(recall >= 0.8, s"recall $recall below banding expectation (${lsh.size}/${exact.size})")
    }
  }

  test("simhash: exact dups at Hamming 0; reported distance is correct") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val p13 = pairs.find(p => p._1 == 1L && p._2 == 3L)
    assert(p13.isDefined && p13.get._3 === 0L)
    pairs.foreach(p => assert(p._3 <= 3L))
  }

  test("dedupCorpus: exact-collapse first, then near-dup drop, keep-first") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
      (7L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
      (2L, "the quick brown fox jumps over the lazy dog today"), // near-dup of 1
      (4L, "completely different text with nothing shared here at all"),
      (5L, "another unrelated document about spark query engines"))
      .toDF("doc_id", "text")
    val kept = Dedup.dedupCorpus(corpus, threshold = 0.6)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // 1 survives carrying its 3 exact copies; 2 dropped as near-dup of 1
    assert(kept === Map(1L -> 3L, 4L -> 1L, 5L -> 1L))
  }

  test("Md5Lanes kernel is bit-identical to the conv/substring hex definition") {
    val df = Seq("alpha beta", "", "中文 text", "x", "the quick brown fox")
      .toDF("s")
    for (p <- 0 until 16) {
      df.select(Dedup.Md5PermHash(col("s"), p).as("fast"),
          conv(substring(md5(concat(lit(s"${p / 4}|"), col("s")).cast("binary")),
            1 + 8 * (p % 4), 8), 16, 10).cast("long").as("ref"))
        .collect().foreach(r => assert(r.getLong(0) === r.getLong(1), s"perm $p"))
    }
    df.select(Dedup.Md5TokenHash(col("s")).as("fast"),
        conv(substring(md5(col("s").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("ref"))
      .collect().foreach(r => assert(r.getLong(0) === r.getLong(1), "token hash"))
    df.select(graft.operators.Sampling.hashBucket(col("s"), 20).as("fast"),
        (conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long") % 20).as("ref"))
      .collect().foreach(r => assert(r.getLong(0) === r.getLong(1), "bucket"))
  }

  test("connectedComponents: chains collapse transitively, islands stay apart") {
    // default threshold → exercises the driver union-find fast path
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (4L, 5L), (7L, 8L))
      .toDF("i", "j")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
      4L -> 4L, 5L -> 4L, 7L -> 7L, 8L -> 7L))
  }

  test("connectedComponents: driver fast path equals the distributed fixpoint") {
    // random sparse graph; both paths must emit the identical labeling
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(120)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(p => p._1 != p._2).map(p => (p._1 min p._2, p._1 max p._2))
      .distinct.toDF("i", "j")
    val driver = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponents(pairs, driverEdgeThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(driver === dist)
  }

  test("connectedComponents collapses a DEEP chain within the iteration cap") {
    // a 60-node path has diameter 59: neighbor-min alone would need ~59
    // rounds and blow maxIter = 20; pointer jumping must finish in O(log).
    // driverEdgeThreshold = 0 forces the distributed path under test.
    val pairs = (1L until 60L).map(i => (i, i + 1)).toDF("i", "j")
    val cc = Dedup.connectedComponents(pairs, driverEdgeThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.keySet === (1L to 60L).toSet)
    assert(cc.values.forall(_ == 1L), "entire chain must collapse to node 1")
  }

  test("connectedComponents fails loudly when the iteration cap is hit") {
    val pairs = (1L until 60L).map(i => (i, i + 1)).toDF("i", "j")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(pairs, maxIter = 1, driverEdgeThreshold = 0)
    }
    assert(e.getMessage.contains("did not converge"),
      "stopping early must throw, not silently report split clusters")
  }

  test("connectedComponents with a checkpoint dir: reliable cuts, same result") {
    val dir = tmpDir("cc-ckpt")
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (4L, 5L), (7L, 8L))
        .toDF("i", "j")
      val cc = Dedup.connectedComponents(pairs, driverEdgeThreshold = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
        4L -> 4L, 5L -> 4L, 7L -> 7L, 8L -> 7L))
      // the cuts must actually be RELIABLE checkpoints: files in the dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "no checkpoint files written — fell back to localCheckpoint")
      // and superseded generations must be cleaned up: only the FINAL
      // label table's rdd-* checkpoint may remain, not one per round
      val gens = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => p.getFileName.toString.startsWith("rdd-")).count()
      assert(gens === 1, s"expected 1 surviving checkpoint generation, got $gens")
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("dedupCorpusClustered collapses a near-dup CHAIN to one survivor") {
    val base = "the quick brown fox jumps over the lazy dog in the warm sun"
    val corpus = Seq(
      (1L, base),
      (2L, base + " today"),           // near-dup of 1
      (3L, base + " today always"),    // near-dup of 2 (and transitively of 1)
      (6L, "completely different text with nothing shared here at all ok"))
      .toDF("doc_id", "text")
    val greedy = Dedup.dedupCorpus(corpus, threshold = 0.6)
      .select("doc_id").as[Long].collect().toSet
    val clustered = Dedup.dedupCorpusClustered(corpus, threshold = 0.6)
      .select("doc_id").as[Long].collect().toSet
    assert(clustered === Set(1L, 6L), s"one survivor per component, got $clustered")
    // greedy also drops direct pair members; both keep the unrelated doc
    assert(greedy.contains(1L) && greedy.contains(6L))
  }

  test("asofJoin: inclusive backward as-of, nulls before first state, per key") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val probes = Seq(
      (1L, "k1", ts("2024-01-01 10:00:00"), 1.0),  // before any state → null
      (2L, "k1", ts("2024-01-01 11:00:00"), 2.0),  // exactly at state s1 → s1
      (3L, "k1", ts("2024-01-01 12:30:00"), 3.0),  // between s1 and s2 → s1
      (4L, "k1", ts("2024-01-01 14:00:00"), 4.0),  // after s2 → s2
      (5L, "k2", ts("2024-01-01 14:00:00"), 5.0))  // other key → its own state
      .toDF("id", "k", "ts", "v")
    val state = Seq(
      ("k1", ts("2024-01-01 11:00:00"), 10.0),     // s1
      ("k1", ts("2024-01-01 13:00:00"), 20.0),     // s2
      ("k2", ts("2024-01-01 09:00:00"), 30.0))
      .toDF("k", "ts", "sv")
    val got = graft.operators.AsofJoin.asofJoin(probes, state,
        keys = Seq("k"), stateVals = Seq("sv"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(5)) null else r.getDouble(5).asInstanceOf[Any])).toMap
    assert(got === Map(1L -> null, 2L -> 10.0, 3L -> 10.0, 4L -> 20.0, 5L -> 30.0))
    // tolerance: k2's state is 5 hours stale for probe 5 → nulled; k1's
    // probes keep their fresh matches (all within 2 hours)
    val bounded = graft.operators.AsofJoin.asofJoin(probes, state,
        keys = Seq("k"), stateVals = Seq("sv"), tolerance = Some("2 hours"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(5)) null else r.getDouble(5).asInstanceOf[Any])).toMap
    assert(bounded === Map(1L -> null, 2L -> 10.0, 3L -> 10.0, 4L -> 20.0, 5L -> null))
  }

  test("asofJoin forward + asofJoinNearest: direction symmetry, tie to " +
       "backward, per-side tolerance") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val probes = Seq(
      (1L, "k1", ts("2024-01-01 10:00:00"), 0.0), // before s1: fwd→s1, bwd→null
      (2L, "k1", ts("2024-01-01 12:00:00"), 0.0), // midpoint s1/s2: tie → bwd s1
      (3L, "k1", ts("2024-01-01 12:45:00"), 0.0), // closer to s2 → s2
      (4L, "k1", ts("2024-01-01 15:00:00"), 0.0)) // after s2: fwd→null, bwd→s2
      .toDF("id", "k", "ts", "v")
    val state = Seq(
      ("k1", ts("2024-01-01 11:00:00"), 10.0),    // s1
      ("k1", ts("2024-01-01 13:00:00"), 20.0))    // s2
      .toDF("k", "ts", "sv")
    def vals(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(5)) null else r.getDouble(5).asInstanceOf[Any])).toMap
    val fwd = vals(graft.operators.AsofJoin.asofJoin(probes, state,
      keys = Seq("k"), stateVals = Seq("sv"), direction = "forward"))
    assert(fwd === Map(1L -> 10.0, 2L -> 20.0, 3L -> 20.0, 4L -> null))
    val near = vals(graft.operators.AsofJoin.asofJoinNearest(probes, state,
      keys = Seq("k"), stateVals = Seq("sv")))
    assert(near === Map(1L -> 10.0, 2L -> 10.0, 3L -> 20.0, 4L -> 20.0))
    // tolerance 30 min: probe 1 is 60 min from s1 → both sides out → null;
    // probe 3 keeps s2 (15 min); probe 4 is 120 min past s2 → null
    val nearTol = vals(graft.operators.AsofJoin.asofJoinNearest(probes, state,
      keys = Seq("k"), stateVals = Seq("sv"), tolerance = Some("30 minutes")))
    assert(nearTol === Map(1L -> null, 2L -> null, 3L -> 20.0, 4L -> null))
  }

  test("intervalJoin: [start, end) boundaries, bucket-crossing, empty windows") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val probes = Seq(
      (1L, ts("2024-01-01 10:00:00")),   // == start → in
      (2L, ts("2024-01-01 10:59:59")),   // just inside
      (3L, ts("2024-01-01 11:00:00")),   // == end → OUT (exclusive)
      (4L, ts("2024-01-01 12:30:00")),   // inside the bucket-CROSSING window
      (5L, ts("2024-01-01 09:00:00")))   // before everything
      .toDF("id", "ts")
    val intervals = Seq(
      (100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      // crosses an hour-bucket boundary: 11:30 → 13:30
      (200L, ts("2024-01-01 11:30:00"), ts("2024-01-01 13:30:00")),
      // empty window — must match nothing (and not poison sequence())
      (300L, ts("2024-01-01 10:30:00"), ts("2024-01-01 10:30:00")))
      .toDF("interval_id", "win_start", "win_end")
    val got = graft.operators.RangeJoin.intervalJoin(probes, intervals)
      .select("id", "interval_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 100L), (2L, 100L), (4L, 200L)))
  }

  test("cosine topK matches a locally-computed brute force on sf0.001") {
    val emb = Tables.table(spark, sf0001, "embeddings")
    val all = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val q = all.find(_._1 == 0L).get._2
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(dot / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = all.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(q, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSeq
    val got = Similarity.topK(emb, q, 10, excludeId = Some(0L))
      .select("vec_id").as[Long].collect().toSeq
    assert(got === expect)
  }

  test("LSH ANN results are brute-force-consistent within the query bucket") {
    val emb = Tables.table(spark, sf0001, "embeddings")
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toArray
    val ann = Similarity.lshNeighbors(emb, q, 10, excludeId = Some(0L))
      .select("vec_id", "cos").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(ann.nonEmpty, "the query's own band buckets can never all be empty")
    // every ANN hit must carry the same cosine the brute-force path computes
    val brute = Similarity.topK(emb, q, 500, excludeId = Some(0L))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ann.foreach { case (id, c) => assert(math.abs(brute(id) - c) < 1e-9) }
    // scores descend
    assert(ann.map(_._2).toSeq === ann.map(_._2).sortBy(-_).toSeq)
  }

  test("banded LSH ANN recall >= 0.9 vs brute-force top-20 on sf0.01") {
    val emb = Tables.table(spark, "/root/testdata/sf0.01", "embeddings")
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toArray
    val exact = Similarity.topK(emb, q, 20, excludeId = Some(0L))
      .select("vec_id").as[Long].collect().toSet
    // q26's configuration: 8 bands of 2 sign bits (OR-amplified)
    val ann = Similarity.lshNeighbors(emb, q, 20, planesPerBand = 2, bands = 8,
      excludeId = Some(0L)).select("vec_id").as[Long].collect().toSet
    val recall = (ann & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall (${(ann & exact).size}/${exact.size})")
  }

  test("IVF: deterministic training, consistent cosines, bounded recall") {
    val emb = Tables.table(spark, "/root/testdata/sf0.01", "embeddings")
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toArray
    val idx = graft.operators.IVF.train(emb, k = 16)
    val idx2 = graft.operators.IVF.train(emb, k = 16)
    assert(idx.centroids.flatten.toSeq === idx2.centroids.flatten.toSeq,
      "training must be deterministic")
    val ann = graft.operators.IVF.neighbors(emb, idx, q, 20, nProbe = 8,
      excludeId = Some(0L)).collect().map(r => (r.getLong(0), r.getDouble(1)))
    // cosines must agree with the brute-force path for every returned id
    val brute = Similarity.topK(emb, q, 500, excludeId = Some(0L))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ann.foreach { case (id, c) => assert(math.abs(brute(id) - c) < 1e-9) }
    // recall floor at nProbe = k/2; uniform-random embeddings are ANN's
    // adversarial case (see scaladoc) — clustered data does far better
    val exact = Similarity.topK(emb, q, 20, excludeId = Some(0L))
      .select("vec_id").as[Long].collect().toSet
    val recall = (ann.map(_._1).toSet & exact).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall")
    // the DEFAULT operating point (nProbe omitted -> defaultNProbe(k),
    // the q164-audited 3/4 fraction) must clear the 0.8 production floor
    // even on this adversarial isotropic testdata
    val annDefault = graft.operators.IVF.neighbors(emb, idx, q, 20,
      excludeId = Some(0L)).collect().map(_.getLong(0)).toSet
    val recallDefault = (annDefault & exact).size.toDouble / exact.size
    assert(recallDefault >= 0.8,
      s"default-nProbe recall $recallDefault below the audited floor")
  }

  test("incremental near-dups equal the fresh-touching subset of a full re-run") {
    val docs = Tables.table(spark, sf0001, "documents").select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") < 300)
    val fresh = docs.filter(col("doc_id") >= 300)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map { r =>
        val (i, j) = (r.getLong(0), r.getLong(1))
        (math.min(i, j), math.max(i, j),
          BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP))
      }.toSet
    val inc = Dedup.incrementalNearDups(corpus, fresh)
    graft.CacheRegistry.releaseAll()
    val full = Dedup.minhashNearDups(docs)
      .filter(col("i") >= 300 || col("j") >= 300)
    val (incPairs, fullPairs) = (key(inc), key(full))
    graft.CacheRegistry.releaseAll()
    assert(incPairs === fullPairs,
      s"incremental diverged: only-inc=${incPairs -- fullPairs} only-full=${fullPairs -- incPairs}")
    // j is always the fresh doc; no corpus x corpus pair may appear
    assert(inc.collect().forall(_.getLong(1) >= 300))
  }

  test("incrementalDedup: exact matches and corpus near-dups are rejected, " +
      "from-scratch admits nothing more") {
    val docs = Tables.table(spark, sf0001, "documents").select("doc_id", "text")
    val corpusRaw = docs.filter(col("doc_id") < 300)
    val fresh = docs.filter(col("doc_id") >= 300)
    val corpusKept = Dedup.dedupCorpus(corpusRaw).select("doc_id", "text")
    val corpusTexts = corpusKept.select("text").collect().map(_.getString(0)).toSet
    graft.CacheRegistry.releaseAll()
    val kept = Dedup.incrementalDedup(corpusKept, fresh).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    graft.CacheRegistry.releaseAll()
    // no admitted doc duplicates the corpus verbatim
    assert(kept.values.forall(t => !corpusTexts.contains(t)))
    // superset guarantee: everything a from-scratch union dedup admits
    // from the batch is admitted incrementally too
    val fullKeptFresh = Dedup.dedupCorpus(docs).filter(col("doc_id") >= 300)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    graft.CacheRegistry.releaseAll()
    assert(fullKeptFresh.subsetOf(kept.keySet),
      s"from-scratch admitted ids the incremental run rejected: ${fullKeptFresh -- kept.keySet}")
    assert(kept.nonEmpty && kept.keySet.forall(_ >= 300))
  }

  test("hyperplanes are deterministic across invocations (executor-safe)") {
    val a = Similarity.hyperplanes(4, 8)
    val b = Similarity.hyperplanes(4, 8)
    assert(a.flatten.toSeq === b.flatten.toSeq)
    assert(a.flatten.forall(v => v >= -1.0 && v < 1.0))
  }

  test("containmentPairs finds subset docs Jaccard misses; " +
    "threshold contract enforced") {
    // doc 2 = doc 1's text embedded in a much longer doc: containment of
    // the short side ~1.0, Jaccard far below it. doc 3 unrelated.
    val short = (1 to 10).map(i => s"w$i").mkString(" ")
    val long = short + " " + (100 to 160).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, short), (2L, long), (3L, "z a b c d e f g h"))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    assert(pairs.head._3 === 1.0, "full shingle containment scores 1.0")
    // the same pair is invisible to Jaccard at any useful threshold
    assert(Dedup.jaccardPairs(docs, threshold = 0.5).collect().isEmpty)
    intercept[IllegalArgumentException](Dedup.containmentPairs(docs, 0.0))
  }

  test("PQ: deterministic codebooks, bit-exact save/load, ADC recall vs " +
    "exact top-20, contracts") {
    import graft.operators.PQ
    val emb = Tables.table(spark, "/root/testdata/sf0.01", "embeddings")
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toArray
    val cb = PQ.train(emb, dim = q.length, m = 8, k = 16, iters = 3)
    val cb2 = PQ.train(emb, dim = q.length, m = 8, k = 16, iters = 3)
    assert(cb.books.flatten.flatten.toSeq === cb2.books.flatten.flatten.toSeq,
      "training is deterministic")
    // persistence round-trip is bit-exact and encodes identically
    val dir = tmpDir("graft-pq")
    PQ.save(spark, cb, dir)
    val back = PQ.load(spark, dir)
    assert(back.books.flatten.flatten.toSeq ===
      cb.books.flatten.flatten.toSeq)
    val enc = emb.limit(50).select(col("vec_id"),
      PQ.encodeExpr(col("embedding").cast("array<double>"), cb).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val enc2 = emb.limit(50).select(col("vec_id"),
      PQ.encodeExpr(col("embedding").cast("array<double>"), back).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(enc === enc2, "reloaded codebooks encode identically")
    assert(enc.values.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
    // ADC with exact re-rank: a 10x-k candidate cut recovers most of the
    // exact top-20 on this clustered corpus (ADC estimates L2 over raw
    // vectors while the re-rank is cosine, so the cut must be generous
    // when norms vary -- the standard PQ + re-rank trade)
    val exact = Similarity.topK(emb, q, 20, excludeId = Some(0L))
      .select("vec_id").as[Long].collect().toSet
    val ann = PQ.neighbors(emb, cb, q, k = 20, rerank = 200,
      excludeId = Some(0L)).select("vec_id").as[Long].collect().toSet
    val recall = (ann & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall (${(ann & exact).size}/${exact.size})")
    intercept[IllegalArgumentException](
      PQ.train(emb, dim = 64, m = 7, k = 4, iters = 1))
    intercept[IllegalArgumentException](
      PQ.neighbors(emb, cb, q, k = 20, rerank = 10))
    // IVFADC with every cell probed degenerates to flat PQ exactly
    val idx = graft.operators.IVF.train(emb, k = 16)
    val flat = PQ.neighbors(emb, cb, q, k = 20, rerank = 200,
      excludeId = Some(0L)).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val probedAll = PQ.ivfadcNeighbors(emb, idx, cb, q, k = 20, nProbe = 16,
      rerank = 200, excludeId = Some(0L)).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(flat.toSeq === probedAll.toSeq,
      "nProbe = k (no pruning) must equal flat PQ")
  }

  test("cellStats: populations conserve the corpus, max >= mean, and " +
    "off-geometry drift explodes inertia") {
    import graft.operators.IVF
    val emb = Tables.table(spark, "/root/testdata/sf0.01", "embeddings")
    val idx = IVF.train(emb, k = 8, iters = 2)
    val stats = IVF.cellStats(emb, idx).collect()
    assert(stats.map(_.getLong(1)).sum === emb.count(),
      "every vector lands in exactly one cell")
    stats.foreach { r =>
      assert(r.getDouble(2) >= 0.0)
      assert(r.getDouble(4) >= r.getDouble(3) - 1e-9,
        "max d2 must dominate mean d2")
    }
    // the retrain signal: data shifted off the trained geometry
    val shifted = emb.select(col("vec_id"),
      transform(col("embedding").cast("array<double>"), x => x + lit(10.0))
        .as("embedding"))
    val drift = IVF.cellStats(shifted, idx)
      .agg(sum(col("inertia"))).head().getDouble(0)
    val base = stats.map(_.getDouble(2)).sum
    assert(drift > base * 10,
      s"shifted corpus inertia $drift must dwarf in-distribution $base")
  }

  test("residual IVFADC: distortion strictly below flat codes at equal " +
    "m/k, recall at least flat's under a tight budget, deterministic") {
    import graft.operators.{IVF, PQ}
    val emb = Tables.table(spark, "/root/testdata/sf0.01", "embeddings")
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toArray
    val idx = IVF.train(emb, k = 16)
    val cbFlat = PQ.train(emb, dim = q.length, m = 8, k = 16, iters = 3)
    val cbRes = PQ.trainResidual(emb, idx, dim = q.length, m = 8, k = 16,
      iters = 3)
    val v = col("embedding").cast("array<double>")
    // the Jégou §IV claim itself: the same m/k code budget spent on
    // residuals loses strictly less than spent on raw vectors
    val flatD = emb.select(avg(PQ.distortionExpr(v, cbFlat)).as("d"))
      .head().getDouble(0)
    val resD = emb.select(avg(PQ.distortionExpr(
        PQ.residualExpr(v, IVF.assignExpr(v, idx), idx), cbRes)).as("d"))
      .head().getDouble(0)
    assert(resD < flatD,
      s"residual distortion $resD must beat flat $flatD at equal m/k")
    // estimate sharpness: ADC approximates L2 dist², so judge it in the
    // L2 metric it targets (the cosine re-rank on top is shared by both
    // variants). Per probed vector: |est − true ‖q−v‖²|, and candidate
    // recall of the exact-L2 top 20 at a rerank=100 cut.
    val probes = IVF.probeIds(idx, q, 8)
    val probedBase = emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), v.as("v"))
      .withColumn("cell", IVF.assignExpr(col("v"), idx))
      .filter(col("cell").isin(probes.map(Integer.valueOf): _*))
      .withColumn("d2", aggregate(
        zip_with(col("v"), lit(q), (a, b) => (a - b) * (a - b)),
        lit(0.0), _ + _))
    val lutsFlat = PQ.adcLuts(cbFlat, q)
    val estFlat = probedBase.withColumn("est",
      PQ.adcScoreExpr(PQ.encodeExpr(col("v"), cbFlat), lutsFlat))
    val lutsByCell = probes.map { i =>
      i -> PQ.adcLuts(cbRes,
        q.zip(idx.centroids(i)).map { case (a, b) => a - b })
    }
    val estResExpr = lutsByCell.tail.foldLeft(
        when(col("cell") === lutsByCell.head._1,
          PQ.adcScoreExpr(col("codes"), lutsByCell.head._2))) {
      case (acc, (i, l)) =>
        acc.when(col("cell") === i, PQ.adcScoreExpr(col("codes"), l))
    }
    val estRes = probedBase
      .withColumn("codes",
        PQ.encodeExpr(PQ.residualExpr(col("v"), col("cell"), idx), cbRes))
      .withColumn("est", estResExpr)
    def mae(df: org.apache.spark.sql.DataFrame): Double =
      df.select(avg(abs(col("est") - col("d2")))).head().getDouble(0)
    assert(mae(estRes) < mae(estFlat),
      s"residual est MAE ${mae(estRes)} must beat flat ${mae(estFlat)}")
    def candRecall(df: org.apache.spark.sql.DataFrame): Double = {
      val exactL2 = df.orderBy(col("d2").asc, col("vec_id").asc).limit(20)
        .select("vec_id").as[Long].collect().toSet
      val cand = df.orderBy(col("est").asc, col("vec_id").asc).limit(100)
        .select("vec_id").as[Long].collect().toSet
      (cand & exactL2).size.toDouble / exactL2.size
    }
    assert(candRecall(estRes) >= candRecall(estFlat),
      s"residual candidate recall ${candRecall(estRes)} < flat ${candRecall(estFlat)}")
    assert(candRecall(estRes) >= 0.85, s"residual candidate recall ${candRecall(estRes)}")
    // end-to-end at the production setting still recovers the cosine top-k
    val exact = Similarity.topK(emb, q, 20, excludeId = Some(0L))
      .select("vec_id").as[Long].collect().toSet
    val resAnn = PQ.ivfadcResidualNeighbors(emb, idx, cbRes, q, k = 20,
      nProbe = 8, rerank = 200, excludeId = Some(0L))
      .select("vec_id").as[Long].collect().toSet
    // nProbe = 8 of 16 prunes half the cells, and some cosine-top-20 live
    // there (a loss flat IVFADC shares at identical probes) — so the
    // end-to-end floor sits below the unpruned 0.8 contract
    assert((resAnn & exact).size >= 14,
      s"end-to-end recall ${(resAnn & exact).size}/20")
    // deterministic end to end: retrain + rerun replays identically
    val again = PQ.ivfadcResidualNeighbors(emb, idx,
        PQ.trainResidual(emb, idx, dim = q.length, m = 8, k = 16, iters = 3),
        q, k = 20, nProbe = 8, rerank = 200, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val firstRun = PQ.ivfadcResidualNeighbors(emb, idx, cbRes, q, k = 20,
        nProbe = 8, rerank = 200, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(again.toSeq === firstRun.toSeq)
  }

  test("clusterRepresentatives: quality argmax with id tie-break, " +
    "member counts, singleton clusters") {
    val components = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L))
      .toDF("doc_id", "cluster")
    val docs = Seq((1L, 100L), (2L, 300L), (3L, 300L), (9L, 5L))
      .toDF("doc_id", "n_chars")
    val got = Dedup.clusterRepresentatives(components, docs, "n_chars")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // quality tie between 2 and 3 -> lower id wins
    assert(got(1L) === ((2L, 300L, 3L)))
    assert(got(9L) === ((9L, 5L, 1L)), "singletons keep themselves")
  }

  test("recallAudit: identical lists score 1.0, disjoint score 0, " +
    "partial overlap counts and ranks exactly") {
    def ranked(rows: Seq[(Long, Double)]) = rows.toDF("vec_id", "cos")
    val exact = ranked(Seq(1L -> 0.9, 2L -> 0.8, 3L -> 0.7, 4L -> 0.6))
    def audit(approx: Seq[(Long, Double)]) =
      Similarity.recallAudit(exact, ranked(approx), 4).head()
    val same = audit(Seq(1L -> 0.9, 2L -> 0.8, 3L -> 0.7, 4L -> 0.6))
    assert((same.getInt(0), same.getLong(1), same.getDouble(2),
      same.getDouble(3)) === ((4, 4L, 1.0, 1.0)))
    val none = audit(Seq(10L -> 0.5, 11L -> 0.4, 12L -> 0.3, 13L -> 0.2))
    assert((none.getLong(1), none.getDouble(2), none.getDouble(3)) ===
      ((0L, 0.0, 0.0)))
    // half overlap; the true top-1 sits at approx rank 2 → RR = 0.5
    val half = audit(Seq(7L -> 0.95, 1L -> 0.9, 3L -> 0.7, 9L -> 0.1))
    assert((half.getLong(1), half.getDouble(2), half.getDouble(3)) ===
      ((2L, 0.5, 0.5)))
    intercept[IllegalArgumentException](
      Similarity.recallAudit(exact, exact, 0))
  }
}
