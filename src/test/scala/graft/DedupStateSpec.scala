package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, DedupState, IVF, Similarity}
import graft.sources.Tables

/** Persistent dedup state ([[graft.operators.DedupState]]) and IVF index
  * persistence ([[graft.operators.IVF.save]]/load): state on disk must be
  * indistinguishable from recomputing — batch-over-store ≡
  * recompute-from-union, reloaded index ≡ trained index.
  */
class DedupStateSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def pairKey(df: DataFrame): Set[(Long, Long, BigDecimal)] =
    df.collect().map { r =>
      (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP))
    }.toSet

  test("batch over the store equals recompute-from-union (sf0.001 documents)") {
    val docs = Tables.table(spark, sf0001, "documents").select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") < 300)
    val fresh = docs.filter(col("doc_id") >= 300)
    val store = DedupState.build(spark, corpus, tmpDir("dstate"))
    val overStore = pairKey(DedupState.incrementalNearDups(store, fresh))
    CacheRegistry.releaseAll()
    val fromScratch = pairKey(Dedup.incrementalNearDups(corpus, fresh))
    CacheRegistry.releaseAll()
    assert(overStore === fromScratch,
      s"only-store=${overStore -- fromScratch} only-scratch=${fromScratch -- overStore}")
    assert(overStore.nonEmpty, "test data produced no near-dup pairs — vacuous")
  }

  test("df-cap flip: a shingle crossing maxDf once the batch arrives " +
       "repairs affected stored signatures exactly") {
    // maxDf = 2; trigram "a b c d e" prefix shingles sit AT the cap in the
    // corpus (docs 1,2) and cross it when fresh doc 10 arrives — the
    // from-scratch run drops them for everyone, so the store must repair
    // docs 1 and 2 before banding or its signatures disagree.
    val corpus = docsDf(
      1L -> "a b c d e f g h i j",
      2L -> "a b c d e f g h i k",
      3L -> "p q r s t u v w x y")
    val fresh = docsDf(
      10L -> "a b c d e f g h i j",
      11L -> "p q r s t u v w x z")
    val store = DedupState.build(spark, corpus, tmpDir("dflip"),
      n = 3, numPerms = 16, bands = 4, maxDf = 2)
    val overStore = pairKey(
      DedupState.incrementalNearDups(store, fresh, threshold = 0.5))
    CacheRegistry.releaseAll()
    val fromScratch = pairKey(Dedup.incrementalNearDups(corpus, fresh,
      threshold = 0.5, maxDf = 2))
    CacheRegistry.releaseAll()
    assert(overStore === fromScratch,
      s"only-store=${overStore -- fromScratch} only-scratch=${fromScratch -- overStore}")
    // the flip genuinely fired: stored signatures were built BEFORE the
    // cap crossed, so the repair set (docs containing a flipped shingle)
    // must be non-empty for this construction
    val flipped = store.shingleDf.filter(col("df") === 2).count()
    assert(flipped > 0, "construction error: no shingle at the cap boundary")
  }

  test("append preserves the storage invariant: append(store, batch) ≡ " +
       "build(corpus ∪ batch), bit-for-bit") {
    val docs = Tables.table(spark, sf0001, "documents").select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") < 200)
    val batch1 = docs.filter(col("doc_id") >= 200 && col("doc_id") < 350)
    val batch2 = docs.filter(col("doc_id") >= 350)
    val appended = DedupState.append(spark,
      DedupState.build(spark, corpus, tmpDir("dappA")), batch1)
    CacheRegistry.releaseAll()
    val rebuilt = DedupState.build(spark,
      corpus.unionByName(batch1), tmpDir("dappC"))
    CacheRegistry.releaseAll()
    def rows(df: DataFrame): Set[Seq[Any]] =
      df.collect().map(r => r.toSeq.map {
        case null => "NULL"; case x => x.toString
      }).toSet
    assert(appended.gen === 1L, "append must commit generation 1")
    assert(rows(appended.shingleDf) === rows(rebuilt.shingleDf))
    assert(rows(appended.posting) === rows(rebuilt.posting))
    assert(rows(appended.fingerprints) === rows(rebuilt.fingerprints))
    assert(rows(appended.signatures.select(rebuilt.signatures.columns.map(col): _*))
      === rows(rebuilt.signatures))
    // generational reads: loadAt(0) still sees EXACTLY the pre-append
    // store — the replay-determinism contract the streaming sink uses
    val asOf0 = DedupState.loadAt(spark, appended.path, 0L)
    val fresh0 = DedupState.build(spark, corpus, tmpDir("dappD"))
    assert(rows(asOf0.posting) === rows(fresh0.posting))
    assert(rows(asOf0.shingleDf) === rows(fresh0.shingleDf))
    CacheRegistry.releaseAll()
    // and a second batch answered over the appended store still equals a
    // from-scratch incremental run over everything admitted so far
    val overStore = pairKey(DedupState.incrementalNearDups(appended, batch2))
    CacheRegistry.releaseAll()
    val fromScratch = pairKey(
      Dedup.incrementalNearDups(corpus.unionByName(batch1), batch2))
    CacheRegistry.releaseAll()
    assert(overStore === fromScratch)
  }

  test("a crashed (uncommitted) generation is invisible: readers take the " +
       "last COMMITTED generation and prune everything newer") {
    val corpus = docsDf(1L -> "a b c d e f", 2L -> "g h i j k l")
    val store = DedupState.build(spark, corpus, tmpDir("dcrash"))
    val grown = DedupState.append(spark, store,
      docsDf(10L -> "m n o p q r"))
    CacheRegistry.releaseAll()
    // simulate an append that died after writing posting rows but before
    // its commit marker: the junk generation must never surface
    Seq((999L, "x y z")).toDF("doc_id", "s")
      .write.parquet(s"${grown.path}/posting/gen=7")
    val re = DedupState.load(spark, grown.path)
    assert(re.gen === 1L, "uncommitted gen 7 must not advance the store")
    assert(re.posting.filter(col("doc_id") === 999L).count() === 0L,
      "uncommitted posting rows must be partition-pruned away")
    CacheRegistry.releaseAll()
  }

  test("an EMPTY corpus is a valid generation 0: build, load, query, and " +
       "the first admission all work (the streaming cold-start path)") {
    val empty = docsDf()
    val store = DedupState.build(spark, empty, tmpDir("dempty"))
    assert(store.gen === 0L)
    assert(store.posting.count() === 0L)
    val fresh = docsDf(1L -> "a b c d e", 2L -> "a b c d e",
      3L -> "f g h i j")
    // corpus is empty, so the only pair is the fresh×fresh exact dup (1,2)
    val pairs = DedupState.incrementalNearDups(store, fresh).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
    CacheRegistry.releaseAll()
    val (kept, next) = DedupState.admit(spark, store, fresh)
    val keptRows = kept.collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    CacheRegistry.releaseAll()
    assert(keptRows === Map(1L -> 2L, 3L -> 1L),
      "in-batch exact dup must collapse even against an empty corpus")
    assert(next.gen === 1L)
    // the grown store now rejects what it admitted
    assert(DedupState.incrementalDedup(next,
      docsDf(10L -> "a b c d e")).count() === 0L)
    CacheRegistry.releaseAll()
  }

  test("replaying an append is idempotent: same source generation, same " +
       "batch → identical committed generation, no double rows") {
    val corpus = docsDf(1L -> "a b c d e f", 2L -> "g h i j k l")
    val dir = tmpDir("dreplay")
    val s0 = DedupState.build(spark, corpus, dir)
    val batch = docsDf(10L -> "m n o p q r")
    def rows(df: DataFrame) = df.collect().map(_.toSeq.map(_.toString)).toSet
    val first = DedupState.append(spark, s0, batch)
    val firstRows = (rows(first.posting), rows(first.shingleDf),
      rows(first.signatures), rows(first.fingerprints))
    CacheRegistry.releaseAll()
    // the at-least-once case: the epoch re-runs from the SAME source view
    val replay = DedupState.append(spark, DedupState.loadAt(spark, dir, 0L),
      batch)
    assert(replay.gen === first.gen)
    assert((rows(replay.posting), rows(replay.shingleDf),
      rows(replay.signatures), rows(replay.fingerprints)) === firstRows)
    CacheRegistry.releaseAll()
  }

  test("compact collapses generations into a base and vacuum drops " +
       "superseded dirs — answers unchanged throughout") {
    val corpus = docsDf(1L -> "a b c d e f g", 2L -> "h i j k l m n")
    val dir = tmpDir("dcompact")
    val s0 = DedupState.build(spark, corpus, dir)
    val s1 = DedupState.append(spark, s0, docsDf(10L -> "o p q r s t u"))
    val s2 = DedupState.append(spark, s1, docsDf(20L -> "v w x y z aa bb"))
    val probe = docsDf(30L -> "a b c d e f zz", 31L -> "o p q r s t u")
    val pre = pairKey(DedupState.incrementalNearDups(s2, probe, threshold = 0.5))
    CacheRegistry.releaseAll()
    assert(pre.nonEmpty, "probe must near-dup against stored docs")
    val compacted = DedupState.compact(spark, s2)
    assert(compacted.gen === 3L)
    def rows(df: DataFrame) = df.collect().map(_.toSeq.map(_.toString)).toSet
    assert(rows(compacted.posting) === rows(s2.posting))
    assert(pairKey(DedupState.incrementalNearDups(compacted, probe,
      threshold = 0.5)) === pre)
    CacheRegistry.releaseAll()
    // pre-vacuum, as-of reads behind the new base still resolve
    assert(DedupState.loadAt(spark, dir, 1L).gen === 1L)
    DedupState.vacuum(spark, compacted)
    // superseded generations are gone: their markers fail fast, the
    // posting dirs are physically deleted, and the base still answers
    intercept[IllegalArgumentException](DedupState.loadAt(spark, dir, 1L))
    assert(!new java.io.File(s"$dir/posting/gen=0").exists)
    val after = DedupState.load(spark, dir)
    assert(after.gen === 3L)
    assert(pairKey(DedupState.incrementalNearDups(after, probe,
      threshold = 0.5)) === pre)
    CacheRegistry.releaseAll()
  }

  test("append(asBase) fuses compaction into the append: one base " +
       "generation, same answers as append-then-compact") {
    val corpus = docsDf(1L -> "a b c d e f", 2L -> "g h i j k l")
    val batch = docsDf(10L -> "m n o p q r")
    val probe = docsDf(30L -> "a b c d e zz", 31L -> "m n o p q zz")
    val fused = DedupState.append(spark,
      DedupState.build(spark, corpus, tmpDir("dfuseA")), batch, asBase = true)
    CacheRegistry.releaseAll()
    val twoStep = DedupState.compact(spark, DedupState.append(spark,
      DedupState.build(spark, corpus, tmpDir("dfuseB")), batch))
    CacheRegistry.releaseAll()
    assert(fused.gen === 1L, "fused base must keep one-generation-per-batch")
    def rows(df: DataFrame) = df.collect().map(_.toSeq.map(_.toString)).toSet
    assert(rows(fused.posting) === rows(twoStep.posting))
    assert(rows(fused.fingerprints) === rows(twoStep.fingerprints))
    val a = pairKey(DedupState.incrementalNearDups(fused, probe, threshold = 0.5))
    CacheRegistry.releaseAll()
    val b = pairKey(DedupState.incrementalNearDups(twoStep, probe, threshold = 0.5))
    CacheRegistry.releaseAll()
    assert(a === b)
    // the fused base supersedes gen 0: vacuum from a LATER view reclaims it
    val after = DedupState.append(spark, fused, docsDf(40L -> "s t u v w x"))
    DedupState.vacuum(spark, after)
    assert(!new java.io.File(s"${fused.path}/posting/gen=0").exists)
    assert(DedupState.load(spark, fused.path).gen === 2L)
    CacheRegistry.releaseAll()
  }

  test("incrementalDedup over the store equals the from-scratch admission " +
       "(exact anti-join + near-dup drop), without corpus text") {
    val docs = Tables.table(spark, sf0001, "documents").select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") < 300)
    val fresh = docs.filter(col("doc_id") >= 300)
    val store = DedupState.build(spark, corpus, tmpDir("dadm"))
    def key(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val overStore = key(DedupState.incrementalDedup(store, fresh))
    CacheRegistry.releaseAll()
    val fromScratch = key(Dedup.incrementalDedup(corpus, fresh))
    CacheRegistry.releaseAll()
    assert(overStore === fromScratch)
    assert(overStore.nonEmpty)
  }

  test("bucketed catalog layout answers identically to plain parquet") {
    val docs = Tables.table(spark, sf0001, "documents").select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") < 300)
    val fresh = docs.filter(col("doc_id") >= 300)
    val plain = DedupState.build(spark, corpus, tmpDir("dplain"))
    val bucketed = DedupState.build(spark, corpus, tmpDir("dbuck"),
      catalog = Some(("dedupstate_spec", 4)))
    val a = pairKey(DedupState.incrementalNearDups(plain, fresh))
    CacheRegistry.releaseAll()
    val b = pairKey(DedupState.incrementalNearDups(bucketed, fresh))
    CacheRegistry.releaseAll()
    assert(a === b)
  }

  test("IVF index round-trips through parquet: same centroids, same neighbors") {
    val emb = Tables.table(spark, sf0001, "embeddings")
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toArray
    val idx = IVF.train(emb, k = 8, iters = 3)
    val dir = tmpDir("ivfidx")
    IVF.save(spark, idx, dir)
    val reloaded = IVF.load(spark, dir)
    // q9-quantized coordinates round-trip bit-exact through parquet
    assert(reloaded.centroids.map(_.toSeq).toSeq === idx.centroids.map(_.toSeq).toSeq)
    def nn(i: IVF.Index) = IVF.neighbors(emb, i, q, 10, nProbe = 4,
      excludeId = Some(0L)).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(nn(reloaded) === nn(idx))
  }

  test("IVF.load fails fast on a corrupt (non-contiguous) store") {
    val dir = tmpDir("ivfbad")
    Seq((0, Seq(1.0, 2.0)), (2, Seq(3.0, 4.0)))
      .toDF("cid", "centroid").write.mode("overwrite").parquet(dir)
    val e = intercept[IllegalArgumentException](IVF.load(spark, dir))
    assert(e.getMessage.contains("non-contiguous"))
  }
}
