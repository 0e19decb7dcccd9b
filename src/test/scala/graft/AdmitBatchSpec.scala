package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{DedupState, HnswGeoStore, IVF}
import graft.pipelines.CorpusPipeline

/** Incremental curation admission ([[CorpusPipeline.admitBatch]]) — the
  * flagship composition's algebra: every ladder arm exercised (quality
  * drop, language gate, within-batch exact collapse, fingerprint drop vs
  * corpus, MinHash near-dup drop vs corpus, routed semantic drop vs the
  * standing geo store, cross-batch semantic and text drops), and the
  * admission-order contract pinned: for id-monotone batches,
  * admit-then-admit ≡ admit-the-union — same kept rows, same standing
  * state content.
  */
class AdmitBatchSpec extends SparkSpec {
  import spark.implicits._

  // ≥ 10 tokens, English marker trigrams, mean token length ≤ 15 — passes
  // the default quality/language gates; distinct enough that unrelated
  // texts share no 3-shingles
  private val t1 = "the quick brown fox jumps over the lazy dog and then " +
    "the small cat walks along the river bank while a bird sings in the " +
    "tall green tree near the old wooden bridge"
  private val t2 = "a steady rain falls on the quiet town and the empty " +
    "streets shine under a pale lamp while the clock tower rings twice " +
    "in the cold night air before the dawn arrives"
  private val t3 = "the captain steers a small boat across the wide bay " +
    "and the morning wind pushes a torn sail toward the rocky shore " +
    "where the old lighthouse still burns a faint light"
  private def lastWordSwap(s: String, w: String): String =
    s.split(' ').dropRight(1).mkString(" ") + " " + w
  private val ta1 = "a young engineer draws the long bridge plan on the " +
    "wide desk and the lamp hums while a kettle warms near the window " +
    "and the city sleeps under a thin fog"
  private val ta2 = "the baker sets a warm loaf on the counter and the " +
    "smell drifts down the narrow street while a child waits by the " +
    "door counting the coins in a small hand"
  private val ta3 = "a slow train crosses the green valley and the " +
    "passengers watch the river bend under the stone arches while the " +
    "evening sun paints the hills in a soft amber glow"
  private val tb1 = "the gardener trims a tall hedge along the brick " +
    "wall and the sparrows scatter into the oak while a neighbor waves " +
    "from the porch holding a cup of warm tea"

  private def docsDf(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")
  private def embDf(rows: (Long, Array[Float])*): DataFrame =
    rows.toDF("vec_id", "embedding")

  private def dump(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("admitBatch: every arm fires, and admit-then-admit equals " +
       "admit-the-union (kept rows and standing state content)") {
    val corpusDocs = docsDf(1L -> t1, 2L -> t2, 3L -> t3)
    val corpusEmb = embDf(
      1L -> Array(1f, 0f, 0f, 0f),
      2L -> Array(0f, 1f, 0f, 0f),
      3L -> Array(0f, 0f, 1f, 0f))
    val batchA = docsDf(
      10L -> "too short",              // quality drop (n_tokens < 10)
      11L -> ta1, 12L -> ta1,          // exact within-batch dup → rep 11
      13L -> lastWordSwap(t1, "night"), // MinHash near-dup of corpus t1
      14L -> ta2,                      // semantic twin of corpus emb 1
      15L -> ta3)                      // novel, NO embedding row
    val embA = embDf(
      11L -> Array(0f, 0f, 0f, 1f),
      13L -> Array(0.5f, 0.5f, 0f, 0f),
      14L -> Array(0.99f, 0.1f, 0f, 0f)) // cos vs emb 1 ≈ 0.995
    val batchB = docsDf(
      20L -> t2,                        // exact copy of corpus text
      21L -> tb1,                       // semantic twin of A's kept 11
      22L -> ("the final report lists a dozen clear findings and the " +
        "committee reads each page twice before the vote"),  // novel
      23L -> lastWordSwap(ta3, "haze")) // near-dup of A's kept 15
    val embB = embDf(
      20L -> Array(0f, 1f, 0f, 0f),
      21L -> Array(0.01f, 0f, 0f, 1f),  // cos vs emb of 11 ≈ 0.99995
      22L -> Array(0.5f, 0.5f, 0.5f, 0.5f))
    val allEmb = corpusEmb.unionByName(embA).unionByName(embB)
    val cfg = CorpusPipeline.Config()

    def seedState(tag: String): CorpusPipeline.CorpusState = {
      val corpus = CorpusPipeline.qualityLang(corpusDocs, cfg)
        .select(col("doc_id"), col("text"))
      val text = DedupState.build(spark, corpus, tmpDir(s"admit-text-$tag"))
      val index = IVF.train(corpusEmb, 2, iters = 3)
      val geo = HnswGeoStore.build(spark, corpusEmb,
        tmpDir(s"admit-geo-$tag"), index)
      CorpusPipeline.CorpusState(text, geo)
    }

    // path 1: admit A, then B
    val (keptA, s1) = CorpusPipeline.admitBatch(spark, seedState("seq"),
      batchA, allEmb, cfg, semanticThreshold = 0.9, nProbe = 8)
    val dumpA = dump(keptA)
    val (keptB, s2) = CorpusPipeline.admitBatch(spark, s1,
      batchB, allEmb, cfg, semanticThreshold = 0.9, nProbe = 8)
    val dumpB = dump(keptB)
    CacheRegistry.releaseAll()

    // per-arm expectations (sequential path)
    val idsA = keptA.select("doc_id").as[Long].collect().toSet
    val idsB = keptB.select("doc_id").as[Long].collect().toSet
    assert(idsA === Set(11L, 15L),
      "A: quality drop 10, dup 12 collapses into 11, text near-dup 13 " +
        s"drops, semantic twin 14 drops — got $idsA")
    assert(keptA.filter(col("doc_id") === 11L)
      .select("dup_count").as[Long].head() === 2L)
    assert(idsB === Set(22L),
      "B: stored-text copy 20 drops, semantic twin 21 of stored 11 " +
        s"drops, near-dup 23 of stored 15 drops — got $idsB")

    // path 2: admit A ∪ B in one batch (ids are monotone across A → B)
    val (keptU, sU) = CorpusPipeline.admitBatch(spark, seedState("uni"),
      batchA.unionByName(batchB), allEmb, cfg,
      semanticThreshold = 0.9, nProbe = 8)
    val dumpU = dump(keptU)
    CacheRegistry.releaseAll()
    assert((dumpA ++ dumpB).sorted === dumpU,
      "admit-then-admit must equal admit-the-union row for row")

    // standing state content equality: stored text fingerprints and
    // stored embedding ids agree (generation/epoch numbering legitimately
    // differs — two appends vs one)
    def fps(st: CorpusPipeline.CorpusState): Set[String] =
      st.text.fingerprints.select("h").as[String].collect().toSet
    def geoIds(st: CorpusPipeline.CorpusState): Set[Long] =
      st.geo.segments.select("vec_id").as[Long].collect().toSet
    assert(fps(s2) === fps(sU))
    assert(geoIds(s2) === geoIds(sU))
    // the geo store holds exactly the admitted docs that HAVE embeddings:
    // corpus 1..3 plus 11 and 22 (15 is kept but embedding-less)
    assert(geoIds(s2) === Set(1L, 2L, 3L, 11L, 22L))
    CacheRegistry.releaseAll()
  }

  test("admitBatch over an ATTRIBUTE-payload geo store: payload columns " +
       "flow through the admission into the new epoch's attrs — the " +
       "curated store stays attr-filter-serveable; a plain store still " +
       "prunes a wide embeddings frame to (vec_id, embedding)") {
    val corpusDocs = docsDf(1L -> t1, 2L -> t2, 3L -> t3)
    val corpusEmb = embDf(
      1L -> Array(1f, 0f, 0f, 0f),
      2L -> Array(0f, 1f, 0f, 0f),
      3L -> Array(0f, 0f, 1f, 0f))
      .withColumn("bucket", pmod(col("vec_id"), lit(2L)))
    val batch = docsDf(11L -> ta1, 12L -> ta2)
    val batchEmb = embDf(
      11L -> Array(0f, 0f, 0f, 1f),
      12L -> Array(0.5f, 0.5f, 0.5f, 0.5f))
      .withColumn("bucket", pmod(col("vec_id"), lit(2L)))
    val cfg = CorpusPipeline.Config()
    val corpus = CorpusPipeline.qualityLang(corpusDocs, cfg)
      .select(col("doc_id"), col("text"))
    val text = DedupState.build(spark, corpus, tmpDir("admit-attr-text"))
    val index = IVF.train(corpusEmb, 2, iters = 3)
    val geo = HnswGeoStore.build(spark, corpusEmb,
      tmpDir("admit-attr-geo"), index)
    val (kept, st1) = CorpusPipeline.admitBatch(spark,
      CorpusPipeline.CorpusState(text, geo), batch,
      corpusEmb.unionByName(batchEmb), cfg,
      semanticThreshold = 0.9, nProbe = 8)
    assert(kept.select("doc_id").as[Long].collect().toSet ===
      Set(11L, 12L))
    // the admitted epoch carries the payloads: the store itself can
    // evaluate a bucket predicate over EVERY live vector, old and new
    val served = HnswGeoStore.batchNeighborsFilteredExpr(st1.geo,
        batchEmb.select(col("vec_id").as("probe_id"), col("embedding"))
          .limit(1),
        col("bucket") === lit(1L), k = 5, efSearch = 32, nProbe = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(served.nonEmpty && served.forall(_ % 2 == 1),
      s"filtered serve must honor the stored bucket payload: $served")
    assert(served.contains(11L),
      "the batch-admitted vector's payload must be serveable")
    CacheRegistry.releaseAll()
  }

  test("admitBatch on sf0.001 documents: kept set equals the q201 " +
       "composition arms replayed relationally") {
    val docs = graft.sources.Tables.table(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val emb = graft.sources.Tables.table(spark, sf0001, "embeddings")
    val cfg = CorpusPipeline.Config(
      permHash = graft.operators.Dedup.Md5PermHash)
    val corpus = CorpusPipeline.qualityLang(
        docs.filter(col("doc_id") < 300), cfg)
      .select(col("doc_id"), col("text"))
    val text = DedupState.build(spark, corpus, tmpDir("admit-sf-text"),
      hashTag = "md5")
    val corpusEmb = emb.select(col("vec_id"), col("embedding"))
      .join(corpus.select(col("doc_id").as("vec_id")),
        Seq("vec_id"), "left_semi")
    val index = IVF.train(corpusEmb, 4, 5, maxTrainRows = 400L)
    val geo = HnswGeoStore.build(spark, corpusEmb,
      tmpDir("admit-sf-geo"), index)
    val (kept, _) = CorpusPipeline.admitBatch(spark,
      CorpusPipeline.CorpusState(text, geo),
      docs.filter(col("doc_id") >= 300), emb, cfg,
      semanticThreshold = 0.35, nProbe = 8)
    val got = kept.select("doc_id").as[Long].collect().toSet
    CacheRegistry.releaseAll()

    // relational replay of the arms: text legs via the operators' own
    // primitives over (corpus ∪ batch), semantic leg via the exact
    // cross/self cosine pairs (4 cells ≤ nProbe 8 → routing exhaustive)
    val ql = CorpusPipeline.qualityLang(
      docs.filter(col("doc_id") >= 300), cfg)
    val reps = ql.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("text"))
    val unseen = reps
      .withColumn("h",
        graft.functions.TextFunctions.md5Fingerprint(col("text")))
      .join(corpus.select(graft.functions.TextFunctions
          .md5Fingerprint(col("text")).as("h")).distinct(),
        Seq("h"), "left_anti")
      .drop("h")
    val pairs = graft.operators.Dedup.minhashNearDups(
      corpus.unionByName(unseen), threshold = 0.8,
      permHash = graft.operators.Dedup.Md5PermHash)
    val textKept = unseen.join(
      pairs.filter(col("j") >= 300).select(col("j").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    val eb = emb.select(col("vec_id"), col("embedding"))
      .join(textKept.select(col("doc_id").as("vec_id")),
        Seq("vec_id"), "left_semi")
    val vsCorp = graft.operators.Similarity.crossNearDups(
        corpusEmb, eb, 0.35)
      .select(col("j").as("vec_id")).distinct()
    val vsBatch = graft.operators.Similarity.cosineNearDups(eb, 0.35)
      .select(greatest(col("i"), col("j")).as("vec_id")).distinct()
    val want = textKept
      .join(vsCorp.unionByName(vsBatch).distinct()
          .select(col("vec_id").as("doc_id")),
        Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    CacheRegistry.releaseAll()
    assert(got === want)
    assert(got.nonEmpty, "vacuous: admission kept nothing")
  }
}
