package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Dedup

/** End-to-end training-corpus curation — the composition every LLM data
  * pipeline runs over raw documents, expressed as one lazy plan plus the
  * dedup pass:
  *
  *   quality filter (cheap, pure expressions — runs IN the scan)
  *   → language filter (marker-trigram argmax)
  *   → exact + near-duplicate removal ([[Dedup.dedupCorpus]])
  *   → per-document features (token counts, fingerprint) for downstream
  *     sampling/mixing.
  *
  * Order is the scale decision: the quality and language predicates are
  * O(row) projections that prune BEFORE the dedup pass pays its shuffles,
  * and exact-collapse runs before signature near-dup (see dedupCorpus).
  * Everything upstream of dedup is whole-stage-codegen'd expression work
  * with zero UDFs.
  */
object CorpusPipeline {

  /** Tunable curation thresholds (defaults are conventional, not sacred).
    * `normalizeText = true` prepends [[TextFunctions.cleanText]] (control
    * strip → whitespace collapse → NFC) so decomposed/precomposed
    * renderings of the same text collapse BEFORE exact dedup hashes them —
    * the right default for scraped corpora; opt-in here so existing
    * pipelines keep byte-stable outputs. `permHash` selects the MinHash
    * permutation hash: seeded xxhash64 by default, [[Dedup.Md5PermHash]]
    * for oracle-replayable runs (q85 pins the full composition bitwise).
    */
  case class Config(
      minTokens: Int = 10,
      maxMeanTokenLength: Double = 15.0,
      minStopwordRatio: Double = 0.0,
      languages: Seq[String] = Seq("en"),
      dedupThreshold: Double = 0.8,
      normalizeText: Boolean = false,
      permHash: (org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column =
        Dedup.XxPermHash)

  /** Curate `docs(doc_id, text, ...)` → kept rows with feature columns
    * (`n_tokens`, `subword_tokens`, `fingerprint`, `dup_count`,
    * `predicted_lang`).
    *
    * The returned frame is lazy and reuses intermediates persisted via
    * [[graft.CacheRegistry]]; after consuming the result (write/collect),
    * call `CacheRegistry.releaseAll()` to free them.
    */
  def curate(docs: DataFrame, config: Config = Config()): DataFrame = {
    val normalized =
      if (config.normalizeText)
        docs.withColumn("text", TextFunctions.cleanText(col("text")))
      else docs
    // persisted: consumed by the dedup pass AND re-joined for the feature
    // columns — without it the 25-regex langId and quality projections
    // (the most expensive per-row work here) would run once per consumer
    val quality = graft.CacheRegistry.persist(normalized
      .withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
      .withColumn("mean_tok_len", TextFunctions.meanTokenLength(col("text")))
      .withColumn("stop_ratio", TextFunctions.stopwordRatio(col("text")))
      .filter(col("n_tokens") >= config.minTokens &&
        col("mean_tok_len") <= config.maxMeanTokenLength &&
        col("stop_ratio") >= config.minStopwordRatio)
      .withColumn("predicted_lang", TextFunctions.langId(col("text")))
      .filter(col("predicted_lang").isin(config.languages: _*)))
    val deduped = Dedup.dedupCorpus(
      quality.select(col("doc_id"), col("text")), config.dedupThreshold,
      permHash = config.permHash)
    deduped
      .join(quality.drop("text"), Seq("doc_id"))
      .withColumn("subword_tokens", TextFunctions.subwordCount(col("text")))
      .withColumn("fingerprint", TextFunctions.md5Fingerprint(col("text")))
  }

  /** [[curate]] extended with the SEMANTIC leg — the full curation
    * ladder a 100 TB training corpus runs, as one composition:
    *
    *   quality filter → language filter → exact + MinHash near-dup
    *   removal (the text route, [[curate]] unchanged)
    *   → embedding near-dup pairs over the SURVIVORS through the
    *     geometry-routed graph index ([[Dedup.hnswNearDupPairs]] — the
    *     100 TB semantic-dedup default; n·nProbe probe rows, linear)
    *   → transitive closure → keep ONE representative per semantic
    *     cluster by the (n_tokens desc, doc_id asc) argmax
    *     (SemDeDup's keep-the-best-copy policy, Abbas et al. 2023).
    *
    * Output is [[curate]]'s frame with non-representative semantic
    * cluster members REMOVED — the semantic leg is a row filter, so
    * every feature column survives unchanged. Documents without an
    * embedding row never enter the pair graph and are implicitly kept
    * (both engines agree: no pair, no drop).
    *
    * Scale shape: the text legs are [[curate]]'s (scan-side expressions
    * + bucketed equi-joins); the semantic leg inherits the routed
    * scan's linear shuffle bound, the closure runs over the PAIR graph
    * (not the corpus), and the final drop is one doc-keyed anti-join.
    *
    * @param emb (vec_id, embedding) with vec_id = doc_id
    */
  def curateSemantic(docs: DataFrame, emb: DataFrame,
                     config: Config = Config(),
                     semanticThreshold: Double = 0.95, shards: Int = 0,
                     nProbe: Int = graft.operators.Hnsw.DefaultNearDupNProbe,
                     route: String = "auto"): DataFrame = {
    val curated = graft.CacheRegistry.persist(curate(docs, config))
    val embKept = emb.select(col("vec_id"), col("embedding"))
      .join(curated.select(col("doc_id").as("vec_id")),
        Seq("vec_id"), "left_semi")
    val comps = Dedup.connectedComponents(
      Dedup.hnswNearDupPairs(embKept, semanticThreshold, shards,
        nProbe = nProbe, route = route))
    val reps = Dedup.clusterRepresentatives(comps,
      curated.select(col("doc_id"), col("n_tokens")), "n_tokens")
    val drops = comps
      .join(reps.select(col("cluster"), col("keep_id")), "cluster")
      .filter(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id"))
    curated.join(drops, Seq("doc_id"), "left_anti")
  }

  /** Per-source dataset card — the one-table summary a data consumer
    * reads before touching a corpus: volume (docs/chars/tokens),
    * exact-duplicate pressure (docs minus distinct content fingerprints),
    * declared-language share, and mean readability ([[TextFunctions
    * .fleschReadingEase]]) and character entropy
    * ([[TextFunctions.charEntropy]]) as quality centroids.
    *
    * Scale shape: every per-document signal is a scan-side expression;
    * the exact-distinct fingerprint makes Catalyst plan the two-phase
    * single-distinct rewrite — dedupe (source, fingerprint) with partial
    * sums riding along, then finalize — so both Exchanges ship hash-sized
    * rows, never text, and every aggregate stays hash-based (plan-audited:
    * no Expand). Float contract: the per-doc
    * quality scores are already 1e-4/1e-6-quantized; their sums ride
    * scaled longs, so the means are order-free and engine-replayable.
    */
  def datasetCard(docs: DataFrame): DataFrame = {
    val n = count(lit(1))
    val flesch4 = round(TextFunctions.fleschReadingEase(col("text")) * 1e4)
      .cast("long")
    val entropy6 = round(TextFunctions.charEntropy(col("text")) * 1e6)
      .cast("long")
    docs.groupBy(col("source"))
      .agg(n.as("n_docs"),
        sum(col("n_chars")).as("chars"),
        sum(TextFunctions.tokenCount(col("text"))).as("tokens"),
        (n - countDistinct(TextFunctions.md5Fingerprint(col("text"))))
          .as("n_dup_docs"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
        (round(sum(flesch4).cast("double") / n) / 1e4).as("mean_flesch"),
        (round(sum(entropy6).cast("double") / n) / 1e6).as("mean_entropy"))
  }
}
