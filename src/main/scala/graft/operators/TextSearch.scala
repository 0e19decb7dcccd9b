package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Exact phrase search over a tokenized corpus — the positional
  * inverted-index query pattern (Lucene/ES phrase queries, Zipf-aware),
  * expressed as keyed equi-joins a cluster can actually run: no regex scan
  * of every document, no substring kernel over 100 TB of text.
  *
  * The plan: explode each document once into positional postings
  * (term, doc, pos) — the same narrow explode the dedup shingle pipeline
  * uses — then, for a k-term phrase, align the k posting sets by joining on
  * (doc, pos - offset). Every join is a plain shuffled equi-join on
  * (doc_id, adjusted position); each term's postings are filtered AT THE
  * SCAN (`term = 'x'` pushes into the explode-side projection, or into
  * parquet row groups when querying a stored index), so the join inputs
  * are term-selective slivers of the corpus, not the corpus.
  *
  * Join order follows the index playbook: terms are joined RAREST FIRST
  * (corpus df of the phrase terms — k numbers — is computed up front), so
  * the intermediate result after the first join is already bounded by the
  * rarest term's postings and every later join only shrinks it. A stopword
  * in the phrase then costs one probe of a small build side, not a
  * stopword-sized intermediate.
  */
object TextSearch {

  /** Positional posting list for the corpus: (term, idCol, pos), one row
    * per token occurrence.
    */
  def positionalPostings(docs: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "term")))

  /** Documents containing the exact (space-tokenized) `phrase`, with the
    * number of occurrences: (idCol, n_occurrences). Equals the naive
    * token-window scan answer, occurrence for occurrence (overlapping
    * matches count — positions, not disjoint spans).
    */
  def phraseMatches(docs: DataFrame, phrase: String,
                    idCol: String = "doc_id", textCol: String = "text")
      : DataFrame =
    alignPhrase(docs.sparkSession, positionalPostings(docs, idCol, textCol),
      phrase, idCol)

  /** Persist the positional index partitioned by a term hash bucket, so a
    * phrase query reads only its terms' buckets (directory-level partition
    * pruning — the [[EmbeddingStore]] cell trick applied to text). Raw
    * terms would make one directory per vocabulary word (millions at
    * corpus scale); `buckets` bounds the directory count while a k-term
    * phrase still prunes to ≤ k buckets.
    */
  def writeIndex(docs: DataFrame, path: String, buckets: Int = 256,
                 idCol: String = "doc_id", textCol: String = "text"): Unit =
    positionalPostings(docs, idCol, textCol)
      .withColumn("tb", pmod(xxhash64(col("term")), lit(buckets.toLong)))
      .write.mode("overwrite").partitionBy("tb").parquet(path)

  /** [[phraseMatches]] against a stored index: same joins, same answer
    * (spec-pinned), but the corpus is never re-tokenized and the scan is
    * partition-pruned to the phrase terms' buckets before any IO.
    */
  def phraseMatchesIndexed(spark: SparkSession, path: String, phrase: String,
                           buckets: Int = 256, idCol: String = "doc_id")
      : DataFrame = {
    val wanted = phrase.split(" ").filter(_.nonEmpty).distinct
    val wantedBuckets = wanted
      .map(t => ((xxHash(t) % buckets) + buckets) % buckets).distinct
    val postings = spark.read.parquet(path)
      .filter(col("tb").isin(wantedBuckets.toSeq: _*))
      .filter(col("term").isin(wanted.toSeq: _*))
    alignPhrase(spark, postings, phrase, idCol)
  }

  /** The shared alignment plan: df-order the terms (k driver-side numbers
    * — the statistic a deployment reads from its term dictionary), seed
    * with the rarest term's postings shifted to phrase start, and join the
    * rest on (doc, start).
    */
  private def alignPhrase(spark: SparkSession, postings: DataFrame,
                          phrase: String, idCol: String): DataFrame = {
    val terms = phrase.split(" ").filter(_.nonEmpty)
    require(terms.nonEmpty, "phrase search needs a non-empty phrase")
    val dfByTerm: Map[String, Long] = postings
      .filter(col("term").isin(terms.distinct.toSeq: _*))
      .groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a phrase term absent from the corpus → empty result, skip the joins
    if (terms.exists(t => !dfByTerm.contains(t)))
      return spark.emptyDataFrame
        .withColumn(idCol, lit(null).cast("long"))
        .withColumn("n_occurrences", lit(null).cast("long"))
        .limit(0)
    val byRarity = terms.zipWithIndex.sortBy { case (t, _) => dfByTerm(t) }
    val seed = byRarity.head match { case (t, off) =>
      postings.filter(col("term") === t)
        .select(col(idCol), (col("pos") - off).as("start"))
    }
    byRarity.tail.foldLeft(seed) { case (acc, (t, off)) =>
      acc.join(
        postings.filter(col("term") === t)
          .select(col(idCol), (col("pos") - off).as("start")),
        Seq(idCol, "start"))
    }
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_occurrences"))
  }

  /** Driver-side xxhash64 of a UTF-8 string with Spark's seed (42) — must
    * equal the `xxhash64` Column function so [[phraseMatchesIndexed]]
    * prunes to exactly the buckets [[writeIndex]] wrote.
    */
  private def xxHash(s: String): Long = {
    val bytes = s.getBytes("UTF-8")
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
      bytes.length, 42L)
  }

  /** Character trigram posting list: (idCol, gram), DISTINCT per document
    * — the pg_trgm-style index relation behind [[substringMatches]].
    * Pure expression work: a sequence/transform explode, no UDFs.
    */
  def trigramPostings(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame =
    // spread the scan FIRST ([[graft.sources.Tables.ensureParallelism]],
    // the charDuplicateSpans discipline): the per-character trigram
    // explode amplifies ~|text|× INSIDE the scan stage's partitioning —
    // at bench scale that is one task doing the whole corpus's explode
    // while 31 cores idle; at 100 TB the scan is already thousands of
    // splits and the guarded round-robin is a no-op
    graft.sources.Tables.ensureParallelism(docs).select(col(idCol),
        explode(transform(
          // sequence(1, 0) would DESCEND in Spark — guard short texts to
          // an empty gram array instead
          when(length(col(textCol)) >= 3,
            sequence(lit(1), length(col(textCol)) - 2))
            .otherwise(array().cast("array<int>")),
          i => col(textCol).substr(i, lit(3)))).as("gram"))
      .distinct()

  /** Substring search through the trigram filter (the pg_trgm playbook):
    * a document containing `pattern` necessarily contains every character
    * trigram of `pattern`, so candidates = documents whose trigram set
    * covers the pattern's grams (one semi-join-shaped aggregation over
    * the posting slivers of k grams — never a full-text scan predicate
    * pushed at every row), then the exact `contains` verify removes
    * coincidental coverage. Result ≡ the plain
    * `filter(contains(text, pattern))` (q174's oracle IS the plain
    * LIKE), spec-pinned along with the superset property.
    *
    * Patterns shorter than 3 chars have no trigram to prune on and fall
    * back to the plain filter. Output: (idCol) of matching documents.
    */
  def substringMatches(docs: DataFrame, pattern: String,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    require(pattern.nonEmpty, "substring search needs a non-empty pattern")
    val plain = docs.filter(col(textCol).contains(pattern)).select(col(idCol))
    if (pattern.length < 3) plain
    else {
      val grams = pattern.sliding(3).toSeq.distinct
      val cands = trigramPostings(docs, idCol, textCol)
        .filter(col("gram").isin(grams: _*))
        .groupBy(col(idCol)).agg(count(lit(1)).as("__ng"))
        .filter(col("__ng") === grams.size)
        .select(col(idCol))
      docs.join(cands, idCol)
        .filter(col(textCol).contains(pattern))
        .select(col(idCol))
    }
  }
}
