package graft.operators

import org.apache.spark.sql.DataFrame
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
  * SCAN (`term = 'x'` pushes into the explode-side projection), so the join
  * inputs are term-selective slivers of the corpus, not the corpus.
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
    * per token occurrence. Write this once with
    * [[graft.sources.Bucketing.writeBucketed]] on `term` and phrase
    * queries against the stored index skip the explode entirely.
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
      : DataFrame = {
    val terms = phrase.split(" ").filter(_.nonEmpty)
    require(terms.nonEmpty, "phraseMatches needs a non-empty phrase")
    val postings = positionalPostings(docs, idCol, textCol)
    // k driver-side numbers (k = phrase length), the classic index
    // statistic a real deployment reads from the stored term dictionary
    val dfByTerm: Map[String, Long] = postings
      .filter(col("term").isin(terms.distinct: _*))
      .groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a phrase term absent from the corpus → empty result, skip the joins
    if (terms.exists(t => !dfByTerm.contains(t)))
      return docs.sparkSession.emptyDataFrame
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
}
