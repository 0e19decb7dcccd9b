package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-statistics document scoring — the model-free quality/relevance
  * signals a training-data pipeline runs at ingest:
  *
  *  - [[unigramLogProbScore]] — per-document average token log-probability
  *    under the corpus's own unigram distribution. The cheap stand-in for
  *    perplexity filtering (CCNet-style): documents whose tokens are
  *    globally rare score low; gibberish and boilerplate separate from the
  *    bulk. One explode + two aggregations + one broadcast-sized join.
  *  - [[bm25]] — classic BM25 term relevance for a literal query, for
  *    corpus search / targeted curation ("find the docs about X and
  *    upweight them").
  *
  * 100 TB plan shape: token stats are one map-side-combined groupBy over
  * the exploded scan (shuffle carries (token, count) partials, never raw
  * token streams); the vocabulary is small relative to the corpus (Heaps'
  * law) so the stats join back to the exploded stream is a BROADCAST join
  * (hinted explicitly); the per-document reduce shuffles one row per
  * (doc, term-hit). Global scalars (total tokens, doc count, avg doc
  * length) ride one-row broadcast frames, never a driver collect.
  *
  * Bitwise-oracle contract: per-token log terms are quantized to 1e-6
  * integers BEFORE the per-document sum (integer sums are order-exact;
  * raw double sums are not), and every scalar constant is interpolated
  * into the oracle SQL from the same Scala double so both engines parse
  * identical values.
  */
object Scoring {

  /** (token, lp6) — corpus unigram log-probs as 1e-6-quantized integers,
    * plus the (total-token, distinct-token) one-row frame joined in.
    */
  private def tokens(docs: DataFrame, text: String): DataFrame =
    docs.select(col("doc_id"), explode(split(col(text), " ")).as("t"))

  /** Per-group token-distribution drift: KL(P_group ‖ P_corpus) over the
    * unigram distributions — the mixture-drift monitor of a curation
    * pipeline (a source whose token mix diverges from the corpus gets
    * flagged before it skews training).
    *
    * Replay discipline (q48's contract, pushed through a weighted sum):
    * each token's log-ratio is quantized to a 1e-6 integer and weighted
    * by the INTEGER group count — the per-group sum is exact long
    * arithmetic, order-independent — and only the final division returns
    * to doubles. Plan: one explode → (group, token) counts; token totals
    * and group totals derive from THAT aggregate (no second pass over the
    * corpus); both side tables broadcast (vocabulary- and group-sized).
    *
    * Output: (groupCol, n_tokens, kl); kl ≥ 0 up to quantization, 0 for a
    * group that matches the corpus mix exactly.
    */
  def tokenKlDivergence(docs: DataFrame, groupCol: String = "source",
                        text: String = "text"): DataFrame = {
    val toks = docs.select(col(groupCol).as("g"),
      explode(split(col(text), " ")).as("t"))
    val cst = toks.groupBy("g", "t").agg(count(lit(1)).as("cst"))
    val ct = cst.groupBy("t").agg(sum(col("cst")).as("ct"))
    val ns = cst.groupBy("g").agg(sum(col("cst")).as("ns"))
    val n = ns.agg(sum(col("ns")).as("n"))
    cst.join(broadcast(ct), "t")
      .join(broadcast(ns), "g")
      .crossJoin(broadcast(n))
      .select(col("g"), col("ns"),
        (col("cst") *
          round(log((col("cst") * col("n")) / (col("ns") * col("ct"))) * 1e6)
            .cast("long")).as("term"))
      .groupBy(col("g"))
      .agg(first(col("ns")).as("n_tokens"), sum(col("term")).as("s"))
      .select(col("g").as(groupCol), col("n_tokens"),
        (col("s") / 1e6 / col("n_tokens")).as("kl"))
  }

  /** Per-document mean token log-probability under the corpus unigram
    * model, `round`-stabilized for cross-engine replay. Output:
    * (doc_id, n_tokens, lp) with lp = mean over tokens of
    * round(ln(count(t)/total)·1e6)/1e6.
    */
  def unigramLogProbScore(docs: DataFrame, text: String = "text"): DataFrame = {
    val toks = tokens(docs, text)
    val stats = toks.groupBy("t").agg(count(lit(1)).as("cnt"))
    val total = stats.agg(sum(col("cnt")).cast("double").as("n"))
    val lp = stats.crossJoin(broadcast(total))
      .select(col("t"), round(log(col("cnt") / col("n")) * 1e6).as("lp6"))
    toks.join(broadcast(lp), "t")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        ((sum(col("lp6")) / 1e6) / count(lit(1))).as("lp"))
  }

  /** Per-document mean BIGRAM log-probability under an add-k-smoothed
    * corpus bigram model — the step past [[unigramLogProbScore]] toward
    * CCNet's LM-perplexity quality filter (Wenzek et al. 2020): word
    * salad with plausible unigrams scores fine under a unigram model and
    * collapses under a bigram one.
    *
    * Model: P(w₂|w₁) = (c(w₁w₂) + k) / (c(w₁·) + k·V), V = corpus
    * distinct-token count (add-k over the full vocabulary, so unseen
    * continuations of a seen context are finite). Per-bigram log terms
    * are 1e-6-quantized and summed as longs (the replay discipline).
    *
    * Scale shape: the model tables are AGGREGATES (distinct bigrams /
    * distinct contexts — vocabulary-sized, not corpus-sized); the only
    * fact-scale operation is one shuffle join of the bigram stream
    * against the per-bigram log-prob table, keyed by the bigram string.
    * V rides a one-row broadcast. Nothing unbounded is ever broadcast.
    *
    * Bigram keys join the two tokens with U+0001 ([[graft.operators.
    * Vocabulary.BpeSep]]'s reservation: tokens are space-split and must
    * not contain it). Documents with fewer than two tokens have no
    * bigrams and do not appear.
    *
    * Output: (doc_id, n_bigrams, lp), lp = Σround(ln P·1e6)/1e6 / n.
    */
  def bigramLogProbScore(docs: DataFrame, text: String = "text",
                         kSmooth: Double = 1.0): DataFrame = {
    require(kSmooth > 0, s"add-k smoothing needs k > 0, got $kSmooth")
    val sep = "\u0001"
    val toks = docs.select(col("doc_id"), split(col(text), " ").as("ts"))
    // sequence(1, n-1) REVERSES for n = 1 (Spark generates descending
    // sequences when start > stop) — guard short docs to an empty array
    val bi = toks.select(col("doc_id"),
      explode(when(size(col("ts")) >= 2,
        transform(sequence(lit(1), size(col("ts")) - 1),
          i => concat(element_at(col("ts"), i), lit(sep),
            element_at(col("ts"), i + 1))))
        .otherwise(array().cast("array<string>"))).as("bg"))
    val cBi = bi.groupBy("bg").agg(count(lit(1)).as("cb"))
      .withColumn("w1", substring_index(col("bg"), sep, 1))
    val cCtx = cBi.groupBy("w1").agg(sum(col("cb")).as("cw"))
    val vocab = docs.select(explode(split(col(text), " ")).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    val lpBi = cBi.join(cCtx, "w1").crossJoin(broadcast(vocab))
      .select(col("bg"),
        round(log((col("cb") + lit(kSmooth)) /
          (col("cw") + lit(kSmooth) * col("v"))) * 1e6).cast("long")
          .as("lp6"))
    bi.join(lpBi, "bg")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        ((sum(col("lp6")) / 1e6) / count(lit(1))).as("lp"))
  }

  /** [[bigramLogProbScore]]'s DuckDB replay (k interpolated from the same
    * Scala double).
    */
  def bigramOracleSql(kSmooth: Double = 1.0): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
       |), bi AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(ts)),
       |    i -> ts[i] || chr(1) || ts[i + 1])) AS bg
       |  FROM toks
       |), cbi AS (
       |  SELECT bg, COUNT(*) AS cb, string_split(bg, chr(1))[1] AS w1
       |  FROM bi GROUP BY 1
       |), cctx AS (
       |  SELECT w1, CAST(SUM(cb) AS BIGINT) AS cw FROM cbi GROUP BY 1
       |), vocab AS (
       |  SELECT COUNT(DISTINCT t) AS v FROM (
       |    SELECT unnest(string_split(text, ' ')) AS t FROM documents)
       |), lp AS (
       |  SELECT bg, CAST(round(ln((cb + $kSmooth) / (cw + $kSmooth * v))
       |    * 1000000.0) AS BIGINT) AS lp6
       |  FROM cbi JOIN cctx USING (w1), vocab
       |)
       |SELECT doc_id, COUNT(*) AS n_bigrams,
       |       (SUM(lp6) / 1000000.0) / COUNT(*) AS lp
       |FROM bi JOIN lp USING (bg)
       |GROUP BY doc_id""".stripMargin

  /** BM25 scores of every document against literal query `terms`; top `k`
    * by (score desc, doc_id) for a deterministic result set. Standard
    * Robertson/Sparck-Jones BM25 with the +1 idf floor (Lucene's form):
    * idf = ln((N − df + 0.5)/(df + 0.5) + 1).
    */
  def bm25(docs: DataFrame, terms: Seq[String], k: Int = 20,
           k1: Double = 1.2, b: Double = 0.75, text: String = "text"): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = tokens(docs, text)
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    // one-row frame: doc count + average doc length (exact: integer sum)
    val globals = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val df_ = toks.filter(col("t").isin(terms: _*))
      .groupBy("t").agg(countDistinct(col("doc_id")).as("df"))
    val tf = toks.filter(col("t").isin(terms: _*))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val idf = df_.crossJoin(broadcast(globals))
      .select(col("t"), col("n_docs"), col("avgdl"),
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
          .as("idf"))
    val perTerm = tf.join(broadcast(idf), "t").join(dl, "doc_id")
      .select(col("doc_id"),
        round(col("idf") * (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl") / col("avgdl"))))
          * 1e6).as("s6"))
    perTerm.groupBy("doc_id").agg((sum(col("s6")) / 1e6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** The DuckDB replay of [[unigramLogProbScore]] over table `documents` —
    * kept beside the operator so one definition change updates both
    * engines.
    */
  def unigramOracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
      |), stats AS (
      |  SELECT t, COUNT(*) AS cnt FROM toks GROUP BY 1
      |), total AS (
      |  SELECT CAST(SUM(cnt) AS DOUBLE) AS n FROM stats
      |), lp AS (
      |  SELECT t, round(ln(cnt / n) * 1000000.0) AS lp6 FROM stats, total
      |)
      |SELECT doc_id, COUNT(*) AS n_tokens,
      |       (SUM(lp6) / 1000000.0) / COUNT(*) AS lp
      |FROM toks JOIN lp USING (t)
      |GROUP BY doc_id""".stripMargin

  /** The DuckDB replay of [[bm25]]; constants are interpolated from the
    * same Scala doubles the Spark plan uses (`Double.toString` round-trips
    * exactly), so both engines arithmetic on identical values.
    */
  def bm25OracleSql(terms: Seq[String], k: Int = 20,
                    k1: Double = 1.2, b: Double = 0.75): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
       |), dl AS (
       |  SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1
       |), globals AS (
       |  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl
       |), dfs AS (
       |  SELECT t, COUNT(DISTINCT doc_id) AS df FROM toks
       |  WHERE t IN ($termList) GROUP BY 1
       |), tf AS (
       |  SELECT doc_id, t, COUNT(*) AS tf FROM toks
       |  WHERE t IN ($termList) GROUP BY 1, 2
       |), idf AS (
       |  SELECT t, n_docs, avgdl,
       |         ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) AS idf
       |  FROM dfs, globals
       |), per_term AS (
       |  SELECT doc_id,
       |         round(idf * (tf * ${k1 + 1}) /
       |               (tf + $k1 * (1.0 - $b + $b * (dl / avgdl))) * 1000000.0) AS s6
       |  FROM tf JOIN idf USING (t) JOIN dl USING (doc_id)
       |)
       |SELECT doc_id, SUM(s6) / 1000000.0 AS score FROM per_term
       |GROUP BY doc_id ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin
  }

  /** Top-`k` TF-IDF keywords per document — the cheap topic signal a
    * curation pipeline uses for domain mixing and per-bucket sampling
    * quotas. idf = ln(N/df), quantized to a 1e-6 integer BEFORE the
    * tf multiply, so the per-term score is an exact integer product
    * (`tf * idf6`) in both engines and the only float op left is the final
    * display division. Ties (same score within a doc) break by term text
    * ascending, so the emitted set is deterministic.
    *
    * 100 TB plan shape: one map-side-combined (doc, term) count over the
    * exploded scan; the per-TERM df table is vocabulary-sized (Heaps' law)
    * and joins back by BROADCAST; the top-k is a per-doc window over the
    * (doc, distinct-term) rows — partitioned by doc_id, never global.
    * Output: (doc_id, term, tf, score), k rows per doc (fewer for short
    * docs).
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3, text: String = "text"): DataFrame = {
    require(k >= 1, s"tfidfTopTerms needs k >= 1, got $k")
    val toks = tokens(docs, text)
    val tf = toks.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val idf = tf.groupBy("t").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .select(col("t"), round(log(col("n_docs") / col("df")) * 1e6).as("idf6"))
    val perDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("s6").desc, col("t").asc)
    tf.join(broadcast(idf), "t")
      .select(col("doc_id"), col("t"), col("tf"), (col("tf") * col("idf6")).as("s6"))
      .withColumn("rank", row_number().over(perDoc))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("t").as("term"), col("tf"),
        (col("s6") / 1e6).as("score"))
  }

  /** DuckDB replay of [[tfidfTopTerms]] over table `documents`. */
  def tfidfOracleSql(k: Int = 3): String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
       |), tf AS (
       |  SELECT doc_id, t, COUNT(*) AS tf FROM toks GROUP BY 1, 2
       |), n AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents
       |), idf AS (
       |  SELECT t, round(ln(n_docs / COUNT(*)) * 1000000.0) AS idf6
       |  FROM tf, n GROUP BY t, n_docs
       |), scored AS (
       |  SELECT doc_id, t, tf, tf * idf6 AS s6,
       |         row_number() OVER (PARTITION BY doc_id
       |                            ORDER BY tf * idf6 DESC, t ASC) AS rank
       |  FROM tf JOIN idf USING (t)
       |)
       |SELECT doc_id, t AS term, tf, s6 / 1000000.0 AS score
       |FROM scored WHERE rank <= $k""".stripMargin

  /** Per-group feature standardization: z-score and min-max of `value`
    * within its `group` — the normalization pass between raw quality
    * signals and a global threshold (per-language/per-source score
    * distributions differ; thresholding unnormalized scores biases the
    * corpus mix).
    *
    * One stats aggregation (map-side partial) joined back to the facts —
    * the group-stats frame is dimension-sized, so AQE broadcasts it and
    * the fact side never reshuffles. Cross-engine exactness: moments are
    * computed from cent-quantized sums (integer-valued double sums are
    * order-exact; variance = (Σx² − (Σx)²/n)/(n−1) over identical
    * operands), not `stddev` (whose merge order is engine-dependent).
    * Outputs round to 6 decimals; min-max is null for a constant group
    * (max = min), z null for a single-row group (n = 1).
    */
  def standardizeByGroup(df: DataFrame, group: Column, value: Column,
                         keep: Seq[String]): DataFrame = {
    val cents = round(value * 100)
    val stats = df.groupBy(group.as("grp")).agg(
      count(lit(1)).as("n"),
      (sum(cents) / 100).as("s1"),
      (sum(cents * cents) / 10000).as("s2"),
      min(value).as("mn"), max(value).as("mx"))
    // ANSI-safe degenerate guards (Spark 4 throws on ÷0): a single-row
    // group has no sample variance (n−1 = 0), a constant group has sd 0 —
    // both yield null z via null-propagating `when` divisors, never a
    // DIVIDE_BY_ZERO
    val mean = col("s1") / col("n")
    val sd = sqrt((col("s2") - col("s1") * col("s1") / col("n")) /
      when(col("n") > 1, col("n") - 1))
    df.select((keep.map(col) :+ group.as("grp") :+ value.as("v")): _*)
      .join(stats, "grp")
      .select(keep.map(col) :+ col("grp") :+ col("v") :+
        round((col("v") - mean) / when(sd > 0, sd), 6).as("z") :+
        round((col("v") - col("mn")) /
          when(col("mx") =!= col("mn"), col("mx") - col("mn")), 6)
          .as("minmax"): _*)
  }

  /** Percentile-rank normalization per group — the calibration step before
    * MIXING quality scores across heterogeneous sources: a raw score's
    * scale is source-specific (a web crawl's "good" length is a code
    * repo's "short"), so a global threshold filters sources unevenly;
    * ranking each score WITHIN its source maps every group onto the same
    * [0, 1] scale and a single corpus-wide cut keeps the same top share
    * of each source. [[standardizeByGroup]] is the parametric flavor
    * (assumes roughly normal scores); percentile rank is the
    * distribution-free one.
    *
    * `pct` = `percent_rank()` over (group, value asc): (rank − 1) /
    * (n − 1), ties share the rank of their first member, a single-row
    * group scores 0 — identical semantics in any SQL engine, and a pure
    * function of the group's value multiset (partitioning-invariant).
    * 1e-6-quantized. One keyed window — partitions by group, never
    * global; a hot group costs one task sorting its own rows.
    */
  /** Reciprocal rank fusion (Cormack, Clarke & Büttcher 2009) — combine
    * ranked lists from INCOMMENSURABLE scorers (BM25 scores and cosine
    * similarities share no scale, but their RANKS do):
    * `rrf(d) = Σ_r 1/(rrfK + rank_r(d))` over the rankers that list d.
    * The standard first move when a pipeline has both lexical and
    * embedding retrieval and no trained re-ranker.
    *
    * Each contribution quantizes to `round(1e6/(rrfK+rank))` BEFORE the
    * sum (exact longs, order-free — the engine's replay discipline;
    * sub-1e-6 fusion differences are far below any rank-relevant gap).
    * Inputs are (frame, idCol, scoreCol) triples whose frames are
    * ALREADY top-k cut by their own operators, so the rank windows and
    * the fusion run on audit-sized data; ranks recompute here by
    * (score desc, id asc) — the same total order every ranker in this
    * engine emits. Output: (id, rrf, n_rankers) top-`topK` by
    * (rrf desc, id).
    */
  def rrfFuse(rankings: Seq[(DataFrame, String, String)],
              topK: Int = 10, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    require(rrfK >= 1, s"rrfK must be >= 1, got $rrfK")
    val contribs = rankings.map { case (df, idCol, scoreCol) =>
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("__s").desc, col("id").asc)
      df.select(col(idCol).cast("long").as("id"), col(scoreCol).as("__s"))
        .withColumn("__r", row_number().over(w))
        .select(col("id"),
          round(lit(1000000.0) / (lit(rrfK) + col("__r")))
            .cast("long").as("__c6"))
    }.reduce(_.unionByName(_))
    contribs.groupBy("id")
      .agg((sum(col("__c6")) / 1e6).as("rrf"),
        count(lit(1)).as("n_rankers"))
      .orderBy(col("rrf").desc, col("id").asc)
      .limit(topK)
  }

  def percentileNormalize(df: DataFrame, group: Column, value: Column,
                          keep: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("v").asc)
    df.select(keep.map(col) :+ group.as("grp") :+ value.as("v"): _*)
      .withColumn("pct", round(percent_rank().over(w) * 1e6) / 1e6)
  }
}
