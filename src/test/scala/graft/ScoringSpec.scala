package graft

import org.apache.spark.sql.functions._
import graft.operators.{Decontaminate, Scoring}

class ScoringSpec extends SparkSpec {
  import spark.implicits._

  test("unigram log-prob score: uniform two-token corpus gives ln(1/2) everywhere") {
    val docs = Seq((1L, "a a b"), (2L, "b")).toDF("doc_id", "text")
    val r = Scoring.unigramLogProbScore(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    // 4 tokens total, each token type has count 2 → every token lp = ln(0.5);
    // replicate the operator's exact arithmetic: (Σ lp6 / 1e6) / n_tokens
    val lp6 = math.round(math.log(0.5) * 1e6).toDouble
    assert(r(1L) === ((3L, 3 * lp6 / 1e6 / 3)))
    assert(r(2L) === ((1L, lp6 / 1e6 / 1)))
  }

  test("rarer tokens score lower than common ones") {
    val docs = Seq((1L, "x x x x x x x"), (2L, "q")).toDF("doc_id", "text")
    val r = Scoring.unigramLogProbScore(docs).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(2L) < r(1L), s"rare-token doc must score lower: $r")
  }

  test("bm25 ranks the term-dense doc first and respects the limit") {
    val docs = Seq(
      (1L, "spark spark spark join"),
      (2L, "spark join merge sort"),
      (3L, "table scan filter agg"),
      (4L, "spark spark join merge")).toDF("doc_id", "text")
    val top = Scoring.bm25(docs, Seq("spark"), k = 2).collect()
    assert(top.length === 2)
    assert(top(0).getLong(0) === 1L, "highest tf wins on a single-term query")
    assert(top.forall(_.getDouble(1) > 0))
    intercept[IllegalArgumentException](Scoring.bm25(docs, Seq.empty))
  }

  test("contamination: hand-built overlap gives the exact fraction") {
    // eval doc trigrams: "a b c", "b c d" — train contains "a b c" only
    val docs = Seq(
      (1L, "a b c d", true),
      (2L, "z a b c z", false),
      (3L, "unrelated text entirely here", false))
      .toDF("doc_id", "text", "is_eval")
    val r = Decontaminate.contamination(docs, col("is_eval")).collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 2L && r(0).getLong(2) === 1L)
    assert(r(0).getDouble(3) === 0.5)
  }

  test("hashed scale path agrees with the exact path at collision-free size") {
    val docs = Tables("documents")
    val isEval = col("source") === "src0"
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(key(Decontaminate.contamination(docs, isEval)) ===
      key(Decontaminate.contaminationHashed(docs, isEval)))
  }

  test("bloom scale path: pointwise upper bound with no false negatives, " +
      "exact at generous sizing") {
    val docs = Tables("documents")
    val isEval = col("source") === "src0"
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = m(Decontaminate.contamination(docs, isEval))
    // generously sized: fpp is tiny, so the probe should match the join
    val bloom = m(Decontaminate.contaminationBloom(docs, isEval,
      expectedTrainShingles = 1000000L))
    assert(bloom.keySet === exact.keySet)
    exact.foreach { case (doc, (nSh, cont)) =>
      assert(bloom(doc)._1 === nSh, s"doc $doc n_shingles")
      assert(bloom(doc)._2 >= cont,
        s"doc $doc: bloom must never under-report ($cont -> ${bloom(doc)._2})")
    }
    assert(bloom === exact, "at ~1e-26 fpp the bloom audit equals the join audit")
    intercept[IllegalArgumentException](
      Decontaminate.contaminationBloom(docs, isEval, 0L))
  }

  test("tfidf keywords: corpus-common terms score zero, distinctive terms win") {
    val docs = Seq(
      (1L, "shared shared alpha alpha alpha"),
      (2L, "shared beta"),
      (3L, "shared gamma gamma")).toDF("doc_id", "text")
    val r = Scoring.tfidfTopTerms(docs, k = 2).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getDouble(3)))
    val byDoc = r.groupBy(_._1)
    // idf("shared") = ln(3/3) = 0 → never the top keyword; idf(unique) = ln 3
    val ln3q = math.round(math.log(3.0) * 1e6).toDouble
    assert(byDoc(1L).head === ((1L, "alpha", 3L, 3 * ln3q / 1e6)))
    assert(byDoc(2L).head === ((2L, "beta", 1L, ln3q / 1e6)))
    assert(byDoc(3L).head === ((3L, "gamma", 2L, 2 * ln3q / 1e6)))
    // k=2 emits the zero-scoring shared term second, tie-broken by text
    assert(byDoc(1L).map(_._2).toSet === Set("alpha", "shared"))
    assert(r.forall(x => byDoc(x._1).length <= 2))
  }

  test("standardizeByGroup: hand-computed z/minmax; degenerate groups go null") {
    val df = Seq(
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
      ("b", 4L, 5.0),                 // single row: n−1 = 0 → z null; mx = mn → minmax null
      ("c", 5L, 7.0), ("c", 6L, 7.0)) // constant group: sd 0 → 0/0 → z null
      .toDF("g", "id", "v")
    val out = Scoring.standardizeByGroup(df, col("g"), col("v"), Seq("id"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(3)), Option(r.get(4))))).toMap
    // group a: mean 2, var ((1+4+9) − 36/3)/2 = 1 → sd 1
    assert(out(1L) === ((Some(-1.0), Some(0.0))))
    assert(out(2L) === ((Some(0.0), Some(0.5))))
    assert(out(3L) === ((Some(1.0), Some(1.0))))
    assert(out(4L) === ((None, None)))
    assert(out(5L) === ((None, None)))
    assert(out(6L) === ((None, None)))
  }

  test("tokenKlDivergence: corpus-matching group scores 0; skewed group " +
       "matches the hand formula; kl never negative") {
    // corpus mix: x=10, y=2. Group a runs 3:1, group b all-x — both
    // diverge from the 5:1 corpus, so both KLs are positive and equal
    // the hand-quantized formula below.
    val docs = Seq(
      ("a", "x x x y"), ("a", "x x x y"),
      ("b", "x x x x")).toDF("source", "text")
      .withColumn("doc_id", monotonically_increasing_id())
    val r = Scoring.tokenKlDivergence(docs).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    // replicate the operator's quantized arithmetic exactly
    def q(v: Double) = math.round(v * 1e6)
    // corpus: 12 tokens, x=10, y=2. group a: 8 tokens, x=6, y=2.
    val aTerm = 6 * q(math.log(6.0 * 12 / (8 * 10))) +
                2 * q(math.log(2.0 * 12 / (8 * 2)))
    val bTerm = 4 * q(math.log(4.0 * 12 / (4 * 10)))
    assert(r("a") === ((8L, aTerm / 1e6 / 8)))
    assert(r("b") === ((4L, bTerm / 1e6 / 4)))
    assert(r("b")._2 > 0.0, "divergent group must have positive KL")
    // identical-mix group is 0 up to quantization of exact log ratios
    val uniform = Seq(("a", "x y"), ("b", "x y")).toDF("source", "text")
    Scoring.tokenKlDivergence(uniform).collect()
      .foreach(x => assert(x.getDouble(2) === 0.0,
        "group matching the corpus mix exactly must score 0"))
  }

  test("bigram log-prob: hand-computed smoothed model; word salad with " +
    "plausible unigrams collapses under the bigram model") {
    // corpus: "a b" twice, "a c" once → V = 3, contexts: c(a·) = 3
    // P(b|a) = (2+1)/(3+3) = 0.5 ; P(c|a) = (1+1)/(3+3) = 1/3
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val r = Scoring.bigramLogProbScore(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    def q6(x: Double): Double = math.round(x * 1e6) / 1e6
    assert(r(1L) === ((1L, q6(math.log(0.5)))))
    assert(r(2L) === ((1L, q6(math.log(0.5)))))
    assert(r(3L) === ((1L, q6(math.log(1.0 / 3)))))
    // the separation a unigram model cannot see: doc 21 repeats the
    // corpus's dominant BIGRAM, doc 22 shuffles the same tokens into
    // pairs the corpus never produced — identical unigram mix, so the
    // unigram scores tie, while the bigram model separates them
    val corpus = (1L to 8L).map(i => (i, "x y x y x y")) ++
      Seq((21L, "x y x y x y"), (22L, "y y y x x x"))
    val df = corpus.toDF("doc_id", "text")
    val uni = Scoring.unigramLogProbScore(df).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(math.abs(uni(21L) - uni(22L)) < 1e-9,
      "unigram model cannot tell the salad apart")
    val big = Scoring.bigramLogProbScore(df).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(big(21L) > big(22L) + 0.5,
      s"bigram model must collapse the salad: ${big(21L)} vs ${big(22L)}")
    // single-token documents have no bigrams and do not appear
    val short = Scoring.bigramLogProbScore(
      Seq((1L, "only"), (2L, "a b")).toDF("doc_id", "text")).collect()
    assert(short.map(_.getLong(0)).toSet === Set(2L))
    intercept[IllegalArgumentException](
      Scoring.bigramLogProbScore(docs, kSmooth = 0.0))
  }
  test("percentileNormalize: hand-checked ranks, tie sharing, single-row " +
    "group scores 0, partitioning-invariant") {
    import spark.implicits._
    val df = Seq(
      ("s1", 1L, 10.0), ("s1", 2L, 20.0), ("s1", 3L, 20.0),
      ("s1", 4L, 40.0), ("s1", 5L, 50.0),
      ("s2", 6L, 99.0))
      .toDF("src", "id", "score")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Scoring.percentileNormalize(
        d, col("src"), col("score"), keep = Seq("id"))
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val got = run(df)
    // n=5: pct = (rank-1)/4; the 20.0 tie shares rank 2 → 0.25 twice
    assert(got(1L) == 0.0 && got(2L) == 0.25 && got(3L) == 0.25 &&
      got(4L) == 0.75 && got(5L) == 1.0)
    assert(got(6L) == 0.0, "single-row group has no spread; pct = 0")
    assert(run(df.repartition(5)) == got)
  }

  test("rrfFuse: hand-computed fusion, both-ranker docs outrank " +
    "single-ranker docs at similar ranks, id tie-break") {
    import spark.implicits._
    val lex = Seq((1L, 9.0), (2L, 8.0), (3L, 7.0)).toDF("doc_id", "score")
    val emb = Seq((2L, 0.9), (4L, 0.8), (1L, 0.7)).toDF("vec_id", "cos")
    val got = graft.operators.Scoring.rrfFuse(
        Seq((lex, "doc_id", "score"), (emb, "vec_id", "cos")), topK = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    def c(r: Int) = math.round(1e6 / (60 + r))
    val want = Map(
      1L -> (c(1) + c(3)), 2L -> (c(2) + c(1)),
      3L -> c(3), 4L -> c(2))
    got.foreach { case (id, rrf, _) =>
      assert(rrf == want(id) / 1e6, s"doc $id") }
    // doc 2 (ranks 2+1) beats doc 1 (ranks 1+3); both beat single-ranker
    assert(got.map(_._1).toSeq == Seq(2L, 1L, 4L, 3L))
    assert(got.map(_._1).distinct.length == 4)
    assert(got.find(_._1 == 2L).get._3 == 2L &&
      got.find(_._1 == 4L).get._3 == 1L, "n_rankers per doc")
    intercept[IllegalArgumentException](
      graft.operators.Scoring.rrfFuse(Seq.empty))
  }

  test("group-aware split: every row of a group lands in one split") {
    val docs = Tables("documents")
    val bad = graft.operators.Sampling.assignSplit(
        docs, col("source"), Seq(("train", 8), ("val", 1), ("test", 1)), 10)
      .groupBy("source")
      .agg(countDistinct(col("split")).as("k"))
      .filter(col("k") =!= 1).count()
    assert(bad == 0L, "a source straddling splits would leak near-dups")
  }

  private object Tables {
    def apply(name: String) = graft.sources.Tables.table(spark, sf0001, name)
  }
}
