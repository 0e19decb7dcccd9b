package graft

import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("deletionVariants(d=1) holds the original plus each single deletion") {
    val out = Seq("abc").toDF("s")
      .select(FuzzyJoin.deletionVariants(col("s"), 1)).as[Seq[String]]
      .head()
    assert(out.toSet == Set("abc", "bc", "ac", "ab"))
  }

  test("deletionVariants of an empty string is just itself") {
    val out = Seq("").toDF("s")
      .select(FuzzyJoin.deletionVariants(col("s"), 1)).as[Seq[String]]
      .head()
    assert(out == Seq(""))
  }

  /** Blocking must be LOSSLESS: the SymSpell candidate join equals the
    * cartesian levenshtein filter, pair for pair. Checked by brute force
    * over a vocabulary dense enough to exercise substitution, insertion,
    * deletion, and true negatives, for both supported distances.
    */
  test("selfPairsWithin equals the brute-force cartesian answer (d=1 and d=2)") {
    val words = Seq("cat", "cut", "cart", "at", "dog", "dig", "dg", "doge",
      "spark", "spars", "sparks", "spork", "stork", "xyz")
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "name")
    for (d <- Seq(1, 2)) {
      val got = FuzzyJoin.selfPairsWithin(df, maxDist = d)
        .sort("i", "j").as[(Long, Long, Long)].collect().toSeq
      val brute = for {
        (a, i) <- words.zipWithIndex
        (b, j) <- words.zipWithIndex
        if i < j
        dist = levDist(a, b)
        if dist <= d
      } yield (i.toLong, j.toLong, dist.toLong)
      assert(got == brute, s"maxDist=$d")
    }
  }

  test("selfPairsWithin equals brute force on 60 random abc-strings (seeded)") {
    // tiny alphabet + short strings maximize near-pair density and
    // duplicate words (distance-0 pairs), the regimes blocking can miss
    val rnd = new scala.util.Random(7)
    val words = Seq.fill(60)(
      Seq.fill(rnd.nextInt(6) + 1)(('a' + rnd.nextInt(3)).toChar).mkString)
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "name")
    for (d <- Seq(1, 2)) {
      val got = FuzzyJoin.selfPairsWithin(df, maxDist = d)
        .sort("i", "j").as[(Long, Long, Long)].collect().toSeq
      val brute = for {
        (a, i) <- words.zipWithIndex
        (b, j) <- words.zipWithIndex
        if i < j
        dist = levDist(a, b)
        if dist <= d
      } yield (i.toLong, j.toLong, dist.toLong)
      assert(got == brute, s"maxDist=$d")
    }
  }

  test("identical strings pair at distance 0") {
    val df = Seq((1L, "same"), (2L, "same"), (3L, "off")).toDF("id", "name")
    val got = FuzzyJoin.selfPairsWithin(df, maxDist = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 0L)))
  }

  /** Textbook dynamic-programming edit distance, the spec's independent
    * arbiter (Spark's levenshtein is part of the code under test).
    */
  private def levDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }
}
