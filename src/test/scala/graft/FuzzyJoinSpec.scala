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

  test("jaroWinklerSelfCandidates: lossless vs brute force on seeded " +
    "random strings at t=0.85/0.9/0.98; block equality is absolute") {
    import spark.implicits._
    import graft.functions.JaroWinkler.{similarity => jw}
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    // seeded LCG strings over a 6-letter alphabet, lengths 4..19, so
    // near-misses around every threshold occur; plus crafted near-dups
    var st = 99L
    def next(): Long = { st = st * 6364136223846793005L + 1442695040888963407L; st }
    val alpha = "abcdef"
    val rand = (1 to 120).map { i =>
      val len = 4 + math.floorMod(next() >> 33, 16L).toInt
      (i.toLong, (1 to len).map(_ =>
        alpha(math.floorMod(next() >> 33, alpha.length.toLong).toInt)).mkString)
    }
    val crafted = Seq(
      (201L, "acme corporation"), (202L, "acme corporatoin"),
      (203L, "acme corp"), (204L, "jonathan smith"),
      (205L, "jonathan smyth"), (206L, "jonathan smith"))
    val rows = rand ++ crafted
    val df = rows.toDF("id", "name")
    for (t <- Seq(0.85, 0.9, 0.98)) {
      val want = (for {
        (i, si) <- rows; (j, sj) <- rows if i < j
        if jw(u(si), u(sj)) >= t
      } yield (i, j)).toSet
      val cands = FuzzyJoin.jaroWinklerSelfCandidates(df, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      graft.CacheRegistry.releaseAll()
      val got = cands.filter(c => jw(u(c._3), u(c._4)) >= t)
        .map(c => (c._1, c._2)).toSet
      assert(got === want, s"threshold $t")
      assert(want.nonEmpty, s"threshold $t needs at least one true pair")
    }
    // blocks: same strings, disjoint blocks -> no pair may cross
    val blocked = df.withColumn("bk", col("id") % 2)
    val crossOk = FuzzyJoin.jaroWinklerSelfCandidates(
      blocked, 0.9, blockCols = Seq("bk"))
      .join(blocked.select(col("id").as("i"), col("bk").as("bi")), "i")
      .join(blocked.select(col("id").as("j"), col("bk").as("bj")), "j")
      .filter(col("bi") =!= col("bj")).count()
    graft.CacheRegistry.releaseAll()
    assert(crossOk === 0L, "candidates must never cross blocks")
  }

  test("jaroWinklerCandidates (two-table): lossless vs brute force, " +
    "including identical strings and empty-side conventions") {
    import spark.implicits._
    import graft.functions.JaroWinkler.{similarity => jw}
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val l = Seq((1L, "customer#001"), (2L, "customer#002"),
      (3L, "supplier nine"), (4L, "zz")).toDF("lid", "lname")
    val r = Seq((11L, "customer#001"), (12L, "customer#0002"),
      (13L, "supplier nIne"), (14L, "z")).toDF("rid", "rname")
    val t = 0.9
    val lrows = Seq((1L, "customer#001"), (2L, "customer#002"),
      (3L, "supplier nine"), (4L, "zz"))
    val rrows = Seq((11L, "customer#001"), (12L, "customer#0002"),
      (13L, "supplier nIne"), (14L, "z"))
    val want = (for {
      (i, si) <- lrows; (j, sj) <- rrows if jw(u(si), u(sj)) >= t
    } yield (i, j)).toSet
    val got = FuzzyJoin.jaroWinklerCandidates(l, r, t,
        "lid", "lname", "rid", "rname")
      .collect()
      .filter(c => jw(u(c.getString(2)), u(c.getString(3))) >= t)
      .map(c => (c.getLong(0), c.getLong(1))).toSet
    graft.CacheRegistry.releaseAll()
    assert(got === want)
    assert(want.contains((1L, 11L)), "identical strings must pair")
    intercept[IllegalArgumentException](
      FuzzyJoin.jaroWinklerSelfCandidates(l, 0.8, "lid", "lname"))
  }

  test("anagram route on a short-string corpus: still lossless, and " +
    "sub-alpha variants (the quadratic empty/one-char keys) are pruned") {
    import spark.implicits._
    import graft.functions.JaroWinkler.{similarity => jw}
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    // 1-4 char strings force maxDel >= ... short lengths where the empty
    // and single-char variants would otherwise pair everything
    val rows = Seq((1L, "ab"), (2L, "ba"), (3L, "a"), (4L, "b"),
      (5L, "abc"), (6L, "acb"), (7L, "abcd"), (8L, "abdc"),
      (9L, "x"), (10L, "xy"), (11L, ""), (12L, ""))
    val df = rows.toDF("id", "name")
    val t = 0.9
    val want = (for {
      (i, si) <- rows; (j, sj) <- rows if i < j
      if jw(u(si), u(sj)) >= t
    } yield (i, j)).toSet
    val got = FuzzyJoin.jaroWinklerSelfCandidates(df, t)
      .collect()
      .filter(c => jw(u(c.getString(2)), u(c.getString(3))) >= t)
      .map(c => (c.getLong(0), c.getLong(1))).toSet
    graft.CacheRegistry.releaseAll()
    assert(got === want)
    // note ("ab","ba") does NOT pair: at len 2 the Jaro window is 0, so
    // transposed chars never match — the short-string regime's quirk
    assert(want.contains((5L, 7L)), "abc/abcd must pair (jw 0.9417)")
  }

  test("anagram route: a duplicate id with CONFLICTING strings fails " +
    "loudly (the id->string reattach is only lossless under functional " +
    "dependence); a benign duplicate (same string) still works") {
    import spark.implicits._
    // short strings keep maxDel <= 2, forcing the anagram route
    val bad = Seq((1L, "abc"), (1L, "abd"), (2L, "abc"))
      .toDF("id", "name")
    // collect(), not count(): the guard lives on the reattached string
    // column, which every verify-time consumer reads (a count() prunes
    // strings — and with them the ambiguity the guard protects)
    val ex = intercept[Exception] {
      FuzzyJoin.jaroWinklerSelfCandidates(bad, 0.9).collect()
    }
    graft.CacheRegistry.releaseAll()
    def msgChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString("|")
    assert(msgChain(ex).contains("duplicate id with conflicting strings"),
      msgChain(ex).take(300))
    val benign = Seq((1L, "abc"), (1L, "abc"), (2L, "abc"))
      .toDF("id", "name")
    assert(FuzzyJoin.jaroWinklerSelfCandidates(benign, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 2L)))
    graft.CacheRegistry.releaseAll()
  }

  test("document-scale strings fail LOUDLY at plan time: the JW routes " +
    "are O(len^2)/row and must refuse oversized keys, not melt an executor") {
    import spark.implicits._
    val long = "x" * (FuzzyJoin.MaxJwKeyLen + 1)
    val df = Seq((1L, "acme corp"), (2L, long)).toDF("id", "name")
    val eSelf = intercept[IllegalArgumentException](
      FuzzyJoin.jaroWinklerSelfCandidates(df, 0.9))
    assert(eSelf.getMessage.contains("Dedup"),
      "the error must point at the right tool for document text")
    intercept[IllegalArgumentException](
      FuzzyJoin.jaroWinklerCandidates(
        df, Seq((3L, "ok")).toDF("id", "name"), 0.9,
        "id", "name", "id", "name"))
    // exactly at the bound still works (both routes reachable via t)
    val atBound = Seq((1L, "y" * FuzzyJoin.MaxJwKeyLen),
      (2L, "y" * FuzzyJoin.MaxJwKeyLen)).toDF("id", "name")
    assert(FuzzyJoin.jaroWinklerSelfCandidates(atBound, 0.98)
      .count() === 1L)
    graft.CacheRegistry.releaseAll()
  }
}
