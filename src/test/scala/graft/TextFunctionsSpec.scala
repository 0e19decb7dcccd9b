package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount / subwordCount") {
    val r = Seq("one two three", "x", "a1 b-2").toDF("text")
      .select(TextFunctions.tokenCount(col("text")),
        TextFunctions.subwordCount(col("text"))).collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(3L, 1L, 2L))
    // "a1 b-2" → [a][1][b][-][2] = 5 subword tokens
    assert(r(2).getLong(1) === 5L)
  }

  test("shingles: n-grams in order; fewer than n tokens → empty") {
    val r = Seq("a b c d", "a b").toDF("text")
      .select(TextFunctions.shingles(col("text"), 3)).as[Seq[String]].collect()
    assert(r(0) === Seq("a b c", "b c d"))
    assert(r(1) === Seq.empty)
  }

  test("stopwordRatio and meanTokenLength") {
    val r = Seq("the cat a hat").toDF("text")
      .select(TextFunctions.stopwordRatio(col("text")),
        TextFunctions.meanTokenLength(col("text"))).head()
    assert(r.getDouble(0) === 0.5)   // the, a of 4
    assert(r.getDouble(1) === 2.5)   // (3+3+1+3)/4
  }

  test("langId heuristic on marker-rich sentences") {
    val samples = Seq(
      "the thing is singing and rolling" -> "en",
      "der einzige schöne schnelle wagen ich und" -> "de",
      "les entreprises que nous avons des difficultés" -> "fr",
      "xyzzy qqqq" -> "und")
    val got = samples.map(_._1).toDF("text")
      .select(TextFunctions.langId(col("text"))).as[String].collect().toSeq
    assert(got === samples.map(_._2))
  }

  test("md5Fingerprint matches a known MD5") {
    val got = Seq("abc").toDF("text")
      .select(TextFunctions.md5Fingerprint(col("text"))).as[String].head()
    assert(got === "900150983cd24fb0d6963f7d28e17f72")
  }

  test("native shingles kernel equals the declarative HOF form exactly") {
    import org.apache.spark.sql.functions._
    // adversarial inputs: multi-space (empty tokens), leading/trailing
    // spaces, unicode multi-byte, exactly-n tokens, single token, empty
    val texts = Seq(
      "the quick brown fox", "a  b c d", " leading space here",
      "trailing space here ", "héllo wörld ünïcode text", "one two three",
      "solo", "", "a b", "tab\tis one token here", "  ", "x " * 50)
    val df = texts.toDF("text")
    def declarative(n: Int) = {
      val t = split(col("text"), " ")
      when(size(t) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(t) - (n - 1)),
          i => concat_ws(" ", slice(t, i, lit(n)))))
    }
    for (n <- Seq(1, 2, 3, 5)) {
      val got = df.select(TextFunctions.shingles(col("text"), n)).collect()
        .map(_.getSeq[String](0))
      val want = df.select(declarative(n)).collect().map(_.getSeq[String](0))
      assert(got.toSeq === want.toSeq, s"n=$n")
    }
  }

  test("minShingleFingerprint: equal docs share it; empty shingle set → null") {
    val r = Seq("a b c d e", "a b c d e", "short one").toDF("text")
      .select(TextFunctions.minShingleFingerprint(col("text"))).collect()
    assert(r(0).getLong(0) === r(1).getLong(0))
    assert(r(2).isNullAt(0)) // "short one" has 2 tokens < 3 → empty → null
  }

  test("scrubPii replaces typed PII shapes and leaves look-alikes alone") {
    val vectors = Seq(
      ("mail a.b+x@sub.example.co done", "mail <EMAIL> done"),
      ("ip 192.168.0.1 end", "ip <IP> end"),
      ("call 555-123-4567 or 555.987.6543", "call <PHONE> or <PHONE>"),
      ("card 4111111111111111 pan 1234567890123", "card <CARD> pan <CARD>"),
      // all four in one line, order-dependent interactions
      ("u@x.io 10.0.0.7 555-123-4567 4111111111111111",
        "<EMAIL> <IP> <PHONE> <CARD>"),
      // look-alikes that must SURVIVE: 3-octet version, short digit run,
      // word with @ but no TLD dot shape stays an email by the grammar? no —
      // 'a@b' has no dot-TLD, so it survives
      ("version 1.2.3 id 123456789012 a@b stays",
        "version 1.2.3 id 123456789012 a@b stays"))
    val got = vectors.map(_._1).toDF("text")
      .select(TextFunctions.scrubPii(col("text"))).collect().map(_.getString(0))
    got.zip(vectors.map(_._2)).foreach { case (g, want) => assert(g === want) }
  }

  test("readability: syllable groups, sentence floor, and the Flesch " +
    "formula match hand computation") {
    // "the cat sat on the mat. it was flat!" —
    // words=9, sentences=2 ([.] and [!] runs), syllable groups:
    // the(1) cat(1) sat(1) on(1) the(1) mat.(1) it(1) was(1) flat!(1) = 9
    val s = "the cat sat on the mat. it was flat!"
    val row = Seq(s).toDF("text").select(
      TextFunctions.tokenCount(col("text")),
      TextFunctions.sentenceCount(col("text")),
      TextFunctions.syllableCount(col("text")),
      TextFunctions.fleschReadingEase(col("text"))).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) === ((9L, 2L, 9L)))
    val want = math.round((206.835 - 1.015 * 9.0 / 2.0 - 84.6 * 9.0 / 9.0)
      * 1e4) / 1e4
    assert(row.getDouble(3) === want)
    // no terminal punctuation → sentence floor of 1, not a div-by-zero
    val frag = Seq("just a fragment").toDF("text").select(
      TextFunctions.sentenceCount(col("text")),
      TextFunctions.fleschReadingEase(col("text"))).collect().head
    assert(frag.getLong(0) === 1L)
    assert(!frag.getDouble(1).isNaN)
    // "beautiful": eau+i+u → groups e-a-u? lower: b-eau-t-i-f-u-l = 3 groups
    val syl = Seq("beautiful").toDF("text")
      .select(TextFunctions.syllableCount(col("text"))).collect().head.getLong(0)
    assert(syl === 3L)
  }

  test("charEntropy: hand-computed distributions, empty text, and the " +
    "gibberish ordering") {
    def ent(s: String): Double = Seq(s).toDF("text")
      .select(TextFunctions.charEntropy(col("text"))).collect().head.getDouble(0)
    assert(ent("") === 0.0)
    assert(ent("aaaa") === 0.0, "single-class text has zero entropy")
    // "aabb": p(a)=p(b)=0.5 -> ln 2 nats, through the quantized-ln path:
    // each count(2) * round(ln(0.5)*1e6) summed, normalized by len 4
    val q = math.round(math.log(0.5) * 1e6)
    val want = math.round(-(2 * q + 2 * q).toDouble / 4) / 1e6
    assert(ent("aabb") === want)
    assert(math.abs(want - math.log(2)) < 1e-5)
    // ordering: uniform-random-ish text > natural-ish text > repeated char
    val natural = "the quick brown fox jumps over the lazy dog"
    val uniform = ('a' to 'z').mkString("")
    assert(ent(uniform) > ent(natural))
    assert(ent(natural) > ent("aaaaaaaa"))
    // non-alphabet chars fold into one "other" class
    assert(ent("!@#$%^&*") === 0.0)
  }

  test("char_class_counts kernel equals the declarative translate deltas " +
    "(unicode, astral, empty)") {
    val samples = Seq("", "aabb zz!", "the quick brown fox",
      "caf\u00e9 \u4e2d\u6587 mix", "astral \ud83d\ude00 char",
      "  spaces  and\ttabs")
    val df = samples.toDF("s")
    import graft.functions.{GraftFunctions, TextFunctions}
    val declarative = TextFunctions.EntropyClasses.map(c =>
      (length(col("s")) - length(translate(col("s"), c, ""))).cast("long"))
    val other = length(col("s")).cast("long") - declarative.reduce(_ + _)
    val rows = df.select(
      GraftFunctions.char_class_counts(col("s")).as("k"),
      array((declarative :+ other): _*).as("d")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("stripMarkup: blocks die whole, tags flatten, entity order is " +
    "single-pass, whitespace collapses; extractTitle") {
    def strip(s: String): String = {
      val df = Seq(s).toDF("h")
      df.select(TextFunctions.stripMarkup(col("h"))).head().getString(0)
    }
    assert(strip("<p>hello <b>world</b></p>") === "hello world")
    assert(strip("a<script type=\"x\">var s = '<p>keep out</p>';\n" +
      "more</script>b") === "a b",
      "script CONTENT is removed, not just the tags")
    assert(strip("x<style>p {c:1}</style>y<!-- note\nspans -->z") === "x y z")
    assert(strip("&lt;tag&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b &amp; c") ===
      "<tag> \"q\" 's' a b & c")
    assert(strip("&amp;lt;") === "&lt;",
      "decoded ampersand must NOT re-enter entity decoding")
    assert(strip("&lt;b&gt;bold&lt;/b&gt;") === "<b>bold</b>",
      "decoded angle brackets must NOT re-enter the tag stripper")
    assert(strip("a  \t\n  b") === "a b")
    assert(strip("  <br/>  ") === "")
    def title(s: String): String = {
      val df = Seq(s).toDF("h")
      df.select(TextFunctions.extractTitle(col("h"))).head().getString(0)
    }
    assert(title("<head><title>T &amp; U</title></head>") === "T &amp; U",
      "title is raw — entities left as written")
    assert(title("<title lang=\"en\">multi\nline</title>") === "multi\nline")
    assert(title("<p>no title</p>") === "")
  }

  test("jaro_winkler: textbook vectors, boost-threshold gating, empties, " +
    "and SQL registration") {
    import graft.functions.JaroWinkler.similarity
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def jw(a: String, b: String) = similarity(u(a), u(b))
    val eps = 1e-12
    // classic Winkler vectors (m, t, prefix hand-derivable)
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < eps)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < eps)
    assert(math.abs(jw("JELLYFISH", "SMELLYFISH") - 0.8962962962962964) < eps)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < eps)
    assert(math.abs(jw("CRATE", "TRACE") - 0.7333333333333333) < eps)
    // boost gating: common prefix but jaro <= 0.7 gets NO bonus
    assert(math.abs(jw("aaxxxxxx", "aayyyyyy") - 0.5) < eps)
    assert(math.abs(jw("abcdxxxx", "abcdyyyy") - 2.0 / 3) < eps)
    // prefix cap at 4 even with longer agreement
    assert(math.abs(jw("aaaaaabc", "aaaaaabd") - 0.95) < eps)
    // degenerate contracts (the DuckDB variant: empty -> 0, even both)
    assert(jw("", "") == 0.0 && jw("", "abc") == 0.0 && jw("a", "a") == 1.0)
    assert(jw("ab", "ba") == 0.0, "window 0 admits only same-position matches")
    // SQL surface via GraftExtensions
    graft.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA')").head().getDouble(0)
    assert(math.abs(viaSql - 0.9611111111111111) < eps)
    // Column API inside a plan (codegen path)
    import spark.implicits._
    val scored = Seq(("martha", "marhta"), ("x", "y")).toDF("a", "b")
      .select(graft.functions.GraftFunctions.jaro_winkler(col("a"), col("b"))
        .as("jw"))
      .collect().map(_.getDouble(0))
    assert(math.abs(scored(0) - 0.9611111111111111) < eps && scored(1) == 0.0)
  }

  test("damerau_levenshtein: unrestricted variant (edits after a " +
    "transposition), classic vectors, SQL + codegen paths") {
    import graft.functions.DamerauLevenshtein.distance
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def d(a: String, b: String) = distance(u(a), u(b))
    // THE discriminating case: OSA says 3, unrestricted says 2
    assert(d("ca", "abc") == 2)
    assert(d("kitten", "sitting") == 3)
    assert(d("abcdef", "abcfad") == 3)
    assert(d("ab", "ba") == 1, "one adjacent transposition")
    assert(d("abab", "baba") == 2)
    assert(d("", "abc") == 3 && d("abc", "") == 3 && d("", "") == 0)
    assert(d("same", "same") == 0)
    graft.GraftExtensions.register(spark)
    assert(spark.sql("SELECT damerau_levenshtein('ca', 'abc')")
      .head().getInt(0) == 2)
    import spark.implicits._
    val got = Seq(("ca", "abc"), ("ab", "ba")).toDF("a", "b")
      .select(graft.functions.GraftFunctions.damerau_levenshtein(
        col("a"), col("b")).as("d"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(2, 1))
  }

  test("damerau_levenshtein: document-scale inputs fail loudly at the " +
    "MaxCells bound instead of allocating a multi-GB DP matrix") {
    import graft.functions.DamerauLevenshtein.{distance, MaxCells}
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val big = "x" * 3000 // 3002^2 > 4M cells
    val ex = intercept[IllegalArgumentException](distance(u(big), u(big)))
    assert(ex.getMessage.contains("truncate"))
    // just under the bound still computes (square strings of ~1998 chars)
    val side = math.sqrt(MaxCells.toDouble).toInt - 2
    assert(distance(u("a" * side), u("a" * side)) == 0)
  }
}
