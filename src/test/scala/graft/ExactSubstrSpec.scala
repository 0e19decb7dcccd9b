package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Exact-substring dedup (Lee et al. 2022 ExactSubstr form): the char
  * shingle kernel's substr contract, the span operator's equivalence to
  * a brute-forced suffix-match definition (the suffix array's output),
  * and the removal step's text surgery.
  */
class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  test("charShingles: stride-1 code-point windows equal substring " +
       "semantics, multibyte included; fewer than n chars → empty") {
    val texts = Seq(
      "abcdef", "héllo wörld", "ünïcode", "ab", "", "a b c",
      "ααββγγ", "x" * 40)
    val df = texts.toDF("text")
    for (n <- Seq(2, 3, 5)) {
      val got = df.select(TextFunctions.charShingles(col("text"), n))
        .collect().map(_.getSeq[String](0))
      // BMP-only inputs: java String indexes = code points
      val want = texts.map { t =>
        if (t.length < n) Seq.empty[String]
        else (0 to t.length - n).map(i => t.substring(i, i + n))
      }
      assert(got.toSeq === want, s"n=$n")
    }
  }

  test("charDuplicateSpans: cross-doc hit, overlap merge, adjacency " +
       "merge, within-doc repeat; hashed path agrees") {
    val docs = Seq(
      (1L, "XXabcdefgYY"),   // "abcdefg" shared with doc 2 → [2,8]
      (2L, "abcdefgZZZZ"),   //                               [0,6]
      (3L, "pqrstpqrst"),    // within-doc repeat of "pqrst" → [0,9]
      (4L, "nothing-here!"))
      .toDF("doc_id", "text")
    val out = Dedup.charDuplicateSpans(docs, minLen = 5, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((1L, 2L, 8L), (2L, 0L, 6L), (3L, 0L, 9L)))
    val hashed = Dedup.charDuplicateSpans(docs, minLen = 5, minCount = 2,
        hashed = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(hashed === out, "xxhash64 scale path must match the exact path")
  }

  /** Brute force THE OTHER SIDE of the scaladoc's equivalence theorem:
    * the suffix-array definition. A position is dup-covered iff it lies
    * inside a common extension of length >= L between two distinct
    * corpus positions — computed here by direct pairwise longest-common-
    * extension over every position pair, no windows anywhere. The
    * operator's merged spans must cover exactly that set.
    */
  test("charDuplicateSpans coverage equals brute-forced suffix-match " +
       "coverage on a repeat-dense corpus") {
    val L = 5
    val rnd = new scala.util.Random(42)
    val docs = (1L to 6L).map { id =>
      (id, (1 to 48).map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString)
    }
    val want: Set[(Long, Int)] = {
      val pos = docs.flatMap { case (id, t) => t.indices.map(i => (id, t, i)) }
      val covered = scala.collection.mutable.Set[(Long, Int)]()
      for {
        a <- pos.indices
        b <- pos.indices
        if a != b
      } {
        val (ida, ta, ia) = pos(a)
        val (idb, tb, ib) = pos(b)
        var k = 0
        while (ia + k < ta.length && ib + k < tb.length &&
               ta(ia + k) == tb(ib + k)) k += 1
        if (k >= L) (0 until k).foreach(o => covered += ((ida, ia + o)))
      }
      covered.toSet
    }
    val got = Dedup.charDuplicateSpans(docs.toDF("doc_id", "text"),
        minLen = L, minCount = 2)
      .collect().flatMap { r =>
        (r.getLong(1) to r.getLong(2)).map(p => (r.getLong(0), p.toInt))
      }.toSet
    assert(got === want,
      "window-coverage and suffix-match coverage must be the same set")
  }

  test("removeDuplicatedSpans: all occurrences cut, gaps concatenate, " +
       "untouched docs pass through, fully-covered docs go empty") {
    val docs = Seq(
      (1L, "AAAAABBBBBCCCCC"),  // B-range shared with docs 2 and 4
      (2L, "zzBBBBBqq"),
      (3L, "totally unique text"),
      (4L, "BBBBB"))            // fully covered → empty survivor
      .toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(docs, minLen = 5, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(out === Set(
      (1L, "AAAAACCCCC", 5L),
      (2L, "zzqq", 5L),
      (3L, "totally unique text", 0L),
      (4L, "", 5L)))
  }

  test("removeDuplicatedSpans matches a driver-side rebuild from " +
       "brute-forced coverage; one row per input doc always") {
    val L = 5
    val rnd = new scala.util.Random(7)
    val docs = (1L to 8L).map { id =>
      (id, (1 to 40).map(_ => "ab".charAt(rnd.nextInt(2))).mkString)
    }
    val covered: Set[(Long, Int)] = {
      val pos = docs.flatMap { case (id, t) => t.indices.map(i => (id, t, i)) }
      val c = scala.collection.mutable.Set[(Long, Int)]()
      for (a <- pos.indices; b <- pos.indices if a != b) {
        val (ida, ta, ia) = pos(a)
        val (_, tb, ib) = pos(b)
        var k = 0
        while (ia + k < ta.length && ib + k < tb.length &&
               ta(ia + k) == tb(ib + k)) k += 1
        if (k >= L) (0 until k).foreach(o => c += ((ida, ia + o)))
      }
      c.toSet
    }
    val want = docs.map { case (id, t) =>
      val clean = t.indices.filterNot(i => covered((id, i))).map(t).mkString
      (id, clean, (t.length - clean.length).toLong)
    }.toSet
    val out = Dedup.removeDuplicatedSpans(docs.toDF("doc_id", "text"),
        minLen = L, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.length === docs.size, "one output row per input doc")
    assert(out.toSet === want)
  }
}
