package graft

import org.apache.spark.sql.functions._
import graft.operators.{ColumnStats, TextSearch}

class SearchStatsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "a cat sat here"),
    (3L, "the dog"),
    (4L, "a a a"),        // overlapping self-phrase
    (5L, "cat sat cat sat")
  ).toDF("doc_id", "text")

  test("phraseMatches counts every aligned occurrence, overlaps included") {
    val got = TextSearch.phraseMatches(docs, "cat sat")
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 1L), (2L, 1L), (5L, 2L)))
    val overlap = TextSearch.phraseMatches(docs, "a a")
      .as[(Long, Long)].collect().toSet
    assert(overlap === Set((4L, 2L)), "positions, not disjoint spans")
  }

  test("3-term phrase and duplicate-term phrase align correctly") {
    assert(TextSearch.phraseMatches(docs, "sat on the")
      .as[(Long, Long)].collect().toSet === Set((1L, 1L)))
    assert(TextSearch.phraseMatches(docs, "cat sat cat sat")
      .as[(Long, Long)].collect().toSet === Set((5L, 1L)))
  }

  test("a phrase with an unseen term returns empty without running joins") {
    assert(TextSearch.phraseMatches(docs, "cat zebra").count() === 0L)
  }

  test("rarest-first join order is invisible in the answer (vs naive scan)") {
    // "the" (df 3) is more common than "dog" (df 1): the index joins seed
    // from "dog"; the answer must still equal the naive window scan
    val got = TextSearch.phraseMatches(docs, "the dog")
      .as[(Long, Long)].collect().toSet
    val naive = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), posexplode(col("t")).as(Seq("i", "w")),
        col("t"))
      .filter(col("w") === "the" &&
        element_at(col("t"), col("i") + 2) === "dog")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toSet
    assert(got === naive && got === Set((3L, 1L)))
  }

  test("columnStats: one pass yields exact nulls/ndv/min/max per column") {
    val df = Seq(
      (Some(1L), Some("b"), Some(2.0)),
      (Some(2L), None, Some(4.0)),
      (Some(2L), Some("a"), None),
      (None, Some("a"), Some(8.0))
    ).toDF("k", "s", "v")
    val got = ColumnStats.collect(df, Seq("k", "s", "v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).toSet
    assert(got === Set(
      ("k", 4L, 1L, 2L, "1", "2"),
      ("s", 4L, 1L, 2L, "a", "b"),
      ("v", 4L, 1L, 3L, "2.0", "8.0")))
  }

  test("columnStats exact=false tracks exact NDV within HLL error") {
    val df = (1 to 2000).map(i => (i.toLong, (i % 500).toString))
      .toDF("id", "bucket")
    val approx = ColumnStats.collect(df, Seq("id", "bucket"), exact = false)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(math.abs(approx("id") - 2000.0) / 2000.0 < 0.1)
    assert(math.abs(approx("bucket") - 500.0) / 500.0 < 0.1)
  }
}
