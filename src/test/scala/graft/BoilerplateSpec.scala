package graft

import org.apache.spark.sql.functions._
import graft.operators.Boilerplate

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "header\nreal content one\nfooter"),
    (2L, "header\nunique middle\nfooter"),
    (3L, "header\nanother body line"),
    (4L, "header\nheader\nonly dup lines here"),
    (5L, "no chrome at all")
  ).toDF("doc_id", "text")

  test("strips lines at/above the df threshold, keeps order, counts removals") {
    val out = Boilerplate.stripCommonLines(docs, minDocs = 3)
      .sort("doc_id").collect()
    // "header" df=4, "footer" df=2 → only header is boilerplate at minDocs=3
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq == Seq(
      (1L, 3L, 1L, "real content one\nfooter"),
      (2L, 3L, 1L, "unique middle\nfooter"),
      (3L, 2L, 1L, "another body line"),
      (4L, 3L, 2L, "only dup lines here"),  // BOTH copies of a doc's own boilerplate go
      (5L, 1L, 0L, "no chrome at all")))
  }

  test("df counts distinct docs, not occurrences") {
    // "spam" appears 3 times but only in 2 docs → df=2 < 3 → kept
    val d = Seq((1L, "spam\nspam\nbody"), (2L, "spam\nother"), (3L, "clean"))
      .toDF("doc_id", "text")
    val out = Boilerplate.stripCommonLines(d, minDocs = 3)
      .agg(sum("n_removed")).head().getLong(0)
    assert(out == 0L)
  }

  test("blank lines are never boilerplate") {
    val d = Seq((1L, "a\n\nb"), (2L, "c\n\nd"), (3L, "e\n\nf"))
      .toDF("doc_id", "text")
    val out = Boilerplate.stripCommonLines(d, minDocs = 2)
      .sort("doc_id").select("clean_text").as[String].collect()
    assert(out.toSeq == Seq("a\n\nb", "c\n\nd", "e\n\nf"))
  }

  test("a doc whose every line is boilerplate survives as an empty string") {
    val d = Seq((1L, "x"), (2L, "x"), (3L, "x\nx")).toDF("doc_id", "text")
    val out = Boilerplate.stripCommonLines(d, minDocs = 3)
      .sort("doc_id").collect()
    assert(out.map(r => (r.getLong(2), r.getString(3))).toSeq ==
      Seq((1L, ""), (1L, ""), (2L, "")))
  }

  test("hashLines scale path matches the exact string path on real data") {
    val docs01 = sources.Tables.table(spark, sf0001, "documents")
      .select(col("doc_id"),
        regexp_replace(col("text"), "((?:\\S+ ){5}\\S+) ", "$1\n").as("text"))
    val exact = Boilerplate.stripCommonLines(docs01, minDocs = 5)
    val hashed = Boilerplate.stripCommonLines(docs01, minDocs = 5, hashLines = true)
    assert(exact.exceptAll(hashed).isEmpty && hashed.exceptAll(exact).isEmpty)
  }
}
