package graft

import org.apache.spark.sql.functions._
import graft.operators.Summary

/** Unit semantics for the incremental-aggregate-maintenance operator
  * (q150); cross-engine correctness is pinned by the q150 oracle row,
  * whose DIRECT one-pass form the split/merge composition must hash-equal.
  */
class SummarySpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.toSeq.toList).toSet

  test("merge(summarize(parts)) equals summarize(whole) bitwise, " +
    "including nulls, negatives, and keys present in one part only") {
    val whole = Seq(
      ("a", Some(1.004)), ("a", Some(2.006)), ("a", None),
      ("b", Some(-3.5)), ("b", Some(0.0)),
      ("c", None),                    // null-only group: n = 0
      ("d", Some(42.42)))             // appears only in the second part
      .toDF("k", "value")
    val p1 = whole.filter(col("k").isin("a", "b", "c"))
    val p2 = whole.filter(col("k") === "d")
    val direct = Summary.summarize(whole, Seq("k"), col("value"))
    val merged = Summary.mergeSummaries(Seq("k"),
      Summary.summarize(p1, Seq("k"), col("value")),
      Summary.summarize(p2, Seq("k"), col("value")))
    assert(canon(merged) === canon(direct))
    assert(canon(Summary.finalizeSummary(merged, Seq("k"))) ===
      canon(Summary.finalizeSummary(direct, Seq("k"))))
  }

  test("merge is associative and commutative; empty part is identity") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0), ("c", -1.0),
      ("c", 7.25), ("c", 7.25)).toDF("k", "value")
    val Seq(s1, s2, s3) = Seq("a", "b", "c").map(k =>
      Summary.summarize(df.filter(col("k") === k), Seq("k"), col("value")))
    val direct = Summary.summarize(df, Seq("k"), col("value"))
    val leftFold = Summary.mergeSummaries(Seq("k"),
      Summary.mergeSummaries(Seq("k"), s1, s2), s3)
    val flipped = Summary.mergeSummaries(Seq("k"), s3, s1, s2)
    assert(canon(leftFold) === canon(direct))
    assert(canon(flipped) === canon(direct))
    val empty = Summary.summarize(df.filter(lit(false)), Seq("k"), col("value"))
    assert(canon(Summary.mergeSummaries(Seq("k"), direct, empty)) ===
      canon(direct), "merging an empty summary changes nothing")
  }

  test("finalize derives mean/variance matching the driver computation; " +
    "null-only groups report null metrics") {
    val vals = Seq(1.5, 2.5, 4.0)
    val df = vals.map(("a", _)).toDF("k", "value")
    val out = Summary.finalizeSummary(
      Summary.summarize(df, Seq("k"), col("value")), Seq("k")).head()
    val cents = vals.map(v => math.round(v * 100))
    val n = cents.size.toDouble
    val s = cents.sum.toDouble
    val q = cents.map(c => c.toDouble * c).sum
    assert(out.getLong(1) === vals.size.toLong)
    assert(math.abs(out.getDouble(2) - s / n / 100.0) < 1e-6)
    assert(math.abs(out.getDouble(3) - (q * n - s * s) / (n * n) / 1e4) < 1e-6)
    assert(out.getDouble(4) === 1.5 && out.getDouble(5) === 4.0)
    val nulls = Seq(("z", Option.empty[Double])).toDF("k", "value")
    val z = Summary.finalizeSummary(
      Summary.summarize(nulls, Seq("k"), col("value")), Seq("k")).head()
    assert(z.getLong(1) === 0L && z.isNullAt(2) && z.isNullAt(3))
  }

  test("shape guards: keys required, merge rejects non-summary frames") {
    val df = Seq(("a", 1.0)).toDF("k", "value")
    intercept[IllegalArgumentException](
      Summary.summarize(df, Seq.empty, col("value")))
    intercept[IllegalArgumentException](
      Summary.mergeSummaries(Seq("k"), df))
    intercept[IllegalArgumentException](Summary.mergeSummaries(Seq("k")))
  }
}
