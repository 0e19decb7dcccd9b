package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Misra–Gries aggregate contracts: exact when distinct ≤ k (any
  * partitioning), and in the approximate regime the classic guarantees —
  * at most k counters, undercount ≤ n/(k+1), every true heavy item
  * present.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def hh(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] =
    df.agg(GraftFunctions.heavy_hitters(col("tok"), k).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item"), col("h.count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact regime: distinct <= k gives exact counts under any partitioning") {
    val toks = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(7)("c")
    val df = scala.util.Random.shuffle(toks).toDF("tok").repartition(7)
    val got = hh(df, k = 16)
    assert(got === Map("a" -> 40L, "b" -> 25L, "c" -> 7L))
  }

  test("approximate regime: <= k counters, undercount <= n/(k+1), heavy present") {
    // 100 a's + 50 b's + 40 singletons; n = 190, k = 4 -> error bound 38
    val toks = Seq.fill(100)("a") ++ Seq.fill(50)("b") ++
      (1 to 40).map(i => s"x$i")
    val n = toks.size
    val k = 4
    val bound = n / (k + 1)
    val got = hh(scala.util.Random.shuffle(toks).toDF("tok").repartition(5), k)
    assert(got.size <= k, s"summary exceeded the counter budget: $got")
    // a (freq 100 > 38) must survive; its estimate within the bound
    assert(got.contains("a"), s"true heavy hitter dropped: $got")
    assert(got("a") <= 100L && got("a") >= 100L - bound, got.toString)
    got.foreach { case (item, est) =>
      val truth = toks.count(_ == item).toLong
      assert(est <= truth && est >= truth - bound,
        s"$item estimated $est, true $truth, bound $bound")
    }
  }

  test("nulls are ignored; empty input yields an empty summary") {
    val df = Seq(Some("a"), None, Some("a"), None).toDF("tok")
    assert(hh(df, 4) === Map("a" -> 2L))
    assert(hh(Seq.empty[String].toDF("tok"), 4) === Map.empty)
  }

  test("grouped: per-group summaries are independent") {
    val df = Seq(("g1", "a"), ("g1", "a"), ("g1", "b"), ("g2", "z"))
      .toDF("g", "tok")
    val got = df.groupBy(col("g"))
      .agg(GraftFunctions.heavy_hitters(col("tok"), 8).as("hh"))
      .select(col("g"), explode(col("hh")).as("h"))
      .select(col("g"), col("h.item"), col("h.count"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("g1", "a", 2L), ("g1", "b", 1L), ("g2", "z", 1L)))
  }
}
