package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomJoin
import graft.sources.Tables

/** [[graft.operators.BloomJoin]]: the pre-filter must be invisible in the
  * RESULT (no false negatives + exact join cleanup ≡ plain join), visible
  * in the PLAN (a scan-side filter, no extra shuffle), and actually
  * selective (false-positive rate near the Bloom formula, not near 1).
  */
class BloomJoinSpec extends SparkSpec {

  private def customers = Tables.table(spark, sf0001, "customer")
  private def orders = Tables.table(spark, sf0001, "orders")

  test("prunedJoin equals the plain join bit-for-bit") {
    val dim = customers.filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey", "c_mktsegment")
    val pruned = BloomJoin.prunedJoin(orders, dim, "o_custkey", "c_custkey",
        numBits = 1 << 14)
      .select("o_orderkey", "o_custkey", "c_mktsegment")
      .collect().map(_.toSeq).toSet
    val plain = orders.join(dim, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_custkey", "c_mktsegment")
      .collect().map(_.toSeq).toSet
    assert(pruned == plain)
    assert(pruned.nonEmpty)
  }

  test("no false negatives: every built key passes its own probe") {
    val dim = customers.select("c_custkey")
    val bits = BloomJoin.buildBits(dim, "c_custkey", numBits = 1 << 14)
    val missed = dim
      .filter(!BloomJoin.probeExpr(col("c_custkey"), bits))
      .count()
    assert(missed == 0L)
  }

  test("false-positive rate on disjoint keys stays near the Bloom formula") {
    import spark.implicits._
    val present = (0 until 1000).map(_.toLong).toDF("k")
    val absent = (100000 until 101000).map(_.toLong).toDF("k")
    val bits = BloomJoin.buildBits(present, "k", numBits = 1 << 14)
    val fp = absent.filter(BloomJoin.probeExpr(col("k"), bits)).count()
    // (1 − e^(−kn/m))^k ≈ 0.2% at n=1000, m=16384, k=4; allow 10× slack
    assert(fp <= 20, s"false-positive count $fp out of 1000 absent keys")
  }

  test("probe is scan-side: the filtered fact plan has no Exchange") {
    val bits = BloomJoin.buildBits(customers, "c_custkey", numBits = 1 << 14)
    val filtered = orders.filter(BloomJoin.probeExpr(col("o_custkey"), bits))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"probe filter introduced a shuffle:\n$plan")
    assert(plan.contains("xxhash64"), "probe filter missing from the plan")
  }

  test("build collects only bitset-sized state regardless of key count") {
    // 50k keys into a 2^10-bit filter: the aggregation output is at most
    // 16 words — the driver never sees per-key rows. (Saturated filter:
    // every word non-zero, probe passes everything — exactness still holds
    // via the join; this test pins the BOUND, the one above pins the rate.)
    import spark.implicits._
    val many = (0 until 50000).map(_.toLong).toDF("k")
    val bits = BloomJoin.buildBits(many, "k", numBits = 1 << 10)
    assert(bits.length == 16)
    assert(bits.forall(_ != 0L))
  }
}
