package graft

import org.apache.spark.sql.functions._
import graft.sources.ZOrder
import graft.sources.Tables

/** Z-order layout contracts: the Morton key expression must compute the
  * textbook interleave bit for bit (pinned against a driver reference
  * over edge values), and the LAYOUT must deliver what it exists for —
  * each written file covering a small hyper-rectangle of the combined
  * key space, where a one-column sort leaves every file spanning the
  * full range of the other column.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zkeyExpr equals the driver reference on edge and interior values") {
    val ranges = Seq((0.0, 100.0), (-50.0, 50.0))
    val rows = Seq(
      (Some(0.0), Some(-50.0)),   // both lowest buckets
      (Some(100.0), Some(50.0)),  // both highest
      (Some(-10.0), Some(70.0)),  // out-of-range clamps
      (Some(37.5), Some(0.0)),
      (Some(99.99), Some(-49.99)),
      (None, Some(12.0)),         // null ranks lowest
      (Some(55.5), None))
    val df = rows.toDF("a", "b")
    for (bits <- Seq(4, 8, 16)) {
      val got = df.select(ZOrder.zkeyExpr(
          Seq((col("a"), 0.0, 100.0), (col("b"), -50.0, 50.0)), bits))
        .collect().map(_.getLong(0))
      val want = rows.map { case (a, b) =>
        ZOrder.zkeyReference(Seq(a, b), ranges, bits) }
      assert(got.toSeq === want, s"bits=$bits")
    }
    // interleave structure itself: bucket bits land at b*n+i exactly
    // (bits=2, 2 cols: a=0b11 -> positions 0 and 2, b=0b01 -> position 1)
    val k = Seq((Some(100.0), Some(-25.0))).toDF("a", "b")
      .select(ZOrder.zkeyExpr(
        Seq((col("a"), 0.0, 100.0), (col("b"), -50.0, 50.0)), bits = 2))
      .head().getLong(0)
    // a buckets to 3 (11b), b to floor(0.25*3)=0 (00b):
    // key = a0<<0 | b0<<1 | a1<<2 | b1<<3 = 1 | 0 | 4 | 0 = 5
    assert(k === 5L)
  }

  test("z-ordered files cover small rectangles; a one-column sort leaves " +
    "the other dimension unpruned") {
    val li = Tables.table(spark, sf0001, "lineitem")
      .select(col("l_extendedprice").as("a"), col("l_discount").as("b"))
    val cols = Seq(("a", 900.0, 105000.0), ("b", 0.0, 0.1))
    val zDir = tmpDir("graft-zorder")
    val sDir = tmpDir("graft-sorted")
    ZOrder.zorder(li, cols, numFiles = 8).write
      .mode("overwrite").parquet(zDir)
    li.repartitionByRange(8, col("a")).sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(sDir)
    // per-FILE normalized min/max span of each column — exactly what
    // footer-stats pruning sees. Total covered VOLUME is ~1/numFiles for
    // any total-order layout; the z-order win is per-dimension BALANCE:
    // a one-column sort leaves every file spanning ~the full range of the
    // OTHER column (a predicate on it skips nothing), while the curve
    // splits both dimensions, so single-column predicates on EITHER
    // column can skip files.
    def meanSpans(dir: String): (Double, Double) = {
      val r = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(((max(col("a")) - min(col("a"))) / (105000.0 - 900.0)).as("ra"),
          ((max(col("b")) - min(col("b"))) / 0.1).as("rb"))
        .agg(avg(col("ra")), avg(col("rb"))).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val (zA, zB) = meanSpans(zDir)
    val (sA, sB) = meanSpans(sDir)
    assert(sB > 0.9,
      s"one-column sort should leave b unpruned per file, got $sB")
    assert(zB < 0.75 && zB < sB,
      s"z-order must shrink the second dimension's file spans: z=$zB sort=$sB")
    assert(zA < 0.75,
      s"z-order must keep the first dimension prunable too: z=$zA (sort: $sA)")
    // and the layout is only a LAYOUT: the rows are untouched
    val zBack = spark.read.parquet(zDir)
    assert(zBack.count() === li.count())
    assert(zBack.columns.toSeq === Seq("a", "b"), "no helper column leaks")
  }

  test("contracts: >= 2 columns, bit budget, non-empty ranges") {
    val df = Seq((1.0, 2.0)).toDF("a", "b")
    intercept[IllegalArgumentException](
      ZOrder.zkeyExpr(Seq((col("a"), 0.0, 1.0))))
    intercept[IllegalArgumentException](
      ZOrder.zkeyExpr(Seq((col("a"), 0.0, 1.0), (col("b"), 0.0, 1.0)),
        bits = 32))
    intercept[IllegalArgumentException](
      ZOrder.zkeyExpr(Seq((col("a"), 1.0, 1.0), (col("b"), 0.0, 1.0))))
    intercept[IllegalArgumentException](
      ZOrder.zorder(df, Seq(("a", 0.0, 1.0), ("b", 0.0, 1.0)), numFiles = 0))
  }
}
