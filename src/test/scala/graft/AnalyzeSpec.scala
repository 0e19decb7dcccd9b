package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import graft.operators.Analyze

/** The stats → planner feedback loop ([[graft.operators.Analyze]]):
  * collected statistics must land where the optimizer actually reads
  * them, and change a real plan decision — not just sit in a report.
  *
  * The flip pinned here is the canonical CBO one: a dimension subquery
  * `dim WHERE key <= cut` joins a fact table. Without stats the filter's
  * output size is unestimable, the planner keeps the whole-file size,
  * and the join sort-merges; after `Analyze.analyze` writes row count +
  * min/max/NDV into the session catalog, filter estimation prices the
  * subquery under the broadcast threshold and the SAME query — no hints,
  * no conf per query — plans a BroadcastHashJoin.
  */
class AnalyzeSpec extends SparkSpec {

  private def collectNodes(p: SparkPlan): Seq[String] = {
    val b = Seq.newBuilder[String]
    def walk(n: SparkPlan): Unit = n match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case _ => b += n.nodeName; n.children.foreach(walk)
    }
    walk(p)
    b.result()
  }

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("analyze writes ColumnStats-collected numbers into the catalog") {
    Analyze.registerParquetTable(spark, "graft_stats_orders",
      s"$sf0001/orders.parquet")
    try {
      val written = Analyze.analyze(spark, "graft_stats_orders",
        Seq("o_orderkey", "o_orderpriority"))
      val n = spark.table("graft_stats_orders").count()
      assert(written.rowCount === Some(BigInt(n)))
      assert(written.sizeInBytes > 0 &&
        written.sizeInBytes === BigInt(
          new java.io.File(s"$sf0001/orders.parquet").length()))
      val key = written.colStats("o_orderkey")
      assert(key.distinctCount === Some(BigInt(n)), "o_orderkey is unique")
      assert(key.nullCount === Some(BigInt(0)))
      assert(key.min.isDefined && key.max.isDefined)
      val prio = written.colStats("o_orderpriority")
      assert(prio.min.isEmpty && prio.max.isEmpty,
        "no min/max for string columns — Spark stores none")
      assert(prio.avgLen.exists(_ > 0) && prio.maxLen.exists(_ > 0))
      // and the catalog actually HOLDS them (not just the return value)
      val held = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(
          "graft_stats_orders")).stats
      assert(held.exists(_.rowCount === Some(BigInt(n))))
    } finally spark.sql("DROP TABLE IF EXISTS graft_stats_orders")
  }

  test("injected stats flip a filtered-dim join to broadcast — no hint") {
    Analyze.registerParquetTable(spark, "graft_cbo_fact",
      s"$sf0001/lineitem.parquet")
    Analyze.registerParquetTable(spark, "graft_cbo_dim",
      s"$sf0001/orders.parquet")
    try withConfs(
      "spark.sql.cbo.enabled" -> "true",
      // orders.parquet is ~36 KB: below the 10 MB default everything
      // broadcasts and the flip is invisible; a 16 KB threshold puts the
      // unestimated dim ABOVE and the stats-estimated subquery BELOW
      "spark.sql.autoBroadcastJoinThreshold" -> "16384") {
      val mm = spark.table("graft_cbo_dim")
        .agg(min(col("o_orderkey")), max(col("o_orderkey"))).head()
      val cut = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 50
      def planNodes: Seq[String] = {
        val q = spark.table("graft_cbo_fact")
          .join(spark.table("graft_cbo_dim")
              .filter(col("o_orderkey") <= cut),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(sum(col("l_quantity")).as("qty"))
        collectNodes(q.queryExecution.executedPlan)
      }
      val before = planNodes
      assert(before.exists(_.contains("SortMergeJoin")),
        s"without stats the filtered dim must not be priced broadcastable: $before")
      Analyze.analyze(spark, "graft_cbo_dim",
        Seq("o_orderkey", "o_orderpriority"))
      val after = planNodes
      assert(after.exists(_.contains("BroadcastHashJoin")),
        s"with stats the ~2% dim subquery must broadcast: $after")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_cbo_fact")
      spark.sql("DROP TABLE IF EXISTS graft_cbo_dim")
    }
  }

  test("analyzeFromSketches: catalog NDV from merged per-batch sketches, " +
    "no table scan") {
    import graft.operators.ColumnStats
    Analyze.registerParquetTable(spark, "graft_sketch_orders",
      s"$sf0001/orders.parquet")
    try {
      val t = spark.table("graft_sketch_orders")
      // two "ingest batches" sketched independently, merged at analyze
      val b1 = ColumnStats.ndvSketches(
        t.filter(col("o_orderkey") % 2 === 0), Seq("o_custkey"))
      val b2 = ColumnStats.ndvSketches(
        t.filter(col("o_orderkey") % 2 === 1), Seq("o_custkey"))
      val written = Analyze.analyzeFromSketches(spark,
        "graft_sketch_orders", Seq(b1, b2), rowCount = 1500L,
        sizeInBytes = 36647L)
      val exact = t.select(countDistinct(col("o_custkey"))).head().getLong(0)
      val est = written.colStats("o_custkey").distinctCount.get.toDouble
      assert(math.abs(est - exact) / exact < 0.05,
        s"merged-sketch NDV $est vs exact $exact")
    } finally spark.sql("DROP TABLE IF EXISTS graft_sketch_orders")
  }
}
