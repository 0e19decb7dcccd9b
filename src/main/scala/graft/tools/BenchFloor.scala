package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribution of the per-query bench floor: ~140 inventory queries sit
  * at 0.2–0.6 s in `graft.Bench` where the pure compute would be tens of
  * milliseconds. This tool decomposes that floor into its fixed parts —
  * job submission, catalyst planning, scan setup, one 32-partition
  * shuffle round — by timing each in isolation (min over N runs: the
  * floor is a minimum-cost question, so the minimum is the estimator;
  * means would re-import the host noise the bench's best-of-2 already
  * filters).
  *
  * The decomposition answers BASELINE.md's "what does a 0-row query
  * cost" line: everything here is per-JOB session machinery a real
  * cluster pays once per query too (driver-side planning + scheduling),
  * not an artifact of the harness — the harness adds only
  * `CacheRegistry.releaseAll()` (timed here as well, expected free).
  *
  * Usage: sbt "runMain graft.tools.BenchFloor [runs]"
  */
object BenchFloor {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(30)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxPlanStringLength", "1000000")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup the bench runs: JVM/codegen/shuffle spin-up happens
    // outside every measurement below
    spark.read.parquet(s"$sfDir/nation.parquet").groupBy("n_regionkey")
      .count().write.format("noop").mode("overwrite").save()

    def measure(label: String)(f: => Unit): Unit = {
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val sorted = times.sorted
      println(f"FLOOR $label: min=${sorted.head}%.4f " +
        f"p50=${sorted(runs / 2)}%.4f max=${sorted.last}%.4f s ($runs runs)")
    }

    // 1-task job on an in-memory row: pure scheduler round trip
    measure("job_submit_1task") {
      spark.range(1).write.format("noop").mode("overwrite").save()
    }
    // 32-task job: task-launch fanout on an empty compute
    measure("job_submit_32task") {
      spark.range(0, 32, 1, 32)
        .write.format("noop").mode("overwrite").save()
    }
    // one full shuffle round at spark.sql.shuffle.partitions
    measure("shuffle_round_32") {
      spark.range(0, 100, 1, 32).groupBy(col("id") % 7).count()
        .write.format("noop").mode("overwrite").save()
    }
    // catalyst analysis+optimization+physical planning, NO execution
    measure("plan_only_q01") {
      graft.SparkEntry.queries("q01_filter_project")(spark, sfDir)
        .queryExecution.executedPlan
    }
    measure("plan_only_q06_pivot") {
      graft.SparkEntry.queries("q06_pivot")(spark, sfDir)
        .queryExecution.executedPlan
    }
    // smallest real scan end-to-end (footer read + vectorized scan + noop)
    measure("scan_nation_noop") {
      graft.sources.Tables.table(spark, sfDir, "nation")
        .write.format("noop").mode("overwrite").save()
    }
    // fact-table scan end-to-end: the floor for anything touching lineitem
    measure("scan_lineitem_noop") {
      graft.sources.Tables.table(spark, sfDir, "lineitem")
        .write.format("noop").mode("overwrite").save()
    }
    // scan + one aggregation shuffle: the minimal real query shape
    measure("agg_lineitem_noop") {
      graft.sources.Tables.table(spark, sfDir, "lineitem")
        .groupBy("l_returnflag").count()
        .write.format("noop").mode("overwrite").save()
    }
    // the harness's own per-query bookkeeping
    measure("cache_release") { graft.CacheRegistry.releaseAll() }
    // a representative full inventory query, same call the bench makes
    measure("full_q01") {
      graft.SparkEntry.queries("q01_filter_project")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
