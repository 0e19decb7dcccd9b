package graft.tools

import org.apache.spark.sql.SparkSession

/** Measure the session's per-job latency floor (measurement-only): a
  * trivial 1-task job, a 32-task job, a tiny shuffle, and a tiny parquet
  * write, each timed warm in a loop — the attribution basis for "the
  * lifecycle family's wall is jobs × floor" claims.
  *
  *   sbt "runMain graft.tools.JobFloor"
  */
object JobFloor {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-jobfloor-").toString
    def time(name: String, warm: Int = 5, n: Int = 40)(body: => Unit): Unit = {
      (1 to warm).foreach(_ => body)
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => body)
      val ms = (System.nanoTime() - t0) / 1e6 / n
      println(f"[floor] $name%-42s ${ms}%8.2f ms/job")
    }
    time("range(1).count  (1 task, no shuffle)") {
      spark.range(1).count()
    }
    time("range(1e4,32p).count (32 tasks)") {
      spark.range(10000).repartition(32).count()
    }
    time("groupBy.count tiny shuffle (AQE)") {
      spark.range(1000).selectExpr("id % 7 as k")
        .groupBy("k").count()
        .write.format("noop").mode("overwrite").save()
    }
    time("collect 1 row after filter") {
      spark.range(1000).filter($"id" === 500L).collect()
    }
    var i = 0
    time("tiny parquet write (1 row)", warm = 3, n = 20) {
      i += 1
      spark.range(1).write.mode("overwrite")
        .parquet(s"$scratch/w$i")
    }
    time("tiny parquet read.head (listing + footer)", warm = 3, n = 20) {
      spark.read.parquet(s"$scratch/w$i").head()
    }
    spark.stop()
  }
}
