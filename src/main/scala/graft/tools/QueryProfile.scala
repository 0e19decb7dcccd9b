package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Per-query empirical attribution (guide §1): run selected queries from
  * [[graft.SparkEntry.queries]] through the noop sink with a listener
  * counting jobs / stages / tasks / task time / shuffle bytes, and
  * optionally dump `.explain("formatted")` to a file per query.
  *
  * The bench ([[graft.Bench]]) answers "how long"; this tool answers
  * "where did it go" — a store-lifecycle query that spends its seconds on
  * 200 tiny jobs needs a different fix (fewer actions, smaller plans)
  * than one spending them on a single shuffle-heavy stage.
  *
  *   sbt "runMain graft.tools.QueryProfile <nameRegex> [sfDir] [planDir]"
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val only = args.headOption.getOrElse(".*").r
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val planDir = if (args.length > 2) Some(args(2)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scratch =
      java.nio.file.Files.createTempDirectory("graft-profile-scratch-")
    System.setProperty("java.io.tmpdir", scratch.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxPlanStringLength", "10000000")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "6000")
      // sort writer, never bypass — see the Bench.scala session note
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS", "0"))
      // A/B hook: AQE partition coalescing driven by advisory byte size
      // (false) vs parallelism-first (true, the Spark default)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PFIRST", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    val gcMs = new AtomicLong
    val shufR = new AtomicLong
    val shufW = new AtomicLong
    val input = new AtomicLong
    // SPARK_GRAFT_PROFILE_STAGES=1: per-stage task counts and task-time,
    // printed as they complete — attribution for WHICH stage inflates
    // when per-task time balloons (the 8-vs-32-core diagnostic)
    val perStage = sys.env.get("SPARK_GRAFT_PROFILE_STAGES").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        if (perStage) {
          val i = s.stageInfo
          val m = i.taskMetrics
          System.err.println(f"[stage] id=${i.stageId}%5d " +
            f"tasks=${i.numTasks}%5d " +
            f"taskSec=${m.executorRunTime / 1e3}%8.2f " +
            f"cpuSec=${m.executorCpuTime / 1e9}%8.2f " +
            f"gcSec=${m.jvmGCTime / 1e3}%6.2f " +
            s"name=${i.name.takeWhile(_ != '\n').take(80)}")
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskMs.addAndGet(m.executorRunTime)
          gcMs.addAndGet(m.jvmGCTime)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          input.addAndGet(m.inputMetrics.bytesRead)
        }
      }
    })
    // warm the session outside every measurement (parquet reader, codegen,
    // shuffle machinery, noop sink) — the Bench discipline
    try spark.read.parquet(s"$sfDir/nation.parquet")
      .groupBy("n_regionkey").count()
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROFILE_RUNS", "2").toInt
    val selected = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.findFirstIn(q._1).isDefined)
    println(f"${"query"}%-36s pass ${"sec"}%8s ${"jobs"}%5s ${"stages"}%6s " +
      f"${"tasks"}%6s ${"taskSec"}%8s ${"gcSec"}%6s ${"shufMB"}%7s ${"inMB"}%7s")
    selected.foreach { case (name, fn) =>
      for (pass <- 1 to passes) {
        jobs.set(0); stages.set(0); tasks.set(0)
        taskMs.set(0); gcMs.set(0); shufR.set(0); shufW.set(0); input.set(0)
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          if (pass == 1) planDir.foreach { d =>
            java.nio.file.Files.createDirectories(java.nio.file.Path.of(d))
            java.nio.file.Files.writeString(
              java.nio.file.Path.of(d, s"$name.txt"),
              df.queryExecution.explainString(
                org.apache.spark.sql.execution.ExplainMode.fromString(
                  "formatted")))
          }
          df.write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          // let straggling listener events drain before reading counters
          Thread.sleep(200)
          println(f"$name%-36s $pass%4d $sec%8.3f ${jobs.get}%5d " +
            f"${stages.get}%6d ${tasks.get}%6d ${taskMs.get / 1e3}%8.2f " +
            f"${gcMs.get / 1e3}%6.2f " +
            f"${(shufR.get + shufW.get) / 1e6}%7.1f ${input.get / 1e6}%7.1f")
        } catch { case e: Throwable =>
          println(s"$name pass $pass FAILED: ${e.getMessage}")
        }
        graft.CacheRegistry.releaseAll()
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(scratch).iterator().asScala.toSeq
        .reverseIterator.foreach(p =>
          try java.nio.file.Files.deleteIfExists(p)
          catch { case _: Throwable => () })
    } catch { case _: Throwable => () }
  }
}
