package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch bisector for the round-13/14 "IVF family doubles beside the
  * geo-store lifecycle" session artifact: runs ONE piece of q196's body
  * (chosen by arg), then times q128's exact plan, N times in one JVM —
  * the controlled-adjacency experiment Bench can't express. Not part of
  * the library surface; kept for reproducibility of the BASELINE
  * attribution.
  *
  * Usage: runMain graft.tools.AdjProbe [variant] [reps]
  * variants: none | train | build | delta | compact | scan | q196
  */
object AdjProbe {
  def main(args: Array[String]): Unit = {
    val variant = args.headOption.getOrElse("none")
    val reps = args.lift(1).map(_.toInt).getOrElse(6)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxPlanStringLength", "1000000")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "6000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the probed query defaults to q128 (the original reproducer); any
    // inventory query can stand in via SPARK_GRAFT_ADJPROBE_QUERY —
    // e.g. q25_cosine_pairs to test the array_dot call site
    val probeName =
      sys.env.getOrElse("SPARK_GRAFT_ADJPROBE_QUERY", "q128_ivfadc")
    val q128 = graft.SparkEntry.queries(probeName)
    def emb = graft.sources.Tables.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-adjprobe"

    def runVariant(): Unit = variant match {
      case "none" => ()
      case "train" =>
        graft.operators.IVF.train(emb, 4, 5, maxTrainRows = 400L)
        ()
      case "build" | "delta" | "compact" | "scan" =>
        val index = graft.operators.IVF.train(emb, 4, 5, maxTrainRows = 400L)
        val base = graft.operators.HnswGeoStore.build(spark,
          emb.filter(col("vec_id") < 200), path, index)
        if (variant != "build") {
          val grown = graft.operators.HnswGeoStore.append(spark, base,
            emb.filter(col("vec_id") >= 200 && col("vec_id") < 350))
          if (variant == "compact")
            graft.operators.HnswGeoStore.append(spark, grown,
              emb.filter(col("vec_id") >= 350), asBase = true)
          if (variant == "scan")
            graft.operators.HnswGeoStore.nearDupPairs(grown, 0.35, nProbe = 8)
              .write.format("noop").mode("overwrite").save()
        }
      case "q196" =>
        graft.SparkEntry.queries("q196_geostore_lifecycle")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      case "prune" =>
        // one-off plan check (VERDICT r13 "What's wrong #2"): the
        // compaction's delta re-read must prune to (vec_id, vec) at the
        // parquet scan — print the scan's ReadSchema to settle it
        val index = graft.operators.IVF.train(emb, 4, 5, maxTrainRows = 400L)
        val base = graft.operators.HnswGeoStore.build(spark,
          emb.filter(col("vec_id") < 200), path, index)
        val st = graft.operators.HnswGeoStore.append(spark, base,
          emb.filter(col("vec_id") >= 200 && col("vec_id") < 350))
        val baseLo = st.baseEpoch * graft.operators.HnswGeoStore.CellStride
        val deltaVecs = st.segments
          .filter(col("shard") >= baseLo + graft.operators.HnswGeoStore.CellStride)
          .select(col("vec_id"), col("vec").as("embedding"))
        deltaVecs.queryExecution.executedPlan.toString.linesIterator
          .filter(l => l.contains("ReadSchema") || l.contains("FileScan"))
          .foreach(l => System.err.println(s"[adjprobe] $l"))
      case other => sys.error(s"unknown variant $other")
    }

    // A/B/A within ONE JVM: host noise swamps cross-JVM comparisons
    // (separate probe launches of the same variant spread 2.6–3.6 s),
    // but the q196 pairing effect is large and SUSTAINED within a JVM —
    // so warm up, baseline, inject the variant, then re-baseline.
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val durs = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Long]())
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.put(s.jobId, s.time); ()
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobs.remove(e.jobId))
            .foreach(t0 => { durs.add(e.time - t0); () })
        }
      })
    def one(phase: String, i: Int, inject: Boolean): Unit = {
      if (inject) {
        // the injected leg is itself timed: with variants build/delta/
        // compact/scan this doubles as q196's PER-LEG cost attribution
        // (VERDICT r14 #7 — keep the one measured e2e number explainable)
        val tv0 = System.nanoTime()
        runVariant()
        System.err.println(
          f"[adjprobe] variant=$variant legTime=${(System.nanoTime() - tv0) / 1e9}%6.3f s")
      }
      graft.CacheRegistry.releaseAll()
      val cg = org.apache.spark.metrics.source.CodegenMetrics
      val n0 = cg.METRIC_COMPILATION_TIME.getCount
      durs.clear()
      val t0 = System.nanoTime()
      q128(spark, sfDir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      val dn = cg.METRIC_COMPILATION_TIME.getCount - n0
      graft.CacheRegistry.releaseAll()
      val ds = {
        val a = new java.util.ArrayList[Long](durs)
        scala.jdk.CollectionConverters.ListHasAsScala(a).asScala.toSeq
      }
      System.err.println(
        f"[adjprobe] variant=$variant phase=$phase rep=$i $probeName=$t%6.3f s " +
          f"janinoCompiles=+$dn%3d jobs=${ds.size}%d " +
          f"jobSum=${ds.sum}%5d ms top=[${ds.sorted.reverse.take(6).mkString(",")}]")
    }
    // JFR method-profile per phase (SPARK_GRAFT_ADJPROBE_JFR=1): the
    // same generated classes run slower post-flip with zero recompiles —
    // only an execution-sample diff can name the method that changed
    // shape (the JIT deopt/profile-pollution hypothesis).
    val jfr = sys.env.get("SPARK_GRAFT_ADJPROBE_JFR").contains("1")
    def phase(tag: String, inject: Boolean): Unit = {
      val rec = if (!jfr) None else Some {
        val r = new jdk.jfr.Recording(
          jdk.jfr.Configuration.getConfiguration("profile"))
        r.start(); r
      }
      for (i <- 1 to reps) one(tag, i, inject)
      rec.foreach { r =>
        r.stop()
        r.dump(java.nio.file.Paths.get(s"/tmp/adjprobe-$variant-$tag.jfr"))
        r.close()
      }
    }
    // warmup outside the recorded phases (first rep janino-compiles)
    one("warmup", 0, inject = false)
    phase("pre", inject = false)
    phase("mid", inject = true)
    phase("post", inject = false)
    spark.stop()
  }
}
