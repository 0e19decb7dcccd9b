package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The sf≥1 scale rehearsal — the first EXECUTED evidence for the
  * 100×-scale claims the operator scaladocs make. Upscales the sf0.1
  * testdata locally (never touching /root/testdata) and runs the
  * flagship dedup/ANN paths end-to-end, printing one timing line per
  * path; results are recorded in BASELINE.md's "scale rehearsal"
  * section.
  *
  * Upscaling contract (×F replicas):
  *  - documents: replica k shifts doc_id by k·10⁷ and rewrites every
  *    third token with a replica-salted suffix — that breaks EVERY
  *    3-shingle against other replicas (cross-replica Jaccard ≈ 0, so
  *    near-dup structure grows LINEARLY like a real corpus, not
  *    quadratically as naive duplication would) while transforming
  *    aligned near-dup pairs consistently WITHIN a replica (their mutual
  *    similarity survives, so each replica carries the original corpus's
  *    dup structure).
  *  - embeddings: replica k shifts vec_id and cyclically rotates the
  *    vector by k dims — norms and within-replica geometry are
  *    preserved exactly; cross-replica cosines decorrelate.
  *
  * Usage: sbt "runMain graft.tools.ScaleRehearsal [factor]"
  *   (factor defaults to 10 — sf0.1 × 10 = sf1-equivalent)
  */
object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    require(factor >= 2 && factor <= 200, s"factor $factor out of range")
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = sys.env.getOrElse("SPARK_GRAFT_REHEARSAL_DIR",
      s"${System.getProperty("java.io.tmpdir")}/graft-rehearsal-x$factor")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"REHEARSAL x$factor $label: ${(System.nanoTime() - t0) / 1e9}%.1f s ($rows rows)")
    }

    // ── upscale (cached on disk; delete the dir to regenerate) ─────────
    val docsPath = s"$base/documents.parquet"
    val embPath = s"$base/embeddings.parquet"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$docsPath/_SUCCESS"))) {
      val src = graft.sources.Tables.table(spark, srcDir, "documents")
      val replicas = (0 until factor).map { k =>
        if (k == 0) src
        else src
          .withColumn("doc_id", col("doc_id") + lit(k * 10000000L))
          .withColumn("text", concat_ws(" ",
            transform(split(col("text"), " "), (t, i) =>
              when(i % 3 === lit(k % 3), concat(t, lit(s"~$k")))
                .otherwise(t))))
      }
      time("generate documents") {
        val all = replicas.reduce(_ unionByName _)
          .withColumn("n_chars", length(col("text")))
          .repartition(32)
        all.write.mode("overwrite").parquet(docsPath)
        spark.read.parquet(docsPath).count()
      }
    }
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$embPath/_SUCCESS"))) {
      val src = graft.sources.Tables.table(spark, srcDir, "embeddings")
      val replicas = (0 until factor).map { k =>
        if (k == 0) src
        else src
          .withColumn("vec_id", col("vec_id") + lit(k * 10000000L))
          .withColumn("embedding",
            concat(slice(col("embedding"), k % 64 + 1, 64 - k % 64),
              slice(col("embedding"), 1, k % 64)))
      }
      time("generate embeddings") {
        replicas.reduce(_ unionByName _).repartition(32)
          .write.mode("overwrite").parquet(embPath)
        spark.read.parquet(embPath).count()
      }
    }
    val docs = spark.read.parquet(docsPath)
    val emb = spark.read.parquet(embPath)
    println(s"REHEARSAL x$factor corpus: ${docs.count()} docs, ${emb.count()} vectors")

    def run(df: DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save()
      -1L
    }

    // ── flagship dedup paths (xxhash64 scale defaults) ─────────────────
    time("jaccard_neardups") {
      run(graft.operators.Dedup.jaccardPairs(docs, threshold = 0.8))
      graft.CacheRegistry.releaseAll(); -1L
    }
    // ── correctness AT scale, not just speed: the replica construction
    //    makes two exact invariants provable — (a) zero cross-replica
    //    pairs (every 3-token window contains exactly one rewritten
    //    token, so replicas share no shingle at all), and (b) replicas
    //    with equal k mod 3 transform by the same position mask and a
    //    suffix-only shingle bijection, so their EXACT-Jaccard pair
    //    counts must be identical. A violation means the dedup pipeline
    //    broke somewhere between sf0.1 and this factor. ─────────────────
    time("jaccard_scale_invariants") {
      val pairs = graft.operators.Dedup.jaccardPairs(docs, threshold = 0.8)
        .select(col("i"), col("j"))
      def rep(c: org.apache.spark.sql.Column) =
        (c / 10000000L).cast("int")
      val cross = pairs.filter(rep(col("i")) =!= rep(col("j"))).count()
      require(cross == 0L,
        s"$cross cross-replica near-dup pairs — replicas must be disjoint")
      val perRep = pairs.groupBy(rep(col("i")).as("r")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      (1 until factor).groupBy(_ % 3).values.foreach { ks =>
        val counts = ks.map(k => perRep.getOrElse(k, 0L)).distinct
        require(counts.size == 1,
          s"pair counts diverge within a mask class: " +
            ks.map(k => s"$k=${perRep.getOrElse(k, 0L)}").mkString(", "))
      }
      graft.CacheRegistry.releaseAll()
      perRep.values.sum
    }
    time("minhash_neardups") {
      run(graft.operators.Dedup.minhashNearDups(docs, threshold = 0.8))
      graft.CacheRegistry.releaseAll(); -1L
    }
    time("dedup_corpus") {
      run(graft.operators.Dedup.dedupCorpus(docs, threshold = 0.8))
      graft.CacheRegistry.releaseAll(); -1L
    }
    time("minhash_calibration") {
      run(graft.operators.Dedup.minhashCalibration(docs))
      graft.CacheRegistry.releaseAll(); -1L
    }
    // ── persistent dedup store: build once, admit a 10% batch ──────────
    val storeDir = s"$base/dedup-store"
    val cut = docs.agg(max("doc_id")).head().getLong(0) * 9 / 10
    val corpusSide = docs.select(col("doc_id"), col("text"))
      .filter(col("doc_id") <= cut)
    val batchSide = docs.select(col("doc_id"), col("text"))
      .filter(col("doc_id") > cut)
    time("dedup_store_build") {
      graft.operators.DedupState.build(spark, corpusSide, storeDir)
      graft.CacheRegistry.releaseAll(); -1L
    }
    time("dedup_store_admission_batch") {
      run(graft.operators.DedupState.incrementalDedup(
        graft.operators.DedupState.load(spark, storeDir), batchSide))
      graft.CacheRegistry.releaseAll(); -1L
    }
    // ── ANN store: build once, query ───────────────────────────────────
    val annDir = s"$base/ann-store"
    val q = emb.orderBy(col("vec_id")).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toArray
    time("ann_store_build") {
      graft.operators.EmbeddingStore.buildAnn(spark, emb, annDir,
        k = 16, iters = 5, m = 8, pqK = 16, pqIters = 3)
      graft.CacheRegistry.releaseAll(); -1L
    }
    time("ann_store_query") {
      val st = graft.operators.EmbeddingStore.load(spark, annDir)
      run(graft.operators.EmbeddingStore.annNeighbors(spark, st, q, k = 20,
        nProbe = 12, rerank = 200, excludeId = Some(0L)))
      graft.CacheRegistry.releaseAll(); -1L
    }
    spark.stop()
  }
}
