package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The one-row commit-marker layout every generational/epochal store
  * shares (`<store>/commits/<key>=N` holding `is_base` and, since the
  * writer-identity hardening, `writer`). Centralized so a marker-schema
  * change lands once, not once per store.
  */
private[graft] object StoreCommits {
  import org.apache.hadoop.fs.{FileSystem, Path}
  import org.apache.parquet.example.data.simple.SimpleGroup
  import org.apache.parquet.hadoop.ParquetReader
  import org.apache.parquet.hadoop.api.ReadSupport
  import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
  import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
  import org.apache.parquet.schema.{MessageType, MessageTypeParser}

  /** One-row marker relations are read and written DRIVER-SIDE through
    * parquet-mr (no Spark job): a lifecycle op pays a marker write plus
    * at least one marker-tree read, and submitting a full Spark job —
    * plan, schedule, task, commit protocol — for one row each way was a
    * measured ~40-100 ms per marker, a visible slice of every
    * build/append/delete/forget at small batch sizes (QueryProfile r18:
    * the geo lifecycle queries run 70-200 jobs at < 10 ms of task time
    * per job). The files stay ORDINARY PARQUET — `spark.read.parquet`
    * reads driver-written markers and parquet-mr reads Spark-written
    * ones, so stores written by either vintage interoperate.
    */
  private val MarkerSchema: MessageType = MessageTypeParser.parseMessageType(
    "message commit { optional boolean is_base; optional binary writer (UTF8); }")
  private val SidecarSchema: MessageType = MessageTypeParser.parseMessageType(
    "message commit_writer { optional binary writer (UTF8); }")

  private def conf(spark: SparkSession) =
    spark.sparkContext.hadoopConfiguration

  /** Write the one-row marker at `dir` driver-side: temp file + rename,
    * so a concurrent or crashed writer leaves the marker either absent
    * (invisible epoch — the protocol's normal crash state) or complete,
    * exactly like the job-based overwrite write it replaces.
    */
  private def writeOneRow(spark: SparkSession, dir: String,
                          schema: MessageType,
                          fill: SimpleGroup => Unit): Unit = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf(spark))
    if (fs.exists(d)) fs.delete(d, true)
    fs.mkdirs(d)
    val tmp = new Path(d,
      s".part-00000-${java.util.UUID.randomUUID}.parquet.tmp")
    val w = ExampleParquetWriter.builder(
        HadoopOutputFile.fromPath(tmp, conf(spark)))
      .withConf(conf(spark)).withType(schema).build()
    val g = new SimpleGroup(schema)
    fill(g)
    w.write(g)
    w.close()
    fs.rename(tmp, new Path(d, "part-00000-marker.parquet"))
  }

  /** Write the commit marker at `$path/commits/$key` (one row:
    * is_base, writer) — driver-side, atomic-rename, no Spark job.
    */
  def writeMarker(spark: SparkSession, path: String, key: String,
                  isBase: Boolean, writer: String): Unit =
    writeOneRow(spark, s"$path/commits/$key", MarkerSchema, { g =>
      g.add("is_base", isBase)
      g.add("writer", writer)
    })

  /** Land a schema-carrying EMPTY parquet relation at `dir` driver-side
    * (temp file + atomic rename, overwrite semantics) — the zero-row
    * uniformity writes the store layouts require (a forget generation's
    * empty posting/fingerprint/registry deltas, an erasure epoch's empty
    * attrs relation) each previously paid a full Spark job to write
    * nothing. The schema converts exactly as Spark's own parquet writer
    * would, so `spark.read.parquet` round-trips it like the job-written
    * empty file it replaces.
    */
  def writeEmptyRelation(spark: SparkSession, dir: String,
                         schema: org.apache.spark.sql.types.StructType)
      : Unit = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf(spark))
    if (fs.exists(d)) fs.delete(d, true)
    fs.mkdirs(d)
    val tmp = new Path(d,
      s".part-00000-${java.util.UUID.randomUUID}.parquet.tmp")
    val w = ExampleParquetWriter.builder(
        HadoopOutputFile.fromPath(tmp, conf(spark)))
      .withConf(conf(spark))
      .withType(org.apache.spark.sql.GraftShim.parquetMessageType(schema))
      .build()
    w.close()
    fs.rename(tmp, new Path(d, "part-00000-empty.parquet"))
  }

  /** Driver-side read of the single row of one marker dir. Returns the
    * values of the requested field names that EXIST in the file (legacy
    * markers predate the writer column), or None when the dir holds no
    * non-empty part file.
    */
  private def readOneRow(fs: FileSystem, dir: Path,
                         spark: SparkSession)
      : Option[(Boolean, Option[String])] = {
    if (!fs.exists(dir)) return None
    val part = fs.listStatus(dir).find(st =>
      st.isFile && st.getLen > 0 &&
        st.getPath.getName.startsWith("part-"))
    part.flatMap { st =>
      val in = HadoopInputFile.fromPath(st.getPath, conf(spark))
      val fileSchema = {
        val fr = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try fr.getFooter.getFileMetaData.getSchema finally fr.close()
      }
      // project with the FILE's own field types (legacy markers wrote
      // is_base as required where the template says optional — parquet's
      // schema-containment check rejects a repetition mismatch)
      import scala.jdk.CollectionConverters._
      val wantedNames = MarkerSchema.getFields.asScala.map(_.getName).toSet
      val requested = new MessageType("commit",
        fileSchema.getFields.asScala
          .filter(f => wantedNames.contains(f.getName)).asJava)
      val c = new org.apache.hadoop.conf.Configuration(conf(spark))
      c.set(ReadSupport.PARQUET_READ_SCHEMA, requested.toString)
      val r = ParquetReader
        .builder(new GroupReadSupport(), st.getPath).withConf(c).build()
      try {
        val g = r.read()
        if (g == null) None
        else {
          val isBase = requested.containsField("is_base") &&
            g.getFieldRepetitionCount("is_base") > 0 &&
            g.getBoolean("is_base", 0)
          val writer =
            if (requested.containsField("writer") &&
                g.getFieldRepetitionCount("writer") > 0)
              Some(g.getString("writer", 0))
            else None
          Some((isBase, writer))
        }
      } finally r.close()
    }
  }

  /** Every committed key under `$path/commits` as key-value → is_base —
    * the `committedEpochs`/`committedGens` primitive, driver-side (one
    * FS listing + one tiny footer/page read per marker; no Spark job).
    */
  def committedMap(spark: SparkSession, path: String,
                   keyCol: String): Map[Long, Boolean] = {
    val root = new Path(s"$path/commits")
    val fs = root.getFileSystem(conf(spark))
    if (!fs.exists(root)) return Map.empty
    fs.listStatus(root).iterator.flatMap { st =>
      val name = st.getPath.getName
      if (!st.isDirectory || !name.startsWith(s"$keyCol=")) Iterator.empty
      else readOneRow(fs, st.getPath, spark).iterator.map { case (b, _) =>
        name.stripPrefix(s"$keyCol=").toLong -> b
      }
    }.toMap
  }

  /** (is_base, writer) of the marker at `$path/commits/$key` — writer
    * None for markers written before the writer-identity column existed
    * AND never upgraded. An upgraded legacy marker's writer lives in a
    * SIDECAR (`$path/commits_writer/$key`) so the migration never
    * rewrites a COMMITTED marker in place: an overwrite would delete the
    * marker before re-creating it, and a crash (or concurrent reader) in
    * that window loses a committed generation/epoch — the exact
    * crash-invisibility protocol the markers exist for. Losing a torn
    * sidecar merely degrades that one marker back to the legacy
    * fallback, never the commit itself.
    */
  def read(spark: SparkSession, path: String,
           key: String): (Boolean, Option[String]) = {
    val dir = new Path(s"$path/commits/$key")
    val fs = dir.getFileSystem(conf(spark))
    readOneRow(fs, dir, spark) match {
      case Some((isBase, w)) =>
        (isBase, w.orElse(sidecarWriter(spark, path, key)))
      case None =>
        throw new IllegalArgumentException(
          s"no commit marker at $path/commits/$key")
    }
  }

  private def sidecarWriter(spark: SparkSession, path: String,
                            key: String): Option[String] = {
    val p = new Path(s"$path/commits_writer/$key")
    val fs = p.getFileSystem(conf(spark))
    readOneRow(fs, p, spark).flatMap(_._2)
  }

  /** Fail with the seed contract NAMED when a store at `path` was never
    * seeded — the `latest*` entry points otherwise surface an opaque
    * parquet PATH_NOT_FOUND (or `empty.max`) from inside a streaming
    * sink's prologue (ADVICE r15). `what` names the store kind; the
    * message states the build-seeds-state-zero contract the sinks
    * document.
    */
  def requireSeeded(spark: SparkSession, path: String, what: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/commits")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p) && fs.listStatus(p).nonEmpty,
      s"$what at $path has no committed state — seed it with build() " +
        "(generation/epoch 0; an empty corpus is a legal seed for the " +
        "streaming sinks) before loading or admitting")
  }

  /** Upgrade LEGACY commit markers (written before the writer-identity
    * column existed) to an explicit `writer = "legacy"` — the
    * marker-upgrade migration (round-15 verdict): a legacy marker at a
    * replay's allocation slot forces the is_base fallback comparison,
    * which is blind to a non-base out-of-band append racing a non-base
    * replay; post-upgrade every marker carries a writer, so that replay
    * fails loudly instead. The writer lands in a SIDECAR
    * (`commits_writer/<key>` — see [[read]]): committed markers are
    * NEVER rewritten in place, so there is no window where a crash or a
    * concurrent reader loses one. `is_base` is untouched; upgraded
    * markers compare as "not this replay's own attempt" exactly like
    * any other out-of-band writer. Runs at every BASE commit (build
    * starts clean, so compaction/retrain is the first opportunity a
    * legacy store meets post-upgrade code) — one merged-schema read of
    * the marker tree (epoch-count-sized), sidecar writes only when
    * legacy markers exist, so a fully-upgraded store pays a no-op read.
    */
  def upgradeLegacy(spark: SparkSession, path: String,
                    keyCol: String): Unit = {
    val root = new Path(s"$path/commits")
    val fs = root.getFileSystem(conf(spark))
    if (!fs.exists(root)) return
    fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith(s"$keyCol=")) {
        val legacy = readOneRow(fs, st.getPath, spark)
          .exists(_._2.isEmpty)
        if (legacy)
          writeOneRow(spark, s"$path/commits_writer/$name",
            SidecarSchema, g => g.add("writer", "legacy"))
      }
    }
  }
}

/** Shared tombstone machinery for the epochal vector stores: a DELETE
  * is an epoch holding only erased vec_ids under `<store>/tombstones/
  * epoch=N`, and readers mask them out EPOCH-AWARE (a tombstone kills
  * rows written at or before its epoch only, so a re-admitted id is
  * live again). Centralized so the id-hash and geo stores share one
  * masking semantics.
  */
private[operators] object Tombstones {
  /** The live [base, epoch] tombstones as (vec_id, epoch), or None when
    * the range has none (the deletion-free fast path: no masking join).
    */
  def live(spark: SparkSession, path: String,
           base: Long, epoch: Long): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p) || fs.listStatus(p).isEmpty) None
    else {
      val inRange = (base to epoch).exists(e => fs.exists(
        new org.apache.hadoop.fs.Path(s"$path/tombstones/epoch=$e")))
      if (!inRange) None
      else Some(spark.read.parquet(s"$path/tombstones")
        .filter(col("epoch") >= base && col("epoch") <= epoch))
    }
  }

  /** Epoch-aware masking of a frame carrying its `epoch` column; drops
    * `epoch` either way. Broadcast-sized: tombstones are erasure-count.
    */
  def mask(spark: SparkSession, path: String, base: Long, epoch: Long,
           rows: DataFrame): DataFrame =
    live(spark, path, base, epoch).fold(rows.drop("epoch")) { t =>
      val tmax = t.groupBy(col("vec_id"))
        .agg(max(col("epoch")).as("__tepoch"))
      rows.join(broadcast(tmax), Seq("vec_id"), "left")
        .filter(col("__tepoch").isNull || col("epoch") > col("__tepoch"))
        .drop("epoch", "__tepoch")
    }
}

/** Persistent, SEGMENTED HNSW store — the graph-index counterpart of
  * [[EmbeddingStore]], under the same commit-marker epoch protocol
  * ([[DedupState]]'s crash-invisibility discipline: write data first,
  * marker last; readers prune unmarked epochs).
  *
  * Why segments: [[Hnsw.add]] mutates every touched shard, so folding a
  * micro-batch into a 100 TB standing graph would rewrite the store
  * every epoch. The deployment answer — the one Lucene ships for
  * HNSW — is segmentation: each admitted batch becomes its OWN small
  * graph (one or a few shards), searches fan out over every live
  * segment exactly like they fan over shards (a segment IS a set of
  * shards to [[Hnsw.neighbors]] — shard ids are made globally unique by
  * an epoch stride), and a periodic COMPACTION rebuilds the union into
  * one base segment, bounding segment count the way [[DedupState]]'s
  * bases bound generation count. Per-epoch write cost is batch-sized at
  * any corpus size; only compaction touches the corpus, on its own
  * cadence.
  *
  * Search-quality note, stated honestly: a fresh segment's graph is
  * small, so segment fan-out search is BETTER than one merged graph at
  * equal ef (more exhaustive per segment) at the price of more total
  * distance evals; compaction trades that back. Both states are
  * deterministic, and q191 audits the segmented state's recall.
  */
object HnswStore {

  /** A loaded view as of `epoch`: the unioned committed segment rows
    * (the exact frame [[Hnsw.neighbors]] searches).
    */
  case class Store(path: String, segments: DataFrame, epoch: Long)

  /** Globally-unique shard ids across segments: epoch e's shards live
    * at [e·Stride, e·Stride + shards). Stride bounds shards-per-segment;
    * the strided id is a LONG ([[Hnsw.Node]]'s shard column), so the
    * epoch range is ~1.4·10¹⁴ — a streaming sink consuming one epoch per
    * 30 s micro-batch (the cadence that would have exhausted an int
    * stride in ~11 days) outlives the hardware.
    */
  val ShardStride: Int = 1 << 16

  private[operators] def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private[operators] def committedEpochs(spark: SparkSession,
                              path: String): Map[Long, Boolean] =
    StoreCommits.committedMap(spark, path, "epoch")

  /** Write one epoch's segment (an [[Hnsw.build]] over exactly `rows`,
    * shard ids offset into the epoch's stride range), marker LAST.
    * Replays overwrite the same dirs behind the marker — idempotent.
    */
  private[graft] def writeEpoch(spark: SparkSession, path: String,
                         rows: DataFrame, epoch: Long, shards: Int,
                         m: Int, efConstruction: Int,
                         isBase: Boolean,
                         writer: String = "lifecycle"): Unit = {
    import spark.implicits._
    require(shards < ShardStride && epoch >= 0 &&
        epoch < Long.MaxValue / ShardStride,
      s"shards=$shards epoch=$epoch out of the stride range")
    Hnsw.build(rows, shards, m, efConstruction)
      .withColumn("shard", col("shard") + lit(epoch * ShardStride.toLong))
      .write.mode("overwrite").parquet(s"$path/segments/epoch=$epoch")
    // writer identity (the HnswGeoStore marker discipline): lifecycle
    // ops vs the streaming sink's per-batch tag — lets a crash-replay
    // tell its own crashed commit from an out-of-band op at the same
    // allocation even when both are bases. Driver-side one-row write —
    // no Spark job ([[StoreCommits.writeMarker]]).
    StoreCommits.writeMarker(spark, path, s"epoch=$epoch", isBase, writer)
    // base commits upgrade legacy (pre-writer-column) markers so the
    // replay guard's is_base-fallback blind spot decays deterministically.
    // Epoch 0 is exempt: [[build]] cleans the dir first, so the upgrade
    // scan there would be a guaranteed no-op listing
    if (isBase && epoch > 0L) StoreCommits.upgradeLegacy(spark, path, "epoch")
  }

  /** The latest committed epoch at `path`. */
  def latestEpoch(spark: SparkSession, path: String): Long = {
    StoreCommits.requireSeeded(spark, path, "HNSW store")
    committedEpochs(spark, path).keys.max
  }

  /** One epoch's commit marker: (is_base, writer) — writer None for
    * markers written before the writer-identity column existed.
    */
  private[graft] def commitMarker(spark: SparkSession, path: String,
                                  epoch: Long): (Boolean, Option[String]) =
    StoreCommits.read(spark, path, s"epoch=$epoch")

  /** Build the store: epoch 0 is a base segment over the whole corpus. */
  def build(spark: SparkSession, emb: DataFrame, path: String,
            shards: Int = 4, m: Int = 8,
            efConstruction: Int = 64): Store = {
    val f = fs(spark, path)
    val p = new org.apache.hadoop.fs.Path(path)
    if (f.exists(p)) f.delete(p, true)
    writeEpoch(spark, path, emb, 0L, shards, m, efConstruction,
      isBase = true)
    load(spark, path)
  }

  /** Load the latest committed epoch. */
  def load(spark: SparkSession, path: String): Store =
    loadAt(spark, path, committedEpochs(spark, path).keys.max)

  /** Load AS OF a committed epoch — the [latest base ≤ epoch, epoch]
    * segment range; deterministic re-reads for at-least-once replay.
    * [[delete]] tombstones in the range are masked out epoch-aware
    * ([[Tombstones.mask]] — deletion-free stores keep their exact
    * plans); deleted nodes' edges are elided at graph reconstruction
    * until the next [[compact]] physically removes the rows.
    */
  def loadAt(spark: SparkSession, path: String, epoch: Long): Store = {
    val commits = committedEpochs(spark, path)
    require(commits.contains(epoch),
      s"epoch $epoch is not committed at $path " +
        s"(committed: ${commits.keys.toSeq.sorted.mkString(",")})")
    val base = commits.collect { case (e, true) if e <= epoch => e }.max
    Store(path,
      Tombstones.mask(spark, path, base, epoch,
        spark.read.parquet(s"$path/segments")
          .filter(col("epoch") >= base && col("epoch") <= epoch)),
      epoch)
  }

  /** ERASE vectors from the standing id-hash store — [[HnswGeoStore
    * .delete]]'s tombstone-epoch contract on this route: epoch N+1
    * holds only the erased vec_ids, every surface reads the masked
    * view, and the next [[compact]] (a from-scratch rebuild over the
    * masked rows here — this store's compaction was always a rebuild)
    * physically removes them, bitwise the store that never saw the
    * docs. Erased ids re-admit as new; unknown ids are a committed
    * no-op (idempotent replays).
    */
  def delete(spark: SparkSession, store: Store, ids: DataFrame,
             writer: String = "lifecycle"): Store = {
    val epoch = store.epoch + 1
    require(epoch < Long.MaxValue / ShardStride,
      s"epoch $epoch out of the stride range")
    // stored-ids column streamed through a broadcast of the (small)
    // erasure set — never a corpus-side shuffle; an empty erasure
    // commits WITHOUT writing a tombstone partition (the deletion-free
    // fast-path contract)
    val del = store.segments.select(col("vec_id"))
      .join(broadcast(ids.select(col("vec_id")).distinct()),
        Seq("vec_id"), "left_semi")
    if (!del.isEmpty)
      del.write.mode("overwrite")
        .parquet(s"${store.path}/tombstones/epoch=$epoch")
    StoreCommits.writeMarker(spark, store.path, s"epoch=$epoch",
      isBase = false, writer = writer)
    loadAt(spark, store.path, epoch)
  }

  /** Fold a fresh batch in as epoch `store.epoch + 1`: its own new
    * segment (batch-sized write), or — `asBase` — a COMPACTION-WITH-
    * ADMISSION that rebuilds store ∪ batch into one base segment.
    * Caller contract: vec_ids disjoint from the store's (the admission
    * filter upholds it; [[Hnsw.add]]-style loud checks don't apply
    * across segments, where duplicate ids are legal for the search but
    * wrong for a corpus).
    */
  def append(spark: SparkSession, store: Store, fresh: DataFrame,
             asBase: Boolean = false, shards: Int = 1, m: Int = 8,
             efConstruction: Int = 64,
             writer: String = "lifecycle"): Store = {
    val rows =
      if (asBase)
        // persisted around the sizing count — compaction would otherwise
        // scan the whole store twice (once to size shards, once to build)
        graft.CacheRegistry.persist(
          store.segments.select(col("vec_id"), col("vec").as("embedding"))
            .unionByName(fresh.select(col("vec_id"),
              col("embedding").cast("array<double>"))))
      else fresh
    val segShards =
      if (asBase) {
        // the rehearsed shards ∝ corpus policy, through the sizing
        // helper: the ~512-node latency arm keeps compaction parallel at
        // local scale, the memory arm takes over when n·dim grows
        val n = rows.count()
        val dim =
          if (n == 0L) 1
          else rows.select(size(col("embedding"))).head().getInt(0)
        Hnsw.defaultShards(n, dim, m, maxNodesPerShard = 512L)
          .min(ShardStride - 1)
      } else shards
    writeEpoch(spark, store.path, rows, store.epoch + 1, segShards, m,
      efConstruction, asBase, writer)
    loadAt(spark, store.path, store.epoch + 1)
  }

  /** Collapse the live segment range into one base — the segment-count
    * antidote for long admission streams (and the eval-count antidote:
    * one graph at ~log n replaces per-segment fan-out).
    */
  def compact(spark: SparkSession, store: Store, m: Int = 8,
              efConstruction: Int = 64): Store =
    append(spark, store,
      spark.range(0).select(col("id").as("vec_id"),
        lit(null).cast("array<double>").as("embedding")),
      asBase = true, m = m, efConstruction = efConstruction)

  /** Delete segment dirs strictly older than the latest base ≤
    * `store.epoch` — fully contained in that base.
    */
  def vacuum(spark: SparkSession, store: Store): Unit = {
    val commits = committedEpochs(spark, store.path)
    val base = commits.collect { case (e, true) if e <= store.epoch => e }.max
    for (e <- commits.keys if e < base;
         dir <- Seq("segments", "tombstones", "commits",
           "commits_writer")) {
      val p = new org.apache.hadoop.fs.Path(s"${store.path}/$dir/epoch=$e")
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
    }
  }

  /** Top-k over every live segment — [[Hnsw.neighbors]] straight over
    * the unioned segment rows (globally-unique shard ids make the
    * segments just more shards to fan over).
    */
  def neighbors(store: Store, query: Array[Double], k: Int,
                efSearch: Int = 48): DataFrame =
    Hnsw.neighbors(store.segments, query, k, efSearch)

  /** Hard bound on [[incrementalAdmit]]'s batch row count, mirroring
    * [[FuzzyJoin]]'s `MaxJwKeyLen` discipline: the batch ships to the
    * driver and into every shard task as a closure literal (the design
    * trade that makes admission ONE pass over the segments instead of
    * |batch| scheduled jobs), so a corpus-sized frame must fail loudly at
    * plan time, not OOM the driver. 64k rows × a 64-dim double vector
    * ≈ 34 MB — comfortably a task-closure payload; corpus-scale probe
    * sets belong to [[Hnsw.nearDupPairs]]'s distributed fan-out.
    */
  private[graft] val MaxAdmitBatchRows = 65536

  /** Admission filter: a batch vector is dropped when the store's graph
    * search finds a stored neighbor at cosine ≥ `threshold` (the
    * store's own search semantics, as [[EmbeddingStore.incrementalAdmit]]
    * uses ITS cell-local semantics), when its vec_id is ALREADY STORED
    * (re-sent ids never re-admit, whatever their embedding now says —
    * the disjointness contract compaction depends on), or when an exact
    * within-batch near-dup with a smaller id exists
    * ([[Similarity.cosineNearDups]] over the batch — micro-batch-sized,
    * exact). Returns kept rows of `fresh` unchanged.
    */
  def incrementalAdmit(store: Store, fresh: DataFrame, threshold: Double,
                       efSearch: Int = 64): DataFrame = {
    val spark = fresh.sparkSession
    import spark.implicits._
    // id-disjointness is ENFORCED, not assumed: a re-sent id (even one
    // whose embedding drifted below the cosine threshold) must never be
    // admitted into a second segment — duplicate ids would surface twice
    // in merged top-k and crash the next compaction's Hnsw.build, so the
    // batch is anti-joined on the store's vec_ids first (an equi-join;
    // the stored row wins, the everyday CDC convention)
    val f = graft.CacheRegistry.persist(
      fresh.join(store.segments.select(col("vec_id")),
        Seq("vec_id"), "left_anti"))
    val n = f.count()
    require(n <= MaxAdmitBatchRows,
      s"incrementalAdmit ships the batch as a literal into one pass over " +
        s"the segments: $n rows exceeds $MaxAdmitBatchRows and would sit " +
        "on the driver and in every task closure. Micro-batch the " +
        "admission (the streaming sink's shape), or use " +
        "Hnsw.nearDupPairs for corpus-scale probe sets")
    val batch = f.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .as[(Long, Seq[Double])].collect()
    // per-batch-vector store search: micro-batch-sized driver loop of
    // DISTRIBUTED searches would schedule |batch| jobs; instead ship the
    // batch as a literal into ONE pass over the segments
    val hits = Hnsw.batchNeighborMax(store.segments,
      batch.map { case (id, v) => (id, v.toArray) }, efSearch)
    val vsStore = hits.filter(col("max_cos") >= threshold)
      .select(col("probe_id").as("vec_id"))
    val vsBatch = Similarity.cosineNearDups(f, threshold)
      .select(greatest(col("i"), col("j")).as("vec_id")).distinct()
    f.join(vsStore.unionByName(vsBatch).distinct(),
      Seq("vec_id"), "left_anti")
  }

  /** Corpus-wide near-dup pairs over the STANDING segmented index —
    * [[Hnsw.nearDupPairs]] straight over the live segment rows (segments
    * are just more shards to the fan-out): the semantic-dedup scan that
    * reuses an index already paid for by admission, instead of
    * [[graft.operators.Dedup.hnswNearDupPairs]]'s build-inline path.
    * Run it post-[[compact]] when possible — live segment count S is the
    * probe fan-out multiplier.
    */
  def nearDupPairs(store: Store, threshold: Double,
                   efSearch: Int = 64): DataFrame =
    Hnsw.nearDupPairs(store.segments, threshold, efSearch)

  /** One admission step: filter, fold survivors in as the next segment
    * (or base), return (kept, new store) — what the streaming sink
    * replays per micro-batch.
    */
  def admit(spark: SparkSession, store: Store, fresh: DataFrame,
            threshold: Double, asBase: Boolean = false,
            writer: String = "lifecycle")
      : (DataFrame, Store) = {
    val kept = graft.CacheRegistry.persist(
      incrementalAdmit(store, fresh, threshold))
    (kept, append(spark, store,
      kept.select(col("vec_id"), col("embedding")), asBase, writer = writer))
  }
}
