package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.hadoop.fs.Path

/** Source-side utilities: testdata table loading, generic csv/parquet scans
  * with the reference's ingest conventions, and latest-date-partition
  * resolution (/root/reference/anonymize_datasets.py:154-159).
  */
object Tables {

  /** Read one testdata table: `spark.read.parquet(s"$dir/$name.parquet")`.
    * Columnar vectorized scan; Catalyst pushes filters/projections into it.
    *
    * Nanosecond-precision parquet timestamps (pyarrow's default, used by
    * `events.ts`) are illegal for Spark's reader; `nanosAsLong` surfaces
    * them as raw nanos, which we convert to TIMESTAMP_NTZ at microsecond
    * precision (sessions are pinned UTC, so wall time is preserved). The
    * conf is set here so any caller session works.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (df.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType))
      df.withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
    else df
  }

  /** CSV scan with the reference's conventions: header row, inferred schema,
    * all column names lowercased on ingest (/root/reference/main.py:159-160).
    */
  def csv(spark: SparkSession, path: String): DataFrame =
    lowercaseColumns(
      spark.read.option("header", "true").option("inferSchema", "true").csv(path))

  /** Parquet scan + lowercase-columns ingest convention
    * (/root/reference/anonymize_datasets.py:39,132-133).
    */
  def parquet(spark: SparkSession, path: String): DataFrame =
    lowercaseColumns(spark.read.parquet(path))

  /** JSON-lines scan + the same lowercase-columns convention — the
    * de-facto interchange format for LLM text corpora (one JSON document
    * per line; Spark's json reader splits and infers in parallel). Pass an
    * explicit schema at real scale: inference is its own full pass over
    * the data.
    */
  def jsonl(spark: SparkSession, path: String,
            schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val reader = spark.read
    lowercaseColumns(schema.fold(reader.json(path))(s => reader.schema(s).json(path)))
  }

  /** P1: lowercase every column name. */
  def lowercaseColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toLowerCase).toIndexedSeq: _*)

  /** P2: rename columns by map (reference `df.rename(columns={...})`,
    * /root/reference/anonymize_datasets.py:71,83 + sandbox_anon cell 4);
    * absent keys are ignored, pandas-style.
    */
  def renameColumns(df: DataFrame, renames: Map[String, String]): DataFrame =
    df.withColumnsRenamed(renames)

  /** Spread a narrow scan across the cluster before CPU-heavy per-row work
    * (tokenize/explode/regex). A small single-file parquet arrives as ONE
    * input split, which would serialize everything upstream of the first
    * shuffle into one task; at real scale the scan already has >= cores
    * splits and this is a no-op — the condition, not the shuffle, is the
    * 100 TB path.
    *
    * Applies ONLY to narrow plans (scan + project/filter): a plan that
    * already shuffles (aggregate, join, repartition, ...) gets its
    * parallelism from `spark.sql.shuffle.partitions` and needs nothing —
    * and probing its `df.rdd` here would eagerly run every upstream
    * shuffle stage as a job at plan-BUILD time under AQE. For narrow
    * plans `rdd.getNumPartitions` is a metadata computation (file splits),
    * not a job.
    */
  def ensureParallelism(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val wide = df.queryExecution.analyzed.exists {
      case _: Aggregate | _: Join | _: Sort | _: Window | _: Distinct => true
      // Dataset.distinct()/dropDuplicates produce Deduplicate (Distinct is
      // only the SQL DISTINCT form), and Intersect/Except (SetOperation)
      // rewrite to shuffling joins — all must gate, or the df.rdd probe
      // below eagerly runs their shuffle as a job at plan-BUILD time
      case _: Deduplicate | _: SetOperation => true
      case r: Repartition => r.shuffle // coalesce narrows, it must not gate
      case _: RepartitionByExpression => true
      case _ => false
    }
    if (wide) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** S3: resolve the lexicographically-latest child directory (the reference
    * picks `max(os.listdir(input_dir))` over `YYYY-MM-DD` partition dirs,
    * /root/reference/anonymize_datasets.py:154). Driver-side FS listing — a
    * metadata operation, not a data scan; at scale this is the same partition
    * pruning a `dt=` partitioned table gets from `filter($"dt" === maxDt)`.
    */
  def latestPartition(spark: SparkSession, inputDir: String): Option[String] = {
    val p = new Path(inputDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val dirs = fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      if (dirs.isEmpty) None else Some(dirs.max)
    }
  }

  /** Files within a resolved partition dir, split by extension the way the
    * reference's per-file loop does (anonymize_datasets.py:160,187).
    */
  def partitionFiles(spark: SparkSession, dir: String): Seq[(String, String)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isFile).map(_.getPath).collect {
      case f if f.getName.endsWith(".csv") => ("csv", f.toString)
      case f if f.getName.endsWith(".parquet") => ("parquet", f.toString)
    }.toSeq.sortBy(_._2)
  }
}
