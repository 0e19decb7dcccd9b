package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ANALYZE-equivalent stats collection wired into the SESSION CATALOG —
  * the feedback loop from [[ColumnStats]]'s measurements to the
  * planner's decisions. Collecting stats that nothing reads is a report;
  * writing them where `JoinSelection` and the CBO look is an optimizer
  * input: a catalog parquet table WITHOUT stats planbuilds at
  * `spark.sql.defaultSizeInBytes` (Long.MaxValue — never broadcast,
  * every join a shuffle), while the same table WITH a recorded row count
  * and size joins by broadcast whenever it fits the threshold — no hints.
  *
  * The write path is the same one Spark's own `ANALYZE TABLE` uses
  * (`SessionCatalog.alterTableStats` with `CatalogStatistics`), so
  * everything downstream — `DetermineTableStats`, size-in-bytes
  * propagation, CBO join reordering under `spark.sql.cbo.enabled` —
  * consumes these numbers exactly as if the built-in command had run;
  * the difference is WHERE the numbers come from: [[ColumnStats.collect]]
  * (exact, one dedup-first aggregation per column) or, at 100 TB, the
  * mergeable HLL sketches ([[ColumnStats.ndvSketches]] /
  * [[ColumnStats.mergeNdvEstimates]]) maintained per ingest batch —
  * ANALYZE without ever re-scanning history, which a 100 TB table cannot
  * afford.
  */
object Analyze {

  /** Register `path` (a parquet file/dir) as an external catalog table so
    * it HAS a catalog entry to hang stats on. Idempotent; never moves or
    * copies data.
    */
  def registerParquetTable(spark: SparkSession, table: String,
                           path: String): Unit =
    spark.sql(s"CREATE TABLE IF NOT EXISTS $table USING parquet " +
      s"LOCATION '$path'")

  /** Total on-disk bytes under the table's location — `ANALYZE`'s
    * `totalSize`, the number the broadcast threshold compares against.
    */
  def tableSizeInBytes(spark: SparkSession, table: String): Long = {
    val meta = spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(table))
    val loc = new org.apache.hadoop.fs.Path(meta.location)
    loc.getFileSystem(spark.sessionState.newHadoopConf())
      .getContentSummary(loc).getLength
  }

  /** Collect row count + per-column stats with [[ColumnStats.collect]]
    * and write them into the session catalog. Returns what was written.
    *
    * Column stats carried: NDV, null count, min/max (numeric, date,
    * timestamp, boolean — the types whose external string form is
    * engine-stable), and avg/max byte length for strings/binary (what
    * the CBO sizes rows with). `exact = false` switches the collection
    * to the one-pass approximate shape for wide tables.
    */
  def analyze(spark: SparkSession, table: String, cols: Seq[String],
              exact: Boolean = true): CatalogStatistics = {
    val df = spark.table(table)
    val schema = df.schema
    cols.foreach(c => require(schema.fieldNames.contains(c),
      s"analyze: column '$c' not in $table (${schema.fieldNames.mkString(", ")})"))
    val rows = ColumnStats.collect(df, cols, exact).collect()
    val rowCount = rows.head.getLong(1)
    // avg/max length for the var-length types, one aggregation for all
    val varCols = cols.filter(c => schema(c).dataType match {
      case StringType | BinaryType => true
      case _ => false
    })
    val lens: Map[String, (Long, Long)] = if (varCols.isEmpty) Map.empty
    else {
      val aggs = varCols.flatMap(c => Seq(
        ceil(avg(length(col(c)))).cast("long").as(s"${c}__avg"),
        max(length(col(c))).cast("long").as(s"${c}__max")))
      val r = df.agg(aggs.head, aggs.tail: _*).head()
      varCols.zipWithIndex.map { case (c, i) =>
        c -> (Option(r.get(2 * i)).fold(0L)(_ => r.getLong(2 * i)),
          Option(r.get(2 * i + 1)).fold(0L)(_ => r.getLong(2 * i + 1)))
      }.toMap
    }
    val colStats = rows.map { r =>
      val name = r.getString(0)
      val dt = schema(name).dataType
      val minMaxSafe = dt match {
        case _: NumericType | DateType | TimestampType | BooleanType => true
        case _ => false
      }
      val (avgLen, maxLen) = lens.getOrElse(name,
        (dt.defaultSize.toLong, dt.defaultSize.toLong))
      name -> CatalogColumnStat(
        distinctCount = Some(BigInt(r.getLong(3))),
        min = if (minMaxSafe) Option(r.getString(4)) else None,
        max = if (minMaxSafe) Option(r.getString(5)) else None,
        nullCount = Some(BigInt(r.getLong(2))),
        avgLen = Some(avgLen),
        maxLen = Some(maxLen),
        // version 1: min/max in java.sql literal form — exactly what
        // ColumnStats.collect's cast-to-string emits for these types
        version = 1)
    }.toMap
    val stats = CatalogStatistics(
      sizeInBytes = BigInt(tableSizeInBytes(spark, table)),
      rowCount = Some(BigInt(rowCount)),
      colStats = colStats)
    spark.sessionState.catalog.alterTableStats(
      TableIdentifier(table), Some(stats))
    stats
  }

  /** The 100 TB maintenance path: merge persisted per-batch NDV sketches
    * ([[ColumnStats.ndvSketches]] frames) into whole-table estimates and
    * write THOSE into the catalog with a caller-supplied row count and
    * size (both tracked incrementally at ingest — nothing here scans the
    * table). Columns absent from the sketches keep no per-column entry.
    */
  def analyzeFromSketches(spark: SparkSession, table: String,
                          sketches: Seq[DataFrame], rowCount: Long,
                          sizeInBytes: Long): CatalogStatistics = {
    val ndv = ColumnStats.mergeNdvEstimates(sketches).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val colStats = ndv.map { case (c, d) =>
      c -> CatalogColumnStat(distinctCount = Some(BigInt(d)), version = 1)
    }
    val stats = CatalogStatistics(BigInt(sizeInBytes),
      Some(BigInt(rowCount)), colStats)
    spark.sessionState.catalog.alterTableStats(
      TableIdentifier(table), Some(stats))
    stats
  }
}
