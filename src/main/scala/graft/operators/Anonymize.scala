package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.hadoop.fs.Path
import graft.functions.GraftFunctions.blake2b_hex

/** Anonymization operators (reference E2/E3,
  * /root/reference/anonymize_datasets.py:27-135) as distributed, lazy
  * DataFrame transforms:
  *
  *  - value scaling and audit stamps are codegen'd projections (P8/P11);
  *  - label anonymization (U2/O2) builds the label→token map from the tiny
  *    distinct label set (collected once, becomes a broadcast-able CASE
  *    expression — never a row-wise closure over the fact table);
  *  - uid pseudonymization (U1/J1/J2/S6) is a broadcast left join against the
  *    persistent key table plus an anti-join for new uids hashed with the
  *    native BLAKE2b expression; the key table is upserted with
  *    write-temp-then-atomic-rename since Spark cannot overwrite a path it is
  *    reading.
  *
  * 100 TB posture: the fact side is never collected; only the distinct label
  * set (bounded, dimension-like) ever reaches the driver. If the key table
  * outgrows the broadcast threshold Catalyst falls back to sort-merge join on
  * its own — the plan shape stays valid.
  */
object Anonymize {

  /** P11: multiply every present value column by a constant
    * (anonymize_datasets.py:120-124; case-insensitive presence check).
    */
  def scaleValues(df: DataFrame, valueCols: Seq[String], factor: Double): DataFrame = {
    val byLower = df.columns.map(c => c.toLowerCase -> c).toMap
    valueCols.flatMap(c => byLower.get(c.toLowerCase)).foldLeft(df) { (d, c) =>
      d.withColumn(c, col(c) * lit(factor))
    }
  }

  /** O2: sorted distinct labels → 1-based enumeration
    * (anonymize_datasets.py:97,104-106). The distinct set is dimension-sized;
    * collect is bounded and the result is embedded as a literal CASE chain.
    */
  def labelIndex(labels: Seq[String], name: String = "ANON_CLIENT"): Map[String, String] = {
    val sorted = labels.filter(_ != null).distinct.sorted
    if (sorted.size == 1) Map(sorted.head -> name)
    else sorted.zipWithIndex.map { case (l, i) => l -> s"$name ${i + 1}" }.toMap
  }

  /** U2: anonymize one label column. Exact matches map to their enumerated
    * token; otherwise a case-insensitive word-boundary regex replaces
    * embedded occurrences (anonymize_datasets.py:100-108 — implementing the
    * evident intent: each label's own pattern is tested/replaced; the
    * reference's `list_items[0]`-only quirk at :107-108 is documented
    * divergence, SURVEY.md §7.4). Nulls pass through. Pure Column expression
    * chain — stays in whole-stage codegen.
    */
  def anonymizeLabels(df: DataFrame, column: String, labels: Seq[String],
                      name: String = "ANON_CLIENT"): DataFrame = {
    val index = labelIndex(labels, name)
    if (index.isEmpty) return df
    val sorted = index.keys.toSeq.sorted
    val c = col(column)
    // exact-match CASE first (the common path), then word-boundary replace
    val exact = sorted.foldLeft(when(c.isNull, lit(null.asInstanceOf[String]))) {
      (acc, l) => acc.when(c === lit(l), lit(index(l)))
    }
    val replaced = sorted.foldLeft(c) { (acc, l) =>
      regexp_replace(acc, s"(?i)\\b${java.util.regex.Pattern.quote(l)}\\b", index(l))
    }
    df.withColumn(column, exact.otherwise(replaced))
  }

  /** Label anonymization where the label universe is the column's own
    * distinct values (anonymize_datasets.py:127-128). The distinct pull is
    * one shuffle over a dimension-cardinality set.
    */
  def anonymizeColumnLabels(df: DataFrame, column: String,
                            name: String = "ANON_CLIENT"): DataFrame = {
    val labels = df.select(col(column)).distinct().collect()
      .map(r => r.get(0)).filter(_ != null).map(_.toString).toSeq
    anonymizeLabels(df, column, labels, name)
  }

  private def keySchema(column: String): StructType =
    StructType(Seq(StructField(column, StringType), StructField(s"${column}_", StringType)))

  /** Read the persistent key table for `column`, or an empty frame on first
    * run (anonymize_datasets.py:37-44).
    */
  def readKeyTable(spark: SparkSession, keyDir: String, column: String): DataFrame = {
    val path = new Path(s"$keyDir/key_$column.snappy.parquet")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) spark.read.parquet(path.toString)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      keySchema(column))
  }

  /** S6: atomically replace the key table. Spark cannot overwrite a path that
    * feeds the same plan, so stage to `.tmp-` then rename (SURVEY.md §7.4).
    */
  def overwriteKeyTable(spark: SparkSession, keyDir: String, column: String,
                        keyDf: DataFrame): Unit = {
    val dir = new Path(keyDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    val tmp = new Path(s"$keyDir/.tmp-key_$column")
    val dst = new Path(s"$keyDir/key_$column.snappy.parquet")
    keyDf.write.mode("overwrite").option("compression", "snappy").parquet(tmp.toString)
    if (fs.exists(dst)) fs.delete(dst, true)
    fs.rename(tmp, dst)
  }

  /** E3/J1/J2/U1: pseudonymize `column` with the persistent keyed mapping.
    *
    * Contract (anonymize_datasets.py:27-84): uid cast to string; existing
    * uids keep their pseudonym from the key table; new uids get
    * `blake2b(uid, digest_size=5).hexdigest()`; the key table is upserted and
    * stays duplicate-free; in the output the raw column is replaced by the
    * pseudonym under the original name, appended at the end of the schema
    * (pandas merge appends the joined column).
    *
    * Plan shape: broadcast left join (key table is dimension-sized) + one
    * distinct over the anti-joined new uids. The new-uid hash runs as the
    * native codegen'd BLAKE2b expression, once per DISTINCT new uid, not per
    * fact row.
    */
  def uidAnonymization(spark: SparkSession, df: DataFrame, column: String,
                       keyDir: String): DataFrame = {
    val pseud = s"${column}_"
    val asStr = df.withColumn(column, col(column).cast(StringType))
    val keyDf = readKeyTable(spark, keyDir, column)

    val newUids = asStr.select(col(column)).distinct()
      .join(keyDf.select(col(column)), Seq(column), "left_anti")
      .withColumn(pseud, blake2b_hex(col(column)))
    val updatedKey = keyDf.unionByName(newUids)
      .dropDuplicates(Seq(column, pseud))
    // The upsert plan READS the old key path and WRITES the tmp path, so the
    // staged write is safe; the atomic rename then swaps it in. No driver
    // materialization — the key table never has to fit on the driver.
    overwriteKeyTable(spark, keyDir, column, updatedKey)

    val freshKey = spark.read.parquet(s"$keyDir/key_$column.snappy.parquet")
    asStr.join(broadcast(freshKey), Seq(column), "left")
      .drop(column)
      .withColumnRenamed(pseud, column)
  }

  /** P8: stamp audit columns if absent (anonymize_datasets.py:168-173).
    * `clock` injectable for deterministic tests (SURVEY.md §7.4).
    */
  def stampAudit(df: DataFrame, timezone: String = "America/Chicago",
                 clock: Option[String] = None): DataFrame = {
    val withTime =
      if (df.columns.contains("process_time")) df
      else df.withColumn("process_time",
        clock.map(lit).getOrElse(
          date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss")))
    if (withTime.columns.contains("timezone")) withTime
    else withTime.withColumn("timezone", lit(timezone))
  }

  /** E2 core: the reference's `cdm_anonymization` (anonymize_datasets.py:112-135)
    * — scale value columns, anonymize label columns against their own
    * distinct sets, pseudonymize uid columns, lowercase all names.
    */
  def cdmAnonymization(spark: SparkSession, df: DataFrame, keyDir: String,
      anonCols: Seq[String] = Seq("CustomerCode", "brand", "customer"),
      uidCols: Seq[String] = Seq("uid", "meter", "meters"),
      valueCols: Seq[String] = Seq("Amount", "forecast_gross", "backcast_net",
        "backcast_gross", "usage_initial_net", "usage_initial_gross",
        "usage_final_net", "usage_final_gross", "usage", "value",
        "ams_actual_consumption", "ams_actual_net",
        "ams_actual_consumption_abs", "forecast_abs_errors",
        "backcast_abs_errors"),
      scaleFactor: Double = 1.0125): DataFrame = {
    val byLower = df.columns.map(c => c.toLowerCase -> c).toMap
    val scaled = scaleValues(df, valueCols, scaleFactor)
    val labeled = anonCols.flatMap(c => byLower.get(c.toLowerCase))
      .foldLeft(scaled)((d, c) => anonymizeColumnLabels(d, c))
    val pseudonymized = uidCols.flatMap(c => byLower.get(c.toLowerCase))
      .foldLeft(labeled)((d, c) => uidAnonymization(spark, d, c, keyDir))
    pseudonymized.toDF(pseudonymized.columns.map(_.toLowerCase): _*)
  }
}
