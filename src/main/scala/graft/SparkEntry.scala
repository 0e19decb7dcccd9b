package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.Queries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real inventory lives in [[graft.queries.Queries]]; this object is
  * the thin, stable surface the driver harness calls.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q03: the WAPE pipeline routed through the Mape operators.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.byName("q03_wape")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.byName

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops DuckDB cannot express
    * (seeded-hash LSH, blake2b) → driver records a rows-only check;
    * those are pinned by ScalaTest instead.
    */
  def oracleSql: Map[String, String] = Queries.oracles

  /** Oracles whose SQL literals depend on the data (q38 embeds centroids
    * trained on the target embeddings table), built per (session, sfDir).
    * Verify merges these into its oracle_sql.json dump.
    */
  def dynamicOracleSql(spark: SparkSession, sfDir: String): Map[String, String] =
    Queries.dynamicOracles.map { case (k, f) => k -> f(spark, sfDir) }
}
