package graft

import scala.sys.process._

/** Oracle-typing lint (tools/oracle_lint.py): every shipped DuckDB oracle
  * must DESCRIBE to a Spark-emittable output schema.
  *
  * The driver's correctness gate hashes TYPED values, and DuckDB widens
  * integer aggregates -- window `SUM(BIGINT)` most of all -- to HUGEINT,
  * a type Spark parquet output can never carry. Such an oracle is
  * value-identical to the Spark result yet hash-fails the bitwise gate;
  * that bug class shipped three times (q47 round 5, q58/q71 round 6).
  * This spec binds every oracle's schema in DuckDB (DESCRIBE, no
  * execution) and fails on any forbidden type, plus proves the lint
  * actually catches a deliberately uncast SUM.
  *
  * Skipped (not failed) when python3+duckdb are absent: DuckDB is the
  * driver-side oracle engine, not a library dependency; the lint is a
  * dev/CI gate over oracle TEXT, not runtime behavior.
  */
class OracleLintSpec extends SparkSpec {

  private val lintScript = new java.io.File("tools/oracle_lint.py")

  private lazy val duckdbAvailable: Boolean =
    scala.util.Try(
      Process(Seq("python3", "-c", "import duckdb")).! == 0
    ).getOrElse(false)

  // Same escape set as Verify's dump: the lint must read exactly the kind
  // of JSON the driver reads.
  private def jq(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def runLint(oracles: Map[String, String],
                      verifyDir: Option[String] = None): (Int, String) = {
    val f = java.nio.file.Files.createTempFile("oracle-lint", ".json")
    val json =
      oracles.map { case (k, v) => s"${jq(k)}: ${jq(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(f, json)
    val out = new StringBuilder
    val logger = ProcessLogger(l => out.append(l).append('\n'),
                               l => out.append(l).append('\n'))
    val code = Process(
      Seq("python3", lintScript.getPath, sf0001, f.toString) ++ verifyDir
    ).!(logger)
    java.nio.file.Files.deleteIfExists(f)
    (code, out.toString)
  }

  test("every shipped oracle binds to a Spark-emittable schema") {
    assume(duckdbAvailable, "python3+duckdb not on this box")
    assume(lintScript.exists, s"lint script not at ${lintScript.getAbsolutePath}")
    // Include the data-dependent oracles (q38 trains centroid literals)
    // so the lint sees the exact set Verify dumps for the driver.
    val all = SparkEntry.oracleSql ++ SparkEntry.dynamicOracleSql(spark, sf0001)
    val (code, out) = runLint(all)
    assert(code == 0, s"oracle-typing violations:\n$out")
  }

  test("the lint catches a deliberately uncast SUM (HUGEINT)") {
    assume(duckdbAvailable, "python3+duckdb not on this box")
    assume(lintScript.exists, s"lint script not at ${lintScript.getAbsolutePath}")
    val (code, out) = runLint(Map(
      "fixture_uncast" -> "SELECT SUM(o_orderkey) AS s FROM orders",
      "fixture_cast"   -> "SELECT CAST(SUM(o_orderkey) AS BIGINT) AS s FROM orders"))
    assert(code == 1, s"lint should exit 1 on the uncast fixture:\n$out")
    assert(out.contains("fixture_uncast.s: HUGEINT"), out)
    assert(!out.contains("fixture_cast.s"), s"false positive on cast fixture:\n$out")
  }

  // The q96 class (round 7): a nested output column is unhashable in the
  // driver's pandas canonicalizer even when both sides are value-identical.
  // The net has two entrances -- the oracle can emit a list, or the Spark
  // result can -- so both are fixtures here.
  test("the lint catches a list-typed oracle column (the q96 class)") {
    assume(duckdbAvailable, "python3+duckdb not on this box")
    assume(lintScript.exists, s"lint script not at ${lintScript.getAbsolutePath}")
    val (code, out) = runLint(Map(
      "fixture_list" ->
        "SELECT o_orderkey, string_split(o_orderpriority, ' ') AS toks FROM orders",
      "fixture_struct" ->
        "SELECT {'a': o_orderkey} AS st FROM orders",
      "fixture_joined" ->
        "SELECT array_to_string(string_split(o_orderpriority, ' '), ' ') AS toks FROM orders"))
    assert(code == 1, s"lint should exit 1 on nested fixtures:\n$out")
    assert(out.contains("fixture_list.toks"), out)
    assert(out.contains("fixture_struct.st"), out)
    assert(!out.contains("fixture_joined.toks"),
      s"false positive on serialized list:\n$out")
  }

  test("the lint catches an array-typed SPARK result schema") {
    assume(duckdbAvailable, "python3+duckdb not on this box")
    assume(lintScript.exists, s"lint script not at ${lintScript.getAbsolutePath}")
    import org.apache.spark.sql.functions._
    val dir = tmpDir("lint-verify-out")
    spark.range(3)
      .select(col("id"), array(col("id"), col("id") + 1).as("ids"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/fixture_array_result")
    spark.range(3)
      .select(col("id"), concat_ws(" ", array(col("id"))).as("ids_str"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/fixture_flat_result")
    val (code, out) = runLint(
      Map("fixture_cast" -> "SELECT CAST(SUM(o_orderkey) AS BIGINT) AS s FROM orders"),
      verifyDir = Some(dir))
    assert(code == 1, s"lint should exit 1 on the array result schema:\n$out")
    assert(out.contains("result:fixture_array_result.ids"), out)
    assert(!out.contains("fixture_flat_result"),
      s"false positive on flat result:\n$out")
  }

  test("every shipped result schema Verify dumps is harness-hashable") {
    assume(duckdbAvailable, "python3+duckdb not on this box")
    assume(lintScript.exists, s"lint script not at ${lintScript.getAbsolutePath}")
    // Dump the real result schemas (limit 0 rows would change aggregates;
    // instead just run each query at sf0.001 and write 1-row samples --
    // the SCHEMA is what the lint reads, so a limit(1) is sound and fast).
    val dir = tmpDir("lint-real-results")
    SparkEntry.queries.foreach { case (name, q) =>
      scala.util.Try(
        q(spark, sf0001).limit(1).coalesce(1)
          .write.mode("overwrite").parquet(s"$dir/$name"))
    }
    val (code, out) = runLint(Map.empty, verifyDir = Some(dir))
    assert(code == 0, s"nested types in shipped result schemas:\n$out")
  }
}
