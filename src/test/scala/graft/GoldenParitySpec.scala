package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parity against the reference's COMMITTED output artifacts (read-only
  * under /root/reference/output/) — the one check no synthetic oracle can
  * substitute for: our anonymizer must emit the same shape a downstream
  * consumer of the reference already parses.
  *
  * The reference's input CSVs are absent from its repo (large-blob
  * stripped), so full value replay is impossible; what IS checkable — and
  * pinned here — is schema (names, types, order), the `ANON_CLIENT n`
  * token grammar, the audit-column formats, and the xlsx sheet-name set
  * (reference golden: output/2024-06-30/client_demo-*.snappy.parquet,
  * 78,658 rows; output/client-IMPLY_JP_OPS_COMPARISON.xlsx).
  */
class GoldenParitySpec extends SparkSpec {
  import spark.implicits._

  private val goldenParquet =
    "/root/reference/output/2024-06-30/" +
      "client_demo-pjm_wholesale_settlement_20240501.snappy.parquet"
  private val goldenXlsx =
    "/root/reference/output/client-IMPLY_JP_OPS_COMPARISON.xlsx"

  test("anonymizer output schema matches the committed reference golden " +
    "column-for-column (names, types, order)") {
    val golden = spark.read.parquet(goldenParquet)
    // reconstruct the golden's INPUT shape: the reference read the raw
    // client CSV (mixed-case headers, no audit columns) and the golden is
    // what its anonymizer emitted for it
    val input = Seq(
      ("PJM_CLIENT_A", 1100L, "Energy", "Wholesale Energy",
        "2024-05-01", 1234.56, "N", "1", "2024-05", "2024-06-30"),
      ("PJM_CLIENT_A", 1205L, "Capacity", "RPM Auction",
        "2024-05-02", 98.76, "Y", "1", "2024-05", "2024-06-30"))
      .toDF("CustomerCode", "ChargeID", "ChargeGroup", "ChargeName",
        "OperatingDate", "Amount", "Adj", "Version", "OperatingMonth",
        "ProcessDate")
    val keyDir = java.nio.file.Files
      .createTempDirectory("golden-parity-keys").toString
    val out = graft.operators.Anonymize.stampAudit(
      graft.operators.Anonymize.cdmAnonymization(spark, input, keyDir),
      timezone = "America/New_York", clock = Some("2024-06-30T14:40:40"))
    graft.CacheRegistry.releaseAll()
    assert(out.columns.toSeq === golden.columns.toSeq,
      "column names AND order must match the golden")
    val goldenTypes = golden.schema.fields.map(f => f.name -> f.dataType).toMap
    out.schema.fields.foreach { f =>
      assert(f.dataType === goldenTypes(f.name),
        s"column ${f.name}: ${f.dataType} vs golden ${goldenTypes(f.name)}")
    }
  }

  test("golden label/audit value grammar: ANON_CLIENT tokens, " +
    "process_time format, timezone literal — and ours matches it") {
    val golden = spark.read.parquet(goldenParquet)
    val tokenRe = "^ANON_CLIENT \\d+$"
    val timeRe = "^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}$"
    val bad = golden.filter(
      !col("customercode").rlike(tokenRe) ||
        !col("process_time").rlike(timeRe) ||
        col("timezone") =!= "America/New_York").count()
    assert(bad === 0L, "golden rows must all follow the documented grammar")
    // our anonymizer emits the same grammar for a fresh multi-client input
    val input = Seq(("zeta corp", 1.0), ("acme", 2.0), ("acme", 3.0))
      .toDF("CustomerCode", "Amount")
    val keyDir = java.nio.file.Files
      .createTempDirectory("golden-parity-keys2").toString
    val ours = graft.operators.Anonymize.stampAudit(
      graft.operators.Anonymize.cdmAnonymization(spark, input, keyDir),
      timezone = "America/New_York", clock = Some("2024-06-30T14:40:40"))
    graft.CacheRegistry.releaseAll()
    val rows = ours.select("customercode", "process_time", "timezone")
      .collect()
    assert(rows.forall(_.getString(0).matches(tokenRe)))
    assert(rows.forall(_.getString(1).matches(timeRe)))
    assert(rows.forall(_.getString(2) == "America/New_York"))
    // dense labels from 1 in sorted-label order: acme -> 1, zeta corp -> 2
    val labels = ours.select("customercode").as[String].collect().sorted
    assert(labels.toSeq === Seq("ANON_CLIENT 1", "ANON_CLIENT 1",
      "ANON_CLIENT 2"))
  }

  test("xlsx sheet-name parity: the golden workbook's sheets round-trip " +
    "through our ExcelSink byte-grammar") {
    // golden sheet names, read straight from the OOXML workbook part
    def sheetNames(path: String): Seq[String] = {
      val zf = new java.util.zip.ZipFile(path)
      try {
        val entry = zf.getEntry("xl/workbook.xml")
        val xml = new String(zf.getInputStream(entry).readAllBytes,
          java.nio.charset.StandardCharsets.UTF_8)
        "name=\"([^\"]+)\"".r.findAllMatchIn(xml).map(_.group(1)).toSeq
      } finally zf.close()
    }
    val golden = sheetNames(goldenXlsx)
    assert(golden === Seq("comparison", "174Global-MAPE_imply",
      "daily_portfolio_mape_jp", "daily_portfolio_mape_ops"),
      "the committed reference workbook must carry exactly these sheets")
    // our writer must reproduce the same sheet-name set for the same
    // 4-frame write (E2's xlsx contract)
    val out = java.nio.file.Files
      .createTempDirectory("golden-parity-xlsx").toString + "/parity.xlsx"
    val df = Seq((1, "x")).toDF("a", "b")
    graft.sinks.ExcelSink.write(out, golden.map(n => n -> df))
    assert(sheetNames(out) === golden)
  }

  test("client CSV presentation layer reproduces the golden deliverable's " +
    "header and number grammar") {
    val goldenCsv = "/root/reference/output/client-MAPE With Weather_imply.csv"
    val goldenLines = java.nio.file.Files.readAllLines(
      java.nio.file.Path.of(goldenCsv)).toArray(Array.empty[String])
    assert(goldenLines.head ===
      graft.sinks.ClientCsv.DisplayColumns.mkString(","),
      "header must match the golden byte-for-byte")
    // golden body grammar: quoted iff the rendered number carries a comma
    val cell = "(\"[-0-9,.]+ ?%?\"|[^,\"]+)"
    val rowRe = s"^$cell(,$cell)*$$".r
    goldenLines.tail.foreach(l =>
      assert(rowRe.findFirstIn(l).isDefined, s"golden row grammar: $l"))
    // render a daily frame with values crossing the 1,000 grouping
    // boundary and a negative signed error, write, and compare grammar
    val daily = Seq(
      ("2024-05-29", 0.1983, 0.0787, 998.33, 961.19, 1009.29, 154.09),
      ("2024-05-30", 0.1375, 0.1159, 1042.36, 1065.54, 1214.77, 179.81))
      .toDF("proxy_date", "forecast_mape", "backcast_mape",
        "forecast", "backcast", "settlement", "backcast_abs_error")
    val out = java.nio.file.Files
      .createTempDirectory("client-csv").toString + "/client.csv"
    graft.sinks.ClientCsv.writeSingleCsv(spark,
      graft.sinks.ClientCsv.mapeDisplayFrame(daily)
        .orderBy(col("Start Time")), out)
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Path.of(out)).toArray(Array.empty[String])
    assert(lines.head === goldenLines.head)
    assert(lines(1) === "2024-05-29 00:00:00,19.83 %,7.87 %,998.33," +
      "961.19,\"1,009.29\",-10.96,154.09",
      s"row grammar mismatch: ${lines(1)}")
    assert(lines(2).startsWith("2024-05-30 00:00:00,13.75 %,11.59 %," +
      "\"1,042.36\",\"1,065.54\",\"1,214.77\","))
    lines.tail.foreach(l =>
      assert(rowRe.findFirstIn(l).isDefined, s"our row grammar: $l"))
  }
}
