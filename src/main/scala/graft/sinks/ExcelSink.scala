package graft.sinks

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Row

/** S5: multi-sheet Excel (.xlsx) sink (reference
  * /root/reference/main.py:147-153 — one sheet per named DataFrame).
  *
  * xlsx is a zip of OOXML parts; under the zero-egress constraint (no POI
  * on the classpath) this writes the minimal conformant package directly:
  * content types, package/workbook relationships, one worksheet part per
  * sheet, all cells typed (numbers as native values, everything else as
  * XML-escaped inline strings).
  *
  * This is a DRIVER-SIDE sink by design: Excel is the reference's
  * small-result deliverable (daily-grain MAPE frames — tens of rows).
  * Every sheet is collected, guarded by `maxRows`; fact-scale data belongs
  * in the parquet sinks, never here (SURVEY.md §2.1 S5).
  */
object ExcelSink {

  /** Hard cap on collected rows per sheet — the driver-memory guard. */
  val DefaultMaxRows: Int = 100000

  /** Write `sheets` (name → DataFrame, in order) as one xlsx workbook. */
  def write(path: String, sheets: Seq[(String, DataFrame)],
            maxRows: Int = DefaultMaxRows): Unit = {
    require(sheets.nonEmpty, "xlsx workbook needs at least one sheet")
    // dedupe cleaned names: sanitation/truncation can collide two distinct
    // inputs, and duplicate sheet names make the workbook invalid OOXML.
    // Excel compares sheet names case-insensitively, so the seen-set does
    // too; the suffix retries until genuinely unused (a single suffix can
    // itself collide with an earlier literal name).
    val seen = scala.collection.mutable.Set[String]()
    val collected = sheets.zipWithIndex.map { case ((rawName, df), i) =>
      val rows = df.limit(maxRows + 1).collect()
      if (rows.length > maxRows)
        throw new IllegalArgumentException(
          s"sheet '$rawName' exceeds maxRows=$maxRows; Excel is a small-result " +
            "driver-side sink — write fact-scale data to parquet instead")
      // Locale.ROOT: default-locale lowercasing (tr-TR dotless-ı) would
      // miss collisions Excel itself detects
      def key(n: String) = n.toLowerCase(java.util.Locale.ROOT)
      var name = sheetName(rawName, i)
      var attempt = i + 1
      while (seen.contains(key(name))) {
        val suffix = s"_$attempt"
        name = sheetName(rawName, i).take(31 - suffix.length) + suffix
        attempt += 1
      }
      seen += key(name)
      (name, df.columns.toSeq, rows.toSeq)
    }
    val out = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      def part(name: String, content: String): Unit = {
        out.putNextEntry(new ZipEntry(name))
        out.write(content.getBytes(StandardCharsets.UTF_8))
        out.closeEntry()
      }
      part("[Content_Types].xml", contentTypes(collected.size))
      part("_rels/.rels", packageRels)
      part("xl/workbook.xml", workbook(collected.map(_._1)))
      part("xl/_rels/workbook.xml.rels", workbookRels(collected.size))
      collected.zipWithIndex.foreach { case ((_, cols, rows), i) =>
        part(s"xl/worksheets/sheet${i + 1}.xml", worksheet(cols, rows))
      }
    } finally out.close()
  }

  /** Excel sheet-name rules: ≤31 chars, no []:*?/\ , non-empty. */
  private def sheetName(raw: String, idx: Int): String = {
    val cleaned = raw.replaceAll("[\\[\\]:*?/\\\\]", "_").take(31)
    if (cleaned.isEmpty) s"Sheet${idx + 1}" else cleaned
  }

  private def xml(s: String): String =
    s.flatMap {
      case '&' => "&amp;"; case '<' => "&lt;"; case '>' => "&gt;"
      case '"' => "&quot;"; case '\'' => "&apos;"
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => ""
      case c => c.toString
    }

  /** 0-based column index → A1-style column letters. */
  private[graft] def colRef(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def cell(ref: String, v: Any): String = v match {
    case null => ""
    case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
    case n @ (_: Byte | _: Short | _: Int | _: Long) => s"""<c r="$ref"><v>$n</v></c>"""
    case d: Double if !d.isNaN && !d.isInfinite => s"""<c r="$ref"><v>$d</v></c>"""
    case f: Float if !f.isNaN && !f.isInfinite => s"""<c r="$ref"><v>$f</v></c>"""
    case d: java.math.BigDecimal => s"""<c r="$ref"><v>${d.toPlainString}</v></c>"""
    case other => s"""<c r="$ref" t="inlineStr"><is><t>${xml(other.toString)}</t></is></c>"""
  }

  private def worksheet(cols: Seq[String], rows: Seq[Row]): String = {
    val sb = new StringBuilder
    sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    sb ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>"""
    sb ++= cols.zipWithIndex.map { case (c, i) =>
      s"""<c r="${colRef(i)}1" t="inlineStr"><is><t>${xml(c)}</t></is></c>"""
    }.mkString("""<row r="1">""", "", "</row>")
    rows.zipWithIndex.foreach { case (row, r) =>
      sb ++= s"""<row r="${r + 2}">"""
      (0 until row.length).foreach { c =>
        sb ++= cell(s"${colRef(c)}${r + 2}", if (row.isNullAt(c)) null else row.get(c))
      }
      sb ++= "</row>"
    }
    sb ++= "</sheetData></worksheet>"
    sb.toString
  }

  private def contentTypes(nSheets: Int): String = {
    val overrides = (1 to nSheets).map(i =>
      s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
      .mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
      overrides + "</Types>"
  }

  private val packageRels: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
      "</Relationships>"

  private def workbook(names: Seq[String]): String = {
    val sheets = names.zipWithIndex.map { case (n, i) =>
      s"""<sheet name="${xml(n)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" """ +
      """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
      s"<sheets>$sheets</sheets></workbook>"
  }

  private def workbookRels(nSheets: Int): String = {
    val rels = (1 to nSheets).map(i =>
      s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""")
      .mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      rels + "</Relationships>"
  }
}
