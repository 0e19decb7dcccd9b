package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal — the CCNet/RefinedWeb curation step the
  * reference's corpus tooling would need at LLM scale: lines that repeat
  * across many documents (headers, footers, nav chrome, cookie banners)
  * carry no training signal and skew n-gram statistics, so they are
  * detected by corpus-wide document frequency and stripped from every doc
  * while preserving the order of what remains.
  *
  * Shape at 100 TB: one narrow explode (no shuffle), one line-keyed
  * aggregation for the df pass (map-side partial counts collapse duplicate
  * lines per partition before the shuffle — boilerplate is by definition
  * highly repetitive, so the combiner does most of the work), one join of
  * the lines against the detected set (bounded above by
  * total_lines / minDocs rows, a contraction of the corpus that AQE
  * broadcasts in practice), and one doc-keyed aggregation to reassemble.
  * Nothing ever collects to the driver.
  *
  * `hashLines = true` is the scale path: the df pass and the strip join key
  * on `xxhash64(line)` instead of the line text, cutting the shuffled key
  * width from full line strings to 8 bytes. A 64-bit collision could strip
  * a rare line that merely hashes like a frequent one — vanishingly
  * unlikely and harmless for curation, but not bit-replayable, so the
  * oracle-checked default keeps the exact string keys.
  */
object Boilerplate {

  /** Documents with high-df lines stripped.
    *
    * @param docs    (idCol, textCol) frame; `textCol` is newline-joined
    * @param minDocs a line is boilerplate when it appears in at least this
    *                many distinct documents (blank lines are never
    *                boilerplate — stripping them would silently reflow
    *                paragraph structure)
    * @return one row per input doc: (idCol, n_lines, n_removed, clean_text)
    *         with `clean_text` the surviving lines re-joined in original
    *         order ("" when every line was boilerplate)
    */
  def stripCommonLines(docs: DataFrame, minDocs: Long,
                       idCol: String = "doc_id", textCol: String = "text",
                       hashLines: Boolean = false): DataFrame = {
    require(minDocs >= 2, s"minDocs=$minDocs: a line cannot be boilerplate at df<2")
    // spread the scan FIRST ([[graft.sources.Tables.ensureParallelism]]):
    // the line explode (and any caller-side text reshaping fused into the
    // same stage) otherwise runs inside the scan's partitioning — one
    // task at bench scale; a no-op at scale
    val lines = graft.sources.Tables.ensureParallelism(docs)
      .select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val key = if (hashLines) xxhash64(col("line")) else col("line")
    val keyed = lines.withColumn("lk", key)
    // df = distinct docs per line; the inner distinct collapses a doc's
    // repeated copies of its own boilerplate before the counting shuffle
    val boiler = keyed.filter(trim(col("line")) =!= "")
      .select(col("lk"), col(idCol)).distinct()
      .groupBy(col("lk")).count()
      .filter(col("count") >= minDocs)
      .select(col("lk"), lit(1L).as("bl"))
    keyed.join(boiler, Seq("lk"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("bl").isNotNull, 1L).otherwise(0L)).as("n_removed"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("bl").isNull, struct(col("pos"), col("line"))))),
            _.getField("line")),
          "\n").as("clean_text"))
  }
}
