package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vocabulary encoding — the tokenize-to-ids step between curation and
  * training: map each document's tokens onto integer ids from a fixed
  * dictionary (the tokenizer's vocab), out-of-vocabulary tokens to
  * `oovId`, preserving order. The output id arrays are what sequence
  * packing (Chunking.packOffsets) and token-window chunking consume.
  *
  * Two shapes, by dictionary size:
  *
  *  - [[encode]] — broadcast dictionary join: explode to (doc, pos,
  *    token), left-join the broadcast vocab, reassemble in order. The
  *    join is broadcast (a tokenizer vocab — even 100k+ entries of short
  *    strings — is a few MB), the explode is narrow, and the only
  *    shuffle is the doc-keyed reassembly. This is the 100 TB shape.
  *  - [[encodeExpr]] — a literal-map Column for SMALL vocabularies
  *    (≤ a few thousand entries): zero joins, zero shuffles, pure
  *    scan-side expression — but Spark's literal-map lookup is a linear
  *    probe, so cost grows with vocab size; past a few thousand entries
  *    the broadcast join wins.
  *
  * [[decodeExpr]] inverts an id array through the same vocab (OOV ids
  * render as `oovToken`) — the round-trip debugging/inspection path.
  */
object Vocabulary {

  /** (idCol, ids array<int>, n_oov) per document; vocab ids are 1-based
    * in list order, OOV → `oovId`.
    */
  def encode(docs: DataFrame, vocab: Seq[String], oovId: Int = 0,
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(vocab.nonEmpty, "encode needs a non-empty vocabulary")
    require(vocab.distinct.size == vocab.size, "vocabulary has duplicate tokens")
    val spark = docs.sparkSession
    import spark.implicits._
    val dict = vocab.zipWithIndex.map { case (t, i) => (t, i + 1) }
      .toDF("__tok", "__tid")
    docs.select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("__pos", "__tok")))
      .join(broadcast(dict), Seq("__tok"), "left")
      .withColumn("__tid", coalesce(col("__tid"), lit(oovId)))
      .groupBy(col(idCol))
      .agg(
        transform(array_sort(collect_list(struct(col("__pos"), col("__tid")))),
          _.getField("__tid")).as("ids"),
        count(when(col("__tid") === oovId, 1)).as("n_oov"))
  }

  /** Build the top-`size` vocabulary from the corpus itself — the
    * trainer for [[encode]]'s dictionary: token counts in one map-side-
    * combined aggregation, a deterministic (count desc, token asc) total
    * order, ids 1..size in that order, and each token's corpus coverage
    * (count / total tokens, 1e-6-quantized). The window that numbers the
    * ids runs AFTER the top-`size` cut, so it orders a vocabulary-sized
    * frame, never the corpus.
    *
    * Output: (id, token, n, coverage) — feed `.orderBy(id)`'s token
    * column straight into [[encode]] / [[encodeExpr]].
    */
  def buildVocab(docs: DataFrame, size: Int,
                 textCol: String = "text"): DataFrame = {
    require(size >= 1, s"vocabulary size must be >= 1, got $size")
    val counts = docs
      .select(explode(split(col(textCol), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("tot"))
    val top = counts.orderBy(col("n").desc, col("token").asc).limit(size)
    top.crossJoin(broadcast(total))
      .withColumn("id", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("token").asc)))
      .select(col("id"), col("token"), col("n"),
        (round(col("n").cast("double") / col("tot") * 1e6) / 1e6)
          .as("coverage"))
  }

  /** [[buildVocab]]'s DuckDB replay over `table`.`textCol`. */
  def buildVocabOracleSql(size: Int, table: String = "documents",
                          textCol: String = "text"): String =
    s"""WITH toks AS (
       |  SELECT unnest(string_split($textCol, ' ')) AS token FROM $table
       |), c AS (
       |  SELECT token, COUNT(*) AS n FROM toks GROUP BY 1
       |), tot AS (
       |  SELECT CAST(SUM(n) AS BIGINT) AS tot FROM c
       |), top AS (
       |  SELECT token, n FROM c ORDER BY n DESC, token ASC LIMIT $size
       |)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS INT)
       |         AS id,
       |       token, n,
       |       round(CAST(n AS DOUBLE) / tot * 1e6) / 1e6 AS coverage
       |FROM top, tot""".stripMargin

  /** Scan-side encoding expression for small vocabularies: literal map
    * lookup per token, no join. `tokens` must already be an array column.
    */
  def encodeExpr(tokens: Column, vocab: Seq[String], oovId: Int = 0): Column = {
    val m = map(vocab.zipWithIndex.flatMap { case (t, i) =>
      Seq(lit(t), lit(i + 1)) }: _*)
    transform(tokens, t => coalesce(element_at(m, t), lit(oovId)))
  }

  /** Id array back to tokens; ids outside [1, vocab.size] render as
    * `oovToken`. */
  def decodeExpr(ids: Column, vocab: Seq[String],
                 oovToken: String = "<unk>"): Column = {
    val arr = array(vocab.map(lit): _*)
    transform(ids, i =>
      when(i >= 1 && i <= vocab.size, element_at(arr, i.cast("int")))
        .otherwise(lit(oovToken)))
  }

  /** Separator scheme for [[learnBpeMerges]]'s token stream: every token
    * boundary is TWO U+0001 chars, so a merge's replace pattern
    * (`U+0001 L U+0001 U+0001 R U+0001`) consumes one separator char from
    * each side and leaves one for the neighboring boundary — adjacent
    * merge sites never fight over a shared delimiter, and left-to-right
    * non-overlapping `replace` semantics (identical in Spark and DuckDB)
    * implement exactly BPE's greedy left-to-right pair merge. Merged
    * tokens join with U+0002.
    */
  private[operators] val BpeSep = "\u0001"
  private[operators] val BpeJoin = "\u0002"

  /** Learn `rounds` BPE merges over whitespace-pre-tokenized text — the
    * tokenizer-training step between corpus curation and model training
    * (Sennrich et al. 2016), as corpus-scale dataflow: each round is ONE
    * bigram-count aggregation (explode adjacent pairs → map-side-combined
    * count → argmax by (n desc, lhs, rhs) — a total order, so ties can't
    * diverge) and the merge applies as a pure scan-side `replace` on the
    * encoded stream (see [[BpeSep]]). Driver state is one (pair, count)
    * row per round — never corpus data.
    *
    * Returns (round, lhs, rhs, n): the merge table in learned order,
    * merged tokens joined by U+0002 in later rounds' operands.
    */
  def learnBpeMerges(docs: DataFrame, text: String = "text",
                     rounds: Int = 4): DataFrame = {
    require(rounds >= 1 && rounds <= 64,
      s"rounds must be in [1, 64], got $rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    // spread the scan FIRST ([[graft.sources.Tables.ensureParallelism]]):
    // every round's split + pair explode + partial count runs INSIDE the
    // scan stage's partitioning — one task per round at bench scale while
    // the other cores idle; a no-op at scale (thousands of splits)
    val src = graft.sources.Tables.ensureParallelism(docs)
    val dsep = BpeSep + BpeSep
    var stream: Column = concat(lit(dsep),
      replace(col(text), lit(" "), lit(dsep)), lit(dsep))
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val toks = filter(split(stream, java.util.regex.Pattern.quote(dsep)),
        x => length(x) > 0)
      val top = src.select(toks.as("t"))
        .select(explode(transform(sequence(lit(1), size(col("t")) - 1),
          i => struct(element_at(col("t"), i).as("lhs"),
            element_at(col("t"), i + 1).as("rhs")))).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("lhs"), col("rhs"))
        .limit(1).head()
      val (l, rr, n) = (top.getString(0), top.getString(1), top.getLong(2))
      merges += ((r, l, rr, n))
      stream = replace(stream,
        lit(BpeSep + l + dsep + rr + BpeSep),
        lit(BpeSep + l + BpeJoin + rr + BpeSep))
    }
    merges.result().toDF("round", "lhs", "rhs", "n")
  }

  /** Apply a learned merge table ([[learnBpeMerges]]'s (lhs, rhs) pairs in
    * round order) to text — the transform half of the trainer: the same
    * double-separator encoding, one scan-side `replace` per merge, then
    * split back to the BPE token array. Zero joins, zero shuffles — the
    * tokenizer runs inside the scan at any corpus scale.
    */
  def applyBpeMerges(text: Column, merges: Seq[(String, String)]): Column = {
    val dsep = BpeSep + BpeSep
    val stream0: Column = concat(lit(dsep),
      replace(text, lit(" "), lit(dsep)), lit(dsep))
    val merged = merges.foldLeft(stream0) { case (s, (l, r)) =>
      replace(s, lit(BpeSep + l + dsep + r + BpeSep),
        lit(BpeSep + l + BpeJoin + r + BpeSep))
    }
    filter(split(merged, java.util.regex.Pattern.quote(dsep)),
      x => length(x) > 0)
  }

  /** Zipf-law audit — the corpus-health screen on top of [[buildVocab]]:
    * natural language puts token frequency ≈ C·rank^(−s) with s near 1,
    * so the OLS fit of ln(count) on ln(rank) over the top-V vocabulary
    * should show slope ≈ −1 with high r². Template-heavy, deduplicated-
    * to-death, or synthetic corpora bend the curve (|slope| drifts, r²
    * drops) — a one-row early-warning audit before training.
    *
    * Shape: the only fact-scale work is [[buildVocab]]'s single token
    * aggregation; the fit runs on V rows through
    * [[ColumnStats.groupRegression]]'s exact quantized-moment discipline
    * (ln terms 1e-6-quantized — the q48/q94/q98 replay contract).
    * Output: (v, slope, intercept, r2); intercept is ln C.
    */
  def zipfAudit(docs: DataFrame, topV: Int,
                textCol: String = "text"): DataFrame =
    ColumnStats.groupRegression(
      buildVocab(docs, topV, textCol)
        .select(lit(1).as("g"),
          log(col("id").cast("double")).as("lnr"),
          log(col("n").cast("double")).as("lnc")),
      Seq("g"), "lnr", "lnc", xScale = 1e6, yScale = 1e6)
      .select(col("n").as("v"), col("slope"), col("intercept"), col("r2"))

  /** [[zipfAudit]]'s DuckDB replay: the same top-V cut and rank order,
    * the same 1e-6 ln quantization, and [[ColumnStats.groupRegression]]'s
    * identically-parenthesized fit formula (slopeQ textually repeated —
    * SQL has no lets — but identical expressions over identical doubles
    * evaluate identically).
    */
  def zipfOracleSql(topV: Int, table: String = "documents",
                    textCol: String = "text"): String = {
    val n = "CAST(n AS DOUBLE)"
    val sx = "CAST(sx AS DOUBLE)"
    val sy = "CAST(sy AS DOUBLE)"
    val sxx = "CAST(sxx AS DOUBLE)"
    val syy = "CAST(syy AS DOUBLE)"
    val sxy = "CAST(sxy AS DOUBLE)"
    val varx = s"$n * $sxx - $sx * $sx"
    val vary = s"$n * $syy - $sy * $sy"
    val cov = s"$n * $sxy - $sx * $sy"
    val slopeQ = s"($cov) / ($varx)"
    s"""WITH toks AS (
       |  SELECT unnest(string_split($textCol, ' ')) AS token FROM $table
       |), c AS (
       |  SELECT token, COUNT(*) AS n FROM toks GROUP BY 1
       |), top AS (
       |  SELECT token, n FROM c ORDER BY n DESC, token ASC LIMIT $topV
       |), pts AS (
       |  SELECT CAST(round(ln(CAST(ROW_NUMBER() OVER (
       |           ORDER BY n DESC, token ASC) AS DOUBLE)) * 1e6)
       |           AS BIGINT) AS x,
       |         CAST(round(ln(CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS y
       |  FROM top
       |), m AS (
       |  SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
       |         CAST(SUM(y) AS BIGINT) AS sy,
       |         CAST(SUM(x * x) AS BIGINT) AS sxx,
       |         CAST(SUM(y * y) AS BIGINT) AS syy,
       |         CAST(SUM(x * y) AS BIGINT) AS sxy
       |  FROM pts
       |)
       |SELECT n AS v,
       |       CASE WHEN ($varx) > 0
       |            THEN ($slopeQ) * (1000000.0 / 1000000.0) END AS slope,
       |       CASE WHEN ($varx) > 0
       |            THEN (($sy - ($slopeQ) * $sx) / $n) / 1000000.0
       |            END AS intercept,
       |       CASE WHEN ($varx) > 0 AND ($vary) > 0
       |            THEN (($cov) * ($cov)) / (($varx) * ($vary)) END AS r2
       |FROM m""".stripMargin
  }
}
