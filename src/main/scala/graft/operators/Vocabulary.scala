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
}
