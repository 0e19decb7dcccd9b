package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-window chunking and passage-level dedup — the step that turns
  * curated documents into training examples (fixed-size windows a
  * tokenizer/packer consumes) and scrubs the boilerplate passages exact
  * document-dedup can't see (the same footer pasted into thousands of
  * otherwise-distinct pages — the RefinedWeb/CCNet line-dedup problem, at
  * token-window granularity since this corpus is single-line).
  *
  * Both operators are pure narrow maps until their one necessary shuffle:
  *
  *  - [[tokenChunks]] — zero shuffles: `split` → `sequence` of window
  *    starts → `transform`+`slice` → `posexplode`, all inside one
  *    whole-stage-codegen span. At 100 TB this is scan-bound, exactly as
  *    it should be; output partitioning inherits the scan's.
  *  - [[dedupChunks]] — two shuffles, both keyed to do real work: one
  *    window over `chunk_text` to pick each passage's global first
  *    occurrence (hash-partitioned by passage — the only key that can
  *    decide "first"), then one `groupBy(doc_id)` to reassemble surviving
  *    text in chunk order. The reassembly carries (doc, chunk) rows, never
  *    all-pairs; a duplicated-passage skew key (an ultra-common footer)
  *    lands on one task only for a row_number over small rows — and the
  *    production variant keys that window by `xxhash64(chunk_text)` so the
  *    shuffle moves 8-byte keys, not passage strings.
  */
object Chunking {

  /** Sliding token windows: chunk `i` covers tokens
    * `[i*stride, i*stride + chunkSize)`, for every start strictly inside
    * the document (`start < n_tokens`) — the final window may be short,
    * matching the usual packer contract (no token dropped, no padding
    * synthesized). Output: (doc_id, chunk_idx, n_tokens, chunk_text).
    */
  def tokenChunks(docs: DataFrame, chunkSize: Int, stride: Int,
                  text: String = "text"): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val toks = split(col(text), " ")
    docs
      .select(col("doc_id"), toks.as("t"))
      // one start per window: 0, stride, 2·stride … < n (sequence's upper
      // bound is inclusive, hence n-1)
      .select(col("doc_id"), col("t"),
        posexplode(sequence(lit(0), size(col("t")) - 1, lit(stride))))
      .select(col("doc_id"),
        col("pos").cast("long").as("chunk_idx"),
        least(lit(chunkSize), size(col("t")) - col("col")).cast("long")
          .as("n_tokens"),
        // slice is 1-based; a short tail slice just stops at the end
        concat_ws(" ", slice(col("t"), col("col") + 1, lit(chunkSize)))
          .as("chunk_text"))
  }

  /** Content-defined chunking: chunk boundaries fall where a rolling hash
    * of the last `window` tokens hits ≡ 0 (mod `divisor`) — so boundaries
    * are anchored to CONTENT, not offsets, and an insertion near a
    * document's head shifts only the chunk it lands in (fixed windows like
    * [[tokenChunks]] shift every downstream chunk, defeating chunk-level
    * dedup between document revisions; this is rsync/LBFS-style CDC at
    * token granularity). Mean chunk length ≈ `divisor` tokens.
    *
    * Shape: boundary flags are pure expressions on the shingle array (one
    * zipped posexplode — no self-join to align tokens with their window
    * hash), then the running boundary count (= chunk id) is one keyed
    * window over (doc_id, pos), then one groupBy reassembles chunks. Two
    * shuffles of token-grain rows, both linear; parallelism follows
    * documents.
    *
    * `boundaryHash` defaults to seeded xxhash64 (scale path); pass
    * [[Dedup.Md5TokenHash]] for the engine-portable form the q71 oracle
    * replays. Output: (doc_id, chunk_idx, n_tokens, chunk_text).
    */
  def cdcChunks(docs: DataFrame, window: Int = 4, divisor: Int = 8,
                text: String = "text",
                boundaryHash: Column => Column = Dedup.XxTokenHash): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(divisor >= 1, s"divisor must be >= 1, got $divisor")
    val toks = graft.functions.TextFunctions.tokens(col(text))
    val sh = graft.functions.TextFunctions.shingles(col(text), window)
    // flag(i) = 1 when the window ENDING at token i (0-based) hashes to a
    // boundary; tokens before the first full window can't be boundaries
    val flags = transform(sequence(lit(0), size(col("t")) - 1), i =>
      when(i >= window - 1 &&
        pmod(boundaryHash(element_at(col("sh"), i - (window - 2))),
          lit(divisor.toLong)) === 0, 1).otherwise(0))
    val flagged = graft.sources.Tables.ensureParallelism(docs)
      .select(col("doc_id"), toks.as("t"), sh.as("sh"))
      .select(col("doc_id"),
        posexplode(arrays_zip(col("t"), flags.as("b"))).as(Seq("pos", "z")))
      .select(col("doc_id"), col("pos"),
        col("z").getField("t").as("tok"), col("z").getField("b").as("b"))
    // chunk id of a token = boundaries strictly BEFORE it (a boundary
    // token is the last of its chunk); running count via a keyed window
    val wsum = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    flagged
      .withColumn("chunk_idx", coalesce(sum(col("b")).over(wsum), lit(0L)))
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(count(lit(1)).as("n_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("chunk_text"))
  }

  /** Corpus-wide passage dedup over NON-overlapping windows: each distinct
    * `chunk_text` survives only at its globally first occurrence (ordered
    * by doc_id, then chunk_idx); every later copy is dropped and each
    * document is reassembled from its surviving chunks in order.
    * Output: (doc_id, n_chunks, kept_chunks, text_dedup) — `text_dedup`
    * is `''` for a document made entirely of already-seen passages (the
    * caller filters empties, keeping the drop observable).
    *
    * `hashKey=true` is the production path: the first-occurrence window
    * partitions by `xxhash64(chunk_text)` instead of the passage string
    * (8-byte shuffle keys; a 64-bit collision wrongly drops one passage —
    * acceptable for boilerplate scrubbing, not oracle-portable).
    */
  def dedupChunks(docs: DataFrame, chunkSize: Int,
                  hashKey: Boolean = false, text: String = "text"): DataFrame = {
    val ch = tokenChunks(docs, chunkSize, chunkSize, text)
    val key: Column = if (hashKey) xxhash64(col("chunk_text")) else col("chunk_text")
    val firstSeen = Window.partitionBy(key).orderBy(col("doc_id"), col("chunk_idx"))
    ch.withColumn("rn", row_number().over(firstSeen))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("kept_chunks"),
        // survivors reassembled in chunk order: collect_list drops the
        // nulled duplicates, array_sort orders by the struct's leading
        // chunk_idx field — deterministic regardless of arrival order
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("rn") === 1,
            struct(col("chunk_idx"), col("chunk_text"))))),
          s => s.getField("chunk_text"))).as("text_dedup"))
  }

  /** Concatenate-and-chunk packing index — where each document lands when
    * the corpus is packed into fixed-`capacity` training sequences: docs
    * concatenate in (group, doc_id) order, the token stream splits every
    * `capacity` tokens, and each doc reports its start offset in the
    * group's stream, the sequence (bin) its first token falls in, and the
    * offset inside that sequence. The exclusive prefix sum IS the packing
    * — no sequential packer loop, so the op is one keyed window.
    *
    * Packing is per-`groupCol` (source, shard …), which is also the scale
    * contract: the window partitions by group, so no global single-
    * partition sort exists anywhere — 100 TB packs as wide as its groups.
    * Output: (group, doc_id, n_tokens, start_offset, bin, bin_offset).
    */
  def packOffsets(docs: DataFrame, capacity: Int, groupCol: String = "source",
                  text: String = "text"): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val n = size(split(col(text), " ")).cast("long")
    val w = Window.partitionBy(col(groupCol)).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(groupCol), col("doc_id"), n.as("n_tokens"))
      .withColumn("start_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("bin", floor(col("start_offset") / capacity).cast("long"))
      .withColumn("bin_offset", col("start_offset") % capacity)
  }

  /** DuckDB replay of [[packOffsets]] over table `documents`. */
  def packOffsetsOracleSql(capacity: Int, groupCol: String = "source"): String =
    s"""WITH n AS (
       |  SELECT $groupCol, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT)
       |           AS n_tokens
       |  FROM documents
       |), o AS (
       |  SELECT $groupCol, doc_id, n_tokens,
       |         -- window SUM(BIGINT) widens to HUGEINT in DuckDB; cast back
       |         -- so the driver's typed hash matches Spark's BIGINT
       |         CAST(SUM(n_tokens) OVER (PARTITION BY $groupCol ORDER BY doc_id
       |                                  ROWS UNBOUNDED PRECEDING) - n_tokens
       |              AS BIGINT) AS start_offset
       |  FROM n
       |)
       |SELECT $groupCol, doc_id, n_tokens, start_offset,
       |       CAST(floor(start_offset / $capacity) AS BIGINT) AS bin,
       |       CAST(start_offset % $capacity AS BIGINT) AS bin_offset
       |FROM o""".stripMargin

  /** DuckDB replay of [[tokenChunks]] over table `documents`. */
  def tokenChunksOracleSql(chunkSize: Int, stride: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |)
       |SELECT doc_id,
       |       CAST(st / $stride AS BIGINT) AS chunk_idx,
       |       CAST(LEAST($chunkSize, len(t) - st) AS BIGINT) AS n_tokens,
       |       array_to_string(t[st + 1 : st + $chunkSize], ' ') AS chunk_text
       |FROM toks, UNNEST(range(0, len(t), $stride)) AS r(st)""".stripMargin

  /** DuckDB replay of [[dedupChunks]] (`hashKey=false`). */
  def dedupChunksOracleSql(chunkSize: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |), ch AS (
       |  SELECT doc_id,
       |         CAST(st / $chunkSize AS BIGINT) AS chunk_idx,
       |         array_to_string(t[st + 1 : st + $chunkSize], ' ') AS chunk_text
       |  FROM toks, UNNEST(range(0, len(t), $chunkSize)) AS r(st)
       |), ranked AS (
       |  SELECT doc_id, chunk_idx, chunk_text,
       |         row_number() OVER (PARTITION BY chunk_text
       |                            ORDER BY doc_id, chunk_idx) AS rn
       |  FROM ch
       |)
       |SELECT doc_id,
       |       COUNT(*) AS n_chunks,
       |       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS kept_chunks,
       |       COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk_text END, ' '
       |                           ORDER BY chunk_idx), '') AS text_dedup
       |FROM ranked
       |GROUP BY doc_id""".stripMargin

  /** Length-bucketed batching audit — the padding-waste ledger a training
    * pipeline reads before choosing its batching strategy. Documents are
    * bucketed by token count into `width`-token bands; if each batch draws
    * from ONE bucket (dynamic/length batching), every sequence pads to the
    * bucket ceiling instead of the corpus max, and this audit quantifies
    * the win: per bucket, document count, real tokens, padded tokens at
    * the bucket ceiling, and the waste fraction. (Σ padded across buckets
    * vs `n_docs·global_max` is the naive-batching comparison — derivable
    * from this output, so it is not duplicated into it.)
    *
    * Scale shape: one narrow projection (token count from the scan) into
    * one map-side-combined hash aggregation on ≤ `max_len/width` keys; the
    * per-bucket arithmetic runs on the aggregated frame. No window, no
    * join, no sort — the audit costs one pass regardless of corpus size.
    *
    * Output: (bucket, n_docs, tokens, capacity, padded, waste_pct) with
    * waste_pct quantized to 6 decimals via the engine-portable
    * `round(x·10⁶)/10⁶` contract.
    */
  def paddingAudit(docs: DataFrame, width: Int,
                   text: String = "text"): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    val n = size(split(col(text), " ")).cast("long")
    docs.select(n.as("n_tokens"))
      .withColumn("bucket", floor((col("n_tokens") - 1) / width).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
      .withColumn("capacity", (col("bucket") + 1) * width)
      .withColumn("padded", col("n_docs") * col("capacity"))
      .withColumn("waste_pct",
        round((col("padded") - col("tokens")) / col("padded") * lit(1e6)) / 1e6)
      .select(col("bucket"), col("n_docs"), col("tokens"), col("capacity"),
        col("padded"), col("waste_pct"))
  }

  /** DuckDB replay of [[paddingAudit]] over table `documents`. */
  def paddingAuditOracleSql(width: Int): String =
    s"""WITH tk AS (
       |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), b AS (
       |  SELECT CAST(floor((n_tokens - 1) / $width) AS BIGINT) AS bucket,
       |         COUNT(*) AS n_docs,
       |         CAST(SUM(n_tokens) AS BIGINT) AS tokens
       |  FROM tk GROUP BY 1
       |)
       |SELECT bucket, n_docs, tokens,
       |       (bucket + 1) * $width AS capacity,
       |       n_docs * ((bucket + 1) * $width) AS padded,
       |       round((n_docs * ((bucket + 1) * $width) - tokens)
       |             / (n_docs * ((bucket + 1) * $width)) * 1e6) / 1e6
       |         AS waste_pct
       |FROM b""".stripMargin
}
