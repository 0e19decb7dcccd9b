package graft

import graft.operators.Chunking

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("tokenChunks: sliding windows cover every token, tail may be short") {
    // 7 tokens, size 3, stride 2 → starts 0,2,4,6
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6")).toDF("doc_id", "text")
    val r = Chunking.tokenChunks(docs, chunkSize = 3, stride = 2).collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getString(3))).sortBy(_._1)
    assert(r === Array(
      (0L, 3L, "t0 t1 t2"),
      (1L, 3L, "t2 t3 t4"),
      (2L, 3L, "t4 t5 t6"),
      (3L, 1L, "t6")))
    intercept[IllegalArgumentException](Chunking.tokenChunks(docs, 0, 1))
    intercept[IllegalArgumentException](Chunking.tokenChunks(docs, 1, 0))
  }

  test("tokenChunks: non-overlapping windows partition the token stream") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val r = Chunking.tokenChunks(docs, chunkSize = 2, stride = 2).collect()
      .map(x => x.getString(3)).sorted
    assert(r === Array("a b", "c d", "e"))
  }

  test("cdcChunks: chunks reassemble to the document; boundaries anchor to content") {
    val tokens = (0 until 60).map(i => s"t$i")
    val text = tokens.mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = Chunking.cdcChunks(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3))).sortBy(_._1)
    // invariants: in-order reassembly is lossless, token counts add up,
    // chunk ids are dense from 0
    assert(chunks.map(_._3).mkString(" ") === text)
    assert(chunks.map(_._2).sum === 60L)
    assert(chunks.map(_._1).toSeq === chunks.indices.map(_.toLong))

    // content anchoring: a head insertion disturbs only the head chunk(s) —
    // every boundary after the first shared window realigns exactly
    val shifted = Seq((2L, "inserted " + text)).toDF("doc_id", "text")
    val sChunks = Chunking.cdcChunks(shifted).collect().map(_.getString(3)).toSet
    val oChunks = chunks.map(_._3).toSet
    assert((oChunks -- sChunks).size <= 2,
      s"fixed-offset drift: original-only chunks ${oChunks -- sChunks}")
    assert((sChunks -- oChunks).size <= 2,
      s"fixed-offset drift: shifted-only chunks ${sChunks -- oChunks}")
    assert((oChunks & sChunks).nonEmpty)

    // md5 (oracle) and xxhash64 (scale) paths share every structural
    // invariant; boundary SETS differ by hash design
    val md5Chunks = Chunking.cdcChunks(docs,
        boundaryHash = graft.operators.Dedup.Md5TokenHash)
      .collect().map(r => (r.getLong(1), r.getString(3))).sortBy(_._1)
    assert(md5Chunks.map(_._2).mkString(" ") === text)
  }

  test("dedupChunks: later copies of a passage drop, text reassembles in order") {
    // passage "x y" first appears in doc 1 chunk 0; doc 2 repeats it twice
    val docs = Seq(
      (1L, "x y a b"),
      (2L, "x y x y"),
      (3L, "c d")).toDF("doc_id", "text")
    val r = Chunking.dedupChunks(docs, chunkSize = 2).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3))))
      .toMap
    assert(r(1L) === ((2L, 2L, "x y a b")), "first occurrences all survive")
    assert(r(2L) === ((2L, 0L, "")), "fully-duplicated doc reassembles empty")
    assert(r(3L) === ((1L, 1L, "c d")))
  }

  test("packOffsets: per-group prefix sums place docs in capacity-sized bins") {
    val docs = Seq(
      (1L, "a b c", "s0"),     // start 0, bin 0, off 0
      (2L, "d e", "s0"),       // start 3, bin 0, off 3
      (3L, "f g h i", "s0"),   // start 5, bin 1, off 1
      (10L, "x y", "s1"))      // independent group: start 0
      .toDF("doc_id", "text", "source")
    val r = Chunking.packOffsets(docs, capacity = 4).collect()
      .map(x => x.getLong(1) -> ((x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5))))
      .toMap
    assert(r(1L) === ((3L, 0L, 0L, 0L)))
    assert(r(2L) === ((2L, 3L, 0L, 3L)))
    assert(r(3L) === ((4L, 5L, 1L, 1L)))
    assert(r(10L) === ((2L, 0L, 0L, 0L)), "groups pack independently")
    intercept[IllegalArgumentException](Chunking.packOffsets(docs, 0))
  }

  test("dedupChunks: hashed production path agrees with the string-keyed path") {
    val docs = graft.sources.Tables.table(spark, sf0001, "documents")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
      .toSet
    assert(key(Chunking.dedupChunks(docs, 32)) ===
      key(Chunking.dedupChunks(docs, 32, hashKey = true)))
  }

  test("paddingAudit: exact bucket ledger on a crafted corpus") {
    // widths 4: docs with 3,4 tokens -> bucket 0 (cap 4); 5 tokens ->
    // bucket 1 (cap 8); 12 tokens -> bucket 2 (cap 12)
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c d"), (3L, "a b c d e"),
      (4L, "a b c d e f g h i j k l"))
      .toDF("doc_id", "text")
    val got = Chunking.paddingAudit(docs, width = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    assert(got(0L) === ((2L, 7L, 4L, 8L, math.round((8.0 - 7.0) / 8.0 * 1e6) / 1e6)))
    assert(got(1L) === ((1L, 5L, 8L, 8L, math.round(3.0 / 8.0 * 1e6) / 1e6)))
    assert(got(2L) === ((1L, 12L, 12L, 12L, 0.0)))
    intercept[IllegalArgumentException](Chunking.paddingAudit(docs, 0))
  }
}
