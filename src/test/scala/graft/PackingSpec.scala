package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

/** Concat-and-chunk sequence packing: driver-side replay equality,
  * partitioning invariance, the zero-waste accounting identity, and the
  * straddle contract.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 97L)
    .map(id => (id, ((id * 31) % 40 + 1).toInt))
    .map { case (id, n) => (id, Seq.fill(n)("tok").mkString(" ")) }

  private def run(parts: Int) =
    Packing.concatChunk(
        docs.toDF("doc_id", "text").repartition(parts),
        capacity = 64,
        nTokens = size(split(col("text"), " ")).cast("long"),
        key = col("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1)

  test("matches a driver-side scan and is partitioning-invariant") {
    var cum = 0L
    val want = docs.map { case (id, text) =>
      val n = text.split(" ").length.toLong
      val row = (id, n, cum / 64, (cum + n - 1) / 64, cum % 64)
      cum += n
      row
    }
    assert(run(1).toSeq === want)
    assert(run(7).toSeq === want)
  }

  test("zero-waste identity: every chunk before the last holds exactly " +
       "capacity tokens; straddle iff offset + n_tokens > capacity") {
    val rows = run(3)
    val total = rows.map(_._2).sum
    val lastChunk = rows.map(_._4).max
    assert(lastChunk === (total - 1) / 64,
      "chunk count must be ceil(total/capacity) — nothing padded")
    rows.foreach { case (id, n, cf, cl, off) =>
      assert((cl > cf) === (off + n > 64), s"straddle contract at doc $id")
      assert(cl - cf === (off + n - 1) / 64,
        s"doc $id must span exactly the chunks its token run covers")
    }
  }

  test("capacity must be a positive power of two") {
    intercept[IllegalArgumentException] {
      Packing.concatChunk(docs.take(3).toDF("doc_id", "text"), 100,
        size(split(col("text"), " ")).cast("long"), col("doc_id"))
    }
  }

  test("zero-token docs fail loudly instead of emitting chunk_last < " +
       "chunk_first") {
    val ex = intercept[Exception] {
      Packing.concatChunk(docs.take(3).toDF("doc_id", "text"), 64,
        lit(0L), col("doc_id")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("n_tokens < 1")))
  }
}
