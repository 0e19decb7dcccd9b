package graft

import org.apache.spark.sql.functions._
import graft.operators.TableDigest

/** [[graft.operators.TableDigest]]: digests must be a pure function of the
  * row MULTISET (order/partitioning-free), any single-row mutation must
  * flip them, and the two checksums must cover each other's blind spots.
  */
class TableDigestSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "alpha", 10L), (2L, "beta", 20L), (3L, "gamma", 30L),
    (4L, "delta", 40L), (5L, null.asInstanceOf[String], 50L))
    .toDF("id", "name", "v")

  private def cols = Seq(col("id"), col("name"), col("v"))

  private def dig(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
    val r = TableDigest.digest(df, cols).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("digest is order- and partitioning-invariant") {
    val a = dig(base)
    assert(a == dig(base.repartition(7)))
    assert(a == dig(base.orderBy(col("v").desc)))
    assert(a._1 == 5L)
  }

  test("any single-row mutation flips both checksums") {
    val a = dig(base)
    val mutated = base.withColumn("v",
      when(col("id") === 3L, 31L).otherwise(col("v")))
    val b = dig(mutated)
    assert(a._1 == b._1 && a._2 != b._2 && a._3 != b._3)
  }

  test("pair duplication: xor is blind, count and sum catch it") {
    val dup = base.unionAll(base.filter(col("id") === 2L))
      .unionAll(base.filter(col("id") === 2L))
    val a = dig(base)
    val b = dig(dup)
    assert(b._2 == a._2, "xor of a row added twice cancels — the blind spot")
    assert(b._1 == a._1 + 2 && b._3 != a._3, "count and modular sum catch it")
  }

  test("null and empty string digest differently") {
    val withEmpty = base.withColumn("name",
      when(col("id") === 5L, lit("")).otherwise(col("name")))
    assert(dig(base) != dig(withEmpty))
  }

  test("digestByGroup localizes a mutation to its group") {
    val df = base.withColumn("g", when(col("id") <= 2L, "p1").otherwise("p2"))
    val mutated = df.withColumn("v",
      when(col("id") === 1L, 11L).otherwise(col("v")))
    def byG(d: org.apache.spark.sql.DataFrame) =
      TableDigest.digestByGroup(d, Seq("g"), cols).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
    val (a, b) = (byG(df), byG(mutated))
    assert(a("p2") == b("p2"), "untouched group digest unchanged")
    assert(a("p1") != b("p1"), "mutated group digest flips")
  }

  test("mergeDigests: per-batch digests roll up to the whole-table digest " +
    "bit-for-bit (incremental maintenance algebra)") {
    val df = graft.sources.Tables.table(spark, sf0001, "lineitem")
      .limit(2000)
    val c = Seq(col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast("long"))
    val keys = Seq("l_returnflag")
    val whole = TableDigest.digestByGroup(df, keys, c).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val parts = (0 until 3).map(b => TableDigest.digestByGroup(
      df.filter(pmod(col("l_orderkey"), lit(3)) === b), keys, c))
    val merged = TableDigest.mergeDigests(parts, keys).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(merged == whole)
    intercept[IllegalArgumentException](
      TableDigest.mergeDigests(Seq.empty, keys))
  }

  test("generational digest store: batches fold to the union's digest; " +
    "same-id replay is a no-op; crash-safe commit order") {
    val dir = tmpDir("graft-digest-store")
    val keys = Seq("g")
    val c = Seq(col("id"), col("name"), col("v"))
    val tagged = base.withColumn("g",
      when(col("id") <= 2L, "p1").otherwise("p2"))
    val batches = Seq(
      tagged.filter(col("id") <= 2L),
      tagged.filter(col("id") === 3L),
      tagged.filter(col("id") >= 4L))
    batches.zipWithIndex.foreach { case (b, i) =>
      TableDigest.mergeBatchIntoStore(dir, keys, i.toLong,
        TableDigest.digestByGroup(b, keys, c))
    }
    def store = TableDigest.readStore(spark, dir).get
    val (gen, df) = store
    assert(gen == 2L)
    val whole = TableDigest.digestByGroup(tagged, keys, c).collect()
      .map(_.toSeq).toSet
    assert(df.collect().map(_.toSeq).toSet == whole,
      "store digest must equal the one-shot digest of the union")
    // replaying the last batch under the same id must not double-fold
    TableDigest.mergeBatchIntoStore(dir, keys, 2L,
      TableDigest.digestByGroup(batches(2), keys, c))
    assert(store._2.collect().map(_.toSeq).toSet == whole,
      "same-id replay must leave the store unchanged")
  }

  test("digestSink: streamed micro-batches maintain the union digest") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val dir = tmpDir("graft-digest-sink")
    val ckpt = tmpDir("graft-digest-ckpt")
    val stream = MemoryStream[(Long, String, Long)]
    val q = graft.streaming.StreamingEvents.digestSink(
      stream.toDF().toDF("id", "name", "v"), Seq("name"),
      Seq(col("id"), col("v")), dir, ckpt)
    val rows = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L),
      (4L, "b", 40L), (5L, "a", 50L))
    try {
      stream.addData(rows.take(2))
      q.processAllAvailable()
      stream.addData(rows.drop(2))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = TableDigest.readStore(spark, dir).get._2
      .collect().map(_.toSeq).toSet
    val whole = TableDigest.digestByGroup(
        rows.toDF("id", "name", "v"), Seq("name"),
        Seq(col("id"), col("v")))
      .collect().map(_.toSeq).toSet
    assert(streamed == whole)
  }

  test("canonicalization is injection-proof: values that imitate field " +
    "boundaries or the null marker digest differently") {
    // under a naive delimiter-join scheme each pair below collides; the
    // escape-then-delimit encoding (U+0002-escaping the delimiter and the
    // null marker before joining) must tell them apart
    val twoCols = Seq(("a", "b")).toDF("x", "y")
    val joined = Seq(("a\u0001b", "")).toDF("x", "y")
    val c2 = Seq(col("x"), col("y"))
    assert(TableDigest.digest(twoCols, c2).head() !=
      TableDigest.digest(joined, c2).head())
    val realSentinel = Seq(Tuple1("\u0004")).toDF("x")
    val nullVal = Seq(Tuple1(null.asInstanceOf[String])).toDF("x")
    val c1 = Seq(col("x"))
    assert(TableDigest.digest(realSentinel, c1).head() !=
      TableDigest.digest(nullVal, c1).head())
    // a literal escape char must not collide with its doubled form
    val esc1 = Seq(Tuple1("\u0002")).toDF("x")
    val esc2 = Seq(Tuple1("\u0002\u0002")).toDF("x")
    assert(TableDigest.digest(esc1, c1).head() !=
      TableDigest.digest(esc2, c1).head())
  }

  test("digest needs at least one column") {
    intercept[IllegalArgumentException](TableDigest.digest(base, Seq.empty))
    intercept[IllegalArgumentException](
      TableDigest.digestByGroup(base, Seq.empty, cols))
  }
}
