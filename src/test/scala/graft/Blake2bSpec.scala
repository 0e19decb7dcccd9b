package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{Blake2b, GraftFunctions}

/** RFC 7693 BLAKE2b vectors (recomputed against python hashlib.blake2b —
  * the same library the reference calls at
  * /root/reference/anonymize_datasets.py:60) plus structural properties,
  * exercised both on the JVM core and through the Catalyst expression
  * (interpreted AND codegen paths).
  */
class Blake2bSpec extends SparkSpec {

  private val vectors5 = Seq(
    "123" -> "fd3516c77d",
    "" -> "7d64c5272e",
    "a" * 300 -> "a21399f24b", // multi-block (>128 bytes)
    "abc" -> "44229fc0ef",
    "héllo wörld ünïcode" -> "eb282ab84a", // multi-byte UTF-8
    "0" -> "5b4838043f",
    "customer-42" -> "2ae6c834ab")

  test("digest_size=5 vectors match hashlib.blake2b") {
    vectors5.foreach { case (in, expect) =>
      assert(Blake2b.hexDigest(in.getBytes("UTF-8"), 5) === expect, s"input=$in")
    }
  }

  test("longer digest sizes match hashlib.blake2b") {
    assert(Blake2b.hexDigest("abc".getBytes, 16) === "cf4ab791c62b8d2b2109c90275287816")
    assert(Blake2b.hexDigest("abc".getBytes, 32) ===
      "bddd813c634239723171ef3fee98579b94964e3bb1cb3e427262c8c068d52319")
    assert(Blake2b.hexDigest("abc".getBytes, 64) ===
      "ba80a53f981c4d0d6a2797b69f12f6e94c212f14685ac4b74b12bb6fdbffa2d1" +
      "7d87c5392aab792dc252d5de4533cc9518d38aa8dbf1925ab92386edd4009923")
  }

  test("multi-block inputs (>128 bytes) match hashlib.blake2b") {
    // exercises the compression loop across block boundaries and the
    // final-block length counter (RFC 7693 §3.2); expected values from
    // hashlib.blake2b(s, digest_size=5)
    assert(Blake2b.hexDigest(("x" * 129).getBytes, 5) === "7ed039b5c0")
    assert(Blake2b.hexDigest(("y" * 256).getBytes, 5) === "043ca2f867")
    assert(Blake2b.hexDigest(("z" * 300).getBytes, 5) === "ed59153c70")
    assert(Blake2b.hexDigest(("abc" * 100).getBytes, 5) === "699df9ca04")
  }

  test("expression path (codegen on and off) agrees with the JVM core") {
    import spark.implicits._
    val in = vectors5.map(_._1).toDF("s")
    Seq("CODEGEN_ONLY", "NO_CODEGEN").foreach { mode =>
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try {
        val got = in.select(col("s"), GraftFunctions.blake2b_hex(col("s")).as("h"))
          .collect().map(r => r.getString(0) -> r.getString(1)).toMap
        vectors5.foreach { case (s, expect) => assert(got(s) === expect, s"mode=$mode") }
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("null input yields null pseudonym") {
    import spark.implicits._
    val r = Seq(Option.empty[String], Some("x")).toDF("s")
      .select(GraftFunctions.blake2b_hex(col("s"))).collect()
    assert(r(0).isNullAt(0) && !r(1).isNullAt(0))
  }

  test("property: 2*digestSize hex chars, deterministic, collision-free on sample") {
    val gen = for {
      s <- Gen.asciiPrintableStr
      ds <- Gen.choose(1, 64)
    } yield (s, ds)
    val cases = (0 until 200).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)))
    assert(cases.size >= 150)
    cases.foreach { case (s, ds) =>
      val h = Blake2b.hexDigest(s.getBytes("UTF-8"), ds)
      assert(h.length === 2 * ds)
      assert(h.matches("[0-9a-f]+"))
      assert(h === Blake2b.hexDigest(s.getBytes("UTF-8"), ds))
    }
    // digest_size=5 pseudonyms over distinct inputs stay distinct (the key
    // table's 1:1 contract depends on this at realistic cardinality)
    val inputs = (0 until 5000).map(i => s"uid-$i")
    assert(inputs.map(s => Blake2b.hexDigest(s.getBytes, 5)).distinct.size === 5000)
  }
}
