package graft.functions

/** Pure-Scala BLAKE2b (RFC 7693), unkeyed, variable digest size.
  *
  * The reference pseudonymizes uids with
  * `hashlib.blake2b(x.encode(), digest_size=5).hexdigest()`
  * (/root/reference/anonymize_datasets.py:60,74). Neither Spark SQL nor the
  * JDK ships BLAKE2b, so the RFC 7693 core is implemented here (~100 LoC) and
  * exposed both as a static method (codegen-friendly) and as a native Catalyst
  * expression (see [[Blake2bExpr]]).
  */
object Blake2b {

  private val IV: Array[Long] = Array(
    0x6a09e667f3bcc908L, 0xbb67ae8584caa73bL, 0x3c6ef372fe94f82bL,
    0xa54ff53a5f1d36f1L, 0x510e527fade682d1L, 0x9b05688c2b3e6c1fL,
    0x1f83d9abfb41bd6bL, 0x5be0cd19137e2179L)

  private val SIGMA: Array[Array[Int]] = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    Array(11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    Array(7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    Array(9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    Array(2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    Array(12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    Array(13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    Array(6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    Array(10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0),
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3))

  @inline private def rotr(x: Long, n: Int): Long = (x >>> n) | (x << (64 - n))

  private def compress(h: Array[Long], block: Array[Byte], off: Int,
                       t: Long, last: Boolean): Unit = {
    val m = new Array[Long](16)
    var i = 0
    while (i < 16) {
      var w = 0L
      var j = 7
      while (j >= 0) { w = (w << 8) | (block(off + i * 8 + j) & 0xffL); j -= 1 }
      m(i) = w
      i += 1
    }
    val v = new Array[Long](16)
    System.arraycopy(h, 0, v, 0, 8)
    System.arraycopy(IV, 0, v, 8, 8)
    v(12) ^= t
    // t is a 128-bit counter in the RFC; inputs here are < 2^64 bytes so the
    // high word stays 0.
    if (last) v(14) = ~v(14)

    @inline def g(r: Array[Int], a: Int, b: Int, c: Int, d: Int, x: Int, y: Int): Unit = {
      v(a) = v(a) + v(b) + m(r(x)); v(d) = rotr(v(d) ^ v(a), 32)
      v(c) = v(c) + v(d); v(b) = rotr(v(b) ^ v(c), 24)
      v(a) = v(a) + v(b) + m(r(y)); v(d) = rotr(v(d) ^ v(a), 16)
      v(c) = v(c) + v(d); v(b) = rotr(v(b) ^ v(c), 63)
    }
    var r = 0
    while (r < 12) {
      val s = SIGMA(r)
      g(s, 0, 4, 8, 12, 0, 1); g(s, 1, 5, 9, 13, 2, 3)
      g(s, 2, 6, 10, 14, 4, 5); g(s, 3, 7, 11, 15, 6, 7)
      g(s, 0, 5, 10, 15, 8, 9); g(s, 1, 6, 11, 12, 10, 11)
      g(s, 2, 7, 8, 13, 12, 13); g(s, 3, 4, 9, 14, 14, 15)
      r += 1
    }
    i = 0
    while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
  }

  /** Unkeyed BLAKE2b digest of `input`, `digestSize` bytes (1..64). */
  def digest(input: Array[Byte], digestSize: Int): Array[Byte] = {
    require(digestSize >= 1 && digestSize <= 64, s"digestSize $digestSize")
    val h = IV.clone()
    h(0) ^= 0x01010000L ^ digestSize.toLong
    val n = input.length
    // full blocks except the last (the final block is always compressed with
    // the finalization flag, padded with zeros; empty input = one zero block)
    var off = 0
    while (n - off > 128) {
      compress(h, input, off, (off + 128).toLong, last = false)
      off += 128
    }
    val lastBlock = new Array[Byte](128)
    System.arraycopy(input, off, lastBlock, 0, n - off)
    compress(h, lastBlock, 0, n.toLong, last = true)
    val out = new Array[Byte](digestSize)
    var i = 0
    while (i < digestSize) {
      out(i) = ((h(i / 8) >>> (8 * (i % 8))) & 0xff).toByte
      i += 1
    }
    out
  }

  private val HEX = "0123456789abcdef".toCharArray

  def hexDigest(input: Array[Byte], digestSize: Int): String = {
    val d = digest(input, digestSize)
    val sb = new java.lang.StringBuilder(digestSize * 2)
    var i = 0
    while (i < d.length) {
      sb.append(HEX((d(i) >> 4) & 0xf)); sb.append(HEX(d(i) & 0xf)); i += 1
    }
    sb.toString
  }

  /** The reference's exact pseudonym: blake2b(utf8, digest_size=5).hexdigest(). */
  def hex5(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(hexDigest(s.getBytes, 5))
}
