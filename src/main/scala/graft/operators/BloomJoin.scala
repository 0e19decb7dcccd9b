package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-pruned equi-join — the scan-side membership pre-filter that makes
  * a fact↔dimension join affordable when the dimension is too large to
  * broadcast as ROWS but its Bloom filter (Bloom 1970, CACM 13(7)) fits in
  * kilobytes. Spark itself applies the same idea opportunistically
  * (`InjectRuntimeFilter`, `spark.sql.optimizer.runtime.bloomFilter.*`);
  * this operator makes it explicit, deterministic, and engine-replayable:
  *
  *  1. '''Build''' ([[buildBits]]): each dimension key sets `numHashes`
  *     bits of an `numBits`-wide bitset. The bitset is assembled
  *     DISTRIBUTED — per-key (word, mask) contributions collapse in ONE
  *     map-side-combined `bit_or` aggregation keyed by word index, so the
  *     driver collects at most `numBits / 64` longs (the FILTER's size,
  *     never the key count). A billion-key dimension still collects 2048
  *     longs at the default 2^17 bits.
  *  2. '''Probe''' ([[probeExpr]]): a pure scan-side `Column` — xxhash64
  *     double-hashing against the bitset embedded as ONE array<long>
  *     literal (referenced once, inside a `forall` lambda). No join, no
  *     shuffle, no UDF: rows whose key cannot be in the dimension die in
  *     the scan, BEFORE the shuffle that the real join pays.
  *  3. '''Exactness''' ([[prunedJoin]]): the surviving rows take the
  *     ordinary equi-join, which removes the false positives — Bloom
  *     filters have no false NEGATIVES, so the composition equals the
  *     plain join bit-for-bit (spec-pinned, and q158's oracle is the plain
  *     join).
  *
  * 100 TB shape: the win is shuffle rows. At 1% join selectivity a
  * 10¹¹-row fact table shuffles ~10⁹ rows instead of 10¹¹ — only true
  * matches and the ~0.2% false-positive tail (k=4, m/n≈16) pay the
  * network. The filter itself moves once, as a task-binary literal.
  *
  * Determinism: xxhash64 is a fixed public algorithm, seeds are the hash
  * index 0..k−1 hashed as an extra column, so the same keys always build
  * the same bitset and the same probe decisions — any engine replaying
  * the construction agrees on every bit.
  */
object BloomJoin {

  /** Bit position of hash `seed` for key column `c`: xxhash64 over
    * (key, seed) reduced mod `numBits`. Shared by build and probe — the
    * no-false-negative guarantee is this textual sharing.
    */
  private def posExpr(c: Column, seed: Column, numBits: Int): Column =
    pmod(xxhash64(c, seed.cast("int")), lit(numBits.toLong))

  private def checkParams(numBits: Int, numHashes: Int): Unit = {
    require(numBits >= 64 && numBits % 64 == 0,
      s"numBits must be a positive multiple of 64, got $numBits")
    require(numBits <= (1 << 24),
      s"numBits must be <= 2^24 (a 2 MiB literal), got $numBits")
    require(numHashes >= 1 && numHashes <= 16,
      s"numHashes must be in [1, 16], got $numHashes")
  }

  /** Build the bitset over `keys.keyCol` distributed; returns the packed
    * words (little-endian bit order within each long). One aggregation,
    * driver memory bounded by `numBits / 64` longs.
    */
  def buildBits(keys: DataFrame, keyCol: String,
                numBits: Int = 1 << 17, numHashes: Int = 4): Array[Long] = {
    checkParams(numBits, numHashes)
    val pos = explode(transform(sequence(lit(0), lit(numHashes - 1)),
      s => posExpr(col(keyCol), s, numBits))).as("pos")
    val words = keys.select(pos)
      .select(shiftright(col("pos"), 6).cast("int").as("w"),
        call_function("shiftleft", lit(1L),
          pmod(col("pos"), lit(64L)).cast("int")).as("mask"))
      .groupBy("w")
      .agg(call_function("bit_or", col("mask")).as("bits"))
      .collect()
    val bits = new Array[Long](numBits / 64)
    words.foreach(r => bits(r.getInt(0)) = r.getLong(1))
    bits
  }

  /** Membership test for `c` against a built bitset — a scan-side Column
    * (no shuffle; spec pins the filtered plan Exchange-free). May return
    * true for absent keys (false positives); never false for present ones.
    */
  def probeExpr(c: Column, bits: Array[Long], numHashes: Int = 4): Column = {
    val numBits = bits.length * 64
    checkParams(numBits, numHashes)
    val bitsLit = lit(bits)
    forall(sequence(lit(0), lit(numHashes - 1)), s => {
      val pos = posExpr(c, s, numBits)
      element_at(bitsLit, shiftright(pos, 6).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          pmod(pos, lit(64L)).cast("int"))) =!= lit(0L)
    })
  }

  /** The full operator: build on the dimension's key, probe-filter the
    * fact scan, equi-join to drop false positives. Result ≡
    * `fact.join(dim, fact(factKey) === dim(dimKey))` — the Bloom stage
    * only changes WHERE non-matching rows die (scan vs join).
    */
  def prunedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: String, dimKey: String,
                 numBits: Int = 1 << 17, numHashes: Int = 4): DataFrame = {
    val bits = buildBits(dim, dimKey, numBits, numHashes)
    fact.filter(probeExpr(col(factKey), bits, numHashes))
      .join(dim, col(factKey) === dim(dimKey))
  }
}
