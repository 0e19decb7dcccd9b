package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins (SURVEY.md §7.4).
  *
  * A shuffled equi-join sends every row of a key to one task; a Zipf-hot
  * key (one customer with 10% of all events) makes that task the job.
  * AQE's skew-join split handles most cases at runtime; this operator is
  * the explicit form for when the skew is KNOWN and the small side is
  * modest: salt the big side into `salts` sub-keys (spreading the hot key
  * over `salts` tasks) and replicate the small side once per salt, so the
  * join key becomes (key, salt) and no task sees more than ~1/salts of any
  * hot key. Cost: small side × salts — use only when that product stays
  * dimension-sized.
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Equi-join `big ⋈ small` on `keys` with an explicit `salts`-way salt.
    * Semantically identical to `big.join(small, keys, joinType)` for
    * `inner` and `left` joins (each big-side row matches exactly one
    * replica of its key's small-side rows).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(joinType == "inner" || joinType == "left",
      s"salted join preserves semantics for inner/left only, got $joinType")
    require(!big.columns.contains(SaltCol) && !small.columns.contains(SaltCol),
      s"input already has a '$SaltCol' column — rename it before saltedJoin " +
        "(an ambiguous salt reference would corrupt the join semantics)")
    // the salt must spread rows WITHIN a key, so it cannot be derived from
    // the key columns; a per-row id is the standard choice
    val saltedBig = big.withColumn(SaltCol,
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val replicatedSmall = small.withColumn(SaltCol,
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    saltedBig.join(replicatedSmall, keys :+ SaltCol, joinType).drop(SaltCol)
  }
}
