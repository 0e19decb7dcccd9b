package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Output sharding for distributed training: assign every document to one
  * of `numShards` output shards so that per-shard token loads come out
  * balanced — stragglers in a data-parallel training job are set by the
  * HEAVIEST shard, so balance is the objective, not just evenness of
  * counts. Two assignment policies:
  *
  *  - [[assignShards]] — serpentine ("snake draft") over the weight-sorted
  *    order: rank docs by weight descending, deal rank blocks of
  *    `numShards` alternately left-to-right and right-to-left. For sorted
  *    weights this is the classic one-pass balancing heuristic (each
  *    round pairs a currently-light shard with a currently-heavy item);
  *    unlike greedy LPT it is rank-arithmetic — pure expressions over a
  *    global rank — so it distributes.
  *  - [[assignShardsHashed]] — `xxhash64(key) mod numShards`: zero
  *    sorting, balance in expectation only. The right default when docs
  *    vastly outnumber shards and weights are i.i.d.; the serpentine
  *    variant wins when the weight distribution is heavy-tailed.
  *
  * The global rank itself is distributed ([[globalRankByRange]]): range-
  * repartition on the sort key, per-partition `row_number` (keyed window),
  * then add per-partition offsets computed from ONE tiny aggregate (a row
  * per partition, collected and broadcast as a literal map). No global
  * single-partition window anywhere — the classic two-pass distributed
  * rank, exact and partitioning-invariant because the sort key is total.
  */
object Sharding {

  /** Exact 1-based dense global rank by `order` (must be a TOTAL order —
    * include a tie-break column — or ranks within ties are partition-
    * dependent). Adds `rankCol` to `df`. Two shuffles: the range
    * repartition and the keyed window; the offset side is one row per
    * partition.
    */
  def globalRankByRange(df: DataFrame, order: Seq[Column],
                        rankCol: String = "rank",
                        partitions: Int = 32): DataFrame = {
    val ranged = df.repartitionByRange(partitions, order: _*)
      .withColumn("__pid", spark_partition_id())
    val persisted = graft.CacheRegistry.persist(ranged)
    // one row per partition — bounded by `partitions`, never by data
    val counts = persisted.groupBy(col("__pid")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.map(_._2).scanLeft(0L)(_ + _)
    val offsetOf = counts.map(_._1).zip(offsets)
      .foldLeft(lit(0L)) { case (acc, (pid, off)) =>
        when(col("__pid") === pid, off).otherwise(acc) }
    val wp = Window.partitionBy(col("__pid")).orderBy(order: _*)
    persisted
      .withColumn(rankCol, offsetOf + row_number().over(wp))
      .drop("__pid")
  }

  /** Serpentine shard assignment over weight-descending rank (ties broken
    * by `key` ascending). Output: df's columns + `shard` (0-based int).
    */
  def assignShards(df: DataFrame, numShards: Int, weight: Column,
                   key: Column, partitions: Int = 32): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val ranked = globalRankByRange(df, Seq(weight.desc, key.asc),
      rankCol = "__rank", partitions = partitions)
    // serpentine: position within a double block of 2N ranks — forward in
    // the first half, mirrored in the second. Pure integer arithmetic
    // (block parity ⇔ which half of the double block), no division.
    val m2 = pmod(col("__rank") - 1, lit(2L * numShards))
    ranked
      .withColumn("shard",
        when(m2 < numShards, m2)
          .otherwise(lit(2L * numShards - 1) - m2).cast("int"))
      .drop("__rank")
  }

  /** Hash sharding: stateless, sort-free, balanced in expectation. */
  def assignShardsHashed(df: DataFrame, numShards: Int, key: Column)
      : DataFrame =
    df.withColumn("shard",
      pmod(xxhash64(key), lit(numShards.toLong)).cast("int"))

  /** Per-shard load summary — the balance check a pipeline alerts on.
    * Output: (shard, docs, load) sorted by shard.
    */
  def shardLoads(assigned: DataFrame, weight: Column): DataFrame =
    assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("docs"), sum(weight).as("load"))
      .orderBy(col("shard"))
}
