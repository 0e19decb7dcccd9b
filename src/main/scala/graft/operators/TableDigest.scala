package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-free table fingerprinting — the migration-verification primitive:
  * prove two copies of a table (old engine vs new, pre-migration vs post,
  * region A vs region B) hold EXACTLY the same rows without sorting,
  * shipping, or even co-locating them. Each row canonicalizes to a
  * delimited string, hashes to a 63-bit value through md5 lanes
  * ([[graft.functions.Md5Lanes]] — engine-portable, DuckDB replays it as
  * `md5()` substrings), and the table collapses to THREE order-free
  * aggregates:
  *
  *  - `n_rows`    — count;
  *  - `xor_digest` — bit_xor of row hashes: commutative/associative, so
  *    any partitioning and any accumulation order agree; detects any
  *    single-row change;
  *  - `sum_digest` — modular sum (mod 1e9+7) of row hashes: catches the
  *    classes XOR is blind to (a row duplicated an even number of times,
  *    paired insert/delete of identical rows).
  *
  * Comparing tables = comparing one row of three longs per side. At
  * 100 TB that is ONE scan per copy with map-side-combined aggregation —
  * no sort, no shuffle of data rows, a one-row result. [[digestByGroup]]
  * keys the same digests by a partition column, so a mismatch localizes
  * to the partition that diverged (re-digest at finer grain to binary-
  * search the bad rows) — the audit loop a 100 TB migration actually
  * runs.
  *
  * Canonicalization contract: values are ESCAPED, then joined with
  * U+0001 (nulls render as bare U+0004): U+0002 is the escape char
  * (doubled), the delimiter escapes to U+0002 '1', the null sentinel to
  * U+0002 '4'. Escaped values can contain neither the delimiter nor a
  * bare sentinel, so no column VALUE can imitate a field boundary or a
  * null (a plain delimiter-join is blind to a value that contains the
  * delimiter: one column "a<d>b" vs two columns "a","b"). The escape
  * passes copy only when a control character is actually present —
  * clean values cost three indexOf scans and zero allocations.
  * Callers pass columns whose string form is engine-stable (integers,
  * strings, dates, decimals; for doubles pass an explicit quantized
  * cast) — the same discipline every oracle-checked query in this engine
  * already follows.
  */
object TableDigest {

  private val Mod = 1000000007L

  /** 63-bit row hash: md5 lanes 1..2 of the canonicalized row string,
    * packed as (lane1 << 31) xor lane2 — stays in [0, 2^63) so BIGINT
    * arithmetic can't overflow on either engine.
    */
  private def rowHash(cols: Seq[Column]): Column = {
    require(cols.nonEmpty, "digest needs at least one column")
    val canon = concat_ws("\u0001", cols.map { c =>
      // escape-then-delimit: values are scanned three times but copied
      // only when they actually contain a control character (UTF8String
      // replace returns the input untouched on a miss) — the common case
      // costs three sub-microsecond indexOf scans, where a length-prefix
      // encoding allocates two strings per column per row
      val cs = c.cast("string")
      coalesce(
        replace(replace(replace(cs,
          lit("\u0002"), lit("\u0002\u0002")),
          lit("\u0001"), lit("\u00021")),
          lit("\u0004"), lit("\u00024")),
        lit("\u0004"))
    }: _*)
    val lanes = graft.functions.GraftFunctions.md5_lanes(canon)
    shiftleft(element_at(lanes, 1), 31)
      .bitwiseXOR(element_at(lanes, 2))
  }

  /** Modular sum that cannot wrap: the per-row residues (< 2³⁰) accumulate
    * in DECIMAL(38,0) — overflow would need ~10²⁹ rows per group — and
    * reduce mod p once, landing back in BIGINT. A plain long sum silently
    * wraps past ~9.4e9 rows per group, exactly the table size this
    * operator exists for; DuckDB's HUGEINT sum matches this by
    * construction.
    */
  private def modSum(c: Column): Column =
    (sum((c % Mod).cast("decimal(38,0)")) % Mod).cast("long")

  /** One digest row (n_rows, xor_digest, sum_digest) for the whole frame.
    * The row hash is PROJECTED before the aggregate so the md5 runs once
    * per row — aggregate expressions get no common-subexpression
    * elimination across functions, and xor + sum would otherwise each
    * hash every row.
    */
  def digest(df: DataFrame, cols: Seq[Column]): DataFrame =
    df.select(rowHash(cols).as("__rh"))
      .agg(
        count(lit(1)).as("n_rows"),
        call_function("bit_xor", col("__rh")).as("xor_digest"),
        modSum(col("__rh")).as("sum_digest"))

  /** Per-group digests — localize a table mismatch to the partition that
    * diverged. One map-side-combined aggregation keyed by `groupCols`,
    * over the once-projected row hash (see [[digest]]).
    */
  def digestByGroup(df: DataFrame, groupCols: Seq[String],
                    cols: Seq[Column]): DataFrame = {
    require(groupCols.nonEmpty, "digestByGroup needs at least one group column")
    df.select(groupCols.map(col) :+ rowHash(cols).as("__rh"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        call_function("bit_xor", col("__rh")).as("xor_digest"),
        modSum(col("__rh")).as("sum_digest"))
  }

  /** Merge per-batch digest frames into the digest of the union — the
    * incremental-maintenance half of the audit: all three aggregates are
    * abelian (count adds, xor xors, modular sum adds mod p), so a standing
    * table's digest updates from each append's OWN digest without ever
    * rescanning history, and shard digests computed independently (other
    * cluster, other engine, other continent) roll up exactly.
    * `merge(digestByGroup(part_i)) ≡ digestByGroup(∪ part_i)` bit-for-bit
    * (spec-pinned). Input frames must share the (groupCols…, n_rows,
    * xor_digest, sum_digest) shape [[digestByGroup]] emits.
    */
  def mergeDigests(parts: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(parts.nonEmpty, "mergeDigests needs at least one digest frame")
    require(groupCols.nonEmpty, "mergeDigests needs at least one group column")
    parts.reduce(_.unionByName(_))
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(col("n_rows")).as("n_rows"),
        call_function("bit_xor", col("xor_digest")).as("xor_digest"),
        modSum(col("sum_digest")).as("sum_digest"))
  }

  /** Latest committed digest generation in `stateDir`: (batchId, frame),
    * or None before the first commit. A generation is committed iff its
    * parquet `_SUCCESS` marker exists — partially-written generations
    * (crash mid-write) are invisible, the [[graft.operators.DedupState]]
    * commit-marker discipline.
    */
  def readStore(spark: org.apache.spark.sql.SparkSession,
                stateDir: String): Option[(Long, DataFrame)] = {
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) None
    else {
      val gens = fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen="))
        .map(_.getPath)
        .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
        .map(p => p.getName.stripPrefix("gen=").toLong -> p)
      if (gens.isEmpty) None
      else {
        val (id, p) = gens.maxBy(_._1)
        Some((id, spark.read.parquet(p.toString)))
      }
    }
  }

  /** Fold one batch's per-group digest into the generational store —
    * IDEMPOTENT under replay: a batch id at or below the last committed
    * generation is a re-delivery (streaming retry) and is skipped, so the
    * non-idempotent merge algebra (xor/sum would double-count) stays
    * exactly-once. Commit order: write `gen=<id>` (parquet `_SUCCESS` is
    * the marker), THEN delete superseded generations — a crash between
    * the two leaves extra committed generations, never a missing or
    * partial one, and the next call cleans up. Store size: one
    * groups-sized frame per surviving generation.
    */
  def mergeBatchIntoStore(stateDir: String, groupCols: Seq[String],
                          batchId: Long, batchDigest: DataFrame): Unit = {
    val spark = batchDigest.sparkSession
    val prev = readStore(spark, stateDir)
    if (!prev.exists(_._1 >= batchId)) {
      val merged = prev.fold(batchDigest) { case (_, p) =>
        mergeDigests(Seq(p, batchDigest), groupCols)
      }
      merged.write.mode("overwrite")
        .parquet(s"$stateDir/gen=$batchId")
      val root = new org.apache.hadoop.fs.Path(stateDir)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen="))
        .filter(_.getPath.getName.stripPrefix("gen=").toLong < batchId)
        .foreach(s => fs.delete(s.getPath, true))
    }
  }

  /** DuckDB replay of [[digestByGroup]]: the same canonicalization
    * (escaped fields, chr(1) joins, chr(4) nulls), the same two md5 lanes, the same
    * 63-bit pack and modular sum. `colSqls` must render each column
    * exactly as Spark's CAST-to-string does (identity for VARCHAR,
    * CAST(... AS VARCHAR) for integers/dates).
    */
  def digestByGroupOracleSql(table: String, groupCols: Seq[String],
                             colSqls: Seq[String]): String = {
    val canon = colSqls
      .map(c => s"COALESCE(replace(replace(replace(CAST($c AS VARCHAR), " +
        "chr(2), chr(2) || chr(2)), chr(1), chr(2) || '1'), " +
        "chr(4), chr(2) || '4'), chr(4))")
      .mkString(" || chr(1) || ")
    def lane(i: Int) =
      s"CAST(('0x' || substring(md5(s), ${1 + 8 * i}, 8)) AS BIGINT)"
    val gs = groupCols.mkString(", ")
    s"""WITH canon AS (
       |  SELECT $gs, $canon AS s FROM $table
       |), hashed AS (
       |  SELECT $gs, xor(${lane(0)} << 31, ${lane(1)}) AS rh FROM canon
       |)
       |SELECT $gs, COUNT(*) AS n_rows,
       |       CAST(bit_xor(rh) AS BIGINT) AS xor_digest,
       |       CAST(SUM(rh % $Mod) % $Mod AS BIGINT) AS sum_digest
       |FROM hashed GROUP BY $gs""".stripMargin
  }
}
