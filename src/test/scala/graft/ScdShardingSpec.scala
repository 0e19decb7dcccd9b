package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Scd, Sharding}

class ScdShardingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("scd2: collapses no-op re-statements, chains valid_to, flags current") {
    val changes = Seq(
      (1L, 10L, "2024-01-01 00:00:00", "A"),
      (1L, 11L, "2024-01-02 00:00:00", "A"), // re-statement → collapsed
      (1L, 12L, "2024-01-03 00:00:00", "B"),
      (1L, 13L, "2024-01-04 00:00:00", "A"), // back to A = NEW version
      (2L, 20L, "2024-01-05 00:00:00", "X"))
      .toDF("user_id", "event_id", "tss", "event_type")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val out = Scd.scd2(changes, Seq("user_id"), "ts", "event_id",
        Seq("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4))).toSet
    assert(out === Set(
      (1L, "A", ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), false),
      (1L, "B", ts("2024-01-03 00:00:00"), Some(ts("2024-01-04 00:00:00")), false),
      (1L, "A", ts("2024-01-04 00:00:00"), None, true),
      (2L, "X", ts("2024-01-05 00:00:00"), None, true)))
  }

  test("scd2: same-instant changes order by the tie-break, last writer current") {
    val changes = Seq(
      (1L, 1L, "A"), (1L, 2L, "B")) // same ts, event_id breaks the tie
      .toDF("user_id", "event_id", "event_type")
      .withColumn("ts", to_timestamp(lit("2024-06-01 12:00:00")))
    val out = Scd.scd2(changes, Seq("user_id"), "ts", "event_id",
        Seq("event_type"))
      .collect().map(r => (r.getString(1), r.getBoolean(4))).toSet
    assert(out === Set(("A", false), ("B", true)),
      "A's interval must close at the shared instant; B stays current")
  }

  test("duplicated n-gram spans: cross-doc hit, within-doc repeat, " +
       "adjacent merge; hashed path agrees") {
    val docs = Seq(
      (1L, "a b c d e"),        // "a b c" shared with doc 2 → span [0,2]
      (2L, "x a b c y"),        //                             span [1,3]
      (3L, "p q p q p q"),      // every 2-shingle repeats → but n=3 here:
                                // "p q p"(0,2) and "q p q"(1,3) → [0,5]
      (4L, "unique tokens only here"))
      .toDF("doc_id", "text")
    val out = Dedup.duplicatedNgramSpans(docs, n = 3, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((1L, 0L, 2L), (2L, 1L, 3L), (3L, 0L, 5L)))
    val hashed = Dedup.duplicatedNgramSpans(docs, n = 3, minCount = 2,
        hashed = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(hashed === out, "xxhash64 scale path must match the exact path")
  }

  test("duplicated n-gram spans: non-adjacent hits stay separate spans") {
    val docs = Seq(
      (1L, "dup one two filler filler filler dup one two"),
      (2L, "dup one two")).toDF("doc_id", "text")
    val out = Dedup.duplicatedNgramSpans(docs, n = 3, minCount = 2)
      .filter(col("doc_id") === 1L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((0L, 2L), (6L, 8L)),
      "the two occurrences are separated by >1 token → two islands")
  }

  test("globalRankByRange equals a driver-side sort; invariant to input " +
       "partitioning") {
    val df = (1 to 500).map(i => (i.toLong, (i * 37 % 101).toLong))
      .toDF("id", "w")
    val expect = (1 to 500).map(i => (i.toLong, (i * 37 % 101).toLong))
      .sortBy { case (id, w) => (-w, id) }
      .zipWithIndex.map { case ((id, _), r) => id -> (r + 1L) }.toMap
    for (parts <- Seq(1, 7)) {
      val got = Sharding.globalRankByRange(df.repartition(parts),
          Seq(col("w").desc, col("id").asc), partitions = 8)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === expect, s"rank mismatch at input partitions=$parts")
    }
  }

  test("serpentine sharding balances a varied load far better than " +
       "hash sharding, and matches the driver-side deal") {
    // moderate variance — adjacent sorted weights are close, which is
    // where rank-pairing pays off (one dominant mega-item is out of ANY
    // rank scheme's reach; that calls for weight-aware splitting first)
    val rows = (1 to 400).map(i => (i.toLong, (100 + i * 37 % 101).toLong))
    val df = rows.toDF("doc_id", "n_tokens")
    val assigned = Sharding.assignShards(df, numShards = 4,
      weight = col("n_tokens"), key = col("doc_id"))
    val got = assigned.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // driver-side serpentine over the same total order
    val expect = rows.sortBy { case (id, w) => (-w, id) }.zipWithIndex
      .map { case ((id, _), r0) =>
        val m2 = r0 % 8
        id -> (if (m2 < 4) m2 else 7 - m2) }.toMap
    got.foreach { case (id, _, s) => assert(s === expect(id)) }
    val loads = got.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    val spread = (loads.values.max - loads.values.min).toDouble /
      loads.values.max
    assert(spread < 0.001, s"serpentine spread must be tight, got $loads")
    val hashedLoads = Sharding.assignShardsHashed(df, 4, col("doc_id"))
      .groupBy("shard").agg(sum("n_tokens").as("l")).collect()
      .map(_.getLong(1))
    val hashedSpread = (hashedLoads.max - hashedLoads.min).toDouble /
      hashedLoads.max
    assert(spread < hashedSpread,
      s"serpentine ($spread) must beat hash ($hashedSpread) on a heavy tail")
  }

  test("shardLoads sums what was assigned; every shard in range") {
    val df = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("doc_id", "w")
    val assigned = Sharding.assignShards(df, 8, col("w"), col("doc_id"))
    val loads = Sharding.shardLoads(assigned, col("w")).collect()
    assert(loads.map(_.getInt(0)).toSeq === (0 until 8))
    assert(loads.map(_.getLong(2)).sum === (1 to 100).map(_.toLong).sum)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged; " +
    "nulls compare null-safely and never collide with literals") {
    val oldSnap = Seq(
      (1L, Some("a"), Some("en")),   // unchanged
      (2L, Some("b"), Some("en")),   // text changes
      (3L, Some("c"), None),         // null stays null → unchanged
      (4L, Some("d"), Some("en")),   // null-ed out → changed
      (5L, Some("e"), Some("en")))   // removed
      .toDF("doc_id", "text", "lang")
    val newSnap = Seq(
      (1L, Some("a"), Some("en")),
      (2L, Some("B"), Some("en")),
      (3L, Some("c"), None),
      (4L, Some("d"), None),
      (6L, Some("f"), Some("fr")))   // added
      .toDF("doc_id", "text", "lang")
    val got = Scd.snapshotDiff(oldSnap, newSnap, Seq("doc_id"),
        Seq("text", "lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "unchanged",
      4L -> "changed", 5L -> "removed", 6L -> "added"))
    // null is distinguishable from the empty string: a real "" value
    // replacing a null must read as changed
    val o2 = Seq((7L, Option.empty[String])).toDF("doc_id", "text")
    val n2 = Seq((7L, Some(""))).toDF("doc_id", "text")
    val s2 = Scd.snapshotDiff(o2, n2, Seq("doc_id"), Seq("text"))
      .collect().head.getString(1)
    assert(s2 === "changed")
    // and column boundaries can't shift content between columns
    val o3 = Seq((8L, "ab", "")).toDF("doc_id", "a", "b")
    val n3 = Seq((8L, "a", "b")).toDF("doc_id", "a", "b")
    assert(Scd.snapshotDiff(o3, n3, Seq("doc_id"), Seq("a", "b"))
      .collect().head.getString(1) === "changed")
  }

  test("pointInTimeLookup: active version per instant, deletion gaps " +
    "match nothing, open current matches forever, boundaries half-open") {
    // hand-built history WITH a gap: [0,10)->A, gap, [20,30)->B (closed),
    // [40,null)->C current
    val hist = Seq(
      ("k", "A", 0L, Some(10L), false),
      ("k", "B", 20L, Some(30L), false),
      ("k", "C", 40L, (None: Option[Long]), true))
      .toDF("user_id", "event_type", "valid_from", "valid_to", "is_current")
    val facts = Seq(
      (1L, "k", 5L),   // inside A
      (2L, "k", 10L),  // A's exclusive end AND the gap -> nothing
      (3L, "k", 15L),  // gap -> nothing (the guard, not the fill)
      (4L, "k", 20L),  // B's inclusive start
      (5L, "k", 35L),  // past B's end, before C -> nothing
      (6L, "k", 99L),  // open current
      (7L, "x", 5L))   // unknown key -> nothing
      .toDF("event_id", "user_id", "pts")
    val got = Scd.pointInTimeLookup(facts, hist, Seq("user_id"), "pts",
        Seq("event_type"))
      .collect().map(r => r.getLong(0) ->
        Option(r.get(r.fieldIndex("pit_event_type")))
          .map(_.asInstanceOf[String])).toMap
    assert(got === Map(1L -> Some("A"), 2L -> None, 3L -> None,
      4L -> Some("B"), 5L -> None, 6L -> Some("C"), 7L -> None))
    // the nulled match nulls ALL pit columns together (the guard is
    // materialized before any overwrite — a half-nulled row would mean
    // the predicate read an already-overwritten bound)
    val gapRow = Scd.pointInTimeLookup(facts, hist, Seq("user_id"), "pts",
        Seq("event_type")).filter(col("event_id") === 3L).collect().head
    Seq("pit_valid_from", "pit_valid_to", "pit_event_type").foreach(c =>
      assert(gapRow.isNullAt(gapRow.fieldIndex(c)), s"$c must be null"))
  }

  test("applyChanges: latest writer wins, tombstone removes the key, " +
    "re-insert after tombstone survives, same-instant tie-break, invariance") {
    import spark.implicits._
    val changes = Seq(
      // k1: two upserts → latest value wins
      ("k1", 1L, 1L, "upsert", 10L), ("k1", 3L, 2L, "upsert", 30L),
      // k2: upsert then tombstone → absent
      ("k2", 1L, 3L, "upsert", 20L), ("k2", 2L, 4L, "delete", 0L),
      // k3: tombstone then re-insert → present with the later value
      ("k3", 1L, 5L, "delete", 0L), ("k3", 2L, 6L, "upsert", 99L),
      // k4: same instant, higher tie-break wins
      ("k4", 5L, 7L, "upsert", 1L), ("k4", 5L, 8L, "upsert", 2L))
      .toDF("k", "t", "tb", "op", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Scd.applyChanges(d, Seq("k"), "t", "tb",
          opCol = "op", deleteOp = "delete", valCols = Seq("v"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
    val got = run(changes)
    assert(got === Set(("k1", 30L, 3L), ("k3", 99L, 2L), ("k4", 2L, 5L)))
    assert(run(changes.repartition(7)) === got)
    intercept[IllegalArgumentException](graft.operators.Scd.applyChanges(
      changes, Seq.empty, "t", "tb", "op", "delete", Seq("v")))
  }
}
