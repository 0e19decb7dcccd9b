package graft

import org.apache.spark.sql.functions._
import graft.operators.DataQuality

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("functionalDependency: holds → empty; violations carry fan-out " +
    "and support") {
    val df = Seq(
      ("a", 1, "x"), ("a", 1, "x"), ("a", 2, "x"),
      ("b", 3, "y"), ("b", 4, "z"))
      .toDF("k", "v", "w")
    // k → w is violated only by b (y and z)
    val viol = DataQuality.functionalDependency(df, Seq("k"), "w")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(viol.toSeq === Seq(("b", 2L, 2L)))
    // (k, v) → w holds everywhere
    assert(DataQuality.functionalDependency(df, Seq("k", "v"), "w")
      .collect().isEmpty)
    intercept[IllegalArgumentException](
      DataQuality.functionalDependency(df, Seq.empty, "w"))
  }

  test("orphanKeys: collapses child rows per key; null child keys are " +
    "not orphans") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), Some(9L),
      Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = DataQuality.orphanKeys(child, "fk", parent, "pk")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((9L, 3L)),
      "one row per orphaned key with its child-row count")
  }

  test("keyCandidates: unique non-null wins, duplicates and nulls lose, " +
    "composite can rescue") {
    val df = Seq(
      (Some(1L), "a"), (Some(2L), "a"), (Some(2L), "b"), (None, "c"))
      .toDF("id", "grp")
    val got = DataQuality.keyCandidates(df,
        Seq(Seq("id"), Seq("grp"), Seq("id", "grp")))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // id: 4 rows, 3 distinct non-degenerate + the null-struct combo = 4
    // distinct structs BUT one null row → not a key
    assert(got("id")._4 === false)
    assert(got("id")._3 === 1L)
    // grp: duplicates ("a" twice) → not a key
    assert(got("grp") === ((4L, 3L, 0L, false)))
    // (id, grp): all four combos distinct, but the null id row still
    // disqualifies
    assert(got("id,grp")._2 === 4L)
    assert(got("id,grp")._4 === false)
    // and a genuinely clean key reads true
    val clean = Seq((1L, "a"), (2L, "a")).toDF("id", "grp")
    assert(DataQuality.keyCandidates(clean, Seq(Seq("id")))
      .collect().head.getBoolean(4))
  }

  test("validate: null predicates are violations, counts are exact, " +
    "empty frame reports zero rows passing, unique names enforced") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(5.0)), (2L, Some(-1.0)), (3L, Option.empty[Double]))
      .toDF("id", "v")
    val got = DataQuality.validate(df, Seq(
        ("v_positive", col("v") > 0),
        ("id_present", col("id").isNotNull)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    // the null v row VIOLATES v_positive — three-valued logic never
    // silently passes a contract
    assert(got("v_positive") === ((3L, 2L, 0.666667, false)))
    assert(got("id_present") === ((3L, 0L, 0.0, true)))
    val empty = DataQuality.validate(df.filter(col("id") < 0),
        Seq(("anything", col("v") > 0)))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(4)))
    assert(empty.toSeq === Seq((0L, 0L, true)),
      "an empty delivery passes vacuously with zero rows on record")
    intercept[IllegalArgumentException](DataQuality.validate(df, Seq.empty))
    intercept[IllegalArgumentException](DataQuality.validate(df,
      Seq(("dup", col("v") > 0), ("dup", col("v") < 9))))
  }
}
