package graft

import org.apache.spark.sql.functions._
import graft.operators.Linkage

/** Unit semantics for Fellegi–Sunter record linkage (q151); cross-engine
  * correctness is pinned by the q151 oracle row (same micro-weight
  * literals in both engines).
  */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val fields = Seq(
    ("name", 0.9, 0.01), ("city", 0.8, 0.2))
  private def w(m: Double, u: Double) =
    math.round(math.log(m / u) / math.log(2.0) * 1e6) / 1e6
  private val (waName, wdName) = (w(0.9, 0.01), w(0.1, 0.99))
  private val (waCity, wdCity) = (w(0.8, 0.2), w(0.2, 0.8))

  private val left = Seq(
    (1L, "b1", "alice", "rome"),
    (2L, "b1", "bob", "oslo"),
    (3L, "b2", "carol", "lima"))
    .toDF("lid", "blk", "name", "city")

  test("scores are the exact micro-weight sums; missing fields score 0; " +
    "threshold gates") {
    val right = Seq(
      (10L, "b1", Some("alice"), Some("rome")),   // full agree
      (11L, "b1", Some("alice"), Some("oslo")),   // name agree, city dis
      (12L, "b1", Some("bob"), Option.empty[String]), // city missing
      (13L, "b2", Some("dave"), Some("lima")))    // name dis, city agree
      .toDF("rid", "blk", "name", "city")
    val out = Linkage.fellegiSunter(left, right, "lid", "rid", Seq("blk"),
      fields, threshold = -100.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (Option(r.get(2)), Option(r.get(3)), r.getDouble(4)))).toMap
    assert(math.abs(out((1L, 10L))._3 - (waName + waCity)) < 1e-9)
    assert(math.abs(out((1L, 11L))._3 - (waName + wdCity)) < 1e-9)
    assert(out((2L, 12L)) === ((Some(1), None, waName)),
      "missing city contributes exactly 0")
    assert(math.abs(out((3L, 13L))._3 - (wdName + waCity)) < 1e-9)
    // cross-name pairs inside a block are scored too (bob vs alice)
    assert(out.contains((2L, 10L)))
    val gated = Linkage.fellegiSunter(left, right, "lid", "rid", Seq("blk"),
      fields, threshold = waName).collect()
    assert(gated.forall(_.getDouble(4) >= waName - 1e-9))
    assert(gated.exists(r => r.getLong(0) == 1L && r.getLong(1) == 10L))
    assert(!gated.exists(r => r.getLong(0) == 3L && r.getLong(1) == 13L),
      "below-threshold pair filtered")
  }

  test("blocking is absolute: agreeing records in different blocks never pair") {
    val right = Seq((20L, "b9", "alice", "rome")).toDF("rid", "blk", "name", "city")
    assert(Linkage.fellegiSunter(left, right, "lid", "rid", Seq("blk"),
      fields, threshold = -100.0).count() === 0L)
  }

  test("parameter guards: m must beat u, ids distinct, non-empty specs") {
    val right = left.withColumnRenamed("lid", "rid")
    intercept[IllegalArgumentException](Linkage.fellegiSunter(
      left, right, "lid", "rid", Seq("blk"),
      Seq(("name", 0.2, 0.5)), 0.0))
    intercept[IllegalArgumentException](Linkage.fellegiSunter(
      left, right, "lid", "rid", Seq("blk"),
      Seq(("name", 1.0, 0.5)), 0.0))
    intercept[IllegalArgumentException](Linkage.fellegiSunter(
      left, left, "lid", "lid", Seq("blk"), fields, 0.0))
    intercept[IllegalArgumentException](Linkage.fellegiSunter(
      left, right, "lid", "rid", Seq.empty, fields, 0.0))
    intercept[IllegalArgumentException](Linkage.fellegiSunter(
      left, right, "lid", "rid", Seq("blk"), Seq.empty, 0.0))
  }

  test("fellegiSunterFuzzy: a typo'd name counts FOR the match where the " +
    "exact indicator counts it against; threshold and guards") {
    val right = Seq(
      (10L, "b1", "alcie", "rome"),   // transposition typo in alice
      (11L, "b1", "zzzyx", "rome"))   // genuinely different name
      .toDF("rid", "blk", "name", "city")
    def run(th: Double) = Linkage.fellegiSunterFuzzy(
        left, right, "lid", "rid", Seq("blk"),
        exactFields = Seq(("city", 0.8, 0.2)),
        fuzzyFields = Seq(("name", 0.9, 0.01, th)),
        threshold = -100.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getInt(2), r.getInt(3), r.getDouble(4)))).toMap
    // jw(alice, alcie) ≈ 0.9533 — fuzzy at 0.9 agrees, exact machinery
    // (q151's fellegiSunter) would score the same pair as a disagreement
    val fuzzy = run(0.9)
    assert(fuzzy((1L, 10L))._1 === 1 && fuzzy((1L, 10L))._2 === 1)
    assert(math.abs(fuzzy((1L, 10L))._3 - (waCity + waName)) < 1e-9,
      "typo'd name is agreement evidence under the fuzzy indicator")
    assert(fuzzy((1L, 11L))._2 === 0, "a different name still disagrees")
    val exact = Linkage.fellegiSunter(left, right, "lid", "rid", Seq("blk"),
        Seq(("city", 0.8, 0.2), ("name", 0.9, 0.01)), threshold = -100.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(3))).toMap
    assert(exact((1L, 10L)) === 0, "equality indicator penalizes the typo")
    // a stricter similarity threshold turns the typo back into disagreement
    assert(run(0.99)((1L, 10L))._2 === 0)
    intercept[IllegalArgumentException](Linkage.fellegiSunterFuzzy(
      left, right, "lid", "rid", Seq("blk"), Seq.empty,
      Seq(("name", 0.9, 0.01, 1.5)), 0.0))
  }

  test("minimalAgreeSets: complete, minimal, and guarded") {
    // weights 7, 4, 2; T=5: minimal sets {0}, {1,2} ({0,1} etc. contain {0})
    assert(Linkage.minimalAgreeSets(Seq(7L, 4L, 2L), 5L).toSet ===
      Set(Set(0), Set(1, 2)))
    // unreachable threshold -> no sets -> no pair can ever qualify
    assert(Linkage.minimalAgreeSets(Seq(1L, 1L), 10L).isEmpty)
    intercept[IllegalArgumentException](Linkage.minimalAgreeSets(Seq(1L), 0L))
  }

  test("fellegiSunterFuzzyBlocked is pair-for-pair identical to the " +
    "block-quadratic scorer, including pairs that pass WITHOUT name " +
    "agreement") {
    import spark.implicits._
    // weights: name(0.95,0.05)->±4.25, seg(0.9,0.25)->+1.85/-2.91,
    // bal(0.85,0.005)->+7.41/-2.73; T=3 -> minimal agree-sets {name},{bal}
    val l = Seq(
      (1L, 1L, "alice jones", "AUTO", 100L),
      (2L, 1L, "bob smith", "BIKE", 200L),
      (3L, 1L, "carol white", "AUTO", 300L),
      (4L, 2L, "dan black", "SHIP", 400L))
      .toDF("lid", "nk", "name", "segment", "bal")
    val r = Seq(
      (11L, 1L, "alice jomes", "AUTO", 101L),  // name fuzzy-agrees only
      (12L, 1L, "zzz yyy", "BIKE", 200L),      // bal+seg agree, name disagrees
      (13L, 1L, "qqq ppp", null, 300L),        // bal agrees, name disagrees, seg missing
      (14L, 1L, "carol white", "AUTO", 999L),  // name+seg agree, bal disagrees
      (15L, 2L, "dan black", "SHIP", 400L),    // all agree, other block
      (16L, 1L, "alice jones", null, 100L))    // name+bal agree, seg missing
      .toDF("rid", "nk", "name", "segment", "bal")
    val exactF = Seq(("segment", 0.9, 0.25), ("bal", 0.85, 0.005))
    val fuzzyF = Seq(("name", 0.95, 0.05, 0.9))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(x => (x.getLong(0), x.getLong(1),
        Option(x.get(2)), Option(x.get(3)), Option(x.get(4)),
        x.getDouble(5))).toSet
    val want = canon(Linkage.fellegiSunterFuzzy(
      l, r, "lid", "rid", Seq("nk"), exactF, fuzzyF, 3.0))
    val got = canon(Linkage.fellegiSunterFuzzyBlocked(
      l, r, "lid", "rid", Seq("nk"), exactF, fuzzyF, 3.0))
    graft.CacheRegistry.releaseAll()
    assert(got === want)
    // the discriminating cases must actually be present
    val ids = got.map(t => (t._1, t._2))
    assert(ids.contains((2L, 12L)), "bal+seg agree, name DISAGREES: +5.01")
    assert(ids.contains((3L, 13L)), "bal agrees, name disagrees, seg null: +3.16")
    assert(ids.contains((3L, 14L)), "name+seg agree, bal disagrees: +3.37")
    assert(ids.contains((4L, 15L)) && ids.contains((1L, 16L)))
    assert(!ids.contains((1L, 12L)) && !ids.contains((2L, 11L)))
  }

  test("fellegiSunterFuzzyBlocked with an unreachable threshold returns " +
    "the empty scored frame (schema-identical to the quadratic scorer), " +
    "not a crash") {
    import spark.implicits._
    val l = Seq((1L, 1L, "alice", "AUTO")).toDF("lid", "nk", "name", "segment")
    val r = Seq((11L, 1L, "alice", "AUTO")).toDF("rid", "nk", "name", "segment")
    val exactF = Seq(("segment", 0.9, 0.25))
    val fuzzyF = Seq(("name", 0.95, 0.05, 0.9))
    // max attainable score ≈ 4.25 + 1.85 = 6.1 < 50 → minimalAgreeSets is
    // empty; the quadratic scorer returns zero rows, blocked must match
    val want = Linkage.fellegiSunterFuzzy(
      l, r, "lid", "rid", Seq("nk"), exactF, fuzzyF, 50.0)
    val got = Linkage.fellegiSunterFuzzyBlocked(
      l, r, "lid", "rid", Seq("nk"), exactF, fuzzyF, 50.0)
    assert(got.schema === want.schema)
    assert(got.count() === 0L && want.count() === 0L)
    graft.CacheRegistry.releaseAll()
  }

  test("fellegiSunterFuzzyBlocked with duplicate ids in DIFFERENT blocks " +
    "still equals the quadratic scorer — the id re-join re-asserts block " +
    "equality instead of cross-pairing") {
    import spark.implicits._
    // right id 11 appears in blocks 1 AND 2 with different field values;
    // left id 1 likewise. A bare-id re-join would score (1@nk1, 11@nk2)
    // combos the quadratic scorer never produces.
    val l = Seq(
      (1L, 1L, "alice jones", "AUTO", 100L),
      (1L, 2L, "alice jones", "SHIP", 500L),
      (2L, 1L, "bob smith", "BIKE", 200L))
      .toDF("lid", "nk", "name", "segment", "bal")
    val r = Seq(
      (11L, 1L, "alice jomes", "AUTO", 100L),
      (11L, 2L, "totally other", "SHIP", 999L),
      (12L, 2L, "alice jones", "SHIP", 500L))
      .toDF("rid", "nk", "name", "segment", "bal")
    val exactF = Seq(("segment", 0.9, 0.25), ("bal", 0.85, 0.005))
    val fuzzyF = Seq(("name", 0.95, 0.05, 0.9))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(x => (x.getLong(0), x.getLong(1),
        Option(x.get(2)), Option(x.get(3)), Option(x.get(4)),
        x.getDouble(5))).toSet
    val want = canon(Linkage.fellegiSunterFuzzy(
      l, r, "lid", "rid", Seq("nk"), exactF, fuzzyF, 3.0))
    val got = canon(Linkage.fellegiSunterFuzzyBlocked(
      l, r, "lid", "rid", Seq("nk"), exactF, fuzzyF, 3.0))
    graft.CacheRegistry.releaseAll()
    assert(got === want)
    // the in-block true matches are present; multiplicity preserved
    assert(got.map(t => (t._1, t._2)).contains((1L, 11L)))
    assert(got.map(t => (t._1, t._2)).contains((1L, 12L)))
  }
}
