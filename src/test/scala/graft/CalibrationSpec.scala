package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** [[graft.operators.Dedup.minhashCalibration]]: the estimator audit must
  * (a) be a pure function of the corpus (partitioning-invariant), (b) put
  * the candidate population where LSH banding says it lives (high
  * deciles present), (c) keep the background population honest (pairs
  * with zero shingle overlap land in decile 0 with avg_exact 0), and
  * (d) estimate within MinHash's own sampling error per decile.
  */
class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.table(spark, sf0001, "documents")

  test("calibration on real docs: deciles bounded, estimator near exact") {
    val out = Dedup.minhashCalibration(docs).collect()
    assert(out.nonEmpty)
    val byKey = out.map(r => ((r.getString(0), r.getInt(1)),
      (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(byKey.keys.forall { case (tag, d) =>
      (tag == "candidate" || tag == "background") && d >= 0 && d <= 9 })
    // background pairs are hash-random doc pairs: overwhelmingly decile 0
    val bg = byKey.filter(_._1._1 == "background")
    assert(bg.nonEmpty, "background sample produced no pairs")
    val bgN = bg.values.map(_._1).sum
    assert(bg.getOrElse(("background", 0), (0L, 0.0, 0.0))._1 >= bgN / 2,
      "random pairs should concentrate in the lowest decile")
    // per decile the lane estimator should sit within ~4 standard errors
    // of the exact mean (σ = √(j(1−j)/16) ≤ 0.125) plus decile width
    out.foreach { r =>
      val (est, exact) = (r.getDouble(3), r.getDouble(4))
      assert(math.abs(est - exact) <= 4 * 0.125 + 0.1,
        s"decile ${r.getInt(1)} (${r.getString(0)}): est $est vs exact $exact")
    }
  }

  test("calibration is partitioning-invariant (pure function of the corpus)") {
    val a = Dedup.minhashCalibration(docs).collect()
      .map(_.toSeq).toSet
    val b = Dedup.minhashCalibration(docs.repartition(13)).collect()
      .map(_.toSeq).toSet
    assert(a == b)
  }

  test("identical docs calibrate to decile 9 with est = exact = 1") {
    val two = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val out = Dedup.minhashCalibration(two, backgroundMod = Some(1),
        pairBuckets = 1)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // the pair appears under both tags; both rows must say jac = est = 1
    assert(out.nonEmpty)
    out.foreach { case (_, d, n, est, exact) =>
      assert(d == 9 && n == 1L && est == 1.0 && exact == 1.0)
    }
  }

  test("thresholdCalibration: crafted two-tier corpus steps where it " +
    "should, curve is monotone nonincreasing, reruns agree") {
    // A-B: append one word to 12 tokens → 10 shared of 11 trigram
    // shingles, jac = 10/11 ≈ 0.909; C-D: swap one middle word of 12 →
    // 7 shared of 13, jac ≈ 0.538; E shares nothing
    val twelve = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu"
    val other = "one two three four five six seven eight nine ten " +
      "eleven twelve"
    val docs = Seq(
      (1L, twelve),
      (2L, twelve + " extra"),
      (3L, other),
      (4L, other.replace("six", "SWAPPED")),
      (5L, "totally unrelated content lives here now"))
      .toDF("doc_id", "text")
    val curve = Dedup.thresholdCalibration(docs)
      .collect().map(r => (math.round(r.getDouble(0) * 100) / 100.0,
        r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(curve.map(_._1) === (10 to 19).map(_ / 20.0))
    val at50 = curve.head
    val at75 = curve.find(_._1 == 0.75).get
    val at90 = curve.find(_._1 == 0.9).get
    val at95 = curve.find(_._1 == 0.95).get
    assert(at50._2 === 2L && at50._3 === 4L,
      s"both pairs and four docs at the floor, got $at50")
    assert(at75._2 === 1L && at75._3 === 2L,
      s"only the near-identical pair above 0.75, got $at75")
    assert(at90._2 === 1L && at95._2 === 0L,
      s"the 0.909 pair stands at 0.90 and falls at 0.95: $at90 $at95")
    // monotone nonincreasing in both measures
    curve.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._2 >= hi._2 && lo._3 >= hi._3, s"$lo -> $hi") }
    assert(Dedup.thresholdCalibration(docs.repartition(5))
      .collect().map(_.toSeq).toSet ===
      curve.map(t => Seq(t._1, t._2, t._3)).toSet)
  }

  test("disjoint docs: background decile 0, zero overlap, near-zero estimate") {
    val two = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val out = Dedup.minhashCalibration(two, backgroundMod = Some(1),
        pairBuckets = 1)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val bg = out.filter(_._1 == "background")
    assert(bg.length == 1)
    assert(bg.head._2 == 0 && bg.head._5 == 0.0,
      "zero-overlap pair must land in decile 0 with exact 0")
  }
}
