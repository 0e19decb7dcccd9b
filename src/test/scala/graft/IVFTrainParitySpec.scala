package graft

import org.apache.spark.sql.functions._
import graft.operators.IVF

/** The driver-side Lloyd arm (round 19 — sampled training under
  * [[IVF.DriverLloydMaxRows]] collapses 1 init + iters collect jobs to
  * one sample collect) must produce BITWISE the distributed loop's
  * centroids: same sample order, same init pick, same assignment kernel
  * with the same c² terms, per-cell means through the same q9
  * quantization. The accumulation order differs (driver sample order vs
  * Spark's partition merge), which the sampled form already declares
  * immaterial post-q9 — this spec pins that equivalence on real data
  * across ks, caps, and iteration counts.
  */
class IVFTrainParitySpec extends SparkSpec {

  private def both(emb: org.apache.spark.sql.DataFrame, k: Int,
                   iters: Int, cap: Long): (IVF.Index, IVF.Index) = {
    val driver = IVF.train(emb, k, iters, maxTrainRows = cap)
    IVF.forceDistributedLloyd.set(true)
    val dist =
      try IVF.train(emb, k, iters, maxTrainRows = cap)
      finally IVF.forceDistributedLloyd.set(false)
    (driver, dist)
  }

  test("driver-side Lloyd ≡ distributed Lloyd, bitwise, across shapes") {
    val emb = graft.sources.Tables.table(spark, sf0001, "embeddings")
    for ((k, iters, cap) <- Seq((4, 5, 400L), (8, 5, 800L), (4, 3, 64L),
        (16, 5, 1000L), (2, 1, 2L))) {
      val (driver, dist) = both(emb, k, iters, cap)
      assert(driver.k == dist.k, s"k mismatch at ($k,$iters,$cap)")
      driver.centroids.zip(dist.centroids).zipWithIndex.foreach {
        case ((a, b), c) =>
          assert(a.length == b.length, s"dim mismatch cell $c")
          a.zip(b).zipWithIndex.foreach { case ((x, y), d) =>
            assert(java.lang.Double.doubleToLongBits(x) ==
                java.lang.Double.doubleToLongBits(y),
              s"centroid drift at ($k,$iters,$cap) cell $c dim $d: $x vs $y")
          }
      }
    }
  }

  test("driver-side Lloyd ≡ distributed on a shifted/filtered slice") {
    val emb = graft.sources.Tables.table(spark, sf0001, "embeddings")
      .filter(col("vec_id") % 3 =!= 1)
    val (driver, dist) = both(emb, 4, 5, 300L)
    driver.centroids.zip(dist.centroids).foreach { case (a, b) =>
      assert(a.sameElements(b))
    }
  }
}
