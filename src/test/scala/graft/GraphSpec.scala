package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replay of the operator's exact integer recurrence —
    * the equality oracle for arbitrary small graphs. */
  private def ref(edges: Set[(Long, Long)], iters: Int,
                  scale: Long): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSeq.sorted
    val n = nodes.size
    val out = edges.groupBy(_._1).map { case (k, v) => k -> v.size }
    var r = nodes.map(_ -> scale).toMap
    val base = 15L * scale / 100L
    for (_ <- 1 to iters) {
      val shares = r.map { case (u, ru) =>
        u -> out.get(u).map(d => ru / d).getOrElse(0L) }
      // NB: stay on Seq — summing via Set would collapse equal shares
      val dmass = r.toSeq.collect { case (u, ru) if !out.contains(u) => ru }.sum
      r = nodes.map { v =>
        val inflow = edges.toSeq.collect { case (u, d) if d == v => shares(u) }.sum
        v -> (base + 85L * (inflow + dmass / n) / 100L)
      }.toMap
    }
    r
  }

  private def run(edges: Set[(Long, Long)], iters: Int = 5,
                  parts: Int = 1): Map[Long, Long] = {
    val df = edges.toSeq.toDF("src", "dst")
    Graph.pageRank(if (parts > 1) df.repartition(parts) else df, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("pageRank equals the driver replay of the integer recurrence") {
    // a mixed graph: cycle, chord, dangling sink, multi-in-degree hub
    val edges = Set[(Long, Long)](
      (1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 3L), (5L, 3L), (3L, 6L))
    assert(run(edges) === ref(edges, 5, 1000000000L))
    assert(run(edges, iters = 1) === ref(edges, 1, 1000000000L))
  }

  test("pageRank: hub out-ranks leaves; repartitioning changes nothing") {
    val star = (1L to 8L).map(i => (i, 0L)).toSet // 0 is a dangling hub
    val got = run(star)
    assert((1L to 8L).forall(i => got(0L) > got(i)),
      "the sink hub must dominate every pointing leaf")
    assert(got === run(star, parts = 7), "integer ranks are partitioning-invariant")
    assert(got === ref(star, 5, 1000000000L))
  }

  test("pageRank conserves mass up to deterministic floor losses") {
    val edges = Set[(Long, Long)](
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (2L, 4L), (5L, 1L))
    val got = run(edges)
    val n = got.size
    val total = n * 1000000000L
    val floorLossBound = 5L * (n.toLong * 2 + 100) // per-iter: n divisions + damping
    assert(got.values.sum <= total)
    assert(got.values.sum >= total - floorLossBound,
      s"sum ${got.values.sum} lost more than floor rounding allows vs $total")
  }

  test("pageRank argument contracts") {
    val df = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](Graph.pageRank(df, iterations = 0))
    intercept[IllegalArgumentException](Graph.pageRank(df, iterations = 51))
    intercept[IllegalArgumentException](Graph.pageRank(df, scale = 10L))
    intercept[IllegalArgumentException](
      Graph.pageRank(Seq.empty[(Long, Long)].toDF("src", "dst")))
  }
}
