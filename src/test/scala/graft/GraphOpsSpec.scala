package graft

import org.apache.spark.sql.functions._

import graft.datapipe.GraphOps

/** Hand-computed PageRank on a 3-node graph, replaying the exact
  * rounding/decimal contract.
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def r8(x: Double) = BigDecimal(x)
    .setScale(8, BigDecimal.RoundingMode.HALF_UP)

  test("pagerank matches a driver-side replay on a 3-node graph") {
    // 1 → 2, 1 → 3, 2 → 3 ; 3 dangles (leaky variant)
    val vertices = Seq(1L, 2L, 3L).toDF("vid")
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val d = 0.85
    val teleport = (1.0 - d) / 3.0
    var r = Map(1L -> r8(1.0 / 3.0), 2L -> r8(1.0 / 3.0),
      3L -> r8(1.0 / 3.0))
    val out = Map(1L -> Seq(2L, 3L), 2L -> Seq(3L))
    val deg = Map(1L -> 2, 2L -> 1)
    for (_ <- 1 to 3) {
      val contribs = out.toSeq.flatMap { case (u, vs) =>
        vs.map(v => v -> r8(r(u).toDouble / deg(u)))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = r.keys.map(v => v -> r8(teleport +
        d * contribs.getOrElse(v, BigDecimal(0)).toDouble)).toMap
    }
    def r6(x: BigDecimal) = x.setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    val got = GraphOps.pagerank(vertices, edges, rounds = 3, damping = d)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
      .toSet
    assert(got === Set(
      (1L, 2L, r6(r(1L))), (2L, 1L, r6(r(2L))), (3L, 0L, r6(r(3L)))))
    // structure sanity: 3 receives from both 1 and 2 → highest rank;
    // 1 receives nothing → teleport-only minimum
    assert(r(3L) > r(2L) && r(2L) > r(1L))
  }

  test("pagerank total order is deterministic across reruns") {
    val vertices = (1L to 20L).toDF("vid")
    val edges = (1L to 20L).flatMap(i =>
      Seq((i, i % 20 + 1), (i, (i + 6) % 20 + 1))).toDF("src", "dst")
    def run() = GraphOps.pagerank(vertices, edges).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(run() === run())
  }
}
