package graft

import org.apache.spark.sql.functions._

import graft.ops.Joins

/** Temporal/interval joins: as-of picks the latest right row at or
  * before each left time (null before the first), and the bucketed
  * range join equals the naive inequality join exactly.
  */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asOfJoin: latest state at-or-before, null before first update") {
    val trades = Seq((1L, "k1", 5L), (2L, "k1", 10L), (3L, "k1", 20L),
      (4L, "k2", 7L), (5L, "k3", 9L))
      .toDF("trade_id", "sym", "t")
    val updates = Seq(("k1", 10L, "b"), ("k1", 15L, "c"), ("k1", 8L, "a"),
      ("k2", 1L, "x"))
      .toDF("sym", "ut", "state")
    val got = Joins.asOfJoin(trades, updates, "sym", "t", "ut",
      Seq("state", "ut"))
      .select(col("trade_id"), col("state"))
      .as[(Long, Option[String])].collect().toMap
    assert(got === Map(
      1L -> None,        // t=5 before first k1 update (ut=8)
      2L -> Some("b"),   // t=10 ties ut=10: update visible at its time
      3L -> Some("c"),   // latest <= 20 is ut=15
      4L -> Some("x"),
      5L -> None))       // k3 has no updates at all
  }

  test("bucketedRangeJoin equals the naive inequality join") {
    val pts = (0L until 200L).toDF("p")
    val ivs = Seq((0L, 10L, 25L), (1L, 24L, 30L), (2L, 150L, 151L),
      (3L, 190L, 210L), (4L, 60L, 60L)) // empty interval matches nothing
      .toDF("iv_id", "lo", "hi")
    val bucketed = Joins.bucketedRangeJoin(pts, "p", ivs, "lo", "hi", 32L)
      .select(col("iv_id"), col("p")).as[(Long, Long)].collect().toSet
    val naive = pts.crossJoin(ivs)
      .filter(col("p") >= col("lo") && col("p") < col("hi"))
      .select(col("iv_id"), col("p")).as[(Long, Long)].collect().toSet
    assert(bucketed === naive)
    assert(naive.nonEmpty)
  }
}
