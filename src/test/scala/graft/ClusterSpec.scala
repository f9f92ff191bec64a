package graft

import org.apache.spark.sql.functions._

import graft.datapipe.Dedup

/** Connected-component clustering over near-dup pairs: chains merge
  * to one min-label cluster, singletons stay their own cluster, and
  * keepOne retains exactly one representative per component.
  */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  test("chains collapse to the minimum id; singletons survive") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("id")
    // 1-2, 2-3, 3-4 form a diameter-3 chain; 5 pairs with nothing; 9 alone
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a_id", "b_id")
    val got = Dedup.clusters(docs, "id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 9L -> 9L))
  }

  test("keepOne keeps exactly one doc per component") {
    val docs = Seq(1L, 2L, 3L, 7L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id")
    val got = Dedup.keepOne(docs, "id", pairs)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === Set((1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (7L, 7L, true)))
  }
}
