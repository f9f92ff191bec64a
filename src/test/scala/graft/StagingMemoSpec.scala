package graft

import org.apache.spark.sql.functions._

import graft.datapipe.Staging

/** Contracts of the session-scoped memoized staging behind the
  * cluster-family entries: one build per (session, key) while live,
  * a releaseAll voids the memo (bench timings still pay full cost),
  * and distinct keys never alias.
  */
class StagingMemoSpec extends SparkSpec {

  test("memo builds once per key while staged, rebuilds after releaseAll") {
    var builds = 0
    def build() = { builds += 1; spark.range(10).toDF("n") }
    val a = Staging.memo(spark, "memo-spec-a")(build())
    val b = Staging.memo(spark, "memo-spec-a")(build())
    assert(builds === 1, "second lookup must reuse the staged frame")
    assert(a eq b, "the SAME staged frame comes back while live")
    assert(Staging.isLive(a), "the memoized frame must be staged live")

    Staging.releaseAll()
    assert(!Staging.isLive(a),
      "releaseAll must release the memoized frame's storage")
    val c = Staging.memo(spark, "memo-spec-a")(build())
    assert(builds === 2, "a voided memo must rebuild")
    assert(Staging.isLive(c))
    Staging.releaseAll()
  }

  test("distinct keys build distinct frames") {
    val a = Staging.memo(spark, "memo-spec-x")(spark.range(1).toDF("n"))
    val b = Staging.memo(spark, "memo-spec-y")(
      spark.range(2).select(col("id").as("n")))
    assert(!(a eq b))
    assert(a.count() === 1L && b.count() === 2L)
    Staging.releaseAll()
  }

  test("the cluster-family entries share one pair pipeline per session " +
    "and stay independently correct after a release") {
    Staging.releaseAll()
    // first entry builds the memoized pair table; the second must
    // reuse it (same staged frame underneath) and produce the same
    // clusters it would standalone
    val standalone = SparkEntry.queries("dedup_clusters")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    Staging.releaseAll()
    val sizesFirst = SparkEntry.queries("dedup_cluster_sizes")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val clustersAfterShared = SparkEntry.queries("dedup_clusters")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(clustersAfterShared === standalone,
      "sharing the staged pair table must not change results")
    Staging.releaseAll()
    val sizesStandalone = SparkEntry.queries("dedup_cluster_sizes")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(sizesFirst === sizesStandalone)
    Staging.releaseAll()
  }
}
