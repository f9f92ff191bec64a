package graft

import graft.functions.PromHistogram

class PromHistogramSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  val buckets = Array(1.0, 5.0, 10.0)
  val labels = Array("1", "5", "10", "+Inf")

  test("Prometheus le semantics: cumulative, boundary-inclusive") {
    val agg = new PromHistogram(buckets, labels)
    // boundary value 1.0 belongs to le=1 (v <= le), 1.0001 to le=5
    val buf = Seq(0.5, 1.0, 1.0001, 5.0, 10.0, 11.0)
      .foldLeft(agg.zero)(agg.reduce)
    val out = agg.finish(buf).toMap
    assert(out == Map("1" -> 2L, "5" -> 4L, "10" -> 5L, "+Inf" -> 6L))
  }

  test("merge distributes (map-side partial aggregation)") {
    val agg = new PromHistogram(buckets, labels)
    val left = Seq(0.1, 2.0).foldLeft(agg.zero)(agg.reduce)
    val right = Seq(7.0, 100.0).foldLeft(agg.zero)(agg.reduce)
    val out = agg.finish(agg.merge(left, right)).toMap
    assert(out("+Inf") == 4L && out("5") == 2L)
  }

  test("+Inf equals total count on real data") {
    import spark.implicits._
    val df = graft.sources.Tables.events(spark, sf)
    val hist = df.groupBy(col("event_type"))
      .agg(PromHistogram.column(Array(100.0), Array("100", "+Inf"),
        col("value")).as("h"))
      .select(explode(col("h")).as("e"))
      .filter(col("e._1") === "+Inf")
      .agg(sum(col("e._2"))).as[Long].head()
    assert(hist == df.count())
  }
}
