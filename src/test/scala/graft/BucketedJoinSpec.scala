package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Co-located join via bucketing — the 100 TB fact-to-fact join
  * strategy: both tables bucketed by the join key at write time join
  * WITHOUT a shuffle (no Exchange over the scans), because the
  * bucketed layout already provides the required partitioning. This
  * spec pins that contract so a regression in our session config
  * (e.g. bucketing disabled) is caught.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans no Exchange") {
    val wh = Files.createTempDirectory("graft-warehouse").toString
    // AQE rewrites make the plan-shape assertion indirect; the
    // bucketing contract is visible in the non-adaptive plan. The
    // broadcast threshold is zeroed because the contract under test
    // is the FACT-TO-FACT case where neither side broadcasts.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val events = spark.read.parquet(s"$sf/events.parquet")
        .select(col("event_id"), col("user_id"), col("value"))
      events.write.mode("overwrite")
        .bucketBy(8, "user_id").sortBy("user_id")
        .option("path", s"$wh/ev_a").saveAsTable("ev_a")
      events.write.mode("overwrite")
        .bucketBy(8, "user_id").sortBy("user_id")
        .option("path", s"$wh/ev_b").saveAsTable("ev_b")
      val joined = spark.table("ev_a").alias("a")
        .join(spark.table("ev_b").alias("b"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle; plan:\n${plan.take(1500)}")
      // and it still computes the right thing
      val n = joined.count()
      val expected = events.groupBy(col("user_id")).count()
        .agg(sum(col("count") * col("count"))).collect()(0).getLong(0)
      assert(n === expected)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS ev_a")
      spark.sql("DROP TABLE IF EXISTS ev_b")
    }
  }
}
