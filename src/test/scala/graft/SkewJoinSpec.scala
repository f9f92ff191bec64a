package graft

import org.apache.spark.sql.functions._

/** AQE skew handling: a join where one key carries most rows must be
  * split at runtime (OptimizeSkewedJoin marks the join `skew=true`)
  * instead of funnelling the hot key through one reducer — the
  * engine-level half of the skew playbook (the operator-level half is
  * Sampling.saltedCounts).
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    try {
      // 50k rows, 90% on key 0 — one hot partition by construction
      val skewed = spark.range(50000)
        .select((when(col("id") % 10 === 0, col("id") % 100)
          .otherwise(lit(0L))).as("k"), col("id").as("payload"))
      val dim = spark.range(100).select(col("id").as("k"),
        concat(lit("v"), col("id")).as("label"))
      val joined = skewed.join(dim, "k")
      // collect() on THIS dataset: count() would spawn its own
      // QueryExecution and leave this one's AQE plan unfinalized
      assert(joined.collect().length === 50000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed join; plan:\n${plan.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
