package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal/interval join operators Spark lacks as built-ins, composed
  * from shuffles the engine already optimizes (preference (a) of the
  * custom-operator ladder: compose existing ops before dropping to a
  * custom SparkPlan).
  */
object Joins {

  /** Backward as-of join: for every left row, the LATEST right row
    * with the same key and `rightTime <= leftTime` (the "state of the
    * credential dim when the trade happened" lookup).
    *
    * Shape: union both sides tagged, ONE shuffle on (key) with a
    * (time, side) sort, then `last(payload, ignoreNulls)` over an
    * unbounded-preceding window carries each right payload forward to
    * the left rows it governs. O(n log n) in the partition — never
    * the O(|left| x |right|) blowup of the naive inequality join —
    * and skew follows the key distribution exactly like any windowed
    * aggregation (salt the key if one key dominates). Right rows
    * sort BEFORE left rows at equal timestamps, so an update taking
    * effect at exactly the event time is visible to it.
    *
    * `rightCols` become nullable columns on the output: null = no
    * right row at or before the left row's time (ASOF LEFT JOIN
    * semantics).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightCols: Seq[String]): DataFrame = {
    val payload = struct(rightCols.map(col): _*).as("_payload")
    val payloadType = right.select(payload).schema.head.dataType
    val l = left
      .withColumn("_ts", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_payload", lit(null).cast(payloadType))
    val r = right
      .select(col(key), col(rightTime).as("_ts"), lit(0).as("_side"), payload)
    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("_asof", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.map(col).toSeq ++
        rightCols.map(c => col("_asof").getField(c).as(c)): _*)
  }

  /** Point-in-interval range join via bucketing: intervals explode
    * into the fixed-width buckets they overlap, points join on their
    * bucket EQUI-key, and the exact containment predicate re-checks
    * inside the bucket. With `bucketWidth >= max interval length`
    * each interval lands in at most 2 buckets, so the join is a
    * near-equi join of |points| + 2|intervals| rows — not the
    * O(|points| x |intervals|) nested loop Spark plans for a raw
    * inequality join. Exact: every containing pair shares the
    * point's bucket.
    */
  def bucketedRangeJoin(points: DataFrame, pointCol: String,
                        intervals: DataFrame, loCol: String, hiCol: String,
                        bucketWidth: Long): DataFrame = {
    val p = points.withColumn("_bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val i = intervals.withColumn("_bucket",
      explode(sequence(floor(col(loCol) / bucketWidth).cast("long"),
        floor((col(hiCol) - 1) / bucketWidth).cast("long"))))
    p.join(i, Seq("_bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bucket")
  }
}
