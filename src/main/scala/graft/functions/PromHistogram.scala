package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Prometheus-style cumulative fixed-bucket histogram as a typed
  * Spark [[Aggregator]] (SURVEY.md §2.6 A2 — the one custom
  * Catalyst-adjacent piece parity needs).
  *
  * The reference's latency/size distributions are Prometheus
  * Histograms with hard-coded bucket edges (e.g. e2e latency buckets
  * 0.1..300 s at kafka_consumer/app/metrics/metrics.py:55-60, payload
  * sizes 256·2^k at data_synthesizer/service/metrics/metrics.go:57-62).
  * A Prometheus bucket `le=x` is CUMULATIVE: count of observations
  * <= x, with a final `+Inf` bucket equal to the total count. This
  * aggregator reproduces that exactly: the merge is a vector add, so
  * it distributes over partitions with map-side partial aggregation
  * (one Array[Long] per group per partition — constant state, safe at
  * 100 TB).
  *
  * Output is an ordered list of (le-label, cumulative count) pairs,
  * ready to `explode` into rows.
  */
class PromHistogram(val buckets: Array[Double], val labels: Array[String])
    extends Aggregator[Double, Array[Long], Seq[(String, Long)]] {
  require(buckets.length + 1 == labels.length,
    "labels must cover every bucket plus +Inf")
  require(buckets.sameElements(buckets.sorted), "buckets must be ascending")

  override def zero: Array[Long] = new Array[Long](buckets.length + 1)

  override def reduce(buf: Array[Long], v: Double): Array[Long] = {
    // Non-cumulative during accumulation (single increment), made
    // cumulative once at finish — cheaper than updating a suffix.
    var i = 0
    while (i < buckets.length && v > buckets(i)) i += 1
    buf(i) += 1
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[(String, Long)] = {
    var cum = 0L
    labels.indices.map { i => cum += buf(i); (labels(i), cum) }
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}

object PromHistogram {
  /** Reference e2e-latency bucket edges (metrics.py:59). */
  val LatencyBuckets: Array[Double] =
    Array(0.1, 0.5, 1, 2, 5, 10, 30, 60, 120, 300)

  /** Column form: promHistogram(col) → array<struct<le, cum_count>>. */
  def column(buckets: Array[Double], labels: Array[String], c: Column): Column =
    udaf(new PromHistogram(buckets, labels),
      org.apache.spark.sql.Encoders.scalaDouble)(c)
}
