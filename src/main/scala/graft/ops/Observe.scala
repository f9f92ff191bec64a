package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A5/K4: `observe()` instrumentation — the engine's counterpart of
  * the reference's Prometheus counters
  * (kafka_consumer/app/metrics/metrics.py:41-136: messages consumed /
  * dropped, join-miss errors, verification results).
  *
  * `observe()` attaches named aggregates to the plan as a
  * CollectMetrics node: the values are folded INLINE during whatever
  * action runs the query — no second pass, no extra shuffle, safe at
  * any scale. Batch readers pick them up from
  * `df.queryExecution.observedMetrics` (or a QueryExecutionListener);
  * streaming queries surface them per micro-batch in
  * `StreamingQueryProgress.observedMetrics` — see
  * [[graft.streaming.ObservedMetricsListener]].
  */
object Observe {

  val P1Name = "p1_parse_metrics"
  val J1Name = "j1_miss_metrics"
  val U2Name = "u2_verify_metrics"

  /** P1 drop counters (metrics.py:41-50 messages_consumed/dropped):
    * attach BEFORE the route filter so dropped records are counted.
    */
  def parseMetrics(df: DataFrame, typeCol: String, keep: Seq[String]): DataFrame =
    df.observe(P1Name,
      count(lit(1)).as("n_total"),
      sum(when(col(typeCol).isin(keep: _*), 0L).otherwise(1L)).as("n_dropped"))

  /** J1 join-miss counter (the reference errors trades missing from
    * the credential dim, trade_handler.go:72-77): attach to the
    * anti-join output, where every row IS a miss.
    */
  def missMetrics(antiJoined: DataFrame): DataFrame =
    antiJoined.observe(J1Name, count(lit(1)).as("n_miss"))

  /** U2 verification result counters (metrics.py:133-136
    * credential_verifications_total by result label).
    */
  def verifyMetrics(df: DataFrame, verifiedCol: String): DataFrame =
    df.observe(U2Name,
      sum(when(col(verifiedCol), 1L).otherwise(0L)).as("n_verified"),
      sum(when(!col(verifiedCol), 1L).otherwise(0L)).as("n_failed"))
}
