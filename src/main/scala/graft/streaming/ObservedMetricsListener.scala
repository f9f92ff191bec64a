package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.StreamingQueryListener

/** K4: collects `observe()` metrics from streaming progress events —
  * the scrape endpoint of the engine's metric path (the reference
  * exposes the same counters via prometheus_client,
  * kafka_consumer/app/metrics/metrics.py:41-136).
  *
  * One Row is appended per (metric name, micro-batch); counters are
  * per-batch deltas, so totals are sums over a name's rows.
  */
final class ObservedMetricsListener extends StreamingQueryListener {

  private val metrics = new ConcurrentHashMap[String, List[Row]]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
    e.progress.observedMetrics.asScala.foreach { case (name, row) =>
      metrics.merge(name, List(row), (a, b) => a ++ b)
    }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  /** All per-batch rows observed under `name`, oldest first. */
  def rows(name: String): List[Row] = Option(metrics.get(name)).getOrElse(Nil)

  /** Sum of a bigint metric column across micro-batches. */
  def total(name: String, column: String): Long =
    rows(name).map(r => Option(r.getAs[Any](column))
      .fold(0L)(_.asInstanceOf[Long])).sum
}
