package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Observe
import graft.streaming.{ObservedMetricsListener, PrometheusExposition, Streams}
import graft.streaming.PrometheusExposition._

/** K4 exposition: the text format must render exactly (headers,
  * label escaping, Python-client value style, cumulative histogram
  * triplet) and must round-trip the engine's observed counter values
  * — scrape output == listener totals == batch ground truth.
  */
class PrometheusExpositionSpec extends AnyFunSuite {

  test("counter family renders headers, labels, and N.0 values exactly") {
    val out = render(Seq(Counter(
      "kafka_messages_consumed_total",
      "Total number of messages consumed from Kafka",
      Seq(
        Series(Seq("topic" -> "trades", "status" -> "success",
          "did_provider" -> "did:key"), 42.0),
        Series(Seq("topic" -> "trades", "status" -> "error",
          "did_provider" -> "did:key"), 0.0)))))
    assert(out ===
      "# HELP kafka_messages_consumed_total Total number of messages consumed from Kafka\n" +
      "# TYPE kafka_messages_consumed_total counter\n" +
      "kafka_messages_consumed_total{topic=\"trades\",status=\"success\",did_provider=\"did:key\"} 42.0\n" +
      "kafka_messages_consumed_total{topic=\"trades\",status=\"error\",did_provider=\"did:key\"} 0.0\n")
  }

  test("label values escape quotes, backslashes, newlines") {
    val out = render(Seq(Gauge("g", "h",
      Seq(Series(Seq("l" -> "a\"b\\c\nd"), 1.5)))))
    assert(out.contains("""g{l="a\"b\\c\nd"} 1.5"""))
  }

  test("histogram renders the cumulative bucket/sum/count triplet") {
    val out = render(Seq(HistogramF(
      "message_end_to_end_latency_seconds", "e2e",
      Seq("did_provider" -> "did:web"),
      Seq("0.1" -> 3L, "1" -> 7L, "+Inf" -> 9L), valueSum = 12.25)))
    val lines = out.linesIterator.toSeq
    assert(lines(1) === "# TYPE message_end_to_end_latency_seconds histogram")
    assert(lines(2) ===
      "message_end_to_end_latency_seconds_bucket{did_provider=\"did:web\",le=\"0.1\"} 3.0")
    assert(lines(4) ===
      "message_end_to_end_latency_seconds_bucket{did_provider=\"did:web\",le=\"+Inf\"} 9.0")
    assert(lines(5) ===
      "message_end_to_end_latency_seconds_sum{did_provider=\"did:web\"} 12.25")
    assert(lines(6) ===
      "message_end_to_end_latency_seconds_count{did_provider=\"did:web\"} 9.0")
  }

  test("+Inf bucket edges and non-integral values render Prometheus-style") {
    assert(renderValue(Double.PositiveInfinity) === "+Inf")
    assert(renderValue(3.0) === "3.0")
    assert(renderValue(0.001) === "0.001")
  }

  test("exposition round-trips the streaming observe() counters (K4)") {
    val spark = SparkSpec.session
    val sf = "/root/testdata/sf0.001"
    val listener = new ObservedMetricsListener
    spark.streams.addListener(listener)
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft-prom").toString
      val keep = Seq("click", "view", "purchase", "signup")
      val stream = Observe.parseMetrics(
        Streams.eventsFileStream(spark, sf), "event_type", keep)
      val q = Streams.runToParquet(
        Streams.tumblingCounts(stream), s"$dir/out", s"$dir/chk")
      q.awaitTermination()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (listener.rows(Observe.P1Name).isEmpty && System.nanoTime() < deadline)
        Thread.sleep(100)

      val labels = Seq("topic" -> "events", "did_provider" -> "did:key")
      val fam = countersFrom(listener, Observe.P1Name,
        "kafka_messages_consumed_total", "messages consumed",
        Seq("n_total" -> (labels :+ ("status" -> "total")),
          "n_dropped" -> (labels :+ ("status" -> "dropped"))))
      val text = render(Seq(fam))

      // parse the exposition back and compare with batch ground truth
      val vals = text.linesIterator.filterNot(_.startsWith("#")).map { l =>
        val Array(k, v) = l.split("} ")
        k.split("status=\"")(1).stripSuffix("\"") -> v.toDouble
      }.toMap
      val events = graft.sources.Tables.events(spark, sf)
      val total = events.count().toDouble
      val dropped =
        events.filter(!col("event_type").isin(keep: _*)).count().toDouble
      assert(vals("total") === total)
      assert(vals("dropped") === dropped)
    } finally spark.streams.removeListener(listener)
  }
}
