package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{MetricsHttpServer, PrometheusExposition}
import graft.streaming.PrometheusExposition._

/** K4 HTTP tail: an actual scrape of the `/metrics` endpoint must
  * return the 0.0.4 content type and a body that parses back into
  * the families the snapshot rendered — live values, not a cached
  * first render. (The reference consumer serves the same format on
  * port 9001, kafka_consumer/app/main.py:52.)
  */
class MetricsHttpServerSpec extends AnyFunSuite {

  private def get(port: Int, path: String): HttpResponse[String] = {
    val client = HttpClient.newHttpClient()
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
  }

  test("scraping /metrics returns the rendered families with the 0.0.4 content type") {
    // mutable value: the second scrape must observe the bump — the
    // handler renders a fresh snapshot per request
    var consumed = 42.0
    def families: Seq[Family] = Seq(
      Counter("kafka_messages_consumed_total", "Total messages consumed",
        Seq(Series(Seq("topic" -> "trades", "status" -> "success"), consumed))),
      HistogramF("message_end_to_end_latency_seconds", "e2e latency",
        Seq("did_provider" -> "did:key"),
        Seq("0.1" -> 3L, "1" -> 7L, "+Inf" -> 9L), valueSum = 12.25))
    val srv = new MetricsHttpServer(() => families, port = 0)
    try {
      val r = get(srv.boundPort, "/metrics")
      assert(r.statusCode() === 200)
      assert(r.headers().firstValue("Content-Type").orElse("") ===
        "text/plain; version=0.0.4; charset=utf-8")
      assert(r.body() === PrometheusExposition.render(families),
        "scrape body must equal the renderer's output byte-for-byte")
      // parse the families back out of the wire text
      val types = r.body().linesIterator
        .filter(_.startsWith("# TYPE ")).map(_.split(" ")).map(a => a(2) -> a(3))
        .toSeq
      assert(types === Seq(
        "kafka_messages_consumed_total" -> "counter",
        "message_end_to_end_latency_seconds" -> "histogram"))
      assert(r.body().contains(
        "kafka_messages_consumed_total{topic=\"trades\",status=\"success\"} 42.0"))

      consumed = 43.0
      val r2 = get(srv.boundPort, "/metrics")
      assert(r2.body().contains(
        "kafka_messages_consumed_total{topic=\"trades\",status=\"success\"} 43.0"),
        "second scrape must reflect the updated counter (no caching)")
    } finally srv.close()
  }

  test("/healthz answers ok; unknown paths 404") {
    val srv = new MetricsHttpServer(() => Seq.empty, port = 0)
    try {
      assert(get(srv.boundPort, "/healthz").statusCode() === 200)
      assert(get(srv.boundPort, "/nope").statusCode() === 404)
      // JDK HttpServer contexts are raw string-prefix matchers: both
      // of these land in the /metrics context and must still 404
      // (a scraper misconfigured with a trailing path should fail
      // loudly, not silently appear healthy)
      assert(get(srv.boundPort, "/metricsfoo").statusCode() === 404)
      assert(get(srv.boundPort, "/metrics/x").statusCode() === 404)
    } finally srv.close()
  }

  test("a snapshot thunk that throws yields 500, and the server survives") {
    var boom = true
    val srv = new MetricsHttpServer(
      () => if (boom) sys.error("render boom")
            else Seq(Gauge("g", "h", Seq(Series(Nil, 1.0)))), port = 0)
    try {
      assert(get(srv.boundPort, "/metrics").statusCode() === 500)
      boom = false
      val ok = get(srv.boundPort, "/metrics")
      assert(ok.statusCode() === 200 && ok.body().contains("g 1.0"))
    } finally srv.close()
  }
}
