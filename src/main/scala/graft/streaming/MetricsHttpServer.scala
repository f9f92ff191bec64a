package graft.streaming

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Scrape-able `/metrics` endpoint over [[PrometheusExposition]] —
  * the HTTP tail of the reference's K4 metrics surface: every
  * reference service exposes prometheus_client's text format on its
  * own port (the consumer's `/metrics` on 9001 at
  * kafka_consumer/app/main.py:52, metric families defined in
  * kafka_consumer/app/metrics/metrics.py:41-136). Here one handler
  * serves whatever family snapshot the supplied thunk renders — the
  * engine's counters arrive through `observe()` →
  * [[ObservedMetricsListener]] → `PrometheusExposition.countersFrom`,
  * so a scraper pointed at this port sees live values as streaming
  * batches commit.
  *
  * JDK-built-in `com.sun.net.httpserver` — no dependency; a real
  * deployment would mount the same thunk behind the cluster's
  * serving stack. `port = 0` binds an ephemeral port (tests);
  * `boundPort` reports it. Content type matches the Python client's
  * `text/plain; version=0.0.4; charset=utf-8`. Any path other than
  * `/metrics` (and `/healthz`, mirroring the reference services'
  * liveness route) is 404.
  *
  * Binds LOOPBACK by default: the reference services bind 0.0.0.0,
  * but they run inside a compose network namespace — an
  * unauthenticated wildcard bind on a host JVM would expose
  * /metrics on every interface. A deployment that wants a scrape
  * network passes `bindAddress = "0.0.0.0"` explicitly.
  *
  * RELEASE NOTE (breaking default since the r13 hardening): earlier
  * builds bound all interfaces; an existing deployment scraping
  * /metrics from another host silently loses connectivity on
  * upgrade until it passes `bindAddress = "0.0.0.0"`.
  */
final class MetricsHttpServer(
    snapshot: () => Seq[PrometheusExposition.Family],
    port: Int = 9001,
    bindAddress: String = "127.0.0.1") extends AutoCloseable {

  private val server: HttpServer =
    HttpServer.create(
      new InetSocketAddress(
        java.net.InetAddress.getByName(bindAddress), port), 0)

  private def respond(ex: HttpExchange, code: Int, contentType: String,
                      body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os: OutputStream = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  server.createContext("/metrics", new HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      // HttpServer context matching is raw string-prefix: without
      // this check /metricsfoo and /metrics/x would also serve the
      // payload, breaking the documented exact-path contract.
      if (ex.getRequestURI.getPath != "/metrics")
        respond(ex, 404, "text/plain; charset=utf-8",
          s"not found: ${ex.getRequestURI.getPath}\n")
      else
        try respond(ex, 200, "text/plain; version=0.0.4; charset=utf-8",
          PrometheusExposition.render(snapshot()))
        catch { case e: Throwable =>
          respond(ex, 500, "text/plain; charset=utf-8",
            s"render failed: ${e.getClass.getSimpleName}")
        }
  })
  // the reference services all answer a liveness probe next to
  // /metrics; 404 everywhere else
  server.createContext("/", new HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      ex.getRequestURI.getPath match {
        case "/healthz" => respond(ex, 200, "text/plain; charset=utf-8", "ok\n")
        case p => respond(ex, 404, "text/plain; charset=utf-8",
          s"not found: $p\n")
      }
  })
  server.start()

  /** The actual bound port (differs from the requested one only when
    * constructed with port 0). */
  def boundPort: Int = server.getAddress.getPort

  override def close(): Unit = server.stop(0)
}
