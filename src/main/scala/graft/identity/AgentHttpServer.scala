package graft.identity

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** In-process credential-agent HTTP server — the zero-egress stand-in
  * for the reference's Veramo agent + verifier pair, exposing the two
  * routes its consumers actually call per record:
  *
  *  - `POST /agent/createVerifiableCredential` — body
  *    `{"payload": <json-string>}` → `{"jwt": "<compact JWT>"}`
  *    (the agent's sign route,
  *    veramo-agent/src/app/veramo_server.ts:56-79; Go client
  *    data_synthesizer/service/veramo/veramo_client.go:30-118);
  *  - `POST /agent/verifyCredential` — body `{"jwt": "<compact JWT>"}`
  *    → `{"verified": true|false}` (the verifier's route,
  *    veramo-verifier/src/server.ts:500-539; Python client
  *    kafka_consumer/app/handlers/veramo_client.py:86-117).
  *
  * The crypto behind the routes is the SAME deterministic [[Jwt]]
  * HS256 the in-process [[CredentialOps]] column functions use, so
  * the HTTP hop is observationally identical to the in-process path
  * — which is exactly what HttpCredentialOpsSpec certifies
  * row-for-row. A malformed body or unknown route answers 400/404
  * with `{"error": …}`; a malformed JWT verifies `false` (200), the
  * verifier's public behavior.
  *
  * Built on the JDK's `com.sun.net.httpserver` (the
  * [[graft.model.SchemaRegistryServer]] pattern): no dependency, no
  * egress, loopback bind only — same hardening rationale as
  * [[graft.streaming.MetricsHttpServer]]. `port = 0` binds an
  * ephemeral port (tests); `boundPort` reports it.
  */
final class AgentHttpServer(secret: String = CredentialOps.DefaultSecret,
                            port: Int = 0,
                            delayMs: Long = 0) extends AutoCloseable {

  private val mapper = new ObjectMapper

  // concurrency observatory: lets a spec PROVE a client's in-flight
  // window — `delayMs` holds each request open long enough for
  // overlap to be observable on loopback (0 in production use)
  private val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
  private val inFlightMax = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Highest number of requests this server ever handled at once. */
  def maxObservedConcurrency: Int = inFlightMax.get()

  private val server: HttpServer =
    HttpServer.create(
      new InetSocketAddress(
        java.net.InetAddress.getByName("127.0.0.1"), port), 0)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  private def handler(route: String => String): HttpHandler =
    new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val cur = inFlight.incrementAndGet()
        inFlightMax.updateAndGet(m => math.max(m, cur))
        try {
          if (delayMs > 0) Thread.sleep(delayMs)
          if (ex.getRequestMethod != "POST")
            respond(ex, 405, """{"error":"POST only"}""")
          else respond(ex, 200, route(readBody(ex)))
        } catch {
          case e: Throwable =>
            respond(ex, 400,
              s"""{"error":${mapper.writeValueAsString(
                Option(e.getMessage).getOrElse(e.getClass.getSimpleName))}}""")
        } finally inFlight.decrementAndGet()
      }
    }

  server.createContext("/agent/createVerifiableCredential", handler { body =>
    val node = mapper.readTree(body)
    require(node.hasNonNull("payload"), "missing payload")
    val out = mapper.createObjectNode()
    out.put("jwt", Jwt.sign(node.get("payload").asText, secret))
    mapper.writeValueAsString(out)
  })

  server.createContext("/agent/verifyCredential", handler { body =>
    val node = mapper.readTree(body)
    val jwt = if (node.hasNonNull("jwt")) node.get("jwt").asText else null
    val out: ObjectNode = mapper.createObjectNode()
    out.put("verified", Jwt.verify(jwt, secret))
    mapper.writeValueAsString(out)
  })

  // bounded worker pool — the reference agent serves a fixed-size
  // connection pool (50 total / 25 per host, veramo_client.py:24-44);
  // 8 server threads comfortably saturate a local[32] client running
  // one in-flight request per partition
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
  server.setExecutor(pool)
  server.start()

  def boundPort: Int = server.getAddress.getPort

  /** Base endpoint, e.g. `http://127.0.0.1:PORT`. */
  def endpoint: String = s"http://127.0.0.1:$boundPort"

  override def close(): Unit = {
    server.stop(0)
    // stop(0) detaches the executor but never shuts it down — without
    // this, every server instance leaks its 8 pool threads (r14 advice)
    pool.shutdown()
  }
}
