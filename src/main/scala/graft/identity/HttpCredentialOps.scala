package graft.identity

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{BooleanType, StringType}

import com.fasterxml.jackson.databind.ObjectMapper

/** U1/U2 over a REAL HTTP hop — the fidelity variant of
  * [[CredentialOps]]'s in-process column functions, matching the
  * reference's defining expensive operator: per-record sign/verify
  * against a pooled HTTP client (sign:
  * data_synthesizer/service/veramo/veramo_client.go:30-118; verify:
  * kafka_consumer/app/handlers/veramo_client.py:86-117 with pool
  * config :24-44 — 50 connections / 25 per host, keep-alive).
  *
  * Shape: `mapPartitions` with a lazily-initialized per-JVM
  * [[HttpAgentClient]] (the seam [[Jwt]]'s scaladoc promises). The
  * JDK `java.net.http.HttpClient` is thread-safe and pools
  * keep-alive connections per destination internally, so ONE client
  * per executor JVM serves every partition — the per-partition
  * lazy access only pays construction once, exactly the reference
  * client's `PoolManager` semantics. [[signJwtHttp]]/[[verifyJwtHttp]]
  * issue requests sequentially within a partition (the reference's
  * `processing_mode=sync` consumers are per-record synchronous);
  * the `...Async` twins replay `processing_mode=async` — a bounded
  * in-flight window of `sendAsync` futures per partition, the
  * reference's semaphore-25 pipeline
  * (kafka_event_handler.py:55-64,315-355) — with byte-identical
  * output (FIFO emit order). Cross-partition parallelism multiplies
  * either mode by `spark.default.parallelism`.
  *
  * Failure contract: a non-200 response or transport error retries
  * 3× with linear backoff, then THROWS — a signing/verification
  * outage must fail the job loudly, never silently pass rows
  * through unsigned/unverified.
  *
  * These are deliberately NOT column expressions: a UDF hides the
  * network hop from the planner and from anyone reading the plan;
  * the explicit mapPartitions names the boundary where the
  * distributed crypto RPC happens, and the output is row-identical
  * to the in-process path (HttpCredentialOpsSpec certifies this
  * batch AND streaming against [[AgentHttpServer]]).
  */
object HttpCredentialOps {

  /** U1 over HTTP: append `outCol` = compact JWT of `payloadCol`,
    * one POST per record against
    * `{endpoint}/agent/createVerifiableCredential`.
    */
  def signJwtHttp(df: DataFrame, payloadCol: String, outCol: String,
                  endpoint: String): DataFrame = {
    val schema = df.schema.add(outCol, StringType, nullable = true)
    val idx = df.schema.fieldIndex(payloadCol)
    val url = s"$endpoint/agent/createVerifiableCredential"
    df.mapPartitions { it =>
      it.map { row =>
        val payload = row.getString(idx)
        val jwt =
          if (payload == null) null
          else HttpAgentClient.postJson(url,
            HttpAgentClient.obj("payload", payload), "jwt").asText
        Row.fromSeq(row.toSeq :+ jwt)
      }
    }(Encoders.row(schema))
  }

  /** U2 over HTTP: append `outCol` = verified boolean of `jwtCol`,
    * one POST per record against `{endpoint}/agent/verifyCredential`.
    * A NULL jwt verifies false (the in-process [[Jwt.verify]]
    * contract).
    */
  def verifyJwtHttp(df: DataFrame, jwtCol: String, outCol: String,
                    endpoint: String): DataFrame = {
    val schema = df.schema.add(outCol, BooleanType, nullable = false)
    val idx = df.schema.fieldIndex(jwtCol)
    val url = s"$endpoint/agent/verifyCredential"
    df.mapPartitions { it =>
      it.map { row =>
        val verified = HttpAgentClient.postJson(url,
          HttpAgentClient.obj("jwt", row.getString(idx)), "verified")
          .asBoolean
        Row.fromSeq(row.toSeq :+ verified)
      }
    }(Encoders.row(schema))
  }

  /** U1 in the reference's ASYNC processing mode: `sendAsync` with a
    * bounded in-flight window per partition — the fidelity twin of
    * the async consumer's semaphore-25 pipeline
    * (kafka_event_handler.py:55-64,315-355: 12 workers each holding
    * ≤ 25 concurrent agent calls). The window is a FIFO of
    * CompletableFutures: requests launch until `maxInFlight` are
    * outstanding, then the OLDEST must complete before the next row
    * is emitted — so output row order (and therefore every
    * downstream result) is byte-identical to the sequential path,
    * while the agent sees up to partitions × maxInFlight overlapping
    * requests (HttpCredentialOpsSpec observes the bound on the
    * server). Failure contract unchanged: each request retries 3×
    * with backoff (async-chained, never blocking a pool thread) and
    * a final failure throws at the emit point.
    */
  def signJwtHttpAsync(df: DataFrame, payloadCol: String, outCol: String,
                       endpoint: String, maxInFlight: Int = 25): DataFrame = {
    require(maxInFlight >= 1, s"maxInFlight >= 1; got $maxInFlight")
    val schema = df.schema.add(outCol, StringType, nullable = true)
    val idx = df.schema.fieldIndex(payloadCol)
    val url = s"$endpoint/agent/createVerifiableCredential"
    df.mapPartitions { it =>
      boundedWindow(it, maxInFlight)(
        row => {
          val payload = row.getString(idx)
          if (payload == null)
            java.util.concurrent.CompletableFuture.completedFuture(
              null: com.fasterxml.jackson.databind.JsonNode)
          else HttpAgentClient.postJsonAsync(url,
            HttpAgentClient.obj("payload", payload), "jwt")
        },
        (row, node) =>
          Row.fromSeq(row.toSeq :+ (if (node == null) null else node.asText)))
    }(Encoders.row(schema))
  }

  /** U2 in async mode — see [[signJwtHttpAsync]]. */
  def verifyJwtHttpAsync(df: DataFrame, jwtCol: String, outCol: String,
                         endpoint: String, maxInFlight: Int = 25): DataFrame = {
    require(maxInFlight >= 1, s"maxInFlight >= 1; got $maxInFlight")
    val schema = df.schema.add(outCol, BooleanType, nullable = false)
    val idx = df.schema.fieldIndex(jwtCol)
    val url = s"$endpoint/agent/verifyCredential"
    df.mapPartitions { it =>
      boundedWindow(it, maxInFlight)(
        row => HttpAgentClient.postJsonAsync(url,
          HttpAgentClient.obj("jwt", row.getString(idx)), "verified"),
        (row, node) => Row.fromSeq(row.toSeq :+ node.asBoolean))
    }(Encoders.row(schema))
  }

  /** The bounded-in-flight pipeline: launch up to `maxInFlight`
    * requests ahead of the emit point, emit strictly in input order.
    * The refill happens before every emit, so the window stays full
    * whenever rows remain — the semaphore pattern without a
    * semaphore (the FIFO bound IS the permit count).
    */
  private def boundedWindow(it: Iterator[Row], maxInFlight: Int)(
      start: Row => java.util.concurrent.CompletableFuture[
        com.fasterxml.jackson.databind.JsonNode],
      finish: (Row, com.fasterxml.jackson.databind.JsonNode) => Row)
      : Iterator[Row] = {
    val pending = new java.util.ArrayDeque[(Row,
      java.util.concurrent.CompletableFuture[
        com.fasterxml.jackson.databind.JsonNode])]()
    new Iterator[Row] {
      override def hasNext: Boolean = !pending.isEmpty || it.hasNext
      override def next(): Row = {
        while (it.hasNext && pending.size < maxInFlight) {
          val row = it.next()
          pending.addLast((row, start(row)))
        }
        val (row, fut) = pending.pollFirst()
        finish(row, HttpAgentClient.joinUnwrapped(fut))
      }
    }
  }
}

/** The per-JVM pooled HTTP client (reference pool semantics:
  * veramo_client.py:24-44 — bounded pool, keep-alive). Lazy so an
  * executor that never runs an HTTP credential partition never
  * builds one; one instance serves every partition in the JVM.
  */
object HttpAgentClient {

  private val mapper = new ObjectMapper

  lazy val client: HttpClient = HttpClient.newBuilder()
    .version(HttpClient.Version.HTTP_1_1) // keep-alive pooled
    .connectTimeout(Duration.ofSeconds(5))
    .build()

  def obj(field: String, value: String): String = {
    val n = mapper.createObjectNode()
    n.put(field, value)
    mapper.writeValueAsString(n)
  }

  /** POST `bodyJson`, parse the response, return `field`. Retries
    * 3× (50/100/150 ms backoff) then throws.
    */
  def postJson(url: String, bodyJson: String,
               field: String): com.fasterxml.jackson.databind.JsonNode = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(10))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(bodyJson, StandardCharsets.UTF_8))
      .build()
    var attempt = 0
    var last: Throwable = null
    while (attempt < 3) {
      try {
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() == 200) {
          val node = mapper.readTree(resp.body())
          require(node.has(field), s"agent response missing '$field': ${resp.body().take(200)}")
          return node.get(field)
        }
        last = new java.io.IOException(
          s"agent HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
      } catch { case e: java.io.IOException => last = e }
      attempt += 1
      if (attempt < 3) Thread.sleep(50L * attempt)
    }
    throw new java.io.IOException(
      s"credential agent unreachable after 3 attempts: $url", last)
  }

  /** Async [[postJson]]: same request, same 3×-retry-then-fail
    * contract, built on `sendAsync` so a waiting request never
    * occupies a thread — the retry backoff chains through
    * `delayedExecutor` rather than sleeping.
    */
  def postJsonAsync(url: String, bodyJson: String, field: String)
      : java.util.concurrent.CompletableFuture[
        com.fasterxml.jackson.databind.JsonNode] = {
    import java.util.concurrent.CompletableFuture
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(10))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(bodyJson, StandardCharsets.UTF_8))
      .build()
    def attempt(n: Int): CompletableFuture[com.fasterxml.jackson.databind.JsonNode] =
      client.sendAsync(req, HttpResponse.BodyHandlers.ofString())
        .handle[(HttpResponse[String], Throwable)]((r, e) => (r, e))
        .thenCompose[com.fasterxml.jackson.databind.JsonNode] { re =>
          val (resp, err) = re
          val failure: Throwable =
            if (err != null) err
            else if (resp.statusCode() != 200) new java.io.IOException(
              s"agent HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
            else null
          if (failure == null) {
            try {
              val node = mapper.readTree(resp.body())
              require(node.has(field),
                s"agent response missing '$field': ${resp.body().take(200)}")
              CompletableFuture.completedFuture(node.get(field))
            } catch {
              case e: Throwable =>
                CompletableFuture.failedFuture[
                  com.fasterxml.jackson.databind.JsonNode](e)
            }
          } else if (n < 2) {
            CompletableFuture.supplyAsync[AnyRef](() => null,
              CompletableFuture.delayedExecutor(50L * (n + 1),
                java.util.concurrent.TimeUnit.MILLISECONDS))
              .thenCompose[com.fasterxml.jackson.databind.JsonNode](
                _ => attempt(n + 1))
          } else {
            CompletableFuture.failedFuture[
              com.fasterxml.jackson.databind.JsonNode](
              new java.io.IOException(
                s"credential agent unreachable after 3 attempts: $url",
                failure))
          }
        }
    attempt(0)
  }

  /** `join` that rethrows the REAL failure (the IOException the
    * retry ladder built), not the CompletionException wrapper.
    */
  def joinUnwrapped(fut: java.util.concurrent.CompletableFuture[
      com.fasterxml.jackson.databind.JsonNode])
      : com.fasterxml.jackson.databind.JsonNode =
    try fut.join()
    catch {
      case e: java.util.concurrent.CompletionException
          if e.getCause != null => throw e.getCause
    }
}
