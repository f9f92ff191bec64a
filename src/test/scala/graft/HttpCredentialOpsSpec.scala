package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.identity.{AgentHttpServer, CredentialOps, HttpCredentialOps, Jwt}
import graft.sources.Tables

/** The per-record RPC seam closed end-to-end: U1 sign / U2 verify
  * over a REAL HTTP hop (pooled `java.net.http` client inside
  * `mapPartitions` against [[AgentHttpServer]] on loopback) must be
  * row-identical to the in-process [[CredentialOps]] crypto path on
  * the u2_verify_credentials fixture — batch AND streaming. This is
  * the reference's defining expensive operator shape (per-record
  * sign/verify against a Veramo agent over HTTP,
  * veramo_client.py:86-117 / veramo_client.go:30-118) exercised
  * through an actual socket, not a function call.
  */
class HttpCredentialOpsSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Tables.events(spark, sf)
    .select(col("event_id"), col("event_type"))
    .withColumn("payload", to_json(struct(
      col("event_id").as("sub"), col("event_type").as("typ"))))

  test("batch: HTTP-hop sign+verify is row-identical to the in-process " +
    "path on the u2 fixture (tampered rows included)") {
    val server = new AgentHttpServer()
    try {
      val base = fixture
      // in-process reference: sign, tamper every 10th, verify
      val inProc = base
        .withColumn("jwt", CredentialOps.signJwt(col("payload")))
        .withColumn("jwt2", when(col("event_id") % 10 === 0,
          concat(col("jwt"), lit("x"))).otherwise(col("jwt")))
        .withColumn("verified", CredentialOps.verifyJwt(col("jwt2")))
        .select(col("event_id"), col("jwt"), col("verified"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
        .sortBy(_._1)
      // HTTP hop: same fixture, same tampering, over the wire
      val signed = HttpCredentialOps.signJwtHttp(
        base, "payload", "jwt", server.endpoint)
        .withColumn("jwt2", when(col("event_id") % 10 === 0,
          concat(col("jwt"), lit("x"))).otherwise(col("jwt")))
      val http = HttpCredentialOps.verifyJwtHttp(
        signed, "jwt2", "verified", server.endpoint)
        .select(col("event_id"), col("jwt"), col("verified"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
        .sortBy(_._1)
      assert(http.length === inProc.length && http.length > 0)
      assert(http.toSeq === inProc.toSeq,
        "the HTTP hop must be observationally identical to in-process crypto")
      assert(http.exists(!_._3), "tampered rows must verify false")
      assert(http.count(_._3) > http.count(!_._3),
        "untampered rows must verify true")
    } finally server.close()
  }

  test("streaming: the same mapPartitions ops run unchanged on a " +
    "stream — stream output equals the batch output on the same rows") {
    val server = new AgentHttpServer()
    try {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(Long, String)]
      val streamDf = in.toDF().toDF("event_id", "event_type")
        .withColumn("payload", to_json(struct(
          col("event_id").as("sub"), col("event_type").as("typ"))))
      val signed = HttpCredentialOps.signJwtHttp(
        streamDf, "payload", "jwt", server.endpoint)
      val verified = HttpCredentialOps.verifyJwtHttp(
        signed.withColumn("jwt2", when(col("event_id") % 10 === 0,
          concat(col("jwt"), lit("x"))).otherwise(col("jwt"))),
        "jwt2", "verified", server.endpoint)
        .select(col("event_id"), col("jwt"), col("verified"))
      val q = verified.writeStream.format("memory")
        .queryName("http_credentials").start()
      try {
        val rows = Seq(
          1L -> "trade", 7L -> "health", 10L -> "trade",
          20L -> "quote", 33L -> "trade")
        in.addData(rows: _*)
        q.processAllAvailable()
        val got = spark.table("http_credentials")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
          .sortBy(_._1)
        // batch twin on the same rows, in-process crypto
        val expect = rows.map { case (id, typ) =>
          val payload = s"""{"sub":$id,"typ":"$typ"}"""
          val jwt = Jwt.sign(payload, CredentialOps.DefaultSecret)
          val jwt2 = if (id % 10 == 0) jwt + "x" else jwt
          (id, jwt, Jwt.verify(jwt2, CredentialOps.DefaultSecret))
        }.sortBy(_._1)
        assert(got.toSeq === expect)
        assert(got.exists(!_._3) && got.exists(_._3))
      } finally q.stop()
    } finally server.close()
  }

  test("failure contract: an unreachable agent throws after retries " +
    "instead of passing rows through unverified") {
    val df = Seq((1L, "x")).toDF("event_id", "payload")
    val ex = intercept[org.apache.spark.SparkException] {
      HttpCredentialOps.signJwtHttp(df, "payload", "jwt",
        "http://127.0.0.1:1").collect()
    }
    assert(ex.getMessage.contains("unreachable") ||
      Option(ex.getCause).exists(_.getMessage.contains("unreachable")))
  }

  test("async mode: bounded-window sign+verify is row-identical to the " +
    "sequential HTTP path and the in-process path, and the observed " +
    "server concurrency proves overlap within the bound") {
    // delayMs holds each request open so overlap is observable; the
    // single partition isolates the window as the ONLY concurrency
    // source (no cross-partition parallelism in the count)
    val server = new AgentHttpServer(delayMs = 20)
    val maxInFlight = 4
    try {
      val base = fixture.limit(40).coalesce(1)
      val inProc = base
        .withColumn("jwt", CredentialOps.signJwt(col("payload")))
        .withColumn("jwt2", when(col("event_id") % 10 === 0,
          concat(col("jwt"), lit("x"))).otherwise(col("jwt")))
        .withColumn("verified", CredentialOps.verifyJwt(col("jwt2")))
        .select(col("event_id"), col("jwt"), col("verified"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
        .sortBy(_._1)
      val signed = HttpCredentialOps.signJwtHttpAsync(
        base, "payload", "jwt", server.endpoint, maxInFlight)
        .withColumn("jwt2", when(col("event_id") % 10 === 0,
          concat(col("jwt"), lit("x"))).otherwise(col("jwt")))
      val got = HttpCredentialOps.verifyJwtHttpAsync(
        signed, "jwt2", "verified", server.endpoint, maxInFlight)
        .select(col("event_id"), col("jwt"), col("verified"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
        .sortBy(_._1)
      assert(got.length === inProc.length && got.length > 0)
      assert(got.toSeq === inProc.toSeq,
        "async mode must be observationally identical to sync/in-process")
      // chained sign→verify stages pipeline in ONE task, each holding
      // its own window (the reference's per-consumer semaphore), so
      // the chain's total is bounded by 2× the per-operator window
      val seen = server.maxObservedConcurrency
      assert(seen <= 2 * maxInFlight,
        s"in-flight bound violated: server saw $seen > ${2 * maxInFlight}")
      assert(seen >= 2,
        s"no overlap observed ($seen) — the async window isn't async")
    } finally server.close()
  }

  test("async mode: a SINGLE operator's observed server concurrency " +
    "stays within its own window and overlaps") {
    val server = new AgentHttpServer(delayMs = 20)
    val maxInFlight = 4
    try {
      val preSigned = fixture.limit(40).coalesce(1)
        .withColumn("jwt", CredentialOps.signJwt(col("payload")))
      val got = HttpCredentialOps.verifyJwtHttpAsync(
        preSigned, "jwt", "verified", server.endpoint, maxInFlight)
        .select(col("event_id"), col("verified"))
        .collect().map(r => (r.getLong(0), r.getBoolean(1)))
      assert(got.length === 40 && got.forall(_._2))
      val seen = server.maxObservedConcurrency
      assert(seen <= maxInFlight,
        s"in-flight bound violated: server saw $seen > $maxInFlight")
      assert(seen >= 2,
        s"no overlap observed ($seen) — the async window isn't async")
    } finally server.close()
  }

  test("async mode failure contract: an unreachable agent throws " +
    "after async-chained retries") {
    val df = Seq((1L, "x")).toDF("event_id", "payload")
    val ex = intercept[org.apache.spark.SparkException] {
      HttpCredentialOps.signJwtHttpAsync(df, "payload", "jwt",
        "http://127.0.0.1:1", maxInFlight = 8).collect()
    }
    assert(ex.getMessage.contains("unreachable") ||
      Option(ex.getCause).exists(_.getMessage.contains("unreachable")))
  }
}
