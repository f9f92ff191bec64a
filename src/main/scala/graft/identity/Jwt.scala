package graft.identity

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** Deterministic in-process compact-JWT sign/verify (HS256, JDK
  * crypto only — zero egress).
  *
  * The reference signs/verifies per record over HTTP against a Veramo
  * agent/verifier (sign: data_synthesizer/service/veramo/veramo_client.go:30-118;
  * verify: kafka_consumer/app/handlers/veramo_client.py:86-117 →
  * veramo-verifier/src/server.ts:500-539). For a testable Spark
  * engine those external, stateful calls are re-expressed as pure
  * functions with an injected secret (SURVEY.md §7.4) — same operator
  * signature, `sign(payload) → credential` / `verify(credential) →
  * {verified, error}`. The HTTP-client mapPartitions variant EXISTS
  * and is certified row-identical to this path batch+streaming:
  * [[HttpCredentialOps]] (pooled `java.net.http` client) against
  * [[AgentHttpServer]] (the in-process agent), HttpCredentialOpsSpec.
  */
object Jwt {
  private val HeaderB64 = b64url("""{"alg":"HS256","typ":"JWT"}""".getBytes(UTF_8))

  def b64url(bytes: Array[Byte]): String =
    Base64.getUrlEncoder.withoutPadding.encodeToString(bytes)

  // One Mac per executor thread: Mac.getInstance walks the JCA
  // provider list — measurable per-row overhead at 100 TB scale.
  private val macPool: ThreadLocal[Mac] = new ThreadLocal[Mac] {
    override def initialValue(): Mac = Mac.getInstance("HmacSHA256")
  }

  // Key material is immutable — build each distinct secret's
  // SecretKeySpec once per JVM instead of re-allocating per row.
  private val keyCache =
    new java.util.concurrent.ConcurrentHashMap[String, SecretKeySpec]()

  private def key(secret: String): SecretKeySpec =
    keyCache.computeIfAbsent(secret,
      s => new SecretKeySpec(s.getBytes(UTF_8), "HmacSHA256"))

  private def hmac(secret: String, data: String): Array[Byte] = {
    val mac = macPool.get()
    mac.init(key(secret))
    mac.doFinal(data.getBytes(UTF_8))
  }

  /** payload JSON → compact JWT `header.payload.signature`. */
  def sign(payloadJson: String, secret: String): String = {
    val signingInput = HeaderB64 + "." + b64url(payloadJson.getBytes(UTF_8))
    signingInput + "." + b64url(hmac(secret, signingInput))
  }

  /** Constant-time signature check; malformed tokens verify false. */
  def verify(jwt: String, secret: String): Boolean = {
    if (jwt == null) return false
    val parts = jwt.split('.')
    if (parts.length != 3) return false
    val expected = b64url(hmac(secret, parts(0) + "." + parts(1)))
    java.security.MessageDigest.isEqual(
      expected.getBytes(UTF_8), parts(2).getBytes(UTF_8))
  }

  def payload(jwt: String): Option[String] = {
    val parts = jwt.split('.')
    if (parts.length != 3) None
    else Some(new String(Base64.getUrlDecoder.decode(parts(1)), UTF_8))
  }
}
