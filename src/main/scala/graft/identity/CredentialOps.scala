package graft.identity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Credential issuance/verification as Spark operators.
  *
  * U1 (sign) / U2 (verify) are deterministic UDFs around [[Jwt]] —
  * the reference's only data-dependent predicate is
  * `filter($"verified")` (SURVEY.md §2.5). U4 is the authorization
  * grant predicate stack
  * (veramo-agent/src/veramo/veramo_authorisation_credential.ts:242-556):
  * subject-DID match → not expired → permissions superset → scope
  * prefix match → signature valid. Everything except the crypto check
  * is pure column logic (codegen'd); only the HMAC verification is a
  * UDF.
  */
object CredentialOps {

  /** Test secret; production injects one per deployment. */
  val DefaultSecret = "graft-engine-secret"

  /** U1: payload-JSON column → compact JWT column. Deterministic, so
    * Catalyst stays free to reorder/push the projection. */
  def signJwt(payloadJson: Column, secret: String = DefaultSecret): Column = {
    val f = udf((p: String) => Jwt.sign(p, secret))
    f(payloadJson)
  }

  /** U2: JWT column → verified boolean column. */
  def verifyJwt(jwt: Column, secret: String = DefaultSecret): Column = {
    val f = udf((j: String) => Jwt.verify(j, secret))
    f(jwt)
  }

  /** Deterministic DID for an entity id (stand-in for did:key
    * fingerprints; the reference's DIDs come from Veramo key
    * material, bootstrap.go:30-99).
    */
  def didKey(entityId: Column): Column =
    concat(lit("did:key:z"), md5(entityId.cast("string")))

  /** U4.1: credentialSubject.id must equal the presenting DID
    * (veramo_authorisation_credential.ts:399-444). */
  def subjectMatches(subjectDid: Column, did: Column): Column =
    subjectDid === did

  /** U4.2: expiry (…:511-526). `exp`/`now` in epoch seconds. */
  def notExpired(exp: Column, nowEpochSec: Long): Column =
    exp > lit(nowEpochSec)

  /** U4.3: granted permissions ⊇ required (…:447-480). */
  def permissionsSatisfied(granted: Column, required: Column): Column =
    size(array_except(required, granted)) === 0

  /** U4.4: scope check with trailing slash-star wildcard (…:483-508). */
  def scopeMatches(scope: Column, resource: Column): Column =
    (resource === scope) ||
      (scope.endsWith("/*") &&
        resource.startsWith(regexp_replace(scope, "/\\*$", "/")))

  /** Full U4 conjunction incl. the crypto check. */
  def authorized(subjectDid: Column, did: Column, exp: Column,
                 nowEpochSec: Long, granted: Column, required: Column,
                 scope: Column, resource: Column, jwt: Column,
                 secret: String = DefaultSecret): Column =
    subjectMatches(subjectDid, did) &&
      notExpired(exp, nowEpochSec) &&
      permissionsSatisfied(granted, required) &&
      scopeMatches(scope, resource) &&
      verifyJwt(jwt, secret)
}
