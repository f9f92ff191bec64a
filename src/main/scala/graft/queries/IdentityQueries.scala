package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.identity.{CredentialOps, DidResolver}
import graft.ops.EventOps

/** Queries for the identity/credential operators (SURVEY.md §2.4-2.5:
  * U1 sign, U2 verify, U4 grant predicate stack, J2 cached DID
  * resolution). Tampering/expiry/permission cases are injected by
  * deterministic modular rules so the DuckDB oracle can predict the
  * engine's observable verification outcomes without sharing the
  * crypto.
  */
object IdentityQueries {

  private val u1Sign = QueryDef(
    "u1_sign_credentials",
    (s, d) => {
      val payload = to_json(struct(
        col("event_id").as("sub"), col("event_type").as("typ")))
      Tables.events(s, d)
        .select(col("event_id"), CredentialOps.signJwt(payload).as("jwt"))
    },
    None) // HMAC-SHA256 is not DuckDB-expressible → rows-only; the
          // roundtrip is oracle-checked via u2_verify_credentials.

  private val u2Verify = QueryDef(
    "u2_verify_credentials",
    (s, d) => {
      val payload = to_json(struct(
        col("event_id").as("sub"), col("event_type").as("typ")))
      val jwt = CredentialOps.signJwt(payload)
      val maybeTampered =
        when(col("event_id") % 10 === 0, concat(jwt, lit("x"))).otherwise(jwt)
      Tables.events(s, d)
        .withColumn("verified", CredentialOps.verifyJwt(maybeTampered))
        .groupBy(col("event_type"))
        .agg(
          count(when(col("verified"), 1)).as("n_verified"),
          count(when(!col("verified"), 1)).as("n_failed"))
    },
    Some("""SELECT event_type,
      COUNT(*) FILTER (WHERE event_id % 10 <> 0) AS n_verified,
      COUNT(*) FILTER (WHERE event_id % 10 = 0) AS n_failed
      FROM events GROUP BY event_type"""))

  private val u4GrantCheck = QueryDef(
    "u4_grant_check",
    (s, d) => {
      val key = col("c_custkey")
      val did = CredentialOps.didKey(key)
      val subjectDid =
        when(key % 11 === 0, concat(did, lit(":imposter"))).otherwise(did)
      val granted = when(key % 3 === 0, array(lit("read")))
        .when(key % 3 === 1, array(lit("read"), lit("write")))
        .otherwise(array(lit("read"), lit("write"), lit("admin")))
      val required = array(lit("read"), lit("write"))
      val exp = when(key % 7 === 0, lit(EventOps.NowEpochSeconds - 1000L))
        .otherwise(lit(EventOps.NowEpochSeconds + 86400L))
      val scope = concat(did, lit("/*"))
      val resource = when(key % 13 === 0, lit("did:key:zother/resource"))
        .otherwise(concat(did, lit("/trades/"), key))
      // Stage the crypto UDFs as their own projected columns so each
      // runs exactly ONCE per row: a signJwt inlined into both
      // branches of the tamper `when` (and a verifyJwt appearing in
      // both sig_ok and the authorized conjunction) is evaluated per
      // reference — conditional branches defeat UDF subexpression
      // elimination. CollapseProject keeps non-cheap multi-referenced
      // aliases (ScalaUDF) staged, so these survive optimization.
      Tables.customer(s, d)
        .select(key.as("c_custkey"), subjectDid.as("subject_did"),
          granted.as("granted"), exp.as("exp"), scope.as("scope"),
          resource.as("resource"),
          CredentialOps.signJwt(to_json(struct(subjectDid.as("sub"))))
            .as("jwt0"))
        .withColumn("jwt", when(col("c_custkey") % 5 === 0,
          concat(col("jwt0"), lit("x"))).otherwise(col("jwt0")))
        .withColumn("sig_ok", CredentialOps.verifyJwt(col("jwt")))
        .withColumn("subject_ok", CredentialOps.subjectMatches(
          col("subject_did"), CredentialOps.didKey(col("c_custkey"))))
        .withColumn("not_expired",
          CredentialOps.notExpired(col("exp"), EventOps.NowEpochSeconds))
        .withColumn("perms_ok",
          CredentialOps.permissionsSatisfied(col("granted"), required))
        .withColumn("scope_ok",
          CredentialOps.scopeMatches(col("scope"), col("resource")))
        .select(col("c_custkey"), col("subject_ok"), col("not_expired"),
          col("perms_ok"), col("scope_ok"), col("sig_ok"),
          (col("subject_ok") && col("not_expired") && col("perms_ok")
            && col("scope_ok") && col("sig_ok")).as("authorized"))
    },
    Some("""SELECT c_custkey,
      c_custkey % 11 <> 0 AS subject_ok,
      c_custkey % 7 <> 0 AS not_expired,
      c_custkey % 3 <> 0 AS perms_ok,
      c_custkey % 13 <> 0 AS scope_ok,
      c_custkey % 5 <> 0 AS sig_ok,
      (c_custkey % 11 <> 0 AND c_custkey % 7 <> 0 AND c_custkey % 3 <> 0
       AND c_custkey % 13 <> 0 AND c_custkey % 5 <> 0) AS authorized
      FROM customer"""))

  private val j2CachedResolution = QueryDef(
    "j2_cached_resolution",
    (s, d) => {
      import s.implicits._
      val dids = Tables.events(s, d)
        .select(CredentialOps.didKey(col("user_id")).as("did")).as[String]
      // Partition-local LRU+TTL cache: one per executor JVM, touched
      // from mapPartitions — the reference's cached DID resolver (J2).
      dids.mapPartitions { it =>
        it.map(did => (did, DidResolver.resolveCached(did).nonEmpty))
      }.toDF("did", "resolved")
        .filter(col("resolved"))
        .groupBy(col("did"))
        .agg(count(lit(1)).as("n_records"))
    },
    Some("""SELECT 'did:key:z' || md5(CAST(user_id AS VARCHAR)) AS did,
      COUNT(*) AS n_records FROM events GROUP BY 1"""))

  val defs: Seq[QueryDef] =
    Seq(u1Sign, u2Verify, u4GrantCheck, j2CachedResolution)
}
