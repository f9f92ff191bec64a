package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.identity.{CredentialOps, DidBootstrap, DidResolver}
import graft.ops.EventOps

/** Queries for the identity/credential operators (SURVEY.md §2.4-2.5:
  * U1 sign, U2 verify, U4 grant predicate stack, J2 cached DID
  * resolution). Tampering/expiry/permission cases are injected by
  * deterministic modular rules so the DuckDB oracle can predict the
  * engine's observable verification outcomes without sharing the
  * crypto.
  */
object IdentityQueries {

  /** U1 with a real oracle: the HMAC bytes themselves are not
    * DuckDB-expressible, but the OBSERVABLE contract is — every signed
    * JWT must verify (roundtrip_ok) and every tampered one must not
    * (tamper_detected), so the oracle is the all-TRUE table and any
    * signing/verification defect flips a value. Each UDF is staged as
    * its own projected column (one evaluation per row, as in U4).
    */
  private val u1Sign = QueryDef(
    "u1_sign_credentials",
    (s, d) => {
      val payload = to_json(struct(
        col("event_id").as("sub"), col("event_type").as("typ")))
      Tables.events(s, d)
        .select(col("event_id"), CredentialOps.signJwt(payload).as("jwt"))
        .withColumn("roundtrip_ok", CredentialOps.verifyJwt(col("jwt")))
        .withColumn("tamper_detected",
          !CredentialOps.verifyJwt(concat(col("jwt"), lit("x"))))
        .select(col("event_id"), col("roundtrip_ok"), col("tamper_detected"))
    },
    Some("""SELECT event_id, TRUE AS roundtrip_ok, TRUE AS tamper_detected
      FROM events"""))

  private val u2Verify = QueryDef(
    "u2_verify_credentials",
    (s, d) => {
      val payload = to_json(struct(
        col("event_id").as("sub"), col("event_type").as("typ")))
      val jwt = CredentialOps.signJwt(payload)
      val maybeTampered =
        when(col("event_id") % 10 === 0, concat(jwt, lit("x"))).otherwise(jwt)
      graft.ops.Observe.verifyMetrics(
        Tables.events(s, d)
          .withColumn("verified", CredentialOps.verifyJwt(maybeTampered)),
        "verified")
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

  /** The shared scale-safe p95 shape for q2/q3: bucket-count + linear
    * interpolation in the crossing bucket — the histogram_quantile
    * semantics the reference's dashboards actually compute, and the
    * plan whose per-group aggregation state is ONE COUNT PER BUCKET
    * (map-side combinable) instead of exact `percentile`'s
    * every-value-per-group buffer (the executor-OOM shape at 100×).
    *
    * All inputs are exact integers (ms durations, counts), so the
    * crossing-bucket election is pure integer comparison
    * (20·cum ≥ 19·n) and the interpolated p95 in SECONDS is the
    * integer ratio
    *   wMs·(20·b·cnt + 19·n − 20·prev) / (20000·cnt)
    * rounded 6 dp via [[graft.functions.ExactRound]] — bit-identical
    * in any engine, unlike percentile_approx's sketch.
    */
  private def bucketedP95(grouped: org.apache.spark.sql.DataFrame,
                          labels: Seq[String], wMs: Long,
                          outCol: String, nCol: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grp = Window.partitionBy(labels.map(col): _*)
    val cum = grouped
      .withColumn("cum", sum(col("cnt")).over(grp.orderBy(col("b"))))
      .withColumn("n", sum(col("cnt")).over(grp))
      .withColumn("prev", col("cum") - col("cnt"))
    cum.filter(col("cum") * 20 >= col("n") * 19 &&
        col("prev") * 20 < col("n") * 19)
      .select(labels.map(col) :+
        graft.functions.ExactRound.ratio6(
          lit(wMs) * (lit(20L) * col("b") * col("cnt") +
            lit(19L) * col("n") - lit(20L) * col("prev")),
          lit(20000L) * col("cnt")).as(outCol) :+
        col("n").as(nCol): _*)
  }

  /** Q2 (thesis_dashboard.json:743): p95 credential-verification
    * duration by did_provider/result — the U2 verify path composed
    * with quantile analytics. Durations are deterministic synthetic
    * functions of the record (injected-clock rule, SURVEY §7.4):
    * integer milliseconds = fixed cost + per-record jitter + tamper
    * penalty + provider penalty. The p95 is the [[bucketedP95]]
    * histogram-interpolation shape over 10 ms buckets (the
    * histogram_quantile semantics of metrics.py:129), replacing the
    * exact `percentile` whose per-group value buffer was the r9
    * verdict's scale-killer flag. The experiment label matrix
    * ([[graft.model.ExperimentConfig]]) rides the groupBy as literal
    * columns, like every reference verification histogram
    * (metrics.py:125-130 + `_common_labels`).
    */
  private val q2P95Verification = QueryDef(
    "q2_p95_verification",
    (s, d) => {
      val verified = col("event_id") % 10 =!= 0 // u2's tamper rule
      val provider = when(col("user_id") % 2 === 0, lit("did:key"))
        .otherwise(lit("did:web"))
      val ms = lit(5L) + col("event_id") % 97 +
        when(!verified, lit(20L)).otherwise(lit(0L)) +
        when(provider === "did:web", lit(50L)).otherwise(lit(0L))
      val labels = graft.model.ExperimentConfig.Default.labelCols
      val grouped = Tables.events(s, d)
        .select(Seq(provider.as("did_provider"),
          when(verified, lit("success")).otherwise(lit("failure")).as("result"),
          ms.as("ms")) ++ labels: _*)
        .groupBy(col("did_provider"), col("result"),
          col("ssi_validation"), col("cache_did"), col("processing_mode"),
          floor(col("ms") / lit(10.0)).cast("long").as("b"))
        .agg(count(lit(1)).as("cnt"))
      bucketedP95(grouped,
        Seq("did_provider", "result",
          "ssi_validation", "cache_did", "processing_mode"), wMs = 10L,
        outCol = "p95_verification_s", nCol = "n")
    },
    Some("""WITH v AS (SELECT
        CASE WHEN user_id % 2 = 0 THEN 'did:key' ELSE 'did:web' END AS did_provider,
        CASE WHEN event_id % 10 <> 0 THEN 'success' ELSE 'failure' END AS result,
        (5 + event_id % 97
          + CASE WHEN event_id % 10 = 0 THEN 20 ELSE 0 END
          + CASE WHEN user_id % 2 <> 0 THEN 50 ELSE 0 END) AS ms
        FROM events),
      byb AS (SELECT did_provider, result, ms // 10 AS b, COUNT(*) AS cnt
        FROM v GROUP BY 1, 2, 3),
      cum AS (SELECT *,
        CAST(SUM(cnt) OVER (PARTITION BY did_provider, result ORDER BY b) AS BIGINT) AS cum,
        CAST(SUM(cnt) OVER (PARTITION BY did_provider, result) AS BIGINT) AS n
        FROM byb)
      SELECT did_provider, result,
        'true' AS ssi_validation, 'true' AS cache_did, 'sync' AS processing_mode,
        ((2 * (10 * (20*b*cnt + 19*n - 20*(cum - cnt))) * 1000000
          + 20000*cnt) // (2 * 20000 * cnt)) / 1000000.0 AS p95_verification_s,
        n
      FROM cum WHERE 20*cum >= 19*n AND 20*(cum - cnt) < 19*n"""))

  /** Q3 (thesis_dashboard.json:1455): p95 DID-resolution duration by
    * method/cached (veramo-verifier/src/server.ts:168-175 labels). The
    * `cached` label follows the J2 cache model deterministically: the
    * FIRST resolution of a DID in event order is a miss, every later
    * one a hit — expressed as a row_number window over (user_id) so
    * the oracle can replay it, instead of reading the executor-local
    * LRU's nondeterministic state. Misses pay the resolver round-trip
    * (~100 ms band), hits the cache lookup (~1 ms band). The p95 is
    * the [[bucketedP95]] histogram-interpolation shape over 5 ms
    * buckets — one count per bucket of aggregation state, not exact
    * `percentile`'s per-group value buffer.
    */
  private val q3P95Resolution = QueryDef(
    "q3_p95_resolution",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val ms = when(col("cached"), lit(1L) + col("user_id") % 5)
        .otherwise(lit(100L) + col("user_id") % 50)
      val grouped = Tables.events(s, d)
        .withColumn("cached", row_number().over(w) > 1)
        .select(lit("key").as("method"), col("cached"), ms.as("ms"))
        .groupBy(col("method"), col("cached"),
          floor(col("ms") / lit(5.0)).cast("long").as("b"))
        .agg(count(lit(1)).as("cnt"))
      bucketedP95(grouped, Seq("method", "cached"), wMs = 5L,
        outCol = "p95_resolution_s", nCol = "n_resolutions")
    },
    Some("""WITH r AS (SELECT user_id,
        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1 AS cached
      FROM events),
      v AS (SELECT 'key' AS method, cached,
        (CASE WHEN cached THEN 1 + user_id % 5
          ELSE 100 + user_id % 50 END) AS ms FROM r),
      byb AS (SELECT method, cached, ms // 5 AS b, COUNT(*) AS cnt
        FROM v GROUP BY 1, 2, 3),
      cum AS (SELECT *,
        CAST(SUM(cnt) OVER (PARTITION BY method, cached ORDER BY b) AS BIGINT) AS cum,
        CAST(SUM(cnt) OVER (PARTITION BY method, cached) AS BIGINT) AS n
        FROM byb)
      SELECT method, cached,
        ((2 * (5 * (20*b*cnt + 19*n - 20*(cum - cnt))) * 1000000
          + 20000*cnt) // (2 * 20000 * cnt)) / 1000000.0 AS p95_resolution_s,
        n AS n_resolutions
      FROM cum WHERE 20*cum >= 19*n AND 20*(cum - cnt) < 19*n"""))

  /** U3: the DID-bootstrap readout
    * ([[DidBootstrap]]: getOrCreate DID → hosting ∥ authz-VC,
    * veramo_create_protected_did.ts:88-270) over the customer DIM,
    * on the EXECUTOR-SIDE mint path
    * ([[DidBootstrap.bootstrapDimDistributed]]): the keygen is pure
    * and deterministic, so each partition mints its slice in place —
    * no full-dim collect, no driver ceiling at a 100× registry. The
    * dim is certified by its observable contract: one DID per entity,
    * every document hosted, every issued VC verifying, split by the
    * deterministic provider rule the dashboard panels and the
    * six-config matrix replay (id mod 3 → did:key / did:web /
    * did:ethr:sepolia — row 6 of [[graft.model.ExperimentConfig]] is
    * now exercisable end-to-end).
    */
  private val u3BootstrapDim = QueryDef(
    "u3_bootstrap_dim",
    (s, d) => {
      DidBootstrap.bootstrapDimDistributed(
          Tables.customer(s, d), "c_custkey")
        .withColumn("vc_ok", CredentialOps.verifyJwt(col("vc_jwt")))
        .groupBy(col("did_provider"))
        .agg(count(lit(1)).as("n_dids"),
          count(when(col("hosted"), 1)).as("n_hosted"),
          count(when(col("vc_ok"), 1)).as("n_vc_ok"))
    },
    Some("""SELECT
      CASE WHEN c_custkey % 3 = 0 THEN 'did:key'
           WHEN c_custkey % 3 = 1 THEN 'did:web'
           ELSE 'did:ethr:sepolia' END AS did_provider,
      COUNT(*) AS n_dids, COUNT(*) AS n_hosted, COUNT(*) AS n_vc_ok
      FROM customer GROUP BY 1"""))

  val defs: Seq[QueryDef] =
    Seq(u1Sign, u2Verify, u3BootstrapDim, u4GrantCheck, j2CachedResolution,
      q2P95Verification, q3P95Resolution)
}
