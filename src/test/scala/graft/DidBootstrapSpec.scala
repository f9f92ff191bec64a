package graft

import graft.identity.{CredentialOps, DidBootstrap, Jwt}

/** U3 DID-bootstrap semantics
  * (veramo_create_protected_did.ts:88-270): getOrCreate idempotence,
  * hosting ∥ VC-issuance receipts, provider split, and dim parity
  * with the per-row didKey derivation.
  */
class DidBootstrapSpec extends SparkSpec {

  test("bootstrap is idempotent: duplicate ids and re-runs mint one DID") {
    val reg = new DidBootstrap.Registry
    val first = DidBootstrap.bootstrap(Seq(1L, 2L, 2L, 3L, 1L), reg)
    assert(first.map(_.entity_id) === Seq(1L, 2L, 3L))
    assert(reg.size === 3, "getOrCreate must not mint duplicates")
    val again = DidBootstrap.bootstrap(Seq(3L, 2L, 1L), reg)
    assert(again === first,
      "a re-run against the same registry returns identical records")
    assert(reg.size === 3)
  }

  test("hosting and VC issuance both land; the VC verifies") {
    val recs = DidBootstrap.bootstrap(1L to 20L)
    assert(recs.forall(_.hosted), "every DID document is hosted")
    assert(recs.forall(r => Jwt.verify(r.vc_jwt, CredentialOps.DefaultSecret)),
      "every issued authz VC verifies under the signing secret")
  }

  test("provider split and did:key fingerprint match the per-row rule") {
    val recs = DidBootstrap.bootstrap(Seq(6L, 7L, 8L))
    val byId = recs.map(r => r.entity_id -> r).toMap
    assert(byId(6L).did_provider === "did:key")
    assert(byId(7L).did_provider === "did:web")
    assert(byId(8L).did_provider === "did:ethr:sepolia")
    // the dim's did:key fingerprint must equal CredentialOps.didKey
    // (J1 joins the dim against per-row derivations of the same key)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val viaCol = Seq(6L).toDF("id")
      .select(CredentialOps.didKey(col("id"))).as[String].collect()(0)
    assert(byId(6L).did === viaCol)
    assert(byId(7L).did === "did:web:graft.example:u7")
    // ethr DID: deterministic 20-byte hex account, ethr-shaped
    assert(byId(8L).did.matches("did:ethr:sepolia:0x[0-9a-f]{40}"))
  }

  test("distributed mint matches the driver path and never collects the dim") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dim = spark.read.parquet(s"$sf/customer.parquet")
    val dist = DidBootstrap.bootstrapDimDistributed(dim, "c_custkey")
    // plan contract: the mint is a transformation OVER THE SCAN — a
    // driver-side collect would plan as LocalTableScan with no file
    // source underneath
    val plan = dist.queryExecution.executedPlan.toString
    assert(plan.contains("Scan") && plan.toLowerCase.contains("parquet"),
      s"distributed mint must read the dim lazily, got:\n$plan")
    assert(!plan.contains("LocalTableScan"),
      "distributed mint must not materialize the dim on the driver")
    // parity: identical records to the driver-side bootstrap
    val ids = dim.select(col("c_custkey").cast("long")).as[Long]
      .collect().toSeq
    val driver = DidBootstrap.bootstrap(ids)
    val got = dist.as[DidBootstrap.DidRecord].collect()
      .sortBy(_.entity_id).toSeq
    assert(got === driver)
  }

  test("concurrent getOrCreate under contention stays single-writer") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val reg = new DidBootstrap.Registry
    val dids = Await.result(
      Future.traverse(1 to 64)(_ => Future(reg.getOrCreate(42L))),
      Duration.Inf)
    assert(dids.distinct.size === 1, "64 racing creates, one DID")
    assert(reg.size === 1)
  }
}
