package graft.identity

import java.util.concurrent.ConcurrentHashMap

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** U3: DID-create bootstrap — the driver-side parallel initialization
  * that builds the credential dimension every identity query joins
  * against (SURVEY.md §2.5, §3.2).
  *
  * Reference semantics
  * (veramo-agent/src/veramo/veramo_create_protected_did.ts:88-270,
  * data_synthesizer/service/veramo/bootstrap.go:30-99): for each
  * entity, getOrCreate a DID (idempotent — a re-run or a duplicate
  * request returns the already-registered identifier), then run
  * document HOSTING and authorization-VC issuance IN PARALLEL, and
  * only mark the entity bootstrapped when both land.
  *
  * Spark-first shape: this is driver-side init, not a distributed
  * operator — the entity universe is the credential registry (a
  * DIMENSION: customers/issuers, thousands of rows), never the fact
  * stream, so a bounded driver `Future.traverse` is the honest
  * architecture at 100 TB too. The result ships to executors as a
  * broadcast dim (J1 joins against it); nothing here scales with
  * event volume.
  */
object DidBootstrap {

  /** One bootstrapped identity: the dim row J1-style lookups join on.
    * `hosted` / `vc_jwt` are the two parallel side effects' receipts.
    */
  final case class DidRecord(entity_id: Long, did: String,
                             did_provider: String, hosted: Boolean,
                             vc_jwt: String)

  /** The getOrCreate registry (ts:96-118 `getOrCreateDid`). Keyed by
    * entity id; `computeIfAbsent` gives the same atomic
    * first-writer-wins the reference gets from Veramo's store, so
    * concurrent duplicate requests mint exactly one DID.
    */
  final class Registry {
    private val dids = new ConcurrentHashMap[Long, String]()
    private val hosted = ConcurrentHashMap.newKeySet[String]()

    def size: Int = dids.size

    /** Deterministic provider split (the same rule the dashboard's
      * per-provider panels replay): even entities did:key, odd
      * did:web. */
    def providerOf(entityId: Long): String =
      if (entityId % 2 == 0) "did:key" else "did:web"

    def getOrCreate(entityId: Long): String =
      dids.computeIfAbsent(entityId, id =>
        if (providerOf(id) == "did:key")
          // same fingerprint rule as CredentialOps.didKey — the dim
          // and the per-row derivations must agree on the key
          "did:key:z" + md5Hex(id.toString)
        else
          s"did:web:graft.example:u$id")

    /** Hosting side effect (ts:149-186): register the DID document.
      * Idempotent — re-hosting an already-hosted DID is a no-op
      * success, mirroring the reference's upsert. */
    def host(did: String): Boolean = { hosted.add(did); true }

    def isHosted(did: String): Boolean = hosted.contains(did)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Bootstrap every entity: getOrCreate its DID, then host the
    * document ∥ issue the authz VC (the reference's
    * `Promise.all([hostDid, issueAuthzVc])`, ts:200-247). Duplicate
    * ids collapse to one record (getOrCreate), input order does not
    * matter, and the whole traverse is bounded by the DIM size.
    */
  def bootstrap(entityIds: Seq[Long], registry: Registry = new Registry,
                secret: String = CredentialOps.DefaultSecret)
               (implicit ec: ExecutionContext =
                  ExecutionContext.global): Seq[DidRecord] = {
    val distinct = entityIds.distinct
    val fut = Future.traverse(distinct) { id =>
      val did = registry.getOrCreate(id)
      val hosting = Future(registry.host(did))
      val issuing = Future(Jwt.sign(
        s"""{"sub":"$did","scope":"$did/*"}""", secret))
      for (h <- hosting; vc <- issuing)
        yield DidRecord(id, did, registry.providerOf(id), h, vc)
    }
    Await.result(fut, Duration.Inf).sortBy(_.entity_id)
  }

  /** The bootstrap result as the broadcast-able credential dim. */
  def bootstrapDim(spark: SparkSession, entityIds: Seq[Long],
                   secret: String = CredentialOps.DefaultSecret): DataFrame = {
    import spark.implicits._
    bootstrap(entityIds, secret = secret).toDF()
  }
}
