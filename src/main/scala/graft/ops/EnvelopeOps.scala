package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** TradeEvent envelope construction and struct-shape operators — the
  * reference's producer/consumer record plumbing as pure Column
  * functions over nested structs (codegen'd, no UDFs, no JSON
  * detours except where the reference itself works on JSON).
  *
  * Reference points (files under /root/reference/):
  *  - P5 envelope build:   data_synthesizer/service/finnhub/trade_handler.go:122-145
  *    (payload = {trade_event_id, symbol, start_timestamp} + exactly
  *    one of tradeData | tradeCredential, selected by SSI_VALIDATION)
  *  - P7 `@context`→`context` normalize: kafka_producer/app/gather_data/process_data.py:26-32
  *  - P8 `context`→`@context` denormalize: kafka_consumer/app/handlers/kafka_event_handler.py:72-88
  *  - P9 nested DID extraction + fallback: kafka_event_handler.py:250-260
  *  - P13 VC issue-request envelope: data_synthesizer/service/veramo/veramo_client.go:94-118
  */
object EnvelopeOps {

  /** P5: one Kafka-message envelope. Exactly one of `tradeData` /
    * `tradeCredential` is non-null, selected by `ssi` — the same
    * either-or the reference enforces via its SSI_VALIDATION config
    * (trade_handler.go:128-145); here the toggle is a per-row Column
    * so one batch can carry both populations.
    */
  def envelope(tradeEventId: Column, symbol: Column, startTimestamp: Column,
               ssi: Column, tradeData: Column, tradeCredential: Column): Column =
    struct(
      startTimestamp.as("start_timestamp"),
      symbol.as("symbol"),
      tradeEventId.as("trade_event_id"),
      when(!ssi, tradeData).as("tradeData"),
      when(ssi, tradeCredential).as("tradeCredential"))

  /** P13: the W3C credential struct the synthesizer posts to its SSI
    * agent (veramo_client.go:96-116): fixed v1 context, vc:-prefixed
    * id, issuer wrapper record, subject with claims payload, and the
    * jwt proof the agent attaches.
    */
  def vcCredential(vcId: Column, issuerDid: Column, subjectDid: Column,
                   issuanceDate: Column, claims: Column, jwt: Column): Column =
    struct(
      array(lit("https://www.w3.org/2018/credentials/v1")).as("context"),
      vcId.as("id"),
      issuanceDate.as("issuanceDate"),
      struct(issuerDid.as("id")).as("issuer"),
      struct(subjectDid.as("id"),
        struct(claims.as("TradeData")).as("claims")).as("credentialSubject"),
      struct(jwt.as("jwt"), lit("JwtProof2020").as("type")).as("proof"),
      array(lit("VerifiableCredential")).as("type"))

  /** P13: the issue-request wrapper {credential, proofFormat: "jwt"}
    * (veramo_client.go:97-117). */
  def vcIssueRequest(credential: Column): Column =
    struct(credential.as("credential"), lit("jwt").as("proofFormat"))

  /** P8: wire-form credential → W3C JSON form: rename `context` to
    * `@context` (kafka_event_handler.py:72-88). `withField` replaces
    * or appends, `dropFields` removes — field VALUES are untouched,
    * so normalize∘denormalize is value-identity (field order shifts,
    * which JSON-object semantics don't observe).
    */
  def denormalizeContext(cred: Column): Column =
    cred.withField("`@context`", cred.getField("context")).dropFields("context")

  /** P7: W3C JSON form → wire form: rename `@context` back to
    * `context` (process_data.py:26-32). */
  def normalizeContext(cred: Column): Column =
    cred.withField("context", cred.getField("@context")).dropFields("`@context`")

  /** The tradeData XOR tradeCredential invariant as an EXPLICIT
    * validated constraint (SURVEY §7.4 — the reference only enforces
    * it implicitly by construction, trade_handler.go:128-145): flags
    * each envelope, and counts violations on the [[Observe]] error
    * channel so a malformed producer is visible in metrics, not just
    * silently routed.
    */
  def validateEitherOr(df: org.apache.spark.sql.DataFrame,
                       envCol: String): org.apache.spark.sql.DataFrame = {
    val td = col(envCol).getField("tradeData")
    val tc = col(envCol).getField("tradeCredential")
    val flagged = df.withColumn("envelope_valid", td.isNotNull =!= tc.isNotNull)
    flagged.observe("envelope_invalid_metrics",
      sum(when(!col("envelope_valid"), 1L).otherwise(0L)).as("n_invalid"),
      count(lit(1)).as("n_total"))
  }

  /** P9: record-DID extraction with the reference's two fallbacks
    * (kafka_event_handler.py:250-260): non-SSI records report the
    * literal "None", SSI records missing a subject id report
    * "unknown".
    */
  def recordDid(envelope: Column): Column = {
    val cred = envelope.getField("tradeCredential")
    when(cred.isNull, lit("None"))
      .otherwise(coalesce(
        cred.getField("credentialSubject").getField("id"), lit("unknown")))
  }
}
