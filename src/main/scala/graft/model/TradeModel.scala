package graft.model

/** Scala mirror of the reference's canonical record shapes — the
  * `TradeEvent` Avro schema at
  * kafka_initialiser/app/resources/avro/trade_event.avsc:6-231 and the
  * Go source structs at data_synthesizer/models/types.go:9-121.
  *
  * Spark mapping (SURVEY.md §1.5): case classes give `Dataset[TradeEvent]`
  * encoders and the nested `StructType`; `union(null, T)` → `Option[T]`;
  * Avro `timestamp-millis` long → epoch-millis `Long` here, cast to
  * `TimestampType` at the analytics boundary.
  *
  * Naming note: the wire field is `context` (Avro names can't start
  * with `@`; the schema carries `aliases: ["@context"]`,
  * trade_event.avsc:86-88). The W3C-JSON form `@context` exists only
  * at the JSON boundary — see [[graft.ops.EnvelopeOps.denormalizeContext]]
  * (P8) and [[graft.ops.EnvelopeOps.normalizeContext]] (P7).
  */
final case class TradeData(
    Trade_Id: String,
    Trade_Condition: Option[Seq[String]],
    Price: Double,
    Symbol: String,
    Event_Timestamp: Long,
    Volume: Double)

final case class Issuer(id: String)

final case class Claims(TradeData: TradeData)

final case class CredentialSubject(id: String, claims: Claims)

final case class Proof(jwt: String, `type`: String)

final case class TradeCredential(
    context: Seq[String],
    id: String,
    issuanceDate: String,
    issuer: Issuer,
    credentialSubject: CredentialSubject,
    proof: Proof,
    `type`: Seq[String])

/** One Kafka message. Invariant (enforced at
  * data_synthesizer/service/finnhub/trade_handler.go:122-145): exactly
  * one of `tradeData` / `tradeCredential` is present, selected by the
  * SSI_VALIDATION config.
  */
final case class TradeEvent(
    start_timestamp: String,
    symbol: String,
    trade_event_id: String,
    tradeData: Option[TradeData],
    tradeCredential: Option[TradeCredential])
