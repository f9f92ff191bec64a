package graft.model

import org.apache.avro.{Schema, SchemaBuilder}

/** The TradeEvent Avro schema, built programmatically (no .avsc file)
  * to the same shape as the reference's registry-registered schema
  * (kafka_initialiser/app/resources/avro/trade_event.avsc:1-232):
  * nested records, `union(null, T)` optionals with null defaults, the
  * `@context` alias on the wire-named `context` field, and the
  * duplicated RawTradeData/TradeData record pair (the avsc declares
  * the trade-data shape twice under two names; Avro named types must
  * be unique, so the nested copy keeps the second name).
  *
  * The reference resolves schemas through a Confluent registry
  * (kafka_consumer/app/handlers/kafka_consumer.py:44-55); here the
  * schema is code — SURVEY.md §1.5 maps the registry to in-repo
  * schema + from/to-Avro conversion, registry client optional.
  */
object TradeAvro {

  private val Ns = "graft.trades"

  private def tradeDataSchema(name: String): Schema = {
    val b = SchemaBuilder.record(name).namespace(Ns).fields()
    b.requiredString("Trade_Id")
    b.name("Trade_Condition").`type`()
      .unionOf().nullType().and().array().items().stringType().endUnion()
      .nullDefault()
    b.requiredDouble("Price")
    b.requiredString("Symbol")
    // Plain long epoch millis: the avsc writes "logicalType":
    // "timestamp-millis" as a field-level SIBLING of "type": "long"
    // (trade_event.avsc:59-63), a position Avro parsers ignore — the
    // reference's effective parsed schema is a bare long, and a real
    // logical type here would change the canonical form/fingerprint.
    b.requiredLong("Event_Timestamp")
    b.requiredDouble("Volume")
    b.endRecord()
  }

  val issuerSchema: Schema =
    SchemaBuilder.record("Issuer").namespace(Ns).fields()
      .requiredString("id").endRecord()

  val claimsSchema: Schema = {
    val b = SchemaBuilder.record("Claims").namespace(Ns).fields()
    b.name("TradeData").`type`(tradeDataSchema("TradeData")).noDefault()
    b.endRecord()
  }

  val credentialSubjectSchema: Schema = {
    val b = SchemaBuilder.record("CredentialSubject").namespace(Ns).fields()
    b.requiredString("id")
    b.name("claims").`type`(claimsSchema).noDefault()
    b.endRecord()
  }

  val proofSchema: Schema =
    SchemaBuilder.record("Proof").namespace(Ns).fields()
      .requiredString("jwt").requiredString("type").endRecord()

  val tradeCredentialSchema: Schema = {
    val b = SchemaBuilder.record("TradeCredential").namespace(Ns).fields()
    // wire name `context`, JSON name `@context` (trade_event.avsc:85-94)
    b.name("context").aliases("@context").`type`()
      .array().items().stringType().noDefault()
    b.requiredString("id")
    b.requiredString("issuanceDate")
    b.name("issuer").`type`(issuerSchema).noDefault()
    b.name("credentialSubject").`type`(credentialSubjectSchema).noDefault()
    b.name("proof").`type`(proofSchema).noDefault()
    b.name("type").`type`().array().items().stringType().noDefault()
    b.endRecord()
  }

  val tradeEventSchema: Schema = {
    val b = SchemaBuilder.record("TradeEvent").namespace(Ns).fields()
    b.requiredString("start_timestamp")
    b.requiredString("symbol")
    b.requiredString("trade_event_id")
    b.name("tradeData").`type`()
      .unionOf().nullType().and().`type`(tradeDataSchema("RawTradeData")).endUnion()
      .nullDefault()
    b.name("tradeCredential").`type`()
      .unionOf().nullType().and().`type`(tradeCredentialSchema).endUnion()
      .nullDefault()
    b.endRecord()
  }
}
