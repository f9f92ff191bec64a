package graft

import org.apache.spark.sql.functions._

import graft.model.TradeEvent
import graft.ops.{EnvelopeOps, TradeAvroOps}

/** Envelope struct ops + Dataset-level Avro path over a real events
  * sample: either-or branch selection (P5), the `@context` rename
  * pair as value-identity (P7/P8), DID extraction fallbacks (P9),
  * and a distributed encode→decode roundtrip (S3/K2).
  */
class EnvelopeSpec extends SparkSpec {
  import spark.implicits._

  private def sample = graft.sources.Tables.events(spark, sf).limit(200)

  private def envelope = EnvelopeOps.envelope(
    tradeEventId = concat(lit("trade-"), col("event_id")),
    symbol = concat(lit("SYM"), col("user_id") % 7),
    startTimestamp = date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
    ssi = col("event_id") % 2 === 1,
    tradeData = struct(
      concat(lit("T"), col("event_id")).as("Trade_Id"),
      array(lit("c")).as("Trade_Condition"),
      coalesce(col("value"), lit(0.0)).as("Price"),
      lit("SYM0").as("Symbol"),
      expr("unix_micros(ts) DIV 1000").as("Event_Timestamp"),
      lit(1.0).as("Volume")),
    tradeCredential = EnvelopeOps.vcCredential(
      vcId = concat(lit("vc:trade-"), col("event_id")),
      issuerDid = lit("did:web:graft.example:issuer"),
      subjectDid = concat(lit("did:key:z"), col("user_id")),
      issuanceDate = lit("2024-01-01T00:00:00Z"),
      claims = struct(
        concat(lit("T"), col("event_id")).as("Trade_Id"),
        lit(null).cast("array<string>").as("Trade_Condition"),
        lit(9.5).as("Price"), lit("SYM1").as("Symbol"),
        lit(5L).as("Event_Timestamp"), lit(2.0).as("Volume")),
      jwt = concat(lit("jwt-"), col("event_id"))))

  test("P5: exactly one union branch is populated, selected by ssi") {
    val df = sample.select(col("event_id"), envelope.as("ev"))
      .select(col("event_id"),
        col("ev.tradeData").isNotNull.as("has_td"),
        col("ev.tradeCredential").isNotNull.as("has_tc"))
    val bad = df.filter(
      col("has_td") === col("has_tc") ||
        (col("event_id") % 2 === 1) =!= col("has_tc")).count()
    assert(bad === 0)
  }

  test("P7/P8: denormalize then normalize preserves every field value") {
    val cred = col("ev").getField("tradeCredential")
    val roundtrip = sample.select(envelope.as("ev"))
      .filter(cred.isNotNull)
      .select(cred.as("cred"),
        EnvelopeOps.normalizeContext(
          EnvelopeOps.denormalizeContext(cred)).as("back"))
    val bad = roundtrip.filter(!(
      col("back.context") === col("cred.context") &&
        col("back.id") === col("cred.id") &&
        col("back.issuanceDate") === col("cred.issuanceDate") &&
        col("back.issuer") === col("cred.issuer") &&
        col("back.credentialSubject") === col("cred.credentialSubject") &&
        col("back.proof") === col("cred.proof") &&
        col("back.type") === col("cred.type"))).count()
    assert(bad === 0)
    // and the W3C form really carries the JSON name
    val w3c = sample.select(envelope.as("ev")).filter(cred.isNotNull)
      .select(EnvelopeOps.denormalizeContext(cred).as("w3c"))
    assert(w3c.schema("w3c").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.contains("@context"))
  }

  test("P9: record DID extraction falls back to None / unknown") {
    val withNullSubject = sample.select(col("event_id"), EnvelopeOps.envelope(
      tradeEventId = lit("t"), symbol = lit("s"), startTimestamp = lit("ts"),
      ssi = col("event_id") % 2 === 1,
      tradeData = struct(lit("T").as("Trade_Id")),
      tradeCredential = EnvelopeOps.vcCredential(
        vcId = lit("vc"), issuerDid = lit("i"),
        subjectDid = when(col("event_id") % 3 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("did:key:z"), col("user_id"))),
        issuanceDate = lit("d"), claims = struct(lit("T").as("Trade_Id")),
        jwt = lit("j"))).as("ev"))
      .select(col("event_id"),
        EnvelopeOps.recordDid(col("ev")).as("did"))
    val rows = withNullSubject.as[(Long, String)].collect()
    rows.foreach { case (id, did) =>
      if (id % 2 == 0) assert(did === "None")
      else if (id % 3 == 0) assert(did === "unknown")
      else assert(did.startsWith("did:key:z"))
    }
  }

  test("S3/K2: Dataset encode -> decode over partitions is lossless") {
    val events = sample.select(col("event_id"), envelope.as("ev"))
      .select(col("ev.*")).as[TradeEvent]
    val encoded = TradeAvroOps.encode(events)
    assert(encoded.columns.toSeq === Seq("key", "value"))
    val decoded = TradeAvroOps.decode(encoded)
    val before = events.collect().sortBy(_.trade_event_id)
    val after = decoded.collect().sortBy(_.trade_event_id)
    assert(after.toSeq === before.toSeq)
    // key = symbol (Kafka partitioning key in the reference)
    assert(encoded.select(col("key")).as[String].collect()
      .forall(_.startsWith("SYM")))
  }
}
