package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.identity.CredentialOps
import graft.model.TradeEvent

/** The reference's consumer topology as ONE reusable composition —
  * WS frame parse (P1/P3/P4) → default-fill (P2) → envelope build
  * (P5) with real credential signing (U1) → binary Avro egress +
  * ingress (K2/S3) → verification (U2) → the per-trade readout the
  * Q1/A1 analytics aggregate. Pure `DataFrame => DataFrame` over
  * codegen'd columns + the codec/crypto UDF seams, so the SAME
  * function runs as a batch query (the `e2e_hot_path` catalog entry
  * aggregates its output) and as a Structured Streaming query from
  * any unbounded frame source ([[graft.streaming.Streams
  * .wsReplayStream]]'s rate-driven replay, a Kafka topic, or a real
  * socket connector) — `WsReplaySpec` certifies stream == batch
  * row-for-row.
  *
  * Reference shape: finnhub.go:172-224 (frame dispatch) →
  * kafka_producer sign path → kafka_consumer/app/handlers/
  * kafka_event_handler.py verify + metrics readout.
  */
object HotPath {

  /** Per-trade readout columns: (symbol, is_ssi, verified, t_ms).
    * `frames` must carry the raw WS frame JSON in `jsonCol`.
    */
  def perTradeReadout(spark: SparkSession, frames: DataFrame,
                      jsonCol: String = "raw"): DataFrame = {
    import spark.implicits._
    val trades = EventOps.parseWsFrames(frames, jsonCol)
      .withColumn("Trade_Id", concat(lit("T"), col("Event_Timestamp")))
      .withColumn("Price", coalesce(col("Price"), lit(0.0)))
      .withColumn("Volume", coalesce(col("Volume"), lit(0.0)))
    val perTradeSsi = col("Event_Timestamp") % 2 === 1
    val subject = concat(lit("did:key:z"), col("Event_Timestamp") % 1000)
    val td = struct(col("Trade_Id"), col("Trade_Condition"), col("Price"),
      col("Symbol"), col("Event_Timestamp"), col("Volume"))
    val cred = EnvelopeOps.vcCredential(
      vcId = concat(lit("vc:trade-"), col("Event_Timestamp")),
      issuerDid = lit("did:web:graft.example:issuer"),
      subjectDid = subject,
      issuanceDate = lit("2024-01-01T00:00:00Z"),
      claims = td,
      jwt = CredentialOps.signJwt(to_json(struct(subject.as("sub")))))
    val env = EnvelopeOps.envelope(
      concat(lit("trade-"), col("Event_Timestamp")), col("Symbol"),
      lit("2024-01-01T00:00:00Z"), perTradeSsi, td, cred)
    val decoded = TradeAvroOps.decode(TradeAvroOps.encode(
      trades.select(env.as("ev")).select(col("ev.*")).as[TradeEvent]))
      .toDF()
    decoded.select(col("symbol"),
      col("tradeCredential").isNotNull.as("is_ssi"),
      when(col("tradeCredential").isNotNull,
        CredentialOps.verifyJwt(col("tradeCredential.proof.jwt")))
        .as("verified"),
      coalesce(col("tradeData.Event_Timestamp"),
        col("tradeCredential.credentialSubject.claims.TradeData.Event_Timestamp"))
        .as("t_ms"))
  }

  /** Q1/A1 aggregate over [[perTradeReadout]] output: per-symbol
    * trade/ssi/verified counters + p95 end-to-end latency seconds
    * against the injected clock.
    */
  def q1Aggregate(readout: DataFrame): DataFrame =
    readout.groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_trades"),
        count(when(col("is_ssi"), 1)).as("n_ssi"),
        count(when(col("verified"), 1)).as("n_verified"),
        round(expr(s"percentile((${EventOps.NowEpochMicros / 1000}" +
          " - t_ms) / 1000.0D, 0.95D)"), 6).as("p95_latency_s"))
}
