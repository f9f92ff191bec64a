package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.TradeEvent
import graft.ops.{EnvelopeOps, EventOps, TradeAvroOps}
import graft.sources.Tables

/** TradeEvent envelope + Avro path entries (SURVEY.md §2: P5, P7-P9,
  * P13, S3/K2). The synthetic trade derivation from the events table
  * is deterministic and SQL-expressible, so every entry — including
  * the binary Avro encode→decode roundtrip — has a DuckDB oracle: the
  * oracle computes the expected FIELD VALUES directly from events,
  * and the Spark side must reproduce them after building (and for S3
  * round-tripping through bytes) the nested envelope.
  *
  *  - trade fields: trade_event_id/symbol/start_timestamp per
  *    trade_handler.go:122-127; Trade_* claims per
  *    data_synthesizer/models/types.go:9-34 (P2-style default fill
  *    for null price/volume);
  *  - per-row `ssi` toggle (event_id parity) stands in for the
  *    reference's global SSI_VALIDATION so one batch exercises both
  *    envelope branches.
  */
object EnvelopeQueries {

  private val ssi: Column = col("event_id") % 2 === 1

  /** Deterministic TradeData claims struct from an events row. */
  private def tradeData: Column = struct(
    concat(lit("T"), col("event_id")).as("Trade_Id"),
    when(col("event_type").isNull || col("event_type") === "",
      lit(null).cast("array<string>"))
      .otherwise(array(col("event_type"))).as("Trade_Condition"),
    coalesce(col("value"), lit(0.0)).as("Price"),
    concat(lit("SYM"), col("user_id") % 7).as("Symbol"),
    expr("unix_micros(ts) DIV 1000").as("Event_Timestamp"),
    coalesce(get_json_object(col("props"), "$.k").cast("double"), lit(0.0))
      .as("Volume"))

  private def startTs: Column =
    date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'")

  private def credential(subjectDid: Column): Column =
    EnvelopeOps.vcCredential(
      vcId = concat(lit("vc:trade-"), col("event_id")),
      issuerDid = lit("did:web:graft.example:issuer"),
      subjectDid = subjectDid,
      issuanceDate = startTs,
      claims = tradeData,
      jwt = concat(lit("jwt-"), col("event_id")))

  /** Events → envelope column `ev` (+ event_id). Avro-encodable:
    * every required wire field is non-null. */
  private def envelopes(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(col("event_id"),
      EnvelopeOps.envelope(
        tradeEventId = concat(lit("trade-"), col("event_id")),
        symbol = concat(lit("SYM"), col("user_id") % 7),
        startTimestamp = startTs,
        ssi = ssi,
        tradeData = tradeData,
        tradeCredential = credential(concat(lit("did:key:z"), col("user_id"))))
        .as("ev"))

  /** Envelope struct → oracle-comparable scalars. The coalesce pairs
    * read THROUGH whichever branch is populated, so a wrong either-or
    * or a lossy roundtrip shows up as a value/hash mismatch. */
  private def flatten(df: DataFrame): DataFrame = {
    val ev = col("ev")
    val td = ev.getField("tradeData")
    val claims = ev.getField("tradeCredential").getField("credentialSubject")
      .getField("claims").getField("TradeData")
    def branch(f: String): Column =
      coalesce(td.getField(f), claims.getField(f))
    df.select(
      ev.getField("trade_event_id").as("trade_event_id"),
      ev.getField("symbol").as("symbol"),
      ev.getField("start_timestamp").as("start_timestamp"),
      td.isNotNull.as("has_trade_data"),
      ev.getField("tradeCredential").isNotNull.as("has_credential"),
      branch("Trade_Id").as("trade_id"),
      array_join(branch("Trade_Condition"), ",").as("trade_condition"),
      branch("Price").as("price"),
      branch("Event_Timestamp").as("event_ts_ms"),
      branch("Volume").as("volume"),
      ev.getField("tradeCredential").getField("proof").getField("jwt").as("jwt"))
  }

  /** The SQL twin of [[flatten]]∘[[envelopes]]. */
  private val flatSql = """SELECT
      'trade-' || event_id AS trade_event_id,
      'SYM' || (user_id % 7) AS symbol,
      strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS start_timestamp,
      event_id % 2 = 0 AS has_trade_data,
      event_id % 2 = 1 AS has_credential,
      'T' || event_id AS trade_id,
      CASE WHEN event_type IS NULL OR event_type = '' THEN NULL
           ELSE event_type END AS trade_condition,
      COALESCE(value, 0.0) AS price,
      epoch_us(ts) // 1000 AS event_ts_ms,
      COALESCE(CAST(json_extract_string(props, '$.k') AS DOUBLE), 0.0) AS volume,
      CASE WHEN event_id % 2 = 1 THEN 'jwt-' || event_id END AS jwt
    FROM events"""

  // ---------------------------------------------------------------

  private val p5EnvelopeBuild = QueryDef(
    "p5_envelope_build",
    (s, d) => flatten(envelopes(s, d)),
    Some(flatSql))

  /** S3/K2: envelope → binary Avro (K2 egress shape: symbol key +
    * bytes value) → decode back to typed TradeEvents (S3 ingress) →
    * same flattened scalars as P5, checked against the same oracle —
    * i.e. the binary codec must be value-lossless including the
    * union(null,T) branches and the optional Trade_Condition.
    */
  private val s3AvroRoundtrip = QueryDef(
    "s3_avro_roundtrip",
    (s, d) => {
      import s.implicits._
      val events = envelopes(s, d).select(col("ev.*")).as[TradeEvent]
      val decoded = TradeAvroOps.decode(TradeAvroOps.encode(events))
      flatten(decoded.toDF().select(struct(col("*")).as("ev")))
    },
    Some(flatSql))

  /** S3/K2 wire-true: the same roundtrip THROUGH the Confluent
    * registry framing (0x0 magic + 4-byte big-endian schema id —
    * the public wire format the reference's AvroSerializer/
    * AvroDeserializer emit, kafka_producer.py:49-62 /
    * kafka_consumer.py:44-55). The decode pins the schema id, so a
    * frame from a different schema version fails loudly; same P5
    * oracle certifies the 5-byte header is transparent to values.
    */
  private val s3WireRoundtrip = QueryDef(
    "s3_wire_roundtrip",
    (s, d) => {
      import s.implicits._
      val events = envelopes(s, d).select(col("ev.*")).as[TradeEvent]
      val decoded = TradeAvroOps.decodeWire(
        TradeAvroOps.encodeWire(events, schemaId = 7),
        expectSchemaId = Some(7))
      flatten(decoded.toDF().select(struct(col("*")).as("ev")))
    },
    Some(flatSql))

  /** P8∘P7 = identity on credential values: wire `context` →
    * W3C `@context` → back, asserted field-wise (field ORDER shifts,
    * which JSON-object semantics don't observe — so the check is on
    * values, the thing the rename must preserve).
    */
  private val p7p8ContextRoundtrip = QueryDef(
    "p7_context_roundtrip",
    (s, d) => {
      val cred = col("ev").getField("tradeCredential")
      envelopes(s, d).filter(ssi)
        .select(col("event_id"), cred.as("cred"),
          EnvelopeOps.denormalizeContext(cred).as("w3c"))
        .select(col("event_id"), col("cred"), col("w3c"),
          EnvelopeOps.normalizeContext(col("w3c")).as("back"))
        .select(
          col("event_id"),
          element_at(col("w3c").getField("@context"), 1).as("w3c_context0"),
          col("back").getField("id").as("vc_id"),
          (col("back").getField("context") === col("cred").getField("context") &&
            col("back").getField("id") === col("cred").getField("id") &&
            col("back").getField("proof") === col("cred").getField("proof") &&
            col("back").getField("credentialSubject") ===
              col("cred").getField("credentialSubject")).as("roundtrip_ok"))
    },
    Some("""SELECT event_id,
      'https://www.w3.org/2018/credentials/v1' AS w3c_context0,
      'vc:trade-' || event_id AS vc_id,
      TRUE AS roundtrip_ok
      FROM events WHERE event_id % 2 = 1"""))

  /** P9: the reference's dict-level extraction tolerates a MISSING
    * subject id (JSON boundary, pre-schema), so this entry derives
    * its own credential variant with nulls injected — the Avro wire
    * schema (exercised by S3 above) requires the id. */
  private val p9NestedExtract = QueryDef(
    "p9_nested_extract",
    (s, d) => {
      val subject = when(col("user_id") % 19 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("did:key:z"), col("user_id")))
      Tables.events(s, d)
        .select(col("event_id"),
          EnvelopeOps.envelope(
            tradeEventId = concat(lit("trade-"), col("event_id")),
            symbol = concat(lit("SYM"), col("user_id") % 7),
            startTimestamp = startTs,
            ssi = ssi,
            tradeData = tradeData,
            tradeCredential = credential(subject)).as("ev"))
        .select(col("event_id"), EnvelopeOps.recordDid(col("ev")).as("record_did"))
    },
    Some("""SELECT event_id,
      CASE WHEN event_id % 2 = 0 THEN 'None'
           WHEN user_id % 19 = 0 THEN 'unknown'
           ELSE 'did:key:z' || user_id END AS record_did
      FROM events"""))

  private val p13VcEnvelope = QueryDef(
    "p13_vc_envelope",
    (s, d) => {
      val cred = col("ev").getField("tradeCredential")
      val req = col("req")
      envelopes(s, d).filter(ssi)
        .select(col("event_id"), EnvelopeOps.vcIssueRequest(cred).as("req"))
        .select(
          col("event_id"),
          req.getField("proofFormat").as("proof_format"),
          req.getField("credential").getField("id").as("vc_id"),
          req.getField("credential").getField("issuer").getField("id")
            .as("issuer_did"),
          req.getField("credential").getField("credentialSubject").getField("id")
            .as("subject_did"),
          req.getField("credential").getField("issuanceDate").as("issuance_date"),
          element_at(req.getField("credential").getField("context"), 1)
            .as("context0"),
          element_at(req.getField("credential").getField("type"), 1)
            .as("type0"),
          req.getField("credential").getField("credentialSubject")
            .getField("claims").getField("TradeData").getField("Trade_Id")
            .as("claims_trade_id"))
    },
    Some("""SELECT event_id,
      'jwt' AS proof_format,
      'vc:trade-' || event_id AS vc_id,
      'did:web:graft.example:issuer' AS issuer_did,
      'did:key:z' || user_id AS subject_did,
      strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS issuance_date,
      'https://www.w3.org/2018/credentials/v1' AS context0,
      'VerifiableCredential' AS type0,
      'T' || event_id AS claims_trade_id
      FROM events WHERE event_id % 2 = 1"""))

  /** Either-or invariant as a checked constraint over a corpus with
    * deterministic violations injected (every 97th event gets BOTH
    * branches nulled — the shape a buggy producer emits). */
  private val p5EnvelopeValidate = QueryDef(
    "p5_envelope_validate",
    (s, d) => {
      val broken = col("event_id") % 97 === 0
      val ev = EnvelopeOps.envelope(
        tradeEventId = concat(lit("trade-"), col("event_id")),
        symbol = concat(lit("SYM"), col("user_id") % 7),
        startTimestamp = startTs,
        ssi = ssi && !broken,
        tradeData = when(!broken, tradeData),
        tradeCredential = credential(concat(lit("did:key:z"), col("user_id"))))
      EnvelopeOps.validateEitherOr(
        Tables.events(s, d).select(col("event_id"), ev.as("ev")), "ev")
        .select(col("event_id"), col("envelope_valid"))
    },
    Some("""SELECT event_id, event_id % 97 <> 0 AS envelope_valid
      FROM events"""))

  /** The reference's hot path composed END-TO-END in one query —
    * WS frame parse (P1/P3/P4) → default-fill (P2) → envelope build
    * (P5) with REAL credential signing (U1) → binary Avro egress +
    * ingress (K2/S3) → verification (U2) → per-symbol throughput and
    * p95 latency analytics (A1/Q1). The oracle predicts the
    * observable outcome from the deterministic rules alone, so a
    * break anywhere in the chain (parse, codec, crypto, quantile)
    * mismatches.
    */
  private val e2eHotPath = QueryDef(
    "e2e_hot_path",
    // the full composition lives in graft.ops.HotPath — the SAME
    // function WsReplaySpec streams from the unbounded replay source
    // (stream == batch certified there); this entry certifies the
    // batch values against the DuckDB oracle
    (s, d) => graft.ops.HotPath.q1Aggregate(
      graft.ops.HotPath.perTradeReadout(s, WsFrames.frames(s, d), "raw")),
    Some(s"""WITH tr AS (
        SELECT 'SYM' || (user_id % 7) AS symbol, epoch_us(ts) // 1000 AS t_ms
        FROM events WHERE event_id % 50 <> 0)
      SELECT symbol, COUNT(*) AS n_trades,
        COUNT(*) FILTER (WHERE t_ms % 2 = 1) AS n_ssi,
        COUNT(*) FILTER (WHERE t_ms % 2 = 1) AS n_verified,
        round(quantile_cont((${EventOps.NowEpochMicros / 1000} - t_ms)
          / 1000.0, 0.95), 6) AS p95_latency_s
      FROM tr GROUP BY symbol"""))

  val defs: Seq[QueryDef] = Seq(
    p5EnvelopeBuild, s3AvroRoundtrip, s3WireRoundtrip, p7p8ContextRoundtrip,
    p9NestedExtract, p13VcEnvelope, p5EnvelopeValidate, e2eHotPath)
}
