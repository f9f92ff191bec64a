package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.HealthSensorRecord
import graft.ops.HealthAvroOps
import graft.sources.Tables
import graft.identity.CredentialOps

/** Queries for the reference's SECOND declared stream —
  * HealthSensorRecord (health_sensor.avsc:1-29; consumer topic enum
  * kafka_consumer/app/main.py:25). The compose run leaves the topic
  * disabled, so there is no live feed to replay: records are
  * synthesized deterministically from the events table (the
  * injected-clock convention, SURVEY §7.4), which lets the DuckDB
  * oracle predict every field — including THROUGH the binary Avro
  * codec, which cannot invent values.
  */
object HealthQueries {

  /** Deterministic health-sensor synth: one record per event row,
    * every field a pure function of (event_id, user_id, ts).
    */
  def records(s: SparkSession, d: String): Dataset[HealthSensorRecord] =
    recordsFrom(Tables.events(s, d))

  /** The synth over ANY frame carrying (event_id, user_id, ts) —
    * shared by the batch entries and the streaming twin (the same
    * projection runs unchanged on a stream; StreamingSpec pins
    * stream==batch through the codec).
    */
  def recordsFrom(events: DataFrame): Dataset[HealthSensorRecord] = {
    val s = events.sparkSession
    import s.implicits._
    events.select(
      struct(
        concat(lit("hs-"), col("event_id")).as("id"),
        concat(lit("patient-"), col("user_id")).as("patient_id"),
        unix_micros(col("ts")).cast("string").as("event_timestamp"),
        concat(lit("sensor-"), col("event_id") % 50).as("sensor_id"),
        element_at(
          typedLit(Seq("temperature", "blood_pressure", "heart_rate")),
          (col("event_id") % 3 + 1).cast("int")).as("sensor_type"),
        (lit(36.0) + (col("event_id") % 40) / lit(10.0)).as("temperature"),
        (lit(100L) + col("user_id") % 60).cast("int").as("systolic_bp"),
        (lit(60L) + col("user_id") % 40).cast("int").as("diastolic_bp"),
        (lit(55L) + col("event_id") % 70).cast("int").as("heart_rate")
      ).as("data"),
      concat(lit("sig-"), col("event_id")).as("vc_store_signature"),
      unix_micros(col("ts")).cast("string").as("start_timestamp"),
      CredentialOps.didKey(col("user_id")).as("did"),
      concat(lit("jwt-"), col("event_id")).as("jwt")
    ).as[HealthSensorRecord]
  }

  /** Decoded-record flattening to the catalog's portable scalar types
    * (string/bigint/double only).
    */
  private def flatten(ds: Dataset[HealthSensorRecord]): DataFrame =
    ds.toDF().select(
      col("data.id").as("id"),
      col("data.patient_id").as("patient_id"),
      col("data.event_timestamp").as("event_timestamp"),
      col("data.sensor_id").as("sensor_id"),
      col("data.sensor_type").as("sensor_type"),
      col("data.temperature").as("temperature"),
      col("data.systolic_bp").cast("bigint").as("systolic_bp"),
      col("data.diastolic_bp").cast("bigint").as("diastolic_bp"),
      col("data.heart_rate").cast("bigint").as("heart_rate"),
      col("did").as("did"),
      col("jwt").as("jwt"))

  private val synthSql = """SELECT
      'hs-' || event_id AS id,
      'patient-' || user_id AS patient_id,
      CAST(epoch_us(ts) AS VARCHAR) AS event_timestamp,
      'sensor-' || (event_id % 50) AS sensor_id,
      CASE event_id % 3 WHEN 0 THEN 'temperature'
        WHEN 1 THEN 'blood_pressure' ELSE 'heart_rate' END AS sensor_type,
      CAST(36.0 AS DOUBLE) + CAST(event_id % 40 AS DOUBLE) / 10.0
        AS temperature,
      CAST(100 + user_id % 60 AS BIGINT) AS systolic_bp,
      CAST(60 + user_id % 40 AS BIGINT) AS diastolic_bp,
      CAST(55 + event_id % 70 AS BIGINT) AS heart_rate,
      'did:key:z' || md5(CAST(user_id AS VARCHAR)) AS did,
      'jwt-' || event_id AS jwt
    FROM events"""

  /** S3 twin for the health stream: synth → binary Avro encode →
    * decode → flattened scalars against the synth-predicting oracle,
    * i.e. the codec must be value-lossless for every field including
    * the nested SensorData record and the int/double vitals.
    */
  private val s3HealthRoundtrip = QueryDef(
    "s3_health_roundtrip",
    (s, d) => flatten(HealthAvroOps.decode(HealthAvroOps.encode(records(s, d)))),
    Some(synthSql))

  /** A1 counters over the health stream, THROUGH the codec (the
    * S3→A1 hot path the consumer would run for this topic): counts
    * by sensor_type × triage status, where a record is abnormal by
    * the vital band of ITS OWN sensor type (temp ≥ 38.0 °C,
    * BP ≥ 140/90, HR > 100 bpm).
    */
  private val a1HealthCounters = QueryDef(
    "a1_health_counters",
    (s, d) => {
      val rec = HealthAvroOps.decode(HealthAvroOps.encode(records(s, d))).toDF()
      val abnormal =
        when(col("data.sensor_type") === "temperature",
          col("data.temperature") >= 38.0)
          .when(col("data.sensor_type") === "blood_pressure",
            col("data.systolic_bp") >= 140 || col("data.diastolic_bp") >= 90)
          .otherwise(col("data.heart_rate") > 100)
      rec.groupBy(col("data.sensor_type").as("sensor_type"),
          when(abnormal, lit("abnormal")).otherwise(lit("normal"))
            .as("status"))
        .agg(count(lit(1)).as("n"))
    },
    Some(s"""WITH r AS ($synthSql)
      SELECT sensor_type,
        CASE WHEN (sensor_type = 'temperature' AND temperature >= 38.0)
          OR (sensor_type = 'blood_pressure'
              AND (systolic_bp >= 140 OR diastolic_bp >= 90))
          OR (sensor_type = 'heart_rate' AND heart_rate > 100)
        THEN 'abnormal' ELSE 'normal' END AS status,
        COUNT(*) AS n
      FROM r GROUP BY 1, 2"""))

  val defs: Seq[QueryDef] = Seq(s3HealthRoundtrip, a1HealthCounters)
}
