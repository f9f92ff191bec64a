package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.{AvroCodec, TradeEvent}

/** Dataset-level Avro ingress/egress for TradeEvent — the engine's
  * S3/K2 surface (the reference's registry Avro serializer on the
  * producer, kafka_producer/app/handlers/kafka_producer.py:93-132, and
  * deserializer on the consumer, kafka_consumer/app/handlers/
  * kafka_consumer.py:44-55).
  *
  * Spark 4's distribution ships avro CORE but not the spark-avro
  * connector (`from_avro`/`to_avro`), so the codec runs in
  * `mapPartitions`: one [[graft.model.AvroCodec]] (writer + reader +
  * reusable encoder/decoder/buffer) per PARTITION, the same
  * amortization the reference gets from its pooled registry
  * serializer — per row the cost is the binary encode/decode only.
  * At scale this is shuffle-free: both directions are narrow
  * per-partition maps.
  */
object TradeAvroOps {

  /** Egress (K2): events → Kafka-shaped (key, value) rows, key =
    * symbol (the reference partitions its topic by symbol key) and
    * value = binary Avro of the full envelope.
    */
  def encode(ds: Dataset[TradeEvent]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = new AvroCodec
      it.map(ev => (ev.symbol, codec.encode(ev)))
    }.toDF("key", "value")
  }

  /** Ingress (S3): Kafka-shaped rows (any frame with a binary `value`
    * column) → typed TradeEvent Dataset.
    */
  def decode(df: DataFrame): Dataset[TradeEvent] = {
    import df.sparkSession.implicits._
    df.select(col("value")).as[Array[Byte]].mapPartitions { it =>
      val codec = new AvroCodec
      it.map(codec.decode)
    }
  }

  /** Wire-true egress: the Confluent registry framing (0x0 magic +
    * 4-byte schema id) the reference's producer actually puts on the
    * topic (kafka_producer.py:49-62). Same shuffle-free
    * per-partition map as [[encode]]. */
  def encodeWire(ds: Dataset[TradeEvent], schemaId: Int): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = new AvroCodec
      it.map(ev => (ev.symbol, codec.encodeWire(ev, schemaId)))
    }.toDF("key", "value")
  }

  /** Wire-true ingress: validates the 5-byte registry header per
    * message (and, when `expectSchemaId` is set, pins the id — a
    * topic carrying a different schema version fails loudly instead
    * of mis-decoding). */
  def decodeWire(df: DataFrame,
                 expectSchemaId: Option[Int] = None): Dataset[TradeEvent] = {
    import df.sparkSession.implicits._
    df.select(col("value")).as[Array[Byte]].mapPartitions { it =>
      val codec = new AvroCodec
      it.map { bytes =>
        val (id, ev) = codec.decodeWire(bytes)
        expectSchemaId.foreach(want => require(id == want,
          s"schema id mismatch: frame has $id, expected $want"))
        ev
      }
    }
  }
}
