package graft.datapipe

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata; decode / feature-extract run
  * per partition so a real decoder amortizes its init (codec tables,
  * model weights) across a batch — the Scala analogue of the
  * mapInPandas batch shape.
  *
  * The container ships no image/audio libraries, so the decode step
  * is a clearly-marked deterministic STUB (md5-derived fake
  * dimensions). The Spark-side contract — schema, binary encoding,
  * partition-batched UDF signature — is real and oracle-tested.
  */
object Multimodal {

  final case class MediaMeta(doc_id: Long, n_bytes: Long,
                             width: Long, height: Long)

  /** STUB decoder: a real implementation parses the media header.
    * Deterministic stand-in: dimensions from the payload's md5.
    */
  def stubDecode(id: Long, payload: Array[Byte]): MediaMeta = {
    val digest = MessageDigest.getInstance("MD5").digest(payload)
    val hex = digest.map("%02x".format(_)).mkString
    MediaMeta(id, payload.length.toLong,
      java.lang.Long.parseLong(hex.substring(0, 4), 16) % 1024,
      java.lang.Long.parseLong(hex.substring(4, 8), 16) % 1024)
  }

  /** documents.text → binary payload → per-partition decode. */
  def decodeMetadata(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init happens here in a real codec
        it.map { case (id, payload) => stubDecode(id, payload) }
      }
      .toDF()
  }
}
