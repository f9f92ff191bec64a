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

  final case class MediaFeatures(doc_id: Long, f0: Double, f1: Double,
                                 f2: Double, f3: Double)

  /** STUB feature extractor (a real one runs a vision/audio model per
    * partition-loaded weights): 4 deterministic md5-derived unit-range
    * doubles, so the DuckDB oracle reproduces them.
    */
  def stubFeatures(id: Long, payload: Array[Byte]): MediaFeatures = {
    val hex = MessageDigest.getInstance("MD5").digest(payload)
      .map("%02x".format(_)).mkString
    def f(i: Int): Double =
      java.lang.Long.parseLong(hex.substring(i * 4, i * 4 + 4), 16) / 65536.0
    MediaFeatures(id, f(0), f(1), f(2), f(3))
  }

  /** Embedding-extraction plumbing: binary → fixed-width feature
    * vector, batched per partition (model weights load once per
    * partition in a real extractor — the mapInPandas amortization).
    */
  def extractFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition model init happens here in a real extractor
        it.map { case (id, payload) => stubFeatures(id, payload) }
      }
      .toDF()
  }

  final case class Frame(doc_id: Long, frame_idx: Long,
                         frame: Array[Byte])

  /** Frame-sampling plumbing for video-like payloads: one input row
    * fans out to one row per fixed-size frame (STUB: byte chunks of
    * `frameBytes`; a real sampler seeks keyframes). The fan-out runs
    * inside mapPartitions — frames never gather on the driver, and
    * downstream per-frame operators (decode, features) distribute
    * over the exploded rows.
    */
  def frameSample(spark: SparkSession, docs: DataFrame,
                  frameBytes: Int): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          payload.grouped(frameBytes).zipWithIndex
            .map { case (chunk, i) => Frame(id, i.toLong, chunk) }
        }
      }
      .toDF()
  }

  /** Resize plumbing (STUB: crop to `w*h` bytes; a real resize
    * decodes, scales, re-encodes — same binary→binary partition-batch
    * signature).
    */
  def resize(spark: SparkSession, docs: DataFrame, w: Int, h: Int): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) => (id, payload.take(w * h)) }
      }
      .toDF("doc_id", "resized")
  }
}
