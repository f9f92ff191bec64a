package graft.datapipe

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Content-defined chunking (Rabin-style rolling hash): split a
  * document at positions where the rolling hash of the last `window`
  * bytes has `maskBits` low zero bits. Because boundaries depend only
  * on LOCAL content, an edit near the start shifts only nearby
  * boundaries — downstream chunks RESYNCHRONIZE — so passage-level
  * dedup across edited copies of a document still matches most
  * chunks, where fixed-size splitting would misalign everything after
  * the edit. This is the sub-document dedup primitive the whole-doc
  * fingerprint (TextAnalysis.fingerprint) can't provide.
  *
  * The chunker is a pure per-document function (mapPartitions, no
  * shuffle); the downstream chunk-hash dedup is the same one-shuffle
  * groupBy as exact dedup.
  */
object Chunker {

  /** Boundary offsets (exclusive end positions) of the chunks. */
  def boundaries(bytes: Array[Byte], window: Int, maskBits: Int,
                 minLen: Int, maxLen: Int): Seq[Int] = {
    val mask = (1L << maskBits) - 1
    val out = Seq.newBuilder[Int]
    var h = 0L
    var start = 0
    var i = 0
    while (i < bytes.length) {
      // polynomial rolling-ish hash over a sliding window: cheap,
      // deterministic, and local (old bytes age out by shifting)
      h = (h << 1) + (bytes(i) & 0xff)
      if (i - start + 1 >= window * 2) h &= (1L << 48) - 1
      val len = i - start + 1
      if ((len >= minLen && (h & mask) == mask) || len >= maxLen) {
        out += i + 1
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < bytes.length) out += bytes.length
    out.result()
  }

  def chunksOf(text: String, window: Int = 16, maskBits: Int = 6,
               minLen: Int = 32, maxLen: Int = 512): Seq[String] = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val ends = boundaries(bytes, window, maskBits, minLen, maxLen)
    var start = 0
    ends.map { end =>
      val s = new String(bytes, start, end - start,
        java.nio.charset.StandardCharsets.UTF_8)
      start = end
      s
    }
  }

  final case class Chunk(doc_id: Long, chunk_idx: Long, chunk_md5: String,
                         chunk_len: Long)

  /** One row per chunk, hashed for dedup — runs inside mapPartitions
    * so chunking distributes with the document scan. */
  def chunkTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          chunksOf(Option(text).getOrElse("")).zipWithIndex.map {
            case (c, i) =>
              val bytes = c.getBytes("UTF-8")
              val hex = md.digest(bytes).map("%02x".format(_)).mkString
              Chunk(id, i.toLong, hex, bytes.length.toLong)
          }
        }
      }
      .toDF()
  }
}
