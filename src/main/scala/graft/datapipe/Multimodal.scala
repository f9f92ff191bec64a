package graft.datapipe

import java.io.ByteArrayInputStream
import java.security.MessageDigest

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: image payloads are opaque `binary`
  * columns decoded / feature-extracted / resized per partition, so a
  * real decoder amortizes its init across a batch — the Scala
  * analogue of the mapInPandas batch shape.
  *
  * The media bytes are REAL: each document carries a deterministic
  * 24-bit uncompressed BMP (manually encoded little-endian header +
  * bottom-up padded pixel rows) whose dimensions and pixel values
  * derive from md5(text) / doc_id by closed-form rules, and every
  * operator decodes those bytes with the JDK's actual BMP reader
  * (`javax.imageio`) — nothing downstream of [[imageCorpus]] looks at
  * the generation rule. The rules exist so the external oracle can
  * verify the DECODED output (width/height from the real header,
  * integer pixel sums from the real raster) by independent
  * arithmetic. In production the generator is replaced by reading a
  * bytes column from storage; decode/feature/resize keep the same
  * binary→typed partition-batched contract.
  *
  * Reference multimodal surface: the pipeline treats payloads as
  * opaque envelopes end-to-end; these operators add the
  * training-data-pipeline media path the builder brief asks for.
  */
object Multimodal {

  /** BMP geometry: 54-byte header (14 file + 40 info), 24-bit BI_RGB,
    * each pixel row padded to a 4-byte boundary, rows stored
    * bottom-up.
    */
  val HeaderBytes = 54
  def rowSize(w: Int): Int = ((3 * w + 3) / 4) * 4
  def bmpSize(w: Int, h: Int): Int = HeaderBytes + h * rowSize(w)

  /** Corpus dimension rule: md5(text) hex nibbles → width, height in
    * [8, 31]. Small enough that the oracle can afford a per-pixel
    * generate_series replay at verification scale.
    */
  def dims(text: String): (Int, Int) = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val w = 8 + (java.lang.Long.parseLong(hex.substring(0, 4), 16) % 24).toInt
    val h = 8 + (java.lang.Long.parseLong(hex.substring(4, 8), 16) % 24).toInt
    (w, h)
  }

  /** Per-channel pixel rules (doc_id-seeded so images differ). */
  def pixR(id: Long, x: Int, y: Int): Int = ((x * 31L + y * 17L + id * 11L) % 256L).toInt
  def pixG(id: Long, x: Int, y: Int): Int = ((x * 13L + y * 7L + id * 3L) % 256L).toInt
  def pixB(id: Long, x: Int, y: Int): Int = ((x * 5L + y * 29L + id * 7L) % 256L).toInt

  /** Manual 24-bit BMP encoder. `pix(x, y)` returns (r, g, b) with
    * (0, 0) the TOP-left pixel; rows are written bottom-up per the
    * format, so a decoder's (x, y) matches `pix`'s coordinates.
    */
  def encodeBmp(w: Int, h: Int, pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val row = rowSize(w)
    val size = HeaderBytes + h * row
    val b = new Array[Byte](size)
    def putInt(off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte
      b(off + 1) = ((v >> 8) & 0xff).toByte
      b(off + 2) = ((v >> 16) & 0xff).toByte
      b(off + 3) = ((v >> 24) & 0xff).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    putInt(2, size) // file size
    putInt(10, HeaderBytes) // pixel-data offset
    putInt(14, 40) // BITMAPINFOHEADER size
    putInt(18, w)
    putInt(22, h) // positive height = bottom-up rows
    b(26) = 1 // planes
    b(28) = 24 // bits per pixel
    putInt(30, 0) // BI_RGB, uncompressed
    putInt(34, h * row) // image size
    putInt(38, 2835); putInt(42, 2835) // 72 DPI in px/metre
    var y = 0
    while (y < h) {
      // row y of the image is stored at slot (h-1-y) from the header
      val off = HeaderBytes + (h - 1 - y) * row
      var x = 0
      while (x < w) {
        val (r, g, bl) = pix(x, y)
        b(off + 3 * x) = bl.toByte
        b(off + 3 * x + 1) = g.toByte
        b(off + 3 * x + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    b
  }

  /** Deterministic image corpus: (doc_id, img) with real BMP bytes.
    * The generator stands in for reading a media bytes column from
    * storage; everything downstream decodes `img` for real.
    */
  def imageCorpus(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val (w, h) = dims(text)
          (id, encodeBmp(w, h, (x, y) => (pixR(id, x, y), pixG(id, x, y), pixB(id, x, y))))
        }
      }
      .toDF("doc_id", "img")
  }

  /** Decode a BMP with the JDK's real reader. In-memory stream, no
    * ImageIO disk cache (set per call site before the batch loop).
    */
  def decodeBmp(bytes: Array[Byte]): java.awt.image.BufferedImage =
    ImageIO.read(new ByteArrayInputStream(bytes))

  final case class MediaMeta(doc_id: Long, n_bytes: Long,
                             width: Long, height: Long)

  /** binary → decoded metadata: the width/height come from parsing
    * the actual BMP header via javax.imageio, not from the
    * generation rule — the oracle recomputes the rule independently
    * and the match proves the decode.
    */
  def decodeMetadata(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    imageCorpus(spark, docs)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false) // per-partition decoder init
        it.map { case (id, payload) =>
          val img = decodeBmp(payload)
          MediaMeta(id, payload.length.toLong, img.getWidth.toLong, img.getHeight.toLong)
        }
      }
      .toDF()
  }

  final case class MediaFeatures(doc_id: Long, f0: Double, f1: Double,
                                 f2: Double, f3: Double)

  /** Feature extraction over the DECODED raster: per-channel means
    * and mean luminance. Integer pixel sums are exact in any engine,
    * so one final IEEE division keeps the doubles bit-identical to
    * the oracle's replay (FP-summation order never comes into play).
    */
  def extractFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    imageCorpus(spark, docs)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, payload) =>
          val img = decodeBmp(payload)
          val (w, h) = (img.getWidth, img.getHeight)
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff
              sg += (rgb >> 8) & 0xff
              sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          MediaFeatures(id,
            sr / (255.0 * n), sg / (255.0 * n), sb / (255.0 * n),
            (sr + sg + sb) / (3.0 * 255.0 * n))
        }
      }
      .toDF()
  }

  final case class MediaStats(doc_id: Long, width: Long, height: Long,
                              n_bytes: Long, pix_sum: Long)

  /** Decode ANY (id, bmp-bytes) table to real raster stats: header
    * dimensions plus the exact integer sum of all channel values —
    * the oracle-friendly digest of the full pixel contents. Used to
    * verify re-encoded media (e.g. [[resize]] output) end-to-end.
    */
  def decodeStats(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val Seq(idCol, byteCol) = media.columns.take(2).toSeq
    media.select(col(idCol), col(byteCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, payload) =>
          val img = decodeBmp(payload)
          val (w, h) = (img.getWidth, img.getHeight)
          var s = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          MediaStats(id, w.toLong, h.toLong, payload.length.toLong, s)
        }
      }
      .toDF()
  }

  final case class Frame(doc_id: Long, frame_idx: Long,
                         frame: Array[Byte])

  /** Frame-sampling plumbing for video-like payloads: one input row
    * fans out to one row per fixed-size chunk of the media bytes (a
    * real sampler seeks keyframes; chunking keeps the oracle
    * arithmetic closed-form). The fan-out runs inside mapPartitions —
    * frames never gather on the driver, and downstream per-frame
    * operators distribute over the exploded rows.
    */
  def frameSample(spark: SparkSession, docs: DataFrame,
                  frameBytes: Int): DataFrame = {
    import spark.implicits._
    imageCorpus(spark, docs)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          payload.grouped(frameBytes).zipWithIndex
            .map { case (chunk, i) => Frame(id, i.toLong, chunk) }
        }
      }
      .toDF()
  }

  /** Deterministic NEAR-duplicate image corpus: every document's BMP
    * plus a perturbed twin at doc_id+1000000 — same dimensions, same
    * pixel rules, except the red channel of the (x < 2, y < 2) corner
    * shifts by +16 mod 256. A handful of changed pixels leaves the
    * perceptual hash within a few bits of the original (measured
    * hamming 0-2 on this corpus), which is exactly the near-dup
    * signature [[aHash64]] + banded hamming pairing must catch. The
    * twin rule is closed-form so the external oracle rebuilds both
    * rasters by independent arithmetic.
    */
  def imageCorpusWithTwins(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val (w, h) = dims(text)
          val orig = encodeBmp(w, h,
            (x, y) => (pixR(id, x, y), pixG(id, x, y), pixB(id, x, y)))
          val twin = encodeBmp(w, h, (x, y) => {
            val r = if (x < 2 && y < 2) (pixR(id, x, y) + 16) % 256
                    else pixR(id, x, y)
            (r, pixG(id, x, y), pixB(id, x, y))
          })
          Iterator((id, orig), (id + 1000000L, twin))
        }
      }
      .toDF("doc_id", "img")
  }

  /** 64-bit average-hash (aHash) of a DECODED raster — the standard
    * perceptual image fingerprint: map each pixel to one cell of an
    * 8×8 grid (bx = x·8/w, integer floor), sum integer luminance
    * (r+g+b) per cell, and set bit (by·8+bx) iff the cell's mean
    * luminance exceeds the image's mean. The threshold compares by
    * integer CROSS-MULTIPLICATION (cellSum·nPixels > totalSum·cellCnt)
    * so the code is exact in any engine — no float division, no
    * summation-order surface. Overflows only past ~1e8 pixels per
    * image (765·n² vs 2^63); production gigapixel inputs should
    * downscale first, as every published aHash pipeline does anyway.
    */
  def aHash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val cellSum = new Array[Long](64)
    val cellCnt = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val l = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)).toLong
        val c = by * 8 + x * 8 / w
        cellSum(c) += l
        cellCnt(c) += 1
        total += l
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    var code = 0L
    var c = 0
    while (c < 64) {
      if (cellCnt(c) > 0 && cellSum(c) * n > total * cellCnt(c))
        code |= 1L << c
      c += 1
    }
    code
  }

  /** (id, code) perceptual-hash table over ANY (id, bmp-bytes) media
    * frame: real `javax.imageio` decode per row, partition-batched
    * like every operator here. The output feeds the banded-hamming
    * pair machinery ([[Dedup.codePairs]]) unchanged — image near-dup
    * detection is text simhash with a different code generator.
    */
  def aHashTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val Seq(idCol, byteCol) = media.columns.take(2).toSeq
    media.select(col(idCol), col(byteCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, payload) => (id, aHash64(decodeBmp(payload))) }
      }
      .toDF("id", "code")
  }

  // --- audio (WAV/PCM16) ------------------------------------------

  /** Canonical 44-byte RIFF/WAVE PCM header + 16-bit LE mono samples. */
  val WavHeaderBytes = 44

  /** Audio corpus sample rate (Hz). */
  val WavRate = 8000

  /** Corpus length rule: md5(text) hex nibbles 9-12 → 800..2399
    * samples (0.1-0.3 s at 8 kHz) — small enough for the oracle's
    * per-sample generate_series replay at verification scale.
    */
  def wavSamples(text: String): Int = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
    800 + (java.lang.Long.parseLong(hex.substring(8, 12), 16) % 1600).toInt
  }

  /** Per-sample rule (doc_id-seeded, 12-bit amplitude): closed-form
    * so the oracle recomputes every sample by independent arithmetic.
    */
  def wavSample(id: Long, i: Int): Short =
    (((i * 37L + id * 11L) % 4096L) - 2048L).toShort

  /** Manual PCM16 mono WAV encoder (little-endian, canonical 44-byte
    * header) — the audio twin of [[encodeBmp]].
    */
  def encodeWav(rate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(WavHeaderBytes + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2) // byte rate
      .putShort(2).putShort(16) // block align, bits/sample
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < samples.length) { b.putShort(samples(i)); i += 1 }
    b.array()
  }

  /** Decode WAV bytes with the JDK's REAL audio reader
    * (javax.sound.sampled) — sample rate from the parsed format,
    * samples from the decoded frame bytes, nothing from the
    * generation rule.
    */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Short]) = {
    // Direct RIFF chunk walk (PCM16 mono/stereo little-endian), NOT
    // javax.sound: AudioSystem.getAudioInputStream walks the
    // service-provider registry per call — measured as the dominant
    // cost of the audio entries at the sf1 board (26× at 10× docs:
    // linear work behind a per-call constant ~50× the arithmetic).
    // The executor-side kernel must be allocation-light and
    // lock-free; MultimodalSpec pins this parser sample-identical to
    // the JDK reader ([[decodeWavJdk]]) over the generated corpus,
    // so the fidelity claim survives the fast path.
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 12 && bb.getInt(0) == 0x46464952, // "RIFF"
      "not a RIFF stream")
    require(bb.getInt(8) == 0x45564157, "not a WAVE stream") // "WAVE"
    var pos = 12
    var rate = -1
    var fmtCode = -1
    var bits = -1
    while (pos + 8 <= bytes.length) {
      val id = bb.getInt(pos)
      val sz = bb.getInt(pos + 4)
      // a corrupt/hostile negative size would advance pos by <= 0
      // (sz = -8 walks in place — an infinite executor loop) or walk
      // backwards; the JDK reader this replaced threw on malformed
      // input, so the fast path must too
      require(sz >= 0, s"bad RIFF chunk size $sz")
      if (id == 0x20746d66) { // "fmt "
        require(sz >= 16 && pos + 8 + 16 <= bytes.length,
          s"truncated fmt chunk (size $sz)")
        fmtCode = bb.getShort(pos + 8).toInt
        rate = bb.getInt(pos + 12)
        bits = bb.getShort(pos + 22).toInt
      } else if (id == 0x61746164) { // "data"
        require(fmtCode == 1, s"not PCM (fmt $fmtCode)")
        // the 2-byte sample stride below silently mis-decodes 8- or
        // 24-bit PCM — fail loudly instead (the scaladoc's PCM16
        // contract)
        require(bits == 16, s"not PCM16 ($bits bits/sample)")
        require(rate > 0, "data chunk before fmt chunk")
        val n = math.min(sz, bytes.length - pos - 8) / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) { out(i) = bb.getShort(pos + 8 + 2 * i); i += 1 }
        return (rate, out)
      }
      pos += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    throw new IllegalArgumentException("no data chunk in WAV stream")
  }

  /** The JDK reference decoder ([[decodeWav]]'s correctness twin):
    * `javax.sound.sampled` end-to-end. Kept OFF the hot path — the
    * spec certifies decodeWav == decodeWavJdk on the generated
    * corpus, so the catalog runs the lock-free parser while the
    * fidelity anchor remains the platform's actual audio reader.
    */
  def decodeWavJdk(bytes: Array[Byte]): (Int, Array[Short]) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    val raw = ais.readAllBytes()
    ais.close()
    val out = new Array[Short](raw.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort
      i += 1
    }
    (fmt.getSampleRate.toInt, out)
  }

  /** Deterministic audio corpus: (doc_id, wav) with real PCM16 WAV
    * bytes — the generator stands in for reading an audio bytes
    * column from storage, like [[imageCorpus]] for images.
    */
  def audioCorpus(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val n = wavSamples(text)
          (id, encodeWav(WavRate, Array.tabulate(n)(wavSample(id, _))))
        }
      }
      .toDF("doc_id", "wav")
  }

  final case class AudioStats(doc_id: Long, n_samples: Long,
                              sample_rate: Long, duration_ms: Long,
                              sum_sq: Long, zero_crossings: Long,
                              peak: Long)

  /** Decode ANY (id, wav-bytes) table to real sample-level stats —
    * the audio analogue of [[decodeStats]]: rate and frame count from
    * the parsed header, energy (exact integer Σ s²), sign-change
    * count, and peak amplitude from the decoded samples. All integer,
    * so any engine replays them bit-identically.
    */
  def audioStats(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val Seq(idCol, byteCol) = media.columns.take(2).toSeq
    media.select(col(idCol), col(byteCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val (rate, s) = decodeWav(payload)
          var sumSq = 0L; var zc = 0L; var peak = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i).toLong
            sumSq += v * v
            if (math.abs(v) > peak) peak = math.abs(v)
            if (i > 0 && (s(i) >= 0) != (s(i - 1) >= 0)) zc += 1
            i += 1
          }
          AudioStats(id, s.length.toLong, rate.toLong,
            s.length.toLong * 1000L / rate, sumSq, zc, peak)
        }
      }
      .toDF()
  }

  /** Real decimating resample: decode, keep every `factor`-th sample,
    * re-encode at rate/factor. The output column is decodable audio
    * again — the entry feeds it back through [[audioStats]] so the
    * decode→resample→encode→decode roundtrip is checked at sample
    * level (the audio twin of [[resize]]).
    */
  def audioResample(spark: SparkSession, media: DataFrame,
                    factor: Int): DataFrame = {
    require(factor > 0, "decimation factor must be positive")
    import spark.implicits._
    val Seq(idCol, byteCol) = media.columns.take(2).toSeq
    media.select(col(idCol), col(byteCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val (rate, s) = decodeWav(payload)
          val dec = Array.tabulate((s.length + factor - 1) / factor)(
            j => s(j * factor))
          (id, encodeWav(rate / factor, dec))
        }
      }
      .toDF("doc_id", "wav")
  }

  /** Real resize: decode the BMP, nearest-neighbour scale to w × h
    * (srcX = dstX * srcW / w, integer floor), re-encode as BMP. The
    * output column is decodable media again — MultimodalSpec decodes
    * it and asserts pixel-level equality with the source rule.
    */
  def resize(spark: SparkSession, docs: DataFrame, w: Int, h: Int): DataFrame = {
    import spark.implicits._
    imageCorpus(spark, docs)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, payload) =>
          val src = decodeBmp(payload)
          val (sw, sh) = (src.getWidth, src.getHeight)
          val out = encodeBmp(w, h, (x, y) => {
            val rgb = src.getRGB(x * sw / w, y * sh / h)
            ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
          })
          (id, out)
        }
      }
      .toDF("doc_id", "resized")
  }
}
