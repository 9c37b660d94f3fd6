package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video
  * travel as opaque `binary` columns with typed metadata; decode,
  * feature-extraction, resize planning, and frame sampling run as
  * `mapPartitions` over case-class batches — the Scala twin of the
  * mapInPandas batch shape (iterator in, iterator out, no per-row
  * driver interaction).
  *
  * THE DECODE IS A STUB: no image/audio codec library exists in this
  * container, so [[StubDecoder]] derives deterministic fake media
  * properties from the byte stream. Swap in a real codec behind
  * [[MediaDecoder]] without touching any plan: the Spark-side plumbing —
  * schema, partition-parallel batching, exploding frame rows, metadata
  * structs — is the real, tested part.
  *
  * Scale shape: decode is map-only over repartitioned batches (decode
  * cost dominates → partition count = cluster cores, no shuffle after);
  * frame sampling explodes rows map-side; per-kind stats aggregate with
  * partial aggregation. Binary payloads never move through a shuffle
  * except the initial repartition.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long, kind: String, bytes: Array[Byte])

  final case class DecodedMeta(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, channels: Int, n_frames: Int)

  final case class FrameRow(media_id: Long, frame_idx: Int, byte_offset: Long)

  /** Pluggable decoder boundary. A real implementation would wrap e.g.
    * javacv/ffmpeg; the stub is deterministic from byte length so tests
    * and oracles can reproduce it. */
  trait MediaDecoder extends Serializable {
    def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int, Int)
  }

  /** Deterministic fake: dims from byte length, channels from kind,
    * frames ~ length/1000 for video. CLEARLY A STUB — see object doc. */
  object StubDecoder extends MediaDecoder {
    def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int, Int) = {
      val n = bytes.length.toLong
      val width = (64 + n % 512).toInt
      val height = (64 + (n / 512) % 512).toInt
      val channels = kind match {
        case "audio" => 1
        case _ => 3
      }
      val frames = if (kind == "video") (1 + n / 1000).toInt else 1
      (width, height, channels, frames)
    }
  }

  /** REAL decoder for the two media containers parseable with zero
    * native dependencies: BMP (BITMAPINFOHEADER) and WAV (RIFF/PCM).
    * Sniffs the magic bytes — the `kind` hint is not trusted — and falls
    * back to [[StubDecoder]] for anything else (the documented container
    * constraint: no jpeg/png/mp3 codec lib exists here, but the format
    * seam is now exercised by a real parser end-to-end).
    *
    * Mapping into the (width, height, channels, frames) contract:
    * BMP → (width, |height|, bitsPerPixel/8, 1); WAV → (sampleRate,
    * bitsPerSample, channels, sampleFrames = dataSize/blockAlign). */
  object BinaryMediaDecoder extends MediaDecoder {
    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")

    def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int, Int) = {
      if (bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M') {
        // 14-byte file header + BITMAPINFOHEADER: width @18, height @22
        // (negative = top-down row order), bpp @28
        val w = le32(bytes, 18)
        val h = math.abs(le32(bytes, 22))
        (w, h, le16(bytes, 28) / 8, 1)
      } else if (bytes.length >= 44 && tag(bytes, 0) == "RIFF" &&
          tag(bytes, 8) == "WAVE") {
        // Walk RIFF chunks — real-world WAVs (ffmpeg output, extensible
        // format) carry LIST/INFO/fact chunks and fmt sizes of 18 or 40,
        // so nothing lives at a fixed offset past byte 12. Chunk bodies
        // pad to even length per the RIFF spec.
        var fmt = -1
        var dataSize = -1L
        var off = 12
        while (off + 8 <= bytes.length && (fmt < 0 || dataSize < 0)) {
          val t = tag(bytes, off)
          val sz = le32(bytes, off + 4).toLong & 0xffffffffL
          if (t == "fmt " && sz >= 16 && off + 8 + 16 <= bytes.length)
            fmt = off + 8
          else if (t == "data" && dataSize < 0)
            dataSize = sz
          off += 8 + sz.toInt + (sz.toInt & 1)
        }
        if (fmt < 0 || dataSize < 0) StubDecoder.decode(kind, bytes)
        else {
          val audioFormat = le16(bytes, fmt)
          val ch = le16(bytes, fmt + 2)
          val rate = le32(bytes, fmt + 4)
          val blockAlign = le16(bytes, fmt + 12)
          val bits = le16(bytes, fmt + 14)
          // PCM (1), IEEE float (3), and WAVE_FORMAT_EXTENSIBLE (0xFFFE)
          // all keep blockAlign/bits meaningful in the common header
          if ((audioFormat == 1 || audioFormat == 3 || audioFormat == 0xFFFE)
              && blockAlign > 0 && ch > 0)
            (rate, bits, ch, (dataSize / blockAlign).toInt)
          else StubDecoder.decode(kind, bytes)
        }
      } else StubDecoder.decode(kind, bytes)
    }
  }

  /** Minimal-but-valid writers for the two real formats (payload zeroed —
    * decode reads headers and sizes only). Fixture generators for the
    * encode→decode round-trip gate and specs. */
  object MediaWriters {
    def bmp(width: Int, height: Int): Array[Byte] = {
      val rowSize = ((24 * width + 31) / 32) * 4 // rows pad to 4 bytes
      val dataSize = rowSize * height
      val b = java.nio.ByteBuffer.allocate(54 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
        .putInt(0).putInt(54)
      b.putInt(40).putInt(width).putInt(height)
        .putShort(1).putShort(24).putInt(0).putInt(dataSize)
        .putInt(2835).putInt(2835).putInt(0).putInt(0)
      b.array()
    }

    /** [[bmp]] with a deterministic grayscale payload: pixel (x, y) of a
      * seed-s image is g = (7x + 13y + 31s) mod 251 in all three
      * channels, written in the container's real bottom-up row order
      * with 4-byte row padding. Gives content-bearing fixtures whose
      * pixel values an oracle can restate in closed form. */
    def grayBmp(width: Int, height: Int, seed: Long): Array[Byte] = {
      val arr = bmp(width, height)
      val rowSize = ((24 * width + 31) / 32) * 4
      var r = 0
      while (r < height) {
        val y = height - 1 - r // stored bottom-up
        var x = 0
        while (x < width) {
          val g = ((x * 7L + y * 13L + seed * 31L) % 251L).toByte
          val off = 54 + r * rowSize + x * 3
          arr(off) = g; arr(off + 1) = g; arr(off + 2) = g
          x += 1
        }
        r += 1
      }
      arr
    }

    /** [[wav]] with a deterministic 16-bit PCM payload: sample at frame
      * t, channel ch of a seed-s clip is ((t·(7+ch) + 31s) mod 2003) −
      * 1001 — an integer waveform whose per-window energies an oracle
      * can restate exactly (no trig, no floats). Interleaved
      * frame-major, little-endian, data at the standard offset 44. */
    def pcmWav(channels: Int, sampleRate: Int, frames: Int,
        seed: Long): Array[Byte] = {
      val arr = wav(channels, sampleRate, frames)
      val bb = java.nio.ByteBuffer.wrap(arr)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var t = 0
      while (t < frames) {
        var ch = 0
        while (ch < channels) {
          val s = ((t.toLong * (7 + ch) + seed * 31L) % 2003L - 1001L).toShort
          bb.putShort(44 + (t * channels + ch) * 2, s)
          ch += 1
        }
        t += 1
      }
      arr
    }

    def wav(channels: Int, sampleRate: Int, frames: Int): Array[Byte] = {
      val blockAlign = channels * 2 // 16-bit PCM
      val dataSize = frames * blockAlign
      val b = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels.toShort).putInt(sampleRate)
        .putInt(sampleRate * blockAlign).putShort(blockAlign.toShort)
        .putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataSize)
      b.array()
    }
  }

  /** Real-container media table derived from `documents`: every even doc
    * becomes a genuine BMP, every odd doc a genuine WAV, with dimensions
    * as bounded deterministic functions of `n_chars` — so the DuckDB
    * oracle can restate what a correct encode→decode round trip must
    * yield without parsing bytes itself. */
  def realMediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars").cast("long"))
      .as[(Long, Long)]
      .map { case (id, n) =>
        if (id % 2 == 0)
          MediaRow(id, "image", MediaWriters.bmp(
            (8 + n % 32).toInt, (8 + (n / 32) % 32).toInt))
        else
          MediaRow(id, "audio", MediaWriters.wav(
            (1 + n % 2).toInt, (8000 + (n % 8) * 1000).toInt,
            (100 + n % 400).toInt))
      }
  }

  /** Decode pass: batch-parallel mapPartitions, one decoder instance per
    * partition (the mapInPandas batch contract). `parallelism` sets the
    * decode partition count — decode is the cost center, so it should
    * match cluster cores, independent of upstream layout. */
  def decodeMeta(media: Dataset[MediaRow], decoder: MediaDecoder,
      parallelism: Int = 0): Dataset[DecodedMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    val arranged =
      if (parallelism > 0) media.repartition(parallelism, col("media_id"))
      else media
    arranged.mapPartitions { it =>
      it.map { m =>
        val (w, h, c, f) = decoder.decode(m.kind, m.bytes)
        DecodedMeta(m.media_id, m.kind, m.bytes.length.toLong, w, h, c, f)
      }
    }
  }

  /** Resize planning: pure metadata math (aspect-preserving fit into a
    * `target`×`target` box) — stays a Column expression, no UDF. */
  def resizePlan(decoded: Dataset[DecodedMeta], target: Int): DataFrame = {
    val scale = least(
      lit(target.toDouble) / col("width"),
      lit(target.toDouble) / col("height"),
      lit(1.0))
    decoded.toDF()
      .withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
  }

  /** Frame sampling for video: every `stride`-th frame, exploded to one
    * row per kept frame (map-side; the downstream decode of each frame
    * would batch exactly like [[decodeMeta]]). */
  def sampleFrames(decoded: Dataset[DecodedMeta], stride: Int): Dataset[FrameRow] = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.filter(col("kind") === "video").flatMap { d =>
      (0 until d.n_frames by stride).map(i =>
        FrameRow(d.media_id, i, i.toLong * 1000L))
    }
  }

  /** Perceptual average-hash (aHash) over a REAL 24-bpp BMP payload:
    * parse the container header (data offset, dimensions), walk the
    * bottom-up padded rows, accumulate the 8×8 block-grid sums with the
    * exact inverse block map i = (8x+7)/w, and set bit (j·8+i) iff that
    * block's mean exceeds the mean of the 64 block means. The compare is
    * EXACT INTEGER arithmetic — multiply through by L = lcm(1..25)
    * (every block holds ≤ 25 pixels at these dimensions, so L/n is
    * integral): 64·S_ij·(L/n_ij) > Σ S_kl·(L/n_kl). No float means, no
    * rounding ties, so an oracle restating the pixel function gets the
    * identical 64-char bit string. Returned most-significant-block-first
    * as a '0'/'1' string (no int64 sign-bit pitfalls). */
  def aHash64(bytes: Array[Byte]): String = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataOff = bb.getInt(10)
    val w = bb.getInt(18)
    val h = bb.getInt(22)
    val rowSize = ((24 * w + 31) / 32) * 4
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val r = h - 1 - y
      val j = (8 * y + 7) / h
      var x = 0
      while (x < w) {
        val i = (8 * x + 7) / w
        val g = bytes(dataOff + r * rowSize + x * 3) & 0xff
        val k = j * 8 + i
        sums(k) += g
        counts(k) += 1
        x += 1
      }
      y += 1
    }
    val L = 26771144400L // lcm(1..25)
    var rhs = 0L
    var k = 0
    while (k < 64) { rhs += sums(k) * (L / counts(k)); k += 1 }
    val sb = new java.lang.StringBuilder(64)
    k = 0
    while (k < 64) {
      sb.append(if (sums(k) * 64L * (L / counts(k)) > rhs) '1' else '0')
      k += 1
    }
    sb.toString
  }

  /** Energy-delta audio fingerprint over REAL 16-bit PCM WAV bytes: walk
    * the RIFF chunks to find fmt (channels) and data, sum |sample| over
    * [[AfpWindowFrames]]-frame windows across all channels, and emit bit
    * w = 1 iff window w's energy exceeds window w−1's — the classic
    * Haitsma-Kalker-style sign-of-delta fingerprint reduced to its
    * integer core. All arithmetic is exact (integer energies, strict
    * compare), so a byte-blind oracle restating the PCM function gets
    * the identical bit string. */
  val AfpWindowFrames = 25

  def energyFp(bytes: Array[Byte]): String = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // walk RIFF chunks (same contract as BinaryMediaDecoder's WAV path)
    var channels = -1
    var dataOff = -1
    var dataLen = 0
    var off = 12
    while (off + 8 <= bytes.length && (dataOff < 0 || channels < 0)) {
      val tag = new String(bytes, off, 4, "US-ASCII")
      val size = bb.getInt(off + 4)
      if (tag == "fmt ") channels = bb.getShort(off + 10).toInt
      if (tag == "data") { dataOff = off + 8; dataLen = size }
      off += 8 + size + (size & 1)
    }
    require(dataOff >= 0 && channels > 0, "no data/fmt chunk")
    val frames = dataLen / (channels * 2)
    val nWin = frames / AfpWindowFrames
    val energy = new Array[Long](math.max(nWin, 0))
    var t = 0
    while (t < nWin * AfpWindowFrames) {
      val w = t / AfpWindowFrames
      var ch = 0
      while (ch < channels) {
        val s = bb.getShort(dataOff + (t * channels + ch) * 2).toLong
        energy(w) += math.abs(s)
        ch += 1
      }
      t += 1
    }
    val sb = new java.lang.StringBuilder(math.max(nWin - 1, 0))
    var w = 1
    while (w < nWin) {
      sb.append(if (energy(w) > energy(w - 1)) '1' else '0')
      w += 1
    }
    sb.toString
  }

  /** A deterministic media table derived from `documents`: text bytes as
    * the opaque payload, kind by id. Stands in for a real
    * image/audio/video lakehouse table with the same schema. */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("bytes"))
      .as[MediaRow]
  }
}
