package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaRow, MediaDecoder}

/** The multimodal plumbing (batch decode, resize planning, frame
  * sampling) must behave identically under any partition layout and
  * accept swapped decoders — that's the part a real codec would inherit. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def media(n: Int) = (1 to n).map { i =>
    MediaRow(i.toLong, Seq("image", "audio", "video")(i % 3),
      Array.fill(i * 100)(i.toByte))
  }.toDS()

  test("decode batches are partition-parallel and deterministic") {
    val d1 = Multimodal.decodeMeta(media(30), Multimodal.StubDecoder)
      .collect().sortBy(_.media_id)
    val d2 = Multimodal.decodeMeta(media(30).repartition(7),
      Multimodal.StubDecoder, parallelism = 3).collect().sortBy(_.media_id)
    assert(d1.toSeq == d2.toSeq) // layout-independent
    val m1 = d1.head // 100 bytes
    assert(m1.width == 164 && m1.height == 64)
    assert(d1.count(_.kind == "audio") == d1.filter(_.kind == "audio")
      .map(_.channels).count(_ == 1))
  }

  test("resize plan preserves aspect ratio and never upscales") {
    val d = Multimodal.decodeMeta(media(30), Multimodal.StubDecoder)
    val planned = Multimodal.resizePlan(d, 128).collect()
    planned.foreach { r =>
      val w = r.getAs[Int]("width"); val ow = r.getAs[Int]("out_width")
      val h = r.getAs[Int]("height"); val oh = r.getAs[Int]("out_height")
      assert(ow <= 128 || oh <= 128)
      assert(ow <= w && oh <= h) // no upscale
    }
  }

  test("frame sampling explodes only videos at the stride") {
    val d = Multimodal.decodeMeta(media(30), Multimodal.StubDecoder)
    val frames = Multimodal.sampleFrames(d, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 2 == 0))
    val perVideo = frames.groupBy(_.media_id)
    val nFrames = d.collect().filter(_.kind == "video")
      .map(x => x.media_id -> ((x.n_frames + 1) / 2)).toMap
    perVideo.foreach { case (id, fs) => assert(fs.length == nFrames(id)) }
  }

  test("BMP writer/parser round-trips dimensions and exact byte size") {
    import Multimodal.{MediaWriters, BinaryMediaDecoder}
    for ((w, h) <- Seq((8, 8), (13, 27), (39, 39), (1, 1))) {
      val bytes = MediaWriters.bmp(w, h)
      assert(BinaryMediaDecoder.decode("image", bytes) == (w, h, 3, 1))
      val rowSize = ((24 * w + 31) / 32) * 4
      assert(bytes.length == 54 + rowSize * h) // row padding to 4 bytes
    }
    // top-down BMP (negative height) decodes to |height|
    val td = MediaWriters.bmp(10, 5)
    val bb = java.nio.ByteBuffer.wrap(td)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -5)
    assert(BinaryMediaDecoder.decode("image", td) == (10, 5, 3, 1))
  }

  test("WAV writer/parser round-trips format fields and frame count") {
    import Multimodal.{MediaWriters, BinaryMediaDecoder}
    for ((ch, rate, fr) <- Seq((1, 8000, 100), (2, 44100, 499), (1, 16000, 1))) {
      val bytes = MediaWriters.wav(ch, rate, fr)
      assert(BinaryMediaDecoder.decode("audio", bytes) == (rate, 16, ch, fr))
      assert(bytes.length == 44 + fr * ch * 2)
    }
  }

  test("WAV chunk walk: LIST/fact chunks and extensible fmt decode; broken RIFF falls back") {
    import Multimodal.{MediaWriters, StubDecoder, BinaryMediaDecoder}
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer
        .allocate(8 + body.length + (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(tag.getBytes("US-ASCII")).putInt(body.length).put(body)
      b.array() // zero pad byte appended when body length is odd
    }
    def fmtBody(audioFormat: Int, ch: Int, rate: Int, bits: Int,
        extra: Int): Array[Byte] = {
      val blockAlign = ch * bits / 8
      val b = java.nio.ByteBuffer.allocate(16 + extra)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putShort(audioFormat.toShort).putShort(ch.toShort).putInt(rate)
        .putInt(rate * blockAlign).putShort(blockAlign.toShort)
        .putShort(bits.toShort)
      b.array() // extension bytes (if any) left zeroed
    }
    def riff(chunks: Array[Byte]*): Array[Byte] = {
      val body = chunks.flatten.toArray
      val b = java.nio.ByteBuffer.allocate(12 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
        .put("WAVE".getBytes("US-ASCII")).put(body)
      b.array()
    }
    // ffmpeg-style: LIST/INFO before fmt, fact between fmt and data
    val ffmpegish = riff(
      chunk("LIST", "INFOISFT".getBytes("US-ASCII") ++ Array[Byte](0)),
      chunk("fmt ", fmtBody(1, 2, 44100, 16, 0)),
      chunk("fact", Array.fill(4)(0.toByte)),
      chunk("data", Array.fill(400)(0.toByte)))
    assert(BinaryMediaDecoder.decode("audio", ffmpegish) == (44100, 16, 2, 100))
    // WAVE_FORMAT_EXTENSIBLE: fmt size 40, format tag 0xFFFE
    val extensible = riff(
      chunk("fmt ", fmtBody(0xFFFE, 6, 48000, 24, 24)),
      chunk("data", Array.fill(6 * 3 * 50)(0.toByte)))
    assert(BinaryMediaDecoder.decode("audio", extensible) == (48000, 24, 6, 50))
    // fmt size 18 (PCM with cbSize=0, common from old encoders)
    val fmt18 = riff(
      chunk("fmt ", fmtBody(1, 1, 8000, 16, 2)),
      chunk("data", Array.fill(20)(0.toByte)))
    assert(BinaryMediaDecoder.decode("audio", fmt18) == (8000, 16, 1, 10))
    // RIFF/WAVE magic but no data chunk → must NOT return garbage
    val noData = riff(chunk("fmt ", fmtBody(1, 1, 8000, 16, 0)),
      chunk("LIST", Array.fill(60)(0.toByte)))
    assert(BinaryMediaDecoder.decode("audio", noData) ==
      StubDecoder.decode("audio", noData))
    // unknown compressed format tag (e.g. mp3-in-wav 0x0055) → stub
    val mp3wav = riff(chunk("fmt ", fmtBody(0x55, 2, 44100, 0, 0)),
      chunk("data", Array.fill(100)(0.toByte)))
    assert(BinaryMediaDecoder.decode("audio", mp3wav) ==
      StubDecoder.decode("audio", mp3wav))
    // zero channels in an otherwise-valid header → stub, no div-by-zero
    val zeroCh = riff(chunk("fmt ", fmtBody(1, 0, 8000, 16, 0)),
      chunk("data", Array.fill(16)(0.toByte)))
    assert(BinaryMediaDecoder.decode("audio", zeroCh) ==
      StubDecoder.decode("audio", zeroCh))
    // odd-sized chunk before data: pad byte must be skipped correctly
    val oddChunk = riff(chunk("LIST", Array.fill(7)(1.toByte)),
      chunk("fmt ", fmtBody(1, 1, 16000, 16, 0)),
      chunk("data", Array.fill(6)(0.toByte)))
    assert(BinaryMediaDecoder.decode("audio", oddChunk) == (16000, 16, 1, 3))
  }

  test("codec round trip holds over generated dimension space") {
    import Multimodal.{MediaWriters, BinaryMediaDecoder}
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      w <- Gen.choose(1, 2048); h <- Gen.choose(1, 2048)
      ch <- Gen.choose(1, 8); rate <- Gen.choose(1, 192000)
      fr <- Gen.choose(0, 4096)
    } yield (w, h, ch, rate, fr)
    val params = Gen.Parameters.default
    var s = Seed(0xB317L)
    for (_ <- 1 to 200) {
      val (w, h, ch, rate, fr) = gen.pureApply(params, s)
      assert(BinaryMediaDecoder.decode("image", MediaWriters.bmp(w, h)) ==
        (w, h, 3, 1))
      assert(BinaryMediaDecoder.decode("audio",
        MediaWriters.wav(ch, rate, fr)) == (rate, 16, ch, fr))
      s = s.next
    }
  }

  test("unknown container bytes fall back to the stub decode") {
    import Multimodal.{StubDecoder, BinaryMediaDecoder}
    val junk = Array.fill(200)(7.toByte)
    assert(BinaryMediaDecoder.decode("video", junk) ==
      StubDecoder.decode("video", junk))
    // the kind hint is not trusted: magic bytes decide
    val asAudio = Multimodal.MediaWriters.bmp(12, 12)
    assert(BinaryMediaDecoder.decode("audio", asAudio) == (12, 12, 3, 1))
  }

  test("decoder boundary is swappable") {
    object FixedDecoder extends MediaDecoder {
      def decode(kind: String, bytes: Array[Byte]) = (8, 8, 1, 1)
    }
    val d = Multimodal.decodeMeta(media(6), FixedDecoder).collect()
    assert(d.forall(x => x.width == 8 && x.channels == 1))
  }
}
