package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaWriters

/** Byte-path vs math-path equivalence for the perceptual hashes: the
  * container round trip (padded bottom-up BMP rows, interleaved RIFF
  * PCM) must yield exactly the hash computed from the closed-form
  * pixel/sample functions — the same independence the DuckDB oracles
  * assert, pinned here EXHAUSTIVELY over the whole fixture domain so a
  * codec refactor can't drift on any reachable input. */
class MediaHashSpec extends AnyFunSuite {

  /** aHash recomputed from the generator formula, never touching bytes. */
  private def aHashFromMath(w: Int, h: Int, seed: Long): String = {
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    for (y <- 0 until h; x <- 0 until w) {
      val k = ((8 * y + 7) / h) * 8 + (8 * x + 7) / w
      sums(k) += (x * 7L + y * 13L + seed * 31L) % 251L
      counts(k) += 1
    }
    val L = 26771144400L
    val rhs = (0 until 64).map(k => sums(k) * (L / counts(k))).sum
    (0 until 64).map(k =>
      if (sums(k) * 64L * (L / counts(k)) > rhs) '1' else '0').mkString
  }

  private def fpFromMath(channels: Int, frames: Int, seed: Long): String = {
    val win = Multimodal.AfpWindowFrames
    val nWin = frames / win
    val energy = new Array[Long](math.max(nWin, 0))
    for (t <- 0 until nWin * win; ch <- 0 until channels)
      energy(t / win) +=
        math.abs((t.toLong * (7 + ch) + seed * 31L) % 2003L - 1001L)
    (1 until nWin).map(w =>
      if (energy(w) > energy(w - 1)) '1' else '0').mkString
  }

  test("aHash64 over real BMP bytes equals the closed-form hash " +
    "for every reachable (w, h, seed)") {
    // the fixture domain: w, h in 8..39 (w % 4 != 0 exercises row
    // padding; 8 the one-pixel-per-block edge), seed = id % 16
    for (w <- 8 to 39; h <- 8 to 39; seed <- 0L to 15L)
      assert(Multimodal.aHash64(MediaWriters.grayBmp(w, h, seed)) ==
        aHashFromMath(w, h, seed), s"(w=$w h=$h seed=$seed)")
  }

  test("energyFp over real WAV bytes equals the closed-form fingerprint " +
    "for every reachable (channels, frames, seed)") {
    for (channels <- 1 to 2; frames <- 100 to 499; seed <- 0L to 15L)
      assert(Multimodal.energyFp(
        MediaWriters.pcmWav(channels, 8000, frames, seed)) ==
        fpFromMath(channels, frames, seed),
        s"(c=$channels f=$frames seed=$seed)")
  }

  test("energyFp walks RIFF chunks, not fixed offsets") {
    // splice an extra LIST chunk between fmt and data: the fingerprint
    // must be unchanged (the ADVICE.md WAV lesson, applied here too)
    val orig = MediaWriters.pcmWav(2, 8000, 200, 7L)
    val extra = new Array[Byte](8 + 6)
    System.arraycopy("LIST".getBytes("US-ASCII"), 0, extra, 0, 4)
    java.nio.ByteBuffer.wrap(extra)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(4, 6)
    val spliced = new Array[Byte](orig.length + extra.length)
    // header (RIFF..WAVE + fmt chunk = 12 + 24 bytes), LIST, then data
    System.arraycopy(orig, 0, spliced, 0, 36)
    System.arraycopy(extra, 0, spliced, 36, extra.length)
    System.arraycopy(orig, 36, spliced, 36 + extra.length,
      orig.length - 36)
    assert(Multimodal.energyFp(spliced) == Multimodal.energyFp(orig))
  }
}
