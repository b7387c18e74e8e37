package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MediaCodec

/** Byte-level contract of the real container codec: the oracle for
  * q80/q128 recomputes header fields from the generation rule (DuckDB
  * cannot parse BMP/PNG), so THIS spec carries the proof that the
  * decoder actually reads them from the bytes — round-trip identity,
  * endianness, stride padding, CRC, and corrupt-header degradation. */
class MediaCodecSpec extends AnyFunSuite {

  test("BMP round trip: header fields parse back from the bytes") {
    val b = MediaCodec.encodeBmp(127, 33, "payload".getBytes)
    val d = MediaCodec.sniffDecode(b)
    assert(d.mime.contains("image/bmp"))
    assert(d.width.contains(127) && d.height.contains(33))
    assert(d.channels.contains(3) && d.bitDepth.contains(24))
    // structural: file size field (LE at 2) matches the actual length,
    // and the pixel array is stride-padded to 4 bytes
    val size = (b(2) & 0xff) | ((b(3) & 0xff) << 8) |
      ((b(4) & 0xff) << 16) | ((b(5) & 0xff) << 24)
    assert(size == b.length)
    assert(b.length == 54 + MediaCodec.bmpStride(127) * 33)
    assert(MediaCodec.bmpStride(127) == 384) // 381 padded up
  }

  test("PNG round trip: big-endian IHDR fields and channel mapping") {
    for ((ct, ch) <- Seq(2 -> 3, 6 -> 4)) {
      val b = MediaCodec.encodePng(310, 7, ct, "idat".getBytes)
      val d = MediaCodec.sniffDecode(b)
      assert(d.mime.contains("image/png"))
      assert(d.width.contains(310) && d.height.contains(7))
      assert(d.channels.contains(ch) && d.bitDepth.contains(8))
      assert(b.length == 8 + 25 + 12 + 4 + 12)
    }
  }

  test("PNG IHDR carries a correct CRC-32") {
    val b = MediaCodec.encodePng(5, 5, 2, Array.empty)
    val crc = new java.util.zip.CRC32
    crc.update(b, 12, 4 + 13) // chunk type + data
    val stored = ((b(29) & 0xffL) << 24) | ((b(30) & 0xffL) << 16) |
      ((b(31) & 0xffL) << 8) | (b(32) & 0xffL)
    assert(stored == (crc.getValue & 0xffffffffL))
  }

  test("negative BMP height (top-down rows) parses as abs(height)") {
    val b = MediaCodec.encodeBmp(10, 4, Array.empty)
    // overwrite height with -4 (LE two's complement)
    val neg = b.clone()
    neg(22) = 0xfc.toByte; neg(23) = 0xff.toByte
    neg(24) = 0xff.toByte; neg(25) = 0xff.toByte
    assert(MediaCodec.sniffDecode(neg).height.contains(4))
  }

  test("corrupt or foreign bytes degrade to Unknown, never throw") {
    val bmp = MediaCodec.encodeBmp(10, 4, Array.empty)
    val zapped = bmp.clone(); zapped(0) = 0; zapped(1) = 0
    assert(MediaCodec.sniffDecode(zapped) == MediaCodec.Unknown)
    val png = MediaCodec.encodePng(3, 3, 2, Array.empty)
    val zpng = png.clone(); zpng(0) = 0
    assert(MediaCodec.sniffDecode(zpng) == MediaCodec.Unknown)
    // truncated mid-header
    assert(MediaCodec.sniffDecode(bmp.take(20)) == MediaCodec.Unknown)
    assert(MediaCodec.sniffDecode(png.take(12)) == MediaCodec.Unknown)
    assert(MediaCodec.sniffDecode(Array.empty) == MediaCodec.Unknown)
    assert(MediaCodec.sniffDecode(null) == MediaCodec.Unknown)
    assert(MediaCodec.sniffDecode("not an image at all".getBytes)
      == MediaCodec.Unknown)
    // zero-dimension PNG is invalid per spec
    val z = MediaCodec.encodePng(1, 1, 2, Array.empty).clone()
    z(16) = 0; z(17) = 0; z(18) = 0; z(19) = 0
    assert(MediaCodec.sniffDecode(z) == MediaCodec.Unknown)
  }

  test("buildMedia generation rule matches the q80 oracle formulas") {
    // even → BMP with w=id%31+1, h=id%17+1; odd → PNG; %13 → corrupt
    val d42 = MediaCodec.sniffDecode(
      graft.queries.Multimodal.buildMedia(42, "xyz"))
    assert(d42.mime.contains("image/bmp"))
    assert(d42.width.contains(42 % 31 + 1) && d42.height.contains(42 % 17 + 1))
    val d7 = MediaCodec.sniffDecode(
      graft.queries.Multimodal.buildMedia(7, "xyz"))
    assert(d7.mime.contains("image/png") && d7.channels.contains(3))
    val d5 = MediaCodec.sniffDecode(
      graft.queries.Multimodal.buildMedia(5, "xyz"))
    assert(d5.channels.contains(4), "doc_id%4==1 is truecolor+alpha")
    assert(MediaCodec.sniffDecode(
      graft.queries.Multimodal.buildMedia(26, "xyz")) == MediaCodec.Unknown)
  }

  test("WAV round trip: fmt fields and frame count parse back") {
    val b = MediaCodec.encodeWav(44100, 2, 16, 100)
    val d = MediaCodec.sniffWav(b)
    assert(d.mime.contains("audio/wav"))
    assert(d.sampleRate.contains(44100) && d.channels.contains(2))
    assert(d.bitDepth.contains(16) && d.nFrames.contains(100L))
    assert(b.length == 44 + 100 * 2 * 2)
    // RIFF size field = file length - 8
    val size = (b(4) & 0xff) | ((b(5) & 0xff) << 8) |
      ((b(6) & 0xff) << 16) | ((b(7) & 0xff) << 24)
    assert(size == b.length - 8)
  }

  test("WAV sniffer walks chunks: an extra chunk before fmt still " +
    "parses, including odd-length padding") {
    val base = MediaCodec.encodeWav(8000, 1, 16, 10)
    // splice a 5-byte JUNK chunk (odd length -> 1 pad byte) at offset 12
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4, 5, 0)
    val spliced = base.take(12) ++ junk ++ base.drop(12)
    // fix the RIFF size field
    val total = spliced.length - 8
    (0 until 4).foreach(k =>
      spliced(4 + k) = ((total >>> (8 * k)) & 0xff).toByte)
    val d = MediaCodec.sniffWav(spliced)
    assert(d.sampleRate.contains(8000) && d.nFrames.contains(10L), d)
  }

  test("WAV corrupt/truncated/non-PCM inputs degrade to UnknownAudio") {
    val b = MediaCodec.encodeWav(16000, 1, 16, 4)
    val corrupt = b.clone(); corrupt(0) = 0
    assert(MediaCodec.sniffWav(corrupt) == MediaCodec.UnknownAudio)
    assert(MediaCodec.sniffWav(b.take(20)) == MediaCodec.UnknownAudio)
    val nonPcm = b.clone(); nonPcm(20) = 3 // IEEE-float format tag
    assert(MediaCodec.sniffWav(nonPcm) == MediaCodec.UnknownAudio)
    assert(MediaCodec.sniffWav(null) == MediaCodec.UnknownAudio)
  }
}
