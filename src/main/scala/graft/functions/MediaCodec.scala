package graft.functions

import java.util.zip.CRC32

/** Real image-container codec for the multimodal pipeline: writes and
  * sniffs actual BMP and PNG bytes (magic numbers, little/big-endian
  * header fields, CRC-32 chunk trailers) with no external library —
  * both formats' headers are fully public (BITMAPINFOHEADER layout;
  * the PNG spec's signature + IHDR chunk). This replaces the former
  * deterministic stub: q80/q128 now decode width/height/channels from
  * the payload BYTES, and a corrupted header degrades to nulls instead
  * of garbage.
  *
  * Everything is executor-side pure functions over byte arrays — the
  * Spark plumbing (binary columns, typed mapPartitions batches) calls
  * these per row, so the shape is exactly what a libjpeg/ffmpeg-backed
  * decode would use at 100 TB: map-only, no shuffle, no driver
  * involvement.
  */
object MediaCodec {

  /** Parsed container metadata; `None` fields = unparseable/corrupt. */
  final case class Decoded(mime: Option[String], width: Option[Int],
                           height: Option[Int], channels: Option[Int],
                           bitDepth: Option[Int])
  val Unknown: Decoded = Decoded(None, None, None, None, None)

  // ---- little/big-endian primitives over byte arrays ----
  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def i32le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def i32be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def putLe(b: Array[Byte], i: Int, v: Int, n: Int): Unit =
    (0 until n).foreach(k => b(i + k) = ((v >>> (8 * k)) & 0xff).toByte)
  private def putBe4(b: Array[Byte], i: Int, v: Int): Unit =
    (0 until 4).foreach(k => b(i + k) = ((v >>> (8 * (3 - k))) & 0xff).toByte)

  private val pngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** BMP row stride: pixel rows pad to 4-byte boundaries (the quirk
    * every real BMP reader must honor). */
  def bmpStride(width: Int, bytesPerPx: Int = 3): Int =
    (width * bytesPerPx + 3) / 4 * 4

  /** Encode a real 24-bit BITMAPINFOHEADER BMP. Pixel content cycles
    * through `payload` (content is irrelevant to header decode but the
    * file is structurally complete — offsets, sizes, stride padding). */
  def encodeBmp(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0)
    val stride = bmpStride(width)
    val pixelBytes = stride * height
    val out = new Array[Byte](54 + pixelBytes)
    out(0) = 'B'; out(1) = 'M'
    putLe(out, 2, out.length, 4)          // file size
    putLe(out, 10, 54, 4)                 // pixel-array offset
    putLe(out, 14, 40, 4)                 // BITMAPINFOHEADER size
    putLe(out, 18, width, 4)
    putLe(out, 22, height, 4)
    putLe(out, 26, 1, 2)                  // planes
    putLe(out, 28, 24, 2)                 // bits per pixel
    putLe(out, 34, pixelBytes, 4)         // biSizeImage
    if (payload.nonEmpty)
      (0 until pixelBytes).foreach(i =>
        out(54 + i) = payload(i % payload.length))
    out
  }

  /** Encode a real PNG: signature, IHDR (big-endian dims, bit depth,
    * color type) with a genuine CRC-32 trailer, one IDAT carrying
    * `payload` verbatim, and IEND. Header-complete and CRC-correct;
    * the IDAT stream is raw rather than zlib (a full pixel decoder
    * would inflate here — header metadata does not). */
  def encodePng(width: Int, height: Int, colorType: Int,
                payload: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](12 + data.length)
      putBe4(out, 0, data.length)
      typ.getBytes("US-ASCII").copyToArray(out, 4)
      data.copyToArray(out, 8)
      val crc = new CRC32
      crc.update(out, 4, 4 + data.length)
      putBe4(out, 8 + data.length, crc.getValue.toInt)
      out
    }
    val ihdr = new Array[Byte](13)
    putBe4(ihdr, 0, width)
    putBe4(ihdr, 4, height)
    ihdr(8) = 8                           // bit depth
    ihdr(9) = colorType.toByte            // 2 = truecolor, 6 = +alpha
    pngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", payload) ++
      chunk("IEND", Array.empty)
  }

  private def pngChannels(colorType: Int): Option[Int] = colorType match {
    case 0 => Some(1) // greyscale
    case 2 => Some(3) // truecolor
    case 3 => Some(1) // palette index
    case 4 => Some(2) // grey + alpha
    case 6 => Some(4) // truecolor + alpha
    case _ => None
  }

  /** Sniff the container by magic number and parse its real header
    * fields. Anything malformed — wrong magic, truncated header,
    * non-positive dims, IHDR not first, bad bpp — returns Unknown
    * rather than throwing: one corrupt file must never fail a 100 TB
    * scan stage. */
  def sniffDecode(bytes: Array[Byte]): Decoded = {
    if (bytes == null) return Unknown
    if (bytes.length >= 30 && bytes(0) == 'B' && bytes(1) == 'M') {
      val dibSize = i32le(bytes, 14)
      val w = i32le(bytes, 18)
      val hRaw = i32le(bytes, 22)
      val h = math.abs(hRaw)              // negative = top-down rows
      val bpp = u16le(bytes, 28)
      if (dibSize >= 40 && w > 0 && h > 0 && (bpp == 8 || bpp == 24 ||
          bpp == 32))
        Decoded(Some("image/bmp"), Some(w), Some(h), Some(bpp / 8),
          Some(bpp))
      else Unknown
    } else if (bytes.length >= 33 &&
        bytes.take(8).sameElements(pngSig)) {
      val ihdrLen = i32be(bytes, 8)
      val typ = new String(bytes.slice(12, 16), "US-ASCII")
      if (ihdrLen != 13 || typ != "IHDR") return Unknown
      val w = i32be(bytes, 16)
      val h = i32be(bytes, 20)
      val depth = bytes(24) & 0xff
      val colorType = bytes(25) & 0xff
      val ch = pngChannels(colorType)
      if (w > 0 && h > 0 && ch.isDefined)
        Decoded(Some("image/png"), Some(w), Some(h), ch, Some(depth))
      else Unknown
    } else Unknown
  }

  // ---- WAV / RIFF (audio leg of the multimodal family) ----

  /** Parsed audio-container metadata; `None` = unparseable/corrupt. */
  final case class DecodedAudio(mime: Option[String],
                                sampleRate: Option[Int],
                                channels: Option[Int],
                                bitDepth: Option[Int],
                                nFrames: Option[Long])
  val UnknownAudio: DecodedAudio =
    DecodedAudio(None, None, None, None, None)

  private def put4cc(b: Array[Byte], i: Int, s: String): Unit =
    (0 until 4).foreach(k => b(i + k) = s.charAt(k).toByte)

  /** Encode a canonical 44-byte-header PCM WAV (RIFF + fmt + data).
    * Payload is a deterministic sawtooth so files differ by content. */
  def encodeWav(sampleRate: Int, channels: Int, bitsPerSample: Int,
                nFrames: Int): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val dataLen = nFrames * blockAlign
    val b = new Array[Byte](44 + dataLen)
    put4cc(b, 0, "RIFF"); putLe(b, 4, 36 + dataLen, 4)
    put4cc(b, 8, "WAVE")
    put4cc(b, 12, "fmt "); putLe(b, 16, 16, 4)
    putLe(b, 20, 1, 2)                       // PCM
    putLe(b, 22, channels, 2)
    putLe(b, 24, sampleRate, 4)
    putLe(b, 28, sampleRate * blockAlign, 4) // byte rate
    putLe(b, 32, blockAlign, 2)
    putLe(b, 34, bitsPerSample, 2)
    put4cc(b, 36, "data"); putLe(b, 40, dataLen, 4)
    (0 until dataLen).foreach(i => b(44 + i) = (i & 0xff).toByte)
    b
  }

  /** Chunk-walking WAV sniffer: verifies RIFF/WAVE magic then scans the
    * chunk list for `fmt ` and `data` in ANY order (real files carry
    * LIST/INFO/fact chunks between them; a fixed-offset parse breaks on
    * those). Odd-length chunks pad one byte per the RIFF spec. Anything
    * malformed returns UnknownAudio — one corrupt file must never fail
    * a 100 TB scan stage. */
  def sniffWav(bytes: Array[Byte]): DecodedAudio = {
    if (bytes == null || bytes.length < 44) return UnknownAudio
    def cc(i: Int) = new String(bytes.slice(i, i + 4), "US-ASCII")
    if (cc(0) != "RIFF" || cc(8) != "WAVE") return UnknownAudio
    var i = 12
    var sr, ch, bits = -1
    var dataLen = -1L
    while (i + 8 <= bytes.length && (sr < 0 || dataLen < 0)) {
      val id = cc(i)
      val len = i32le(bytes, i + 4).toLong & 0xffffffffL
      if (id == "fmt " && len >= 16 && i + 8 + 16 <= bytes.length) {
        val audioFormat = u16le(bytes, i + 8)
        if (audioFormat != 1) return UnknownAudio // PCM only
        ch = u16le(bytes, i + 10)
        sr = i32le(bytes, i + 12)
        bits = u16le(bytes, i + 22)
      } else if (id == "data") {
        dataLen = len
      }
      i += 8 + len.toInt + (len % 2).toInt   // odd chunks pad 1 byte
      if (len > Int.MaxValue - 16) return UnknownAudio
    }
    val blockAlign = if (ch > 0 && bits > 0) ch * bits / 8 else 0
    if (sr > 0 && ch > 0 && Set(8, 16, 24, 32)(bits) && dataLen >= 0 &&
        blockAlign > 0 && dataLen % blockAlign == 0)
      DecodedAudio(Some("audio/wav"), Some(sr), Some(ch), Some(bits),
        Some(dataLen / blockAlign))
    else UnknownAudio
  }
}
