package graft.llm

/** Pure-JVM container codecs for the multimodal surface: BMP
  * (BITMAPINFOHEADER) and WAV (RIFF/PCM) — two real formats parseable in
  * ~60 LoC with no external libraries, so the decode boundary is no
  * longer stub-only. Everything unrecognized still falls back to the
  * documented stub. The `wrap*` encoders exist so fixtures and specs can
  * synthesize valid payloads (the driver tables carry no binary media).
  *
  * Format layouts are the public file-format specs: BMP's 14-byte file
  * header + 40-byte info header (all little-endian), WAV's RIFF chunk
  * stream with `fmt ` (PCM) and `data` chunks. */
object Codecs {

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  final case class Bmp(width: Int, height: Int, bpp: Int, dataOffset: Int)

  /** Parse a BMP header. None when the bytes are not a BMP. */
  def parseBmp(b: Array[Byte]): Option[Bmp] =
    if (b.length >= 54 && b(0) == 'B' && b(1) == 'M' && le32(b, 14) >= 40)
      Some(Bmp(le32(b, 18), le32(b, 22), le16(b, 28), le32(b, 10)))
    else None

  final case class Wav(sampleRate: Int, channels: Int, bitsPerSample: Int, dataLen: Int)

  /** Parse a RIFF/WAVE header, scanning chunks for `fmt ` and `data`. */
  def parseWav(b: Array[Byte]): Option[Wav] = {
    if (b.length < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    // offset tracked as Long: a crafted chunk size near Int.MaxValue would
    // overflow an Int offset negative and throw instead of returning None
    var off = 12L
    var rate = -1; var ch = -1; var bits = -1; var dataLen = -1
    while (off + 8 <= b.length) {
      val o = off.toInt
      val id = new String(b, o, 4, "US-ASCII")
      val sz = le32(b, o + 4)
      if (sz < 0 || sz > b.length - off - 8) return None // out-of-range chunk
      if (id == "fmt " && off + 24 <= b.length) {
        ch = le16(b, o + 10); rate = le32(b, o + 12); bits = le16(b, o + 22)
      } else if (id == "data") dataLen = sz
      off += 8L + sz + (sz & 1) // chunks are word-aligned
    }
    if (rate > 0 && ch > 0) Some(Wav(rate, ch, bits, math.max(0, dataLen))) else None
  }

  /** Wrap payload bytes as a 24-bit BMP (fixture/spec encoder). */
  def wrapBmp(payload: Array[Byte], width: Int): Array[Byte] = {
    val rowBytes = width * 3
    val height = math.max(1, (payload.length + rowBytes - 1) / rowBytes)
    val data = java.util.Arrays.copyOf(payload, rowBytes * height)
    val out = java.nio.ByteBuffer.allocate(54 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + data.length).putInt(0).putInt(54)
    out.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
    out.putInt(0).putInt(data.length).putInt(2835).putInt(2835).putInt(0).putInt(0)
    out.put(data)
    out.array()
  }

  /** Wrap payload bytes as 16-bit mono-or-n-channel PCM WAV (encoder). */
  def wrapWav(payload: Array[Byte], sampleRate: Int, channels: Int): Array[Byte] = {
    val data =
      if (payload.length % 2 == 0) payload
      else java.util.Arrays.copyOf(payload, payload.length + 1)
    val out = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length).put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(channels.toShort)
      .putInt(sampleRate).putInt(sampleRate * channels * 2)
      .putShort((channels * 2).toShort).putShort(16)
    out.put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    out.array()
  }
}
