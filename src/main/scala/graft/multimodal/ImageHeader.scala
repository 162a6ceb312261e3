package graft.multimodal

/** Pure-JVM header parsers for the three ubiquitous public image
  * container formats (PNG / JPEG / GIF): width, height, channel count
  * and bit depth straight from the byte stream, no codec library. This
  * is the REAL half of the multimodal decode boundary — at 100 TB the
  * metadata pass (dimension filtering, aspect bucketing, resize
  * planning) reads only these first bytes per object, never the pixel
  * payload, so it runs at manifest speed. Full pixel decode (the
  * JNI/native codec) still slots into the same `mapPartitions` batch
  * loop ([[Multimodal.extractFeatures]]); unparseable payloads fall
  * back to the deterministic byte-stats path there.
  *
  * Format facts used (all public specifications):
  *  - PNG (RFC 2083 / ISO 15948): 8-byte signature, IHDR chunk first —
  *    width/height as big-endian u32 at offsets 16/20, bit depth at 24,
  *    color type at 25 (0 gray, 2 RGB, 3 palette, 4 gray+alpha, 6 RGBA).
  *  - JPEG (ITU T.81): SOI then marker segments; the frame header
  *    (SOF0..15 except DHT C4 / JPG C8 / DAC CC) carries precision,
  *    height, width (big-endian u16) and component count.
  *  - GIF (87a/89a): 6-byte version signature, then logical screen
  *    width/height as little-endian u16; color resolution bits in the
  *    packed flags byte.
  */
object ImageHeader {

  /** Parsed image envelope. `bitDepth` is bits per sample/primary. */
  final case class ImageMeta(format: String, width: Int, height: Int,
                             channels: Int, bitDepth: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG color type → samples per pixel (palette indexes count as 1). */
  private def pngChannels(colorType: Int): Option[Int] = colorType match {
    case 0 => Some(1); case 2 => Some(3); case 3 => Some(1)
    case 4 => Some(2); case 6 => Some(4); case _ => None
  }

  def parsePng(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 26 || !b.take(8).sameElements(PngSig)) return None
    // first chunk must be IHDR (length 13)
    if (be32(b, 8) != 13L || !(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
      return None
    val (w, h) = (be32(b, 16), be32(b, 20))
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return None
    pngChannels(u8(b, 25)).map(ch =>
      ImageMeta("png", w.toInt, h.toInt, ch, u8(b, 24)))
  }

  /** SOF markers carry the frame dimensions; DHT/JPG/DAC share the
    * 0xCn range but are not frame headers. */
  private def isSof(m: Int): Boolean =
    m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

  def parseJpeg(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return None // corrupt marker stream
      var m = u8(b, i + 1)
      // fill bytes: any number of 0xFF may pad before a marker
      while (m == 0xff && i + 2 < b.length) { i += 1; m = u8(b, i + 1) }
      if (m == 0xd9 || m == 0xda) return None // EOI/SOS before any SOF
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        i += 2 // standalone marker, no length
      } else {
        if (i + 3 >= b.length) return None
        val len = be16(b, i + 2)
        if (len < 2) return None
        if (isSof(m)) {
          // the SOF payload must contain the 6 header bytes we read —
          // bound by the declared segment length, not just the array,
          // or a lying length reports the NEXT marker's bytes as
          // dimensions
          if (len < 2 + 6) return None
          if (i + 9 >= b.length) return None
          val precision = u8(b, i + 4)
          val h = be16(b, i + 5)
          val w = be16(b, i + 7)
          val ncomp = u8(b, i + 9)
          if (w <= 0 || h <= 0 || ncomp <= 0) return None
          return Some(ImageMeta("jpeg", w, h, ncomp, precision))
        }
        i += 2 + len
      }
    }
    None
  }

  def parseGif(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 11) return None
    val sig = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val (w, h) = (le16(b, 6), le16(b, 8))
    if (w <= 0 || h <= 0) return None
    val colorResBits = ((u8(b, 10) >> 4) & 0x7) + 1
    // palette-indexed RGB: 3 primaries at the declared resolution
    Some(ImageMeta("gif", w, h, 3, colorResBits))
  }

  /** Try every known container in signature order. */
  def detect(b: Array[Byte]): Option[ImageMeta] =
    parsePng(b).orElse(parseJpeg(b)).orElse(parseGif(b))
}
