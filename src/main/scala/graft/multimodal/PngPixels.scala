package graft.multimodal

import java.util.zip.{DataFormatException, Inflater}

/** Pure-JVM PNG PIXEL decode (RFC 2083): chunk walk → concatenated
  * IDAT zlib stream → `java.util.zip.Inflater` → per-scanline
  * unfiltering of all five filter types (None/Sub/Up/Average/Paeth,
  * RFC 2083 §6). Covers the non-interlaced 8-bit-depth non-palette
  * subset (color types 0/2/4/6) — exactly what the fixture builder
  * emits and what a metadata-gated pipeline decodes after
  * [[ImageHeader]] routing; anything else returns None (the
  * quarantine signal), never throws.
  *
  * This is the "real codec" slot of the multimodal plane
  * ([[Multimodal.decodePixelStats]]): no image library exists in this
  * environment, but PNG needs none — zlib ships in the JDK and the
  * filter algebra is public spec. GIF ([[GifPixels]]) and JPEG
  * ([[JpegPixels]]) rasterize pure-JVM too.
  */
object PngPixels {

  /** Decoded raster: row-major, channel-interleaved 8-bit samples
    * (`pixels(y * width * channels + x * channels + c) & 0xff`). */
  final case class Image(width: Int, height: Int, channels: Int,
                         pixels: Array[Byte])

  private val Sig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Quarantine contract: corrupt or hostile payloads yield None,
    * never an exception — the scan-level fallback depends on it. */
  def decode(bytes: Array[Byte]): Option[Image] =
    try decodeImpl(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeImpl(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 8 + 25 || !bytes.startsWith(Sig)) return None
    def be32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    var pos = 8
    var w = -1; var h = -1; var colorType = -1
    val idat = new java.io.ByteArrayOutputStream()
    var end = false
    while (!end && pos + 8 <= bytes.length) {
      val len = be32(pos).toInt
      val body = pos + 8
      if (len < 0 || body + len + 4 > bytes.length) return None
      new String(bytes, pos + 4, 4, "US-ASCII") match {
        case "IHDR" =>
          if (len < 13) return None
          w = be32(body).toInt
          h = be32(body + 4).toInt
          colorType = bytes(body + 9) & 0xff
          val bitDepth = bytes(body + 8) & 0xff
          val interlace = bytes(body + 12) & 0xff
          if (bitDepth != 8 || interlace != 0) return None
        case "IDAT" => idat.write(bytes, body, len)
        case "IEND" => end = true
        case _ => () // ancillary chunks pass through
      }
      pos = body + len + 4
    }
    if (w <= 0 || h <= 0) return None
    val ch = colorType match {
      case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
      case _ => return None // palette (3) needs PLTE indirection
    }
    // guard the allocation FULLY in Long domain: a hostile IHDR width
    // near 2^31 overflows an Int stride negative, which would slip a
    // negative product past the check below and crash the allocation
    val strideL = w.toLong * ch
    if (h.toLong * (1 + strideL) > (1L << 30)) return None
    val stride = strideL.toInt
    val raw = new Array[Byte](h * (1 + stride))
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    try {
      while (!inf.finished() && off < raw.length) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
    } catch {
      case _: DataFormatException => return None
    } finally inf.end()
    if (off != raw.length) return None
    // unfilter (RFC 2083 §6.2-6.6): each output byte depends on the
    // already-reconstructed left (a), up (b), up-left (c) neighbors
    val out = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val ft = raw(y * (1 + stride)) & 0xff
      if (ft > 4) return None
      val rs = y * (1 + stride) + 1
      val os = y * stride
      val ps = os - stride
      var i = 0
      while (i < stride) {
        val x = raw(rs + i) & 0xff
        val a = if (i >= ch) out(os + i - ch) & 0xff else 0
        val b = if (y > 0) out(ps + i) & 0xff else 0
        val c = if (y > 0 && i >= ch) out(ps + i - ch) & 0xff else 0
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case _ => // Paeth
            val p = a + b - c
            val pa = math.abs(p - a)
            val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        out(os + i) = (v & 0xff).toByte
        i += 1
      }
      y += 1
    }
    Some(Image(w, h, ch, out))
  }
}
