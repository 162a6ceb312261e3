package graft.multimodal

/** REAL GIF pixel decode — no codec library. GIF's only compression
  * is LZW (GIF87a/89a, public specification), which is pure byte/bit
  * algebra: a growing dictionary of byte strings, codes packed
  * LSB-first at a width that escalates as the dictionary fills. The
  * JDK's Inflater covers PNG ([[PngPixels]]), [[JpegPixels]] covers
  * baseline JPEG (Huffman + IDCT) — with this module all three image
  * formats the pipeline synthesizes rasterize pure-JVM.
  *
  * Subset decoded — mirrors [[PngPixels]]' honest-subset policy
  * (anything outside it returns None, routing to the fallback, never
  * a task failure):
  *   - sequential AND interlaced row order (the four-pass reorder;
  *     the JDK encoder emits interlaced by default, so the golden
  *     cross-check exercises it);
  *   - the FIRST image block, which must cover the full logical
  *     screen (animated/composited GIFs are out of scope for pixel
  *     stats);
  *   - global or local color table (required — a table-less GIF has
  *     no defined colors);
  *   - extensions are skipped per spec framing (transparency from a
  *     Graphic Control Extension is ignored: stats read the stored
  *     palette colors, matching what the JDK raster reports for
  *     opaque fixtures).
  *
  * Output is an RGB [[PngPixels.Image]] (channels = 3), row-major
  * interleaved — the shared raster currency of the multimodal stage.
  *
  * Reference: kafka-connect-hdfs has no media path at all (its
  * `io.confluent.connect.hdfs.Format` plane is row formats —
  * avro/parquet/string); this implements the GIF89a specification
  * directly.
  */
object GifPixels {

  /** Decode a GIF payload to an RGB raster, or None if `bytes` is not
    * a GIF in the supported subset. Quarantine contract: corrupt or
    * hostile payloads yield None, never an exception — the scan-level
    * fallback depends on it. */
  def decode(bytes: Array[Byte]): Option[PngPixels.Image] =
    try decodeImpl(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeImpl(bytes: Array[Byte]): Option[PngPixels.Image] = {
    if (bytes.length < 13) return None
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    val w = le16(6)
    val h = le16(8)
    if (w <= 0 || h <= 0) return None
    // hostile-header guard in Long domain: le16 dims reach 65535 each,
    // so w*h*3 can overflow Int negative and wreck the allocations below
    if (w.toLong * h * 3 > (1L << 30)) return None
    val packed = bytes(10) & 0xff
    var pos = 13
    var globalPal: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 3 * (1 << ((packed & 7) + 1))
      if (pos + n > bytes.length) return None
      globalPal = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
    }
    // block walk: skip extensions, decode the first image descriptor
    while (pos < bytes.length) {
      (bytes(pos) & 0xff) match {
        case 0x3b => return None // trailer before any image
        case 0x21 => // extension: label byte + sub-blocks to terminator
          pos += 2
          while (pos < bytes.length && (bytes(pos) & 0xff) != 0)
            pos += 1 + (bytes(pos) & 0xff)
          pos += 1
        case 0x2c =>
          if (pos + 10 > bytes.length) return None
          val left = le16(pos + 1); val top = le16(pos + 3)
          val iw = le16(pos + 5); val ih = le16(pos + 7)
          val ip = bytes(pos + 9) & 0xff
          pos += 10
          if (left != 0 || top != 0 || iw != w || ih != h) return None
          var pal = globalPal
          if ((ip & 0x80) != 0) {
            val n = 3 * (1 << ((ip & 7) + 1))
            if (pos + n > bytes.length) return None
            pal = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
            pos += n
          }
          if (pal == null) return None
          if (pos >= bytes.length) return None
          val minCode = bytes(pos) & 0xff
          pos += 1
          if (minCode < 1 || minCode > 8) return None
          // concatenate the LZW data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          while (pos < bytes.length && (bytes(pos) & 0xff) != 0) {
            val n = bytes(pos) & 0xff
            if (pos + 1 + n > bytes.length) return None
            data.write(bytes, pos + 1, n)
            pos += 1 + n
          }
          val seq = lzw(data.toByteArray, minCode, w * h)
            .getOrElse(return None)
          // interlaced streams carry rows in four passes (8-strided
          // from 0, 8-strided from 4, 4-strided from 2, 2-strided
          // from 1) — map stream row k to its destination row
          val idx =
            if ((ip & 0x40) == 0) seq
            else {
              val order = Seq((0, 8), (4, 8), (2, 4), (1, 2))
                .flatMap { case (start, step) => start until h by step }
              val de = new Array[Byte](w * h)
              var k = 0
              order.foreach { y =>
                System.arraycopy(seq, k * w, de, y * w, w)
                k += 1
              }
              de
            }
          val nColors = pal.length / 3
          val px = new Array[Byte](w * h * 3)
          var i = 0
          while (i < w * h) {
            val c = idx(i) & 0xff
            if (c >= nColors) return None
            px(3 * i) = pal(3 * c)
            px(3 * i + 1) = pal(3 * c + 1)
            px(3 * i + 2) = pal(3 * c + 2)
            i += 1
          }
          return Some(PngPixels.Image(w, h, 3, px))
        case _ => return None
      }
    }
    None
  }

  /** GIF-variant LZW: codes packed LSB-first starting at
    * `minCode` + 1 bits; CLEAR = 2^minCode reinitializes the
    * dictionary, EOI = CLEAR + 1 ends the stream; each code after the
    * first appends dict(prev) + firstByte(current) at the next free
    * slot (the `code == next` case is the classic KwKwK
    * self-reference); the width bumps when the next free slot crosses
    * a power of two, capped at 12 bits (slot 4096 stops growth until
    * the next CLEAR). Returns exactly `need` palette indices. */
  private def lzw(data: Array[Byte], minCode: Int,
                  need: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val dict = new Array[Array[Byte]](4096)
    var next = 0
    var width = 0
    def reset(): Unit = {
      var i = 0
      while (i < clear) { dict(i) = Array(i.toByte); i += 1 }
      next = eoi + 1
      width = minCode + 1
    }
    reset()
    val out = new Array[Byte](need)
    var outAt = 0
    var acc = 0L
    var nbits = 0
    var at = 0
    var prev = -1
    while (outAt < need) {
      while (nbits < width) {
        if (at >= data.length) return None // stream ended short
        acc |= (data(at) & 0xffL) << nbits
        nbits += 8
        at += 1
      }
      val code = (acc & ((1L << width) - 1)).toInt
      acc >>>= width
      nbits -= width
      if (code == clear) {
        reset()
        prev = -1
      } else if (code == eoi) {
        return None // EOI before enough pixels
      } else {
        val entry =
          if (code < next && dict(code) != null) dict(code)
          else if (code == next && prev >= 0)
            dict(prev) :+ dict(prev)(0)
          else return None
        var i = 0
        while (i < entry.length && outAt < need) {
          out(outAt) = entry(i); outAt += 1; i += 1
        }
        if (prev >= 0 && next < 4096) {
          dict(next) = dict(prev) :+ entry(0)
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    Some(out)
  }
}
