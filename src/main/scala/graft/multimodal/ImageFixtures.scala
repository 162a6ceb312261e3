package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

/** Deterministic in-JVM builders of REAL image bytes for the decode
  * path: the PNG builder emits a complete, spec-valid file (correct
  * chunk CRCs, zlib-deflated scanlines — `javax.imageio` reads it
  * back), the JPEG builder a spec-valid SOI→APP0→SOF0 marker stream,
  * the GIF builder a complete 89a file. They exist so the header
  * parser ([[ImageHeader]]) can be exercised end-to-end inside a
  * DataFrame program with a DuckDB-checkable oracle: payloads are
  * synthesized from integer columns, parsed back by the real parser,
  * and the oracle recomputes the expected envelope arithmetically.
  * No pixel-content libraries involved — only `java.util.zip`. */
object ImageFixtures {

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def pngChunk(tag: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(be32(body.length.toLong))
    val tb = tag.getBytes("US-ASCII")
    out.write(tb); out.write(body)
    val crc = new CRC32()
    crc.update(tb); crc.update(body)
    out.write(be32(crc.getValue))
    out.toByteArray
  }

  private def pngColorChannels(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
    case other => throw new IllegalArgumentException(
      s"unsupported fixture color type $other")
  }

  /** A complete, valid PNG: IHDR + one zlib-deflated IDAT + IEND,
    * 8-bit depth. Pixel content is the deterministic gradient
    * `(x + y + c + seed) mod 256` — arithmetic a SQL oracle can
    * recompute — and the scanline filter type CYCLES `y mod 5`, so a
    * full decode round-trip exercises ALL FIVE RFC 2083 filters
    * (None/Sub/Up/Average/Paeth), not just the identity one.
    * `javax.imageio` reads the result back, independently of
    * [[PngPixels]]. */
  def pngBytes(w: Int, h: Int, colorType: Int, seed: Int = 0): Array[Byte] =
    encodePng(w, h, colorType, (x, y, c) => (x + y + c + seed) & 0xff)

  /** Pseudo-random-content PNG for perceptual-hash tests: pixel =
    * `(mix(x, y, c, key) & 0x7f) + brightness`. Content is decided by
    * `key` alone; values stay ≤ 0x7f + brightness ≤ 255 (no clamp, no
    * wrap), so two images sharing a key differ by a CONSTANT offset —
    * exactly the brightness-shifted near-duplicate a difference hash
    * must collapse. */
  def pngBytesHashed(w: Int, h: Int, colorType: Int, key: Long,
                     brightness: Int): Array[Byte] = {
    require(brightness >= 0 && brightness <= 128, s"brightness $brightness")
    // full-avalanche key finalizer (splitmix64) BEFORE the spatial
    // terms — the same fix blockMix documents: a bare `key * GOLDEN`
    // leaves keys at constant additive distance with correlated low
    // bits, and key pairs sampling the same pixel grid can then
    // produce structurally-near rasters (spurious dHash near-dups)
    encodePng(w, h, colorType, (x, y, c) => {
      var z = key + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      var m = (z ^ (z >>> 31)).toInt
      m = (m ^ x) * 0x85EBCA6B
      m = (m ^ y) * 0xC2B2AE35
      m = (m ^ c) * 0x27D4EB2F
      m ^= m >>> 15
      (m & 0x7f) + brightness
    })
  }

  /** The shared PNG encoder behind both content generators: filter
    * type CYCLES `y mod 5` (all five RFC 2083 filters), zlib via the
    * JDK Deflater. */
  private def encodePng(w: Int, h: Int, colorType: Int,
                        pixel: (Int, Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    val channels = pngColorChannels(colorType)
    val stride = w * channels
    // the unfiltered image, then each scanline filtered per RFC 2083
    // §6 (the decoder's inverse lives in PngPixels.decode)
    val img = Array.tabulate(h, stride)((y, i) =>
      pixel(i / channels, y, i % channels) & 0xff)
    val raw = new Array[Byte](h * (1 + stride))
    var y = 0
    while (y < h) {
      val ft = y % 5
      raw(y * (1 + stride)) = ft.toByte
      var i = 0
      while (i < stride) {
        val x = img(y)(i)
        val a = if (i >= channels) img(y)(i - channels) else 0
        val b = if (y > 0) img(y - 1)(i) else 0
        val c = if (y > 0 && i >= channels) img(y - 1)(i - channels) else 0
        val f = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case _ =>
            val p = a + b - c
            val pa = math.abs(p - a)
            val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            x - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        raw(y * (1 + stride) + 1 + i) = (f & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val ihdr = new ByteArrayOutputStream()
    ihdr.write(be32(w.toLong)); ihdr.write(be32(h.toLong))
    ihdr.write(8) // bit depth
    ihdr.write(colorType)
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // deflate/adaptive/no-interlace
    val deflater = new Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](8192)
    val idat = new ByteArrayOutputStream()
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      idat.write(buf, 0, n)
    }
    deflater.end()
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    out.write(pngChunk("IHDR", ihdr.toByteArray))
    out.write(pngChunk("IDAT", idat.toByteArray))
    out.write(pngChunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** A valid JPEG marker stream through the frame header: SOI, APP0
    * (JFIF 1.1), SOF0 with 8-bit precision and `ncomp` components,
    * EOI. Parseable by any marker-walking reader. */
  def jpegBytes(w: Int, h: Int, ncomp: Int): Array[Byte] = {
    require(w > 0 && h > 0 && (ncomp == 1 || ncomp == 3),
      s"bad jpeg fixture ${w}x$h ncomp=$ncomp")
    val out = new ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    // APP0 JFIF: len 16, "JFIF\0", v1.1, no density units, 1x1, no thumb
    out.write(0xff); out.write(0xe0)
    out.write(be16(16))
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1); out.write(0)
    out.write(be16(1)); out.write(be16(1))
    out.write(0); out.write(0)
    // SOF0: len = 8 + 3*ncomp, precision 8, height, width, components
    out.write(0xff); out.write(0xc0)
    out.write(be16(8 + 3 * ncomp))
    out.write(8)
    out.write(be16(h)); out.write(be16(w))
    out.write(ncomp)
    (1 to ncomp).foreach { c =>
      out.write(c)    // component id
      out.write(0x11) // 1x1 sampling
      out.write(0)    // quant table 0
    }
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Pseudo-random 8×8-block level, shared by the CROSS-FORMAT
    * fixtures: the same `(bx, by, key)` mix drives a PNG and a JPEG
    * of identical rasters, so a pixel-space perceptual hash must
    * collapse the re-encode pair. Avalanched so distinct keys give
    * uncorrelated block patterns (no accidental cross-document dHash
    * collisions). */
  def blockMix(bx: Int, by: Int, key: Long): Int = {
    // full-avalanche key finalizer (splitmix64): a bare `key * GOLDEN`
    // left keys at constant additive distance with CORRELATED low
    // bits, and ids whose (w, h) sample the same dHash block grid then
    // collided at ~1e-3 instead of 2^-64 (observed at 50k docs: 31
    // structural pairs, every one at doc-id distance 11648)
    var z = key + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    var m = (z ^ (z >>> 31)).toInt
    m = (m ^ bx) * 0x85EBCA6B
    m = (m ^ (m >>> 13) ^ by) * 0xC2B2AE35
    m ^= m >>> 15
    m & 0xff
  }

  /** Grayscale PNG whose pixels are the flat 8×8 blocks of
    * [[blockMix]] — the lossless-format half of a cross-format
    * near-duplicate pair (its JPEG twin is [[jpegBlockBytes]]). */
  def pngBlockBytes(w: Int, h: Int, key: Long): Array[Byte] =
    encodePng(w, h, colorType = 0,
      (x, y, _) => blockMix(x / 8, y / 8, key))

  /** Baseline JPEG of the SAME raster as [[pngBlockBytes]] — flat
    * blocks under unit quant tables decode exactly (see
    * [[jpegPixelBytes]]), so the two formats rasterize
    * byte-identically. */
  def jpegBlockBytes(w: Int, h: Int, key: Long): Array[Byte] =
    encodeJpeg(w, h, ncomp = 1, (bx, by) => blockMix(bx, by, key))

  /** A complete baseline JPEG (ITU T.81) CARRYING PIXELS the oracle
    * can regenerate arithmetically despite the format being lossy:
    * every 8×8 block is FLAT at luma level
    * `(17·bx + 29·by + seed) mod 256` (bx = x/8, by = y/8), the quant
    * table is all ones, and chroma sits at 128. A flat block's
    * forward DCT has only the DC term `8·(L−128)` — an exact integer
    * that quantization by 1 preserves — so ANY conforming decoder
    * reconstructs exactly L (and Cb=Cr=128 makes RGB = (L,L,L) with
    * zero color-convert rounding). The stream is fully real: DQT,
    * SOF0, canonical DHT tables, an interleaved entropy-coded scan
    * with byte stuffing — `javax.imageio` decodes it, independently
    * of [[JpegPixels]]. Huffman tables are minimal-but-legal custom
    * canonical tables (DC: twelve 4-bit codes for categories 0–11;
    * AC: one 2-bit EOB code), which the decoder must parse from DHT
    * like any other table. */
  def jpegPixelBytes(w: Int, h: Int, ncomp: Int, seed: Int): Array[Byte] =
    encodeJpeg(w, h, ncomp, (mx, my) => (17 * mx + 29 * my + seed) % 256)

  /** [[jpegPixelBytes]] with RESTART MARKERS: a DRI segment declares
    * the interval and an RSTn (n cycling 0..7) splits the entropy
    * stream every `restartInterval` MCUs, DC predictors resetting —
    * the resync structure streaming/robust encoders emit, exercised
    * against both our decoder and ImageIO. */
  def jpegPixelBytesRst(w: Int, h: Int, ncomp: Int, seed: Int,
                        restartInterval: Int): Array[Byte] =
    encodeJpeg(w, h, ncomp, (mx, my) => (17 * mx + 29 * my + seed) % 256,
      restartInterval)

  /** The shared baseline-JPEG encoder: flat 8×8 luma blocks at
    * `level(bx, by)`, chroma pinned to 128 — see [[jpegPixelBytes]]
    * for why that construction is losslessly decodable. */
  private def encodeJpeg(w: Int, h: Int, ncomp: Int,
                         level: (Int, Int) => Int,
                         restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && (ncomp == 1 || ncomp == 3),
      s"bad jpeg fixture ${w}x$h ncomp=$ncomp")
    val out = new ByteArrayOutputStream()
    def marker(m: Int, body: Array[Byte]): Unit = {
      out.write(0xff); out.write(m)
      out.write(be16(body.length + 2)); out.write(body)
    }
    out.write(0xff); out.write(0xd8) // SOI
    marker(0xe0, "JFIF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 1, 0) ++
      be16(1) ++ be16(1) ++ Array[Byte](0, 0))
    marker(0xdb, Array[Byte](0x00) ++ Array.fill[Byte](64)(1)) // DQT: q ≡ 1
    marker(0xc0, Array[Byte](8) ++ be16(h) ++ be16(w) ++
      Array[Byte](ncomp.toByte) ++
      (1 to ncomp).flatMap(c => Seq(c.toByte, 0x11.toByte, 0.toByte)))
    // DHT DC table 0: categories 0..11 as the twelve 4-bit codes
    marker(0xc4, Array[Byte](0x00, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0) ++ (0 to 11).map(_.toByte))
    // DHT AC table 0: single 2-bit code "00" for EOB
    marker(0xc4, Array[Byte](0x10, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0x00))
    if (restartInterval > 0) // DRI
      marker(0xdd, be16(restartInterval))
    marker(0xda, Array[Byte](ncomp.toByte) ++
      (1 to ncomp).flatMap(c => Seq(c.toByte, 0x00.toByte)) ++
      Array[Byte](0, 63, 0))
    // entropy-coded scan: MSB-first bits, 0xFF byte-stuffed, 1-padded
    var acc = 0; var nbits = 0
    def emit(v: Int, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        acc = (acc << 1) | ((v >> k) & 1); nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00)
          acc = 0; nbits = 0
        }
        k -= 1
      }
    }
    val mcusX = (w + 7) / 8
    val mcusY = (h + 7) / 8
    val pred = new Array[Int](ncomp)
    var mcu = 0
    var rstN = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          // byte-align with 1-bits, emit RSTn, reset the DC predictors
          while (nbits != 0) emit(1, 1)
          out.write(0xff); out.write(0xd0 + rstN)
          rstN = (rstN + 1) & 7
          java.util.Arrays.fill(pred, 0)
        }
        var c = 0
        while (c < ncomp) {
          val lv = if (c == 0) level(mx, my) else 128
          val dc = 8 * (lv - 128)
          val diff = dc - pred(c)
          pred(c) = dc
          val s =
            if (diff == 0) 0
            else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
          emit(s, 4) // DC category code (canonical code for cat s IS s)
          if (s > 0)
            emit((if (diff < 0) diff + (1 << s) - 1 else diff) & ((1 << s) - 1), s)
          emit(0, 2) // AC EOB
          c += 1
        }
        mx += 1
        mcu += 1
      }
      my += 1
    }
    if (nbits > 0) { // pad the final byte with 1-bits per T.81 F.1.2.3
      while (nbits != 0) emit(1, 1)
    }
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** A complete, valid GIF89a: logical screen descriptor with 8-bit
    * color resolution, 2-entry global color table, one full-size
    * all-background image frame (real LZW stream — a clear code before
    * every pixel keeps the code width fixed at 3 bits, the standard
    * minimal-encoder trick), trailer. `ImageIO.read` decodes it. */
  /** Spec-valid GIF89a carrying a seeded checkerboard: pixel (x, y)
    * holds palette index `(x + y + seed) % 2` over the black/white
    * 2-entry global table, so channel values are
    * `255 * ((x + y + seed) % 2)` for all three channels — an oracle
    * regenerates them arithmetically. The LZW stream is
    * literal-coded after ONE initial clear (no per-pixel clears), so
    * the dictionary grows by one slot per literal and the code width
    * escalates 3→4→… exactly as a real encoder's would — a decoder
    * that mistracks dictionary growth or bump timing desynchronizes
    * within the first dozen pixels. */
  def gifBytes(w: Int, h: Int, seed: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    val out = new ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(le16(w)); out.write(le16(h))
    // packed: global table present (0x80) | color resolution 8 (0x70)
    // | table size 2 entries (0x00)
    out.write(0x80 | 0x70)
    out.write(0) // background color index
    out.write(0) // pixel aspect
    out.write(Array[Byte](0, 0, 0, -1, -1, -1)) // 2-entry palette
    // image descriptor: full logical screen, global palette
    out.write(0x2c)
    out.write(le16(0)); out.write(le16(0))
    out.write(le16(w)); out.write(le16(h))
    out.write(0)
    // LZW min code size 2 → clear=4, EOI=5, first free slot 6, codes
    // start at 3 bits, packed LSB-first
    out.write(2)
    val bits = new ByteArrayOutputStream()
    var acc = 0L; var nbits = 0; var width = 3; var next = 6
    def emit(code: Int): Unit = {
      acc |= (code.toLong << nbits); nbits += width
      while (nbits >= 8) {
        bits.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8
      }
    }
    emit(4) // one clear up front; literals from here on
    var i = 0
    while (i < w * h) {
      val x = i % w; val y = i / w
      emit((x + y + seed) % 2)
      // a decoder adds a dictionary entry for every code after the
      // first and bumps the width when the next slot crosses a power
      // of two — mirror that bookkeeping so later codes are emitted
      // at the width the decoder will read them at
      if (i > 0 && next < 4096) {
        next += 1
        if (next == (1 << width) && width < 12) width += 1
      }
      i += 1
    }
    emit(5) // EOI
    if (nbits > 0) bits.write((acc & 0xff).toInt)
    // data sub-blocks of <= 255 bytes, then the 0 terminator
    bits.toByteArray.grouped(255).foreach { blk =>
      out.write(blk.length); out.write(blk)
    }
    out.write(0)
    out.write(0x3b) // trailer
    out.toByteArray
  }
}
