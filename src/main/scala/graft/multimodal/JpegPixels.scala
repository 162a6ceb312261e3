package graft.multimodal

import scala.util.control.NonFatal

/** Pure-JVM baseline JPEG PIXEL decode (ITU-T T.81, public spec):
  * marker walk → DQT / DHT / SOF0 / SOS → Huffman entropy decode →
  * dequantize + de-zigzag → float IDCT per 8×8 block → chroma
  * upsample (triangle filter for the 2:1 ratios, JFIF-centered
  * siting) → YCbCr→RGB. Covers the baseline/extended sequential
  * Huffman subset that every JFIF encoder (including the JDK's)
  * emits: 8-bit precision, 1 or 3 components, sampling ratios 1–2,
  * restart markers, single interleaved scan (or the single-component
  * non-interleaved scan). Progressive (SOF2), arithmetic coding,
  * 12-bit, hierarchical, and CMYK streams return None — the
  * quarantine signal — and so does any corrupt stream; decode never
  * throws.
  *
  * This closes the last byte-stats fallback of the multimodal plane:
  * JPEG's entropy layer is plain Huffman over public tables and its
  * transform is the type-II DCT — byte and cosine algebra, no codec
  * library required. (Reference stance on media payloads: bytes ride
  * opaque, `string/StringRecordWriterProvider.java:71-80`; the decode
  * plane is this engine's LLM-pipeline extension.)
  */
object JpegPixels {

  /** Scan (zigzag) index → natural raster index (T.81 Figure 5). */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** CosTab(x)(u) = C(u)/2 · cos((2x+1)uπ/16) — the separable halves
    * of the T.81 A.3.3 inverse DCT. */
  private val CosTab: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  private final class Truncated extends RuntimeException("truncated", null, false, false)

  /** MSB-first bit reader over the entropy-coded segment with 0xFF00
    * byte-unstuffing. A bare marker inside the segment (other than the
    * RSTn consumed by [[restart]]) means the stream lied about its MCU
    * count — treated as truncation. */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0

    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= data.length) throw new Truncated
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= data.length) throw new Truncated
          if ((data(pos) & 0xff) != 0x00) throw new Truncated
          pos += 1
          b = 0xff
        }
        acc = b
        nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }

    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    /** Byte-align and consume the expected RSTn marker (T.81 E.1.4). */
    def restart(n: Int): Unit = {
      nbits = 0
      if (pos + 1 >= data.length + 1 || pos + 2 > data.length) throw new Truncated
      if ((data(pos) & 0xff) != 0xff ||
          (data(pos + 1) & 0xff) != (0xd0 + (n & 7))) throw new Truncated
      pos += 2
    }
  }

  /** Canonical Huffman table (T.81 Annex C code assignment, F.2.2.3
    * decode procedure). */
  private final class Huff(counts: Array[Int], values: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        if (counts(l - 1) > 0) {
          code += counts(l - 1)
          k += counts(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.bit()
      var l = 1
      while (l <= 16 && (maxCode(l) < 0 || code > maxCode(l))) {
        code = (code << 1) | br.bit()
        l += 1
      }
      if (l > 16) throw new Truncated
      values(valPtr(l) + code - minCode(l))
    }
  }

  /** T.81 F.2.2.1 EXTEND: map an s-bit magnitude to its signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final case class Comp(id: Int, hi: Int, vi: Int, tq: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

  private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Dequantized natural-order coefficients → 64 clamped samples
    * (+128 level shift). DC-only blocks short-circuit: IDCT of a lone
    * DC is the flat value DC/8. */
  private def idctBlock(coef: Array[Int], out: Array[Int]): Unit = {
    var onlyDc = true
    var i = 1
    while (i < 64 && onlyDc) { onlyDc = coef(i) == 0; i += 1 }
    if (onlyDc) {
      val v = clamp(math.round(coef(0) / 8.0).toInt + 128)
      java.util.Arrays.fill(out, v)
      return
    }
    val tmp = new Array[Double](64) // tmp(u*8 + y) = Σ_v CosTab(y)(v)·F(u,v)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += CosTab(y)(v) * coef(v * 8 + u); v += 1 }
        tmp(u * 8 + y) = s
        y += 1
      }
      u += 1
    }
    var yy = 0
    while (yy < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var uu = 0
        while (uu < 8) { s += CosTab(x)(uu) * tmp(uu * 8 + yy); uu += 1 }
        out(yy * 8 + x) = clamp(math.round(s).toInt + 128)
        x += 1
      }
      yy += 1
    }
  }

  /** 2× triangle upsample of one axis (3/4·near + 1/4·far, edges
    * replicated) — the JFIF-centered chroma siting every libjpeg-family
    * decoder applies, so goldens against the JDK stay within ±2. */
  private def triangle2x(in: Array[Byte], n: Int, out: Array[Byte]): Unit = {
    var i = 0
    while (i < n) {
      val c = in(i) & 0xff
      val l = in(if (i > 0) i - 1 else 0) & 0xff
      val r = in(if (i + 1 < n) i + 1 else n - 1) & 0xff
      out(2 * i) = ((3 * c + l + 1) >> 2).toByte
      out(2 * i + 1) = ((3 * c + r + 2) >> 2).toByte
      i += 1
    }
  }

  /** Upsample a component plane to full resolution. Ratios of 1 copy,
    * ratios of 2 triangle-filter; anything else was rejected at parse. */
  private def upsample(plane: Array[Byte], pw: Int, ph: Int,
                       rx: Int, ry: Int, w: Int, h: Int): Array[Byte] = {
    var cur = plane
    var cw = pw
    var chh = ph
    if (ry == 2) { // vertical pass: each input row becomes two
      val next = new Array[Byte](cw * chh * 2)
      val colIn = new Array[Byte](chh)
      val colOut = new Array[Byte](chh * 2)
      var x = 0
      while (x < cw) {
        var y = 0
        while (y < chh) { colIn(y) = cur(y * cw + x); y += 1 }
        triangle2x(colIn, chh, colOut)
        y = 0
        while (y < 2 * chh) { next(y * cw + x) = colOut(y); y += 1 }
        x += 1
      }
      cur = next
      chh *= 2
    }
    if (rx == 2) { // horizontal pass
      val next = new Array[Byte](cw * 2 * chh)
      val rowOut = new Array[Byte](cw * 2)
      val rowIn = new Array[Byte](cw)
      var y = 0
      while (y < chh) {
        System.arraycopy(cur, y * cw, rowIn, 0, cw)
        triangle2x(rowIn, cw, rowOut)
        System.arraycopy(rowOut, 0, next, y * cw * 2, cw * 2)
        y += 1
      }
      cur = next
      cw *= 2
    }
    if (cw == w && chh == h) cur
    else { // crop block padding
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        System.arraycopy(cur, y * cw, out, y * w, w)
        y += 1
      }
      out
    }
  }

  def decode(bytes: Array[Byte]): Option[PngPixels.Image] =
    try decodeImpl(bytes)
    catch { case NonFatal(_) => None }

  private def decodeImpl(b: Array[Byte]): Option[PngPixels.Image] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    val quant = new Array[Array[Int]](4) // zigzag order, per tq
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Comp] = null
    var w = 0
    var h = 0
    var restartInterval = 0
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return None
      var m = u8(b, i + 1)
      while (m == 0xff && i + 2 < b.length) { i += 1; m = u8(b, i + 1) }
      if (m == 0xd9) return None // EOI before SOS
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { i += 2 }
      else {
        if (i + 3 >= b.length) return None
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        val body = i + 4
        val bodyLen = len - 2
        m match {
          case 0xdb => // DQT: one or more (pq/tq, entries) runs
            var p = body
            while (p < body + bodyLen) {
              val pq = u8(b, p) >> 4
              val tq = u8(b, p) & 15
              if (tq > 3 || pq > 1) return None
              // table entries must fit INSIDE this segment — a lying
              // length field must quarantine, not read garbage tables
              if (p + 1 + (if (pq == 1) 128 else 64) > body + bodyLen)
                return None
              val t = new Array[Int](64)
              p += 1
              var k = 0
              while (k < 64) {
                if (pq == 1) { t(k) = be16(b, p); p += 2 }
                else { t(k) = u8(b, p); p += 1 }
                if (t(k) == 0) return None
                k += 1
              }
              quant(tq) = t
            }
          case 0xc4 => // DHT: one or more (tc/th, bits, values) runs
            var p = body
            while (p < body + bodyLen) {
              val tc = u8(b, p) >> 4
              val th = u8(b, p) & 15
              if (tc > 1 || th > 3) return None
              p += 1
              if (p + 16 > body + bodyLen) return None
              val counts = new Array[Int](16)
              var total = 0
              var k = 0
              while (k < 16) { counts(k) = u8(b, p + k); total += counts(k); k += 1 }
              p += 16
              // bound by the SEGMENT end, not the whole byte array —
              // otherwise a short length lets values spill into the
              // next marker and decode silently-wrong pixels
              if (total > 256 || p + total > body + bodyLen) return None
              val values = new Array[Int](total)
              k = 0
              while (k < total) { values(k) = u8(b, p + k); k += 1 }
              p += total
              val tab = new Huff(counts, values)
              if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
            }
          case 0xc0 | 0xc1 => // SOF0/SOF1: baseline / extended sequential
            // same segment-bounds rule as DQT/DHT: a lying length
            // would let the component specs read the next marker's
            // bytes in-bounds and decode a silently wrong raster
            if (bodyLen < 6) return None
            if (u8(b, body) != 8) return None // 8-bit precision only
            h = be16(b, body + 1)
            w = be16(b, body + 3)
            val nc = u8(b, body + 5)
            if (w <= 0 || h <= 0 || (nc != 1 && nc != 3)) return None
            if (bodyLen < 6 + 3 * nc) return None
            comps = Array.tabulate(nc) { c =>
              val o = body + 6 + 3 * c
              Comp(u8(b, o), u8(b, o + 1) >> 4, u8(b, o + 1) & 15, u8(b, o + 2))
            }
            if (comps.exists(c => c.hi < 1 || c.hi > 2 || c.vi < 1 || c.vi > 2 || c.tq > 3))
              return None
          case mm if mm >= 0xc2 && mm <= 0xcf && mm != 0xc4 && mm != 0xc8 && mm != 0xcc =>
            return None // progressive / arithmetic / lossless / hierarchical
          case 0xdd => // DRI
            if (bodyLen < 2) return None
            restartInterval = be16(b, body)
          case 0xda => // SOS — entropy data follows; decode and return
            if (comps == null) return None
            if (bodyLen < 1) return None
            val ns = u8(b, body)
            if (ns != comps.length) return None
            // ns byte + 2 bytes per component + Ss/Se/AhAl trailer
            if (bodyLen < 1 + 2 * ns + 3) return None
            val scanDc = new Array[Huff](ns)
            val scanAc = new Array[Huff](ns)
            val order = new Array[Int](ns)
            var sc = 0
            while (sc < ns) {
              val cs = u8(b, body + 1 + 2 * sc)
              val ci = comps.indexWhere(_.id == cs)
              if (ci < 0) return None
              order(sc) = ci
              val td = u8(b, body + 2 + 2 * sc) >> 4
              val ta = u8(b, body + 2 + 2 * sc) & 15
              if (td > 3 || ta > 3 || dcTabs(td) == null || acTabs(ta) == null)
                return None
              scanDc(sc) = dcTabs(td)
              scanAc(sc) = acTabs(ta)
              sc += 1
            }
            if (comps.exists(c => quant(c.tq) == null)) return None
            return decodeScan(b, i + 2 + len, w, h, comps, order, scanDc,
              scanAc, quant, restartInterval)
          case _ => () // APPn / COM / others: skip
        }
        i += 2 + len
      }
    }
    None
  }

  private def decodeScan(b: Array[Byte], dataPos: Int, w: Int, h: Int,
                         compsIn: Array[Comp], order: Array[Int],
                         scanDc: Array[Huff], scanAc: Array[Huff],
                         quant: Array[Array[Int]],
                         restartInterval: Int): Option[PngPixels.Image] = {
    val nc = compsIn.length
    if (w.toLong * h * nc > (1L << 30)) return None // hostile-header guard
    // T.81 A.2.2: a NON-INTERLEAVED scan (here: the single-component
    // frame) has one data unit per MCU over the component's own
    // ceil(w/8) x ceil(h/8) block grid in raster order — the declared
    // sampling factors shape only interleaved MCU structure. Decoding
    // a 2x2-declared grayscale with interleaved geometry would place
    // blocks at wrong positions (and only coincidentally parse).
    val comps =
      if (nc == 1) compsIn.map(_.copy(hi = 1, vi = 1)) else compsIn
    val hmax = comps.map(_.hi).max
    val vmax = comps.map(_.vi).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // per-component planes at padded (block-grid) resolution
    val pw = comps.map(c => mcusX * c.hi * 8)
    val ph = comps.map(c => mcusY * c.vi * 8)
    val planes = Array.tabulate(nc)(c => new Array[Byte](pw(c) * ph(c)))

    val br = new BitReader(b, dataPos)
    val pred = new Array[Int](nc)
    val coef = new Array[Int](64)
    val px = new Array[Int](64)
    var mcu = 0
    var rstN = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.restart(rstN)
        rstN = (rstN + 1) & 7
        java.util.Arrays.fill(pred, 0)
      }
      val my = mcu / mcusX
      val mx = mcu % mcusX
      var sc = 0
      while (sc < nc) {
        val ci = order(sc)
        val c = comps(ci)
        val qt = quant(c.tq)
        var by = 0
        while (by < c.vi) {
          var bx = 0
          while (bx < c.hi) {
            java.util.Arrays.fill(coef, 0)
            // DC (F.2.2.1)
            val s = scanDc(sc).decode(br)
            if (s > 11) return None
            pred(ci) += extend(br.bits(s), s)
            coef(0) = pred(ci) * qt(0)
            // AC (F.2.2.2)
            var k = 1
            while (k < 64) {
              val rs = scanAc(sc).decode(br)
              val r = rs >> 4
              val sz = rs & 15
              if (sz == 0) {
                if (r == 15) k += 16 else k = 64 // ZRL / EOB
              } else {
                k += r
                if (k > 63) return None
                coef(Zigzag(k)) = extend(br.bits(sz), sz) * qt(k)
                k += 1
              }
            }
            idctBlock(coef, px)
            // place the block into the component plane
            val ox = (mx * c.hi + bx) * 8
            val oy = (my * c.vi + by) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                planes(ci)((oy + yy) * pw(ci) + ox + xx) = px(yy * 8 + xx).toByte
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        sc += 1
      }
      mcu += 1
    }

    if (nc == 1) {
      val full = upsample(planes(0), pw(0), ph(0), 1, 1, w, h)
      Some(PngPixels.Image(w, h, 1, full))
    } else {
      val y = upsample(planes(0), pw(0), ph(0), hmax / comps(0).hi,
        vmax / comps(0).vi, w, h)
      val cb = upsample(planes(1), pw(1), ph(1), hmax / comps(1).hi,
        vmax / comps(1).vi, w, h)
      val cr = upsample(planes(2), pw(2), ph(2), hmax / comps(2).hi,
        vmax / comps(2).vi, w, h)
      val out = new Array[Byte](w * h * 3)
      var p = 0
      while (p < w * h) {
        val yv = y(p) & 0xff
        val cbv = (cb(p) & 0xff) - 128
        val crv = (cr(p) & 0xff) - 128
        out(3 * p) = clamp(math.round(yv + 1.402 * crv).toInt).toByte
        out(3 * p + 1) =
          clamp(math.round(yv - 0.344136 * cbv - 0.714136 * crv).toInt).toByte
        out(3 * p + 2) = clamp(math.round(yv + 1.772 * cbv).toInt).toByte
        p += 1
      }
      Some(PngPixels.Image(w, h, 3, out))
    }
  }
}
