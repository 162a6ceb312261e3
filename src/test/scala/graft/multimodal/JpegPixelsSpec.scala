package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.scalatest.funsuite.AnyFunSuite

/** The JPEG decode story, pinned three independent ways:
  *  1. the flat-block fixture ([[ImageFixtures.jpegPixelBytes]]) is
  *     lossless by construction — our decode must be EXACT against the
  *     generating arithmetic;
  *  2. `javax.imageio` (an independent, codec-backed implementation)
  *     must agree with us on that same byte stream;
  *  3. on REAL encoder output (ImageIO's own writer: libjpeg-derived
  *     quant tables, standard Huffman tables, 4:2:0 subsampling for
  *     color) our decode must track ImageIO's decode within the
  *     tolerance different conforming IDCT/upsample implementations
  *     are allowed (T.81 Annex A accuracy is per-implementation).
  */
class JpegPixelsSpec extends AnyFunSuite {

  private def expectedLevel(bx: Int, by: Int, seed: Int): Int =
    (17 * bx + 29 * by + seed) % 256

  test("flat-block fixture decodes EXACTLY to the generating arithmetic") {
    for ((w, h, nc, seed) <- Seq((17, 13, 1, 5), (61, 53, 3, 200),
        (8, 8, 3, 0), (1, 1, 1, 7), (24, 9, 3, 255), (7, 16, 1, 31))) {
      val img = JpegPixels.decode(
        ImageFixtures.jpegPixelBytes(w, h, nc, seed)).get
      assert(img.width == w && img.height == h && img.channels == nc)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until nc) {
        val got = img.pixels((y * w + x) * nc + c) & 0xff
        assert(got == expectedLevel(x / 8, y / 8, seed),
          s"pixel ($x,$y,$c) of ${w}x$h nc=$nc seed=$seed")
      }
    }
  }

  test("ImageIO independently decodes the fixture to the same raster") {
    for ((w, h, nc, seed) <- Seq((17, 13, 1, 5), (61, 53, 3, 200),
        (24, 9, 3, 255))) {
      val bytes = ImageFixtures.jpegPixelBytes(w, h, nc, seed)
      val gold = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(gold != null, "ImageIO refused the fixture stream")
      assert(gold.getWidth == w && gold.getHeight == h)
      val raster = gold.getRaster
      for (y <- 0 until h; x <- 0 until w) {
        val expect = expectedLevel(x / 8, y / 8, seed)
        // raw raster samples: getRGB would gamma-convert gray to sRGB
        for (band <- 0 until raster.getNumBands)
          assert(raster.getSample(x, y, band) == expect,
            s"($x,$y,$band) ${w}x$h nc=$nc")
      }
    }
  }

  /** Encode a BufferedImage through the JDK's real JPEG writer. */
  private def imageioJpeg(img: BufferedImage, quality: Float,
                          progressive: Boolean = false): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    if (progressive) param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(img, null, null), param)
    writer.dispose()
    ios.flush()
    bos.toByteArray
  }

  /** Smooth deterministic test card (smooth content keeps conforming
    * decoder disagreement at the rounding scale, not the ringing
    * scale). */
  private def gradient(w: Int, h: Int, gray: Boolean): BufferedImage = {
    val img = new BufferedImage(w, h,
      if (gray) BufferedImage.TYPE_BYTE_GRAY else BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 2 + y) % 256
      val g = (x + y * 2) % 256
      val b = (x + y + 64) % 256
      img.setRGB(x, y,
        if (gray) { val v = (x * 2 + y) % 256; (v << 16) | (v << 8) | v }
        else (r << 16) | (g << 8) | b)
    }
    img
  }

  private def maxAndMeanDiff(ours: PngPixels.Image,
                             gold: BufferedImage): (Int, Double) = {
    var maxd = 0
    var sum = 0L
    var n = 0L
    // raw raster samples: getRGB gamma-converts single-band gray
    val raster = gold.getRaster
    for (y <- 0 until ours.height; x <- 0 until ours.width;
         c <- 0 until ours.channels) {
      val got = ours.pixels((y * ours.width + x) * ours.channels + c) & 0xff
      val d = math.abs(got - raster.getSample(x, y, c))
      if (d > maxd) maxd = d
      sum += d
      n += 1
    }
    (maxd, sum.toDouble / n)
  }

  test("real-encoder grayscale: our decode tracks ImageIO's within IDCT tolerance") {
    for ((w, h) <- Seq((40, 32), (33, 27))) {
      val bytes = imageioJpeg(gradient(w, h, gray = true), 0.9f)
      val ours = JpegPixels.decode(bytes).get
      assert(ours.width == w && ours.height == h && ours.channels == 1)
      val (maxd, meand) = maxAndMeanDiff(ours, ImageIO.read(
        new ByteArrayInputStream(bytes)))
      assert(maxd <= 2, s"gray ${w}x$h maxdiff=$maxd")
      assert(meand <= 0.5, s"gray ${w}x$h meandiff=$meand")
    }
  }

  test("real-encoder color (4:2:0): our decode tracks ImageIO's") {
    for ((w, h) <- Seq((48, 40), (35, 29))) {
      val bytes = imageioJpeg(gradient(w, h, gray = false), 0.85f)
      val ours = JpegPixels.decode(bytes).get
      assert(ours.width == w && ours.height == h && ours.channels == 3)
      val (maxd, meand) = maxAndMeanDiff(ours, ImageIO.read(
        new ByteArrayInputStream(bytes)))
      // chroma upsample phase + IDCT rounding both differ between
      // conforming implementations; smooth content bounds it tightly
      assert(maxd <= 4, s"color ${w}x$h maxdiff=$maxd")
      assert(meand <= 1.0, s"color ${w}x$h meandiff=$meand")
    }
  }

  test("progressive, corrupt, truncated, and foreign payloads quarantine as None") {
    val prog = imageioJpeg(gradient(32, 24, gray = false), 0.8f,
      progressive = true)
    assert(JpegPixels.decode(prog).isEmpty, "progressive must route to None")
    val good = ImageFixtures.jpegPixelBytes(24, 16, 3, 9)
    assert(JpegPixels.decode(good.take(good.length / 2)).isEmpty)
    assert(JpegPixels.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(JpegPixels.decode(ImageFixtures.pngBytes(4, 4, 2)).isEmpty)
    assert(JpegPixels.decode(ImageFixtures.gifBytes(4, 4)).isEmpty)
    // header-only legacy fixture (no scan) also quarantines
    assert(JpegPixels.decode(ImageFixtures.jpegBytes(4, 4, 3)).isEmpty)
  }

  test("lying DQT/DHT length fields quarantine instead of reading past the segment") {
    val bytes = ImageFixtures.jpegPixelBytes(17, 13, 3, 5)
    def findMarker(m: Int): Int = {
      var i = 2
      while (i + 1 < bytes.length &&
        !((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == m)) i += 1
      assert(i + 1 < bytes.length, s"marker $m not in fixture")
      i
    }
    // shrink DHT len to 19 (tc/th + 16 counts fit, values spill):
    // table parsing must stop at the segment end, not b.length
    val dht = findMarker(0xc4)
    val evil1 = bytes.clone()
    evil1(dht + 2) = 0; evil1(dht + 3) = 19
    assert(JpegPixels.decode(evil1).isEmpty)
    // shrink DQT len to 3 (pq/tq only, zero of the 64 entries fit)
    val dqt = findMarker(0xdb)
    val evil2 = bytes.clone()
    evil2(dqt + 2) = 0; evil2(dqt + 3) = 3
    assert(JpegPixels.decode(evil2).isEmpty)
  }

  test("non-interleaved scan ignores declared sampling factors (T.81 A.2.2)") {
    // a grayscale stream whose SOF declares 2x2 sampling (jpegtran
    // -grayscale keeps the luma factors): the single-component scan is
    // NON-interleaved, one block per MCU in raster order — decoding it
    // with interleaved 2x2 geometry would misplace every block
    for ((w, h, seed) <- Seq((32, 32, 9), (40, 24, 3), (17, 13, 77))) {
      val bytes = ImageFixtures.jpegPixelBytes(w, h, 1, seed)
      // patch the SOF0 component's sampling byte 0x11 -> 0x22
      val sof = (0 until bytes.length - 1).find(i =>
        (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xc0).get
      val sampIdx = sof + 4 + 7 // len(2) + precision + h(2) + w(2) + nc + id
      assert((bytes(sampIdx) & 0xff) == 0x11, "fixture layout moved")
      val patched = bytes.clone()
      patched(sampIdx) = 0x22.toByte
      val img = JpegPixels.decode(patched).get
      assert(img.width == w && img.height == h && img.channels == 1)
      for (y <- 0 until h; x <- 0 until w)
        assert((img.pixels(y * w + x) & 0xff) ==
          expectedLevel(x / 8, y / 8, seed), s"($x,$y) ${w}x$h")
      // ImageIO agrees on the same patched stream
      val gold = ImageIO.read(new ByteArrayInputStream(patched))
      assert(gold != null)
      val raster = gold.getRaster
      for (y <- 0 until h; x <- 0 until w)
        assert(raster.getSample(x, y, 0) == expectedLevel(x / 8, y / 8, seed))
    }
  }

  test("restart markers: DRI/RSTn streams decode exactly, ImageIO agrees") {
    for ((w, h, nc, seed, dri) <- Seq((40, 24, 1, 11, 2), (61, 53, 3, 77, 3),
        (17, 9, 1, 200, 1))) {
      val bytes = ImageFixtures.jpegPixelBytesRst(w, h, nc, seed, dri)
      assert(bytes.sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7),
        "fixture must actually contain RST markers")
      val img = JpegPixels.decode(bytes).get
      for (y <- 0 until h; x <- 0 until w; c <- 0 until nc)
        assert((img.pixels((y * w + x) * nc + c) & 0xff) ==
          expectedLevel(x / 8, y / 8, seed), s"($x,$y,$c) dri=$dri")
      val gold = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(gold != null, "ImageIO refused the restart-marker stream")
      val raster = gold.getRaster
      for (y <- 0 until h; x <- 0 until w; band <- 0 until raster.getNumBands)
        assert(raster.getSample(x, y, band) ==
          expectedLevel(x / 8, y / 8, seed), s"gold ($x,$y) dri=$dri")
    }
  }

  test("cross-format twins decode byte-identically through both codecs") {
    for (key <- Seq(0L, 7L, 333L)) {
      val (w, h) = ((96 + key % 41).toInt, (96 + (key * 5) % 37).toInt)
      val png = PngPixels.decode(ImageFixtures.pngBlockBytes(w, h, key)).get
      val jpg = JpegPixels.decode(ImageFixtures.jpegBlockBytes(w, h, key)).get
      assert(png.width == jpg.width && png.height == jpg.height &&
        png.channels == 1 && jpg.channels == 1)
      assert(java.util.Arrays.equals(png.pixels, jpg.pixels),
        s"key=$key rasters must be byte-identical across formats")
      assert(Multimodal.dHash(png) == Multimodal.dHash(jpg))
    }
  }

  test("PNG/GIF decoders refuse the JPEG pixel fixture") {
    val bytes = ImageFixtures.jpegPixelBytes(6, 6, 1, 1)
    assert(PngPixels.decode(bytes).isEmpty)
    assert(GifPixels.decode(bytes).isEmpty)
  }
}
