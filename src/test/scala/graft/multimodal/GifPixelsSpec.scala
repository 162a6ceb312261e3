package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

/** The GIF LZW decoder against two independent checks, mirroring
  * [[PngPixelsSpec]]: (a) the JDK's ImageIO raster of the fixture
  * bytes must match sample-for-sample, and (b) JDK-ENCODED GIFs —
  * whose LZW streams carry real multi-byte dictionary entries and
  * KwKwK self-references we don't control — must decode back to the
  * exact pixels that were drawn. */
class GifPixelsSpec extends AnyFunSuite {

  test("fixture GIFs decode byte-identically to the JDK's ImageIO raster") {
    // 13x11 = 143 literals: the dictionary grows past 8, 16, 32, 64,
    // 128 — five code-width escalations — so any bump-timing error
    // desynchronizes mid-image; plus a 1x1 degenerate
    for ((w, h) <- Seq((13, 11), (61, 53), (1, 1)); seed <- Seq(0, 97)) {
      val bytes = ImageFixtures.gifBytes(w, h, seed)
      val img = GifPixels.decode(bytes)
        .getOrElse(fail(s"${w}x$h seed=$seed did not decode"))
      assert((img.width, img.height, img.channels) === ((w, h, 3)))
      val jdk = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(jdk != null, "ImageIO must accept the fixture")
      for (y <- 0 until h; x <- 0 until w) {
        val expected = 255 * ((x + y + seed) % 2)
        val base = (y * w + x) * 3
        for (c <- 0 until 3) {
          assert((img.pixels(base + c) & 0xff) === expected,
            s"${w}x$h seed=$seed ours at ($x,$y,$c)")
        }
        // JDK cross-check via packed RGB (its GIF raster is indexed)
        val rgb = jdk.getRGB(x, y)
        assert((rgb & 0xff) === expected &&
          ((rgb >> 8) & 0xff) === expected &&
          ((rgb >> 16) & 0xff) === expected,
          s"${w}x$h seed=$seed jdk at ($x,$y)")
      }
    }
  }

  test("JDK-encoded GIFs (real LZW dictionary strings) decode to the drawn pixels") {
    // content with long repeated runs AND noise: the JDK encoder
    // emits genuine dictionary-hit codes (multi-byte entries) and, on
    // run boundaries, the KwKwK code == next-slot case
    for ((w, h) <- Seq((9, 7), (64, 64))) {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED)
      for (y <- 0 until h; x <- 0 until w) {
        val v = if ((x / 8) % 2 == 0) 0 else (x * 31 + y * 17) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val out = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "gif", out))
      val bytes = out.toByteArray
      val dec = GifPixels.decode(bytes)
        .getOrElse(fail(s"JDK GIF ${w}x$h did not decode"))
      assert((dec.width, dec.height, dec.channels) === ((w, h, 3)))
      // compare against the JDK's own read-back of its encoding (the
      // indexed write may quantize, so the re-read is the golden)
      val jdk = ImageIO.read(new ByteArrayInputStream(bytes))
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = jdk.getRGB(x, y)
        val base = (y * w + x) * 3
        assert((dec.pixels(base) & 0xff) === ((rgb >> 16) & 0xff),
          s"R($x,$y) ${w}x$h")
        assert((dec.pixels(base + 1) & 0xff) === ((rgb >> 8) & 0xff),
          s"G($x,$y) ${w}x$h")
        assert((dec.pixels(base + 2) & 0xff) === (rgb & 0xff),
          s"B($x,$y) ${w}x$h")
      }
    }
  }

  test("non-GIF, malformed, and out-of-subset payloads return None, never throw") {
    assert(GifPixels.decode(Array.emptyByteArray).isEmpty)
    assert(GifPixels.decode("plainly not a gif".getBytes("UTF-8")).isEmpty)
    assert(GifPixels.decode(ImageFixtures.pngBytes(4, 4, 2)).isEmpty)
    assert(GifPixels.decode(ImageFixtures.jpegBytes(4, 4, 3)).isEmpty)
    val good = ImageFixtures.gifBytes(8, 8, 5)
    // truncated mid-LZW: the bit reader runs dry
    assert(GifPixels.decode(good.take(good.length - 6)).isEmpty)
    // no color table anywhere: indices have no defined colors
    val bare = good.clone()
    // screen descriptor packed byte at 10: clear the GCT-present flag
    bare(10) = (bare(10) & 0x7f).toByte
    // (palette bytes now misparse as block types — either way, None)
    assert(GifPixels.decode(bare).isEmpty)
    // an undefined block type where a descriptor should be
    val junk = good.clone()
    junk(6 + 7 + 6) = 0x7e.toByte
    assert(GifPixels.decode(junk).isEmpty)
    // PNG decoder still refuses GIFs and vice versa (routing stays
    // format-exact inside decodeRaster)
    assert(PngPixels.decode(good).isEmpty)
  }

  test("hostile 65535x65535 header quarantines as None (w*h*3 overflows Int)") {
    // spec-legal le16 dims whose pixel count overflows Int negative:
    // pre-guard this crashed lzw's output allocation with
    // NegativeArraySizeException, escaping the never-throws contract
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(Array[Byte](-1, -1, -1, -1), 0, 4) // 65535 x 65535
    out.write(0x80); out.write(0); out.write(0)  // GCT present, 2 colors
    out.write(Array.fill[Byte](6)(0x11), 0, 6)   // the 2-color table
    out.write(0x2c)                              // image descriptor
    out.write(Array[Byte](0, 0, 0, 0), 0, 4)     // left, top
    out.write(Array[Byte](-1, -1, -1, -1), 0, 4) // full-screen frame
    out.write(0)                                 // sequential, no LCT
    out.write(2)                                 // LZW min code size
    out.write(1); out.write(0x44); out.write(0)  // one data byte + end
    out.write(0x3b)
    assert(GifPixels.decode(out.toByteArray).isEmpty)
  }

  test("decodeRaster routes PNG and GIF to their decoders; dHash covers GIF") {
    val gif = ImageFixtures.gifBytes(20, 18, 3)
    val png = ImageFixtures.pngBytes(20, 18, 2, 3)
    assert(Multimodal.decodeRaster(gif).exists(_.channels === 3))
    assert(Multimodal.decodeRaster(png).exists(_.channels === 3))
    // a decoded GIF raster hashes like any raster — and two seeds of
    // the same checkerboard phase hash identically (same content)
    val h1 = Multimodal.dHash(GifPixels.decode(ImageFixtures.gifBytes(20, 18, 1)).get)
    val h3 = Multimodal.dHash(GifPixels.decode(ImageFixtures.gifBytes(20, 18, 3)).get)
    assert(h1 === h3, "equal parity content must hash equal")
  }
}
