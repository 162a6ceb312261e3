package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The REAL raster resize: integer box filter, exact on flat boxes,
  * mass-preserving on uniform content, shrink-only. */
class ResizeSpec extends AnyFunSuite {

  private def img(w: Int, h: Int, ch: Int, f: (Int, Int, Int) => Int) =
    PngPixels.Image(w, h, ch,
      Array.tabulate(w * h * ch)(i =>
        f((i / ch) % w, i / ch / w, i % ch).toByte))

  test("2x downscale of a flat-block image is the block image at half scale") {
    val src = img(32, 24, 3, (x, y, c) => (17 * (x / 8) + 29 * (y / 8) + c) % 256)
    val out = Multimodal.resizeRaster(src, 16, 12)
    assert(out.width == 16 && out.height == 12 && out.channels == 3)
    for (y <- 0 until 12; x <- 0 until 16; c <- 0 until 3)
      assert((out.pixels((y * 16 + x) * 3 + c) & 0xff) ==
        (17 * (x / 4) + 29 * (y / 4) + c) % 256, s"($x,$y,$c)")
  }

  test("non-integer ratios: every output pixel is the rounded mean of its box") {
    val src = img(7, 5, 1, (x, y, _) => x * 30 + y * 7)
    val out = Multimodal.resizeRaster(src, 3, 2)
    for (oy <- 0 until 2; ox <- 0 until 3) {
      val (x0, x1) = (ox * 7 / 3, (ox + 1) * 7 / 3)
      val (y0, y1) = (oy * 5 / 2, (oy + 1) * 5 / 2)
      val vals = for (y <- y0 until y1; x <- x0 until x1) yield x * 30 + y * 7
      val want = (vals.sum + vals.size / 2) / vals.size
      assert((out.pixels(oy * 3 + ox) & 0xff) == want, s"($ox,$oy)")
    }
  }

  test("global mean is preserved within rounding on integer-ratio shrinks") {
    val src = img(40, 40, 1, (x, y, _) => (x * 13 + y * 29) % 251)
    val out = Multimodal.resizeRaster(src, 10, 10)
    def mean(i: PngPixels.Image) =
      i.pixels.map(_ & 0xff).map(_.toLong).sum.toDouble / i.pixels.length
    assert(math.abs(mean(src) - mean(out)) <= 0.5)
  }

  test("upscale refused; degenerate 1x1 works") {
    val src = img(4, 4, 1, (x, y, _) => 16 * x + y)
    intercept[IllegalArgumentException] {
      Multimodal.resizeRaster(src, 8, 4)
    }
    val one = Multimodal.resizeRaster(src, 1, 1)
    val all = for (y <- 0 until 4; x <- 0 until 4) yield 16 * x + y
    assert((one.pixels(0) & 0xff) == (all.sum + 8) / 16)
  }

  test("resize composes with the real decoders") {
    val jpeg = JpegPixels.decode(
      ImageFixtures.jpegPixelBytes(32, 16, 3, 77)).get
    val half = Multimodal.resizeRaster(jpeg, 16, 8)
    for (y <- 0 until 8; x <- 0 until 16; c <- 0 until 3)
      assert((half.pixels((y * 16 + x) * 3 + c) & 0xff) ==
        (17 * (x / 4) + 29 * (y / 4) + 77) % 256)
  }
}
