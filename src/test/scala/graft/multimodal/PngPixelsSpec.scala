package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

/** The pixel decoder against TWO independent checks: (a) the JDK's own
  * ImageIO raster of the same fixture bytes must match sample-for-
  * sample (independent inflate + unfilter implementations agreeing on
  * every byte), and (b) JDK-ENCODED PNGs — whose filter choices we
  * don't control — must decode back to the exact pixels that were
  * drawn. Together they pin both directions of the RFC 2083 filter
  * algebra. */
class PngPixelsSpec extends AnyFunSuite {

  test("fixture PNGs decode byte-identically to the JDK's ImageIO raster") {
    // dims > 5 so the y%5 filter cycle exercises all five types;
    // every supported color type; a couple of seeds
    for (colorType <- Seq(0, 2, 4, 6); seed <- Seq(0, 97)) {
      val (w, h) = (13, 11)
      val bytes = ImageFixtures.pngBytes(w, h, colorType, seed)
      val img = PngPixels.decode(bytes)
        .getOrElse(fail(s"ct=$colorType seed=$seed did not decode"))
      assert((img.width, img.height) === ((w, h)))
      val jdk = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(jdk != null, "ImageIO must accept the fixture")
      val raster = jdk.getRaster
      assert(raster.getNumBands === img.channels)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until img.channels) {
        val ours = img.pixels((y * w + x) * img.channels + c) & 0xff
        val theirs = raster.getSample(x, y, c)
        assert(ours === theirs,
          s"ct=$colorType seed=$seed mismatch at ($x,$y,$c)")
        // and both must equal the generation arithmetic
        assert(ours === ((x + y + c + seed) & 0xff))
      }
    }
  }

  test("JDK-encoded PNGs (filters chosen by the JDK) decode to the drawn pixels") {
    val w = 9; val h = 7
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 31) << 16) | ((y * 17) << 8) | (x + y))
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", out))
    val dec = PngPixels.decode(out.toByteArray)
      .getOrElse(fail("JDK PNG did not decode"))
    assert((dec.width, dec.height, dec.channels) === ((w, h, 3)))
    for (y <- 0 until h; x <- 0 until w) {
      val base = (y * w + x) * 3
      assert((dec.pixels(base) & 0xff) === x * 31, s"R($x,$y)")
      assert((dec.pixels(base + 1) & 0xff) === y * 17, s"G($x,$y)")
      assert((dec.pixels(base + 2) & 0xff) === x + y, s"B($x,$y)")
    }
  }

  test("dHash: invariant to brightness shift, discriminates content keys") {
    def hashOf(key: Long, brightness: Int, ct: Int = 2): Long =
      Multimodal.dHash(PngPixels.decode(
        ImageFixtures.pngBytesHashed(20, 18, ct, key, brightness)).get)
    // the same content at five different exposures hashes identically
    val base = hashOf(7L, 0)
    for (b <- Seq(13, 40, 77, 100, 128))
      assert(hashOf(7L, b) === base, s"brightness $b broke invariance")
    // distinct content keys produce distinct hashes (64-bit dHash over
    // pseudo-random content — a collision here means the grid/bit
    // plumbing is degenerate, e.g. all-ones from monotone content)
    val hs = (0L until 50L).map(k => hashOf(k, 20))
    assert(hs.distinct.size === hs.size, "content keys must discriminate")
    // and every supported color type round-trips through the hash
    for (ct <- Seq(0, 2, 4, 6))
      assert(hashOf(3L, 10, ct) === hashOf(3L, 90, ct), s"ct=$ct")
  }

  test("non-PNG and malformed payloads return None, never throw") {
    assert(PngPixels.decode(Array.emptyByteArray).isEmpty)
    assert(PngPixels.decode("plainly not a png".getBytes("UTF-8")).isEmpty)
    assert(PngPixels.decode(ImageFixtures.jpegBytes(4, 4, 3)).isEmpty)
    assert(PngPixels.decode(ImageFixtures.gifBytes(4, 4)).isEmpty)
    // valid signature + header, truncated IDAT
    val good = ImageFixtures.pngBytes(8, 8, 2)
    assert(PngPixels.decode(good.take(good.length - 30)).isEmpty)
    // 16-bit depth is outside the supported subset: None, not garbage
    val deep = good.clone()
    // IHDR bit-depth byte sits at sig(8) + len(4) + tag(4) + w(4) + h(4)
    deep(8 + 4 + 4 + 8) = 16.toByte
    assert(PngPixels.decode(deep).isEmpty)
    // hostile IHDR width: 0x30000000 * 4 channels overflows an Int
    // stride negative, which would slip past an Int-domain allocation
    // guard and crash — the guard must run fully in Long
    val rgba = ImageFixtures.pngBytes(8, 8, 6)
    val evil = rgba.clone()
    evil(16) = 0x30; evil(17) = 0; evil(18) = 0; evil(19) = 0
    assert(PngPixels.decode(evil).isEmpty)
  }

  test("decodePixelStats: PNG rows are per-channel exact; non-PNG falls back to channel -1") {
    val spark = graft.SparkSuite.session
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val rows = java.util.Arrays.asList(
      Row(1L, ImageFixtures.pngBytes(3, 2, 2, seed = 5)),
      Row(2L, "opaque blob".getBytes("UTF-8")),
      Row(3L, null))
    val out = Multimodal.decodePixelStats(spark.createDataFrame(rows, schema))
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getInt(4), r.getInt(5))).toMap
    // 3x2 RGB, v = (x+y+c+5) & 0xff: per channel c the 6 values are
    // {5,6,7,6,7,8} + c → sum = 39 + 6c, min = 5+c, max = 8+c
    for (c <- 0 until 3)
      assert(out((1L, c)) === ((6L, 39L + 6 * c, 5 + c, 8 + c)))
    val blob = "opaque blob".getBytes("UTF-8")
    assert(out((2L, -1)) === ((blob.length.toLong,
      blob.map(_ & 0xff).sum.toLong, blob.map(_ & 0xff).min,
      blob.map(_ & 0xff).max)))
    assert(out((3L, -1)) === ((1L, 0L, 0, 0)))
  }
}
