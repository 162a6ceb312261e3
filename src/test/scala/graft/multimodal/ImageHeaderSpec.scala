package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.ImageHeader.ImageMeta

/** The header parser against an INDEPENDENT encoder: the JDK's own
  * `javax.imageio` PNG/JPEG/GIF writers (pure Java SE, headless-safe
  * for these formats) produce the golden bytes, and our parser must
  * recover the dimensions and channel layout from them. The fixture
  * builders are cross-validated the other way: `ImageIO.read` must
  * accept [[ImageFixtures.pngBytes]]/`gifBytes` as real decodable
  * images — proving the fixtures the `multimodal_decode` oracle rides
  * on are spec-valid files, not just parser-shaped bytes. */
class ImageHeaderSpec extends AnyFunSuite {

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, out), s"JDK has no $fmt writer")
    out.toByteArray
  }

  test("parses JDK-encoded PNGs: dims and channel layout per color model") {
    val cases = Seq(
      (37, 23, BufferedImage.TYPE_3BYTE_BGR, 3),
      (64, 1, BufferedImage.TYPE_INT_ARGB, 4),
      (1, 480, BufferedImage.TYPE_BYTE_GRAY, 1))
    cases.foreach { case (w, h, imgType, channels) =>
      val bytes = encode(new BufferedImage(w, h, imgType), "png")
      val meta = ImageHeader.detect(bytes)
      assert(meta.contains(ImageMeta("png", w, h, channels, 8)),
        s"type=$imgType got $meta")
    }
  }

  test("parses JDK-encoded JPEGs: SOF dims, components, 8-bit precision") {
    val bytes = encode(
      new BufferedImage(320, 200, BufferedImage.TYPE_3BYTE_BGR), "jpg")
    assert(ImageHeader.detect(bytes)
      .contains(ImageMeta("jpeg", 320, 200, 3, 8)))
    val gray = encode(
      new BufferedImage(17, 31, BufferedImage.TYPE_BYTE_GRAY), "jpg")
    assert(ImageHeader.detect(gray)
      .contains(ImageMeta("jpeg", 17, 31, 1, 8)))
  }

  test("parses JDK-encoded GIFs: LE screen dims") {
    val bytes = encode(
      new BufferedImage(300, 7, BufferedImage.TYPE_INT_RGB), "gif")
    val meta = ImageHeader.detect(bytes)
    assert(meta.exists(m =>
      m.format == "gif" && m.width == 300 && m.height == 7 && m.channels == 3),
      s"got $meta")
  }

  test("fixture PNG/GIF are real decodable files (ImageIO reads them back)") {
    Seq(0, 2, 4, 6).foreach { colorType =>
      val img = ImageIO.read(
        new ByteArrayInputStream(ImageFixtures.pngBytes(19, 11, colorType)))
      assert(img != null && img.getWidth == 19 && img.getHeight == 11,
        s"colorType=$colorType")
    }
    val gif = ImageIO.read(new ByteArrayInputStream(ImageFixtures.gifBytes(5, 9)))
    assert(gif != null && gif.getWidth == 5 && gif.getHeight == 9)
  }

  test("fixture JPEG marker stream parses with the declared envelope") {
    assert(ImageHeader.detect(ImageFixtures.jpegBytes(1000, 2, 3))
      .contains(ImageMeta("jpeg", 1000, 2, 3, 8)))
    assert(ImageHeader.detect(ImageFixtures.jpegBytes(2, 1000, 1))
      .contains(ImageMeta("jpeg", 2, 1000, 1, 8)))
  }

  test("non-image bytes fall through to None (quarantine path)") {
    assert(ImageHeader.detect(Array.emptyByteArray).isEmpty)
    assert(ImageHeader.detect("not an image at all".getBytes("UTF-8")).isEmpty)
    // a PNG signature with a truncated/critically-wrong IHDR must not parse
    assert(ImageHeader.detect(
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, 0, 0)
        .map(_.toByte)).isEmpty)
    // JPEG SOI followed by EOI (no frame header) must not parse
    assert(ImageHeader.detect(
      Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)).isEmpty)
  }

  test("decodeImages routes unknown payloads as format=unknown with null dims") {
    val spark = graft.SparkSuite.session
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val rows = java.util.Arrays.asList(
      Row(1L, ImageFixtures.pngBytes(4, 5, 2)),
      Row(2L, "plain text".getBytes("UTF-8")),
      Row(3L, null))
    val out = Multimodal.decodeImages(spark.createDataFrame(rows, schema))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "png", 2L -> "unknown", 3L -> "unknown"))
  }
}
