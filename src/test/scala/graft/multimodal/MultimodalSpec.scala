package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSuite

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def media() = Multimodal.fromDocuments(
    Seq((1L, "hello world"), (2L, "a" * 10000), (3L, "")).toDF("doc_id", "text"))

  test("media schema carries binary payload + typed metadata") {
    val m = media()
    assert(m.schema === Multimodal.mediaSchema)
  }

  test("batched feature extraction emits one feature row per item") {
    val f = Multimodal.extractFeatures(media()).orderBy("media_id")
    assert(f.schema === Multimodal.featureSchema)
    val rows = f.select(col("media_id"), col("n_bytes"), col("n_frames"),
        size(col("feature"))).as[(Long, Long, Int, Int)].collect().toSeq
    assert(rows === Seq((1L, 11L, 1, 16), (2L, 10000L, 3, 16), (3L, 0L, 1, 16)))
  }

  test("decode stub is deterministic and histogram sums to 1 for non-empty") {
    val (mean1, _, h1) = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    val (mean2, _, h2) = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    assert(mean1 === mean2 && h1.toSeq === h2.toSeq)
    assert(math.abs(h1.sum - 1f) < 1e-5)
  }

  test("null payload decodes as an empty blob instead of failing the task") {
    val m = Seq((1L, "x"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val f = Multimodal.extractFeatures(Multimodal.fromDocuments(m))
    val rows = f.select(col("media_id"), col("n_bytes"))
      .as[(Long, Long)].collect().toMap
    assert(rows === Map(1L -> 1L, 2L -> 0L))
  }

  test("frame sampling yields k monotonically increasing byte offsets") {
    val got = Multimodal.frameSampleOffsets(media(), 4)
      .filter(col("media_id") === 2).select(col("frame_offsets"))
      .as[Seq[Long]].head()
    assert(got === Seq(0L, 2500L, 5000L, 7500L))
  }

  test("resizePlan fits inside maxDim, preserves aspect, never upscales") {
    val m = Seq(
      (1L, "m", Array[Byte](), 1920, 1080, 0L),   // downscale, landscape
      (2L, "m", Array[Byte](), 600, 800, 0L),     // downscale, portrait
      (3L, "m", Array[Byte](), 100, 50, 0L))      // already small: untouched
      .toDF("media_id", "mime", "payload", "width", "height", "duration_ms")
    val got = Multimodal.resizePlan(m, maxDim = 256)
      .select(col("media_id"), col("out_w"), col("out_h"))
      .as[(Long, Int, Int)].collect()
      .map { case (id, w, h) => id -> ((w, h)) }.toMap
    assert(got(1L) === ((256, 144)))
    assert(got(2L) === ((192, 256)))
    assert(got(3L) === ((100, 50)))
  }
}
