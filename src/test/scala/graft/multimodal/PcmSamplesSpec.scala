package graft.multimodal

import java.io.ByteArrayInputStream
import javax.sound.sampled.AudioSystem

import org.scalatest.funsuite.AnyFunSuite

/** The PCM sample decoder against the JDK's own audio stack: for both
  * sample widths, `AudioSystem`'s frame bytes must reconstruct to the
  * same sign-corrected values [[PcmSamples]] reads — two independent
  * implementations of the RIFF walk and sample layout agreeing on
  * every sample — and both must equal the fixture's generation
  * arithmetic. */
class PcmSamplesSpec extends AnyFunSuite {

  private def jdkSamples(bytes: Array[Byte], bits: Int): Array[Int] = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val buf = in.readAllBytes()
    in.close()
    if (bits == 8) buf.map(_ & 0xff)
    else buf.grouped(2).map(p =>
      ((p(0) & 0xff) | ((p(1) & 0xff) << 8)).toShort.toInt).toArray
  }

  test("fixture WAVs decode sample-identically to the JDK audio stack") {
    for (bits <- Seq(8, 16); ch <- Seq(1, 2); seed <- Seq(0L, 1234L)) {
      val nf = 300L // crosses the 8-bit wrap (f+...>=256) and 16-bit steps
      val bytes = AudioFixtures.wavBytes(ch, 8000, bits, nf, seed)
      val a = PcmSamples.decode(bytes)
        .getOrElse(fail(s"bits=$bits ch=$ch did not decode"))
      assert((a.channels, a.bitsPerSample, a.nFrames) === ((ch, bits, nf)))
      val jdk = jdkSamples(bytes, bits)
      assert(jdk.length === a.samples.length)
      for (i <- a.samples.indices) {
        assert(a.samples(i) === jdk(i), s"bits=$bits ch=$ch sample $i")
        val f = i / ch; val c = i % ch
        val want =
          if (bits == 8) ((f + 3 * c + seed) % 256).toInt
          else (((5 * f + 7 * c + seed) % 65536) - 32768).toInt
        assert(a.samples(i) === want, s"bits=$bits ch=$ch arith $i")
      }
    }
  }

  test("non-WAV and malformed payloads return None, never throw") {
    assert(PcmSamples.decode(Array.emptyByteArray).isEmpty)
    assert(PcmSamples.decode("not audio".getBytes("UTF-8")).isEmpty)
    assert(PcmSamples.decode(ImageFixtures.pngBytes(4, 4, 2)).isEmpty)
    val good = AudioFixtures.wavBytes(2, 8000, 16, 100)
    assert(PcmSamples.decode(good.take(good.length - 10)).isEmpty,
      "truncated data chunk must not mis-decode")
  }

  test("decodeSampleStats: WAV rows are per-channel exact; non-audio falls back to channel -1") {
    val spark = graft.SparkSuite.session
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val rows = java.util.Arrays.asList(
      Row(1L, AudioFixtures.wavBytes(2, 8000, 8, 4, seed = 10L)),
      Row(2L, "opaque".getBytes("UTF-8")))
    val out = Multimodal.decodeSampleStats(spark.createDataFrame(rows, schema))
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getInt(4), r.getInt(5))).toMap
    // 4 frames, 2 ch, v = (f + 3c + 10) % 256:
    // c=0: 10,11,12,13 → sum 46; c=1: 13,14,15,16 → sum 58
    assert(out((1L, 0)) === ((4L, 46L, 10, 13)))
    assert(out((1L, 1)) === ((4L, 58L, 13, 16)))
    assert(out((2L, -1))._1 === "opaque".getBytes("UTF-8").length.toLong)
  }
}
