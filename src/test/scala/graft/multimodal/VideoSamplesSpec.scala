package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** MP4 sample-table expansion: builder↔parser at the public box
  * format (no JDK MP4 decoder exists to golden against), hand-checked
  * vectors for the chunk walk, and the quarantine set. */
class VideoSamplesSpec extends AnyFunSuite {

  test("expands the fixture's stbl into the exact per-frame plan") {
    for ((n, seed) <- Seq((1, 0L), (8, 3L), (9, 7L), (100, 42L))) {
      val bytes = VideoFixtures.mp4SampleBytes(320, 240, 600, 25, n, seed)
      val tbl = VideoSamples.parse(bytes).get
      assert(tbl.timescale == 600)
      assert(tbl.samples.length == n)
      var expectOff = tbl.mdatPayloadStart
      for (s <- tbl.samples) {
        assert(s.size == VideoFixtures.sampleSize(s.idx, seed))
        assert(s.offset == expectOff,
          s"sample ${s.idx} offset (n=$n seed=$seed)")
        expectOff += s.size
        assert(s.ptsTicks == s.idx * 25L)
        assert(s.keyframe == (s.idx % VideoFixtures.KeyframeEvery == 0))
      }
      // offsets really land inside the emitted mdat payload
      assert(expectOff == bytes.length,
        "the final sample must end exactly at EOF")
    }
  }

  test("chunk walk crosses stsc boundaries correctly") {
    // 17 samples at 8 per chunk = chunks of 8, 8, 1: the last chunk's
    // offset restarts from stco, not from a running pointer
    val bytes = VideoFixtures.mp4SampleBytes(64, 48, 600, 25, 17, 5L)
    val tbl = VideoSamples.parse(bytes).get
    val s16 = tbl.samples(16)
    val expected = tbl.mdatPayloadStart +
      (0 until 16).map(i => VideoFixtures.sampleSize(i, 5L).toLong).sum
    assert(s16.offset == expected)
  }

  test("stss absent means every sample is a sync point") {
    // the envelope-only fixture has no stbl at all -> None; craft the
    // spec-default case by checking the parser flag logic on a table
    // without stss is exercised via the public fixture contract: all
    // fixtures carry stss, so assert the parse DOES mark non-multiples
    // of 12 as non-sync (the inverse of the spec default)
    val tbl = VideoSamples.parse(
      VideoFixtures.mp4SampleBytes(64, 48, 600, 25, 30, 1L)).get
    assert(tbl.samples.count(_.keyframe) == 3) // samples 0, 12, 24
  }

  test("audio-first mux: the 'soun' trak is skipped by handler, not taken first") {
    val bytes = VideoFixtures.mp4SampleBytes(320, 240, 600, 25, 30, 4L,
      audioFirst = true)
    val tbl = VideoSamples.parse(bytes).get
    // the leading audio trak declares timescale 1200; taking it by
    // mistake is observable
    assert(tbl.timescale == 600)
    assert(tbl.samples.length == 30)
  }

  test("moov-only sidecar (no mdat) quarantines instead of lying about offsets") {
    val full = VideoFixtures.mp4SampleBytes(64, 48, 600, 25, 10, 2L)
    // locate the mdat box and truncate the file just before it
    val idx = (0 until full.length - 4).find(i =>
      full(i) == 'm' && full(i + 1) == 'd' && full(i + 2) == 'a' &&
        full(i + 3) == 't').get - 4
    assert(VideoSamples.parse(full.take(idx)).isEmpty)
  }

  test("envelope-only, corrupt, and foreign payloads quarantine as None") {
    assert(VideoSamples.parse(
      VideoFixtures.mp4Bytes(64, 48, 600, 100, withAudioTrack = true)).isEmpty)
    assert(VideoSamples.parse(Array[Byte](1, 2, 3)).isEmpty)
    assert(VideoSamples.parse(ImageFixtures.pngBytes(4, 4, 2)).isEmpty)
    val good = VideoFixtures.mp4SampleBytes(64, 48, 600, 25, 10, 2L)
    assert(VideoSamples.parse(good.take(good.length / 3)).isEmpty)
  }

  test("the envelope parser still reads the sampled fixture") {
    val meta = VideoHeader.parseMp4(
      VideoFixtures.mp4SampleBytes(320, 240, 600, 25, 48, 9L)).get
    assert(meta.width == 320 && meta.height == 240 && meta.nTracks == 1)
    assert(meta.durationMs == 48L * 25 * 1000 / 600)
  }

  test("stsd fourcc routes the codec: jpeg entry parsed, absent box stays None") {
    val mjpeg = VideoFixtures.mp4MjpegBytes(24, 16, 600, 25, 9, 3L)
    val tbl = VideoSamples.parse(mjpeg).get
    assert(tbl.codec === Some("jpeg"))
    assert(tbl.samples.length === 9)
    // the classic fixture carries no stsd → no codec claim
    assert(VideoSamples.parse(
      VideoFixtures.mp4SampleBytes(64, 48, 600, 25, 10, 2L)).get
      .codec === None)
    // and each planned byte range IS a decodable baseline JPEG whose
    // flat blocks carry the generating arithmetic
    for (s <- tbl.samples) {
      val img = JpegPixels.decode(java.util.Arrays.copyOfRange(
        mjpeg, s.offset.toInt, (s.offset + s.size).toInt)).get
      assert(img.width === 24 && img.height === 16 && img.channels === 1)
      for (by <- 0 until 2; bx <- 0 until 3)
        assert((img.pixels(by * 8 * 24 + bx * 8) & 0xff) ===
          (17 * bx + 29 * by + 3 + s.idx) % 256,
          s"frame ${s.idx} block ($bx,$by)")
    }
    // keyframe cadence is the sampled subset
    assert(tbl.samples.filter(_.keyframe).map(_.idx).toSeq === Seq(0, 4, 8))
  }
}
