package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.VideoHeader.VideoMeta

/** The MP4 box-tree parser against the fixture builder and
  * hand-derived layout vectors. Unlike PNG/WAV there is no JDK
  * decoder to use as an independent golden, so the cross-checks are:
  * builder↔parser at the public ISO-BMFF byte layout, hand-computed
  * offsets into the built bytes (the spec's own arithmetic), and
  * malformed-stream rejection. */
class VideoHeaderSpec extends AnyFunSuite {

  test("parses the fixture: dims, track count, floored duration") {
    val b = VideoFixtures.mp4Bytes(w = 640, h = 360, timescale = 600,
      duration = 1500L, withAudioTrack = false)
    assert(VideoHeader.parseMp4(b)
      .contains(VideoMeta("mp4", 640, 360, 1, 2500L)))
    val b2 = VideoFixtures.mp4Bytes(w = 1920, h = 1080, timescale = 90000,
      duration = 90001L, withAudioTrack = true)
    // an audio trak (0x0) must not overwrite the video dims, and
    // 90001 units / 90000 Hz floors to exactly 1000 ms
    assert(VideoHeader.parseMp4(b2)
      .contains(VideoMeta("mp4", 1920, 1080, 2, 1000L)))
  }

  test("byte layout pins the spec arithmetic: ftyp leads, 16.16 dims in tkhd") {
    val b = VideoFixtures.mp4Bytes(w = 320, h = 240, timescale = 1000,
      duration = 0L, withAudioTrack = false)
    // box 0 is ftyp: size at 0, tag at 4
    assert(new String(b, 4, 4, "US-ASCII") === "ftyp")
    val ftypSize = ((b(0) & 0xff) << 24) | ((b(1) & 0xff) << 16) |
      ((b(2) & 0xff) << 8) | (b(3) & 0xff)
    // box 1 is moov
    assert(new String(b, ftypSize + 4, 4, "US-ASCII") === "moov")
    // the trailing 8 payload bytes of tkhd are width<<16, height<<16:
    // width 320 = 0x0140 ⇒ bytes ...01 40 00 00 somewhere in the tail
    val tail = b.takeRight(8)
    assert((tail(0) & 0xff) === 0x01 && (tail(1) & 0xff) === 0x40)
    assert((tail(4) & 0xff) === 0x00 && (tail(5) & 0xff) === 0xf0)
  }

  test("stsd fourcc surfaces as the codec routing key; no stsd parses unknown") {
    // every fourcc the synthetic cycle emits, plus the legacy
    // no-sample-description trak — the H.264 case is the point:
    // codec REPORTED (avc1), so a pipeline routes to an external
    // decoder instead of silently getting byte stats
    for (fc <- Seq("jpeg", "avc1", "mp4v")) {
      val b = VideoFixtures.mp4Bytes(w = 640, h = 360, timescale = 600,
        duration = 1500L, withAudioTrack = false, codec = Some(fc))
      assert(VideoHeader.parseMp4(b)
        .contains(VideoMeta("mp4", 640, 360, 1, 2500L, Some(fc))), fc)
    }
    val bare = VideoFixtures.mp4Bytes(w = 640, h = 360, timescale = 600,
      duration = 1500L, withAudioTrack = false)
    assert(VideoHeader.parseMp4(bare).flatMap(_.codec).isEmpty)
    // an audio trak must not steal or clobber the video trak's codec
    val withAudio = VideoFixtures.mp4Bytes(w = 320, h = 240,
      timescale = 1000, duration = 500L, withAudioTrack = true,
      codec = Some("avc1"))
    assert(VideoHeader.parseMp4(withAudio).flatMap(_.codec)
      .contains("avc1"))
    // the MJPEG player-shaped fixture names jpeg through the same path
    val mjpeg = VideoFixtures.mp4MjpegBytes(w = 24, h = 16,
      timescale = 600, delta = 25, nFrames = 6, seed = 3L)
    assert(VideoHeader.parseMp4(mjpeg).flatMap(_.codec).contains("jpeg"))
  }

  test("malformed streams are rejected, not mis-parsed") {
    assert(VideoHeader.parseMp4(Array.emptyByteArray).isEmpty)
    assert(VideoHeader.parseMp4("not a movie at all".getBytes).isEmpty)
    val good = VideoFixtures.mp4Bytes(64, 64, 600, 600L,
      withAudioTrack = false)
    assert(VideoHeader.parseMp4(good.take(40)).isEmpty,
      "a moov truncated mid-box must reject")
    // corrupt a box size so it runs past the buffer
    val bad = good.clone()
    val ftypSize = ((good(0) & 0xff) << 24) | ((good(1) & 0xff) << 16) |
      ((good(2) & 0xff) << 8) | (good(3) & 0xff)
    bad(ftypSize) = 0x7f.toByte // moov size becomes enormous
    assert(VideoHeader.parseMp4(bad).isEmpty)
  }
}
