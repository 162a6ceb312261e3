package graft.multimodal

/** Pure-JVM header parser for MP4 (ISO/IEC 14496-12 ISO base media
  * file format) — the video leg of the envelope-decode family
  * ([[ImageHeader]], [[AudioHeader]]): presentation duration, track
  * count and the first video track's pixel dimensions straight from
  * the `moov` box tree, no codec library. At 100 TB this is the video
  * metadata pass (duration bucketing, resolution filtering,
  * frame-sample planning over `Multimodal.frameSamplePlan`) that
  * reads only the box headers.
  *
  * Format facts used (public specification): a file is a sequence of
  * boxes — big-endian u32 size + 4-char type (size 1 ⇒ 64-bit
  * largesize follows; size 0 ⇒ box runs to EOF); `ftyp` leads;
  * `moov` contains `mvhd` (version 0: timescale u32 + duration u32 at
  * payload offsets 12/16; version 1: u32 timescale at 20, u64
  * duration at 24) and one `trak` per track whose `tkhd` carries
  * width/height as 16.16 fixed-point u32s in the last 8 payload
  * bytes (offsets 76/80 in v0, 88/92 in v1); audio tracks carry 0×0.
  *
  * No JDK decoder exists for MP4 (unlike PNG/WAV), so the unit spec's
  * cross-check is builder↔parser at the public box format plus
  * hand-derived byte-layout vectors.
  */
object VideoHeader {

  /** Parsed video envelope. `durationMs` floors duration·1000/timescale.
    * `codec` is the first sample-entry fourcc of the video track's
    * `stsd` (trak→mdia→minf→stbl→stsd — e.g. "jpeg" for MJPEG-in-MP4,
    * "avc1" for H.264; None when the track carries no sample
    * description) — the ROUTING key that lets a pipeline send
    * native-codec tracks to an external decode stage instead of
    * silently falling back to byte stats. */
  final case class VideoMeta(format: String, width: Int, height: Int,
                             nTracks: Int, durationMs: Long,
                             codec: Option[String] = None)

  private[multimodal] def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private[multimodal] def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)
  private[multimodal] def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private[multimodal] def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk the boxes of `b[from, to)`, invoking `f(type, payloadStart,
    * payloadEnd)` per box. Returns false on a malformed size field. */
  private[multimodal] def walkBoxes(b: Array[Byte], from: Int, to: Int)(
      f: (String, Int, Int) => Unit): Boolean = {
    var i = from
    while (i + 8 <= to) {
      val sz = be32(b, i)
      val t = tag(b, i + 4)
      val (payload, end) =
        if (sz == 1L) { // 64-bit largesize
          if (i + 16 > to) return false
          val ls = be64(b, i + 8)
          if (ls < 16 || i + ls > to) return false
          (i + 16, i + ls.toInt)
        } else if (sz == 0L) (i + 8, to) // runs to EOF
        else {
          if (sz < 8 || i + sz > to) return false
          (i + 8, i + sz.toInt)
        }
      f(t, payload, end)
      i = end
    }
    true
  }

  def parseMp4(b: Array[Byte]): Option[VideoMeta] = {
    if (b.length < 12 || be32(b, 0) < 8 || tag(b, 4) != "ftyp") return None
    var moov: Option[(Int, Int)] = None
    if (!walkBoxes(b, 0, b.length) { (t, s, e) =>
      if (t == "moov" && moov.isEmpty) moov = Some((s, e))
    }) return None
    val (ms, me) = moov.getOrElse(return None)
    var durationMs = -1L
    var nTracks = 0
    var w = 0
    var h = 0
    var codec: Option[String] = None
    var codecPinned = false // set once the dims-bearing trak is seen
    val ok = walkBoxes(b, ms, me) { (t, s, e) =>
      if (t == "mvhd" && e - s >= 20) {
        val (timescale, duration) = u8(b, s) match { // version byte
          case 0 => (be32(b, s + 12), be32(b, s + 16))
          case 1 if e - s >= 32 => (be32(b, s + 20), be64(b, s + 24))
          case _ => (0L, 0L)
        }
        if (timescale > 0) durationMs = duration * 1000L / timescale
      } else if (t == "trak") {
        nTracks += 1
        var trakCodec: Option[String] = None
        var tookDims = false
        walkBoxes(b, s, e) { (tt, ts, te) =>
          if (tt == "tkhd" && w == 0) {
            val off = u8(b, ts) match { // width/height trail the payload
              case 0 if te - ts >= 84 => ts + 76
              case 1 if te - ts >= 96 => ts + 88
              case _ => -1
            }
            if (off > 0) {
              val tw = (be32(b, off) >> 16).toInt // 16.16 fixed point
              val th = (be32(b, off + 4) >> 16).toInt
              if (tw > 0 && th > 0) { w = tw; h = th; tookDims = true } // audio tracks are 0x0
            }
          } else if (tt == "mdia") {
            // trak→mdia→minf→stbl→stsd: first sample entry's fourcc
            // (u32 size + tag right after the entry count)
            walkBoxes(b, ts, te) { (t2, s2, e2) =>
              if (t2 == "minf") walkBoxes(b, s2, e2) { (t3, s3, e3) =>
                if (t3 == "stbl") walkBoxes(b, s3, e3) { (t4, s4, e4) =>
                  if (t4 == "stsd" && e4 - s4 >= 16 &&
                    be32(b, s4 + 4) >= 1 && trakCodec.isEmpty)
                    trakCodec = Some(tag(b, s4 + 12))
                }
              }
              ()
            }
            ()
          }
        }
        // the dims-bearing (video) track names the file's codec; a
        // non-video track's entry is only a fallback
        if (tookDims) { codec = trakCodec; codecPinned = true }
        else if (!codecPinned && codec.isEmpty) codec = trakCodec
        ()
      }
    }
    if (!ok || durationMs < 0 || nTracks == 0) None
    else Some(VideoMeta("mp4", w, h, nTracks, durationMs, codec))
  }
}
