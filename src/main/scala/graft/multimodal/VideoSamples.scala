package graft.multimodal

import scala.util.control.NonFatal

import VideoHeader.{be32, tag, u8, walkBoxes}

/** Pure-JVM MP4 SAMPLE-TABLE parser (ISO/IEC 14496-12 `stbl`) — the
  * step between the envelope pass ([[VideoHeader]]) and the codec:
  * per-frame byte offset, size, presentation time and keyframe flag,
  * straight from `stts`/`stsc`/`stsz`/`stco`/`stss`. This is
  * everything a DISTRIBUTED frame extractor needs to plan its work —
  * which byte ranges to fetch, which samples are seekable — while the
  * only genuinely codec-bound step (rasterizing the fetched bytes)
  * stays behind the batched decode boundary. Uniform-arithmetic seek
  * planning (`Multimodal.frameSamplePlan`) remains the fallback for
  * containers without a table.
  *
  * Format facts used (public specification): `stts` runs of
  * (count, delta) decode times; `stsc` runs of (first_chunk,
  * samples_per_chunk, desc_idx) mapping samples into chunks; `stsz` a
  * uniform size or one u32 per sample; `stco` absolute u32 chunk
  * offsets; `stss` 1-based sync-sample numbers (absent ⇒ every sample
  * is a sync point). Within a chunk, samples are contiguous.
  * Malformed or oversized tables return None — the quarantine signal —
  * never throw. */
object VideoSamples {

  /** One frame's plan row. `offset` is absolute within the file. */
  final case class Sample(idx: Int, offset: Long, size: Long,
                          ptsTicks: Long, keyframe: Boolean)

  /** Parsed table: media timescale (ticks/second, from `mdhd`), the
    * expanded per-sample plan, the `mdat` payload base (for relative
    * addressing when the file is re-homed), and the sample-entry
    * fourcc from `stsd` (e.g. "jpeg" for MJPEG-in-MP4, "avc1" for
    * H.264; None when the box is absent) — the codec ROUTING key: a
    * "jpeg" trak's samples are complete baseline JPEGs that
    * [[JpegPixels]] rasterizes pure-JVM, anything else stays behind
    * the documented byte-stats boundary. */
  final case class SampleTable(timescale: Long, samples: Array[Sample],
                               mdatPayloadStart: Long,
                               codec: Option[String] = None)

  /** Tables larger than this are hostile/corrupt, not video. */
  private val MaxSamples = 1 << 20

  def parse(b: Array[Byte]): Option[SampleTable] =
    try impl(b)
    catch { case NonFatal(_) => None }

  private def impl(b: Array[Byte]): Option[SampleTable] = {
    if (b.length < 12 || be32(b, 0) < 8 || tag(b, 4) != "ftyp") return None
    var moovSpan: Option[(Int, Int)] = None
    var mdatPayload = -1L
    if (!walkBoxes(b, 0, b.length) { (t, s, e) =>
      if (t == "moov" && moovSpan.isEmpty) moovSpan = Some((s, e))
      if (t == "mdat" && mdatPayload < 0) mdatPayload = s.toLong
    }) return None
    val (ms, me) = moovSpan.getOrElse(return None)
    // a populated table without an mdat in the same file (moov-only
    // sidecar) has nothing to plan byte ranges over — quarantine
    // rather than emit offsets relative to a -1 sentinel
    if (mdatPayload < 0) return None

    var result: Option[SampleTable] = None
    walkBoxes(b, ms, me) { (t, ts, te) =>
      if (t == "trak" && result.isEmpty)
        result = parseTrak(b, ts, te, mdatPayload)
    }
    result
  }

  private def parseTrak(b: Array[Byte], from: Int, to: Int,
                        mdatPayload: Long): Option[SampleTable] = {
    var timescale = 0L
    var stbl: Option[(Int, Int)] = None
    var handler: Option[String] = None
    walkBoxes(b, from, to) { (t, s, e) =>
      if (t == "mdia") {
        walkBoxes(b, s, e) { (mt, msS, msE) =>
          if (mt == "mdhd" && msE - msS >= 20 && u8(b, msS) == 0)
            timescale = be32(b, msS + 12)
          else if (mt == "hdlr" && msE - msS >= 12)
            handler = Some(tag(b, msS + 8)) // after version/flags + pre_defined
          else if (mt == "minf")
            walkBoxes(b, msS, msE) { (it, isS, isE) =>
              if (it == "stbl" && stbl.isEmpty) stbl = Some((isS, isE))
            }
        }
        ()
      }
    }
    // frame plans are a VIDEO concept: a declared non-video handler
    // (e.g. 'soun' in an audio-first mux) is skipped so the walk can
    // reach the video trak; an absent hdlr stays acceptable
    if (handler.exists(_ != "vide")) return None
    val (ss, se) = stbl.getOrElse(return None)
    if (timescale <= 0) return None

    var stts: Array[(Long, Long)] = Array.empty
    var stsc: Array[(Long, Long)] = Array.empty
    var sizes: Array[Long] = Array.empty
    var stco: Array[Long] = Array.empty
    var stss: Option[Set[Int]] = None
    var codec: Option[String] = None
    walkBoxes(b, ss, se) { (t, s, e) =>
      def entries = be32(b, s + 4) // after version/flags
      t match {
        case "stsd" if e - s >= 16 =>
          // first sample entry: u32 size + fourcc right after the
          // entry count — the routing key; deeper entry fields are
          // codec-private and not needed for routing
          if (be32(b, s + 4) >= 1) codec = Some(tag(b, s + 12))
        case "stts" if e - s >= 8 =>
          val n = entries
          if (n >= 0 && n <= MaxSamples && s + 8 + 8 * n <= e)
            stts = Array.tabulate(n.toInt)(i =>
              (be32(b, s + 8 + 8 * i), be32(b, s + 12 + 8 * i)))
        case "stsc" if e - s >= 8 =>
          val n = entries
          if (n >= 0 && n <= MaxSamples && s + 8 + 12 * n <= e)
            stsc = Array.tabulate(n.toInt)(i =>
              (be32(b, s + 8 + 12 * i), be32(b, s + 12 + 12 * i)))
        case "stsz" if e - s >= 12 =>
          val uniform = be32(b, s + 4)
          val n = be32(b, s + 8)
          if (n >= 0 && n <= MaxSamples) {
            if (uniform > 0) sizes = Array.fill(n.toInt)(uniform)
            else if (s + 12 + 4 * n <= e)
              sizes = Array.tabulate(n.toInt)(i => be32(b, s + 12 + 4 * i))
          }
        case "stco" if e - s >= 8 =>
          val n = entries
          if (n >= 0 && n <= MaxSamples && s + 8 + 4 * n <= e)
            stco = Array.tabulate(n.toInt)(i => be32(b, s + 8 + 4 * i))
        case "stss" if e - s >= 8 =>
          val n = entries
          if (n >= 0 && n <= MaxSamples && s + 8 + 4 * n <= e)
            stss = Some(Array.tabulate(n.toInt)(i =>
              be32(b, s + 8 + 4 * i).toInt).toSet)
        case _ => ()
      }
    }
    val n = sizes.length
    if (n == 0 || stco.isEmpty || stsc.isEmpty || stts.isEmpty) return None

    // chunk walk (stsc runs are sorted by first_chunk, 1-based)
    val offsets = new Array[Long](n)
    var sample = 0
    var chunk = 0 // 0-based
    var run = 0
    while (sample < n && chunk < stco.length) {
      while (run + 1 < stsc.length && stsc(run + 1)._1 <= chunk + 1) run += 1
      var off = stco(chunk)
      var inChunk = 0L
      while (inChunk < stsc(run)._2 && sample < n) {
        offsets(sample) = off
        off += sizes(sample)
        sample += 1
        inChunk += 1
      }
      chunk += 1
    }
    if (sample < n) return None // chunk table does not cover the samples

    // decode times from the stts runs
    val pts = new Array[Long](n)
    var i = 0
    var t = 0L
    var r = 0
    var left = if (stts.nonEmpty) stts(0)._1 else 0L
    while (i < n) {
      while (left == 0 && r + 1 < stts.length) { r += 1; left = stts(r)._1 }
      if (left == 0) return None // time table does not cover the samples
      pts(i) = t
      t += stts(r)._2
      left -= 1
      i += 1
    }

    val sync = stss // None ⇒ all samples are sync points (the spec default)
    val samples = Array.tabulate(n) { k =>
      Sample(k, offsets(k), sizes(k), pts(k),
        sync.forall(_.contains(k + 1)))
    }
    Some(SampleTable(timescale, samples, mdatPayload, codec))
  }
}
