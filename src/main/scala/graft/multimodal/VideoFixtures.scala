package graft.multimodal

import java.io.ByteArrayOutputStream

/** Deterministic in-JVM builder of REAL ISO-BMFF (MP4) bytes for the
  * video decode path — `ftyp` + a `moov` tree with a v0 `mvhd` and
  * one `tkhd` per track, every box carrying correct sizes at the
  * public byte layout. The envelope derives from integer columns so
  * the `multimodal_video_decode` oracle recomputes it arithmetically;
  * builder and parser ([[VideoHeader]]) meet only at the box format.
  * (No pixel/sample data: the metadata pass these fixtures exercise
  * never reads past the box headers.) */
object VideoFixtures {

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(tag: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(be32(8L + body.length))
    out.write(tag.getBytes("US-ASCII"))
    out.write(body)
    out.toByteArray
  }

  private def mvhd(timescale: Int, duration: Long): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    b.write(be32(0L)) // version 0 + flags
    b.write(be32(0L)); b.write(be32(0L)) // creation, modification
    b.write(be32(timescale.toLong))
    b.write(be32(duration))
    b.write(be32(0x00010000L)) // rate 1.0
    b.write(be16(0x0100)); b.write(be16(0)) // volume 1.0, reserved
    b.write(be32(0L)); b.write(be32(0L)) // reserved
    // identity matrix
    Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
      .foreach(v => b.write(be32(v)))
    (1 to 6).foreach(_ => b.write(be32(0L))) // pre_defined
    b.write(be32(2L)) // next_track_ID
    box("mvhd", b.toByteArray)
  }

  private def tkhd(trackId: Int, duration: Long, w: Int,
                   h: Int): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    b.write(be32(7L)) // version 0 + flags (enabled|in_movie|in_preview)
    b.write(be32(0L)); b.write(be32(0L)) // creation, modification
    b.write(be32(trackId.toLong))
    b.write(be32(0L)) // reserved
    b.write(be32(duration))
    b.write(be32(0L)); b.write(be32(0L)) // reserved
    b.write(be16(0)); b.write(be16(0)) // layer, alternate_group
    b.write(be16(if (w == 0) 0x0100 else 0)) // volume: audio 1.0, video 0
    b.write(be16(0)) // reserved
    Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
      .foreach(v => b.write(be32(v)))
    b.write(be32(w.toLong << 16)) // 16.16 fixed point
    b.write(be32(h.toLong << 16))
    box("tkhd", b.toByteArray)
  }

  /** A structurally-valid MP4 envelope: `ftyp` + `moov`(mvhd + one
    * video trak [+ one 0×0 audio trak]). With `codec` set, the video
    * trak carries the full mdia→minf→stbl→stsd chain naming that
    * sample-entry fourcc (what a real mux always writes — the codec
    * ROUTING key); None keeps the legacy tkhd-only trak, the
    * no-sample-description shape whose codec must parse as unknown. */
  def mp4Bytes(w: Int, h: Int, timescale: Int, duration: Long,
               withAudioTrack: Boolean,
               codec: Option[String] = None): Array[Byte] = {
    require(w > 0 && h > 0 && timescale > 0 && duration >= 0,
      s"bad mp4 fixture: ${w}x$h ts=$timescale dur=$duration")
    val ftypBody = new ByteArrayOutputStream()
    ftypBody.write("isom".getBytes("US-ASCII"))
    ftypBody.write(be32(512L))
    ftypBody.write("isom".getBytes("US-ASCII"))
    val videoMdia = codec match {
      case Some(fourcc) =>
        val stsd = fullBox("stsd", be32(1L) ++ visualSampleEntry(fourcc, w, h))
        box("mdia", mdhd(timescale, duration) ++ hdlr("vide") ++
          box("minf", box("stbl", stsd)))
      case None => Array.emptyByteArray
    }
    val traks = box("trak", tkhd(1, duration, w, h) ++ videoMdia) ++
      (if (withAudioTrack) box("trak", tkhd(2, duration, 0, 0))
       else Array.emptyByteArray)
    val moov = box("moov", mvhd(timescale, duration) ++ traks)
    box("ftyp", ftypBody.toByteArray) ++ moov
  }

  /** Per-sample size used by [[mp4SampleBytes]] and recomputable by a
    * SQL oracle: `50 + (37·i + seed) mod 100` bytes. */
  def sampleSize(i: Int, seed: Long): Int =
    50 + ((37L * i + seed) % 100).toInt

  /** Keyframe cadence of [[mp4SampleBytes]]: every 12th sample. */
  val KeyframeEvery = 12

  /** Samples per chunk in [[mp4SampleBytes]]'s stsc run. */
  val SamplesPerChunk = 8

  private def fullBox(tag: String, payload: Array[Byte]): Array[Byte] =
    box(tag, be32(0L) ++ payload) // version 0 + flags

  private def hdlr(handlerType: String): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    b.write(be32(0L)) // pre_defined
    b.write(handlerType.getBytes("US-ASCII"))
    (1 to 3).foreach(_ => b.write(be32(0L))) // reserved
    b.write(0) // empty null-terminated name
    fullBox("hdlr", b.toByteArray)
  }

  private def mdhd(timescale: Int, duration: Long): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    b.write(be32(0L)); b.write(be32(0L)) // creation, modification
    b.write(be32(timescale.toLong))
    b.write(be32(duration))
    b.write(be16(0x55c4)) // language "und"
    b.write(be16(0))
    fullBox("mdhd", b.toByteArray)
  }

  /** ISO 14496-12 §12.1.3 VisualSampleEntry for `stsd` — the box a
    * real mux writes to name the frame codec. 78 fixed body bytes
    * after the fourcc. */
  private def visualSampleEntry(fourcc: String, w: Int,
                                h: Int): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    (1 to 6).foreach(_ => b.write(0)) // SampleEntry reserved
    b.write(be16(1)) // data_reference_index
    b.write(be16(0)); b.write(be16(0)) // pre_defined, reserved
    (1 to 3).foreach(_ => b.write(be32(0L))) // pre_defined
    b.write(be16(w)); b.write(be16(h))
    b.write(be32(0x00480000L)); b.write(be32(0x00480000L)) // 72 dpi
    b.write(be32(0L)) // reserved
    b.write(be16(1)) // frame_count
    (1 to 32).foreach(_ => b.write(0)) // compressorname
    b.write(be16(0x0018)) // depth
    b.write(be16(0xffff)) // pre_defined = -1
    box(fourcc, b.toByteArray)
  }

  /** Keyframe cadence of [[mp4MjpegBytes]] (every frame of an MJPEG
    * stream is intra-coded; the stss marks the SAMPLED subset a
    * thumbnail extractor seeks to). */
  val MjpegKeyframeEvery = 4

  /** An MJPEG-in-MP4: the video trak's `stsd` declares a `jpeg`
    * sample entry and every sample in the `mdat` is a COMPLETE
    * baseline JPEG ([[ImageFixtures.jpegPixelBytes]], the
    * lossless-by-construction flat-block stream) — frame `i` encodes
    * blocks at level `(17·bx + 29·by + (seed + i)) mod 256`, so a SQL
    * oracle regenerates every decoded raster arithmetically. This is
    * the decode→frame-sample loop closed pure-JVM: seek plans from
    * the stbl, pixels from [[JpegPixels]]. */
  def mp4MjpegBytes(w: Int, h: Int, timescale: Int, delta: Int,
                    nFrames: Int, seed: Long): Array[Byte] = {
    require(w > 0 && h > 0 && timescale > 0 && delta > 0 && nFrames > 0,
      s"bad mjpeg fixture: ${w}x$h n=$nFrames")
    val frames = Array.tabulate(nFrames)(i =>
      ImageFixtures.jpegPixelBytes(w, h, 1, ((seed + i) % 256).toInt))
    val sizes = frames.map(_.length)
    val duration = nFrames.toLong * delta
    val nChunks = (nFrames + SamplesPerChunk - 1) / SamplesPerChunk

    def stbl(mdatBase: Long): Array[Byte] = {
      val stsd = fullBox("stsd",
        be32(1L) ++ visualSampleEntry("jpeg", w, h))
      val stts = fullBox("stts",
        be32(1L) ++ be32(nFrames.toLong) ++ be32(delta.toLong))
      val stsc = fullBox("stsc",
        be32(1L) ++ be32(1L) ++ be32(SamplesPerChunk.toLong) ++ be32(1L))
      val stsz = fullBox("stsz", be32(0L) ++ be32(nFrames.toLong) ++
        sizes.flatMap(s => be32(s.toLong)))
      val chunkOffsets = new Array[Long](nChunks)
      var off = mdatBase
      var i = 0
      var c = 0
      while (i < nFrames) {
        if (i % SamplesPerChunk == 0) { chunkOffsets(c) = off; c += 1 }
        off += sizes(i)
        i += 1
      }
      val stco = fullBox("stco",
        be32(nChunks.toLong) ++ chunkOffsets.flatMap(be32))
      val keyframes = (0 until nFrames).filter(_ % MjpegKeyframeEvery == 0)
      val stss = fullBox("stss", be32(keyframes.size.toLong) ++
        keyframes.flatMap(k => be32(k + 1L)).toArray)
      box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco ++ stss)
    }
    def moov(mdatBase: Long): Array[Byte] = {
      val mdia = box("mdia", mdhd(timescale, duration) ++ hdlr("vide") ++
        box("minf", stbl(mdatBase)))
      box("moov", mvhd(timescale, duration) ++
        box("trak", tkhd(1, duration, w, h) ++ mdia))
    }
    val ftypBody = new ByteArrayOutputStream()
    ftypBody.write("isom".getBytes("US-ASCII"))
    ftypBody.write(be32(512L))
    ftypBody.write("isom".getBytes("US-ASCII"))
    val ftyp = box("ftyp", ftypBody.toByteArray)
    val moovLen = moov(0L).length
    val mdatBase = ftyp.length + moovLen + 8L
    ftyp ++ moov(mdatBase) ++
      box("mdat", frames.flatten.toArray)
  }

  /** A PLAYER-SHAPED MP4: `ftyp` + `moov` whose video trak carries a
    * full sample table — `stts` (one run of `n` samples at `delta`
    * ticks), `stsc` (a single run of [[SamplesPerChunk]]), `stsz`
    * (per-sample sizes from [[sampleSize]]), `stco` (ABSOLUTE chunk
    * offsets into the trailing `mdat`, which this builder really
    * emits), and `stss` (a keyframe every [[KeyframeEvery]] samples) —
    * everything a distributed frame extractor needs to plan seeks
    * without touching a codec. Offsets are self-consistent: the moov
    * is built twice, once to measure, once with the real mdat base. */
  def mp4SampleBytes(w: Int, h: Int, timescale: Int, delta: Int,
                     nSamples: Int, seed: Long,
                     audioFirst: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && timescale > 0 && delta > 0 && nSamples > 0,
      s"bad mp4 sample fixture: ${w}x$h ts=$timescale n=$nSamples")
    val sizes = Array.tabulate(nSamples)(i => sampleSize(i, seed))
    val duration = nSamples.toLong * delta
    val nChunks = (nSamples + SamplesPerChunk - 1) / SamplesPerChunk

    def stbl(mdatBase: Long): Array[Byte] = {
      val stts = fullBox("stts",
        be32(1L) ++ be32(nSamples.toLong) ++ be32(delta.toLong))
      val stsc = fullBox("stsc",
        be32(1L) ++ be32(1L) ++ be32(SamplesPerChunk.toLong) ++ be32(1L))
      val stsz = fullBox("stsz", be32(0L) ++ be32(nSamples.toLong) ++
        sizes.flatMap(s => be32(s.toLong)))
      val chunkOffsets = new Array[Long](nChunks)
      var off = mdatBase
      var i = 0
      var c = 0
      while (i < nSamples) {
        if (i % SamplesPerChunk == 0) { chunkOffsets(c) = off; c += 1 }
        off += sizes(i)
        i += 1
      }
      val stco = fullBox("stco",
        be32(nChunks.toLong) ++ chunkOffsets.flatMap(be32))
      val keyframes = (0 until nSamples).filter(_ % KeyframeEvery == 0)
      val stss = fullBox("stss", be32(keyframes.size.toLong) ++
        keyframes.flatMap(k => be32(k + 1L)).toArray) // 1-based sample numbers
      box("stbl", stts ++ stsc ++ stsz ++ stco ++ stss)
    }
    def moov(mdatBase: Long): Array[Byte] = {
      val mdia = box("mdia", mdhd(timescale, duration) ++ hdlr("vide") ++
        box("minf", stbl(mdatBase)))
      val trak = box("trak", tkhd(1, duration, w, h) ++ mdia)
      // audio-first mux shape: a 'soun'-handled trak (with its own
      // table) LEADS — a frame-plan parser must skip it by handler,
      // not take the first trak that has an stbl
      val audio =
        if (!audioFirst) Array.emptyByteArray
        else box("trak", tkhd(2, duration, 0, 0) ++
          // deliberately DIFFERENT media timescale: taking this trak
          // by mistake is observable, not coincidentally identical
          box("mdia", mdhd(timescale * 2, duration) ++ hdlr("soun") ++
            box("minf", stbl(mdatBase))))
      box("moov", mvhd(timescale, duration) ++ audio ++ trak)
    }
    val ftypBody = new ByteArrayOutputStream()
    ftypBody.write("isom".getBytes("US-ASCII"))
    ftypBody.write(be32(512L))
    ftypBody.write("isom".getBytes("US-ASCII"))
    val ftyp = box("ftyp", ftypBody.toByteArray)
    // fixed-point: moov's size is independent of the base value
    val moovLen = moov(0L).length
    val mdatBase = ftyp.length + moovLen + 8L // + mdat header
    val payload = new Array[Byte](sizes.sum)
    // deterministic payload bytes so the mdat is honest, not a hole
    var p = 0
    while (p < payload.length) { payload(p) = ((p * 31 + seed) & 0xff).toByte; p += 1 }
    ftyp ++ moov(mdatBase) ++ box("mdat", payload)
  }
}
