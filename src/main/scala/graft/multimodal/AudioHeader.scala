package graft.multimodal

/** Pure-JVM header parser for RIFF/WAVE — the audio twin of
  * [[ImageHeader]]: channel count, sample rate, sample width, frame
  * count and duration straight from the container bytes, no codec
  * library. At 100 TB this is the audio metadata pass (duration
  * filtering, sample-rate bucketing, resample planning) that reads
  * only the leading bytes per object; sample decode slots into the
  * same batched boundary ([[Multimodal.extractFeatures]]).
  *
  * Format facts used (public RIFF/WAVE specification, also in
  * RFC 2361): "RIFF" + little-endian u32 payload size + "WAVE", then
  * even-padded chunks of 4-byte tag + le-u32 size; the `fmt ` chunk
  * carries audio format (1 = integer PCM), channels (le16), sample
  * rate (le32), byte rate, block align (le16), bits per sample
  * (le16); the `data` chunk's size is frames × block align.
  */
object AudioHeader {

  /** Parsed audio envelope. `durationMs` floors frames·1000/rate. */
  final case class AudioMeta(format: String, channels: Int,
                             sampleRate: Int, bitsPerSample: Int,
                             nFrames: Long, durationMs: Long)

  // ONE set of RIFF little-endian readers for the package (the
  // VideoHeader/VideoSamples pattern) — PcmSamples shares these
  private[multimodal] def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private[multimodal] def le16(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8)
  private[multimodal] def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private[multimodal] def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  def parseWav(b: Array[Byte]): Option[AudioMeta] = {
    if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE")
      return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, bits, blockAlign
    var dataSize = -1L
    while (i + 8 <= b.length && (fmt.isEmpty || dataSize < 0)) {
      val t = tag(b, i)
      val sz = le32(b, i + 4)
      if (sz < 0 || i + 8 + sz > b.length) return None // truncated chunk
      if (t == "fmt ") {
        if (sz < 16) return None
        val audioFormat = le16(b, i + 8)
        if (audioFormat != 1) return None // only integer PCM envelopes
        fmt = Some((le16(b, i + 10), le32(b, i + 12).toInt,
          le16(b, i + 22), le16(b, i + 20)))
      } else if (t == "data") dataSize = sz
      i += 8 + sz.toInt + (sz.toInt & 1) // chunks pad to even
    }
    fmt match {
      case Some((ch, rate, bits, block))
          if ch > 0 && rate > 0 && bits > 0 && block > 0 && dataSize >= 0 =>
        val frames = dataSize / block
        Some(AudioMeta("wav", ch, rate, bits, frames,
          frames * 1000L / rate))
      case _ => None
    }
  }
}
