package graft.multimodal

/** Pure-JVM PCM SAMPLE decode for RIFF/WAVE — the audio twin of
  * [[PngPixels]]: the chunk walk locates the `data` payload and the
  * samples reconstruct per the public spec (8-bit PCM is UNSIGNED,
  * 16-bit is SIGNED little-endian). Covers integer PCM at 8/16 bits —
  * exactly what the fixture builder emits and what a loudness/clipping
  * gate decodes after [[AudioHeader]] routing; anything else returns
  * None (the quarantine signal), never throws. No codec library
  * involved: WAV sample decode is pure byte algebra.
  */
object PcmSamples {

  /** Decoded clip: frame-major channel-interleaved sign-corrected
    * samples (`samples(f * channels + c)`). */
  final case class Audio(channels: Int, bitsPerSample: Int,
                         nFrames: Long, samples: Array[Int])

  import AudioHeader.{le16, le32, tag, u8} // shared RIFF readers

  def decode(b: Array[Byte]): Option[Audio] = {
    if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE")
      return None
    var i = 12
    var channels = -1; var bits = -1; var block = -1
    var dataOff = -1; var dataSize = -1L
    while (i + 8 <= b.length && (channels < 0 || dataOff < 0)) {
      val t = tag(b, i)
      val sz = le32(b, i + 4)
      if (sz < 0 || i + 8 + sz > b.length) return None // truncated chunk
      if (t == "fmt ") {
        if (sz < 16 || le16(b, i + 8) != 1) return None // integer PCM only
        channels = le16(b, i + 10)
        block = le16(b, i + 20)
        bits = le16(b, i + 22)
      } else if (t == "data") { dataOff = i + 8; dataSize = sz }
      i += 8 + sz.toInt + (sz.toInt & 1) // chunks pad to even
    }
    if (channels <= 0 || block <= 0 || dataOff < 0) return None
    if (bits != 8 && bits != 16) return None
    if (block != channels * (bits / 8)) return None
    val nFrames = dataSize / block
    if (nFrames * channels > Int.MaxValue / 4) return None
    val n = (nFrames * channels).toInt
    val out = new Array[Int](n)
    var s = 0
    while (s < n) {
      out(s) =
        if (bits == 8) u8(b, dataOff + s) // unsigned by spec
        else le16(b, dataOff + 2 * s).toShort.toInt // signed LE
      s += 1
    }
    Some(Audio(channels, bits, nFrames, out))
  }
}
