package graft.multimodal

import java.io.ByteArrayOutputStream

/** Deterministic in-JVM builder of REAL RIFF/WAVE bytes for the audio
  * decode path — the audio twin of [[ImageFixtures]]: a complete,
  * spec-valid PCM file (`javax.sound.sampled.AudioSystem` reads it
  * back) whose envelope derives from integer columns, so the
  * `multimodal_audio_decode` oracle can recompute the expected
  * channels/rate/width/frames/duration arithmetically while the
  * parser ([[AudioHeader]]) meets the builder only at the public byte
  * format. */
object AudioFixtures {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** A complete, valid PCM WAV: RIFF header + canonical `fmt ` chunk +
    * a `data` chunk of `nFrames` frames carrying the deterministic
    * sample pattern a SQL oracle can recompute — 8-bit (unsigned, per
    * spec): `(f + 3c + seed) mod 256`; 16-bit (signed LE):
    * `((5f + 7c + seed) mod 65536) - 32768` for frame f, channel c. */
  def wavBytes(channels: Int, sampleRate: Int, bitsPerSample: Int,
               nFrames: Long, seed: Long = 0L): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && nFrames >= 0 &&
      (bitsPerSample == 8 || bitsPerSample == 16),
      s"bad wav fixture: ch=$channels rate=$sampleRate bits=$bitsPerSample")
    val blockAlign = channels * (bitsPerSample / 8)
    val dataSize = nFrames * blockAlign
    require(dataSize <= Int.MaxValue - 44, s"fixture too large: $dataSize")
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(36L + dataSize)) // 4 (WAVE) + 24 (fmt) + 8 + data
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    out.write(le32(16L))
    out.write(le16(1)) // integer PCM
    out.write(le16(channels))
    out.write(le32(sampleRate.toLong))
    out.write(le32(sampleRate.toLong * blockAlign)) // byte rate
    out.write(le16(blockAlign))
    out.write(le16(bitsPerSample))
    out.write("data".getBytes("US-ASCII"))
    out.write(le32(dataSize))
    val data = new Array[Byte](dataSize.toInt)
    var f = 0L
    var i = 0
    while (f < nFrames) {
      var c = 0
      while (c < channels) {
        if (bitsPerSample == 8) {
          data(i) = (((f + 3 * c + seed) % 256).toInt & 0xff).toByte
          i += 1
        } else {
          val v = (((5 * f + 7 * c + seed) % 65536) - 32768).toInt
          data(i) = (v & 0xff).toByte
          data(i + 1) = ((v >> 8) & 0xff).toByte
          i += 2
        }
        c += 1
      }
      f += 1
    }
    out.write(data)
    out.toByteArray
  }
}
