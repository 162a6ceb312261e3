package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.AudioHeader.AudioMeta

/** The WAV header parser against an INDEPENDENT encoder: the JDK's own
  * `javax.sound.sampled` WAVE writer produces the golden bytes, and
  * our parser must recover channels / rate / width / frames from them.
  * The fixture builder is cross-validated the other way:
  * `AudioSystem.getAudioInputStream` must accept
  * [[AudioFixtures.wavBytes]] as a real decodable file — proving the
  * fixtures the `multimodal_audio_decode` oracle rides on are
  * spec-valid, not just parser-shaped bytes. */
class AudioHeaderSpec extends AnyFunSuite {

  private def jdkWav(channels: Int, rate: Float, bits: Int,
                     nFrames: Int): Array[Byte] = {
    val fmt = new AudioFormat(rate, bits, channels, bits == 16, false)
    val data = new Array[Byte](nFrames * fmt.getFrameSize)
    val in = new AudioInputStream(
      new ByteArrayInputStream(data), fmt, nFrames.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("parses JDK-encoded WAVs: channels/rate/width/frames/duration") {
    val cases = Seq((1, 8000f, 16, 4000), (2, 44100f, 16, 441),
      (1, 11025f, 8, 11025))
    cases.foreach { case (ch, rate, bits, frames) =>
      val meta = AudioHeader.parseWav(jdkWav(ch, rate, bits, frames))
      assert(meta.contains(AudioMeta("wav", ch, rate.toInt, bits,
        frames.toLong, frames.toLong * 1000L / rate.toInt)),
        s"ch=$ch rate=$rate bits=$bits got $meta")
    }
  }

  test("fixture WAV is a real decodable file (AudioSystem reads it back)") {
    val bytes = AudioFixtures.wavBytes(channels = 2, sampleRate = 16000,
      bitsPerSample = 16, nFrames = 1234)
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val f = in.getFormat
    assert(f.getChannels === 2)
    assert(f.getSampleRate === 16000f)
    assert(f.getSampleSizeInBits === 16)
    assert(in.getFrameLength === 1234L)
    // and our parser agrees with the JDK's reading of our own bytes
    assert(AudioHeader.parseWav(bytes)
      .contains(AudioMeta("wav", 2, 16000, 16, 1234L, 77L)))
  }

  test("non-audio and truncated payloads are rejected, not mis-parsed") {
    assert(AudioHeader.parseWav(Array.emptyByteArray).isEmpty)
    assert(AudioHeader.parseWav("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    val good = AudioFixtures.wavBytes(1, 8000, 8, 100)
    assert(AudioHeader.parseWav(good.take(30)).isEmpty,
      "a chunk running past the buffer must reject")
    // a float-PCM (format 3) envelope is not an integer-PCM parse
    val floaty = good.clone()
    floaty(20) = 3
    assert(AudioHeader.parseWav(floaty).isEmpty)
  }
}
