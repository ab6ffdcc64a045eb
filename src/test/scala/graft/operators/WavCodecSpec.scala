package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.scalatest.funsuite.AnyFunSuite

/** r17: the audio tier's hand-rolled RIFF/PCM16 codec replaced
  * `javax.sound` (whose global provider-registry lock serialized the
  * codec stage — measured 2.2× slower at 32 concurrent tasks). The
  * optimization contract is BYTE IDENTITY: the stored WAV payloads, and
  * therefore every decoded statistic m02/d19 declare, must be exactly
  * what the JDK writer produced before. This spec pins that against the
  * JDK itself as reference, across the fleet's layout space.
  */
class WavCodecSpec extends AnyFunSuite {

  private def jdkEncode(data: Array[Byte], rate: Int): Array[Byte] = {
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false) // PCM16 mono LE
    val out = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(data), fmt, (data.length / 2).toLong),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  private def squareWave(n: Int, hp: Int, a1: Int, a2: Int): Array[Byte] = {
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val amp = if (i < n / 2) a1 else a2
      val v   = if ((i / hp) % 2 == 0) amp else -amp
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    data
  }

  // the m02 layout domain: n in [2048,4095], rate in {8000,12000,16000,20000},
  // hp in [16,63], amps in [1000,20999] — sampled across the corners + a sweep
  private val layouts = for {
    n    <- Seq(2048, 2049, 3071, 4095)
    rate <- Seq(8000, 12000, 16000, 20000)
    hp   <- Seq(16, 37, 63)
  } yield (n, rate, hp, 1000 + (n * 13) % 20000, 1000 + (hp * 17) % 20000)

  test("wavEncode is byte-identical to the JDK WAVE writer across the layout domain") {
    layouts.foreach { case (n, rate, hp, a1, a2) =>
      val data = squareWave(n, hp, a1, a2)
      val ours = Multimodal.wavEncode(data, rate)
      val jdk  = jdkEncode(data, rate)
      assert(java.util.Arrays.equals(ours, jdk),
        s"wavEncode($n samples @ $rate Hz, hp=$hp) diverged from the JDK writer")
    }
  }

  test("wavDecode round-trips wavEncode and matches the JDK parser") {
    layouts.foreach { case (n, rate, hp, a1, a2) =>
      val data = squareWave(n, hp, a1, a2)
      val wav  = Multimodal.wavEncode(data, rate)
      val (dRate, dData) = Multimodal.wavDecode(wav)
      assert(dRate == rate && java.util.Arrays.equals(dData, data),
        s"wavDecode round trip lost data at n=$n rate=$rate hp=$hp")
      val ain = AudioSystem.getAudioInputStream(new ByteArrayInputStream(wav))
      assert(ain.getFormat.getSampleRate.toInt == rate)
      assert(java.util.Arrays.equals(ain.readAllBytes(), data),
        "JDK parser reads different samples from our container")
    }
  }

  test("wavDecode walks unknown RIFF chunks (odd lengths padded) and rejects junk") {
    val data = squareWave(2048, 16, 5000, 7000)
    val wav  = Multimodal.wavEncode(data, 8000)
    // splice an unknown 3-byte chunk (padded to 4) between fmt and data
    val head = java.util.Arrays.copyOfRange(wav, 0, 36)
    val tail = java.util.Arrays.copyOfRange(wav, 36, wav.length)
    val out  = new ByteArrayOutputStream()
    out.write(head)
    out.write("junk".getBytes("US-ASCII")); out.write(Array[Byte](3, 0, 0, 0))
    out.write(Array[Byte](1, 2, 3, 0)) // 3 bytes + even padding
    out.write(tail)
    val spliced = out.toByteArray
    // fix the RIFF size field (+12 bytes)
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, bb.getInt(4) + 12)
    val (rate, samples) = Multimodal.wavDecode(spliced)
    assert(rate == 8000 && java.util.Arrays.equals(samples, data))
    intercept[IllegalArgumentException] {
      Multimodal.wavDecode("definitely not a wav file at all".getBytes("US-ASCII"))
    }
  }
}
