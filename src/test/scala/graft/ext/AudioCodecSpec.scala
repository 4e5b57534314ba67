package graft.ext

import graft.SparkTestBase
import graft.ext.Multimodal.AudioCodec

class AudioCodecSpec extends SparkTestBase {

  test("decodes its own WAV with exact sample count, sum, and peak") {
    val wav = AudioCodec.encodeWavPcm16(250, seed = 42L)
    // RIFF/WAVE magic, to prove these are real container bytes.
    assert(wav(0) == 'R'.toByte && wav(8) == 'W'.toByte)
    val (n, sr, ch, sum, mx) = AudioCodec.decodeWav(wav).get
    val samples = (0 until 250).map(i => ((i.toLong * 31 + 42L * 17) % 65536 - 32768).toInt)
    assert(n == 250L && sr == 8000 && ch == 1)
    assert(sum == samples.map(_.toLong).sum)
    assert(mx == samples.map(math.abs).max)
  }

  test("manual RIFF writer emits bytes the JDK's own audio stack decodes") {
    // The hot path avoids AudioSystem (its provider registry takes a
    // global lock that serialized executor threads); this cross-check
    // proves the manual container is REAL WAV, not a private format.
    val wav = AudioCodec.encodeWavPcm16(123, seed = 7L)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = ais.getFormat
    assert(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
      !fmt.isBigEndian && fmt.getSampleRate == 8000f)
    val data = ais.readAllBytes()
    assert(data.length == 246)
    // First sample decoded by the JDK equals the generator's arithmetic.
    val s0 = ((data(0) & 0xff) | (data(1) << 8)).toShort.toInt
    assert(s0 == ((7L * 17) % 65536 - 32768).toInt)
  }

  test("refuses truncated, garbage, and null payloads") {
    val wav = AudioCodec.encodeWavPcm16(100, seed = 1L)
    assert(AudioCodec.decodeWav(wav.take(11)).isEmpty)
    assert(AudioCodec.decodeWav(Array.fill[Byte](64)(33)).isEmpty)
    assert(AudioCodec.decodeWav(null).isEmpty)
  }

  test("refuses a crafted fmt chunk declaring a non-positive sample rate") {
    // A malformed header the AudioSystem path would also have refused:
    // decode-or-quarantine must stay exhaustive over header fields.
    val wav = AudioCodec.encodeWavPcm16(100, seed = 1L)
    def withRate(rate: Int): Array[Byte] = {
      val b = wav.clone()
      val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.putInt(24, rate) // fmt chunk sample-rate slot in the canonical layout
      b
    }
    assert(AudioCodec.decodeWav(withRate(0)).isEmpty)
    assert(AudioCodec.decodeWav(withRate(-8000)).isEmpty)
    assert(AudioCodec.decodeWav(withRate(8000)).nonEmpty, "control: valid rate decodes")
  }

  test("decodeAudio is map-only over a binary column") {
    val s = spark; import s.implicits._
    val docs = Seq(1L, 2L).map(id =>
      (id, AudioCodec.encodeWavPcm16(10, id))).toDF("doc_id", "payload")
    val ds = Multimodal.decodeAudio(docs, "doc_id", "payload")
    assert(!ds.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(ds.collect().map(_.doc_id).sorted.toSeq == Seq(1L, 2L))
  }
}
