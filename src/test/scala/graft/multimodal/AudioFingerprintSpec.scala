package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AudioFingerprintSpec extends SparkSpec {

  /** Real PCM WAV bytes: 16-bit mono, loud/quiet sections per `pattern`
    * (true = sine burst, false = near-silence), `gain` scales volume. */
  private def wav(pattern: Seq[Boolean], gain: Double = 1.0, rate: Float = 8000f): Array[Byte] = {
    val perSection = 400
    val samples = new Array[Byte](pattern.length * perSection * 2)
    var i = 0
    pattern.foreach { loud =>
      (0 until perSection).foreach { j =>
        val amp = if (loud) 0.8 * gain else 0.01 * gain
        val v = (math.sin(2 * math.Pi * j / 40.0) * amp * 32767).toInt.toShort
        samples(i) = (v & 0xFF).toByte
        samples(i + 1) = ((v >> 8) & 0xFF).toByte
        i += 2
      }
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, pattern.length.toLong * perSection)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def fpOf(bytes: Array[Byte]): AudioFingerprint.Fp = {
    val media = spark.createDataFrame(
      Seq((1L, bytes))).toDF("media_id", "content")
    AudioFingerprint.audioFingerprints(spark, media).collect().head
  }

  private val patternA = Seq(true, false, true, true, false, false, true, false)
  private val patternB = Seq(false, true, false, false, true, true, false, true)

  test("volume change leaves the envelope fingerprint identical") {
    val full = fpOf(wav(patternA))
    val quiet = fpOf(wav(patternA, gain = 0.3))
    assert(full.ok && quiet.ok)
    assert(full.fp == quiet.fp, "median thresholding must cancel uniform gain")
    assert(full.rms > quiet.rms, "raw loudness still differs — the fp is what's invariant")
  }

  test("different material is far in Hamming distance") {
    val a = fpOf(wav(patternA))
    val b = fpOf(wav(patternB))
    val d = java.lang.Long.bitCount(a.fp ^ b.fp)
    assert(d > 20, s"opposite loudness structure should flip most bits, got $d")
  }

  test("corrupt and non-audio payloads flag ok=false, never fail the task") {
    val junk = fpOf("definitely not a wav".getBytes)
    assert(!junk.ok)
    val truncated = fpOf(wav(patternA).take(30))
    assert(!truncated.ok)
  }

  test("nearDupPairs pairs the re-encoded copy and not the different clip") {
    val media = spark.createDataFrame(Seq(
      (1L, wav(patternA)),
      (2L, wav(patternA, gain = 0.5)), // same cut, volume-normalized
      (3L, wav(patternB)),
      (4L, "junk".getBytes))).toDF("media_id", "content")
    val pairs = AudioFingerprint.nearDupPairs(spark, media, maxHamming = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("duration metadata rides along") {
    val fp = fpOf(wav(patternA))
    // 8 sections × 400 samples at 8 kHz = 400 ms
    assert(math.abs(fp.duration_ms - 400L) <= 1)
  }
}
