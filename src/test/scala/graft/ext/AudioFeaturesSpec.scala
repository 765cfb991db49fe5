package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class AudioFeaturesSpec extends AnyFunSuite with SharedSpark {

  private def square(a: Int, half: Int, frames: Int): Array[Short] =
    Array.tabulate(frames)(i => (if ((i / half) % 2 == 0) a else -a).toShort)

  test("WAV PCM16 square wave: exact RMS, peak, frames, crossings") {
    val s = AudioFeatures.decodeStats(
      MediaFixtures.wavPcm16(16000, 1, square(1200, 7, 500))).get
    assert(s.sampleRate == 16000 && s.channels == 1 && s.frames == 500L)
    assert(s.rms == 1200.0) // |sample| constant => RMS is exact
    assert(s.peak == 1200 && s.zeroCrossings == 499L / 7)
  }

  test("stereo WAV mixes channels to mono before the fold") {
    val mono = square(800, 5, 300)
    val interleaved = new Array[Short](600)
    mono.indices.foreach { i =>
      interleaved(2 * i) = mono(i); interleaved(2 * i + 1) = mono(i)
    }
    val s = AudioFeatures.decodeStats(
      MediaFixtures.wavPcm16(44100, 2, interleaved)).get
    assert(s.channels == 2 && s.frames == 300L && s.rms == 800.0 &&
      s.peak == 800 && s.zeroCrossings == 299L / 5)
  }

  test("AU PCM16 (big-endian) decodes through the same path") {
    val s = AudioFeatures.decodeStats(
      MediaFixtures.auPcm16(8000, 1, square(1500, 3, 120))).get
    assert(s.sampleRate == 8000 && s.frames == 120L && s.rms == 1500.0 &&
      s.peak == 1500 && s.zeroCrossings == 119L / 3)
  }

  test("zeros are transparent to crossings; leading silence never counts") {
    // 0, 0, +A, 0, -A, -A, +A: crossings at (+A..-A) through the zero, and
    // (-A..+A) = 2; the leading zeros precede any sign
    val samples = Array[Short](0, 0, 500, 0, -500, -500, 500)
    val s = AudioFeatures.decodeStats(
      MediaFixtures.wavPcm16(8000, 1, samples)).get
    assert(s.zeroCrossings == 2L && s.frames == 7L && s.peak == 500)
  }

  test("refuses what it cannot decode exactly: corrupt and 8-bit payloads") {
    assert(AudioFeatures.decodeStats(Array[Byte](1, 2, 3, 4)).isEmpty)
    // an 8-bit WAV parses as a container but is not 16-bit signed PCM:
    // dropped, never approximated
    val dataLen = 16
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Array[Byte] = Array((v & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def le16(v: Int): Array[Byte] = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    out.write("RIFF".getBytes); out.write(le32(36L + dataLen))
    out.write("WAVE".getBytes); out.write("fmt ".getBytes); out.write(le32(16L))
    out.write(le16(1)); out.write(le16(1)); out.write(le32(8000L))
    out.write(le32(8000L)); out.write(le16(1)); out.write(le16(8))
    out.write("data".getBytes); out.write(le32(dataLen.toLong))
    out.write(new Array[Byte](dataLen))
    assert(AudioFeatures.decodeStats(out.toByteArray).isEmpty)
  }

  test("audioFeatures frame drops undecodable rows and keeps exact stats") {
    import spark.implicits._
    val good = MediaFixtures.wavPcm16(16000, 1, square(1000, 4, 200))
    val df = Seq((1L, good), (2L, Array[Byte](0, 1, 2))).toDF("media_id", "content")
    val rows = AudioFeatures.audioFeatures(df).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("frames") == 200L && r.getAs[Double]("rms") == 1000.0 &&
      r.getAs[Int]("peak") == 1000 &&
      r.getAs[Long]("zero_crossings") == 199L / 4)
  }

  test("empty payload yields zeroed stats, not a crash") {
    val s = AudioFeatures.decodeStats(
      MediaFixtures.wavPcm16(8000, 1, Array.empty[Short])).get
    assert(s.frames == 0L && s.rms == 0.0 && s.peak == 0 && s.zeroCrossings == 0L)
  }
}
