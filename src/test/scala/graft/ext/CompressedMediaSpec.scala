package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Pins the pure-JVM compressed-container header parsers: each format's
  * documented byte layout round-trips through [[MediaFixtures]] →
  * [[CompressedMedia.meta]], malformed/truncated payloads return None
  * (falling through to decodeHeader's loud plug-point error), and real
  * MP4 video flows through the frame-sampling generator with its REAL
  * stts frame count.
  */
class CompressedMediaSpec extends AnyFunSuite with SharedSpark {

  private val payload = Array.fill[Byte](1000)(42)

  test("MP3: ID3v2-skip and bare-sync variants decode rate/channels") {
    val withTag = MediaFixtures.mp3(srIdx = 0, stereo = true, payload)
    val m1 = CompressedMedia.meta(withTag).get
    assert(m1.kind == "audio" && m1.width == 44100 && m1.height == 2)
    // payload counts from the frame sync (tag excluded): 4-byte header + body
    assert(m1.payloadBytes == 4L + payload.length)

    val bare = MediaFixtures.mp3(srIdx = 1, stereo = false, payload, withId3 = false)
    val m2 = CompressedMedia.meta(bare).get
    assert(m2.width == 48000 && m2.height == 1 &&
      m2.payloadBytes == 4L + payload.length)
  }

  test("ADTS AAC: frequency-index table and 3-bit channel config") {
    val m = CompressedMedia.meta(MediaFixtures.adts(freqIdx = 4, chanCfg = 6, payload)).get
    assert(m.kind == "audio" && m.width == 44100 && m.height == 6)
    assert(m.payloadBytes == 7L + payload.length)
    // channel config 0 (in-band PCE) is undecodable without a bitstream
    // parser → None, not a guess
    val pce = MediaFixtures.adts(freqIdx = 4, chanCfg = 1, payload)
    pce(2) = (pce(2) & ~1).toByte; pce(3) = 0
    assert(CompressedMedia.meta(pce).isEmpty)
  }

  test("FLAC: STREAMINFO bit-packing incl. PCM-equivalent payload size") {
    val m = CompressedMedia.meta(MediaFixtures.flac(96000, 2, 24, 48000L)).get
    assert(m.kind == "audio" && m.width == 96000 && m.height == 2)
    assert(m.payloadBytes == 48000L * 2 * 3) // samples × channels × ceil(24/8)
    // unknown total samples → container length stands in
    val unk = MediaFixtures.flac(44100, 1, 16, 0L)
    assert(CompressedMedia.meta(unk).get.payloadBytes == unk.length.toLong)
  }

  test("Ogg: Vorbis, Opus and Theora identification headers") {
    val v = CompressedMedia.meta(MediaFixtures.oggVorbis(2, 44100L)).get
    assert(v.kind == "audio" && v.width == 44100 && v.height == 2)
    val o = CompressedMedia.meta(MediaFixtures.oggOpus(1, 48000L)).get
    assert(o.width == 48000 && o.height == 1)
    // Theora: 30000/1001 ≈ 29.97 → rounds to 30 fps
    val t = CompressedMedia.meta(
      MediaFixtures.oggTheora(704, 480, 30000L, 1001L)).get
    assert(t.kind == "video" && t.width == 704 && t.height == 480 && t.fps == 30)
  }

  test("MP4 video: tkhd dims, stts-derived fps, mdat payload") {
    val frames = 240L
    val bytes = MediaFixtures.mp4Video(1920, 1080, frames,
      timescale = 600L, duration = frames * 25L, payload = payload)
    val m = CompressedMedia.meta(bytes).get
    assert(m.kind == "video" && m.width == 1920 && m.height == 1080)
    assert(m.fps == 24) // 240 frames × 600 / 6000 ticks
    assert(m.payloadBytes == payload.length.toLong)
    assert(CompressedMedia.videoFrameCount(bytes).contains(frames))
  }

  test("M4A audio: stsd sample entry rate/channels, mdat payload") {
    val m = CompressedMedia.meta(MediaFixtures.m4aAudio(2, 44100, payload)).get
    assert(m.kind == "audio" && m.width == 44100 && m.height == 2)
    assert(m.payloadBytes == payload.length.toLong)
    assert(CompressedMedia.videoFrameCount(
      MediaFixtures.m4aAudio(2, 44100, payload)).isEmpty)
  }

  test("WebM video: EBML dims, DefaultDuration-derived fps, cluster payload") {
    // 25 fps (40 ms/frame), 10 s of ticks at the default 1 ms scale
    val bytes = MediaFixtures.webmVideo(1280, 720, frameNs = 40000000L,
      durationTicks = 10000.0, tcScaleNs = 1000000L, payload = payload)
    val m = CompressedMedia.meta(bytes).get
    assert(m.kind == "video" && m.width == 1280 && m.height == 720 && m.fps == 25)
    assert(m.payloadBytes == payload.length.toLong)
    // duration 10 s × 25 fps = 250 frames
    assert(CompressedMedia.videoFrameCount(bytes).contains(250L))
  }

  test("WebM audio: SamplingFrequency float and Channels uint") {
    val m = CompressedMedia.meta(
      MediaFixtures.webmAudio(2, 48000.0, payload)).get
    assert(m.kind == "audio" && m.width == 48000 && m.height == 2)
    assert(m.payloadBytes == payload.length.toLong)
  }

  test("hi-res M4A: the wrapped 16.16 stsd rate is repaired from mdhd") {
    // encoders store rate<<16 truncated to 32 bits: for 96 kHz the stsd
    // field holds 30464 (96000 & 0xFFFF); the mdhd timescale carries the
    // true rate and must win over the wrapped value
    val m = CompressedMedia.meta(MediaFixtures.m4aAudio(2, 96000, payload)).get
    assert(m.kind == "audio" && m.width == 96000 && m.height == 2)
    // sub-65536 rates still come straight from the stsd entry
    assert(CompressedMedia.meta(
      MediaFixtures.m4aAudio(1, 22050, payload)).get.width == 22050)
  }

  test("metaAndFrames answers meta and frame count from one parse") {
    val mp4 = MediaFixtures.mp4Video(640, 360, 120L, 600L, 3000L, payload)
    val (m, fc) = CompressedMedia.metaAndFrames(mp4).get
    assert(m == CompressedMedia.meta(mp4).get)
    assert(fc == CompressedMedia.videoFrameCount(mp4))
    val webm = MediaFixtures.webmVideo(320, 240, 40000000L, 2000.0, 1000000L, payload)
    val (wm, wfc) = CompressedMedia.metaAndFrames(webm).get
    assert(wm == CompressedMedia.meta(webm).get && wfc.contains(50L))
    // audio containers report no frame enumeration
    assert(CompressedMedia.metaAndFrames(
      MediaFixtures.flac(48000, 2, 16, 10L)).get._2.isEmpty)
    // the frame count derives from the stts table ALONE: an MP4 whose
    // tkhd declares no dims has no MediaMeta but still a real count
    val dimless = MediaFixtures.mp4Video(0, 0, 77L, 600L, 600L, payload)
    assert(CompressedMedia.meta(dimless).isEmpty)
    assert(CompressedMedia.videoFrameCount(dimless).contains(77L))
  }

  test("sampleFrames enumerates WebM frames from Duration/DefaultDuration") {
    import spark.implicits._
    // 2 s at 25 fps → 50 frames, every 10th → 0,10,20,30,40
    val bytes = MediaFixtures.webmVideo(320, 240, 40000000L, 2000.0,
      1000000L, payload)
    val rows = Multimodal.sampleFrames(Seq((3L, bytes)).toDF("media_id", "content"),
      everyNth = 10).orderBy("frame_idx").collect()
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 10, 20, 30, 40))
  }

  test("malformed and truncated containers return None, never a guess") {
    assert(CompressedMedia.meta(Array.fill[Byte](3)(0x7F)).isEmpty)
    assert(CompressedMedia.meta("not media at all padding".getBytes("UTF-8")).isEmpty)
    // truncations of every fixture must not throw or mis-decode
    val fixtures = Seq(
      MediaFixtures.mp3(0, stereo = true, payload),
      MediaFixtures.adts(4, 2, payload),
      MediaFixtures.flac(48000, 2, 16, 1000L),
      MediaFixtures.oggOpus(2, 48000L),
      MediaFixtures.mp4Video(64, 48, 24L, 600L, 600L, payload),
      MediaFixtures.webmVideo(64, 48, 40000000L, 1000.0, 1000000L, payload))
    for (f <- fixtures; n <- Seq(1, 5, 11, 27))
      CompressedMedia.meta(f.take(n)) // must not throw
    // a JPEG-start (FF D8) must not read as an MPEG sync
    assert(CompressedMedia.meta(
      Array(0xFF.toByte, 0xD8.toByte) ++ new Array[Byte](64)).isEmpty)
  }

  test("decodeHeader integrates the compressed parsers ahead of the stub error") {
    val m = Multimodal.decodeHeader(MediaFixtures.flac(32000, 1, 16, 10L))
    assert(m.kind == "audio" && m.width == 32000)
    // still loud for genuinely unknown payloads
    val ex = intercept[IllegalArgumentException] {
      Multimodal.decodeHeader(Array.fill[Byte](64)(0x55))
    }
    assert(ex.getMessage.contains("CompressedMedia"))
  }

  test("sampleFrames enumerates REAL MP4 frames from the stts table") {
    import spark.implicits._
    val bytes = MediaFixtures.mp4Video(320, 240, frames = 10L,
      timescale = 600L, duration = 250L, payload = payload)
    val df = Seq((7L, bytes)).toDF("media_id", "content")
    val rows = Multimodal.sampleFrames(df, everyNth = 3)
      .orderBy("frame_idx").collect()
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 3, 6, 9))
    assert(rows.forall(r => r.getInt(2) == 320 && r.getInt(3) == 240))
  }
}
