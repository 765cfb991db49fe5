package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** EXHAUSTIVE single-byte corruption sweep over every media fixture:
  * all positions x all 256 byte values x every container (~600k
  * parses, pure byte reads, ~2 s). Strictly subsumes the seeded
  * ScalaCheck corruption property, which falsified only on rare seeds
  * (r14 caught a WebM SamplingFrequency in (0, 0.5) rounding to a
  * zero-Hz rate after 432 passing trials) — determinism beats sampling
  * when the domain is small enough to enumerate.
  */
class CorruptionSweepSpec extends AnyFunSuite {
  test("every single-byte corruption of every fixture parses total and sane") {
    val payload = Array.fill[Byte](64)(33)
    val fixtures = Seq(
      "mp3" -> MediaFixtures.mp3(0, stereo = true, payload),
      "adts" -> MediaFixtures.adts(4, 2, payload),
      "flac" -> MediaFixtures.flac(48000, 2, 16, 1000L),
      "oggOpus" -> MediaFixtures.oggOpus(2, 48000L),
      "oggVorbis" -> MediaFixtures.oggVorbis(2, 44100L),
      "oggTheora" -> MediaFixtures.oggTheora(320, 240, 24L, 1L),
      "mp4Video" -> MediaFixtures.mp4Video(320, 240, 24L, 600L, 600L, payload),
      "m4aAudio" -> MediaFixtures.m4aAudio(2, 44100, payload),
      "webmVideo" -> MediaFixtures.webmVideo(320, 240, 40000000L, 1000.0, 1000000L, payload),
      "webmAudio" -> MediaFixtures.webmAudio(2, 48000.0, payload))
    def sane(m: Multimodal.MediaMeta): Boolean =
      (m.kind == "audio" || m.kind == "video") &&
        m.width > 0 && m.height > 0 && m.fps >= 0 && m.payloadBytes >= 0
    var bad = List.empty[String]
    for ((name, f) <- fixtures; pos <- f.indices; v <- 0 to 255) {
      val b = f.clone(); b(pos) = v.toByte
      try {
        if (!CompressedMedia.meta(b).forall(sane))
          bad ::= s"$name pos=$pos v=$v -> insane ${CompressedMedia.meta(b)}"
        if (!CompressedMedia.videoFrameCount(b).forall(_ >= 0))
          bad ::= s"$name pos=$pos v=$v -> negative frame count"
      } catch {
        case t: Throwable => bad ::= s"$name pos=$pos v=$v -> threw ${t.getClass.getSimpleName}: ${t.getMessage}"
      }
    }
    val sample = bad.groupBy(_.split(" ").head).map { case (k, vs) => s"$k: ${vs.size} cases, e.g. ${vs.head}" }
    assert(bad.isEmpty, s"${bad.size} violations:\n${sample.mkString("\n")}")
  }
}
