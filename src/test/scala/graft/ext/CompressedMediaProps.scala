package graft.ext

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Robustness properties for the compressed-container byte parsers: a
  * metadata pass over a 100 TB corpus feeds these ARBITRARY bytes —
  * corrupt downloads, truncated uploads, adversarial junk behind a valid
  * magic. The parsers' contract is total: None (fall through to the loud
  * decodeHeader boundary) or a well-formed MediaMeta — never an
  * exception, never sentinel/garbage fields leaking into rows.
  */
object CompressedMediaProps extends Properties("CompressedMedia") {

  // parser-hardening properties are cheap (pure byte reads) — run a
  // deeper sample than the scalacheck default; the corruption property
  // originally falsified only on rare seeds (Theora fps overflow, NaN
  // WebM sample rates), so shallow sampling gives false confidence
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(500)

  private def sane(m: Multimodal.MediaMeta): Boolean =
    (m.kind == "audio" || m.kind == "video") &&
      m.width > 0 && m.height > 0 && m.fps >= 0 && m.payloadBytes >= 0

  property("arbitrary bytes: total, and any Some is sane") =
    forAll(Gen.choose(0, 256), Gen.long) { (n, seed) =>
      val r = new scala.util.Random(seed)
      val b = new Array[Byte](n); r.nextBytes(b)
      CompressedMedia.meta(b).forall(sane) &&
        CompressedMedia.videoFrameCount(b).forall(_ >= 0)
    }

  private val fixtures: Gen[Array[Byte]] = {
    val payload = Array.fill[Byte](64)(33)
    Gen.oneOf(
      MediaFixtures.mp3(0, stereo = true, payload),
      MediaFixtures.adts(4, 2, payload),
      MediaFixtures.flac(48000, 2, 16, 1000L),
      MediaFixtures.oggOpus(2, 48000L),
      MediaFixtures.oggVorbis(2, 44100L),
      MediaFixtures.oggTheora(320, 240, 24L, 1L),
      MediaFixtures.mp4Video(320, 240, 24L, 600L, 600L, payload),
      MediaFixtures.m4aAudio(2, 44100, payload),
      MediaFixtures.webmVideo(320, 240, 40000000L, 1000.0, 1000000L, payload),
      MediaFixtures.webmAudio(2, 48000.0, payload))
  }

  property("every truncation of a valid container: total, any Some sane") =
    forAll(fixtures, Gen.choose(0, 1.0)) { (f, frac) =>
      val cut = f.take(math.max(0, (f.length * frac).toInt))
      CompressedMedia.meta(cut).forall(sane) &&
        CompressedMedia.videoFrameCount(cut).forall(_ >= 0)
    }

  property("single-byte corruption of a valid container: total, sane") =
    forAll(fixtures, Gen.choose(0, Int.MaxValue), Gen.choose(0, 255)) {
      (f, posSeed, newByte) =>
        val b = f.clone()
        b(posSeed % b.length) = newByte.toByte
        CompressedMedia.meta(b).forall(sane) &&
          CompressedMedia.videoFrameCount(b).forall(_ >= 0)
    }

  private val magics: Gen[Array[Byte]] = Gen.oneOf(
    "fLaC".getBytes("US-ASCII"), "OggS".getBytes("US-ASCII"),
    "ID3".getBytes("US-ASCII"),
    Array(0x1A, 0x45, 0xDF, 0xA3).map(_.toByte),             // EBML
    Array[Byte](0, 0, 0, 16) ++ "ftyp".getBytes("US-ASCII"), // ISO-BMFF
    Array(0xFF, 0xF1).map(_.toByte),                         // ADTS sync
    Array(0xFF, 0xFB).map(_.toByte))                         // MPEG sync

  property("valid-magic junk tails: total, sane") =
    forAll(magics, Gen.choose(0, 64), Gen.long) { (m, n, seed) =>
      val r = new scala.util.Random(seed)
      val tail = new Array[Byte](n); r.nextBytes(tail)
      CompressedMedia.meta(m ++ tail).forall(sane)
    }
}
