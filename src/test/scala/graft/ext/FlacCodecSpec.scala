package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** The native FLAC codec (r18): encode→decode round-trips are SAMPLE-
  * EXACT across the whole subframe/stereo toolbox, the decoded features
  * hash-match the WAV path on identical samples, and damaged or
  * out-of-subset streams refuse loudly — never wrong samples.
  */
class FlacCodecSpec extends AnyFunSuite {

  /** Deterministic pseudo-noise from the engine's md5 convention. */
  private def noise(n: Int, seed: String, amp: Int): Array[Int] =
    Array.tabulate(n) { i =>
      (Dedup.md5Hash60(s"$seed$i") % (2 * amp + 1) - amp).toInt
    }

  private def roundTrip(samples: Array[Int], channels: Int,
                        stereoMode: String = "independent",
                        subframeMode: String = "auto",
                        blockSize: Int = 4096,
                        rate: Int = 44100): Unit = {
    val flac = FlacCodec.encode(rate, channels, samples,
      blockSize = blockSize, stereoMode = stereoMode,
      subframeMode = subframeMode)
    val pcm = FlacCodec.decode(flac)
    assert(pcm.sampleRate == rate && pcm.channels == channels &&
      pcm.bitsPerSample == 16)
    assert(pcm.samples.toSeq == samples.toSeq,
      s"round-trip mismatch (stereo=$stereoMode subframe=$subframeMode " +
        s"block=$blockSize n=${samples.length})")
  }

  test("round-trips are sample-exact across subframe types and block splits") {
    val mono = noise(1000, "flac-mono", 4000)
    for (mode <- Seq("auto", "verbatim", "lpc");
         block <- Seq(4096, 256, 192)) // multi-frame + ragged last frame
      roundTrip(mono, 1, subframeMode = mode, blockSize = block)
    // constant and near-constant signals take the CONSTANT / low-order
    // fixed paths
    roundTrip(Array.fill(500)(1234), 1)
    roundTrip(Array.tabulate(500)(i => 100 + i), 1) // pure ramp: order 2
    // square wave — the closed-form fixture shape the probes use
    roundTrip(Array.tabulate(777)(i => if ((i / 7) % 2 == 0) 9000 else -9000), 1)
  }

  test("all four stereo decorrelations reconstruct exactly") {
    val n = 600
    val l = noise(n, "flac-L", 12000)
    val r = noise(n, "flac-R", 12000)
    val interleaved = Array.tabulate(2 * n)(i => if (i % 2 == 0) l(i / 2) else r(i / 2))
    for (sm <- Seq("independent", "left-side", "right-side", "mid-side");
         fm <- Seq("auto", "verbatim", "lpc"))
      roundTrip(interleaved, 2, stereoMode = sm, subframeMode = fm,
        blockSize = 256)
    // extreme values stress the side channel's 17th bit
    val hot = Array.tabulate(2 * n)(i =>
      if (i % 2 == 0) Short.MaxValue.toInt else Short.MinValue.toInt)
    for (sm <- Seq("left-side", "right-side", "mid-side"))
      roundTrip(hot, 2, stereoMode = sm)
  }

  test("decoded features hash-match the WAV path on identical samples") {
    // the same square wave through both containers must fold identical
    // features — sample-exact decode, not approximation
    val ch = 2
    val n = 480
    val samples = new Array[Short](n * ch)
    for (i <- 0 until n; c <- 0 until ch)
      samples(i * ch + c) = (if ((i / 6) % 2 == 0) 1500 else -1500).toShort
    val viaWav = AudioFeatures.decodeStats(
      MediaFixtures.wavPcm16(16000, ch, samples)).get
    val viaFlac = AudioFeatures.decodeStats(
      MediaFixtures.flacPcm16(16000, ch, samples, stereoMode = "mid-side")).get
    assert(viaFlac == viaWav)
    assert(viaWav.rms == 1500.0 && viaWav.frames == n.toLong)
  }

  test("damaged streams refuse loudly, never return wrong samples") {
    // a flip that decodes FINE structurally (the constant value of a
    // CONSTANT subframe): only the CRC can catch it — and must
    val const = FlacCodec.encode(8000, 1, Array.fill(100)(7))
    val silent = const.clone()
    silent(4 + 4 + 34 + 9) = (silent(4 + 4 + 34 + 9) ^ 0x04).toByte
    val e = intercept[IllegalStateException] { FlacCodec.decode(silent) }
    assert(e.getMessage.contains("CRC"), e.getMessage)
    // a flip inside Rice-coded residuals: desync or CRC, either way loud
    val good = FlacCodec.encode(8000, 1, noise(300, "flac-crc", 3000))
    val bad = good.clone()
    bad(good.length - 10) = (bad(good.length - 10) ^ 0x10).toByte
    intercept[IllegalStateException] { FlacCodec.decode(bad) }
    // truncation refuses
    val cut = java.util.Arrays.copyOf(good, good.length - 7)
    intercept[IllegalStateException] { FlacCodec.decode(cut) }
    // a STREAMINFO promising more samples than the frames deliver
    // refuses (the metadata-only header fixture is exactly that shape)
    intercept[IllegalStateException] {
      FlacCodec.decode(MediaFixtures.flac(48000, 2, 16, 1000L))
    }
  }

  test("out-of-subset structures refuse loudly with a FLAC message") {
    // hand-craft a frame with a RESERVED subframe type (000010): take a
    // valid single-frame stream and corrupt the subframe type bits while
    // fixing both CRCs — the refusal must be the reserved-type check,
    // not a CRC side effect
    val good = FlacCodec.encode(8000, 1, Array.fill(100)(7))
    // locate the frame: fLaC(4) + streaminfo block header(4) + 34
    val frameAt = 4 + 4 + 34
    // header: sync(2) codes(2) framenum(1) blocksize(2) crc8(1) = 8 bytes
    val subframeByteAt = frameAt + 8
    val bad = good.clone()
    bad(subframeByteAt) = 0x04 // type 000010 (reserved), padding bit 0
    // re-seal CRC-8 (unchanged — header bytes untouched) and CRC-16
    def crc16(b: Array[Byte], from: Int, until: Int): Int = {
      var c = 0
      for (i <- from until until) {
        c ^= (b(i) & 0xFF) << 8
        for (_ <- 0 until 8)
          c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xFFFF
              else (c << 1) & 0xFFFF
      }
      c
    }
    val c16 = crc16(bad, frameAt, bad.length - 2)
    bad(bad.length - 2) = ((c16 >> 8) & 0xFF).toByte
    bad(bad.length - 1) = (c16 & 0xFF).toByte
    val e = intercept[IllegalStateException] { FlacCodec.decode(bad) }
    assert(e.getMessage.contains("reserved subframe type"), e.getMessage)
    // not-FLAC-at-all is the caller's fallback case, not a throw from
    // the sniff
    assert(!FlacCodec.isFlac("RIFFxxxx".getBytes("US-ASCII")))
  }

  test("normalizeToWav: FLAC rewraps byte-identical to the WAV writer, WAV passes through, AU converts, lossy refuses") {
    val ch = 2
    val n = 300
    val samples = Array.tabulate[Short](n * ch)(i =>
      (if ((i / (2 * 9)) % 2 == 0) 2500 else -2500).toShort)
    val wav = MediaFixtures.wavPcm16(16000, ch, samples)
    // FLAC → the EXACT bytes the WAV writer produces for these samples:
    // decode is lossless and the writer is deterministic, so the
    // normalized corpus is content-addressable
    val viaFlac = AudioFeatures.normalizeBlobToWav(
      MediaFixtures.flacPcm16(16000, ch, samples, stereoMode = "left-side"))
    assert(java.util.Arrays.equals(viaFlac, wav))
    // WAV passes through byte-identical (no re-encode churn)
    assert(AudioFeatures.normalizeBlobToWav(wav) eq wav)
    // AU (big-endian) re-containers to the same WAV bytes
    val viaAu = AudioFeatures.normalizeBlobToWav(
      MediaFixtures.auPcm16(16000, ch, samples))
    assert(java.util.Arrays.equals(viaAu, wav))
    // lossy payloads refuse loudly — normalization never silently drops
    val e = intercept[IllegalArgumentException] {
      AudioFeatures.normalizeBlobToWav(
        MediaFixtures.mp3(1, stereo = true, Array.fill[Byte](64)(33)))
    }
    assert(e.getMessage.contains("production decoder"), e.getMessage)
  }

  test("decode cost is one pass: 1M samples in well under a second of work") {
    val n = 1000000
    val samples = Array.tabulate(n)(i => ((i * 37) % 8000) - 4000)
    val flac = FlacCodec.encode(48000, 1, samples)
    val t0 = System.nanoTime()
    val pcm = FlacCodec.decode(flac)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(pcm.samples.length == n)
    assert(pcm.samples(12345) == samples(12345))
    // generous bound — the point is linear cost, not a benchmark
    assert(ms < 5000.0, s"decode took $ms ms for 1M samples")
  }
}
