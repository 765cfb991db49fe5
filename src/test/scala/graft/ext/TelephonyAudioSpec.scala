package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** The telephony codecs (r18): G.711 mu-law/A-law swept over the ENTIRE
  * code domain against the JDK's own independent converters, IMA ADPCM
  * mirrored-state round-trips with block-split invariance, container
  * decode through both WAV and AU, and loud refusals on structural
  * damage — never wrong samples.
  */
class TelephonyAudioSpec extends AnyFunSuite {
  import TelephonyAudio._

  // ---------------------------------------------------------------------
  // G.711 algebra
  // ---------------------------------------------------------------------

  test("G.711: every codeword is a fixed point (encode(decode(c)) == c)") {
    for (c <- 0 until 256) {
      // mu-law's one exception: 0x7F is "negative zero" — it decodes to
      // the same 0 as 0xFF, and the encoder canonically emits 0xFF
      if (c == 0x7F) assert(mulawDecode(c) == 0 && mulawEncode(0) == 0xFF)
      else assert(mulawEncode(mulawDecode(c)) == c, s"mu-law codeword $c")
      // A-law's minimum magnitude is 8, never zero: all 256 are fixed
      assert(alawEncode(alawDecode(c)) == c, s"A-law codeword $c")
    }
  }

  test("G.711: decode magnitudes match the closed forms the oracles use") {
    // mu-law: ((m*8 + 132) << e) - 132 on the de-inverted byte; the
    // stored byte is the complement, so the positive half has bit 7 SET
    for (e <- 0 to 7; m <- 0 to 15) {
      val mag = ((m * 8 + 132) << e) - 132
      assert(mulawDecode((~((e << 4) | m)) & 0xFF) == mag, s"mu-law +e=$e m=$m")
      assert(mulawDecode((~(0x80 | (e << 4) | m)) & 0xFF) == -mag,
        s"mu-law -e=$e m=$m")
    }
    // A-law: seg==0 ? 16q+8 : (16q+264) << (seg-1), sign from bit 7
    for (s <- 0 to 7; q <- 0 to 15) {
      val expected = if (s == 0) 16 * q + 8 else (16 * q + 264) << (s - 1)
      val pos = (0x80 | (s << 4) | q) ^ 0x55
      val neg = ((s << 4) | q) ^ 0x55
      assert(alawDecode(pos) == expected, s"A-law +seg=$s q=$q")
      assert(alawDecode(neg) == -expected, s"A-law -seg=$s q=$q")
    }
    assert(mulawDecode(mulawEncode(32767)) == 32124) // spec extremes
    assert(alawDecode(alawEncode(32767)) == 32256)
  }

  test("G.711: full 16-bit sweep — sign, monotonicity, quantization bound") {
    var prevMu = Int.MinValue
    var prevA = Int.MinValue
    var x = -32768
    while (x <= 32767) {
      val mu = mulawDecode(mulawEncode(x))
      val al = alawDecode(alawEncode(x))
      // top mu-law segment interval is 8<<7 = 1024; A-law's is 16<<7 = 2048
      assert(math.abs(mu - x) < 1024, s"mu-law err at $x -> $mu")
      assert(math.abs(al - x) < 2048, s"A-law err at $x -> $al")
      // companding is monotone non-decreasing over the linear domain
      assert(mu >= prevMu, s"mu-law non-monotone at $x")
      assert(al >= prevA, s"A-law non-monotone at $x")
      prevMu = mu; prevA = al
      x += 1
    }
  }

  /** Decode `payload` through the JDK's OWN G.711 converter (javax.sound
    * FormatConversionProvider) via an AU container — a genuinely
    * independent implementation of the same ITU tables.
    */
  private def jdkG711Decode(payload: Array[Byte], alaw: Boolean): Array[Int] = {
    val au = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Unit =
      (3 to 0 by -1).foreach(i => au.write(((v >> (8 * i)) & 0xFF).toInt))
    au.write(".snd".getBytes("US-ASCII")); be32(24L)
    be32(payload.length.toLong); be32(if (alaw) 27L else 1L)
    be32(8000L); be32(1L)
    au.write(payload)
    val src = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(au.toByteArray))
    val target = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, true)
    val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, src)
    val raw = pcm.readAllBytes()
    pcm.close(); src.close()
    assert(raw.length == payload.length * 2, "JDK converter frame count")
    Array.tabulate(payload.length)(i =>
      ((raw(2 * i) << 8) | (raw(2 * i + 1) & 0xFF)))
  }

  test("G.711: the JDK's independent converter agrees on all 256 codes") {
    val allCodes = Array.tabulate(256)(_.toByte)
    val jdkMu = jdkG711Decode(allCodes, alaw = false)
    val jdkAl = jdkG711Decode(allCodes, alaw = true)
    for (c <- 0 until 256) {
      assert(jdkMu(c) == mulawDecode(c),
        s"mu-law code $c: jdk=${jdkMu(c)} ours=${mulawDecode(c)}")
      assert(jdkAl(c) == alawDecode(c),
        s"A-law code $c: jdk=${jdkAl(c)} ours=${alawDecode(c)}")
    }
  }

  // ---------------------------------------------------------------------
  // G.711 containers
  // ---------------------------------------------------------------------

  private def square(n: Int, p: Int, a: Int, ch: Int): Array[Short] = {
    val out = new Array[Short](n * ch)
    for (i <- 0 until n; c <- 0 until ch)
      out(i * ch + c) = (if ((i / p) % 2 == 0) a else -a).toShort
    out
  }

  test("G.711 WAV/AU containers decode to the exact codepoint amplitudes") {
    // amplitude = a mu-law codepoint value -> companding round-trips it
    val aMu = ((7 * 8 + 132) << 3) - 132 // e=3, m=7
    val aAl = (16 * 9 + 264) << 2 // seg=3, q=9
    for ((alaw, a) <- Seq((false, aMu), (true, aAl)); ch <- Seq(1, 2)) {
      val samples = square(400, 5, a, ch)
      for (blob <- Seq(MediaFixtures.wavG711(8000, ch, samples, alaw),
                       MediaFixtures.auG711(8000, ch, samples, alaw))) {
        assert(TelephonyAudio.isTelephony(blob))
        val pcm = TelephonyAudio.decode(blob)
        assert(pcm.sampleRate == 8000 && pcm.channels == ch)
        assert(pcm.samples.length == 400 * ch)
        assert(pcm.samples.forall(s => s == a || s == -a),
          s"alaw=$alaw ch=$ch: companding not exact on a codepoint")
        val stats = AudioFeatures.decodeStats(blob).get
        assert(stats.frames == 400 && stats.peak == a &&
          math.abs(stats.rms - a) < 1e-9 && stats.zeroCrossings == 399 / 5)
      }
    }
  }

  test("G.711 WAV parses in the JDK's RIFF reader with the ULAW encoding") {
    // container-level cross-check: the fixture must be a VALID WAV by an
    // independent parser, and its converted samples must equal ours
    val samples = square(300, 7, 1000, 1)
    val blob = MediaFixtures.wavG711(8000, 1, samples, alaw = false)
    val src = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(blob))
    assert(src.getFormat.getEncoding ==
      javax.sound.sampled.AudioFormat.Encoding.ULAW)
    val target = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, false)
    val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, src)
    val raw = pcm.readAllBytes()
    pcm.close(); src.close()
    val jdk = Array.tabulate(raw.length / 2)(i =>
      ((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xFF)))
    val ours = TelephonyAudio.decode(blob).samples
    assert(jdk.toSeq == ours.toSeq,
      "JDK WAV-ULAW conversion disagrees with the native decode")
  }

  // ---------------------------------------------------------------------
  // IMA ADPCM
  // ---------------------------------------------------------------------

  test("ADPCM step table: canonical anchors, length, monotone ~1.1 growth") {
    assert(AdpcmStepTable.length == 89)
    assert(AdpcmStepTable(0) == 7 && AdpcmStepTable(44) == 494 &&
      AdpcmStepTable(87) == 29794 && AdpcmStepTable(88) == 32767)
    for (i <- 1 until 89) {
      val ratio = AdpcmStepTable(i).toDouble / AdpcmStepTable(i - 1)
      assert(ratio > 1.0 && ratio <= 1.15, s"step ratio at $i: $ratio")
    }
  }

  private def noise(n: Int, seed: String, amp: Int): Array[Short] =
    Array.tabulate(n) { i =>
      (Dedup.md5Hash60(s"$seed$i") % (2 * amp + 1) - amp).toShort
    }

  test("ADPCM: decode(encode(x)) is deterministic and block-split invariant") {
    val samples = noise(3000, "adpcm", 3000)
    val d1 = TelephonyAudio.decode(
      MediaFixtures.wavImaAdpcm(8000, 1, samples, samplesPerBlock = 505))
    val d2 = TelephonyAudio.decode(
      MediaFixtures.wavImaAdpcm(8000, 1, samples, samplesPerBlock = 505))
    assert(d1.samples.toSeq == d2.samples.toSeq)
    assert(d1.samples.length == 3000)
    // different blocking: NOT identical samples (each block reseeds the
    // predictor) but the same signal within the adaptation error bound
    val d3 = TelephonyAudio.decode(
      MediaFixtures.wavImaAdpcm(8000, 1, samples, samplesPerBlock = 249))
    assert(d3.samples.length == 3000)
    var maxErr1 = 0; var maxErr3 = 0
    for (i <- samples.indices) {
      maxErr1 = math.max(maxErr1, math.abs(d1.samples(i) - samples(i)))
      maxErr3 = math.max(maxErr3, math.abs(d3.samples(i) - samples(i)))
    }
    // white noise is ADPCM's worst case (slope overload on every
    // sample): the error is bounded by the ADAPTED step, which noise
    // holds in the low thousands — assert the bound, not hi-fi tracking
    // (the slow-signal test below pins the tight regime)
    assert(maxErr1 < 8000 && maxErr3 < 8000,
      s"ADPCM tracking error out of band: $maxErr1 / $maxErr3")
  }

  test("ADPCM: a slowly-varying signal reconstructs tightly; stereo tracks per channel") {
    val n = 2000
    val slow = Array.tabulate(n)(i =>
      (2000 * math.sin(i / 50.0)).toInt.toShort)
    val mono = TelephonyAudio.decode(MediaFixtures.wavImaAdpcm(8000, 1, slow))
    var maxErr = 0
    for (i <- 0 until n)
      maxErr = math.max(maxErr, math.abs(mono.samples(i) - slow(i)))
    assert(maxErr <= 64, s"slow-signal error $maxErr")
    // stereo: L = slow, R = -slow; channels must not cross-pollute state
    val st = new Array[Short](2 * n)
    for (i <- 0 until n) { st(2 * i) = slow(i); st(2 * i + 1) = (-slow(i)).toShort }
    val pcm = TelephonyAudio.decode(MediaFixtures.wavImaAdpcm(8000, 2, st))
    assert(pcm.channels == 2 && pcm.samples.length == 2 * n)
    for (i <- 0 until n) {
      assert(math.abs(pcm.samples(2 * i) - slow(i)) <= 64, s"L at $i")
      assert(math.abs(pcm.samples(2 * i + 1) + slow(i)) <= 64, s"R at $i")
    }
  }

  test("ADPCM: partial final block honors the fact chunk exactly") {
    val samples = noise(505 + 123, "adpcm-partial", 2000) // 1 full + partial
    val blob = MediaFixtures.wavImaAdpcm(8000, 1, samples, samplesPerBlock = 505)
    val pcm = TelephonyAudio.decode(blob)
    assert(pcm.samples.length == 505 + 123,
      "padded tail must not leak past the fact frame count")
    val stats = AudioFeatures.decodeStats(blob).get
    assert(stats.frames == 505 + 123)
  }

  // ---------------------------------------------------------------------
  // Loud refusals + sniff boundaries
  // ---------------------------------------------------------------------

  test("structural damage refuses loudly, never wrong samples") {
    val samples = square(400, 5, 1000, 1)
    val g711 = MediaFixtures.wavG711(8000, 1, samples, alaw = false)
    val ima = MediaFixtures.wavImaAdpcm(8000, 1, samples)
    // truncated data chunk (declared length exceeds the blob)
    intercept[IllegalArgumentException] {
      TelephonyAudio.decode(java.util.Arrays.copyOf(g711, g711.length - 10))
    }
    intercept[IllegalArgumentException] {
      TelephonyAudio.decode(java.util.Arrays.copyOf(ima, ima.length - 10))
    }
    // ADPCM step index out of range in a block header: fixture layout is
    // fixed — RIFF hdr 12 + fmt (8+20) + fact (8+4) + data hdr 8, then
    // the first block's [pred lo, pred hi, index, reserved]
    val hdr = 12 + 28 + 12 + 8
    val badIdx = ima.clone()
    badIdx(hdr + 2) = 99.toByte
    val e = intercept[IllegalArgumentException] {
      TelephonyAudio.decode(badIdx)
    }
    assert(e.getMessage.contains("step index"))
    // a declared-telephony blob that fails structurally also fails the
    // FEATURE surface loudly (the FlacCodec contract), never None
    intercept[IllegalArgumentException] { AudioFeatures.decodeStats(badIdx) }
    // fact chunk inconsistent with the block count: claiming 7 frames
    // over a 6-block stream means 5 whole blocks of phantom padding —
    // refuse (a 7-frame fact over ONE padded block would be legitimate)
    val multi = MediaFixtures.wavImaAdpcm(8000, 1, noise(3000, "fact", 2000))
    val badFact = multi.clone()
    val factOff = 12 + 28 + 8 // first byte of the fact payload
    badFact(factOff) = 7.toByte
    badFact(factOff + 1) = 0; badFact(factOff + 2) = 0; badFact(factOff + 3) = 0
    intercept[IllegalArgumentException] { TelephonyAudio.decode(badFact) }
    // a corrupt 32-bit chunk length (top bit set: would wrap an Int
    // cursor negative) must leave the sniff TOTAL — no throw, no loop.
    // The poisoned chunk sits BEFORE any fmt, so the walk must step
    // over it to terminate
    val poison = new java.io.ByteArrayOutputStream()
    poison.write("RIFF".getBytes("US-ASCII"))
    poison.write(Array[Byte](36, 0, 0, 0))
    poison.write("WAVE".getBytes("US-ASCII"))
    poison.write("junk".getBytes("US-ASCII"))
    poison.write(Array[Byte](0, 0, 0, 0x80.toByte)) // len 0x80000000 LE
    poison.write(new Array[Byte](16))
    assert(!TelephonyAudio.isTelephony(poison.toByteArray))
    // AU with an encoding this module does not own is NOT telephony
    val auPcm = MediaFixtures.auPcm16(8000, 1, samples)
    assert(!TelephonyAudio.isTelephony(auPcm))
    // a plain PCM WAV is NOT telephony (it rides the javax path)
    assert(!TelephonyAudio.isTelephony(MediaFixtures.wavPcm16(8000, 1, samples)))
  }

  test("exhaustive single-byte corruption sweep: total, sane, loud-only") {
    // the CorruptionSweepSpec discipline on the telephony containers:
    // every position x all 256 values. sniff must stay TOTAL; decode on
    // a sniffed blob either returns structurally sane PCM or refuses
    // with IllegalArgumentException — never any other throwable
    val fixtures = Seq(
      "wavUlaw" -> MediaFixtures.wavG711(8000, 1, square(40, 5, 1000, 1), alaw = false),
      "wavAlaw" -> MediaFixtures.wavG711(8000, 2, square(20, 3, 500, 2), alaw = true),
      "auUlaw" -> MediaFixtures.auG711(8000, 1, square(40, 5, 1000, 1), alaw = false),
      "wavIma" -> MediaFixtures.wavImaAdpcm(8000, 1,
        noise(19, "sweep", 2000), samplesPerBlock = 9))
    var bad = List.empty[String]
    for ((name, f) <- fixtures; pos <- f.indices; v <- 0 to 255) {
      val b = f.clone(); b(pos) = v.toByte
      try {
        if (TelephonyAudio.isTelephony(b)) {
          val pcm = TelephonyAudio.decode(b)
          val sane = pcm.sampleRate > 0 && pcm.channels >= 1 &&
            pcm.samples.length % pcm.channels == 0 &&
            pcm.samples.forall(s => s >= -32768 && s <= 32767)
          if (!sane) bad ::= s"$name pos=$pos v=$v -> insane decode"
        }
      } catch {
        case _: IllegalArgumentException => // the loud contract
        case t: Throwable =>
          bad ::= s"$name pos=$pos v=$v -> threw ${t.getClass.getSimpleName}: ${t.getMessage}"
      }
    }
    assert(bad.isEmpty, s"${bad.size} violations, e.g.\n${bad.take(5).mkString("\n")}")
  }

  test("normalizeToWav converts telephony blobs; features survive the rewrap") {
    val a = ((5 * 8 + 132) << 2) - 132 // mu-law codepoint e=2, m=5
    val samples = square(300, 6, a, 2)
    for (blob <- Seq(MediaFixtures.wavG711(16000, 2, samples, alaw = false),
                     MediaFixtures.auG711(16000, 2, samples, alaw = false))) {
      val wav = AudioFeatures.normalizeBlobToWav(blob)
      assert(wav.take(4).toSeq == "RIFF".getBytes("US-ASCII").toSeq)
      // byte-deterministic: same input, same output
      assert(wav.toSeq == AudioFeatures.normalizeBlobToWav(blob).toSeq)
      val stats = AudioFeatures.decodeStats(wav).get // javax RIFF path
      assert(stats.sampleRate == 16000 && stats.channels == 2 &&
        stats.frames == 300 && stats.peak == a &&
        math.abs(stats.rms - a) < 1e-9)
    }
    // ADPCM normalizes too (decode is deterministic, rewrap exact)
    val ima = MediaFixtures.wavImaAdpcm(8000, 1, noise(1000, "norm", 2000))
    val wav = AudioFeatures.normalizeBlobToWav(ima)
    assert(AudioFeatures.decodeStats(wav).get.frames == 1000)
  }
}
