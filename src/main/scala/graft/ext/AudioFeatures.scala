package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] REAL PCM sample decode for the audio containers the JDK ships
  * readers for (WAV/AIFF/AU) plus native FLAC ([[FlacCodec]], r18) and
  * native G.711 mu-law/A-law + IMA ADPCM ([[TelephonyAudio]], r18) —
  * the sample-level counterpart of [[Multimodal]]'s header-only
  * `audioMeta`. With this, "sample decode is a stub" is true only of
  * the TABLE-DRIVEN lossy codecs (MP3/AAC/Opus/Vorbis — Huffman/window
  * lookup data the spec ships as tables, unreproducible offline);
  * uncompressed, losslessly-compressed, and companded/ADPCM corpora
  * all get real waveform features.
  *
  * One streaming pass per blob computes the features an audio curation
  * pipeline filters on: duration (decoded frame count — counted from the
  * samples, never trusted from the header), RMS energy, peak amplitude,
  * and zero-crossing count of the channel-mixed signal. All integer/
  * exact arithmetic up to the final RMS square root, so fixtures with
  * closed-form waveforms (square waves) oracle the whole container
  * parse + sample decode + feature fold end to end.
  *
  * Scale story: a per-row scalar pass — zero shuffle, O(64 KiB) decode
  * buffer per task regardless of blob size; the scan parallelism is the
  * feature-extraction parallelism.
  */
object AudioFeatures {

  final case class AudioStats(sampleRate: Int, channels: Int, frames: Long,
                              rms: Double, peak: Int, zeroCrossings: Long)

  /** Decode 16-bit signed PCM (either endianness — WAV is LE, AIFF/AU are
    * BE) and fold the features in one pass. Channels mix to mono by
    * integer mean (truncation toward zero, exact when channels carry the
    * same signal). Zero-crossing convention: a crossing is a strict SIGN
    * CHANGE of the mixed signal with exact zeros transparent — the run
    * `+A, 0, -A` is one crossing, leading zeros precede no sign and never
    * count (AudioFeaturesSpec pins both edges). Returns None for
    * containers javax.sound cannot parse or sample widths other than
    * 16-bit signed PCM (8-bit, float, and compressed payloads are not
    * silently approximated).
    *
    * FLAC payloads (sniffed on the fLaC magic) decode through the native
    * [[FlacCodec]] and fold the SAME features over the same convention.
    * Unlike the javax.sound fallbacks, a damaged or out-of-subset FLAC
    * refuses LOUDLY (the decoder throws) — a file that declares itself
    * FLAC and fails to decode is a data defect, not an unknown format.
    * Telephony payloads (WAV format tags 6/7/0x11, AU encodings 1/27 —
    * G.711 mu-law/A-law and IMA ADPCM) decode through the native
    * [[TelephonyAudio]] codecs under the same loud contract.
    */
  def decodeStats(bytes: Array[Byte]): Option[AudioStats] =
    if (FlacCodec.isFlac(bytes)) {
      val pcm = FlacCodec.decode(bytes)
      Some(foldStats(pcm.sampleRate, pcm.channels, pcm.samples))
    } else if (TelephonyAudio.isTelephony(bytes)) {
      val pcm = TelephonyAudio.decode(bytes)
      Some(foldStats(pcm.sampleRate, pcm.channels, pcm.samples))
    } else decodeJavaSound(bytes)

  /** The shared feature fold over interleaved integer samples — the
    * exact conventions of the streaming WAV path (integer channel mean,
    * sign-change crossings with transparent zeros).
    */
  private def foldStats(rate: Int, ch: Int, samples: Array[Int]): AudioStats = {
    val frames = samples.length / ch
    var sumSq = 0.0
    var peak = 0L
    var crossings = 0L
    var prev = 0L
    var first = true
    var i = 0
    while (i < frames) {
      // Long arithmetic throughout: FLAC samples may be 32-bit, where an
      // Int channel sum (up to 8 x 2^31) and abs(Int.MinValue) both wrap
      var sum = 0L
      var c = 0
      while (c < ch) { sum += samples(i * ch + c); c += 1 }
      val mix = sum / ch
      sumSq += mix.toDouble * mix
      val abs = math.abs(mix)
      if (abs > peak) peak = abs
      if (!first && prev * mix < 0) crossings += 1
      if (mix != 0) { prev = mix; first = false }
      i += 1
    }
    require(peak <= Int.MaxValue,
      s"peak amplitude $peak exceeds the 32-bit stats contract")
    val rms = if (frames == 0) 0.0 else math.sqrt(sumSq / frames)
    AudioStats(rate, ch, frames.toLong, rms, peak.toInt, crossings)
  }

  private def decodeJavaSound(bytes: Array[Byte]): Option[AudioStats] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        val ok = f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          f.getSampleSizeInBits == 16 && f.getChannels >= 1 &&
          f.getSampleRate > 0 && f.getFrameSize == 2 * f.getChannels
        if (!ok) None
        else {
          val ch = f.getChannels
          val frameSize = f.getFrameSize
          val big = f.isBigEndian
          val buf = new Array[Byte](frameSize * 1024)
          var carry = 0 // bytes of a partial frame held at buf start
          var frames = 0L
          var sumSq = 0.0
          var peak = 0
          var crossings = 0L
          var prev = 0 // last mixed sample (0 until the first frame)
          var first = true
          var eof = false
          while (!eof) {
            val n = in.read(buf, carry, buf.length - carry)
            if (n < 0) eof = true
            else {
              val avail = carry + n
              val whole = (avail / frameSize) * frameSize
              var off = 0
              while (off < whole) {
                var sum = 0
                var c = 0
                while (c < ch) {
                  val i = off + 2 * c
                  val s =
                    if (big) (buf(i) << 8) | (buf(i + 1) & 0xFF)
                    else (buf(i + 1) << 8) | (buf(i) & 0xFF)
                  sum += s
                  c += 1
                }
                val mix = sum / ch
                sumSq += mix.toDouble * mix
                val abs = math.abs(mix)
                if (abs > peak) peak = abs
                if (!first && prev * mix < 0) crossings += 1
                if (mix != 0) { prev = mix; first = false }
                frames += 1
                off += frameSize
              }
              carry = avail - whole
              if (carry > 0) System.arraycopy(buf, whole, buf, 0, carry)
            }
          }
          val rms = if (frames == 0) 0.0 else math.sqrt(sumSq / frames)
          Some(AudioStats(math.round(f.getSampleRate), ch, frames, rms,
            peak, crossings))
        }
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException                               => None
    }

  /** Normalize one audio blob to 16-bit little-endian PCM WAV — the
    * per-row kernel of [[normalizeToWav]]:
    *
    *  - WAV passes through BYTE-IDENTICAL (already the target container;
    *    re-encoding would only risk churn);
    *  - FLAC decodes through the native [[FlacCodec]] and re-wraps
    *    (16-bit subset; other widths refuse loudly — silently rescaling
    *    sample depth is a data corruption, not a convenience);
    *  - AIFF/AU re-container through the javax.sound stream (the
    *    endianness flip is the whole conversion);
    *  - anything else refuses loudly (the [[Multimodal.decodeHeader]]
    *    plug-point idiom: lossy codecs need a production decoder
    *    plugged in, and a non-audio blob in an audio column is a
    *    pipeline defect).
    *
    * Deterministic: the same input bytes produce the same output bytes
    * on any JVM, so a normalized corpus is content-addressable and a
    * replayed batch rewrites identical blobs.
    */
  def normalizeBlobToWav(bytes: Array[Byte]): Array[Byte] = {
    if (TelephonyAudio.isTelephony(bytes)) {
      // G.711 / IMA ADPCM (WAV tags 6/7/0x11, AU encodings 1/27):
      // decode natively and rewrap — the sniff runs BEFORE the RIFF
      // passthrough because a G.711 WAV is a RIFF that must convert,
      // not pass through. Decoded magnitudes fit 16 bits by codec
      // construction (G.711 max 32256, ADPCM clamps to short).
      val pcm = TelephonyAudio.decode(bytes)
      return MediaFixtures.wavPcm16(pcm.sampleRate, pcm.channels,
        pcm.samples.map(_.toShort))
    }
    if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == 'F') {
      // VALIDATED passthrough: the target container, but only after the
      // javax parse proves it is 16-bit PCM WAV — 'RIFF' alone also
      // opens WEBP/AVI/float-WAV, which must refuse, not ride through
      // a "normalized" corpus
      val in =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException =>
            throw new IllegalArgumentException(
              "normalizeToWav: RIFF payload is not a parseable WAV " +
                "(WEBP/AVI and friends share the magic)")
        }
      try {
        val f = in.getFormat
        require(f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          f.getSampleSizeInBits == 16 && !f.isBigEndian,
          s"normalizeToWav: only 16-bit signed PCM WAV passes through (got $f)")
      } finally in.close()
      return bytes
    }
    if (FlacCodec.isFlac(bytes)) {
      val pcm = FlacCodec.decode(bytes)
      require(pcm.bitsPerSample == 16,
        s"normalizeToWav: ${pcm.bitsPerSample}-bit FLAC is outside the " +
          "16-bit normalization subset — rescaling sample depth is not " +
          "done silently")
      return MediaFixtures.wavPcm16(pcm.sampleRate, pcm.channels,
        pcm.samples.map(_.toShort))
    }
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException(
            s"normalizeToWav: ${bytes.length}-byte payload is not WAV, " +
              "FLAC, or a JDK-decodable PCM container (AIFF/AU); lossy " +
              "codecs need a production decoder plugged in at this " +
              "boundary")
      }
    try {
      val f = in.getFormat
      require(f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        f.getSampleSizeInBits == 16 && f.getFrameSize == 2 * f.getChannels,
        s"normalizeToWav: only 16-bit signed PCM converts (got $f)")
      val raw = in.readAllBytes()
      val ch = f.getChannels
      val n = raw.length / 2
      val samples = new Array[Short](n)
      var i = 0
      if (f.isBigEndian)
        while (i < n) {
          samples(i) = (((raw(2 * i) << 8) | (raw(2 * i + 1) & 0xFF))).toShort
          i += 1
        }
      else
        while (i < n) {
          samples(i) = (((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xFF))).toShort
          i += 1
        }
      MediaFixtures.wavPcm16(math.round(f.getSampleRate), ch, samples)
    } finally in.close()
  }

  /** Corpus-wide audio normalization: every blob of a (`media_id`,
    * `content`) frame rewritten as 16-bit LE PCM WAV (see
    * [[normalizeBlobToWav]] for the per-format contract) — the
    * "one container for the training loader" pass that turns a crawl's
    * mixed WAV/FLAC/AIFF/AU holdings into a uniform corpus. Zero
    * shuffle, per-row scalar work; undecodable rows FAIL the job (a
    * normalization that silently drops rows ships a smaller corpus
    * than it was asked to).
    */
  def normalizeToWav(media: DataFrame, idCol: String = "media_id",
                     contentCol: String = "content"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(contentCol))
      .filter(col(idCol).isNotNull && col(contentCol).isNotNull)
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) => (id, normalizeBlobToWav(bytes)) }
      .toDF(idCol, contentCol)
  }

  /** Per-blob waveform features over a (`media_id`, `content` binary)
    * frame: (media_id, sample_rate, channels, frames, rms, peak,
    * zero_crossings). Per-row isolation for UNKNOWN formats —
    * containers javax.sound cannot parse drop, same contract as
    * [[Multimodal.decodeMeta]] — but a blob that DECLARES itself FLAC
    * (fLaC magic) and fails to decode fails the JOB loudly (see
    * [[decodeStats]]): a self-identified-but-corrupt file is a data
    * defect to surface, not an unknown format to skip.
    */
  def audioFeatures(media: DataFrame, idCol: String = "media_id",
                    contentCol: String = "content"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(contentCol))
      .filter(col(idCol).isNotNull && col(contentCol).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeStats(bytes) match {
            case Some(s) => Iterator.single((id, s.sampleRate, s.channels,
              s.frames, s.rms, s.peak, s.zeroCrossings))
            case None => Iterator.empty
          }
        }
      }
      .toDF("media_id", "sample_rate", "channels", "frames", "rms", "peak",
        "zero_crossings")
  }
}
