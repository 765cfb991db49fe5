package graft.ext

/** [EXT] Sample decode for the COMPANDED/ADPCM audio codecs whose specs
  * are fully closed-form — ITU-T G.711 mu-law and A-law (the telephony
  * standard every call-center / speech corpus ships in) and IMA ADPCM
  * (RIFF format tag 0x11; the RFC 3551 "DVI4" codec) — carried in the
  * two containers that hold them in practice: RIFF/WAVE (format tags
  * 0x0006 A-law, 0x0007 mu-law, 0x0011 IMA ADPCM) and Sun AU
  * (encodings 1 mu-law, 27 A-law).
  *
  * This closes another slice of the compressed-sample plug point
  * (reference boundary: media is opaque blobs + typed metadata,
  * `services/parser/src/storage/minio.py:38-59`): after FLAC (r18,
  * [[FlacCodec]]) covered lossless compression, G.711/ADPCM cover the
  * table-free lossy codecs. What remains stubbed is exactly the codec
  * family whose specs are LOOKUP DATA (MP3/AAC/Vorbis Huffman + window
  * tables) — unreproducible offline, where a wrong-table decoder would
  * silently corrupt samples; those still refuse loudly.
  *
  * Correctness story: G.711 decode is pure segment algebra
  * (mu-law `((m*8+132) << e) - 132`, A-law `seg==0 ? 16q+8 :
  * (16q+264) << (seg-1)`), so fixtures built on exact codepoint
  * amplitudes oracle bit-exactly in SQL; and the JDK ships its OWN
  * independent G.711 converters (javax.sound ULAW/ALAW), which
  * `TelephonyAudioSpec` sweeps against ours over the entire 256-point
  * code domain — a true cross-implementation proof. IMA ADPCM is
  * encoder+decoder mirrored state (both here), block-split invariant,
  * with the canonical 89-step table pinned by structural anchors.
  *
  * Scale story: per-row scalar decode, zero shuffle — the scan
  * parallelism is the decode parallelism, same as [[FlacCodec]].
  */
object TelephonyAudio {

  final case class TelephonyPcm(sampleRate: Int, channels: Int,
                                samples: Array[Int])

  // ---------------------------------------------------------------------
  // G.711 mu-law (ITU-T G.711 Table 2a/2b segment layout)
  // ---------------------------------------------------------------------

  private val UlawBias = 0x84 // 132: folds the segment origin into the log
  private val UlawClip = 32635 // largest magnitude the top segment encodes

  /** 16-bit linear -> one mu-law byte. Truncating quantizer: exact on
    * every decoder output (encode(decode(c)) == c for all 256 c — the
    * fixed-point property TelephonyAudioSpec sweeps).
    */
  def mulawEncode(pcmIn: Int): Int = {
    var pcm = pcmIn
    var sign = 0
    if (pcm < 0) { sign = 0x80; pcm = -pcm }
    if (pcm > UlawClip) pcm = UlawClip
    pcm += UlawBias
    var exponent = 7
    var mask = 0x4000
    while (exponent > 0 && (pcm & mask) == 0) { exponent -= 1; mask >>= 1 }
    val mantissa = (pcm >> (exponent + 3)) & 0x0F
    (~(sign | (exponent << 4) | mantissa)) & 0xFF
  }

  /** One mu-law byte -> 16-bit linear: `((m*8 + 132) << e) - 132`,
    * negated on the sign bit. Max magnitude 32124.
    */
  def mulawDecode(codeIn: Int): Int = {
    val code = (~codeIn) & 0xFF
    val exponent = (code >> 4) & 0x07
    val mantissa = code & 0x0F
    val magnitude = (((mantissa << 3) + UlawBias) << exponent) - UlawBias
    if ((code & 0x80) != 0) -magnitude else magnitude
  }

  // ---------------------------------------------------------------------
  // G.711 A-law (13-bit magnitude, alternate-bit inversion 0x55)
  // ---------------------------------------------------------------------

  /** 16-bit linear -> one A-law byte (input folded to 13-bit per the
    * spec; the low 3 bits never reach the wire in A-law).
    */
  def alawEncode(pcmIn: Int): Int = {
    var pcm = pcmIn >> 3
    var mask = 0xD5
    if (pcm < 0) { mask = 0x55; pcm = -pcm - 1 }
    // segment = position of the magnitude's top bit above the 5-bit floor
    var seg = 0
    while (seg < 8 && pcm > ((0x1F << seg) | ((1 << seg) - 1))) seg += 1
    if (seg >= 8) (0x7F ^ mask) & 0xFF
    else {
      val quant =
        if (seg < 2) (pcm >> 1) & 0x0F
        else (pcm >> seg) & 0x0F
      (((seg << 4) | quant) ^ mask) & 0xFF
    }
  }

  /** One A-law byte -> 16-bit linear: `seg==0 ? 16q+8 : (16q+264) <<
    * (seg-1)`, negated when the (de-inverted) sign bit is clear. Max
    * magnitude 32256.
    */
  def alawDecode(codeIn: Int): Int = {
    val code = (codeIn ^ 0x55) & 0xFF
    val quant = code & 0x0F
    val seg = (code >> 4) & 0x07
    val t =
      if (seg == 0) (quant << 4) + 8
      else ((quant << 4) + 0x108) << (seg - 1)
    if ((code & 0x80) != 0) t else -t
  }

  // ---------------------------------------------------------------------
  // IMA ADPCM (RIFF tag 0x11 / RFC 3551 DVI4): 4-bit adaptive delta
  // ---------------------------------------------------------------------

  /** The canonical 89-entry IMA step table (monotone ~1.1x growth from 7
    * to 32767; anchors pinned in TelephonyAudioSpec). Encoder and decoder
    * share it, so our roundtrip never depends on any external table copy.
    */
  val AdpcmStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private val AdpcmIndexAdjust: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** Mutable per-channel codec state; encoder and decoder run the SAME
    * update so their states stay mirrored bit for bit.
    */
  final class AdpcmState(var pred: Int, var index: Int) {
    require(index >= 0 && index <= 88,
      s"IMA ADPCM step index $index outside [0, 88]")
  }

  /** Decode one 4-bit nibble against `st`, returning the reconstructed
    * sample and advancing the state (the spec's mul-free expansion:
    * diff = step/8 + b0*step/4 + b1*step/2 + b2*step, sign on b3).
    */
  def adpcmDecodeNibble(nibble: Int, st: AdpcmState): Int = {
    val step = AdpcmStepTable(st.index)
    var diff = step >> 3
    if ((nibble & 1) != 0) diff += step >> 2
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 4) != 0) diff += step
    if ((nibble & 8) != 0) diff = -diff
    var pred = st.pred + diff
    if (pred > 32767) pred = 32767 else if (pred < -32768) pred = -32768
    var idx = st.index + AdpcmIndexAdjust(nibble & 0x7)
    if (idx < 0) idx = 0 else if (idx > 88) idx = 88
    st.pred = pred
    st.index = idx
    pred
  }

  /** Encode one sample against `st` -> the nibble whose DECODE the state
    * then replays (mirrored-state discipline: the encoder's predictor is
    * always the decoder's reconstruction, never the clean input).
    */
  def adpcmEncodeNibble(sample: Int, st: AdpcmState): Int = {
    val step = AdpcmStepTable(st.index)
    var diff = sample - st.pred
    var nibble = 0
    if (diff < 0) { nibble = 8; diff = -diff }
    if (diff >= step) { nibble |= 4; diff -= step }
    if (diff >= (step >> 1)) { nibble |= 2; diff -= step >> 1 }
    if (diff >= (step >> 2)) { nibble |= 1 }
    adpcmDecodeNibble(nibble, st)
    nibble
  }

  // ---------------------------------------------------------------------
  // Container decode: RIFF/WAVE tags 6 / 7 / 0x11, AU encodings 1 / 27
  // ---------------------------------------------------------------------

  private def u16le(b: Array[Byte], at: Int): Int =
    (b(at) & 0xFF) | ((b(at + 1) & 0xFF) << 8)
  private def s16le(b: Array[Byte], at: Int): Int = u16le(b, at).toShort.toInt
  private def u32le(b: Array[Byte], at: Int): Long =
    (u16le(b, at) & 0xFFFFL) | ((u16le(b, at + 2) & 0xFFFFL) << 16)
  private def u32be(b: Array[Byte], at: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 4) { v = (v << 8) | (b(at + i) & 0xFF); i += 1 }
    v
  }
  private def magic(b: Array[Byte], at: Int, s: String): Boolean =
    b.length >= at + s.length && s.indices.forall(i => b(at + i) == s.charAt(i))

  private final case class WavLayout(fmtTag: Int, channels: Int, rate: Int,
                                     blockAlign: Int, bits: Int,
                                     samplesPerBlock: Int,
                                     factFrames: Long,
                                     dataOff: Int, dataLen: Int)

  /** Walk a RIFF/WAVE chunk list far enough to know the format tag and
    * locate data — tolerant of extra chunks (LIST/fact), loud on a
    * structurally-broken file that DECLARED a telephony tag.
    */
  private def wavLayout(b: Array[Byte]): Option[WavLayout] = {
    if (!(magic(b, 0, "RIFF") && b.length >= 12 && magic(b, 8, "WAVE")))
      return None
    // Long cursor: a corrupt 32-bit chunk length must neither wrap the
    // walk backwards nor index out of bounds (sniff shares this walk and
    // must stay total on arbitrary RIFF blobs)
    var atL = 12L
    var fmtTag = -1
    var channels = 0
    var rate = 0
    var blockAlign = 0
    var bits = 0
    var spb = 0
    var factFrames = -1L
    var dataOff = -1
    var dataLen = -1
    while (atL + 8 <= b.length) {
      val at = atL.toInt
      val id = new String(b, at, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val len = u32le(b, at + 4)
      val body = at + 8
      if (id == "fmt " && len >= 16 && body + 16 <= b.length) {
        fmtTag = u16le(b, body)
        channels = u16le(b, body + 2)
        rate = u32le(b, body + 4).toInt
        blockAlign = u16le(b, body + 12)
        bits = u16le(b, body + 14)
        // the 0x11 extension carries wSamplesPerBlock after cbSize
        if (len >= 20 && body + 20 <= b.length && u16le(b, body + 16) >= 2)
          spb = u16le(b, body + 18)
      } else if (id == "fact" && len >= 4 && body + 4 <= b.length) {
        factFrames = u32le(b, body)
      } else if (id == "data") {
        dataOff = body
        dataLen = math.min(len, (b.length - body).toLong).toInt
        if (len > b.length - body)
          throw new IllegalArgumentException(
            s"telephony WAV: data chunk declares $len bytes but only " +
              s"${b.length - body} remain — truncated blob")
      }
      atL = body.toLong + len + (len & 1L) // chunks are word-aligned
    }
    if (fmtTag < 0 || dataOff < 0) None
    else Some(WavLayout(fmtTag, channels, rate, blockAlign, bits, spb,
      factFrames, dataOff, dataLen))
  }

  /** Is this blob one of the telephony shapes this module decodes?
    * Cheap header sniff — never throws, never reads sample data.
    */
  def isTelephony(bytes: Array[Byte]): Boolean = sniff(bytes).isDefined

  /** "wav-ulaw" | "wav-alaw" | "wav-ima" | "au-ulaw" | "au-alaw". */
  def sniff(bytes: Array[Byte]): Option[String] = {
    if (magic(bytes, 0, "RIFF") && bytes.length >= 12 &&
        magic(bytes, 8, "WAVE")) {
      // fmt tag only — full layout parse deferred to decode(). Long
      // cursor: sniff must stay total on arbitrary corrupt RIFF blobs
      var at = 12L
      while (at + 8 <= bytes.length) {
        val a = at.toInt
        if (magic(bytes, a, "fmt ") && a + 10 <= bytes.length) {
          return u16le(bytes, a + 8) match {
            case 0x0006 => Some("wav-alaw")
            case 0x0007 => Some("wav-ulaw")
            case 0x0011 => Some("wav-ima")
            case _      => None
          }
        }
        val len = u32le(bytes, a + 4)
        at += 8L + len + (len & 1L)
      }
      None
    } else if (magic(bytes, 0, ".snd") && bytes.length >= 24) {
      u32be(bytes, 12) match {
        case 1L  => Some("au-ulaw")
        case 27L => Some("au-alaw")
        case _   => None
      }
    } else None
  }

  /** Decode a telephony blob to interleaved linear PCM. LOUD contract
    * (the [[FlacCodec]] idiom): a blob that declares a telephony format
    * tag and fails structurally is a data defect — throw, never guess.
    * Call only after [[isTelephony]] (or [[sniff]]) says yes.
    */
  def decode(bytes: Array[Byte]): TelephonyPcm = sniff(bytes) match {
    case Some("wav-ulaw") => decodeWavG711(bytes, alaw = false)
    case Some("wav-alaw") => decodeWavG711(bytes, alaw = true)
    case Some("wav-ima")  => decodeWavIma(bytes)
    case Some("au-ulaw")  => decodeAuG711(bytes, alaw = false)
    case Some("au-alaw")  => decodeAuG711(bytes, alaw = true)
    case other => throw new IllegalArgumentException(
      s"not a telephony blob (sniff=$other) — decode() is only defined " +
        "for WAV tags 6/7/0x11 and AU encodings 1/27")
  }

  private def decodeWavG711(b: Array[Byte], alaw: Boolean): TelephonyPcm = {
    val l = wavLayout(b).getOrElse(throw new IllegalArgumentException(
      "telephony WAV: fmt/data chunks missing"))
    require(l.bits == 8 && l.channels >= 1 && l.rate > 0 &&
      l.blockAlign == l.channels,
      s"G.711 WAV must be 8-bit with blockAlign==channels (got bits=" +
        s"${l.bits} ch=${l.channels} align=${l.blockAlign})")
    val n = (l.dataLen / l.channels) * l.channels
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val c = b(l.dataOff + i) & 0xFF
      out(i) = if (alaw) alawDecode(c) else mulawDecode(c)
      i += 1
    }
    TelephonyPcm(l.rate, l.channels, out)
  }

  private def decodeAuG711(b: Array[Byte], alaw: Boolean): TelephonyPcm = {
    val off = u32be(b, 4).toInt
    val declared = u32be(b, 8)
    val rate = u32be(b, 16).toInt
    val channels = u32be(b, 20).toInt
    require(off >= 24 && off <= b.length && rate > 0 && channels >= 1,
      s"AU header out of range: offset=$off rate=$rate channels=$channels")
    val avail = b.length - off
    // 0xFFFFFFFF means "unknown length" in AU; otherwise honor it
    val len0 = if (declared == 0xFFFFFFFFL) avail.toLong else declared
    require(len0 <= avail,
      s"AU: declared $len0 data bytes but only $avail present — truncated")
    val n = (len0.toInt / channels) * channels
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val c = b(off + i) & 0xFF
      out(i) = if (alaw) alawDecode(c) else mulawDecode(c)
      i += 1
    }
    TelephonyPcm(rate, channels, out)
  }

  private def decodeWavIma(b: Array[Byte]): TelephonyPcm = {
    val l = wavLayout(b).getOrElse(throw new IllegalArgumentException(
      "telephony WAV: fmt/data chunks missing"))
    val ch = l.channels
    require(l.bits == 4 && ch >= 1 && l.rate > 0,
      s"IMA ADPCM WAV must be 4-bit (got bits=${l.bits} ch=$ch)")
    require(l.blockAlign > 4 * ch && (l.blockAlign - 4 * ch) % (4 * ch) == 0,
      s"IMA ADPCM blockAlign ${l.blockAlign} is not header + whole " +
        s"4-byte nibble words per channel (ch=$ch)")
    val spbFromAlign = 1 + (l.blockAlign - 4 * ch) * 2 / ch
    val spb = if (l.samplesPerBlock > 0) l.samplesPerBlock else spbFromAlign
    require(spb == spbFromAlign,
      s"IMA ADPCM wSamplesPerBlock=$spb disagrees with blockAlign-derived " +
        s"$spbFromAlign — corrupt fmt extension")
    require(l.dataLen % l.blockAlign == 0,
      s"IMA ADPCM data length ${l.dataLen} is not whole ${l.blockAlign}-" +
        "byte blocks — truncated blob")
    val nBlocks = l.dataLen / l.blockAlign
    val totalDecodable = nBlocks.toLong * spb
    // single-JVM array bound: a multi-GB blob whose frame count exceeds
    // Int range must refuse loudly, not wrap toInt into a negative
    // allocation (the sane-PCM-or-IAE contract)
    require(totalDecodable * ch <= Int.MaxValue,
      s"IMA ADPCM blob decodes to $totalDecodable frames x $ch channels — " +
        "beyond the per-blob array bound; split the recording upstream")
    val frames =
      if (l.factFrames >= 0) {
        require(l.factFrames <= totalDecodable &&
          l.factFrames > totalDecodable - spb,
          s"IMA ADPCM fact chunk claims ${l.factFrames} frames but the " +
            s"data holds $totalDecodable (${nBlocks} blocks x $spb)")
        l.factFrames.toInt
      } else totalDecodable.toInt
    val out = new Array[Int](frames * ch)
    val states = new Array[AdpcmState](ch)
    var blk = 0
    while (blk < nBlocks) {
      val base = l.dataOff + blk * l.blockAlign
      val blockStart = blk * spb // first frame index of this block
      var c = 0
      while (c < ch) {
        val h = base + 4 * c
        val pred = s16le(b, h)
        val idx = b(h + 2) & 0xFF
        require(idx <= 88,
          s"IMA ADPCM block $blk channel $c: step index $idx > 88")
        require((b(h + 3) & 0xFF) == 0,
          s"IMA ADPCM block $blk channel $c: reserved header byte nonzero")
        states(c) = new AdpcmState(pred, idx)
        if (blockStart < frames) out(blockStart * ch + c) = pred
        c += 1
      }
      // nibble payload: alternating 4-byte words per channel, 8 samples
      // per word, low nibble first
      val words = (l.blockAlign - 4 * ch) / (4 * ch)
      var w = 0
      while (w < words) {
        var cc = 0
        while (cc < ch) {
          val wOff = base + 4 * ch + (w * ch + cc) * 4
          var k = 0
          while (k < 4) {
            val byte = b(wOff + k) & 0xFF
            val f1 = blockStart + 1 + w * 8 + k * 2
            val s1 = adpcmDecodeNibble(byte & 0x0F, states(cc))
            if (f1 < frames) out(f1 * ch + cc) = s1
            val s2 = adpcmDecodeNibble((byte >> 4) & 0x0F, states(cc))
            if (f1 + 1 < frames) out((f1 + 1) * ch + cc) = s2
            k += 1
          }
          cc += 1
        }
        w += 1
      }
      blk += 1
    }
    TelephonyPcm(l.rate, ch, out)
  }

  // ---------------------------------------------------------------------
  // Encoders (fixture/production write path)
  // ---------------------------------------------------------------------

  /** Interleaved linear PCM -> G.711 payload bytes (no container). */
  def g711EncodePayload(samples: Array[Int], alaw: Boolean): Array[Byte] = {
    val out = new Array[Byte](samples.length)
    var i = 0
    while (i < samples.length) {
      out(i) = (if (alaw) alawEncode(samples(i))
                else mulawEncode(samples(i))).toByte
      i += 1
    }
    out
  }

  /** Interleaved linear PCM -> IMA ADPCM blocks (WAV tag 0x11 layout).
    * Returns (blocks, blockAlign, samplesPerBlock); the final partial
    * block is zero-padded in the nibble domain (the fact chunk records
    * the true frame count).
    */
  def adpcmEncodeBlocks(samples: Array[Int], channels: Int,
                        samplesPerBlock: Int): (Array[Byte], Int, Int) = {
    require(channels >= 1 && samples.length % channels == 0,
      s"interleave error: ${samples.length} samples over $channels channels")
    require(samplesPerBlock >= 9 && (samplesPerBlock - 1) % 8 == 0,
      s"samplesPerBlock $samplesPerBlock must be 1 + 8*w for whole " +
        "4-byte nibble words")
    val frames = samples.length / channels
    val words = (samplesPerBlock - 1) / 8
    val blockAlign = 4 * channels + words * 4 * channels
    val nBlocks = (frames + samplesPerBlock - 1) / samplesPerBlock
    val out = new Array[Byte](nBlocks * blockAlign)
    val states = new Array[AdpcmState](channels)
    var blk = 0
    while (blk < nBlocks) {
      val base = blk * blockAlign
      val blockStart = blk * samplesPerBlock
      var c = 0
      while (c < channels) {
        // block header: predictor seeds from the block's first frame
        // (decoder emits it verbatim), step index carries across blocks
        val seed =
          if (blockStart < frames) samples(blockStart * channels + c) else 0
        val idx = if (blk == 0) 0 else states(c).index
        states(c) = new AdpcmState(seed, idx)
        val h = base + 4 * c
        out(h) = (seed & 0xFF).toByte
        out(h + 1) = ((seed >> 8) & 0xFF).toByte
        out(h + 2) = idx.toByte
        out(h + 3) = 0
        c += 1
      }
      var w = 0
      while (w < words) {
        var cc = 0
        while (cc < channels) {
          val wOff = base + 4 * channels + (w * channels + cc) * 4
          var k = 0
          while (k < 4) {
            val f1 = blockStart + 1 + w * 8 + k * 2
            val n1 = if (f1 < frames)
              adpcmEncodeNibble(samples(f1 * channels + cc), states(cc))
            else adpcmEncodeNibble(states(cc).pred, states(cc))
            val f2 = f1 + 1
            val n2 = if (f2 < frames)
              adpcmEncodeNibble(samples(f2 * channels + cc), states(cc))
            else adpcmEncodeNibble(states(cc).pred, states(cc))
            out(wOff + k) = ((n2 << 4) | n1).toByte
            k += 1
          }
          cc += 1
        }
        w += 1
      }
      blk += 1
    }
    (out, blockAlign, samplesPerBlock)
  }
}
