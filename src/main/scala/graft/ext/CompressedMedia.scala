package graft.ext

/** [EXT] Pure-JVM header parsers for COMPRESSED media containers — the
  * formats the JDK ships no SPI for (MP3, ADTS-AAC, FLAC, Ogg
  * Vorbis/Opus, MP4/M4A). Metadata extraction (sample rate, channels,
  * dimensions, frame counts, payload sizes) needs only the publicly
  * documented container headers, not a codec: every parser here reads a
  * bounded number of header bytes and never touches the encoded samples,
  * the same cost profile as [[Multimodal.imageDims]] — so metadata over a
  * 100 TB media corpus costs header bytes per row, zero shuffle.
  *
  * Reference behavior parity: the reference treats media as opaque blobs
  * with typed metadata rows (services/parser/src/engine/pdf_parser.py
  * emits element metadata the same way); only pixel/sample DECODE remains
  * the declared plug point ([[Multimodal.decodeHeader]]'s error text).
  *
  * Field mapping into [[Multimodal.MediaMeta]] (same convention as
  * `audioMeta`): audio → width = sample rate in Hz, height = channel
  * count, fps = 0; video (MP4 with a `vide` track) → real pixel width/
  * height from `tkhd`, fps derived from `stts`×`mdhd`. `payloadBytes` =
  * raw-PCM-equivalent size when the header declares enough (FLAC), the
  * `mdat` payload (MP4), or the encoded stream length past any leading
  * tag (MP3/ADTS/Ogg).
  *
  * Every parser is defensive: any malformed, truncated, or unrecognized
  * structure returns None (never throws), so [[Multimodal.decodeHeader]]
  * falls through to its loud plug-point error instead of silently
  * mis-decoding.
  */
object CompressedMedia {
  import Multimodal.MediaMeta

  /** Magic-dispatch entry: cheap leading-byte compares only — callers may
    * run this before any SPI sniff at ~zero cost for non-matching rows.
    */
  def meta(bytes: Array[Byte]): Option[MediaMeta] =
    try {
      // each parser bounds-checks its own minimum; 4 bytes is just the
      // shortest magic (an ADTS frame with a tiny payload is 7+n bytes)
      if (bytes.length < 4) None
      else if (magic(bytes, 0, "fLaC")) flacMeta(bytes, 0)
      else if (magic(bytes, 0, "OggS")) oggMeta(bytes)
      else if (magic(bytes, 4, "ftyp")) mp4Meta(bytes)
      else if (isEbml(bytes)) webmMeta(bytes)
      else if (magic(bytes, 0, "ID3")) mpegAfterId3(bytes)
      else if (isAdtsSync(bytes, 0)) adtsMeta(bytes, 0)
      else if (isMpegSync(bytes, 0)) mpegFrameMeta(bytes, 0)
      else None
    } catch { case _: IndexOutOfBoundsException => None }

  /** Total video frame count — real frame ENUMERATION without a codec;
    * only pixel extraction needs one. MP4: the `stts` table's Σ sample
    * counts of the first `vide` track. WebM/Matroska: segment Duration
    * (timecode-scale units) over the video track's DefaultDuration
    * (ns/frame). None for other containers (an Ogg Theora ident header
    * declares fps but no frame total) or audio-only streams.
    */
  def videoFrameCount(bytes: Array[Byte]): Option[Long] =
    try {
      // derived from the frame tables ALONE, independent of whether a
      // full MediaMeta exists: an MP4 with a populated stts but a
      // zero-dim/absent tkhd still has a real frame count
      if (bytes.length < 8) None
      else if (magic(bytes, 4, "ftyp")) parseMp4(bytes).flatMap(mp4Frames)
      else if (isEbml(bytes)) parseEbml(bytes).flatMap(webmFrames)
      else None
    } catch { case _: IndexOutOfBoundsException => None }

  /** One-parse variant for consumers that need both the typed metadata
    * AND the frame enumeration ([[Multimodal.sampleFrames]]): the MP4 box
    * tree / EBML element tree is walked ONCE and serves both answers —
    * `meta(bytes)` + `videoFrameCount(bytes)` would walk it twice per
    * row on a corpus-scale hot path. `_2` is the frame count when the
    * container declares one.
    */
  def metaAndFrames(bytes: Array[Byte]): Option[(MediaMeta, Option[Long])] =
    try {
      if (bytes.length < 8) meta(bytes).map((_, None))
      else if (magic(bytes, 4, "ftyp"))
        parseMp4(bytes).flatMap(info =>
          mp4MetaFrom(info, bytes.length).map((_, mp4Frames(info))))
      else if (isEbml(bytes))
        parseEbml(bytes).flatMap(seg =>
          webmMetaFrom(seg, bytes.length).map((_, webmFrames(seg))))
      else meta(bytes).map((_, None))
    } catch { case _: IndexOutOfBoundsException => None }

  private def mp4Frames(info: Mp4Info): Option[Long] =
    info.videoTrack.flatMap(t =>
      if (t.sttsTotal > 0) Some(t.sttsTotal) else None)

  private def webmFrames(s: MkvSegment): Option[Long] =
    s.tracks.find(_.trackType == 1).flatMap { v =>
      val frames = s.durationTicks * s.timecodeScaleNs / v.defaultDurationNs
      // Duration is a raw container float: NaN/Infinity (or a non-positive
      // product) reads as "no declared frame count", never a fake one
      if (s.durationTicks > 0 && v.defaultDurationNs > 0 &&
          java.lang.Double.isFinite(frames) && frames > 0)
        Some(math.round(frames))
      else None
    }

  // ---- shared byte helpers (all big-endian unless noted) ----

  private def magic(b: Array[Byte], at: Int, s: String): Boolean =
    b.length >= at + s.length &&
      (0 until s.length).forall(i => (b(at + i) & 0xFF) == s.charAt(i))

  private def u8(b: Array[Byte], at: Int): Int = b(at) & 0xFF
  private def u16(b: Array[Byte], at: Int): Int = (u8(b, at) << 8) | u8(b, at + 1)
  private def u24(b: Array[Byte], at: Int): Int = (u16(b, at) << 8) | u8(b, at + 2)
  private def u32(b: Array[Byte], at: Int): Long =
    (u24(b, at).toLong << 8) | u8(b, at + 3)
  private def u64(b: Array[Byte], at: Int): Long =
    (u32(b, at) << 32) | u32(b, at + 4)
  private def u32le(b: Array[Byte], at: Int): Long =
    u8(b, at) | (u8(b, at + 1).toLong << 8) |
      (u8(b, at + 2).toLong << 16) | (u8(b, at + 3).toLong << 24)

  // ---- MPEG audio (MP3) ----

  /** MPEG audio frame sync: 11 set bits, valid version/layer/rate fields.
    * Only accepted at a KNOWN offset (0, or exactly past an ID3v2 tag) —
    * never found by scanning, which could false-positive inside arbitrary
    * binary (a JPEG entropy segment is full of 0xFF bytes).
    */
  private def isMpegSync(b: Array[Byte], at: Int): Boolean =
    b.length >= at + 4 && u8(b, at) == 0xFF && (u8(b, at + 1) & 0xE0) == 0xE0 &&
      ((u8(b, at + 1) >> 3) & 0x3) != 1 && // version != reserved
      ((u8(b, at + 1) >> 1) & 0x3) != 0 && // layer != reserved (excludes ADTS)
      ((u8(b, at + 2) >> 2) & 0x3) != 3 && // sample-rate index != reserved
      ((u8(b, at + 2) >> 4) & 0xF) != 15   // bitrate index != invalid

  // [version(2 bits)][index(2 bits)] → Hz; version 1 is reserved
  private val MpegRates: Array[Array[Int]] = Array(
    Array(11025, 12000, 8000, 0),  // 0 = MPEG 2.5
    Array(0, 0, 0, 0),             // 1 = reserved
    Array(22050, 24000, 16000, 0), // 2 = MPEG 2
    Array(44100, 48000, 32000, 0)) // 3 = MPEG 1

  private def mpegFrameMeta(b: Array[Byte], at: Int): Option[MediaMeta] = {
    if (!isMpegSync(b, at)) return None
    val version = (u8(b, at + 1) >> 3) & 0x3
    val srIdx = (u8(b, at + 2) >> 2) & 0x3
    val rate = MpegRates(version)(srIdx)
    val channels = if (((u8(b, at + 3) >> 6) & 0x3) == 3) 1 else 2
    if (rate <= 0) None
    else Some(MediaMeta("audio", rate, channels, 0, (b.length - at).toLong))
  }

  /** Skip an ID3v2 tag (10-byte header, sync-safe 28-bit size, optional
    * 10-byte footer), tolerate trailing zero padding, then parse the MPEG
    * or ADTS frame that must start there.
    */
  private def mpegAfterId3(b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 10) return None
    // sync-safe: 4 × 7 bits, high bit of each byte must be clear
    if (((u8(b, 6) | u8(b, 7) | u8(b, 8) | u8(b, 9)) & 0x80) != 0) return None
    val size = (u8(b, 6) << 21) | (u8(b, 7) << 14) | (u8(b, 8) << 7) | u8(b, 9)
    val footer = if ((u8(b, 5) & 0x10) != 0) 10 else 0
    var at = 10 + size + footer
    if (at < 0 || at >= b.length) return None
    while (at < b.length && b(at) == 0) at += 1 // padding after the tag
    if (at + 4 > b.length) None
    else if (isAdtsSync(b, at)) adtsMeta(b, at)
    else mpegFrameMeta(b, at)
  }

  // ---- AAC in ADTS ----

  /** ADTS sync is 12 set bits with layer bits 00 (which MPEG audio
    * reserves — the two syncs are disjoint).
    */
  private def isAdtsSync(b: Array[Byte], at: Int): Boolean =
    b.length >= at + 7 && u8(b, at) == 0xFF && (u8(b, at + 1) & 0xF6) == 0xF0

  private val AdtsRates = Array(96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350)

  private def adtsMeta(b: Array[Byte], at: Int): Option[MediaMeta] = {
    if (!isAdtsSync(b, at)) return None
    val freqIdx = (u8(b, at + 2) >> 2) & 0xF
    val chanCfg = ((u8(b, at + 2) & 0x1) << 2) | ((u8(b, at + 3) >> 6) & 0x3)
    // freq index ≥ 13 is reserved; channel config 0 means the layout is
    // in an in-band PCE we would need a bitstream parser for → undecodable
    if (freqIdx >= AdtsRates.length || chanCfg == 0) None
    else {
      val channels = if (chanCfg == 7) 8 else chanCfg
      Some(MediaMeta("audio", AdtsRates(freqIdx), channels, 0,
        (b.length - at).toLong))
    }
  }

  // ---- FLAC ----

  /** Native FLAC: "fLaC" then the mandatory first metadata block, which
    * the spec requires to be a 34-byte STREAMINFO. Sample rate (20 bits),
    * channels−1 (3 bits), bits-per-sample−1 (5 bits) and total samples
    * (36 bits) are bit-packed at STREAMINFO offset 10. payloadBytes is
    * the raw-PCM-equivalent size when total-samples is declared.
    */
  private def flacMeta(b: Array[Byte], at: Int): Option[MediaMeta] = {
    if (b.length < at + 42 || !magic(b, at, "fLaC")) return None
    if ((u8(b, at + 4) & 0x7F) != 0 || u24(b, at + 5) != 34) return None
    val p = at + 8 + 10
    val rate = (u8(b, p) << 12) | (u8(b, p + 1) << 4) | (u8(b, p + 2) >> 4)
    val channels = ((u8(b, p + 2) >> 1) & 0x7) + 1
    val bps = (((u8(b, p + 2) & 0x1) << 4) | (u8(b, p + 3) >> 4)) + 1
    val totalSamples = ((u8(b, p + 3) & 0xF).toLong << 32) | u32(b, p + 4)
    if (rate == 0) None // 0 is invalid per spec
    else {
      val payload =
        if (totalSamples > 0) totalSamples * channels * ((bps + 7) / 8)
        else (b.length - at).toLong
      Some(MediaMeta("audio", rate, channels, 0, payload))
    }
  }

  // ---- Ogg (Vorbis / Opus / FLAC-in-Ogg) ----

  /** First Ogg page → first packet → codec identification header. */
  private def oggMeta(b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 28 || u8(b, 4) != 0) return None // stream version 0 only
    val nsegs = u8(b, 26)
    val p = 27 + nsegs
    if (p + 9 > b.length) return None
    if (u8(b, p) == 0x01 && magic(b, p + 1, "vorbis")) {
      // \x01vorbis, version u32le (must be 0), channels u8, rate u32le
      if (p + 16 > b.length || u32le(b, p + 7) != 0L) None
      else {
        val channels = u8(b, p + 11)
        val rate = u32le(b, p + 12)
        if (channels == 0 || rate <= 0 || rate > Int.MaxValue) None
        else Some(MediaMeta("audio", rate.toInt, channels, 0, b.length.toLong))
      }
    } else if (magic(b, p, "OpusHead")) {
      // version u8 (major nibble must be 0), channels u8, pre-skip u16le,
      // input sample rate u32le (informational original rate)
      if (p + 16 > b.length || (u8(b, p + 8) >> 4) != 0) None
      else {
        val channels = u8(b, p + 9)
        val rate = u32le(b, p + 12)
        if (channels == 0 || rate <= 0 || rate > Int.MaxValue) None
        else Some(MediaMeta("audio", rate.toInt, channels, 0, b.length.toLong))
      }
    } else if (u8(b, p) == 0x7F && magic(b, p + 1, "FLAC")) {
      // FLAC-to-Ogg mapping: 0x7F "FLAC" major minor nheaders(u16) then a
      // native "fLaC" stream with its STREAMINFO
      flacMeta(b, p + 9)
    } else if (u8(b, p) == 0x80 && magic(b, p + 1, "theora")) {
      // Theora identification header: picture dims (24-bit each) and the
      // frame rate as a rational FRN/FRD
      if (p + 30 > b.length) None
      else {
        val w = u24(b, p + 14)
        val h = u24(b, p + 17)
        val frn = u32(b, p + 22)
        val frd = u32(b, p + 26)
        // clamp: a corrupt 32-bit numerator over denominator 1 would
        // overflow toInt into a negative fps
        val fps =
          if (frn > 0 && frd > 0)
            math.min(math.round(frn.toDouble / frd), Int.MaxValue.toLong).toInt
          else 0
        if (w == 0 || h == 0) None
        else Some(MediaMeta("video", w, h, fps, b.length.toLong))
      }
    } else None
  }

  // ---- WebM / Matroska (EBML) ----

  private def isEbml(b: Array[Byte]): Boolean =
    b.length >= 4 && (b(0) & 0xFF) == 0x1A && (b(1) & 0xFF) == 0x45 &&
      (b(2) & 0xFF) == 0xDF && (b(3) & 0xFF) == 0xA3

  /** EBML element ID: length = leading-zero count of the first byte + 1
    * (1–4 bytes); the conventional ID value KEEPS the length-marker bits
    * (0x1A45DFA3 style). Returns (id, byteLength), or null-equivalent
    * (0, 0) on malformed input.
    */
  private def ebmlId(b: Array[Byte], at: Int): (Long, Int) = {
    if (at >= b.length) return (0L, 0)
    val first = b(at) & 0xFF
    val len = Integer.numberOfLeadingZeros(first) - 24 + 1
    if (len < 1 || len > 4 || at + len > b.length) return (0L, 0)
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b(at + i) & 0xFF); i += 1 }
    (v, len)
  }

  /** EBML data size: like the ID but the marker bit is STRIPPED (1–8
    * bytes); the all-value-bits-set pattern means "unknown size" (the
    * element extends to the enclosing bound) → -1.
    */
  private def ebmlSize(b: Array[Byte], at: Int): (Long, Int) = {
    if (at >= b.length) return (-2L, 0)
    val first = b(at) & 0xFF
    val len = Integer.numberOfLeadingZeros(first) - 24 + 1
    if (len < 1 || len > 8 || at + len > b.length) return (-2L, 0)
    var v = (first & (0xFF >>> len)).toLong
    var i = 1
    while (i < len) { v = (v << 8) | (b(at + i) & 0xFF); i += 1 }
    val allOnes = (1L << (7 * len)) - 1
    (if (v == allOnes) -1L else v, len)
  }

  /** Walk EBML child elements in [lo, hi): (id, payloadStart, payloadEnd).
    * Unknown-size elements extend to `hi`; malformed input ends the walk.
    */
  private def ebmlChildren(b: Array[Byte], lo: Long, hi: Long): Iterator[(Long, Long, Long)] =
    new Iterator[(Long, Long, Long)] {
      private var at = lo
      private var dead = false
      def hasNext: Boolean = !dead && at + 2 <= hi
      def next(): (Long, Long, Long) = {
        val (id, idLen) = ebmlId(b, at.toInt)
        if (idLen == 0) { dead = true; return (0L, hi, hi) }
        val (size, szLen) = ebmlSize(b, (at + idLen).toInt)
        if (szLen == 0) { dead = true; return (0L, hi, hi) }
        val ps = at + idLen + szLen
        val pe = if (size < 0) hi else math.min(hi, ps + size)
        if (ps > hi) { dead = true; (0L, hi, hi) }
        else { at = pe; (id, ps, pe) }
      }
    }

  private def ebmlUint(b: Array[Byte], lo: Long, hi: Long): Long = {
    var v = 0L
    var i = lo
    while (i < hi && i - lo < 8) { v = (v << 8) | (b(i.toInt) & 0xFF); i += 1 }
    v
  }

  private def ebmlFloat(b: Array[Byte], lo: Long, hi: Long): Double =
    (hi - lo) match {
      case 4 => java.lang.Float.intBitsToFloat(ebmlUint(b, lo, hi).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(ebmlUint(b, lo, hi))
      case _ => 0.0
    }

  private final case class MkvTrack(trackType: Int, width: Int, height: Int,
                                    sampleRate: Double, channels: Int,
                                    defaultDurationNs: Long)
  private final case class MkvSegment(timecodeScaleNs: Double,
                                      durationTicks: Double,
                                      tracks: List[MkvTrack],
                                      clusterBytes: Long)

  /** Parse the Matroska segment headers: Info (TimecodeScale, Duration),
    * Tracks (type, video dims, audio rate/channels, DefaultDuration),
    * Σ Cluster payload sizes. Never reads block/frame data.
    */
  private def parseEbml(b: Array[Byte]): Option[MkvSegment] = {
    var seg: Option[(Long, Long)] = None
    for ((id, ps, pe) <- ebmlChildren(b, 0L, b.length.toLong))
      if (id == 0x18538067L && seg.isEmpty) seg = Some((ps, pe)) // Segment
    seg.map { case (slo, shi) =>
      var tcScale = 1000000.0 // Matroska default: 1 ms per tick
      var duration = 0.0
      var tracks = List.empty[MkvTrack]
      var clusters = 0L
      for ((id, ps, pe) <- ebmlChildren(b, slo, shi)) id match {
        case 0x1549A966L => // Info
          for ((i2, s2, e2) <- ebmlChildren(b, ps, pe)) i2 match {
            case 0x2AD7B1L => tcScale = ebmlUint(b, s2, e2).toDouble
            case 0x4489L   => duration = ebmlFloat(b, s2, e2)
            case _         => ()
          }
        case 0x1654AE6BL => // Tracks
          for ((i2, s2, e2) <- ebmlChildren(b, ps, pe) if i2 == 0xAEL) {
            var (tt, w, h, ch) = (0, 0, 0, 0)
            var rate = 0.0
            var dd = 0L
            for ((i3, s3, e3) <- ebmlChildren(b, s2, e2)) i3 match {
              case 0x83L     => tt = ebmlUint(b, s3, e3).toInt
              case 0x23E383L => dd = ebmlUint(b, s3, e3)
              case 0xE0L => // Video
                for ((i4, s4, e4) <- ebmlChildren(b, s3, e3)) i4 match {
                  case 0xB0L => w = ebmlUint(b, s4, e4).toInt
                  case 0xBAL => h = ebmlUint(b, s4, e4).toInt
                  case _     => ()
                }
              case 0xE1L => // Audio
                for ((i4, s4, e4) <- ebmlChildren(b, s3, e3)) i4 match {
                  case 0xB5L => rate = ebmlFloat(b, s4, e4)
                  case 0x9FL => ch = ebmlUint(b, s4, e4).toInt
                  case _     => ()
                }
              case _ => ()
            }
            tracks :+= MkvTrack(tt, w, h, rate, ch, dd)
          }
        case 0x1F43B675L => clusters += pe - ps // Cluster
        case _           => ()
      }
      MkvSegment(tcScale, duration, tracks, clusters)
    }
  }

  /** WebM/Matroska: a video track (type 1) wins — pixel dims from the
    * Video element, fps from DefaultDuration (ns per frame); else the
    * first audio track (type 2) — SamplingFrequency/Channels.
    * payloadBytes = Σ Cluster payloads when present, else container
    * length.
    */
  private def webmMeta(b: Array[Byte]): Option[MediaMeta] =
    parseEbml(b).flatMap(webmMetaFrom(_, b.length))

  private def webmMetaFrom(s: MkvSegment, containerLen: Long): Option[MediaMeta] = {
    val payload = if (s.clusterBytes > 0) s.clusterBytes else containerLen
    s.tracks.find(_.trackType == 1) match {
      case Some(v) if v.width > 0 && v.height > 0 =>
        val fps =
          if (v.defaultDurationNs > 0)
            math.round(1e9 / v.defaultDurationNs).toInt
          else 0
        Some(MediaMeta("video", v.width, v.height, fps, payload))
      case _ =>
        s.tracks.find(_.trackType == 2).flatMap { a =>
          // SamplingFrequency is a raw float from the container: NaN
          // passes a `<= 0` comparison, a huge value overflows toInt,
          // and a sub-half-hertz value ROUNDS to zero — all must read
          // as undecodable, never a garbage rate (the bound is checked
          // on the rounded Hz, the value that actually lands in the row)
          val hz = math.round(a.sampleRate)
          if (!java.lang.Double.isFinite(a.sampleRate) || hz < 1 ||
              hz > Int.MaxValue || a.channels <= 0) None
          else Some(MediaMeta("audio", hz.toInt,
            a.channels, 0, payload))
        }
    }
  }

  // ---- MP4 / ISO base media (MP4, M4A, MOV-style brands) ----

  private final case class Mp4Track(handler: String, width: Int, height: Int,
                                    mdhdTimescale: Long, mdhdDuration: Long,
                                    stsdChannels: Int, stsdRate: Int,
                                    sttsTotal: Long)
  private final case class Mp4Info(tracks: List[Mp4Track], mdatBytes: Long) {
    def videoTrack: Option[Mp4Track] = tracks.find(_.handler == "vide")
    def audioTrack: Option[Mp4Track] = tracks.find(_.handler == "soun")
  }

  /** Walk ISO-BMFF boxes in [from, to): (type, payloadStart, payloadEnd).
    * size==1 → 64-bit largesize; size==0 → box extends to `to`. Any
    * malformed size terminates the walk (never throws past the array).
    */
  private def boxes(b: Array[Byte], lo: Long, hi: Long): Iterator[(String, Long, Long)] =
    new Iterator[(String, Long, Long)] {
      private var at = lo
      def hasNext: Boolean = at + 8 <= hi
      def next(): (String, Long, Long) = {
        val size0 = u32(b, at.toInt)
        val tpe = new String(b, at.toInt + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val (hdr, size) =
          if (size0 == 1L && at + 16 <= hi) (16L, u64(b, at.toInt + 8))
          else if (size0 == 0L) (8L, hi - at)
          else (8L, size0)
        if (size < hdr || at + size > hi) { val r = (tpe, at + hdr, hi); at = hi; r }
        else { val r = (tpe, at + hdr, at + size); at += size; r }
      }
    }

  private def parseMp4(b: Array[Byte]): Option[Mp4Info] = {
    var tracks = List.empty[Mp4Track]
    var mdat = 0L
    var sawMoov = false
    for ((tpe, ps, pe) <- boxes(b, 0L, b.length.toLong)) tpe match {
      case "mdat" => mdat += pe - ps
      case "moov" =>
        sawMoov = true
        for ((t2, s2, e2) <- boxes(b, ps, pe) if t2 == "trak")
          parseTrak(b, s2, e2).foreach(t => tracks :+= t)
      case _ => ()
    }
    if (sawMoov) Some(Mp4Info(tracks, mdat)) else None
  }

  private def parseTrak(b: Array[Byte], from: Long, to: Long): Option[Mp4Track] = {
    var width, height = 0
    var handler = ""
    var mdhdTs, mdhdDur, sttsTotal = 0L
    var stsdCh, stsdRate = 0
    for ((tpe, ps, pe) <- boxes(b, from, to)) tpe match {
      case "tkhd" =>
        val v = u8(b, ps.toInt)
        val off = if (v == 1) 88 else 76 // fixed layouts per ISO 14496-12 §8.3.2
        if (ps + off + 8 <= pe) {
          width = (u32(b, (ps + off).toInt) >>> 16).toInt     // 16.16 fixed
          height = (u32(b, (ps + off + 4).toInt) >>> 16).toInt
        }
      case "mdia" =>
        for ((t2, s2, e2) <- boxes(b, ps, pe)) t2 match {
          case "mdhd" =>
            val v = u8(b, s2.toInt)
            if (v == 1 && s2 + 32 <= e2) {
              mdhdTs = u32(b, (s2 + 20).toInt); mdhdDur = u64(b, (s2 + 24).toInt)
            } else if (v == 0 && s2 + 20 <= e2) {
              mdhdTs = u32(b, (s2 + 12).toInt); mdhdDur = u32(b, (s2 + 16).toInt)
            }
          case "hdlr" =>
            if (s2 + 12 <= e2)
              handler = new String(b, s2.toInt + 8, 4,
                java.nio.charset.StandardCharsets.US_ASCII)
          case "minf" =>
            for ((t3, s3, e3) <- boxes(b, s2, e2) if t3 == "stbl")
              for ((t4, s4, e4) <- boxes(b, s3, e3)) t4 match {
                case "stsd" if s4 + 16 <= e4 =>
                  // first sample entry; audio entries carry channelcount
                  // @+24 and a 16.16 sample rate @+32 from the entry start
                  val entry = s4 + 8
                  if (entry + 36 <= e4) {
                    stsdCh = u16(b, (entry + 24).toInt)
                    stsdRate = (u32(b, (entry + 32).toInt) >>> 16).toInt
                  }
                case "stts" if s4 + 8 <= e4 =>
                  val n = u32(b, (s4 + 4).toInt)
                  var i = 0L
                  var total = 0L
                  while (i < n && s4 + 8 + i * 8 + 8 <= e4) {
                    total += u32(b, (s4 + 8 + i * 8).toInt); i += 1
                  }
                  sttsTotal = total
                case _ => ()
              }
          case _ => ()
        }
      case _ => ()
    }
    if (handler.isEmpty) None
    else Some(Mp4Track(handler, width, height, mdhdTs, mdhdDur,
      stsdCh, stsdRate, sttsTotal))
  }

  /** MP4 family: a `vide` track wins (kind=video, pixel dims from tkhd,
    * fps = stts frame count over mdhd duration); else the first `soun`
    * track (kind=audio, rate from the stsd entry falling back to the mdhd
    * timescale — which for audio IS the sample rate by convention).
    * payloadBytes = mdat payload when present, else container length.
    */
  private def mp4Meta(b: Array[Byte]): Option[MediaMeta] =
    parseMp4(b).flatMap(mp4MetaFrom(_, b.length))

  private def mp4MetaFrom(info: Mp4Info, containerLen: Long): Option[MediaMeta] = {
    val payload = if (info.mdatBytes > 0) info.mdatBytes else containerLen
    info.videoTrack match {
      case Some(v) if v.width > 0 && v.height > 0 =>
        // clamp against corrupt stts/mdhd fields driving the rational
        // past Int range (toInt would wrap negative)
        val fps =
          if (v.sttsTotal > 0 && v.mdhdDuration > 0 && v.mdhdTimescale > 0)
            math.min(math.round(
              v.sttsTotal.toDouble * v.mdhdTimescale / v.mdhdDuration),
              Int.MaxValue.toLong).toInt
          else 0
        Some(MediaMeta("video", v.width, v.height, fps, payload))
      case _ =>
        info.audioTrack.flatMap { a =>
          // the stsd rate is a 16.16 fixed field — its integer part
          // cannot hold rates ≥ 65536 Hz, which hi-res encoders store
          // TRUNCATED (rate & 0xFFFF). The mdhd timescale is by
          // convention the true audio sample rate: when it exceeds 16
          // bits and its low 16 bits equal the stsd value, the stsd
          // field wrapped — repair from the timescale instead of
          // emitting 30464 Hz for a 96 kHz stream
          val wrapped = a.mdhdTimescale > 0xFFFF &&
            (a.mdhdTimescale & 0xFFFFL) == a.stsdRate.toLong
          val rate =
            if (a.stsdRate > 0 && !wrapped) a.stsdRate
            else if (a.mdhdTimescale > 0 && a.mdhdTimescale <= Int.MaxValue)
              a.mdhdTimescale.toInt
            else 0
          val channels = if (a.stsdChannels > 0) a.stsdChannels else 0
          if (rate <= 0 || channels <= 0) None
          else Some(MediaMeta("audio", rate, channels, 0, payload))
        }
    }
  }
}
