package graft.ext

/** Deterministic builders for minimal-but-valid compressed media
  * containers (test/synthesis helpers, the compressed-format analogue of
  * [[Multimodal.encodeStub]]). Each builder emits the real public byte
  * layout of its format, so [[CompressedMedia]]'s parsers are exercised
  * against the documented structures — and probe oracles can re-derive
  * the expected metadata in closed form from the build parameters.
  */
object MediaFixtures {

  private def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be24(v: Int): Array[Byte] = Array(((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def ascii(s: String): Array[Byte] = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** MPEG-1 Layer III frame header (sync, 128 kbps) with an optional
    * empty ID3v2 tag in front. srIdx 0/1/2 → 44100/48000/32000 Hz.
    */
  def mp3(srIdx: Int, stereo: Boolean, payload: Array[Byte], withId3: Boolean = true): Array[Byte] = {
    require(srIdx >= 0 && srIdx <= 2, s"bad MPEG-1 sample-rate index $srIdx")
    val id3 =
      if (withId3) ascii("ID3") ++ Array[Byte](4, 0, 0, 0, 0, 0, 0) // v2.4, no flags, size 0
      else Array.emptyByteArray
    val hdr = Array(0xFF.toByte, 0xFB.toByte, // sync | MPEG1 | Layer III
      (0x90 | (srIdx << 2)).toByte,           // bitrate idx 9 (128k) | sr idx
      (if (stereo) 0x00 else 0xC0).toByte)    // channel mode
    id3 ++ hdr ++ payload
  }

  /** AAC in ADTS (MPEG-4, AAC-LC). freqIdx per the ADTS table
    * (e.g. 3→48000, 4→44100); chanCfg 1..7.
    */
  def adts(freqIdx: Int, chanCfg: Int, payload: Array[Byte]): Array[Byte] = {
    require(freqIdx >= 0 && freqIdx < 13 && chanCfg >= 1 && chanCfg <= 7)
    Array(0xFF.toByte, 0xF1.toByte, // sync | MPEG-4 | layer 00 | no CRC
      ((1 << 6) | (freqIdx << 2) | ((chanCfg >> 2) & 1)).toByte, // AAC-LC
      ((chanCfg & 3) << 6).toByte, 0.toByte, 0.toByte, 0.toByte) ++ payload
  }

  /** Native FLAC: "fLaC" + last-flag STREAMINFO block (34 bytes). */
  def flac(rate: Int, channels: Int, bps: Int, totalSamples: Long): Array[Byte] = {
    require(rate > 0 && rate < (1 << 20) && channels >= 1 && channels <= 8 &&
      bps >= 4 && bps <= 32 && totalSamples >= 0 && totalSamples < (1L << 36))
    val packed = Array(
      ((rate >> 12) & 0xFF).toByte, ((rate >> 4) & 0xFF).toByte,
      (((rate & 0xF) << 4) | ((channels - 1) << 1) | ((bps - 1) >> 4)).toByte,
      ((((bps - 1) & 0xF) << 4) | ((totalSamples >> 32) & 0xF).toInt).toByte) ++
      be32(totalSamples & 0xFFFFFFFFL)
    ascii("fLaC") ++ Array(0x80.toByte) ++ be24(34) ++
      be16(4096) ++ be16(4096) ++ be24(0) ++ be24(0) ++ // block/frame sizes
      packed ++ new Array[Byte](16)                     // md5
  }

  private def oggPage(packet: Array[Byte]): Array[Byte] = {
    require(packet.length < 255, "single-segment fixture page only")
    ascii("OggS") ++ Array[Byte](0, 2) ++          // version 0, BOS
      new Array[Byte](8 + 4 + 4 + 4) ++            // granule/serial/seq/crc
      Array(1.toByte, packet.length.toByte) ++ packet
  }

  /** Ogg page carrying an OpusHead identification header. */
  def oggOpus(channels: Int, rate: Long): Array[Byte] =
    oggPage(ascii("OpusHead") ++ Array(1.toByte, channels.toByte) ++
      be16(312).reverse ++ le32(rate) ++ be16(0) ++ Array(0.toByte))

  /** Ogg page carrying a Vorbis identification header. */
  def oggVorbis(channels: Int, rate: Long): Array[Byte] =
    oggPage(Array(1.toByte) ++ ascii("vorbis") ++ le32(0) ++
      Array(channels.toByte) ++ le32(rate) ++
      new Array[Byte](12) ++ Array(0xB8.toByte, 1.toByte))

  /** Ogg page carrying a Theora identification header. */
  def oggTheora(width: Int, height: Int, fpsNum: Long, fpsDen: Long): Array[Byte] =
    oggPage(Array(0x80.toByte) ++ ascii("theora") ++
      Array[Byte](3, 2, 1) ++                       // VMAJ VMIN VREV
      be16((width + 15) / 16) ++ be16((height + 15) / 16) ++ // macroblock dims
      be24(width) ++ be24(height) ++ Array[Byte](0, 0) ++    // pic dims + offsets
      be32(fpsNum) ++ be32(fpsDen))

  // ---- WebM / Matroska (EBML) ----

  private def minBe(v: Long): Array[Byte] = {
    val n = math.max(1, (71 - java.lang.Long.numberOfLeadingZeros(v)) / 8)
    (0 until n).map(i => ((v >> (8 * (n - 1 - i))) & 0xFF).toByte).toArray
  }

  private def ebml(id: Long, parts: Array[Byte]*): Array[Byte] = {
    val content = parts.foldLeft(Array.emptyByteArray)(_ ++ _)
    // size always in the 8-byte vint form (0x01 marker + 7 value bytes)
    val size = Array(0x01.toByte) ++
      (0 until 7).map(i => ((content.length.toLong >> (8 * (6 - i))) & 0xFF).toByte)
    minBe(id) ++ size ++ content
  }

  private def ebmlFloat8(v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    (0 until 8).map(i => ((bits >> (8 * (7 - i))) & 0xFF).toByte).toArray
  }

  /** WebM with one video track: pixel dims, DefaultDuration (ns/frame →
    * fps), segment Duration in timecode-scale ticks, one Cluster.
    */
  def webmVideo(width: Int, height: Int, frameNs: Long, durationTicks: Double,
                tcScaleNs: Long, payload: Array[Byte]): Array[Byte] =
    ebml(0x1A45DFA3L) ++ // EBML header (content irrelevant to the parser)
      ebml(0x18538067L,  // Segment
        ebml(0x1549A966L, // Info
          ebml(0x2AD7B1L, minBe(tcScaleNs)),
          ebml(0x4489L, ebmlFloat8(durationTicks))),
        ebml(0x1654AE6BL, // Tracks
          ebml(0xAEL,
            ebml(0x83L, minBe(1)),
            ebml(0x23E383L, minBe(frameNs)),
            ebml(0xE0L, ebml(0xB0L, minBe(width)), ebml(0xBAL, minBe(height))))),
        ebml(0x1F43B675L, payload)) // Cluster

  /** WebM/MKA with one audio track: SamplingFrequency + Channels. */
  def webmAudio(channels: Int, rate: Double, payload: Array[Byte]): Array[Byte] =
    ebml(0x1A45DFA3L) ++
      ebml(0x18538067L,
        ebml(0x1549A966L, ebml(0x2AD7B1L, minBe(1000000L))),
        ebml(0x1654AE6BL,
          ebml(0xAEL,
            ebml(0x83L, minBe(2)),
            ebml(0xE1L, ebml(0xB5L, ebmlFloat8(rate)), ebml(0x9FL, minBe(channels))))),
        ebml(0x1F43B675L, payload))

  // ---- ISO-BMFF (MP4/M4A) ----

  private def box(tpe: String, parts: Array[Byte]*): Array[Byte] = {
    val content = parts.foldLeft(Array.emptyByteArray)(_ ++ _)
    be32(8L + content.length) ++ ascii(tpe) ++ content
  }

  private def tkhd(width: Int, height: Int): Array[Byte] =
    box("tkhd", new Array[Byte](4 + 20 + 52), // v0 verflags..matrix
      be32(width.toLong << 16), be32(height.toLong << 16)) // 16.16 fixed

  private def mdhd(timescale: Long, duration: Long): Array[Byte] =
    box("mdhd", new Array[Byte](4 + 8), be32(timescale), be32(duration),
      new Array[Byte](4)) // language + pre_defined

  private def hdlr(handler: String): Array[Byte] =
    box("hdlr", new Array[Byte](8), ascii(handler), new Array[Byte](13))

  private def stts(frames: Long, delta: Long): Array[Byte] =
    box("stts", new Array[Byte](4), be32(1), be32(frames), be32(delta))

  private def audioStsd(channels: Int, rate: Int): Array[Byte] =
    box("stsd", new Array[Byte](4), be32(1),
      box("mp4a", new Array[Byte](6), be16(1),     // reserved + data-ref
        new Array[Byte](8),                        // version/rev/vendor
        be16(channels), be16(16), new Array[Byte](4),
        be32(rate.toLong << 16)))                  // 16.16 sample rate

  /** MP4 with one `vide` track: real tkhd dims, an stts frame table, and
    * an mdat payload. fps parses as round(frames·timescale/duration).
    */
  def mp4Video(width: Int, height: Int, frames: Long, timescale: Long,
               duration: Long, payload: Array[Byte]): Array[Byte] =
    box("ftyp", ascii("isom"), be32(0), ascii("isom")) ++
      box("moov",
        box("trak", tkhd(width, height),
          box("mdia", mdhd(timescale, duration), hdlr("vide"),
            box("minf", box("stbl", stts(frames, duration / math.max(1, frames))))))) ++
      box("mdat", payload)

  /** M4A (audio-only MP4): `soun` track with an mp4a stsd entry. */
  def m4aAudio(channels: Int, rate: Int, payload: Array[Byte]): Array[Byte] =
    box("ftyp", ascii("M4A "), be32(0), ascii("M4A ")) ++
      box("moov",
        box("trak", tkhd(0, 0),
          box("mdia", mdhd(rate.toLong, 0L), hdlr("soun"),
            box("minf", box("stbl", audioStsd(channels, rate)))))) ++
      box("mdat", payload)

  // ---- real raster + PCM fixtures (pixel/sample-level, not header) ----

  /** Render a 64-bit dHash signature as a REAL PNG whose
    * [[ImageFeatures.dhash64]] is exactly `sig`: a 9x8 grid of
    * `block`x`block` constant-gray cells where each row walks from
    * `base` by +-`step` per bit — bit (row*8 + col) set means cell
    * (row, col+1) is `step` brighter than cell (row, col). Block
    * alignment (width = 9*block) makes the area-average downsample
    * exact, so encode -> real PNG decode -> hash round-trips bit-for-bit
    * and a probe oracle can re-derive both the hash and the image's
    * exact luma sum in closed form from `sig` alone.
    */
  def dhashPng(sig: Long, block: Int = 3, base: Int = 120,
               step: Int = 10): Array[Byte] = {
    require(block >= 1 && step >= 1 && base - 8 * step >= 0 &&
      base + 8 * step <= 255,
      s"dhashPng walk must stay in [0,255]: block=$block base=$base step=$step")
    val img = new java.awt.image.BufferedImage(
      9 * block, 8 * block, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var r = 0
    while (r < 8) {
      var l = base
      var c = 0
      while (c < 9) {
        val rgb = (l << 16) | (l << 8) | l
        var y = r * block
        while (y < (r + 1) * block) {
          var x = c * block
          while (x < (c + 1) * block) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        if (c < 8) l += (if (((sig >>> (r * 8 + c)) & 1L) == 1L) step else -step)
        c += 1
      }
      r += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

  /** RIFF/WAVE container with REAL 16-bit signed little-endian PCM:
    * `samples` are interleaved frames (length a multiple of `channels`).
    * Written byte-by-byte from the public RIFF layout — deliberately NOT
    * via javax.sound, so [[AudioFeatures]]' decode path is exercised
    * against an independent encoder.
    */
  def wavPcm16(rate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(rate > 0 && channels >= 1 && samples.length % channels == 0,
      s"bad wav fixture: rate=$rate channels=$channels n=${samples.length}")
    val dataLen = samples.length * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    out.write(ascii("RIFF")); out.write(le32(36L + dataLen))
    out.write(ascii("WAVE")); out.write(ascii("fmt ")); out.write(le32(16L))
    out.write(le16(1)); out.write(le16(channels)) // PCM, channel count
    out.write(le32(rate.toLong)); out.write(le32(rate.toLong * channels * 2))
    out.write(le16(channels * 2)); out.write(le16(16)) // block align, bits
    out.write(ascii("data")); out.write(le32(dataLen.toLong))
    samples.foreach { s => out.write(s & 0xFF); out.write((s >> 8) & 0xFF) }
    out.toByteArray
  }

  /** REAL subset FLAC carrying the same 16-bit PCM as [[wavPcm16]] —
    * identical samples through the native [[FlacCodec]] decode path, so
    * a WAV-derived oracle checks the FLAC decode bit for bit (r18).
    * `stereoMode`/`subframeMode` pick the decorrelation and subframe
    * toolbox to exercise (see [[FlacCodec.encode]]).
    */
  def flacPcm16(rate: Int, channels: Int, samples: Array[Short],
                stereoMode: String = "independent",
                subframeMode: String = "auto",
                blockSize: Int = 4096): Array[Byte] =
    FlacCodec.encode(rate, channels, samples.map(_.toInt),
      blockSize = blockSize, stereoMode = stereoMode,
      subframeMode = subframeMode)

  /** RIFF/WAVE container carrying REAL G.711 payload (format tag 0x0007
    * mu-law / 0x0006 A-law, 8-bit, blockAlign == channels): `samples`
    * are interleaved LINEAR frames, companded here through
    * [[TelephonyAudio]]'s encoder — so a decode path that merely
    * un-containers without expanding the log codes cannot match an
    * amplitude oracle.
    */
  def wavG711(rate: Int, channels: Int, samples: Array[Short],
              alaw: Boolean): Array[Byte] = {
    require(rate > 0 && channels >= 1 && samples.length % channels == 0,
      s"bad g711 wav fixture: rate=$rate channels=$channels n=${samples.length}")
    val payload = TelephonyAudio.g711EncodePayload(samples.map(_.toInt), alaw)
    val pad = payload.length & 1
    val out = new java.io.ByteArrayOutputStream(58 + payload.length + pad)
    // RIFF size = WAVE(4) + fmt(8+18) + fact(8+4) + data(8+payload+pad)
    out.write(ascii("RIFF")); out.write(le32(50L + payload.length + pad))
    out.write(ascii("WAVE")); out.write(ascii("fmt ")); out.write(le32(18L))
    out.write(le16(if (alaw) 0x0006 else 0x0007)); out.write(le16(channels))
    out.write(le32(rate.toLong)); out.write(le32(rate.toLong * channels))
    out.write(le16(channels)); out.write(le16(8)) // block align, bits
    out.write(le16(0)) // cbSize: tag 6/7 carry an empty fmt extension
    out.write(ascii("fact")); out.write(le32(4L))
    out.write(le32((samples.length / channels).toLong))
    out.write(ascii("data")); out.write(le32(payload.length.toLong))
    out.write(payload)
    if ((payload.length & 1) == 1) out.write(0) // RIFF word alignment
    out.toByteArray
  }

  /** Sun AU container with REAL G.711 payload (encoding 1 mu-law / 27
    * A-law) — the other container telephony corpora arrive in, through
    * the same companding encoder as [[wavG711]].
    */
  def auG711(rate: Int, channels: Int, samples: Array[Short],
             alaw: Boolean): Array[Byte] = {
    require(rate > 0 && channels >= 1 && samples.length % channels == 0,
      s"bad g711 au fixture: rate=$rate channels=$channels n=${samples.length}")
    val payload = TelephonyAudio.g711EncodePayload(samples.map(_.toInt), alaw)
    val out = new java.io.ByteArrayOutputStream(24 + payload.length)
    out.write(ascii(".snd")); out.write(be32(24L))
    out.write(be32(payload.length.toLong))
    out.write(be32(if (alaw) 27L else 1L))
    out.write(be32(rate.toLong)); out.write(be32(channels.toLong))
    out.write(payload)
    out.toByteArray
  }

  /** RIFF/WAVE container with REAL IMA ADPCM blocks (format tag 0x0011,
    * 4-bit, fmt extension carrying wSamplesPerBlock, fact chunk carrying
    * the true frame count so partial final blocks decode exactly).
    */
  def wavImaAdpcm(rate: Int, channels: Int, samples: Array[Short],
                  samplesPerBlock: Int = 505): Array[Byte] = {
    require(rate > 0 && channels >= 1 && samples.length % channels == 0,
      s"bad ima wav fixture: rate=$rate channels=$channels n=${samples.length}")
    val (blocks, blockAlign, spb) = TelephonyAudio.adpcmEncodeBlocks(
      samples.map(_.toInt), channels, samplesPerBlock)
    val frames = samples.length / channels
    val byteRate = // average: blockAlign bytes per spb frames
      math.max(1L, rate.toLong * blockAlign / spb)
    val out = new java.io.ByteArrayOutputStream(60 + blocks.length)
    // RIFF size = WAVE(4) + fmt(8+20) + fact(8+4) + data(8+blocks)
    out.write(ascii("RIFF")); out.write(le32(52L + blocks.length))
    out.write(ascii("WAVE")); out.write(ascii("fmt ")); out.write(le32(20L))
    out.write(le16(0x0011)); out.write(le16(channels))
    out.write(le32(rate.toLong)); out.write(le32(byteRate))
    out.write(le16(blockAlign)); out.write(le16(4)) // block align, bits
    out.write(le16(2)); out.write(le16(spb)) // cbSize, wSamplesPerBlock
    out.write(ascii("fact")); out.write(le32(4L))
    out.write(le32(frames.toLong))
    out.write(ascii("data")); out.write(le32(blocks.length.toLong))
    out.write(blocks)
    out.toByteArray
  }

  /** Sun AU container (".snd") with REAL 16-bit signed BIG-endian PCM —
    * the JDK's other PCM container, covering the opposite endianness of
    * [[wavPcm16]] through the same decode path.
    */
  def auPcm16(rate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(rate > 0 && channels >= 1 && samples.length % channels == 0,
      s"bad au fixture: rate=$rate channels=$channels n=${samples.length}")
    val dataLen = samples.length * 2
    val out = new java.io.ByteArrayOutputStream(24 + dataLen)
    out.write(ascii(".snd")); out.write(be32(24L)) // header offset
    out.write(be32(dataLen.toLong)); out.write(be32(3L)) // 16-bit linear PCM
    out.write(be32(rate.toLong)); out.write(be32(channels.toLong))
    samples.foreach { s => out.write((s >> 8) & 0xFF); out.write(s & 0xFF) }
    out.toByteArray
  }
}
