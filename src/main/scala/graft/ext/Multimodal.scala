package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** [EXT] Multimodal columns: images/audio/video as opaque `binary` columns
  * with typed metadata (SURVEY north-star). The Spark-side plumbing —
  * schemas, partitioning-friendly batch shapes, mapPartitions decode with
  * init-once codecs (the JVM analogue of PySpark's mapInPandas batch
  * iteration), per-row error isolation — is real and tested.
  *
  * Codec status: IMAGES are decoded for real via the JDK's javax.imageio
  * (PNG/JPEG/GIF/BMP — format sniffing, header-only dimension reads, and
  * a real `resizeImages` re-encoder); uncompressed AUDIO containers
  * (WAV/AIFF/AU) decode their headers for real via the JDK's
  * javax.sound.sampled (sample rate, channels, raw payload size — no
  * sample decode); COMPRESSED containers (MP3, ADTS-AAC, FLAC, Ogg
  * Vorbis/Opus, MP4/M4A, WebM/Matroska — incl. video dims + frame counts) decode
  * their headers for real via [[CompressedMedia]]'s pure byte parsers.
  * PIXEL decode of the JDK raster formats is REAL too ([[ImageFeatures]]
  * hashes fully-decoded rasters; `resizeImages` below re-encodes them),
  * as is SAMPLE decode of the uncompressed audio containers
  * ([[AudioFeatures]] folds waveform features over real PCM frames).
  * Only sample decode of COMPRESSED codecs remains a declared STUB (the
  * JDK ships no such codecs and none are available in this environment)
  * behind a deterministic container format, exactly like the pluggable
  * `Parse.DocParser` boundary.
  *
  * STUB FORMAT ("GMM1"): ascii header `GMM1|<kind>|<width>|<height>|<fps>|`
  * followed by payload bytes. A production build replaces the GMM1 branch
  * of `decodeHeader` with a real codec (e.g. ffmpeg bindings) — nothing
  * else changes shape.
  */
object Multimodal {

  final case class MediaMeta(kind: String, width: Int, height: Int,
                             fps: Int, payloadBytes: Long)
  final case class DecodedMedia(mediaId: Long, meta: MediaMeta)

  /** Encode a deterministic fake media blob (test/synthesis helper). */
  def encodeStub(kind: String, width: Int, height: Int, fps: Int,
                 payload: Array[Byte]): Array[Byte] = {
    val header = s"GMM1|$kind|$width|$height|$fps|"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    header ++ payload
  }

  /** Header-only image dimension read via the JDK's pluggable ImageIO
    * reader registry: the registry sniffs the format from the leading
    * bytes, and `ImageReader.getWidth/getHeight` parse only the header
    * (IHDR / SOF0 / logical-screen descriptor) — no pixel decode, so
    * metadata extraction over a 100 TB image corpus costs header bytes,
    * not decoded rasters.
    */
  private def imageDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try { r.setInput(iis); Some((r.getWidth(0), r.getHeight(0))) }
        finally r.dispose()
      }
    } finally iis.close()
  }

  /** Real audio header decode for the formats the JDK ships SPIs for
    * (WAV/AIFF/AU): `AudioSystem.getAudioFileFormat` parses only the
    * container header (RIFF/FORM chunk), no sample decode — the same
    * header-bytes-only cost profile as [[imageDims]]. Mapping into
    * [[MediaMeta]]: width = sample rate in Hz, height = channel count,
    * fps = 0, payloadBytes = frame count × frame size when the header
    * declares them (raw sample bytes), else the container length.
    */
  private def audioMeta(bytes: Array[Byte]): Option[MediaMeta] =
    try {
      val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val af = fmt.getFormat
      val frames = fmt.getFrameLength
      val frameSize = af.getFrameSize
      val payload =
        if (frames > 0 && frameSize > 0) frames.toLong * frameSize
        else bytes.length.toLong
      // an SPI may report NOT_SPECIFIED (-1) fields: a container without
      // a concrete sample rate or channel count is undecodable metadata,
      // not a MediaMeta carrying sentinels into downstream rows
      if (af.getSampleRate <= 0 || af.getChannels <= 0) None
      else Some(MediaMeta("audio", math.round(af.getSampleRate),
        af.getChannels, 0, payload))
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException                               => None
    }

  /** Decode boundary. Real raster formats the JDK ships codecs for
    * (PNG/JPEG/GIF/BMP/WBMP) decode for real, as do the JDK's audio
    * containers (WAV/AIFF/AU — header-only, see [[audioMeta]]) and the
    * compressed containers [[CompressedMedia]] parses headers for
    * (MP3/ADTS-AAC/FLAC/Ogg Vorbis/Opus/MP4/M4A/WebM — pure byte parsing,
    * no codec); anything else must be a GMM1 container (the declared stub
    * for formats outside that set) or the call throws and the caller's
    * per-row isolation drops the row.
    */
  def decodeHeader(bytes: Array[Byte]): MediaMeta =
    (if (isStub(bytes)) None
     else
       // compressed-container magics BEFORE the SPI sniffs: they are
       // plain leading-byte compares (~free for non-matching rows),
       // while ImageIO/AudioSystem sniffs walk provider registries —
       // same measured ordering rationale as the stub-magic-first fix
       CompressedMedia.meta(bytes)
         .orElse(imageDims(bytes).map { case (w, h) =>
           MediaMeta("image", w, h, 0, bytes.length.toLong)
         })
         // stub magic BEFORE the audio SPI sniff: the 5-byte check keeps
         // the per-row cost of a stub corpus flat, while a real
         // WAV/AIFF/AU (no GMM1 magic) still reaches audioMeta (order
         // measured: running the SPI provider scan on every stub row
         // cost ~4x on the decode bench)
         .orElse(audioMeta(bytes))) match {
      case Some(meta) => meta
      case None =>
        // payloads nothing here decodes must fail loudly and cheaply —
        // never scanned, never materialized as a string, never a silent
        // null — with an error naming the plug point
        if (!isStub(bytes)) throw new IllegalArgumentException(
          s"cannot decode ${bytes.length}-byte payload: not a JDK-decodable " +
            "image (PNG/JPEG/GIF/BMP/WBMP) or audio container (WAV/AIFF/AU), " +
            "not a parseable compressed container (MP3/ADTS-AAC/FLAC/Ogg/MP4/WebM " +
            "— see CompressedMedia), and not a GMM1 stub container. Sample/" +
            "pixel DECODE of compressed media needs a production codec " +
            "plugged in at the decodeHeader boundary (README: Production " +
            "codec boundaries)")
        val headEnd = {
          var i = 0; var bars = 0
          while (i < bytes.length && bars < 5) { if (bytes(i) == '|') bars += 1; i += 1 }
          i
        }
        val head = new String(bytes, 0, headEnd, java.nio.charset.StandardCharsets.US_ASCII)
        val parts = head.split('|')
        require(bars(head) == 5 && parts.length >= 5 &&
          parts(2).toIntOption.isDefined && parts(3).toIntOption.isDefined &&
          parts(4).toIntOption.isDefined,
          s"malformed GMM1 container header: ${head.take(64)}")
        MediaMeta(parts(1), parts(2).toInt, parts(3).toInt, parts(4).toInt,
          (bytes.length - headEnd).toLong)
    }

  private def bars(s: String): Int = s.count(_ == '|')

  /** True when the payload carries the GMM1 stub magic (≤5 bytes read). */
  private def isStub(bytes: Array[Byte]): Boolean = {
    val magic = "GMM1|".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    bytes.length >= magic.length && magic.indices.forall(i => bytes(i) == magic(i))
  }

  /** Decode a DataFrame of (`media_id` long, `content` binary) into typed
    * metadata rows. mapPartitions keeps one (stub) codec per partition and
    * isolates per-row decode failures (null-on-error + filter), the same
    * discipline as the reference's per-element isolation
    * (pdf_parser.py:181-184).
    */
  def decodeMeta(media: DataFrame): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // codec init would happen here, once per partition
        it.flatMap { case (id, bytes) =>
          try Iterator.single(DecodedMedia(id, decodeHeader(bytes)))
          catch { case _: Exception => Iterator.empty }
        }
      }
  }

  /** REAL image resize (JDK codecs, no external libs): decode, scale so
    * the larger dimension fits `maxDim` (aspect preserved, never
    * upscaled), re-encode as PNG. Rows already within the bound are
    * validated by the decode but emitted byte-identical (original
    * format kept, no re-encode inflation). Per-row CPU, zero shuffle —
    * the scan parallelism IS the resize parallelism, so the operator's
    * 100 TB story is purely "how many cores". Rows that aren't fully
    * decodable raster images (including truncated bodies behind intact
    * headers) are dropped (per-row isolation, same discipline as
    * decodeMeta); use [[resizeStub]] for GMM1 containers.
    */
  def resizeImages(media: DataFrame, maxDim: Int): DataFrame = {
    require(maxDim > 0, s"maxDim must be positive, got $maxDim")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            if (img == null) Iterator.empty // not a decodable raster
            else if (math.max(img.getWidth, img.getHeight) <= maxDim)
              // within bound: the decode above VALIDATED the payload (a
              // truncated body behind an intact header must still be
              // isolated, not emitted), but the original bytes pass
              // through — no format change, no size inflation from a
              // lossless re-encode of a no-op
              Iterator.single((id, bytes))
            else {
              val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
              val (w, h) = (math.max(1, (img.getWidth * scale).toInt),
                math.max(1, (img.getHeight * scale).toInt))
              // preserve transparency: flattening ARGB onto an RGB
              // canvas composites transparent pixels to black
              val imgType =
                if (img.getColorModel.hasAlpha)
                  java.awt.image.BufferedImage.TYPE_INT_ARGB
                else java.awt.image.BufferedImage.TYPE_INT_RGB
              val scaled = new java.awt.image.BufferedImage(w, h, imgType)
              val g = scaled.createGraphics()
              try {
                g.setRenderingHint(
                  java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(img, 0, 0, w, h, null)
              } finally g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(scaled, "png", bos)
              Iterator.single((id, bos.toByteArray))
            }
          } catch { case _: Exception => Iterator.empty }
        }
      }
      .toDF("media_id", "content")
  }

  /** "Resize" for GMM1 stub containers ONLY: halves the payload for each
    * halving step of the larger dimension — a deterministic stand-in with
    * a real codec's cost shape (per-row CPU, no shuffle). Rows that are
    * not GMM1 containers are DROPPED, never re-encoded: a real PNG or WAV
    * flowing through here must not come out as a zero-filled synthetic
    * container (use [[resizeImages]] for real rasters).
    */
  def resizeStub(media: DataFrame, maxDim: Int): DataFrame = {
    require(maxDim > 0, s"maxDim must be positive, got $maxDim") // same
    // guard as resizeImages — and a non-positive bound would spin the
    // halving loop forever once w and h hit 0
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      // per-row isolation (decodeHeader's documented contract): a corrupt
      // blob drops its row instead of aborting the job
      .flatMap { case (id, bytes) =>
        try {
          if (!isStub(bytes)) Iterator.empty
          else {
            val m = decodeHeader(bytes)
            var (w, h, p) = (m.width, m.height, bytes.length)
            while (math.max(w, h) > maxDim) { w /= 2; h /= 2; p /= 2 }
            Iterator.single(
              (id, encodeStub(m.kind, w, h, m.fps, new Array[Byte](math.max(0, p)))))
          }
        } catch { case scala.util.control.NonFatal(_) => Iterator.empty }
      }
      .toDF("media_id", "content")
  }

  /** Frame sampling for "video" blobs: emit one row per sampled frame
    * index at `everyNth` cadence — the generator (1 video row → N frame
    * rows) shape a real extractor has. For real MP4 video the frame
    * count is the REAL `stts` sample total ([[CompressedMedia
    * .videoFrameCount]] — frame enumeration is pure header metadata;
    * only pixel extraction needs a codec); for GMM1 stubs it is the
    * deterministic one-"frame"-per-fps-sized-payload-slice arithmetic.
    */
  def sampleFrames(media: DataFrame, everyNth: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        // per-row isolation, same contract as decodeMeta/resizeStub
        try {
          // (meta, frames) in ONE container parse — decodeHeader followed
          // by videoFrameCount would walk the MP4/EBML tree twice per row
          val parsed: Option[(MediaMeta, Option[Long])] =
            if (isStub(bytes)) {
              val m = decodeHeader(bytes)
              // frame count stub: one "frame" per fps-sized payload slice
              Some((m, Some(m.payloadBytes / math.max(1, m.fps))))
            } else CompressedMedia.metaAndFrames(bytes)
          parsed match {
            case Some((m, fc)) if m.kind == "video" =>
              // a real container that declares no frame table (Ogg
              // Theora ident, fragmented MP4 whose samples live in moof
              // fragments) enumerates ZERO frames — deliberately: frame
              // indices here are real metadata, never fps-derived
              // guesswork, and such rows are distinguishable upstream
              // (decodeMeta still returns their full MediaMeta)
              val frames = fc.fold(0)(n => math.min(n, Int.MaxValue.toLong).toInt)
              (0 until frames by math.max(1, everyNth)).iterator
                .map(f => (id, f, m.width, m.height))
            case _ => Iterator.empty
          }
        } catch { case scala.util.control.NonFatal(_) => Iterator.empty }
      }
      .toDF("media_id", "frame_idx", "width", "height")
  }
}
