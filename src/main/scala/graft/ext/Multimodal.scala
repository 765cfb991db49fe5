package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** [EXT] Multimodal columns: images/audio/video as opaque `binary` columns
  * with typed metadata (SURVEY north-star). The Spark-side plumbing —
  * schemas, partitioning-friendly batch shapes, mapPartitions decode with
  * init-once codecs (the JVM analogue of PySpark's mapInPandas batch
  * iteration), per-row error isolation — is real and tested; the
  * actual codec is a STUB (no image/audio libraries ship in this
  * environment) behind a deterministic container format, exactly like the
  * pluggable `Parse.DocParser` boundary.
  *
  * STUB FORMAT ("GMM1"): ascii header `GMM1|<kind>|<width>|<height>|<fps>|`
  * followed by payload bytes. A production build replaces `decodeHeader`
  * with a real codec (e.g. javax.imageio / ffmpeg bindings) — nothing else
  * changes shape.
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

  /** STUB decode boundary — replace with a real codec in production. */
  def decodeHeader(bytes: Array[Byte]): MediaMeta = {
    val headEnd = {
      var i = 0; var bars = 0
      while (i < bytes.length && bars < 5) { if (bytes(i) == '|') bars += 1; i += 1 }
      i
    }
    val head = new String(bytes, 0, headEnd, java.nio.charset.StandardCharsets.US_ASCII)
    val parts = head.split('|')
    require(parts(0) == "GMM1", s"not a GMM1 container: ${parts(0)}")
    MediaMeta(parts(1), parts(2).toInt, parts(3).toInt, parts(4).toInt,
      (bytes.length - headEnd).toLong)
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

  /** "Resize": halves the payload for each halving step of the larger
    * dimension — a deterministic stand-in with a real codec's cost shape
    * (per-row CPU, no shuffle).
    */
  def resizeStub(media: DataFrame, maxDim: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val m = decodeHeader(bytes)
        var (w, h, p) = (m.width, m.height, bytes.length)
        while (math.max(w, h) > maxDim) { w /= 2; h /= 2; p /= 2 }
        (id, encodeStub(m.kind, w, h, m.fps, new Array[Byte](math.max(0, p))))
      }
      .toDF("media_id", "content")
  }

  /** Frame sampling for "video" blobs: emit one row per sampled frame
    * index at `everyNth` cadence — the generator (1 video row → N frame
    * rows) shape a real extractor has.
    */
  def sampleFrames(media: DataFrame, everyNth: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val m = decodeHeader(bytes)
        if (m.kind != "video") Iterator.empty
        else {
          // frame count stub: one "frame" per fps-sized payload slice
          val frames = (m.payloadBytes / math.max(1, m.fps)).toInt
          (0 until frames by math.max(1, everyNth)).iterator
            .map(f => (id, f, m.width, m.height))
        }
      }
      .toDF("media_id", "frame_idx", "width", "height")
  }
}
