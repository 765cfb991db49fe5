package graft.probes

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{MediaFixtures, Multimodal}

/** Probes for the multimodal binary-column operators. Media blobs are
  * synthesized deterministically from the documents table, so the stub
  * decode results are re-derivable in closed form — the oracles check the
  * binary-column plumbing end to end without parsing binary in SQL.
  * MultimodalSpec pins the codec-boundary semantics.
  */
object MultimodalProbes {

  val all: Seq[Probe] = Seq(

    // The stub encode→decode roundtrip must hand back exactly the typed
    // metadata that went in — which the oracle re-derives from the source
    // table without touching the binary, so the whole binary-column
    // plumbing (encode, schema, partition-wise decode, error isolation)
    // is hash-checked end to end.
    Probe(
      "multimodal_decode",
      "SELECT doc_id AS media_id, CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind, CAST(64 + doc_id % 64 AS INT) AS width, CAST(48 + doc_id % 48 AS INT) AS height, CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes FROM documents ORDER BY media_id"
    ) { (s, d) =>
      import s.implicits._
      val media = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          val kind = Seq("image", "audio", "video")((id % 3).toInt)
          (id, Multimodal.encodeStub(kind, 64 + (id % 64).toInt,
            48 + (id % 48).toInt, 24, text.getBytes("UTF-8")))
        }
        .toDF("media_id", "content")
      Multimodal.decodeMeta(media).toDF()
        .select(col("mediaId").as("media_id"), col("meta.kind").as("kind"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.payloadBytes").as("payload_bytes"))
        .orderBy("media_id")
    },

    // Frame sampling arithmetic (stub: one frame per fps-sized payload
    // slice, strided every 2nd) re-derived in closed form by the oracle.
    Probe(
      "multimodal_frame_sample",
      "WITH v AS (SELECT doc_id, octet_length(encode(text)) // 24 AS frames FROM documents WHERE doc_id % 3 = 2) SELECT doc_id AS media_id, CAST((frames + 1) // 2 AS BIGINT) AS n_frames, CAST(((frames - 1) // 2) * 2 AS INT) AS last_frame FROM v WHERE frames > 0 ORDER BY media_id"
    ) { (s, d) =>
      import s.implicits._
      val media = Tables.load(s, d, "documents")
        .filter(pmod(col("doc_id"), lit(3)) === 2) // the "video" subset
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          (id, Multimodal.encodeStub("video", 320, 240, 24, text.getBytes("UTF-8")))
        }
        .toDF("media_id", "content")
      Multimodal.sampleFrames(media, everyNth = 2)
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_frames"), max(col("frame_idx")).as("last_frame"))
        .orderBy("media_id")
    },

    // REAL compressed-container header decode (CompressedMedia): each doc
    // row becomes one of six real byte formats (MP3/ADTS/FLAC/Ogg-Opus/
    // MP4-video/M4A) with parameters derived from doc_id, so the oracle
    // re-derives every decoded field — rate, channels, video dims, fps,
    // payload size — in closed form without parsing binary in SQL. This
    // pins the documented public layouts end to end through the same
    // partition-wise decode path as the stub probe.
    Probe(
      "multimodal_compressed_meta",
      "SELECT doc_id AS media_id, " +
        "CASE WHEN doc_id % 6 = 4 THEN 'video' ELSE 'audio' END AS kind, " +
        "CAST(CASE doc_id % 6 " +
        "WHEN 0 THEN CASE (doc_id // 6) % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END " +
        "WHEN 1 THEN CASE (doc_id // 6) % 5 WHEN 0 THEN 48000 WHEN 1 THEN 44100 WHEN 2 THEN 32000 WHEN 3 THEN 24000 ELSE 22050 END " +
        "WHEN 2 THEN 32000 WHEN 3 THEN 48000 " +
        "WHEN 4 THEN 640 + doc_id % 16 ELSE 44100 END AS INT) AS width, " +
        "CAST(CASE WHEN doc_id % 6 = 4 THEN 360 + doc_id % 9 ELSE 1 + (doc_id // 6) % 2 END AS INT) AS height, " +
        "CAST(CASE WHEN doc_id % 6 = 4 THEN 24 ELSE 0 END AS INT) AS fps, " +
        "CAST(CASE doc_id % 6 " +
        "WHEN 0 THEN 4 + octet_length(encode(text)) " +
        "WHEN 1 THEN 7 + octet_length(encode(text)) " +
        "WHEN 2 THEN (500 + doc_id % 500) * (1 + (doc_id // 6) % 2) * 2 " +
        "WHEN 3 THEN 47 " +
        "ELSE octet_length(encode(text)) END AS BIGINT) AS payload_bytes " +
        "FROM documents ORDER BY media_id"
    ) { (s, d) =>
      import s.implicits._
      val media = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          val b = text.getBytes("UTF-8")
          val ch = 1 + ((id / 6) % 2).toInt
          val bytes = (id % 6).toInt match {
            case 0 => MediaFixtures.mp3(((id / 6) % 3).toInt, stereo = ch == 2, b)
            case 1 => MediaFixtures.adts(3 + ((id / 6) % 5).toInt, ch, b)
            case 2 => MediaFixtures.flac(32000, ch, 16, 500 + id % 500)
            case 3 => MediaFixtures.oggOpus(ch, 48000L)
            case 4 => MediaFixtures.mp4Video(640 + (id % 16).toInt,
              360 + (id % 9).toInt, 240L, 600L, 6000L, b)
            case _ => MediaFixtures.m4aAudio(ch, 44100, b)
          }
          (id, bytes)
        }
        .toDF("media_id", "content")
      Multimodal.decodeMeta(media).toDF()
        .select(col("mediaId").as("media_id"), col("meta.kind").as("kind"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.fps").as("fps"), col("meta.payloadBytes").as("payload_bytes"))
        .orderBy("media_id")
    }
  )
}
