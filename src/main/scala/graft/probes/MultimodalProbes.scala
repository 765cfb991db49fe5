package graft.probes

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.Multimodal

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
    }
  )
}
