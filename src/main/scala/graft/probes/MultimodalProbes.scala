package graft.probes

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.Multimodal

/** Probes for the multimodal binary-column operators. Binary codec work is
  * not SQL-expressible — rows-only, with MultimodalSpec pinning semantics.
  * Media blobs are synthesized deterministically from the documents table.
  */
object MultimodalProbes {

  val all: Seq[Probe] = Seq(

    Probe.unchecked("multimodal_decode") { (s, d) =>
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

    Probe.unchecked("multimodal_frame_sample") { (s, d) =>
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
