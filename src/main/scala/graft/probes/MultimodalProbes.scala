package graft.probes

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{AudioFeatures, Dedup, ImageFeatures, MediaFixtures, Multimodal}

/** Probes for the multimodal binary-column operators. Media blobs are
  * synthesized deterministically from the documents table, so the stub
  * decode results are re-derivable in closed form — the oracles check the
  * binary-column plumbing end to end without parsing binary in SQL.
  * MultimodalSpec pins the codec-boundary semantics.
  */
object MultimodalProbes {

  /** The shared FLAC fixture corpus of media_flac_pcm and
    * media_flac_transcode: ONE builder under ONE mediaFixtureFor cache
    * key, so both probes provably consume identical blobs whatever the
    * probe selection or run order (square waves with closed-form
    * features; stereo decorrelation and subframe strategy cycle by
    * doc_id so every decoder path faces the oracle).
    */
  private def flacFixture(s: SparkSession, d: String): String =
    Probe.mediaFixtureFor(d, "audio-flac") {
      import s.implicits._
      Tables.load(s, d, "documents")
        .select(col("doc_id")).as[Long]
        .map { id =>
          val a = (1000 + (id % 100) * 10).toInt
          val p = (5 + id % 7).toInt
          val n = (400 + id % 200).toInt
          val ch = (1 + id % 2).toInt
          val rate = (id % 3) match {
            case 0 => 8000; case 1 => 16000; case _ => 44100
          }
          val samples = new Array[Short](n * ch)
          var i = 0
          while (i < n) {
            val v = (if ((i / p) % 2 == 0) a else -a).toShort
            var c = 0
            while (c < ch) { samples(i * ch + c) = v; c += 1 }
            i += 1
          }
          val stereoMode =
            if (ch == 1) "independent"
            else Seq("independent", "left-side", "right-side",
              "mid-side")((id % 4).toInt)
          val subframeMode =
            Seq("auto", "verbatim", "lpc")((id % 5).toInt % 3)
          (id, MediaFixtures.flacPcm16(rate, ch, samples,
            stereoMode = stereoMode, subframeMode = subframeMode,
            blockSize = 256))
        }
        .toDF("media_id", "content")
    }

  /** The shared G.711 fixture corpus of media_g711_pcm and
    * media_g711_transcode: square waves whose amplitudes are EXACT
    * G.711 codepoints (mu-law `(q*8+132)*2^e - 132`, A-law `seg==0 ?
    * 16q+8 : (16q+264)*2^(seg-1)`), so companding round-trips them
    * bit-exactly and the oracle re-derives every amplitude in closed
    * form. Law, container (WAV tag 6/7 vs AU encoding 1/27), channel
    * count, and segment/quant cycle by doc_id so every decode path
    * faces the oracle.
    */
  private def g711Fixture(s: SparkSession, d: String): String =
    Probe.mediaFixtureFor(d, "audio-g711") {
      import s.implicits._
      Tables.load(s, d, "documents")
        .select(col("doc_id")).as[Long]
        .map { id =>
          val e = (id % 8).toInt
          val q = (1 + (id / 8) % 15).toInt
          val alaw = id % 2 != 0
          val amp =
            if (!alaw) ((q * 8 + 132) << e) - 132
            else if (e == 0) 16 * q + 8
            else (16 * q + 264) << (e - 1)
          val n = (400 + id % 200).toInt
          val p = (5 + id % 7).toInt
          val ch = (1 + (id / 4) % 2).toInt
          val rate = if (id % 3 == 0) 8000 else 16000
          val samples = new Array[Short](n * ch)
          var i = 0
          while (i < n) {
            val v = (if ((i / p) % 2 == 0) amp else -amp).toShort
            var c = 0
            while (c < ch) { samples(i * ch + c) = v; c += 1 }
            i += 1
          }
          val blob =
            if ((id / 2) % 2 == 0) MediaFixtures.wavG711(rate, ch, samples, alaw)
            else MediaFixtures.auG711(rate, ch, samples, alaw)
          (id, blob)
        }
        .toDF("media_id", "content")
    }

  private val g711OracleSql: String =
    "WITH p AS (SELECT doc_id, doc_id % 8 AS e, 1 + (doc_id // 8) % 15 AS q FROM documents), " +
      "a AS (SELECT doc_id, CASE WHEN doc_id % 2 = 0 " +
      "THEN (q*8 + 132) * CAST(POWER(2, e) AS BIGINT) - 132 " +
      "ELSE CASE WHEN e = 0 THEN 16*q + 8 ELSE (16*q + 264) * CAST(POWER(2, e - 1) AS BIGINT) END END AS amp FROM p) " +
      "SELECT doc_id AS media_id, " +
      "CAST(CASE WHEN doc_id % 3 = 0 THEN 8000 ELSE 16000 END AS INT) AS sample_rate, " +
      "CAST(1 + (doc_id // 4) % 2 AS INT) AS channels, " +
      "CAST(400 + doc_id % 200 AS BIGINT) AS frames, " +
      "round(CAST(amp AS DOUBLE), 4) AS rms, " +
      "CAST(amp AS INT) AS peak, " +
      "CAST((400 + doc_id % 200 - 1) // (5 + doc_id % 7) AS BIGINT) AS zero_crossings " +
      "FROM a ORDER BY media_id"

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
        .repartition(1).sortWithinPartitions("media_id")
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
        .repartition(1).sortWithinPartitions("media_id")
    },

    // REAL pixel decode, end to end: each doc's md5-derived 60-bit value
    // is rendered as a real PNG (MediaFixtures.dhashPng), then
    // ImageFeatures decodes the raster with the JDK codec and recomputes
    // the dHash + the exact pixel luma sum. The oracle re-derives BOTH in
    // closed form from the md5 arithmetic alone — so one flipped bit
    // anywhere in encode -> PNG -> decode -> downsample -> hash mismatches.
    Probe(
      "media_image_dhash",
      "WITH s AS (SELECT doc_id, CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS sig FROM documents) " +
        "SELECT doc_id AS media_id, CAST(27 AS INT) AS width, CAST(24 AS INT) AS height, sig AS dhash, " +
        "CAST(9 * (72 * 120 + 10 * list_sum([(8 - (i % 8)) * (CASE WHEN (sig >> i) & 1 = 1 THEN 1 ELSE -1 END) for i in range(0, 64)])) AS BIGINT) AS sum_luma " +
        "FROM s ORDER BY media_id"
    ) { (s, d) =>
      val path = PhaseTimer.timed("media_image_dhash", "fixture_ensure") {
        Probe.mediaFixtureFor(d, "dhash-png") {
          import s.implicits._
          Tables.load(s, d, "documents")
            .select(col("doc_id")).as[Long]
            .map(id => (id, MediaFixtures.dhashPng(Dedup.md5Hash60(id.toString))))
            .toDF("media_id", "content")
        }
      }
      ImageFeatures.imageFeatures(s.read.parquet(path))
        .select("media_id", "width", "height", "dhash", "sum_luma")
        .repartition(1).sortWithinPartitions("media_id")
    },

    // Image near-dup over REAL decoded rasters: groups of 4 docs share an
    // md5-derived base signature with planted bit flips (0 / 1 / 2 / 7
    // bits), so each group yields exactly the pairs at Hamming 1, 2, 3
    // while the 7-flip member stays outside the radius. The engine goes
    // image bytes -> real decode -> dHash -> 16-bit band join -> popcount
    // verify; the oracle replays signature arithmetic + ALL-pairs Hamming
    // in pure SQL.
    Probe(
      "dedup_image_neardup",
      "WITH s AS (SELECT doc_id, doc_id // 4 AS g, doc_id % 4 AS m FROM documents), " +
        "b AS (SELECT doc_id, g, m, CAST('0x' || substring(md5(CAST(g AS VARCHAR) || '_base'), 1, 15) AS BIGINT) AS base FROM s), " +
        "sg AS (SELECT doc_id, CASE m WHEN 0 THEN base " +
        "WHEN 1 THEN xor(base, 1::BIGINT << CAST(g % 60 AS INT)) " +
        "WHEN 2 THEN xor(base, (1::BIGINT << CAST((g + 17) % 60 AS INT)) | (1::BIGINT << CAST((g + 31) % 60 AS INT))) " +
        "ELSE xor(base, CAST(list_sum([1::BIGINT << CAST((g + 1 + 7 * j) % 60 AS INT) for j in range(0, 7)]) AS BIGINT)) END AS sig FROM b) " +
        "SELECT a.doc_id AS id_a, b2.doc_id AS id_b, CAST(bit_count(xor(a.sig, b2.sig)) AS BIGINT) AS hamming " +
        "FROM sg a JOIN sg b2 ON a.doc_id < b2.doc_id " +
        "WHERE bit_count(xor(a.sig, b2.sig)) <= 3 ORDER BY id_a, id_b"
    ) { (s, d) =>
      val path = PhaseTimer.timed("dedup_image_neardup", "fixture_ensure") {
        Probe.mediaFixtureFor(d, "neardup-png") {
          import s.implicits._
          Tables.load(s, d, "documents")
            .select(col("doc_id")).as[Long]
            .map { id =>
              val g = id / 4
              var sig = Dedup.md5Hash60(s"${g}_base")
              (id % 4) match {
                case 1 => sig ^= 1L << ((g % 60).toInt)
                case 2 => sig ^= (1L << (((g + 17) % 60).toInt)) |
                  (1L << (((g + 31) % 60).toInt))
                case 3 => (0 until 7).foreach(j =>
                  sig ^= 1L << (((g + 1 + 7 * j) % 60).toInt))
                case _ =>
              }
              (id, MediaFixtures.dhashPng(sig))
            }
            .toDF("media_id", "content")
        }
      }
      ImageFeatures.imageNearDupPairs(s.read.parquet(path), maxHamming = 3)
        .orderBy("id_a", "id_b")
    },

    // REAL waveform decode (javax.sound, 16-bit PCM): each doc becomes a
    // WAV square wave whose amplitude / half-period / length derive from
    // doc_id, so RMS (= amplitude, exactly), peak, decoded frame count,
    // and zero crossings are all closed-form. The engine decodes the
    // actual samples — a header-only shortcut cannot produce rms/peak/zc.
    Probe(
      "media_audio_features",
      "SELECT doc_id AS media_id, " +
        "CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END AS INT) AS sample_rate, " +
        "CAST(1 + doc_id % 2 AS INT) AS channels, " +
        "CAST(400 + doc_id % 200 AS BIGINT) AS frames, " +
        "round(CAST(1000 + (doc_id % 100) * 10 AS DOUBLE), 4) AS rms, " +
        "CAST(1000 + (doc_id % 100) * 10 AS INT) AS peak, " +
        "CAST((400 + doc_id % 200 - 1) // (5 + doc_id % 7) AS BIGINT) AS zero_crossings " +
        "FROM documents ORDER BY media_id"
    ) { (s, d) =>
      val path = PhaseTimer.timed("media_audio_features", "fixture_ensure") {
        Probe.mediaFixtureFor(d, "audio-wav") {
          import s.implicits._
          Tables.load(s, d, "documents")
            .select(col("doc_id")).as[Long]
            .map { id =>
              val a = (1000 + (id % 100) * 10).toInt
              val p = (5 + id % 7).toInt
              val n = (400 + id % 200).toInt
              val ch = (1 + id % 2).toInt
              val rate = (id % 3) match {
                case 0 => 8000; case 1 => 16000; case _ => 44100
              }
              val samples = new Array[Short](n * ch)
              var i = 0
              while (i < n) {
                val v = (if ((i / p) % 2 == 0) a else -a).toShort
                var c = 0
                while (c < ch) { samples(i * ch + c) = v; c += 1 }
                i += 1
              }
              (id, MediaFixtures.wavPcm16(rate, ch, samples))
            }
            .toDF("media_id", "content")
        }
      }
      AudioFeatures.audioFeatures(s.read.parquet(path))
        .withColumn("rms", round(col("rms"), 4))
        .repartition(1).sortWithinPartitions("media_id")
    },

    // REAL FLAC sample decode (r18, native FlacCodec — no codec library):
    // the SAME closed-form square waves as media_audio_features, but
    // carried as genuine FLAC (Rice-coded fixed predictors, CRC-sealed
    // frames) with the stereo decorrelation and subframe strategy cycling
    // by doc_id so every decoder path faces the oracle. RMS == amplitude
    // EXACTLY is only possible if every decoded sample is bit-exact —
    // a lossy or approximate decode cannot pass this hash.
    Probe(
      "media_flac_pcm",
      "SELECT doc_id AS media_id, " +
        "CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END AS INT) AS sample_rate, " +
        "CAST(1 + doc_id % 2 AS INT) AS channels, " +
        "CAST(400 + doc_id % 200 AS BIGINT) AS frames, " +
        "round(CAST(1000 + (doc_id % 100) * 10 AS DOUBLE), 4) AS rms, " +
        "CAST(1000 + (doc_id % 100) * 10 AS INT) AS peak, " +
        "CAST((400 + doc_id % 200 - 1) // (5 + doc_id % 7) AS BIGINT) AS zero_crossings " +
        "FROM documents ORDER BY media_id"
    ) { (s, d) =>
      val path = PhaseTimer.timed("media_flac_pcm", "fixture_ensure") {
        flacFixture(s, d)
      }
      AudioFeatures.audioFeatures(s.read.parquet(path))
        .withColumn("rms", round(col("rms"), 4))
        .repartition(1).sortWithinPartitions("media_id")
    },

    // Audio-corpus NORMALIZATION (r18): the whole FLAC fixture corpus
    // rewritten as 16-bit PCM WAV (AudioFeatures.normalizeToWav — the
    // "one container for the training loader" pass), then features
    // folded over the REWRAPPED bytes through the javax.sound WAV
    // reader. Cross-implementation proof: samples leave through the
    // native FLAC decoder + deterministic WAV writer and re-enter
    // through the JDK's independent RIFF parser — the same closed-form
    // oracle only hashes green if both agree bit-for-bit on every blob.
    Probe(
      "media_flac_transcode",
      "SELECT doc_id AS media_id, " +
        "CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END AS INT) AS sample_rate, " +
        "CAST(1 + doc_id % 2 AS INT) AS channels, " +
        "CAST(400 + doc_id % 200 AS BIGINT) AS frames, " +
        "round(CAST(1000 + (doc_id % 100) * 10 AS DOUBLE), 4) AS rms, " +
        "CAST(1000 + (doc_id % 100) * 10 AS INT) AS peak, " +
        "CAST((400 + doc_id % 200 - 1) // (5 + doc_id % 7) AS BIGINT) AS zero_crossings " +
        "FROM documents ORDER BY media_id"
    ) { (s, d) =>
      val path = PhaseTimer.timed("media_flac_transcode", "fixture_ensure") {
        flacFixture(s, d)
      }
      val normalized = PhaseTimer.timed("media_flac_transcode", "normalize") {
        AudioFeatures.normalizeToWav(s.read.parquet(path)).localCheckpoint()
      }
      AudioFeatures.audioFeatures(normalized)
        .withColumn("rms", round(col("rms"), 4))
        .repartition(1).sortWithinPartitions("media_id")
    },

    // REAL G.711 sample decode (r18, native TelephonyAudio — the ITU
    // companding laws are pure segment algebra, so the oracle computes
    // every amplitude in closed form). Amplitudes are exact codepoints:
    // RMS == amplitude EXACTLY requires the companded byte stream to
    // expand bit-exactly — TelephonyAudioSpec additionally sweeps both
    // laws code-for-code against the JDK's own independent converter.
    Probe("media_g711_pcm", g711OracleSql) { (s, d) =>
      val path = PhaseTimer.timed("media_g711_pcm", "fixture_ensure") {
        g711Fixture(s, d)
      }
      AudioFeatures.audioFeatures(s.read.parquet(path))
        .withColumn("rms", round(col("rms"), 4))
        .repartition(1).sortWithinPartitions("media_id")
    },

    // G.711 corpus NORMALIZATION (r18): the whole mixed WAV/AU telephony
    // corpus rewritten as 16-bit PCM WAV (normalizeToWav), features
    // folded over the REWRAPPED bytes through the JDK's independent RIFF
    // parser — companded bytes leave through the native expander and
    // re-enter through javax.sound, so the closed-form oracle only
    // hashes green if both agree on every decoded sample.
    Probe("media_g711_transcode", g711OracleSql) { (s, d) =>
      val path = PhaseTimer.timed("media_g711_transcode", "fixture_ensure") {
        g711Fixture(s, d)
      }
      val normalized = PhaseTimer.timed("media_g711_transcode", "normalize") {
        AudioFeatures.normalizeToWav(s.read.parquet(path)).localCheckpoint()
      }
      AudioFeatures.audioFeatures(normalized)
        .withColumn("rms", round(col("rms"), 4))
        .repartition(1).sortWithinPartitions("media_id")
    }
  )
}
