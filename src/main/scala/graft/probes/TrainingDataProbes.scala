package graft.probes

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Decontaminate, LangModel, Mixing, Quality, Quantize, Ranking, TextAnalysis => TA}

/** [EXT] Round-2 training-data curation operators: repetition quality
  * signals, benchmark decontamination, deterministic mixing/splits, PII
  * redaction, and BM25 relevance — each with a full DuckDB oracle (the
  * mixing and redaction operators are md5/regex-deterministic by design,
  * precisely so an external system can re-derive the assignments).
  */
object TrainingDataProbes {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val all: Seq[Probe] = Seq(

    // Gopher-style repetition signals (dup-token fraction, top-bigram
    // mass): one scalar pass per document, zero shuffle.
    Probe(
      "text_repetition_stats",
      "WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL), base AS (SELECT doc_id, len(ts) AS n, len(list_distinct(ts)) AS nd FROM tok), bg AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] AS b FROM tok, UNNEST(generate_series(1, len(ts) - 1)) AS g(i)), bgc AS (SELECT doc_id, max(c) AS maxc, sum(c) AS total FROM (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2) GROUP BY 1) SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, round(1.0 - nd * 1.0 / n, 9) AS dup_token_frac, round(coalesce(maxc * 1.0 / total, 0.0), 9) AS top_bigram_frac FROM base LEFT JOIN bgc USING (doc_id) ORDER BY doc_id"
    ) { (s, d) =>
      Quality.repetitionStats(t(s, d, "documents"), "doc_id", "text")
        .repartition(1).sortWithinPartitions("doc_id")
    },

    // Benchmark decontamination: docs sharing >= 1 distinct 3-gram with
    // the benchmark subset (doc_id % 50 = 0 stands in for an eval set).
    Probe(
      "decon_ngram_overlap",
      "WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents), sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s FROM tok, UNNEST(generate_series(1, len(ts) - 2)) AS g(i)), bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0) SELECT doc_id, count(*) AS n_hits FROM sh JOIN bench USING (s) GROUP BY doc_id ORDER BY doc_id"
    ) { (s, d) =>
      val docs = t(s, d, "documents")
      Decontaminate.ngramOverlap(docs, docs.filter(pmod(col("doc_id"), lit(50)) === 0),
        "doc_id", "text", n = 3, minOverlap = 1)
        .orderBy("doc_id")
    },

    // Deterministic hash split: 90/5/5 by md5 bucket of the salted id —
    // the oracle re-derives every assignment from scratch.
    Probe(
      "mix_hash_split",
      "SELECT doc_id, CASE WHEN CAST('0x' || substring(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000 < 9000 THEN 'train' WHEN CAST('0x' || substring(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000 < 9500 THEN 'val' ELSE 'test' END AS split FROM documents ORDER BY doc_id"
    ) { (s, d) =>
      Mixing.hashSplit(t(s, d, "documents"), "doc_id", "graft",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .select(col("doc_id"), col("split"))
        .repartition(1).sortWithinPartitions("doc_id")
    },

    // Per-language weighted downsample (en kept at 0.5, others at 0.25),
    // deterministic under the same md5 bucket.
    Probe(
      "mix_weighted_sample",
      "SELECT doc_id, lang FROM documents WHERE CAST('0x' || substring(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000 < CASE WHEN lang = 'en' THEN 5000 ELSE 2500 END ORDER BY doc_id"
    ) { (s, d) =>
      Mixing.weightedSample(t(s, d, "documents"), "doc_id", "lang",
        Map("en" -> 0.5), defaultWeight = 0.25, salt = "mix")
        .select(col("doc_id"), col("lang"))
        .repartition(1).sortWithinPartitions("doc_id")
    },

    // PII redaction over a synthesized doc-varying contact preamble (the
    // corpus body itself is PII-free and must pass through untouched).
    Probe(
      "text_pii_redact",
      """SELECT doc_id, regexp_replace(regexp_replace(regexp_replace('Contact user' || CAST(doc_id AS VARCHAR) || '@example.com or call 555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '. ' || text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'), '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g'), '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '[PHONE]', 'g') AS redacted FROM documents ORDER BY doc_id"""
    ) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          TA.redactPii(concat(lit("Contact user"), col("doc_id").cast("string"),
            lit("@example.com or call 555-123-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
            lit(". "), col("text"))).as("redacted"))
        .repartition(1).sortWithinPartitions("doc_id")
    },

    // Context-window splitting (64-token windows, stride 48): the
    // declarative long-document treatment before training; the oracle
    // re-derives every window's start/length/first-token in closed form.
    Probe(
      "text_token_windows",
      "WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL) SELECT doc_id, CAST((u.s - 1) // 48 AS INT) AS win_idx, CAST(u.s - 1 AS INT) AS win_start, CAST(least(64, len(ts) - u.s + 1) AS INT) AS n_tokens, ts[u.s] AS first_token FROM tok, UNNEST(generate_series(1, greatest(1, len(ts) - 16), 48)) AS u(s) ORDER BY doc_id, win_idx"
    ) { (s, d) =>
      graft.ops.Packing.tokenWindows(t(s, d, "documents"), "doc_id", "text",
        size = 64, stride = 48)
        .repartition(1).sortWithinPartitions("doc_id", "win_idx")
    },

    // L2 normalization (pre-normalized corpora turn cosine into a dot
    // product): per-vector norm and first normalized component, with the
    // norm materialized ONCE per row — the pattern that keeps the
    // interpreted transform O(d) instead of O(d²).
    Probe(
      "emb_l2_normalize",
      "WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), n AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm FROM e) SELECT vec_id, round(nrm, 9) AS norm, round(CASE WHEN nrm = 0.0 THEN v[1] ELSE v[1] / nrm END, 9) AS u0 FROM n ORDER BY vec_id"
    ) { (s, d) =>
      import graft.ext.Similarity
      t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", Similarity.l2Norm(col("v")))
        // get() is 0-based and null-on-out-of-bounds — element_at would
        // THROW on an empty vector under ANSI mode, where the oracle's
        // v[1] yields NULL
        .select(col("vec_id"), round(col("nrm"), 9).as("norm"),
          round(get(Similarity.l2Normalize(col("v"), col("nrm")), lit(0)), 9)
            .as("u0"))
        .repartition(1).sortWithinPartitions("vec_id")
    },

    // CCNet-style LM self-perplexity: add-one-smoothed bigram logprob
    // against the corpus's own statistics; the oracle rebuilds the counts
    // and folds the position-sorted logprob list identically.
    Probe(
      "text_lm_logprob",
      "WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL), uni AS (SELECT u.t AS w, count(*) AS c1 FROM tok, UNNEST(ts) AS u(t) GROUP BY u.t), v AS (SELECT CAST(count(*) AS DOUBLE) AS vsz FROM uni), bg AS (SELECT doc_id, u.i - 1 AS pos, ts[u.i] AS w1, ts[u.i] || ' ' || ts[u.i + 1] AS big FROM tok, UNNEST(generate_series(1, len(ts) - 1)) AS u(i)), c2 AS (SELECT big, count(*) AS cb FROM bg GROUP BY big), scored AS (SELECT doc_id, pos, ln((c2.cb + 1.0) / (uni.c1 + v.vsz)) AS lp FROM bg JOIN c2 USING (big) JOIN uni ON bg.w1 = uni.w CROSS JOIN v), agg AS (SELECT doc_id, count(*) AS n_bigrams, list(lp ORDER BY pos) AS lps FROM scored GROUP BY doc_id) SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams, round(list_reduce(list_prepend(0.0, lps), (a, b) -> a + b) / n_bigrams, 6) AS avg_lp FROM agg ORDER BY doc_id"
    ) { (s, d) =>
      LangModel.bigramSelfLogProb(t(s, d, "documents"), "doc_id", "text")
        .repartition(1).sortWithinPartitions("doc_id")
    },

    // Symmetric int8 embedding quantization: scale, code sum, and mean
    // squared reconstruction error, all plain ANSI arithmetic the oracle
    // re-derives (element-order folds keep the doubles bit-equal).
    Probe(
      "emb_quantize_int8",
      "WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), s AS (SELECT vec_id, v, coalesce(list_max(list_transform(v, x -> abs(x))), 0.0) / 127.0 AS scale FROM e), qd AS (SELECT vec_id, v, scale, list_transform(v, x -> CASE WHEN scale = 0.0 THEN 0::BIGINT ELSE greatest(-127::BIGINT, least(127::BIGINT, CAST(round(x / scale) AS BIGINT))) END) AS q FROM s) SELECT vec_id, round(scale, 9) AS scale_r, CAST(list_sum(q) AS BIGINT) AS q_sum, round(CASE WHEN len(v) > 0 THEN list_reduce(list_prepend(0.0, [ (v[i] - CAST(q[i] AS DOUBLE) * scale) * (v[i] - CAST(q[i] AS DOUBLE) * scale) for i in range(1, len(v)+1) ]), (a, b) -> a + b) / len(v) ELSE 0.0 END, 9) AS mse FROM qd ORDER BY vec_id"
    ) { (s, d) =>
      Quantize.quantizeStats(t(s, d, "embeddings"), "vec_id", "embedding")
        .select(col("vec_id"), round(col("scale"), 9).as("scale_r"),
          col("q_sum"), round(col("mse"), 9).as("mse"))
        .repartition(1).sortWithinPartitions("vec_id")
    },

    // The composed curation pipeline — quality filter → normalized exact
    // dedup (keep min id) → deterministic split — run END TO END as one
    // declarative plan, the way a real curation job chains these stages.
    // Each stage is individually oracled elsewhere; this probe pins the
    // composition. The quality threshold sits on 9-dp-rounded scores whose
    // cross-engine equality the text_quality_score oracle already proves,
    // so membership at the boundary is deterministic.
    Probe(
      "curate_pipeline",
      s"""WITH q AS (SELECT doc_id, text, string_split(text, ' ') AS ts FROM documents), scored AS (SELECT doc_id, text, round(least(1.0, (len(list_filter(ts, x -> x IN (${ExtProbes.markersSql}))) * 1.0 / len(ts)) * 2.0) * 0.5 + (1.0 - (length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) * 1.0 / length(text))) * 0.3 + least(1.0, ((length(text) - (len(ts) - 1)) * 1.0 / len(ts)) / 8.0) * 0.2, 9) AS qs FROM q), kept AS (SELECT doc_id, text FROM scored WHERE qs >= 0.47), norm AS (SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS key FROM kept), dedup AS (SELECT doc_id FROM (SELECT doc_id, min(doc_id) OVER (PARTITION BY key) AS keep FROM norm) t WHERE doc_id = keep) SELECT doc_id, CASE WHEN CAST('0x' || substring(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000 < 9000 THEN 'train' WHEN CAST('0x' || substring(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000 < 9500 THEN 'val' ELSE 'test' END AS split FROM dedup ORDER BY doc_id"""
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val kept = t(s, d, "documents")
        .filter(round(TA.qualityScore(col("text")), 9) >= 0.47)
        .withColumn("keep",
          min(col("doc_id")).over(Window.partitionBy(TA.normalize(col("text")))))
        .filter(col("doc_id") === col("keep"))
      Mixing.hashSplit(kept, "doc_id", "graft",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .select(col("doc_id"), col("split"))
        .orderBy("doc_id")
    },

    // Okapi BM25 top-20 for a literal query; the oracle recomputes tf/df/
    // avgdl and the exact scoring arithmetic (same operation order, so
    // the doubles agree before rounding).
    Probe(
      "rank_bm25_topk",
      "WITH base AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents), b2 AS (SELECT doc_id, CAST(len(ts) AS DOUBLE) AS dl, ts FROM base), stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM b2), hits AS (SELECT doc_id, dl, u.t AS term FROM b2, UNNEST(ts) AS u(t) WHERE u.t IN ('data', 'spark', 'join')), per_doc AS (SELECT doc_id, dl, CAST(sum(CASE WHEN term = 'data' THEN 1 ELSE 0 END) AS DOUBLE) AS tf0, CAST(sum(CASE WHEN term = 'spark' THEN 1 ELSE 0 END) AS DOUBLE) AS tf1, CAST(sum(CASE WHEN term = 'join' THEN 1 ELSE 0 END) AS DOUBLE) AS tf2 FROM hits GROUP BY doc_id, dl), dfs AS (SELECT CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0, CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1, CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2 FROM per_doc) SELECT doc_id, round(ln((n_docs - df0 + 0.5) / (df0 + 0.5) + 1.0) * tf0 * (1.2 + 1.0) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) + ln((n_docs - df1 + 0.5) / (df1 + 0.5) + 1.0) * tf1 * (1.2 + 1.0) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) + ln((n_docs - df2 + 0.5) / (df2 + 0.5) + 1.0) * tf2 * (1.2 + 1.0) / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)), 6) AS score FROM per_doc, stats, dfs ORDER BY score DESC, doc_id LIMIT 20"
    ) { (s, d) =>
      Ranking.bm25TopK(t(s, d, "documents"), "doc_id", "text",
        Seq("data", "spark", "join"), k1 = 1.2, b = 0.75, topK = 20)
    },

    // Hybrid retrieval: lexical BM25 top-20 + dense cosine top-20 fused
    // by reciprocal-rank fusion (1/(60+rank) per list). The oracle
    // replays both retrievers' exact scoring CTEs (the same arithmetic
    // as their standalone probes), ranks each list identically
    // (score desc, id), and fuses via a full outer join — doc_id and
    // vec_id share the id space in the testdata, the hybrid-search
    // contract.
    Probe(
      "rank_rrf_hybrid",
      "WITH base AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents), " +
        "b2 AS (SELECT doc_id, CAST(len(ts) AS DOUBLE) AS dl, ts FROM base), " +
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM b2), " +
        "hits AS (SELECT doc_id, dl, u.t AS term FROM b2, UNNEST(ts) AS u(t) WHERE u.t IN ('data', 'spark', 'join')), " +
        "per_doc AS (SELECT doc_id, dl, CAST(sum(CASE WHEN term = 'data' THEN 1 ELSE 0 END) AS DOUBLE) AS tf0, CAST(sum(CASE WHEN term = 'spark' THEN 1 ELSE 0 END) AS DOUBLE) AS tf1, CAST(sum(CASE WHEN term = 'join' THEN 1 ELSE 0 END) AS DOUBLE) AS tf2 FROM hits GROUP BY doc_id, dl), " +
        "dfs AS (SELECT CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0, CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1, CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2 FROM per_doc), " +
        "lexs AS (SELECT doc_id, round(ln((n_docs - df0 + 0.5) / (df0 + 0.5) + 1.0) * tf0 * (1.2 + 1.0) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) + ln((n_docs - df1 + 0.5) / (df1 + 0.5) + 1.0) * tf1 * (1.2 + 1.0) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) + ln((n_docs - df2 + 0.5) / (df2 + 0.5) + 1.0) * tf2 * (1.2 + 1.0) / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)), 6) AS s FROM per_doc, stats, dfs ORDER BY s DESC, doc_id LIMIT 20), " +
        "lex AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS rn FROM lexs), " +
        "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "dens AS (SELECT vec_id AS doc_id, round(list_cosine_similarity(v, (SELECT v FROM e WHERE vec_id = 0)), 6) AS s FROM e WHERE vec_id <> 0 ORDER BY s DESC, doc_id LIMIT 20), " +
        "den AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS rn FROM dens), " +
        "fused AS (SELECT COALESCE(l.doc_id, r.doc_id) AS doc_id, COALESCE(1.0 / (60 + l.rn), 0) + COALESCE(1.0 / (60 + r.rn), 0) AS rrf FROM lex l FULL OUTER JOIN den r ON l.doc_id = r.doc_id) " +
        "SELECT doc_id, round(rrf, 9) AS rrf_score FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10"
    ) { (s, d) =>
      val lex = Ranking.bm25TopK(t(s, d, "documents"), "doc_id", "text",
        Seq("data", "spark", "join"), k1 = 1.2, b = 0.75, topK = 20)
      val dense = graft.ext.Similarity
        .bruteForceTopK(t(s, d, "embeddings"), "vec_id", "embedding",
          queryId = 0L, k = 20)
        .select(col("vec_id").as("doc_id"), col("cos").as("score"))
      Ranking.rrfFuse(Seq(lex, dense), "doc_id", "score", topK = 10)
    }
  )
}
