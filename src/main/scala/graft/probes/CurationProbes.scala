package graft.probes

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, Mixing, TextAnalysis => TA, UrlOps}

/** [EXT] Round-4 curation operators: canonical-survivor selection after
  * dedup clustering, temperature-scaled mixture weights, exact stratified
  * splitting, and length-bucketed batch assignment.
  *
  * Same determinism discipline as every probe pack: fixed salts, driver
  * folds in ascending key order, BIGINT casts on every integer-derived
  * column (DuckDB widens sums to HUGEINT), and a total ORDER BY on both
  * sides.
  */
object CurationProbes {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val all: Seq[Probe] = Seq(

    // Dedup keep-best: source-blocked n-gram Jaccard edges → connected
    // components → ONE canonical survivor per cluster (longest text, ties
    // to lowest id). The oracle re-derives the clusters with a recursive
    // CTE and replays the same selection window.
    Probe(
      "dedup_keep_canonical",
      "WITH RECURSIVE tok AS (SELECT doc_id, source, string_split(text, ' ') AS ts FROM documents), sh AS (SELECT DISTINCT doc_id, source, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s FROM tok, UNNEST(generate_series(1, len(ts) - 2)) AS g(i)), cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter FROM sh a JOIN sh b ON a.source = b.source AND a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2), edges AS (SELECT id_a, id_b FROM p JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id WHERE round(inter * 1.0 / (ca.n + cb.n - inter), 4) >= 0.5), sym AS (SELECT id_a AS x, id_b AS y FROM edges UNION SELECT id_b, id_a FROM edges), reach(x, y) AS (SELECT x, y FROM sym UNION SELECT r.x, s.y FROM reach r JOIN sym s ON r.y = s.x), cl AS (SELECT x AS doc_id, least(x, min(y)) AS cluster_rep FROM reach GROUP BY x), j AS (SELECT d.doc_id, coalesce(c.cluster_rep, d.doc_id) AS cluster_rep, d.n_chars FROM documents d LEFT JOIN cl c ON d.doc_id = c.doc_id WHERE d.doc_id IS NOT NULL) SELECT doc_id, cluster_rep, n_chars, (row_number() OVER (PARTITION BY cluster_rep ORDER BY n_chars DESC, doc_id) = 1) AS is_canonical FROM j ORDER BY doc_id"
    ) { (s, d) =>
      val docs = t(s, d, "documents")
      val edges = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source", 0.5)
      Dedup.keepCanonical(docs, Dedup.duplicateClusters(edges),
          "doc_id", col("n_chars"))
        .select("doc_id", "cluster_rep", "n_chars", "is_canonical")
        .orderBy("doc_id")
    },

    // Temperature-scaled mixture weights (alpha = 0.5 routes through
    // IEEE-exact sqrt on both engines; the denominator folds in ascending
    // source order on both sides, so the double sum is bit-identical).
    Probe(
      "mix_temperature_weights",
      "WITH g AS (SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens FROM documents WHERE source IS NOT NULL AND text IS NOT NULL GROUP BY source), t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS grand, list_reduce(list_prepend(0.0, list(sqrt(n_tokens) ORDER BY source)), (a, b) -> a + b) AS denom FROM g) SELECT g.source, g.n_tokens, round(g.n_tokens * 1.0 / t.grand, 6) AS p, round(sqrt(g.n_tokens) / t.denom, 6) AS w FROM g, t ORDER BY source"
    ) { (s, d) =>
      Mixing.temperatureWeights(
          t(s, d, "documents")
            .select(col("source"), TA.tokenCount(col("text")).as("tok")),
          "source", "tok", alpha = 0.5)
        .repartition(1).sortWithinPartitions("source")
    },

    // Exact per-stratum holdout split: within each source, the first
    // round(0.2·n) documents in md5-hash order are held out — exact
    // quota per stratum, vs hashSplit's binomial wobble.
    Probe(
      "mix_stratified_split",
      "WITH s AS (SELECT doc_id, source, md5('st4' || CAST(doc_id AS VARCHAR)) AS k FROM documents WHERE doc_id IS NOT NULL AND source IS NOT NULL), r AS (SELECT doc_id, source, CAST(row_number() OVER (PARTITION BY source ORDER BY k, doc_id) - 1 AS BIGINT) AS stratum_pos, count(*) OVER (PARTITION BY source) AS n FROM s) SELECT doc_id, source, stratum_pos, CASE WHEN stratum_pos < CAST(round(0.2 * n) AS BIGINT) THEN 'holdout' ELSE 'train' END AS split FROM r ORDER BY doc_id"
    ) { (s, d) =>
      Mixing.exactStratifiedSplit(
          t(s, d, "documents").select("doc_id", "source"),
          "doc_id", "source", "st4", 0.2)
        .select("doc_id", "source", "stratum_pos", "split")
        .orderBy("doc_id")
    },

    // Length-bucketed batch assignment: bucket by tokens div 16, chop each
    // bucket into batches of 8 in deterministic md5 order.
    Probe(
      "pack_length_buckets",
      "WITH s AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, md5('lb' || CAST(doc_id AS VARCHAR)) AS k FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL), b AS (SELECT doc_id, n_tokens, n_tokens // 16 AS bucket, k FROM s), r AS (SELECT doc_id, n_tokens, bucket, CAST(row_number() OVER (PARTITION BY bucket ORDER BY k, doc_id) - 1 AS BIGINT) AS bucket_pos FROM b) SELECT doc_id, n_tokens, bucket, bucket_pos, bucket_pos // 8 AS batch_idx, bucket_pos % 8 AS slot FROM r ORDER BY doc_id"
    ) { (s, d) =>
      graft.ops.Packing.lengthBuckets(
          t(s, d, "documents")
            .select(col("doc_id"), TA.tokenCount(col("text")).as("n_tokens")),
          "doc_id", "n_tokens", bucketWidth = 16L, batchSize = 8L, salt = "lb")
        .select("doc_id", "n_tokens", "bucket", "bucket_pos",
          "batch_idx", "slot")
        .orderBy("doc_id")
    },

    // Embedding covariance matrix (the PCA/whitening building block):
    // upper-triangle cells via the engine's TWO-LEVEL deterministic fold
    // (inner: ascending vec_id within an id-bucket; outer: ascending
    // bucket) — the oracle replays the same nested list_reduce, so every
    // double sum is bit-identical. (// is floor division in DuckDB vs
    // Spark's truncating div — equal on the non-negative fixture ids.)
    Probe(
      "emb_covariance",
      "WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings WHERE vec_id IS NOT NULL AND embedding IS NOT NULL), cell AS (SELECT vec_id, vec_id // 1024 AS b, u.i AS i, w.j AS j, e.v[u.i] * e.v[w.j] AS xy FROM e, UNNEST(generate_series(1, len(e.v))) AS u(i), UNNEST(generate_series(1, len(e.v))) AS w(j) WHERE w.j >= u.i), pb AS (SELECT i, j, b, count(*) AS cnt, list_reduce(list_prepend(0.0, list(xy ORDER BY vec_id)), (a, c) -> a + c) AS part FROM cell GROUP BY 1, 2, 3), tot AS (SELECT i, j, CAST(sum(cnt) AS BIGINT) AS n, list_reduce(list_prepend(0.0, list(part ORDER BY b)), (a, c) -> a + c) AS sxy FROM pb GROUP BY 1, 2), mcell AS (SELECT vec_id, vec_id // 1024 AS b, u.i AS i, e.v[u.i] AS x FROM e, UNNEST(generate_series(1, len(e.v))) AS u(i)), mpb AS (SELECT i, b, list_reduce(list_prepend(0.0, list(x ORDER BY vec_id)), (a, c) -> a + c) AS part FROM mcell GROUP BY 1, 2), m AS (SELECT i, list_reduce(list_prepend(0.0, list(part ORDER BY b)), (a, c) -> a + c) AS sx FROM mpb GROUP BY 1) SELECT CAST(tot.i - 1 AS INTEGER) AS i, CAST(tot.j - 1 AS INTEGER) AS j, tot.n, round(tot.sxy / tot.n - (mi.sx / tot.n) * (mj.sx / tot.n), 9) AS cov FROM tot JOIN m mi ON mi.i = tot.i JOIN m mj ON mj.i = tot.j ORDER BY i, j"
    ) { (s, d) =>
      graft.ext.Stats.covarianceExact(t(s, d, "embeddings"),
          "vec_id", "embedding")
        .repartition(1).sortWithinPartitions("i", "j")
    },

    // Per-document TF-IDF keyword signature: top-5 terms by the smoothed
    // sklearn idf, ranked on the 6-dp-rounded score (ln differs 1 ulp
    // across engines) with a term tie-break.
    Probe(
      "rank_tfidf_topterms",
      "WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL), nn AS (SELECT count(*) AS n FROM tok), tf AS (SELECT doc_id, u.t AS term, CAST(count(*) AS BIGINT) AS tf FROM tok, UNNEST(ts) AS u(t) GROUP BY 1, 2), dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1), sc AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df, round(tf.tf * (ln((nn.n + 1.0) / (dfq.df + 1.0)) + 1.0), 6) AS score FROM tf CROSS JOIN nn JOIN dfq ON tf.term = dfq.term) SELECT doc_id, term, tf, df, score FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn FROM sc) t WHERE rn <= 5 ORDER BY doc_id, score DESC, term"
    ) { (s, d) =>
      graft.ext.Ranking.tfidfTopTerms(t(s, d, "documents"),
          "doc_id", "text", k = 5)
        .orderBy(col("doc_id"), col("score").desc, col("term"))
    },

    // Product-quantization codes (m=4 subspaces of 16 dims, k=4 codebook
    // entries = subvectors of vec_ids 0..3): the oracle re-derives every
    // code with element-ordered distance folds and the lowest-index
    // tie-break — the same auditability contract as emb_kmeans_assign.
    Probe(
      "emb_pq_assign",
      "WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings WHERE vec_id IS NOT NULL AND embedding IS NOT NULL), sub AS (SELECT vec_id, u.s AS s, list_slice(v, u.s * 16 + 1, u.s * 16 + 16) AS sv FROM e, UNNEST([0, 1, 2, 3]) AS u(s)), cent AS (SELECT s, vec_id AS cid, sv AS cv FROM sub WHERE vec_id < 4), dd AS (SELECT sub.vec_id, sub.s, cent.cid, list_reduce(list_prepend(0.0, [ (sub.sv[i] - cent.cv[i]) * (sub.sv[i] - cent.cv[i]) for i in range(1, len(sub.sv) + 1) ]), (a, b) -> a + b) AS d2 FROM sub JOIN cent ON sub.s = cent.s), asg AS (SELECT vec_id, s, cid, d2, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cid) AS rn FROM dd) SELECT vec_id, CAST(s AS INTEGER) AS subspace, CAST(cid AS INTEGER) AS code, round(d2, 9) AS dist2_r FROM asg WHERE rn = 1 ORDER BY vec_id, subspace"
    ) { (s, d) =>
      graft.ext.Quantize.pqAssign(t(s, d, "embeddings"),
          "vec_id", "embedding", m = 4, k = 4)
        .select(col("vec_id"), col("subspace"), col("code"),
          round(col("dist2"), 9).as("dist2_r"))
        .repartition(1).sortWithinPartitions("vec_id", "subspace")
    },

    // Quality-quartile curriculum buckets: exact corpus quantile
    // thresholds (one driver row, no ntile global-order funnel), band
    // membership on 6-dp-rounded thresholds vs 9-dp-rounded scores.
    Probe(
      "mix_quantile_buckets",
      s"""WITH s AS (SELECT doc_id, round(least(1.0, (len(list_filter(string_split(text, ' '), x -> x IN (${ExtProbes.markersSql}))) * 1.0 / len(string_split(text, ' '))) * 2.0) * 0.5 + (1.0 - (length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) * 1.0 / length(text))) * 0.3 + least(1.0, ((length(text) - (len(string_split(text, ' ')) - 1)) * 1.0 / len(string_split(text, ' '))) / 8.0) * 0.2, 9) AS score FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL), t AS (SELECT round(quantile_cont(score, 0.25), 6) AS t1, round(quantile_cont(score, 0.5), 6) AS t2, round(quantile_cont(score, 0.75), 6) AS t3 FROM s) SELECT doc_id, score, CAST((CASE WHEN score > t1 THEN 1 ELSE 0 END) + (CASE WHEN score > t2 THEN 1 ELSE 0 END) + (CASE WHEN score > t3 THEN 1 ELSE 0 END) AS INTEGER) AS q_bucket FROM s, t ORDER BY doc_id"""
    ) { (s, d) =>
      // phase split (r14 attribution): the probe is inherently TWO
      // corpus passes — the exact percentile THRESHOLD row (the eager
      // head() inside quantileBuckets, timed here) and the lazy
      // assignment pass that runs when the caller collects. sec minus
      // threshold_row is the assignment+collect side.
      val scored = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"),
          round(TA.qualityScore(col("text")), 9).as("score"))
      PhaseTimer.timed("mix_quantile_buckets", "threshold_row") {
        Mixing.quantileBuckets(scored,
          col("score"), nBuckets = 4, bucketName = "q_bucket")
      }.repartition(1).sortWithinPartitions("doc_id")
    },

    // Epoch/repetition budgeting (r19, Mixing.epochPlan): the
    // data-constrained recipe — three synthetic sources with
    // exactly-representable weights (0.5/0.25/0.25, so the target
    // arithmetic is identical under double and DECIMAL math), a fixed
    // token budget, and the oracle re-deriving target/full/partial in
    // closed form from the same per-group token sums.
    Probe(
      "mix_epoch_plan",
      "WITH gt AS (SELECT CAST(doc_id % 3 AS VARCHAR) AS g, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL GROUP BY 1), " +
        "w AS (SELECT * FROM (VALUES ('0', 0.5), ('1', 0.25), ('2', 0.25)) AS t(g, wt)) " +
        // weight CASTs to DOUBLE: the VALUES literal is DECIMAL and
        // would hash as '0.50' against the engine's 0.5
        "SELECT gt.g, gt.n_tokens, CAST(w.wt AS DOUBLE) AS weight, " +
        "CAST(round(500000 * w.wt) AS BIGINT) AS target_tokens, " +
        "CAST(round(500000 * w.wt) AS BIGINT) // gt.n_tokens AS full_epochs, " +
        "round((CAST(round(500000 * w.wt) AS BIGINT) - (CAST(round(500000 * w.wt) AS BIGINT) // gt.n_tokens) * gt.n_tokens) * 1.0 / gt.n_tokens, 6) AS partial_frac " +
        "FROM gt JOIN w ON gt.g = w.g ORDER BY gt.g"
    ) { (s, d) =>
      Mixing.epochPlan(
          t(s, d, "documents")
            .filter(col("doc_id").isNotNull && col("text").isNotNull)
            .select(pmod(col("doc_id"), lit(3)).cast("string").as("g"),
              TA.tokenCount(col("text")).as("tok")),
          "g", "tok",
          Seq("0" -> 0.5, "1" -> 0.25, "2" -> 0.25), 500000L)
        .repartition(1).sortWithinPartitions("g")
    },

    // Repetition materialization (r19, Mixing.repeatToBudget): each
    // doc repeats full_epochs times plus a deterministic md5-bucketed
    // partial epoch — the oracle replays the whole construction
    // (generate_series for the full passes, the hash threshold for the
    // partial) from the same plan arithmetic, so a wrong epoch count,
    // a mis-thresholded partial row, or a dropped group all
    // hash-mismatch.
    Probe(
      "mix_repeat_budget",
      "WITH gt AS (SELECT CAST(doc_id % 3 AS VARCHAR) AS g, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL GROUP BY 1), " +
        "w AS (SELECT * FROM (VALUES ('0', 0.5), ('1', 0.25), ('2', 0.25)) AS t(g, wt)), " +
        "q AS (SELECT gt.g, CAST(round(500000 * w.wt) AS BIGINT) // gt.n_tokens AS f, " +
        "round((CAST(round(500000 * w.wt) AS BIGINT) - (CAST(round(500000 * w.wt) AS BIGINT) // gt.n_tokens) * gt.n_tokens) * 1.0 / gt.n_tokens, 6) AS pf FROM gt JOIN w ON gt.g = w.g), " +
        "doc AS (SELECT doc_id, CAST(doc_id % 3 AS VARCHAR) AS g FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL), " +
        "e AS (SELECT doc.doc_id, doc.g, u.e AS epoch FROM doc JOIN q ON doc.g = q.g, UNNEST(generate_series(CAST(0 AS BIGINT), q.f - 1)) AS u(e) " +
        "UNION ALL SELECT doc.doc_id, doc.g, q.f AS epoch FROM doc JOIN q ON doc.g = q.g " +
        "WHERE CAST('0x' || substring(md5('ep' || CAST(doc.doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000 < CAST(round(q.pf * 10000) AS BIGINT)) " +
        "SELECT doc_id, g, epoch FROM e ORDER BY doc_id, epoch"
    ) { (s, d) =>
      val docs = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"),
          pmod(col("doc_id"), lit(3)).cast("string").as("g"),
          TA.tokenCount(col("text")).as("tok"))
      Mixing.repeatToBudget(docs, "doc_id", "g", "tok",
          Seq("0" -> 0.5, "1" -> 0.25, "2" -> 0.25), 500000L, salt = "ep")
        .select("doc_id", "g", "epoch")
        .repartition(1).sortWithinPartitions("doc_id", "epoch")
    },

    // URL canonicalization (r18, UrlOps): five messy variants per
    // logical page — www + tracking params + fragment + trailing slash,
    // uppercase scheme/host + default port, click-id param, userinfo,
    // and a NON-default port (identity-bearing: must NOT collapse) —
    // built identically in Spark and SQL, so the oracle re-derives the
    // canonical form, host, and registered domain in closed form. Host
    // families cycle co.uk (multi-label public suffix: 3-label
    // registered domain) and a deep .com subdomain (2-label).
    Probe(
      "url_canonicalize",
      urlFixtureSql +
        " SELECT doc_id, 'https://' || hc || CASE WHEN var = 4 THEN ':8443' ELSE '' END || '/Articles/' || CAST(g AS VARCHAR) || '?a=1&b=2' AS url_canon, " +
        "hc AS host, " +
        "CASE WHEN g % 2 = 0 THEN hc ELSE 'example' || CAST(g AS VARCHAR) || '.com' END AS registered_domain " +
        "FROM v ORDER BY doc_id"
    ) { (s, d) =>
      val parts = UrlOps.urlParts(col("url"))
      urlFixtureDf(t(s, d, "documents"))
        .select(col("doc_id"), parts.getField("canonical").as("url_canon"),
          parts.getField("host").as("host"),
          parts.getField("registered_domain").as("registered_domain"))
        .repartition(1).sortWithinPartitions("doc_id")
    },

    // URL-level dedup (r18): keep the first row per canonical URL. The
    // four collapsible variants of each page merge to one survivor (the
    // lowest doc_id) while the non-default-port variant stays distinct.
    // The oracle groups by the same closed-form canonical — no parsing
    // in SQL, no assumption that doc_ids are contiguous.
    Probe(
      "url_dedup",
      urlFixtureSql +
        ", c AS (SELECT doc_id, url, 'https://' || hc || CASE WHEN var = 4 THEN ':8443' ELSE '' END || '/Articles/' || CAST(g AS VARCHAR) || '?a=1&b=2' AS canon FROM v)" +
        ", w AS (SELECT min(doc_id) AS doc_id FROM c GROUP BY canon) " +
        "SELECT c.doc_id, c.url FROM c JOIN w ON c.doc_id = w.doc_id ORDER BY c.doc_id"
    ) { (s, d) =>
      UrlOps.dedupByUrl(urlFixtureDf(t(s, d, "documents")), "url", "doc_id")
        .select(col("doc_id"), col("url"))
        .orderBy("doc_id")
    },

    // Page-declared canonical dedup (r19, UrlOps.dedupByCanonicalUrl):
    // three fetch shapes per logical page — the canonical page itself
    // (nothing declared), a session-param variant declaring an ABSOLUTE
    // canonical (the param is identity-bearing, so plain URL dedup must
    // NOT collapse it — only the declaration does), and a mirror path
    // declaring a RELATIVE canonical against a path-absolute <base href>
    // (RFC 3986 merge, both hops) — all three collapse to one survivor
    // (lowest doc_id). The oracle groups by the logical page in closed
    // form; a green row proves pageMeta extraction, base resolution,
    // reference merge, and the canonical keying all agreed.
    Probe(
      "url_dedup_canonical",
      "WITH u AS (SELECT doc_id, doc_id // 3 AS g FROM documents WHERE doc_id IS NOT NULL), " +
        "w AS (SELECT min(doc_id) AS doc_id FROM u GROUP BY g) " +
        "SELECT u.doc_id, CASE u.doc_id % 3 " +
        "WHEN 0 THEN 'https://cn' || CAST(g AS VARCHAR) || '.example.com/p/' || CAST(g AS VARCHAR) " +
        "WHEN 1 THEN 'https://cn' || CAST(g AS VARCHAR) || '.example.com/p/' || CAST(g AS VARCHAR) || '?session=s' || CAST(u.doc_id AS VARCHAR) " +
        "ELSE 'https://cn' || CAST(g AS VARCHAR) || '.example.com/alt/' || CAST(g AS VARCHAR) END AS url " +
        "FROM u JOIN w ON u.doc_id = w.doc_id ORDER BY u.doc_id"
    ) { (s, d) =>
      val g = expr("doc_id DIV 3").cast("string")
      val v = pmod(col("doc_id"), lit(3))
      val page = concat(lit("https://cn"), g, lit(".example.com/p/"), g)
      val url = when(v === 0, page)
        .when(v === 1, concat(page, lit("?session=s"), col("doc_id")))
        .otherwise(concat(lit("https://cn"), g, lit(".example.com/alt/"), g))
      val html = when(v === 0,
        lit("<html><head><title>t</title></head><body><p>x</p></body></html>"))
        .when(v === 1, concat(
          lit("<html><head><link rel=\"canonical\" href=\""), page,
          lit("\"></head><body><p>x</p></body></html>")))
        .otherwise(concat(
          lit("<html><head><base href=\"/p/\"><link rel=canonical href="), g,
          lit("></head><body><p>x</p></body></html>")))
      val docs = t(s, d, "documents")
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id"), url.as("url"), html.as("html"))
      UrlOps.dedupByCanonicalUrl(docs, "url", "html", "doc_id")
        .select(col("doc_id"), col("url"))
        .orderBy("doc_id")
    },

    // WARC ingestion (r18, ext.Warc): the crawl path END TO END — real
    // .warc.gz shards on disk (per-record gzip members, the Common
    // Crawl convention; warcinfo + request records interleaved and
    // SKIPPED; a third of the responses chunked-transfer-encoded), one
    // task per shard, HTTP framing stripped, markup extracted through
    // HtmlText. The oracle re-derives every (url, text) from the source
    // table: row count pins the record filter, text equality pins the
    // gzip-member walk + Content-Length framing + chunk decoding +
    // extraction, all at once.
    Probe(
      "warc_ingest",
      "SELECT 'https://warc' || CAST(doc_id % 8 AS VARCHAR) || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url, text FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL ORDER BY url"
    ) { (s, d) =>
      val dir = PhaseTimer.timed("warc_ingest", "fixture_ensure") {
        warcFixture(s, d)
      }
      graft.ext.Warc.readResponses(s, dir + "/*.warc.gz")
        .select(col("url"),
          graft.ext.HtmlText.htmlText(col("body").cast("string")).as("text"))
        .repartition(1).sortWithinPartitions("url")
    },

    // Charset-aware crawl decode (r18): real crawls are NOT all UTF-8.
    // Four payload encodings — plain UTF-8, ISO-8859-1 declared by the
    // HTTP Content-Type, windows-1252 declared only by a meta tag, and
    // UTF-16LE with a BOM that must OVERRIDE a deliberately wrong HTTP
    // charset — each carrying a non-ASCII marker that decodes wrong
    // under any other charset. The oracle states every (url, text)
    // closed-form, marker included: green means the HTML5 precedence
    // (BOM > transport > meta > default) ran byte-correct end to end.
    Probe(
      "warc_charset",
      "SELECT 'https://cs' || CAST(doc_id % 4 AS VARCHAR) || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url, " +
        "text || ' ' || CASE doc_id % 4 WHEN 0 THEN '→' WHEN 1 THEN 'é' WHEN 2 THEN '€' ELSE '✓' END AS text " +
        "FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL ORDER BY url"
    ) { (s, d) =>
      val dir = PhaseTimer.timed("warc_charset", "fixture_ensure") {
        warcCharsetFixture(s, d)
      }
      graft.ext.Warc.readResponses(s, dir + "/*.warc.gz")
        .select(col("url"),
          graft.ext.HtmlText.htmlTextBytes(col("body"), col("charset"))
            .as("text"))
        .repartition(1).sortWithinPartitions("url")
    },

    // WET export round-trip (r18, ops.WarcExport): the curated corpus
    // shipped back out as WARC conversion records — 8 real
    // shard-NNNNN.warc.gz files written executor-side with the tar
    // exporter's atomic-commit discipline, then read back through the
    // independent Warc parser. The oracle is the source table itself:
    // identity read-back pins record framing, per-member gzip, UTF-8
    // payload encode/decode, and shard routing in one hash.
    Probe(
      "warc_wet_export",
      "SELECT 'https://wet.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url, text FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL ORDER BY url"
    ) { (s, d) =>
      val out = Probe.scratchDir("graft-wet") + "/wet"
      val docs = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"),
          concat(lit("https://wet.example.com/doc/"), col("doc_id")).as("url"),
          col("text"))
      PhaseTimer.timed("warc_wet_export", "export") {
        graft.ops.WarcExport.writeWetShards(docs, "doc_id", "url", "text",
          out, nShards = 8).collect(): Unit
      }
      graft.ops.WarcExport.readWet(s, out + "/*.warc.gz")
        .select(col("url"), col("text"))
        .repartition(1).sortWithinPartitions("url")
    },

    // Composed crawl-curation pipeline (r19): WARC shards → streamed
    // record decode → HTML extraction → RFC 9309 robots screening
    // (per-host policies incl. a wildcard pattern) → token-count
    // quality floor → canonical URL dedup, ONE declarative plan
    // end-to-end — the `curate_pipeline` idiom on the crawl path. The
    // oracle re-derives the surviving (url, text, n_tokens) rows in
    // closed form: a green row proves every stage composed without
    // losing, duplicating, or mis-screening a document.
    Probe(
      "crawl_curate_pipeline",
      "SELECT 'https://warc' || CAST(doc_id % 8 AS VARCHAR) || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url, text, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens " +
        "FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL " +
        "AND doc_id % 8 <> 0 " + // warc0 disallows /doc/ outright
        "AND NOT (doc_id % 8 = 2 AND CAST(doc_id AS VARCHAR) LIKE '1%') " + // /doc/1*
        "AND len(string_split(text, ' ')) >= 5 " +
        "ORDER BY url"
    ) { (s, d) =>
      import s.implicits._
      val dir = PhaseTimer.timed("crawl_curate_pipeline", "fixture_ensure") {
        warcFixture(s, d)
      }
      val pages = graft.ext.Warc.readResponses(s, dir + "/*.warc.gz")
        .select(col("url"),
          graft.ext.HtmlText.htmlTextBytes(col("body"), col("charset"))
            .as("text"))
      val robots = Seq(
        ("warc0.example.com", "User-agent: *\nDisallow: /doc/\n"),
        ("warc1.example.com", "User-agent: *\nDisallow:\n"),
        ("warc2.example.com", "User-agent: *\nDisallow: /doc/1*\n")
      ).toDF("host", "robots_txt")
      val allowed = graft.ext.RobotsTxt.filterAllowed(pages, "url", robots)
      val quality = allowed.filter(TA.tokenCount(col("text")) >= 5)
      graft.ext.UrlOps.dedupByUrl(
          quality.withColumn("doc_id",
            regexp_extract(col("url"), "/doc/(\\d+)$", 1).cast("long")),
          "url", "doc_id")
        .select(col("url"), col("text"),
          TA.tokenCount(col("text")).cast("long").as("n_tokens"))
        .orderBy("url")
    },

    // Sitemap parsing (r19, ext.Sitemaps): the crawl DISCOVERY side —
    // four document shapes per doc_id: a full urlset entry whose loc
    // carries an XML-escaped query (&amp; must decode), a CDATA loc
    // with no optional fields, a sitemapindex child (kind=sitemap),
    // and a urlset holding a loc-less block (drops) next to a valid
    // one. Built identically in Spark and SQL; the oracle states every
    // decoded (kind, loc, lastmod, changefreq, priority) closed-form.
    Probe(
      "url_sitemap_parse",
      "SELECT doc_id, " +
        "CASE doc_id % 4 WHEN 2 THEN 'sitemap' ELSE 'url' END AS kind, " +
        "CASE doc_id % 4 " +
        "WHEN 0 THEN 'https://sm.example.com/p/' || CAST(doc_id AS VARCHAR) || '?a=1&b=' || CAST(doc_id AS VARCHAR) " +
        "WHEN 1 THEN 'https://sm.example.com/cd/' || CAST(doc_id AS VARCHAR) " +
        "WHEN 2 THEN 'https://sm.example.com/maps/' || CAST(doc_id AS VARCHAR) || '.xml' " +
        "ELSE 'https://sm.example.com/ok/' || CAST(doc_id AS VARCHAR) END AS loc, " +
        "CASE doc_id % 4 WHEN 0 THEN '2026-01-02' WHEN 2 THEN '2026-02-03T04:05:06Z' ELSE NULL END AS lastmod, " +
        "CASE doc_id % 4 WHEN 0 THEN 'daily' ELSE NULL END AS changefreq, " +
        "CASE doc_id % 4 WHEN 0 THEN '0.8' ELSE NULL END AS priority " +
        "FROM documents WHERE doc_id IS NOT NULL ORDER BY doc_id"
    ) { (s, d) =>
      val id = col("doc_id").cast("string")
      val v = pmod(col("doc_id"), lit(4))
      val xml = when(v === 0, concat(
        lit("<?xml version=\"1.0\"?><urlset><url><loc>" +
          "https://sm.example.com/p/"), id, lit("?a=1&amp;b="), id,
        lit("</loc><lastmod>2026-01-02</lastmod>" +
          "<changefreq>daily</changefreq><priority>0.8</priority>" +
          "</url></urlset>")))
        .when(v === 1, concat(
          lit("<urlset><url><loc><![CDATA[https://sm.example.com/cd/"), id,
          lit("]]></loc></url></urlset>")))
        .when(v === 2, concat(
          lit("<sitemapindex><sitemap><loc>https://sm.example.com/maps/"),
          id, lit(".xml</loc><lastmod>2026-02-03T04:05:06Z</lastmod>" +
            "</sitemap></sitemapindex>")))
        .otherwise(concat(
          lit("<urlset><url><lastmod>2025-12-31</lastmod></url>" +
            "<url><loc>https://sm.example.com/ok/"), id,
          lit("</loc></url></urlset>")))
      graft.ext.Sitemaps.explodeEntries(
          t(s, d, "documents").filter(col("doc_id").isNotNull)
            .select(col("doc_id"), xml.as("xml")), "xml")
        .select("doc_id", "kind", "loc", "lastmod", "changefreq", "priority")
        .repartition(1).sortWithinPartitions("doc_id")
    },

    // Streaming crawl ingestion (r19, Warc.readResponsesStream): the
    // shard fixture treated as a LANDING directory — a checkpointed
    // binaryFile-source stream picks the 8 shards up across micro-
    // batches (maxFilesPerTrigger=3), each opened and record-streamed
    // executor-side, HTML extracted, landed in a parquet sink, read
    // back. The oracle is the same closed form as warc_ingest: green
    // means the streaming listing, per-record decode, and sink
    // delivery lose and duplicate nothing across triggers.
    Probe(
      "stream_warc_ingest",
      "SELECT 'https://warc' || CAST(doc_id % 8 AS VARCHAR) || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url, text FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL ORDER BY url"
    ) { (s, d) =>
      val dir = PhaseTimer.timed("stream_warc_ingest", "fixture_ensure") {
        warcFixture(s, d)
      }
      val root = Probe.scratchDir("graft-stream-warc")
      PhaseTimer.timed("stream_warc_ingest", "stream_run") {
        val q = graft.ext.Warc
          .readResponsesStream(s, dir + "/*.warc.gz", maxFilesPerTrigger = 3)
          .select(col("url"),
            graft.ext.HtmlText.htmlTextBytes(col("body"), col("charset"))
              .as("text"))
          .writeStream.format("parquet")
          .option("path", s"$root/out")
          .option("checkpointLocation", s"$root/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      s.read.parquet(s"$root/out").select("url", "text").repartition(1).sortWithinPartitions("url")
    },

    // CDX-style index + seek-fetch (r19, WarcIndex): the Common Crawl
    // random-access pattern — one streaming pass indexes every
    // per-record gzip member's (file, offset, length) with CRC-verified
    // boundaries, then a SUBSET (doc_id % 7 == 3) hydrates by range
    // read: seek, read exactly `length` bytes, decode the one member.
    // The oracle is the same closed form as warc_ingest restricted to
    // the subset — green means the byte-exact offset accounting, the
    // seek-fetch path, and HTTP/HTML extraction all agreed, without a
    // full-shard scan on the fetch side.
    Probe(
      "warc_cdx_fetch",
      "SELECT 'https://warc' || CAST(doc_id % 8 AS VARCHAR) || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url, text " +
        "FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL AND doc_id % 7 = 3 ORDER BY url"
    ) { (s, d) =>
      val dir = PhaseTimer.timed("warc_cdx_fetch", "fixture_ensure") {
        warcFixture(s, d)
      }
      val picked = graft.ext.WarcIndex.indexWarc(s, dir + "/*.warc.gz")
        .filter(col("warc_type") === "response")
        .withColumn("doc_id",
          regexp_extract(col("url"), "/doc/(\\d+)$", 1).cast("long"))
        .filter(pmod(col("doc_id"), lit(7)) === 3)
      graft.ext.WarcIndex.fetchResponses(picked)
        .select(col("url"),
          graft.ext.HtmlText.htmlTextBytes(col("body"), col("charset"))
            .as("text"))
        .repartition(1).sortWithinPartitions("url")
    },

    // robots.txt exclusion screening (r18, RobotsTxt — RFC 9309): five
    // host policies x four path shapes, evaluated for agent
    // "graftbot/1.0" — path-prefix rules, a disallow-all with an Allow
    // carve-out (longest-match precedence), a wildcard+anchor pattern,
    // an agent-specific group that must outrank '*', and a host with no
    // robots at all. The oracle re-derives the whole decision table in
    // closed form: a kept row proves the group selection, precedence,
    // and pattern semantics all agreed.
    Probe(
      "url_robots_filter",
      "WITH u AS (SELECT doc_id, doc_id % 5 AS h, doc_id % 4 AS v, " +
        "'https://h' || CAST(doc_id % 5 AS VARCHAR) || '.example.com' || " +
        "CASE doc_id % 4 WHEN 0 THEN '/public/a' WHEN 1 THEN '/private/x' WHEN 2 THEN '/docs/f.pdf' ELSE '/' END AS url " +
        "FROM documents WHERE doc_id IS NOT NULL) " +
        "SELECT doc_id, url FROM u WHERE NOT ((h = 0 AND v = 1) OR (h = 1 AND v <> 0) OR (h = 2 AND v = 2) OR h = 3) " +
        "ORDER BY doc_id"
    ) { (s, d) =>
      import s.implicits._
      val docs = t(s, d, "documents")
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id"),
          concat(lit("https://h"), pmod(col("doc_id"), lit(5)),
            lit(".example.com"),
            when(pmod(col("doc_id"), lit(4)) === 0, "/public/a")
              .when(pmod(col("doc_id"), lit(4)) === 1, "/private/x")
              .when(pmod(col("doc_id"), lit(4)) === 2, "/docs/f.pdf")
              .otherwise("/")).as("url"))
      val robots = Seq(
        ("h0.example.com", "User-agent: *\nDisallow: /private/\n"),
        ("h1.example.com", "User-agent: *\nDisallow: /\nAllow: /public/\n"),
        ("h2.example.com", "User-agent: *\nDisallow: /*.pdf$\n"),
        ("h3.example.com",
          "User-agent: graftbot\nDisallow: /\n\nUser-agent: *\nDisallow:\n")
      ).toDF("host", "robots_txt")
      graft.ext.RobotsTxt
        .filterAllowed(docs, "url", robots, userAgent = "graftbot/1.0")
        .orderBy("doc_id")
    }
  )

  /** The charset fixture: 4 `.warc.gz` shards, shard k holding every
    * doc with `doc_id % 4 == k` in encoding k (see the warc_charset
    * probe comment). Distributed build, 4 bounded blobs to the driver.
    */
  private def warcCharsetFixture(s: SparkSession, d: String): String =
    Probe.fileFixtureFor(d, "warc-charset") { dir =>
      import s.implicits._
      import graft.ext.Warc
      val shards = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .groupByKey(_._1 % 4)
        .mapGroups { (g, it) =>
          val iso = java.nio.charset.StandardCharsets.ISO_8859_1
          val docs = it.toArray.sortBy(_._1)
          val recs = docs.map { case (id, text) =>
            val url = s"https://cs$g.example.com/doc/$id"
            val (marker, headCharset, metaTag, enc) = g match {
              case 0L => ("→", null, "", "UTF-8")
              case 1L => ("é", "ISO-8859-1", "", "ISO-8859-1")
              case 2L => ("€", null,
                "<head><meta charset=\"windows-1252\"></head>", "windows-1252")
              case _ => ("✓", "ISO-8859-1" /* BOM must win over this */ ,
                "", "UTF-16LE")
            }
            val html = s"<html>$metaTag<body><p>$text $marker</p></body></html>"
            val payload =
              if (g == 3L) Array[Byte](0xFF.toByte, 0xFE.toByte) ++
                html.getBytes(java.nio.charset.Charset.forName("UTF-16LE"))
              else html.getBytes(java.nio.charset.Charset.forName(enc))
            val ct = "text/html" +
              (if (headCharset != null) s"; charset=$headCharset" else "")
            val out = new java.io.ByteArrayOutputStream()
            out.write((s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n" +
              s"Content-Length: ${payload.length}\r\n\r\n").getBytes(iso))
            out.write(payload)
            Warc.writeRecord("response", url,
              "application/http;msgtype=response", out.toByteArray)
          }
          (g, Warc.writeWarc(recs.toIndexedSeq, gzipPerRecord = true))
        }
        .collect() // 4 shard blobs, bounded by construction
      shards.foreach { case (g, bytes) =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, s"cs-$g.warc.gz"), bytes): Unit
      }
    }

  /** Build the WARC shard fixture: 8 `.warc.gz` files, each holding a
    * warcinfo record plus one request + one response record per doc of
    * its `doc_id % 8` slice (ascending doc_id — byte-deterministic).
    * The response payload is a real HTTP message over the HtmlText-able
    * wrap of `text`; docs with `doc_id % 3 == 1` ship chunked. Shards
    * assemble DISTRIBUTED (one task per shard) and only the 8 finished
    * blobs ride the driver — bounded by construction.
    */
  private def warcFixture(s: SparkSession, d: String): String =
    Probe.fileFixtureFor(d, "warc") { dir =>
      import s.implicits._
      import graft.ext.Warc
      val shards = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .groupByKey(_._1 % 8)
        .mapGroups { (g, it) =>
          val docs = it.toArray.sortBy(_._1)
          val iso = java.nio.charset.StandardCharsets.ISO_8859_1
          val recs = Vector.newBuilder[Array[Byte]]
          recs += Warc.writeRecord("warcinfo", "",
            "application/warc-fields", "software: graft\r\n".getBytes(iso))
          docs.foreach { case (id, text) =>
            val url = s"https://warc$g.example.com/doc/$id"
            val html = s"<html><body><p>$text</p></body></html>".getBytes(iso)
            val http: Array[Byte] =
              if (id % 3 == 1) {
                val cut = math.min(10, html.length)
                val out = new java.io.ByteArrayOutputStream()
                out.write(("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
                  "Transfer-Encoding: chunked\r\n\r\n").getBytes(iso))
                out.write(s"${cut.toHexString}\r\n".getBytes(iso))
                out.write(html, 0, cut); out.write("\r\n".getBytes(iso))
                if (html.length > cut) {
                  out.write(s"${(html.length - cut).toHexString};x=y\r\n".getBytes(iso))
                  out.write(html, cut, html.length - cut)
                  out.write("\r\n".getBytes(iso))
                }
                out.write("0\r\n\r\n".getBytes(iso))
                out.toByteArray
              } else {
                val out = new java.io.ByteArrayOutputStream()
                out.write(("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
                  s"Content-Length: ${html.length}\r\n\r\n").getBytes(iso))
                out.write(html)
                out.toByteArray
              }
            recs += Warc.writeRecord("request", url,
              "application/http;msgtype=request",
              s"GET /doc/$id HTTP/1.1\r\nHost: warc$g.example.com\r\n\r\n"
                .getBytes(iso))
            recs += Warc.writeRecord("response", url,
              "application/http;msgtype=response", http)
          }
          (g, Warc.writeWarc(recs.result(), gzipPerRecord = true))
        }
        .collect() // 8 shard blobs, bounded by construction
      shards.foreach { case (g, bytes) =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, s"part-$g.warc.gz"), bytes): Unit
      }
    }

  /** The messy-URL fixture both url_* probes share: (doc_id, url) with
    * variant `doc_id % 5` and host family `doc_id % 2` (see the
    * url_canonicalize comment). Pure Column ops — the SQL twin is
    * [[urlFixtureSql]].
    */
  private def urlFixtureDf(docs: DataFrame): DataFrame = {
    val g = expr("doc_id DIV 5").cast("string")
    val hc = when(pmod(expr("doc_id DIV 5"), lit(2)) === 0,
      concat(lit("site"), g, lit(".co.uk")))
      .otherwise(concat(lit("blog"), g, lit(".news.example"), g, lit(".com")))
    val v = pmod(col("doc_id"), lit(5))
    val url = when(v === 0,
      concat(lit("https://www."), hc, lit("/Articles/"), g,
        lit("/?utm_source=feed&b=2&a=1#top")))
      .when(v === 1,
        concat(lit("HTTPS://"), upper(hc), lit(":443/Articles/"), g,
          lit("?a=1&b=2")))
      .when(v === 2,
        concat(lit("https://"), hc, lit("/Articles/"), g,
          lit("?b=2&a=1&fbclid=x"), g))
      .when(v === 3,
        concat(lit("https://user:pw@"), hc, lit("/Articles/"), g,
          lit("/?a=1&b=2")))
      .otherwise(
        concat(lit("https://"), hc, lit(":8443/Articles/"), g,
          lit("?a=1&b=2")))
    docs.filter(col("doc_id").isNotNull).select(col("doc_id"), url.as("url"))
  }

  /** SQL twin of [[urlFixtureDf]] as a WITH prefix defining `v(doc_id,
    * g, var, hc, url)`. A def, not a val: `all` above initializes first
    * and would capture a null.
    */
  private def urlFixtureSql: String =
    "WITH v AS (SELECT doc_id, doc_id // 5 AS g, doc_id % 5 AS var, " +
      "CASE WHEN (doc_id // 5) % 2 = 0 THEN 'site' || CAST(doc_id // 5 AS VARCHAR) || '.co.uk' " +
      "ELSE 'blog' || CAST(doc_id // 5 AS VARCHAR) || '.news.example' || CAST(doc_id // 5 AS VARCHAR) || '.com' END AS hc, " +
      "CASE doc_id % 5 " +
      "WHEN 0 THEN 'https://www.' || (CASE WHEN (doc_id // 5) % 2 = 0 THEN 'site' || CAST(doc_id // 5 AS VARCHAR) || '.co.uk' ELSE 'blog' || CAST(doc_id // 5 AS VARCHAR) || '.news.example' || CAST(doc_id // 5 AS VARCHAR) || '.com' END) || '/Articles/' || CAST(doc_id // 5 AS VARCHAR) || '/?utm_source=feed&b=2&a=1#top' " +
      "WHEN 1 THEN 'HTTPS://' || upper(CASE WHEN (doc_id // 5) % 2 = 0 THEN 'site' || CAST(doc_id // 5 AS VARCHAR) || '.co.uk' ELSE 'blog' || CAST(doc_id // 5 AS VARCHAR) || '.news.example' || CAST(doc_id // 5 AS VARCHAR) || '.com' END) || ':443/Articles/' || CAST(doc_id // 5 AS VARCHAR) || '?a=1&b=2' " +
      "WHEN 2 THEN 'https://' || (CASE WHEN (doc_id // 5) % 2 = 0 THEN 'site' || CAST(doc_id // 5 AS VARCHAR) || '.co.uk' ELSE 'blog' || CAST(doc_id // 5 AS VARCHAR) || '.news.example' || CAST(doc_id // 5 AS VARCHAR) || '.com' END) || '/Articles/' || CAST(doc_id // 5 AS VARCHAR) || '?b=2&a=1&fbclid=x' || CAST(doc_id // 5 AS VARCHAR) " +
      "WHEN 3 THEN 'https://user:pw@' || (CASE WHEN (doc_id // 5) % 2 = 0 THEN 'site' || CAST(doc_id // 5 AS VARCHAR) || '.co.uk' ELSE 'blog' || CAST(doc_id // 5 AS VARCHAR) || '.news.example' || CAST(doc_id // 5 AS VARCHAR) || '.com' END) || '/Articles/' || CAST(doc_id // 5 AS VARCHAR) || '/?a=1&b=2' " +
      "ELSE 'https://' || (CASE WHEN (doc_id // 5) % 2 = 0 THEN 'site' || CAST(doc_id // 5 AS VARCHAR) || '.co.uk' ELSE 'blog' || CAST(doc_id // 5 AS VARCHAR) || '.news.example' || CAST(doc_id // 5 AS VARCHAR) || '.com' END) || ':8443/Articles/' || CAST(doc_id // 5 AS VARCHAR) || '?a=1&b=2' " +
      "END AS url " +
      "FROM documents WHERE doc_id IS NOT NULL)"
}
