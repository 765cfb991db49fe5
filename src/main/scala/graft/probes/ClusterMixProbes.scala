package graft.probes

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Clustering, Dedup, Mixing, Quality, TextAnalysis => TA}

/** [EXT] Round-3 training-data operators: deterministic k-means and
  * SemDeDup-style semantic dedup over the embedding corpus, reproducible
  * corpus shuffling and token-budget mixing, the full Gopher-rule document
  * filter, and the correlated above-average aggregation shape.
  *
  * Every probe follows the established determinism discipline: fixed
  * seeds/salts, element-order double folds, rounded-before-compare
  * thresholds — so each assignment is re-derivable by the DuckDB oracle.
  */
object ClusterMixProbes {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Shared oracle SQL: deterministic k-means assignment over embeddings
    * with seeds = vectors of the 8 smallest ids (dense ids 0..7). The
    * distance fold is element-ordered, ties go to the lowest centroid id —
    * exactly Clustering.assign's contract.
    */
  private val assignSql =
    "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings WHERE vec_id IS NOT NULL AND embedding IS NOT NULL), " +
      "cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8), " +
      "d AS (SELECT e.vec_id, cent.cid, list_reduce(list_prepend(0.0, [ (e.v[i]-cent.cv[i])*(e.v[i]-cent.cv[i]) for i in range(1, len(e.v)+1) ]), (a, b) -> a + b) AS d2 FROM e CROSS JOIN cent), " +
      "asg AS (SELECT vec_id, cid, d2 FROM (SELECT vec_id, cid, d2, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d) WHERE rn = 1)"

  val all: Seq[Probe] = Seq(

    // Deterministic nearest-centroid assignment (the building block of the
    // SemDeDup / IVF scale paths): seeds are the 8 smallest-id vectors,
    // distance folds are element-ordered, ties break to the lowest
    // centroid index — the oracle re-derives every assignment.
    Probe(
      "emb_kmeans_assign",
      s"WITH $assignSql SELECT vec_id, CAST(cid AS INTEGER) AS cluster, round(d2, 9) AS dist2_r FROM asg ORDER BY vec_id"
    ) { (s, d) =>
      val emb = t(s, d, "embeddings")
      Clustering.assign(emb, "vec_id", "embedding",
        Clustering.seedCentroids(emb, "vec_id", "embedding", 8))
        .select(col("vec_id"), col("cluster"),
          round(col("dist2"), 9).as("dist2_r"))
        .repartition(1).sortWithinPartitions("vec_id")
    },

    // SemDeDup: cluster first, compare within clusters only — the O(n²)
    // → O(Σ n_c²) pruning. The oracle recomputes cluster membership AND
    // the within-cluster cosine pairs from scratch.
    Probe(
      "dedup_semantic",
      s"WITH $assignSql SELECT a.vec_id AS id_a, b.vec_id AS id_b, round(list_cosine_similarity(ea.v, eb.v), 4) AS cos FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id JOIN e ea ON ea.vec_id = a.vec_id JOIN e eb ON eb.vec_id = b.vec_id WHERE round(list_cosine_similarity(ea.v, eb.v), 4) >= 0.3 ORDER BY id_a, id_b"
    ) { (s, d) =>
      Dedup.semanticNearDupPairs(t(s, d, "embeddings"), "vec_id", "embedding",
        k = 8, threshold = 0.3)
        .repartition(1).sortWithinPartitions("id_a", "id_b")
    },

    // Per-label exact centroids: means accumulate in ascending-id order
    // (ordered fold), so every component is bit-reproducible — the
    // auditable-centroid path.
    Probe(
      "emb_label_centroid",
      "WITH e AS (SELECT label, vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings WHERE vec_id IS NOT NULL AND embedding IS NOT NULL), x AS (SELECT label, vec_id, g.i - 1 AS pos, v[g.i] AS val FROM e, UNNEST(generate_series(1, len(v))) AS g(i)), agg1 AS (SELECT label, pos, count(*) AS n_vecs, list(val ORDER BY vec_id) AS xs FROM x GROUP BY label, pos) SELECT label, CAST(pos AS INTEGER) AS pos, CAST(n_vecs AS BIGINT) AS n_vecs, round(list_reduce(list_prepend(0.0, xs), (a, b) -> a + b) / n_vecs, 9) AS mean_x FROM agg1 ORDER BY label, pos"
    ) { (s, d) =>
      Clustering.labelCentroidsExact(t(s, d, "embeddings"), "label",
        "vec_id", "embedding")
        .select(col("label"), col("pos"), col("n_vecs"),
          round(col("mean_x"), 9).as("mean_x"))
        .orderBy("label", "pos")
    },

    // Reproducible training-order shuffle: global permutation index from
    // the md5 order, computed via 256 deterministic hash-prefix buckets
    // (never a single-task global window) — the oracle is the plain
    // single-window formulation of the same order.
    Probe(
      "mix_shuffle",
      "SELECT doc_id, CAST(row_number() OVER (ORDER BY md5('shuf' || CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT) AS shuffle_pos FROM documents WHERE doc_id IS NOT NULL ORDER BY doc_id"
    ) { (s, d) =>
      Mixing.deterministicShuffle(t(s, d, "documents"), "doc_id", "shuf")
        .select(col("doc_id"), col("shuffle_pos"))
        .orderBy("doc_id")
    },

    // Token-budget mixture sampling: per source, keep documents in md5
    // order while the running token total stays within an 800-token
    // budget — mixture weights expressed as token budgets.
    Probe(
      "mix_token_budget",
      "WITH tc AS (SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL), c AS (SELECT doc_id, source, sum(tok) OVER (PARTITION BY source ORDER BY md5('bud' || CAST(doc_id AS VARCHAR)), doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens FROM tc) SELECT doc_id, source, CAST(cum_tokens AS BIGINT) AS cum_tokens FROM c WHERE cum_tokens <= 800 ORDER BY doc_id"
    ) { (s, d) =>
      Mixing.tokenBudgetSample(
          t(s, d, "documents").select(col("doc_id"), col("source"),
            TA.tokenCount(col("text")).as("tok")),
          "doc_id", "source", "tok", budgetTokens = 800, salt = "bud")
        .select(col("doc_id"), col("source"), col("cum_tokens"))
        .orderBy("doc_id")
    },

    // Unigram entropy (information density): per-term -p·ln(p)
    // contributions fold in binary-collation token order on both engines,
    // so the double sum matches bit-for-bit before the 6-dp round.
    Probe(
      "text_unigram_entropy",
      "WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL), n AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n FROM tok), c AS (SELECT doc_id, u.t AS tokn, count(*) AS c FROM tok, UNNEST(ts) AS u(t) GROUP BY 1, 2), e AS (SELECT c.doc_id, min(n.n) AS n, count(*) AS nd, list(-((c.c * 1.0 / n.n) * ln(c.c * 1.0 / n.n)) ORDER BY c.tokn) AS lps FROM c JOIN n ON c.doc_id = n.doc_id GROUP BY c.doc_id) SELECT doc_id, n AS n_tokens, CAST(nd AS BIGINT) AS n_distinct, round(list_reduce(list_prepend(0.0, lps), (a, b) -> a + b), 6) AS entropy FROM e ORDER BY doc_id"
    ) { (s, d) =>
      Quality.unigramEntropy(t(s, d, "documents"), "doc_id", "text")
        .repartition(1).sortWithinPartitions("doc_id")
    },

    // Full Gopher-rule document filter: every rule signal plus the
    // combined verdict, thresholds compared on 9-dp-rounded fractions so
    // boundary membership is engine-independent.
    Probe(
      "text_gopher_filter",
      "WITH q AS (SELECT doc_id, text, string_split(text, ' ') AS ts FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL), b AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens, round((length(text) - (len(ts) - 1)) * 1.0 / len(ts), 9) AS mean_wl, round(len(list_filter(ts, x -> regexp_matches(x, '[^A-Za-z0-9]'))) * 1.0 / len(ts), 9) AS symbol_frac, CAST(len(list_filter(list_distinct(ts), x -> x IN ('the','a','and','of','to','in','is','be','that','with'))) AS BIGINT) AS n_stop, round(1.0 - len(list_distinct(ts)) * 1.0 / len(ts), 9) AS dup_frac FROM q) SELECT doc_id, n_tokens, mean_wl, symbol_frac, n_stop, dup_frac, (n_tokens BETWEEN 30 AND 80 AND mean_wl >= 3.0 AND mean_wl <= 4.6 AND symbol_frac <= 0.1 AND n_stop >= 2 AND dup_frac <= 0.55) AS keep FROM b ORDER BY doc_id"
    ) { (s, d) =>
      Quality.gopherFilter(t(s, d, "documents"), "doc_id", "text",
        Quality.GopherRules(minTokens = 30, maxTokens = 80,
          minMeanWordLen = 3.0, maxMeanWordLen = 4.6))
        .repartition(1).sortWithinPartitions("doc_id")
    },

    // Composed training-shard prep: deterministic epoch shuffle, then
    // sequence packing in SHUFFLED order (pack ids = the dense 0..n-1
    // shuffle positions, the ideal input for Packing's equal-width
    // buckets) — the end-to-end "make epoch shards" pipeline as one plan.
    Probe(
      "pack_shuffled_corpus",
      "WITH s AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS token_count, row_number() OVER (ORDER BY md5('ep0' || CAST(doc_id AS VARCHAR)), doc_id) - 1 AS pos FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL), c AS (SELECT doc_id, pos, token_count, sum(token_count) OVER (ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - token_count AS token_start FROM s) SELECT doc_id, CAST(pos AS BIGINT) AS pos, token_count, CAST(token_start AS BIGINT) AS token_start, CAST(token_start // 512 AS BIGINT) AS seq_start FROM c ORDER BY doc_id"
    ) { (s, d) =>
      // persisted: the ranking is consumed ~5 times (GlobalOrder's count
      // collect, packSequences' bounds+subtotal collects, both join
      // sides) — one materialization also pins GlobalOrder's documented
      // deterministic-input precondition by construction
      val shuffled = Mixing.deterministicShuffle(
        t(s, d, "documents")
          .filter(col("doc_id").isNotNull && col("text").isNotNull)
          .select(col("doc_id"), TA.tokenCount(col("text")).as("tok")),
        "doc_id", "ep0").persist()
      // packSequences names its id column "doc_id": here that id IS the
      // shuffle position, so rename and join the real doc_id back on
      val packed = graft.ops.Packing
        .packSequences(shuffled, "shuffle_pos", "tok", 512)
        .select(col("doc_id").as("pos"), col("token_count"),
          col("token_start"), col("seq_start"))
      packed
        .join(shuffled.select(col("doc_id"), col("shuffle_pos").as("pos")), "pos")
        .select(col("doc_id"), col("pos"), col("token_count"),
          col("token_start"), col("seq_start"))
        .orderBy("doc_id")
    },

    // Sequence-text assembly: the ACTUAL token stream of every packed
    // 512-token training sequence, fingerprinted with md5 — the oracle
    // rebuilds each sequence by slicing and concatenating document tokens
    // in corpus order. Every sequence but the last must carry exactly
    // 512 tokens.
    Probe(
      "text_pack_assemble",
      "WITH tc AS (SELECT doc_id, string_split(text, ' ') AS ts, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL), c AS (SELECT doc_id, ts, tok, CAST(sum(tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok AS BIGINT) AS strt FROM tc), sp AS (SELECT g.g AS seq_id, ts, strt, tok, greatest(g.g * 512 - strt, 0) AS lo, least((g.g + 1) * 512 - strt, tok) AS hi FROM c, UNNEST(generate_series(strt // 512, (strt + tok - 1) // 512)) AS g(g) WHERE tok > 0), pieces AS (SELECT seq_id, strt, hi - lo AS n, array_to_string(ts[lo+1:hi], ' ') AS piece FROM sp), agg AS (SELECT seq_id, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens, string_agg(piece, ' ' ORDER BY strt) AS txt FROM pieces GROUP BY seq_id) SELECT CAST(seq_id AS BIGINT) AS seq_id, CAST(n_docs AS BIGINT) AS n_docs, n_tokens, md5(txt) AS seq_md5 FROM agg ORDER BY seq_id"
    ) { (s, d) =>
      graft.ops.Packing.sequenceTexts(t(s, d, "documents"), "doc_id", "text",
        seqLen = 512)
        .orderBy("seq_id")
    },

    // Correlated above-average aggregation (the scalar-subquery shape):
    // parts larger than their brand's average size, per brand. The window
    // formulation runs in ONE shuffle; integer sums keep the avg exact and
    // the comparison engine-independent.
    Probe(
      "agg_correlated_above_avg",
      "SELECT p_brand, count(*) AS n_above FROM (SELECT p_brand, p_size, avg(p_size) OVER (PARTITION BY p_brand) AS a FROM part) WHERE p_size > a GROUP BY p_brand ORDER BY p_brand"
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      t(s, d, "part")
        .withColumn("a", avg(col("p_size")).over(Window.partitionBy("p_brand")))
        .filter(col("p_size") > col("a"))
        .groupBy("p_brand").agg(count(lit(1)).as("n_above"))
        .orderBy("p_brand")
    },

    // JSONL shard export round trip (r12): write the corpus as gzipped
    // JSONL shards, read it back with spark.read.json, and aggregate —
    // matching the oracle's direct aggregation over the source table
    // proves the export is lossless (every row, every value) and the
    // shard math right (n_shards = ceil(rows / 64)). Read-back supplies
    // the schema explicitly, as a large export should (inference is a
    // full pre-scan).
    Probe(
      "pack_jsonl_export",
      "SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum, " +
        "CAST(sum(length(text)) AS BIGINT) AS chars, " +
        "CAST(ceil(count(*) / 64.0) AS BIGINT) AS n_shards " +
        "FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL"
    ) { (s, d) =>
      val root = Probe.scratchDir("graft-jsonl-probe")
      val src = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select("doc_id", "text")
      val shards = PhaseTimer.timed("pack_jsonl_export", "shard_write") {
        graft.ops.Export.writeJsonlShards(src, Seq(col("doc_id")), 64L, s"$root/out")
      }
      graft.ops.Export.readJsonlShards(s, s"$root/out",
          Some("doc_id BIGINT, text STRING"))
        .agg(count(lit(1)).as("n"), sum("doc_id").as("id_sum"),
          sum(length(col("text"))).cast("long").as("chars"),
          lit(shards).as("n_shards"))
    },

    // [EXT] WebDataset-style tar shard export (r13): write the corpus as
    // POSIX ustar sample shards (one `<key>.txt` entry per document, 100
    // samples per shard, deterministic bytes), then READ THE TARS BACK —
    // a real header walk, the same parse any training loader does — and
    // aggregate per shard. The oracle recomputes every figure in closed
    // form from the source table with the identical shard-assignment
    // rule (dense ordinal over doc_id // 100), so a single flipped size
    // field, lost entry, or misassigned sample hash-mismatches.
    Probe(
      "pack_tar_export",
      "WITH o AS (SELECT doc_id, text, row_number() OVER (ORDER BY doc_id) - 1 AS ord " +
        "FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL) " +
        "SELECT CAST(ord // 100 AS BIGINT) AS shard, " +
        "CAST(count(*) AS BIGINT) AS n_entries, " +
        "CAST(sum(octet_length(encode(text))) AS BIGINT) AS payload_bytes, " +
        "CAST(min(doc_id) AS BIGINT) AS min_id, " +
        "CAST(max(doc_id) AS BIGINT) AS max_id " +
        "FROM o GROUP BY 1 ORDER BY shard"
    ) { (s, d) =>
      val root = Probe.scratchDir("graft-tar-probe")
      val src = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select("doc_id", "text")
      PhaseTimer.timed("pack_tar_export", "shard_write") {
        graft.ops.TarExport.writeTarShards(src, col("doc_id"),
          Seq(col("doc_id")), Seq("txt" -> col("text")), 100L,
          s"$root/out").collect()
      }
      graft.ops.TarExport.readTarShards(s, s"$root/out")
        .select(col("shard"),
          expr("cast(split(name, '\\\\.')[0] as bigint)").as("key"),
          length(col("content")).cast("long").as("bytes"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_entries"),
          sum(col("bytes")).as("payload_bytes"),
          min(col("key")).as("min_id"), max(col("key")).as("max_id"))
        .orderBy("shard")
    },

    // [EXT] MULTI-modality WebDataset contract (r14): three entry
    // columns per sample — `.txt` (always), `.json` (a deterministic
    // metadata string, always), `.cap` (null for 2 of 3 samples → the
    // missing-modality skip). The tars are read BACK and the per-shard
    // entry census is split BY EXTENSION, so the oracle's closed-form
    // recount catches a dropped modality, a phantom entry for a NULL
    // column, or a misassigned sample — the loader-facing guarantees
    // that were previously only spec'd.
    Probe(
      "pack_tar_multimodal",
      "WITH o AS (SELECT doc_id, text, row_number() OVER (ORDER BY doc_id) - 1 AS ord " +
        "FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL) " +
        "SELECT CAST(ord // 250 AS BIGINT) AS shard, " +
        "CAST(2 * count(*) + sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_entries, " +
        "CAST(count(*) AS BIGINT) AS n_txt, " +
        "CAST(count(*) AS BIGINT) AS n_json, " +
        "CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cap, " +
        "CAST(sum(octet_length(encode(text))) " +
        " + sum(octet_length(encode('meta:' || doc_id || ':' || length(text)))) " +
        " + sum(CASE WHEN doc_id % 3 = 0 THEN octet_length(encode('cap-' || doc_id)) ELSE 0 END) AS BIGINT) AS payload_bytes " +
        "FROM o GROUP BY 1 ORDER BY shard"
    ) { (s, d) =>
      val root = Probe.scratchDir("graft-tar-mm-probe")
      val src = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), col("text"),
          concat(lit("meta:"), col("doc_id"), lit(":"),
            length(col("text"))).as("meta"),
          when(col("doc_id") % 3 === 0,
            concat(lit("cap-"), col("doc_id"))).as("cap"))
      PhaseTimer.timed("pack_tar_multimodal", "shard_write") {
        graft.ops.TarExport.writeTarShards(src, col("doc_id"),
          Seq(col("doc_id")),
          Seq("txt" -> col("text"), "json" -> col("meta"),
            "cap" -> col("cap")),
          250L, s"$root/out").collect()
      }
      graft.ops.TarExport.readTarShards(s, s"$root/out")
        .select(col("shard"),
          expr("split(name, '\\\\.')[1]").as("ext"),
          length(col("content")).cast("long").as("bytes"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_entries"),
          sum(when(col("ext") === "txt", 1L).otherwise(0L)).as("n_txt"),
          sum(when(col("ext") === "json", 1L).otherwise(0L)).as("n_json"),
          sum(when(col("ext") === "cap", 1L).otherwise(0L)).as("n_cap"),
          sum(col("bytes")).as("payload_bytes"))
        .orderBy("shard")
    },

    // [EXT] loader-side SAMPLE regrouping (r14): readTarSamples folds a
    // shard's contiguous `<key>.<ext>` entries back into one row per
    // training sample (extension→bytes map) WITHOUT a shuffle — the
    // contiguity the writer guarantees makes it a per-partition fold.
    // Oracled at the per-SAMPLE grain: every sample's entry count and
    // byte total recomputed in closed form, so a sample split across
    // rows, a lost modality, or bytes landed under the wrong key all
    // hash-mismatch.
    Probe(
      "pack_tar_samples",
      "WITH o AS (SELECT doc_id, text, row_number() OVER (ORDER BY doc_id) - 1 AS ord " +
        "FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL) " +
        "SELECT CAST(ord // 250 AS BIGINT) AS shard, CAST(doc_id AS VARCHAR) AS key, " +
        "CAST(2 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_entries, " +
        "CAST(octet_length(encode(text)) " +
        " + octet_length(encode('meta:' || doc_id || ':' || length(text))) " +
        " + CASE WHEN doc_id % 3 = 0 THEN octet_length(encode('cap-' || doc_id)) ELSE 0 END AS BIGINT) AS sample_bytes " +
        "FROM o ORDER BY shard, key"
    ) { (s, d) =>
      val root = Probe.scratchDir("graft-tar-samples-probe")
      val src = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), col("text"),
          concat(lit("meta:"), col("doc_id"), lit(":"),
            length(col("text"))).as("meta"),
          when(col("doc_id") % 3 === 0,
            concat(lit("cap-"), col("doc_id"))).as("cap"))
      PhaseTimer.timed("pack_tar_samples", "shard_write") {
        graft.ops.TarExport.writeTarShards(src, col("doc_id"),
          Seq(col("doc_id")),
          Seq("txt" -> col("text"), "json" -> col("meta"),
            "cap" -> col("cap")),
          250L, s"$root/out").collect()
      }
      graft.ops.TarExport.readTarSamples(s, s"$root/out")
        .select(col("shard"), col("key"),
          size(col("entries")).cast("long").as("n_entries"),
          aggregate(map_values(col("entries")), lit(0L),
            (acc, x) => acc + length(x)).as("sample_bytes"))
        .orderBy("shard", "key")
    },

    // [EXT] incremental delta delivery (r15): bootstrap a delivery with
    // the EVEN documents as increment delta-000, then delta-export the
    // WHOLE corpus as delta-001 — the key anti-join against the index
    // sidecars must ship exactly the odd documents, nothing twice. Both
    // increments read back through the MANIFEST-VERIFIED sample reader,
    // so the republished commit pointer is enforced too. The oracle is
    // the parity split itself, at the per-sample grain.
    Probe(
      "pack_delta_export",
      "SELECT CAST(doc_id % 2 AS INT) AS increment, CAST(doc_id AS VARCHAR) AS key, " +
        "CAST(1 AS BIGINT) AS n_entries, " +
        "CAST(octet_length(encode(text)) AS BIGINT) AS txt_bytes " +
        "FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL " +
        "ORDER BY increment, key"
    ) { (s, d) =>
      val root = Probe.scratchDir("graft-delta-probe") + "/delivery"
      val src = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select("doc_id", "text")
      PhaseTimer.timed("pack_delta_export", "bootstrap_write") {
        graft.ops.DeltaExport.exportDelta(src.filter(col("doc_id") % 2 === 0),
          col("doc_id"), Seq(col("doc_id")), Seq("txt" -> col("text")),
          100L, root, "delta-000").collect()
      }
      PhaseTimer.timed("pack_delta_export", "delta_write") {
        graft.ops.DeltaExport.exportDelta(src, col("doc_id"),
          Seq(col("doc_id")), Seq("txt" -> col("text")), 100L, root,
          "delta-001").collect()
      }
      Seq(0, 1).map { b =>
        graft.ops.TarExport.readTarSamples(s, root, verifyManifest = true,
            glob = s"delta-00$b/shard-*.tar")
          .select(lit(b).as("increment"), col("key"),
            size(col("entries")).cast("long").as("n_entries"),
            length(element_at(col("entries"), "txt")).cast("long").as("txt_bytes"))
      }.reduce(_.union(_)).orderBy("increment", "key")
    },

    // [EXT] export manifest + integrity verification (r14): publish
    // _manifest.jsonl for a tar export, then DETERMINISTICALLY break the
    // delivery three ways — flip one byte in shard 1, delete the last
    // shard, drop an alien file into the glob — and oracle verify()'s
    // full classification in closed form: the untouched shards are 'ok',
    // the tampered one 'modified', the deleted one 'missing', the alien
    // 'unlisted'. Hash cost is one streaming task per shard file; the
    // diff joins two O(files)-row frames, never the corpus.
    Probe(
      "pack_export_verify",
      "WITH o AS (SELECT doc_id FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL), " +
        "s AS (SELECT DISTINCT CAST((row_number() OVER (ORDER BY doc_id) - 1) // 100 AS BIGINT) AS shard FROM o), " +
        "m AS (SELECT MAX(shard) AS mx FROM s) " +
        "SELECT * FROM (" +
        "SELECT 'shard-' || lpad(CAST(shard AS VARCHAR), 5, '0') || '.tar' AS file, " +
        "CASE WHEN shard = (SELECT mx FROM m) THEN 'missing' " +
        "WHEN shard = 1 THEN 'modified' ELSE 'ok' END AS status FROM s " +
        "UNION ALL SELECT 'shard-99999.tar' AS file, 'unlisted' AS status" +
        ") ORDER BY file"
    ) { (s, d) =>
      val root = Probe.scratchDir("graft-export-verify-probe")
      val src = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), col("text"))
      PhaseTimer.timed("pack_export_verify", "shard_write") {
        graft.ops.TarExport.writeTarShards(src, col("doc_id"),
          Seq(col("doc_id")), Seq("txt" -> col("text")), 100L,
          s"$root/out").collect()
      }
      PhaseTimer.timed("pack_export_verify", "manifest") {
        graft.ops.ExportIntegrity.writeManifest(s, s"$root/out", "shard-*.tar").collect()
      }
      // the three deterministic delivery faults
      val out = new java.io.File(s"$root/out")
      val shards = out.listFiles().map(_.getName)
        .filter(_.matches("shard-\\d{5}\\.tar")).sorted
      assert(shards.length >= 3,
        s"probe anchors tamper/delete to distinct shards, got ${shards.toSeq}")
      val raf = new java.io.RandomAccessFile(new java.io.File(out, "shard-00001.tar"), "rw")
      try { raf.seek(100); val b = raf.read(); raf.seek(100); raf.write(b ^ 0x01) }
      finally raf.close()
      assert(new java.io.File(out, shards.last).delete())
      val alien = new java.io.FileOutputStream(new java.io.File(out, "shard-99999.tar"))
      try alien.write("alien payload".getBytes("UTF-8")) finally alien.close()
      graft.ops.ExportIntegrity.verify(s, s"$root/out", "shard-*.tar")
        .select(col("file"), col("status"))
        .orderBy("file")
    },

    // [EXT] exact-size weighted sampling without replacement (r16,
    // Efraimidis-Spirakis A-ES keys): exactly k rows, inclusion odds
    // proportional to weight, from the deterministic md5 uniform — the
    // "pick exactly N docs, quality-weighted" budget selection the
    // Bernoulli sampler cannot hit. The oracle replays u, the A-ES key,
    // and the global ranking from scratch; selection is float-robust
    // (top-of-ranking adjacent key gaps ~1e-7 vs ~1e-15 pow error).
    Probe(
      "mix_weighted_exact",
      "WITH o AS (SELECT doc_id, n_chars, (CAST('0x' || substring(md5('r16aes' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) + 1) / 1152921504606846976.0 AS u " +
        "FROM documents WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL AND n_chars > 0), " +
        "r AS (SELECT doc_id, n_chars, row_number() OVER (ORDER BY pow(u, 1.0 / n_chars) DESC, doc_id) AS rn FROM o) " +
        "SELECT doc_id, n_chars FROM r WHERE rn <= 50 ORDER BY doc_id"
    ) { (s, d) =>
      graft.ext.Mixing.weightedSampleExact(
          t(s, d, "documents").select("doc_id", "n_chars"),
          "doc_id", "n_chars", k = 50, salt = "r16aes")
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    },

    // [EXT] LARGE-k exact weighted sampling (r17): same A-ES semantics,
    // but k far above the TakeOrdered cutover so the selection runs the
    // distributed threshold path (ops.OrderStat: approx-quantile bracket
    // + one exact boundary count + zero-shuffle filter + a band
    // TakeOrdered bounded by the cutover, never by k). The oracle replays
    // the identical global ranking — one wrong row at the threshold
    // boundary hash-mismatches. cutover=16 forces the distributed path
    // even at sf0.01; PlanSpec pins that no driver merge above the
    // cutover appears in the selected plan.
    Probe(
      "mix_weighted_exact_large",
      "WITH o AS (SELECT doc_id, n_chars, (CAST('0x' || substring(md5('r17aes' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) + 1) / 1152921504606846976.0 AS u " +
        "FROM documents WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL AND n_chars > 0), " +
        "r AS (SELECT doc_id, n_chars, row_number() OVER (ORDER BY pow(u, 1.0 / n_chars) DESC, doc_id) AS rn FROM o) " +
        "SELECT doc_id, n_chars FROM r WHERE rn <= 500 ORDER BY doc_id"
    ) { (s, d) =>
      graft.ext.Mixing.weightedSampleExact(
          t(s, d, "documents").select("doc_id", "n_chars"),
          "doc_id", "n_chars", k = 500, salt = "r17aes", cutover = 16)
        .select("doc_id", "n_chars")
        .repartition(1).sortWithinPartitions("doc_id")
    },

    // [EXT] exact distributed quantile (r17, ops.OrderStat): the
    // discrete (lower, no-interpolation) quantile of a high-cardinality
    // column via threshold selection — Spark's own exact `percentile`
    // materializes a value→count map (OOM on a continuous 10^10-row
    // column); this pays bracket passes and collects at most `cutover`
    // boundary keys. cutover=64 forces the distributed path on the 60k
    // lineitem rows; the oracle is DuckDB's quantile_disc, whose answer
    // is an EXACT element of the column — any rank slip hash-mismatches.
    Probe(
      "order_exact_quantile",
      "SELECT CAST(0.25 AS DOUBLE) AS q, CAST(quantile_disc(l_extendedprice, 0.25) AS DOUBLE) AS v FROM lineitem WHERE l_extendedprice IS NOT NULL " +
        "UNION ALL SELECT CAST(0.5 AS DOUBLE), CAST(quantile_disc(l_extendedprice, 0.5) AS DOUBLE) FROM lineitem WHERE l_extendedprice IS NOT NULL " +
        "UNION ALL SELECT CAST(0.9 AS DOUBLE), CAST(quantile_disc(l_extendedprice, 0.9) AS DOUBLE) FROM lineitem WHERE l_extendedprice IS NOT NULL ORDER BY q"
    ) { (s, d) =>
      import s.implicits._
      val li = t(s, d, "lineitem").select("l_extendedprice")
      val qs = Seq(0.25, 0.5, 0.9)
      qs.zip(graft.ops.OrderStat.exactQuantilesDisc(li, "l_extendedprice",
          qs, cutover = 64))
        .toDF("q", "v").repartition(1).sortWithinPartitions("q")
    },

    // [EXT] packed-sequence span table (r16): the loader-facing map of
    // which slice of each fixed-length training sequence belongs to
    // which document — the row set attention-mask construction and
    // position-id resets consume. The oracle re-derives every span in
    // closed form (running token total → overlapped sequence range →
    // clipped offsets), so one off-by-one in the prefix sum, the
    // sequence explode, or the clipping arithmetic hash-mismatches.
    Probe(
      "pack_sequence_spans",
      "WITH o AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL), " +
        "p AS (SELECT doc_id, tok, CAST(COALESCE(SUM(tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS ts FROM o), " +
        "s AS (SELECT doc_id, tok, ts, UNNEST(generate_series(ts // 512, (ts + tok - 1) // 512)) AS seq FROM p WHERE tok > 0) " +
        "SELECT CAST(seq AS BIGINT) AS seq, doc_id, CAST(GREATEST(ts - seq * 512, 0) AS BIGINT) AS span_offset, " +
        "CAST(LEAST(ts + tok, (seq + 1) * 512) - GREATEST(ts, seq * 512) AS BIGINT) AS span_len " +
        "FROM s ORDER BY seq, doc_id"
    ) { (s, d) =>
      val docs = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"),
          size(split(col("text"), " ", -1)).cast("long").as("tok"))
      graft.ops.Packing.sequenceSpans(docs, "doc_id", "tok", seqLen = 512)
        .select(col("seq"), col("doc_id"),
          col("offset").as("span_offset"), col("len").as("span_len"))
        .orderBy("seq", "doc_id")
    },

    // [EXT] materialized packed training rows (r16): packTokenIds
    // assembles each fixed-length sequence's ACTUAL token-id array from
    // per-document slices. The oracle rebuilds the global hashed-token
    // stream position by position (engine-wide md5-60bit convention) and
    // checks a position-weighted checksum per sequence — one misplaced
    // slice, swapped assembly order, or off-by-one clip shifts some
    // token's in-sequence position and breaks the checksum.
    Probe(
      "pack_token_ids",
      "WITH o AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL), " +
        "cnt AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n FROM o), " +
        "p AS (SELECT doc_id, CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS ts0 FROM cnt), " +
        "g AS (SELECT o.doc_id, p.ts0 + u.i - 1 AS gpos, CAST('0x' || substring(md5(o.ts[u.i]), 1, 15) AS BIGINT) AS h FROM o JOIN p USING (doc_id), UNNEST(generate_series(1, len(o.ts))) AS u(i)), " +
        "s AS (SELECT gpos // 512 AS seq, gpos % 512 AS lp, h FROM g) " +
        "SELECT CAST(seq AS BIGINT) AS seq, CAST(count(*) AS BIGINT) AS n_tokens, " +
        "CAST(sum((lp + 1) * (h % 1000003)) % 2147483647 AS BIGINT) AS checksum " +
        "FROM s GROUP BY seq ORDER BY seq"
    ) { (s, d) =>
      val docs = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"),
          transform(split(col("text"), " ", -1),
            tk => graft.ext.Dedup.md5Hash60Col(tk)).as("tokens"))
      graft.ops.Packing.packTokenIds(docs, "doc_id", "tokens", seqLen = 512)
        .select(col("seq"), posexplode(col("ids")))
        .toDF("seq", "p", "h")
        .groupBy("seq")
        .agg(count(lit(1)).as("n_tokens"),
          (sum((col("p") + 1) * pmod(col("h"), lit(1000003L))) %
            2147483647L).cast("long").as("checksum"))
        .orderBy("seq")
    },

    // [EXT] byte-budget tar sharding (r14): shards sized by BYTES via
    // the distributed prefix-sum primitive — next-fit on the exclusive
    // running total of each sample's framed size (512-byte ustar header
    // + payload padded to 512), shard = floor(prefix / budget). The
    // oracle re-derives the entire assignment in closed form with a
    // window running total, so a single sample in the wrong shard (an
    // off-by-one in the prefix, a wrong framed size) hash-mismatches.
    Probe(
      "pack_tar_bybytes",
      "WITH o AS (SELECT doc_id, text FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL), " +
        "f AS (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS payload, " +
        "CAST(512 * (1 + (octet_length(encode(text)) + 511) // 512) AS BIGINT) AS framed FROM o), " +
        "p AS (SELECT doc_id, payload, framed, " +
        "COALESCE(SUM(framed) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre FROM f) " +
        "SELECT CAST(pre // 131072 AS BIGINT) AS shard, " +
        "CAST(COUNT(*) AS BIGINT) AS n_samples, CAST(COUNT(*) AS BIGINT) AS n_entries, " +
        "CAST(SUM(payload) AS BIGINT) AS payload_bytes " +
        "FROM p GROUP BY 1 ORDER BY shard"
    ) { (s, d) =>
      val root = Probe.scratchDir("graft-tar-bybytes-probe")
      val src = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), col("text"))
      PhaseTimer.timed("pack_tar_bybytes", "shard_write") {
        graft.ops.TarExport.writeTarShardsByBytes(src, col("doc_id"),
          Seq(col("doc_id")), Seq("txt" -> col("text")), 131072L,
          s"$root/out").collect()
      }
      // re-read the committed tars: the per-shard census comes from the
      // FILES, not the writer's accounting
      graft.ops.TarExport.readTarSamples(s, s"$root/out")
        .select(col("shard"), col("key"),
          aggregate(map_values(col("entries")), lit(0L),
            (acc, x) => acc + length(x)).as("payload"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_samples"), count(lit(1)).as("n_entries"),
          sum(col("payload")).as("payload_bytes"))
        .orderBy("shard")
    },

    // [EXT] continuous verified delivery (r14): the documents corpus
    // split into three key-disjoint micro-batches (doc_id mod 3)
    // through a REAL checkpointed file-source stream; each batch lands
    // as its own batch-<id>/ tar shard set and the root manifest is
    // republished after every batch. The read-back runs WITH
    // verifyManifest=true over the nested layout — so a wrong manifest,
    // a missing shard, or a corrupt byte fails the probe, not just the
    // census. Oracle is trigger-order-independent: a sample's shard
    // ordinal depends only on its rank WITHIN its residue class, never
    // on which batch id its file drew.
    Probe(
      "stream_tar_delivery",
      "WITH o AS (SELECT doc_id, text FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL), " +
        "r AS (SELECT doc_id, text, row_number() OVER (PARTITION BY doc_id % 3 ORDER BY doc_id) - 1 AS rk FROM o) " +
        "SELECT CAST(rk // 200 AS BIGINT) AS shard, CAST(doc_id AS VARCHAR) AS key, " +
        "CAST(1 AS BIGINT) AS n_entries, " +
        "CAST(octet_length(encode(text)) AS BIGINT) AS sample_bytes " +
        "FROM r ORDER BY key"
    ) { (s, d) =>
      val root = Probe.scratchDir("graft-stream-tar-probe")
      val src = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), col("text"))
      // three KEY-DISJOINT residue classes, one file each → three
      // micro-batches under maxFilesPerTrigger=1
      val feedDir = s"$root/feed"
      PhaseTimer.timed("stream_tar_delivery", "feed_write") {
        (0 until 3).foreach(b => src.filter(col("doc_id") % 3 === b)
          .coalesce(1).write.mode("append").parquet(feedDir))
      }
      PhaseTimer.timed("stream_tar_delivery", "stream_export") {
        val feed = s.readStream
          .schema(org.apache.spark.sql.types.StructType.fromDDL(
            "doc_id BIGINT, text STRING"))
          .option("maxFilesPerTrigger", "1")
          .parquet(feedDir)
        val q = graft.streaming.StreamingExport.tarShards(feed,
          col("doc_id"), Seq(col("doc_id")), Seq("txt" -> col("text")),
          200L, s"$root/out", s"$root/ckpt",
          trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
        q.awaitTermination()
      }
      graft.ops.TarExport.readTarSamples(s, s"$root/out",
          verifyManifest = true, glob = "batch-*/shard-*.tar")
        .select(col("shard"), col("key"),
          size(col("entries")).cast("long").as("n_entries"),
          aggregate(map_values(col("entries")), lit(0L),
            (acc, x) => acc + length(x)).as("sample_bytes"))
        .orderBy("key")
    },

    // [EXT] delivery compaction (r14): the multimodal export re-sharded
    // at the SAMPLE grain into byte-budget shards — read back, regroup,
    // re-export, one corpus exchange. The oracle re-derives the entire
    // compacted layout from the source table in closed form: framed
    // sizes per modality (with the null-skip), the running total in the
    // compactor's (string-key, shard) order, and the next-fit shard
    // split — so a lost modality, a wrong framed size, or a misplaced
    // sample all hash-mismatch.
    Probe(
      "pack_tar_compact",
      "WITH o AS (SELECT doc_id, text FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL), " +
        "f AS (SELECT doc_id, octet_length(encode(text)) AS b_txt, " +
        "octet_length(encode('meta:' || doc_id || ':' || length(text))) AS b_json, " +
        "CASE WHEN doc_id % 3 = 0 THEN octet_length(encode('cap-' || doc_id)) END AS b_cap FROM o), " +
        "g AS (SELECT doc_id, CAST(b_txt + b_json + COALESCE(b_cap, 0) AS BIGINT) AS payload, " +
        "CAST(2 + CASE WHEN b_cap IS NULL THEN 0 ELSE 1 END AS BIGINT) AS n_e, " +
        "CAST(512 * (1 + (b_txt + 511) // 512) + 512 * (1 + (b_json + 511) // 512) " +
        " + COALESCE(512 * (1 + (b_cap + 511) // 512), 0) AS BIGINT) AS framed FROM f), " +
        "p AS (SELECT doc_id, payload, n_e, " +
        "COALESCE(SUM(framed) OVER (ORDER BY CAST(doc_id AS VARCHAR) ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre FROM g) " +
        "SELECT CAST(pre // 262144 AS BIGINT) AS shard, CAST(COUNT(*) AS BIGINT) AS n_samples, " +
        "CAST(SUM(n_e) AS BIGINT) AS n_entries, CAST(SUM(payload) AS BIGINT) AS payload_bytes " +
        "FROM p GROUP BY 1 ORDER BY shard"
    ) { (s, d) =>
      val root = Probe.scratchDir("graft-tar-compact-probe")
      val src = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), col("text"),
          concat(lit("meta:"), col("doc_id"), lit(":"),
            length(col("text"))).as("meta"),
          when(col("doc_id") % 3 === 0,
            concat(lit("cap-"), col("doc_id"))).as("cap"))
      PhaseTimer.timed("pack_tar_compact", "source_write") {
        graft.ops.TarExport.writeTarShards(src, col("doc_id"),
          Seq(col("doc_id")),
          Seq("txt" -> col("text"), "json" -> col("meta"),
            "cap" -> col("cap")),
          250L, s"$root/src").collect()
      }
      PhaseTimer.timed("pack_tar_compact", "compact") {
        graft.ops.TarExport.compactTarShards(s, s"$root/src",
          s"$root/dst", 262144L).collect()
      }
      graft.ops.TarExport.readTarSamples(s, s"$root/dst")
        .select(col("shard"), col("key"),
          size(col("entries")).cast("long").as("n_e"),
          aggregate(map_values(col("entries")), lit(0L),
            (acc, x) => acc + length(x)).as("payload"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_samples"), sum(col("n_e")).as("n_entries"),
          sum(col("payload")).as("payload_bytes"))
        .orderBy("shard")
    },

    // [EXT] loader shard assignment (r14): the split_by_node step —
    // every node derives the SAME worker split from the published
    // manifest with zero coordination. Round-robin over sorted manifest
    // order, so the oracle re-derives worker = shard index mod N from
    // the corpus alone.
    Probe(
      "pack_shard_assign",
      "WITH o AS (SELECT doc_id FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL), " +
        "s AS (SELECT DISTINCT CAST((row_number() OVER (ORDER BY doc_id) - 1) // 100 AS BIGINT) AS shard FROM o) " +
        "SELECT 'shard-' || lpad(CAST(shard AS VARCHAR), 5, '0') || '.tar' AS file, " +
        "CAST(shard % 3 AS INTEGER) AS worker FROM s ORDER BY file"
    ) { (s, d) =>
      val root = Probe.scratchDir("graft-shard-assign-probe")
      val src = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), col("text"))
      PhaseTimer.timed("pack_shard_assign", "shard_write") {
        graft.ops.TarExport.writeTarShards(src, col("doc_id"),
          Seq(col("doc_id")), Seq("txt" -> col("text")), 100L,
          s"$root/out").collect()
      }
      val manifest = graft.ops.ExportIntegrity.writeManifest(
        s, s"$root/out", "shard-*.tar")
      graft.ops.ExportIntegrity.assignShardsRoundRobin(manifest, 3)
        .select(col("file"), col("worker"))
        .repartition(1).sortWithinPartitions("file")
    },

    // [EXT] wids-style sample index (r14): the writer records every
    // sample's byte offset inside its shard while streaming (one jsonl
    // sidecar per shard, committed after its tar). The oracle re-derives
    // each offset in CLOSED FORM from tar framing arithmetic — 512-byte
    // header + payload padded to 512 per entry, running total within the
    // shard — so a single misplaced header byte hash-mismatches.
    Probe(
      "pack_tar_index",
      "WITH o AS (SELECT doc_id, text, row_number() OVER (ORDER BY doc_id) - 1 AS ord " +
        "FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL), " +
        "f AS (SELECT doc_id, ord, CAST(ord // 100 AS BIGINT) AS shard, " +
        "CAST(octet_length(encode(text)) AS BIGINT) AS payload, " +
        "CAST(512 * (1 + (octet_length(encode(text)) + 511) // 512) AS BIGINT) AS framed FROM o) " +
        "SELECT shard, CAST(doc_id AS VARCHAR) AS key, " +
        "CAST(COALESCE(SUM(framed) OVER (PARTITION BY shard ORDER BY ord ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS sample_offset, " +
        "CAST(1 AS BIGINT) AS n_entries, payload AS sample_bytes " +
        "FROM f ORDER BY shard, sample_offset"
    ) { (s, d) =>
      val root = Probe.scratchDir("graft-tar-index-probe")
      val src = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), col("text"))
      PhaseTimer.timed("pack_tar_index", "shard_write") {
        graft.ops.TarExport.writeTarShards(src, col("doc_id"),
          Seq(col("doc_id")), Seq("txt" -> col("text")), 100L,
          s"$root/out", index = true).collect()
      }
      graft.ops.TarExport.readTarIndex(s, s"$root/out")
        .select(col("shard"), col("key"),
          col("offset").as("sample_offset"),
          col("entries").as("n_entries"), col("bytes").as("sample_bytes"))
        .repartition(1).sortWithinPartitions("shard", "sample_offset")
    },

    // [EXT] random-access point lookup into a delivery (r14): a key
    // subset seeks straight to its samples via the index — cost is
    // O(index scan) + O(matched bytes), never O(corpus). The oracle is
    // the strongest kind: the DECODED text of every looked-up sample
    // must equal the source table's — a wrong offset, a misread entry,
    // or a boundary slip produces different bytes.
    Probe(
      "pack_tar_lookup",
      "SELECT CAST(doc_id AS VARCHAR) AS key, text " +
        "FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL " +
        "AND doc_id % 17 = 0 ORDER BY key"
    ) { (s, d) =>
      val root = Probe.scratchDir("graft-tar-lookup-probe")
      val src = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), col("text"))
      PhaseTimer.timed("pack_tar_lookup", "shard_write") {
        graft.ops.TarExport.writeTarShards(src, col("doc_id"),
          Seq(col("doc_id")), Seq("txt" -> col("text")), 100L,
          s"$root/out", index = true).collect()
      }
      val wanted = src.filter(col("doc_id") % 17 === 0)
        .select(col("doc_id").cast("string").as("key"))
      graft.ops.TarExport.lookupTarSamples(s, s"$root/out", wanted)
        .select(col("key"),
          element_at(col("entries"), "txt").cast("string").as("text"))
        .orderBy("key")
    }
  )
}
