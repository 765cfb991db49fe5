package graft.probes

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** [EXT] probes: streaming-window semantics evaluated in batch mode over the
  * `events` table (SURVEY §2.10 note), plus the large-scale training-data
  * operators (dedup / similarity / text analysis) added in later groups.
  *
  * The same window functions are used by graft.streaming.EventStreams in
  * true streaming mode; batch evaluation gives the oracle-checkable surface.
  */
object ExtProbes {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Streaming-equivalent window probes (batch evaluation). */
  val streamingWindows: Seq[Probe] = Seq(

    // Tumbling 10-minute window: Spark window() buckets are epoch-aligned,
    // so the oracle reproduces them with integer µs arithmetic.
    Probe(
      "stream_tumbling_window",
      "SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 600000000) * 600000000 AS win_us, event_type, count(*) AS cnt, round(sum(value), 2) AS total FROM events GROUP BY 1, 2 ORDER BY win_us, event_type"
    ) { (s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("total"))
        .select(unix_micros(col("w.start")).as("win_us"), col("event_type"),
          col("cnt"), col("total"))
        .orderBy("win_us", "event_type")
    },

    // Sliding 10-minute window, 5-minute slide: every event lands in two
    // windows; the oracle unions the two shifted bucket assignments.
    Probe(
      "stream_sliding_window",
      "WITH b AS (SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 300000000) * 300000000 AS s0, value FROM events), w AS (SELECT s0 AS win_us, value FROM b UNION ALL SELECT s0 - 300000000 AS win_us, value FROM b) SELECT win_us, count(*) AS cnt, round(sum(value), 2) AS total FROM w GROUP BY win_us ORDER BY win_us"
    ) { (s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("total"))
        .select(unix_micros(col("w.start")).as("win_us"), col("cnt"), col("total"))
        .orderBy("win_us")
    },

    // Session windows with a 5-minute gap per user: the oracle reproduces
    // Spark's session_window() semantics with the classic lag + cumulative
    // new-session-flag sessionization (new session when gap >= 5 min).
    Probe(
      "stream_session_window",
      "WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value FROM events), f AS (SELECT user_id, us, value, CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us) >= 300000000 OR lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL THEN 1 ELSE 0 END AS new_sess FROM e), g AS (SELECT user_id, us, value, sum(new_sess) OVER (PARTITION BY user_id ORDER BY us ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id FROM f) SELECT user_id, min(us) AS sess_start_us, max(us) AS sess_last_us, count(*) AS cnt, round(sum(value), 2) AS total FROM g GROUP BY user_id, sess_id ORDER BY user_id, sess_start_us"
    ) { (s, d) =>
      t(s, d, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "5 minutes").as("w"))
        .agg(min(unix_micros(col("ts"))).as("sess_start_us"),
          max(unix_micros(col("ts"))).as("sess_last_us"),
          count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("total"))
        .select("user_id", "sess_start_us", "sess_last_us", "cnt", "total")
        .orderBy("user_id", "sess_start_us")
    }
  )

  // ---------------------------------------------------------------------
  // Text analysis (graft.ext.TextAnalysis)
  // ---------------------------------------------------------------------

  import graft.ext.{Dedup, Similarity, TextAnalysis => TA}

  /** SQL literal list of all language-marker tokens. */
  private[probes] val markersSql: String =
    TA.profiles.values.flatten.toSeq.distinct.sorted.map(s => s"'$s'").mkString(", ")

  /** DuckDB CASE arm matching TextAnalysis.fpWeights (131^k mod p). */
  private val fpCaseSql: String =
    "CASE (i-1)%8 " + TA.fpWeights.zipWithIndex
      .map { case (w, k) => s"WHEN $k THEN $w" }.mkString(" ") + " END"

  val textAnalysis: Seq[Probe] = Seq(

    Probe(
      "text_token_stats",
      "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, CAST(length(text) AS BIGINT) AS n_chars_measured FROM documents ORDER BY doc_id"
    ) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TA.tokenCount(col("text")).as("n_tokens"),
          length(col("text")).cast("long").as("n_chars_measured"))
        .repartition(1).sortWithinPartitions("doc_id")
    },

    Probe(
      "text_bpe_token_count",
      "SELECT doc_id, CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe FROM documents ORDER BY doc_id"
    ) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TA.bpeTokenCount(col("text")).as("n_bpe"))
        .repartition(1).sortWithinPartitions("doc_id")
    },

    // [EXT] large-blocklist phrase screen (r16): every OVERLAPPING
    // occurrence of every phrase, counted by the broadcast Aho-Corasick
    // automaton in one O(chars + matches) pass — while the oracle pays
    // the O(chars × phrases) naive position scan the automaton exists to
    // avoid, re-deriving every count from scratch (substring containment
    // included: 'scan' hits inside 'table scan', 'an' inside both).
    Probe(
      "text_blocklist_match",
      "WITH m AS (SELECT d.doc_id, t.p, len(list_filter(generate_series(1, length(d.text) - length(t.p) + 1), " +
        "i -> substring(d.text, i, length(t.p)) = t.p)) AS c " +
        "FROM documents d CROSS JOIN (VALUES ('scan'), ('order'), ('table scan'), ('an'), ('me')) AS t(p) " +
        "WHERE d.doc_id IS NOT NULL AND d.text IS NOT NULL) " +
        "SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_matches, CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_phrases " +
        "FROM m GROUP BY doc_id ORDER BY doc_id"
    ) { (s, d) =>
      // bench-visible LIST-SCALE phase (r17): build a 100k-phrase
      // automaton and sweep the corpus through it — the workload the
      // operator exists for; the sorted-edge-array hot loop is what this
      // times. Synthetic phrases mostly miss (pure traversal cost) with
      // the real phrases mixed in so match sites exercise too. The
      // probe's ORACLED result stays the small-list census below.
      PhaseTimer.timed("text_blocklist_match", "match_100k") {
        val big = (0 until 100000).map(i => s"zq${i}x${i % 97}") ++
          Seq("scan", "order", "table scan", "an", "me")
        graft.ext.Blocklist.matchCounts(
            t(s, d, "documents"), "doc_id", "text", big)
          .agg(sum(col("n_matches"))).head()
      }
      graft.ext.Blocklist.matchCounts(
        t(s, d, "documents"), "doc_id", "text",
        Seq("scan", "order", "table scan", "an", "me"))
        .repartition(1).sortWithinPartitions("doc_id")
    },

    // [EXT] blocklist redaction geometry (r16): the merged covered
    // character intervals every phrase occurrence contributes — what
    // Blocklist.redact masks. The oracle derives the covered CHARACTER
    // SET by brute force and re-merges it into maximal islands, so a
    // missed nested match, a wrong phrase length, or a broken interval
    // merge (e.g. a long phrase bridging several earlier spans)
    // hash-mismatches.
    Probe(
      "text_blocklist_spans",
      "WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL), " +
        "m AS (SELECT d.doc_id, u.i - 1 AS s, u.i - 1 + length(t.p) AS e FROM d CROSS JOIN (VALUES ('table scan'), ('scan'), ('an'), ('me')) t(p), " +
        "UNNEST(generate_series(1, length(d.text) - length(t.p) + 1)) AS u(i) WHERE substring(d.text, u.i, length(t.p)) = t.p), " +
        "cov AS (SELECT DISTINCT doc_id, u2.c AS pos FROM m, UNNEST(generate_series(s, e - 1)) AS u2(c)), " +
        "i AS (SELECT doc_id, pos, CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 1 THEN 1 ELSE 0 END AS brk FROM cov), " +
        "j AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM i) " +
        "SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start, CAST(max(pos) + 1 AS BIGINT) AS span_end FROM j GROUP BY doc_id, grp ORDER BY doc_id, span_start"
    ) { (s, d) =>
      graft.ext.Blocklist.matchSpans(
        t(s, d, "documents"), "doc_id", "text",
        Seq("table scan", "scan", "an", "me"))
        .repartition(1).sortWithinPartitions("doc_id", "span_start")
    },

    // [EXT] corpus-scale BPE tokenizer APPLICATION (r16): train merges,
    // derive the deterministic subword-id vocabulary, ENCODE every
    // document to its flat token-id sequence, then DECODE the ids back —
    // the probe hands the decoded text to the oracle, so any defect in
    // merge application, id assignment, end-of-word marking, or decode
    // (one swapped id, one misplaced marker) corrupts some document and
    // hash-mismatches. The oracle is closed-form from the source table:
    // lossless roundtrip up to single-space word joining.
    Probe(
      "bpe_encode_roundtrip",
      "SELECT doc_id, array_to_string(list_filter(string_split(text, ' '), w -> len(w) > 0), ' ') AS text " +
        "FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL ORDER BY doc_id"
    ) { (s, d) =>
      val docs = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      val (merges, vocab) = PhaseTimer.timed("bpe_encode_roundtrip", "train") {
        val m = graft.ext.Bpe.learnMerges(docs, "text", numMerges = 80)
        (m, graft.ext.Bpe.subwordVocab(docs, "text", m))
      }
      val enc = graft.ext.Bpe.encodeDocs(docs, "doc_id", "text", merges, vocab)
      graft.ext.Bpe.decodeDocs(enc, "doc_id", "token_ids", vocab)
        .repartition(1).sortWithinPartitions("doc_id")
    },

    // [EXT] BPE char-fallback coverage (r17): the tokenizer model is
    // trained on ONE source but applied to the WHOLE corpus — words
    // absent from training decompose into the charset-seeded
    // single-codepoint symbols instead of throwing, and the roundtrip
    // stays lossless (same closed-form oracle as bpe_encode_roundtrip).
    // This is the production shape: a frozen tokenizer meeting new data.
    Probe(
      "bpe_encode_fallback",
      "SELECT doc_id, array_to_string(list_filter(string_split(text, ' '), w -> len(w) > 0), ' ') AS text " +
        "FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL ORDER BY doc_id"
    ) { (s, d) =>
      val docs = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      val train = docs.filter(col("source") === "src0")
      val ascii = (33 to 126).map(_.toChar).mkString
      val (merges, vocab) = PhaseTimer.timed("bpe_encode_fallback", "train") {
        val m = graft.ext.Bpe.learnMerges(train, "text", numMerges = 40)
        (m, graft.ext.Bpe.subwordVocab(train, "text", m, seedChars = ascii))
      }
      val enc = graft.ext.Bpe.encodeDocs(docs, "doc_id", "text", merges, vocab)
      graft.ext.Bpe.decodeDocs(enc, "doc_id", "token_ids", vocab)
        .repartition(1).sortWithinPartitions("doc_id")
    },

    Probe(
      "text_quality_score",
      s"""WITH q AS (SELECT doc_id, text, string_split(text, ' ') AS ts FROM documents) SELECT doc_id, round(least(1.0, (len(list_filter(ts, x -> x IN ($markersSql))) * 1.0 / len(ts)) * 2.0) * 0.5 + (1.0 - (length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) * 1.0 / length(text))) * 0.3 + least(1.0, ((length(text) - (len(ts) - 1)) * 1.0 / len(ts)) / 8.0) * 0.2, 9) AS quality FROM q ORDER BY doc_id"""
    ) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), round(TA.qualityScore(col("text")), 9).as("quality"))
        .repartition(1).sortWithinPartitions("doc_id")
    },

    Probe(
      "text_langid",
      s"""WITH q AS (SELECT doc_id, lang, text, string_split(text, ' ') AS ts FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL), c AS (SELECT doc_id, lang, text, len(list_filter(ts, x -> x IN ('the','a','of','and','to','is','in'))) AS c_en, len(list_filter(ts, x -> x IN ('der','die','das','und','ist','nicht'))) AS c_de, len(list_filter(ts, x -> x IN ('el','la','los','las','es','y'))) AS c_es, len(list_filter(ts, x -> x IN ('le','les','des','et','est','une'))) AS c_fr FROM q) SELECT doc_id, lang, CASE WHEN length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) * 10 >= length(text) * 3 THEN 'zh' WHEN c_de > c_en AND c_de > c_es AND c_de > c_fr THEN 'de' WHEN c_es > c_en AND c_es > c_fr THEN 'es' WHEN c_fr > c_en THEN 'fr' ELSE 'en' END AS lang_pred FROM c ORDER BY doc_id"""
    ) { (s, d) =>
      // null filter mirrored in the oracle WHERE: graft_langid yields
      // NULL on null text where the oracle CASE would fall through to
      // 'en' — excluding nulls keeps the contract engine-independent
      t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), col("lang"),
          TA.langIdNative(col("text")).as("lang_pred"))
        .repartition(1).sortWithinPartitions("doc_id")
    },

    Probe(
      "text_fingerprint",
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents), term AS (SELECT doc_id, (length(ts[i]) + 1) * ($fpCaseSql) AS v FROM tok, UNNEST(generate_series(1, len(ts))) AS g(i)) SELECT doc_id, CAST(sum(v) % ${TA.FpMod} AS BIGINT) AS fp FROM term GROUP BY doc_id ORDER BY doc_id"""
    ) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TA.fingerprint(col("text")).as("fp"))
        .repartition(1).sortWithinPartitions("doc_id")
    },

    Probe(
      "text_remove_stopwords",
      s"SELECT doc_id, array_to_string(list_filter(string_split(text, ' '), x -> NOT x IN ($markersSql)), ' ') AS cleaned FROM documents ORDER BY doc_id"
    ) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TA.removeStopwords(col("text")).as("cleaned"))
        .repartition(1).sortWithinPartitions("doc_id")
    },

    // [EXT] sequence packing (ops.Packing): documents concatenated in id
    // order and chopped into 512-token training sequences; the oracle is
    // the ANSI running-sum formulation of the same placement. The Spark
    // side computes the prefix sum with the two-pass partition-offset
    // scheme (no single-task global window).
    Probe(
      "text_pack_sequences",
      "WITH tc AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS token_count FROM documents), c AS (SELECT doc_id, token_count, sum(token_count) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - token_count AS token_start FROM tc) SELECT doc_id, token_count, CAST(token_start AS BIGINT) AS token_start, CAST(token_start // 512 AS BIGINT) AS seq_start, CAST(token_start % 512 AS BIGINT) AS seq_offset, CAST(greatest(token_start // 512, (token_start + token_count - 1) // 512) AS BIGINT) AS seq_end FROM c ORDER BY doc_id"
    ) { (s, d) =>
      graft.ops.Packing.packSequences(
          t(s, d, "documents").select(col("doc_id"),
            TA.tokenCount(col("text")).as("tok")),
          "doc_id", "tok", 512)
        .orderBy("doc_id")
    },

    // Composed corpus statistics per language: the everything-together
    // aggregation shape a training-data curation job runs first.
    Probe(
      "text_corpus_stats",
      s"""WITH q AS (SELECT lang, text, string_split(text, ' ') AS ts FROM documents) SELECT lang, count(*) AS n_docs, CAST(sum(len(ts)) AS BIGINT) AS n_tokens, round(avg(least(1.0, (len(list_filter(ts, x -> x IN ($markersSql))) * 1.0 / len(ts)) * 2.0) * 0.5 + (1.0 - (length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) * 1.0 / length(text))) * 0.3 + least(1.0, ((length(text) - (len(ts) - 1)) * 1.0 / len(ts)) / 8.0) * 0.2), 6) AS avg_quality FROM q GROUP BY lang ORDER BY lang"""
    ) { (s, d) =>
      t(s, d, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(TA.tokens(col("text")))).cast("long").as("n_tokens"),
          round(avg(TA.qualityScore(col("text"))), 6).as("avg_quality"))
        .orderBy("lang")
    },

    // Karp-Rabin rolling fingerprint over md5-derived 60-bit token hashes:
    // the oracle folds the identical base-131 mod-prime recurrence, so the
    // stored lineage signature is auditable by any SQL engine.
    Probe(
      "text_fingerprint_rolling",
      "SELECT doc_id, list_reduce(list_prepend(0::BIGINT, list_transform(string_split(text, ' '), t -> CAST('0x' || substring(md5(t), 1, 15) AS BIGINT) % 1073741789)), (a, b) -> (a * 131 + b) % 1073741789) AS fp_kr FROM documents ORDER BY doc_id"
    ) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TA.rollingFingerprint(col("text")).as("fp_kr"))
        .repartition(1).sortWithinPartitions("doc_id")
    },

    // HTML -> text extraction (r18, HtmlText): five markup shapes per
    // doc_id — head/style wrap, entity decode, script/noscript junk,
    // link-saturated nav chrome, paragraph split — built identically in
    // Spark and SQL, so the oracle states the expected prose in closed
    // form. text_full carries everything (nav text included, head
    // dropped); text_content additionally drops the link-dense nav block
    // (the jusText-style density heuristic) — the two columns differing
    // EXACTLY on variant 3 is the boilerplate-filter contract.
    Probe(
      "text_html_extract",
      "SELECT doc_id, " +
        "CASE doc_id % 5 " +
        "WHEN 0 THEN text " +
        "WHEN 1 THEN text || ' & more' " +
        "WHEN 2 THEN text " +
        "WHEN 3 THEN 'Home About Pages' || chr(10) || text " +
        // empty-block semantics (r19): the engine drops a block whose
        // trimmed text is empty (a <=10-char doc's second piece, or a
        // piece that trims to nothing), so the oracle concatenates only
        // the non-empty trimmed pieces — concat_ws skips NULLs
        "ELSE concat_ws(chr(10), nullif(trim(substr(text, 1, 10)), ''), nullif(trim(substr(text, 11)), '')) " +
        "END AS text_full, " +
        "CASE doc_id % 5 " +
        "WHEN 0 THEN text " +
        "WHEN 1 THEN text || ' & more' " +
        "WHEN 2 THEN text " +
        "WHEN 3 THEN text " +
        // empty-block semantics (r19): the engine drops a block whose
        // trimmed text is empty (a <=10-char doc's second piece, or a
        // piece that trims to nothing), so the oracle concatenates only
        // the non-empty trimmed pieces — concat_ws skips NULLs
        "ELSE concat_ws(chr(10), nullif(trim(substr(text, 1, 10)), ''), nullif(trim(substr(text, 11)), '')) " +
        "END AS text_content " +
        "FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL " +
        "ORDER BY doc_id"
    ) { (s, d) =>
      val v = pmod(col("doc_id"), lit(5))
      val html = when(v === 0, concat(
        lit("<html><head><title>T</title><style>p{color:red}</style>" +
          "</head><body><p>"), col("text"), lit("</p></body></html>")))
        .when(v === 1, concat(
          lit("<div>"), col("text"), lit(" &amp; more</div>")))
        .when(v === 2, concat(
          lit("<body><script>var x = '<p>nope</p>';</script><p>"),
          col("text"), lit("</p><noscript>no js</noscript></body>")))
        .when(v === 3, concat(
          lit("<nav><a href=\"/\">Home</a> <a href=\"/a\">About Pages</a>" +
            "</nav><p>"), col("text"), lit("</p>")))
        .otherwise(concat(
          lit("<p>"), expr("substring(text, 1, 10)"),
          lit("</p><!-- split --><p>"), expr("substring(text, 11)"),
          lit("</p>")))
      t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"),
          graft.ext.HtmlText.htmlText(html).as("text_full"),
          graft.ext.HtmlText.htmlContent(html).as("text_content"))
        .repartition(1).sortWithinPartitions("doc_id")
    },

    // Page-declared crawl signals (r18, HtmlText.pageMeta): canonical
    // link + robots directives — the dedup key and drop filter a crawl
    // pipeline reads BEFORE any content pass. Shapes cover entity-
    // decoded hrefs, rel token lists with unquoted attributes, pages
    // with no signals, and a canonical hidden inside a script string
    // (must NOT count) next to an unquoted uppercase robots value.
    Probe(
      "text_html_pagemeta",
      "SELECT doc_id, " +
        "CASE doc_id % 5 " +
        "WHEN 0 THEN 'https://canon' || CAST(doc_id // 5 AS VARCHAR) || '.example.com/page?x=1&y=' || CAST(doc_id // 5 AS VARCHAR) " +
        "WHEN 2 THEN '/p/' || CAST(doc_id // 5 AS VARCHAR) " +
        "ELSE NULL END AS canonical_href, " +
        "doc_id % 5 IN (0, 4) AS noindex, " +
        "doc_id % 5 = 0 AS nofollow " +
        "FROM documents WHERE doc_id IS NOT NULL " +
        "ORDER BY doc_id"
    ) { (s, d) =>
      val g = expr("doc_id DIV 5").cast("string")
      val v = pmod(col("doc_id"), lit(5))
      val html = when(v === 0, concat(
        lit("<html><head><link rel=\"canonical\" href=\"https://canon"), g,
        lit(".example.com/page?x=1&amp;y="), g,
        lit("\"><meta name=\"robots\" content=\"noindex, nofollow\">" +
          "</head><body><p>b</p></body></html>")))
        .when(v === 1, lit("<html><head><meta name=robots " +
          "content=\"index, follow\"></head><body></body></html>"))
        .when(v === 2, concat(
          lit("<html><head><link rel='alternate canonical' href=/p/"), g,
          lit("></head><body></body></html>")))
        .when(v === 3, lit("<html><body><p>nothing declared</p></body></html>"))
        .otherwise(lit("<html><head><script>var s='<link rel=canonical " +
          "href=/no>';</script><meta name=robots content=NOINDEX>" +
          "</head><body></body></html>"))
      val meta = graft.ext.HtmlText.htmlPageMeta(html)
      t(s, d, "documents")
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id"),
          meta.getField("_1").as("canonical_href"),
          meta.getField("_2").as("noindex"),
          meta.getField("_3").as("nofollow"))
        .repartition(1).sortWithinPartitions("doc_id")
    },

    // Unicode normalization (r19, TextClean): the fixture appends a
    // DECOMPOSED suffix (e + combining acute, the fi ligature, a
    // fullwidth H) that is byte-distinct from the oracle's composed
    // literals — green means NFC composed the combining sequence and
    // NFKC additionally folded the compatibility forms, per-row, zero
    // shuffle.
    Probe(
      "text_unicode_normalize",
      "SELECT doc_id, " +
        "text || ' caf\u00e9 \ufb01le \uff28i' AS nfc, " +
        "text || ' caf\u00e9 file Hi' AS nfkc " +
        "FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL " +
        "ORDER BY doc_id"
    ) { (s, d) =>
      val denorm = concat(col("text"),
        lit(" café ﬁle Ｈi")) // decomposed + ligature + fullwidth
      t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"),
          graft.ext.TextClean.nfc(denorm).as("nfc"),
          graft.ext.TextClean.nfkc(denorm).as("nfkc"))
        .repartition(1).sortWithinPartitions("doc_id")
    },

    // Mojibake repair (r19, TextClean): even docs ship DOUBLE-ENCODED
    // (their UTF-8 bytes re-decoded as latin-1 — built with pure
    // Column ops, encode/decode, so the corruption itself is part of
    // the declarative plan); odd docs ship clean. The oracle states
    // the REPAIRED text closed-form for both: green means the inverse
    // byte-mapping + strict UTF-8 round-trip recovered every corrupted
    // row exactly and touched no clean row.
    Probe(
      "text_mojibake_repair",
      "SELECT doc_id, " +
        "text || CASE WHEN doc_id % 2 = 0 THEN ' caf\u00e9 \u2014 \u201cq\u201d' ELSE '' END AS repaired " +
        "FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL " +
        "ORDER BY doc_id"
    ) { (s, d) =>
      val suffixed = concat(col("text"),
        lit(" caf\u00e9 \u2014 \u201cq\u201d"))
      val corrupted = decode(encode(suffixed, "UTF-8"), "ISO-8859-1")
      val input = when(pmod(col("doc_id"), lit(2)) === 0, corrupted)
        .otherwise(col("text"))
      t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"),
          graft.ext.TextClean.repairMojibake(input).as("repaired"))
        .repartition(1).sortWithinPartitions("doc_id")
    }
  )

  // ---------------------------------------------------------------------
  // Deduplication (graft.ext.Dedup)
  // ---------------------------------------------------------------------

  val dedup: Seq[Probe] = Seq(

    Probe(
      "dedup_exact",
      "SELECT sha256(text) AS content_key, min(doc_id) AS keep_id, count(*) AS dup_cnt FROM documents GROUP BY 1 ORDER BY keep_id"
    ) { (s, d) =>
      Dedup.exactGroups(t(s, d, "documents"), sha2(col("text"), 256), col("doc_id"))
        .orderBy("keep_id")
    },

    Probe(
      "dedup_exact_normalized",
      "SELECT min(doc_id) AS keep_id, count(*) AS dup_cnt FROM (SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm FROM documents) GROUP BY norm ORDER BY keep_id"
    ) { (s, d) =>
      Dedup.exactGroups(t(s, d, "documents"),
          TA.normalize(col("text")), col("doc_id"))
        .select("keep_id", "dup_cnt").orderBy("keep_id")
    },

    Probe(
      "dedup_ngram_jaccard",
      "WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS ts FROM documents), sh AS (SELECT DISTINCT doc_id, source, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s FROM tok, UNNEST(generate_series(1, len(ts) - 2)) AS g(i)), cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter FROM sh a JOIN sh b ON a.source = b.source AND a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2) SELECT id_a, id_b, round(inter * 1.0 / (ca.n + cb.n - inter), 4) AS jac FROM p JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id WHERE round(inter * 1.0 / (ca.n + cb.n - inter), 4) >= 0.5 ORDER BY id_a, id_b"
    ) { (s, d) =>
      Dedup.ngramJaccardPairs(t(s, d, "documents"), "doc_id", "text", "source", 0.5)
        .orderBy("id_a", "id_b")
    },

    // [EXT] directional containment (r16): the asymmetric dedup class —
    // a short document quoted whole inside a long page has near-zero
    // Jaccard but containment 1.0. Oracle replays the exact distinct-
    // shingle sets and BOTH normalizations.
    Probe(
      "dedup_ngram_containment",
      "WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS ts FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, source, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s FROM tok, UNNEST(generate_series(1, len(ts) - 2)) AS g(i)), " +
        "cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), " +
        "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter FROM sh a JOIN sh b ON a.source = b.source AND a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
        "SELECT id_a, id_b, round(inter * 1.0 / ca.n, 4) AS cont_a_in_b, round(inter * 1.0 / cb.n, 4) AS cont_b_in_a " +
        "FROM p JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id " +
        "WHERE GREATEST(round(inter * 1.0 / ca.n, 4), round(inter * 1.0 / cb.n, 4)) >= 0.8 ORDER BY id_a, id_b"
    ) { (s, d) =>
      Dedup.ngramContainmentPairs(t(s, d, "documents"), "doc_id", "text",
        "source", 0.8)
        .orderBy("id_a", "id_b")
    },

    // [EXT] prefix-filtered containment (r17): the SAME naive oracle at
    // the SAME threshold — the asymmetric prefix bound (smaller side's
    // first n-ceil(t*n)+1 shingles in DF order, probed against full
    // postings) must change nothing but the candidate count.
    Probe(
      "dedup_ngram_containment_prefix",
      "WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS ts FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, source, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s FROM tok, UNNEST(generate_series(1, len(ts) - 2)) AS g(i)), " +
        "cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), " +
        "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter FROM sh a JOIN sh b ON a.source = b.source AND a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
        "SELECT id_a, id_b, round(inter * 1.0 / ca.n, 4) AS cont_a_in_b, round(inter * 1.0 / cb.n, 4) AS cont_b_in_a " +
        "FROM p JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id " +
        "WHERE GREATEST(round(inter * 1.0 / ca.n, 4), round(inter * 1.0 / cb.n, 4)) >= 0.8 ORDER BY id_a, id_b"
    ) { (s, d) =>
      Dedup.ngramContainmentPairsPrefix(t(s, d, "documents"), "doc_id",
        "text", "source", 0.8)
        .orderBy("id_a", "id_b")
    },

    // MinHash+LSH is exact-VERIFIED (candidates are re-checked with exact
    // Jaccard), so its output is oracle-able as the exact all-pairs SQL:
    // with 8 bands of 4 rows at threshold 0.5, a true pair at similarity s
    // is missed with probability (1-s^4)^8 — the corpus's near-dups all
    // sit at s >= 0.9 (miss odds ~2e-4), so LSH recall is 1.0 here and the
    // exact pair set IS the expected output. DedupSpec asserts the recall
    // relationship independently of this data.
    Probe(
      "dedup_minhash_lsh",
      "WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents), sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s FROM tok, UNNEST(generate_series(1, len(ts) - 2)) AS g(i)), cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2) SELECT id_a, id_b, round(inter * 1.0 / (ca.n + cb.n - inter), 4) AS jac FROM p JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id WHERE round(inter * 1.0 / (ca.n + cb.n - inter), 4) >= 0.5 ORDER BY id_a, id_b"
    ) { (s, d) =>
      Dedup.minhashNearDupPairs(t(s, d, "documents"), "doc_id", "text",
        k = 32, bands = 8, threshold = 0.5)
        .orderBy("id_a", "id_b")
    },

    // Substring-level dedup (Lee et al. 2022): maximal spans of 8-grams
    // each shared by >= 2 documents — catches boilerplate that doc-level
    // MinHash misses. The oracle rebuilds postings, document frequency,
    // and the islands-based span merge from scratch.
    Probe(
      "dedup_repeated_spans",
      "WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL), g AS (SELECT doc_id, u.i - 1 AS pos, array_to_string(list_slice(ts, u.i, u.i + 7), ' ') AS gram FROM tok, UNNEST(generate_series(1, len(ts) - 7)) AS u(i)), q AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2), h AS (SELECT doc_id, pos FROM g JOIN q USING (gram)), i AS (SELECT doc_id, pos, CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) >= 8 THEN 1 ELSE 0 END AS brk FROM h), j AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM i) SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start, CAST(max(pos) + 8 AS BIGINT) AS span_end FROM j GROUP BY doc_id, grp ORDER BY doc_id, span_start"
    ) { (s, d) =>
      Dedup.repeatedNgramSpans(t(s, d, "documents"), "doc_id", "text",
        n = 8, minDocFreq = 2)
        .orderBy("doc_id", "span_start")
    },

    // SimHash pairs are a pure function of the md5-derived 60-bit token
    // hash (Dedup.md5Hash60), which any SQL engine reproduces — the oracle
    // recomputes signature, banding, and Hamming filter from scratch.
    Probe(
      "dedup_simhash",
      "WITH th AS (SELECT doc_id, list_transform(string_split(text, ' '), t -> CAST('0x' || substring(md5(t), 1, 15) AS BIGINT)) AS hs FROM documents), sh AS (SELECT doc_id, CAST(list_sum([CASE WHEN list_sum([CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END for h in hs]) > 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END for j in range(0, 60)]) AS BIGINT) AS sim FROM th), banded AS (SELECT doc_id, sim, u.b, (sim >> (u.b*15)) & 32767 AS chunk FROM sh, UNNEST([0,1,2,3]) AS u(b)), pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming FROM banded a JOIN banded b ON a.b = b.b AND a.chunk = b.chunk AND a.doc_id < b.doc_id) SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3 ORDER BY id_a, id_b"
    ) { (s, d) =>
      Dedup.simhashNearDupPairs(t(s, d, "documents"), "doc_id", "text",
        maxHamming = 3)
        .orderBy("id_a", "id_b")
    },

    // [EXT] streaming stateful near-dup (r16): the documents corpus fed
    // as three KEY-DISJOINT micro-batches through a REAL checkpointed
    // file-source stream into the state-store band index
    // (StreamingDedup) — each arrival compares only against its four
    // (band, chunk) buckets, never the corpus. The emitted pair SET is
    // interleaving-independent (a pair appears when its later member
    // arrives, whatever batch that is), so the oracle is the SAME
    // closed-form signature + banding + Hamming replay as the batch
    // dedup_simhash probe — the streaming path must land exactly the
    // batch answer.
    Probe(
      "stream_neardup_pairs",
      "WITH th AS (SELECT doc_id, list_transform(string_split(text, ' '), t -> CAST('0x' || substring(md5(t), 1, 15) AS BIGINT)) AS hs FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL), sh AS (SELECT doc_id, CAST(list_sum([CASE WHEN list_sum([CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END for h in hs]) > 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END for j in range(0, 60)]) AS BIGINT) AS sim FROM th), banded AS (SELECT doc_id, sim, u.b, (sim >> (u.b*15)) & 32767 AS chunk FROM sh, UNNEST([0,1,2,3]) AS u(b)), pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming FROM banded a JOIN banded b ON a.b = b.b AND a.chunk = b.chunk AND a.doc_id < b.doc_id) SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3 ORDER BY id_a, id_b"
    ) { (s, d) =>
      val root = Probe.scratchDir("graft-stream-neardup-probe")
      val src = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), col("text"))
      val feedDir = s"$root/feed"
      PhaseTimer.timed("stream_neardup_pairs", "feed_write") {
        (0 until 3).foreach(b => src.filter(col("doc_id") % 3 === b)
          .coalesce(1).write.mode("append").parquet(feedDir))
      }
      PhaseTimer.timed("stream_neardup_pairs", "stream_detect") {
        val feed = s.readStream
          .schema(org.apache.spark.sql.types.StructType.fromDDL(
            "doc_id BIGINT, text STRING"))
          .option("maxFilesPerTrigger", "1")
          .parquet(feedDir)
        val q = graft.streaming.StreamingDedup.simhashNearDupStream(feed,
          col("doc_id"), col("text"), maxHamming = 3,
          path = s"$root/out", checkpointDir = s"$root/ckpt",
          trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
        q.awaitTermination()
      }
      // per-band duplicate emissions collapse here (the documented
      // reader-side DISTINCT); explicit schema so zero-pair corpora
      // still read
      s.read.schema(org.apache.spark.sql.types.StructType.fromDDL(
          "id_a BIGINT, id_b BIGINT, hamming BIGINT"))
        .parquet(s"$root/out")
        .distinct()
        .orderBy("id_a", "id_b")
    },

    // [EXT] streaming dedup RESTART (r17): the crash-resume path an
    // always-on deduper actually exercises — the feed splits across TWO
    // SEPARATE simhashNearDupStream invocations sharing one checkpoint
    // (stop after the first half, resume with new files). The resumed
    // query must pick up the band-index state, pair the second half
    // against the FULL history, and re-emit NOTHING from the first half
    // (asserted on the raw pre-DISTINCT feed: first-half-only emission
    // count is unchanged by the resume). Same batch oracle — the union
    // of both runs must land exactly the whole-corpus answer.
    Probe(
      "stream_neardup_restart",
      "WITH th AS (SELECT doc_id, list_transform(string_split(text, ' '), t -> CAST('0x' || substring(md5(t), 1, 15) AS BIGINT)) AS hs FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL), sh AS (SELECT doc_id, CAST(list_sum([CASE WHEN list_sum([CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END for h in hs]) > 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END for j in range(0, 60)]) AS BIGINT) AS sim FROM th), banded AS (SELECT doc_id, sim, u.b, (sim >> (u.b*15)) & 32767 AS chunk FROM sh, UNNEST([0,1,2,3]) AS u(b)), pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming FROM banded a JOIN banded b ON a.b = b.b AND a.chunk = b.chunk AND a.doc_id < b.doc_id) SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3 ORDER BY id_a, id_b"
    ) { (s, d) =>
      val root = Probe.scratchDir("graft-stream-neardup-restart")
      val src = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), col("text"))
      val feedDir = s"$root/feed"
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "id_a BIGINT, id_b BIGINT, hamming BIGINT")
      def runOnce(): Unit = {
        val feed = s.readStream
          .schema(org.apache.spark.sql.types.StructType.fromDDL(
            "doc_id BIGINT, text STRING"))
          .option("maxFilesPerTrigger", "1")
          .parquet(feedDir)
        val q = graft.streaming.StreamingDedup.simhashNearDupStream(feed,
          col("doc_id"), col("text"), maxHamming = 3,
          path = s"$root/out", checkpointDir = s"$root/ckpt",
          trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
        q.awaitTermination()
      }
      PhaseTimer.timed("stream_neardup_restart", "first_run") {
        src.filter(col("doc_id") % 2 === 0)
          .coalesce(1).write.mode("append").parquet(feedDir)
        runOnce()
      }
      // raw (pre-DISTINCT) emissions whose BOTH members are first-half
      // docs: the resumed run must add zero of these
      def firstHalfEmissions(): Long =
        s.read.schema(schema).parquet(s"$root/out")
          .filter(col("id_a") % 2 === 0 && col("id_b") % 2 === 0).count()
      val afterFirst = firstHalfEmissions()
      PhaseTimer.timed("stream_neardup_restart", "resume_run") {
        src.filter(col("doc_id") % 2 === 1)
          .coalesce(1).write.mode("append").parquet(feedDir)
        runOnce()
      }
      assert(firstHalfEmissions() == afterFirst,
        "resumed invocation re-emitted first-half pairs — checkpointed " +
          "band-index state was not reused")
      s.read.schema(schema).parquet(s"$root/out")
        .distinct()
        .orderBy("id_a", "id_b")
    },

    // [EXT] streaming dedup BOOTSTRAP (r18): the 100 TB migration path —
    // half the corpus is an EXISTING archive whose banded signatures
    // seed a fresh checkpoint's state as a BATCH frame
    // (StatefulProcessorWithInitialState); only the other half ever
    // rides the stream. The union of the seed half's own batch dedup
    // (run once at migration) with the stream's emissions must equal
    // the whole-corpus batch answer — the same closed-form oracle as
    // stream_neardup_pairs — and the stream must emit no seed-internal
    // pair (they were known before the stream existed).
    Probe(
      "stream_neardup_bootstrap",
      "WITH th AS (SELECT doc_id, list_transform(string_split(text, ' '), t -> CAST('0x' || substring(md5(t), 1, 15) AS BIGINT)) AS hs FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL), sh AS (SELECT doc_id, CAST(list_sum([CASE WHEN list_sum([CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END for h in hs]) > 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END for j in range(0, 60)]) AS BIGINT) AS sim FROM th), banded AS (SELECT doc_id, sim, u.b, (sim >> (u.b*15)) & 32767 AS chunk FROM sh, UNNEST([0,1,2,3]) AS u(b)), pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming FROM banded a JOIN banded b ON a.b = b.b AND a.chunk = b.chunk AND a.doc_id < b.doc_id) SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3 ORDER BY id_a, id_b"
    ) { (s, d) =>
      val root = Probe.scratchDir("graft-stream-neardup-boot")
      val src = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), col("text"))
      val seedDocs = src.filter(col("doc_id") % 2 === 0)
      val streamDocs = src.filter(col("doc_id") % 2 === 1)
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "id_a BIGINT, id_b BIGINT, hamming BIGINT")
      // migration step 1: batch-dedup the existing corpus (its internal
      // pairs are the batch path's answer, not the stream's)
      val seedPairs = PhaseTimer.timed("stream_neardup_bootstrap", "seed_batch") {
        Dedup.simhashNearDupPairs(seedDocs, "doc_id", "text", maxHamming = 3)
          .localCheckpoint()
      }
      // migration step 2: seed the detector's state from the archive's
      // banded signatures — one distributed write, zero feed replay
      PhaseTimer.timed("stream_neardup_bootstrap", "feed_write") {
        streamDocs.coalesce(1).write.mode("append").parquet(s"$root/feed")
      }
      PhaseTimer.timed("stream_neardup_bootstrap", "stream_detect") {
        val feed = s.readStream
          .schema(org.apache.spark.sql.types.StructType.fromDDL(
            "doc_id BIGINT, text STRING"))
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$root/feed")
        val q = graft.streaming.StreamingDedup.simhashNearDupStream(feed,
          col("doc_id"), col("text"), maxHamming = 3,
          path = s"$root/out", checkpointDir = s"$root/ckpt",
          trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
          initialEntries = Some(graft.streaming.StreamingDedup.seedEntries(
            seedDocs, col("doc_id"), col("text"),
            seedTs = 1700000000000L)))
        q.awaitTermination()
      }
      val streamed = s.read.schema(schema).parquet(s"$root/out").distinct()
      assert(streamed
        .filter(col("id_a") % 2 === 0 && col("id_b") % 2 === 0).isEmpty,
        "stream must not emit seed-internal pairs — state was seeded, " +
          "not replayed")
      streamed.unionAll(seedPairs).distinct()
        .orderBy("id_a", "id_b")
    },

    Probe(
      "dedup_cosine_neardup",
      "WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings) SELECT a.vec_id AS id_a, b.vec_id AS id_b, round(list_cosine_similarity(a.v, b.v), 4) AS cos FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.3 ORDER BY id_a, id_b"
    ) { (s, d) =>
      Dedup.cosineNearDupPairs(t(s, d, "embeddings"), "vec_id", "embedding",
        "label", 0.3)
        .repartition(1).sortWithinPartitions("id_a", "id_b")
    }
  )

  // ---------------------------------------------------------------------
  // Similarity search (graft.ext.Similarity)
  // ---------------------------------------------------------------------

  val similarity: Seq[Probe] = Seq(

    Probe(
      "sim_topk_bruteforce",
      "WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings) SELECT vec_id, round(list_cosine_similarity(v, (SELECT v FROM e WHERE vec_id = 0)), 6) AS cos FROM e WHERE vec_id <> 0 ORDER BY cos DESC, vec_id LIMIT 10"
    ) { (s, d) =>
      Similarity.bruteForceTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        queryId = 0L, k = 10)
    },

    // Batch exact top-k: 5 query vectors answered in ONE corpus scan
    // (broadcast queries, codegen cosine, per-query bounded top-k
    // aggregate) — the recall-evaluation / batch-serving shape. The
    // oracle replays the full Q x N scoring and per-query ranking.
    Probe(
      "sim_topk_batch",
      "WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5), " +
        "p AS (SELECT q.query_id, e.vec_id AS id, round(list_cosine_similarity(e.v, q.qv), 6) AS cos FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id) " +
        "SELECT query_id, id, cos FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) AS rn FROM p) t WHERE rn <= 10 " +
        "ORDER BY query_id, cos DESC, id"
    ) { (s, d) =>
      val emb = t(s, d, "embeddings")
      Similarity.bruteForceTopKBatch(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
        .orderBy(col("query_id"), col("cos").desc, col("id"))
    },

    // [EXT] hard-negative mining (r16): each anchor's top-k most-similar
    // vectors with a DIFFERENT label — the contrastive-training negatives
    // a reranker/embedding objective consumes. One corpus scan, broadcast
    // anchors, label exclusion pushed BEFORE scoring, map-side-truncated
    // top-k. Oracle replays the full labeled Q x N scoring.
    Probe(
      "sim_hard_negatives",
      "WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv FROM e WHERE vec_id < 5), " +
        "p AS (SELECT q.query_id, e.vec_id AS id, round(list_cosine_similarity(e.v, q.qv), 6) AS cos FROM e CROSS JOIN q WHERE e.label <> q.qlabel) " +
        "SELECT query_id, id, cos FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) AS rn FROM p) t WHERE rn <= 8 " +
        "ORDER BY query_id, cos DESC, id"
    ) { (s, d) =>
      val emb = t(s, d, "embeddings")
      Similarity.hardNegativesBatch(emb, "vec_id", "embedding", "label",
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", "label", k = 8)
        .orderBy(col("query_id"), col("cos").desc, col("id"))
    },

    // LSH-bucketed ANN, fully oracled: the md5-derived hyperplanes make
    // the ENTIRE pipeline engine-independent, so the oracle re-derives the
    // 32 planes, every element-ordered projection, the 32-bit signatures,
    // the Hamming-radius candidate set, and the exact cosine re-rank from
    // scratch. (Before round 4 the planes came from Spark's xxhash64 and
    // this probe was rows-only.)
    Probe(
      "sim_topk_lsh",
      s"WITH ${Probe.rhpSigSql(32, "sig")}, " +
        "q AS (SELECT s.sig AS qsig, e.v AS qv FROM sig s JOIN e ON e.vec_id = s.vec_id WHERE s.vec_id = 0), " +
        "cand AS (SELECT e.vec_id, e.v FROM e JOIN sig ON e.vec_id = sig.vec_id CROSS JOIN q WHERE e.vec_id <> 0 AND bit_count(xor(sig.sig, q.qsig)) <= 14) " +
        "SELECT cand.vec_id, round(list_cosine_similarity(cand.v, q.qv), 6) AS cos FROM cand CROSS JOIN q ORDER BY cos DESC, vec_id LIMIT 10"
    ) { (s, d) =>
      Similarity.lshTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        queryId = 0L, k = 10)
    },

    // k-NN similarity JOIN (top-k for every vector, blocked by label).
    Probe(
      "sim_knn_join",
      "WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, round(list_cosine_similarity(a.v, b.v), 6) AS cos FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id) SELECT id_a, id_b, cos FROM (SELECT *, row_number() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS rn FROM p) t WHERE rn <= 3 ORDER BY id_a, cos DESC, id_b"
    ) { (s, d) =>
      Similarity.knnJoin(t(s, d, "embeddings"), "vec_id", "embedding", "label", 3)
        .orderBy(col("id_a"), col("cos").desc, col("id_b"))
    },

    // k-NN JOIN blocked by DERIVED LSH cells — the corpus-scale path the
    // label-blocked probe only gestures at: no application blocking key
    // exists at 100 TB, so the engine derives the block from the vector
    // itself (4-bit RHP cell) and runs the same bounded pair space. The
    // oracle re-derives every cell from the md5 hyperplanes and replays
    // the join, so blocking + scoring + ranking are all checked.
    Probe(
      "sim_knn_join_cells",
      s"WITH ${Probe.rhpSigSql(4, "cell")}, " +
        "p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, round(list_cosine_similarity(ea.v, eb.v), 6) AS cos " +
        "FROM cell a JOIN cell b ON a.cell = b.cell AND a.vec_id <> b.vec_id " +
        "JOIN e ea ON ea.vec_id = a.vec_id JOIN e eb ON eb.vec_id = b.vec_id) " +
        "SELECT id_a, id_b, cos FROM (SELECT *, row_number() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS rn FROM p) t WHERE rn <= 3 " +
        "ORDER BY id_a, cos DESC, id_b"
    ) { (s, d) =>
      Similarity.knnJoinByCell(t(s, d, "embeddings"), "vec_id", "embedding",
          k = 3, cellBits = 4)
        .orderBy(col("id_a"), col("cos").desc, col("id_b"))
    }
  )

  // ---------------------------------------------------------------------
  // Duplicate clusters (connected components over near-dup pairs)
  // ---------------------------------------------------------------------

  val clusters: Seq[Probe] = Seq(
    Probe(
      "dedup_duplicate_clusters",
      "WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents), sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s FROM tok, UNNEST(generate_series(1, len(ts) - 2)) AS g(i)), cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2), edges AS (SELECT id_a, id_b FROM p JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id WHERE round(inter * 1.0 / (ca.n + cb.n - inter), 4) >= 0.5), sym AS (SELECT id_a AS x, id_b AS y FROM edges UNION SELECT id_b, id_a FROM edges), reach(x, y) AS (SELECT x, y FROM sym UNION SELECT r.x, s.y FROM reach r JOIN sym s ON r.y = s.x) SELECT x AS doc_id, least(x, min(y)) AS cluster_rep FROM reach GROUP BY x ORDER BY doc_id"
    ) { (s, d) =>
      // global (unblocked) exact near-dup edges, then connected components
      val edges = Dedup.ngramJaccardPairs(
        t(s, d, "documents").withColumn("blk", lit(1)), "doc_id", "text", "blk", 0.5)
      Dedup.duplicateClusters(edges).repartition(1).sortWithinPartitions("doc_id")
    }
  )

  def all: Seq[Probe] =
    streamingWindows ++ textAnalysis ++ dedup ++ clusters ++ similarity
}
