package graft.probes

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, HtmlText, TextClean, Warc, WarcIndex}

/** [EXT] Round-20 crawl probes: REAL-crawl record semantics over the
  * CDX index layer — revisit resolution (how a deduplicated crawl
  * ships), redirect-chain resolution, the sitemap-vs-captured frontier
  * diff, and Unicode cleanup composed ahead of dedup in the curation
  * pipeline.
  *
  * Same determinism discipline as every probe pack: fixed fixture
  * instants, ascending-id record layout inside each shard, BIGINT
  * casts on integer-derived columns, total ORDER BY both sides.
  */
object CrawlProbes {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val docFilter = "doc_id IS NOT NULL AND text IS NOT NULL"

  val all: Seq[Probe] = Seq(

    // Revisit resolution (r20, WarcIndex.resolveRevisits): the
    // deduplicated-crawl shape Common Crawl actually ships — originals
    // (doc_id%3==0) carry the payload + a declared WARC-Payload-Digest;
    // revisits (doc_id%3==1) of doc_id-1 carry the SAME declared digest
    // and no body; doc_id%3==2 are dangling revisits whose digest
    // matches nothing. resolveRevisits + hydrateObservations must keep
    // every URL observation, fetch each original's bytes through the
    // revisit's member pointer, and null-out the dangling rows — the
    // oracle re-derives all three families closed-form (the revisit's
    // text is its ORIGINAL's text, via a doc_id-1 self-join).
    Probe(
      "warc_revisit_resolve",
      s"WITH d AS (SELECT doc_id, text FROM documents WHERE $docFilter) " +
        "SELECT url, via_revisit, text FROM (" +
        "SELECT 'https://rv' || CAST(doc_id % 4 AS VARCHAR) || '.example.com/orig/' || CAST(doc_id AS VARCHAR) AS url, FALSE AS via_revisit, text FROM d WHERE doc_id % 3 = 0 " +
        "UNION ALL " +
        "SELECT 'https://rv' || CAST(d.doc_id % 4 AS VARCHAR) || '.example.com/re/' || CAST(d.doc_id AS VARCHAR), TRUE, d1.text FROM d JOIN d d1 ON d1.doc_id = d.doc_id - 1 WHERE d.doc_id % 3 = 1 " +
        "UNION ALL " +
        "SELECT 'https://rv' || CAST(doc_id % 4 AS VARCHAR) || '.example.com/dang/' || CAST(doc_id AS VARCHAR), TRUE, NULL FROM d WHERE doc_id % 3 = 2" +
        ") ORDER BY url"
    ) { (s, d) =>
      import s.implicits._
      val index = PhaseTimer.timed("warc_revisit_resolve", "fixture_ensure") {
        cdxIndexFor(s, d, "warc-revisit-cdx", revisitFixture(s, d))
      }
      val obs = WarcIndex.resolveRevisits(index)
      val hydrated = WarcIndex.hydrateObservations(obs)
      val stripped = hydrated
        .select(col("url"), col("via_revisit"), col("body"))
        .as[(String, Boolean, Array[Byte])]
        .map { case (u, v, raw) =>
          if (raw == null) (u, v, null: Array[Byte], null: String)
          else {
            val (payload, cs) = Warc.httpBodyAndCharset(raw)
            (u, v, payload, cs)
          }
        }
        .toDF("url", "via_revisit", "payload", "charset")
      stripped
        .select(col("url"), col("via_revisit"),
          when(col("payload").isNotNull,
            HtmlText.htmlTextBytes(col("payload"), col("charset")))
            .as("text"))
        .repartition(1).sortWithinPartitions("url")
    },

    // Redirect-chain resolution (r20, WarcIndex.resolveRedirects):
    // every doc gets a 2-hop chain (/start 301-relative-> /mid
    // 302-absolute-> /final 200), docs%5==0 add a self-cycle and
    // docs%5==1 a dangling 301 — the oracle states the full
    // (request_url, final_url, hops, final_status) table closed-form:
    // green means Location indexing, RFC 3986 resolution of the
    // relative hop, canonical-URL matching, the cycle guard, and the
    // dangling policy all agreed.
    Probe(
      "warc_redirect_resolve",
      "WITH d AS (SELECT doc_id, CAST(doc_id % 4 AS VARCHAR) AS g FROM documents WHERE doc_id IS NOT NULL) " +
        "SELECT request_url, final_url, hops, final_status FROM (" +
        "SELECT 'https://rd' || g || '.example.com/start/' || CAST(doc_id AS VARCHAR) AS request_url, 'https://rd' || g || '.example.com/final/' || CAST(doc_id AS VARCHAR) AS final_url, CAST(2 AS BIGINT) AS hops, CAST(200 AS INTEGER) AS final_status FROM d " +
        "UNION ALL " +
        "SELECT 'https://rd' || g || '.example.com/mid/' || CAST(doc_id AS VARCHAR), 'https://rd' || g || '.example.com/final/' || CAST(doc_id AS VARCHAR), CAST(1 AS BIGINT), CAST(200 AS INTEGER) FROM d " +
        "UNION ALL " +
        "SELECT 'https://rd' || g || '.example.com/final/' || CAST(doc_id AS VARCHAR), 'https://rd' || g || '.example.com/final/' || CAST(doc_id AS VARCHAR), CAST(0 AS BIGINT), CAST(200 AS INTEGER) FROM d " +
        "UNION ALL " +
        "SELECT 'https://rd' || g || '.example.com/loop/' || CAST(doc_id AS VARCHAR), 'https://rd' || g || '.example.com/loop/' || CAST(doc_id AS VARCHAR), CAST(0 AS BIGINT), CAST(301 AS INTEGER) FROM d WHERE doc_id % 5 = 0 " +
        "UNION ALL " +
        "SELECT 'https://rd' || g || '.example.com/gone/' || CAST(doc_id AS VARCHAR), 'https://rd' || g || '.example.com/nowhere/' || CAST(doc_id AS VARCHAR), CAST(1 AS BIGINT), CAST(NULL AS INTEGER) FROM d WHERE doc_id % 5 = 1" +
        ") ORDER BY request_url"
    ) { (s, d) =>
      val index = PhaseTimer.timed("warc_redirect_resolve", "fixture_ensure") {
        cdxIndexFor(s, d, "warc-redirect-cdx", redirectFixture(s, d))
      }
      WarcIndex.resolveRedirects(index, maxHops = 4)
        .select(col("request_url"), col("final_url"),
          col("hops").cast("long").as("hops"),
          col("final_status").cast("int").as("final_status"))
        .repartition(1).sortWithinPartitions("request_url")
    },

    // Frontier diff (r20, WarcIndex.frontierDiff): the discovery side
    // (sitemap urlset entries, parsed through the real Sitemaps path)
    // against the capture side (the redirect fixture's CDX index) —
    // docs%3==0 declare an already-captured URL with an older lastmod
    // (current: DROPS), %3==1 a captured URL whose lastmod postdates
    // the capture (stale), %3==2 a never-captured URL (uncaptured).
    Probe(
      "crawl_frontier_diff",
      "WITH d AS (SELECT doc_id, CAST(doc_id % 4 AS VARCHAR) AS g FROM documents WHERE doc_id IS NOT NULL) " +
        "SELECT loc, lastmod, last_capture, reason FROM (" +
        "SELECT 'https://rd' || g || '.example.com/start/' || CAST(doc_id AS VARCHAR) AS loc, '2026-01-02' AS lastmod, '2000-01-01T00:00:00Z' AS last_capture, 'stale' AS reason FROM d WHERE doc_id % 3 = 1 " +
        "UNION ALL " +
        "SELECT 'https://rd' || g || '.example.com/new/' || CAST(doc_id AS VARCHAR), NULL, NULL, 'uncaptured' FROM d WHERE doc_id % 3 = 2" +
        ") ORDER BY loc"
    ) { (s, d) =>
      val index = PhaseTimer.timed("crawl_frontier_diff", "fixture_ensure") {
        cdxIndexFor(s, d, "warc-redirect-cdx", redirectFixture(s, d))
      }
      val g = pmod(col("doc_id"), lit(4)).cast("string")
      val id = col("doc_id").cast("string")
      val v = pmod(col("doc_id"), lit(3))
      val loc = when(v === 0,
        concat(lit("https://rd"), g, lit(".example.com/final/"), id))
        .when(v === 1,
          concat(lit("https://rd"), g, lit(".example.com/start/"), id))
        .otherwise(
          concat(lit("https://rd"), g, lit(".example.com/new/"), id))
      val lastmod = when(v === 0, lit("1999-12-31"))
        .when(v === 1, lit("2026-01-02"))
      val xml = concat(lit("<urlset><url><loc>"), loc, lit("</loc>"),
        when(lastmod.isNotNull,
          concat(lit("<lastmod>"), lastmod, lit("</lastmod>")))
          .otherwise(lit("")),
        lit("</url></urlset>"))
      val entries = graft.ext.Sitemaps.explodeEntries(
        t(s, d, "documents").filter(col("doc_id").isNotNull)
          .select(col("doc_id"), xml.as("xml")), "xml")
      WarcIndex.frontierDiff(entries, index)
        .select("loc", "lastmod", "last_capture", "reason")
        .orderBy("loc")
    },

    // Redirect-aware curation (r20): the fetch->dedup step a real crawl
    // needs — every requested URL credits the content at its chain's
    // END, the 3xx hops collapse onto their final 200 capture, and the
    // final document's bytes are fetched ONCE however many request URLs
    // land on it. Composes resolveRedirects + the index fetch path; the
    // oracle states (final_url, text, n_requests=3: start+mid+final)
    // closed-form — the loop/dangling rows must NOT survive (no 200 at
    // their chain end).
    Probe(
      "crawl_redirect_curate",
      "WITH d AS (SELECT doc_id, CAST(doc_id % 4 AS VARCHAR) AS g FROM documents WHERE doc_id IS NOT NULL) " +
        "SELECT 'https://rd' || g || '.example.com/final/' || CAST(doc_id AS VARCHAR) AS final_url, " +
        "'landed ' || CAST(doc_id AS VARCHAR) AS text, CAST(3 AS BIGINT) AS n_requests " +
        "FROM d ORDER BY final_url"
    ) { (s, d) =>
      val index = PhaseTimer.timed("crawl_redirect_curate", "fixture_ensure") {
        cdxIndexFor(s, d, "warc-redirect-cdx", redirectFixture(s, d))
      }
      val resolved = WarcIndex.resolveRedirects(index, maxHops = 4)
      val byFinal = resolved.filter(col("final_status") === 200)
        .groupBy("final_url")
        .agg(count(lit(1)).cast("long").as("n_requests"))
      // hydrate the 200-captures once and INNER-join the walk result a
      // single time — referencing byFinal twice (member pre-filter +
      // final join) would execute the whole redirect walk twice
      val fetched = WarcIndex.fetchResponses(index
        .filter(lower(col("warc_type")) === "response" &&
          col("status") === 200))
      fetched.join(byFinal, col("url") === col("final_url"))
        .select(col("final_url"),
          HtmlText.htmlTextBytes(col("body"), col("charset")).as("text"),
          col("n_requests"))
        .repartition(1).sortWithinPartitions("final_url")
    },

    // Composed discovery pipeline (r20): robots.txt advertises the
    // sitemap (Sitemaps.discoverFromRobots), the advertised XML parses
    // through the real sitemap path, and the declared entries diff
    // against the captured index — robots -> discovery -> parse ->
    // frontier as ONE declarative plan. Same closed-form expectation as
    // crawl_frontier_diff: a green row proves the discovery JOINS
    // (robots line lexing, per-host sitemap URL, XML aggregation)
    // composed without losing or duplicating a declared URL.
    Probe(
      "crawl_discovery_pipeline",
      "WITH d AS (SELECT doc_id, CAST(doc_id % 4 AS VARCHAR) AS g FROM documents WHERE doc_id IS NOT NULL) " +
        "SELECT loc, lastmod, last_capture, reason FROM (" +
        "SELECT 'https://rd' || g || '.example.com/start/' || CAST(doc_id AS VARCHAR) AS loc, '2026-01-02' AS lastmod, '2000-01-01T00:00:00Z' AS last_capture, 'stale' AS reason FROM d WHERE doc_id % 3 = 1 " +
        "UNION ALL " +
        "SELECT 'https://rd' || g || '.example.com/new/' || CAST(doc_id AS VARCHAR), NULL, NULL, 'uncaptured' FROM d WHERE doc_id % 3 = 2" +
        ") ORDER BY loc"
    ) { (s, d) =>
      val index = PhaseTimer.timed("crawl_discovery_pipeline", "fixture_ensure") {
        cdxIndexFor(s, d, "warc-redirect-cdx", redirectFixture(s, d))
      }
      val g = pmod(col("doc_id"), lit(4)).cast("string")
      val id = col("doc_id").cast("string")
      val v = pmod(col("doc_id"), lit(3))
      val loc = when(v === 0,
        concat(lit("https://rd"), g, lit(".example.com/final/"), id))
        .when(v === 1,
          concat(lit("https://rd"), g, lit(".example.com/start/"), id))
        .otherwise(
          concat(lit("https://rd"), g, lit(".example.com/new/"), id))
      val lastmod = when(v === 0, lit("1999-12-31"))
        .when(v === 1, lit("2026-01-02"))
      val block = concat(lit("<url><loc>"), loc, lit("</loc>"),
        when(lastmod.isNotNull,
          concat(lit("<lastmod>"), lastmod, lit("</lastmod>")))
          .otherwise(lit("")),
        lit("</url>"))
      // one sitemap document per host, entries in ascending doc_id
      val sitemaps = t(s, d, "documents").filter(col("doc_id").isNotNull)
        .select(g.as("g"), col("doc_id"), block.as("block"))
        .groupBy("g")
        .agg(concat(lit("<urlset>"),
          array_join(transform(
            sort_array(collect_list(struct(col("doc_id"), col("block")))),
            e => e.getField("block")), ""),
          lit("</urlset>")).as("xml"))
        .select(concat(lit("https://rd"), col("g"),
          lit(".example.com/sitemap.xml")).as("sitemap_url"), col("xml"))
      // robots advertise each host's sitemap; discovery joins them up
      val robots = t(s, d, "documents").filter(col("doc_id").isNotNull)
        .select(g.as("g")).distinct()
        .select(concat(lit("rd"), col("g"), lit(".example.com")).as("host"),
          concat(lit("User-agent: *\nDisallow:\n\nSitemap: https://rd"),
            col("g"), lit(".example.com/sitemap.xml\n")).as("robots_txt"))
      val discovered = graft.ext.Sitemaps.discoverFromRobots(robots)
        .join(sitemaps, "sitemap_url")
      val entries = graft.ext.Sitemaps.explodeEntries(
        discovered.select("host", "xml"), "xml")
        .filter(col("kind") === "url")
        .select(col("loc"), col("lastmod"))
      WarcIndex.frontierDiff(entries, index)
        .select("loc", "lastmod", "last_capture", "reason")
        .orderBy("loc")
    },

    // Per-host crawl operations stats off the CDX index (r20): the
    // summary a crawl operator reads before scheduling — captures,
    // 2xx, and 3xx counts per host, derived WITHOUT touching a shard
    // byte (index rows only; one hash aggregate). The oracle re-derives
    // every host's counts from the redirect fixture's construction:
    // 3 chain records per doc plus the %5-family loop/dangling rows.
    Probe(
      "crawl_host_stats",
      "WITH d AS (SELECT doc_id, doc_id % 4 AS g FROM documents WHERE doc_id IS NOT NULL) " +
        "SELECT 'rd' || CAST(g AS VARCHAR) || '.example.com' AS host, " +
        "CAST(3 * count(*) + sum(CASE WHEN doc_id % 5 IN (0, 1) THEN 1 ELSE 0 END) AS BIGINT) AS n_captures, " +
        "CAST(count(*) AS BIGINT) AS n_ok, " +
        "CAST(2 * count(*) + sum(CASE WHEN doc_id % 5 IN (0, 1) THEN 1 ELSE 0 END) AS BIGINT) AS n_redirects " +
        "FROM d GROUP BY g ORDER BY host"
    ) { (s, d) =>
      val index = PhaseTimer.timed("crawl_host_stats", "fixture_ensure") {
        cdxIndexFor(s, d, "warc-redirect-cdx", redirectFixture(s, d))
      }
      index.filter(lower(col("warc_type")) === "response")
        .select(graft.ext.UrlOps.urlParts(col("url")).getField("host")
          .as("host"), col("status"))
        .groupBy("host")
        .agg(count(lit(1)).as("n_captures"),
          count(when(col("status").between(200, 299), 1)).as("n_ok"),
          count(when(col("status").between(300, 399), 1)).as("n_redirects"))
        .orderBy("host")
    },

    // Outlink harvesting (r20, LinkGraph.extractEdges): each page
    // carries a <base href>-resolved relative link, an entity-escaped
    // absolute link whose canonical form sorts its params, a
    // fragment-only href (intra-page: drops), a mailto (non-http:
    // drops), and a duplicate (collapses) — the oracle states the
    // surviving (src, dst) edge set closed-form, so a green row proves
    // anchor extraction, base resolution, canonicalization, and the
    // drop rules all agreed.
    Probe(
      "crawl_outlinks",
      "WITH d AS (SELECT doc_id, CAST(doc_id % 4 AS VARCHAR) AS g FROM documents WHERE doc_id IS NOT NULL) " +
        "SELECT src, dst FROM (" +
        "SELECT 'https://ol' || g || '.example.com/page/' || CAST(doc_id AS VARCHAR) AS src, " +
        "'https://ol' || g || '.example.com/b/rel' || CAST(doc_id AS VARCHAR) AS dst FROM d " +
        "UNION ALL " +
        "SELECT 'https://ol' || g || '.example.com/page/' || CAST(doc_id AS VARCHAR), " +
        "'https://ext' || g || '.example.com/p?a=1&b=2' FROM d" +
        ") ORDER BY src, dst"
    ) { (s, d) =>
      val g = pmod(col("doc_id"), lit(4)).cast("string")
      val id = col("doc_id").cast("string")
      val url = concat(lit("https://ol"), g, lit(".example.com/page/"), id)
      val html = concat(
        lit("<html><head><base href=\"/b/\"></head><body>" +
          "<a href=\"rel"), id, lit("\">x</a>" +
          "<a href=\"https://Ext"), g,
        lit(".example.com/p?b=2&amp;a=1\">y</a>" +
          "<a href=\"#top\">z</a>" +
          "<a href=\"mailto:a@b.example\">w</a>" +
          "<a href=\"rel"), id, lit("\">dup</a></body></html>"))
      val pages = t(s, d, "documents").filter(col("doc_id").isNotNull)
        .select(url.as("url"), html.as("html"))
      graft.ext.LinkGraph.extractEdges(pages, "url", "html")
        .orderBy("src", "dst")
    },

    // Link-graph degrees (r20, LinkGraph.degrees): out/in counts over
    // the deterministic doc-id graph, zero-coalesced through the outer
    // join — dangling targets (in-degree only) and source-only nodes
    // both surface.
    Probe(
      "crawl_link_degrees",
      s"WITH $idEdgesSql, " +
        "o AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS out_degree FROM e2 GROUP BY 1), " +
        "i AS (SELECT dst AS node, CAST(count(*) AS BIGINT) AS in_degree FROM e2 GROUP BY 1) " +
        "SELECT coalesce(o.node, i.node) AS node, " +
        "coalesce(o.out_degree, CAST(0 AS BIGINT)) AS out_degree, " +
        "coalesce(i.in_degree, CAST(0 AS BIGINT)) AS in_degree " +
        "FROM o FULL OUTER JOIN i ON o.node = i.node ORDER BY node"
    ) { (s, d) =>
      graft.ext.LinkGraph.degrees(idEdges(s, d)).orderBy("node")
    },

    // Fixed-iteration PageRank (r20, LinkGraph.pagerank): 3 iterations
    // at damping 0.85 over the doc-id graph — the oracle replays the
    // identical recurrence with ascending-src ordered folds, so every
    // rank is bit-identical before the shared 9-dp round; a wrong
    // teleport term, an unordered sum, or a mishandled dangling node
    // all hash-mismatch.
    Probe(
      "crawl_pagerank",
      pagerankSql(3)
    ) { (s, d) =>
      graft.ext.LinkGraph.pagerank(idEdges(s, d), iterations = 3)
        .select(col("node"), round(col("rank"), 9).as("rank_r"))
        .orderBy("node")
    },

    // Per-host crawl-delay extraction (r20, RobotsTxt.crawlDelays): the
    // politeness half of the robots surface — group-scoped selection
    // (the agent-specific 10 outranks '*' 2), fractional seconds, a
    // junk value dropping its host, an undeclared host dropping, and
    // colliding canonical spellings taking the larger delay. The oracle
    // states the decision table closed-form.
    Probe(
      "url_crawl_delay",
      "SELECT * FROM (VALUES " +
        "('h0.example.com', CAST(1.5 AS DOUBLE)), " +
        "('h1.example.com', CAST(10 AS DOUBLE)), " +
        "('h4.example.com', CAST(7 AS DOUBLE))" +
        ") AS t(host, crawl_delay) ORDER BY host"
    ) { (s, d) =>
      import s.implicits._
      val robots = Seq(
        ("h0.example.com", "User-agent: *\nCrawl-delay: 1.5\n"),
        ("h1.example.com",
          "User-agent: graftbot\nCrawl-delay: 10\n\n" +
            "User-agent: *\nCrawl-delay: 2\n"),
        ("h2.example.com", "User-agent: *\nCrawl-delay: soon\n"),
        ("h3.example.com", "User-agent: *\nDisallow: /private/\n"),
        ("h4.example.com", "User-agent: *\nCrawl-delay: 3\n"),
        ("WWW.h4.example.com", "User-agent: *\nCrawl-delay: 7\n")
      ).toDF("host", "robots_txt")
      graft.ext.RobotsTxt.crawlDelays(robots, userAgent = "graftbot/1.0")
        .orderBy("host")
    },

    // Unicode cleanup composed ahead of dedup (r20, TextClean +
    // Dedup.exactGroups on the crawl path): each doc arrives as THREE
    // capture variants of one logical page — NFC-composed, NFD-
    // decomposed + a control char, and UTF-8-as-cp1252 mojibake — that
    // exact dedup can only collapse AFTER cleanText (mojibake repair ->
    // NFC -> control strip) runs. The oracle states the collapsed
    // groups closed-form: one survivor (the lowest variant id) and
    // dup_cnt 3 per doc; a wrong normalization order, a false repair,
    // or a missed control strip all break the 3-way collapse.
    Probe(
      "crawl_curate_unicode",
      "SELECT 'doc ' || CAST(doc_id AS VARCHAR) || ': ' || text || ' é' AS content_key, " +
        "CAST(doc_id * 3 AS BIGINT) AS keep_id, CAST(3 AS BIGINT) AS dup_cnt " +
        s"FROM documents WHERE $docFilter ORDER BY keep_id"
    ) { (s, d) =>
      val dir = PhaseTimer.timed("crawl_curate_unicode", "fixture_ensure") {
        unicodeFixture(s, d)
      }
      val pages = Warc.readResponses(s, dir + "/*.warc.gz")
        .select(col("url"),
          HtmlText.htmlTextBytes(col("body"), col("charset")).as("text"))
      val cleaned = pages.withColumn("text", TextClean.cleanText(col("text")))
        .withColumn("variant_id",
          regexp_extract(col("url"), "/u/(\\d+)/v(\\d)$", 1).cast("long") * 3 +
            regexp_extract(col("url"), "/u/(\\d+)/v(\\d)$", 2).cast("long"))
      Dedup.exactGroups(cleaned, col("text"), col("variant_id"))
        .select(col("content_key"), col("keep_id"), col("dup_cnt"))
        .orderBy("keep_id")
    }
  )

  /** The deterministic doc-id link graph the degree/PageRank probes
    * share: nodes = doc_id % 1000, edges n -> (n+1) % 1000 and
    * n -> (2n+1) % 1000, self-loops dropped, distinct — closed under
    * the same construction in DuckDB ([[pagerankSql]]).
    */
  private def idEdges(s: SparkSession, d: String): DataFrame = {
    val b = t(s, d, "documents").filter(col("doc_id").isNotNull)
      .select(pmod(col("doc_id"), lit(1000)).as("n")).distinct()
    b.select(col("n").as("src"), pmod(col("n") + 1, lit(1000)).as("dst"))
      .union(b.select(col("n").as("src"),
        pmod(col("n") * 2 + 1, lit(1000)).as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  // a def, not a val: `all` above initializes first and would capture
  // a null (the urlFixtureSql trap)
  private def idEdgesSql: String =
    "b AS (SELECT DISTINCT doc_id % 1000 AS n FROM documents WHERE doc_id IS NOT NULL), " +
      "e AS (SELECT n AS src, (n + 1) % 1000 AS dst FROM b UNION SELECT n, (2 * n + 1) % 1000 FROM b), " +
      "e2 AS (SELECT src, dst FROM e WHERE src <> dst)"

  /** String-built fixed-iteration PageRank oracle: the SAME recurrence
    * the engine runs — teleport and damping forced to DOUBLE (DuckDB
    * literals are DECIMAL), the per-node contribution summed by the
    * engine's TWO-LEVEL deterministic fold (ascending src within each
    * 256-way md5(src)-prefix bucket, then bucket sums in ascending
    * bucket order — the skew-safe scheme `LinkGraph.pagerank` runs) —
    * so every rank is bit-identical before the final 9-dp round.
    */
  private def pagerankSql(iters: Int): String = {
    val base = s"WITH $idEdgesSql, " +
      "nodes AS (SELECT src AS node FROM e2 UNION SELECT dst FROM e2), " +
      "od AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e2 GROUP BY 1), " +
      "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes), " +
      "r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS rank FROM nodes, nn)"
    val steps = (1 to iters).map { i =>
      s", cb$i AS (SELECT e2.dst AS node, " +
        "CAST('0x' || substring(md5(CAST(e2.src AS VARCHAR)), 1, 2) AS INT) AS b, " +
        "list_reduce(list_prepend(0.0, " +
        "list(r.rank / od.outdeg ORDER BY e2.src)), (a, x) -> a + x) AS bsum " +
        s"FROM e2 JOIN r${i - 1} r ON e2.src = r.node JOIN od ON e2.src = od.src " +
        "GROUP BY e2.dst, b)" +
        s", c$i AS (SELECT node, list_reduce(list_prepend(0.0, " +
        s"list(bsum ORDER BY b)), (a, x) -> a + x) AS contrib FROM cb$i GROUP BY node)" +
        s", r$i AS (SELECT nodes.node, " +
        "(CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n + " +
        s"CAST(0.85 AS DOUBLE) * coalesce(c$i.contrib, CAST(0 AS DOUBLE)) AS rank " +
        s"FROM nodes CROSS JOIN nn LEFT JOIN c$i ON nodes.node = c$i.node)"
    }.mkString
    base + steps +
      s" SELECT node, round(rank, 9) AS rank_r FROM r$iters ORDER BY node"
  }

  /** The MATERIALIZED CDX index of a shard fixture — the `ivfIndexFor`
    * lifecycle argument: indexing is a one-time build (index once,
    * query forever — the whole point of the CDX layer), so the resolve
    * probes read the parquet index instead of re-walking every shard
    * per plan reference (resolveRedirects references its target table
    * once per hop; an unmaterialized index would re-parse the crawl
    * maxHops times).
    */
  private def cdxIndexFor(s: SparkSession, d: String, kind: String,
                          shardDir: String): DataFrame =
    s.read.parquet(Probe.mediaFixtureFor(d, kind) {
      WarcIndex.indexWarc(s, shardDir + "/*.warc.gz")
    })

  private def sha256hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(b).map("%02x".format(_)).mkString

  private def httpResponse(headers: String, body: Array[Byte]): Array[Byte] = {
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val out = new java.io.ByteArrayOutputStream()
    out.write(headers.getBytes(iso))
    out.write(body)
    out.toByteArray
  }

  /** The revisit fixture: 4 shards (g = doc_id % 4), holding per doc —
    * v==0: a `response` for /orig/ID with a declared payload digest;
    * v==1: a `revisit` for /re/ID declaring doc (ID-1)'s payload digest
    * (built from the SAME bytes, so the declared strings match exactly);
    * v==2: a dangling `revisit` whose digest matches nothing. Ascending
    * doc_id inside each shard — byte-deterministic; 4 bounded blobs to
    * the driver.
    */
  private def revisitFixture(s: SparkSession, d: String): String =
    Probe.fileFixtureFor(d, "warc-revisit") { dir =>
      import s.implicits._
      val docs = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), col("text"))
      val orig = docs.select(col("doc_id").as("o_id"), col("text").as("o_text"))
      val paired = docs
        .join(orig, col("o_id") === col("doc_id") - 1, "left")
        .select(col("doc_id"), col("text"), col("o_text"))
        .as[(Long, String, Option[String])]
      val shards = paired
        .groupByKey(_._1 % 4)
        .mapGroups { (g, it) =>
          val iso = java.nio.charset.StandardCharsets.ISO_8859_1
          val rows = it.toArray.sortBy(_._1)
          val recs = Vector.newBuilder[Array[Byte]]
          def payloadOf(text: String): Array[Byte] =
            s"<html><body><p>$text</p></body></html>".getBytes(iso)
          def digestOf(payload: Array[Byte]): String =
            "sha256:" + sha256hex(payload)
          rows.foreach { case (id, text, oTextOpt) =>
            (id % 3, oTextOpt) match {
              case (0L, _) =>
                val payload = payloadOf(text)
                val http = httpResponse("HTTP/1.1 200 OK\r\n" +
                  "Content-Type: text/html\r\n" +
                  s"Content-Length: ${payload.length}\r\n\r\n", payload)
                recs += Warc.writeRecord("response",
                  s"https://rv$g.example.com/orig/$id",
                  "application/http;msgtype=response", http,
                  Warc.DefaultExportInstant, null,
                  Seq("WARC-Payload-Digest" -> digestOf(payload)))
              case (1L, Some(oText)) =>
                // declared digest of the ORIGINAL's payload — built
                // from the same bytes the original's shard builds
                recs += Warc.writeRecord("revisit",
                  s"https://rv$g.example.com/re/$id",
                  "message/http", Array.emptyByteArray,
                  Warc.DefaultExportInstant, null,
                  Seq("WARC-Payload-Digest" -> digestOf(payloadOf(oText))))
              case (2L, _) =>
                recs += Warc.writeRecord("revisit",
                  s"https://rv$g.example.com/dang/$id",
                  "message/http", Array.emptyByteArray,
                  Warc.DefaultExportInstant, null,
                  Seq("WARC-Payload-Digest" ->
                    ("sha256:" + sha256hex(s"missing-$id".getBytes(iso)))))
              case _ => () // revisit with no original row: not built
            }
          }
          (g, Warc.writeWarc(recs.result(), gzipPerRecord = true))
        }
        .collect() // 4 shard blobs, bounded by construction
      shards.foreach { case (g, bytes) =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, s"rv-$g.warc.gz"), bytes): Unit
      }
    }

  /** The redirect fixture: 4 shards, per doc a 2-hop chain — /start/ID
    * 301 with a RELATIVE Location, /mid/ID 302 absolute, /final/ID 200
    * — plus a self-cycle (/loop/ID, docs%5==0) and a dangling 301
    * (/gone/ID -> /nowhere/ID, docs%5==1). Shared with the frontier
    * probe (its capture side).
    */
  private def redirectFixture(s: SparkSession, d: String): String =
    Probe.fileFixtureFor(d, "warc-redirect") { dir =>
      import s.implicits._
      val shards = t(s, d, "documents")
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id")).as[Long]
        .groupByKey(_ % 4)
        .mapGroups { (g, it) =>
          val iso = java.nio.charset.StandardCharsets.ISO_8859_1
          val ids = it.toArray.sorted
          val recs = Vector.newBuilder[Array[Byte]]
          def resp(url: String, status: Int, location: String,
                   body: String): Array[Byte] = {
            val bodyBytes = body.getBytes(iso)
            val loc = if (location == null) ""
              else s"Location: $location\r\n"
            val http = httpResponse(s"HTTP/1.1 $status x\r\n$loc" +
              "Content-Type: text/html\r\n" +
              s"Content-Length: ${bodyBytes.length}\r\n\r\n", bodyBytes)
            Warc.writeRecord("response", url,
              "application/http;msgtype=response", http)
          }
          ids.foreach { id =>
            val host = s"https://rd$g.example.com"
            recs += resp(s"$host/start/$id", 301, s"/mid/$id", "")
            recs += resp(s"$host/mid/$id", 302, s"$host/final/$id", "")
            recs += resp(s"$host/final/$id", 200, null, s"<p>landed $id</p>")
            if (id % 5 == 0)
              recs += resp(s"$host/loop/$id", 301, s"/loop/$id", "")
            if (id % 5 == 1)
              recs += resp(s"$host/gone/$id", 301, s"/nowhere/$id", "")
          }
          (g, Warc.writeWarc(recs.result(), gzipPerRecord = true))
        }
        .collect()
      shards.foreach { case (g, bytes) =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, s"rd-$g.warc.gz"), bytes): Unit
      }
    }

  /** The Unicode-variant fixture: per doc THREE captures of one logical
    * page — v0 NFC-composed, v1 NFD-decomposed + a BEL control char,
    * v2 UTF-8-as-cp1252 mojibake — written UTF-8 with the charset
    * declared (the non-ASCII markers are the point).
    */
  private def unicodeFixture(s: SparkSession, d: String): String =
    Probe.fileFixtureFor(d, "warc-unicode") { dir =>
      import s.implicits._
      val shards = t(s, d, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .groupByKey(_._1 % 4)
        .mapGroups { (g, it) =>
          val utf8 = java.nio.charset.StandardCharsets.UTF_8
          val rows = it.toArray.sortBy(_._1)
          val recs = Vector.newBuilder[Array[Byte]]
          rows.foreach { case (id, text) =>
            val base = s"doc $id: $text"
            val variants = Seq(
              base + " é", // v0: composed
              base + " é", // v1: decomposed + control
              base + " Ã©") // v2: mojibake of é
            variants.zipWithIndex.foreach { case (content, v) =>
              val payload =
                s"<html><body><p>$content</p></body></html>".getBytes(utf8)
              val http = httpResponse("HTTP/1.1 200 OK\r\n" +
                "Content-Type: text/html; charset=utf-8\r\n" +
                s"Content-Length: ${payload.length}\r\n\r\n", payload)
              recs += Warc.writeRecord("response",
                s"https://uc$g.example.com/u/$id/v$v",
                "application/http;msgtype=response", http)
            }
          }
          (g, Warc.writeWarc(recs.result(), gzipPerRecord = true))
        }
        .collect()
      shards.foreach { case (g, bytes) =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, s"uc-$g.warc.gz"), bytes): Unit
      }
    }
}
