package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Link-graph construction + centrality over fetched pages — the
  * quality-signal path crawl-scale corpora run next to content
  * filtering: harvest `<a href>` outlinks, resolve them to canonical
  * URL endpoints, and derive per-node degree / PageRank signals (the
  * Common Crawl idiom of ranking hosts/pages by link centrality to
  * prioritize fetches and weight corpus sampling).
  *
  * Scale story: edge extraction is one scalar pass per page (the same
  * single-scan HTML walk as [[HtmlText.pageMeta]]) + one distinct;
  * degrees are two hash aggregates; PageRank is `iterations` hash
  * joins over (node, rank) rows — edges and ranks only, never page
  * bytes. Every floating-point reduction folds in ascending `src`
  * order (the [[Stats]] deterministic-fold idiom), so a rank is
  * bit-reproducible across runs and engines — an auditable signal, not
  * a flaky one.
  */
object LinkGraph {

  /** `(src, dst)` edges from fetched pages: each page's outlinks
    * resolve per RFC 3986 against the page's EFFECTIVE base
    * (`<base href>` itself resolved against the fetch URL first, the
    * [[UrlOps.canonicalDedupKey]] rules), both endpoints take
    * [[UrlOps]] canonical form, non-http(s) targets (mailto:,
    * javascript:, ...) and self-edges drop, and duplicate (src, dst)
    * pairs collapse. One scalar pass + one distinct (the only
    * shuffle).
    */
  def extractEdges(pages: DataFrame, urlCol: String,
                   htmlCol: String): DataFrame = {
    val edgesUdf = udf { (url: String, html: String) =>
      val src = if (url == null) null else UrlOps.parse(url).canonical
      if (src == null || src.isEmpty) (src, Array.empty[String])
      else {
        val meta = HtmlText.pageMeta(html)
        val base = meta.baseHref match {
          case Some(bh) => UrlOps.resolve(url, bh)
          case None     => url
        }
        val dsts = HtmlText.outlinks(html).iterator
          // fragment-only hrefs are intra-page navigation by definition
          // (strict RFC resolution would send them to the <base> URL,
          // which is not what an outlink graph wants)
          .filter(h => !h.startsWith("#"))
          .map(h => UrlOps.parse(UrlOps.resolve(base, h)).canonical)
          .filter(t => t != null &&
            (t.startsWith("http://") || t.startsWith("https://")) &&
            t != src)
          .toArray
        (src, dsts)
      }
    }
    pages
      .select(edgesUdf(col(urlCol), col(htmlCol)).as("__e"))
      .select(col("__e._1").as("src"), explode(col("__e._2")).as("dst"))
      .distinct()
  }

  /** Per-node `(node, out_degree, in_degree)` over a distinct edge set
    * — two hash aggregates + one outer join, all on edge-sized rows.
    */
  def degrees(edges: DataFrame): DataFrame = {
    val out = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_degree"))
    val in = edges.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("in_degree"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
  }

  /** PageRank with a FIXED iteration count over a distinct edge set:
    * `rank = (1-d)/N + d * Σ_in rank(src)/outdeg(src)`, nodes = every
    * edge endpoint. Documented variant: a dangling node (no outlinks)
    * contributes nothing — its mass leaves the system rather than
    * redistributing (ranks sum below 1; ORDER is unaffected, which is
    * what a sampling weight consumes). Deterministic by construction:
    * the per-node contribution sum is a TWO-LEVEL ordered fold — in-edge
    * contributions fold ascending-`src` WITHIN 256 md5(src)-prefix
    * buckets, then the per-bucket sums fold in ascending bucket order —
    * so repeated runs are bit-identical AND no aggregation buffer ever
    * holds more than one bucket's share of a node's in-neighborhood
    * (web in-degrees are power-law: a 10⁷-in-link hub under the earlier
    * single-level fold collected every contribution into one
    * `collect_list` buffer on one executor; the bucket level caps that
    * buffer at ~in-degree/256 — the [[Stats.covarianceExact]] scheme).
    *
    * Scale: per iteration, two hash joins + two bounded-buffer fold
    * aggregates over (node, rank)-sized rows. `edges`, `nodes` and
    * `outdeg` are materialized ONCE up front (`localCheckpoint`) — they
    * are referenced 2·iterations+2 times, and an unmaterialized source
    * subtree would re-expand (and re-execute) per reference: the
    * 3-iteration probe plan carried 36 Exchanges before, 8 after. Each
    * iteration's ranks are likewise checkpointed, so plan size per
    * iteration is CONSTANT, not linear (the
    * [[WarcIndex.resolveRedirects]] lesson, strengthened: reference
    * state once AND truncate between iterations). One driver-side
    * `count()` fixes N (a single scalar, the quantile-threshold idiom).
    */
  def pagerank(edges: DataFrame, iterations: Int = 4,
               damping: Double = 0.85): DataFrame = {
    require(iterations >= 1 && iterations <= 20,
      s"iterations must be in [1, 20] (got $iterations)")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1) (got $damping)")
    val edgesM = edges.select(col("src"), col("dst")).localCheckpoint()
    val nodes = edgesM.select(col("src").as("node"))
      .union(edgesM.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    val outdeg = edgesM.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint()
    val n = nodes.count() // ONE bounded driver scalar
    require(n > 0, "pagerank: empty graph")
    val teleport = (1.0 - damping) / n
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    var it = 0
    while (it < iterations) {
      it += 1
      val contribs = edgesM
        .join(ranks, col("src") === col("node"))
        .join(outdeg, "src")
        .select(col("dst"), col("src"),
          (col("rank") / col("outdeg")).as("c"))
      // level 1: ascending-src ordered fold WITHIN each 256-way
      // md5(src)-prefix bucket — bounded buffers on power-law hubs
      val bucketed = contribs
        .withColumn("__b",
          conv(substring(md5(col("src").cast("string")), 1, 2), 16, 10)
            .cast("int"))
        .groupBy(col("dst"), col("__b"))
        .agg(aggregate(
          transform(
            sort_array(collect_list(struct(col("src"), col("c")))),
            e => e.getField("c")),
          lit(0.0), (acc, x) => acc + x).as("bsum"))
      // level 2: fold the ≤256 bucket sums in ascending bucket order —
      // the composition is as deterministic as the flat fold was
      val folded = bucketed
        .groupBy(col("dst"))
        .agg(aggregate(
          transform(
            sort_array(collect_list(struct(col("__b"), col("bsum")))),
            e => e.getField("bsum")),
          lit(0.0), (acc, x) => acc + x).as("contrib"))
      ranks = nodes
        .join(folded, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(teleport) + lit(damping) * coalesce(col("contrib"), lit(0.0)))
            .as("rank"))
        .localCheckpoint()
    }
    ranks
  }
}
