package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Sitemap parsing (sitemaps.org XML protocol) — the discovery
  * side of the crawl path: robots.txt advertises `Sitemap:` URLs,
  * sitemap indexes point at child sitemaps, and urlsets carry the
  * site-declared page inventory with change metadata. A curation
  * pipeline reads these to scope and prioritize fetches and to join
  * site-declared `lastmod` against capture dates.
  *
  * Parsing rules (the published protocol, total on junk):
  *  - a `<urlset>` yields one entry per `<url>` block (kind "url"); a
  *    `<sitemapindex>` yields one per `<sitemap>` block (kind
  *    "sitemap") — both can appear in one corpus, so entries carry
  *    their kind;
  *  - `<loc>` is required (blocks without one drop); `<lastmod>`,
  *    `<changefreq>`, `<priority>` are optional and ride along as
  *    nullable strings (the protocol's W3C-datetime/enum/decimal
  *    domains are the caller's to interpret);
  *  - XML entity references in values decode (`&amp;` in a loc is the
  *    ESCAPED form the protocol REQUIRES for URLs with parameters);
  *    CDATA sections unwrap;
  *  - tags match case-insensitively with name boundaries; unknown
  *    elements, comments, processing instructions, and namespaces are
  *    skipped; malformed input yields the entries that do parse —
  *    never a throw (a corpus of fetched sitemaps always contains
  *    damage).
  *
  * Scale story: one scalar pass per sitemap blob, zero shuffle —
  * sitemaps are bounded by protocol (50k URLs / 50 MB uncompressed),
  * so a per-row parse is always executor-safe; `.gz` payloads gunzip
  * inline (the `sitemap.xml.gz` convention).
  */
object Sitemaps {

  /** One parsed entry. `kind` is "url" (urlset) or "sitemap" (index). */
  final case class SitemapEntry(kind: String, loc: String,
                                lastmod: String, changefreq: String,
                                priority: String)

  private def lowerCh(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  private def startsWithIC(s: String, at: Int, w: String): Boolean =
    at + w.length <= s.length &&
      w.indices.forall(k => lowerCh(s.charAt(at + k)) == w.charAt(k))

  /** XML NameChar subset that matters here: letters, digits, and the
    * `:`/`-`/`.`/`_` punctuation XML names allow — so `<url-info>` is
    * a DIFFERENT element than `<url>` (never a false block open) and a
    * namespace prefix rides inside one QName token.
    */
  private def isNameChar(c: Char): Boolean = {
    val d = lowerCh(c)
    (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9') ||
      c == ':' || c == '-' || c == '.' || c == '_'
  }

  /** Match the QName starting at `nameStart` against local `name`:
    * scans the full XML name token, strips any `prefix:` (sitemaps
    * from lxml-family generators ship namespace-PREFIXED tags —
    * `<ns0:urlset><ns0:url><ns0:loc>` — which are the same elements),
    * and compares the local part case-insensitively. Returns the index
    * after the tag's '>' or -1.
    */
  private def matchTag(xml: String, nameStart: Int, name: String): Int = {
    var j = nameStart
    while (j < xml.length && isNameChar(xml.charAt(j))) j += 1
    if (j == nameStart) return -1
    val qname = xml.substring(nameStart, j)
    val colon = qname.lastIndexOf(':')
    val local = if (colon >= 0) qname.substring(colon + 1) else qname
    if (!local.equalsIgnoreCase(name)) return -1
    val gt = xml.indexOf('>', j)
    if (gt < 0) -1 else gt + 1
  }

  private def openTag(xml: String, lt: Int, name: String): Int =
    if (lt + 1 >= xml.length || xml.charAt(lt + 1) == '/') -1
    else matchTag(xml, lt + 1, name)

  private def closeTag(xml: String, lt: Int, name: String): Int =
    if (lt + 1 >= xml.length || xml.charAt(lt + 1) != '/') -1
    else matchTag(xml, lt + 2, name)

  /** The text content of a simple element starting after its open tag:
    * CDATA unwraps, entities decode, surrounding whitespace trims.
    * Returns (value, indexAfterCloseTag); an unterminated element
    * consumes to EOF.
    */
  private def textUntilClose(xml: String, from: Int, name: String)
      : (String, Int) = {
    val out = new java.lang.StringBuilder // final value
    val pend = new java.lang.StringBuilder // raw text awaiting decode
    def flush(): Unit =
      if (pend.length > 0) {
        out.append(HtmlText.decodeEntities(pend.toString))
        pend.setLength(0)
      }
    var i = from
    val n = xml.length
    while (i < n) {
      if (xml.charAt(i) == '<') {
        if (startsWithIC(xml, i, "<![cdata[")) {
          // CDATA content is LITERAL — entity references inside it do
          // not decode (XML rule), so it bypasses the pending buffer
          flush()
          val end = xml.indexOf("]]>", i + 9)
          val stop = if (end < 0) n else end
          out.append(xml, i + 9, stop)
          i = if (end < 0) n else end + 3
        } else {
          val after = closeTag(xml, i, name)
          if (after > 0) { flush(); return (out.toString.trim, after) }
          pend.append(xml.charAt(i)); i += 1
        }
      } else { pend.append(xml.charAt(i)); i += 1 }
    }
    flush()
    (out.toString.trim, n)
  }

  /** Parse one sitemap document (urlset and/or sitemapindex) — see the
    * module doc for rules. Total: malformed input yields what parses.
    */
  def parse(xml: String): Vector[SitemapEntry] = {
    if (xml == null) return Vector.empty
    val out = Vector.newBuilder[SitemapEntry]
    val n = xml.length
    var i = 0
    var kind: String = null // inside a <url> or <sitemap> block
    var loc: String = null
    var lastmod: String = null
    var changefreq: String = null
    var priority: String = null
    def emit(): Unit = {
      if (kind != null && loc != null && loc.nonEmpty)
        out += SitemapEntry(kind, loc, lastmod, changefreq, priority)
      kind = null; loc = null; lastmod = null
      changefreq = null; priority = null
    }
    while (i < n) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) { emit(); return out.result() }
      if (startsWithIC(xml, lt, "<!--")) {
        val end = xml.indexOf("-->", lt + 4)
        i = if (end < 0) n else end + 3
      } else if (lt + 1 < n &&
          (xml.charAt(lt + 1) == '?' || xml.charAt(lt + 1) == '!')) {
        val end = xml.indexOf('>', lt + 1)
        i = if (end < 0) n else end + 1
      } else if (kind == null) {
        var after = openTag(xml, lt, "url")
        if (after > 0) { kind = "url"; i = after }
        else {
          after = openTag(xml, lt, "sitemap")
          if (after > 0) { kind = "sitemap"; i = after }
          else i = lt + 1
        }
      } else {
        var after = closeTag(xml, lt, kind)
        if (after > 0) { emit(); i = after }
        else if ({ after = openTag(xml, lt, "loc"); after > 0 }) {
          val (v, j) = textUntilClose(xml, after, "loc"); loc = v; i = j
        } else if ({ after = openTag(xml, lt, "lastmod"); after > 0 }) {
          val (v, j) = textUntilClose(xml, after, "lastmod"); lastmod = v; i = j
        } else if ({ after = openTag(xml, lt, "changefreq"); after > 0 }) {
          val (v, j) = textUntilClose(xml, after, "changefreq")
          changefreq = v; i = j
        } else if ({ after = openTag(xml, lt, "priority"); after > 0 }) {
          val (v, j) = textUntilClose(xml, after, "priority")
          priority = v; i = j
        } else i = lt + 1
      }
    }
    emit()
    out.result()
  }

  /** [[parse]] over raw payload bytes: a gzip blob (the
    * `sitemap.xml.gz` convention) gunzips first; text decodes BOM >
    * declared-charset > UTF-8 via [[HtmlText.decodeBytes]] (the XML
    * `encoding=` declaration carries no `charset=` token, but BOMs and
    * the UTF-8 default cover the fleet; a transport hint threads
    * through when the caller has one).
    */
  def parseBytes(bytes: Array[Byte], charsetHint: String = null)
      : Vector[SitemapEntry] = {
    if (bytes == null) return Vector.empty
    val payload =
      if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1F &&
          (bytes(1) & 0xFF) == 0x8B)
        try {
          val in = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(bytes), 64 * 1024)
          try in.readAllBytes() finally in.close()
        } catch {
          case _: java.io.IOException => return Vector.empty // damaged: total
        }
      else bytes
    parse(HtmlText.decodeBytes(payload, charsetHint))
  }

  /** The `Sitemap:` URLs a robots.txt advertises (RFC 9309 leaves the
    * directive to the sitemaps protocol; it is group-independent —
    * every agent sees every sitemap line). Order preserved, duplicates
    * kept (the caller's dedup policy applies).
    */
  def fromRobots(robotsTxt: String): Vector[String] = {
    if (robotsTxt == null) return Vector.empty
    // ONE robots line lexer, shared with RobotsTxt.parse — comment
    // strip, trim, and field folding can never drift between the
    // policy and discovery readers
    RobotsTxt.directives(robotsTxt)
      .collect { case ("sitemap", v) if v.nonEmpty => v }
      .toVector
  }

  private val parseUdf = udf { xml: String =>
    parse(xml).map(e =>
      (e.kind, e.loc, e.lastmod, e.changefreq, e.priority))
  }

  private val fromRobotsUdf = udf { robots: String => fromRobots(robots) }

  /** Explode a robots-table frame (host, robots body) to one row per
    * advertised sitemap URL — the discovery join point feeding a
    * sitemap fetch stage. Zero shuffle.
    */
  def discoverFromRobots(robots: DataFrame, hostCol: String = "host",
                         robotsCol: String = "robots_txt"): DataFrame =
    robots.select(col(hostCol).as("host"),
      explode(fromRobotsUdf(col(robotsCol))).as("sitemap_url"))

  /** Column form: array of (kind, loc, lastmod, changefreq, priority)
    * structs — `explode` it to one row per entry (zero shuffle; the
    * scan parallelism is the parse parallelism).
    */
  def sitemapEntries(xml: Column): Column =
    parseUdf(xml).cast("array<struct<kind:string,loc:string," +
      "lastmod:string,changefreq:string,priority:string>>")

  /** Explode a frame's sitemap XML column to one row per entry,
    * carrying the other columns through.
    */
  def explodeEntries(df: DataFrame, xmlCol: String): DataFrame =
    df.withColumn("__e", explode(sitemapEntries(col(xmlCol))))
      .drop(xmlCol)
      .withColumn("kind", col("__e.kind"))
      .withColumn("loc", col("__e.loc"))
      .withColumn("lastmod", col("__e.lastmod"))
      .withColumn("changefreq", col("__e.changefreq"))
      .withColumn("priority", col("__e.priority"))
      .drop("__e")
}
