package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** [EXT] HTML -> text extraction for web-crawl corpora — the parse step
  * that turns raw crawl payloads into the plain text every downstream
  * operator here consumes (dedup shingles, quality scores, langid, BPE).
  * Pure JVM, single-pass state machine over the markup — no regex (no
  * backtracking surface), no DOM (no allocation proportional to tree
  * depth), O(chars) per document.
  *
  * Extraction convention (deterministic, documented):
  *  - `script`/`style`/`noscript`/`template`/`head` subtrees are dropped
  *    whole (their text is code or metadata, not prose); `head` honors
  *    the HTML5 omissible close — it auto-closes at the first
  *    non-metadata tag, so a page with no literal `</head>` keeps its
  *    body (r19);
  *  - comments, doctypes, and processing instructions vanish;
  *  - block-level elements (p, div, li, tr, h1-h6, nav, table, ...)
  *    bound BLOCKS; inline elements (a, span, b, em, ...) do not;
  *  - character/entity references decode (the common named set +
  *    decimal/hex numeric); unknown entities pass through literally;
  *    `&nbsp;` is whitespace, `&shy;` vanishes; numeric references to
  *    NUL or surrogate code points yield U+FFFD (HTML5 rule — a lone
  *    surrogate would make the output string ill-formed);
  *  - whitespace runs (incl. U+FEFF, the BOM) collapse to one space
  *    inside a block; blocks trim; empty blocks drop; blocks join with
  *    `\n`;
  *  - a bare `<` not opening a tag is literal text (HTML5 tokenizer
  *    rule);
  *  - tag/attribute CASE is ignored; attribute values may contain `>`
  *    inside quotes.
  *
  * Boilerplate removal ([[extractContent]]): each block carries its
  * LINK DENSITY (non-whitespace chars inside `<a>` vs total) — the
  * jusText/trafilatura-family heuristic: navigation, footers, and tag
  * clouds are link-saturated, prose is not. Blocks above the threshold
  * drop; no ML model, fully deterministic.
  *
  * Page-declared crawl signals ([[pageMeta]]): the first
  * `<link rel=canonical>` href and the `<meta name=robots>` directives —
  * read through the SAME tag scanner as extraction (one tokenizer, two
  * walks), so the two surfaces can never drift on tokenizer rules.
  *
  * Scale story: per-row scalar pass, zero shuffle — the scan
  * parallelism is the parse parallelism (same contract as
  * [[TextAnalysis]]). Integrated as a sniff in the E1 parse boundary:
  * [[graft.etl.Parse.TextDocParser]] routes `<!doctype html`/`<html`
  * payloads through [[extract]] before the layout pass.
  */
object HtmlText {

  /** One extracted block: trimmed text, non-whitespace char count, and
    * how many of those chars sat inside an `<a>` element.
    */
  final case class HtmlBlock(text: String, chars: Int, linkChars: Int)

  /** Page-declared crawl signals: the first `<link rel=canonical>` href
    * (entity-decoded, trimmed; None when absent/empty), the union of
    * `<meta name=robots content=...>` directives (lowercased, trimmed),
    * and the first `<base href>` (the RFC 3986 resolution base a
    * RELATIVE canonical href resolves against — see
    * [[UrlOps.dedupByCanonicalUrl]]). A crawl pipeline keys dedup on
    * the DECLARED canonical when present (compose with
    * [[UrlOps.canonicalUrl]] for the final key) and drops `noindex`
    * pages before any content pass.
    */
  final case class PageMeta(canonicalHref: Option[String],
                            robots: Set[String],
                            baseHref: Option[String] = None)

  private val SkipContainers = Set("script", "style", "noscript",
    "template")

  /** Metadata content `head` may contain (HTML5 §4.2) — any OTHER start
    * tag inside an unterminated `<head>` implicitly closes it (`</head>`
    * is omissible), so the head skip in [[blocks]] must hand that tag
    * back to the main walk instead of swallowing the document.
    */
  private val HeadContentTags = Set("meta", "link", "title", "style",
    "script", "noscript", "base", "template")

  /** The containers whose RAW TEXT swallows markup until a boundary-
    * checked close tag (HTML5 rawtext/script-data states). `pageMeta`
    * skips only these — `head` it must enter (that's where its signals
    * live), and the others cannot hold link/meta tags as markup.
    */
  private val RawTextContainers = Set("script", "style", "template")

  private val BlockTags = Set(
    "p", "div", "br", "hr", "li", "ul", "ol", "dl", "dt", "dd",
    "table", "thead", "tbody", "tfoot", "tr", "td", "th", "caption",
    "h1", "h2", "h3", "h4", "h5", "h6",
    "section", "article", "header", "footer", "nav", "aside", "main",
    "blockquote", "pre", "figure", "figcaption", "form", "fieldset",
    "address", "details", "summary", "title", "body", "html")

  private val NamedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "shy" -> "",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”",
    "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "deg" -> "°", "plusmn" -> "±", "times" -> "×",
    "middot" -> "·", "bull" -> "•", "sect" -> "§",
    "para" -> "¶", "laquo" -> "«", "raquo" -> "»",
    "dagger" -> "†", "euro" -> "€", "pound" -> "£",
    "cent" -> "¢", "yen" -> "¥")

  /** Does this payload look like an HTML document? (leading whitespace/
    * BOM tolerated; case-insensitive `<!doctype` or `<html`).
    */
  def isHtml(content: Array[Byte]): Boolean = {
    var i = 0
    // UTF-8 BOM
    if (content.length >= 3 && (content(0) & 0xFF) == 0xEF &&
        (content(1) & 0xFF) == 0xBB && (content(2) & 0xFF) == 0xBF) i = 3
    while (i < content.length &&
      (content(i) == ' ' || content(i) == '\t' || content(i) == '\n' ||
        content(i) == '\r')) i += 1
    def matches(s: String): Boolean =
      content.length >= i + s.length && s.indices.forall { k =>
        val c = content(i + k) & 0xFF
        val lc = if (c >= 'A' && c <= 'Z') c + 32 else c
        lc == s.charAt(k)
      }
    matches("<!doctype") || matches("<html")
  }

  // ---------------------------------------------------------------------
  // The shared tokenizer: one tag scanner for both walks
  // ---------------------------------------------------------------------

  private def lowerCh(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  private def isNameChar(c: Char): Boolean = {
    val d = lowerCh(c)
    (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
  }

  /** A tag OPENS only on an ASCII letter (or '/') after '<' — the HTML5
    * tokenizer rule. Digits continue a name (`h1`) but never start one:
    * `x<5` is literal prose, not a tag named "5".
    */
  private def isTagStart(c: Char): Boolean = {
    val d = lowerCh(c)
    d >= 'a' && d <= 'z'
  }

  private def startsWithIC(html: String, at: Int, s: String): Boolean =
    at + s.length <= html.length &&
      s.indices.forall(k => lowerCh(html.charAt(at + k)) == s.charAt(k))

  /** One scanned tag: lowercase name, closing/self-closing flags, the
    * attribute span [attrStart, gt), and the index after the '>'.
    */
  private final case class TagEvent(name: String, closing: Boolean,
                                    selfClosing: Boolean, attrStart: Int,
                                    gt: Int, after: Int)

  /** Scan the tag starting at `html(lt) == '<'`. Quote-aware: a '>'
    * inside a quoted attribute value does not end the tag. Returns null
    * for an unterminated tag (caller consumes to EOF).
    */
  private def scanTagAt(html: String, lt: Int): TagEvent = {
    val n = html.length
    var j = lt + 1
    val closing = j < n && html.charAt(j) == '/'
    if (closing) j += 1
    val nameStart = j
    while (j < n && isNameChar(html.charAt(j))) j += 1
    val name = html.substring(nameStart, j).toLowerCase
    val attrStart = j
    var quote: Char = 0
    var lastNonWs: Char = 0
    while (j < n) {
      val c = html.charAt(j)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>')
        return TagEvent(name, closing, lastNonWs == '/', attrStart, j, j + 1)
      if (c > ' ') lastNonWs = c
      j += 1
    }
    null // unterminated
  }

  /** Skip a rawtext container's content: scan from `from` for the
    * boundary-checked close tag (`</name` followed by a non-name char —
    * `</scriptfoo>` does not close, HTML5 rule). Returns the index after
    * the close tag's '>', or the end of input.
    */
  private def skipRawtextAfter(html: String, from: Int, name: String): Int = {
    val n = html.length
    var j = from
    while (j < n) {
      val k = html.indexOf('<', j)
      if (k < 0 || k + 1 >= n) return n
      if (html.charAt(k + 1) == '/' && startsWithIC(html, k + 2, name) && {
        val after = k + 2 + name.length
        after >= n || !isNameChar(html.charAt(after))
      }) {
        val gt = html.indexOf('>', k)
        return if (gt < 0) n else gt + 1
      }
      j = k + 1
    }
    n
  }

  /** Skip a `<head>` subtree. `</head>` is OMISSIBLE in HTML5 (the head
    * auto-closes at the first non-metadata tag), so scanning for a
    * literal close tag would swallow the whole body of a valid page
    * like `<head><meta charset=utf-8><body><p>Hello`. Instead this
    * walks TAGS: metadata content (meta/link/base and the rawtext
    * containers, whose contents skip boundary-checked so a `<body` in a
    * script string cannot terminate early) is consumed; `</head>`
    * consumes and returns the index after it; any other start OR close
    * tag (body, a flow element, `</html>`) auto-closes the head and
    * returns the index OF its '<' so the main walk processes it.
    */
  private def skipHeadAfter(html: String, from: Int): Int = {
    val n = html.length
    var j = from
    while (j < n) {
      val lt = html.indexOf('<', j)
      if (lt < 0 || lt + 1 >= n) return n
      val c1 = html.charAt(lt + 1)
      if (c1 == '!' || c1 == '?') j = skipMarkupDecl(html, lt)
      else if (isTagStart(c1) || c1 == '/') {
        val ev = scanTagAt(html, lt)
        if (ev == null) return n // unterminated tag: consume the rest
        if (ev.closing && ev.name == "head") return ev.after
        if (ev.name.isEmpty) j = ev.after // "</>": drop silently
        else if (!ev.closing && !ev.selfClosing &&
            (RawTextContainers(ev.name) || ev.name == "title" ||
              ev.name == "noscript"))
          j = skipRawtextAfter(html, ev.after, ev.name)
        else if (HeadContentTags(ev.name)) j = ev.after
        else return lt // auto-close: re-process this tag in the main walk
      } else j = lt + 1 // bare '<' inside head: metadata, drop
    }
    n
  }

  /** Skip a comment / doctype / processing instruction starting at the
    * '<'. Returns the index after it (or end of input).
    */
  private def skipMarkupDecl(html: String, lt: Int): Int = {
    val n = html.length
    if (startsWithIC(html, lt, "<!--")) {
      val end = html.indexOf("-->", lt + 4)
      if (end < 0) n else end + 3
    } else {
      val end = html.indexOf('>', lt + 1)
      if (end < 0) n else end + 1
    }
  }

  /** Decode one character/entity reference starting at the `&` in
    * `html(amp)`: returns (replacement, indexAfter). Bounded lookahead
    * for ';' — entities are short; a bare `&` stays literal, unknown
    * names stay literal, NUL/surrogate code points become U+FFFD.
    */
  private def decodeEntityAt(html: String, amp: Int): (String, Int) = {
    val n = html.length
    var j = amp + 1
    val limit = math.min(n, amp + 12)
    while (j < limit && html.charAt(j) != ';') j += 1
    if (j >= limit || j >= n || html.charAt(j) != ';') return ("&", amp + 1)
    val body = html.substring(amp + 1, j)
    if (body.isEmpty) return ("&", amp + 1)
    if (body.charAt(0) == '#') {
      val cp =
        try {
          if (body.length > 1 && (body.charAt(1) == 'x' || body.charAt(1) == 'X'))
            Integer.parseInt(body.substring(2), 16)
          else Integer.parseInt(body.substring(1))
        } catch { case _: NumberFormatException => -1 }
      if (cp == 0 || (cp >= 0xD800 && cp <= 0xDFFF))
        ("\uFFFD", j + 1) // HTML5: NUL / surrogate -> replacement char
      else if (cp > 0 && cp <= 0x10FFFF)
        (new String(Character.toChars(cp)), j + 1)
      else ("&", amp + 1)
    } else NamedEntities.get(body) match {
      case Some(s) => (s, j + 1)
      case None    => ("&", amp + 1) // unknown entity: literal
    }
  }

  /** Decode every entity in an ATTRIBUTE value (HTML5 decodes references
    * in attribute values too — canonical hrefs routinely carry `&amp;`).
    * Shared with [[Sitemaps]] (XML's five predefined entities + numeric
    * references are a subset of this decoder).
    */
  private[ext] def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '&') {
        val (rep, after) = decodeEntityAt(s, i)
        b.append(rep)
        i = after
      } else {
        b.append(s.charAt(i))
        i += 1
      }
    }
    b.toString
  }

  private def isWsChar(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' ||
      c == '\u000B' || c == '\f' || c == '\uFEFF'

  // ---------------------------------------------------------------------
  // Walk 1: text extraction
  // ---------------------------------------------------------------------

  /** Parse `html` into extraction blocks (see module doc for rules). */
  def blocks(html: String): Vector[HtmlBlock] = {
    if (html == null) return Vector.empty
    val out = Vector.newBuilder[HtmlBlock]
    val text = new java.lang.StringBuilder
    var chars = 0
    var linkChars = 0
    var pendingSpace = false
    var inLink = false

    def flushBlock(): Unit = {
      if (chars > 0) out += HtmlBlock(text.toString, chars, linkChars)
      text.setLength(0)
      chars = 0
      linkChars = 0
      pendingSpace = false
    }

    def appendChar(c: Char): Unit =
      if (isWsChar(c)) pendingSpace = true
      else {
        if (pendingSpace && text.length > 0) text.append(' ')
        pendingSpace = false
        text.append(c)
        chars += 1
        if (inLink) linkChars += 1
      }

    val n = html.length
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          i = skipMarkupDecl(html, i)
        } else if (i + 1 < n &&
            (isTagStart(html.charAt(i + 1)) || html.charAt(i + 1) == '/')) {
          scanTagAt(html, i) match {
            case null => i = n // unterminated tag: consume the rest
            case ev =>
              i = ev.after
              if (ev.name.isEmpty) {
                // "</>" and friends: drop silently
              } else if (!ev.closing && !ev.selfClosing &&
                  SkipContainers(ev.name)) {
                i = skipRawtextAfter(html, i, ev.name)
                flushBlock()
              } else if (!ev.closing && !ev.selfClosing && ev.name == "head") {
                // head is omissible-close: tag-walk until </head> or the
                // first non-metadata tag (HTML5 auto-close), never a
                // blind rawtext scan for a literal '</head'
                i = skipHeadAfter(html, i)
                flushBlock()
              } else {
                if (ev.name == "a") {
                  if (ev.closing) inLink = false
                  else if (!ev.selfClosing) inLink = true
                }
                if (BlockTags(ev.name)) flushBlock()
              }
          }
        } else {
          appendChar('<') // bare '<' is literal text
          i += 1
        }
      } else if (c == '&') {
        val (s, after) = decodeEntityAt(html, i)
        var k = 0
        while (k < s.length) { appendChar(s.charAt(k)); k += 1 }
        i = after
      } else {
        appendChar(c)
        i += 1
      }
    }
    flushBlock()
    out.result()
  }

  /** All extracted text, blocks joined with `\n`. */
  def extract(html: String): String =
    blocks(html).map(_.text).mkString("\n")

  /** Boilerplate-filtered text: blocks whose link density exceeds
    * `maxLinkDensity` drop (navigation, footers, tag clouds — see
    * module doc). 0.5 keeps prose with inline citations and drops
    * link-saturated chrome.
    */
  def extractContent(html: String, maxLinkDensity: Double = 0.5): String =
    blocks(html)
      .filter(b => b.linkChars.toDouble / math.max(b.chars, 1) <= maxLinkDensity)
      .map(_.text).mkString("\n")

  // ---------------------------------------------------------------------
  // Walk 2: page metadata (same tokenizer, no text accumulation)
  // ---------------------------------------------------------------------

  /** Scan for `<link>`/`<meta>` signals — a tag-only walk over the SAME
    * scanner as [[blocks]]; it skips only true rawtext containers
    * (script/style/template), never `head`, which is exactly where
    * these signals live. Total on malformed input.
    */
  def pageMeta(html: String): PageMeta = {
    if (html == null) return PageMeta(None, Set.empty)
    val n = html.length
    var canonical: Option[String] = None
    var robots = Set.empty[String]
    var base: Option[String] = None
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0 || lt + 1 >= n) return PageMeta(canonical, robots, base)
      if (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?') {
        i = skipMarkupDecl(html, lt)
      } else if (isTagStart(html.charAt(lt + 1)) || html.charAt(lt + 1) == '/') {
        scanTagAt(html, lt) match {
          case null => return PageMeta(canonical, robots, base) // unterminated
          case ev =>
            i = ev.after
            if (!ev.closing && !ev.selfClosing && RawTextContainers(ev.name)) {
              i = skipRawtextAfter(html, i, ev.name)
            } else if (!ev.closing && ev.name == "base" && base.isEmpty) {
              val href = decodeEntities(parseAttrs(html, ev.attrStart, ev.gt)
                .getOrElse("href", "")).trim
              if (href.nonEmpty) base = Some(href)
            } else if (!ev.closing && ev.name == "link" && canonical.isEmpty) {
              val attrs = parseAttrs(html, ev.attrStart, ev.gt)
              val rels = attrs.getOrElse("rel", "").toLowerCase
                .split("\\s+").toSet
              if (rels.contains("canonical")) {
                val href = decodeEntities(attrs.getOrElse("href", "")).trim
                if (href.nonEmpty) canonical = Some(href)
              }
            } else if (!ev.closing && ev.name == "meta") {
              val attrs = parseAttrs(html, ev.attrStart, ev.gt)
              if (attrs.getOrElse("name", "").equalsIgnoreCase("robots"))
                robots ++= decodeEntities(attrs.getOrElse("content", ""))
                  .split(",").map(_.trim.toLowerCase).filter(_.nonEmpty)
            }
        }
      } else {
        i = lt + 1 // bare '<': not a tag here
      }
    }
    PageMeta(canonical, robots, base)
  }

  /** The `<a href>` values of a page in document order (entity-decoded,
    * trimmed, empties dropped; duplicates kept — the caller's graph
    * semantics decide). Same single-scan tag walk as [[pageMeta]]:
    * rawtext containers skip, malformed markup yields what parses.
    * Values are RAW references — [[LinkGraph.extractEdges]] resolves
    * them against the page's effective base per RFC 3986.
    */
  def outlinks(html: String): Vector[String] = {
    if (html == null) return Vector.empty
    val out = Vector.newBuilder[String]
    val n = html.length
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0 || lt + 1 >= n) return out.result()
      if (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?') {
        i = skipMarkupDecl(html, lt)
      } else if (isTagStart(html.charAt(lt + 1)) || html.charAt(lt + 1) == '/') {
        scanTagAt(html, lt) match {
          case null => return out.result() // unterminated tag
          case ev =>
            i = ev.after
            if (!ev.closing && !ev.selfClosing && RawTextContainers(ev.name)) {
              i = skipRawtextAfter(html, i, ev.name)
            } else if (!ev.closing && ev.name == "a") {
              val href = decodeEntities(parseAttrs(html, ev.attrStart, ev.gt)
                .getOrElse("href", "")).trim
              if (href.nonEmpty) out += href
            }
        }
      } else {
        i = lt + 1 // bare '<': not a tag here
      }
    }
    out.result()
  }

  /** Parse the attribute span [from, to) into a lowercase-name map
    * (first occurrence wins, per the HTML5 duplicate-attribute rule).
    */
  private def parseAttrs(html: String, from: Int, to: Int): Map[String, String] = {
    var m = Map.empty[String, String]
    var j = from
    while (j < to) {
      while (j < to && (html.charAt(j) <= ' ' || html.charAt(j) == '/')) j += 1
      if (j >= to) return m
      val nameStart = j
      while (j < to && html.charAt(j) > ' ' && html.charAt(j) != '=' &&
        html.charAt(j) != '/') j += 1
      val name = html.substring(nameStart, j).toLowerCase
      while (j < to && html.charAt(j) <= ' ') j += 1
      var value = ""
      if (j < to && html.charAt(j) == '=') {
        j += 1
        while (j < to && html.charAt(j) <= ' ') j += 1
        if (j < to && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
          val q = html.charAt(j)
          j += 1
          val vs = j
          while (j < to && html.charAt(j) != q) j += 1
          value = html.substring(vs, math.min(j, to))
          if (j < to) j += 1
        } else {
          val vs = j
          while (j < to && html.charAt(j) > ' ') j += 1
          value = html.substring(vs, j)
        }
      }
      if (name.nonEmpty && !m.contains(name)) m += name -> value
    }
    m
  }

  // ---------------------------------------------------------------------
  // Byte -> string: charset sniffing for crawl payloads
  // ---------------------------------------------------------------------

  /** Decode an HTML payload's bytes to a string under the HTML5 charset
    * precedence: a BOM wins outright (UTF-8 / UTF-16 LE / BE), then the
    * transport-declared charset (`charsetHint` — e.g. the HTTP
    * Content-Type from a WARC response record), then a `charset=`
    * declaration in the first 1024 bytes (`<meta charset=...>` or the
    * http-equiv form), then UTF-8. Unknown charset names and malformed
    * byte sequences never throw — decoding falls back / replaces, so a
    * crawl payload always yields SOME string (the extraction layer is
    * not where a corpus build wants to die on one mojibake page).
    */
  def decodeBytes(bytes: Array[Byte], charsetHint: String = null): String = {
    if (bytes == null) return null
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    if (bytes.length >= 3 && (bytes(0) & 0xFF) == 0xEF &&
        (bytes(1) & 0xFF) == 0xBB && (bytes(2) & 0xFF) == 0xBF)
      return new String(bytes, 3, bytes.length - 3, utf8)
    if (bytes.length >= 2) {
      val b0 = bytes(0) & 0xFF
      val b1 = bytes(1) & 0xFF
      // the JDK's "UTF-16" charset consumes the BOM itself
      if ((b0 == 0xFF && b1 == 0xFE) || (b0 == 0xFE && b1 == 0xFF))
        return new String(bytes, java.nio.charset.Charset.forName("UTF-16"))
    }
    def forName(name: String): java.nio.charset.Charset =
      try {
        val t = name.trim
        if (t.isEmpty) null else java.nio.charset.Charset.forName(t)
      } catch { case _: Exception => null }
    var cs: java.nio.charset.Charset = null
    if (charsetHint != null) cs = forName(charsetHint)
    if (cs == null) {
      // sniff `charset=` in the head prefix (latin-1 view is safe for a
      // bytewise scan — every byte maps to one char)
      val prefix = new String(bytes, 0, math.min(bytes.length, 1024),
        java.nio.charset.StandardCharsets.ISO_8859_1).toLowerCase
      val p = charsetParam(prefix)
      if (p != null) cs = forName(p)
    }
    new String(bytes, if (cs == null) utf8 else cs)
  }

  /** The `charset=...` parameter scanner this module's meta sniff and
    * [[Warc]]'s Content-Type header extraction SHARE (one copy — the
    * two call sites must never drift): optional single/double quote,
    * value until quote / ';' / '>' / whitespace; null when absent or
    * empty. Call on lowercased text.
    */
  private[ext] def charsetParam(s: String): String = {
    val at = s.indexOf("charset=")
    if (at < 0) return null
    var j = at + 8
    if (j < s.length && (s.charAt(j) == '"' || s.charAt(j) == '\'')) j += 1
    val start = j
    while (j < s.length && { val c = s.charAt(j)
      c != '"' && c != '\'' && c != '>' && c != ';' && c > ' ' }) j += 1
    val v = s.substring(start, j).trim
    if (v.isEmpty) null else v
  }

  // ---------------------------------------------------------------------
  // Column surface
  // ---------------------------------------------------------------------

  private val extractUdf = udf { html: String => extract(html) }
  private val contentUdf = udf { html: String => extractContent(html) }
  private val pageMetaUdf = udf { html: String =>
    val m = pageMeta(html)
    (m.canonicalHref.orNull, m.robots.contains("noindex"),
      m.robots.contains("nofollow"))
  }

  private val extractBytesUdf = udf { (bytes: Array[Byte], hint: String) =>
    extract(decodeBytes(bytes, hint))
  }

  /** Column form of [[extract]]. */
  def htmlText(html: Column): Column = extractUdf(html)

  /** [[extract]] over RAW payload bytes with charset sniffing
    * ([[decodeBytes]]); `charsetHint` is the transport-declared charset
    * column (e.g. [[Warc.readResponses]]' `charset`), nullable.
    */
  def htmlTextBytes(bytes: Column, charsetHint: Column): Column =
    extractBytesUdf(bytes, charsetHint)

  /** Column form of [[extractContent]] at the default density. */
  def htmlContent(html: Column): Column = contentUdf(html)

  /** Struct column `(canonical_href, noindex, nofollow)` from
    * [[pageMeta]] — one scan per row.
    */
  def htmlPageMeta(html: Column): Column = pageMetaUdf(html)
}
