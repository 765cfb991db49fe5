package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] URL curation for crawl-scale corpora: canonicalization,
  * tracking-parameter strip, host / registered-domain extraction, and
  * URL-level dedup. Web-crawl training pipelines dedup and cap BY URL
  * before any content pass (the same logical page arrives as
  * `HTTP://WWW.Site.com:80/a/?utm_source=x` and `http://site.com/a` —
  * content-level dedup would pay a full fetch+shingle to discover what
  * the URL already says), and per-domain caps/mixing key on the
  * registered domain ([[Mixing.perGroupCap]] composes directly).
  *
  * Canonical form (documented, deterministic — the dedup KEY contract,
  * not a browser emulation):
  *  1. trim; drop the `#fragment`;
  *  2. lowercase scheme and host; strip userinfo; strip ONE leading
  *     `www.` when a dot remains (www.example.com == example.com, but
  *     `www.com` keeps its name);
  *  3. drop the scheme's default port (http:80, https:443) — any other
  *     port is identity-bearing and stays;
  *  4. drop tracking parameters (`utm_*` prefix + the usual click-id
  *     keys), sort the surviving `k=v` pairs bytewise (query-order
  *     variance is almost never semantic; sites where it is lose a
  *     little recall, never correctness of what IS merged);
  *  5. empty path becomes `/`; trailing slashes strip down to the root
  *     slash; path/query CASE is preserved (paths are case-sensitive
  *     by spec — only scheme/host fold).
  * URLs without a `://` scheme pass through steps 1 only (opaque ids —
  * never guessed at).
  *
  * Registered domain: last two host labels, or three when the 2-label
  * tail is a known multi-label public suffix (`co.uk`-style; the
  * built-in set covers the high-traffic tails — the full Public Suffix
  * List is a data file a deployment can ship, this heuristic is the
  * documented offline default). IP literals return themselves.
  *
  * Scale story: ONE single-pass scalar parse per row (no regex, no
  * allocation beyond the parts), exposed as a struct-returning UDF so
  * canonical/host/domain all come from the same parse; zero shuffle.
  * URL dedup then rides the exact-dedup path: hash groupBy on the
  * canonical string with map-side partial aggregation.
  */
object UrlOps {

  /** Query keys that never carry identity: dropped before sorting.
    * Deliberately NOT in this set: `ref`/`referrer` — frequently
    * identity-bearing in the wild (`?ref=<branch>` on git hosting,
    * `?ref=<page>` pagination), so stripping them would merge genuinely
    * distinct pages; only the unambiguous click-/campaign-ids strip.
    */
  private val TrackingKeys: Set[String] = Set(
    "gclid", "fbclid", "msclkid", "dclid", "twclid", "igshid", "mc_eid",
    "mc_cid", "yclid", "wbraid", "gbraid", "ref_src", "ref_url",
    "spm", "_hsenc", "_hsmi", "s_kwcid")

  private def isTrackingKey(key: String): Boolean =
    key.startsWith("utm_") || TrackingKeys.contains(key)

  /** Multi-label public suffixes the registered-domain heuristic takes
    * THREE labels for (high-traffic subset of the PSL; see module doc).
    * [[Psl.builtin]] compiles exactly this set — a deployment loads the
    * full list with [[Psl.parse]] and passes it to the psl overloads.
    */
  private[ext] val MultiLabelSuffixes: Set[String] = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "com.mx", "com.ar", "com.co", "com.pe", "com.ve",
    "com.cn", "net.cn", "org.cn", "gov.cn", "com.tw", "com.hk",
    "co.in", "net.in", "org.in", "co.kr", "or.kr",
    "com.sg", "com.my", "co.id", "co.th", "com.vn",
    "co.za", "com.ng", "com.eg", "com.tr", "com.sa",
    "com.pl", "com.ua", "com.ru")

  final case class UrlParts(canonical: String, host: String,
                            registeredDomain: String)

  private[ext] def asciiLower(s: String): String = {
    // locale-independent fold (String.toLowerCase("tr") would dot the I)
    var i = 0
    var needs = false
    while (i < s.length && !needs) {
      val c = s.charAt(i)
      if (c >= 'A' && c <= 'Z') needs = true
      i += 1
    }
    if (!needs) s
    else {
      val b = new java.lang.StringBuilder(s.length)
      i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        b.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
        i += 1
      }
      b.toString
    }
  }

  private def isDigits(s: String, from: Int): Boolean = {
    if (from >= s.length) return false
    var i = from
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < '0' || c > '9') return false
      i += 1
    }
    true
  }

  /** The one-pass parse (see module doc for the canonical-form rules). */
  def parse(raw: String): UrlParts = parse(raw, Psl.builtin)

  /** [[parse]] with a loaded Public Suffix List driving the
    * registered-domain resolution (see [[Psl]]; the default overload
    * uses [[Psl.builtin]] — identical behavior to pre-PSL rounds).
    */
  def parse(raw: String, psl: Psl): UrlParts = {
    if (raw == null) return UrlParts(null, null, null)
    var s = raw.trim
    val hash = s.indexOf('#')
    if (hash >= 0) s = s.substring(0, hash)
    val sep = s.indexOf("://")
    if (sep <= 0) return UrlParts(s, "", "")
    val scheme = asciiLower(s.substring(0, sep))
    val rest = s.substring(sep + 3)
    var authEnd = rest.length
    var i = 0
    while (i < authEnd) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?') { authEnd = i } else i += 1
    }
    var authority = rest.substring(0, authEnd)
    val tail = rest.substring(authEnd) // starts with '/' or '?', or empty
    val at = authority.lastIndexOf('@')
    if (at >= 0) authority = authority.substring(at + 1)
    // host vs port: bracketed IPv6 first, else a trailing all-digit :port
    var host: String = null
    var port: String = ""
    if (authority.startsWith("[")) {
      val close = authority.indexOf(']')
      if (close < 0) { host = authority }
      else {
        host = authority.substring(0, close + 1)
        val after = authority.substring(close + 1)
        if (after.startsWith(":") && isDigits(after, 1))
          port = after.substring(1)
      }
    } else {
      val colon = authority.lastIndexOf(':')
      if (colon >= 0 && isDigits(authority, colon + 1)) {
        host = authority.substring(0, colon)
        port = authority.substring(colon + 1)
      } else host = authority
    }
    host = normalizeHost(host)
    val keepPort =
      port.nonEmpty &&
        !((scheme == "http" && port == "80") ||
          (scheme == "https" && port == "443"))
    // path / query
    val q = tail.indexOf('?')
    var path = if (q >= 0) tail.substring(0, q) else tail
    val query = if (q >= 0) tail.substring(q + 1) else ""
    if (path.isEmpty) path = "/"
    else {
      var end = path.length
      while (end > 1 && path.charAt(end - 1) == '/') end -= 1
      path = path.substring(0, end)
    }
    val keptParams: Array[String] =
      if (query.isEmpty) Array.empty
      else {
        val parts = query.split("&", -1)
        val kept = new scala.collection.mutable.ArrayBuffer[String](parts.length)
        var j = 0
        while (j < parts.length) {
          val p = parts(j)
          if (p.nonEmpty) {
            val eq = p.indexOf('=')
            val key = if (eq >= 0) p.substring(0, eq) else p
            if (!isTrackingKey(key)) kept += p
          }
          j += 1
        }
        val arr = kept.toArray
        java.util.Arrays.sort(arr, java.util.Comparator.naturalOrder[String]())
        arr
      }
    val b = new java.lang.StringBuilder(s.length)
    b.append(scheme).append("://").append(host)
    if (keepPort) b.append(':').append(port)
    b.append(path)
    if (keptParams.nonEmpty) {
      b.append('?')
      var j = 0
      while (j < keptParams.length) {
        if (j > 0) b.append('&')
        b.append(keptParams(j))
        j += 1
      }
    }
    UrlParts(b.toString, host, registeredDomainOf(host, psl))
  }

  /** THE host canonicalization (ASCII fold + one `www.` strip when a
    * dot remains) — the single definition [[parse]] and every surface
    * that joins ON host (e.g. [[RobotsTxt.filterAllowed]]'s robots key)
    * must share, or as-fetched host keys silently fail to join.
    */
  def normalizeHost(host: String): String = {
    if (host == null) return null
    var h = asciiLower(host.trim)
    if (h.startsWith("www.") && h.indexOf('.', 4) >= 0) h = h.substring(4)
    h
  }

  private val normalizeHostUdf = udf { h: String => normalizeHost(h) }

  /** Column form of [[normalizeHost]]. */
  def hostKey(host: Column): Column = normalizeHostUdf(host)

  /** Registered domain of a (lowercased) host — see module doc. */
  def registeredDomainOf(host: String): String =
    registeredDomainOf(host, Psl.builtin)

  /** [[registeredDomainOf]] under a loaded PSL: public suffix by the
    * published algorithm (exceptions prevail, longest match, implicit
    * `*` fallback), registered domain = suffix + one label. A host that
    * IS a public suffix (or an IP literal) returns itself.
    */
  def registeredDomainOf(host: String, psl: Psl): String = {
    if (host == null || host.isEmpty) return ""
    if (host.startsWith("[")) return host // IPv6 literal
    val labels = host.split('.')
    if (labels.forall(l => isDigits(l, 0))) return host // IPv4 / numeric
    val ps = psl.publicSuffixLabels(labels)
    if (labels.length <= ps + 1) return host
    labels.takeRight(ps + 1).mkString(".")
  }

  private val parseUdf = udf { raw: String =>
    val p = parse(raw)
    (p.canonical, p.host, p.registeredDomain)
  }

  private val partsStructType =
    "struct<canonical:string,host:string,registered_domain:string>"

  /** Struct column `(canonical, host, registered_domain)` — ONE parse
    * per row feeding all three outputs (select fields off this rather
    * than calling three scalar functions).
    */
  def urlParts(url: Column): Column =
    parseUdf(url).cast(partsStructType)

  /** [[urlParts]] under a loaded PSL — the instance rides the task
    * closure (a compiled full list is a few hundred KB; see [[Psl]]).
    */
  def urlParts(url: Column, psl: Psl): Column = {
    val u = udf { raw: String =>
      val p = parse(raw, psl)
      (p.canonical, p.host, p.registeredDomain)
    }
    u(url).cast(partsStructType)
  }

  /** Canonical dedup key of a URL column (see module doc for the form). */
  def canonicalUrl(url: Column): Column = urlParts(url).getField("canonical")

  /** URL-level dedup: keep the FIRST row per canonical URL by `orderCol`
    * — deterministic when `orderCol` is globally unique (an id or
    * ingest sequence; with duplicates the winner among tied rows is
    * engine-chosen). Rows with no canonicalizable URL (null, or blank
    * after trim) pass through UNdeduped — "unknown URL" is not an
    * identity, and grouping them would silently collapse unrelated
    * documents into one survivor; they ride the same pass keyed on a
    * NUL-prefixed `orderCol` (NUL cannot appear in a canonical form),
    * so the whole operator stays ONE scan + ONE shuffle. The
    * exact-dedup idiom otherwise: hash groupBy on the canonical key —
    * min-by aggregation, map-side partial, never a window over the
    * corpus.
    */
  def dedupByUrl(df: DataFrame, urlCol: String,
                 orderCol: String): DataFrame =
    dedupByKeyExpr(df, canonicalUrl(col(urlCol)), orderCol, "dedupByUrl")

  /** The shared first-wins keyed-dedup core of [[dedupByUrl]] and
    * [[dedupByCanonicalUrl]]: hash groupBy on `keyExpr` with min_by —
    * map-side partial, ONE shuffle, never a window over the corpus.
    */
  private def dedupByKeyExpr(df: DataFrame, keyExpr: Column,
                             orderCol: String, opName: String): DataFrame = {
    // a null order value has no place in first-wins dedup: min_by skips
    // null ordinals (a lone null-ord row would come back as a null
    // struct) and the keyless fallback key would go null and merge
    // unrelated rows -- refuse the ROW loudly instead of losing it
    val ordSafe = coalesce(col(orderCol),
      raise_error(lit(s"$opName: null $orderCol -- the order column " +
        "must be non-null (and unique) for first-wins dedup"))
        .cast(df.schema(orderCol).dataType))
    val keyed = df.withColumn("__canon", keyExpr)
      .withColumn("__ord", ordSafe)
    val hasKey = col("__canon").isNotNull && col("__canon") =!= ""
    val groupKey = when(hasKey, col("__canon"))
      .otherwise(concat(lit("\u0000"), col("__ord").cast("string")))
    keyed
      .groupBy(groupKey.as("__key"))
      .agg(min_by(struct(df.columns.map(col).toIndexedSeq: _*),
        col("__ord")).as("__row"))
      .select(col("__row.*"))
  }

  // ---------------------------------------------------------------------
  // RFC 3986 reference resolution + page-declared canonical dedup (r19)
  // ---------------------------------------------------------------------

  private final case class UriRef(scheme: String, authority: String,
                                  path: String, query: String)

  /** Split a (fragment-stripped) URI reference into RFC 3986 components;
    * `scheme`/`authority`/`query` are null when ABSENT (an empty present
    * query keeps ""), which is what the resolution algorithm branches on.
    */
  private def splitRef(s: String): UriRef = {
    var rest = s
    var scheme: String = null
    // scheme = ALPHA *( ALPHA / DIGIT / "+" / "-" / "." ) ":" — and it
    // must come before any '/' or '?' (a colon inside a relative path
    // segment or query is not a scheme)
    val colon = rest.indexOf(':')
    if (colon > 0) {
      var ok = rest.charAt(0).isLetter
      var k = 1
      while (ok && k < colon) {
        val c = rest.charAt(k)
        ok = c.isLetterOrDigit || c == '+' || c == '-' || c == '.'
        k += 1
      }
      val slash = rest.indexOf('/')
      val qm = rest.indexOf('?')
      if (ok && (slash < 0 || colon < slash) && (qm < 0 || colon < qm)) {
        scheme = asciiLower(rest.substring(0, colon))
        rest = rest.substring(colon + 1)
      }
    }
    var authority: String = null
    if (rest.startsWith("//")) {
      var end = 2
      while (end < rest.length && rest.charAt(end) != '/' &&
        rest.charAt(end) != '?') end += 1
      authority = rest.substring(2, end)
      rest = rest.substring(end)
    }
    val q = rest.indexOf('?')
    val path = if (q >= 0) rest.substring(0, q) else rest
    val query = if (q >= 0) rest.substring(q + 1) else null
    UriRef(scheme, authority, path, query)
  }

  /** RFC 3986 §5.2.4 remove_dot_segments, output-buffer formulation:
    * `.`/`..` segments apply and vanish; a trailing `.`/`..` leaves a
    * trailing slash, exactly as the spec's string rewriting does.
    */
  private def removeDotSegments(path: String): String = {
    if (path.isEmpty || path.indexOf('.') < 0) return path
    val abs = path.startsWith("/")
    val segs = path.split("/", -1)
    val out = new scala.collection.mutable.ArrayBuffer[String]
    var trailingSlash = false
    var i = if (abs) 1 else 0
    val last = segs.length - 1
    while (i <= last) {
      segs(i) match {
        case "." => trailingSlash = true
        case ".." =>
          if (out.nonEmpty) out.remove(out.length - 1)
          trailingSlash = true
        case seg =>
          // a trailing empty segment is the path's final slash; empty
          // segments MID-path are preserved (RFC 3986 does not collapse
          // "//")
          if (i == last && seg.isEmpty) trailingSlash = true
          else { out += seg; trailingSlash = false }
      }
      i += 1
    }
    val b = new java.lang.StringBuilder
    if (abs) b.append('/')
    b.append(out.mkString("/"))
    if (trailingSlash && (b.length == 0 || b.charAt(b.length - 1) != '/'))
      b.append('/')
    b.toString
  }

  /** RFC 3986 §5.2.3 merge: a base WITH an authority and an empty path
    * gives "/" + ref; otherwise ref replaces everything after the base
    * path's last '/'.
    */
  private def mergePaths(base: UriRef, refPath: String): String =
    if (base.authority != null && base.path.isEmpty) "/" + refPath
    else {
      val slash = base.path.lastIndexOf('/')
      if (slash < 0) refPath else base.path.substring(0, slash + 1) + refPath
    }

  /** Resolve `ref` against `base` per RFC 3986 §5.2.2 (strict: an
    * absolute ref wins outright, a network-path ref takes the base
    * scheme, path refs merge + remove_dot_segments, an empty ref is the
    * base). Fragments strip from both — a dedup key never carries one.
    * Null/blank base returns the ref unchanged; never guessed at.
    */
  def resolve(base: String, ref: String): String = {
    if (ref == null) return base
    def stripFragment(s: String): String = {
      val h = s.indexOf('#')
      if (h >= 0) s.substring(0, h) else s
    }
    val r = stripFragment(ref.trim)
    if (base == null || base.trim.isEmpty) return r
    val b = splitRef(stripFragment(base.trim))
    val rr = splitRef(r)
    val t: UriRef =
      if (rr.scheme != null)
        UriRef(rr.scheme, rr.authority, removeDotSegments(rr.path), rr.query)
      else if (rr.authority != null)
        UriRef(b.scheme, rr.authority, removeDotSegments(rr.path), rr.query)
      else if (rr.path.isEmpty)
        UriRef(b.scheme, b.authority, b.path,
          if (rr.query != null) rr.query else b.query)
      else if (rr.path.startsWith("/"))
        UriRef(b.scheme, b.authority, removeDotSegments(rr.path), rr.query)
      else
        UriRef(b.scheme, b.authority,
          removeDotSegments(mergePaths(b, rr.path)), rr.query)
    val out = new java.lang.StringBuilder
    if (t.scheme != null) out.append(t.scheme).append(':')
    if (t.authority != null) out.append("//").append(t.authority)
    out.append(t.path)
    if (t.query != null) out.append('?').append(t.query)
    out.toString
  }

  /** The page-declared canonical dedup KEY of one (fetch URL, HTML) row
    * — the crawl idiom [[HtmlText.PageMeta]] documents: the first
    * `<link rel=canonical>` href when present, resolved against the
    * effective base (`<base href>` itself resolved against the fetch
    * URL first, per the HTML5 base-URL rules, so RELATIVE canonicals
    * work), else the fetch URL; then [[parse]]'s canonical form either
    * way.
    */
  def canonicalDedupKey(fetchUrl: String, html: String,
                        psl: Psl = Psl.builtin): String = {
    val meta = HtmlText.pageMeta(html)
    val effectiveBase = meta.baseHref match {
      case Some(bh) => resolve(fetchUrl, bh)
      case None     => fetchUrl
    }
    val target = meta.canonicalHref match {
      case Some(href) => resolve(effectiveBase, href)
      case None       => fetchUrl
    }
    if (target == null) null else parse(target, psl).canonical
  }

  /** URL dedup composing the page-declared canonical ([[HtmlText]]'s
    * `<link rel=canonical>`): rows whose pages declare one canonical
    * collapse to one survivor even when their FETCH URLs differ in
    * identity-bearing ways (session params, mirror paths) that plain
    * [[dedupByUrl]] must preserve. Key = [[canonicalDedupKey]]; rows
    * with neither a canonicalizable URL nor a declared canonical pass
    * through undeduped on the same NUL-prefixed fallback. Same scale
    * shape as [[dedupByUrl]]: one scalar pass (pageMeta + parse per
    * row), ONE shuffle, min_by first-wins.
    */
  def dedupByCanonicalUrl(df: DataFrame, urlCol: String, htmlCol: String,
                          orderCol: String,
                          psl: Psl = Psl.builtin): DataFrame = {
    val keyUdf = udf { (url: String, html: String) =>
      canonicalDedupKey(url, html, psl)
    }
    dedupByKeyExpr(df, keyUdf(col(urlCol), col(htmlCol)), orderCol,
      "dedupByCanonicalUrl")
  }
}
