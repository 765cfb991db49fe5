package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] robots.txt exclusion screening (RFC 9309) — the compliance
  * filter a crawl-derived training corpus applies before anything else:
  * pages the site operator disallowed for your agent are dropped, by
  * policy, whatever their content quality. Re-checking at curation time
  * (not just fetch time) matters because corpora are assembled from
  * archives crawled by OTHER agents under OTHER policies.
  *
  * Semantics implemented (all RFC 9309):
  *  - groups of `User-agent` lines followed by `Allow`/`Disallow` rules;
  *    adjacent user-agent lines share one group; repeated groups for the
  *    same agent MERGE;
  *  - agent selection: the group whose user-agent token is the LONGEST
  *    case-insensitive substring of the caller's agent; `*` is the
  *    fallback (specificity 0);
  *  - rule matching: patterns match a PREFIX of the URI path+query,
  *    `*` matches any octet sequence, a trailing `$` anchors the end;
  *  - precedence: the matching rule with the LONGEST pattern wins;
  *    an allow/disallow tie at equal length resolves to ALLOW;
  *  - no matching rule, an empty `Disallow:`, or no robots.txt at all
  *    -> allowed; unknown directives (`crawl-delay`, `sitemap`, ...)
  *    are ignored; `#` comments strip; field names are case-insensitive.
  *
  * Scale story: the corpus joins robots bodies BY HOST (one hash join —
  * robots rows are per-domain, orders of magnitude smaller than the
  * corpus), then a zero-shuffle scalar pass evaluates each row; parsed
  * rule sets memoize per executor (bounded, keyed by content digest) so
  * a host's body parses once per task stream, not once per document.
  */
object RobotsTxt {

  final case class Rule(allow: Boolean, pattern: String)

  /** The merged rule set selected for one user agent. */
  final case class Rules(rules: Vector[Rule]) {
    def isAllowed(pathAndQuery: String): Boolean = {
      var bestLen = -1
      var bestAllow = true
      var i = 0
      while (i < rules.length) {
        val r = rules(i)
        if (patternMatches(r.pattern, pathAndQuery)) {
          val len = r.pattern.length
          // longest pattern wins; at equal length allow beats disallow
          if (len > bestLen || (len == bestLen && r.allow)) {
            bestLen = len
            bestAllow = r.allow
          }
        }
        i += 1
      }
      bestLen < 0 || bestAllow
    }
  }

  /** RFC 9309 pattern match against the path+query: the pattern must
    * cover a PREFIX of the path (`*` = any octets); a trailing `$`
    * anchors the whole path. A `$` anywhere else is literal.
    */
  def patternMatches(pattern: String, pathAndQuery: String): Boolean =
    if (pattern.endsWith("$"))
      globFull(pattern.substring(0, pattern.length - 1), pathAndQuery)
    else globFull(pattern + "*", pathAndQuery)

  /** Classic two-pointer glob (only `*` is special): full match. */
  private def globFull(pat: String, s: String): Boolean = {
    var p = 0
    var i = 0
    var starP = -1
    var starI = 0
    while (i < s.length) {
      if (p < pat.length && pat.charAt(p) == '*') {
        starP = p; p += 1; starI = i
      } else if (p < pat.length && pat.charAt(p) == s.charAt(i)) {
        p += 1; i += 1
      } else if (starP >= 0) {
        starI += 1; i = starI; p = starP + 1
      } else return false
    }
    while (p < pat.length && pat.charAt(p) == '*') p += 1
    p == pat.length
  }

  /** Parse a robots.txt body and select the rule group for `userAgent`
    * (see module doc). Total on arbitrary text — malformed lines are
    * ignored, per the RFC's error tolerance.
    */
  def parse(content: String, userAgent: String = "*"): Rules = {
    if (content == null) return Rules(Vector.empty)
    val uaLower = userAgent.toLowerCase
    // collect (uaToken, rules) groups
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[(String, scala.collection.mutable.ArrayBuffer[Rule])]
    var currentUas = List.empty[String]
    var inUaRun = false // consecutive user-agent lines extend one group
    content.split("\r?\n").foreach { raw =>
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (!inUaRun) currentUas = Nil
            inUaRun = true
            currentUas = value.toLowerCase :: currentUas
          case "allow" | "disallow" =>
            if (inUaRun) {
              // the UA run just ended: materialize one group per token
              currentUas.foreach { ua =>
                groups += ((ua, scala.collection.mutable.ArrayBuffer.empty[Rule]))
              }
              inUaRun = false
            }
            // empty value = "no rule" per the RFC (a bare Disallow:
            // means everything is allowed, not a match-nothing rule)
            if (value.nonEmpty && currentUas.nonEmpty) {
              val rule = Rule(field == "allow", value)
              groups.takeRight(currentUas.length).foreach(_._2 += rule)
            }
          case _ => () // crawl-delay, sitemap, unknown: ignored
        }
      }
    }
    // agent selection: longest UA token that is a substring of ours;
    // '*' is the 0-specificity fallback
    def specificity(ua: String): Int =
      if (ua == "*") 0
      else if (uaLower.contains(ua) && ua.nonEmpty) ua.length
      else -1
    val best = groups.iterator.map(g => specificity(g._1)).foldLeft(-1)(math.max)
    if (best < 0) return Rules(Vector.empty)
    Rules(groups.iterator
      .filter(g => specificity(g._1) == best)
      .flatMap(_._2)
      .toVector)
  }

  /** The URI path+query robots rules match against (raw, NOT the
    * canonical form — matching is on what the server was asked for).
    * Scheme-less or host-less strings return themselves ("/"-prefixed
    * inputs pass through).
    */
  def pathAndQueryOf(url: String): String = {
    if (url == null) return "/"
    var s = url.trim
    val hash = s.indexOf('#')
    if (hash >= 0) s = s.substring(0, hash)
    val sep = s.indexOf("://")
    if (sep > 0) {
      var i = sep + 3
      while (i < s.length && s.charAt(i) != '/' && s.charAt(i) != '?') i += 1
      s = s.substring(i)
    }
    if (s.isEmpty) "/" else if (s.charAt(0) == '?') "/" + s else s
  }

  // per-executor parse memo: robots bodies repeat per host across a
  // task's rows — bounded, cleared when full (the Bpe memo discipline).
  // Keyed by the (agent, body) strings directly: a lookup costs one
  // String hash of the body, not an MD5 + hex format per row
  private val memoCap = 512
  private final case class MemoKey(userAgent: String, body: String)
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[MemoKey, Rules]()

  private def parseCached(content: String, userAgent: String): Rules = {
    val key = MemoKey(userAgent, content)
    val hit = memo.get(key)
    if (hit != null) hit
    else {
      val parsed = parse(content, userAgent)
      if (memo.size >= memoCap) memo.clear()
      memo.put(key, parsed)
      parsed
    }
  }

  /** Drop the rows of `docs` whose URL the host's robots.txt disallows
    * for `userAgent`. `robots` carries one row per host
    * (`hostCol`, `robotsCol` = the raw robots.txt body); hosts with no
    * robots row allow everything. ONE hash join on the host (the
    * robots side is per-domain — orders of magnitude smaller than the
    * corpus) + a zero-shuffle scalar evaluation pass.
    */
  def filterAllowed(docs: DataFrame, urlCol: String, robots: DataFrame,
                    hostCol: String = "host",
                    robotsCol: String = "robots_txt",
                    userAgent: String = "*"): DataFrame = {
    val allowedUdf = udf { (url: String, body: String) =>
      body == null ||
        parseCached(body, userAgent).isAllowed(pathAndQueryOf(url))
    }
    val host = UrlOps.urlParts(col(urlCol)).getField("host")
    docs
      .withColumn("__host", host)
      // the robots key rides the SAME host canonicalization the doc
      // side gets from urlParts (fold + www-strip) — an as-fetched
      // "WWW.Site.com" robots row must still screen "site.com" docs,
      // or disallowed pages silently bypass the policy filter
      .join(robots.select(UrlOps.hostKey(col(hostCol)).as("__rhost"),
        col(robotsCol).as("__robots")),
        col("__host") === col("__rhost"), "left")
      .filter(allowedUdf(col(urlCol), col("__robots")))
      .drop("__host", "__rhost", "__robots")
  }
}
