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
  * Scale story (r19): the robots side aggregates to ONE row per
  * canonical host and parses ONCE per host into a compact encoded-rule
  * column (parse count = distinct hosts — never corpus rows, never
  * dependent on row clustering); the corpus then hash-joins that
  * pre-parsed table BY HOST (robots rows are per-domain, orders of
  * magnitude smaller than the corpus) and a zero-shuffle scalar pass
  * evaluates each row against its host's ready rules.
  */
object RobotsTxt {

  final case class Rule(allow: Boolean, pattern: String)

  /** The merged rule set selected for one user agent; `crawlDelay` is
    * the group's `Crawl-delay:` seconds when declared (the de-facto
    * politeness extension — RFC 9309 leaves it unstandardized; of the
    * selected groups the LARGEST declared delay wins, the conservative
    * direction for a politeness setting).
    */
  final case class Rules(rules: Vector[Rule],
                         crawlDelay: Option[Double] = None) {
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
  /** Lex a robots.txt body into (field-lowercased, value) directive
    * pairs: `#` comments strip, lines trim, fieldless lines drop — the
    * ONE robots line lexer [[parse]] and [[Sitemaps.fromRobots]] share
    * (two lexers for one format would drift on tolerance rules).
    */
  private[ext] def directives(content: String): Iterator[(String, String)] =
    content.split("\r?\n").iterator.flatMap { raw =>
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
      val colon = line.indexOf(':')
      if (colon > 0)
        Iterator.single((line.substring(0, colon).trim.toLowerCase,
          line.substring(colon + 1).trim))
      else Iterator.empty
    }

  private final class Group(val ua: String) {
    val rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var delay: Option[Double] = None
  }

  def parse(content: String, userAgent: String = "*"): Rules = {
    if (content == null) return Rules(Vector.empty)
    val uaLower = userAgent.toLowerCase
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var currentUas = List.empty[String]
    var inUaRun = false // consecutive user-agent lines extend one group
    def closeUaRun(): Unit =
      if (inUaRun) {
        // the UA run just ended: materialize one group per token
        currentUas.foreach(ua => groups += new Group(ua))
        inUaRun = false
      }
    directives(content).foreach { case (field, value) =>
      field match {
        case "user-agent" =>
          if (!inUaRun) currentUas = Nil
          inUaRun = true
          currentUas = value.toLowerCase :: currentUas
        case "allow" | "disallow" =>
          closeUaRun()
          // empty value = "no rule" per the RFC (a bare Disallow:
          // means everything is allowed, not a match-nothing rule)
          if (value.nonEmpty && currentUas.nonEmpty) {
            val rule = Rule(field == "allow", value)
            groups.takeRight(currentUas.length).foreach(_.rules += rule)
          }
        case "crawl-delay" =>
          // the de-facto politeness extension: seconds (fractions
          // allowed), attached to the enclosing group; junk values
          // are ignored, per the robots error-tolerance discipline
          closeUaRun()
          if (currentUas.nonEmpty) {
            val secs =
              try {
                val v = value.toDouble
                if (java.lang.Double.isFinite(v) && v >= 0) Some(v) else None
              } catch { case _: NumberFormatException => None }
            if (secs.nonEmpty)
              groups.takeRight(currentUas.length).foreach(_.delay = secs)
          }
        case _ => () // sitemap, unknown: ignored
      }
    }
    // agent selection: longest UA token that is a substring of ours;
    // '*' is the 0-specificity fallback
    def specificity(ua: String): Int =
      if (ua == "*") 0
      else if (uaLower.contains(ua) && ua.nonEmpty) ua.length
      else -1
    val best = groups.iterator.map(g => specificity(g.ua)).foldLeft(-1)(math.max)
    if (best < 0) return Rules(Vector.empty)
    val selected = groups.filter(g => specificity(g.ua) == best)
    Rules(selected.iterator.flatMap(_.rules).toVector,
      selected.iterator.flatMap(_.delay).maxOption)
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

  // selected-rule wire encoding for the pre-parsed join column: one
  // string per rule, '+' prefix = allow, '-' = disallow (a pattern
  // never starts with either marker's MEANING — the prefix is always
  // consumed first, so any pattern byte sequence round-trips)
  private def encodeRules(r: Rules): Array[String] =
    r.rules.iterator.map(rl => (if (rl.allow) "+" else "-") + rl.pattern)
      .toArray

  private def decodedIsAllowed(encoded: scala.collection.Seq[String],
                               pathAndQuery: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < encoded.length) {
      val e = encoded(i)
      val allow = e.charAt(0) == '+'
      val pattern = e.substring(1)
      if (patternMatches(pattern, pathAndQuery)) {
        val len = pattern.length
        if (len > bestLen || (len == bestLen && allow)) {
          bestLen = len
          bestAllow = allow
        }
      }
      i += 1
    }
    bestLen < 0 || bestAllow
  }

  /** Robots-side parse counter — instrumentation for the "parse once
    * per distinct host" contract (`RobotsTxtSpec` reads it); counts
    * only [[filterAllowed]]'s pre-parse UDF calls, not direct
    * [[parse]] use.
    */
  private[ext] val preParseCount = new java.util.concurrent.atomic.LongAdder

  /** Drop the rows of `docs` whose URL the host's robots.txt disallows
    * for `userAgent`. `robots` carries (`hostCol`, `robotsCol` = the
    * raw robots.txt body) rows; hosts with no robots row allow
    * everything.
    *
    * Shape (r19, conflict rule tightened r20): the robots side first
    * AGGREGATES to one row per canonical host key — distinct rows that
    * collide after canonicalization (`www.site.com` vs `site.com`,
    * which CAN serve different robots.txt) merge by parsing EACH body
    * separately (per-file RFC 9309 agent-group selection — a file
    * whose only group is `*` still screens an agent another file names
    * specifically) and evaluating each file's selected rules
    * INDEPENDENTLY: a URL passes only when EVERY colliding file allows
    * it. Unioning the rule sets instead would let one file's longer
    * Allow pattern override another file's Disallow under
    * longest-match — underblocking, the unsafe direction for a
    * compliance filter. Within one file the RFC precedence is
    * unchanged (longest match, allow wins ties). Deterministic
    * whatever the row order, and never a silent row duplication
    * through the join. The per-host parse happens ONCE into a compact
    * encoded per-file rule column carried through the join — parse
    * count = robots rows, not corpus rows. ONE hash join on the host +
    * a zero-shuffle scalar evaluation pass per doc row.
    */
  def filterAllowed(docs: DataFrame, urlCol: String, robots: DataFrame,
                    hostCol: String = "host",
                    robotsCol: String = "robots_txt",
                    userAgent: String = "*"): DataFrame = {
    val preParseUdf = udf { bodies: scala.collection.Seq[String] =>
      preParseCount.increment()
      // per-FILE group selection, kept as per-file rule SETS:
      // concatenating the bodies would let one file's specific-agent
      // group mask another file's '*' group (and a dangling
      // User-agent: line would bleed across the file boundary);
      // flattening the selected rules would let one file's longer
      // Allow defeat another's Disallow. A file whose selected group
      // is empty allows everything and drops out of the conjunction.
      bodies.iterator
        .map(b => encodeRules(parse(b, userAgent)))
        .filter(_.nonEmpty)
        .toArray
    }
    val allowedUdf = udf {
      (url: String, fileRules: scala.collection.Seq[scala.collection.Seq[String]]) =>
        fileRules == null || {
          val pq = pathAndQueryOf(url)
          fileRules.forall(rs => decodedIsAllowed(rs, pq))
        }
    }
    // the robots key rides the SAME host canonicalization the doc side
    // gets from urlParts (fold + www-strip) — an as-fetched
    // "WWW.Site.com" robots row must still screen "site.com" docs, or
    // disallowed pages silently bypass the policy filter
    val rulesByHost: DataFrame = robots
      .select(UrlOps.hostKey(col(hostCol)).as("__rhost"),
        col(robotsCol).as("__body"))
      .groupBy("__rhost")
      .agg(sort_array(collect_list(col("__body"))).as("__bodies"))
      .select(col("__rhost"), preParseUdf(col("__bodies")).as("__rules"))
    val host = UrlOps.urlParts(col(urlCol)).getField("host")
    docs
      .withColumn("__host", host)
      .join(rulesByHost, col("__host") === col("__rhost"), "left")
      .filter(allowedUdf(col(urlCol), col("__rules")))
      .drop("__host", "__rhost", "__rules")
  }

  /** The per-host `Crawl-delay` a polite fetcher schedules by:
    * `(host, crawl_delay)` rows for the hosts whose robots.txt declares
    * one for `userAgent` (seconds, fractions allowed; junk values
    * ignored). Same host canonicalization + per-file parse discipline
    * as [[filterAllowed]]; colliding canonical hosts take the LARGEST
    * declared delay — the conservative direction for politeness. One
    * hash groupBy over robots rows, never corpus rows.
    */
  def crawlDelays(robots: DataFrame, hostCol: String = "host",
                  robotsCol: String = "robots_txt",
                  userAgent: String = "*"): DataFrame = {
    val delayUdf = udf { bodies: scala.collection.Seq[String] =>
      bodies.iterator
        .flatMap(b => parse(b, userAgent).crawlDelay)
        .maxOption
    }
    robots
      .select(UrlOps.hostKey(col(hostCol)).as("host"),
        col(robotsCol).as("__body"))
      .groupBy("host")
      .agg(sort_array(collect_list(col("__body"))).as("__bodies"))
      .select(col("host"), delayUdf(col("__bodies")).as("crawl_delay"))
      .filter(col("crawl_delay").isNotNull)
  }
}
