package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** robots.txt screening (r18): the RFC 9309 battery — group selection,
  * longest-match precedence, wildcard/anchor patterns, error tolerance —
  * plus the corpus-level filter semantics.
  */
class RobotsTxtSpec extends AnyFunSuite with SharedSpark {
  import RobotsTxt._

  test("pattern matching: prefix, '*', '$', literal '$' elsewhere") {
    assert(patternMatches("/private/", "/private/page"))
    assert(!patternMatches("/private/", "/privateer")) // no partial segment
    assert(patternMatches("/private", "/privateer")) // prefix IS the rule
    assert(patternMatches("/*.pdf$", "/docs/file.pdf"))
    assert(!patternMatches("/*.pdf$", "/docs/file.pdf?x=1")) // $ anchors
    assert(patternMatches("/*.pdf", "/docs/file.pdf?x=1")) // no anchor
    assert(patternMatches("/a/*/c", "/a/b/c"))
    assert(patternMatches("/a/*/c", "/a/x/y/c/d")) // '*' spans segments
    assert(!patternMatches("/a/*/c", "/a/b"))
    assert(patternMatches("/a$b", "/a$b/c")) // inner '$' is literal
    assert(patternMatches("/", "/anything"))
    assert(patternMatches("", "/anything")) // empty pattern: universal
  }

  test("precedence: longest pattern wins; ties resolve to allow") {
    val r = parse("User-agent: *\nDisallow: /publ\nAllow: /public\n")
    assert(r.isAllowed("/public/x")) // Allow (7) beats Disallow (6)
    assert(!r.isAllowed("/publx")) // only Disallow matches
    val tie = parse("User-agent: *\nDisallow: /dir/\nAllow: /dir/\n")
    assert(tie.isAllowed("/dir/x")) // equal length: allow wins
    val nested = parse("User-agent: *\nAllow: /a/\nDisallow: /a/b/\n")
    assert(nested.isAllowed("/a/x") && !nested.isAllowed("/a/b/x"))
  }

  test("group selection: longest matching agent token, '*' fallback, merge") {
    val body = "User-agent: graftbot\nDisallow: /bot-only/\n\n" +
      "User-agent: graft\nDisallow: /graft/\n\n" +
      "User-agent: *\nDisallow: /everyone/\n"
    // the most specific substring of the full agent string wins
    assert(!parse(body, "graftbot/1.0").isAllowed("/bot-only/x"))
    assert(parse(body, "graftbot/1.0").isAllowed("/everyone/x"))
    assert(!parse(body, "graft-lite").isAllowed("/graft/x"))
    assert(!parse(body, "otherbot").isAllowed("/everyone/x"))
    // repeated groups for one agent MERGE
    val merged = parse("User-agent: *\nDisallow: /a/\n\n" +
      "User-agent: *\nDisallow: /b/\n")
    assert(!merged.isAllowed("/a/x") && !merged.isAllowed("/b/x") &&
      merged.isAllowed("/c"))
    // adjacent user-agent lines share one group
    val shared = parse("User-agent: a\nUser-agent: b\nDisallow: /x/\n", "b")
    assert(!shared.isAllowed("/x/1"))
  }

  test("error tolerance: comments, case, CRLF, empty disallow, junk lines") {
    val r = parse("# top comment\r\nUSER-AGENT: *  # inline\r\n" +
      "DISALLOW: /secret/\r\nDisallow:\r\nCrawl-delay: 10\r\n" +
      "Sitemap: https://x.example.com/map.xml\r\nnot a directive\r\n")
    assert(!r.isAllowed("/secret/x"))
    assert(r.isAllowed("/open")) // bare Disallow: is NOT match-everything
    // rules before any group are ignored; empty/null bodies allow all
    assert(parse("Disallow: /\nUser-agent: *\nAllow: /").isAllowed("/x"))
    assert(parse("").isAllowed("/x") && parse(null).isAllowed("/x"))
    // an agent with no matching group and no '*' group: allowed
    assert(parse("User-agent: otherbot\nDisallow: /", "me").isAllowed("/x"))
  }

  test("crawl-delay: group-scoped, fractional, junk ignored, max on merge") {
    import spark.implicits._
    // group scoping: the SELECTED group's delay applies, not another's
    val body = "User-agent: graftbot\nCrawl-delay: 10\nDisallow: /x/\n\n" +
      "User-agent: *\nCrawl-delay: 2\n"
    assert(parse(body, "graftbot/1.0").crawlDelay == Some(10.0))
    assert(parse(body, "otherbot").crawlDelay == Some(2.0))
    // rules around the delay line still attach to the same group
    assert(!parse(body, "graftbot/1.0").isAllowed("/x/1"))
    // fractional seconds; junk and negative values ignore; a delay
    // before any group ignores; absent -> None
    assert(parse("User-agent: *\nCrawl-delay: 0.5\n").crawlDelay == Some(0.5))
    assert(parse("User-agent: *\nCrawl-delay: soon\n").crawlDelay.isEmpty)
    assert(parse("User-agent: *\nCrawl-delay: -1\n").crawlDelay.isEmpty)
    assert(parse("Crawl-delay: 9\nUser-agent: *\nDisallow:\n").crawlDelay.isEmpty)
    assert(parse("User-agent: *\nDisallow: /a/\n").crawlDelay.isEmpty)
    // the frame operator: per canonical host, colliding files take the
    // LARGEST declared delay; hosts declaring none drop
    val robots = Seq(
      ("a.example.com", "User-agent: *\nCrawl-delay: 1.5\n"),
      ("b.example.com", "User-agent: *\nDisallow: /\n"),
      ("c.example.com", "User-agent: *\nCrawl-delay: 3\n"),
      ("WWW.c.example.com", "User-agent: *\nCrawl-delay: 7\n")
    ).toDF("host", "robots_txt")
    val out = RobotsTxt.crawlDelays(robots)
      .as[(String, Double)].collect().toMap
    assert(out == Map("a.example.com" -> 1.5, "c.example.com" -> 7.0))
  }

  test("pathAndQueryOf: raw path+query, fragment stripped, bare hosts") {
    assert(pathAndQueryOf("https://h.example.com/a/b?x=1#frag") == "/a/b?x=1")
    assert(pathAndQueryOf("https://h.example.com") == "/")
    assert(pathAndQueryOf("https://h.example.com?q=1") == "/?q=1")
    assert(pathAndQueryOf("/already/path") == "/already/path")
    assert(pathAndQueryOf(null) == "/")
  }

  test("filterAllowed: per-host join, missing robots allows, one scalar pass") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://a.example.com/open/x"),
      (2L, "https://a.example.com/private/x"),
      (3L, "https://b.example.com/anything"),
      (4L, "https://c.example.com/anything"), // no robots row
      (5L, null.asInstanceOf[String]) // null url: host "", no row -> kept
    ).toDF("doc_id", "url")
    val robots = Seq(
      ("a.example.com", "User-agent: *\nDisallow: /private/\n"),
      ("b.example.com", "User-agent: *\nDisallow: /\n")
    ).toDF("host", "robots_txt")
    val kept = RobotsTxt.filterAllowed(docs, "url", robots)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 4L, 5L))
    // robots keys ride the SAME host canonicalization as the doc side:
    // an as-fetched "WWW.A.Example.com" row must still screen the
    // www-stripped lowercase doc host — anything else silently bypasses
    // the policy filter
    val rawKeyed = Seq(
      ("WWW.A.Example.com", "User-agent: *\nDisallow: /private/\n")
    ).toDF("host", "robots_txt")
    val kept2 = RobotsTxt.filterAllowed(docs, "url", rawKeyed)
      .select("doc_id").as[Long].collect().sorted
    assert(kept2.toSeq == Seq(1L, 3L, 4L, 5L)) // doc 2 screened out
    // schema untouched (helper columns dropped)
    assert(RobotsTxt.filterAllowed(docs, "url", robots).columns.toSeq ==
      Seq("doc_id", "url"))
  }

  test("policies parse once per distinct host, not per corpus row (r19)") {
    import spark.implicits._
    // 5000 doc rows over 40 hosts, shuffled ordering (repartition by a
    // hash of the id so host runs are broken up — the memo-unfriendly
    // case the pre-parse design is immune to)
    val docs = (0L until 5000L).map { i =>
      (i, s"https://h${i % 40}.example.com/p/$i")
    }.toDF("doc_id", "url").repartition(16, expr("hash(doc_id)"))
    val robots = (0 until 40).map { h =>
      (s"h$h.example.com", s"User-agent: *\nDisallow: /private$h/\n")
    }.toDF("host", "robots_txt")
    val before = RobotsTxt.preParseCount.sum()
    val n = RobotsTxt.filterAllowed(docs, "url", robots).count()
    assert(n == 5000L)
    val parses = RobotsTxt.preParseCount.sum() - before
    assert(parses == 40L,
      s"expected one parse per distinct host (40), got $parses")
  }

  test("colliding canonical host keys merge bodies, never duplicate rows") {
    import spark.implicits._
    // www.site.com and site.com both canonicalize to site.com — two
    // legitimate rows colliding on the join key. The merged policy is
    // the RFC group-merge of BOTH files: /a/ (from apex) and /b/ (from
    // www) are each disallowed; and every doc row appears exactly once.
    val docs = Seq(
      (1L, "https://site.com/a/x"),
      (2L, "https://www.site.com/b/x"),
      (3L, "https://site.com/c/x")
    ).toDF("doc_id", "url")
    val robots = Seq(
      ("site.com", "User-agent: *\nDisallow: /a/\n"),
      ("www.site.com", "User-agent: *\nDisallow: /b/\n")
    ).toDF("host", "robots_txt")
    val out = RobotsTxt.filterAllowed(docs, "url", robots)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(3L), s"merged policy screens /a/ and /b/: $out")
    // row-count invariant under collision: an allowed doc row is not
    // duplicated by the join however many robots rows collide
    val dup = RobotsTxt.filterAllowed(
      Seq((7L, "https://site.com/c/y")).toDF("doc_id", "url"),
      "url", robots)
    assert(dup.count() == 1L)
    // CROSS-FILE conflicts resolve conservatively (r20): each file's
    // selected rules evaluate independently and every colliding file
    // must allow — one file disallowing /p/ screens the URL even when
    // the other allows it (a compliance filter never underblocks on a
    // host-key collision)
    val conflict = Seq(
      ("site.com", "User-agent: *\nDisallow: /p/\n"),
      ("www.site.com", "User-agent: *\nAllow: /p/\n")
    ).toDF("host", "robots_txt")
    val kept = RobotsTxt.filterAllowed(
      Seq((9L, "https://site.com/p/z")).toDF("doc_id", "url"),
      "url", conflict)
    assert(kept.count() == 0L,
      "cross-file disallow must win — rule-set union would underblock")
    // the underblocking shape a flattened union gets wrong: a LONGER
    // Allow from one file must not override the other file's Disallow
    val underblock = Seq(
      ("site.com", "User-agent: *\nDisallow: /private\n"),
      ("www.site.com", "User-agent: *\nAllow: /private/public\n")
    ).toDF("host", "robots_txt")
    val ubDocs = Seq(
      (1L, "https://site.com/private/public/x"),
      (2L, "https://site.com/open")
    ).toDF("doc_id", "url")
    val ubKept = RobotsTxt.filterAllowed(ubDocs, "url", underblock)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ubKept == Seq(2L),
      s"site.com's Disallow /private must screen doc 1, kept $ubKept")
    // group selection is PER FILE: a colliding file whose only group
    // is '*' still screens an agent the other file names specifically
    // (body concatenation would let the specific group mask it)
    val mask = Seq(
      ("site.com", "User-agent: graftbot\nDisallow: /x/\n"),
      ("www.site.com", "User-agent: *\nDisallow: /y/\n")
    ).toDF("host", "robots_txt")
    val maskedDocs = Seq(
      (1L, "https://site.com/x/a"),
      (2L, "https://site.com/y/a"),
      (3L, "https://site.com/z/a")
    ).toDF("doc_id", "url")
    val maskKept = RobotsTxt.filterAllowed(maskedDocs, "url", mask,
        userAgent = "graftbot/1.0")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(maskKept == Seq(3L),
      s"both files' selected groups must screen, kept $maskKept")
  }
}
