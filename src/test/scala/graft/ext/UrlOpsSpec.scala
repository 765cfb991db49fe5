package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** URL curation (r18): the canonical-form rules over a hand battery of
  * real-world URL shapes, registered-domain extraction across suffix
  * families, plan shape (scalar pass: zero Exchange), and URL-level
  * dedup semantics.
  */
class UrlOpsSpec extends AnyFunSuite with SharedSpark {
  import UrlOps.parse

  test("canonical form: the documented rules, case by case") {
    // tracking strip + sort + fragment + trailing slash + www
    assert(parse("https://www.example.com/a/?utm_source=x&b=2&a=1#frag")
      .canonical == "https://example.com/a?a=1&b=2")
    // scheme/host fold, path case preserved
    assert(parse("HTTPS://EXAMPLE.com/A/B").canonical ==
      "https://example.com/A/B")
    // default ports drop — but only for the matching scheme
    assert(parse("http://example.com:80/x").canonical ==
      "http://example.com/x")
    assert(parse("https://example.com:443/x").canonical ==
      "https://example.com/x")
    assert(parse("http://example.com:443/x").canonical ==
      "http://example.com:443/x")
    assert(parse("https://example.com:8443/x").canonical ==
      "https://example.com:8443/x")
    // userinfo strips
    assert(parse("https://user:pw@example.com/x").canonical ==
      "https://example.com/x")
    // empty path becomes /; trailing slashes collapse to the root slash
    assert(parse("https://example.com").canonical == "https://example.com/")
    assert(parse("https://example.com///").canonical == "https://example.com/")
    // tracking-only query drops the '?' entirely
    assert(parse("https://example.com/x?utm_campaign=y&gclid=z").canonical ==
      "https://example.com/x")
    // empty params vanish; '=' -less params sort with the rest
    assert(parse("https://example.com/x?&&b&a=1").canonical ==
      "https://example.com/x?a=1&b")
    // duplicate keys survive (sorted by the full k=v string)
    assert(parse("https://example.com/x?a=2&a=1").canonical ==
      "https://example.com/x?a=1&a=2")
    // www strips only when a dot remains
    assert(parse("https://www.com/x").canonical == "https://www.com/x")
    assert(parse("https://www.example.com/x").canonical ==
      "https://example.com/x")
    // IPv6 literal host: bracket preserved, port logic intact
    assert(parse("https://[2001:db8::1]:443/x").canonical ==
      "https://[2001:db8::1]/x")
    assert(parse("http://[2001:db8::1]:8080/x").canonical ==
      "http://[2001:db8::1]:8080/x")
    // percent-escapes and query case are NOT touched
    assert(parse("https://example.com/a%2Fb?K=V").canonical ==
      "https://example.com/a%2Fb?K=V")
    // no scheme: opaque pass-through (trim + fragment only)
    assert(parse("  not-a-url#x  ").canonical == "not-a-url")
    assert(parse("mailto:a@b.com").canonical == "mailto:a@b.com")
    assert(parse(null).canonical == null)
  }

  test("registered domain: suffix families, IPs, bare hosts") {
    assert(parse("https://a.b.example.com/").registeredDomain == "example.com")
    assert(parse("https://news.bbc.co.uk/").registeredDomain == "bbc.co.uk")
    assert(parse("https://deep.sub.shop.com.au/").registeredDomain ==
      "shop.com.au")
    assert(parse("https://example.com/").registeredDomain == "example.com")
    assert(parse("https://localhost/").registeredDomain == "localhost")
    assert(parse("https://10.0.0.1/x").registeredDomain == "10.0.0.1")
    assert(parse("https://[2001:db8::1]/x").registeredDomain == "[2001:db8::1]")
    assert(parse("no-scheme-here").registeredDomain == "")
  }

  test("the scalar pass is shuffle-free and dedup shuffles exactly once") {
    import spark.implicits._
    val df = (0L until 100L).map { i =>
      (i, s"https://www.host${i % 10}.com/p/${i % 10}/?utm_source=s&z=$i")
    }.toDF("doc_id", "url")
    val canon = df.select(col("doc_id"),
      UrlOps.canonicalUrl(col("url")).as("c"))
    val canonPlan = canon.queryExecution.executedPlan.toString
    assert(!canonPlan.contains("Exchange"),
      s"canonicalization must not shuffle:\n$canonPlan")
    val deduped = UrlOps.dedupByUrl(df, "url", "doc_id")
    val dedupPlan = deduped.queryExecution.executedPlan.toString
    assert(dedupPlan.split("Exchange").length - 1 <= 1,
      s"URL dedup is one hash-aggregate shuffle:\n$dedupPlan")
    // z=i keeps every URL distinct here; strip z to force collapses
    val collapsible = df.withColumn("url",
      regexp_replace(col("url"), "&z=\\d+", ""))
    val winners = UrlOps.dedupByUrl(collapsible, "url", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(winners.toSeq == (0L until 10L),
      "first doc per canonical URL survives")
  }

  test("dedup keeps full rows and the chosen order column wins") {
    import spark.implicits._
    val df = Seq(
      (5L, "https://x.com/a?b=1&a=1", "late"),
      (1L, "https://X.com/a/?a=1&b=1#f", "early"),
      (9L, "https://x.com/other", "solo")
    ).toDF("ts", "url", "tag")
    val out = UrlOps.dedupByUrl(df, "url", "ts")
      .select("ts", "tag").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "early", 9L -> "solo"))
  }

  test("rows without a canonicalizable URL pass through undeduped") {
    import spark.implicits._
    val df = Seq(
      (1L, null.asInstanceOf[String], "null-a"),
      (2L, null.asInstanceOf[String], "null-b"),
      (3L, "   ", "blank-a"),
      (4L, "", "blank-b"),
      (5L, "https://x.com/a", "real-a"),
      (6L, "https://X.com/a/", "real-dup")
    ).toDF("ts", "url", "tag")
    val out = UrlOps.dedupByUrl(df, "url", "ts")
      .select("tag").as[String].collect().toSet
    // the two real variants collapse; all four keyless rows survive
    assert(out == Set("null-a", "null-b", "blank-a", "blank-b", "real-a"))
  }

  test("loaded PSL: wildcard, exception, IDN-ASCII tails (r19)") {
    val psl = Psl.fromText(
      """// ===BEGIN ICANN DOMAINS===
        |com
        |co.uk
        |ck
        |*.ck
        |!www.ck
        |xn--p1ai
        |// comment line
        |
        |""".stripMargin)
    import UrlOps.registeredDomainOf
    // wildcard: every direct child of ck is a public suffix
    assert(registeredDomainOf("shop.stuff.biz.ck", psl) == "stuff.biz.ck")
    assert(registeredDomainOf("biz.ck", psl) == "biz.ck") // IS a suffix
    // exception punches the hole: www.ck is registrable
    assert(registeredDomainOf("www.ck", psl) == "www.ck")
    assert(registeredDomainOf("sub.www.ck", psl) == "www.ck")
    // IDN-ASCII tail rule works like any other
    assert(registeredDomainOf("site.xn--p1ai", psl) == "site.xn--p1ai")
    assert(registeredDomainOf("a.site.xn--p1ai", psl) == "site.xn--p1ai")
    // normal rules + implicit '*' fallback unchanged
    assert(registeredDomainOf("a.b.example.com", psl) == "example.com")
    assert(registeredDomainOf("news.bbc.co.uk", psl) == "bbc.co.uk")
    assert(registeredDomainOf("x.unknown-tld-zz", psl) == "x.unknown-tld-zz")
    // the psl parse overload threads through to the struct
    assert(UrlOps.parse("https://www.shop.stuff.biz.ck/a?x=1", psl)
      .registeredDomain == "stuff.biz.ck")
    // builtin default is byte-identical to the historical heuristic
    assert(registeredDomainOf("deep.sub.shop.com.au", Psl.builtin) ==
      registeredDomainOf("deep.sub.shop.com.au"))
  }

  test("RFC 3986 resolve: the reference-resolution battery (r19)") {
    import UrlOps.resolve
    val base = "https://ex.com/a/b/c?q=1#frag"
    // absolute ref wins outright
    assert(resolve(base, "http://other.com/x") == "http://other.com/x")
    // network-path ref takes the base scheme
    assert(resolve(base, "//cdn.com/y") == "https://cdn.com/y")
    // path-absolute
    assert(resolve(base, "/root") == "https://ex.com/root")
    // path-relative merges at the last slash
    assert(resolve(base, "d") == "https://ex.com/a/b/d")
    assert(resolve(base, "d/e") == "https://ex.com/a/b/d/e")
    // dot segments
    assert(resolve(base, "./d") == "https://ex.com/a/b/d")
    assert(resolve(base, "../d") == "https://ex.com/a/d")
    assert(resolve(base, "../../d") == "https://ex.com/d")
    assert(resolve(base, "../../../d") == "https://ex.com/d") // over-pop clamps
    assert(resolve(base, "..") == "https://ex.com/a/")
    assert(resolve(base, ".") == "https://ex.com/a/b/")
    // empty ref = base (sans fragment); query-only ref swaps the query
    assert(resolve(base, "") == "https://ex.com/a/b/c?q=1")
    assert(resolve(base, "?n=2") == "https://ex.com/a/b/c?n=2")
    // fragments strip from ref too
    assert(resolve(base, "d#sec") == "https://ex.com/a/b/d")
    // authority with empty path merges as "/" + ref
    assert(resolve("https://ex.com", "x") == "https://ex.com/x")
    // RFC 3986 §4.2: a leading segment with a colon parses as a SCHEME
    // ("v:1" is a URI; a path meaning needs the "./" prefix)
    assert(resolve(base, "v:1") == "v:1")
    assert(resolve(base, "./v:1") == "https://ex.com/a/b/v:1")
    // ...but a colon after a slash is just a path character
    assert(resolve(base, "d/v:1") == "https://ex.com/a/b/d/v:1")
    // null/blank base passes the ref through
    assert(resolve(null, "/x") == "/x")
    assert(resolve("", "/x") == "/x")
    assert(resolve(base, null) == base)
  }

  test("RFC 3986 §5.4 example tables, base http://a/b/c/d;p?q") {
    import UrlOps.resolve
    val base = "http://a/b/c/d;p?q"
    // §5.4.1 normal examples (g:h is a URI with scheme g — kept as-is)
    val normal = Seq(
      "g:h" -> "g:h", "g" -> "http://a/b/c/g", "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/", "/g" -> "http://a/g", "//g" -> "http://g",
      "?y" -> "http://a/b/c/d;p?y", "g?y" -> "http://a/b/c/g?y",
      ";x" -> "http://a/b/c/;x", "g;x" -> "http://a/b/c/g;x",
      "" -> "http://a/b/c/d;p?q", "." -> "http://a/b/c/",
      "./" -> "http://a/b/c/", ".." -> "http://a/b/",
      "../" -> "http://a/b/", "../g" -> "http://a/b/g",
      "../.." -> "http://a/", "../../" -> "http://a/",
      "../../g" -> "http://a/g")
    // §5.4.2 abnormal examples (strict parser: excess .. clamp at root;
    // dot-segments in non-leading positions; queries/fragments attach
    // to the last segment; scheme-looking leading segments)
    val abnormal = Seq(
      "../../../g" -> "http://a/g", "../../../../g" -> "http://a/g",
      "/./g" -> "http://a/g", "/../g" -> "http://a/g",
      "g." -> "http://a/b/c/g.", ".g" -> "http://a/b/c/.g",
      "g.." -> "http://a/b/c/g..", "..g" -> "http://a/b/c/..g",
      "./../g" -> "http://a/b/g", "./g/." -> "http://a/b/c/g/",
      "g/./h" -> "http://a/b/c/g/h", "g/../h" -> "http://a/b/c/h",
      "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
      "g;x=1/../y" -> "http://a/b/c/y",
      "g?y/./x" -> "http://a/b/c/g?y/./x",
      "g?y/../x" -> "http://a/b/c/g?y/../x",
      "http:g" -> "http:g") // strict: scheme ref stands alone
    (normal ++ abnormal).foreach { case (ref, want) =>
      assert(resolve(base, ref) == want, s"resolve(base, \"$ref\")")
    }
    // fragment refs: the dedup-key contract STRIPS fragments, so the
    // RFC's "#s"-carrying outputs appear here without the fragment
    assert(resolve(base, "#s") == "http://a/b/c/d;p?q")
    assert(resolve(base, "g#s") == "http://a/b/c/g")
    assert(resolve(base, "g?y#s") == "http://a/b/c/g?y")
  }

  test("dedupByCanonicalUrl: declared canonicals collapse, others hold") {
    import spark.implicits._
    val page = "https://site.com/p/1"
    val df = Seq(
      // the canonical page itself — nothing declared
      (1L, page, "<html><body><p>x</p></body></html>"),
      // session variant declaring the absolute canonical: collapses
      (2L, page + "?session=abc",
        s"""<html><head><link rel="canonical" href="$page"></head></html>"""),
      // mirror path declaring a RELATIVE canonical against <base href>
      (3L, "https://site.com/alt/1",
        "<html><head><base href=\"/p/\"><link rel=canonical href=1>" +
          "</head></html>"),
      // a session variant with NO declaration keeps its identity param
      (4L, page + "?session=keep", "<html><body><p>y</p></body></html>"),
      // a different declared canonical stays its own group
      (5L, "https://site.com/other?z=1",
        "<html><head><link rel=canonical href=\"/other\"></head></html>")
    ).toDF("doc_id", "url", "html")
    val out = UrlOps.dedupByCanonicalUrl(df, "url", "html", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 4L, 5L))
    // key unit: base resolves against the fetch URL first
    assert(UrlOps.canonicalDedupKey("https://site.com/alt/1",
      "<base href=\"/p/\"><link rel=canonical href=1>") == page)
    // no declaration: the fetch URL canonicalizes
    assert(UrlOps.canonicalDedupKey("https://WWW.Site.com/p/1/",
      "<p>n</p>") == page)
    // null fetch URL with a declared absolute canonical still keys
    assert(UrlOps.canonicalDedupKey(null,
      s"<link rel=canonical href=$page>") == page)
    // null everything -> null key (passes through undeduped upstream)
    assert(UrlOps.canonicalDedupKey(null, "<p>x</p>") == null)
  }

  test("a null order value refuses loudly — never a silently lost row") {
    import spark.implicits._
    val df = Seq(
      (java.lang.Long.valueOf(1L), "https://x.com/a", "ok"),
      (null.asInstanceOf[java.lang.Long], "https://x.com/b", "null-ord")
    ).toDF("ts", "url", "tag")
    val e = intercept[Exception] {
      UrlOps.dedupByUrl(df, "url", "ts").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("must be non-null")), msgs(e).mkString("|"))
  }
}
