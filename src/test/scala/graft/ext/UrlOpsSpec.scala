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
