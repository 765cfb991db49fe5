package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Sitemap parsing (r19): urlset/sitemapindex blocks, entity + CDATA
  * values, optional fields, gzip payloads, robots.txt discovery, and
  * totality on damage.
  */
class SitemapsSpec extends AnyFunSuite with graft.SharedSpark {
  import Sitemaps._

  test("urlset: loc/lastmod/changefreq/priority, entities, CDATA") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc>https://ex.com/p?a=1&amp;b=2</loc>
        |    <lastmod>2026-01-02</lastmod>
        |    <changefreq>daily</changefreq>
        |    <priority>0.8</priority>
        |  </url>
        |  <url><loc><![CDATA[https://ex.com/cdata?x=1&y=2]]></loc></url>
        |  <url><lastmod>2026-01-03</lastmod></url>
        |</urlset>""".stripMargin
    val es = parse(xml)
    assert(es.length == 2) // the loc-less block drops
    assert(es(0) == SitemapEntry("url", "https://ex.com/p?a=1&b=2",
      "2026-01-02", "daily", "0.8"))
    assert(es(1) == SitemapEntry("url", "https://ex.com/cdata?x=1&y=2",
      null, null, null))
    // CDATA content is literal: an &amp; inside it does NOT decode,
    // while the same sequence outside CDATA does (XML rule)
    val mixed = parse("<urlset><url><loc>a&amp;b<![CDATA[&amp;]]></loc>" +
      "</url></urlset>")
    assert(mixed.head.loc == "a&b&amp;")
  }

  test("sitemapindex: kind=sitemap, boundary vs <sitemapindex> itself") {
    val xml =
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sitemap><loc>https://ex.com/maps/a.xml.gz</loc>
        |    <lastmod>2026-02-03T04:05:06Z</lastmod></sitemap>
        |  <sitemap><loc>https://ex.com/maps/b.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val es = parse(xml)
    assert(es.map(_.kind) == Vector("sitemap", "sitemap"))
    assert(es.map(_.loc) == Vector("https://ex.com/maps/a.xml.gz",
      "https://ex.com/maps/b.xml"))
    assert(es(0).lastmod == "2026-02-03T04:05:06Z" && es(1).lastmod == null)
  }

  test("namespace prefixes and near-name elements (XML QName rules)") {
    // lxml-family generators emit PREFIXED tags — same elements
    val prefixed =
      """<ns0:urlset xmlns:ns0="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<ns0:url><ns0:loc>https://ns.ex/p/1</ns0:loc>
        |<ns0:lastmod>2026-03-04</ns0:lastmod></ns0:url>
        |</ns0:urlset>""".stripMargin
    val es = parse(prefixed)
    assert(es == Vector(SitemapEntry("url", "https://ns.ex/p/1",
      "2026-03-04", null, null)))
    // an element whose name merely STARTS with url/loc is a different
    // element — '-' and '_' are XML name chars, never a block open
    assert(parse("<urlset><url-info><loc>https://no.ex/skip</loc>" +
      "</url-info><url><loc>https://yes.ex/keep</loc></url></urlset>")
      .map(_.loc) == Vector("https://yes.ex/keep"))
    assert(parse("<urlset><url><loc_alt>X</loc_alt>" +
      "<loc>https://a/real</loc></url></urlset>")
      .map(_.loc) == Vector("https://a/real"))
  }

  test("totality: junk, case, comments, truncation, empty") {
    // uppercase tags fold; comments and PIs skip
    assert(parse("<URLSET><URL><LOC>https://A/x</LOC></URL></URLSET>")
      .map(_.loc) == Vector("https://A/x"))
    assert(parse("<urlset><!-- c --><url><?pi?><loc>https://a/1</loc>" +
      "</url></urlset>").map(_.loc) == Vector("https://a/1"))
    // a truncated final block still yields its loc (emit at EOF)
    assert(parse("<urlset><url><loc>https://a/2</loc>")
      .map(_.loc) == Vector("https://a/2"))
    assert(parse("not xml at all").isEmpty)
    assert(parse("").isEmpty && parse(null).isEmpty)
  }

  test("parseBytes: gzip sniff, BOM, damaged gz is total-empty") {
    val xml = "<urlset><url><loc>https://gz.ex/1</loc></url></urlset>"
    val gz = {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(xml.getBytes("UTF-8")); g.close()
      out.toByteArray
    }
    assert(parseBytes(gz).map(_.loc) == Vector("https://gz.ex/1"))
    assert(parseBytes(xml.getBytes("UTF-8")).map(_.loc) ==
      Vector("https://gz.ex/1"))
    val bom = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      xml.getBytes("UTF-8")
    assert(parseBytes(bom).map(_.loc) == Vector("https://gz.ex/1"))
    val bad = gz.clone(); bad(gz.length / 2) = (bad(gz.length / 2) ^ 0x7F).toByte
    assert(parseBytes(bad).isEmpty) // damaged fetch: total, never a throw
    assert(parseBytes(null).isEmpty)
  }

  test("discoverFromRobots explodes the robots table, zero shuffle") {
    import spark.implicits._
    val robots = Seq(
      ("a.com", "User-agent: *\nSitemap: https://a.com/s1.xml\n" +
        "Sitemap: https://a.com/s2.xml.gz\n"),
      ("b.com", "User-agent: *\nDisallow: /\n")
    ).toDF("host", "robots_txt")
    val out = Sitemaps.discoverFromRobots(robots)
    assert(out.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("a.com", "https://a.com/s1.xml"), ("a.com", "https://a.com/s2.xml.gz")))
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("fromRobots: Sitemap directives, case/comment tolerance") {
    val robots =
      """User-agent: *
        |Disallow: /private/
        |Sitemap: https://ex.com/sitemap.xml
        |SITEMAP: https://ex.com/maps/index.xml.gz # inline comment
        |sitemap:
        |# Sitemap: https://commented.out/
        |""".stripMargin
    assert(fromRobots(robots) == Vector("https://ex.com/sitemap.xml",
      "https://ex.com/maps/index.xml.gz"))
    assert(fromRobots("User-agent: *\nDisallow:").isEmpty)
    assert(fromRobots(null).isEmpty)
  }
}
