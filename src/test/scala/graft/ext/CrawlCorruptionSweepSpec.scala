package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Single-unit corruption sweeps over the r19 crawl parsers — the
  * [[CorruptionSweepSpec]] idiom applied to the new surfaces, each
  * against ITS declared damage contract:
  *  - [[Sitemaps.parse]] is TOTAL: any single-char mutation must yield
  *    SOME Vector (possibly empty), never throw, never hang;
  *  - [[WarcIndex.gzipMembers]] is LOUD: any single-byte mutation must
  *    either parse to byte-exact members or refuse with
  *    IllegalArgumentException — never return a member whose offsets
  *    misalign, never throw anything else, never hang;
  *  - [[TextClean.repairMojibakeScalar]] is total and never grows the
  *    string in a repair round.
  */
class CrawlCorruptionSweepSpec extends AnyFunSuite {

  test("sitemap parse is total under every single-char corruption") {
    val xml = "<?xml version=\"1.0\"?><urlset><!-- c --><url>" +
      "<loc>https://ex.com/a?x=1&amp;y=2</loc><lastmod>2026-01-02</lastmod>" +
      "</url><url><loc><![CDATA[https://ex.com/b]]></loc></url></urlset>" +
      "<sitemapindex><ns0:sitemap><ns0:loc>https://ex.com/m.xml</ns0:loc>" +
      "</ns0:sitemap></sitemapindex>"
    var bad = List.empty[String]
    for (pos <- xml.indices; c <- 0 until 128) {
      val s = xml.updated(pos, c.toChar)
      try {
        val out = Sitemaps.parse(s)
        // sanity: entries that DO parse carry a non-empty loc and a
        // known kind (the emit guard)
        if (!out.forall(e => e.loc.nonEmpty &&
            (e.kind == "url" || e.kind == "sitemap")))
          bad ::= s"pos=$pos c=$c -> insane entry"
      } catch {
        case t: Throwable =>
          bad ::= s"pos=$pos c=$c -> threw ${t.getClass.getSimpleName}"
      }
    }
    assert(bad.isEmpty, bad.take(5).mkString(" | "))
  }

  test("gzip member walk: every single-byte corruption parses exact or refuses loud") {
    val recs = Seq(
      Warc.writeRecord("response", "https://a/1", "application/http",
        "HTTP/1.1 200 OK\r\n\r\nalpha".getBytes("ISO-8859-1")),
      Warc.writeRecord("response", "https://a/2", "application/http",
        "HTTP/1.1 200 OK\r\n\r\nbeta-two".getBytes("ISO-8859-1")))
    val blob = Warc.writeWarc(recs, gzipPerRecord = true)
    var bad = List.empty[String]
    for (pos <- blob.indices; flip <- Seq(0x01, 0x55, 0xFF)) {
      val b = blob.clone()
      b(pos) = (b(pos) ^ flip).toByte
      try {
        val members = WarcIndex.gzipMembers(
          new java.io.ByteArrayInputStream(b)).toList
        // parsed without refusing: offsets must still tile exactly and
        // members must round-trip standalone — a corrupted shard may
        // only ever yield CORRECT slices (e.g. a mutation inside a
        // skipped gzip header field)
        var at = 0L
        members.foreach { case (off, len, bytes) =>
          if (off != at) bad ::= s"pos=$pos flip=$flip -> offset gap"
          at = off + len
          val again = WarcIndex.gzipMembers(new java.io.ByteArrayInputStream(
            java.util.Arrays.copyOfRange(b, off.toInt, (off + len).toInt)))
            .toList
          if (again.length != 1 ||
              !java.util.Arrays.equals(again.head._3, bytes))
            bad ::= s"pos=$pos flip=$flip -> slice does not round-trip"
        }
      } catch {
        case _: IllegalArgumentException => () // the loud contract
        case t: Throwable =>
          bad ::= s"pos=$pos flip=$flip -> ${t.getClass.getSimpleName}"
      }
    }
    assert(bad.isEmpty, bad.take(5).mkString(" | "))
  }

  test("mojibake repair is total and never grows under corrupted input") {
    val base = new String(
      "café — “quotes” and 日本語".getBytes("UTF-8"), "ISO-8859-1")
    for (pos <- base.indices; c <- 0 until 256) {
      val s = base.updated(pos, c.toChar)
      val out = TextClean.repairMojibakeScalar(s)
      assert(out != null && out.length <= s.length, s"pos=$pos c=$c")
    }
  }
}
