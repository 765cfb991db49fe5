package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** WARC ingestion (r18): record framing round-trips, per-record gzip
  * members, HTTP payload extraction with chunked decoding, loud
  * refusals on torn shards, and the Spark read surface end to end.
  */
class WarcSpec extends AnyFunSuite with SharedSpark {
  import Warc._

  private val iso = java.nio.charset.StandardCharsets.ISO_8859_1

  private def record(tpe: String, uri: String, body: String): Array[Byte] =
    writeRecord(tpe, uri, "application/http", body.getBytes(iso))

  test("record framing round-trips, plain and gzip-per-member") {
    val recs = Seq(
      record("warcinfo", "", "software: test\r\n"),
      record("request", "https://a.example.com/x", "GET /x HTTP/1.1\r\n\r\n"),
      record("response", "https://a.example.com/x",
        "HTTP/1.1 200 OK\r\n\r\npayload-bytes"))
    for (gz <- Seq(false, true)) {
      val parsed = parseAll(writeWarc(recs, gzipPerRecord = gz))
      assert(parsed.map(_.warcType) == Vector("warcinfo", "request", "response"))
      assert(parsed(2).targetUri == "https://a.example.com/x")
      assert(new String(parsed(2).body, iso).endsWith("payload-bytes"))
    }
    // empty input and empty-body records are fine
    assert(parseAll(Array.empty[Byte]).isEmpty)
    assert(parseAll(record("metadata", "", "")).head.body.isEmpty)
  }

  test("concatenated gzip members decode as one stream (the CC layout)") {
    val r1 = writeWarc(Seq(record("response", "https://a/1",
      "HTTP/1.1 200 OK\r\n\r\none")), gzipPerRecord = true)
    val r2 = writeWarc(Seq(record("response", "https://a/2",
      "HTTP/1.1 200 OK\r\n\r\ntwo")), gzipPerRecord = true)
    val both = r1 ++ r2
    val parsed = parseAll(both)
    assert(parsed.map(_.targetUri) == Vector("https://a/1", "https://a/2"))
  }

  test("httpBody strips framing; chunked transfer decodes exactly") {
    assert(new String(httpBody(
      "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nhello".getBytes(iso)),
      iso) == "hello")
    // chunked: sizes in hex, extension after ';', terminal 0-chunk
    val chunked = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "4\r\nWiki\r\n6;note=1\r\npedia!\r\n0\r\n\r\n"
    assert(new String(httpBody(chunked.getBytes(iso)), iso) == "Wikipedia!")
    // case-insensitive header name, value with other tokens
    val mixed = "HTTP/1.1 200 OK\r\nTRANSFER-ENCODING: gzip, chunked\r\n\r\n" +
      "2\r\nok\r\n0\r\n\r\n"
    assert(new String(httpBody(mixed.getBytes(iso)), iso) == "ok")
  }

  test("charset plumbing: header extraction + HTML5 decode precedence") {
    // Content-Type charset extraction (quoted, parameterized, absent)
    assert(httpBodyAndCharset(
      "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1\r\n\r\nx"
        .getBytes(iso))._2 == "iso-8859-1")
    assert(httpBodyAndCharset(
      "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=\"UTF-8\"; q=1\r\n\r\nx"
        .getBytes(iso))._2 == "utf-8")
    assert(httpBodyAndCharset(
      "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nx".getBytes(iso))._2 == null)
    // decode precedence: BOM > transport hint > meta > UTF-8 default
    import HtmlText.decodeBytes
    val latin = "café".getBytes(iso)
    assert(decodeBytes(latin, "iso-8859-1") == "café")
    assert(decodeBytes("café".getBytes("UTF-8"), null) == "café")
    // meta sniff when no transport hint
    // byte 0x80 is the euro sign in 1252 (an unmapped control in
    // latin-1 - a wrong charset cannot produce it)
    val metaBytes = "<meta charset='windows-1252'><p>".getBytes(iso) ++
      Array(0x80.toByte) ++ "</p>".getBytes(iso)
    assert(decodeBytes(metaBytes, null).contains("€"))
    // BOM beats a wrong transport hint
    val utf16 = Array[Byte](0xFF.toByte, 0xFE.toByte) ++
      "ok✓".getBytes(java.nio.charset.Charset.forName("UTF-16LE"))
    assert(decodeBytes(utf16, "iso-8859-1") == "ok✓")
    // UTF-8 BOM strips rather than leaking U+FEFF
    val bom8 = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      "hi".getBytes("UTF-8")
    assert(decodeBytes(bom8, null) == "hi")
    // unknown charset names fall back instead of throwing
    assert(decodeBytes("ok".getBytes("UTF-8"), "no-such-charset") == "ok")
    assert(decodeBytes(null, null) == null)
  }

  test("torn shards refuse loudly — never a silently smaller corpus") {
    val good = writeWarc(Seq(record("response", "https://a/1",
      "HTTP/1.1 200 OK\r\n\r\nbody")), gzipPerRecord = false)
    // truncated payload
    intercept[IllegalArgumentException] {
      parseAll(java.util.Arrays.copyOf(good, good.length - 6))
    }
    // header block without terminator
    intercept[IllegalArgumentException] {
      parseAll("WARC/1.0\r\nWARC-Type: response\r\n".getBytes(iso))
    }
    // not a WARC at all
    intercept[IllegalArgumentException] {
      parseAll("HTTP/1.1 200 OK\r\n\r\n".getBytes(iso))
    }
    // missing Content-Length
    intercept[IllegalArgumentException] {
      parseAll("WARC/1.0\r\nWARC-Type: x\r\n\r\n\r\n\r\n".getBytes(iso))
    }
    // damaged gzip member
    val gz = writeWarc(Seq(good), gzipPerRecord = true)
    gz(gz.length / 2) = (gz(gz.length / 2) ^ 0x55).toByte
    intercept[IllegalArgumentException] { parseAll(gz) }
    // malformed chunking
    intercept[IllegalArgumentException] {
      httpBody("HTTP/1.1 200\r\nTransfer-Encoding: chunked\r\n\r\nzz\r\nx\r\n"
        .getBytes(iso))
    }
    intercept[IllegalArgumentException] {
      httpBody("HTTP/1.1 200\r\nTransfer-Encoding: chunked\r\n\r\nff\r\nx\r\n"
        .getBytes(iso))
    }
  }

  test("readResponses: response records only, one task per shard") {
    import spark.implicits._
    val dir = tmpDir("warc-spec")
    val shard1 = writeWarc(Seq(
      record("warcinfo", "", "software: test\r\n"),
      record("request", "https://s1/a", "GET /a HTTP/1.1\r\n\r\n"),
      record("response", "https://s1/a", "HTTP/1.1 200 OK\r\n\r\nalpha"),
      record("response", "https://s1/b",
        "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
          "4\r\nbeta\r\n0\r\n\r\n")), gzipPerRecord = true)
    val shard2 = writeWarc(Seq(
      record("response", "https://s2/c", "HTTP/1.1 200 OK\r\n\r\ngamma")),
      gzipPerRecord = false) // plain .warc reads through the same glob
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "s1.warc.gz"), shard1)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "s2.warc.gz"), shard2)
    val out = Warc.readResponses(spark, dir + "/*.warc.gz")
      .select($"url", $"body".cast("string"))
      .as[(String, String)].collect().toMap
    assert(out == Map("https://s1/a" -> "alpha", "https://s1/b" -> "beta",
      "https://s2/c" -> "gamma"))
    // full-register read sees every record type
    val all = Warc.readWarc(spark, dir + "/*.warc.gz")
    assert(all.count() == 5)
    assert(all.filter($"warc_type" === "response").count() == 3)
  }

  test("mandatory headers on write: WARC-Date + content-derived id (r19)") {
    val asOf = java.time.Instant.parse("2026-02-03T04:05:06Z")
    val body = "HTTP/1.1 200 OK\r\n\r\nhello".getBytes(iso)
    val bytes = writeRecord("response", "https://a/x", "application/http",
      body, asOf, null)
    val r = parseAll(bytes).head
    assert(r.headers("warc-date") == "2026-02-03T04:05:06Z")
    assert(r.headers("warc-record-id") ==
      "<" + recordIdFor("https://a/x", body) + ">")
    // identical inputs write identical bytes (no wall clock, no UUID)
    assert(java.util.Arrays.equals(bytes,
      writeRecord("response", "https://a/x", "application/http", body,
        asOf, null)))
    // a caller-supplied record id overrides the derived one
    val custom = parseAll(writeRecord("metadata", "", "text/plain",
      Array.empty[Byte], asOf, "urn:uuid:00000000-0000-0000-0000-000000000001"))
    assert(custom.head.headers("warc-record-id") ==
      "<urn:uuid:00000000-0000-0000-0000-000000000001>")
    // the 4-arg fixture overload stamps the documented constant
    assert(parseAll(record("metadata", "", "x")).head
      .headers("warc-date") == "2000-01-01T00:00:00Z")
  }

  test("Spark reads stream shards — no content blob in the scan (r19)") {
    import spark.implicits._
    val dir = tmpDir("warc-stream")
    // a shard whose DECOMPRESSED size is large while staying quick to
    // build: 2000 records of ~8 KB bodies (~16 MB inflated); the read
    // path must hold one record at a time, never the blob
    val filler = "x" * 8000
    val recs = (0 until 2000).map(i =>
      record("response", s"https://big/doc/$i",
        s"HTTP/1.1 200 OK\r\n\r\n$filler-$i"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "big.warc.gz"),
      writeWarc(recs, gzipPerRecord = true))
    val df = Warc.readResponses(spark, dir + "/*.warc.gz")
    // the LISTING scan is pruned to the path column: binaryFile's
    // content column must not appear in ReadSchema (it would land the
    // whole compressed shard in executor heap)
    val plan = df.queryExecution.executedPlan.toString
    val readSchemas = "ReadSchema: [^\n]+".r.findAllIn(plan).toList
    assert(readSchemas.nonEmpty, s"no scan in plan:\n$plan")
    readSchemas.foreach { rs =>
      assert(rs.contains("path") && !rs.contains("content"),
        s"scan must read paths only, got: $rs")
    }
    assert(df.count() == 2000)
    // early termination (limit) leaves no broken state: the task-
    // completion listener closes the abandoned stream
    assert(df.limit(3).collect().length == 3)
    // readWarc rides the same streaming path
    val allPlan = Warc.readWarc(spark, dir + "/*.warc.gz")
      .queryExecution.executedPlan.toString
    assert(!"ReadSchema: [^\n]+".r.findAllIn(allPlan)
      .exists(_.contains("content")))
  }
}
