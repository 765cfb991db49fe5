package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** WARC record index + seek-fetch (r19): byte-exact gzip member
  * accounting (CRC/ISIZE verified), the index → range-read hydration
  * path, CDXJ round-trip, and the streaming crawl-ingestion reader.
  */
class WarcIndexSpec extends AnyFunSuite with SharedSpark {

  private val iso = java.nio.charset.StandardCharsets.ISO_8859_1

  private def record(tpe: String, uri: String, body: String): Array[Byte] =
    Warc.writeRecord(tpe, uri, "application/http", body.getBytes(iso))

  private def shard(recs: Seq[Array[Byte]]): Array[Byte] =
    Warc.writeWarc(recs, gzipPerRecord = true)

  test("gzipMembers: byte-exact offsets/lengths, CRC + ISIZE verified") {
    val recs = Seq(
      record("warcinfo", "", "software: t\r\n"),
      record("response", "https://a/1", "HTTP/1.1 200 OK\r\n\r\none"),
      record("response", "https://a/2", "HTTP/1.1 200 OK\r\n\r\ntwo-longer"))
    val blob = shard(recs)
    val members = WarcIndex.gzipMembers(
      new java.io.ByteArrayInputStream(blob)).toList
    assert(members.length == 3)
    // offsets tile the blob exactly: each member starts where the
    // previous ended, and the last ends at the blob's end
    var expect = 0L
    members.foreach { case (off, len, _) =>
      assert(off == expect, s"member offset $off, expected $expect")
      expect = off + len
    }
    assert(expect == blob.length)
    // decompressed content is the original record bytes
    members.zip(recs).foreach { case ((_, _, bytes), rec) =>
      assert(java.util.Arrays.equals(bytes, rec))
    }
    // a member extracted by (offset, length) decodes standalone — the
    // range-read contract
    val (off1, len1, _) = members(1)
    val slice = java.util.Arrays.copyOfRange(blob,
      off1.toInt, (off1 + len1).toInt)
    val solo = WarcIndex.gzipMembers(
      new java.io.ByteArrayInputStream(slice)).toList
    assert(solo.length == 1 &&
      java.util.Arrays.equals(solo.head._3, recs(1)))
    // a flipped bit in the deflate stream refuses (CRC or inflate)
    val bad = blob.clone()
    bad(off1.toInt + len1.toInt / 2) =
      (bad(off1.toInt + len1.toInt / 2) ^ 0x40).toByte
    intercept[IllegalArgumentException] {
      WarcIndex.gzipMembers(new java.io.ByteArrayInputStream(bad)).toList
    }
    // truncation refuses
    intercept[IllegalArgumentException] {
      WarcIndex.gzipMembers(new java.io.ByteArrayInputStream(
        java.util.Arrays.copyOf(blob, blob.length - 3))).toList
    }
    // non-gzip input refuses
    intercept[IllegalArgumentException] {
      WarcIndex.gzipMembers(new java.io.ByteArrayInputStream(
        "WARC/1.0\r\n".getBytes(iso))).toList
    }
    // a gzip NAME header field is skipped correctly (offset math holds)
    val named = {
      val out = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(out) // no name, member 1
      gz.write(recs.head); gz.close()
      out.toByteArray
    }
    val nm = WarcIndex.gzipMembers(
      new java.io.ByteArrayInputStream(named)).toList
    assert(nm.length == 1 && nm.head._2 == named.length)
  }

  test("indexShard: one record per member enforced; fields surface") {
    val recs = Seq(
      record("request", "https://a/1", "GET / HTTP/1.1\r\n\r\n"),
      record("response", "https://a/1", "HTTP/1.1 200 OK\r\n\r\nbody"))
    val ix = WarcIndex.indexShard(
      new java.io.ByteArrayInputStream(shard(recs))).toList
    assert(ix.map(_.record.warcType) == List("request", "response"))
    assert(ix.forall(_.record.targetUri == "https://a/1"))
    // one member holding TWO records refuses (no per-record offsets)
    val packed = {
      val out = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(out)
      recs.foreach(gz.write); gz.close()
      out.toByteArray
    }
    intercept[IllegalArgumentException] {
      WarcIndex.indexShard(new java.io.ByteArrayInputStream(packed)).toList
    }
  }

  test("indexWarc + fetchRecords: range-read hydration, stale index refuses") {
    import spark.implicits._
    val dir = tmpDir("warcindex")
    val s1 = shard((0 until 20).map(i =>
      record("response", s"https://s1/d/$i", s"HTTP/1.1 200 OK\r\n\r\nalpha-$i")))
    val s2 = shard((0 until 10).map(i =>
      record("response", s"https://s2/d/$i", s"HTTP/1.1 200 OK\r\n\r\nbeta-$i")))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "s1.warc.gz"), s1)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "s2.warc.gz"), s2)
    val index = WarcIndex.indexWarc(spark, dir + "/*.warc.gz").cache()
    assert(index.count() == 30)
    assert(index.select("warc_date").distinct().as[String].collect().toSeq ==
      Seq("2000-01-01T00:00:00Z")) // the fixture-overload constant
    // CDX enrichment: response rows carry the HTTP status; every row
    // carries the sha256 digest of its record body (dedup-by-content
    // straight off the index — the Common Crawl idiom)
    assert(index.filter(col("status") === 200).count() == 30)
    val digests = index.select("digest").as[String].collect()
    assert(digests.forall(_.length == 64) && digests.distinct.length == 30)
    // hydrate a SUBSET by range read and compare against the full scan
    val picked = index.filter(col("url").endsWith("3") ||
      col("url").endsWith("7"))
    val fetched = WarcIndex.fetchResponses(picked)
      .select($"url", $"body".cast("string")).as[(String, String)]
      .collect().toMap
    assert(fetched == Map(
      "https://s1/d/3" -> "alpha-3", "https://s1/d/7" -> "alpha-7",
      "https://s1/d/13" -> "alpha-13", "https://s1/d/17" -> "alpha-17",
      "https://s2/d/3" -> "beta-3", "https://s2/d/7" -> "beta-7"))
    // splitBytes sub-splits one file's rows into offset-range groups
    // (the few-huge-shards fan-out) with identical results
    val split = WarcIndex.fetchResponses(picked, splitBytes = 256L)
      .select($"url", $"body".cast("string")).as[(String, String)]
      .collect().toMap
    assert(split == fetched)
    // a stale index (offset shifted mid-member) refuses loudly
    val stale = picked.limit(1)
      .withColumn("offset", col("offset") + lit(5L))
    val e = intercept[Exception] {
      WarcIndex.fetchRecords(stale).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("stale index") ||
      m.contains("bad magic")), msgs(e).mkString(" | "))
    index.unpersist()
  }

  test("fetchRecords refuses a member that decodes to several records") {
    import spark.implicits._
    // a repacked shard whose ONE gzip member holds two WARC records:
    // indexWarc would refuse it at index time, so hand-build an index
    // row over the member — fetch must mirror indexShard's contract
    // (refuse loudly), never silently hydrate only the first record
    val packed = {
      val out = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(record("response", "https://mr/1", "HTTP/1.1 200 OK\r\n\r\na"))
      gz.write(record("response", "https://mr/2", "HTTP/1.1 200 OK\r\n\r\nb"))
      gz.close()
      out.toByteArray
    }
    val dir = tmpDir("warcindex-multirec")
    val f = java.nio.file.Paths.get(dir, "packed.warc.gz")
    java.nio.file.Files.write(f, packed)
    val fakeIndex = Seq((f.toString, 0L, packed.length.toLong))
      .toDF("file", "offset", "length")
    val e = intercept[Exception] { WarcIndex.fetchRecords(fakeIndex).collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("2 WARC records")),
      msgs(e).mkString(" | "))
  }

  test("dedupByDigest: identical payloads collapse before any fetch") {
    import spark.implicits._
    val dir = tmpDir("warcindex-digest")
    // two shards with overlapping CONTENT: docs 0-9 in shard a, docs
    // 5-14 in shard b — same url+body for the overlap, so digests match
    def recs(lo: Int, hi: Int) = (lo until hi).map(i =>
      record("response", s"https://dg/d/$i", s"HTTP/1.1 200 OK\r\n\r\nbody-$i"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.warc.gz"),
      shard(recs(0, 10)))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.warc.gz"),
      shard(recs(5, 15)))
    val index = WarcIndex.indexWarc(spark, dir + "/*.warc.gz")
    assert(index.count() == 20)
    val unique = WarcIndex.dedupByDigest(index)
    assert(unique.count() == 15)
    // the earliest capture wins: overlap rows resolve to shard a
    val overlapFiles = unique
      .filter(col("url").isin((5 until 10).map(i => s"https://dg/d/$i"): _*))
      .select("file").as[String].collect()
    assert(overlapFiles.length == 5 && overlapFiles.forall(_.endsWith("a.warc.gz")))
    // one shuffle: the exact-dedup hash-aggregate shape
    val plan = unique.queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 <= 1, plan)
    // the digest hashes the PAYLOAD (WARC-Payload-Digest semantics):
    // two captures of one page differing only in a response header —
    // and one with a sloppy double-space status line — still collapse
    val dir2 = tmpDir("warcindex-paydg")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir2, "c.warc.gz"),
      shard(Seq(
        record("response", "https://pd/x",
          "HTTP/1.1 200 OK\r\nDate: Mon, 01 Jan 2026 00:00:00 GMT\r\n\r\nsame"),
        record("response", "https://pd/x",
          "HTTP/1.1  200 OK\r\nDate: Mon, 01 Jan 2026 00:00:05 GMT\r\n\r\nsame"))))
    val idx2 = WarcIndex.indexWarc(spark, dir2 + "/*.warc.gz")
    assert(idx2.select("digest").distinct().count() == 1)
    assert(idx2.filter(col("status") === 200).count() == 2) // sloppy line parses
    assert(WarcIndex.dedupByDigest(idx2).count() == 1)
    // hydrating the deduped index yields each distinct doc once
    val bodies = WarcIndex.fetchResponses(unique)
      .select($"body".cast("string")).as[String].collect()
    assert(bodies.length == 15 && bodies.distinct.length == 15)
  }

  test("surtKey: host reversal, canonicalization, opaque pass-through") {
    assert(WarcIndex.surtKey("https://www.Example.com/a/b?x=1") ==
      "com,example)/a/b?x=1")
    assert(WarcIndex.surtKey("http://news.bbc.co.uk/") == "uk,co,bbc,news)/")
    assert(WarcIndex.surtKey("https://example.com") == "com,example)/")
    // tracking params strip and the rest sort, same as the dedup key
    assert(WarcIndex.surtKey("https://example.com/p?b=2&a=1&utm_source=x") ==
      "com,example)/p?a=1&b=2")
    // non-default port drops from the key (documented CDX convention)
    assert(WarcIndex.surtKey("https://example.com:8443/p") ==
      "com,example)/p")
    assert(WarcIndex.surtKey("not-a-url") == "not-a-url")
    assert(WarcIndex.surtKey(null) == "")
    // a raw space in an (invalid but real-world) URL percent-encodes:
    // the CDXJ line format is space-delimited
    assert(WarcIndex.surtKey("https://ex.com/a b/c") == "com,ex)/a%20b/c")
    assert(!WarcIndex.surtKey("bad url\twith ws").exists(_.isWhitespace))
  }

  test("CDXJ round-trip: sorted lines, filename resolution, fetch") {
    import spark.implicits._
    val dir = tmpDir("cdxj-shards")
    val s1 = shard((0 until 8).map(i =>
      record("response", s"https://h${i % 3}.ex.com/p/$i",
        s"HTTP/1.1 200 OK\r\n\r\ndoc-$i")))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-0.warc.gz"), s1)
    val index = WarcIndex.indexWarc(spark, dir + "/*.warc.gz")
    val cdxDir = tmpDir("cdxj-out")
    WarcIndex.writeCdxj(index, cdxDir, nShards = 2)
    // lines are SURT-sorted within and across shards (range exchange)
    val lines = spark.read.text(cdxDir + "/part-*").as[String].collect()
    assert(lines.length == 8)
    val back = WarcIndex.readCdxj(spark, cdxDir + "/part-*")
    assert(back.count() == 8)
    assert(back.select("surt").as[String].collect().forall(_.contains(")")))
    // timestamp column digests the WARC-Date into the 14-digit form
    assert(back.select("timestamp").distinct().as[String].collect().toSeq ==
      Seq("20000101000000"))
    // filename -> directory resolution feeds the fetch path
    val hydrated = WarcIndex.fetchResponses(
      WarcIndex.withFileDir(back.filter(col("url").endsWith("/p/5")), dir))
      .select($"url", $"body".cast("string")).as[(String, String)].collect()
    assert(hydrated.toSeq == Seq(("https://h2.ex.com/p/5", "doc-5")))
  }

  test("readResponsesStream: shards stream in; only new files process") {
    import spark.implicits._
    val land = tmpDir("warc-stream-land")
    val out = tmpDir("warc-stream-out")
    val ckpt = tmpDir("warc-stream-ckpt")
    def run(): Unit = {
      val q = Warc.readResponsesStream(spark, land)
        .select(col("file"), col("url"), col("body").cast("string").as("text"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(land, "a.warc.gz"),
      shard(Seq(record("response", "https://st/1", "HTTP/1.1 200 OK\r\n\r\nuno"),
        record("request", "https://st/1", "GET /1 HTTP/1.1\r\n\r\n"))))
    run()
    val first = spark.read.parquet(out)
    assert(first.count() == 1) // requests filtered
    // a second landing file processes INCREMENTALLY (checkpointed seen-set)
    java.nio.file.Files.write(java.nio.file.Paths.get(land, "b.warc.gz"),
      shard(Seq(record("response", "https://st/2", "HTTP/1.1 200 OK\r\n\r\ndos"))))
    run()
    val all = spark.read.parquet(out)
      .select($"url", $"text").as[(String, String)].collect().toMap
    assert(all == Map("https://st/1" -> "uno", "https://st/2" -> "dos"))
  }
}
