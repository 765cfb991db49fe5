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

  private def sha256hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(b).map("%02x".format(_)).mkString

  test("resolveRevisits: digest match, refers-to fallback, dangling nulls, fetch-once") {
    import spark.implicits._
    val dir = tmpDir("warcindex-revisit")
    val asOf = java.time.Instant.parse("2026-01-05T00:00:00Z")
    val body = "HTTP/1.1 200 OK\r\n\r\noriginal-payload"
    val payload = "original-payload".getBytes(iso)
    val payloadDigest = "sha256:" + sha256hex(payload)
    val origId = "urn:test:orig-1"
    val orig = Warc.writeRecord("response", "https://rv/orig", "application/http",
      body.getBytes(iso), asOf, origId,
      Seq("WARC-Payload-Digest" -> payloadDigest))
    // revisit 1: declares the payload digest (the Common Crawl shape)
    val rev1 = Warc.writeRecord("revisit", "https://rv/again1",
      "application/http", Array.emptyByteArray,
      java.time.Instant.parse("2026-02-01T00:00:00Z"), "urn:test:rev-1",
      Seq("WARC-Payload-Digest" -> payloadDigest,
        "WARC-Refers-To" -> s"<$origId>"))
    // revisit 2: NO digest — only the refers-to record-id link
    val rev2 = Warc.writeRecord("revisit", "https://rv/again2",
      "application/http", Array.emptyByteArray,
      java.time.Instant.parse("2026-03-01T00:00:00Z"), "urn:test:rev-2",
      Seq("WARC-Refers-To" -> s"<$origId>"))
    // revisit 3: dangling — digest and refers-to match nothing
    val rev3 = Warc.writeRecord("revisit", "https://rv/dangling",
      "application/http", Array.emptyByteArray,
      java.time.Instant.parse("2026-04-01T00:00:00Z"), "urn:test:rev-3",
      Seq("WARC-Payload-Digest" -> ("sha256:" + "0" * 64),
        "WARC-Refers-To" -> "<urn:test:no-such>"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "rv.warc.gz"),
      shard(Seq(orig, rev1, rev2, rev3)))
    val index = WarcIndex.indexWarc(spark, dir + "/*.warc.gz")
    // the new header columns surface (brackets stripped from id URIs)
    val origRow = index.filter(col("warc_type") === "response").collect().head
    assert(origRow.getAs[String]("record_id") == origId)
    assert(origRow.getAs[String]("payload_digest") == payloadDigest)
    assert(index.filter(col("warc_type") === "revisit")
      .filter(col("refers_to") === origId).count() == 2)
    val obs = WarcIndex.resolveRevisits(index).cache()
    assert(obs.count() == 4) // 1 response + 3 revisits: NO observation lost
    val byUrl = obs.collect().map(r => r.getAs[String]("url") -> r).toMap
    // direct response: points at itself
    assert(!byUrl("https://rv/orig").getAs[Boolean]("via_revisit"))
    val o = byUrl("https://rv/orig")
    // digest-matched and refers-to-matched revisits point at the ORIGINAL
    for (u <- Seq("https://rv/again1", "https://rv/again2")) {
      val r = byUrl(u)
      assert(r.getAs[Boolean]("via_revisit"))
      assert(r.getAs[String]("orig_url") == "https://rv/orig")
      assert(r.getAs[Long]("offset") == o.getAs[Long]("offset"))
      assert(r.getAs[Long]("length") == o.getAs[Long]("length"))
      assert(r.getAs[Int]("status") == 200)
    }
    // each observation keeps its OWN capture date
    assert(byUrl("https://rv/again1").getAs[String]("warc_date") ==
      "2026-02-01T00:00:00Z")
    // dangling: URL kept, member pointer null (documented policy)
    val dang = byUrl("https://rv/dangling")
    assert(dang.getAs[Boolean]("via_revisit") &&
      dang.getAs[String]("orig_url") == null && dang.isNullAt(dang.fieldIndex("file")))
    // hydration fetches the original's member EXACTLY ONCE for the
    // three observations that share it (fetch-once accounting)
    val before = WarcIndex.fetchedMemberCount.sum()
    val hydrated = WarcIndex.hydrateObservations(obs).cache()
    assert(hydrated.count() == 4)
    assert(WarcIndex.fetchedMemberCount.sum() - before == 1L,
      "three observations of one original must range-read one member")
    val texts = hydrated.filter(col("body").isNotNull)
      .select($"url", $"body".cast("string")).as[(String, String)]
      .collect().toMap
    assert(texts.size == 3 && texts.values.forall(_ == body))
    assert(hydrated.filter(col("url") === "https://rv/dangling")
      .select("body").collect().head.isNullAt(0))
    obs.unpersist(); hydrated.unpersist()
  }

  test("resolveRedirects: chains, relative Location, cycle, dangling, maxHops") {
    import spark.implicits._
    val dir = tmpDir("warcindex-redirect")
    def http(status: Int, location: String, body: String): String = {
      val loc = if (location == null) "" else s"Location: $location\r\n"
      s"HTTP/1.1 $status x\r\n${loc}Content-Type: text/html\r\n\r\n$body"
    }
    val recs = Seq(
      // 2-hop chain; first Location RELATIVE (resolves against /start/a)
      record("response", "https://rd.ex.com/start/a", http(301, "/mid/a", "")),
      record("response", "https://rd.ex.com/mid/a",
        http(302, "https://rd.ex.com/final/a", "")),
      record("response", "https://rd.ex.com/final/a", http(200, null, "landed")),
      // 2-cycle
      record("response", "https://rd.ex.com/loop1", http(301, "/loop2", "")),
      record("response", "https://rd.ex.com/loop2", http(301, "/loop1", "")),
      // dangling target
      record("response", "https://rd.ex.com/gone", http(301, "/nowhere", "")),
      // long chain to pin the maxHops bound: c0 -> c1 -> ... -> c6 -> 200
      (0 until 6).map(i =>
        record("response", s"https://rd.ex.com/c$i", http(301, s"/c${i + 1}", ""))),
      record("response", "https://rd.ex.com/c6", http(200, null, "deep"))
    ).flatMap {
      case one: Array[Byte] => Seq(one)
      case many: Seq[_] => many.asInstanceOf[Seq[Array[Byte]]]
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "rd.warc.gz"),
      shard(recs))
    val index = WarcIndex.indexWarc(spark, dir + "/*.warc.gz").cache()
    assert(index.filter(col("location").isNotNull).count() == 11)
    val out = WarcIndex.resolveRedirects(index, maxHops = 8)
      .as[(String, String, Int, Option[Int])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.size == 13)
    assert(out("https://rd.ex.com/start/a") ==
      (("https://rd.ex.com/final/a", 2, Some(200))))
    assert(out("https://rd.ex.com/mid/a") ==
      (("https://rd.ex.com/final/a", 1, Some(200))))
    assert(out("https://rd.ex.com/final/a") ==
      (("https://rd.ex.com/final/a", 0, Some(200))))
    // cycle: stops at the last NEW url, 3xx marks it unresolved
    assert(out("https://rd.ex.com/loop1") ==
      (("https://rd.ex.com/loop2", 1, Some(301))))
    assert(out("https://rd.ex.com/loop2") ==
      (("https://rd.ex.com/loop1", 1, Some(301))))
    // dangling: resolved target URL, null status
    assert(out("https://rd.ex.com/gone") ==
      (("https://rd.ex.com/nowhere", 1, None)))
    // deep chain resolves inside maxHops=8...
    assert(out("https://rd.ex.com/c0") ==
      (("https://rd.ex.com/c6", 6, Some(200))))
    // ...but a tighter bound leaves it 3xx (bounded, never infinite)
    val tight = WarcIndex.resolveRedirects(index, maxHops = 3)
      .filter(col("request_url") === "https://rd.ex.com/c0")
      .as[(String, String, Int, Option[Int])].collect().head
    assert(tight._2 == "https://rd.ex.com/c3" && tight._3 == 3 &&
      tight._4 == Some(301))
    index.unpersist()
  }

  test("resolveRedirects: junk Location values terminate as dangling") {
    import spark.implicits._
    val dir = tmpDir("warcindex-junkloc")
    // real crawls carry garbage Location headers: a %-soup token, an
    // empty-ish value, a mailto scheme — the walk must terminate each
    // as a dangling hop (no match in the target table), never throw
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "junk.warc.gz"),
      shard(Seq(
        record("response", "https://jk.ex.com/a",
          "HTTP/1.1 301 x\r\nLocation: %%%not a url%%%\r\n\r\n"),
        record("response", "https://jk.ex.com/b",
          "HTTP/1.1 302 x\r\nLocation: mailto:x@y.z\r\n\r\n"),
        record("response", "https://jk.ex.com/c", "HTTP/1.1 200 OK\r\n\r\nok"))))
    val out = WarcIndex.resolveRedirects(
      WarcIndex.indexWarc(spark, dir + "/*.warc.gz"), maxHops = 3)
      .as[(String, String, Int, Option[Int])].collect()
      .map(r => r._1 -> r).toMap
    assert(out.size == 3)
    // both junk hops take exactly one step and land nowhere (null status)
    assert(out("https://jk.ex.com/a")._3 == 1 &&
      out("https://jk.ex.com/a")._4.isEmpty)
    assert(out("https://jk.ex.com/b")._3 == 1 &&
      out("https://jk.ex.com/b")._4.isEmpty)
    assert(out("https://jk.ex.com/c") ==
      (("https://jk.ex.com/c", "https://jk.ex.com/c", 0, Some(200))))
    // plan-growth guard: the walk must stay LINEAR in maxHops (a
    // branch-per-hop formulation grows ~4^hops plan nodes and hangs
    // long before 16) — a deep walk over this 3-row index must both
    // plan and execute promptly
    val deep = WarcIndex.resolveRedirects(
      WarcIndex.indexWarc(spark, dir + "/*.warc.gz"), maxHops = 16)
    assert(deep.count() == 3)
  }

  test("indexWarcDelta: three arrival waves, O(new shards) opens") {
    import spark.implicits._
    val land = tmpDir("warcindex-delta")
    def drop(name: String, lo: Int, hi: Int): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(land, name),
        shard((lo until hi).map(i => record("response",
          s"https://dl/d/$i", s"HTTP/1.1 200 OK\r\n\r\nd-$i")))): Unit
    val empty = spark.emptyDataFrame.withColumn("file",
      lit(null).cast("string")).limit(0)
    var acc: org.apache.spark.sql.DataFrame = null
    var opens = List.empty[Long]
    for ((n, lo, hi) <- Seq(("w1.warc.gz", 0, 5), ("w2.warc.gz", 5, 12),
      ("w3.warc.gz", 12, 20))) {
      drop(n, lo, hi)
      val before = WarcIndex.openedShardCount.sum()
      val delta = WarcIndex.indexWarcDelta(spark, land + "/*.warc.gz",
        if (acc == null) empty else acc).cache()
      delta.count(): Unit // materialize so the open counter settles
      opens :+= (WarcIndex.openedShardCount.sum() - before)
      acc = if (acc == null) delta else acc.unionByName(delta)
    }
    // each wave opened ONLY its new shard
    assert(opens == List(1L, 1L, 1L), s"opens per wave: $opens")
    // the accumulated index equals the one-shot batch index
    val oneShot = WarcIndex.indexWarc(spark, land + "/*.warc.gz")
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .select($"file", $"offset", $"length", $"url", $"digest")
      .as[(String, Long, Long, String, String)].collect().toSet
    assert(key(acc) == key(oneShot))
    assert(acc.count() == 20)
  }

  test("frontierDiff: uncaptured + stale vs the captured index") {
    import spark.implicits._
    val dir = tmpDir("warcindex-frontier")
    val d1 = java.time.Instant.parse("2026-01-10T00:00:00Z")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "f.warc.gz"),
      shard(Seq(
        Warc.writeRecord("response", "https://fr.ex.com/kept",
          "application/http", "HTTP/1.1 200 OK\r\n\r\nk".getBytes(iso), d1, null),
        Warc.writeRecord("response", "https://fr.ex.com/old",
          "application/http", "HTTP/1.1 200 OK\r\n\r\no".getBytes(iso), d1, null))))
    val index = WarcIndex.indexWarc(spark, dir + "/*.warc.gz")
    val entries = Seq(
      ("https://fr.ex.com/kept", "2026-01-02"), // captured after lastmod: current
      ("https://fr.ex.com/old", "2026-02-01"), // lastmod postdates capture: stale
      ("https://fr.ex.com/new", "2026-01-01"), // never captured
      ("https://fr.ex.com/nolastmod", null) // never captured, no lastmod
    ).toDF("loc", "lastmod")
    val out = WarcIndex.frontierDiff(entries, index)
      .select($"loc", $"reason").as[(String, String)].collect().toMap
    assert(out == Map(
      "https://fr.ex.com/old" -> "stale",
      "https://fr.ex.com/new" -> "uncaptured",
      "https://fr.ex.com/nolastmod" -> "uncaptured"))
    // SURT keying: a www./case variant of a captured URL is NOT uncaptured
    val variant = Seq(("https://WWW.fr.ex.com/kept", null.asInstanceOf[String]))
      .toDF("loc", "lastmod")
    assert(WarcIndex.frontierDiff(variant, index).count() == 0)
  }

  test("indexWarcStream: landing shards index incrementally; equals batch") {
    import spark.implicits._
    val land = tmpDir("warcindex-stream-land")
    val out = tmpDir("warcindex-stream-out")
    val ckpt = tmpDir("warcindex-stream-ckpt")
    def run(): Unit = {
      val q = WarcIndex.indexWarcStream(spark, land + "/*.warc.gz")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def drop(name: String, lo: Int, hi: Int): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(land, name),
        shard((lo until hi).map(i => record("response",
          s"https://si/d/$i", s"HTTP/1.1 200 OK\r\n\r\ns-$i")))): Unit
    drop("a.warc.gz", 0, 3)
    val before = WarcIndex.openedShardCount.sum()
    run()
    assert(spark.read.parquet(out).count() == 3)
    // the second wave indexes ONLY the new shard (checkpointed seen-set)
    drop("b.warc.gz", 3, 5)
    run()
    assert(WarcIndex.openedShardCount.sum() - before == 2L,
      "two waves over two shards must open each exactly once")
    val streamed = spark.read.parquet(out)
    val batch = WarcIndex.indexWarc(spark, land + "/*.warc.gz")
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .select($"file", $"offset", $"length", $"url", $"digest", $"record_id")
      .as[(String, Long, Long, String, String, String)].collect().toSet
    assert(key(streamed) == key(batch))
    assert(streamed.count() == 5)
  }

  test("CDXJ round-trips the revisit/redirect enrichment fields") {
    import spark.implicits._
    val dir = tmpDir("cdxj-enrich")
    val redirect = Warc.writeRecord("response", "https://en.ex.com/hop",
      "application/http",
      "HTTP/1.1 301 x\r\nLocation: /end\r\n\r\n".getBytes(iso))
    val end = record("response", "https://en.ex.com/end",
      "HTTP/1.1 200 OK\r\n\r\nfin")
    val revisit = Warc.writeRecord("revisit", "https://en.ex.com/again",
      "message/http", Array.emptyByteArray, Warc.DefaultExportInstant,
      "urn:test:rv", Seq("WARC-Payload-Digest" -> "sha256:abc",
        "WARC-Refers-To" -> "<urn:test:orig>"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "en.warc.gz"),
      shard(Seq(redirect, end, revisit)))
    val cdxDir = tmpDir("cdxj-enrich-out")
    WarcIndex.writeCdxj(WarcIndex.indexWarc(spark, dir + "/*.warc.gz"),
      cdxDir, nShards = 1)
    val back = WarcIndex.readCdxj(spark, cdxDir + "/part-*").cache()
    // plain captures read back as responses; the revisit keeps its type
    assert(back.filter(col("warc_type") === "response").count() == 2)
    val rv = back.filter(col("url") === "https://en.ex.com/again")
      .collect().head
    assert(rv.getAs[String]("warc_type") == "revisit")
    assert(rv.getAs[String]("payload_digest") == "sha256:abc")
    assert(rv.getAs[String]("refers_to") == "urn:test:orig")
    assert(rv.getAs[String]("record_id") == "urn:test:rv")
    // the redirect row keeps its Location; the 200 row has none
    val hop = back.filter(col("url") === "https://en.ex.com/hop")
      .collect().head
    assert(hop.getAs[Int]("status") == 301 &&
      hop.getAs[String]("location") == "/end")
    assert(back.filter(col("url") === "https://en.ex.com/end")
      .collect().head.getAs[String]("location") == null)
    back.unpersist()
  }

  test("writeIndexTable: SURT-clustered files, host-prefix lookup prunes") {
    import spark.implicits._
    val dir = tmpDir("warcindex-table-shards")
    // 3 hosts x 40 docs, interleaved across two shards so the CLUSTERING
    // (not the arrival order) is what makes prefix lookups prunable
    def recs(lo: Int, hi: Int) = (lo until hi).map(i =>
      record("response", s"https://h${i % 3}.tix.com/p/$i",
        s"HTTP/1.1 200 OK\r\n\r\nt-$i"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.warc.gz"),
      shard(recs(0, 60)))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.warc.gz"),
      shard(recs(60, 120)))
    val index = WarcIndex.indexWarc(spark, dir + "/*.warc.gz")
    val root = tmpDir("warcindex-table")
    val ts = new graft.store.TableStore(spark, root)
    WarcIndex.writeIndexTable(index, ts, "cdx", nShards = 6)
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()
    val total = scannedFiles(ts.read("cdx"))
    assert(total >= 4, s"clustered write should spread files, got $total")
    // host-prefix lookup: exact vs the plain filter AND file-pruned —
    // one host's contiguous SURT band straddles a bounded file count
    val hit = ts.readPrefix("cdx", "surt", "com,tix,h1)")
    val want = ts.read("cdx").filter(col("surt").startsWith("com,tix,h1)"))
      .select("url").as[String].collect().toSet
    assert(hit.select("url").as[String].collect().toSet == want)
    assert(want.size == 40)
    val planned = scannedFiles(hit)
    assert(planned < total && planned <= total / 2 + 1,
      s"host-prefix lookup planned $planned of $total files")
    // a prefix past every key plans nothing; hydration composes
    assert(ts.readPrefix("cdx", "surt", "zz,zz)").isEmpty)
    val one = WarcIndex.fetchResponses(
      ts.readPrefix("cdx", "surt", "com,tix,h2)/p/23"))
      .select($"url", $"body".cast("string")).as[(String, String)].collect()
    assert(one.toSeq == Seq(("https://h2.tix.com/p/23", "t-23")))
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
