package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** WET export (r18): byte-deterministic shards, atomic commit with no
  * temp debris, identity read-back, shard routing/ordering, report
  * integrity, and manifest composition.
  */
class WarcExportSpec extends AnyFunSuite with SharedSpark {

  private def docs(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, s"https://w.example.com/d/$i", s"text body $i repeated " * 3)
    }.toDF("id", "url", "text")
  }

  test("export round-trips identically and shards route by id % n") {
    import spark.implicits._
    val dir = tmpDir("wet-rt")
    val report = WarcExport.writeWetShards(docs(100), "id", "url", "text",
      dir, nShards = 4).collect()
    assert(report.length == 4)
    assert(report.map(_.getLong(1)).sum == 100) // n_records
    // payload_bytes counts TEXT bytes, not WARC framing
    val textBytes = docs(100).select("text").as[String]
      .collect().map(_.getBytes("UTF-8").length.toLong).sum
    assert(report.map(_.getLong(2)).sum == textBytes)
    val back = WarcExport.readWet(spark, dir + "/*.warc.gz")
    assert(back.count() == 100)
    // identity: every (url, text) survives byte-for-byte
    val orig = docs(100).select("url", "text").as[(String, String)]
      .collect().toSet
    assert(back.select("url", "text").as[(String, String)]
      .collect().toSet == orig)
    // shard routing: file name encodes id % 4
    val routed = back
      .withColumn("id", regexp_extract(col("url"), "/d/(\\d+)$", 1).cast("long"))
      .withColumn("shard", regexp_extract(col("file"), "shard-(\\d+)", 1).cast("long"))
    assert(routed.filter(pmod(col("id"), lit(4)) =!= col("shard")).count() == 0)
  }

  test("byte-deterministic: a re-export writes identical shard files") {
    val d1 = tmpDir("wet-a"); val d2 = tmpDir("wet-b")
    WarcExport.writeWetShards(docs(40), "id", "url", "text", d1, 2).collect()
    WarcExport.writeWetShards(docs(40), "id", "url", "text", d2, 2).collect()
    for (shard <- Seq("shard-00000.warc.gz", "shard-00001.warc.gz")) {
      val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(d1, shard))
      val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(d2, shard))
      assert(java.util.Arrays.equals(a, b), s"$shard differs across exports")
    }
  }

  test("report sha matches the committed file; no temp debris; manifest composes") {
    val dir = tmpDir("wet-sha")
    val report = WarcExport.writeWetShards(docs(30), "id", "url", "text",
      dir, nShards = 1).collect()
    assert(report.length == 1)
    val file = java.nio.file.Paths.get(dir, "shard-00000.warc.gz")
    val bytes = java.nio.file.Files.readAllBytes(file)
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(bytes).map("%02x".format(_)).mkString
    assert(report.head.getString(3) == sha)
    // no temp debris
    val leftovers = new java.io.File(dir).listFiles()
      .map(_.getName).filter(n => n.contains(".tmp"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
    // the format-agnostic manifest contract covers WET shards as-is
    ExportIntegrity.writeManifest(spark, dir)
    val verdicts = ExportIntegrity.verify(spark, dir)
      .select("status").collect().map(_.getString(0))
    assert(verdicts.nonEmpty && verdicts.forall(_ == "ok"))
  }

  test("mandatory WARC headers ride every exported record (r19)") {
    val asOf = java.time.Instant.parse("2026-03-01T12:00:00Z")
    val dir = tmpDir("wet-hdr")
    WarcExport.writeWetShards(docs(20), "id", "url", "text", dir, 1, asOf)
      .collect()
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "shard-00000.warc.gz"))
    val recs = graft.ext.Warc.parseAll(bytes)
    assert(recs.length == 20)
    recs.foreach { r =>
      // ISO 28500 §5.2-5.4 mandatories, content-derived + caller instant
      assert(r.headers("warc-date") == "2026-03-01T12:00:00Z")
      val rid = r.headers("warc-record-id")
      assert(rid == "<" + graft.ext.Warc.recordIdFor(r.targetUri, r.body) + ">",
        s"record id not content-derived: $rid")
      assert(r.headers.contains("content-length"))
    }
    // re-export at the SAME asOf stays byte-identical (ids are content-
    // derived, the date is the caller's — nothing wall-clock leaks in)
    val dir2 = tmpDir("wet-hdr2")
    WarcExport.writeWetShards(docs(20), "id", "url", "text", dir2, 1, asOf)
      .collect()
    val again = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir2, "shard-00000.warc.gz"))
    assert(java.util.Arrays.equals(bytes, again))
  }

  test("readWet replaces malformed UTF-8 with U+FFFD (foreign shards)") {
    import spark.implicits._
    // a FOREIGN WET shard whose conversion record carries invalid
    // UTF-8 (a lone 0xC3 truncated sequence + a stray continuation
    // byte): readWet must decode with replacement, never leak the raw
    // malformed bytes through as an unvalidated UTF8String
    val bad = "ok ".getBytes("UTF-8") ++
      Array[Byte](0xC3.toByte) ++ " mid ".getBytes("UTF-8") ++
      Array[Byte](0x80.toByte) ++ " end".getBytes("UTF-8")
    val rec = graft.ext.Warc.writeRecord("conversion",
      "https://foreign.example.com/x", "text/plain", bad)
    val dir = tmpDir("wet-malformed")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "foreign.warc.gz"),
      graft.ext.Warc.writeWarc(Seq(rec), gzipPerRecord = true))
    val text = WarcExport.readWet(spark, dir + "/*.warc.gz")
      .select("text").as[String].collect().head
    assert(text == "ok � mid � end",
      s"expected U+FFFD replacement, got ${text.map(_.toInt).mkString(",")}")
  }

  test("records inside a shard are id-ordered (byte-stable layout)") {
    import spark.implicits._
    val dir = tmpDir("wet-ord")
    WarcExport.writeWetShards(docs(50), "id", "url", "text", dir, 1).collect()
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "shard-00000.warc.gz"))
    val urls = graft.ext.Warc.parseAll(bytes).map(_.targetUri)
    val ids = urls.map(_.split("/d/").last.toLong)
    assert(ids == ids.sorted, "records not id-ordered within the shard")
    assert(ids.length == 50)
  }
}
