package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Pins the WebDataset-style tar shard export (round 13): byte-exact
  * round trip through a REAL tar parse, sample contiguity inside a
  * shard, deterministic (content-addressable) output, the missing-
  * modality null convention, and the ustar subset's guard rails. An
  * external check matters for an interchange format, so the header
  * layout is also verified field-by-field against the ustar spec
  * offsets rather than only through our own reader.
  */
class TarExportSpec extends AnyFunSuite with SharedSpark {

  private def sampleDf = {
    import spark.implicits._
    (0 until 23).map { i =>
      (i.toLong, s"text body $i " * (i + 1),
        Array.tabulate[Byte](i * 7 + 3)(j => ((i + j) % 251).toByte))
    }.toDF("id", "txt", "payload")
  }

  test("round trip: every entry's bytes survive; samples stay contiguous") {
    val dir = tmpDir("tar-export")
    val df = sampleDf
    val stats = TarExport.writeTarShards(df, col("id"), Seq(col("id")),
      Seq("txt" -> col("txt"), "bin" -> col("payload")), 10L, dir).collect()
    assert(stats.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L), "23 samples / 10 → 3 shards")
    assert(stats.map(_.getLong(1)).sum == 23L)
    assert(stats.map(_.getLong(2)).sum == 46L, "two entries per sample")
    val back = TarExport.readTarShards(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Array[Byte]]("content")))
    assert(back.length == 46)
    val byName = back.map(e => e._2 -> e._3).toMap
    for (r <- df.collect()) {
      val id = r.getLong(0)
      assert(new String(byName(s"$id.txt"), "UTF-8") == r.getString(1))
      assert(byName(s"$id.bin").toSeq == r.getAs[Array[Byte]]("payload").toSeq)
    }
    // WebDataset contiguity: inside each shard, a sample's entries are
    // adjacent and samples appear in ordinal (key) order
    val grouped = back.groupBy(_._1)
    for ((_, entries) <- grouped) {
      val keys = entries.map(_._2.split("\\.").head.toLong).toSeq
      assert(keys == keys.sorted, "entries must stream in sample order")
      keys.grouped(2).foreach(p => assert(p.distinct.size == 1,
        "one sample's entries must be contiguous"))
    }
    // payload accounting matches the data
    val expectedBytes = df.select(
      sum(length(encode(col("txt"), "UTF-8")) + length(col("payload"))))
      .head().getLong(0)
    assert(stats.map(_.getLong(3)).sum == expectedBytes)
  }

  test("the export is byte-deterministic — shards are content-addressable") {
    val d1 = tmpDir("tar-det1"); val d2 = tmpDir("tar-det2")
    for (d <- Seq(d1, d2))
      TarExport.writeTarShards(sampleDf, col("id"), Seq(col("id")),
        Seq("txt" -> col("txt"), "bin" -> col("payload")), 10L, d).collect()
    for (f <- new java.io.File(d1).listFiles().filter(_.getName.endsWith(".tar"))) {
      val a = java.nio.file.Files.readAllBytes(f.toPath)
      val b = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(d2, f.getName))
      assert(java.util.Arrays.equals(a, b), s"${f.getName} must be identical")
    }
  }

  test("a NULL entry column skips that modality for that sample only") {
    import spark.implicits._
    val dir = tmpDir("tar-null")
    val df = Seq((1L, "has caption", "cap"), (2L, "no caption", null))
      .toDF("id", "txt", "caption")
    TarExport.writeTarShards(df, col("id"), Seq(col("id")),
      Seq("txt" -> col("txt"), "cap" -> col("caption")), 10L, dir).collect()
    val names = TarExport.readTarShards(spark, dir)
      .select("name").as[String].collect().toSet
    assert(names == Set("1.txt", "1.cap", "2.txt"))
  }

  test("ustar header fields sit at the spec offsets with a valid checksum") {
    val h = TarExport.ustarHeader("0042.txt", 1234L)
    assert(h.length == 512)
    assert(new String(h, 0, 8, "US-ASCII") == "0042.txt")
    assert(h(8) == 0, "name is NUL-terminated")
    assert(new String(h, 100, 7, "US-ASCII") == "0000644") // mode
    assert(new String(h, 124, 11, "US-ASCII") == f"${1234L}%011o") // size
    assert(h(156) == '0', "regular-file typeflag")
    assert(new String(h, 257, 5, "US-ASCII") == "ustar" && h(262) == 0)
    assert(new String(h, 263, 2, "US-ASCII") == "00")
    // recompute the checksum the way any tar reader does
    val copy = h.clone()
    java.util.Arrays.fill(copy, 148, 156, ' '.toByte)
    val sum = copy.map(_ & 0xFF).sum
    assert(new String(h, 148, 6, "US-ASCII") == f"$sum%06o")
    // guard rails refuse rather than corrupt
    intercept[IllegalArgumentException] {
      TarExport.ustarHeader("x" * 101, 1L)
    }
    intercept[IllegalArgumentException] {
      TarExport.ustarHeader("ok", -1L)
    }
  }

  test("empty frame exports nothing; parse refuses truncated archives") {
    import spark.implicits._
    val dir = tmpDir("tar-empty")
    val stats = TarExport.writeTarShards(
      Seq.empty[(Long, String)].toDF("id", "txt"),
      col("id"), Seq(col("id")), Seq("txt" -> col("txt")), 10L, dir)
    assert(stats.collect().isEmpty)
    // header promises 600 bytes but only 100 follow → refuse, never a
    // silently-partial archive
    val truncated = TarExport.ustarHeader("a.txt", 600L) ++ Array.fill[Byte](100)(7)
    intercept[IllegalArgumentException] { TarExport.parseTar(truncated) }
  }
}
