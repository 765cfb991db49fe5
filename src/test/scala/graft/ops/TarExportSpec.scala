package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Pins the WebDataset-style tar shard export (round 13): byte-exact
  * round trip through a REAL tar parse, sample contiguity inside a
  * shard, deterministic (content-addressable) output, the missing-
  * modality null convention, pax long names, loud truncation failure,
  * and the commit protocol (no visible partial shards). Framing is
  * commons-compress — already on every Spark classpath — so checksums
  * are verified on read rather than trusted.
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
    // no temp debris among VISIBLE files: the commit rename leaves
    // exactly the shard files (hidden Hadoop .crc sidecars may ride
    // along — they are invisible to the shard-*.tar glob and carry a
    // valid checksum for the committed bytes)
    assert(new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq ==
      Seq("shard-00000.tar", "shard-00001.tar", "shard-00002.tar"))
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
    // the accounting sha256 IS the committed file's hash — a downloader
    // can verify its copy against the manifest row
    val md = java.security.MessageDigest.getInstance("SHA-256")
    for (s <- stats) {
      val f = java.nio.file.Paths.get(dir, f"shard-${s.getLong(0)}%05d.tar")
      val fileSha = md.digest(java.nio.file.Files.readAllBytes(f))
        .map("%02x".format(_)).mkString
      assert(s.getString(4) == fileSha,
        s"shard ${s.getLong(0)} content address must match its bytes")
    }
  }

  test("the export is byte-deterministic — shards are content-addressable") {
    val d1 = tmpDir("tar-det1"); val d2 = tmpDir("tar-det2")
    for (d <- Seq(d1, d2))
      TarExport.writeTarShards(sampleDf, col("id"), Seq(col("id")),
        Seq("txt" -> col("txt"), "bin" -> col("payload")), 10L, d).collect()
    val files = new java.io.File(d1).listFiles().filter(_.getName.endsWith(".tar"))
    assert(files.nonEmpty)
    for (f <- files) {
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

  test("names past the 100-byte ustar field ride pax headers, not refusals") {
    import spark.implicits._
    val dir = tmpDir("tar-longname")
    val longKey = "source/very/deep/namespace/" + ("x" * 90)
    val df = Seq((longKey, "payload")).toDF("k", "txt")
    TarExport.writeTarShards(df, col("k"), Seq(col("k")),
      Seq("txt" -> col("txt")), 10L, dir).collect()
    val back = TarExport.readTarShards(spark, dir).collect()
    assert(back.length == 1 && back.head.getString(1) == s"$longKey.txt")
  }

  test("a truncated shard fails the read loudly, never silently partial") {
    val dir = tmpDir("tar-trunc")
    TarExport.writeTarShards(sampleDf, col("id"), Seq(col("id")),
      Seq("txt" -> col("txt"), "bin" -> col("payload")), 100L, dir).collect()
    val f = java.nio.file.Paths.get(dir, "shard-00000.tar")
    val full = java.nio.file.Files.readAllBytes(f)
    // cut mid-archive: a partially-copied shard must not read as a
    // smaller-but-healthy archive
    java.nio.file.Files.write(f, full.take(full.length / 2))
    val e = intercept[org.apache.spark.SparkException] {
      TarExport.readTarShards(spark, dir).count()
    }
    assert(e.getMessage != null)
  }

  test("a limit() that stops mid-shard leaves no open tar stream (r14)") {
    val dir = tmpDir("tar-limit")
    // one 23-sample, 46-entry shard: limit(1) must abandon 45 entries
    TarExport.writeTarShards(sampleDf, col("id"), Seq(col("id")),
      Seq("txt" -> col("txt"), "bin" -> col("payload")), 100L, dir).collect()
    assert(TarExport.openTarStreams.get() == 0L, "counter must start clean")
    val one = TarExport.readTarShards(spark, dir).limit(1).collect()
    assert(one.length == 1)
    // the task completion listener closes the abandoned stream at task
    // exit; collect() returns after the tasks complete, so the counter
    // is already drained (small grace loop for scheduler teardown)
    val deadline = System.currentTimeMillis() + 5000
    while (TarExport.openTarStreams.get() != 0L &&
      System.currentTimeMillis() < deadline) Thread.sleep(10)
    assert(TarExport.openTarStreams.get() == 0L,
      "a partially-consumed shard iterator must not leak its stream")
  }

  test("an entry over the size cap is refused loudly before allocation (r14)") {
    val dir = tmpDir("tar-cap")
    TarExport.writeTarShards(sampleDf, col("id"), Seq(col("id")),
      Seq("txt" -> col("txt")), 100L, dir).collect()
    val e = intercept[org.apache.spark.SparkException] {
      TarExport.readTarShards(spark, dir, maxEntryBytes = Some(5L)).count()
    }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
    assert(msg != null && msg.contains("refusing the allocation"),
      s"cap refusal must be loud and attributed, got: $msg")
    // and the refused stream is closed, not stranded
    val deadline = System.currentTimeMillis() + 5000
    while (TarExport.openTarStreams.get() != 0L &&
      System.currentTimeMillis() < deadline) Thread.sleep(10)
    assert(TarExport.openTarStreams.get() == 0L)
  }

  test("re-exporting over existing shards never exposes an absence window (r14)") {
    val dir = tmpDir("tar-recommit")
    def export(): Unit =
      TarExport.writeTarShards(sampleDf, col("id"), Seq(col("id")),
        Seq("txt" -> col("txt"), "bin" -> col("payload")), 10L, dir).collect()
    export()
    val shard = java.nio.file.Paths.get(dir, "shard-00000.tar")
    assert(java.nio.file.Files.exists(shard), "dest exists before re-commit")
    val before = java.nio.file.Files.readAllBytes(shard)
    // poll the shard's existence continuously while a second export
    // commits over it: the rename-over must leave a readable copy
    // visible at every instant (delete-then-rename had a gap here)
    @volatile var stop = false
    @volatile var absences = 0L
    @volatile var polls = 0L
    val poller = new Thread(() => {
      while (!stop) {
        if (!java.nio.file.Files.exists(shard)) absences += 1
        polls += 1
      }
    })
    poller.start()
    try { export(); export() } finally { stop = true; poller.join(10000) }
    assert(polls > 0, "the poller must have actually observed the window")
    assert(absences == 0L,
      s"shard read as absent $absences/$polls polls during re-commit")
    assert(java.nio.file.Files.exists(shard), "dest exists after re-commit")
    assert(java.util.Arrays.equals(before,
      java.nio.file.Files.readAllBytes(shard)),
      "deterministic bytes: either attempt's copy is the same copy")
  }

  test("readTarSamples regroups contiguous entries into samples without a shuffle (r14)") {
    import spark.implicits._
    val dir = tmpDir("tar-samples")
    // 23 samples, 10/shard → samples cross shard boundaries at 9|10 and
    // 19|20; a dotted key must survive whole; the null modality must be
    // ABSENT from the map, not null-valued
    val df = (0 until 23).map { i =>
      (f"k.$i%02d", s"text $i", if (i % 4 == 0) s"cap $i" else null)
    }.toDF("id", "txt", "cap")
    TarExport.writeTarShards(df, col("id"), Seq(col("id")),
      Seq("txt" -> col("txt"), "cap" -> col("cap")), 10L, dir).collect()
    val samples = TarExport.readTarSamples(spark, dir)
    // exactly ONE exchange in the plan — the round-robin shard
    // distribution inherited from readTarShards; the regrouping itself
    // is a per-partition fold, never a groupBy(key) shuffle of the
    // corpus (string form because AQE's AdaptiveSparkPlanExec hides
    // physical children from TreeNode.collect)
    val p = samples.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size == 1,
      s"sample regrouping must not add a shuffle:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"no key-hash exchange — the fold rides the shard distribution:\n$p")
    val rows = samples
      .as[(Long, String, Map[String, Array[Byte]])].collect()
    assert(rows.length == 23, "one row per sample")
    assert(rows.map(_._2).toSet == (0 until 23).map(i => f"k.$i%02d").toSet,
      "dotted keys survive whole (extension split is at the LAST dot)")
    for ((shard, key, entries) <- rows) {
      val i = key.stripPrefix("k.").toInt
      assert(shard == i / 10, s"sample $key must sit in its ordinal shard")
      val expected = if (i % 4 == 0) Set("txt", "cap") else Set("txt")
      assert(entries.keySet == expected,
        s"sample $key: a skipped modality is absent, got ${entries.keySet}")
      assert(new String(entries("txt"), "UTF-8") == s"text $i")
      if (i % 4 == 0)
        assert(new String(entries("cap"), "UTF-8") == s"cap $i")
    }
  }

  test("writeTarShardsByBytes packs next-fit under the byte budget (r14)") {
    import spark.implicits._
    val dir = tmpDir("tar-bybytes")
    // skewed lengths: most docs frame to 1024 bytes, every 7th to 2560,
    // and doc 20 is OVERSIZED (frames past the whole budget)
    def text(i: Int): String =
      if (i == 20) "y" * 10000 else if (i % 7 == 0) "x" * 2000 else "z" * 100
    val df = (0 until 40).map(i => (i.toLong, text(i))).toDF("id", "txt")
    val budget = 4096L
    def framed(i: Int): Long = 512L * (1 + (text(i).length + 511) / 512)
    // the contract, re-derived: next-fit on the exclusive running total
    val expectedShard = (0 until 40).scanLeft(0L)((acc, i) => acc + framed(i))
      .init.map(_ / budget)
    val stats = TarExport.writeTarShardsByBytes(df, col("id"), Seq(col("id")),
      Seq("txt" -> col("txt")), budget, dir).collect()
    val samples = TarExport.readTarSamples(spark, dir)
      .select(col("shard"), col("key")).as[(Long, String)].collect()
      .map { case (sh, k) => k.toInt -> sh }.toMap
    for (i <- 0 until 40)
      assert(samples(i) == expectedShard(i),
        s"doc $i: expected shard ${expectedShard(i)}, got ${samples(i)}")
    // the oversized doc sits alone, and the numbering skips the shard
    // ids its bytes span (monotone, not dense)
    val oversizedShard = expectedShard(20)
    assert(expectedShard.count(_ == oversizedShard) == 1, "oversized doc is alone")
    assert(expectedShard(21) - oversizedShard >= 2, "numbering skips past it")
    // every shard's FRAMED payload stays under budget + its last sample
    val perShard = (0 until 40).groupBy(expectedShard(_))
    for ((sh, docs) <- perShard) {
      val total = docs.map(framed).sum
      assert(total <= budget + framed(docs.max),
        s"shard $sh framed total $total breaks the next-fit bound")
    }
    assert(stats.map(_.getLong(1)).sum == 40L, "accounting covers every sample")
    assert(stats.map(_.getLong(0)).toSeq == stats.map(_.getLong(0)).toSeq.sorted)
  }

  test("compactTarShards re-shards a batch delivery into budget shards (r14)") {
    import spark.implicits._
    val src = tmpDir("tar-compact-src")
    // a 3-batch streaming-style delivery, multimodal with null skips
    for (b <- 0 until 3) {
      val df = (0 until 30).filter(_ % 3 == b).map { i =>
        (i.toLong, s"text body $i " * (i + 1),
          if (i % 4 == 0) s"cap $i" else null)
      }.toDF("id", "txt", "cap")
      TarExport.writeTarShards(df, col("id"), Seq(col("id")),
        Seq("txt" -> col("txt"), "cap" -> col("cap")), 4L,
        s"$src/batch-$b").collect()
    }
    def samplesOf(path: String, glob: String) =
      TarExport.readTarSamples(spark, path, glob = glob)
        .as[(Long, String, Map[String, Array[Byte]])].collect()
        .map(r => r._2 -> r._3.view.mapValues(_.toSeq).toMap).toMap
    val before = samplesOf(src, "batch-*/shard-*.tar")
    val dest = tmpDir("tar-compact-dst")
    val stats = TarExport.compactTarShards(spark, src, dest, 4096L,
      glob = "batch-*/shard-*.tar").collect()
    assert(stats.length > 1, "the budget must actually split the corpus")
    val after = samplesOf(dest, "shard-*.tar")
    assert(after == before, "compaction preserves every sample byte-for-byte")
    // entries inside a compacted sample are extension-sorted ("cap"
    // before "txt"): the map column carries no order, the writer makes
    // the re-export deterministic by sorting
    val entryNames = TarExport.readTarShards(spark, dest)
      .select("name").as[String].collect()
    val byKey = entryNames.grouped(1).flatten.toSeq
      .groupBy(_.split("\\.").head)
    for ((k, names) <- byKey if names.length == 2)
      assert(names.map(_.split("\\.").last).toSeq == Seq("cap", "txt"),
        s"sample $k entries must stream extension-sorted, got $names")
    // byte-determinism: a second compaction writes the identical tree
    // (this one indexed — the tar bytes must not change, and the epoch
    // snapshot then serves random access directly)
    val dest2 = tmpDir("tar-compact-dst2")
    TarExport.compactTarShards(spark, src, dest2, 4096L,
      glob = "batch-*/shard-*.tar", index = true).collect()
    def shas(p: String) = ExportIntegrity.fingerprintFiles(spark, p, "shard-*.tar")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(shas(dest) == shas(dest2),
      "compaction is byte-deterministic (and indexing never alters tar bytes)")
    val hit = TarExport.lookupTarSamples(spark, dest2, Seq("8").toDF("key"))
      .as[(Long, String, Map[String, Array[Byte]])].collect()
    assert(hit.length == 1 &&
      new String(hit.head._3("txt"), "UTF-8") == "text body 8 " * 9,
      "random access into the compacted epoch snapshot")
  }

  test("indexed export writes per-sample offsets; lookups seek straight to a sample (r14)") {
    import spark.implicits._
    val dir = tmpDir("tar-index")
    val df = (0 until 23).map { i =>
      (f"k.$i%02d", s"text $i " * (i + 1), if (i % 4 == 0) s"cap $i" else null)
    }.toDF("id", "txt", "cap")
    TarExport.writeTarShards(df, col("id"), Seq(col("id")),
      Seq("txt" -> col("txt"), "cap" -> col("cap")), 10L, dir,
      index = true).collect()
    // one sidecar per shard, committed next to it
    val names = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq
    assert(names.count(_.endsWith(".tar")) == 3 &&
      names.count(_.endsWith(".tar.idx.jsonl")) == 3, names)
    val idx = TarExport.readTarIndex(spark, dir)
      .orderBy("shard", "offset").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(idx.length == 23, "one index row per sample")
    // offsets: first sample of every shard at 0, strictly increasing,
    // and each equals the previous offset plus the previous sample's
    // exact framed size (512 header + padded payload per entry)
    for (sh <- 0L to 2L) {
      val rows = idx.filter(_._1 == sh)
      assert(rows.head._3 == 0L, s"shard $sh starts at offset 0")
      val expected = rows.scanLeft(0L) { (acc, r) =>
        val i = r._2.stripPrefix("k.").toInt
        val txt = 512L * (1 + ((s"text $i " * (i + 1)).length + 511) / 512)
        val cap = if (i % 4 == 0) 512L * (1 + (s"cap $i".length + 511) / 512) else 0L
        acc + txt + cap
      }.init
      assert(rows.map(_._3).toSeq == expected.toSeq,
        s"shard $sh offsets must equal the framed running total")
    }
    // random access: a key subset comes back byte-identical to the
    // sequential read, absent keys return no row, dotted keys survive
    val wanted = Seq("k.03", "k.08", "k.20", "nope").toDF("key")
    val got = TarExport.lookupTarSamples(spark, dir, wanted)
      .as[(Long, String, Map[String, Array[Byte]])].collect()
      .map(r => r._2 -> r._3.view.mapValues(_.toSeq).toMap).toMap
    val seq = TarExport.readTarSamples(spark, dir)
      .as[(Long, String, Map[String, Array[Byte]])].collect()
      .map(r => r._2 -> r._3.view.mapValues(_.toSeq).toMap).toMap
    assert(got.keySet == Set("k.03", "k.08", "k.20"), "absent keys return no row")
    for (k <- got.keySet)
      assert(got(k) == seq(k), s"lookup of $k must equal the sequential read")
    // the default (unindexed) export stays sidecar-free
    val dir2 = tmpDir("tar-noindex")
    TarExport.writeTarShards(df, col("id"), Seq(col("id")),
      Seq("txt" -> col("txt")), 10L, dir2).collect()
    assert(!new java.io.File(dir2).listFiles()
      .exists(_.getName.endsWith(".idx.jsonl")))
  }

  test("empty frame exports nothing") {
    import spark.implicits._
    val dir = tmpDir("tar-empty")
    val stats = TarExport.writeTarShards(
      Seq.empty[(Long, String)].toDF("id", "txt"),
      col("id"), Seq(col("id")), Seq("txt" -> col("txt")), 10L, dir)
    assert(stats.collect().isEmpty)
  }
}
