package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Pins the export-integrity surface (round 14): the manifest records
  * exactly the export's files with the SAME sha256 the tar exporter
  * streamed at write time (no trust in the write path), a manifest is
  * byte-deterministic, and `verify` classifies every corruption a
  * delivery hop can introduce — a flipped byte (`modified`), a lost
  * shard (`missing`), an alien file (`unlisted`) — while an intact
  * tree verifies clean. Also covers the JSONL exporter through the
  * same format-agnostic code path.
  */
class ExportIntegritySpec extends AnyFunSuite with SharedSpark {

  private def tarExport(dir: String) = {
    import spark.implicits._
    val df = (0 until 23).map { i =>
      (i.toLong, s"doc $i " * (i + 1))
    }.toDF("id", "txt")
    TarExport.writeTarShards(df, col("id"), Seq(col("id")),
      Seq("txt" -> col("txt")), 10L, dir).collect()
  }

  test("manifest matches the exporter's streamed hashes; intact tree verifies ok") {
    val dir = tmpDir("integrity-ok")
    val accounting = tarExport(dir)
    val manifest = ExportIntegrity.writeManifest(spark, dir, "shard-*.tar").collect()
    assert(manifest.map(_.getString(0)).toSeq ==
      Seq("shard-00000.tar", "shard-00001.tar", "shard-00002.tar"),
      "manifest lists exactly the shard files, sorted")
    // the independently-computed file hash equals the sha256 the writer
    // streamed while producing the shard — write path and verify path
    // agree bit-for-bit
    val bySha = accounting.map(r => f"shard-${r.getLong(0)}%05d.tar" -> r.getString(4)).toMap
    for (m <- manifest)
      assert(m.getString(2) == bySha(m.getString(0)),
        s"${m.getString(0)}: manifest sha must equal the accounting sha")
    val bad = ExportIntegrity.verify(spark, dir, "shard-*.tar")
      .filter(col("status") =!= "ok")
    assert(bad.isEmpty, "an untouched export verifies clean")
  }

  test("verify classifies modified, missing, and unlisted files") {
    val dir = tmpDir("integrity-tamper")
    tarExport(dir)
    ExportIntegrity.writeManifest(spark, dir, "shard-*.tar")
    // modified: flip one payload byte in shard 1 (size unchanged)
    val f1 = new java.io.File(dir, "shard-00001.tar")
    val raf = new java.io.RandomAccessFile(f1, "rw")
    try {
      raf.seek(600); val b = raf.read(); raf.seek(600); raf.write(b ^ 0x01)
    } finally raf.close()
    // a stale Hadoop checksum sidecar would fail the re-read before the
    // sha comparison; drop it like any non-Hadoop tamperer would
    new java.io.File(dir, ".shard-00001.tar.crc").delete()
    // missing: remove shard 2 (and its sidecar)
    assert(new java.io.File(dir, "shard-00002.tar").delete())
    new java.io.File(dir, ".shard-00002.tar.crc").delete()
    // unlisted: an alien file matching the shard glob
    val alien = new java.io.File(dir, "shard-00099.tar")
    val w = new java.io.FileOutputStream(alien)
    try w.write("not a shard".getBytes("UTF-8")) finally w.close()
    val statuses = ExportIntegrity.verify(spark, dir, "shard-*.tar")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(statuses == Map(
      "shard-00000.tar" -> "ok",
      "shard-00001.tar" -> "modified",
      "shard-00002.tar" -> "missing",
      "shard-00099.tar" -> "unlisted"))
  }

  test("manifest bytes are deterministic and the commit leaves no temp debris") {
    val dir = tmpDir("integrity-det")
    tarExport(dir)
    def manifestBytes(): Seq[Byte] = {
      ExportIntegrity.writeManifest(spark, dir, "shard-*.tar")
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, ExportIntegrity.ManifestName)).toSeq
    }
    val first = manifestBytes()
    assert(first.nonEmpty)
    assert(manifestBytes() == first, "re-publishing an unchanged export is byte-identical")
    val visible = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).toSeq
    assert(visible.count(_ == ExportIntegrity.ManifestName) == 1)
    assert(!visible.exists(n => n.contains(ExportIntegrity.ManifestName) &&
      n != ExportIntegrity.ManifestName), "no manifest temp debris")
  }

  test("the same surface covers JSONL shard exports (format-agnostic)") {
    import spark.implicits._
    val dir = tmpDir("integrity-jsonl")
    val df = (0 until 40).map(i => (i.toLong, s"line $i")).toDF("id", "s")
    assert(Export.writeJsonlShards(df, Seq(col("id")), 15L, dir) == 3L)
    val glob = "_shard=*/part-*"
    val manifest = ExportIntegrity.writeManifest(spark, dir, glob)
    assert(manifest.count() == 3L, "one gzipped part file per shard")
    assert(ExportIntegrity.verify(spark, dir, glob)
      .filter(col("status") =!= "ok").isEmpty)
  }

  test("verify-on-read enforces the manifest sha while streaming (r14)") {
    val dir = tmpDir("integrity-onread")
    tarExport(dir)
    ExportIntegrity.writeManifest(spark, dir, "shard-*.tar")
    // intact: verified read returns every entry
    assert(TarExport.readTarShards(spark, dir, verifyManifest = true)
      .count() == 23L)
    // flip a byte in shard 0's TRAILING PADDING: the tar parse cannot
    // see it (framing checksums cover headers, padding is dead bytes),
    // but the whole-file sha must — exactly the corruption class only
    // the manifest catches
    val f0 = new java.io.File(dir, "shard-00000.tar")
    val raf = new java.io.RandomAccessFile(f0, "rw")
    try {
      raf.seek(f0.length() - 1)
      val b = raf.read(); raf.seek(f0.length() - 1); raf.write(b ^ 0x01)
    } finally raf.close()
    // unverified read still parses clean — the corruption is invisible
    // to tar framing
    assert(TarExport.readTarShards(spark, dir).count() == 23L)
    val e = intercept[org.apache.spark.SparkException] {
      TarExport.readTarShards(spark, dir, verifyManifest = true).count()
    }
    assert(e.getMessage.contains("manifest sha") ||
      Option(e.getCause).exists(_.getMessage.contains("manifest sha")),
      s"expected the loud manifest-sha refusal, got: ${e.getMessage}")
    // an early-exiting read never reaches end-of-archive on the bad
    // shard's siblings: limit(1) neither checks nor spuriously fails
    assert(TarExport.readTarShards(spark, dir, verifyManifest = true)
      .limit(1).count() == 1L)
  }

  test("verifyQuick is one listing: sizes catch truncation, not same-size flips (r14)") {
    val dir = tmpDir("integrity-quick")
    tarExport(dir)
    ExportIntegrity.writeManifest(spark, dir, "shard-*.tar")
    // same-size flip in shard 0 — quick mode's DOCUMENTED blind spot
    val f0 = new java.io.File(dir, "shard-00000.tar")
    val raf = new java.io.RandomAccessFile(f0, "rw")
    try { raf.seek(600); val b = raf.read(); raf.seek(600); raf.write(b ^ 0x01) }
    finally raf.close()
    // truncation of shard 1 — the common delivery fault quick DOES catch
    val f1 = new java.io.File(dir, "shard-00001.tar")
    val ch = new java.io.FileOutputStream(f1, true).getChannel
    try ch.truncate(f1.length() - 512) finally ch.close()
    val quick = ExportIntegrity.verifyQuick(spark, dir, "shard-*.tar")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(quick == Map("shard-00000.tar" -> "ok",
      "shard-00001.tar" -> "modified", "shard-00002.tar" -> "ok"),
      s"quick mode sees lengths only: $quick")
    // the full sweep still catches the flip
    val full = ExportIntegrity.verify(spark, dir, "shard-*.tar")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(full("shard-00000.tar") == "modified" &&
      full("shard-00001.tar") == "modified")
  }

  test("shard assignment: round-robin order and LPT balance (r14)") {
    import spark.implicits._
    val dir = tmpDir("integrity-assign")
    tarExport(dir) // 23 samples / 10 → 3 shards
    val manifest = ExportIntegrity.writeManifest(spark, dir, "shard-*.tar")
    val rr = ExportIntegrity.assignShardsRoundRobin(manifest, 2)
      .orderBy("file").collect().map(r => r.getString(0) -> r.getInt(2))
    assert(rr.toSeq == Seq("shard-00000.tar" -> 0, "shard-00001.tar" -> 1,
      "shard-00002.tar" -> 0), "round-robin over sorted manifest order")
    // LPT on a skewed synthetic manifest: worker loads stay within the
    // classic bound (max <= avg + largest), every file lands exactly once,
    // and the assignment is deterministic
    val skewed = Seq(("a", 100L), ("b", 10L), ("c", 10L), ("d", 10L),
      ("e", 10L), ("f", 60L), ("g", 50L)).map { case (f, b) =>
      (f + ".tar", b, "x" * 64) }.toDF("file", "bytes", "sha256")
    val bal = ExportIntegrity.assignShardsBalanced(skewed, 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(bal.map(_._1).sorted.toSeq ==
      skewed.collect().map(_.getString(0)).sorted.toSeq, "every file once")
    val loads = bal.groupBy(_._3).view.mapValues(_.map(_._2).sum)
    val total = bal.map(_._2).sum
    assert(loads.values.max <= total / 3 + bal.map(_._2).max,
      s"LPT bound violated: $loads")
    val again = ExportIntegrity.assignShardsBalanced(skewed, 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(bal.toSeq == again.toSeq, "assignment is deterministic")
  }

  test("verify without a published manifest refuses loudly") {
    val dir = tmpDir("integrity-nomanifest")
    tarExport(dir)
    val e = intercept[java.io.IOException] {
      ExportIntegrity.verify(spark, dir, "shard-*.tar")
    }
    assert(e.getMessage.contains(ExportIntegrity.ManifestName))
  }

  test("incremental republish hashes only new files; history rides (r17)") {
    import spark.implicits._
    val root = tmpDir("integrity-incr")
    def batch(id: Int, docs: Int): Unit = {
      val df = (0 until docs).map(i => (i.toLong, s"b$id doc $i payload"))
        .toDF("id", "txt")
      TarExport.writeTarShards(df, col("id"), Seq(col("id")),
        Seq("txt" -> col("txt")), 4L, s"$root/batch-$id").collect()
    }
    batch(0, 9)
    // backdate the delivered batch (an hour-old delivery): rows inside
    // the republish's mtime-slack horizon deliberately never carry
    // (the coarse-granularity guard) — carry-forward is for HISTORY
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldMt = System.currentTimeMillis() - 3600 * 1000L
    ExportIntegrity.fingerprintFiles(spark, root, "batch-*/shard-*.tar")
      .collect().foreach { r =>
        fs.setTimes(new org.apache.hadoop.fs.Path(
          s"$root/${r.getString(0)}"), oldMt, -1)
      }
    val m0 = ExportIntegrity.writeManifestIncremental(spark, root,
      "batch-*/shard-*.tar").collect()
    assert(m0.length === 3)
    // corrupt a delivered batch-0 shard SAME-LENGTH and restore its
    // mtime: if the next republish re-hashed history, the new sha would
    // surface — carrying the ORIGINAL sha forward proves the file was
    // never re-read (per-batch hash opens are O(batch files))
    val victim = new java.io.File(s"$root/batch-0", m0.head.getString(0)
      .stripPrefix("batch-0/"))
    val vPath = new org.apache.hadoop.fs.Path(victim.getAbsolutePath)
    val mt0 = fs.getFileStatus(vPath).getModificationTime
    val raf = new java.io.RandomAccessFile(victim, "rw")
    try { raf.seek(600); val b = raf.read(); raf.seek(600); raf.write(b ^ 0x7f) }
    finally raf.close()
    fs.setTimes(vPath, mt0, -1)
    batch(1, 5)
    val m1 = ExportIntegrity.writeManifestIncremental(spark, root,
      "batch-*/shard-*.tar").collect()
    assert(m1.length === 5, "prior rows carried + new batch hashed")
    val sha0 = m0.map(r => r.getString(0) -> r.getString(2)).toMap
    val sha1 = m1.map(r => r.getString(0) -> r.getString(2)).toMap
    assert(sha0.forall { case (f, s) => sha1(f) == s },
      "history rows carried forward verbatim (files not re-read)")
    // ...and the full fingerprint sweep still catches what the stats
    // validation cannot — the division of labor the docstring declares
    val modified = ExportIntegrity.verify(spark, root, "batch-*/shard-*.tar")
      .filter(col("status") === "modified").collect()
    assert(modified.map(_.getString(0)).toSeq === Seq(m0.head.getString(0)))
    // a LENGTH change IS caught by the carry validation: that row
    // re-hashes on the next republish
    val grown = new java.io.FileOutputStream(victim, true)
    try grown.write("tail".getBytes) finally grown.close()
    val m2 = ExportIntegrity.writeManifestIncremental(spark, root,
      "batch-*/shard-*.tar").collect()
    val changedRow = m2.find(_.getString(0) == m0.head.getString(0)).get
    assert(changedRow.getString(2) != sha0(changedRow.getString(0)),
      "stat-changed file re-hashed")
    // incremental ≡ full republish on the final tree
    val full = ExportIntegrity.writeManifest(spark, root,
      "batch-*/shard-*.tar").collect()
    assert(m2.map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
      === full.map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq)
  }

  test("a stat-identical rewrite inside the mtime-slack horizon re-hashes (r18)") {
    import spark.implicits._
    val root = tmpDir("integrity-slack")
    val df = (0 until 9).map(i => (i.toLong, s"tick doc $i payload"))
      .toDF("id", "txt")
    TarExport.writeTarShards(df, col("id"), Seq(col("id")),
      Seq("txt" -> col("txt")), 4L, root).collect()
    val m0 = ExportIntegrity.writeManifestIncremental(spark, root,
      "shard-*.tar").collect()
    // same-length corruption with the mtime RESTORED — on a 1 s-granular
    // object store this is exactly "a replayed batch re-committed over a
    // torn write inside one tick": stats cannot see it
    val victim = new java.io.File(root, m0.head.getString(0))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vPath = new org.apache.hadoop.fs.Path(victim.getAbsolutePath)
    val mt0 = fs.getFileStatus(vPath).getModificationTime
    val raf = new java.io.RandomAccessFile(victim, "rw")
    try { raf.seek(600); val b = raf.read(); raf.seek(600); raf.write(b ^ 0x7f) }
    finally raf.close()
    fs.setTimes(vPath, mt0, -1)
    // the file is recent (within the slack horizon) → the republish must
    // NOT trust the carry: it re-hashes and surfaces the new sha
    val m1 = ExportIntegrity.writeManifestIncremental(spark, root,
      "shard-*.tar").collect()
    val sha0 = m0.map(r => r.getString(0) -> r.getString(2)).toMap
    val changed = m1.find(_.getString(0) == m0.head.getString(0)).get
    assert(changed.getString(2) != sha0(changed.getString(0)),
      "recent stat-identical rewrite must re-hash, not ride the carry")
    // ...whereas with the slack disabled the same rewrite would ride
    // (the trade the parameter exists to close)
    assert(ExportIntegrity.verify(spark, root, "shard-*.tar")
      .filter(col("status") =!= "ok").isEmpty)
  }

  test("pre-mtime manifests parse, re-hash once, then ride (r17)") {
    import spark.implicits._
    val root = tmpDir("integrity-oldfmt")
    val df = (0 until 9).map(i => (i.toLong, s"legacy doc $i payload"))
      .toDF("id", "txt")
    TarExport.writeTarShards(df, col("id"), Seq(col("id")),
      Seq("txt" -> col("txt")), 4L, root).collect()
    // publish in the r16 line format (no mtime field), bytes INTACT
    val rows = ExportIntegrity.fingerprintFiles(spark, root, "shard-*.tar")
      .collect()
    val legacy = rows.map(r =>
      s"""{"file":"${r.getString(0)}","bytes":${r.getLong(1)},""" +
        s""""sha256":"${r.getString(2)}"}""").mkString("", "\n", "\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, ExportIntegrity.ManifestName), legacy)
    // the optional-mtime parser reads it...
    val parsed = ExportIntegrity.readManifest(spark, root).collect()
    assert(parsed.map(_.getString(0)).toSeq === rows.map(_.getString(0)).toSeq)
    // ...and the incremental republish cannot validate mtime-less rows,
    // so it re-hashes them ONCE (same shas — the files are intact) and
    // stamps mtimes; the NEXT republish carries everything forward
    val m1 = ExportIntegrity.writeManifestIncremental(spark, root,
      "shard-*.tar").collect()
    assert(m1.map(r => (r.getString(0), r.getString(2))).toSeq
      === rows.map(r => (r.getString(0), r.getString(2))).toSeq)
    val clean = ExportIntegrity.verify(spark, root, "shard-*.tar")
      .filter(col("status") =!= "ok")
    assert(clean.isEmpty)
  }
}
