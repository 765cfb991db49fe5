package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.ops.{ExportIntegrity, TarExport}

/** Pins the continuous verified delivery (round 14): each micro-batch
  * lands as its own batch-<id>/ tar shard set, the root manifest is the
  * atomic commit pointer republished after every batch, replaying a
  * batch converges byte-identically (exactly-once delivery from
  * at-least-once execution), and the verified read enforces the
  * manifest across the nested layout.
  */
class StreamingExportSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def runDelivery(root: String, index: Boolean = false): Unit = {
    val feedDir = s"$root/feed"
    (0 until 3).foreach { b =>
      (0 until 30).filter(_ % 3 == b).map(i => (i.toLong, s"doc text $i"))
        .toDF("id", "txt").coalesce(1).write.mode("append").parquet(feedDir)
    }
    val feed = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, txt STRING"))
      .option("maxFilesPerTrigger", "1")
      .parquet(feedDir)
    StreamingExport.tarShards(feed, col("id"), Seq(col("id")),
      Seq("txt" -> col("txt")), 4L, s"$root/out", s"$root/ckpt",
      trigger = Trigger.AvailableNow(), index = index).awaitTermination()
  }

  test("each micro-batch lands under batch-<id>/ and the manifest covers the delivery") {
    val root = tmpDir("stream-export")
    runDelivery(root)
    val out = new java.io.File(s"$root/out")
    val batchDirs = out.listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(batchDirs.length == 3 && batchDirs.forall(_.startsWith("batch-")),
      s"three micro-batches → three batch dirs, got ${batchDirs.toSeq}")
    // 10 samples per batch at 4/shard → 3 shards per batch
    val manifest = ExportIntegrity.readManifest(spark, s"$root/out").collect()
    assert(manifest.length == 9, "manifest lists every committed shard")
    assert(manifest.map(_.getString(0)).forall(f =>
      f.matches("batch-\\d+/shard-\\d{5}\\.tar")),
      "manifest keys are root-relative nested paths")
    assert(ExportIntegrity.verify(spark, s"$root/out", "batch-*/shard-*.tar")
      .filter(col("status") =!= "ok").isEmpty,
      "the delivered tree verifies clean against its manifest")
    // the verified nested read returns every sample exactly once
    val samples = TarExport.readTarSamples(spark, s"$root/out",
        verifyManifest = true, glob = "batch-*/shard-*.tar")
      .select("key").as[String].collect().map(_.toInt).sorted
    assert(samples.toSeq == (0 until 30), "all samples delivered, none twice")
  }

  test("an indexed delivery serves random access and manifests its sidecars (r14)") {
    import spark.implicits._
    val root = tmpDir("stream-export-indexed")
    runDelivery(root, index = true)
    // the manifest covers tars AND their index sidecars — both are part
    // of what a loader downloads
    val manifest = ExportIntegrity.readManifest(spark, s"$root/out")
      .collect().map(_.getString(0))
    assert(manifest.count(_.endsWith(".tar")) == 9 &&
      manifest.count(_.endsWith(".tar.idx.jsonl")) == 9, manifest.toSeq)
    assert(ExportIntegrity.verify(spark, s"$root/out", "batch-*/shard-*.tar*")
      .filter(col("status") =!= "ok").isEmpty)
    // random access across the nested layout
    val got = TarExport.lookupTarSamples(spark, s"$root/out",
        Seq("7", "22").toDF("key"), glob = "batch-*/shard-*.tar")
      .as[(Long, String, Map[String, Array[Byte]])].collect()
      .map(r => r._2 -> new String(r._3("txt"), "UTF-8")).toMap
    assert(got == Map("7" -> "doc text 7", "22" -> "doc text 22"))
  }

  test("replaying a delivery converges byte-identically (exactly-once from at-least-once)") {
    val root = tmpDir("stream-export-replay")
    runDelivery(root)
    def treeShas(): Map[String, String] =
      ExportIntegrity.fingerprintFiles(spark, s"$root/out", "batch-*/shard-*.tar")
        .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    val first = treeShas()
    // a restarted query replays from a FRESH checkpoint: same feed, same
    // batch ids, and determinism makes every rewrite byte-identical
    val feed2 = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, txt STRING"))
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$root/feed")
    StreamingExport.tarShards(feed2, col("id"), Seq(col("id")),
      Seq("txt" -> col("txt")), 4L, s"$root/out", s"$root/ckpt2",
      trigger = Trigger.AvailableNow()).awaitTermination()
    assert(treeShas() == first, "replay rewrote identical bytes")
    assert(ExportIntegrity.verify(spark, s"$root/out", "batch-*/shard-*.tar")
      .filter(col("status") =!= "ok").isEmpty)
  }

  test("the manifest is the commit pointer: an unpublished batch is invisible to it") {
    val root = tmpDir("stream-export-pointer")
    runDelivery(root)
    // simulate a crash AFTER a later batch's shards committed but
    // BEFORE its manifest republish: shards on disk, manifest stale
    val extra = (100 until 104).map(i => (i.toLong, s"late doc $i"))
      .toDF("id", "txt")
    TarExport.writeTarShards(extra, col("id"), Seq(col("id")),
      Seq("txt" -> col("txt")), 4L, s"$root/out/batch-99").collect()
    val statuses = ExportIntegrity.verify(spark, s"$root/out", "batch-*/shard-*.tar")
      .collect().map(r => r.getString(0) -> r.getString(1))
    assert(statuses.count(_._2 == "unlisted") == 1 &&
      statuses.filter(_._2 == "unlisted").forall(_._1.startsWith("batch-99/")),
      "the unpublished batch reads as unlisted — not part of the delivery")
    assert(statuses.count(_._2 == "ok") == 9,
      "the published prefix still verifies clean")
    // a manifest-driven verified read of the PUBLISHED prefix refuses
    // the unlisted shard loudly if asked to read everything
    val e = intercept[org.apache.spark.SparkException] {
      TarExport.readTarShards(spark, s"$root/out",
        verifyManifest = true, glob = "batch-*/shard-*.tar").count()
    }
    assert(e.getMessage.contains("not in") ||
      Option(e.getCause).exists(_.getMessage.contains("not in")))
    // republish = commit: the late batch joins the delivery
    ExportIntegrity.writeManifest(spark, s"$root/out", "batch-*/shard-*.tar")
    assert(TarExport.readTarShards(spark, s"$root/out",
      verifyManifest = true, glob = "batch-*/shard-*.tar").count() == 34L)
  }
}
