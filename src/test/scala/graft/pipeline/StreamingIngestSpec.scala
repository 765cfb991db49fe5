package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.store.{ObjectStore, TableStore}

/** S1 — streaming ingest via the checkpointed file source: pre-existing
  * files process on the first run (S2 backfill), new files on the next,
  * and already-seen files are never reprocessed (the exactly-once upgrade
  * over the reference's at-least-once watchdog, SURVEY §7.4.5).
  */
class StreamingIngestSpec extends AnyFunSuite with SharedSpark {

  private val now = Timestamp.valueOf("2026-01-15 08:30:00")

  test("ingestStream processes backfill + new files exactly once") {
    val inbox = tmpDir("stream-inbox")
    val root = tmpDir("stream-store")
    val checkpoint = s"$root/checkpoint"
    Files.write(Paths.get(inbox, "first.pdf"),
      "Intro:\nSome body text here.\n".getBytes(StandardCharsets.UTF_8))

    val tables = new TableStore(spark, s"$root/tables")
    val objects = new ObjectStore(spark, s"$root/bucket")
    val pipe = new IngestPipeline(spark, tables, objects, ProcessingConfig())

    val q1 = pipe.ingestStream(inbox, checkpoint, Trigger.AvailableNow(), () => now)
    q1.awaitTermination()
    assert(tables.read("documents").count() == 1)

    // second run with the same checkpoint: only the new file is processed
    Files.write(Paths.get(inbox, "second.pdf"),
      "Notes:\nAnother body of text.\n".getBytes(StandardCharsets.UTF_8))
    val q2 = pipe.ingestStream(inbox, checkpoint, Trigger.AvailableNow(), () => now)
    q2.awaitTermination()

    val docs = tables.read("documents")
    assert(docs.count() == 2)
    // exactly-once: no duplicate filenames even though first.pdf still exists
    assert(docs.select("filename").distinct().count() == 2)
    // the replay guard's committed-batch marker advanced with the stream:
    // a crash-replayed batch at-or-below it is skipped wholesale. The
    // marker is checkpoint-scoped (`<checkpointId>:<batchId>`).
    val marker = tables.getTableProp("documents", "last_batch")
    assert(marker.exists(_.split(":", 2) match {
      case Array(id, b) => id.nonEmpty && b.toLong >= 0L
      case _            => false
    }), s"marker=$marker")
  }

  test("crash-replay of a committed batch on the SAME checkpoint is exactly-once") {
    val inbox = tmpDir("replay-inbox")
    val root = tmpDir("replay-store")
    val checkpoint = s"$root/checkpoint"
    Files.write(Paths.get(inbox, "only.pdf"),
      "Intro:\nReplayed body text.\n".getBytes(StandardCharsets.UTF_8))

    val tables = new TableStore(spark, s"$root/tables")
    val objects = new ObjectStore(spark, s"$root/bucket")
    val pipe = new IngestPipeline(spark, tables, objects, ProcessingConfig())

    val q1 = pipe.ingestStream(inbox, checkpoint, Trigger.AvailableNow(), () => now)
    q1.awaitTermination()
    val docsAfter = tables.read("documents").count()
    val chunksAfter = tables.read("document_chunks").count()
    assert(docsAfter == 1 && chunksAfter > 0)

    // simulate a crash AFTER the writes but BEFORE Spark recorded the
    // batch commit: delete the commits-log entry so the restarted query
    // re-delivers batch 0 through foreachBatch (the at-least-once window
    // the marker exists to close)
    val commit0 = Paths.get(checkpoint, "commits", "0")
    assert(Files.deleteIfExists(commit0), s"expected a commit log at $commit0")
    // the checksummed local FS keeps a `.0.crc` sidecar — leaving it
    // behind makes the replayed commit write fail as a (spurious)
    // concurrent-modification; a real crash loses both together
    Files.deleteIfExists(Paths.get(checkpoint, "commits", ".0.crc"))

    val q2 = pipe.ingestStream(inbox, checkpoint, Trigger.AvailableNow(), () => now)
    q2.awaitTermination()
    assert(tables.read("documents").count() == docsAfter,
      "replayed batch must not duplicate documents rows")
    assert(tables.read("document_chunks").count() == chunksAfter,
      "replayed batch must not duplicate chunk rows")
  }

  test("streaming re-crawl with replaceByFilename replaces a re-dropped filename") {
    import org.apache.spark.sql.functions.col
    val inbox = tmpDir("recrawl-inbox")
    val root = tmpDir("recrawl-store")
    val checkpoint = s"$root/checkpoint"
    // the realistic re-crawl shape: each crawl drops into its own dated
    // directory, so the checkpointed source (which keys seen-files by
    // PATH) re-delivers the same logical filename from a fresh path
    Files.createDirectories(Paths.get(inbox, "crawl1"))
    Files.write(Paths.get(inbox, "crawl1", "report.pdf"),
      "Intro:\nOriginal crawl body text here today.\n"
        .getBytes(StandardCharsets.UTF_8))
    val tables = new TableStore(spark, s"$root/tables")
    val objects = new ObjectStore(spark, s"$root/bucket")
    val pipe = new IngestPipeline(spark, tables, objects,
      ProcessingConfig(replaceByFilename = true, dedupByContent = true))
    val q1 = pipe.ingestStream(s"$inbox/*", checkpoint,
      Trigger.AvailableNow(), () => now)
    q1.awaitTermination()
    val first = tables.read("documents").collect()
    assert(first.length == 1)
    val id1 = first.head.getLong(first.head.fieldIndex("id"))

    Files.createDirectories(Paths.get(inbox, "crawl2"))
    Files.write(Paths.get(inbox, "crawl2", "report.pdf"),
      "Intro:\nRevised crawl body text entirely new.\n"
        .getBytes(StandardCharsets.UTF_8))
    val t2 = Timestamp.valueOf("2026-02-01 10:00:00")
    val q2 = pipe.ingestStream(s"$inbox/*", checkpoint,
      Trigger.AvailableNow(), () => t2)
    q2.awaitTermination()

    val docs = tables.read("documents").collect()
    assert(docs.length == 1, "same filename must replace, not duplicate")
    val row = docs.head
    assert(row.getLong(row.fieldIndex("id")) != id1,
      "the replacement gets a fresh id")
    assert(row.getTimestamp(row.fieldIndex("created_at")) == now,
      "created_at survives the replace")
    assert(row.getTimestamp(row.fieldIndex("updated_at")) == t2)
    assert(tables.read("document_chunks")
      .filter(col("text_content").contains("Revised")).count() == 1)
    assert(tables.read("document_chunks")
      .filter(col("text_content").contains("Original")).count() == 0)
  }

  test("a fresh checkpoint dir replays instead of silently skipping batches") {
    val inbox = tmpDir("fresh-ckpt-inbox")
    val root = tmpDir("fresh-ckpt-store")
    Files.write(Paths.get(inbox, "first.pdf"),
      "Intro:\nOriginal body text.\n".getBytes(StandardCharsets.UTF_8))

    val tables = new TableStore(spark, s"$root/tables")
    val objects = new ObjectStore(spark, s"$root/bucket")
    // content dedup keeps the deliberate replay from duplicating first.pdf
    val pipe = new IngestPipeline(spark, tables, objects,
      ProcessingConfig(dedupByContent = true))

    val q1 = pipe.ingestStream(inbox, s"$root/ckpt-a", Trigger.AvailableNow(), () => now)
    q1.awaitTermination()
    assert(tables.read("documents").count() == 1)

    // an operator re-points ingestion at a NEW checkpoint dir — batch ids
    // restart at 0, and the source re-discovers the whole inbox plus one
    // new file. Under the old unscoped marker (last_batch >= 0) this
    // batch was silently dropped; the checkpoint-scoped marker replays it.
    Files.write(Paths.get(inbox, "second.pdf"),
      "Notes:\nBrand new body text.\n".getBytes(StandardCharsets.UTF_8))
    val q2 = pipe.ingestStream(inbox, s"$root/ckpt-b", Trigger.AvailableNow(), () => now)
    q2.awaitTermination()

    val docs = tables.read("documents")
    assert(docs.count() == 2, "the new file must land despite the stale marker")
    assert(docs.select("filename").distinct().count() == 2)
  }

  test("archiveDir moves processed files out of the inbox (S14 parity)") {
    val inbox = tmpDir("archive-inbox")
    val archive = tmpDir("archive-dest")
    val root = tmpDir("archive-store")
    Files.write(Paths.get(inbox, "move-me.pdf"),
      "Heading:\nArchived body text.\n".getBytes(StandardCharsets.UTF_8))

    val tables = new TableStore(spark, s"$root/tables")
    val objects = new ObjectStore(spark, s"$root/bucket")
    val pipe = new IngestPipeline(spark, tables, objects, ProcessingConfig())

    // the source archives a batch's files only when a LATER batch commits
    // while the query is alive, so this runs a continuous trigger and
    // feeds a second file to push batch 0 past its commit point
    val q = pipe.ingestStream(inbox, s"$root/checkpoint",
      Trigger.ProcessingTime("500 milliseconds"), () => now,
      archiveDir = Some(archive))
    try {
      def docCount(): Long =
        // tolerate reading mid-append (dir created, no data files yet)
        try { if (tables.exists("documents")) tables.read("documents").count() else 0L }
        catch { case _: org.apache.spark.sql.AnalysisException => 0L }
      def waitFor(cond: () => Boolean, what: String): Unit = {
        val deadline = System.currentTimeMillis() + 60000
        while (!cond() && System.currentTimeMillis() < deadline)
          Thread.sleep(200)
        assert(cond(), what)
      }
      waitFor(() => docCount() == 1, "first file ingested")
      Files.write(Paths.get(inbox, "later.pdf"),
        "Next:\nSecond body text.\n".getBytes(StandardCharsets.UTF_8))
      waitFor(() => docCount() == 2, "second file ingested")
      def archived(): Boolean = {
        def walk(d: java.io.File): Seq[java.io.File] = {
          val kids = Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
          kids ++ kids.filter(_.isDirectory).flatMap(walk)
        }
        walk(new java.io.File(archive))
          .exists(x => x.isFile && x.getName == "move-me.pdf")
      }
      waitFor(() => archived(),
        "processed file should land under the archive dir")
      assert(!Files.exists(Paths.get(inbox, "move-me.pdf")),
        "processed file should leave the inbox")
    } finally q.stop()
  }

  test("compactEveryBatches bounds files without losing rows or the marker") {
    val inbox = tmpDir("compact-inbox")
    val root = tmpDir("compact-store")
    val checkpoint = s"$root/checkpoint"
    val tables = new TableStore(spark, s"$root/tables")
    val objects = new ObjectStore(spark, s"$root/bucket")
    val pipe = new IngestPipeline(spark, tables, objects,
      ProcessingConfig(compactEveryBatches = Some(1)))

    // three AvailableNow runs = three appended batches, each compacted;
    // without compaction the documents table would hold >=3 data files
    for (i <- 1 to 3) {
      Files.write(Paths.get(inbox, s"file$i.pdf"),
        s"Heading $i:\nBody text number $i.\n".getBytes(StandardCharsets.UTF_8))
      val q = pipe.ingestStream(inbox, checkpoint, Trigger.AvailableNow(), () => now)
      q.awaitTermination()
    }
    val docs = tables.read("documents")
    assert(docs.count() == 3)
    assert(docs.select("filename").distinct().count() == 3)

    def dataFiles(table: String): Seq[java.io.File] = {
      def walk(d: java.io.File): Seq[java.io.File] = {
        val kids = Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        kids ++ kids.filter(_.isDirectory).flatMap(walk)
      }
      walk(new java.io.File(s"$root/tables/$table")).filter(f =>
        f.isFile && f.getName.endsWith(".parquet") && !f.getName.startsWith(".") &&
          !f.getPath.split("/").exists(s => s.startsWith("_") || s.startsWith(".")))
    }
    assert(dataFiles("documents").size == 1,
      s"expected one compacted file, got ${dataFiles("documents")}")

    // the replay-guard marker survives the compaction's atomic swap
    // (sidecar props travel with the directory rename) — and still works:
    val marker = tables.getTableProp("documents", "last_batch")
    assert(marker.isDefined, "marker must survive compaction")
    val q4 = pipe.ingestStream(inbox, checkpoint, Trigger.AvailableNow(), () => now)
    q4.awaitTermination()
    assert(tables.read("documents").count() == 3,
      "a replayed/empty run after compaction must not re-ingest")
  }

  test("DEFAULT config compacts: a long stream's file count stays bounded") {
    // the default cadence must be ON — a default-config long-running
    // stream otherwise accumulates one file per table per trigger until
    // listings and the footer max-id pass degrade linearly
    assert(ProcessingConfig().compactEveryBatches.contains(16))

    val inbox = tmpDir("defcompact-inbox")
    val root = tmpDir("defcompact-store")
    val tables = new TableStore(spark, s"$root/tables")
    val pipe = new IngestPipeline(spark, tables,
      new ObjectStore(spark, s"$root/bucket"), ProcessingConfig())
    // 17 one-file micro-batches in ONE AvailableNow run (the per-batch
    // file cap splits the backlog): batch 15 crosses the default cadence
    for (i <- 1 to 17)
      Files.write(Paths.get(inbox, s"file$i.pdf"),
        s"Heading $i:\nBody text number $i.\n".getBytes(StandardCharsets.UTF_8))
    val q = pipe.ingestStream(inbox, s"$root/checkpoint", Trigger.AvailableNow(),
      () => now, maxFilesPerBatch = Some(1))
    q.awaitTermination()

    assert(tables.read("documents").count() == 17)
    def docFiles: Int = {
      def walk(d: java.io.File): Seq[java.io.File] = {
        val kids = Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        kids ++ kids.filter(_.isDirectory).flatMap(walk)
      }
      walk(new java.io.File(s"$root/tables/documents")).count(f =>
        f.isFile && f.getName.endsWith(".parquet") &&
          !f.getPath.split("/").exists(s => s.startsWith("_") || s.startsWith(".")))
    }
    // 17 appends, compacted once at batch 15: one packed file + the
    // post-cadence tail — far below one-file-per-batch
    assert(docFiles <= 3, s"default cadence must bound files, got $docFiles")
    // the cadence also declared + built the SERIAL stats manifest, so
    // later triggers' maxId answers the compacted bulk from the sidecar
    assert(tables.getTableProp("documents", "stats_cols").contains("id:int"))
    assert(new java.io.File(s"$root/tables/documents/_stats_manifest").exists(),
      "compaction cadence must have built the manifest")
  }

  test("the cadence never rewrites files the threshold calls compacted") {
    val inbox = tmpDir("nocompact-inbox")
    val root = tmpDir("nocompact-store")
    val checkpoint = s"$root/checkpoint"
    val tables = new TableStore(spark, s"$root/tables")
    val objects = new ObjectStore(spark, s"$root/bucket")
    // compactSmallBytes=1: every written file counts as already-compacted,
    // so each cadence must be a strict no-op — batch files accumulate and
    // their bytes are NEVER touched again. This pins the incremental
    // contract at the ingest level: per-cadence work is bounded by the
    // sub-threshold tail (here empty), not the table.
    val pipe = new IngestPipeline(spark, tables, objects,
      ProcessingConfig(compactEveryBatches = Some(1), compactSmallBytes = 1L))

    def docFiles(): Map[String, Long] = {
      def walk(d: java.io.File): Seq[java.io.File] = {
        val kids = Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        kids ++ kids.filter(_.isDirectory).flatMap(walk)
      }
      walk(new java.io.File(s"$root/tables/documents")).filter(f =>
        f.isFile && f.getName.endsWith(".parquet") &&
          !f.getPath.split("/").exists(s => s.startsWith("_") || s.startsWith(".")))
        .map(f => f.getName -> f.lastModified()).toMap
    }

    var seen = Map.empty[String, Long]
    for (i <- 1 to 3) {
      Files.write(Paths.get(inbox, s"f$i.pdf"),
        s"Part $i:\nBody $i.\n".getBytes(StandardCharsets.UTF_8))
      val q = pipe.ingestStream(inbox, checkpoint, Trigger.AvailableNow(), () => now)
      q.awaitTermination()
      val cur = docFiles()
      assert(cur.size > seen.size, s"batch $i should append file(s)")
      seen.foreach { case (name, mtime) =>
        assert(cur.get(name).contains(mtime),
          s"file $name from an earlier batch was rewritten by the cadence")
      }
      seen = cur
    }
    assert(tables.read("documents").count() == 3)
  }

  test("streaming ingest flags near-dups against earlier micro-batches") {
    val inbox = tmpDir("stream-neardup-inbox")
    val root = tmpDir("stream-neardup-store")
    val checkpoint = s"$root/checkpoint"
    Files.write(Paths.get(inbox, "base.pdf"),
      "T:\nalpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu.\n"
        .getBytes(StandardCharsets.UTF_8))
    val tables = new TableStore(spark, s"$root/tables")
    val objects = new ObjectStore(spark, s"$root/bucket")
    val pipe = new IngestPipeline(spark, tables, objects,
      ProcessingConfig(flagNearDups = true))

    val q1 = pipe.ingestStream(inbox, checkpoint, Trigger.AvailableNow(), () => now)
    q1.awaitTermination()
    assert(!tables.exists("near_dup_flags")) // nothing earlier to flag against

    // a later batch drops a light edit of base — the stored band index
    // from batch 1 must flag it
    Files.write(Paths.get(inbox, "edited.pdf"),
      "T:\nalpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu.\n"
        .getBytes(StandardCharsets.UTF_8))
    val q2 = pipe.ingestStream(inbox, checkpoint, Trigger.AvailableNow(), () => now)
    q2.awaitTermination()

    val idOf = tables.read("documents").select("filename", "id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val flags = tables.read("near_dup_flags")
      .select("new_id", "indexed_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flags == Set((idOf("edited.pdf"), idOf("base.pdf"))), s"$flags")
  }
}
