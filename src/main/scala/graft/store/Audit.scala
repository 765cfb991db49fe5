package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Store-consistency audit: the invariants the ingest pipeline maintains
  * (FK integrity, dense chunk ordinals, denormalized counts, cross-store
  * blob linkage, bucket-convention agreement, index/flag referential
  * integrity), each checked as a distributed anti-join or aggregate — no
  * driver-side iteration, so the audit runs at corpus scale as one Spark
  * job per check.
  *
  * The reference has no consistency checker (its FKs live in Postgres);
  * over immutable files the invariants are maintained by write ordering
  * (SURVEY §7.4.4) and THIS audit is how an operator verifies them after
  * a crash, a partial migration, or bucket-convention surgery.
  */
object Audit {

  /** One row per check: (check, violations). All-zero = healthy. Missing
    * tables audit as empty — checks are phrased so absence counts what it
    * implies (e.g. blobs with no chart_data table at all are ALL orphans,
    * the first-batch crash window).
    */
  def check(spark: SparkSession, tables: TableStore,
            objects: ObjectStore): DataFrame = {
    import spark.implicits._

    // shared inputs are cached for the audit's lifetime: documents feeds
    // ~6 checks, the object listing 2, and document_chunks — typically
    // the LARGEST table — 5; re-reading any of them per check would
    // multiply the audit's dominant scan/LIST cost by the check count
    val cached = scala.collection.mutable.Map.empty[String, DataFrame]
    def cnt(df: => DataFrame): Long = df.count()
    def ifTable(name: String)(body: DataFrame => Long): Long =
      if (!tables.exists(name)) 0L
      else body(cached.getOrElseUpdate(name, tables.read(name).cache()))
    val docs = (if (tables.exists("documents")) tables.read("documents")
                else Seq.empty[(Long, String, Long)]
                  .toDF("id", "filename", "total_chunks")).cache()
    // seed the map with the already-cached frame so a check reaching
    // documents via ifTable shares docs' one cache entry instead of
    // caching a second copy of the audit's widest-fanout table
    if (tables.exists("documents")) cached.update("documents", docs)
    val docIds = docs.select(col("id"))
    val keys = objects.listKeys().cache()

    val results = Seq.newBuilder[(String, Long)]
    try {

    // FK integrity: every child row points at a stored document
    results += "chunks_orphaned" -> ifTable("document_chunks")(ch =>
      cnt(ch.join(docIds, ch("document_id") === docIds("id"), "left_anti")))
    results += "charts_orphaned" -> ifTable("chart_data")(ch =>
      cnt(ch.join(docIds, ch("document_id") === docIds("id"), "left_anti")))

    // dense ordinals: chunk_index must be exactly 0..n-1 per document —
    // count/min/max alone would pass [0,1,1,3] (duplicate compensating a
    // gap), so distinctness is part of the predicate
    results += "chunk_index_not_dense" -> ifTable("document_chunks")(ch =>
      cnt(ch.groupBy("document_id")
        .agg(count(lit(1)).as("n"), countDistinct("chunk_index").as("nd"),
          min("chunk_index").as("lo"), max("chunk_index").as("hi"))
        .filter(col("lo") =!= 0 || col("hi") =!= col("n") - 1 ||
          col("nd") =!= col("n"))))

    // denormalized count drift (repository.py:22 parity). Null-safe
    // compare: a NULL total_chunks is drift, not a pass; a missing chunks
    // table means every nonzero total_chunks is drift
    results += "total_chunks_mismatch" -> {
      val actual =
        if (tables.exists("document_chunks"))
          cached.getOrElseUpdate("document_chunks",
            tables.read("document_chunks").cache())
            .groupBy(col("document_id")).agg(count(lit(1)).as("actual"))
        else Seq.empty[(Long, Long)].toDF("document_id", "actual")
      cnt(docs.join(actual, docs("id") === actual("document_id"), "left_outer")
        .filter(!(col("total_chunks") <=> coalesce(col("actual"), lit(0L)))))
    }

    // cross-store linkage: every chart row's blob exists, every stored
    // blob has a row (orphan blobs are the reference's documented
    // crash-mode leftovers — SURVEY §7.4.4 — surfaced here for cleanup;
    // with no chart_data table at all, EVERY blob is an orphan)
    results += "blobs_missing" -> ifTable("chart_data")(ch =>
      cnt(ch.join(keys, ch("image_path") === keys("key"), "left_anti")))
    results += "blobs_orphaned" -> {
      if (tables.exists("chart_data")) {
        val ch = tables.read("chart_data")
        cnt(keys.join(ch, keys("key") === ch("image_path"), "left_anti"))
      } else cnt(keys)
    }

    // bucket convention: every chunk's doc_bucket must agree with the
    // stored `_graft_buckets` marker — a partial re-bucket leaves rows
    // that partition pruning (ChunkBucketPruning) would silently skip
    results += "bucket_mismatch" -> ifTable("document_chunks") { ch =>
      tables.getTableProp("document_chunks", "buckets").map(_.toLong) match {
        case Some(b) =>
          // null-safe: a NULL doc_bucket (__HIVE_DEFAULT_PARTITION__) is
          // exactly a row pruning would skip — it must count as mismatch
          cnt(ch.filter(!(col("doc_bucket") <=>
            graft.pipeline.IngestPipeline.chunkBucket(col("document_id"), b.toInt))))
        case None => 0L
      }
    }

    // primary-key uniqueness: the dense-id SERIAL replacement reads
    // maxId before appending, so a crashed-and-retried or racing batch
    // is precisely how duplicate ids arise — every other check passes
    // on a duplicated id while serving joins silently fan out.
    // count(id) ignores NULLs, so a null id (a different defect,
    // reported below) never masquerades as a duplicate
    def dupIds(df: DataFrame, idCol: String): Long =
      df.agg((count(col(idCol)) - countDistinct(col(idCol))).as("d"))
        .head().getLong(0)
    def nullIds(df: DataFrame, idCol: String): Long =
      df.filter(col(idCol).isNull).count()
    // documents goes through the CACHED frame (it feeds ~6 checks)
    results += "document_ids_duplicated" -> dupIds(docs, "id")
    results += "chunk_ids_duplicated" ->
      ifTable("document_chunks")(dupIds(_, "id"))
    results += "chart_ids_duplicated" -> ifTable("chart_data")(dupIds(_, "id"))
    // per-table like the sibling duplicate checks — a nonzero count must
    // name the table it was found in
    results += "document_ids_null" -> nullIds(docs, "id")
    results += "chunk_ids_null" -> ifTable("document_chunks")(nullIds(_, "id"))
    results += "chart_ids_null" -> ifTable("chart_data")(nullIds(_, "id"))

    // [EXT] near-dup index/flags reference stored documents only (a doc
    // dangling in both flag roles counts once — final distinct)
    results += "bands_dangling" -> ifTable("minhash_bands")(b =>
      cnt(b.select(col("doc_id")).distinct()
        .join(docIds, col("doc_id") === docIds("id"), "left_anti")))
    results += "flags_dangling" -> ifTable("near_dup_flags")(f =>
      cnt(f.select(col("new_id").as("doc_id"))
        .union(f.select(col("indexed_id").as("doc_id"))).distinct()
        .join(docIds, col("doc_id") === docIds("id"), "left_anti")))

    results.result().toDF("check", "violations")
    } finally {
      docs.unpersist()
      keys.unpersist()
      cached.values.foreach(_.unpersist())
    }
  }

  /** Reclaim orphan chart blobs — the tolerated crash-mode leftovers the
    * `blobs_orphaned` check surfaces (ingest writes blobs BEFORE rows,
    * SURVEY §7.4.4, so a mid-batch crash strands blobs whose rows never
    * committed). Orphans = stored keys with no `chart_data.image_path`
    * referencing them; the delete is distributed ([[ObjectStore.deleteAll]])
    * and idempotent. Returns the number of blobs removed.
    *
    * MUST run inside the single-writer maintenance window (no concurrent
    * ingest): the same blob-before-row ordering means a live batch's
    * just-written blobs look orphaned until their rows commit — a racing
    * GC would delete them and manufacture the dangling-row state the
    * write ordering exists to prevent.
    *
    * Refuses (throws) when `chart_data` is absent but swap debris
    * (`.old-*`/`.tmp-*` siblings) exists: that is a table TRANSIENTLY
    * absent mid-crashed-swap whose rows — and therefore whose blob
    * references — are recoverable, not a first-batch crash where every
    * blob is genuinely orphaned. Deleting on that state would turn a
    * recoverable table crash into permanent blob loss.
    */
  def gcOrphanBlobs(tables: TableStore, objects: ObjectStore): Long = {
    val keys = objects.listKeys()
    val orphans =
      if (!tables.exists("chart_data")) {
        if (tables.hasSwapDebris("chart_data"))
          throw new IllegalStateException(
            "chart_data is absent but .old-*/.tmp-* swap siblings exist — " +
              "run TableStore.recoverSwapDebris(\"chart_data\") before " +
              "running blob GC; its rows still reference stored blobs")
        keys // table never existed: the first-batch crash, all blobs orphan
      } else keys.join(
        tables.read("chart_data").select(col("image_path")),
        keys("key") === col("image_path"), "left_anti")
    // pin the orphan set so the bucket listing + anti-join run ONCE for
    // both the count and the delete (re-planning would double the GC's
    // dominant scan cost on a large bucket), and count BEFORE deleting:
    // deleteAll's running tally undercounts when a task retry re-deletes
    // already-absent keys; the pre-counted set is exact under the
    // single-writer window
    orphans.persist()
    try {
      val n = orphans.count()
      objects.deleteAll(orphans)
      n
    } finally orphans.unpersist()
  }

  /** Operational storage report — one row per named table with the
    * numbers a corpus-scale operator polls ([[TableStore.tableReport]]:
    * files, bytes, the small-file tail the next compaction cadence
    * rewrites, partition dirs, manifest declaration + coverage, writer
    * lease state, swap-debris flag). Metadata only: one listing and one
    * sidecar read per table, no Spark job per check — pollable from a
    * dashboard at any cadence.
    */
  def storageReport(spark: SparkSession, tables: TableStore,
                    names: Seq[String],
                    smallThreshold: Long = 32L * 1024 * 1024): DataFrame = {
    import spark.implicits._
    names.map(tables.tableReport(_, smallThreshold)).toDF()
  }
}
