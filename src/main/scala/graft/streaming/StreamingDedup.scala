package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessorWithInitialState, StreamingQuery, TTLConfig, TimeMode, TimerValues, Trigger}

import graft.ext.Dedup

/** [EXT] Streaming stateful near-duplicate detection: a continuous crawl
  * feed checked against EVERYTHING previously ingested, without ever
  * re-scanning the corpus. The batch near-dup family (`Dedup.*`) answers
  * "which documents in this corpus are near-dups of each other"; this
  * answers the always-on ingestion question — "is the document that just
  * arrived a near-dup of anything we have EVER seen" — with cost per
  * arrival proportional to its own collision buckets, not to history.
  *
  * Mechanics: each document's 60-bit SimHash (the engine-wide md5-token
  * convention, [[Dedup.simhash60Scalar]] — bit-identical to the batch
  * path and to the DuckDB oracle) splits into four 15-bit pigeonhole
  * bands; any pair within Hamming distance 3 shares at least one exact
  * band. Each (band, chunk) bucket is one key in the streaming STATE
  * STORE holding the (id, signature) list of every prior document that
  * hashed into it; an arriving document compares only against its four
  * buckets and appends itself, and a pair is emitted the moment the
  * LATER document arrives. A fifth, id-keyed GUARD bucket per document
  * (r18) holds its (id → signature) registration and emits nothing —
  * it is what makes the content-stable-id contract EXACT (see below).
  *
  * Scale story (the 100 TB argument):
  *  - state is SHARDED BY BUCKET KEY across the cluster — the standard
  *    state-store hash partitioning; no node holds the corpus index;
  *  - a new document's work is O(its bucket occupancy), the streaming
  *    analog of the batch band equi-join — never all-pairs, never a
  *    corpus rescan;
  *  - a bucket whose occupancy passes `maxBucketDocs` fails LOUDLY
  *    instead of silently degrading recall or quietly going quadratic —
  *    that many documents sharing one 15-bit band chunk is boilerplate
  *    saturation, which wants pre-filtering, not near-dup pairing
  *    (guard buckets are exempt: they hold ~corpus/2^15 registrations
  *    by design and never do pairwise work);
  *  - state per document is five entries of three longs (id, signature,
  *    first-seen batch timestamp): ~24 bytes × corpus per band + the
  *    guard registration, ~120 bytes/doc total — a billion-document
  *    history is ~120 GB of state cluster-wide, checkpointed
  *    incrementally by the state store; with a `retention` window the
  *    history term becomes the WINDOW's arrival volume (entries age
  *    out and are reclaimed on their bucket's next visit, and
  *    [[liveStateEntries]] + a reseed sweep reclaim the buckets no
  *    arrival ever revisits);
  *  - state writes are PER ENTRY, not per bucket (r17): the core runs on
  *    `transformWithState` with a RocksDB-backed `MapState` — each (id,
  *    signature) is its own state-store key, so an arrival into a hot
  *    100k-doc bucket writes ONE 16-byte entry per band instead of
  *    re-serializing the whole 1.6 MB bucket value; per-trigger state
  *    write volume is O(new documents), whatever the occupancy;
  *  - an EXISTING corpus seeds state in one distributed write
  *    ([[seedEntries]] + the `initialEntries` hook — Spark's
  *    `StatefulProcessorWithInitialState`): the 100 TB migration path
  *    is "batch-dedup the corpus, seed the detector with its banded
  *    signatures, stream from today" — never a replay of history
  *    through the stream;
  *  - exactly-once: signatures ride the checkpoint, replayed source rows
  *    are recognized by id inside their bucket and re-emit nothing, and
  *    the parquet sink's manifest log makes replayed batch outputs
  *    idempotent. IDs must be CONTENT-STABLE: re-ingesting an id with a
  *    DIFFERENT signature fails loudly — EXACTLY, not best-effort: the
  *    guard bucket is keyed by the id itself, so every reuse meets its
  *    prior registration whatever the new signature hashes to (mixed
  *    old/new signatures across a doc's four bands would silently
  *    corrupt recall). Re-ingested changed documents need a new id
  *    (the content-hash id convention); ids whose entries aged out of
  *    the retention window re-register freely.
  *
  * Emission contract: a qualifying pair is emitted exactly when its
  * later member first arrives, once PER AGREEING BAND (up to four rows);
  * readers take DISTINCT — deduplicating across buckets in-stream would
  * need a second stateful exchange per batch for rows that are already
  * deterministic duplicates. The emitted SET equals the batch
  * [[Dedup.simhashNearDupPairs]] over the union of everything fed
  * (seeded corpus included — seed-internal pairs belong to the batch
  * dedup that produced the seed), for every interleaving of arrivals —
  * which is what lets a closed-form oracle check the streaming path.
  */
object StreamingDedup {

  /** Guard-bucket key namespace: band buckets live in [0, 4·2^15); each
    * document also registers in one id-keyed guard bucket at
    * `GuardBase + murmur3(id) mod 2^15`.
    */
  private[streaming] val GuardBase: Long = 4L << 15

  /** The bucket detection loop shared by the streaming processor and the
    * batch path: `seen` holds the bucket's prior (id → signature)
    * entries; arrivals process in ascending id order so a same-batch
    * pair is emitted by its later member, exactly as if the two had
    * arrived apart; `persist` is called once per NEW document (the
    * streaming path's O(1) per-entry state write; a no-op in batch,
    * where there is no later trigger to serve).
    */
  private def detectInBucket(seen: scala.collection.mutable.LongMap[Long],
                             rows: Iterator[(Long, Long, Long)],
                             maxHamming: Int, maxBucketDocs: Int,
                             persist: (Long, Long) => Unit)
      : Iterator[(Long, Long, Long)] = {
    val out = List.newBuilder[(Long, Long, Long)]
    for ((id, sig, _) <- rows.toArray.sortBy(_._1)) {
      if (seen.contains(id)) {
        // replayed id: re-emit nothing. A reused id with different
        // content is caught EXACTLY by its guard bucket; this in-band
        // check is defense-in-depth for the same defect.
        if (seen(id) != sig) throw contentUnstable(id, seen(id), sig)
      } else {
        seen.foreach { case (oid, osig) =>
          val h = java.lang.Long.bitCount(sig ^ osig)
          if (h <= maxHamming)
            out += ((math.min(id, oid), math.max(id, oid), h.toLong))
        }
        seen.update(id, sig)
        persist(id, sig)
      }
    }
    // state-growth guard: a bucket past the cap means one band
    // chunk is shared by maxBucketDocs documents — boilerplate
    // saturation, where per-arrival compare cost and state size
    // stop being "near-dup density" and start being quadratic
    // corpus mass. Degrading recall silently is not an option
    // (the pigeonhole guarantee would quietly break); fail the
    // query loudly so the operator pre-filters the boilerplate.
    if (seen.size > maxBucketDocs)
      throw new IllegalStateException(
        s"StreamingDedup bucket exceeds maxBucketDocs=$maxBucketDocs " +
          s"(${seen.size} docs share one 15-bit band chunk): the feed " +
          "carries boilerplate-grade duplication; pre-filter it or " +
          "raise maxBucketDocs")
    out.result().iterator
  }

  /** The guard-bucket loop: no pairs, no occupancy cap — just the exact
    * content-stable-id registry. Every arrival of an id lands here (the
    * guard key is a pure function of the id), so a reuse with a
    * DIFFERENT signature always meets its prior registration — unlike
    * the in-band check, which only fires when old and new signatures
    * happen to share a band chunk.
    */
  private def guardBucket(seen: scala.collection.mutable.LongMap[Long],
                          rows: Iterator[(Long, Long, Long)],
                          persist: (Long, Long) => Unit): Unit =
    for ((id, sig, _) <- rows.toArray.sortBy(_._1)) {
      if (seen.contains(id)) {
        if (seen(id) != sig) throw contentUnstable(id, seen(id), sig)
      } else {
        seen.update(id, sig)
        persist(id, sig)
      }
    }

  private def contentUnstable(id: Long, stored: Long, arriving: Long) =
    new IllegalStateException(
      s"doc_id $id re-ingested with a DIFFERENT signature " +
        s"(stored $stored, arriving $arriving): StreamingDedup ids " +
        "must be content-stable — assign changed documents a new " +
        "id (content-hash ids) instead of reusing one")

  /** The per-bucket stateful core: a RocksDB `MapState` maps doc_id →
    * (signature, first-seen batch timestamp), one state-store entry per
    * document, so appending a document costs one small entry write per
    * band — never a rewrite of the bucket. Comparisons load the
    * bucket's entries once per trigger (read cost is inherent: an
    * arrival must compare against its bucket's history).
    *
    * `retentionMs` (None = keep all history) is the long-run state
    * lifecycle: entries older than the window RELATIVE TO THE ARRIVING
    * BATCH's timestamp are evicted from the bucket before comparison —
    * the "dedup against the last 30 days" contract, under which state
    * tracks the window's arrival volume instead of all of time, and an
    * id re-crawled after its window (changed content included) simply
    * re-indexes. Eviction is opportunistic (a bucket reclaims on its
    * next visit — the hot buckets that hold the state mass are exactly
    * the frequently-visited ones; [[liveStateEntries]] + a reseed sweep
    * cover the never-revisited tail); the clock is the micro-batch
    * timestamp threaded through the rows, so the operator itself needs
    * no timer machinery and stays restart- and replay-deterministic
    * within a trigger.
    *
    * Initial state (r18): the processor accepts pre-banded seed entries
    * (`handleInitialState`, one call per seed row on its bucket's
    * partition) so an existing corpus registers in one distributed
    * write on the FIRST trigger of a fresh checkpoint — never replayed
    * through the feed. Conflicting seed registrations for one id refuse
    * with the same content-stable contract.
    */
  private final class BucketProcessor(maxHamming: Int, maxBucketDocs: Int,
                                      retentionMs: Option[Long])
      extends StatefulProcessorWithInitialState[Long,
        (Long, Long, Long, Long), (Long, Long, Long), (Long, Long, Long)] {

    @transient private var docs: MapState[Long, (Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      docs = getHandle.getMapState[Long, (Long, Long)]("docs",
        Encoders.scalaLong,
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInitialState(key: Long, entry: (Long, Long, Long),
                                    timers: TimerValues): Unit = {
      val (id, sig, ts) = entry
      if (docs.containsKey(id)) {
        val (stored, _) = docs.getValue(id)
        if (stored != sig) throw contentUnstable(id, stored, sig)
      } else docs.updateValue(id, (sig, ts))
    }

    override def handleInputRows(key: Long,
                                 rows: Iterator[(Long, Long, Long, Long)],
                                 timers: TimerValues)
        : Iterator[(Long, Long, Long)] = {
      val arr = rows.toArray
      // all rows of one trigger share the batch timestamp; max() is
      // defensive against mixed replays
      val batchTs = arr.iterator.map(_._4).max
      val cutoff = retentionMs.map(batchTs - _)
      val seen = scala.collection.mutable.LongMap.empty[Long]
      val expired = scala.collection.mutable.ArrayBuffer.empty[Long]
      docs.iterator().foreach { case (id, (sig, ts)) =>
        if (cutoff.exists(ts < _)) expired += id
        else seen.update(id, sig)
      }
      // reclaim AFTER iteration (no mutation under the store's iterator)
      expired.foreach(docs.removeKey)
      val it = arr.iterator.map { case (id, sig, bucket, _) =>
        (id, sig, bucket)
      }
      // ONE entry write per new doc — never the bucket
      val persist = (id: Long, sig: Long) =>
        docs.updateValue(id, (sig, batchTs))
      if (key >= GuardBase) {
        guardBucket(seen, it, persist)
        Iterator.empty
      } else detectInBucket(seen, it, maxHamming, maxBucketDocs, persist)
    }
  }

  /** Signature + band + guard explode shared by the streaming path, the
    * batch path's seeding surface, and the specs: (doc_id, simhash,
    * bucket) with five rows per document — four band buckets
    * (band << 15 | chunk) and one guard bucket (GuardBase + hash(id)
    * mod 2^15, the exact content-stable-id registry).
    */
  private[streaming] def bandedSignatures(docs: DataFrame, idCol: Column,
                                          textCol: Column): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bandCols = (0 until 4).map(b =>
      shiftright(col("simhash"), b * 15).bitwiseAND(lit(0x7FFFL))
        .plus(lit(b.toLong << 15)).as(s"b$b"))
    val guardCol = pmod(hash(col("doc_id")), lit(32768)).cast("long")
      .plus(lit(GuardBase)).as("guard")
    docs.select(idCol.cast("long").as("doc_id"),
        textCol.cast("string").as("text"))
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .as[(Long, String)]
      .map { case (id, text) => (id, Dedup.simhash60Scalar(text.split(" ", -1))) }
      .toDF("doc_id", "simhash")
      .select(col("doc_id"), col("simhash"),
        explode(array(bandCols :+ guardCol: _*)).as("bucket"))
  }

  /** Pre-banded SEED ENTRIES for an existing corpus — the frame
    * [[nearDupPairs]]' `initialEntries` hook consumes: `(bucket, doc_id,
    * simhash, ts)`, five rows per document, `ts` = `seedTs` (epoch ms —
    * the corpus's "as of" instant, which is what a `retention` window
    * ages). Derived by the SAME signature/banding code as the live
    * path, so seeded and streamed documents are indistinguishable in
    * state.
    */
  def seedEntries(docs: DataFrame, idCol: Column, textCol: Column,
                  seedTs: Long): DataFrame =
    bandedSignatures(docs, idCol, textCol)
      .select(col("bucket"), col("doc_id"), col("simhash"),
        lit(seedTs).as("ts"))

  /** The band-index state of a (stopped) detector checkpoint, read
    * through Spark's state data source: `(bucket, doc_id, simhash, ts)`
    * — the same shape [[seedEntries]] produces, so an exported snapshot
    * reseeds a fresh checkpoint directly. Distributed read (one task
    * per state partition); run it against a checkpoint no query is
    * actively writing.
    */
  def stateEntries(spark: SparkSession, checkpointDir: String): DataFrame =
    spark.read.format("statestore")
      .option("path", checkpointDir)
      .option("stateVarName", "docs")
      .load()
      .select(col("key.value").as("bucket"),
        col("user_map_key.value").as("doc_id"),
        col("user_map_value._1").as("simhash"),
        col("user_map_value._2").as("ts"))

  /** The subset of [[stateEntries]] still inside the retention window
    * as of `asOfMs` — the OFFLINE sweep for buckets no arrival ever
    * revisits (in-stream eviction is visit-driven, so a bucket whose
    * key space drifted away retains expired entries forever; this is
    * the reclamation path). The handoff: stop the query, compute the
    * live set, start a FRESH checkpoint seeded with it
    * (`initialEntries`) reading from the feed's current position —
    * state shrinks to the live window in one distributed pass, no
    * replay.
    */
  def liveStateEntries(spark: SparkSession, checkpointDir: String,
                       retention: java.time.Duration,
                       asOfMs: Long): DataFrame = {
    require(!retention.isNegative && !retention.isZero,
      s"retention must be positive, got $retention")
    stateEntries(spark, checkpointDir)
      .filter(col("ts") >= lit(asOfMs - retention.toMillis))
  }

  /** The checkpoint root an active query writes — best-effort reflective
    * read of `StreamingQueryWrapper.streamingQuery.resolvedCheckpointRoot`
    * (both public at the bytecode level; None when the shape changes).
    */
  private def checkpointOf(q: org.apache.spark.sql.streaming.StreamingQuery)
      : Option[String] =
    try {
      val se = q.getClass.getMethod("streamingQuery").invoke(q)
      Option(se.getClass.getMethod("resolvedCheckpointRoot").invoke(se))
        .map(_.toString)
    } catch { case scala.util.control.NonFatal(_) => None }

  private def latestBatchId(fs: org.apache.hadoop.fs.FileSystem,
                            dir: org.apache.hadoop.fs.Path): Option[Long] =
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).iterator
      .map(_.getPath.getName)
      .filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toLong)
      .maxOption

  /** ONE-CALL sweep handoff (r19): validate the old detector is
    * STOPPED, compute its live-window state, and persist it as the seed
    * frame a fresh checkpoint's `initialEntries` consumes — the whole
    * stop→[[liveStateEntries]]→reseed recipe with the sharp edges
    * fenced:
    *  - an ACTIVE query on `oldCheckpointDir` (this session) refuses —
    *    reading a state store under a live writer hands back a torn
    *    snapshot;
    *  - an in-flight batch (latest offset with no matching commit)
    *    refuses — the store may be mid-write from a crashed or foreign
    *    driver; let the query finish or restart-and-stop it cleanly;
    *  - a `newCheckpointDir` that already committed batches refuses —
    *    seeding is a bootstrap, the initial-state hook would silently
    *    ignore it;
    *  - the seed MATERIALIZES (parquet under
    *    `newCheckpointDir/graft-sweep-seed`) so the restarted query
    *    never reads the old checkpoint's state store lazily while its
    *    own triggers run.
    * Returns the seed frame (read back from the materialized copy) to
    * pass as `initialEntries` when starting the fresh query; the old
    * checkpoint stays untouched and can be archived or deleted once the
    * new query commits its first batch.
    */
  def sweepCheckpoint(spark: SparkSession, oldCheckpointDir: String,
                      newCheckpointDir: String,
                      retention: java.time.Duration,
                      asOfMs: Long): DataFrame = {
    require(!retention.isNegative && !retention.isZero,
      s"retention must be positive, got $retention")
    val conf = spark.sessionState.newHadoopConf()
    val oldPath = new org.apache.hadoop.fs.Path(oldCheckpointDir)
    val fs = oldPath.getFileSystem(conf)
    val oldQualified = fs.makeQualified(oldPath).toString
    // FAIL CLOSED on unresolvable checkpoints (r20): if the reflective
    // read comes back None for an active query (a Spark upgrade changed
    // the wrapper shape), that query COULD be the writer on this
    // checkpoint — treating it as "not ours" would silently disable the
    // exact torn-snapshot fence this require exists for
    val unresolved = spark.streams.active.filter(q => checkpointOf(q).isEmpty)
    require(unresolved.isEmpty,
      s"sweepCheckpoint: cannot resolve the checkpoint root of active " +
        s"quer${if (unresolved.length == 1) "y" else "ies"} " +
        s"${unresolved.map(_.id).mkString(", ")} (Spark internals changed?) " +
        s"— refusing to sweep $oldCheckpointDir while any unattributable " +
        "query runs; stop it first")
    val active = spark.streams.active.filter(q =>
      checkpointOf(q).exists { c =>
        val cq = fs.makeQualified(new org.apache.hadoop.fs.Path(c)).toString
        cq == oldQualified || cq.startsWith(oldQualified + "/")
      })
    require(active.isEmpty,
      s"sweepCheckpoint: stop the active query " +
        s"${active.map(_.id).mkString(", ")} on $oldCheckpointDir first — " +
        "sweeping under a live writer reads a torn state snapshot")
    val offsets = latestBatchId(fs,
      new org.apache.hadoop.fs.Path(oldPath, "offsets"))
    require(offsets.nonEmpty,
      s"sweepCheckpoint: $oldCheckpointDir has no committed offsets — " +
        "not a streaming checkpoint (or one that never ran)")
    val commits = latestBatchId(fs,
      new org.apache.hadoop.fs.Path(oldPath, "commits"))
    require(commits == offsets,
      s"sweepCheckpoint: $oldCheckpointDir has batch ${offsets.get} " +
        s"in-flight (last commit: ${commits.getOrElse(-1L)}) — a writer " +
        "may be mid-batch; finish or cleanly stop it first")
    val newPath = new org.apache.hadoop.fs.Path(newCheckpointDir)
    val newFs = newPath.getFileSystem(conf)
    val newCommits = latestBatchId(newFs,
      new org.apache.hadoop.fs.Path(newPath, "commits"))
    require(newCommits.isEmpty,
      s"sweepCheckpoint: $newCheckpointDir already committed batch " +
        s"${newCommits.get} — seeding only bootstraps a FRESH checkpoint")
    val seedDir = new org.apache.hadoop.fs.Path(newPath, "graft-sweep-seed")
    liveStateEntries(spark, oldCheckpointDir, retention, asOfMs)
      .write.mode("errorifexists").parquet(seedDir.toString)
    spark.read.parquet(seedDir.toString)
  }

  /** The stateful core as a Dataset transform (streaming or batch — the
    * unified semantics let the spec drive it with MemoryStream and the
    * probe with a file feed): emits `(id_a, id_b, hamming)` with
    * id_a < id_b and hamming <= maxHamming.
    *
    * `retention` (None = dedup against ALL history) bounds the long-run
    * state lifecycle to a window: a pair is detected iff, when the
    * later member arrives, the earlier member's entry is still inside
    * the window in at least one shared band — the window applies to
    * the EARLIER document's age, which is exactly the "dedup against
    * the last 30 days" retention contract; entries beyond it are
    * evicted from a bucket on its next visit, and an id re-ingested
    * after its window re-indexes (changed content included — the
    * content-stable-id refusal applies only to LIVE entries). The
    * clock is the micro-batch timestamp, not a timer, so AvailableNow
    * runs terminate normally. Batch evaluation ignores the retention
    * (a batch is one instant).
    *
    * `initialEntries` (streaming only, r18) seeds a FRESH checkpoint's
    * state with pre-banded entries ([[seedEntries]] for a corpus,
    * [[liveStateEntries]] for a sweep handoff) on the first trigger;
    * a checkpoint that has already committed a batch ignores it (the
    * standard initial-state contract — seeding is a bootstrap, not a
    * merge).
    */
  def nearDupPairs(docs: DataFrame, idCol: Column, textCol: Column,
                   maxHamming: Int = 3,
                   maxBucketDocs: Int = 100000,
                   retention: Option[java.time.Duration] = None,
                   initialEntries: Option[DataFrame] = None): DataFrame = {
    // 4-band pigeonhole only guarantees recall to Hamming distance 3
    require(maxHamming <= 3,
      s"maxHamming=$maxHamming exceeds the 4-band pigeonhole guarantee (3)")
    require(maxBucketDocs >= 1, s"maxBucketDocs=$maxBucketDocs")
    require(retention.forall(d => !d.isNegative && !d.isZero),
      s"retention must be positive when given, got $retention")
    require(initialEntries.isEmpty || docs.isStreaming,
      "initialEntries seeds a STREAMING detector's first trigger; batch " +
        "evaluation sees its whole input at once and has no state to seed")
    val spark = docs.sparkSession
    import spark.implicits._
    val mh = maxHamming
    val mb = maxBucketDocs
    val pairs =
      if (docs.isStreaming) {
        // the batch timestamp rides the rows (current_timestamp() is
        // the trigger's planning time — one value per micro-batch)
        val grouped = bandedSignatures(docs, idCol, textCol)
          .withColumn("ts", unix_millis(current_timestamp()))
          .as[(Long, Long, Long, Long)]
          .groupByKey(_._3)
        val proc = new BucketProcessor(mh, mb, retention.map(_.toMillis))
        initialEntries match {
          case Some(entries) =>
            val seed = entries
              .select(col("bucket").cast("long"), col("doc_id").cast("long"),
                col("simhash").cast("long"), col("ts").cast("long"))
              .as[(Long, Long, Long, Long)]
              .groupByKey(_._1)
              .mapValues(e => (e._2, e._3, e._4))
            grouped.transformWithState(proc, TimeMode.None(),
              OutputMode.Append(), seed)
          case None =>
            grouped.transformWithState(proc, TimeMode.None(),
              OutputMode.Append())
        }
      } else
        // batch evaluation sees the whole input at once: prior state is
        // empty by definition, so the same bucket loops run statelessly
        // (no state store spin-up for a one-shot answer)
        bandedSignatures(docs, idCol, textCol)
          .as[(Long, Long, Long)]
          .groupByKey(_._3)
          .flatMapGroups { (bucket: Long, rows: Iterator[(Long, Long, Long)]) =>
            val seen = scala.collection.mutable.LongMap.empty[Long]
            if (bucket >= GuardBase) {
              guardBucket(seen, rows, (_, _) => ())
              Iterator.empty
            } else detectInBucket(seen, rows, mh, mb, (_, _) => ())
          }
    pairs.toDF("id_a", "id_b", "hamming")
  }

  /** Run the detector over a streaming frame and land the pair feed as
    * parquet under `path` (append; readers DISTINCT — see the emission
    * contract above). State lives in `checkpointDir` with the source
    * offsets, so a restart resumes against the full ingested history —
    * or against the `retention` window when one is set (see
    * [[nearDupPairs]]). `initialEntries` seeds a FRESH checkpoint from
    * an existing corpus ([[seedEntries]]) or a swept snapshot
    * ([[liveStateEntries]]).
    */
  def simhashNearDupStream(stream: DataFrame, idCol: Column, textCol: Column,
                           maxHamming: Int, path: String,
                           checkpointDir: String,
                           trigger: Trigger = Trigger.ProcessingTime("30 seconds"),
                           maxBucketDocs: Int = 100000,
                           retention: Option[java.time.Duration] = None,
                           initialEntries: Option[DataFrame] = None)
      : StreamingQuery = {
    require(stream.isStreaming, "simhashNearDupStream needs a streaming frame")
    nearDupPairs(stream, idCol, textCol, maxHamming, maxBucketDocs, retention,
      initialEntries)
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()
  }
}
