package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

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
  * buckets and appends itself. `flatMapGroupsWithState` emits a
  * `(id_a, id_b, hamming)` pair the moment the LATER document arrives.
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
  *    saturation, which wants pre-filtering, not near-dup pairing;
  *  - state per bucket stores two longs per document (id + signature):
  *    16 bytes × corpus per band, 64 bytes/doc total across the four
  *    bands — a billion-document history is ~64 GB of state cluster-wide,
  *    checkpointed incrementally by the state store;
  *  - exactly-once: signatures ride the checkpoint, replayed source rows
  *    are recognized by id inside their bucket and re-emit nothing, and
  *    the parquet sink's manifest log makes replayed batch outputs
  *    idempotent.
  *
  * Emission contract: a qualifying pair is emitted exactly when its
  * later member first arrives, once PER AGREEING BAND (up to four rows);
  * readers take DISTINCT — deduplicating across buckets in-stream would
  * need a second stateful exchange per batch for rows that are already
  * deterministic duplicates. The emitted SET equals the batch
  * [[Dedup.simhashNearDupPairs]] over the union of everything fed, for
  * every interleaving of arrivals — which is what lets a closed-form
  * oracle check the streaming path.
  */
object StreamingDedup {

  /** Per-bucket state: ids and signatures of every document that hashed
    * into this (band, chunk) bucket, parallel arrays (two longs/doc).
    */
  final case class BucketState(ids: Array[Long], sigs: Array[Long])

  /** Signature + band explode shared by the streaming path and its spec:
    * (doc_id, simhash, bucket) with bucket = band << 15 | chunk.
    */
  private[streaming] def bandedSignatures(docs: DataFrame, idCol: Column,
                                          textCol: Column): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(idCol.cast("long").as("doc_id"),
        textCol.cast("string").as("text"))
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .as[(Long, String)]
      .map { case (id, text) => (id, Dedup.simhash60Scalar(text.split(" ", -1))) }
      .toDF("doc_id", "simhash")
      .select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(b =>
          shiftright(col("simhash"), b * 15).bitwiseAND(lit(0x7FFFL))
            .plus(lit(b.toLong << 15)).as(s"b$b")): _*)).as("bucket"))
  }

  /** The stateful core as a Dataset transform (streaming or batch — the
    * unified semantics let the spec drive it with MemoryStream and the
    * probe with a file feed): emits `(id_a, id_b, hamming)` with
    * id_a < id_b and hamming <= maxHamming.
    */
  def nearDupPairs(docs: DataFrame, idCol: Column, textCol: Column,
                   maxHamming: Int = 3,
                   maxBucketDocs: Int = 100000): DataFrame = {
    // 4-band pigeonhole only guarantees recall to Hamming distance 3
    require(maxHamming <= 3,
      s"maxHamming=$maxHamming exceeds the 4-band pigeonhole guarantee (3)")
    require(maxBucketDocs >= 1, s"maxBucketDocs=$maxBucketDocs")
    val spark = docs.sparkSession
    import spark.implicits._
    bandedSignatures(docs, idCol, textCol)
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[BucketState, (Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[BucketState]) =>
          val prior = state.getOption.getOrElse(
            BucketState(Array.empty, Array.empty))
          val seen = scala.collection.mutable.LongMap.empty[Long]
          var i = 0
          while (i < prior.ids.length) {
            seen.update(prior.ids(i), prior.sigs(i)); i += 1
          }
          val out = List.newBuilder[(Long, Long, Long)]
          // ascending id within the batch: a same-batch pair is emitted
          // by its later member, exactly as if the two arrived apart
          for ((id, sig, _) <- rows.toArray.sortBy(_._1)) {
            if (!seen.contains(id)) { // replayed/duplicate id: no re-emit
              seen.foreach { case (oid, osig) =>
                val h = java.lang.Long.bitCount(sig ^ osig)
                if (h <= maxHamming)
                  out += ((math.min(id, oid), math.max(id, oid), h.toLong))
              }
              seen.update(id, sig)
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
          val ids = new Array[Long](seen.size)
          val sigs = new Array[Long](seen.size)
          var j = 0
          seen.foreach { case (id, sig) => ids(j) = id; sigs(j) = sig; j += 1 }
          state.update(BucketState(ids, sigs))
          out.result().iterator
      }
      .toDF("id_a", "id_b", "hamming")
  }

  /** Run the detector over a streaming frame and land the pair feed as
    * parquet under `path` (append; readers DISTINCT — see the emission
    * contract above). State lives in `checkpointDir` with the source
    * offsets, so a restart resumes against the full ingested history.
    */
  def simhashNearDupStream(stream: DataFrame, idCol: Column, textCol: Column,
                           maxHamming: Int, path: String,
                           checkpointDir: String,
                           trigger: Trigger = Trigger.ProcessingTime("30 seconds"),
                           maxBucketDocs: Int = 100000)
      : StreamingQuery = {
    require(stream.isStreaming, "simhashNearDupStream needs a streaming frame")
    nearDupPairs(stream, idCol, textCol, maxHamming, maxBucketDocs)
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()
  }
}
