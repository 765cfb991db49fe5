package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.ext.Dedup

/** Scale shape of the streaming near-dup detector, pinned with machine-
  * checked numbers rather than prose: the state store holds EXACTLY one
  * row per (document, band) entry (the r17 per-entry MapState — state is
  * the banded index at ENTRY granularity, which is what makes a write
  * O(entry) instead of O(bucket)), planted duplicate pairs all surface
  * with batch-identical results, a final single-document trigger against
  * the full history emits exactly its planted matches — the per-arrival
  * path touches its own buckets, not the corpus — and that trigger
  * UPDATES exactly the arrival's four entries while the store holds
  * 120k+ rows: per-trigger state write work is O(arrivals), independent
  * of occupancy (the r16 full-bucket-rewrite amplification is gone).
  */
class StreamingDedupScaleSpec extends AnyFunSuite with SharedSpark {

  test("30k-doc history: per-entry state rows exactly, O(arrivals) writes, late arrival pairs") {
    import spark.implicits._
    val n = 20000L
    // ~5% planted duplicates: doc i and i+n share a text when i % 20 == 0;
    // everything else is unique prose
    // cluster texts differ pairwise in four of six tokens (and unique
    // texts in at least three of eight), so inter-cluster signature
    // distance behaves like random 60-bit points (~30 bits) — no
    // accidental <=3-Hamming pair can contaminate the planted counts
    def text(id: Long): String = {
      val base = if (id >= n) id - n else id
      if (base % 20 == 0) s"planted c${base} d${base} e${base} f${base} cluster"
      else s"unique document ${id} with tokens t${id % 997} u${id % 331} v${id % 73}"
    }
    val first = (0L until n).map(id => (id, text(id)))
    val second = (n until n + n / 2).map(id => (id, text(id)))

    val feed = tmpDir("sdedup-scale-feed")
    val out = tmpDir("sdedup-scale-out")
    val ckpt = tmpDir("sdedup-scale-ckpt")
    first.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(feed)
    second.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(feed)

    def run(): Seq[org.apache.spark.sql.streaming.StreamingQueryProgress] = {
      val src = spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, text STRING"))
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
      val q = StreamingDedup.simhashNearDupStream(src,
        col("doc_id"), col("text"), maxHamming = 3,
        path = out, checkpointDir = ckpt,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination()
      q.recentProgress.toSeq
    }
    val progress = run()

    // state size is the banded index at ENTRY granularity: exactly one
    // state row per (document, band) entry plus the per-document guard
    // registration (r18) — machine-checked against the band+guard
    // explode of the same corpus, not an approximation. Entry rows are
    // what make an append O(entry): the bucket never rewrites.
    val stateRows = progress.lastOption
      .map(_.stateOperators.map(_.numRowsTotal).sum)
    val expectedEntries = StreamingDedup.bandedSignatures(
      (first ++ second).toDF("doc_id", "text"), col("doc_id"), col("text"))
      .count()
    assert(stateRows.contains(expectedEntries),
      s"expected $expectedEntries state entry rows, got $stateRows")

    // the emitted pair set is exactly the batch answer over the union
    val streamed = spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "id_a BIGINT, id_b BIGINT, hamming BIGINT"))
      .parquet(out).distinct()
    val batch = Dedup.simhashNearDupPairs(
      (first ++ second).toDF("doc_id", "text"), "doc_id", "text")
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // every planted cross-batch duplicate surfaced (clusters with a
    // second member exist for base < n/2 — the second feed's range)
    val planted = streamed
      .filter(col("id_a") % 20 === 0 && col("id_b") === col("id_a") + n)
      .count()
    assert(planted === n / 40,
      s"expected ${n / 40} planted cross-batch pairs, got $planted")

    // a single late arrival pairs against the 30k-doc history: exactly
    // its own planted cluster, found through its four buckets
    val lateId = 7L * n
    Seq((lateId, text(0L))).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(feed)
    val lateProgress = run()
    // write amplification is gone (r17): the late trigger UPDATES exactly
    // the one arrival's five entries (four bands + its guard
    // registration) — while the store holds 150k rows — so per-trigger
    // state write work is O(arrivals) entries, never O(bucket
    // occupancy) re-serialization
    val updatedRows = lateProgress
      .map(_.stateOperators.map(_.numRowsUpdated).sum)
    assert(updatedRows.nonEmpty && updatedRows.max === 5L,
      s"late trigger should update exactly 5 state entries, got $updatedRows")
    val lateRows = spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "id_a BIGINT, id_b BIGINT, hamming BIGINT"))
      .parquet(out).distinct()
      .filter(col("id_b") === lateId)
    // cluster 0 has members 0 and n (both text(0)) → exactly two matches
    val got = lateRows.select("id_a").as[Long].collect().sorted
    assert(got.toSeq === Seq(0L, n),
      s"late arrival should pair with its cluster only, got ${got.toSeq}")
  }

  test("offline sweep at scale: never-revisited expired buckets reclaim via reseed (r18)") {
    import spark.implicits._
    // 8k docs arrive in two epochs with DISJOINT text spaces: epoch-A
    // buckets are never revisited by epoch-B arrivals, so visit-driven
    // eviction can never reclaim them — the leak class the offline
    // sweep exists for
    val n = 4000L
    def textA(id: Long) = s"alpha epoch doc ${id} tok${id % 631} u${id % 97}"
    def textB(id: Long) = s"beta window doc ${id} tok${id % 613} v${id % 89}"
    val retention = java.time.Duration.ofSeconds(60)
    val (feed, out, ckpt) = (tmpDir("sd-sweepscale-feed"),
      tmpDir("sd-sweepscale-out"), tmpDir("sd-sweepscale-ckpt"))
    def run(f: String, o: String, c: String,
            seed: Option[org.apache.spark.sql.DataFrame]): Unit = {
      val src = spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, text STRING"))
        .option("maxFilesPerTrigger", "1")
        .parquet(f)
      val q = StreamingDedup.simhashNearDupStream(src,
        col("doc_id"), col("text"), maxHamming = 3,
        path = o, checkpointDir = c,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
        retention = Some(retention), initialEntries = seed)
      q.awaitTermination()
    }
    (0L until n).map(id => (id, textA(id))).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(feed)
    run(feed, out, ckpt, None)
    Thread.sleep(1000) // separate the epochs' batch clocks
    (n until 2 * n).map(id => (id, textB(id))).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(feed)
    run(feed, out, ckpt, None)
    val all = StreamingDedup.stateEntries(spark, ckpt)
    assert(all.count() === 2 * n * 5,
      "both epochs' (4 bands + guard) entries expected in state")
    // sweep as of the instant epoch A just aged out (clock derived from
    // the recorded state, not the wall)
    val maxTsA = all.filter(col("doc_id") < n).agg(max("ts")).head().getLong(0)
    val minTsB = all.filter(col("doc_id") >= n).agg(min("ts")).head().getLong(0)
    assert(minTsB > maxTsA, "epoch clocks must be distinct")
    val live = StreamingDedup.liveStateEntries(spark, ckpt, retention,
      asOfMs = maxTsA + retention.toMillis + 1L)
    assert(live.count() === n * 5,
      "sweep must keep exactly the live epoch's entries")
    assert(live.filter(col("doc_id") < n).isEmpty,
      "never-revisited expired buckets must be gone")
    // handoff: fresh checkpoint seeded with the live set; twins of one
    // expired and one live doc stream in — only the live twin pairs
    val (f2, o2, c2) = (tmpDir("sd-sweepscale-feed2"),
      tmpDir("sd-sweepscale-out2"), tmpDir("sd-sweepscale-ckpt2"))
    Seq((90001L, textA(7L)), (90002L, textB(n + 7L))).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(f2)
    run(f2, o2, c2, Some(live))
    val got = spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "id_a BIGINT, id_b BIGINT, hamming BIGINT"))
      .parquet(o2).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((n + 7L, 90002L)),
      s"post-sweep resume must pair only against the live window, got $got")
    // state after handoff: the live seed + the two new arrivals
    assert(StreamingDedup.stateEntries(spark, c2).count() === n * 5 + 10)
  }

  test("batch-seeded bootstrap: seed half the corpus as state, stream the rest, zero replay (r18)") {
    import spark.implicits._
    val n = 20000L
    def text(id: Long): String = {
      val base = id % (n / 2)
      if (base % 20 == 0) s"seeded p${base} q${base} r${base} s${base} cluster"
      else s"unique bootstrap doc ${id} tokens t${id % 997} u${id % 331}"
    }
    val docs = (0L until n).map(id => (id, text(id)))
    val (seedHalf, streamHalf) = docs.partition(_._1 < n / 2)

    // the migration path: the EXISTING corpus never rides the stream —
    // its banded signatures seed the fresh checkpoint as a batch frame
    val seed = StreamingDedup.seedEntries(seedHalf.toDF("doc_id", "text"),
      col("doc_id"), col("text"), seedTs = 1700000000000L)
    val feed = tmpDir("sdedup-boot-scale-feed")
    val out = tmpDir("sdedup-boot-scale-out")
    val ckpt = tmpDir("sdedup-boot-scale-ckpt")
    streamHalf.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(feed)
    val src = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, text STRING"))
      .parquet(feed)
    val q = StreamingDedup.simhashNearDupStream(src,
      col("doc_id"), col("text"), maxHamming = 3,
      path = out, checkpointDir = ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      initialEntries = Some(seed))
    q.awaitTermination()
    val progress = q.recentProgress.toSeq

    // ZERO replay of the seed half: the stream ingested exactly the
    // streamed half's rows
    val inputRows = progress.map(_.numInputRows).sum
    assert(inputRows === n / 2,
      s"expected ${n / 2} streamed rows (no seed replay), got $inputRows")

    // seeded state rows ≡ per-(doc, band|guard) entries for the WHOLE
    // corpus: the seed half registered through initial state, the
    // streamed half through arrivals — indistinguishable in state
    val stateRows = progress.lastOption
      .map(_.stateOperators.map(_.numRowsTotal).sum)
    val expectedEntries = StreamingDedup.bandedSignatures(
      docs.toDF("doc_id", "text"), col("doc_id"), col("text")).count()
    assert(stateRows.contains(expectedEntries),
      s"expected $expectedEntries state entry rows, got $stateRows")

    // emitted pairs = cross pairs + stream-internal pairs; union with
    // the seed half's own batch dedup = the whole-corpus batch answer
    val streamed = spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "id_a BIGINT, id_b BIGINT, hamming BIGINT"))
      .parquet(out).distinct()
    assert(streamed
      .filter(col("id_a") < n / 2 && col("id_b") < n / 2).isEmpty,
      "the stream must not re-emit seed-internal pairs")
    val seedBatch = Dedup.simhashNearDupPairs(
      seedHalf.toDF("doc_id", "text"), "doc_id", "text")
    val whole = Dedup.simhashNearDupPairs(
      docs.toDF("doc_id", "text"), "doc_id", "text")
    val union = streamed.unionAll(seedBatch).distinct()
    assert(union.count() === whole.count())
    assert(union.exceptAll(whole).isEmpty && whole.exceptAll(union).isEmpty)
    assert(whole.count() > 0, "fixture must plant cross-half duplicates")
  }
}
