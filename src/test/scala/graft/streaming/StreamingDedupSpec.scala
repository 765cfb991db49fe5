package graft.streaming

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.ext.Dedup

/** Streaming stateful near-dup: pairs emit when the later member arrives,
  * state survives restarts via the checkpoint, replayed ids re-emit
  * nothing, and the accumulated pair SET equals the batch
  * [[Dedup.simhashNearDupPairs]] over everything fed.
  */
class StreamingDedupSpec extends AnyFunSuite with SharedSpark {

  /** One parquet "arrival" with a forced mtime so the file source
    * processes arrivals in order (same idiom as StreamingSpec).
    */
  private def arrive(dir: String, seq: Int, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    val sub = s"$dir/batch$seq"
    rows.toDF("doc_id", "text").coalesce(1).write.parquet(sub)
    val t = FileTime.fromMillis(1700000000000L + seq * 60000L)
    Files.list(Paths.get(sub)).forEach(p => Files.setLastModifiedTime(p, t))
    Files.list(Paths.get(sub))
      .filter(p => p.toString.endsWith(".parquet"))
      .forEach { p =>
        Files.move(p, Paths.get(dir, s"b$seq-${p.getFileName}"))
        ()
      }
  }

  private def runDetector(feedDir: String, out: String, ckpt: String): Unit = {
    val feed = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, text STRING"))
      .option("maxFilesPerTrigger", "1")
      .parquet(feedDir)
    val q = StreamingDedup.simhashNearDupStream(feed,
      col("doc_id"), col("text"), maxHamming = 3,
      path = out, checkpointDir = ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination()
  }

  private def readPairs(out: String) = spark.read
    .schema(org.apache.spark.sql.types.StructType.fromDDL(
      "id_a BIGINT, id_b BIGINT, hamming BIGINT"))
    .parquet(out)

  // identical texts → Hamming 0 (always a pair); distinct texts below are
  // far apart in signature space, so the only expected pairs are planted
  private val tA = "alpha bravo charlie delta echo foxtrot golf hotel"
  private val tB = "india juliett kilo lima mike november oscar papa"
  private val tC = "quebec romeo sierra tango uniform victor whiskey xray"

  test("pairs emit on the later arrival, state survives restarts, replay is silent") {
    val feed = tmpDir("sdedup-feed")
    val out = tmpDir("sdedup-out")
    val ckpt = tmpDir("sdedup-ckpt")

    // batch 1: docs 1 (A) and 2 (A) — same-batch pair (1,2)
    arrive(feed, 1, Seq((1L, tA), (2L, tA)))
    runDetector(feed, out, ckpt)
    val after1 = readPairs(out).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(after1 === Set((1L, 2L, 0L)))

    // RESTART (new query, same checkpoint): doc 3 (A) must pair with BOTH
    // 1 and 2 — the state store carried their signatures across runs.
    // Doc 4 (B) pairs with nothing.
    arrive(feed, 2, Seq((3L, tA), (4L, tB)))
    runDetector(feed, out, ckpt)
    val after2 = readPairs(out).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(after2 === Set((1L, 2L, 0L), (1L, 3L, 0L), (2L, 3L, 0L)))

    // identical signatures agree on all four bands → the raw (pre-
    // DISTINCT) feed carries the documented per-band multiplicity
    val raw13 = readPairs(out)
      .filter(col("id_a") === 1L && col("id_b") === 3L).count()
    assert(raw13 === 4L, s"expected one emission per agreeing band, got $raw13")

    // replayed row (doc 3 re-delivered byte-identical, the at-least-once
    // source case) + a fresh loner: no new pairs — the replay hashes to
    // the same buckets, where its id is recognized and re-emits nothing
    arrive(feed, 3, Seq((3L, tA), (5L, tC)))
    runDetector(feed, out, ckpt)
    val after3 = readPairs(out).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(after3 === after2)
  }

  test("streamed pair set equals the batch near-dup answer for any interleaving") {
    import spark.implicits._
    // a corpus with planted near-dups: clusters of identical texts plus
    // singletons; fed in an arbitrary 3-way split
    val docs = (0L until 30L).map { id =>
      val text = (id % 7) match {
        case 0 => tA
        case 1 => tB
        case 2 => tC
        case k => s"unique $id token$k " + ("x" * (id % 5).toInt)
      }
      (id, text)
    }
    val feed = tmpDir("sdedup-par-feed")
    val out = tmpDir("sdedup-par-out")
    val ckpt = tmpDir("sdedup-par-ckpt")
    arrive(feed, 1, docs.filter(_._1 % 3 == 2))
    arrive(feed, 2, docs.filter(_._1 % 3 == 0))
    arrive(feed, 3, docs.filter(_._1 % 3 == 1))
    runDetector(feed, out, ckpt)

    val streamed = readPairs(out).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Dedup.simhashNearDupPairs(
      docs.toDF("doc_id", "text"), "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty, "fixture must plant at least one near-dup pair")
  }

  test("a bucket past maxBucketDocs fails loudly, never silently degrades") {
    import spark.implicits._
    val docs = Seq((1L, tA), (2L, tA), (3L, tA)).toDF("doc_id", "text")
    val e = intercept[Exception] {
      StreamingDedup.nearDupPairs(docs, col("doc_id"), col("text"),
        maxHamming = 3, maxBucketDocs = 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: messages(x.getCause))
    assert(messages(e).exists(_.contains("maxBucketDocs")),
      s"expected the loud bucket-cap refusal, got: ${messages(e).mkString(" | ")}")
  }

  test("id reused for DIFFERENT content refuses loudly; exact replay is silent") {
    import spark.implicits._
    // same id, same text twice: replay — silent, no re-emit, no failure
    val replay = Seq((1L, tA), (2L, tB), (1L, tA)).toDF("doc_id", "text")
    assert(StreamingDedup.nearDupPairs(replay, col("doc_id"), col("text"))
      .collect().isEmpty)
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: messages(x.getCause))
    def assertRefuses(second: String): Unit = {
      val reused = Seq((1L, tA), (1L, second)).toDF("doc_id", "text")
      val e = intercept[Exception] {
        StreamingDedup.nearDupPairs(reused, col("doc_id"), col("text")).collect()
      }
      assert(messages(e).exists(_.contains("content-stable")),
        s"expected the content-stable-id refusal, got: ${messages(e).mkString(" | ")}")
    }
    // same id, different text: a content-unstable id would index mixed
    // old/new signatures across the doc's four bands — refuse loudly.
    // The guard bucket is keyed by the ID, so the refusal is EXACT
    // (r18): it must fire whether or not old and new signatures happen
    // to share a band chunk. Exercise BOTH shapes.
    val sigA = Dedup.simhash60Scalar(tA.split(" ", -1))
    def bands(s: Long) = (0 until 4).map(b => (s >> (b * 15)) & 0x7FFFL)
    def variantWhere(p: Long => Boolean): String =
      Iterator.from(1).map(i => tA + s" extra$i")
        .find { t =>
          val s2 = Dedup.simhash60Scalar(t.split(" ", -1))
          s2 != sigA && p(s2)
        }.get
    // (a) shares a band with the original — the pre-r18 detectable case
    assertRefuses(variantWhere(s2 =>
      bands(s2).zip(bands(sigA)).exists(p => p._1 == p._2)))
    // (b) shares NO band — invisible to the in-band check (~99.99% of
    // substantially changed content); only the guard registry sees it
    assertRefuses(variantWhere(s2 =>
      bands(s2).zip(bands(sigA)).forall(p => p._1 != p._2)))
  }

  test("retention window: live twins pair, aged-out twins do not") {
    def run(feed: String, out: String, ckpt: String,
            retention: java.time.Duration): Unit = {
      val src = spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, text STRING"))
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
      val q = StreamingDedup.simhashNearDupStream(src,
        col("doc_id"), col("text"), maxHamming = 3,
        path = out, checkpointDir = ckpt,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
        retention = Some(retention))
      q.awaitTermination()
    }
    // generous window: the cross-run pair is still detected (the
    // timestamped state changes nothing inside the window)
    val (fB, oB, cB) = (tmpDir("sd-ret-live-feed"),
      tmpDir("sd-ret-live-out"), tmpDir("sd-ret-live-ckpt"))
    val wide = java.time.Duration.ofMinutes(10)
    arrive(fB, 0, Seq((1L, tA)))
    run(fB, oB, cB, wide)
    arrive(fB, 1, Seq((2L, tA)))
    run(fB, oB, cB, wide)
    val live = readPairs(oB).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(live.toSeq == Seq((1L, 2L)))
    // tiny window: the earlier document ages out of state, so its later
    // twin arrives to an empty index — the retention contract; and the
    // aged-out ID is free for reuse with NEW content (no refusal). The
    // reused content must SHARE a band with tA (else the conflict check
    // could never fire anyway) while sitting beyond maxHamming (else it
    // would legitimately pair with doc 2's fresh tA).
    val sigA = Dedup.simhash60Scalar(tA.split(" ", -1))
    def bands(s: Long) = (0 until 4).map(b => (s >> (b * 15)) & 0x7FFFL)
    val reuseText = Iterator.from(1).map(i => tA + s" swap$i more$i")
      .find { t =>
        val s2 = Dedup.simhash60Scalar(t.split(" ", -1))
        java.lang.Long.bitCount(s2 ^ sigA) > 3 &&
          bands(s2).zip(bands(sigA)).exists(p => p._1 == p._2)
      }.get
    val (fA, oA, cA) = (tmpDir("sd-ret-exp-feed"),
      tmpDir("sd-ret-exp-out"), tmpDir("sd-ret-exp-ckpt"))
    val narrow = java.time.Duration.ofMillis(800)
    arrive(fA, 0, Seq((1L, tA)))
    run(fA, oA, cA, narrow)
    Thread.sleep(2500)
    arrive(fA, 1, Seq((2L, tA), (1L, reuseText)))
    run(fA, oA, cA, narrow) // would throw on id 1 were its entry live
    assert(readPairs(oA).isEmpty,
      "expired state must not pair against the aged-out twin")
  }

  test("batch-seeded initial state: an existing corpus bootstraps without replay (r18)") {
    import spark.implicits._
    // the migration shape: docs 1 and 2 are an EXISTING corpus — their
    // banded signatures seed a fresh checkpoint as a batch frame; only
    // docs 3 (dup of the seeds) and 4 (loner) ever ride the stream
    val corpus = Seq((1L, tA), (2L, tA)).toDF("doc_id", "text")
    val seed = StreamingDedup.seedEntries(corpus, col("doc_id"), col("text"),
      seedTs = 1700000000000L)
    val feed = tmpDir("sdedup-boot-feed")
    val out = tmpDir("sdedup-boot-out")
    val ckpt = tmpDir("sdedup-boot-ckpt")
    def runSeeded(): Unit = {
      val src = spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, text STRING"))
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
      val q = StreamingDedup.simhashNearDupStream(src,
        col("doc_id"), col("text"), maxHamming = 3,
        path = out, checkpointDir = ckpt,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
        initialEntries = Some(seed))
      q.awaitTermination()
    }
    arrive(feed, 1, Seq((3L, tA), (4L, tB)))
    runSeeded()
    val got = readPairs(out).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the streamed dup pairs against BOTH seeded docs; the seed-internal
    // pair (1,2) is the batch dedup's business, never re-emitted here
    assert(got === Set((1L, 3L, 0L), (2L, 3L, 0L)))
    // the seeded GUARD registrations enforce content-stable ids too:
    // reusing seed id 2 for different content refuses loudly
    arrive(feed, 2, Seq((2L, tC)))
    val e = intercept[Exception] { runSeeded() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: messages(x.getCause))
    assert(messages(e).exists(_.contains("content-stable")),
      s"seeded guard must refuse id reuse, got: ${messages(e).mkString(" | ")}")
  }

  test("conflicting seed registrations for one id refuse loudly (r18)") {
    import spark.implicits._
    // one id, two different texts in the seed corpus: the initial-state
    // write must refuse, not silently keep either signature
    val corpus = Seq((1L, tA), (1L, tB)).toDF("doc_id", "text")
    val seed = StreamingDedup.seedEntries(corpus, col("doc_id"), col("text"),
      seedTs = 1700000000000L)
    val feed = tmpDir("sdedup-bootbad-feed")
    arrive(feed, 1, Seq((9L, tC)))
    val src = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, text STRING"))
      .parquet(feed)
    val q = StreamingDedup.simhashNearDupStream(src,
      col("doc_id"), col("text"), maxHamming = 3,
      path = tmpDir("sdedup-bootbad-out"),
      checkpointDir = tmpDir("sdedup-bootbad-ckpt"),
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      initialEntries = Some(seed))
    val e = intercept[Exception] { q.awaitTermination() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: messages(x.getCause))
    assert(messages(e).exists(_.contains("content-stable")),
      s"expected the content-stable-id refusal, got: ${messages(e).mkString(" | ")}")
  }

  test("offline sweep: expired state in never-revisited buckets reclaims via reseed (r18)") {
    import spark.implicits._
    val retention = java.time.Duration.ofSeconds(60)
    def run(feed: String, out: String, ckpt: String,
            seed: Option[org.apache.spark.sql.DataFrame]): Unit = {
      val src = spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, text STRING"))
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
      val q = StreamingDedup.simhashNearDupStream(src,
        col("doc_id"), col("text"), maxHamming = 3,
        path = out, checkpointDir = ckpt,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
        retention = Some(retention), initialEntries = seed)
      q.awaitTermination()
    }
    val (f1, o1, c1) = (tmpDir("sd-sweep-feed"), tmpDir("sd-sweep-out"),
      tmpDir("sd-sweep-ckpt"))
    // doc 1 arrives, then doc 2 (DIFFERENT text — doc 1's buckets are
    // never revisited, so in-stream eviction can never reclaim doc 1)
    arrive(f1, 0, Seq((1L, tA)))
    run(f1, o1, c1, None)
    Thread.sleep(1000) // separate the two docs' batch timestamps
    arrive(f1, 1, Seq((2L, tB)))
    run(f1, o1, c1, None)
    val all = StreamingDedup.stateEntries(spark, c1)
    assert(all.count() === 10L, "two docs x (4 bands + guard) expected")
    // the sweep, run "as of" the instant doc 1 just aged out of the
    // window (derived from the recorded state clocks — no wall-clock
    // race): doc 1's entries are expired while its buckets were never
    // revisited, so visit-driven eviction could not reclaim them; doc 2
    // is still live
    val ts = all.groupBy("doc_id").agg(max("ts").as("ts"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ts(2L) > ts(1L), "arrival clocks must be distinct")
    val sweepAsOf = ts(1L) + retention.toMillis + 1L
    val live = StreamingDedup.liveStateEntries(spark, c1, retention,
      asOfMs = sweepAsOf)
    val liveIds = live.select("doc_id").distinct().as[Long].collect().sorted
    assert(liveIds.toSeq === Seq(2L),
      s"sweep must drop never-revisited expired docs, kept ${liveIds.toSeq}")
    assert(live.count() === 5L)
    // handoff: a FRESH checkpoint seeded with the live set. Twins of
    // both docs stream in: doc 2's twin pairs (live window), doc 1's
    // twin does NOT (swept) — and doc 1's id is free for reuse
    val (f2, o2, c2) = (tmpDir("sd-sweep-feed2"), tmpDir("sd-sweep-out2"),
      tmpDir("sd-sweep-ckpt2"))
    arrive(f2, 0, Seq((11L, tA), (12L, tB)))
    run(f2, o2, c2, Some(live))
    val got = readPairs(o2).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((2L, 12L)),
      s"post-sweep resume must detect only live-window pairs, got $got")
    // state after the handoff: 5 seeded + 10 streamed entries
    assert(StreamingDedup.stateEntries(spark, c2).count() === 15L)
  }

  test("sweepCheckpoint: the one-call sweep handoff, validations included (r19)") {
    import spark.implicits._
    val retention = java.time.Duration.ofSeconds(60)
    def run(feed: String, out: String, ckpt: String,
            seed: Option[org.apache.spark.sql.DataFrame]): Unit = {
      val src = spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, text STRING"))
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
      val q = StreamingDedup.simhashNearDupStream(src,
        col("doc_id"), col("text"), maxHamming = 3,
        path = out, checkpointDir = ckpt,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
        retention = Some(retention), initialEntries = seed)
      q.awaitTermination()
    }
    val (f1, o1, c1) = (tmpDir("sd-swc-feed"), tmpDir("sd-swc-out"),
      tmpDir("sd-swc-ckpt"))
    arrive(f1, 0, Seq((1L, tA)))
    run(f1, o1, c1, None)
    Thread.sleep(1000)
    arrive(f1, 1, Seq((2L, tB)))
    run(f1, o1, c1, None)
    val ts = StreamingDedup.stateEntries(spark, c1)
      .groupBy("doc_id").agg(max("ts").as("ts"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sweepAsOf = ts(1L) + retention.toMillis + 1L
    val c2 = tmpDir("sd-swc-ckpt2")

    // validation: an ACTIVE query on the old checkpoint refuses the sweep
    val src1 = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, text STRING"))
      .parquet(f1)
    val live = StreamingDedup.simhashNearDupStream(src1,
      col("doc_id"), col("text"), maxHamming = 3,
      path = o1, checkpointDir = c1,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("10 seconds"),
      retention = Some(retention))
    try {
      val e = intercept[IllegalArgumentException] {
        StreamingDedup.sweepCheckpoint(spark, c1, c2, retention, sweepAsOf)
      }
      assert(e.getMessage.contains("stop the active query"), e.getMessage)
    } finally live.stop()

    // the one-call handoff: stopped query -> materialized seed frame
    val seed = StreamingDedup.sweepCheckpoint(spark, c1, c2, retention,
      sweepAsOf)
    assert(seed.select("doc_id").distinct().as[Long].collect().toSeq ==
      Seq(2L), "only the live-window doc survives the sweep")
    assert(seed.count() === 5L)
    assert(seed.columns.sorted.toSeq ==
      Seq("bucket", "doc_id", "simhash", "ts"))
    // the seed is MATERIALIZED under the new checkpoint (not a lazy
    // read of the old state store)
    assert(new java.io.File(c2, "graft-sweep-seed").isDirectory)

    // end to end: twins of both docs stream against the seeded fresh
    // checkpoint — only the live doc's twin pairs, and the swept id is
    // free for reuse
    val f2 = tmpDir("sd-swc-feed2")
    arrive(f2, 0, Seq((11L, tA), (12L, tB)))
    val o2 = tmpDir("sd-swc-out2")
    run(f2, o2, c2, Some(seed))
    val got = readPairs(o2).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((2L, 12L)),
      s"post-sweep resume must detect only live-window pairs, got $got")

    // validation: a target checkpoint that already committed refuses
    val e2 = intercept[IllegalArgumentException] {
      StreamingDedup.sweepCheckpoint(spark, c1, c2, retention, sweepAsOf)
    }
    assert(e2.getMessage.contains("FRESH"), e2.getMessage)
    // validation: a directory that never ran refuses as the source
    val e3 = intercept[IllegalArgumentException] {
      StreamingDedup.sweepCheckpoint(spark, tmpDir("sd-swc-empty"),
        tmpDir("sd-swc-ckpt3"), retention, sweepAsOf)
    }
    assert(e3.getMessage.contains("no committed offsets"), e3.getMessage)
  }

  test("batch-mode evaluation of the stateful core matches the banded join") {
    import spark.implicits._
    val docs = (0L until 40L)
      .map(id => (id, if (id % 5 == 0) tA else s"solo $id doc" + id))
      .toDF("doc_id", "text")
    val core = StreamingDedup.nearDupPairs(docs, col("doc_id"), col("text"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val banded = Dedup.simhashNearDupPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(core === banded)
    assert(banded.nonEmpty)
  }
}
