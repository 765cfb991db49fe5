package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class PackingSpec extends AnyFunSuite with SharedSpark {

  test("packing places documents contiguously and straddles boundaries") {
    import spark.implicits._
    // ids deliberately unsorted on input; 0-token doc; one doc (id=4)
    // straddles the 10-token boundary
    val docs = Seq((3L, 4L), (1L, 5L), (2L, 0L), (4L, 7L), (5L, 10L))
      .toDF("doc_id", "tok")
    val got = Packing.packSequences(docs, "doc_id", "tok", 10)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toList
    //                         id start seq off end
    assert(got == List(
      (1L, 0L, 0L, 0L, 0L),   // tokens [0,5)
      (2L, 5L, 0L, 5L, 0L),   // zero tokens at offset 5
      (3L, 5L, 0L, 5L, 0L),   // tokens [5,9)
      (4L, 9L, 0L, 9L, 1L),   // tokens [9,16) — straddles seq 0 -> 1
      (5L, 16L, 1L, 6L, 2L))) // tokens [16,26) — straddles seq 1 -> 2
  }

  test("sequenceSpans: clipped per-sequence slices, exact coverage, no 0-tok rows") {
    import spark.implicits._
    val docs = Seq((3L, 4L), (1L, 5L), (2L, 0L), (4L, 7L), (5L, 10L))
      .toDF("doc_id", "tok")
    val got = Packing.sequenceSpans(docs, "doc_id", "tok", 10)
      .orderBy("seq", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toList
    //                  seq  id  off len
    assert(got == List(
      (0L, 1L, 0L, 5L),   // [0,5) of seq 0
      (0L, 3L, 5L, 4L),   // [5,9)
      (0L, 4L, 9L, 1L),   // head of the straddler
      (1L, 4L, 0L, 6L),   // its tail opens seq 1
      (1L, 5L, 6L, 4L),   // next doc fills to the boundary
      (2L, 5L, 0L, 6L)))  // and finishes in seq 2
    // invariant on a larger frame: every sequence's spans tile [0, L)
    // exactly (the last may be short), offsets dense, no overlaps
    val big = (0L until 500L).map(i => (i, 1L + (i * 7) % 23)).toDF("doc_id", "tok")
    val spans = Packing.sequenceSpans(big, "doc_id", "tok", 64)
    val bySeq = spans.groupBy("seq")
      .agg(sum("len").as("cover"), min("offset").as("mn"),
        max(col("offset") + col("len")).as("mx"), count(lit(1)).as("n"))
      .orderBy("seq").collect()
    bySeq.dropRight(1).foreach { r =>
      assert(r.getLong(1) === 64L && r.getLong(2) === 0L && r.getLong(3) === 64L, r)
    }
    val total = big.agg(sum("tok")).head().getLong(0)
    assert(bySeq.map(_.getLong(1)).sum === total)
  }

  test("packTokenIds materializes exact sequence arrays across straddles") {
    import spark.implicits._
    val docs = Seq(
      (3L, Seq(30L, 31L, 32L, 33L)),
      (1L, Seq(10L, 11L, 12L, 13L, 14L)),
      (2L, Seq.empty[Long]),
      (4L, Seq(40L, 41L, 42L, 43L, 44L, 45L, 46L)),
      (5L, Seq(50L, 51L, 52L, 53L, 54L, 55L, 56L, 57L, 58L, 59L)))
      .toDF("doc_id", "tokens")
    val got = Packing.packTokenIds(docs, "doc_id", "tokens", 10)
      .orderBy("seq")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toList
    assert(got == List(
      (0L, List(10L, 11L, 12L, 13L, 14L, 30L, 31L, 32L, 33L, 40L)),
      (1L, List(41L, 42L, 43L, 44L, 45L, 46L, 50L, 51L, 52L, 53L)),
      (2L, List(54L, 55L, 56L, 57L, 58L, 59L))))
  }

  test("two-pass prefix sum matches the single-partition window reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (0L until 500L).map(i => (i, rnd.nextInt(300).toLong))
      .toDF("doc_id", "tok").repartition(13) // scramble partitioning
    val got = Packing.packSequences(docs, "doc_id", "tok", 512)
      .select("doc_id", "token_start").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val ref = docs.withColumn("cum", sum(col("tok")).over(w) - col("tok"))
      .select("doc_id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
  }

  test("scale smoke: 2M docs pack with exact invariants and no driver blowup") {
    import spark.implicits._
    // deterministic token counts, ids shuffled across partitions
    val n = 2000000L
    val docs = spark.range(n).select(col("id").as("doc_id"),
      pmod(col("id") * 2654435761L, lit(997L)).as("tok"))
      .repartition(64)
    val out = Packing.packSequences(docs, "doc_id", "tok", 4096)
    // total tokens = closed-form sum; last doc ends exactly at the total
    val expectTotal = docs.agg(sum("tok")).head().getLong(0)
    val stats = out.agg(
      count(lit(1)),
      max(col("token_start") + col("token_count")),
      sum(when(col("seq_offset") >= 4096 || col("seq_offset") < 0, 1L).otherwise(0L)),
      sum(when(col("seq_end") < col("seq_start"), 1L).otherwise(0L))).head()
    assert(stats.getLong(0) == n)
    assert(stats.getLong(1) == expectTotal)
    assert(stats.getLong(2) == 0L, "seq_offset out of range")
    assert(stats.getLong(3) == 0L, "seq_end < seq_start")
    // placements never overlap: among token-BEARING docs, token_start is
    // unique (zero-token docs legitimately share their successor's start)
    // and the first placement begins at 0
    val bearing = out.filter(col("token_count") > 0)
    val seams = bearing.agg(count(lit(1)), countDistinct("token_start"),
      min("token_start")).head()
    assert(seams.getLong(0) == seams.getLong(1), "overlapping placements")
    assert(seams.getLong(2) == 0L)
  }

  test("packSequences rejects null and non-castable ids loudly") {
    import spark.implicits._
    // md5-style string ids fail the ANSI cast loudly (CAST_INVALID_INPUT)
    // before placement; typed null ids — which cast silently — previously
    // either emitted garbage rows (all null) or NPE'd at the subtotal
    // collect (mixed), and must be clear errors instead
    val stringIds = Seq(("ab3f", 5L), ("9c02", 7L)).toDF("id", "tok")
    val e1 = intercept[Exception] {
      Packing.packSequences(stringIds, "id", "tok", seqLen = 4).collect()
    }
    assert(e1.getMessage.contains("CAST_INVALID_INPUT"))
    val mixed = Seq((Option(1L), 5L), (Option.empty[Long], 7L)).toDF("id", "tok")
    val e2 = intercept[IllegalArgumentException] {
      Packing.packSequences(mixed, "id", "tok", seqLen = 4)
    }
    assert(e2.getMessage.contains("null/non-castable"))
    val allNull = Seq(Option.empty[Long], Option.empty[Long])
      .toDF("id").withColumn("tok", lit(5L))
    val e3 = intercept[IllegalArgumentException] {
      Packing.packSequences(allNull, "id", "tok", seqLen = 4)
    }
    assert(e3.getMessage.contains("null/non-castable"))
    // genuinely empty input still yields the zero-row full-schema frame
    val empty = Packing.packSequences(
      Seq.empty[(Long, Long)].toDF("id", "tok"), "id", "tok", seqLen = 4)
    assert(empty.columns.toSeq == Seq("doc_id", "token_count",
      "token_start", "seq_start", "seq_offset", "seq_end"))
    assert(empty.count() == 0)
  }

  test("hash-id spans wider than 2^63 pack correctly (no long overflow)") {
    import spark.implicits._
    // ids at both extremes of the 64-bit space: maxId - minId overflows a
    // long; the decimal bucket path must still place every doc
    val docs = Seq(
      (Long.MinValue + 3L, 5L), (-17L, 7L), (0L, 1L), (42L, 3L),
      (Long.MaxValue - 2L, 9L)).toDF("doc_id", "tok")
    val got = Packing.packSequences(docs, "doc_id", "tok", 10)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toList
    // ascending-id order -> running starts 0,5,12,13,16
    assert(got == List(
      (Long.MinValue + 3L, 0L), (-17L, 5L), (0L, 12L), (42L, 13L),
      (Long.MaxValue - 2L, 16L)))
  }

  test("tokenWindows: strided overlap, end-stop rule, null-safe") {
    import spark.implicits._
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6"), (2L, "a"), (3L, null))
      .toDF("doc_id", "text")
    val got = Packing.tokenWindows(docs, "doc_id", "text", size = 4, stride = 3)
      .orderBy("doc_id", "win_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4))).toList
    assert(got == List(
      (1L, 0, 0, 4, "t0"), // [t0..t3]
      (1L, 1, 3, 4, "t3"), // [t3..t6] — reaches the end, so no further
                           // window (start=6 would only re-copy t6)
      (2L, 0, 0, 1, "a")))
    // a PARTIAL tail that carries new tokens IS kept: 8 tokens, the
    // second window [3..7) misses t7, so a third (partial) window opens
    val got8 = Packing.tokenWindows(
      Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7")).toDF("doc_id", "text"),
      "doc_id", "text", size = 4, stride = 3)
      .orderBy("win_idx").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).toList
    assert(got8 == List((0, 0, 4), (1, 3, 4), (2, 6, 2)))
  }

  test("sequenceTexts reassembles the exact straddled token streams") {
    import spark.implicits._
    // doc 1: t0..t4 (5 tokens), doc 2: u0..u2 (3), doc 3: v0 (1); seqLen 4
    // seq 0 = t0 t1 t2 t3 | seq 1 = t4 u0 u1 u2 | seq 2 = v0
    val df = Seq(
      (1L, "t0 t1 t2 t3 t4"), (2L, "u0 u1 u2"), (3L, "v0"))
      .toDF("doc_id", "text")
    val got = graft.ops.Packing.sequenceTexts(df, "doc_id", "text", seqLen = 4)
      .orderBy("seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    def h(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    assert(got.toSeq == Seq(
      (0L, 1L, 4L, h("t0 t1 t2 t3")),
      (1L, 2L, 4L, h("t4 u0 u1 u2")),
      (2L, 1L, 1L, h("v0"))))
  }

  test("sequenceTextsManaged releases its checkpoint storage, repeatedly") {
    import spark.implicits._
    val df = (1L to 50L).map(i => (i, (0 until 7).map(j => s"w$i-$j")
      .mkString(" "))).toDF("doc_id", "text")
    val sc = spark.sparkContext
    // drain leftovers from other suites so the leak assertion is exact
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val expected = graft.ops.Packing
      .sequenceTexts(df, "doc_id", "text", seqLen = 4)
      .orderBy("seq_id").collect().toSeq
    (1 to 3).foreach { _ =>
      val got = graft.ops.Packing.sequenceTextsManaged(
        df, "doc_id", "text", seqLen = 4)(
        _.orderBy("seq_id").collect().toSeq)
      assert(got == expected)
    }
    // every managed run unpersisted its slim checkpoint: nothing but the
    // unmanaged call's own block (GC-released) may remain
    val live = sc.getPersistentRDDs.size
    assert(live <= 1, s"checkpoint blocks leaked across runs: $live live")
  }

  test("writeShards partitions placements by starting sequence") {
    import spark.implicits._
    // 10 docs x 100 tokens, seqLen 100 -> one sequence per doc;
    // 2 seqs/shard -> shards 0..4, 2 docs each
    val df = (0L until 10L).map((_, 100L)).toList.toDF("doc_id", "tok")
    val path = tmpDir("shards") + "/packed"
    val nShards = Packing.writeShards(df, "doc_id", "tok",
      seqLen = 100L, seqsPerShard = 2L, path = path)
    assert(nShards == 5L)
    val back = spark.read.parquet(path)
    assert(back.count() == 10L)
    val perShard = back.groupBy("shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perShard == Map(0 -> 2L, 1 -> 2L, 2 -> 2L, 3 -> 2L, 4 -> 2L))
    // hive layout on disk: shard=N directories
    val dirs = new java.io.File(path).listFiles().map(_.getName)
      .filter(_.startsWith("shard=")).sorted
    assert(dirs.toSeq == (0 to 4).map(i => s"shard=$i"))
    // empty corpus: zero shards, schema-preserving readable output
    val emptyPath = tmpDir("shards-empty") + "/packed"
    val n0 = Packing.writeShards(df.filter(col("doc_id") < 0), "doc_id",
      "tok", 100L, 2L, emptyPath)
    assert(n0 == 0L)
    assert(spark.read.parquet(emptyPath).count() == 0L)
  }

  test("lengthBuckets: bucket arithmetic, full batches, determinism") {
    import spark.implicits._
    // 400 docs, token counts 0..99 -> buckets 0..9 (width 10), 40 docs
    // per bucket -> batches of 8, 5 full batches per bucket
    val df = (0L until 400L).map(i => (i, i % 100L)).toDF("doc_id", "tok")
    val got = Packing.lengthBuckets(df, "doc_id", "tok",
      bucketWidth = 10L, batchSize = 8L, salt = "s1")
    val rows = got.collect()
    assert(rows.length == 400)
    rows.foreach { r =>
      val (tok, bucket, pos, batch, slot) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(bucket == tok / 10)
      assert(batch == pos / 8 && slot == pos % 8)
    }
    // every (bucket, batch) is exactly full here (40 = 5 x 8)
    val sizes = got.groupBy("bucket", "batch_idx").count()
      .collect().map(_.getLong(2)).toSet
    assert(sizes == Set(8L))
    // deterministic across evaluations; new salt reorders within buckets
    val again = Packing.lengthBuckets(df, "doc_id", "tok", 10L, 8L, "s1")
    assert(got.exceptAll(again).isEmpty)
    val other = Packing.lengthBuckets(df, "doc_id", "tok", 10L, 8L, "s2")
      .select("doc_id", "bucket_pos")
    assert(!other.exceptAll(got.select("doc_id", "bucket_pos")).isEmpty)
    // null-safe: null ids/token counts and negatives are excluded
    val dirty = Seq((Some(1L), Some(5L)), (None, Some(5L)),
      (Some(2L), None), (Some(3L), Some(-1L)))
      .toDF("doc_id", "tok")
    assert(Packing.lengthBuckets(dirty, "doc_id", "tok", 10L, 8L, "s")
      .count() == 1L)
  }
}
