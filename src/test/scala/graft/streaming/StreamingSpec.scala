package graft.streaming

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class StreamingSpec extends AnyFunSuite with SharedSpark {

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Write one parquet "arrival" into the stream directory with a forced
    * modification time so the file source processes arrivals in order.
    */
  private def arrive(dir: String, seq: Int,
                     rows: Seq[(Long, Timestamp, Long, String, Double, String)]): Unit = {
    import spark.implicits._
    val sub = s"$dir/batch$seq"
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(sub)
    val t = FileTime.fromMillis(1700000000000L + seq * 60000L)
    Files.list(Paths.get(sub)).forEach(p => Files.setLastModifiedTime(p, t))
    // move data files up so the source sees a flat directory
    Files.list(Paths.get(sub))
      .filter(p => p.toString.endsWith(".parquet"))
      .forEach { p =>
        Files.move(p, Paths.get(dir, s"b$seq-${p.getFileName}"))
        ()
      }
  }

  test("watermark (persisted in the checkpoint) drops too-late events") {
    val dir = tmpDir("stream-events")
    val checkpoint = tmpDir("stream-ckpt")
    val out = tmpDir("stream-out")

    def run(): Unit = {
      val q = EventStreams.tumblingCounts(
        EventStreams.fromDirectory(spark, dir), "10 minutes", "10 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", checkpoint)
        .outputMode("append") // finalized windows only
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // run 1: the 10:00 window fills, then a far-future event pushes the
    // watermark to 10:50 (persisted in the checkpoint), finalizing 10:00
    arrive(dir, 1, Seq(
      (1L, ts("2024-01-01 10:01:00"), 1L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 10:04:00"), 1L, "click", 1.0, "{}"),
      (3L, ts("2024-01-01 11:00:00"), 1L, "click", 1.0, "{}")))
    run()

    // run 2 (same checkpoint): one event far behind the watermark plus one
    // at 12:00 that finalizes everything up to 11:50 — if the late event
    // leaked, a spurious second 10:00-window row would be re-emitted
    arrive(dir, 2, Seq(
      (4L, ts("2024-01-01 10:02:00"), 1L, "click", 99.0, "{}"),
      (5L, ts("2024-01-01 12:00:00"), 1L, "click", 1.0, "{}")))
    run()

    val rows = spark.read.parquet(out)
      .select("win_start", "cnt").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
    val w10 = rows.filter(_._1 == ts("2024-01-01 10:00:00"))
    assert(w10 == Seq((ts("2024-01-01 10:00:00"), 2L)),
      s"late event leaked into the closed window: $rows")
    assert(rows.contains((ts("2024-01-01 11:00:00"), 1L)))
  }

  test("mapGroupsWithState user profiles converge to the batch aggregate") {
    val dir = tmpDir("stream-profiles")
    arrive(dir, 1, Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "view", 1.5, "{}"),
      (2L, ts("2024-01-01 10:01:00"), 7L, "view", 2.5, "{}"),
      (3L, ts("2024-01-01 10:02:00"), 8L, "view", 4.0, "{}")))
    arrive(dir, 2, Seq(
      (4L, ts("2024-01-01 10:03:00"), 7L, "view", 1.0, "{}")))

    val stream = EventStreams.fromDirectory(spark, dir, maxFilesPerTrigger = Some(1))
    EventStreams.runToMemory(EventStreams.userProfiles(stream).toDF(), "profiles")

    val last = spark.table("profiles")
      .groupBy("userId").agg(max("events").as("events"), max("totalValue").as("total"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(last(7L) == ((3L, 5.0)))
    assert(last(8L) == ((1L, 4.0)))
  }

  test("flatMapGroupsWithState emits a session exactly once when the watermark closes it") {
    val dir = tmpDir("stream-sessions")
    val checkpoint = tmpDir("sess-ckpt")
    val out = tmpDir("sess-out")

    def run(): Unit = {
      val q = EventStreams.closedSessions(
        EventStreams.fromDirectory(spark, dir), gapMinutes = 5, lateness = "1 minutes")
        .toDF()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // run 1: a two-event session for user 7 (10:00, 10:02)
    arrive(dir, 1, Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "view", 1.5, "{}"),
      (2L, ts("2024-01-01 10:02:00"), 7L, "view", 2.5, "{}")))
    run()
    // run 2: a far-future event advances the watermark past 10:02+gap,
    // timing out and closing user 7's session
    arrive(dir, 2, Seq(
      (3L, ts("2024-01-01 12:00:00"), 8L, "view", 1.0, "{}")))
    run()

    val sessions = spark.read.parquet(out)
      .orderBy("userId", "startUs").collect()
      .map(r => (r.getAs[Long]("userId"), r.getAs[Long]("events"),
        r.getAs[Double]("totalValue")))
    assert(sessions.toSeq == Seq((7L, 2L, 4.0)),
      s"expected exactly user 7's closed session, got ${sessions.toSeq}")
  }

  test("a late event older than the session's reach becomes its own session, never a merge") {
    val dir = tmpDir("stream-straggler")
    val checkpoint = tmpDir("straggler-ckpt")
    val out = tmpDir("straggler-out")
    def run(): Unit = {
      val q = EventStreams.closedSessions(
        EventStreams.fromDirectory(spark, dir), gapMinutes = 5,
        lateness = "60 minutes")
        .toDF()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // batch 1: a session at 10:30
    arrive(dir, 1, Seq((1L, ts("2024-01-01 10:30:00"), 7L, "view", 1.0, "{}")))
    run()
    // batch 2: a late-but-within-watermark event at 10:00 — 30 minutes
    // BEFORE the live session. The buggy signed-gap test (us - last < gap,
    // vacuously true for earlier timestamps) merged it into the 10:30
    // session; it must close as its own single-event session
    arrive(dir, 2, Seq((2L, ts("2024-01-01 10:00:00"), 7L, "view", 2.0, "{}")))
    run()
    // batch 3: far future flushes the live session via timeout
    arrive(dir, 3, Seq((3L, ts("2024-01-01 13:00:00"), 8L, "view", 1.0, "{}")))
    run()
    val sessions = spark.read.parquet(out)
      .filter(col("userId") === 7L).orderBy("startUs").collect()
      .map(r => (r.getAs[Long]("events"), r.getAs[Double]("totalValue")))
    assert(sessions.toSeq == Seq((1L, 2.0), (1L, 1.0)),
      s"expected two single-event sessions for user 7, got ${sessions.toSeq}")
  }

  test("stream-stream interval join correlates responses within the horizon") {
    val dir = tmpDir("stream-corr")
    arrive(dir, 1, Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "view", 0.0, "{}"),     // trigger
      (2L, ts("2024-01-01 10:04:00"), 7L, "purchase", 9.99, "{}"), // within 10m
      (3L, ts("2024-01-01 10:20:00"), 7L, "purchase", 5.00, "{}"), // outside
      (4L, ts("2024-01-01 10:03:00"), 8L, "purchase", 1.00, "{}"))) // other user
    val ev = EventStreams.fromDirectory(spark, dir)
    EventStreams.runToMemory(
      EventStreams.correlate(ev, "view", "purchase"),
      "corr", outputMode = org.apache.spark.sql.streaming.OutputMode.Append())
    val rows = spark.table("corr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows == Seq((7L, 1L, 2L, 9.99)))
  }

  test("dropDuplicatesWithinWatermark removes replayed events") {
    val dir = tmpDir("stream-dedup")
    arrive(dir, 1, Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 1.0, "{}"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "a", 2.0, "{}"),
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 1.0, "{}"))) // replay of id 1
    val stream = EventStreams.dedupedEvents(
      EventStreams.fromDirectory(spark, dir))
      .select("event_id", "value")
    EventStreams.runToMemory(stream, "dedup_ev",
      outputMode = org.apache.spark.sql.streaming.OutputMode.Append())
    val ids = spark.table("dedup_ev").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L))
  }

  test("streaming and batch window semantics agree (unified API)") {
    val dir = tmpDir("stream-agree")
    arrive(dir, 1, Seq(
      (1L, ts("2024-01-01 10:01:00"), 1L, "a", 1.0, "{}"),
      (2L, ts("2024-01-01 10:14:00"), 1L, "a", 2.0, "{}"),
      (3L, ts("2024-01-01 10:16:00"), 2L, "b", 3.0, "{}")))
    val stream = EventStreams.fromDirectory(spark, dir)
    EventStreams.runToMemory(EventStreams.tumblingCounts(stream), "agree_s")
    val batch = EventStreams.tumblingCounts(
      spark.read.schema(EventStreams.eventSchema).parquet(dir))
      .orderBy("win_start", "event_type").collect().toSeq
    val streamed = spark.table("agree_s")
      .orderBy("win_start", "event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("curation operators (gopher filter + split) unify across batch and stream") {
    import spark.implicits._
    import graft.ext.{Mixing, Quality}
    val dir = tmpDir("stream-curate") + "/docs"
    val docs = Seq(
      (1L, "the cat sat on a mat and a dog sat too"),
      (2L, "xx yy"),
      (3L, "the the the the the the"),
      (4L, "a steady stream of the finest words in the set"),
      (5L, "zz")).toDF("doc_id", "text")
    docs.write.parquet(dir)
    val rules = Quality.GopherRules(minTokens = 3, maxTokens = 50,
      minMeanWordLen = 2.0, maxMeanWordLen = 8.0, maxSymbolFrac = 0.25,
      minStopwords = 1, maxDupFrac = 0.5)
    val splits = Seq("train" -> 0.8, "val" -> 0.2)
    def curate(df: org.apache.spark.sql.DataFrame) =
      Mixing.hashSplit(
        Quality.gopherFilter(df, "doc_id", "text", rules)
          .filter(col("keep")), "doc_id", "cur", splits)
        .select("doc_id", "split")
    // the SAME operator chain, once over readStream, once over read
    EventStreams.runToMemory(
      curate(spark.readStream.schema(docs.schema).parquet(dir)),
      "curate_s", org.apache.spark.sql.streaming.OutputMode.Append())
    val streamed = spark.table("curate_s").orderBy("doc_id").collect().toSeq
    val batch = curate(spark.read.schema(docs.schema).parquet(dir))
      .orderBy("doc_id").collect().toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty && streamed.map(_.getLong(0)).toSet
      .subsetOf(Set(1L, 3L, 4L))) // 2 and 5 fail minTokens
  }

  test("broadcast-model scoring (DSIR + classifier) streams unchanged") {
    import spark.implicits._
    import graft.ext.Importance
    val dir = tmpDir("stream-score") + "/docs"
    val docs = Seq(
      (1L, "physics atoms energy quantum"),
      (2L, "cats dogs pets animals"),
      (3L, "physics quantum pets energy")).toDF("doc_id", "text")
    docs.write.parquet(dir)
    // model learned once on the batch side, then applied identically to
    // the stream — the learn-on-pilot / score-every-shard deployment shape
    val model = Importance.learnDsir(docs, "text", col("doc_id") === 1L)
    val weights = Array.tabulate(32)(b => (b % 5) / 2.0 - 1.0)
    def score(df: org.apache.spark.sql.DataFrame) =
      Importance.scoreLogWeights(df, "doc_id", "text", model)
        .join(Importance.linearScore(df, "doc_id", "text", weights,
          bias = 0.1, salt = "s").select(col("doc_id"), col("prob")), "doc_id")
    EventStreams.runToMemory(
      score(spark.readStream.schema(docs.schema).parquet(dir)),
      "score_s", org.apache.spark.sql.streaming.OutputMode.Append())
    val streamed = spark.table("score_s").orderBy("doc_id").collect().toSeq
    val batch = score(spark.read.schema(docs.schema).parquet(dir))
      .orderBy("doc_id").collect().toSeq
    assert(streamed == batch && streamed.size == 3)
  }

  test("native codegen expressions (graft_langid) stream unchanged") {
    import spark.implicits._
    import graft.ext.{TextAnalysis => TA}
    val dir = tmpDir("stream-langid") + "/docs"
    Seq((1L, "the cat is in a hat"), (2L, "der hund ist nicht das und"),
      (3L, "le chat les chiens des et"))
      .toDF("doc_id", "text").write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    def tag(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), TA.langIdNative(col("text")).as("lang"))
    EventStreams.runToMemory(
      tag(spark.readStream.schema(schema).parquet(dir)),
      "langid_s", org.apache.spark.sql.streaming.OutputMode.Append())
    val streamed = spark.table("langid_s").orderBy("doc_id").collect().toSeq
    val batch = tag(spark.read.parquet(dir)).orderBy("doc_id").collect().toSeq
    assert(streamed == batch)
    assert(streamed.map(_.getString(1)) == Seq("en", "de", "fr"))
  }
}
