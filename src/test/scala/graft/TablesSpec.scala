package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins `Tables.load`'s events-timestamp normalization against testdata
  * regenerations (the r9 `aa9a3cd` fix): whatever physical shape the
  * generator ships — TIMESTAMP(NANOS) arriving as long nanos under
  * `nanosAsLong`, or naive micros arriving as TimestampNTZ — every probe
  * must see one session-zone TimestampType column whose face value
  * matches the oracle's reading.
  */
class TablesSpec extends AnyFunSuite with SharedSpark {

  private val wallClock = "2026-01-15 08:30:00"

  test("naive-micros events normalize to the oracle's reading") {
    import spark.implicits._
    val dir = tmpDir("events-ntz")
    // naive micros: what a pandas/pyarrow regeneration without tz info
    // writes (timestamp[us], isAdjustedToUTC=false) → TimestampNTZ
    Seq(1L).toDF("event_id")
      .withColumn("ts", lit(wallClock).cast(TimestampNTZType))
      .write.parquet(s"$dir/events.parquet")
    val loaded = Tables.load(spark, dir, "events")
    assert(loaded.schema("ts").dataType == TimestampType)
    // under the UTC session GraftSession pins, the naive face value IS
    // the UTC instant — exactly DuckDB's CAST(ts AS TIMESTAMP)
    assert(loaded.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .head().getString(0) == wallClock)
  }

  test("long-nanos events normalize to the same instant") {
    import spark.implicits._
    val dir = tmpDir("events-nanos")
    // TIMESTAMP(NANOS) under nanosAsLong arrives as LongType; the data
    // is µs-aligned so `div 1000` is lossless
    val nanos = java.time.LocalDateTime
      .parse(wallClock.replace(' ', 'T'))
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L
    Seq((1L, nanos)).toDF("event_id", "ts")
      .write.parquet(s"$dir/events.parquet")
    val loaded = Tables.load(spark, dir, "events")
    assert(loaded.schema("ts").dataType == TimestampType)
    assert(loaded.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .head().getString(0) == wallClock)
  }

  test("non-events tables pass through untouched") {
    import spark.implicits._
    val dir = tmpDir("docs")
    Seq((1L, "a")).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val loaded = Tables.load(spark, dir, "documents")
    assert(loaded.columns.toSeq == Seq("doc_id", "text"))
    assert(loaded.count() == 1)
  }
}
