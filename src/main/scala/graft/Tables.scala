package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the driver-generated testdata tables (TESTDATA.md).
  *
  * `events.ts` normalizes to a session-zone TimestampType column whatever
  * physical shape the generator produced — the rest of the engine (and
  * every oracle, via `CAST(ts AS TIMESTAMP)` under a UTC session) sees
  * one type:
  *   - TIMESTAMP(NANOS): arrives as long nanoseconds under
  *     `spark.sql.legacy.parquet.nanosAsLong=true` (the data is
  *     µs-aligned, so the division is lossless);
  *   - naive micros (`timestamp[us]`, isAdjustedToUTC=false): arrives as
  *     TimestampNTZType; the cast interprets the naive value in the
  *     session zone (UTC — GraftSession pins it), exactly DuckDB's
  *     reading of the same column.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
}
