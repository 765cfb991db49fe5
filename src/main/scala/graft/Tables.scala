package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the driver-generated testdata tables (TESTDATA.md).
  *
  * `events.ts` is parquet TIMESTAMP(NANOS); with
  * `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as long
  * nanoseconds, which we normalize to a microsecond TimestampType column
  * (the data is µs-aligned, so this is lossless and matches what DuckDB
  * sees after `CAST(ts AS TIMESTAMP)`).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType.typeName == "long")
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
