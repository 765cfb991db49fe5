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
  /** Per-JVM inferred-schema cache for the immutable testdata tables:
    * every `spark.read.parquet` without an explicit schema runs a
    * driver-side footer-inference job (~30-100 ms), and the probe suite
    * loads these tables thousands of times per bench run. Metadata
    * caching only — the query still scans the parquet files on every
    * evaluation; the cached schema is byte-identical to what inference
    * returns, so plans are unchanged.
    */
  private val schemas =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemas.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    val df = spark.read.schema(schema).parquet(path)
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
