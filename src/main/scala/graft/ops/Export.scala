package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Corpus EXPORT in the interchange format most training stacks
  * consume: gzipped JSONL in deterministic, size-bounded shards. The
  * parquet tables are the engine's working format; the handoff to a
  * trainer (or any non-JVM consumer) is one JSON object per line,
  * `shard=N/part-*.txt.gz` — readable by a shell, a dataloader, or
  * `spark.read.json` alike.
  *
  * Scale shape: shard assignment is a funnel-free dense ordinal
  * ([[GlobalOrder.denseIds]] — literal-boundary buckets, never a single
  * partition) divided by `rowsPerShard`; rows then hash-exchange ON the
  * shard id, so each shard's lines land in exactly one task and one
  * output file, written in ordinal order. One corpus exchange total.
  */
object Export {

  /** Write `df` as gzipped JSONL shards of `rowsPerShard` rows under
    * `path` (hive layout `_shard=N/`). Rows are ordered by `orderCols`
    * (must be a total order for a deterministic export) and serialized
    * with `to_json` over exactly the input columns.
    *
    * Input-determinism precondition (the [[GlobalOrder.denseIds]]
    * contract): `df` is evaluated more than once while ordinals are
    * assigned, so a nondeterministic frame (rand(), an unstable limit)
    * must be persisted or checkpointed by the caller first — the same
    * rule every denseIds consumer follows.
    *
    * @return the number of shards written (0 for an empty frame —
    *         nothing is written, there is no empty-JSONL convention)
    */
  def writeJsonlShards(df: DataFrame, orderCols: Seq[Column],
                       rowsPerShard: Long, path: String): Long = {
    require(rowsPerShard > 0, s"rowsPerShard must be positive, got $rowsPerShard")
    if (df.limit(1).isEmpty) return 0L
    val dataCols = df.columns.map(col)
    val sharded = GlobalOrder.denseIds(df, orderCols, "_ord", 0L)
      .withColumn("_shard", expr(s"(_ord - 1) div ${rowsPerShard}L"))
      .withColumn("_json", to_json(struct(dataCols: _*)))
    sharded
      .repartition(col("_shard"))
      .sortWithinPartitions("_shard", "_ord")
      .select("_shard", "_json")
      .write.mode("overwrite").partitionBy("_shard")
      .option("compression", "gzip")
      .text(path)
    df.sparkSession.read.text(path).inputFiles
      .flatMap(_.split("/").find(_.startsWith("_shard="))).distinct.length.toLong
  }

  /** Read a JSONL shard export back as a DataFrame (`_shard` returns as
    * the partition column; pass `schemaDdl` to skip inference — the
    * right call on a large export, where inference is a full pre-scan).
    */
  def readJsonlShards(spark: SparkSession, path: String,
                      schemaDdl: Option[String] = None): DataFrame = {
    val reader = spark.read
    schemaDdl.foreach(d =>
      reader.schema(org.apache.spark.sql.types.StructType.fromDDL(d)))
    reader.json(path)
  }
}
