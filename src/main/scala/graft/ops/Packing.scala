package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Sequence packing for pretraining-data assembly: documents are
  * concatenated in a deterministic order (ascending id) and chopped into
  * fixed-length token sequences, the standard way LLM training shards are
  * packed (a document may straddle a sequence boundary). The result maps
  * every document to its placement: first sequence index, offset within
  * that sequence, and last sequence touched.
  *
  * Scale design: the placement is a running token sum over a globally
  * sorted corpus. A naive `Window.orderBy(id)` (no partition key) funnels
  * the corpus through ONE task; instead this runs the classic two-pass
  * distributed prefix sum — range-partition + sort by id, collect one
  * per-partition subtotal row to the driver (one long per partition),
  * broadcast the cumulative base offsets back, and stream each partition
  * with its base. One shuffle (the range partitioning), no single-task
  * bottleneck, O(partitions) driver state.
  */
object Packing {

  /** @param idCol       unique document id (packing order)
    * @param tokenCol    per-document token count
    * @param seqLen      tokens per packed training sequence (> 0)
    * @return (doc_id, token_count, token_start, seq_start, seq_offset,
    *         seq_end); zero-token documents occupy no tokens and get
    *         seq_end = seq_start
    */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df
      .select(col(idCol).cast("long").as("id"), col(tokenCol).cast("long").as("tok"))
      .repartitionByRange(col("id"))
      .sortWithinPartitions("id")
      .as[(Long, Long)]
    // pass 1: per-partition token subtotal (one row per partition)
    val subtotals = sorted.mapPartitions { it =>
      var s = 0L
      it.foreach(s += _._2)
      Iterator.single((TaskContext.getPartitionId(), s))
    }.collect().toMap
    val nParts = sorted.rdd.getNumPartitions
    val bases = new Array[Long](nParts)
    var acc = 0L
    (0 until nParts).foreach { p => bases(p) = acc; acc += subtotals.getOrElse(p, 0L) }
    val bc = spark.sparkContext.broadcast(bases)
    // pass 2: stream each partition with its cumulative base offset
    sorted.mapPartitions { it =>
      var run = bc.value(TaskContext.getPartitionId())
      it.map { case (id, tok) =>
        val start = run
        run += tok
        (id, tok, start)
      }
    }.toDF("doc_id", "token_count", "token_start")
      // integer `div`, not `/`: double division would lose exactness for
      // token offsets past 2^53 (and these are exact placements, not stats)
      .select(col("doc_id"), col("token_count"), col("token_start"),
        expr(s"token_start div ${seqLen}L").as("seq_start"),
        pmod(col("token_start"), lit(seqLen)).as("seq_offset"),
        greatest(expr(s"token_start div ${seqLen}L"),
          expr(s"(token_start + token_count - 1) div ${seqLen}L")).as("seq_end"))
  }
}
