package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Multi-dimensional data layout: Z-order (Morton) clustering keys.
  *
  * At 100 TB the dominant query cost is the scan, and the dominant scan
  * saving is file/row-group pruning on min-max statistics. Sorting by one
  * column prunes one predicate; interleaving the bits of two columns
  * (the Z-order curve, Morton 1966 — the clustering scheme Delta Lake's
  * OPTIMIZE ZORDER and friends use) keeps BOTH columns locally dense in
  * every output file, so parquet min-max pruning works for either
  * predicate or their conjunction.
  *
  * The key is a pure bit-arithmetic expression — a static, codegen'd
  * tree of shifts and masks, zero shuffle to compute — and
  * [[writeZClustered]] pairs it with ONE range repartition so output
  * files tile the (a, b) space in Z-order.
  */
object Layout {

  /** Morton key interleaving the low `bits` bits of two non-negative
    * integer columns: bit j of `a` lands at position 2j, bit j of `b` at
    * 2j+1. Inputs must already be reduced to `bits` width (pmod, bucket
    * id, quantile rank...); 2·bits ≤ 62 keeps the key in a long.
    */
  def zorderKey2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).map { j =>
      shiftleft(shiftright(al, j).bitwiseAND(lit(1L)), 2 * j) +
        shiftleft(shiftright(bl, j).bitwiseAND(lit(1L)), 2 * j + 1)
    }.reduce(_ + _)
  }

  /** Scalar mirror of [[zorderKey2]] (tests / driver-side planning). */
  private[graft] def zorderKey2Scalar(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var j = 0
    while (j < bits) {
      z += ((a >> j) & 1L) << (2 * j)
      z += ((b >> j) & 1L) << (2 * j + 1)
      j += 1
    }
    z
  }

  /** Write `df` as parquet tiled along the Z-curve of (`a`, `b`): range
    * repartition on the Morton key (one shuffle, contiguous key ranges
    * per file) + an intra-partition sort so row groups inside each file
    * stay dense too. Readers filtering on either dimension prune files
    * by parquet min-max stats with no layout knowledge.
    */
  def writeZClustered(df: DataFrame, path: String, a: Column, b: Column,
                      bits: Int = 16, numFiles: Int = 200): DataFrame = {
    val zc = Cols.fresh(df, "_z_key")
    // the key is dropped ABOVE the sort, so files carry only caller
    // columns while rows still land in Z-curve order
    df.withColumn(zc, zorderKey2(a, b, bits))
      .repartitionByRange(numFiles, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
      .write.mode("overwrite").parquet(path)
    // hand back the materialized files, not the pre-write plan — a
    // consumer of the return value must not replay the shuffle+sort
    df.sparkSession.read.parquet(path)
  }
}
