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
  def zorderKey2(a: Column, b: Column, bits: Int = 16): Column =
    zorderKeyN(Seq(a, b), bits)

  /** N-dimensional Morton key: bit j of dimension i lands at position
    * j·n + i, so every dimension stays locally dense in every output
    * file and parquet min-max pruning works for any single predicate or
    * conjunction ([[graft.store.TableStore.readRangeAll]] is the
    * matching read). n·bits ≤ 62 keeps the key in a long; for n = 2 this
    * is exactly [[zorderKey2]]'s layout.
    */
  def zorderKeyN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.length
    require(n >= 2, s"zorderKeyN needs at least 2 dimensions, got $n")
    require(bits > 0 && n * bits <= 62,
      s"n*bits must be in [1, 62], got $n*$bits")
    val longs = cols.map(_.cast("long"))
    (for {
      j <- 0 until bits
      (c, i) <- longs.zipWithIndex
    } yield shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * n + i))
      .reduce(_ + _)
  }

  /** Scalar mirror of [[zorderKeyN]] (tests / driver-side planning). */
  private[graft] def zorderKeyNScalar(vs: Seq[Long], bits: Int): Long = {
    val n = vs.length
    var z = 0L
    for (j <- 0 until bits; i <- 0 until n)
      z += ((vs(i) >> j) & 1L) << (j * n + i)
    z
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
                      bits: Int = 16, numFiles: Int = 200): DataFrame =
    writeZClusteredN(df, path, Seq(a, b), bits, numFiles)

  /** [[writeZClustered]] over N dimensions (the [[zorderKeyN]] curve). */
  def writeZClusteredN(df: DataFrame, path: String, dims: Seq[Column],
                       bits: Int = 16, numFiles: Int = 200): DataFrame = {
    val zc = Cols.fresh(df, "_z_key")
    // the key is dropped ABOVE the sort, so files carry only caller
    // columns while rows still land in Z-curve order
    df.withColumn(zc, zorderKeyN(dims, bits))
      .repartitionByRange(numFiles, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
      .write.mode("overwrite").parquet(path)
    // hand back the materialized files, not the pre-write plan — a
    // consumer of the return value must not replay the shuffle+sort
    df.sparkSession.read.parquet(path)
  }
}
