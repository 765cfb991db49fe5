package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import graft.ext.Dedup

/** Custom typed aggregate (SURVEY §2.4 [EXT] note: MinHash-signature
  * aggregate as an `Aggregator` registered through `functions.udaf`):
  * aggregates the min-wise signature of the UNION of all input documents'
  * shingle sets within a group. Because min-wise hashing distributes over
  * union (sig(A ∪ B) = elementwise-min(sig(A), sig(B))), partial
  * aggregation is exact — the buffer is k longs regardless of corpus
  * size, so a whole-corpus or per-partition-key sketch costs one
  * map-side-combined pass at any scale.
  */
final class MinHashAggregator(k: Int)
  extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], text: String): Array[Long] = {
    // SQL aggregates ignore NULLs — nulls DO reach typed udaf reduce
    // (same guard as MisraGriesAggregator); shingling null would NPE
    if (text == null) buf
    else merge(buf, Dedup.minhashSig(Dedup.shingleSet(text), k))
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](k)
    var i = 0
    while (i < k) { out(i) = math.min(a(i), b(i)); i += 1 }
    out
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] = MinHashAgg.longArrayEncoder
  override def outputEncoder: Encoder[Array[Long]] = MinHashAgg.longArrayEncoder
}

object MinHashAgg {
  private[functions] val longArrayEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  /** Column function: MinHash signature of a group's shingle-set union. */
  def minhashUnion(text: Column, k: Int = 32): Column =
    udaf(new MinHashAggregator(k)).apply(text)

  /** Estimated Jaccard between two equal-length signatures: the fraction
    * of agreeing slots (a plain expression over the two array columns).
    */
  def estimatedJaccard(sigA: Column, sigB: Column): Column = {
    import org.apache.spark.sql.functions._
    aggregate(zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / size(sigA).cast("double")
  }
}
