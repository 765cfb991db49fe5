package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregate: Misra-Gries / SpaceSaving heavy hitters
  * (Misra & Gries, "Finding repeated elements", 1982; Metwally et al.,
  * "Efficient computation of frequent and top-k elements in data
  * streams", ICDT 2005) — the mergeable top-k-token sketch corpus
  * statistics run at 100 TB, where an exact groupBy would shuffle the
  * full vocabulary.
  *
  * Guarantees: the buffer holds at most `capacity` counters whatever the
  * input size; every reported count underestimates the true count by at
  * most n/(capacity+1); and when the number of DISTINCT items is at most
  * `capacity` the counts are EXACT (no decrement ever fires) — which is
  * what lets the probe hash-check against an exact SQL oracle on the
  * bounded-vocabulary corpus while the operator stays a true sketch.
  * Merging sums counters pairwise and re-compresses, so partial
  * aggregation (map-side combine) applies at any parallelism.
  */
final class MisraGriesAggregator(capacity: Int, k: Int)
  extends Aggregator[String, mutable.Map[String, Long], Array[(String, Long)]] {
  require(capacity >= k && k > 0, s"need capacity >= k > 0, got $capacity/$k")

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(b: mutable.Map[String, Long], item: String): mutable.Map[String, Long] = {
    // SQL aggregates ignore NULLs; a null map key would also kill buffer
    // serialization (NULL_MAP_KEY)
    if (item == null) return b
    b.get(item) match {
      case Some(c) => b.update(item, c + 1)
      case None if b.size < capacity => b.update(item, 1L)
      case None =>
        // classic MG decrement: every counter loses 1, zeros evicted —
        // equivalent to decrementing the unseen item's implicit counter
        val dead = mutable.ArrayBuffer.empty[String]
        b.foreach { case (key, c) =>
          if (c == 1L) dead += key else b.update(key, c - 1)
        }
        dead.foreach(b.remove)
    }
    b
  }

  override def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (key, c) => a.update(key, a.getOrElse(key, 0L) + c) }
    if (a.size > capacity) {
      // compress: subtract the (capacity+1)-th largest count, keep
      // positive remainders (Agarwal et al., "Mergeable summaries", 2012
      // — preserves the n/(capacity+1) error bound under merging)
      val cut = a.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      a.foreach { case (key, c) =>
        if (c - cut <= 0L) dead += key else a.update(key, c - cut)
      }
      dead.foreach(a.remove)
    }
    a
  }

  /** Top-k surviving counters, count-descending with item tiebreak —
    * deterministic regardless of map iteration order.
    */
  override def finish(r: mutable.Map[String, Long]): Array[(String, Long)] =
    r.toArray.sortBy { case (item, c) => (-c, item) }.take(k)

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    ExpressionEncoder[mutable.Map[String, Long]]()
  override def outputEncoder: Encoder[Array[(String, Long)]] =
    ExpressionEncoder[Array[(String, Long)]]()
}

object TopKAgg {
  /** Column function: top-k heavy hitters of a string column as an array
    * of (item, count) structs, count-descending.
    */
  def topK(item: Column, capacity: Int = 1024, k: Int = 10): Column =
    udaf(new MisraGriesAggregator(capacity, k)).apply(item)
}
