package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregate: bounded top-k by score per group — the
  * map-side-combinable replacement for `row_number().over(partitionBy
  * ... orderBy score)` + `filter(rn <= k)`. The window formulation must
  * shuffle EVERY candidate row to sort it; this aggregator keeps a k-row
  * buffer per group on the map side, so the exchange carries at most k
  * rows per (group, input partition) — for a k-NN join over blocks of B
  * vectors that is k rows instead of B per vector, the difference
  * between a shuffle that scales with the pair space and one that
  * scales with the answer.
  *
  * Ordering matches the window form — score descending, id ascending
  * tiebreak — with two deliberate divergences: NaN scores rank strictly
  * WORST (`ORDER BY score DESC` would rank NaN above every real value —
  * garbage first), and null ids/scores are skipped like SQL aggregates
  * skip nulls (the window form would rank them). For real-valued,
  * non-null inputs winners are identical (boundary ties included) and
  * oracle hash-checks carry over unchanged. Both conventions match the
  * native `graft_topk_by_score` exactly.
  */
final class TopKByScoreAggregator(k: Int)
  extends Aggregator[(Option[Long], Option[Double]), List[(Double, Long)], Array[TopKByScore.Neighbor]] {
  require(k > 0, s"k must be positive, got $k")

  // rank order: best first = highest score, then lowest id; NaN ranks
  // strictly worst, matching TopKBuffer.better exactly (the implicit
  // tuple ordering would use IEEE Double semantics, where comparisons
  // against NaN are all false and sort position becomes arrival-
  // dependent)
  private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val (n1, n2) = (a._1.isNaN, b._1.isNaN)
      if (n1 || n2) {
        if (n1 && n2) java.lang.Long.compare(a._2, b._2)
        else if (n1) 1 else -1 // NaN ranks after (worse than) any real
      } else {
        val c = java.lang.Double.compare(b._1, a._1) // score desc
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
  }

  override def zero: List[(Double, Long)] = Nil

  override def reduce(b: List[(Double, Long)],
                      in: (Option[Long], Option[Double])): List[(Double, Long)] =
    in match {
      // null id/score rows are skipped (SQL-aggregate null convention,
      // same as the native graft_topk_by_score) — a non-optional tuple
      // encoder would instead throw on the first null reaching it
      case (Some(id), Some(score)) =>
        ((score, id) :: b).sorted(ord).take(k) // k is tiny; re-sort is cheap
      case _ => b
    }

  override def merge(a: List[(Double, Long)],
                     b: List[(Double, Long)]): List[(Double, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(r: List[(Double, Long)]): Array[TopKByScore.Neighbor] =
    r.sorted(ord).map { case (score, id) => TopKByScore.Neighbor(id, score) }
      .toArray

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Array[TopKByScore.Neighbor]] =
    ExpressionEncoder[Array[TopKByScore.Neighbor]]()
}

object TopKByScore {
  /** Named struct fields so downstream `explode` reads `.id`/`.score`
    * instead of tuple `_1`/`_2`.
    */
  final case class Neighbor(id: Long, score: Double)

  /** Column function: top-k (id, score) structs of a group, score
    * descending with id tiebreak.
    */
  def topKByScore(id: Column, score: Column, k: Int): Column =
    udaf(new TopKByScoreAggregator(k),
      ExpressionEncoder[(Option[Long], Option[Double])]()).apply(id, score)
}
