package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.expressions.Literal

/** Property tests for the hand-rolled bounded top-k buffer: whatever the
  * arrival order, partitioning, merge order, or serialization boundaries
  * — exactly the degrees of freedom a distributed partial aggregation
  * has — the result must equal the sorted-reference take-k under the
  * NaN-worst total order.
  */
object TopKBufferProps extends Properties("TopKBuffer") {

  private def referenceOrd: Ordering[(Long, Double)] =
    new Ordering[(Long, Double)] {
      override def compare(a: (Long, Double), b: (Long, Double)): Int = {
        val (n1, n2) = (a._2.isNaN, b._2.isNaN)
        if (n1 || n2) {
          if (n1 && n2) java.lang.Long.compare(a._1, b._1)
          else if (n1) 1 else -1
        } else {
          val c = java.lang.Double.compare(b._2, a._2)
          if (c != 0) c else java.lang.Long.compare(a._1, b._1)
        }
      }
    }

  private def reference(xs: Seq[(Long, Double)], k: Int): Seq[(Long, Double)] =
    xs.sorted(referenceOrd).take(k)

  private def bufferOf(xs: Seq[(Long, Double)], k: Int): TopKBuffer = {
    val b = new TopKBuffer(k)
    xs.foreach { case (id, s) => b.insert(id, s) }
    b
  }

  private def contents(b: TopKBuffer): Seq[(Long, Double)] =
    (0 until b.n).map(i => (b.ids(i), b.scores(i)))

  /** NaN-aware row equality: Scala `==` on (Long, Double) tuples compares
    * doubles with primitive `==`, so NaN != NaN would fail rows the
    * buffer handled correctly.
    */
  private def sameRows(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Boolean =
    a.size == b.size && a.zip(b).forall { case ((i1, s1), (i2, s2)) =>
      i1 == i2 && java.lang.Double.compare(s1, s2) == 0
    }

  private val genScore: Gen[Double] = Gen.frequency(
    8 -> Gen.choose(-1.0, 1.0),
    1 -> Gen.oneOf(0.0, 1.0, -1.0), // deliberate score ties
    1 -> Gen.const(Double.NaN))

  private val genRows: Gen[List[(Long, Double)]] =
    Gen.listOf(Gen.zip(Gen.choose(0L, 40L), genScore))

  property("insert order never changes the result") =
    forAll(genRows, Gen.choose(1, 8), Gen.long) { (xs, k, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(xs)
      sameRows(contents(bufferOf(shuffled, k)), reference(xs, k))
    }

  property("random partitioning + merge order equals the global answer") =
    forAll(genRows, Gen.choose(1, 8), Gen.long) { (xs, k, seed) =>
      val rnd = new scala.util.Random(seed)
      // split into random chunks, build a partial buffer per chunk
      // (map-side), merge in random order (reduce-side)
      val chunks = if (xs.isEmpty) List(Nil) else {
        val n = 1 + rnd.nextInt(4)
        xs.grouped(math.max(1, math.ceil(xs.size.toDouble / n).toInt)).toList
      }
      val partials = rnd.shuffle(chunks.map(c => bufferOf(c, k)))
      val merged = partials.reduceLeft { (a, b) => a.mergeFrom(b); a }
      sameRows(contents(merged), reference(xs, k))
    }

  property("serialize/deserialize roundtrip preserves the buffer") =
    forAll(genRows, Gen.choose(1, 8)) { (xs, k) =>
      val expr = TopKByScoreNative(Literal(0L), Literal(0.0), Literal(k))
      val b = bufferOf(xs, k)
      sameRows(contents(expr.deserialize(expr.serialize(b))), contents(b))
    }

  property("buffer never exceeds k entries") =
    forAll(genRows, Gen.choose(1, 8)) { (xs, k) =>
      Prop(bufferOf(xs, k).n <= k)
    }
}
