package graft.ext

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Properties for the IVF probe-cell generator: every partition-pruned
  * ANN query trusts this ball to be exactly the Hamming neighbourhood —
  * a missing cell silently costs recall, a stray cell breaks pruning.
  */
object CellsProps extends Properties("cellsWithinHamming") {

  private def binomial(n: Int, r: Int): Long =
    (0 until r).foldLeft(1L)((acc, i) => acc * (n - i) / (i + 1))

  property("distinct, complete, and within radius") =
    forAll(Gen.choose(1, 10), Gen.choose(0, 3), Gen.long) { (bits, h, seed) =>
      val center = new scala.util.Random(seed).nextLong() & ((1L << bits) - 1)
      val cells = Similarity.cellsWithinHamming(center, bits, h)
      val expectedCount = (0 to math.min(h, bits)).map(binomial(bits, _)).sum
      Prop(cells.contains(center)) :| "center included" &&
        Prop(cells.distinct.size == cells.size) :| "no duplicates" &&
        Prop(cells.size.toLong == expectedCount) :| "exact ball size" &&
        Prop(cells.forall(c =>
          java.lang.Long.bitCount(c ^ center) <= h &&
            (c & ~((1L << bits) - 1)) == 0L)) :| "within radius and bit range"
    }
}
