package graft.ops

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

/** Properties for the literal-boundary dense-id scheme: ids must equal
  * the global row_number rank for ANY unique key set — duplicate-heavy
  * leading columns (every boundary comparison exercises the tie-break
  * chain), negative keys, tiny and empty inputs, arbitrary upstream
  * partition layouts — because ingest's SERIAL parity rides on it and a
  * wrong id is silent corruption, not an error.
  */
object GlobalOrderProps extends Properties("denseIds") {

  private lazy val spark = graft.GraftSession.local(
    cores = 4, shufflePartitions = 4)

  // each case runs Spark jobs; a handful of diverse cases is the budget
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8)

  property("equals the driver-computed global rank, any layout") =
    forAll(Gen.choose(0, 1200), Gen.choose(1, 40), Gen.choose(-5L, 5L),
      Gen.choose(1, 13), Gen.choose(0L, 1000L), Gen.long) {
      (n, dupWidth, grpShift, parts, base, seed) =>
        import spark.implicits._
        val rnd = new scala.util.Random(seed)
        // leading column: heavy duplicates (skew); trailing column: a
        // shuffled unique suffix, so only the PAIR is a unique key
        val subs = rnd.shuffle((0 until n).toVector)
        val rows = (0 until n).map { i =>
          ((i % dupWidth).toLong + grpShift, f"s${subs(i)}%09d")
        }
        val df = rows.toDF("g", "s").repartition(parts)
        val got = GlobalOrder.denseIds(df, Seq(col("g"), col("s")), "id",
            base = base)
          .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
          .toMap
        // ASCII-only keys: driver (Long, String) ordering == engine order
        val expected = rows.sorted.zipWithIndex
          .map { case (k, i) => k -> (base + 1L + i) }.toMap
        Prop(got == expected) :| s"n=$n dupWidth=$dupWidth parts=$parts"
    }
}
