package graft.ops

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property tests for the distributed order-statistic primitive: for ANY
  * key arrangement, partitioning, and rank, the threshold-selection path
  * must equal the in-memory sorted reference — the degrees of freedom a
  * sketch-bracketed distributed selection has (where the approx-quantile
  * brackets land, how the band recursion splits) must never change the
  * answer. Case counts are kept small: every case runs real Spark jobs.
  */
object OrderStatProps extends Properties("OrderStat") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = graft.GraftSession.local(cores = 4,
    shufflePartitions = 4)

  // distinct keys (boundary-tie refusal is pinned deterministically in
  // OrderStatSpec; the property space here is arrangement × rank)
  private val distinctCase: Gen[(Seq[Double], Int, Int)] = for {
    n <- Gen.choose(20, 160)
    seed <- Gen.choose(1L, Long.MaxValue)
    k <- Gen.choose(1, n)
    parts <- Gen.choose(1, 7)
  } yield {
    val rnd = new scala.util.Random(seed)
    ((0 until n).map(_ => rnd.nextDouble()).distinct, k, parts)
  }

  // duplicate-heavy keys from a tiny value pool (the tie regime the
  // VALUE queries must resolve without refusal)
  private val dupCase: Gen[(Seq[Double], Int, Int)] = for {
    n <- Gen.choose(20, 160)
    pool <- Gen.choose(2, 5)
    seed <- Gen.choose(1L, Long.MaxValue)
    k <- Gen.choose(1, n)
    parts <- Gen.choose(1, 7)
  } yield {
    val rnd = new scala.util.Random(seed)
    ((0 until n).map(_ => (rnd.nextInt(pool) + 1).toDouble), k, parts)
  }

  private def frame(keys: Seq[Double], parts: Int) = {
    val s = spark
    import s.implicits._
    keys.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "key").repartition(parts)
  }

  property("topKByKeyDesc equals the sorted reference at any rank") =
    forAll(distinctCase) { case (keys, k0, parts) =>
      val keysD = keys
      val k = math.min(k0, keysD.size)
      val got = OrderStat.topKByKeyDesc(frame(keysD, parts), "key", "id",
          k.toLong, cutover = 8)
        .select("id").collect().map(_.getLong(0)).toSet
      val want = keysD.zipWithIndex
        .sortBy { case (v, i) => (-v, i) }.take(k).map(_._2.toLong).toSet
      Prop(got == want) :| s"k=$k got=$got want=$want"
    }

  property("kthLargestKey equals the reference under heavy ties") =
    forAll(dupCase) { case (keys, k, parts) =>
      val got = OrderStat.kthLargestKey(frame(keys, parts), "key", k.toLong,
        cutover = 4, relErr = 0.05)
      val want = keys.sorted(Ordering[Double].reverse).apply(k - 1)
      Prop(got == want) :| s"k=$k got=$got want=$want"
    }

  property("exactQuantilesDisc realizes rank max(1, ceil(q*n))") =
    forAll(for {
      c <- dupCase
      qs <- Gen.listOfN(3, Gen.choose(0.0, 1.0))
    } yield (c._1, c._3, qs)) { case (keys, parts, qs) =>
      val got = OrderStat.exactQuantilesDisc(frame(keys, parts), "key", qs,
        cutover = 4, relErr = 0.05)
      val asc = keys.sorted
      val want = qs.map { q =>
        asc(math.max(1, math.ceil(q * asc.size).toInt) - 1)
      }
      Prop(got == want) :| s"qs=$qs got=$got want=$want"
    }
}
