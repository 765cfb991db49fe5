package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class OrderStatSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  // deterministic pseudo-random-ish keys: md5-derived doubles in [0,1)
  private def keyedFrame(n: Long) =
    spark.range(n).toDF("id")
      .withColumn("key",
        graft.ext.Dedup.md5Hash60Col(concat(lit("os"),
          col("id").cast("string"))).cast("double") / math.pow(2.0, 60))

  test("distributed path matches the TakeOrdered path exactly") {
    val df = keyedFrame(5000L).repartition(13)
    val viaTakeOrdered = OrderStat
      .topKByKeyDesc(df, "key", "id", k = 1200, cutover = 65536)
      .select("id").as[Long].collect().toSet
    val viaThreshold = OrderStat
      .topKByKeyDesc(df, "key", "id", k = 1200, cutover = 32)
      .select("id").as[Long].collect().toSet
    assert(viaTakeOrdered.size === 1200)
    assert(viaThreshold === viaTakeOrdered)
  }

  test("boundary ties break by the tiebreak column, ascending") {
    // 400 rows share key 1.0, 400 share 0.5; k=600 must take ALL of the
    // 1.0 tier plus the 200 smallest ids of the 0.5 tier. The cutover
    // must admit the 400-row boundary tie set (the contract: tie sets
    // larger than the cutover refuse — covered by the next test)
    val df = (0L until 800L).map(i => (i, if (i % 2 == 0) 1.0 else 0.5))
      .toDF("id", "key").repartition(7)
    val got = OrderStat.topKByKeyDesc(df, "key", "id", k = 600, cutover = 512,
        relErr = 0.01)
      .select("id", "key").as[(Long, Double)].collect()
    assert(got.length === 600)
    val (top, rest) = got.partition(_._2 == 1.0)
    assert(top.length === 400)
    // the 0.5 tier kept exactly the 200 smallest odd ids
    assert(rest.map(_._1).sorted.toSeq ===
      (1L until 800L by 2).take(200).toSeq)
  }

  test("k >= row count returns every non-null-key row") {
    val df = keyedFrame(100L)
      .withColumn("key", when(col("id") < 10L, lit(null)).otherwise(col("key")))
    val got = OrderStat.topKByKeyDesc(df, "key", "id", k = 500, cutover = 8)
    assert(got.count() === 90L)
  }

  test("boundary tie 100x the cutover resolves by distributed tiebreak rank (r18)") {
    // ALL 2000 keys identical — the bracket can never shrink, so the
    // r17 code refused; now the tie set ranks by its tiebreak without
    // any k-sized driver merge
    val df = (0L until 2000L).map(i => (i, 1.0)).toDF("id", "key")
      .repartition(7)
    val got = OrderStat.topKByKeyDesc(df, "key", "id", k = 700, cutover = 16,
        relErr = 0.01)
      .select("id").as[Long].collect().sorted
    assert(got.toSeq === (0L until 700L), "sorted-reference mismatch")
    // partial tie: 500 rows outrank the tie tier; the remaining 200
    // come from the 2000-row boundary tie by tiebreak rank
    val mixed = ((0L until 500L).map(i => (10000L + i, 2.0)) ++
      (0L until 2000L).map(i => (i, 1.0))).toDF("id", "key").repartition(5)
    val got2 = OrderStat.topKByKeyDesc(mixed, "key", "id", k = 700,
        cutover = 16, relErr = 0.01)
      .select("id").as[Long].collect().sorted
    assert(got2.toSeq === ((0L until 200L) ++ (10000L until 10500L)).sorted)
  }

  test("hex-string tiebreaks rank through the 256-bucket idiom (r18)") {
    val df = (0L until 1500L)
      .map { i =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"tie$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
        (hex, 1.0)
      }
      .toDF("id", "key").repartition(6)
    val want = df.select("id").as[String].collect().sorted.take(600).toSet
    val got = OrderStat.topKByKeyDesc(df, "key", "id", k = 600, cutover = 16,
        relErr = 0.01)
      .select("id").as[String].collect().toSet
    assert(got === want)
  }

  test("a tie set needed WHOLE short-circuits the rank — even unrankable tiebreaks (r18)") {
    // 500 rows outrank the tie tier, the FULL 2000-row tie tier is
    // needed, and 100 rows fall below: remaining == tieCount, so no
    // rank (and no refusal) even though the tiebreak is a non-hex
    // string no distributed rank exists for
    val df = ((0L until 500L).map(i => (s"TOP_$i", 2.0)) ++
      (0L until 2000L).map(i => (s"TIE_$i", 1.0)) ++
      (0L until 100L).map(i => (s"LOW_$i", 0.5)))
      .toDF("id", "key").repartition(9)
    val got = OrderStat.topKByKeyDesc(df, "key", "id", k = 2500,
        cutover = 16, relErr = 0.01)
      .select("key").as[Double].collect()
    assert(got.length === 2500)
    assert(got.count(_ == 2.0) === 500 && got.count(_ == 1.0) === 2000)
  }

  test("unrankable tie sets still refuse loudly (r18)") {
    // tiebreak collapsed too: every row identical in key AND tiebreak
    val collapsed = (0L until 2000L).map(_ => (5L, 1.0)).toDF("id", "key")
    val e1 = intercept[IllegalArgumentException] {
      OrderStat.topKByKeyDesc(collapsed, "key", "id", k = 700, cutover = 16,
        relErr = 0.01).count()
    }
    assert(e1.getMessage.contains("collapsed"), e1.getMessage)
    // non-hex string tiebreak: no defined distributed rank — refuse
    val nonHex = (0L until 2000L).map(i => (s"DOC_$i", 1.0)).toDF("id", "key")
    val e2 = intercept[IllegalArgumentException] {
      OrderStat.topKByKeyDesc(nonHex, "key", "id", k = 700, cutover = 16,
        relErr = 0.01).count()
    }
    assert(e2.getMessage.contains("hex"), e2.getMessage)
  }

  test("the pinned working set materializes upstream exactly once (r18)") {
    // count upstream SCANS (partition task executions), not per-row
    // evals — Catalyst legitimately inlines deterministic expressions
    // into both a filter and its projection within one pass
    val scans = spark.sparkContext.longAccumulator("os-upstream-scans")
    val df = spark.range(3000L).as[Long].repartition(4)
      .mapPartitions { it => scans.add(1L); it }
      .toDF("id")
      .withColumn("key", col("id").cast("double") / 4096.0)
    // multi-level selection: tiny cutover + coarse sketch force the
    // bracket loop through several levels — every pass after the pin
    // must hit the cache, not re-run the upstream plan
    val qs = OrderStat.exactQuantilesDisc(df, "key", Seq(0.1, 0.5, 0.9),
      cutover = 16, relErr = 0.01)
    assert(qs === Seq(299.0 / 4096.0, 1499.0 / 4096.0, 2699.0 / 4096.0))
    assert(scans.value === 4L,
      s"upstream scanned ${scans.value / 4} times — the working-set pin leaked")
  }

  test("no TakeOrdered above the cutover in the selected plan") {
    val df = keyedFrame(4000L).repartition(11)
    val plan = OrderStat.topKByKeyDesc(df, "key", "id", k = 900, cutover = 32)
      .queryExecution.executedPlan.toString
    // every TakeOrderedAndProject in the plan is the bounded band merge:
    // its limit must be <= cutover — the k-sized driver merge is gone
    val limits = "TakeOrderedAndProject\\(limit=(\\d+)".r
      .findAllMatchIn(plan).map(_.group(1).toInt).toList
    assert(limits.forall(_ <= 32), s"oversized TakeOrdered in:\n$plan")
  }

  test("kthLargestKey matches the sorted reference at every rank regime") {
    val df = keyedFrame(3000L).repartition(9)
    val sorted = df.select("key").as[Double].collect().sorted.reverse
    // small-total collect path, band path, and deep-rank band path
    for (k <- Seq(1L, 7L, 500L, 1500L, 2999L, 3000L))
      assert(OrderStat.kthLargestKey(df, "key", k, cutover = 64)
        === sorted(k.toInt - 1), s"k=$k")
  }

  test("value query needs no tie refusal: collapsed keys return the value") {
    val df = (0L until 5000L)
      .map(i => (i, if (i < 100) 2.0 else 1.0)).toDF("id", "key")
    // rank 300 sits inside 4900 tied keys — far beyond the cutover, but
    // the answer IS the tie value, so no refusal, no driver funnel
    assert(OrderStat.kthLargestKey(df, "key", 300L, cutover = 16,
      relErr = 0.01) === 1.0)
    assert(OrderStat.kthLargestKey(df, "key", 50L, cutover = 16,
      relErr = 0.01) === 2.0)
  }

  test("exactQuantileDisc implements the ceil(q*n) lower-discrete rank") {
    val df = (1L to 10L).map(i => (i, i.toDouble)).toDF("id", "key")
    // pinned against DuckDB quantile_disc on 1..10:
    // q=0.25→3, 0.5→5, 0.75→8, 0.9→9, 0.0→1, 1.0→10, 0.15→2
    val cases = Seq(0.25 -> 3.0, 0.5 -> 5.0, 0.75 -> 8.0, 0.9 -> 9.0,
      0.0 -> 1.0, 1.0 -> 10.0, 0.15 -> 2.0)
    for ((q, want) <- cases)
      assert(OrderStat.exactQuantileDisc(df, "key", q) === want, s"q=$q")
    // distributed path agrees with the collect path on real-ish data
    val big = keyedFrame(4000L)
    for (q <- Seq(0.1, 0.5, 0.99))
      assert(OrderStat.exactQuantileDisc(big, "key", q, cutover = 32)
        === OrderStat.exactQuantileDisc(big, "key", q), s"q=$q")
    // NaN keys are rankless: excluded like nulls, never shifting ranks
    val withNan = df.withColumn("key",
      when(col("id") <= 3L, lit(Double.NaN)).otherwise(col("key")))
    assert(OrderStat.exactQuantileDisc(withNan, "key", 1.0) === 10.0)
    assert(OrderStat.kthLargestKey(withNan, "key", 7L) === 4.0)
  }

  test("small k routes through plain TakeOrdered") {
    val df = keyedFrame(1000L)
    val plan = OrderStat.topKByKeyDesc(df, "key", "id", k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject(limit=10"), plan)
  }
}
