package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class GlobalOrderSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("rankByHexKey equals the single-window global rank") {
    import org.apache.spark.sql.expressions.Window
    val df = (0L until 5000L).toDF("id")
    val key = md5(concat(lit("s"), col("id").cast("string")))
    val got = GlobalOrder.rankByHexKey(df, key, Seq(col("id")), "pos")
    val want = df.withColumn("pos",
      row_number().over(Window.orderBy(key, col("id"))) - 1)
    assert(got.select("id", "pos").exceptAll(want.select("id", "pos")).isEmpty)
  }

  test("rankByHexKey yields a 0..n-1 permutation and never one partition") {
    val df = (0L until 2000L).toDF("id")
    val ranked = GlobalOrder.rankByHexKey(df,
      md5(col("id").cast("string")), Seq(col("id")), "pos")
    val stats = ranked.agg(min("pos"), max("pos"),
      countDistinct("pos"), count(lit(1))).head()
    assert(stats.getLong(0) == 0L && stats.getLong(1) == 1999L)
    assert(stats.getLong(2) == 2000L && stats.getLong(3) == 2000L)
    // the plan must window by bucket, not by a global (empty) partition
    val plan = ranked.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("_go_bucket"))
  }

  test("rankByHexKey scale smoke: 2M rows rank without a global window") {
    val df = spark.range(2000000L).toDF("id")
    val ranked = GlobalOrder.rankByHexKey(df,
      md5(col("id").cast("string")), Seq(col("id")), "pos")
    val stats = ranked.agg(min("pos"), max("pos"), count(lit(1))).head()
    assert(stats.getLong(0) == 0L && stats.getLong(1) == 1999999L)
    assert(stats.getLong(2) == 2000000L)
    // positions are dense: sum of 0..n-1 pins the permutation without a
    // 2M-row countDistinct
    val s = ranked.agg(sum("pos")).head().getLong(0)
    assert(s == 1999999L * 2000000L / 2)
  }

  test("denseIds equals the global-window row_number without the funnel") {
    import org.apache.spark.sql.expressions.Window
    // deliberately unsorted, skewed-ish input over several partitions
    val df = (0L until 5000L).map(i => (s"path-${(i * 7919) % 5000}%05d", i))
      .toDF("path", "payload").repartition(11)
    val got = GlobalOrder.denseIds(df, Seq(col("path")), "id", base = 100L)
    val want = df.withColumn("id",
      row_number().over(Window.orderBy(col("path"))).cast("long") + 100L)
    assert(got.select("path", "payload", "id")
      .exceptAll(want.select("path", "payload", "id")).isEmpty)
    // partition-count independence: a pinned 7-way layout assigns the SAME
    // ids as the shuffle.partitions-sized default (boundaries move, the
    // total order cannot), and the pinned layout demonstrably spreads work
    val pinned = GlobalOrder.denseIds(df, Seq(col("path")), "id",
      base = 100L, numPartitions = Some(7))
    assert(got.select("path", "id").exceptAll(pinned.select("path", "id")).isEmpty)
    // the ranking spreads across bucket partitions — visible once AQE's
    // (correct) small-output coalescing is held off
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    spark.conf.set(coalesceKey, "false")
    try {
      val spread = GlobalOrder.denseIds(df, Seq(col("path")), "id",
        base = 100L, numPartitions = Some(7))
      val parts = spread.rdd.mapPartitions(it => Iterator.single(it.size))
        .collect().count(_ > 0)
      assert(parts > 1, s"denseIds collapsed to $parts non-empty partition(s)")
    } finally spark.conf.set(coalesceKey, "true")
  }

  test("denseIds small-frame fast path equals the global row_number") {
    import org.apache.spark.sql.expressions.Window
    // under the sample cap (1024): the short sample proves frame size, the
    // counts job is skipped, and the single bounded window must assign the
    // same ids as the bucketed big path / global window — incl. base offset
    val df = (0L until 500L).map(i => (s"p-${(i * 733) % 500}%04d", i))
      .toDF("path", "payload").repartition(5)
    val got = GlobalOrder.denseIds(df, Seq(col("path")), "id", base = 7L)
    val want = df.withColumn("id",
      row_number().over(Window.orderBy(col("path"))).cast("long") + 7L)
    assert(got.select("path", "payload", "id")
      .exceptAll(want.select("path", "payload", "id")).isEmpty)
    // deterministic across evaluations, like the big path
    val first = got.select("path", "id").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val second = got.select("path", "id").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(first == second)
  }

  test("denseIds keeps the bucketed path for small frames with binary columns") {
    // the fast path's row bound is not a byte bound: a blob batch must
    // not funnel through one window task, so binary-schema frames stay on
    // the bucketed path (visible as the literal bases map in the plan)
    val blobby = (0L until 50L).map(i => (s"k$i%03d", Array.fill(4)(i.toByte)))
      .toDF("path", "blob")
    val stamped = GlobalOrder.denseIds(blobby, Seq(col("path")), "id")
    assert(stamped.queryExecution.optimizedPlan.toString.contains("element_at"),
      "binary frame should use the bucketed bases-map path")
    assert(stamped.select("id").as[Long].collect().sorted.toSeq ==
      (1L to 50L).toSeq)
  }

  test("denseIds stamping is deterministic across re-evaluations") {
    // the rand(42) boundary sample is COLLECTED once, so its
    // nondeterminism can never reach bucket assignment (the documented
    // precondition): the same stamped frame, evaluated twice — including
    // a fresh execution after cache eviction — must assign identical ids
    val df = (0L until 3000L).map(i => (s"k-${(i * 6007) % 3000}%05d", i))
      .toDF("path", "payload").repartition(9)
    val stamped = GlobalOrder.denseIds(df, Seq(col("path")), "id")
    val first = stamped.select("path", "id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val second = stamped.select("path", "id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(first == second, "re-evaluating the stamped frame moved ids")
    assert(first.values.toSeq.sorted == (1L to 3000L),
      "ids must be the dense 1..n range")
  }

  test("denseIds plan: Tungsten end-to-end, bucketed window, literal bases") {
    val df = (0L until 5000L).map(i => (f"p$i%05d", i))
      .toDF("path", "payload").repartition(7)
    val ids = GlobalOrder.denseIds(df, Seq(col("path")), "id")
    ids.collect() // finalize the adaptive plan before pinning its shape
    val p = ids.queryExecution.executedPlan.toString
    val fin = p.split("== Initial Plan ==")(0)
    // the r6 nit this closes: no rdd.zipWithIndex round-trip — rows stay
    // in Tungsten format through the whole assignment
    assert(!p.contains("ExistingRDD"), s"RDD round-trip crept back:\n$p")
    // the ranking window partitions by the literal-boundary bucket — a
    // global (empty-partition) window over the corpus must never appear
    assert(fin.contains("windowspecdefinition(_go_bucket"), fin)
    // per-bucket bases are a LITERAL map lookup in the stamping Project
    // (rankByHexKey's bases scheme) — no join of any kind, and no range
    // sampling anywhere (the boundary literals replaced it: a sampled
    // range exchange can lay out the counts branch and the stamping
    // branch differently)
    assert(fin.contains("element_at(map("), fin)
    assert(!fin.contains("Join") && !fin.contains("CartesianProduct"), fin)
    assert(!fin.contains("rangepartitioning"), fin)
    // exactly one corpus exchange in the stamping query (hash by bucket
    // for the window); the literal bases add none
    assert("Exchange hashpartitioning".r.findAllIn(fin).length == 1, fin)
  }

  test("denseIds scale smoke: 2M rows stamp densely across many partitions") {
    val df = spark.range(2000000L).toDF("k")
    val ids = GlobalOrder.denseIds(df, Seq(col("k")), "id", base = 0L)
    val stats = ids.agg(min("id"), max("id"), count(lit(1)), sum("id")).head()
    assert(stats.getLong(0) == 1L && stats.getLong(1) == 2000000L)
    assert(stats.getLong(2) == 2000000L)
    assert(stats.getLong(3) == 2000000L * 2000001L / 2)
    // order parity on a sample: id == k + 1 everywhere
    assert(ids.filter(col("id") =!= col("k") + 1L).limit(1).isEmpty)
  }

  test("rankByHexKeyWithin equals the per-group single-window rank") {
    import org.apache.spark.sql.expressions.Window
    val df = (0L until 3000L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val key = md5(concat(lit("s"), col("id").cast("string")))
    val got = GlobalOrder.rankByHexKeyWithin(df, Seq("grp"), key,
      Seq(col("id")), "pos")
    val want = df.withColumn("pos",
      row_number().over(Window.partitionBy("grp").orderBy(key, col("id"))) - 1)
    assert(got.select("id", "grp", "pos")
      .exceptAll(want.select("id", "grp", "pos")).isEmpty)
    // each group is a dense 0..n-1 permutation
    val perGroup = got.groupBy("grp").agg(min("pos"), max("pos"),
      count(lit(1))).collect()
    perGroup.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == r.getLong(3) - 1)
    }
  }

  test("rankByHexKeyWithin windows by (group, bucket), not by group alone") {
    val df = (0L until 2000L).map(i => (i, "only")).toDF("id", "grp")
    val ranked = GlobalOrder.rankByHexKeyWithin(df, Seq("grp"),
      md5(col("id").cast("string")), Seq(col("id")), "pos")
    val plan = ranked.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("_go_bucket"))
  }

  test("rankByHexKeyWithin shuffled-join cutover ranks identically") {
    val df = (0L until 1000L).map(i => (i, s"g${i % 4}")).toDF("id", "grp")
    val key = md5(col("id").cast("string"))
    val bcast = GlobalOrder.rankByHexKeyWithin(df, Seq("grp"), key,
      Seq(col("id")), "pos")
    // broadcastMaxBaseRows = 0 forces the shuffled bases join
    val shuffled = GlobalOrder.rankByHexKeyWithin(df, Seq("grp"), key,
      Seq(col("id")), "pos", None, broadcastMaxBaseRows = 0L)
    assert(bcast.exceptAll(shuffled).isEmpty &&
      shuffled.exceptAll(bcast).isEmpty)
  }

  test("rankByHexKeyWithin rejects null groups and non-hex keys clearly") {
    val nullGrp = Seq((1L, "a"), (2L, null)).toDF("id", "grp")
    val e1 = intercept[IllegalArgumentException] {
      GlobalOrder.rankByHexKeyWithin(nullGrp, Seq("grp"),
        md5(col("id").cast("string")), Seq(col("id")), "pos").count()
    }
    assert(e1.getMessage.contains("null group"))
    val badKey = Seq((1L, "a")).toDF("id", "grp")
    val e2 = intercept[IllegalArgumentException] {
      GlobalOrder.rankByHexKeyWithin(badKey, Seq("grp"),
        lit("ZZ"), Seq(col("id")), "pos").count()
    }
    assert(e2.getMessage.contains("hex"))
  }

  test("rankByHexKey fails clearly on null keys; temp names never clobber") {
    val df = Seq((1L, "aa"), (2L, null)).toDF("id", "_go_key")
    val e = intercept[IllegalArgumentException] {
      GlobalOrder.rankByHexKey(df, col("_go_key"), Seq(col("id")), "pos")
    }
    assert(e.getMessage.contains("null or non-lowercase-hex"))
    // a caller column named like the temp survives the ranking untouched
    val ok = Seq((1L, "aa"), (2L, "bb")).toDF("id", "_go_key")
    val ranked = GlobalOrder.rankByHexKey(ok, col("_go_key"),
      Seq(col("id")), "pos")
    assert(ranked.columns.toSeq == Seq("id", "_go_key", "pos"))
    assert(ranked.orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("aa", "bb"))
  }

  test("deterministicShuffle: same salt same order, new salt new order") {
    import graft.ext.Mixing
    val df = (0L until 300L).toDF("doc_id")
    val a = Mixing.deterministicShuffle(df, "doc_id", "e1")
      .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    val b = Mixing.deterministicShuffle(df, "doc_id", "e1")
      .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    val c = Mixing.deterministicShuffle(df, "doc_id", "e2")
      .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    assert(a == b)
    assert(a != c)
    assert(a.sorted == (0L until 300L))
  }

  test("prefixSums equals the single-window running total on the bucketed path (r14)") {
    import org.apache.spark.sql.expressions.Window
    // > sampleN rows (32 shuffle partitions → 2048-row sample cap)
    // forces the bucketed path; unsorted skewed-ish keys and values
    val df = (0L until 5000L).map(i => ((i * 7919) % 5000, (i % 97) + 1))
      .toDF("k", "v").repartition(13)
    val got = GlobalOrder.prefixSums(df, Seq(col("k")), col("v"), "pre")
    val want = df.withColumn("pre",
      coalesce(sum("v").over(Window.orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    assert(got.select("k", "v", "pre").exceptAll(want.select("k", "v", "pre")).isEmpty)
    // the plan windows by bucket, never the one-task global window
    val plan = got.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("_go_bucket"), plan)
  }

  test("prefixSums matches a driver-side scan on seeded random frames (r14)") {
    for (seed <- Seq(7L, 41L, 1913L)) {
      val rnd = new scala.util.Random(seed)
      val n = 3000 + rnd.nextInt(2000) // > sample cap → bucketed path
      val rows = Seq.tabulate(n) { i =>
        // unique keys in shuffled order; sizes include ZEROS (a zero-
        // cost row must not perturb its neighbours' prefixes)
        (s"k${i}x${rnd.nextInt(1 << 20)}", rnd.nextInt(4) match {
          case 0 => 0L
          case _ => rnd.nextInt(100000).toLong
        })
      }
      val df = rows.toDF("k", "v").repartition(7)
      val got = GlobalOrder.prefixSums(df, Seq(col("k")), col("v"), "pre")
        .select("k", "pre").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val expect = rows.sortBy(_._1)
        .scanLeft(("", 0L, 0L)) { case ((_, acc, _), (k, v)) => (k, acc + v, v) }
        .tail.map { case (k, cum, v) => k -> (cum - v) }.toMap
      assert(got == expect, s"seed $seed: prefix sums diverge from the scan")
    }
  }

  test("prefixSums small-frame fast path matches and null values refuse loudly (r14)") {
    import org.apache.spark.sql.expressions.Window
    val df = (0L until 100L).map(i => ((i * 37) % 100, i + 1)).toDF("k", "v")
    val got = GlobalOrder.prefixSums(df, Seq(col("k")), col("v"), "pre")
    val want = df.withColumn("pre",
      coalesce(sum("v").over(Window.orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    assert(got.select("k", "v", "pre").exceptAll(want.select("k", "v", "pre")).isEmpty)
    // a null value would silently vanish from every later prefix — the
    // fast path refuses it up front
    val withNull = df.withColumn("v",
      when(col("k") === 50L, lit(null)).otherwise(col("v")))
    val e = intercept[IllegalArgumentException] {
      GlobalOrder.prefixSums(withNull, Seq(col("k")), col("v"), "pre").collect()
    }
    assert(e.getMessage.contains("null"))
    // and the bucketed path catches it inside its tiny aggregate
    val big = (0L until 5000L).map(i => (i, i + 1)).toDF("k", "v")
      .withColumn("v", when(col("k") === 4999L, lit(null)).otherwise(col("v")))
    val e2 = intercept[IllegalArgumentException] {
      GlobalOrder.prefixSums(big, Seq(col("k")), col("v"), "pre").collect()
    }
    assert(e2.getMessage.contains("null"))
  }
}
