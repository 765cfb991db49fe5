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
}
