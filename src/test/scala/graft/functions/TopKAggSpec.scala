package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class TopKAggSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("exact when distinct items fit the capacity, across partitions") {
    val items = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c") ++
      Seq.fill(5)("d")).map(Tuple1(_))
    val df = items.toDF("tok").repartition(7) // force partial + merge
    val got = df.agg(TopKAgg.topK(col("tok"), capacity = 8, k = 3).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e._1"), col("e._2")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toList
    assert(got == List(("a", 50L), ("b", 30L), ("c", 20L)))
  }

  test("under tight capacity the heavy hitter survives with bounded undercount") {
    // n=1000, one item at 40%, noise spread over 100 distinct items
    val rnd = new scala.util.Random(11)
    val items = (Seq.fill(400)("heavy") ++
      (0 until 600).map(i => s"noise${rnd.nextInt(100)}")).map(Tuple1(_))
    val df = items.toDF("tok").repartition(5)
    val got = df.agg(TopKAgg.topK(col("tok"), capacity = 20, k = 1).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e._1"), col("e._2")).head()
    assert(got.getString(0) == "heavy")
    // MG bound: undercount <= n/(capacity+1) per merge level; allow the
    // mergeable-summaries compounded bound of 2x that here
    assert(got.getLong(1) <= 400L)
    assert(got.getLong(1) >= 400L - 2 * 1000 / 21, s"count ${got.getLong(1)}")
  }
}
