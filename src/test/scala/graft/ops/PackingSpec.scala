package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class PackingSpec extends AnyFunSuite with SharedSpark {

  test("packing places documents contiguously and straddles boundaries") {
    import spark.implicits._
    // ids deliberately unsorted on input; 0-token doc; one doc (id=4)
    // straddles the 10-token boundary
    val docs = Seq((3L, 4L), (1L, 5L), (2L, 0L), (4L, 7L), (5L, 10L))
      .toDF("doc_id", "tok")
    val got = Packing.packSequences(docs, "doc_id", "tok", 10)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toList
    //                         id start seq off end
    assert(got == List(
      (1L, 0L, 0L, 0L, 0L),   // tokens [0,5)
      (2L, 5L, 0L, 5L, 0L),   // zero tokens at offset 5
      (3L, 5L, 0L, 5L, 0L),   // tokens [5,9)
      (4L, 9L, 0L, 9L, 1L),   // tokens [9,16) — straddles seq 0 -> 1
      (5L, 16L, 1L, 6L, 2L))) // tokens [16,26) — straddles seq 1 -> 2
  }

  test("two-pass prefix sum matches the single-partition window reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (0L until 500L).map(i => (i, rnd.nextInt(300).toLong))
      .toDF("doc_id", "tok").repartition(13) // scramble partitioning
    val got = Packing.packSequences(docs, "doc_id", "tok", 512)
      .select("doc_id", "token_start").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val ref = docs.withColumn("cum", sum(col("tok")).over(w) - col("tok"))
      .select("doc_id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
  }
}
