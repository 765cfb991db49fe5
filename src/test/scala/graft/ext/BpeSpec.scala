package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class BpeSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("learnMerges picks the most frequent pair, ties lexicographic") {
    // vocab: ab x3, abc x2 -> pair (a,b) count 5, (b,c) count 2
    val docs = Seq("ab ab abc", "ab abc").toDF("text")
    val merges = Bpe.learnMerges(docs, "text", numMerges = 2)
    assert(merges == Seq(("a", "b"), ("ab", "c")))
    // classic Sennrich shape: suffix pairs win on the real distribution
    val classic = Seq(
      ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val m2 = Bpe.learnFromVocab(classic.toArray.map {
      case (w, c) => (w, c) }, 2)
    // (e,s) appears 9x (newest+widest); then (es,t) 9x
    assert(m2 == Seq(("e", "s"), ("es", "t")))
  }

  test("merge loop stops when no pair repeats; ordering is deterministic") {
    val docs = Seq("xy").toDF("text") // every pair occurs once
    assert(Bpe.learnMerges(docs, "text", 10).isEmpty)
    // tie between (a,b) and (c,d) at count 2 -> lexicographically first
    val tie = Array(("ab", 2L), ("cd", 2L))
    assert(Bpe.learnFromVocab(tie, 1) == Seq(("a", "b")))
  }

  test("subwordCounts shrink monotonically as merges grow") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m0 = Bpe.learnMerges(docs, "text", 0)
    val m10 = Bpe.learnMerges(docs, "text", 10)
    val m30 = Bpe.learnMerges(docs, "text", 30)
    assert(m0.isEmpty && m10.size == 10 && m30.size == 30)
    // merge lists are prefixes of each other (deterministic learning)
    assert(m30.take(10) == m10)
    def total(ms: Seq[(String, String)]): Long =
      Bpe.subwordCounts(docs, "doc_id", "text", ms)
        .agg(sum("n_subwords")).head().getLong(0)
    val t0 = total(m0)
    val t10 = total(m10)
    val t30 = total(m30)
    assert(t0 >= t10 && t10 >= t30)
    assert(t30 < t0) // 30 merges on a tiny vocab must actually compress
    // with zero merges every subword is a single char: equals char count
    val chars = docs.filter(col("text").isNotNull)
      .agg(sum(length(regexp_replace(col("text"), " ", ""))))
      .head().getLong(0)
    assert(t0 == chars)
  }

  test("encodeWord applies merges in order, left to right") {
    val merges = Seq(("a", "b"), ("ab", "c"))
    assert(Bpe.encodeWord("abcab", merges) == Vector("abc", "ab"))
    assert(Bpe.encodeWord("ababab", Seq(("a", "b"))) ==
      Vector("ab", "ab", "ab"))
    assert(Bpe.encodeWord("x", merges) == Vector("x"))
  }
}
