package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.ops.Packing

/** The trainer handoff loop end to end: encodeDocs ids → packSequences
  * placements must describe EXACTLY the stream a loader would assemble —
  * every document's ids at its token_start, densely, in id order, with
  * fixed-length windows cutting across document boundaries.
  */
class BpePackSpec extends AnyFunSuite with SharedSpark {

  test("packed id stream is the dense concatenation of encodeDocs output") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
    val merges = Bpe.learnMerges(docs, "text", 30)
    val vocab = Bpe.subwordVocab(docs, "text", merges)
    val enc = Bpe.encodeDocs(docs, "doc_id", "text", merges, vocab)
    val seqLen = 128L
    val packed = Packing.packSequences(enc, "doc_id", "n_tokens", seqLen)

    // placement = exclusive running total of id counts in doc order:
    // the packed stream has no holes and no overlaps
    val expected = enc.select(col("doc_id"), col("n_tokens"))
      .withColumn("exp_start",
        coalesce(sum("n_tokens").over(
          Window.orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val misplaced = packed.join(expected, "doc_id")
      .filter(col("token_start") =!= col("exp_start")).count()
    assert(misplaced === 0L)

    // reconstruct training sequence 0 the way a loader does — slice each
    // overlapping document's ids — and compare against the head of the
    // global concatenation
    val seq0docs = packed.filter(col("seq_start") === 0L)
      .join(enc, "doc_id")
      .orderBy("doc_id")
      .select("doc_id", "seq_offset", "token_count", "token_ids")
      .collect()
    val assembled = seq0docs.flatMap { r =>
      val ids = r.getSeq[Int](3)
      ids.take((seqLen - (r.getLong(1) + 0L)).toInt min ids.length)
    }
    val global = enc.orderBy("doc_id")
      .select("token_ids").collect().flatMap(_.getSeq[Int](0))
    assert(assembled.toSeq === global.take(assembled.length).toSeq)
    assert(assembled.length.toLong === math.min(seqLen, global.length.toLong))
  }
}
