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

  test("subwordVocab ids are deterministic and encodeDocs produces exact ids") {
    // corpus: "ab ab c" ×2 and "ab c c" — merge (a,b) learned first
    val docs = Seq((1L, "ab ab c"), (2L, "ab ab c"), (3L, "ab c c"))
      .toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "text", 1)
    assert(merges == Seq(("a", "b")))
    // marked subwords: every word is a single subword here → all
    // word-final: "ab</w>" ×6, "c</w>" ×4 → ids by (count desc, lex)
    val vocab = Bpe.subwordVocab(docs, "text", merges)
    assert(vocab == Seq("ab</w>", "c</w>"))
    val enc = Bpe.encodeDocs(docs, "doc_id", "text", merges, vocab)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList, r.getLong(2)))
    assert(enc.toList == List(
      (1L, List(0, 0, 1), 3L), (2L, List(0, 0, 1), 3L), (3L, List(0, 1, 1), 3L)))
  }

  test("encode/decode roundtrip is lossless; n_tokens matches subwordCounts") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
    val merges = Bpe.learnMerges(docs, "text", 30)
    val vocab = Bpe.subwordVocab(docs, "text", merges)
    val enc = Bpe.encodeDocs(docs, "doc_id", "text", merges, vocab)
    // decoded text equals the single-space-normalized source, every doc
    val decoded = Bpe.decodeDocs(enc, "doc_id", "token_ids", vocab)
    val src = docs.select(col("doc_id"),
      array_join(filter(split(col("text"), " ", -1),
        w => length(w) > 0), " ").as("text"))
    assert(decoded.join(src, "doc_id")
      .filter(decoded("text") =!= src("text")).isEmpty)
    // the id-sequence length IS the subword count (marker changes
    // nothing about cardinality)
    val counts = Bpe.subwordCounts(docs, "doc_id", "text", merges)
    assert(enc.select(col("doc_id"), col("n_tokens"))
      .join(counts, "doc_id")
      .filter(col("n_tokens") =!= col("n_subwords")).isEmpty)
  }

  test("an out-of-vocabulary subword fails loudly unless unkId is given") {
    val train = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(train, "text", 1)
    val vocab = Bpe.subwordVocab(train, "text", merges)
    val fresh = Seq((2L, "zq")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Bpe.encodeDocs(fresh, "doc_id", "text", merges, vocab).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: messages(x.getCause))
    assert(messages(e).exists(_.contains("not in the vocabulary")))
    // with an unknown id, the stream survives and marks the gap
    val unk = vocab.size
    val got = Bpe.encodeDocs(fresh, "doc_id", "text", merges, vocab,
      unkId = Some(unk)).collect()
    assert(got.head.getSeq[Int](1).forall(_ == unk))
  }

  test("charset-seeded vocab gives lossless char fallback on unseen words") {
    val train = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(train, "text", 2)
    val ascii = (33 to 126).map(_.toChar).mkString
    val seeded = Bpe.subwordVocab(train, "text", merges, seedChars = ascii)
    // seeding appends, never perturbs the corpus-derived id table
    val unseeded = Bpe.subwordVocab(train, "text", merges)
    assert(seeded.take(unseeded.size) == unseeded)
    assert(seeded.contains("z") && seeded.contains("z" + Bpe.EndOfWord))
    // words (and even merged-pair fragments) absent from training encode
    // via single-codepoint fallback and decode back exactly
    val fresh = Seq((2L, "zq abX cdcd x!y")).toDF("doc_id", "text")
    val enc = Bpe.encodeDocs(fresh, "doc_id", "text", merges, seeded)
    val dec = Bpe.decodeDocs(enc, "doc_id", "token_ids", seeded).collect()
    assert(dec.head.getString(1) == "zq abX cdcd x!y")
    // a codepoint OUTSIDE the seeded charset still refuses loudly
    val alien = Seq((3L, "café")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Bpe.encodeDocs(alien, "doc_id", "text", merges, seeded).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: messages(x.getCause))
    assert(messages(e).exists(_.contains("single-character fallback")))
  }

  test("a word containing the end-of-word marker refuses loudly") {
    val train = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(train, "text", 1)
    val vocab = Bpe.subwordVocab(train, "text", merges)
    val bad = Seq((2L, "foo</w>bar ok")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Bpe.encodeDocs(bad, "doc_id", "text", merges, vocab,
        unkId = Some(0)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: messages(x.getCause))
    assert(messages(e).exists(_.contains("end-of-word marker")))
  }
}
