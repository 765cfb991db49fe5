package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Benchmark decontamination: flag training documents that share
  * n-gram content with an evaluation/benchmark set, the standard hygiene
  * pass before pretraining (e.g. GPT-3 appendix C; Dodge et al., "
  * Documenting Large Webtext Corpora", 2021). No counterpart in the
  * reference — north-star addition.
  *
  * Scale design: the benchmark side is TINY relative to a 100 TB corpus
  * (eval sets are megabytes), so its distinct n-gram set is broadcast and
  * the corpus-side probe is a map-side hash join — the corpus is never
  * shuffled on n-gram. The only shuffle is the per-document hit count
  * (partial aggregation applies). Corpus n-grams are exploded lazily, so
  * nothing document-sized ever travels: the join carries (doc_id, ngram)
  * slivers only.
  */
object Decontaminate {

  /** Documents from `corpus` sharing at least `minOverlap` distinct
    * n-grams with `benchmark`: (doc_id, n_hits) for flagged docs.
    */
  def ngramOverlap(corpus: DataFrame, benchmark: DataFrame,
                   idCol: String, textCol: String,
                   n: Int = 8, minOverlap: Int = 1): DataFrame = {
    require(n > 0 && minOverlap > 0, s"need n > 0, minOverlap > 0")
    val spark = corpus.sparkSession
    import spark.implicits._
    // scalar shingling + 64-bit n-gram hashes: one pass per document
    // (higher-order expressions are interpreted), and the broadcast side
    // ships 8-byte hashes instead of n-word strings
    val corpusGrams = corpus
      .select(col(idCol).cast("long"), col(textCol))
      // engine null convention: null id/text rows skip, not NPE
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        Dedup.shingleSet(text, n).iterator.map(s => (id, Dedup.hash64(s)))
      }
      .toDF("doc_id", "ngram")
    val benchGrams = benchmark
      .select(col(textCol)).filter(col(textCol).isNotNull).as[String]
      .flatMap(t => Dedup.shingleSet(t, n).iterator.map(Dedup.hash64(_)))
      .toDF("ngram")
      .distinct()
    // (doc_id, ngram) is already distinct per document — Dedup.shingles
    // dedups within the array — so the hit count needs no extra distinct
    // (and no extra shuffle)
    corpusGrams
      .join(broadcast(benchGrams), "ngram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minOverlap)
  }
}
