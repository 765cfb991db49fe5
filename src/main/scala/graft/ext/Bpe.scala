package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Byte-pair-encoding tokenizer TRAINING (Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016) —
  * the step that turns a curated corpus into a subword vocabulary, run
  * the way production BPE trainers actually run at scale:
  *
  *  1. ONE distributed aggregation reduces the corpus to its word-count
  *     table (model-sized: the vocabulary, not the corpus);
  *  2. the merge-learning loop runs on the DRIVER over that table —
  *     each iteration touches vocab-many short symbol sequences, so
  *     distributing it would shuffle more than it computes;
  *  3. encoding with the learned merges is a broadcast + scalar pass,
  *     embarrassingly parallel over the corpus.
  *
  * Determinism: merge selection breaks count ties lexicographically on
  * the (left, right) pair, so the learned merge list is a pure function
  * of the word-count table — reproducible across runs, partitionings,
  * and engines.
  */
object Bpe {

  /** Learn `numMerges` BPE merges from the corpus (character-level
    * within whitespace words). Stops early when no adjacent pair occurs
    * twice or more. @return merges in application order
    */
  def learnMerges(docs: DataFrame, textCol: String,
                  numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = docs.select(col(textCol))
      .filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ", -1)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect()
    learnFromVocab(vocab, numMerges)
  }

  /** The driver-side merge loop, exposed for testing: `vocab` is the
    * (word, count) table; symbols start as single characters.
    */
  private[ext] def learnFromVocab(vocab: Array[(String, Long)],
                                  numMerges: Int): Seq[(String, String)] = {
    var words: Array[(Vector[String], Long)] =
      vocab.map { case (w, c) => (symbolize(w), c) }
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      // a merge must pay for itself: pairs seen once stay unmerged
      val candidates = counts.filter(_._2 >= 2)
      if (candidates.isEmpty) done = true
      else {
        // deterministic: max count, ties to the lexicographically first pair
        val best = candidates.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        // only words containing the pair change — skip the rest (on a
        // Zipfian vocab most words lack any given pair, so this keeps
        // the loop near the size of the affected postings, the same
        // pruning reference BPE trainers apply)
        words = words.map { case (syms, c) =>
          var has = false
          var i = 0
          while (!has && i < syms.length - 1) {
            has = syms(i) == best._1 && syms(i + 1) == best._2
            i += 1
          }
          if (has) (applyMerge(syms, best), c) else (syms, c)
        }
        m += 1
      }
    }
    merges.result()
  }

  private def applyMerge(syms: Vector[String],
                         merge: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == merge._1 &&
          syms(i + 1) == merge._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Encode one word with the learned merges (applied in order, each
    * scanning left-to-right — the standard BPE application rule).
    */
  private[ext] def encodeWord(word: String,
                              merges: Seq[(String, String)]): Vector[String] = {
    var syms = symbolize(word)
    merges.foreach { m => syms = applyMerge(syms, m) }
    syms
  }

  /** Initial symbols = CODE POINTS, not UTF-16 chars: a per-char split
    * would break astral-plane characters (emoji, CJK extensions) into
    * unpaired surrogates, and the learner could merge a trailing
    * surrogate with the next character's leading one — vocabulary
    * entries that are invalid standalone strings.
    */
  private def symbolize(word: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Per-document subword count under the learned merges: the real
    * token-budget measure once a tokenizer exists (vs the whitespace /
    * regex approximations in TextAnalysis). Broadcast merges + one
    * scalar pass, zero shuffle.
    *
    * @return (idCol, n_words, n_subwords)
    */
  def subwordCounts(docs: DataFrame, idCol: String, textCol: String,
                    merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    docs.select(col(idCol).cast("long"), col(textCol))
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .as[(Long, String)]
      .mapPartitions { it =>
        val ms = bc.value
        // word repetition is Zipfian: memoize per partition so encode
        // work scales with the partition's DISTINCT words, not tokens
        // — bounded by MemoCap (clear-on-full, degrade to recompute)
        val cache = scala.collection.mutable.HashMap.empty[String, Long]
        it.map { case (id, text) =>
          val words = text.split(" ", -1).filter(_.nonEmpty)
          var subs = 0L
          words.foreach { w =>
            if (cache.size >= MemoCap) cache.clear()
            subs += cache.getOrElseUpdate(w, encodeWord(w, ms).length.toLong)
          }
          (id, words.length.toLong, subs)
        }
      }
      .toDF(idCol, "n_words", "n_subwords")
  }

  /** End-of-word marker appended (at ENCODE time) to a word's final
    * subword, so a flat token-id sequence stays losslessly decodable —
    * the Sennrich et al. `</w>` convention. Merges are learned and
    * applied on unmarked symbols; the marker only distinguishes
    * vocabulary entries ("e" mid-word vs "e</w>" word-final).
    */
  val EndOfWord = "</w>"

  /** The marked subwords of one word under the learned merges. Words
    * literally containing the marker refuse LOUDLY: a mid-word '</w>'
    * would produce a subword that collides with a marked word-final
    * vocabulary entry, and decode would insert a spurious word break —
    * a silent break of the documented lossless roundtrip.
    */
  private def markedSubwords(word: String,
                             merges: Seq[(String, String)]): Vector[String] = {
    require(!word.contains(EndOfWord),
      s"word '$word' contains the end-of-word marker '$EndOfWord' " +
        "literally — encoding it would corrupt the lossless roundtrip; " +
        "strip or escape the marker upstream")
    val syms = encodeWord(word, merges)
    syms.updated(syms.length - 1, syms(syms.length - 1) + EndOfWord)
  }

  /** Per-partition word-memo bound for the encode passes: Zipfian
    * corpora hit the head constantly, so a bounded cache keeps the
    * recompute rate negligible while a high-distinct-word corpus (URLs,
    * ids) degrades to recompute instead of growing executor memory
    * without bound.
    */
  private val MemoCap = 1 << 16

  /** Deterministic subword-id VOCABULARY under the learned merges: one
    * distributed pass reduces the corpus to its distinct-word counts
    * (the same model-sized frame the trainer aggregates), each distinct
    * word is encoded once, and ids are assigned by (count desc, token
    * lex) — a total order, so the id table is a pure function of the
    * corpus like the merge list itself. Driver-sized by the same
    * argument as [[learnMerges]]: it IS the tokenizer model.
    *
    * `seedChars` declares a coverage charset (production tokenizers'
    * byte/char fallback, e.g. printable ASCII): every codepoint in it is
    * guaranteed a vocabulary entry in BOTH forms (bare and word-final
    * marked), so [[encodeDocs]]'s single-character fallback can encode
    * ANY word over the charset — new corpora never throw and the
    * roundtrip stays lossless. Corpus-derived entries keep their
    * (count desc, lex) ids; seed-only symbols append after them in lex
    * order, so seeding never perturbs the corpus-derived id table.
    *
    * @return tokens in id order (id = index), marked word-final forms
    *         included as distinct entries
    */
  def subwordVocab(docs: DataFrame, textCol: String,
                   merges: Seq[(String, String)],
                   seedChars: String = ""): Seq[String] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    val corpus = docs.select(col(textCol))
      .filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ", -1)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val ms = bc.value
        it.flatMap { case (w, c) => markedSubwords(w, ms).map(s => (s, c)) }
      }
      .toDF("t", "c")
      .groupBy("t").agg(sum(col("c")).as("c"))
      .as[(String, Long)].collect()
      .sortBy { case (t, c) => (-c, t) }
      .map(_._1).toSeq
    val seen = corpus.toSet
    val seeds = symbolize(seedChars)
      .flatMap(c => Seq(c, c + EndOfWord))
      .distinct.filterNot(seen).sorted
    corpus ++ seeds
  }

  /** Encode every document into its flat token-id sequence — the
    * corpus-scale APPLICATION of the trained tokenizer (train →
    * [[subwordVocab]] → encode is the production loop; the ids are what
    * packing and shard export actually ship to a trainer). Broadcast
    * merges + id table, ONE zero-shuffle scalar pass, per-partition
    * word memoization (Zipfian corpora re-encode distinct words, not
    * tokens).
    *
    * A subword absent from the vocabulary (encoding a NEW corpus with an
    * old model) falls back to its SINGLE-CODEPOINT symbols (the marker
    * staying on the last one) — the char-level fallback production
    * tokenizers guarantee coverage with; when the vocabulary was seeded
    * via [[subwordVocab]]'s `seedChars`, encoding any word over the
    * charset succeeds and the roundtrip stays LOSSLESS. A codepoint
    * outside the seeded charset maps to `unkId` when given (lossy,
    * caller's explicit choice) and otherwise fails LOUDLY, naming the
    * subword — silently dropping tokens would corrupt the training
    * stream.
    *
    * @return (idCol, token_ids: Array[Int], n_tokens)
    */
  def encodeDocs(docs: DataFrame, idCol: String, textCol: String,
                 merges: Seq[(String, String)], vocab: Seq[String],
                 unkId: Option[Int] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bcM = spark.sparkContext.broadcast(merges)
    val bcV = spark.sparkContext.broadcast(
      vocab.zipWithIndex.toMap)
    docs.select(col(idCol).cast("long"), col(textCol))
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .as[(Long, String)]
      .mapPartitions { it =>
        val ms = bcM.value
        val ids = bcV.value
        def charId(sym: String, from: String): Int =
          ids.getOrElse(sym, unkId.getOrElse(throw new IllegalArgumentException(
            s"BPE symbol '$sym' (from word '$from') is not in the " +
              "vocabulary even after single-character fallback — seed " +
              "subwordVocab with a charset covering the corpus or pass " +
              "an unknown-token id")))
        def idsOf(s: String, w: String): Iterator[Int] = ids.get(s) match {
          case Some(i) => Iterator.single(i)
          case None =>
            // char fallback: decompose the unseen subword into single
            // codepoints, the word-final marker staying on the last
            val marked = s.endsWith(EndOfWord)
            val base = if (marked) s.dropRight(EndOfWord.length) else s
            val cps = symbolize(base)
            cps.iterator.zipWithIndex.map { case (c, i) =>
              charId(if (marked && i == cps.length - 1) c + EndOfWord else c, w)
            }
        }
        // bounded per-partition word memo (clear-on-full): encode work
        // scales with DISTINCT words on Zipfian corpora, degrades to
        // recompute instead of unbounded growth on high-cardinality ones
        val cache = scala.collection.mutable.HashMap.empty[String, Array[Int]]
        def encode(w: String): Array[Int] = {
          if (cache.size >= MemoCap) cache.clear()
          cache.getOrElseUpdate(w,
            markedSubwords(w, ms).iterator.flatMap(idsOf(_, w)).toArray)
        }
        it.map { case (id, text) =>
          val out = Array.newBuilder[Int]
          text.split(" ", -1).foreach(w => if (w.nonEmpty) out ++= encode(w))
          val arr = out.result()
          (id, arr, arr.length.toLong)
        }
      }
      .toDF(idCol, "token_ids", "n_tokens")
  }

  /** Decode token-id sequences back to text — the lossless inverse of
    * [[encodeDocs]] up to whitespace normalization (words joined by
    * single spaces; the split convention drops empty words). Broadcast
    * id table, one scalar pass.
    *
    * @return (idCol, text)
    */
  def decodeDocs(encoded: DataFrame, idCol: String, idsCol: String,
                 vocab: Seq[String]): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val bcV = spark.sparkContext.broadcast(vocab.toArray)
    encoded.select(col(idCol).cast("long"), col(idsCol))
      .as[(Long, Array[Int])]
      .mapPartitions { it =>
        val toks = bcV.value
        it.map { case (id, ids) =>
          val sb = new java.lang.StringBuilder
          var i = 0
          while (i < ids.length) {
            val t = toks(ids(i))
            if (t.endsWith(EndOfWord)) {
              sb.append(t, 0, t.length - EndOfWord.length)
              if (i < ids.length - 1) sb.append(' ')
            } else sb.append(t)
            i += 1
          }
          (id, sb.toString)
        }
      }
      .toDF(idCol, "text")
  }

  /** Learn the top-`vocabSize` token vocabulary (by corpus frequency,
    * ties to the lexicographically smallest token — a total, reproducible
    * order) in one aggregation. The result is driver-sized by
    * construction: use it with [[oovStats]] for tokenizer-coverage QA.
    */
  def learnVocab(docs: DataFrame, textCol: String,
                 vocabSize: Int): Seq[String] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(textCol))
      .filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ", -1)).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t"))
      .limit(vocabSize)
      .select("t").as[String].collect().toSeq
  }

  /** Per-document out-of-vocabulary stats against a fixed vocabulary —
    * the tokenizer/vocab coverage signal (a corpus whose OOV rate jumps
    * is drifting away from what the tokenizer was trained on). Broadcast
    * vocabulary set + ONE zero-shuffle scalar pass; nothing scales with
    * corpus size except the embarrassingly parallel scan.
    *
    * @return (doc_id, n_tokens, n_oov, oov_frac) — oov_frac 9 dp
    */
  def oovStats(docs: DataFrame, idCol: String, textCol: String,
               vocab: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab.toSet)
    docs.select(col(idCol).cast("long"), col(textCol))
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .as[(Long, String)]
      .mapPartitions { it =>
        val v = bc.value
        it.map { case (id, text) =>
          val toks = text.split(" ", -1)
          var oov = 0L
          toks.foreach(t => if (!v.contains(t)) oov += 1)
          (id, toks.length.toLong, oov,
            java.math.BigDecimal.valueOf(oov.toDouble / toks.length)
              .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue)
        }
      }
      .toDF("doc_id", "n_tokens", "n_oov", "oov_frac")
  }
}
