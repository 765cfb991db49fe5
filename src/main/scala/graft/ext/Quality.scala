package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Repetition-based quality signals in the style of the Gopher /
  * MassiveText filtering rules (Rae et al., "Scaling Language Models:
  * Methods, Analysis & Insights from Training Gopher", 2021, §A1.1):
  * heavily repetitious documents are low-quality training data, and the
  * cheap detectors are the fraction of duplicated tokens and the mass of
  * the single most frequent n-gram.
  *
  * Scale design: every signal is computed in ONE scalar pass per document
  * inside mapPartitions — zero shuffle, embarrassingly parallel, no
  * quadratic expression trees (a `transform(distinct, b ->
  * size(filter(...)))` formulation would be O(n²) per document and
  * interpreted, per the round-1 higher-order-expression lesson). This is
  * the map-side profile a 100 TB quality sweep needs: the only data
  * movement is the final result write.
  */
object Quality {

  private def round9(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue

  /** Per-document repetition stats: token count, fraction of tokens that
    * are repeats of an earlier token, and the fraction of bigram mass held
    * by the most frequent bigram (0.0 when the document has no bigram).
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val toks = text.split(" ", -1)
        val n = toks.length
        val distinct = new scala.collection.mutable.HashSet[String]
        toks.foreach(distinct += _)
        val dupFrac = 1.0 - distinct.size.toDouble / n
        var topFrac = 0.0
        if (n >= 2) {
          val counts = new scala.collection.mutable.HashMap[String, Int]
          var i = 0
          var max = 0
          while (i < n - 1) {
            val c = counts.updateWith(toks(i) + " " + toks(i + 1))(
              o => Some(o.getOrElse(0) + 1)).get
            if (c > max) max = c
            i += 1
          }
          topFrac = max.toDouble / (n - 1)
        }
        (id, n.toLong, round9(dupFrac), round9(topFrac))
      })
      .toDF("doc_id", "n_tokens", "dup_token_frac", "top_bigram_frac")
  }

  /** Unsigned UTF-8 byte order — the collation both Spark's UTF8String
    * and SQL engines' binary collation sort strings by. Java's
    * String.compareTo orders by UTF-16 code UNIT, which disagrees for
    * supplementary-plane characters, so entropy folds ordered with it
    * would sum in a different order than a SQL oracle.
    */
  private def compareUtf8(x: Array[Byte], y: Array[Byte]): Int = {
    var i = 0
    var cmp = 0
    val n = math.min(x.length, y.length)
    while (cmp == 0 && i < n) {
      cmp = (x(i) & 0xff) - (y(i) & 0xff)
      i += 1
    }
    if (cmp != 0) cmp else x.length - y.length
  }

  /** Per-document unigram (token) entropy in nats — the information-
    * density quality signal (token soup and boilerplate sit at the two
    * extremes). One scalar pass, zero shuffle; the per-term contributions
    * -p·ln(p) accumulate in UTF-8-byte token order, so the double sum is
    * reproducible by any engine folding `ORDER BY token` under binary
    * collation.
    *
    * @return (doc_id, n_tokens, n_distinct, entropy) — entropy rounded
    *         to 6 dp (ln differs by 1 ulp across engines)
    */
  def unigramEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val toks = text.split(" ", -1)
        val n = toks.length
        val counts = new scala.collection.mutable.HashMap[String, Long]
        toks.foreach(t => counts.updateWith(t)(o => Some(o.getOrElse(0L) + 1L)))
        // tokens encode to UTF-8 ONCE before the sort — an Ordering over
        // strings would re-encode both sides on every comparison of the
        // O(k log k) sort, dominating per-row CPU on token-rich docs
        val ordered = counts.toArray
          .map { case (t, c) =>
            (t.getBytes(java.nio.charset.StandardCharsets.UTF_8), c)
          }
          .sortWith((a, b) => compareUtf8(a._1, b._1) < 0)
        var h = 0.0
        ordered.foreach { case (_, c) =>
          val p = c.toDouble / n
          h += -(p * math.log(p))
        }
        (id, n.toLong, counts.size.toLong,
          java.math.BigDecimal.valueOf(h)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)
      })
      .toDF("doc_id", "n_tokens", "n_distinct", "entropy")
  }

  /** Gopher-rule thresholds (Rae et al. 2021 §A1.1 shape, bounds
    * configurable): token count window, mean-word-length window, maximum
    * symbol-token fraction, minimum count of distinct stopwords present,
    * maximum duplicate-token fraction.
    */
  final case class GopherRules(
      minTokens: Long = 50, maxTokens: Long = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolFrac: Double = 0.1, minStopwords: Int = 2,
      maxDupFrac: Double = 0.55,
      stopwords: Set[String] = Set("the", "a", "and", "of", "to", "in",
        "is", "be", "that", "with"))

  /** Gopher-style document filter: every rule signal plus the combined
    * keep verdict, one scalar pass per document (zero shuffle — the
    * map-side sweep shape). Fractions are rounded to 9 dp BEFORE the
    * threshold comparison, so boundary membership is deterministic and
    * re-derivable by an external engine (the curate_pipeline convention).
    * Symbol detection is ASCII-alphanumeric (matches `[^A-Za-z0-9]`), and
    * mean word length counts separator-free characters per token:
    * (chars - (n-1)) / n.
    *
    * @return (doc_id, n_tokens, mean_wl, symbol_frac, n_stop, dup_frac, keep)
    */
  def gopherFilter(df: DataFrame, idCol: String, textCol: String,
                   rules: GopherRules = GopherRules()): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val r = rules
    df.select(col(idCol).cast("long"), col(textCol))
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val toks = text.split(" ", -1)
        val n = toks.length
        val distinct = new scala.collection.mutable.HashSet[String]
        toks.foreach(distinct += _)
        var symbolToks = 0
        toks.foreach { t =>
          if (t.exists(c => !(c >= 'A' && c <= 'Z') &&
            !(c >= 'a' && c <= 'z') && !(c >= '0' && c <= '9')))
            symbolToks += 1
        }
        val nStop = distinct.count(r.stopwords.contains)
        // code points, not UTF-16 units: SQL length() counts code points,
        // so astral characters must count once for cross-engine parity
        val chars = text.codePointCount(0, text.length)
        val meanWl = round9((chars - (n - 1)).toDouble / n)
        val symbolFrac = round9(symbolToks.toDouble / n)
        val dupFrac = round9(1.0 - distinct.size.toDouble / n)
        val keep = n >= r.minTokens && n <= r.maxTokens &&
          meanWl >= r.minMeanWordLen && meanWl <= r.maxMeanWordLen &&
          symbolFrac <= r.maxSymbolFrac && nStop >= r.minStopwords &&
          dupFrac <= r.maxDupFrac
        (id, n.toLong, meanWl, symbolFrac, nStop.toLong, dupFrac, keep)
      })
      .toDF("doc_id", "n_tokens", "mean_wl", "symbol_frac", "n_stop",
        "dup_frac", "keep")
  }

  /** Per-document n-gram NOVELTY: the fraction of a document's distinct
    * n-gram shingles that appear in no other document — the inverse of
    * boilerplate mass (WIMBD-style corpus analysis; templated/near-dup
    * documents score near 0, original text near 1). Complements the
    * pair-finding dedups with a per-document signal that needs no
    * threshold.
    *
    * Scale shape: one scalar shingling pass per document, then TWO
    * shingle-keyed aggregations (document frequency, then the per-doc
    * rollup) — shuffle volume is O(distinct postings), identical to the
    * dedup index family; the 60-bit md5 shingle key keeps the shuffle
    * payload fixed-width. Documents with fewer than n tokens have no
    * shingle and are absent.
    *
    * @return (doc_id, n_shingles, n_novel, novelty) — novelty 9 dp
    */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // materialized once: the df-frequency aggregate and the join probe
    // side both consume this, and the md5 shingling pass is the dominant
    // cost — without the checkpoint it runs twice over the corpus
    val posts = df.select(col(idCol).cast("long"), col(textCol))
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        Dedup.shingleSet(text, n).iterator.map(s => (id, Dedup.md5Hash60(s)))
      }
      .toDF("doc_id", "h")
      .localCheckpoint()
    val dfreq = posts.groupBy("h").agg(count(lit(1)).as("df"))
    posts.join(dfreq, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1L, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_shingles"), 9))
  }
}
