package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

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
}
