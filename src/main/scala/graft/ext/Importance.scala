package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Data selection via importance resampling in the style of DSIR
  * (Xie et al., "Data Selection for Language Models via Importance
  * Resampling", NeurIPS 2023): score every raw-pool document by the
  * log-likelihood ratio of a target-domain unigram model over a raw-pool
  * unigram model, both estimated on hashed token buckets, then keep the
  * highest-weight documents. The hashed-feature trick keeps the model a
  * fixed-size array regardless of corpus vocabulary, which is what makes
  * the method viable at web scale.
  *
  * Scale design: distribution learning is ONE aggregation whose output is
  * `nBuckets` rows (map-side partial aggregation collapses each task to at
  * most `nBuckets` rows before the shuffle), collected and turned into a
  * log-ratio array on the driver. Scoring is then a ZERO-shuffle scalar
  * pass per document with the model in a broadcast-sized closure — the
  * same broadcast-model cutover shape as [[LangModel]]. Nothing in the
  * scoring path grows with corpus size.
  *
  * Determinism: token buckets come from the engine-wide reproducible
  * 60-bit md5 hash ([[Dedup.md5Hash60Col]]), per-document contributions
  * fold in ascending bucket order, and the final weight is rounded to
  * 6 dp — so a SQL engine re-deriving the model from scratch reproduces
  * every weight bit-for-bit after the round.
  */
object Importance {

  /** Hashed-bucket log-likelihood-ratio model: `logRatio(b)` =
    * ln p_target(b) − ln p_raw(b), Laplace-smoothed over `nBuckets`.
    */
  final case class DsirModel(nBuckets: Int, salt: String,
                             logRatio: Array[Double]) {
    require(logRatio.length == nBuckets, "logRatio must have nBuckets entries")
  }

  /** Deterministic token bucket in [0, nBuckets): md5 of (salt ++ token). */
  def tokenBucket(token: Column, nBuckets: Int, salt: String): Column =
    pmod(Dedup.md5Hash60Col(concat(lit(salt), token)),
      lit(nBuckets.toLong))

  private def tokenBucketScalar(token: String, nBuckets: Int,
                                salt: String): Int =
    math.floorMod(Dedup.md5Hash60(salt + token), nBuckets.toLong).toInt

  /** Estimate the target/raw hashed unigram models in one corpus
    * aggregation and return the smoothed log-ratio model. `isTarget`
    * marks the target-domain rows (null → raw); every other row is the
    * raw pool. Buckets unseen on either side still get a smoothed
    * probability, so scoring never divides by zero.
    */
  def learnDsir(docs: DataFrame, textCol: String, isTarget: Column,
                nBuckets: Int = 256, salt: String = "dsir"): DsirModel = {
    require(nBuckets > 0, "nBuckets must be positive")
    val counts = docs
      .filter(col(textCol).isNotNull)
      .select(coalesce(isTarget, lit(false)).as("tgt"),
        explode(split(col(textCol), " ", -1)).as("t"))
      .groupBy(tokenBucket(col("t"), nBuckets, salt).as("b"))
      .agg(sum(when(col("tgt"), 1L).otherwise(0L)).as("tc"),
        sum(when(col("tgt"), 0L).otherwise(1L)).as("rc"))
      .collect()
    val tCnt = new Array[Long](nBuckets)
    val rCnt = new Array[Long](nBuckets)
    counts.foreach { r =>
      val b = r.getLong(0).toInt
      tCnt(b) = r.getLong(1)
      rCnt(b) = r.getLong(2)
    }
    val tTot = tCnt.sum
    val rTot = rCnt.sum
    // written exactly as the SQL oracle computes it — add-1 smoothing,
    // divide, then ln — so cross-engine differences stay within ln's 1 ulp
    val lr = Array.tabulate(nBuckets) { b =>
      math.log((tCnt(b) + 1.0) / (tTot + nBuckets).toDouble) -
        math.log((rCnt(b) + 1.0) / (rTot + nBuckets).toDouble)
    }
    DsirModel(nBuckets, salt, lr)
  }

  /** Per-document DSIR log importance weight over the RAW pool (rows where
    * `isTarget` does not hold): Σ_tokens logRatio(bucket(token)), folded in
    * ascending bucket order.
    *
    * @return (doc_id, n_tokens, log_weight) — log_weight rounded to 6 dp
    */
  def dsirLogWeights(docs: DataFrame, idCol: String, textCol: String,
                     isTarget: Column, nBuckets: Int = 256,
                     salt: String = "dsir"): DataFrame = {
    val model = learnDsir(docs, textCol, isTarget, nBuckets, salt)
    scoreLogWeights(
      docs.filter(!coalesce(isTarget, lit(false))), idCol, textCol, model)
  }

  /** Score documents against an already-learned model — the incremental /
    * cross-corpus path (learn once on a pilot sample, score every shard).
    * Zero shuffle: one scalar pass with the model array in the closure.
    */
  def scoreLogWeights(docs: DataFrame, idCol: String, textCol: String,
                      model: DsirModel): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nB = model.nBuckets
    val salt = model.salt
    val lr = model.logRatio
    docs.select(col(idCol).cast("long"), col(textCol))
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val toks = text.split(" ", -1)
        // bucket-count map, folded in ascending bucket order: the double
        // sum is reproducible by any engine folding ORDER BY bucket
        val cnt = new scala.collection.mutable.LongMap[Long]
        toks.foreach { t =>
          val b = tokenBucketScalar(t, nB, salt).toLong
          cnt.update(b, cnt.getOrElse(b, 0L) + 1L)
        }
        var w = 0.0
        cnt.keys.toArray.sorted.foreach { b =>
          w += cnt(b) * lr(b.toInt)
        }
        (id, toks.length.toLong,
          java.math.BigDecimal.valueOf(w)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)
      })
      .toDF("doc_id", "n_tokens", "log_weight")
  }

  /** Hashed-feature linear classifier inference (the fastText-style
    * quality-classifier scoring pass used by CCNet/LLaMA-style pipelines):
    * score = bias + mean over token positions of `weights(bucket(token))`,
    * probability via the logistic link. The model is a fixed-size weight
    * array over md5 token buckets — broadcast-sized regardless of corpus
    * vocabulary — so inference is a ZERO-shuffle scalar pass per document.
    *
    * Determinism: the weight sum folds in token POSITION order (the order
    * any engine's ordered list fold reproduces); score is rounded to 6 dp
    * before the sigmoid, and the probability to 6 dp before the 0.5
    * threshold, so keep/drop membership is engine-independent.
    *
    * @return (doc_id, n_tokens, score, prob, keep)
    */
  def linearScore(docs: DataFrame, idCol: String, textCol: String,
                  weights: Array[Double], bias: Double,
                  salt: String = "lin", threshold: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nB = weights.length
    require(nB > 0, "weights must be non-empty")
    docs.select(col(idCol).cast("long"), col(textCol))
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val toks = text.split(" ", -1)
        var s = 0.0
        toks.foreach(t => s += weights(tokenBucketScalar(t, nB, salt)))
        def r6(x: Double): Double =
          java.math.BigDecimal.valueOf(x)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
        val score = r6(bias + s / toks.length)
        val prob = r6(1.0 / (1.0 + math.exp(-score)))
        (id, toks.length.toLong, score, prob, prob >= threshold)
      })
      .toDF("doc_id", "n_tokens", "score", "prob", "keep")
  }

  /** Top-k raw-pool documents by DSIR weight (the deterministic-selection
    * variant of DSIR's Gumbel resampling — declared divergence: sampling
    * noise is replaced by a reproducible rank, ties broken by doc id).
    * Plans as TakeOrderedAndProject — no global sort of the corpus.
    */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, k: Int, nBuckets: Int = 256,
                 salt: String = "dsir"): DataFrame =
    dsirLogWeights(docs, idCol, textCol, isTarget, nBuckets, salt)
      .orderBy(col("log_weight").desc, col("doc_id"))
      .limit(k)
}
