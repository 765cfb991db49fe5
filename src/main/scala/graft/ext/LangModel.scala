package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Statistical language-model quality signal: per-document average
  * add-one-smoothed bigram log-probability scored against the corpus's
  * OWN bigram statistics (self-perplexity) — the CCNet-style filter
  * (Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
  * from Web Crawl Data", 2020): fluent/boilerplate text scores high,
  * token soup scores low, and the signal needs no external model.
  *
  * Scale shape, adaptively (same cutover idea as
  * Dedup.duplicateClusters' local union-find):
  *
  *  - The count model is always built vocabulary-keyed: two
  *    map-side-combined aggregations (unigrams, bigrams) whose shuffled
  *    frames are MODEL-sized, never corpus-sized.
  *  - When the model fits an executor (entries ≤ `broadcastMaxEntries`),
  *    both tables broadcast and scoring is ONE corpus scan with zero
  *    further shuffle — the per-doc fold runs left-to-right in position
  *    order, the same order as the sorted-list fold below and the oracle.
  *  - Otherwise (open-vocabulary web corpora) scoring stays fully
  *    distributed: bigram counts via a window over the bigram key, the
  *    unigram join vocabulary-keyed, and the per-document sum folds the
  *    position-sorted log-prob list — deterministic double accumulation
  *    either way, so both paths are bit-identical and oracle-reproducible.
  */
object LangModel {

  /** @return (doc_id, n_bigrams, avg_lp) — avg_lp rounded to 6 decimals
    *         (ln differs by 1 ulp across engines); documents with fewer
    *         than 2 tokens have no bigram and are absent
    */
  def bigramSelfLogProb(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    bigramSelfLogProb(docs, idCol, textCol, broadcastMaxEntries = 2000000L)

  /** As [[bigramSelfLogProb(docs*]], with an explicit cutover: a count
    * model (unigram + distinct-bigram entries) at most
    * `broadcastMaxEntries` broadcasts and scores in one shuffle-free
    * corpus pass; a larger model runs the distributed window/join path.
    * Identical results on both paths.
    */
  def bigramSelfLogProb(docs: DataFrame, idCol: String, textCol: String,
                        broadcastMaxEntries: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol).cast("long"), col(textCol))
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .as[(Long, String)]

    val unigrams = base.flatMap { case (_, text) =>
      text.split(" ", -1).iterator
    }.toDF("w")
    // the vocabulary frame is consumed twice (size count + score join);
    // an eager localCheckpoint runs the unigram aggregation exactly once
    // and its blocks are scoped to THIS call's frame — reclaimed by the
    // context cleaner once the returned plan is garbage-collected, so
    // concurrent calls and lazy re-execution of a previously returned
    // frame stay independent (no session-global mutable cache)
    val uni = unigrams.groupBy("w").agg(count(lit(1)).as("c1"))
      .localCheckpoint()
    // vocabulary size collected once on the driver (a long, not a frame):
    // a 1-row vdf cross join would re-evaluate the unigram aggregation a
    // second time on the join side — AQE does not stage-share the copies
    val vsz = uni.count().toDouble

    val materializedCounts: Option[DataFrame] =
      if (vsz > broadcastMaxEntries) None
      else {
        // distinct-bigram counts: map-side combined, model-sized output
        val bigCounts = base.flatMap { case (_, text) =>
          val toks = text.split(" ", -1)
          (0 until toks.length - 1).iterator
            .map(p => toks(p) + " " + toks(p + 1))
        }.toDF("big").groupBy("big").agg(count(lit(1)).as("cb"))
          .localCheckpoint()
        if (vsz + bigCounts.count() <= broadcastMaxEntries)
          return scoreBroadcast(spark, base, uni, bigCounts, vsz)
        // model too big to broadcast but ALREADY materialized — the
        // distributed path below joins the checkpointed counts instead
        // of throwing the finished aggregation away and re-deriving it
        Some(bigCounts)
      }

    val bigrams = base.flatMap { case (id, text) =>
      val toks = text.split(" ", -1)
      (0 until toks.length - 1).iterator.map { p =>
        (id, p, toks(p), toks(p) + " " + toks(p + 1))
      }
    }.toDF("doc_id", "pos", "w1", "big")

    // bigram count: when a checkpointed count frame exists (cutover
    // fallthrough) it joins — one shuffle of the bigram rows, no
    // recompute; otherwise a window over the bigram key — also one
    // shuffle, and the bigram flatMap evaluates ONCE (a non-checkpointed
    // groupBy+join formulation would re-run it on both sides). The
    // unigram join is a genuine second input (last-token counts are not
    // derivable from bigram rows), so one unigram scan remains. Both
    // forms produce identical counts, so results are bit-identical.
    val withCb = materializedCounts match {
      case Some(cb) => bigrams.join(cb, "big")
      case None =>
        val wb = org.apache.spark.sql.expressions.Window.partitionBy("big")
        bigrams.withColumn("cb", count(lit(1)).over(wb))
    }
    val scored = withCb
      .join(uni.withColumnRenamed("w", "w1"), "w1")
      .select(col("doc_id"), col("pos"),
        log((col("cb") + 1.0) / (col("c1") + vsz)).as("lp"))

    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        array_sort(collect_list(struct(col("pos"), col("lp")))).as("lps"))
      .select(col("doc_id"), col("n_bigrams"),
        round(aggregate(col("lps"), lit(0.0),
          (acc, s) => acc + s.getField("lp")) / col("n_bigrams"), 6)
          .as("avg_lp"))
  }

  /** Broadcast-model scoring: one corpus scan, zero shuffle. The per-doc
    * fold is left-to-right in position order and the arithmetic mirrors
    * the expression path op-for-op (cb+1.0, c1+vsz, Math.log — the same
    * IEEE ops Catalyst emits), so results are bit-identical.
    */
  private def scoreBroadcast(spark: org.apache.spark.sql.SparkSession,
                             base: org.apache.spark.sql.Dataset[(Long, String)],
                             uni: DataFrame, bigCounts: DataFrame,
                             vsz: Double): DataFrame = {
    import spark.implicits._
    val c1 = spark.sparkContext.broadcast(
      uni.as[(String, Long)].collect().toMap)
    val cb = spark.sparkContext.broadcast(
      bigCounts.as[(String, Long)].collect().toMap)
    base.flatMap { case (id, text) =>
      val toks = text.split(" ", -1)
      if (toks.length < 2) Iterator.empty
      else {
        var sum = 0.0
        var p = 0
        while (p < toks.length - 1) {
          val big = toks(p) + " " + toks(p + 1)
          sum += math.log((cb.value(big) + 1.0) / (c1.value(toks(p)) + vsz))
          p += 1
        }
        val n = toks.length - 1
        val avg = java.math.BigDecimal.valueOf(sum / n)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        Iterator.single((id, n.toLong, avg))
      }
    }.toDF("doc_id", "n_bigrams", "avg_lp")
  }

  /** Per-group KL divergence KL(p_group ‖ p_corpus) of token unigram
    * distributions — the corpus-balance diagnostic ("how far has this
    * source/shard/epoch drifted from the overall mix"). Zero divergence
    * means the group looks like the corpus; spikes flag domain drift or
    * a contaminated shard.
    *
    * Scale shape: ONE corpus-sized aggregation (group × token counts,
    * map-side combined); every later frame — corpus token counts, group
    * totals, the grand total — re-aggregates that vocabulary-bounded
    * frame, so nothing downstream scales with corpus size. p_group > 0
    * implies p_corpus > 0 by construction, so the log is always finite.
    *
    * Determinism: per-group contributions p_g·ln(p_g/p_c) fold in binary
    * token order (sort_array on a (token, contrib) struct), so the double
    * sum is reproducible by any engine folding ORDER BY token; rounded to
    * 6 dp (ln differs by 1 ulp across engines).
    *
    * @return (groupCol, n_tokens, n_terms, kl)
    */
  def groupKlDivergence(docs: DataFrame, groupCol: String,
                        textCol: String): DataFrame = {
    // materialized once: three consumers (the join input, the corpus
    // re-aggregation, and the grand total) would otherwise each re-run
    // the corpus explode + groupBy — the module's standard
    // consumed-more-than-once checkpoint (cf. bigramSelfLogProb)
    val tc = docs
      .filter(col(groupCol).isNotNull && col(textCol).isNotNull)
      .select(col(groupCol).as("_kl_grp"),
        explode(split(col(textCol), " ", -1)).as("_kl_t"))
      .groupBy("_kl_grp", "_kl_t").agg(count(lit(1)).as("_kl_c"))
      .localCheckpoint()
    val corpus = tc.groupBy("_kl_t").agg(sum("_kl_c").as("_kl_cc"))
    val grand = tc.agg(sum("_kl_c").as("_kl_cn"))
    val pg = col("_kl_c").cast("double") / col("_kl_gn")
    val pc = col("_kl_cc").cast("double") / col("_kl_cn")
    tc.join(corpus, "_kl_t")
      .crossJoin(broadcast(grand))
      .withColumn("_kl_gn",
        sum("_kl_c").over(org.apache.spark.sql.expressions.Window
          .partitionBy("_kl_grp")))
      .withColumn("_kl_contrib", pg * log(pg / pc))
      .groupBy("_kl_grp")
      .agg(max("_kl_gn").as("_kl_gn2"),
        count(lit(1)).as("n_terms"),
        sort_array(collect_list(struct(col("_kl_t"), col("_kl_contrib"))))
          .as("_kl_lps"))
      .select(col("_kl_grp").as(groupCol),
        col("_kl_gn2").as("n_tokens"),
        col("n_terms"),
        round(aggregate(col("_kl_lps"), lit(0.0),
          (acc, x) => acc + x.getField("_kl_contrib")), 6).as("kl"))
  }
}
