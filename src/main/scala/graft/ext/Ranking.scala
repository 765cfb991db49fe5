package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Lexical relevance scoring: Okapi BM25 (Robertson & Zaragoza,
  * "The Probabilistic Relevance Framework: BM25 and Beyond", 2009) of a
  * literal query against a document corpus — the retrieval primitive for
  * quality-weighted sampling and search-style corpus probes.
  *
  * Scale design: query terms are literals, so term statistics collapse to
  * a single tiny aggregate row that is broadcast (one cross join of a
  * 1-row frame — Spark plans it as BroadcastNestedLoopJoin over a single
  * row, effectively free). The corpus sees one explode + filter (map-side,
  * the filter drops every non-query token before any shuffle) and ONE
  * aggregation keyed by doc id. Per-term scores are separate columns in a
  * fixed expression order, so the floating-point sum is deterministic —
  * an `agg(sum(score))` over an exploded frame would add doubles in
  * shuffle-arrival order and break run-to-run reproducibility.
  */
object Ranking {

  /** Top-k documents by BM25 score for `queryTerms`.
    * @return (doc_id, score) — score rounded to 6 decimals, descending,
    *         ties broken by doc_id
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
               topK: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val terms = queryTerms.distinct
    // engine null convention: null-id/text rows neither score nor count
    // toward N/avgdl/df (distinct null-id docs would otherwise merge into
    // one pseudo-document and unscoreable rows would skew every idf)
    val base = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        split(col(textCol), " ", -1).as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))

    // one row per (doc, query-term occurrence); everything else is
    // filtered before the aggregate's shuffle
    val hits = base.select(col("doc_id"), col("dl"),
      explode(col("toks")).as("term"))
      .filter(col("term").isInCollection(terms))

    def tfCol(t: String): Column =
      sum(when(col("term") === t, 1L).otherwise(0L))

    // materialized once: both the df aggregation and the scored frame
    // consume this — without the checkpoint the corpus explode + filter +
    // aggregate runs twice (AQE does not stage-share the copies)
    val perDoc = hits.groupBy("doc_id", "dl")
      .agg(tfCol(terms.head).as(tfName(0)),
        terms.tail.zipWithIndex.map { case (t, i) =>
          tfCol(t).as(tfName(i + 1))
        }: _*)
      .localCheckpoint()

    // corpus-level stats: N + avgdl from the full corpus, df per term from
    // the hit frame — a single 1-row frame, cross-joined (broadcast)
    val corpusStats = base.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val dfStats = perDoc.agg(
      sum(when(col(tfName(0)) > 0, 1L).otherwise(0L)).cast("double").as(dfName(0)),
      terms.indices.tail.map { i =>
        sum(when(col(tfName(i)) > 0, 1L).otherwise(0L)).cast("double").as(dfName(i))
      }: _*)

    val scored = perDoc.crossJoin(corpusStats).crossJoin(dfStats)
    // fixed left-to-right term order keeps the double sum deterministic
    val score = terms.indices.map { i =>
      val tf = col(tfName(i)).cast("double")
      val idf = log((col("n_docs") - col(dfName(i)) + 0.5) / (col(dfName(i)) + 0.5) + 1.0)
      // operand order mirrors the oracle SQL exactly — double arithmetic
      // must agree bit-for-bit before the final rounding
      idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    }.reduce(_ + _)

    scored.select(col("doc_id"), round(score, 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  private def tfName(i: Int) = s"tf_$i"
  private def dfName(i: Int) = s"df_$i"

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) of
    * N ranked candidate lists — the standard hybrid-retrieval combiner
    * (lexical BM25 + dense ANN) for curation and RAG-style corpus
    * search: each list contributes `1/(rrfK + rank)` per candidate and
    * the fused score is the sum, so scales of the underlying scores
    * never need calibrating against each other.
    *
    * Every input must carry `idCol` and `scoreCol` (plus `queryCols` for
    * batch fusion). Ranks are per-list (and per-query), ordered by
    * (score desc, id) — the same deterministic tie-break every retriever
    * in this library emits, so fusing their outputs is rank-stable.
    *
    * Scale shape: inputs are top-k retriever outputs (k·Q rows each,
    * never the corpus), so this whole operator works on candidate-sized
    * frames. The rank window partitions by (src, queryCols) — a real
    * key, never a corpus funnel; the fuse is one groupBy on
    * (queryCols, id); final selection is sort+limit (global) or a
    * per-query window. With ≤2 lists the fused double sum is exact
    * (2-operand fp addition is commutative), and ≥3 lists stay
    * cross-engine stable under the 9-dp rounding.
    *
    * @return (queryCols…, idCol, rrf_score) — `topK` rows per query by
    *         (rrf_score desc, id)
    */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, scoreCol: String,
              queryCols: Seq[String] = Nil, rrfK: Int = 60,
              topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(lists.size >= 2, s"rrfFuse needs ≥2 lists, got ${lists.size}")
    require(rrfK > 0 && topK > 0, s"rrfK/topK must be positive")
    // internal working columns are _rrf_-prefixed so caller column names
    // can never collide into an ambiguous-reference AnalysisException;
    // only the output name is reserved
    val reserved = Set("_rrf_s", "_rrf_src", "_rrf_contrib", "_rrf_rn", "rrf_score")
    (idCol +: queryCols).foreach(c => require(!reserved(c),
      s"column name '$c' collides with rrfFuse's internal/output names"))
    val tagged = lists.zipWithIndex.map { case (df, i) =>
      df.select(queryCols.map(col) ++ Seq(
        col(idCol).cast("long").as(idCol),
        col(scoreCol).cast("double").as("_rrf_s"), lit(i).as("_rrf_src")): _*)
    }.reduce(_ unionByName _)
    val rankW = Window
      .partitionBy(col("_rrf_src") +: queryCols.map(col): _*)
      .orderBy(col("_rrf_s").desc, col(idCol))
    val fused = tagged
      .withColumn("_rrf_contrib",
        lit(1.0) / (lit(rrfK.toDouble) + row_number().over(rankW)))
      .groupBy(queryCols.map(col) :+ col(idCol): _*)
      .agg(round(sum(col("_rrf_contrib")), 9).as("rrf_score"))
    if (queryCols.isEmpty)
      fused.orderBy(col("rrf_score").desc, col(idCol)).limit(topK)
    else {
      val sel = Window.partitionBy(queryCols.map(col): _*)
        .orderBy(col("rrf_score").desc, col(idCol))
      fused.withColumn("_rrf_rn", row_number().over(sel))
        .filter(col("_rrf_rn") <= topK).drop("_rrf_rn")
        .orderBy(queryCols.map(col) :+ col("rrf_score").desc :+ col(idCol): _*)
    }
  }

  /** Top-k TF-IDF terms per document (smoothed sklearn-style idf:
    * ln((N+1)/(df+1)) + 1, always positive) — the per-document keyword
    * signature used for topic labelling and cheap relevance features.
    *
    * Scale shape: one explode + map-side-combined (doc, term) count; the
    * document-frequency table derives from THAT frame (never a second
    * corpus scan) and is vocabulary-sized, so it broadcast-joins; the
    * top-k window partitions by document. N is one driver scalar.
    * Ranking uses the ROUNDED score (6 dp) with a term tie-break, so
    * rankings are reproducible across engines (ln differs by 1 ulp).
    *
    * @return (doc_id, term, tf, df, score) — top `k` per doc by
    *         (score desc, term asc)
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame =
    tfidfTopTerms(docs, idCol, textCol, k, broadcastMaxTerms = 2000000L)

  /** As [[tfidfTopTerms(docs*]], with an explicit cutover: a df table at
    * most `broadcastMaxTerms` rows broadcasts; an open-vocabulary corpus
    * beyond it joins shuffled (the tf frame is checkpointed either way,
    * so nothing recomputes). Identical results on both paths.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int, broadcastMaxTerms: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"k must be positive, got $k")
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol))
      .filter(col("doc_id").isNotNull && col(textCol).isNotNull)
    // one driver scalar: corpus size for the idf numerator
    val n = base.count()
    // checkpointed: consumed twice (df aggregation + score join) — a lazy
    // plan would re-explode and re-shuffle the corpus on both sides
    val tf = base
      .select(col("doc_id"), explode(split(col(textCol), " ", -1)).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    // df from the tf frame: rows are distinct (doc, term) already;
    // checkpointed so the cardinality probe costs a local count, not a
    // re-aggregation
    val df = tf.groupBy("term").agg(count(lit(1)).as("df")).localCheckpoint()
    val dfJoin = if (df.count() <= broadcastMaxTerms) broadcast(df) else df
    val scored = tf.join(dfJoin, "term")
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("tf") *
          (log(lit(n + 1.0) / (col("df") + 1.0)) + 1.0), 6).as("score"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }
}
