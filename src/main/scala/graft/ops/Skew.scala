package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY/driver scale notes: "skewed keys →
  * salting or AQE skew-join"). AQE's skew-join handling (enabled in
  * GraftSession) covers sort-merge joins; these helpers cover the cases
  * AQE doesn't: skewed aggregations and broadcast-averse skewed joins.
  *
  * Determinism contract (shared with `rankByHexKey`/`bloomSubtract`): the
  * salt is `xxhash64` over the ROW'S OWN COLUMNS, never a physical-
  * placement id. A salt drawn from `monotonically_increasing_id`/
  * `spark_partition_id` changes when a task is recomputed after a fetch
  * failure, and a nondeterministic shuffle key can lose or duplicate rows
  * when only PART of a stage reruns (the SPARK-23207 class of bug) — a
  * content-derived salt re-salts a recomputed row identically every time.
  * A hot key still spreads because its rows differ in their other
  * columns; the one degenerate case is a hot key whose rows are FULLY
  * duplicated across every column (e.g. a bare-key projection), which
  * hashes to one bucket. For [[saltedAggregate]] that degeneracy is
  * absorbed by map-side partial aggregation: identical rows collapse to
  * ONE partial per (key, salt) per input partition before the shuffle,
  * so the hot reducer receives O(input partitions) rows either way. For
  * [[saltedJoin]], keep a distinguishing column in the fact frame (at
  * the point rows are byte-identical, any deterministic scheme must
  * collapse them — dedup-with-count first if that is the workload).
  * All columns must be hashable types (no MapType).
  */
object Skew {

  private[graft] def contentSalt(df: DataFrame, saltBuckets: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(saltBuckets.toLong))

  /** Two-phase salted aggregation: per-(key, salt) partial aggregate, then
    * final aggregate over the partials. Turns one hot key processed by one
    * task into up to `saltBuckets` parallel partials. The caller supplies
    * the partial and final aggregate pairs (they differ for
    * non-decomposable aggregates: count -> sum, avg -> sum/sum, ...).
    */
  def saltedAggregate(df: DataFrame, key: Column, saltBuckets: Int,
                      partial: Seq[Column], finalAgg: Seq[Column],
                      keyName: String = "key"): DataFrame = {
    require(saltBuckets > 0, s"saltBuckets must be positive, got $saltBuckets")
    // temp names must not clobber caller columns (Cols.fresh, the same
    // hygiene GlobalOrder/Layout apply)
    val sc = Cols.fresh(df, "_skew_salt")
    val kc = Cols.fresh(df, "_skew_key")
    df.withColumn(sc, contentSalt(df, saltBuckets))
      .groupBy(key.as(kc), col(sc))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(kc))
      .agg(finalAgg.head, finalAgg.tail: _*)
      .withColumnRenamed(kc, keyName)
  }

  /** Salted join of a skewed fact side against a dimension: each fact row
    * gets a content-derived salt in [0, n); the dimension is replicated n
    * times (explode) so every (key, salt) pair still matches. Join stays
    * an equi-join on (key, salt) and the hot key spreads over n tasks.
    * Use when the dimension is too big to broadcast but small enough to
    * replicate n-fold.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, s"saltBuckets must be positive, got $saltBuckets")
    val sc = Cols.fresh((fact.columns ++ dim.columns).toSeq, "_skew_salt")
    val saltedFact = fact.withColumn(sc, contentSalt(fact, saltBuckets))
    val replicatedDim = dim.withColumn(sc,
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    saltedFact.join(replicatedDim, Seq(key, sc)).drop(sc)
  }
}
