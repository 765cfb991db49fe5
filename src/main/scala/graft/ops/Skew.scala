package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY/driver scale notes: "skewed keys →
  * salting or AQE skew-join"). AQE's skew-join handling (enabled in
  * GraftSession) covers sort-merge joins; these helpers cover the cases
  * AQE doesn't: skewed aggregations and broadcast-averse skewed joins.
  */
object Skew {

  /** Two-phase salted aggregation: per-(key, salt) partial aggregate, then
    * final aggregate over the partials. Turns one hot key processed by one
    * task into `saltBuckets` parallel partials. The caller supplies the
    * partial and final aggregate pairs (they differ for non-decomposable
    * aggregates: count -> sum, avg -> sum/sum, ...).
    */
  def saltedAggregate(df: DataFrame, key: Column, saltBuckets: Int,
                      partial: Seq[Column], finalAgg: Seq[Column],
                      keyName: String = "key"): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id()
        + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy(key.as("_key"), col("_salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col("_key"))
      .agg(finalAgg.head, finalAgg.tail: _*)
      .withColumnRenamed("_key", keyName)

  /** Salted join of a skewed fact side against a dimension: the fact side
    * gets a random-ish salt in [0, n); the dimension is replicated n times
    * (explode) so every (key, salt) pair still matches. Join stays an
    * equi-join on (key, salt) and the hot key spreads over n tasks.
    * Use when the dimension is too big to broadcast but small enough to
    * replicate n-fold.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBuckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }
}
