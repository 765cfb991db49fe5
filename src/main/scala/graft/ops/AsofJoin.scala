package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Backward as-of join: every left row picks up the payload of the
  * most recent right row with `rightTs <= leftTs` in the same key group
  * (nulls when none exists) — the canonical "state at event time" lookup
  * of feature pipelines and time-series enrichment. No counterpart in the
  * reference (SURVEY §2.3: no as-of/interval joins); this is a north-star
  * addition.
  *
  * Scale design: NOT a range join (whose candidate space explodes with
  * key×time density) but the union+window formulation — tag both inputs,
  * union them, and carry the latest right payload forward with
  * `last(_, ignoreNulls)` over a (key, time)-sorted window. One shuffle +
  * one sort over |L|+|R| rows, the same cost profile as a sort-merge join,
  * regardless of how many right rows precede each left row. Equal
  * timestamps match (right sorts before left at the same instant), and
  * ties among right rows resolve by `rightOrd` (compared in its own
  * type), keeping the result deterministic.
  *
  * Null semantics (the repo-wide convention): right rows with a null key
  * or null `rightTs` never match anything; left rows with a null key or
  * null `leftTs` come through with null payloads.
  */
object AsofJoin {

  /** @param key      equi-join key columns (present in both inputs)
    * @param leftTs   left event-time column name
    * @param rightTs  right event-time column name
    * @param rightOrd column totally ordering right rows within one
    *                 (key, ts) instant (e.g. a unique id); the greatest
    *                 wins
    * @param rightPrefix prefix for the matched right payload columns
    *                 (every non-key right column, `rightTs` included)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: Seq[String],
               leftTs: String, rightTs: String, rightOrd: String,
               rightPrefix: String = "asof_"): DataFrame = {
    val payloadCols = right.columns.filterNot(key.contains).toSeq
    val payload = struct(payloadCols.map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType
    val leftRow = struct(left.columns.map(col): _*)
    val leftType = left.select(leftRow).schema.head.dataType
    // the ord tie-break keeps the RIGHT column's own type (a long cast
    // would null out string/uuid ids, leaving same-instant ties unbroken
    // and the winner shuffle-order-dependent); the left side carries a
    // typed null of the same type so the union's schemas line up
    val ordType = right.schema(rightOrd).dataType

    val lTagged = left.select(
      key.map(col) ++ Seq(
        col(leftTs).as("_graft_ts"), lit(1).as("_graft_tag"),
        lit(null).cast(ordType).as("_graft_ord"),
        leftRow.as("_graft_lrow"),
        lit(null).cast(payloadType).as("_graft_rpay")): _*)
    // a right row with a null key or null timestamp can never satisfy
    // `rightTs <= leftTs` in an equi-key group under SQL semantics — drop
    // them up front (otherwise nulls-first ordering would seat them at
    // the head of a partition and fabricate matches for null-ts left
    // rows, and null keys would "equi-join" through partitionBy)
    val rTagged = right
      .filter(key.map(col(_).isNotNull).reduce(_ && _) && col(rightTs).isNotNull)
      .select(
        key.map(col) ++ Seq(
          col(rightTs).as("_graft_ts"), lit(0).as("_graft_tag"),
          col(rightOrd).as("_graft_ord"),
          lit(null).cast(leftType).as("_graft_lrow"),
          payload.as("_graft_rpay")): _*)

    // right rows sort before left rows at the same instant (inclusive
    // match); left rows at one instant all see the same carried value, so
    // their relative order is irrelevant
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("_graft_ts").asc, col("_graft_tag").asc,
        col("_graft_ord").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionByName(rTagged)
      .withColumn("_graft_asof", last(col("_graft_rpay"), ignoreNulls = true).over(w))
      .filter(col("_graft_tag") === 1)
      .select(left.columns.toSeq.map(c => col(s"_graft_lrow.`$c`").as(c)) ++
        payloadCols.map(c => col(s"_graft_asof.`$c`").as(rightPrefix + c)): _*)
  }
}
