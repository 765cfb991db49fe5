package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Quantitative error bounds for the two sketch aggregates whose probes
  * are `no_oracle` (HLL / GK estimates are engine-specific, so a foreign
  * engine can't hash-match them): the estimates must still sit within
  * their published error envelopes of the EXACT aggregates computed on
  * the same data — "approximate" is a bounded contract, not a shrug.
  */
class SketchBoundsSpec extends AnyFunSuite with SharedSpark {

  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct is within 3 standard errors of exact (HLL++)") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val rsd = 0.05 // Spark's default relative standard deviation
    val row = li.agg(
      countDistinct(col("l_partkey")).as("d_parts"),
      approx_count_distinct(col("l_partkey"), rsd).as("a_parts"),
      countDistinct(col("l_suppkey")).as("d_supps"),
      approx_count_distinct(col("l_suppkey"), rsd).as("a_supps")).head()
    for ((exact, approx) <- Seq((row.getLong(0), row.getLong(1)),
      (row.getLong(2), row.getLong(3)))) {
      val err = math.abs(approx - exact).toDouble / exact
      assert(err <= 3 * rsd,
        s"HLL estimate $approx vs exact $exact: relative error $err " +
          s"exceeds the 3-sigma envelope ${3 * rsd}")
    }
  }

  test("approx_percentile rank error is within the GK accuracy guarantee") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_totalprice").isNotNull)
    val accuracy = 1000
    // per group: the exact rank of the sketch's answer must land within
    // q ± 1/accuracy of the requested quantile (GK's published bound),
    // plus one row of slack for ties at the boundary value
    val approx = orders.groupBy("o_orderstatus")
      .agg(expr(s"approx_percentile(o_totalprice, 0.5, $accuracy)").as("p50"),
        expr(s"approx_percentile(o_totalprice, 0.9, $accuracy)").as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
    for ((status, (p50, p90)) <- approx; (q, v) <- Seq(0.5 -> p50, 0.9 -> p90)) {
      val grp = orders.filter(col("o_orderstatus") === status)
      val n = grp.count().toDouble
      val below = grp.filter(col("o_totalprice") < v).count().toDouble
      val atOrBelow = grp.filter(col("o_totalprice") <= v).count().toDouble
      // the interval of ranks the returned value occupies must intersect
      // [q - eps, q + eps] in rank space
      val eps = 1.0 / accuracy + 1.0 / n
      assert(below / n <= q + eps && atOrBelow / n >= q - eps,
        s"group $status q=$q: value $v occupies rank span " +
          s"[${below / n}, ${atOrBelow / n}], outside $q +- $eps")
    }
  }
}
