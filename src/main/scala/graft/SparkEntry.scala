package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.probes._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a named
  * probe query; where the semantics are SQL-expressible the matching DuckDB
  * oracle SQL is registered too (same column names, same total ORDER BY).
  */
object SparkEntry {

  /** All probe groups, in SURVEY §2 order. */
  def probes: Seq[Probe] =
    CoreProbes.all ++ JoinAggWindowProbes.all ++ ExtProbes.all ++
      EtlProbes.all ++ MultimodalProbes.all ++ TrainingDataProbes.all ++
      ClusterMixProbes.all ++ CurationProbes.all ++ SelectionProbes.all ++
      CrawlProbes.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The J1 "document detail" shape: parent joined to ordered nested
    * children (SURVEY §3.2).
    */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.load(spark, dir, "orders")
    val items = Tables.load(spark, dir, "lineitem")
    orders.join(items, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey", "o_orderstatus", "o_totalprice")
      .agg(count(lit(1)).as("total_chunks"),
        sort_array(collect_list(struct(col("l_linenumber"), col("l_quantity"))))
          .as("chunks"))
      .orderBy("o_orderkey")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    probes.map(p => p.name -> p.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    probes.flatMap(p => p.oracle.map(p.name -> _)).toMap
}
