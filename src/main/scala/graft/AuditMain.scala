package graft

import org.apache.spark.sql.SparkSession

import graft.store.{Audit, ObjectStore, TableStore}

/** Operator entrypoint for the store-consistency audit:
  * `runMain graft.AuditMain <storeRoot>` (expects `<root>/tables` and
  * `<root>/bucket`, the layout IngestPipeline writes). Prints one line
  * per check and exits nonzero when any invariant is violated, so it
  * drops straight into a cron/CI health gate.
  */
object AuditMain {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: AuditMain <storeRoot>")
    val root = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = Audit.check(spark,
      new TableStore(spark, s"$root/tables"),
      new ObjectStore(spark, s"$root/bucket"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    results.foreach { case (check, v) => println(f"[audit] $check%-28s $v%d") }
    val bad = results.count(_._2 != 0L)
    println(s"[audit] ${results.length} checks, $bad violated")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
