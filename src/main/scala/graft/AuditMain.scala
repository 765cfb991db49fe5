package graft

import org.apache.spark.sql.SparkSession

import graft.store.{Audit, ObjectStore, TableStore}

/** Operator entrypoint for the store-consistency audit:
  * `runMain graft.AuditMain <storeRoot>` (expects `<root>/tables` and
  * `<root>/bucket`, the layout IngestPipeline writes). Prints one line
  * per check. Exit codes: 0 = all invariants hold; 1 = at least one
  * violated (data corruption — page); 2 = no documents table under the
  * root (wrong/empty store path — a config error, different runbook).
  */
object AuditMain {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: AuditMain <storeRoot>")
    val root = args(0)
    val spark = GraftSession.localFromEnv()
    val tables = new TableStore(spark, s"$root/tables")
    // a wrong/nonexistent root would audit vacuously healthy forever —
    // the gate must distinguish "healthy" from "looking at nothing"
    if (!tables.exists("documents")) {
      System.err.println(
        s"[audit] no documents table under $root/tables — wrong store root?")
      spark.stop()
      sys.exit(2)
    }
    val results = Audit.check(spark, tables,
      new ObjectStore(spark, s"$root/bucket"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    results.foreach { case (check, v) => println(f"[audit] $check%-28s $v%d") }
    val bad = results.count(_._2 != 0L)
    println(s"[audit] ${results.length} checks, $bad violated")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
