package graft

import org.apache.spark.sql.catalyst.plans.logical.Window
import org.scalatest.funsuite.AnyFunSuite

/** Structural scale guard over the WHOLE registered surface: a window
  * whose partition spec is empty — or folds to a constant — collapses the
  * corpus into one task, the classic scale funnel (`WindowExec: "Moving
  * all data to a single partition"`). Individual plans are pinned in
  * PlanSpec; this sweep closes the gap for every probe nobody thought to
  * pin, and catches the subtle variant where a `partitionBy(lit(...))`
  * constant-folds to an empty spec after optimization.
  *
  * The check runs on the optimized LOGICAL plan, so it sees through AQE
  * and costs one optimizer pass per probe, not an execution.
  */
class GlobalWindowSweepSpec extends AnyFunSuite with SharedSpark {

  test("no registered probe plans a corpus window without a real partition key") {
    val sf = "/root/testdata/sf0.001"
    // j6 deliberately zips the nation/region DIMENSION tables (25/5 rows)
    // by position — a global row_number over a bounded dim IS the
    // operator's semantics (SURVEY §2.3 J6), not a corpus funnel.
    val allowed = Set("j6_zip_positional")
    val offenders = SparkEntry.probes
      .filterNot(p => allowed(p.name))
      .flatMap { pr =>
        val df = pr.fn(spark, sf)
        df.queryExecution.optimizedPlan.collect {
          case w: Window
              if w.partitionSpec.isEmpty || w.partitionSpec.forall(_.foldable) =>
            s"${pr.name}: ${w.simpleString(120)}"
        }
      }
    assert(offenders.isEmpty,
      s"corpus-wide window(s) without a partition key:\n${offenders.mkString("\n")}")
  }
}
