package graft

/** Dev/judge tool: write `explain("formatted")` for every declared query
  * to `<outDir>/<name>_<suffix>.txt` — the optimization round's plan
  * evidence (Exchange counts, join strategies, PushedFilters/ReadSchema
  * are all visible in the formatted plan). Building a probe's frame runs
  * its fixture side effects (index builds, table writes) but never the
  * final query itself; with AQE on the dump is the INITIAL plan
  * (isFinalPlan=false), which is exactly the plan the optimizer
  * committed to before runtime re-planning.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> [suffix]
  * SPARK_GRAFT_ONLY=a,b,c restricts to named queries.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <outDir> [suffix]")
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = if (args.length > 2) args(2) else "before"
    java.nio.file.Files.createDirectories(outDir)
    val spark = GraftSession.localFromEnv()
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(SparkEntry.queries)(
      names => SparkEntry.queries.filter(kv => names.contains(kv._1)))
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          outDir.resolve(s"${name}_$suffix.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plandump] $name ok")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
