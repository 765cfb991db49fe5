package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.localFromEnv()
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=a,b,c restricts to named queries (dev iteration;
    // the driver never sets it). oracle_sql.json always carries the full
    // map so a filtered dump still compares cleanly per-query.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach(names => (names -- SparkEntry.queries.keySet)
      .foreach(n => System.err.println(s"[verify] unknown query name: $n")))
    val selected = only.fold(SparkEntry.queries)(
      names => SparkEntry.queries.filter(kv => names.contains(kv._1)))
    // the filter fact travels WITH the dump (dev tooling reads it), so a
    // checker in a fresh shell never mistakes a filtered dump for a full
    // run with crashed queries — written only for filtered runs
    if (only.isEmpty)
      Files.deleteIfExists(Paths.get(s"$outDir/dumped_queries.json"))
    else
      Files.writeString(Paths.get(s"$outDir/dumped_queries.json"),
        selected.keys.toSeq.sorted
          .map(n => "\"" + n + "\"").mkString("[", ",", "]"))
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures += name -> String.valueOf(e.getMessage)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // a failed query leaves no parquet dir, which downstream compares can
    // only report as "missing" — this artifact records WHY, so a dropped
    // probe is a visible failure in the dump itself, never a silent hole
    Files.writeString(Paths.get(s"$outDir/failures.json"),
      failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    spark.stop()
  }
}
