package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.localFromEnv()
    // experimental conf overrides, e.g. SPARK_GRAFT_CONF="spark.sql.adaptive.enabled=false;..."
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })
    // JVM/codegen warmup outside the timed loop so the first measured
    // query doesn't absorb classloading + janino compile time; the warmup
    // shape exercises scan → join → agg → window → sort, the stages the
    // first few measured queries would otherwise pay compile time for
    spark.read.parquet(s"$sfDir/region.parquet").count()
    spark.range(1000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()
    locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      // partitioned window: warms the same WindowExec/sort codegen paths
      // without the (cosmetic, but greppable) single-partition warning
      n.join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name").agg(count(lit(1)).as("c"), collect_list("n_name").as("ns"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("r_name")).orderBy(col("c"))))
        .orderBy("r_name")
        .write.format("noop").mode("overwrite").save()
    }
    // noop sink forces full query execution (a bare count() would let
    // Catalyst prune projections and skip most of the work being measured).
    // SPARK_GRAFT_ONLY=a,b,c restricts to named queries (dev iteration).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach(names => (names -- SparkEntry.queries.keySet)
      .foreach(n => System.err.println(s"[bench] unknown query name: $n")))
    val selected = only.fold(SparkEntry.queries)(
      names => SparkEntry.queries.filter(kv => names.contains(kv._1)))
    // each query runs ITERS times and reports the MIN: single-shot timings
    // proved noise-limited (round 11: the same commit measured 110 s and
    // 159 s on the same code, 4-6× swings on untouched shuffle joins from
    // host contention) — the min of two runs filters contention spikes
    // while plan-level regressions still show in both runs. Raw per-run
    // values are kept in "runs" so a cross-round diff can see the spread.
    val iters = sys.env.get("SPARK_GRAFT_BENCH_ITERS")
      .flatMap(s => scala.util.Try(s.toInt).toOption).filter(_ >= 1).getOrElse(2)
    // STATEFUL stream probes (checkpointed micro-batch scheduling +
    // RocksDB store spin-up) dominate capture-to-capture variance: r17's
    // two same-tree captures disagreed 19% in aggregate almost entirely
    // on this family. One extra iteration tightens their min at a cost
    // of a few seconds per capture; stateless queries keep the global
    // ITERS (r18, judge task 8)
    def itersFor(name: String): Int =
      if (name.startsWith("stream_") || name == "m6_cdc_stream" ||
          name == "m7_lease_takeover") math.max(iters, 3)
      else iters
    // host-load context per run: min-of-2 filters SPIKES but not
    // SUSTAINED contention (round 12: same-commit captures disagreed 8×
    // on single queries with both runs slow together). Recording the
    // 1-minute loadavg around each run lets a cross-round diff separate
    // "host was busy" from "plan regressed" without cross-capture
    // forensics. -1 when /proc/loadavg is unavailable (non-Linux).
    def loadAvg(): Double =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")),
        java.nio.charset.StandardCharsets.US_ASCII)
        .split(" ")(0).toDouble
      catch { case scala.util.control.NonFatal(_) => -1.0 }
    var sinceGc = 0
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // periodic full GC outside the timer: lets the ContextCleaner drop
      // dead broadcast/checkpoint blocks before they stack up into
      // mid-suite pauses (a 125-query single-JVM run otherwise GCs at
      // arbitrary points INSIDE some unlucky query's timing window)
      sinceGc += 1
      if (sinceGc >= 10) { sinceGc = 0; System.gc() }
      val runs = (1 to itersFor(name)).map { _ =>
        // discard any phase entries recorded under this name BEFORE the
        // timer opens (a correctness pass, aborted run, or the previous
        // iteration) — else a query's phases map can exceed its sec
        graft.probes.PhaseTimer.drain(name)
        val loadBefore = loadAvg()
        val t0 = System.nanoTime()
        // a failed query must NOT silently contribute a misleadingly fast
        // timing (a broken analysis "runs" in milliseconds): record it in
        // the failed list and surface that list in the summary JSON
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        val t = (System.nanoTime() - t0) / 1e9
        // sub-phase attribution for multi-stage probes (index build vs
        // query, ingest vs read-back): drained per iteration so nothing
        // leaks into a later one; empty for single-stage probes
        val phases = graft.probes.PhaseTimer.drain(name)
        // inter-query hygiene, outside the timer: queries that persist or
        // localCheckpoint intermediates would otherwise accumulate block-
        // manager state across 100+ queries and tax later queries with GC
        // pauses (observed as multi-second outliers on mid-alphabet joins)
        spark.catalog.clearCache()
        (t, ok, phases, (loadBefore, loadAvg()))
      }
      val okRuns = runs.filter(_._2)
      val ok = okRuns.nonEmpty
      // min over the SUCCESSFUL runs; phases from that same run so the
      // sub-phase sum stays consistent with the reported second count
      val (t, _, phases, _) =
        if (ok) okRuns.minBy(_._1) else runs.minBy(_._1)
      val phasesJson = phases
        .map { case (p, s) => s"\"" + p + "\":" + s }.mkString("{", ",", "}")
      // per-query line as it completes: even if the driver truncates the
      // combined JSON line below, every timing survives in the log.
      // Double.toString (not the f-interpolator) — locale-independent,
      // so the JSON stays valid on comma-decimal default locales
      val phaseField = if (phases.isEmpty) "" else s""","phases":$phasesJson"""
      val runsField = runs.map(_._1).mkString("[", ",", "]")
      val loadsField = runs
        .map { case (_, _, _, (b, a)) => s"[$b,$a]" }.mkString("[", ",", "]")
      println(s"""[bench] {"query":"$name","sec":$t,"ok":$ok,"runs":$runsField,"loads":$loadsField$phaseField}""")
      (name, t, ok, phases, runs.map(_._1), loadsField)
    }
    val qs = results.collect { case (k, v, true, _, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false, _, _, _) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val runsAll = results.map { case (k, _, _, _, rs, _) =>
      s"\"" + k + "\":" + rs.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val phasesAll = results.collect { case (k, _, _, ph, _, _) if ph.nonEmpty =>
      s"\"" + k + "\":" + ph.map { case (p, s) => s"\"" + p + "\":" + s }
        .mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    // per-run (before, after) 1-min loadavg — the contention adjudicator
    val loadsAll = results.map { case (k, _, _, _, _, lf) =>
      s"\"" + k + "\":" + lf
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v, true, _, _, _) => v }.sum
    // one-field load adjudication: the max 1-min loadavg seen across the
    // whole capture. A capture with max_load well above the host's core
    // head-room is a contended capture — compare per-query only against
    // the recorded loads, or recapture (the suite is documented to swing
    // 134-212 s on identical trees under sustained contention)
    val maxLoad = results.iterator.flatMap(_._6
      .split("[\\[\\],]").filter(_.nonEmpty).map(_.toDouble)).foldLeft(-1.0)(math.max)
    val ceil = sys.env.get("SPARK_GRAFT_LOAD_CEIL")
      .flatMap(s => scala.util.Try(s.toDouble).toOption).getOrElse(3.0)
    if (maxLoad > ceil)
      System.err.println(f"[bench] WARNING: capture ran under load up to " +
        f"$maxLoad%.2f (ceiling $ceil%.1f) — treat per-query regressions " +
        "as suspect until reproduced on a calm host")
    // iters is the GLOBAL floor; the stateful stream family runs
    // itersFor(...) >= 3 — report both so cross-round tooling never
    // attributes a tighter stream min to a plan change (per-query run
    // counts are also visible as the "runs" array lengths)
    val itersStream = math.max(iters, 3)
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","iters":$iters,"iters_stream":$itersStream,"max_load":$maxLoad,"queries":$qs,"failed":$failed,"runs":$runsAll,"loads":$loadsAll,"phases":$phasesAll,"sf":"$sfDir"}"""
    // the full JSON also goes to a file: the driver's stdout capture has
    // been observed to keep only the tail of very long lines (BENCH_r04
    // lost the first ~67 per-query timings), and a file survives intact
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    def writeJson(p: String): Unit =
      try java.nio.file.Files.write(java.nio.file.Paths.get(p),
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $p: ${e.getMessage}")
      }
    writeJson(outPath)
    // durable per-round capture: bench_out.json is overwritten every run
    // and the driver's BENCH_rN tail keeps ~2 KB (cross-round diffs
    // recovered only 60/135 queries) — a round-stamped copy commits to
    // git intact. Round = SPARK_GRAFT_ROUND, else one past the newest
    // BENCH_r*.json in the cwd; filtered dev runs never clobber it
    if (only.isEmpty) {
      val round = sys.env.get("SPARK_GRAFT_ROUND")
        .flatMap(r => scala.util.Try(r.toInt).toOption)
        .getOrElse {
          val pat = "BENCH_r(\\d+)\\.json".r
          Option(new java.io.File(".").list()).toSeq.flatten
            .collect { case pat(n) => n.toInt }
            .maxOption.map(_ + 1).getOrElse(0)
        }
      if (round > 0) writeJson(f"bench_full_r$round%02d.json")
    }
    println(json)
    // the driver's stdout capture keeps only ~2 KB of tail, which has
    // truncated the full line above every round since the suite outgrew
    // it (BENCH_r12+ all record parsed: null). A compact summary as the
    // LAST line fits inside any tail window, so the driver's parse gets
    // the headline number even when the full map must come from the
    // bench_full_r*.json committed alongside.
    println(s"""{"metric":"total","value":$total,"unit":"sec","iters":$iters,"iters_stream":$itersStream,"max_load":$maxLoad,"n_queries":${results.size},"failed":$failed,"queries_file":"$outPath","sf":"$sfDir"}""")
    spark.stop()
  }
}
