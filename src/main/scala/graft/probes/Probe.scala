package graft.probes

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One correctness probe: a named DataFrame query over a testdata scale
  * directory plus (when SQL-expressible) the equivalent ANSI SQL that the
  * driver runs in DuckDB as the oracle.
  *
  * Contract (see the driver docs / SURVEY.md §5):
  *   - column names must match the oracle exactly (compare sorts by name);
  *   - every probe ends in a total ORDER BY on both sides;
  *   - floating-point aggregates are rounded on both sides;
  *   - timestamps are emitted as epoch microseconds or formatted strings.
  */
final case class Probe(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Probe {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Probe =
    Probe(name, fn, Some(oracle))
  def unchecked(name: String)(fn: (SparkSession, String) => DataFrame): Probe =
    Probe(name, fn, None)

  /** Per-run scratch dir for probes that exercise real table/index
    * writes, removed on JVM exit so repeated Verify/Bench runs don't
    * accumulate under /tmp.
    */
  def scratchDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(p.toFile)
    }))
    p.toString
  }

  /** Per-JVM IVF index cache: the index build (repartition + hive-
    * partitioned write) is a one-time lifecycle event, like loading a
    * table — not part of any query. Probes share one build per (sf dir,
    * cellBits) so the timed ANN query measures the partition-pruned read,
    * not the write. `sim_ivf_build` forces a fresh build to time that
    * phase explicitly.
    */
  private val ivfIndexes =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def ivfIndexFor(spark: SparkSession, sfDir: String, cellBits: Int,
                  forceRebuild: Boolean = false): String = {
    val key = s"$sfDir#$cellBits"
    def build(): String = {
      val path = scratchDir("graft-ivf-index") + "/ivf"
      graft.ext.Similarity.ivfWrite(
        spark.read.parquet(s"$sfDir/embeddings.parquet"),
        "vec_id", "embedding", path, cellBits)
      path
    }
    if (forceRebuild) { val p = build(); ivfIndexes.put(key, p); p }
    else ivfIndexes.computeIfAbsent(key, _ => build())
  }

  /** Per-JVM synthetic-media fixture cache: rendering 5k real PNGs/WAVs
    * is corpus SYNTHESIS, not the engine's decode/feature operator — the
    * same lifecycle argument as [[ivfIndexFor]]. The first probe run per
    * (sf dir, kind) materializes the fixture blobs to a scratch parquet
    * (visible as the probe's `fixture_ensure` phase); later iterations
    * re-read the parquet, so min-of-2 bench timings report the decode
    * path the probe actually claims to measure.
    */
  private val mediaFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def mediaFixtureFor(sfDir: String, kind: String)
                     (build: => DataFrame): String =
    mediaFixtures.computeIfAbsent(s"$sfDir#$kind", _ => {
      val path = scratchDir(s"graft-media-$kind") + "/media"
      build.write.parquet(path)
      path
    })

  /** Per-JVM FILE fixture cache: real files on disk for SOURCE probes
    * (WARC shards and friends) — the same lifecycle argument as
    * [[mediaFixtureFor]], but the fixture is a directory the source
    * under test lists and reads like production input.
    */
  private val fileFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def fileFixtureFor(sfDir: String, kind: String)
                    (build: String => Unit): String =
    fileFixtures.computeIfAbsent(s"$sfDir#$kind", _ => {
      val dir = scratchDir(s"graft-files-$kind")
      build(dir)
      dir
    })

  /** Shared DuckDB oracle prelude re-deriving the engine's md5-derived
    * random-hyperplane signatures over the 64-dim embeddings table:
    * CTEs e (vectors as doubles), g (plane components), proj
    * (element-ordered projections), sig (nBits-bit sign signature as
    * `sigName`). ONE source of truth for the plane convention —
    * `(md5-60bit(p_d) % 2001 - 1000)/1000` — shared by every RHP probe.
    */
  def rhpSigSql(nBits: Int, sigName: String): String =
    "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
      s"g AS (SELECT p.p AS p, d.d AS d, (CAST('0x' || substring(md5(CAST(p.p AS VARCHAR) || '_' || CAST(d.d AS VARCHAR)), 1, 15) AS BIGINT) % 2001 - 1000) / 1000.0 AS g FROM UNNEST(generate_series(0, ${nBits - 1})) AS p(p), UNNEST(generate_series(0, 63)) AS d(d)), " +
      "proj AS (SELECT e.vec_id, g.p, list_reduce(list_prepend(0.0, list(e.v[g.d + 1] * g.g ORDER BY g.d)), (a, b) -> a + b) AS dot FROM e CROSS JOIN g GROUP BY e.vec_id, g.p), " +
      s"$sigName AS (SELECT vec_id, CAST(sum(CASE WHEN dot >= 0 THEN (1::BIGINT << p) ELSE 0::BIGINT END) AS BIGINT) AS $sigName FROM proj GROUP BY vec_id)"
}
