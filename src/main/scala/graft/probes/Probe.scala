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
}
