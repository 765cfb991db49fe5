package graft.probes

/** Per-query sub-phase timing registry for the bench surface. Probes with
  * multi-stage bodies (index build then query; ingest then read-back)
  * record named phases here; Bench drains them after timing the query and
  * emits a `phases` map alongside the headline seconds, so a drift in an
  * expensive probe gets attributed to a stage instead of re-litigated as
  * noise every round (VERDICT r9 watch item).
  *
  * Registry, not return values, because the probe contract is
  * `(SparkSession, dir) => DataFrame` — phases happen inside the body and
  * inside library hooks (IngestPipeline.onPhase) that cannot widen that
  * signature. Keyed by query name; drain removes, so state never leaks
  * across bench iterations.
  */
object PhaseTimer {
  private val acc = new java.util.concurrent.ConcurrentHashMap[
    String, scala.collection.mutable.LinkedHashMap[String, Double]]()

  def record(query: String, phase: String, sec: Double): Unit = {
    val m = acc.computeIfAbsent(query,
      _ => scala.collection.mutable.LinkedHashMap.empty[String, Double])
    m.synchronized { m.update(phase, m.getOrElse(phase, 0.0) + sec); () }
  }

  def timed[T](query: String, phase: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally record(query, phase, (System.nanoTime() - t0) / 1e9)
  }

  /** Remove and return the phases recorded for `query`, insertion-ordered. */
  def drain(query: String): Seq[(String, Double)] =
    Option(acc.remove(query)).map(m => m.synchronized(m.toSeq)).getOrElse(Nil)
}
