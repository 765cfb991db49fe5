package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** [EXT] Structured Streaming operators over event streams (SURVEY §2.10:
  * the reference is processing-time-only; event-time windows, watermarks
  * and stateful sessionization are the north-star additions).
  *
  * Every transform here takes and returns DataFrames so the same logic
  * runs in batch mode (the oracle-checked probes) and streaming mode (the
  * specs): Spark's unified semantics guarantee the results agree.
  */
object EventStreams {

  /** Schema of the driver's `events` table (TESTDATA.md), with ts already
    * normalized to TimestampType.
    */
  val eventSchema: StructType = new StructType()
    .add("event_id", "long").add("ts", "timestamp").add("user_id", "long")
    .add("event_type", "string").add("value", "double").add("props", "string")

  /** S1-analog for events: a parquet directory as an unbounded stream. */
  def fromDirectory(spark: SparkSession, dir: String,
                    maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(eventSchema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(dir)
  }

  /** Tumbling-window counts/sums with a watermark: rows later than
    * `lateness` behind the max seen event time are dropped (late-data
    * policy the reference lacks).
    */
  def tumblingCounts(events: DataFrame, window: String = "10 minutes",
                     lateness: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", lateness)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window).as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("total"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("cnt"), col("total"))

  /** Sliding-window aggregate (every event lands in window/slide panes). */
  def slidingCounts(events: DataFrame, window: String = "10 minutes",
                    slide: String = "5 minutes",
                    lateness: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", lateness)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window, slide).as("w"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("total"))
      .select(col("w.start").as("win_start"), col("cnt"), col("total"))

  /** Gap-based sessionization via the built-in session_window. */
  def sessionCounts(events: DataFrame, gap: String = "5 minutes",
                    lateness: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("total"))
      .select(col("user_id"), col("w.start").as("sess_start"),
        col("w.end").as("sess_end"), col("cnt"), col("total"))

  /** Per-user running profile maintained with explicit state — the
    * mapGroupsWithState surface for semantics the built-in windows can't
    * express (here: lifetime event count, running value sum, and the last
    * seen timestamp per user, emitted on every update).
    */
  final case class UserProfile(userId: Long, events: Long, totalValue: Double,
                               lastTs: Timestamp)

  def userProfiles(events: DataFrame): Dataset[UserProfile] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select("user_id", "ts", "value")
      .as[(Long, Timestamp, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserProfile, UserProfile](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Timestamp, Double)],
         state: GroupState[UserProfile]) =>
          val prev = state.getOption.getOrElse(UserProfile(userId, 0L, 0.0, new Timestamp(0L)))
          // the STATE carries the exact running sum; rounding only at
          // emission — rounding after every event would silently discard
          // per-event contributions under 0.005 forever
          val updated = rows.foldLeft(prev) { case (p, (_, ts, v)) =>
            UserProfile(userId, p.events + 1, p.totalValue + v,
              if (ts.after(p.lastTs)) ts else p.lastTs)
          }
          state.update(updated)
          updated.copy(totalValue = java.math.BigDecimal
            .valueOf(updated.totalValue)
            .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue())
      }
  }

  /** Watermarked stream-stream interval join: correlate each "trigger"
    * event with the "response" events of the same user arriving within
    * `horizon` afterwards. Both sides carry watermarks and the time-bound
    * condition, so join state is GC'd as event time advances — the
    * bounded-state form of event correlation on unbounded streams.
    */
  def correlate(events: DataFrame, triggerType: String, responseType: String,
                horizon: String = "10 minutes",
                lateness: String = "10 minutes"): DataFrame = {
    val trig = events.filter(col("event_type") === triggerType)
      .select(col("user_id").as("t_user"), col("ts").as("t_ts"),
        col("event_id").as("t_id"))
      .withWatermark("t_ts", lateness)
    val resp = events.filter(col("event_type") === responseType)
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("event_id").as("r_id"), col("value").as("r_value"))
      .withWatermark("r_ts", lateness)
    trig.join(resp,
      col("t_user") === col("r_user") &&
        col("r_ts") > col("t_ts") &&
        col("r_ts") <= col("t_ts") + expr(s"interval $horizon"))
      .select(col("t_user").as("user_id"), col("t_id"), col("r_id"),
        col("r_value"))
  }

  /** Streaming dedup: drop events whose key was already seen within the
    * watermark horizon — the bounded-state form of exact dedup for
    * unbounded streams ([EXT]; state is GC'd as the watermark advances).
    */
  def dedupedEvents(events: DataFrame, lateness: String = "10 minutes",
                    keyCols: Seq[String] = Seq("event_id")): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keyCols)

  /** One closed session emitted by the stateful sessionizer. */
  final case class ClosedSession(userId: Long, startUs: Long, lastUs: Long,
                                 events: Long, totalValue: Double)

  final case class SessionState(startUs: Long, lastUs: Long,
                                events: Long, totalValue: Double)

  /** Custom-state sessionization with flatMapGroupsWithState +
    * event-time timeout: a session closes (and is emitted exactly once)
    * when the watermark passes its last event + gap. This is the surface
    * for session semantics the built-in session_window can't express
    * (e.g. emitting only on close, carrying running custom state).
    */
  def closedSessions(events: DataFrame, gapMinutes: Int = 5,
                     lateness: String = "10 minutes"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events.withWatermark("ts", lateness)
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[(Long, Timestamp, Double)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(userId, s.startUs, s.lastUs, s.events, s.totalValue))
          } else {
            val sorted = rows.toSeq.sortBy(_._2.getTime)
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            // late-but-within-watermark events OLDER than the current
            // session's reach (start - gap) must NOT merge into it — a
            // signed `us - lastUs < gap` test is vacuously true for any
            // earlier timestamp and would fuse events gap-apart into one
            // session. Such stragglers chain into their own preceding
            // session (they arrive first in the sorted batch), which is
            // reconciled against the live session at the end.
            var old = Option.empty[SessionState]
            sorted.foreach { case (_, ts, v) =>
              val us = ts.getTime * 1000L
              cur match {
                case None =>
                  cur = Some(SessionState(us, us, 1L, v))
                case Some(s) if us - s.lastUs >= gapUs =>
                  closed ::= ClosedSession(userId, s.startUs, s.lastUs, s.events, s.totalValue)
                  cur = Some(SessionState(us, us, 1L, v))
                case Some(s) if s.startUs - us < gapUs =>
                  // within the session's interval (or within gap of its
                  // start): merge with monotonic bounds — a late event
                  // must not regress lastUs
                  cur = Some(SessionState(math.min(s.startUs, us),
                    math.max(s.lastUs, us), s.events + 1, s.totalValue + v))
                case Some(_) =>
                  old match {
                    case Some(o) if us - o.lastUs < gapUs =>
                      old = Some(SessionState(math.min(o.startUs, us),
                        math.max(o.lastUs, us), o.events + 1, o.totalValue + v))
                    case Some(o) =>
                      closed ::= ClosedSession(userId, o.startUs, o.lastUs, o.events, o.totalValue)
                      old = Some(SessionState(us, us, 1L, v))
                    case None =>
                      old = Some(SessionState(us, us, 1L, v))
                  }
              }
            }
            // straggler chain that grew to within gap of the live session
            // merges into it; otherwise it closes as its own session
            (old, cur) match {
              case (Some(o), Some(s)) if s.startUs - o.lastUs < gapUs =>
                cur = Some(SessionState(math.min(o.startUs, s.startUs),
                  s.lastUs, o.events + s.events, o.totalValue + s.totalValue))
              case (Some(o), _) =>
                closed ::= ClosedSession(userId, o.startUs, o.lastUs, o.events, o.totalValue)
              case _ =>
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastUs / 1000L + gapUs / 1000L)
            }
            closed.reverseIterator
          }
      }
  }

  /** Write helper: run a streaming transform into an in-memory table and
    * block until all available data is processed (test/dev harness).
    */
  def runToMemory(df: DataFrame, queryName: String,
                  outputMode: OutputMode = OutputMode.Update(),
                  checkpoint: Option[String] = None): Unit = {
    val w = df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    val q = w.start()
    q.awaitTermination()
  }
}
