package graft.probes

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** [EXT] probes: streaming-window semantics evaluated in batch mode over the
  * `events` table (SURVEY §2.10 note), plus the large-scale training-data
  * operators (dedup / similarity / text analysis) added in later groups.
  *
  * The same window functions are used by graft.streaming.EventStreams in
  * true streaming mode; batch evaluation gives the oracle-checkable surface.
  */
object ExtProbes {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Streaming-equivalent window probes (batch evaluation). */
  val streamingWindows: Seq[Probe] = Seq(

    // Tumbling 10-minute window: Spark window() buckets are epoch-aligned,
    // so the oracle reproduces them with integer µs arithmetic.
    Probe(
      "stream_tumbling_window",
      "SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 600000000) * 600000000 AS win_us, event_type, count(*) AS cnt, round(sum(value), 2) AS total FROM events GROUP BY 1, 2 ORDER BY win_us, event_type"
    ) { (s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("total"))
        .select(unix_micros(col("w.start")).as("win_us"), col("event_type"),
          col("cnt"), col("total"))
        .orderBy("win_us", "event_type")
    },

    // Sliding 10-minute window, 5-minute slide: every event lands in two
    // windows; the oracle unions the two shifted bucket assignments.
    Probe(
      "stream_sliding_window",
      "WITH b AS (SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 300000000) * 300000000 AS s0, value FROM events), w AS (SELECT s0 AS win_us, value FROM b UNION ALL SELECT s0 - 300000000 AS win_us, value FROM b) SELECT win_us, count(*) AS cnt, round(sum(value), 2) AS total FROM w GROUP BY win_us ORDER BY win_us"
    ) { (s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("total"))
        .select(unix_micros(col("w.start")).as("win_us"), col("cnt"), col("total"))
        .orderBy("win_us")
    },

    // Session windows with a 5-minute gap per user: the oracle reproduces
    // Spark's session_window() semantics with the classic lag + cumulative
    // new-session-flag sessionization (new session when gap >= 5 min).
    Probe(
      "stream_session_window",
      "WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value FROM events), f AS (SELECT user_id, us, value, CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us) >= 300000000 OR lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL THEN 1 ELSE 0 END AS new_sess FROM e), g AS (SELECT user_id, us, value, sum(new_sess) OVER (PARTITION BY user_id ORDER BY us ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id FROM f) SELECT user_id, min(us) AS sess_start_us, max(us) AS sess_last_us, count(*) AS cnt, round(sum(value), 2) AS total FROM g GROUP BY user_id, sess_id ORDER BY user_id, sess_start_us"
    ) { (s, d) =>
      t(s, d, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "5 minutes").as("w"))
        .agg(min(unix_micros(col("ts"))).as("sess_start_us"),
          max(unix_micros(col("ts"))).as("sess_last_us"),
          count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("total"))
        .select("user_id", "sess_start_us", "sess_last_us", "cnt", "total")
        .orderBy("user_id", "sess_start_us")
    }
  )

  def all: Seq[Probe] = streamingWindows
}
