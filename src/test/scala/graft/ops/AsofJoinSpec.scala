package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class AsofJoinSpec extends AnyFunSuite with SharedSpark {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join matches latest right at-or-before, nulls when none, ties by ord") {
    import spark.implicits._
    val left = Seq(
      (10L, 1L, ts("2024-01-01 00:00:05"), "early"), // before any right row
      (11L, 1L, ts("2024-01-01 00:00:10"), "equal"), // equal ts matches (inclusive)
      (12L, 1L, ts("2024-01-01 00:00:30"), "late"),  // after both right rows
      (13L, 2L, ts("2024-01-01 00:00:30"), "otherkey") // key 2 has no right rows
    ).toDF("event_id", "user_id", "ts", "tagd")
    val right = Seq(
      (100L, 1L, ts("2024-01-01 00:00:10"), 1.0),
      (101L, 1L, ts("2024-01-01 00:00:10"), 2.0), // same instant: greater ord wins
      (102L, 1L, ts("2024-01-01 00:00:20"), 3.0)
    ).toDF("event_id", "user_id", "ts", "value")

    val out = AsofJoin.asofJoin(left, right, Seq("user_id"), "ts", "ts", "event_id")
      .orderBy("event_id")
      .select("event_id", "asof_event_id", "asof_value")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toList

    assert(out == List(
      (10L, None, None),               // nothing at-or-before 00:05
      (11L, Some(101L), Some(2.0)),    // inclusive; ord tie-break picks 101
      (12L, Some(102L), Some(3.0)),    // latest preceding
      (13L, None, None)))              // key with no right side
  }
}
