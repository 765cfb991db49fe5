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

  test("null right keys/timestamps never match; string ord ties break in its own type") {
    import spark.implicits._
    val left = Seq(
      (1L, Option(ts("2024-01-01 00:00:10")), "normal"),
      (2L, Option.empty[Timestamp], "nullts"))
      .toDF("user_id", "ts", "tagd")
    // right rows with a null ts or null key can never satisfy
    // rightTs <= leftTs under SQL semantics — they must not seat
    // themselves at the head of the window and fabricate matches
    val right = Seq(
      (Option(1L), Option.empty[Timestamp], "ghost-nullts", 1.0),
      (Option.empty[Long], Option(ts("2024-01-01 00:00:01")), "ghost-nullkey", 2.0),
      // string ord ids: "b" > "a" in STRING order (a long cast would
      // null both and leave the tie shuffle-order-dependent)
      (Option(1L), Option(ts("2024-01-01 00:00:05")), "a", 3.0),
      (Option(1L), Option(ts("2024-01-01 00:00:05")), "b", 4.0))
      .toDF("user_id", "ts", "ord", "value")
    val out = AsofJoin.asofJoin(left, right, Seq("user_id"), "ts", "ts", "ord")
      .orderBy("user_id")
      .select("user_id", "asof_ord", "asof_value")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toList
    assert(out == List(
      (1L, Some("b"), Some(4.0)), // tie broken by string ord, not a null cast
      (2L, None, None)))          // null left ts matches nothing
  }

  test("asof join agrees with per-row brute force on randomized inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val leftRows = (0 until 60).map { i =>
        (i.toLong, rnd.nextInt(5).toLong,
          ts(f"2024-01-01 00:00:${rnd.nextInt(50)}%02d"), rnd.nextInt(100).toDouble)
      }
      val rightRows = (100 until 160).map { i =>
        (i.toLong, rnd.nextInt(5).toLong,
          ts(f"2024-01-01 00:00:${rnd.nextInt(50)}%02d"), rnd.nextInt(100).toDouble)
      }
      val left = leftRows.toDF("event_id", "user_id", "ts", "value")
      val right = rightRows.toDF("event_id", "user_id", "ts", "value")
      val got = AsofJoin.asofJoin(left, right, Seq("user_id"), "ts", "ts", "event_id")
        .select("event_id", "asof_event_id")
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
      val expected = leftRows.map { case (lid, k, lts, _) =>
        val m = rightRows.filter { case (_, rk, rts, _) =>
          rk == k && !rts.after(lts)
        }
        // latest ts wins; ties by greatest right ord (event_id)
        lid -> m.sortBy { case (rid, _, rts, _) => (rts.getTime, rid) }
          .lastOption.map(_._1)
      }.toMap
      assert(got == expected)
    }
  }
}
