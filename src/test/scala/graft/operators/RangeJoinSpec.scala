package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("binned range join equals the naive inequality join") {
    val points = Seq(
      ("u1", ts("2026-01-01 10:00:00"), 1L),
      ("u1", ts("2026-01-01 10:29:59"), 2L),
      ("u1", ts("2026-01-01 10:31:00"), 3L),
      ("u2", ts("2026-01-01 10:05:00"), 4L), // other key
      ("u1", ts("2026-01-01 12:00:00"), 5L))
      .toDF("user_id", "ts", "event_id")
    val intervals = Seq(
      ("u1", ts("2026-01-01 10:00:00"), ts("2026-01-01 10:30:00"), "w1"),
      ("u1", ts("2026-01-01 11:59:00"), ts("2026-01-01 12:30:00"), "w2"),
      ("u2", ts("2026-01-01 09:00:00"), ts("2026-01-01 09:30:00"), "w3"))
      .toDF("user_id", "w_start", "w_end", "w")

    val binned = RangeJoin.pointInInterval(points, intervals,
      "user_id", "ts", "w_start", "w_end")
      .select("event_id", "w").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val naive = points.join(intervals, Seq("user_id"))
      .filter(col("ts") >= col("w_start") && col("ts") <= col("w_end"))
      .select("event_id", "w").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(binned === naive)
    assert(binned === Set((1L, "w1"), (2L, "w1"), (5L, "w2")))
  }

  test("intervals spanning many bins still match exactly once per pair") {
    val points = Seq(("k", ts("2026-01-01 13:00:00"), 1L))
      .toDF("key", "ts", "id")
    val intervals = Seq( // 6-hour interval = 12 bins at 30-minute width
      ("k", ts("2026-01-01 10:00:00"), ts("2026-01-01 16:00:00"), "big"))
      .toDF("key", "s", "e", "w")
    val out = RangeJoin.pointInInterval(points, intervals,
      "key", "ts", "s", "e").collect()
    assert(out.length === 1) // no duplicate pairs from multi-bin intervals
  }
}
