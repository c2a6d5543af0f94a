package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property tests for the distributed exact-rank boundary behind q11
  * (stalest-k). At fixture scale the narrowing loop never fires (the
  * corpus sits under `rankCap`), so these force multi-round narrowing
  * with a tiny cap on synthetic data and pin the boundary against a
  * naive local sort — including the two paths the fixture cannot
  * reach: the hot-key collapse (one key value dominating the bucket)
  * and the tie-column switch once a single key value remains. */
class RankBoundarySpec extends SparkSpec {

  private def naive(rows: Seq[(Long, Long)], r: Long): (Long, Long) =
    rows.sorted.apply((r - 1).toInt)

  private def df(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.toDF("k", "t")
  }

  test("boundary equals the naive k-th (key, tie) across ranks, with " +
    "duplicate keys and a cap that forces the narrowing loop") {
    val rnd = new scala.util.Random(7)
    // 4000 rows over only 97 distinct keys: heavy duplication, unique ties
    val rows = (0L until 4000L).map(i => (rnd.nextInt(97).toLong, i))
    val d = df(rows).repartition(8).cache()
    try {
      for (r <- Seq(1L, 2L, 399L, 2000L, 3999L, 4000L)) {
        val got = RelationalQueries.rankBoundary(d, "k", "t", r, cap = 50)
        assert(got === naive(rows, r), s"rank $r")
      }
    } finally d.unpersist()
  }

  test("hot key dominating the bucket: collapse to the hot run, then " +
    "narrow by the tie column") {
    // 3500 of 4000 rows share key=42; boundary ranks land inside the run
    val rows = (0L until 3500L).map(i => (42L, i)) ++
      (3500L until 4000L).map(i => (if (i % 2 == 0) 7L else 99L, i))
    val d = df(rows).repartition(8).cache()
    try {
      for (r <- Seq(300L, 1750L, 3400L)) {
        val got = RelationalQueries.rankBoundary(d, "k", "t", r, cap = 50)
        assert(got === naive(rows, r), s"rank $r")
      }
    } finally d.unpersist()
  }

  test("q11 selection law: exactly k rows, and they are precisely the " +
    "k smallest (ts, event_id) of the fixture") {
    val q = graft.queries.RelationalQueries.q11Stalest(spark, sf("sf0.001"))
    val got = q.collect().map(r => (r.getLong(1), r.getLong(0)))
    val ev = graft.Tables.load(spark, sf("sf0.001"), "events")
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .collect().map(r => (r.getLong(1), r.getLong(0)))
    val k = ev.length * 20 / 100
    assert(got.length === k)
    assert(got.toSeq === ev.sorted.take(k).toSeq)
  }
}
