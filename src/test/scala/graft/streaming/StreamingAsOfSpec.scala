package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamingAsOf.{In, Out}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingAsOfSpec extends SparkSpec {
  import spark.implicits._

  private def right(key: String, ts: Long, tb: Long, p: String) =
    In(key, ts, side = 0, tieBreak = tb, leftId = -1, payload = p)
  private def left(key: String, ts: Long, id: Long) =
    In(key, ts, side = 1, tieBreak = 0, leftId = id, payload = null)

  test("streamed probes resolve against the growing right history") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[In]
    val q = StreamingAsOf.asofStream(input.toDS())
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode(OutputMode.Append).start()
    def results(): Map[Long, Option[String]] =
      spark.table("asof_stream").as[Out].collect()
        .map(o => o.leftId -> o.payload).toMap
    try {
      // batch 1: right v1@10, a later left in the SAME batch sees it;
      // an earlier left does not
      input.addData(Seq(right("k", 10, 1, "v1"),
        left("k", 15, 1L), left("k", 5, 2L)))
      q.processAllAvailable()
      assert(results() === Map(1L -> Some("v1"), 2L -> None))
      // batch 2: newer right v2@20; probes straddle the history
      input.addData(Seq(right("k", 20, 1, "v2"),
        left("k", 25, 3L), left("k", 12, 4L), left("k", 20, 5L)))
      q.processAllAvailable()
      assert(results()(3L) === Some("v2"))
      assert(results()(4L) === Some("v1")) // older state still answerable
      assert(results()(5L) === Some("v2")) // inclusive <=
      // batch 3: equal-ts rights tie-break on the highest tieBreak,
      // and other keys never leak in
      input.addData(Seq(right("k", 30, 1, "tie_lo"),
        right("k", 30, 2, "tie_hi"), left("k", 30, 6L),
        left("other", 99, 7L)))
      q.processAllAvailable()
      assert(results()(6L) === Some("tie_hi"))
      assert(results()(7L) === None)
    } finally q.stop()
  }

  test("right history is capped at maxHistory (state stays bounded)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[In]
    val q = StreamingAsOf.asofStream(input.toDS(), maxHistory = 2)
      .writeStream.format("memory").queryName("asof_capped")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Seq(right("k", 10, 0, "a"), right("k", 20, 0, "b"),
        right("k", 30, 0, "c")))
      q.processAllAvailable()
      // only the 2 newest rights retained: a probe older than the horizon
      // finds nothing, probes inside it resolve normally
      input.addData(Seq(left("k", 15, 1L), left("k", 35, 2L)))
      q.processAllAvailable()
      val out = spark.table("asof_capped")
        .as[Out].collect().map(o => o.leftId -> o.payload).toMap
      assert(out(1L) === None) // ts=10 right evicted
      assert(out(2L) === Some("c"))
    } finally q.stop()
  }

  test("agrees with the batch AsOfJoin on a replayed scenario") {
    val rights = Seq(("k1", 5L, 100L, "r1"), ("k1", 8L, 101L, "r2"),
      ("k1", 8L, 102L, "r2b"), ("k2", 3L, 103L, "r3"))
    val lefts = Seq(("k1", 5L, 1L), ("k1", 9L, 2L), ("k1", 2L, 3L),
      ("k2", 3L, 4L), ("k3", 7L, 5L))
    // batch reference
    val batch = graft.operators.AsOfJoin.asof(
      lefts.toDF("key", "t", "lid"),
      rights.map { case (k, t, tb, _) => (k, t, tb, s"p$tb") }
        .toDF("key", "t", "tb", "payload"),
      "key", "t", "t", tieBreak = "tb")
      .collect().map(r => r.getAs[Long]("lid") ->
        Option(r.getAs[String]("r_payload"))).toMap
    // streaming, everything in one batch
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[In]
    val q = StreamingAsOf.asofStream(input.toDS())
      .writeStream.format("memory").queryName("asof_equiv")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        rights.map { case (k, t, tb, _) => right(k, t, tb, s"p$tb") } ++
          lefts.map { case (k, t, id) => left(k, t, id) })
      q.processAllAvailable()
      val streamed = spark.table("asof_equiv").as[Out].collect()
        .map(o => o.leftId -> o.payload).toMap
      assert(streamed === batch)
    } finally q.stop()
  }
}
