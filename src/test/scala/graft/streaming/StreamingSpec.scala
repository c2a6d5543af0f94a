package graft.streaming

import graft.SparkSpec
import graft.operators.MarketplaceModel._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming semantics (SURVEY §2.9): the streaming fold must agree with
  * the batch fold under any micro-batch split, survive checkpoint resume,
  * and the windowed twins must match their batch equivalents on closed
  * windows. */
class StreamingSpec extends SparkSpec {

  private def ev(seq: Long, msgType: String, tokenId: String,
      recipient: String = "", price: String = ""): MarketplaceEvent =
    MarketplaceEvent(seq, msgType).copy(tokenId = tokenId,
      sender = "u_s", recipient = recipient, price = price)

  private val scenario: Seq[MarketplaceEvent] = Seq(
    ev(1, MsgType.MintNFT, "T1", recipient = "alice"),
    ev(2, MsgType.MintNFT, "T2", recipient = "alice"),
    ev(3, MsgType.TransferNFT, "T1", recipient = "bob"),
    ev(4, MsgType.PutNFTOnMarket, "T2", price = "5token"),
    ev(5, MsgType.BurnNFT, "T2"),
    ev(6, MsgType.TransferNFT, "T1", recipient = "carol"),
    ev(7, MsgType.MintNFT, "T3", recipient = "dave"))

  test("streaming fold over micro-batches equals the batch fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MarketplaceEvent]
    val q = MarketplaceStream.snapshotStream(input.toDS())
      .writeStream.format("memory").queryName("snap_stream")
      .outputMode(OutputMode.Update).start()
    try {
      // three uneven micro-batches
      input.addData(scenario.take(2)); q.processAllAvailable()
      input.addData(scenario.slice(2, 5)); q.processAllAvailable()
      input.addData(scenario.drop(5)); q.processAllAvailable()

      val streamed = spark.table("snap_stream")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("tokenId")
            .orderBy(monotonically_increasing_id().desc)))
        .filter(col("rn") === 1) // last update per token wins
        .drop("rn")
      val got = streamed.select("tokenId", "nft.ownerAddress")
        .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap

      val want = MarketplaceStream.batchReference(spark, scenario)
        .map { case (k, s) => k -> s.nft.map(_.ownerAddress) }
      assert(got === want)
      assert(got("T2") === None) // burned
      assert(got("T1") === Some("carol"))
    } finally q.stop()
  }

  test("a null tokenId event is dropped null-safely like the batch " +
    "twin — the stream must not NPE where the batch fold proceeds; " +
    "prioritized() is loud on an unbounded frame and globally " +
    "sorted on a bounded one") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MarketplaceEvent]
    val q = MarketplaceStream.snapshotStream(input.toDS())
      .writeStream.format("memory").queryName("snap_nulltok")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(scenario.take(2) :+ scenario.head.copy(tokenId = null))
      q.processAllAvailable() // would NPE in the filter pre-fix
      assert(spark.table("snap_nulltok")
        .filter(col("tokenId").isNull).count() === 0L)
    } finally q.stop()
    // prioritized: the foreachBatch helper — loud on a stream (Spark
    // rejects Sort on unbounded frames at START, minutes-later), and
    // a GLOBAL highest-first order on the bounded micro-batch
    val e = intercept[IllegalArgumentException](
      EventStreams.prioritized(input.toDF()))
    assert(e.getMessage.contains("foreachBatch"))
    val batch = Seq(("a", 1), ("b", 4), ("c", 2))
      .toDF("task", "priority")
    assert(EventStreams.prioritized(batch)
      .select("task").collect().map(_.getString(0)).toSeq ===
      Seq("b", "c", "a"))
  }

  test("checkpoint resume continues the fold exactly-once") {
    import spark.implicits._
    // File source (replayable — MemoryStream rejects checkpoint recovery):
    // the parquet dir is the event log, the checkpoint dir is the cursor
    // (x/indexer/cursor.go:5-18 analog).
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ckpt").toString
    val dataDir = java.nio.file.Files
      .createTempDirectory("graft_evlog").toString

    def startQuery() = {
      val src = spark.readStream
        .schema(spark.createDataset(scenario).toDF().schema)
        .parquet(dataDir)
        .as[MarketplaceEvent]
      // foreachBatch sink: supports Update mode AND checkpoint recovery
      // (memory/file sinks support one or the other, not both).
      MarketplaceStream.snapshotStream(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[TokenSnapshot],
            _: Long) =>
          StreamingSpec.collected ++= batch.collect()
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update).start()
    }

    StreamingSpec.collected.clear()
    spark.createDataset(scenario.take(4)).repartition(1)
      .write.mode("append").parquet(dataDir)
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()
    val afterFirst = StreamingSpec.collected.map(s =>
      s.tokenId -> s.nft.map(_.ownerAddress)).toMap
    assert(afterFirst("T2") === Some("alice")) // on market, pre-burn

    // Append the rest of the log, restart from the same checkpoint: T2's
    // burn (seq 5) must land on the state built by the first run, and the
    // first four events must NOT be reprocessed (exactly-once).
    StreamingSpec.collected.clear()
    spark.createDataset(scenario.drop(4)).repartition(1)
      .write.mode("append").parquet(dataDir)
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      val rows = StreamingSpec.collected.map(s =>
        s.tokenId -> s.nft.map(_.ownerAddress)).toMap
      assert(rows("T2") === None)          // burn applied to restored state
      assert(rows("T1") === Some("carol")) // transfer on restored state
      assert(rows("T3") === Some("dave"))  // new token from second batch
    } finally q2.stop()
  }

  // (buffer lives on the companion so executor-side closures serialize)

  test("streaming hourly window agrees with the batch query on closed data") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = Seq(
      ("2026-01-01 10:05:00", "view", 1.0),
      ("2026-01-01 10:55:00", "view", 2.0),
      ("2026-01-01 11:05:00", "view", 4.0),
      ("2026-01-01 10:20:00", "purchase", 8.0))
    val input = MemoryStream[(String, String, Double)]
    val stream = EventStreams.hourlyAggregates(
      input.toDF().selectExpr("CAST(_1 AS TIMESTAMP) AS ts",
        "_2 AS event_type", "_3 AS value"))
    val q = stream.writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData(rows); q.processAllAvailable()
      val got = spark.table("hourly")
        .select(date_format(col("w"), "HH:00").as("h"), col("event_type"),
          col("n"), col("sv"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(got === Set(("10:00", "view", 2L, 3.0),
        ("11:00", "view", 1L, 4.0), ("10:00", "purchase", 1L, 8.0)))
    } finally q.stop()
  }

  test("streaming dedup drops replayed ids across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.dedupStream(
      input.toDF().selectExpr("_1 AS event_id", "CAST(_2 AS TIMESTAMP) AS ts"),
      Seq("event_id"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Seq((1L, "2026-01-01 10:00:00"), (2L, "2026-01-01 10:01:00")))
      q.processAllAvailable()
      // replay id 1 (at-least-once delivery) + one new id
      input.addData(Seq((1L, "2026-01-01 10:00:00"), (3L, "2026-01-01 10:02:00")))
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L)) // each exactly once
    } finally q.stop()
  }

  test("session_window splits on the 30-minute gap like the batch query") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = Seq( // user 1: two sessions; user 2: one
      (1L, "2026-01-01 10:00:00"), (1L, "2026-01-01 10:10:00"),
      (1L, "2026-01-01 11:30:00"),
      (2L, "2026-01-01 09:00:00"))
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.sessionCounts(
      input.toDF().selectExpr("_1 AS user_id", "CAST(_2 AS TIMESTAMP) AS ts"))
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData(rows); q.processAllAvailable()
      val perUser = spark.table("sessions").groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(perUser === Map(1L -> 2L, 2L -> 1L))
    } finally q.stop()
  }
}

object StreamingSpec {
  val collected: scala.collection.mutable.ArrayBuffer[TokenSnapshot] =
    scala.collection.mutable.ArrayBuffer.empty
}
