package graft.streaming

import graft.SparkSpec
import graft.operators.MarketplaceFold
import graft.operators.MarketplaceModel._
import org.apache.spark.sql.DataFrame

/** NumMsgs{status, msg_type} parity: the counter matrix must count
  * exactly as the reference's per-arm increments do
  * (marketplace.go:92-423), on a scenario that drives every failure
  * arm — and the streaming accumulation must equal the batch matrix
  * under any micro-batch split, including verdicts that depend on
  * state carried ACROSS batches. */
class MsgMetricsSpec extends SparkSpec {

  private var seq = 0L
  private def next(): Long = { seq += 1; seq }
  private def ev(t: String, tokenId: String = "", denom: String = "",
      attrs: Map[String, String] = Map.empty) =
    MarketplaceEvent(next(), t).copy(tokenId = tokenId, denom = denom,
      sender = "u1", recipient = "u2", attrs = attrs)

  /** Every failure arm once, plus enough successes to tell the two
    * statuses apart:
    *  - mint/transfer T1: OK
    *  - MakeOffer T1 WITH id, AcceptOffer T1 same id: OK (stateful)
    *  - AcceptOffer T1 unknown id: FAILED (stateful)
    *  - MakeOffer T2 WITHOUT id: FAILED
    *  - FinishAuction T2 without owner attr: FAILED
    *  - unknown route on T2: FAILED (no per-type series)
    *  - FT create d1 + transfer d1: OK; transfer d2 (never created):
    *    FAILED */
  private def scenario(): Seq[MarketplaceEvent] = {
    seq = 0L
    Seq(
      ev(MsgType.MintNFT, tokenId = "T1"),
      ev(MsgType.TransferNFT, tokenId = "T1"),
      ev(MsgType.MakeOffer, tokenId = "T1",
        attrs = Map(AttrKey.OfferId -> "o1")),
      ev(MsgType.AcceptOffer, tokenId = "T1",
        attrs = Map(AttrKey.OfferId -> "o1")),
      ev(MsgType.AcceptOffer, tokenId = "T1",
        attrs = Map(AttrKey.OfferId -> "nope")),
      ev(MsgType.MakeOffer, tokenId = "T2"),
      ev(MsgType.FinishAuction, tokenId = "T2"),
      ev("unknown_route", tokenId = "T2"),
      ev(MsgType.CreateFungibleToken, denom = "d1"),
      ev(MsgType.TransferFungibleTokens, denom = "d1"),
      ev(MsgType.TransferFungibleTokens, denom = "d2"))
  }

  private def matrix(df: DataFrame): Map[(String, String), Long] =
    df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("batch counter matrix increments exactly as the reference's " +
    "per-arm Received/Accepted/Common counters") {
    import spark.implicits._
    val got = matrix(MsgMetrics.counters(spark.createDataset(scenario())))
    val expected = Map(
      ("Received", "Common") -> 11L, // every message, unknown included
      ("Received", "MsgMintNFT") -> 1L,
      ("Accepted", "MsgMintNFT") -> 1L,
      ("Received", "MsgTransferNFT") -> 1L,
      ("Accepted", "MsgTransferNFT") -> 1L,
      ("Received", "MsgMakeOffer") -> 2L,
      ("Accepted", "MsgMakeOffer") -> 1L, // T2's has no offer_id
      ("Received", "MsgAcceptOffer") -> 2L,
      ("Accepted", "MsgAcceptOffer") -> 1L, // unknown id fails
      ("Received", "MsgFinishAuction") -> 1L, // no owner attr: never OK
      ("Received", "MsgCreateFungibleToken") -> 1L,
      ("Accepted", "MsgCreateFungibleToken") -> 1L,
      ("Received", "MsgTransferFungibleTokens") -> 2L,
      ("Accepted", "MsgTransferFungibleTokens") -> 1L) // d2 unknown
    assert(got === expected)
  }

  test("streaming accumulation equals the batch matrix under a split " +
    "that carries verdict state across micro-batches, and a replayed " +
    "batch id is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = scenario()
    val acc = new MsgMetrics.CounterAccumulator
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[MarketplaceEvent]
    var lastBatch: (DataFrame, Long) = null
    val q = MsgMetrics.messageStream(input.toDS())
      .writeStream.outputMode("append")
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[
           graft.operators.MarketplaceFold.MessageRow], id: Long) =>
        val df = batch.toDF().cache()
        df.count()
        lastBatch = (df, id)
        acc.update(df, id)
      }.start()
    try {
      // split INSIDE T1's offer lifecycle: MakeOffer(o1) lands in batch
      // 0, AcceptOffer(o1) in batch 1 — only live state can accept it
      events.grouped(3).foreach { g =>
        input.addData(g); q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = matrix(acc.snapshot(spark))
    val batch = matrix(MsgMetrics.counters(spark.createDataset(events)))
    assert(streamed === batch)
    // a cross-batch accept really happened (would fail per-batch replay)
    assert(streamed(("Accepted", "MsgAcceptOffer")) === 1L)

    // foreachBatch redelivers a failed batch with the SAME id: no-op
    acc.update(lastBatch._1, lastBatch._2)
    assert(matrix(acc.snapshot(spark)) === batch)
  }

  test("a batch whose merge FAILS is not marked applied: Spark's retry " +
    "of the same id still counts (mark-after-merge, not before)") {
    import spark.implicits._
    val acc = new MsgMetrics.CounterAccumulator
    val good = MarketplaceFold.messages(spark.createDataset(scenario()))
      .toDF()
    // a malformed batch (missing the verdict columns) blows up inside
    // update, BEFORE anything merges
    intercept[Exception] {
      acc.update(Seq(1).toDF("not_a_message"), 0L)
    }
    assert(acc.snapshot(spark).count() === 0)
    // the retry with the SAME id must apply — a mark-before-merge
    // guard would call it a replay and drop the batch forever
    acc.update(good, 0L)
    val after = matrix(acc.snapshot(spark))
    assert(after.nonEmpty)
    // and the genuine replay of the now-applied id is a no-op, as is
    // any EARLIER id (the guard is a high-water mark, O(1) state)
    acc.update(good, 0L)
    acc.update(good, -5L)
    assert(matrix(acc.snapshot(spark)) === after)
  }

  test("the engine listener exports per-batch progress rows (the " +
    "/metrics scrape surface)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val listener = new MsgMetrics.EngineMetricsListener
    spark.streams.addListener(listener)
    try {
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[MarketplaceEvent]
      val q = MsgMetrics.messageStream(input.toDS())
        .writeStream.outputMode("append").format("noop").start()
      try {
        scenario().grouped(4).foreach { g =>
          input.addData(g); q.processAllAvailable()
        }
      } finally q.stop()
      // listener events arrive asynchronously
      var rows = 0L
      val deadline = System.currentTimeMillis() + 10000
      while (rows < 11 && System.currentTimeMillis() < deadline) {
        Thread.sleep(100)
        rows = listener.progress(spark)
          .agg(org.apache.spark.sql.functions.coalesce(
            org.apache.spark.sql.functions.sum("num_input_rows"),
            org.apache.spark.sql.functions.lit(0L)))
          .head.getLong(0)
      }
      assert(rows === 11L, "listener missed input rows")
    } finally spark.streams.removeListener(listener)
  }
}
