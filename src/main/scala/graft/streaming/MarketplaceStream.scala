package graft.streaming

import graft.operators.MarketplaceFold
import graft.operators.MarketplaceModel._
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the CDC fold (SURVEY §2.9 P7): the indexer's online
  * path — messages arrive continuously, per-token state lives in the
  * streaming state store, every micro-batch emits the tokens whose state
  * changed.
  *
  * The transition function IS MarketplaceFold.step — one state machine,
  * two execution modes (batch backfill / online), so they cannot diverge.
  * The state store replaces the reference's Postgres row locks + LevelDB
  * cursor (x/indexer/cursor.go:5-18): checkpointing gives exactly-once
  * resume, per-key ordering is guaranteed by sorting each micro-batch's
  * events by seq (the cursor order).
  *
  * Scale: state is hash-partitioned by tokenId across executors; memory per
  * key is one TokenState (bounded: a token's open offers/bids), and
  * tombstoned tokens (burns with no recreate) stay as None until dropped by
  * an optional TTL — same posture as RocksDB-backed state stores in
  * production.
  */
object MarketplaceStream {

  /** Fold one micro-batch's worth of events for one token into the stored
    * state; emits the new snapshot (update-mode output). */
  private def updateToken(
      tokenId: String,
      events: Iterator[MarketplaceEvent],
      state: GroupState[TokenState]): Iterator[TokenSnapshot] = {
    val sorted = events.toVector.sortBy(_.seq)
    if (sorted.isEmpty) Iterator.empty
    else {
      val st0 = state.getOption.getOrElse(TokenState.empty)
      val st1 = sorted.foldLeft(st0)(MarketplaceFold.step)
      state.update(st1)
      Iterator.single(TokenSnapshot(tokenId, st1.nft,
        st1.offers.values.toSeq.sortBy(_.offerId), st1.bids.reverse))
    }
  }

  /** events stream → per-token snapshot updates. Works on any streaming
    * Dataset[MarketplaceEvent] (MemoryStream in tests, file/Kafka-shaped
    * sources in production). */
  def snapshotStream(events: Dataset[MarketplaceEvent])
      : Dataset[TokenSnapshot] = {
    import events.sparkSession.implicits._
    events
      .filter(_.tokenId.nonEmpty)
      .groupByKey(_.tokenId)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(updateToken)
  }

  /** Batch/stream equivalence helper for specs: the batch fold of all
    * events must equal the final streaming state after any micro-batch
    * split. */
  def batchReference(spark: SparkSession, events: Seq[MarketplaceEvent])
      : Map[String, TokenSnapshot] = {
    import spark.implicits._
    MarketplaceFold.foldTokens(spark.createDataset(events))
      .collect().map(s => s.tokenId -> s).toMap
  }
}
