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
  * key is one TokenState (bounded: a token's open offers/bids), and a
  * BURNED token's empty state is REMOVED from the store the moment it
  * folds empty (r20) — state size tracks LIVE tokens, never every
  * token the log has ever seen (a mint/burn-heavy log would otherwise
  * grow one dead entry per burn forever).
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
      // a BURNED token folds to the empty state — REMOVE it from the
      // state store instead of keeping a tombstone entry per
      // ever-seen token forever (unbounded state on a mint/burn-heavy
      // log; a later re-mint starts from empty either way, so the
      // emitted snapshots are identical)
      if (st1.nft.isEmpty && st1.offers.isEmpty && st1.bids.isEmpty)
        state.remove()
      else state.update(st1)
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
      // null-SAFE like the batch twin's `col =!= ""` (which drops
      // nulls): a decoded event missing token_id must not NPE the
      // stream where the batch fold proceeds
      .filter(e => e.tokenId != null && e.tokenId.nonEmpty)
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
