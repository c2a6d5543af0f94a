package graft.streaming

import graft.operators.MarketplaceFold
import graft.operators.MarketplaceFold.MessageRow
import graft.operators.MarketplaceModel._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQueryListener}

/** Per-key state for the streaming verdict fold: token-keyed groups use
  * the marketplace state machine, denom-keyed groups the FT created
  * flag — one grouping, two disjoint key namespaces. Top-level and
  * public because the state-store encoder's generated code constructs
  * it (a nested private class fails Janino compilation). */
case class VerdictState(token: TokenState, ftCreated: Boolean)

/** The reference's Prometheus counter surface as data — `NumMsgs{status,
  * msg_type}` (x/common/metrics.go:7-49), incremented exactly as the
  * indexer does (x/indexer/handlers/marketplace.go:92-423):
  *
  *  - every message        → (Received, Common)        (marketplace.go:101)
  *  - every known route    → (Received, MsgX)          (per-arm entry)
  *  - every handled-OK msg → (Accepted, MsgX)          (per-arm exit; a
  *    handler error returns between the two, so failures stay Received)
  *  - unknown routes carry NO per-type series — they only reach the
  *    default-arm error after the Common increment.
  *
  * Three surfaces: [[counters]] (the batch matrix — one corpus pass),
  * [[messageStream]] + [[CounterAccumulator]] (the online path: verdicts
  * against LIVE state in the streaming state store, deltas merged with
  * foreachBatch replay safety), and [[EngineMetricsListener]] (the
  * engine-level scrape: per-batch progress the reference's /metrics
  * endpoint would export). MsgMetricsSpec pins batch/stream parity on a
  * golden scenario that exercises every failure arm.
  *
  * Scale posture: the matrix is ≤ 2×17+1 cells, so the only distributed
  * work is the verdict pass (one shuffle, [[MarketplaceFold.messages]]'s
  * plan) and a cell-count aggregate; accumulator merges are
  * driver-side O(cells), the Prometheus-registry analog.
  */
object MsgMetrics {

  /** Internal route → the reference's Prometheus msg_type label value
    * (metrics.go:16-33 — note MsgRemoveFromAuction, not
    * MsgRemoveNFTFromAuction: the label set is matched verbatim). */
  val labelOf: Map[String, String] = Map(
    MsgType.MintNFT -> "MsgMintNFT",
    MsgType.BurnNFT -> "MsgBurnNFT",
    MsgType.EditNFTMetadata -> "MsgEditNFTMetadata",
    MsgType.PutNFTOnMarket -> "MsgPutNFTOnMarket",
    MsgType.RemoveNFTFromMarket -> "MsgRemoveNFTFromMarket",
    MsgType.BuyNFT -> "MsgBuyNFT",
    MsgType.TransferNFT -> "MsgTransferNFT",
    MsgType.CreateFungibleToken -> "MsgCreateFungibleToken",
    MsgType.TransferFungibleTokens -> "MsgTransferFungibleTokens",
    MsgType.MakeOffer -> "MsgMakeOffer",
    MsgType.AcceptOffer -> "MsgAcceptOffer",
    MsgType.RemoveOffer -> "MsgRemoveOffer",
    MsgType.PutNFTOnAuction -> "MsgPutNFTOnAuction",
    MsgType.RemoveNFTFromAuction -> "MsgRemoveFromAuction",
    MsgType.MakeBidOnAuction -> "MsgMakeBidOnAuction",
    MsgType.BuyoutOnAuction -> "MsgBuyoutOnAuction",
    MsgType.FinishAuction -> "MsgFinishAuction")

  /** Counter matrix from verdict rows — the single definition both the
    * batch and streaming paths aggregate through. ONE projection emits
    * all three candidate increments per row (an array-explode, never a
    * union of three scans of the same subtree) and one groupBy counts
    * the cells. */
  def countersFromMessages(messages: DataFrame): DataFrame = {
    val lbl = element_at(typedLit(labelOf), col("msgType"))
    messages
      .select(explode(array(
        struct(lit("Received").as("status"), lit("Common").as("msg_type")),
        when(lbl.isNotNull,
          struct(lit("Received").as("status"), lbl.as("msg_type"))),
        when(lbl.isNotNull && !col("failed"),
          struct(lit("Accepted").as("status"), lbl.as("msg_type")))))
        .as("c"))
      .filter(col("c").isNotNull)
      .groupBy(col("c.status").as("status"), col("c.msg_type").as("msg_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Batch counter matrix for an event log (one full-history pass —
    * verdicts from [[MarketplaceFold.messages]]' stateful replay). */
  def counters(events: Dataset[MarketplaceEvent]): DataFrame =
    countersFromMessages(MarketplaceFold.messages(events))

  private def verdictGroup(key: String,
      events: Iterator[MarketplaceEvent],
      state: GroupState[VerdictState]): Iterator[MessageRow] = {
    val sorted = events.toVector.sortBy(_.seq)
    if (sorted.isEmpty) Iterator.empty
    else {
      var st = state.getOption.getOrElse(VerdictState(TokenState.empty, false))
      val out = sorted.map { e =>
        val err =
          if (e.tokenId.nonEmpty) {
            val (t1, err1) = MarketplaceFold.stepWithError(st.token, e)
            st = st.copy(token = t1)
            err1
          } else {
            val (c1, err1) = MarketplaceFold.ftVerdictStep(st.ftCreated, e)
            st = st.copy(ftCreated = c1)
            err1
          }
        MessageRow(e.seq, e.msgType, e.tokenId, e.denom,
          err.isDefined, err.orNull)
      }
      state.update(st)
      out.iterator
    }
  }

  /** Streaming verdict rows: the same state machine as the batch
    * messages table, but verdicts are computed against the LIVE state
    * store — an AcceptOffer whose MakeOffer arrived three micro-batches
    * ago is Accepted, exactly as the reference's online indexer counts
    * it (a per-batch stateless replay would call it failed). */
  def messageStream(events: Dataset[MarketplaceEvent])
      : Dataset[MessageRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e =>
        if (e.tokenId.nonEmpty) "t:" + e.tokenId else "d:" + e.denom)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(verdictGroup)
  }

  /** Driver-side counter registry for the streaming path: per-batch
    * verdict deltas merge additively; a re-delivered foreachBatch id is
    * a no-op (Spark re-runs failed batches — its delivery contract).
    * Batch ids are monotonic per query, so the replay guard is a single
    * high-water mark, not a set — state stays O(1) on an infinite
    * stream. In-memory like a Prometheus registry; ≤ 35 cells. */
  final class CounterAccumulator {
    private val cells =
      new java.util.concurrent.ConcurrentHashMap[(String, String), Long]()
    private val maxApplied =
      new java.util.concurrent.atomic.AtomicLong(Long.MinValue)

    /** Merge one micro-batch of [[messageStream]] output. A batch id is
      * marked applied only AFTER its deltas merge: if the collect
      * throws, Spark's retry of the same id must still count (marking
      * first would turn the retry into a skipped "replay" and drop the
      * batch's counters permanently). */
    def update(messages: DataFrame, batchId: Long): Unit = {
      if (batchId <= maxApplied.get()) return // replayed batch
      val deltas = countersFromMessages(messages).collect() // may throw
      synchronized {
        if (batchId <= maxApplied.get()) return
        deltas.foreach { r =>
          cells.merge((r.getString(0), r.getString(1)), r.getLong(2), _ + _)
        }
        maxApplied.updateAndGet(math.max(_, batchId))
      }
    }

    /** The current matrix as a DataFrame (the /metrics scrape). */
    def snapshot(spark: SparkSession): DataFrame = {
      import spark.implicits._
      import scala.jdk.CollectionConverters._
      cells.asScala.toSeq.map { case ((s, t), n) => (s, t, n) }
        .toDF("status", "msg_type", "n")
    }
  }

  /** Engine-level metrics: a StreamingQueryListener capturing per-batch
    * progress (rows in, batch id, event-time watermark) into a bounded
    * ring — the numbers the reference exports through its Prometheus
    * endpoint, exposed as a DataFrame for the same dashboards. */
  final class EngineMetricsListener(keep: Int = 1024)
      extends StreamingQueryListener {
    private val ring =
      new java.util.concurrent.ConcurrentLinkedDeque[
        (String, Long, Long, String)]()

    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val name = Option(p.name).getOrElse(p.id.toString)
      ring.addLast((name, p.batchId, p.numInputRows, p.timestamp))
      while (ring.size > keep) ring.pollFirst()
    }

    def progress(spark: SparkSession): DataFrame = {
      import spark.implicits._
      import scala.jdk.CollectionConverters._
      ring.asScala.toSeq
        .toDF("query", "batch_id", "num_input_rows", "ts")
    }
  }
}
