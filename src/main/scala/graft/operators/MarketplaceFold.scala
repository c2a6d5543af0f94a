package graft.operators

import graft.operators.MarketplaceModel._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The CDC fold — SURVEY §2.8. Replaces the reference's serialized
  * per-message CRUD loop (x/indexer/handlers/marketplace.go:100-426) with a
  * partition-parallel event-sourcing fold: shuffle once by token, replay each
  * token's events in cursor order through a pure state machine, emit the
  * final snapshot.
  *
  * Scale posture: ONE shuffle (hash by tokenId); the per-group sort is
  * in-memory but bounded by a single token's event count (a hot NFT sees
  * thousands of events, not billions — and AQE splits skewed partitions).
  * The same `step` function drives the streaming variant
  * (graft.streaming.MarketplaceStream) so batch backfill and online serving
  * can never diverge.
  */
object MarketplaceFold {

  /** One transition of the per-token state machine — each case mirrors one
    * arm of the reference handler (file:line cited per case). Unknown
    * message types are recorded-but-ignored, matching the reference's
    * failed-message semantics (x/indexer/indexer.go:264-298). */
  def step(st: TokenState, e: MarketplaceEvent): TokenState = e.msgType match {
    // marketplace.go:115-126 — INSERT nft, status Default
    case MsgType.MintNFT =>
      st.copy(nft = Some(NftRow(e.tokenId, e.denom, e.recipient, e.tokenUri,
        NftStatus.Default, "", "", "", "", None)))
    // marketplace.go:127-133 — DELETE nft (tombstone, not null-row)
    case MsgType.BurnNFT =>
      st.copy(nft = None)
    // marketplace.go:134-145 — UPDATE token_uri
    case MsgType.EditNFTMetadata =>
      st.mapNft(_.copy(tokenUri = e.tokenUri))
    // marketplace.go:146-161 — UPDATE owner
    case MsgType.TransferNFT =>
      st.mapNft(_.copy(ownerAddress = e.recipient))
    // marketplace.go:162-172 — status OnMarket + price + beneficiary
    case MsgType.PutNFTOnMarket =>
      st.mapNft(_.copy(status = NftStatus.OnMarket, price = e.price,
        sellerBeneficiary = e.beneficiary))
    // marketplace.go:173-183 — status Default, clear price/beneficiary
    case MsgType.RemoveNFTFromMarket =>
      st.mapNft(_.copy(status = NftStatus.Default, price = "",
        sellerBeneficiary = ""))
    // marketplace.go:184-201 — owner=buyer, status Default, clear price
    case MsgType.BuyNFT =>
      st.mapNft(_.copy(ownerAddress = e.recipient,
        status = NftStatus.Default, price = ""))
    // marketplace.go:202-214 — status OnAuction + auction fields
    case MsgType.PutNFTOnAuction =>
      st.mapNft(_.copy(status = NftStatus.OnAuction,
        buyoutPrice = e.buyoutPrice, openingPrice = e.openingPrice,
        sellerBeneficiary = e.beneficiary, timeToSell = e.timeToSell))
    // marketplace.go:215-231 — reset auction fields + DELETE bids
    case MsgType.RemoveNFTFromAuction =>
      resetAuction(st, newOwner = None)
    // marketplace.go:232-265 — buyout (event attr) ends auction, else bid
    case MsgType.MakeBidOnAuction =>
      if (e.attrs.contains(AttrKey.IsBuyout))
        resetAuction(st, newOwner = Some(e.sender))
      else st.copy(bids = BidRow(e.seq, e.sender, e.buyerBeneficiary,
        e.beneficiaryCommission, e.price, e.tokenId) :: st.bids)
    // marketplace.go:266-291 — owner=buyer + reset + delete bids
    case MsgType.BuyoutOnAuction =>
      resetAuction(st, newOwner = Some(e.recipient))
    // marketplace.go:292-317 — new owner comes from the emitted event;
    // missing attr is a handler error → no state change
    case MsgType.FinishAuction =>
      e.attrs.get(AttrKey.Owner) match {
        case Some(owner) => resetAuction(st, newOwner = Some(owner))
        case None => st
      }
    // marketplace.go:318-337 — INSERT offer, id from the emitted event
    case MsgType.MakeOffer =>
      e.attrs.get(AttrKey.OfferId) match {
        case Some(id) => st.copy(offers = st.offers.updated(id,
          OfferRow(id, e.sender, e.price, e.buyerBeneficiary,
            e.beneficiaryCommission, e.tokenId)))
        case None => st
      }
    // marketplace.go:338-367 — owner=offer.buyer + DELETE offer; unknown
    // offer id is a handler error → no state change
    case MsgType.AcceptOffer =>
      st.offers.get(offerId(e)) match {
        case Some(offer) =>
          st.mapNft(_.copy(ownerAddress = offer.buyer))
            .copy(offers = st.offers - offer.offerId)
        case None => st
      }
    // marketplace.go:368-385 — DELETE offer
    case MsgType.RemoveOffer =>
      st.copy(offers = st.offers - offerId(e))
    case _ => st
  }

  private def offerId(e: MarketplaceEvent): String =
    e.attrs.getOrElse(AttrKey.OfferId, "")

  /** Auction teardown shared by remove/buyout/finish/bid-buyout arms:
    * reset auction fields (marketplace.go:218-224 etc.), optionally assign
    * a new owner, and delete every bid for the token. */
  private def resetAuction(st: TokenState, newOwner: Option[String]): TokenState =
    st.mapNft { n =>
      n.copy(ownerAddress = newOwner.getOrElse(n.ownerAddress),
        status = NftStatus.Default, buyoutPrice = "", openingPrice = "",
        sellerBeneficiary = "", timeToSell = None)
    }.copy(bids = Nil)

  /** Pure replay of one token's events (must already be in cursor order). */
  def replay(events: Iterable[MarketplaceEvent]): TokenState =
    events.foldLeft(TokenState.empty)(step)

  /** `step` plus the reference's error verdict: which arms would have
    * returned a handler error (x/indexer/indexer.go:264-298 records the
    * message with failed=true and the error text; state is unchanged for
    * those arms, matching the per-message transaction). GORM's
    * zero-rows-matched updates are NOT errors — only the explicitly
    * error-returning paths are. */
  def stepWithError(st: TokenState, e: MarketplaceEvent)
      : (TokenState, Option[String]) = e.msgType match {
    case MsgType.FinishAuction if !e.attrs.contains(AttrKey.Owner) =>
      (st, Some("failed to find new owner")) // marketplace.go:295-297
    case MsgType.MakeOffer if !e.attrs.contains(AttrKey.OfferId) =>
      (st, Some(s"failed to find offer for token ${e.tokenId}")) // :323-325
    case MsgType.AcceptOffer if !st.offers.contains(offerId(e)) =>
      (st, Some(s"unknown offer ID: ${offerId(e)}")) // :346-348
    case t if !handledTypes.contains(t) =>
      (st, Some(s"no handler for route: $t")) // indexer.go:288-291
    case _ => (step(st, e), None)
  }

  private[graft] val handledTypes: Set[String] = Set(
    MsgType.MintNFT, MsgType.BurnNFT, MsgType.EditNFTMetadata,
    MsgType.TransferNFT, MsgType.PutNFTOnMarket, MsgType.RemoveNFTFromMarket,
    MsgType.BuyNFT, MsgType.PutNFTOnAuction, MsgType.RemoveNFTFromAuction,
    MsgType.MakeBidOnAuction, MsgType.BuyoutOnAuction, MsgType.FinishAuction,
    MsgType.MakeOffer, MsgType.AcceptOffer, MsgType.RemoveOffer,
    MsgType.CreateFungibleToken, MsgType.TransferFungibleTokens)

  /** Per-message verdict row — the `messages` table analog
    * (x/common/types.go:161-195: every message recorded, success or not). */
  case class MessageRow(seq: Long, msgType: String, tokenId: String,
      denom: String, failed: Boolean, error: String)

  /** Denom-keyed verdict step (the FT arms of the messages table) —
    * ONE definition for the batch [[messages]] path and the streaming
    * metrics path (graft.streaming.MsgMetrics.messageStream), so the
    * unknown-denom rule cannot drift between them. State is the
    * created flag (marketplace.go:386-413). */
  private[graft] def ftVerdictStep(created: Boolean, e: MarketplaceEvent)
      : (Boolean, Option[String]) = e.msgType match {
    case MsgType.CreateFungibleToken => (true, None)
    case MsgType.TransferFungibleTokens if !created =>
      (created, Some("failed to transfer fungible token: unknown denom"))
    case MsgType.TransferFungibleTokens => (created, None)
    case t if !handledTypes.contains(t) =>
      (created, Some(s"no handler for route: $t"))
    case _ => (created, None)
  }

  /** The messages table: every event, with failed/error computed by the
    * stateful replay (token-keyed arms) plus the denom-keyed FT check
    * (transfer against a never-created denom, marketplace.go:410-413).
    * Two disjoint slices, one hash shuffle each (token-keyed and
    * denom-keyed); both use the streaming secondary-sort shape, so memory
    * is O(state) per key on either path — a hot denom's history never
    * materializes in one heap. */
  def messages(events: Dataset[MarketplaceEvent]): DataFrame = {
    import events.sparkSession.implicits._
    val tokenVerdicts = events
      .filter(col("tokenId") =!= "")
      .repartition(col("tokenId"))
      .sortWithinPartitions(col("tokenId"), col("seq"))
      .mapPartitions { it =>
        // secondary-sort shape (see foldTokens): O(state) memory per token
        var curToken: String = null
        var st = TokenState.empty
        it.map { e =>
          if (e.tokenId != curToken) { curToken = e.tokenId; st = TokenState.empty }
          val (st1, err) = stepWithError(st, e)
          st = st1
          MessageRow(e.seq, e.msgType, e.tokenId, e.denom,
            err.isDefined, err.orNull)
        }
      }
    val ftVerdicts = events.filter(e => e.tokenId.isEmpty)
      .repartition(col("denom"))
      .sortWithinPartitions(col("denom"), col("seq"))
      .mapPartitions { it =>
        // same streaming secondary-sort as the token path: per-denom state
        // is one 'created' flag, never the group's event vector
        var curDenom: String = null
        var created = false
        it.map { e =>
          if (e.denom != curDenom) { curDenom = e.denom; created = false }
          val (created1, err) = ftVerdictStep(created, e)
          created = created1
          MessageRow(e.seq, e.msgType, e.tokenId, e.denom,
            err.isDefined, err.orNull)
        }
      }
    tokenVerdicts.unionByName(ftVerdicts).toDF()
  }

  /** Batch fold: event log → one TokenSnapshot per token.
    *
    * Secondary-sort shape: ONE hash shuffle on tokenId, then a spillable
    * partition sort by (tokenId, seq) — the cursor order the reference's
    * serialized loop guarantees (SURVEY §7.4.1) — and a streaming iterator
    * that folds consecutive same-token runs. Memory per token is O(state),
    * NOT O(events): a hot token with millions of events (the realistic
    * auction skew) never needs its event list in memory, unlike a
    * groupByKey+sort-in-group formulation. */
  def foldTokens(events: Dataset[MarketplaceEvent]): Dataset[TokenSnapshot] = {
    import events.sparkSession.implicits._
    events
      .filter(col("tokenId") =!= "")
      .repartition(col("tokenId"))
      .sortWithinPartitions(col("tokenId"), col("seq"))
      .mapPartitions { it =>
        new Iterator[TokenSnapshot] {
          private var cur: MarketplaceEvent =
            if (it.hasNext) it.next() else null
          override def hasNext: Boolean = cur != null
          override def next(): TokenSnapshot = {
            val tid = cur.tokenId
            var st = TokenState.empty
            while (cur != null && cur.tokenId == tid) {
              st = step(st, cur)
              cur = if (it.hasNext) it.next() else null
            }
            TokenSnapshot(tid, st.nft,
              st.offers.values.toSeq.sortBy(_.offerId), st.bids.reverse)
          }
        }
      }
  }

  /** nfts snapshot — burn tombstones yield no row (SURVEY §7.4.2). */
  def nfts(snap: Dataset[TokenSnapshot]): DataFrame =
    snap.filter(col("nft").isNotNull).select("nft.*")

  def offers(snap: Dataset[TokenSnapshot]): DataFrame =
    snap.select(explode(col("offers")).as("o")).select("o.*")

  def bids(snap: Dataset[TokenSnapshot]): DataFrame =
    snap.select(explode(col("bids")).as("b")).select("b.*")

  /** users fold — the findOrCreateUser analog (marketplace.go:49-89,104-112):
    * every address a message mentions becomes a user on first sight;
    * sequenceNumber advances once per signed message. Pure aggregation, no
    * per-row probe. */
  def users(events: Dataset[MarketplaceEvent]): DataFrame = {
    val addressCols = Seq("sender", "recipient", "beneficiary",
      "buyerBeneficiary")
    val e = events.toDF()
    val mentions = addressCols.map(c =>
      e.select(col(c).as("address"), col("seq"))
    ).reduce(_.unionAll(_)).filter(col("address") =!= "")
      .groupBy("address").agg(min("seq").as("firstSeenSeq"))
    val signed = e.filter(col("sender") =!= "")
      .groupBy(col("sender").as("address"))
      .agg(count(lit(1)).as("sequenceNumber"))
    mentions.join(signed, Seq("address"), "left")
      .na.fill(0L, Seq("sequenceNumber"))
  }

  /** fungible_tokens snapshot: first create wins per denom
    * (UNIQUE denom, types.go:98; marketplace.go:386-396). */
  def fungibleTokens(events: Dataset[MarketplaceEvent]): DataFrame = {
    val e = events.toDF()
    e.filter(col("msgType") === MsgType.CreateFungibleToken)
      .groupBy(col("denom"))
      .agg(min_by(struct(col("sender"), col("amount")), col("seq")).as("f"))
      .select(col("denom"), col("f.sender").as("ownerAddress"),
        col("f.amount").as("emissionAmount"))
  }

  /** fungible_token_transfers ledger: append-only, but a transfer against a
    * denom that was never created is a handler error and is dropped
    * (marketplace.go:410-413) — expressed as a semi join against the
    * created-denoms set (broadcast: the denom dimension is small). */
  def ftTransfers(events: Dataset[MarketplaceEvent]): DataFrame = {
    val e = events.toDF()
    val created = e.filter(col("msgType") === MsgType.CreateFungibleToken)
      .select(col("denom")).distinct()
    e.filter(col("msgType") === MsgType.TransferFungibleTokens)
      .join(broadcast(created), Seq("denom"), "left_semi")
      .select(col("seq"), col("sender").as("senderAddress"),
        col("recipient").as("recipientAddress"), col("denom"), col("amount"))
  }

  /** Everything at once — the analog of one full indexer pass: the event log
    * in, all five snapshot tables out. `snap` is computed once and shared. */
  def foldAll(events: Dataset[MarketplaceEvent])
      : Map[String, DataFrame] = {
    val snap = Materialize.pin(foldTokens(events))
    Map(
      "nfts" -> nfts(snap),
      "offers" -> offers(snap),
      "auction_bids" -> bids(snap),
      "users" -> users(events),
      "fungible_tokens" -> fungibleTokens(events),
      "fungible_token_transfers" -> ftTransfers(events))
  }

  /** Convenience for specs/demos: fold a local scenario. */
  def foldLocal(spark: SparkSession, events: Seq[MarketplaceEvent])
      : Map[String, DataFrame] = {
    import spark.implicits._
    foldAll(spark.createDataset(events))
  }
}
