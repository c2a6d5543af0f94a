package graft.operators

import java.sql.Timestamp

/** Typed model of the marketplace event log and its snapshot tables — the
  * Scala analog of the reference's GORM structs (x/common/types.go:35-131)
  * plus the message surface the 17-arm handler folds
  * (x/indexer/handlers/marketplace.go:100-426).
  *
  * Design note (SURVEY §1.1): the reference mutates snapshot rows in place,
  * one message at a time. Here the event log is the source of truth and the
  * snapshots are a deterministic fold over it — the same end state, but
  * replayable, partition-parallel, and streaming-compatible.
  */
object MarketplaceModel {

  /** NFT status enum, x/marketplace NFTStatus* (marketplace.go:166,177,204). */
  object NftStatus {
    val Default = 0
    val OnMarket = 1
    val OnAuction = 2
  }

  /** Message/event types routed to the handler (marketplace.go:114-423). */
  object MsgType {
    val MintNFT = "mint_nft"
    val BurnNFT = "burn_nft"
    val EditNFTMetadata = "edit_nft_metadata"
    val TransferNFT = "transfer_nft"
    val PutNFTOnMarket = "put_nft_on_market"
    val RemoveNFTFromMarket = "remove_nft_from_market"
    val BuyNFT = "buy_nft"
    val PutNFTOnAuction = "put_nft_on_auction"
    val RemoveNFTFromAuction = "remove_nft_from_auction"
    val MakeBidOnAuction = "make_bid_on_auction"
    val BuyoutOnAuction = "buyout_on_auction"
    val FinishAuction = "finish_auction"
    val MakeOffer = "make_offer"
    val AcceptOffer = "accept_offer"
    val RemoveOffer = "remove_offer"
    val CreateFungibleToken = "create_fungible_token"
    val TransferFungibleTokens = "transfer_fungible_tokens"
  }

  /** Emitted-event attribute keys the fold needs beyond the message itself
    * (marketplace.go:235 isBuyout, :294 owner, :323 offer_id). */
  object AttrKey {
    val IsBuyout = "is_buyout"
    val Owner = "owner"
    val OfferId = "offer_id"
  }

  /** One decoded message + its emitted-event attributes.
    *
    * `seq` is the total order — the analog of the reference's cursor triple
    * (height, tx_index, msg_id) (x/indexer/cursor.go:5-9); callers encode it
    * as height*2^20 + txIndex*2^10 + msgId or any strictly increasing long.
    * Empty strings mean "field absent from this message type".
    */
  case class MarketplaceEvent(
      seq: Long,
      msgType: String,
      tokenId: String,
      denom: String,
      sender: String,
      recipient: String,
      tokenUri: String,
      price: String,
      buyoutPrice: String,
      openingPrice: String,
      beneficiary: String,
      buyerBeneficiary: String,
      beneficiaryCommission: String,
      timeToSell: Option[Timestamp],
      amount: Long,
      attrs: Map[String, String])

  object MarketplaceEvent {
    def apply(seq: Long, msgType: String): MarketplaceEvent =
      MarketplaceEvent(seq, msgType, tokenId = "", denom = "", sender = "",
        recipient = "", tokenUri = "", price = "", buyoutPrice = "",
        openingPrice = "", beneficiary = "", buyerBeneficiary = "",
        beneficiaryCommission = "", timeToSell = None, amount = 0L,
        attrs = Map.empty)
  }

  /** nfts snapshot row (x/common/types.go:35-53). */
  case class NftRow(
      tokenId: String,
      denom: String,
      ownerAddress: String,
      tokenUri: String,
      status: Int,
      price: String,
      sellerBeneficiary: String,
      buyoutPrice: String,
      openingPrice: String,
      timeToSell: Option[Timestamp])

  /** offers snapshot row (types.go:65-84); offerId originates from the
    * emitted event, not the message (marketplace.go:321-327). */
  case class OfferRow(
      offerId: String,
      buyer: String,
      price: String,
      buyerBeneficiary: String,
      beneficiaryCommission: String,
      tokenId: String)

  /** auction_bids snapshot row (types.go:86-93). */
  case class BidRow(
      seq: Long,
      bidderAddress: String,
      bidderBeneficiary: String,
      beneficiaryCommission: String,
      price: String,
      tokenId: String)

  /** fungible_tokens snapshot row (types.go:95-101). */
  case class FungibleTokenRow(
      denom: String,
      ownerAddress: String,
      emissionAmount: Long)

  /** fungible_token_transfers ledger row (types.go:103-109). */
  case class FtTransferRow(
      seq: Long,
      senderAddress: String,
      recipientAddress: String,
      denom: String,
      amount: Long)

  /** users snapshot row (types.go:111-131); accountNumber/sequenceNumber come
    * from a chain RPC in the reference (marketplace.go:541-548) — here
    * sequenceNumber counts messages the address signed (same monotonicity). */
  case class UserRow(
      address: String,
      firstSeenSeq: Long,
      sequenceNumber: Long)

  /** Complete per-token state after folding that token's events — the unit
    * the per-key state machine carries (batch fold and streaming
    * mapGroupsWithState share it). */
  case class TokenState(
      nft: Option[NftRow],
      offers: Map[String, OfferRow],
      bids: List[BidRow]) {
    def mapNft(f: NftRow => NftRow): TokenState =
      copy(nft = nft.map(f))
  }

  object TokenState {
    val empty: TokenState = TokenState(None, Map.empty, Nil)
  }

  /** Output shape of the token fold: one row per token, snapshots nested. */
  case class TokenSnapshot(
      tokenId: String,
      nft: Option[NftRow],
      offers: Seq[OfferRow],
      bids: Seq[BidRow])
}
