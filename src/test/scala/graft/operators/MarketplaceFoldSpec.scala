package graft.operators

import graft.SparkSpec
import graft.operators.MarketplaceModel._
import org.apache.spark.sql.Row

/** Golden test: the reference's seed scenario (gen_marketplace_data.sh:17-203)
  * ported to an event fixture, folded, and asserted against the exact
  * snapshot state the reference's CRUD loop would leave in Postgres.
  * Unit tests below cover the arms the seed script skips (burn, edit,
  * accept/remove offer, missing-attr error paths).
  */
class MarketplaceFoldSpec extends SparkSpec {

  private val u1 = "cosmos1user1"
  private val u2 = "cosmos1user2"
  private val sb = "cosmos1sellerbeneficiary"
  private val bb = "cosmos1buyerbeneficiary"
  private val denom = "testdenom"

  private var seq = 0L
  private def next(): Long = { seq += 1; seq }

  private def mint(id: String, to: String) =
    MarketplaceEvent(next(), MsgType.MintNFT).copy(tokenId = id,
      denom = denom, sender = to, recipient = to,
      tokenUri = s"http://meta/$id")
  private def transfer(id: String, from: String, to: String) =
    MarketplaceEvent(next(), MsgType.TransferNFT).copy(tokenId = id,
      sender = from, recipient = to)
  private def putOnMarket(id: String, by: String, price: String) =
    MarketplaceEvent(next(), MsgType.PutNFTOnMarket).copy(tokenId = id,
      sender = by, price = price, beneficiary = sb)
  private def removeFromMarket(id: String, by: String) =
    MarketplaceEvent(next(), MsgType.RemoveNFTFromMarket).copy(tokenId = id,
      sender = by)
  private def buy(id: String, buyer: String) =
    MarketplaceEvent(next(), MsgType.BuyNFT).copy(tokenId = id,
      sender = buyer, recipient = buyer, buyerBeneficiary = bb)
  private def putOnAuction(id: String, by: String, opening: String,
      buyout: String = "") =
    MarketplaceEvent(next(), MsgType.PutNFTOnAuction).copy(tokenId = id,
      sender = by, openingPrice = opening, buyoutPrice = buyout,
      beneficiary = sb,
      timeToSell = Some(java.sql.Timestamp.valueOf("2026-01-01 00:10:00")))
  private def removeFromAuction(id: String, by: String) =
    MarketplaceEvent(next(), MsgType.RemoveNFTFromAuction).copy(tokenId = id,
      sender = by)
  private def bid(id: String, bidder: String, price: String,
      isBuyout: Boolean = false) =
    MarketplaceEvent(next(), MsgType.MakeBidOnAuction).copy(tokenId = id,
      sender = bidder, price = price, buyerBeneficiary = bb,
      beneficiaryCommission = "1",
      attrs = if (isBuyout) Map(AttrKey.IsBuyout -> "true") else Map.empty)
  private def buyout(id: String, buyer: String) =
    MarketplaceEvent(next(), MsgType.BuyoutOnAuction).copy(tokenId = id,
      sender = buyer, recipient = buyer)
  private def finishAuction(id: String, winner: Option[String]) =
    MarketplaceEvent(next(), MsgType.FinishAuction).copy(tokenId = id,
      sender = u1,
      attrs = winner.map(w => Map(AttrKey.Owner -> w)).getOrElse(Map.empty))
  private def offer(id: String, buyer: String, price: String, offerId: String) =
    MarketplaceEvent(next(), MsgType.MakeOffer).copy(tokenId = id,
      sender = buyer, price = price, buyerBeneficiary = bb,
      beneficiaryCommission = "1", attrs = Map(AttrKey.OfferId -> offerId))
  private def acceptOffer(id: String, by: String, offerId: String) =
    MarketplaceEvent(next(), MsgType.AcceptOffer).copy(tokenId = id,
      sender = by, attrs = Map(AttrKey.OfferId -> offerId))
  private def removeOffer(id: String, by: String, offerId: String) =
    MarketplaceEvent(next(), MsgType.RemoveOffer).copy(tokenId = id,
      sender = by, attrs = Map(AttrKey.OfferId -> offerId))
  private def burn(id: String, by: String) =
    MarketplaceEvent(next(), MsgType.BurnNFT).copy(tokenId = id, sender = by)
  private def edit(id: String, by: String, uri: String) =
    MarketplaceEvent(next(), MsgType.EditNFTMetadata).copy(tokenId = id,
      sender = by, tokenUri = uri)
  private def createFT(d: String, creator: String, amount: Long) =
    MarketplaceEvent(next(), MsgType.CreateFungibleToken).copy(denom = d,
      sender = creator, amount = amount)
  private def transferFT(d: String, from: String, to: String, amount: Long) =
    MarketplaceEvent(next(), MsgType.TransferFungibleTokens).copy(denom = d,
      sender = from, recipient = to, amount = amount)

  /** gen_marketplace_data.sh:17-203, trimmed to tokens 1-7 + the 3 FTs. */
  private def seedScenario(): Seq[MarketplaceEvent] = {
    seq = 0L
    (1 to 7).map(i => mint(s"TOKEN_$i", u1)) ++ Seq(
      transfer("TOKEN_1", u1, u2),                       // :28
      putOnMarket("TOKEN_2", u1, "100token"),            // :34
      removeFromMarket("TOKEN_2", u1),                   // :38
      putOnMarket("TOKEN_2", u1, "100token"),            // :44
      buy("TOKEN_2", u2),                                // :48
      putOnAuction("TOKEN_3", u1, "10token"),            // :54
      removeFromAuction("TOKEN_3", u1),                  // :58
      putOnAuction("TOKEN_3", u1, "10token", "100token"), // :64
      bid("TOKEN_3", u2, "50token"),                     // :68
      bid("TOKEN_3", u2, "110token", isBuyout = true),   // :72 (>= buyout)
      putOnAuction("TOKEN_4", u1, "10token", "100token"), // :78
      buyout("TOKEN_4", u2),                             // :82
      putOnAuction("TOKEN_5", u1, "10token", "100token"), // :88
      bid("TOKEN_5", u2, "50token"),                     // :92
      finishAuction("TOKEN_5", Some(u2)),                // :96
      putOnAuction("TOKEN_6", u1, "10token", "100token"), // :102
      bid("TOKEN_6", u2, "50token"),                     // :106
      offer("TOKEN_7", u2, "100token", "offer_1"),       // :112
      offer("TOKEN_3", u1, "200token", "offer_2"),       // :123
      putOnAuction("TOKEN_4", u2, "22token", "100token"), // :127 (new owner)
      createFT("terra", u1, 298765L),                    // :198
      createFT("bitcoin", u2, 194999L),                  // :200
      createFT("tugrik", u1, 9999L),                     // :202
      transferFT("terra", u1, u2, 1000L))
  }

  private def foldScenario(events: Seq[MarketplaceEvent])
      : Map[String, Map[String, Row]] = {
    val out = MarketplaceFold.foldLocal(spark, events)
    Map(
      "nfts" -> out("nfts").collect()
        .map(r => r.getAs[String]("tokenId") -> r).toMap,
      "offers" -> out("offers").collect()
        .map(r => r.getAs[String]("offerId") -> r).toMap,
      "bids" -> out("auction_bids").collect()
        .map(r => r.getAs[String]("tokenId") -> r).toMap,
      "fts" -> out("fungible_tokens").collect()
        .map(r => r.getAs[String]("denom") -> r).toMap)
  }

  test("seed scenario yields the reference's final snapshot state") {
    val state = foldScenario(seedScenario())
    val nfts = state("nfts")

    assert(nfts.size === 7)
    // TOKEN_1: transferred to user2.
    assert(nfts("TOKEN_1").getAs[String]("ownerAddress") === u2)
    assert(nfts("TOKEN_1").getAs[Int]("status") === NftStatus.Default)
    // TOKEN_2: bought by user2 — owner flips, price cleared, beneficiary
    // survives (the reference's buy arm only touches 3 columns).
    assert(nfts("TOKEN_2").getAs[String]("ownerAddress") === u2)
    assert(nfts("TOKEN_2").getAs[String]("price") === "")
    assert(nfts("TOKEN_2").getAs[String]("sellerBeneficiary") === sb)
    // TOKEN_3: buyout bid ended the auction — owner=bidder, fields reset.
    assert(nfts("TOKEN_3").getAs[String]("ownerAddress") === u2)
    assert(nfts("TOKEN_3").getAs[Int]("status") === NftStatus.Default)
    assert(nfts("TOKEN_3").getAs[String]("buyoutPrice") === "")
    // TOKEN_4: bought out by user2, then user2 re-auctioned it.
    assert(nfts("TOKEN_4").getAs[String]("ownerAddress") === u2)
    assert(nfts("TOKEN_4").getAs[Int]("status") === NftStatus.OnAuction)
    assert(nfts("TOKEN_4").getAs[String]("openingPrice") === "22token")
    // TOKEN_5: finish_auction handed it to the event-attr winner.
    assert(nfts("TOKEN_5").getAs[String]("ownerAddress") === u2)
    assert(nfts("TOKEN_5").getAs[Int]("status") === NftStatus.Default)
    // TOKEN_6: auction still live with one standing bid.
    assert(nfts("TOKEN_6").getAs[Int]("status") === NftStatus.OnAuction)
    assert(state("bids").keySet === Set("TOKEN_6"))
    assert(state("bids")("TOKEN_6").getAs[String]("price") === "50token")
    // TOKEN_7: untouched, one standing offer.
    assert(nfts("TOKEN_7").getAs[String]("ownerAddress") === u1)
    assert(state("offers").keySet === Set("offer_1", "offer_2"))
    assert(state("offers")("offer_2").getAs[String]("tokenId") === "TOKEN_3")
    // Fungible tokens.
    assert(state("fts").view.mapValues(_.getAs[Long]("emissionAmount")).toMap
      === Map("terra" -> 298765L, "bitcoin" -> 194999L, "tugrik" -> 9999L))
  }

  test("ft transfer ledger keeps valid transfers, drops unknown denoms") {
    seq = 0L
    val events = Seq(createFT("terra", u1, 10L),
      transferFT("terra", u1, u2, 5L), transferFT("nocoin", u1, u2, 7L))
    val out = MarketplaceFold.foldLocal(spark, events)
    val rows = out("fungible_token_transfers").collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("denom") === "terra")
  }

  test("burn after mint leaves no row; mint after burn recreates") {
    seq = 0L
    val gone = MarketplaceFold.foldLocal(spark,
      Seq(mint("T", u1), putOnMarket("T", u1, "5token"), burn("T", u1)))
    assert(gone("nfts").count() === 0)

    seq = 0L
    val back = MarketplaceFold.foldLocal(spark,
      Seq(mint("T", u1), burn("T", u1), mint("T", u2)))
    val row = back("nfts").collect().head
    assert(row.getAs[String]("ownerAddress") === u2)
  }

  test("updates on a burned/unminted token are no-ops (GORM no-row match)") {
    seq = 0L
    val out = MarketplaceFold.foldLocal(spark, Seq(
      transfer("GHOST", u1, u2), putOnMarket("GHOST", u1, "5token"),
      mint("T", u1), burn("T", u1), edit("T", u1, "http://new")))
    assert(out("nfts").count() === 0)
  }

  test("accept_offer flips owner and deletes the offer; unknown id no-ops") {
    seq = 0L
    val out = MarketplaceFold.foldLocal(spark, Seq(
      mint("T", u1),
      offer("T", u2, "10token", "o1"),
      acceptOffer("T", u1, "o1"),
      acceptOffer("T", u1, "o_unknown")))
    val nft = out("nfts").collect().head
    assert(nft.getAs[String]("ownerAddress") === u2)
    assert(out("offers").count() === 0)
  }

  test("remove_offer deletes only the named offer") {
    seq = 0L
    val out = MarketplaceFold.foldLocal(spark, Seq(
      mint("T", u1),
      offer("T", u2, "10token", "o1"), offer("T", u2, "20token", "o2"),
      removeOffer("T", u2, "o1")))
    val left = out("offers").collect()
    assert(left.map(_.getAs[String]("offerId")).toSeq === Seq("o2"))
  }

  test("finish_auction without the owner attr is a handler error → no-op") {
    seq = 0L
    val out = MarketplaceFold.foldLocal(spark, Seq(
      mint("T", u1), putOnAuction("T", u1, "1token"), bid("T", u2, "2token"),
      finishAuction("T", winner = None)))
    val nft = out("nfts").collect().head
    assert(nft.getAs[String]("ownerAddress") === u1)
    assert(nft.getAs[Int]("status") === NftStatus.OnAuction)
    assert(out("auction_bids").count() === 1)
  }

  test("every auction-ending arm clears all bids") {
    def bidsAfter(closer: String => MarketplaceEvent): Long = {
      seq = 0L
      val base = Seq(mint("T", u1), putOnAuction("T", u1, "1token", "9token"),
        bid("T", u2, "2token"), bid("T", u2, "3token"))
      MarketplaceFold.foldLocal(spark, base :+ closer("T"))("auction_bids")
        .count()
    }
    assert(bidsAfter(removeFromAuction(_, u1)) === 0)
    assert(bidsAfter(buyout(_, u2)) === 0)
    assert(bidsAfter(finishAuction(_, Some(u2))) === 0)
    assert(bidsAfter(bid(_, u2, "99token", isBuyout = true)) === 0)
  }

  test("fold is order-insensitive in input order (seq defines the order)") {
    val events = seedScenario()
    val shuffled = new scala.util.Random(7).shuffle(events)
    val a = foldScenario(events)
    val b = foldScenario(shuffled)
    assert(a("nfts").view.mapValues(_.toString).toMap
      === b("nfts").view.mapValues(_.toString).toMap)
    assert(a("offers").keySet === b("offers").keySet)
  }

  test("messages table records every event with the reference's error arms") {
    seq = 0L
    val events = Seq(
      mint("T", u1),                                    // ok
      finishAuction("T", winner = None),                // missing owner attr
      MarketplaceEvent(next(), MsgType.MakeOffer)
        .copy(tokenId = "T", sender = u2),              // missing offer id
      acceptOffer("T", u1, "nope"),                     // unknown offer
      MarketplaceEvent(next(), "exotic_msg")
        .copy(tokenId = "T", sender = u1),              // unknown route
      transferFT("ghostcoin", u1, u2, 5L),              // unknown denom
      createFT("realcoin", u1, 10L),                    // ok
      transferFT("realcoin", u1, u2, 5L))               // ok
    import spark.implicits._
    val msgs = MarketplaceFold.messages(spark.createDataset(events))
      .orderBy("seq").collect()
    assert(msgs.length === events.length) // every message recorded
    val failed = msgs.filter(_.getAs[Boolean]("failed"))
      .map(r => r.getAs[Long]("seq") -> r.getAs[String]("error")).toMap
    assert(failed.keySet === Set(2L, 3L, 4L, 5L, 6L))
    assert(failed(2L) === "failed to find new owner")
    assert(failed(5L) === "no handler for route: exotic_msg")
    assert(failed(6L).contains("unknown denom"))
  }

  test("users fold creates every mentioned address with signed-msg counts") {
    seq = 0L
    val events = Seq(mint("T", u1), transfer("T", u1, u2),
      putOnMarket("T", u1, "1token"))
    import spark.implicits._
    val users = MarketplaceFold.users(spark.createDataset(events)).collect()
      .map(r => r.getAs[String]("address") -> r.getAs[Long]("sequenceNumber"))
      .toMap
    assert(users.keySet === Set(u1, u2, sb))
    assert(users(u1) === 3L) // signed all three messages
  }
}
