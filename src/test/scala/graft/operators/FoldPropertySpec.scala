package graft.operators

import graft.SparkSpec
import graft.operators.MarketplaceModel._
import org.scalacheck.{Gen, rng}

/** Property-based fold invariants (SURVEY §5.2.3): random event sequences
  * through the pure state machine (`MarketplaceFold.replay`) — no Spark jobs
  * needed, the distributed path is covered by the golden/streaming specs and
  * shares this exact transition function. */
class FoldPropertySpec extends SparkSpec {

  private val users = Seq("u1", "u2", "u3")

  private def genEvent(seq: Long): Gen[MarketplaceEvent] = for {
    msg <- Gen.oneOf(
      MsgType.MintNFT, MsgType.BurnNFT, MsgType.TransferNFT,
      MsgType.EditNFTMetadata, MsgType.PutNFTOnMarket,
      MsgType.RemoveNFTFromMarket, MsgType.BuyNFT, MsgType.PutNFTOnAuction,
      MsgType.RemoveNFTFromAuction, MsgType.MakeBidOnAuction,
      MsgType.BuyoutOnAuction, MsgType.FinishAuction, MsgType.MakeOffer,
      MsgType.AcceptOffer, MsgType.RemoveOffer)
    u <- Gen.oneOf(users)
    r <- Gen.oneOf(users)
    oid <- Gen.oneOf("o1", "o2", "o3")
    buyout <- Gen.oneOf(true, false)
  } yield MarketplaceEvent(seq, msg).copy(tokenId = "T", sender = u,
    recipient = r, price = "5token",
    attrs = (msg match {
      case MsgType.MakeBidOnAuction if buyout => Map(AttrKey.IsBuyout -> "1")
      case MsgType.FinishAuction => Map(AttrKey.Owner -> r)
      case MsgType.MakeOffer | MsgType.AcceptOffer | MsgType.RemoveOffer =>
        Map(AttrKey.OfferId -> oid)
      case _ => Map.empty[String, String]
    }))

  private def sample(n: Int, seed: Long): Seq[MarketplaceEvent] = {
    val gen = Gen.sequence[Seq[MarketplaceEvent], MarketplaceEvent](
      (1 to n).map(i => genEvent(i.toLong)))
    gen.apply(Gen.Parameters.default, rng.Seed(seed)).get
  }

  private val seeds = 1L to 200L

  test("a row exists iff the last mint/burn lifecycle event is a mint") {
    seeds.foreach { s =>
      val events = sample(30, s)
      val st = MarketplaceFold.replay(events)
      val lastLife = events.reverse.find(e =>
        e.msgType == MsgType.MintNFT || e.msgType == MsgType.BurnNFT)
      val expectAlive = lastLife.exists(_.msgType == MsgType.MintNFT)
      assert(st.nft.isDefined === expectAlive, s"seed=$s")
    }
  }

  test("no bids survive once an auction-closing event follows the last bid") {
    // NOTE: burn is NOT a closer — the reference deletes only the nft row
    // on MsgBurnNFT (marketplace.go:127-133); bids are deleted only by the
    // three auction-ending arms + buyout-bids.
    val closers = Set(MsgType.RemoveNFTFromAuction, MsgType.BuyoutOnAuction,
      MsgType.FinishAuction)
    seeds.foreach { s =>
      val events = sample(40, s)
      val st = MarketplaceFold.replay(events)
      val lastBid = events.lastIndexWhere(e =>
        e.msgType == MsgType.MakeBidOnAuction &&
          !e.attrs.contains(AttrKey.IsBuyout))
      val closedAfter = events.drop(lastBid + 1).exists(e =>
        closers.contains(e.msgType) ||
          (e.msgType == MsgType.MakeBidOnAuction &&
            e.attrs.contains(AttrKey.IsBuyout)))
      if (lastBid >= 0 && closedAfter)
        assert(st.bids.isEmpty, s"seed=$s")
      if (lastBid >= 0 && !closedAfter && st.nft.isDefined)
        assert(st.bids.nonEmpty, s"seed=$s")
    }
  }

  test("replay is prefix-composable (incremental == batch)") {
    seeds.foreach { s =>
      val events = sample(50, s)
      val whole = MarketplaceFold.replay(events)
      val (a, b) = events.splitAt(events.length / 3)
      val incremental = b.foldLeft(MarketplaceFold.replay(a))(
        MarketplaceFold.step)
      assert(whole === incremental, s"seed=$s")
    }
  }

  test("offers map never holds an accepted/removed offer id") {
    seeds.foreach { s =>
      val events = sample(40, s)
      val st = MarketplaceFold.replay(events)
      // for each standing offer, the last event naming its id must be a
      // make_offer that happened while the token row existed
      st.offers.keySet.foreach { oid =>
        val last = events.reverse.find(e =>
          e.attrs.get(AttrKey.OfferId).contains(oid))
        assert(last.exists(_.msgType == MsgType.MakeOffer), s"seed=$s oid=$oid")
      }
    }
  }

  test("an erroring arm never mutates state (per-message transaction)") {
    seeds.foreach { s =>
      val events = sample(40, s)
      var st = TokenState.empty
      events.foreach { e =>
        val (st1, err) = MarketplaceFold.stepWithError(st, e)
        if (err.isDefined) assert(st1 === st, s"seed=$s event=$e")
        st = st1
      }
    }
  }

  test("step is a total function — no event sequence throws") {
    (1L to 500L).foreach { s =>
      val events = sample(60, s)
      MarketplaceFold.replay(events) // must not throw
    }
  }
}
