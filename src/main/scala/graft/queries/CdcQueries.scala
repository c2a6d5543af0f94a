package graft.queries

import graft.Tables
import graft.operators.{MarketplaceFold, MarketplaceModel}
import graft.operators.MarketplaceModel.{MarketplaceEvent, MsgType}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-visible surface for the CDC fold (SURVEY §2.8): maps the generic
  * `events` log deterministically onto marketplace messages and folds it to
  * the nfts snapshot. This is the operator the reference's whole indexer IS
  * (x/indexer/handlers/marketplace.go:100-426), exercised at benchmark scale;
  * exact arm-by-arm semantics are ScalaTest-verified against the ported seed
  * scenario (MarketplaceFoldSpec), so this query gets a rows-only check.
  */
object CdcQueries {

  /** events → MarketplaceEvent: event_id is the cursor order, tokens are
    * event_id mod 1000 (so every token sees a lifecycle of ~N/1000 events),
    * and the five generic event types map onto five fold arms. */
  def mapToMarketplace(s: SparkSession, dir: String)
      : Dataset[MarketplaceEvent] = {
    import s.implicits._
    Tables.load(s, dir, "events")
      .select(
        col("event_id").as("seq"),
        when(col("event_type") === "signup", MsgType.MintNFT)
          .when(col("event_type") === "click", MsgType.TransferNFT)
          .when(col("event_type") === "purchase", MsgType.PutNFTOnMarket)
          .when(col("event_type") === "view", MsgType.RemoveNFTFromMarket)
          .otherwise(MsgType.BurnNFT).as("msgType"),
        concat(lit("T"), pmod(col("event_id"), lit(1000))).as("tokenId"),
        lit("d").as("denom"),
        concat(lit("u"), col("user_id")).as("sender"),
        concat(lit("u"), pmod(col("user_id") + 7, lit(200))).as("recipient"),
        concat(lit("uri://"), col("event_id")).as("tokenUri"),
        // floor, not round: tie-free across engines (see q36ParseCoin)
        concat(floor(col("value") * 100).cast("long"), lit("token"))
          .as("price"),
        lit("").as("buyoutPrice"),
        lit("").as("openingPrice"),
        lit("").as("beneficiary"),
        lit("").as("buyerBeneficiary"),
        lit("").as("beneficiaryCommission"),
        lit(null).cast("timestamp").as("timeToSell"),
        lit(0L).as("amount"),
        map().cast("map<string,string>").as("attrs"))
      .as[MarketplaceEvent]
  }

  /** q35 — fold the mapped log to the nfts snapshot (latest state per token
    * with tombstones; the scale-shaped version of the golden-scenario spec). */
  def q35CdcFold(s: SparkSession, dir: String): DataFrame = {
    val snap = MarketplaceFold.foldTokens(mapToMarketplace(s, dir))
    MarketplaceFold.nfts(snap)
      .select(col("tokenId"), col("ownerAddress"), col("status"), col("price"))
      .orderBy("tokenId")
  }
}
