package graft

import org.apache.spark.sql.types._

/** The reference's complete table catalog (SURVEY §1.3) as explicit Spark
  * schemas — the analog of x/common/types.go. Every GORM model embeds
  * gorm.Model (id, created_at, updated_at, deleted_at soft-delete); here
  * that is the `auditFields` prefix, with deleted_at expressed as a nullable
  * timestamp (tombstone semantics live in SnapshotStore.merge).
  *
  * Type mapping per SURVEY §1.4: unsigned Go ints → LongType; JSONB →
  * StringType raw (parse with from_json / VARIANT); Cosmos coin strings
  * stay StringType and parse exactly via CoinFunctions.parseCoin.
  */
object Schemas {

  private val auditFields = Seq(
    StructField("id", LongType, nullable = false),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType),
    StructField("deleted_at", TimestampType))

  /** txes — one row per transaction (types.go:133-159). */
  val txes: StructType = StructType(auditFields ++ Seq(
    StructField("hash", StringType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("index", LongType, nullable = false),
    StructField("code", LongType, nullable = false),
    StructField("data", BinaryType),
    StructField("log", StringType),    // JSONB
    StructField("info", StringType),
    StructField("gas_wanted", LongType),
    StructField("gas_used", LongType)))

  /** messages — every msg, success or failure (types.go:161-195). */
  val messages: StructType = StructType(auditFields ++ Seq(
    StructField("route", StringType),
    StructField("msg_type", StringType),
    StructField("signature", StringType), // JSONB
    StructField("signers", StringType),   // comma-joined (types.go:181-190)
    StructField("failed", BooleanType, nullable = false),
    StructField("error", StringType),
    StructField("tx_id", LongType)))      // FK → txes(id)

  /** nfts snapshot (types.go:35-53). */
  val nfts: StructType = StructType(auditFields ++ Seq(
    StructField("denom", StringType),
    StructField("token_id", StringType, nullable = false), // UNIQUE
    StructField("owner_address", StringType),              // FK → users
    StructField("token_uri", StringType),
    StructField("status", IntegerType),
    StructField("price", StringType),                      // coin string
    StructField("seller_beneficiary", StringType),
    StructField("buyout_price", StringType),
    StructField("opening_price", StringType),
    StructField("time_to_sell", TimestampType)))

  /** offers (types.go:65-84). */
  val offers: StructType = StructType(auditFields ++ Seq(
    StructField("offer_id", StringType),
    StructField("buyer", StringType),
    StructField("price", StringType),
    StructField("buyer_beneficiary", StringType),
    StructField("beneficiary_commission", StringType),
    StructField("token_id", StringType)))  // FK → nfts(token_id)

  /** auction_bids (types.go:86-93). */
  val auctionBids: StructType = StructType(auditFields ++ Seq(
    StructField("bidder_address", StringType),
    StructField("bidder_beneficiary", StringType),
    StructField("beneficiary_commission", StringType),
    StructField("price", StringType),
    StructField("token_id", StringType)))

  /** fungible_tokens (types.go:95-101). */
  val fungibleTokens: StructType = StructType(auditFields ++ Seq(
    StructField("owner_address", StringType),
    StructField("denom", StringType, nullable = false), // UNIQUE
    StructField("emission_amount", LongType)))

  /** fungible_token_transfers (types.go:103-109). */
  val fungibleTokenTransfers: StructType = StructType(auditFields ++ Seq(
    StructField("sender_address", StringType),
    StructField("recipient_address", StringType),
    StructField("fungible_token_id", LongType),
    StructField("amount", LongType)))

  /** users (types.go:111-131). */
  val users: StructType = StructType(auditFields ++ Seq(
    StructField("name", StringType),
    StructField("address", StringType, nullable = false), // UNIQUE
    StructField("balance", StringType),                   // sdk.Coins string
    StructField("account_number", LongType),
    StructField("sequence_number", LongType)))

  /** token_metadata document (ERC-721 + dwhData envelope,
    * tokenMetadataService/service.go:177-210). */
  val tokenMetadata: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("image", StringType),
    StructField("dwh_data", StructType(Seq(
      StructField("token_id", StringType, nullable = false),
      StructField("owner", StringType),
      StructField("url", StringType),
      StructField("last_updated", TimestampType),
      StructField("last_checked", TimestampType))))))

  /** Queue task payload TaskInfo{owner, token_id, url} + priority 1-4
    * (x/common/types.go:15-33). */
  val uriTask: StructType = StructType(Seq(
    StructField("owner", StringType),
    StructField("token_id", StringType, nullable = false),
    StructField("url", StringType),
    StructField("priority", IntegerType)))

  /** Declared FK edges (marketplace.go:470-507, indexer.go:158-159) — Spark
    * doesn't enforce constraints; these are the engine's documented join
    * keys (and what a Hasura-style layer would introspect). */
  val foreignKeys: Seq[(String, String, String, String)] = Seq(
    ("messages", "tx_id", "txes", "id"),
    ("nfts", "owner_address", "users", "address"),
    ("offers", "token_id", "nfts", "token_id"),
    ("auction_bids", "token_id", "nfts", "token_id"),
    ("fungible_tokens", "owner_address", "users", "address"),
    ("fungible_token_transfers", "sender_address", "users", "address"),
    ("fungible_token_transfers", "recipient_address", "users", "address"),
    ("fungible_token_transfers", "fungible_token_id", "fungible_tokens", "id"))
}
