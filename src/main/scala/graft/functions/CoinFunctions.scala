package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's canonical money parser (SURVEY §2.10 / C5).
  *
  * The reference stores prices as Cosmos coin strings — "100token" —
  * in plain string columns (x/common/types.go:43-47) and resets them to
  * `sdk.Coins{}.String()` == "" (x/indexer/handlers/marketplace.go:178,189).
  * Exact money math therefore needs a parse into (amount, denom); amounts
  * are arbitrary-precision integers → DecimalType(38,0), not double.
  * Pure regexp/cast expressions — codegen'd, no UDF.
  */
object CoinFunctions {

  private val AmountRe = "^(\\d+)"
  private val DenomRe = "^\\d+(\\D+.*)$"

  /** "100token" → 100 as decimal(38,0); null for "" / malformed. */
  def coinAmount(c: Column): Column =
    nullif(regexp_extract(c, AmountRe, 1), lit("")).cast("decimal(38,0)")

  /** "100token" → "token"; null for "" / malformed. */
  def coinDenom(c: Column): Column =
    nullif(regexp_extract(c, DenomRe, 1), lit(""))

  /** Full parse: struct(amount decimal(38,0), denom string). */
  def parseCoin(c: Column): Column =
    struct(coinAmount(c).as("amount"), coinDenom(c).as("denom"))

  /** Inverse — struct/pair back to the reference's string form; empty coins
    * render as "" exactly like sdk.Coins{}.String(). */
  def formatCoin(amount: Column, denom: Column): Column =
    when(amount.isNull || denom.isNull, lit(""))
      .otherwise(concat(amount.cast("string"), denom))
}
