package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-robust equi-join (SURVEY §4.2): the realistic skew in the reference's
  * domain is a hot token/user — one popular NFT collects thousands of bids
  * (x/indexer/handlers/marketplace.go:232-265), so a join keyed on token_id
  * puts one key's rows in one task. Two mitigations, composable:
  *
  *  1. AQE skew-join handling (enabled in Tables.configure) splits oversized
  *     post-shuffle partitions automatically — the default path.
  *  2. Explicit salting, for when the skewed side must ALSO aggregate per
  *     key (AQE can't split a single hash-agg key): spread each left key
  *     over `nSalts` sub-keys, replicate the right side per salt, join on
  *     (key, salt). Deterministic — the salt derives from a left id column.
  */
object SkewJoin {

  /** left ⋈ right on `key`, with the left side salted `nSalts` ways by
    * hashing `leftIdCol` (any column that distributes within a key group).
    * Result equals the plain inner equi-join, row for row. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      leftIdCol: String, nSalts: Int): DataFrame = {
    val salted = left.withColumn("_salt",
      pmod(xxhash64(col(leftIdCol)), lit(nSalts)).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(array((0 until nSalts).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
