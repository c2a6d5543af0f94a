package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded hamming-distance pairing — ONE definition of the pigeonhole
  * shape used by text SimHash (32-bit) and image dHash (64-bit)
  * near-dup detection: split each hash into `nBands` contiguous
  * `bandBits`-bit bands; any two hashes within hamming distance
  * `maxDist < nBands` must agree on at least one band (pigeonhole —
  * LOSSLESS, not approximate), so candidates meet on an equi-join of
  * the (band index, band value) key and the exact popcount filters.
  * No cross join at any scale; fan-out is nBands x rows, and the join
  * shuffles on a short band key.
  *
  * Bits above `nBands * bandBits` (when the bands don't cover the full
  * width) never make band keys DISAGREE for a within-distance pair, so
  * losslessness holds; they still count in the exact distance. */
object HammingBands {

  /** The band-key array for one hash: `nBands` structs of (band index,
    * band value) — ONE definition shared by the all-pairs join and the
    * incremental store probe, so the two can never band differently. */
  def bandKeys(hash: org.apache.spark.sql.Column, nBands: Int,
      bandBits: Int): org.apache.spark.sql.Column = {
    require(nBands * bandBits <= 64, "bands exceed 64 bits")
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    array((0 until nBands).map(b0 =>
      struct(lit(b0).as("b"),
        shiftright(hash, b0 * bandBits).bitwiseAND(lit(mask))
          .as("v"))): _*)
  }

  /** Top-k nearest hashes to `query` by exact hamming distance —
    * SIMILARITY SEARCH over the same hash space the dedup pairs use
    * (dHash/SimHash/audio fingerprints): one codegen scan computing
    * bit_count(xor), then a k-bounded TakeOrdered (a per-task heap of
    * k rows — the right plan when k is small and fixed, unlike the
    * corpus-sized cuts rankBoundary exists for). Ties break on id for
    * a deterministic, oracle-comparable order. */
  def knn(hashed: DataFrame, idCol: String, hashCol: String,
      query: Long, k: Int): DataFrame =
    hashed.filter(col(hashCol).isNotNull)
      .select(col(idCol),
        bit_count(col(hashCol).bitwiseXOR(lit(query))).cast("long").as("d"))
      .orderBy(col("d"), col(idCol))
      .limit(k)

  /** (a, b, d): all LEFT × RIGHT pairs within `maxDist` — the
    * TWO-SIDED banding for matches across distinct collections sharing
    * one hash space (cross-modal soundtrack↔video, probe-vs-corpus).
    * The side is carried STRUCTURALLY (a is always a left id, b always
    * a right id), so callers never encode it in key naming conventions;
    * unlike [[pairs]] there is no a<b cut — left and right are
    * different populations, not halves of one. Same banded equi-join,
    * no cross join; null hashes dropped on both sides. */
  def crossPairs(left: DataFrame, right: DataFrame, idCol: String,
      hashCol: String, nBands: Int, bandBits: Int,
      maxDist: Int): DataFrame = {
    require(nBands > maxDist,
      s"pigeonhole needs nBands ($nBands) > maxDist ($maxDist)")
    def banded(df: DataFrame, as: String, has: String) =
      df.filter(col(hashCol).isNotNull)
        .withColumn("band", explode(bandKeys(col(hashCol), nBands, bandBits)))
        .select(col(idCol).as(as), col(hashCol).as(has), col("band"))
    banded(left, "a", "ha").join(banded(right, "b", "hb"), Seq("band"))
      .select(col("a"), col("b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("d"))
      .filter(col("d") <= maxDist)
      .distinct()
  }

  /** (a, b, d): unordered id pairs (a < b) within `maxDist`, with the
    * exact hamming distance. `hashed` must carry `idCol` and a LongType
    * `hashCol`; null hashes are dropped. */
  def pairs(hashed: DataFrame, idCol: String, hashCol: String,
      nBands: Int, bandBits: Int, maxDist: Int): DataFrame = {
    require(nBands > maxDist,
      s"pigeonhole needs nBands ($nBands) > maxDist ($maxDist)")
    val hs = hashed.filter(col(hashCol).isNotNull)
    val banded = hs.withColumn("band",
      explode(bandKeys(col(hashCol), nBands, bandBits)))
    val a = banded.select(col(idCol).as("a"), col(hashCol).as("ha"),
      col("band"))
    val b = banded.select(col(idCol).as("b"), col(hashCol).as("hb"),
      col("band"))
    a.join(b, Seq("band"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("d"))
      .filter(col("d") <= maxDist)
      .distinct()
  }
}
