package graft.queries

import graft.Tables
import graft.functions.{BinaryFunctions => B, CoinFunctions => C}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-visible surface for the scalar-function layer (SURVEY §2.10):
  * the coin parser and the binary/multimodal operators, exercised over the
  * standard test tables at benchmark scale. */
object PipelineQueries {

  /** q36 — the canonical money parser (C5): synthesize reference-style coin
    * strings from event values (empty string for the sub-10-cent rows, the
    * sdk.Coins{}.String() analog), parse back to (amount, denom).
    * The cents construction is floor(value*100), not round(...): floor over
    * an IEEE double is pure and engine-independent, while round's
    * decimal-rendering resolves .5 ties differently in Spark (HALF_UP on
    * BigDecimal) vs DuckDB (binary-double rounding).
    * The comparator surface casts amount decimal(38,0)→bigint: a pandas
    * round-trip renders Spark parquet decimals as `Decimal` objects but
    * DuckDB decimals as float64, so the *values* hash differently even when
    * identical (the r01/r02 q36 "hash fail" was exactly this). The parser
    * itself stays decimal(38,0) — CoinFunctionsSpec covers >2^63 amounts. */
  def q36ParseCoin(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(col("event_id"),
        when(col("value") < 0.1, lit(""))
          .otherwise(concat(floor(col("value") * 100).cast("long"),
            lit("token"))).as("coin"))
      .select(col("event_id"),
        C.coinAmount(col("coin")).cast("long").as("amount"),
        C.coinDenom(col("coin")).as("denom"))
      .orderBy("event_id")
      .limit(500)

  /** q37 — gzip/gunzip round-trip over document text (C10): per-language
    * totals of original vs compressed bytes plus a round-trip integrity
    * count. Rows-only check (no gzip in the oracle); the pair itself is
    * unit-tested. */
  def q37GzipRoundtrip(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("lang"), col("text").cast("binary").as("raw"))
      .withColumn("gz", B.gzip(col("raw")))
      .withColumn("rt", B.gunzip(col("gz")))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum(length(col("raw"))).as("raw_bytes"),
        sum(length(col("gz"))).as("gz_bytes"),
        sum(when(col("rt") === col("raw"), 1L).otherwise(0L)).as("rt_ok"))
      .orderBy("lang")

  /** q38 — multimodal pipeline (C11): deterministic synthetic media in a
    * seed-chosen FORMAT (png via ImageIO, tiff via the pure-JVM IFD
    * codec, svg via the pure-JVM rasterizer) keyed by part rows →
    * resize to the reference's two resolutions → format sniff →
    * content-key dedup histogram — the decode fan-in runs inside the
    * query, not just in unit tests. Rows-only check; per-codec
    * correctness is unit-tested (FunctionsSpec / Vp8Spec /
    * EnrichmentSpec). */
  def q38ImgPipeline(s: SparkSession, dir: String): DataFrame = {
    val res = array(B.defaultResolutions.map { case (w, h) =>
      struct(lit(w).as("w"), lit(h).as("h"))
    }: _*)
    Tables.load(s, dir, "part")
      .limit(200)
      // seed mod 50 → deliberate duplicate images across parts
      .select(col("p_partkey"),
        B.syntheticMediaCol(pmod(col("p_partkey"), lit(50)), lit(32),
          lit(24)).as("img"))
      .withColumn("r", explode(res))
      .withColumn("resized", B.imgResize(col("img"), col("r.w"), col("r.h")))
      .select(col("p_partkey"), col("r.w").as("w"), col("r.h").as("h"),
        // src_format proves the fan-in (png/tiff/svg all decoded);
        // resized output re-encodes PNG, like the reference's resizer
        B.imgFormat(col("img")).as("src_format"),
        B.imgFormat(col("resized")).as("format"),
        md5(col("resized")).as("content_md5"))
      .groupBy("src_format", "format", "w", "h")
      .agg(count(lit(1)).as("n_images"),
        countDistinct(col("content_md5")).as("n_distinct"))
      .orderBy("src_format", "format", "w", "h")
  }
}
