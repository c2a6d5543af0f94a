package graft.search

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted index — the storage layout that turns q77's
  * scan-time BM25 into an index probe (the text analog of
  * [[graft.similarity.IvfIndex]]: build once, probe many, read only the
  * slice a query needs).
  *
  *  - BUILD: one corpus scan → postings rows (w, doc_id, tf, dl), with
  *    the document length DENORMALIZED into each posting (the classic
  *    "norms in the index" trick: scoring never joins a doc-length
  *    table), written `partitionBy(bucket)` where bucket =
  *    pmod(xxhash64(w), nBuckets) — one directory per term-hash bucket.
  *    Corpus-level stats (N, avgdl) go to a one-row `_stats` sidecar.
  *  - SEARCH: hash the query terms (same xxhash64, evaluated through a
  *    one-row Spark job so the engine's own hash is the only
  *    implementation), read ONLY those buckets — `bucket IN (...)`
  *    prunes at the file listing, `w IN (...)` pushes into the parquet
  *    scan — and score Okapi BM25 with df derived from the pruned
  *    postings themselves. At 100 TB a q-term probe touches
  *    |terms|/nBuckets of the index instead of the corpus.
  *
  * Searching the index returns exactly q77's rows for the same terms
  * (spec-pinned): same constants, same 6-decimal rank key, same
  * tie-break.
  */
object InvertedIndex {

  /** docs: needs (doc_id, text). One scan; two small sidecar jobs. */
  def build(docs: DataFrame, path: String, nBuckets: Int = 64): Unit = {
    val postings = docs
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("double").as("dl"),
        explode(tokens(col("text"))).as("w"))
      .groupBy("doc_id", "dl", "w")
      .agg(count(lit(1)).cast("double").as("tf"))
      .withColumn("bucket", pmod(xxhash64(col("w")), lit(nBuckets.toLong)))
    postings.write.mode("overwrite").partitionBy("bucket").parquet(path)
    docs.agg(count(lit(1)).cast("double").as("n_docs"),
        avg(size(tokens(col("text")))).as("avgdl"))
      .withColumn("n_buckets", lit(nBuckets))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_stats")
  }

  /** BM25 (k1=1.2, b=0.75) top-k over the index for `terms`. */
  def search(spark: SparkSession, path: String, terms: Seq[String],
      k: Int = 20): DataFrame = {
    val st = spark.read.parquet(s"$path/_stats").head
    val nDocs = st.getAs[Double]("n_docs")
    val avgdl = st.getAs[Double]("avgdl")
    val nBuckets = st.getAs[Int]("n_buckets")
    import spark.implicits._
    // bucket ids via the engine's own xxhash64 — never a re-implementation
    // that could drift from the build-side hash
    val buckets = terms.toDF("w")
      .select(pmod(xxhash64(col("w")), lit(nBuckets.toLong)).as("b"))
      .collect().map(_.getLong(0)).distinct.toSeq
    val postings = spark.read.parquet(path)
      .filter(col("bucket").isin(buckets: _*)) // partition-pruned listing
      .filter(col("w").isin(terms: _*)) // pushed into the parquet scan
    val dfc = postings.groupBy("w").agg(count(lit(1)).cast("double").as("df"))
    val topk = postings.join(broadcast(dfc), "w")
      .withColumn("_idf",
        log((lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5))
          + lit(1.0)))
      .withColumn("_c",
        col("_idf") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / lit(avgdl))))
      .groupBy("doc_id").agg(round(sum(col("_c")), 6).as("_score"))
      .orderBy(col("_score").desc, col("doc_id")).limit(k)
    topk
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("_score").desc, col("doc_id"))).cast("long"))
      .select(col("rank"), col("doc_id"),
        format_string("%.3f", round(col("_score"), 3)).as("bm25"))
      .orderBy("rank")
  }
}
