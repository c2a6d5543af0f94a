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

  private def postingsOf(docs: DataFrame, nBuckets: Int): DataFrame =
    docs
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("double").as("dl"),
        explode(tokens(col("text"))).as("w"))
      .groupBy("doc_id", "dl", "w")
      .agg(count(lit(1)).cast("double").as("tf"))
      .withColumn("bucket", pmod(xxhash64(col("w")), lit(nBuckets.toLong)))

  /** Corpus stats kept ADDITIVE — (n_docs, total_tokens) merge by plain
    * addition on append, so index growth never rescans the resident
    * corpus; avgdl is derived at search time (sum/count — the identical
    * division `avg` performs, so q77 parity is exact). Derived from the
    * (pinned) postings themselves — `tokens` keeps empty strings, so
    * every doc has ≥ 1 posting row and countDistinct(doc_id) is exact —
    * the corpus is never tokenized a second time. */
  private def statsFromPostings(postings: DataFrame): (Double, Double) = {
    val r = postings.agg(
      countDistinct(col("doc_id")).cast("double").as("n_docs"),
      sum(col("tf")).as("total_tokens")).head
    (r.getDouble(0), r.getDouble(1))
  }

  /** One-row sidecar rewrite. First write is plain (no readers yet);
    * every later rewrite goes through [[graft.sources.AtomicSwap]] — a
    * bare mode("overwrite") deletes before it writes, and a crash in
    * that window would leave the whole index unreadable. */
  private def writeStats(spark: SparkSession, path: String,
      nDocs: Double, totalTokens: Double, nBuckets: Int,
      lastBatch: Long): Unit = {
    import spark.implicits._
    def out(dir: String): Unit =
      Seq((nDocs, totalTokens, nBuckets, lastBatch))
        .toDF("n_docs", "total_tokens", "n_buckets", "last_batch")
        .coalesce(1).write.mode("overwrite").parquet(dir)
    val statsPath = new org.apache.hadoop.fs.Path(s"$path/_stats")
    val fs = statsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(statsPath))
      graft.sources.AtomicSwap.rewrite(fs, statsPath.toString)(out)
    else out(statsPath.toString)
  }

  private def lastBatchOf(st: org.apache.spark.sql.Row): Long =
    if (st.schema.fieldNames.contains("last_batch"))
      st.getAs[Long]("last_batch")
    else -1L

  /** docs: needs (doc_id, text). ONE corpus scan (the postings are
    * pinned and feed both the bucket write and the stats fold). */
  def build(docs: DataFrame, path: String, nBuckets: Int = 64): Unit = {
    val postings = graft.operators.Materialize.pin(postingsOf(docs, nBuckets))
    try {
      postings.write.mode("overwrite").partitionBy("bucket").parquet(path)
      val (n, tot) = statsFromPostings(postings)
      writeStats(docs.sparkSession, path, n, tot, nBuckets, -1L)
    } finally postings.unpersist()
  }

  /** Incremental ADD: the batch's postings append into their buckets and
    * the additive stats merge — resident postings are never rewritten or
    * re-read (the IvfIndex.append contract for text). Batch doc_ids must
    * be new; postings are per-(doc, term), so a re-sent doc would double
    * its tf — dedup upstream, as the snapshot pipeline does.
    *
    * `batchId` is the replay guard for streaming `foreachBatch` callers
    * (Spark re-runs a failed batch on restart — that is its delivery
    * contract): pass the foreachBatch batch id and a replayed batch is
    * skipped against the persisted high-watermark. Batch ids must be
    * monotonic, as foreachBatch's are. The postings append and the stats
    * rewrite are two commits; a crash BETWEEN them loses only the stats
    * of the in-flight batch, and because the watermark rides in _stats
    * the same batch replays whole on restart — the orphaned postings
    * from the half-applied attempt are the one divergence (single-writer
    * maintenance, same contract as AtomicSwap). */
  def append(docs: DataFrame, path: String, batchId: Long = -1L): Unit = {
    val spark = docs.sparkSession
    val st = spark.read.parquet(s"$path/_stats").head
    val watermark = lastBatchOf(st)
    if (batchId >= 0 && batchId <= watermark) return // replayed batch
    val nBuckets = st.getAs[Int]("n_buckets")
    val postings = graft.operators.Materialize.pin(
      postingsOf(docs, nBuckets))
    try {
      postings.write.mode("append").partitionBy("bucket").parquet(path)
      val (n, tot) = statsFromPostings(postings)
      writeStats(spark, path, st.getAs[Double]("n_docs") + n,
        st.getAs[Double]("total_tokens") + tot, nBuckets,
        math.max(batchId, watermark))
    } finally postings.unpersist()
  }

  /** Collapse append small files per bucket behind the crash-recovering
    * two-rename swap (single-writer — AtomicSwap's contract). Returns
    * (files before, after). */
  def compact(spark: SparkSession, path: String): (Long, Long) = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(): Long = {
      val it = fs.listFiles(hPath, true)
      var n = 0L
      while (it.hasNext) {
        val f = it.next().getPath.toString
        if (f.endsWith(".parquet") && !f.contains("_stats")) n += 1
      }
      n
    }
    val before = dataFiles()
    val nBuckets = spark.read.parquet(s"$path/_stats")
      .head.getAs[Int]("n_buckets")
    graft.sources.AtomicSwap.rewrite(fs, path) { tmp =>
      spark.read.parquet(path).repartition(nBuckets, col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(tmp)
      spark.read.parquet(s"$path/_stats").coalesce(1)
        .write.mode("overwrite").parquet(s"$tmp/_stats")
    }
    (before, dataFiles())
  }

  /** BM25 (k1=1.2, b=0.75) top-k over the index for `terms`. */
  def search(spark: SparkSession, path: String, terms: Seq[String],
      k: Int = 20): DataFrame = {
    val st = spark.read.parquet(s"$path/_stats").head
    val nDocs = st.getAs[Double]("n_docs")
    val avgdl = st.getAs[Double]("total_tokens") / nDocs
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
