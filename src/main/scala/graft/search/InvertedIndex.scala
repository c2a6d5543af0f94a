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

  /** Corpus stats kept ADDITIVE — every field merges by plain addition
    * on append, so index growth never rescans resident data. Three
    * counters, not two, for exact q77 parity in the presence of
    * null-text documents (which produce NO postings but DO count toward
    * idf's N): n_docs = count(*) over the batch (narrow column-pruned
    * scan, no tokenize), n_tok_docs = docs with non-null text (avg()'s
    * denominator in q77), total_tokens = sum(tf) over the pinned
    * postings (avg()'s numerator — `tokens` maps "" to [""], so empty
    * and null text diverge exactly as they do in q77). avgdl derives at
    * search as total/n_tok_docs — the identical division avg performs. */
  private def statsOf(docs: DataFrame,
      postings: DataFrame): (Double, Double, Double) = {
    val d = docs.agg(count(lit(1)).cast("double").as("n"),
      count(col("text")).cast("double").as("nt")).head
    val t = postings.agg(
      coalesce(sum(col("tf")), lit(0.0)).as("tot")).head // null on 0 rows
    (d.getDouble(0), d.getDouble(1), t.getDouble(0))
  }

  /** One-row sidecar rewrite. First write is plain (no readers yet);
    * every later rewrite goes through [[graft.sources.AtomicSwap]] — a
    * bare mode("overwrite") deletes before it writes, and a crash in
    * that window would leave the whole index unreadable. */
  private def writeStats(spark: SparkSession, path: String,
      nDocs: Double, nTokDocs: Double, totalTokens: Double, nBuckets: Int,
      lastBatch: Long): Unit = {
    import spark.implicits._
    def out(dir: String): Unit =
      Seq((nDocs, nTokDocs, totalTokens, nBuckets, lastBatch))
        .toDF("n_docs", "n_tok_docs", "total_tokens", "n_buckets",
          "last_batch")
        .coalesce(1).write.mode("overwrite").parquet(dir)
    val statsPath = new org.apache.hadoop.fs.Path(s"$path/_stats")
    val fs = statsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(statsPath))
      graft.sources.AtomicSwap.rewrite(fs, statsPath.toString)(out)
    else out(statsPath.toString)
  }

  /** Readers MUST come through here: completes any interrupted swap of
    * the index or its sidecar before the first read — the recovery in
    * AtomicSwap.rewrite alone is unreachable for a reader that throws
    * on the missing path first. */
  private def readStats(spark: SparkSession,
      path: String): org.apache.spark.sql.Row = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sources.AtomicSwap.recover(fs, path)
    graft.sources.AtomicSwap.recover(fs, s"$path/_stats")
    spark.read.parquet(s"$path/_stats").head
  }

  private def lastBatchOf(st: org.apache.spark.sql.Row): Long =
    if (st.schema.fieldNames.contains("last_batch"))
      st.getAs[Long]("last_batch")
    else -1L

  /** docs: needs (doc_id, text). ONE tokenizing corpus scan (the pinned
    * postings feed both the bucket write and the token-count fold; the
    * doc counters are a narrow no-tokenize aggregate). */
  def build(docs: DataFrame, path: String, nBuckets: Int = 64): Unit = {
    val postings = graft.operators.Materialize.pin(postingsOf(docs, nBuckets))
    try {
      postings.write.mode("overwrite").partitionBy("bucket").parquet(path)
      val (n, nt, tot) = statsOf(docs, postings)
      writeStats(docs.sparkSession, path, n, nt, tot, nBuckets, -1L)
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
    val st = readStats(spark, path)
    val watermark = lastBatchOf(st)
    if (batchId >= 0 && batchId <= watermark) return // replayed batch
    val nBuckets = st.getAs[Int]("n_buckets")
    val postings = graft.operators.Materialize.pin(
      postingsOf(docs, nBuckets))
    try {
      postings.write.mode("append").partitionBy("bucket").parquet(path)
      val (n, nt, tot) = statsOf(docs, postings)
      writeStats(spark, path, st.getAs[Double]("n_docs") + n,
        st.getAs[Double]("n_tok_docs") + nt,
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
    // recovery first: dataFiles() itself lists the live path
    val nBuckets = readStats(spark, path).getAs[Int]("n_buckets")
    val before = dataFiles()
    graft.sources.AtomicSwap.rewrite(fs, path) { tmp =>
      spark.read.parquet(path).repartition(nBuckets, col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(tmp)
      spark.read.parquet(s"$path/_stats").coalesce(1)
        .write.mode("overwrite").parquet(s"$tmp/_stats")
    }
    (before, dataFiles())
  }

  /** BM25 (k1=1.2, b=0.75) top-k over the index for `terms` — scoring
    * and ranking delegate to [[graft.queries.TextQueries.bm25Rank]], the
    * single definition q77 also ranks through. */
  def search(spark: SparkSession, path: String, terms: Seq[String],
      k: Int = 20): DataFrame = {
    val st = readStats(spark, path)
    val nDocs = st.getAs[Double]("n_docs")
    val nTokDocs =
      if (st.schema.fieldNames.contains("n_tok_docs"))
        st.getAs[Double]("n_tok_docs")
      else nDocs // pre-n_tok_docs index: no null-text docs existed
    val avgdl = st.getAs[Double]("total_tokens") / nTokDocs
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
    graft.queries.TextQueries.bm25Rank(postings, nDocs, avgdl, k)
  }
}
