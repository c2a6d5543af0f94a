package graft.operators

import graft.queries.TextQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental gram-df store for exact-substring dedup (the q95 span
  * report / q96 redaction pair) — the form the Lee et al. pipeline
  * takes when the corpus grows by batches: the expensive corpus-wide
  * statistic is the per-gram distinct-document count, and because
  * document ids are globally unique, each batch's contribution is a
  * plain additive delta. The store accumulates deltas; nothing ever
  * re-scans the resident corpus (InvertedIndex.append's additive-stats
  * discipline, applied to dedup).
  *
  *  - [[append]] writes one batch's (gh, df) delta as a `batch=<id>`
  *    partition via dynamic partition overwrite — a REPLAYED batch id
  *    overwrites its own partition, so foreachBatch redelivery is
  *    idempotent by construction (no watermark bookkeeping needed).
  *  - [[dfTable]] is the read-side additive merge: sum(df) per gram
  *    over every delta partition. Two-phase aggregate; the only
  *    shuffle is on the gram key (raw gram string — uniform content
  *    hash distribution, bounded by l tokens).
  *  - [[compact]] folds the accumulated deltas into a single base
  *    partition through [[graft.sources.AtomicSwap]] (crash-safe
  *    two-rename swap), bounding file count; appends continue after.
  *  - [[spansFor]]/[[redactFor]] run the SAME island-merge and
  *    redaction cores as q95/q96 ([[TextQueries.mergeIslands]],
  *    [[TextQueries.redactWithFlags]]), flagging anchors against the
  *    merged store instead of a corpus-wide aggregate — so once every
  *    batch is appended, the incremental answers are row-identical to
  *    the batch queries on the union (spec-pinned).
  *
  * Scale posture: append cost is O(batch) — one gram explode + one
  * (gh, doc_id) dedup + one (gh) sum over the batch only. The df table
  * read merges deltas without touching document text; its size is the
  * DISTINCT gram vocabulary, not the corpus. Probing spans for a doc
  * set joins that set's anchors (raw-gram-keyed, uniform) against the
  * df-filtered gram keys — the q95 flag-back shape.
  */
object IncrementalSpans {

  val DefaultL = 5

  /** One batch's additive contribution: (gh, df) over the batch docs.
    * The per-doc gram dedup is fused into the shingle kernel (q95's r22
    * df-side shape): each document emits each gram once, so the count
    * IS the distinct-document count and the aggregate needs only one
    * exchange. */
  def gramDfDelta(docs: DataFrame, l: Int = DefaultL): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(explode(graft.functions.TextKernelExpressions
        .distinctWordShinglesFast(col("text"), l)).as("gh"))
      .groupBy("gh").agg(count(lit(1)).as("df"))

  /** Append one batch of NEW documents (ids must be globally unique —
    * re-appending a document would double-count its grams; replaying
    * the same `batchId` is safe and idempotent). */
  def append(docs: DataFrame, path: String, batchId: Long,
      l: Int = DefaultL): Unit =
    // per-write option, not a session-conf flip: a concurrent write on
    // the same session must never observe dynamic-overwrite mode
    gramDfDelta(docs, l)
      .withColumn("batch", lit(batchId))
      .write.partitionBy("batch")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(path)

  /** The merged corpus-wide gram-df table: sum of every delta. */
  def dfTable(spark: SparkSession, path: String): DataFrame = {
    graft.sources.AtomicSwap.recover(
      new org.apache.hadoop.fs.Path(path).getFileSystem(
        spark.sparkContext.hadoopConfiguration), path)
    spark.read.parquet(path).groupBy("gh").agg(sum("df").as("df"))
  }

  /** Fold all delta partitions into one base partition (file-count
    * bound); crash-safe via the shared two-rename swap. Replay
    * idempotency covers batches appended SINCE the last compact (a
    * folded partition no longer exists to be overwritten), so compact
    * only at points where redelivery of earlier batches is impossible —
    * after the streaming checkpoint commits, exactly when
    * [[graft.search.InvertedIndex]] advances its batch watermark. */
  def compact(spark: SparkSession, path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    graft.sources.AtomicSwap.rewrite(fs, path) { tmp =>
      spark.read.parquet(path).groupBy("gh").agg(sum("df").as("df"))
        .withColumn("batch", lit(-1L))
        .write.partitionBy("batch").parquet(tmp)
    }
  }

  /** Flagged anchors of `docs` against the store: positions whose gram
    * reaches `minDf` across everything appended so far. */
  def flaggedFor(docs: DataFrame, store: DataFrame, l: Int,
      minDf: Int): DataFrame =
    TextQueries.gramPositions(docs, l)
      .join(store.filter(col("df") >= minDf).select("gh"), Seq("gh"))
      .select("doc_id", "pos")

  /** q95's maximal-span report for `docs`, incremental-store edition. */
  def spansFor(docs: DataFrame, store: DataFrame, l: Int = DefaultL,
      minDf: Int = 2): DataFrame =
    TextQueries.mergeIslands(flaggedFor(docs, store, l, minDf), l)

  /** q96's redaction accounting for `docs`, incremental-store edition. */
  def redactFor(docs: DataFrame, store: DataFrame, l: Int = DefaultL,
      minDf: Int = 2): DataFrame =
    TextQueries.redactWithFlags(docs, flaggedFor(docs, store, l, minDf), l)
}
