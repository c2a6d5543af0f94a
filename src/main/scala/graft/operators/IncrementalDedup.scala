package graft.operators

import graft.functions.TextFunctions.{fastLshBands, minhashJaccard}
import graft.functions.TextKernelExpressions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-duplicate dedup against a persisted signature store —
  * the form corpus dedup actually takes at 100 TB: nobody re-mines pairs
  * over the whole corpus when a batch arrives; the corpus keeps a
  * signature index and each incoming batch probes it.
  *
  *  1. batch → minhash signatures + LSH band keys (narrow, per-doc — the
  *     same q30 kernel, so incremental and batch dedup agree exactly);
  *  2. candidates = equi-join on the band key against the store; the
  *     batch side is tiny relative to the corpus, so with the store
  *     bucketed on the band key ([[graft.sources.SnapshotStore
  *     .writeBucketed]]) the probe shuffles ONLY the batch;
  *  3. candidates verify on full-signature estimated Jaccard (bands gate,
  *     signatures decide — LSH false positives die here);
  *  4. fresh docs' signature rows APPEND to the store; the store only
  *     ever grows by appends, never rewrites.
  *
  * Matches the batch pipeline by construction: same kernel, same band
  * layout, same threshold → findDups(new | old) equals the cross-split
  * subset of q30MinhashPairs(old ∪ new) (spec-asserted).
  *
  * Scope: this is BATCH-vs-STORE dedup. Docs within one batch are not
  * compared against each other — run the within-batch pair pipeline
  * (q30 shape) or exact dedup on the batch first if intra-batch
  * duplicates are possible; [[processBatch]] only guarantees that
  * nothing entering the store duplicates what was already there.
  */
object IncrementalDedup {
  /** q30's exact parameters — one shared shape for batch + incremental. */
  val K = 16
  val ShingleLen = 3
  val Bands = 8
  val RowsPerBand = 2

  /** (doc_id, sig, band) — one row per band per doc; the band hash value
    * already encodes the band index (hash(b, slice)), so one column is
    * both the blocking key and the shuffle key.
    *
    * localCheckpoint (not persist): the signature must materialize once
    * before the band explode references it (projection collapse would run
    * the kernel per consumer), but this runs once per micro-batch in
    * streaming ingest — checkpointed blocks are reclaimed by the
    * ContextCleaner when the frame goes out of scope, while persisted
    * plans would accumulate in the CacheManager forever. */
  def signatureRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        TextKernelExpressions.minhashSig(col("text"), K, ShingleLen)
          .as("sig"))
      .filter(col("sig").isNotNull)
      .localCheckpoint(eager = false)
      .select(col("doc_id"), col("sig"),
        explode(fastLshBands(col("sig"), Bands, RowsPerBand)).as("band"))

  /** Build the store from the existing corpus (one-time; production
    * bucketed on the band key so probes read it in place). The corpus
    * rows land in the `batch=-1` partition — every write carries a
    * batch id so replayed ingests are idempotent (see [[processBatch]]). */
  def initStore(docs: DataFrame, path: String): Unit =
    signatureRows(docs).withColumn("batch", lit(-1L))
      .write.partitionBy("batch").mode("overwrite").parquet(path)

  def loadStore(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Probe: batch docs that near-duplicate a stored doc at ≥ threshold →
    * (doc_id, dup_of, est_jaccard), earliest (min id) store match wins.
    * A store row under the SAME id never matches (a replayed batch must
    * not classify its own first-attempt append as a duplicate). */
  def findDups(batch: DataFrame, store: DataFrame,
      threshold: Double = 0.5): DataFrame =
    findDupsFromSigs(signatureRows(batch), store, threshold)

  /** Probe from precomputed signature rows (shared with [[processBatch]]
    * so the minhash kernel — the dominant per-batch cost — runs once). */
  def findDupsFromSigs(sigs: DataFrame, store: DataFrame,
      threshold: Double): DataFrame =
    sigs
      .join(store.select(col("doc_id").as("s_id"), col("sig").as("s_sig"),
        col("band")), Seq("band"))
      .filter(col("doc_id") =!= col("s_id"))
      .select(col("doc_id"), col("s_id"), col("sig"), col("s_sig"))
      // no distinct: multi-band candidate duplicates compute the same
      // estimate and cannot change the min_by answer — dropping the
      // dedup saves a full shuffle; the groupBy's map-side partial
      // aggregation absorbs the ≤Bands-fold fan-in
      .withColumn("est_jaccard", minhashJaccard(col("sig"), col("s_sig"), K))
      .filter(col("est_jaccard") >= threshold)
      .groupBy("doc_id")
      .agg(min_by(struct(col("s_id"), col("est_jaccard")), col("s_id"))
        .as("m"))
      .select(col("doc_id"), col("m.s_id").as("dup_of"),
        col("m.est_jaccard").as("est_jaccard"))

  /** Append the non-duplicate batch docs' signature rows to the store,
    * into the `batch=<batchId>` partition (replaying the same id
    * overwrites its own partition — idempotent). Returns the fresh-doc
    * frame (the rows a pipeline keeps). */
  def appendFresh(batch: DataFrame, dups: DataFrame,
      storePath: String, batchId: Long): DataFrame = {
    val fresh = batch.join(dups.select("doc_id"), Seq("doc_id"), "left_anti")
    writeBatchPartition(signatureRows(fresh),
      loadStore(batch.sparkSession, storePath), storePath, batchId)
    fresh
  }

  /** One batch partition written via dynamic partition overwrite —
    * shared with [[IncrementalImageDedup]] so the idempotence ritual
    * has exactly one definition. The overwrite mode rides a PER-WRITE
    * DataFrameWriter option, not a session-conf flip: mutating the
    * session conf around the write would race a concurrent writer on
    * the same session (its overwrite silently turning dynamic, or the
    * conf restored mid-write). Refuses a LEGACY batch-less store
    * loudly: writing `batch=<id>` directories next to root-level
    * parquet files would make the whole store unreadable (conflicting
    * partition depths) — rebuild flat stores with initStore before
    * incremental ingest. */
  private[operators] def writeBatchPartition(sigs: DataFrame,
      store: DataFrame, storePath: String, batchId: Long): Unit = {
    require(store.columns.contains("batch"),
      s"store at $storePath has the legacy flat layout (no batch " +
        "column); a partitioned write would corrupt it — rebuild the " +
        "store with initStore first")
    sigs.withColumn("batch", lit(batchId))
      .write.partitionBy("batch")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(storePath)
  }

  /** One ingest cycle — probe, append, report — with ONE signature pass
    * over the batch (findDups + appendFresh as separate calls each
    * recompute the kernel). Returns (dups, fresh); `dups` is
    * materialized (it gates the append).
    *
    * REPLAY-IDEMPOTENT, the [[IncrementalSpans.append]] contract:
    * `batchId` names the store partition (dynamic partition overwrite —
    * a foreachBatch redelivery overwrites its own rows instead of
    * double-appending), and the probe EXCLUDES the current batch's
    * partition so first-attempt appends cannot shadow the replay. */
  def processBatch(batch: DataFrame, store: DataFrame, storePath: String,
      batchId: Long, threshold: Double = 0.5): (DataFrame, DataFrame) = {
    // pin the batch: it feeds both the signature pass and the fresh
    // anti-join, and a streaming micro-batch frame is not guaranteed to
    // replay its rows on re-evaluation
    val b = batch.localCheckpoint(eager = false)
    val sigs = signatureRows(b).localCheckpoint(eager = false)
    val probeStore =
      if (store.columns.contains("batch"))
        store.filter(col("batch") =!= lit(batchId))
      else store
    val dups = findDupsFromSigs(sigs, probeStore, threshold)
      .localCheckpoint(eager = false)
    writeBatchPartition(
      sigs.join(dups.select("doc_id"), Seq("doc_id"), "left_anti"),
      store, storePath, batchId)
    val fresh = b.join(dups.select("doc_id"), Seq("doc_id"), "left_anti")
    (dups, fresh)
  }
}
