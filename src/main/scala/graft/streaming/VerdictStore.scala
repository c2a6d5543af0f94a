package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, incrementally-maintained QUALITY-VERDICT store (r19) —
  * the missing middle of the corpus-serving loop: batch q217 verdicts
  * initialize it, frozen-artifact-scored arrivals UPSERT into it, and
  * downstream builds (the corpus manifest) read keepers from the
  * STORE instead of recomputing the ensemble.
  *
  * Epoch semantics (the CCNet split): the INIT epoch's verdicts come
  * from the batch ensemble trained on the init corpus (epoch 0);
  * every LATER arrival is scored against the FROZEN artifacts of that
  * epoch ([[CorpusStreams.verdictStream]]'s row-local scorer —
  * arriving data is unseen by construction, so the frozen model
  * scores all of it) and ingests under its batch's EPOCH NUMBER. The
  * stored epoch IS the merge sequence: the HIGHEST-epoch verdict per
  * doc_id wins, so a crash-recovery REPLAY of an older batch can
  * never regress a newer rescore (the real latest-wins rule — a
  * constant delta-wins flag would be last-call-wins). A batch
  * carrying one doc_id twice is rejected loudly: two same-epoch
  * verdicts for one doc have no deterministic winner.
  *
  * Scale posture: one merge shuffle on doc_id per ingest batch,
  * bounded by |store| + |batch|; the duplicate probe is one bounded
  * aggregate over the batch; the store rewrites through
  * [[graft.sources.AtomicSwap]] (readers recover); no driver state.
  */
object VerdictStore {

  /** The verdict-row schema both epochs produce (the q217 shape);
    * the store adds the `epoch` provenance/sequence column. */
  val Columns: Seq[String] = Seq("doc_id", "ratios_ok", "fences_ok",
    "clf_ok", "lm_ok", "verdict", "first_fail")

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def checked(rows: DataFrame, at: String): DataFrame = {
    require(rows.columns.toSeq.sorted == Columns.sorted,
      s"$at: verdict rows need columns ${Columns.mkString(", ")} — " +
        s"got ${rows.columns.mkString(", ")}")
    rows.select(Columns.map(col): _*)
  }

  /** Epoch-sequenced latest-wins that KEEPS winning tombstones in the
    * stored dataset — [[graft.sources.SnapshotStore
    * .mergeKeepTombstones]], which also normalizes a legacy store
    * missing the `deleted` column (rows default to live). */
  private def latestWins(cur: DataFrame, delta: DataFrame): DataFrame =
    graft.sources.SnapshotStore.mergeKeepTombstones(
      cur, delta, Seq("doc_id"), "epoch")

  /** The highest epoch the store has seen (0 for a fresh init) — the
    * floor new epochs must exceed so stale high-epoch rows can never
    * outrank fresh writes after a restart. Bounded: one aggregate. */
  def maxEpoch(spark: SparkSession, path: String): Long = {
    val fs = fsOf(spark, path)
    graft.sources.AtomicSwap.recover(fs, path)
    val raw = graft.sources.SnapshotStore.read(spark, path)
    if (!raw.columns.contains("epoch")) 0L // legacy store: all epoch 0
    else Option(raw.agg(max(col("epoch"))).head.get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
  }

  /** Create the store from the init epoch's batch verdict rows
    * (stored as epoch 0). */
  def init(spark: SparkSession, path: String, rows: DataFrame): Unit =
    graft.sources.SnapshotStore.write(
      checked(rows, "init").withColumn("epoch", lit(0L))
        .withColumn("deleted", lit(false)), path)

  /** Upsert one scored batch under `epoch` (> 0): per doc_id the
    * HIGHEST stored epoch wins, so replaying an older batch is a
    * no-op for docs a newer epoch already rescored or forgot.
    * Rewrites the store atomically; returns the batch's row count. */
  def ingest(spark: SparkSession, path: String,
      scored: DataFrame, epoch: Long): Long = {
    require(epoch > 0, s"ingest epochs start at 1 (init is 0): $epoch")
    val delta = checked(scored, "ingest")
      .withColumn("epoch", lit(epoch))
      .withColumn("deleted", lit(false)).localCheckpoint(true)
    val dup = delta.groupBy("doc_id").count()
      .filter(col("count") > 1).limit(1).collect()
    require(dup.isEmpty, s"ingest: doc_id ${dup.head.get(0)} appears " +
      "more than once in this batch — two same-epoch verdicts have " +
      "no deterministic winner (dedupe upstream)")
    val fs = fsOf(spark, path)
    graft.sources.AtomicSwap.recover(fs, path)
    val next = latestWins(
      graft.sources.SnapshotStore.read(spark, path), delta)
      .localCheckpoint(true) // pinned before the swap replaces inputs
    graft.sources.AtomicSwap.rewrite(fs, path)(tmp =>
      graft.sources.SnapshotStore.write(next, tmp))
    delta.count()
  }

  /** The live verdict rows — tombstoned docs filtered (they stay in
    * the stored dataset as the replay fence until a compaction with
    * a proven epoch floor would remove them). Tolerates a legacy
    * store with no `deleted` column (all rows live). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val fs = fsOf(spark, path)
    graft.sources.AtomicSwap.recover(fs, path)
    val raw = graft.sources.SnapshotStore.read(spark, path)
    (if (raw.columns.contains("deleted"))
      raw.filter(!col("deleted")).drop("deleted")
    else raw)
  }

  /** RIGHT-TO-BE-FORGOTTEN: tombstone the given doc_ids under
    * `epoch`. The tombstone PERSISTS in the stored dataset (read()
    * filters it), so a crash-recovery replay of an OLDER scoring
    * batch can never resurrect a forgotten doc — the fence outlives
    * the forget. Returns how many live rows the forget removed. Keys
    * are a DataFrame so a person-sized set and a ten-million-row
    * purge ride the same semi-join, never a driver literal. */
  def forget(spark: SparkSession, path: String, ids: DataFrame,
      epoch: Long): Long = {
    require(epoch > 0, s"forget epochs start at 1 (init is 0): $epoch")
    require(ids.columns.length == 1, "forget: ids must be one column")
    val fs = fsOf(spark, path)
    graft.sources.AtomicSwap.recover(fs, path)
    val cur0 = graft.sources.SnapshotStore.read(spark, path)
    val cur = // legacy stores (no deleted column) are all-live
      if (cur0.columns.contains("deleted")) cur0
      else cur0.withColumn("deleted", lit(false))
    val key = ids.columns.head
    val doomed = cur.filter(col("deleted") === false)
      .join(ids, cur("doc_id") === ids(key), "left_semi")
      .localCheckpoint(true)
    val n = doomed.count()
    if (n > 0) {
      // a tombstone at an epoch ≤ a doomed row's own would LOSE the
      // merge and silently leave the doc live while this method
      // reports it removed — the one failure mode a deletion API must
      // never have. Loud, with the floor to use.
      val doomedMax = doomed.agg(max(col("epoch"))).head.getLong(0)
      require(epoch > doomedMax, s"forget: epoch $epoch does not " +
        s"out-sequence the stored rows (max epoch $doomedMax) — the " +
        "tombstone would lose the merge and the docs would stay " +
        s"live; use an epoch > $doomedMax")
      val next = latestWins(cur,
        doomed.withColumn("epoch", lit(epoch))
          .withColumn("deleted", lit(true))
          .select(cur.columns.map(col): _*))
        .localCheckpoint(true)
      graft.sources.AtomicSwap.rewrite(fs, path)(tmp =>
        graft.sources.SnapshotStore.write(next, tmp))
    }
    n
  }

  /** COMPACTION: physically drop tombstones whose epoch is at or
    * below `epochFloor` — safe exactly when the caller can prove no
    * batch at an epoch ≤ the floor will ever replay (e.g. the
    * previous stream run's checkpoints are retired, so every future
    * write carries a higher [[sink]] floor). Live rows are untouched;
    * [[read]] answers identically before and after (spec-pinned).
    * Returns the number of tombstones dropped. */
  def compact(spark: SparkSession, path: String,
      epochFloor: Long): Long = {
    val fs = fsOf(spark, path)
    graft.sources.AtomicSwap.recover(fs, path)
    val cur = graft.sources.SnapshotStore.read(spark, path)
    if (!cur.columns.contains("deleted")) return 0L
    val doomed = col("deleted") && col("epoch") <= epochFloor
    val n = cur.filter(doomed).count()
    if (n > 0) {
      val next = cur.filter(!doomed).localCheckpoint(true)
      graft.sources.AtomicSwap.rewrite(fs, path)(tmp =>
        graft.sources.SnapshotStore.write(next, tmp))
    }
    n
  }

  /** Attach the store as a STREAMING sink for a scored verdict stream
    * ([[CorpusStreams.verdictStream]]'s output): each micro-batch
    * ingests under epoch = FLOOR + batchId + 1, where the floor is
    * the store's max epoch AT ATTACH time — so a foreachBatch REPLAY
    * within a run re-ingests under the SAME epoch with the same
    * content (idempotent by the merge), a replayed batch can never
    * regress a later batch's rescore, AND a RESTARTED query (fresh
    * checkpoint → batchId back at 0) still out-sequences everything
    * the previous run stored (a bare batchId would silently lose to
    * the old run's higher epochs). Within-batch duplicate doc_ids
    * are the caller's bug and stay loud. */
  def sink(scored: DataFrame, path: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] = {
    val floor = maxEpoch(scored.sparkSession, path)
    scored.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        ingest(batch.sparkSession, path,
          batch.drop("score"), epoch = floor + batchId + 1)
        ()
    }
  }
}
