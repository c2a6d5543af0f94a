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
    * stored dataset (unlike the snapshot merge, which drops them):
    * a forget at epoch N must out-sequence a replayed scoring batch
    * at epoch < N forever, which only a persisted tombstone can do.
    * At equal epoch the tombstone wins (a same-epoch forget beats a
    * same-epoch rescore — deterministic, and the conservative answer
    * for a deletion request). */
  private def latestWins(cur: DataFrame,
      delta: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("epoch").desc, col("deleted").desc)
    cur.unionByName(delta)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
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
    * a proven epoch floor would remove them). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val fs = fsOf(spark, path)
    graft.sources.AtomicSwap.recover(fs, path)
    graft.sources.SnapshotStore.read(spark, path)
      .filter(!col("deleted")).drop("deleted")
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
    val cur = graft.sources.SnapshotStore.read(spark, path)
    val key = ids.columns.head
    val doomed = cur.filter(!col("deleted"))
      .join(ids, cur("doc_id") === ids(key), "left_semi")
      .localCheckpoint(true)
    val n = doomed.count()
    if (n > 0) {
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

  /** Attach the store as a STREAMING sink for a scored verdict stream
    * ([[CorpusStreams.verdictStream]]'s output): each micro-batch
    * ingests under epoch = batchId + 1 (init is epoch 0), so a
    * foreachBatch REPLAY after a crash re-ingests under the SAME
    * epoch with the same content (idempotent by the merge), and a
    * replayed batch can never regress a later batch's rescore — the
    * exactly-once-effective contract Spark's batchId + an idempotent
    * sink are designed to compose. Within-batch duplicate doc_ids
    * are the caller's bug and stay loud. */
  def sink(scored: DataFrame, path: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    scored.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        ingest(batch.sparkSession, path,
          batch.drop("score"), epoch = batchId + 1)
        ()
    }
}
