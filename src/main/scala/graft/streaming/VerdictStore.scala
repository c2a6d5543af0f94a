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

  /** Create the store from the init epoch's batch verdict rows
    * (stored as epoch 0). */
  def init(spark: SparkSession, path: String, rows: DataFrame): Unit =
    graft.sources.SnapshotStore.write(
      checked(rows, "init").withColumn("epoch", lit(0L)), path)

  /** Upsert one scored batch under `epoch` (> 0): per doc_id the
    * HIGHEST stored epoch wins, so replaying an older batch is a
    * no-op for docs a newer epoch already rescored. Rewrites the
    * store atomically; returns the batch's row count. */
  def ingest(spark: SparkSession, path: String,
      scored: DataFrame, epoch: Long): Long = {
    require(epoch > 0, s"ingest epochs start at 1 (init is 0): $epoch")
    val delta = checked(scored, "ingest")
      .withColumn("epoch", lit(epoch)).localCheckpoint(true)
    val dup = delta.groupBy("doc_id").count()
      .filter(col("count") > 1).limit(1).collect()
    require(dup.isEmpty, s"ingest: doc_id ${dup.head.get(0)} appears " +
      "more than once in this batch — two same-epoch verdicts have " +
      "no deterministic winner (dedupe upstream)")
    val fs = fsOf(spark, path)
    graft.sources.AtomicSwap.recover(fs, path)
    val next = graft.sources.SnapshotStore.merge(
      graft.sources.SnapshotStore.read(spark, path),
      delta, "doc_id", "epoch")
      .drop("deleted")
      .localCheckpoint(true) // pinned before the swap replaces inputs
    graft.sources.AtomicSwap.rewrite(fs, path)(tmp =>
      graft.sources.SnapshotStore.write(next, tmp))
    delta.count()
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val fs = fsOf(spark, path)
    graft.sources.AtomicSwap.recover(fs, path)
    graft.sources.SnapshotStore.read(spark, path)
  }
}
