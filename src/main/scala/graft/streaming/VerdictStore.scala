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
  * from the batch ensemble trained on the init corpus; every LATER
  * arrival is scored against the FROZEN artifacts of that epoch
  * ([[CorpusStreams.verdictStream]]'s row-local scorer — arriving
  * data is unseen by construction, so the frozen model scores all of
  * it). Re-ingesting a doc latest-wins on doc_id (the S4/S8 merge),
  * so an at-least-once scorer never duplicates rows.
  *
  * Scale posture: one merge shuffle on doc_id per ingest batch,
  * bounded by |store| + |batch|; the store rewrites through
  * [[graft.sources.AtomicSwap]] (readers recover); no driver state.
  */
object VerdictStore {

  /** The verdict-row schema both epochs produce (the q217 shape). */
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

  /** Create the store from the init epoch's batch verdict rows. */
  def init(spark: SparkSession, path: String, rows: DataFrame): Unit =
    graft.sources.SnapshotStore.write(checked(rows, "init"), path)

  /** Upsert one scored batch (latest-wins on doc_id) and rewrite the
    * store atomically. Returns the batch's row count (the ingest's
    * affected_rows). */
  def ingest(spark: SparkSession, path: String,
      scored: DataFrame): Long = {
    val delta = checked(scored, "ingest").localCheckpoint(true)
    val fs = fsOf(spark, path)
    graft.sources.AtomicSwap.recover(fs, path)
    val next = graft.sources.SnapshotStore.merge(
      graft.sources.SnapshotStore.read(spark, path)
        .withColumn("_vseq", lit(0L)),
      delta.withColumn("_vseq", lit(1L)),
      "doc_id", "_vseq")
      .drop("_vseq", "deleted")
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
