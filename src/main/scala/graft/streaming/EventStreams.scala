package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming event-time analytics (SURVEY §2.9 P1-P6) — the streaming twins
  * of the batch queries, built on watermarks + event-time windows. Each
  * takes an unbounded DataFrame (readStream source) with the events schema
  * (event_id, ts, user_id, event_type, value, props) and returns the
  * transformed streaming frame; callers attach writeStream/trigger/
  * checkpoint (the cursor analog, x/indexer/cursor.go:5-18).
  */
object EventStreams {

  /** P6 tumbling hourly counts/sums (q19's twin). Late rows beyond the
    * watermark are dropped — the documented divergence from the batch
    * query, which sees everything. */
  def hourlyAggregates(events: DataFrame,
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sv"))
      .select(col("window.start").as("w"), col("event_type"), col("n"),
        col("sv"))

  /** P6 session windows with a 30-minute gap (q20's twin) — the native
    * session_window operator instead of the batch gaps-and-islands SQL. */
  def sessionCounts(events: DataFrame,
      gap: String = "30 minutes", watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("n_events"))

  /** P1 within-batch priority ordering (q16's twin): the RabbitMQ
    * x-max-priority approximation — each micro-batch processes its rows
    * highest-priority-first; cross-batch priority is impossible in
    * Structured Streaming (use [[PriorityConsumer]] for the real
    * cross-batch drain) and documented as a divergence (SURVEY §2.9).
    * This is a FOREACHBATCH helper: Spark rejects ANY Sort on an
    * unbounded frame, so calling it on a streaming DataFrame is loud
    * here rather than an AnalysisException at query start — inside
    * foreachBatch each micro-batch is a bounded frame and the global
    * sort really is highest-priority-first (the previous
    * sortWithinPartitions only ordered within partitions). */
  def prioritized(tasks: DataFrame): DataFrame = {
    require(!tasks.isStreaming, "prioritized: Structured Streaming " +
      "rejects Sort on unbounded frames — apply inside foreachBatch " +
      "(each micro-batch is bounded), or use PriorityConsumer for " +
      "cross-batch priority")
    tasks.orderBy(col("priority").desc)
  }

  /** P5 streaming exact-dedup: drop events whose id was already seen,
    * bounding state with the watermark (dedup state for ids older than the
    * watermark is dropped — the streaming form of the cursor's
    * skip-already-processed, x/indexer/indexer.go:228-231, and of exact
    * content dedup on an unbounded training stream). */
  def dedupStream(events: DataFrame, idCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** P4 freshness predicate: rows stale relative to `now` minus the TTL
    * (the 6 h daemon cycle, config.toml:46) — `now` passed in for
    * deterministic tests. */
  def staleRows(snapshot: DataFrame, now: org.apache.spark.sql.Column,
      ttlHours: Int = 6): DataFrame =
    snapshot.filter(col("last_checked") <
      (now - expr(s"INTERVAL $ttlHours HOURS")))
}
