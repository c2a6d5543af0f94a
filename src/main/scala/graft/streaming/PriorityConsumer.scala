package graft.streaming

import graft.sources.MessageBus
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-batch priority consumption (P1) — closing the gap the pure
  * Structured Streaming model can't: the reference's receiver takes from
  * its four priority queues highest-first ACROSS deliveries
  * (x/common/rabbit_sender.go:30,81, types.go:15-22), while a streaming
  * micro-batch can only reorder WITHIN a batch (EventStreams.prioritized).
  *
  * This is a drain-loop scheduler over per-priority [[MessageBus]] file
  * queues — the Trigger.AvailableNow-style batch pattern:
  * every cycle reads each queue's backlog past its durable cursor, admits
  * the `batchSize` globally-highest-priority messages (offset order within
  * a priority — FIFO per queue), hands them to the caller, and only then
  * advances the cursors. A forced-updates message enqueued between cycles
  * therefore preempts an older regular backlog — exactly the cross-batch
  * behavior rabbit gives and `maxOffsetsPerTrigger` alone does not.
  *
  * Delivery semantics match the reference's ack model: cursors advance
  * AFTER the handler returns, so a crash mid-handler redelivers (at-least-
  * once); downstream idempotence comes from the same merge/dedup sinks the
  * rest of the library uses (S8/S9). Per-queue consumption is always an
  * offset PREFIX of the backlog, so a cursor is one long per queue.
  * Producer contract: offsets must be UNIQUE and increasing per queue
  * (Kafka's own invariant — MessageBus.envelope takes a sequence column);
  * a duplicated offset would be half-consumed and then skipped by the
  * strict `> cursor` filter. Queues that do not exist yet (consumer up
  * before its producer) read as empty, like a declared-but-idle queue.
  */
object PriorityConsumer {

  /** A queue directory and the priority class it carries. */
  case class QueueRef(path: String, priority: Int)

  /** Durable cursor: queue path → highest consumed offset. Stored as
    * tab-separated lines (atomic rename on save — a torn cursor is never
    * visible). */
  def loadCursor(path: String): Map[String, Long] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) Map.empty
    else {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(p).asScala
        .filter(_.contains('\t'))
        .map { l => val Array(k, v) = l.split('\t'); k -> v.toLong }.toMap
    }
  }

  def saveCursor(path: String, cursor: Map[String, Long]): Unit = {
    val tmp = java.nio.file.Paths.get(path + ".tmp")
    java.nio.file.Files.writeString(tmp,
      cursor.map { case (k, v) => s"$k\t$v" }.mkString("\n"))
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(path),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** One drain cycle. Returns the number of messages handed to `process`
    * (0 = all queues drained). `process` receives wire-schema rows plus
    * `q_priority`; decode with [[MessageBus.decode]]. */
  def drainOnce(spark: SparkSession, queues: Seq[QueueRef],
      cursorPath: String, batchSize: Int)
      (process: DataFrame => Unit): Long = {
    val cursor = loadCursor(cursorPath)
    // not-yet-created queue dirs read as empty instead of failing the
    // whole cycle (consumer may start before its producer ever sends)
    val live = queues.filter(q =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(q.path)))
    if (live.isEmpty) return 0L
    val backlogs = live.map { q =>
      MessageBus.read(spark, "files", Map("path" -> q.path))
        .filter(col("offset") > lit(cursor.getOrElse(q.path, -1L)))
        .withColumn("q_priority", lit(q.priority))
        .withColumn("q_path", lit(q.path))
    }
    // global admission: priority desc, then FIFO by offset; queue path as
    // the final tie-break keeps equal-priority interleaving deterministic
    val batch = backlogs.reduce(_ unionByName _)
      .orderBy(col("q_priority").desc, col("offset").asc, col("q_path"))
      .limit(batchSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = batch.count()
      if (n == 0) return 0L
      process(batch.drop("q_path"))
      // ack: per-queue max consumed offset (consumption is a prefix —
      // within one queue all rows share q_priority, so admission takes
      // offsets in order)
      val consumed = batch.groupBy("q_path").agg(max("offset").as("o"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      saveCursor(cursorPath, cursor ++ consumed)
      n
    } finally { batch.unpersist(); () }
  }

  /** Drain until every queue is empty (backfill / catch-up mode). */
  def drainAll(spark: SparkSession, queues: Seq[QueueRef],
      cursorPath: String, batchSize: Int)
      (process: DataFrame => Unit): Long = {
    var total = 0L
    var n = -1L
    while (n != 0L) {
      n = drainOnce(spark, queues, cursorPath, batchSize)(process)
      total += n
    }
    total
  }
}
