package graft.streaming

import graft.SparkSpec
import graft.sources.MessageBus
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** P1 cross-batch priority: a forced-updates message enqueued AFTER a
  * regular backlog must still be consumed BEFORE it — the behavior the
  * reference gets from per-priority queues and plain micro-batching
  * cannot give. */
class PriorityConsumerSpec extends SparkSpec {
  import spark.implicits._
  import PriorityConsumer.QueueRef

  private val payload = StructType(Seq(
    StructField("token_id", StringType), StructField("priority", IntegerType)))

  private def enqueue(dir: String, prio: Int, ids: Seq[String],
      offset0: Long): Unit =
    MessageBus.send(MessageBus.envelope(
      ids.zipWithIndex.map { case (id, i) => (id, prio, offset0 + i) }
        .toDF("token_id", "priority", "_o"),
      keyCol = "token_id", offsetCol = "_o",
      ts = timestamp_micros(col("_o")), topic = s"tasks-p$prio"), dir)

  test("forced-updates preempt an older regular backlog across cycles") {
    val base = java.nio.file.Files.createTempDirectory("graft_pq")
    val regular = base.resolve("regular").toString
    val forced = base.resolve("forced").toString
    val cursor = base.resolve("cursor.tsv").toString
    val queues = Seq(QueueRef(regular, 1), QueueRef(forced, 4))
    val seen = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    def handler(df: org.apache.spark.sql.DataFrame): Unit =
      seen += MessageBus.decode(df, payload)
        .orderBy(col("priority").desc, col("offset"))
        .select("token_id").as[String].collect().toSeq

    // an old regular backlog, then forced work arrives later
    enqueue(regular, 1, Seq("r1", "r2", "r3", "r4", "r5", "r6"), 0)
    enqueue(forced, 4, Seq("f1", "f2", "f3"), 0)
    assert(PriorityConsumer.drainOnce(spark, queues, cursor, 5)(handler) === 5)
    // all forced first, regular only fills the remainder — cross-queue
    assert(seen.last === Seq("f1", "f2", "f3", "r1", "r2"))

    // MORE forced work arrives between cycles: it must jump the queue
    enqueue(forced, 4, Seq("f4"), 3)
    assert(PriorityConsumer.drainOnce(spark, queues, cursor, 3)(handler) === 3)
    assert(seen.last === Seq("f4", "r3", "r4"))

    // drain the tail; cursors survive a "restart" (fresh call, same file)
    assert(PriorityConsumer.drainAll(spark, queues, cursor, 10)(handler) === 2)
    assert(seen.last === Seq("r5", "r6"))
    // everything consumed exactly once, nothing replayed
    assert(seen.flatten.toSeq ===
      Seq("f1", "f2", "f3", "r1", "r2", "f4", "r3", "r4", "r5", "r6"))
    assert(PriorityConsumer.drainOnce(spark, queues, cursor, 10)(handler) === 0)
  }
}
