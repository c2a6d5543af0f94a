package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Message-bus connector (S5/S6) — the reference's RabbitMQ sender/receiver
  * pair (x/common/rabbit_sender.go:17-87, rabbit_receiver.go:16-86)
  * re-expressed as a pluggable Structured Streaming source/sink in the
  * KAFKA WIRE SHAPE: (key, value, topic, partition, offset, timestamp).
  * That shape is the lingua franca of Spark bus connectors, so one decode
  * path serves every transport:
  *
  *  - production clusters run `format = "kafka"` (the spark-sql-kafka
  *    connector, deployed with the cluster) — its output IS the wire
  *    schema, checkpointed offsets give exactly-once with the same
  *    foreachBatch sinks used everywhere else in this library;
  *  - this air-gapped environment (and the specs) run `format = "files"`:
  *    a directory of wire-schema parquet files acts as the queue, the file
  *    source's processed-file log in the checkpoint is the consumer-group
  *    cursor — resume semantics are identical in kind to Kafka's;
  *  - any other connector name passes through, expected to produce the
  *    same wire schema.
  *
  * Message priority (the reference's four queues, x/common/types.go:15-22)
  * rides IN the payload: Kafka-shaped buses have no broker-side priority,
  * so within-batch priority ordering stays where it already lives
  * (graft.streaming.EventStreams), and cross-batch priority remains a
  * documented divergence of the log-based model.
  */
object MessageBus {

  /** The Kafka source/sink wire schema. */
  val wireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType)))

  /** Sender side (rabbit_sender.go Send): typed rows → wire envelope.
    * value = JSON bytes of every input column; partition = hash(key) mod n
    * (Kafka's default partitioner — per-key ordering holds within a
    * partition); offset and timestamp are CALLER-supplied columns so
    * replays are deterministic — a bus assigns real offsets, the file
    * queue carries the producer's sequence. */
  def envelope(df: DataFrame, keyCol: String, offsetCol: String,
      ts: Column, topic: String, nPartitions: Int = 4): DataFrame =
    df.select(
      col(keyCol).cast("string").cast("binary").as("key"),
      to_json(struct(df.columns.map(col): _*)).cast("binary").as("value"),
      lit(topic).as("topic"),
      pmod(xxhash64(col(keyCol).cast("string")), lit(nPartitions))
        .cast("int").as("partition"),
      col(offsetCol).cast("long").as("offset"),
      ts.cast("timestamp").as("timestamp"))

  /** Receiver side (rabbit_receiver.go consume → handler): wire envelope →
    * bus metadata + typed payload columns, via from_json on the value
    * bytes. Malformed payloads decode to null columns (never exceptions) —
    * the receiver's nack path is a filter, not a crash. */
  def decode(bus: DataFrame, payload: StructType): DataFrame = {
    // a payload field named like a bus metadata column would decode
    // to a frame with DUPLICATE column names — every later
    // col("offset") is AMBIGUOUS_REFERENCE at some arbitrary
    // downstream point; loud here with the rename recipe instead
    val clash = payload.fieldNames
      .filter(Seq("topic", "partition", "offset", "bus_ts").contains)
    require(clash.isEmpty, s"decode: payload field(s) " +
      s"${clash.mkString(", ")} collide with the bus metadata " +
      "columns — select them under different names in the payload " +
      "schema (the envelope serialized every producer column, so the " +
      "data is still in the JSON value)")
    bus.select(col("topic"), col("partition"), col("offset"),
      col("timestamp").as("bus_ts"),
      from_json(col("value").cast("string"), payload).as("_m"))
      .select(Seq(col("topic"), col("partition"), col("offset"),
        col("bus_ts")) ++ payload.fieldNames.map(f => col(s"_m.$f")): _*)
  }

  /** Streaming read of the bus in the wire schema (see object doc for the
    * format seam). For "files", `options("path")` is the queue directory;
    * remaining options (maxFilesPerTrigger, ...) pass through. */
  def readStream(spark: SparkSession, format: String,
      options: Map[String, String]): DataFrame = format match {
    case "kafka" =>
      spark.readStream.format("kafka").options(options).load()
        .select(wireSchema.fieldNames.map(col): _*)
    case "files" =>
      spark.readStream.schema(wireSchema).options(options - "path")
        .parquet(options("path"))
    case other =>
      spark.readStream.format(other).options(options).load()
  }

  /** Batch read over the same queue (backfill/replay — the batch twin every
    * streaming surface in this library keeps). */
  def read(spark: SparkSession, format: String,
      options: Map[String, String]): DataFrame = format match {
    case "kafka" =>
      spark.read.format("kafka").options(options).load()
        .select(wireSchema.fieldNames.map(col): _*)
    case "files" => spark.read.schema(wireSchema).parquet(options("path"))
    case other => spark.read.format(other).options(options).load()
  }

  /** Producer append to the file queue (kafka deployments write with
    * `df.write.format("kafka")` instead — same envelope upstream). */
  def send(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** RETENTION pass for the file queue (r20) — the broker's
    * ack-delete, deferred: drop every message at or below
    * `consumedThrough` (the consumer's durable cursor) and collapse
    * the remaining rows into task-bounded files. Without it a drain
    * loop's per-cycle cost grows with the queue's TOTAL history —
    * every cycle lists and filters months of acked messages to admit
    * a few fresh ones; Kafka's retention and RabbitMQ's ack-delete
    * both bound this, so the file queue needs its own. Rides
    * [[AtomicSwap]] (crash-recovering swap, single WRITER — run it
    * between drain cycles, never concurrent with a send). A
    * STREAMING consumer over the same dir sees the compacted files
    * as new (its processed-file log keys on names) and re-reads the
    * survivors — safe by construction: survivors are above the
    * cursor, i.e. not yet processed, and the cursor filter already
    * makes delivery at-least-once. Returns (rows before, after). */
  def compactConsumed(spark: SparkSession, path: String,
      consumedThrough: Long): (Long, Long) = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var nBefore = 0L
    AtomicSwap.rewrite(fs, path) { tmp =>
      val cur = spark.read.schema(wireSchema).parquet(path)
      nBefore = cur.count()
      cur.filter(col("offset") > consumedThrough)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
    }
    (nBefore,
      spark.read.schema(wireSchema).parquet(path).count())
  }
}
