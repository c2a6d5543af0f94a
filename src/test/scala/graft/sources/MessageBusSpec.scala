package graft.sources

import graft.SparkSpec
import graft.pipeline.Enrichment
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S5/S6: the Kafka-shaped bus connector. The decisive test is the last
  * one — the reference's metadata worker chain consuming uri-task messages
  * FROM the bus with checkpoint resume, i.e. the full
  * receiver → handler → snapshot-merge dataflow of
  * x/tokenMetadataService/service.go driven through MessageBus. */
class MessageBusSpec extends SparkSpec {
  import spark.implicits._

  private val taskSchema = StructType(Seq(
    StructField("owner", StringType), StructField("token_id", StringType),
    StructField("url", StringType), StructField("priority", IntegerType)))

  private def dataUrl(body: String): String =
    "data:," + java.net.URLEncoder.encode(body, "UTF-8").replace("+", "%20")

  private def tasks(rows: Seq[(String, String, String, Int)], offset0: Long) =
    MessageBus.envelope(
      rows.toDF("owner", "token_id", "url", "priority")
        .withColumn("_i", monotonically_increasing_id()),
      keyCol = "token_id", offsetCol = "_i",
      ts = timestamp_micros(col("_i") + offset0), topic = "uri-tasks")
      .withColumn("offset", col("offset") + offset0)

  test("envelope/decode round-trips typed rows through the wire schema") {
    val in = Seq(("o1", "t1", "u1", 3), ("o2", "t2", "u2", 1),
      ("o1", "t9", "u3", 4))
    val wire = tasks(in, 100)
    // names+types match the wire schema (envelope's literals are
    // non-nullable — stricter than the declared schema, which is fine)
    assert(wire.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      MessageBus.wireSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val decoded = MessageBus.decode(wire, taskSchema)
    val got = decoded
      .select("owner", "token_id", "url", "priority").as[(String, String,
        String, Int)].collect().toSet
    assert(got === in.toSet)
    // partitioner: deterministic by key, within range
    val parts = wire.select("partition").as[Int].collect()
    assert(parts.forall(p => p >= 0 && p < 4))
    assert(tasks(in, 100).select("partition").as[Int].collect().toSeq
      === parts.toSeq)
    // malformed value bytes → null payload columns, not an exception
    val bad = wire.withColumn("value", lit("not json".getBytes))
    assert(MessageBus.decode(bad, taskSchema)
      .filter(col("token_id").isNull).count() === 3)
  }

  test("batch read replays the queue (backfill twin)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bus_b").toString
    MessageBus.send(tasks(Seq(("o1", "t1", "u", 1)), 0), dir)
    MessageBus.send(tasks(Seq(("o2", "t2", "u", 2)), 1), dir)
    val all = MessageBus.read(spark, "files", Map("path" -> dir))
    assert(all.count() === 2)
    assert(MessageBus.decode(all, taskSchema).select("token_id")
      .as[String].collect().toSet === Set("t1", "t2"))
  }

  test("enrichment pipeline consumes the bus with checkpoint resume") {
    val queue = java.nio.file.Files.createTempDirectory("graft_bus_q").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_bus_c").toString
    val out = java.nio.file.Files.createTempDirectory("graft_bus_o").toString

    def consume(): Unit = {
      val q = MessageBus.readStream(spark, "files",
          Map("path" -> queue, "maxFilesPerTrigger" -> "1"))
        .transform(b => MessageBus.decode(b, taskSchema))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          // the reference's receiver → metadata handler per delivery
          Enrichment.metadataStage(
              batch.select("owner", "token_id", "url", "priority"))
            .select("owner", "token_id", "valid", "has_image")
            .write.mode("append").parquet(out)
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable(); q.stop()
    }

    // two deliveries arrive, consumer processes them, then STOPS
    MessageBus.send(tasks(Seq(
      ("o1", "t1", dataUrl("""{"name":"a","description":"d","image":"i"}"""), 3),
      ("o2", "t2", dataUrl("""{"name":"a"}"""), 1)), 0), queue)
    consume()
    assert(spark.read.parquet(out).count() === 2)

    // two more arrive while the consumer is down; restart from the same
    // checkpoint — the already-consumed file must NOT replay
    MessageBus.send(tasks(Seq(
      ("o1", "t1", dataUrl("""{"name":"b","description":"d","image":"i"}"""), 4),
      ("o3", "t3", dataUrl("""{"name":"c","description":"d","image":"i"}"""), 2)),
      2), queue)
    consume()

    val res = spark.read.parquet(out)
    assert(res.count() === 4, "batch 1 replayed or batch 2 dropped")
    val valid = res.filter(col("valid")).select("token_id")
      .as[String].collect().sorted
    assert(valid.toSeq === Seq("t1", "t1", "t3")) // t2 invalid (no descr.)
    assert(res.filter(col("has_image")).count() === 3)
  }

  test("decode refuses a payload schema shadowing the bus metadata " +
    "columns (the frame would carry duplicate names — every later " +
    "col(\"offset\") ambiguous at some arbitrary downstream point)") {
    val clashing = StructType(Seq(
      StructField("token_id", StringType),
      StructField("offset", LongType)))
    val wire = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      MessageBus.wireSchema)
    val e = intercept[IllegalArgumentException](
      MessageBus.decode(wire, clashing))
    assert(e.getMessage.contains("collide"))
  }

  test("compactConsumed drops acked history so drain cost tracks the " +
    "BACKLOG, not the queue's total past; survivors still deliver") {
    val queue = java.nio.file.Files
      .createTempDirectory("graft_bus_rt").toString
    def batch(ids: Seq[String], off0: Long) = MessageBus.envelope(
      ids.zipWithIndex.map { case (id, i) => (id, off0 + i) }
        .toDF("token_id", "seq"),
      keyCol = "token_id", offsetCol = "seq",
      ts = current_timestamp(), topic = "tasks")
    MessageBus.send(batch(Seq("a", "b", "c"), 0L), queue)
    MessageBus.send(batch(Seq("d", "e"), 3L), queue)
    // the consumer's durable cursor says offsets <= 2 are processed
    val (before, after) =
      MessageBus.compactConsumed(spark, queue, consumedThrough = 2L)
    assert(before === 5L && after === 2L)
    val schema = StructType(Seq(StructField("token_id", StringType),
      StructField("seq", LongType)))
    val left = MessageBus.decode(
      MessageBus.read(spark, "files", Map("path" -> queue)), schema)
      .select("token_id", "offset").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
    assert(left.toSeq === Seq(("d", 3L), ("e", 4L)))
  }
}
