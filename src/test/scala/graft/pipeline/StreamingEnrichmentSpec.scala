package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** §3.3 end to end in streaming mode: uri tasks arrive as a stream, each
  * micro-batch runs fetch → validate → latest-wins merge into the metadata
  * snapshot (the foreachBatch MERGE shape S8), and image tasks fan out from
  * the valid rows — i.e. the whole reference worker chain driven by one
  * streaming query. */
class StreamingEnrichmentSpec extends SparkSpec {
  import spark.implicits._

  private def dataUrl(body: String): String =
    "data:," + java.net.URLEncoder.encode(body, "UTF-8").replace("+", "%20")

  test("streamed uri tasks fold into the metadata snapshot incrementally") {
    implicit val sqlCtx = spark.sqlContext
    val emptySnapshot = Seq.empty[(String, String, String, String,
      java.sql.Timestamp, java.sql.Timestamp)]
      .toDF("token_id", "owner", "url", "metadata", "last_updated",
        "last_checked")
    StreamingEnrichmentSpec.snapshot = emptySnapshot
    StreamingEnrichmentSpec.imageTaskCount = 0L

    val input = MemoryStream[(String, String, String, Int)]
    val q = input.toDF()
      .toDF("owner", "token_id", "url", "priority")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val staged = Enrichment.metadataStage(batch)
        val now = lit(java.sql.Timestamp.valueOf("2026-03-01 00:00:00"))
        StreamingEnrichmentSpec.snapshot = Enrichment.mergeMetadata(
          StreamingEnrichmentSpec.snapshot,
          staged.filter(col("valid")), now).cache()
        StreamingEnrichmentSpec.snapshot.count() // materialize per batch
        StreamingEnrichmentSpec.imageTaskCount +=
          Enrichment.imageTasks(staged).count()
        ()
      }
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: one valid+image doc, one invalid
      input.addData(Seq(
        ("o1", "t1", dataUrl("""{"name":"a","description":"d","image":"i1"}"""), 3),
        ("o2", "t2", dataUrl("""{"name":"a"}"""), 1)))
      q.processAllAvailable()
      // batch 2: t1 metadata changes; t3 arrives
      input.addData(Seq(
        ("o1", "t1", dataUrl("""{"name":"b","description":"d","image":"i2"}"""), 4),
        ("o3", "t3", dataUrl("""{"name":"c","description":"d","image":"i3"}"""), 2)))
      q.processAllAvailable()

      val snap = StreamingEnrichmentSpec.snapshot
        .select("token_id", "metadata").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(snap.keySet === Set("t1", "t3")) // t2 invalid, never merged
      assert(snap("t1").contains("\"name\":\"b\"")) // batch-2 update won
      assert(StreamingEnrichmentSpec.imageTaskCount === 3L) // t1, t1', t3
    } finally q.stop()
  }

  test("streamed image tasks resize+gzip and dedup against the growing store") {
    implicit val sqlCtx = spark.sqlContext
    StreamingEnrichmentSpec.store =
      Seq.empty[(String, String)].toDF("name", "content_key")
    StreamingEnrichmentSpec.sunk = 0L
    val dir = java.nio.file.Files.createTempDirectory("graft_simg")
    def fileUrl(name: String, seed: Long): String = {
      val p = dir.resolve(name)
      java.nio.file.Files.write(p,
        graft.functions.BinaryFunctions.syntheticPng(seed, 24, 18))
      "file://" + p
    }
    val input = MemoryStream[(String, String, String, Int)]
    val q = input.toDF().toDF("owner", "token_id", "url", "priority")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the imgresizer→imgstorage chain per micro-batch: resize+gzip,
        // then content-dedup against everything already stored (S9/J6)
        val imgs = Enrichment.imageStage(batch)
        val fresh =
          Enrichment.dedupAgainstStore(imgs, StreamingEnrichmentSpec.store)
            .cache()
        StreamingEnrichmentSpec.sunk += fresh.count()
        StreamingEnrichmentSpec.store = StreamingEnrichmentSpec.store
          .unionByName(fresh.select("name", "content_key")).cache()
        ()
      }
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Seq(("o1", "tokA", fileUrl("a.png", 1), 1)))
      q.processAllAvailable()
      assert(StreamingEnrichmentSpec.sunk === 2L) // 2 resolutions stored
      // batch 2: tokA unchanged (same bytes → same content keys, deduped)
      // + tokB new
      input.addData(Seq(
        ("o1", "tokA", fileUrl("a2.png", 1), 1),
        ("o2", "tokB", fileUrl("b.png", 2), 1)))
      q.processAllAvailable()
      assert(StreamingEnrichmentSpec.sunk === 4L,
        "unchanged tokA re-stored or tokB missed")
      assert(StreamingEnrichmentSpec.store.count() === 4L)
    } finally q.stop()
  }
}

object StreamingEnrichmentSpec {
  @volatile var snapshot: org.apache.spark.sql.DataFrame = _
  @volatile var imageTaskCount: Long = 0L
  @volatile var store: org.apache.spark.sql.DataFrame = _
  @volatile var sunk: Long = 0L
}
