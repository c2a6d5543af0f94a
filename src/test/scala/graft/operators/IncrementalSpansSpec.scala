package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch-equivalence for the incremental exact-substring dedup store:
  * appending the corpus in pieces and answering from the merged store
  * must reproduce the corpus-wide q95/q96 answers exactly, replays
  * must be no-ops, and compaction must change nothing. */
class IncrementalSpansSpec extends SparkSpec {

  private val dir = sf("sf0.001")
  private def docs: DataFrame =
    graft.Tables.load(spark, dir, "documents")

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  private def freshStore(): String =
    java.nio.file.Files.createTempDirectory("inc_spans").toString + "/s"

  test("two-batch append merges to the corpus-wide gram-df table, and " +
    "the incremental spans/redaction equal q95/q96 on the union") {
    val store = freshStore()
    val (a, b) = (docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1))
    IncrementalSpans.append(a, store, batchId = 0L)
    IncrementalSpans.append(b, store, batchId = 1L)
    val merged = IncrementalSpans.dfTable(spark, store)

    // the store's merged stats == a from-scratch full-corpus aggregate
    val expectedDf = IncrementalSpans.gramDfDelta(docs)
    assert(rows(merged.orderBy("gh")) === rows(expectedDf.orderBy("gh")))

    // report + filter against the store == the batch queries
    assert(rows(IncrementalSpans.spansFor(docs, merged)) ===
      rows(graft.queries.TextQueries.q95RepeatedSpans(spark, dir)))
    assert(rows(IncrementalSpans.redactFor(docs, merged)) ===
      rows(graft.queries.TextQueries.q96SpanRedact(spark, dir)))
  }

  test("a replayed foreachBatch delivery is idempotent: re-appending " +
    "the same batch id leaves the merged stats unchanged") {
    val store = freshStore()
    val (a, b) = (docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1))
    IncrementalSpans.append(a, store, batchId = 0L)
    IncrementalSpans.append(b, store, batchId = 1L)
    val before = rows(IncrementalSpans.dfTable(spark, store).orderBy("gh"))
    IncrementalSpans.append(b, store, batchId = 1L) // redelivery
    assert(rows(IncrementalSpans.dfTable(spark, store).orderBy("gh"))
      === before, "replay double-counted a batch")
  }

  test("streaming ingest end-to-end: foreachBatch appends per trigger " +
    "and the final store answers like the batch queries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = freshStore()
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        IncrementalSpans.append(batch, store, id)
      }.start()
    try {
      val all = docs.select($"doc_id", $"text")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      all.grouped(120).foreach { g =>
        input.addData(g); q.processAllAvailable()
      }
    } finally q.stop()
    val merged = IncrementalSpans.dfTable(spark, store)
    assert(rows(IncrementalSpans.spansFor(docs, merged)) ===
      rows(graft.queries.TextQueries.q95RepeatedSpans(spark, dir)))
    assert(rows(IncrementalSpans.redactFor(docs, merged)) ===
      rows(graft.queries.TextQueries.q96SpanRedact(spark, dir)))
  }

  test("compact folds deltas without changing answers; appends " +
    "continue afterwards") {
    val store = freshStore()
    val thirds = Seq(0, 1).map(r => docs.filter(col("doc_id") % 3 === r))
    thirds.zipWithIndex.foreach { case (d, i) =>
      IncrementalSpans.append(d, store, batchId = i.toLong)
    }
    val before = rows(IncrementalSpans.dfTable(spark, store).orderBy("gh"))
    IncrementalSpans.compact(spark, store)
    assert(rows(IncrementalSpans.dfTable(spark, store).orderBy("gh"))
      === before, "compaction changed the merged stats")
    // the store keeps accepting deltas after compaction
    IncrementalSpans.append(docs.filter(col("doc_id") % 3 === 2),
      store, batchId = 2L)
    val full = rows(IncrementalSpans.dfTable(spark, store).orderBy("gh"))
    assert(full === rows(IncrementalSpans.gramDfDelta(docs).orderBy("gh")))
  }
}
