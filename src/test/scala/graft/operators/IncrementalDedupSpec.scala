package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental-vs-batch equivalence: probing a new batch against the
  * signature store of the old corpus must flag exactly the cross-split
  * subset of what the batch pair pipeline (q30) finds on the union —
  * same kernel, same bands, same threshold, so the results are equal by
  * construction, and this spec holds the construction to it. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  test("incremental probe equals the cross-split slice of batch dedup") {
    val dir = sf("sf0.001")
    val docs = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "text")
    val old = docs.filter(col("doc_id") < 150)
    val fresh = docs.filter(col("doc_id") >= 150 && col("doc_id") < 300)
    val store = java.nio.file.Files
      .createTempDirectory("graft_dedup_store").toString

    IncrementalDedup.initStore(old, store)
    val got = IncrementalDedup
      .findDups(fresh, IncrementalDedup.loadStore(spark, store), 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // batch ground truth: q30 over the SAME corpus, pairs crossing the
    // split (a in old, b in new — a<b always holds across this split),
    // earliest old match per new doc
    val expected = graft.queries.TextQueries
      .q30MinhashPairs(spark, dir, 0.5)
      .filter(col("a") < 150 && col("b") >= 150 && col("b") < 300)
      .groupBy("b").agg(min("a").as("a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)

    // append the fresh docs, then probe an exact copy of one of them:
    // it must match its original in the GROWN store
    IncrementalDedup.appendFresh(fresh, IncrementalDedup
      .findDups(fresh, IncrementalDedup.loadStore(spark, store), 0.5),
      store, batchId = 1L)
    val sampleId = fresh.select(min("doc_id")).head().getLong(0)
    val copy = fresh.filter(col("doc_id") === sampleId)
      .select(lit(999999L).as("doc_id"), col("text"))
    val redup = IncrementalDedup
      .findDups(copy, IncrementalDedup.loadStore(spark, store), 0.5)
      .collect()
    assert(redup.length === 1)
    assert(redup.head.getLong(0) === 999999L)
    assert(redup.head.getDouble(2) === 1.0) // identical text → est 1.0
  }

  test("streaming ingest dedups each micro-batch against the growing store") {
    implicit val sqlCtx = spark.sqlContext
    val store = java.nio.file.Files
      .createTempDirectory("graft_dedup_stream").toString
    def txt(seed: Int): String =
      (0 until 25).map(i => s"s${seed}w$i").mkString(" ")
    // seed the store with doc 1 (also gives the store files a schema)
    IncrementalDedup.initStore(Seq((1L, txt(1))).toDF("doc_id", "text"), store)

    // companion-object state survives whatever closure handling the
    // streaming machinery applies (same pattern as StreamingEnrichmentSpec)
    IncrementalDedupSpec.kept = Vector.empty
    IncrementalDedupSpec.dupOf = Map.empty
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        // one ingest cycle: probe + append + report, single kernel pass
        // (processBatch pins the micro-batch internally); the batch id
        // keys the store partition so redelivery is idempotent
        val (dups, fresh) = IncrementalDedup.processBatch(batch,
          IncrementalDedup.loadStore(batch.sparkSession, store), store,
          bid, 0.5)
        IncrementalDedupSpec.dupOf ++= dups.collect()
          .map(r => r.getLong(0) -> r.getLong(1))
        IncrementalDedupSpec.kept ++=
          fresh.select("doc_id").collect().map(_.getLong(0))
        ()
      }.start()
    try {
      // batch 1: doc 2 duplicates stored doc 1; doc 3 is fresh
      input.addData(Seq((2L, txt(1)), (3L, txt(3))))
      q.processAllAvailable()
      // batch 2: doc 4 duplicates doc 3 — which entered the store in the
      // PREVIOUS micro-batch (the store grows between batches)
      input.addData(Seq((4L, txt(3)), (5L, txt(5))))
      q.processAllAvailable()
    } finally q.stop()
    assert(IncrementalDedupSpec.kept.sorted === Seq(3L, 5L))
    assert(IncrementalDedupSpec.dupOf === Map(2L -> 1L, 4L -> 3L))
  }
}

object IncrementalDedupSpec {
  @volatile var kept: Vector[Long] = Vector.empty
  @volatile var dupOf: Map[Long, Long] = Map.empty
}
