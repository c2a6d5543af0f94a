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
      store)
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
}
