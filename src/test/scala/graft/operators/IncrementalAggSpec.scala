package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate view: refresh-from-deltas must equal the
  * one-shot aggregate over everything seen (the materialized-view
  * contract), the merge must be associative, and the persisted store
  * must apply each batch exactly once under redelivery. */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val spec = IncrementalAgg.Spec("k",
    sums = Seq("v"), mins = Seq("v"), maxs = Seq("v"))

  private def facts(rows: (Long, Double)*): DataFrame =
    rows.toSeq.toDF("k", "v")

  private def rows(df: DataFrame): Set[(Long, Long, Double, Double, Double)] =
    df.select("k", "n", "sum_v", "min_v", "max_v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet

  test("refresh-from-deltas equals the one-shot aggregate at every step") {
    val b0 = facts((1L, 10.0), (1L, 2.0), (2L, 5.0))
    val d1 = facts((1L, -3.0), (3L, 7.0))
    val d2 = facts((2L, 100.0), (3L, 1.0), (3L, 2.0))
    var view = IncrementalAgg.partial(b0, spec)
    var seen = b0
    Seq(d1, d2).foreach { d =>
      view = IncrementalAgg.refresh(view, d, spec)
      seen = seen.unionByName(d)
      assert(rows(view) === rows(IncrementalAgg.partial(seen, spec)))
    }
    // the merge is associative: (b0 ⊎ d1) ⊎ d2 == b0 ⊎ (d1 ⊎ d2)
    val left = IncrementalAgg.mergeViews(
      IncrementalAgg.mergeViews(IncrementalAgg.partial(b0, spec),
        IncrementalAgg.partial(d1, spec), spec),
      IncrementalAgg.partial(d2, spec), spec)
    val right = IncrementalAgg.mergeViews(
      IncrementalAgg.partial(b0, spec),
      IncrementalAgg.mergeViews(IncrementalAgg.partial(d1, spec),
        IncrementalAgg.partial(d2, spec), spec), spec)
    assert(rows(left) === rows(right))
    // a key arriving ONLY in a delta appears; mins/maxs re-minimize
    assert(rows(view).exists { case (k, n, _, mn, mx) =>
      k == 3L && n == 3L && mn == 1.0 && mx == 7.0 })
  }

  test("persisted store: exactly-once per batch id under redelivery, " +
    "state survives across reads") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_iagg").toString + "/store"
    IncrementalAgg.initStore(spark, root, facts((1L, 1.0)), spec)
    assert(IncrementalAgg.refreshStore(spark, root, "b1",
      facts((1L, 2.0), (2L, 9.0)), spec))
    // redelivered b1: refused, view unchanged
    assert(!IncrementalAgg.refreshStore(spark, root, "b1",
      facts((1L, 2.0), (2L, 9.0)), spec))
    assert(rows(IncrementalAgg.readStore(spark, root)) ===
      Set((1L, 2L, 3.0, 1.0, 2.0), (2L, 1L, 9.0, 9.0, 9.0)))
    // a second batch folds on; a re-init wipes applied history
    assert(IncrementalAgg.refreshStore(spark, root, "b2",
      facts((2L, 1.0)), spec))
    assert(rows(IncrementalAgg.readStore(spark, root)) ===
      Set((1L, 2L, 3.0, 1.0, 2.0), (2L, 2L, 10.0, 1.0, 9.0)))
    IncrementalAgg.initStore(spark, root, facts((5L, 5.0)), spec)
    assert(IncrementalAgg.refreshStore(spark, root, "b1",
      facts((5L, 1.0)), spec), "re-init must clear the applied log")
    assert(rows(IncrementalAgg.readStore(spark, root)) ===
      Set((5L, 2L, 6.0, 1.0, 5.0)))
  }

  test("streaming materialized view: foreachBatch refreshes survive a " +
    "kill between store swap and sink commit — redelivery is a no-op, " +
    "view equals the batch aggregate over everything delivered") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files
      .createTempDirectory("graft_iagg_stream").toString + "/store"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_iagg_ckpt").toString
    IncrementalAgg.initStore(spark, root, facts((1L, 1.0)), spec)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Double)]
    IncrementalAggSpec.applied = Vector.empty
    def start() = input.toDF().toDF("k", "v")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        IncrementalAggSpec.applied :+= ((bid,
          IncrementalAgg.refreshStore(batch.sparkSession, root,
            s"b$bid", batch, spec)))
        ()
      }.start()
    val q1 = start()
    try {
      input.addData(Seq((1L, 2.0), (2L, 9.0)))
      q1.processAllAvailable()
    } finally q1.stop()
    // the crash window: the view swapped but the sink commit was lost
    // — drop batch 0's commit marker so the restart redelivers it
    assert(new java.io.File(s"$ckpt/commits/0").delete(),
      "expected a commit marker for batch 0")
    new java.io.File(s"$ckpt/commits/.0.crc").delete()
    val q2 = start()
    try {
      input.addData(Seq((2L, 1.0)))
      q2.processAllAvailable()
    } finally q2.stop()
    // batch 0 was attempted twice; the SECOND attempt refused (the
    // applied-id log), batch 1 applied once
    assert(IncrementalAggSpec.applied ===
      Vector((0L, true), (0L, false), (1L, true)))
    assert(rows(IncrementalAgg.readStore(spark, root)) ===
      rows(IncrementalAgg.partial(
        facts((1L, 1.0), (1L, 2.0), (2L, 9.0), (2L, 1.0)), spec)))
  }

  test("spec rejects aggregating the key or duplicate columns") {
    intercept[IllegalArgumentException](
      IncrementalAgg.Spec("k", sums = Seq("k")))
    intercept[IllegalArgumentException](
      IncrementalAgg.Spec("k", sums = Seq("v", "v")))
  }
}

object IncrementalAggSpec {
  @volatile var applied: Vector[(Long, Boolean)] = Vector.empty
}
