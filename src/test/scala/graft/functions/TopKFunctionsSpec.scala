package graft.functions

import graft.SparkSpec
import graft.functions.TopKFunctions.topK
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bounded top-k aggregate: exact under any partitioning (top-k is
  * a mergeable summary with no error term), deterministic tie rule,
  * k-bounded wire format — the kNN-join building block. */
class TopKFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Double, Long)], k: Int,
      partitions: Int): Map[Long, Seq[(Long, Double)]] =
    rows.toDF("g", "score", "id").repartition(partitions)
      .groupBy("g").agg(topK(col("score"), col("id"), k).as("nn"))
      .select(col("g"), explode(col("nn")).as("e"))
      .select(col("g"), col("e.id"), col("e.score"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getDouble(2))).toSeq)
      .toMap

  test("equals the window-based top-k for any partitioning, including " +
    "groups smaller than k") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map(i =>
      ((i % 7).toLong, math.floor(rnd.nextDouble() * 100) / 100, i.toLong)) ++
      Seq((99L, 1.0, 1L), (99L, 2.0, 2L)) // a 2-row group under k=5
    val want = rows.toDF("g", "score", "id")
      .withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("score").desc, col("id"))))
      .filter(col("rn") <= 5)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(3))
        .map(r => (r.getLong(2), r.getDouble(1))).toSeq).toMap
    for (parts <- Seq(1, 3, 13))
      assert(run(rows, k = 5, partitions = parts) === want,
        s"mismatch at $parts partitions")
  }

  test("tie rule is (score desc, id asc) and survives merges") {
    // every score equal: the top-3 must be the 3 smallest ids,
    // regardless of which partition they arrive from
    val rows = (0 until 100).map(i => (1L, 0.5, (100 - i).toLong))
    assert(run(rows, k = 3, partitions = 8) ===
      Map(1L -> Seq((1L, 0.5), (2L, 0.5), (3L, 0.5))))
  }

  test("serialized partials are k-bounded and the plan is two-phase") {
    import org.apache.spark.sql.graft.Bridge
    val agg = TopKFunctions.TopKAgg(
      Bridge.expression(lit(0.0)), Bridge.expression(lit(0L)), k = 4)
    val buf = agg.createAggregationBuffer()
    (0 until 1000).foreach(i => buf += ((i.toDouble, i.toLong)))
    val bytes = agg.serialize(buf)
    // 4 bytes count + k * (8 score + 8 id)
    assert(bytes.length === 4 + 4 * 16, s"wire size ${bytes.length}")
    // round trip preserves the survivors
    val back = agg.deserialize(bytes)
    assert(back.map(_._1).sorted.reverse === Seq(999.0, 998.0, 997.0, 996.0))
    val df = (0 until 100).map(i => (i % 3, i.toDouble, i.toLong))
      .toDF("g", "s", "i").repartition(5)
      .groupBy("g").agg(topK(col("s"), col("i"), 3).as("nn"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2,
      s"top_k not two-phase:\n$p")
  }

  test("q126 kNN join rides the aggregate, not a window") {
    val df = graft.queries.SimilarityQueries
      .q126KnnJoin(spark, sf("sf0.001"))
    val rows = df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("WindowExec") && !p.contains("RunningWindow"),
      s"window in kNN join plan:\n$p")
    assert(p.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2,
      s"top_k not two-phase:\n$p")
    // 8 queries × full rank range, self excluded
    assert(rows.map(_.getLong(0)).distinct.length === 8)
    rows.foreach(r => assert(r.getLong(0) !== r.getLong(2), r.toString))
  }
}
