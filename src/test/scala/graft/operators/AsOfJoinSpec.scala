package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof picks the latest right row at-or-before each left row") {
    val left = Seq(
      ("u1", 5L, "l_a"), ("u1", 10L, "l_b"), ("u1", 20L, "l_c"),
      ("u2", 7L, "l_d"),   // u2 has no right rows at all → null
      ("u1", 2L, "l_e"))   // before any right row → null
      .toDF("key", "t", "tag")
    val right = Seq(
      ("u1", 5L, 100L, "v5"),   // equal ts: inclusive (<=)
      ("u1", 8L, 101L, "v8"),
      ("u1", 8L, 102L, "v8b"),  // tie on ts → higher tieBreak wins
      ("u1", 15L, 103L, "v15"))
      .toDF("key", "t", "rid", "payload")

    val got = AsOfJoin.asof(left, right, "key", "t", "t", tieBreak = "rid")
      .select("tag", "r_rid", "r_payload").collect()
      .map(r => r.getString(0) ->
        (Option(r.get(1)).map(_.toString), Option(r.getString(2)))).toMap

    assert(got("l_e") === (None, None))
    assert(got("l_a") === (Some("100"), Some("v5")))   // inclusive equal ts
    assert(got("l_b") === (Some("102"), Some("v8b")))  // tie → rid 102
    assert(got("l_c") === (Some("103"), Some("v15")))
    assert(got("l_d") === (None, None))
  }

  test("asof matches a brute-force oracle on randomized data") {
    // 100 independent random key-scenarios in ONE Spark job; keys 5,10,...
    // have no right rows at all (left rows must come back null)
    val rnd = new scala.util.Random(42)
    val leftRows = for (k <- 1 to 100; i <- 1 to rnd.nextInt(8) + 1)
      yield (s"k$k", rnd.nextInt(50).toLong, s"L$k-$i")
    val rightRows = for (k <- 1 to 100 if k % 5 != 0; _ <- 1 to rnd.nextInt(6) + 1)
      yield (s"k$k", rnd.nextInt(50).toLong, rnd.nextInt(1000).toLong)
    val got = AsOfJoin.asof(
      leftRows.toDF("key", "t", "tag"),
      rightRows.toDF("key", "t", "rid"), "key", "t", "t", tieBreak = "rid")
      .collect()
      .map(r => r.getString(2) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap
    val rightByKey = rightRows.groupBy(_._1)
    leftRows.foreach { case (k, t, tag) =>
      val expect = rightByKey.getOrElse(k, Nil)
        .filter(_._2 <= t)
        .sortBy(r => (r._2, r._3))
        .lastOption.map(_._3) // latest t at-or-before; tie → max rid
      assert(got(tag) === expect, s"key=$k t=$t")
    }
  }

  test("asofSkewed equals asof under a 90%-hot-key skew, " +
      "with bounded sub-partitions") {
    val rnd = new scala.util.Random(7)
    // one key holds 90% of the left rows — the popular-NFT shape
    val hotLeft = (1 to 4500).map(i =>
      ("hot", rnd.nextInt(10000).toLong, s"H$i"))
    val coldLeft = for (k <- 1 to 50; i <- 1 to 10)
      yield (s"k$k", rnd.nextInt(10000).toLong, s"C$k-$i")
    val left = (hotLeft ++ coldLeft).toDF("key", "t", "tag")
    val hotRight = (1 to 300).map(i =>
      ("hot", rnd.nextInt(10000).toLong, i.toLong))
    val coldRight = for (k <- 1 to 50; i <- 1 to 3)
      yield (s"k$k", rnd.nextInt(10000).toLong, (1000 + k * 10 + i).toLong)
    val right = (hotRight ++ coldRight).toDF("key", "t", "rid")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("key", "t", "tag", "r_rid").collect()
        .map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    val plain = canon(AsOfJoin.asof(left, right, "key", "t", "t", "rid"))
    val skewed = canon(AsOfJoin.asofSkewed(
      left, right, "key", "t", "t", "rid", nBuckets = 16))
    assert(plain.length === 5000)
    assert(skewed === plain)

    // bounded per-task input: the hot key's largest (key, bucket) group
    // holds a bucket-sized share of its rows, not all 4500 (plain asof
    // puts the whole key in ONE window partition)
    val probes = (1 until 16).map(_.toDouble / 16).toArray
    val bounds = left.select(col("t").cast("double").as("_d"))
      .stat.approxQuantile("_d", probes, 0.001)
    val maxGroup = left
      .withColumn("_bkt", graft.functions.ZOrderFunctions
        .bucketize(col("t").cast("double"), bounds))
      .groupBy("key", "_bkt").count()
      .agg(max("count")).head().getLong(0)
    assert(maxGroup < hotLeft.size / 4,
      s"hot key not sub-partitioned: max group $maxGroup")
  }

  test("asof plan: one hash exchange, no range-join explosion") {
    val ev = graft.Tables.load(spark, sf("sf0.001"), "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max("event_id").as("p_event_id"))
    val df = AsOfJoin.asof(ev.select("event_id", "user_id", "ts"),
      purchases, "user_id", "ts", "ts", "p_event_id")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"as-of degraded to a product join:\n$p")
  }
}
