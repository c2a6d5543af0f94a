package graft.functions

import graft.SparkSpec
import graft.functions.FrequencyFunctions.misraGries
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class FrequencyFunctionsSpec extends SparkSpec {

  private def summary(rows: Seq[String], capacity: Int,
      partitions: Int = 4): Map[String, Long] = {
    import spark.implicits._
    // partitions=1 uses coalesce (shuffle-free, preserves input order) —
    // MG is arrival-order-sensitive, and repartition(1)'s round-robin
    // shuffle does not guarantee arrival order, which would make the
    // textbook-fold equality test flaky
    val df0 = rows.toDF("w")
    val df = if (partitions == 1) df0.coalesce(1)
      else df0.repartition(partitions)
    df.agg(misraGries(col("w"), capacity).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.w"), col("e.c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("exact when vocabulary fits the capacity") {
    val data = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(5)("c")
    val got = summary(scala.util.Random.shuffle(data.toList), capacity = 8)
    assert(got === Map("a" -> 30L, "b" -> 20L, "c" -> 5L))
  }

  test("MG bound: heavy items survive any arrival order, counts are " +
    "lower bounds within n/(capacity+1)") {
    val cap = 8
    // one heavy key + a long distinct tail that forces constant evictions
    val heavy = Seq.fill(400)("HOT")
    val tail = (1 to 600).map(i => s"t$i")
    val n = heavy.size + tail.size
    val maxErr = n / (cap + 1) // 1000/9 = 111 < 400 → HOT must survive
    for (seed <- Seq(1, 2, 3)) {
      val order = new scala.util.Random(seed).shuffle(heavy ++ tail)
      val got = summary(order, cap)
      assert(got.contains("HOT"), s"seed $seed lost the heavy hitter")
      val est = got("HOT")
      assert(est <= 400L, "MG counts must never exceed the true count")
      assert(400L - est <= maxErr,
        s"seed $seed: estimate $est underestimates 400 beyond $maxErr")
      // every surviving counter respects the summary size
      assert(got.size <= cap)
    }
  }

  test("property sweep: the MG bound holds for random streams, " +
    "capacities and partitionings") {
    // scalacheck as a generator (no scalatestplus bridge in this cache):
    // each trial draws a Zipf-ish stream, a capacity and a partition
    // count; the bound must hold for every (item, estimate)
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    for (trial <- 1 to 12) {
      val p = Gen.Parameters.default
      def draw[A](g: Gen[A], salt: Int): A =
        g.apply(p, Seed(trial.toLong * 1000 + salt)).get
      val vocabSize = draw(Gen.chooseNum(5, 60), 1)
      val streamLen = draw(Gen.chooseNum(100, 1500), 2)
      val cap = draw(Gen.chooseNum(2, 24), 3)
      val parts = draw(Gen.chooseNum(1, 8), 4)
      val rnd = new scala.util.Random(trial)
      // Zipf-ish: item i drawn with weight 1/(i+1)
      val weights = (0 until vocabSize).map(i => 1.0 / (i + 1))
      val total = weights.sum
      val stream = Seq.fill(streamLen) {
        var x = rnd.nextDouble() * total; var i = 0
        while (x > weights(i) && i < vocabSize - 1) { x -= weights(i); i += 1 }
        s"w$i"
      }
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val got = summary(stream, cap, parts)
      val err = streamLen.toLong / (cap + 1)
      assert(got.size <= cap, s"trial $trial: size ${got.size} > cap $cap")
      got.foreach { case (w, c) =>
        assert(c <= exact(w), s"trial $trial: $w overcounted ($c > ${exact(w)})")
        assert(exact(w) - c <= err,
          s"trial $trial: $w est $c vs ${exact(w)}, bound $err")
      }
      exact.filter(_._2 > err).keys.foreach(w =>
        assert(got.contains(w), s"trial $trial: heavy $w lost (bound $err)"))
    }
  }

  test("single-partition stream matches the textbook sequential fold") {
    // reference fold computed in plain Scala (the Misra-Gries textbook
    // algorithm) — the distributed single-partition run must agree exactly
    val data = Seq("a", "b", "a", "c", "d", "a", "b", "e", "a", "f",
      "b", "a", "g", "a", "b")
    val cap = 3
    val ref = scala.collection.mutable.HashMap[String, Long]()
    data.foreach { w =>
      if (ref.contains(w)) ref(w) += 1
      else if (ref.size < cap) ref(w) = 1
      else {
        ref.keys.toSeq.foreach { k =>
          ref(k) -= 1; if (ref(k) == 0) ref.remove(k)
        }
      }
    }
    val got = summary(data, cap, partitions = 1)
    assert(got === ref.toMap)
  }

  test("q78 equals the exact full group-by top-k on the fixture") {
    val dir = sf("sf0.001")
    val got = graft.queries.TextQueries.q78HeavyHitters(spark, dir)
      .collect().map { case Row(rk: Long, w: String, c: Long) => (rk, w, c) }
    val exact = graft.Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(20)
      .collect().zipWithIndex
      .map { case (r, i) => (i + 1L, r.getString(0), r.getLong(1)) }
    assert(got.toSeq === exact.toSeq)
  }

  test("adversarial capacity: when the k-th count cannot clear the MG " +
    "bound, q78 falls back to the exact group-by instead of lying") {
    val dir = sf("sf0.001")
    def exactTop(k: Int) = graft.Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => (i + 1L, r.getString(0), r.getLong(1)) }.toSeq
    // capacity=2 over the ~31-token near-uniform fixture vocabulary: the
    // sketch's two survivors are arrival-order artifacts, NOT the true
    // top-2 (the 2nd-ranked count sits far below n/3). The runtime
    // validation must detect the miss and answer from the exact plan.
    val tight = graft.queries.TextQueries
      .q78HeavyHitters(spark, dir, k = 2, capacity = 2)
      .collect().map { case Row(rk: Long, w: String, c: Long) => (rk, w, c) }
    assert(tight.toSeq === exactTop(2))
    // fewer survivors than k (capacity < k): same fallback, same answer
    val few = graft.queries.TextQueries
      .q78HeavyHitters(spark, dir, k = 20, capacity = 4)
      .collect().map { case Row(rk: Long, w: String, c: Long) => (rk, w, c) }
    assert(few.toSeq === exactTop(20))
  }

  test("q78's guarantee precondition holds on the fixture: the k-th " +
    "frequency clears the MG survival threshold") {
    val dir = sf("sf0.001")
    val d = graft.Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
    val n = d.count()
    val kth = d.groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(20)
      .collect().last.getLong(1)
    assert(kth > n / (256 + 1),
      "fixture no longer satisfies the documented exactness precondition")
  }
}
