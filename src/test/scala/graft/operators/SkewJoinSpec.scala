package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows on skewed data") {
    // one hot key (90% of rows) + a tail — the hot-NFT shape
    val left = ((1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k${i % 10}", i.toLong)))
      .toDF("key", "id")
    val right = (Seq("hot") ++ (0 until 10).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"dim$i") }
      .toDF("key", "attr")

    val plain = left.join(right, Seq("key"))
      .select("key", "id", "attr").collect().map(_.toString).sorted
    val salted = SkewJoin.saltedJoin(left, right, "key", "id", 8)
      .select("key", "id", "attr").collect().map(_.toString).sorted
    assert(salted.toSeq === plain.toSeq)
    // and the salt really spreads the hot key across sub-partitions
    val spread = left.withColumn("s", pmod(xxhash64(col("id")), lit(8)))
      .filter(col("key") === "hot")
      .select("s").distinct().count()
    assert(spread > 4, s"salt only produced $spread distinct sub-keys")
  }
}
