package graft.functions

import graft.SparkSpec
import graft.functions.BloomFunctions._
import org.apache.spark.sql.functions._

/** The Bloom build/probe pair must honor the sketch contract — zero false
  * negatives, bounded false positives — and the q76 pipeline built on it
  * must be EXACT (bloom prune + confirm join == plain exact join, q64). */
class BloomFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def buildFilter(values: Seq[Long]): Array[Byte] =
    values.toDF("v")
      .agg(bloomAgg(col("v"), 10000L).as("bf"))
      .head.getAs[Array[Byte]]("bf")

  test("no false negatives: every inserted value probes true") {
    val ins = (0L until 5000L).map(i => i * 7919 + 13)
    val bf = buildFilter(ins)
    val misses = ins.toDF("v")
      .filter(!mightContain(lit(bf), col("v")))
      .count()
    assert(misses === 0L)
  }

  test("bounded false positives on disjoint probes") {
    val ins = (0L until 5000L).map(i => i * 7919 + 13)
    val bf = buildFilter(ins)
    val probes = (1L to 10000L).map(i => -i) // disjoint from ins
    val fps = probes.toDF("v")
      .filter(mightContain(lit(bf), col("v")))
      .count()
    // default FPP is 3%; allow generous slack so the test is not flaky
    assert(fps < 1000L, s"false-positive rate too high: $fps/10000")
  }

  test("distributed build == single-partition build semantics") {
    val ins = (0L until 2000L).toDF("v")
    val many = ins.repartition(8)
      .agg(bloomAgg(col("v"), 10000L)).head.getAs[Array[Byte]](0)
    // merged partial filters must still contain everything
    val misses = ins.filter(!mightContain(lit(many), col("v"))).count()
    assert(misses === 0L)
  }

  test("SQL surface: bloom_agg builds, bloom_might_contain probes") {
    graft.GraftFunctions.register(spark)
    spark.range(1000).toDF("id").createOrReplaceTempView("bloom_src")
    spark.range(2000).toDF("id").createOrReplaceTempView("bloom_probe")
    // the probe-side filter argument must be a constant or a scalar
    // subquery (Spark's own runtime-filter form) — a plain column is
    // rejected at analysis even if it folds to a literal
    val n = spark.sql(
      """SELECT count(*) AS n FROM bloom_probe
        |WHERE bloom_might_contain(
        |  (SELECT bloom_agg(xxhash64(id), 10000) FROM bloom_src),
        |  xxhash64(id))""".stripMargin)
      .head.getLong(0)
    assert(n >= 1000L, "false negative through the SQL probe")
    assert(n < 1200L, s"FP rate too high through the SQL probe: $n")
  }

  test("q76 bloom decontamination == q64 exact decontamination") {
    val dir = sf("sf0.001")
    val exact = graft.queries.TextQueries.q64Decontaminate(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val bloom = graft.queries.TextQueries.q76DecontaminateBloom(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(bloom === exact)
    assert(exact.nonEmpty) // fixture must actually exercise the overlap
  }
}
