package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The q217/q218 quality-ensemble pieces the fixture oracle cannot
  * exercise non-vacuously: the fixture's uniform synthetic lengths
  * have no Tukey outliers, so the FENCES stage always passes there —
  * this spec proves it fires on a length-skewed corpus. */
class EnsembleSpec extends SparkSpec {
  import spark.implicits._

  test("fences stage fires on a length-skewed corpus: the Tukey " +
    "outlier fails fences_ok while its peers pass") {
    val rows = (0 to 19).map(i =>
      (i.toLong, "en", 150L, Seq.fill(50)("w").mkString(" "))) :+
      ((20L, "en", 1500L, Seq.fill(500)("w").mkString(" ")))
    val d = rows.toDF("doc_id", "lang", "n_chars", "text")
    val f = TextQueries.ratioFenceFlags(d)
    assert(f.filter(col("fences_ok") === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(20L))
    assert(f.filter(col("fences_ok") === 1).count() === 20L)
    // the flags are INDEPENDENT (cascading happens at the funnel):
    // the one-word-vocabulary texts fail ratios regardless of fences
    assert(f.filter(col("ratios_ok") === 0).count() === 21L)
  }

  test("fences respect language boundaries: an outlier in one " +
    "language does not widen another language's fences") {
    val en = (0 to 9).map(i =>
      (i.toLong, "en", 150L, Seq.fill(50)("w").mkString(" ")))
    val de = (10 to 19).map(i =>
      (i.toLong, "de", 150L, Seq.fill(50)("w").mkString(" "))) :+
      ((20L, "de", 1500L, Seq.fill(500)("w").mkString(" ")))
    val f = TextQueries.ratioFenceFlags(
      (en ++ de).toDF("doc_id", "lang", "n_chars", "text"))
    assert(f.filter(col("fences_ok") === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(20L))
  }
}
