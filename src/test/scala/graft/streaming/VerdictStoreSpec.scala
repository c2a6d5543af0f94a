package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The verdict store's merge semantics the q226 oracle cannot see:
  * at-least-once ingestion is idempotent, a RE-scored doc latest-wins,
  * and malformed batches are loud. */
class VerdictStoreSpec extends SparkSpec {
  import spark.implicits._

  private def row(id: Long, verdict: String) =
    (id, 1, 1, 1, if (verdict == "keep") 1 else 0, verdict,
      if (verdict == "keep") null else "lm")

  private def frame(rows: (Long, Int, Int, Int, Int, String, String)*) =
    rows.toSeq.toDF("doc_id", "ratios_ok", "fences_ok", "clf_ok",
      "lm_ok", "verdict", "first_fail")

  private def path(tag: String) =
    s"/root/repo/target/tmp/vsspec_${tag}_" +
      spark.sparkContext.applicationId

  private def canon(p: String) =
    VerdictStore.read(spark, p).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq

  test("re-ingesting the same batch is idempotent; a re-scored doc " +
    "latest-wins on doc_id") {
    val p = path("merge")
    VerdictStore.init(spark, p, frame(row(1, "keep"), row(2, "drop")))
    val batch = frame(row(2, "keep"), row(3, "drop"))
    assert(VerdictStore.ingest(spark, p, batch) === 2L)
    val after1 = canon(p)
    assert(after1.map(r => (r.head, r(5))) ===
      Seq((1L, "keep"), (2L, "keep"), (3L, "drop")))
    // at-least-once delivery: the same batch again changes nothing
    VerdictStore.ingest(spark, p, batch)
    assert(canon(p) === after1)
  }

  test("a batch missing a verdict column is loud, never a silent " +
    "schema drift into the store") {
    val p = path("shape")
    VerdictStore.init(spark, p, frame(row(1, "keep")))
    val e = intercept[IllegalArgumentException](
      VerdictStore.ingest(spark, p,
        Seq((2L, 1)).toDF("doc_id", "ratios_ok")))
    assert(e.getMessage.contains("verdict rows need columns"))
  }
}
