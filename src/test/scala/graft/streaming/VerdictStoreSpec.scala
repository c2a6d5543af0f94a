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
    "latest-wins on EPOCH — replaying an older batch never " +
    "regresses a newer rescore") {
    val p = path("merge")
    VerdictStore.init(spark, p, frame(row(1, "keep"), row(2, "drop")))
    val batch1 = frame(row(2, "keep"), row(3, "drop"))
    assert(VerdictStore.ingest(spark, p, batch1, epoch = 1L) === 2L)
    val after1 = canon(p)
    assert(after1.map(r => (r.head, r(5), r(7))) ===
      Seq((1L, "keep", 0L), (2L, "keep", 1L), (3L, "drop", 1L)))
    // at-least-once delivery: the same batch again changes nothing
    VerdictStore.ingest(spark, p, batch1, epoch = 1L)
    assert(canon(p) === after1)
    // epoch 2 rescores doc 3; a crash-recovery REPLAY of epoch 1
    // must NOT roll it back (the constant-delta-wins bug this
    // sequence column exists to prevent)
    VerdictStore.ingest(spark, p, frame(row(3, "keep")), epoch = 2L)
    val after2 = canon(p)
    assert(after2.map(r => (r.head, r(5), r(7))) ===
      Seq((1L, "keep", 0L), (2L, "keep", 1L), (3L, "keep", 2L)))
    VerdictStore.ingest(spark, p, batch1, epoch = 1L) // the replay
    assert(canon(p) === after2)
  }

  test("a batch missing a verdict column, carrying a duplicate " +
    "doc_id, or claiming epoch 0 is loud") {
    val p = path("shape")
    VerdictStore.init(spark, p, frame(row(1, "keep")))
    val e = intercept[IllegalArgumentException](
      VerdictStore.ingest(spark, p,
        Seq((2L, 1)).toDF("doc_id", "ratios_ok"), epoch = 1L))
    assert(e.getMessage.contains("verdict rows need columns"))
    // two same-epoch verdicts for one doc have no winner
    val e2 = intercept[IllegalArgumentException](
      VerdictStore.ingest(spark, p,
        frame(row(5, "keep"), row(5, "drop")), epoch = 1L))
    assert(e2.getMessage.contains("more than once"))
    val e3 = intercept[IllegalArgumentException](
      VerdictStore.ingest(spark, p, frame(row(6, "keep")), epoch = 0L))
    assert(e3.getMessage.contains("start at 1"))
  }
}
