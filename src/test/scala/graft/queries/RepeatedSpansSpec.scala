package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Island-merge semantics of the exact-substring dedup pair (q95 span
  * report, q96 redaction) on a hand-computed toy corpus — every merge
  * edge case pinned, plus the consistency law tying the two queries
  * together: the tokens q96 drops are EXACTLY the tokens inside q95's
  * spans. The DuckDB oracle replays both on the fixture; this spec
  * guards the cases the fixture may never exercise (span at doc start,
  * adjacent-but-disjoint islands, touching anchors merging, whole-doc
  * span, zero-flag doc, empty redaction). l=3, minDf=2 throughout. */
class RepeatedSpansSpec extends SparkSpec {

  // Disjoint token alphabets per cluster so each shared gram is shared
  // by exactly the documents listed:
  //   "a b c" in d0+d1, "x y z" in d0+d2       (cluster A)
  //   "h i j" in d4+d5, "j k l" in d4+d6       (cluster B: overlap)
  //   "c1 c2 c3" in d7+d8, "c4 c5 c6" in d7+d9 (cluster C: touching)
  private val corpus = Seq(
    0L -> "a b c d x y z", // anchors at 0 and 4: span [0,2] + [4,6]
    1L -> "q a b c r s t u", // interior anchor: span [1,3]
    2L -> "x y z", // single anchor covering the whole doc
    3L -> "n1 n2 n3 n4", // no shared gram: zero spans, nothing redacted
    4L -> "g h i j k l m", // anchors 1 and 3 OVERLAP: one span [1,5]
    5L -> "h i j u1 u2",
    6L -> "j k l v1 v2",
    7L -> "c1 c2 c3 c4 c5 c6", // anchors 0 and 3 TOUCH (pos==prevEnd+1):
    8L -> "c1 c2 c3 w1 w2", //   one island, whole-doc span [0,5]
    9L -> "w3 c4 c5 c6")

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("spans_fx").toString
    corpus.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.parquet(d + "/documents.parquet")
    d
  }

  private def md5s(s: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(s.getBytes("UTF-8"))
    .map("%02x".format(_)).mkString

  test("q95 merges flagged anchors into maximal spans: doc-start " +
    "anchors, disjoint islands, overlapping and touching anchors, " +
    "whole-doc spans, and zero-flag docs") {
    val got = TextQueries.q95RepeatedSpans(spark, dir, l = 3, minDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val expected = Seq(
      (0L, 0L, 2L, 3L), (0L, 4L, 6L, 3L), // span at pos 0; gap of ONE
      (1L, 1L, 3L, 3L), //   token (pos 3) keeps the islands apart
      (2L, 0L, 2L, 3L), // whole doc
      (4L, 1L, 5L, 5L), // anchors [1,3]+[3,5] overlap -> one span
      (5L, 0L, 2L, 3L),
      (6L, 0L, 2L, 3L),
      (7L, 0L, 5L, 6L), // anchors [0,2]+[3,5] touch -> one span
      (8L, 0L, 2L, 3L),
      (9L, 1L, 3L, 3L)) // doc 3 absent: zero flagged anchors
    assert(got === expected)
  }

  test("q96 drops exactly the spanned tokens; empty and no-op " +
    "redactions hash correctly") {
    val got = TextQueries.q96SpanRedact(spark, dir, l = 3, minDf = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    val expected = Map(
      0L -> ((7L, 1L, md5s("d"))),
      1L -> ((8L, 5L, md5s("q r s t u"))),
      2L -> ((3L, 0L, md5s(""))), // fully redacted: md5 of empty text
      3L -> ((4L, 4L, md5s("n1 n2 n3 n4"))), // untouched: n_kept=n_total
      4L -> ((7L, 2L, md5s("g m"))),
      5L -> ((5L, 2L, md5s("u1 u2"))),
      6L -> ((5L, 2L, md5s("v1 v2"))),
      7L -> ((6L, 0L, md5s(""))),
      8L -> ((5L, 2L, md5s("w1 w2"))),
      9L -> ((4L, 1L, md5s("w3"))))
    assert(got === expected)
  }

  test("q95 <-> q96 consistency: per doc, dropped tokens == total span " +
    "coverage (the report and the filter can never disagree)") {
    val spans = TextQueries.q95RepeatedSpans(spark, dir, l = 3, minDf = 2)
      .groupBy("doc_id").agg(sum("span_len").as("covered"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    TextQueries.q96SpanRedact(spark, dir, l = 3, minDf = 2)
      .collect().foreach { r =>
        val dropped = r.getLong(1) - r.getLong(2)
        assert(dropped === spans.getOrElse(r.getLong(0), 0L),
          s"doc ${r.getLong(0)}: q96 dropped $dropped tokens but q95 " +
            s"reports ${spans.getOrElse(r.getLong(0), 0L)} spanned")
      }
    // and on the real fixture too, not just the toy corpus
    val fxDir = sf("sf0.001")
    val fxSpans = TextQueries.q95RepeatedSpans(spark, fxDir)
      .groupBy("doc_id").agg(sum("span_len").as("covered"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    TextQueries.q96SpanRedact(spark, fxDir).collect().foreach { r =>
      assert(r.getLong(1) - r.getLong(2) ===
        fxSpans.getOrElse(r.getLong(0), 0L), s"doc ${r.getLong(0)}")
    }
  }
}
