package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Reciprocal Rank Fusion semantics on toy lists (hand-computed
  * scores), and q93's legs pinned to the queries they claim to fuse. */
class RrfFusionSpec extends SparkSpec {

  test("rrf on toy lists: overlap sums, absence contributes nothing, " +
    "ties break on doc_id") {
    import spark.implicits._
    val lex = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("rank", "doc_id")
      .select("doc_id", "rank")
    val vec = Seq((1L, 20L), (2L, 40L)).toDF("rank", "doc_id")
      .select("doc_id", "rank")
    val fused = TextQueries.rrfFuse(Seq(lex, vec), k = 10, rrfK = 60)
      .collect().map { case Row(r: Long, d: Long, s: String) => (r, d, s) }
    // hand-computed: 20 -> 1/62 + 1/61 = 0.032522; 10 -> 1/61 =
    // 0.016393; 40 -> 1/62 = 0.016129; 30 -> 1/63 = 0.015873
    assert(fused === Seq(
      (1L, 20L, "0.032522"),
      (2L, 10L, "0.016393"),
      (3L, 40L, "0.016129"),
      (4L, 30L, "0.015873")))

    // exact tie (same rank, single occurrence each): doc_id breaks it
    val a = Seq((1L, 7L)).toDF("rank", "doc_id").select("doc_id", "rank")
    val b = Seq((1L, 5L)).toDF("rank", "doc_id").select("doc_id", "rank")
    val tied = TextQueries.rrfFuse(Seq(a, b), k = 10, rrfK = 60)
      .collect().map(_.getLong(1)).toSeq
    assert(tied === Seq(5L, 7L))
  }

  test("q93's legs are the queries it claims to fuse: the vector leg's " +
    "head equals q23, the lexical leg's head equals q77") {
    val dir = sf("sf0.001")
    val vec5 = SimilarityQueries.cosineRanked(spark, dir, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val q23 = SimilarityQueries.q23CosineKnn(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(vec5.map(_._2) === q23)
    assert(vec5.map(_._1) === Seq(1L, 2L, 3L, 4L, 5L))

    val q93 = TextQueries.q93HybridRrf(spark, dir)
    val rows = q93.collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // the fused list surfaces docs from BOTH legs: the lexical head and
    // the vector head each appear somewhere in the candidate union
    val fusedDocs = rows.map(_.getLong(1)).toSet
    val lexHead = TextQueries.q77Bm25Topk(spark, dir, k = 1)
      .collect().head.getLong(1)
    assert(fusedDocs.contains(lexHead),
      s"lexical top doc $lexHead missing from fusion")
  }
}
