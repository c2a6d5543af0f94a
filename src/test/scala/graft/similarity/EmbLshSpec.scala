package graft.similarity

import graft.SparkSpec
import graft.functions.VectorFunctions
import graft.queries.SimilarityQueries
import org.apache.spark.sql.functions._

/** Sign-LSH embedding dedup: candidates only from band collisions, exact
  * cosine as the final filter → every reported pair is exact-correct, and
  * near-identical vectors (which share all sign bits) are always found. */
class EmbLshSpec extends SparkSpec {
  import spark.implicits._

  test("near-identical vectors are found; reported pairs are exact") {
    val dim = 16
    val v = Seq.tabulate(dim)(i => math.sin(i + 1.0))
    val vNear = v.zipWithIndex.map { case (x, i) => x + (if (i == 0) 1e-6 else 0.0) }
    val vOrth = Seq.tabulate(dim)(i => math.cos(3.0 * (i + 1)))
    val e = Seq((1L, v), (2L, vNear), (3L, vOrth)).toDF("vec_id", "emb")
      .select(col("vec_id"),
        VectorFunctions.normalized(col("emb")).as("nemb"))
    val pairs = SimilarityQueries.embLshPairs(e, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L))) // the near-dup, nothing else
  }

  test("LSH pairs are a subset of the brute-force pairs on real data") {
    val exact = SimilarityQueries.q33EmbCosPairs(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SimilarityQueries.q44EmbLshPairs(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact),
      s"LSH invented pairs: ${lsh.diff(exact).take(5)}")
  }
}
