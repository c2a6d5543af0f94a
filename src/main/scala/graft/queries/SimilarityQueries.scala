package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (north-star ANN surface;
  * SURVEY §2.11 Q23).
  *
  * The dot product / norm are higher-order-function expressions over
  * array<double> — pure narrow compute. Brute-force top-k broadcasts the
  * single query vector (a 1-row broadcast join), so at 100 TB the scan is
  * embarrassingly parallel and the only gather is TakeOrderedAndProject.
  * The IVF variant adds a coarse-quantizer assignment so candidate sets
  * shrink by ~centroids× before scoring — the standard scale path.
  */
object SimilarityQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("emb"))

  /** Sequential-fold dot product (deterministic association order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Q23 — brute-force exact cosine top-5 neighbors of vec_id=1. */
  def q23CosineKnn(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val target = broadcast(e.filter(col("vec_id") === 1)
      .select(col("emb").as("q")))
    e.filter(col("vec_id") =!= 1)
      .crossJoin(target)
      .select(col("vec_id"),
        round(cosine(col("emb"), col("q")), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(5)
  }

  /** Embedding-cosine near-duplicate pairs (all pairs above threshold).
    * Kept brute-force here as the exactness baseline; the LSH/IVF variants
    * below are the scale path. */
  def q33EmbCosPairs(s: SparkSession, dir: String,
      threshold: Double = 0.4): DataFrame = {
    val a = emb(s, dir).select(col("vec_id").as("a"), col("emb").as("ea"))
    val b = emb(s, dir).select(col("vec_id").as("b"), col("emb").as("eb"))
    a.crossJoin(b)
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        round(cosine(col("ea"), col("eb")), 4).as("sim"))
      .filter(col("sim") >= threshold)
      .orderBy("a", "b")
  }

  /** IVF-style ANN: coarse centroids = the vectors with vec_id < nCentroids
    * (deterministic codebook — no training pass needed for the fixture).
    * Every vector is assigned to its nearest centroid cell; the query probes
    * the nProbe nearest cells and scores only those candidates. */
  def q34AnnIvf(s: SparkSession, dir: String, queryId: Long = 1,
      nCentroids: Int = 16, nProbe: Int = 4, k: Int = 5): DataFrame = {
    val e = emb(s, dir)
    val cents = broadcast(e.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cent_id"), col("emb").as("cent")))

    // Assign each vector to its best cell: max cosine over the broadcast
    // codebook (argmax via max_by keeps it one pass).
    val assigned = e.crossJoin(cents)
      .groupBy(col("vec_id"))
      .agg(expr("max_by(cent_id, aggregate(zip_with(emb, cent, (x, y) -> x * y), 0D, (acc, x) -> acc + x) " +
        "/ (sqrt(aggregate(zip_with(cent, cent, (x, y) -> x * y), 0D, (acc, x) -> acc + x)) + 1e-12))").as("cell"))
    val cells = e.join(assigned, "vec_id")

    // Probe cells = the nProbe centroids closest to the query vector.
    val q = broadcast(e.filter(col("vec_id") === queryId)
      .select(col("emb").as("q")))
    val probes = broadcast(cents.crossJoin(q)
      .select(col("cent_id"), cosine(col("cent"), col("q")).as("csim"))
      .orderBy(col("csim").desc, col("cent_id"))
      .limit(nProbe)
      .select(col("cent_id").as("cell")))

    cells.join(probes, "cell")
      .filter(col("vec_id") =!= queryId)
      .crossJoin(q)
      .select(col("vec_id"), round(cosine(col("emb"), col("q")), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }
}
