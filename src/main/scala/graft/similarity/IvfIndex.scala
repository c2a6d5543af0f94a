package graft.similarity

import graft.functions.VectorFunctions.{dot, normalized}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF (inverted-file) ANN index — the scale path for similarity
  * search (north-star; q34 is the ad-hoc variant). Build once, probe many:
  *
  *  - BUILD: L2-normalize, assign every vector to its nearest coarse
  *    centroid, write the assignment table `partitionBy(cell)` — one
  *    directory per cell.
  *  - SEARCH: score the (tiny) codebook driver-side, take the nProbe best
  *    cells, and read ONLY those partitions (`cell IN (...)` prunes at the
  *    file listing, verified by spec) — at 100 TB a probe touches
  *    nProbe/nCells of the data instead of all of it.
  *
  * The codebook is deterministic for the fixture (vectors with
  * vec_id < nCells); swap `codebook` for k-means centroids in production —
  * every other part is unchanged.
  */
object IvfIndex {

  private def codebook(emb: DataFrame, nCells: Int): DataFrame =
    emb.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cent_id"), col("nemb").as("cent"))

  /** Lloyd's k-means over the normalized vectors (cosine ≈ spherical
    * k-means): deterministic init from the first nCells ids, `iters`
    * assign→mean rounds, centroids re-normalized each round. Elementwise
    * means via posexplode+groupBy — one shuffle per iteration, any dim. */
  def trainCentroids(emb: DataFrame, nCells: Int, iters: Int): DataFrame = {
    var cents = codebook(emb, nCells)
    for (_ <- 0 until iters) {
      val assigned = emb.crossJoin(broadcast(cents))
        .groupBy("vec_id", "nemb")
        .agg(max_by(col("cent_id"), dot(col("nemb"), col("cent"))).as("cell"))
      val means = assigned
        .select(col("cell"), posexplode(col("nemb")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg("x").as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell").as("cent_id"),
          normalized(transform(col("pm"), p => p.getField("m"))).as("cent"))
      cents = broadcast(means.cache())
      cents.count()
    }
    cents
  }

  /** emb: (vec_id long, embedding array<float|double>). kmeansIters = 0
    * uses the deterministic first-k codebook; > 0 trains real centroids. */
  def build(emb: DataFrame, path: String, nCells: Int,
      kmeansIters: Int = 0): Unit = {
    val n = emb.select(col("vec_id"),
      normalized(col("embedding").cast("array<double>")).as("nemb"))
      .cache()
    val cb =
      if (kmeansIters > 0) trainCentroids(n, nCells, kmeansIters)
      else codebook(n, nCells)
    val cents = broadcast(cb)
    val assigned = n.crossJoin(cents)
      .groupBy("vec_id")
      .agg(max_by(col("cent_id"), dot(col("nemb"), col("cent"))).as("cell"))
    n.join(assigned, "vec_id")
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    cb.write.mode("overwrite").parquet(s"$path/_centroids")
  }

  /** Top-k by cosine for `query`, probing the nProbe best cells only. */
  def search(spark: SparkSession, path: String, query: Array[Double],
      nProbe: Int, k: Int): DataFrame = {
    val cents = spark.read.parquet(s"$path/_centroids").collect()
    def dotLocal(a: Seq[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val qn = {
      val nrm = math.sqrt(query.map(x => x * x).sum)
      if (nrm == 0) query else query.map(_ / nrm)
    }
    val probes = cents
      .map(r => r.getAs[Long]("cent_id") ->
        dotLocal(r.getAs[scala.collection.Seq[Double]]("cent").toSeq, qn))
      .sortBy { case (id, sim) => (-sim, id) }
      .take(nProbe).map(_._1)
    spark.read.parquet(path)
      .filter(col("cell").isin(probes: _*)) // partition-pruned scan
      .select(col("vec_id"),
        round(dot(col("nemb"), typedlit(qn.toSeq)), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }
}
