package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Model-based corpus scoring: q94's pinned-weight arithmetic is
  * oracle-checked by the driver; this spec covers the TRAINING side
  * the oracle cannot replay — a spark.ml multinomial logistic
  * regression on the labeled embeddings must actually learn the
  * cluster structure (the quality-classifier stage of a data
  * pipeline), distributed end to end. */
class ClassifierSpec extends SparkSpec {

  test("q94 pinned scoring: deterministic across runs, keep derives " +
    "from the rounded score") {
    val dir = sf("sf0.001")
    val a = SimilarityQueries.q94ClassifierScore(spark, dir).collect()
    val b = SimilarityQueries.q94ClassifierScore(spark, dir).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty)
    a.foreach { r =>
      val score = r.getDouble(1)
      assert(score >= 0.0 && score <= 1.0)
      assert(r.getInt(2) === (if (score >= 0.5) 1 else 0))
    }
    // random weights over clustered data: both classes present (a
    // degenerate all-keep scorer would pass the bounds check above)
    val keeps = a.map(_.getInt(2)).toSet
    assert(keeps === Set(0, 1), s"degenerate keep split: $keeps")
  }

  test("spark.ml LR recovers q94's teacher boundary (the fixture's own " +
    "labels carry no embedding signal, so the test is teacher-student)") {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.array_to_vector
    val dir = sf("sf0.001")
    // teacher labels: q94's keep flag — linearly separable in the
    // normalized embedding space BY CONSTRUCTION (sigmoid(w·x̂+b) >= .5
    // is the halfspace w·x̂+b >= 0), so a working distributed trainer
    // must recover it near-perfectly; the fixture's own `label` column
    // is uncorrelated with the embeddings (checked: within-label and
    // cross-label cosine are both ~0) and would only measure capacity
    val scored = SimilarityQueries.q94ClassifierScore(spark, dir)
      .select(col("vec_id"), col("keep").cast("double").as("label"))
    val data = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        array_to_vector(col("embedding").cast("array<double>"))
          .as("features"))
      .join(scored, "vec_id")
      .cache()
    val n = data.count()
    assert(n > 0)
    val model = new LogisticRegression()
      .setMaxIter(200).setRegParam(0.0).setTol(1e-7)
      .fit(data)
    val acc = model.transform(data)
      .filter(col("prediction") === col("label")).count().toDouble / n
    assert(acc >= 0.98,
      f"train accuracy $acc%.3f — the linearly separable teacher " +
        "boundary was not recovered")
  }
}
