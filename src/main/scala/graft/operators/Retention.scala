package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dedup RETENTION — the step between detecting duplicate clusters and
  * actually shrinking the corpus: inside every cluster keep the
  * highest-quality member and report what was dropped. ONE policy
  * shared by the text (q151), image (q172) and audio (q173) pipelines,
  * generic over the quality signal (unique-token ratio, pixel count,
  * sample count) — "fuzzy dedup, keep best" rather than keep-first.
  *
  * Scale posture: one join on the member key, then a row_number window
  * + fold on the SAME cluster key (the window's hash shuffle is reused
  * by the groupBy — plan-asserted for q151); nothing corpus-squared,
  * and cluster keys are as skew-safe as the clustering that produced
  * them. Covers only cluster members (rows present in `members`);
  * singletons are trivially kept and stay out of the report, the q151
  * contract.
  */
object Retention {

  /** Keep the best-scoring member of each cluster. `members` = one row
    * per cluster member (`key`, `canonical`); `scored` = the quality
    * signal (`key`, `score`) — members missing a score sort LAST
    * (nulls-last descending: never keep a member whose quality is
    * unknowable over one whose is known). Ties break on the key
    * ascending, so equal-quality clusters keep their canonical-most
    * member deterministically. Returns (canonical, kept_key,
    * kept_score, n_dropped) ordered by canonical. */
  def keepBest(members: DataFrame, scored: DataFrame): DataFrame = {
    val m = members.join(scored, Seq("key"), "left")
    val w = Window.partitionBy("canonical")
      .orderBy(col("score").desc_nulls_last, col("key"))
    m.withColumn("rn", row_number().over(w))
      .groupBy("canonical")
      .agg(
        max(when(col("rn") === 1, col("key"))).as("kept_key"),
        max(when(col("rn") === 1, col("score"))).as("kept_score"),
        (count(lit(1)) - 1).cast("long").as("n_dropped"))
      .orderBy("canonical")
  }
}
