package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — points against [start, end] intervals. Spark
  * plans a plain inequality join as a broadcast-nested-loop / cartesian
  * product; the scalable formulation bins the time axis: an interval
  * registers in every bin it overlaps, a point lives in exactly one bin,
  * and the join becomes an EQUI-join on (key, bin) with a residual
  * between-filter — candidate pairs are only same-bin pairs, and the
  * shuffle key is (key, bin). Bin width trades replication (long
  * intervals × narrow bins) against candidate density; pick it near the
  * typical interval length.
  */
object RangeJoin {

  /** Join `points` (with timestamp `t`) to `intervals` (with timestamps
    * `start`/`end`, inclusive both ends) on the shared `key` column.
    * Output: one row per matching (point, interval) pair with both sides'
    * columns (interval columns must not collide with point columns apart
    * from `key`). */
  def pointInInterval(points: DataFrame, intervals: DataFrame, key: String,
      t: String, start: String, end: String,
      binWidthUs: Long = 30L * 60 * 1000 * 1000): DataFrame = {
    val widthUs = binWidthUs
    require(widthUs > 0, s"bin width must be positive: $binWidthUs")
    val p = points.withColumn("_bin",
      floor(unix_micros(col(t)) / widthUs))
    val iv = intervals.withColumn("_bin", explode(sequence(
      floor(unix_micros(col(start)) / widthUs),
      floor(unix_micros(col(end)) / widthUs))))
    p.join(iv, Seq(key, "_bin"))
      .filter(col(t) >= col(start) && col(t) <= col(end))
      .drop("_bin")
  }
}
