package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for every left row, the latest right row
  * with rightTime <= leftTime within the same key. The canonical
  * training-data operator (feature lookup at label time) and a named gap in
  * Spark's built-in surface.
  *
  * Plan shape, chosen for 100 TB: tag both inputs, UNION them, and take a
  * running `last(right payload, ignoreNulls)` over an ordered window per
  * key — ONE hash shuffle on the key and a partition sort, O(1) state per
  * row. The naive `left.join(right, key && r.ts <= l.ts)` + max-window
  * alternative explodes to O(|L|·|R|) per key before pruning; a range join
  * needs binning. The union trick needs neither.
  */
object AsOfJoin {

  /** leftTime/rightTime must be comparable (same type). Right payload
    * columns are returned with the `prefix`, null when no right row is
    * at-or-before the left row. Ties on time: the right row sorts before
    * the left row (inclusive <=), multiple right rows on one timestamp
    * resolve to the one with the highest tieBreak column. */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, tieBreak: String,
      prefix: String = "r_"): DataFrame = {
    val rightPayloadCols =
      right.columns.filter(c => c != key && c != rightTime).toSeq
    // the right payload rides the union as a typed STRUCT column — no
    // serialization codec in the per-row path (a JSON round-trip here would
    // pay encode+decode on every row of both inputs)
    val rightSchema = org.apache.spark.sql.types.StructType(
      right.schema.fields.filter(f => f.name != key && f.name != rightTime))
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1)) // left sorts AFTER right on equal ts
      .withColumn("_tb", lit(null).cast(right.schema(tieBreak).dataType))
      .withColumn("_payload", lit(null).cast(rightSchema))
    val r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumn("_tb", col(tieBreak))
      .withColumn("_payload", struct(rightPayloadCols.map(col): _*))
      .select((Seq(key, "_t", "_side", "_tb", "_payload").map(col)): _*)
    val leftCols = left.columns.toSeq
    val unioned = l.select(
      (leftCols.map(col) ++ Seq(col("_t"), col("_side"), col("_tb"),
        col("_payload"))): _*)
      .unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(key)
      .orderBy(col("_t"), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_r", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    rightPayloadCols.foldLeft(carried) { (df, c) =>
      df.withColumn(prefix + c, col(s"_r.$c"))
    }.select((leftCols.map(col) ++
      rightPayloadCols.map(c => col(prefix + c))): _*)
  }
}
