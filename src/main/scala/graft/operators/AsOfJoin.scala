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

  /** Skew-safe as-of join — same semantics as [[asof]], different
    * partitioning. [[asof]] windows on `partitionBy(key)`, so one hot key
    * (the popular-NFT skew the reference's domain actually has) lands every
    * one of its rows in a single task, and neither AQE nor salting can
    * split a running window. This variant sub-partitions each key by TIME
    * RANGE, which a running window CAN be split on, because as-of state
    * flows strictly forward in time:
    *
    *  1. quantile-bucket the time domain (driver-side approxQuantile
    *     sketch, no extra shuffle — same trick as the z-order writer);
    *  2. per (key, bucket): the latest right row — a tiny aggregate
    *     (≤ keys × nBuckets rows);
    *  3. carry-in per (key, bucket): the latest summary from any EARLIER
    *     bucket — a window over the small key × bucket grid;
    *  4. the [[asof]] union-window now partitions by (key, bucket) with
    *     the carry-in injected as a virtual right row sorted first —
    *     per-task input drops from O(hot key) to O(hot key / nBuckets).
    *
    * Times must be non-null; `nBuckets` bounds the per-task share of the
    * hottest key (32 → ~3%). */
  def asofSkewed(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, tieBreak: String,
      prefix: String = "r_", nBuckets: Int = 32): DataFrame = {
    import graft.functions.ZOrderFunctions.bucketize
    val rightPayloadCols =
      right.columns.filter(c => c != key && c != rightTime).toSeq
    val rightSchema = org.apache.spark.sql.types.StructType(
      right.schema.fields.filter(f => f.name != key && f.name != rightTime))
    val probes = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val bounds = left.select(col(leftTime).cast("double").as("_d"))
      .stat.approxQuantile("_d", probes, 0.001)
    // no boundaries (empty left, or nBuckets=1) → nothing to sub-split;
    // plain asof is the same semantics and never fails analysis
    if (bounds.isEmpty)
      return asof(left, right, key, leftTime, rightTime, tieBreak, prefix)
    // same boundary expression on both sides → equal times always share a
    // bucket, so the inclusive (<=) tie handling is preserved
    def bkt(c: Column): Column = bucketize(c.cast("double"), bounds)

    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_bkt", bkt(col(leftTime)))
      .withColumn("_ord", lit(1))
      .withColumn("_side", lit(1))
      .withColumn("_tb", lit(null).cast(right.schema(tieBreak).dataType))
      .withColumn("_payload", lit(null).cast(rightSchema))
    val r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_bkt", bkt(col(rightTime)))
      .withColumn("_ord", lit(1))
      .withColumn("_side", lit(0))
      .withColumn("_tb", col(tieBreak))
      .withColumn("_payload", struct(rightPayloadCols.map(col): _*))
      .select(Seq(key, "_t", "_bkt", "_ord", "_side", "_tb", "_payload")
        .map(col): _*)

    // (2) latest right row per (key, bucket) — _t then _tb, the same order
    // the asof window uses
    val summary = r.groupBy(col(key), col("_bkt"))
      .agg(max_by(struct(col("_t"), col("_tb"), col("_payload")),
        struct(col("_t"), col("_tb"))).as("_w"))
    // (3) carry-in on the full key × bucket grid (bounded: right keys ×
    // nBuckets rows — never data-scale)
    val grid = summary.select(col(key)).distinct()
      .select(col(key),
        explode(sequence(lit(0), lit(nBuckets - 1))).as("_bkt"))
    val wCarry = Window.partitionBy(key).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = grid.join(summary, Seq(key, "_bkt"), "left")
      .withColumn("_c", last(col("_w"), ignoreNulls = true).over(wCarry))
      .filter(col("_c").isNotNull)
      .select(col(key), col("_c._t").as("_t"), col("_bkt"),
        lit(0).as("_ord"), lit(0).as("_side"), col("_c._tb").as("_tb"),
        col("_c._payload").as("_payload"))

    // (4) union-window, now per (key, bucket); carry rows (_ord=0) sort
    // before everything in their bucket
    val leftCols = left.columns.toSeq
    val unioned = l.select((leftCols.map(col) ++ Seq(col("_t"), col("_bkt"),
        col("_ord"), col("_side"), col("_tb"), col("_payload"))): _*)
      .unionByName(r, allowMissingColumns = true)
      .unionByName(carry, allowMissingColumns = true)
    val w = Window.partitionBy(col(key), col("_bkt"))
      .orderBy(col("_ord"), col("_t"), col("_side"), col("_tb"))
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
