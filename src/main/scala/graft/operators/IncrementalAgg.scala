package graft.operators

import graft.sources.AtomicSwap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL AGGREGATE VIEW — materialized-view maintenance for the
  * MERGEABLE aggregate family: a persisted per-key view of count /
  * sum / min / max refreshes from each DELTA batch alone, never
  * rescanning the base. The missing piece between the engine's
  * one-shot aggregates (A3) and its incremental dedup stores: the
  * "running per-customer revenue" a dashboard reads does not want a
  * full fact-table pass per arriving batch.
  *
  * Semantics: APPEND-ONLY — deltas are new fact rows. Count and sum
  * merge by addition, min/max by re-minimizing (all four are
  * commutative monoids over inserts); deletions/updates would need
  * retractable aggregates (count can, min cannot without a full
  * re-derive) and are out of scope — the snapshot stores own
  * update-in-place state. Avg is served derived (`sum/n`) at read.
  *
  * Scale posture: a refresh is partial-aggregate(delta) ⊎ view → one
  * groupBy on the key — O(|view| + |delta|) per batch versus
  * O(|base|) recompute, the same asymptotic win the incremental dedup
  * stores carry. The delta side pre-reduces map-side (two-phase agg)
  * before it ever shuffles.
  *
  * Durability: [[refreshStore]] is EXACTLY-ONCE per `batchId` — the
  * view and its applied-batch log live under one root and rewrite in
  * ONE [[graft.sources.AtomicSwap]] swap, so a crash leaves both or
  * neither, and an at-least-once redelivery of an applied batch is a
  * no-op instead of a silent double count. */
object IncrementalAgg {

  /** The view's shape: one row per `keyCol` carrying `n` (count) plus
    * `sum_<c>` / `min_<c>` / `max_<c>` for the listed columns. */
  final case class Spec(keyCol: String, sums: Seq[String] = Nil,
      mins: Seq[String] = Nil, maxs: Seq[String] = Nil) {
    require(sums.distinct == sums && mins.distinct == mins &&
      maxs.distinct == maxs, "duplicate column in an aggregate family")
    require(!(sums ++ mins ++ maxs).contains(keyCol),
      s"the key column '$keyCol' cannot be aggregated")
    private[operators] def outCols: Seq[String] =
      Seq("n") ++ sums.map("sum_" + _) ++ mins.map("min_" + _) ++
        maxs.map("max_" + _)
  }

  /** Partial aggregate of raw fact rows — used for the initial build
    * AND for every delta (the partial IS the merge element). */
  def partial(df: DataFrame, spec: Spec): DataFrame = {
    val aggs = Seq(count(lit(1)).as("n")) ++
      spec.sums.map(c => sum(col(c)).as(s"sum_$c")) ++
      spec.mins.map(c => min(col(c)).as(s"min_$c")) ++
      spec.maxs.map(c => max(col(c)).as(s"max_$c"))
    df.groupBy(col(spec.keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge a delta's raw rows into the view: one partial over the
    * delta, one union, one re-fold on the key. Never touches base. */
  def refresh(view: DataFrame, delta: DataFrame, spec: Spec): DataFrame =
    mergeViews(view, partial(delta, spec), spec)

  /** Merge two partial views (associative — refresh folds through
    * here, and a distributed rebuild can tree-merge shards). */
  def mergeViews(a: DataFrame, b: DataFrame, spec: Spec): DataFrame = {
    val aggs = Seq(sum(col("n")).cast("long").as("n")) ++
      spec.sums.map(c => sum(col(s"sum_$c")).as(s"sum_$c")) ++
      spec.mins.map(c => min(col(s"min_$c")).as(s"min_$c")) ++
      spec.maxs.map(c => max(col(s"max_$c")).as(s"max_$c"))
    a.select(col(spec.keyCol) +: spec.outCols.map(col): _*)
      .unionByName(b.select(col(spec.keyCol) +: spec.outCols.map(col): _*))
      .groupBy(col(spec.keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  private def fsOf(spark: SparkSession, path: String) =
    org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)

  /** Build the persisted view from the base table. A fresh build is
    * a plain write (there is no prior state to protect — the swap
    * discipline starts with the first [[refreshStore]]); rebuilding
    * over an existing root replaces it wholesale. */
  def initStore(spark: SparkSession, root: String, base: DataFrame,
      spec: Spec): Unit = {
    val fs = fsOf(spark, root)
    // the stage-or-swap first-commit protocol (r20): a FRESH build
    // stages view + applied fully aside and lands by one rename; a
    // REBUILD over an existing root swaps the whole root atomically —
    // the old wipe-then-write-direct left (a) a window where old AND
    // new were both gone, (b) a root whose `view` landed but
    // `applied` did not, serving reads while refresh threw forever
    graft.sources.AtomicSwap.initOrRewrite(fs, root) { at =>
      partial(base, spec).write.mode("overwrite").parquet(s"$at/view")
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("batch_id",
            org.apache.spark.sql.types.StringType))))
        .write.mode("overwrite").parquet(s"$at/applied")
    }
  }

  /** The current view (recovering any interrupted swap first). */
  def readStore(spark: SparkSession, root: String): DataFrame = {
    AtomicSwap.recover(fsOf(spark, root), root)
    spark.read.parquet(s"$root/view")
  }

  /** Apply one delta batch EXACTLY ONCE: an already-applied
    * `batchId` returns false untouched (at-least-once inputs are
    * safe); otherwise the refreshed view and the extended applied-id
    * log swap in together (crash → both or neither). Single-writer,
    * like every AtomicSwap path. */
  def refreshStore(spark: SparkSession, root: String, batchId: String,
      delta: DataFrame, spec: Spec): Boolean = {
    val fs = fsOf(spark, root)
    AtomicSwap.recover(fs, root)
    val applied = spark.read.parquet(s"$root/applied")
    if (applied.filter(col("batch_id") === batchId).limit(1)
        .collect().nonEmpty) false
    else {
      import spark.implicits._
      val next = refresh(spark.read.parquet(s"$root/view"), delta, spec)
        .localCheckpoint(true)
      val ids = applied.unionByName(Seq(batchId).toDF("batch_id"))
        .localCheckpoint(true)
      AtomicSwap.rewrite(fs, root) { tmp =>
        next.write.mode("overwrite").parquet(s"$tmp/view")
        ids.write.mode("overwrite").parquet(s"$tmp/applied")
      }
      true
    }
  }
}
