package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic for the q68 hot path (not part of the API):
  * isolates the cached-tf scan, the dfc broadcast build and the window
  * so the 8-task-sec cached-scan anomaly can be attributed.
  * Usage: runMain graft.tools.Q68Probe [sfDir] */
object Q68Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.TextQueries
    val d = Tables.load(spark, dir, "documents")

    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      val t1 = System.nanoTime(); f
      println(f"$label%-40s ${(t1 - t0) / 1e9}%7.3f / ${(System.nanoTime() - t1) / 1e9}%7.3f s")
    }

    val tfPlan = d.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))

    time("tf recompute, no cache, count") {
      tfPlan.write.format("noop").mode("overwrite").save()
    }
    val tfCached = tfPlan.persist()
    tfCached.count()
    time("cached tf scan -> noop") {
      tfCached.write.format("noop").mode("overwrite").save()
    }
    time("cached tf groupBy(w) agg") {
      tfCached.groupBy("w").agg(count(lit(1))).write.format("noop").mode("overwrite").save()
    }
    time("cached tf join bcast dfc + window") {
      val dfc = tfCached.groupBy("w").agg(count(lit(1)).as("df"))
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("_score").desc, col("w"))
      tfCached.join(broadcast(dfc), "w")
        .withColumn("_score", round(col("tf") * log(lit(5000.0) / col("df")), 6))
        .withColumn("rk", row_number().over(win).cast("long"))
        .filter(col("rk") <= 3)
        .write.format("noop").mode("overwrite").save()
    }
    tfCached.unpersist(true)
    val tfCoalesced = tfPlan.coalesce(4).persist()
    tfCoalesced.count()
    time("coalesce(4)-cached tf scan -> noop") {
      tfCoalesced.write.format("noop").mode("overwrite").save()
    }
    time("coalesce(4) join bcast dfc + window") {
      val dfc = tfCoalesced.groupBy("w").agg(count(lit(1)).as("df"))
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("_score").desc, col("w"))
      tfCoalesced.join(broadcast(dfc), "w")
        .withColumn("_score", round(col("tf") * log(lit(5000.0) / col("df")), 6))
        .withColumn("rk", row_number().over(win).cast("long"))
        .filter(col("rk") <= 3)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
