package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: time a named SparkEntry query at a given sf dir and
  * summarize its executed plan (not part of the API).
  * Usage: runMain graft.tools.PlanProbe <queryName> [sfDir] [runs] */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    var df = fn(spark, dir)
    for (r <- 1 to runs) {
      df = fn(spark, dir)
      val t0 = System.nanoTime()
      df.collect()
      println(s"RUN$r ${(System.nanoTime() - t0) / 1e9}s")
    }
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    println("exchanges=" + p.linesIterator.count(_.contains("Exchange")))
    println("reused=" + p.linesIterator.count(_.contains("ReusedExchange")))
    println("scans=" + p.linesIterator.count(_.contains("Scan parquet")))
    println("sorts=" + p.linesIterator.count(_.contains("Sort ")))
    println("fallback=" + p.linesIterator.count(_.contains("Fallback")))
    if (args.contains("--plan")) println(p)
    spark.stop()
  }
}
