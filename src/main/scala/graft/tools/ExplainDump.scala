package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: dump `.explain("formatted")` for named SparkEntry
  * queries to files (the plans/rNN before/after evidence).
  * Usage: runMain graft.tools.ExplainDump <outDir> <suffix> <q1> <q2> ...
  * (suffix = "before" | "after"; sf dir via SPARK_GRAFT_SF_DIR). */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      // run it first so AQE's final plan (the executed truth) is dumped
      df.write.format("noop").mode("overwrite").save()
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val executed = df.queryExecution.executedPlan.toString
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
        s"== explain(formatted) ==\n$formatted\n" +
          s"== executed plan (AQE final) ==\n$executed\n")
      println(s"dumped $n -> $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
