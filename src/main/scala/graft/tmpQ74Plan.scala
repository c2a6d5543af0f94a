import org.apache.spark.sql.SparkSession
object Q74Plan {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.configure(SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.queries.TextQueries.q74Containment(spark, "/root/testdata/sf0.1")
    val t0=System.nanoTime(); df.collect(); val t=(System.nanoTime()-t0)/1e9
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    println("TIME "+t)
    println("reused="+p.linesIterator.count(_.contains("ReusedExchange")))
    println("exchanges="+p.linesIterator.count(_.contains("Exchange hashpartitioning")))
    println("scans="+p.linesIterator.count(_.contains("Scan")))
    spark.stop()
  }
}
