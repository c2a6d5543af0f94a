package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: time a named SparkEntry query at a given sf dir and
  * summarize its executed plan (not part of the API).
  * Usage: runMain graft.tools.PlanProbe <queryName> [sfDir] [runs] */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    // flags (--sample/--plan) and k=v conf pairs may appear anywhere;
    // positionals are what remains (a bare "--sample" used to be eaten
    // as the data dir, and a conf pair threw in runs' toInt)
    val pos = args.filterNot(a => a.contains("=") || a.startsWith("--"))
    val name = pos(0)
    val dir = pos.lift(1).getOrElse("/root/testdata/sf0.1")
    val runs = pos.lift(2).map(_.toInt).getOrElse(2)
    var b = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
    // extra confs as k=v pairs anywhere in the arg list
    args.filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b = b.config(k, v)
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    // per-stage wall/task accounting for the LAST run only
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          if (record) {
            val si = s.stageInfo
            val ms = Option(si.taskMetrics).map(_.executorRunTime).getOrElse(0L)
            val wall = (for {
              a <- si.completionTime; b <- si.submissionTime
            } yield a - b).getOrElse(-1L)
            stageLog.add(f"stage ${si.stageId}%3d tasks=${si.numTasks}%4d " +
              f"wall=${wall / 1e3}%7.3f task_sec=${ms / 1e3}%8.3f  " +
              si.name.takeWhile(_ != '\n').take(90))
          }
      })
    var df = fn(spark, dir)
    // --sample: in-JVM sampler over the timed runs, histogramming the top
    // spark/janino/catalyst frame per RUNNABLE thread
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = false
    if (args.contains("--sample")) {
      val sampler = new Thread(() => {
        while (true) {
          if (sampling) {
            Thread.getAllStackTraces.forEach { (t, st) =>
              if (t.getState == Thread.State.RUNNABLE && st.nonEmpty &&
                  t.getName != "sampler") {
                val top = st.take(40).find { f =>
                  val c = f.getClassName
                  (c.startsWith("org.apache.spark") ||
                    c.startsWith("org.codehaus") ||
                    c.startsWith("java.util.zip") ||
                    c.startsWith("graft")) &&
                  !c.contains("SchedProbe")
                }.map { f =>
                  val c = f.getClassName
                  val tag =
                    if (c.startsWith("org.apache.spark.sql.catalyst")) c.split("\\.").take(6).mkString(".")
                    else c
                  tag + "." + f.getMethodName
                }.getOrElse("(" + t.getName.replaceAll("\\d+", "N") + ")")
                hist.merge(top, 1, (a: Integer, b: Integer) => a + b)
              }
            }
          }
          Thread.sleep(3)
        }
      }, "sampler")
      sampler.setDaemon(true); sampler.start()
    }
    for (r <- 1 to runs) {
      sampling = r > 1 && args.contains("--sample")
      val tb = System.nanoTime()
      df = fn(spark, dir)
      record = r == runs
      val t0 = System.nanoTime()
      df.collect()
      println(f"RUN$r build=${(t0 - tb) / 1e9}%.3f collect=${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    sampling = false
    Thread.sleep(100)
    import scala.jdk.CollectionConverters._
    stageLog.asScala.foreach(println)
    if (args.contains("--sample"))
      hist.asScala.toSeq.sortBy(-_._2).take(35).foreach { case (k, v) =>
        println(f"$v%6d  $k")
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
