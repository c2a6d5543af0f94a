package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (not part of the API): raw scheduler/task-dispatch
  * throughput — how much wall time an n-task no-op stage costs, and what
  * an empty job costs, independent of any engine code.
  * Usage: runMain graft.tools.SchedProbe */
object SchedProbe {
  def main(args: Array[String]): Unit = {
    val master = args.lift(0).getOrElse("local[32]")
    var b = graft.Tables.configure(SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
    // extra confs as k=v pairs after the master
    args.drop(1).filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b = b.config(k, v)
    }
    val spark = b.getOrCreate()
    println(s"master=$master extra=${args.drop(1).mkString(",")}")
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext

    def time(label: String, reps: Int)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => f)
      println(f"$label%-46s ${(System.nanoTime() - t0) / 1e9 / reps}%8.4f s/rep")
    }

    if (args.contains("loop")) {
      // tight loop with an in-JVM sampler: histogram the top engine frame
      // per busy thread so the per-job fixed cost can be attributed
      val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      @volatile var sampling = true
      val sampler = new Thread(() => {
        while (sampling) {
          val stacks = Thread.getAllStackTraces
          stacks.forEach { (t, st) =>
            if (t.getState == Thread.State.RUNNABLE && st.nonEmpty &&
                t.getName != "sampler") {
              val top = st.take(24).find(f =>
                f.getClassName.startsWith("org.apache.spark") ||
                f.getClassName.startsWith("java.util.zip") ||
                f.getClassName.startsWith("com.github.luben") ||
                f.getClassName.startsWith("net.jpountz") ||
                f.getClassName.startsWith("java.io"))
                .map(f => f.getClassName + "." + f.getMethodName)
                .getOrElse("(" + t.getName.replaceAll("\\d+", "N") + ") " +
                  st.head.getClassName + "." + st.head.getMethodName)
              hist.merge(top, 1, (a: Integer, b: Integer) => a + b)
            }
          }
          Thread.sleep(5)
        }
      }, "sampler")
      sampler.setDaemon(true); sampler.start()
      val t0 = System.nanoTime()
      var n = 0
      while (System.nanoTime() - t0 < 30e9) { sc.parallelize(1 to 1, 1).count(); n += 1 }
      sampling = false
      println(f"loop: $n jobs in 30s = ${30000.0 / n}%.2f ms/job")
      import scala.jdk.CollectionConverters._
      hist.asScala.toSeq.sortBy(-_._2).take(40).foreach { case (k, v) =>
        println(f"$v%6d  $k")
      }
      spark.stop(); return
    }
    time("rdd 1-task empty job", 20) {
      sc.parallelize(1 to 1, 1).count()
    }
    time("rdd 32-task empty job", 20) {
      sc.parallelize(1 to 32, 32).count()
    }
    time("rdd 256-task empty job", 5) {
      sc.parallelize(1 to 256, 256).count()
    }
    time("df range(1e6,32p) sum collect", 10) {
      spark.range(0, 1000000, 1, 32).selectExpr("sum(id)").collect()
    }
    time("df 32p shuffle (groupBy pmod)", 10) {
      spark.range(0, 100000, 1, 32).selectExpr("pmod(id,1000) k")
        .groupBy("k").count().write.format("noop").mode("overwrite").save()
    }
    val df = spark.range(0, 100000, 1, 32).selectExpr("id", "pmod(id,1000) k")
    val cached = df.persist(); cached.count()
    time("cached 32p scan -> noop", 10) {
      cached.write.format("noop").mode("overwrite").save()
    }
    println("done")
    spark.stop()
  }
}
