package graft.tools

import graft.Tables
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (not part of the API): run every bench entry warm and
  * record wall seconds alongside job/stage/task counts and summed task time,
  * so per-query scheduling overhead is separable from compute.
  * Usage: runMain graft.tools.BenchProfile [sfDir] [filterSubstr]
  * Output: target/profile.json (one JSON object keyed by query).
  */
object BenchProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val filter = args.lift(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // identical warmup posture to Bench
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    try graft.queries.BucketedQueries.ensureTables(spark, sfDir)
    catch { case _: Throwable => () }

    // in-JVM sampler: histogram the top engine frame per RUNNABLE thread
    // over the TIMED runs, so the whole-sweep driver overhead is
    // attributable (enable with SPARK_GRAFT_PROFILE_SAMPLE=1)
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = false
    if (sys.env.get("SPARK_GRAFT_PROFILE_SAMPLE").contains("1")) {
      val sampler = new Thread(() => {
        while (true) {
          if (sampling) {
            Thread.getAllStackTraces.forEach { (t, st) =>
              if (t.getState == Thread.State.RUNNABLE && st.nonEmpty &&
                  t.getName != "sampler") {
                val top = st.take(48).find { f =>
                  val c = f.getClassName
                  c.startsWith("org.apache.spark") ||
                    c.startsWith("org.codehaus") ||
                    c.startsWith("java.util.zip") ||
                    c.startsWith("graft")
                }.map { f =>
                  val c = f.getClassName
                  val tag =
                    if (c.startsWith("org.apache.spark.sql.catalyst"))
                      c.split("\\.").take(6).mkString(".")
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

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        taskMs += Option(s.stageInfo.taskMetrics)
          .map(_.executorRunTime).getOrElse(0L)
      }
    })

    val entries = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1 == "q57_zorder_scan")
      .filter(e => filter.forall(e._1.contains))
    val out = new StringBuilder("{\n")
    entries.zipWithIndex.foreach { case ((name, fn), i) =>
      try {
        fn(spark, sfDir).count() // warm run: builds fixtures, JIT, codegen
        Thread.sleep(5)
        jobs = 0; stages = 0; tasks = 0; taskMs = 0L
        val t0 = System.nanoTime()
        sampling = true
        fn(spark, sfDir).count()
        sampling = false
        val wall = (System.nanoTime() - t0) / 1e9
        // listener bus is async; give it a beat to drain
        Thread.sleep(30)
        out.append(f"""  "$name": {"wall": $wall%.3f, "jobs": $jobs, "stages": $stages, "tasks": $tasks, "task_sec": ${taskMs / 1e3}%.3f}""")
        out.append(if (i == entries.size - 1) "\n" else ",\n")
        println(f"$name%-30s wall=$wall%7.3f jobs=$jobs%3d stages=$stages%3d tasks=$tasks%5d task_sec=${taskMs / 1e3}%8.3f")
      } catch { case e: Throwable =>
        out.append(s"""  "$name": {"error": "${e.getClass.getSimpleName}"}""")
        out.append(if (i == entries.size - 1) "\n" else ",\n")
        println(s"$name FAILED: ${e.getMessage}")
      }
    }
    out.append("}\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/target/profile.json"),
      out.toString)
    if (sys.env.get("SPARK_GRAFT_PROFILE_SAMPLE").contains("1")) {
      import scala.jdk.CollectionConverters._
      println("== sweep sample histogram (3ms ticks, timed runs only) ==")
      hist.asScala.toSeq.sortBy(-_._2).take(60).foreach { case (k, v) =>
        println(f"$v%7d  $k")
      }
    }
    spark.stop()
  }
}
