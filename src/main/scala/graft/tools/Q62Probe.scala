package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Scratch diagnostic for q62 round counts/timing (not part of the API). */
object Q62Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val p = graft.queries.TextQueries.q48SimhashPairs(spark, dir).count()
    val t1 = System.nanoTime()
    val n = graft.queries.TextQueries.q62DupClusters(spark, dir).count()
    val t2 = System.nanoTime()
    val n2 = graft.queries.TextQueries.q62DupClusters(spark, dir).count()
    val t3 = System.nanoTime()
    println(s"PROBE pairs=$p q48=${(t1 - t0) / 1e9}s " +
      s"q62cold=${(t2 - t1) / 1e9}s q62warm=${(t3 - t2) / 1e9}s " +
      s"rounds=${graft.queries.TextQueries.q62LastRounds} rows=$n/$n2")
    spark.stop()
  }
}
