package graft.sources

import graft.SparkSpec

/** The swap invariant under simulated crashes: a rerun after ANY
  * interruption point recovers the data instead of deleting it (the
  * failure mode of a naive delete-leftovers-first swap: crash between
  * the renames, rerun deletes both surviving copies). */
class AtomicSwapSpec extends SparkSpec {

  private def fs = new org.apache.hadoop.fs.Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def mkData(path: String, n: Int): Unit = {
    import spark.implicits._
    (1 to n).toDF("v").write.mode("overwrite").parquet(path)
  }

  private def rows(path: String): Long = spark.read.parquet(path).count()

  private def rewriteDouble(path: String): Unit =
    AtomicSwap.rewrite(fs, path) { tmp =>
      import spark.implicits._
      spark.read.parquet(path).as[Int].map(_ * 2).toDF("v")
        .write.mode("overwrite").parquet(tmp)
    }

  test("normal rewrite replaces the data and clears scaffolding") {
    val p = java.nio.file.Files.createTempDirectory("swap_n").toString + "/d"
    mkData(p, 10)
    rewriteDouble(p)
    assert(rows(p) === 10)
    assert(spark.read.parquet(p).collect().map(_.getInt(0)).sum === 110)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(p + "_compacting")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(p + "_precompact")))
  }

  test("crash between the renames: rerun restores the original and works") {
    val p = java.nio.file.Files.createTempDirectory("swap_c").toString + "/d"
    mkData(p, 10)
    // simulate the exact mid-swap crash state: live moved aside, the
    // replacement still at the tmp name
    mkData(p + "_compacting", 99)
    assert(fs.rename(new org.apache.hadoop.fs.Path(p),
      new org.apache.hadoop.fs.Path(p + "_precompact")))
    // a rerun must NOT delete either surviving copy before recovering
    rewriteDouble(p)
    assert(rows(p) === 10, "original data lost by rerun")
  }

  test("crash after the original was deleted: the replacement is promoted") {
    val p = java.nio.file.Files.createTempDirectory("swap_t").toString + "/d"
    // only the finished replacement survives (crash after old-delete
    // started... i.e. live gone, no precompact)
    mkData(p + "_compacting", 7)
    rewriteDouble(p)
    assert(rows(p) === 7)
  }

  test("nothing to recover: missing path fails loudly, deletes nothing") {
    val p = java.nio.file.Files.createTempDirectory("swap_m").toString + "/d"
    intercept[java.io.FileNotFoundException] { rewriteDouble(p) }
  }
}
