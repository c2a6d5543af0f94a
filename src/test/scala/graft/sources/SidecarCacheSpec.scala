package graft.sources

import graft.SparkSpec

/** The sidecar memo's correctness contract: a cached value is served
  * only while the directory's file inventory is byte-identical, where
  * the inventory keys files by their path RELATIVE to the sidecar root
  * (basenames alone cannot distinguish same-named files that moved
  * between subdirectories). */
class SidecarCacheSpec extends SparkSpec {

  private def write(dir: java.nio.file.Path, rel: String, body: String,
      mtime: Long): Unit = {
    val f = dir.resolve(rel)
    java.nio.file.Files.createDirectories(f.getParent)
    java.nio.file.Files.writeString(f, body)
    f.toFile.setLastModified(mtime)
  }

  test("unchanged inventory serves the memo; any rewrite reloads") {
    val d = java.nio.file.Files.createTempDirectory("sc_basic")
    write(d, "part-0", "aaaa", 1000000L)
    var loads = 0
    def get(): Int =
      SidecarCache.cached(spark, d.toString) { loads += 1; loads }
    assert(get() == 1)
    assert(get() == 1) // memo hit, no reload
    write(d, "part-0", "bbbbbb", 2000000L) // new length + mtime
    assert(get() == 2)
  }

  test("same-named same-length same-mtime files in different subdirs " +
      "produce different fingerprints") {
    val d = java.nio.file.Files.createTempDirectory("sc_nested")
    write(d, "x/part-0", "aaaa", 1000000L)
    var loads = 0
    def get(): Int =
      SidecarCache.cached(spark, d.toString) { loads += 1; loads }
    assert(get() == 1)
    // move the file to a sibling subdir, SAME basename/length/mtime:
    // a basename-keyed fingerprint would be identical and serve stale
    java.nio.file.Files.createDirectories(d.resolve("y"))
    java.nio.file.Files.move(d.resolve("x/part-0"), d.resolve("y/part-0"))
    d.resolve("y/part-0").toFile.setLastModified(1000000L)
    assert(get() == 2)
  }

  test("absent dir never caches: each access reloads") {
    val d = java.nio.file.Files.createTempDirectory("sc_absent")
    java.nio.file.Files.delete(d)
    var loads = 0
    def get(): Int =
      SidecarCache.cached(spark, d.toString) { loads += 1; loads }
    assert(get() == 1)
    assert(get() == 2)
  }
}
