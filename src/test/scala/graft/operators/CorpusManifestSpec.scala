package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The incremental corpus-build store's maintained invariant (the
  * q152 incremental-view contract): after any append/forget update,
  * the stored manifest equals the from-scratch build over the current
  * corpus — plus the parts the oracle cannot see: untouched shards
  * are NOT rewritten, updates are idempotent (the crash-repair path),
  * and an interrupted shard swap recovers on read. */
class CorpusManifestSpec extends SparkSpec {
  import spark.implicits._

  private val Shards = 8
  private val Budget = 50L

  private def corpus(ids: Seq[Long]) =
    ids.map(id => (id, 7L + id % 5)).toDF("doc_id", "ntok")

  private def freshPath(tag: String): String =
    s"/root/repo/target/tmp/cmspec_${tag}_" +
      spark.sparkContext.applicationId

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("shard", "pack_id").collect().map(_.toSeq).toSeq

  test("update after append+forget equals the from-scratch build, " +
    "recomputes only the affected shards, and leaves untouched " +
    "shard datasets physically unmodified") {
    val path = freshPath("inc")
    val v1Ids = (0L until 200L).filterNot(Seq(5L, 10L).contains) ++
      Seq(5L, 10L)
    CorpusManifest.init(spark, path, corpus(v1Ids), Budget, Shards)
    assert(CorpusManifest.version(spark, path) === 1L)
    // one update: append 3 new docs, forget 2 old ones
    val appended = Seq(1000L, 1001L, 1002L)
    val finalIds = (0L until 200L)
      .filterNot(Seq(5L, 10L).contains) ++ appended
    val affected = CorpusManifest.update(spark, path, corpus(finalIds),
      (appended ++ Seq(5L, 10L)).toDF("doc_id"), Budget, Shards)
    assert(CorpusManifest.version(spark, path) === 2L)
    assert(affected.nonEmpty && affected.size < Shards,
      s"5 changed ids must touch fewer than $Shards shards: $affected")
    // the stored v2 manifest IS the from-scratch build (the contract)
    val scratch = freshPath("scratch")
    CorpusManifest.init(spark, scratch, corpus(finalIds), Budget, Shards)
    assert(canon(CorpusManifest.read(spark, path)) ===
      canon(CorpusManifest.read(spark, scratch)))
    // untouched shards were not rewritten: their files' mtimes predate
    // the update (the swap replaces the whole shard dir)
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val untouched = (0 until Shards).filterNot(affected.contains)
    assert(untouched.nonEmpty)
    untouched.foreach { k =>
      val dir = new org.apache.hadoop.fs.Path(s"$path/s$k")
      val newest = fs.listStatus(dir).map(_.getModificationTime).max
      val touchedOldest = affected.map { a =>
        fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/s$a"))
          .map(_.getModificationTime).max
      }.min
      assert(newest < touchedOldest,
        s"shard s$k looks rewritten (mtime $newest >= $touchedOldest)")
    }
    // a FULL REBUILD over the existing store bumps PAST the old
    // generation — a version-keyed cache must see the change (r20:
    // committing "1" under the surviving "2" marker left version()
    // frozen across a rebuild)
    CorpusManifest.init(spark, path, corpus(finalIds), Budget, Shards)
    assert(CorpusManifest.version(spark, path) === 3L)
    assert(canon(CorpusManifest.read(spark, path)) ===
      canon(CorpusManifest.read(spark, scratch)))
  }

  test("re-running the same update is idempotent — the crash-repair " +
    "path after a mid-update failure") {
    val path = freshPath("idem")
    CorpusManifest.init(spark, path, corpus(0L until 100L),
      Budget, Shards)
    val finalC = corpus((0L until 100L) ++ Seq(500L))
    val changed = Seq(500L).toDF("doc_id")
    CorpusManifest.update(spark, path, finalC, changed, Budget, Shards)
    val after1 = canon(CorpusManifest.read(spark, path))
    CorpusManifest.update(spark, path, finalC, changed, Budget, Shards)
    assert(canon(CorpusManifest.read(spark, path)) === after1)
    assert(CorpusManifest.version(spark, path) === 3L) // v bumps, rows stable
  }

  test("an interrupted shard swap recovers on read: a shard left at " +
    "its _precompact name (crash between the two renames) serves " +
    "its complete pre-swap data") {
    val path = freshPath("crash")
    CorpusManifest.init(spark, path, corpus(0L until 120L),
      Budget, Shards)
    val before = canon(CorpusManifest.read(spark, path))
    // simulate the crash window: the live dir was moved aside and the
    // writer died before promoting the replacement
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val s0 = new org.apache.hadoop.fs.Path(s"$path/s0")
    assert(fs.rename(s0, new org.apache.hadoop.fs.Path(
      s"$path/s0_precompact")))
    assert(canon(CorpusManifest.read(spark, path)) === before)
    assert(fs.exists(s0)) // recovery restored the live name
  }
}
