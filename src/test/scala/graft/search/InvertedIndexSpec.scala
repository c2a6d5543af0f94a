package graft.search

import graft.SparkSpec
import org.apache.spark.sql.Row

class InvertedIndexSpec extends SparkSpec {

  test("index probe returns exactly q77's BM25 rows; the probe is " +
    "bucket-pruned with the term filter pushed to the scan") {
    val dir = sf("sf0.001")
    val docs = graft.Tables.load(spark, dir, "documents")
    val path = java.nio.file.Files.createTempDirectory("graft_inv").toString
    InvertedIndex.build(docs, path, nBuckets = 64)

    val terms = Seq("join", "hash", "window")
    val probe = InvertedIndex.search(spark, path, terms)
    val got = probe.collect()
      .map { case Row(r: Long, d: Long, s: String) => (r, d, s) }.toSeq
    val viaScan = graft.queries.TextQueries.q77Bm25Topk(spark, dir)
      .collect()
      .map { case Row(r: Long, d: Long, s: String) => (r, d, s) }.toSeq
    assert(got === viaScan)
    assert(got.nonEmpty)

    // the probe reads only the query terms' buckets (file-listing
    // pruning) and pushes the term IN-filter into the parquet scan
    val p = probe.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("PartitionFilters") && p.contains("bucket"),
      s"no bucket pruning in:\n$p")
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("In(w,") || pushed.contains("In(w "),
      s"term filter not pushed: $pushed")
  }

  test("incremental append equals a full rebuild: identical probes and " +
    "additive stats; compaction collapses small files") {
    val dir = sf("sf0.001")
    val docs = graft.Tables.load(spark, dir, "documents")
    val incr = java.nio.file.Files.createTempDirectory("graft_inv_i").toString
    val full = java.nio.file.Files.createTempDirectory("graft_inv_f").toString
    InvertedIndex.build(docs.filter(org.apache.spark.sql.functions
      .col("doc_id") < 200), incr, nBuckets = 32)
    Seq((200, 350), (350, 500)).foreach { case (lo, hi) =>
      InvertedIndex.append(docs.filter(
        org.apache.spark.sql.functions.col("doc_id") >= lo &&
          org.apache.spark.sql.functions.col("doc_id") < hi), incr)
    }
    InvertedIndex.build(docs, full, nBuckets = 32)

    def stats(p: String) = spark.read.parquet(s"$p/_stats")
      .select("n_docs", "total_tokens").head
    assert(stats(incr) === stats(full))
    def hits(p: String) = InvertedIndex
      .search(spark, p, Seq("join", "hash", "window")).collect()
      .map { case Row(r: Long, d: Long, s: String) => (r, d, s) }.toSeq
    val before = hits(incr)
    assert(before === hits(full))
    val (nb, na) = InvertedIndex.compact(spark, incr)
    assert(na < nb, s"$nb -> $na files")
    assert(hits(incr) === before)
  }

  test("streaming ingest: per-batch append converges to the full index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val dir = sf("sf0.001")
    val docs = graft.Tables.load(spark, dir, "documents")
    val path = java.nio.file.Files.createTempDirectory("graft_inv_s").toString
    InvertedIndex.build(docs.filter(col("doc_id") < 100), path, nBuckets = 32)

    val rest = docs.filter(col("doc_id") >= 100)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        InvertedIndex.append(batch, path, id)
      }.start()
    try {
      rest.grouped(150).foreach { g =>
        input.addData(g); q.processAllAvailable()
      }
    } finally q.stop()

    val full = java.nio.file.Files.createTempDirectory("graft_inv_sf").toString
    InvertedIndex.build(docs, full, nBuckets = 32)
    def hits(p: String) = InvertedIndex
      .search(spark, p, Seq("join", "hash", "window")).collect()
      .map { case Row(r: Long, d: Long, s: String) => (r, d, s) }.toSeq
    assert(hits(path) === hits(full))
  }

  test("append replay guard: a re-delivered foreachBatch id is a no-op") {
    import org.apache.spark.sql.functions.col
    val dir = sf("sf0.001")
    val docs = graft.Tables.load(spark, dir, "documents")
    val path = java.nio.file.Files.createTempDirectory("graft_inv_r").toString
    InvertedIndex.build(docs.filter(col("doc_id") < 300), path, nBuckets = 32)
    val batch = docs.filter(col("doc_id") >= 300)
    InvertedIndex.append(batch, path, batchId = 0L)
    def state() = (
      spark.read.parquet(s"$path/_stats")
        .select("n_docs", "total_tokens", "last_batch").head,
      InvertedIndex.search(spark, path, Seq("join", "hash", "window"))
        .collect().map(_.toSeq).toSeq)
    val once = state()
    // Spark's foreachBatch contract: a failed batch is re-run with the
    // SAME id — the watermark must make the replay a no-op, not a
    // double-count of every tf in the batch
    InvertedIndex.append(batch, path, batchId = 0L)
    assert(state() === once)
    // the next id still appends (watermark advanced, not frozen)
    assert(once._1.getLong(2) === 0L)
  }

  // --- staged-append crash idempotency -------------------------------
  // The protocol's invariant: replaying a batch after a crash at ANY
  // point yields byte-identical stats and probe rows to a clean append.
  // A unit test cannot kill the JVM, so the failpoint hook throws at the
  // exact protocol steps a crash would interrupt.

  private def crashState(p: String) = (
    spark.read.parquet(s"$p/_stats")
      .select("n_docs", "n_tok_docs", "total_tokens", "last_batch").head,
    InvertedIndex.search(spark, p, Seq("join", "hash", "window"))
      .collect().map(_.toSeq).toSeq)

  private def withCrashAt[T](point: String)(f: => T): Unit = {
    InvertedIndex.failpoint =
      name => if (name == point) throw new RuntimeException(s"crash@$point")
    try intercept[RuntimeException](f)
    finally InvertedIndex.failpoint = _ => ()
  }

  test("a crash between the postings move and the stats rewrite " +
    "replays without duplicating postings") {
    import org.apache.spark.sql.functions.col
    val dir = sf("sf0.001")
    val docs = graft.Tables.load(spark, dir, "documents")
    val base = docs.filter(col("doc_id") < 300)
    val batch = docs.filter(col("doc_id") >= 300)

    val clean = java.nio.file.Files.createTempDirectory("graft_inv_c").toString
    InvertedIndex.build(base, clean, nBuckets = 32)
    InvertedIndex.append(batch, clean, batchId = 0L)
    val expected = crashState(clean)

    for (point <- Seq("staged", "moved")) {
      val p = java.nio.file.Files.createTempDirectory(s"graft_inv_$point")
        .toString
      InvertedIndex.build(base, p, nBuckets = 32)
      withCrashAt(point)(InvertedIndex.append(batch, p, batchId = 0L))
      // the crashed attempt left a staging dir; the live stats must not
      // have been advanced past the watermark
      assert(spark.read.parquet(s"$p/_stats").head
        .getAs[Long]("last_batch") === -1L, s"stats leaked at $point")
      // foreachBatch's contract: the failed batch is re-run with the
      // same id — the replay must complete the batch exactly once
      InvertedIndex.append(batch, p, batchId = 0L)
      assert(crashState(p) === expected, s"crash at $point diverged")
      // and a SECOND replay of the now-applied id is a no-op
      InvertedIndex.append(batch, p, batchId = 0L)
      assert(crashState(p) === expected, s"re-replay after $point diverged")
    }
  }

  test("a crash after the stats rewrite but before staging cleanup " +
    "does not double-count the batch on the next append") {
    import org.apache.spark.sql.functions.col
    val dir = sf("sf0.001")
    val docs = graft.Tables.load(spark, dir, "documents")
    val base = docs.filter(col("doc_id") < 200)
    val b0 = docs.filter(col("doc_id") >= 200 && col("doc_id") < 350)
    val b1 = docs.filter(col("doc_id") >= 350)

    val clean = java.nio.file.Files.createTempDirectory("graft_inv_c2").toString
    InvertedIndex.build(base, clean, nBuckets = 32)
    InvertedIndex.append(b0, clean, batchId = 0L)
    InvertedIndex.append(b1, clean, batchId = 1L)
    val expected = crashState(clean)

    val p = java.nio.file.Files.createTempDirectory("graft_inv_c3").toString
    InvertedIndex.build(base, p, nBuckets = 32)
    withCrashAt("stats")(InvertedIndex.append(b0, p, batchId = 0L))
    // batch 0 IS applied (stats wrote before the crash); only the
    // staging dir lingers — the next append must discard it, not
    // re-apply its delta
    InvertedIndex.append(b1, p, batchId = 1L)
    assert(crashState(p) === expected)
  }

  test("recovery discards a stage whose sentinel never committed, but " +
    "refuses to treat a transient read error as a crashed stage") {
    import org.apache.spark.sql.functions.col
    val dir = sf("sf0.001")
    val docs = graft.Tables.load(spark, dir, "documents")
    val p = java.nio.file.Files.createTempDirectory("graft_inv_sen").toString
    InvertedIndex.build(docs.filter(col("doc_id") < 300), p, nBuckets = 32)
    val before = crashState(p)

    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // (a) a stage that crashed BEFORE its sentinel committed: postings
    // present, _delta holding only an in-flight _temporary dir — the
    // live index was never touched, so recovery discards the dir whole
    val dead = s"$p/_staging/adhoc-dead"
    docs.filter(col("doc_id") >= 300).limit(5)
      .selectExpr("doc_id", "cast(1.0 as double) dl", "'zzfaketoken' w",
        "cast(1.0 as double) tf", "array(0) pos",
        "cast(0 as bigint) bucket")
      .write.partitionBy("bucket").parquet(dead)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dead/_delta/_temporary"))
    InvertedIndex.append(docs.filter(col("doc_id") >= 300), p)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dead)),
      "uncommitted stage not discarded")
    // the discarded stage's fake postings must not have leaked into the
    // live index: only the real append moved anything
    assert(InvertedIndex.search(spark, p, Seq("zzfaketoken"), k = 5)
      .count() === 0)

    // (b) a COMMITTED sentinel whose parquet footer is unreadable is a
    // transient/corruption error: recovery must PROPAGATE, not silently
    // delete the fully staged batch
    val stuck = s"$p/_staging/adhoc-stuck"
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$stuck/_delta"))
    val bad = fs.create(new org.apache.hadoop.fs.Path(
      s"$stuck/_delta/part-00000.parquet"), true)
    bad.write("not a parquet file".getBytes); bad.close()
    intercept[Exception](
      InvertedIndex.append(docs.filter(col("doc_id") >= 300), p))
    assert(fs.exists(new org.apache.hadoop.fs.Path(stuck)),
      "staged batch deleted on a read error")
    fs.delete(new org.apache.hadoop.fs.Path(stuck), true)
  }

  test("ad-hoc (batchId-less) appends recover exactly once too") {
    import org.apache.spark.sql.functions.col
    val dir = sf("sf0.001")
    val docs = graft.Tables.load(spark, dir, "documents")
    val base = docs.filter(col("doc_id") < 300)
    val batch = docs.filter(col("doc_id") >= 300)

    val clean = java.nio.file.Files.createTempDirectory("graft_inv_a0").toString
    InvertedIndex.build(base, clean, nBuckets = 32)
    InvertedIndex.append(batch, clean)
    val expected = crashState(clean)

    val p = java.nio.file.Files.createTempDirectory("graft_inv_a1").toString
    InvertedIndex.build(base, p, nBuckets = 32)
    withCrashAt("moved")(InvertedIndex.append(batch, p))
    // no batch id to replay against: the next WRITER operation (here a
    // compact) completes the stage from its sentinel instead
    InvertedIndex.compact(spark, p)
    assert(crashState(p)._1 === expected._1)
    assert(crashState(p)._2 === expected._2)
  }

  // --- conjunctive + phrase probes (format v2) ------------------------

  test("conjunctive probe returns exactly q88's scan rows, and only " +
    "docs containing every term are scored") {
    val dir = sf("sf0.001")
    val docs = graft.Tables.load(spark, dir, "documents")
    val path = java.nio.file.Files.createTempDirectory("graft_inv_cj").toString
    InvertedIndex.build(docs, path, nBuckets = 64)
    val terms = Seq("join", "hash", "window")
    val got = InvertedIndex.searchConjunctive(spark, path, terms).collect()
      .map { case Row(r: Long, d: Long, s: String) => (r, d, s) }.toSeq
    val scan = graft.queries.TextQueries.q88Bm25And(spark, dir).collect()
      .map { case Row(r: Long, d: Long, s: String) => (r, d, s) }.toSeq
    assert(got === scan)
    assert(got.nonEmpty)
    // the AND-membership window must sit AFTER the term filter — the
    // windowed slice is |query terms| postings, never the whole index.
    // A term IN-filter PUSHED INTO the parquet scan proves it: pushdown
    // only happens below the window (a filter above one can't cross it)
    val phys = InvertedIndex.searchConjunctive(spark, path, terms)
    phys.collect()
    val pstr = phys.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val pushed = pstr.linesIterator.find(_.contains("PushedFilters"))
      .getOrElse("")
    assert(pushed.contains("In(w,") || pushed.contains("In(w "),
      s"term filter not pushed below the AND window: $pushed")
  }

  test("phrase probe returns exactly the scan twin's rows; adjacency " +
    "counted in order, not bag-of-words") {
    val dir = sf("sf0.001")
    val docs = graft.Tables.load(spark, dir, "documents")
    val path = java.nio.file.Files.createTempDirectory("graft_inv_ph").toString
    InvertedIndex.build(docs, path, nBuckets = 64)
    val phrase = Seq("hash", "join")
    val got = InvertedIndex.searchPhrase(spark, path, phrase).collect()
      .map { case Row(r: Long, d: Long, s: String) => (r, d, s) }.toSeq
    val scan = graft.queries.TextQueries.q89ScanTwin(spark, dir).collect()
      .map { case Row(r: Long, d: Long, s: String) => (r, d, s) }.toSeq
    assert(got === scan)
    assert(got.nonEmpty)
    // order sensitivity: the reversed phrase is a different query — on a
    // synthetic doc set where only one order occurs the other is empty
    import spark.implicits._
    val tiny = Seq((1L, "alpha hash join beta"), (2L, "join hash gamma"))
      .toDF("doc_id", "text")
    val tpath = java.nio.file.Files.createTempDirectory("graft_inv_ph2")
      .toString
    InvertedIndex.build(tiny, tpath, nBuckets = 4)
    val fwd = InvertedIndex.searchPhrase(spark, tpath, Seq("hash", "join"))
      .collect().map(_.getLong(1)).toSeq
    val rev = InvertedIndex.searchPhrase(spark, tpath, Seq("join", "hash"))
      .collect().map(_.getLong(1)).toSeq
    assert(fwd === Seq(1L))
    assert(rev === Seq(2L))
  }

  test("a phrase of a single repeated term counts self-adjacency once " +
    "per run position") {
    import spark.implicits._
    val tiny = Seq((1L, "go go go stop"), (2L, "go stop go"))
      .toDF("doc_id", "text")
    val tpath = java.nio.file.Files.createTempDirectory("graft_inv_ph3")
      .toString
    InvertedIndex.build(tiny, tpath, nBuckets = 4)
    // doc 1 has positions(go)=[0,1,2]: p=0 and p=1 are followed by
    // another 'go' -> tf=2; doc 2 has no adjacent pair -> excluded
    val rows = InvertedIndex.searchPhrase(spark, tpath, Seq("go", "go"))
      .collect().map(_.getLong(1)).toSeq
    assert(rows === Seq(1L))
  }

  // --- format-v1 compatibility (pre-positions layout) -----------------

  /** Forge a legacy v1 index: same postings minus the `pos` column,
    * `_stats.format` stamped 1 — byte-layout-equivalent to what a
    * pre-positional build wrote. */
  private def forgeV1(path: String): String = {
    import org.apache.spark.sql.functions.lit
    val v1 = java.nio.file.Files.createTempDirectory("graft_inv_v1").toString
    spark.read.parquet(path).drop("pos")
      .write.mode("overwrite").partitionBy("bucket").parquet(v1)
    spark.read.parquet(s"$path/_stats")
      .withColumn("format", lit(1)).coalesce(1)
      .write.mode("overwrite").parquet(s"$v1/_stats")
    v1
  }

  test("a v1 (positionless) index serves bag-of-words and conjunctive " +
    "probes, refuses phrase probes loudly, and appends stay v1") {
    import org.apache.spark.sql.functions.col
    val dir = sf("sf0.001")
    val docs = graft.Tables.load(spark, dir, "documents")
    val terms = Seq("join", "hash", "window")
    val v2 = java.nio.file.Files.createTempDirectory("graft_inv_v2").toString
    InvertedIndex.build(docs, v2, nBuckets = 32)
    val v1 = forgeV1(v2)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { case Row(r: Long, d: Long, s: String) => (r, d, s) }
        .toSeq
    assert(rows(InvertedIndex.search(spark, v1, terms)) ===
      rows(InvertedIndex.search(spark, v2, terms)))
    assert(rows(InvertedIndex.searchConjunctive(spark, v1, terms)) ===
      rows(InvertedIndex.searchConjunctive(spark, v2, terms)))
    val e = intercept[IllegalArgumentException](
      InvertedIndex.searchPhrase(spark, v1, Seq("hash", "join")))
    assert(e.getMessage.contains("positional") &&
      e.getMessage.contains("rebuild"),
      s"refusal must name the fix: ${e.getMessage}")

    // the mixed path: appending into v1 drops pos so the directory's
    // file schema never forks; probes keep working, phrase keeps refusing
    val partial = java.nio.file.Files.createTempDirectory("graft_inv_v1p")
      .toString
    InvertedIndex.build(docs.filter(col("doc_id") < 300), partial,
      nBuckets = 32)
    val v1p = forgeV1(partial)
    InvertedIndex.append(docs.filter(col("doc_id") >= 300), v1p)
    assert(!spark.read.parquet(v1p).columns.contains("pos"),
      "append forked the v1 schema with a pos column")
    assert(rows(InvertedIndex.search(spark, v1p, terms)) ===
      rows(InvertedIndex.search(spark, v2, terms)))
    intercept[IllegalArgumentException](
      InvertedIndex.searchPhrase(spark, v1p, Seq("hash", "join")))

    // upgrade is REBUILD-ONLY (positions cannot be recovered from v1
    // postings): build over the same corpus at the same path restores
    // phrase service — the documented migration
    InvertedIndex.build(docs, v1p, nBuckets = 32)
    assert(rows(InvertedIndex.searchPhrase(spark, v1p, Seq("hash", "join")))
      === rows(InvertedIndex.searchPhrase(spark, v2, Seq("hash", "join"))))
  }

  test("different term sets hit different bucket subsets") {
    val dir = sf("sf0.001")
    val docs = graft.Tables.load(spark, dir, "documents")
    val path = java.nio.file.Files.createTempDirectory("graft_inv2").toString
    InvertedIndex.build(docs, path, nBuckets = 64)
    // a probe for one term must not read the whole index: count the
    // bucket dirs on disk vs what one term can touch (exactly 1)
    val dirs = new java.io.File(path).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("bucket="))
    assert(dirs > 8, s"fixture vocab spread over only $dirs buckets")
    val one = InvertedIndex.search(spark, path, Seq("join"), k = 5)
    val p = one.queryExecution.executedPlan.toString
    one.collect()
    // partition filter present; a single term hashes to a single bucket
    assert(p.contains("PartitionFilters"), s"no pruning:\n$p")
  }
}
