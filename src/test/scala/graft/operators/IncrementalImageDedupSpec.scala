package graft.operators

import graft.SparkSpec
import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

/** Incremental-vs-batch equivalence for PERCEPTUAL image dedup: probing
  * a media batch against the dHash store of the old corpus must flag
  * exactly the cross-split subset of what the all-pairs pipeline (q104)
  * finds on the union — same hash, same pigeonhole bands, same bound,
  * equal by construction; this spec holds the construction to it. */
class IncrementalImageDedupSpec extends SparkSpec {
  import spark.implicits._

  // q104's pinned fixtures split on ownership: bases are the corpus,
  // variants (the _dup/_near/_far rows) arrive as the batch
  private def split(): (Seq[(String, Array[Byte])], Seq[(String, Array[Byte])]) =
    PipelineQueries.dhashFixtureBytes.partition(f => !f._1.contains("_"))

  test("incremental probe equals the cross-split slice of q104's " +
    "all-pairs dedup; far decoys band-collide but do not match") {
    val (bases, variants) = split()
    val store = java.nio.file.Files
      .createTempDirectory("graft_imgdedup_store").toString
    IncrementalImageDedup.initStore(
      MultimodalOps.imageDHashes(bases.toDF("key", "bytes")), store)

    val batchHashes = MultimodalOps.imageDHashes(
      variants.toDF("key", "bytes"))
    val got = IncrementalImageDedup.findDups(batchHashes,
      IncrementalImageDedup.loadStore(spark, store))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet

    // ground truth: the all-pairs pipeline over the union, restricted
    // to cross-split pairs (base keys carry no '_', so base < variant
    // lexically is not guaranteed — normalize by membership), earliest
    // base match per variant
    val baseKeys = bases.map(_._1).toSet
    val all = MultimodalOps.dhashNearDupPairs(
      MultimodalOps.imageDHashes(
        PipelineQueries.dhashFixtureBytes.toDF("key", "bytes")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val expected = all.flatMap { case (a, b, d) =>
      if (baseKeys.contains(a) && !baseKeys.contains(b)) Some((b, a, d))
      else if (baseKeys.contains(b) && !baseKeys.contains(a)) Some((a, b, d))
      else None
    }.groupBy(_._1).map { case (_, ms) => ms.minBy(_._2) }.toSet
    assert(got === expected)
    // the designed pairs, explicitly — and the d=5/6 decoys absent
    assert(got === Set(("m01_dup", "m01", 0L), ("m02_near", "m02", 1L),
      ("m07_near", "m07", 1L), ("m09_near", "m09", 2L)))

    // one ingest cycle: fresh (= the far decoys) append; re-probing an
    // exact byte-copy of a decoy then matches it in the GROWN store
    val (dups, fresh) = IncrementalImageDedup.processBatch(
      variants.toDF("key", "bytes"),
      IncrementalImageDedup.loadStore(spark, store), store, batchId = 1L)
    assert(dups.count() === 4)
    assert(fresh.select("key").as[String].collect().sorted ===
      Array("m03_far", "m04_far"))
    // REPLAY the same batch id (the foreachBatch redelivery case): the
    // answers must not change — first-attempt appends neither become
    // self-duplicates (key guard) nor shadow batch-mates (own-partition
    // exclusion) — and the store must not double its rows
    val rowsAfterFirst = IncrementalImageDedup.loadStore(spark, store).count()
    val (dups2, fresh2) = IncrementalImageDedup.processBatch(
      variants.toDF("key", "bytes"),
      IncrementalImageDedup.loadStore(spark, store), store, batchId = 1L)
    assert(dups2.collect().map(r => r.getString(0) -> r.getString(1))
      .toMap === dups.collect().map(r => r.getString(0) -> r.getString(1))
      .toMap)
    assert(fresh2.select("key").as[String].collect().sorted ===
      Array("m03_far", "m04_far"))
    assert(IncrementalImageDedup.loadStore(spark, store).count() ===
      rowsAfterFirst)
    val probe = MultimodalOps.imageDHashes(
      variants.filter(_._1 == "m03_far")
        .map { case (_, b) => ("m03_far_again", b) }.toDF("key", "bytes"))
    val redup = IncrementalImageDedup.findDups(probe,
      IncrementalImageDedup.loadStore(spark, store)).collect()
    assert(redup.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq === Seq(("m03_far_again", "m03_far", 0L)))
  }

  test("streaming ingest dedups each media micro-batch against the " +
    "growing store") {
    implicit val sqlCtx = spark.sqlContext
    val store = java.nio.file.Files
      .createTempDirectory("graft_imgdedup_stream").toString
    import graft.functions.{BinaryFunctions => B}
    def png(seed: Long) = B.syntheticMedia(seed * 3, 72, 48) // all-png seeds
    // seed the store with image a1 (also gives the store files a schema)
    IncrementalImageDedup.initStore(
      MultimodalOps.imageDHashes(Seq(("a1", png(1))).toDF("key", "bytes")),
      store)

    IncrementalImageDedupSpec.kept = Vector.empty
    IncrementalImageDedupSpec.dupOf = Map.empty
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Array[Byte])]
    val q = input.toDF().toDF("key", "bytes")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        val (dups, fresh) = IncrementalImageDedup.processBatch(batch,
          IncrementalImageDedup.loadStore(batch.sparkSession, store), store,
          bid)
        IncrementalImageDedupSpec.dupOf ++= dups.collect()
          .map(r => r.getString(0) -> r.getString(1))
        IncrementalImageDedupSpec.kept ++=
          fresh.select("key").collect().map(_.getString(0))
        ()
      }.start()
    try {
      // batch 1: b1 duplicates stored a1 (same pixels, fresh bytes);
      // b2 is fresh
      input.addData(Seq(("b1", png(1)), ("b2", png(2))))
      q.processAllAvailable()
      // batch 2: c1 duplicates b2 — which entered the store in the
      // PREVIOUS micro-batch (the store grows between batches)
      input.addData(Seq(("c1", png(2)), ("c2", png(3))))
      q.processAllAvailable()
    } finally q.stop()
    assert(IncrementalImageDedupSpec.kept.sorted === Seq("b2", "c2"))
    assert(IncrementalImageDedupSpec.dupOf === Map("b1" -> "a1",
      "c1" -> "b2"))
  }

  test("kill/resume: a crash between the store append and the sink " +
    "commit redelivers the batch on restart — same batch id, same " +
    "answers, store rows not doubled") {
    implicit val sqlCtx = spark.sqlContext
    val store = java.nio.file.Files
      .createTempDirectory("graft_imgdedup_killresume").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_imgdedup_ckpt").toString
    import graft.functions.{BinaryFunctions => B}
    def png(seed: Long) = B.syntheticMedia(seed * 3, 72, 48)
    IncrementalImageDedup.initStore(
      MultimodalOps.imageDHashes(Seq(("a1", png(1))).toDF("key", "bytes")),
      store)
    IncrementalImageDedupSpec.attempts = Vector.empty
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Array[Byte])]
    def start() = input.toDF().toDF("key", "bytes")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        val (dups, fresh) = IncrementalImageDedup.processBatch(batch,
          IncrementalImageDedup.loadStore(batch.sparkSession, store), store,
          bid)
        IncrementalImageDedupSpec.attempts :+= ((bid,
          dups.collect().map(r => r.getString(0) -> r.getString(1)).toMap,
          fresh.select("key").collect().map(_.getString(0)).sorted.toSeq))
        ()
      }.start()
    val q1 = start()
    try {
      // batch 0: b1 duplicates stored a1; b2 is fresh (appends)
      input.addData(Seq(("b1", png(1)), ("b2", png(2))))
      q1.processAllAvailable()
    } finally q1.stop()
    // simulate the crash window processBatch documents (store append
    // done, sink commit lost): drop batch 0's commit marker — the
    // restarted query MUST redeliver batch 0 under the same id
    assert(new java.io.File(s"$ckpt/commits/0").delete(),
      "expected a commit marker for batch 0")
    // the local FS keeps a checksum sibling; leaving it would make the
    // redelivered commit's re-create fail as a spurious concurrent-
    // writer error
    new java.io.File(s"$ckpt/commits/.0.crc").delete()
    val storeRowsAfterCrash =
      IncrementalImageDedup.loadStore(spark, store).count()
    val q2 = start()
    try {
      // the restart first re-runs batch 0 (redelivery), then batch 1:
      // c1 duplicates b2 — whose rows entered the store during the
      // FIRST delivery and must be there exactly once
      input.addData(Seq(("c1", png(2)), ("c2", png(3))))
      q2.processAllAvailable()
    } finally q2.stop()
    val attempts = IncrementalImageDedupSpec.attempts
    assert(attempts.map(_._1) === Vector(0L, 0L, 1L),
      s"expected batch 0 redelivered then batch 1, got $attempts")
    // the redelivery reproduced the first attempt's answers exactly:
    // first-attempt appends neither self-duplicate nor shadow
    assert(attempts(1) === attempts(0))
    assert(attempts(0)._2 === Map("b1" -> "a1"))
    assert(attempts(0)._3 === Seq("b2"))
    // batch 1 probes the redelivered store state correctly
    assert(attempts(2)._2 === Map("c1" -> "b2"))
    assert(attempts(2)._3 === Seq("c2"))
    // the store holds each key's bands ONCE: a1 + b2 after the crash,
    // + c2 after batch 1 — the replayed partition overwrote itself
    val fin = IncrementalImageDedup.loadStore(spark, store)
    assert(fin.count() === storeRowsAfterCrash +
      IncrementalImageDedup.NBands)
    assert(fin.select("key").distinct().as[String].collect().sorted
      === Array("a1", "b2", "c2"))
  }

  test("a legacy flat (batch-less) store refuses incremental writes " +
    "loudly instead of being corrupted by partitioned appends") {
    val (bases, variants) = split()
    val store = java.nio.file.Files
      .createTempDirectory("graft_imgdedup_legacy").toString
    // the OLD layout: root-level parquet, no batch column
    IncrementalImageDedup.signatureRows(
      MultimodalOps.imageDHashes(bases.toDF("key", "bytes")))
      .write.mode("overwrite").parquet(store)
    val e = intercept[IllegalArgumentException](
      IncrementalImageDedup.processBatch(variants.toDF("key", "bytes"),
        IncrementalImageDedup.loadStore(spark, store), store, batchId = 1L))
    assert(e.getMessage.contains("legacy flat layout"))
    // and the store is still readable — the write was refused BEFORE
    // any partition directory landed
    assert(IncrementalImageDedup.loadStore(spark, store).count() > 0)
  }

  test("q170 store search: banded probe equals the full-scan kNN " +
    "within the radius, for EVERY fixture as the query; the band " +
    "disjunction reaches the parquet scan") {
    val all = PipelineQueries.dhashFixtureBytes
    val hashes = MultimodalOps.imageDHashes(all.toDF("key", "bytes"))
      .localCheckpoint(true)
    val store = java.nio.file.Files
      .createTempDirectory("graft_imgsearch_store").toString
    IncrementalImageDedup.initStore(hashes, store)
    val loaded = IncrementalImageDedup.loadStore(spark, store)
    val hashByKey = hashes.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // probe ≡ full scan restricted to the banding radius — holds for
    // every corpus member as the query, not one friendly literal
    hashByKey.foreach { case (qKey, qHash) =>
      val probe = IncrementalImageDedup.search(loaded, qHash, k = 5)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val full = graft.functions.HammingBands
        .knn(hashes, "key", "dhash", qHash, k = hashByKey.size)
        .filter(col("d") <= 3).limit(5)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(probe === full, s"query $qKey")
    }
    // the band-key disjunction pushes into the parquet scan: the
    // pruned store read is the serving-path argument
    val plan = IncrementalImageDedup.search(loaded,
      hashByKey("m07_near"), k = 5)
      .queryExecution.executedPlan.toString
    val pushed = plan.linesIterator
      .find(_.contains("PushedFilters:")).getOrElse("")
    assert(pushed.contains("EqualTo(band.b,"),
      s"band predicate must reach the scan:\n$plan")
    // out-of-store queries answer empty (no within-radius rows), and
    // the radius cap rejects loudly past the banding bound
    assert(IncrementalImageDedup.search(loaded, 0L, k = 5).count() === 0)
    assertThrows[IllegalArgumentException](
      IncrementalImageDedup.search(loaded, 0L, k = 5, maxDist = 4))
  }

  test("q177 agreement probe: both kernels must match the SAME stored " +
    "item; candidate sets join before the per-key cut, so differing " +
    "per-kernel winners still find the common match") {
    // the fixture answer: only the true re-encode survives; the
    // whitened-cell variants the dHash probe alone accepts drop
    val got = PipelineQueries.q177IncrAgreementProbe(spark, "unused")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(("m01_dup", "m01", 0L, 0L)))
    // winners-differ construction: kernel A ranks stored "a" first
    // (min key) while kernel B only matches "b" — joining the CUT
    // winners would find nothing, joining candidates finds (x, b)
    import spark.implicits._
    val storeA = IncrementalImageDedup.signatureRows(
      Seq(("a", 0L), ("b", (1L << 40) | 1L)).toDF("key", "dhash"))
    val batchA = Seq(("x", 1L)).toDF("key", "dhash") // d=1 to BOTH
    val storeB = IncrementalImageDedup.signatureRows(
      Seq(("a", 0xFF00FF00L), ("b", 7L)).toDF("key", "dhash"),
      nBands = 7, bandBits = 9)
    val batchB = Seq(("x", 7L)).toDF("key", "dhash") // d=0 to b only
    val agreed = IncrementalImageDedup.findAgreedDups(
      batchA, storeA, batchB, storeB)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    assert(agreed.toSeq === Seq(("x", "b", 1L, 0L)))
    // and the single-kernel winner really IS different — the case
    // a winners-join implementation would lose
    val aWinner = IncrementalImageDedup.findDups(batchA, storeA)
      .collect().map(_.getString(1)).toSeq
    assert(aWinner === Seq("a"))
  }

  test("self-describing banding: a 7x9 pHash store serves search " +
    "under ITS banding; a mismatched probe rejects loudly instead of " +
    "silently missing candidates") {
    import spark.implicits._
    val phashes = MultimodalOps.imagePHashes(
      PipelineQueries.phashFixtureBytes.toDF("key", "bytes"))
      .localCheckpoint(true)
    val store = java.nio.file.Files
      .createTempDirectory("graft_phash_store").toString
    IncrementalImageDedup.initStore(phashes, store, nBands = 7,
      bandBits = 9)
    val loaded = IncrementalImageDedup.loadStore(spark, store)
    // search derives the store's banding — the d<=6 radius works and
    // the probe equals the full scan within it
    val probe = IncrementalImageDedup.search(loaded,
      query = -6340691516647082415L, k = 8, maxDist = 6) // p1_noise
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val full = graft.functions.HammingBands
      .knn(phashes, "key", "dhash", -6340691516647082415L, k = 99)
      .filter(col("d") <= 6).limit(8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(probe === full && probe.nonEmpty)
    // past the store's lossless radius: loud
    assertThrows[IllegalArgumentException](
      IncrementalImageDedup.search(loaded, 0L, k = 1, maxDist = 7))
    // a probe under the WRONG banding rejects instead of missing
    assertThrows[IllegalArgumentException](
      IncrementalImageDedup.dupCandidates(phashes, loaded))
  }

  test("q182 partitioned serving layout: the probe prunes at the FILE " +
    "LISTING (partition filters on band_bucket), answers equal the " +
    "flat store, appends refuse") {
    import spark.implicits._
    val hashes = MultimodalOps.imageDHashes(
      PipelineQueries.dhashFixtureBytes.toDF("key", "bytes"))
      .localCheckpoint(true)
    val flat = java.nio.file.Files
      .createTempDirectory("graft_flat_store").toString
    val part = java.nio.file.Files
      .createTempDirectory("graft_part_store").toString
    IncrementalImageDedup.initStore(hashes, flat)
    IncrementalImageDedup.initStorePartitioned(hashes, part)
    val loadedPart = IncrementalImageDedup.loadStore(spark, part)
    val hashByKey = hashes.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // probe ≡ flat-store probe for EVERY corpus member as the query
    hashByKey.foreach { case (qKey, qHash) =>
      val p = IncrementalImageDedup.search(loadedPart, qHash, k = 5)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val f = IncrementalImageDedup.search(
        IncrementalImageDedup.loadStore(spark, flat), qHash, k = 5)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(p === f, s"query $qKey")
    }
    // partition pruning is visible in the plan: the bucket disjunction
    // lands in PartitionFilters, not just PushedFilters
    val plan = IncrementalImageDedup.search(loadedPart,
      hashByKey("m07_near"), k = 5)
      .queryExecution.executedPlan.toString
    val pf = plan.linesIterator
      .find(_.contains("PartitionFilters:")).getOrElse("")
    assert(pf.contains("band_bucket"),
      s"bucket filter must prune partitions:\n$plan")
    // the serving layout is read-mostly: batch ingest refuses loudly
    assertThrows[IllegalArgumentException](
      IncrementalImageDedup.processBatch(
        PipelineQueries.dhashFixtureBytes.take(1).toDF("key", "bytes"),
        loadedPart, part, batchId = 1L))
    // COMPACTION closes the lifecycle loop: ingest store (corpus +
    // an appended batch) compacts into the serving layout, the probe
    // finds the appended member, and re-compaction swaps atomically
    val (bases, variants) = PipelineQueries.dhashFixtureBytes
      .partition(f => !f._1.contains("_"))
    val ingest = java.nio.file.Files
      .createTempDirectory("graft_ingest_store").toString
    IncrementalImageDedup.initStore(
      MultimodalOps.imageDHashes(bases.toDF("key", "bytes")), ingest)
    IncrementalImageDedup.processBatch(
      variants.toDF("key", "bytes"),
      IncrementalImageDedup.loadStore(spark, ingest), ingest,
      batchId = 1L)
    val serving = java.nio.file.Files
      .createTempDirectory("graft_serving_store").toString + "/s"
    IncrementalImageDedup.compactToServing(spark, ingest, serving)
    // m03_far is a FRESH append (no within-bound match): it reached
    // the ingest store and must be probe-visible after compaction
    val hit = IncrementalImageDedup.search(
      IncrementalImageDedup.loadStore(spark, serving),
      hashByKey("m03_far"), k = 1)
      .collect().map(_.getString(0)).toSeq
    assert(hit === Seq("m03_far"))
    // re-compaction over the live serving store swaps atomically
    IncrementalImageDedup.compactToServing(spark, ingest, serving)
    assert(IncrementalImageDedup.search(
      IncrementalImageDedup.loadStore(spark, serving),
      hashByKey("m03_far"), k = 1)
      .collect().map(_.getString(0)).toSeq === Seq("m03_far"))
  }

  test("probe plan: no cross join, candidate gate is the band equi-join") {
    val (bases, variants) = split()
    val store = java.nio.file.Files
      .createTempDirectory("graft_imgdedup_plan").toString
    IncrementalImageDedup.initStore(
      MultimodalOps.imageDHashes(bases.toDF("key", "bytes")), store)
    val plan = IncrementalImageDedup.findDups(
      MultimodalOps.imageDHashes(variants.toDF("key", "bytes")),
      IncrementalImageDedup.loadStore(spark, store))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"),
      s"store probe must stay a banded equi-join:\n$plan")
  }
}

object IncrementalImageDedupSpec {
  @volatile var kept: Vector[String] = Vector.empty
  @volatile var dupOf: Map[String, String] = Map.empty
  @volatile var attempts
      : Vector[(Long, Map[String, String], Seq[String])] = Vector.empty
}
