package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental-vs-batch equivalence: probing a new batch against the
  * signature store of the old corpus must flag exactly the cross-split
  * subset of what the batch pair pipeline (q30) finds on the union —
  * same kernel, same bands, same threshold, so the results are equal by
  * construction, and this spec holds the construction to it. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  test("incremental probe equals the cross-split slice of batch dedup") {
    val dir = sf("sf0.001")
    val docs = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "text")
    val old = docs.filter(col("doc_id") < 150)
    val fresh = docs.filter(col("doc_id") >= 150 && col("doc_id") < 300)
    val store = java.nio.file.Files
      .createTempDirectory("graft_dedup_store").toString

    IncrementalDedup.initStore(old, store)
    val got = IncrementalDedup
      .findDups(fresh, IncrementalDedup.loadStore(spark, store), 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // batch ground truth: q30 over the SAME corpus, pairs crossing the
    // split (a in old, b in new — a<b always holds across this split),
    // earliest old match per new doc
    val expected = graft.queries.TextQueries
      .q30MinhashPairs(spark, dir, 0.5)
      .filter(col("a") < 150 && col("b") >= 150 && col("b") < 300)
      .groupBy("b").agg(min("a").as("a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)

    // append the fresh docs, then probe an exact copy of one of them:
    // it must match its original in the GROWN store
    IncrementalDedup.appendFresh(fresh, IncrementalDedup
      .findDups(fresh, IncrementalDedup.loadStore(spark, store), 0.5),
      store, batchId = 1L)
    val sampleId = fresh.select(min("doc_id")).head().getLong(0)
    val copy = fresh.filter(col("doc_id") === sampleId)
      .select(lit(999999L).as("doc_id"), col("text"))
    val redup = IncrementalDedup
      .findDups(copy, IncrementalDedup.loadStore(spark, store), 0.5)
      .collect()
    assert(redup.length === 1)
    assert(redup.head.getLong(0) === 999999L)
    assert(redup.head.getDouble(2) === 1.0) // identical text → est 1.0
  }

  test("streaming ingest dedups each micro-batch against the growing store") {
    implicit val sqlCtx = spark.sqlContext
    val store = java.nio.file.Files
      .createTempDirectory("graft_dedup_stream").toString
    def txt(seed: Int): String =
      (0 until 25).map(i => s"s${seed}w$i").mkString(" ")
    // seed the store with doc 1 (also gives the store files a schema)
    IncrementalDedup.initStore(Seq((1L, txt(1))).toDF("doc_id", "text"), store)

    // companion-object state survives whatever closure handling the
    // streaming machinery applies (same pattern as StreamingEnrichmentSpec)
    IncrementalDedupSpec.kept = Vector.empty
    IncrementalDedupSpec.dupOf = Map.empty
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        // one ingest cycle: probe + append + report, single kernel pass
        // (processBatch pins the micro-batch internally); the batch id
        // keys the store partition so redelivery is idempotent
        val (dups, fresh) = IncrementalDedup.processBatch(batch,
          IncrementalDedup.loadStore(batch.sparkSession, store), store,
          bid, 0.5)
        IncrementalDedupSpec.dupOf ++= dups.collect()
          .map(r => r.getLong(0) -> r.getLong(1))
        IncrementalDedupSpec.kept ++=
          fresh.select("doc_id").collect().map(_.getLong(0))
        ()
      }.start()
    try {
      // batch 1: doc 2 duplicates stored doc 1; doc 3 is fresh
      input.addData(Seq((2L, txt(1)), (3L, txt(3))))
      q.processAllAvailable()
      // batch 2: doc 4 duplicates doc 3 — which entered the store in the
      // PREVIOUS micro-batch (the store grows between batches)
      input.addData(Seq((4L, txt(3)), (5L, txt(5))))
      q.processAllAvailable()
    } finally q.stop()
    assert(IncrementalDedupSpec.kept.sorted === Seq(3L, 5L))
    assert(IncrementalDedupSpec.dupOf === Map(2L -> 1L, 4L -> 3L))
  }

  test("q185 serving layout + search: probe ≡ full-scan pairs for every " +
    "corpus doc, file-listing pruning in the plan, serving appends " +
    "refuse, compaction swaps atomically, kernels self-describe") {
    val dir = sf("sf0.001")
    val corpus = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").filter(col("doc_id") < 300)
      .localCheckpoint(true)
    val base = java.nio.file.Files
      .createTempDirectory("graft_txt_search").toString
    // ingest store (default xxhash kernel), compacted to serving
    IncrementalDedup.initStore(corpus, s"$base/ingest")
    IncrementalDedup.compactToServing(spark, s"$base/ingest",
      s"$base/serving", nBuckets = 16)
    val serving = IncrementalDedup.loadStore(spark, s"$base/serving")
    // probe ≡ the pair pipeline: for EVERY doc, search results above
    // threshold equal its q30-pair partners (plus itself at 1.0) —
    // identical kernel, banding, and threshold, so equal by
    // construction; this holds the construction to it
    val pairs = graft.queries.TextQueries.q30MinhashPairs(spark, dir, 0.5)
      .filter(col("a") < 300 && col("b") < 300)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val texts = corpus.collect().map(r => r.getLong(0) -> r.getString(1))
    texts.foreach { case (id, text) =>
      val got = IncrementalDedup.search(serving, text, k = 50)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      val want = pairs.collect {
        case (a, b, e) if a == id => (b, e)
        case (a, b, e) if b == id => (a, e)
      }.toSet + ((id, 1.0))
      assert(got === want, s"query doc $id")
    }
    // the bucket disjunction prunes at the file listing
    val plan = IncrementalDedup.search(serving, texts.head._2, k = 5)
      .queryExecution.executedPlan.toString
    val pf = plan.linesIterator
      .find(_.contains("PartitionFilters:")).getOrElse("")
    assert(pf.contains("band_bucket"),
      s"bucket filter must prune partitions:\n$plan")
    // serving stores are read-mostly: ingest refuses loudly — BOTH
    // write entry points (an appendFresh slipping through would land
    // bucket-less rows invisible to every pruned probe)
    assertThrows[IllegalArgumentException](
      IncrementalDedup.processBatch(
        Seq((999L, "a b c d e")).toDF("doc_id", "text"), serving,
        s"$base/serving", batchId = 1L))
    assertThrows[IllegalArgumentException](
      IncrementalDedup.appendFresh(
        Seq((999L, "a b c d e")).toDF("doc_id", "text"),
        Seq.empty[Long].toDF("doc_id"), s"$base/serving", batchId = 1L))
    // the flat ingest store answers the SAME probes (no bucket layout)
    val ingest = IncrementalDedup.loadStore(spark, s"$base/ingest")
    val (qid, qtext) = texts.head
    assert(IncrementalDedup.search(ingest, qtext, k = 50)
      .collect().map(_.getLong(0)).toSet ===
      IncrementalDedup.search(serving, qtext, k = 50)
        .collect().map(_.getLong(0)).toSet, s"flat vs serving for $qid")
    // compaction picks up an appended batch and re-swaps atomically
    val extra = Seq((5000L, texts.head._2)).toDF("doc_id", "text")
    IncrementalDedup.processBatch(extra, ingest, s"$base/ingest",
      batchId = 7L)
    // 5000 duplicates texts.head → NOT appended; a genuinely fresh doc:
    val freshDoc = Seq((5001L,
      (0 until 30).map(i => s"fresh$i word$i").mkString(" ")))
      .toDF("doc_id", "text")
    IncrementalDedup.processBatch(freshDoc,
      IncrementalDedup.loadStore(spark, s"$base/ingest"), s"$base/ingest",
      batchId = 8L)
    IncrementalDedup.compactToServing(spark, s"$base/ingest",
      s"$base/serving", nBuckets = 16)
    val hit = IncrementalDedup.search(
      IncrementalDedup.loadStore(spark, s"$base/serving"),
      (0 until 30).map(i => s"fresh$i word$i").mkString(" "), k = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(hit === Seq(5001L))
    // right-to-be-forgotten: a re-compaction with a forget set drops
    // exactly the forgotten doc from the published store — its own
    // text no longer finds it, its partners stay findable
    IncrementalDedup.compactToServing(spark, s"$base/ingest",
      s"$base/serving", nBuckets = 16,
      forget = Some(Seq(texts.head._1).toDF("doc_id")))
    val afterForget = IncrementalDedup.search(
      IncrementalDedup.loadStore(spark, s"$base/serving"),
      texts.head._2, k = 50).collect().map(_.getLong(0)).toSet
    val partners = pairs.collect {
      case (a, b, _) if a == texts.head._1 => b
      case (a, b, _) if b == texts.head._1 => a
    }.toSet
    assert(!afterForget.contains(texts.head._1),
      "forgotten doc must not answer probes")
    assert(afterForget === partners)
    // the md5 kernel self-describes: a store built with it probes with
    // it (est values are eighths under k=8), and search derives the
    // kernel — no caller parameter can mis-hash the probe
    val md5base = java.nio.file.Files
      .createTempDirectory("graft_txt_md5").toString
    IncrementalDedup.initStore(corpus, md5base + "/s", nBands = 4,
      rowsPerBand = 2, shingleLen = 3, kernel = "md5")
    val md5store = IncrementalDedup.loadStore(spark, md5base + "/s")
    val selfHit = IncrementalDedup.search(md5store, texts.head._2, k = 1)
      .collect()
    assert(selfHit.head.getLong(0) === texts.head._1 &&
      selfHit.head.getDouble(1) === 1.0)
    // a BARE signature frame (no meta columns) probes under the
    // CALLER's parameters — the image-twin contract (pass what
    // signatureRowsWith was given)
    val bare = IncrementalDedup
      .signatureRowsWith(corpus, 4, 2, 3, "md5")
    val bareHit = IncrementalDedup.search(bare, texts.head._2, k = 1,
      nBands = 4, rowsPerBand = 2, shingleLen = 3, kernel = "md5")
      .collect()
    assert(bareHit.head.getLong(0) === texts.head._1 &&
      bareHit.head.getDouble(1) === 1.0)
    // an unknown kernel string is loud
    assertThrows[IllegalArgumentException](
      IncrementalDedup.initStore(corpus, md5base + "/bad",
        kernel = "sha9"))
    // a too-short query has no shingles: loud, never empty-and-silent
    // (fresh load — the recompaction above swapped the files under the
    // earlier `serving` frame)
    val e = intercept[IllegalArgumentException](
      IncrementalDedup.search(
        IncrementalDedup.loadStore(spark, s"$base/serving"),
        "one two", k = 5))
    assert(e.getMessage.contains("shingles"))
  }
  test("bucket-pruned forget: only the forgotten doc's bucket " +
    "directories rewrite, answers equal the full recompaction, and " +
    "an interrupted swap recovers from the marker") {
    val dir = sf("sf0.001")
    val corpus = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").filter(col("doc_id") < 300)
      .localCheckpoint(true)
    val base = java.nio.file.Files
      .createTempDirectory("graft_txt_forget").toString
    IncrementalDedup.initStore(corpus, s"$base/ingest")
    IncrementalDedup.compactToServing(spark, s"$base/ingest",
      s"$base/serving", nBuckets = 16)
    // a doc with at least one near-dup partner
    val pairs = graft.queries.TextQueries.q30MinhashPairs(spark, dir, 0.5)
      .filter(col("a") < 300 && col("b") < 300)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val victim = pairs.head._1
    val partners = pairs.collect {
      case (a, b) if a == victim => b
      case (a, b) if b == victim => a
    }.toSet
    val texts = corpus.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def listing(): Map[String, (Long, Long)] = {
      val root = java.nio.file.Paths.get(s"$base/serving")
      val out = scala.collection.mutable.Map.empty[String, (Long, Long)]
      java.nio.file.Files.walk(root).forEach { p =>
        if (java.nio.file.Files.isRegularFile(p))
          out += root.relativize(p).toString ->
            ((java.nio.file.Files.size(p),
              java.nio.file.Files.getLastModifiedTime(p).toMillis))
      }
      out.toMap
    }
    val before = listing()
    val affected = IncrementalDedup.forgetFromServing(spark,
      s"$base/serving", Seq(victim).toDF("doc_id"))
    assert(affected.nonEmpty && affected.size <= IncrementalDedup.Bands)
    // PRUNING: every file outside the affected bucket directories is
    // byte-identical and untouched (same path, size, mtime)
    val after = listing()
    val affectedDirs = affected.map(k => s"band_bucket=$k").toSet
    val untouchedBefore = before.filter { case (p, _) =>
      !affectedDirs.exists(p.contains) }
    val untouchedAfter = after.filter { case (p, _) =>
      !affectedDirs.exists(p.contains) }
    assert(untouchedBefore === untouchedAfter)
    assert(untouchedBefore.nonEmpty) // the prune is non-vacuous
    // semantics: the forgotten doc no longer answers its own probe,
    // its partners still do — exactly the full recompaction's answer
    val served = IncrementalDedup.loadStore(spark, s"$base/serving")
    val own = IncrementalDedup.search(served, texts(victim), k = 50)
      .collect().map(_.getLong(0)).toSet
    assert(!own.contains(victim) && own === partners)
    IncrementalDedup.compactToServing(spark, s"$base/ingest",
      s"$base/full", nBuckets = 16,
      forget = Some(Seq(victim).toDF("doc_id")))
    val full = IncrementalDedup.loadStore(spark, s"$base/full")
    partners.take(2).foreach { p =>
      assert(IncrementalDedup.search(served, texts(p), k = 50)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet ===
        IncrementalDedup.search(full, texts(p), k = 50)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet,
        s"probe parity for partner $p")
    }
    // an absent key touches nothing
    assert(IncrementalDedup.forgetFromServing(spark, s"$base/serving",
      Seq(999999L).toDF("doc_id")) === Seq.empty)
    assert(listing() === after)
    // recovery (a): a half-BUILT work dir (no marker) discards — the
    // store was never touched
    val work = java.nio.file.Paths.get(s"$base/serving_forgetting")
    java.nio.file.Files.createDirectories(work)
    java.nio.file.Files.write(work.resolve("junk"),
      "x".getBytes("UTF-8"))
    IncrementalDedup.loadStore(spark, s"$base/serving")
    assert(!java.nio.file.Files.exists(work))
    assert(listing() === after)
    // recovery (b): a crash MID-SWAP (marker written, live dir
    // deleted, replacement not yet renamed) completes from the marker
    val unit = s"batch=-1/band_bucket=${affected.head}"
    val liveUnit = java.nio.file.Paths.get(s"$base/serving/$unit")
    val replUnit = work.resolve(unit)
    java.nio.file.Files.createDirectories(replUnit.getParent)
    java.nio.file.Files.move(liveUnit, replUnit)
    java.nio.file.Files.write(work.resolve("_FORGET_READY"),
      s"$unit\t1".getBytes("UTF-8"))
    val recovered = IncrementalDedup.loadStore(spark, s"$base/serving")
    assert(!java.nio.file.Files.exists(work))
    assert(listing().keySet === after.keySet)
    // the recovered store still answers the partner probe
    assert(IncrementalDedup.search(recovered, texts(partners.head),
      k = 50).collect().map(_.getLong(0)).toSet ===
      IncrementalDedup.search(full, texts(partners.head), k = 50)
        .collect().map(_.getLong(0)).toSet)
    // recovery (c): a crash MID-MARKER-WRITE — the marker publishes
    // by temp-write + rename, so the torn state on disk is a partial
    // _FORGET_READY.tmp and NO marker; recover must discard the work
    // dir and leave the live store byte-untouched (no partial forget)
    java.nio.file.Files.createDirectories(work)
    java.nio.file.Files.write(work.resolve("_FORGET_READY.tmp"),
      s"$unit\t".getBytes("UTF-8")) // torn mid-line
    IncrementalDedup.loadStore(spark, s"$base/serving")
    assert(!java.nio.file.Files.exists(work))
    assert(listing().keySet === after.keySet)
    // recovery (d): a MALFORMED marker line (possible only through
    // corruption now that the publish is atomic) refuses LOUDLY —
    // applying the parsed prefix would be a silent partial forget
    java.nio.file.Files.createDirectories(work)
    java.nio.file.Files.write(work.resolve("_FORGET_READY"),
      s"$unit\t1\nbatch=-1/band_buc".getBytes("UTF-8"))
    val torn = intercept[IllegalStateException](
      IncrementalDedup.loadStore(spark, s"$base/serving"))
    assert(torn.getMessage.contains("malformed"))
    assert(java.nio.file.Files.exists(work)) // left for inspection
    java.nio.file.Files.delete(work.resolve("_FORGET_READY"))
    java.nio.file.Files.delete(work)
    // refuses a non-serving (ingest) layout loudly
    val e = intercept[IllegalArgumentException](
      IncrementalDedup.forgetFromServing(spark, s"$base/ingest",
        Seq(victim).toDF("doc_id")))
    assert(e.getMessage.contains("serving layout"))
  }

  test("mixed store (legacy meta-less partition) keeps the " +
    "self-described kernel — mergeSchema surfaces the meta columns") {
    def txt(seed: Int): String =
      (0 until 30).map(i => s"mx${seed}a$i b$i").mkString(" ")
    val docs = Seq((1L, txt(1)), (2L, txt(2))).toDF("doc_id", "text")
    val base = java.nio.file.Files
      .createTempDirectory("graft_txt_mixed").toString
    // a NON-default kernel/banding store...
    IncrementalDedup.initStore(docs, s"$base/s", nBands = 4,
      rowsPerBand = 2, shingleLen = 3, kernel = "md5")
    // ...plus a partition appended by a PRE-METADATA writer: the same
    // signature rows without any of the self-description columns
    IncrementalDedup.loadStore(spark, s"$base/s")
      .select("doc_id", "sig", "band")
      .write.mode("overwrite").parquet(s"$base/s/batch=7")
    // loadStore must surface the meta columns no matter which footer
    // schema inference would sample — a meta-less pick would silently
    // downgrade the probe to the xxhash defaults and band-miss every
    // candidate (the legacy rows' null meta is skipped by storeMeta)
    val store = IncrementalDedup.loadStore(spark, s"$base/s")
    assert(store.columns.contains("kernel"))
    val hit = IncrementalDedup.findDups(
      Seq((99L, txt(1))).toDF("doc_id", "text"), store, 0.5).collect()
    assert(hit.length === 1 && hit.head.getLong(1) === 1L &&
      hit.head.getDouble(2) === 1.0)
  }
}

object IncrementalDedupSpec {
  @volatile var kept: Vector[Long] = Vector.empty
  @volatile var dupOf: Map[Long, Long] = Map.empty
}
