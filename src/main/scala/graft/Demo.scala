package graft

import graft.operators.{MarketplaceFold, MultimodalOps}
import graft.pipeline.Enrichment
import graft.queries.CdcQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end walkthrough of the whole engine in one batch run — the
  * reference's indexer + enrichment chain (SURVEY §3) on the driver
  * testdata. Not part of the driver contract; exists so a new user can see
  * the full dataflow in one `runMain graft.Demo [sfDir] [outDir]`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("/root/repo/target/demo_out")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // the production registration path: extensions applied at build time
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // sanity: the injected SQL functions resolve through pure SQL
    val sanity = spark.sql(
      "SELECT vec_dot(vec_normalize(array(3D,4D)), array(3D,4D)) AS n")
      .head().getDouble(0)
    require(math.abs(sanity - 5.0) < 1e-9,
      s"extensions not applied: vec_dot sanity = $sanity")

    // 1. Ingest: event log → typed marketplace messages (S1/S2).
    val events = CdcQueries.mapToMarketplace(spark, sfDir)

    // 2. CDC fold → all snapshot tables + the messages audit log (§2.8).
    val snapshots = MarketplaceFold.foldAll(events)
    snapshots.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name")
    }
    MarketplaceFold.messages(events)
      .write.mode("overwrite").parquet(s"$outDir/messages")

    // 3. Enrichment: stalest-k of a metadata snapshot → fetch → validate →
    //    merge (§3.3); fetch uses data: URLs here (no network).
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val metaSnapshot = (1 to 100).map(i => (s"tok$i", s"o$i",
      "data:," + java.net.URLEncoder.encode(
        s"""{"name":"n$i","description":"d","image":"i$i"}""", "UTF-8")
        .replace("+", "%20"),
      s"""{"name":"old$i"}""", t0, t0))
      .toDF("token_id", "owner", "url", "metadata", "last_updated",
        "last_checked")
    val tasks = Enrichment.stalestTasks(metaSnapshot,
      GraftConfig.default.daemonUpdatePercent)
    val staged = Enrichment.metadataStage(tasks)
    val merged = Enrichment.mergeMetadata(metaSnapshot,
      staged.filter(col("valid")),
      lit(java.sql.Timestamp.valueOf("2026-02-01 00:00:00")))
    merged.write.mode("overwrite").parquet(s"$outDir/token_metadata")

    // 4. Multimodal: synthetic images/audio/video through the batch feature
    //    extractors (png via ImageIO; AVI frames via the pure-JVM parser).
    val media = (1 to 50).map(i => (s"img$i",
      graft.functions.BinaryFunctions.syntheticPng(i.toLong, 32, 24)))
      .toDF("key", "bytes")
    MultimodalOps.imageFeatures(media)
      .write.mode("overwrite").parquet(s"$outDir/image_features")
    val videos = (1 to 5).map(i => (s"vid$i",
      MultimodalOps.syntheticAvi(i.toLong, 16, 12, nFrames = 6)))
      .toDF("key", "bytes")
    MultimodalOps.sampleFrames(videos, everyNth = 2, maxFrames = 3)
      .write.mode("overwrite").parquet(s"$outDir/video_frames")

    // 5. Store maintenance: content-addressed GC keeps only the current
    //    version per logical name (the reference's glob-delete analog).
    val store = (1 to 20).flatMap(i => Seq(
      (s"o${i}_t${i}_200_150", s"k${i}a", 1L),
      (s"o${i}_t${i}_200_150", s"k${i}b", 2L))) // b supersedes a
      .toDF("name", "content_key", "seq")
    store.write.mode("overwrite").parquet(s"$outDir/image_store")
    val (gcBefore, gcAfter) =
      Enrichment.compactStore(spark, s"$outDir/image_store")
    println(s"image_store GC: $gcBefore -> $gcAfter rows")

    // 6. Training-data pipeline (north star): mixing → decontamination →
    //    near-dup clustering → semantic dedup → quality funnel → sequence
    //    packing — the q62-q69 surface over the documents/embeddings
    //    tables, each step printing its realized size.
    import graft.queries.{SimilarityQueries, TextQueries}
    println("quality funnel (cumulative survivors):")
    TextQueries.q69FilterFunnel(spark, sfDir).collect().foreach(r =>
      println(f"  ${r.getString(1)}%-14s ${r.getLong(2)}%6d docs"))
    val pipeline = Seq(
      "mixed langs (q63)" -> TextQueries.q63CorpusMix(spark, sfDir).count(),
      "contaminated docs (q64)" ->
        TextQueries.q64Decontaminate(spark, sfDir).count(),
      "near-dup clusters (q62)" ->
        TextQueries.q62DupClusters(spark, sfDir)
          .filter(col("cluster_size") > 1)
          .agg(countDistinct(col("canonical"))).head.getLong(0),
      "semantic reps kept (q67)" ->
        SimilarityQueries.q67SemanticDedup(spark, sfDir).count(),
      "context packs (q65)" -> TextQueries.q65SeqPack(spark, sfDir).count(),
      // tokenizer: train BPE on the corpus, tokenize with it (q72/q80)
      "bpe tokens (q80)" -> TextQueries.q80BpeEncode(spark, sfDir)
        .agg(sum(col("n_bpe_tokens"))).head.getLong(0),
      // retrieval over the kept corpus: BM25 hits + heavy-hitter vocab
      "bm25 top hits (q77)" -> TextQueries.q77Bm25Topk(spark, sfDir).count(),
      "heavy hitters (q78)" -> TextQueries.q78HeavyHitters(spark, sfDir).count(),
      // embedding storage: PQ probe over the 32x-compressed index (q79)
      "pq ann hits (q79)" -> SimilarityQueries.q79AnnPq(spark, sfDir).count())
    pipeline.foreach { case (t, n) => println(f"$t%-26s $n%6d") }

    // 7. Serving + shipping: the persisted near-dup index lifecycle —
    //    batch-partitioned ingest build, atomic compaction into the
    //    bucket-partitioned serving layout, a "find near-duplicates of
    //    THIS document" probe — and the hash-sharded corpus export with
    //    its consumer-verifiable manifest.
    import graft.operators.{CorpusExport, IncrementalDedup}
    val corpus = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    IncrementalDedup.initStore(corpus, s"$outDir/dedup_ingest")
    IncrementalDedup.compactToServing(spark, s"$outDir/dedup_ingest",
      s"$outDir/dedup_serving", nBuckets = 16)
    val probeText = corpus.orderBy("doc_id").select("text")
      .head.getString(0)
    val hits = IncrementalDedup.search(
      IncrementalDedup.loadStore(spark, s"$outDir/dedup_serving"),
      probeText, k = 3).count()
    println(s"serving-store near-dup probe: $hits hit(s)")
    val manifest =
      CorpusExport.exportShards(corpus, s"$outDir/corpus_shards")
    println(s"export manifest: ${manifest.count()} shards")

    val counts = (snapshots.keys.toSeq :+ "messages" :+ "token_metadata"
      :+ "image_features" :+ "video_frames" :+ "image_store").sorted.map { t =>
      t -> spark.read.parquet(s"$outDir/$t").count()
    }
    counts.foreach { case (t, n) => println(f"$t%-26s $n%6d rows") }
    spark.stop()
  }
}
