package graft.pipeline

import graft.functions.{BinaryFunctions => B, JsonFunctions => J}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The enrichment dataflow (SURVEY §3.3) — the reference's chain of
  * RabbitMQ-connected workers re-expressed as declarative DataFrame stages:
  *
  *   uri tasks → fetch → ERC-721 validate → change-detect merge → metadata
  *   snapshot; valid+has-image rows → image fetch → decode/resize/gzip →
  *   content-addressed dedup → image sink rows; stalest-20% → re-enqueue.
  *
  * (reference: x/tokenMetadataService/service.go:91-210,
  * x/imgresizer/resizer.go:64-312, x/mongoDaemon/service.go:98-176.)
  *
  * Every stage is a pure DataFrame → DataFrame function so the same
  * composition runs as one batch lineage or inside foreachBatch in
  * streaming. Fetching is a mapPartitions stage with one shared HTTP client
  * per partition; tests use file:// URLs (no network in this environment);
  * timestamps are PASSED IN, never current_timestamp(), so every run is
  * replayable.
  */
object Enrichment {

  /** Priorities (x/common/types.go:15-22). */
  object Priority {
    val Regular = 1
    val TransferTriggered = 2
    val FreshlyMade = 3
    val ForcedUpdates = 4
  }

  // --- S7: fetch ----------------------------------------------------------

  /** URL fetch with the reference's 15 s timeout
    * (tokenMetadataService/service.go:66). file:/data: URIs serve tests;
    * failures come back as (body=null, error) columns — never exceptions. */
  def fetchBytes(url: String, timeoutMs: Int = 15000): Either[String, Array[Byte]] =
    try {
      val u = new java.net.URI(url)
      u.getScheme match {
        case "file" =>
          Right(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(u.getPath)))
        case "data" => // data:,percent-encoded-body (tests)
          // RAW part, ONE decode: getSchemeSpecificPart already
          // percent-decodes, so a second URLDecoder pass corrupted
          // any body whose encoded form contains '+' or '%' (c++ →
          // "c  "; "100%" → IllegalArgumentException)
          val ssp = u.getRawSchemeSpecificPart
          // strict RFC-2397 percent decode: URLDecoder implements
          // x-www-form-urlencoded, where a LITERAL '+' becomes a space
          // ('data:,c+b' → "c b"); escape '+' first so only %XX escapes
          // decode
          val body = ssp.dropWhile(_ != ',').drop(1).replace("+", "%2B")
          Right(java.net.URLDecoder.decode(body, "UTF-8").getBytes("UTF-8"))
        case "http" | "https" =>
          val conn = u.toURL.openConnection()
          conn.setConnectTimeout(timeoutMs)
          conn.setReadTimeout(timeoutMs)
          val in = conn.getInputStream
          try Right(in.readAllBytes()) finally in.close()
        case other => Left(s"unsupported scheme: $other")
      }
    } catch { case e: Exception => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }

  /** http/https fetch through a SHARED client (keep-alive connection pool);
    * non-network schemes delegate to [[fetchBytes]]. */
  def fetchBytesWith(client: java.net.http.HttpClient, url: String,
      timeoutMs: Int = 15000): Either[String, Array[Byte]] =
    try {
      val u = new java.net.URI(url)
      u.getScheme match {
        case "http" | "https" =>
          val req = java.net.http.HttpRequest.newBuilder(u)
            .timeout(java.time.Duration.ofMillis(timeoutMs)).GET().build()
          // the request timeout bounds time-to-HEADERS only; a server
          // that streams a trickling body would pin the Spark task
          // forever — the async get bounds the WHOLE exchange, the
          // reference's 15 s contract
          val fut = client.sendAsync(req,
            java.net.http.HttpResponse.BodyHandlers.ofByteArray())
          val got =
            try Right(fut.get(timeoutMs,
              java.util.concurrent.TimeUnit.MILLISECONDS))
            catch {
              case _: java.util.concurrent.TimeoutException =>
                fut.cancel(true)
                Left(s"fetch exceeded $timeoutMs ms (body stall)")
              case e: java.util.concurrent.ExecutionException =>
                val c = if (e.getCause != null) e.getCause else e
                Left(s"${c.getClass.getSimpleName}: ${c.getMessage}")
            }
          got.flatMap { resp =>
            if (resp.statusCode() / 100 == 2) Right(resp.body())
            else Left(s"http ${resp.statusCode()}")
          }
        case _ => fetchBytes(url, timeoutMs)
      }
    } catch {
      case e: Exception =>
        Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  /** tasks(url, ...) → + (body binary, fetch_error string).
    *
    * mapPartitions, not a row-wise UDF: ONE HttpClient per partition, so
    * TCP/TLS setup and keep-alive pooling amortize across every row of the
    * partition — at 100 TB of URI tasks a per-row connection is the
    * difference between an I/O-bound stage and a handshake-bound one. The
    * client is lazily built (empty partitions never pay it). */
  def fetched(tasks: DataFrame, urlCol: String = "url",
      timeoutMs: Int = 15000): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{BinaryType, StringType}
    val outSchema = tasks.schema.add("body", BinaryType)
      .add("fetch_error", StringType)
    val urlIdx = tasks.schema.fieldIndex(urlCol)
    tasks.mapPartitions { it =>
      lazy val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
        .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
        .build()
      it.map { row =>
        val url = row.get(urlIdx)
        val (body, err) =
          if (url == null) (null, "null url")
          else fetchBytesWith(client, url.toString, timeoutMs) match {
            case Right(b) => (b, null)
            case Left(e) => (null, e)
          }
        Row.fromSeq(row.toSeq :+ body :+ err)
      }
    }(Encoders.row(outSchema))
  }

  // --- metadata stage (service.go:116-210) --------------------------------

  /** Fetch+validate uri tasks: adds metadata json, validity verdict and the
    * has-image probe. Input: (owner, token_id, url, priority). */
  def metadataStage(tasks: DataFrame): DataFrame = {
    val f = fetched(tasks)
    f.withColumn("metadata", col("body").cast("string"))
      .withColumn("verdict", J.erc721Validate(col("metadata")))
      .withColumn("valid", col("verdict.valid") && col("fetch_error").isNull)
      .withColumn("has_image", J.hasImage(col("metadata")))
      .drop("body")
  }

  /** Change-detect + upsert (service.go:183-206): latest task per token wins
    * (upsert), rows whose metadata equals the existing snapshot's keep their
    * old lastUpdated (DeepEqual change-detect), everything probed gets a new
    * lastChecked. `now` is the caller's clock — deterministic replays. */
  def mergeMetadata(existing: DataFrame, incoming: DataFrame,
      now: Column): DataFrame = {
    // columns renamed (not DataFrame-reference-disambiguated): existing and
    // incoming share lineage when merges chain batch-over-batch, and
    // df("col") resolution is ambiguous on self-referential joins
    val ex = existing.select(col("token_id"),
      col("owner").as("ex_owner"), col("url").as("ex_url"),
      col("metadata").as("ex_metadata"),
      col("last_updated").as("ex_last_updated"),
      col("last_checked").as("ex_last_checked"))
    val inc = incoming
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("token_id")
          .orderBy(col("priority").desc, col("url"))))
      .filter(col("rn") === 1)
      .select(col("token_id"), col("owner").as("in_owner"),
        col("url").as("in_url"), col("metadata").as("new_metadata"),
        lit(true).as("in_probed"))
    ex.join(inc, Seq("token_id"), "full_outer")
      .select(
        col("token_id"),
        coalesce(col("in_owner"), col("ex_owner")).as("owner"),
        coalesce(col("in_url"), col("ex_url")).as("url"),
        coalesce(col("new_metadata"), col("ex_metadata")).as("metadata"),
        // changed rows (or brand-new ones) get stamped, unchanged keep old
        when(col("new_metadata").isNotNull &&
          (col("ex_metadata").isNull ||
            col("new_metadata") =!= col("ex_metadata")), now)
          .otherwise(col("ex_last_updated")).as("last_updated"),
        // EVERY probed row advances last_checked — including a probe
        // whose fetch failed (null metadata). Stamping only successes
        // left permanently-failing URLs eternally "stalest", so the
        // freshness daemon's fixed budget starved healthy-but-aging
        // rows behind dead ones
        when(col("in_probed").isNotNull, now)
          .otherwise(col("ex_last_checked")).as("last_checked"))
  }

  /** Rows that should flow to the image stage (service.go:146-150). */
  def imageTasks(metadataStage: DataFrame): DataFrame =
    metadataStage.filter(col("valid") && col("has_image"))
      .select(col("owner"), col("token_id"),
        get_json_object(col("metadata"), "$.image").as("url"),
        col("priority"))

  // --- image stage (resizer.go:88-212 + storage.go:16-84) -----------------

  /** Fetch → sniff → per-resolution resize → gzip → content key. One output
    * row per (task, resolution); undecodable bytes keep a null payload and
    * carry the sniffed format for diagnostics. */
  def imageStage(tasks: DataFrame,
      resolutions: Seq[(Int, Int)] = B.defaultResolutions): DataFrame = {
    val f = fetched(tasks)
    val res = array(resolutions.map { case (w, h) =>
      struct(lit(w).as("w"), lit(h).as("h"))
    }: _*)
    f.withColumn("format", B.imgFormat(col("body")))
      .withColumn("r", explode(res))
      .withColumn("resized",
        B.imgResize(col("body"), col("r.w"), col("r.h")))
      .withColumn("payload", B.gzip(col("resized")))
      // FileNameFormat "%s_%s_%d_%d" (x/imgstorage/service.go:7)
      .withColumn("name", format_string("%s_%s_%d_%d", col("owner"),
        col("token_id"), col("r.w"), col("r.h")))
      .withColumn("content_key", B.contentKey(col("name"), col("resized")))
      // fetch_error rides through: a 404'd URL and an undecodable
      // image both surface as null payload, and without the error
      // column downstream retry/alerting cannot tell a transient
      // network failure from corrupt bytes
      .select("owner", "token_id", "name", "format", "r.w", "r.h",
        "payload", "content_key", "fetch_error")
  }

  /** Content-addressed dedup before the sink (S9/J6): drop rows whose
    * (name, content_key) already exist — the resizer's checksum probe
    * (resizer.go:137-174) as a left-anti join. */
  def dedupAgainstStore(images: DataFrame, store: DataFrame): DataFrame =
    images.join(store.select("name", "content_key"),
      Seq("name", "content_key"), "left_anti")

  /** Superseded-version GC (x/imgstorage/storage.go:76-81): the reference
    * glob-deletes every `name_*` object except the newly-written content.
    * Batch analog over the row store: keep ONLY the winning version per
    * logical name — highest `seqCol`, ties broken on content_key so replays
    * are deterministic. Latest-per-key window, one shuffle on name. */
  def gcSuperseded(store: DataFrame, seqCol: String = "seq"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("name")
      .orderBy(col(seqCol).desc, col("content_key").desc)
    store.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Physical compaction of a parquet image store: rewrite `path` with only
    * current versions (gcSuperseded), swap directories via the filesystem
    * API. Returns (rowsBefore, rowsAfter). Run as the store's periodic
    * maintenance job — reclaims the space the reference reclaims inline at
    * write time. */
  def compactStore(spark: SparkSession, path: String,
      seqCol: String = "seq"): (Long, Long) = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var nBefore = 0L
    // shared crash-recovering two-rename swap (see AtomicSwap's
    // invariant and single-writer contract)
    graft.sources.AtomicSwap.rewrite(fs, path) { tmp =>
      val before = spark.read.parquet(path)
      nBefore = before.count()
      gcSuperseded(before, seqCol).write.mode("overwrite").parquet(tmp)
    }
    val nAfter = spark.read.parquet(path).count()
    (nBefore, nAfter)
  }

  // --- freshness daemon (mongoDaemon/service.go:98-176) -------------------

  /** Stalest-`percent`% of the snapshot, re-enqueued as Regular-priority
    * tasks (W1 shape: global staleness sort + computed limit). */
  def stalestTasks(snapshot: DataFrame, percent: Int = 20): DataFrame = {
    val n = snapshot.count()
    // a small (or freshly bootstrapped) snapshot must still refresh:
    // integer percent math truncates to ZERO below 100/percent rows,
    // which silently disabled the daemon forever on small stores
    val k = math.max(if (n == 0) 0L else 1L, n * percent / 100).toInt
    snapshot.orderBy(col("last_checked").asc, col("token_id"))
      .limit(k)
      .select(col("owner"), col("token_id"), col("url"),
        lit(Priority.Regular).as("priority"))
  }
}
