package graft.pipeline

import graft.SparkSpec
import graft.functions.{BinaryFunctions => B}
import org.apache.spark.sql.functions._

/** The §3.3 enrichment chain, end to end with data: / file: URLs (this
  * environment has no network — same code path as http minus the socket). */
class EnrichmentSpec extends SparkSpec {
  import spark.implicits._

  private def dataUrl(body: String): String =
    "data:," + java.net.URLEncoder.encode(body, "UTF-8").replace("+", "%20")

  test("metadata stage: fetch, validate, has_image") {
    val tasks = Seq(
      ("o1", "tok1", dataUrl("""{"name":"n","description":"d","image":"i"}"""), 3),
      ("o2", "tok2", dataUrl("""{"name":"n","description":"d"}"""), 1),
      ("o3", "tok3", "file:///nonexistent/xyz.json", 1))
      .toDF("owner", "token_id", "url", "priority")
    val out = Enrichment.metadataStage(tasks)
      .select("token_id", "valid", "has_image", "fetch_error").collect()
      .map(r => r.getString(0) -> (r.getBoolean(1), r.getBoolean(2),
        Option(r.getString(3)))).toMap
    assert(out("tok1")._1 && out("tok1")._2)
    assert(!out("tok2")._1 && !out("tok2")._2)
    assert(!out("tok3")._1 && out("tok3")._3.isDefined)
  }

  test("merge: latest-priority wins, change-detect keeps last_updated") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val existing = Seq(
      ("tok1", "o1", "u1", """{"name":"old"}""", t0, t0),
      ("tok2", "o2", "u2", """{"name":"same"}""", t0, t0))
      .toDF("token_id", "owner", "url", "metadata", "last_updated",
        "last_checked")
    val existing2 = Seq(
      ("tok4", "o4", "u4", """{"name":"old4"}""", t0, t0))
      .toDF("token_id", "owner", "url", "metadata", "last_updated",
        "last_checked")
    val incoming = Seq(
      ("tok1", "o1", "u1", """{"name":"new"}""", 1),   // changed
      ("tok1", "o1", "u1b", """{"name":"newer"}""", 4), // higher priority wins
      ("tok2", "o2", "u2", """{"name":"same"}""", 1),  // unchanged
      ("tok3", "o3", "u3", """{"name":"brand"}""", 2), // insert
      ("tok4", "o4", "u4", null, 1)) // probed, fetch FAILED
      .toDF("token_id", "owner", "url", "metadata", "priority")
    val now = lit(java.sql.Timestamp.valueOf("2026-02-01 00:00:00"))
    val merged = Enrichment.mergeMetadata(
      existing.unionByName(existing2), incoming, now)
      .collect().map(r => r.getAs[String]("token_id") ->
        (r.getAs[String]("metadata"), r.getAs[java.sql.Timestamp]("last_updated"),
          r.getAs[java.sql.Timestamp]("last_checked"))).toMap
    val feb = java.sql.Timestamp.valueOf("2026-02-01 00:00:00")
    assert(merged("tok1")._1 === """{"name":"newer"}""")
    assert(merged("tok1")._2 === feb)
    assert(merged("tok2")._1 === """{"name":"same"}""")
    assert(merged("tok2")._2 === t0)  // unchanged → stamp preserved
    assert(merged("tok2")._3 === feb) // but it WAS checked
    assert(merged("tok3")._1 === """{"name":"brand"}""")
    // a probed row whose FETCH FAILED (null metadata) keeps its stored
    // metadata but still advances last_checked — stamping successes
    // only left permanently-failing URLs eternally "stalest" and
    // starved the freshness daemon's budget on dead URLs
    assert(merged("tok4")._1 === """{"name":"old4"}""")
    assert(merged("tok4")._2 === t0)  // no change → last_updated kept
    assert(merged("tok4")._3 === feb) // but it WAS checked
  }

  test("fetchBytes data URIs decode ONCE: bodies containing '+' or " +
    "'%' survive the round-trip (the double decode corrupted them)") {
    def roundTrip(body: String): String = {
      val url = "data:," + java.net.URLEncoder.encode(body, "UTF-8").replace("+", "%20")
      new String(Enrichment.fetchBytes(url)
        .fold(e => fail(s"fetch failed: $e"), identity), "UTF-8")
    }
    assert(roundTrip("""{"p":"c++"}""") === """{"p":"c++"}""")
    assert(roundTrip("100%") === "100%")
    assert(roundTrip("a b+c%20d") === "a b+c%20d")
    // strict RFC-2397 decoding: a LITERAL '+' in the raw URI is a plus,
    // not an x-www-form-urlencoded space
    assert(new String(Enrichment.fetchBytes("data:,c+b")
      .fold(e => fail(s"fetch failed: $e"), identity), "UTF-8") === "c+b")
  }

  test("stalestTasks on a SMALL snapshot still refreshes: the percent " +
    "math must never truncate a non-empty snapshot's budget to zero") {
    val rows = (1 to 4).map(i =>
      (s"tok$i", s"o$i", s"u$i",
        java.sql.Timestamp.valueOf(f"2026-01-0$i 00:00:00")))
    val snap = rows.toDF("token_id", "owner", "url", "last_checked")
    val picked = Enrichment.stalestTasks(snap, 20)
      .select("token_id").collect().map(_.getString(0)).toSeq
    assert(picked === Seq("tok1"), "4 rows * 20% floors to 0 — the " +
      "daemon must still re-check the single stalest row")
    assert(Enrichment.stalestTasks(snap.limit(0), 20).count() === 0L)
  }

  test("image stage resizes to both reference resolutions and dedups") {
    // Write two identical + one distinct PNG to disk, fetch via file://.
    val dir = java.nio.file.Files.createTempDirectory("graft_img")
    def write(name: String, seed: Long): String = {
      val p = dir.resolve(name)
      java.nio.file.Files.write(p, B.syntheticPng(seed, 32, 24))
      "file://" + p
    }
    val tasks = Seq(
      ("o1", "tokA", write("a.png", 1), 1),
      ("o1", "tokB", write("b.png", 1), 1), // same bytes as A
      ("o2", "tokC", write("c.png", 2), 1))
      .toDF("owner", "token_id", "url", "priority")
    val out = Enrichment.imageStage(tasks).cache()
    assert(out.count() === 6) // 3 tasks × 2 resolutions
    assert(out.select("w", "h").distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet === Set((200, 150), (120, 90)))
    // payload is gzip'd PNG; round-trip decodes at the target size
    val sample = out.filter(col("token_id") === "tokA" && col("w") === 120)
      .select("payload").head().getAs[Array[Byte]](0)
    val png = B.gunzipBytes(sample)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth === 120 && img.getHeight === 90)

    // second run against a store holding the first run's keys → all dropped
    val store = out.select("name", "content_key")
    assert(Enrichment.dedupAgainstStore(out, store).count() === 0)
    // same content, different name (owner_token differs) → still stored:
    // content addressing is per logical key (storage.go:37-62)
    val a = out.filter(col("token_id") === "tokA").select("content_key")
      .collect().map(_.getString(0)).toSet
    val bKeys = out.filter(col("token_id") === "tokB").select("content_key")
      .collect().map(_.getString(0)).toSet
    assert(a.intersect(bKeys).isEmpty)
  }

  test("superseded-version GC keeps only the current content per name") {
    val store = Seq(
      ("o1_tokA_200_150", "k1", 1L), // superseded by k2
      ("o1_tokA_200_150", "k2", 2L),
      ("o2_tokB_200_150", "k3", 1L), // only version → kept
      ("o2_tokB_120_90", "k4", 1L))
      .toDF("name", "content_key", "seq")
    val kept = Enrichment.gcSuperseded(store)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(kept === Map("o1_tokA_200_150" -> "k2",
      "o2_tokB_200_150" -> "k3", "o2_tokB_120_90" -> "k4"))

    // physical compaction rewrites the parquet store in place
    val dir = java.nio.file.Files.createTempDirectory("graft_gc").toString + "/store"
    store.write.parquet(dir)
    val (before, after) = Enrichment.compactStore(spark, dir)
    assert(before === 4 && after === 3)
    assert(spark.read.parquet(dir).count() === 3)
  }

  test("stalest-20% picks the oldest last_checked rows") {
    val rows = (1 to 10).map(i =>
      (s"tok$i", s"o$i", s"u$i",
        java.sql.Timestamp.valueOf(f"2026-01-${i}%02d 00:00:00")))
    val snap = rows.toDF("token_id", "owner", "url", "last_checked")
    val picked = Enrichment.stalestTasks(snap, 20)
      .select("token_id").collect().map(_.getString(0)).toSet
    assert(picked === Set("tok1", "tok2"))
  }
}
