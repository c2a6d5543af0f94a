package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The export manifest is a consumer-verifiable shipping contract:
  * recomputing it over received shards must equal the producer's, and
  * any damage — a dropped row, a corrupted text — must flip exactly
  * the damaged shard's row. */
class CorpusExportSpec extends SparkSpec {
  import spark.implicits._

  test("manifest round-trips the export, names a damaged shard, and " +
    "shards deterministically") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
      .select("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft_export").toString + "/corpus"
    val produced = CorpusExport.exportShards(docs, path).collect()
    assert(produced.length === 8)
    assert(produced.map(_.getLong(1)).sum === docs.count())
    // the consumer's recompute over the received shards equals the
    // producer's manifest byte for byte
    val received = CorpusExport
      .manifest(spark.read.parquet(path)).collect()
    assert(received.map(_.toSeq).toSeq === produced.map(_.toSeq).toSeq)
    // determinism: a rerun of the assignment (no write) shards
    // identically
    val again = CorpusExport.manifest(
      docs.withColumn("shard", CorpusExport.shardOf(8))).collect()
    assert(again.map(_.toSeq).toSeq === produced.map(_.toSeq).toSeq)
    // tamper detection: drop one row of shard 0 → ONLY shard 0's
    // n_docs and checksum change
    val full = spark.read.parquet(path)
    val victim = full.filter(col("shard") === 0)
      .select(min("doc_id")).head.getLong(0)
    val tampered = CorpusExport
      .manifest(full.filter(col("doc_id") =!= victim)).collect()
    produced.zip(tampered).foreach { case (p, t) =>
      if (p.getLong(0) == 0L) {
        assert(t.getLong(1) === p.getLong(1) - 1)
        assert(t.getString(3) !== p.getString(3),
          "a dropped row must flip the shard checksum")
      } else assert(t.toSeq === p.toSeq,
        s"undamaged shard ${p.getLong(0)} changed")
    }
    // ...and a corrupted TEXT flips the checksums with counts intact
    val corrupted = CorpusExport.manifest(
      full.withColumn("text",
        when(col("doc_id") === victim, lit("tampered"))
          .otherwise(col("text")))).collect()
    val s0 = corrupted.find(_.getLong(0) == 0L).get
    val p0 = produced.find(_.getLong(0) == 0L).get
    assert(s0.getLong(1) === p0.getLong(1))
    assert(s0.getString(3) !== p0.getString(3))
    assert(s0.getLong(4) !== p0.getLong(4),
      "the order-free xor checksum must flip on a corrupted text")
    // a SWAP of two docs' texts cancels a text-only xor; keying the
    // hash on (doc_id, text) keeps it visible — and the ordered fp
    // sees the sequence change too
    val in0 = full.filter(col("shard") === 0)
      .select("doc_id").orderBy("doc_id").limit(2)
      .collect().map(_.getLong(0))
    val texts2 = full.filter(col("doc_id").isin(in0: _*))
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val swapped2 = CorpusExport.manifest(full.withColumn("text",
      when(col("doc_id") === in0(0), lit(texts2(in0(1))))
        .when(col("doc_id") === in0(1), lit(texts2(in0(0))))
        .otherwise(col("text")))).collect()
    val w0 = swapped2.find(_.getLong(0) == 0L).get
    assert((w0.getLong(1) === p0.getLong(1)) &&
      (w0.getLong(4) !== p0.getLong(4)),
      "a text swap must stay visible to the doc-id-keyed xor")
  }

  test("null-text rules: null texts skip both checksums, an all-null " +
    "shard answers NULL checksums (the string_agg/bit_xor empty-input " +
    "answer on both engines), counts still see every row") {
    // a synthetic corpus exercising the null region the fixture lacks
    // — one shard (the null semantics under test are per-shard math,
    // hash placement is the first test's business)
    val rows = Seq[(Long, String)](
      (1L, "alpha beta"), (2L, null), (3L, "gamma"), (4L, null))
      .toDF("doc_id", "text")
      .withColumn("shard", lit(0L))
    val m0 = CorpusExport.manifest(rows).head
    // every row counted; null texts contribute no tokens
    assert(m0.getLong(1) === 4L)
    assert(m0.getLong(2) === 3L)
    // dropping a NULL-text doc: checksums unchanged (nothing to
    // checksum), n_docs catches the drop
    val d0 = CorpusExport.manifest(
      rows.filter(col("doc_id") =!= 2L)).head
    assert(d0.getLong(1) === 3L)
    assert(Option(d0.get(3)) === Option(m0.get(3)))
    assert(Option(d0.get(4)) === Option(m0.get(4)))
    // an ALL-null-text shard: NULL for both checksums, never md5("")
    val allNull = CorpusExport.manifest(
      Seq[(Long, String)]((9L, null), (10L, null)).toDF("doc_id", "text")
        .withColumn("shard", lit(0))).head
    assert(allNull.getLong(1) === 2L)
    assert(allNull.isNullAt(3), "all-null shard fp must be NULL " +
      "(string_agg semantics), not md5 of the empty string")
    assert(allNull.isNullAt(4))
  }
}
