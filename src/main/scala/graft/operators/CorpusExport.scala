package graft.operators

import graft.functions.TextFunctions.seededHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus EXPORT — the "ship the dataset" step after split (q54), mix
  * (q63), pack (q65), and dedup have done their work: the corpus lands
  * in a DETERMINISTIC hash-sharded layout and ships with a manifest a
  * consumer re-verifies before training — per shard, the document
  * count, token count, and a content fingerprint (md5 over the
  * doc-id-ordered per-document md5s), so truncated copies, reordered
  * rewrites, and silent row corruption are all caught by one
  * cheap-to-recompute table.
  *
  * Sharding is the q54 discipline: a content-stable seeded hash of the
  * document id, never rand() — the same corpus exports the same shards
  * on any engine, any partitioning, any rerun. Scale: the export is
  * one partitioned write (shuffle keyed on shard); the manifest is one
  * groupBy(shard) whose per-shard collect is bounded by shard size —
  * shard count scales with corpus size precisely so each stays
  * bounded.
  */
object CorpusExport {

  /** The shard assignment — exposed so producers and verifying
    * consumers share one definition. */
  def shardOf(nShards: Int) =
    pmod(seededHash(col("doc_id").cast("string"), 2), lit(nShards.toLong))

  /** Write `docs` hash-sharded under `path` (partitionBy("shard")) and
    * return the manifest computed from the READ-BACK data — the
    * round-trip proves the shipped layout, not the pre-write frame. */
  def exportShards(docs: DataFrame, path: String,
      nShards: Int = 8): DataFrame = {
    docs.withColumn("shard", shardOf(nShards))
      .write.partitionBy("shard").mode("overwrite").parquet(path)
    manifest(docs.sparkSession.read.parquet(path))
  }

  /** The shipping manifest of a sharded corpus (needs doc_id, text,
    * shard): per shard — n_docs, n_tokens (whitespace tokens of
    * non-null texts; null text contributes no tokens on either
    * engine), content_fp = md5 over the doc-id-ordered per-doc md5s
    * (null-text docs skip the concat on both engines — the
    * string_agg/concat_ws null rule), and content_xor = the XOR-fold
    * of each (doc_id, text) pair's 60-bit md5-derived hash. A consumer
    * recomputes this table over what it received; any diff names the
    * damaged shard.
    *
    * Two checksums by design: content_fp is the exact ORDERED audit —
    * its per-shard collect is bounded by shard size (shard count
    * scales with the corpus precisely so each stays bounded) — while
    * content_xor is the O(1)-state order-free form (bit_xor skips
    * nulls identically on both engines, an aggregate buffer of one
    * long) that survives any shard size; keying the hash on
    * (doc_id, text) makes a swap of two docs' texts visible where a
    * text-only xor would cancel. A shard of ONLY null texts answers
    * NULL for both checksums (the string_agg/bit_xor empty-input
    * answer); dropping a null-text row is therefore caught by
    * n_docs, not by the checksums — null texts contribute content
    * nothing can checksum. */
  def manifest(sharded: DataFrame): DataFrame =
    sharded.groupBy(col("shard").cast("long").as("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("text").isNotNull,
          size(split(col("text"), " ")))).as("n_tokens"),
        // an ALL-null-text shard answers a NULL fp on both engines:
        // string_agg over nulls is NULL, and concat_ws would instead
        // hash the empty string — gate on the non-null count so the
        // producer and a DuckDB-recomputing consumer cannot disagree
        // on a healthy shard
        when(count(col("text")) > 0,
          md5(concat_ws("|", transform(
            array_sort(collect_list(
              struct(col("doc_id"), md5(col("text")).as("fp")))),
            x => x.getField("fp"))))).as("content_fp"),
        bit_xor(graft.functions.TextFunctions.hash60(
          concat(col("doc_id").cast("string"), lit("|"), col("text"))))
          .as("content_xor"))
      .orderBy("shard")
}
