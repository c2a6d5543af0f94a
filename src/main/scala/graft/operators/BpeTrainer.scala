package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative byte-pair-encoding vocabulary induction — the training loop
  * whose single step q72 (`TextQueries.q72BpePairs`) exposes as a query.
  *
  * Classic BPE (Sennrich et al., public algorithm): start from the
  * character-level segmentation of the word-frequency table; each
  * iteration counts adjacent symbol pairs weighted by word frequency,
  * picks the most frequent pair (ties broken lexicographically so the
  * result is deterministic), and fuses every non-overlapping, leftmost
  * occurrence of that pair.
  *
  * Scale posture: after the one corpus scan that builds the word-count
  * table, EVERY iteration is vocab-sized — the standard production
  * shape (the corpus is never re-read). Per iteration the driver holds
  * exactly one (pair, count) row (like the IVF codebook pull); the
  * segmentations advance via `localCheckpoint` so the loop's lineage
  * stays flat (same pattern as q62's label propagation). The merge fold
  * is a higher-order `aggregate` — CodegenFallback, but it runs over the
  * vocab table, never the corpus.
  */
object BpeTrainer {

  /** Character-level segmentation of the corpus's word-frequency table:
    * (syms: array<string>, c: long). */
  def initVocab(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      // split(w, "") can emit a trailing "" depending on the regex
      // engine's empty-match handling — strip any empties defensively
      .select(filter(split(col("w"), ""), x => x =!= lit("")).as("syms"),
        col("c"))

  /** Weighted adjacent-pair counts over a segmentation table. */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(col("c"), explode(
        when(size(col("syms")) < 2, array().cast("array<struct<a:string,b:string>>"))
          .otherwise(transform(sequence(lit(0), size(col("syms")) - 2),
            i => struct(element_at(col("syms"), i + 1).as("a"),
              element_at(col("syms"), i + 2).as("b"))))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("c")).as("cnt"))

  /** Fuse every leftmost non-overlapping (a, b) adjacency in one pass —
    * the exact left-to-right semantics of reference BPE. */
  private def applyMerge(vocab: DataFrame, a: String, b: String): DataFrame = {
    // fold state: (out: accumulated symbols, prev: pending symbol or "")
    // "" is safe as the empty sentinel: split(w, "") never yields ""
    val merged = aggregate(
      col("syms"),
      struct(array().cast("array<string>").as("out"), lit("").as("prev")),
      (acc, s) => {
        val out = acc.getField("out"); val prev = acc.getField("prev")
        when(prev === lit(""), struct(out.as("out"), s.as("prev")))
          .when(prev === lit(a) && s === lit(b),
            struct(concat(out, array(concat(prev, s))).as("out"),
              lit("").as("prev")))
          .otherwise(struct(concat(out, array(prev)).as("out"), s.as("prev")))
      },
      acc => when(acc.getField("prev") === lit(""), acc.getField("out"))
        .otherwise(concat(acc.getField("out"),
          array(acc.getField("prev")))))
    vocab.select(merged.as("syms"), col("c"))
  }

  /** Run `nMerges` iterations; returns the learned merge list in order
    * and the final segmentation table. Stops early when no pair is left
    * (fully merged vocabulary). Each superseded checkpoint is
    * unpersisted once its successor has materialized (localCheckpoint is
    * eager), so live vocab copies stay at 2 regardless of nMerges —
    * production merge counts run to tens of thousands. */
  def train(docs: DataFrame, nMerges: Int,
      textCol: String = "text"): (Seq[(String, String)], DataFrame) = {
    var vocab = initVocab(docs, textCol).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    var i = 0
    while (i < nMerges && !done) {
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val next = applyMerge(vocab, a, b).localCheckpoint()
        vocab.unpersist()
        vocab = next
      }
      i += 1
    }
    (merges.toSeq, vocab)
  }
}
