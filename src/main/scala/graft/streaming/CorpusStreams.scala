package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming twins of the corpus-quality surface: a training-data intake
  * runs continuously, and the audit counters that gate it (q69's filter
  * funnel) must be maintainable per trigger, not recomputed per batch
  * job.
  */
object CorpusStreams {

  /** Cumulative quality funnel over a document stream (needs `text` and
    * `n_chars` columns): the exact fold `TextQueries.funnelCounts` runs
    * in batch, as a complete-mode streaming aggregate — conditional sums
    * are trivially mergeable, so every trigger emits the corpus-so-far
    * survivor counts n0..n4 with no per-doc state retained (state is
    * five longs per stage, O(1) forever).
    *
    * Failure semantics match the batch twin: a malformed doc (null text)
    * contributes to n0 and fails the first predicate, never crashes the
    * query. */
  def funnelStream(docs: DataFrame): DataFrame =
    graft.queries.TextQueries.funnelCounts(docs)
}
