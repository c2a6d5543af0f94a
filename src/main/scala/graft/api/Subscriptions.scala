package graft.api

import graft.api.QueryBuilder.Request
import graft.sources.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** SUBSCRIPTIONS — the third Hasura surface after queries and
  * mutations: a parsed read [[Request]] served continuously over a
  * stream, re-answered as data changes. No new grammar: a subscription
  * document is a read query under the `subscription` keyword, so
  * [[GraphQl.parse]]'s output is the input here; what this module adds
  * is the ROUTING of a request to the engine's streaming twins with the
  * output mode each shape needs:
  *
  *  - APPEND shape (scalar fields + where only): the result set is
  *    monotone under arriving rows, so each trigger emits exactly the
  *    new matching rows — a plain filtered/projected append stream
  *    (Hasura's streaming subscription).
  *  - LIVE-QUERY shape (order_by / limit / distinct_on / any
  *    re-ranking): the full result can change on every event, so each
  *    trigger merges the delta into latest-wins per-key state (the S8
  *    snapshot upsert — [[graft.sources.SnapshotStore.merge]], the
  *    same shape `MarketplaceStream.snapshotStream` keeps in the state
  *    store) and re-evaluates the request against it, pushing the
  *    COMPLETE result — Hasura's live query, Spark's complete-mode
  *    posture.
  *
  * Batch equivalence is the correctness contract: after every trigger,
  * the pushed result equals [[QueryBuilder.runRoot]] over the batch
  * latest-state of all data seen so far (spec-pinned per trigger, the
  * CorpusStreams pattern).
  *
  * Scale: the live-query state is one latest-wins row per key (hash-
  * partitioned; the localCheckpoint bounds lineage, the analog of the
  * state store's per-batch snapshot), and each trigger pays one merge
  * shuffle on the key + the request's own plan over the snapshot —
  * nothing a keyed streaming aggregation doesn't already pay.
  */
object Subscriptions {

  /** Can this request serve as an append stream? Monotone shapes only:
    * any ordering/slicing/dedup re-ranks old rows on new data. */
  def isAppendShape(req: Request): Boolean =
    req.orderBy.isEmpty && req.limit.isEmpty && req.offset == 0 &&
      req.distinctOn.isEmpty && req.nested.isEmpty && req.aggRels.isEmpty

  /** APPEND-shape subscription: the streaming DataFrame of the
    * request's root table in, the filtered projection out — attach
    * your sink and trigger. The where-tree compiles exactly as in
    * batch, so predicates push into the streaming source scan. */
  def appendStream(stream: DataFrame, req: Request): DataFrame = {
    require(isAppendShape(req),
      s"subscription on '${req.table}': order_by/limit/distinct_on/" +
        "relationships need the live-query mode (liveQuery)")
    val f = req.where.map(w => stream.filter(w.toColumn)).getOrElse(stream)
    f.select(req.fields.map(col): _*)
  }

  /** LIVE-QUERY subscription: per trigger, fold the micro-batch into
    * latest-wins per-key state and push the request's COMPLETE result
    * over it. `seqCol` names the stream's ordering column (the S4/S8
    * merge contract); pass None for UPDATE-MODE inputs that already
    * carry one row per changed key per trigger (e.g.
    * `MarketplaceStream.snapshotStream` output) — the batch id then
    * serves as the sequence, later triggers winning. `push` receives
    * (batchId, full result) after each trigger.
    *
    * Lifetime: CONNECTION-SCOPED, like a Hasura subscription (it dies
    * with its WebSocket and the client re-subscribes). The state var
    * lives in this session and the started query uses a session-temp
    * checkpoint by design — this method never accepts a
    * checkpointLocation, because resuming from committed offsets with
    * an empty state var would silently serve results missing every
    * pre-restart key. A DURABLE subscription is the composition of a
    * persisted snapshot ([[graft.sources.SnapshotStore]] via
    * foreachBatch) with a fresh liveQuery over it. */
  def liveQuery(stream: DataFrame, req: Request, keyCol: String,
      seqCol: Option[String] = None)
      (push: (Long, DataFrame) => Unit): StreamingQuery = {
    require(req.nested.isEmpty && req.aggRels.isEmpty,
      s"subscription on '${req.table}': relationship selections are " +
        "not served over streams")
    var snap: Option[DataFrame] = None
    stream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val sc = seqCol.getOrElse("_sub_seq")
        val delta =
          if (seqCol.isDefined) batch
          else {
            // batch-id sequencing is only sound when the input is
            // update-mode (one row per changed key per trigger) — two
            // same-key rows would TIE in the merge window and an
            // arbitrary one would win; loud, never a silent wrong row
            val dup = batch.groupBy(keyCol)
              .count().filter(col("count") > 1).limit(1).collect()
            require(dup.isEmpty, "liveQuery(seqCol = None): the " +
              s"micro-batch carries ${dup.headOption.map(_.get(0))
                .getOrElse("?")} more than once — batch-id sequencing " +
              "needs one row per key per trigger (pass a real seqCol " +
              "for append-mode inputs)")
            batch.withColumn(sc, lit(bid))
          }
        val cur = snap.getOrElse(delta.limit(0))
        // latest-wins per key — exactly the S8 snapshot upsert; the
        // eager localCheckpoint materializes this trigger's state and
        // cuts the lineage (the state-store snapshot analog)
        val merged = SnapshotStore.merge(cur, delta, keyCol, sc)
          .localCheckpoint(true)
        snap = Some(merged)
        push(bid, QueryBuilder.runRoot(merged.drop(sc), req))
        ()
      }
      .start()
  }
}
