package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of join (P7 meets the point-in-time operator): left events
  * arrive continuously and each is answered with the latest right row
  * at-or-before its timestamp for the same key — the online form of
  * [[graft.operators.AsOfJoin]] (same tagged-union semantics, same
  * inclusive-<= / highest-tieBreak rules), state living in the streaming
  * state store instead of a window.
  *
  * Semantics under streaming reality:
  *  - per micro-batch, a key's events replay in (ts, side, tieBreak) order,
  *    so rights arriving in the same batch as a later left ARE visible
  *    to it (exactly the batch operator's ordering);
  *  - a left can only see rights from earlier-or-same batches — if a right
  *    is delayed past the left's batch, the left resolves against the
  *    state as of its batch (the standard CDC-enrichment contract);
  *  - right history per key is capped at `maxHistory` entries (newest
  *    kept), bounding state like a watermark would — look-ups older than
  *    the retained horizon resolve to the oldest retained entry's
  *    predecessor, i.e. None.
  *
  * Scale: state is hash-partitioned by key; memory per key is
  * O(maxHistory); each micro-batch group materializes only that batch's
  * events for the key (bounded by batch size, not history).
  */
object StreamingAsOf {

  /** Tagged input: side 0 = right (payload-bearing), 1 = left (probe). */
  case class In(key: String, tsMicros: Long, side: Int, tieBreak: Long,
      leftId: Long, payload: String)

  case class Out(key: String, leftId: Long, tsMicros: Long,
      payload: Option[String])

  /** Right history per key: (ts, tieBreak, payload), newest-first. */
  case class KeyState(rights: List[(Long, Long, String)])

  /** Ordered insert into the newest-first history — O(h) per event, no
    * re-sort, and no negated-key ordering (negation overflows on
    * Long.MinValue and would corrupt the order). */
  private def insert(rights: List[(Long, Long, String)],
      e: (Long, Long, String), cap: Int): List[(Long, Long, String)] = {
    val (newer, older) = rights.span(r =>
      r._1 > e._1 || (r._1 == e._1 && r._2 > e._2))
    (newer ::: e :: older).take(cap)
  }

  private def step(maxHistory: Int)(
      key: String, it: Iterator[In],
      state: GroupState[KeyState]): Iterator[Out] = {
    val before = state.getOption.map(_.rights).getOrElse(Nil)
    var rights = before
    val out = List.newBuilder[Out]
    // replay the batch in the batch operator's order: right sorts before
    // left on equal ts (side 0 < 1), ties resolve to the highest tieBreak
    it.toVector.sortBy(e => (e.tsMicros, e.side, e.tieBreak)).foreach { e =>
      if (e.side == 0)
        rights = insert(rights, (e.tsMicros, e.tieBreak, e.payload),
          maxHistory)
      else {
        // newest-first: the first entry with ts <= probe IS the floor with
        // the highest (ts, tieBreak)
        val hit = rights.find(_._1 <= e.tsMicros)
        out += Out(key, e.leftId, e.tsMicros, hit.map(_._3))
      }
    }
    // probe-only keys must not pin empty state forever (unbounded growth
    // across high-cardinality probe keys); only right-bearing keys persist
    if (rights.nonEmpty) state.update(KeyState(rights))
    else if (before.nonEmpty) state.remove()
    out.result().iterator
  }

  def asofStream(tagged: Dataset[In], maxHistory: Int = 64): Dataset[Out] = {
    import tagged.sparkSession.implicits._
    tagged
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(step(maxHistory))
  }
}
