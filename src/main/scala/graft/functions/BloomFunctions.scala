package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.Bridge

/** Distributed Bloom-filter build + probe, the scale path for
  * membership-pruning a huge scan against a set too large to broadcast
  * as rows (decontamination blocklists, seen-URL sets, dedup ledgers —
  * the reference's content-store existence probe, x/imgstorage/
  * storage.go:37-62, generalized to set scale).
  *
  * Wraps Spark's own `BloomFilterAggregate` / `BloomFilterMightContain`
  * — the exact expressions Catalyst injects for runtime bloom-filter
  * joins — so the build is a distributed two-phase aggregate (partial
  * filters merged by OR, no row leaves its executor) and the probe is a
  * codegen'd predicate that stays inside whole-stage codegen. Only the
  * serialized filter (KBs–MBs, bounded by `numBits`) ever reaches the
  * driver, like the IVF codebook.
  *
  * Semantics: no false negatives, bounded false positives — callers that
  * need exactness confirm survivors with an equi-join (see
  * TextQueries.q76): the bloom prunes the giant side BEFORE the shuffle,
  * the join only sees survivors.
  */
object BloomFunctions {

  /** Aggregate a Long column into a serialized Bloom filter (binary).
    * `expectedItems` sizes the filter (~1.2 bytes/item at the default
    * 3% FPP, capped by Spark's runtime-filter limits). */
  def bloomAgg(values: Column, expectedItems: Long): Column =
    Bridge.column(
      new BloomFilterAggregate(Bridge.expression(values), expectedItems)
        .toAggregateExpression())

  /** Probe: true when `value` (Long) MIGHT be in the serialized filter
    * (false ⇒ definitely absent). `filter` must be foldable — a
    * `lit(bytes)` of a built filter. */
  def mightContain(filter: Column, value: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Bridge.expression(filter), Bridge.expression(value)))
}
