package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Frequent-items (heavy-hitter) sketching — the bounded-state path for
  * "top-k most frequent tokens" over a corpus whose vocabulary is far too
  * large to group-by exactly (the 100 TB reality: web-scale corpora have
  * billions of distinct tokens/URLs/hosts, and a full `groupBy(token)`
  * shuffles the whole vocabulary every time someone asks for the top 20).
  *
  * [[MisraGriesAgg]] is the classic Misra-Gries summary as a Catalyst
  * [[TypedImperativeAggregate]]: each partition folds its rows into a
  * capacity-bounded counter map (O(capacity) state, no matter how many
  * rows), partial maps are merged pairwise with the Agarwal et al.
  * mergeable-summaries rule, and only capacity-sized summaries ever cross
  * the wire — the same two-phase partial/final shape as any built-in
  * sketch aggregate (cf. Spark's own `BloomFilterAggregate`, which
  * [[BloomFunctions]] wraps for membership pruning).
  *
  * Guarantee (the standard MG bound): every item with true frequency
  * > n/(capacity+1) of n total rows survives, and each surviving counter
  * lower-bounds the true count by at most n/(capacity+1). Survivor SETS
  * are therefore a superset of the true heavy hitters; which *light*
  * items also survive depends on arrival order, so exact consumers must
  * re-count survivors (see TextQueries.q78 — sketch prunes, an exact
  * pass over the pruned candidate set confirms, mirroring q76's
  * bloom-then-confirm shape).
  */
object FrequencyFunctions {

  /** Aggregate a string column into a Misra-Gries summary:
    * array<struct<w string, c long>> sorted by (c desc, w) — counts are
    * lower bounds, see object doc. */
  def misraGries(values: Column, capacity: Int): Column =
    Bridge.column(MisraGriesAgg(Bridge.expression(values), capacity)
      .toAggregateExpression())

  case class MisraGriesAgg(
      child: Expression,
      capacity: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

    require(capacity > 0, "misra_gries capacity must be positive")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("w", StringType), StructField("c", LongType))))
    override def prettyName: String = "misra_gries"

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string column, got ${t.sql}")
      }

    override def createAggregationBuffer(): mutable.HashMap[String, Long] =
      mutable.HashMap.empty

    override def update(buf: mutable.HashMap[String, Long],
        input: InternalRow): mutable.HashMap[String, Long] = {
      val v = child.eval(input)
      if (v != null) {
        // copy out of Spark's reused row buffer before keying the map
        val w = v.asInstanceOf[UTF8String].toString
        buf.get(w) match {
          case Some(c) => buf.update(w, c + 1)
          case None if buf.size < capacity => buf.update(w, 1L)
          case None => // full: decrement-all, drop zeros, discard arrival
            buf.keys.toArray.foreach { k =>
              val c = buf(k) - 1
              if (c == 0) buf.remove(k) else buf.update(k, c)
            }
        }
      }
      buf
    }

    /** Mergeable-summaries rule: add counters, then if over capacity
      * subtract the (capacity+1)-th largest count from every counter and
      * keep the strictly-positive ones — the merged summary obeys the
      * same error bound over the combined stream. */
    override def merge(buf: mutable.HashMap[String, Long],
        other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      other.foreach { case (w, c) =>
        buf.update(w, buf.getOrElse(w, 0L) + c)
      }
      if (buf.size > capacity) {
        // (capacity+1)-th largest with (count, key) ordering so the cut
        // is deterministic even among equal counts
        val cut = buf.toSeq.map(_._2).sorted(Ordering[Long].reverse)
          .apply(capacity)
        val dead = buf.iterator.collect {
          case (w, c) if c - cut <= 0 => w
        }.to(mutable.ArrayBuffer)
        buf.mapValuesInPlace((_, c) => c - cut)
        dead.foreach(buf.remove)
      }
      buf
    }

    override def eval(buf: mutable.HashMap[String, Long]): Any =
      new GenericArrayData(buf.toSeq.sortBy { case (w, c) => (-c, w) }
        .map { case (w, c) =>
          InternalRow(UTF8String.fromString(w), c)
        }.toArray[Any])

    override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.size)
      buf.foreach { case (w, c) =>
        val b = w.getBytes("UTF-8")
        out.writeInt(b.length); out.write(b); out.writeLong(c)
      }
      out.flush(); bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = mutable.HashMap.empty[String, Long]
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val b = new Array[Byte](len); in.readFully(b)
        buf.update(new String(b, "UTF-8"), in.readLong())
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): MisraGriesAgg = copy(child = c.head)
  }
}
