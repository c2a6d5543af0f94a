package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Bounded per-group top-k — the aggregation shape a kNN JOIN needs at
  * scale. The declarative spelling of "top-k per group" is a
  * `row_number` window, but a window cannot pre-reduce: every scored
  * candidate row shuffles to its group's partition before the rank
  * cuts, so a kNN join over |Q| queries ships |corpus|×|Q| rows. A
  * [[TypedImperativeAggregate]] gets Spark's two-phase partial/final
  * machinery instead (the [[FrequencyFunctions.MisraGriesAgg]]
  * posture): each input partition folds its candidates into an
  * O(k)-bounded buffer, buffers merge pairwise, and only k-row
  * summaries cross the wire — the shuffle carries k rows per (input
  * partition, group) no matter how large the corpus is.
  *
  * Unlike the sketch aggregates this one is EXACT: top-k by a total
  * order is a mergeable summary with no error term (max-k of a union =
  * max-k of the per-part max-k's), so no confirm pass is needed.
  * Ordering is (score DESC, id ASC) — the deterministic tie rule every
  * oracle-checked kNN query in this repo uses; round scores BEFORE
  * aggregating when the consumer compares rounded values, so ranking
  * and display can never disagree. */
object TopKFunctions {

  /** Aggregate (score, id) rows into the k best as
    * array<struct<id long, score double>>, sorted (score desc, id). */
  def topK(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKAgg(Bridge.expression(score),
      Bridge.expression(id), k).toAggregateExpression())

  case class TopKAgg(
      score: Expression,
      id: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Long)]] {

    require(k > 0, "top_k needs k > 0")

    override def children: Seq[Expression] = Seq(score, id)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("id", LongType), StructField("score", DoubleType))))
    override def prettyName: String = "top_k"

    override def checkInputDataTypes(): TypeCheckResult =
      (score.dataType, id.dataType) match {
        case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
        case (s, i) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (double score, long id), got " +
            s"(${s.sql}, ${i.sql})")
      }

    // buffer holds at most 2k entries between compactions — amortized
    // O(log k) per row without a heap's per-insert allocation
    override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Long)] =
      mutable.ArrayBuffer.empty

    private def compact(buf: mutable.ArrayBuffer[(Double, Long)]): Unit =
      if (buf.length > k) {
        val top = buf.sortBy { case (s, i) => (-s, i) }.take(k)
        buf.clear(); buf ++= top
      }

    override def update(buf: mutable.ArrayBuffer[(Double, Long)],
        input: InternalRow): mutable.ArrayBuffer[(Double, Long)] = {
      val s = score.eval(input)
      val i = id.eval(input)
      if (s != null && i != null) {
        buf += ((s.asInstanceOf[Double], i.asInstanceOf[Long]))
        if (buf.length >= 2 * k) compact(buf)
      }
      buf
    }

    override def merge(buf: mutable.ArrayBuffer[(Double, Long)],
        other: mutable.ArrayBuffer[(Double, Long)])
        : mutable.ArrayBuffer[(Double, Long)] = {
      buf ++= other
      compact(buf)
      buf
    }

    override def eval(buf: mutable.ArrayBuffer[(Double, Long)]): Any = {
      compact(buf)
      new GenericArrayData(buf.sortBy { case (s, i) => (-s, i) }
        .map { case (s, i) => InternalRow(i, s) }.toArray[Any])
    }

    override def serialize(
        buf: mutable.ArrayBuffer[(Double, Long)]): Array[Byte] = {
      compact(buf) // never ship more than k over the wire
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.length)
      buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
      out.flush(); bos.toByteArray
    }

    override def deserialize(
        bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Long)] = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = mutable.ArrayBuffer.empty[(Double, Long)]
      var i = 0
      while (i < n) {
        buf += ((in.readDouble(), in.readLong()))
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): TopKAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): TopKAgg =
      copy(score = c(0), id = c(1))
  }
}
