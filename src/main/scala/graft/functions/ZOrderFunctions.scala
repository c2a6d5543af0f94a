package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

/** Z-order (Morton) clustering primitives — the multi-dimensional data-
  * skipping layout for write-once snapshot/fact tables at 100 TB.
  *
  * Bucketing (SnapshotStore.writeBucketed) co-locates JOIN keys; Z-ordering
  * co-locates RANGE predicates on TWO dimensions at once: rows are written
  * in Morton-curve order of their rank-bucketed (d1, d2), so every parquet
  * file covers a small rectangle of the 2-D key space and min/max row-group
  * statistics prune scans with predicates on EITHER OR BOTH dimensions —
  * a single-column sort gives narrow extents on that column only.
  *
  * Both kernels are codegen Expressions (same tier as the vector/minhash
  * kernels): a bit-interleave and a binary search per row, no shuffle of
  * their own.
  */
object ZOrderFunctions {

  /** Bit-spread x (low 32 bits) so its bits occupy even positions. */
  def spread(xIn: Long): Long = {
    var x = xIn & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code of two non-negative ints/longs (low 32 bits each). */
  def mortonCode(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  /** Bucket index of v in sorted quantile boundaries (0..bounds.length). */
  def bucketOf(v: Double, bounds: Array[Double]): Int = {
    val i = java.util.Arrays.binarySearch(bounds, v)
    if (i >= 0) i + 1 else -(i + 1)
  }

  /** morton(a, b) over two long columns — codegen bit-interleave. */
  case class Morton(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (Seq(left, right).forall(_.dataType == LongType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two bigint arguments")
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "zorder_morton"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      mortonCode(a.asInstanceOf[Long], b.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.ZOrderFunctions.mortonCode($a, $b);")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Morton =
      copy(left = newLeft, right = newRight)
  }

  /** Rank-bucketize a double against driver-computed quantile boundaries
    * (approxQuantile output — sketch-based, scale-safe to compute). */
  case class Bucketize(child: Expression, bounds: Array[Double])
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case DoubleType if bounds.nonEmpty => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires double and non-empty boundaries, got ${other.sql}")
    }
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "zorder_bucket"
    override protected def nullSafeEval(v: Any): Any =
      bucketOf(v.asInstanceOf[Double], bounds)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val b = ctx.addReferenceObj("bounds", bounds, "double[]")
        s"${ev.value} = graft.functions.ZOrderFunctions.bucketOf($v, $b);"
      })
    override protected def withNewChildInternal(newChild: Expression): Bucketize =
      copy(child = newChild)
  }

  def morton(a: Column, b: Column): Column =
    Bridge.column(Morton(Bridge.expression(a), Bridge.expression(b)))

  def bucketize(c: Column, bounds: Array[Double]): Column =
    Bridge.column(Bucketize(Bridge.expression(c), bounds))
}
