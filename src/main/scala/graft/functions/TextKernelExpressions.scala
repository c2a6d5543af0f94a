package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Expression wrappers for [[MinhashKernel]] — codegen-compatible (the
  * generated code calls the compiled kernel once per row; no interpreted
  * HOF dispatch, no fallback eviction of the surrounding operator). */
object TextKernelExpressions {

  private def checkString(e: Expression, name: String): TypeCheckResult =
    if (e.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires a string argument, got ${e.dataType.sql}")

  /** minhash_sig(text, k, n): array<bigint> length k, null if < n tokens. */
  case class MinhashSig(child: Expression, k: Int, n: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkString(child, prettyName)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "minhash_sig"

    override protected def nullSafeEval(t: Any): Any =
      MinhashKernel.signature(t.asInstanceOf[UTF8String], k, n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t => {
        s"""
           |${ev.value} = graft.functions.MinhashKernel.signature($t, $k, $n);
           |${ev.isNull} = (${ev.value} == null);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): MinhashSig =
      copy(child = newChild)
  }

  /** hashed_shingles(text, n): distinct xxhash64 of word-n-grams. */
  case class HashedShingles(child: Expression, n: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkString(child, prettyName)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "hashed_shingles"

    override protected def nullSafeEval(t: Any): Any =
      MinhashKernel.hashedShingles(t.asInstanceOf[UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.functions.MinhashKernel.hashedShingles($t, $n);")

    override protected def withNewChildInternal(newChild: Expression): HashedShingles =
      copy(child = newChild)
  }

  /** lang_id(text): marker-argmax language guess (see TextFunctions
    * .langMarkers); fused single-pass form of TextFunctions.langId. */
  case class LangId(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkString(child, prettyName)
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "lang_id"

    @transient private lazy val markerBytes: Array[Array[Array[Byte]]] =
      TextFunctions.langMarkers
        .map(_._2.map(_.getBytes("UTF-8")).toArray).toArray
    @transient private lazy val langNames: Array[UTF8String] =
      TextFunctions.langMarkers.map(p => UTF8String.fromString(p._1)).toArray

    override protected def nullSafeEval(t: Any): Any =
      MinhashKernel.langId(t.asInstanceOf[UTF8String], markerBytes, langNames)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val mRef = ctx.addReferenceObj("langMarkers", markerBytes, "byte[][][]")
      val lRef = ctx.addReferenceObj("langNames", langNames,
        "org.apache.spark.unsafe.types.UTF8String[]")
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.functions.MinhashKernel.langId($t, $mRef, $lRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): LangId =
      copy(child = newChild)
  }

  def minhashSig(text: Column, k: Int, n: Int): Column =
    Bridge.column(MinhashSig(Bridge.expression(text), k, n))

  def langIdFast(text: Column): Column =
    Bridge.column(LangId(Bridge.expression(text)))

  /** simhash_md5(text, bits): fused md5 simhash (see MinhashKernel). */
  case class SimhashMd5(child: Expression, bits: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkString(child, prettyName)
    override def dataType: DataType = org.apache.spark.sql.types.LongType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "simhash_md5"

    override protected def nullSafeEval(t: Any): Any =
      MinhashKernel.simhashMd5(t.asInstanceOf[UTF8String], bits)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.functions.MinhashKernel.simhashMd5($t, $bits);")

    override protected def withNewChildInternal(newChild: Expression): SimhashMd5 =
      copy(child = newChild)
  }

  def simhashMd5(text: Column, bits: Int): Column =
    Bridge.column(SimhashMd5(Bridge.expression(text), bits))

  /** winnow(text, k, w): MOSS winnowing fingerprints (see MinhashKernel). */
  case class Winnow(child: Expression, k: Int, w: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkString(child, prettyName)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "winnow"

    override protected def nullSafeEval(t: Any): Any =
      MinhashKernel.winnow(t.asInstanceOf[UTF8String], k, w)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.functions.MinhashKernel.winnow($t, $k, $w);")

    override protected def withNewChildInternal(newChild: Expression): Winnow =
      copy(child = newChild)
  }

  def winnow(text: Column, k: Int, w: Int): Column =
    Bridge.column(Winnow(Bridge.expression(text), k, w))

  def hashedShinglesFast(text: Column, n: Int): Column =
    Bridge.column(HashedShingles(Bridge.expression(text), n))

  /** word_shingles(text, n): word-n-gram strings, codegen'd (the HOF
    * `TextFunctions.shingles` is CodegenFallback and evicts its whole
    * operator from codegen — this kernel keeps hot shingle projections
    * fused; byte-exact same output). */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkString(child, prettyName)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "word_shingles"

    override protected def nullSafeEval(t: Any): Any =
      MinhashKernel.stringShingles(t.asInstanceOf[UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.functions.MinhashKernel.stringShingles($t, $n);")

    override protected def withNewChildInternal(newChild: Expression): WordShingles =
      copy(child = newChild)
  }

  def wordShinglesFast(text: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(text), n))
}
