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

  /** distinct_word_shingles(text, n): [[WordShingles]] with per-row
    * dedup fused into the kernel — for consumers that count DOCUMENTS
    * per gram, where within-doc duplicates are aggregate input a
    * downstream distinct would discard anyway. */
  case class DistinctWordShingles(child: Expression, n: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkString(child, prettyName)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "distinct_word_shingles"

    override protected def nullSafeEval(t: Any): Any =
      MinhashKernel.distinctStringShingles(t.asInstanceOf[UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.functions.MinhashKernel.distinctStringShingles($t, $n);")

    override protected def withNewChildInternal(
        newChild: Expression): DistinctWordShingles =
      copy(child = newChild)
  }

  def distinctWordShinglesFast(text: Column, n: Int): Column =
    Bridge.column(DistinctWordShingles(Bridge.expression(text), n))

  /** bpe_encode(text, merges): tokenize with a TRAINED BPE vocabulary —
    * the apply side of [[graft.operators.BpeTrainer]] (q72/BpeTrainer
    * mine and learn the merges; this kernel runs them over the corpus).
    * Each whitespace word is char-split and every merge is applied in
    * LEARNED ORDER with the same leftmost-non-overlapping fuse as the
    * trainer's fold, so a word from the training corpus reproduces its
    * trained segmentation exactly (BpeTrainerSpec pins the equivalence).
    * The merge list rides as a codegen reference object; the scan stays
    * inside whole-stage codegen (one kernel call per row). */
  case class BpeEncode(child: Expression, merges: Array[Array[String]])
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkString(child, prettyName)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "bpe_encode"

    override protected def nullSafeEval(t: Any): Any =
      TextKernelExpressions.bpeEncodeKernel(t.asInstanceOf[UTF8String], merges)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t => {
        val m = ctx.addReferenceObj("bpeMerges", merges, "java.lang.String[][]")
        s"""${ev.value} = graft.functions.TextKernelExpressions
           |  .bpeEncodeKernel($t, $m);""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): BpeEncode =
      copy(child = newChild)
  }

  /** Shared eval/codegen body for [[BpeEncode]]: greedy left-to-right
    * fuse per merge, merges applied in learned order per word. Char
    * segmentation matches the trainer's `split(w, "")` (UTF-16 units —
    * the corpus contract is space-separated ASCII-ish text). */
  def bpeEncodeKernel(text: UTF8String,
      merges: Array[Array[String]]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    text.toString.split(" ", -1).foreach { w =>
      if (w.nonEmpty) {
        var syms = new Array[String](w.length)
        var i = 0
        while (i < w.length) { syms(i) = String.valueOf(w.charAt(i)); i += 1 }
        var mi = 0
        while (mi < merges.length) {
          val a = merges(mi)(0); val b = merges(mi)(1)
          if (syms.length >= 2) {
            val buf = scala.collection.mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < syms.length) {
              if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
                buf += a + b; j += 2
              } else { buf += syms(j); j += 1 }
            }
            if (buf.length != syms.length) syms = buf.toArray
          }
          mi += 1
        }
        syms.foreach(s => out += UTF8String.fromString(s))
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeEncode(Bridge.expression(text),
      merges.map(m => Array(m._1, m._2)).toArray))
}
