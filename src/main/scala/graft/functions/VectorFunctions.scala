package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Embedding/vector primitives for the similarity-search surface
  * (north-star ANN; reference analog is the content-similarity identity
  * of x/imgstorage/storage.go:37-62, generalized to embeddings).
  *
  * The hot kernel — the pairwise dot product — is a native Catalyst
  * [[Expression]] with `doGenCode`, not a UDF and not a higher-order
  * `aggregate(zip_with(...))` chain: inside whole-stage codegen it compiles
  * to a tight primitive loop over the columnar array data with no
  * per-element boxing and no lambda dispatch. On the brute-force pair scan
  * this is ~10× the HOF formulation, which is the difference between a
  * usable and unusable exact-similarity baseline at scale.
  */
object VectorFunctions {

  /** dot(a, b) over array<double> — codegen'd tight loop. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      })
      if (ok) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "vec_dot"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
           |int $n = Math.min($x.numElements(), $y.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $x.getDouble($i) * $y.getDouble($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** L2-normalize — also a native codegen Expression rather than
    * `transform(a, x => x / norm)`: higher-order functions are
    * CodegenFallback, and ONE fallback expression evicts its whole operator
    * (and everything fused with it) from whole-stage codegen. Zero vectors
    * pass through unchanged. */
  case class NormalizeL2(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got ${other.sql}")
    }
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "vec_normalize"

    override protected def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
      val inv = if (s == 0.0) 1.0 else 1.0 / math.sqrt(s)
      val out = new Array[Double](n)
      i = 0
      while (i < n) { out(i) = x.getDouble(i) * inv; i += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val inv = ctx.freshName("inv")
        val out = ctx.freshName("out")
        s"""
           |int $n = $x.numElements();
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double v = $x.getDouble($i);
           |  $s += v * v;
           |}
           |double $inv = $s == 0.0 ? 1.0 : 1.0 / Math.sqrt($s);
           |double[] $out = new double[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = $x.getDouble($i) * $inv;
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions
           |  .UnsafeArrayData.fromPrimitiveArray($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): NormalizeL2 =
      copy(child = newChild)
  }

  /** Map-side coarse-quantizer assignment: the 0-based index of the codebook
    * row with the highest dot product against the input vector (ties → the
    * lowest index, so assignment is deterministic and oracle-replayable).
    *
    * The codebook rides along as a plain `double[][]` reference object — it
    * is driver-small by construction (nCells rows), so the argmax is a pure
    * projection: no crossJoin row inflation, no groupBy shuffle of the
    * corpus. At 100 TB this is the difference between an IVF build that
    * re-shuffles the full dataset ×nCells and one that streams it once. */
  case class NearestCentroid(child: Expression, cells: Array[Array[Double]])
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) if cells.nonEmpty =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double> and a non-empty codebook, " +
          s"got ${other.sql}")
    }
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "vec_nearest_centroid"

    override protected def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var best = 0
      var bestS = Double.NegativeInfinity
      var c = 0
      while (c < cells.length) {
        val cent = cells(c)
        val n = math.min(x.numElements(), cent.length)
        var s = 0.0
        var i = 0
        while (i < n) { s += x.getDouble(i) * cent(i); i += 1 }
        if (s > bestS) { bestS = s; best = c }
        c += 1
      }
      best
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val cb = ctx.addReferenceObj("cells", cells, "double[][]")
        val c = ctx.freshName("c")
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val best = ctx.freshName("best")
        val bestS = ctx.freshName("bestS")
        s"""
           |int $best = 0;
           |double $bestS = Double.NEGATIVE_INFINITY;
           |for (int $c = 0; $c < $cb.length; $c++) {
           |  int $n = Math.min($x.numElements(), $cb[$c].length);
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $s += $x.getDouble($i) * $cb[$c][$i];
           |  }
           |  if ($s > $bestS) { $bestS = $s; $best = $c; }
           |}
           |${ev.value} = $best;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
      copy(child = newChild)
  }

  /** Fused int8 quantization kernel (the production form of q53's
    * declarative/oracle twin): one pass computes the max-abs scale, the
    * clamped round-half-up int8 codes and the reconstruction MSE —
    * struct(scale double, mse double, q array<tinyint>). Embeddings stored
    * int8 are 8× smaller than float64 at 100 TB; the kernel is a codegen
    * Expression so the quantizing scan stays inside whole-stage codegen. */
  def quantizeKernel(v: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val n = v.numElements()
    var amax = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(v.getDouble(i)); if (a > amax) amax = a; i += 1
    }
    val scale = 127.0 / math.max(amax, 1e-12)
    val q = new Array[Byte](n)
    var sse = 0.0
    i = 0
    while (i < n) {
      val x = v.getDouble(i)
      val c = math.max(-127.0, math.min(127.0, math.floor(x * scale + 0.5)))
      q(i) = c.toByte
      val e = x - c / scale
      sse += e * e
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, if (n == 0) 0.0 else sse / n,
        UnsafeArrayData.fromPrimitiveArray(q)))
  }

  case class QuantizeI8(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got ${other.sql}")
    }
    override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("scale", DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("mse", DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("q",
        ArrayType(org.apache.spark.sql.types.ByteType, containsNull = false),
        nullable = false)))
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "vec_quantize_i8"
    override protected def nullSafeEval(a: Any): Any =
      quantizeKernel(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"""${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
           |  graft.functions.VectorFunctions.quantizeKernel($v);""".stripMargin)
    override protected def withNewChildInternal(newChild: Expression): QuantizeI8 =
      copy(child = newChild)
  }

  def quantizeI8(v: Column): Column =
    Bridge.column(QuantizeI8(Bridge.expression(v)))

  /** Score int8-quantized codes directly against a float query vector:
    * (Σ codes_i · query_i) / scale ≈ dot(original, query) — the IVF-SQ8
    * probe kernel. The query rides as a double[] reference object; codes
    * are never dequantized into a float array (one fused loop, codegen). */
  case class DotDequantI8(codes: Expression, scale: Expression,
      query: Array[Double]) extends BinaryExpression {
    override def left: Expression = codes
    override def right: Expression = scale
    override def checkInputDataTypes(): TypeCheckResult =
      (codes.dataType, scale.dataType) match {
        case (ArrayType(org.apache.spark.sql.types.ByteType, _), DoubleType) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<tinyint>, double), got ${l.sql}, ${r.sql}")
      }
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "vec_dot_dequant_i8"

    override protected def nullSafeEval(c: Any, s: Any): Any = {
      val q = c.asInstanceOf[ArrayData]
      val n = math.min(q.numElements(), query.length)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += q.getByte(i) * query(i); i += 1 }
      acc / s.asInstanceOf[Double]
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (c, s) => {
        val qv = ctx.addReferenceObj("query", query, "double[]")
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = Math.min($c.numElements(), $qv.length);
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += $c.getByte($i) * $qv[$i];
           |}
           |${ev.value} = $acc / $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotDequantI8 =
      copy(codes = newLeft, scale = newRight)
  }

  def dotDequantI8(codes: Column, scale: Column, query: Array[Double]): Column =
    Bridge.column(DotDequantI8(Bridge.expression(codes),
      Bridge.expression(scale), query))

  /** Product-quantization encoder (the FAISS IVF-PQ storage kernel): the
    * RESIDUAL vec−cent is split into m subvectors of dsub dims; each is
    * replaced by the index of its nearest subspace centroid (L2, ties →
    * lowest code). Output is m bytes — at 100 TB the difference between
    * storing embeddings and not being able to. The residual is never
    * materialized: the kernel folds the subtraction into the distance
    * loop. `codebook` is flat [m][ksub][dsub] and rides as a codegen
    * reference object. */
  case class PqEncode(vec: Expression, cent: Expression,
      codebook: Array[Double], m: Int, ksub: Int) extends BinaryExpression {
    override def left: Expression = vec
    override def right: Expression = cent
    private val dsub = codebook.length / (m * ksub)
    override def checkInputDataTypes(): TypeCheckResult =
      (vec.dataType, cent.dataType) match {
        // ksub > 256 would silently wrap in the byte codes (and overrun
        // PqAdcDot's `& 0xFF` LUT indexing) — reject at analysis time
        case (ArrayType(DoubleType, _), ArrayType(DoubleType, _))
          if codebook.length == m * ksub * dsub && codebook.nonEmpty &&
            ksub >= 1 && ksub <= 256 =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<double>, a [m][ksub][dsub] " +
            s"codebook and 1 <= ksub <= 256 (byte codes), " +
            s"got ${l.sql}, ${r.sql}, len=${codebook.length}, ksub=$ksub")
      }
    override def dataType: DataType = org.apache.spark.sql.types.BinaryType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "vec_pq_encode"

    override protected def nullSafeEval(v: Any, c: Any): Any =
      pqEncodeKernel(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData],
        codebook, m, ksub, dsub)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (v, c) => {
        val cb = ctx.addReferenceObj("pqcb", codebook, "double[]")
        s"""${ev.value} = graft.functions.VectorFunctions.pqEncodeKernel(
           |  $v, $c, $cb, $m, $ksub, $dsub);""".stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): PqEncode =
      copy(vec = newLeft, cent = newRight)
  }

  /** Shared eval/codegen body for [[PqEncode]] (same pattern as
    * [[quantizeKernel]]: one JIT-compiled method, no per-row closure).
    * A vector/centroid shorter than the codebook's m·dsub dims FAILS
    * loudly — zero-padding the residual would silently encode (and
    * later score) garbage for the missing subspaces, corrupting every
    * probe that touches the row. */
  def pqEncodeKernel(v: ArrayData, c: ArrayData, cb: Array[Double],
      m: Int, ksub: Int, dsub: Int): Array[Byte] = {
    val out = new Array[Byte](m)
    val dim = math.min(v.numElements(), c.numElements())
    if (dim < m * dsub)
      throw new IllegalArgumentException(
        s"vec_pq_encode: input has $dim dims but the codebook expects " +
          s"${m * dsub} (m=$m × dsub=$dsub) — refusing to zero-pad")
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var code = 0
      while (code < ksub) {
        var d = 0
        var acc = 0.0
        while (d < dsub) {
          val i = j * dsub + d
          val r = if (i < dim) v.getDouble(i) - c.getDouble(i) else 0.0
          val diff = r - cb((j * ksub + code) * dsub + d)
          acc += diff * diff
          d += 1
        }
        if (acc < bestD) { bestD = acc; best = code }
        code += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  /** Asymmetric-distance scoring for PQ codes: cellDot + Σ_j lut[j][code_j]
    * where lut[j][c] = dot(query_subspace_j, codebook[j][c]) is
    * driver-precomputed per query (m·ksub doubles) — the probe never
    * reconstructs a vector; scoring is m table lookups per row. */
  case class PqAdcDot(codes: Expression, cellDot: Expression,
      lut: Array[Double], ksub: Int) extends BinaryExpression {
    override def left: Expression = codes
    override def right: Expression = cellDot
    override def checkInputDataTypes(): TypeCheckResult =
      (codes.dataType, cellDot.dataType) match {
        case (org.apache.spark.sql.types.BinaryType, DoubleType)
          if lut.nonEmpty && lut.length % ksub == 0 =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (binary, double) and a [m][ksub] LUT, " +
            s"got ${l.sql}, ${r.sql}")
      }
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "vec_pq_adc_dot"

    override protected def nullSafeEval(c: Any, s: Any): Any = {
      val codes = c.asInstanceOf[Array[Byte]]
      var acc = s.asInstanceOf[Double]
      val m = math.min(codes.length, lut.length / ksub)
      var j = 0
      while (j < m) {
        acc += lut(j * ksub + (codes(j) & 0xFF))
        j += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (c, s) => {
        val lt = ctx.addReferenceObj("pqlut", lut, "double[]")
        val j = ctx.freshName("j")
        val m = ctx.freshName("m")
        val acc = ctx.freshName("acc")
        s"""
           |double $acc = $s;
           |int $m = Math.min($c.length, $lt.length / $ksub);
           |for (int $j = 0; $j < $m; $j++) {
           |  $acc += $lt[$j * $ksub + ($c[$j] & 0xFF)];
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): PqAdcDot =
      copy(codes = newLeft, cellDot = newRight)
  }

  def pqEncode(vec: Column, cent: Column, codebook: Array[Double],
      m: Int, ksub: Int): Column =
    Bridge.column(PqEncode(Bridge.expression(vec), Bridge.expression(cent),
      codebook, m, ksub))

  /** Seeded sparse random projection (Achlioptas ±1 signs / √k — the
    * Johnson-Lindenstrauss reduction): maps array<double> of any input
    * dim to k dims, preserving pairwise inner products in expectation.
    * The projection matrix is never materialized — each ±1 sign derives
    * from a splitmix64 of (seed, cell index) inside the loop, so the op
    * is a stateless map-side projection that is REPRODUCIBLE across
    * engines, executors and runs (a training pipeline's dim-reduction
    * must be, or re-ingestion shifts every downstream LSH bucket).
    * Typical use: 64→16 dims before LSH banding or brute-force rescans
    * — 4× less shuffle width at a bounded similarity distortion. */
  case class RandomProject(child: Expression, k: Int, seed: Long)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double> and k > 0, got ${other.sql}")
    }
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "vec_random_project"

    override protected def nullSafeEval(a: Any): Any =
      randomProjectKernel(a.asInstanceOf[ArrayData], k, seed)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"""${ev.value} = graft.functions.VectorFunctions
           |  .randomProjectKernel($v, $k, ${seed}L);""".stripMargin)

    override protected def withNewChildInternal(newChild: Expression): RandomProject =
      copy(child = newChild)
  }

  /** splitmix64 — the public-domain 64-bit mixer (deterministic sign
    * source for [[RandomProject]]; no RNG state, no seed array). */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** splitmix64 mapped to [0,1) — the deterministic value source for
    * fixture-pinned codebooks (q86's PQ VALUES table). */
  def mix01(z: Long): Double = (mix64(z) >>> 11) * (1.0 / (1L << 53))

  /** The ±1 sign matrix [[RandomProject]] derives cell-by-cell — exposed
    * so the DuckDB oracle can carry the IDENTICAL matrix as a VALUES
    * table (q44's hyperplane pattern): signs(j)(i) multiplies input dim i
    * into output dim j. One definition; the kernel and the oracle cannot
    * drift. */
  def projectionSigns(n: Int, k: Int, seed: Long): IndexedSeq[IndexedSeq[Double]] =
    (0 until k).map { j =>
      (0 until n).map { i =>
        if ((mix64(seed ^ (j.toLong * n + i)) & 1L) == 0L) 1.0 else -1.0
      }
    }

  /** Shared eval/codegen body for [[RandomProject]]. */
  def randomProjectKernel(v: ArrayData, k: Int, seed: Long): ArrayData = {
    val n = v.numElements()
    val out = new Array[Double](k)
    val inv = 1.0 / math.sqrt(k.toDouble)
    var j = 0
    while (j < k) {
      var s = 0.0
      var i = 0
      while (i < n) {
        val sign = if ((mix64(seed ^ (j.toLong * n + i)) & 1L) == 0L) 1.0 else -1.0
        s += v.getDouble(i) * sign
        i += 1
      }
      out(j) = s * inv
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def randomProject(vec: Column, k: Int, seed: Long = 42L): Column =
    Bridge.column(RandomProject(Bridge.expression(vec), k, seed))

  def pqAdcDot(codes: Column, cellDot: Column, lut: Array[Double],
      ksub: Int): Column =
    Bridge.column(PqAdcDot(Bridge.expression(codes),
      Bridge.expression(cellDot), lut, ksub))

  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** 0-based ordinal of the nearest codebook row (highest dot product). */
  def nearestCell(vec: Column, cells: Seq[Seq[Double]]): Column =
    Bridge.column(NearestCentroid(Bridge.expression(vec),
      cells.map(_.toArray).toArray))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** L2-normalize once so downstream pair scoring is a single dot product
    * instead of dot + two norms per pair (the norms are loop-invariant —
    * hoist them out of the O(n²) pair loop). */
  def normalized(a: Column): Column =
    Bridge.column(NormalizeL2(Bridge.expression(a)))
}
