package graft.queries

import graft.SparkSpec
import graft.functions.VectorFunctions

/** q86/q87 — the oracle-checked PQ twins: the pinned codebook is a pure
  * function (the DuckDB VALUES table and the Spark kernels must receive
  * identical values), the ADC probe agrees with a hand-computed
  * encode+score on the fixture, and the recall twin is a sane fraction. */
class PqTwinSpec extends SparkSpec {

  test("pinned codebook is deterministic and in the residual range") {
    val a = SimilarityQueries.pinnedPqCodebook()
    val b = SimilarityQueries.pinnedPqCodebook()
    assert(a.toSeq === b.toSeq)
    assert(a.length === 8 * 4 * 8)
    assert(a.forall(v => v >= -0.25 && v < 0.25))
  }

  test("q86 ADC score matches a driver-side encode+lookup replay") {
    val dir = sf("sf0.001")
    val m = 8; val ksub = 4; val dsub = 8
    val cb = SimilarityQueries.pinnedPqCodebook(m, ksub, dsub)
    val rows = SimilarityQueries.q86PqAdc(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows.nonEmpty)

    // independent replay: normalize, assign, encode, ADC — plain Scala
    import org.apache.spark.sql.functions._
    val all = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    def nrm(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val nv = all.map { case (id, v) => id -> nrm(v) }.toMap
    val cents = (0L until 16L).map(nv)
    val qn = nv(1L)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cellOf(v: Array[Double]): Int =
      cents.zipWithIndex.maxBy { case (c, i) => (dot(v, c), -i) }._2
    val lut = Array.tabulate(m * ksub) { i =>
      val j = i / ksub; val c = i % ksub
      (0 until dsub).map(d =>
        qn(j * dsub + d) * cb((j * ksub + c) * dsub + d)).sum
    }
    rows.foreach { case (id, adc) =>
      val v = nv(id)
      val cell = cellOf(v)
      val cent = cents(cell)
      var acc = dot(cent, qn)
      for (j <- 0 until m) {
        val code = (0 until ksub).minBy { c =>
          ((0 until dsub).map { d =>
            val r = v(j * dsub + d) - cent(j * dsub + d)
            val diff = r - cb((j * ksub + c) * dsub + d)
            diff * diff
          }.sum, c)
        }
        acc += lut(j * ksub + code)
      }
      assert(math.abs(adc - acc) < 1e-3, s"vec $id: $adc vs $acc")
    }
  }

  test("buildPq rejects ksub > 256: byte codes would silently wrap") {
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.load(spark, sf("sf0.001"), "embeddings")
      .filter(col("vec_id") < 32)
    val p = java.nio.file.Files.createTempDirectory("pq_ksub").toString
    val e = intercept[IllegalArgumentException] {
      graft.similarity.IvfIndex.buildPq(emb, p, nCells = 4, ksub = 512)
    }
    assert(e.getMessage.contains("256"))
  }

  test("pqEncodeKernel fails on a dimension mismatch instead of " +
    "zero-padding the residual") {
    val m = 8; val ksub = 4; val dsub = 8
    val cb = SimilarityQueries.pinnedPqCodebook(m, ksub, dsub)
    val short = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array.fill(40)(0.1)) // codebook expects 64
    val cent = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array.fill(64)(0.0))
    val e = intercept[IllegalArgumentException] {
      VectorFunctions.pqEncodeKernel(short, cent, cb, m, ksub, dsub)
    }
    assert(e.getMessage.contains("zero-pad"))
    // the matching-dims path still encodes
    val full = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array.tabulate(64)(i => math.sin(i + 1.0)))
    assert(VectorFunctions.pqEncodeKernel(full, cent, cb, m, ksub, dsub)
      .length === m)
  }

  test("q87 recall is a fraction of fifths in [0, 1]") {
    val r = SimilarityQueries.q87PqAdcRecall(spark, sf("sf0.001"))
      .head().getDouble(0)
    assert(r >= 0.0 && r <= 1.0)
    assert(math.abs((r * 5).round / 5.0 - r) < 1e-9)
  }
}
