package graft.functions

import graft.SparkSpec
import graft.functions.TextFunctions._
import graft.functions.TextKernelExpressions._
import org.apache.spark.sql.functions._

/** The fused kernel must be bit-for-bit equivalent to the declarative
  * expression stack it replaces — including the Spark xxhash64 seed chain
  * and the split/join byte-range identity (multi-space, empty-token and
  * short-doc edges). */
class MinhashKernelSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c",
    "a b",                      // fewer than 3 tokens → null / empty
    "",
    "one",
    "double  space between",    // empty token from consecutive spaces
    " leading and trailing ",
    "dup dup dup dup dup",      // identical shingles → distinct collapses
    "unicode ñ tokens é here 中文 ok")

  test("kernel signature == declarative fastMinhashSignature") {
    val k = 8
    val df = texts.toDF("t").select(
      minhashSig(col("t"), k, 3).as("fast"),
      when(size(tokens(col("t"))) < 3, lit(null))
        .otherwise(fastMinhashSignature(shingles(col("t"), 3), k))
        .as("slow"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0))
        assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"sig mismatch: $r")
    }
  }

  test("kernel hashed shingles == declarative hashedShingles") {
    val df = texts.toDF("t").select(
      hashedShinglesFast(col("t"), 3).as("fast"),
      hashedShingles(col("t"), 3).as("slow"))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"mismatch: $r")
    }
  }

  test("kernel word shingles == declarative shingles (strings)") {
    Seq(2, 3, 5).foreach { n =>
      val df = texts.toDF("t").select(
        wordShinglesFast(col("t"), n).as("fast"),
        shingles(col("t"), n).as("slow"))
      df.collect().foreach { r =>
        assert(r.getSeq[String](0) === r.getSeq[String](1), s"n=$n: $r")
      }
    }
  }

  test("kernel distinct word shingles == array_distinct of the " +
      "full shingle stream") {
    Seq(2, 3, 5).foreach { n =>
      val df = texts.toDF("t").select(
        distinctWordShinglesFast(col("t"), n).as("fast"),
        array_distinct(shingles(col("t"), n)).as("slow"))
      df.collect().foreach { r =>
        assert(r.getSeq[String](0) === r.getSeq[String](1), s"n=$n: $r")
      }
    }
  }

  test("kernel langId == declarative langId on real docs + edges") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
      .select(col("text"))
      .unionAll(texts.toDF("text"))
    val df = docs.select(
      langIdFast(col("text")).as("fast"),
      langId(col("text")).as("slow"))
    df.collect().foreach { r =>
      assert(r.getString(0) === r.getString(1), s"mismatch: $r")
    }
  }

  test("kernel simhash == declarative simhash (16 and 32 bit)") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
      .select(col("text")).limit(100)
      .unionAll(texts.toDF("text"))
    Seq(16, 32).foreach { bits =>
      val df = docs.select(
        simhashMd5(col("text"), bits).as("fast"),
        simhashBits(col("text"), bits).as("slow"))
      df.collect().foreach { r =>
        assert(r.getLong(0) === r.getLong(1), s"bits=$bits mismatch: $r")
      }
    }
  }

  test("winnowing: substring guarantee, edit locality, short-doc empty") {
    import graft.functions.TextKernelExpressions.winnow
    val doc = "the quick brown fox jumps over the lazy dog again and again " * 3
    val shifted = "PREFIX PAD " + doc
    val edited = doc.replace("lazy", "hazy")
    val df = Seq(doc, shifted, edited, "tiny").toDF("t")
      .select(winnow(col("t"), 8, 16).as("f"))
    val Seq(a, b, c, tiny) = df.collect().toSeq.map(_.getSeq[Long](0).toSet)
    // substring guarantee: the original doc is inside `shifted`, so every
    // window of it still contributes — overlap must be near-total
    assert(a.intersect(b).size.toDouble / a.size > 0.9,
      s"shift overlap ${a.intersect(b).size}/${a.size}")
    // a local edit only perturbs nearby windows
    assert(a.intersect(c).size.toDouble / a.size > 0.5,
      s"edit overlap ${a.intersect(c).size}/${a.size}")
    assert(tiny.isEmpty) // shorter than k+w-1 bytes
  }

  test("kernel expressions run inside whole-stage codegen") {
    // parquet-backed (a local Seq would be constant-folded to a
    // LocalTableScan with the project evaluated at plan time)
    val df = graft.Tables.load(spark, sf("sf0.001"), "documents")
      .select(minhashSig(col("text"), 4, 3).as("sig"))
      .filter(col("sig").isNotNull)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l =>
      l.contains("*(") && l.contains("minhash_sig")),
      s"minhash_sig not inside a codegen region:\n$p")
  }
}
