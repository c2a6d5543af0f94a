package graft

import graft.functions.TextKernelExpressions.{BpeEncode, HashedShingles, LangId, MinhashSig, SimhashMd5, Winnow}
import graft.functions.VectorFunctions.{DotProduct, NearestCentroid, NormalizeL2, QuantizeI8, RandomProject}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the engine's custom Catalyst expressions, so the
  * `spark.sql(...)` surface (the reference's Hasura-query analog, SURVEY
  * §3.2) can use them like built-ins:
  *
  *   SELECT vec_dot(a.emb, b.emb) FROM ...
  *
  * Two entry points:
  *  - [[GraftExtensions]] for `spark.sql.extensions=graft.GraftExtensions`
  *    (cluster-wide, set at session build time);
  *  - [[GraftFunctions.register]] for an already-running session.
  */
object GraftFunctions {

  type Builder = Seq[Expression] => Expression

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[DotProduct].getName, null, name, usage, "")

  /** Extract a foldable int argument (k/n/bits parameters in SQL calls). */
  private def litInt(e: Expression): Int = {
    require(e.foldable, s"literal int expected, got $e")
    e.eval(null) match {
      case i: Int => i
      case other => other.toString.toInt
    }
  }

  /** Extract a foldable long argument (seeds — the full 64-bit domain;
    * forcing these through litInt would reject any seed past 2^31). */
  private def litLong(e: Expression): Long = {
    require(e.foldable, s"literal long expected, got $e")
    e.eval(null) match {
      case l: Long => l
      case i: Int => i.toLong
      case other => other.toString.toLong
    }
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two array<double>"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("vec_normalize"),
      info("vec_normalize", "vec_normalize(a) - L2-normalize an array<double>"),
      (args: Seq[Expression]) => NormalizeL2(args.head)),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig",
        "minhash_sig(text, k, n) - k-row MinHash over word-n-gram shingles"),
      (args: Seq[Expression]) =>
        MinhashSig(args(0), litInt(args(1)), litInt(args(2)))),
    (FunctionIdentifier("simhash_md5"),
      info("simhash_md5",
        "simhash_md5(text, bits) - md5-derived SimHash of the token set"),
      (args: Seq[Expression]) => SimhashMd5(args(0), litInt(args(1)))),
    (FunctionIdentifier("winnow"),
      info("winnow",
        "winnow(text, k, w) - winnowing fingerprint set (k-grams, window w)"),
      (args: Seq[Expression]) =>
        Winnow(args(0), litInt(args(1)), litInt(args(2)))),
    (FunctionIdentifier("hashed_shingles"),
      info("hashed_shingles",
        "hashed_shingles(text, n) - distinct xxhash64 of word-n-grams"),
      (args: Seq[Expression]) => HashedShingles(args(0), litInt(args(1)))),
    (FunctionIdentifier("lang_id"),
      info("lang_id", "lang_id(text) - stopword-marker language guess"),
      (args: Seq[Expression]) => LangId(args.head)),
    (FunctionIdentifier("vec_quantize_i8"),
      info("vec_quantize_i8",
        "vec_quantize_i8(v) - int8 quantization: struct(scale, mse, q)"),
      (args: Seq[Expression]) => QuantizeI8(args.head)),
    (FunctionIdentifier("vec_nearest_centroid"),
      info("vec_nearest_centroid",
        "vec_nearest_centroid(v, codebook_array_literal) - 0-based argmax-" +
          "dot cell over a literal array<array<double>> codebook"),
      (args: Seq[Expression]) => {
        require(args(1).foldable, "codebook must be a literal")
        val cb = args(1).eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val cells = (0 until cb.numElements()).map { c =>
          cb.getArray(c).toDoubleArray()
        }.toArray
        NearestCentroid(args(0), cells)
      }),
    (FunctionIdentifier("bloom_agg"),
      info("bloom_agg",
        "bloom_agg(hash_long, expected_items) - serialized Bloom filter " +
          "built by a distributed two-phase aggregate"),
      (args: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(args(0), litInt(args(1)).toLong)),
    (FunctionIdentifier("bloom_might_contain"),
      info("bloom_might_contain",
        "bloom_might_contain(filter_binary, hash_long) - membership probe " +
          "(false = definitely absent)"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(args(0), args(1))),
    (FunctionIdentifier("vec_random_project"),
      info("vec_random_project",
        "vec_random_project(v, k, seed) - seeded sparse JL projection " +
          "to k dims (matrix-free, reproducible)"),
      (args: Seq[Expression]) =>
        RandomProject(args(0), litInt(args(1)), litLong(args(2)))),
    (FunctionIdentifier("misra_gries"),
      info("misra_gries",
        "misra_gries(w, capacity) - heavy-hitter summary aggregate: " +
          "array<struct<w,c>> of capacity-bounded lower-bound counts"),
      (args: Seq[Expression]) =>
        graft.functions.FrequencyFunctions
          .MisraGriesAgg(args(0), litInt(args(1)))),
    (FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize",
        "nfc_normalize(s) - Unicode NFC canonical form (matches " +
          "DuckDB/Postgres normalization)"),
      (args: Seq[Expression]) =>
        graft.functions.TextFunctions.NfcNormalize(args.head)),
    (FunctionIdentifier("top_k"),
      info("top_k",
        "top_k(score_double, id_long, k) - exact bounded top-k " +
          "aggregate: array<struct<id,score>> sorted (score desc, id)"),
      (args: Seq[Expression]) =>
        graft.functions.TopKFunctions
          .TopKAgg(args(0), args(1), litInt(args(2)))),
    (FunctionIdentifier("bpe_encode"),
      info("bpe_encode",
        "bpe_encode(text, merges_array_literal) - tokenize with a " +
          "trained BPE merge list (array<array<string>> of [a,b] pairs)"),
      (args: Seq[Expression]) => {
        require(args(1).foldable, "merge list must be a literal")
        val m = args(1).eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val merges = (0 until m.numElements()).map { i =>
          val p = m.getArray(i)
          Array(p.getUTF8String(0).toString, p.getUTF8String(1).toString)
        }.toArray
        BpeEncode(args(0), merges)
      }))

  /** Register on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, fInfo, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(id, fInfo, builder)
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
