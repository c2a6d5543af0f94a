package graft

import org.apache.spark.sql.SparkSessionExtensions

class GraftFunctionsSpec extends SparkSpec {

  test("registered SQL functions work end-to-end through spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1D,2D,3D), array(4D,5D,6D)) AS d, " +
        "vec_normalize(array(3D,4D)) AS n")
      .collect().head
    assert(r.getDouble(0) === 32.0)
    val n = r.getSeq[Double](1)
    assert(n.zip(Seq(0.6, 0.8)).forall { case (a, b) =>
      math.abs(a - b) < 1e-12 })
  }

  test("nfc_normalize and top_k are SQL-callable") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT nfc_normalize('Cafe\\u0301') AS n").collect().head
    assert(r.getString(0) === "Caf\u00e9")
    val tk = spark.sql(
      """SELECT top_k(s, i, 2) AS t FROM VALUES
        |  (1.0D, 10L), (3.0D, 30L), (2.0D, 20L), (3.0D, 7L) AS v(s, i)"""
        .stripMargin).collect().head
      .getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getLong(0), x.getDouble(1)))
    // (score desc, id asc): the tied 3.0s pick the smaller id first
    assert(tk === Seq((7L, 3.0), (30L, 3.0)))
  }

  test("registration is idempotent") {
    GraftFunctions.register(spark)
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT vec_dot(array(1D), array(2D)) AS d")
      .collect().head.getDouble(0) === 2.0)
  }

  test("text kernels and the argmax cell are SQL-callable") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  minhash_sig('a b c d e', 4, 3) AS sig,
        |  simhash_md5('hello world', 16) AS sh,
        |  winnow('abcdefghij abcdefghij abcdefghij', 4, 4) AS fps,
        |  hashed_shingles('a b c d', 2) AS hs,
        |  lang_id('the of and to hello') AS lang,
        |  vec_nearest_centroid(array(0D, 1D),
        |    array(array(1D, 0D), array(0D, 1D))) AS cell""".stripMargin)
      .collect().head
    assert(r.getSeq[Long](0).length === 4)
    assert(r.getLong(1) >= 0L && r.getLong(1) < (1L << 16))
    assert(r.getSeq[Long](2).nonEmpty)
    assert(r.getSeq[Long](3).length === 3)
    assert(r.getString(4) === "en")
    assert(r.getInt(5) === 1)
    // the SQL route agrees with the Column-API route
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val viaCol = Seq("hello world").toDF("t")
      .select(graft.functions.TextKernelExpressions
        .simhashMd5(col("t"), 16)).head().getLong(0)
    assert(r.getLong(1) === viaCol)
  }

  test("the extensions class injects every function") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builders are wired
    assert(GraftFunctions.all.map(_._1.funcName).toSet
      === Set("vec_dot", "vec_normalize", "minhash_sig", "simhash_md5",
        "winnow", "hashed_shingles", "lang_id", "vec_nearest_centroid",
        "vec_quantize_i8", "bloom_agg", "bloom_might_contain",
        "misra_gries", "bpe_encode", "vec_random_project",
        "nfc_normalize", "top_k"))
  }

  test("misra_gries and bpe_encode are SQL-callable") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq("a b a c a b", "a b").toDF("t").createOrReplaceTempView("mg_docs")
    // aggregate: exact at capacity >= vocab
    val mg = spark.sql(
      """SELECT e.w, e.c FROM (
        |  SELECT explode(misra_gries(w, 8)) AS e FROM (
        |    SELECT explode(split(t, ' ')) AS w FROM mg_docs))
        |ORDER BY e.c DESC, e.w""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(mg === Seq(("a", 4L), ("b", 3L), ("c", 1L)))
    // scalar: literal merge list applied in order
    val toks = spark.sql(
      "SELECT bpe_encode('aab ab', array(array('a','b'))) AS t")
      .head().getSeq[String](0)
    assert(toks === Seq("a", "ab", "ab"))
  }
}
