package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class FunctionsSpec extends SparkSpec {
  import graft.functions.{BinaryFunctions => B, CoinFunctions => C,
    JsonFunctions => J, VectorFunctions => V}

  test("parse_coin round-trips reference coin strings") {
    import spark.implicits._
    val df = Seq("100token", "9999tugrik", "", "notacoin", "42a1")
      .toDF("s")
      .select(C.coinAmount(col("s")).as("a"), C.coinDenom(col("s")).as("d"))
    val got = df.collect().map(r => (Option(r.get(0)).map(_.toString),
      Option(r.getString(1))))
    assert(got(0) === (Some("100"), Some("token")))
    assert(got(1) === (Some("9999"), Some("tugrik")))
    assert(got(2) === (None, None)) // sdk.Coins{}.String() == ""
    assert(got(3) === (None, None))
    assert(got(4) === (Some("42"), Some("a1")))
  }

  test("parse_coin/format_coin round-trip property") {
    import spark.implicits._
    // scalacheck as a generator (no scalatestplus bridge in this cache):
    // 50 seeded samples of non-negative longs, one Spark round-trip.
    val gen = Gen.chooseNum(0L, Long.MaxValue)
    val samples = (1 to 50).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))).distinct
    val df = samples.map(n => s"${n}denom").toDF("s")
      .select(col("s"), C.formatCoin(C.coinAmount(col("s")),
        C.coinDenom(col("s"))).as("rt"))
    df.collect().foreach(r => assert(r.getString(1) === r.getString(0)))
  }

  test("gzip/gunzip round-trip") {
    import spark.implicits._
    val payloads = Seq("hello world", "", "a" * 10000)
    val df = payloads.toDF("s")
      .select(B.gunzip(B.gzip(col("s").cast("binary"))).cast("string").as("rt"))
    assert(df.collect().map(_.getString(0)).toSeq === payloads)
  }

  test("img format sniff matches the reference's 7-format table") {
    val png = B.syntheticPng(1, 4, 4)
    assert(B.sniffFormat(png) === "png")
    assert(B.sniffFormat("  <svg xmlns='x'/>".getBytes) === "svg")
    assert(B.sniffFormat(
      "<?xml version='1.0'?><svg></svg>".getBytes) === "svg")
    assert(B.sniffFormat(Array[Byte](0xff.toByte, 0xd8.toByte, 0, 0))
      === "jpeg")
    assert(B.sniffFormat("GIF89a".getBytes) === "gif")
    assert(B.sniffFormat("BM1234".getBytes) === "bmp")
    assert(B.sniffFormat("RIFF0000WEBPVP8 ".getBytes) === "webp")
    assert(B.sniffFormat(Array[Byte]('I', 'I', 42, 0)) === "tiff")
    assert(B.sniffFormat("garbage".getBytes) === null)
  }

  test("img decode/resize is real for JDK rasters") {
    val png = B.syntheticPng(7, 40, 30)
    val out = B.resizeImage(png, 200, 150)
    assert(out.isDefined)
    assert(B.sniffFormat(out.get) === "png")
    val meta = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.get))
    assert(meta.getWidth === 200 && meta.getHeight === 150)
    // webp bytes: sniffed but decode is stubbed (no codec shipped)
    assert(B.resizeImage("RIFF0000WEBPVP8 ".getBytes, 10, 10) === None)
  }

  test("erc721 validation: valid, missing field, wrong type, bad json") {
    import spark.implicits._
    val df = Seq(
      """{"name":"a","description":"b","image":"http://x/i.png"}""",
      """{"name":"a","description":"b"}""",
      """{"name":1,"description":"b","image":"u"}""",
      """not json""")
      .toDF("j").select(J.erc721Validate(col("j")).as("v"))
    val rows = df.select("v.valid", "v.errors").collect()
    assert(rows(0).getBoolean(0) === true)
    assert(rows(1).getBoolean(0) === false)
    assert(rows(1).getSeq[String](1) === Seq("missing required field: image"))
    assert(rows(2).getBoolean(0) === false)
    assert(rows(2).getSeq[String](1)
      === Seq("field is not a string: name"))
    assert(rows(3).getBoolean(0) === false)
    assert(rows(3).getSeq[String](1) === Seq("invalid json"))
  }

  test("vec_dot matches a hand computation and handles length mismatch") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(1.0, 1.0), Seq(2.0)))
      .toDF("a", "b")
      .select(V.dot(col("a"), col("b")).as("d"))
    assert(df.collect().map(_.getDouble(0)).toSeq === Seq(32.0, 2.0))
  }

  test("vec_dot codegen and interpreted paths agree") {
    import spark.implicits._
    val vecs = (1 to 50).map(i =>
      (Seq.tabulate(16)(j => (i * 31 + j * 7 % 11).toDouble),
        Seq.tabulate(16)(j => (i * 17 + j * 3 % 13).toDouble)))
    val df = vecs.toDF("a", "b")
    val viaExpr = df.select(V.dot(col("a"), col("b")).as("d"))
      .collect().map(_.getDouble(0))
    val viaHof = df.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x) AS d")
      .collect().map(_.getDouble(0))
    assert(viaExpr.toSeq === viaHof.toSeq)
  }

  test("normalized vectors have unit norm") {
    import spark.implicits._
    val df = Seq(Seq(3.0, 4.0), Seq(1.0, 0.0, 0.0)).toDF("a")
      .select(V.norm(V.normalized(col("a"))).as("n"))
    df.collect().foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("minhash estimated jaccard is within [0,1] and exact-dup = 1") {
    import spark.implicits._
    import graft.functions.TextFunctions._
    val df = Seq(("x", "a b c d e f g"), ("y", "a b c d e f g"),
      ("z", "h i j k l m n")).toDF("id", "t")
      .select(col("id"), minhashSignature(shingles(col("t"), 3), 8).as("sig"))
    val sigs = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(sigs("x") === sigs("y"))
    assert(sigs("x") !== sigs("z"))
  }

  test("fingerprint is invariant to case/punctuation/whitespace") {
    import spark.implicits._
    import graft.functions.TextFunctions._
    val df = Seq("Hello,  World!", "hello world", "HELLO   WORLD.")
      .toDF("t").select(fingerprint(col("t")).as("f"))
    assert(df.collect().map(_.getString(0)).distinct.length === 1)
  }

  test("simhash hamming distance of identical docs is 0") {
    import spark.implicits._
    import graft.functions.TextFunctions._
    val df = Seq(("same text here", "same text here"),
      ("same text here", "totally different words"))
      .toDF("a", "b")
      .select(hammingDistance(simhash16(col("a")),
        simhash16(col("b"))).as("d"))
    val ds = df.collect().map(_.getAs[Number](0).longValue)
    assert(ds(0) === 0L)
    assert(ds(1) > 0L)
  }
}
