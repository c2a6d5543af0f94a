package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The q217/q218 quality-ensemble pieces the fixture oracle cannot
  * exercise non-vacuously: the fixture's uniform synthetic lengths
  * have no Tukey outliers, so the FENCES stage always passes there —
  * this spec proves it fires on a length-skewed corpus. */
class EnsembleSpec extends SparkSpec {
  import spark.implicits._

  test("fences stage fires on a length-skewed corpus: the Tukey " +
    "outlier fails fences_ok while its peers pass") {
    val rows = (0 to 19).map(i =>
      (i.toLong, "en", 150L, Seq.fill(50)("w").mkString(" "))) :+
      ((20L, "en", 1500L, Seq.fill(500)("w").mkString(" ")))
    val d = rows.toDF("doc_id", "lang", "n_chars", "text")
    val f = TextQueries.ratioFenceFlags(d)
    assert(f.filter(col("fences_ok") === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(20L))
    assert(f.filter(col("fences_ok") === 1).count() === 20L)
    // the flags are INDEPENDENT (cascading happens at the funnel):
    // the one-word-vocabulary texts fail ratios regardless of fences
    assert(f.filter(col("ratios_ok") === 0).count() === 21L)
  }

  test("verdictStream (q217's serving twin) equals a join-based batch " +
    "recomputation with the SAME frozen artifacts, across triggers — " +
    "the UDF map-lookup scorer vs the q207 join shape, dual-checked") {
    import graft.streaming.CorpusStreams
    import graft.functions.TextFunctions.{normalize, tokens}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = sf("sf0.001")
    val lm = CorpusStreams.freezeLm(spark, dir)
    val fences = CorpusStreams.freezeFences(spark, dir)
    val clfKeep = graft.queries.SimilarityQueries
      .q94ClassifierScore(spark, dir)
      .select(col("vec_id").as("doc_id"), col("keep"))
      .localCheckpoint(true)
    val d = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "lang", "n_chars", "text")

    // the INDEPENDENT batch path: the same frozen model applied via
    // q207's join shape over EVERY doc (the stream scores all
    // arrivals — unseen by construction)
    val cbgDf = lm.cbg.toSeq.map { case ((a, b), c) => (a, b, c) }
      .toDF("w1", "w2", "cbg")
    val cpfxDf = lm.cpfx.toSeq.toDF("pw1", "cpfx")
    val base = d.select(col("doc_id"),
        tokens(normalize(col("text"))).as("w"))
      .filter(size(col("w")) >= 2)
    val bigrams = base.select(col("doc_id"),
      explode(arrays_zip(
        slice(col("w"), lit(1), size(col("w")) - 1).as("a"),
        slice(col("w"), lit(2), size(col("w")) - 1).as("b"))).as("bg"))
      .select(col("doc_id"), col("bg.a").as("w1"), col("bg.b").as("w2"))
    val scores = bigrams
      .join(cbgDf, Seq("w1", "w2"), "left")
      .join(cpfxDf, bigrams("w1") === cpfxDf("pw1"), "left")
      .select(col("doc_id"),
        expr(s"(1000000000L * (coalesce(cbg, 0L) + 1)) div " +
          s"(coalesce(cpfx, 0L) + ${lm.v})").as("term"))
      .groupBy("doc_id")
      .agg(round((sum(col("term")).cast("double") / count(lit(1))) / 1e9,
        9).as("score"))
    val flags = graft.queries.TextQueries.ratioFenceFlags(d)
      .join(clfKeep, Seq("doc_id"), "left")
      .join(scores, Seq("doc_id"), "left")
      .withColumn("clf_ok", coalesce(col("keep"), lit(1)))
      .withColumn("lm_ok", when(col("score").isNull, lit(1))
        .otherwise((col("score") >=
          graft.queries.TextQueries.EnsembleLmTau).cast("int")))
    val expected = flags
      .select("doc_id", "ratios_ok", "fences_ok", "clf_ok", "lm_ok")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap

    val rows = d.collect().map(r => (r.getLong(0),
      Option(r.getString(1)), r.getLong(2), Option(r.getString(3))))
      .toSeq
    val input = MemoryStream[(Long, Option[String], Long, Option[String])]
    val q = CorpusStreams.verdictStream(
        input.toDS().toDF("doc_id", "lang", "n_chars", "text"),
        fences, lm, clfKeep)
      .writeStream.format("memory").queryName("verdict_stream")
      .outputMode(OutputMode.Append).start()
    try {
      val half = rows.size / 2
      input.addData(rows.take(half))
      q.processAllAvailable()
      input.addData(rows.drop(half))
      q.processAllAvailable()
      val got = spark.table("verdict_stream")
        .select("doc_id", "ratios_ok", "fences_ok", "clf_ok", "lm_ok",
          "verdict", "first_fail")
        .collect()
      assert(got.length === rows.size)
      got.foreach { r =>
        val id = r.getLong(0)
        val fl = (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
        assert(fl === expected(id), s"doc $id flags")
        val keepAll = fl == ((1, 1, 1, 1))
        assert(r.getString(5) === (if (keepAll) "keep" else "drop"),
          s"doc $id verdict")
        val ff = Seq("ratios", "fences", "classifier", "lm")
          .zip(Seq(fl._1, fl._2, fl._3, fl._4))
          .collectFirst { case (n, 0) => n }.orNull
        assert(r.getString(6) === ff, s"doc $id first_fail")
      }
      // both verdicts occur — the twin discriminates on this corpus
      assert(got.exists(_.getString(5) == "keep") &&
        got.exists(_.getString(5) == "drop"))
    } finally q.stop()
  }

  test("freezeLm is bounded by construction: the cap keeps the top-N " +
    "bigrams by count, prefix totals stay the TRUE train totals, and " +
    "an uncapping cap reproduces the full model exactly") {
    import graft.streaming.CorpusStreams
    val dir = sf("sf0.001")
    val full = CorpusStreams.freezeLm(spark, dir)
    // a cap wider than the vocabulary changes nothing: the frozen
    // model IS the batch model (the q217-match contract rides on this)
    val wide = CorpusStreams.freezeLm(spark, dir,
      maxBigrams = full.cbg.size + 1000)
    assert(wide === full)
    // a BINDING cap: artifact size is the cap, retained bigrams are
    // exactly the top-N by (count desc, w1, w2), and every retained
    // bigram still scores with its TRUE prefix total
    val n = 25
    val capped = CorpusStreams.freezeLm(spark, dir, maxBigrams = n)
    assert(capped.cbg.size === n)
    assert(capped.cpfx.size <= n)
    val expectedKept = full.cbg.toSeq
      .sortBy { case ((w1, w2), c) => (-c, w1, w2) }.take(n).toMap
    assert(capped.cbg === expectedKept)
    capped.cpfx.foreach { case (w1, c) =>
      assert(c === full.cpfx(w1), s"prefix $w1 total") }
    assert(capped.v === full.v) // V is the true train vocabulary
    // dropped bigrams back off to the add-one rule: the scorer's
    // getOrElse(0) path — no entry means (0+1)/(cpfx+V)
    assert((full.cbg.keySet -- capped.cbg.keySet)
      .forall(k => !capped.cbg.contains(k)))
  }

  test("fences respect language boundaries: an outlier in one " +
    "language does not widen another language's fences") {
    val en = (0 to 9).map(i =>
      (i.toLong, "en", 150L, Seq.fill(50)("w").mkString(" ")))
    val de = (10 to 19).map(i =>
      (i.toLong, "de", 150L, Seq.fill(50)("w").mkString(" "))) :+
      ((20L, "de", 1500L, Seq.fill(500)("w").mkString(" ")))
    val f = TextQueries.ratioFenceFlags(
      (en ++ de).toDF("doc_id", "lang", "n_chars", "text"))
    assert(f.filter(col("fences_ok") === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(20L))
  }

  test("an EMPTY frozen model (the train split kept nothing) scores " +
    "null like the batch twin's div-by-zero — arriving docs pass the " +
    "lm stage instead of an ArithmeticException killing the stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Option[String], Long, Option[String])]
    val q = graft.streaming.CorpusStreams.verdictStream(
        input.toDS().toDF("doc_id", "lang", "n_chars", "text"),
        fences = Map("en" -> (1.0, 100.0)),
        lm = graft.streaming.CorpusStreams.FrozenLm(
          Map.empty, Map.empty, 0L),
        clfKeep = Seq((1L, 1)).toDF("doc_id", "keep"))
      .writeStream.format("memory").queryName("verdict_empty_lm")
      .outputMode(OutputMode.Append).start()
    try {
      // >= 2 tokens, so the scorer walks a bigram (the crash path)
      input.addData(Seq(
        (1L, Some("en"), 20L, Some("alpha beta gamma delta"))))
      q.processAllAvailable()
      val r = spark.table("verdict_empty_lm")
        .select("doc_id", "lm_ok", "score").head
      assert(r.getLong(0) === 1L)
      assert(r.getInt(1) === 1, "null score must pass the lm stage")
      assert(r.isNullAt(2))
    } finally q.stop()
  }
}
