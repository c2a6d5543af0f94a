package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The streaming funnel must equal the batch funnel over the docs fed so
  * far, under any micro-batch split, including a null-text document. */
class CorpusStreamsSpec extends SparkSpec {

  test("streamed funnel counts equal the batch fold after each trigger") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val fixture = graft.Tables.load(spark, sf("sf0.001"), "documents")
      .select("text", "n_chars").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1))).toSeq
    val withNull = fixture :+ ((None: Option[String], 0L))

    val input = MemoryStream[(Option[String], Long)]
    val q = CorpusStreams.funnelStream(
        input.toDS().toDF("text", "n_chars"))
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode(OutputMode.Complete).start()
    try {
      def batchCounts(n: Int) = {
        val df = withNull.take(n).toDF("text", "n_chars")
        graft.queries.TextQueries.funnelCounts(df).head.toSeq
      }
      val cuts = Seq(40, 99, withNull.size)
      var fed = 0
      cuts.foreach { cut =>
        input.addData(withNull.slice(fed, cut)); fed = cut
        q.processAllAvailable()
        val streamed = spark.table("funnel_stream").head.toSeq
        assert(streamed === batchCounts(cut), s"after $cut docs")
      }
      // the funnel is monotone: the null-text doc entered n0 only
      val fin = spark.table("funnel_stream").head
      assert(fin.getLong(0) === withNull.size.toLong)
    } finally q.stop()
  }

  test("streamed per-source profile equals batch q180 after each " +
    "trigger (exact distincts via per-source state), nulls mirror " +
    "batch semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val fixture = graft.Tables.load(spark, sf("sf0.001"), "documents")
      .select("source", "lang", "n_chars", "text").collect()
      .map(r => (Option(r.getString(0)).getOrElse("src?"),
        Option(r.getString(1)), Option(r.getLong(2)),
        Option(r.getString(3))))
      .toSeq
    // a null-lang, null-text doc: never enters the distinct sets, so
    // it counts as a duplicate (batch's countDistinct-ignores-nulls);
    // and a whole source of null n_chars must answer a NULL mean,
    // exactly as batch's sum over all-nulls does
    val withNull = fixture :+
      ((fixture.head._1, None: Option[String], Some(10L),
        None: Option[String])) :+
      (("src_nullchars", Some("en"), None: Option[Long],
        Some("solo text"))) :+
      (("src_nullchars", Some("fr"), None: Option[Long],
        Some("deux textes")))
    val input =
      MemoryStream[(String, Option[String], Option[Long], Option[String])]
    val q = CorpusStreams.profileStream(
        input.toDS().toDF("source", "lang", "n_chars", "text"))
      .writeStream.format("memory").queryName("profile_stream")
      .outputMode(OutputMode.Update).start()
    try {
      val latest = scala.collection.mutable.Map.empty[String, Seq[Any]]
      val cuts = Seq(50, 120, withNull.size)
      var fed = 0
      var lastSeen = 0L
      cuts.foreach { cut =>
        input.addData(withNull.slice(fed, cut)); fed = cut
        q.processAllAvailable()
        // Update mode: only touched sources re-emit — accumulate the
        // latest row per source (memory sink keeps every update; take
        // the newest by insertion order)
        spark.table("profile_stream").collect().foreach { r =>
          latest(r.getString(0)) = r.toSeq.tail
        }
        val expect = graft.queries.TextQueries.sourceProfile(
          withNull.take(cut).toDF("source", "lang", "n_chars", "text"))
          .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
        assert(latest.toMap === expect, s"after $cut docs")
        lastSeen = cut.toLong
      }
      assert(lastSeen === withNull.size.toLong)
    } finally q.stop()
  }

  test("streamed decontamination guard equals batch q76 over all triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import graft.functions.BloomFunctions.bloomAgg
    import graft.functions.TextKernelExpressions.wordShinglesFast

    val dir = sf("sf0.001")
    val docs = graft.Tables.load(spark, dir, "documents")
    // blocklist side, built once (as a production guard would at start)
    val evalSh = docs.filter(col("doc_id") < 10)
      .select(explode(wordShinglesFast(col("text"), 5)).as("sh")).distinct()
      .cache()
    val bloom = evalSh.agg(bloomAgg(xxhash64(col("sh")), 100000L))
      .head.getAs[Array[Byte]](0)

    val corpus = docs.filter(col("doc_id") >= 10)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val flagged = scala.collection.mutable.Map.empty[Long, Long]
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        CorpusStreams.decontaminateBatch(batch, bloom, evalSh)
          .collect().foreach(r =>
            flagged(r.getLong(0)) = r.getLong(1))
      }
      .start()
    try {
      // uneven triggers; every doc arrives whole in exactly one of them
      Seq(corpus.take(30), corpus.slice(30, 31), corpus.drop(31))
        .foreach { part => input.addData(part); q.processAllAvailable() }
      val batchRows = graft.queries.TextQueries
        .q76DecontaminateBloom(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(flagged.toMap === batchRows)
      assert(batchRows.nonEmpty) // the fixture must exercise the overlap
    } finally { q.stop(); evalSh.unpersist() }
  }

  test("streamed corpus mixing: single trigger reproduces q63 exactly; " +
    "multi-trigger never exceeds the budget and closed stays closed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = sf("sf0.001")
    val fixture = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val batchTotals = graft.queries.TextQueries.q63CorpusMix(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

    def run(parts: Seq[Seq[(Long, String, String)]],
        name: String): Map[String, (Long, Long)] = {
      val input = MemoryStream[(Long, String, String)]
      val q = CorpusStreams.mixStream(
          input.toDS().toDF("doc_id", "lang", "text"))
        .toDF("doc_id", "lang", "ntok")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try parts.foreach { p => input.addData(p); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).groupBy("lang")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum("ntok").as("t"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    }

    // all docs in one trigger: the in-group hash sort makes admission
    // identical to the batch window
    assert(run(Seq(fixture), "mix_one") === batchTotals)
    // uneven triggers: arrival-prefix admission differs from the batch
    // hash order (documented), but the budget invariant must hold
    val multi = run(Seq(fixture.take(100), fixture.slice(100, 101),
      fixture.drop(101)), "mix_many")
    multi.foreach { case (lang, (_, toks)) =>
      assert(toks <= 3000, s"$lang exceeded the budget: $toks")
    }
    assert(multi.nonEmpty)
  }

  test("streamed Misra-Gries summary: exact at capacity >= vocab, MG " +
    "bound under pressure, O(capacity) state per trigger") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val fixture = graft.Tables.load(spark, sf("sf0.001"), "documents")
      .select("text").collect().map(_.getString(0)).toSeq

    def run(capacity: Int): Map[String, Long] = {
      val input = MemoryStream[String]
      val name = s"hh_stream_$capacity"
      val q = CorpusStreams.heavyHitterStream(
          input.toDS().toDF("text"), capacity)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Complete).start()
      try {
        Seq(fixture.take(20), fixture.slice(20, 45), fixture.drop(45))
          .foreach { part => input.addData(part); q.processAllAvailable() }
        import org.apache.spark.sql.functions._
        spark.table(name)
          .select(explode(col("mg")).as("e"))
          .select(col("e.w"), col("e.c")).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
      } finally q.stop()
    }

    val exact = fixture.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    // fixture vocab fits capacity=256 → the running summary IS exact
    assert(run(256) === exact)
    // under pressure (capacity 8 << vocab) the MG bound still holds:
    // counts are lower bounds within n/(cap+1), heavy items survive
    val n = exact.values.sum
    val got = run(8)
    assert(got.size <= 8)
    got.foreach { case (w, c) =>
      assert(c <= exact(w), s"$w overcounted")
      assert(exact(w) - c <= n / 9, s"$w beyond the MG bound")
    }
    exact.filter(_._2 > n / 9).keys.foreach(w =>
      assert(got.contains(w), s"heavy $w lost"))
  }
}
