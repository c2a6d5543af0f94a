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
}
