package graft

import org.apache.spark.sql.functions._

/** The pure-SQL entry path (the reference's Hasura analog, SURVEY §3.2):
  * tables registered as views + spark.sql must agree with the DataFrame
  * builders.
  *
  * Surface note: q33_emb_cos_pairs is NOT part of the production surface —
  * it is the O(n²) exactness baseline for the ANN paths (q44 LSH, q34/
  * IvfIndex); a user wanting near-dup pairs at scale gets the banded/
  * bucketed variants. */
class SqlSurfaceSpec extends SparkSpec {

  test("registered views answer SQL identically to the DataFrame builders") {
    Tables.registerAll(spark, sf("sf0.001"))
    val viaSql = spark.sql(
      """SELECT n.n_name,
        |       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        |FROM customer c
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |JOIN region r ON r.r_regionkey = n.n_regionkey
        |WHERE r.r_name = 'ASIA'
        |GROUP BY n.n_name ORDER BY revenue DESC, n.n_name""".stripMargin)
      .collect().map(_.toString).toSeq
    val viaDf = queries.RelationalQueries.q8Revenue(spark, sf("sf0.001"))
      .collect().map(_.toString).toSeq
    assert(viaSql === viaDf)
  }

  test("views carry the ns-timestamp shim (events.ts is a usable timestamp)") {
    Tables.registerAll(spark, sf("sf0.001"))
    val r = spark.sql(
      "SELECT COUNT(*) FROM events WHERE ts >= TIMESTAMP '2000-01-01 00:00:00'")
      .head().getLong(0)
    assert(r > 0)
  }
}
