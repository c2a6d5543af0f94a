package graft.api

import graft.SparkSpec
import graft.api.QueryBuilder._
import org.apache.spark.sql.functions._

/** Hasura's root `<table>_aggregate` read surface: parse forms, loud
  * error shapes, and execution against the batch reference. */
class RootAggregateSpec extends SparkSpec {

  test("parseRootAggregate: all count forms, aliases, variables") {
    val r = GraphQl.parseRootAggregate(GraphQl.q121Query,
      """{"st": "O"}""").fold(m => fail(m), identity)
    assert(r === AggRequest("orders",
      where = Some(Eq("o_orderstatus", "O")),
      aggs = Seq(
        CountAll("count"),
        CountDistinctOf("o_custkey", "n_cust"),
        SumOf("o_totalprice", "sum_o_totalprice"),
        MinOf("o_totalprice", "min_o_totalprice"),
        MaxOf("o_totalprice", "max_o_totalprice"))))
    // count(columns: c) without distinct = non-null count of c
    val r2 = GraphQl.parseRootAggregate(
      "{ docs_aggregate { aggregate { count(columns: src) } } }")
      .fold(m => fail(m), identity)
    assert(r2 === AggRequest("docs", None, Seq(CountOf("src", "count"))))
  }

  test("nodes under explicit nulls placements serve — the in-array " +
    "comparator honors the spelled rule (default and non-default " +
    "alike; on a null-free fixture both orders agree)") {
    val r = AggRequest("orders",
      where = Some(Eq("o_orderstatus", "P")),
      aggs = Seq(CountAll("count")),
      nodes = Seq("o_orderkey"),
      orderBy =
        Seq(Order("o_totalprice", desc = true, nullsFirst = Some(true))),
      limit = Some(3))
    val row = QueryBuilder.runAggregate(spark, sf("sf0.001"), r).head
    assert(row.getLong(0) === 3L)
    // the NON-default spelling serves too (r15 — the comparator
    // places nulls by the spelled rule); o_totalprice is null-free,
    // so the same rows answer in the same order
    val nd = r.copy(orderBy =
      Seq(Order("o_totalprice", desc = true, nullsFirst = Some(false))))
    val ndRow = QueryBuilder.runAggregate(spark, sf("sf0.001"), nd).head
    assert(ndRow.getLong(0) === 3L)
    assert(ndRow.getString(1) === row.getString(1))
  }

  test("parseRootAggregate rejects the wrong-answer shapes loudly") {
    def err(doc: String, frag: String): Unit =
      GraphQl.parseRootAggregate(doc) match {
        case Left(m) => assert(m.contains(frag), s"got: $m")
        case Right(r) => fail(s"parsed: $r")
      }
    err("{ orders { o_orderkey } }", "expected <table>_aggregate")
    // nodes WITHOUT aggregates is the plain read's job
    err("{ orders_aggregate { nodes { o_orderkey } } }",
      "no aggregates")
    err("""{ orders_aggregate { aggregate { count }
          |  nodes { o_orderkey } nodes { o_custkey } } }""".stripMargin,
      "duplicate nodes")
    err("{ orders_aggregate { aggregate { count } nodes { } } }",
      "empty selection")
    err("{ orders_aggregate { aggregate { count } rows { a } } }",
      "expected 'aggregate' or 'nodes'")
    err("{ orders_aggregate { aggregate { count(distinct: true) } } }",
      "distinct needs columns")
    err("{ orders_aggregate { aggregate { count(nope: 1) } } }",
      "unknown argument")
    // limit/offset without order_by = an undefined subset
    err("{ orders_aggregate(limit: 5) { aggregate { count } } }",
      "order the slice")
    err("{ orders_aggregate(offset: 5) { aggregate { count } } }",
      "order the slice")
    err("{ orders_aggregate { aggregate { } } }", "no aggregates")
    // the RELATIONSHIP grammar still refuses count arguments — its
    // count is the child key by construction
    GraphQl.parse(
      """{ customer { c_custkey
        |  orders_aggregate { aggregate { count(columns: o_custkey) } } } }"""
        .stripMargin) match {
      case Left(m) => assert(m.contains("unknown argument"))
      case Right(r) => fail(s"parsed: $r")
    }
  }

  test("runAggregate answers like the direct aggregation; empty filter " +
    "answers count 0 / sum 0.0 (the left-join-repair posture)") {
    val dir = "/root/testdata/sf0.001"
    val got = GraphQl.q121RootAggregate(spark, dir).collect().head
    val orders = graft.Tables.load(spark, dir, "orders")
      .filter(col("o_orderstatus") === "O")
    val ref = orders.agg(count(lit(1)), countDistinct(col("o_custkey")),
      round(sum(col("o_totalprice")), 2), min(col("o_totalprice")),
      max(col("o_totalprice"))).collect().head
    assert(got.toSeq === ref.toSeq)
    // a filter matching nothing: counts repair to 0, sum to 0.0,
    // min/max stay null — one row, never zero rows
    val empty = QueryBuilder.runAggregate(spark, dir, AggRequest(
      "orders", Some(Eq("o_orderstatus", "NOPE")),
      Seq(CountAll(), SumOf("o_totalprice", "s"),
        MinOf("o_totalprice", "lo")))).collect()
    assert(empty.length === 1)
    assert(empty.head.getLong(0) === 0L)
    assert(empty.head.getDouble(1) === 0.0)
    assert(empty.head.isNullAt(2))
  }
}
