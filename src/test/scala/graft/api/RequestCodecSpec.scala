package graft.api

import graft.SparkSpec
import graft.api.QueryBuilder._

/** Wire-codec laws: parse ∘ render is the identity on canonically-typed
  * requests (and idempotent from any request), malformed wire bytes come
  * back as `Left` values — never exceptions — and a parsed-from-JSON
  * request runs row-identically to its DSL-built twin. */
class RequestCodecSpec extends SparkSpec {

  private val canned: Seq[(String, Request)] = Seq(
    "q90-shape" -> Request(
      table = "customer",
      fields = Seq("c_custkey", "c_name"),
      where = Some(And(
        Or(Gte("c_acctbal", 1000L), Eq("c_mktsegment", "BUILDING")),
        Like("c_name", "%5%"))),
      orderBy = Seq(Order("c_custkey")),
      offset = 10,
      limit = Some(50)),
    "child-args" -> Request(
      table = "customer",
      fields = Seq("c_custkey"),
      where = Some(Lte("c_custkey", 50L)),
      orderBy = Seq(Order("c_custkey")),
      nested = Seq(Nested(
        as = "orders", table = "orders",
        childKey = "o_custkey", parentKey = "c_custkey",
        fields = Seq(
          NestedField("k", "o_orderkey"),
          NestedField("p", "o_totalprice", format = Some((2, "%.2f")))),
        where = Some(Eq("o_orderstatus", "O")),
        orderBy = Seq(Order("o_totalprice", desc = true),
          Order("o_orderkey")),
        limit = Some(3)))),
    "child-page" -> Request(
      table = "customer",
      fields = Seq("c_custkey"),
      where = Some(Lte("c_custkey", 80L)),
      orderBy = Seq(Order("c_custkey")),
      nested = Seq(Nested(
        as = "orders", table = "orders",
        childKey = "o_custkey", parentKey = "c_custkey",
        fields = Seq(NestedField("k", "o_orderkey"),
          NestedField("st", "o_orderstatus")),
        orderBy = Seq(Order("o_orderstatus"),
          Order("o_totalprice", desc = true), Order("o_orderkey")),
        distinctOn = Seq("o_orderstatus"),
        offset = 1, limit = Some(2))),
      aggRels = Seq(AggRel(
        table = "orders", childKey = "o_custkey", parentKey = "c_custkey",
        aggs = Seq(CountOf("o_orderkey", "n")),
        orderBy = Seq(Order("o_orderstatus"), Order("o_orderkey")),
        distinctOn = Seq("o_orderstatus"), offset = 1))),
    "ops" -> Request(
      table = "documents",
      fields = Seq("doc_id"),
      where = Some(And(
        IsNull("text", isNull = false),
        IsNull("source"),
        Nin("lang", Seq("zh", "es")),
        Ilike("source", "SRC1%"),
        Nlike("source", "%8"))),
      orderBy = Seq(Order("doc_id")),
      limit = Some(10)),
    "rel-pred" -> Request(
      table = "customer",
      fields = Seq("c_custkey"),
      where = Some(Or(
        Not(RelPred("orders", "o_custkey", "c_custkey",
          IsNull("o_orderkey", isNull = false))),
        RelPred("orders", "o_custkey", "c_custkey",
          RelPred("lineitem", "l_orderkey", "o_orderkey",
            Gte("l_quantity", 49.0))))),
      limit = Some(10)),
    "regex-ops" -> Request(
      table = "documents",
      fields = Seq("doc_id"),
      where = Some(And(
        Regex("lang", "^e"),
        Regex("source", "^SRC[0-9]", caseInsensitive = true),
        Nregex("source", "8$"),
        Nregex("lang", "Z", caseInsensitive = true),
        Similar("lang", "e(n|s)"),
        Nsimilar("source", "z%"))),
      limit = Some(10)),
    "distinct-on" -> Request(
      table = "documents",
      fields = Seq("doc_id", "lang"),
      orderBy = Seq(Order("lang"), Order("n_chars", desc = true),
        Order("doc_id")),
      distinctOn = Seq("lang")),
    "deep+aggs" -> Request(
      table = "customer",
      fields = Seq("c_custkey"),
      where = Some(Not(In("c_mktsegment", Seq("MACHINERY", "AUTOMOBILE")))),
      orderBy = Seq(Order("c_custkey", desc = true)),
      nested = Seq(Nested(
        as = "orders", table = "orders",
        childKey = "o_custkey", parentKey = "c_custkey",
        fields = Seq(NestedField("k", "o_orderkey")),
        subs = Seq(Nested(
          as = "items", table = "lineitem",
          childKey = "l_orderkey", parentKey = "o_orderkey",
          fields = Seq(NestedField("q", "l_quantity", cast = Some("long"))),
          joinType = "left")))),
      aggRels = Seq(AggRel(
        table = "orders", childKey = "o_custkey", parentKey = "c_custkey",
        aggs = Seq(CountOf("o_orderkey", "n"),
          SumOf("o_totalprice", "s", roundTo = 3),
          MinOf("o_totalprice", "lo"), MaxOf("o_totalprice", "hi"),
          AvgOf("o_totalprice", "mean")),
        where = Some(Gt("o_totalprice", 0.5)),
        orderBy = Seq(Order("o_totalprice", desc = true),
          Order("o_orderkey")),
        limit = Some(2)))),
    "stat-aggs" -> Request(
      table = "customer",
      fields = Seq("c_custkey"),
      orderBy = Seq(Order("c_custkey")),
      aggRels = Seq(AggRel(
        table = "orders", childKey = "o_custkey", parentKey = "c_custkey",
        aggs = Seq(
          StddevOf("o_totalprice", "sd"),
          StddevOf("o_totalprice", "sdp", pop = true, roundTo = 2),
          VarianceOf("o_totalprice", "vr", pop = false, roundTo = -2),
          VarianceOf("o_totalprice", "vrp", pop = true)))))
  )

  test("parse(render(r)) == Right(r) on canonically-typed requests, " +
    "and parse ∘ render is idempotent from any request") {
    canned.foreach { case (name, r) =>
      val wire = RequestCodec.render(r)
      val parsed = RequestCodec.parse(wire)
      assert(parsed === Right(r), s"$name: round trip drifted\n$wire")
      // second lap: identical wire bytes
      assert(RequestCodec.render(parsed.toOption.get) === wire, name)
    }
  }

  test("the canned q99 wire text parses to EXACTLY the q98 DSL request") {
    // q98's DSL literals are Ints; the wire canon is Long — compare by
    // re-rendering both sides to wire bytes
    val q98 = Request(
      table = "customer",
      fields = Seq("c_custkey"),
      where = Some(Lte("c_custkey", 50L)),
      orderBy = Seq(Order("c_custkey")),
      nested = Seq(Nested(
        as = "orders", table = "orders",
        childKey = "o_custkey", parentKey = "c_custkey",
        fields = Seq(
          NestedField("k", "o_orderkey"),
          NestedField("p", "o_totalprice", format = Some((2, "%.2f")))),
        where = Some(Eq("o_orderstatus", "O")),
        orderBy = Seq(Order("o_totalprice", desc = true),
          Order("o_orderkey")),
        limit = Some(3))))
    assert(RequestCodec.parse(RequestCodec.q99Json) === Right(q98))
  }

  test("a parsed-from-wire request runs row-identically to the DSL twin") {
    val dir = sf("sf0.001")
    val wire = RequestCodec.q99QbWire(spark, dir).collect().toSeq
    val dsl = QueryBuilder.q98QbChildArgs(spark, dir).collect().toSeq
    assert(wire === dsl)
  }

  test("malformed wire bytes are Left values, never exceptions") {
    def err(json: String): String =
      RequestCodec.parse(json) match {
        case Left(m) => m
        case Right(r) => fail(s"accepted malformed request as $r")
      }
    assert(err("{nope").startsWith("not valid JSON"))
    assert(err("[1,2]") === "request must be a JSON object")
    assert(err("""{"fields":["x"]}""").contains("missing required key 'table'"))
    assert(err("""{"table":"customer","fields":[]}""")
      .contains("selects no fields"))
    assert(err("""{"table":"customer","fields":["c"],
      "where":{"f":{"_zap":1}}}""").contains("unknown operator '_zap'"))
    assert(err("""{"table":"customer","fields":["c"],
      "where":{"f":{"_eq":1,"_lt":2}}}""")
      .contains("exactly one comparison operator"))
    assert(err("""{"table":"customer","fields":["c"],
      "where":{"_and":{}}}""").contains("expected an array"))
    assert(err("""{"table":"customer","fields":["c"],
      "where":{"f":{"_eq":null}}}""")
      .contains("literal must be string/number/boolean"))
    assert(err("""{"table":"customer","fields":["c"],"limit":1.5}""")
      .contains("expected an integer"))
    // DSL-level validation surfaces as a value too: limit without order
    assert(err("""{"table":"customer","fields":["c"],"nested":[{
      "as":"o","table":"orders","child_key":"o_custkey",
      "parent_key":"c_custkey","fields":[{"as":"k","field":"o_orderkey"}],
      "limit":3}]}""").contains("limit needs orderBy"))
  }
}
