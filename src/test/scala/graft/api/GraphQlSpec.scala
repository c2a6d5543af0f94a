package graft.api

import graft.SparkSpec
import graft.api.QueryBuilder._

/** GraphQL front-end laws: a query parses to EXACTLY the `Request` the
  * DSL builds (so all three front ends — DSL, JSON wire, GraphQL text —
  * compile one plan), the reference README's own example shapes parse,
  * parse errors are `Left` values with positions, and the canned q100
  * runs row-identically to its DSL twin q98. */
class GraphQlSpec extends SparkSpec {

  private def parsed(q: String): Request =
    GraphQl.parse(q) match {
      case Right(r) => r
      case Left(m) => fail(s"did not parse: $m\n$q")
    }

  private def err(q: String): String =
    GraphQl.parse(q) match {
      case Left(m) => m
      case Right(r) => fail(s"accepted bad query as $r")
    }

  test("the reference README's simple nested query parses (users{nfts}" +
    " shape on the fixture schema)") {
    val r = parsed("""
      {
        customer {
          orders { k: o_orderkey }
          c_custkey
        }
      }""")
    assert(r === Request(
      table = "customer",
      fields = Seq("c_custkey"),
      nested = Seq(Nested(
        as = "orders", table = "orders",
        childKey = "o_custkey", parentKey = "c_custkey",
        fields = Seq(NestedField("k", "o_orderkey"))))))
  }

  test("the reference README's _or example parses — OBJECT-form " +
    "operands, _gte and _eq (README.md:125-133)") {
    val r = parsed("""
      {
        customer(where: {_or: {c_custkey: {_gte: 1},
                               c_name: {_eq: "Customer#000000002"}}}) {
          orders { k: o_orderkey }
          c_custkey
          c_name
        }
      }""")
    assert(r.where === Some(Or(
      Gte("c_custkey", 1L), Eq("c_name", "Customer#000000002"))))
    assert(r.fields === Seq("c_custkey", "c_name"))
  }

  test("q100's GraphQL text parses to EXACTLY the q98 DSL request " +
    "(args, aliases, @fmt directive, multi-key order_by)") {
    assert(parsed(GraphQl.q100Query) === Request(
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
        limit = Some(3)))))
  }

  test("q100 runs row-identically to the DSL twin q98") {
    val dir = sf("sf0.001")
    val gql = GraphQl.q100QbGraphql(spark, dir).collect().toSeq
    val dsl = QueryBuilder.q98QbChildArgs(spark, dir).collect().toSeq
    assert(gql.nonEmpty && gql === dsl)
  }

  test("deep nesting + @cast + @join(left) + comments + block strings") {
    val r = parsed("""
      query Deep { # q49's three-level shape
        customer(where: {c_name: {_like: \"\"\"%5%\"\"\"}},
                 limit: 10, offset: 2) {
          c_custkey
          orders {
            k: o_orderkey
            items @join(type: "left") {
              q: l_quantity @cast(to: "long")
            }
          }
        }
      }""".replace("\\\"", "\""))
    assert(r.offset === 2 && r.limit === Some(10))
    assert(r.where === Some(Like("c_name", "%5%")))
    val sub = r.nested.head.sub.get
    assert(sub.joinType === "left")
    assert(sub.fields === Seq(
      NestedField("q", "l_quantity", cast = Some("long"))))
  }

  test("aggregate relationships: *_aggregate with count/sum/min/max/avg" +
    ", args, and aliases") {
    val r = parsed("""
      {
        customer(order_by: {c_custkey: asc}) {
          c_custkey
          orders_aggregate(where: {o_totalprice: {_gt: 0.5}},
                           order_by: [{o_totalprice: desc},
                                      {o_orderkey: asc}],
                           limit: 2) {
            aggregate {
              n: count
              sum { o_totalprice }
              lo: min { o_totalprice }
              avg { o_totalprice }
            }
          }
        }
      }""")
    assert(r.aggRels === Seq(AggRel(
      table = "orders", childKey = "o_custkey", parentKey = "c_custkey",
      aggs = Seq(CountOf("o_custkey", "n"),
        SumOf("o_totalprice", "sum_o_totalprice"),
        MinOf("o_totalprice", "lo"),
        AvgOf("o_totalprice", "avg_o_totalprice")),
      where = Some(Gt("o_totalprice", 0.5)),
      orderBy = Seq(Order("o_totalprice", desc = true),
        Order("o_orderkey")),
      limit = Some(2))))
  }

  test("aggregate relationships: the statistical family (stddev/" +
    "variance, samp/pop) — bare spellings are the sample variants") {
    val r = parsed("""
      {
        customer(order_by: {c_custkey: asc}) {
          c_custkey
          orders_aggregate {
            aggregate {
              stddev { o_totalprice }
              sdp: stddev_pop { o_totalprice }
              s2: stddev_samp { o_totalprice }
              variance { o_totalprice }
              vs: var_samp { o_totalprice }
              var_pop { o_totalprice }
            }
          }
        }
      }""")
    assert(r.aggRels === Seq(AggRel(
      table = "orders", childKey = "o_custkey", parentKey = "c_custkey",
      aggs = Seq(
        StddevOf("o_totalprice", "stddev_o_totalprice"),
        StddevOf("o_totalprice", "sdp", pop = true),
        StddevOf("o_totalprice", "s2"),
        VarianceOf("o_totalprice", "variance_o_totalprice"),
        VarianceOf("o_totalprice", "vs"),
        VarianceOf("o_totalprice", "var_pop_o_totalprice", pop = true)))))
  }

  test("where-tree spellings: implicit AND, array-form _and, _in/_neq" +
    "/_not, boolean and negative literals") {
    val r = parsed("""
      {
        customer(where: {
          _and: [{c_acctbal: {_gt: -100.5}},
                 {_not: {c_mktsegment: {_in: ["MACHINERY", "BUILDING"]}}}]
          c_custkey: {_neq: 7}
        }) { c_custkey }
      }""")
    assert(r.where === Some(And(
      And(Gt("c_acctbal", -100.5),
        Not(In("c_mktsegment", Seq("MACHINERY", "BUILDING")))),
      Neq("c_custkey", 7L))))
  }

  test("the rest of Hasura's comparison surface: _is_null/_nin/_ilike" +
    "/_nlike parse and reject bad operand types") {
    val r = parsed("""
      { documents(where: {
          text: {_is_null: false}
          lang: {_nin: ["zh", "es"]}
          source: {_ilike: "SRC1%"}
          doc_id: {_is_null: true}
        }) { doc_id } }""")
    assert(r.where === Some(And(
      IsNull("text", isNull = false), Nin("lang", Seq("zh", "es")),
      Ilike("source", "SRC1%"), IsNull("doc_id"))))
    assert(err("{ documents(where: {t: {_is_null: 1}}) { doc_id } }")
      .contains("expected a boolean"))
    assert(err("{ documents(where: {t: {_nin: 3}}) { doc_id } }")
      .contains("expected a list"))
    assert(err("{ documents(where: {t: {_nlike: 3}}) { doc_id } }")
      .contains("pattern must be a string"))
  }

  test("null literals: _eq/_neq null compile to IS [NOT] NULL (never " +
    "a comparison against the STRING \"null\"); null anywhere else is " +
    "a loud error; a JSON null variable behaves identically") {
    val r = parsed("""
      { documents(where: {
          text: {_eq: null}
          lang: {_neq: null}
        }) { doc_id } }""")
    assert(r.where === Some(And(
      IsNull("text", isNull = true), IsNull("lang", isNull = false))))
    assert(err("{ documents(where: {t: {_gt: null}}) { doc_id } }")
      .contains("null"))
    assert(err("{ documents(where: {t: {_in: [1, null]}}) { doc_id } }")
      .contains("null"))
    assert(err("{ documents(where: {t: {_like: null}}) { doc_id } }")
      .contains("null"))
    val viaVar = GraphQl.parse(
      "query ($v: String) { documents(where: {text: {_eq: $v}}) " +
        "{ doc_id } }",
      variables = """{"v": null}""")
    assert(viaVar.map(_.where) ===
      Right(Some(IsNull("text", isNull = true))))
  }

  test("malformed queries are Left values with positions, never " +
    "exceptions") {
    assert(err("{ customer { unknown_rel { x } } }")
      .contains("no tracked relationship"))
    assert(err("{ customer(where: {c: {_zap: 1}}) { c_custkey } }")
      .contains("unknown operator '_zap'"))
    assert(err("{ customer(where: {c: {_eq: 1, _lt: 2}}) { c_custkey } }")
      .contains("exactly one comparison operator"))
    assert(err("{ customer(order_by: {c_custkey: sideways}) { c } }")
      .contains("expected asc or desc"))
    assert(err("{ customer { c_custkey }") .contains("expected"))
    assert(err("{ customer { orders { k: o_orderkey } " +
      "items { x } } }").contains("no tracked relationship"))
    assert(err("""{ customer { c_custkey @fmt(round: 2) } }""")
      .contains("take no arguments/directives"))
    assert(err("{ customer { orders(limit: 3) { k: o_orderkey } } }")
      .contains("limit needs orderBy"))
    assert(err("{ customer {} }").contains("selects no fields"))
    assert(err("x") .nonEmpty)
    assert(err("{ customer(limit: \"five\") { c_custkey } }")
      .contains("expected an integer"))
    assert(err("{ customer { c_custkey } } trailing")
      .contains("trailing content"))
  }

  test("operation variables: the client wire shape — declared in the " +
    "header, bound in the JSON map, resolved at value positions") {
    val q = """query Top($k: bigint!, $st: String!, $langs: [String!]) {
              |  customer(where: {_and: [{c_custkey: {_lte: $k}},
              |                          {c_mktsegment: {_nin: $langs}}]}) {
              |    c_custkey
              |    orders(where: {o_orderstatus: {_eq: $st}},
              |           order_by: {o_orderkey: asc}, limit: 2) {
              |      k: o_orderkey
              |    }
              |  }
              |}""".stripMargin
    val vars = """{"k": 50, "st": "O", "langs": ["MACHINERY"]}"""
    val r = GraphQl.parse(q, variables = vars)
      .getOrElse(fail("did not parse"))
    assert(r.where === Some(And(Lte("c_custkey", 50L),
      Nin("c_mktsegment", Seq("MACHINERY")))))
    assert(r.nested.head.where === Some(Eq("o_orderstatus", "O")))
    // a whole where-tree can arrive as an object variable
    val rw = GraphQl.parse(
      "query ($w: customer_bool_exp) { customer(where: $w) { c_custkey } }",
      variables = """{"w": {"c_custkey": {"_gte": 3}}}""")
      .getOrElse(fail("object variable did not parse"))
    assert(rw.where === Some(Gte("c_custkey", 3L)))
    def errV(q: String, vars: String): String =
      GraphQl.parse(q, variables = vars) match {
        case Left(m) => m
        case Right(r0) => fail(s"accepted as $r0")
      }
    assert(errV("query ($k: Int!) { customer { c_custkey } }", "{}")
      .contains("declared but not bound"))
    assert(errV("{ customer { c_custkey } }", """{"k": 1}""")
      .contains("bound but not declared"))
    assert(errV(
      "{ customer(where: {c_custkey: {_lte: $k}}) { c_custkey } }",
      """{}""").contains("undeclared variable $k"))
    assert(errV("{ customer { c_custkey } }", "[1]")
      .contains("variables: expected a JSON object"))
    // All-Variables-Used: a bound-but-unused variable is a dropped
    // filter waiting to return wrong rows
    assert(errV("query ($k: bigint!) { customer { c_custkey } }",
      """{"k": 50}""").contains("never used"))
    // malformed variables JSON is a Left, not a throw
    assert(errV("{ customer { c_custkey } }", "{oops")
      .contains("not valid JSON"))
    // order_by arriving AS a variable (JSON strings, not enums)
    val ro = GraphQl.parse(
      "query ($o: [customer_order_by!]) " +
        "{ customer(order_by: $o) { c_custkey } }",
      variables = """{"o": [{"c_custkey": "desc"}]}""")
      .getOrElse(fail("order_by variable did not parse"))
    assert(ro.orderBy === Seq(Order("c_custkey", desc = true)))
  }

  test("distinct_on parses (enum or list form) and runs identically " +
    "to the DSL q102") {
    val r = parsed("""
      { documents(distinct_on: lang,
                  order_by: [{lang: asc}, {n_chars: desc},
                             {doc_id: asc}]) {
          doc_id lang n_chars } }""")
    assert(r.distinctOn === Seq("lang"))
    val dir = sf("sf0.001")
    val viaGql = QueryBuilder.run(spark, dir, r).collect().toSeq
    val dsl = QueryBuilder.q102QbDistinctOn(spark, dir).collect().toSeq
    assert(viaGql.nonEmpty && viaGql === dsl)
    // order_by must lead with the distinct_on columns + tie tail
    assert(err("{ documents(distinct_on: lang, " +
      "order_by: {doc_id: asc}) { doc_id } }")
      .contains("must lead with the distinct_on"))
  }

  test("unknown or unsupported arguments are rejected, not silently " +
    "dropped (the wrong-rows failure mode)") {
    // per-relationship offset parses and lands on the Nested (a page
    // of each parent's children)
    val ro = parsed("{ customer { c_custkey orders(offset: 5, " +
      "order_by: {o_orderkey: asc}, limit: 3) { k: o_orderkey } } }")
    assert(ro.nested.head.offset === 5)
    assert(ro.nested.head.limit === Some(3))
    assert(err("{ customer(wher: {c_custkey: {_lte: 5}}) { c_custkey } }")
      .contains("unknown argument 'wher'"))
    // distinct_on without a leading order_by violates the Postgres
    // lead-the-order rule — rejected by the Request invariant, not
    // silently dropped
    assert(err("{ customer { c_custkey orders_aggregate(distinct_on: x)" +
      " { aggregate { count } } } }")
      .contains("must LEAD order_by"))
    assert(err("{ customer { c_custkey orders_aggregate @fmt(round: 1) " +
      "{ aggregate { count } } } }").contains("unknown directive @fmt"))
    assert(err("{ customer { c_custkey o: orders_aggregate " +
      "{ aggregate { count } } } }")
      .contains("aliases on aggregate relationships"))
    // an alias names ONE column — two fields under it would collide
    assert(err("{ customer { c_custkey orders_aggregate { aggregate " +
      "{ lo: min { o_totalprice o_orderkey } } } } }")
      .contains("alias on min covers one field"))
  }

  test("tokenizer details: commas optional, # comments, escapes, " +
    "unicode escapes, operation names") {
    val r = parsed("query Named # a comment\n" +
      "{ customer(where: {c_name: {_eq: \"a\\u0041\\n\\\"b\\\"\"}}) " +
      "{ c_custkey, c_name } }")
    assert(r.where === Some(Eq("c_name", "aA\n\"b\"")))
    assert(r.fields === Seq("c_custkey", "c_name"))
  }

  // ---- fragments -----------------------------------------------------

  test("a named fragment spread compiles to EXACTLY the inline request" +
    " — definition before or after the operation") {
    val inline = parsed("""
      {
        customer(where: {c_custkey: {_lte: 50}}) {
          c_custkey
          orders(order_by: {o_orderkey: asc}, limit: 2) {
            k: o_orderkey
            p: o_totalprice @fmt(round: 2, printf: "%.2f")
          }
        }
      }""")
    val before = parsed("""
      fragment OrderCols on orders {
        k: o_orderkey
        p: o_totalprice @fmt(round: 2, printf: "%.2f")
      }
      {
        customer(where: {c_custkey: {_lte: 50}}) {
          c_custkey
          orders(order_by: {o_orderkey: asc}, limit: 2) { ...OrderCols }
        }
      }""")
    val after = parsed("""
      {
        customer(where: {c_custkey: {_lte: 50}}) {
          c_custkey
          orders(order_by: {o_orderkey: asc}, limit: 2) { ...OrderCols }
        }
      }
      fragment OrderCols on orders {
        k: o_orderkey
        p: o_totalprice @fmt(round: 2, printf: "%.2f")
      }""")
    assert(before === inline)
    assert(after === inline)
  }

  test("fragments work at the root level, mix with inline selections, " +
    "and may spread other fragments") {
    val r = parsed("""
      fragment Keys on customer { c_custkey ...Name }
      fragment Name on customer { c_name }
      { customer { ...Keys orders { k: o_orderkey } } }""")
    assert(r.fields === Seq("c_custkey", "c_name"))
    assert(r.nested.map(_.as) === Seq("orders"))
  }

  test("an inline fragment on the enclosing table splices its " +
    "selections; a relationship inside an inline fragment still " +
    "resolves from the schema") {
    val r = parsed("""
      { customer {
          c_custkey
          ... on customer { c_name orders { k: o_orderkey } }
      } }""")
    assert(r.fields === Seq("c_custkey", "c_name"))
    assert(r.nested.map(_.table) === Seq("orders"))
  }

  test("fragment error surface: undefined, unused, duplicate, " +
    "wrong type condition, cycles, stray dots") {
    assert(err("{ customer { c_custkey ...Nope } }")
      .contains("undefined fragment 'Nope'"))
    assert(err("fragment F on customer { c_name } " +
      "{ customer { c_custkey } }")
      .contains("defined but never spread"))
    assert(err("fragment F on customer { c_name } " +
      "fragment F on customer { c_custkey } " +
      "{ customer { ...F } }").contains("defined twice"))
    assert(err("fragment F on orders { o_orderkey } " +
      "{ customer { ...F } }")
      .contains("is on 'orders' but is spread inside a 'customer'"))
    assert(err("{ customer { ... on orders { o_orderkey } } }")
      .contains("type condition must match"))
    // A→B→A: the splice cap turns the cycle into a parse error, not a
    // hang (fragment bodies are captured textually, so the cycle only
    // surfaces at expansion)
    assert(err("fragment A on customer { ...B } " +
      "fragment B on customer { ...A } " +
      "{ customer { ...A } }").contains("cyclic"))
    assert(err("{ customer { c_custkey .. } }").contains("'...'"))
    assert(err("fragment on on customer { c_name } " +
      "{ customer { ...on } }").contains("'on' cannot name"))
  }

  test("a fragment body participates in variable use-tracking (a " +
    "variable used only inside a fragment is 'used')") {
    val r = GraphQl.parse(
      """query ($cap: bigint!) {
        |  customer { c_custkey ...F }
        |}
        |fragment F on customer {
        |  orders(where: {o_orderkey: {_lte: $cap}},
        |         order_by: {o_orderkey: asc}) { k: o_orderkey }
        |}""".stripMargin,
      variables = """{"cap": 99}""")
    assert(r.isRight, r)
    assert(r.toOption.get.nested.head.where === Some(Lte("o_orderkey", 99L)))
  }
}
