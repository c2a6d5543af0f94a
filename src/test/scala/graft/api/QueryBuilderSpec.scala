package graft.api

import graft.SparkSpec
import graft.api.QueryBuilder._
import org.apache.spark.sql.DataFrame

/** The Hasura-analog front end: builder-compiled requests must be
  * row-identical to the handwritten operator compositions they model
  * (q3 filter surface, q4 aggregate relationship, q40 nested response)
  * — and the compiled plan must keep the handwritten plans' scale
  * properties (filter pushdown). */
class QueryBuilderSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case null => null
      case x => x
    }).toSeq

  test("filter request (booleans + like + order/offset/limit) is " +
    "row-identical to the handwritten q3, and the predicate pushes " +
    "to the scan") {
    val dir = sf("sf0.001")
    val built = QueryBuilder.q90QbFilter(spark, dir)
    assert(rows(built) ===
      rows(graft.queries.RelationalQueries.q3FilterCombo(spark, dir)))
    built.collect()
    val plan = built.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters"))
      .mkString
    assert(pushed.contains("c_acctbal") || pushed.contains("Or("),
      s"where-tree not pushed to the scan: $pushed")
  }

  test("aggregate relationship request is row-identical to the " +
    "handwritten q4 (left join keeps customers without orders)") {
    val dir = sf("sf0.001")
    val built = QueryBuilder.run(spark, dir, Request(
      table = "customer",
      fields = Seq("c_custkey", "c_name"),
      orderBy = Seq(Order("c_custkey")),
      aggRels = Seq(AggRel(
        table = "orders", childKey = "o_custkey", parentKey = "c_custkey",
        aggs = Seq(CountOf("o_orderkey", "n_orders"),
          SumOf("o_totalprice", "total"))))))
    assert(rows(built) ===
      rows(graft.queries.RelationalQueries.q4JoinAgg(spark, dir)))
  }

  test("nested relationship request is row-identical to the " +
    "handwritten q40 (sorted JSON child arrays)") {
    val dir = sf("sf0.001")
    assert(rows(QueryBuilder.q91QbNested(spark, dir)) ===
      rows(graft.queries.RelationalQueries.q40Nested(spark, dir)))
  }

  test("similarToRegex: % and _ translate, '.' stays literal, escapes " +
    "and regex metas pass through, matches are FULL-length") {
    import java.util.regex.Pattern
    def m(pat: String, s: String): Boolean =
      Pattern.compile(QueryBuilder.similarToRegex(pat)).matcher(s).find()
    // alternation (a regex meta SIMILAR TO shares)
    assert(m("e(n|s)", "en") && m("e(n|s)", "es"))
    // full-match semantics: no partial hits
    assert(!m("e(n|s)", "xen") && !m("e(n|s)", "ens"))
    // LIKE wildcards
    assert(m("%a_b%", "xxacbyy") && !m("%a_b%", "ab"))
    // '.' is a LITERAL in SIMILAR TO (unlike regex)
    assert(m("a.b", "a.b") && !m("a.b", "axb"))
    // backslash escapes a wildcard to its literal
    assert(m("100\\%", "100%") && !m("100\\%", "1000"))
    // character class + repetition pass through
    assert(m("src[0-9]+", "src42") && !m("src[0-9]+", "src"))
    // inside a bracket expression, SIMILAR TO metachars are LITERAL
    // (Postgres): [a_] matches '_' (not 'any char'), [%] matches '%'
    assert(m("[a_]", "_") && m("[a_]", "a") && !m("[a_]", "."))
    assert(m("[%]", "%") && !m("[%]", "x"))
    assert(m("a[.]b", "a.b") && !m("a[.]b", "axb"))
    // '^' and '$' are LITERALS in SIMILAR TO — unescaped they were
    // Java anchors, making 'a$b' match NOTHING at all
    assert(m("a$b", "a$b") && !m("a$b", "ab"))
    assert(m("a^b", "a^b") && !m("a^b", "ab"))
    // wildcards span NEWLINES (Java's '.' excludes \n; SIMILAR TO's
    // % and _ do not)
    assert(m("%b", "a\nb"))
    assert(m("a_b", "a\nb"))
  }

  test("programmatic-API guards: AggRel joinType is inner|left " +
    "(a right/full join surfaces rows for filtered-out parents); " +
    "orderAgg hidden names must not duplicate or shadow table " +
    "columns (withColumn silently replaces on collision)") {
    import spark.implicits._
    val e1 = intercept[IllegalArgumentException](
      AggRel("orders", "o_custkey", "c_custkey",
        Seq(CountAll("count")), joinType = "right"))
    assert(e1.getMessage.contains("inner|left"))
    val dir = sf("sf0.001")
    def req(oas: Seq[OrderAgg]) = Request("customer", Seq("c_custkey"),
      orderBy = Seq(Order(oas.head.as), Order("c_custkey")),
      orderAggs = oas)
    val e2 = intercept[IllegalArgumentException](
      QueryBuilder.run(spark, dir, req(Seq(
        OrderAgg("__oa_0", "orders", "o_custkey", "c_custkey",
          CountAll("__oa_0_v")),
        OrderAgg("__oa_0", "orders", "o_custkey", "c_custkey",
          MaxOf("o_totalprice", "__oa_0_w"))))))
    assert(e2.getMessage.contains("duplicate hidden name"))
    val e3 = intercept[IllegalArgumentException](
      QueryBuilder.run(spark, dir, req(Seq(
        OrderAgg("c_acctbal", "orders", "o_custkey", "c_custkey",
          CountAll("__oa_0_v"))))))
    assert(e3.getMessage.contains("collide"))
  }

  test("a sub-relationship alias that SHADOWS a child order field no " +
    "longer breaks the per-parent slice window — order columns " +
    "resolve against the PRE-JOIN child like the partition columns") {
    val dir = sf("sf0.001")
    val req = Request("customer", Seq("c_custkey"),
      where = Some(Eq("c_custkey", 1L)),
      nested = Seq(Nested("orders", "orders", "o_custkey",
        "c_custkey",
        fields = Seq(NestedField("o_orderkey", "o_orderkey")),
        orderBy = Seq(Order("o_orderstatus"), Order("o_orderkey")),
        limit = Some(2),
        subs = Seq(Nested("o_orderstatus", "lineitem", "l_orderkey",
          "o_orderkey",
          fields = Seq(NestedField("l_linenumber", "l_linenumber")))))))
    val got = QueryBuilder.run(spark, dir, req).collect()
    assert(got.length === 1)
  }

  test("regex/similar filters run through the three-front-end compile " +
    "path with SQL three-valued logic on nulls") {
    import spark.implicits._
    val df = Seq(
      (1L, "en", "src1"), (2L, "es", "src8"), (3L, "zh", "src2"),
      (4L, "en", null)).toDF("doc_id", "lang", "source")
    def ids(w: BoolExp): Seq[Long] =
      QueryBuilder.runRoot(df, Request("t", Seq("doc_id"),
        where = Some(w), orderBy = Seq(Order("doc_id"))))
        .collect().map(_.getLong(0)).toSeq
    assert(ids(Regex("lang", "^e")) === Seq(1L, 2L, 4L))
    assert(ids(Regex("source", "^SRC[0-9]", caseInsensitive = true)) ===
      Seq(1L, 2L, 3L))
    // a null source is neither matched nor NOT-matched (three-valued)
    assert(ids(Nregex("source", "8$")) === Seq(1L, 3L))
    assert(ids(Similar("lang", "e(n|s)")) === Seq(1L, 2L, 4L))
    assert(ids(Nsimilar("source", "src[18]")) === Seq(3L))
  }

  test("malformed regex patterns reject at construction, driver-side") {
    val e = intercept[IllegalArgumentException](Regex("lang", "["))
    assert(e.getMessage.contains("not a valid regex"))
    intercept[IllegalArgumentException](Nregex("lang", "(unclosed"))
    intercept[IllegalArgumentException](Similar("lang", "a{2,1}"))
    // ...and through the GraphQL front end the reject is a parse error
    GraphQl.parse("{ documents(where: {lang: {_regex: \"[\"}}) { doc_id } }")
      match {
      case Left(m) => assert(m.contains("not a valid regex"))
      case Right(r) => fail(s"parsed: $r")
    }
  }

  test("relationship predicates inside RELATIONSHIP where arguments " +
    "decorrelate too (orders filtered by their items)") {
    import org.apache.spark.sql.functions.col
    val dir = sf("sf0.001")
    // customers with their count of orders CONTAINING a q>=49 item
    val got = QueryBuilder.run(spark, dir, Request("customer",
      Seq("c_custkey"),
      orderBy = Seq(Order("c_custkey")), limit = Some(50),
      aggRels = Seq(AggRel("orders", "o_custkey", "c_custkey",
        Seq(CountOf("o_orderkey", "n_hot")),
        where = Some(RelPred("lineitem", "l_orderkey", "o_orderkey",
          Gte("l_quantity", 49.0)))))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val orders = graft.Tables.load(spark, dir, "orders")
    val items = graft.Tables.load(spark, dir, "lineitem")
    val hot = orders.join(
      items.filter(col("l_quantity") >= 49.0)
        .select(col("l_orderkey").as("o_orderkey")),
      Seq("o_orderkey"), "left_semi")
    val want = graft.Tables.load(spark, dir, "customer")
      .join(hot.groupBy(col("o_custkey").as("c_custkey"))
        .agg(org.apache.spark.sql.functions.count("o_orderkey")
          .as("n_hot")), Seq("c_custkey"), "left")
      .select(col("c_custkey"),
        org.apache.spark.sql.functions.coalesce(col("n_hot"),
          org.apache.spark.sql.functions.lit(0L)).as("n_hot"))
      .orderBy("c_custkey").limit(50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want)
    assert(got.exists(_._2 > 0L), "fixture self-check: no hot orders")
  }

  test("relationship predicates: EXISTS / NOT EXISTS / OR-mixed " +
    "decorrelation equals handwritten semi/anti joins") {
    import org.apache.spark.sql.functions.col
    val dir = sf("sf0.001")
    val cust = graft.Tables.load(spark, dir, "customer")
    val ords = graft.Tables.load(spark, dir, "orders")
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.collect().map(_.getLong(0)).toSeq
    val exists = RelPred("orders", "o_custkey", "c_custkey",
      Gt("o_totalprice", 300000.0))
    // EXISTS ≡ left_semi
    val got = ids(QueryBuilder.run(spark, dir, Request("customer",
      Seq("c_custkey"), where = Some(exists),
      orderBy = Seq(Order("c_custkey")))))
    val want = ids(cust.join(
      ords.filter(col("o_totalprice") > 300000.0)
        .select(col("o_custkey").as("c_custkey")),
      Seq("c_custkey"), "left_semi")
      .select("c_custkey").orderBy("c_custkey"))
    assert(got === want && got.nonEmpty)
    // NOT EXISTS ≡ left_anti
    val gotNot = ids(QueryBuilder.run(spark, dir, Request("customer",
      Seq("c_custkey"), where = Some(Not(exists)),
      orderBy = Seq(Order("c_custkey")))))
    val wantNot = ids(cust.join(
      ords.filter(col("o_totalprice") > 300000.0)
        .select(col("o_custkey").as("c_custkey")),
      Seq("c_custkey"), "left_anti")
      .select("c_custkey").orderBy("c_custkey"))
    assert(gotNot === wantNot && gotNot.nonEmpty)
    assert((got.toSet & gotNot.toSet).isEmpty &&
      got.length + gotNot.length === cust.count())
    // OR with a column predicate — inexpressible as one join type
    val gotOr = ids(QueryBuilder.run(spark, dir, Request("customer",
      Seq("c_custkey"),
      where = Some(Or(exists, Eq("c_mktsegment", "MACHINERY"))),
      orderBy = Seq(Order("c_custkey")))))
    val machinery = ids(cust.filter(col("c_mktsegment") === "MACHINERY")
      .select("c_custkey"))
    assert(gotOr.toSet === (got.toSet ++ machinery))
    // a relationship predicate composes with relationship SELECTIONS
    val withNested = QueryBuilder.run(spark, dir, Request("customer",
      Seq("c_custkey"), where = Some(exists),
      orderBy = Seq(Order("c_custkey")),
      aggRels = Seq(AggRel("orders", "o_custkey", "c_custkey",
        Seq(CountOf("o_orderkey", "n_orders"))))))
    assert(ids(withNested) === want)
    // runRoot cannot load child tables — loud, not wrong rows
    val e = intercept[IllegalArgumentException](
      QueryBuilder.runRoot(cust, Request("customer", Seq("c_custkey"),
        where = Some(exists))))
    assert(e.getMessage.contains("relationship predicates"))
    // and the leaf itself has no row-local column form
    assert(intercept[IllegalArgumentException](
      cust.filter(exists.toColumn)).getMessage.contains("row-local"))
  }

  test("remaining operator surface: neq/gt/lt/in/not filters and " +
    "min/max/avg aggregates compose correctly") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val built = QueryBuilder.run(spark, dir, Request(
      table = "customer",
      fields = Seq("c_custkey"),
      where = Some(And(
        Not(Eq("c_mktsegment", "BUILDING")),
        In("c_mktsegment", Seq("AUTOMOBILE", "MACHINERY", "FURNITURE")),
        Gt("c_acctbal", 0), Lt("c_custkey", 100),
        Neq("c_name", ""))),
      orderBy = Seq(Order("c_custkey", desc = true)),
      limit = Some(10)))
    val hand = graft.Tables.load(spark, dir, "customer")
      .filter($"c_mktsegment" =!= "BUILDING" &&
        $"c_mktsegment".isin("AUTOMOBILE", "MACHINERY", "FURNITURE") &&
        $"c_acctbal" > 0 && $"c_custkey" < 100 && $"c_name" =!= "")
      .select("c_custkey").orderBy($"c_custkey".desc).limit(10)
    assert(rows(built) === rows(hand))
    assert(built.count() > 0, "fixture filter selected nothing")

    val aggs = QueryBuilder.run(spark, dir, Request(
      table = "nation",
      fields = Seq("n_nationkey"),
      orderBy = Seq(Order("n_nationkey")),
      aggRels = Seq(AggRel(
        table = "supplier", childKey = "s_nationkey",
        parentKey = "n_nationkey",
        aggs = Seq(MinOf("s_acctbal", "lo"), MaxOf("s_acctbal", "hi"),
          AvgOf("s_acctbal", "mean"))))))
    assert(aggs.columns.toSeq === Seq("n_nationkey", "lo", "hi", "mean"))
    assert(aggs.count() > 0)
  }

  test("two-level nesting request is row-identical to the handwritten " +
    "q49 (customer{orders{lineitems}} compiled bottom-up)") {
    val dir = sf("sf0.001")
    assert(rows(QueryBuilder.q97QbNestedDeep(spark, dir)) ===
      rows(graft.queries.RelationalQueries.q49NestedDeep(spark, dir)))
  }

  test("multiple relationships on one root compose without " +
    "cross-multiplying fan-outs") {
    import spark.implicits._
    val dir = sf("sf0.001")
    // nation has BOTH suppliers and customers: a flat two-child join
    // would count |suppliers| x |customers| rows per nation; the
    // pre-aggregated compile must report each child's true count
    val built = QueryBuilder.run(spark, dir, Request(
      table = "nation",
      fields = Seq("n_nationkey"),
      orderBy = Seq(Order("n_nationkey")),
      nested = Seq(Nested(
        as = "suppliers", table = "supplier",
        childKey = "s_nationkey", parentKey = "n_nationkey",
        fields = Seq(NestedField("s", "s_suppkey")))),
      aggRels = Seq(AggRel(
        table = "customer", childKey = "c_nationkey",
        parentKey = "n_nationkey",
        aggs = Seq(CountOf("c_custkey", "n_cust"))))))
    def lv(r: org.apache.spark.sql.Row, i: Int): Long =
      r.getAs[Number](i).longValue
    val supCounts = graft.Tables.load(spark, dir, "supplier")
      .groupBy($"s_nationkey").count()
      .collect().map(r => lv(r, 0) -> r.getLong(1)).toMap
    val custCounts = graft.Tables.load(spark, dir, "customer")
      .groupBy($"c_nationkey").count()
      .collect().map(r => lv(r, 0) -> r.getLong(1)).toMap
    val got = built.collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val nk = lv(r, 0)
      // the suppliers array holds exactly this nation's suppliers...
      val nSup = "\\{".r.findAllIn(r.getString(1)).length
      assert(nSup === supCounts(nk).toInt, s"nation $nk supplier array")
      // ...and the customer count is the true count, not count x |sup|
      assert(r.getLong(2) === custCounts.getOrElse(nk, 0L),
        s"nation $nk customer count")
    }
    // the nested join is inner (q40/q49's shape), the aggregate join is
    // left: exactly the supplier-bearing nations answer
    assert(got.map(lv(_, 0)).toSet === supCounts.keySet)
  }

  test("left-attached relationships keep childless rows with EMPTY " +
    "arrays at every level (Hasura semantics; inner drops them)") {
    import spark.implicits._
    val dir = sf("sf0.001")
    def req(jt: String) = Request(
      table = "region",
      fields = Seq("r_regionkey"),
      orderBy = Seq(Order("r_regionkey")),
      nested = Seq(Nested(
        as = "nations", table = "nation",
        childKey = "n_regionkey", parentKey = "r_regionkey",
        fields = Seq(NestedField("nk", "n_nationkey")),
        joinType = jt,
        subs = Seq(Nested(
          as = "sups", table = "supplier",
          childKey = "s_nationkey", parentKey = "n_nationkey",
          fields = Seq(NestedField("sk", "s_suppkey")),
          joinType = jt)))))
    // sf0.001 has 10 suppliers across 25 nations: many nations have none
    val supNations = graft.Tables.load(spark, dir, "supplier")
      .select($"s_nationkey").distinct().count()
    assert(supNations < 25, "fixture grew suppliers everywhere")
    // inner: only supplier-bearing nations survive into the arrays
    val inner = QueryBuilder.run(spark, dir, req("inner")).collect()
    val innerNations = inner.map(r =>
      "\"nk\"".r.findAllIn(r.getString(1)).length).sum
    assert(innerNations === supNations,
      "inner attach should keep only nations WITH suppliers")
    // left: all 5 regions, all 25 nations; supplier-less nations carry
    // an empty sups array instead of vanishing
    val left = QueryBuilder.run(spark, dir, req("left")).collect()
    assert(left.length === 5)
    val leftNations = left.map(r =>
      "\"nk\"".r.findAllIn(r.getString(1)).length).sum
    assert(leftNations === 25,
      "left attach must keep nations with zero suppliers")
    assert(left.exists(_.getString(1).contains("\"sups\":[]")),
      "childless middle level should render an empty array")
  }

  test("request validation fails loudly, not at execution time") {
    intercept[IllegalArgumentException](
      Request("customer", fields = Nil))
    intercept[IllegalArgumentException](And())
    intercept[IllegalArgumentException](
      Nested("x", "orders", "o_custkey", "c_custkey", fields = Nil))
    // a limited child without an order is nondeterministic — rejected
    intercept[IllegalArgumentException](
      Nested("x", "orders", "o_custkey", "c_custkey",
        fields = Seq(NestedField("k", "o_orderkey")), limit = Some(3)))
    intercept[IllegalArgumentException](
      AggRel("orders", "o_custkey", "c_custkey",
        aggs = Seq(CountOf("o_orderkey", "n")), limit = Some(3)))
    // an offset child without an order is the same nondeterminism
    intercept[IllegalArgumentException](
      Nested("x", "orders", "o_custkey", "c_custkey",
        fields = Seq(NestedField("k", "o_orderkey")), offset = 2))
    // distinct_on must LEAD order_by and leave a tie-break tail
    intercept[IllegalArgumentException](
      Nested("x", "orders", "o_custkey", "c_custkey",
        fields = Seq(NestedField("k", "o_orderkey")),
        orderBy = Seq(Order("o_orderkey")),
        distinctOn = Seq("o_orderstatus")))
    intercept[IllegalArgumentException](
      AggRel("orders", "o_custkey", "c_custkey",
        aggs = Seq(CountOf("o_orderkey", "n")),
        orderBy = Seq(Order("o_orderstatus")),
        distinctOn = Seq("o_orderstatus")))
  }

  test("per-relationship distinct_on + offset/limit (q103's shape): " +
    "one representative per (parent, group), then a per-parent page — " +
    "verified against a local replay") {
    val dir = sf("sf0.001")
    import org.apache.spark.sql.functions.col
    val built = QueryBuilder.run(spark, dir, Request(
      table = "customer",
      fields = Seq("c_custkey"),
      where = Some(Lte("c_custkey", 80)),
      orderBy = Seq(Order("c_custkey")),
      nested = Seq(Nested(
        as = "orders", table = "orders",
        childKey = "o_custkey", parentKey = "c_custkey",
        fields = Seq(NestedField("k", "o_orderkey"),
          NestedField("st", "o_orderstatus")),
        orderBy = Seq(Order("o_orderstatus"),
          Order("o_totalprice", desc = true), Order("o_orderkey")),
        distinctOn = Seq("o_orderstatus"),
        offset = 1, limit = Some(2)))))
    val got = built.collect().map(r => r.getLong(0) -> r.getString(1))
    val orders = graft.Tables.load(spark, dir, "orders")
      .select("o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val expect = orders.groupBy(_._1).flatMap { case (ck, os) =>
      // DISTINCT ON: best (price desc, key) per status…
      val reps = os.groupBy(_._3).values
        .map(_.minBy(o => (-o._4, o._2))).toSeq
      // …then the page: order by (status, price desc, key), skip 1 take 2
      val page = reps.sortBy(o => (o._3, -o._4, o._2)).slice(1, 3)
      if (page.isEmpty) None // inner attach drops parents left empty
      else Some(ck -> page.map(o => s"""{"k":${o._2},"st":"${o._3}"}""")
        .mkString("[", ",", "]"))
    }.filter(_._1 <= 80)
    assert(got.length === expect.size)
    got.foreach { case (ck, js) => assert(expect(ck) === js,
      s"customer $ck") }
    // pages really skipped a representative: no parent shows its
    // alphabetically-first status when it has >1 distinct status
    val multi = orders.filter(_._1 <= 80).groupBy(_._1)
      .filter(_._2.map(_._3).distinct.length > 1)
    multi.foreach { case (ck, os) =>
      val first = os.map(_._3).distinct.sorted.head
      got.find(_._1 == ck).foreach { case (_, js) =>
        assert(!js.contains(s""""st":"$first""""), s"customer $ck kept " +
          "its first status — offset did not skip the first rep")
      }
    }
  }

  test("per-relationship where/order_by/limit: the child's own filter " +
    "prunes before the fold, arrays come back in the child's order, " +
    "and the top-n cut is per parent — verified against a local replay") {
    val dir = sf("sf0.001")
    import org.apache.spark.sql.functions.col
    val built = QueryBuilder.q98QbChildArgs(spark, dir)
    val got = built.collect().map(r => r.getLong(0) -> r.getString(1))
    // local replay of the Hasura semantics: filter children, order,
    // take 3 per parent, render like q40's wire shape
    val orders = graft.Tables.load(spark, dir, "orders")
      .filter(col("o_orderstatus") === "O")
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expect = orders.groupBy(_._1).map { case (ck, os) =>
      val top = os.sortBy(o => (-o._3, o._2)).take(3)
      ck -> top.map(o =>
        s"""{"k":${o._2},"p":"${"%.2f".formatLocal(java.util.Locale.ROOT,
          BigDecimal(o._3).setScale(2,
            BigDecimal.RoundingMode.HALF_UP).toDouble)}"}""")
        .mkString("[", ",", "]")
    }.filter(_._1 <= 50)
    assert(got.length === expect.size)
    got.foreach { case (ck, js) =>
      assert(expect(ck) === js, s"customer $ck")
    }
    // every array is capped at 3
    assert(got.forall(_._2.count(_ == '{') <= 3))
  }

  test("aggregate relationship with its own where + top-n: aggregates " +
    "see only the filtered top children per parent") {
    val dir = sf("sf0.001")
    val built = QueryBuilder.run(spark, dir, Request(
      table = "customer",
      fields = Seq("c_custkey"),
      where = Some(Lte("c_custkey", 30)),
      orderBy = Seq(Order("c_custkey")),
      aggRels = Seq(AggRel(
        table = "orders", childKey = "o_custkey", parentKey = "c_custkey",
        aggs = Seq(CountOf("o_orderkey", "n_open"),
          SumOf("o_totalprice", "top2_sum")),
        where = Some(Eq("o_orderstatus", "O")),
        orderBy = Seq(Order("o_totalprice", desc = true),
          Order("o_orderkey")),
        limit = Some(2)))))
    import org.apache.spark.sql.functions.col
    val orders = graft.Tables.load(spark, dir, "orders")
      .filter(col("o_orderstatus") === "O")
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    built.collect().foreach { r =>
      val ck = r.getLong(0)
      val top2 = orders.getOrElse(ck, Array.empty[(Long, Long, Double)])
        .sortBy(o => (-o._3, o._2)).take(2)
      assert(r.getLong(1) === top2.length.toLong, s"count for $ck")
      val want = BigDecimal(top2.map(_._3).sum)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(2) - want) < 1e-6, s"sum for $ck")
    }
  }

  test("null order keys: Hasura/Postgres placement (asc last, desc " +
    "first) and a transitive array comparator — deterministic arrays") {
    // the fixture tables have no nulls, so build a tiny table dir
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("qb_nulls")
      .toString
    val parent = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L), Row(2L)),
      StructType(Seq(StructField("c_custkey", LongType))))
    val child = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, 10L, java.lang.Double.valueOf(5.0)),
        Row(1L, 11L, null.asInstanceOf[java.lang.Double]),
        Row(1L, 12L, java.lang.Double.valueOf(7.0)),
        Row(1L, 13L, null.asInstanceOf[java.lang.Double]),
        Row(2L, 20L, java.lang.Double.valueOf(1.0))),
      StructType(Seq(StructField("o_custkey", LongType),
        StructField("o_orderkey", LongType),
        StructField("price", DoubleType))))
    parent.write.parquet(s"$dir/customer.parquet")
    child.write.parquet(s"$dir/orders.parquet")
    def arrays(desc: Boolean): Map[Long, String] =
      QueryBuilder.run(spark, dir, Request(
        table = "customer",
        fields = Seq("c_custkey"),
        orderBy = Seq(Order("c_custkey")),
        nested = Seq(Nested(
          as = "orders", table = "orders",
          childKey = "o_custkey", parentKey = "c_custkey",
          fields = Seq(NestedField("k", "o_orderkey")),
          orderBy = Seq(Order("price", desc = desc), Order("o_orderkey"))))))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // desc: nulls FIRST (11 then 13 by tie-break), then 7.0, 5.0
    assert(arrays(desc = true)(1L) ===
      """[{"k":11},{"k":13},{"k":12},{"k":10}]""")
    // asc: values first, nulls LAST
    assert(arrays(desc = false)(1L) ===
      """[{"k":10},{"k":12},{"k":11},{"k":13}]""")
    // top-n membership follows the same placement: desc limit 2 keeps
    // the two null rows (nulls first), asc limit 2 keeps the values
    def topn(desc: Boolean): String =
      QueryBuilder.run(spark, dir, Request(
        table = "customer",
        fields = Seq("c_custkey"),
        where = Some(Eq("c_custkey", 1L)),
        nested = Seq(Nested(
          as = "orders", table = "orders",
          childKey = "o_custkey", parentKey = "c_custkey",
          fields = Seq(NestedField("k", "o_orderkey")),
          orderBy = Seq(Order("price", desc = desc), Order("o_orderkey")),
          limit = Some(2))))).collect().head.getString(1)
    assert(topn(desc = true) === """[{"k":11},{"k":13}]""")
    assert(topn(desc = false) === """[{"k":10},{"k":12}]""")
    // NON-default placements (r15): the in-array comparator honors
    // the spelled rule against real nulls — asc_nulls_first leads
    // with the null rows, desc_nulls_last trails with them
    def arraysN(desc: Boolean, nullsFirst: Boolean): String =
      QueryBuilder.run(spark, dir, Request(
        table = "customer",
        fields = Seq("c_custkey"),
        where = Some(Eq("c_custkey", 1L)),
        nested = Seq(Nested(
          as = "orders", table = "orders",
          childKey = "o_custkey", parentKey = "c_custkey",
          fields = Seq(NestedField("k", "o_orderkey")),
          orderBy = Seq(Order("price", desc, Some(nullsFirst)),
            Order("o_orderkey"))))))
        .collect().head.getString(1)
    assert(arraysN(desc = false, nullsFirst = true) ===
      """[{"k":11},{"k":13},{"k":10},{"k":12}]""")
    assert(arraysN(desc = true, nullsFirst = false) ===
      """[{"k":12},{"k":10},{"k":11},{"k":13}]""")
    // the per-parent top-n cut follows the same placement (the
    // row_number window rides Order.toColumn natively)
    def topnN(desc: Boolean, nullsFirst: Boolean): String =
      QueryBuilder.run(spark, dir, Request(
        table = "customer",
        fields = Seq("c_custkey"),
        where = Some(Eq("c_custkey", 1L)),
        nested = Seq(Nested(
          as = "orders", table = "orders",
          childKey = "o_custkey", parentKey = "c_custkey",
          fields = Seq(NestedField("k", "o_orderkey")),
          orderBy = Seq(Order("price", desc, Some(nullsFirst)),
            Order("o_orderkey")),
          limit = Some(2))))).collect().head.getString(1)
    assert(topnN(desc = false, nullsFirst = true) ===
      """[{"k":11},{"k":13}]""")
    assert(topnN(desc = true, nullsFirst = false) ===
      """[{"k":12},{"k":10}]""")
  }

  test("JSONB family: key existence and TYPED flat containment over " +
    "JSON text; garbage rows answer NULL (filtered) and never match " +
    "negations either") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"k": 69, "m": "x"}"""),
      (2L, """{"k": 70}"""),
      (3L, """{"m": "x"}"""),
      (4L, "not json"),
      (5L, "[1,2]"),
      (6L, null.asInstanceOf[String]),
      (7L, "{}"),
      (8L, """{"k": null}"""),
      (9L, """{"k": "69"}"""),
      (10L, """{"k": 69.0}""")
    ).toDF("id", "props")
    def ids(e: BoolExp): Seq[Long] =
      df.filter(e.toColumn).select("id").collect()
        .map(_.getLong(0)).toSeq.sorted
    // a JSON-null value still HAS the key (jsonb ? semantics)
    assert(ids(HasKey("props", "k")) === Seq(1L, 2L, 8L, 9L, 10L))
    // three-valued: garbage/null/array rows are NULL under the key
    // check, so NOT keeps them out too — only real objects negate
    assert(ids(Not(HasKey("props", "k"))) === Seq(3L, 7L))
    assert(ids(HasKeysAny("props", Seq("k", "m"))) ===
      Seq(1L, 2L, 3L, 8L, 9L, 10L))
    assert(ids(HasKeysAll("props", Seq("k", "m"))) === Seq(1L))
    // TYPED containment (jsonb @>): the string "69" never matches the
    // number literal 69; numbers match NUMERICALLY across JSON
    // spellings (69.0 does)
    assert(ids(JsonContains("props", Seq("k" -> 69L))) === Seq(1L, 10L))
    assert(ids(JsonContains("props", Seq("k" -> "69"))) === Seq(9L))
    // int64 EXACTNESS past 2^53 (jsonb numerics are exact): the two
    // adjacent integers are distinct — a double round-trip would
    // match both (ADVICE r15, fixed r17)
    val big = Seq(
      (1L, s"""{"k": ${(1L << 53) + 1}}"""),
      (2L, s"""{"k": ${1L << 53}}""")).toDF("id", "props")
    def bids(e: BoolExp): Seq[Long] =
      big.filter(e.toColumn).select("id").collect()
        .map(_.getLong(0)).toSeq.sorted
    assert(bids(JsonContains("props", Seq("k" -> ((1L << 53) + 1))))
      === Seq(1L))
    assert(bids(JsonContains("props", Seq("k" -> (1L << 53))))
      === Seq(2L))
    assert(ids(JsonContains("props",
      Seq("k" -> 69L, "m" -> "x"))) === Seq(1L))
    // contained_in: absent keys pass, value mismatches (k=70, string
    // "69") fail TYPED, the empty object is a subset of anything —
    // and a PRESENT key holding JSON null never equals a scalar
    // (jsonb: {"k": null} <@ {"k": 69} is false)
    assert(ids(JsonContainedIn("props",
      Seq("k" -> 69L, "m" -> "x", "z" -> 1L))) ===
      Seq(1L, 3L, 7L, 10L))
    assert(ids(JsonContainedIn("props", Nil)) === Seq(7L))
    // loud constructions: non-name keys, empty/null containment
    intercept[IllegalArgumentException](HasKey("props", "a b"))
    intercept[IllegalArgumentException](JsonContains("props", Nil))
    intercept[IllegalArgumentException](
      JsonContains("props", Seq("k" -> null)))
    intercept[IllegalArgumentException](HasKeysAny("props", Nil))
    intercept[IllegalArgumentException](
      JsonContains("props", Seq("k" -> Seq(1, 2))))
  }

  test("order_by ties inside relationship arrays render in canonical " +
    "payload order — collect_list arrival order never leaks through") {
    val dir = sf("sf0.001")
    // o_orderstatus is heavily non-unique: a request ordering ONLY by
    // it leaves most of each array tied. Tied rows must fall through
    // to the canonical ascending payload comparison (here: k asc),
    // run-to-run deterministic without a user-spelled tie-break.
    val built = QueryBuilder.run(spark, dir, Request(
      table = "customer",
      fields = Seq("c_custkey"),
      where = Some(Lte("c_custkey", 40)),
      orderBy = Seq(Order("c_custkey")),
      nested = Seq(Nested("os", "orders", "o_custkey", "c_custkey",
        Seq(NestedField("k", "o_orderkey"),
          NestedField("s", "o_orderstatus")),
        orderBy = Seq(Order("o_orderstatus"))))))
    val got = built.collect().map(r => r.getLong(0) -> r.getString(1))
    import org.apache.spark.sql.functions.col
    val orders = graft.Tables.load(spark, dir, "orders")
      .filter(col("o_custkey") <= 40)
      .select("o_custkey", "o_orderkey", "o_orderstatus")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val expect = orders.groupBy(_._1).map { case (ck, os) =>
      ck -> os.sortBy(o => (o._3, o._2)).map(o =>
        s"""{"k":${o._2},"s":"${o._3}"}""").mkString("[", ",", "]")
    }
    assert(got.nonEmpty && got.length === expect.size)
    got.foreach { case (ck, js) =>
      assert(expect(ck) === js, s"customer $ck")
    }
  }
  test("sibling relationships at depth are fan-out independent: each " +
    "sibling's array equals its single-sub twin's, element for element") {
    val dir = sf("sf0.001")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    // both siblings attach LEFT so the parent-order set is identical
    // across arms (an INNER items arm would drop lineitem-less orders
    // from the level — the documented q40/q49 default)
    val items = Nested(
      as = "items", table = "lineitem",
      childKey = "l_orderkey", parentKey = "o_orderkey",
      fields = Seq(NestedField("ln", "l_linenumber", cast = Some("long"))),
      joinType = "left")
    val cust = Nested(
      as = "cust", table = "customer",
      childKey = "c_custkey", parentKey = "o_custkey",
      fields = Seq(NestedField("nm", "c_name")), single = true,
      joinType = "left")
    def req(subs: Seq[Nested]) = Request(
      table = "customer", fields = Seq("c_custkey"),
      where = Some(Lte("c_custkey", 8L)),
      orderBy = Seq(Order("c_custkey")),
      nested = Seq(Nested(
        as = "orders", table = "orders",
        childKey = "o_custkey", parentKey = "c_custkey",
        fields = Seq(NestedField("k", "o_orderkey")), subs = subs)))
    // per customer: order key -> the named member's JSON
    def arm(subs: Seq[Nested], member: String): Map[(Long, Long), String] =
      QueryBuilder.run(spark, dir, req(subs)).collect().flatMap { r =>
        val arr = om.readTree(r.getString(1))
        (0 until arr.size).map(i => ((r.getLong(0), arr.get(i).get("k").asLong),
          Option(arr.get(i).get(member)).map(_.toString).getOrElse("null")))
      }.toMap
    val bothItems = arm(Seq(items, cust), "items")
    val bothCust = arm(Seq(items, cust), "cust")
    val aloneItems = arm(Seq(items), "items")
    val aloneCust = arm(Seq(cust), "cust")
    assert(bothItems.nonEmpty && bothItems.keySet === aloneItems.keySet)
    assert(bothItems === aloneItems,
      "items arrays changed when a sibling joined the level")
    assert(bothCust === aloneCust,
      "the object sibling changed when the array sibling joined")
    // the object member is a STRUCT (not a 1-element array)
    assert(bothCust.values.forall(_.startsWith("{")))
  }
  test("order_by binds to the TABLE column even when a response key " +
    "shadows a different real column (the pre-projection sort rule)") {
    val dir = sf("sf0.001")
    // response key c_acctbal READS c_custkey — order_by: {c_acctbal}
    // must still sort by the table's c_acctbal (Hasura orders by
    // table columns, never response keys)
    val got = QueryBuilder.run(spark, dir, Request(
      table = "customer",
      fields = Seq("c_acctbal"),
      fieldAs = Map("c_acctbal" -> "c_custkey"),
      orderBy = Seq(Order("c_acctbal", desc = true),
        Order("c_custkey")),
      limit = Some(5))).collect().map(_.getLong(0)).toSeq
    val want = graft.Tables.load(spark, dir, "customer")
      .orderBy(org.apache.spark.sql.functions.col("c_acctbal").desc,
        org.apache.spark.sql.functions.col("c_custkey"))
      .limit(5).select("c_custkey")
      .collect().map(_.getLong(0)).toSeq
    assert(got === want,
      "the aliased projection hijacked the sort")
  }

  test("order_by survives a NESTED alias that shadows a real column: " +
    "the hidden pre-attach sort keys copy the table column before " +
    "withColumn can replace it") {
    val dir = sf("sf0.001")
    // the relationship renders under the response key c_name — the
    // same name as the table column order_by references; the sort
    // must read the TABLE's c_name, not the JSON array string
    val got = QueryBuilder.run(spark, dir, Request(
      table = "customer",
      fields = Seq("c_custkey"),
      where = Some(Lte("c_custkey", 50L)),
      orderBy = Seq(Order("c_name", desc = true), Order("c_custkey")),
      nested = Seq(Nested(
        as = "c_name", table = "orders",
        childKey = "o_custkey", parentKey = "c_custkey",
        joinType = "left",
        fields = Seq(NestedField("k", "o_orderkey")))),
      limit = Some(10))).collect().map(_.getLong(0)).toSeq
    val want = graft.Tables.load(spark, dir, "customer")
      .filter(org.apache.spark.sql.functions.col("c_custkey") <= 50L)
      .orderBy(org.apache.spark.sql.functions.col("c_name").desc,
        org.apache.spark.sql.functions.col("c_custkey"))
      .limit(10).select("c_custkey")
      .collect().map(_.getLong(0)).toSeq
    assert(got === want, "the nested alias hijacked the sort")
  }

  test("an ABSENT object relationship inside a nested array renders " +
    "\"key\":null, never an omitted key (Hasura emits every selected " +
    "key; Spark's to_json default would drop it)") {
    val dir = sf("sf0.001")
    // inner object rel customer(where: BUILDING): orders whose
    // customer is in another segment read cust: null
    val got = QueryBuilder.run(spark, dir, Request(
      table = "customer",
      fields = Seq("c_custkey"),
      where = Some(Lte("c_custkey", 20L)),
      orderBy = Seq(Order("c_custkey")),
      nested = Seq(Nested(
        as = "orders", table = "orders",
        childKey = "o_custkey", parentKey = "c_custkey",
        joinType = "left",
        fields = Seq(NestedField("k", "o_orderkey")),
        orderBy = Seq(Order("o_orderkey")),
        subs = Seq(Nested(
          as = "cust", table = "customer", single = true,
          joinType = "left",
          childKey = "c_custkey", parentKey = "o_custkey",
          where = Some(Eq("c_mktsegment", "BUILDING")),
          fields = Seq(NestedField("seg", "c_mktsegment"))))))))
    val rows = got.collect()
    val segs = graft.Tables.load(spark, dir, "customer")
      .filter(org.apache.spark.sql.functions.col("c_custkey") <= 20L)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val idx = got.columns.indexOf("orders")
    var sawNull = false
    rows.foreach { r =>
      val key = r.getLong(0)
      val json = r.getString(idx)
      if (json != "[]") {
        if (segs(key) == "BUILDING")
          assert(json.contains("\"cust\":{\"seg\":\"BUILDING\"}"),
            s"$key: $json")
        else {
          assert(json.contains("\"cust\":null"),
            s"$key lost its absent object key: $json")
          sawNull = true
        }
      }
    }
    assert(sawNull, "fixture produced no absent referenced row — " +
      "the null-render path went unexercised")
  }
}
