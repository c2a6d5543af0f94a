package graft.api

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.api.QueryBuilder._
import scala.jdk.CollectionConverters._

/** Wire codec for [[QueryBuilder.Request]] — the serialized front end
  * that makes the read path an actual API analog of the reference's
  * GraphQL endpoint (text queries over HTTP, README.md:89-155): a JSON
  * document parses to the same `Request` the Scala DSL builds, so a
  * caller who can POST a string can run every query the builder serves.
  *
  * The where-tree uses Hasura's own JSON spelling
  * (`{"field": {"_eq": v}}`, `{"_and": [...]}`, README.md:121-155);
  * relationships nest under `"nested"`/`"agg_rels"` with the same
  * per-relationship `where`/`order_by`/`limit` arguments as the DSL.
  *
  * Contracts:
  *  - `parse` returns errors as VALUES (`Left(message)`), never throws —
  *    malformed wire bytes are data, not control flow;
  *  - `parse(render(r)) == Right(r)` for any canonically-typed request
  *    (literal values as Long/Double/Boolean/String — `parse` always
  *    produces these, so parse ∘ render is the identity on its image);
  *  - Jackson is Spark's own bundled JSON parser — no new dependency.
  */
object RequestCodec {

  private val mapper = new ObjectMapper()

  private final case class Bad(msg: String)
      extends RuntimeException(msg)
  private def bad(msg: String): Nothing = throw Bad(msg)

  // ---- parse ---------------------------------------------------------

  /** Parse one wire request; all failures come back as `Left`. */
  def parse(json: String): Either[String, Request] =
    try {
      val root = mapper.readTree(json) match {
        case o: ObjectNode => o
        case _ => bad("request must be a JSON object")
      }
      Right(parseRequest(root))
    } catch {
      case Bad(m) => Left(m)
      case e: IllegalArgumentException => Left(e.getMessage)
      case e: com.fasterxml.jackson.core.JacksonException =>
        Left(s"not valid JSON: ${e.getOriginalMessage}")
    }

  private def fieldNames(o: ObjectNode): Seq[String] =
    o.fieldNames.asScala.toSeq

  private def req(o: ObjectNode, k: String, where: String): JsonNode = {
    val n = o.get(k)
    if (n == null) bad(s"$where: missing required key '$k'")
    n
  }

  private def str(n: JsonNode, where: String): String =
    if (n.isTextual) n.asText else bad(s"$where: expected a string")

  private def intOf(n: JsonNode, where: String): Int =
    if (n.isIntegralNumber) n.asInt else bad(s"$where: expected an integer")

  private def arr(n: JsonNode, where: String): Seq[JsonNode] =
    n match {
      case a: ArrayNode => a.asScala.toSeq
      case _ => bad(s"$where: expected an array")
    }

  private def obj(n: JsonNode, where: String): ObjectNode =
    n match {
      case o: ObjectNode => o
      case _ => bad(s"$where: expected an object")
    }

  /** JSON literal → canonical Scala literal (integral numbers always
    * Long, fractional always Double — the round-trip canon). */
  private def value(n: JsonNode, where: String): Any =
    if (n.isTextual) n.asText
    else if (n.isBoolean) n.asBoolean
    else if (n.isIntegralNumber) n.asLong
    else if (n.isNumber) n.asDouble
    else bad(s"$where: literal must be string/number/boolean")

  private def parseBool(n: JsonNode, where: String): BoolExp = {
    val o = obj(n, where)
    fieldNames(o) match {
      case Seq("_and") =>
        And(arr(o.get("_and"), s"$where._and")
          .map(parseBool(_, s"$where._and")): _*)
      case Seq("_or") =>
        Or(arr(o.get("_or"), s"$where._or")
          .map(parseBool(_, s"$where._or")): _*)
      case Seq("_not") => Not(parseBool(o.get("_not"), s"$where._not"))
      case Seq("_exists") =>
        // the wire spelling of a relationship predicate is EXPLICIT
        // (table + join keys + where) — the codec has no tracked
        // schema to resolve relationship names against
        val e = obj(o.get("_exists"), s"$where._exists")
        val extra = fieldNames(e).toSet --
          Set("table", "child_key", "parent_key", "where")
        if (extra.nonEmpty)
          bad(s"$where._exists: unknown field(s) ${extra.mkString(", ")}")
        def need(k: String): JsonNode = Option(e.get(k)).getOrElse(
          bad(s"$where._exists: $k is required"))
        RelPred(str(need("table"), s"$where._exists.table"),
          str(need("child_key"), s"$where._exists.child_key"),
          str(need("parent_key"), s"$where._exists.parent_key"),
          parseBool(need("where"), s"$where._exists.where"))
      case Seq(field) =>
        val cmp = obj(o.get(field), s"$where.$field")
        fieldNames(cmp) match {
          case Seq(op) =>
            val v = cmp.get(op)
            val at = s"$where.$field.$op"
            op match {
              case "_eq" => Eq(field, value(v, at))
              case "_neq" => Neq(field, value(v, at))
              case "_gt" => Gt(field, value(v, at))
              case "_gte" => Gte(field, value(v, at))
              case "_lt" => Lt(field, value(v, at))
              case "_lte" => Lte(field, value(v, at))
              case "_like" => Like(field, str(v, at))
              case "_nlike" => Nlike(field, str(v, at))
              case "_ilike" => Ilike(field, str(v, at))
              case "_regex" => Regex(field, str(v, at))
              case "_iregex" =>
                Regex(field, str(v, at), caseInsensitive = true)
              case "_nregex" => Nregex(field, str(v, at))
              case "_niregex" =>
                Nregex(field, str(v, at), caseInsensitive = true)
              case "_similar" => Similar(field, str(v, at))
              case "_nsimilar" => Nsimilar(field, str(v, at))
              case "_in" => In(field, arr(v, at).map(value(_, at)))
              case "_nin" => Nin(field, arr(v, at).map(value(_, at)))
              case "_is_null" =>
                if (v.isBoolean) IsNull(field, v.asBoolean)
                else bad(s"$at: expected a boolean")
              case "_has_key" => HasKey(field, str(v, at))
              case "_has_keys_any" =>
                HasKeysAny(field, arr(v, at).map(str(_, at)))
              case "_has_keys_all" =>
                HasKeysAll(field, arr(v, at).map(str(_, at)))
              case "_contains" | "_contained_in" =>
                val oo = obj(v, at)
                val pairs = fieldNames(oo).map(k =>
                  k -> value(oo.get(k), s"$at.$k"))
                if (op == "_contains") JsonContains(field, pairs)
                else JsonContainedIn(field, pairs)
              case "_cast" =>
                // {"_cast": {"<Type>": {"<op>": ...}}} — the inner
                // object re-parses as a comparison on the same field
                val oo = obj(v, at)
                fieldNames(oo) match {
                  case Seq(tname) =>
                    val innerWrap = mapper.createObjectNode()
                    innerWrap.set[ObjectNode](field, oo.get(tname))
                    val inner = parseBool(innerWrap, s"$at.$tname")
                    try Cast(field, tname, inner)
                    catch {
                      case e: IllegalArgumentException => bad(e.getMessage)
                    }
                  case _ => bad(s"$at: exactly one target type expected")
                }
              case other => bad(s"$where.$field: unknown operator '$other'")
            }
          case _ => bad(
            s"$where.$field: exactly one comparison operator expected")
        }
      case _ => bad(s"$where: exactly one of _and/_or/_not/<field> expected")
    }
  }

  /** Order entries parse identically at the root and relationship
    * levels — the nested in-array comparator honors explicit nulls
    * placements (asc_nulls_first / desc_nulls_last) like the root
    * sort does. */
  private def parseOrders(o: ObjectNode, where: String): Seq[Order] =
    Option(o.get("order_by")).map(arr(_, s"$where.order_by").map { n =>
      val oo = obj(n, s"$where.order_by[]")
      Order(str(req(oo, "field", s"$where.order_by[]"), s"$where.order_by[]"),
        desc = Option(oo.get("desc")).exists(_.asBoolean(false)),
        nullsFirst = Option(oo.get("nulls_first")).map { v =>
          if (v.isBoolean) v.asBoolean
          else bad(s"$where.order_by[].nulls_first: expected a boolean")
        })
    }).getOrElse(Nil)

  private def parseNestedField(n: JsonNode, where: String): NestedField = {
    val o = obj(n, where)
    val fmt = (Option(o.get("round")), Option(o.get("printf"))) match {
      case (Some(r), Some(p)) =>
        Some((intOf(r, s"$where.round"), str(p, s"$where.printf")))
      case (None, None) => None
      case _ => bad(s"$where: 'round' and 'printf' come together")
    }
    NestedField(
      as = str(req(o, "as", where), s"$where.as"),
      field = str(req(o, "field", where), s"$where.field"),
      format = fmt,
      cast = Option(o.get("cast")).map(str(_, s"$where.cast")))
  }

  private def parseNested(n: JsonNode, where: String): Nested = {
    val o = obj(n, where)
    Nested(
      as = str(req(o, "as", where), s"$where.as"),
      table = str(req(o, "table", where), s"$where.table"),
      childKey = str(req(o, "child_key", where), s"$where.child_key"),
      parentKey = str(req(o, "parent_key", where), s"$where.parent_key"),
      fields = arr(req(o, "fields", where), s"$where.fields")
        .map(parseNestedField(_, s"$where.fields[]")),
      // `subs` (array) is the wire shape; a legacy single-object
      // `sub` still decodes (pre-sibling documents keep replaying)
      subs = Option(o.get("subs"))
        .map(arr(_, s"$where.subs")
          .map(parseNested(_, s"$where.subs[]")))
        .orElse(Option(o.get("sub"))
          .map(sn => Seq(parseNested(sn, s"$where.sub"))))
        .getOrElse(Nil),
      joinType = Option(o.get("join")).map(str(_, s"$where.join"))
        .getOrElse("inner"),
      where = Option(o.get("where")).map(parseBool(_, s"$where.where")),
      orderBy = parseOrders(o, where),
      limit = Option(o.get("limit")).map(intOf(_, s"$where.limit")),
      offset = Option(o.get("offset"))
        .map(intOf(_, s"$where.offset")).getOrElse(0),
      distinctOn = parseDistinctOn(o, where),
      single = Option(o.get("single")).exists { v =>
        if (!v.isBoolean) bad(s"$where.single: expected a boolean")
        v.asBoolean
      })
  }

  private def parseDistinctOn(o: ObjectNode, where: String): Seq[String] =
    Option(o.get("distinct_on"))
      .map(arr(_, s"$where.distinct_on")
        .map(str(_, s"$where.distinct_on[]")))
      .getOrElse(Nil)

  private def parseAgg(n: JsonNode, where: String): AggField = {
    val o = obj(n, where)
    val fn = str(req(o, "fn", where), s"$where.fn")
    val f = str(req(o, "field", where), s"$where.field")
    val as = str(req(o, "as", where), s"$where.as")
    def rnd(dflt: Int) =
      Option(o.get("round")).map(intOf(_, s"$where.round")).getOrElse(dflt)
    fn match {
      case "count" => CountOf(f, as)
      case "sum" => SumOf(f, as, rnd(2))
      case "min" => MinOf(f, as)
      case "max" => MaxOf(f, as)
      case "avg" => AvgOf(f, as)
      // Hasura's statistical family: bare stddev/variance are the
      // SAMPLE variants (the Postgres defaults it inherits)
      case "stddev" | "stddev_samp" => StddevOf(f, as, pop = false, rnd(4))
      case "stddev_pop" => StddevOf(f, as, pop = true, rnd(4))
      case "variance" | "var_samp" => VarianceOf(f, as, pop = false, rnd(4))
      case "var_pop" => VarianceOf(f, as, pop = true, rnd(4))
      case other => bad(s"$where: unknown aggregate '$other'")
    }
  }

  private def parseAggRel(n: JsonNode, where: String): AggRel = {
    val o = obj(n, where)
    AggRel(
      table = str(req(o, "table", where), s"$where.table"),
      childKey = str(req(o, "child_key", where), s"$where.child_key"),
      parentKey = str(req(o, "parent_key", where), s"$where.parent_key"),
      aggs = arr(req(o, "aggs", where), s"$where.aggs")
        .map(parseAgg(_, s"$where.aggs[]")),
      joinType = Option(o.get("join")).map(str(_, s"$where.join"))
        .getOrElse("left"),
      where = Option(o.get("where")).map(parseBool(_, s"$where.where")),
      orderBy = parseOrders(o, where),
      limit = Option(o.get("limit")).map(intOf(_, s"$where.limit")),
      offset = Option(o.get("offset"))
        .map(intOf(_, s"$where.offset")).getOrElse(0),
      distinctOn = parseDistinctOn(o, where),
      nodes = Option(o.get("nodes"))
        .map(arr(_, s"$where.nodes").map(str(_, s"$where.nodes[]")))
        .getOrElse(Nil),
      prefix = Option(o.get("prefix"))
        .map(str(_, s"$where.prefix")))
  }

  private def parseRequest(o: ObjectNode): Request = {
    // a scalar selection is a bare string, or `{"as": k, "field": c}`
    // for a GraphQL alias (response key k reading source column c) —
    // the NestedField spelling, minus format/cast
    val scalars = arr(req(o, "fields", "request"), "request.fields")
      .map { n =>
        if (n.isTextual) (n.asText, None)
        else {
          val fo = obj(n, "request.fields[]")
          val as = str(req(fo, "as", "request.fields[]"),
            "request.fields[].as")
          val f = str(req(fo, "field", "request.fields[]"),
            "request.fields[].field")
          (as, if (as == f) None else Some(f))
        }
      }
    Request(
      table = str(req(o, "table", "request"), "request.table"),
      fields = scalars.map(_._1),
      fieldAs = scalars.collect { case (a, Some(f)) => a -> f }.toMap,
      where = Option(o.get("where")).map(parseBool(_, "request.where")),
      orderBy = parseOrders(o, "request"),
      offset = Option(o.get("offset"))
        .map(intOf(_, "request.offset")).getOrElse(0),
      limit = Option(o.get("limit")).map(intOf(_, "request.limit")),
      nested = Option(o.get("nested"))
        .map(arr(_, "request.nested").map(parseNested(_, "request.nested[]")))
        .getOrElse(Nil),
      aggRels = Option(o.get("agg_rels"))
        .map(arr(_, "request.agg_rels")
          .map(parseAggRel(_, "request.agg_rels[]")))
        .getOrElse(Nil),
      distinctOn = Option(o.get("distinct_on"))
        .map(arr(_, "request.distinct_on")
          .map(str(_, "request.distinct_on[]")))
        .getOrElse(Nil))
  }

  // ---- wire-served correctness entry ---------------------------------

  /** The q98 request as WIRE BYTES — exactly what the reference's
    * endpoint accepts: text in, rows out. */
  val q99Json: String =
    """{
      |  "table": "customer",
      |  "fields": ["c_custkey"],
      |  "where": {"c_custkey": {"_lte": 50}},
      |  "order_by": [{"field": "c_custkey"}],
      |  "nested": [{
      |    "as": "orders", "table": "orders",
      |    "child_key": "o_custkey", "parent_key": "c_custkey",
      |    "fields": [
      |      {"as": "k", "field": "o_orderkey"},
      |      {"as": "p", "field": "o_totalprice", "round": 2, "printf": "%.2f"}
      |    ],
      |    "where": {"o_orderstatus": {"_eq": "O"}},
      |    "order_by": [{"field": "o_totalprice", "desc": true},
      |                 {"field": "o_orderkey"}],
      |    "limit": 3
      |  }]
      |}""".stripMargin

  /** q99 — q98 arriving as serialized wire text, parsed then run.
    * Shares q98's oracle, so a parse defect cannot hide behind the
    * DSL-built twin: the parsed request must produce hash-identical
    * rows. */
  def q99QbWire(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    parse(q99Json) match {
      case Right(r) => QueryBuilder.run(s, dir, r)
      case Left(m) => throw new IllegalStateException(
        s"canned q99 wire request failed to parse: $m")
    }

  // ---- render --------------------------------------------------------

  /** Serialize a request back to its wire form (defaults omitted). */
  def render(r: Request): String =
    mapper.writeValueAsString(renderRequest(r))

  private def putValue(o: ObjectNode, k: String, v: Any): Unit = v match {
    case s: String => o.put(k, s)
    case b: Boolean => o.put(k, b)
    case l: Long => o.put(k, l)
    case i: Int => o.put(k, i.toLong) // canonical: integral → Long
    case d: Double => o.put(k, d)
    case f: Float => o.put(k, f.toDouble)
    case other =>
      throw new IllegalArgumentException(
        s"literal of ${other.getClass.getName} has no wire form")
  }

  private def renderBool(e: BoolExp): ObjectNode = {
    val o = mapper.createObjectNode()
    def cmp(field: String, op: String, v: Any): ObjectNode = {
      val inner = mapper.createObjectNode()
      putValue(inner, op, v)
      o.set[ObjectNode](field, inner)
      o
    }
    def jsonObj(f: String, op: String,
        ps: Seq[(String, Any)]): ObjectNode = {
      val inner = mapper.createObjectNode()
      val body = inner.putObject(op)
      ps.foreach { case (k, v) => putValue(body, k, v) }
      o.set[ObjectNode](f, inner)
      o
    }
    def inList(f: String, op: String, vs: Seq[Any]): ObjectNode = {
      val inner = mapper.createObjectNode()
      val a = inner.putArray(op)
      vs.foreach {
        case s: String => a.add(s)
        case b: Boolean => a.add(b)
        case l: Long => a.add(l)
        case i: Int => a.add(i.toLong)
        case d: Double => a.add(d)
        case other => throw new IllegalArgumentException(
          s"literal of ${other.getClass.getName} has no wire form")
      }
      o.set[ObjectNode](f, inner)
      o
    }
    e match {
      case Eq(f, v) => cmp(f, "_eq", v)
      case Neq(f, v) => cmp(f, "_neq", v)
      case Gt(f, v) => cmp(f, "_gt", v)
      case Gte(f, v) => cmp(f, "_gte", v)
      case Lt(f, v) => cmp(f, "_lt", v)
      case Lte(f, v) => cmp(f, "_lte", v)
      case Like(f, p) => cmp(f, "_like", p)
      case Nlike(f, p) => cmp(f, "_nlike", p)
      case Ilike(f, p) => cmp(f, "_ilike", p)
      case Regex(f, p, ci) => cmp(f, if (ci) "_iregex" else "_regex", p)
      case Nregex(f, p, ci) =>
        cmp(f, if (ci) "_niregex" else "_nregex", p)
      case Similar(f, p) => cmp(f, "_similar", p)
      case Nsimilar(f, p) => cmp(f, "_nsimilar", p)
      case IsNull(f, b) => cmp(f, "_is_null", b)
      case In(f, vs) => inList(f, "_in", vs)
      case Nin(f, vs) => inList(f, "_nin", vs)
      case HasKey(f, k) => cmp(f, "_has_key", k)
      case HasKeysAny(f, ks) => inList(f, "_has_keys_any", ks)
      case HasKeysAll(f, ks) => inList(f, "_has_keys_all", ks)
      case JsonContains(f, ps) => jsonObj(f, "_contains", ps)
      case JsonContainedIn(f, ps) => jsonObj(f, "_contained_in", ps)
      case Cast(f, to, inner) =>
        // inverse of the parse: unwrap the inner tree's own {field:
        // {op: v}} rendering back to the bare comparison object
        val innerObj = renderBool(inner)
        val cmpObj = Option(innerObj.get(f)) match {
          case Some(c: ObjectNode) => c
          case _ => throw new IllegalArgumentException(
            s"render: _cast on '$f' carries a composed inner tree — " +
              "only a single casted comparison round-trips the wire " +
              "form (compose with _and outside the _cast)")
        }
        o.putObject(f).putObject("_cast").set[ObjectNode](to, cmpObj); o
      case RelPred(table, ck, pk, pred) =>
        val e = o.putObject("_exists")
        e.put("table", table); e.put("child_key", ck)
        e.put("parent_key", pk)
        e.set[ObjectNode]("where", renderBool(pred)); o
      case FlagRef(_) => throw new IllegalArgumentException(
        "render: a decorrelated flag is internal to run() — not a " +
          "request shape")
      case KeySet(_, _) => throw new IllegalArgumentException(
        "render: a KeySet is internal to the mutation fold — not a " +
          "request shape")
      case And(es @ _*) =>
        val a = o.putArray("_and"); es.foreach(x => a.add(renderBool(x))); o
      case Or(es @ _*) =>
        val a = o.putArray("_or"); es.foreach(x => a.add(renderBool(x))); o
      case Not(x) => o.set[ObjectNode]("_not", renderBool(x)); o
    }
  }

  private def renderOrders(o: ObjectNode, os: Seq[Order]): Unit =
    if (os.nonEmpty) {
      val a = o.putArray("order_by")
      os.foreach { ord =>
        val oo = a.addObject()
        oo.put("field", ord.field)
        if (ord.desc) oo.put("desc", true)
        ord.nullsFirst.foreach(oo.put("nulls_first", _))
      }
    }

  private def renderNested(n: Nested): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("as", n.as); o.put("table", n.table)
    o.put("child_key", n.childKey); o.put("parent_key", n.parentKey)
    val fa = o.putArray("fields")
    n.fields.foreach { f =>
      val fo = fa.addObject()
      fo.put("as", f.as); fo.put("field", f.field)
      f.format.foreach { case (r, p) =>
        fo.put("round", r); fo.put("printf", p) }
      f.cast.foreach(fo.put("cast", _))
    }
    if (n.subs.nonEmpty) {
      val sa = o.putArray("subs")
      n.subs.foreach(m => sa.add(renderNested(m)))
    }
    if (n.single) o.put("single", true)
    if (n.joinType != "inner") o.put("join", n.joinType)
    n.where.foreach(w => o.set[ObjectNode]("where", renderBool(w)))
    renderOrders(o, n.orderBy)
    n.limit.foreach(o.put("limit", _))
    if (n.offset != 0) o.put("offset", n.offset)
    if (n.distinctOn.nonEmpty) {
      val da = o.putArray("distinct_on")
      n.distinctOn.foreach(da.add)
    }
    o
  }

  private def renderRequest(r: Request): ObjectNode = {
    if (r.orderAggs.nonEmpty)
      throw new IllegalArgumentException(
        "render: ordering aggregates have no wire-JSON spelling yet — " +
          "serve the request through the GraphQL printer instead")
    val o = mapper.createObjectNode()
    o.put("table", r.table)
    val fa = o.putArray("fields")
    r.fields.foreach { f =>
      r.fieldAs.get(f) match {
        case Some(src) =>
          val fo = fa.addObject(); fo.put("as", f); fo.put("field", src)
        case None => fa.add(f)
      }
    }
    if (r.distinctOn.nonEmpty) {
      val da = o.putArray("distinct_on")
      r.distinctOn.foreach(da.add)
    }
    r.where.foreach(w => o.set[ObjectNode]("where", renderBool(w)))
    renderOrders(o, r.orderBy)
    if (r.offset != 0) o.put("offset", r.offset)
    r.limit.foreach(o.put("limit", _))
    if (r.nested.nonEmpty) {
      val a = o.putArray("nested")
      r.nested.foreach(n => a.add(renderNested(n)))
    }
    if (r.aggRels.nonEmpty) {
      val a = o.putArray("agg_rels")
      r.aggRels.foreach { ar =>
        val ao = a.addObject()
        ao.put("table", ar.table)
        ao.put("child_key", ar.childKey); ao.put("parent_key", ar.parentKey)
        val aa = ao.putArray("aggs")
        ar.aggs.foreach { f =>
          val fo = aa.addObject()
          val fn = f match {
            case _: CountOf => "count"
            case _: SumOf => "sum"
            case _: MinOf => "min"
            case _: MaxOf => "max"
            case _: AvgOf => "avg"
            // render the canonical *_samp/_pop spellings — parse maps
            // the bare Hasura aliases onto the same constructors, so
            // parse∘render stays the identity
            case StddevOf(_, _, pop, _) =>
              if (pop) "stddev_pop" else "stddev_samp"
            case VarianceOf(_, _, pop, _) =>
              if (pop) "var_pop" else "var_samp"
            case other => throw new IllegalArgumentException(
              s"render: relationship aggregate ${other.getClass
                .getSimpleName} has no wire form (root-aggregate-only " +
                "arm) — a MatchError here would be a silent drift")
          }
          fo.put("fn", fn)
          val field = f match {
            case CountOf(x, _) => x
            case SumOf(x, _, _) => x
            case MinOf(x, _) => x
            case MaxOf(x, _) => x
            case AvgOf(x, _) => x
            case StddevOf(x, _, _, _) => x
            case VarianceOf(x, _, _, _) => x
            case other => throw new IllegalArgumentException(
              s"render: relationship aggregate ${other.getClass
                .getSimpleName} has no wire form")
          }
          fo.put("field", field); fo.put("as", f.as)
          f match {
            case SumOf(_, _, r0) if r0 != 2 => fo.put("round", r0)
            case StddevOf(_, _, _, r0) if r0 != 4 => fo.put("round", r0)
            case VarianceOf(_, _, _, r0) if r0 != 4 => fo.put("round", r0)
            case _ => ()
          }
        }
        if (ar.joinType != "left") ao.put("join", ar.joinType)
        ar.where.foreach(w => ao.set[ObjectNode]("where", renderBool(w)))
        renderOrders(ao, ar.orderBy)
        ar.limit.foreach(ao.put("limit", _))
        if (ar.offset != 0) ao.put("offset", ar.offset)
        if (ar.distinctOn.nonEmpty) {
          val da = ao.putArray("distinct_on")
          ar.distinctOn.foreach(da.add)
        }
        if (ar.nodes.nonEmpty) {
          val na = ao.putArray("nodes")
          ar.nodes.foreach(na.add)
        }
        ar.prefix.foreach(ao.put("prefix", _))
      }
    }
    o
  }
}
