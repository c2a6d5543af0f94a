package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composable read-request front end — the engine's analog of the
  * reference's GraphQL read path (Hasura over Postgres,
  * /root/reference/README.md:89-155): a request names a root table, a
  * boolean where-tree (the `_eq/_gte/_in/_like/_and/_or/_not` operator
  * surface from README.md:121-155), order/limit/offset, scalar fields,
  * and at most one child relationship — either a nested object array
  * (`users{nfts{token_id}}`, README.md:92-99) or an aggregate
  * (Hasura's `*_aggregate`).
  *
  * `run` assembles the SAME DataFrame operators the handwritten
  * queries use, so the optimizer sees an identical declarative plan:
  * the where-tree compiles to one `filter` (predicates push to the
  * parquet scan), a nested relationship is q40's one-join +
  * one-shuffle-on-the-parent-key `collect_list(struct)` shape with the
  * array rendered `to_json` for cross-engine stability, an aggregate
  * relationship is q4's left-join + groupBy shape. QueryBuilderSpec
  * pins row-identity against the handwritten q3/q4/q40, and the
  * builder-served q90/q91 CORRECTNESS entries replay q3/q40's DuckDB
  * oracles verbatim.
  *
  * Scale posture: nothing here adds an operator the handwritten
  * queries don't have — requests inherit their plans, so the 100 TB
  * arguments (pushdown, broadcastable dims, single parent-key shuffle
  * per nesting level) carry over unchanged.
  */
object QueryBuilder {

  // ---- where tree (Hasura boolean expressions) -----------------------

  sealed trait BoolExp { private[api] def toColumn: Column }
  final case class Eq(field: String, v: Any) extends BoolExp {
    private[api] def toColumn: Column = col(field) === lit(v)
  }
  final case class Neq(field: String, v: Any) extends BoolExp {
    private[api] def toColumn: Column = col(field) =!= lit(v)
  }
  final case class Gt(field: String, v: Any) extends BoolExp {
    private[api] def toColumn: Column = col(field) > lit(v)
  }
  final case class Gte(field: String, v: Any) extends BoolExp {
    private[api] def toColumn: Column = col(field) >= lit(v)
  }
  final case class Lt(field: String, v: Any) extends BoolExp {
    private[api] def toColumn: Column = col(field) < lit(v)
  }
  final case class Lte(field: String, v: Any) extends BoolExp {
    private[api] def toColumn: Column = col(field) <= lit(v)
  }
  final case class In(field: String, vs: Seq[Any]) extends BoolExp {
    private[api] def toColumn: Column = col(field).isin(vs: _*)
  }
  final case class Like(field: String, pattern: String) extends BoolExp {
    private[api] def toColumn: Column = col(field).like(pattern)
  }
  final case class And(es: BoolExp*) extends BoolExp {
    require(es.nonEmpty, "_and needs at least one operand")
    private[api] def toColumn: Column = es.map(_.toColumn).reduce(_ && _)
  }
  final case class Or(es: BoolExp*) extends BoolExp {
    require(es.nonEmpty, "_or needs at least one operand")
    private[api] def toColumn: Column = es.map(_.toColumn).reduce(_ || _)
  }
  final case class Not(e: BoolExp) extends BoolExp {
    private[api] def toColumn: Column = !e.toColumn
  }

  // ---- ordering ------------------------------------------------------

  final case class Order(field: String, desc: Boolean = false) {
    private[api] def toColumn: Column =
      if (desc) col(field).desc else col(field).asc
  }

  // ---- relationships -------------------------------------------------

  /** One field of a nested object: `as` is the response key; an
    * optional (roundTo, printf) rendering matches q40's
    * cross-engine-stable price formatting. */
  final case class NestedField(as: String, field: String,
      format: Option[(Int, String)] = None)

  /** Child-array relationship (users{nfts{...}}): children fold to ONE
    * sorted JSON array column per parent — one shuffle on the parent
    * key, never a flat fan-out row set (q40's shape). */
  final case class Nested(as: String, table: String,
      childKey: String, parentKey: String, fields: Seq[NestedField]) {
    require(fields.nonEmpty, s"nested '$as' selects no fields")
  }

  /** One aggregate over a child relationship (the *_aggregate surface).
    * `SumOf` renders q4's NULL-absorbing rounded total so a parent with
    * no children reads 0, not null. */
  sealed trait AggField { private[api] def toColumn(child: DataFrame): Column }
  final case class CountOf(field: String, as: String) extends AggField {
    private[api] def toColumn(child: DataFrame): Column =
      count(child(field)).as(as)
  }
  final case class SumOf(field: String, as: String, roundTo: Int = 2)
      extends AggField {
    private[api] def toColumn(child: DataFrame): Column =
      round(coalesce(sum(child(field)), lit(0.0)), roundTo).as(as)
  }
  final case class MinOf(field: String, as: String) extends AggField {
    private[api] def toColumn(child: DataFrame): Column =
      min(child(field)).as(as)
  }
  final case class MaxOf(field: String, as: String) extends AggField {
    private[api] def toColumn(child: DataFrame): Column =
      max(child(field)).as(as)
  }
  final case class AvgOf(field: String, as: String) extends AggField {
    private[api] def toColumn(child: DataFrame): Column =
      avg(child(field)).as(as)
  }

  /** Aggregate relationship: left join so parents without children
    * still answer (Hasura returns them with count 0). */
  final case class AggRel(table: String, childKey: String,
      parentKey: String, aggs: Seq[AggField], joinType: String = "left") {
    require(aggs.nonEmpty, "aggregate relationship selects no aggregates")
  }

  // ---- the request ---------------------------------------------------

  /** One read request. `fields` are the parent's scalar selections —
    * with a relationship present they are also the groupBy keys, so
    * they must functionally determine the parent row (its key columns),
    * exactly as Hasura groups a nested response by the parent row. */
  final case class Request(
      table: String,
      fields: Seq[String],
      where: Option[BoolExp] = None,
      orderBy: Seq[Order] = Nil,
      offset: Int = 0,
      limit: Option[Int] = None,
      nested: Option[Nested] = None,
      aggRel: Option[AggRel] = None) {
    require(fields.nonEmpty, s"request on '$table' selects no fields")
    require(nested.isEmpty || aggRel.isEmpty,
      "one relationship per request (compose requests for more)")
  }

  /** Compile + run a request against the parquet tables in `dir`. */
  def run(s: SparkSession, dir: String, req: Request): DataFrame = {
    val base0 = graft.Tables.load(s, dir, req.table)
    val base = req.where.map(w => base0.filter(w.toColumn)).getOrElse(base0)
    val shaped = (req.nested, req.aggRel) match {
      case (Some(n), _) =>
        val child = graft.Tables.load(s, dir, n.table)
        val fs = n.fields.map { f =>
          f.format match {
            case Some((r, fmt)) =>
              format_string(fmt, round(child(f.field), r)).as(f.as)
            case None => child(f.field).as(f.as)
          }
        }
        base.join(child, child(n.childKey) === base(n.parentKey))
          .groupBy(req.fields.map(base(_)): _*)
          .agg(to_json(sort_array(collect_list(struct(fs: _*)))).as(n.as))
      case (_, Some(a)) =>
        val child = graft.Tables.load(s, dir, a.table)
        val aggCols = a.aggs.map(_.toColumn(child))
        base.join(child, child(a.childKey) === base(a.parentKey), a.joinType)
          .groupBy(req.fields.map(base(_)): _*)
          .agg(aggCols.head, aggCols.tail: _*)
      case _ => base.select(req.fields.map(col): _*)
    }
    val ordered =
      if (req.orderBy.isEmpty) shaped
      else shaped.orderBy(req.orderBy.map(_.toColumn): _*)
    val off = if (req.offset > 0) ordered.offset(req.offset) else ordered
    req.limit.map(off.limit).getOrElse(off)
  }

  // ---- canned requests served as CORRECTNESS entries ------------------

  /** q90 — the builder replaying q3's request shape (boolean
    * combinators + LIKE + order/limit/offset); shares q3's oracle. */
  def q90QbFilter(s: SparkSession, dir: String): DataFrame =
    run(s, dir, Request(
      table = "customer",
      fields = Seq("c_custkey", "c_name"),
      where = Some(And(
        Or(Gte("c_acctbal", 1000), Eq("c_mktsegment", "BUILDING")),
        Like("c_name", "%5%"))),
      orderBy = Seq(Order("c_custkey")),
      offset = 10,
      limit = Some(50)))

  /** q91 — the builder replaying q40's nested users{nfts{...}} shape;
    * shares q40's oracle. */
  def q91QbNested(s: SparkSession, dir: String): DataFrame =
    run(s, dir, Request(
      table = "customer",
      fields = Seq("c_custkey"),
      where = Some(Lte("c_custkey", 50)),
      orderBy = Seq(Order("c_custkey")),
      nested = Some(Nested(
        as = "orders", table = "orders",
        childKey = "o_custkey", parentKey = "c_custkey",
        fields = Seq(
          NestedField("k", "o_orderkey"),
          NestedField("p", "o_totalprice", format = Some((2, "%.2f"))))))))
}
