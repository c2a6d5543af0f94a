package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composable read-request front end — the engine's analog of the
  * reference's GraphQL read path (Hasura over Postgres,
  * /root/reference/README.md:89-155): a request names a root table, a
  * boolean where-tree (the full `_eq/_neq/_gt/_gte/_lt/_lte/_in/_nin/
  * _like/_nlike/_ilike/_is_null/_and/_or/_not` operator surface from
  * README.md:121-155), order/limit/offset, scalar fields,
  * and any number of child relationships — nested object arrays
  * (`users{nfts{token_id}}`, README.md:92-99), recursively nestable
  * (`users{nfts{bids{...}}}`), and aggregates (Hasura's
  * `*_aggregate`). Every relationship compiles independently to one
  * pre-aggregated row per parent key and joins back, so fan-outs never
  * cross-multiply.
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

  /** JSON render options for every relationship/nodes wire column:
    * Hasura emits EVERY selected key, null-valued when the data is null
    * — Spark's to_json default (ignoreNullFields=true) would instead
    * DROP the key, so an absent object relationship inside a nested
    * array would vanish from the response rather than read `null`. */
  private[api] val jsonOpts = Map("ignoreNullFields" -> "false")

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
  /** Hasura `_nin`. Same three-valued logic as SQL NOT IN: a null
    * field never matches. */
  final case class Nin(field: String, vs: Seq[Any]) extends BoolExp {
    private[api] def toColumn: Column = !col(field).isin(vs: _*)
  }
  /** INTERNAL membership test against a DataFrame of keys — the
    * scale-safe spelling of [[In]] when the key set is itself a query
    * result (e.g. [[Mutations.cascadeForget]]'s doomed parents above
    * its inline guard). Not a wire operator: it never parses from
    * GraphQL, has no JSON form, and compiles to a LEFT SEMI JOIN in
    * the mutation fold rather than to a Column (a ten-million-key
    * `isin` literal would sit on the driver and in every task's plan).
    * `keys` must be a single-column DataFrame; rows where `field` is
    * null never match (SQL IN semantics, same as join-key equality). */
  private[api] final case class KeySet(field: String,
      keys: DataFrame) extends BoolExp {
    require(keys.columns.length == 1,
      s"KeySet($field): keys must be single-column, got " +
        keys.columns.mkString(", "))
    private[api] def toColumn: Column =
      throw new UnsupportedOperationException(
        s"KeySet($field) compiles to a semi-join, not a Column — it " +
          "is only valid where the executor handles it structurally " +
          "(the mutation Delete arm)")
  }
  final case class Like(field: String, pattern: String) extends BoolExp {
    private[api] def toColumn: Column = col(field).like(pattern)
  }
  final case class Nlike(field: String, pattern: String) extends BoolExp {
    private[api] def toColumn: Column = !col(field).like(pattern)
  }
  final case class Ilike(field: String, pattern: String) extends BoolExp {
    private[api] def toColumn: Column = col(field).ilike(pattern)
  }
  /** Hasura `_regex` / `_iregex` (Postgres `~` / `~*`): PARTIAL-match
    * regex. Spark executes Java regex, DuckDB/Postgres POSIX/RE2 — the
    * contract covers their common subset (character classes,
    * alternation, repetition, anchors); lookaround/backreferences are
    * out of scope. A null field never matches (SQL three-valued
    * logic), so `Nregex` keeps nulls out exactly like `_nlike`. */
  final case class Regex(field: String, pattern: String,
      caseInsensitive: Boolean = false) extends BoolExp {
    compilePattern(pattern, s"_regex on '$field'")
    private[api] def toColumn: Column = col(field).rlike(
      if (caseInsensitive) "(?i)" + pattern else pattern)
  }
  final case class Nregex(field: String, pattern: String,
      caseInsensitive: Boolean = false) extends BoolExp {
    compilePattern(pattern, s"_nregex on '$field'")
    private[api] def toColumn: Column = !col(field).rlike(
      if (caseInsensitive) "(?i)" + pattern else pattern)
  }
  /** Hasura `_similar` (SQL SIMILAR TO): FULL-match pattern where `%`
    * and `_` are the LIKE wildcards and `|`, `*`, `+`, `?`, `()`,
    * `[]`, `{}` keep their regex meanings, while `.` is a LITERAL —
    * translated to an anchored Java regex ([[similarToRegex]]). */
  final case class Similar(field: String, pattern: String)
      extends BoolExp {
    compilePattern(similarToRegex(pattern), s"_similar on '$field'")
    private[api] def toColumn: Column =
      col(field).rlike(similarToRegex(pattern))
  }
  final case class Nsimilar(field: String, pattern: String)
      extends BoolExp {
    compilePattern(similarToRegex(pattern), s"_nsimilar on '$field'")
    private[api] def toColumn: Column =
      !col(field).rlike(similarToRegex(pattern))
  }

  /** Malformed patterns reject DRIVER-SIDE at construction (parse
    * time for the front ends) — the JsonFunctions patternProperties
    * rule: an invalid regex must not surface as mid-job executor task
    * failures. */
  private def compilePattern(p: String, at: String): Unit =
    try java.util.regex.Pattern.compile(p)
    catch {
      case e: java.util.regex.PatternSyntaxException =>
        throw new IllegalArgumentException(
          s"$at: pattern is not a valid regex: ${e.getMessage}")
    }

  /** SQL SIMILAR TO → anchored Java regex: `%` → `.*`, `_` → `.`,
    * literal `.` escaped (SIMILAR TO does not treat it as a
    * metacharacter); the regex-shared metacharacters and backslash
    * escapes pass through with their common meaning. `\A...\z` anchors
    * implement the full-match semantics without multiline surprises. */
  private[api] def similarToRegex(p: String): String = {
    val sb = new StringBuilder("\\A(?:")
    var i = 0
    var inBracket = false // inside [...] every SIMILAR TO metachar is
    // LITERAL (Postgres semantics) and Java agrees, so copy verbatim
    while (i < p.length) {
      p.charAt(i) match {
        case '\\' if i + 1 < p.length =>
          sb += '\\' += p.charAt(i + 1); i += 1
        case c if inBracket =>
          sb += c; if (c == ']') inBracket = false
        case '[' => sb += '['; inBracket = true
        // [\s\S] not '.': SIMILAR TO wildcards span NEWLINES (a
        // stored text with \n must still match '%b'), which Java's
        // dot excludes outside DOTALL
        case '%' => sb ++= "[\\s\\S]*"
        case '_' => sb ++= "[\\s\\S]"
        // Java metacharacters that SIMILAR TO treats as LITERALS —
        // an unescaped '$' made 'a$b' match nothing at all
        case '.' => sb ++= "\\."
        case '^' => sb ++= "\\^"
        case '$' => sb ++= "\\$"
        case c => sb += c
      }
      i += 1
    }
    sb ++= ")\\z"
    sb.toString
  }

  /** Hasura `_is_null: true|false`. */
  final case class IsNull(field: String, isNull: Boolean = true)
      extends BoolExp {
    private[api] def toColumn: Column =
      if (isNull) col(field).isNull else col(field).isNotNull
  }

  /** Hasura `_cast: {<Type>: {...}}` (r19): the column CASTS to the
    * named GraphQL/Postgres type and the nested comparison tree
    * evaluates against the casted value — `props::text ILIKE ...`
    * over jsonb, `event_id::text LIKE ...` over scalars. The inner
    * tree is the column-local comparison family on the SAME field
    * (And/Or/Not compose; relationship predicates and the JSONB
    * family have no casted spelling — Hasura agrees). SQL TRY_CAST
    * semantics: an uncastable value answers NULL and the row filters
    * out either polarity (ANSI Spark would otherwise fail the whole
    * job on one malformed row — the oracle spells TRY_CAST too). */
  final case class Cast(field: String, to: String, inner: BoolExp)
      extends BoolExp {
    private[api] val sparkType: String = Cast.targets.getOrElse(to,
      throw new IllegalArgumentException(
        s"_cast on '$field': unsupported target type '$to' (one of " +
          s"${Cast.targets.keys.toSeq.sorted.mkString(", ")})"))
    require(field.matches("[_A-Za-z][_0-9A-Za-z]*"),
      s"_cast: '$field' is not a column-name-shaped field")
    private def cc: Column =
      expr(s"try_cast($field AS $sparkType)")
    // ONE switch: compiling eagerly at construction makes every
    // unsupported inner operator and wrong-field binding loud
    // driver-side (parse time for the front ends), and toColumn just
    // serves the compiled result
    private val compiled: Column = on(inner)
    private[api] def toColumn: Column = compiled
    private def same(f: String): Column = {
      require(f == field, s"_cast on '$field' to $to: inner " +
        s"operator names '$f' — the casted comparisons bind to the " +
        "cast column")
      cc
    }
    private def on(e: BoolExp): Column = e match {
      case Eq(f, v) => same(f) === lit(v)
      case Neq(f, v) => same(f) =!= lit(v)
      case Gt(f, v) => same(f) > lit(v)
      case Gte(f, v) => same(f) >= lit(v)
      case Lt(f, v) => same(f) < lit(v)
      case Lte(f, v) => same(f) <= lit(v)
      case In(f, vs) => same(f).isin(vs: _*)
      case Nin(f, vs) => !same(f).isin(vs: _*)
      case Like(f, p) => same(f).like(p)
      case Nlike(f, p) => !same(f).like(p)
      case Ilike(f, p) => same(f).ilike(p)
      case Regex(f, p, ci) => same(f).rlike(if (ci) "(?i)" + p else p)
      case Nregex(f, p, ci) => !same(f).rlike(if (ci) "(?i)" + p else p)
      case Similar(f, p) => same(f).rlike(similarToRegex(p))
      case Nsimilar(f, p) => !same(f).rlike(similarToRegex(p))
      case IsNull(f, want) =>
        if (want) same(f).isNull else same(f).isNotNull
      case And(es @ _*) => es.map(on).reduce(_ && _)
      case Or(es @ _*) => es.map(on).reduce(_ || _)
      case Not(x) => !on(x)
      case other => throw new IllegalArgumentException(
        s"_cast on '$field' to $to: $other has no casted form " +
          "(column-local comparisons only)")
    }
  }
  object Cast {
    /** Hasura/Postgres target-type spellings → Spark cast types. */
    private[api] val targets: Map[String, String] = Map(
      "String" -> "string", "text" -> "string",
      "Int" -> "int", "bigint" -> "bigint",
      "Float" -> "double", "float8" -> "double",
      "numeric" -> "double", "Boolean" -> "boolean",
      "date" -> "date", "timestamp" -> "timestamp")
  }

  // ---- JSONB comparison family (Hasura _contains/_has_key/...) -------
  // The engine stores jsonb as JSON TEXT (the C7 surface), so the
  // family compiles to json_object_keys/get_json_object over the
  // string column. Scope is the FLAT-OBJECT subset: top-level keys
  // (GraphQL-name-shaped — anything else rejects loudly driver-side)
  // and SCALAR values; nested containment has no spelling here.
  // Non-object / malformed JSON rows answer NULL (filtered), matching
  // jsonb's never-match-on-garbage behavior for a text store.

  private def jsonKeyName(k: String, at: String): Unit =
    require(k.matches("[_A-Za-z][_0-9A-Za-z]*"),
      s"$at: key '$k' is not a GraphQL-name-shaped JSON key (the " +
        "get_json_object path subset this engine compiles)")

  /** Validates one scalar of a `_contains` literal (construction-time
    * guard: JSON null and nested values reject loudly). The runtime
    * comparison is TYPED via [[typedJsonEq]], not this rendering. */
  private def jsonScalar(v: Any, at: String): String = v match {
    case null => throw new IllegalArgumentException(
      s"$at: null has no containment semantics over a text store " +
        "(extraction cannot tell JSON null from an absent key) — " +
        "use _has_key")
    case s: String => s
    case b: Boolean => b.toString
    case l: Long => l.toString
    case i: Int => i.toString
    case d: Double => d.toString
    case other => throw new IllegalArgumentException(
      s"$at: ${other.getClass.getSimpleName} is not a JSON scalar " +
        "(nested containment has no spelling here)")
  }

  /** Hasura `_has_key`: the column's top-level object has the key. */
  final case class HasKey(field: String, key: String) extends BoolExp {
    jsonKeyName(key, s"_has_key on '$field'")
    private[api] def toColumn: Column =
      array_contains(json_object_keys(col(field)), key)
  }
  /** Hasura `_has_keys_any` / `_has_keys_all`. */
  final case class HasKeysAny(field: String, keys: Seq[String])
      extends BoolExp {
    require(keys.nonEmpty, s"_has_keys_any on '$field': empty key list")
    keys.foreach(jsonKeyName(_, s"_has_keys_any on '$field'"))
    private[api] def toColumn: Column = keys.map(k =>
      array_contains(json_object_keys(col(field)), k)).reduce(_ || _)
  }
  final case class HasKeysAll(field: String, keys: Seq[String])
      extends BoolExp {
    require(keys.nonEmpty, s"_has_keys_all on '$field': empty key list")
    keys.foreach(jsonKeyName(_, s"_has_keys_all on '$field'"))
    private[api] def toColumn: Column = keys.map(k =>
      array_contains(json_object_keys(col(field)), k)).reduce(_ && _)
  }
  /** Hasura `_contains` (jsonb `@>`) over the flat-object subset:
    * every (key, scalar) of the literal appears top-level with the
    * same value. KNOWN DEVIATION (documented at [[jsonScalar]]): the
    * text store compares extracted STRINGS, so `"69"` matches `69` —
    * jsonb's typed containment would not; store canonical spellings
    * for type-exact matches. */
  final case class JsonContains(field: String,
      pairs: Seq[(String, Any)]) extends BoolExp {
    require(pairs.nonEmpty, s"_contains on '$field': an empty object " +
      "matches every row — spell the predicate you mean")
    pairs.foreach { case (k, v) =>
      jsonKeyName(k, s"_contains on '$field'")
      jsonScalar(v, s"_contains on '$field'.$k")
    }
    private[api] def toColumn: Column = pairs.map { case (k, v) =>
      typedJsonEq(field, k, v)
    }.reduce(_ && _)
  }

  /** TYPED scalar equality for jsonb containment (`@>` / `<@`),
    * Spark-4 variant functions doing the type recovery a bare
    * `get_json_object` text compare cannot: a stored STRING `"69"`
    * never matches the number literal `69` (and vice versa), while
    * numbers compare NUMERICALLY across JSON spellings (`69`, `69.0`,
    * `6.9e1` all match `_contains: {k: 69}` — jsonb's numeric
    * equality). Garbage / non-object / missing-key rows answer SQL
    * NULL (filtered either polarity, the documented text-store
    * posture); a JSON-null value is typed VOID and matches no scalar
    * (false, jsonb's answer). The type probe and the cast both ride
    * codegen'd variant expressions — one parse per row, no UDF. */
  private def typedJsonEq(field: String, k: String, v: Any): Column = {
    val sub = try_variant_get(try_parse_json(col(field)), s"$$.$k",
      "variant")
    val t = schema_of_variant(sub)
    v match {
      case s: String =>
        (t === lit("STRING")) &&
          try_variant_get(sub, "$", "string") === lit(s)
      case b: Boolean =>
        (t === lit("BOOLEAN")) &&
          try_variant_get(sub, "$", "boolean") === lit(b)
      case n =>
        // numeric literal (Int/Long/Double — jsonScalar admitted it):
        // the type guard keeps STRING "69" and BOOLEAN true (both
        // double-castable) out of the numeric arm. An INTEGRAL
        // literal against an integral stored value compares as LONG
        // — a double round-trip would equate distinct int64s beyond
        // 2^53 (jsonb numerics are exact); the fractional-stored arm
        // (69.0 matches 69) still compares numerically as double.
        n match {
          case x: Double =>
            t.rlike(
              "^(TINYINT|SMALLINT|INT|BIGINT|FLOAT|DOUBLE|DECIMAL)") &&
              try_variant_get(sub, "$", "double") === lit(x)
          case _ =>
            val l = n match {
              case i: Int => i.toLong
              case lv: Long => lv
              case other => throw new IllegalArgumentException(
                s"_contains on '$field'.$k: unexpected scalar $other")
            }
            ((t.rlike("^(TINYINT|SMALLINT|INT|BIGINT)$") &&
              try_variant_get(sub, "$", "long") === lit(l)) ||
             (t.rlike("^(FLOAT|DOUBLE|DECIMAL)") &&
              try_variant_get(sub, "$", "double") === lit(l.toDouble)))
        }
    }
  }
  /** Hasura `_contained_in` (jsonb `<@`): the column's top-level
    * object is a subset of the literal — every column key appears in
    * the literal, and where the column CARRIES the key its value must
    * equal the literal's (a column-side JSON null never equals a
    * scalar literal, matching jsonb: `{"k": null} <@ {"k": 69}` is
    * false; null literal VALUES are rejected at construction like
    * `_contains`). */
  final case class JsonContainedIn(field: String,
      pairs: Seq[(String, Any)]) extends BoolExp {
    pairs.foreach { case (k, v) =>
      jsonKeyName(k, s"_contained_in on '$field'")
      jsonScalar(v, s"_contained_in on '$field'.$k")
    }
    private[api] def toColumn: Column = {
      val keys = json_object_keys(col(field))
      val litKeys = array(pairs.map(p => lit(p._1)): _*)
      val keySubset =
        if (pairs.isEmpty) size(keys) === 0
        else forall(keys, k => array_contains(litKeys, k))
      pairs.foldLeft(keySubset) { case (acc, (k, v)) =>
        // key absent → vacuously fine; key PRESENT → the TYPED
        // equality must hold (a JSON-null value types VOID and
        // matches no scalar — the jsonb answer)
        acc && (!array_contains(keys, k) || typedJsonEq(field, k, v))
      }
    }
  }
  /** RELATIONSHIP predicate — Hasura's `where: {orders: {...}}`:
    * the row qualifies when AT LEAST ONE related child row satisfies
    * `pred` (SQL EXISTS). Composes freely under `_and`/`_or`/`_not`
    * (`Not(RelPred(...))` is NOT EXISTS — the anti-join), and `pred`
    * may itself contain relationship predicates (nested EXISTS).
    * Compiled by [[run]]: each predicate decorrelates to a
    * distinct-child-keys build + one left join flag on the parent key,
    * so the whole where-tree stays one row-local boolean over flag
    * columns — the standard decorrelation, and the reason this cannot
    * be a bare Column (toColumn rejects loudly). */
  final case class RelPred(table: String, childKey: String,
      parentKey: String, pred: BoolExp) extends BoolExp {
    private[api] def toColumn: Column =
      throw new IllegalArgumentException(
        s"relationship predicate on '$table' has no row-local column " +
          "form — run() compiles it (runRoot cannot load child tables)")
  }

  /** A decorrelated [[RelPred]]'s flag column — internal to [[run]]'s
    * rewrite; absent (null) flags read as false. */
  private[api] final case class FlagRef(name: String) extends BoolExp {
    private[api] def toColumn: Column = coalesce(col(name), lit(false))
  }

  private[api] def hasRelPred(e: BoolExp): Boolean = e match {
    case RelPred(_, _, _, _) => true
    case And(es @ _*) => es.exists(hasRelPred)
    case Or(es @ _*) => es.exists(hasRelPred)
    case Not(x) => hasRelPred(x)
    case _ => false
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

  /** Null placement follows the reference's engine (Hasura/Postgres):
    * asc puts nulls LAST, desc puts nulls FIRST — i.e. null sorts as
    * larger than every value. Spark's bare asc/desc defaults are the
    * OPPOSITE (nulls first on asc), which would silently diverge for
    * nullable order columns. `nullsFirst` overrides the default with
    * Hasura's explicit `asc_nulls_first` / `desc_nulls_last` family. */
  final case class Order(field: String, desc: Boolean = false,
      nullsFirst: Option[Boolean] = None) {
    private[api] def toColumn: Column = toColumnOn(col(field))
    /** The same direction/nulls rule over a stand-in column — used by
      * the hidden pre-attach sort keys (see [[runOn]]). */
    private[api] def toColumnOn(c: Column): Column = (desc, nullsFirst) match {
      case (false, None | Some(false)) => c.asc_nulls_last
      case (false, Some(true)) => c.asc_nulls_first
      case (true, None | Some(true)) => c.desc_nulls_first
      case (true, Some(false)) => c.desc_nulls_last
    }
  }

  // ---- relationships -------------------------------------------------

  /** One field of a nested object: `as` is the response key; an
    * optional (roundTo, printf) rendering matches q40's
    * cross-engine-stable price formatting; `cast` coerces the field
    * (e.g. to "long") for cross-engine-stable JSON rendering. */
  final case class NestedField(as: String, field: String,
      format: Option[(Int, String)] = None, cast: Option[String] = None)

  /** Child-array relationship (users{nfts{...}}): children fold to ONE
    * sorted array column per parent — one shuffle on the parent key,
    * never a flat fan-out row set (q40's shape). `subs` nest further
    * relationships INSIDE each child object — a chain
    * (users{nfts{bids{...}}}) or SIBLINGS at one level
    * (users{nfts{offers{...} bids{...}}}, the reference's own FK
    * shape, x/common/types.go:51-52) — compiled bottom-up exactly
    * like the handwritten q49: the deepest level aggregates first,
    * each level joins its children pre-folded one sub at a time, so
    * fan-out never multiplies across levels OR across siblings.
    * Top-level arrays render `to_json`; inner arrays stay structured
    * inside the parent struct. A sub with `single` set is an OBJECT
    * relationship (offers{nft{...}}): its rendered value is the one
    * child struct itself, null when absent.
    *
    * `joinType` governs how THIS relationship attaches to its parent:
    * "inner" (default — q40/q49's shape) drops parents with no
    * children; "left" keeps them, rendering an EMPTY array — Hasura's
    * semantics, and the only way a middle level with zero grandchildren
    * stays visible inside its own parent's array.
    *
    * Per-relationship arguments (Hasura lets EVERY nested selection
    * carry its own `nfts(where: ..., order_by: ..., limit: n)`,
    * README.md:92-155): `where` filters the children before the fold
    * (it reaches the child's parquet scan), `orderBy` orders each
    * parent's array, and `limit` keeps the top-n children PER PARENT —
    * compiled as a `row_number() <= n` window on the child key before
    * the fold, so the cut happens inside the child's one shuffle, never
    * as a global sort or a post-array slice of unbounded fan-out.
    * `limit` requires `orderBy` (a nondeterministic top-n can never
    * hash-match an oracle), and `orderBy` should reach a total order
    * (include a unique tie-break field) for the same reason. */
  final case class Nested(as: String, table: String,
      childKey: String, parentKey: String, fields: Seq[NestedField],
      subs: Seq[Nested] = Nil, joinType: String = "inner",
      where: Option[BoolExp] = None, orderBy: Seq[Order] = Nil,
      limit: Option[Int] = None, offset: Int = 0,
      distinctOn: Seq[String] = Nil,
      single: Boolean = false) {
    require(fields.nonEmpty || subs.nonEmpty,
      s"nested '$as' selects no fields")
    // response keys are unique WITHIN a level (spec rule 5.3.2), and
    // each sibling relationship occupies one — `nfts { offers bids }`
    // is two siblings, `recent: orders(...)` + `big: orders(...)` the
    // same relationship twice under distinct aliases
    require((fields.map(_.as) ++ subs.map(_.as)).distinct.size ==
      fields.size + subs.size,
      s"nested '$as': duplicate response key(s) " +
        (fields.map(_.as) ++ subs.map(_.as)).diff(
          (fields.map(_.as) ++ subs.map(_.as)).distinct)
          .distinct.mkString(", "))
    require(joinType == "inner" || joinType == "left",
      s"nested '$as': joinType must be inner or left")
    // an OBJECT relationship (Hasura many-to-one): `childKey` is the
    // related table's KEY, so the "group" is at most one row and the
    // response is that object (or null) — slicing/ordering arguments
    // have no one-row semantics and reject rather than silently no-op
    require(!single || (orderBy.isEmpty && limit.isEmpty &&
      offset == 0 && distinctOn.isEmpty),
      s"object relationship '$as': order_by/limit/offset/distinct_on " +
        "have no single-object semantics")
    require(limit.isEmpty || orderBy.nonEmpty,
      s"nested '$as': limit needs orderBy for a deterministic top-n")
    require(offset == 0 || orderBy.nonEmpty,
      s"nested '$as': offset needs orderBy for a deterministic skip")
    require(offset >= 0, s"nested '$as': offset must be >= 0")
    require(distinctOn.isEmpty ||
      (orderBy.length > distinctOn.length &&
        orderBy.take(distinctOn.length).map(_.field) == distinctOn),
      s"nested '$as': distinct_on columns must LEAD order_by (the " +
        "Hasura/Postgres rule) and leave a tie-breaking tail")
  }

  /** One aggregate over a child relationship (the *_aggregate surface).
    * Each field has two halves: `agg` runs inside the child's
    * per-parent-key fold, `post` repairs the left-join null for parents
    * with no children (count reads 0 and sum reads 0.0, as a flat
    * left-join + groupBy would produce; min/max/avg stay null, matching
    * Hasura). */
  sealed trait AggField {
    def as: String
    private[api] def agg(child: DataFrame): Column
    private[api] def post(c: Column): Column = c
  }
  final case class CountOf(field: String, as: String) extends AggField {
    private[api] def agg(child: DataFrame): Column = count(child(field)).as(as)
    override private[api] def post(c: Column): Column = coalesce(c, lit(0L))
  }
  /** Plain row count — Hasura's root-aggregate `count` (COUNT(*)); at
    * the root there is no child key to stand in for it. */
  final case class CountAll(as: String = "count") extends AggField {
    private[api] def agg(child: DataFrame): Column = count(lit(1)).as(as)
    override private[api] def post(c: Column): Column = coalesce(c, lit(0L))
  }
  /** Hasura's `count(columns: c, distinct: true)`. */
  final case class CountDistinctOf(field: String, as: String)
      extends AggField {
    private[api] def agg(child: DataFrame): Column =
      countDistinct(child(field)).as(as)
    override private[api] def post(c: Column): Column = coalesce(c, lit(0L))
  }
  final case class SumOf(field: String, as: String, roundTo: Int = 2)
      extends AggField {
    private[api] def agg(child: DataFrame): Column = sum(child(field)).as(as)
    override private[api] def post(c: Column): Column =
      round(coalesce(c, lit(0.0)), roundTo)
  }
  final case class MinOf(field: String, as: String) extends AggField {
    private[api] def agg(child: DataFrame): Column = min(child(field)).as(as)
  }
  final case class MaxOf(field: String, as: String) extends AggField {
    private[api] def agg(child: DataFrame): Column = max(child(field)).as(as)
  }
  final case class AvgOf(field: String, as: String) extends AggField {
    private[api] def agg(child: DataFrame): Column = avg(child(field)).as(as)
  }

  /** Hasura's extended statistical aggregates (auto-generated for every
    * numeric column): `stddev`/`variance` are the SAMPLE variants (the
    * Postgres defaults Hasura inherits), `*_pop` the population ones.
    * Null semantics ride the built-ins: sample variants are null for
    * n<2, population for n=0 — no left-join repair, matching Hasura's
    * null for childless parents (the min/max/avg posture). Rounded for
    * a stable comparison surface (sqrt/sum-of-squares ulp skew). */
  final case class StddevOf(field: String, as: String,
      pop: Boolean = false, roundTo: Int = 4) extends AggField {
    private[api] def agg(child: DataFrame): Column =
      (if (pop) stddev_pop(child(field))
       else stddev_samp(child(field))).as(as)
    override private[api] def post(c: Column): Column = round(c, roundTo)
  }
  final case class VarianceOf(field: String, as: String,
      pop: Boolean = false, roundTo: Int = 4) extends AggField {
    private[api] def agg(child: DataFrame): Column =
      (if (pop) var_pop(child(field)) else var_samp(child(field))).as(as)
    override private[api] def post(c: Column): Column = round(c, roundTo)
  }

  /** Aggregate relationship: left join so parents without children
    * still answer (Hasura returns them with count 0). `where` filters
    * the children before aggregation (the `nfts_aggregate(where: ...)`
    * surface); `orderBy`+`limit` aggregate only each parent's top-n
    * children, via the same pre-fold row_number window as [[Nested]]. */
  /** `prefix` carries a GraphQL ALIAS on the aggregate relationship
    * (`recent: orders_aggregate(...)`): Hasura nests the response
    * under the alias key; this engine's response is FLAT, so the
    * alias prefixes every output column (`recent_count`) — which is
    * also what lets ONE request select the same relationship's
    * aggregates twice under different aliases (the dashboard idiom)
    * without column collisions. */
  final case class AggRel(table: String, childKey: String,
      parentKey: String, aggs: Seq[AggField], joinType: String = "left",
      where: Option[BoolExp] = None, orderBy: Seq[Order] = Nil,
      limit: Option[Int] = None, offset: Int = 0,
      distinctOn: Seq[String] = Nil,
      nodes: Seq[String] = Nil, prefix: Option[String] = None) {
    /** Effective output name of one aggregate (alias-prefixed). */
    private[api] def out(name: String): String =
      prefix.map(p => s"${p}_$name").getOrElse(name)
    require(aggs.nonEmpty || nodes.nonEmpty,
      "aggregate relationship selects no aggregates")
    require(!aggs.exists(_.as == "nodes") || nodes.isEmpty,
      "aggregate relationship: an aggregate named 'nodes' collides " +
        "with the nodes arm")
    require(limit.isEmpty || orderBy.nonEmpty,
      "aggregate relationship: limit needs orderBy for a deterministic top-n")
    require(offset == 0 || orderBy.nonEmpty,
      "aggregate relationship: offset needs orderBy for a deterministic skip")
    require(offset >= 0, "aggregate relationship: offset must be >= 0")
    // same rule as Nested: a right/full join would surface aggregate
    // rows for parents the request filtered out (null parent fields),
    // silently — loud at construction instead
    require(joinType == "inner" || joinType == "left",
      s"aggregate relationship: joinType must be inner|left, " +
        s"got '$joinType'")
    require(distinctOn.isEmpty ||
      (orderBy.length > distinctOn.length &&
        orderBy.take(distinctOn.length).map(_.field) == distinctOn),
      "aggregate relationship: distinct_on columns must LEAD order_by " +
        "(the Hasura/Postgres rule) and leave a tie-breaking tail")
  }

  // ---- the request ---------------------------------------------------

  /** One read request. `fields` are the parent's scalar selections;
    * with relationships present they must identify the parent row (its
    * key columns), exactly as Hasura keys a nested response by the
    * parent row. Any number of relationships may be attached — each
    * compiles INDEPENDENTLY to one pre-aggregated row per parent key
    * and joins back, so two array relationships never cross-multiply
    * (the fan-out × fan-out bug a single flat join would produce). */
  /** A hidden ORDERING aggregate — Hasura's `order_by:
    * {<rel>_aggregate: {count: desc}}` (order parents by a child
    * aggregate): `as` is the hidden column name `orderBy` entries
    * reference; the aggregate value (post-repaired: counts/sums of
    * childless parents order as 0) joins onto the parent per key and
    * is dropped after ordering.
    *
    * `where` filters the child rows BEFORE the aggregate — the hook
    * [[graft.api.Permissions]] uses for roles whose grant on the
    * child table is row-filtered: Hasura computes the ordering
    * aggregate over the rows the role can see, so the grant filter
    * threads here instead of denying the order (relationship
    * predicates inside the filter decorrelate like any relationship
    * where). No user-facing GraphQL spelling exists, so the printer
    * refuses to render a filtered ordering aggregate. */
  final case class OrderAgg(as: String, table: String, childKey: String,
      parentKey: String, agg: AggField,
      where: Option[BoolExp] = None) {
    require(as != agg.as,
      s"orderAgg '$as': the hidden name must differ from the " +
        "aggregate's internal name")
  }

  final case class Request(
      table: String,
      fields: Seq[String],
      where: Option[BoolExp] = None,
      orderBy: Seq[Order] = Nil,
      offset: Int = 0,
      limit: Option[Int] = None,
      nested: Seq[Nested] = Nil,
      aggRels: Seq[AggRel] = Nil,
      distinctOn: Seq[String] = Nil,
      orderAggs: Seq[OrderAgg] = Nil,
      fieldAs: Map[String, String] = Map.empty) {
    // a relationship-only selection is valid (Hasura serves
    // `{ customer { orders {...} } }` and relationship-only mutation
    // returning); only a selection with NOTHING at all is malformed
    require(fields.nonEmpty || nested.nonEmpty || aggRels.nonEmpty,
      s"request on '$table' selects no fields")
    // `fields` are RESPONSE keys (GraphQL aliases included); `fieldAs`
    // maps an aliased response key back to its source column. Spec
    // rule 5.3.2: response keys are unique — a duplicate would
    // silently drop one selection in the flat-columns answer.
    require(fields.distinct.size == fields.size,
      s"request on '$table': duplicate response key(s) " +
        fields.diff(fields.distinct).distinct.mkString(", "))
    require(fieldAs.keySet.subsetOf(fields.toSet),
      s"request on '$table': fieldAs names absent response key(s) " +
        (fieldAs.keySet -- fields).mkString(", "))
    require(orderAggs.map(_.as).forall(a => orderBy.exists(_.field == a)),
      s"request on '$table': every orderAgg must be referenced by an " +
        "order_by entry (an unreferenced join is a silent no-op)")
    // Hasura's rule: order_by must lead with the distinct_on columns,
    // otherwise "first row per group" is undefined. The STRICT form
    // here also demands a tie-breaking tail (same reasoning as
    // limit-needs-orderBy on [[Nested]]: a nondeterministic first-row
    // can never hash-match an oracle).
    require(distinctOn.isEmpty ||
      (orderBy.length > distinctOn.length &&
        orderBy.take(distinctOn.length).map(_.field) == distinctOn),
      s"request on '$table': order_by must lead with the distinct_on " +
        "columns and add a tie-breaking tail")
  }

  /** Hasura's ROOT-level `<table>_aggregate` query: aggregates over
    * the (filtered) table itself, not over a child relationship —
    * `{ orders_aggregate(where: ...) { aggregate { count sum {...} } } }`.
    * Answers as ONE row of named aggregate columns (the response
    * object flattened, the relationship-aggregate naming). */
  /** `nodes`: Hasura's rows-next-to-their-aggregates arm — the
    * selected fields of every row the where admitted, rendered as ONE
    * deterministic JSON array column (`sort_array` by the first
    * selected field; pick a unique leading field for a total order).
    * Empty = no nodes arm. */
  final case class AggRequest(table: String,
      where: Option[BoolExp] = None, aggs: Seq[AggField],
      nodes: Seq[String] = Nil, orderBy: Seq[Order] = Nil,
      limit: Option[Int] = None, offset: Int = 0) {
    require((limit.isEmpty && offset == 0) || orderBy.nonEmpty,
      s"aggregate request on '$table': limit/offset without order_by " +
        "aggregates an undefined subset")
    require(aggs.nonEmpty, s"aggregate request on '$table' selects " +
      "no aggregates")
    require(aggs.map(_.as).distinct.length == aggs.length,
      s"aggregate request on '$table': duplicate output name(s) " +
        aggs.map(_.as).groupBy(identity).filter(_._2.size > 1)
          .keys.mkString(", "))
    require(!aggs.exists(_.as == "nodes") || nodes.isEmpty,
      s"aggregate request on '$table': an aggregate named 'nodes' " +
        "collides with the nodes arm")
  }

  /** Compile + run a root aggregate request: one filter (predicates
    * push to the scan) + one two-phase global aggregate — the partial
    * side runs map-side, so the exchange carries one row per
    * partition, the cheapest query shape there is at any scale. */
  def runAggregate(s: SparkSession, dir: String, r: AggRequest): DataFrame =
    runAggregateOn(graft.Tables.load(s, dir, r.table), r)

  /** [[runAggregate]] over an ALREADY-LOADED base frame — what the
    * live-aggregate subscription re-evaluates per trigger. */
  def runAggregateOn(base: DataFrame, r: AggRequest): DataFrame = {
    val f0 = r.where.map(w => base.filter(w.toColumn)).getOrElse(base)
    // Hasura aggregates the SLICED set when order_by/limit are given
    // — a TakeOrdered cut feeding the aggregate, not a full-table pass
    val f =
      if (r.orderBy.isEmpty) f0
      else {
        val ord = f0.orderBy(r.orderBy.map(_.toColumn): _*)
        val off = if (r.offset > 0) ord.offset(r.offset) else ord
        r.limit.map(off.limit).getOrElse(off)
      }
    // nodes render in the request's order_by order (the slice order —
    // Hasura's behavior); without an order_by the canonical sort_array
    // keeps the JSON hash-deterministic where Hasura's is unspecified
    val cols = r.aggs.map(_.agg(f)) ++
      (if (r.nodes.isEmpty) Nil
       else if (r.orderBy.isEmpty)
         Seq(to_json(sort_array(collect_list(
           struct(r.nodes.map(col): _*))), jsonOpts).as("nodes"))
       else Seq(to_json(orderedCollect(r.orderBy, s"${r.table}.nodes",
         col(_), r.nodes.map(f => col(f).as(f)), r.nodes,
         structOrderable(f, r.nodes.map(col))), jsonOpts).as("nodes")))
    val outs = r.aggs.map(a => a.post(col(a.as)).as(a.as)) ++
      (if (r.nodes.isEmpty) Nil else Seq(col("nodes")))
    f.agg(cols.head, cols.tail: _*).select(outs: _*)
  }

  /** Apply a relationship's per-parent row slice: `distinct_on`
    * (first child per distinct-group, Postgres DISTINCT ON order), then
    * `offset`/`limit` (skip m, keep the next k, per parent). Both are
    * `row_number()` windows keyed on the child key — the cut rides the
    * same hash partitioning the fold right after it reuses: one
    * shuffle for filter+slice+fold, never a global sort (per-parent
    * fan-out bounds the heap, not the corpus). `resolve` maps a field
    * name to its column in the PRE-JOIN child (sub-relationship joins
    * can shadow names). */
  private def childSlice(child: DataFrame, key: Column,
      order: Seq[Order], resolve: String => Column,
      distinctOn: Seq[String], offset: Int,
      limit: Option[Int]): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val distincted =
      if (distinctOn.isEmpty) child
      else {
        // first row per (parent, group) by the order tail — DISTINCT ON
        // applies BEFORE offset/limit, as in Postgres
        // order fields resolve through `resolve` like the partition
        // columns — a sub-relationship's array column can SHADOW an
        // order field's name (bare col() was ambiguous there)
        val w = W.partitionBy(key +: distinctOn.map(resolve): _*)
          .orderBy(order.drop(distinctOn.length)
            .map(o => o.toColumnOn(resolve(o.field))): _*)
        child.withColumn("__don", row_number().over(w))
          .filter(col("__don") === 1).drop("__don")
      }
    if (offset == 0 && limit.isEmpty) distincted
    else {
      val w = W.partitionBy(key)
        .orderBy(order.map(o => o.toColumnOn(resolve(o.field))): _*)
      val hi = limit.map(k => offset.toLong + k)
      distincted.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") > offset &&
          hi.map(col("__rn") <= _).getOrElse(lit(true)))
        .drop("__rn")
    }
  }

  /** Compile one nested relationship bottom-up: one row per child-key
    * value, carrying the sorted struct array. A `sub` relationship is
    * compiled first and its array joins INTO this level's struct —
    * q49's lineitem-before-orders aggregation order, recursively. */
  /** Filter `df` by `w`, decorrelating any relationship predicates
    * first (the root-where machinery applied at a relationship level —
    * Hasura allows `orders(where: {items: {...}})`); the helper flag
    * columns are dropped after the filter so child shapes stay
    * unpolluted. */
  private def filterRel(spk: SparkSession, dir: String, df: DataFrame,
      w: BoolExp): DataFrame =
    // ONE decorrelate-filter-drop definition with [[filterWith]]
    filterWith(graft.Tables.load(spk, dir, _), df, w)

  /** Restrict a child arm to rows whose key can reach a surviving
    * parent — sideways information passing (guide §3.2). Without it a
    * relationship arm aggregates/windows over the WHOLE child table and
    * only the attach join discards the unreachable groups, however
    * selective the parent's where is (q201: two lineitem-wide arms for
    * 40 customers). A left-semi join against the parent's filtered,
    * pre-slice key projection is result-identical — child groups
    * without a parent key never appear in the response (inner attach
    * drops them; left attach preserves PARENTS, not children) — but
    * prunes the child scan to the selected keys before the expensive
    * per-key work. Only applied when the parent is actually restricted
    * (gated by the caller): an unrestricted parent's key set is the
    * whole table and the semi-join would be pure overhead. AQE
    * broadcasts the key set when it is small; when it is not, the
    * semi-join degrades to the shuffle the aggregate pays anyway. */
  private def restrictToParent(child: DataFrame, childKey: Column,
      parentKeys: Option[DataFrame]): DataFrame =
    parentKeys match {
      case Some(pk) =>
        child.join(pk, childKey === pk("__parent_keys"), "left_semi")
      case None => child
    }

  private def compileNested(s: SparkSession, dir: String,
      n: Nested, parentKeys: Option[DataFrame] = None): DataFrame = {
    val loaded = graft.Tables.load(s, dir, n.table)
    // the child's own where: applied at the leaf so it reaches the scan
    val own = n.where.map(filterRel(s, dir, loaded, _)).getOrElse(loaded)
    val child0 = restrictToParent(own, own(n.childKey), parentKeys)
    val keyAlias = s"__key_${n.as}"
    // each sub-relationship pre-aggregates to one row per key and
    // joins back — SIBLINGS under one level compose exactly like the
    // root's fold (never a flat multi-child join, so two siblings'
    // fan-outs cannot cross-multiply)
    // each sub's array column is referenced by ATTRIBUTE, not name: a
    // sub-relationship alias may legally SHADOW a child column name
    // (response keys and table columns are different namespaces), and
    // a bare col(alias) would be ambiguous after the join
    var subCols = Map.empty[String, Column]
    // grandchild arms inherit the restriction: once THIS level is
    // pruned (own where or parent keys), its key projection restricts
    // each sub the same way
    val restricted = parentKeys.nonEmpty || n.where.nonEmpty
    val joined = n.subs.foldLeft(child0) { (acc, m) =>
      val subAgg = compileNested(s, dir, m,
        if (restricted)
          Some(child0.select(child0(m.parentKey).as("__parent_keys")))
        else None)
      subCols += m.as -> subAgg(m.as)
      acc.join(subAgg,
        child0(m.parentKey) === subAgg(s"__key_${m.as}"), m.joinType)
    }
    val child = childSlice(joined, child0(n.childKey), n.orderBy,
      child0(_), n.distinctOn, n.offset, n.limit)
    val fs = n.fields.map { f =>
      val c0 =
        if (f.field == "__typename") lit(n.table) else child0(f.field)
      val c1 = f.cast.map(c0.cast).getOrElse(c0)
      f.format match {
        case Some((r, fmt)) => format_string(fmt, round(c1, r)).as(f.as)
        case None => c1.as(f.as)
      }
    } ++ n.subs.map { m =>
      // under a left attach, a child with zero grandchildren carries an
      // EMPTY inner array, not a null (Hasura renders items: []) — the
      // void-typed empty literal coerces to the array's struct type.
      // An inner OBJECT relationship is the single struct itself
      // (null when the referenced row is absent, Hasura's shape)
      if (m.single) element_at(subCols(m.as), 1).as(m.as)
      else if (m.joinType == "left")
        coalesce(subCols(m.as), array()).as(m.as)
      else subCols(m.as).as(m.as)
    }
    val grouped = child.groupBy(child0(n.childKey).as(keyAlias))
    if (n.orderBy.isEmpty)
      grouped.agg(sort_array(collect_list(struct(fs: _*))).as(n.as))
    else {
      val outNames = n.fields.map(_.as) ++ n.subs.map(_.as)
      grouped.agg(orderedCollect(n.orderBy, s"nested '${n.as}'",
        child0(_), fs, outNames,
        structOrderable(child, fs)).as(n.as))
    }
  }

  /** ORDERED struct-array collect — the selection's `order_by` honored
    * INSIDE the rendered array, the way Hasura emits relationship rows
    * and `nodes`: collect with hidden `__ord_i` sort keys
    * (collect_list order is nondeterministic), `array_sort` by them,
    * then strip the keys back out of each struct.
    *
    * The comparator is null-AWARE: `when(x < y)` is null (not false)
    * for a null operand, which would fall through to the tie-break and
    * make the comparator intransitive — array_sort order undefined.
    * Null compares as larger than everything (the [[Order]] rule),
    * checked before the value comparisons. The in-array comparator
    * implements only the DEFAULT null rule; explicit nulls placement
    * inside an array sort would silently sort wrong — loud instead.
    *
    * `fields` are the ALREADY-ALIASED payload columns; `names` their
    * output names (the transform re-projects by name). Scale: the
    * sort is per-array (bounded by the relationship slice), riding
    * the same per-key aggregation exchange as the unordered render.
    *
    * Rows TIED under the order_by fall through to a canonical
    * comparison over the full payload struct (the sort_array rule the
    * no-order_by render uses) so the rendered array stays
    * hash-deterministic even when the request doesn't spell a total
    * order — collect_list arrival order must never leak through.
    * `payloadOrderable` gates the fall-through: a payload carrying an
    * unorderable type (a map column) keeps ties in arrival order, as
    * before, instead of failing analysis. */
  /** Whether the payload struct `fs` projects to an ORDERABLE type on
    * `df` (driver-only analysis of one projection) — gates
    * [[orderedCollect]]'s canonical tie fall-through: a map-typed
    * payload column would fail analysis inside the comparator. */
  private def structOrderable(df: DataFrame, fs: Seq[Column]): Boolean =
    scala.util.Try(
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(
        df.select(struct(fs: _*).as("__p")).schema.head.dataType))
      .getOrElse(false)

  private def orderedCollect(orderBy: Seq[Order], at: String,
      ordSrc: String => Column, fields: Seq[Column],
      names: Seq[String], payloadOrderable: Boolean = true): Column = {
    val ordFs = orderBy.zipWithIndex.map { case (o, i) =>
      ordSrc(o.field).as(s"__ord_$i") }
    val cmp = (l: Column, r: Column) => {
      // the tie base: canonical ascending comparison of the payload
      // structs (struct `<` is Spark's interpreted field-by-field
      // ordering — total and null-deterministic for orderable types)
      val tie =
        if (!payloadOrderable) lit(0)
        else {
          val lp = struct(names.map(l.getField): _*)
          val rp = struct(names.map(r.getField): _*)
          when(lp < rp, lit(-1)).when(lp > rp, lit(1)).otherwise(lit(0))
        }
      orderBy.zipWithIndex.foldRight(tie) { case ((o, i), acc) =>
        val a = l.getField(s"__ord_$i")
        val b = r.getField(s"__ord_$i")
        // nulls place by the EFFECTIVE rule: the explicit
        // asc_nulls_first family when spelled, else the engine
        // default (null largest: asc_nulls_last / desc_nulls_first)
        // — checked BEFORE the value comparison so the comparator
        // stays transitive (`when(x < y)` is null for null operands)
        val nullsFirst = o.nullsFirst.getOrElse(o.desc)
        val (x, y) = if (o.desc) (b, a) else (a, b)
        when(a.isNull && b.isNull, acc)
          .when(a.isNull, lit(if (nullsFirst) -1 else 1))
          .when(b.isNull, lit(if (nullsFirst) 1 else -1))
          .when(x < y, lit(-1)).when(x > y, lit(1)).otherwise(acc)
      }
    }
    transform(
      array_sort(collect_list(struct(ordFs ++ fields: _*)), cmp),
      x => struct(names.map(nm => x.getField(nm).as(nm)): _*))
  }

  /** The ROOT-TABLE slice of [[run]] over an ALREADY-LOADED DataFrame —
    * the entry the SUBSCRIPTION path uses (its snapshot lives in the
    * stream's state, not in a directory): where → distinct_on →
    * fields → order/offset/limit, relationship-free. [[run]] delegates
    * its relationship-free case here, so batch and subscription serve
    * one compiled shape. */
  def runRoot(base0: DataFrame, req: Request): DataFrame = {
    require(req.nested.isEmpty && req.aggRels.isEmpty,
      s"runRoot on '${req.table}': relationship selections need the " +
        "table directory (use run)")
    require(!req.where.exists(hasRelPred),
      s"runRoot on '${req.table}': relationship predicates need the " +
        "table directory (use run)")
    require(req.orderAggs.isEmpty,
      s"runRoot on '${req.table}': ordering aggregates need the " +
        "table directory (use run)")
    val base = rootSlice(base0, req)
    // the run() pre-projection sort discipline: order by TABLE
    // columns before the aliasing select, so a response key shadowing
    // a different real column can never hijack the sort
    val ordered =
      if (req.orderBy.isEmpty) base
      else base.orderBy(req.orderBy.map(_.toColumn): _*)
    val shaped =
      ordered.select(req.fields.map(
        typenameOr(base0, req.table, req.fieldAs)): _*)
    val off = if (req.offset > 0) shaped.offset(req.offset) else shaped
    req.limit.map(off.limit).getOrElse(off)
  }

  /** Field projection with the one meta-field every GraphQL object
    * carries: `__typename` answers the enclosing table's type name as
    * a constant column (Hasura's spelling of the spec meta-field) —
    * it reads no data, so it is exempt from column allowlists
    * ([[Permissions]]) and never reaches the scan. */
  private def typenameOr(base0: DataFrame, table: String,
      fieldAs: Map[String, String] = Map.empty)(f: String): Column = {
    val src = fieldAs.getOrElse(f, f)
    // an aliased __typename (`t: __typename`) is still the constant
    // type-name answer, under the caller's response key
    if (src == "__typename") lit(table).as(f)
    else if (src == f) base0(f)
    else base0(src).as(f)
  }

  /** where + distinct_on over the loaded root table — shared by [[run]]
    * and [[runRoot]]. */
  private def rootSlice(base0: DataFrame, req: Request): DataFrame = {
    val based = req.where.map(w => base0.filter(w.toColumn)).getOrElse(base0)
    // distinct_on (Hasura/Postgres DISTINCT ON): first row per group by
    // the order_by TAIL — a row_number window on the group key, so the
    // cut rides one hash shuffle on the distinct columns, never a
    // global sort or a driver-side pass
    if (req.distinctOn.isEmpty) based else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(req.distinctOn.map(based(_)): _*)
        .orderBy(req.orderBy.drop(req.distinctOn.length)
          .map(_.toColumn): _*)
      based.withColumn("__don", row_number().over(w))
        .filter(col("__don") === 1).drop("__don")
    }
  }

  /** Compile + run a request against the parquet tables in `dir`. */
  /** Decorrelate every [[RelPred]] in `w` against `base`: per
    * predicate, build the DISTINCT satisfying child keys (recursing
    * for nested relationship predicates), left-join them onto the
    * parent as a flag column, and rewrite the leaf to [[FlagRef]] —
    * after which the whole tree is one row-local boolean. Scale: one
    * distinct-key aggregation (map-side partial) + one key join per
    * predicate; AQE broadcasts selective key sets. */
  /** The RelPred walk itself — ONE definition shared by
    * [[decorrelate]] (eager joins, run()'s path) and the stream
    * serve's deferred variant ([[Permissions]]): per predicate, the
    * DISTINCT satisfying child keys build (recursing for nested
    * relationship predicates) as a flag-carrying key-set frame, and
    * the leaf rewrites to [[FlagRef]]. `pin = true` localCheckpoints
    * each key set eagerly — the stream serve's per-serve staleness
    * contract (batch callers keep lazy plans so pushdown composes). */
  private[api] def decorrelateJoins(s: SparkSession, dir: String,
      w: BoolExp, ctr: java.util.concurrent.atomic.AtomicInteger,
      pin: Boolean = false): (Seq[(DataFrame, String)], BoolExp) =
    decorrelateJoinsWith(graft.Tables.load(s, dir, _), w, ctr, pin)

  /** [[decorrelateJoins]] with an EXPLICIT child loader — the
    * mutation path (r18) resolves relationship-predicate children
    * from its STORE REGISTRY's current folded state (Hasura's
    * same-transaction visibility), not the fixture directory. */
  private[api] def decorrelateJoinsWith(
      loadChild: String => DataFrame, w: BoolExp,
      ctr: java.util.concurrent.atomic.AtomicInteger,
      pin: Boolean = false): (Seq[(DataFrame, String)], BoolExp) = {
    val joins = Seq.newBuilder[(DataFrame, String)]
    def walk(e: BoolExp): BoolExp = e match {
      case RelPred(table, childKey, parentKey, pred) =>
        val child0 = loadChild(table)
        val (child, p2) =
          if (hasRelPred(pred))
            decorrelateWith(loadChild, child0, pred, ctr)
          else (child0, pred)
        val flag = s"__rp_${ctr.getAndIncrement()}"
        val keys0 = child.filter(p2.toColumn)
          .select(col(childKey).as(parentKey)).distinct()
          .withColumn(flag, lit(true))
        val keys = if (pin) keys0.localCheckpoint(true) else keys0
        joins += ((keys, parentKey))
        FlagRef(flag)
      case And(es @ _*) => And(es.map(walk): _*)
      case Or(es @ _*) => Or(es.map(walk): _*)
      case Not(x) => Not(walk(x))
      case leaf => leaf
    }
    val w2 = walk(w)
    (joins.result(), w2)
  }

  private[api] def decorrelate(s: SparkSession, dir: String,
      base: DataFrame, w: BoolExp,
      ctr: java.util.concurrent.atomic.AtomicInteger)
      : (DataFrame, BoolExp) =
    decorrelateWith(graft.Tables.load(s, dir, _), base, w, ctr)

  private[api] def decorrelateWith(loadChild: String => DataFrame,
      base: DataFrame, w: BoolExp,
      ctr: java.util.concurrent.atomic.AtomicInteger)
      : (DataFrame, BoolExp) = {
    val (joins, w2) = decorrelateJoinsWith(loadChild, w, ctr)
    (joins.foldLeft(base) { case (d, (keys, pk)) =>
      d.join(keys, Seq(pk), "left") }, w2)
  }

  /** Filter `df` by `w` with relationship predicates decorrelated
    * through `loadChild` — the [[run]] root-where machinery exposed
    * for the MUTATION executor (r18): flag columns drop after the
    * filter so write deltas stay schema-clean. */
  private[api] def filterWith(loadChild: String => DataFrame,
      df: DataFrame, w: BoolExp): DataFrame =
    if (!hasRelPred(w)) df.filter(w.toColumn)
    else {
      val (d2, w2) = decorrelateWith(loadChild, df, w,
        new java.util.concurrent.atomic.AtomicInteger())
      val flags = d2.columns.filter(_.startsWith("__rp_")).toSeq
      d2.filter(w2.toColumn).drop(flags: _*)
    }

  def run(s: SparkSession, dir: String, req0: Request): DataFrame =
    runOn(s, dir, graft.Tables.load(s, dir, req0.table), req0)

  /** [[run]] over an ALREADY-LOADED root DataFrame — the entry the
    * LIVE-SUBSCRIPTION path uses for relationship-bearing requests:
    * the root rows come from the per-trigger latest snapshot (the
    * stream's state), while CHILD tables (relationship joins,
    * relationship predicates, ordering aggregates) still load from
    * the table directory. [[run]] delegates here, so batch and
    * subscription serve one compiled shape. */
  def runOn(s: SparkSession, dir: String, load0: DataFrame,
      req0: Request): DataFrame = {
    val (baseDec, reqDec) = req0.where match {
      case Some(w) if hasRelPred(w) =>
        val (df, w2) = decorrelate(s, dir, load0, w,
          new java.util.concurrent.atomic.AtomicInteger())
        (df, req0.copy(where = Some(w2)))
      case _ => (load0, req0)
    }
    // ordering aggregates: join each per-parent-key child aggregate as
    // a hidden post-repaired column; the final select drops it (Spark
    // re-attaches missing sort references), so the order rides one
    // pre-aggregated key join per entry — the AggRel shape
    // the hidden names land via withColumn, which silently REPLACES a
    // same-named column: colliding with a real table column would
    // serve the child aggregate under the table column's name, and
    // two orderAggs sharing a name would last-wins the sort — loud
    // (the GraphQL parser generates collision-free __oa_N names; this
    // guards the programmatic API)
    locally {
      val names = reqDec.orderAggs.map(_.as)
      require(names.distinct.size == names.size,
        s"orderAggs: duplicate hidden name(s) " +
          names.diff(names.distinct).distinct.mkString(", "))
      val clash = names.filter(baseDec.columns.contains)
      require(clash.isEmpty, s"orderAgg hidden name(s) " +
        s"${clash.mkString(", ")} collide with ${reqDec.table} " +
        "column(s) — withColumn would shadow the table data")
    }
    val base0 = reqDec.orderAggs
      .groupBy(oa => (oa.table, oa.childKey, oa.parentKey, oa.where))
      .toSeq
      .sortBy(_._2.head.as) // deterministic join order
      .zipWithIndex.foldLeft(baseDec) {
        // all ordering aggregates over ONE (relationship, filter)
        // share a single child scan + groupBy + join (the AggRel
        // multi-aggregate shape)
        case (df, (((table, childKey, parentKey, where), oas), i)) =>
          val loaded0 = graft.Tables.load(s, dir, table)
          // the child filter (a role's row grant) applies BEFORE the
          // aggregate — the ordering value sums only visible rows;
          // relationship predicates inside it decorrelate like any
          // relationship where
          val loaded =
            where.map(filterRel(s, dir, loaded0, _)).getOrElse(loaded0)
          val keyAlias = s"__oakey_$i"
          val aggCols = oas.map(_.agg.agg(loaded))
          val rel = loaded.groupBy(loaded(childKey).as(keyAlias))
            .agg(aggCols.head, aggCols.tail: _*)
          val joined = df.join(rel, df(parentKey) === rel(keyAlias), "left")
          oas.foldLeft(joined)((d, oa) =>
            d.withColumn(oa.as, oa.agg.post(col(oa.agg.as))))
            .drop(keyAlias +: oas.map(_.agg.as): _*)
      }
    val req = reqDec.copy(orderAggs = Nil)
    if (req.nested.isEmpty && req.aggRels.isEmpty)
      return runRoot(base0, req)
    val base = rootSlice(base0, req)
    // hidden sort keys copy the TABLE columns BEFORE any relationship
    // attach: withColumn(n.as, ...) REPLACES a same-named base column,
    // so sorting by name after the attach would let a nested/aggregate
    // alias that shadows a real column hijack the sort (Hasura orders
    // by table columns; response keys live in a different namespace)
    val sortKeyed = req.orderBy.zipWithIndex.foldLeft(base) {
      case (d, (o, i)) => d.withColumn(s"__sort_$i", col(o.field))
    }
    // sideways parent-key pushdown (guide §3.2): when the root carries
    // a where, every child arm prunes to the surviving parents' keys
    // instead of aggregating its whole table (see restrictToParent).
    // Keys re-derive from base0 + the root where (pre-slice superset of
    // the attached parents) — a narrow filtered key scan, far cheaper
    // than the corpus-wide child work it prevents
    def rootKeys(parentKey: String): Option[DataFrame] =
      req.where.map(w => base0.filter(w.toColumn)
        .select(col(parentKey).as("__parent_keys")))
    // every relationship pre-aggregates to one row per parent key and
    // joins back on it — never a flat multi-child join
    val withNested = req.nested.zipWithIndex.foldLeft(sortKeyed) {
      case (acc, (n, i)) =>
        val rel = compileNested(s, dir, n, rootKeys(n.parentKey))
        // the TOP level renders to_json (cross-engine-stable wire
        // shape); inner levels stay structured inside their parent;
        // a left attach renders childless parents as "[]", not null —
        // except an OBJECT relationship, whose response is the single
        // struct itself (null when absent, Hasura's object-rel shape).
        // The render rides an INTERNAL name (`__rel_i`) until the
        // final projection: response keys live in a different
        // namespace than table columns, so an alias that EQUALS a
        // base column name must neither be ambiguous here nor replace
        // the base column other selections may still reference
        acc.join(rel, base0(n.parentKey) === rel(s"__key_${n.as}"),
            n.joinType)
          .withColumn(s"__rel_$i",
            if (n.single) to_json(element_at(rel(n.as), 1), jsonOpts)
            else if (n.joinType == "left")
              to_json(coalesce(rel(n.as), array()), jsonOpts)
            else to_json(rel(n.as), jsonOpts))
          .drop(rel(n.as))
    }
    // aggregate relationships pre-fold the same way: one aggregate row
    // per child key, joined back — so any mix of array and aggregate
    // relationships composes without cross-multiplying fan-outs (the
    // defect a single flat multi-child join + groupBy would have)
    val withAggs = req.aggRels.zipWithIndex.foldLeft(withNested) {
      case (acc, (a, i)) =>
        val loaded = graft.Tables.load(s, dir, a.table)
        val filtered0 =
          a.where.map(filterRel(s, dir, loaded, _)).getOrElse(loaded)
        // aggregate relationships prune to the parents' keys the same
        // way as array relationships (restrictToParent)
        val filtered = restrictToParent(filtered0,
          filtered0(a.childKey), rootKeys(a.parentKey))
        val child = childSlice(filtered, loaded(a.childKey), a.orderBy,
          loaded(_), a.distinctOn, a.offset, a.limit)
        val keyAlias = s"__aggkey_$i"
        // the nodes arm (Hasura's rows-next-to-their-aggregates inside
        // a relationship aggregate): the sliced child rows as one
        // struct array, riding the SAME pre-aggregation — the
        // root-aggregate nodes discipline applied per parent key.
        // The array renders in the relationship's order_by order
        // (Hasura's nodes honor order_by — orderedCollect carries the
        // hidden sort keys through the collect); with NO order_by the
        // render falls back to canonical sort_array so the JSON stays
        // hash-deterministic where Hasura's order is unspecified.
        // Internally aliased per aggRel (a base column named "nodes"
        // or a second nodes arm must never resolve ambiguously)
        val aggCols = a.aggs.zipWithIndex.map { case (f, j) =>
          f.agg(loaded).as(s"__agg_${i}_$j") } ++
          (if (a.nodes.isEmpty) Nil
           else if (a.orderBy.isEmpty)
             Seq(sort_array(collect_list(
               struct(a.nodes.map(loaded(_)): _*))).as(s"__nodes_$i"))
           else Seq(orderedCollect(a.orderBy, s"${a.table}.nodes",
             loaded(_), a.nodes.map(f => loaded(f).as(f)), a.nodes,
             structOrderable(child, a.nodes.map(loaded(_))))
             .as(s"__nodes_$i")))
        val rel = child.groupBy(loaded(a.childKey).as(keyAlias))
          .agg(aggCols.head, aggCols.tail: _*)
        acc.join(rel, base0(a.parentKey) === rel(keyAlias), a.joinType)
    }
    // the OUTPUT name "nodes" is single-occupancy: Hasura's response
    // nests per relationship, but this engine's is flat — a second
    // nodes arm (or a selected base column named "nodes") would emit
    // duplicate columns whose hash comparison silently depends on
    // resolution order. Loud, like every naming collision here.
    require(req.aggRels.filter(_.nodes.nonEmpty)
        .map(_.out("nodes")).distinct.size ==
        req.aggRels.count(_.nodes.nonEmpty),
      "at most one relationship-aggregate nodes arm per request " +
        "(the flat response has one 'nodes' column) — alias the " +
        "aggregate relationships to disambiguate")
    require(req.aggRels.filter(_.nodes.nonEmpty)
        .forall(a => !req.fields.contains(a.out("nodes"))),
      "a selected column named 'nodes' collides with the nodes arm")
    // every flat output name lands once — aliased twins of the same
    // relationship stay disjoint through their prefixes, and a
    // collision (two unaliased twins, or an alias shadowing a field)
    // is loud rather than an ambiguous-column resolution artifact
    val aggOutNames = req.aggRels.flatMap(a =>
      a.aggs.map(f => a.out(f.as)) ++
        (if (a.nodes.isEmpty) Nil else Seq(a.out("nodes"))))
    val allOut = req.fields ++ req.nested.map(_.as) ++ aggOutNames
    require(allOut.distinct.size == allOut.size,
      s"request on '${req.table}': duplicate output column(s) " +
        allOut.diff(allOut.distinct).distinct.mkString(", ") +
        " — alias the colliding selections")
    val outCols = req.fields.map(
        typenameOr(base0, req.table, req.fieldAs)) ++
      // response keys materialize ONLY here — the internal `__rel_i`/
      // `__agg_i_j` names kept them from colliding with table columns
      req.nested.zipWithIndex.map { case (n, i) =>
        col(s"__rel_$i").as(n.as) } ++
      req.aggRels.zipWithIndex.flatMap { case (a, i) =>
        a.aggs.zipWithIndex.map { case (f, j) =>
          f.post(col(s"__agg_${i}_$j")).as(a.out(f.as)) } ++
          // childless parents render "[]" like the Nested arm, never
          // null — to_json here keeps the wire shape engine-stable
          (if (a.nodes.isEmpty) Nil
           else Seq(to_json(coalesce(col(s"__nodes_$i"), array()),
             jsonOpts).as(a.out("nodes"))))
      }
    // sort on the PRE-projection frame (Hasura orders by TABLE
    // columns, never response keys): ordering after the aliasing
    // select would let a response key that SHADOWS a different real
    // column hijack the sort ({c_acctbal: c_custkey} +
    // order_by: {c_acctbal} must sort by the table's c_acctbal).
    // The projection after the sort keeps the order (Spark plans
    // sort+project+limit as one TakeOrderedAndProject).
    val ordered =
      if (req.orderBy.isEmpty) withAggs
      else withAggs.orderBy(req.orderBy.zipWithIndex.map {
        case (o, i) => o.toColumnOn(col(s"__sort_$i"))
      }: _*)
    val shaped = ordered.select(outCols: _*)
    val off = if (req.offset > 0) shaped.offset(req.offset) else shaped
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
      nested = Seq(Nested(
        as = "orders", table = "orders",
        childKey = "o_custkey", parentKey = "c_custkey",
        fields = Seq(
          NestedField("k", "o_orderkey"),
          NestedField("p", "o_totalprice", format = Some((2, "%.2f"))))))))

  /** q97 — the builder replaying q49's TWO-LEVEL nesting
    * (customer{orders{lineitems{...}}}); shares q49's oracle. The
    * handwritten q49 proved the bottom-up plan shape; this proves the
    * front end can compose it from a declarative request. */
  /** q98 — per-relationship arguments: the child selection carries its
    * OWN where + order_by + limit (Hasura's
    * `nfts(where: {status: {_eq: "onMarket"}}, limit: 5)` shape,
    * README.md:92-155): each customer's top-3 OPEN orders by price.
    * The oracle composes q40's SQL with the child predicate and a
    * row_number-windowed top-n — the most common real-user query shape
    * after plain nesting. */
  val q98Request: Request = Request(
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

  def q98QbChildArgs(s: SparkSession, dir: String): DataFrame =
    run(s, dir, q98Request)

  /** q101 — the REST of Hasura's comparison surface in one request
    * (README.md:121-155's operator table): `_is_null` both polarities,
    * `_nin`, `_ilike` (case-insensitive against upper-cased pattern),
    * `_nlike`. DuckDB spells each natively (IS [NOT] NULL, NOT IN,
    * ILIKE, NOT LIKE), so the oracle pins the three-valued-logic
    * semantics too. */
  val q101Request: Request = Request(
    table = "documents",
    fields = Seq("doc_id", "lang", "source"),
    where = Some(And(
      IsNull("text", isNull = false),
      Nin("lang", Seq("zh", "es")),
      Or(IsNull("source"), Ilike("source", "SRC1%")),
      Nlike("source", "%8"))),
    orderBy = Seq(Order("doc_id")),
    limit = Some(400))

  def q101QbOps(s: SparkSession, dir: String): DataFrame =
    run(s, dir, q101Request)

  /** q102 — Hasura's `distinct_on`: the longest document per language
    * (distinct_on: lang, ordered lang asc, n_chars desc, doc_id asc).
    * DuckDB spells the same semantics natively as DISTINCT ON. */
  val q102Request: Request = Request(
    table = "documents",
    fields = Seq("doc_id", "lang", "n_chars"),
    orderBy = Seq(Order("lang"), Order("n_chars", desc = true),
      Order("doc_id")),
    distinctOn = Seq("lang"))

  def q102QbDistinctOn(s: SparkSession, dir: String): DataFrame =
    run(s, dir, q102Request)

  /** q103 — per-relationship `distinct_on` + `offset` composing with
    * `limit` (the full Hasura child-argument surface in one request):
    * for each customer, the best order PER STATUS (distinct_on:
    * o_orderstatus, best = highest price, key tie-break), then a PAGE
    * of those representatives — skip the first, keep the next two.
    * Both cuts are per-parent row_number windows riding the child's
    * one hash shuffle; the oracle spells them as two stacked windows
    * in DuckDB. */
  val q103Request: Request = Request(
    table = "customer",
    fields = Seq("c_custkey"),
    where = Some(Lte("c_custkey", 80L)),
    orderBy = Seq(Order("c_custkey")),
    nested = Seq(Nested(
      as = "orders", table = "orders",
      childKey = "o_custkey", parentKey = "c_custkey",
      fields = Seq(
        NestedField("k", "o_orderkey"),
        NestedField("st", "o_orderstatus"),
        NestedField("p", "o_totalprice", format = Some((2, "%.2f")))),
      orderBy = Seq(Order("o_orderstatus"),
        Order("o_totalprice", desc = true), Order("o_orderkey")),
      distinctOn = Seq("o_orderstatus"),
      offset = 1,
      limit = Some(2))))

  def q103QbChildPage(s: SparkSession, dir: String): DataFrame =
    run(s, dir, q103Request)

  /** q105 — Hasura's extended statistical aggregates (the `*_aggregate`
    * stddev/variance family its Postgres layer auto-generates for
    * numeric columns, README.md:89-155 surface): per customer, the
    * spread of their order prices — count, stddev_samp/pop,
    * var_samp/pop — vs DuckDB's native functions. Null semantics are
    * the built-ins' (one order → samp variants null, var_pop 0.0;
    * childless parents null via the left join, count repaired to 0).
    * Rounding is magnitude-aware: stddev (~1e5) keeps 2 decimals;
    * variance (~1e10) rounds to HUNDREDS — a double carries ~16
    * significant digits, so at 1e10 the engines' merge-order ulp skew
    * (~1e-5 abs) sits too close to a 4-decimal boundary to hash
    * stably, while a 100-granular boundary is 6 orders away. */
  val q105Request: Request = Request(
    table = "customer",
    fields = Seq("c_custkey"),
    where = Some(Lte("c_custkey", 60L)),
    orderBy = Seq(Order("c_custkey")),
    aggRels = Seq(AggRel(
      table = "orders", childKey = "o_custkey", parentKey = "c_custkey",
      aggs = Seq(
        CountOf("o_orderkey", "n"),
        StddevOf("o_totalprice", "sd", pop = false, roundTo = 2),
        StddevOf("o_totalprice", "sd_pop", pop = true, roundTo = 2),
        VarianceOf("o_totalprice", "vr", pop = false, roundTo = -2),
        VarianceOf("o_totalprice", "vr_pop", pop = true,
          roundTo = -2)))))

  def q105QbStatAggs(s: SparkSession, dir: String): DataFrame =
    run(s, dir, q105Request)

  def q97QbNestedDeep(s: SparkSession, dir: String): DataFrame =
    run(s, dir, Request(
      table = "customer",
      fields = Seq("c_custkey"),
      where = Some(Lte("c_custkey", 20)),
      orderBy = Seq(Order("c_custkey")),
      nested = Seq(Nested(
        as = "orders", table = "orders",
        childKey = "o_custkey", parentKey = "c_custkey",
        fields = Seq(NestedField("k", "o_orderkey")),
        subs = Seq(Nested(
          as = "items", table = "lineitem",
          childKey = "l_orderkey", parentKey = "o_orderkey",
          fields = Seq(
            NestedField("ln", "l_linenumber", cast = Some("long")),
            NestedField("q", "l_quantity", cast = Some("long")))))))))
}
