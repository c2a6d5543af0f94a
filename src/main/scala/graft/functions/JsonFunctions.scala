package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON validation for the metadata pipeline (SURVEY §2.10 / C7-C8).
  *
  * The reference validates fetched token metadata against a real JSON-Schema
  * DOCUMENT via gojsonschema (x/tokenMetadataService/service.go:168-175,
  * schema types.go:3-21) — so the capability here is schema-DRIVEN: any
  * schema in the supported subset (type / properties / required /
  * additionalProperties:false / patternProperties / items / enum /
  * pattern / minLength / maxLength / minimum / maximum /
  * exclusiveMinimum / exclusiveMaximum / multipleOf / minItems /
  * maxItems / uniqueItems / const / contains / minProperties /
  * maxProperties / propertyNames / anyOf / allOf / oneOf / not, with
  * internal `$ref`s into `definitions`/`$defs` inlined at parse time —
  * cyclic or external refs reject loudly) compiles ONCE driver-side
  * into a pure Column expression stack over Spark 4's VARIANT. Object properties recurse to any
  * depth; array `items` validate PER ELEMENT (the variant array fans
  * out through `transform`), so the in-the-wild ERC-721 `attributes`
  * array — objects with their own required fields and anyOf-typed
  * values — validates all the way down. The ERC-721 check is just one
  * schema instance of it.
  *
  * Why VARIANT, not from_json: from_json COERCES mismatched types
  * ({"name":1} parses to name="1"), which would hide exactly the wrong-type
  * errors the reference reports. schema_of_variant gives per-field type
  * introspection, so "present but not a string" is detectable. Validation
  * errors come back as data (struct(valid, errors)), never exceptions —
  * bad-record-quarantine posture (SURVEY §2.8 failure semantics).
  */
object JsonFunctions {

  /** JSON-Schema subset: type + properties + required + items +
    * additionalProperties:false + patternProperties, the
    * value-constraint keywords enum / pattern / minLength / maxLength /
    * minimum / maximum (exclusiveMinimum/Maximum in their draft-4
    * numeric form) / multipleOf / minItems / maxItems / uniqueItems /
    * const / contains / minProperties / maxProperties / propertyNames,
    * and the composition keywords anyOf / allOf / oneOf / not — all
    * recursive, including PER-ELEMENT `items` validation (each element
    * of a variant array fans out through `transform`). Internal `$ref`s
    * (definitions/$defs or any `#/...` pointer) inline at parse time;
    * cycles reject loudly. */
  sealed trait JsonSchema
  object JsonSchema {
    /** `typed=false` marks a schema node that carries object keywords
      * but no `"type": "object"` — per the spec those keywords apply
      * only WHEN the instance is an object and pass otherwise (the
      * shape anyOf/oneOf branches routinely use). `closed` is
      * `additionalProperties: false`. `patternProps` are
      * `patternProperties`: every instance key matching a pattern
      * validates its value against that pattern's schema (declared
      * `properties` keys included — both apply, per the spec), and
      * pattern-matched keys are NOT "additional" for `closed`. */
    case class JsObject(properties: Seq[(String, JsonSchema)],
        required: Set[String], closed: Boolean = false,
        typed: Boolean = true,
        patternProps: Seq[(String, JsonSchema)] = Nil) extends JsonSchema
    case class JsArray(items: Option[JsonSchema],
        typed: Boolean = true) extends JsonSchema
    /** "string" | "number" | "integer" | "boolean" */
    case class JsPrim(tpe: String) extends JsonSchema
    case object JsAny extends JsonSchema
    /** A schema node with value constraints layered over its base check.
      * Per the spec, string keywords ignore non-strings and numeric
      * keywords ignore non-numbers — the `type` keyword (the base) is
      * what reports a wrong type. */
    case class JsConstrained(base: JsonSchema,
        cs: Constraints) extends JsonSchema

    /** Enum members carry their JSON kind so equality compares typed
      * values (1 != "1"), the way gojsonschema deep-compares. */
    sealed trait EnumVal
    case class EnumStr(v: String) extends EnumVal
    case class EnumNum(v: Double) extends EnumVal
    case class EnumBool(v: Boolean) extends EnumVal
    /** null / object / array members: both sides render through
      * Spark's variant JSON writer, so number formatting normalizes;
      * KEY ORDER still distinguishes (a documented subset boundary —
      * full structural equality for composite enum members is not
      * expressible at the expression layer). */
    case class EnumJson(v: String) extends EnumVal

    case class Constraints(
        enumVals: Option[Seq[EnumVal]] = None,
        constVal: Option[EnumVal] = None,
        pattern: Option[String] = None,
        minLength: Option[Int] = None, maxLength: Option[Int] = None,
        minimum: Option[Double] = None, maximum: Option[Double] = None,
        exclusiveMinimum: Option[Double] = None,
        exclusiveMaximum: Option[Double] = None,
        multipleOf: Option[Double] = None,
        minItems: Option[Int] = None, maxItems: Option[Int] = None,
        uniqueItems: Boolean = false,
        contains: Option[JsonSchema] = None,
        minProperties: Option[Int] = None,
        maxProperties: Option[Int] = None,
        propertyNames: Option[JsonSchema] = None,
        anyOf: Option[Seq[JsonSchema]] = None,
        allOf: Option[Seq[JsonSchema]] = None,
        oneOf: Option[Seq[JsonSchema]] = None,
        not: Option[JsonSchema] = None) {
      def isEmpty: Boolean = this == Constraints()
    }

    /** Parse a JSON-Schema document (driver-side, once per plan; Jackson is
      * already on Spark's classpath). Unknown/absent `type` → JsAny, i.e.
      * "any value accepted" — matching JSON-Schema's permissive default.
      *
      * `$ref` resolves at PARSE time: any internal JSON-Pointer ref
      * (`#/definitions/Name`, `#/$defs/Name`, or any other `#/...`
      * path) inlines its target, so the compiled expression stack never
      * sees refs — schemas factored through `definitions` (the
      * in-the-wild ERC-721/metadata shape) cost nothing at runtime.
      * Cyclic and unresolvable refs are rejected LOUDLY
      * (IllegalArgumentException naming the cycle/pointer) — a cyclic
      * schema cannot compile to a finite expression, and a silently
      * dropped ref would accept documents the schema forbids. External
      * (non-`#`) refs are out of scope and also reject loudly. Sibling
      * keywords next to `$ref` are ignored (draft-7 semantics, what
      * gojsonschema applies). */
    def parse(doc: String): JsonSchema = {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.readTree(doc)
      fromNode(root, root, Nil)
    }

    private def fromNode(n: com.fasterxml.jackson.databind.JsonNode,
        root: com.fasterxml.jackson.databind.JsonNode,
        seen: List[String]): JsonSchema = {
      import scala.jdk.CollectionConverters._
      val refNode = n.get("$ref")
      if (refNode != null && refNode.isTextual) {
        val ref = refNode.asText()
        if (!ref.startsWith("#"))
          throw new IllegalArgumentException(
            s"unsupported external $$ref '$ref' (only internal '#/...')")
        if (seen.contains(ref))
          throw new IllegalArgumentException("cyclic $ref: " +
            (ref :: seen).reverse.mkString(" -> "))
        val target = root.at(ref.substring(1))
        if (target.isMissingNode)
          throw new IllegalArgumentException(s"unresolvable $$ref '$ref'")
        return fromNode(target, root, ref :: seen)
      }
      def rec(m: com.fasterxml.jackson.databind.JsonNode): JsonSchema =
        fromNode(m, root, seen)
      def mkObj(typed: Boolean): JsObject = {
        val props = Option(n.get("properties")).toSeq.flatMap(p =>
          p.fields().asScala.map(e => e.getKey -> rec(e.getValue)))
        val req = Option(n.get("required")).toSeq.flatMap(r =>
          r.elements().asScala.map(_.asText()))
        val patProps = Option(n.get("patternProperties")).toSeq.flatMap(p =>
          p.fields().asScala.map { e =>
            // the patterns execute via rlike (JAVA regex) executor-side;
            // a malformed one must reject loudly HERE, driver-side, like
            // a bad $ref — not as a mid-job task failure. (JSON Schema
            // specifies ECMA-262 regexes; the supported surface is the
            // Java-regex subset, which covers the common anchored/char-
            // class patterns schemas actually use.)
            try java.util.regex.Pattern.compile(e.getKey)
            catch {
              case ex: java.util.regex.PatternSyntaxException =>
                throw new IllegalArgumentException(
                  s"patternProperties pattern '${e.getKey}' is not a " +
                    s"valid regex: ${ex.getMessage}")
            }
            e.getKey -> rec(e.getValue)
          })
        val ap = n.path("additionalProperties")
        JsObject(props, req.toSet,
          closed = ap.isBoolean && !ap.asBoolean(true), typed = typed,
          patternProps = patProps)
      }
      def mkArr(typed: Boolean): JsArray =
        JsArray(Option(n.get("items")).map(rec), typed = typed)
      val base = n.path("type").asText("") match {
        case "object" => mkObj(typed = true)
        case "array" => mkArr(typed = true)
        case t @ ("string" | "number" | "integer" | "boolean") => JsPrim(t)
        case _ =>
          // object/array keywords with no `type`: per the spec they
          // apply only when the instance HAS that shape (the form
          // anyOf/oneOf branches routinely take)
          if (n.has("properties") || n.has("required") ||
              n.has("additionalProperties") ||
              n.has("patternProperties")) mkObj(typed = false)
          else if (n.has("items")) mkArr(typed = false)
          else JsAny
      }
      def num(k: String): Option[Double] =
        Option(n.get(k)).filter(_.isNumber).map(_.asDouble())
      def int(k: String): Option[Int] =
        Option(n.get(k)).filter(_.isNumber).map(_.asInt())
      def schemas(k: String): Option[Seq[JsonSchema]] =
        Option(n.get(k)).filter(_.isArray)
          .map(_.elements().asScala.toSeq.map(rec))
          .filter(_.nonEmpty)
      def enumVal(e: com.fasterxml.jackson.databind.JsonNode): EnumVal =
        e match {
          case e if e.isTextual => EnumStr(e.asText())
          case e if e.isNumber => EnumNum(e.asDouble())
          case e if e.isBoolean => EnumBool(e.asBoolean())
          case e => EnumJson(e.toString)
        }
      val cs = Constraints(
        enumVals = Option(n.get("enum")).filter(_.isArray).map(
          _.elements().asScala.toSeq.map(enumVal)),
        constVal = Option(n.get("const")).map(enumVal),
        pattern = Option(n.get("pattern")).filter(_.isTextual)
          .map(_.asText()),
        minLength = int("minLength"), maxLength = int("maxLength"),
        minimum = num("minimum"), maximum = num("maximum"),
        exclusiveMinimum = num("exclusiveMinimum"),
        exclusiveMaximum = num("exclusiveMaximum"),
        multipleOf = num("multipleOf").filter(_ > 0),
        minItems = int("minItems"), maxItems = int("maxItems"),
        uniqueItems = n.path("uniqueItems").asBoolean(false),
        contains = Option(n.get("contains")).filter(_.isObject)
          .map(rec),
        minProperties = int("minProperties"),
        maxProperties = int("maxProperties"),
        propertyNames = Option(n.get("propertyNames")).filter(_.isObject)
          .map(rec),
        anyOf = schemas("anyOf"), allOf = schemas("allOf"),
        oneOf = schemas("oneOf"),
        not = Option(n.get("not")).filter(_.isObject).map(rec))
      if (cs.isEmpty) base else JsConstrained(base, cs)
    }
  }

  import JsonSchema._

  private def noErrors: Column = array().cast("array<string>")

  private def display(path: String): String = if (path.isEmpty) "$" else path

  /** variant type names that satisfy each primitive schema type. */
  private def primOk(v: Column, tpe: String): Column = {
    val t = schema_of_variant(v)
    tpe match {
      case "string" => t === "STRING"
      case "boolean" => t === "BOOLEAN"
      case "integer" => t.isin("BIGINT", "INT", "SMALLINT", "TINYINT")
      case "number" => t.isin("DOUBLE", "FLOAT", "BIGINT", "INT",
        "SMALLINT", "TINYINT") || t.startsWith("DECIMAL")
    }
  }

  /** Constraint-keyword errors for one variant value. String keywords
    * apply only to strings and numeric keywords only to numbers (the
    * spec's "keywords ignore instances of other types"); enum compares
    * typed values, so 1 never equals "1". */
  private def constraintErrors(v: Column, cs: Constraints,
      path: String): Seq[Column] = {
    val t = schema_of_variant(v)
    val isStr = t === "STRING"
    val isNum = t.isin("DOUBLE", "FLOAT", "BIGINT", "INT", "SMALLINT",
      "TINYINT") || t.startsWith("DECIMAL")
    // try_variant_get: the type guards make a failed cast unreachable
    // logically, but Catalyst may evaluate both sides of a conjunction —
    // a throwing cast would break the errors-as-data contract
    val asStr = try_variant_get(v, "$", "string")
    val asNum = try_variant_get(v, "$", "double")
    val p = display(path)
    def check(bad: Column, msg: String): Column =
      when(bad, array(lit(msg))).otherwise(noErrors)
    def enumHit(e: EnumVal): Column = e match {
      case EnumStr(s) => isStr && asStr === lit(s)
      case EnumNum(d) => isNum && asNum === lit(d)
      case EnumBool(b) =>
        t === "BOOLEAN" && try_variant_get(v, "$", "boolean") === lit(b)
      case EnumJson(j) => to_json(v) === to_json(try_parse_json(lit(j)))
    }
    cs.enumVals.toSeq.map { vals =>
      check(!vals.map(enumHit).reduce(_ || _), s"value not in enum: $p")
    } ++
      cs.constVal.toSeq.map(c =>
        check(!enumHit(c), s"value does not equal const: $p")) ++
      cs.pattern.toSeq.map(re =>
        check(isStr && !asStr.rlike(re), s"string does not match pattern($re): $p")) ++
      cs.minLength.toSeq.map(n =>
        check(isStr && length(asStr) < n, s"string shorter than minLength($n): $p")) ++
      cs.maxLength.toSeq.map(n =>
        check(isStr && length(asStr) > n, s"string longer than maxLength($n): $p")) ++
      cs.minimum.toSeq.map(m =>
        check(isNum && asNum < m, s"number below minimum($m): $p")) ++
      cs.maximum.toSeq.map(m =>
        check(isNum && asNum > m, s"number above maximum($m): $p")) ++
      cs.exclusiveMinimum.toSeq.map(m =>
        check(isNum && asNum <= m, s"number not above exclusiveMinimum($m): $p")) ++
      cs.exclusiveMaximum.toSeq.map(m =>
        check(isNum && asNum >= m, s"number not below exclusiveMaximum($m): $p")) ++
      cs.multipleOf.toSeq.map { m =>
        // division-based remainder: (x/m) must be integral — robust for
        // the fractional divisors a direct % would misjudge (0.3 % 0.1).
        // Tolerance is RELATIVE to the quotient: a fixed 1e-9 rejects
        // genuine multiples once float error scales past it (e.g.
        // 12345678.9 / 0.1 carries ~1e-8 of error).
        val q = asNum / m
        check(isNum && abs(q - round(q)) > lit(1e-9) * greatest(lit(1.0), abs(q)),
          s"number not a multipleOf($m): $p")
      } ++
      arrayConstraintErrors(v, cs, path) ++
      objectConstraintErrors(v, cs, path) ++
      compositionErrors(v, cs, path)
  }

  /** minItems / maxItems / uniqueItems — apply only to arrays, like the
    * string/number keywords ignore other types. Uniqueness compares the
    * JSON rendering of each element (deep equality through the variant
    * writer; the spec's 1 == 1.0 numeric-equality nuance renders as
    * distinct text — documented subset boundary). */
  private def arrayConstraintErrors(v: Column, cs: Constraints,
      path: String): Seq[Column] = {
    val isArr = schema_of_variant(v).startsWith("ARRAY")
    val asArr = try_variant_get(v, "$", "array<variant>")
    val p = display(path)
    def check(bad: Column, msg: String): Column =
      when(bad, array(lit(msg))).otherwise(noErrors)
    cs.minItems.toSeq.map(n =>
      check(isArr && size(asArr) < n,
        s"array shorter than minItems($n): $p")) ++
      cs.maxItems.toSeq.map(n =>
        check(isArr && size(asArr) > n,
          s"array longer than maxItems($n): $p")) ++
      (if (cs.uniqueItems)
        Seq(check(isArr &&
          size(array_distinct(transform(asArr, x => to_json(x)))) <
            size(asArr),
          s"array items are not unique: $p"))
      else Nil) ++
      cs.contains.toSeq.map(sub =>
        check(isArr && !exists(asArr,
          x => size(nodeErrors(x, sub, path + "[]")) === 0),
          s"no array item matches 'contains': $p"))
  }

  /** minProperties / maxProperties / propertyNames — apply only to
    * objects. Each key name round-trips through Spark's own JSON
    * writer (`to_json(struct(k))` then a variant get), so escaping is
    * exact and the name validates as an ordinary string instance. */
  private def objectConstraintErrors(v: Column, cs: Constraints,
      path: String): Seq[Column] = {
    if (cs.minProperties.isEmpty && cs.maxProperties.isEmpty &&
      cs.propertyNames.isEmpty) return Nil
    val isObj = schema_of_variant(v).startsWith("OBJECT")
    val keys = json_object_keys(to_json(v))
    val p = display(path)
    def check(bad: Column, msg: String): Column =
      when(bad, array(lit(msg))).otherwise(noErrors)
    cs.minProperties.toSeq.map(n =>
      check(isObj && size(keys) < n,
        s"object has fewer than minProperties($n): $p")) ++
      cs.maxProperties.toSeq.map(n =>
        check(isObj && size(keys) > n,
          s"object has more than maxProperties($n): $p")) ++
      cs.propertyNames.toSeq.map { sub =>
        def keyVariant(k: Column): Column =
          variant_get(try_parse_json(to_json(struct(k.as("k")))),
            "$.k", "variant")
        when(!isObj, noErrors).otherwise(
          flatten(transform(keys, k =>
            when(size(nodeErrors(keyVariant(k), sub, path)) === 0, noErrors)
              .otherwise(array(concat(lit("property name '"), k,
                lit(s"' violates propertyNames: $p")))))))
      }
  }

  /** anyOf / allOf / oneOf / not — each branch recurses through the
    * full validator, so branches nest arbitrarily (constraints,
    * objects, arrays, further combinators). allOf surfaces every
    * branch's own errors; the others report a single verdict line
    * (branch errors of a FAILED alternative are not "the" errors — the
    * instance only had to match one). */
  private def compositionErrors(v: Column, cs: Constraints,
      path: String): Seq[Column] = {
    val p = display(path)
    def passes(s: JsonSchema): Column = size(nodeErrors(v, s, path)) === 0
    def check(bad: Column, msg: String): Column =
      when(bad, array(lit(msg))).otherwise(noErrors)
    cs.allOf.toSeq.map(ss =>
      concat(ss.map(s0 => nodeErrors(v, s0, path)): _*)) ++
      cs.anyOf.toSeq.map(ss =>
        check(!ss.map(passes).reduce(_ || _),
          s"value matches none of anyOf: $p")) ++
      cs.oneOf.toSeq.map { ss =>
        val cnt = ss.map(passes(_).cast("int")).reduce(_ + _)
        when(cnt === 1, noErrors).otherwise(array(concat(
          lit("value matches "), cnt.cast("string"),
          lit(s" oneOf branches (want exactly one): $p"))))
      } ++
      cs.not.toSeq.map(s0 =>
        check(passes(s0), s"value matches the 'not' schema: $p"))
  }

  /** Recursive error builder for one schema node over one variant value. */
  private def nodeErrors(v: Column, schema: JsonSchema,
      path: String): Column = schema match {
    case JsAny => noErrors
    case JsConstrained(base, cs) =>
      concat(nodeErrors(v, base, path) +: constraintErrors(v, cs, path): _*)
    case JsPrim(t) =>
      when(primOk(v, t), noErrors)
        .otherwise(array(lit(s"field is not a $t: ${display(path)}")))
    case JsArray(items, typed) =>
      // PER-ELEMENT recursion: the variant array fans out through
      // `transform`, so every element runs the full item schema —
      // wrong-typed elements, missing inner fields, nested combinators
      // all report, with "[]" marking the array hop in the path
      val t = schema_of_variant(v)
      val elemErrs = items match {
        case Some(sub) =>
          flatten(transform(try_variant_get(v, "$", "array<variant>"),
            x => nodeErrors(x, sub, path + "[]")))
        case None => noErrors
      }
      when(!t.startsWith("ARRAY"),
        if (typed) array(lit(s"field is not an array: ${display(path)}"))
        else noErrors)
        .otherwise(elemErrs)
    case JsObject(props, required, closed, typed, patternProps) =>
      val perProp = props.map { case (name, child) =>
        val fv = variant_get(v, s"$$.$name", "variant")
        val childPath = if (path.isEmpty) name else s"$path.$name"
        when(fv.isNull,
          if (required.contains(name))
            array(lit(s"missing required field: $childPath"))
          else noErrors)
          .otherwise(nodeErrors(fv, child, childPath))
      }
      // required names with no properties entry (legal JSON Schema) still
      // get their presence check — JsAny for the value
      val bareRequired = (required -- props.map(_._1).toSet).toSeq.sorted
        .map { name =>
          val childPath = if (path.isEmpty) name else s"$path.$name"
          when(variant_get(v, s"$$.$name", "variant").isNull,
            array(lit(s"missing required field: $childPath")))
            .otherwise(noErrors)
        }
      // patternProperties: every instance entry whose KEY matches a
      // pattern validates its value against that pattern's schema —
      // keys are dynamic, so the object fans out as map entries (the
      // array-items shape for objects). Declared properties keys that
      // also match run BOTH checks, per the spec.
      val patErrs = patternProps.map { case (re, sub) =>
        val entries = map_entries(
          try_variant_get(v, "$", "map<string, variant>"))
        flatten(transform(entries, e =>
          when(e.getField("key").rlike(re),
            nodeErrors(e.getField("value"), sub,
              path + s".<patternProperties:$re>"))
            .otherwise(noErrors)))
      }
      // additionalProperties: false — every ACTUAL key must be declared
      // (or matched by a patternProperties pattern, which makes it
      // non-additional per the spec); each trespasser reports by name
      val extraErrs =
        if (!closed) Nil
        else {
          val declared = props.map(_._1)
          val extras0 = array_except(json_object_keys(to_json(v)),
            if (declared.isEmpty) array().cast("array<string>")
            else array(declared.map(lit): _*))
          val extras =
            if (patternProps.isEmpty) extras0
            else filter(extras0, k =>
              !patternProps.map(p => k.rlike(p._1)).reduce(_ || _))
          Seq(transform(extras, k => concat(
            lit("unexpected additional property '"), k,
            lit(s"': ${display(path)}"))))
        }
      val allChecks = perProp ++ bareRequired ++ patErrs ++ extraErrs
      val propErrs =
        if (allChecks.isEmpty) noErrors else concat(allChecks: _*)
      when(!schema_of_variant(v).startsWith("OBJECT"),
        if (typed) array(lit(s"field is not an object: ${display(path)}"))
        else noErrors)
        .otherwise(propErrs)
  }

  /** Schema-driven validation verdict: struct(valid boolean,
    * errors array<string>). The schema value compiles to a pure expression
    * stack — codegen-friendly, no UDF, errors in property order. */
  def validateJson(json: Column, schema: JsonSchema): Column = {
    val v = try_parse_json(json)
    val errs = when(v.isNull, array(lit("invalid json")))
      .otherwise(nodeErrors(v, schema, path = ""))
    struct((size(errs) === 0).as("valid"), errs.as("errors"))
  }

  /** Convenience: validate against a JSON-Schema document string. */
  def validateJsonSchema(json: Column, schemaDoc: String): Column =
    validateJson(json, JsonSchema.parse(schemaDoc))

  /** The ERC-721 metadata JSON-Schema (types.go:3-21) — one instance of the
    * generic validator. */
  val erc721SchemaDoc: String =
    """{"type": "object",
      | "properties": {
      |   "name": {"type": "string"},
      |   "description": {"type": "string"},
      |   "image": {"type": "string"}},
      | "required": ["name", "description", "image"]}""".stripMargin

  /** ERC-721 metadata shape for from_json consumers. */
  val erc721Schema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("image", StringType)))

  /** Parse with the ERC-721 shape; unparseable JSON → null struct. */
  def erc721Parse(json: Column): Column =
    from_json(json, erc721Schema)

  /** ERC-721 validation = the generic validator applied to its schema. */
  def erc721Validate(json: Column): Column =
    validateJson(json, JsonSchema.parse(erc721SchemaDoc))

  /** has-image probe used to decide whether to enqueue an image task
    * (service.go:146-150: `_, ok := metadata["image"]`). */
  def hasImage(json: Column): Column =
    get_json_object(json, "$.image").isNotNull
}
