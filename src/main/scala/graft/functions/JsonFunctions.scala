package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON validation for the metadata pipeline (SURVEY §2.10 / C7-C8).
  *
  * The reference validates fetched token metadata against a real JSON-Schema
  * DOCUMENT via gojsonschema (x/tokenMetadataService/service.go:168-175,
  * schema types.go:3-21) — so the capability here is schema-DRIVEN: any
  * schema in the supported subset (type / properties / required / items /
  * enum / pattern / minLength / maxLength / minimum / maximum /
  * exclusiveMinimum / exclusiveMaximum / multipleOf) compiles ONCE driver-side into a
  * pure Column expression stack over Spark 4's VARIANT. Object properties recurse to any depth; array items
  * are checked via the MERGED element type (per-element fan-out is not
  * expressible over VARIANT arrays at the expression layer), so an
  * array-of-object item schema verifies element type, not inner fields.
  * The ERC-721 check is just one schema instance of it.
  *
  * Why VARIANT, not from_json: from_json COERCES mismatched types
  * ({"name":1} parses to name="1"), which would hide exactly the wrong-type
  * errors the reference reports. schema_of_variant gives per-field type
  * introspection, so "present but not a string" is detectable. Validation
  * errors come back as data (struct(valid, errors)), never exceptions —
  * bad-record-quarantine posture (SURVEY §2.8 failure semantics).
  */
object JsonFunctions {

  /** JSON-Schema subset: type + properties + required + items, plus the
    * value-constraint keywords enum / pattern / minLength / maxLength /
    * minimum / maximum (exclusiveMinimum/Maximum in their draft-4 numeric
    * form), recursive. */
  sealed trait JsonSchema
  object JsonSchema {
    case class JsObject(properties: Seq[(String, JsonSchema)],
        required: Set[String]) extends JsonSchema
    case class JsArray(items: Option[JsonSchema]) extends JsonSchema
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
        pattern: Option[String] = None,
        minLength: Option[Int] = None, maxLength: Option[Int] = None,
        minimum: Option[Double] = None, maximum: Option[Double] = None,
        exclusiveMinimum: Option[Double] = None,
        exclusiveMaximum: Option[Double] = None,
        multipleOf: Option[Double] = None) {
      def isEmpty: Boolean = this == Constraints()
    }

    /** Parse a JSON-Schema document (driver-side, once per plan; Jackson is
      * already on Spark's classpath). Unknown/absent `type` → JsAny, i.e.
      * "any value accepted" — matching JSON-Schema's permissive default. */
    def parse(doc: String): JsonSchema = {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      fromNode(mapper.readTree(doc))
    }

    private def fromNode(
        n: com.fasterxml.jackson.databind.JsonNode): JsonSchema = {
      import scala.jdk.CollectionConverters._
      val base = n.path("type").asText("") match {
        case "object" =>
          val props = Option(n.get("properties")).toSeq.flatMap(p =>
            p.fields().asScala.map(e => e.getKey -> fromNode(e.getValue)))
          val req = Option(n.get("required")).toSeq.flatMap(r =>
            r.elements().asScala.map(_.asText()))
          JsObject(props, req.toSet)
        case "array" => JsArray(Option(n.get("items")).map(fromNode))
        case t @ ("string" | "number" | "integer" | "boolean") => JsPrim(t)
        case _ => JsAny
      }
      def num(k: String): Option[Double] =
        Option(n.get(k)).filter(_.isNumber).map(_.asDouble())
      def int(k: String): Option[Int] =
        Option(n.get(k)).filter(_.isNumber).map(_.asInt())
      val cs = Constraints(
        enumVals = Option(n.get("enum")).filter(_.isArray).map(
          _.elements().asScala.toSeq.map {
            case e if e.isTextual => EnumStr(e.asText())
            case e if e.isNumber => EnumNum(e.asDouble())
            case e if e.isBoolean => EnumBool(e.asBoolean())
            case e => EnumJson(e.toString)
          }),
        pattern = Option(n.get("pattern")).filter(_.isTextual)
          .map(_.asText()),
        minLength = int("minLength"), maxLength = int("maxLength"),
        minimum = num("minimum"), maximum = num("maximum"),
        exclusiveMinimum = num("exclusiveMinimum"),
        exclusiveMaximum = num("exclusiveMaximum"),
        multipleOf = num("multipleOf").filter(_ > 0))
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
    cs.enumVals.toSeq.map { vals =>
      val hit = vals.map {
        case EnumStr(s) => isStr && asStr === lit(s)
        case EnumNum(d) => isNum && asNum === lit(d)
        case EnumBool(b) =>
          t === "BOOLEAN" && try_variant_get(v, "$", "boolean") === lit(b)
        case EnumJson(j) => to_json(v) === to_json(try_parse_json(lit(j)))
      }.reduce(_ || _)
      check(!hit, s"value not in enum: $p")
    } ++
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
      }
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
    case JsArray(items) =>
      val t = schema_of_variant(v)
      val elemOk = items match {
        // merged element type from schema_of_variant: exact for uniform
        // arrays; VOID covers the empty array
        case Some(JsPrim(p)) =>
          val allowed = p match {
            case "string" => Seq("ARRAY<STRING>")
            case "boolean" => Seq("ARRAY<BOOLEAN>")
            case "integer" => Seq("ARRAY<BIGINT>", "ARRAY<INT>",
              "ARRAY<SMALLINT>", "ARRAY<TINYINT>")
            case "number" => Seq("ARRAY<DOUBLE>", "ARRAY<FLOAT>",
              "ARRAY<BIGINT>", "ARRAY<INT>", "ARRAY<SMALLINT>",
              "ARRAY<TINYINT>")
          }
          t.isin(allowed :+ "ARRAY<VOID>": _*) ||
            (if (p == "number") t.startsWith("ARRAY<DECIMAL")
             else lit(false))
        // object/array item schemas: per-element recursion is not
        // expressible over VARIANT arrays (no element fan-out at the
        // expression layer), so the check is the MERGED element type —
        // catches [1,2] against items:object, not a missing field inside
        // one element. Documented subset boundary.
        case Some(JsObject(_, _)) =>
          t.startsWith("ARRAY<OBJECT") || t === "ARRAY<VOID>"
        case Some(JsArray(_)) =>
          t.startsWith("ARRAY<ARRAY") || t === "ARRAY<VOID>"
        case _ => lit(true)
      }
      when(!t.startsWith("ARRAY"),
        array(lit(s"field is not an array: ${display(path)}")))
        .when(!elemOk,
          array(lit(
            s"array items are not ${itemsName(items)}: ${display(path)}")))
        .otherwise(noErrors)
    case JsObject(props, required) =>
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
      val allChecks = perProp ++ bareRequired
      val propErrs =
        if (allChecks.isEmpty) noErrors else concat(allChecks: _*)
      when(!schema_of_variant(v).startsWith("OBJECT"),
        array(lit(s"field is not an object: ${display(path)}")))
        .otherwise(propErrs)
  }

  private def itemsName(items: Option[JsonSchema]): String = items match {
    case Some(JsPrim(t)) => t
    case Some(JsObject(_, _)) => "object"
    case Some(JsArray(_)) => "array"
    case _ => "any"
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
