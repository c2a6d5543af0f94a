package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON validation for the metadata pipeline (SURVEY §2.10 / C7-C8).
  *
  * The reference validates fetched token metadata against the ERC-721 JSON
  * Schema — name/description/image, all strings
  * (x/tokenMetadataService/types.go:3-21, service.go:168-175) — and only
  * then upserts + forwards the image task. Here validation is a pure
  * Column expression stack (from_json + type probes), not a UDF: it stays
  * inside codegen and the errors come back as data, never exceptions
  * (bad-record-quarantine posture, SURVEY §2.8 failure semantics).
  */
object JsonFunctions {

  /** ERC-721 metadata schema (types.go:3-21). */
  val erc721Schema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("image", StringType)))

  /** Parse with the ERC-721 shape; unparseable JSON → null struct. */
  def erc721Parse(json: Column): Column =
    from_json(json, erc721Schema)

  /** Validation verdict: struct(valid boolean, errors array<string>).
    *
    * Built on Spark 4's VARIANT type because from_json COERCES mismatched
    * types ({"name":1} parses to name="1"), which would hide exactly the
    * wrong-type errors the reference's JSON-Schema check reports
    * (service.go:168-175). schema_of_variant gives per-field type
    * introspection, so "present but not a string" is detectable. */
  def erc721Validate(json: Column): Column = {
    val v = try_parse_json(json)
    def fieldErr(name: String): Column = {
      val fv = variant_get(v, s"$$.$name", "variant")
      val tpe = schema_of_variant(fv)
      when(fv.isNull, lit(s"missing required field: $name"))
        .when(tpe =!= "STRING", lit(s"field is not a string: $name"))
        .otherwise(lit(null).cast("string"))
    }
    val fieldErrs =
      array(Seq("name", "description", "image").map(fieldErr): _*)
    val errs = when(v.isNull, array(lit("invalid json")))
      .otherwise(filter(fieldErrs, e => e.isNotNull))
    struct((size(errs) === 0).as("valid"), errs.as("errors"))
  }

  /** has-image probe used to decide whether to enqueue an image task
    * (service.go:146-150: `_, ok := metadata["image"]`). */
  def hasImage(json: Column): Column =
    get_json_object(json, "$.image").isNotNull
}
