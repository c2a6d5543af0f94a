package graft.functions

import graft.SparkSpec
import graft.functions.WireFormat._

/** The binary tx decoder against hand-encoded wire fixtures (built
  * byte-by-byte from the proto3 wire rules, NOT by the decoder's own
  * inverse — so both sides are pinned to the published format), then
  * end-to-end: binary txs → decode → MarketplaceEvent → CDC fold. */
class WireFormatSpec extends SparkSpec {

  // --- wire-format encoder (test-side, spec-rule-by-spec-rule) --------

  private def varint(v: Long): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    var x = v
    while ((x & ~0x7fL) != 0) { out += ((x & 0x7f) | 0x80).toByte; x >>>= 7 }
    out += x.toByte
    out.toArray
  }
  private def tag(field: Int, wire: Int): Array[Byte] =
    varint((field.toLong << 3) | wire)
  private def str(field: Int, s: String): Array[Byte] = {
    val b = s.getBytes("UTF-8")
    tag(field, 2) ++ varint(b.length) ++ b
  }
  private def vint(field: Int, v: Long): Array[Byte] =
    tag(field, 0) ++ varint(v)
  private def lenDelim(field: Int, payload: Array[Byte]): Array[Byte] =
    tag(field, 2) ++ varint(payload.length) ++ payload

  // --- a marketplace-shaped registry ----------------------------------

  private val mintPrefix = Seq[Byte](0x11, 0x22, 0x33, 0x44)
  private val transferPrefix = Seq[Byte](0x55, 0x66, 0x77, 0x88.toByte)
  private val mintSchema = MessageSchema(
    Field(1, "token_id", "string"),
    Field(2, "denom", "string"),
    Field(3, "recipient", "string"),
    Field(4, "token_uri", "string"))
  private val transferSchema = MessageSchema(
    Field(1, "token_id", "string"),
    Field(2, "sender", "string"),
    Field(3, "recipient", "string"))
  private val registry = Registry(Map(
    mintPrefix -> ("mint_nft", mintSchema),
    transferPrefix -> ("transfer_nft", transferSchema)))

  private def mintTx(tokenId: String, to: String, memo: String)
      : Array[Byte] = {
    val msg = mintPrefix.toArray ++
      str(1, tokenId) ++ str(2, "testdenom") ++ str(3, to) ++
      str(4, s"http://meta/$tokenId")
    lenDelim(1, msg) ++ str(4, memo) ++
      // a fee-like field the indexer never registered: must be skipped
      lenDelim(2, str(1, "100stake")) ++ vint(7, 42)
  }
  private def transferTx(tokenId: String, from: String, to: String)
      : Array[Byte] = {
    val msg = transferPrefix.toArray ++
      str(1, tokenId) ++ str(2, from) ++ str(3, to)
    lenDelim(1, msg)
  }

  test("wire walker decodes hand-encoded txs: strings, varints, nested " +
    "interface values, unknown-field skipping, repeated msgs") {
    val json = decodeMessage(mintTx("T1", "u1", "hello"), 0,
      mintTx("T1", "u1", "hello").length, stdTxSchema, registry)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(json)
    assert(root.get("msgs").get("_type").asText() === "mint_nft")
    assert(root.get("msgs").get("token_id").asText() === "T1")
    assert(root.get("msgs").get("recipient").asText() === "u1")
    assert(root.get("msgs").get("token_uri").asText() === "http://meta/T1")
    assert(root.get("memo").asText() === "hello")
    assert(!json.contains("100stake"), "unregistered fee field leaked")

    // two msgs in one tx accumulate into a JSON array
    val two = lenDelim(1, mintPrefix.toArray ++ str(1, "T1") ++
        str(2, "d") ++ str(3, "u1") ++ str(4, "u://1")) ++
      lenDelim(1, transferPrefix.toArray ++ str(1, "T1") ++
        str(2, "u1") ++ str(3, "u2"))
    val r2 = om.readTree(
      decodeMessage(two, 0, two.length, stdTxSchema, registry))
    assert(r2.get("msgs").isArray && r2.get("msgs").size() === 2)
    assert(r2.get("msgs").get(1).get("_type").asText() === "transfer_nft")

    // multi-byte varint round-trip (the 300 needs two bytes)
    val vi = vint(7, 300) ++ str(4, "m")
    val schema = MessageSchema(Field(7, "n", "varint"), Field(4, "memo", "string"))
    assert(om.readTree(decodeMessage(vi, 0, vi.length, schema, registry))
      .get("n").asLong() === 300L)
  }

  test("malformed bytes decode to null, never throw (the reference's " +
    "log-and-continue)") {
    import spark.implicits._
    val decode = WireFormat.txDecode(registry)
    val rows = Seq(
      mintTx("T9", "u1", ""),
      Array[Byte](0x08, -1), // truncated varint
      Array[Byte](0x0a, 0x7f, 1), // length past end
      mintPrefix.toArray, // bare prefix where a tx should be
      null
    ).toDF("tx").select(decode($"tx").as("j"))
    val got = rows.collect().map(r => Option(r.getString(0)).isDefined)
    assert(got === Seq(true, false, false, false, false))
  }

  test("a TRUNCATED amino field (len < 4) fails instead of borrowing " +
    "its prefix from the next field's bytes") {
    // field 1 (msgs, amino) claims 2 bytes, immediately followed by
    // field 4 (memo) whose first bytes happen to form a registered
    // prefix continuation — an unbounded prefix read would decode an
    // empty {"_type":...} body instead of failing
    val bad = lenDelim(1, mintPrefix.toArray.take(2)) ++ str(4, "memo")
    intercept[IllegalArgumentException] {
      WireFormat.decodeMessage(bad, 0, bad.length,
        WireFormat.stdTxSchema, registry)
    }
    import spark.implicits._
    val decode = WireFormat.txDecode(registry)
    val out = Seq(bad).toDF("tx").select(decode($"tx").as("j")).collect()
    assert(out.head.isNullAt(0), "truncated amino must decode to null")
  }

  test("binary txs fold end-to-end: decode -> MarketplaceEvent -> " +
    "snapshot state") {
    import graft.operators.MarketplaceModel._
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val txs = Seq(
      (1L, mintTx("T1", "u1", "")),
      (2L, transferTx("T1", "u1", "u2")),
      (3L, mintTx("T2", "u1", "")))
    val decode = WireFormat.txDecode(registry)
    val decoded = txs.toDF("seq", "tx")
      .select(col("seq"), decode(col("tx")).as("j"))
      // single-msg txs: the msgs field is the message object itself
      .select(col("seq"),
        get_json_object(col("j"), "$.msgs._type").as("msgType"),
        get_json_object(col("j"), "$.msgs.token_id").as("tokenId"),
        coalesce(get_json_object(col("j"), "$.msgs.sender"), lit(""))
          .as("sender"),
        coalesce(get_json_object(col("j"), "$.msgs.recipient"), lit(""))
          .as("recipient"),
        coalesce(get_json_object(col("j"), "$.msgs.token_uri"), lit(""))
          .as("tokenUri"))
      .withColumn("denom", lit("testdenom"))
      .select(col("seq"), col("msgType"), col("tokenId"), col("denom"),
        col("sender"), col("recipient"), col("tokenUri"),
        lit("").as("price"), lit("").as("buyoutPrice"),
        lit("").as("openingPrice"), lit("").as("beneficiary"),
        lit("").as("buyerBeneficiary"), lit("").as("beneficiaryCommission"),
        lit(null).cast("timestamp").as("timeToSell"),
        lit(0L).as("amount"),
        map().cast("map<string,string>").as("attrs"))
      .as[MarketplaceEvent]
    val state = graft.operators.MarketplaceFold.foldTokens(decoded)
      .collect().map(s => s.tokenId -> s).toMap
    assert(state.keySet === Set("T1", "T2"))
    assert(state("T1").nft.get.ownerAddress === "u2") // transferred
    assert(state("T2").nft.get.ownerAddress === "u1")
    assert(state("T2").nft.get.tokenUri === "http://meta/T2")
  }
}
