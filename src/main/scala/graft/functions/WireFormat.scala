package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Binary transaction decode — the reference's amino tx decoder as a
  * Spark surface (x/indexer/indexer.go:234-248 `m.txDecoder(txBytes)`,
  * wired to `auth.DefaultTxDecoder` over the marketplace codec,
  * handlers/marketplace_env.go:11-24). Amino's binary form is the
  * proto3 wire format plus a 4-byte registered-type prefix in front of
  * every interface-typed value, so the decoder is two public layers:
  *
  *  - [[decodeMessage]]: a proto3 wire walker (varint / fixed64 /
  *    length-delimited / fixed32) driven by a [[MessageSchema]] — field
  *    number → (name, kind), unknown fields skipped by wire type, the
  *    standard forward-compatibility rule;
  *  - [[Registry]]: 4-byte prefix → (route, schema) for interface
  *    values ("amino" kind), the RegisterConcrete analog.
  *
  * [[txDecode]] exposes the StdTx shape (repeated msgs + memo) as a
  * column function returning (msg_type, json) pairs — JSON so the
  * existing C7 surface (`get_json_object`, `from_json`) consumes the
  * decoded fields without a per-message struct schema. Malformed bytes
  * yield null, the failed-message semantics of the reference's decode
  * loop (indexer.go:236-238: log and continue, never crash the
  * indexer). WireFormatSpec round-trips hand-encoded fixtures through
  * decode → MarketplaceEvent mapping → the CDC fold.
  *
  * Scale posture: pure per-row byte walking inside a deterministic UDF
  * — no shuffle, no state; at 100 TB the decode rides the ingest scan.
  */
object WireFormat {

  /** One field: proto wire kind ∈ varint | string | bytes | message |
    * amino (interface value: 4-byte prefix + registered payload). */
  final case class Field(number: Int, name: String, kind: String,
      nested: MessageSchema = null)

  final case class MessageSchema(fields: Field*) {
    private[functions] val byNumber: Map[Int, Field] =
      fields.map(f => f.number -> f).toMap
  }

  /** RegisterConcrete analog: 4-byte prefix → (route name, schema). */
  final case class Registry(entries: Map[Seq[Byte], (String, MessageSchema)]) {
    private[functions] def lookup(b: Array[Byte], off: Int)
        : Option[(String, MessageSchema)] =
      if (off + 4 > b.length) None
      else entries.get(b.slice(off, off + 4).toSeq)
  }

  private final class Reader(b: Array[Byte], var pos: Int, val end: Int) {
    def varint(): Long = {
      var v = 0L; var shift = 0
      while (true) {
        require(pos < end && shift < 64, "truncated varint")
        val x = b(pos) & 0xff; pos += 1
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
      }
      v
    }
    def bytes(n: Int): (Int, Int) = {
      require(n >= 0 && pos + n <= end, "truncated field")
      val r = (pos, n); pos += n; r
    }
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Walk one message's bytes against its schema; returns canonical
    * JSON (fields ordered by field number; unknown fields skipped by
    * wire type, never fatal). */
  def decodeMessage(b: Array[Byte], off: Int, len: Int,
      schema: MessageSchema, registry: Registry): String = {
    val r = new Reader(b, off, off + len)
    val out = scala.collection.mutable.TreeMap[Int, String]()
    while (r.pos < r.end) {
      val tag = r.varint()
      val fieldNo = (tag >> 3).toInt
      val wire = (tag & 7).toInt
      schema.byNumber.get(fieldNo) match {
        case Some(f) =>
          val v = (f.kind, wire) match {
            case ("varint", 0) => r.varint().toString
            case ("string", 2) =>
              val (p, n) = r.bytes(r.varint().toInt)
              jsonStr(new String(b, p, n, "UTF-8"))
            case ("bytes", 2) =>
              val (p, n) = r.bytes(r.varint().toInt)
              jsonStr(b.slice(p, p + n).map(x => f"${x & 0xff}%02x").mkString)
            case ("message", 2) =>
              val (p, n) = r.bytes(r.varint().toInt)
              decodeMessage(b, p, n, f.nested, registry)
            case ("amino", 2) =>
              val (p, n) = r.bytes(r.varint().toInt)
              decodeAmino(b, p, n, registry)
            case _ =>
              throw new IllegalArgumentException(
                s"field ${f.name}: kind ${f.kind} vs wire type $wire")
          }
          // repeated fields accumulate into a JSON array
          out.get(fieldNo) match {
            case Some(prev) if prev.startsWith("[") =>
              out(fieldNo) = prev.dropRight(1) + "," + v + "]"
            case Some(prev) => out(fieldNo) = s"[$prev,$v]"
            case None => out(fieldNo) = v
          }
        case None => // unknown field: skip by wire type
          wire match {
            case 0 => r.varint()
            case 1 => r.bytes(8)
            case 2 => r.bytes(r.varint().toInt)
            case 5 => r.bytes(4)
            case _ =>
              throw new IllegalArgumentException(s"wire type $wire")
          }
      }
    }
    out.map { case (no, v) =>
      jsonStr(schema.byNumber(no).name) + ":" + v
    }.mkString("{", ",", "}")
  }

  /** Interface value: 4-byte registered prefix, then the concrete
    * message's fields. Output carries the resolved route as `_type`. */
  def decodeAmino(b: Array[Byte], off: Int, len: Int,
      registry: Registry): String = {
    // The 4-byte prefix must live inside THIS field's slice — bounding
    // the read by the whole buffer would let a truncated field borrow
    // its prefix from the next field's bytes and decode to an empty
    // body instead of failing (txDecode turns the failure into null).
    require(len >= 4, s"amino field truncated: $len bytes")
    val (route, schema) = registry.lookup(b, off).getOrElse(
      throw new IllegalArgumentException("unregistered amino prefix"))
    val body = decodeMessage(b, off + 4, len - 4, schema, registry)
    if (body == "{}") s"""{"_type":${jsonStr(route)}}"""
    else s"""{"_type":${jsonStr(route)},""" + body.drop(1)
  }

  /** The StdTx shape the reference's DefaultTxDecoder consumes: field 1
    * = repeated interface-typed msgs, field 4 = memo. Fee/signatures
    * are skipped as unknown fields — the indexer never reads them. */
  def stdTxSchema: MessageSchema = MessageSchema(
    Field(1, "msgs", "amino"),
    Field(4, "memo", "string"))

  /** Column function: binary tx → JSON string (null on malformed
    * bytes, the reference's log-and-continue failure semantics). The
    * registry rides into the closure — bounded, like a broadcast dim. */
  def txDecode(registry: Registry): Column => Column = {
    val f = udf((b: Array[Byte]) =>
      if (b == null) null
      else
        try decodeMessage(b, 0, b.length, stdTxSchema, registry)
        catch { case _: Exception => null })
    c => f(c)
  }
}
