package graft.functions

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Hasura's JSONB UPDATE operators (`_append` / `_prepend` /
  * `_delete_key` / `_delete_elem` / `_delete_at_path`) over JSON-TEXT
  * string columns — the engine's stores have no jsonb type, so the
  * rewrite parses, applies Postgres's jsonb operator semantics, and
  * re-serializes CANONICALLY (compact, object keys byte-sorted — the
  * deterministic analog of jsonb's own normalization, so the written
  * text is engine-order-free and oracle-replayable byte for byte).
  *
  * Reference: the tracked JSONB columns the surface exists for
  * (x/common/types.go:140,165; the fixture's `events.props`); operator
  * semantics follow Postgres `||`, `-` (text/int), and `#-`.
  *
  * Scale posture: a per-row Jackson UDF — no Spark built-in can
  * express the object-merge/element-delete rewrite — applied only to
  * an update's MATCHED rows (the delta the merge pays for anyway),
  * never to a full-table scan. The gzip/media/wire-decode precedent.
  */
object JsonbOps {

  /** One jsonb operator bound to its operand (the column it applies
    * to rides separately in [[graft.api.Mutations.Update]]). Operands
    * for append/prepend are JSON TEXT (any value — object, array,
    * scalar), the parse layer's canonical rendering of the GraphQL
    * literal. */
  sealed trait Op
  /** `col || operand` — objects merge shallowly (operand wins per
    * key); otherwise both sides coerce to arrays and concatenate
    * (Postgres `jsonb || jsonb`). */
  final case class Append(json: String) extends Op
  /** `operand || col` — the same concatenation, swapped: on object
    * merge the COLUMN's keys win. */
  final case class Prepend(json: String) extends Op
  /** `col - key` — removes an object key, or every string element
    * equal to `key` from an array; a scalar is loud (Postgres
    * errors). */
  final case class DeleteKey(key: String) extends Op
  /** `col - idx` — removes the array element at `idx` (negative
    * counts from the end; out of range leaves the array unchanged);
    * a non-array is loud (Postgres errors). */
  final case class DeleteElem(idx: Int) extends Op
  /** `col #- path` — removes the object key or array element at the
    * path; a missing path leaves the value unchanged, a non-integer
    * path element against an array is loud, and a SCALAR top-level
    * value is loud (Postgres: "cannot delete path in scalar"). */
  final case class DeleteAtPath(path: Seq[String]) extends Op

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Canonical serialization: compact, object keys sorted bytewise at
    * every level — the one spelling both engines can reproduce. */
  private def canon(n: JsonNode): JsonNode = n match {
    case o: ObjectNode =>
      val out = mapper.createObjectNode()
      val names = new scala.collection.mutable.ArrayBuffer[String]()
      o.fieldNames().forEachRemaining(k => names += k)
      names.sorted.foreach(k => out.set[JsonNode](k, canon(o.get(k))))
      out
    case a: ArrayNode =>
      val out = mapper.createArrayNode()
      a.forEach(e => out.add(canon(e)))
      out
    case other => other
  }

  private def elems(n: JsonNode): Seq[JsonNode] =
    if (n.isArray) {
      val b = Seq.newBuilder[JsonNode]
      n.forEach(e => b += e)
      b.result()
    } else Seq(n)

  /** Postgres `a || b`. */
  private def concat(a: JsonNode, b: JsonNode): JsonNode =
    if (a.isObject && b.isObject) {
      val out = a.deepCopy[ObjectNode]()
      b.fieldNames().forEachRemaining(k =>
        out.set[JsonNode](k, b.get(k)))
      out
    } else {
      val out = mapper.createArrayNode()
      (elems(a) ++ elems(b)).foreach(out.add)
      out
    }

  private def delKey(a: JsonNode, k: String, at: String): JsonNode =
    if (a.isObject) { val o = a.deepCopy[ObjectNode](); o.remove(k); o }
    else if (a.isArray) {
      val out = mapper.createArrayNode()
      elems(a).filterNot(e => e.isTextual && e.asText() == k)
        .foreach(out.add)
      out
    } else throw new IllegalArgumentException(
      s"$at: _delete_key cannot delete from a scalar")

  private def delElem(a: JsonNode, idx: Int, at: String): JsonNode = {
    if (!a.isArray) throw new IllegalArgumentException(
      s"$at: _delete_elem needs an array value")
    val es = elems(a)
    val i = if (idx < 0) idx + es.size else idx
    val out = mapper.createArrayNode()
    (if (i >= 0 && i < es.size) es.patch(i, Nil, 1) else es)
      .foreach(out.add)
    out
  }

  private def delAtPath(a: JsonNode, path: Seq[String], at: String)
      : JsonNode = path match {
    case Seq() => a
    case Seq(last) => a match {
      case o: ObjectNode => val c = o.deepCopy[ObjectNode]()
        c.remove(last); c
      case arr: ArrayNode => delElem(arr, intPathElem(last, at), at)
      case _ => a // missing path on a scalar leaf: unchanged (PG #-)
    }
    case head +: rest => a match {
      case o: ObjectNode if o.has(head) =>
        val c = o.deepCopy[ObjectNode]()
        c.set[JsonNode](head, delAtPath(o.get(head), rest, at))
        c
      case arr: ArrayNode =>
        val es = elems(arr)
        val i0 = intPathElem(head, at)
        val i = if (i0 < 0) i0 + es.size else i0
        if (i >= 0 && i < es.size) {
          val out = mapper.createArrayNode()
          es.zipWithIndex.foreach { case (e, j) =>
            out.add(if (j == i) delAtPath(e, rest, at) else e) }
          out
        } else arr
      case _ => a // missing path: unchanged
    }
  }

  private def intPathElem(s: String, at: String): Int =
    try s.toInt catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"$at: path element '$s' is not an integer (the value " +
            "there is an array)")
    }

  /** Apply `op` to one JSON text value; SQL NULL propagates (Postgres
    * operator semantics), malformed stored JSON is loud. */
  def apply(op: Op, text: String, at: String): String = {
    if (text == null) return null
    val n = try mapper.readTree(text) catch {
      case e: com.fasterxml.jackson.core.JacksonException =>
        throw new IllegalArgumentException(
          s"$at: stored value is not valid JSON: ${e.getOriginalMessage}")
    }
    val r = op match {
      case Append(j) => concat(n, mapper.readTree(j))
      case Prepend(j) => concat(mapper.readTree(j), n)
      case DeleteKey(k) => delKey(n, k, at)
      case DeleteElem(i) => delElem(n, i, at)
      case DeleteAtPath(p) =>
        // only the TOP level must be a container (PG #-): a scalar
        // ALONG a missing path deeper down returns unchanged
        if (!n.isObject && !n.isArray)
          throw new IllegalArgumentException(
            s"$at: _delete_at_path cannot delete a path in a scalar")
        delAtPath(n, p, at)
    }
    mapper.writeValueAsString(canon(r))
  }

  /** The Spark column form — one UDF over the update's matched rows. */
  def column(op: Op, c: Column, at: String): Column =
    udf((s: String) => apply(op, s, at)).apply(c)

  /** The Hasura argument name an op arrived as — for error messages. */
  def opName(op: Op): String = op match {
    case _: Append => "_append"
    case _: Prepend => "_prepend"
    case _: DeleteKey => "_delete_key"
    case _: DeleteElem => "_delete_elem"
    case _: DeleteAtPath => "_delete_at_path"
  }
}
