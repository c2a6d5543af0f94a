package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import JsonbOps._

/** Postgres jsonb operator semantics over JSON text, with canonical
  * (compact, key-sorted) output — the q214 update family's kernel. */
class JsonbOpsSpec extends AnyFunSuite {
  private def ap(op: Op, s: String) = JsonbOps.apply(op, s, "t")

  test("_append: objects merge shallowly (operand wins), arrays " +
    "concatenate, scalars coerce to one-element arrays") {
    assert(ap(Append("""{"b":2,"a":9}"""), """{"a":1,"c":3}""") ===
      """{"a":9,"b":2,"c":3}""")
    // shallow: a nested object REPLACES, never deep-merges
    assert(ap(Append("""{"m":{"y":2}}"""), """{"m":{"x":1},"k":7}""") ===
      """{"k":7,"m":{"y":2}}""")
    assert(ap(Append("""[3,4]"""), """[1,2]""") === """[1,2,3,4]""")
    assert(ap(Append("""5"""), """[1,2]""") === """[1,2,5]""")
    assert(ap(Append("""[2]"""), """1""") === """[1,2]""")
    // object ++ array: the object rides as ONE element (PG ||)
    assert(ap(Append("""[1]"""), """{"a":1}""") === """[{"a":1},1]""")
  }

  test("_prepend is the swapped concatenation: the COLUMN wins " +
    "object-merge conflicts") {
    assert(ap(Prepend("""{"k":999,"pre":1}"""), """{"k":69}""") ===
      """{"k":69,"pre":1}""")
    assert(ap(Prepend("""[0]"""), """[1,2]""") === """[0,1,2]""")
  }

  test("_delete_key: object key, array string-elements; scalar loud") {
    assert(ap(DeleteKey("a"), """{"a":1,"b":2}""") === """{"b":2}""")
    assert(ap(DeleteKey("zz"), """{"a":1}""") === """{"a":1}""")
    assert(ap(DeleteKey("x"), """["x",1,"x","y"]""") === """[1,"y"]""")
    val e = intercept[IllegalArgumentException](ap(DeleteKey("a"), "5"))
    assert(e.getMessage.contains("scalar"))
  }

  test("_delete_elem: index (negative from the end), out-of-range " +
    "unchanged, non-array loud") {
    assert(ap(DeleteElem(1), """["a","b","c"]""") === """["a","c"]""")
    assert(ap(DeleteElem(-1), """["a","b","c"]""") === """["a","b"]""")
    assert(ap(DeleteElem(9), """["a"]""") === """["a"]""")
    assert(ap(DeleteElem(-9), """["a"]""") === """["a"]""")
    val e = intercept[IllegalArgumentException](
      ap(DeleteElem(0), """{"a":1}"""))
    assert(e.getMessage.contains("array"))
  }

  test("_delete_at_path: nested keys and array indexes; missing path " +
    "unchanged; non-integer path element on an array loud") {
    assert(ap(DeleteAtPath(Seq("m", "y")), """{"m":{"x":1,"y":2}}""") ===
      """{"m":{"x":1}}""")
    assert(ap(DeleteAtPath(Seq("tags", "1")),
      """{"tags":["a","b","c"]}""") === """{"tags":["a","c"]}""")
    assert(ap(DeleteAtPath(Seq("tags", "-1")),
      """{"tags":["a","b"]}""") === """{"tags":["a"]}""")
    // a path into an array of objects
    assert(ap(DeleteAtPath(Seq("0", "a")), """[{"a":1,"b":2}]""") ===
      """[{"b":2}]""")
    // missing anywhere: unchanged
    assert(ap(DeleteAtPath(Seq("zz", "y")), """{"m":1}""") ===
      """{"m":1}""")
    assert(ap(DeleteAtPath(Seq("9", "y")), """[1]""") === """[1]""")
    // a SCALAR top level is loud (PG: cannot delete path in scalar);
    // a scalar along a missing deeper path stays unchanged (above)
    val es = intercept[IllegalArgumentException](
      ap(DeleteAtPath(Seq("a")), "5"))
    assert(es.getMessage.contains("scalar"))
    val e = intercept[IllegalArgumentException](
      ap(DeleteAtPath(Seq("nope")), """["a"]"""))
    assert(e.getMessage.contains("not an integer"))
  }

  test("NULL propagates; malformed stored JSON is loud; output is " +
    "canonical (compact, keys byte-sorted at every level)") {
    assert(ap(Append("""{"a":1}"""), null) === null)
    val e = intercept[IllegalArgumentException](
      ap(Append("""{"a":1}"""), """{"broken"""))
    assert(e.getMessage.contains("not valid JSON"))
    assert(ap(Append("{}"), """{ "b" : {"z":1, "a":[2, 3]} , "a":1 }""")
      === """{"a":1,"b":{"a":[2,3],"z":1}}""")
  }
}
