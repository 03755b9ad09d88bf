package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import graft.ops.JoltShift

/** Ports the reference's JoltTransformJSONTests.cpp inline cases (semantic
  * JSON comparison, order-insensitive like utils::verifyJSON). */
class JoltShiftSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def run(spec: String, input: String): String =
    JoltShift.processDocument(JoltShift.parseSpec(spec), input)
      .getOrElse(fail(s"transform failed for spec=$spec input=$input"))

  private def assertJson(actual: String, expected: String): Unit =
    assert(mapper.readTree(actual) === mapper.readTree(expected),
      s"\nactual:   $actual\nexpected: $expected")

  test("Shiftr successful case (JoltTransformJSONTests.cpp:30)") {
    val spec = """
      {
        "a": "a_out",
        "b": {
          "@": "b.self",
          "$": "b.key",
          "c": "automatic array",
          "d": "automatic array",
          "&": "b_b",
          "f": {
            "&(1,0)": "b_f_b"
          }
        }
      }"""
    val input = """
      {
        "a": 1,
        "b": {"c": 2, "d": "test", "b": [3, 4], "f": {"b": 5}}
      }"""
    assertJson(run(spec, input), """
      {
        "a_out": 1,
        "b": {
          "self": {"c": 2, "d": "test", "b": [3, 4], "f": {"b": 5}},
          "key": "b"
        },
        "automatic array": [2, "test"],
        "b_b": [3, 4],
        "b_f_b": 5
      }""")
  }

  test("Shiftr multiple destination (JoltTransformJSONTests.cpp:78)") {
    assertJson(run("""{"a": ["out1", "out2.inner"]}""", """{"a": 1}"""),
      """{"out1": 1, "out2": {"inner": 1}}""")
  }

  test("Shiftr destination is a string or array of strings " +
       "(JoltTransformJSONTests.cpp:105)") {
    def parses(spec: String): Boolean =
      try { JoltShift.parseSpec(spec); true }
      catch { case _: Exception => false }
    assert(parses("""{"a": ["out", "out2"], "b": "out3"}"""))
    assert(!parses("""{"a": 3}"""))
    assert(!parses("""{"a": ["out", 1]}"""))
    assert(!parses("""{"a": ["out", {"@": "invalid"}]}"""))
  }

  test("Shiftr matches are correctly ordered (JoltTransformJSONTests.cpp:130)") {
    val spec = """
      {
        "a": {
          "a": {
            "c": "literal",
            "&(1,0)": "second",
            "&0": "first",
            "*b*": "third",
            "*a*": "fourth"
          }
        }
      }"""
    val input = """{"a": {"a": {"c": "c", "a": "a", "ab": "ab"}}}"""
    assertJson(run(spec, input),
      """{"literal": "c", "first": "a", "fourth": "ab"}""")
  }

  test("Shiftr arrays are maps with numeric keys " +
       "(JoltTransformJSONTests.cpp:174)") {
    val spec = """{"a": {"0": "a_&", "1": "a_&"}}"""
    assertJson(run(spec, """{"a": ["first", "second"]}"""),
      """{"a_0": "first", "a_1": "second"}""")
  }

  test("Shiftr put into array at index (JoltTransformJSONTests.cpp:206)") {
    val spec = """
      {
        "a": "out[1]",
        "b": "out[2].inner",
        "*": "arr[&]"
      }"""
    val input = """{"a": "a_val", "b": "b_val", "2": "2_val"}"""
    assertJson(run(spec, input), """
      {
        "out": [null, "a_val", {"inner": "b_val"}],
        "arr": [null, null, "2_val"]
      }""")
  }

  test("Shiftr multiple patterns via | alternatives " +
       "(JoltTransformJSONTests.cpp:239)") {
    val spec = """
      {
        "a|b": "out1",
        "b\\||c": "out2"
      }"""
    val input = """{"a": 1, "b": 2, "b|": 3, "c": 4}"""
    assertJson(run(spec, input), """{"out1": [1, 2], "out2": [3, 4]}""")
  }

  test("Shiftr template parse canonicalization " +
       "(JoltTransformJSONTests.cpp:113)") {
    // "a&0b" -> fragments [a, b], refs [(0,0)]
    val spec = JoltShift.parseSpec("""{"a&0b": "x", "a&12&(4,5)b&c": "y"}""")
    assert(spec.templates.keySet === Set("a&(0,0)b", "a&(12,0)&(4,5)b&(0,0)c"))
  }

  test("Shiftr invalid reference sanity (JoltTransformJSONTests.cpp:125)") {
    JoltShift.parseSpec(
      """{"a*": {"b*_*c": {"&(0,0)&(0,1)&(0,2)&(1)&(1,1)": "&(0,0)"}}, "b": "out3"}""")
  }

  test("Shiftr empty index appends; deep wildcard submatch templates") {
    val spec = """{"*": {"x": "all[]"}}"""
    val input = """{"k1": {"x": 1}, "k2": {"x": 2}}"""
    assertJson(run(spec, input), """{"all": [1, 2]}""")
    // wildcard submatches referenced from a deeper level
    val spec2 = """{"pre*post": {"v": "&(1,1).out"}}"""
    val input2 = """{"preMIDpost": {"v": 42}}"""
    assertJson(run(spec2, input2), """{"MID": {"out": 42}}""")
  }
}
