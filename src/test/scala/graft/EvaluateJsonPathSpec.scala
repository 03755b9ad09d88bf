package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.FlowFrame
import graft.ops.Transforms

/**
 * Table-driven port of the reference EvaluateJsonPath battery
 * (extensions/standard-processors/tests/unit/EvaluateJsonPathTests.cpp) —
 * each test cites its TEST_CASE.
 */
class EvaluateJsonPathSpec extends SparkSpec {

  private def ff(content: String): DataFrame =
    flowFrame(Seq((content, Map.empty[String, String])))

  private def one(df: DataFrame): (String, String, Map[String, String]) = {
    val r = df.select(col(FlowFrame.Content).cast("string"),
      col(FlowFrame.Relationship), col(FlowFrame.Attributes)).collect().head
    (r.getString(0), r.getString(1), r.getMap[String, String](2).toMap)
  }

  private val person = """{"id": 1234, "name": {"firstName": "John", "lastName": "Doe"}}"""

  test("empty or invalid JSON content routes failure (cpp:51-69)") {
    for (bad <- Seq("", "this is invalid json")) {
      val (content, rel, _) = one(Transforms.evaluateJsonPathContent(
        ff(bad), col(FlowFrame.Content), "$.firstName"))
      assert(rel === "failure" && content === bad)
    }
    val (_, rel2, _) = one(Transforms.evaluateJsonPathFull(
      ff(""), col(FlowFrame.Content), Seq("a" -> "$.x")))
    assert(rel2 === "failure")
  }

  test("paths not found, attribute destination: ignore/warn set \"\", " +
       "skip omits, row stays matched (cpp:86)") {
    val setEmpty = one(Transforms.evaluateJsonPathFull(ff("{}"),
      col(FlowFrame.Content),
      Seq("attribute1" -> "$.firstName", "attribute2" -> "$.lastName"),
      pathNotFound = Transforms.SetEmptyOnMiss))
    assert(setEmpty._2 === "matched" && setEmpty._1 === "{}")
    assert(setEmpty._3.get("attribute1") === Some("") &&
      setEmpty._3.get("attribute2") === Some(""))
    val skip = one(Transforms.evaluateJsonPathFull(ff("{}"),
      col(FlowFrame.Content),
      Seq("attribute1" -> "$.firstName", "attribute2" -> "$.lastName"),
      pathNotFound = Transforms.SkipOnMiss))
    assert(skip._2 === "matched")
    assert(!skip._3.contains("attribute1") && !skip._3.contains("attribute2"))
  }

  test("path not found, content destination: routes unmatched with " +
       "content unchanged (cpp:137)") {
    val (content, rel, attrs) = one(Transforms.evaluateJsonPathContent(
      ff("{}"), col(FlowFrame.Content), "$.firstName"))
    assert(rel === "unmatched" && content === "{}")
    assert(!attrs.contains("attribute"))
  }

  test("non-scalar result under scalar return type routes failure " +
       "(cpp:171)") {
    // attribute destination resolves AutoDetect to scalar
    val attr = one(Transforms.evaluateJsonPathFull(ff(person),
      col(FlowFrame.Content), Seq("attribute" -> "$.name")))
    assert(attr._2 === "failure" && attr._1 === person)
    assert(!attr._3.contains("attribute"))
    // content destination with explicit scalar type
    val cont = one(Transforms.evaluateJsonPathContent(ff(person),
      col(FlowFrame.Content), "$.name", returnType = Transforms.JsonScalar))
    assert(cont._2 === "failure" && cont._1 === person)
  }

  test("query a JSON object into content (cpp:197)") {
    val (content, rel, _) = one(Transforms.evaluateJsonPathContent(
      ff(person), col(FlowFrame.Content), "$.name"))
    assert(rel === "matched")
    assert(content === """{"firstName":"John","lastName":"Doe"}""")
  }

  test("query multiple scalars into attributes (cpp:214)") {
    val (content, rel, attrs) = one(Transforms.evaluateJsonPathFull(
      ff(person), col(FlowFrame.Content),
      Seq("firstName" -> "$.name.firstName", "lastName" -> "$.name.lastName",
        "id" -> "$.id")))
    assert(rel === "matched" && content === person)
    assert(attrs("firstName") === "John" && attrs("lastName") === "Doe" &&
      attrs("id") === "1234")
  }

  test("query a single scalar into content (cpp:235)") {
    val (content, rel, _) = one(Transforms.evaluateJsonPathContent(
      ff(person), col(FlowFrame.Content), "$.name.firstName"))
    assert(rel === "matched" && content === "John")
  }

  test("multi-result wildcard query renders a JSON array (cpp:252)") {
    val users = """{"users": [{"id": 1234, "name": {"firstName": "John", "lastName": "Doe"}}, {"id": 2345, "name": {"firstName": "Jane", "lastName": "Smith"}}]}"""
    val (content, rel, _) = one(Transforms.evaluateJsonPathContent(
      ff(users), col(FlowFrame.Content), "$.users[*].name.firstName"))
    assert(rel === "matched" && content === """["John","Jane"]""")
  }

  test("multi-result wildcard query works in the attribute destination " +
       "too, and fails under the scalar type only for real arrays") {
    val users = """{"users": [{"name": "John"}, {"name": "Jane"}]}"""
    // several matches → array → attribute destination is scalar → failure
    val multi = one(Transforms.evaluateJsonPathFull(ff(users),
      col(FlowFrame.Content), Seq("names" -> "$.users[*].name")))
    assert(multi._2 === "failure")
    // one match → bare scalar lands in the attribute
    val single = one(Transforms.evaluateJsonPathFull(
      ff("""{"users": [{"name": "John"}]}"""),
      col(FlowFrame.Content), Seq("names" -> "$.users[*].name")))
    assert(single._2 === "matched" && single._3("names") === "John")
    // a STRING scalar that merely starts with '[' is still a scalar
    val bracket = one(Transforms.evaluateJsonPathContent(
      ff("""{"a": ["[x]"]}"""), col(FlowFrame.Content), "$.a[*]",
      returnType = Transforms.JsonScalar))
    assert(bracket._2 === "matched" && bracket._1 === "[x]")
    // a STRING whose text is 'null' keeps its value: the single-match
    // result is the element's raw JSON ("null" quoted), so it classifies
    // as a string, not a JSON null
    val nullStr = one(Transforms.evaluateJsonPathContent(
      ff("""{"a": ["null"]}"""), col(FlowFrame.Content), "$.a[*]"))
    assert(nullStr._2 === "matched" && nullStr._1 === "null")
  }

  test("null result in content: empty-string vs 'null' representation " +
       "(cpp:269)") {
    val json = """{"id": 1234, "name": {"firstName": "John", "lastName": "Doe", "email": null}}"""
    val empty = one(Transforms.evaluateJsonPathContent(
      ff(json), col(FlowFrame.Content), "$.name.email"))
    assert(empty._2 === "matched" && empty._1 === "")
    val asNull = one(Transforms.evaluateJsonPathContent(
      ff(json), col(FlowFrame.Content), "$.name.email",
      nullAsEmptyString = false))
    assert(asNull._2 === "matched" && asNull._1 === "null")
  }

  test("null result in attributes: representation applies per attribute " +
       "(cpp:296)") {
    val json = """{"id": 1234, "user": {"firstName": "John", "lastName": "Doe", "email": null}}"""
    val empty = one(Transforms.evaluateJsonPathFull(ff(json),
      col(FlowFrame.Content),
      Seq("firstName" -> "$.user.firstName", "email" -> "$.user.email")))
    assert(empty._2 === "matched" && empty._1 === json)
    assert(empty._3("firstName") === "John" && empty._3("email") === "")
    val asNull = one(Transforms.evaluateJsonPathFull(ff(json),
      col(FlowFrame.Content),
      Seq("firstName" -> "$.user.firstName", "email" -> "$.user.email"),
      nullAsEmptyString = false))
    assert(asNull._3("email") === "null")
  }
}
