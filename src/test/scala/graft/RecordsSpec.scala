package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.core.FlowFrame
import graft.flow.{FlowConfig, FlowRunner}
import graft.record.Records

/**
 * Record-plane battery port (JsonRecordTests.cpp, ConvertRecordTests.cpp)
 * — the three JSON input shapes, writer groupings, read-failure routing,
 * record.count, and zero-record handling.
 */
class RecordsSpec extends SparkSpec {

  private val schema = StructType.fromDDL(
    "foo STRING, bar BIGINT, baz DOUBLE, is_test BOOLEAN, qux ARRAY<STRING>")

  private val recA =
    """{"baz":3.14,"qux":["a","b","c"],"is_test":true,"bar":123,"foo":"asd"}"""
  private val recB =
    """{"baz":3.141592653589793,"qux":["x","y","z"],"is_test":true,"bar":98402134,"foo":"lorem"}"""

  private def parse(content: String): Seq[(String, Long)] = {
    import spark.implicits._
    Seq(content).toDF("c")
      .select(explode(Records.jsonTreeRecords(col("c"), schema)).as("r"))
      .select(col("r.foo"), col("r.bar")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  test("JsonTreeReader accepts all three input shapes: per-line, compact " +
       "array, pretty array (JsonRecordTests.cpp:119-127)") {
    val expected = Seq(("asd", 123L), ("lorem", 98402134L))
    assert(parse(recA + "\n" + recB + "\n") === expected)
    assert(parse(s"[$recA,$recB]") === expected)
    // leading newline before '[' and CRLF blank lines are whitespace,
    // not content (regex-based checks, since trim() strips spaces only)
    assert(parse("\n [" + recA + "," + recB + "]") === expected)
    assert(parse(recA + "\r\n\r\n" + recB + "\r\n") === expected)
    val pretty =
      s"""[
         |    {
         |        "baz": 3.14,
         |        "qux": ["a", "b", "c"],
         |        "is_test": true,
         |        "bar": 123,
         |        "foo": "asd"
         |    },
         |    {
         |        "baz": 3.141592653589793,
         |        "qux": ["x", "y", "z"],
         |        "is_test": true,
         |        "bar": 98402134,
         |        "foo": "lorem"
         |    }
         |]""".stripMargin
    assert(parse(pretty) === expected)
  }

  private def convertYml(readerClass: String, props: String = "",
                         text: String): String =
    s"""MiNiFi Config Version: 3
       |Processors:
       |- name: gen
       |  id: g
       |  class: org.apache.nifi.minifi.processors.GenerateFlowFile
       |  Properties: {Batch Size: '1', Custom Text: '$text'}
       |- name: conv
       |  id: c
       |  class: org.apache.nifi.minifi.processors.ConvertRecord
       |  Properties:
       |    Record Reader: the-reader
       |    Record Writer: csv-writer
       |$props
       |Connections:
       |- {id: c1, source id: g, source relationship names: [success], destination id: c}
       |Controller Services:
       |- id: the-reader
       |  name: the-reader
       |  class: $readerClass
       |  Properties:
       |    Schema Text: "foo STRING, bar BIGINT"
       |- id: csv-writer
       |  name: csv-writer
       |  class: CSVRecordSetWriter
       |""".stripMargin

  test("ConvertRecord renders every record of a multi-record FlowFile and " +
       "stamps record.count (ConvertRecordTests.cpp:60)") {
    val text = """[{"foo":"ann","bar":7},{"foo":"bob","bar":8}]"""
    val result = FlowRunner.run(spark,
      FlowConfig.parse(convertYml("JsonTreeReader", text = text)))
    val rows = result.output("conv")
      .select("relationship", "content", "attributes").collect()
    assert(rows.length === 1 && rows.head.getString(0) === "success")
    assert(rows.head.getString(1) === "ann,7\nbob,8")
    assert(rows.head.getMap[String, String](2)("record.count") === "2")
    result.release()
  }

  test("ConvertRecord routes read failures to failure with content " +
       "unchanged (ConvertRecordTests.cpp 'Record conversion fails')") {
    val result = FlowRunner.run(spark,
      FlowConfig.parse(convertYml("JsonTreeReader", text = "not json at all")))
    val rows = result.output("conv")
      .select("relationship", "content", "attributes").collect()
    assert(rows.length === 1 && rows.head.getString(0) === "failure")
    assert(rows.head.getString(1) === "not json at all")
    assert(!rows.head.getMap[String, String](2).contains("record.count"))
    result.release()
  }

  test("XMLReader: non-XML text routes failure, not zero-record success") {
    val result = FlowRunner.run(spark, FlowConfig.parse(
      convertYml("XMLReader", text = "not xml at all")))
    val rows = result.output("conv").select("relationship", "content").collect()
    assert(rows.length === 1 && rows.head.getString(0) === "failure")
    assert(rows.head.getString(1) === "not xml at all")
    result.release()
  }

  test("zero-record FlowFiles drop by default-off property and transfer " +
       "with record.count=0 when included (ConvertRecordTests.cpp:90-120)") {
    val xml = "<record></record>"
    val keep = FlowRunner.run(spark, FlowConfig.parse(
      convertYml("XMLReader",
        props = "    Include Zero Record FlowFiles: 'true'", text = xml)))
    val keepRows = keep.output("conv")
      .select("relationship", "content", "attributes").collect()
    assert(keepRows.length === 1 && keepRows.head.getString(0) === "success")
    assert(keepRows.head.getString(1) === "")
    assert(keepRows.head.getMap[String, String](2)("record.count") === "0")
    keep.release()
    val drop = FlowRunner.run(spark, FlowConfig.parse(
      convertYml("XMLReader",
        props = "    Include Zero Record FlowFiles: 'false'", text = xml)))
    assert(drop.output("conv").count() === 0)
    drop.release()
  }
}
