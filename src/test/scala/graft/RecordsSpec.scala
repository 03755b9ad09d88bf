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

  // ------------------------------------------------------------------
  // Schema-inferring XMLReader battery (XMLReaderTests.cpp) — the dynamic
  // reader, not the fixed-schema from_xml path.
  // ------------------------------------------------------------------
  import graft.record.XmlRecords

  private def xmlRecs(xml: String, contentField: String = "value",
                      parseAttributes: Boolean = false, attrPrefix: String = "",
                      recordsAsArray: Boolean = false): Option[Seq[String]] =
    XmlRecords.parseRecords(xml, contentField, parseAttributes, attrPrefix,
      recordsAsArray)

  test("XMLReader: invalid or empty input is a read failure; root-only XML " +
       "is an empty record set (XMLReaderTests.cpp:56-69)") {
    assert(xmlRecs("") === None)
    assert(xmlRecs("<invalid_xml>") === None)
    assert(xmlRecs("<root></root>") === Some(Nil))
  }

  test("XMLReader: single data node, empty node, and single child node " +
       "(XMLReaderTests.cpp:71-94)") {
    assert(xmlRecs("<root>text</root>") === Some(Seq("""{"value":"text"}""")))
    assert(xmlRecs("<root><node></node></root>") ===
      Some(Seq("""{"node":""}""")))
    assert(xmlRecs("<root><child>text</child></root>") ===
      Some(Seq("""{"child":"text"}""")))
  }

  test("XMLReader: leaf type inference — string, unsigned, signed, bool, " +
       "double, RFC3339 timestamp (XMLReaderTests.cpp:96-113)") {
    val xml = "<root><string>text</string><number>42</number>" +
      "<signed>-23</signed><boolean>true</boolean><double>3.14</double>" +
      "<timestamp>2023-03-15T12:34:56Z</timestamp></root>"
    assert(xmlRecs(xml) === Some(Seq(
      """{"string":"text","number":42,"signed":-23,"boolean":true,""" +
        """"double":3.14,"timestamp":"2023-03-15T12:34:56Z"}""")))
  }

  test("XMLReader: nested subnodes become record objects " +
       "(XMLReaderTests.cpp:115-127)") {
    val xml = "<root><node><subnode1>text1</subnode1><subnode2>" +
      "<subsub1>text2</subsub1><subsub2>text3</subsub2></subnode2></node></root>"
    assert(xmlRecs(xml) === Some(Seq(
      """{"node":{"subnode1":"text1","subnode2":""" +
        """{"subsub1":"text2","subsub2":"text3"}}}""")))
  }

  test("XMLReader: mixed nodes and text — text concatenates under the " +
       "content field name (XMLReaderTests.cpp:129-138)") {
    val xml = "<root>outtext1<node>nodetext<subnode>subtext</subnode></node>outtext2</root>"
    assert(xmlRecs(xml) === Some(Seq(
      """{"node":{"subnode":"subtext","value":"nodetext"},""" +
        """"value":"outtext1outtext2"}""")))
  }

  test("XMLReader: repeated sibling tags coalesce into arrays " +
       "(XMLReaderTests.cpp:140-153)") {
    val xml = "<root><array><item>value1</item><item>value2</item></array></root>"
    assert(xmlRecs(xml) === Some(Seq(
      """{"array":{"item":["value1","value2"]}}""")))
  }

  test("XMLReader: explicit tags named like the content field are ignored " +
       "when text data is present (XMLReaderTests.cpp:155-163)") {
    assert(xmlRecs("<root>s1<value>s2</value><value>s3</value></root>") ===
      Some(Seq("""{"value":"s1"}""")))
  }

  test("XMLReader: Field Name for Content names tagless values " +
       "(XMLReaderTests.cpp:165-174)") {
    assert(xmlRecs("<root>outtext<node>nodetext</node></root>",
      contentField = "tagvalue") ===
      Some(Seq("""{"node":"nodetext","tagvalue":"outtext"}""")))
  }

  test("XMLReader: Parse XML Attributes lifts attributes into the record " +
       "(XMLReaderTests.cpp:176-185)") {
    assert(xmlRecs("""<root><node attribute="attr_value">nodetext</node></root>""",
      parseAttributes = true) ===
      Some(Seq("""{"node":{"attribute":"attr_value","value":"nodetext"}}""")))
    // attributes are ignored entirely when the property is off
    assert(xmlRecs("""<root><node attribute="attr_value">nodetext</node></root>""") ===
      Some(Seq("""{"node":"nodetext"}""")))
  }

  test("XMLReader: attributes in a nested node array — attr-bearing " +
       "elements force object form, bare repeats stay scalar " +
       "(XMLReaderTests.cpp:187-204)") {
    val xml = """<root><node attribute="attr_value">""" +
      """<subnode subattr="subattr_value">1</subnode>nodetext""" +
      """<subnode>2</subnode></node></root>"""
    assert(xmlRecs(xml, parseAttributes = true) === Some(Seq(
      """{"node":{"attribute":"attr_value","subnode":""" +
        """[{"subattr":"subattr_value","value":1},2],"value":"nodetext"}}""")))
  }

  test("XMLReader: attributes and nodes clashing with the content field " +
       "name are dropped (XMLReaderTests.cpp:206-235)") {
    assert(xmlRecs(
      """<root><node><subnode attr="attr_value" tagvalue="attr_value2">value</subnode></node></root>""",
      contentField = "tagvalue", parseAttributes = true) ===
      Some(Seq("""{"node":{"subnode":{"attr":"attr_value","tagvalue":"value"}}}""")))
    assert(xmlRecs("""<root><node>value<tagvalue>ignored</tagvalue></node></root>""",
      contentField = "tagvalue") ===
      Some(Seq("""{"node":{"tagvalue":"value"}}""")))
  }

  test("XMLReader: Attribute Prefix un-clashes attributes from the content " +
       "field (XMLReaderTests.cpp:237-253)") {
    assert(xmlRecs(
      """<root><node><subnode mykey="myattrval" fieldname="myattrval2">value</subnode></node></root>""",
      contentField = "fieldname", parseAttributes = true, attrPrefix = "attr_") ===
      Some(Seq("""{"node":{"subnode":{"attr_mykey":"myattrval",""" +
        """"attr_fieldname":"myattrval2","fieldname":"value"}}}""")))
  }

  test("XMLReader: Expect Records as Array reads each child of the wrapper " +
       "as a record (XMLReaderTests.cpp:255-270)") {
    val xml = "<root><node><message><from>Tony</from><to>Bob</to>" +
      "<body>Hello</body></message></node><node>Hi!</node></root>"
    assert(xmlRecs(xml, recordsAsArray = true) === Some(Seq(
      """{"message":{"from":"Tony","to":"Bob","body":"Hello"}}""",
      """{"value":"Hi!"}""")))
  }

  test("XMLReader: strtod-prefix typing quirk and uint64 overflow fall " +
       "through to double (XMLReader.cpp:74-97)") {
    // stod parses a numeric *prefix*: "42abc" is the double 42.0
    assert(XmlRecords.typedLeafJson("42abc") === "42.0")
    assert(XmlRecords.typedLeafJson("1e3") === "1000.0")
    // all-digits over uint64 range: stoull throws, stod wins
    assert(XmlRecords.typedLeafJson("18446744073709551615") ===
      "18446744073709551615")
    assert(XmlRecords.typedLeafJson("18446744073709551616") ===
      "1.8446744073709552E19")
    // int64 underflow likewise
    assert(XmlRecords.typedLeafJson("-9223372036854775808") ===
      "-9223372036854775808")
    assert(XmlRecords.typedLeafJson("-9223372036854775809") ===
      "-9.223372036854776E18")
    assert(XmlRecords.typedLeafJson("") === "\"\"")
  }

  // ------------------------------------------------------------------
  // Per-FlowFile SplitRecord battery (SplitRecordTests.cpp)
  // ------------------------------------------------------------------
  import graft.ops.SplitMerge

  private def splitRows(content: String, rps: String) = {
    import spark.implicits._
    SplitMerge.splitRecordJson(
      Seq((7L, "in.json", content)).toDF("id", "fn", "c"),
      col("id"), col("fn"), col("c"), lit(rps))
      .collect().groupBy(_.getAs[String]("relationship"))
  }

  test("SplitRecord: non-numeric or zero Records Per Split routes failure " +
       "(SplitRecordTests.cpp:64-78)") {
    val bad = splitRows("{\"name\": \"John\"}\n{\"name\": \"Jill\"}", "invalid")
    assert(bad("failure").length === 1 && !bad.contains("splits") &&
      !bad.contains("original"))
    val zero = splitRows("{\"name\": \"John\"}", "0")
    assert(zero("failure").length === 1)
  }

  test("SplitRecord: malformed records yield zero splits, original still " +
       "transfers with content unchanged (SplitRecordTests.cpp:80-87; " +
       "JsonTreeReader.cpp:124-143 ignores the parse result)") {
    val r = splitRows("""{"name": "John""", "1")
    assert(!r.contains("splits") && !r.contains("failure"))
    assert(r("original").head.getAs[String]("content") === """{"name": "John""")
  }

  test("SplitRecord: one-by-one split with the full fragment attribute set " +
       "(SplitRecordTests.cpp:89-94)") {
    val r = splitRows("{\"name\": \"John\"}\n{\"name\": \"Jill\"}", "1")
    assert(r("original").length === 1)
    val splits = r("splits").sortBy(_.getAs[Long]("fragment_index"))
    assert(splits.map(_.getAs[String]("content")).toSeq ===
      Seq("""[{"name":"John"}]""", """[{"name":"Jill"}]"""))
    // 0-BASED fragment.index (SplitRecord.cpp:71), unlike SplitContent
    assert(splits.map(_.getAs[Long]("fragment_index")).toSeq === Seq(0L, 1L))
    assert(splits.forall(_.getAs[Long]("fragment_count") === 2L))
    assert(splits.forall(_.getAs[Long]("record_count") === 1L))
    assert(splits.map(_.getAs[String]("fragment_identifier")).distinct.length === 1)
    assert(splits.forall(_.getAs[String]("segment_original_filename") === "in.json"))
  }

  test("SplitRecord: two-by-two split leaves a short tail fragment " +
       "(SplitRecordTests.cpp:96-101)") {
    val content = "{\"a\": \"1\", \"b\": \"2\"}\n{\"c\": \"3\"}\n" +
      "{\"d\": \"4\", \"e\": \"5\"}\n{\"f\": \"6\"}\n{\"g\": \"7\", \"h\": \"8\"}\n"
    val r = splitRows(content, "2")
    val splits = r("splits").sortBy(_.getAs[Long]("fragment_index"))
    assert(splits.map(_.getAs[String]("content")).toSeq === Seq(
      """[{"a":"1","b":"2"},{"c":"3"}]""",
      """[{"d":"4","e":"5"},{"f":"6"}]""",
      """[{"g":"7","h":"8"}]"""))
    assert(splits.map(_.getAs[Long]("record_count")).toSeq === Seq(2L, 2L, 1L))
    assert(splits.forall(_.getAs[Long]("fragment_count") === 3L))
  }

  test("SplitRecord lenient reader: records before the first malformed line " +
       "are kept; array mode stops at a non-object element") {
    assert(SplitMerge.lenientJsonRecords(
      "{\"a\":1}\nnot json\n{\"b\":2}") === Vector("""{"a":1}"""))
    assert(SplitMerge.lenientJsonRecords(
      """[{"a":1},5,{"b":2}]""") === Vector("""{"a":1}"""))
    assert(SplitMerge.lenientJsonRecords("") === Vector.empty)
    // getline: a lone newline is one empty (malformed) line
    assert(SplitMerge.lenientJsonRecords("\n") === Vector.empty)
  }

  test("XMLReader column form: per-row record arrays, null on parse failure") {
    import spark.implicits._
    val out = Seq(
      (1, "<root><a>1</a><a>2</a>x</root>"),
      (2, "<broken")).toDF("id", "c")
      .select(col("id"), XmlRecords.xmlRecords(col("c")).as("recs"))
      .orderBy("id").collect()
    assert(out(0).getSeq[String](1) === Seq("""{"a":[1,2],"value":"x"}"""))
    assert(out(1).isNullAt(1))
  }

  test("XMLRecordSetWriter validation: wrap modes need Array Tag Name, " +
       "record/root tags required (XMLRecordSetWriterTests.cpp:151-167)") {
    import graft.record.XmlRecords.XmlWriterOptions
    for (wrap <- Seq("Use Property as Wrapper", "Use Property for Elements")) {
      val e = intercept[IllegalArgumentException](
        XmlWriterOptions("record", "root", wrap).validated())
      assert(e.getMessage.contains("Array Tag Name property must be set"))
    }
    assert(intercept[IllegalArgumentException](
      XmlWriterOptions("", "root").validated()).getMessage ===
      "Name of Record Tag property must be set")
    assert(intercept[IllegalArgumentException](
      XmlWriterOptions("record", "").validated()).getMessage ===
      "Name of Root Tag property must be set")
    assert(intercept[IllegalArgumentException](
      XmlWriterOptions("record", "root", "bogus").validated()).getMessage
      .contains("Invalid value for Wrap Elements of Arrays"))
  }

  test("XMLRecordSetWriter battery: empty set, primitives incl. {:g} " +
       "doubles and second-precision timestamps, nested objects, the three " +
       "array wrap modes, multiple records, pretty print " +
       "(XMLRecordSetWriterTests.cpp:169-353)") {
    import graft.record.XmlRecords
    import graft.record.XmlRecords.XmlWriterOptions
    val base = XmlWriterOptions("record", "root")

    // empty record set, with and without the declaration
    assert(XmlRecords.recordSetToXml(Nil, base) ===
      """<?xml version="1.0"?><root/>""")
    assert(XmlRecords.recordSetToXml(Nil,
      base.copy(omitXmlDeclaration = true)) === "<root/>")

    // primitives through the Column form (real Spark types end-to-end)
    val prim = spark.sql(
      """SELECT array(named_struct(
        |  'string_field', 'value1',
        |  'uint_field', CAST(42 AS BIGINT),
        |  'double_field', CAST(2.3 AS DOUBLE),
        |  'bool_field', true,
        |  'time_point_field', CAST('2025-01-01 00:00:00 UTC' AS TIMESTAMP)
        |)) AS rs""".stripMargin)
      .select(XmlRecords.recordSetXml(col("rs"), base)).collect()(0).getString(0)
    assert(prim ===
      """<?xml version="1.0"?><root><record><string_field>value1</string_field>""" +
      """<uint_field>42</uint_field><double_field>2.3</double_field>""" +
      """<bool_field>true</bool_field>""" +
      """<time_point_field>2025-01-01T00:00:00Z</time_point_field>""" +
      """</record></root>""")

    // nested object + object array, No Wrapping (repeated siblings)
    val nested = spark.sql(
      """SELECT array(named_struct(
        | 'string_field', 'value1',
        | 'inner_object', named_struct(
        |   'inner_field', array('inner_value1', 'inner_value2'))
        |)) AS rs""".stripMargin)
      .select(XmlRecords.recordSetXml(col("rs"), base)).collect()(0).getString(0)
    assert(nested.contains("<inner_object>" +
      "<inner_field>inner_value1</inner_field>" +
      "<inner_field>inner_value2</inner_field></inner_object>"))

    // wrapper mode: root/record/array/array_field*
    val arrDf = spark.sql(
      "SELECT array(named_struct('array_field', " +
        "array('inner_value1', 'inner_value2'))) AS rs")
    val wrapped = arrDf.select(XmlRecords.recordSetXml(col("rs"),
      base.copy(wrapElementsOfArrays = "Use Property as Wrapper",
        arrayTagName = "array"))).collect()(0).getString(0)
    assert(wrapped.contains("<record><array>" +
      "<array_field>inner_value1</array_field>" +
      "<array_field>inner_value2</array_field></array></record>"))

    // elements mode: root/record/array_field/element_name*
    val elements = arrDf.select(XmlRecords.recordSetXml(col("rs"),
      base.copy(wrapElementsOfArrays = "Use Property for Elements",
        arrayTagName = "element_name"))).collect()(0).getString(0)
    assert(elements.contains("<record><array_field>" +
      "<element_name>inner_value1</element_name>" +
      "<element_name>inner_value2</element_name></array_field></record>"))

    // multiple records under one root
    val multi = spark.sql(
      """SELECT array(
        | named_struct('string_field', 'value1', 'uint_field', CAST(42 AS BIGINT)),
        | named_struct('string_field', 'value1', 'uint_field', CAST(42 AS BIGINT))
        |) AS rs""".stripMargin)
      .select(XmlRecords.recordSetXml(col("rs"), base)).collect()(0).getString(0)
    assert("<record>".r.findAllIn(multi).size === 2)

    // pretty print: exact reference bytes
    val pretty = spark.sql(
      "SELECT array(named_struct('bool_field', true)) AS rs")
      .select(XmlRecords.recordSetXml(col("rs"),
        base.copy(prettyPrint = true))).collect()(0).getString(0)
    assert(pretty ===
      "<?xml version=\"1.0\"?>\n<root>\n  <record>\n    " +
      "<bool_field>true</bool_field>\n  </record>\n</root>\n")

    // {:g} double formatting corners + escaping
    val g = spark.sql(
      """SELECT array(named_struct(
        | 'six_sig', CAST(1234567.0 AS DOUBLE),
        | 'whole', CAST(42.0 AS DOUBLE),
        | 'esc', 'a<b&c>d')) AS rs""".stripMargin)
      .select(XmlRecords.recordSetXml(col("rs"), base)).collect()(0).getString(0)
    assert(g.contains("<six_sig>1.23457e+06</six_sig>")) // %g rounds to 6 sig
    assert(g.contains("<whole>42</whole>"))              // zeros stripped
    assert(g.contains("<esc>a&lt;b&amp;c&gt;d</esc>"))
  }
}
